package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{DenseCatAgg, DenseLookupJoin}

/** The r15 whole-stage-codegen fusion of the dense ordinal aggregate:
  * results must be identical to the classic interpreted path on every
  * op (the conf flag flips the path), and the fused route must
  * actually ENGAGE for the shapes the bench gates measure (classic-
  * path counter stays flat). */
class DenseAggFusedSpec extends SparkSpec {

  private def df10k = spark.range(0, 10000).select(
    (col("id") % 7).cast("int").as("code"),
    when(col("id") % 11 === 0, lit(null)).otherwise(col("id") % 100)
      .cast("double").as("v"),
    (col("id") % 13).cast("double").as("w"))

  private def run(aggs: Seq[DenseCatAgg.Agg]): Seq[Row] =
    DenseCatAgg.groupByOrdinal(df10k, col("code"), 7, aggs,
      countAs = Some("n")).orderBy("code").collect().toSeq

  test("fused == classic on sum/count/mean/min/max incl. null values") {
    val aggs = Seq(
      DenseCatAgg.Agg(col("v"), "sum", "s"),
      DenseCatAgg.Agg(col("v"), "count", "c"),
      DenseCatAgg.Agg(col("v"), "mean", "m"),
      DenseCatAgg.Agg(col("v"), "min", "lo"),
      DenseCatAgg.Agg(col("w"), "max", "hi"))
    val fused = run(aggs)
    spark.conf.set("spark.graft.denseAgg.fuse", "false")
    val classic =
      try run(aggs)
      finally spark.conf.set("spark.graft.denseAgg.fuse", "true")
    assert(fused == classic)
    assert(fused.size == 7)
    // spot value against a plain hash aggregate
    val hash = df10k.filter(col("code") === 3)
      .agg(sum("v"), min("v"), max("w"), count(lit(1))).head
    val f3 = fused.find(_.getInt(0) == 3).get
    assert(f3.getDouble(1) == hash.getDouble(0))
    assert(f3.getDouble(4) == hash.getDouble(1))
    assert(f3.getDouble(5) == hash.getDouble(2))
    assert(f3.getLong(6) == hash.getLong(3))
  }

  test("fusion ENGAGES for the bench shapes: cat agg, dense join, binby grid") {
    def classicDelta(body: => Unit): Long = {
      val before = DenseCatAgg.classicPath.get()
      body
      DenseCatAgg.classicPath.get() - before
    }
    // groupby_cat shape (range -> project)
    assert(classicDelta {
      DenseCatAgg.groupByOrdinal(df10k, col("code"), 7,
        Seq(DenseCatAgg.Agg(col("v"), "sum", "s"))).collect()
    } == 0L)
    // join_dense shape (probe projection feeding the agg)
    assert(classicDelta {
      val dim = spark.range(0, 100).select(col("id").as("k2"),
        (col("id") % 9).cast("double").as("w2"))
      val fact = spark.range(0, 5000).select(
        (col("id") % 7).as("k"), (col("id") % 100).as("k2"))
      val joined = DenseLookupJoin.lookupJoin(fact, dim, col("k2"), "k2", 100)
      DenseCatAgg.groupByOrdinal(joined, col("k"), 7,
        Seq(DenseCatAgg.Agg(col("w2"), "sum", "s"))).collect()
    } == 0L)
    // binby grid shape (when-cascade bins + composite ordinal)
    assert(classicDelta {
      VxFrame(df10k).binby(
        Seq(("v", 0.0, 100.0, 10), ("w", 0.0, 13.0, 10)), sum(col("v")))
    } == 0L)
    // a parquet-backed frame fuses too (scan -> project pipeline)
    val p = java.nio.file.Files.createTempDirectory("graft_fuse").toString
    df10k.write.mode("overwrite").parquet(s"$p/t.parquet")
    assert(classicDelta {
      DenseCatAgg.groupByOrdinal(spark.read.parquet(s"$p/t.parquet"),
        col("code"), 7, Seq(DenseCatAgg.Agg(col("v"), "sum", "s"))).collect()
    } == 0L)
    // and the conf flag forces the classic path
    spark.conf.set("spark.graft.denseAgg.fuse", "false")
    try assert(classicDelta {
      DenseCatAgg.groupByOrdinal(df10k, col("code"), 7,
        Seq(DenseCatAgg.Agg(col("v"), "sum", "s"))).collect()
    } == 1L)
    finally spark.conf.set("spark.graft.denseAgg.fuse", "true")
  }

  test("complete-dim probe specialization: values + inner filter stay exact") {
    // dim covering the whole domain, no null values -> specialized
    // codegen (no bitmap loads); semantics must be unchanged,
    // including null and out-of-range fact keys dropping on inner
    val dim = spark.range(0, 50).select(col("id").as("k2"),
      (col("id") * 2).cast("double").as("w2"))
    val fact = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 10L), Row(2L, 49L), Row(3L, 50L), // 50 out of domain
        Row(4L, -1L), Row(5L, null))),
      StructType(Seq(StructField("id", LongType, false),
        StructField("k2", LongType, true))))
    val inner = DenseLookupJoin.lookupJoin(fact, dim, col("k2"), "k2", 50)
    assert(inner.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L))
    assert(inner.filter(col("id") === 2).head.getAs[Double]("w2") == 98.0)
    val left = DenseLookupJoin.lookupJoin(fact, dim, col("k2"), "k2", 50,
      joinType = "left")
    assert(left.count() == 5)
    assert(left.filter(col("id") === 3).head.isNullAt(2)) // padded null
    // incomplete dim still drops absent keys through the bitmap
    val sparseDim = dim.filter(col("k2") =!= 10L)
    val inner2 = DenseLookupJoin.lookupJoin(fact, sparseDim, col("k2"), "k2", 50)
    assert(inner2.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(2L))
    // null-carrying dim values keep the per-row bitmap test
    val nullDim = spark.range(0, 50).select(col("id").as("k2"),
      when(col("id") === 49, lit(null)).otherwise(col("id") * 2)
        .cast("double").as("w2"))
    val inner3 = DenseLookupJoin.lookupJoin(fact, nullDim, col("k2"), "k2", 50)
    assert(inner3.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L)) // key 49 present (inner keeps it)...
    assert(inner3.filter(col("id") === 2).head.isNullAt(2)) // ...value null
  }
}
