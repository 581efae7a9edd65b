package graft

import org.apache.spark.sql.functions._
import graft.queries.Q

/** Plan-quality gates: the optimizations the 100 TB design depends on
  * must be visible in the physical plan — filter/projection pushdown to
  * the parquet scan, broadcast for small join sides, partial (map-side)
  * aggregation, and whole-stage codegen over the hot path. These are
  * regression tests for plan SHAPE, not timing. */
class PlanQualitySpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter pushdown reaches the parquet scan") {
    val df = Q.t(spark, sf0001, "lineitem")
      .where(col("l_quantity") < 10)
      .select("l_orderkey", "l_quantity")
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,10"), p)
  }

  test("column pruning: scan reads only needed columns") {
    val df = Q.t(spark, sf0001, "lineitem")
      .groupBy("l_returnflag").agg(sum("l_quantity"))
    val p = plan(df)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_extendedprice"), readSchema)
  }

  test("small dimension join broadcasts") {
    val li = Q.t(spark, sf0001, "lineitem")
    val df = li.join(Q.t(spark, sf0001, "supplier"), li("l_suppkey") === col("s_suppkey"))
    assert(plan(df).contains("BroadcastHashJoin"), plan(df).take(2000))
  }

  test("aggregation is partial/final (map-side combine)") {
    val df = Q.t(spark, sf0001, "lineitem")
      .groupBy("l_returnflag").agg(sum("l_quantity"))
    val p = plan(df)
    assert(p.contains("partial_sum") || "HashAggregate.*partial".r.findFirstIn(p).isDefined, p.take(2000))
  }

  test("scalar expression pipeline stays in whole-stage codegen") {
    val df = Q.t(spark, sf0001, "lineitem").select(
      (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    df.collect() // finalize THIS QueryExecution's AQE plan
    val p = plan(df)
    // codegen stages render as "*(n) Operator" in the executed plan
    assert(p.contains("WholeStageCodegen") || p.contains("*(1)"), p.take(1500))
  }

  test("facade filter + virtual column lower into the scan pushdown") {
    val f = VxFrame(Q.t(spark, sf0001, "lineitem"))
      .withVirtualColumn("rev", "l_extendedprice * (1 - l_discount)")
      .filter("l_quantity < 5")
    val p = plan(f.df.select(col("rev")))
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,5"), p)
  }

  test("hive-partitioned export prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    graft.sources.Export.exportPartitioned(
      Q.t(spark, sf0001, "events").select(col("event_type"), col("value")),
      s"$dir/events", Seq("event_type"))
    val df = spark.read.parquet(s"$dir/events").where(col("event_type") === "click")
    val p = plan(df)
    // the partition filter must act at planning time, not as a row filter
    assert(p.contains("PartitionFilters") && p.contains("event_type"), p.take(2000))
    val scanned = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f.relation.location.inputFiles
    }.flatten
    assert(scanned.nonEmpty)
    assert(df.count() > 0)
  }

  test("bucketed tables: join and groupBy on the bucket key plan with zero Exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bkt").toString
    val left = spark.range(10000).select(col("id").as("k"),
      (col("id") % 7).cast("double").as("v"))
    val right = spark.range(1000).select(col("id").as("k"),
      (col("id") % 5).cast("double").as("w"))
    graft.sources.Export.exportBucketed(left, "bkt_spec_l", s"$dir/l", Seq("k"), 4, Seq("k"))
    graft.sources.Export.exportBucketed(right, "bkt_spec_r", s"$dir/r", Seq("k"), 4, Seq("k"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ: the no-broadcast regime bucketing exists for
    try {
      val joined = spark.table("bkt_spec_l").join(spark.table("bkt_spec_r"), "k")
      assert(!plan(joined).contains("Exchange"), plan(joined).take(2000))
      assert(joined.count() == 1000)
      val agg = spark.table("bkt_spec_l").groupBy("k").agg(sum("v"))
      assert(!plan(agg).contains("Exchange"), plan(agg).take(2000))
      assert(agg.count() == 10000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("IVF assignment plan is shuffle-free") {
    val emb = Q.t(spark, sf0001, "embeddings")
    val cents = graft.operators.SimilaritySearch.trainTakeFirst(emb, "vec_id", "embedding", 4)
    val assigned = graft.operators.SimilaritySearch.assignCells(
      emb.where(col("vec_id") >= 4), "embedding", cents)
    val p = plan(assigned)
    // loader may repartition the single-row-group scan; beyond that the
    // assignment itself must add no exchange
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 1, p.take(2000))
  }
}
