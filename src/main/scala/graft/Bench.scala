package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop sink forces full evaluation of every output column —
    // .count() would let Catalyst prune projection work on map-only
    // queries and report fake sub-ms times for them.
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // headline throughput: rows/sec of a canonical multi-agg groupBy
    // over lineitem (the BASELINE.md "groupby aggregation" metric)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val nRows = li.count()
    li.groupBy("l_returnflag").count().count() // warm
    val t0 = System.nanoTime()
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(org.apache.spark.sql.functions.sum("l_quantity"),
        org.apache.spark.sql.functions.avg("l_extendedprice"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)))
      .write.format("noop").mode("overwrite").save()
    val aggRps = nRows / ((System.nanoTime() - t0) / 1e9)
    // pure-compute throughput (asv-aggregates style, reference
    // benchmarks/aggregates.py): generated rows, no IO — categorical
    // groupby and a 2-d binby grid over 1e7 rows
    import org.apache.spark.sql.functions._
    val gen = spark.range(10_000_000L).select(
      (col("id") % 100).as("k"),
      (col("id") % 1000).cast("double").as("x"),
      ((col("id") * 7) % 1000).cast("double").as("y"))
    gen.groupBy("k").count().count() // warm + materialize codegen
    val t1 = System.nanoTime()
    gen.groupBy("k").agg(sum("x"), avg("y"), count(lit(1)))
      .write.format("noop").mode("overwrite").save()
    val groupbyRps = 10_000_000L / ((System.nanoTime() - t1) / 1e9)
    val t2 = System.nanoTime()
    gen.groupBy(floor(col("x") / 10).cast("int").as("bx"),
        floor(col("y") / 10).cast("int").as("by"))
      .agg(count(lit(1)), sum("x"))
      .write.format("noop").mode("overwrite").save()
    val binbyRps = 10_000_000L / ((System.nanoTime() - t2) / 1e9)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","agg_rows_per_sec":${aggRps.toLong},"groupby_gen_rows_per_sec":${groupbyRps.toLong},"binby_gen_rows_per_sec":${binbyRps.toLong}}""")
    spark.stop()
  }
}
