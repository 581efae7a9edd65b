package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose q_arrow_sharded (46 s warm in the r18 full battery —
  * the slowest lane by 5x): time the sharded WRITE and the glob
  * READ+agg separately, at the lane's parameters.
  *
  * Usage: SPARK_GRAFT_CPUS=32 tools/run.sh graft.ArrowShProbe <sfDir> <reps>
  */
object ArrowShProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = s"${System.getProperty("java.io.tmpdir")}/arrowsh_probe"
    val narrow = graft.queries.Q.t(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_returnflag")
    def time(tag: String, f: () => Unit): Unit = {
      val t0 = System.nanoTime(); f()
      println(f"  $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    for (rep <- 1 to reps) {
      println(s"rep $rep")
      time("writeSharded lz4", () =>
        graft.sources.ArrowIpc.writeSharded(narrow.repartition(6), dir,
          batchRows = 8192, compression = Some("lz4")))
      time("read+agg", () =>
        graft.sources.Readers.open(spark, s"$dir/part-*.arrow")
          .agg(count(lit(1)), sum(col("l_extendedprice").cast("decimal(38,10)")))
          .write.format("noop").mode("overwrite").save())
      time("writeSharded none", () =>
        graft.sources.ArrowIpc.writeSharded(narrow.repartition(6), dir,
          batchRows = 8192, compression = None))
      time("read+agg (uncomp)", () =>
        graft.sources.Readers.open(spark, s"$dir/part-*.arrow")
          .agg(count(lit(1)), sum(col("l_extendedprice").cast("decimal(38,10)")))
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
