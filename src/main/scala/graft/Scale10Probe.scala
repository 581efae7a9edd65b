package graft

import org.apache.spark.sql.SparkSession

/** Focused check of the 10x scaled-star lane: writes the replicated
  * star (Bench.writeScaled) and times named queries against it —
  * validates the r18 multi-file layout fix without a full battery.
  *
  * Usage: SPARK_GRAFT_CPUS=32 tools/run.sh graft.Scale10Probe <sfDir> <reps> q1 ...
  */
object Scale10Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val scaleDir = s"${System.getProperty("java.io.tmpdir")}/graft_scale10_probe"
    val t0 = System.nanoTime()
    Bench.writeScaled(spark, sfDir, scaleDir)
    println(f"writeScaled ${(System.nanoTime() - t0) / 1e9}%.2f s; " +
      s"lineitem files: ${new java.io.File(s"$scaleDir/lineitem.parquet").list().count(_.endsWith(".parquet"))}")
    for ((n, fn) <- names.map(n => n -> SparkEntry.queries(n))) {
      val ts = (1 to reps).map { _ =>
        val s0 = System.nanoTime()
        fn(spark, scaleDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - s0) / 1e9
      }
      println(f"$n%-26s min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
