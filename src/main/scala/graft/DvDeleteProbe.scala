package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Targeted A/B for the DV-emitting deleteWhere's per-file bitmap
  * aggregation (r16 verdict #4): the roaring-union
  * TypedImperativeAggregate (buffer = compressed bitmap) vs the
  * collect_list fallback (buffer = 8 B per deleted row). One 8M-row
  * single-file Delta table, ~90% deleted — the shape that
  * concentrates the collect_list buffer in one task.
  *
  * Usage: SPARK_GRAFT_CPUS=32 tools/run.sh graft.DvDeleteProbe [reps]
  */
object DvDeleteProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("graft_dvprobe")
      .toString
    val df = spark.range(0, 8_000_000L).select(
      col("id"), (col("id") % 10).as("m")).coalesce(1)
    import graft.sources.{DeltaLake, FsIO}
    val all = collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    val bwPre = BenchProbe.memBandwidthGbps(cpus.toInt)
    (1 to reps).foreach { r =>
      Seq("unionAgg" -> "true", "collect_list" -> "false").foreach {
        case (name, flag) =>
          val t = s"$root/t-$name-$r.delta"
          FsIO.deleteRecursive(t)
          DeltaLake.toDelta(df, t)
          spark.conf.set("spark.graft.dv.unionAgg", flag)
          val t0 = System.nanoTime()
          DeltaLake.deleteWhere(spark, t, col("m") =!= 0,
            viaDeletionVectors = true)
          all(name) = (System.nanoTime() - t0) / 1e9 :: all(name)
          spark.conf.unset("spark.graft.dv.unionAgg")
          FsIO.deleteRecursive(t)
      }
    }
    val bwPost = BenchProbe.memBandwidthGbps(cpus.toInt)
    def med(xs: List[Double]): Double = { val s = xs.sorted; s(s.length / 2) }
    println("{" +
      s""""probe":"dv_delete","cpus":$cpus,"rows":8000000,"deleted_pct":90,""" +
      s""""mem_bw_pre":${f"$bwPre%.1f"},"mem_bw_post":${f"$bwPost%.1f"},""" +
      all.toSeq.sortBy(_._1).map { case (nm, xs) =>
        s""""$nm":{"median_sec":${f"${med(xs)}%.3f"},""" +
          s""""reps":[${xs.reverse.map(t => f"$t%.3f").mkString(",")}]}"""
      }.mkString(",") + "}")
    FsIO.deleteRecursive(root)
    spark.stop()
  }
}
