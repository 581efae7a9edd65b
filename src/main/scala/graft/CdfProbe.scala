package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Targeted A/B for the r18 Change Data Feed write tax: the same
  * upsert (1% of keys updated + 0.1% inserted) and copy-on-write
  * delete (1% of rows) against an 8M-row 16-file Delta table with
  * CDF off vs on. CDF adds one candidate-bounded scan per op (the
  * change-row staging) — the probe pins that the tax scales with the
  * TOUCHED files, not the table.
  *
  * Usage: SPARK_GRAFT_CPUS=32 tools/run.sh graft.CdfProbe [reps]
  */
object CdfProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("graft_cdfprobe")
      .toString
    import graft.sources.{DeltaLake, FsIO}
    val n = 8_000_000L
    val df = spark.range(0, n).select(col("id"),
      (col("id") % 97).as("g"), (col("id") * 1.5).as("v"))
      .repartitionByRange(16, col("id"))
    val upd = spark.range(0, n / 100).select((col("id") * 100).as("id"),
      lit(-1L).as("g"), lit(0.0).as("v"))
    val ins = spark.range(n, n + n / 1000).select(col("id"),
      lit(-2L).as("g"), lit(1.0).as("v"))
    val src = upd.unionByName(ins)
    val all = collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    val bwPre = BenchProbe.memBandwidthGbps(cpus.toInt)
    (1 to reps).foreach { r =>
      Seq("cdf_off" -> false, "cdf_on" -> true).foreach { case (name, cdf) =>
        val t = s"$root/t-$name-$r.delta"
        FsIO.deleteRecursive(t)
        DeltaLake.toDelta(df, t)
        if (cdf) DeltaLake.enableChangeDataFeed(spark, t)
        val t0 = System.nanoTime()
        DeltaLake.upsert(spark, t, src, Seq("id"))
        all(s"upsert_$name") = (System.nanoTime() - t0) / 1e9 ::
          all(s"upsert_$name")
        val t1 = System.nanoTime()
        DeltaLake.deleteWhere(spark, t, col("g") === 13L)
        all(s"delete_$name") = (System.nanoTime() - t1) / 1e9 ::
          all(s"delete_$name")
        FsIO.deleteRecursive(t)
      }
    }
    val bwPost = BenchProbe.memBandwidthGbps(cpus.toInt)
    def med(xs: List[Double]): Double = { val s = xs.sorted; s(s.length / 2) }
    println("{" +
      s""""probe":"cdf_write_tax","cpus":$cpus,"rows":$n,""" +
      s""""mem_bw_pre":${f"$bwPre%.1f"},"mem_bw_post":${f"$bwPost%.1f"},""" +
      all.toSeq.sortBy(_._1).map { case (nm, xs) =>
        s""""$nm":{"median_sec":${f"${med(xs)}%.3f"},""" +
          s""""reps":[${xs.reverse.map(t => f"$t%.3f").mkString(",")}]}"""
      }.mkString(",") + "}")
    FsIO.deleteRecursive(root)
    spark.stop()
  }
}
