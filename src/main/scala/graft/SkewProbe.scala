package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Targeted A/B for the skew-join demonstration pair (the r15 verdict
  * flagged the recorded battery numbers as window-poisoned and asked
  * for a committed healthy-window median pair): the exact Bench lane
  * definitions, run interleaved in one fresh JVM with mem_bw
  * brackets, medians + all reps printed.
  *
  * Usage: SPARK_GRAFT_CPUS=32 tools/run.sh graft.SkewProbe [reps]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val skewN = 20_000_000L
    def skewLeft = spark.range(skewN).select(
      when(col("id") % 2 === 0, lit(0L))
        .otherwise(pmod(hash(col("id")), lit(10000)).cast("long")).as("k"),
      (col("id") % 1000).cast("double").as("v"))
    val skewRight = spark.range(10000L).select(col("id").as("k"),
      (col("id") % 97).cast("double").as("w"))
    val lanes: Seq[(String, () => DataFrame)] = Seq(
      "q_skew_join_plain" -> (() => skewLeft.join(skewRight, "k")
        .agg(sum(col("v") + col("w")).as("s"), count(lit(1)).as("n"))),
      "q_skew_join_salted" -> (() => graft.operators.SkewJoin
        .saltedJoin(skewLeft, skewRight, Seq("k"), salt = 32)
        .agg(sum(col("v") + col("w")).as("s"), count(lit(1)).as("n"))))

    lanes.foreach { case (_, mk) => mk().count() } // warm
    val all = collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    val bwPre = BenchProbe.memBandwidthGbps(cpus.toInt)
    (1 to reps).foreach { _ =>
      lanes.foreach { case (name, mk) =>
        val t0 = System.nanoTime()
        mk().count()
        all(name) = (System.nanoTime() - t0) / 1e9 :: all(name)
      }
    }
    val bwPost = BenchProbe.memBandwidthGbps(cpus.toInt)
    def med(xs: List[Double]): Double = {
      val s = xs.sorted; s(s.length / 2)
    }
    println("{" +
      s""""probe":"skew_join","cpus":$cpus,""" +
      s""""mem_bw_pre":${f"$bwPre%.1f"},"mem_bw_post":${f"$bwPost%.1f"},""" +
      lanes.map { case (n, _) =>
        s""""$n":{"median_sec":${f"${med(all(n))}%.3f"},""" +
          s""""reps":[${all(n).reverse.map(t => f"$t%.3f").mkString(",")}]}"""
      }.mkString(",") + "}")
    spark.stop()
  }
}
