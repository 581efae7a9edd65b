package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decompose q_join_positional's cost: time each driver job of the
  * bucketed row-index build (count, boundary sample, bucket counts,
  * windowed index) per side, plus the final join — so optimization
  * effort lands where the seconds are (guide §1.1).
  *
  * Usage: SPARK_GRAFT_CPUS=32 tools/run.sh graft.PosJoinProbe <sfDir> <reps>
  */
object PosJoinProbe {
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
    import graft.queries.Q.t

    def time(tag: String, f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); val s = (System.nanoTime() - t0) / 1e9
      println(f"  $tag%-28s $s%.3f"); s
    }

    for (rep <- 1 to reps) {
      println(s"rep $rep")
      val li = t(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      val ordCols = Seq("l_orderkey", "l_linenumber", "l_extendedprice")
      val nb = math.max(spark.sparkContext.defaultParallelism, 8)
      val k = col(ordCols.head)
      var n = 0L
      time("li count", () => n = li.count())
      val frac = math.min(1.0, (nb * 200.0) / n)
      var sampled: Array[Any] = null
      time("li sample+collect", () => {
        sampled = li.select(k.as("__k")).where(col("__k").isNotNull)
          .sample(withReplacement = false, frac, 42L).collect().map(_.get(0))
          .sortBy(_.asInstanceOf[Long])
      })
      val boundaries = (1 until nb).map(i => sampled(i * sampled.length / nb)).distinct.toArray
      val bucketExpr = when(k.isNull, lit(-1)).otherwise(
        boundaries.foldLeft(lit(0)) { (acc, b) =>
          acc + when(k > lit(b), 1).otherwise(0)
        })
      val bucketed = li.withColumn("__bucket", bucketExpr)
      time("li bucket counts", () =>
        bucketed.groupBy("__bucket").count().collect())
      time("li window index (noop)", () => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("__bucket")).orderBy(ordCols.map(col): _*)
        bucketed.withColumn("rn", row_number().over(w).cast("long"))
          .where(col("rn") <= 500)
          .write.format("noop").mode("overwrite").save()
      })
      time("full q_join_positional", () =>
        SparkEntry.queries("q_join_positional")(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
