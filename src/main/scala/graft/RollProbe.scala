package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition of the block-rolling lanes (r18 opt session 2):
  * times the shared deterministic index alone, the fused rolling pass
  * without the final global sort, and the whole lane — so the residual
  * cost attribution (index build vs window machinery vs output order)
  * is measured, not guessed.
  *
  * Usage: SPARK_GRAFT_CPUS=32 tools/run.sh graft.RollProbe <sfDir> <reps>
  */
object RollProbe {
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
    import graft.operators.OrderedOps

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(run: () => Unit): Double = {
      val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
    }

    val keys = Seq("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber",
      "l_extendedprice")
    def base = graft.sources.Tables.withRowIndexBy(
      graft.queries.Q.t(spark, sfDir, "lineitem")
        .select(keys.map(col) :+ col("l_quantity"): _*), keys, buckets = 8)
    def stagedIn = {
      val xd = col("l_quantity").cast("double")
      base.withColumn("__x", xd.cast(graft.queries.Q.DEC))
        .withColumn("__x2", (xd * xd).cast(graft.queries.Q.DEC))
    }
    def rolled = OrderedOps.rollingAggMulti(stagedIn,
      Seq(OrderedOps.RollSpec("__x", "sum", "__s1"),
        OrderedOps.RollSpec("__x2", "sum", "__s2"),
        OrderedOps.RollSpec("__x", "count", "__n")), 5, blockSize = 8192L)
    def unsorted = rolled.select(col("row_index"), col("__n").as("n"),
      round(col("__s2").cast("double") / col("__n") -
        (col("__s1").cast("double") / col("__n")) *
          (col("__s1").cast("double") / col("__n")), 6).as("roll_var"))

    val blocks: Seq[(String, () => Unit)] = Seq(
      "index_only" -> (() => noop(base)),
      "rolled_unsorted" -> (() => noop(unsorted)),
      "full_lane" -> (() => noop(
        SparkEntry.queries("q_rolling_block")(spark, sfDir))))
    for ((_, f) <- blocks) f() // warmup
    val acc = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (_ <- 1 to reps; (n, f) <- blocks) acc(n) = time(f) :: acc(n)
    for ((n, _) <- blocks)
      println(f"$n%-16s min=${acc(n).min}%.3f all=${acc(n).reverse.map(x => f"$x%.2f").mkString(",")}")
    spark.stop()
  }
}
