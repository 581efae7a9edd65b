package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage decomposition of q_tfidf_cosine (r18 opt session 2): times
  * each building block of the lane separately — corpus tokenize+tf,
  * the window-df weighted frame, candidate pairs, the dot join, and
  * the assembled lane — so the optimization targets the block that
  * actually owns the wall-clock instead of the whole pipeline.
  *
  * Usage: SPARK_GRAFT_CPUS=32 tools/run.sh graft.TfidfProbe <sfDir> <reps>
  */
object TfidfProbe {
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
    import graft.queries.Q.{t, dsumD}

    def time(run: () => Unit): Double = {
      val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def docs2 = t(spark, sfDir, "documents").select(col("doc_id"),
      concat(col("text"), lit(" rg"), (col("doc_id") / 10).cast("long")
        .cast("string")).as("text2"))
    def tok = docs2.select(col("doc_id"), explode(split(col("text2"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    def nDocs = docs2.agg(count(lit(1)).as("__n"))
    def tfWfresh = tok.withColumn("df", count(lit(1)).over(Window.partitionBy(col("tok"))))
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("tok"), col("df"),
        round(col("tf").cast("double") *
          round(log(col("__n").cast("double") / col("df").cast("double")), 6),
          6).as("w"))

    // persisted copy for the downstream blocks
    val tfW = tfWfresh.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    noop(tfW) // materialize once
    def w = tfW.select(col("doc_id"), col("tok"), col("w"))
    def rareDocs = tfW.where(col("df") <= 25).select(col("tok"), col("doc_id"))
    def pairs = rareDocs.select(col("tok"), col("doc_id").as("a"))
      .join(rareDocs.select(col("tok"), col("doc_id").as("b")), Seq("tok"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    def norms = w.groupBy(col("doc_id"))
      .agg(sqrt(dsumD(round(col("w") * col("w"), 6))).as("nrm"))
    def wa = w.select(col("doc_id").as("a"), col("tok"), col("w").as("wa"))
    def wb = w.select(col("doc_id").as("b"), col("tok"), col("w").as("wb"))
    def dot = pairs.join(wa, Seq("a")).join(wb, Seq("b", "tok"))
      .groupBy(col("a"), col("b"))
      .agg(dsumD(round(col("wa") * col("wb"), 6)).as("dot"))
    def fin = dot
      .join(norms.select(col("doc_id").as("a"), col("nrm").as("na")), Seq("a"))
      .join(norms.select(col("doc_id").as("b"), col("nrm").as("nb")), Seq("b"))
      .select(col("a").as("doc_a"), col("b").as("doc_b"),
        round(col("dot") / (col("na") * col("nb")), 6).as("cos"))
      .orderBy("doc_a", "doc_b")

    val blocks: Seq[(String, () => Unit)] = Seq(
      "tok_tf" -> (() => noop(tok)),
      "tfW_fresh" -> (() => noop(tfWfresh)),
      "norms_cached" -> (() => noop(norms)),
      "pairs_cached" -> (() => noop(pairs)),
      "dot_cached" -> (() => noop(dot)),
      "final_cached" -> (() => noop(fin)),
      "full_lane" -> (() => noop(SparkEntry.queries("q_tfidf_cosine")(spark, sfDir))))
    for ((_, f) <- blocks) f() // warmup
    val acc = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (_ <- 1 to reps; (n, f) <- blocks) acc(n) = time(f) :: acc(n)
    for ((n, _) <- blocks)
      println(f"$n%-14s min=${acc(n).min}%.3f all=${acc(n).reverse.map(x => f"$x%.2f").mkString(",")}")
    spark.stop()
  }
}
