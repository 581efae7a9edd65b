package graft

import org.apache.spark.sql.SparkSession

/** Interleaved A/B probe for the winnowing lanes (round-11): old
  * interpreted transform/slice formulation vs the codegen'd
  * [[graft.functions.TokenGramHashes]]/[[graft.functions.SlidingMin]]
  * kernels, in both hash families. Min over interleaved pairs in one
  * JVM — the measurement protocol ROUND NOTES r4 established.
  *
  * Usage: SPARK_GRAFT_CPUS=8 tools/run.sh graft.WinnowProbe [sfDir] [reps]
  */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def oldFrame(fam: HashFamily) = {
      val K = 4; val W = 5
      val tks = split(col("text"), " ")
      val n = size(tks)
      val grams = when(n >= K, transform(sequence(lit(0), n - K),
        i => portableHash(concat_ws(" ", slice(tks, i + 1, lit(K))), fam)))
        .otherwise(array().cast("array<bigint>"))
      val ng = size(grams)
      val nWin = greatest(ng - W + 1, lit(1))
      val fps = when(ng > 0, array_distinct(
          transform(sequence(lit(0), nWin - 1),
            i => array_min(slice(grams, i + 1, lit(W))))))
        .otherwise(array().cast("array<bigint>"))
      graft.queries.Q.t(spark, sfDir, "documents").select(col("doc_id"),
          ng.cast("long").as("n_grams"),
          size(fps).cast("long").as("n_fingerprints"),
          array_min(fps).as("fp_min"), array_max(fps).as("fp_max"))
        .orderBy("doc_id")
    }
    val lanes = Seq(
      "old_md5" -> (() => oldFrame(Md5Hash)),
      "new_md5" -> (() => graft.queries.DedupQueries.winnowFrame(spark, sfDir, Md5Hash)),
      "old_xx64" -> (() => oldFrame(Xx64Hash)),
      "new_xx64" -> (() => graft.queries.DedupQueries.winnowFrame(spark, sfDir, Xx64Hash)))
    // warmup
    for ((_, fn) <- lanes) fn().write.format("noop").mode("overwrite").save()
    val times = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (_ <- 1 to reps; (name, fn) <- lanes) {
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      times(name) = ((System.nanoTime() - t0) / 1e9) :: times(name)
    }
    for ((name, _) <- lanes)
      println(f"$name%-10s min=${times(name).min}%.3f  all=${times(name).reverse.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
