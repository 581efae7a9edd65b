package graft

import org.apache.spark.sql.SparkSession

/** Interleaved A/B probe for the round-12 quality-classifier lane:
  * interpreted HOF formulation (transform-built bigrams +
  * filter/transform/aggregate weight sum) vs the codegen'd
  * [[graft.functions.FeatureWeightSum]] kernel over
  * [[graft.functions.HashStrings]]. Min over interleaved pairs in one
  * JVM — the ROUND NOTES r4 measurement protocol.
  *
  * Usage: SPARK_GRAFT_CPUS=8 tools/run.sh graft.ClassifierProbe [sfDir] [reps]
  */
object ClassifierProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
    import graft.functions.TextFunctions._
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val (a, b) = (uhashA(7), uhashB(7))
    val B = 4096

    // old lane: every stage an interpreted higher-order lambda — the
    // pre-kernel formulation of exactly the same math
    def oldFrame() = {
      val toks = split(col("text"), " ")
      val n = size(toks)
      val bigrams = when(n >= 2, transform(sequence(lit(0), n - 2),
        i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2))))
        .otherwise(array().cast("array<string>"))
      val feats = array_distinct(concat(toks, bigrams))
      val hashes = transform(feats, f => portableHash(f, Md5Hash))
      val st = TextFunctions.featureWeightSumCols(hashes, B, a, b)
      graft.queries.Q.t(spark, sfDir, "documents")
        .select(col("doc_id"), st.as("st"))
        .select(col("doc_id"), col("st.n_feats"), col("st.wsum_milli"))
        .orderBy("doc_id")
    }
    // new lane: the q_quality_classifier shape (ShingleStrings +
    // HashStrings + FeatureWeightSum kernels, one codegen span)
    def newFrame() = {
      val toks = split(col("text"), " ")
      val feats = array_distinct(concat(toks, TextFunctions.gramStrings(toks, 2)))
      val hashes = TextFunctions.hashedGrams(feats, Md5Hash, 60)
      graft.queries.Q.t(spark, sfDir, "documents")
        .select(col("doc_id"),
          TextFunctions.featureWeightSum(hashes, B, a, b).as("st"))
        .select(col("doc_id"), col("st.n_feats"), col("st.wsum_milli"))
        .orderBy("doc_id")
    }

    // the two lanes must agree bit-for-bit before timing means anything
    val diff = oldFrame().exceptAll(newFrame()).count() +
      newFrame().exceptAll(oldFrame()).count()
    require(diff == 0L, s"old/new lanes disagree on $diff rows")

    val lanes = Seq("old_hof" -> (() => oldFrame()),
      "new_kernel" -> (() => newFrame()))
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
