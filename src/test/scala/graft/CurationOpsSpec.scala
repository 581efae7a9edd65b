package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Guarantee-level properties of the round-10 curation primitives —
  * the claims their scaladocs make, asserted on adversarial inputs
  * rather than the oracle corpus. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  /** The q_winnow_fingerprint pipeline's fingerprint SET for one
    * text column (K=4, W=5 — same params as the oracle lane). */
  private def fingerprints(df: org.apache.spark.sql.DataFrame) = {
    val K = 4; val W = 5
    val tks = split(col("text"), " ")
    val n = size(tks)
    val grams = when(n >= K, transform(sequence(lit(0), n - K),
      i => portableHash(concat_ws(" ", slice(tks, i + 1, lit(K))))))
      .otherwise(array().cast("array<bigint>"))
    val ng = size(grams)
    val nWin = greatest(ng - W + 1, lit(1))
    df.select(col("doc_id"), when(ng > 0, array_distinct(
        transform(sequence(lit(0), nWin - 1),
          i => array_min(slice(grams, i + 1, lit(W))))))
      .otherwise(array().cast("array<bigint>")).as("fps"))
  }

  test("winnowing guarantee: shared substring of >= W+K-1 tokens shares a fingerprint") {
    // the Schleimer et al. guarantee: K=4, W=5 -> any shared run of
    // 8+ tokens must produce at least one common fingerprint. Plant
    // an 8-token phrase inside otherwise-disjoint random docs.
    val rnd = new scala.util.Random(99)
    val shared = "quick brown fox jumps over the lazy dog"
    def words(prefix: String, n: Int) =
      Seq.fill(n)(s"$prefix${rnd.nextInt(1000)}").mkString(" ")
    val docs = Seq(
      (0L, words("a", 20) + " " + shared + " " + words("b", 15)),
      (1L, words("c", 5) + " " + shared + " " + words("d", 30)),
      (2L, words("e", 40))) // no shared run
    val fps = fingerprints(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(0L) intersect fps(1L)).nonEmpty)
    assert((fps(0L) intersect fps(2L)).isEmpty)
    // density claim: far fewer fingerprints than grams
    assert(fps(0L).size < 44 - 3) // n_grams for a 44-token doc
  }

  test("count-min sketch never underestimates: est >= exact for EVERY token") {
    // the structural CMS guarantee, checked for the full vocabulary
    // (the oracle lane only probes the top 10)
    val M = 256; val D = 4
    val toks = graft.queries.Q.t(spark, sf0001, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
    def buckets(tok: org.apache.spark.sql.Column) = array((0 until D).map { j =>
      struct(lit(j).as("j"), (universalHash(j, baseHash(tok)) % M).as("b"))
    }: _*)
    val sketch = toks.select(explode(buckets(col("token"))).as("jb"))
      .groupBy(col("jb.j").as("j"), col("jb.b").as("b"))
      .agg(count(lit(1)).as("c"))
    val exact = toks.groupBy("token").agg(count(lit(1)).as("exact_n"))
    val probes = exact.select(col("token"), col("exact_n"),
        explode(buckets(col("token"))).as("jb"))
      .select(col("token"), col("exact_n"), col("jb.j").as("j"), col("jb.b").as("b"))
    val under = probes.join(sketch, Seq("j", "b"))
      .groupBy("token", "exact_n").agg(min(col("c")).as("est"))
      .where(col("est") < col("exact_n"))
    assert(under.count() == 0)
  }
}
