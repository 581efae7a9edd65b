package graft

import org.apache.spark.sql.functions._
import graft.operators.DedupResolve

/** Pairs -> connected components -> keep-list (min-id survivor). */
class DedupResolveSpec extends SparkSpec {
  import spark.implicits._

  test("components merge transitively across pairs") {
    // {1,2,3} via 1-2, 2-3; {5,6}; 4 isolated (absent from pairs)
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val comps = DedupResolve.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("long chain converges (diameter > 1 iteration)") {
    val pairs = (10L until 20L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comps = DedupResolve.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.values.toSet === Set(10L))
    assert(comps.size == 11)
  }

  test("LshDedup parameterized pipeline: end-to-end keep-list on near-dup corpus") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),   // near-dup of 1
      (3L, "one two three four five six seven eight"),
      (4L, "one two three four five six seven nine"),          // near-dup of 3
      (5L, "completely different content with no overlap at all")
    ).toDF("doc_id", "text")
    val p = graft.operators.LshDedup.Params(
      shingleWidth = 2, signatureLength = 8, rowsPerBand = 2, verifyThreshold = 0.5)
    // banding math: at jaccard ~0.56 (5 of 9 shingles), candidate
    // probability is high; at ~0 it is ~0
    assert(p.candidateProbability(0.9) > 0.95)
    assert(p.candidateProbability(0.05) < 0.05)
    val kl = graft.operators.LshDedup.dedup(docs, "doc_id", "text", p)
      .select("doc_id", "comp", "keep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(kl.map(_._3).toSeq == Seq(true, false, true, false, true))
    assert(kl.map(_._2).toSeq == Seq(1L, 1L, 3L, 3L, 5L))
  }

  test("non-convergence at maxIter throws instead of returning partial labels") {
    val chain = (0L until 25L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException](
      DedupResolve.connectedComponents(chain, maxIter = 3))
    assert(e.getMessage.contains("not converged"))
  }

  test("hash families agree: md5 oracle lane and xxhash64 production lane find the same pairs") {
    import graft.functions.TextFunctions.{HashFamily, Md5Hash, Xx64Hash}
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "one two three four five six seven eight"),
      (4L, "one two three four five six seven nine"),
      (5L, "completely different content with no overlap at all")
    ).toDF("doc_id", "text")
    def pairsOf(fam: HashFamily): Set[(Long, Long)] =
      graft.operators.LshDedup.nearDupPairs(docs, "doc_id", "text",
          graft.operators.LshDedup.Params(shingleWidth = 2, signatureLength = 8,
            rowsPerBand = 2, verifyThreshold = 0.5, hashFamily = fam))
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val xx = pairsOf(Xx64Hash)
    assert(xx === pairsOf(Md5Hash))
    assert(xx === Set((1L, 2L), (3L, 4L)))
  }

  test("keepList: min id survives, unpaired docs survive as themselves") {
    val docs = (1L to 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kl = DedupResolve.keepList(docs, "doc_id", pairs)
      .select("doc_id", "comp", "keep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(kl.toSeq === Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 4L, true), (5L, 5L, true), (6L, 5L, false)))
    // dedup invariant: kept docs = number of components
    assert(kl.count(_._3) == 3)
  }
}
