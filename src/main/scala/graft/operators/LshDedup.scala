package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** The MinHash-LSH near-duplicate pipeline as a reusable, PARAMETERIZED
  * operator (the query battery pins k=8/r=2 for its oracle; real
  * corpora tune these: candidate-pair probability at jaccard s is
  * 1-(1-s^r)^(k/r), so r controls the similarity threshold knee and
  * k/r the number of bands/recall).
  *
  * Scale shape (same as the oracle-gated battery): documents reduce to
  * 28-bit shingle-hash SETS in the first projection; the band join
  * moves only (doc_id, band, 8-byte key); jaccard verification joins
  * hash sets, never text. End-to-end: pairs -> connected components ->
  * keep-list via [[DedupResolve]].
  */
object LshDedup {

  final case class Params(
      shingleWidth: Int = 3,
      signatureLength: Int = 8, // k: total minhash functions
      rowsPerBand: Int = 2,     // r: bands = k / r
      verifyThreshold: Double = 0.8,
      // xxhash64 by default: codegen'd long arithmetic, no hex-string
      // round-trip (the md5 family costs ~10× more and exists only for
      // DuckDB oracle bit-parity in the query battery).
      hashFamily: HashFamily = Xx64Hash) {
    require(signatureLength % rowsPerBand == 0, "signatureLength must be divisible by rowsPerBand")
    /** Probability a pair at jaccard `s` becomes a candidate. */
    def candidateProbability(s: Double): Double =
      1.0 - math.pow(1.0 - math.pow(s, rowsPerBand), signatureLength / rowsPerBand)
  }

  /** doc_id + distinct shingle-hash set (the only pass over text). */
  def hashedShingles(docs: DataFrame, idCol: String, textCol: String,
                     p: Params = Params()): DataFrame =
    docs.select(col(idCol).as("doc_id"), shingles(col(textCol), p.shingleWidth).as("sh"))
      .select(col("doc_id"), shingleHashes(col("sh"), p.hashFamily).as("hs"))

  /** (doc_id, band, bkey) LSH index entries — the exploded per-band
    * bucket keys (shared by the batch join and the streaming filter). */
  def bandEntries(docs: DataFrame, idCol: String, textCol: String,
                  p: Params = Params()): DataFrame =
    hashedShingles(docs, idCol, textCol, p)
      .select(col("doc_id"), minhashSignature(col("hs"), p.signatureLength).as("sig"))
      .select(col("doc_id"),
        explode(lshBandKeys(col("sig"), p.signatureLength, p.rowsPerBand, p.hashFamily)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))

  /** Verified near-duplicate pairs (id_a < id_b, jaccard >= threshold). */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   p: Params = Params()): DataFrame = {
    val hs = hashedShingles(docs, idCol, textCol, p)
    val bands = bandEntries(docs, idCol, textCol, p)
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    cand
      .join(hs.select(col("doc_id").as("id_a"), col("hs").as("hs_a")), "id_a")
      .join(hs.select(col("doc_id").as("id_b"), col("hs").as("hs_b")), "id_b")
      .select(col("id_a"), col("id_b"), jaccard(col("hs_a"), col("hs_b")).as("jac"))
      .where(col("jac") >= p.verifyThreshold)
  }

  /** Full pipeline: docs -> keep-list (one row per doc, `keep` flag,
    * `comp` = canonical survivor id). */
  def dedup(docs: DataFrame, idCol: String, textCol: String,
            p: Params = Params()): DataFrame =
    DedupResolve.keepList(docs, idCol,
      nearDupPairs(docs, idCol, textCol, p).select("id_a", "id_b"))
}
