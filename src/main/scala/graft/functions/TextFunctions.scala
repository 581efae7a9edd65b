package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis / deduplication building blocks for training-data
  * pipelines (SURVEY.md §7.1 M8): portable hashing, n-gram shingles,
  * MinHash signatures, LSH band keys, SimHash, and language-ID
  * heuristics. Everything is a pure `Column` composition over one row
  * (no shuffle, no UDF) so the per-document stage is embarrassingly
  * parallel; only the candidate-pair join shuffles, and only on short
  * band-key/bucket columns — the design that holds at 100 TB.
  *
  * Hash function: the first 15 hex chars (60 bits) of md5, which both
  * Spark (`conv(substring(md5(x),1,15),16,10)`) and the DuckDB oracle
  * (`('0x' || substring(md5(x),1,15))::BIGINT`) compute identically.
  * Salted variants H_i(s) = H(i || ':' || s) give the k independent
  * hash families MinHash needs.
  */
object TextFunctions {

  /** 60-bit md5-derived hash of a string column (never negative). */
  def portableHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Salted hash family member i. */
  def saltedHash(i: Int, c: Column): Column =
    portableHash(concat(lit(i.toString), lit(":"), c))

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles of a text column (empty array when
    * the doc is shorter than n tokens). */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", (1 to n).map(j => element_at(toks, i + j)): _*)))
        .otherwise(array().cast("array<string>")))
  }

  /** MinHash signature: array of k minima of salted shingle hashes.
    * Empty shingle set -> -1 sentinel (never a real hash value). */
  def minhashSignature(shingleArr: Column, k: Int): Column =
    array((0 until k).map { i =>
      coalesce(array_min(transform(shingleArr, s => saltedHash(i, s))), lit(-1L))
    }: _*)

  /** LSH band keys: hash each band of `rowsPerBand` consecutive
    * signature entries into one bucket key. Docs sharing any band key
    * become candidate pairs. Returns array of (bandIdx, bandKey)
    * structs ready to explode. */
  def lshBandKeys(signature: Column, k: Int, rowsPerBand: Int): Column = {
    val nBands = k / rowsPerBand
    array((0 until nBands).map { b =>
      val parts = (0 until rowsPerBand).map { r =>
        element_at(signature, b * rowsPerBand + r + 1).cast("string")
      }
      struct(lit(b).as("band"),
        portableHash(concat_ws("_", parts: _*)).as("bkey"))
    }: _*)
  }

  /** Jaccard similarity of two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0.0, lit(0.0)).otherwise(inter / union)
  }

  /** nBits-bit SimHash over a (multiset) token array: bit j is set when
    * more than half the token hashes have bit j set. */
  def simhash(toks: Column, nBits: Int): Column = {
    val hashes = transform(toks, t => saltedHash(99, t))
    val n = size(hashes)
    (0 until nBits).map { j =>
      when(size(filter(hashes, h =>
        shiftright(h, j).bitwiseAND(lit(1L)) === 1L)) * 2 > n,
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Hamming distance between two long-encoded SimHash values (used by
    * near-dup thresholding). bit_count is codegen'd. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")

  /** Marker-word language scores: overlap size between the doc's
    * distinct tokens and each language's marker list; prediction is the
    * first language reaching the max score (deterministic tie-break by
    * list order). */
  def langIdScore(toksDistinct: Column, markers: Seq[String]): Column =
    size(array_intersect(toksDistinct,
      array(markers.map(lit): _*))).cast("long")

  def langIdPredict(toksDistinct: Column, markerSets: Seq[(String, Seq[String])]): Column = {
    val scores = markerSets.map { case (lang, ws) => lang -> langIdScore(toksDistinct, ws) }
    val maxScore = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, sc), acc) =>
      when(sc === maxScore, lit(lang)).otherwise(acc)
    }
  }
}
