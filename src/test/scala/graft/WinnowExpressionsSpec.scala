package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._

/** The winnowing kernels ([[graft.functions.TokenGramHashes]],
  * [[graft.functions.SlidingMin]]) must be bit-identical to the
  * Column-composed formulation they replace (transform/slice/concat_ws
  * lambdas) — that formulation is what the DuckDB oracle mirrors. */
class WinnowExpressionsSpec extends SparkSpec {

  /** The pre-r11 interpreted formulation, verbatim. */
  private def referenceGrams(text: org.apache.spark.sql.Column, k: Int,
      fam: HashFamily) = {
    val tks = split(text, " ")
    val n = size(tks)
    when(n >= k, transform(sequence(lit(0), n - k),
      i => portableHash(concat_ws(" ", slice(tks, i + 1, lit(k))), fam)))
      .otherwise(array().cast("array<bigint>"))
  }

  private def referenceWindowMins(grams: org.apache.spark.sql.Column, w: Int) = {
    val ng = size(grams)
    val nWin = greatest(ng - w + 1, lit(1))
    when(ng > 0, transform(sequence(lit(0), nWin - 1),
        i => array_min(slice(grams, i + 1, lit(w)))))
      .otherwise(array().cast("array<bigint>"))
  }

  private val textCases = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c d", // exactly k tokens for k=4
    "a b c",   // fewer than k
    "",        // one empty token after split
    "repeat repeat repeat repeat repeat repeat repeat",
    "x", "one two",
    "padded  double  spaces produce empty tokens here",
    "unicode élan naïve 日本語 emoji 🙂 mixed ascii tail words here now")

  private def docs = {
    import spark.implicits._
    textCases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
  }

  for (fam <- Seq(Md5Hash, Xx64Hash)) {
    val famName = if (fam == Md5Hash) "md5" else "xxhash64"

    test(s"token gram hashes match the interpreted formulation ($famName)") {
      for (k <- Seq(1, 2, 4, 7)) {
        val got = docs.select(col("id"),
          tokenGramHashes(split(col("text"), " "), k, fam).as("g"))
        val want = docs.select(col("id"), referenceGrams(col("text"), k, fam).as("g"))
        assert(got.collect().toSeq.sortBy(_.getLong(0)) ===
          want.collect().toSeq.sortBy(_.getLong(0)), s"k=$k fam=$famName")
      }
    }
  }

  test("token gram hashes on random texts, through whole-stage codegen") {
    // RDD-backed frame (no LocalRelation constant folding) forces the
    // doGenCode path inside a real WholeStageCodegen span
    val rnd = new scala.util.Random(41)
    val words = Vector("alpha", "beta", "g", "delta42", "ε", "zz top", "_")
    val texts = (0 until 300).map { i =>
      (i.toLong, (0 until rnd.nextInt(30)).map(_ => words(rnd.nextInt(words.size - 1))).mkString(" "))
    }
    val rdd = spark.sparkContext.parallelize(texts, 4)
    val df = spark.createDataFrame(rdd).toDF("id", "text")
    val got = df.select(col("id"), tokenGramHashes(split(col("text"), " "), 3, Md5Hash).as("g"))
    val want = df.select(col("id"), referenceGrams(col("text"), 3, Md5Hash).as("g"))
    assert(got.collect().toSeq.sortBy(_.getLong(0)) ===
      want.collect().toSeq.sortBy(_.getLong(0)))
    // and the plan actually codegens the projection ("*(n)" is the
    // WholeStageCodegen marker in the simple plan string)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("sliding min matches the interpreted formulation on random arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val arrays = (0 until 400).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(25))(rnd.nextLong() & ((1L << 60) - 1)))
    }
    for (w <- Seq(1, 2, 5, 9, 40)) {
      val df = arrays.toDF("id", "a")
      val got = df.select(col("id"), slidingWindowMin(col("a"), w).as("m"))
      val want = df.select(col("id"), referenceWindowMins(col("a"), w).as("m"))
      assert(got.collect().toSeq.sortBy(_.getLong(0)) ===
        want.collect().toSeq.sortBy(_.getLong(0)), s"w=$w")
    }
  }

  test("sliding min edge cases: empty, shorter than window, nulls") {
    import spark.implicits._
    val df = Seq(
      (0L, Some(Seq[Option[Long]]())),
      (1L, Some(Seq[Option[Long]](Some(7L)))),
      (2L, Some(Seq[Option[Long]](Some(9L), Some(3L), Some(5L)))),
      (3L, Some(Seq[Option[Long]](None, Some(4L), None))),
      (4L, Some(Seq[Option[Long]](None, None))),
      (5L, None)
    ).toDF("id", "a")
    val out = df.select(col("id"), slidingWindowMin(col("a"), 5).as("m"))
      .collect().sortBy(_.getLong(0))
    assert(out(0).getSeq[Any](1) === Seq())
    assert(out(1).getSeq[Any](1) === Seq(7L))
    assert(out(2).getSeq[Any](1) === Seq(3L))   // one window over all 3
    assert(out(3).getSeq[Any](1) === Seq(4L))   // nulls ignored like array_min
    assert(out(4).getSeq[Any](1) === Seq(null)) // all-null window -> null elem
    assert(out(5).isNullAt(1))                  // null array -> null
  }

  test("sliding min nullable path matches array_min window semantics") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val arrays = (0 until 200).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(15))(
        if (rnd.nextInt(4) == 0) None else Some(rnd.nextLong() >>> 8)))
    }
    val df = arrays.toDF("id", "a")
    for (w <- Seq(2, 5)) {
      val got = df.select(col("id"), slidingWindowMin(col("a"), w).as("m"))
      val want = df.select(col("id"), referenceWindowMins(col("a"), w).as("m"))
      assert(got.collect().toSeq.sortBy(_.getLong(0)) ===
        want.collect().toSeq.sortBy(_.getLong(0)), s"w=$w")
    }
  }

  test("winnow frames: hash-independent column agrees across lanes; both meet the density bound") {
    // ONLY n_grams is hash-invariant between the md5 and xxhash64
    // lanes: winnowing keeps each window's MINIMUM hash, so different
    // hash families legitimately select different gram positions and
    // the distinct-fingerprint count can differ. Assert n_grams
    // equality, and the paper's ~2/(W+1) density guarantee on BOTH
    // lanes' fingerprint counts.
    val a = graft.queries.DedupQueries.winnowFrame(spark, sf0001, Md5Hash)
      .select("doc_id", "n_grams", "n_fingerprints").collect().toSeq
    val b = graft.queries.DedupQueries.winnowFrame(spark, sf0001, Xx64Hash)
      .select("doc_id", "n_grams", "n_fingerprints").collect().toSeq
    assert(a.map(r => (r.getLong(0), r.getLong(1))) ===
      b.map(r => (r.getLong(0), r.getLong(1))))
    for (lane <- Seq(a, b); Row(_, ng: Long, nf: Long) <- lane if ng > 20)
      assert(nf.toDouble / ng > 0.1 && nf <= ng)
  }
}
