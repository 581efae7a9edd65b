package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Every TextKernels expression must be bit-identical to the
  * interpreted Column formulation it replaced in round 11 — those
  * formulations are what the DuckDB oracles mirror. The old
  * formulations are kept verbatim below as the reference
  * implementations. */
class TextKernelExpressionsSpec extends SparkSpec {

  // ---- the pre-r11 formulations, verbatim ----------------------------
  private def refShingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", (1 to n).map(j => element_at(toks, i + j)): _*)))
        .otherwise(array().cast("array<string>")))
  }
  private def refShingleHashes(sh: Column, fam: HashFamily): Column =
    array_distinct(transform(sh, h => baseHash(h, fam)))
  private def refHashedGrams(sh: Column, fam: HashFamily): Column =
    transform(sh, g => portableHash(g, fam))
  private def refMinhash(hs: Column, k: Int): Column =
    array((0 until k).map { i =>
      coalesce(array_min(transform(hs, h => universalHash(i, h))), lit(-1L))
    }: _*)
  private def refTokenHashes(toks: Column, family: Int, fam: HashFamily): Column =
    transform(toks, t => universalHash(family, baseHash(t, fam)))
  private def refSimhash(hs: Column, nBits: Int): Column = {
    val n = size(hs)
    (0 until nBits).map { j =>
      when(size(filter(hs, h =>
        shiftright(h, j).bitwiseAND(lit(1L)) === 1L)) * 2 > n,
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  // RDD-backed random documents: no LocalRelation constant folding, so
  // both formulations run through real executed plans (codegen path)
  private lazy val randomDocs = {
    val rnd = new scala.util.Random(1123)
    val words = Vector("alpha", "beta", "g", "delta42", "ε", "zz", "naïve",
      "日本", "x", "", "the", "quick")
    val texts = (0 until 400).map { i =>
      (i.toLong,
        if (i == 0) null
        else (0 until rnd.nextInt(40)).map(_ => words(rnd.nextInt(words.size))).mkString(" "))
    }
    val rdd = spark.sparkContext.parallelize(texts, 4)
    spark.createDataFrame(rdd).toDF("id", "text")
  }

  private def sameById(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame, clue: String): Unit = {
    val ra = a.collect().toSeq.sortBy(_.getLong(0))
    val rb = b.collect().toSeq.sortBy(_.getLong(0))
    assert(ra === rb, clue)
  }

  test("shingles kernel matches the interpreted formulation") {
    for (n <- Seq(1, 3, 5)) {
      sameById(
        randomDocs.select(col("id"), shingles(col("text"), n).as("s")),
        randomDocs.select(col("id"), refShingles(col("text"), n).as("s")),
        s"n=$n")
    }
  }

  for (fam <- Seq(Md5Hash, Xx64Hash)) {
    val famName = if (fam == Md5Hash) "md5" else "xxhash64"

    test(s"shingleHashes kernel matches ($famName), incl. distinct-order") {
      val base = randomDocs.select(col("id"), shingles(col("text"), 2).as("sh"))
      sameById(
        base.select(col("id"), shingleHashes(col("sh"), fam).as("h")),
        base.select(col("id"), refShingleHashes(col("sh"), fam).as("h")),
        famName)
    }

    test(s"hashedGrams kernel matches transform(portableHash) ($famName)") {
      val base = randomDocs.select(col("id"), shingles(col("text"), 3).as("sh"))
      sameById(
        base.select(col("id"), hashedGrams(col("sh"), fam).as("h")),
        base.select(col("id"), refHashedGrams(col("sh"), fam).as("h")),
        famName)
    }

    test(s"tokenHashes kernel matches ($famName)") {
      val base = randomDocs.select(col("id"), split(col("text"), " ").as("t"))
      sameById(
        base.select(col("id"), tokenHashes(col("t"), 99, fam).as("h")),
        base.select(col("id"), refTokenHashes(col("t"), 99, fam).as("h")),
        famName)
    }
  }

  test("minhashSignature kernel matches, incl. empty and null inputs") {
    val base = randomDocs
      .select(col("id"), shingles(col("text"), 3).as("sh"))
      .select(col("id"), shingleHashes(col("sh")).as("hs"))
      // null hash array for id 0 (null text upstream gives empty —
      // force a true null to pin the -1-sentinel coalesce)
      .select(col("id"), when(col("id") === 0, lit(null)).otherwise(col("hs")).as("hs"))
    for (k <- Seq(1, 4, 8))
      sameById(
        base.select(col("id"), minhashSignature(col("hs"), k).as("sig")),
        base.select(col("id"), refMinhash(col("hs"), k).as("sig")),
        s"k=$k")
  }

  test("simhash kernel matches, incl. null array -> 0") {
    val base = randomDocs
      .select(col("id"), split(col("text"), " ").as("t"))
      .select(col("id"), tokenHashes(col("t")).as("hs"))
      .select(col("id"), when(col("id") === 0, lit(null)).otherwise(col("hs")).as("hs"))
    for (nBits <- Seq(16, 32))
      sameById(
        base.select(col("id"), simhashFromHashes(col("hs"), nBits).as("sh")),
        base.select(col("id"), refSimhash(col("hs"), nBits).as("sh")),
        s"nBits=$nBits")
  }

  test("hash-collision distinct parity: hash-then-distinct == distinct-strings-then-hash") {
    // shingleHashes now hashes (distinct) strings and distincts the
    // hashes in one pass; at 28 bits collisions are possible in
    // principle — first-occurrence order must match the two-step
    // formulation even when two distinct strings collide. Synthetic:
    // force duplicates and interleavings at the string level.
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b", "a", "c", "b", "a")),
      (2L, Seq("x")),
      (3L, Seq[String]())
    ).toDF("id", "sh")
    sameById(
      df.select(col("id"), shingleHashes(col("sh"), Md5Hash).as("h")),
      df.select(col("id"), refShingleHashes(col("sh"), Md5Hash).as("h")),
      "dup strings")
  }

  test("gramStrings (non-distinct) matches the ordered transform formulation") {
    def refGrams(text: Column, n: Int): Column = {
      val toks = split(text, " ")
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", (1 to n).map(j => element_at(toks, i + j)): _*)))
        .otherwise(array().cast("array<string>"))
    }
    for (n <- Seq(1, 2, 4))
      sameById(
        randomDocs.select(col("id"), gramStrings(split(col("text"), " "), n).as("g")),
        randomDocs.select(col("id"), refGrams(col("text"), n).as("g")),
        s"n=$n")
  }

  test("sortedRunStats matches the three aggregate formulations") {
    import spark.implicits._
    val rnd = new scala.util.Random(2203)
    val words = Vector("a", "bb", "a", "ccc", "dd", "", "ΩΩ")
    val cases = (0 until 300).map { i =>
      val arr = (0 until rnd.nextInt(20)).map { _ =>
        if (rnd.nextInt(10) == 0) null else words(rnd.nextInt(words.size))
      }
      (i.toLong, arr)
    } ++ Seq(
      (300L, Seq[String]()),            // empty
      (301L, Seq[String](null, null)),  // all nulls
      (302L, Seq("x", "x", "x")))       // one run
    val df = cases.toDF("id", "a")
      .select(col("id"), array_sort(col("a")).as("s"))
      .select(col("id"), col("s"), sortedRunStats(col("s")).as("st"))
    val got = df.select(col("id"), col("st.max_run"), col("st.max_cover"), col("st.dup_cnt"))
    val want = df.select(col("id"), maxRunLength(col("s")),
      maxRunCover(col("s")), dupElementCount(col("s")))
    assert(got.collect().toSeq.sortBy(_.getLong(0)).map(_.toSeq) ===
      want.collect().toSeq.sortBy(_.getLong(0)).map(_.toSeq))
  }

  test("charEntropy kernel log2 matches Spark's Log2 bitwise") {
    // the kernel computes StrictMath.log(p)/StrictMath.log(2.0) — it
    // must be bit-identical to the log2() Column function the proven
    // oracle lanes (q_bigram_lm, q_unigram_surprisal) rely on
    import spark.implicits._
    val rnd = new scala.util.Random(31415)
    val ps = (1 to 2000).map(_ => rnd.nextDouble()).filter(_ > 0)
    val sparkVals = ps.toDF("p").select(log2(col("p"))).collect().map(_.getDouble(0))
    val kernelVals = ps.map(p => StrictMath.log(p) / StrictMath.log(2.0))
    assert(sparkVals.zip(kernelVals).forall { case (a, b) =>
      java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b)
    })
  }

  test("charEntropy matches the explode/groupBy formulation") {
    import spark.implicits._
    val texts = Seq(
      (0L, "aaaa"), (1L, "abab"), (2L, "abcd"), (3L, ""),
      (4L, "the quick brown fox"), (5L, "mixé ünïcode 日本語 text"),
      (6L, "x")) ++ (7 until 100).map { i =>
      val rnd = new scala.util.Random(i)
      (i.toLong, (0 until rnd.nextInt(200)).map(_ =>
        "abcdefg h".charAt(rnd.nextInt(9))).mkString)
    }
    val df = texts.toDF("id", "text")
    val got = df.select(col("id"), charEntropy(col("text")).as("e"))
      .select(col("id"), col("e.n_chars"), col("e.n_distinct_chars"),
        round(col("e.entropy"), 6).as("entropy"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // reference: explode chars, groupBy histogram, dsumD the terms
    val ch = df.select(col("id"), length(col("text")).cast("long").as("n"),
      explode(array_remove(split(col("text"), ""), "")).as("c"))
    val p = col("k").cast("double") / col("n").cast("double")
    val want = ch.groupBy("id", "n", "c").agg(count(lit(1)).as("k"))
      .groupBy("id", "n")
      .agg(count(lit(1)).cast("long").as("nd"),
        round(graft.queries.Q.dsumD(-p * log2(p)), 6).as("entropy"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    for ((id, w) <- want) assert(got(id) === w, s"id=$id")
    // empty doc: kernel yields (0, 0, 0.0); the explode path has no rows
    assert(got(3L) === ((0L, 0L, 0.0)))
    // null text -> null struct
    val nul = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Tuple1(null.asInstanceOf[String]))))
      .toDF("text").select(charEntropy(col("text"))).head
    assert(nul.isNullAt(0))
  }

  test("nfcNormalize composes combining marks and is a no-op on NFC text") {
    import spark.implicits._
    def nfc(c: Column) = graft.functions.TextFunctions.nfcNormalize(c)
    val df = Seq(
      (0L, "é"),        // decomposed -> é
      (1L, "Å"),        // decomposed -> Å
      (2L, "é"),          // already NFC
      (3L, "plain ascii"),
      (4L, null.asInstanceOf[String])).toDF("id", "s")
    val out = df.select(col("id"), nfc(col("s")).as("n"),
        length(col("s")).as("lr"), length(nfc(col("s"))).as("ln"))
      .collect().sortBy(_.getLong(0))
    assert(out(0).getString(1) === "é" && out(0).getInt(3) === 1)
    assert(out(1).getString(1) === "Å")
    assert(out(2).getString(1) === "é" && out(2).getInt(2) === 1)
    assert(out(3).getString(1) === "plain ascii")
    assert(out(4).isNullAt(1))
  }

  test("deflateLen: deterministic golden values, repetition compresses tighter") {
    import spark.implicits._
    def dl(c: Column) = graft.functions.TextFunctions.deflateLen(c)
    val rep = "spam " * 200
    val rnd = new scala.util.Random(5)
    val noisy = (0 until 1000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val df = Seq((0L, rep), (1L, noisy), (2L, ""), (3L, "x")).toDF("id", "s")
    val out = df.select(col("id"), dl(col("s")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // repetitive kilobyte crushes far below the random one
    assert(out(0L) < 60, out(0L).toString)
    assert(out(1L) > 500, out(1L).toString)
    assert(out(2L) > 0) // empty input still has the deflate header
    // deterministic across evaluations (reused per-thread Deflater)
    val again = df.select(col("id"), dl(col("s")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === out)
  }

  test("kernels run inside whole-stage codegen") {
    val got = randomDocs
      .select(col("id"), shingles(col("text"), 3).as("sh"))
      .select(col("id"), shingleHashes(col("sh")).as("hs"))
      .select(col("id"), minhashSignature(col("hs"), 4).as("sig"),
        simhashFromHashes(col("hs"), 16).as("sim"))
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(got.count() === 400)
  }
}
