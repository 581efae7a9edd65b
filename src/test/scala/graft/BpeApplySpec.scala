package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextFunctions

/** The learned-vocab BPE apply kernel (TextKernels.bpeApply /
  * BpeApply): pinned against an INDEPENDENT re-implementation of the
  * GPT-2 greedy encoder (a direct structural port of the public
  * openai/gpt-2 src/encoder.py bpe() loop, written index-scan style —
  * deliberately different code shape from the kernel's), on random
  * merge tables (including SHUFFLED, non-layered rank orders) and
  * random multi-byte tokens. Plus the golden divergence case that
  * separates true greedy application from a rank-sequential replace
  * chain, SQL == Column parity, and the null contract. */
class BpeApplySpec extends SparkSpec {

  // ---------------------------------------------------- reference impl

  /** Independent reference: GPT-2 bpe() ported verbatim (word.index
    * scan, pairs set, min-rank selection). Divergence from the
    * kernel on ANY input is a kernel bug. Empty tokens yield no
    * symbols (the kernel's documented choice; pretokenizers never
    * emit them). */
  private def refBpe(token: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var word: Vector[String] = {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < token.length) {
        val cp = token.codePointAt(i)
        val n = Character.charCount(cp)
        b += token.substring(i, i + n)
        i += n
      }
      b.result()
    }
    if (word.size < 2) return word
    var go = true
    while (go) {
      val present = word.sliding(2).collect {
        case Vector(a, b) if ranks.contains((a, b)) => (a, b)
      }.toSet
      if (present.isEmpty) go = false
      else {
        val (first, second) = present.minBy(ranks)
        val nw = Vector.newBuilder[String]
        var i = 0
        while (i < word.size) {
          val j = word.indexOf(first, i)
          if (j < 0) { nw ++= word.drop(i); i = word.size }
          else {
            nw ++= word.slice(i, j)
            if (j < word.size - 1 && word(j + 1) == second) {
              nw += first + second; i = j + 2
            } else { nw += word(j); i = j + 1 }
          }
        }
        word = nw.result()
        if (word.size == 1) go = false
      }
    }
    word
  }

  private def run(tokens: Seq[String], merges: Seq[(String, String)]): Seq[String] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(tokens)), 1),
      StructType(Seq(StructField("ts", ArrayType(StringType, true)))))
    df.select(TextFunctions.bpeApply(col("ts"), merges).as("out"))
      .collect().head.getSeq[String](0)
  }

  test("golden: greedy beats rank-sequential (lower-rank pair minted by a higher-rank merge)") {
    // rank0 = ("ab","c") only exists AFTER rank1 = ("a","b") fires; a
    // rank-sequential replace chain would stop at ["ab","c"], greedy
    // must reach ["abc"]
    val merges = Seq(("ab", "c"), ("a", "b"))
    assert(run(Seq("abc"), merges) == Seq("abc"))
    assert(refBpe("abc", merges.zipWithIndex.toMap) == Seq("abc"))
  }

  test("golden: overlapping occurrences merge leftmost non-overlapping") {
    val merges = Seq(("a", "a"))
    assert(run(Seq("aaa"), merges) == Seq("aa", "a"))
    assert(run(Seq("aaaa"), merges) == Seq("aa", "aa"))
  }

  test("property: kernel == independent GPT-2 reference on random shuffled tables") {
    val rnd = new scala.util.Random(20260815)
    for (round <- 0 until 40) {
      // mint symbols bottom-up, then SHUFFLE the rank order so the
      // table is NOT layered — the regime where greedy and
      // rank-sequential replace genuinely diverge
      val alphabet = Vector("a", "b", "c", "d")
      var pool = alphabet
      val minted = (0 until 3 + rnd.nextInt(6)).map { _ =>
        val x = pool(rnd.nextInt(pool.size))
        val y = pool(rnd.nextInt(pool.size))
        pool :+= (x + y)
        (x, y)
      }
      val merges = rnd.shuffle(minted.distinct.toVector)
      val ranks = merges.zipWithIndex.toMap
      val tokens = (0 until 25).map { _ =>
        (0 until rnd.nextInt(13)).map(_ => alphabet(rnd.nextInt(4))).mkString
      }.filter(_.nonEmpty)
      val expect = tokens.flatMap(t => refBpe(t, ranks))
      val got = run(tokens, merges)
      assert(got == expect, s"round $round merges=$merges tokens=$tokens")
    }
  }

  test("multi-byte code points split correctly (non-BMP initial symbols)") {
    // U+1F600 is a surrogate pair in UTF-16 — a char-based split
    // would shear it
    val merges = Seq(("\uD83D\uDE00", "x"), ("h", "\u00E9"))
    assert(run(Seq("\uD83D\uDE00x\uD83D\uDE00"), merges)
      == Seq("\uD83D\uDE00x", "\uD83D\uDE00"))
    assert(run(Seq("h\u00E9h\u00E9"), merges) == Seq("h\u00E9", "h\u00E9"))
  }

  test("null contract: null array stays null, null/empty pretokens are skipped") {
    val merges = Seq(("a", "b"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(null), Row(Seq(null, "ab", null, "", "ba"))), 1),
      StructType(Seq(StructField("ts", ArrayType(StringType, true)))))
    val out = df.select(TextFunctions.bpeApply(col("ts"), merges).as("o")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getSeq[String](0) == Seq("ab", "b", "a"))
  }

  test("invalid tables fail loudly: empty/NUL symbols at construction, duplicates at plan build") {
    intercept[IllegalArgumentException] {
      TextFunctions.bpeApply(col("x"), Seq(("", "a")))
    }
    intercept[IllegalArgumentException] {
      TextFunctions.bpeApply(col("x"), Seq(("a\u0000", "b")))
    }
    intercept[IllegalArgumentException] {
      TextFunctions.bpeApply(col("x"), Seq.empty)
    }
    // duplicate detection rides the LAZY table build (construction
    // stays allocation-light because Catalyst copies expressions on
    // every transform) -- still driver-side, before any job
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Seq("ab"))), 1),
      StructType(Seq(StructField("ts", ArrayType(StringType, true)))))
    val e = intercept[Exception] {
      df.select(TextFunctions.bpeApply(col("ts"),
        Seq(("a", "b"), ("a", "b")))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("duplicate merge pair")), s"got: $e")
  }

  test("VxFrame.bpeTokenize == pretokenizer + kernel, shared definitions") {
    val merges = Seq(("a", "b"), ("ab", "c"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0 until 30).map(i => Row(i.toLong, s"abc ab${"!" * (i % 2)} xyz")), 2),
      StructType(Seq(StructField("id", LongType, false),
        StructField("text", StringType, false))))
    val viaFacade = VxFrame(df).bpeTokenize(merges)
      .df.select("id", "tokens").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val direct = df.select(col("id"),
        TextFunctions.bpeApply(TextFunctions.bpePretokens(col("text")), merges)
          .as("tokens"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(viaFacade == direct)
    // multi-level merging reached through the full pipeline
    assert(viaFacade(0L).contains("abc"))
    intercept[IllegalArgumentException] {
      VxFrame(df).bpeTokenize(merges, as = "text")
    }
  }

  test("SQL registration (merges.txt form) == Column API") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0 until 50).map(i => Row(i.toLong, s"abc${"ab" * (i % 4)}de")), 2),
      StructType(Seq(StructField("id", LongType, false),
        StructField("s", StringType, false))))
    df.createOrReplaceTempView("bpe_docs")
    val merges = Seq(("a", "b"), ("ab", "c"), ("d", "e"))
    val viaSql = spark.sql(
      "SELECT id, bpe_apply(array(s), array('a b', 'ab c', 'd e')) AS t FROM bpe_docs")
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    val viaCol = df.select(col("id"),
        TextFunctions.bpeApply(array(col("s")), merges).as("t"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    assert(viaSql == viaCol)
    assert(viaCol(0L) == Seq("abc", "de"))
    // malformed SQL merge entries fail loudly
    val e = intercept[Exception] {
      spark.sql("SELECT bpe_apply(array('x'), array('a b c'))").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("one space")), s"got: $e")
  }
}
