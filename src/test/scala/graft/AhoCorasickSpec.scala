package graft

import org.apache.spark.sql.functions._
import graft.functions.AhoCorasick

/** The Aho-Corasick automaton must agree with k independent
  * contains() probes — including the failure-link cases a naive trie
  * walk gets wrong (a match starting inside another pattern's prefix,
  * patterns that are prefixes/suffixes of each other, overlaps). */
class AhoCorasickSpec extends SparkSpec {

  private def naive(text: String, patterns: Seq[String]): Seq[Long] =
    patterns.zipWithIndex.collect {
      case (p, i) if text.contains(p) => i.toLong
    }

  private def viaAutomaton(text: String, patterns: Seq[String]): Seq[Long] = {
    val ac = new AhoCorasick.Automaton(patterns.map(_.getBytes("UTF-8")).toArray)
    val arr = AhoCorasick.maskToIndices(
      ac.matchMask(org.apache.spark.unsafe.types.UTF8String.fromString(text)))
    (0 until arr.numElements()).map(arr.getLong)
  }

  test("failure-link cases: overlapping, nested, prefix/suffix patterns") {
    val patterns = Seq("abcd", "bcx", "cde", "ab", "e", "dea", "aa")
    for (text <- Seq("abcde", "abcdea", "xxbcxx", "aaa", "", "abc", "ededea"))
      assert(viaAutomaton(text, patterns) === naive(text, patterns), s"text=$text")
  }

  test("randomized equivalence vs k contains() probes") {
    val rnd = new scala.util.Random(1789)
    for (trial <- 0 until 300) {
      val alphabet = "abc"
      def randStr(maxLen: Int) =
        (0 until (1 + rnd.nextInt(maxLen))).map(_ => alphabet(rnd.nextInt(3))).mkString
      val patterns = (0 until (1 + rnd.nextInt(10))).map(_ => randStr(4)).distinct
      val text = randStr(60)
      assert(viaAutomaton(text, patterns) === naive(text, patterns),
        s"trial=$trial text=$text patterns=$patterns")
    }
  }

  test("unicode patterns match on utf-8 bytes") {
    val patterns = Seq("naïve", "日本語", "🙂", "ascii")
    val text = "this naïve 日本語 doc is ascii-ish"
    assert(viaAutomaton(text, patterns) === Seq(0L, 1L, 3L))
  }

  test("column expression: null text, empty match, codegen path") {
    val rdd = spark.sparkContext.parallelize(Seq(
      (0L, "clean words only"), (1L, "a slow dup here"),
      (2L, null.asInstanceOf[String]), (3L, "hash join and scan merge")), 2)
    val df = spark.createDataFrame(rdd).toDF("id", "text")
    val out = df.select(col("id"),
        AhoCorasick.matchedPatternIndices(col("text"),
          Seq("slow", "dup", "hash join", "scan merge")).as("m"))
      .collect().sortBy(_.getLong(0))
    assert(out(0).getSeq[Long](1) === Seq())
    assert(out(1).getSeq[Long](1) === Seq(0L, 1L))
    assert(out(2).isNullAt(1))
    assert(out(3).getSeq[Long](1) === Seq(2L, 3L))
  }

  test("TermCounts matches explode+filter+count, including repeats and nulls") {
    import graft.functions.TermCounts
    import org.apache.spark.sql.graftbridge.Bridge
    val terms = Seq("a", "bb", "ccc", "absent")
    val rnd = new scala.util.Random(97)
    val words = Vector("a", "bb", "ccc", "dd", "a", null)
    val rows = (0 until 200).map { i =>
      (i.toLong, (0 until rnd.nextInt(25)).map(_ => words(rnd.nextInt(words.size))))
    }
    val rdd = spark.sparkContext.parallelize(rows, 3)
    val df = spark.createDataFrame(rdd).toDF("id", "toks")
    val got = df.select(col("id"),
        Bridge.column(TermCounts(Bridge.expression(col("toks")), terms)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val want = rows.map { case (id, toks) =>
      id -> terms.map(t => toks.count(_ == t).toLong)
    }.toMap
    assert(got === want)
    intercept[IllegalArgumentException] {
      TermCounts(Bridge.expression(col("toks")), Seq("x", "x"))
    }
  }

  test("64-pattern cap and empty pattern are rejected") {
    intercept[IllegalArgumentException] {
      new AhoCorasick.Automaton((0 to 64).map(i => s"p$i".getBytes("UTF-8")).toArray)
    }
    intercept[IllegalArgumentException] {
      new AhoCorasick.Automaton(Array(Array.emptyByteArray))
    }
  }
}
