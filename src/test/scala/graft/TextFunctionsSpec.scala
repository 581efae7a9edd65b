package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Unit tests for the dedup/text-pipeline building blocks. */
class TextFunctionsSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  test("shingles: distinct word trigrams, empty when too short") {
    import spark.implicits._
    val df = Seq("a b c d", "a b", "x y z x y z").toDF("text")
    val got = df.select(shingles(col("text"), 3)).collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq.empty)
    assert(got(2).sorted == Seq("x y z", "y z x", "z x y").sorted) // distinct
  }

  test("portableHash is deterministic and non-negative (60-bit)") {
    val h1 = evalCol(portableHash(lit("hello"))).asInstanceOf[Long]
    val h2 = evalCol(portableHash(lit("hello"))).asInstanceOf[Long]
    assert(h1 == h2 && h1 >= 0 && h1 < (1L << 60))
    assert(evalCol(portableHash(lit("world"))) != h1)
  }

  test("xxhash64 family: deterministic, bit-bounded, distinct from md5 lane") {
    val p1 = evalCol(portableHash(lit("hello"), Xx64Hash)).asInstanceOf[Long]
    val p2 = evalCol(portableHash(lit("hello"), Xx64Hash)).asInstanceOf[Long]
    assert(p1 == p2 && p1 >= 0 && p1 < (1L << 60))
    val b = evalCol(baseHash(lit("hello"), Xx64Hash)).asInstanceOf[Long]
    assert(b >= 0 && b < (1L << 28))
    assert(evalCol(baseHash(lit("world"), Xx64Hash)) != b)
  }

  test("minhash signature: identical sets -> identical sigs; sentinel for empty") {
    import spark.implicits._
    val df = Seq("the quick brown fox", "the quick brown fox", "x").toDF("text")
      .select(minhashSignature(shingleHashes(shingles(col("text"), 2)), 4).as("sig"))
    val sigs = df.collect().map(_.getSeq[Long](0))
    assert(sigs(0) == sigs(1))
    assert(sigs(2) == Seq(-1L, -1L, -1L, -1L))
  }

  test("universal hash family: in range, distinct members disagree") {
    val h = evalCol(baseHash(lit("hello"))).asInstanceOf[Long]
    assert(h >= 0 && h < (1L << 28))
    val h0 = evalCol(universalHash(0, lit(h))).asInstanceOf[Long]
    val h1 = evalCol(universalHash(1, lit(h))).asInstanceOf[Long]
    assert(h0 != h1 && h0 >= 0 && h0 < UHASH_P && h1 >= 0 && h1 < UHASH_P)
    assert(evalCol(universalHash(0, lit(h))) == h0) // deterministic
  }

  test("jaccard: identity 1, disjoint 0, both-empty 0") {
    import spark.implicits._
    val df = Seq(
      (Seq("a", "b"), Seq("a", "b")),
      (Seq("a"), Seq("b")),
      (Seq.empty[String], Seq.empty[String]),
      (Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("a", "b")
    val got = df.select(jaccard(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(got(0) == 1.0 && got(1) == 0.0 && got(2) == 0.0 && got(3) == 0.5)
  }

  test("simhash: equal docs distance 0; hamming computes bit diff") {
    import spark.implicits._
    val df = Seq(("a b c", "a b c"), ("a b c", "x y z")).toDF("t1", "t2")
      .select(simhashFromHashes(tokenHashes(tokens(col("t1"))), 16).as("s1"),
        simhashFromHashes(tokenHashes(tokens(col("t2"))), 16).as("s2"))
    val d = df.select(hammingDistance(col("s1"), col("s2"))).collect().map(_.getLong(0))
    assert(d(0) == 0L)
    assert(d(1) > 0L)
    assert(evalCol(hammingDistance(lit(0b1011L), lit(0b0001L))) == 2L)
  }

  test("lshBandKeys: equal signatures share all band keys") {
    import spark.implicits._
    val df = Seq("a b c d e f", "a b c d e f").toDF("text")
      .select(lshBandKeys(minhashSignature(shingleHashes(shingles(col("text"), 2)), 8), 8, 2).as("bk"))
    val got = df.collect().map(_.getSeq[Row](0).map(r => (r.getInt(0), r.getLong(1))))
    assert(got(0) == got(1) && got(0).size == 4)
  }

  test("langIdPredict picks max-overlap language deterministically") {
    import spark.implicits._
    val markers = Seq("en" -> Seq("the", "a"), "de" -> Seq("der", "die"))
    val df = Seq("the a cat", "der die das", "zz yy").toDF("text")
      .select(langIdPredict(array_distinct(tokens(col("text"))), markers).as("p"))
    // tie (0 overlap everywhere) resolves to first language by list order
    assert(df.collect().map(_.getString(0)).toSeq == Seq("en", "de", "en"))
  }

  test("bpePretokens matches the GPT-2 split shape on hand-checked cases") {
    import spark.implicits._
    def toks(s: String): Seq[String] =
      Seq(s).toDF("t").select(bpePretokens(col("t"))).head.getSeq[String](0)
    def bpeCount(s: String): Long =
      Seq(s).toDF("t").select(bpePretokenCount(col("t"))).head.getLong(0)
    // contractions split off, space binds to the following word
    assert(toks("don't stop") == Seq("don", "'t", " stop"))
    assert(toks("it's 42 degrees!") ==
      Seq("it", "'s", " 42", " degrees", "!"))
    // digit and punctuation runs separate from letters
    assert(toks("abc123 x-y") == Seq("abc", "123", " x", "-", "y"))
    // multi-space runs become ONE whitespace token (the lookahead-free
    // variant: original GPT-2's \s+(?!\S) would yield (" ", " b"), but
    // RE2 has no lookahead — both engines here agree on ("  ", "b"))
    assert(toks("a  b") == Seq("a", "  ", "b"))
    assert(toks("word").size == 1 && bpeCount("word") == 1L)
  }

  test("repetition helpers: run stats over sorted arrays, incl. edges") {
    import spark.implicits._
    def stats(arr: Seq[String]): (Long, Long, Long) = {
      val r = Seq(Tuple1(arr)).toDF("a")
        .select(maxRunLength(array_sort(col("a"))).as("m"),
          maxRunCover(array_sort(col("a"))).as("c"),
          dupElementCount(array_sort(col("a"))).as("d")).head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // "bb" appears 3x (cover 3*2=6 > "aaa" 1*3), 5 of 6 elements duplicated
    assert(stats(Seq("bb", "x", "aaa", "bb", "x", "bb")) === ((3L, 6L, 5L)))
    assert(stats(Seq("solo")) === ((1L, 4L, 0L)))
    assert(stats(Seq.empty) === ((0L, 0L, 0L)))
    // empty-string elements must not extend the initial sentinel run
    assert(stats(Seq("", "a")) === ((1L, 1L, 0L)))
    assert(stats(Seq("", "", "a")) === ((2L, 1L, 2L)))
  }

  test("PII patterns detect and redact; non-PII text untouched") {
    import spark.implicits._
    val txt = "write me at a.b+c@mail-x.co.uk or 555-123-4567; " +
      "host 192.168.0.1, version 1.2 costs $3.99, id 123-45-678"
    val r = Seq(txt).toDF("t").select(
      piiCount(col("t"), PiiEmailPattern).as("e"),
      piiCount(col("t"), PiiPhonePattern).as("p"),
      piiCount(col("t"), PiiIpPattern).as("i"),
      redactPii(col("t")).as("red")).head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((1L, 1L, 1L)))
    val red = r.getString(3)
    assert(red.contains("<EMAIL>") && red.contains("<PHONE>") && red.contains("<IP>"))
    // near-misses survive: "1.2" (two octets), "$3.99", "123-45-678"
    // (wrong group widths) are not PII
    assert(red.contains("version 1.2 costs $3.99, id 123-45-678"))
    assert(!red.contains("mail-x.co.uk") && !red.contains("555-123"))
  }

  test("langIdPredictReal classifies real sentences via stopword profiles") {
    import spark.implicits._
    val sentences = Seq(
      ("the quick brown fox jumped over the lazy dog and it was fast", "en"),
      ("der hund ist nicht mit der katze auf dem sofa und das ist gut", "de"),
      ("le chat est dans la maison et les chiens sont pour nous", "fr"),
      ("el perro es grande y las casas son para el gato como su casa", "es"),
      ("xyzzy plugh quux", "und"))
    val got = sentences.map(_._1).toDF("text")
      .select(langIdPredictReal(array_distinct(tokens(lower(col("text"))))).as("p"))
      .collect().map(_.getString(0)).toSeq
    assert(got == sentences.map(_._2))
  }

  test("q_lsh_neardup_sig: signature-only estimator — bounds, grid, and " +
      "exact-dup agreement vs the hash-set lane") {
    val sigRows = SparkEntry.queries("q_lsh_neardup_sig")(spark, sf0001).collect()
    assert(sigRows.nonEmpty) // the planted near-dup pairs survive the estimator
    sigRows.foreach { r =>
      val n = r.getLong(2)
      assert(n >= 6 && n <= 8, s"n_agree out of [SIG_VERIFY, K]: $n")
      assert(r.getDouble(3) == n / 8.0) // est sits exactly on the 1/K grid
    }
    // identical shingle sets hash to identical signatures, so every pair
    // the exact lane scores jaccard == 1.0 MUST agree on all K components
    val exactDups = SparkEntry.queries("q_lsh_neardup")(spark, sf0001).collect()
      .filter(_.getDouble(2) == 1.0)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fullAgree = sigRows.filter(_.getLong(2) == 8)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactDups.subsetOf(fullAgree),
      s"exact dups missing from full-agreement set: ${exactDups -- fullAgree}")
  }
}
