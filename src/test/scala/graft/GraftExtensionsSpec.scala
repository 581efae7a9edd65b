package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** The SQL surface (GraftExtensions via GraftSession.builder) must
  * resolve every kernel function and produce exactly what the Column
  * API produces. The shared test session is built through
  * GraftSession.builder, so the functions are present here. */
class GraftExtensionsSpec extends SparkSpec {

  private lazy val docs = {
    val rdd = spark.sparkContext.parallelize(Seq(
      (0L, "the quick brown fox jumps over the lazy dog the quick"),
      (1L, "a b a b a b"),
      (2L, "slow dup hash join text"),
      (3L, "one")), 2)
    spark.createDataFrame(rdd).toDF("doc_id", "text")
  }

  test("SQL token_gram_hashes + sliding_min == Column API") {
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  sliding_min(token_gram_hashes(split(text, ' '), 4, true), 5) AS m
        |FROM ext_docs""".stripMargin).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaCol = docs.select(col("doc_id"),
        slidingWindowMin(tokenGramHashes(split(col("text"), " "), 4, Md5Hash), 5).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql === viaCol)
  }

  test("SQL minhash_sig / simhash_bits / shingle_strings / hash_strings == Column API") {
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  minhash_sig(hash_strings(shingle_strings(split(text, ' '), 2), true, 28, -1L, 0L, true), 4) AS sig,
        |  simhash_bits(hash_strings(split(text, ' '), true, 28, %dL, %dL, false), 16) AS sh
        |FROM ext_docs""".stripMargin.format(uhashA(99), uhashB(99))).collect()
      .map(r => (r.getLong(0), (r.getSeq[Long](1), r.getLong(2)))).toMap
    val viaCol = docs.select(col("doc_id"),
        minhashSignature(shingleHashes(shingles(col("text"), 2)), 4).as("sig"),
        simhashFromHashes(tokenHashes(split(col("text"), " ")), 16).as("sh"))
      .collect().map(r => (r.getLong(0), (r.getSeq[Long](1), r.getLong(2)))).toMap
    assert(viaSql === viaCol)
  }

  test("SQL char_entropy / sorted_run_stats / multi_contains_indices == Column API") {
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, char_entropy(text).entropy AS e,
        |  sorted_run_stats(array_sort(split(text, ' '))).max_run AS mr,
        |  multi_contains_indices(text, array('slow', 'dup', 'hash join', 'nope')) AS mi
        |FROM ext_docs""".stripMargin).collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2), r.getSeq[Long](3)))).toMap
    val viaCol = docs.select(col("doc_id"),
        charEntropy(col("text")).getField("entropy").as("e"),
        sortedRunStats(array_sort(split(col("text"), " "))).getField("max_run").as("mr"),
        graft.functions.AhoCorasick.matchedPatternIndices(col("text"),
          Seq("slow", "dup", "hash join", "nope")).as("mi"))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2), r.getSeq[Long](3)))).toMap
    assert(viaSql === viaCol)
    assert(viaSql(2L)._3 === Seq(0L, 1L, 2L))
  }

  test("SQL term_counts / srp_band_keys == Column API") {
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, term_counts(split(text, ' '), array('the', 'a', 'b')) AS tc
        |FROM ext_docs""".stripMargin).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val expected = Map(0L -> Seq(3L, 0L, 0L), 1L -> Seq(0L, 3L, 3L),
      2L -> Seq(0L, 0L, 0L), 3L -> Seq(0L, 0L, 0L))
    assert(viaSql === expected)
    // srp_band_keys: SQL vs the operator wrapper on a float-array frame
    val rdd = spark.sparkContext.parallelize(
      (0 until 30).map(i => (i.toLong, (0 until 16).map(j => (i * 31 + j) % 7 - 3f))), 2)
    val emb = spark.createDataFrame(rdd).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    emb.createOrReplaceTempView("ext_emb")
    val sqlKeys = spark.sql(
      "SELECT vec_id, srp_band_keys(embedding, 16, 4, 8) AS bk FROM ext_emb")
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    val colKeys = emb.select(col("vec_id"),
        graft.operators.SimilaritySearch.srpBandKeys(col("embedding"), 16, 4, 8).as("bk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(sqlKeys === colKeys)
  }

  test("SQL nfc_normalize / deflate_len == Column API") {
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, nfc_normalize(text) AS n, deflate_len(text) AS d FROM ext_docs")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val viaCol = docs.select(col("doc_id"),
        graft.functions.TextFunctions.nfcNormalize(col("text")).as("n"),
        graft.functions.TextFunctions.deflateLen(col("text")).as("d"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(viaSql === viaCol)
  }

  test("SQL mojibake_repair / luhn_valid / feature_weight_sum == Column API") {
    val dirty = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      (0L, "cafÃ© 79927398713"),
      (1L, "plain 79927398714"),
      (2L, "it\u00E2\u0080\u0099s 4242424242424242")), 2))
      .toDF("doc_id", "text")
    dirty.createOrReplaceTempView("ext_dirty")
    val (a, b) = (uhashA(7), uhashB(7))
    val viaSql = spark.sql(
      s"""SELECT doc_id, mojibake_repair(text) AS r,
         |  luhn_valid(regexp_extract(text, '[0-9]+', 0)) AS v,
         |  feature_weight_sum(hash_strings(split(text, ' '), true, 60, -1L, 0L, true),
         |    4096, ${a}L, ${b}L).wsum_milli AS w
         |FROM ext_dirty""".stripMargin).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2), r.getLong(3))).toMap
    val hs = hashedGrams(array_distinct(split(col("text"), " ")), Md5Hash, 60)
    val viaCol = dirty.select(col("doc_id"),
        graft.functions.TextFunctions.mojibakeRepair(col("text")).as("r"),
        graft.functions.TextFunctions.luhnValid(
          regexp_extract(col("text"), "[0-9]+", 0)).as("v"),
        graft.functions.TextFunctions.featureWeightSum(hs, 4096, a, b)
          .getField("wsum_milli").as("w"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2), r.getLong(3))).toMap
    assert(viaSql === viaCol)
    assert(viaSql(0L)._1 === "café 79927398713")
    assert(viaSql(0L)._2 === true && viaSql(1L)._2 === false)
  }

  test("non-literal shape arguments fail with a clear message") {
    docs.createOrReplaceTempView("ext_docs")
    val e = intercept[Exception] {
      spark.sql("SELECT token_gram_hashes(split(text, ' '), CAST(doc_id AS INT), true) FROM ext_docs").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"), e.getMessage)
    // NULL coefficient literal: clear argument error, not an NPE
    val e2 = intercept[Exception] {
      spark.sql("SELECT hash_strings(split(text, ' '), true, 28, NULL, 0L, true) FROM ext_docs").collect()
    }
    assert(e2.getMessage.contains("argument 4"), e2.getMessage)
    // out-of-range Long shape literal: errors instead of truncating
    val e3 = intercept[Exception] {
      spark.sql("SELECT sliding_min(array(1L, 2L), 4294967301) FROM ext_docs").collect()
    }
    assert(e3.getMessage.toLowerCase.contains("overflow") ||
      e3.getMessage.contains("integer"), e3.getMessage)
  }
  test("lakehouse table-valued functions: delta_table / delta_changes / iceberg_table") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_tvf").toString
    val delta = s"$d/t.delta"
    graft.sources.DeltaLake.toDelta(Seq((1L, "a")).toDF("id", "s"), delta)
    graft.sources.DeltaLake.toDelta(Seq((2L, "b")).toDF("id", "s"), delta,
      mode = "append")
    assert(spark.sql(s"SELECT count(*) AS n FROM delta_table('$delta')")
      .head.getLong(0) == 2L)
    // time travel + predicate THROUGH the TVF plan
    assert(spark.sql(s"SELECT id FROM delta_table('$delta', 0)")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(spark.sql(
      s"SELECT s FROM delta_table('$delta') WHERE id = 2").head.getString(0) == "b")
    // incremental tail via SQL
    assert(spark.sql(
      s"SELECT id, _commit_version FROM delta_changes('$delta', 0)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((2L, 1L)))
    val ice = s"$d/t.iceberg"
    graft.sources.Iceberg.toIceberg(Seq((7L, 0.5)).toDF("id", "v"), ice)
    assert(spark.sql(s"SELECT sum(id) FROM iceberg_table('$ice')")
      .head.getLong(0) == 7L)
    // non-literal args reject loudly
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM delta_table(concat('$delta', rand()))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"))
    // r18 TVFs: the change feed and the iceberg changes/changelog
    graft.sources.DeltaLake.enableChangeDataFeed(spark, delta)   // v2
    graft.sources.DeltaLake.deleteWhere(spark, delta,
      org.apache.spark.sql.functions.col("id") === 1L)           // v3
    assert(spark.sql(
      s"SELECT id, _change_type FROM delta_cdf('$delta', 2)")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "delete")))
    graft.sources.Iceberg.toIceberg(Seq((8L, 1.5)).toDF("id", "v"), ice,
      mode = "append")
    assert(spark.sql(
      s"SELECT id FROM iceberg_changes('$ice', -1)")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(7L, 8L))
    graft.sources.Iceberg.deleteWhere(spark, ice,
      org.apache.spark.sql.functions.col("id") === 7L)
    assert(spark.sql(
      s"""SELECT id, _change_type FROM iceberg_changelog('$ice')
         |WHERE _change_type = 'delete'""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((7L, "delete")))
  }

}
