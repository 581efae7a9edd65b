package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** Text-analysis battery over the `documents` table — the
  * training-data-pipeline operators (quality scoring, token counting,
  * exact dedup) in their SQL-expressible form. The hash-based ops
  * (MinHash/SimHash/fingerprinting) live in [[graft.queries.DedupQueries]]
  * over [[graft.functions.TextFunctions]], fully oracle-gated.
  */
object TextQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // quality-scoring features: char length, token count, mean word
    // length, punctuation-free ratio, stopword ratio
    "q_text_quality" -> ((s, dir) => {
      val txt = col("text")
      val tokens = split(txt, " ")
      val nTok = size(tokens).cast("long")
      val stop = array(lit("the"), lit("a"), lit("of"), lit("and"), lit("to"))
      t(s, dir, "documents").select(
        col("doc_id"),
        length(txt).cast("long").as("n_chars"),
        nTok.as("n_tokens"),
        round((length(txt).cast("double") - (nTok - 1).cast("double")) / nTok.cast("double"), 6).as("mean_wordlen"),
        size(filter(tokens, tk => array_contains(stop, tk))).cast("long").as("n_stop"),
        round(size(filter(tokens, tk => array_contains(stop, tk))).cast("double") / nTok.cast("double"), 6).as("stop_ratio"),
        size(filter(tokens, tk => length(tk) >= 5)).cast("long").as("n_long_tokens")
      ).orderBy("doc_id")
    }),

    // corpus statistics per (source, lang)
    "q_text_stats" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("source"), col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          sum(size(split(col("text"), " ")).cast("long")).as("total_tokens"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars")
        )
        .orderBy("source", "lang")
    }),

    // exact deduplication accounting (hash-groupBy; reference-style
    // `unique` over text, core/dataframe.py:575) — group sizes by text
    // identity, keep min doc_id as the canonical representative
    "q_dedup_exact" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .groupBy(col("n_copies"))
        .agg(count(lit(1)).as("n_groups"), min(col("keep_id")).as("first_keep"))
        .orderBy("n_copies")
    }),

    // token-frequency (word-count) — the canonical explode/flatMap op
    "q_token_freq" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("token"))
        .limit(30)
    }),

    // BPE pre-tokenization (GPT-2 split regex, lookahead-free so the
    // identical pattern runs in java.util.regex AND DuckDB's RE2) —
    // the token-budget estimator of a training pipeline; per-doc
    // pre-token count, non-whitespace token count, chars/token
    "q_token_bpe" -> ((s, dir) => {
      import graft.functions.TextFunctions
      val toks = TextFunctions.bpePretokens(col("text"))
      val nTok = size(toks).cast("long")
      val nWord = size(filter(toks, tk => tk.rlike("\\S"))).cast("long")
      t(s, dir, "documents").select(
        col("doc_id"),
        nTok.as("n_pretokens"),
        nWord.as("n_word_tokens"),
        round(length(col("text")).cast("double") / nWord.cast("double"), 6)
          .as("chars_per_token")
      ).orderBy("doc_id")
    }),

    // unigram-LM quality score: -mean log2 p(token) under the corpus's
    // own unigram distribution — the classic cheap fluency/outlier
    // signal for corpus filtering (high surprisal = rare-token soup).
    // Shape at scale: one token-frequency aggregation (shuffles token
    // counts, not text), broadcast-joined back to the exploded tokens,
    // then a per-doc decimal-exact mean. No driver data.
    "q_unigram_surprisal" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      val freq = toks.groupBy("token").agg(count(lit(1)).as("tf"))
      val totalDf = freq.agg(sum(col("tf")).as("total"))
      // freq is NOT broadcast-hinted: a 100 TB corpus can carry a
      // 1e8-token vocabulary — the join stays keyed on token and AQE
      // broadcast-converts when the actual vocab is small
      toks.join(freq, "token")
        .crossJoin(broadcast(totalDf))
        .withColumn("__sup",
          -log2(col("tf").cast("double") / col("total").cast("double")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          r(dsum(col("__sup")).cast("double")
            / count(lit(1)).cast("double"), 6).as("mean_surprisal"))
        .orderBy("doc_id")
    }),

    // n-gram shingles (dedup building block, SQL-checkable): distinct
    // 3-gram count per doc
    "q_shingles" -> ((s, dir) => {
      val tokens = split(col("text"), " ")
      t(s, dir, "documents").select(
        col("doc_id"),
        size(tokens).cast("long").as("n_tokens"),
        size(array_distinct(
          when(size(tokens) >= 3,
            transform(sequence(lit(0), size(tokens) - 3),
              i => concat_ws(" ", element_at(tokens, i + 1), element_at(tokens, i + 2), element_at(tokens, i + 3))))
            .otherwise(array()))).cast("long").as("n_shingles")
      ).orderBy("doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_text_quality" ->
      """SELECT doc_id,
        |  CAST(LENGTH(text) AS BIGINT) AS n_chars,
        |  CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  ROUND((CAST(LENGTH(text) AS DOUBLE) - (LEN(string_split(text, ' ')) - 1))
        |    / LEN(string_split(text, ' ')), 6) AS mean_wordlen,
        |  CAST(LEN(list_filter(string_split(text, ' '),
        |    t -> list_contains(['the','a','of','and','to'], t))) AS BIGINT) AS n_stop,
        |  ROUND(CAST(LEN(list_filter(string_split(text, ' '),
        |    t -> list_contains(['the','a','of','and','to'], t))) AS DOUBLE)
        |    / LEN(string_split(text, ' ')), 6) AS stop_ratio,
        |  CAST(LEN(list_filter(string_split(text, ' '), t -> LENGTH(t) >= 5)) AS BIGINT) AS n_long_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_stats" ->
      """SELECT source, lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(SUM(LEN(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_dedup_exact" ->
      """WITH g AS (
        |  SELECT text, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |  FROM documents GROUP BY text)
        |SELECT n_copies, COUNT(*) AS n_groups, MIN(keep_id) AS first_keep
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_token_freq" ->
      """SELECT token, COUNT(*) AS freq
        |FROM (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY 1 ORDER BY freq DESC, token LIMIT 30""".stripMargin,

    "q_unigram_surprisal" ->
      s"""WITH toks AS (
         |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents),
         |freq AS (SELECT token, COUNT(*) AS tf FROM toks GROUP BY 1),
         |tot AS (SELECT CAST(SUM(tf) AS DOUBLE) AS total FROM freq)
         |SELECT doc_id, COUNT(*) AS n_tokens,
         |  ROUND(CAST(${sqlDsum("-LOG2(CAST(tf AS DOUBLE) / total)")} AS DOUBLE)
         |    / COUNT(*), 6) AS mean_surprisal
         |FROM toks JOIN freq USING (token) CROSS JOIN tot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_token_bpe" ->
      ("""SELECT doc_id,
        |  CAST(LEN(tk) AS BIGINT) AS n_pretokens,
        |  CAST(LEN(list_filter(tk, t -> regexp_matches(t, '\S'))) AS BIGINT) AS n_word_tokens,
        |  ROUND(CAST(LENGTH(text) AS DOUBLE)
        |    / LEN(list_filter(tk, t -> regexp_matches(t, '\S'))), 6) AS chars_per_token
        |FROM (SELECT doc_id, text, regexp_extract_all(text, '""" +
        graft.functions.TextFunctions.BpePretokenPattern.replace("'", "''") +
        """') AS tk FROM documents) ORDER BY doc_id""").stripMargin,

    "q_shingles" ->
      """SELECT doc_id,
        |  CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(LEN(list_distinct(CASE WHEN LEN(string_split(text, ' ')) >= 3
        |    THEN list_transform(range(0, LEN(string_split(text, ' ')) - 2),
        |      i -> string_split(text, ' ')[i + 1] || ' ' || string_split(text, ' ')[i + 2] || ' ' || string_split(text, ' ')[i + 3])
        |    ELSE [] END)) AS BIGINT) AS n_shingles
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
