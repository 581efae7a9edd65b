package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import Q._

/** Training-data curation operators beyond the reference's own surface
  * — the passes a production corpus pipeline runs between raw crawl
  * and tokenizer: PII scrubbing, repetition-based quality filtering
  * (Gopher-style rules), benchmark decontamination, and sequence
  * packing. All oracle-gated on the `documents` table.
  *
  * Scale shapes: PII redaction and the repetition signals are pure
  * projections (regex / sorted-array scans per row — zero shuffle);
  * decontamination shuffles only n-gram strings for one semi-join
  * against the (comparatively tiny) eval-set gram dictionary; packing
  * rides [[graft.operators.OrderedOps.cumsum]]'s two-phase scan (no
  * global per-row window).
  */
object PipelineQueries {

  /** Deterministic synthetic PII appended to each doc (the corpus is
    * word-soup with no real PII): one email, one dashed phone, one
    * IPv4 per doc, plus a second email on every third doc. Built from
    * doc_id so Spark and the SQL oracle inject byte-identical text. */
  private def withInjectedPii(df: DataFrame): DataFrame = {
    val d = col("doc_id")
    df.select(col("doc_id"), concat(
      col("text"),
      lit(" contact u"), d.cast("string"),
      lit("@ex"), (d % 7).cast("string"), lit(".org or call 555-"),
      lpad((d % 1000).cast("string"), 3, "0"), lit("-"),
      lpad(((d * 7) % 10000).cast("string"), 4, "0"),
      lit(" from 10."), (d % 256).cast("string"),
      lit(".0."), ((d * 3) % 256).cast("string"),
      when(d % 3 === 0, lit(" cc admin@site.net")).otherwise(lit(""))
    ).as("__txt"))
  }

  /** Shared decontamination body: flag training docs whose distinct
    * grams (`gramExpr` over `text` — string or hashed, same algebra)
    * intersect the eval set's gram dictionary.
    *
    * `bloomPrefilter` (requires hashed int64 grams) is the 100 TB
    * refinement: build a Bloom filter over the (comparatively tiny)
    * eval gram dictionary — one distributed pass, word-wise-OR merge,
    * no key shuffle — and probe each training doc's gram array against
    * it as a zero-shuffle projection BEFORE the explode. A clean doc
    * (the overwhelming majority of a production corpus) has an empty
    * candidate array and contributes NOTHING to the semi-join shuffle;
    * only bloom survivors explode. False positives are removed by the
    * exact semi-join, so the output is bit-identical to the unfiltered
    * lane and the same DuckDB oracle gates all three lanes. */
  private[graft] def decontaminate(docs: DataFrame,
                            gramExpr: org.apache.spark.sql.Column,
                            bloomPrefilter: Boolean = false,
                            evalMod: Int = 10,
                            broadcastDict: Boolean = true): DataFrame = {
    import graft.functions.BloomFunctions
    // PLAN SHAPE (r8 measured 6-9x, r9 restructure): the doc_id
    // filters stay BELOW the gram projection, and the scan makes ONE
    // gram computation per row that serves BOTH the total count and
    // the explode — via `explode_outer` over the projected array.
    // Unlike `explode`, explode_outer triggers NO
    // InferFiltersFromGenerate `size(g) > 0` filter (the r8 hazard:
    // that predicate substituted the whole higher-order gram
    // expression — interpreted lambdas, CodegenFallback — into a
    // Filter below the repartition Exchange, where one scan task
    // evaluated it serially), and CollapseProject leaves the
    // non-cheap gram expression aliased, so it computes once.
    // explode_outer also keeps empty-candidate docs as ONE null-gram
    // row — with the bloom prefilter on a clean corpus that makes the
    // per-doc shuffle contribution one row instead of every gram.
    val evalDocs = docs.where(col("doc_id") % evalMod === 0)
    val evalG = evalDocs.select(explode(gramExpr).as("g")).distinct()
    val trainDocs = docs.where(col("doc_id") % evalMod =!= 0)
    // candidate grams per doc: all of them (exact lanes) or the
    // bloom-surviving subset (clean docs explode NOTHING downstream).
    // Default bloom regime (broadcastDict=true): the dictionary is
    // driver-size (that is what broadcasting a bloom over it means),
    // so collect the hashed keys ONCE (8 bytes/key, ~4x the bloom's
    // own bytes, bounded by the eval corpus not the train corpus),
    // build the bloom locally, and broadcast-join the exact
    // verification from the same collected array: one eval-set job
    // total, zero recomputation, and the post-bloom explode — ~one
    // row per clean doc — never shuffles into the join.
    // `broadcastDict=false` is the GIANT-dictionary regime (the
    // bloom's real niche: a dictionary whose BLOOM fits the driver —
    // 4-16x smaller than the exact keys — but whose exact form is too
    // big to collect or broadcast-join): the bloom builds with the
    // DISTRIBUTED aggregate (word-wise-OR merge, no key shuffle,
    // nothing driver-resident but the filter bytes) and the exact
    // verification shuffle-joins bloom survivors only.
    val (candExpr, dict) = if (bloomPrefilter && broadcastDict) {
      val spark = docs.sparkSession
      import spark.implicits._
      val keys = evalG.select(col("g").cast("bigint")).as[Long].collect()
      val bloom = BloomFunctions.buildBloomLocal(keys)
      (BloomFunctions.bloomFilterCandidates(col("__garr"), bloom),
        broadcast(keys.toSeq.toDF("g")))
    } else if (bloomPrefilter) {
      // one persisted materialization serves the sizing count, the
      // distributed bloom build AND the exact-verification join plan
      // (buildSizedBloom's internal persist would unpersist before the
      // join executes, recomputing the distinct-gram shuffle). The
      // handle stays persisted until the NEXT giant-dict call releases
      // it (giantDictRotate) — live entries are bounded to one, and in
      // production the dictionary is built once and probed by many
      // scans, exactly this reuse shape.
      val cached = giantDictRotate(
        evalG.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val (mBits, k) = BloomFunctions.sizeFor(cached.count())
      val bloom = BloomFunctions.buildBloom(cached, col("g"), mBits, k)
      (BloomFunctions.bloomFilterCandidates(col("__garr"), bloom), cached)
    } else (col("__garr"), evalG)
    val exploded = trainDocs.select(col("doc_id"), gramExpr.as("__garr"))
      .select(col("doc_id"), size(col("__garr")).cast("long").as("n_grams"),
        explode_outer(candExpr).as("g"))
    // left join against the marked dictionary (multiplicity 1: evalG
    // is distinct), count hits per doc — one shuffle, no join-back
    val hit = dict.withColumn("__hit", lit(1))
    exploded.join(hit, Seq("g"), "left")
      .groupBy("doc_id", "n_grams")
      .agg(count(col("__hit")).as("n_matched"))
      .withColumn("contam_frac",
        when(col("n_grams") > 0,
          round(col("n_matched").cast("double") / col("n_grams"), 6)))
      .withColumn("is_contaminated",
        (col("n_matched") >= 1).cast("long"))
      .select(col("doc_id"), col("n_grams"), col("n_matched"),
        col("contam_frac"), col("is_contaminated"))
      .orderBy("doc_id")
  }

  /** The one live giant-dictionary cache handle: a new call releases
    * the previous call's persisted dictionary (a lazily-consumed
    * DataFrame offers no end-of-life hook, so "next call evicts last"
    * bounds cached entries to one; disk-spilled blocks included —
    * plain LRU would only cover the memory store). */
  @volatile private var giantDict: DataFrame = _
  private def giantDictRotate(d: DataFrame): DataFrame = synchronized {
    if (giantDict != null && (giantDict ne d))
      giantDict.unpersist(blocking = false)
    giantDict = d
    d
  }

  private val Alphabet = "abcdefghijklmnopqrstuvwxyz"
  private val Rot13 = Alphabet.drop(13) + Alphabet.take(13)

  /** The realistic decontamination corpus shape: a SMALL eval set
    * (doc_id % 100 = 0 — benchmark suites are tiny next to a training
    * corpus) and an overwhelmingly clean train side (~0.1%
    * contamination). Eval docs and the rare truly-contaminated train
    * docs (doc_id % 999 = 1) keep their text; every other train doc's
    * letters rotate, making its gram set disjoint from the eval
    * dictionary. */
  private[graft] def cleanCorpus(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 100 === 0 || col("doc_id") % 999 === 1, col("text"))
        .otherwise(translate(col("text"), Alphabet, Rot13)).as("text"))

  // single line: embedding a multi-line fragment inside a template
  // that itself stripMargin's would eat the leading pipe of a `||`
  private val sqlInjectedPii: String =
    "text || ' contact u' || doc_id || '@ex' || (doc_id % 7) || " +
      "'.org or call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || " +
      "'-' || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0') || " +
      "' from 10.' || (doc_id % 256) || '.0.' || ((doc_id * 3) % 256) || " +
      "CASE WHEN doc_id % 3 = 0 THEN ' cc admin@site.net' ELSE '' END"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PII scrub: detect + redact emails / phones / IPv4 (reference has
    // no scrub pass; this is the standard pre-release corpus operator).
    // Counts come from the un-redacted text; the redacted string itself
    // is oracle-compared byte-for-byte.
    "q_pii_redact" -> ((s, dir) => {
      import TextFunctions._
      withInjectedPii(t(s, dir, "documents"))
        .select(col("doc_id"),
          piiCount(col("__txt"), PiiEmailPattern).as("n_emails"),
          piiCount(col("__txt"), PiiPhonePattern).as("n_phones"),
          piiCount(col("__txt"), PiiIpPattern).as("n_ips"),
          redactPii(col("__txt")).as("redacted"))
        .withColumn("n_chars_redacted", length(col("redacted")).cast("long"))
        .orderBy("doc_id")
    }),

    // Gopher-style repetition quality signals, shuffle-free: max token
    // multiplicity, duplicate-token fraction, duplicate-bigram
    // fraction, and the character coverage of the most repeated bigram
    // — all per-doc sorted-array scans (no n-gram explode/shuffle; the
    // oracle recomputes them the explode way in DuckDB).
    "q_repetition_ngram" -> ((s, dir) => {
      import TextFunctions._
      val toks = tokens(col("text"))
      val bgs = gramStrings(toks, 2)
      // sorted arrays materialized once per row (query-shape rule);
      // the run-stats struct likewise staged once per array — all
      // three signals come from ONE codegen'd pass (r11,
      // SortedRunStats) instead of three interpreted aggregates
      val staged = t(s, dir, "documents").select(col("doc_id"), col("n_chars"),
          array_sort(toks).as("__t"), array_sort(bgs).as("__b"))
        .select(col("doc_id"), col("n_chars"),
          size(col("__t")).cast("long").as("__nt"),
          size(col("__b")).cast("long").as("__nb"),
          sortedRunStats(col("__t")).as("__st"),
          sortedRunStats(col("__b")).as("__sb"))
      staged.select(
        col("doc_id"),
        col("__nt").as("n_tokens"),
        col("__st.max_run").as("max_token_cnt"),
        round(col("__st.dup_cnt").cast("double") / col("__nt"), 6).as("dup_token_frac"),
        when(col("__nb") > 0,
          round(col("__sb.dup_cnt").cast("double") / col("__nb"), 6))
          .as("dup_bigram_frac"),
        when(col("__nb") > 0,
          round(col("__sb.max_cover").cast("double") / col("n_chars"), 6))
          .as("top_bigram_cover")
      ).orderBy("doc_id")
    }),

    // Benchmark decontamination: docs with doc_id % 10 == 0 stand in
    // for the eval set; a training doc is flagged when any of its
    // distinct 5-gram shingles appears in the eval set. The candidate
    // join is a semi-join on the gram (string in the oracle lane,
    // int64 hash in the fast lane — same algebra, shared body below);
    // the eval dictionary is the small side and AQE broadcast-converts
    // it.
    "q_decontaminate" -> ((s, dir) =>
      decontaminate(t(s, dir, "documents"),
        TextFunctions.shingles(col("text"), 5))),

    // Production decontamination lane: identical algebra to
    // q_decontaminate, but the 5-grams are xxhash64'd BEFORE the
    // semi-join, so the shuffle carries int64 keys instead of full
    // n-gram text — at 100 TB that is the difference between moving
    // ~40 bytes and ~8 bytes per gram. The matched-doc set is
    // identical to the string lane (a false positive needs an xxhash64
    // collision inside the eval dictionary), so the SAME string-based
    // DuckDB oracle gates it.
    "q_decontaminate_fast" -> ((s, dir) => {
      import TextFunctions._
      decontaminate(t(s, dir, "documents"), hashedGrams(shingles(col("text"), 5), Xx64Hash))
    }),

    // Bloom-prefiltered decontamination — the 100 TB shape: identical
    // algebra and output to q_decontaminate_fast (same oracle), but a
    // broadcast Bloom filter over the eval gram dictionary screens each
    // doc's gram array in a zero-shuffle codegen'd projection, so only
    // maybe-contaminated grams explode into the semi-join. On a mostly
    // clean corpus the shuffle drops from "every gram of every doc" to
    // ~the true contamination volume (+ the bloom's ~0.05% FP).
    "q_decontaminate_bloom" -> ((s, dir) => {
      import TextFunctions._
      decontaminate(t(s, dir, "documents"), hashedGrams(shingles(col("text"), 5), Xx64Hash), bloomPrefilter = true)
    }),

    // CLEAN-corpus decontamination lanes — the shape the bloom
    // prefilter is designed for. The dense synthetic corpus (every doc
    // shares word-soup 5-grams with the eval set) makes the bloom
    // prune nothing while paying its build, so the dense lanes
    // under-sell the design; a production corpus is overwhelmingly
    // clean. Construction: training docs' letters ROT-13'd (gram sets
    // disjoint from the eval docs') except ~0.1% which keep the
    // original text — those are the true contamination. Both lanes run
    // the identical algebra on the identical corpus; the bloom lane's
    // probe empties ~every doc's candidate array BEFORE the explode,
    // so the semi-join shuffle carries ~nothing.
    "q_decontaminate_hash_clean" -> ((s, dir) => {
      import TextFunctions._
      decontaminate(cleanCorpus(s, dir), hashedGrams(shingles(col("text"), 5), Xx64Hash), evalMod = 100)
    }),
    "q_decontaminate_bloom_clean" -> ((s, dir) => {
      import TextFunctions._
      decontaminate(cleanCorpus(s, dir), hashedGrams(shingles(col("text"), 5), Xx64Hash), bloomPrefilter = true, evalMod = 100)
    }),

    // Stratified (per-source) deterministic sampling — the source-mix
    // rebalancer: keep a doc when its salted portable hash mod 1000
    // falls under the source's quota. Hash-threshold sampling is the
    // scale-correct form (pure projection, reproducible across runs
    // and engines — Bernoulli RNG sampling would be neither); md5
    // lane keeps DuckDB bit-parity, swap Xx64Hash in production.
    "q_stratified_sample" -> ((s, dir) => {
      import TextFunctions._
      val h = portableHash(concat(lit("samp:"), col("doc_id").cast("string")))
      val thr = when(col("source") === "src0", 1000)
        .when(col("source") === "src1", 500)
        .when(col("source") === "src2", 250).otherwise(100)
      t(s, dir, "documents")
        .withColumn("__keep", (h % 1000) < thr)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
          min(when(col("__keep"), col("doc_id"))).as("first_kept"),
          round(sum(when(col("__keep"), 1L).otherwise(0L)).cast("double")
            / count(lit(1)), 6).as("kept_frac"))
        .orderBy("source")
    }),

    // End-to-end curation funnel: the chained filter pipeline (language
    // -> length -> repetition) with per-stage survivor counts — one
    // pass, flags summed, no per-stage rescans. max_token_cnt rides the
    // same shuffle-free sorted-array scan as q_repetition_ngram.
    "q_corpus_funnel" -> ((s, dir) => {
      import TextFunctions._
      val staged = t(s, dir, "documents").select(col("lang"), col("n_chars"),
        array_sort(tokens(col("text"))).as("__t"))
      val f1 = col("lang") === "en"
      val f2 = f1 && col("n_chars").between(150, 450)
      val f3 = f2 && maxRunLength(col("__t")) <= 6
      staged.agg(
        count(lit(1)).as("n_total"),
        sum(f1.cast("long")).as("n_lang"),
        sum(f2.cast("long")).as("n_len"),
        sum(f3.cast("long")).as("n_quality"),
        round(sum(f3.cast("long")).cast("double") / count(lit(1)), 6)
          .as("survival_rate"))
    }),

    // Exact-substring span dedup (Lee et al. 2021, arXiv:2107.06499
    // "Deduplicating Training Data Makes Language Models Better"):
    // find every K-token span whose K-gram occurs more than once in
    // the corpus, and merge overlapping/adjacent anchors into per-doc
    // spans to cut. Shape at 100 TB: explode (gramHash, doc, pos) —
    // linear, hashes not text move; one shuffle to count gram
    // multiplicity (partial-agg absorbs hot grams); one semi-join back
    // to positions; one groupBy doc with a sorted-array interval-merge
    // fold (per-doc bounded, no global window). The synthetic corpus
    // has few natural 6-gram repeats, so boilerplate phrases are
    // injected from doc_id math (every 4th doc one licence-like
    // phrase; every 8th a second, separated by a unique token so the
    // islands stay distinct) — both engines build identical text.
    "q_span_dedup" -> ((s, dir) => {
      import TextFunctions._
      val K = 6
      val boilA = "shared boilerplate segment one two three four five six seven eight nine"
      val boilB = "alternate boilerplate run ten eleven twelve thirteen fourteen"
      val txt = concat(col("text"),
        when(col("doc_id") % 4 === 0, lit(" " + boilA)).otherwise(lit("")),
        when(col("doc_id") % 8 === 0,
          concat(lit(" zz"), col("doc_id").cast("string"), lit(" " + boilB)))
          .otherwise(lit("")))
      val base = t(s, dir, "documents")
        .select(col("doc_id"), split(txt, " ").as("t"))
      // gram hashes computed ONCE per doc in the codegen'd kernel,
      // then position-exploded — replaces a per-exploded-row
      // slice/concat_ws/md5-hex chain (r11; bit-identical, see
      // TokenGramHashes)
      val g = base.select(col("doc_id"),
          posexplode(graft.functions.TextFunctions.tokenGramHashes(
            col("t"), K, Md5Hash)))
        .select(col("doc_id"), col("pos"), col("col").as("h"))
      val dup = g.groupBy("h").agg(count(lit(1)).as("__c"))
        .where(col("__c") > 1).select("h")
      val anchors = g.join(dup, Seq("h"), "left_semi")
      // interval merge: sorted anchor positions folded left-to-right;
      // a span is [pos, pos+K), merged when it overlaps/abuts the
      // running end — integer arithmetic, exact in both engines
      val zero = struct(lit(0L).as("n"), lit(0L).as("cov"), lit(-1L).as("le"))
      val merged = anchors.groupBy("doc_id")
        .agg(sort_array(collect_list(col("pos"))).as("ps"))
        .select(col("doc_id"), aggregate(col("ps"), zero, (acc, p) => {
          val pl = p.cast("long")
          when(pl > acc.getField("le"),
            struct((acc.getField("n") + 1L).as("n"),
              (acc.getField("cov") + K).as("cov"), (pl + K).as("le")))
            .otherwise(struct(acc.getField("n").as("n"),
              (acc.getField("cov") + pl + K - acc.getField("le")).as("cov"),
              (pl + K).as("le")))
        }).as("st"))
      base.select(col("doc_id"), size(col("t")).cast("long").as("total_tokens"))
        .join(merged, Seq("doc_id"), "left")
        .select(col("doc_id"), col("total_tokens"),
          coalesce(col("st.n"), lit(0L)).as("n_dup_spans"),
          coalesce(col("st.cov"), lit(0L)).as("dup_tokens"),
          round(coalesce(col("st.cov"), lit(0L)).cast("double")
            / col("total_tokens"), 6).as("dup_frac"))
        .orderBy("doc_id")
    }),

    // Per-source document cap — the domain-balancing pass of a crawl
    // pipeline ("keep at most N docs per domain"): rank docs inside
    // each source by a salted portable hash (deterministic and
    // engine-portable — NOT ingest order, which neither engine
    // reproduces) and keep rank <= cap. Scale shape: per-domain
    // counts first, then ONLY the over-quota domains go through the
    // ranking window (broadcast semi/anti split) — on a heavy-tailed
    // domain distribution the under-quota tail (most domains, most
    // rows) never shuffles into a window at all; use hash-threshold
    // sampling (q_stratified_sample) when approximate caps suffice.
    "q_source_cap" -> ((s, dir) => {
      import TextFunctions._
      import org.apache.spark.sql.expressions.Window
      val cap = 100
      // heavy-tailed domain mix built from doc_id math (the synthetic
      // sources are uniform): half the corpus collapses into one
      // "bigdomain", so the over-quota window path AND the under-quota
      // pass-through both execute at every verify scale
      val docs = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 2 === 0, lit("bigdomain"))
          .otherwise(col("source")).as("source"))
      val over = docs.groupBy("source").agg(count(lit(1)).as("__n"))
        .where(col("__n") > cap).select("source")
      val h = portableHash(concat(lit("cap:"), col("doc_id").cast("string")))
      val w = Window.partitionBy(col("source")).orderBy(h, col("doc_id"))
      val ranked = docs.join(broadcast(over), Seq("source"), "left_semi")
        .withColumn("__keep", row_number().over(w) <= cap)
      val pass = docs.join(broadcast(over), Seq("source"), "left_anti")
        .withColumn("__keep", lit(true))
      ranked.unionByName(pass)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("__keep"), col("doc_id"))).as("kept_id_sum"),
          min(when(col("__keep"), col("doc_id"))).as("first_kept"))
        .orderBy("source")
    }),

    // Sequence packing (concat-and-chop): documents concatenated in
    // doc_id order and cut into fixed 64-token training bins — each
    // doc's bin span from an exclusive prefix sum of token counts.
    // cumsum is the two-phase block scan; the integer bin arithmetic
    // is exact in both engines (DIV / //).
    "q_seq_pack" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      graft.operators.OrderedOps.cumsum(docs, "n_tokens", "__cum",
        rowIndex = "doc_id", blockSize = 64L)
        .select(col("doc_id"), col("n_tokens"),
          expr("(__cum - n_tokens) DIV 64").as("first_bin"),
          expr("(__cum - 1) DIV 64").as("last_bin"),
          (expr("(__cum - 1) DIV 64") - expr("(__cum - n_tokens) DIV 64") + 1L)
            .as("n_chunks"),
          expr("(__cum - n_tokens) % 64").as("bin_offset"))
        .orderBy("doc_id")
    }),

    // Corpus-level paragraph dedup (the CCNet pass, Wenzek et al.
    // 2019 arXiv:1911.00359: hash every paragraph, drop all but the
    // first occurrence ACROSS the whole corpus — removes boilerplate
    // like cookie banners that per-doc repetition rules can't see).
    // Pages are synthesized deterministically from doc_id math
    // (paragraphs of 6+doc_id%3 tokens; every 2nd doc gets a shared
    // newsletter banner, every 5th a cookie banner), so both engines
    // explode byte-identical paragraphs. Scale shape: explode ->
    // ONE shuffle on the 64-bit paragraph hash (keep-first =
    // row_number over the hash partition; hashes move, text rides
    // only as the kept-length payload) -> one groupBy doc_id to
    // reassemble. No join-back, no driver state. The md5-parity hash
    // gates the oracle; production would swap in xxhash64 exactly
    // like the decontaminate/_fast pair.
    "q_paragraph_dedup" -> ((s, dir) =>
      paragraphDedup(s, dir, c => TextFunctions.portableHash(c))),

    // production-hash lane: IDENTICAL pipeline keyed on codegen'd
    // xxhash64 instead of the oracle-parity md5 — same answer for any
    // collision-free hash, so BOTH lanes gate on the ONE md5 oracle
    // (the decontaminate/_fast pattern)
    "q_paragraph_dedup_fast" -> ((s, dir) =>
      paragraphDedup(s, dir, c => xxhash64(c))),

    // DSIR data selection (Xie et al. 2023, arXiv:2302.03169 "Data
    // Selection for Language Models via Importance Resampling"):
    // score every raw doc by how target-like its hashed-bigram
    // distribution is — log importance weight = sum over the doc's
    // bigram instances of log(p_target[bucket]/p_raw[bucket]) with
    // Laplace-smoothed bucket probabilities — then resample the top
    // 10% under deterministic Gumbel perturbation (the paper's
    // Gumbel-top-k, with uniforms from the portable hash so both
    // engines draw identical noise). Target split = doc_id%10==0
    // (stands in for the Wikipedia-quality anchor corpus). Scale
    // shape: ONE explode->groupBy builds the 512-bucket table (tiny,
    // broadcast back); scoring is explode -> broadcast-join ->
    // per-doc decimal sum — one shuffle on doc_id; the P90 threshold
    // is a single exact-percentile aggregate over one weight per doc
    // (bounded), not a global sort of the corpus.
    "q_dsir_select" -> ((s, dir) => {
      import TextFunctions._
      val B = 512
      val tks = split(col("text"), " ")
      // bigram hashes in one codegen'd kernel pass (r11) — the explode
      // then carries an 8-byte hash instead of the gram string
      val g = t(s, dir, "documents")
        .select(col("doc_id"), (col("doc_id") % 10 === 0).as("is_t"),
          explode(graft.functions.TextFunctions.tokenGramHashes(
            tks, 2, Md5Hash)).as("h"))
        .select(col("doc_id"), col("is_t"),
          pmod(col("h"), lit(B.toLong)).as("b"))
      val buckets = g.groupBy("b").agg(
        sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
        sum(when(!col("is_t"), 1L).otherwise(0L)).as("cr"))
      val totals = buckets.agg(sum("ct").as("tt"), sum("cr").as("tr"))
      val lr = log((col("ct") + 0.5) / (col("tt") + B * 0.5)) -
        log((col("cr") + 0.5) / (col("tr") + B * 0.5))
      val scored = g.where(!col("is_t"))
        .join(broadcast(buckets), "b").crossJoin(broadcast(totals))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"), r(dsumD(lr), 6).as("weight"))
      // Gumbel(0,1) = -ln(-ln(U)); U from the salted portable hash so
      // the draw is reproducible and engine-portable
      val u = (pmod(portableHash(concat(lit("dsir:"), col("doc_id").cast("string"))),
        lit(1000000L)).cast("double") + 0.5) / 1000000.0
      val gw = scored.withColumn("gweight", r(col("weight") - log(-log(u)), 6))
      val thr = gw.agg(percentile(col("gweight"), lit(0.9)).as("__p90"))
      gw.crossJoin(broadcast(thr))
        .select(col("doc_id"), col("n_grams"), col("weight"), col("gweight"),
          (col("gweight") > col("__p90")).cast("long").as("selected"))
        .orderBy("doc_id")
    }),

    // Temperature-based source mixing (the multinomial up/down-
    // sampling of multilingual/multi-source training mixes, XLM-R
    // style: p_s ∝ n_s^alpha with alpha<1 flattening the head):
    // per-source quotas from the tempered distribution, then the
    // deterministic salted-hash ranking picks each source's docs.
    // Scale shape: the quota table is per-source (tiny, broadcast);
    // ranking shuffles once on source — same window discipline as
    // q_source_cap (only ranked partitions move).
    "q_temperature_mix" -> ((s, dir) => {
      import TextFunctions._
      import org.apache.spark.sql.expressions.Window
      val alpha = 0.7; val target = 200
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"))
      val counts = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      val z = counts.agg(
        dsumD(pow(col("n_docs").cast("double"), alpha)).as("z"))
      // p is rounded to 6 decimals BEFORE the integer quota threshold:
      // pow() is only 1-ulp-reproducible across libm implementations,
      // and floor(p*target+0.5) would turn a last-ulp Spark/DuckDB
      // difference into a quota off by one — rounding first keeps the
      // boundary 1e-6 wide instead of 1 ulp
      val quota = counts.crossJoin(broadcast(z))
        .withColumn("p",
          round(pow(col("n_docs").cast("double"), alpha) / col("z"), 6))
        .withColumn("quota", floor(col("p") * target + 0.5).cast("long"))
      val h = portableHash(concat(lit("mix:"), col("doc_id").cast("string")))
      val ranked = docs
        .join(broadcast(quota.select("source", "quota", "p")), Seq("source"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("source").orderBy(h, col("doc_id"))))
      ranked.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          max(col("quota")).as("quota"),
          sum(when(col("rk") <= col("quota"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("rk") <= col("quota"), col("doc_id")).otherwise(0L))
            .as("kept_id_sum"),
          max(col("p")).as("p"))
        .orderBy("source")
    }),

    // Domain PageRank — the link-graph quality signal crawl curation
    // uses to weight domains (e.g. CommonCrawl seed ranking; Page et
    // al. 1999): weighted power iteration over a 50-node domain graph
    // synthesized from doc_id math (both engines build identical
    // edges). rank' = 0.15/N + 0.85 * sum_in rank*w/outw, 5 fixed
    // iterations. Scale shape: each iteration is ONE join (ranks
    // joined to edge list, both keyed by src) + one groupBy dst —
    // the edge list never moves to the driver and a 1e9-edge graph
    // shuffles only (dst, contrib) pairs; per-node incoming sums are
    // decimal-exact so iteration k's ranks are bit-identical across
    // partitionings and engines.
    "q_pagerank_domains" -> ((s, dir) => {
      val N = 50; val iters = 5
      val base = t(s, dir, "documents").select(
        (col("doc_id") % N).as("src"),
        pmod((col("doc_id") % N) * 7 + 3 + expr("doc_id DIV 50") % 5,
          lit(N.toLong)).as("dst"))
      val w = base.groupBy("src", "dst").agg(count(lit(1)).as("w"))
      val outw = w.groupBy("src").agg(sum("w").as("ow"))
      val edges = w.join(outw, "src").select(col("src"), col("dst"),
        (col("w").cast("double") / col("ow").cast("double")).as("frac"))
      // fresh node frames per iteration + USING-joins on renamed keys:
      // iteration k's plan embeds iteration k-1's, so dataframe-
      // attribute references (df("col")) would trip ambiguous-self-join
      // resolution — name-based joins stay unambiguous
      def freshNodes = s.range(N).select(col("id").as("node"))
      var ranks = freshNodes.select(col("node"), lit(1.0 / N).as("rank"))
      for (_ <- 1 to iters) {
        val in = edges.join(ranks.withColumnRenamed("node", "src"), Seq("src"))
          .groupBy(col("dst"))
          .agg(dsumD(col("rank") * col("frac")).as("in_r"))
        ranks = freshNodes
          .join(in.withColumnRenamed("dst", "node"), Seq("node"), "left")
          .select(col("node"),
            (lit(0.15 / N) + lit(0.85) * coalesce(col("in_r"), lit(0.0)))
              .as("rank"))
      }
      val inW = base.groupBy(col("dst").as("node")).agg(count(lit(1)).as("in_w"))
      ranks.join(inW, Seq("node"), "left")
        .select(col("node"), round(col("rank"), 8).as("rank"),
          coalesce(col("in_w"), lit(0L)).as("in_w"))
        .orderBy("node")
    })
  )

  private def q(s: String): String = s.replace("'", "''")

  val oracleSql: Map[String, String] = Map(
    "q_pii_redact" ->
      s"""WITH p AS (SELECT doc_id, $sqlInjectedPii AS txt FROM documents),
         |r AS (SELECT doc_id,
         |  CAST(LEN(regexp_extract_all(txt, '${q(TextFunctions.PiiEmailPattern)}')) AS BIGINT) AS n_emails,
         |  CAST(LEN(regexp_extract_all(txt, '${q(TextFunctions.PiiPhonePattern)}')) AS BIGINT) AS n_phones,
         |  CAST(LEN(regexp_extract_all(txt, '${q(TextFunctions.PiiIpPattern)}')) AS BIGINT) AS n_ips,
         |  regexp_replace(regexp_replace(regexp_replace(txt,
         |    '${q(TextFunctions.PiiEmailPattern)}', '<EMAIL>', 'g'),
         |    '${q(TextFunctions.PiiPhonePattern)}', '<PHONE>', 'g'),
         |    '${q(TextFunctions.PiiIpPattern)}', '<IP>', 'g') AS redacted
         |FROM p)
         |SELECT doc_id, n_emails, n_phones, n_ips, redacted,
         |  CAST(LENGTH(redacted) AS BIGINT) AS n_chars_redacted
         |FROM r ORDER BY doc_id""".stripMargin,

    "q_repetition_ngram" ->
      """WITH tk AS (SELECT doc_id, n_chars, string_split(text, ' ') AS tks FROM documents),
        |tok AS (SELECT doc_id, UNNEST(tks) AS t FROM tk),
        |tc AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY 1, 2),
        |ts AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |       CAST(MAX(c) AS BIGINT) AS max_token_cnt,
        |       CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_tokens
        |       FROM tc GROUP BY 1),
        |bg AS (SELECT doc_id, CASE WHEN LEN(tks) >= 2
        |       THEN list_transform(range(0, LEN(tks) - 1), i -> tks[i+1] || ' ' || tks[i+2])
        |       ELSE [] END AS bgs FROM tk),
        |bgu AS (SELECT doc_id, UNNEST(bgs) AS b FROM bg),
        |bc AS (SELECT doc_id, b, COUNT(*) AS c FROM bgu GROUP BY 1, 2),
        |bs AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
        |       CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_bigrams,
        |       CAST(MAX(c * LENGTH(b)) AS BIGINT) AS top_cover FROM bc GROUP BY 1)
        |SELECT d.doc_id, ts.n_tokens, ts.max_token_cnt,
        |  ROUND(CAST(ts.dup_tokens AS DOUBLE) / ts.n_tokens, 6) AS dup_token_frac,
        |  CASE WHEN COALESCE(bs.n_bigrams, 0) > 0
        |    THEN ROUND(CAST(bs.dup_bigrams AS DOUBLE) / bs.n_bigrams, 6) END AS dup_bigram_frac,
        |  CASE WHEN COALESCE(bs.n_bigrams, 0) > 0
        |    THEN ROUND(CAST(bs.top_cover AS DOUBLE) / d.n_chars, 6) END AS top_bigram_cover
        |FROM documents d JOIN ts ON d.doc_id = ts.doc_id
        |LEFT JOIN bs ON d.doc_id = bs.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q_decontaminate" -> decontaminateSql,
    // the hashed and bloom-prefiltered lanes must produce byte-identical
    // output to the string lane — gate all three against the same oracle
    "q_decontaminate_fast" -> decontaminateSql,
    "q_decontaminate_bloom" -> decontaminateSql,
    // the clean-corpus lanes share ONE oracle too (same algebra over
    // the rotated corpus; hashed and bloom outputs must be identical)
    "q_decontaminate_hash_clean" -> decontaminateCleanSql,
    "q_decontaminate_bloom_clean" -> decontaminateCleanSql,

    "q_span_dedup" ->
      """WITH d2 AS (
        |  SELECT doc_id, text
        |    || CASE WHEN doc_id % 4 = 0
        |         THEN ' shared boilerplate segment one two three four five six seven eight nine'
        |         ELSE '' END
        |    || CASE WHEN doc_id % 8 = 0
        |         THEN ' zz' || doc_id || ' alternate boilerplate run ten eleven twelve thirteen fourteen'
        |         ELSE '' END AS text
        |  FROM documents),
        |tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM d2),
        |g AS (SELECT doc_id, UNNEST(range(0, GREATEST(LEN(t) - 5, 0))) AS pos, t FROM tk),
        |g2 AS (SELECT doc_id, pos,
        |  ('0x' || substring(md5(array_to_string(t[pos+1:pos+6], ' ')), 1, 15))::BIGINT AS h
        |FROM g),
        |dup AS (SELECT h FROM g2 GROUP BY h HAVING COUNT(*) > 1),
        |a AS (SELECT g2.doc_id, g2.pos FROM g2 JOIN dup USING (h)),
        |isl AS (SELECT doc_id, pos,
        |  CASE WHEN pos > COALESCE(MAX(pos + 6) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS newisl
        |FROM a),
        |isl2 AS (SELECT doc_id, pos,
        |  SUM(newisl) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS iid
        |FROM isl),
        |spans AS (SELECT doc_id, iid, MIN(pos) AS s, MAX(pos) + 6 AS e
        |FROM isl2 GROUP BY 1, 2),
        |per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
        |  CAST(SUM(e - s) AS BIGINT) AS dup_tokens FROM spans GROUP BY 1)
        |SELECT tk.doc_id, CAST(LEN(tk.t) AS BIGINT) AS total_tokens,
        |  COALESCE(per.n_dup_spans, 0) AS n_dup_spans,
        |  COALESCE(per.dup_tokens, 0) AS dup_tokens,
        |  ROUND(CAST(COALESCE(per.dup_tokens, 0) AS DOUBLE) / LEN(tk.t), 6) AS dup_frac
        |FROM tk LEFT JOIN per ON tk.doc_id = per.doc_id
        |ORDER BY tk.doc_id""".stripMargin,

    "q_source_cap" ->
      """WITH d AS (SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'bigdomain' ELSE source END AS source
        |FROM documents),
        |r AS (SELECT source, doc_id,
        |  ROW_NUMBER() OVER (PARTITION BY source
        |    ORDER BY ('0x' || substring(md5('cap:' || doc_id), 1, 15))::BIGINT, doc_id) AS rk
        |FROM d)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN rk <= 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN rk <= 100 THEN doc_id END) AS BIGINT) AS kept_id_sum,
        |  MIN(CASE WHEN rk <= 100 THEN doc_id END) AS first_kept
        |FROM r GROUP BY source ORDER BY source""".stripMargin,

    "q_stratified_sample" ->
      """WITH k AS (SELECT source, doc_id,
        |  (('0x' || substring(md5('samp:' || doc_id), 1, 15))::BIGINT % 1000) <
        |    (CASE source WHEN 'src0' THEN 1000 WHEN 'src1' THEN 500
        |      WHEN 'src2' THEN 250 ELSE 100 END) AS keep
        |FROM documents)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  MIN(CASE WHEN keep THEN doc_id END) AS first_kept,
        |  ROUND(CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS kept_frac
        |FROM k GROUP BY source ORDER BY source""".stripMargin,

    "q_corpus_funnel" ->
      """WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS t FROM documents),
        |tc AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY 1, 2),
        |mx AS (SELECT doc_id, MAX(c) AS max_cnt FROM tc GROUP BY 1),
        |f AS (SELECT d.lang = 'en' AS f1,
        |  d.lang = 'en' AND d.n_chars BETWEEN 150 AND 450 AS f2,
        |  d.lang = 'en' AND d.n_chars BETWEEN 150 AND 450 AND mx.max_cnt <= 6 AS f3
        |FROM documents d JOIN mx ON d.doc_id = mx.doc_id)
        |SELECT COUNT(*) AS n_total,
        |  CAST(SUM(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
        |  CAST(SUM(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT) AS n_len,
        |  CAST(SUM(CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
        |  ROUND(CAST(SUM(CASE WHEN f3 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS survival_rate
        |FROM f""".stripMargin,

    "q_seq_pack" ->
      """WITH c AS (SELECT doc_id,
        |  CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(SUM(LEN(string_split(text, ' '))) OVER (ORDER BY doc_id) AS BIGINT) AS cum
        |FROM documents)
        |SELECT doc_id, n_tokens,
        |  CAST((cum - n_tokens) // 64 AS BIGINT) AS first_bin,
        |  CAST((cum - 1) // 64 AS BIGINT) AS last_bin,
        |  CAST((cum - 1) // 64 - (cum - n_tokens) // 64 + 1 AS BIGINT) AS n_chunks,
        |  CAST((cum - n_tokens) % 64 AS BIGINT) AS bin_offset
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_paragraph_dedup" -> paragraphDedupSql,
    // the xxhash64 lane answers the SAME oracle (hash choice is
    // invisible to the result for any collision-free hash)
    "q_paragraph_dedup_fast" -> paragraphDedupSql,

    "q_dsir_select" ->
      s"""WITH tk AS (
         |  SELECT doc_id, doc_id % 10 = 0 AS is_t, string_split(text, ' ') AS t
         |  FROM documents),
         |g0 AS (
         |  SELECT doc_id, is_t, UNNEST(range(0, GREATEST(LEN(t) - 1, 0))) AS i, t
         |  FROM tk),
         |g AS (
         |  SELECT doc_id, is_t,
         |    ('0x' || substring(md5(t[i+1] || ' ' || t[i+2]), 1, 15))::BIGINT % 512 AS b
         |  FROM g0),
         |bk AS (
         |  SELECT b, SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
         |    SUM(CASE WHEN NOT is_t THEN 1 ELSE 0 END) AS cr
         |  FROM g GROUP BY 1),
         |tot AS (SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM bk),
         |sc AS (
         |  SELECT doc_id, COUNT(*) AS n_grams,
         |    ROUND(${sqlDsum("LN((ct + 0.5) / (tt + 256.0)) - LN((cr + 0.5) / (tr + 256.0))")}, 6) AS weight
         |  FROM g JOIN bk USING (b) CROSS JOIN tot
         |  WHERE NOT is_t GROUP BY doc_id),
         |gw AS (
         |  SELECT doc_id, n_grams, weight,
         |    ROUND(weight - LN(-LN(
         |      (('0x' || substring(md5('dsir:' || doc_id), 1, 15))::BIGINT % 1000000
         |        + 0.5) / 1000000.0)), 6) AS gweight
         |  FROM sc),
         |thr AS (SELECT QUANTILE_CONT(gweight, 0.9) AS p90 FROM gw)
         |SELECT doc_id, n_grams, weight, gweight,
         |  CAST(CASE WHEN gweight > p90 THEN 1 ELSE 0 END AS BIGINT) AS selected
         |FROM gw CROSS JOIN thr ORDER BY doc_id""".stripMargin,

    "q_pagerank_domains" -> pagerankSql,

    "q_temperature_mix" ->
      """WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
        |z AS (SELECT CAST(SUM(CAST(POWER(CAST(n_docs AS DOUBLE), 0.7)
        |  AS DECIMAL(38,10))) AS DOUBLE) AS z FROM c),
        |q AS (SELECT source, n_docs,
        |  ROUND(POWER(CAST(n_docs AS DOUBLE), 0.7) / z, 6) AS p,
        |  CAST(FLOOR(ROUND(POWER(CAST(n_docs AS DOUBLE), 0.7) / z, 6) * 200
        |    + 0.5) AS BIGINT) AS quota
        |  FROM c CROSS JOIN z),
        |r AS (SELECT d.doc_id, d.source, q.quota, q.p,
        |  ROW_NUMBER() OVER (PARTITION BY d.source
        |    ORDER BY ('0x' || substring(md5('mix:' || d.doc_id), 1, 15))::BIGINT,
        |      d.doc_id) AS rk
        |  FROM documents d JOIN q USING (source))
        |SELECT source, COUNT(*) AS n_docs, MAX(quota) AS quota,
        |  CAST(SUM(CASE WHEN rk <= quota THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN rk <= quota THEN doc_id ELSE 0 END) AS BIGINT)
        |    AS kept_id_sum,
        |  MAX(p) AS p
        |FROM r GROUP BY source ORDER BY source""".stripMargin
  )

  /** The one DuckDB oracle both paragraph-dedup lanes hash-match. */
  private lazy val paragraphDedupSql: String =
    """WITH tk AS (
      |  SELECT doc_id, string_split(text, ' ') AS tks,
      |    CAST(6 + doc_id % 3 AS INT) AS w
      |  FROM documents),
      |pl AS (
      |  SELECT doc_id, list_concat(list_concat(
      |    list_transform(
      |      range(0, GREATEST(CAST(CEIL(CAST(LEN(tks) AS DOUBLE) / w) AS INT), 1)),
      |      i -> array_to_string(tks[i*w+1 : i*w+w], ' ')),
      |    CASE WHEN doc_id % 2 = 0
      |      THEN ['subscribe to our newsletter for weekly updates']
      |      ELSE CAST([] AS VARCHAR[]) END),
      |    CASE WHEN doc_id % 5 = 0
      |      THEN ['this site uses cookies to improve your experience']
      |      ELSE CAST([] AS VARCHAR[]) END) AS paras
      |  FROM tk),
      |ex AS (
      |  SELECT doc_id, unnest(paras) AS para,
      |    unnest(range(len(paras))) AS idx
      |  FROM pl),
      |mk AS (
      |  SELECT doc_id, para,
      |    ROW_NUMBER() OVER (
      |      PARTITION BY ('0x' || substring(md5(para), 1, 15))::BIGINT
      |      ORDER BY doc_id, idx) AS rn
      |  FROM ex)
      |SELECT doc_id, COUNT(*) AS n_paragraphs,
      |  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN rn = 1 THEN LENGTH(para) ELSE 0 END) AS BIGINT)
      |    AS n_chars_kept,
      |  CAST(CASE WHEN SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) > 0
      |    THEN 1 ELSE 0 END AS BIGINT) AS doc_kept
      |FROM mk GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Shared CCNet paragraph-dedup body (see the q_paragraph_dedup
    * scaladoc comment in `queries`); `hashFn` picks the dedup key —
    * md5-parity for the oracle lane, xxhash64 for production. */
  private def paragraphDedup(s: SparkSession, dir: String,
      hashFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = (lit(6) + col("doc_id") % 3).cast("int")
    val tks = split(col("text"), " ")
    val nP = greatest(
      ceil(size(tks).cast("double") / w.cast("double")).cast("int"), lit(1))
    val body = transform(sequence(lit(0), nP - 1),
      i => array_join(slice(tks, i * w + 1, w), " "))
    val emptyArr = array().cast("array<string>")
    val paras = concat(body,
      when(col("doc_id") % 2 === 0,
        array(lit("subscribe to our newsletter for weekly updates")))
        .otherwise(emptyArr),
      when(col("doc_id") % 5 === 0,
        array(lit("this site uses cookies to improve your experience")))
        .otherwise(emptyArr))
    val exploded = t(s, dir, "documents")
      .select(col("doc_id"), posexplode(paras).as(Seq("idx", "para")))
    val rn = row_number().over(
      Window.partitionBy(hashFn(col("para"))).orderBy("doc_id", "idx"))
    exploded.withColumn("__rn", rn)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_paragraphs"),
        sum(when(col("__rn") === 1, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__rn") === 1, length(col("para")).cast("long"))
          .otherwise(0L)).as("n_chars_kept"))
      .select(col("doc_id"), col("n_paragraphs"), col("n_kept"),
        col("n_chars_kept"),
        (col("n_kept") > 0L).cast("long").as("doc_kept"))
      .orderBy("doc_id")
  }

  /** 5 unrolled power-iteration CTEs mirroring the Spark loop. */
  private lazy val pagerankSql: String = {
    val iterCtes = (1 to 5).map { i =>
      s"""r$i AS (
         |  SELECT n.node,
         |    CAST(0.15 AS DOUBLE)/50 + 0.85 * COALESCE(s.in_r, 0.0) AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst, ${sqlDsum(s"rp.rank * e.frac")} AS in_r
         |    FROM en e JOIN r${i - 1} rp ON rp.node = e.src
         |    GROUP BY e.dst) s ON s.dst = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH base AS (
       |  SELECT doc_id % 50 AS src,
       |    ((doc_id % 50) * 7 + 3 + (doc_id // 50) % 5) % 50 AS dst
       |  FROM documents),
       |w AS (SELECT src, dst, COUNT(*) AS w FROM base GROUP BY 1, 2),
       |ow AS (SELECT src, SUM(w) AS ow FROM w GROUP BY 1),
       |en AS (SELECT w.src, w.dst,
       |  CAST(w.w AS DOUBLE) / CAST(ow.ow AS DOUBLE) AS frac
       |  FROM w JOIN ow USING (src)),
       |nodes AS (SELECT UNNEST(range(50)) AS node),
       |r0 AS (SELECT node, CAST(1.0 AS DOUBLE)/50 AS rank FROM nodes),
       |$iterCtes,
       |iw AS (SELECT dst AS node, COUNT(*) AS in_w FROM base GROUP BY 1)
       |SELECT n.node, ROUND(r5.rank, 8) AS rank,
       |  CAST(COALESCE(iw.in_w, 0) AS BIGINT) AS in_w
       |FROM nodes n JOIN r5 ON r5.node = n.node
       |LEFT JOIN iw ON iw.node = n.node
       |ORDER BY n.node""".stripMargin
  }

  /** Same algebra over the [[cleanCorpus]] rotation, 1% eval split. */
  private lazy val decontaminateCleanSql: String =
      s"""WITH base AS (SELECT doc_id,
        |  CASE WHEN doc_id % 100 = 0 OR doc_id % 999 = 1 THEN text
        |       ELSE translate(text, '$Alphabet', '$Rot13') END AS text
        |  FROM documents),
        |""".stripMargin +
      decontaminateSql.replace(
        "WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tks FROM documents),",
        "tk AS (SELECT doc_id, string_split(text, ' ') AS tks FROM base),")
        .replace("doc_id % 10", "doc_id % 100")

  private lazy val decontaminateSql: String =
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tks FROM documents),
        |g AS (SELECT doc_id, CASE WHEN LEN(tks) >= 5
        |  THEN list_distinct(list_transform(range(0, LEN(tks) - 4),
        |    i -> tks[i+1] || ' ' || tks[i+2] || ' ' || tks[i+3] || ' ' || tks[i+4] || ' ' || tks[i+5]))
        |  ELSE [] END AS g5 FROM tk),
        |ev AS (SELECT DISTINCT UNNEST(g5) AS gr FROM g WHERE doc_id % 10 = 0),
        |tr AS (SELECT doc_id, UNNEST(g5) AS gr FROM g WHERE doc_id % 10 <> 0),
        |m AS (SELECT doc_id, COUNT(*) AS n_matched FROM tr
        |      WHERE gr IN (SELECT gr FROM ev) GROUP BY 1)
        |SELECT g.doc_id, CAST(LEN(g.g5) AS BIGINT) AS n_grams,
        |  CAST(COALESCE(m.n_matched, 0) AS BIGINT) AS n_matched,
        |  CASE WHEN LEN(g.g5) > 0
        |    THEN ROUND(CAST(COALESCE(m.n_matched, 0) AS DOUBLE) / LEN(g.g5), 6) END AS contam_frac,
        |  CAST(CASE WHEN COALESCE(m.n_matched, 0) >= 1 THEN 1 ELSE 0 END AS BIGINT) AS is_contaminated
        |FROM g LEFT JOIN m ON g.doc_id = m.doc_id
        |WHERE g.doc_id % 10 <> 0 ORDER BY g.doc_id""".stripMargin
}
