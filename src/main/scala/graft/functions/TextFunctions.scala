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
  * Hashing strategy (cost-critical at scale):
  *   - ONE string hash per shingle/doc (`portableHash` 60-bit for
  *     fingerprints/band keys, `baseHash` 28-bit for per-shingle/token
  *     hashes), in one of two families ([[HashFamily]]): md5 (DuckDB
  *     bit-parity: `('0x' || substring(md5(x),1,n))::BIGINT`) or
  *     xxhash64 (production default — codegen'd, ~10× cheaper).
  *   - The k independent functions MinHash needs come from a universal
  *     hash family over the single base hash:
  *     h_i(x) = (a_i·x + b_i) mod p, p = 2^31-1 — integer multiply-add
  *     instead of k md5 evaluations (k× cheaper, measured 8.5s -> <1s
  *     on the sf0.1 battery), same independence guarantees
  *     (Carter-Wegman universal hashing).
  *
  * Query-shape rule: materialize hash ARRAYS in a projection stage and
  * reference the resulting column — Catalyst does not re-collapse
  * non-cheap expressions referenced more than once, so the array is
  * computed once per row instead of once per consumer.
  */
object TextFunctions {

  // -------------------------------------------------------------- hashing

  /** Hash-family switch. `Md5Hash` is the oracle-parity lane: one md5
    * per string, bit-identical in DuckDB, but each hash round-trips
    * through a 32-char hex string — measured at ~84 % of the sf0.1
    * battery wall-time. `Xx64Hash` is the production lane: Spark's
    * codegen'd `xxhash64` (murmur-family long arithmetic, no string
    * materialization) masked to the same bit widths, matching the
    * reference's own cheap-hash choice (vaex `core/hash.py:55`,
    * `src/hash_primitives.hpp`). Same downstream algebra (universal
    * family, banding, jaccard) either way. */
  sealed trait HashFamily
  case object Md5Hash extends HashFamily
  case object Xx64Hash extends HashFamily

  /** 60-bit non-negative hash of a string column. */
  def portableHash(c: Column, fam: HashFamily = Md5Hash): Column = fam match {
    case Md5Hash  => conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    case Xx64Hash => xxhash64(c).bitwiseAND(lit((1L << 60) - 1))
  }

  /** 28-bit base hash — the input to the universal family. */
  def baseHash(c: Column, fam: HashFamily = Md5Hash): Column = fam match {
    case Md5Hash  => conv(substring(md5(c), 1, 7), 16, 10).cast("long")
    case Xx64Hash => xxhash64(c).bitwiseAND(lit((1L << 28) - 1))
  }

  /** Salted md5 hash family member i (full-strength variant; prefer
    * `universalHash` on the hot path). */
  def saltedHash(i: Int, c: Column): Column =
    portableHash(concat(lit(i.toString), lit(":"), c))

  /** Universal-family constants — deterministic, inlined identically
    * into the DuckDB oracle SQL. p = 2^31-1 (prime); a_i·x stays under
    * 2^59 for 28-bit x, no overflow in either engine. */
  val UHASH_P: Long = 2147483647L
  def uhashA(i: Int): Long = {
    val a = (2654435761L * (i + 1)) % UHASH_P
    if (a == 0L) 1L else a
  }
  def uhashB(i: Int): Long = (1000003L * i + 97L) % UHASH_P

  /** h_i(x) = (a_i·x + b_i) mod p over a base-hash column. */
  def universalHash(i: Int, h: Column): Column =
    (lit(uhashA(i)) * h + lit(uhashB(i))) % lit(UHASH_P)

  // -------------------------------------------------------------- shingles

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** GPT-2-style BPE PRE-tokenization (the regex split every byte-pair
    * tokenizer applies before merges — public pattern from the GPT-2
    * release), minus the trailing-space lookahead RE2 engines can't
    * run, so the SAME pattern executes in Spark (java.util.regex) and
    * the DuckDB oracle (RE2): contraction suffixes, space-prefixed
    * letter/digit/punctuation runs, whitespace runs. Pre-token count
    * is the standard cheap token-budget estimator (~1 BPE merge round
    * away from true token count on English text). */
  val BpePretokenPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Array of BPE pre-tokens of a text column. */
  def bpePretokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePretokenPattern), lit(0))

  /** Pre-token count — the token-budget estimate for a document. */
  def bpePretokenCount(text: Column): Column =
    size(bpePretokens(text)).cast("long")

  /** Distinct word n-gram shingles of a text column (empty array when
    * the doc is shorter than n tokens). One codegen'd loop per row
    * ([[ShingleStrings]]) — bit-identical to the
    * `array_distinct(transform(sequence(...), concat_ws(...)))`
    * formulation it replaces (TextKernelExpressionsSpec pins it). */
  def shingles(text: Column, n: Int): Column =
    coalesce( // null text -> empty array, like the when/otherwise it replaces
      org.apache.spark.sql.graftbridge.Bridge.column(
        ShingleStrings(
          org.apache.spark.sql.graftbridge.Bridge.expression(tokens(text)), n)),
      array().cast("array<string>"))

  /** Distinct 28-bit hashes of a shingle array — the compact set
    * representation every downstream dedup op works on (signatures,
    * jaccard verification). Shuffling/holding ints instead of shingle
    * strings is the 100 TB design: candidate joins never carry text.
    * Codegen'd ([[HashStrings]]), bit-identical to
    * `array_distinct(transform(shingleArr, baseHash))`. */
  def shingleHashes(shingleArr: Column, fam: HashFamily = Md5Hash): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      HashStrings(
        org.apache.spark.sql.graftbridge.Bridge.expression(shingleArr),
        fam == Md5Hash, bits = 28, uA = -1L, uB = 0L, distinct = true))

  /** Tokenize a pretoken array with a LEARNED BPE merge table — the
    * greedy rank-ordered pair merging of GPT-2's encoder (each
    * pretoken starts as code points; the lowest-rank adjacent pair
    * present merges at every leftmost non-overlapping occurrence
    * until none remains). `merges` is the ordered merge list, rank =
    * position — exactly a parsed merges.txt. One codegen'd loop per
    * row ([[BpeApply]]), table shipped once per task via
    * addReferenceObj; pure projection, zero shuffle at any corpus
    * size. Composes with [[bpePretokens]] for end-to-end tokenization
    * and with the q_bpe_learn lane's learned pairs. */
  def bpeApply(pretokens: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      BpeApply(
        org.apache.spark.sql.graftbridge.Bridge.expression(pretokens), merges))

  /** Every n-token gram string in position order (non-distinct
    * [[ShingleStrings]] — for per-doc repetition scans that need the
    * full multiset). Bit-identical to the transform/concat_ws
    * formulation; null text -> empty. */
  def gramStrings(toks: Column, n: Int): Column =
    coalesce(
      org.apache.spark.sql.graftbridge.Bridge.column(
        ShingleStrings(
          org.apache.spark.sql.graftbridge.Bridge.expression(toks), n,
          distinct = false)),
      array().cast("array<string>"))

  /** `bits`-bit hashes of every string element, in order, with
    * optional Carter-Wegman post-mix — the fused
    * `transform(arr, x -> portableHash/baseHash(x))` shape for hot
    * paths that hash an existing string array without distinct. */
  def hashedGrams(arr: Column, fam: HashFamily, bits: Int = 60): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      HashStrings(
        org.apache.spark.sql.graftbridge.Bridge.expression(arr),
        fam == Md5Hash, bits = bits, uA = -1L, uB = 0L, distinct = false))

  /** Hash of every k-token gram (NON-distinct, position-ordered —
    * winnowing needs the positional hash sequence, unlike
    * [[shingles]]). One codegen'd primitive loop per row
    * ([[TokenGramHashes]]); bit-identical to
    * `transform(sequence(0, n-k), i -> portableHash(concat_ws(" ", slice(toks, i+1, k))))`. */
  def tokenGramHashes(toks: Column, k: Int, fam: HashFamily = Md5Hash): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      TokenGramHashes(
        org.apache.spark.sql.graftbridge.Bridge.expression(toks), k,
        fam == Md5Hash))

  /** Sliding-window minimum over a bigint array — the winnowing
    * window-select step as one O(n) codegen'd deque pass
    * ([[SlidingMin]]). */
  def slidingWindowMin(arr: Column, w: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      SlidingMin(org.apache.spark.sql.graftbridge.Bridge.expression(arr), w))

  /** MinHash signature over a pre-hashed shingle set: array of k
    * minima of universal-hash images. Empty set -> -1 sentinel.
    * Codegen'd one-pass kernel ([[MinhashSig]]), bit-identical to the
    * k-transform formulation (null input -> all -1, matching
    * `coalesce(array_min(transform(null, ...)), -1)`). */
  def minhashSignature(hashArr: Column, k: Int): Column =
    coalesce(
      org.apache.spark.sql.graftbridge.Bridge.column(
        MinhashSig(
          org.apache.spark.sql.graftbridge.Bridge.expression(hashArr),
          (0 until k).map(uhashA).toArray, (0 until k).map(uhashB).toArray)),
      array((0 until k).map(_ => lit(-1L)): _*))

  /** LSH band keys: hash each band of `rowsPerBand` consecutive
    * signature entries into one bucket key. Docs sharing any band key
    * become candidate pairs. Returns array of (bandIdx, bandKey)
    * structs ready to explode. */
  def lshBandKeys(signature: Column, k: Int, rowsPerBand: Int,
                  fam: HashFamily = Md5Hash): Column = {
    val nBands = k / rowsPerBand
    array((0 until nBands).map { b =>
      val parts = (0 until rowsPerBand).map { r =>
        element_at(signature, b * rowsPerBand + r + 1).cast("string")
      }
      struct(lit(b).as("band"),
        portableHash(concat_ws("_", parts: _*), fam).as("bkey"))
    }: _*)
  }

  /** Jaccard similarity of two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0.0, lit(0.0)).otherwise(inter / union)
  }

  /** Per-token universal hashes (multiset — SimHash weights repeats).
    * Codegen'd ([[HashStrings]] with the Carter-Wegman post-mix),
    * bit-identical to `transform(toks, t -> universalHash(family, baseHash(t)))`. */
  def tokenHashes(toks: Column, family: Int = 99,
                  fam: HashFamily = Md5Hash): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      HashStrings(
        org.apache.spark.sql.graftbridge.Bridge.expression(toks),
        fam == Md5Hash, bits = 28,
        uA = uhashA(family), uB = uhashB(family), distinct = false))

  /** nBits-bit SimHash over a pre-hashed token array: bit j is set when
    * more than half the token hashes have bit j set. One codegen'd
    * counting pass ([[SimhashBits]]), bit-identical to the
    * filter-per-bit formulation (null array -> 0, matching the
    * null-condition `when` fallthrough it replaces). */
  def simhashFromHashes(hashArr: Column, nBits: Int): Column =
    coalesce(
      org.apache.spark.sql.graftbridge.Bridge.column(
        SimhashBits(
          org.apache.spark.sql.graftbridge.Bridge.expression(hashArr), nBits)),
      lit(0L))

  /** Hamming distance between two long-encoded SimHash values (used by
    * near-dup thresholding). bit_count is codegen'd. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")

  // -------------------------------------------------------------- PII scrub

  /** PII detection/redaction patterns — the scrub pass every training
    * pipeline runs before a corpus ships. Deliberately lookaround-free
    * so the IDENTICAL pattern executes in Spark (java.util.regex) and
    * RE2-based engines (the DuckDB oracle): emails, NANP-style dashed
    * phone numbers, dotted-quad IPv4 addresses. */
  val PiiEmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiPhonePattern: String = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val PiiIpPattern: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Ordered (pattern, tag) scrub list — email first (its local part
    * can contain digit runs a later pattern might clip), then phone,
    * then IP. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    PiiEmailPattern -> "<EMAIL>",
    PiiPhonePattern -> "<PHONE>",
    PiiIpPattern -> "<IP>")

  /** Redact every PII occurrence (pure projection — zero shuffle). */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (p, tag)) =>
      regexp_replace(c, p, tag)
    }

  /** Count matches of one PII pattern. */
  def piiCount(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern)).cast("long")

  // ------------------------------------------------- repetition (Gopher-style)

  /** Code-point Shannon entropy + counts of a text column in ONE
    * codegen'd pass ([[CharEntropy]]):
    * struct(n_chars, n_distinct_chars, entropy) where entropy is the
    * dsumD-equivalent decimal-exact sum of `-(k/n)*log2(k/n)` terms.
    * Zero shuffle — the explode/groupBy formulation (the DuckDB
    * oracle) moves every character of the corpus. */
  def charEntropy(text: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      CharEntropy(org.apache.spark.sql.graftbridge.Bridge.expression(text)))

  /** Unicode NFC canonicalization ([[NfcNormalize]] kernel — matches
    * DuckDB's utf8proc nfc_normalize; isNormalized fast path). */
  def nfcNormalize(text: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      NfcNormalize(org.apache.spark.sql.graftbridge.Bridge.expression(text)))

  /** DEFLATE-compressed byte count ([[DeflateLen]] kernel) — the
    * compression-ratio quality signal's numerator. */
  def deflateLen(text: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      DeflateLen(org.apache.spark.sql.graftbridge.Bridge.expression(text)))

  /** Single-layer ftfy-style mojibake repair ([[MojibakeRepair]]
    * kernel): latin-1-range strings whose bytes strictly decode as
    * UTF-8 are re-decoded; everything else passes through untouched. */
  def mojibakeRepair(text: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      MojibakeRepair(org.apache.spark.sql.graftbridge.Bridge.expression(text)))

  /** The post-repair cleanup chain — ONE definition shared by
    * q_text_clean and VxFrame.textClean so the facade can never drift
    * from the oracle-gated pipeline: control-char strip (keeps
    * tab/newline/formfeed/CR for the collapse), NBSP/zero-width-space
    * normalization, whitespace collapse + trim. */
  def textCleanFromRepaired(repaired: Column): Column = {
    val noCtl = regexp_replace(repaired, "[\\x00-\\x08\\x0B\\x0E-\\x1F\\x7F]", "")
    val spaced = translate(noCtl, "\u00A0\u200B", "  ")
    trim(regexp_replace(spaced, "\\s+", " "))
  }

  /** Full ftfy-style cleanup: repair + [[textCleanFromRepaired]]. */
  def textCleanCol(text: Column): Column =
    textCleanFromRepaired(mojibakeRepair(text))

  /** Quality-classifier defaults — ONE definition shared by
    * q_quality_classifier's lane/oracle and VxFrame.qualityScore. */
  val ClassifierBuckets: Int = 4096
  def classifierA: Long = uhashA(7)
  def classifierB: Long = uhashB(7)

  /** The classifier's whole per-doc pipeline as one staged struct:
    * distinct unigram+bigram features -> md5-60 hashes -> ONE
    * [[FeatureWeightSum]] pass. Materialize it in its own projection
    * and read fields from it. */
  def classifierScoreStruct(text: Column,
      nBuckets: Int = ClassifierBuckets): Column = {
    val toks = tokens(text)
    val feats = array_distinct(concat(toks, gramStrings(toks, 2)))
    featureWeightSum(hashedGrams(feats, Md5Hash, 60),
      nBuckets, classifierA, classifierB)
  }

  /** Luhn mod-10 checksum validity of a digit string ([[LuhnValid]]
    * kernel) — the credit-card-candidate verifier behind checksum-
    * validated PII scrubbing. */
  def luhnValid(digits: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      LuhnValid(org.apache.spark.sql.graftbridge.Bridge.expression(digits)))

  /** Hashed-feature linear scoring in ONE codegen'd pass
    * ([[FeatureWeightSum]] kernel): struct(n_feats, wsum_milli) where
    * each non-null feature hash contributes the integer milli-weight
    * `((a*(h mod nBuckets) + b) mod p) mod 2001 - 1000`. Stage the
    * struct in its own projection (the CollapseProject rule). */
  def featureWeightSum(hashes: Column, nBuckets: Int, a: Long, b: Long): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      FeatureWeightSum(
        org.apache.spark.sql.graftbridge.Bridge.expression(hashes),
        nBuckets, a, b))

  /** The interpreted Column formulation [[featureWeightSum]] is pinned
    * bit-identical to (the kernel-parity reference + the A/B "old"
    * lane): filter nulls, bucket each hash, milli-weight it, integer-
    * sum via `aggregate`. */
  def featureWeightSumCols(hashes: Column, nBuckets: Int, a: Long, b: Long): Column = {
    val nn = filter(hashes, h => h.isNotNull)
    val ws = transform(nn, h =>
      (lit(a) * pmod(h, lit(nBuckets.toLong)) + lit(b)) % lit(UHASH_P) % lit(2001L) - lit(1000L))
    // null array -> null STRUCT (the kernel's nullSafeEval contract),
    // not a struct of nulls
    when(hashes.isNotNull, struct(
      size(nn).cast("long").as("n_feats"),
      aggregate(ws, lit(0L), (acc, w) => acc + w).as("wsum_milli")))
  }

  /** All three Gopher repetition signals of a SORTED string array in
    * ONE codegen'd pass ([[SortedRunStats]]):
    * struct(max_run = [[maxRunLength]], max_cover = [[maxRunCover]],
    * dup_cnt = [[dupElementCount]]). Stage the struct in its own
    * projection and read fields from it — inlining it three times
    * re-runs the pass. */
  def sortedRunStats(sorted: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      SortedRunStats(
        org.apache.spark.sql.graftbridge.Bridge.expression(sorted)))

  /** Longest run in a SORTED string array = the max multiplicity of
    * any element — one linear `aggregate` pass per row, shuffle-free
    * (the per-doc repetition signals must not explode/shuffle n-grams
    * at 100 TB when no cross-doc grouping is needed). Null-string
    * initial sentinel: `x === null` is null, so the first element
    * always starts a fresh run (an empty-string element would falsely
    * extend an "" sentinel). */
  def maxRunLength(sorted: Column): Column =
    aggregate(sorted,
      struct(lit(null).cast("string").as("p"), lit(0L).as("r"), lit(0L).as("b")),
      (st, x) => {
        val run = when(x === st.getField("p"), st.getField("r") + 1L).otherwise(lit(1L))
        struct(x.as("p"), run.as("r"), greatest(st.getField("b"), run).as("b"))
      },
      st => st.getField("b"))

  /** Max over elements of multiplicity·LENGTH(element) in a SORTED
    * array — the character coverage of the most repeated element
    * (Gopher's "fraction of characters in the most common n-gram"
    * numerator). A run of total length c over element x passes through
    * run'·len(x) = c·len(x) at its last step, so the running max
    * equals MAX(count·length) over distinct elements. */
  def maxRunCover(sorted: Column): Column =
    aggregate(sorted,
      struct(lit(null).cast("string").as("p"), lit(0L).as("r"), lit(0L).as("b")),
      (st, x) => {
        val run = when(x === st.getField("p"), st.getField("r") + 1L).otherwise(lit(1L))
        struct(x.as("p"), run.as("r"),
          greatest(st.getField("b"), run * length(x).cast("long")).as("b"))
      },
      st => st.getField("b"))

  /** Number of elements (counting every copy) whose value occurs more
    * than once, via sorted-neighbor adjacency — O(n log n) sort +
    * O(n) scan per row, no shuffle. `when`-guarded neighbor access
    * keeps element_at in bounds under ANSI mode. */
  def dupElementCount(sorted: Column): Column = {
    val n = size(sorted)
    when(n >= 1,
      size(filter(sequence(lit(1), n), i =>
        (element_at(sorted, i) === when(i < n, element_at(sorted, i + 1))) ||
          (element_at(sorted, i) === when(i > 1, element_at(sorted, i - 1))))).cast("long"))
      .otherwise(lit(0L))
  }

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

  /** REAL stopword profiles — top function words of each language
    * (public frequency lists), replacing the synthetic corpus's toy
    * marker sets for actual text. Function words are the standard
    * cheap language-ID signal: high-frequency, topic-independent. */
  val stopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was",
      "for", "on", "with", "as", "at", "by", "this", "have", "from"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit",
      "von", "auf", "den", "dem", "sich", "ich", "auch", "eine", "werden", "sind"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une", "dans", "que",
      "pour", "qui", "sur", "pas", "au", "ce", "il", "sont", "nous"),
    "es" -> Seq("el", "los", "las", "que", "de", "en", "un", "una", "es",
      "por", "con", "para", "del", "se", "su", "como", "más", "pero"))

  /** Language-ID over real text: lowercase+tokenize upstream, score by
    * distinct stopword hits, 'und' (undetermined) when nothing matches
    * (the toy-marker variant keeps its always-pick-max behavior for the
    * synthetic-corpus oracle). */
  def langIdPredictReal(toksDistinct: Column,
                        profiles: Seq[(String, Seq[String])] = stopwordProfiles): Column = {
    val scores = profiles.map { case (_, ws) => langIdScore(toksDistinct, ws) }
    when(greatest(scores: _*) === 0L, lit("und"))
      .otherwise(langIdPredict(toksDistinct, profiles))
  }
}
