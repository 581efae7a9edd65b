package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Codegen kernels for the per-document text-dedup hot path (round-11
  * follow-up to the winnowing kernels — see WinnowExpressions.scala).
  *
  * The Column-composed formulations in [[TextFunctions]] pay one
  * interpreted higher-order lambda per element per row (`transform`,
  * `filter`, `aggregate` do not participate in whole-stage codegen;
  * every element evaluates a boxed expression tree). At sf0.1 the
  * winnowing lane measured 27.5s interpreted vs 0.26s as a kernel —
  * the same tax applies to shingling, shingle hashing, MinHash
  * signatures and SimHash bit-voting, which sit under EVERY dedup /
  * decontamination query. Each kernel below is a drop-in for its
  * formulation, bit-identical by property spec
  * (TextKernelExpressionsSpec), so the DuckDB oracles are unchanged.
  *
  * Reference capability class: vaex's C++ string kernels
  * (packages/vaex-core/src/strings.cpp) — the same "tight loop over
  * one document's tokens, no per-element dispatch" design, here as
  * Catalyst expressions inside WholeStageCodegen.
  */
object TextKernels {

  final val UHASH_P = 2147483647L
  private final val NoUhash = -1L

  private def mask(bits: Int): Long = (1L << bits) - 1

  /** First `bits` bits of md5 as a long — `bits` must be a multiple of
    * 4 (hex-digit parity with `conv(substring(md5(s),1,bits/4),16,10)`).
    * 60 bits = first 15 hex digits = big-endian first 8 bytes >>> 4;
    * 28 bits = first 7 hex digits = big-endian first 4 bytes >>> 4.
    * Shared with WinnowKernels — the md5-prefix parity rules live in
    * ONE place. */
  private[functions] def md5Bits(buf: Array[Byte], off: Int, len: Int, bits: Int): Long = {
    val d = TextKernels.md5Local.get()
    d.reset()
    d.update(buf, off, len)
    val h = d.digest()
    // read bits/4 hex digits: assemble the covering bytes big-endian,
    // then shift off the excess low nibble when the digit count is odd
    val nibbles = bits / 4
    val covering = (nibbles + 1) / 2
    var v = 0L
    var i = 0
    while (i < covering) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    if (nibbles % 2 == 1) v = v >>> 4
    v
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** JVM-side twin of `TextFunctions.baseHash` (md5 family) for
    * driver/executor Scala code that cannot run a Column — the
    * stateful streaming sketch ops. Bit-identical to
    * `conv(substring(md5(s),1,7),16,10)` (spec-pinned). */
  def md5Base28(s: String): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    md5Bits(b, 0, b.length, 28)
  }

  /** Reusable gram-assembly buffer (one per kernel call). */
  private[functions] final class GramBuf {
    var buf: Array[Byte] = new Array[Byte](256)
    var len: Int = 0
  }

  /** Assemble tokens `[start, start+k)` joined with a single space
    * into `gb` — the ONE definition of the concat_ws parity rules
    * (null tokens skipped, no separator emitted for them) that both
    * [[shingleStrings]] and [[WinnowKernels.gramHashes]] rely on. */
  private[functions] def assembleGram(ts: Array[UTF8String], start: Int,
      k: Int, gb: GramBuf): Unit = {
    gb.len = 0
    var wrote = false
    var j = 0
    while (j < k) {
      val t = ts(start + j)
      if (t != null) {
        val tb = t.numBytes()
        val need = gb.len + tb + 1
        if (need > gb.buf.length)
          gb.buf = java.util.Arrays.copyOf(gb.buf, math.max(need, gb.buf.length * 2))
        if (wrote) { gb.buf(gb.len) = ' '; gb.len += 1 }
        t.writeToMemory(gb.buf, Platform.BYTE_ARRAY_OFFSET + gb.len)
        gb.len += tb
        wrote = true
      }
      j += 1
    }
  }

  private def hashUtf8(s: UTF8String, md5: Boolean, bits: Int): Long =
    if (md5) {
      val b = s.getBytes
      md5Bits(b, 0, b.length, bits)
    } else {
      XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L) &
        mask(bits)
    }

  /** N-token gram strings: every gram in position order, or (with
    * `distinct`) first-occurrence-distinct — bit-identical to
    * `transform(sequence(0, size(toks)-n), i -> concat_ws(" ", toks[i..i+n-1]))`
    * with/without the surrounding array_distinct (null tokens skipped
    * like concat_ws). Empty when fewer than n tokens. */
  def shingleStrings(toks: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val cnt = toks.numElements()
    val m = cnt - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val ts = new Array[UTF8String](cnt)
    var i = 0
    while (i < cnt) {
      ts(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      i += 1
    }
    val gb = new GramBuf
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val all = if (distinct) null else new Array[Any](m)
    var g = 0
    while (g < m) {
      assembleGram(ts, g, n, gb)
      val gram = UTF8String.fromBytes(java.util.Arrays.copyOfRange(gb.buf, 0, gb.len))
      if (distinct) seen.add(gram) else all(g) = gram
      g += 1
    }
    if (!distinct) return new GenericArrayData(all)
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** Separator for the BPE rank-map keys: symbols are code-point
    * sequences from real text plus concatenations thereof, and NUL is
    * rejected at table build, so `a NUL b` is collision-free. */
  private final val BpeSep = '\u0000'

  /** Build the rank lookup for [[bpeApply]] from an ordered merge
    * list (rank = position, the merges.txt convention). */
  private[functions] def bpeRanks(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), r) =>
      require(a.nonEmpty && b.nonEmpty, s"bpe_apply: empty merge symbol at rank $r")
      require(a.indexOf(BpeSep) < 0 && b.indexOf(BpeSep) < 0,
        s"bpe_apply: merge symbols must not contain NUL (rank $r)")
      val prev = m.putIfAbsent(a + BpeSep + b, Integer.valueOf(r))
      require(prev == null, s"bpe_apply: duplicate merge pair ('$a','$b') at rank $r")
    }
    m
  }

  /** Greedy rank-ordered BPE application (the GPT-2 `bpe()` algorithm,
    * openai/gpt-2 src/encoder.py): each pretoken starts as its
    * code-point sequence; repeatedly the LOWEST-RANK adjacent symbol
    * pair present in the word is merged at every leftmost
    * non-overlapping occurrence (the merged symbol is the pair's
    * concatenation), until no adjacent pair is in the table. Output:
    * the final symbols of every pretoken, concatenated in order.
    * Null pretokens are skipped (concat_ws discipline). This is
    * deliberately NOT a rank-sequential replace loop — a lower-rank
    * pair whose symbols only come into existence through a
    * higher-rank merge must still fire (BpeApplySpec pins the
    * divergence case). */
  def bpeApply(toks: ArrayData, ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val cnt = toks.numElements()
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < cnt) {
      if (!toks.isNullAt(i)) {
        val s = toks.getUTF8String(i).toString
        // initial symbols: one per code point
        var word = new Array[String](s.codePointCount(0, s.length))
        var ci = 0
        var w = 0
        while (ci < s.length) {
          val cp = s.codePointAt(ci)
          val cl = Character.charCount(cp)
          word(w) = s.substring(ci, ci + cl)
          ci += cl
          w += 1
        }
        var done = word.length < 2
        while (!done) {
          // lowest-rank adjacent pair present in the word
          var bestRank = Int.MaxValue
          var bestA: String = null
          var bestB: String = null
          var j = 0
          while (j < word.length - 1) {
            val r = ranks.get(word(j) + BpeSep + word(j + 1))
            if (r != null && r.intValue() < bestRank) {
              bestRank = r.intValue(); bestA = word(j); bestB = word(j + 1)
            }
            j += 1
          }
          if (bestA == null) done = true
          else {
            // merge every leftmost non-overlapping occurrence
            val nw = new java.util.ArrayList[String](word.length)
            var p = 0
            while (p < word.length) {
              if (p < word.length - 1 && word(p) == bestA && word(p + 1) == bestB) {
                nw.add(bestA + bestB); p += 2
              } else { nw.add(word(p)); p += 1 }
            }
            word = nw.toArray(new Array[String](nw.size()))
            if (word.length == 1) done = true
          }
        }
        var o = 0
        while (o < word.length) { out.add(UTF8String.fromString(word(o))); o += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Hash every string element: `bits`-bit md5-prefix or masked
    * xxhash64, optionally post-mixed through the Carter-Wegman family
    * `(uA*h + uB) mod p` (pass uA = -1 to skip), optionally
    * first-occurrence-distinct. Null elements stay null (transform
    * semantics); under `distinct` one null survives like
    * array_distinct. */
  def hashStrings(arr: ArrayData, md5: Boolean, bits: Int,
      uA: Long, uB: Long, distinct: Boolean): ArrayData = {
    val n = arr.numElements()
    val vals = new Array[Long](n)
    val nulls = new Array[Boolean](n)
    var hasNull = false
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) { nulls(i) = true; hasNull = true }
      else {
        var v = hashUtf8(arr.getUTF8String(i), md5, bits)
        if (uA != NoUhash) v = (uA * v + uB) % UHASH_P
        vals(i) = v
      }
      i += 1
    }
    if (!distinct) {
      if (!hasNull) return new GenericArrayData(vals)
      val out = new Array[Any](n)
      i = 0
      while (i < n) { out(i) = if (nulls(i)) null else vals(i); i += 1 }
      return new GenericArrayData(out)
    }
    // first-occurrence distinct via open-addressing (values >= 0; -1 = empty)
    var cap = java.lang.Integer.highestOneBit(math.max(n * 2 - 1, 4)) << 1
    if (cap < 4) cap = 4
    val table = new Array[Long](cap)
    java.util.Arrays.fill(table, -1L)
    val order = new Array[Long](n)
    var k = 0
    var keptNull = false
    var outHasNull = false
    i = 0
    while (i < n) {
      if (nulls(i)) {
        if (!keptNull) { keptNull = true; outHasNull = true; order(k) = -1L; k += 1 }
      } else {
        val v = vals(i)
        var slot = (java.lang.Long.hashCode(v) & (cap - 1))
        var dup = false
        var done = false
        while (!done) {
          val cur = table(slot)
          if (cur == -1L) { table(slot) = v; done = true }
          else if (cur == v) { dup = true; done = true }
          else slot = (slot + 1) & (cap - 1)
        }
        if (!dup) { order(k) = v; k += 1 }
      }
      i += 1
    }
    if (!outHasNull) new GenericArrayData(java.util.Arrays.copyOf(order, k))
    else {
      val out = new Array[Any](k)
      i = 0
      while (i < k) { out(i) = if (order(i) == -1L) null else order(i); i += 1 }
      new GenericArrayData(out)
    }
  }

  /** One pass over a SORTED string array: (max element multiplicity,
    * max multiplicity*char-length, count of elements in runs >= 2) —
    * the three Gopher repetition signals
    * ([[TextFunctions.maxRunLength]]/[[TextFunctions.maxRunCover]]/
    * [[TextFunctions.dupElementCount]]) without three interpreted
    * `aggregate`/`filter` lambdas. Null elements never equal anything
    * (SQL null comparison semantics): they reset runs, contribute no
    * cover, and are never counted duplicate. */
  def sortedRunStats(arr: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = arr.numElements()
    var maxRun = 0L
    var maxCover = 0L
    var dupCnt = 0L
    var prev: UTF8String = null
    var run = 0L
    var i = 0
    while (i <= n) {
      val cur: UTF8String =
        if (i == n || arr.isNullAt(i)) null else arr.getUTF8String(i)
      if (i > 0 && prev != null && cur != null && prev.equals(cur)) run += 1
      else {
        if (prev != null && run >= 2) dupCnt += run
        run = 1
      }
      if (i < n) {
        // a null element still counts a run of 1 (the old aggregate's
        // otherwise(1) branch) but contributes no cover
        if (run > maxRun) maxRun = run
        if (cur != null) {
          val cover = run * cur.numChars()
          if (cover > maxCover) maxCover = cover
        }
      }
      prev = cur
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](maxRun, maxCover, dupCnt))
  }

  /** Shannon entropy over a text's code-point distribution — the
    * classic gibberish/quality signal — plus code-point and
    * distinct-code-point counts, one pass per row, zero shuffle (the
    * 100 TB shape; the explode/groupBy formulation shuffles every
    * character of the corpus).
    *
    * Cross-engine float discipline: each distinct char's term
    * `-(k/n)*log2(k/n)` is rounded to DECIMAL(38,10) exactly like
    * `dsumD` does (HALF_UP at 10 digits), accumulated as exact scaled
    * longs (order-free), and returned as the decimal sum cast to
    * double — the same algebra as
    * `CAST(SUM(CAST(term AS DECIMAL(38,10))) AS DOUBLE)` over a
    * DuckDB char histogram. log2 matches Spark's own Log2
    * (StrictMath.log ratio — pinned bitwise in the spec). */
  def charEntropy(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = text.toString
    val n = s.codePointCount(0, s.length)
    if (n == 0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0L, 0L, 0.0))
    val cps = new Array[Int](n)
    var i = 0
    var o = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cps(o) = cp
      o += 1
      i += Character.charCount(cp)
    }
    java.util.Arrays.sort(cps)
    val nD = n.toDouble
    var sumScaled = 0L
    var distinct = 0L
    var start = 0
    while (start < n) {
      var end = start + 1
      while (end < n && cps(end) == cps(start)) end += 1
      val p = (end - start).toDouble / nD
      val term = -p * (StrictMath.log(p) / StrictMath.log(2.0))
      // CAST(term AS DECIMAL(38,10)) = HALF_UP at 10 digits; term is
      // in [0, ~0.531], so the scaled value fits a long with huge room
      sumScaled += java.math.BigDecimal.valueOf(term)
        .setScale(10, java.math.RoundingMode.HALF_UP).unscaledValue().longValueExact()
      distinct += 1
      start = end
    }
    val entropy = java.math.BigDecimal.valueOf(sumScaled, 10).doubleValue()
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, distinct, entropy))
  }

  /** Unicode NFC normalization (java.text.Normalizer — the same
    * Unicode-standard composition DuckDB's nfc_normalize/utf8proc
    * implements): the canonicalization pass a multilingual corpus
    * runs before hashing/dedup so that "é" and "e"+U+0301 fingerprint
    * identically. */
  def nfcNormalize(text: UTF8String): UTF8String = {
    val s = text.toString
    // fast path: Normalizer.isNormalized is a cheap scan; ASCII and
    // already-NFC text (the overwhelming majority) copies nothing
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  private val deflaterLocal = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6)
  }

  /** DEFLATE-compressed size of the text's UTF-8 bytes (zlib level 6,
    * one reused Deflater per thread) — the compression-ratio quality
    * signal (highly compressible = boilerplate/repetition soup;
    * incompressible = random bytes), deterministic for a fixed zlib.
    * Not SQL-expressible, so its query lane is rows-only-checked; the
    * spec pins monotonicity and known-plaintext golden values. */
  def deflateLen(text: UTF8String): Long = {
    val d = deflaterLocal.get()
    d.reset()
    val in = text.getBytes
    d.setInput(in)
    d.finish()
    val buf = new Array[Byte](1024)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** MinHash signature: k minima of `(a_i*h + b_i) mod p` over the
    * hash array, -1 sentinel for empty/all-null input — bit-identical
    * to `array(i -> coalesce(array_min(transform(hs, h -> uhash_i(h))), -1))`. */
  def minhashSig(arr: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val k = a.length
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = arr.numElements()
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val h = arr.getLong(i)
        var j = 0
        while (j < k) {
          val v = (a(j) * h + b(j)) % UHASH_P
          if (v < out(j)) out(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) java.util.Arrays.fill(out, -1L)
    new GenericArrayData(out)
  }

  /** SimHash bit-vote: bit j of the result is set when more than half
    * the array's elements (nulls counted in the denominator, skipped
    * in the vote — filter semantics) have bit j set. Bit-identical to
    * the `filter`-per-bit formulation. */
  def simhashBits(arr: ArrayData, nBits: Int): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](nBits)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var j = 0
        while (j < nBits) {
          if (((h >> j) & 1L) == 1L) counts(j) += 1
          j += 1
        }
      }
      i += 1
    }
    var v = 0L
    var j = 0
    while (j < nBits) {
      if (2L * counts(j) > n) v |= (1L << j)
      j += 1
    }
    v
  }

  /** ftfy-style mojibake repair (single pass): when every code point
    * of the string fits in latin-1 ([0, 0xFF]) and reinterpreting
    * those bytes as UTF-8 decodes STRICTLY (no malformed sequences)
    * to a shorter string, the text was UTF-8 double-read through a
    * one-byte charset — return the re-decoded original. Otherwise the
    * string is returned untouched: genuine non-latin-1 text (any code
    * point > 0xFF) is never "repaired", and legitimate latin-1 text
    * (a lone 0xE9 "é") fails the strict UTF-8 decode and survives.
    * Single-layer only (ftfy loops for double-mojibake; one layer is
    * the overwhelmingly common corpus case).
    *
    * Reference capability class: vaex cleans crawl text through
    * pandas/python str pipelines (packages/vaex-core/vaex/functions.py
    * str_* surface); the repair itself follows the public ftfy
    * "decode latin-1 bytes as utf-8 if plausible" rule. */
  def mojibakeRepair(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    var anyHigh = false
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (c > 0xFF) return s
      if (c >= 0x80) anyHigh = true
      i += 1
    }
    if (!anyHigh) return s
    val bytes = new Array[Byte](n)
    i = 0
    while (i < n) { bytes(i) = str.charAt(i).toByte; i += 1 }
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
    try {
      val out = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      // a valid decode with any multi-byte sequence is strictly
      // shorter; equal length means pure ASCII (impossible here since
      // anyHigh) — guard anyway
      if (out.length < n) UTF8String.fromString(out) else s
    } catch { case _: java.nio.charset.CharacterCodingException => s }
  }

  /** Luhn checksum validation (ISO/IEC 7812 mod-10) over a digit
    * string: from the rightmost digit, double every second digit and
    * subtract 9 when the double exceeds 9; valid iff the sum is a
    * multiple of 10. Strings shorter than 2 chars or containing any
    * non-digit are invalid (false), matching the "candidate came from
    * a \\d+ regex" contract without trusting it. */
  def luhnValid(s: UTF8String): Boolean = {
    val str = s.toString
    val n = str.length
    if (n < 2) return false
    var sum = 0
    var i = n - 1
    var second = false
    while (i >= 0) {
      val c = str.charAt(i)
      if (c < '0' || c > '9') return false
      var d = c - '0'
      if (second) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      second = !second
      i -= 1
    }
    sum % 10 == 0
  }

  /** Hashed-feature linear-model scoring (the fastText-style quality
    * classifier's hot loop): for every non-null feature hash h
    * (non-negative, e.g. a 60-bit md5 prefix), bucket = h mod
    * nBuckets, integer milli-weight w = ((a*bucket + b) mod p) mod
    * 2001 - 1000 in [-1000, 1000], returning
    * struct(n_feats, wsum_milli) in one pass. Integer accumulation is
    * order-free, so the score is bit-identical across any engine —
    * the cross-engine float-sum trap never arises. Bit-identical to
    * the interpreted `filter` + `transform` + `aggregate` Column
    * formulation ([[TextFunctions.featureWeightSumCols]]). */
  def featureWeightSum(arr: ArrayData, nBuckets: Int, a: Long,
      b: Long): org.apache.spark.sql.catalyst.InternalRow = {
    val n = arr.numElements()
    var cnt = 0L
    var i = 0
    var sum = 0L
    while (i < n) {
      if (!arr.isNullAt(i)) {
        // floorMod = Spark's pmod: a negative hash (the SQL surface
        // accepts any bigint, e.g. raw xxhash64) must land in the same
        // non-negative bucket the Column formulation computes
        val bucket = java.lang.Math.floorMod(arr.getLong(i), nBuckets.toLong)
        sum += ((a * bucket + b) % UHASH_P) % 2001L - 1000L
        cnt += 1L
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](cnt, sum))
  }
}

/** `array<string> -> array<string>`: n-token shingles, distinct or
  * position-ordered ([[TextKernels.shingleStrings]]). */
case class ShingleStrings(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_strings"
  override def nullSafeEval(a: Any): Any =
    TextKernels.shingleStrings(a.asInstanceOf[ArrayData], n, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.shingleStrings($a, $n, $distinct);")
  override protected def withNewChildInternal(c: Expression): ShingleStrings =
    copy(child = c)
}

/** `array<string> -> array<bigint>`: per-element hash with optional
  * universal post-mix and distinct ([[TextKernels.hashStrings]]). */
case class HashStrings(child: Expression, md5Family: Boolean, bits: Int,
    uA: Long, uB: Long, distinct: Boolean) extends UnaryExpression {
  require(bits > 0 && bits <= 60 && bits % 4 == 0,
    s"bits must be a positive multiple of 4 <= 60, got $bits")
  // the post-mix domain must keep values non-negative: uA·v with
  // v < 2^bits must not overflow Long, and (uA·v+uB) mod p must stay
  // in [0, p) — otherwise a mixed hash of exactly -1 would collide
  // with the distinct table's empty-slot sentinel (and Java % of a
  // negative product is negative). Internal callers use bits=28 with
  // Carter-Wegman coefficients; the SQL surface can pass anything.
  require(uA == -1L || (bits <= 28 && uA >= 1L && uA < TextKernels.UHASH_P &&
      uB >= 0L && uB < TextKernels.UHASH_P),
    s"post-mix requires bits <= 28 and coefficients in [1,p)/[0,p), got bits=$bits uA=$uA uB=$uB")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = child.dataType match {
    case ArrayType(_, containsNull) => ArrayType(LongType, containsNull)
    case _ => ArrayType(LongType, containsNull = true)
  }
  override def prettyName: String = "hash_strings"
  override def nullSafeEval(a: Any): Any =
    TextKernels.hashStrings(a.asInstanceOf[ArrayData], md5Family, bits, uA, uB, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.hashStrings($a, $md5Family, $bits, ${uA}L, ${uB}L, $distinct);")
  override protected def withNewChildInternal(c: Expression): HashStrings =
    copy(child = c)
}

/** `array<string> -> array<string>`: learned-vocabulary BPE
  * tokenization — greedy rank-ordered pair merging (the GPT-2
  * algorithm) over each pretoken, merge table carried via
  * `addReferenceObj` ([[TextKernels.bpeApply]]). `merges` is the
  * ordered merge list (rank = position). Null pretokens are skipped;
  * a null input array stays null. */
case class BpeApply(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  // Cheap per-pair validation runs at construction (fails at user
  // call time), but the rank HashMap build stays LAZY: Catalyst
  // copies expressions on every transform during analysis/
  // optimization, and rebuilding a production-sized table (50k GPT-2
  // merges) per copy would cost O(rules x merges) driver work. The
  // lazy build (which also catches duplicate pairs) still runs
  // driver-side before any job — at codegen or first eval.
  require(merges.nonEmpty, "bpe_apply: merge table must be non-empty")
  merges.zipWithIndex.foreach { case ((a, b), r) =>
    require(a.nonEmpty && b.nonEmpty, s"bpe_apply: empty merge symbol at rank $r")
    require(a.indexOf('\u0000') < 0 && b.indexOf('\u0000') < 0,
      s"bpe_apply: merge symbols must not contain NUL (rank $r)")
  }
  @transient private lazy val table = TextKernels.bpeRanks(merges)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_apply"
  override def nullSafeEval(a: Any): Any =
    TextKernels.bpeApply(a.asInstanceOf[ArrayData], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("bpeRanks", table, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.bpeApply($a, $tRef);")
  }
  override protected def withNewChildInternal(c: Expression): BpeApply =
    copy(child = c)
}

/** `array<bigint> -> array<bigint>` (length k): MinHash signature
  * ([[TextKernels.minhashSig]]). */
case class MinhashSig(child: Expression, a: Array[Long], b: Array[Long])
    extends UnaryExpression {
  require(a.length == b.length && a.nonEmpty, "coefficient arrays must match")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(x: Any): Any =
    TextKernels.minhashSig(x.asInstanceOf[ArrayData], a, b)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", a, "long[]")
    val bRef = ctx.addReferenceObj("mhB", b, "long[]")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TextKernels.minhashSig($x, $aRef, $bRef);")
  }
  override protected def withNewChildInternal(c: Expression): MinhashSig =
    copy(child = c)
}

/** `string -> string`: Unicode NFC normalization
  * ([[TextKernels.nfcNormalize]]). */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override def nullSafeEval(x: Any): Any =
    TextKernels.nfcNormalize(x.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TextKernels.nfcNormalize($x);")
  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

/** `string -> bigint`: DEFLATE-compressed byte count
  * ([[TextKernels.deflateLen]]). */
case class DeflateLen(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_len"
  override def nullSafeEval(x: Any): Any =
    TextKernels.deflateLen(x.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TextKernels.deflateLen($x);")
  override protected def withNewChildInternal(c: Expression): DeflateLen =
    copy(child = c)
}

/** `string -> struct<n_chars,n_distinct_chars,entropy>`: code-point
  * Shannon entropy ([[TextKernels.charEntropy]]). */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct_chars", LongType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))
  override def prettyName: String = "char_entropy"
  override def nullSafeEval(x: Any): Any =
    TextKernels.charEntropy(x.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TextKernels.charEntropy($x);")
  override protected def withNewChildInternal(c: Expression): CharEntropy =
    copy(child = c)
}

/** `array<string> (sorted) -> struct<max_run,max_cover,dup_cnt>`:
  * the Gopher repetition signals in one pass
  * ([[TextKernels.sortedRunStats]]). */
case class SortedRunStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("max_run", LongType, nullable = false),
    StructField("max_cover", LongType, nullable = false),
    StructField("dup_cnt", LongType, nullable = false)))
  override def prettyName: String = "sorted_run_stats"
  override def nullSafeEval(x: Any): Any =
    TextKernels.sortedRunStats(x.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TextKernels.sortedRunStats($x);")
  override protected def withNewChildInternal(c: Expression): SortedRunStats =
    copy(child = c)
}

/** `array<bigint> -> bigint`: SimHash bit-vote
  * ([[TextKernels.simhashBits]]). */
case class SimhashBits(child: Expression, nBits: Int) extends UnaryExpression {
  require(nBits >= 1 && nBits <= 63, s"nBits must be in [1,63], got $nBits")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"
  override def nullSafeEval(x: Any): Any =
    TextKernels.simhashBits(x.asInstanceOf[ArrayData], nBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TextKernels.simhashBits($x, $nBits);")
  override protected def withNewChildInternal(c: Expression): SimhashBits =
    copy(child = c)
}

/** `string -> string`: single-layer ftfy-style mojibake repair
  * ([[TextKernels.mojibakeRepair]]). */
case class MojibakeRepair(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "mojibake_repair"
  override def nullSafeEval(x: Any): Any =
    TextKernels.mojibakeRepair(x.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TextKernels.mojibakeRepair($x);")
  override protected def withNewChildInternal(c: Expression): MojibakeRepair =
    copy(child = c)
}

/** `string -> boolean`: Luhn mod-10 checksum over a digit string
  * ([[TextKernels.luhnValid]]). */
case class LuhnValid(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "luhn_valid"
  override def nullSafeEval(x: Any): Any =
    TextKernels.luhnValid(x.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TextKernels.luhnValid($x);")
  override protected def withNewChildInternal(c: Expression): LuhnValid =
    copy(child = c)
}

/** `array<bigint> -> struct<n_feats,wsum_milli>`: hashed-feature
  * integer weight sum ([[TextKernels.featureWeightSum]]). */
case class FeatureWeightSum(child: Expression, nBuckets: Int, a: Long,
    b: Long) extends UnaryExpression {
  require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
  require(a >= 1L && a < TextKernels.UHASH_P && b >= 0L && b < TextKernels.UHASH_P,
    s"coefficients must lie in [1,p)/[0,p), got a=$a b=$b")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_feats", LongType, nullable = false),
    StructField("wsum_milli", LongType, nullable = false)))
  override def prettyName: String = "feature_weight_sum"
  override def nullSafeEval(x: Any): Any =
    TextKernels.featureWeightSum(x.asInstanceOf[ArrayData], nBuckets, a, b)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TextKernels.featureWeightSum($x, $nBuckets, ${a}L, ${b}L);")
  override protected def withNewChildInternal(c: Expression): FeatureWeightSum =
    copy(child = c)
}
