package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Native Catalyst expressions for winnowing fingerprints (Schleimer,
  * Wilkerson & Aiken 2003 — the MOSS dedup primitive; reference
  * capability class: packages/vaex-core/vaex/functions.py str_*
  * n-gram machinery).
  *
  * The Column-composed formulation
  * (`transform(sequence(...), i -> hash(concat_ws(" ", slice(tokens, i+1, K))))`
  * then `transform(..., i -> array_min(slice(grams, i+1, W)))`) is
  * correct but pays two interpreted higher-order lambdas per row: each
  * K-gram allocates a slice array plus a concat string through boxed
  * lambda evaluation, and each W-window allocates another slice —
  * O(n·K + n·W) allocations per document, all outside whole-stage
  * codegen. These expressions do the same work as two tight primitive
  * loops (one reusable byte buffer for gram assembly; a monotonic-deque
  * O(n) window minimum), measured ~6× on the sf0.1 battery, while
  * producing bit-identical results — the md5 family reproduces
  * `conv(substring(md5(s),1,15),16,10)` (top 60 bits of the digest)
  * and the xxhash64 family Spark's own `xxhash64` seed-42 masked to
  * 60 bits, so the DuckDB oracle is unchanged.
  */
object WinnowKernels {

  /** First 15 hex digits of md5 as a long — bit-identical to
    * `conv(substring(md5(s),1,15),16,10)`; ONE shared implementation
    * ([[TextKernels.md5Bits]]) so the nibble-prefix parity rules
    * cannot drift between the winnowing and shingle lanes. */
  private def md5Hash60(buf: Array[Byte], len: Int): Long =
    TextKernels.md5Bits(buf, 0, len, 60)

  private final val Mask60 = (1L << 60) - 1

  /** All K-token grams of `tokens` joined with a single space, hashed.
    * Empty result when fewer than k tokens. Null tokens are skipped
    * exactly like `concat_ws` (no separator emitted for them). */
  def gramHashes(tokens: ArrayData, k: Int, md5: Boolean): ArrayData = {
    val n = tokens.numElements()
    val m = n - k + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)
      i += 1
    }
    // gram assembly shared with TextKernels.shingleStrings — the
    // concat_ws parity rules live in ONE place
    val gb = new TextKernels.GramBuf
    val out = new Array[Long](m)
    var g = 0
    while (g < m) {
      TextKernels.assembleGram(toks, g, k, gb)
      out(g) =
        if (md5) md5Hash60(gb.buf, gb.len)
        else XXH64.hashUnsafeBytes(gb.buf, Platform.BYTE_ARRAY_OFFSET, gb.len, 42L) & Mask60
      g += 1
    }
    new GenericArrayData(out)
  }

  /** Minimum of each length-`w` sliding window over a bigint array —
    * `when(n > 0, transform(sequence(0, greatest(n-w+1,1)-1), i -> array_min(slice(arr, i+1, w)))).otherwise(array())`
    * as one O(n) monotonic-deque pass. NOTE the n > 0 guard in the
    * equivalence: the bare transform formulation yields `[null]` for
    * an EMPTY input (one window over nothing), while this kernel —
    * like the guarded winnowing query it replaced — yields `[]`.
    * A short array (n < w) yields one window covering everything.
    * Null elements are ignored like `array_min`; an all-null window
    * yields a null element (boxed fallback path — gram hashes never
    * contain nulls, so the hot path stays primitive). */
  def slidingMin(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { hasNull = arr.isNullAt(i); i += 1 }
    if (hasNull) return slidingMinNullable(arr, w)
    val nWin = math.max(n - w + 1, 1)
    val out = new Array[Long](nWin)
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0
    var j = 0
    var win = 0
    while (win < nWin) {
      val e = math.min(win + w - 1, n - 1)
      while (j <= e) {
        val v = arr.getLong(j)
        while (tail > head && arr.getLong(dq(tail - 1)) >= v) tail -= 1
        dq(tail) = j
        tail += 1
        j += 1
      }
      while (dq(head) < win) head += 1
      out(win) = arr.getLong(dq(head))
      win += 1
    }
    new GenericArrayData(out)
  }

  private def slidingMinNullable(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    val nWin = math.max(n - w + 1, 1)
    val out = new Array[Any](nWin)
    var win = 0
    while (win < nWin) {
      val e = math.min(win + w - 1, n - 1)
      var best = Long.MaxValue
      var any = false
      var j = win
      while (j <= e) {
        if (!arr.isNullAt(j)) {
          val v = arr.getLong(j)
          if (!any || v < best) { best = v; any = true }
        }
        j += 1
      }
      out(win) = if (any) best else null
      win += 1
    }
    new GenericArrayData(out)
  }
}

/** `array<string> -> array<bigint>`: hash of every k-token gram (see
  * [[WinnowKernels.gramHashes]]). `md5Family = true` is the DuckDB
  * oracle-parity 60-bit md5 prefix; `false` is production xxhash64
  * (seed 42, masked to 60 bits). */
case class TokenGramHashes(child: Expression, k: Int, md5Family: Boolean)
    extends UnaryExpression {
  require(k >= 1, s"gram size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_gram_hashes"

  override def nullSafeEval(a: Any): Any =
    WinnowKernels.gramHashes(a.asInstanceOf[ArrayData], k, md5Family)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WinnowKernels.gramHashes($a, $k, $md5Family);")

  override protected def withNewChildInternal(c: Expression): TokenGramHashes =
    copy(child = c)
}

/** `array<bigint> -> array<bigint>`: sliding-window minimum (see
  * [[WinnowKernels.slidingMin]]). */
case class SlidingMin(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"window must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.catalogString}")
  }
  override def dataType: DataType = child.dataType match {
    case ArrayType(_, containsNull) => ArrayType(LongType, containsNull)
    case _ => ArrayType(LongType, containsNull = true)
  }
  override def prettyName: String = "sliding_min"

  override def nullSafeEval(a: Any): Any =
    WinnowKernels.slidingMin(a.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WinnowKernels.slidingMin($a, $w);")

  override protected def withNewChildInternal(c: Expression): SlidingMin =
    copy(child = c)
}
