package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern substring search as a codegen'd Catalyst
  * expression — the blocklist-filtering primitive every web-corpus
  * curation pipeline runs (C4's "bad words" page filter, Raffel et
  * al. 2020 §2.2; reference capability class: `str_*` contains
  * filtering in packages/vaex-core/vaex/functions.py).
  *
  * `k` separate `contains()` probes scan the document `k` times —
  * O(k·n) per row, and the plan carries `k` predicate expressions. The
  * automaton matches ALL patterns in ONE pass over the UTF-8 bytes —
  * O(n + matches) per row regardless of blocklist size, the property
  * that matters when the blocklist is hundreds of phrases and the
  * corpus is 100 TB. The automaton is built once on the driver and
  * ships to executors as a codegen reference object (goto/fail/output
  * tables — flat int arrays, no per-row allocation).
  *
  * Matching is case-sensitive raw-byte substring containment —
  * byte-identical to `position(p IN text) > 0` per pattern in DuckDB,
  * which is the oracle formulation.
  */
object AhoCorasick {

  /** Flat-array Aho–Corasick automaton over UTF-8 bytes. At most 64
    * patterns (match set is a Long bitmask — a curation blocklist
    * bigger than that should shard across a few expressions or use a
    * mask-array variant). */
  final class Automaton(patterns: Array[Array[Byte]]) extends Serializable {
    require(patterns.nonEmpty && patterns.length <= 64,
      s"1..64 patterns supported, got ${patterns.length}")
    require(patterns.forall(_.nonEmpty), "empty pattern")

    // build the trie, then TRIM the worst-case-sized build tables to
    // the live node count — the automaton ships to executors inside
    // every plan (ctx.addReferenceObj), so shared-prefix pattern sets
    // must not pay the sum-of-lengths upper bound in serialized bytes
    private val (gotoTab: Array[Int], outMask: Array[Long]) = {
      val maxNodes = patterns.map(_.length).sum + 1
      // goto: node*256 + byte -> next node (-1 = undefined during build)
      val g = Array.fill(maxNodes * 256)(-1)
      val out = new Array[Long](maxNodes)
      val fail = new Array[Int](maxNodes)
      var nNodes = 1
      for ((p, idx) <- patterns.zipWithIndex) {
        var s = 0
        for (b <- p) {
          val c = b & 0xff
          if (g(s * 256 + c) == -1) {
            g(s * 256 + c) = nNodes
            nNodes += 1
          }
          s = g(s * 256 + c)
        }
        out(s) |= (1L << idx)
      }
      // BFS failure links; complete the goto function so matching is a
      // single table read per byte (no failure-chasing loop at runtime)
      val queue = new java.util.ArrayDeque[Int]()
      var c = 0
      while (c < 256) {
        val nxt = g(c)
        if (nxt == -1) g(c) = 0
        else { fail(nxt) = 0; queue.add(nxt) }
        c += 1
      }
      while (!queue.isEmpty) {
        val s = queue.poll()
        out(s) |= out(fail(s))
        var b = 0
        while (b < 256) {
          val nxt = g(s * 256 + b)
          if (nxt == -1) g(s * 256 + b) = g(fail(s) * 256 + b)
          else { fail(nxt) = g(fail(s) * 256 + b); queue.add(nxt) }
          b += 1
        }
      }
      (java.util.Arrays.copyOf(g, nNodes * 256),
        java.util.Arrays.copyOf(out, nNodes))
    }

    /** Bitmask of patterns occurring anywhere in `text`. */
    def matchMask(text: UTF8String): Long = {
      val n = text.numBytes()
      var s = 0
      var mask = 0L
      var i = 0
      while (i < n) {
        s = gotoTab(s * 256 + (text.getByte(i) & 0xff))
        mask |= outMask(s)
        i += 1
      }
      mask
    }
  }

  /** Ascending pattern indices present in `text` (empty array when
    * clean) — equals DuckDB's
    * `list_filter(range(0, k), i -> contains(text, patterns[i+1]))`. */
  def maskToIndices(mask: Long): GenericArrayData = {
    val k = java.lang.Long.bitCount(mask)
    val out = new Array[Long](k)
    var m = mask
    var o = 0
    while (m != 0L) {
      out(o) = java.lang.Long.numberOfTrailingZeros(m).toLong
      m &= m - 1
      o += 1
    }
    new GenericArrayData(out)
  }

  /** Column: ascending indices (bigint) of blocklist patterns found in
    * the text — one automaton pass per row inside codegen. */
  def matchedPatternIndices(text: Column, patterns: Seq[String]): Column =
    Bridge.column(MultiContainsIndices(Bridge.expression(text),
      new Automaton(patterns.map(_.getBytes("UTF-8")).toArray), patterns.length))
}

/** `array<string> -> array<bigint>`: occurrence count of each
  * vocabulary term in a token array — the per-document tf vector for
  * retrieval scoring, as one codegen'd pass (open-addressed exact
  * string probe). At corpus scale this replaces the
  * explode-all-tokens + isin + groupBy tf shuffle with a zero-shuffle
  * projection: only (doc, termIdx, tf>0) rows ever move. */
case class TermCounts(child: Expression, terms: Seq[String])
    extends UnaryExpression {
  require(terms.nonEmpty, "term list must not be empty")
  require(terms.distinct.length == terms.length,
    s"duplicate terms: ${terms.diff(terms.distinct).distinct.mkString(",")}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "term_counts"

  // open-addressed probe table over the term bytes, built once
  @transient private lazy val table: (Array[UTF8String], Array[Int], Int) = {
    val n = terms.length
    var cap = java.lang.Integer.highestOneBit(math.max(n * 2 - 1, 4)) << 1
    if (cap < 4) cap = 4
    val keys = new Array[UTF8String](cap)
    val idx = new Array[Int](cap)
    for ((t, i) <- terms.zipWithIndex) {
      val k = UTF8String.fromString(t)
      var slot = k.hashCode() & (cap - 1)
      while (keys(slot) != null && !keys(slot).equals(k)) slot = (slot + 1) & (cap - 1)
      require(keys(slot) == null, s"duplicate term '$t'")
      keys(slot) = k
      idx(slot) = i
    }
    (keys, idx, cap)
  }

  def countTerms(toks: ArrayData): ArrayData = {
    val (keys, idx, cap) = table
    val out = new Array[Long](terms.length)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        var slot = t.hashCode() & (cap - 1)
        var done = false
        while (!done) {
          val k = keys(slot)
          if (k == null) done = true
          else if (k.equals(t)) { out(idx(slot)) += 1; done = true }
          else slot = (slot + 1) & (cap - 1)
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(x: Any): Any = countTerms(x.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("termCounts", this,
      classOf[TermCounts].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $self.countTerms($x);")
  }
  override protected def withNewChildInternal(c: Expression): TermCounts =
    copy(child = c)
}

/** `string -> array<bigint>` of matched blocklist-pattern indices. */
case class MultiContainsIndices(child: Expression,
    automaton: AhoCorasick.Automaton, nPatterns: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "multi_contains_indices"

  override def nullSafeEval(x: Any): Any =
    AhoCorasick.maskToIndices(automaton.matchMask(x.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AhoCorasick.Automaton].getName)
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.AhoCorasick.maskToIndices($acRef.matchMask($x));")
  }
  override protected def withNewChildInternal(c: Expression): MultiContainsIndices =
    copy(child = c)
}
