package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Portable Bloom filter over int64 keys — the broadcast-side
  * prefilter for semi-joins whose probe side is enormous and whose
  * build side is comparatively small (benchmark decontamination: every
  * 5-gram of a 100 TB corpus vs an eval-set gram dictionary).
  *
  * Why not Spark's own runtime row-group filters: those inject only
  * below shuffle/broadcast JOIN nodes chosen by the planner, and the
  * decontamination probe side must never reach a join at all — the
  * win is that a clean document (the overwhelming majority) is
  * resolved by a zero-shuffle projection and never explodes its grams
  * into the join. The exact semi-join then runs only over the bloom
  * survivors, so false positives cannot change the result — the lane
  * stays bit-identical to the exact one (gated by the same oracle).
  *
  * Design (standard Bloom math; keys go through MurmurHash3's fmix64
  * finalizer, then Kirsch–Mitzenmacher double hashing over the two
  * halves of the mixed value: pos_i = m + i*((m >>> 32) | 1) — the
  * Guava BloomFilter construction, public domain):
  *  - [[BloomBuildAgg]]: a [[TypedImperativeAggregate]] whose buffer
  *    is the bit array itself; partial aggregation builds per-task
  *    blooms and merge is a word-wise OR, so the build side never
  *    shuffles its keys — only nWords longs per task.
  *  - [[BloomFilterHashes]]: a codegen'd UnaryExpression taking the
  *    whole array<long> of a document's gram hashes and returning the
  *    maybe-contained subset in one tight primitive loop (a
  *    higher-order `filter(arr, λ)` would interpret the probe per
  *    element — ArrayFilter is CodegenFallback).
  *
  * The serialized filter travels inside the expression (a few KB–MB;
  * the same mechanism Spark uses for its injected runtime bloom
  * filters). mBits is a power of two so probes mask instead of mod.
  */
object BloomFunctions {

  private[functions] val Phi64 = -7046029254386353131L // 0x9E3779B97F4A7C15
  private[functions] val Fmix1 = -49064778989728563L   // 0xFF51AFD7ED558CCD
  private[functions] val Fmix2 = -4265267296055464877L // 0xC4CEB9FE1A85EC53

  /** MurmurHash3 fmix64 avalanche (public-domain finalizer). Probing
    * masks to the LOW lg(m) bits, and the double-hash step h2 is itself
    * a function of h — so without this mix, every probe position of a
    * key is determined by its low bits alone, and two keys sharing
    * their low lg(m) bits have IDENTICAL position sets (measured 6.2%
    * FP at 16 bits/key on arithmetic-progression keys, vs ~0.04%
    * theoretical; the parity spec's FP test caught it). The mix makes
    * all 64 input bits reach the masked positions. MUST stay in
    * lockstep with the codegen below. */
  @inline private[functions] def mix64(z0: Long): Long = {
    var z = z0 ^ (z0 >>> 33)
    z *= Fmix1
    z ^= (z >>> 33)
    z *= Fmix2
    z ^ (z >>> 33)
  }

  /** Second hash for double hashing: the UPPER 32 bits of the mixed
    * key, forced odd so the probe sequence never degenerates
    * (Kirsch–Mitzenmacher with the two "independent" hashes taken as
    * the two halves of one 64-bit hash, as Guava's BloomFilter does).
    * h2 must NOT be a multiplicative mix of m: (m * C) mod 2^lg(m)
    * depends only on m's low bits, which the position mask also reads —
    * that collapses the whole k-position set to a function of
    * m mod 2^lg(m), giving guaranteed joint-FPs at rate n/m regardless
    * of k (measured 5.9% where theory says 0.04%; the FP spec caught
    * it). Upper-half h2 makes the set depend on 32+lg(m) bits. */
  @inline private[functions] def mixH2(m: Long): Long = (m >>> 32) | 1L

  private[functions] def setBits(words: Array[Long], mask: Long, k: Int, h: Long): Unit = {
    val m = mix64(h)
    val h2 = mixH2(m)
    var j = 0
    while (j < k) {
      val pos = (m + j.toLong * h2) & mask
      words((pos >>> 6).toInt) |= (1L << (pos & 63L).toInt)
      j += 1
    }
  }

  private[functions] def testBits(words: Array[Long], mask: Long, k: Int, h: Long): Boolean = {
    val m = mix64(h)
    val h2 = mixH2(m)
    var j = 0
    while (j < k) {
      val pos = (m + j.toLong * h2) & mask
      if ((words((pos >>> 6).toInt) & (1L << (pos & 63L).toInt)) == 0L) return false
      j += 1
    }
    true
  }

  /** Headered wire format: [int32 k][int32 nWords][nWords x int64 LE]. */
  private[functions] def serializeBloom(k: Int, words: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + words.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(k).putInt(words.length)
    bb.asLongBuffer().put(words)
    bb.array()
  }

  private[functions] def deserializeBloom(bytes: Array[Byte]): (Int, Array[Long]) = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val k = bb.getInt()
    val nWords = bb.getInt()
    require(nWords > 0 && Integer.bitCount(nWords) == 1 && bytes.length == 8 + nWords * 8,
      s"corrupt bloom header: k=$k nWords=$nWords len=${bytes.length}")
    val words = new Array[Long](nWords)
    bb.asLongBuffer().get(words)
    (k, words)
  }

  /** bloom_agg(hash64, mBits, k) -> binary: distributed Bloom filter
    * build. The agg buffer IS the bit array; merge is word-wise OR, so
    * the map side emits one nWords-long array per task regardless of
    * input size — the build side's keys never shuffle. */
  case class BloomBuildAgg(
      child: Expression, mBits: Int, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

    // bounds enforced in the Column wrapper, not here: executor-side
    // Java deserialization rebuilds before fields land (GridAggregates
    // note) — a constructor `require` would see mBits=0.
    private def mask: Long = mBits.toLong - 1L

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    override def createAggregationBuffer(): Array[Long] = new Array[Long](mBits >>> 6)
    override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
      val v = child.eval(row)
      if (v != null) setBits(buf, mask, k, v.asInstanceOf[Long])
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0; while (i < a.length) { a(i) |= b(i); i += 1 }; a
    }
    override def eval(buf: Array[Long]): Any = serializeBloom(k, buf)
    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(buf.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      bb.asLongBuffer().put(buf)
      bb.array()
    }
    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val out = new Array[Long](bytes.length / 8)
      ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
      out
    }
    override def withNewMutableAggBufferOffset(o: Int): BloomBuildAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BloomBuildAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression = copy(child = c(0))
    override def prettyName: String = "bloom_agg"
  }

  /** bloom_filter_hashes(array<long>) -> array<long>: the subset of
    * the input hashes the filter might contain, in input order, in one
    * codegen'd primitive loop. Null elements are dropped (a gram hash
    * is never null; keeps the kernel total). Null array -> null.
    *
    * Holds the deserialized (k, words) rather than the wire bytes, and
    * compares them by CONTENT (`java.util.Arrays`): case-class equality
    * on an Array field is reference-based, which would defeat
    * canonicalization / semanticEquals / common-subexpression
    * elimination for two content-identical probes. */
  case class BloomFilterHashes(child: Expression, kHashes: Int, words: Array[Long])
      extends UnaryExpression {

    @transient private lazy val maskVal: Long = words.length.toLong * 64L - 1L

    override def equals(o: Any): Boolean = o match {
      case b: BloomFilterHashes =>
        kHashes == b.kHashes && child == b.child &&
          java.util.Arrays.equals(words, b.words)
      case _ => false
    }
    override def hashCode(): Int =
      31 * (31 * child.hashCode() + kHashes) + java.util.Arrays.hashCode(words)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${t.catalogString}")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "bloom_filter_hashes"

    override def nullSafeEval(a: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val tmp = new Array[Long](n)
      var cnt = 0
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val h = arr.getLong(i)
          if (testBits(words, maskVal, kHashes, h)) { tmp(cnt) = h; cnt += 1 }
        }
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(tmp, cnt))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val wordsRef = ctx.addReferenceObj("bloomWords", words, "long[]")
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val tmp = ctx.freshName("tmp")
        val cnt = ctx.freshName("cnt")
        val i = ctx.freshName("i")
        val h = ctx.freshName("h")
        val m = ctx.freshName("m")
        val h2 = ctx.freshName("h2")
        val j = ctx.freshName("j")
        val pos = ctx.freshName("pos")
        val all = ctx.freshName("all")
        // mirrors mix64/setBits/testBits exactly (BloomFunctionsSpec
        // asserts interpreted==codegen parity on adversarial inputs)
        s"""
           |final int $n = $a.numElements();
           |final long[] $tmp = new long[$n];
           |int $cnt = 0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$a.isNullAt($i)) {
           |    final long $h = $a.getLong($i);
           |    long $m = $h ^ ($h >>> 33);
           |    $m *= ${Fmix1}L;
           |    $m ^= ($m >>> 33);
           |    $m *= ${Fmix2}L;
           |    $m ^= ($m >>> 33);
           |    final long $h2 = ($m >>> 32) | 1L;
           |    boolean $all = true;
           |    for (int $j = 0; $j < $kHashes; $j++) {
           |      final long $pos = ($m + (long) $j * $h2) & ${maskVal}L;
           |      if (($wordsRef[(int) ($pos >>> 6)] & (1L << (int) ($pos & 63L))) == 0L) {
           |        $all = false; break;
           |      }
           |    }
           |    if ($all) { $tmp[$cnt++] = $h; }
           |  }
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
           |  .fromPrimitiveArray(java.util.Arrays.copyOf($tmp, $cnt));
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(c: Expression): BloomFilterHashes =
      copy(child = c)
  }

  private def checkParams(mBits: Int, k: Int): Unit = {
    require(mBits >= 64 && mBits <= (1 << 30) && Integer.bitCount(mBits) == 1,
      s"mBits must be a power of two in [64, 2^30], got $mBits")
    require(k >= 1 && k <= 16, s"k must be in [1, 16], got $k")
  }

  /** Aggregate a bigint column into a serialized Bloom filter. The
    * explicit cast makes a mistyped (int/short) input an analysis-time
    * error instead of an executor-side ClassCastException in
    * [[BloomBuildAgg.update]] (GridAggregates wrapper pattern). */
  def bloomAgg(c: Column, mBits: Int, k: Int): Column = {
    checkParams(mBits, k)
    Bridge.column(
      BloomBuildAgg(Bridge.expression(c.cast("bigint")), mBits, k)
        .toAggregateExpression())
  }

  /** Filter an array<bigint> column down to the maybe-contained subset. */
  def bloomFilterCandidates(arr: Column, bloom: Array[Byte]): Column = {
    val (k, words) = deserializeBloom(bloom)
    Bridge.column(BloomFilterHashes(Bridge.expression(arr), k, words))
  }

  /** Scalar membership probe on a bigint column. NULL input probes to
    * `false`, not NULL (`array(c)`'s null element is dropped by the
    * kernel) — deliberately conservative-correct for the prefilter use:
    * a null key can never match the exact semi-join either, so dropping
    * it early changes nothing downstream. Spark's own `might_contain`
    * propagates NULL instead; wrap with `c.isNotNull` if three-valued
    * SQL semantics are needed. */
  def bloomContains(c: Column, bloom: Array[Byte]): Column = {
    import org.apache.spark.sql.functions._
    size(bloomFilterCandidates(array(c), bloom)) > 0
  }

  /** Driver helper: build a Bloom filter over `df`'s bigint column in
    * one distributed pass (no key shuffle — see [[BloomBuildAgg]]). */
  def buildBloom(df: DataFrame, c: Column, mBits: Int, k: Int): Array[Byte] =
    df.agg(bloomAgg(c, mBits, k).as("b")).head().getAs[Array[Byte]](0)

  /** Driver-LOCAL build from an already-collected key array — for
    * callers that materialize the key dictionary anyway (e.g. the
    * bloom-decontamination lane, which also broadcasts the exact
    * dictionary: collecting once and building locally beats running
    * sizing-count + aggregate jobs that each recompute the
    * dictionary). Same bit layout as the distributed build. */
  def buildBloomLocal(keys: Array[Long], bitsPerKey: Int = 16): Array[Byte] = {
    val (mBits, k) = sizeFor(keys.length.toLong, bitsPerKey)
    checkParams(mBits, k)
    val words = new Array[Long](mBits / 64)
    val mask = mBits.toLong - 1L
    var i = 0
    while (i < keys.length) { setBits(words, mask, k, keys(i)); i += 1 }
    serializeBloom(k, words)
  }

  /** Size + build over ONE materialization of the key dictionary:
    * persists `df` so the sizing count and the filter build share the
    * computed keys (a distinct-gram dictionary otherwise recomputes
    * its shuffle per pass), then unpersists. The shared entry point
    * for the batch and streaming decontamination lanes. */
  def buildSizedBloom(df: DataFrame, c: Column, bitsPerKey: Int = 16): Array[Byte] = {
    val cached = df.persist()
    try {
      val (mBits, k) = sizeFor(cached.count(), bitsPerKey)
      buildBloom(cached, c, mBits, k)
    } finally cached.unpersist(blocking = false)
  }

  /** (mBits, k) for `nKeys` at ~`bitsPerKey` bits each: mBits the
    * next power of two of nKeys*bitsPerKey (clamped to [64, 2^30]),
    * k the optimal m/n*ln2 rounded into [1, 16]. 16 bits/key ~ 0.05%
    * false positives at k=11. */
  def sizeFor(nKeys: Long, bitsPerKey: Int = 16): (Int, Int) = {
    val n = math.max(nKeys, 1L)
    val mBits = math.max(64L, math.min(1L << 30,
      java.lang.Long.highestOneBit(n * bitsPerKey - 1L) << 1)).toInt
    val k = math.max(1, math.min(16,
      math.round(mBits.toDouble / n * math.log(2.0)).toInt))
    (mBits, k)
  }
}
