package graft.operators

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Driver-built long-key -> dense-ordinal dictionary, probed per row
  * by [[LongDictOrdinal]] inside whole-stage codegen. Open addressing
  * over a power-of-two table with an fmix64 avalanche (the r8 bloom
  * lesson: masked probing NEEDS the mix, and the probe step must not
  * derive from the masked bits) — one lookup is a mix + a short
  * linear scan, no boxing, no per-row allocation.
  *
  * Empty slots carry ordinal -1 (key values are unconstrained longs,
  * so presence lives in the ordinal array, not a sentinel key). */
final class LongDict private (
    private val keys: Array[Long], private val ords: Array[Int],
    val nullOrdinal: Int, val cardinality: Int) extends Serializable {

  private val mask = keys.length - 1

  /** Dense ordinal of `k`, or -1 when the key is not in the
    * dictionary. */
  def ordinal(k: Long): Int = {
    var i = (LongDict.fmix64(k) & mask).toInt
    while (true) {
      val o = ords(i)
      if (o < 0) return -1
      if (keys(i) == k) return o
      i = (i + 1) & mask
    }
    -1 // unreachable
  }

  /** Probe used from generated code: unknown keys are LOUD — the
    * dictionary was built from the same frame, so a miss means the
    * input is nondeterministic between the build and the probe. */
  def ordinalOrThrow(k: Long): Int = {
    val o = ordinal(k)
    if (o < 0) throw new IllegalStateException(
      s"groupByKeys: key $k was not present when the dictionary was " +
        "built — the input is nondeterministic; materialize it first")
    o
  }

  def nullOrdinalOrThrow(): Int = {
    if (nullOrdinal < 0) throw new IllegalStateException(
      "groupByKeys: a NULL key appeared but none was present when the " +
        "dictionary was built — the input is nondeterministic")
    nullOrdinal
  }
}

object LongDict {

  /** MurmurHash3's 64-bit finalizer. */
  private[operators] def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  /** Build from DISTINCT keys; `nullOrdinal` = the ordinal reserved
    * for null keys, or -1 when the data has none. Capacity keeps the
    * load factor under 0.5. */
  def build(distinctKeys: Array[Long], nullOrdinal: Int): LongDict = {
    var cap = 8
    while (cap < distinctKeys.length * 2) cap <<= 1
    val keys = new Array[Long](cap)
    val ords = Array.fill(cap)(-1)
    val mask = cap - 1
    var o = 0
    while (o < distinctKeys.length) {
      val k = distinctKeys(o)
      var i = (fmix64(k) & mask).toInt
      while (ords(i) >= 0) {
        require(keys(i) != k, s"duplicate key $k in dictionary build")
        i = (i + 1) & mask
      }
      keys(i) = k
      ords(i) = o
      o += 1
    }
    val card = distinctKeys.length + (if (nullOrdinal >= 0) 1 else 0)
    new LongDict(keys, ords, nullOrdinal, card)
  }
}

/** `key -> dense ordinal` through a [[LongDict]], as ONE codegen'd
  * static-shaped call (the house kernel pattern): null keys take the
  * dictionary's reserved null ordinal, unknown keys throw. Output is
  * never null — every input row lands in exactly one dense slot, so
  * the downstream dense accumulate drops nothing. */
case class LongDictOrdinal(child: Expression, dict: LongDict)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint key, got ${child.dataType.catalogString}")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "long_dict_ordinal"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) dict.nullOrdinalOrThrow()
    else dict.ordinalOrThrow(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("longDict", dict,
      classOf[LongDict].getName)
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      final int ${ev.value} = ${c.isNull}
        ? $ref.nullOrdinalOrThrow()
        : $ref.ordinalOrThrow(${c.value});""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): LongDictOrdinal = copy(child = newChild)
}

/** Driver-built UTF8String-key -> dense-ordinal dictionary — the
  * string twin of [[LongDict]] (the commonest real grouping key needs
  * no ordinal_encode preprocessing). Open addressing over a
  * power-of-two table; the probe hash is UTF8String's murmur3 hash
  * pushed through fmix64 (the r8 bloom lesson: masked probing needs
  * the avalanche, and the linear-probe step must not derive from the
  * masked bits). Keys compare by BYTES (UTF8String.equals). */
final class Utf8Dict private (
    private val keys: Array[org.apache.spark.unsafe.types.UTF8String],
    private val ords: Array[Int],
    val nullOrdinal: Int, val cardinality: Int) extends Serializable {

  private val mask = ords.length - 1

  def ordinal(k: org.apache.spark.unsafe.types.UTF8String): Int = {
    var i = (LongDict.fmix64(k.hashCode().toLong) & mask).toInt
    while (true) {
      val o = ords(i)
      if (o < 0) return -1
      if (keys(i).equals(k)) return o
      i = (i + 1) & mask
    }
    -1 // unreachable
  }

  def ordinalOrThrow(k: org.apache.spark.unsafe.types.UTF8String): Int = {
    val o = ordinal(k)
    if (o < 0) throw new IllegalStateException(
      s"groupByKeys: key '$k' was not present when the dictionary was " +
        "built — the input is nondeterministic; materialize it first")
    o
  }

  def nullOrdinalOrThrow(): Int = {
    if (nullOrdinal < 0) throw new IllegalStateException(
      "groupByKeys: a NULL key appeared but none was present when the " +
        "dictionary was built — the input is nondeterministic")
    nullOrdinal
  }
}

object Utf8Dict {
  /** Build from DISTINCT keys (ordinal = position); load factor < 0.5. */
  def build(distinctKeys: Array[org.apache.spark.unsafe.types.UTF8String],
      nullOrdinal: Int): Utf8Dict = {
    var cap = 8
    while (cap < distinctKeys.length * 2) cap <<= 1
    val keys = new Array[org.apache.spark.unsafe.types.UTF8String](cap)
    val ords = Array.fill(cap)(-1)
    val mask = cap - 1
    var o = 0
    while (o < distinctKeys.length) {
      val k = distinctKeys(o)
      var i = (LongDict.fmix64(k.hashCode().toLong) & mask).toInt
      while (ords(i) >= 0) {
        require(!keys(i).equals(k), s"duplicate key '$k' in dictionary build")
        i = (i + 1) & mask
      }
      keys(i) = k
      ords(i) = o
      o += 1
    }
    val card = distinctKeys.length + (if (nullOrdinal >= 0) 1 else 0)
    new Utf8Dict(keys, ords, nullOrdinal, card)
  }
}

/** `string key -> dense ordinal` through a [[Utf8Dict]] — same
  * contract as [[LongDictOrdinal]] (null -> reserved ordinal, unknown
  * key loud, never-null int out). */
case class Utf8DictOrdinal(child: Expression, dict: Utf8Dict)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string key, got ${child.dataType.catalogString}")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "utf8_dict_ordinal"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) dict.nullOrdinalOrThrow()
    else dict.ordinalOrThrow(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("utf8Dict", dict,
      classOf[Utf8Dict].getName)
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      final int ${ev.value} = ${c.isNull}
        ? $ref.nullOrdinalOrThrow()
        : $ref.ordinalOrThrow(${c.value});""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Utf8DictOrdinal = copy(child = newChild)
}
