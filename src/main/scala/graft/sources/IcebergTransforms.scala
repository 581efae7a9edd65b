package graft.sources

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The Iceberg partition-transform value functions, built straight
  * from the table spec's "Partition Transforms" + Appendix B
  * ("32-bit Hash Requirements"): `bucket[N]` hashes the value's
  * single-value-serialized bytes with murmur3_x86_32 seed 0 and takes
  * `(hash & Int.MaxValue) % N`; temporal transforms count
  * years/months/days/hours from the unix epoch (timestamps evaluated
  * on the UTC instant). Integer-ish sources (int, long, date, time,
  * timestamp) hash the 8-byte little-endian long; strings hash their
  * UTF-8 bytes.
  *
  * The murmur3 here is the REFERENCE murmur3_x86_32 (Guava's
  * `murmur3_32`, what Java Iceberg uses) — NOT Spark's
  * `Murmur3HashFunction`, whose byte-tail handling diverges from the
  * standard. The spec's own test vectors pin it
  * (IcebergTransformsSpec): bucket hash of int/long 34 = 2017239379,
  * date 2017-11-16 = -653330422, timestamp 2017-11-16T22:31:08 =
  * -2047944441, string "iceberg" = 1210000089. */
private[graft] object IcebergTransforms {

  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  @inline private def mixK1(k0: Int): Int = {
    var k = k0 * C1
    k = Integer.rotateLeft(k, 15)
    k * C2
  }

  @inline private def mixH1(h0: Int, k: Int): Int = {
    var h = h0 ^ k
    h = Integer.rotateLeft(h, 13)
    h * 5 + 0xe6546b64
  }

  @inline private def fmix(h0: Int, len: Int): Int = {
    var h = h0 ^ len
    h ^= h >>> 16
    h *= 0x85ebca6b
    h ^= h >>> 13
    h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  /** murmur3_x86_32 of the 8-byte little-endian encoding of `v`
    * (seed 0) — the Iceberg hash for int/long/date/time/timestamp
    * sources. Two 4-byte blocks, no tail. */
  def hashLong(v: Long): Int = {
    var h1 = 0 // seed
    h1 = mixH1(h1, mixK1(v.toInt))
    h1 = mixH1(h1, mixK1((v >>> 32).toInt))
    fmix(h1, 8)
  }

  /** Reference murmur3_x86_32 over `bytes` (seed 0) — 4-byte
    * little-endian blocks plus the STANDARD byte tail. */
  def hashBytes(bytes: Array[Byte], off: Int, len: Int): Int = {
    var h1 = 0 // seed
    val nblocks = len >>> 2
    var i = 0
    while (i < nblocks) {
      val o = off + (i << 2)
      val k = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
      h1 = mixH1(h1, mixK1(k))
      i += 1
    }
    var k1 = 0
    val tail = off + (nblocks << 2)
    (len & 3) match {
      case 3 =>
        k1 ^= (bytes(tail + 2) & 0xff) << 16
        k1 ^= (bytes(tail + 1) & 0xff) << 8
        k1 ^= bytes(tail) & 0xff
      case 2 =>
        k1 ^= (bytes(tail + 1) & 0xff) << 8
        k1 ^= bytes(tail) & 0xff
      case 1 =>
        k1 ^= bytes(tail) & 0xff
      case _ => ()
    }
    if ((len & 3) != 0) h1 ^= mixK1(k1)
    fmix(h1, len)
  }

  def bucketLong(v: Long, n: Int): Int =
    (hashLong(v) & Integer.MAX_VALUE) % n

  def bucketUtf8(s: UTF8String, n: Int): Int = {
    val b = s.getBytes
    (hashBytes(b, 0, b.length) & Integer.MAX_VALUE) % n
  }

  private final val MicrosPerHour = 3600L * 1000000L
  private final val MicrosPerDay = 24L * MicrosPerHour

  /** Temporal field of an epoch-micros instant, evaluated in UTC —
    * exact integer math, immune to the session time zone (Spark's
    * calendar functions render TimestampType in the SESSION zone,
    * which is not the Iceberg transform's domain). `unit` ordinals:
    * 0=year 1=month 2=day 3=hour. */
  def microsField(m: Long, unit: Int): Int = unit match {
    case 3 => Math.floorDiv(m, MicrosPerHour).toInt
    case 2 => Math.floorDiv(m, MicrosPerDay).toInt
    case _ =>
      val d = java.time.LocalDate.ofEpochDay(Math.floorDiv(m, MicrosPerDay))
      if (unit == 0) d.getYear - 1970
      else (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
  }
}

/** `long -> int`: the Iceberg `bucket[N]` transform over an 8-byte
  * little-endian murmur3 (int/long/date/time/timestamp sources,
  * widened to epoch-typed longs by the caller). */
private[graft] case class IcebergBucketLong(child: Expression, n: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires long, got ${t.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "iceberg_bucket_long"
  override def nullSafeEval(v: Any): Any =
    IcebergTransforms.bucketLong(v.asInstanceOf[Long], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.sources.IcebergTransforms.bucketLong($v, $n);")
  override protected def withNewChildInternal(c: Expression): IcebergBucketLong =
    copy(child = c)
}

/** `string -> int`: the Iceberg `bucket[N]` transform over the
  * value's UTF-8 bytes (reference murmur3_x86_32, seed 0). */
private[graft] case class IcebergBucketUtf8(child: Expression, n: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "iceberg_bucket_str"
  override def nullSafeEval(v: Any): Any =
    IcebergTransforms.bucketUtf8(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.sources.IcebergTransforms.bucketUtf8($v, $n);")
  override protected def withNewChildInternal(c: Expression): IcebergBucketUtf8 =
    copy(child = c)
}

/** `long (epoch micros) -> int`: an Iceberg temporal transform
  * evaluated on the UTC instant. `unit`: 0=year 1=month 2=day
  * 3=hour. */
private[graft] case class IcebergMicrosField(child: Expression, unit: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires long, got ${t.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "iceberg_micros_field"
  override def nullSafeEval(v: Any): Any =
    IcebergTransforms.microsField(v.asInstanceOf[Long], unit)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.sources.IcebergTransforms.microsField($v, $unit);")
  override protected def withNewChildInternal(c: Expression): IcebergMicrosField =
    copy(child = c)
}
