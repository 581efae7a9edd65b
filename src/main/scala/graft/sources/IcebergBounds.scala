package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.spark.sql.types._

/** Iceberg per-column bounds: the table spec's SINGLE-VALUE
  * serialization (Appendix D — little-endian fixed-width numerics,
  * UTF-8 strings, big-endian two's-complement decimal unscaled) for
  * the `lower_bounds` / `upper_bounds` / `value_counts` /
  * `null_value_counts` maps of manifest `data_file` structs, plus the
  * bridge that turns a manifest entry's bounds into the Delta-shaped
  * stats JSON `DeltaStats.mightMatch` evaluates — ONE bounds
  * evaluator serves both lakehouse formats.
  *
  * Conservative discipline matches the Delta side: a column with
  * unusable bytes, an unsupported type, or a >64-char string bound
  * simply has no entry (no skipping on it, never a wrong skip). Note
  * foreign Iceberg writers TRUNCATE string bounds (lower = prefix,
  * upper = prefix incremented) — both remain VALID bounds, so reading
  * them as-is is sound.
  */
private[graft] object IcebergBounds {

  import DeltaStats.{Days, Micros}

  private val MaxStringBound = 64

  private def le(n: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(n).array()
  private def le(n: Long): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(n).array()

  /** Bound-domain value (DeltaStats.footerStats output) -> Appendix D
    * bytes for the column's Iceberg type. None = not serializable
    * (unsupported type, oversized string) -> omit the map entry. */
  def toBytes(v: Any, dt: DataType): Option[Array[Byte]] = try dt match {
    case BooleanType =>
      Some(Array[Byte](if (v.asInstanceOf[Boolean]) 1 else 0))
    case ByteType | ShortType | IntegerType =>
      Some(le(v.asInstanceOf[java.math.BigDecimal].intValueExact()))
    case LongType =>
      Some(le(v.asInstanceOf[java.math.BigDecimal].longValueExact()))
    case FloatType =>
      Some(le(java.lang.Float.floatToIntBits(
        v.asInstanceOf[java.math.BigDecimal].floatValue())))
    case DoubleType =>
      Some(le(java.lang.Double.doubleToLongBits(
        v.asInstanceOf[java.math.BigDecimal].doubleValue())))
    case DateType =>
      Some(le(java.lang.Math.toIntExact(v.asInstanceOf[Days].d)))
    case TimestampType | TimestampNTZType =>
      Some(le(v.asInstanceOf[Micros].us))
    case StringType =>
      val s = v.asInstanceOf[String]
      if (s.length > MaxStringBound) None
      else Some(s.getBytes(StandardCharsets.UTF_8))
    case d: DecimalType =>
      Some(v.asInstanceOf[java.math.BigDecimal]
        .setScale(d.scale).unscaledValue().toByteArray)
    case _ => None
  } catch { case _: ArithmeticException => None }

  /** Appendix D bytes -> bound-domain value. */
  def fromBytes(b: Array[Byte], dt: DataType): Option[Any] = try {
    def buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    dt match {
      case BooleanType if b.length == 1 => Some(b(0) != 0)
      case ByteType | ShortType | IntegerType if b.length == 4 =>
        Some(new java.math.BigDecimal(buf.getInt))
      case LongType if b.length == 8 =>
        Some(new java.math.BigDecimal(buf.getLong))
      case FloatType if b.length == 4 =>
        val f = java.lang.Float.intBitsToFloat(buf.getInt)
        if (f.isNaN || f.isInfinite) None
        else Some(new java.math.BigDecimal(f.toString))
      case DoubleType if b.length == 8 =>
        val d = java.lang.Double.longBitsToDouble(buf.getLong)
        if (d.isNaN || d.isInfinite) None
        else Some(new java.math.BigDecimal(d.toString))
      case DateType if b.length == 4 => Some(Days(buf.getInt.toLong))
      case (TimestampType | TimestampNTZType) if b.length == 8 =>
        Some(Micros(buf.getLong))
      case StringType =>
        val s = new String(b, StandardCharsets.UTF_8)
        if (s.length > MaxStringBound) None else Some(s)
      case d: DecimalType =>
        Some(new java.math.BigDecimal(new java.math.BigInteger(b), d.scale))
      case _ => None
    }
  } catch { case _: Exception => None }

  /** Types that get bounds/counts entries (the skipping-evaluable
    * set — matches DeltaStats' kinds). */
  def statEligible(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | DateType | TimestampType |
         TimestampNTZType | StringType | _: DecimalType => true
    case _ => false
  }

  /** Fill value_counts / null_value_counts / lower_bounds /
    * upper_bounds on a writer-side data_file record from one file's
    * footer stats. */
  def populate(d: GenericRecord, st: DeltaStats.FileColStats,
      schema: StructType, idsByName: Map[String, Int]): Unit = {
    def itemsSchema(field: String) = {
      val fs = d.getSchema.getField(field).schema()
      // ["null", array<record>] union
      fs.getTypes.get(1).getElementType
    }
    def kvList(field: String,
        entries: Seq[(Int, Any)]): java.util.List[GenericRecord] = {
      val is = itemsSchema(field)
      val out = new java.util.ArrayList[GenericRecord](entries.size)
      entries.sortBy(_._1).foreach { case (k, v) =>
        val r = new GenericData.Record(is)
        r.put("key", k)
        r.put("value", v)
        out.add(r)
      }
      out
    }
    val cols = schema.filter(f =>
      statEligible(f.dataType) && idsByName.contains(f.name))
    d.put("value_counts", kvList("value_counts",
      cols.map(f => idsByName(f.name) -> java.lang.Long.valueOf(st.numRecords))))
    d.put("null_value_counts", kvList("null_value_counts",
      cols.flatMap(f => st.nullCounts.get(f.name)
        .map(n => idsByName(f.name) -> java.lang.Long.valueOf(n)))))
    // nan_value_counts = 0 is PROVEN for float/double columns whose
    // bounds survived: parquet-mr's total-order comparator puts NaN
    // at max, and footerStats drops NaN bounds — surviving bounds
    // imply a NaN-free file. Readers (ours below, real Iceberg's
    // planner) need this to trust float/double bounds at all.
    d.put("nan_value_counts", kvList("nan_value_counts",
      cols.collect {
        case f if (f.dataType == FloatType || f.dataType == DoubleType) &&
            st.mins.contains(f.name) && st.maxs.contains(f.name) =>
          idsByName(f.name) -> java.lang.Long.valueOf(0L)
      }))
    def boundsList(field: String, vals: Map[String, Any]) =
      kvList(field, cols.flatMap { f =>
        vals.get(f.name).flatMap(v => toBytes(v, f.dataType))
          .map(b => idsByName(f.name) -> (ByteBuffer.wrap(b): Any))
      })
    d.put("lower_bounds", boundsList("lower_bounds", st.mins))
    d.put("upper_bounds", boundsList("upper_bounds", st.maxs))
  }

  // ------------------------------------------------------------------
  // Manifest entry -> Delta-shaped stats JSON (read side)
  // ------------------------------------------------------------------

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Int-keyed spec map from a manifest field: the canonical Avro
    * encoding is array<record{key,value}> with logicalType map;
    * tolerate a java Map as well. Empty when absent/null. */
  private def intMap(df: GenericRecord, field: String): Map[Int, Any] = {
    if (df.getSchema.getField(field) == null) return Map.empty
    df.get(field) match {
      case null => Map.empty
      case arr: java.util.Collection[_] =>
        val b = Map.newBuilder[Int, Any]
        arr.forEach { e =>
          val r = e.asInstanceOf[GenericRecord]
          b += r.get("key").asInstanceOf[java.lang.Integer].intValue() ->
            r.get("value")
        }
        b.result()
      case m: java.util.Map[_, _] =>
        val b = Map.newBuilder[Int, Any]
        m.forEach { (k, v) => b += k.toString.toInt -> v }
        b.result()
      case _ => Map.empty
    }
  }

  private def bytesOf(v: Any): Option[Array[Byte]] = v match {
    case null => None
    case bb: ByteBuffer =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); Some(a)
    case a: Array[Byte] => Some(a)
    case _ => None
  }

  private def longOf(v: Any): Option[Long] = v match {
    case l: java.lang.Long => Some(l.longValue())
    case i: java.lang.Integer => Some(i.longValue())
    case _ => None
  }

  /** Build the Delta-shaped stats JSON for one data_file record so
    * `DeltaStats.mightMatch` can evaluate predicates against Iceberg
    * bounds. `fieldsById`: top-level schema fields keyed by Iceberg
    * field id. Returns null when the entry carries nothing usable. */
  def statsJsonFor(df: GenericRecord,
      fieldsById: Map[Int, StructField]): String = {
    val lower = intMap(df, "lower_bounds")
    val upper = intMap(df, "upper_bounds")
    val nulls = intMap(df, "null_value_counts")
    val nans = intMap(df, "nan_value_counts")
    val records = df.getSchema.getField("record_count") match {
      case null => None
      case _ => longOf(df.get("record_count"))
    }
    if (lower.isEmpty && upper.isEmpty && nulls.isEmpty && records.isEmpty)
      return null
    val j = mapper.createObjectNode()
    records.foreach(n => j.put("numRecords", n))
    val mnN = j.putObject("minValues")
    val mxN = j.putObject("maxValues")
    val ncN = j.putObject("nullCount")
    fieldsById.foreach { case (id, f) =>
      // spec bounds EXCLUDE NaN but Spark orders NaN above everything:
      // float/double bounds are sound only with a proven-zero NaN count
      val floaty = f.dataType == FloatType || f.dataType == DoubleType
      val nanSafe = !floaty || nans.get(id).flatMap(longOf).contains(0L)
      (if (nanSafe) lower.get(id).flatMap(bytesOf) else None,
       if (nanSafe) upper.get(id).flatMap(bytesOf) else None) match {
        case (Some(lo), Some(hi)) =>
          (fromBytes(lo, f.dataType), fromBytes(hi, f.dataType)) match {
            case (Some(mn), Some(mx)) =>
              DeltaStats.putBound(mnN, f.name, mn)
              DeltaStats.putBound(mxN, f.name, mx)
            case _ => ()
          }
        case _ => ()
      }
      nulls.get(id).flatMap(longOf).foreach(n => ncN.put(f.name, n))
    }
    mapper.writeValueAsString(j)
  }
}
