package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter, SeekableInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Dependency-free Avro source/sink over the avro-core jars on
  * Spark's classpath (no spark-avro connector in this environment) —
  * beyond the reference's format matrix (vaex reads arrow/hdf5/fits
  * via libraries; it has no avro path), in the same house style as
  * the HDF5/FITS/Arrow layers: Hadoop-FS I/O throughout ([[FsIO]]),
  * a driver-streamed single-file writer, a distributed per-partition
  * sharded writer, and a genuinely DISTRIBUTED single-file reader.
  *
  * The distributed read is the Avro container format's own split
  * story (the same contract Hadoop's AvroInputFormat relies on):
  * records are grouped into blocks separated by 16-byte sync markers,
  * so any byte range maps to "seek to the first sync after `start`,
  * read blocks until past `end`". Each task opens its own positioned
  * handle — no driver materialization, wall-clock bounded by the
  * largest split at any file size.
  *
  * Type surface: boolean/int/long/float/double/string/bytes, the
  * standard temporal logical types (timestamp-millis/micros,
  * local-timestamp-millis/micros, date), the decimal logical type
  * (bytes or fixed carrier, precision <= 38), their nullable
  * `["null", T]` unions, nested records (struct columns), maps
  * (string keys — the only key type Avro has), enums and fixed
  * (read as string/binary; Spark has no source type for them), and
  * arrays of any supported element type, all recursively nested.
  * Conversion is driven by per-field converter trees built from the
  * AVRO schema (not the Spark type), so logical-type scaling applies
  * at every nesting depth — a top-level and an array-element
  * timestamp-millis read identically. Unsupported Avro branches
  * (multi-branch unions, >38-digit decimals) fail fast with the
  * offending schema fragment; unknown logical annotations fall back
  * to their raw carrier type.
  */
object Avro {

  /** Decode-allocation safety caps (the [[ArrowIpc]] MaxReadAllocBytes
    * analog): a corrupt varint length must surface as avro's prompt
    * SystemLimitException, not a multi-GB heap allocation. Avro reads
    * these system properties once; set only if the operator has not
    * configured them. 256 MB single string/bytes and 2^26 collection
    * items are far beyond any sane record. */
  locally {
    val defaults = Seq(
      "org.apache.avro.limits.bytes.maxLength" -> (256L << 20).toString,
      "org.apache.avro.limits.string.maxLength" -> (256L << 20).toString,
      "org.apache.avro.limits.collectionItems.maxLength" -> (1 << 26).toString)
    val setByUs = defaults.filter { case (k, v) =>
      if (System.getProperty(k) == null) { System.setProperty(k, v); true }
      else false
    }
    val anySet = setByUs.nonEmpty
    // avro reads the properties ONCE in SystemLimitException's static
    // initializer — if any avro class loaded before this object (Kryo
    // registration, another library), the caps would be silently
    // inert. resetLimits() (package-private, built for exactly this)
    // re-reads them; best-effort — a locked-down JVM just keeps
    // whatever limits were in force.
    if (anySet) try {
      val cls = Class.forName("org.apache.avro.SystemLimitException")
      val m = cls.getDeclaredMethod("resetLimits")
      m.setAccessible(true)
      m.invoke(null)
    } catch { case _: Throwable => () }
    // the reset is reflective into a package-private method — under a
    // locked-down runtime it silently no-ops and the caps stay inert.
    // Probe the outcome and SAY so (once, stderr) instead of leaving
    // the operator to discover it from an OOM (ADVICE r12).
    if (anySet) {
      // only verify the properties THIS code set — an operator who
      // pre-configured one cap to their own value must not trigger a
      // false "did NOT take effect" warning for it
      val fieldOf = Map(
        "org.apache.avro.limits.bytes.maxLength" -> "maxBytesLength",
        "org.apache.avro.limits.string.maxLength" -> "maxStringLength",
        "org.apache.avro.limits.collectionItems.maxLength" -> "maxCollectionLength")
      val inForce = decodeCapsInForce
      val landed = setByUs.forall { case (p, v) =>
        inForce.get(fieldOf(p)).contains(v.toLong)
      }
      if (!landed) System.err.println(
        "[graft.Avro] WARNING decode-allocation caps did NOT take effect " +
          s"(in force: $inForce) — corrupt varint lengths may allocate unbounded")
    }
  }

  /** The decode caps actually in force in this JVM (reflective read of
    * avro's SystemLimitException static fields) — empty if the runtime
    * forbids the reflective read. Lets an operator verify the
    * class-load-order-sensitive cap installation instead of trusting
    * it ([[AvroSpec]] asserts the expected values; this probe makes the
    * same check available outside the test JVM). */
  def decodeCapsInForce: Map[String, Long] = try {
    val cls = Class.forName("org.apache.avro.SystemLimitException")
    Seq("maxBytesLength", "maxStringLength", "maxCollectionLength").map { n =>
      val f = cls.getDeclaredField(n)
      f.setAccessible(true)
      n -> f.getInt(null).toLong
    }.toMap
  } catch { case _: Throwable => Map.empty }

  // ------------------------------------------------------------ schema

  /** Spark -> Avro schema. Every field is written as a nullable union
    * (Spark columns are nullable by default; a null-free column just
    * never uses the branch). */
  /** `enums` / `fixed` declare TOP-LEVEL columns to write as Avro's
    * named types (Spark has no native enum/fixed, so the mapping must
    * be declared): an enum column must be StringType (every value a
    * declared symbol — enforced per row at write), a fixed column
    * BinaryType (every value exactly `size` bytes). */
  def avroSchema(st: StructType, name: String = "row",
                 enums: Map[String, Seq[String]] = Map.empty,
                 fixed: Map[String, Int] = Map.empty): Schema = {
    val cols = st.fieldNames.toSet
    (enums.keySet ++ fixed.keySet).foreach(c => require(cols.contains(c),
      s"avro export: enum/fixed declaration for unknown column $c"))
    require(enums.keySet.intersect(fixed.keySet).isEmpty,
      s"avro export: ${enums.keySet.intersect(fixed.keySet)} declared both enum and fixed")
    val issued = scala.collection.mutable.Set[String](name)
    val fields = st.fields.map { f =>
      val t =
        if (enums.contains(f.name)) {
          require(f.dataType == StringType,
            s"avro export: enum column ${f.name} must be string, got ${f.dataType.catalogString}")
          val symbols = enums(f.name)
          require(symbols.nonEmpty && symbols.distinct.size == symbols.size,
            s"avro export: enum symbols for ${f.name} must be non-empty and distinct")
          Schema.createEnum(recName(f.name, issued), null, "graft", symbols.asJava)
        } else if (fixed.contains(f.name)) {
          require(f.dataType == BinaryType,
            s"avro export: fixed column ${f.name} must be binary, got ${f.dataType.catalogString}")
          require(fixed(f.name) >= 1,
            s"avro export: fixed size for ${f.name} must be positive")
          Schema.createFixed(recName(f.name, issued), null, "graft", fixed(f.name))
        } else avroType(f.dataType, f.name, issued)
      new Schema.Field(f.name, nullable(t), null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    val rec = Schema.createRecord(name, null, "graft", false)
    rec.setFields(java.util.Arrays.asList(fields: _*))
    rec
  }

  private def nullable(s: Schema): Schema =
    Schema.createUnion(Schema.create(Schema.Type.NULL), s)

  /** Avro record names must be unique within one schema document —
    * derive them from the field PATH (paths are unique by
    * construction), sanitized to Avro's [A-Za-z0-9_] name alphabet.
    * Sanitization can COLLIDE distinct paths (sibling struct columns
    * 'a.b' and 'a_b' both sanitize to r_a_b and Avro would reject the
    * redefinition) — a per-schema uniquifying counter keeps issued
    * names distinct. */
  private def recName(ctx: String,
                      issued: scala.collection.mutable.Set[String]): String = {
    val base = "r_" + ctx.replaceAll("[^A-Za-z0-9_]", "_")
    var n = base
    var i = 1
    while (!issued.add(n)) { n = s"${base}_$i"; i += 1 }
    n
  }

  private def avroType(dt: DataType, ctx: String,
                       issued: scala.collection.mutable.Set[String]): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    // temporal logical types (the Avro spec's standard encodings):
    // micros-precision matches Catalyst's internal representation
    case TimestampType =>
      org.apache.avro.LogicalTypes.timestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType =>
      org.apache.avro.LogicalTypes.localTimestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
    case DateType =>
      org.apache.avro.LogicalTypes.date()
        .addToSchema(Schema.create(Schema.Type.INT))
    // decimal logical type over a bytes carrier (big-endian
    // two's-complement unscaled value — the Avro spec encoding)
    case d: DecimalType =>
      org.apache.avro.LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case ArrayType(elem, containsNull) =>
      // Spark arrays default to nullable ELEMENTS — write them as
      // ["null", T] unions or a null element NPEs mid-write after
      // earlier blocks already hit the file
      val et = avroType(elem, s"$ctx.item", issued)
      Schema.createArray(if (containsNull) nullable(et) else et)
    case MapType(StringType, vt, valueContainsNull) =>
      val v = avroType(vt, s"$ctx.value", issued)
      Schema.createMap(if (valueContainsNull) nullable(v) else v)
    case MapType(k, _, _) => throw new IllegalArgumentException(
      s"avro export: map keys must be strings (Avro maps have no other key " +
        s"type), got ${k.catalogString} (column $ctx)")
    case st: StructType =>
      val rec = Schema.createRecord(recName(ctx, issued), null, "graft", false)
      rec.setFields(st.fields.map { f =>
        new Schema.Field(f.name,
          nullable(avroType(f.dataType, s"$ctx.${f.name}", issued)),
          null, Schema.Field.NULL_DEFAULT_VALUE)
      }.toList.asJava)
      rec
    case other => throw new IllegalArgumentException(
      s"avro export: unsupported type ${other.catalogString} (column $ctx)")
  }

  /** Avro -> Spark type; unwraps `["null", T]` unions and the
    * standard temporal logical types (unknown logical annotations fall
    * back to their raw carrier type — they are still valid data). */
  private def decimalOf(d: org.apache.avro.LogicalTypes.Decimal,
      ctx: String): DecimalType = {
    if (d.getPrecision > DecimalType.MAX_PRECISION)
      throw new IllegalArgumentException(
        s"avro read: decimal precision ${d.getPrecision} exceeds Spark's " +
          s"${DecimalType.MAX_PRECISION} (column $ctx)")
    DecimalType(d.getPrecision, d.getScale)
  }

  private def sparkType(s: Schema, ctx: String): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT => s.getLogicalType match {
      case _: org.apache.avro.LogicalTypes.Date => DateType
      case _ => IntegerType
    }
    case Schema.Type.LONG => s.getLogicalType match {
      case _: org.apache.avro.LogicalTypes.TimestampMicros => TimestampType
      case _: org.apache.avro.LogicalTypes.LocalTimestampMicros => TimestampNTZType
      // millis variants (spark-avro / Kafka Connect default output):
      // same Spark types, values scaled at read by the converter tree
      case _: org.apache.avro.LogicalTypes.TimestampMillis => TimestampType
      case _: org.apache.avro.LogicalTypes.LocalTimestampMillis => TimestampNTZType
      case _ => LongType
    }
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING => StringType
    case Schema.Type.BYTES => s.getLogicalType match {
      case d: org.apache.avro.LogicalTypes.Decimal => decimalOf(d, ctx)
      case _ => BinaryType
    }
    case Schema.Type.FIXED => s.getLogicalType match {
      case d: org.apache.avro.LogicalTypes.Decimal => decimalOf(d, ctx)
      case _ => BinaryType
    }
    case Schema.Type.ENUM => StringType
    case Schema.Type.ARRAY => ArrayType(sparkType(s.getElementType, ctx))
    case Schema.Type.MAP =>
      MapType(StringType, sparkType(s.getValueType, ctx), valueContainsNull = true)
    case Schema.Type.RECORD =>
      // Avro permits recursive record references; Spark's type system
      // cannot express them — the path-depth guard turns the infinite
      // recursion into a clear error
      if (ctx.count(_ == '.') > 32) throw new IllegalArgumentException(
        s"avro read: schema nesting deeper than 32 levels at $ctx " +
          "(recursive record reference?)")
      StructType(s.getFields.asScala.map { f =>
        StructField(f.name, sparkType(f.schema(), s"$ctx.${f.name}"), nullable = true)
      }.toArray)
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      if (branches.length != 1) throw new IllegalArgumentException(
        s"avro read: unsupported union $s (column $ctx)")
      sparkType(branches.head, ctx)
    case other => throw new IllegalArgumentException(
      s"avro read: unsupported type $other (column $ctx)")
  }

  def sparkSchema(s: Schema): StructType = {
    require(s.getType == Schema.Type.RECORD, s"avro read: root must be a record, got $s")
    StructType(s.getFields.asScala.map { f =>
      StructField(f.name, sparkType(f.schema(), f.name), nullable = true)
    }.toArray)
  }

  private def unwrapUnion(s: Schema): Schema = s.getType match {
    case Schema.Type.UNION =>
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    case _ => s
  }

  // ------------------------------------------------------------ write

  private def codecOf(codec: Option[String]): CodecFactory = codec match {
    case None => CodecFactory.nullCodec()
    case Some("deflate") => CodecFactory.deflateCodec(6)
    case Some("snappy") => CodecFactory.snappyCodec()
    case Some("null") => CodecFactory.nullCodec()
    case Some(other) => throw new IllegalArgumentException(
      s"avro export: unsupported codec $other (null|deflate|snappy)")
  }

  /** Spark external value -> Avro datum converter for one field,
    * built ONCE from the (Spark type, Avro schema) pair and applied
    * per row — the schema drives nested conversion (records, maps,
    * arrays, decimal scale) at every depth. Null-safe at every level
    * (nullable `["null", T]` unions at any nesting). */
  private def writeConv(dt: DataType, s0: Schema, ctx: String): Any => AnyRef = {
    val s = unwrapUnion(s0)
    val conv: Any => AnyRef = dt match {
      case StringType if s.getType == Schema.Type.ENUM => {
        case str: String =>
          if (!s.hasEnumSymbol(str)) throw new IllegalArgumentException(
            s"avro export: value '$str' is not an enum symbol of " +
              s"${s.getEnumSymbols} (column $ctx)")
          new GenericData.EnumSymbol(s, str)
      }
      case BinaryType if s.getType == Schema.Type.FIXED => {
        case b: Array[Byte] =>
          if (b.length != s.getFixedSize) throw new IllegalArgumentException(
            s"avro export: fixed(${s.getFixedSize}) column $ctx got " +
              s"${b.length} bytes")
          new GenericData.Fixed(s, b)
      }
      case BinaryType => { case b: Array[Byte] => java.nio.ByteBuffer.wrap(b) }
      case TimestampType => {
        case ts: java.sql.Timestamp =>
          Long.box(java.lang.Math.floorDiv(ts.getTime, 1000L) * 1000000L +
            ts.getNanos / 1000)
        // spark.sql.datetime.java8API.enabled swaps the external
        // temporal classes — accept both so the writer is
        // config-agnostic
        case i: java.time.Instant =>
          Long.box(i.getEpochSecond * 1000000L + i.getNano / 1000)
        // an unrecognized external temporal class must fail HERE with
        // the offending class, not as a cryptic Avro union error
        // mid-write
        case other => throw new IllegalArgumentException(
          s"avro export: unexpected external value ${other.getClass.getName} " +
            s"for ${dt.catalogString} (column $ctx)")
      }
      case TimestampNTZType => {
        case ldt: java.time.LocalDateTime =>
          Long.box(ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
            ldt.getNano / 1000)
        case other => throw new IllegalArgumentException(
          s"avro export: unexpected external value ${other.getClass.getName} " +
            s"for ${dt.catalogString} (column $ctx)")
      }
      case DateType => {
        case d: java.sql.Date => Int.box(d.toLocalDate.toEpochDay.toInt)
        case ld: java.time.LocalDate => Int.box(ld.toEpochDay.toInt)
        case other => throw new IllegalArgumentException(
          s"avro export: unexpected external value ${other.getClass.getName} " +
            s"for ${dt.catalogString} (column $ctx)")
      }
      case d: DecimalType =>
        // Avro spec decimal-over-bytes: big-endian two's-complement
        // unscaled value at the schema's declared scale
        { case bd: java.math.BigDecimal =>
            java.nio.ByteBuffer.wrap(
              bd.setScale(d.scale).unscaledValue().toByteArray) }
      case ShortType => { case n: java.lang.Short => Int.box(n.intValue()) }
      case ByteType => { case n: java.lang.Byte => Int.box(n.intValue()) }
      case ArrayType(elem, _) =>
        val ec = writeConv(elem, s.getElementType, s"$ctx.item")
        val f: Any => AnyRef = { case seq: scala.collection.Seq[_] =>
          seq.map(e => if (e == null) null else ec(e)).asJava }
        f
      case MapType(StringType, vt, _) =>
        val vc = writeConv(vt, s.getValueType, s"$ctx.value")
        val f: Any => AnyRef = { case m: scala.collection.Map[_, _] =>
          val out = new java.util.LinkedHashMap[String, AnyRef](m.size * 2)
          m.foreach { case (k, v) =>
            out.put(k.asInstanceOf[String], if (v == null) null else vc(v))
          }
          out }
        f
      case st: StructType =>
        val fcs = st.fields.zipWithIndex.map { case (f, i) =>
          writeConv(f.dataType, s.getFields.get(i).schema(), s"$ctx.${f.name}")
        }
        val f: Any => AnyRef = { case row: Row =>
          val rec = new GenericData.Record(s)
          var i = 0
          while (i < fcs.length) {
            rec.put(i, if (row.isNullAt(i)) null else fcs(i)(row.get(i)))
            i += 1
          }
          rec }
        f
      case _ => v => v.asInstanceOf[AnyRef] // boolean/int/long/float/double/string
    }
    v => if (v == null) null else conv(v)
  }

  private def writeRows(it: Iterator[Row], schema: StructType, avsc: Schema,
      out: java.io.OutputStream, codec: Option[String],
      syncInterval: Int): Long = {
    val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](avsc))
    try {
      writer.setCodec(codecOf(codec))
      if (syncInterval > 0) writer.setSyncInterval(syncInterval)
      writer.create(avsc, out) // DataFileWriter closes `out` on close()
    } catch { case e: Throwable => out.close(); throw e }
    val convs = schema.fields.zipWithIndex.map { case (f, i) =>
      writeConv(f.dataType, avsc.getFields.get(i).schema(), f.name)
    }
    var n = 0L
    try {
      while (it.hasNext) {
        val row = it.next()
        val rec = new GenericData.Record(avsc)
        var i = 0
        while (i < schema.length) {
          rec.put(i, if (row.isNullAt(i)) null else convs(i)(row.get(i)))
          i += 1
        }
        writer.append(rec)
        n += 1
      }
    } finally writer.close()
    n
  }

  /** Single-FILE Avro export, driver-streamed (the `export('x.avro')`
    * shape). `syncInterval` (bytes, approximate block size) bounds how
    * much a reader split over-reads; the Avro default 64 KiB is right
    * for production — tests shrink it to force many blocks. */
  def toAvro(df: DataFrame, path: String, codec: Option[String] = Some("deflate"),
             syncInterval: Int = 0,
             enums: Map[String, Seq[String]] = Map.empty,
             fixed: Map[String, Int] = Map.empty): Unit = {
    val schema = df.schema
    val avsc = avroSchema(schema, enums = enums, fixed = fixed)
    writeRows(df.toLocalIterator().asScala, schema, avsc,
      FsIO.create(path), codec, syncInterval)
  }

  /** DISTRIBUTED Avro export: every partition streams its own
    * `part-NNNNN.avro` to the target FileSystem from its executor —
    * no driver bottleneck, no shuffle (the Arrow/HDF5/FITS sharding
    * contract). Read back with `Readers.open(dir/part-*.avro)`.
    * Returns the shard count. */
  def toAvroSharded(df: DataFrame, dir: String,
                    codec: Option[String] = Some("deflate"),
                    enums: Map[String, Seq[String]] = Map.empty,
                    fixed: Map[String, Int] = Map.empty): Int = {
    val schema = df.schema
    val avscJson = avroSchema(schema, enums = enums, fixed = fixed).toString
    FsIO.mkdirs(dir)
    FsIO.deleteShards(dir, ".avro")
    val c = codec
    val written = df.rdd.mapPartitionsWithIndex { (pi, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val avsc = new Schema.Parser().parse(avscJson)
        writeRows(it, schema, avsc, FsIO.create(f"$dir/part-$pi%05d.avro"), c, 0)
        Iterator.single(1)
      }
    }.count()
    written.toInt
  }

  // ------------------------------------------------------------- read

  /** Avro SeekableInput over a Hadoop positioned-read handle (shared
    * with the Iceberg manifest reader). */
  private[sources] final class HadoopSeekableInput(path: String) extends SeekableInput {
    private val in = new FsIO.In(path)
    override def seek(p: Long): Unit = in.seek(p)
    override def tell(): Long = in.getFilePointer
    override def length(): Long = in.length
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      val remaining = in.length - in.getFilePointer
      if (remaining <= 0) return -1
      val want = math.min(len.toLong, remaining).toInt
      in.readFully(b, off, want)
      want
    }
    override def close(): Unit = in.close()
  }

  /** Avro datum -> Spark external value converter for one field,
    * built ONCE from the Avro schema and applied per record. The AVRO
    * schema (not the Spark type) drives the dispatch, so logical-type
    * handling — in particular millis-vs-micros timestamp scaling —
    * applies identically at every nesting depth (a top-level and an
    * array-element timestamp-millis both scale; the old value-level
    * dispatch silently read nested millis 1000x too small). `java8`
    * selects the external temporal classes Spark's Row encoder
    * expects under spark.sql.datetime.java8API.enabled. */
  private def readConv(s0: Schema, java8: Boolean, ctx: String): Any => Any = {
    val s = unwrapUnion(s0)

    def bytesOf(v: Any): Array[Byte] = v match {
      case b: java.nio.ByteBuffer =>
        val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
      case gf: org.apache.avro.generic.GenericFixed => gf.bytes().clone()
      case other => throw new IllegalArgumentException(
        s"avro read: unexpected datum ${other.getClass.getName} for " +
          s"bytes/fixed (column $ctx)")
    }
    def tsConv(unitScale: Long, ntz: Boolean): Any => Any = {
      case l: java.lang.Long =>
        val us = l * unitScale
        if (ntz) java.time.LocalDateTime.ofEpochSecond(
          java.lang.Math.floorDiv(us, 1000000L),
          (java.lang.Math.floorMod(us, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
        else if (java8) java.time.Instant.ofEpochSecond(
          java.lang.Math.floorDiv(us, 1000000L),
          java.lang.Math.floorMod(us, 1000000L) * 1000L)
        else {
          val ts = new java.sql.Timestamp(java.lang.Math.floorDiv(us, 1000L))
          ts.setNanos((java.lang.Math.floorMod(us, 1000000L) * 1000L).toInt)
          ts
        }
      case v => v
    }

    val conv: Any => Any = s.getType match {
      case Schema.Type.STRING | Schema.Type.ENUM => {
        case u: Utf8 => u.toString
        case cs: CharSequence => cs.toString
        case v => v.toString // GenericData.EnumSymbol
      }
      case Schema.Type.BYTES | Schema.Type.FIXED => s.getLogicalType match {
        case d: org.apache.avro.LogicalTypes.Decimal =>
          val scale = d.getScale
          v => new java.math.BigDecimal(
            new java.math.BigInteger(bytesOf(v)), scale)
        case _ => v => bytesOf(v)
      }
      case Schema.Type.INT => s.getLogicalType match {
        case _: org.apache.avro.LogicalTypes.Date => {
          case i: java.lang.Integer =>
            if (java8) java.time.LocalDate.ofEpochDay(i.longValue())
            else java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
          case v => v
        }
        case _ => identity[Any]
      }
      case Schema.Type.LONG => s.getLogicalType match {
        case _: org.apache.avro.LogicalTypes.TimestampMicros => tsConv(1L, ntz = false)
        case _: org.apache.avro.LogicalTypes.TimestampMillis => tsConv(1000L, ntz = false)
        case _: org.apache.avro.LogicalTypes.LocalTimestampMicros => tsConv(1L, ntz = true)
        case _: org.apache.avro.LogicalTypes.LocalTimestampMillis => tsConv(1000L, ntz = true)
        case _ => identity[Any]
      }
      case Schema.Type.ARRAY =>
        val ec = readConv(s.getElementType, java8, s"$ctx.item")
        val f: Any => Any = {
          case c: java.util.Collection[_] =>
            c.asScala.map(e => if (e == null) null else ec(e)).toSeq
          case v => v }
        f
      case Schema.Type.MAP =>
        val vc = readConv(s.getValueType, java8, s"$ctx.value")
        val f: Any => Any = {
          case m: java.util.Map[_, _] =>
            m.asScala.map { case (k, v) =>
              k.toString -> (if (v == null) null else vc(v))
            }.toMap
          case v => v }
        f
      case Schema.Type.RECORD =>
        val fcs = s.getFields.asScala.map { f =>
          readConv(f.schema(), java8, s"$ctx.${f.name}")
        }.toArray
        val f: Any => Any = {
          case rec: org.apache.avro.generic.IndexedRecord =>
            Row.fromSeq((0 until fcs.length).map { i =>
              val v = rec.get(i)
              if (v == null) null else fcs(i)(v)
            })
          case v => v }
        f
      case _ => identity[Any] // boolean/float/double, plain int/long
    }
    v => if (v == null) null else conv(v)
  }

  /** Distributed single-file read: split the byte range into
    * `defaultParallelism` spans (floored at ~1 MiB each so tiny files
    * do not fan out into empty tasks) and let each task sync-seek into
    * its span — the Avro container's own split contract. */
  def fromAvro(spark: SparkSession, path: String): DataFrame = {
    val (schemaJson, fileLen) = {
      val in = new HadoopSeekableInput(path)
      val r = try new DataFileReader(in, new GenericDatumReader[GenericRecord]())
        catch { case e: Throwable => in.close(); throw e }
      try (r.getSchema.toString, in.length())
      finally r.close() // closes `in` too
    }
    val sparkSt = sparkSchema(new Schema.Parser().parse(schemaJson))
    val java8 = spark.conf.get("spark.sql.datetime.java8API.enabled", "false").toBoolean
    val target = spark.sparkContext.defaultParallelism
    val nSplits = math.max(1, math.min(target.toLong, fileLen / (1L << 20)).toInt)
    val span = (fileLen + nSplits - 1) / nSplits
    val ranges = (0 until nSplits).map(i => (i * span, math.min((i + 1) * span, fileLen)))
    val p = path
    val j8 = java8
    val rdd = spark.sparkContext.parallelize(ranges, nSplits).flatMap { case (start, end) =>
      val avsc = new Schema.Parser().parse(schemaJson)
      val st = sparkSchema(avsc)
      val convs = avsc.getFields.asScala.map { f =>
        readConv(f.schema(), j8, f.name)
      }.toArray
      val in = new HadoopSeekableInput(p)
      val reader = try new DataFileReader(in, new GenericDatumReader[GenericRecord](avsc))
        catch { case e: Throwable => in.close(); throw e }
      reader.sync(start) // first block whose sync marker is at/after start
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit](_ => reader.close())
      new Iterator[Row] {
        private var closed = false
        override def hasNext: Boolean = {
          if (closed) return false
          val more = reader.hasNext && !reader.pastSync(end)
          if (!more && !closed) { closed = true; if (tc == null) reader.close() }
          more
        }
        override def next(): Row = {
          val rec = reader.next()
          Row.fromSeq(st.fields.indices.map { i =>
            val v = rec.get(i)
            if (v == null) null else convs(i)(v)
          })
        }
      }
    }
    spark.createDataFrame(rdd, sparkSt)
  }
}
