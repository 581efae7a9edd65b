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
  * standard temporal logical types (timestamp-micros,
  * local-timestamp-micros, date), their nullable `["null", T]`
  * unions, and arrays of primitives (nullable elements included) —
  * the interchange subset every engine agrees on. Unsupported Avro
  * branches fail fast with the offending schema fragment; unknown
  * logical annotations fall back to their raw carrier type.
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
    val anySet = defaults.map { case (k, v) =>
      if (System.getProperty(k) == null) { System.setProperty(k, v); true }
      else false
    }.exists(identity)
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
  }

  // ------------------------------------------------------------ schema

  /** Spark -> Avro schema. Every field is written as a nullable union
    * (Spark columns are nullable by default; a null-free column just
    * never uses the branch). */
  def avroSchema(st: StructType, name: String = "row"): Schema = {
    val fields = st.fields.map { f =>
      new Schema.Field(f.name, nullable(avroType(f.dataType, f.name)),
        null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    val rec = Schema.createRecord(name, null, "graft", false)
    rec.setFields(java.util.Arrays.asList(fields: _*))
    rec
  }

  private def nullable(s: Schema): Schema =
    Schema.createUnion(Schema.create(Schema.Type.NULL), s)

  private def avroType(dt: DataType, ctx: String): Schema = dt match {
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
    case ArrayType(elem, containsNull) => elem match {
      case BooleanType | IntegerType | LongType | FloatType | DoubleType |
          StringType =>
        // Spark arrays default to nullable ELEMENTS — write them as
        // ["null", T] unions or a null element NPEs mid-write after
        // earlier blocks already hit the file
        val et = avroType(elem, ctx)
        Schema.createArray(if (containsNull) nullable(et) else et)
      case other => throw new IllegalArgumentException(
        s"avro export: unsupported array element type ${other.catalogString} (column $ctx)")
    }
    case other => throw new IllegalArgumentException(
      s"avro export: unsupported type ${other.catalogString} (column $ctx)")
  }

  /** Avro -> Spark type; unwraps `["null", T]` unions and the
    * standard temporal logical types (unknown logical annotations fall
    * back to their raw carrier type — they are still valid data). */
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
      // same Spark types, values scaled at read via timeUnitScale
      case _: org.apache.avro.LogicalTypes.TimestampMillis => TimestampType
      case _: org.apache.avro.LogicalTypes.LocalTimestampMillis => TimestampNTZType
      case _ => LongType
    }
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING => StringType
    case Schema.Type.BYTES => BinaryType
    case Schema.Type.ARRAY => ArrayType(sparkType(s.getElementType, ctx))
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

  /** Micros-per-stored-unit for a field's timestamp logical type
    * (1000 for the -millis variants, 1 otherwise) — the read path
    * multiplies stored values up to Catalyst's micros. */
  private def timeUnitScale(s: Schema): Long = {
    val unwrapped = s.getType match {
      case Schema.Type.UNION =>
        s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
      case _ => s
    }
    unwrapped.getLogicalType match {
      case _: org.apache.avro.LogicalTypes.TimestampMillis => 1000L
      case _: org.apache.avro.LogicalTypes.LocalTimestampMillis => 1000L
      case _ => 1L
    }
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

  private def toAvroValue(v: Any, dt: DataType): AnyRef = (dt, v) match {
    case (_, null) => null
    case (StringType, s: String) => s
    case (BinaryType, b: Array[Byte]) => java.nio.ByteBuffer.wrap(b)
    case (TimestampType, ts: java.sql.Timestamp) =>
      Long.box(java.lang.Math.floorDiv(ts.getTime, 1000L) * 1000000L +
        ts.getNanos / 1000)
    // spark.sql.datetime.java8API.enabled swaps the external temporal
    // classes — accept both so the writer is config-agnostic
    case (TimestampType, i: java.time.Instant) =>
      Long.box(i.getEpochSecond * 1000000L + i.getNano / 1000)
    case (TimestampNTZType, ldt: java.time.LocalDateTime) =>
      Long.box(ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        ldt.getNano / 1000)
    case (DateType, d: java.sql.Date) =>
      Int.box(d.toLocalDate.toEpochDay.toInt)
    case (DateType, ld: java.time.LocalDate) =>
      Int.box(ld.toEpochDay.toInt)
    case (ShortType, n: java.lang.Short) => Int.box(n.intValue())
    case (ByteType, n: java.lang.Byte) => Int.box(n.intValue())
    case (ArrayType(elem, _), seq: scala.collection.Seq[_]) =>
      seq.map(e => toAvroValue(e, elem)).asJava
    // an unrecognized external temporal class must fail HERE with the
    // offending class, not as a cryptic Avro union error mid-write
    case (TimestampType | TimestampNTZType | DateType, other) =>
      throw new IllegalArgumentException(
        s"avro export: unexpected external value ${other.getClass.getName} for ${dt.catalogString}")
    case (_, other) => other.asInstanceOf[AnyRef]
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
    var n = 0L
    try {
      while (it.hasNext) {
        val row = it.next()
        val rec = new GenericData.Record(avsc)
        var i = 0
        while (i < schema.length) {
          rec.put(i, if (row.isNullAt(i)) null
            else toAvroValue(row.get(i), schema(i).dataType))
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
             syncInterval: Int = 0): Unit = {
    val schema = df.schema
    val avsc = avroSchema(schema)
    writeRows(df.toLocalIterator().asScala, schema, avsc,
      FsIO.create(path), codec, syncInterval)
  }

  /** DISTRIBUTED Avro export: every partition streams its own
    * `part-NNNNN.avro` to the target FileSystem from its executor —
    * no driver bottleneck, no shuffle (the Arrow/HDF5/FITS sharding
    * contract). Read back with `Readers.open(dir/part-*.avro)`.
    * Returns the shard count. */
  def toAvroSharded(df: DataFrame, dir: String,
                    codec: Option[String] = Some("deflate")): Int = {
    val schema = df.schema
    val avscJson = avroSchema(schema).toString
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

  /** Avro SeekableInput over a Hadoop positioned-read handle. */
  private final class HadoopSeekableInput(path: String) extends SeekableInput {
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

  /** `unitScale` = micros per stored unit ([[timeUnitScale]]);
    * `java8` selects the external temporal classes Spark's Row
    * encoder expects under spark.sql.datetime.java8API.enabled. */
  private def fromAvroValue(v: Any, dt: DataType, unitScale: Long,
      java8: Boolean): Any = (dt, v) match {
    case (_, null) => null
    case (StringType, u: Utf8) => u.toString
    case (StringType, s: CharSequence) => s.toString
    case (TimestampType, l: java.lang.Long) =>
      val us = l * unitScale
      if (java8) java.time.Instant.ofEpochSecond(
        java.lang.Math.floorDiv(us, 1000000L),
        java.lang.Math.floorMod(us, 1000000L) * 1000L)
      else {
        val ts = new java.sql.Timestamp(java.lang.Math.floorDiv(us, 1000L))
        ts.setNanos((java.lang.Math.floorMod(us, 1000000L) * 1000L).toInt)
        ts
      }
    case (TimestampNTZType, l: java.lang.Long) =>
      val us = l * unitScale
      java.time.LocalDateTime.ofEpochSecond(
        java.lang.Math.floorDiv(us, 1000000L),
        (java.lang.Math.floorMod(us, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
    case (DateType, i: java.lang.Integer) =>
      if (java8) java.time.LocalDate.ofEpochDay(i.longValue())
      else java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
    case (BinaryType, b: java.nio.ByteBuffer) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case (ArrayType(elem, _), l: java.util.Collection[_]) =>
      l.asScala.map(e => fromAvroValue(e, elem, 1L, java8)).toSeq
    case _ => v
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
      val scales = avsc.getFields.asScala.map(f => timeUnitScale(f.schema())).toArray
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
            fromAvroValue(rec.get(i), st.fields(i).dataType, scales(i), j8)
          })
        }
      }
    }
    spark.createDataFrame(rdd, sparkSt)
  }
}
