package graft.sources

import java.io.{EOFException, InputStream, OutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Dependency-free TFRecord source/sink — the TensorFlow training-data
  * container (public format: tensorflow/core/lib/io/record_writer.h).
  * A file is a sequence of framed records:
  *
  *   uint64 LE  length
  *   uint32 LE  masked CRC-32C of the length bytes
  *   byte[length] data
  *   uint32 LE  masked CRC-32C of the data
  *
  * with mask(crc) = ((crc >> 15) | (crc << 17)) + 0xa282ead8 and
  * CRC-32C (Castagnoli — `java.util.zip.CRC32C`). Each record is a
  * `tf.train.Example` protobuf:
  *
  *   Example  { Features features = 1; }
  *   Features { map<string, Feature> feature = 1; }
  *   Feature  { oneof { BytesList = 1; FloatList = 2; Int64List = 3; } }
  *
  * encoded/decoded here with a minimal hand-rolled protobuf walker
  * (wire format is public: varints, length-delimited fields, packed
  * and unpacked repeated scalars — the reader accepts BOTH packed and
  * unpacked list encodings, as protobuf parsers must).
  *
  * Scale design: TFRecord files are NOT internally splittable (no
  * sync marker), but the production layout is always a sharded file
  * SET — so reads parallelize at file granularity (one task per
  * file), and `toTfRecordSharded` writes one file per partition with
  * no shuffle. Corrupt framing fails loudly (CRC mismatch with the
  * file offset) — the format has no resync point.
  *
  * Type mapping: Int64List <-> long (int/short/byte/boolean widen at
  * write), FloatList <-> float, BytesList <-> binary or string (UTF-8)
  * as the schema declares. Scalars are 1-element lists; array columns
  * keep full lists. Doubles are rejected at write (tf.train.Example
  * has no double list — cast to float upstream, the lossy choice must
  * be the caller's).
  */
object Tfrecord {

  private val MaxRecord = 256L << 20 // guard: one framed record <= 256 MiB

  private[graft] def maskCrc(crc: Long): Int = {
    val c = crc & 0xffffffffL
    ((((c >>> 15) | (c << 17)) + 0xa282ead8L) & 0xffffffffL).toInt
  }

  private def crc32c(b: Array[Byte], off: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32C()
    c.update(b, off, len)
    c.getValue
  }

  // ------------------------------------------------------- protobuf out

  private final class ProtoOut {
    private var buf = new Array[Byte](256)
    var len = 0
    private def ensure(n: Int): Unit =
      if (len + n > buf.length)
        buf = java.util.Arrays.copyOf(buf, math.max(len + n, buf.length * 2))
    def byte(b: Int): Unit = { ensure(1); buf(len) = b.toByte; len += 1 }
    def varint(v0: Long): Unit = {
      var v = v0
      ensure(10)
      while ((v & ~0x7fL) != 0) { buf(len) = ((v & 0x7f) | 0x80).toByte; len += 1; v >>>= 7 }
      buf(len) = (v & 0x7f).toByte; len += 1
    }
    def tag(field: Int, wire: Int): Unit = varint((field << 3) | wire)
    def bytes(b: Array[Byte]): Unit = { ensure(b.length); System.arraycopy(b, 0, buf, len, b.length); len += b.length }
    def lenDelim(field: Int, b: Array[Byte], n: Int): Unit = {
      tag(field, 2); varint(n); ensure(n); System.arraycopy(b, 0, buf, len, n); len += n
    }
    def nested(field: Int, inner: ProtoOut): Unit = {
      tag(field, 2); varint(inner.len); ensure(inner.len)
      System.arraycopy(inner.rawBuf, 0, buf, len, inner.len); len += inner.len
    }
    def rawBuf: Array[Byte] = buf
    def toArray: Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  /** Encode one Feature message for a column value. `vs` holds the
    * already-null-checked elements. */
  private def featureBytes(vs: Seq[Any], kind: Char, ctx: String): ProtoOut = {
    val inner = new ProtoOut // BytesList / FloatList / Int64List
    kind match {
      case 'B' =>
        vs.foreach { v =>
          val b = v match {
            case s: String => s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            case a: Array[Byte] => a
            case other => throw new IllegalArgumentException(
              s"tfrecord export: unexpected ${other.getClass.getName} in $ctx")
          }
          inner.lenDelim(1, b, b.length)
        }
      case 'F' =>
        val packed = new ProtoOut
        vs.foreach { v =>
          val bits = java.lang.Float.floatToIntBits(v.asInstanceOf[Float])
          packed.byte(bits & 0xff); packed.byte((bits >>> 8) & 0xff)
          packed.byte((bits >>> 16) & 0xff); packed.byte((bits >>> 24) & 0xff)
        }
        inner.nested(1, packed) // packed floats: field 1, length-delimited
      case 'I' =>
        val packed = new ProtoOut
        vs.foreach { v =>
          val l = v match {
            case l: Long => l
            case i: Int => i.toLong
            case s: Short => s.toLong
            case b: Byte => b.toLong
            case b: Boolean => if (b) 1L else 0L
            case other => throw new IllegalArgumentException(
              s"tfrecord export: unexpected ${other.getClass.getName} in $ctx")
          }
          packed.varint(l)
        }
        inner.nested(1, packed)
    }
    val feature = new ProtoOut
    val fieldNo = kind match { case 'B' => 1; case 'F' => 2; case 'I' => 3 }
    feature.nested(fieldNo, inner)
    feature
  }

  /** (kind, isArray) per column, derived from the Spark type. */
  private def colPlan(schema: StructType): Seq[(String, Char, Boolean)] =
    schema.fields.map { f =>
      def kindOf(t: DataType): Char = t match {
        case StringType | BinaryType => 'B'
        case FloatType => 'F'
        case LongType | IntegerType | ShortType | ByteType | BooleanType => 'I'
        case DoubleType => throw new IllegalArgumentException(
          s"tfrecord export: column ${f.name} is double — tf.train.Example has " +
            "no double list; cast to float (lossy) or long upstream")
        case other => throw new IllegalArgumentException(
          s"tfrecord export: unsupported type ${other.catalogString} for column ${f.name}")
      }
      f.dataType match {
        case ArrayType(et, _) => (f.name, kindOf(et), true)
        case t => (f.name, kindOf(t), false)
      }
    }.toSeq

  private def exampleBytes(row: Row, plan: Seq[(String, Char, Boolean)]): Array[Byte] = {
    val features = new ProtoOut
    plan.zipWithIndex.foreach { case ((name, kind, isArr), i) =>
      if (!row.isNullAt(i)) {
        val vs: Seq[Any] =
          if (isArr) {
            val s = row.getSeq[Any](i)
            require(!s.contains(null),
              s"tfrecord export: null element in array column $name " +
                "(tf.train lists have no nulls)")
            s
          } else Seq(row.get(i))
        val nameB = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val entry = new ProtoOut // map entry { key = 1; value = 2; }
        entry.lenDelim(1, nameB, nameB.length)
        entry.nested(2, featureBytes(vs, kind, name))
        features.nested(1, entry)
      }
      // null scalar/array: feature simply absent from the record (the
      // tf.train convention) — reads come back null
    }
    val example = new ProtoOut
    example.nested(1, features)
    example.toArray
  }

  private def writeFramed(out: OutputStream, data: Array[Byte]): Unit = {
    val lenB = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(data.length.toLong).array()
    val head = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    head.put(lenB).putInt(maskCrc(crc32c(lenB, 0, 8)))
    out.write(head.array())
    out.write(data)
    out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(maskCrc(crc32c(data, 0, data.length))).array())
  }

  /** Single-file export, driver-streamed (one pass). */
  def toTfRecord(df: DataFrame, path: String): Unit = {
    val plan = colPlan(df.schema)
    val out = FsIO.create(path)
    try {
      import scala.jdk.CollectionConverters._
      val it = df.toLocalIterator().asScala
      while (it.hasNext) writeFramed(out, exampleBytes(it.next(), plan))
    } finally out.close()
  }

  /** Distributed sharded export: one `part-NNNNN.tfrecord` per
    * partition, streamed from its executor — the production TFRecord
    * layout (file sets shard the parallelism the format itself
    * cannot). Returns the shard count. */
  def toTfRecordSharded(df: DataFrame, dir: String): Int = {
    val plan = colPlan(df.schema)
    FsIO.mkdirs(dir)
    FsIO.deleteShards(dir, ".tfrecord")
    val written = df.rdd.mapPartitionsWithIndex { (pi, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val out = FsIO.create(f"$dir/part-$pi%05d.tfrecord")
        try it.foreach(r => writeFramed(out, exampleBytes(r, plan)))
        finally out.close()
        Iterator.single(1)
      }
    }.count()
    written.toInt
  }

  // ------------------------------------------------------- protobuf in

  private final class ProtoIn(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0
      var v = 0L
      while (shift < 64) {
        require(pos < end, "tfrecord: truncated varint")
        val b = buf(pos); pos += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
      }
      throw new IllegalArgumentException("tfrecord: varint longer than 10 bytes")
    }
    def slice(n: Int): ProtoIn = {
      require(n >= 0 && pos + n <= end, "tfrecord: truncated length-delimited field")
      val s = new ProtoIn(buf, pos, pos + n); pos += n; s
    }
    def fixed32(): Int = {
      require(pos + 4 <= end, "tfrecord: truncated fixed32")
      val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
        ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
      pos += 4; v
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 => require(pos + 8 <= end, "tfrecord: truncated fixed64"); pos += 8
      case 2 => val n = varint().toInt; slice(n); ()
      case 5 => fixed32(); ()
      case w => throw new IllegalArgumentException(s"tfrecord: unsupported wire type $w")
    }
  }

  /** One decoded feature: exactly one list kind with its elements. */
  private def parseFeature(p: ProtoIn): (Char, Seq[Any]) = {
    var kind = ' '
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    while (p.hasMore) {
      val tag = p.varint()
      val (field, wire) = ((tag >> 3).toInt, (tag & 7).toInt)
      field match {
        case 1 if wire == 2 => // BytesList
          kind = 'B'
          val bl = p.slice(p.varint().toInt)
          while (bl.hasMore) {
            val t2 = bl.varint()
            if ((t2 >> 3).toInt == 1 && (t2 & 7) == 2) {
              val s = bl.slice(bl.varint().toInt)
              out += java.util.Arrays.copyOfRange(s.buf, s.pos, s.end)
            } else bl.skip((t2 & 7).toInt)
          }
        case 2 if wire == 2 => // FloatList
          kind = 'F'
          val fl = p.slice(p.varint().toInt)
          while (fl.hasMore) {
            val t2 = fl.varint()
            ((t2 >> 3).toInt, (t2 & 7).toInt) match {
              case (1, 2) => // packed
                val s = fl.slice(fl.varint().toInt)
                while (s.hasMore) out += java.lang.Float.intBitsToFloat(s.fixed32())
              case (1, 5) => // unpacked element
                out += java.lang.Float.intBitsToFloat(fl.fixed32())
              case (_, w) => fl.skip(w)
            }
          }
        case 3 if wire == 2 => // Int64List
          kind = 'I'
          val il = p.slice(p.varint().toInt)
          while (il.hasMore) {
            val t2 = il.varint()
            ((t2 >> 3).toInt, (t2 & 7).toInt) match {
              case (1, 2) => // packed
                val s = il.slice(il.varint().toInt)
                while (s.hasMore) out += s.varint()
              case (1, 0) => out += il.varint() // unpacked element
              case (_, w) => il.skip(w)
            }
          }
        case _ => p.skip(wire)
      }
    }
    (kind, out.toSeq)
  }

  /** Example bytes -> (feature name -> (kind, elements)). */
  private[graft] def parseExample(data: Array[Byte]): Map[String, (Char, Seq[Any])] = {
    val p = new ProtoIn(data, 0, data.length)
    val out = scala.collection.mutable.LinkedHashMap[String, (Char, Seq[Any])]()
    while (p.hasMore) {
      val tag = p.varint()
      if ((tag >> 3).toInt == 1 && (tag & 7) == 2) { // features
        val fs = p.slice(p.varint().toInt)
        while (fs.hasMore) {
          val t2 = fs.varint()
          if ((t2 >> 3).toInt == 1 && (t2 & 7) == 2) { // map entry
            val e = fs.slice(fs.varint().toInt)
            var key: String = null
            var value: (Char, Seq[Any]) = null
            while (e.hasMore) {
              val t3 = e.varint()
              ((t3 >> 3).toInt, (t3 & 7).toInt) match {
                case (1, 2) =>
                  val s = e.slice(e.varint().toInt)
                  key = new String(s.buf, s.pos, s.end - s.pos,
                    java.nio.charset.StandardCharsets.UTF_8)
                case (2, 2) => value = parseFeature(e.slice(e.varint().toInt))
                case (_, w) => e.skip(w)
              }
            }
            if (key != null && value != null) out(key) = value
          } else fs.skip((t2 & 7).toInt)
        }
      } else p.skip((tag & 7).toInt)
    }
    out.toMap
  }

  // --------------------------------------------------------- file scan

  private def readFully(in: InputStream, b: Array[Byte], ctx: String): Boolean = {
    var off = 0
    while (off < b.length) {
      val k = in.read(b, off, b.length - off)
      if (k < 0) {
        if (off == 0) return false
        throw new EOFException(s"$ctx: truncated record framing")
      }
      off += k
    }
    true
  }

  /** Iterate framed record payloads, validating both CRCs. The
    * underlying stream closes on exhaustion AND on every leak path:
    * a task-completion listener inside Spark tasks, a Cleaner for
    * driver-side consumers that abandon the iterator early (the Warc
    * discipline), and an explicit close when the FIRST advance throws
    * (a corrupt first record must not leak the handle it was read
    * from). */
  private[graft] def recordIterator(path: String): Iterator[Array[Byte]] = {
    // whole-file gzip (TFRecordOptions compression_type=GZIP — the
    // common wild form): stream-gunzip; the file stays one task's
    // sequential read either way, since TFRecord has no split points
    val in: InputStream =
      if (path.endsWith(".gz"))
        new java.util.zip.GZIPInputStream(FsIO.open(path), 1 << 16)
      else FsIO.open(path)
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ =>
      try in.close() catch { case _: Throwable => () })
    var offset = 0L
    val it = new Iterator[Array[Byte]] {
      private var nextRec: Array[Byte] =
        try advance()
        catch { case e: Throwable => in.close(); throw e }
      private def advance(): Array[Byte] = {
        val head = new Array[Byte](12)
        if (!readFully(in, head, path)) { in.close(); return null }
        val hb = ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN)
        val len = hb.getLong
        val lenCrc = hb.getInt
        require(maskCrc(crc32c(head, 0, 8)) == lenCrc,
          s"$path: length CRC mismatch at offset $offset (corrupt or not a TFRecord file)")
        require(len >= 0 && len <= MaxRecord,
          s"$path: implausible record length $len at offset $offset")
        val data = new Array[Byte](len.toInt)
        if (!readFully(in, data, path))
          throw new EOFException(s"$path: truncated record at offset $offset")
        val tail = new Array[Byte](4)
        if (!readFully(in, tail, path))
          throw new EOFException(s"$path: truncated record CRC at offset $offset")
        val dataCrc = ByteBuffer.wrap(tail).order(ByteOrder.LITTLE_ENDIAN).getInt
        require(maskCrc(crc32c(data, 0, data.length)) == dataCrc,
          s"$path: data CRC mismatch at offset $offset")
        offset += 12 + len + 4
        data
      }
      def hasNext: Boolean = nextRec != null
      def next(): Array[Byte] = {
        val r = nextRec
        nextRec =
          try advance()
          catch { case e: Throwable => in.close(); throw e }
        r
      }
    }
    // the cleanable must capture `in` only — capturing `it` would pin
    // it live forever; close() is idempotent for the exhaustion path
    if (tc == null) cleaner.register(it, new Runnable {
      private val handle = in
      override def run(): Unit =
        try handle.close() catch { case _: Throwable => () }
    })
    it
  }

  /** Last-resort handle reclamation for iterators consumed outside a
    * Spark task (see recordIterator). */
  private lazy val cleaner = java.lang.ref.Cleaner.create()

  /** Infer a schema from one Example: int64 -> long, float -> float,
    * bytes -> binary; exactly-one-element lists read as scalars,
    * others as arrays. Pass an explicit `schema` to fromTfRecord for
    * string decoding or to pin scalar-vs-array. */
  private def inferSchema(data: Array[Byte], ctx: String): StructType = {
    val fs = parseExample(data)
    require(fs.nonEmpty, s"$ctx: first record has no features to infer from")
    StructType(fs.toSeq.map { case (name, (kind, vs)) =>
      val base: DataType = kind match {
        case 'B' => BinaryType
        case 'F' => FloatType
        case 'I' => LongType
        case _ => BinaryType
      }
      StructField(name,
        if (vs.size == 1) base else ArrayType(base, containsNull = false),
        nullable = true)
    })
  }

  private def convert(kind: Char, vs: Seq[Any], t: DataType, name: String,
                      ctx: String): Any = {
    def scalarOf(base: DataType, v: Any): Any = (base, kind) match {
      case (LongType, 'I') => v
      case (FloatType, 'F') => v
      case (BinaryType, 'B') => v
      case (StringType, 'B') => new String(v.asInstanceOf[Array[Byte]],
        java.nio.charset.StandardCharsets.UTF_8)
      case _ => throw new IllegalArgumentException(
        s"$ctx: feature $name holds kind '$kind', schema wants ${base.catalogString}")
    }
    t match {
      case ArrayType(base, _) => vs.map(v => scalarOf(base, v))
      case base =>
        require(vs.size == 1,
          s"$ctx: feature $name has ${vs.size} elements but the schema declares a scalar")
        scalarOf(base, vs.head)
    }
  }

  /** Read a TFRecord file or glob of files as a DataFrame — one task
    * per file (the format is not internally splittable; the sharded
    * file set is the parallelism unit). `schema` null = inferred from
    * the first record of the first file. Features missing from a
    * record come back null. */
  def fromTfRecord(spark: SparkSession, pathOrGlob: String,
                   schema: StructType = null): DataFrame = {
    val files: Seq[String] =
      if (pathOrGlob.exists("*?[".contains(_))) {
        val fs = FsIO.glob(pathOrGlob)
        require(fs.nonEmpty, s"tfrecord: glob matched no files: $pathOrGlob")
        fs
      } else Seq(pathOrGlob)
    val sch =
      if (schema != null) schema
      else {
        val it = recordIterator(files.head)
        require(it.hasNext, s"${files.head}: empty TFRecord file")
        inferSchema(it.next(), files.head)
      }
    val fields = sch.fields.map(f => (f.name, f.dataType)).toSeq
    val rows = spark.sparkContext.parallelize(files, files.size).flatMap { f =>
      recordIterator(f).map { data =>
        val feats = parseExample(data)
        Row.fromSeq(fields.map { case (name, t) =>
          feats.get(name) match {
            case Some((kind, vs)) => convert(kind, vs, t, name, f)
            case None => null
          }
        })
      }
    }
    spark.createDataFrame(rows, sch)
  }
}
