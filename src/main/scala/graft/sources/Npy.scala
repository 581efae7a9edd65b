package graft.sources

import java.io.{BufferedOutputStream, OutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{CRC32, Inflater}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Dependency-free numpy `.npy` / `.npz` source and sink over the
  * Hadoop-FS interchange layer ([[FsIO]]) — the lingua franca for
  * embedding matrices and small scientific tables (beyond the
  * reference, which exchanges numpy arrays only in-process via
  * `vaex.from_arrays`, `core/__init__.py:291`; the on-disk format here
  * is the public NEP-1 spec, `numpy/lib/format.py`).
  *
  * Format (NEP-1 / numpy.lib.format):
  *  - magic `NUMPY`, version major.minor (v1 header length u16
  *    LE; v2/v3 u32 LE), then an ASCII python-dict header
  *    `{'descr': ..., 'fortran_order': bool, 'shape': (n,) or (n, d)}`
  *    space-padded to a 64-byte multiple and terminated `\n`, then the
  *    raw array bytes (C order unless `fortran_order`).
  *  - `.npz` is a PKZIP archive of `.npy` members (`np.savez` =
  *    STORED members, `np.savez_compressed` = DEFLATE).
  *
  * Type surface (descr -> Spark, mirroring the Arrow/parquet unsigned
  * conventions used across this package):
  *  - `b1`->boolean; `i1/i2/i4/i8`->byte/short/int/long;
  *    `u1`->short, `u2`->int, `u4`->long, `u8`->DECIMAL(20,0);
  *    `f4/f8`->float/double (both byte orders throughout);
  *  - `S<n>` fixed bytes -> string (UTF-8, trailing NULs trimmed);
  *    `U<n>` fixed UTF-32 -> string (trailing NUL code points trimmed);
  *  - `M8[s|ms|us|ns]` -> timestamp_ntz (ns floor-divides to micros,
  *    the Arrow convention; `NaT` = Long.MinValue -> null);
  *    `M8[D]` -> date.
  *  - structured (record) dtypes in packed list form -> one column per
  *    field; the aligned/offset dict form, subarray fields, nested
  *    records, `f2`, `m8`, object and complex dtypes are rejected with
  *    clear errors (never silently misread).
  *
  * Shapes: 1-D -> a single `value` column; (n, d) matrices -> one
  * `value` array column per row (Fortran order read with d strided
  * range reads per task); structured arrays must be 1-D.
  *
  * Scale shape: `.npy` rows are fixed width, so executors read
  * disjoint row ranges with positioned reads (the FITS contract; task
  * buffers capped at 256 MiB regardless of row width). STORED `.npz`
  * members sit at known offsets and read the same way, row-aligned
  * across members; DEFLATE members are not splittable — that path
  * inflates whole members in a single task and is a documented
  * convenience regime (`np.savez`'s STORED default and
  * [[toNpySharded]] are the scale paths).
  */
object Npy {

  /** One scalar dtype: type-code char, byte width (per item; for U the
    * code-point count is `bytes/4`), byte order, datetime unit. */
  final case class NpyDtype(code: Char, bytes: Int, little: Boolean, unit: String) {
    def sparkType: DataType = code match {
      case 'b' => BooleanType
      case 'i' => bytes match {
        case 1 => ByteType
        case 2 => ShortType
        case 4 => IntegerType
        case 8 => LongType
      }
      case 'u' => bytes match {
        case 1 => ShortType
        case 2 => IntegerType
        case 4 => LongType
        case 8 => DecimalType(20, 0)
      }
      case 'f' => if (bytes == 4) FloatType else DoubleType
      case 'S' | 'U' => StringType
      case 'M' => if (unit == "D") DateType else TimestampNTZType
    }
  }

  final case class NpyField(name: String, dt: NpyDtype, offset: Int)

  /** Parsed header of one array: fields (a single synthetic `value`
    * field for plain dtypes), per-item byte width, shape, order flag
    * and the offset of the first data byte (absolute in the file for
    * plain/STORED reads; member-relative for inflated members). */
  final case class NpyMeta(fields: Seq[NpyField], itemBytes: Int,
                           shape: Seq[Long], fortran: Boolean,
                           dataStart: Long, structured: Boolean) {
    def nRows: Long = shape.head
    def rowElems: Int = if (shape.size == 2) shape(1).toInt else 1
    def rowBytes: Long = itemBytes.toLong * rowElems
  }

  private val Magic = Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y')
  private val MaxHeader = 1 << 20
  private val MaxTaskBuf = 1L << 28 // 256 MiB per positioned-read slab

  // ------------------------------------------------------------ byte sources

  /** Positioned-read abstraction: a Hadoop file ([[FsIO.In]]) or an
    * in-memory inflated npz member. */
  private[sources] sealed trait DataIn extends AutoCloseable {
    def length: Long
    def seek(addr: Long): Unit
    def readFully(b: Array[Byte]): Unit
  }

  private[sources] final class FileIn(path: String) extends DataIn {
    private val in = new FsIO.In(path)
    def length: Long = in.length
    def seek(addr: Long): Unit = in.seek(addr)
    def readFully(b: Array[Byte]): Unit = in.readFully(b)
    def close(): Unit = in.close()
  }

  private[sources] final class BytesIn(bytes: Array[Byte]) extends DataIn {
    private var p = 0L
    def length: Long = bytes.length.toLong
    def seek(addr: Long): Unit = p = addr
    def readFully(b: Array[Byte]): Unit = {
      require(p >= 0 && p + b.length <= bytes.length, "read past end of member")
      System.arraycopy(bytes, p.toInt, b, 0, b.length); p += b.length
    }
    def close(): Unit = ()
  }

  // ------------------------------------------------------------ header parse

  /** `<f8` / `>u4` / `|S7` / `<M8[us]` -> dtype. */
  private[sources] def parseDescr(s: String, ctx: String): NpyDtype = {
    require(s.length >= 2, s"$ctx: malformed descr '$s'")
    val (endc, rest) = (s.head, s.tail)
    require("<>|=".contains(endc), s"$ctx: malformed descr '$s'")
    val little = endc != '>' // '=' is only written on native (little) platforms
    rest.head match {
      case 'b' =>
        require(rest == "b1", s"$ctx: unsupported bool descr '$s'")
        NpyDtype('b', 1, little, "")
      case c @ ('i' | 'u' | 'f') =>
        val n = rest.tail
        require(Set("1", "2", "4", "8").contains(n), s"$ctx: unsupported descr '$s'")
        require(!(c == 'f' && (n == "1" || n == "2")),
          s"$ctx: unsupported float descr '$s' (f2 half precision not decoded)")
        NpyDtype(c, n.toInt, little, "")
      case c @ ('S' | 'U') =>
        val n = rest.tail
        require(n.nonEmpty && n.length <= 7 && n.forall(_.isDigit) && n.toInt >= 1,
          s"$ctx: unsupported string descr '$s'")
        require(n.toInt <= (1 << 20), s"$ctx: implausible string width in '$s'")
        NpyDtype(c, if (c == 'U') n.toInt * 4 else n.toInt, little, "")
      case 'M' =>
        // '<M8[us]' — a unit is required (unit-less datetime64 has no
        // defined epoch scale to decode by)
        val m = "M8\\[(s|ms|us|ns|D)\\]".r
        rest match {
          case m(u) => NpyDtype('M', 8, little, u)
          case _ => throw new IllegalArgumentException(
            s"$ctx: unsupported datetime descr '$s' (units s/ms/us/ns/D)")
        }
      case 'm' => throw new IllegalArgumentException(
        s"$ctx: timedelta64 ('$s') is unsupported")
      case _ => throw new IllegalArgumentException(
        s"$ctx: unsupported descr '$s'")
    }
  }

  /** Parse the python-dict header text. Values are located by key (not
    * a full python parser): `descr` is either a quoted string or a
    * packed list of `('name', 'descr')` tuples; anything else —
    * aligned dict-form dtypes, subarray shapes, nested records — is
    * rejected, never misread. Returns (fields, itemBytes, fortran,
    * shape, structured). */
  private[sources] def parseHeader(header: String, ctx: String)
      : (Seq[NpyField], Int, Boolean, Seq[Long], Boolean) = {
    // locate a key's value at/after `from`: numpy writes the dict keys
    // in the order descr, fortran_order, shape, so parsing descr FIRST
    // and searching the later keys past its value keeps a structured
    // FIELD named 'shape'/'fortran_order' from shadowing the real key
    def valueStart(key: String, from: Int): Int = {
      val i = header.indexOf(s"'$key'", from)
      require(i >= 0, s"$ctx: header missing '$key'")
      val colon = header.indexOf(':', i)
      require(colon > 0, s"$ctx: malformed header")
      var j = colon + 1
      while (j < header.length && header(j) == ' ') j += 1
      require(j < header.length, s"$ctx: malformed header")
      j
    }
    val ds = valueStart("descr", 0)
    val (fields, itemBytes, structured, descrEnd) = header(ds) match {
      case '\'' =>
        val end = header.indexOf('\'', ds + 1)
        require(end > ds, s"$ctx: malformed descr")
        val dt = parseDescr(header.substring(ds + 1, end), ctx)
        (Seq(NpyField("value", dt, 0)), dt.bytes, false, end + 1)
      case '[' =>
        var depth = 0
        var end = -1
        var k = ds
        while (end < 0 && k < header.length) {
          header(k) match {
            case '[' => depth += 1
            case ']' => depth -= 1; if (depth == 0) end = k
            case _ =>
          }
          k += 1
        }
        require(end > ds, s"$ctx: malformed structured descr")
        val list = header.substring(ds + 1, end)
        val tup = "\\('([^']+)'\\s*,\\s*'([^']+)'\\)".r
        val fs = scala.collection.mutable.ArrayBuffer[NpyField]()
        var off = 0
        tup.findAllMatchIn(list).foreach { m =>
          val dt = parseDescr(m.group(2), s"$ctx.${m.group(1)}")
          fs += NpyField(m.group(1), dt, off)
          off += dt.bytes
        }
        // everything the tuple regex did not consume must be list
        // plumbing — leftover structure means a subarray-shaped or
        // nested field the regex skipped, which would silently shift
        // every following offset
        val residue = tup.replaceAllIn(list, "")
        require(residue.forall(c => c == ',' || c == ' ' || c == '\n'),
          s"$ctx: unsupported structured descr (subarray/nested/aligned fields)")
        require(fs.nonEmpty, s"$ctx: empty structured descr")
        require(fs.map(_.name).distinct.size == fs.size,
          s"$ctx: duplicate field names")
        (fs.toSeq, off, true, end + 1)
      case '{' => throw new IllegalArgumentException(
        s"$ctx: aligned/offset (dict-form) dtypes are unsupported")
      case _ => throw new IllegalArgumentException(s"$ctx: malformed descr")
    }
    val fo = valueStart("fortran_order", descrEnd)
    val fortran = header.startsWith("True", fo)
    require(fortran || header.startsWith("False", fo),
      s"$ctx: malformed fortran_order")
    val sh = valueStart("shape", descrEnd)
    require(header(sh) == '(', s"$ctx: malformed shape")
    val shEnd = header.indexOf(')', sh)
    require(shEnd > sh, s"$ctx: malformed shape")
    val shape = header.substring(sh + 1, shEnd).split(",").iterator
      .map(_.trim).filter(_.nonEmpty).map { t =>
        require(t.nonEmpty && t.length <= 18 && t.forall(_.isDigit),
          s"$ctx: malformed shape dim '$t'")
        t.toLong
      }.toSeq
    require(shape.nonEmpty && shape.size <= 2,
      s"$ctx: unsupported ndim ${shape.size} (1-D and 2-D only)")
    require(!structured || shape.size == 1,
      s"$ctx: structured arrays must be 1-D (shape has ${shape.size} dims)")
    (fields, itemBytes, fortran, shape, structured)
  }

  /** Read and parse one npy header starting at `base`. `avail` bounds
    * the bytes readable through `in` (header must fit); `dataLimit`
    * bounds where the array data may end (for a DEFLATE member parsed
    * from an inflated prefix, that is the member's declared
    * uncompressed size, not the prefix length). */
  private[sources] def readMeta(in: DataIn, base: Long, avail: Long,
                                dataLimit: Long, ctx: String): NpyMeta = {
    require(avail - base >= 10, s"$ctx: not an npy file (too short)")
    val head = new Array[Byte](math.min(12L, avail - base).toInt)
    in.seek(base); in.readFully(head)
    require(head.length >= 10 && head.take(6).sameElements(Magic),
      s"$ctx: not an npy file (bad magic)")
    val major = head(6) & 0xff
    require(major >= 1 && major <= 3, s"$ctx: unsupported npy version $major")
    val bb = ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN)
    val (hlen, hstart) =
      if (major == 1) ((bb.getShort(8) & 0xffff).toLong, base + 10L)
      else {
        require(head.length >= 12, s"$ctx: truncated npy header")
        (bb.getInt(8) & 0xffffffffL, base + 12L)
      }
    require(hlen >= 1 && hlen <= MaxHeader, s"$ctx: implausible header length $hlen")
    require(hstart + hlen <= avail, s"$ctx: header overruns file")
    val hbytes = new Array[Byte](hlen.toInt)
    in.seek(hstart); in.readFully(hbytes)
    val (fields, itemBytes, fortran, shape, structured) =
      parseHeader(new String(hbytes, "UTF-8"), ctx)
    require(itemBytes >= 1, s"$ctx: zero-width dtype")
    val meta = NpyMeta(fields, itemBytes, shape, fortran, hstart + hlen, structured)
    if (shape.size == 2)
      require(shape(1) <= (1 << 20), s"$ctx: implausible row width ${shape(1)}")
    val need =
      try Math.multiplyExact(meta.rowBytes, meta.nRows)
      catch { case _: ArithmeticException =>
        throw new IllegalArgumentException(s"$ctx: implausible array size") }
    require(meta.dataStart + need <= dataLimit,
      s"$ctx: data truncated (need $need bytes past offset ${meta.dataStart}, file ends at $dataLimit)")
    meta
  }

  // ------------------------------------------------------------ value decode

  /** Decode one scalar at `off`; `bbLE`/`bbBE` wrap the same buffer in
    * both orders so mixed-endian structured fields stay cheap. `java8`
    * picks the DateType external class per
    * spark.sql.datetime.java8API.enabled. */
  private def decode(buf: Array[Byte], bbLE: ByteBuffer, bbBE: ByteBuffer,
                     off: Int, dt: NpyDtype, java8: Boolean): Any = {
    val bb = if (dt.little) bbLE else bbBE
    dt.code match {
      case 'b' => java.lang.Boolean.valueOf(buf(off) != 0)
      case 'i' => dt.bytes match {
        case 1 => java.lang.Byte.valueOf(buf(off))
        case 2 => java.lang.Short.valueOf(bb.getShort(off))
        case 4 => java.lang.Integer.valueOf(bb.getInt(off))
        case 8 => java.lang.Long.valueOf(bb.getLong(off))
      }
      case 'u' => dt.bytes match {
        case 1 => java.lang.Short.valueOf((buf(off) & 0xff).toShort)
        case 2 => java.lang.Integer.valueOf(bb.getShort(off) & 0xffff)
        case 4 => java.lang.Long.valueOf(bb.getInt(off) & 0xffffffffL)
        case 8 =>
          val v = bb.getLong(off)
          val bi =
            if (v >= 0) java.math.BigInteger.valueOf(v)
            else java.math.BigInteger.valueOf(v & Long.MaxValue).setBit(63)
          new java.math.BigDecimal(bi)
      }
      case 'f' =>
        if (dt.bytes == 4) java.lang.Float.valueOf(bb.getFloat(off))
        else java.lang.Double.valueOf(bb.getDouble(off))
      case 'S' =>
        var len = dt.bytes
        while (len > 0 && buf(off + len - 1) == 0) len -= 1
        new String(buf, off, len, "UTF-8")
      case 'U' =>
        val n = dt.bytes / 4
        var len = n
        while (len > 0 && bb.getInt(off + (len - 1) * 4) == 0) len -= 1
        val sb = new java.lang.StringBuilder(len + 2)
        var i = 0
        while (i < len) {
          sb.appendCodePoint(bb.getInt(off + i * 4)); i += 1
        }
        sb.toString
      case 'M' =>
        val v = bb.getLong(off)
        if (v == Long.MinValue) null // NaT
        else if (dt.unit == "D") {
          val ld = java.time.LocalDate.ofEpochDay(v)
          if (java8) ld else java.sql.Date.valueOf(ld)
        } else {
          val us = dt.unit match {
            case "s" => Math.multiplyExact(v, 1000000L)
            case "ms" => Math.multiplyExact(v, 1000L)
            case "us" => v
            case "ns" => Math.floorDiv(v, 1000L)
          }
          java.time.LocalDateTime.ofEpochSecond(
            Math.floorDiv(us, 1000000L),
            (Math.floorMod(us, 1000000L) * 1000L).toInt,
            java.time.ZoneOffset.UTC)
        }
    }
  }

  private def sparkFieldType(meta: NpyMeta, f: NpyField): DataType =
    // datetime matrices can carry NaT -> null ELEMENTS; declaring
    // containsNull=false there would let codegen'd consumers read the
    // unset slot as epoch garbage instead of null
    if (meta.shape.size == 2)
      ArrayType(f.dt.sparkType, containsNull = f.dt.code == 'M')
    else f.dt.sparkType

  // ------------------------------------------------------------ npy read

  /** Distributed read of one `.npy` file: executors read disjoint row
    * ranges with positioned reads. `columns` prunes structured fields. */
  def fromNpy(spark: SparkSession, path: String, columns: Seq[String] = Nil,
              numPartitions: Int = 0): DataFrame = {
    val meta = {
      val in = new FileIn(path)
      try readMeta(in, 0L, in.length, in.length, path) finally in.close()
    }
    val fields = selectFields(meta, columns, path)
    val schema = StructType(fields.map(f =>
      StructField(f.name, sparkFieldType(meta, f), nullable = f.dt.code == 'M')))
    val java8 = spark.conf.get("spark.sql.datetime.java8API.enabled", "false").toBoolean
    val rows = rangeRdd(spark, meta.nRows, meta.rowBytes, numPartitions)
      .mapPartitions { it =>
        val in = new FileIn(path)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
        it.flatMap { case (s, e) => decodeRange(in, meta, fields, s, e, java8) }
      }
    spark.createDataFrame(rows, schema)
  }

  private def selectFields(meta: NpyMeta, columns: Seq[String], ctx: String): Seq[NpyField] =
    if (columns.isEmpty) meta.fields
    else {
      val byName = meta.fields.map(f => f.name -> f).toMap
      columns.map(c => byName.getOrElse(c,
        throw new IllegalArgumentException(s"$ctx: no such npy field: $c")))
    }

  /** Row ranges sized by default parallelism AND capped so one range's
    * slab stays under [[MaxTaskBuf]] — a 1e9-row narrow file must not
    * hand one task a multi-GiB allocation. */
  private def rangeRdd(spark: SparkSession, n: Long, rowBytes: Long,
                       numPartitions: Int) = {
    val byteCap = math.max(1L, MaxTaskBuf / math.max(1L, rowBytes))
    val parts = if (numPartitions > 0) numPartitions
    else math.max(1, math.min(spark.sparkContext.defaultParallelism,
      (n / 65536 + 1).toInt))
    val step = math.min(byteCap, math.max(1L, (n + parts - 1) / math.max(parts, 1)))
    val ranges = (0L until n by step).map(s => (s, math.min(s + step, n)))
    spark.sparkContext.parallelize(ranges, math.max(ranges.size, 1))
  }

  /** Decode rows [s, e) of one array into external Rows. C order reads
    * one contiguous slice; a Fortran (n, d) matrix reads d strided
    * column slices (still positioned reads, one per column). */
  private def decodeRange(in: DataIn, meta: NpyMeta, fields: Seq[NpyField],
                          s: Long, e: Long, java8: Boolean): Iterator[Row] = {
    val count = (e - s).toInt
    val d = meta.rowElems
    val item = meta.itemBytes
    if (meta.shape.size == 2 && meta.fortran) {
      // column j of rows [s,e) lives at dataStart + (j*n + s)*item
      val n = meta.nRows
      val colBuf = Array.ofDim[Byte](d, count * item)
      var j = 0
      while (j < d) {
        in.seek(meta.dataStart + (j * n + s) * item)
        in.readFully(colBuf(j))
        j += 1
      }
      val les = colBuf.map(b => ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN))
      val bes = colBuf.map(b => ByteBuffer.wrap(b).order(ByteOrder.BIG_ENDIAN))
      val dt = fields.head.dt
      (0 until count).iterator.map { r =>
        Row(Seq.tabulate(d)(j => decode(colBuf(j), les(j), bes(j), r * item, dt, java8)))
      }
    } else {
      val rowB = meta.rowBytes.toInt // ranges are byte-capped (rangeRdd)
      val buf = new Array[Byte](count * rowB)
      in.seek(meta.dataStart + s * meta.rowBytes)
      in.readFully(buf)
      val le = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
      val be = ByteBuffer.wrap(buf).order(ByteOrder.BIG_ENDIAN)
      if (meta.shape.size == 2) {
        val dt = fields.head.dt
        (0 until count).iterator.map { r =>
          Row(Seq.tabulate(d)(j => decode(buf, le, be, r * rowB + j * item, dt, java8)))
        }
      } else
        (0 until count).iterator.map { r =>
          Row.fromSeq(fields.map(f => decode(buf, le, be, r * rowB + f.offset, f.dt, java8)))
        }
    }
  }

  // ------------------------------------------------------------ npz read

  /** One zip member: compression method 0 (STORED) or 8 (DEFLATE). */
  private[sources] final case class ZipEntryMeta(name: String, method: Int,
                                                 dataOff: Long, compSize: Long,
                                                 uncompSize: Long)

  /** Parse the zip central directory (the authoritative index — local
    * headers may carry zeroed sizes under the streaming data-descriptor
    * convention). Zip64 markers are rejected with a clear error. */
  private[sources] def zipDirectory(in: DataIn, ctx: String): Seq[ZipEntryMeta] = {
    val len = in.length
    require(len >= 22, s"$ctx: not a zip archive (too short)")
    val tail = math.min(len, 66000L).toInt
    val buf = new Array[Byte](tail)
    in.seek(len - tail); in.readFully(buf)
    // LAST EOCD signature wins (member bytes could embed the pattern)
    var eocd = -1
    var i = tail - 22
    while (i >= 0 && eocd < 0) {
      if (buf(i) == 'P' && buf(i + 1) == 'K' && buf(i + 2) == 5 && buf(i + 3) == 6)
        eocd = i
      else i -= 1
    }
    require(eocd >= 0, s"$ctx: not a zip archive (no end-of-central-directory)")
    val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
    val nEntries = bb.getShort(eocd + 10) & 0xffff
    val cdSize = bb.getInt(eocd + 12) & 0xffffffffL
    val cdOff = bb.getInt(eocd + 16) & 0xffffffffL
    require(cdOff != 0xffffffffL && nEntries != 0xffff,
      s"$ctx: zip64 archives are unsupported")
    require(cdOff + cdSize <= len && cdSize <= 4L * MaxHeader,
      s"$ctx: implausible central directory")
    val cd = new Array[Byte](cdSize.toInt)
    in.seek(cdOff); in.readFully(cd)
    val cb = ByteBuffer.wrap(cd).order(ByteOrder.LITTLE_ENDIAN)
    var p = 0
    (0 until nEntries).map { _ =>
      require(p + 46 <= cd.length && cb.getInt(p) == 0x02014b50,
        s"$ctx: malformed central directory entry")
      val method = cb.getShort(p + 10) & 0xffff
      val compSize = cb.getInt(p + 20) & 0xffffffffL
      val uncompSize = cb.getInt(p + 24) & 0xffffffffL
      val nameLen = cb.getShort(p + 28) & 0xffff
      val extraLen = cb.getShort(p + 30) & 0xffff
      val commentLen = cb.getShort(p + 32) & 0xffff
      val localOff = cb.getInt(p + 42) & 0xffffffffL
      require(compSize != 0xffffffffL && uncompSize != 0xffffffffL
        && localOff != 0xffffffffL, s"$ctx: zip64 member sizes are unsupported")
      require(p + 46 + nameLen <= cd.length, s"$ctx: malformed zip entry name")
      val name = new String(cd, p + 46, nameLen, "UTF-8")
      // data offset needs the LOCAL header's own name/extra lengths
      // (the central copy's extra field can differ in length)
      require(localOff + 30 <= len, s"$ctx: local header overruns file")
      val lh = new Array[Byte](30)
      in.seek(localOff); in.readFully(lh)
      val lb = ByteBuffer.wrap(lh).order(ByteOrder.LITTLE_ENDIAN)
      require(lb.getInt(0) == 0x04034b50, s"$ctx: bad local header for $name")
      val dataOff = localOff + 30 + (lb.getShort(26) & 0xffff) + (lb.getShort(28) & 0xffff)
      require(dataOff + compSize <= len, s"$ctx: member $name overruns file")
      p += 46 + nameLen + extraLen + commentLen
      ZipEntryMeta(name, method, dataOff, compSize, uncompSize)
    }
  }

  /** Inflate up to `outCap` bytes from a raw-DEFLATE byte slice. */
  private def inflate(comp: Array[Byte], outCap: Int, ctx: String): Array[Byte] = {
    val inf = new Inflater(true)
    try {
      inf.setInput(comp)
      val out = new Array[Byte](outCap)
      var done = 0
      var stalled = false
      while (done < out.length && !inf.finished() && !stalled) {
        val k = inf.inflate(out, done, out.length - done)
        if (k == 0) {
          require(!inf.needsDictionary, s"$ctx: preset-dictionary DEFLATE unsupported")
          // needs more input than the slice holds: legitimate when the
          // caller only wanted a prefix, an error when it wanted it all
          stalled = true
        } else done += k
      }
      if (done < outCap && !inf.finished())
        require(stalled, s"$ctx: corrupt DEFLATE stream")
      java.util.Arrays.copyOf(out, done)
    } finally inf.end()
  }

  /** Read an `.npz` archive as a DataFrame: each `<name>.npy` member
    * becomes column `<name>` (1-D scalar or (n, d) array column);
    * members must agree on the leading dimension and rows stay
    * aligned. All-STORED archives (np.savez) read distributed; any
    * DEFLATE member (np.savez_compressed) drops to a single-task
    * whole-archive decode with a 2 GiB per-member guard. */
  def fromNpz(spark: SparkSession, path: String, columns: Seq[String] = Nil,
              numPartitions: Int = 0): DataFrame = {
    val in = new FileIn(path)
    val (entries, metas) = try {
      val all = zipDirectory(in, path).filter(_.name.endsWith(".npy"))
      require(all.nonEmpty, s"$path: no .npy members in archive")
      val wanted =
        if (columns.isEmpty) all
        else {
          val byName = all.map(e => e.name.stripSuffix(".npy") -> e).toMap
          columns.map(c => byName.getOrElse(c,
            throw new IllegalArgumentException(s"$path: no such npz member: $c")))
        }
      val ms = wanted.map { e =>
        val ctx = s"$path!${e.name}"
        e.method match {
          case 0 =>
            readMeta(in, e.dataOff, e.dataOff + e.compSize, e.dataOff + e.compSize, ctx)
          case 8 =>
            // header-only: inflate a compressed prefix and validate
            // data size against the member's DECLARED uncompressed
            // length. A large header (e.g. a structured descr near the
            // MaxHeader cap) can compress to more than the first-guess
            // prefix — grow geometrically until it parses. The cap is
            // sized so a header of MaxHeader bytes fits even stored
            // (incompressible) inside the DEFLATE stream.
            val cap = math.min(e.compSize, 2L * (MaxHeader + 4096)).toInt
            var size = math.min(cap.toLong, 1L << 16).toInt
            var res: NpyMeta = null
            while (res == null) {
              val compHead = new Array[Byte](size)
              in.seek(e.dataOff); in.readFully(compHead)
              val prefix = inflate(compHead, MaxHeader + 4096, ctx)
              try res = readMeta(
                new BytesIn(prefix), 0L, prefix.length.toLong, e.uncompSize, ctx)
              catch {
                case _: IllegalArgumentException if size < cap =>
                  size = math.min(cap.toLong, size.toLong * 4).toInt
              }
            }
            res
          case m => throw new IllegalArgumentException(
            s"$ctx: unsupported zip compression method $m")
        }
      }
      (wanted, ms)
    } finally in.close()
    entries.zip(metas).foreach { case (e, m) =>
      require(!m.structured,
        s"$path!${e.name}: structured members unsupported in npz (read the member via fromNpy semantics instead)")
    }
    val ns = metas.map(_.nRows).distinct
    require(ns.size == 1, s"$path: npz members disagree on row count ($ns)")
    val n = ns.head
    val schema = StructType(entries.zip(metas).map { case (e, m) =>
      StructField(e.name.stripSuffix(".npy"), sparkFieldType(m, m.fields.head),
        nullable = m.fields.head.dt.code == 'M')
    })
    val java8 = spark.conf.get("spark.sql.datetime.java8API.enabled", "false").toBoolean

    if (entries.forall(_.method == 0)) {
      val maxRow = metas.map(_.rowBytes).max
      val rows = rangeRdd(spark, n, maxRow * metas.size, numPartitions).mapPartitions { it =>
        val fin = new FileIn(path)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => fin.close()))
        it.flatMap { case (s, e) =>
          val cols = metas.map(m => decodeRange(fin, m, m.fields, s, e, java8).toArray)
          (0 until (e - s).toInt).iterator.map { r =>
            Row.fromSeq(cols.map(c => c(r).get(0)))
          }
        }
      }
      spark.createDataFrame(rows, schema)
    } else {
      // DEFLATE regime (np.savez_compressed): the format forbids
      // intra-member splits (a DEFLATE stream has no random access),
      // but N members still decode in N INDEPENDENT tasks — one task
      // inflates one whole member into (row, value) pairs, and a
      // single shuffle zips the columns back into rows by row index.
      // A single-member archive skips the shuffle entirely (it is
      // necessarily one decode task). np.savez STORED remains the
      // scale form (distributed range reads, no shuffle).
      val k = entries.size
      val pathB = path
      val java8B = java8
      if (k == 1) {
        val (e0, m0) = (entries.head, metas.head)
        val rows = spark.sparkContext.parallelize(Seq(0), 1).mapPartitions { _ =>
          decodeWholeMember(pathB, e0, m0, java8B).iterator
            .map(v => Row.fromSeq(Seq(v.get(0))))
        }
        spark.createDataFrame(rows, schema)
      } else {
        val memberRdds = entries.zip(metas).zipWithIndex.map { case ((e0, m0), j) =>
          spark.sparkContext.parallelize(Seq(j), 1).mapPartitions { _ =>
            decodeWholeMember(pathB, e0, m0, java8B).iterator.zipWithIndex
              .map { case (v, r) => (r.toLong, (j, v.get(0))) }
          }
        }
        val width = math.max(k, spark.sparkContext.defaultParallelism)
        val rows = spark.sparkContext.union(memberRdds)
          .groupByKey(width)
          .map { case (_, vs) =>
            val arr = new Array[Any](k)
            vs.foreach { case (j, v) => arr(j) = v }
            Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(arr))
          }
        spark.createDataFrame(rows, schema)
      }
    }
  }

  /** Inflate and decode one whole npz member (executor-side; an
    * OBJECT method, not a local def — local defs close over the
    * enclosing `Npy$` instance and fail closure serialization).
    * Returns one single-field Row per row of the member. */
  private def decodeWholeMember(path: String, e: ZipEntryMeta, m: NpyMeta,
                                java8: Boolean): Array[Row] = {
    val fin = new FileIn(path)
    try {
      val ctx = s"$path!${e.name}"
      require(e.uncompSize <= Int.MaxValue.toLong,
        s"$ctx: member too large for the DEFLATE path")
      val comp = new Array[Byte](e.compSize.toInt)
      fin.seek(e.dataOff); fin.readFully(comp)
      val raw =
        if (e.method == 0) comp
        else {
          val out = inflate(comp, e.uncompSize.toInt, ctx)
          require(out.length == e.uncompSize.toInt,
            s"$ctx: short DEFLATE stream (${out.length} of ${e.uncompSize})")
          out
        }
      // STORED members' metas were parsed at their absolute file
      // offset; the buffer here is member-relative — rebase
      val mRel =
        if (e.method == 0) m.copy(dataStart = m.dataStart - e.dataOff) else m
      decodeRange(new BytesIn(raw), mRel, mRel.fields, 0L, mRel.nRows, java8).toArray
    } finally fin.close()
  }

  // ------------------------------------------------------------ write

  /** Element dtype for a matrix column — string matrices have no
    * measured width path and are rejected up front. */
  private def matrixDtype(name: String, et: DataType): NpyDtype = {
    require(et != StringType,
      s"npy export: string matrix column $name unsupported (scalar string columns only)")
    outDtype(name, et, 1)
  }

  private def outDtype(name: String, t: DataType, strWidth: Int): NpyDtype = t match {
    case BooleanType => NpyDtype('b', 1, little = true, "")
    case ByteType => NpyDtype('i', 1, little = true, "")
    case ShortType => NpyDtype('i', 2, little = true, "")
    case IntegerType => NpyDtype('i', 4, little = true, "")
    case LongType => NpyDtype('i', 8, little = true, "")
    case FloatType => NpyDtype('f', 4, little = true, "")
    case DoubleType => NpyDtype('f', 8, little = true, "")
    case StringType => NpyDtype('U', math.max(1, strWidth) * 4, little = true, "")
    case TimestampNTZType => NpyDtype('M', 8, little = true, "us")
    case DateType => NpyDtype('M', 8, little = true, "D")
    case other => throw new IllegalArgumentException(
      s"npy export: unsupported type $other for column $name")
  }

  private def descrOf(dt: NpyDtype): String = dt.code match {
    case 'b' => "|b1"
    case 'U' => s"<U${dt.bytes / 4}"
    case 'M' => s"<M8[${dt.unit}]"
    case c => (if (dt.bytes == 1) "|" else "<") + c + dt.bytes
  }

  /** numpy-format header for shape (n,) or (n, d): v1 when the padded
    * dict fits a u16 length, else v2. */
  private[sources] def headerBytes(descr: String, n: Long, d: Int): Array[Byte] = {
    val shape = if (d > 0) s"($n, $d)" else s"($n,)"
    val dict = s"{'descr': $descr, 'fortran_order': False, 'shape': $shape, }"
    def padded(prefix: Int): Array[Byte] = {
      val total0 = prefix + dict.length + 1
      val pad = (64 - total0 % 64) % 64
      (dict + (" " * pad) + "\n").getBytes("US-ASCII")
    }
    val v1Body = padded(10)
    if (v1Body.length <= 0xffff) {
      val out = ByteBuffer.allocate(10 + v1Body.length).order(ByteOrder.LITTLE_ENDIAN)
      out.put(Magic).put(1.toByte).put(0.toByte).putShort(v1Body.length.toShort)
      out.put(v1Body)
      out.array()
    } else {
      val v2Body = padded(12)
      val out = ByteBuffer.allocate(12 + v2Body.length).order(ByteOrder.LITTLE_ENDIAN)
      out.put(Magic).put(2.toByte).put(0.toByte).putInt(v2Body.length)
      out.put(v2Body)
      out.array()
    }
  }

  /** Encode one non-null value at `off` per `dt` (always
    * little-endian on the write side). */
  private def encode(out: Array[Byte], bb: ByteBuffer, off: Int, dt: NpyDtype, v: Any): Unit =
    dt.code match {
      case 'b' => out(off) = if (v.asInstanceOf[Boolean]) 1 else 0
      case 'i' => dt.bytes match {
        case 1 => out(off) = v.asInstanceOf[Byte]
        case 2 => bb.putShort(off, v.asInstanceOf[Short])
        case 4 => bb.putInt(off, v.asInstanceOf[Int])
        case 8 => bb.putLong(off, v.asInstanceOf[Long])
      }
      case 'f' =>
        if (dt.bytes == 4) bb.putFloat(off, v.asInstanceOf[Float])
        else bb.putDouble(off, v.asInstanceOf[Double])
      case 'U' =>
        val s = v.asInstanceOf[String]
        val nCp = dt.bytes / 4
        var i = 0
        var cp = 0
        while (i < s.length) {
          val c = s.codePointAt(i)
          require(cp < nCp, s"npy export: string wider than measured width $nCp")
          bb.putInt(off + cp * 4, c)
          cp += 1
          i += Character.charCount(c)
        }
        while (cp < nCp) { bb.putInt(off + cp * 4, 0); cp += 1 }
      case 'M' if dt.unit == "D" =>
        val days = v match {
          case d: java.sql.Date => d.toLocalDate.toEpochDay
          case ld: java.time.LocalDate => ld.toEpochDay
        }
        bb.putLong(off, days)
      case 'M' =>
        val ldt = v.asInstanceOf[java.time.LocalDateTime]
        val us = Math.addExact(
          Math.multiplyExact(ldt.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L),
          (ldt.getNano / 1000).toLong)
        bb.putLong(off, us)
    }

  /** Geometry stats in ONE aggregation pass: row count, max string
    * code-point widths (Spark `length()` counts code points — exactly
    * the U width), fixed array lengths (npy rows are fixed width; a
    * ragged array column cannot be represented). */
  private[sources] def geometry(df: DataFrame,
      ctx: String = "npy export"): (Long, Map[String, Int], Map[String, Int]) = {
    import org.apache.spark.sql.functions._
    val schema = df.schema
    val aggs = count(lit(1)).as("__n") +: schema.fields.toSeq.flatMap {
      case f if f.dataType == StringType =>
        Seq(coalesce(max(length(col(f.name))), lit(1)).as(s"__w_${f.name}"))
      case f if f.dataType.isInstanceOf[ArrayType] =>
        Seq(coalesce(min(size(col(f.name))), lit(0)).as(s"__amin_${f.name}"),
          coalesce(max(size(col(f.name))), lit(0)).as(s"__amax_${f.name}"))
      case _ => Nil
    }
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val widths = schema.fields.toSeq.collect {
      case f if f.dataType == StringType =>
        f.name -> math.max(1, stats.getAs[Number](s"__w_${f.name}").intValue())
    }.toMap
    val arrayLens = schema.fields.toSeq.collect {
      case f if f.dataType.isInstanceOf[ArrayType] =>
        val lo = stats.getAs[Number](s"__amin_${f.name}").intValue()
        val hi = stats.getAs[Number](s"__amax_${f.name}").intValue()
        require(lo == hi && hi >= 1,
          s"$ctx: array column ${f.name} must have one fixed length (saw $lo..$hi)")
        f.name -> hi
    }.toMap
    (stats.getLong(0), widths, arrayLens)
  }

  /** Write one npy file: plain 1-D (single scalar column named
    * `value`; any other single column keeps its name via a 1-field
    * structured descr), (n, d) matrix (single fixed-length array
    * column — npy matrices are nameless, so a matrix column reads
    * back as `value`; use [[toNpz]] when the name matters) or a
    * structured record array (multiple scalar columns).
    * Driver-streamed via toLocalIterator after a single stats pass —
    * the single-file interchange sink; [[toNpySharded]] is the
    * distributed form. Nulls are rejected (numpy plain arrays have no
    * null representation; `fillna` first). */
  def toNpy(df: DataFrame, path: String): Unit = {
    val (n, widths, arrayLens) = geometry(df)
    val it = scala.jdk.CollectionConverters.IteratorHasAsScala(df.toLocalIterator()).asScala
    writeNpyFile(df.schema, n, widths, arrayLens, it, FsIO.create(path))
  }

  /** DISTRIBUTED npy export: each partition writes `part-NNNNN.npy`
    * (geometry resolved per shard via one executor-local spill pass —
    * the RowSpill contract, bounded heap on skewed partitions). Read
    * back with `open(s"$dir/part-*.npy")`. Stale shards cleared;
    * empty partitions skip. Returns the shard count. */
  def toNpySharded(df: DataFrame, dir: String): Int = {
    val schema = df.schema
    // fail on unsupported column types AND shapes on the driver,
    // before any task runs or stale shards are deleted (writeNpyFile
    // re-checks inside the task, but by then a full spill pass ran)
    if (schema.fields.exists(_.dataType.isInstanceOf[ArrayType]))
      require(schema.fields.length == 1,
        s"npy export: array column ${schema.fields.find(_.dataType.isInstanceOf[ArrayType]).get.name} must be the only column (matrix form)")
    schema.fields.foreach { f =>
      f.dataType match {
        case ArrayType(et, _) => matrixDtype(f.name, et)
        case t =>
          require(!f.name.exists("'()[]{}".contains(_)),
            s"npy export: unsupported character in column name ${f.name}")
          outDtype(f.name, t, 1)
      }
    }
    FsIO.mkdirs(dir)
    FsIO.deleteShards(dir, ".npy")
    df.rdd.mapPartitionsWithIndex { (pi, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val stringIdx = schema.fields.zipWithIndex.collect {
          case (f, fi) if f.dataType == StringType => (f.name, fi) }
        val arrayIdx = schema.fields.zipWithIndex.collect {
          case (f, fi) if f.dataType.isInstanceOf[ArrayType] => (f.name, fi) }
        val maxW = scala.collection.mutable.Map[String, Int]()
        val lenSets = scala.collection.mutable.Map[String, Set[Int]]()
        val (spillFile, n) = RowSpill.spill(schema, it.map { r =>
          stringIdx.foreach { case (nme, fi) =>
            if (!r.isNullAt(fi)) {
              val s = r.getString(fi)
              val w = s.codePointCount(0, s.length)
              if (w > maxW.getOrElse(nme, 0)) maxW(nme) = w
            }
          }
          arrayIdx.foreach { case (nme, fi) =>
            if (!r.isNullAt(fi))
              lenSets(nme) = lenSets.getOrElse(nme, Set.empty) + r.getSeq[Any](fi).length
          }
          r
        })
        try {
          val widths = stringIdx.map { case (nme, _) =>
            nme -> math.max(1, maxW.getOrElse(nme, 0)) }.toMap
          val arrayLens = arrayIdx.map { case (nme, _) =>
            val lens = lenSets.getOrElse(nme, Set.empty)
            require(lens.size <= 1 && lens.forall(_ >= 1),
              s"npy export: array column $nme must have one fixed length (saw $lens)")
            nme -> lens.headOption.getOrElse(1)
          }.toMap
          writeNpyFile(schema, n, widths, arrayLens,
            RowSpill.iterate(schema, spillFile),
            FsIO.create(f"$dir/part-$pi%05d.npy"))
        } finally spillFile.delete()
        Iterator.single(1)
      }
    }.count().toInt
  }

  /** Core single-file writer; closes `os`. */
  private def writeNpyFile(schema: StructType, n: Long,
                           widths: Map[String, Int], arrayLens: Map[String, Int],
                           rows: Iterator[Row], os: OutputStream): Unit = {
    val out = new BufferedOutputStream(os, 1 << 16)
    try {
      require(schema.fields.nonEmpty, "npy export: empty schema")
      val isMatrix = schema.fields.length == 1 &&
        schema.fields.head.dataType.isInstanceOf[ArrayType]
      if (isMatrix) {
        val f = schema.fields.head
        val et = f.dataType.asInstanceOf[ArrayType].elementType
        val dt = matrixDtype(f.name, et)
        val d = arrayLens.getOrElse(f.name, 1)
        out.write(headerBytes(s"'${descrOf(dt)}'", n, d))
        val rowBuf = new Array[Byte](dt.bytes * d)
        val bb = ByteBuffer.wrap(rowBuf).order(ByteOrder.LITTLE_ENDIAN)
        rows.foreach { r =>
          require(!r.isNullAt(0), s"npy export: null array in column ${f.name}")
          val seq = r.getSeq[Any](0)
          require(seq.length == d,
            s"npy export: ragged array column ${f.name} (${seq.length} != $d)")
          var j = 0
          seq.foreach { v =>
            require(v != null, s"npy export: null element in column ${f.name}")
            encode(rowBuf, bb, j * dt.bytes, dt, v); j += 1
          }
          out.write(rowBuf)
        }
      } else {
        val cols = schema.fields.toSeq.map { f =>
          require(!f.dataType.isInstanceOf[ArrayType],
            s"npy export: array column ${f.name} must be the only column (matrix form)")
          require(!f.name.exists("'()[]{}".contains(_)),
            s"npy export: unsupported character in column name ${f.name}")
          f.name -> outDtype(f.name, f.dataType, widths.getOrElse(f.name, 1))
        }
        // plain (nameless) 1-D form ONLY when the column already has
        // the reader's synthetic name — any other name round-trips
        // through a 1-field structured descr so export/open preserves
        // the schema instead of silently renaming to 'value'
        val descr =
          if (cols.sizeIs == 1 && cols.head._1 == "value")
            s"'${descrOf(cols.head._2)}'"
          else cols.map { case (nm, dt) => s"('$nm', '${descrOf(dt)}')" }
            .mkString("[", ", ", "]")
        val offsets = cols.scanLeft(0)(_ + _._2.bytes)
        val item = offsets.last
        out.write(headerBytes(descr, n, 0))
        val rowBuf = new Array[Byte](item)
        val bb = ByteBuffer.wrap(rowBuf).order(ByteOrder.LITTLE_ENDIAN)
        rows.foreach { r =>
          var i = 0
          while (i < cols.length) {
            val (nm, dt) = cols(i)
            require(!r.isNullAt(i),
              s"npy export: null in column $nm (numpy has no null; fillna first)")
            encode(rowBuf, bb, offsets(i), dt, r.get(i))
            i += 1
          }
          out.write(rowBuf)
        }
      }
    } finally out.close()
  }

  /** Write an `.npz` archive: one STORED `.npy` member per column
    * (np.savez layout — the splittable form [[fromNpz]] reads
    * distributed). One pass over the rows encodes every column into a
    * driver-local spool file; members then stream into the zip with
    * exact sizes and CRCs (no data-descriptor records needed). */
  def toNpz(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val (n, widths, arrayLens) = geometry(df)
    val cols = schema.fields.toSeq.zipWithIndex.map { case (f, i) =>
      require(!f.name.exists("'()[]{}/\\".contains(_)) && f.name.nonEmpty,
        s"npz export: unsupported column name ${f.name}")
      f.dataType match {
        case ArrayType(et, _) =>
          (f.name, i, matrixDtype(f.name, et), arrayLens.getOrElse(f.name, 1))
        case t => (f.name, i, outDtype(f.name, t, widths.getOrElse(f.name, 1)), 0)
      }
    }
    val spools = cols.map { case (name, _, _, _) =>
      java.io.File.createTempFile(s"npz_${name}_", ".npy")
    }
    try {
      val outs = spools.map(sf => new BufferedOutputStream(
        new java.io.FileOutputStream(sf), 1 << 16))
      try {
        val bufs = cols.map { case (_, _, dt, d) =>
          new Array[Byte](dt.bytes * math.max(1, d)) }
        val bbs = bufs.map(b => ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN))
        cols.zipWithIndex.foreach { case ((_, _, dt, d), ci) =>
          outs(ci).write(headerBytes(s"'${descrOf(dt)}'", n, d))
        }
        val it = scala.jdk.CollectionConverters.IteratorHasAsScala(df.toLocalIterator()).asScala
        it.foreach { r =>
          cols.zipWithIndex.foreach { case ((name, idx, dt, d), ci) =>
            require(!r.isNullAt(idx),
              s"npz export: null in column $name (numpy has no null; fillna first)")
            if (d > 0) {
              val seq = r.getSeq[Any](idx)
              require(seq.length == d,
                s"npz export: ragged array column $name (${seq.length} != $d)")
              var j = 0
              seq.foreach { v =>
                require(v != null, s"npz export: null element in column $name")
                encode(bufs(ci), bbs(ci), j * dt.bytes, dt, v); j += 1
              }
            } else encode(bufs(ci), bbs(ci), 0, dt, r.get(idx))
            outs(ci).write(bufs(ci))
          }
        }
      } finally outs.foreach(_.close())
      writeZipStored(path, cols.map(_._1).zip(spools))
    } finally spools.foreach(_.delete())
  }

  /** Minimal STORED-only zip writer: local headers carry real sizes
    * and CRCs (known from the spools), then the central directory and
    * EOCD — readable by python's zipfile (np.load) and by
    * [[zipDirectory]]. */
  private def writeZipStored(path: String,
                             members: Seq[(String, java.io.File)]): Unit = {
    val os = new BufferedOutputStream(FsIO.create(path), 1 << 16)
    var off = 0L
    val central = scala.collection.mutable.ArrayBuffer[(Array[Byte], Long, Long, Long)]()
    try {
      val inBuf = new Array[Byte](1 << 16)
      members.foreach { case (name, file) =>
        val nameB = s"$name.npy".getBytes("UTF-8")
        val size = file.length()
        require(size <= 0xfffffffeL && off <= 0xfffffffeL,
          s"npz export: archive exceeds zip32 (use toNpySharded)")
        val crc = new CRC32()
        val fis = new java.io.FileInputStream(file)
        try {
          var k = fis.read(inBuf)
          while (k > 0) { crc.update(inBuf, 0, k); k = fis.read(inBuf) }
        } finally fis.close()
        val lh = ByteBuffer.allocate(30).order(ByteOrder.LITTLE_ENDIAN)
        lh.putInt(0x04034b50).putShort(20.toShort).putShort(0.toShort)
          .putShort(0.toShort) // STORED
          .putShort(0.toShort).putShort(0.toShort) // dos time/date
          .putInt(crc.getValue.toInt).putInt(size.toInt).putInt(size.toInt)
          .putShort(nameB.length.toShort).putShort(0.toShort)
        os.write(lh.array()); os.write(nameB)
        val fis2 = new java.io.FileInputStream(file)
        try {
          var k = fis2.read(inBuf)
          while (k > 0) { os.write(inBuf, 0, k); k = fis2.read(inBuf) }
        } finally fis2.close()
        central += ((nameB, off, size, crc.getValue))
        off += 30 + nameB.length + size
      }
      val cdStart = off
      // the per-member guard bounds each entry, but the offset AFTER
      // the last member (where the central directory lands) can still
      // exceed zip32 — putInt would wrap it into a silently corrupt
      // archive
      require(cdStart <= 0xfffffffeL,
        "npz export: archive exceeds zip32 (use toNpySharded)")
      central.foreach { case (nameB, lhOff, size, crc) =>
        val ce = ByteBuffer.allocate(46).order(ByteOrder.LITTLE_ENDIAN)
        ce.putInt(0x02014b50).putShort(20.toShort).putShort(20.toShort)
          .putShort(0.toShort).putShort(0.toShort)
          .putShort(0.toShort).putShort(0.toShort)
          .putInt(crc.toInt).putInt(size.toInt).putInt(size.toInt)
          .putShort(nameB.length.toShort).putShort(0.toShort).putShort(0.toShort)
          .putShort(0.toShort).putShort(0.toShort).putInt(0).putInt(lhOff.toInt)
        os.write(ce.array()); os.write(nameB)
        off += 46 + nameB.length
      }
      // zip32 EOCD carries 16-bit entry counts; more members would
      // silently wrap the count into a misparsing archive (and 0xffff
      // is the zip64 sentinel the read side rejects)
      require(central.size <= 0xfffe,
        "npz export: archive exceeds zip32 member count (use toNpySharded)")
      val eocd = ByteBuffer.allocate(22).order(ByteOrder.LITTLE_ENDIAN)
      eocd.putInt(0x06054b50).putShort(0.toShort).putShort(0.toShort)
        .putShort(central.size.toShort).putShort(central.size.toShort)
        .putInt((off - cdStart).toInt).putInt(cdStart.toInt).putShort(0.toShort)
      os.write(eocd.array())
    } finally os.close()
  }
}
