package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Dependency-free FITS BINTABLE source and sink (reference: vaex
  * exports FITS via astropy, packages/vaex-core/vaex/dataframe.py:6973
  * export_fits; the vaex-astro package reads it) — implemented against
  * the public FITS 4.0 standard: 2880-byte blocks, 80-char ASCII
  * header cards, big-endian binary table data.
  *
  * Scale shape mirrors [[Hdf5]]: the driver parses only the headers
  * (a few KB); rows are FIXED WIDTH (NAXIS1 bytes), so executors read
  * disjoint row ranges with one positioned read each — no driver
  * materialization. Supported TFORM codes: L (logical), J (int32),
  * K (int64), E (float32), D (float64), <w>A (fixed-width string).
  * Integer nulls use the standard TNULLn sentinel; floating nulls are
  * NaN on disk (FITS's own convention) and surface as null. */
object Fits {

  private val Block = 2880

  /** `width` is the TFORM repeat count: characters for A, elements
    * for everything else (1 = scalar; >1 = a fixed-length ARRAY
    * column, the astropy vector-column shape, read as ArrayType). */
  /** TZERO values that mark the standard unsigned-integer storage
    * conventions (FITS 4.0 §5.2.5 / what astropy writes for uint
    * columns): raw signed + 2^31 / 2^63. */
  private val Uint32Zero = 2147483648.0
  private val Uint64Zero = 9.223372036854775808e18

  final case class FitsColumn(name: String, form: Char, width: Int,
                              offset: Int, tnull: Option[Long],
                              tscal: Double = 1.0, tzero: Double = 0.0) {
    def scaled: Boolean = tscal != 1.0 || tzero != 0.0
    private def scalarType: DataType = form match {
      case _ if scaled =>
        // physical = TZERO + TSCAL * raw. The two standard unsigned
        // conventions keep integer types; anything else is a float
        // calibration and reads as double.
        (form, tscal, tzero) match {
          case ('J', 1.0, Uint32Zero) => LongType         // uint32
          case ('K', 1.0, Uint64Zero) => DecimalType(20, 0) // uint64
          case ('J' | 'K' | 'E' | 'D', _, _) => DoubleType
          case (c, _, _) => throw new IllegalArgumentException(
            s"TSCAL/TZERO unsupported on TFORM $c")
        }
      case 'L' => BooleanType
      case 'J' => IntegerType
      case 'K' => LongType
      case 'E' => FloatType
      case 'D' => DoubleType
      case 'A' => StringType
      case c => throw new IllegalArgumentException(s"unsupported TFORM $c")
    }
    def sparkType: DataType =
      if (form != 'A' && width > 1) ArrayType(scalarType) else scalarType
    def elemBytes: Int = form match {
      case 'L' | 'A' => 1
      case 'J' | 'E' => 4
      case 'K' | 'D' => 8
    }
    def bytes: Int = elemBytes * width
  }

  final case class TableMeta(dataStart: Long, rowBytes: Int, nRows: Long,
                             columns: Seq[FitsColumn])

  /** FITS fixed-real parse: the standard allows Fortran 'D' exponent
    * markers ('1.0D-2') alongside 'E' — normalize before toDouble. */
  private def fitsReal(s: String): Double =
    s.trim.replace('D', 'E').replace('d', 'e').toDouble

  // ---------------------------------------------------------------- reader

  private def cardValue(card: String): String = {
    // "KEY     = value / comment" — strip comment outside quotes
    val eq = card.indexOf('=')
    if (eq < 0) return ""
    var v = card.substring(eq + 1).trim
    if (v.startsWith("'")) {
      val end = v.indexOf('\'', 1)
      if (end > 0) v.substring(1, end).trim else v
    } else {
      val slash = v.indexOf('/')
      (if (slash >= 0) v.substring(0, slash) else v).trim
    }
  }

  /** Parse one header unit starting at `addr`; returns (cards map in
    * order of appearance, address just past the header's last block). */
  private def readHeader(raf: FsIO.In, addr: Long): (Seq[(String, String)], Long) = {
    val cards = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var block = addr
    var done = false
    var guard = 0
    while (!done) {
      guard += 1
      require(guard <= 1000, "unterminated FITS header")
      val buf = new Array[Byte](Block)
      raf.seek(block); raf.readFully(buf)
      var i = 0
      while (i < Block && !done) {
        val card = new String(buf, i, 80, "US-ASCII")
        val key = card.substring(0, math.min(8, card.length)).trim
        if (key == "END") done = true
        else if (key.nonEmpty) cards += ((key, cardValue(card)))
        i += 80
      }
      block += Block
    }
    (cards.toSeq, block)
  }

  /** Locate the first BINTABLE extension and describe it. */
  def readTable(path: String): TableMeta = {
    val raf = new FsIO.In(path)
    try {
      // magic first: a non-FITS file must fail fast and clearly, not
      // after chewing through kilobytes of garbage "header cards"
      val magic = new Array[Byte](6)
      require(raf.length >= Block, s"$path: not a FITS file (too short)")
      raf.seek(0); raf.readFully(magic)
      require(new String(magic, "US-ASCII") == "SIMPLE", s"$path: not a FITS file")
      val (primary, afterPrimary) = readHeader(raf, 0L)
      val pmap = primary.toMap
      require(pmap.get("SIMPLE").contains("T"), s"$path: not a FITS file")
      // primary data size (usually zero for table files)
      val pBitpix = math.abs(pmap.getOrElse("BITPIX", "8").toInt)
      val pNaxis = pmap.getOrElse("NAXIS", "0").toInt
      val pData = (1 to pNaxis).map(i => pmap.getOrElse(s"NAXIS$i", "0").toLong)
        .product * (if (pNaxis == 0) 0 else pBitpix / 8)
      var addr = afterPrimary + (pData + Block - 1) / Block * Block
      var guard = 0
      while (true) {
        guard += 1
        require(guard <= 100, s"$path: no BINTABLE extension found")
        val (ext, afterExt) = readHeader(raf, addr)
        val emap = ext.toMap
        val rowBytes = emap.getOrElse("NAXIS1", "0").toInt
        val nRows = emap.getOrElse("NAXIS2", "0").toLong
        val dataBytes = {
          // FITS 4.0 §7.1: data size = |BITPIX|/8 * GCOUNT *
          // (PCOUNT + prod NAXISi). Omitting PCOUNT (heap, e.g.
          // variable-length arrays) misaligns the HDU walk and the
          // following BINTABLE is never found.
          val bitpix = math.abs(emap.getOrElse("BITPIX", "8").toInt)
          val naxis = emap.getOrElse("NAXIS", "0").toInt
          val pcount = emap.getOrElse("PCOUNT", "0").toLong
          val gcount = emap.getOrElse("GCOUNT", "1").toLong
          val axes = (1 to naxis).map(i => emap.getOrElse(s"NAXIS$i", "0").toLong).product
          if (naxis == 0) 0L else bitpix / 8 * gcount * (pcount + axes)
        }
        if (emap.get("XTENSION").contains("BINTABLE")) {
          val nFields = emap.getOrElse("TFIELDS", "0").toInt
          var offset = 0
          val cols = (1 to nFields).map { i =>
            val form = emap.getOrElse(s"TFORM$i",
              throw new IllegalArgumentException(s"missing TFORM$i")).trim
            val (repeat, code) = {
              val digits = form.takeWhile(_.isDigit)
              require(form.length > digits.length, s"malformed TFORM$i '$form'")
              (if (digits.isEmpty) 1 else digits.toInt, form.drop(digits.length).head)
            }
            // whitelist before the repeat check: a variable-length
            // descriptor like '1PB(5)' has repeat=1 and would otherwise
            // fall through to an opaque MatchError at read time
            require("LJKEDA".contains(code),
              s"unsupported TFORM$i '$form' (supported codes: L J K E D A)")
            // repeat 0 is legal FITS (zero-element arrays) but the
            // column carries no bytes — reject loudly rather than
            // let the 0-width column read its neighbor's bytes
            require(repeat >= 1 && repeat <= (1 << 20),
              s"unsupported TFORM$i '$form' (zero or implausible repeat $repeat)")
            val c = FitsColumn(emap.getOrElse(s"TTYPE$i", s"col$i"), code,
              repeat, offset, emap.get(s"TNULL$i").map(_.toLong),
              tscal = emap.get(s"TSCAL$i").map(fitsReal).getOrElse(1.0),
              tzero = emap.get(s"TZERO$i").map(fitsReal).getOrElse(0.0))
            offset += c.bytes
            c
          }
          require(offset == rowBytes,
            s"$path: TFORM widths ($offset) disagree with NAXIS1 ($rowBytes)")
          return TableMeta(afterExt, rowBytes, nRows, cols)
        }
        addr = afterExt + (dataBytes + Block - 1) / Block * Block
      }
      throw new IllegalStateException("unreachable")
    } finally raf.close()
  }

  /** Distributed read: executors read disjoint row ranges with
    * positioned reads (fixed-width rows ⇒ range [i,j) is one seek). */
  def fromFits(spark: SparkSession, path: String, columns: Seq[String] = Nil,
               numPartitions: Int = 0): DataFrame = {
    val meta = readTable(path)
    val cols = if (columns.isEmpty) meta.columns else {
      val byName = meta.columns.map(c => c.name -> c).toMap
      columns.map(c => byName.getOrElse(c,
        throw new IllegalArgumentException(s"no such fits column: $c")))
    }
    val schema = StructType(cols.map(c => StructField(c.name, c.sparkType, nullable = true)))
    val n = meta.nRows
    val parts = if (numPartitions > 0) numPartitions
      else math.max(1, math.min(spark.sparkContext.defaultParallelism,
        (n / 65536 + 1).toInt))
    val step = math.max(1L, (n + parts - 1) / math.max(parts, 1))
    val ranges = (0L until n by step).map(s => (s, math.min(s + step, n)))
    val rowBytes = meta.rowBytes
    val dataStart = meta.dataStart
    val colsB = cols.toArray
    val rdd = spark.sparkContext.parallelize(ranges, math.max(ranges.size, 1))
      .mapPartitions { it =>
        val raf = new FsIO.In(path)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => raf.close()))
        it.flatMap { case (start, end) =>
          val count = (end - start).toInt
          val buf = new Array[Byte](count * rowBytes)
          raf.seek(dataStart + start * rowBytes); raf.readFully(buf)
          val bb = ByteBuffer.wrap(buf).order(ByteOrder.BIG_ENDIAN)
          // TSCAL/TZERO: physical = tzero + tscal*raw, applied AFTER
          // the raw-value TNULL check. The two standard unsigned
          // conventions stay integral (uint32 -> long, uint64 ->
          // DECIMAL(20,0)); general calibrations read as double.
          // dispatch must MATCH scalarType's (form, tscal, tzero)
          // triple — e.g. TFORM K with TZERO 2^31 is a plain double
          // calibration, NOT the uint32 convention
          def scaleInt(c: FitsColumn, raw: Long): Any =
            if (c.form == 'J' && c.tscal == 1.0 && c.tzero == Uint32Zero)
              raw + 2147483648L
            else if (c.form == 'K' && c.tscal == 1.0 && c.tzero == Uint64Zero) {
              val bi = if (raw >= 0) java.math.BigInteger.valueOf(raw)
                .add(java.math.BigInteger.ONE.shiftLeft(63))
              else java.math.BigInteger.valueOf(raw + Long.MaxValue + 1L)
              new java.math.BigDecimal(bi)
            } else c.tzero + c.tscal * raw
          (0 until count).iterator.map { r =>
            Row.fromSeq(colsB.map { c =>
              val o = r * rowBytes + c.offset
              if (c.form != 'A' && c.width > 1) {
                // fixed-length array column: raw element values (FITS
                // has no per-element null convention worth inventing)
                c.form match {
                  case 'L' => Seq.tabulate(c.width)(j => buf(o + j) == 'T')
                  case 'J' if c.scaled =>
                    Seq.tabulate(c.width)(j => scaleInt(c, bb.getInt(o + j * 4).toLong))
                  case 'K' if c.scaled =>
                    Seq.tabulate(c.width)(j => scaleInt(c, bb.getLong(o + j * 8)))
                  case 'E' if c.scaled =>
                    Seq.tabulate(c.width)(j => c.tzero + c.tscal * bb.getFloat(o + j * 4))
                  case 'D' if c.scaled =>
                    Seq.tabulate(c.width)(j => c.tzero + c.tscal * bb.getDouble(o + j * 8))
                  case 'J' => Seq.tabulate(c.width)(j => bb.getInt(o + j * 4))
                  case 'K' => Seq.tabulate(c.width)(j => bb.getLong(o + j * 8))
                  case 'E' => Seq.tabulate(c.width)(j => bb.getFloat(o + j * 4))
                  case 'D' => Seq.tabulate(c.width)(j => bb.getDouble(o + j * 8))
                }
              } else c.form match {
                case 'L' => buf(o) match {
                  case 'T' => true
                  case 'F' => false
                  case _ => null
                }
                case 'J' =>
                  val v = bb.getInt(o)
                  if (c.tnull.contains(v.toLong)) null
                  else if (c.scaled) scaleInt(c, v.toLong) else v
                case 'K' =>
                  val v = bb.getLong(o)
                  if (c.tnull.contains(v)) null
                  else if (c.scaled) scaleInt(c, v) else v
                case 'E' =>
                  val v = bb.getFloat(o)
                  // explicit boxing: bare `if (scaled) double else float`
                  // would WIDEN the unscaled branch to Double (Scala
                  // numeric unification) and break the FLOAT encoder
                  if (v.isNaN) null
                  else if (c.scaled) Double.box(c.tzero + c.tscal * v)
                  else Float.box(v)
                case 'D' =>
                  val v = bb.getDouble(o)
                  if (v.isNaN) null
                  else if (c.scaled) Double.box(c.tzero + c.tscal * v)
                  else Double.box(v)
                case 'A' =>
                  // FITS pads strings with spaces (or NULs); NUL-first
                  // means "null string" by common convention
                  if (buf(o) == 0) null
                  else {
                    var len = c.width
                    while (len > 0 && (buf(o + len - 1) == ' ' || buf(o + len - 1) == 0))
                      len -= 1
                    new String(buf, o, len, "US-ASCII")
                  }
              }
            }.toSeq)
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  // ---------------------------------------------------------------- writer

  private def card(key: String, value: String, quote: Boolean = false): String = {
    val v = if (quote) s"'${value.padTo(8, ' ')}'" else value
    (key.padTo(8, ' ') + "= " + (" " * math.max(0, 20 - v.length)) + v).padTo(80, ' ')
  }
  private def pad(out: java.io.ByteArrayOutputStream): Unit =
    while (out.size() % Block != 0) out.write(' ')
  private def padZero(out: FsIO.CountingOut): Unit = {
    val rem = (Block - out.count % Block) % Block
    out.write(new Array[Byte](rem.toInt))
  }

  /** Reject unsupported (column type, scale) combinations up front —
    * shared by BOTH entry points ([[toFits]] and [[toFitsSharded]]):
    * writeFitsFile hardcodes the uint32 convention for scaled LongType
    * and physical calibration for float/double; any other combination
    * would silently write wrong raw values. */
  private def validateScales(schema: StructType,
                             scales: Map[String, (Double, Double)]): Unit =
    scales.keys.foreach { c =>
      require(schema.fieldNames.contains(c), s"scales: no such column $c")
      schema(c).dataType match {
        case LongType =>
          require(scales(c) == (1.0, Uint32Zero),
            s"scales: long column $c supports only the uint32 convention (1, 2^31)")
        case FloatType | DoubleType => ()
        case t => throw new IllegalArgumentException(
          s"scales: unsupported on $t column $c")
      }
    }

  /** INT null sentinel (TNULLn): most-negative value of the type.
    * KNOWN COLLISION: a genuine data value equal to Int.MinValue /
    * Long.MinValue is indistinguishable from null in the file and
    * reads back as null (the FITS integer-null convention has no
    * escape — TNULL reserves one code point). The most-negative value
    * is the conventional choice precisely because real data almost
    * never contains it. */
  private val NullInt = Int.MinValue
  private val NullLong = Long.MinValue

  /** Driver-side single-file interchange sink (like the hdf5 writer):
    * primary HDU + one BINTABLE with all rows, streamed via
    * toLocalIterator (one partition resident). String columns get the
    * max observed width (two-pass over the column stats only). */
  /** `scales`: per-column (TSCAL, TZERO) storage scaling. A LongType
    * column with (1, 2^31) stores as unsigned-convention TFORM J
    * (raw = v - 2^31 — what astropy writes for uint32); float/double
    * columns store raw = (v - TZERO)/TSCAL (calibrated physical
    * values; pick binary-exact factors like 0.25 for lossless round
    * trips). Scaled integer columns must be null-free (the TNULL
    * sentinel would collide with a genuine physical value). */
  def toFits(df: DataFrame, path: String,
             scales: Map[String, (Double, Double)] = Map.empty): Unit = {
    val schema = df.schema
    import org.apache.spark.sql.functions._
    // widths for string columns + row count in ONE aggregation pass
    val aggs = count(lit(1)).as("__n") +: schema.fields.toSeq.flatMap {
      case f if f.dataType == StringType =>
        Seq(coalesce(max(length(col(f.name))), lit(1)).as(s"__w_${f.name}"))
      case f if f.dataType.isInstanceOf[ArrayType] =>
        // FITS repeat counts are fixed — the whole column must agree
        Seq(coalesce(min(size(col(f.name))), lit(0)).as(s"__amin_${f.name}"),
          coalesce(max(size(col(f.name))), lit(0)).as(s"__amax_${f.name}"))
      case _ => Nil
    }
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val n = stats.getLong(0)
    val widths: Map[String, Int] = schema.fields.toSeq.collect {
      case f if f.dataType == StringType =>
        f.name -> math.max(1, stats.getAs[Number](s"__w_${f.name}").intValue())
    }.toMap
    val arrayLens: Map[String, Int] = schema.fields.toSeq.collect {
      case f if f.dataType.isInstanceOf[ArrayType] =>
        val lo = stats.getAs[Number](s"__amin_${f.name}").intValue()
        val hi = stats.getAs[Number](s"__amax_${f.name}").intValue()
        require(lo == hi && hi >= 1,
          s"fits export: array column ${f.name} must have one fixed length (saw $lo..$hi)")
        f.name -> hi
    }.toMap
    writeFitsFile(schema, n, widths, arrayLens,
      scala.jdk.CollectionConverters.IteratorHasAsScala(df.toLocalIterator()).asScala,
      path, scales)
  }

  /** DISTRIBUTED FITS export: each partition writes its own
    * `part-NNNNN.fits` file from its executor (string widths and
    * array lengths resolved per shard). Read back with
    * `Readers.open(s"$dir/part-*.fits")`. Stale shards cleared;
    * empty partitions skip. Returns the shard count.
    *
    * `dir` is a Hadoop FileSystem path (`file:`, `hdfs:`, `s3a:`,
    * ...): shards stream through `FileSystem.create` against the
    * target filesystem — no shared-POSIX-mount assumption. Partition
    * rows make ONE pass into an executor-local spill (bounded heap on
    * skewed partitions), collecting the geometry FITS needs up front,
    * then stream from the spill into the shard. */
  def toFitsSharded(df: DataFrame, dir: String,
                    scales: Map[String, (Double, Double)] = Map.empty): Int = {
    val schema = df.schema
    validateScales(schema, scales) // fail on the driver, before any task runs
    FsIO.mkdirs(dir)
    FsIO.deleteShards(dir, ".fits")
    val sc = scales
    df.rdd.mapPartitionsWithIndex { (pi, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        // bounded memory on skewed partitions: ONE streaming pass into
        // an executor-local spill (collecting the geometry FITS needs
        // up front — row count, string widths, array lengths), then a
        // second pass over the spill streams rows into the shard
        val stringIdx = schema.fields.zipWithIndex.collect {
          case (f, fi) if f.dataType == StringType => (f.name, fi) }
        val arrayIdx = schema.fields.zipWithIndex.collect {
          case (f, fi) if f.dataType.isInstanceOf[ArrayType] => (f.name, fi) }
        val maxW = scala.collection.mutable.Map[String, Int]()
        val lenSets = scala.collection.mutable.Map[String, Set[Int]]()
        val (spillFile, n) = RowSpill.spill(schema, it.map { r =>
          stringIdx.foreach { case (nme, fi) =>
            if (!r.isNullAt(fi)) {
              val w = r.getString(fi).getBytes("US-ASCII").length
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
              s"fits export: array column $nme must have one fixed length (saw $lens)")
            nme -> lens.headOption.getOrElse(1)
          }.toMap
          writeFitsFile(schema, n, widths, arrayLens,
            RowSpill.iterate(schema, spillFile), f"$dir/part-$pi%05d.fits", sc)
        } finally spillFile.delete()
        Iterator.single(1)
      }
    }.count().toInt
  }

  /** One complete FITS file (primary HDU + BINTABLE) from
    * pre-resolved geometry: driver-streamed by [[toFits]], one
    * partition's rows in [[toFitsSharded]]. */
  private def writeFitsFile(schema: org.apache.spark.sql.types.StructType,
                            n: Long, widths: Map[String, Int],
                            arrayLens: Map[String, Int], it: Iterator[Row],
                            path: String,
                            scales: Map[String, (Double, Double)]): Unit = {
    validateScales(schema, scales)
    val cols = schema.fields.map { f =>
      val (form, bytes) = f.dataType match {
        case BooleanType => ("1L", 1)
        case IntegerType => ("1J", 4)
        case LongType if scales.contains(f.name) => ("1J", 4) // uint32 convention
        case LongType => ("1K", 8)
        case FloatType => ("1E", 4)
        case DoubleType => ("1D", 8)
        case StringType => val w = widths(f.name); (s"${w}A", w)
        case ArrayType(et, _) =>
          val r = arrayLens(f.name)
          et match {
            case IntegerType => (s"${r}J", 4 * r)
            case LongType    => (s"${r}K", 8 * r)
            case FloatType   => (s"${r}E", 4 * r)
            case DoubleType  => (s"${r}D", 8 * r)
            case t => throw new IllegalArgumentException(
              s"fits export: unsupported array element type $t")
          }
        case t => throw new IllegalArgumentException(s"fits export: unsupported type $t")
      }
      (f, form, bytes)
    }
    val rowBytes = cols.map(_._3).sum
    val hdr = new java.io.ByteArrayOutputStream()
    def put(s: String): Unit = hdr.write(s.getBytes("US-ASCII"))
    // primary HDU: no data
    put(card("SIMPLE", "T")); put(card("BITPIX", "8")); put(card("NAXIS", "0"))
    put(card("EXTEND", "T")); put("END".padTo(80, ' ')); pad(hdr)
    // bintable header
    put(card("XTENSION", "BINTABLE", quote = true))
    put(card("BITPIX", "8")); put(card("NAXIS", "2"))
    put(card("NAXIS1", rowBytes.toString)); put(card("NAXIS2", n.toString))
    put(card("PCOUNT", "0")); put(card("GCOUNT", "1"))
    put(card("TFIELDS", cols.length.toString))
    cols.zipWithIndex.foreach { case ((f, form, _), i) =>
      put(card(s"TTYPE${i + 1}", f.name, quote = true))
      put(card(s"TFORM${i + 1}", form, quote = true))
      scales.get(f.name) match {
        case Some((sc, z)) =>
          // fixed notation (FITS convention): integral values print
          // without an exponent (2147483648, not 2.147483648E9)
          def num(v: Double): String =
            if (v == Math.rint(v) && math.abs(v) < 1e20)
              BigDecimal(v).toBigInt.toString
            else v.toString
          put(card(s"TSCAL${i + 1}", num(sc)))
          put(card(s"TZERO${i + 1}", num(z)))
        case None => f.dataType match {
          case IntegerType => put(card(s"TNULL${i + 1}", NullInt.toString))
          case LongType => put(card(s"TNULL${i + 1}", NullLong.toString))
          case _ => ()
        }
      }
    }
    put("END".padTo(80, ' ')); pad(hdr)
    val raf = new FsIO.CountingOut(FsIO.create(path))
    try {
      raf.write(hdr.toByteArray)
      val rowBuf = ByteBuffer.allocate(rowBytes).order(ByteOrder.BIG_ENDIAN)
      while (it.hasNext) {
        val row = it.next()
        rowBuf.clear()
        cols.zipWithIndex.foreach { case ((f, _, bytes), j) =>
          if (row.isNullAt(j)) f.dataType match {
            case BooleanType => rowBuf.put(0.toByte) // FITS "undefined"
            case IntegerType => rowBuf.putInt(NullInt)
            case LongType if scales.contains(f.name) =>
              throw new IllegalArgumentException(
                s"${f.name}: null in a scaled (uint32) column — no TNULL escape")
            case LongType => rowBuf.putLong(NullLong)
            case FloatType => rowBuf.putFloat(Float.NaN)
            case DoubleType => rowBuf.putDouble(Double.NaN)
            case StringType => rowBuf.put(new Array[Byte](bytes)) // NUL fill
            case ArrayType(et, _) =>
              val r = arrayLens(f.name)
              (0 until r).foreach { _ =>
                et match {
                  case IntegerType => rowBuf.putInt(NullInt)
                  case LongType    => rowBuf.putLong(NullLong)
                  case FloatType   => rowBuf.putFloat(Float.NaN)
                  case DoubleType  => rowBuf.putDouble(Double.NaN)
                  case _ => ()
                }
              }
            case _ => ()
          } else f.dataType match {
            case BooleanType => rowBuf.put((if (row.getBoolean(j)) 'T' else 'F').toByte)
            case IntegerType => rowBuf.putInt(row.getInt(j))
            case LongType if scales.contains(f.name) => // uint32 raw = v - 2^31
              val v = row.getLong(j)
              require(v >= 0L && v < 4294967296L, s"${f.name}: $v outside uint32")
              rowBuf.putInt((v - 2147483648L).toInt)
            case LongType => rowBuf.putLong(row.getLong(j))
            case FloatType if scales.contains(f.name) =>
              val (sc, z) = scales(f.name)
              rowBuf.putFloat(((row.getFloat(j) - z) / sc).toFloat)
            case FloatType => rowBuf.putFloat(row.getFloat(j))
            case DoubleType if scales.contains(f.name) =>
              val (sc, z) = scales(f.name)
              rowBuf.putDouble((row.getDouble(j) - z) / sc)
            case DoubleType => rowBuf.putDouble(row.getDouble(j))
            case StringType =>
              val raw = row.getString(j).getBytes("US-ASCII")
              require(raw.length <= bytes, "string exceeds computed width")
              rowBuf.put(raw)
              rowBuf.put(Array.fill(bytes - raw.length)(' '.toByte)) // space pad
            case ArrayType(et, _) =>
              val seq = row.getSeq[Any](j)
              require(seq.length == arrayLens(f.name),
                s"${f.name}: ragged array row (${seq.length})")
              seq.foreach { v =>
                et match {
                  case IntegerType => rowBuf.putInt(v.asInstanceOf[Int])
                  case LongType    => rowBuf.putLong(v.asInstanceOf[Long])
                  case FloatType   => rowBuf.putFloat(v.asInstanceOf[Float])
                  case DoubleType  => rowBuf.putDouble(v.asInstanceOf[Double])
                  case _ => ()
                }
              }
            case _ => ()
          }
        }
        raf.write(rowBuf.array())
      }
      padZero(raf)
    } finally raf.close()
  }
}
