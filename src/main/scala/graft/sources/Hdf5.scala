package graft.sources

import java.io.RandomAccessFile
import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Dependency-free HDF5 support for the vaex file layout — the
  * reference's NATIVE store (reference: packages/vaex-hdf5/vaex/hdf5/
  * writer.py:28-87 table/columns group layout; dataset.py:186-214 root
  * dispatch, :393-416 arrow-style string columns + null_bitmap).
  *
  * Implemented directly against the public HDF5 File Format
  * Specification (v1.0 structures): superblock v0, version-1 object
  * headers (+ continuation blocks), old-style symbol-table groups
  * (B-tree v1 + local heap + SNOD), dataspace v1/v2, datatype classes
  * fixed-point/float/string, data layout v3 contiguous.
  * Chunked/compressed/compact layouts are rejected with a clear
  * error — the vaex writer produces contiguous layouts, which is
  * exactly what makes the format scan-parallelizable.
  *
  * Scale design: READ is distributed — the driver parses only metadata
  * (superblock, group tree, dataset headers: a few KB), then executors
  * read disjoint row ranges of each column with positioned reads
  * (contiguous layout ⇒ range [i,j) of column c lives at
  * dataAddr + i·elemSize — the same arithmetic the reference's mmap
  * model uses, reference: packages/vaex-core/vaex/dataset_mmap.py:28).
  * Column pruning happens at metadata time: unrequested columns are
  * never touched. WRITE is a driver-side single-file interchange sink
  * (one .hdf5 file is inherently one writer), mirroring the
  * reference's own single-file export; the scale path for persistence
  * is parquet.
  */
object Hdf5 {

  private val UNDEF = -1L // 0xFFFF…FF per spec ("undefined address")
  private val LEAF_K = 4      // SNOD capacity = 2·LEAF_K symbols
  private val INTERNAL_K = 16 // B-tree node capacity = 2·INTERNAL_K children

  // ------------------------------------------------------------------
  // column model shared by reader and writer
  // ------------------------------------------------------------------

  /** Element kinds: i1/i2/i4/i8 signed fixed-point, f4/f8 IEEE floats,
    * str = arrow-style (int64 offsets + utf8 bytes). */
  final case class ColumnMeta(
      name: String, kind: String, n: Long,
      dataAddr: Long, dataSize: Long,
      indicesAddr: Long,  // str only, n+1 int64 offsets
      bitmapAddr: Long) { // UNDEF when column has no null bitmap
    def nullable: Boolean = bitmapAddr != UNDEF
    def sparkType: DataType = kind match {
      case "i1" => ByteType
      case "i2" => ShortType
      case "i4" => IntegerType
      case "i8" => LongType
      case "f4" => FloatType
      case "f8" => DoubleType
      case "str" => StringType
      case k => throw new IllegalArgumentException(s"unsupported hdf5 column kind: $k")
    }
    def elemSize: Int = kind match {
      case "i1" => 1; case "i2" => 2; case "i4" => 4
      case "i8" | "str" => 8; case "f4" => 4; case "f8" => 8
    }
  }

  // ==================================================================
  // READER
  // ==================================================================

  private[sources] final case class Dtype(clazz: Int, size: Int, signed: Boolean)
  private[sources] final case class DsetMeta(dims: Seq[Long], dt: Dtype, dataAddr: Long,
                                             dataSize: Long, attrs: Map[String, String])

  /** Driver-side metadata parser. Reads only header structures. */
  final class H5File(path: String) extends AutoCloseable {
    private val raf = new RandomAccessFile(path, "r")

    private def readAt(addr: Long, len: Int): ByteBuffer = {
      val b = new Array[Byte](len)
      raf.seek(addr); raf.readFully(b)
      ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    }

    /** root object header address */
    val rootAddr: Long = {
      val sig = readAt(0, 8)
      val expect = Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').map(_.toByte)
      require((0 until 8).forall(i => sig.get(i) == expect(i)), s"$path: not an HDF5 file")
      val ver = readAt(8, 1).get(0) & 0xff
      require(ver <= 1, s"$path: superblock version $ver unsupported (use libver earliest)")
      val sizes = readAt(13, 2)
      require(sizes.get(0) == 8 && sizes.get(1) == 8,
        s"$path: only 8-byte offsets/lengths supported")
      // v0: superblock fixed part ends at 24; v1 adds 4 bytes (indexed
      // storage internal node K + reserved) before the addresses
      val addrBase = if (ver == 0) 24 else 28
      // base(8) free-space(8) eof(8) driver-info(8) then root STE
      val steAddr = addrBase + 32
      readAt(steAddr + 8, 8).getLong // STE: link-name-offset(8), OH addr(8)
    }

    /** All header messages of a v1 object header, following
      * continuation blocks. Returns (type, body) pairs. */
    def messages(ohAddr: Long): Seq[(Int, Array[Byte])] = {
      val head = readAt(ohAddr, 16)
      val version = head.get(0) & 0xff
      require(version == 1, s"object header v$version unsupported (v2/latest-format file?)")
      val nMsgs = head.getShort(2) & 0xffff
      val blockSize = head.getInt(8)
      val out = scala.collection.mutable.ArrayBuffer[(Int, Array[Byte])]()
      // queue of (addr, len) message blocks; first block starts at +16
      var blocks = List((ohAddr + 16, blockSize.toLong))
      while (blocks.nonEmpty && out.size < nMsgs) {
        val (bAddr, bLen) = blocks.head
        blocks = blocks.tail
        val buf = readAt(bAddr, bLen.toInt)
        while (buf.remaining() >= 8 && out.size < nMsgs) {
          val mType = buf.getShort() & 0xffff
          val mSize = buf.getShort() & 0xffff
          buf.getInt() // flags + reserved
          val body = new Array[Byte](mSize)
          if (buf.remaining() < mSize) throw new IllegalStateException("truncated message")
          buf.get(body)
          if (mType == 0x0010) { // continuation: offset(8) + length(8)
            val cb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
            blocks = blocks :+ ((cb.getLong, cb.getLong))
          } else if (mType != 0x0000) out += ((mType, body))
        }
      }
      out.toSeq
    }

    def isGroup(ohAddr: Long): Boolean = messages(ohAddr).exists(_._1 == 0x0011)

    /** Children of a symbol-table group: (name, objectHeaderAddr),
      * B-tree name order (ascending). */
    def groupChildren(ohAddr: Long): Seq[(String, Long)] = {
      val st = messages(ohAddr).find(_._1 == 0x0011)
        .getOrElse(throw new IllegalArgumentException("not a symbol-table group"))
      val b = ByteBuffer.wrap(st._2).order(ByteOrder.LITTLE_ENDIAN)
      val btreeAddr = b.getLong; val heapAddr = b.getLong
      val heapDataAddr = { // HEAP: sig(4) ver(1) res(3) size(8) freelist(8) dataAddr(8)
        val h = readAt(heapAddr, 32)
        require(h.getInt(0) == leMagic("HEAP"), "bad local heap signature")
        h.getLong(24)
      }
      def heapString(off: Long): String = {
        val sb = new StringBuilder
        var a = heapDataAddr + off
        var c = readAt(a, 1).get(0)
        while (c != 0) { sb.append(c.toChar); a += 1; c = readAt(a, 1).get(0) }
        sb.toString
      }
      def walkBtree(addr: Long): Seq[Long] = { // returns SNOD addresses
        val hd = readAt(addr, 24)
        require(hd.getInt(0) == leMagic("TREE"), "bad btree signature")
        require((hd.get(4) & 0xff) == 0, "not a group btree")
        val level = hd.get(5) & 0xff
        val used = hd.getShort(6) & 0xffff
        // keys/children: key0(8) child0(8) key1 ... — read 'used' children
        val kc = readAt(addr + 24, (2 * used + 1) * 8)
        val children = (0 until used).map(i => kc.getLong((2 * i + 1) * 8))
        if (level == 0) children else children.flatMap(walkBtree)
      }
      walkBtree(btreeAddr).flatMap { snodAddr =>
        val hd = readAt(snodAddr, 8)
        require(hd.getInt(0) == leMagic("SNOD"), "bad SNOD signature")
        val nSyms = hd.getShort(6) & 0xffff
        val entries = readAt(snodAddr + 8, nSyms * 40)
        (0 until nSyms).map { i =>
          val nameOff = entries.getLong(i * 40)
          val objAddr = entries.getLong(i * 40 + 8)
          (heapString(nameOff), objAddr)
        }
      }
    }

    private def parseDtype(body: ByteBuffer): Dtype = {
      val b0 = body.get() & 0xff
      val clazz = b0 & 0x0f
      val bits = Array(body.get() & 0xff, body.get() & 0xff, body.get() & 0xff)
      val size = body.getInt()
      clazz match {
        case 0 => // fixed-point; bit3 of bitfield-0 = signed
          require((bits(0) & 1) == 0, "big-endian integers unsupported")
          Dtype(0, size, (bits(0) & 0x08) != 0)
        case 1 =>
          require((bits(0) & 1) == 0, "big-endian floats unsupported")
          Dtype(1, size, signed = true)
        case 3 => Dtype(3, size, signed = false)
        case c => throw new IllegalArgumentException(
          s"unsupported hdf5 datatype class $c (only int/float/string)")
      }
    }

    private def parseDataspace(body: ByteBuffer): Seq[Long] = {
      val version = body.get() & 0xff
      version match {
        case 1 =>
          val rank = body.get() & 0xff
          body.get(); body.position(body.position() + 5) // flags + reserved(5)
          (0 until rank).map(_ => body.getLong)
        case 2 =>
          val rank = body.get() & 0xff
          body.get(); body.get() // flags, type
          (0 until rank).map(_ => body.getLong)
        case v => throw new IllegalArgumentException(s"dataspace v$v unsupported")
      }
    }

    /** Parse a v1 attribute message into (name, stringValue) when the
      * value is a string/fixed-point scalar; None otherwise. */
    private def parseAttr(body: ByteBuffer): Option[(String, String)] = {
      val version = body.get() & 0xff
      if (version != 1) return None
      body.get() // reserved
      val nameSize = body.getShort() & 0xffff
      val dtSize = body.getShort() & 0xffff
      val dsSize = body.getShort() & 0xffff
      def pad8(n: Int) = (n + 7) / 8 * 8
      val nameBytes = new Array[Byte](pad8(nameSize)); body.get(nameBytes)
      val name = new String(nameBytes.takeWhile(_ != 0), "UTF-8")
      val dtBytes = new Array[Byte](pad8(dtSize)); body.get(dtBytes)
      val dsBytes = new Array[Byte](pad8(dsSize)); body.get(dsBytes)
      val dt = parseDtype(ByteBuffer.wrap(dtBytes).order(ByteOrder.LITTLE_ENDIAN))
      if (dt.clazz != 3) return None
      val data = new Array[Byte](math.min(dt.size, body.remaining()))
      body.get(data)
      Some((name, new String(data.takeWhile(_ != 0), "UTF-8")))
    }

    def dataset(ohAddr: Long): DsetMeta = {
      var dims: Seq[Long] = Nil
      var dt: Dtype = null
      var dataAddr = UNDEF
      var dataSize = 0L
      val attrs = scala.collection.mutable.Map[String, String]()
      messages(ohAddr).foreach { case (t, body) =>
        val b = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
        t match {
          case 0x0001 => dims = parseDataspace(b)
          case 0x0003 => dt = parseDtype(b)
          case 0x0008 =>
            val version = b.get() & 0xff
            require(version == 3, s"data layout v$version unsupported")
            val clazz = b.get() & 0xff
            clazz match {
              case 1 => dataAddr = b.getLong; dataSize = b.getLong
              case 2 => throw new IllegalArgumentException(
                "chunked hdf5 layout unsupported — export contiguous (no chunks/compression)")
              case c => throw new IllegalArgumentException(
                s"hdf5 layout class $c unsupported (only contiguous; " +
                  "vaex/h5py default exports are contiguous)")
            }
          case 0x000C => parseAttr(b).foreach { case (k, v) => attrs(k) = v }
          case _ => ()
        }
      }
      DsetMeta(dims, dt, dataAddr, dataSize, attrs.toMap)
    }

    override def close(): Unit = raf.close()
  }

  private def leMagic(s: String): Int =
    (s(0) | (s(1) << 8) | (s(2) << 16) | (s(3) << 24))

  /** Resolve the vaex table layout: /table/columns (v2 export),
    * /columns, or /data (v1). Returns columns in column_order when the
    * attribute is present, else B-tree (name) order. */
  def readTable(path: String): Seq[ColumnMeta] = {
    val f = new H5File(path)
    try {
      val rootKids = f.groupChildren(f.rootAddr).toMap
      val columnsGroupAddr =
        rootKids.get("table").filter(f.isGroup)
          .flatMap(t => f.groupChildren(t).toMap.get("columns"))
          .orElse(rootKids.get("columns").filter(f.isGroup))
          .orElse(rootKids.get("data").filter(f.isGroup))
          .getOrElse(throw new IllegalArgumentException(
            s"$path: no /table/columns, /columns or /data group (not a vaex hdf5 file)"))
      val kids = f.groupChildren(columnsGroupAddr)
      val colOrder = {
        // column_order attr lives on the columns group
        val attrs = attrsOf(f, columnsGroupAddr)
        attrs.get("column_order").map(_.split(",").toSeq)
      }
      val metas = kids.map { case (name, addr) =>
        if (f.isGroup(addr)) {
          val members = f.groupChildren(addr).toMap
          val dataA = members.getOrElse("data",
            throw new IllegalArgumentException(s"column $name: no data dataset"))
          val data = f.dataset(dataA)
          val bitmap = members.get("null_bitmap").map(a => f.dataset(a).dataAddr).getOrElse(UNDEF)
          if (data.attrs.get("dtype").contains("str")) {
            val idxA = members.getOrElse("indices",
              throw new IllegalArgumentException(s"string column $name: no indices"))
            val idx = f.dataset(idxA)
            ColumnMeta(name, "str", idx.dims.head - 1,
              data.dataAddr, data.dataSize, idx.dataAddr, bitmap)
          } else {
            val kind = kindOf(data.dt)
            ColumnMeta(name, kind, data.dims.head, data.dataAddr, data.dataSize, UNDEF, bitmap)
          }
        } else { // v1 layout: dataset directly under the group
          val data = f.dataset(addr)
          ColumnMeta(name, kindOf(data.dt), data.dims.head,
            data.dataAddr, data.dataSize, UNDEF, UNDEF)
        }
      }
      colOrder match {
        case Some(names) =>
          val byName = metas.map(m => m.name -> m).toMap
          names.flatMap(byName.get) ++ metas.filterNot(m => names.contains(m.name))
        case None => metas
      }
    } finally f.close()
  }

  private def attrsOf(f: H5File, ohAddr: Long): Map[String, String] = {
    // group attribute messages: same 0x000C encoding as datasets
    val ds = try f.dataset(ohAddr) catch { case _: Throwable => null }
    if (ds != null) ds.attrs else Map.empty
  }

  private def kindOf(dt: Dtype): String = (dt.clazz, dt.size, dt.signed) match {
    case (0, 1, true) => "i1"
    case (0, 2, true) => "i2"
    case (0, 4, true) => "i4"
    case (0, 8, true) => "i8"
    case (1, 4, _) => "f4"
    case (1, 8, _) => "f8"
    case (c, s, sg) => throw new IllegalArgumentException(
      s"unsupported column datatype: class=$c size=$s signed=$sg")
  }

  /** Distributed read: `columns = Nil` reads everything; otherwise only
    * the named columns' byte ranges are ever touched (metadata-time
    * column pruning). Partitions are row ranges; each task does one
    * positioned read per (column, range). The file path must be
    * executor-visible (shared FS), like any Spark input. */
  def fromHdf5(spark: SparkSession, path: String, columns: Seq[String] = Nil,
               numPartitions: Int = 0): DataFrame = {
    val all = readTable(path)
    val metas = if (columns.isEmpty) all else {
      val byName = all.map(m => m.name -> m).toMap
      columns.map(c => byName.getOrElse(c,
        throw new IllegalArgumentException(s"no such hdf5 column: $c")))
    }
    require(metas.nonEmpty, s"$path: no columns")
    val n = metas.head.n
    require(metas.forall(_.n == n), "ragged column lengths")
    val parts = if (numPartitions > 0) numPartitions
      else math.max(1, math.min(spark.sparkContext.defaultParallelism,
        (n / 65536 + 1).toInt))
    val step = (n + parts - 1) / math.max(parts, 1)
    val ranges = (0L until n by math.max(step, 1)).map(s => (s, math.min(s + step, n)))
    val schema = StructType(metas.map(m => StructField(m.name, m.sparkType, m.nullable)))
    val metasB = metas.toArray
    val rdd = spark.sparkContext.parallelize(ranges, math.max(ranges.size, 1))
      .mapPartitions { it =>
        val raf = new RandomAccessFile(path, "r")
        def readBytes(addr: Long, len: Int): ByteBuffer = {
          val b = new Array[Byte](len); raf.seek(addr); raf.readFully(b)
          ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
        }
        val rows = it.flatMap { case (start, end) =>
          val c = (end - start).toInt
          val colVals: Array[Array[Any]] = metasB.map { m =>
            val valid: Int => Boolean = if (m.bitmapAddr != UNDEF) {
              val firstByte = start / 8
              val nBytes = (end + 7) / 8 - firstByte
              val bits = readBytes(m.bitmapAddr + firstByte, nBytes.toInt)
              i => { val g = start + i - firstByte * 8
                (bits.get((g / 8).toInt) >> (g % 8).toInt & 1) == 1 }
            } else _ => true
            m.kind match {
              case "str" =>
                val offs = readBytes(m.indicesAddr + start * 8, (c + 1) * 8)
                val o0 = offs.getLong(0); val oN = offs.getLong(c * 8)
                val bytes = new Array[Byte]((oN - o0).toInt)
                raf.seek(m.dataAddr + o0); raf.readFully(bytes)
                Array.tabulate[Any](c) { i =>
                  if (!valid(i)) null
                  else new String(bytes, (offs.getLong(i * 8) - o0).toInt,
                    (offs.getLong((i + 1) * 8) - offs.getLong(i * 8)).toInt, "UTF-8")
                }
              case k =>
                val es = m.elemSize
                val buf = readBytes(m.dataAddr + start * es, c * es)
                Array.tabulate[Any](c) { i =>
                  if (!valid(i)) null
                  else k match {
                    case "i1" => buf.get(i)
                    case "i2" => buf.getShort(i * 2)
                    case "i4" => buf.getInt(i * 4)
                    case "i8" => buf.getLong(i * 8)
                    case "f4" => buf.getFloat(i * 4)
                    case "f8" => buf.getDouble(i * 8)
                  }
                }
            }
          }
          (0 until c).iterator.map(i => Row.fromSeq(metasB.indices.map(j => colVals(j)(i))))
        }
        rows
      }
    spark.createDataFrame(rdd, schema)
  }

  // ==================================================================
  // WRITER
  // ==================================================================

  private final case class OutCol(name: String, kind: String,
                                  data: Array[Byte],          // numeric values or utf8 bytes
                                  indices: Array[Byte],       // str only
                                  bitmap: Array[Byte],        // empty = no nulls
                                  n: Long)

  /** Export a DataFrame as a vaex-layout hdf5 file
    * (/table/columns/<name>/data [+ indices, null_bitmap], column_order
    * attribute, dtype='str' marker on string data — the layout
    * writer.py:28-87 produces). Driver-side single-file sink. */
  def toHdf5(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val n0 = df.count()
    require(n0 < Int.MaxValue, "hdf5 export caps at 2^31 rows per file; shard first")
    val n = n0.toInt
    val builders: Array[Any] = schema.fields.map { f =>
      f.dataType match {
        case ByteType => new Array[Byte](n)
        case ShortType => new Array[Short](n)
        case IntegerType => new Array[Int](n)
        case LongType => new Array[Long](n)
        case FloatType => new Array[Float](n)
        case DoubleType => new Array[Double](n)
        case StringType => new Array[String](n)
        case t => throw new IllegalArgumentException(s"hdf5 export: unsupported type $t")
      }
    }
    val anyNull = new Array[Boolean](schema.length)
    val validBits = Array.fill(schema.length)(new Array[Byte]((n + 7) / 8))
    var i = 0
    val it = df.toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      var j = 0
      while (j < schema.length) {
        if (r.isNullAt(j)) anyNull(j) = true
        else {
          validBits(j)(i / 8) = (validBits(j)(i / 8) | (1 << (i % 8)).toByte).toByte
          schema.fields(j).dataType match {
            case ByteType => builders(j).asInstanceOf[Array[Byte]](i) = r.getByte(j)
            case ShortType => builders(j).asInstanceOf[Array[Short]](i) = r.getShort(j)
            case IntegerType => builders(j).asInstanceOf[Array[Int]](i) = r.getInt(j)
            case LongType => builders(j).asInstanceOf[Array[Long]](i) = r.getLong(j)
            case FloatType => builders(j).asInstanceOf[Array[Float]](i) = r.getFloat(j)
            case DoubleType => builders(j).asInstanceOf[Array[Double]](i) = r.getDouble(j)
            case StringType => builders(j).asInstanceOf[Array[String]](i) = r.getString(j)
            case _ => ()
          }
        }
        j += 1
      }
      i += 1
    }
    val cols = schema.fields.zipWithIndex.map { case (f, j) =>
      val bm = if (anyNull(j)) validBits(j) else Array.empty[Byte]
      f.dataType match {
        case StringType =>
          val strs = builders(j).asInstanceOf[Array[String]]
          val offsets = ByteBuffer.allocate((n + 1) * 8).order(ByteOrder.LITTLE_ENDIAN)
          val bytesOut = new java.io.ByteArrayOutputStream()
          var off = 0L
          offsets.putLong(0L)
          var k = 0
          while (k < n) {
            if (strs(k) != null) { val b = strs(k).getBytes("UTF-8"); bytesOut.write(b); off += b.length }
            offsets.putLong(off); k += 1
          }
          OutCol(f.name, "str", bytesOut.toByteArray, offsets.array(), bm, n)
        case t =>
          val es = t match {
            case ByteType => 1; case ShortType => 2; case IntegerType | FloatType => 4
            case _ => 8
          }
          val buf = ByteBuffer.allocate(n * es).order(ByteOrder.LITTLE_ENDIAN)
          t match {
            case ByteType => buf.put(builders(j).asInstanceOf[Array[Byte]])
            case ShortType => builders(j).asInstanceOf[Array[Short]].foreach(buf.putShort)
            case IntegerType => builders(j).asInstanceOf[Array[Int]].foreach(buf.putInt)
            case LongType => builders(j).asInstanceOf[Array[Long]].foreach(buf.putLong)
            case FloatType => builders(j).asInstanceOf[Array[Float]].foreach(buf.putFloat)
            case DoubleType => builders(j).asInstanceOf[Array[Double]].foreach(buf.putDouble)
            case _ => ()
          }
          val kind = t match {
            case ByteType => "i1"; case ShortType => "i2"; case IntegerType => "i4"
            case LongType => "i8"; case FloatType => "f4"; case DoubleType => "f8"
          }
          OutCol(f.name, kind, buf.array(), Array.empty, bm, n)
      }
    }
    writeFile(path, cols.toSeq)
  }

  // ------------------------------------------------------------ emitter

  private def align8(x: Long): Long = (x + 7) / 8 * 8

  /** Two-phase writer: `plan` computes every object's address given a
    * metadata base; run once to size the metadata region, place data
    * after it, run again, emit. */
  private def writeFile(path: String, cols: Seq[OutCol]): Unit = {
    val patches = scala.collection.mutable.ArrayBuffer[(Long, Array[Byte])]()
    var cursor = 96L // superblock size
    def alloc(size: Long): Long = { val a = cursor; cursor = align8(cursor + size); a }
    def emit(addr: Long, bytes: Array[Byte]): Unit = patches += ((addr, bytes))

    def buf(size: Int): ByteBuffer =
      ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)

    // ---- message encoders (each body padded to 8) ----
    def msg(mType: Int, body: Array[Byte]): Array[Byte] = {
      val padded = align8(body.length).toInt
      val b = buf(8 + padded)
      b.putShort(mType.toShort); b.putShort(padded.toShort); b.putInt(0)
      b.put(body); b.array()
    }
    def dataspace1d(n: Long): Array[Byte] = {
      val b = buf(16); b.put(1.toByte); b.put(1.toByte); b.put(0.toByte)
      b.position(8); b.putLong(n); b.array()
    }
    def dataspaceScalar: Array[Byte] = {
      val b = buf(8); b.put(1.toByte); b.put(0.toByte); b.array()
    }
    def dtFixed(size: Int): Array[Byte] = {
      val b = buf(12)
      b.put(0x10.toByte)             // version 1, class 0
      b.put(0x08.toByte); b.put(0.toByte); b.put(0.toByte) // LE, signed
      b.putInt(size)
      b.putShort(0); b.putShort((size * 8).toShort)
      b.array()
    }
    def dtFloat(size: Int): Array[Byte] = {
      val b = buf(20)
      b.put(0x11.toByte)             // version 1, class 1
      b.put(0x20.toByte)             // LE, mantissa normalization 2
      b.put(if (size == 8) 63.toByte else 31.toByte) // sign bit location
      b.put(0.toByte)
      b.putInt(size)
      b.putShort(0); b.putShort((size * 8).toShort)
      if (size == 8) { b.put(52.toByte); b.put(11.toByte); b.put(0.toByte); b.put(52.toByte); b.putInt(1023) }
      else { b.put(23.toByte); b.put(8.toByte); b.put(0.toByte); b.put(23.toByte); b.putInt(127) }
      b.array()
    }
    def dtString(size: Int): Array[Byte] = {
      val b = buf(8)
      b.put(0x13.toByte)             // version 1, class 3
      b.put(0.toByte); b.put(0.toByte); b.put(0.toByte) // null-terminated, ascii
      b.putInt(math.max(size, 1))
      b.array()
    }
    def layoutContiguous(addr: Long, size: Long): Array[Byte] = {
      val b = buf(18); b.put(3.toByte); b.put(1.toByte); b.putLong(addr); b.putLong(size); b.array()
    }
    def strAttr(name: String, value: String): Array[Byte] = {
      val nameB = name.getBytes("UTF-8") :+ 0.toByte // null-terminated
      val dtB = dtString(value.length)
      val dsB = dataspaceScalar
      val b = buf((8 + align8(nameB.length) + align8(dtB.length) + align8(dsB.length)
        + math.max(value.length, 1)).toInt)
      b.put(1.toByte); b.put(0.toByte)
      b.putShort(nameB.length.toShort)
      b.putShort(dtB.length.toShort)
      b.putShort(dsB.length.toShort)
      b.put(nameB); b.position((8 + align8(nameB.length)).toInt)
      b.put(dtB); b.position((8 + align8(nameB.length) + align8(dtB.length)).toInt)
      b.put(dsB); b.position((8 + align8(nameB.length) + align8(dtB.length) + align8(dsB.length)).toInt)
      b.put(value.getBytes("UTF-8"))
      b.array()
    }
    def objectHeader(msgs: Seq[Array[Byte]]): Array[Byte] = {
      val total = msgs.map(_.length).sum
      val b = buf(16 + total)
      b.put(1.toByte); b.put(0.toByte)
      b.putShort(msgs.length.toShort)
      b.putInt(1)         // reference count
      b.putInt(total)     // header block size
      b.position(16)
      msgs.foreach(b.put)
      b.array()
    }

    /** Emit a dataset object: returns OH address. */
    def writeDataset(n: Long, dtype: Array[Byte], dataAddr: Long, dataSize: Long,
                     attrs: Seq[(String, String)]): Long = {
      val msgs = Seq(
        msg(0x0001, dataspace1d(n)),
        msg(0x0003, dtype),
        msg(0x0008, layoutContiguous(dataAddr, dataSize))) ++
        attrs.map { case (k, v) => msg(0x000C, strAttr(k, v)) }
      val bytes = objectHeader(msgs)
      val a = alloc(bytes.length)
      emit(a, bytes); a
    }

    /** Emit a symbol-table group with the given (already-allocated)
      * children; returns OH address. */
    def writeGroup(children: Seq[(String, Long)], attrs: Seq[(String, String)]): Long = {
      val sorted = children.sortBy(_._1)
      require(sorted.size <= 2 * LEAF_K * 2 * INTERNAL_K, "too many group entries")
      // local heap: offset 0 = empty string; names from offset 8
      val nameOffsets = scala.collection.mutable.Map[String, Long]()
      var off = 8L
      sorted.foreach { case (name, _) =>
        nameOffsets(name) = off
        off = align8(off + name.getBytes("UTF-8").length + 1)
      }
      val heapDataSize = align8(math.max(off, 8))
      val heapHdrAddr = alloc(32)
      val heapDataAddr = alloc(heapDataSize)
      val heapHdr = buf(32)
      heapHdr.putInt(leMagic("HEAP")); heapHdr.put(0.toByte)
      heapHdr.position(8); heapHdr.putLong(heapDataSize)
      heapHdr.putLong(UNDEF)         // no free list
      heapHdr.putLong(heapDataAddr)
      emit(heapHdrAddr, heapHdr.array())
      val heapData = buf(heapDataSize.toInt)
      sorted.foreach { case (name, _) =>
        heapData.position(nameOffsets(name).toInt)
        heapData.put(name.getBytes("UTF-8")); heapData.put(0.toByte)
      }
      emit(heapDataAddr, heapData.array())
      // SNODs: capacity 2*LEAF_K symbols each
      val snodCap = 2 * LEAF_K
      val snodGroups = sorted.grouped(snodCap).toSeq
      val snodSize = 8 + snodCap * 40
      val snodAddrs = snodGroups.map { grp =>
        val a = alloc(snodSize)
        val b = buf(snodSize)
        b.putInt(leMagic("SNOD")); b.put(1.toByte); b.put(0.toByte)
        b.putShort(grp.size.toShort)
        grp.zipWithIndex.foreach { case ((name, ohAddr), i) =>
          b.position(8 + i * 40)
          b.putLong(nameOffsets(name)); b.putLong(ohAddr); b.putInt(0)
        }
        emit(a, b.array()); a
      }
      // one level-0 btree node over the SNODs
      val maxChildren = 2 * INTERNAL_K
      require(snodAddrs.size <= maxChildren, "btree overflow")
      val btreeSize = 24 + maxChildren * 16 + 8
      val btreeAddr = alloc(btreeSize)
      val bt = buf(btreeSize)
      bt.putInt(leMagic("TREE")); bt.put(0.toByte); bt.put(0.toByte)
      bt.putShort(snodAddrs.size.toShort)
      bt.putLong(UNDEF); bt.putLong(UNDEF)
      // keys/children: key_i = first name of child i (key_0 = 0, empty)
      snodAddrs.zipWithIndex.foreach { case (sa, i) =>
        bt.position(24 + i * 16)
        bt.putLong(if (i == 0) 0L else nameOffsets(snodGroups(i).head._1))
        bt.putLong(sa)
      }
      if (snodAddrs.nonEmpty) {
        bt.position(24 + snodAddrs.size * 16)
        bt.putLong(nameOffsets(snodGroups.last.last._1)) // final key
      }
      emit(btreeAddr, bt.array())
      // symbol table message points at the heap HEADER, not its data
      val symtab = buf(16); symtab.putLong(btreeAddr); symtab.putLong(heapHdrAddr)
      val msgs = Seq(msg(0x0011, symtab.array())) ++
        attrs.map { case (k, v) => msg(0x000C, strAttr(k, v)) }
      val bytes = objectHeader(msgs)
      val a = alloc(bytes.length)
      emit(a, bytes); a
    }

    // ---- phase 1: dry-run to size the metadata region ----
    // (data addresses enter dataset headers, but header SIZES don't
    // depend on the values — run the whole plan with dataBase=0 first)
    def plan(dataBase: Long): (Long, Long) = {
      patches.clear(); cursor = 96L
      var dataCursor = dataBase
      def allocData(size: Long): Long = { val a = dataCursor; dataCursor = align8(dataCursor + size); a }
      val colGroups = cols.map { c =>
        val members = scala.collection.mutable.ArrayBuffer[(String, Long)]()
        c.kind match {
          case "str" =>
            val dAddr = allocData(c.data.length)
            val iAddr = allocData(c.indices.length)
            members += (("data", writeDataset(c.data.length, dtFixed(1), dAddr, c.data.length,
              Seq("dtype" -> "str"))))
            members += (("indices", writeDataset(c.n + 1, dtFixed(8), iAddr, c.indices.length, Nil)))
          case k =>
            val dt = k match {
              case "i1" => dtFixed(1); case "i2" => dtFixed(2)
              case "i4" => dtFixed(4); case "i8" => dtFixed(8)
              case "f4" => dtFloat(4); case "f8" => dtFloat(8)
            }
            val dAddr = allocData(c.data.length)
            members += (("data", writeDataset(c.n, dt, dAddr, c.data.length, Nil)))
        }
        if (c.bitmap.nonEmpty) {
          val bAddr = allocData(c.bitmap.length)
          members += (("null_bitmap", writeDataset(c.bitmap.length, dtFixed(1), bAddr,
            c.bitmap.length, Nil)))
        }
        (c.name, writeGroup(members.toSeq, Nil))
      }
      val columnsAddr = writeGroup(colGroups,
        Seq("column_order" -> cols.map(_.name).mkString(",")))
      val tableAddr = writeGroup(Seq(("columns", columnsAddr)), Nil)
      val rootAddr = writeGroup(Seq(("table", tableAddr)), Nil)
      (rootAddr, dataCursor)
    }
    val (_, _) = plan(0L)
    val metaEnd = cursor
    val dataBase = align8(metaEnd)
    val (rootAddr, eof) = plan(dataBase)
    require(cursor == metaEnd, "writer layout instability")

    // ---- emit ----
    val raf = new RandomAccessFile(path, "rw")
    try {
      raf.setLength(0)
      // superblock v0
      val sb = buf(96)
      sb.put(Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').map(_.toByte))
      sb.put(0.toByte); sb.put(0.toByte); sb.put(0.toByte); sb.put(0.toByte)
      sb.put(0.toByte); sb.put(8.toByte); sb.put(8.toByte); sb.put(0.toByte)
      sb.putShort(LEAF_K.toShort); sb.putShort(INTERNAL_K.toShort)
      sb.putInt(0)
      sb.putLong(0L)        // base address
      sb.putLong(UNDEF)     // free-space info
      sb.putLong(eof)       // end of file
      sb.putLong(UNDEF)     // driver info
      sb.putLong(0L)        // root STE: link name offset
      sb.putLong(rootAddr)  // root STE: object header address
      sb.putInt(0); sb.putInt(0) // cache type + reserved (scratch zeros follow)
      raf.seek(0); raf.write(sb.array())
      patches.foreach { case (addr, bytes) => raf.seek(addr); raf.write(bytes) }
      // data regions — replay the same allocation order as plan()
      var dataCursor = dataBase
      def put(bytes: Array[Byte]): Unit =
        if (bytes.nonEmpty) { raf.seek(dataCursor); raf.write(bytes); dataCursor = align8(dataCursor + bytes.length) }
        else dataCursor = align8(dataCursor)
      cols.foreach { c =>
        c.kind match {
          case "str" => put(c.data); put(c.indices)
          case _ => put(c.data)
        }
        if (c.bitmap.nonEmpty) put(c.bitmap)
      }
      raf.setLength(math.max(eof, dataCursor))
    } finally raf.close()
  }
}
