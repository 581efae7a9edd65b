package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Delta Lake deletion vectors — dependency-free reader/writer for
  * the public formats (delta-io PROTOCOL.md "Deletion Vectors"):
  *
  *  - the 64-bit RoaringBitmapArray "portable" serialization
  *    (magic 1681511377, int64 LE bitmap count, then each 32-bit
  *    bitmap in the standard interoperable roaring format per
  *    RoaringFormatSpec — array / bitmap / run containers),
  *  - the DV file framing (1-byte format version, then per DV:
  *    int32 BE size, payload, int32 BE CRC-32 of the payload),
  *  - the Z85 text encoding used for inline DVs and the random-UUID
  *    relative file names.
  *
  * Scale contract: a DV is per-FILE metadata, roaring-compressed —
  * the reader materializes a compact membership structure per
  * DV-carrying file driver-side and ships it to the scan tasks via
  * `addReferenceObj` (the [[DvDeleted]] expression), so the row-level
  * anti-filter runs inside whole-stage codegen against
  * `_metadata.row_index` with no shuffle and no join. Total driver
  * memory is bounded by the sum of the DV payload sizes of the files
  * that SURVIVE stats skipping, not by table size.
  *
  * The spec tests pin both directions against org.roaringbitmap
  * (Spark's own classpath copy): their serialize -> our parse, our
  * serialize -> their deserialize.
  */
private[graft] object RoaringDv {

  private val Magic = 1681511377
  private val SerialCookie = 12347
  private val SerialCookieNoRun = 12346
  private val NoOffsetThreshold = 4

  // ------------------------------------------------------------------
  // Membership structures
  // ------------------------------------------------------------------

  /** One 32-bit roaring bitmap: per-container key (high 16 bits) plus
    * a container payload — `Array[Char]` sorted values (array),
    * `Array[Long]` 1024 words (bitmap), or `Array[Char]` interleaved
    * (start, lengthMinus1) pairs (run). Char IS the unsigned 16-bit
    * type, so natural ordering == roaring's unsigned ordering. */
  private final class Bitmap32(
      val keys: Array[Char], val containers: Array[AnyRef])
      extends Serializable {
    def contains(v: Int): Boolean = {
      val key = (v >>> 16).toChar
      val i = java.util.Arrays.binarySearch(keys, key)
      if (i < 0) return false
      val low = (v & 0xffff).toChar
      containers(i) match {
        case a: Array[Char] if isRun(i) => runContains(a, low)
        case a: Array[Char] => java.util.Arrays.binarySearch(a, low) >= 0
        case w: Array[Long] => (w(low >> 6) & (1L << (low & 63))) != 0
      }
    }
    // run containers are marked by a parallel bitset to keep the
    // payload a bare array (codegen-friendly, no per-container object)
    private var runFlags: Array[Long] = null
    private def isRun(i: Int): Boolean =
      runFlags != null && (runFlags(i >> 6) & (1L << (i & 63))) != 0
    private[RoaringDv] def markRun(i: Int): Unit = {
      if (runFlags == null) runFlags = new Array[Long]((keys.length + 63) >> 6)
      runFlags(i >> 6) |= 1L << (i & 63)
    }
    private def runContains(runs: Array[Char], low: Char): Boolean = {
      // binary search over run starts (even positions)
      var lo = 0
      var hi = runs.length / 2 - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val start = runs(2 * mid)
        if (start > low) hi = mid - 1
        else if (low - start <= runs(2 * mid + 1)) return true
        else lo = mid + 1
      }
      false
    }
  }

  /** A deserialized deletion vector: membership over 64-bit row
    * indexes (bitmap i covers [i*2^32, (i+1)*2^32)). */
  final class Dv private[RoaringDv] (
      private val bitmaps: Array[Bitmap32], val cardinality: Long)
      extends Serializable {
    def contains(rowIndex: Long): Boolean = {
      val hi = (rowIndex >>> 32).toInt
      hi < bitmaps.length && bitmaps(hi) != null &&
        bitmaps(hi).contains(rowIndex.toInt)
    }
  }

  // Bitmap32 carries arrays only; mark Dv serializable for task ship.

  // ------------------------------------------------------------------
  // Parse (the read path)
  // ------------------------------------------------------------------

  /** Parse a DV payload (the bytes `add.deletionVector.sizeInBytes`
    * covers): int32 LE magic, int64 LE bitmap count, then each 32-bit
    * bitmap in the standard roaring serialization. */
  def parse(data: Array[Byte]): Dv = {
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt
    require(magic == Magic,
      s"deletion vector magic $magic != $Magic (not the portable format)")
    val n = bb.getLong
    require(n >= 0 && n <= (1 << 20), s"implausible DV bitmap count $n")
    var card = 0L
    val bitmaps = new Array[Bitmap32](n.toInt)
    var i = 0
    while (i < n) {
      val (bm, c) = parseBitmap32(bb)
      bitmaps(i) = bm
      card += c
      i += 1
    }
    require(!bb.hasRemaining,
      s"${bb.remaining()} trailing bytes after ${n} DV bitmaps")
    new Dv(bitmaps, card)
  }

  /** Standard 32-bit roaring serialization (RoaringFormatSpec),
    * little-endian, starting at the buffer's position. */
  private def parseBitmap32(bb: ByteBuffer): (Bitmap32, Long) = {
    val base = bb.position()
    val cookie = bb.getInt
    val (size, runBits) =
      if ((cookie & 0xffff) == SerialCookie) {
        val s = (cookie >>> 16) + 1
        val bits = new Array[Byte]((s + 7) / 8)
        bb.get(bits)
        (s, bits)
      } else if (cookie == SerialCookieNoRun) {
        (bb.getInt, null)
      } else throw new IllegalArgumentException(
        s"bad roaring cookie $cookie at byte $base")
    require(size >= 0 && size <= 65536, s"implausible container count $size")
    val keys = new Array[Char](size)
    val cards = new Array[Int](size)
    var i = 0
    while (i < size) {
      keys(i) = bb.getChar
      cards(i) = (bb.getChar: Int) + 1
      i += 1
    }
    require(keys.toSeq == keys.toSeq.sorted,
      "roaring container keys out of order")
    if (runBits == null || size >= NoOffsetThreshold)
      bb.position(bb.position() + 4 * size) // offset header (unused: sequential read)
    val containers = new Array[AnyRef](size)
    val bm = new Bitmap32(keys, containers)
    var card = 0L
    i = 0
    while (i < size) {
      val isRun = runBits != null && (runBits(i / 8) & (1 << (i % 8))) != 0
      if (isRun) {
        val nRuns: Int = bb.getChar
        val runs = new Array[Char](2 * nRuns)
        var j = 0
        while (j < 2 * nRuns) { runs(j) = bb.getChar; j += 1 }
        containers(i) = runs
        bm.markRun(i)
        var c = 0L
        j = 0
        while (j < nRuns) { c += (runs(2 * j + 1): Int) + 1; j += 1 }
        card += c
      } else if (cards(i) <= 4096) {
        val a = new Array[Char](cards(i))
        var j = 0
        while (j < a.length) { a(j) = bb.getChar; j += 1 }
        containers(i) = a
        card += a.length
      } else {
        val w = new Array[Long](1024)
        var j = 0
        while (j < 1024) { w(j) = bb.getLong; j += 1 }
        containers(i) = w
        card += cards(i)
      }
      i += 1
    }
    (bm, card)
  }

  // ------------------------------------------------------------------
  // Serialize (fixture/foreign-table builder + round-trip specs)
  // ------------------------------------------------------------------

  /** Serialize sorted distinct non-negative row indexes as a portable
    * RoaringBitmapArray payload (the bytes the DV framing wraps).
    * Emits the no-run-container format: array containers <= 4096
    * values, bitmap containers above. */
  def serialize(rows: Array[Long]): Array[Byte] = {
    require(rows.forall(_ >= 0), "row indexes must be non-negative")
    val sorted = rows.distinct.sorted
    val nBm = if (sorted.isEmpty) 0L else (sorted.last >>> 32) + 1
    require(nBm <= (1 << 20), s"implausible DV bitmap count $nBm")
    val out = new java.io.ByteArrayOutputStream()
    val head = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    head.putInt(Magic).putLong(nBm)
    out.write(head.array())
    var i = 0
    var bmIdx = 0L
    while (bmIdx < nBm) {
      val from = i
      while (i < sorted.length && (sorted(i) >>> 32) == bmIdx) i += 1
      out.write(serializeBitmap32(sorted, from, i))
      bmIdx += 1
    }
    out.toByteArray
  }

  /** Serialize a high-32-bucket -> 32-bit-RoaringBitmap decomposition
    * (the [[DvBitmapAgg]] buffer) as the portable RoaringBitmapArray
    * payload, plus its cardinality. Gap buckets emit the same empty
    * 8-byte form [[serialize]] writes; present buckets serialize via
    * org.roaringbitmap's own standard-format writer (LE, interoperable
    * — the library the format specs pin against). */
  def serializeBuckets(
      buckets: java.util.TreeMap[Integer, org.roaringbitmap.RoaringBitmap])
      : (Array[Byte], Long) = {
    val nBm: Long =
      if (buckets.isEmpty) 0L else buckets.lastKey().longValue() + 1
    require(nBm <= (1 << 20), s"implausible DV bitmap count $nBm")
    if (!buckets.isEmpty)
      require(buckets.firstKey() >= 0, s"negative bucket ${buckets.firstKey()}")
    val bos = new java.io.ByteArrayOutputStream()
    val head = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    head.putInt(Magic).putLong(nBm)
    bos.write(head.array())
    var card = 0L
    val out = new java.io.DataOutputStream(bos)
    var bmIdx = 0
    while (bmIdx < nBm) {
      val bm = buckets.get(Integer.valueOf(bmIdx))
      if (bm == null) {
        // empty bucket: no-run cookie + zero containers (8 bytes)
        val empty = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        empty.putInt(SerialCookieNoRun).putInt(0)
        bos.write(empty.array())
      } else {
        bm.serialize(out)
        card += bm.getLongCardinality
      }
      bmIdx += 1
    }
    out.flush()
    (bos.toByteArray, card)
  }

  private def serializeBitmap32(vals: Array[Long], from: Int, until: Int): Array[Byte] = {
    // group by high-16 key
    val groups = Seq.newBuilder[(Char, Array[Char])]
    var i = from
    while (i < until) {
      val key = ((vals(i).toInt) >>> 16).toChar
      val start = i
      while (i < until && ((vals(i).toInt) >>> 16).toChar == key) i += 1
      val a = new Array[Char](i - start)
      var j = 0
      while (j < a.length) { a(j) = (vals(start + j).toInt & 0xffff).toChar; j += 1 }
      groups += ((key, a))
    }
    val gs = groups.result()
    val size = gs.size
    // layout: cookie+count, desc header, offset header, containers
    val contBytes = gs.map { case (_, a) =>
      if (a.length <= 4096) 2 * a.length else 8192 }
    val headerLen = 8 + 4 * size + 4 * size
    val bb = ByteBuffer.allocate(headerLen + contBytes.sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(SerialCookieNoRun).putInt(size)
    gs.foreach { case (k, a) => bb.putChar(k).putChar((a.length - 1).toChar) }
    var off = headerLen
    contBytes.foreach { len => bb.putInt(off); off += len }
    gs.foreach { case (_, a) =>
      if (a.length <= 4096) a.foreach(bb.putChar)
      else {
        val words = new Array[Long](1024)
        a.foreach(c => words(c >> 6) |= 1L << (c & 63))
        words.foreach(bb.putLong)
      }
    }
    bb.array()
  }

  // ------------------------------------------------------------------
  // DV file framing
  // ------------------------------------------------------------------

  /** Read one DV's payload out of a DV file: at `offset` an int32 BE
    * size (must equal `sizeInBytes`), the payload, then an int32 BE
    * CRC-32 of the payload (verified). */
  def readFromFile(path: String, offset: Int, sizeInBytes: Int): Array[Byte] = {
    val in = FsIO.open(path)
    try {
      in.skipNBytes(offset)
      val head = in.readNBytes(4)
      require(head.length == 4, s"truncated DV at $path:$offset")
      val len = ByteBuffer.wrap(head).order(ByteOrder.BIG_ENDIAN).getInt
      require(len == sizeInBytes,
        s"DV size at $path:$offset is $len, descriptor says $sizeInBytes")
      val data = in.readNBytes(len)
      require(data.length == len, s"truncated DV payload at $path:$offset")
      val tail = in.readNBytes(4)
      require(tail.length == 4, s"truncated DV checksum at $path:$offset")
      val want = ByteBuffer.wrap(tail).order(ByteOrder.BIG_ENDIAN).getInt
      val crc = new CRC32()
      crc.update(data)
      require(crc.getValue.toInt == want,
        s"DV checksum mismatch at $path:$offset")
      data
    } finally in.close()
  }

  /** Write DV payloads as one DV file (version byte 1, then framed
    * payloads); returns (offset, sizeInBytes) per payload in order —
    * the foreign-fixture builder's half of [[readFromFile]]. */
  def writeFile(path: String, payloads: Seq[Array[Byte]]): Seq[(Int, Int)] = {
    val out = FsIO.create(path)
    try {
      out.write(1) // format version
      var pos = 1
      payloads.map { data =>
        val off = pos
        val crc = new CRC32()
        crc.update(data)
        val bb = ByteBuffer.allocate(8 + data.length).order(ByteOrder.BIG_ENDIAN)
        bb.putInt(data.length)
        bb.put(data)
        bb.putInt(crc.getValue.toInt)
        out.write(bb.array())
        pos += 8 + data.length
        (off, data.length)
      }
    } finally out.close()
  }

  // ------------------------------------------------------------------
  // Z85 (the ZeroMQ base-85 alphabet the protocol specifies)
  // ------------------------------------------------------------------

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Decode: Array[Int] = {
    val d = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => d(c.toInt) = i }
    d
  }

  /** Decode Z85 text (length % 5 == 0) to bytes (len/5*4). */
  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 length ${s.length} not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Decode(c.toInt) else -1
        require(d >= 0, s"invalid z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      require(v <= 0xffffffffL, s"z85 group overflows 32 bits at $i")
      val o = i / 5 * 4
      out(o) = (v >>> 24).toByte
      out(o + 1) = (v >>> 16).toByte
      out(o + 2) = (v >>> 8).toByte
      out(o + 3) = v.toByte
      i += 5
    }
    out
  }

  /** Encode bytes (length % 4 == 0) as Z85 text. */
  def z85Encode(b: Array[Byte]): String = {
    require(b.length % 4 == 0, s"z85 input length ${b.length} not a multiple of 4")
    val sb = new java.lang.StringBuilder(b.length / 4 * 5)
    var i = 0
    while (i < b.length) {
      var v = ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
      val grp = new Array[Char](5)
      var j = 4
      while (j >= 0) { grp(j) = Z85Alphabet((v % 85).toInt); v /= 85; j -= 1 }
      sb.append(grp)
      i += 4
    }
    sb.toString
  }

  /** `u`-storage relative DV path: pathOrInlineDv is
    * `<random prefix><20-char z85 UUID>`; the file lives at
    * `<table>/[<prefix>/]deletion_vector_<canonical uuid>.bin`. */
  def relativeDvPath(pathOrInlineDv: String): String = {
    require(pathOrInlineDv.length >= 20,
      s"u-storage pathOrInlineDv too short: $pathOrInlineDv")
    val prefix = pathOrInlineDv.dropRight(20)
    val bytes = z85Decode(pathOrInlineDv.takeRight(20))
    val bb = ByteBuffer.wrap(bytes)
    val uuid = new java.util.UUID(bb.getLong, bb.getLong)
    val name = s"deletion_vector_$uuid.bin"
    if (prefix.isEmpty) name else s"$prefix/$name"
  }

  /** The inverse (fixture builder): encode a UUID (+ optional prefix)
    * as the `u`-storage pathOrInlineDv string. */
  def encodeDvPath(uuid: java.util.UUID, prefix: String = ""): String = {
    val bb = ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    prefix + z85Encode(bb.array())
  }
}

/** `(file_path: string, row_index: bigint) -> boolean`: is the row
  * deleted by its file's deletion vector? The per-file [[RoaringDv.Dv]]
  * map rides into codegen via `addReferenceObj`; a file path MISSING
  * from the map is a loud error — this expression only ever runs over
  * scans restricted to DV-carrying files, so a miss means a path-
  * normalization bug that would otherwise silently resurrect deleted
  * rows. The map is keyed by [[UTF8String]] so the per-row probe is
  * allocation-free (no toString in the hot loop). */
private[graft] case class DvDeleted(
    left: Expression, right: Expression,
    dvs: java.util.HashMap[UTF8String, RoaringDv.Dv]) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, bigint), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "dv_deleted"
  override def nullSafeEval(p: Any, i: Any): Any =
    DvDeleted.probe(p.asInstanceOf[UTF8String], i.asInstanceOf[Long], dvs)
  override def eval(input: InternalRow): Any = {
    val p = left.eval(input)
    val i = right.eval(input)
    require(p != null && i != null,
      s"$prettyName: _metadata columns are never null")
    nullSafeEval(p, i)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dvMap", dvs, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, (p, i) =>
      s"${ev.value} = graft.sources.DvDeleted.probe($p, $i, $ref);")
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DvDeleted = copy(left = l, right = r)
}

private[graft] object DvDeleted {
  /** Static probe target for generated code. */
  def probe(path: UTF8String, rowIndex: Long,
      dvs: java.util.HashMap[UTF8String, RoaringDv.Dv]): Boolean = {
    val dv = dvs.get(path)
    if (dv == null) throw new IllegalStateException(
      s"no deletion vector for scanned file $path — path normalization " +
        "mismatch between the Delta log and _metadata.file_path")
    dv.contains(rowIndex)
  }
}

/** dv_bitmap_agg(row_index) -> struct<payload: binary, cardinality:
  * bigint>: per-group (per-FILE) roaring-bitmap union aggregate for
  * [[graft.sources.DeltaLake.deleteWhere]]'s DV-emitting path.
  *
  * Why an aggregate and not `sort_array(collect_list(...))`: the
  * collect_list buffer holds every deleted row index of one file —
  * 8 bytes per deleted row IN ONE aggregation buffer, so a 90%-delete
  * of a multi-GB file concentrates hundreds of MB in a single task.
  * Here the buffer IS the compressed bitmap (org.roaringbitmap, on
  * Spark's classpath — the same library the format spec tests pin
  * against): update adds one row index, partial buffers shuffle as
  * their serialized form, merge is a bitmap OR, and eval renders the
  * portable RoaringBitmapArray payload directly from the containers —
  * executor memory is bounded by the COMPRESSED payload at every
  * stage. Container choice (array <= 4096 values, bitmap above, no
  * run containers — runOptimize is deliberately not called) matches
  * [[RoaringDv.serialize]], so the two paths emit byte-identical
  * payloads (spec-pinned).
  *
  * Buffer: high-32-bits bucket -> 32-bit RoaringBitmap, exactly the
  * RoaringBitmapArray decomposition the portable format serializes. */
private[graft] case class DvBitmapAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[java.util.TreeMap[Integer,
      org.roaringbitmap.RoaringBitmap]] {
  import org.roaringbitmap.RoaringBitmap

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.BinaryType, nullable = false),
      org.apache.spark.sql.types.StructField("cardinality",
        LongType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint row indexes, got ${t.catalogString}")
  }

  override def createAggregationBuffer()
      : java.util.TreeMap[Integer, RoaringBitmap] =
    new java.util.TreeMap[Integer, RoaringBitmap]()

  override def update(
      buf: java.util.TreeMap[Integer, RoaringBitmap],
      row: InternalRow): java.util.TreeMap[Integer, RoaringBitmap] = {
    val v = child.eval(row)
    if (v != null) {
      val ri = v.asInstanceOf[Long]
      require(ri >= 0, s"$prettyName: negative row index $ri")
      require((ri >>> 32) < (1 << 20), s"$prettyName: implausible row index $ri")
      var bm = buf.get(Integer.valueOf((ri >>> 32).toInt))
      if (bm == null) {
        bm = new RoaringBitmap()
        buf.put(Integer.valueOf((ri >>> 32).toInt), bm)
      }
      bm.add(ri.toInt) // low 32 bits, unsigned semantics
    }
    buf
  }

  override def merge(
      a: java.util.TreeMap[Integer, RoaringBitmap],
      b: java.util.TreeMap[Integer, RoaringBitmap])
      : java.util.TreeMap[Integer, RoaringBitmap] = {
    b.forEach { (k, bm) =>
      val mine = a.get(k)
      if (mine == null) a.put(k, bm) else mine.or(bm)
    }
    a
  }

  override def eval(
      buf: java.util.TreeMap[Integer, RoaringBitmap]): Any = {
    val (payload, card) = RoaringDv.serializeBuckets(buf)
    InternalRow(payload, card)
  }

  override def serialize(
      buf: java.util.TreeMap[Integer, RoaringBitmap]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size())
    buf.forEach { (k, bm) =>
      out.writeInt(k)
      bm.serialize(out)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.TreeMap[Integer, RoaringBitmap] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.TreeMap[Integer, RoaringBitmap]()
    var i = 0
    while (i < n) {
      val k = in.readInt()
      val bm = new RoaringBitmap()
      bm.deserialize(in)
      buf.put(Integer.valueOf(k), bm)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): DvBitmapAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DvBitmapAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c(0))
  override def prettyName: String = "dv_bitmap_agg"
}
