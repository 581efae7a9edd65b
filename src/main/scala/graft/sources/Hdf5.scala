package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Dependency-free HDF5 support for the vaex file layout — the
  * reference's NATIVE store (reference: packages/vaex-hdf5/vaex/hdf5/
  * writer.py:28-87 table/columns group layout; dataset.py:186-214 root
  * dispatch, :393-416 arrow-style string columns + null_bitmap).
  *
  * Implemented directly against the public HDF5 File Format
  * Specification (v1.0 structures): superblock v0/v1, version-1 object
  * headers (+ continuation blocks), old-style symbol-table groups
  * (B-tree v1 + local heap + SNOD), dataspace v1/v2, datatype classes
  * fixed-point/float/string, data layouts v3 contiguous, COMPACT and
  * CHUNKED (B-tree v1 type-1 chunk index, any depth) with the deflate
  * (gzip) and shuffle filters — the combination virtually all
  * h5py-written scientific files in the wild use (the reference reads
  * them through h5py, packages/vaex-hdf5/vaex/hdf5/dataset.py:57).
  *
  * Scale design: READ is distributed — the driver parses only metadata
  * (superblock, group tree, dataset headers, chunk index: KBs, ~24 B
  * per chunk), then executors read disjoint row ranges of each column
  * with positioned reads. Contiguous layout ⇒ range [i,j) of column c
  * lives at dataAddr + i·elemSize — the same arithmetic the
  * reference's mmap model uses (reference:
  * packages/vaex-core/vaex/dataset_mmap.py:28). Chunked layout ⇒ each
  * task touches only the chunks overlapping its row range and
  * inflates them IN the executor (per-chunk gzip is embarrassingly
  * parallel; only partition-boundary chunks are read twice). Column
  * pruning happens at metadata time: unrequested columns are never
  * touched. WRITE is a driver-side single-file interchange sink (one
  * .hdf5 file is inherently one writer), mirroring the reference's
  * own single-file export; the scale path for persistence is parquet.
  */
object Hdf5 {

  private val UNDEF = -1L // 0xFFFF…FF per spec ("undefined address")
  private val LEAF_K = 4      // SNOD capacity = 2·LEAF_K symbols
  private val INTERNAL_K = 16 // B-tree node capacity = 2·INTERNAL_K children

  // ------------------------------------------------------------------
  // storage + column model shared by reader and writer
  // ------------------------------------------------------------------

  /** Where a dataset's elements live. Serializable: shipped to
    * executors inside the scan closure. */
  sealed trait Storage extends Serializable
  /** Elements at `addr + i·elemSize`. */
  final case class Contiguous(addr: Long) extends Storage
  /** Small dataset stored inline in its object header. */
  final case class Inline(bytes: Array[Byte]) extends Storage
  /** One stored chunk: first element index, file address, stored
    * (possibly compressed) byte count, per-chunk filter skip mask. */
  final case class ChunkLoc(elemStart: Long, addr: Long, storedSize: Int, mask: Int)
  /** Chunked layout: fixed `chunkElems` elements per chunk; `filters`
    * = (filterId, firstClientValue) in WRITE order (deflate=1,
    * shuffle=2); `chunks` sorted by elemStart. */
  final case class Chunked(chunkElems: Long, filters: Seq[(Int, Int)],
                           chunks: Array[ChunkLoc]) extends Storage

  private val SupportedFilters = Set(1, 2) // deflate, shuffle

  /** Element kinds: i1/i2/i4/i8 signed fixed-point, f4/f8 IEEE floats,
    * str = arrow-style (int64 offsets + utf8 bytes), fstr = HDF5
    * fixed-size string (`fixedStrSize` null-padded bytes/element — the
    * h5py `S<n>` dtype). */
  final case class ColumnMeta(
      name: String, kind: String, n: Long,
      data: Storage, dataSize: Long,
      indices: Option[Storage],  // str only, n+1 int64 offsets
      bitmap: Option[Storage],   // None when column has no null bitmap
      fixedStrSize: Int = 0,
      file: Option[String] = None, // set when the column's storage
                                   // lives in ANOTHER file (external link)
      // compound-member columns: the dataset stores interleaved
      // records of `stride` bytes; this column's value sits at
      // `fieldOff` within each record. 0 = plain packed column.
      stride: Int = 0,
      fieldOff: Int = 0) {
    def nullable: Boolean = bitmap.isDefined
    def sparkType: DataType = kind match {
      case "b1" => BooleanType
      case "i1" => ByteType
      case "i2" => ShortType
      case "i4" => IntegerType
      case "i8" => LongType
      case "f4" => FloatType
      case "f8" => DoubleType
      case "str" | "fstr" | "vstr" => StringType
      case k if k.startsWith("vseq_") || k.startsWith("mat_") =>
        ArrayType(k.substring(k.indexOf('_') + 1) match {
          case "i1" => ByteType; case "i2" => ShortType
          case "i4" => IntegerType; case "i8" => LongType
          case "f4" => FloatType; case "f8" => DoubleType
          case b => throw new IllegalArgumentException(s"bad array base kind: $b")
        })
      case k => throw new IllegalArgumentException(s"unsupported hdf5 column kind: $k")
    }
    def elemSize: Int = kind match {
      case "b1" => 1
      case "i1" => 1; case "i2" => 2; case "i4" => 4
      case "i8" | "str" => 8; case "f4" => 4; case "f8" => 8
      case "fstr" => fixedStrSize
      // hvl descriptor: len(4) + gheap addr(8) + index(4)
      case "vstr" => 16
      case k if k.startsWith("vseq_") => 16
      // matrix column: one (width = fixedStrSize) row of base elements
      case k if k.startsWith("mat_") =>
        fixedStrSize * (k.substring(4) match {
          case "i1" => 1; case "i2" => 2; case "i4" => 4; case "i8" => 8
          case "f4" => 4; case "f8" => 8
        })
    }
  }

  // ==================================================================
  // READER
  // ==================================================================

  private[sources] final case class Dtype(clazz: Int, size: Int, signed: Boolean,
                                          vlenBase: Option[Dtype] = None,
                                          // compound (class 6) members:
                                          // (name, byteOffset, type)
                                          members: Seq[(String, Int, Dtype)] = Nil)
  private[sources] final case class DsetMeta(dims: Seq[Long], dt: Dtype, storage: Storage,
                                             dataSize: Long, attrs: Map[String, String])

  /** Unresolved group-link target: hard (in-file address), soft
    * (in-file path), or external (another file + path within it). */
  private[sources] sealed trait LinkTarget
  private[sources] final case class LinkHard(addr: Long) extends LinkTarget
  private[sources] final case class LinkSoft(target: String) extends LinkTarget
  private[sources] final case class LinkExternal(file: String, objPath: String)
    extends LinkTarget

  /** Driver-side metadata parser. Reads only header structures.
    * Hardened against corrupt/hostile files: every metadata read is
    * size-capped, name scans are length-capped, and both B-tree walks
    * carry a visited-set — a flipped byte yields a clear exception,
    * never an unbounded allocation, scan, or recursion. */
  final class H5File(path: String) extends AutoCloseable {
    private val raf = new FsIO.In(path)

    /** Largest single metadata structure we'll ever buffer (64 MB —
      * real headers are KBs; a corrupt length must not OOM). */
    private val MaxMetaRead = 1 << 26

    private def readAt(addr: Long, len: Int): ByteBuffer = {
      if (addr < 0 || len < 0 || len > MaxMetaRead)
        throw new IllegalStateException(
          s"$path: implausible metadata region (addr=$addr len=$len) — corrupt file")
      val b = new Array[Byte](len)
      raf.seek(addr); raf.readFully(b)
      ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    }

    /** root object header address. Superblock v0/v1 (libver earliest,
      * h5py default) and v2/v3 (libver latest) layouts. */
    val rootAddr: Long = {
      val sig = readAt(0, 8)
      val expect = Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').map(_.toByte)
      require((0 until 8).forall(i => sig.get(i) == expect(i)), s"$path: not an HDF5 file")
      val ver = readAt(8, 1).get(0) & 0xff
      ver match {
        case 0 | 1 =>
          val sizes = readAt(13, 2)
          require(sizes.get(0) == 8 && sizes.get(1) == 8,
            s"$path: only 8-byte offsets/lengths supported")
          // v0: superblock fixed part ends at 24; v1 adds 4 bytes (indexed
          // storage internal node K + reserved) before the addresses
          val addrBase = if (ver == 0) 24 else 28
          // base(8) free-space(8) eof(8) driver-info(8) then root STE
          val steAddr = addrBase + 32
          readAt(steAddr + 8, 8).getLong // STE: link-name-offset(8), OH addr(8)
        case 2 | 3 =>
          // ver(1) offSize(1) lenSize(1) flags(1) base(8) ext(8) eof(8)
          // rootOH(8) checksum(4)
          val sizes = readAt(9, 2)
          require(sizes.get(0) == 8 && sizes.get(1) == 8,
            s"$path: only 8-byte offsets/lengths supported")
          readAt(36, 8).getLong
        case v => throw new IllegalArgumentException(
          s"$path: superblock version $v unsupported")
      }
    }

    /** Little-endian unsigned int of 1..8 bytes from a buffer (the
      * latest-format structures size many fields minimally, so odd
      * widths like 3 or 5 occur in real files). */
    private def getUint(b: ByteBuffer, size: Int): Long = {
      require(size >= 1 && size <= 8, s"bad uint width $size")
      var v = 0L
      var i = 0
      while (i < size) { v |= (b.get() & 0xffL) << (8 * i); i += 1 }
      v
    }

    /** All header messages of an object header, v1 or v2 ("OHDR"),
      * following continuation blocks. Returns (type, body) pairs. */
    def messages(ohAddr: Long): Seq[(Int, Array[Byte])] =
      if (readAt(ohAddr, 4).getInt(0) == leMagic("OHDR")) messagesV2(ohAddr)
      else messagesV1(ohAddr)

    /** Version-2 object header (libver latest): OHDR prefix with
      * optional time/attr-phase fields, variable-width chunk-0 size,
      * 4-byte message headers (+2 with the creation-order flag), OCHK
      * continuation blocks, trailing lookup3 checksums (not verified —
      * integrity comes from the size caps and structural requires). */
    private def messagesV2(ohAddr: Long): Seq[(Int, Array[Byte])] = {
      val head = readAt(ohAddr, 6)
      require((head.get(4) & 0xff) == 2,
        s"$path: OHDR version ${head.get(4) & 0xff} unsupported")
      val flags = head.get(5) & 0xff
      var pos = ohAddr + 6
      if ((flags & 0x20) != 0) pos += 16 // access/mod/change/birth times
      if ((flags & 0x10) != 0) pos += 4  // attribute phase-change limits
      val szBytes = 1 << (flags & 0x3)
      val chunk0 = getUint(readAt(pos, szBytes), szBytes)
      pos += szBytes
      val hdrSize = if ((flags & 0x04) != 0) 6 else 4 // + creation order
      val out = scala.collection.mutable.ArrayBuffer[(Int, Array[Byte])]()
      var blocks = List((pos, chunk0))
      var blocksSeen = 0
      while (blocks.nonEmpty) {
        blocksSeen += 1
        if (blocksSeen > 4096)
          throw new IllegalStateException(s"$path: header continuation loop")
        val (bAddr, bLen) = blocks.head
        blocks = blocks.tail
        val buf = readAt(bAddr, bLen.toInt)
        while (buf.remaining() >= hdrSize) {
          val mType = buf.get() & 0xff
          val mSize = buf.getShort() & 0xffff
          buf.get() // message flags
          if ((flags & 0x04) != 0) buf.getShort() // creation order
          if (buf.remaining() < mSize)
            throw new IllegalStateException(s"$path: truncated v2 message")
          val body = new Array[Byte](mSize)
          buf.get(body)
          if (mType == 0x10) { // continuation: offset(8) + length(8)
            val cb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
            val cAddr = cb.getLong; val cLen = cb.getLong
            // OCHK block: sig(4) + messages + checksum(4)
            require(readAt(cAddr, 4).getInt(0) == leMagic("OCHK"),
              s"$path: bad OCHK signature")
            require(cLen >= 8, s"$path: implausible continuation block")
            blocks = blocks :+ ((cAddr + 4, cLen - 8))
          } else if (mType != 0x00) out += ((mType, body))
        }
      }
      out.toSeq
    }

    /** All header messages of a v1 object header, following
      * continuation blocks. Returns (type, body) pairs. */
    private def messagesV1(ohAddr: Long): Seq[(Int, Array[Byte])] = {
      val head = readAt(ohAddr, 16)
      val version = head.get(0) & 0xff
      require(version == 1, s"object header v$version unsupported")
      val nMsgs = head.getShort(2) & 0xffff
      val blockSize = head.getInt(8)
      val out = scala.collection.mutable.ArrayBuffer[(Int, Array[Byte])]()
      // queue of (addr, len) message blocks; first block starts at +16
      var blocks = List((ohAddr + 16, blockSize.toLong))
      var blocksSeen = 0
      while (blocks.nonEmpty && out.size < nMsgs) {
        blocksSeen += 1
        if (blocksSeen > 4096) // corrupt continuation cycle
          throw new IllegalStateException(s"$path: header continuation loop")
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

    def isGroup(ohAddr: Long): Boolean = messages(ohAddr).exists(m =>
      m._1 == 0x0011 || m._1 == 0x0002 || m._1 == 0x0006 || m._1 == 0x000A)

    /** One link message (0x0006, new-style groups): hard (object
      * header address), soft (in-file target path), or external
      * (type 64: target FILE name + object path within it — resolved
      * by [[Hdf5.readTable]], which owns cross-file opens). */
    private def parseLink(body: Array[Byte]): (String, LinkTarget) = {
      val b = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
      val ver = b.get() & 0xff
      require(ver == 1, s"$path: link message v$ver unsupported")
      val flags = b.get() & 0xff
      val ltype = if ((flags & 0x08) != 0) b.get() & 0xff else 0
      if ((flags & 0x04) != 0) b.getLong // creation order
      if ((flags & 0x10) != 0) b.get()   // charset
      val nameLen = getUint(b, 1 << (flags & 0x3))
      require(nameLen >= 0 && nameLen <= 65535 && nameLen <= b.remaining(),
        s"$path: implausible link name length $nameLen")
      val name = new Array[Byte](nameLen.toInt); b.get(name)
      ltype match {
        case 0 => (new String(name, "UTF-8"), LinkHard(b.getLong))
        case 1 => // soft: 2-byte length + target path (not NUL-terminated)
          val tLen = b.getShort & 0xffff
          require(tLen <= b.remaining(), s"$path: truncated soft link")
          val t = new Array[Byte](tLen); b.get(t)
          (new String(name, "UTF-8"), LinkSoft(new String(t, "UTF-8")))
        case 64 => // external: 2-byte value length, then a version/flags
          // byte (both 0) + NUL-terminated file name + NUL-terminated
          // object path within that file
          val vLen = b.getShort & 0xffff
          require(vLen >= 3 && vLen <= b.remaining(), s"$path: truncated external link")
          val v = new Array[Byte](vLen); b.get(v)
          require((v(0) & 0xf0) == 0, s"$path: external link version ${(v(0) & 0xf0) >> 4}")
          val nul1 = v.indexOf(0.toByte, 1)
          require(nul1 > 1, s"$path: external link missing file name terminator")
          val nul2 = v.indexOf(0.toByte, nul1 + 1)
          require(nul2 > nul1 + 1, s"$path: external link missing object path")
          (new String(name, "UTF-8"),
            LinkExternal(new String(v, 1, nul1 - 1, "UTF-8"),
              new String(v, nul1 + 1, nul2 - nul1 - 1, "UTF-8")))
        case t => throw new IllegalArgumentException(
          s"$path: link type $t unsupported (hard/soft/external links only)")
      }
    }

    /** Resolve a soft-link target path to an object header address:
      * absolute paths walk from the root group, relative from `base`.
      * A dangling target yields None (the link is skipped, h5py
      * listing semantics); chains deeper than 16 hops — a cycle in
      * any sane file — error out. A soft chain that lands on an
      * EXTERNAL link stops unresolved (cross-file resolution belongs
      * to the table-level traversal, which owns file opens). */
    private def resolvePath(base: Long, target: String, depth: Int): Option[Long] = {
      require(depth < 16, s"$path: soft-link chain deeper than 16 (cycle?)")
      val start = if (target.startsWith("/")) rootAddr else base
      val segs = target.split("/").toSeq.filter(s => s.nonEmpty && s != ".")
      segs.foldLeft(Option(start)) { (cur, seg) =>
        cur.flatMap { a =>
          if (!isGroup(a)) None
          else rawChildren(a).collectFirst { case (n, e) if n == seg => e }
            .flatMap {
              case LinkHard(addr)       => Some(addr)
              case LinkSoft(target2)    => resolvePath(a, target2, depth + 1)
              case LinkExternal(_, _)   => None
            }
        }
      }
    }

    /** An absolute (or root-relative) object path to either an object
      * header address (Right) or a further external link (Left) when
      * the path's FINAL segment is one — the entry point external
      * links from OTHER files use to land in this file. Intermediate
      * segments must resolve in-file. */
    def resolveObjectPathExt(target: String): Option[Either[(String, String), Long]] = {
      val segs = target.split("/").toSeq.filter(s => s.nonEmpty && s != ".")
      if (segs.isEmpty) return Some(Right(rootAddr))
      val parent = segs.init.foldLeft(Option(rootAddr)) { (cur, seg) =>
        cur.flatMap { a =>
          if (!isGroup(a)) None
          else groupChildren(a).collectFirst { case (n, x) if n == seg => x }
        }
      }
      parent.flatMap { pa =>
        if (!isGroup(pa)) None
        else groupChildrenExt(pa).collectFirst { case (n, e) if n == segs.last => e }
      }
    }

    /** Children of a group: (name, objectHeaderAddr) in name order,
      * soft links resolved, external links dropped.
      * Old-style symbol-table groups (B-tree v1 + local heap + SNOD),
      * new-style compact groups (one link message per child), and
      * new-style DENSE groups (links serialized into a fractal heap,
      * indexed by a name v2 B-tree — what h5py creates above its
      * 8-link compact threshold with libver='latest'). */
    def groupChildren(ohAddr: Long): Seq[(String, Long)] =
      groupChildrenExt(ohAddr).collect { case (n, Right(a)) => (n, a) }

    /** Children with external links surfaced: Right = in-file object
      * header address (hard, or soft resolved), Left = (fileName,
      * objectPath) of an external link for the caller to chase. */
    def groupChildrenExt(ohAddr: Long): Seq[(String, Either[(String, String), Long])] =
      rawChildren(ohAddr).flatMap {
        case (n, LinkHard(addr))       => Some((n, Right(addr)))
        case (n, LinkSoft(target))     => resolvePath(ohAddr, target, 1).map(a => (n, Right(a)))
        case (n, LinkExternal(f, obj)) => Some((n, Left((f, obj))))
      }

    /** Children before link resolution. */
    private def rawChildren(ohAddr: Long): Seq[(String, LinkTarget)] = {
      val msgs = messages(ohAddr)
      msgs.find(_._1 == 0x0011) match {
        case Some(st) => symbolTableChildren(st._2)
        case None =>
          val links = msgs.filter(_._1 == 0x0006).map(m => parseLink(m._2))
          if (links.nonEmpty) links.sortBy(_._1)
          else {
            val dense = msgs.find(_._1 == 0x0002).flatMap { li => // Link Info
              val b = ByteBuffer.wrap(li._2).order(ByteOrder.LITTLE_ENDIAN)
              b.get() // version
              val flags = b.get() & 0xff
              if ((flags & 1) != 0) b.getLong // max creation index
              val fheap = b.getLong
              val nameBt = b.getLong
              if (fheap != UNDEF) Some((fheap, nameBt)) else None
            }
            dense match {
              case Some((fheap, nameBt)) =>
                require(nameBt != UNDEF, s"$path: dense links without a name index")
                denseLinkChildren(fheap, nameBt).sortBy(_._1)
              case None =>
                if (msgs.exists(m => m._1 == 0x0002 || m._1 == 0x000A)) Seq.empty
                else throw new IllegalArgumentException("not a group")
            }
          }
      }
    }

    /** Parsed fractal-heap geometry: enough to resolve MANAGED heap
      * IDs to file addresses. `blocks` = (heapOffset, fileAddr,
      * logicalSize, storedSize, filterMask) of every direct block,
      * ascending by heap offset; storedSize == logicalSize and mask 0
      * for unfiltered heaps. `filters` is the heap's I/O pipeline
      * (applied to whole direct blocks, header bytes included). */
    private case class FractalHeap(idLen: Int, offsetSize: Int, lengthSize: Int,
                                   blockHeaderSize: Int,
                                   blocks: Seq[(Long, Long, Long, Long, Int)],
                                   filters: Seq[(Int, Int)],
                                   hugeBt: Long) {
      /** Indirectly-accessed huge objects, looked up by huge ID in the
        * heap's huge-object v2 B-tree: id -> (fileAddr, storedLen,
        * filterMask, memLen). Unfiltered records (btree type 7) are
        * addr+len+id; filtered (type 8) add mask+memSize — the record
        * layout follows the heap's own pipeline, as in libhdf5. */
      lazy val hugeRecords: Map[Long, (Long, Long, Int, Long)] =
        if (hugeBt == UNDEF) Map.empty
        else btreeV2Records(hugeBt).map { rec =>
          val b = ByteBuffer.wrap(rec).order(ByteOrder.LITTLE_ENDIAN)
          val addr = b.getLong; val len = b.getLong
          if (filters.isEmpty) (b.getLong, (addr, len, 0, len))
          else {
            val mask = b.getInt; val mem = b.getLong
            (b.getLong, (addr, len, mask, mem))
          }
        }.toMap
      /** Direct blocks of a FILTERED heap are read + inflated whole;
        * dense-link iteration touches every object, so cache the
        * inflated images per block (bounded by the heap's own size). */
      val inflatedCache = new java.util.HashMap[Long, Array[Byte]]()
      /** Heap offsets ascending, for binary-searched object lookup —
        * nested heaps can hold ~2^20 blocks, so a per-object linear
        * scan would make wide-group discovery quadratic. */
      val blockArr: Array[(Long, Long, Long, Long, Int)] = blocks.toArray
      private val offsets: Array[Long] = blockArr.map(_._1)
      def blockAt(off: Long): (Long, Long, Long, Long, Int) = {
        val i = java.util.Arrays.binarySearch(offsets, off)
        val idx = if (i >= 0) i else -i - 2 // last block starting <= off
        require(idx >= 0, s"heap offset $off before first block")
        blockArr(idx)
      }
    }

    private def bytesForValue(v: Long): Int =
      math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(math.max(v, 1L)) + 7) / 8)

    /** Parse a fractal heap header (FRHP) + ALL its direct blocks.
      * Root pointing at a single direct block, or at an indirect
      * block (FHIB) recursed to any nesting depth — rows past the
      * doubling table's max-direct row hold child INDIRECT blocks
      * whose own row count derives from the entry size
      * (rows = log2(entrySize/startSize) − log2(width) + 1, the
      * H5HF doubling-table relation). I/O-FILTERED heaps (filter
      * pipeline applied to whole direct blocks): the header carries
      * the pipeline + the root direct block's stored size/mask, and
      * indirect-block entries in direct rows carry (addr, storedSize,
      * mask) triples instead of bare addresses — mirroring
      * H5HFcache's deserialize layout. */
    private def fractalHeap(fheapAddr: Long): FractalHeap = {
      val hd = readAt(fheapAddr, 148)
      require(hd.getInt(0) == leMagic("FRHP"), s"$path: bad fractal heap signature")
      require((hd.get(4) & 0xff) == 0, "fractal heap version")
      val idLen = hd.getShort(5) & 0xffff
      val filterLen = hd.getShort(7) & 0xffff
      require(filterLen <= 4096, s"$path: implausible heap filter info")
      // with filters the header grows by rootStoredSize(8) + mask(4) +
      // pipeline(filterLen) before the checksum — re-read the tail
      val (rootStoredSize, rootMask, heapFilters) =
        if (filterLen == 0) (0L, 0, Seq.empty[(Int, Int)])
        else {
          val ext = readAt(fheapAddr + 142, 12 + filterLen)
          val sz = ext.getLong(0)
          val mask = ext.getInt(8)
          val fb = java.util.Arrays.copyOfRange(ext.array(), 12, 12 + filterLen)
          val pipeline = parseFilters(
            ByteBuffer.wrap(fb).order(ByteOrder.LITTLE_ENDIAN))
          (sz, mask, pipeline)
        }
      val flags = hd.get(9) & 0xff
      val maxManagedObj = hd.getInt(10) & 0xffffffffL
      // fixed-width fields: nextHugeId(8) hugeBt(8) freeSpace(8)
      // fsMgr(8) managedSpace(8) allocSpace(8) iterOffset(8) nObj(8)
      // hugeSize(8) nHuge(8) tinySize(8) nTiny(8) at offset 14..110
      val hugeBt = hd.getLong(22)
      val tableWidth = hd.getShort(110) & 0xffff
      val startBlockSize = hd.getLong(112)
      val maxDirectSize = hd.getLong(120)
      val maxHeapBits = hd.getShort(128) & 0xffff
      val rootAddr0 = hd.getLong(132)
      val currRows = hd.getShort(140) & 0xffff
      val offsetSize = (maxHeapBits + 7) / 8
      val lengthSize = bytesForValue(maxManagedObj)
      // managed IDs occupy the first 1+offsetSize+lengthSize bytes;
      // longer per-heap ID lengths are zero-padded (and make room for
      // tiny payloads / direct huge address+length pairs)
      require(idLen >= 1 + offsetSize + lengthSize && idLen <= 64,
        s"$path: unsupported heap ID layout (len=$idLen off=$offsetSize len=$lengthSize)")
      require(tableWidth > 0 && startBlockSize > 0, s"$path: corrupt fractal heap")
      val checksummed = (flags & 0x02) != 0
      val blockHeaderSize = 4 + 1 + 8 + offsetSize + (if (checksummed) 4 else 0)
      def directBlockSizeOfRow(row: Int): Long =
        if (row < 2) startBlockSize else startBlockSize << (row - 1)
      val filtered = filterLen > 0
      val blocks: Seq[(Long, Long, Long, Long, Int)] =
        if (rootAddr0 == UNDEF) Seq.empty
        else if (currRows == 0) {
          // root IS a single direct block; its size = the whole
          // managed space rounded to the doubling sequence — verify
          // via the block's own header instead of trusting arithmetic
          // (a FILTERED block's signature is only visible post-inflate,
          // so the check moves to heapObject for those)
          if (!filtered) {
            val dh = readAt(rootAddr0, 5)
            require(dh.getInt(0) == leMagic("FHDB"), s"$path: bad direct block")
          } else require(rootStoredSize > 0 && rootStoredSize <= MaxMetaRead &&
            maxDirectSize > 0 && maxDirectSize <= MaxMetaRead,
            s"$path: implausible filtered root block geometry")
          Seq((0L, rootAddr0, maxDirectSize,
            if (filtered) rootStoredSize else maxDirectSize, rootMask))
        } else {
          require(java.lang.Long.bitCount(tableWidth.toLong) == 1,
            s"$path: heap table width must be a power of two")
          val maxDirectRows =
            java.lang.Long.numberOfTrailingZeros(
              java.lang.Long.highestOneBit(maxDirectSize / startBlockSize)) + 2
          val logW = java.lang.Long.numberOfTrailingZeros(tableWidth.toLong)
          val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long, Int)]()
          // indirect blocks recurse: a row-r entry past maxDirectRows
          // is a child indirect block spanning entrySize bytes of heap
          // space, with its own doubling table of (r - logW) rows.
          // In a filtered heap, entries in DIRECT rows widen to
          // (addr, storedSize(8), mask(4)); indirect entries stay bare.
          def parseIndirect(addr: Long, heapOff0: Long, nrows: Int,
                            depth: Int): Unit = {
            require(depth < 8, s"$path: fractal heap nested too deep")
            val nEntries = nrows * tableWidth
            require(nrows > 0 && nEntries <= 65536,
              s"$path: implausible indirect block ($nrows rows)")
            require(out.length <= (1 << 20), s"$path: too many heap blocks")
            val directEntrySize = if (filtered) 8 + 8 + 4 else 8
            val bodySize = (0 until nrows).map { r =>
              (if (r < maxDirectRows) directEntrySize else 8) * tableWidth
            }.sum
            val ib = readAt(addr, 4 + 1 + 8 + offsetSize + bodySize + 4)
            require(ib.getInt(0) == leMagic("FHIB"), s"$path: bad indirect block")
            ib.position(4 + 1 + 8 + offsetSize)
            var off = heapOff0
            for (row <- 0 until nrows; _ <- 0 until tableWidth) {
              val sz = directBlockSizeOfRow(row)
              val child = ib.getLong
              if (row < maxDirectRows) {
                val (stored, mask) =
                  if (filtered) (ib.getLong, ib.getInt) else (sz, 0)
                if (child != UNDEF) out += ((off, child, sz, stored, mask))
              } else if (child != UNDEF) {
                val childRows =
                  63 - java.lang.Long.numberOfLeadingZeros(sz / startBlockSize) -
                    logW + 1
                parseIndirect(child, off, childRows.toInt, depth + 1)
              }
              off += sz
            }
          }
          parseIndirect(rootAddr0, 0L, currRows, 0)
          out.sortBy(_._1).toSeq
        }
      FractalHeap(idLen, offsetSize, lengthSize, blockHeaderSize, blocks,
        heapFilters, hugeBt)
    }

    /** Bytes of one MANAGED fractal-heap object. Heap offsets address
      * the heap's linear space, which INCLUDES each direct block's
      * header bytes. */
    private def heapObject(fh: FractalHeap, heapId: Array[Byte]): Array[Byte] = {
      val idb = ByteBuffer.wrap(heapId).order(ByteOrder.LITTLE_ENDIAN)
      val flags = idb.get() & 0xff
      require((flags >> 6) == 0, s"$path: heap ID version ${flags >> 6}")
      (flags >> 4) & 0x3 match {
        case 1 => // HUGE: object lives outside the heap's linear space.
          // DIRECT form (everything inside the ID) needs the ID to fit
          // addr+len (+mask+memSize when the heap is filtered) —
          // exactly libhdf5's huge_ids_direct rule; otherwise the ID
          // holds a huge-object sequence number looked up in the
          // heap's huge v2 B-tree (INDIRECT — libhdf5's default,
          // since default heap IDs are minimum-width).
          val filtered = fh.filters.nonEmpty
          val direct = if (filtered) fh.idLen >= 29 else fh.idLen >= 17
          val (addr, storedLen, mask, memLen) =
            if (direct) {
              val a = idb.getLong; val l = idb.getLong
              if (filtered) { val m = idb.getInt; (a, l, m, idb.getLong) }
              else (a, l, 0, l)
            } else {
              val id = getUint(idb, math.min(fh.idLen - 1, 8))
              fh.hugeRecords.getOrElse(id, throw new IllegalStateException(
                s"$path: huge heap object $id missing from the huge-object index"))
            }
          require(addr != UNDEF && storedLen > 0 && storedLen <= MaxMetaRead &&
            memLen >= 0 && memLen <= MaxMetaRead,
            s"$path: implausible huge heap object (addr=$addr len=$storedLen)")
          val out = new Array[Byte](storedLen.toInt)
          raf.seek(addr); raf.readFully(out)
          return if (filtered) defilter(out, fh.filters, mask, memLen.toInt) else out
        case 2 => // TINY: payload embedded in the ID itself; length is
          // 4 bits (+1) in the flag byte, or 12 bits across two bytes
          // when the heap's IDs are longer than 18 bytes
          val (hdr, len) =
            if (fh.idLen <= 18) (1, (flags & 0x0f) + 1)
            else (2, (((flags & 0x0f) << 8) | (idb.get() & 0xff)) + 1)
          require(hdr + len <= heapId.length,
            s"$path: tiny heap object overflows its ID (len=$len)")
          return java.util.Arrays.copyOfRange(heapId, hdr, hdr + len)
        case t =>
          require(t == 0, s"$path: reserved heap object type $t")
      }
      val off = getUint(idb, fh.offsetSize)
      val len = getUint(idb, fh.lengthSize)
      require(len >= 0 && len <= MaxMetaRead, s"$path: implausible heap object")
      require(fh.blockArr.nonEmpty, s"$path: heap has no direct blocks")
      val (blkOff, blkAddr, blkSize, storedSize, mask) = fh.blockAt(off)
      require(off - blkOff + len <= blkSize, s"$path: heap object crosses blocks")
      if (fh.filters.isEmpty) {
        val b = new Array[Byte](len.toInt)
        raf.seek(blkAddr + (off - blkOff)); raf.readFully(b)
        b
      } else {
        // filtered heap: the WHOLE direct block (header included) went
        // through the pipeline — inflate once, serve all objects from
        // the cached image
        var img = fh.inflatedCache.get(blkAddr)
        if (img == null) {
          require(storedSize > 0 && storedSize <= MaxMetaRead,
            s"$path: implausible filtered block size")
          require(blkSize > 0 && blkSize <= MaxMetaRead,
            s"$path: implausible filtered block logical size")
          val raw = new Array[Byte](storedSize.toInt)
          raf.seek(blkAddr); raf.readFully(raw)
          img = defilter(raw, fh.filters, mask, blkSize.toInt)
          val ib = ByteBuffer.wrap(img).order(ByteOrder.LITTLE_ENDIAN)
          require(img.length >= 13 + fh.offsetSize &&
            ib.getInt(0) == leMagic("FHDB"),
            s"$path: bad filtered direct block")
          // the block's own heap-offset field must match where the
          // index said it lives — catches truncated/mismatched images
          // that inflate's zero-padding would otherwise mask
          ib.position(13)
          require(getUint(ib, fh.offsetSize) == blkOff,
            s"$path: filtered block offset mismatch")
          fh.inflatedCache.put(blkAddr, img)
        }
        java.util.Arrays.copyOfRange(img, (off - blkOff).toInt,
          (off - blkOff + len).toInt)
      }
    }

    /** All records of a v2 B-tree (BTHD), any depth. Internal (BTIN)
      * nodes interleave records with variable-width child pointers
      * whose field sizes derive from the header geometry exactly as
      * libhdf5's H5B2__hdr_init computes them: a child pointer is
      * address + child-record-count (sized for the LEAF max — the
      * largest any node holds) +, below depth-1, the subtree's
      * cumulative record count (sized for that depth's cumulative
      * max). Returns raw record bytes in tree order. */
    private def btreeV2Records(btAddr: Long): Seq[Array[Byte]] = {
      val hd = readAt(btAddr, 36)
      require(hd.getInt(0) == leMagic("BTHD"), s"$path: bad v2 btree signature")
      require((hd.get(4) & 0xff) == 0, "v2 btree version")
      val nodeSize = hd.getInt(6)
      val recSize = hd.getShort(10) & 0xffff
      val depth = hd.getShort(12) & 0xffff
      val rootNode = hd.getLong(16)
      val rootNRec = hd.getShort(24) & 0xffff
      if (rootNode == UNDEF || rootNRec == 0) return Seq.empty
      require(recSize > 0 && recSize <= 256, s"$path: implausible record size")
      require(depth <= 8, s"$path: implausible v2 btree depth $depth")
      require(nodeSize > 10 + recSize && nodeSize <= (1 << 26),
        s"$path: implausible v2 btree node size $nodeSize")
      // per-depth pointer geometry (prefix/suffix overhead is
      // sig+ver+type+checksum = 10 bytes for every node type)
      def encSize(v: Long): Int =
        (63 - java.lang.Long.numberOfLeadingZeros(math.max(v, 1L)) + 8) / 8
      val leafMaxNrec = (nodeSize - 10) / recSize
      val maxNrecSize = encSize(leafMaxNrec)
      val cumMaxNrecSize = new Array[Int](depth + 1)
      var cumMaxNrec = leafMaxNrec.toLong
      cumMaxNrecSize(0) = 0
      for (d <- 1 to depth) {
        val ptrSize = 8 + maxNrecSize + cumMaxNrecSize(d - 1)
        val maxNrec = (nodeSize - (10 + ptrSize)) / (recSize + ptrSize)
        require(maxNrec > 0, s"$path: v2 btree node too small for depth $d")
        cumMaxNrec = (maxNrec + 1L) * cumMaxNrec + maxNrec
        cumMaxNrecSize(d) = encSize(cumMaxNrec)
      }
      val out = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      var visited = 0
      def readNode(addr: Long, nRec: Int, d: Int): Unit = {
        visited += 1
        require(visited <= (1 << 20), s"$path: v2 btree too large")
        require(addr != UNDEF && nRec >= 0, s"$path: bad v2 btree child")
        if (d == 0) {
          val leaf = readAt(addr, 6 + nRec * recSize)
          require(leaf.getInt(0) == leMagic("BTLF"), s"$path: bad v2 btree leaf")
          for (i <- 0 until nRec) {
            val rec = new Array[Byte](recSize)
            leaf.position(6 + i * recSize)
            leaf.get(rec); out += rec
          }
        } else {
          val ptrSize = 8 + maxNrecSize + cumMaxNrecSize(d - 1)
          val ib = readAt(addr, 6 + nRec * recSize + (nRec + 1) * ptrSize)
          require(ib.getInt(0) == leMagic("BTIN"), s"$path: bad v2 btree internal node")
          val recs = (0 until nRec).map { i =>
            val rec = new Array[Byte](recSize)
            ib.position(6 + i * recSize)
            ib.get(rec); rec
          }
          val kids = (0 to nRec).map { i =>
            ib.position(6 + nRec * recSize + i * ptrSize)
            val a = ib.getLong
            val cn = getUint(ib, maxNrecSize)
            (a, cn.toInt)
          }
          // in-order: child_0, record_0, child_1, record_1, ...
          for (i <- 0 to nRec) {
            readNode(kids(i)._1, kids(i)._2, d - 1)
            if (i < nRec) out += recs(i)
          }
        }
      }
      readNode(rootNode, rootNRec, depth)
      out.toSeq
    }

    /** Dense link storage: read every name-index record (type 5:
      * hash(4) + heap ID), resolve each heap ID to a serialized link
      * message, parse. */
    private def denseLinkChildren(fheapAddr: Long,
        nameBtAddr: Long): Seq[(String, LinkTarget)] = {
      val fh = fractalHeap(fheapAddr)
      btreeV2Records(nameBtAddr).map { rec =>
        require(rec.length >= 4 + fh.idLen, s"$path: short link record")
        val heapId = java.util.Arrays.copyOfRange(rec, 4, 4 + fh.idLen)
        parseLink(heapObject(fh, heapId))
      }
    }

    private def symbolTableChildren(
        stBody: Array[Byte]): Seq[(String, LinkTarget)] = {
      val b = ByteBuffer.wrap(stBody).order(ByteOrder.LITTLE_ENDIAN)
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
        while (c != 0) {
          if (sb.length > 65535)
            throw new IllegalStateException(s"$path: unterminated heap name")
          sb.append(c.toChar); a += 1; c = readAt(a, 1).get(0)
        }
        sb.toString
      }
      val visited = scala.collection.mutable.Set[Long]()
      def walkBtree(addr: Long): Seq[Long] = { // returns SNOD addresses
        if (!visited.add(addr)) // corrupt node cycle
          throw new IllegalStateException(s"$path: group btree cycle")
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
          val cacheType = entries.getInt(i * 40 + 16)
          if (cacheType == 2) {
            // symbolic link: scratch-pad's first 4 bytes hold the
            // local-heap offset of the target path (objAddr undefined)
            val tgtOff = entries.getInt(i * 40 + 24) & 0xffffffffL
            (heapString(nameOff), LinkSoft(heapString(tgtOff)))
          } else (heapString(nameOff), LinkHard(objAddr))
        }
      }
    }

    private def parseDtype(body: ByteBuffer): Dtype = {
      val b0 = body.get() & 0xff
      val clazz = b0 & 0x0f
      val version = (b0 >> 4) & 0x0f
      val bits = Array(body.get() & 0xff, body.get() & 0xff, body.get() & 0xff)
      val size = body.getInt()
      /** NUL-terminated name; v1/v2 pad the field to a multiple of 8. */
      def memberName(padded: Boolean): String = {
        // collect raw bytes and decode UTF-8 once — per-byte toChar
        // would mangle multibyte names (numpy allows any unicode)
        val bytes = new java.io.ByteArrayOutputStream(16)
        var c = body.get()
        while (c != 0) {
          require(bytes.size < 4096, "unterminated compound member name")
          bytes.write(c); c = body.get()
        }
        if (padded) {
          val total = (bytes.size + 1 + 7) / 8 * 8
          body.position(body.position() + (total - bytes.size - 1))
        }
        new String(bytes.toByteArray, "UTF-8")
      }
      /** consume property bytes so the buffer lands exactly past this
        * datatype — REQUIRED inside compound/vlen where another member
        * follows; tolerated-as-absent at top level (truncated wild
        * files whose properties we never needed). */
      def skipProps(n: Int): Unit =
        body.position(body.position() + math.min(n, body.remaining()))
      clazz match {
        case 0 => // fixed-point; bit3 of bitfield-0 = signed
          require((bits(0) & 1) == 0, "big-endian integers unsupported")
          skipProps(4) // bit offset(2) + precision(2)
          Dtype(0, size, (bits(0) & 0x08) != 0)
        case 1 =>
          require((bits(0) & 1) == 0, "big-endian floats unsupported")
          skipProps(12) // offset/precision + exponent/mantissa geometry + bias
          Dtype(1, size, signed = true)
        case 3 => Dtype(3, size, signed = false)
        case 6 => // compound (PyTables/astropy tables, numpy
          // structured arrays): member count in class bits 0-15;
          // member encodings differ by datatype-message version.
          val nMembers = bits(0) | (bits(1) << 8)
          require(nMembers >= 1 && nMembers <= 4096,
            s"implausible compound member count $nMembers")
          val members = (0 until nMembers).map { _ =>
            version match {
              case 1 =>
                val name = memberName(padded = true)
                val off = body.getInt()
                body.get()                              // dimensionality
                body.position(body.position() + 3)      // reserved
                body.getInt()                           // dim permutation
                body.getInt()                           // reserved
                body.position(body.position() + 16)     // dim sizes [4]
                (name, off, parseDtype(body))
              case 2 =>
                val name = memberName(padded = true)
                val off = body.getInt()
                (name, off, parseDtype(body))
              case 3 =>
                val name = memberName(padded = false)
                // offset stored in the minimum bytes that hold `size`
                val offBytes = math.max(1,
                  (64 - java.lang.Long.numberOfLeadingZeros(
                    math.max(size.toLong, 1L)) + 7) / 8).toInt
                var off = 0L
                for (i <- 0 until offBytes) off |= (body.get() & 0xffL) << (8 * i)
                (name, off.toInt, parseDtype(body))
              case v => throw new IllegalArgumentException(
                s"compound datatype v$v unsupported")
            }
          }
          Dtype(6, size, signed = false, members = members)
        case 8 => // enumeration: a base fixed-point type + named
          // values. h5py stores np.bool_ as ENUM{FALSE:0, TRUE:1}
          // over int8 — that shape surfaces as a Spark BooleanType;
          // any other enum reads as its integer base (h5py behavior
          // without check_dtype). Names are null-terminated, padded
          // to 8 bytes before message version 3.
          val base = parseDtype(body)
          require(base.clazz == 0, "enum over non-integer base unsupported")
          val nMembers = bits(0) | (bits(1) << 8)
          require(nMembers >= 1 && nMembers <= 4096,
            s"implausible enum member count $nMembers")
          val names = (0 until nMembers).map(_ => memberName(padded = version < 3))
          val values = (0 until nMembers).map { _ =>
            var v = 0L
            for (i <- 0 until base.size) v |= (body.get() & 0xffL) << (8 * i)
            v
          }
          val isBool = nMembers == 2 && base.size == 1 &&
            names.zip(values).toSet == Set(("FALSE", 0L), ("TRUE", 1L))
          if (isBool) Dtype(8, 1, signed = false) else base
        case 9 => // variable-length: bitfield-0 low nibble 1 = string
          // (h5py's DEFAULT str dtype), 0 = sequence (h5py ragged
          // arrays — vlen_dtype(int64/float64/...)). The in-file
          // element is the 16-byte hvl descriptor (length +
          // global-heap collection address + object index); for
          // sequences `length` counts BASE elements, so the base
          // type rides along in `vlenBase`.
          (bits(0) & 0x0f) match {
            case 1 => Dtype(9, 16, signed = false)
            case 0 =>
              val base = parseDtype(body) // embedded base type message
              require(base.clazz == 0 || base.clazz == 1,
                "vlen sequences of non-numeric base types unsupported")
              Dtype(9, 16, signed = false, vlenBase = Some(base))
            case t => throw new IllegalArgumentException(
              s"unsupported vlen type $t")
          }
        case c => throw new IllegalArgumentException(
          s"unsupported hdf5 datatype class $c (only int/float/string/vlen-string)")
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

    /** Parse an attribute message (v1: 8-padded name/dt/ds regions;
      * v2/v3: unpadded, v3 adds a charset byte) into
      * (name, stringValue) when the value is a string scalar; None
      * otherwise. */
    private def parseAttr(body: ByteBuffer): Option[(String, String)] = {
      val version = body.get() & 0xff
      if (version < 1 || version > 3) return None
      val flags = body.get() & 0xff // v1: reserved (0)
      if (version >= 2 && (flags & 0x03) != 0) return None // shared dt/ds
      val nameSize = body.getShort() & 0xffff
      val dtSize = body.getShort() & 0xffff
      val dsSize = body.getShort() & 0xffff
      if (version == 3) body.get() // name character-set encoding
      def region(n: Int): Array[Byte] = {
        val padded = if (version == 1) (n + 7) / 8 * 8 else n
        val out = new Array[Byte](padded); body.get(out); out
      }
      val name = new String(region(nameSize).takeWhile(_ != 0), "UTF-8")
      val dtBytes = region(dtSize)
      region(dsSize) // dataspace: scalar assumed for the attrs we read
      val dt = parseDtype(ByteBuffer.wrap(dtBytes).order(ByteOrder.LITTLE_ENDIAN))
      if (dt.clazz != 3) return None
      val data = new Array[Byte](math.min(dt.size, body.remaining()))
      body.get(data)
      Some((name, new String(data.takeWhile(_ != 0), "UTF-8")))
    }

    /** Filter pipeline message (0x000B), v1 or v2: (filterId,
      * firstClientValue) in write order. */
    private def parseFilters(b: ByteBuffer): Seq[(Int, Int)] = {
      val version = b.get() & 0xff
      require(version == 1 || version == 2, s"filter pipeline v$version unsupported")
      val nFilters = b.get() & 0xff
      if (version == 1) { b.getShort(); b.getInt() } // reserved(6)
      (0 until nFilters).map { _ =>
        val id = b.getShort() & 0xffff
        val nameLen = if (version == 2 && id < 256) 0 else b.getShort() & 0xffff
        b.getShort() // flags (bit0 = optional)
        val nValues = b.getShort() & 0xffff
        if (nameLen > 0) {
          val skip = if (version == 1) (nameLen + 7) / 8 * 8 else nameLen
          b.position(b.position() + skip)
        }
        val values = (0 until nValues).map(_ => b.getInt())
        if (version == 1 && nValues % 2 == 1) b.getInt() // pad to 8
        (id, values.headOption.getOrElse(0))
      }
    }

    /** Walk a v1 type-1 (raw data chunk) B-tree of any depth.
      * `dimensionality` is rank+1 per the layout message (the trailing
      * element-size dimension); key layout: chunkSize(4) mask(4) then
      * dimensionality offsets(8 each, dataset ELEMENT coordinates). */
    def chunkLocations(btreeAddr: Long, dimensionality: Int): Array[ChunkLoc] = {
      val keySize = 8 + 8 * dimensionality
      val visited = scala.collection.mutable.Set[Long]()
      def walk(addr: Long): Seq[ChunkLoc] = {
        if (!visited.add(addr)) // corrupt node cycle
          throw new IllegalStateException(s"$path: chunk btree cycle")
        val hd = readAt(addr, 24)
        require(hd.getInt(0) == leMagic("TREE"), "bad chunk btree signature")
        require((hd.get(4) & 0xff) == 1, "not a chunk btree")
        val level = hd.get(5) & 0xff
        val used = hd.getShort(6) & 0xffff
        val body = readAt(addr + 24, used * (keySize + 8))
        (0 until used).flatMap { i =>
          val base = i * (keySize + 8)
          val child = body.getLong(base + keySize)
          if (level > 0) walk(child)
          else Seq(ChunkLoc(body.getLong(base + 8), child,
            body.getInt(base), body.getInt(base + 4)))
        }
      }
      walk(btreeAddr).sortBy(_.elemStart).toArray
    }

    /** v4 chunked-layout descriptor pending index resolution
      * (element size and filters arrive in other messages). */
    private case class V4Chunk(indexType: Int, flags: Int, chunkElems: Long,
                               addr: Long, singleSize: Long, singleMask: Int)

    def dataset(ohAddr: Long): DsetMeta = {
      var dims: Seq[Long] = Nil
      var dt: Dtype = null
      var storage: Storage = null
      var dataSize = 0L
      var filters: Seq[(Int, Int)] = Nil
      var chunkInfo: Option[(Long, Seq[Long])] = None // (btreeAddr, chunkDims)
      var v4Info: Option[V4Chunk] = None
      val attrs = scala.collection.mutable.Map[String, String]()
      messages(ohAddr).foreach { case (t, body) =>
        val b = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
        t match {
          case 0x0001 => dims = parseDataspace(b)
          case 0x0003 => dt = parseDtype(b)
          case 0x000B => filters = parseFilters(b)
          case 0x0008 =>
            val version = b.get() & 0xff
            require(version == 3 || version == 4,
              s"data layout v$version unsupported")
            val clazz = b.get() & 0xff
            (version, clazz) match {
              case (_, 0) => // compact: size(2) + raw data in the header
                val sz = b.getShort() & 0xffff
                val data = new Array[Byte](sz); b.get(data)
                storage = Inline(data); dataSize = sz
              case (_, 1) =>
                val a = b.getLong; dataSize = b.getLong
                storage = Contiguous(a)
              case (3, 2) => // chunked v3: dimensionality(1) btree(8) dims(4 each)
                val dimensionality = b.get() & 0xff
                val btreeAddr = b.getLong
                val chunkDims = (0 until dimensionality).map(_ => b.getInt().toLong)
                // last "dimension" is the element size; rank 1 columns
                // and rank 2 matrices (full-width chunks) supported
                require(dimensionality == 2 || dimensionality == 3,
                  s"only 1-D/2-D chunked datasets supported (dimensionality=$dimensionality)")
                chunkInfo = Some((btreeAddr, chunkDims))
              case (4, 2) =>
                // chunked v4 (libver latest): flags(1) dimensionality(1)
                // encodedDimSize(1) dims(encoded each) indexType(1)
                // index-specific fields, then the index/chunk address
                val lflags = b.get() & 0xff
                val dimensionality = b.get() & 0xff
                val enc = b.get() & 0xff
                val chunkDims = (0 until dimensionality).map(_ => getUint(b, enc))
                // tolerate both conventions seen in the wild: rank dims
                // only, or rank+1 with the element size appended (v3's)
                require(dimensionality == 1 || dimensionality == 2,
                  s"only 1-D chunked datasets supported (dimensionality=$dimensionality)")
                val indexType = b.get() & 0xff
                v4Info = indexType match {
                  case 1 => // single chunk
                    val (sz, mask) =
                      if ((lflags & 0x02) != 0) (b.getLong, b.getInt) else (-1L, 0)
                    Some(V4Chunk(1, lflags, chunkDims.head, b.getLong, sz, mask))
                  case 2 => // implicit: contiguous unfiltered chunks
                    Some(V4Chunk(2, lflags, chunkDims.head, b.getLong, -1L, 0))
                  case 3 => // fixed array: page bits(1) + header address
                    b.get() // page bits (re-read from the FAHD header)
                    Some(V4Chunk(3, lflags, chunkDims.head, b.getLong, -1L, 0))
                  case it => throw new IllegalArgumentException(
                    s"$path: v4 chunk index type $it unsupported " +
                      "(single-chunk, implicit and fixed-array only)")
                }
              case (_, c) => throw new IllegalArgumentException(
                s"hdf5 layout class $c unsupported")
            }
          case 0x000C => parseAttr(b).foreach { case (k, v) => attrs(k) = v }
          case _ => ()
        }
      }
      def checkFilters(): Unit = filters.foreach { case (id, _) =>
        require(SupportedFilters(id),
          s"hdf5 filter $id unsupported (deflate=1 and shuffle=2 only)")
      }
      chunkInfo.foreach { case (btreeAddr, cDims) =>
        checkFilters()
        val rank = cDims.length - 1
        // rank-2 chunks must span full rows so the chunk space stays
        // linear in scalar elements (h5py's default chunk guess for
        // (N, D) matrices is full-width); elemStart scales by D
        val rowWidth = if (rank == 2) dims.lift(1).getOrElse(1L) else 1L
        if (rank == 2)
          require(cDims(1) == rowWidth && rowWidth > 0,
            s"$path: partial-width 2-D chunks unsupported (${cDims(1)} of $rowWidth)")
        val chunkElems = cDims.head * rowWidth
        val chunks =
          if (btreeAddr == UNDEF) Array.empty[ChunkLoc] // never-written dataset
          else chunkLocations(btreeAddr, rank + 1)
            .map(c => c.copy(elemStart = c.elemStart * rowWidth))
        storage = Chunked(chunkElems, filters, chunks)
        dataSize = chunks.map(_.storedSize.toLong).sum
      }
      v4Info.foreach { v4 =>
        checkFilters()
        require(dt != null, s"$path: v4 chunked dataset without a datatype")
        val chunkBytes = v4.chunkElems * dt.size
        val chunks: Array[ChunkLoc] = v4.indexType match {
          case _ if v4.addr == UNDEF => Array.empty // never-written dataset
          case 1 =>
            val stored = if (v4.singleSize >= 0) v4.singleSize else chunkBytes
            require(stored <= Int.MaxValue, s"$path: implausible chunk size")
            Array(ChunkLoc(0L, v4.addr, stored.toInt, v4.singleMask))
          case 2 =>
            require(filters.isEmpty, s"$path: implicit chunk index with filters")
            val n = dims.headOption.getOrElse(0L)
            val nChunks = (n + v4.chunkElems - 1) / math.max(v4.chunkElems, 1L)
            require(chunkBytes <= Int.MaxValue, s"$path: implausible chunk size")
            Array.tabulate(nChunks.toInt)(i => ChunkLoc(i * v4.chunkElems,
              v4.addr + i * chunkBytes, chunkBytes.toInt, 0))
          case 3 =>
            fixedArrayChunks(v4.addr, v4.chunkElems, chunkBytes)
        }
        storage = Chunked(v4.chunkElems, filters, chunks)
        dataSize = chunks.map(_.storedSize.toLong).sum
      }
      DsetMeta(dims, dt, storage, dataSize, attrs.toMap)
    }

    /** Chunk locations from a Fixed Array index (libver-latest layout
      * for fixed-size chunked datasets): FAHD header -> FADB data
      * block. Client 0 = unfiltered chunks (address only, nominal
      * size); client 1 = filtered (address + stored size + mask).
      * Unpaged blocks only — datasets with more than 2^pageBits chunks
      * page the block and fail here with a clear error. */
    def fixedArrayChunks(faAddr: Long, chunkElems: Long,
                         nominalChunkBytes: Long): Array[ChunkLoc] = {
      val hd = readAt(faAddr, 28)
      require(hd.getInt(0) == leMagic("FAHD"), s"$path: bad fixed-array signature")
      require((hd.get(4) & 0xff) == 0, "fixed array version")
      val clientId = hd.get(5) & 0xff
      val entrySize = hd.get(6) & 0xff
      val pageBits = hd.get(7) & 0xff
      val maxEntries = hd.getLong(8)
      val dbAddr = hd.getLong(16)
      require(clientId == 0 || clientId == 1,
        s"$path: fixed-array client $clientId unsupported")
      require(maxEntries >= 0 && maxEntries <= (MaxMetaRead - 14) / math.max(entrySize, 1),
        s"$path: implausible fixed-array size $maxEntries")
      require(pageBits >= 63 || maxEntries <= (1L << pageBits),
        s"$path: paged fixed-array chunk index unsupported")
      if (dbAddr == UNDEF) return Array.empty
      val db = readAt(dbAddr, 14 + entrySize * maxEntries.toInt)
      require(db.getInt(0) == leMagic("FADB"), s"$path: bad fixed-array data block")
      db.position(14) // sig(4) version(1) client(1) headerAddr(8)
      require(nominalChunkBytes <= Int.MaxValue, s"$path: implausible chunk size")
      (0L until maxEntries).flatMap { i =>
        if (clientId == 0) {
          val addr = db.getLong
          if (addr == UNDEF) None
          else Some(ChunkLoc(i * chunkElems, addr, nominalChunkBytes.toInt, 0))
        } else {
          val addr = db.getLong
          val stored = getUint(db, entrySize - 12)
          val mask = db.getInt
          if (addr == UNDEF) None
          else {
            require(stored <= Int.MaxValue, s"$path: implausible chunk size")
            Some(ChunkLoc(i * chunkElems, addr, stored.toInt, mask))
          }
        }
      }.toArray
    }

    override def close(): Unit = raf.close()
  }

  private def leMagic(s: String): Int =
    (s(0) | (s(1) << 8) | (s(2) << 16) | (s(3) << 24))

  /** A plain (non-vaex-layout) dataset as a column: 1-D, numeric,
    * fixed/variable-size string or ragged vlen sequence; None for
    * anything else (multi-dim — skipped, not fatal, on the
    * generic-file path). */
  private def plainColumn(name: String, data: DsetMeta): Option[ColumnMeta] = {
    if (data.storage == null) None
    else if (data.dims.size == 2 &&
      (data.dt.clazz == 0 || data.dt.clazz == 1) &&
      data.dims(1) > 0 && data.dims(1) <= (1 << 20)) {
      // (n, d) numeric matrix -> ArrayType column of d-vectors;
      // contiguous, inline or chunked (full-width chunks — the
      // dataset() parse already linearized the chunk grid)
      try Some(ColumnMeta(name, "mat_" + kindOf(data.dt), data.dims.head,
        data.storage, data.dataSize, None, None,
        fixedStrSize = data.dims(1).toInt))
      catch { case _: IllegalArgumentException => None }
    }
    else if (data.dims.size != 1) None
    else if (data.dt.clazz == 3)
      Some(ColumnMeta(name, "fstr", data.dims.head, data.storage, data.dataSize,
        None, None, fixedStrSize = data.dt.size))
    else
      try Some(ColumnMeta(name, kindOf(data.dt), data.dims.head,
        data.storage, data.dataSize, None, None))
      catch { case _: IllegalArgumentException => None }
  }

  /** Like [[plainColumn]], but a COMPOUND 1-D dataset (a PyTables /
    * astropy table, a numpy structured array) expands into one column
    * per member — strided reads over the interleaved records. Members
    * the parser can't decode (vlen-in-compound, nested compound) are
    * skipped individually. */
  private def plainColumns(name: String, data: DsetMeta): Seq[ColumnMeta] = {
    if (data.storage == null) Nil
    else if (data.dt.clazz == 6 && data.dims.size == 1) {
      val stride = data.dt.size
      data.dt.members.flatMap { case (mn, off, mt) =>
        try {
          if (mt.clazz == 3)
            Some(ColumnMeta(mn, "fstr", data.dims.head, data.storage,
              data.dataSize, None, None, fixedStrSize = mt.size,
              stride = stride, fieldOff = off))
          else if (mt.clazz == 0 || mt.clazz == 1 || mt.clazz == 8)
            Some(ColumnMeta(mn, kindOf(mt), data.dims.head, data.storage,
              data.dataSize, None, None, stride = stride, fieldOff = off))
          else None // vlen/nested members: skipped, not fatal
        } catch { case _: Exception => None }
      }
    } else plainColumn(name, data).toSeq
  }

  /** Resolve the vaex table layout: /table/columns (v2 export),
    * /columns, or /data (v1). Falls back to GENERIC h5py files —
    * supported 1-D datasets directly under the root group (the shape
    * `h5py.File(...)["col"]` produces; the reference opens these
    * through h5py, packages/vaex-hdf5/vaex/hdf5/dataset.py:57).
    * Returns columns in column_order when the attribute is present,
    * else B-tree (name) order. */
  /** One object in one (possibly externally-linked) file during
    * table-metadata traversal. */
  private final case class H5Node(f: H5File, fpath: String, addr: Long)

  def readTable(path: String): Seq[ColumnMeta] = {
    // external links open their target file once (cache by path);
    // everything closes when traversal ends — ColumnMeta carries only
    // addresses + the backing file path, never a handle
    val opened = scala.collection.mutable.LinkedHashMap[String, H5File]()
    def openFile(p: String): H5File = opened.getOrElseUpdate(p, new H5File(p))
    /** Chase one external link, transitively (an external target may
      * itself be an external link): relative file names resolve
      * against the REFERENCING file's directory (libhdf5's default
      * search), missing files/objects yield None (the link is
      * skipped, like a dangling soft link), chains deeper than 8
      * files stop — a cross-file link cycle in any sane tree. */
    def resolveExternal(fromPath: String, file: String, obj: String,
                        depth: Int): Option[H5Node] = {
      if (depth > 8) return None
      try {
        // a corrupt link message can carry an empty or URI-invalid
        // target name — Path construction throws IllegalArgumentException,
        // which must resolve to None (dangling link) like a missing file
        val tf = new org.apache.hadoop.fs.Path(file)
        val target = if (tf.isAbsolute) file
        else {
          // resolve RELATIVE TO THE REFERENCING FILE's directory
          // (libhdf5's default search), on whatever FileSystem that
          // file lives on — qualify first so getParent is never empty
          val (fs, from) = FsIO.resolve(fromPath)
          new org.apache.hadoop.fs.Path(
            fs.makeQualified(from).getParent, file).toString
        }
        val g = openFile(target)
        g.resolveObjectPathExt(obj).flatMap {
          case Right(a)          => Some(H5Node(g, target, a))
          case Left((f2, obj2))  => resolveExternal(target, f2, obj2, depth + 1)
        }
      } catch {
        case _: java.io.FileNotFoundException => None
        case _: IllegalArgumentException => None // bad Path from corrupt link
      }
    }
    /** Children across files: hard/soft resolve in-file; an external
      * link opens its target file and resolves the object path there. */
    def kidsOf(nd: H5Node): Seq[(String, H5Node)] =
      nd.f.groupChildrenExt(nd.addr).flatMap {
        case (n, Right(a))          => Some((n, nd.copy(addr = a)))
        case (n, Left((file, obj))) =>
          resolveExternal(nd.fpath, file, obj, 1).map((n, _))
      }
    def fileTag(nd: H5Node): Option[String] = Some(nd.fpath).filterNot(_ == path)
    try {
      val f = openFile(path)
      val root = H5Node(f, path, f.rootAddr)
      def isGrp(nd: H5Node) = nd.f.isGroup(nd.addr)
      val rootKidsSeq = kidsOf(root)
      val rootKids = rootKidsSeq.toMap
      val columnsGroup =
        rootKids.get("table").filter(isGrp)
          .flatMap(t => kidsOf(t).toMap.get("columns"))
          .orElse(rootKids.get("columns").filter(isGrp))
          .orElse(rootKids.get("data").filter(isGrp))
          .getOrElse {
            // generic file: root-level datasets as columns. A dataset
            // the parser can't even describe (vlen/compound dtype,
            // multi-dim chunking, exotic filter — f.dataset throws) is
            // SKIPPED like any other unsupported one, so the readable
            // columns of a mixed wild file still load.
            val plain = rootKidsSeq.filterNot { case (_, nd) => isGrp(nd) }
              .flatMap { case (name, nd) =>
                try plainColumns(name, nd.f.dataset(nd.addr))
                  .map(_.copy(file = fileTag(nd)))
                catch { case _: Exception => Nil }
              }
            if (plain.nonEmpty) return plain
            throw new IllegalArgumentException(
              s"$path: no /table/columns, /columns or /data group and no plain " +
                "root-level 1-D datasets (not a readable hdf5 table)")
          }
      val kids = kidsOf(columnsGroup)
      val colOrder = {
        // column_order attr lives on the columns group
        val attrs = attrsOf(columnsGroup.f, columnsGroup.addr)
        attrs.get("column_order").map(_.split(",").toSeq)
      }
      val metas = kids.map { case (name, nd) =>
        if (isGrp(nd)) {
          val members = kidsOf(nd).toMap
          val dataNd = members.getOrElse("data",
            throw new IllegalArgumentException(s"column $name: no data dataset"))
          // all of a column's pieces must share one backing file —
          // ColumnMeta carries a single file override
          (members.get("null_bitmap") ++ members.get("indices")).foreach { m =>
            require(m.fpath == dataNd.fpath,
              s"column $name: members split across files (unsupported)")
          }
          val data = dataNd.f.dataset(dataNd.addr)
          val bitmap = members.get("null_bitmap").map(m => m.f.dataset(m.addr).storage)
          if (data.attrs.get("dtype").contains("str")) {
            val idxNd = members.getOrElse("indices",
              throw new IllegalArgumentException(s"string column $name: no indices"))
            val idx = idxNd.f.dataset(idxNd.addr)
            ColumnMeta(name, "str", idx.dims.head - 1,
              data.storage, data.dataSize, Some(idx.storage), bitmap,
              file = fileTag(dataNd))
          } else if (data.dims.size == 2) {
            // (n, d) matrix dataset in a column group — the shape
            // vaex exports array columns in. Only NUMERIC bases have
            // a matrix decode path; anything else errors by name
            // instead of a bare MatchError at scan time.
            require(data.dt.clazz == 0 || data.dt.clazz == 1,
              s"column $name: 2-D dataset of non-numeric dtype unsupported")
            ColumnMeta(name, "mat_" + kindOf(data.dt), data.dims.head,
              data.storage, data.dataSize, None, bitmap,
              fixedStrSize = data.dims(1).toInt, file = fileTag(dataNd))
          } else {
            val kind = kindOf(data.dt)
            ColumnMeta(name, kind, data.dims.head, data.storage, data.dataSize,
              None, bitmap, file = fileTag(dataNd))
          }
        } else { // v1 layout: dataset directly under the group
          val data = nd.f.dataset(nd.addr)
          if (data.dims.size == 2) {
            require(data.dt.clazz == 0 || data.dt.clazz == 1,
              s"column $name: 2-D dataset of non-numeric dtype unsupported")
            ColumnMeta(name, "mat_" + kindOf(data.dt), data.dims.head,
              data.storage, data.dataSize, None, None,
              fixedStrSize = data.dims(1).toInt, file = fileTag(nd))
          } else ColumnMeta(name, kindOf(data.dt), data.dims.head,
            data.storage, data.dataSize, None, None, file = fileTag(nd))
        }
      }
      colOrder match {
        case Some(names) =>
          val byName = metas.map(m => m.name -> m).toMap
          names.flatMap(byName.get) ++ metas.filterNot(m => names.contains(m.name))
        case None => metas
      }
    } finally opened.values.foreach(f => try f.close() catch { case _: Exception => })
  }

  private def attrsOf(f: H5File, ohAddr: Long): Map[String, String] = {
    // group attribute messages: same 0x000C encoding as datasets
    val ds = try f.dataset(ohAddr) catch { case _: Throwable => null }
    if (ds != null) ds.attrs else Map.empty
  }

  // ------------------------------------------------------------ range IO

  /** zlib-inflate `bytes` to exactly `outLen`. */
  private[sources] def inflate(bytes: Array[Byte], outLen: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(bytes)
      val out = new Array[Byte](outLen)
      var off = 0
      while (off < outLen && !inf.finished()) {
        val k = inf.inflate(out, off, outLen - off)
        // needsDictionary: zlib FDICT set (corrupt header) — without
        // this check inflate() returns 0 forever and the task hangs
        if (k == 0 && (inf.needsInput() || inf.needsDictionary()))
          throw new IllegalStateException("truncated or undecodable deflate chunk")
        off += k
      }
      out
    } finally inf.end()
  }

  /** Undo the HDF5 shuffle filter: stored layout is byte-plane-major
    * (all 1st bytes, then all 2nd bytes, ...); restore element-major. */
  private[sources] def unshuffle(bytes: Array[Byte], elemSize: Int): Array[Byte] = {
    if (elemSize <= 1) return bytes
    val n = bytes.length / elemSize
    val out = new Array[Byte](bytes.length)
    var s = 0
    while (s < elemSize) {
      var i = 0
      while (i < n) { out(i * elemSize + s) = bytes(s * n + i); i += 1 }
      s += 1
    }
    out
  }

  /** Reverse the filter pipeline for one chunk. `mask` bit i set means
    * filter i was SKIPPED when the chunk was written. */
  private def defilter(raw: Array[Byte], filters: Seq[(Int, Int)], mask: Int,
                       nominalBytes: Int): Array[Byte] =
    filters.zipWithIndex.reverse.foldLeft(raw) { case (b, ((id, cv), i)) =>
      if ((mask & (1 << i)) != 0) b
      else id match {
        case 1 => inflate(b, nominalBytes)
        case 2 => unshuffle(b, cv)
        case other => throw new IllegalArgumentException(s"hdf5 filter $other unsupported")
      }
    }

  /** Read elements [start, end) of a dataset into a little-endian
    * buffer, whatever its layout. Chunked: touches only overlapping
    * chunks, inflating each once (per-chunk work stays inside the
    * calling task — this is what keeps a gzip'd file scan-parallel). */
  /** Parse one global-heap collection (GCOL): header sig(4) ver(1)
    * reserved(3) collectionSize(8, header included), then objects —
    * index(2) refCount(2) reserved(4) size(8) data (8-aligned) —
    * terminated by the index-0 free-space object or the collection
    * end. Size-capped like every metadata read. */
  private def readGlobalHeap(raf: FsIO.In,
                             addr: Long): Map[Int, Array[Byte]] = {
    val hdr = new Array[Byte](16)
    raf.seek(addr); raf.readFully(hdr)
    val hb = ByteBuffer.wrap(hdr).order(ByteOrder.LITTLE_ENDIAN)
    require(hb.getInt(0) == leMagic("GCOL"), s"bad global heap signature at $addr")
    require((hb.get(4) & 0xff) == 1, "global heap version")
    val size = hb.getLong(8)
    require(size >= 16 && size <= (1L << 26), s"implausible global heap size $size")
    val body = new Array[Byte]((size - 16).toInt)
    raf.readFully(body)
    val bb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
    val out = Map.newBuilder[Int, Array[Byte]]
    var off = 0
    var done = false
    while (!done && off + 16 <= body.length) {
      val idx = bb.getShort(off) & 0xffff
      val objSize = bb.getLong(off + 8)
      if (idx == 0) done = true // free-space terminator
      else {
        require(objSize >= 0 && off + 16 + objSize <= body.length,
          s"global heap object $idx overruns its collection")
        out += idx -> java.util.Arrays.copyOfRange(body, off + 16,
          off + 16 + objSize.toInt)
        off += 16 + ((objSize.toInt + 7) / 8) * 8
      }
    }
    out.result()
  }

  private def readRange(raf: FsIO.In, st: Storage, elemSize: Int,
                        start: Long, end: Long): ByteBuffer = {
    val outLen = ((end - start) * elemSize).toInt
    st match {
      case Contiguous(addr) =>
        val b = new Array[Byte](outLen)
        raf.seek(addr + start * elemSize); raf.readFully(b)
        ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      case Inline(bytes) =>
        ByteBuffer.wrap(bytes, (start * elemSize).toInt, outLen)
          .slice().order(ByteOrder.LITTLE_ENDIAN)
      case Chunked(chunkElems, filters, chunks) =>
        val out = new Array[Byte](outLen)
        val nominal = (chunkElems * elemSize).toInt
        // first chunk whose range can overlap [start, end)
        var ci = {
          val i = java.util.Arrays.binarySearch(chunks.map(_.elemStart), start)
          if (i >= 0) i else math.max(0, -i - 2)
        }
        while (ci < chunks.length && chunks(ci).elemStart < end) {
          val c = chunks(ci)
          val cEnd = c.elemStart + chunkElems
          if (cEnd > start) {
            // chunk entries come from the file's B-tree: cap the
            // allocation against the nominal chunk size (deflate can
            // expand incompressible data slightly, hence the slack)
            // so a corrupt entry can't trigger a ~2GB per-task alloc
            require(c.storedSize >= 0 && c.storedSize <= nominal.toLong * 2 + 4096,
              s"hdf5 chunk storedSize ${c.storedSize} exceeds nominal $nominal")
            val raw = new Array[Byte](c.storedSize)
            raf.seek(c.addr); raf.readFully(raw)
            val plain = defilter(raw, filters, c.mask, nominal)
            val from = math.max(start, c.elemStart)
            val until = math.min(end, cEnd)
            System.arraycopy(plain, ((from - c.elemStart) * elemSize).toInt,
              out, ((from - start) * elemSize).toInt, ((until - from) * elemSize).toInt)
          }
          ci += 1
        }
        ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    }
  }

  private def kindOf(dt: Dtype): String = (dt.clazz, dt.size, dt.signed) match {
    case (0, 1, true) => "i1"
    case (0, 2, true) => "i2"
    case (0, 4, true) => "i4"
    case (0, 8, true) => "i8"
    case (1, 4, _) => "f4"
    case (1, 8, _) => "f8"
    case (8, 1, _) => "b1" // two-value FALSE/TRUE enum (h5py bool)
    case (9, _, _) => dt.vlenBase match {
      case None    => "vstr"
      case Some(b) => "vseq_" + kindOf(b)
    }
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
        it.flatMap { case (start, end) =>
          val c = (end - start).toInt
          val colVals = readColumnRanges(path, metasB, start, end)
          (0 until c).iterator.map(i => Row.fromSeq(metasB.indices.map(j => colVals(j)(i))))
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Executor-side columnar read of rows [start, end) for the given
    * columns — shared by the RDD path above and the DataSource V2
    * reader ([[Hdf5DataSource]]). One positioned/per-chunk read per
    * (column, range). */
  private[sources] def readColumnRanges(path: String, metas: Array[ColumnMeta],
                                        start: Long, end: Long): Array[Array[Any]] = {
    // one handle per distinct backing file — externally-linked columns
    // read straight from their own file (ColumnMeta.file)
    val rafs = scala.collection.mutable.Map[String, FsIO.In]()
    def rafFor(p: String): FsIO.In =
      rafs.getOrElseUpdate(p, new FsIO.In(p))
    try {
      val c = (end - start).toInt
      metas.map { m =>
        val raf = rafFor(m.file.getOrElse(path))
        val valid: Int => Boolean = m.bitmap match {
          case Some(bst) =>
            val firstByte = start / 8
            val nBytes = (end + 7) / 8 - firstByte
            val bits = readRange(raf, bst, 1, firstByte, firstByte + nBytes)
            i => { val g = start + i - firstByte * 8
              (bits.get((g / 8).toInt) >> (g % 8).toInt & 1) == 1 }
          case None => _ => true
        }
        m.kind match {
          case "str" =>
            val offs = readRange(raf, m.indices.get, 8, start, start + c + 1)
            val o0 = offs.getLong(0); val oN = offs.getLong(c * 8)
            val bytes = readRange(raf, m.data, 1, o0, oN)
            Array.tabulate[Any](c) { i =>
              if (!valid(i)) null
              else {
                val from = (offs.getLong(i * 8) - o0).toInt
                val len = (offs.getLong((i + 1) * 8) - offs.getLong(i * 8)).toInt
                val sb = new Array[Byte](len)
                bytes.position(from); bytes.get(sb); bytes.position(0)
                new String(sb, "UTF-8")
              }
            }
          case "vstr" => // variable-length strings (h5py's default str):
            // 16-byte hvl descriptors in the dataset storage, payload
            // bytes in global-heap collections (GCOL). Collections are
            // parsed once per task and cached — consecutive rows share
            // the same collection, so this is one extra positioned
            // read per collection, not per row.
            val buf = readRange(raf, m.data, 16, start, end)
            val collections = new java.util.HashMap[Long, Map[Int, Array[Byte]]]()
            Array.tabulate[Any](c) { i =>
              if (!valid(i)) null
              else {
                val len = buf.getInt(i * 16)
                val addr = buf.getLong(i * 16 + 4)
                val idx = buf.getInt(i * 16 + 12)
                if (len == 0) ""
                else {
                  var coll = collections.get(addr)
                  if (coll == null) {
                    coll = readGlobalHeap(raf, addr)
                    collections.put(addr, coll)
                  }
                  val bytes = coll.getOrElse(idx, throw new IllegalStateException(
                    s"$path: global-heap object $idx missing at $addr"))
                  require(len <= bytes.length, s"$path: vlen descriptor overruns object")
                  new String(bytes, 0, len, "UTF-8")
                }
              }
            }
          case k if k.startsWith("mat_") => // (n, d) matrix dataset:
            // row-major fixed-width rows -> ArrayType column (the
            // shape ML embedding matrices ship in). The range read
            // uses SCALAR element units so chunked storage (whose
            // chunk grid is linear in scalars) addresses correctly.
            val bk = k.substring(4)
            val d = m.fixedStrSize
            val bs = bk match {
              case "i1" => 1; case "i2" => 2; case "i4" => 4; case "i8" => 8
              case "f4" => 4; case "f8" => 8
            }
            val buf = readRange(raf, m.data, bs, start * d, end * d)
            Array.tabulate[Any](c) { i =>
              if (!valid(i)) null
              else bk match {
                case "i1" => Seq.tabulate(d)(j => buf.get(i * d + j))
                case "i2" => Seq.tabulate(d)(j => buf.getShort((i * d + j) * 2))
                case "i4" => Seq.tabulate(d)(j => buf.getInt((i * d + j) * 4))
                case "i8" => Seq.tabulate(d)(j => buf.getLong((i * d + j) * 8))
                case "f4" => Seq.tabulate(d)(j => buf.getFloat((i * d + j) * 4))
                case "f8" => Seq.tabulate(d)(j => buf.getDouble((i * d + j) * 8))
              }
            }
          case k if k.startsWith("vseq_") => // ragged numeric arrays
            // (h5py vlen_dtype): same hvl descriptors, the payload is
            // `len` base elements -> a Spark ArrayType column
            val bk = k.substring(5)
            val bs = bk match {
              case "i1" => 1; case "i2" => 2; case "i4" => 4; case "i8" => 8
              case "f4" => 4; case "f8" => 8
            }
            val buf = readRange(raf, m.data, 16, start, end)
            val collections = new java.util.HashMap[Long, Map[Int, Array[Byte]]]()
            Array.tabulate[Any](c) { i =>
              if (!valid(i)) null
              else {
                val n = buf.getInt(i * 16)
                val addr = buf.getLong(i * 16 + 4)
                val idx = buf.getInt(i * 16 + 12)
                if (n == 0) Seq.empty
                else {
                  var coll = collections.get(addr)
                  if (coll == null) {
                    coll = readGlobalHeap(raf, addr)
                    collections.put(addr, coll)
                  }
                  val bytes = coll.getOrElse(idx, throw new IllegalStateException(
                    s"$path: global-heap object $idx missing at $addr"))
                  require(n.toLong * bs <= bytes.length,
                    s"$path: vlen sequence overruns its heap object")
                  val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
                  bk match {
                    case "i1" => Seq.tabulate(n)(j => bb.get(j))
                    case "i2" => Seq.tabulate(n)(j => bb.getShort(j * 2))
                    case "i4" => Seq.tabulate(n)(j => bb.getInt(j * 4))
                    case "i8" => Seq.tabulate(n)(j => bb.getLong(j * 8))
                    case "f4" => Seq.tabulate(n)(j => bb.getFloat(j * 4))
                    case "f8" => Seq.tabulate(n)(j => bb.getDouble(j * 8))
                  }
                }
              }
            }
          case "fstr" => // fixed-size null-padded strings (h5py S<n>),
            // packed or a compound-record member (strided)
            val es = m.elemSize
            val rs = if (m.stride > 0) m.stride else es
            val buf = readRange(raf, m.data, rs, start, end)
            Array.tabulate[Any](c) { i =>
              if (!valid(i)) null
              else {
                val arr = new Array[Byte](es)
                buf.position(i * rs + m.fieldOff); buf.get(arr); buf.position(0)
                var len = 0
                while (len < es && arr(len) != 0) len += 1
                new String(arr, 0, len, "UTF-8")
              }
            }
          case k =>
            val es = m.elemSize
            // a compound-record member reads whole records (stride
            // bytes each) and decodes at its field offset
            val rs = if (m.stride > 0) m.stride else es
            val buf = readRange(raf, m.data, rs, start, end)
            Array.tabulate[Any](c) { i =>
              if (!valid(i)) null
              else {
                val o = i * rs + m.fieldOff
                k match {
                  case "b1" => buf.get(o) != 0
                  case "i1" => buf.get(o)
                  case "i2" => buf.getShort(o)
                  case "i4" => buf.getInt(o)
                  case "i8" => buf.getLong(o)
                  case "f4" => buf.getFloat(o)
                  case "f8" => buf.getDouble(o)
                }
              }
            }
        }
      }
    } finally rafs.values.foreach(r => try r.close() catch { case _: Exception => })
  }

  // ==================================================================
  // WRITER
  // ==================================================================

  private final case class OutCol(name: String, kind: String,
                                  data: Array[Byte],          // numeric values or utf8 bytes
                                  indices: Array[Byte],       // str only
                                  bitmap: Array[Byte],        // empty = no nulls
                                  n: Long,
                                  // vlen only: per-row (payloadBytes,
                                  // descriptorLength) + the dtype message
                                  vlenItems: Array[(Array[Byte], Int)] = null,
                                  vlenDt: Array[Byte] = null,
                                  // compound only: dtype message + record size
                                  dtMsg: Array[Byte] = null,
                                  recSize: Int = 0)

  /** Export a DataFrame as a vaex-layout hdf5 file
    * (/table/columns/<name>/data [+ indices, null_bitmap], column_order
    * attribute, dtype='str' marker on string data — the layout
    * writer.py:28-87 produces). Driver-side single-file sink. */
  def toHdf5(df: DataFrame, path: String): Unit = toHdf5Impl(df, path, None)

  /** Same vaex table layout in the MODERN (h5py libver='latest') file
    * format: superblock v3, version-2 object headers, compact
    * link-message groups, dataspace v2, attribute v3 — contiguous
    * storage, or chunked+filtered behind a v4 data layout with a Fixed
    * Array chunk index when `chunked` is set. Exercises (and
    * round-trips through) the latest-format read path. */
  def toHdf5Latest(df: DataFrame, path: String,
                   chunked: Option[(Int, Int, Boolean)] = None): Unit =
    toHdf5Impl(df, path, chunked, latest = true)

  /** Fixture/interop writer for the GENERIC h5py file shape: datasets
    * directly under the root group, no vaex table layout. `fstr`
    * columns carry null-padded fixed-size bytes (h5py `S<n>`). */
  private[graft] def writeFlatFile(path: String,
      longs: Seq[(String, Array[Long])] = Nil,
      doubles: Seq[(String, Array[Double])] = Nil,
      fixedStrings: Seq[(String, Int, Array[String])] = Nil,
      vlenStrings: Seq[(String, Array[String])] = Nil,
      vlenLongSeqs: Seq[(String, Array[Array[Long]])] = Nil,
      vlenDoubleSeqs: Seq[(String, Array[Array[Double]])] = Nil,
      // compound datasets (numpy structured arrays / PyTables
      // tables): (datasetName, fields as (name, "i8"|"f8"|"fstr:N"),
      // rows of Long/Double/String in field order)
      compound: Seq[(String, Seq[(String, String)], Seq[Seq[Any]])] = Nil,
      // (n, d) float32 matrices — the ML embedding-matrix shape
      floatMatrices: Seq[(String, Array[Array[Float]])] = Nil,
      chunkCfg: Option[(Int, Int, Boolean)] = None,
      latest: Boolean = false,
      denseGeom: Option[(Long, Long)] = None,
      heapFilter: Boolean = false,
      softLinks: Seq[(String, String)] = Nil,
      heapMixedIdLen: Int = 0,
      externalLinks: Seq[(String, String, String)] = Nil,
      hugeIndirect: Boolean = false): Unit = {
    val lc = longs.map { case (name, vs) =>
      val b = ByteBuffer.allocate(vs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(b.putLong)
      OutCol(name, "i8", b.array(), Array.empty, Array.empty, vs.length)
    }
    val dc = doubles.map { case (name, vs) =>
      val b = ByteBuffer.allocate(vs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(b.putDouble)
      OutCol(name, "f8", b.array(), Array.empty, Array.empty, vs.length)
    }
    val sc = fixedStrings.map { case (name, width, vs) =>
      val b = new Array[Byte](vs.length * width)
      vs.zipWithIndex.foreach { case (s, i) =>
        val raw = s.getBytes("UTF-8")
        require(raw.length <= width, s"string wider than $width: $s")
        System.arraycopy(raw, 0, b, i * width, raw.length)
      }
      OutCol(name, "fstr", b, Array.empty, Array.empty, vs.length)
    }
    val vc = vlenStrings.map { case (name, vs) =>
      OutCol(name, "vstr", Array.empty, Array.empty, Array.empty, vs.length,
        vlenItems = vs.map { s =>
          val ob = s.getBytes("UTF-8"); (ob, ob.length)
        },
        vlenDt = dtVlenString)
    }
    val qc = vlenLongSeqs.map { case (name, vs) =>
      OutCol(name, "vseq_i8", Array.empty, Array.empty, Array.empty, vs.length,
        vlenItems = vs.map { a =>
          val b = ByteBuffer.allocate(a.length * 8).order(ByteOrder.LITTLE_ENDIAN)
          a.foreach(b.putLong)
          (b.array(), a.length)
        },
        vlenDt = dtVlenSeq(dtFixed(8)))
    }
    val rc = vlenDoubleSeqs.map { case (name, vs) =>
      OutCol(name, "vseq_f8", Array.empty, Array.empty, Array.empty, vs.length,
        vlenItems = vs.map { a =>
          val b = ByteBuffer.allocate(a.length * 8).order(ByteOrder.LITTLE_ENDIAN)
          a.foreach(b.putDouble)
          (b.array(), a.length)
        },
        vlenDt = dtVlenSeq(dtFloat(8)))
    }
    val cc = compound.map { case (name, fields, rows) =>
      val fieldMeta = fields.map { case (fn, kind) =>
        kind match {
          case "i8" => (fn, 8, dtFixed(8))
          case "f8" => (fn, 8, dtFloat(8))
          case s if s.startsWith("fstr:") =>
            val w = s.substring(5).toInt
            require(w > 0 && w <= 4096, s"bad fstr width $w")
            (fn, w, dtString(w))
          case k => throw new IllegalArgumentException(s"compound field kind $k")
        }
      }
      val offsets = fieldMeta.map(_._2).scanLeft(0)(_ + _).init
      val recSize = fieldMeta.map(_._2).sum
      val data = new Array[Byte](rows.size * recSize)
      val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
      rows.zipWithIndex.foreach { case (row, ri) =>
        require(row.size == fieldMeta.size, s"row $ri arity")
        fieldMeta.zip(offsets).zip(row).foreach { case (((_, w, _), off), v) =>
          bb.position(ri * recSize + off)
          v match {
            case l: Long   => bb.putLong(l)
            case d: Double => bb.putDouble(d)
            case s: String =>
              val sb = s.getBytes("UTF-8")
              require(sb.length <= w, s"string wider than $w: $s")
              bb.put(sb) // trailing bytes stay zero (null padding)
            case x => throw new IllegalArgumentException(s"compound value $x")
          }
        }
      }
      OutCol(name, "compound", data, Array.empty, Array.empty, rows.size,
        dtMsg = dtCompoundV1(recSize,
          fieldMeta.zip(offsets).map { case ((fn, _, dt), off) => (fn, off, dt) }),
        recSize = recSize)
    }
    val mc = floatMatrices.map { case (name, m) =>
      val d = if (m.nonEmpty) m.head.length else 0
      require(m.forall(_.length == d), s"ragged matrix $name")
      val b = ByteBuffer.allocate(m.length * d * 4).order(ByteOrder.LITTLE_ENDIAN)
      m.foreach(_.foreach(b.putFloat))
      OutCol(name, "mat_f4", b.array(), Array.empty, Array.empty, m.length,
        recSize = d)
    }
    writeFile(path, lc ++ dc ++ sc ++ vc ++ qc ++ rc ++ cc ++ mc, chunkCfg, flat = true, latest = latest,
      denseGeom = denseGeom, heapFilter = heapFilter,
      softLinks = softLinks, heapMixedIdLen = heapMixedIdLen,
      externalLinks = externalLinks, hugeIndirect = hugeIndirect)
  }

  /** Same layout, but every dataset stored CHUNKED with the standard
    * shuffle+deflate filter pipeline (what `h5py.create_dataset(...,
    * chunks=..., compression='gzip', shuffle=True)` produces) — the
    * round-trip fixture for the chunked read path and a genuinely
    * smaller interchange file. `chunkElems` is per-dataset elements
    * per chunk (string byte payloads chunk in bytes). */
  def toHdf5Chunked(df: DataFrame, path: String, chunkElems: Int = 65536,
                    level: Int = 6, shuffle: Boolean = true): Unit = {
    require(chunkElems > 0 && level >= 1 && level <= 9, "bad chunk/level")
    toHdf5Impl(df, path, Some((chunkElems, level, shuffle)))
  }

  private def toHdf5Impl(df: DataFrame, path: String,
                         chunkCfg: Option[(Int, Int, Boolean)],
                         latest: Boolean = false): Unit = {
    val n0 = df.count()
    require(n0 < Int.MaxValue,
      "hdf5 export caps at 2^31 rows per file; use toHdf5Sharded")
    writeFile(path, buildCols(df.schema, n0.toInt, df.toLocalIterator()),
      chunkCfg, latest = latest)
  }

  /** DISTRIBUTED hdf5 export: each partition writes its own
    * `part-NNNNN.hdf5` file from its executor — no driver streaming,
    * and the per-FILE 2^31-row/matrix-size caps apply per shard, not
    * per table. Read back with `Readers.open(s"$dir/part-*.hdf5")`
    * (glob concat). Stale part files from a previous wider export are
    * cleared. Returns the shard count (empty partitions skip).
    *
    * `dir` is a Hadoop FileSystem path (`file:`, `hdfs:`, `s3a:`,
    * ...): shards stream through `FileSystem.create` against the
    * target filesystem — no shared-POSIX-mount assumption. Partition
    * rows make ONE pass into an executor-local spill (bounded heap on
    * skewed partitions) before the columnar write. */
  def toHdf5Sharded(df: DataFrame, dir: String,
                    chunkCfg: Option[(Int, Int, Boolean)] = None): Int = {
    val schema = df.schema
    FsIO.mkdirs(dir)
    FsIO.deleteShards(dir, ".hdf5")
    val cfg = chunkCfg
    df.rdd.mapPartitionsWithIndex { (pi, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        // HDF5's columnar layout needs the row count before the first
        // byte — get it from ONE streaming pass into an executor-local
        // spill instead of buffering the partition's Row objects
        // on-heap (bounded memory on skewed partitions; the remaining
        // heap cost is the primitive column buffers, inherent to a
        // column-ordered file written from row-ordered input)
        val (spillFile, n) = RowSpill.spill(schema, it)
        try {
          require(n < Int.MaxValue,
            "hdf5 export caps at 2^31 rows per shard — repartition finer")
          writeFile(f"$dir/part-$pi%05d.hdf5",
            buildCols(schema, n.toInt,
              scala.jdk.CollectionConverters.IteratorHasAsJava(
                RowSpill.iterate(schema, spillFile)).asJava),
            cfg)
        } finally spillFile.delete()
        Iterator.single(1)
      }
    }.count().toInt
  }

  /** Columnar buffers for one output file: `n` rows pulled from
    * `it` (driver-streamed in [[toHdf5Impl]], one partition's rows in
    * [[toHdf5Sharded]]). */
  private def buildCols(schema: StructType, n: Int,
                        it: java.util.Iterator[Row]): Seq[OutCol] = {
    val builders: Array[Any] = schema.fields.map { f =>
      f.dataType match {
        case BooleanType => new Array[Byte](n) // 0/1 under the bool enum
        case ByteType => new Array[Byte](n)
        case ShortType => new Array[Short](n)
        case IntegerType => new Array[Int](n)
        case LongType => new Array[Long](n)
        case FloatType => new Array[Float](n)
        case DoubleType => new Array[Double](n)
        case StringType => new Array[String](n)
        // array columns (embedding shape) -> (n, d) matrix datasets
        case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) =>
          new Array[Seq[Any]](n)
        case t => throw new IllegalArgumentException(s"hdf5 export: unsupported type $t")
      }
    }
    val anyNull = new Array[Boolean](schema.length)
    val validBits = Array.fill(schema.length)(new Array[Byte]((n + 7) / 8))
    var i = 0
    while (it.hasNext) {
      val r = it.next()
      var j = 0
      while (j < schema.length) {
        if (r.isNullAt(j)) anyNull(j) = true
        else {
          validBits(j)(i / 8) = (validBits(j)(i / 8) | (1 << (i % 8)).toByte).toByte
          schema.fields(j).dataType match {
            case BooleanType =>
              builders(j).asInstanceOf[Array[Byte]](i) = if (r.getBoolean(j)) 1 else 0
            case ByteType => builders(j).asInstanceOf[Array[Byte]](i) = r.getByte(j)
            case ShortType => builders(j).asInstanceOf[Array[Short]](i) = r.getShort(j)
            case IntegerType => builders(j).asInstanceOf[Array[Int]](i) = r.getInt(j)
            case LongType => builders(j).asInstanceOf[Array[Long]](i) = r.getLong(j)
            case FloatType => builders(j).asInstanceOf[Array[Float]](i) = r.getFloat(j)
            case DoubleType => builders(j).asInstanceOf[Array[Double]](i) = r.getDouble(j)
            case StringType => builders(j).asInstanceOf[Array[String]](i) = r.getString(j)
            case ArrayType(_, _) =>
              builders(j).asInstanceOf[Array[Seq[Any]]](i) = r.getSeq[Any](j)
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
        case BooleanType =>
          OutCol(f.name, "b1", builders(j).asInstanceOf[Array[Byte]], Array.empty, bm, n)
        case ArrayType(et, _) =>
          val rows = builders(j).asInstanceOf[Array[Seq[Any]]]
          val d = rows.collectFirst { case s if s != null => s.length }.getOrElse(0)
          require(d >= 1,
            s"${f.name}: cannot export an all-null or zero-width array column")
          val (kind, bs) = et match {
            case FloatType => ("mat_f4", 4); case DoubleType => ("mat_f8", 8)
            case IntegerType => ("mat_i4", 4); case LongType => ("mat_i8", 8)
            case t => throw new IllegalArgumentException(s"array element type $t")
          }
          val totalBytes = n.toLong * d * bs // Int math would overflow first
          require(totalBytes <= Int.MaxValue,
            s"${f.name}: matrix column is $totalBytes bytes (> 2^31) — shard first")
          val bb = ByteBuffer.allocate(totalBytes.toInt).order(ByteOrder.LITTLE_ENDIAN)
          rows.zipWithIndex.foreach { case (s, ri) =>
            if (s == null) bb.position(bb.position() + d * bs) // null row: zeros
            else {
              require(s.length == d,
                s"${f.name}: ragged array rows (row $ri has ${s.length}, need $d)")
              require(!s.contains(null),
                s"${f.name}: null array ELEMENT at row $ri (matrices have no per-element nulls)")
              et match {
                case FloatType => s.foreach(v => bb.putFloat(v.asInstanceOf[Float]))
                case DoubleType => s.foreach(v => bb.putDouble(v.asInstanceOf[Double]))
                case IntegerType => s.foreach(v => bb.putInt(v.asInstanceOf[Int]))
                case LongType => s.foreach(v => bb.putLong(v.asInstanceOf[Long]))
                case _ => ()
              }
            }
          }
          OutCol(f.name, kind, bb.array(), Array.empty, bm, n, recSize = d)
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
    cols.toSeq
  }

  // ------------------------------------------------------------ emitter

  private def align8(x: Long): Long = (x + 7) / 8 * 8

  /** Deflate at a fixed level (zlib wrapper — HDF5's deflate filter). */
  private def deflate(bytes: Array[Byte], level: Int): Array[Byte] = {
    val d = new java.util.zip.Deflater(level)
    try {
      d.setInput(bytes); d.finish()
      val out = new java.io.ByteArrayOutputStream(math.max(64, bytes.length / 4))
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  /** Forward shuffle filter: element-major -> byte-plane-major. */
  private def shuffleBytes(bytes: Array[Byte], elemSize: Int): Array[Byte] = {
    if (elemSize <= 1) return bytes
    val n = bytes.length / elemSize
    val out = new Array[Byte](bytes.length)
    var s = 0
    while (s < elemSize) {
      var i = 0
      while (i < n) { out(s * n + i) = bytes(i * elemSize + s); i += 1 }
      s += 1
    }
    out
  }

  // ---- shared structure encoders (v1 and latest-format emitters) ----

  private def buf(size: Int): ByteBuffer =
    ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)

  /** v1 header message wrapper (2-byte type, body padded to 8). */
  private def msg(mType: Int, body: Array[Byte]): Array[Byte] = {
    val padded = align8(body.length).toInt
    val b = buf(8 + padded)
    b.putShort(mType.toShort); b.putShort(padded.toShort); b.putInt(0)
    b.put(body); b.array()
  }
  private def dataspace1d(n: Long): Array[Byte] = {
    val b = buf(16); b.put(1.toByte); b.put(1.toByte); b.put(0.toByte)
    b.position(8); b.putLong(n); b.array()
  }
  /** v2 dataspace (libver latest): ver(1) rank(1) flags(1) type(1) dims. */
  private def dataspace1dV2(n: Long): Array[Byte] = {
    val b = buf(12); b.put(2.toByte); b.put(1.toByte); b.put(0.toByte)
    b.put(1.toByte) // type: simple
    b.putLong(n); b.array()
  }
  private def dataspaceScalar: Array[Byte] = {
    val b = buf(8); b.put(1.toByte); b.put(0.toByte); b.array()
  }
  /** rank-2 v1 dataspace: an (n, d) matrix dataset. */
  private def dataspace2d(n: Long, d: Long): Array[Byte] = {
    val b = buf(24); b.put(1.toByte); b.put(2.toByte); b.put(0.toByte)
    b.position(8); b.putLong(n); b.putLong(d); b.array()
  }
  private def dataspace2dV2(n: Long, d: Long): Array[Byte] = {
    val b = buf(20); b.put(2.toByte); b.put(2.toByte); b.put(0.toByte)
    b.put(1.toByte) // type: simple
    b.putLong(n); b.putLong(d); b.array()
  }
  private def dtFixed(size: Int): Array[Byte] = {
    val b = buf(12)
    b.put(0x10.toByte)             // version 1, class 0
    b.put(0x08.toByte); b.put(0.toByte); b.put(0.toByte) // LE, signed
    b.putInt(size)
    b.putShort(0); b.putShort((size * 8).toShort)
    b.array()
  }
  private def dtFloat(size: Int): Array[Byte] = {
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
  /** Boolean enumeration datatype — the ENUM{FALSE:0, TRUE:1} over
    * int8 that libhdf5 writes for h5py's np.bool_ dtype. */
  private def dtEnumBool: Array[Byte] = {
    val base = dtFixed(1)
    // v1 member names are null-terminated, zero-padded to 8 bytes
    val b = buf(8 + base.length + 8 + 8 + 2)
    b.put(0x18.toByte)             // version 1, class 8
    b.put(2.toByte); b.put(0.toByte); b.put(0.toByte) // 2 members
    b.putInt(1)                    // element size
    b.put(base)
    b.put("FALSE".getBytes("US-ASCII")); b.position(b.position() + 3)
    b.put("TRUE".getBytes("US-ASCII")); b.position(b.position() + 4)
    b.put(0.toByte); b.put(1.toByte) // member values
    b.array()
  }
  private def dtString(size: Int): Array[Byte] = {
    val b = buf(8)
    b.put(0x13.toByte)             // version 1, class 3
    b.put(0.toByte); b.put(0.toByte); b.put(0.toByte) // null-terminated, ascii
    b.putInt(math.max(size, 1))
    b.array()
  }
  /** Variable-length string datatype (class 9, vlen type 1): 16-byte
    * hvl descriptor elements + an embedded 1-byte string base type —
    * the message shape libhdf5 writes for h5py's default str dtype. */
  private def dtVlenString: Array[Byte] = {
    val b = buf(16)
    b.put(0x19.toByte)             // version 1, class 9
    b.put(0x01.toByte)             // vlen type: string
    b.put(0.toByte); b.put(0.toByte)
    b.putInt(16)                   // element = hvl descriptor
    b.put(dtString(1))             // base type: 1-byte string
    b.array()
  }
  /** Compound datatype (class 6, v1 member encoding): `fields` =
    * (name, byteOffset, memberDtypeMessage); the layout a numpy
    * structured array / PyTables table stores. */
  private def dtCompoundV1(recSize: Int,
                           fields: Seq[(String, Int, Array[Byte])]): Array[Byte] = {
    val parts = fields.map { case (n, off, dt) =>
      val nb = n.getBytes("UTF-8")
      val padded = (nb.length + 1 + 7) / 8 * 8
      val b = buf(padded + 4 + 4 + 4 + 4 + 16 + dt.length)
      b.put(nb); b.position(padded) // NUL + zero pad to 8
      b.putInt(off)
      b.put(0.toByte)               // dimensionality
      b.position(b.position() + 3)  // reserved
      b.putInt(0)                   // dimension permutation
      b.putInt(0)                   // reserved
      b.position(b.position() + 16) // dimension sizes [4]
      b.put(dt)
      b.array()
    }
    val b = buf(8 + parts.map(_.length).sum)
    b.put(0x16.toByte)              // version 1, class 6
    b.put((fields.size & 0xff).toByte)        // member count low
    b.put(((fields.size >> 8) & 0xff).toByte) // member count high
    b.put(0.toByte)
    b.putInt(recSize)
    parts.foreach(b.put)
    b.array()
  }
  /** Variable-length sequence datatype (class 9, vlen type 0) over a
    * numeric base — h5py's `vlen_dtype(np.int64/float64/...)`. */
  private def dtVlenSeq(base: Array[Byte]): Array[Byte] = {
    val b = buf(8 + base.length)
    b.put(0x19.toByte)             // version 1, class 9
    b.put(0x00.toByte)             // vlen type: sequence
    b.put(0.toByte); b.put(0.toByte)
    b.putInt(16)
    b.put(base)
    b.array()
  }
  private def layoutContiguous(addr: Long, size: Long): Array[Byte] = {
    val b = buf(18); b.put(3.toByte); b.put(1.toByte); b.putLong(addr); b.putLong(size); b.array()
  }
  private def layoutChunked(btreeAddr: Long, chunkElems: Int, elemSize: Int): Array[Byte] = {
    val b = buf(19)
    b.put(3.toByte); b.put(2.toByte)   // v3, chunked
    b.put(2.toByte)                    // dimensionality = rank 1 + elem dim
    b.putLong(btreeAddr)
    b.putInt(chunkElems); b.putInt(elemSize)
    b.array()
  }
  /** v1 filter pipeline message; filters = (id, clientValues). */
  private def filterPipeline(filters: Seq[(Int, Seq[Int])]): Array[Byte] = {
    val sz = 8 + filters.map(f => 8 + 4 * f._2.size + (if (f._2.size % 2 == 1) 4 else 0)).sum
    val b = buf(sz)
    b.put(1.toByte); b.put(filters.size.toByte); b.putShort(0); b.putInt(0)
    filters.foreach { case (id, values) =>
      b.putShort(id.toShort); b.putShort(0 /*no name*/); b.putShort(0 /*flags*/)
      b.putShort(values.size.toShort)
      values.foreach(b.putInt)
      if (values.size % 2 == 1) b.putInt(0) // pad to 8
    }
    b.array()
  }
  /** v2 filter pipeline (latest format: no reserved bytes, no name
    * field for the built-in ids < 256, no value padding). */
  private def filterPipelineV2(filters: Seq[(Int, Seq[Int])]): Array[Byte] = {
    val sz = 2 + filters.map(f => 6 + 4 * f._2.size).sum
    val b = buf(sz)
    b.put(2.toByte); b.put(filters.size.toByte)
    filters.foreach { case (id, values) =>
      require(id < 256, "custom filter ids need a name field")
      b.putShort(id.toShort); b.putShort(0 /*flags*/)
      b.putShort(values.size.toShort)
      values.foreach(b.putInt)
    }
    b.array()
  }
  /** v1 attribute message (8-padded regions), string scalar value. */
  private def strAttr(name: String, value: String): Array[Byte] = {
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
  /** v1 object header around already-wrapped messages. */
  private def objectHeader(msgs: Seq[Array[Byte]]): Array[Byte] = {
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

  // ---- latest-format (superblock v3 / OHDR) structure encoders ----

  /** Bob Jenkins lookup3 `hashlittle` over bytes (HDF5's metadata
    * checksum, H5_checksum_lookup3 — public-domain algorithm from
    * lookup3.c). Our reader doesn't verify checksums, but the writer
    * emits real ones so produced files are spec-conformant. */
  private[graft] def lookup3(data: Array[Byte], initval: Int = 0): Int = {
    @inline def rot(x: Int, k: Int): Int = (x << k) | (x >>> (32 - k))
    var a = 0xdeadbeef + data.length + initval
    var b = a; var c = a
    var i = 0
    var len = data.length
    def word(o: Int, nb: Int): Int = {
      var v = 0; var j = 0
      while (j < nb && o + j < data.length) { v |= (data(o + j) & 0xff) << (8 * j); j += 1 }
      v
    }
    while (len > 12) {
      a += word(i, 4); b += word(i + 4, 4); c += word(i + 8, 4)
      a -= c; a ^= rot(c, 4); c += b
      b -= a; b ^= rot(a, 6); a += c
      c -= b; c ^= rot(b, 8); b += a
      a -= c; a ^= rot(c, 16); c += b
      b -= a; b ^= rot(a, 19); a += c
      c -= b; c ^= rot(b, 4); b += a
      i += 12; len -= 12
    }
    if (len > 0) {
      a += word(i, math.min(len, 4))
      b += word(i + 4, math.min(math.max(len - 4, 0), 4))
      c += word(i + 8, math.min(math.max(len - 8, 0), 4))
      c ^= b; c -= rot(b, 14)
      a ^= c; a -= rot(c, 11)
      b ^= a; b -= rot(a, 25)
      c ^= b; c -= rot(b, 16)
      a ^= c; a -= rot(c, 4)
      b ^= a; b -= rot(a, 14)
      c ^= b; c -= rot(b, 24)
    }
    c
  }

  /** v2 header message wrapper: type(1) size(2) flags(1) body, no
    * padding requirement. */
  private def msgV2(mType: Int, body: Array[Byte]): Array[Byte] = {
    val b = buf(4 + body.length)
    b.put(mType.toByte); b.putShort(body.length.toShort); b.put(0.toByte)
    b.put(body); b.array()
  }
  /** v2 object header: OHDR prefix (no times, 4-byte chunk-0 size),
    * messages, lookup3 checksum over everything before it. */
  private def ohdrV2(msgs: Seq[Array[Byte]]): Array[Byte] = {
    val total = msgs.map(_.length).sum
    val b = buf(4 + 2 + 4 + total + 4)
    b.putInt(leMagic("OHDR"))
    b.put(2.toByte)
    b.put(0x02.toByte) // flags: 4-byte size-of-chunk-0 field
    b.putInt(total)
    msgs.foreach(b.put)
    val sum = lookup3(java.util.Arrays.copyOfRange(b.array(), 0, b.position()))
    b.putInt(sum)
    b.array()
  }
  /** Hard-link message (new-style compact groups). */
  private def linkMsg(name: String, ohAddr: Long): Array[Byte] = {
    val nameB = name.getBytes("UTF-8")
    require(nameB.length <= 255, s"link name too long: $name")
    val b = buf(2 + 1 + nameB.length + 8)
    b.put(1.toByte)    // version
    b.put(0.toByte)    // flags: 1-byte name length, hard link, no corder
    b.put(nameB.length.toByte)
    b.put(nameB)
    b.putLong(ohAddr)
    b.array()
  }
  /** Soft-link message (new-style compact groups): explicit link type
    * 1, 2-byte target length + target path bytes. */
  private def softLinkMsg(name: String, target: String): Array[Byte] = {
    val nameB = name.getBytes("UTF-8")
    val tB = target.getBytes("UTF-8")
    require(nameB.length <= 255 && tB.length <= 65535, s"soft link too long: $name")
    val b = buf(3 + 1 + nameB.length + 2 + tB.length)
    b.put(1.toByte)    // version
    b.put(0x08.toByte) // flags: link type present, 1-byte name length
    b.put(1.toByte)    // link type: soft
    b.put(nameB.length.toByte)
    b.put(nameB)
    b.putShort(tB.length.toShort)
    b.put(tB)
    b.array()
  }
  /** External-link message (link type 64): 2-byte value length, then
    * version/flags byte (0) + NUL-terminated target file name +
    * NUL-terminated object path within it. */
  private def extLinkMsg(name: String, file: String, objPath: String): Array[Byte] = {
    val nameB = name.getBytes("UTF-8")
    val fB = file.getBytes("UTF-8")
    val oB = objPath.getBytes("UTF-8")
    val vLen = 1 + fB.length + 1 + oB.length + 1
    require(nameB.length <= 255 && vLen <= 65535, s"external link too long: $name")
    val b = buf(3 + 1 + nameB.length + 2 + vLen)
    b.put(1.toByte)     // version
    b.put(0x08.toByte)  // flags: link type present, 1-byte name length
    b.put(64.toByte)    // link type: external
    b.put(nameB.length.toByte)
    b.put(nameB)
    b.putShort(vLen.toShort)
    b.put(0.toByte)     // ext-link version(4) | flags(4) = 0
    b.put(fB); b.put(0.toByte)
    b.put(oB); b.put(0.toByte)
    b.array()
  }
  /** Link Info with no dense storage (compact links live in the
    * header as link messages). */
  private def linkInfoCompact: Array[Byte] = {
    val b = buf(18)
    b.put(0.toByte); b.put(0.toByte) // version, flags (no corder tracking)
    b.putLong(UNDEF)                 // fractal heap
    b.putLong(UNDEF)                 // name-index v2 btree
    b.array()
  }
  /** Link Info pointing at dense storage (fractal heap + name index). */
  private def linkInfoDense(fheap: Long, nameBt: Long): Array[Byte] = {
    val b = buf(18)
    b.put(0.toByte); b.put(0.toByte)
    b.putLong(fheap); b.putLong(nameBt)
    b.array()
  }
  private def groupInfoMsg: Array[Byte] = Array[Byte](0, 0) // version, flags
  /** v3 attribute message (unpadded regions + charset), string scalar. */
  private def strAttrV3(name: String, value: String): Array[Byte] = {
    val nameB = name.getBytes("UTF-8") :+ 0.toByte
    val dtB = dtString(value.length)
    val dsB = dataspaceScalar
    val b = buf(9 + nameB.length + dtB.length + dsB.length + math.max(value.length, 1))
    b.put(3.toByte); b.put(0.toByte)
    b.putShort(nameB.length.toShort)
    b.putShort(dtB.length.toShort)
    b.putShort(dsB.length.toShort)
    b.put(0.toByte) // name charset: ASCII
    b.put(nameB); b.put(dtB); b.put(dsB)
    b.put(value.getBytes("UTF-8"))
    b.array()
  }
  /** v3 chunked layout for a rank-2 (rows, d) dataset: full-width
    * chunks of `chunkRows` rows. */
  private def layoutChunked2d(btreeAddr: Long, chunkRows: Int, d: Int,
                              elemSize: Int): Array[Byte] = {
    val b = buf(3 + 8 + 12)
    b.put(3.toByte); b.put(2.toByte)   // v3, chunked
    b.put(3.toByte)                    // dimensionality: rank 2 + elem dim
    b.putLong(btreeAddr)
    b.putInt(chunkRows); b.putInt(d); b.putInt(elemSize)
    b.array()
  }
  /** v4 chunked data layout with a Fixed Array index (page bits sized
    * so the data block never pages). */
  private def layoutChunkedV4(faAddr: Long, chunkElems: Long, elemSize: Int,
                              pageBits: Int): Array[Byte] = {
    val b = buf(1 + 1 + 1 + 1 + 1 + 16 + 1 + 1 + 8)
    b.put(4.toByte); b.put(2.toByte)   // v4, chunked
    b.put(0.toByte)                    // flags
    b.put(2.toByte)                    // dimensionality: rank 1 + elem dim
    b.put(8.toByte)                    // dim size encoded length
    b.putLong(chunkElems); b.putLong(elemSize.toLong)
    b.put(3.toByte)                    // index type: fixed array
    b.put(pageBits.toByte)
    b.putLong(faAddr)
    b.array()
  }

  /** Two-phase writer: `plan` computes every object's address given a
    * metadata base; run once to size the metadata region, place data
    * after it, run again, emit. Optional `chunkCfg` (chunkElems,
    * deflateLevel, shuffle) stores every dataset chunked+filtered
    * behind a v1 type-1 chunk B-tree instead of contiguous. */
  private def writeFile(path: String, cols: Seq[OutCol],
                        chunkCfg: Option[(Int, Int, Boolean)] = None,
                        flat: Boolean = false, latest: Boolean = false,
                        denseGeom: Option[(Long, Long)] = None,
                        heapFilter: Boolean = false,
                        softLinks: Seq[(String, String)] = Nil,
                        heapMixedIdLen: Int = 0,
                        externalLinks: Seq[(String, String, String)] = Nil,
                        hugeIndirect: Boolean = false): Unit = {
    val patches = scala.collection.mutable.ArrayBuffer[(Long, Array[Byte])]()
    val sbSize = if (latest) 48L else 96L // superblock v3 vs v0
    var cursor = sbSize
    def alloc(size: Long): Long = { val a = cursor; cursor = align8(cursor + size); a }
    def emit(addr: Long, bytes: Array[Byte]): Unit = patches += ((addr, bytes))
    // compressed chunks per dataset, computed once (stable across the
    // two plan runs — only addresses change between runs)
    val chunkCache = scala.collection.mutable.Map[String, Array[Array[Byte]]]()

    /** v1 type-1 chunk B-tree over stored chunks (any depth needed;
      * node fan-out 2·32 = the default indexed-storage K readers
      * assume with a v0 superblock). Returns the root address. */
    def writeChunkBtree(chunks: Seq[(Long, Int, Long)] /*(addr, storedSize, elemStart)*/,
                        chunkElems: Int, keyDims: Int = 2): Long = {
      val fanout = 64
      // size(4) mask(4) + keyDims offsets (rank + elem dim); only the
      // FIRST offset varies — rank-2 chunks span full rows
      val keySize = 8 + 8 * keyDims
      val nodeSize = 24 + fanout * (keySize + 8) + keySize
      def key(b: ByteBuffer, storedSize: Int, elemStart: Long): Unit = {
        b.putInt(storedSize); b.putInt(0); b.putLong(elemStart)
        for (_ <- 1 until keyDims) b.putLong(0L)
      }
      /** entries: (firstChunkStoredSize, firstElemStart, childAddr);
        * returns this level's nodes as the next level's entries. */
      def level(entries: Seq[(Int, Long, Long)], lvl: Int,
                endElem: Long): Seq[(Int, Long, Long)] = {
        val groups = entries.grouped(fanout).toSeq
        val addrs = groups.map(_ => alloc(nodeSize))
        groups.zipWithIndex.map { case (grp, gi) =>
          val b = buf(nodeSize)
          b.putInt(leMagic("TREE")); b.put(1.toByte); b.put(lvl.toByte)
          b.putShort(grp.size.toShort)
          b.putLong(if (gi == 0) UNDEF else addrs(gi - 1))
          b.putLong(if (gi == groups.size - 1) UNDEF else addrs(gi + 1))
          grp.foreach { case (sz, es, child) => key(b, sz, es); b.putLong(child) }
          // final key: first entry of the next group, or the dataset end
          val (fsz, fes) = groups.lift(gi + 1).map(g => (g.head._1, g.head._2))
            .getOrElse((0, endElem))
          key(b, fsz, fes)
          emit(addrs(gi), b.array())
          (grp.head._1, grp.head._2, addrs(gi))
        }
      }
      if (chunks.isEmpty) { // empty dataset: one empty leaf
        val a = alloc(nodeSize); val b = buf(nodeSize)
        b.putInt(leMagic("TREE")); b.put(1.toByte); b.put(0.toByte); b.putShort(0)
        b.putLong(UNDEF); b.putLong(UNDEF); key(b, 0, 0L)
        emit(a, b.array()); return a
      }
      val endElem = chunks.size.toLong * chunkElems
      var lvl = 0
      var entries: Seq[(Int, Long, Long)] =
        chunks.map { case (addr, sz, es) => (sz, es, addr) }
      while (entries.size > 1 || lvl == 0) {
        val isLast = entries.size <= fanout
        entries = level(entries, lvl, endElem)
        lvl += 1
        if (isLast) return entries.head._3
      }
      entries.head._3
    }
    /** Emit a dataset object: returns OH address. `dims2 > 0` writes
      * a rank-2 (n, dims2) dataspace — matrix datasets. */
    def writeDataset(n: Long, dtype: Array[Byte], dataAddr: Long, dataSize: Long,
                     attrs: Seq[(String, String)], dims2: Long = 0): Long = {
      val ds1 = if (dims2 > 0) dataspace2d(n, dims2) else dataspace1d(n)
      val ds2 = if (dims2 > 0) dataspace2dV2(n, dims2) else dataspace1dV2(n)
      val bytes = if (latest) {
        ohdrV2(Seq(
          msgV2(0x0001, ds2),
          msgV2(0x0003, dtype),
          msgV2(0x0008, layoutContiguous(dataAddr, dataSize))) ++
          attrs.map { case (k, v) => msgV2(0x000C, strAttrV3(k, v)) })
      } else {
        objectHeader(Seq(
          msg(0x0001, ds1),
          msg(0x0003, dtype),
          msg(0x0008, layoutContiguous(dataAddr, dataSize))) ++
          attrs.map { case (k, v) => msg(0x000C, strAttr(k, v)) })
      }
      val a = alloc(bytes.length)
      emit(a, bytes); a
    }

    /** Fixed Array chunk index over filtered chunks (latest format):
      * emits FAHD + unpaged FADB, returns (header address, page bits).
      * locs = (addr, storedSize, elemStart), elemStart ascending. */
    def writeFixedArray(locs: Seq[(Long, Int, Long)]): (Long, Int) = {
      val nChunks = locs.size
      // smallest page >= nChunks keeps the data block unpaged
      val pageBits = math.max(10,
        64 - java.lang.Long.numberOfLeadingZeros(math.max(nChunks - 1, 1).toLong))
      val entrySize = 20 // addr(8) + stored size(8) + filter mask(4)
      val hdrAddr = alloc(28)
      val dbAddr = if (nChunks == 0) UNDEF else alloc(14 + entrySize * nChunks + 4)
      val hb = buf(28)
      hb.putInt(leMagic("FAHD")); hb.put(0.toByte)
      hb.put(1.toByte)              // client: filtered dataset chunks
      hb.put(entrySize.toByte); hb.put(pageBits.toByte)
      hb.putLong(nChunks.toLong); hb.putLong(dbAddr)
      hb.putInt(lookup3(java.util.Arrays.copyOfRange(hb.array(), 0, 24)))
      emit(hdrAddr, hb.array())
      if (nChunks > 0) {
        val db = buf(14 + entrySize * nChunks + 4)
        db.putInt(leMagic("FADB")); db.put(0.toByte); db.put(1.toByte)
        db.putLong(hdrAddr)
        locs.foreach { case (addr, sz, _) =>
          db.putLong(addr); db.putLong(sz.toLong); db.putInt(0)
        }
        db.putInt(lookup3(java.util.Arrays.copyOfRange(db.array(), 0, db.position())))
        emit(dbAddr, db.array())
      }
      (hdrAddr, pageBits)
    }

    /** New-style group (latest format): compact (one link message per
      * child) at or below h5py's 8-link threshold, DENSE (serialized
      * link messages in a fractal heap + name-hash v2 B-tree) above
      * it — mirroring what libhdf5's link phase-change defaults
      * produce, so wide tables exercise the dense read path. */
    def writeGroupLatest(children: Seq[(String, Long)],
                         attrs: Seq[(String, String)],
                         soft: Seq[(String, String)] = Nil,
                         ext: Seq[(String, String, String)] = Nil): Long = {
      val sorted = children.sortBy(_._1)
      if (sorted.size > 8) return denseGeom match {
        // dense groups serialize link MESSAGES into the fractal heap
        // — soft/external bodies ride along like hard ones (the old
        // path silently DROPPED them)
        case Some((s, m)) => writeGroupDense(sorted, attrs, s, m, soft, ext)
        case None => writeGroupDense(sorted, attrs, soft = soft, ext = ext)
      }
      val linkMsgs =
        (sorted.map { case (n, a) => (n, linkMsg(n, a)) } ++
          soft.map { case (n, t) => (n, softLinkMsg(n, t)) } ++
          ext.map { case (n, fl, op) => (n, extLinkMsg(n, fl, op)) })
          .sortBy(_._1).map { case (_, m) => msgV2(0x0006, m) }
      val msgs = Seq(msgV2(0x0002, linkInfoCompact), msgV2(0x000A, groupInfoMsg)) ++
        linkMsgs ++
        attrs.map { case (k, v) => msgV2(0x000C, strAttrV3(k, v)) }
      val bytes = ohdrV2(msgs)
      val a = alloc(bytes.length)
      emit(a, bytes); a
    }

    /** Dense link storage: serialized link messages in fractal-heap
      * direct blocks, plus a lookup3-name-hash v2 B-tree index, all
      * with genuine checksums. Small groups get the compact shapes
      * (one root direct block, single-leaf tree); groups whose links
      * overflow them get the REAL wide shapes — direct blocks laid
      * out by the standard doubling table under a root indirect block
      * (recursing into nested indirect rows), and a depth-1 B-tree
      * with an internal (BTIN) root over multiple leaves.
      * `startSize`/`maxDirectSize` parametrize the doubling table so
      * fixtures can force deep nesting cheaply. */
    def writeGroupDense(sorted: Seq[(String, Long)],
                        attrs: Seq[(String, String)],
                        startSize: Long = 512L,
                        maxDirectSize: Long = 65536L,
                        soft: Seq[(String, String)] = Nil,
                        ext: Seq[(String, String, String)] = Nil): Long = {
      val allBodies =
        (sorted.map { case (n, a) => (n, linkMsg(n, a)) } ++
          soft.map { case (n, t) => (n, softLinkMsg(n, t)) } ++
          ext.map { case (n, fl, op) => (n, extLinkMsg(n, fl, op)) })
          .sortBy(_._1)
      // heap geometry: 32-bit heap offsets, 2-byte lengths. ID length
      // 7 = exactly a managed ID; `heapMixedIdLen` > 0 widens the IDs
      // and routes links through the OTHER two heap object classes —
      // TINY (payload embedded in the ID) for links that fit, direct
      // HUGE (address + length in the ID, bytes alloc'd outside the
      // heap) for long-named links — exercising the reader's full
      // heap-ID dispatch. Real libhdf5 picks classes by size the same
      // way; which class a given fixture link lands in is the
      // writer's choice either way.
      val offsetSize = 4; val lengthSize = 2
      // `hugeIndirect` keeps IDs at the managed minimum, so huge
      // objects go through the huge-object v2 B-tree (libhdf5's
      // default config); `heapMixedIdLen` widens IDs for the DIRECT
      // forms (addr+len in the ID; +mask+memSize when filtered)
      require(!(hugeIndirect && heapMixedIdLen > 0),
        "hugeIndirect uses minimum-width heap IDs (drop heapMixedIdLen)")
      val idLen = if (heapMixedIdLen > 0) heapMixedIdLen else 7
      require(heapMixedIdLen == 0 || heapMixedIdLen >= (if (heapFilter) 29 else 17),
        s"direct huge objects need idLen >= ${if (heapFilter) 29 else 17} " +
          s"(filtered adds mask+memSize), got $heapMixedIdLen")
      val tinyCap =
        if (idLen <= 18) math.min(idLen - 1, 16) else math.min(idLen - 2, 4096)
      // 0 = managed, 1 = huge, 2 = tiny (heap-ID type codes)
      def clsOf(n: String, body: Array[Byte]): Int =
        if (heapMixedIdLen == 0 && !hugeIndirect) 0
        else if (heapMixedIdLen > 0 && body.length <= tinyCap) 2
        else if (n.getBytes("UTF-8").length >= 48) 1
        else 0
      val bodies = allBodies.filter { case (n, b) => clsOf(n, b) == 0 }
      val tinyBodies = allBodies.filter { case (n, b) => clsOf(n, b) == 2 }
      val hugeBodies = allBodies.filter { case (n, b) => clsOf(n, b) == 1 }
      val maxManagedObj = 4096L
      require(bodies.forall(_._2.length <= maxManagedObj), "link message too large")
      val tableWidth = 4; val logW = 2
      require(java.lang.Long.bitCount(startSize) == 1 &&
        java.lang.Long.bitCount(maxDirectSize) == 1 &&
        maxDirectSize >= startSize && startSize >= 64, "bad heap geometry")
      val blockHeaderSize = 4 + 1 + 8 + offsetSize + 4 // FHDB + checksum
      val content = bodies.map(_._2.length).sum
      val fitsOneBlock = blockHeaderSize + content <= maxDirectSize
      val singleBlockSize = if (fitsOneBlock)
        math.max(startSize, java.lang.Long.highestOneBit(
          math.max(blockHeaderSize + content - 1, 1)) << 1) else 0L
      // filtered header adds rootSize(8)+mask(4)+pipeline(12) = 24
      val fheapAddr = alloc(if (heapFilter) 170 else 146)
      def rowSize(row: Int): Long =
        if (row < 2) startSize else startSize << (row - 1)
      val maxDirectRows =
        java.lang.Long.numberOfTrailingZeros(maxDirectSize / startSize) + 2
      // (heapOff, size, rootRow) of direct blocks in heap-linear
      // doubling-table order, lazily — indirect rows expand into their
      // child tables' rows, so the stream recurses
      def blockSizes(nrows: Int, tag: Int => Int): Iterator[(Long, Int)] =
        (0 until nrows).iterator.flatMap { r =>
          if (r < maxDirectRows) Iterator.fill(tableWidth)((rowSize(r), tag(r)))
          else (0 until tableWidth).iterator.flatMap(_ =>
            blockSizes(r - logW, _ => tag(r)))
        }
      // place bodies first-fit-in-order; track which blocks are used
      val usedBlocks = scala.collection.mutable.ArrayBuffer[(Long, Long, Int)]()
      val placed = scala.collection.mutable.ArrayBuffer[(String, Array[Byte], Long)]()
      if (fitsOneBlock) {
        var heapOff = blockHeaderSize.toLong
        usedBlocks += ((0L, singleBlockSize, -1))
        bodies.foreach { case (n, body) =>
          placed += ((n, body, heapOff)); heapOff += body.length
        }
      } else {
        val it = blockSizes(24, r => r) // 24 root rows spans ~any width
        var cur: (Long, Long, Int) = null // (heapOff, size, rootRow)
        var curEnd = 0L; var heapOff = 0L; var pos = 0L
        def nextBlock(): Unit = {
          val (sz, rootRow) = it.next()
          cur = ((heapOff, sz, rootRow)); curEnd = heapOff + sz
          pos = heapOff + blockHeaderSize; heapOff += sz
        }
        nextBlock()
        var blockUsed = false
        bodies.foreach { case (n, body) =>
          require(blockHeaderSize + body.length <= startSize,
            s"link message larger than a heap block: $n")
          if (pos + body.length > curEnd) {
            if (blockUsed) usedBlocks += cur
            nextBlock()
            blockUsed = false
          }
          placed += ((n, body, pos)); pos += body.length; blockUsed = true
        }
        if (blockUsed) usedBlocks += cur
      }
      // emit the direct blocks; a FILTERED heap deflates each whole
      // block image (header included) and records its stored size.
      // Allocation stays at the uncompressed size (+ small headroom)
      // so the two-phase planner's layout is stable even though the
      // compressed length shifts a few bytes between runs (block
      // images embed addresses).
      val addrByOff = usedBlocks.map { case (off, sz, _) =>
        val addr = alloc(if (heapFilter) sz + 64 else sz)
        val db = buf(sz.toInt)
        db.putInt(leMagic("FHDB")); db.put(0.toByte)
        db.putLong(fheapAddr)
        db.putInt(off.toInt) // block offset in heap linear space
        db.putInt(0)         // checksum patched below
        placed.foreach { case (_, body, o) =>
          if (o >= off && o < off + sz) { db.position((o - off).toInt); db.put(body) }
        }
        val bytes = db.array()
        val sum = lookup3(bytes) // with checksum field zeroed
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        bb.position(4 + 1 + 8 + offsetSize); bb.putInt(sum)
        val stored = if (heapFilter) deflate(bytes, 6) else bytes
        emit(addr, stored)
        off -> (addr, stored.length.toLong)
      }.toMap
      // root: the single direct block, or a (possibly nested)
      // indirect-block tree over the used blocks. Filtered heaps widen
      // every DIRECT-row entry to (addr, storedSize, mask).
      val (rootAddr, currRows) =
        if (fitsOneBlock) (addrByOff(0L)._1, 0)
        else {
          val lastRootRow = usedBlocks.map(_._3).max
          val nRootRows = lastRootRow + 1
          def anyUsed(off: Long, sz: Long): Boolean =
            usedBlocks.exists(b => b._1 >= off && b._1 < off + sz)
          def emitIndirect(nrows: Int, heapOff0: Long): Long = {
            val directEntrySize = if (heapFilter) 8 + 8 + 4 else 8
            val size = 4 + 1 + 8 + offsetSize + (0 until nrows).map { r =>
              (if (r < maxDirectRows) directEntrySize else 8) * tableWidth
            }.sum + 4
            val b = buf(size)
            b.putInt(leMagic("FHIB")); b.put(0.toByte)
            b.putLong(fheapAddr)
            b.putInt(heapOff0.toInt)
            var off = heapOff0
            for (row <- 0 until nrows; _ <- 0 until tableWidth) {
              val sz = rowSize(row)
              if (row < maxDirectRows) {
                val (child, stored) = addrByOff.getOrElse(off, (UNDEF, 0L))
                b.putLong(child)
                if (heapFilter) { b.putLong(stored); b.putInt(0) }
              } else {
                b.putLong(
                  if (anyUsed(off, sz)) emitIndirect(row - logW, off) else UNDEF)
              }
              off += sz
            }
            b.putInt(lookup3(java.util.Arrays.copyOfRange(b.array(), 0, size - 4)))
            val addr = alloc(size)
            emit(addr, b.array()); addr
          }
          (emitIndirect(nRootRows, 0L), nRootRows)
        }
      val heapSpace =
        if (fitsOneBlock) singleBlockSize
        else usedBlocks.map(b => b._1 + b._2).max
      val endOff = placed.lastOption.map(p => p._3 + p._2.length).getOrElse(0L)
      // huge objects: link-message bytes alloc'd OUTSIDE the heap's
      // linear space (deflated individually when the heap is
      // filtered — huge objects go through the pipeline one by one,
      // never as part of a direct block). 1-based huge IDs.
      // Allocation stays at the uncompressed size + headroom so the
      // two-phase planner is stable (bodies embed addresses, so the
      // deflated size can shift a few bytes between runs).
      val hugePlaced = hugeBodies.zipWithIndex.map { case ((n, body), i) =>
        val stored = if (heapFilter) deflate(body, 6) else body
        val a = alloc(if (heapFilter) body.length + 64 else body.length)
        emit(a, stored)
        (n, body, a, stored.length.toLong, i + 1L)
      }
      // indirect huge objects: a (single-leaf) huge-object v2 B-tree —
      // type 7 records (addr, storedLen, id) unfiltered, type 8
      // (addr, storedLen, mask, memSize, id) filtered
      val hugeBtAddr =
        if (!hugeIndirect || hugePlaced.isEmpty) UNDEF
        else {
          val btType = if (heapFilter) 8 else 7
          val recSize = if (heapFilter) 36 else 24
          val leafSize = 6 + hugePlaced.size * recSize + 4
          val leafAddr = alloc(leafSize)
          val lf = buf(leafSize)
          lf.putInt(leMagic("BTLF")); lf.put(0.toByte); lf.put(btType.toByte)
          hugePlaced.foreach { case (_, body, a, stored, id) =>
            lf.putLong(a); lf.putLong(stored)
            if (heapFilter) { lf.putInt(0); lf.putLong(body.length.toLong) }
            lf.putLong(id)
          }
          lf.putInt(lookup3(java.util.Arrays.copyOfRange(lf.array(), 0, leafSize - 4)))
          emit(leafAddr, lf.array())
          val hbtAddr = alloc(38)
          val hbt = buf(38)
          hbt.putInt(leMagic("BTHD")); hbt.put(0.toByte); hbt.put(btType.toByte)
          hbt.putInt(2048)
          hbt.putShort(recSize.toShort)
          hbt.putShort(0) // depth
          hbt.put(100.toByte); hbt.put(40.toByte)
          hbt.putLong(leafAddr)
          hbt.putShort(hugePlaced.size.toShort)
          hbt.putLong(hugePlaced.size.toLong)
          hbt.putInt(lookup3(java.util.Arrays.copyOfRange(hbt.array(), 0, 34)))
          emit(hbtAddr, hbt.array()); hbtAddr
        }
      // fractal heap header (+ filtered-root-size/mask/pipeline tail
      // when the heap is I/O-filtered)
      val pipelineBytes =
        if (heapFilter) filterPipelineV2(Seq((1, Seq(6)))) else Array.empty[Byte]
      val fhSize = if (heapFilter) 142 + 12 + pipelineBytes.length + 4 else 146
      val fh = buf(fhSize)
      fh.putInt(leMagic("FRHP")); fh.put(0.toByte)
      fh.putShort(idLen.toShort)
      fh.putShort(pipelineBytes.length.toShort) // I/O filter info length
      fh.put(0x02.toByte)         // flags: checksum direct blocks
      fh.putInt(maxManagedObj.toInt)
      fh.putLong(if (hugeBtAddr != UNDEF) hugePlaced.size + 1L else 0L) // next huge id
      fh.putLong(hugeBtAddr)      // huge v2 btree
      fh.putLong(heapSpace - endOff) // free space
      fh.putLong(UNDEF)           // free-space manager
      fh.putLong(heapSpace)       // managed space
      fh.putLong(heapSpace)       // allocated managed space
      fh.putLong(endOff)          // direct block iterator offset
      fh.putLong(placed.size.toLong) // managed objects
      fh.putLong(hugePlaced.map(_._2.length.toLong).sum) // huge size
      fh.putLong(hugePlaced.size.toLong)                 // huge count
      fh.putLong(tinyBodies.map(_._2.length.toLong).sum) // tiny size
      fh.putLong(tinyBodies.size.toLong)                 // tiny count
      fh.putShort(tableWidth.toShort)
      fh.putLong(if (fitsOneBlock) singleBlockSize else startSize)
      fh.putLong(maxDirectSize)
      fh.putShort(32)             // max heap size (bits)
      fh.putShort(1)              // starting rows in root indirect
      fh.putLong(rootAddr)
      fh.putShort(currRows.toShort)
      if (heapFilter) {
        fh.putLong(if (fitsOneBlock) addrByOff(0L)._2 else 0L)
        fh.putInt(0)              // root filter mask
        fh.put(pipelineBytes)
      }
      fh.putInt(lookup3(java.util.Arrays.copyOfRange(fh.array(), 0, fhSize - 4)))
      emit(fheapAddr, fh.array())
      // name-index v2 btree: records (lookup3(name), heapId) hash-
      // ascending; depth 0 while one leaf holds them, else depth 1
      // (internal root; child pointers carry 1-byte record counts —
      // encSize(leafMaxNrec) for every node size we write)
      val recSize = 4 + idLen
      val nodeSize = 2048
      val leafMaxNrec = (nodeSize - 10) / recSize
      // buf() zero-fills, so every ID is padded to the heap's idLen
      val managedRecs = placed.map { case (n, body, o) =>
        val id = buf(idLen)
        id.put(0.toByte) // managed, version 0
        id.putInt(o.toInt)
        id.putShort(body.length.toShort)
        (lookup3(n.getBytes("UTF-8")), id.array())
      }
      val tinyRecs = tinyBodies.map { case (n, body) =>
        val id = buf(idLen)
        val lm1 = body.length - 1
        if (idLen <= 18) id.put((0x20 | lm1).toByte)
        else { id.put((0x20 | (lm1 >> 8)).toByte); id.put((lm1 & 0xff).toByte) }
        id.put(body)
        (lookup3(n.getBytes("UTF-8")), id.array())
      }
      val hugeRecs = hugePlaced.map { case (n, body, a, stored, hugeId) =>
        val id = buf(idLen)
        id.put(0x10.toByte) // huge, version 0
        if (hugeIndirect) {
          // huge-object sequence number in min(idLen-1, 8) bytes LE
          var v = hugeId
          for (_ <- 0 until math.min(idLen - 1, 8)) { id.put((v & 0xff).toByte); v >>= 8 }
        } else {
          id.putLong(a)
          id.putLong(stored)
          if (heapFilter) { id.putInt(0); id.putLong(body.length.toLong) }
        }
        (lookup3(n.getBytes("UTF-8")), id.array())
      }
      val records = (managedRecs ++ tinyRecs ++ hugeRecs)
        .sortBy(r => r._1 & 0xffffffffL).toSeq
      def emitLeaf(recs: Seq[(Int, Array[Byte])]): Long = {
        val leafSize = 6 + recs.size * recSize + 4
        val leafAddr = alloc(leafSize)
        val lf = buf(leafSize)
        lf.putInt(leMagic("BTLF")); lf.put(0.toByte); lf.put(5.toByte)
        recs.foreach { case (hash, id) => lf.putInt(hash); lf.put(id) }
        lf.putInt(lookup3(java.util.Arrays.copyOfRange(lf.array(), 0, leafSize - 4)))
        emit(leafAddr, lf.array()); leafAddr
      }
      val (btRoot, btDepth, rootNRec) =
        if (records.size <= leafMaxNrec) (emitLeaf(records), 0, records.size)
        else {
          val fill = (leafMaxNrec * 3) / 4
          val chunks = scala.collection.mutable.ArrayBuffer[Seq[(Int, Array[Byte])]]()
          val seps = scala.collection.mutable.ArrayBuffer[(Int, Array[Byte])]()
          var i = 0
          while (i < records.size) {
            var take = math.min(fill, records.size - i)
            // a separator must leave a non-empty trailing leaf
            if (records.size - i - take == 1) take -= 1
            chunks += records.slice(i, i + take); i += take
            if (i < records.size) { seps += records(i); i += 1 }
          }
          val ptrSize = 8 + 1 // child address + 1-byte record count
          val maxIntRec = (nodeSize - (10 + ptrSize)) / (recSize + ptrSize)
          require(seps.size <= maxIntRec,
            s"group too wide for a depth-1 link index (${records.size} links)")
          val leafAddrs = chunks.map(emitLeaf)
          val size = 6 + seps.size * recSize + chunks.size * ptrSize + 4
          val b = buf(size)
          b.putInt(leMagic("BTIN")); b.put(0.toByte); b.put(5.toByte)
          seps.foreach { case (hash, id) => b.putInt(hash); b.put(id) }
          chunks.indices.foreach { ci =>
            b.putLong(leafAddrs(ci))
            b.put(chunks(ci).size.toByte)
          }
          b.putInt(lookup3(java.util.Arrays.copyOfRange(b.array(), 0, size - 4)))
          val addr = alloc(size)
          emit(addr, b.array())
          (addr, 1, seps.size)
        }
      val btAddr = alloc(38)
      val bt = buf(38)
      bt.putInt(leMagic("BTHD")); bt.put(0.toByte); bt.put(5.toByte)
      bt.putInt(nodeSize)
      bt.putShort(recSize.toShort)
      bt.putShort(btDepth.toShort)
      bt.put(100.toByte); bt.put(40.toByte) // split/merge %
      bt.putLong(btRoot)
      bt.putShort(rootNRec.toShort)
      bt.putLong(records.size.toLong)
      bt.putInt(lookup3(java.util.Arrays.copyOfRange(bt.array(), 0, 34)))
      emit(btAddr, bt.array())
      val msgs = Seq(msgV2(0x0002, linkInfoDense(fheapAddr, btAddr)),
        msgV2(0x000A, groupInfoMsg)) ++
        attrs.map { case (k, v) => msgV2(0x000C, strAttrV3(k, v)) }
      val bytes = ohdrV2(msgs)
      val a = alloc(bytes.length)
      emit(a, bytes); a
    }

    /** Emit a symbol-table group with the given (already-allocated)
      * children; returns OH address. */
    def writeGroup(children: Seq[(String, Long)], attrs: Seq[(String, String)],
                   soft: Seq[(String, String)] = Nil): Long = {
      // hard entries carry Right(ohAddr); old-style SYMBOLIC links are
      // SNOD entries with cache type 2 whose scratch-pad holds the
      // local-heap offset of the target path string
      val sorted: Seq[(String, Either[String, Long])] =
        (children.map { case (n, a) => (n, Right(a): Either[String, Long]) } ++
          soft.map { case (n, t) => (n, Left(t): Either[String, Long]) }).sortBy(_._1)
      require(sorted.size <= 2 * LEAF_K * 2 * INTERNAL_K, "too many group entries")
      // local heap: offset 0 = empty string; names (and soft-link
      // target strings) from offset 8. ONE offset per distinct string
      // — a child name that equals a link target shares its heap
      // region (two maps keyed by string would collide on merge and
      // leave one region unwritten)
      val stringOffsets = scala.collection.mutable.Map[String, Long]()
      var off = 8L
      def heapAlloc(s: String): Long = stringOffsets.getOrElseUpdate(s, {
        val a = off; off = align8(off + s.getBytes("UTF-8").length + 1); a
      })
      sorted.foreach { case (name, e) =>
        heapAlloc(name)
        e.left.foreach(t => heapAlloc(t))
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
      stringOffsets.foreach { case (s, o) =>
        heapData.position(o.toInt)
        heapData.put(s.getBytes("UTF-8")); heapData.put(0.toByte)
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
        grp.zipWithIndex.foreach { case ((name, e), i) =>
          b.position(8 + i * 40)
          e match {
            case Right(ohAddr) =>
              b.putLong(stringOffsets(name)); b.putLong(ohAddr); b.putInt(0)
            case Left(target) =>
              b.putLong(stringOffsets(name)); b.putLong(UNDEF)
              b.putInt(2) // cache type 2: symbolic link
              b.putInt(0) // reserved
              b.putInt(stringOffsets(target).toInt) // scratch: heap offset
          }
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
        bt.putLong(if (i == 0) 0L else stringOffsets(snodGroups(i).head._1))
        bt.putLong(sa)
      }
      if (snodAddrs.nonEmpty) {
        bt.position(24 + snodAddrs.size * 16)
        bt.putLong(stringOffsets(snodGroups.last.last._1)) // final key
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
    // depend on the values — run the whole plan with dataBase=0 first;
    // chunked mode is size-stable too: compressed chunk sizes are
    // computed once and btree sizes depend only on chunk counts)
    def plan(dataBase: Long): (Long, Long) = {
      patches.clear(); cursor = sbSize
      var dataCursor = dataBase
      def group(children: Seq[(String, Long)], attrs: Seq[(String, String)],
                soft: Seq[(String, String)] = Nil,
                ext: Seq[(String, String, String)] = Nil): Long = {
        // external links are a 1.8+ link-message feature — old-style
        // symbol-table groups have no place to put them
        require(ext.isEmpty || latest, "external links need latest=true")
        if (latest) writeGroupLatest(children, attrs, soft, ext)
        else writeGroup(children, attrs, soft)
      }
      def allocData(size: Long): Long = { val a = dataCursor; dataCursor = align8(dataCursor + size); a }

      /** Emit one dataset (header + data bytes), contiguous or
        * chunked+filtered per `chunkCfg`. Returns the OH address. */
      def emitDataset(cacheKey: String, nElems: Long, dtype: Array[Byte], elemSize: Int,
                      bytes: Array[Byte], attrs: Seq[(String, String)]): Long =
        chunkCfg match {
          case None =>
            val a = allocData(bytes.length)
            emit(a, bytes)
            writeDataset(nElems, dtype, a, bytes.length, attrs)
          case Some((ce, lvl, shuf)) =>
            val nominal = ce * elemSize
            val comp = chunkCache.getOrElseUpdate(cacheKey,
              bytes.grouped(nominal).map { ch =>
                val full = if (ch.length == nominal) ch
                  else java.util.Arrays.copyOf(ch, nominal) // edge chunk padded
                deflate(if (shuf) shuffleBytes(full, elemSize) else full, lvl)
              }.toArray)
            val locs = comp.zipWithIndex.map { case (cb, i) =>
              val a = allocData(cb.length); emit(a, cb)
              (a, cb.length, i.toLong * ce)
            }
            val filters = (if (shuf) Seq((2, Seq(elemSize))) else Nil) :+ ((1, Seq(lvl)))
            val hdr = if (latest) {
              val (faAddr, pageBits) = writeFixedArray(locs.toSeq)
              ohdrV2(Seq(
                msgV2(0x0001, dataspace1dV2(nElems)),
                msgV2(0x0003, dtype),
                msgV2(0x000B, filterPipelineV2(filters)),
                msgV2(0x0008, layoutChunkedV4(faAddr, ce.toLong, elemSize, pageBits))) ++
                attrs.map { case (k, v) => msgV2(0x000C, strAttrV3(k, v)) })
            } else {
              val btreeAddr = writeChunkBtree(locs.toSeq, ce)
              objectHeader(Seq(
                msg(0x0001, dataspace1d(nElems)),
                msg(0x0003, dtype),
                msg(0x000B, filterPipeline(filters)),
                msg(0x0008, layoutChunked(btreeAddr, ce, elemSize))) ++
                attrs.map { case (k, v) => msg(0x000C, strAttr(k, v)) })
            }
            val a = alloc(hdr.length)
            emit(a, hdr); a
        }

      /** Variable-length dataset (strings OR numeric sequences):
        * payload bytes go to GLOBAL HEAP collections (GCOL — split
        * every 64 objects to exercise multi-collection reads), the
        * dataset stores 16-byte hvl descriptors. Empty values encode
        * as (0, 0, 0) descriptors with no heap object, matching
        * libhdf5. Contiguous only: the descriptors embed collection
        * addresses, which would poison the chunk-compression cache
        * across the two plan runs. */
      def emitVlenDataset(c: OutCol): Long = {
        require(chunkCfg.isEmpty, "vlen datasets: contiguous only")
        val assigned = new Array[(Long, Int)](c.vlenItems.length)
        c.vlenItems.zipWithIndex.filter(_._1._1.nonEmpty).grouped(64).foreach { g =>
          val bodySize = g.map { case ((ob, _), _) =>
            16 + ((ob.length + 7) / 8) * 8 }.sum
          val collSize = 16L + bodySize + 16 // header + objects + terminator
          val addr = allocData(collSize)
          val cb = buf(collSize.toInt)
          cb.putInt(leMagic("GCOL"))
          cb.put(1.toByte); cb.put(0.toByte); cb.put(0.toByte); cb.put(0.toByte)
          cb.putLong(collSize)
          g.zipWithIndex.foreach { case (((ob, _), oi), i) =>
            cb.putShort((i + 1).toShort) // heap object index, 1-based
            cb.putShort(1.toShort)       // reference count
            cb.putInt(0)
            cb.putLong(ob.length.toLong)
            cb.put(ob)
            cb.position(cb.position() + (8 - ob.length % 8) % 8)
            assigned(oi) = (addr, i + 1)
          }
          cb.putShort(0.toShort); cb.putShort(0.toShort); cb.putInt(0)
          cb.putLong(16L) // free-space terminator: its own header size
          emit(addr, cb.array())
        }
        val descr = buf(c.vlenItems.length * 16)
        c.vlenItems.zipWithIndex.foreach { case ((ob, dLen), oi) =>
          if (ob.isEmpty) { descr.putInt(0); descr.putLong(0L); descr.putInt(0) }
          else {
            val (addr, idx) = assigned(oi)
            descr.putInt(dLen)
            descr.putLong(addr)
            descr.putInt(idx)
          }
        }
        val dAddr = allocData(descr.array().length)
        emit(dAddr, descr.array())
        writeDataset(c.n, c.vlenDt, dAddr, descr.array().length.toLong, Nil)
      }

      /** (n, d) matrix dataset (array-column storage — flat root
        * datasets AND vaex column groups share this). Contiguous, or
        * chunked full-width rows with the gzip+shuffle pipeline. */
      def emitMatrixDataset(c: OutCol): Long = {
        val (baseDt, bs) = c.kind.substring(4) match {
          case "i8" => (dtFixed(8), 8); case "i4" => (dtFixed(4), 4)
          case "f8" => (dtFloat(8), 8); case "f4" => (dtFloat(4), 4)
          case k => throw new IllegalArgumentException(s"matrix base $k")
        }
        val d = c.recSize
        chunkCfg match {
          case None =>
            val a = allocData(c.data.length)
            emit(a, c.data)
            writeDataset(c.n, baseDt, a, c.data.length.toLong, Nil,
              dims2 = d.toLong)
          case Some((ceRows, lvl, shuf)) =>
            // chunked (rows, d) — h5py's compression='gzip' shape;
            // full-width chunks keyed by (rowStart, 0, 0)
            require(!latest, "chunked matrices: v0-superblock layout only")
            val nominal = ceRows * d * bs
            val comp = chunkCache.getOrElseUpdate(s"${c.name}/m",
              c.data.grouped(nominal).map { ch =>
                val full = if (ch.length == nominal) ch
                  else java.util.Arrays.copyOf(ch, nominal)
                deflate(if (shuf) shuffleBytes(full, bs) else full, lvl)
              }.toArray)
            val locs = comp.zipWithIndex.map { case (cb, i) =>
              val a = allocData(cb.length); emit(a, cb)
              (a, cb.length, i.toLong * ceRows)
            }
            val btreeAddr = writeChunkBtree(locs.toSeq, ceRows, keyDims = 3)
            val filters = (if (shuf) Seq((2, Seq(bs))) else Nil) :+ ((1, Seq(lvl)))
            val hdr = objectHeader(Seq(
              msg(0x0001, dataspace2d(c.n, d)),
              msg(0x0003, baseDt),
              msg(0x000B, filterPipeline(filters)),
              msg(0x0008, layoutChunked2d(btreeAddr, ceRows, d, bs))))
            val a = alloc(hdr.length)
            emit(a, hdr)
            a
        }
      }

      if (flat) {
        // generic h5py shape: datasets directly under the root group
        val dsets = cols.map { c =>
          if (c.vlenItems != null) (c.name, emitVlenDataset(c))
          else if (c.kind.startsWith("mat_")) (c.name, emitMatrixDataset(c))
          else if (c.dtMsg != null) // compound: records already packed
            (c.name, emitDataset(s"${c.name}/d", c.n, c.dtMsg, c.recSize, c.data, Nil))
          else {
            val (dt, es) = c.kind match {
              case "b1" => (dtEnumBool, 1)
              case "i1" => (dtFixed(1), 1); case "i2" => (dtFixed(2), 2)
              case "i4" => (dtFixed(4), 4); case "i8" => (dtFixed(8), 8)
              case "f4" => (dtFloat(4), 4); case "f8" => (dtFloat(8), 8)
              case "fstr" =>
                val w = (c.data.length / math.max(c.n, 1L)).toInt
                (dtString(w), w)
              case k => throw new IllegalArgumentException(s"flat layout: unsupported kind $k")
            }
            (c.name, emitDataset(s"${c.name}/d", c.n, dt, es, c.data, Nil))
          }
        }
        val rootAddr = group(dsets, Nil, softLinks, externalLinks)
        (rootAddr, dataCursor)
      } else {
      val colGroups = cols.map { c =>
        val members = scala.collection.mutable.ArrayBuffer[(String, Long)]()
        c.kind match {
          case "str" =>
            members += (("data", emitDataset(s"${c.name}/d", c.data.length, dtFixed(1), 1,
              c.data, Seq("dtype" -> "str"))))
            members += (("indices", emitDataset(s"${c.name}/i", c.n + 1, dtFixed(8), 8,
              c.indices, Nil)))
          case k if k.startsWith("mat_") => // array column: (n, d) matrix
            members += (("data", emitMatrixDataset(c)))
          case k =>
            val (dt, es) = k match {
              case "b1" => (dtEnumBool, 1)
              case "i1" => (dtFixed(1), 1); case "i2" => (dtFixed(2), 2)
              case "i4" => (dtFixed(4), 4); case "i8" => (dtFixed(8), 8)
              case "f4" => (dtFloat(4), 4); case "f8" => (dtFloat(8), 8)
            }
            members += (("data", emitDataset(s"${c.name}/d", c.n, dt, es, c.data, Nil)))
        }
        if (c.bitmap.nonEmpty)
          members += (("null_bitmap", emitDataset(s"${c.name}/b", c.bitmap.length,
            dtFixed(1), 1, c.bitmap, Nil)))
        (c.name, group(members.toSeq, Nil))
      }
      val columnsAddr = group(colGroups,
        Seq("column_order" -> cols.map(_.name).mkString(",")))
      val tableAddr = group(Seq(("columns", columnsAddr)), Nil)
      val rootAddr = group(Seq(("table", tableAddr)), Nil, softLinks, externalLinks)
      (rootAddr, dataCursor)
      }
    }
    val (_, _) = plan(0L)
    val metaEnd = cursor
    val dataBase = align8(metaEnd)
    val (rootAddr, eof) = plan(dataBase)
    require(cursor == metaEnd, "writer layout instability")

    // ---- emit ----
    val sb = if (latest) {
        // superblock v3 (48 bytes incl. lookup3 checksum)
        val b = buf(48)
        b.put(Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').map(_.toByte))
        b.put(3.toByte)       // version
        b.put(8.toByte); b.put(8.toByte) // offset/length sizes
        b.put(0.toByte)       // file consistency flags
        b.putLong(0L)         // base address
        b.putLong(UNDEF)      // superblock extension
        b.putLong(eof)        // end of file
        b.putLong(rootAddr)   // root group object header
        b.putInt(lookup3(java.util.Arrays.copyOfRange(b.array(), 0, 44)))
        b
      } else {
        // superblock v0
        val b = buf(96)
        b.put(Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').map(_.toByte))
        b.put(0.toByte); b.put(0.toByte); b.put(0.toByte); b.put(0.toByte)
        b.put(0.toByte); b.put(8.toByte); b.put(8.toByte); b.put(0.toByte)
        b.putShort(LEAF_K.toShort); b.putShort(INTERNAL_K.toShort)
        b.putInt(0)
        b.putLong(0L)        // base address
        b.putLong(UNDEF)     // free-space info
        b.putLong(eof)       // end of file
        b.putLong(UNDEF)     // driver info
        b.putLong(0L)        // root STE: link name offset
        b.putLong(rootAddr)  // root STE: object header address
        b.putInt(0); b.putInt(0) // cache type + reserved (scratch zeros follow)
        b
      }
    // Data bytes ride the same patch list as metadata (emitDataset
    // emits both) and the two-phase planner allocates every region
    // exactly once, so the patches are DISJOINT — sorted by address
    // they stream SEQUENTIALLY (zero-filled gaps from align8 padding)
    // through FileSystem.create: no random-access writes, so the
    // writer targets hdfs:/s3a: as readily as local disk.
    val out = FsIO.create(path)
    try {
      out.write(sb.array())
      var at: Long = sb.array().length.toLong
      def zeroFill(upTo: Long): Unit = {
        var gap = upTo - at
        if (gap > 0) {
          val z = new Array[Byte](math.min(gap, 1L << 16).toInt)
          while (gap > 0) {
            val w = math.min(gap, z.length.toLong).toInt
            out.write(z, 0, w); gap -= w
          }
          at = upTo
        }
      }
      patches.sortInPlaceBy(_._1)
      patches.foreach { case (addr, bytes) =>
        require(addr >= at,
          s"writer emitted overlapping patches (addr=$addr cursor=$at)")
        zeroFill(addr)
        out.write(bytes); at += bytes.length
      }
      require(at <= eof, s"writer patch past eof ($at > $eof)")
      zeroFill(eof)
    } finally out.close()
  }
}
