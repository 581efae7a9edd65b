package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WebDataset source/sink — the multimodal training-data convention
  * (github.com/webdataset/webdataset): samples live in plain POSIX
  * tar archives, one member per modality, grouped by basename:
  *
  *   000123.jpg   000123.txt   000123.json   000124.jpg ...
  *
  * A sample is the set of consecutive members sharing a key (the name
  * up to the FIRST dot — so `x.seg.png` has key `x` and extension
  * `seg.png`, the WebDataset rule). Rows come back as
  * `(key string, files map<string, binary>)` — modality decoding
  * stays the caller's choice (compose with the JPEG/PNG/WAV codecs).
  *
  * Scale design — a TWO-PHASE distributed read: (1) one INDEX task
  * per shard file sequentially walks the headers only (one 512-byte
  * positioned read per member, payloads skipped — WebDataset ships
  * many ~1 GB shard files, so the file set is the index-parallelism
  * unit; a sequential walk, unlike a mid-file resync scan, can never
  * mis-claim tar-shaped bytes inside a member payload such as a
  * nested tar); (2) the tiny sample index is repartitioned so PAYLOAD
  * reads spread member-level across the cluster — payload bytes move
  * exactly once via positioned reads, never through a shuffle.
  * Sharded writes emit one `.tar` per partition (the WebDataset
  * convention of many shard files); samples never straddle files.
  *
  * The tar dialect written is plain ustar (POSIX.1-1988 magic
  * "ustar\0" + "00", mtime 0 for determinism); the reader accepts
  * ustar and GNU ("ustar  ") headers and skips non-file members. Only
  * names <= 100 bytes are written (WebDataset keys are short ids);
  * PAX/GNU long-name extensions are rejected loudly on write and
  * their extension members skipped on read.
  */
object WebDataset {

  private val Block = 512
  private val MaxMember = 1L << 31 // guard: one member < 2 GiB

  // ------------------------------------------------------------ header

  /** Parse a (possibly) ustar header block. Returns (name, size,
    * typeflag) when the checksum and magic validate. POSIX ustar
    * headers (magic "ustar\0", version "00") may split a long path as
    * prefix(155 at offset 345) + "/" + name — both halves belong to
    * the member name (and hence the sample KEY); ignoring the prefix
    * would silently collide samples from different directories. GNU
    * headers (magic "ustar ") reuse those bytes for atime/ctime, so
    * the prefix is only read under the POSIX magic. */
  private[graft] def parseHeader(b: Array[Byte], off: Int): Option[(String, Long, Byte)] = {
    if (off + Block > b.length) return None
    // magic at offset 257: "ustar\0" (POSIX) or "ustar " (GNU)
    if (!(b(off + 257) == 'u' && b(off + 258) == 's' && b(off + 259) == 't' &&
        b(off + 260) == 'a' && b(off + 261) == 'r')) return None
    // checksum: octal at [148,156), computed with that field as spaces
    var sum = 0L
    var i = 0
    while (i < Block) {
      sum += (if (i >= 148 && i < 156) ' '.toInt else b(off + i) & 0xff)
      i += 1
    }
    val stored = octal(b, off + 148, 8).getOrElse(return None)
    if (stored != sum) return None
    val size = octal(b, off + 124, 12).getOrElse(return None)
    if (size < 0 || size >= MaxMember) return None
    def field(at: Int, max: Int): String = {
      var end = off + at
      while (end < off + at + max && b(end) != 0) end += 1
      new String(b, off + at, end - (off + at), StandardCharsets.UTF_8)
    }
    val name0 = field(0, 100)
    val posix = b(off + 262) == 0 && b(off + 263) == '0' && b(off + 264) == '0'
    val prefix = if (posix) field(345, 155) else ""
    val name = if (prefix.nonEmpty) s"$prefix/$name0" else name0
    Some((name, size, b(off + 156)))
  }

  /** Leading-space/NUL tolerant octal field parse. */
  private def octal(b: Array[Byte], off: Int, len: Int): Option[Long] = {
    var v = 0L
    var seen = false
    var i = off
    while (i < off + len) {
      val c = b(i) & 0xff
      if (c >= '0' && c <= '7') { v = v * 8 + (c - '0'); seen = true }
      else if (c == 0 || c == ' ') { if (seen) return Some(v) }
      else return None
      i += 1
    }
    if (seen) Some(v) else None
  }

  private def putOctal(b: Array[Byte], off: Int, len: Int, v: Long): Unit = {
    val s = java.lang.Long.toOctalString(v)
    require(s.length <= len - 1, s"tar field overflow: $v")
    val padded = ("0" * (len - 1 - s.length)) + s
    var i = 0
    while (i < len - 1) { b(off + i) = padded.charAt(i).toByte; i += 1 }
    b(off + len - 1) = 0
  }

  private[graft] def headerFor(name: String, size: Long): Array[Byte] = {
    val nameB = name.getBytes(StandardCharsets.UTF_8)
    require(nameB.length <= 100,
      s"webdataset export: member name longer than 100 bytes: $name " +
        "(long-name tar extensions are deliberately not written)")
    require(!name.isEmpty, "webdataset export: empty member name")
    val h = new Array[Byte](Block)
    System.arraycopy(nameB, 0, h, 0, nameB.length)
    putOctal(h, 100, 8, 420) // mode 0644
    putOctal(h, 108, 8, 0) // uid
    putOctal(h, 116, 8, 0) // gid
    putOctal(h, 124, 12, size)
    putOctal(h, 136, 12, 0) // mtime 0: byte-deterministic archives
    h(156) = '0' // regular file
    h(257) = 'u'; h(258) = 's'; h(259) = 't'; h(260) = 'a'; h(261) = 'r'; h(262) = 0
    h(263) = '0'; h(264) = '0'
    // checksum over the header with the field as spaces
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    h.foreach(c => sum += (c & 0xff))
    val cs = java.lang.Long.toOctalString(sum)
    val padded = ("0" * (6 - cs.length)) + cs
    (0 until 6).foreach(i => h(148 + i) = padded.charAt(i).toByte)
    h(154) = 0; h(155) = ' '
    h
  }

  /** WebDataset key rule: basename up to the FIRST dot; the rest is
    * the extension (so `x.seg.png` -> ("x", "seg.png")). Directory
    * prefixes belong to the key. */
  private[graft] def splitKey(name: String): (String, String) = {
    val slash = name.lastIndexOf('/')
    val dot = name.indexOf('.', slash + 1)
    if (dot < 0) (name, "") else (name.substring(0, dot), name.substring(dot + 1))
  }

  // ------------------------------------------------------------- write

  private def writeMembers(out: java.io.OutputStream,
                           it: Iterator[Row]): Unit = {
    try {
      val pad = new Array[Byte](Block)
      while (it.hasNext) {
        val row = it.next()
        val key = row.getString(0)
        require(key != null && key.nonEmpty, "webdataset export: null/empty key")
        val files = row.getMap[String, Array[Byte]](1)
        require(files != null, s"webdataset export: null files map for key $key")
        // deterministic member order within a sample
        files.toSeq.sortBy(_._1).foreach { case (ext, bytes) =>
          require(ext != null && ext.nonEmpty && bytes != null,
            s"webdataset export: null/empty extension or bytes for key $key")
          out.write(headerFor(s"$key.$ext", bytes.length.toLong))
          out.write(bytes)
          val rem = bytes.length % Block
          if (rem != 0) out.write(pad, 0, Block - rem)
        }
      }
      out.write(pad); out.write(pad) // end-of-archive: two zero blocks
    } finally out.close()
  }

  /** Single-file export, driver-streamed. Expects exactly the read
    * shape: (key string, files map<string, binary>). */
  def toWebDataset(df: DataFrame, path: String): Unit = {
    requireShape(df)
    import scala.jdk.CollectionConverters._
    writeMembers(FsIO.create(path), df.toLocalIterator().asScala)
  }

  /** Sharded export: one tar per partition (the WebDataset shard-file
    * convention; samples never straddle shards). Returns shard count. */
  def toWebDatasetSharded(df: DataFrame, dir: String): Int = {
    requireShape(df)
    FsIO.mkdirs(dir)
    FsIO.deleteShards(dir, ".tar")
    val written = df.rdd.mapPartitionsWithIndex { (pi, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        writeMembers(FsIO.create(f"$dir/part-$pi%05d.tar"), it)
        Iterator.single(1)
      }
    }.count()
    written.toInt
  }

  private def requireShape(df: DataFrame): Unit = {
    val ok = df.schema.fields.map(f => (f.name, f.dataType)).toSeq match {
      case Seq(("key", StringType), ("files", MapType(StringType, BinaryType, _))) => true
      case _ => false
    }
    require(ok, "webdataset export: frame must be " +
      s"(key string, files map<string, binary>), got ${df.schema.catalogString}")
  }

  // -------------------------------------------------------------- read

  private val schema = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("files", MapType(StringType, BinaryType,
      valueContainsNull = false), nullable = false)))

  /** One indexed sample: members as (ext, dataOffset, size). Metadata
    * only — ~100 bytes regardless of payload size. */
  private final case class SampleIdx(path: String, key: String,
                                     members: Seq[(String, Long, Long)])

  /** Sequentially walk ONE tar's headers (one 512-byte positioned
    * read per member — payloads are skipped, so indexing a shard
    * costs ~#members preads, not its byte size). The sequential walk
    * is the format's ground truth: unlike a mid-file resync scan it
    * can never mis-claim tar-shaped bytes INSIDE a member payload
    * (e.g. a nested tar) as top-level members. Members of one sample
    * are consecutive (the WebDataset contract); a key reappearing
    * non-adjacently starts a NEW sample row. */
  private def walkFile(path: String): Iterator[SampleIdx] = {
    val in = new FsIO.In(path)
    try {
      val len = in.length
      val b = new Array[Byte](Block)
      var pos = 0L
      var zeros = 0
      val samples = scala.collection.mutable.ArrayBuffer[SampleIdx]()
      var curKey: String = null
      var cur = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
      def flush(): Unit = if (curKey != null) {
        samples += SampleIdx(path, curKey, cur.toSeq)
        curKey = null; cur = scala.collection.mutable.ArrayBuffer()
      }
      while (pos + Block <= len && zeros < 2) {
        in.seek(pos); in.readFully(b)
        if (b.forall(_ == 0)) { zeros += 1; pos += Block }
        else {
          zeros = 0
          val (name, size, tf) = parseHeader(b, 0).getOrElse(
            throw new IllegalArgumentException(
              s"$path: invalid tar header at offset $pos (corrupt archive)"))
          val dataOff = pos + Block
          pos = dataOff + ((size + Block - 1) / Block) * Block
          if (tf == '0' || tf == 0) {
            val (key, ext) = splitKey(name)
            if (ext.nonEmpty) {
              if (key != curKey) { flush(); curKey = key }
              require(!cur.exists(_._1 == ext),
                s"$path: duplicate member $key.$ext in one sample")
              cur += ((ext, dataOff, size))
            }
          } else if (tf == 'L' || tf == 'K') {
            // GNU long-name extension: the NEXT member's header name
            // is truncated — skipping would silently mis-key it
            throw new IllegalArgumentException(
              s"$path: GNU long-name member at offset ${dataOff - Block} — " +
                "names over 100 bytes are unsupported (re-key the dataset)")
          } else if (tf == 'x' || tf == 'g') {
            // PAX attribute block: harmless (mtime/atime records)
            // UNLESS it overrides the next member's path. A block too
            // large to inspect is REJECTED, not skipped — skipping an
            // uninspected override is exactly the silent mis-keying
            // this branch exists to prevent.
            require(size <= (1L << 20),
              s"$path: uninspectable ${size}-byte PAX block at offset " +
                s"${dataOff - Block} (cannot rule out a path override)")
            val pax = new Array[Byte](size.toInt)
            in.seek(dataOff); in.readFully(pax)
            val s = new String(pax, StandardCharsets.UTF_8)
            require(!s.contains(" path="),
              s"$path: PAX path override at offset ${dataOff - Block} — " +
                "names over 100 bytes are unsupported (re-key the dataset)")
          }
          // other non-file members (dirs, links): the walk advances
          // past their payloads correctly and ignores them
        }
      }
      flush()
      samples.iterator
    } finally in.close()
  }

  /** Read one tar or a glob of tars as `(key, files)` samples.
    * Two-phase distributed read: (1) one INDEX task per file walks
    * headers only (WebDataset ships many ~1 GB shard files — the file
    * set is the index-parallelism unit); (2) the tiny sample index is
    * repartitioned so PAYLOAD reads spread across the cluster
    * member-level, each task issuing positioned reads into its own
    * handle — payload bytes move exactly once, never through a
    * shuffle. */
  def fromWebDataset(spark: SparkSession, pathOrGlob: String,
                     numPartitions: Int = 0): DataFrame = {
    val files: Seq[String] =
      if (pathOrGlob.exists("*?[".contains(_))) {
        val fs = FsIO.glob(pathOrGlob)
        require(fs.nonEmpty, s"webdataset: glob matched no files: $pathOrGlob")
        fs
      } else Seq(pathOrGlob)
    val width =
      if (numPartitions > 0) numPartitions
      else math.max(files.size, spark.sparkContext.defaultParallelism)
    val idx = spark.sparkContext.parallelize(files, files.size)
      .flatMap(f => walkFile(f))
    val rows = idx.repartition(width).mapPartitions { it =>
      val handles = scala.collection.mutable.Map[String, FsIO.In]()
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit](_ =>
        handles.values.foreach(h => try h.close() catch { case _: Throwable => () }))
      it.map { s =>
        val in = handles.getOrElseUpdate(s.path, new FsIO.In(s.path))
        val m = scala.collection.mutable.LinkedHashMap[String, Array[Byte]]()
        s.members.sortBy(_._1).foreach { case (ext, off, size) =>
          val data = new Array[Byte](size.toInt)
          in.seek(off); in.readFully(data)
          m(ext) = data
        }
        Row(s.key, m.toMap)
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
