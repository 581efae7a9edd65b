package graft.sources

import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** WARC (Web ARChive, ISO 28500) file source/sink — the crawl-corpus
  * ingest front end (reference: n/a — vaex has no crawl ingest; the
  * record semantics mirror the oracle-gated `q_warc_parse` lane:
  * version line, CRLF header block, payload sliced by the DECLARED
  * Content-Length, CRLF-CRLF trailer validated at that exact offset).
  * House interchange pattern throughout: Hadoop-FS I/O ([[FsIO]]), a
  * driver-streamed single-file writer, a distributed per-partition
  * sharded writer, and genuinely DISTRIBUTED split reads of both
  * physical forms:
  *
  *  - `.warc` (plain): a split [start, end) scans forward for the
  *    first byte offset that parses as a COMPLETE valid record
  *    (version line + headers + declared-length payload + trailer)
  *    preceded by the previous record's CRLF-CRLF trailer, then
  *    additionally requires the record to CHAIN (its end is EOF or
  *    another record start) — a payload that embeds WARC-looking
  *    bytes fails the chain check in practice, though uncompressed
  *    WARC is inherently ambiguous under adversarial payloads; the
  *    gzip form below is the production recommendation.
  *  - `.warc.gz` (per-RECORD gzip members — the Common Crawl
  *    convention, and exactly the split-friendly contract of the Avro
  *    sync-block reader [[Avro]]): a split scans for the gzip magic,
  *    validates by inflating the candidate member (CRC32 + ISIZE
  *    checked) and requiring the plaintext to start with `WARC/` —
  *    a false positive must forge all three at once.
  *
  * Every task reads only records whose START offset lies in its
  * span (records may extend past `end` — the next task skips them),
  * so the union over splits is exactly-once at any file size.
  *
  * Decode-allocation caps ([[Avro]]/[[ArrowIpc]] analog): header
  * blocks over 1 MiB, more than 256 headers, payloads or inflated
  * members over 256 MiB fail fast — a corrupt declared length must
  * surface as a clear error, not a multi-GB allocation.
  */
object Warc {

  private val MaxHeaderBytes = 1 << 20
  private val MaxHeaders = 256
  private[graft] val MaxPayloadBytes: Long = 256L << 20

  // compiled once — parsePlainAt runs per record and per resync
  // candidate; a fresh Pattern.compile there would be millions of
  // redundant compiles on a multi-GB crawl file. `(?m)^` anchors at
  // line start (lines are CRLF-separated; \n-relative ^ is correct)
  private val ContentLengthLine = "(?im)^content-length:".r

  val schema: StructType = StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("warc_type", StringType),
    StructField("record_id", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType, nullable = false),
    StructField("headers", MapType(StringType, StringType), nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  // ---------------------------------------------------------- parsing

  /** One parsed record + the byte length it occupied in its container
    * (plaintext length; the gzip reader tracks member length itself). */
  private[graft] final case class Rec(
      warcType: String, recordId: String, targetUri: String,
      warcDate: String, contentType: String,
      headers: Map[String, String], payload: Array[Byte], byteLen: Long)

  /** Parse ONE record from `bytes` at `off`; None if anything about
    * the structure is wrong (bad version line, unterminated headers,
    * missing/invalid Content-Length, payload running past the buffer,
    * missing CRLF-CRLF trailer) — the validation the split scanner
    * relies on to reject false record-start candidates. */
  private[graft] def parseRecord(bytes: Array[Byte], off: Int): Option[Rec] = {
    val n = bytes.length
    // version line: WARC/<digit>.<digits>CRLF
    if (off + 10 > n) return None
    if (!(bytes(off) == 'W' && bytes(off + 1) == 'A' && bytes(off + 2) == 'R' &&
        bytes(off + 3) == 'C' && bytes(off + 4) == '/')) return None
    var p = off + 5
    val verStart = p
    while (p < n && bytes(p) != '\r') {
      val c = bytes(p)
      if (!((c >= '0' && c <= '9') || c == '.')) return None
      p += 1
      if (p - verStart > 8) return None
    }
    if (p - verStart < 3 || p + 1 >= n || bytes(p + 1) != '\n') return None
    p += 2
    // header lines until the empty line
    val headers = ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done) {
      if (p - off > MaxHeaderBytes || headers.length > MaxHeaders) return None
      if (p + 1 < n && bytes(p) == '\r' && bytes(p + 1) == '\n') {
        p += 2; done = true
      } else {
        val lineStart = p
        while (p < n && bytes(p) != '\r') p += 1
        if (p + 1 >= n || bytes(p + 1) != '\n') return None
        val line = new String(bytes, lineStart, p - lineStart,
          java.nio.charset.StandardCharsets.UTF_8)
        val ci = line.indexOf(':')
        if (ci <= 0) return None
        headers += line.substring(0, ci).trim -> line.substring(ci + 1).trim
        p += 2
      }
    }
    val hmap = headers.toMap
    val clStr = headers.collectFirst {
      case (k, v) if k.equalsIgnoreCase("Content-Length") => v
    }.getOrElse(return None)
    val cl = try clStr.toLong catch { case _: NumberFormatException => return None }
    if (cl < 0 || cl > MaxPayloadBytes) return None
    // payload sliced by the DECLARED length (it may itself contain
    // CRLF-CRLF — the q_warc_parse lesson), trailer validated at the
    // exact declared offset
    if (p + cl + 4 > n) return None
    val payload = java.util.Arrays.copyOfRange(bytes, p, p + cl.toInt)
    val t = p + cl.toInt
    if (!(bytes(t) == '\r' && bytes(t + 1) == '\n' &&
        bytes(t + 2) == '\r' && bytes(t + 3) == '\n')) return None
    def h(name: String): String = headers.collectFirst {
      case (k, v) if k.equalsIgnoreCase(name) => v
    }.orNull
    Some(Rec(h("WARC-Type"), h("WARC-Record-ID"), h("WARC-Target-URI"),
      h("WARC-Date"), h("Content-Type"), hmap, payload,
      (t + 4 - off).toLong))
  }

  private def toRow(offset: Long, r: Rec): Row = Row(
    offset, r.warcType, r.recordId, r.targetUri, r.warcDate, r.contentType,
    r.payload.length.toLong, r.headers, r.payload)

  // ------------------------------------------------------------ write

  /** Serialize one record. `extraHeaders` ride after the standard
    * ones; Content-Length is always computed from the payload. */
  private[graft] def recordBytes(warcType: String, recordId: String,
      targetUri: String, warcDate: String, contentType: String,
      payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(warcType).append("\r\n")
    sb.append("WARC-Record-ID: ").append(recordId).append("\r\n")
    sb.append("WARC-Date: ").append(warcDate).append("\r\n")
    if (targetUri != null)
      sb.append("WARC-Target-URI: ").append(targetUri).append("\r\n")
    if (contentType != null)
      sb.append("Content-Type: ").append(contentType).append("\r\n")
    sb.append("Content-Length: ").append(payload.length).append("\r\n\r\n")
    val head = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Byte](head.length + payload.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(payload, 0, out, head.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** One gzip MEMBER per record (the Common Crawl convention — what
    * makes `.warc.gz` splittable). Hand-rolled header/trailer framing
    * because GZIPOutputStream closes the underlying stream and cannot
    * emit several members onto one sink cleanly. */
  private def gzipMember(plain: Array[Byte]): Array[Byte] = {
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    deflater.setInput(plain)
    deflater.finish()
    val buf = new Array[Byte](math.max(64, plain.length / 2))
    val body = new java.io.ByteArrayOutputStream(plain.length / 2 + 64)
    while (!deflater.finished()) {
      val k = deflater.deflate(buf)
      body.write(buf, 0, k)
    }
    deflater.end()
    val crc = new CRC32
    crc.update(plain)
    val out = new java.io.ByteArrayOutputStream(body.size() + 18)
    // header: magic, CM=deflate, no flags, mtime 0, XFL 0, OS unknown
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0xff.toByte))
    body.writeTo(out)
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    le32(crc.getValue)
    le32(plain.length.toLong)
    out.toByteArray
  }

  /** Expected columns: warc_type, record_id, payload (binary or
    * string), optionally target_uri / content_type / warc_date
    * (absent or null → header omitted; warc_date defaults to a fixed
    * epoch stamp so output is deterministic). */
  private def rowWriter(schema: StructType): Row => Array[Byte] = {
    def idx(c: String): Int = schema.fieldNames.indexOf(c)
    val iType = idx("warc_type"); val iId = idx("record_id")
    val iPay = idx("payload"); val iUri = idx("target_uri")
    val iCt = idx("content_type"); val iDate = idx("warc_date")
    require(iType >= 0 && iId >= 0 && iPay >= 0,
      s"warc export: need warc_type, record_id, payload columns; got ${schema.fieldNames.mkString(", ")}")
    val payloadIsString = schema(iPay).dataType == StringType
    row => {
      val payload =
        if (payloadIsString) row.getString(iPay)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        else row.getAs[Array[Byte]](iPay)
      val date = if (iDate >= 0 && !row.isNullAt(iDate)) row.getString(iDate)
        else "2026-01-01T00:00:00Z"
      recordBytes(row.getString(iType), row.getString(iId),
        if (iUri >= 0 && !row.isNullAt(iUri)) row.getString(iUri) else null,
        date,
        if (iCt >= 0 && !row.isNullAt(iCt)) row.getString(iCt) else null,
        payload)
    }
  }

  private def writeRows(it: Iterator[Row], write: Row => Array[Byte],
      out: java.io.OutputStream, gzip: Boolean): Long = {
    var n = 0L
    try {
      while (it.hasNext) {
        val plain = write(it.next())
        out.write(if (gzip) gzipMember(plain) else plain)
        n += 1
      }
    } finally out.close()
    n
  }

  /** Single-FILE WARC export, driver-streamed. `gzip` selects the
    * per-record-member compressed form (recommended — splittable AND
    * unambiguous). */
  def toWarc(df: DataFrame, path: String, gzip: Boolean): Unit = {
    import scala.jdk.CollectionConverters._
    val w = rowWriter(df.schema)
    writeRows(df.toLocalIterator().asScala, w, FsIO.create(path), gzip)
  }

  /** DISTRIBUTED WARC export: every partition streams its own
    * `part-NNNNN.warc[.gz]` from its executor (the Avro/Arrow/HDF5
    * sharding contract). Returns the shard count. */
  def toWarcSharded(df: DataFrame, dir: String, gzip: Boolean): Int = {
    val schema = df.schema
    val suffix = if (gzip) ".warc.gz" else ".warc"
    FsIO.mkdirs(dir)
    FsIO.deleteShards(dir, suffix)
    val g = gzip
    val written = df.rdd.mapPartitionsWithIndex { (pi, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val w = rowWriter(schema)
        writeRows(it, w, FsIO.create(f"$dir/part-$pi%05d$suffix"), g)
        Iterator.single(1)
      }
    }.count()
    written.toInt
  }

  // ------------------------------------------------------------- read

  /** Chunked forward reader over positioned FsIO reads — the scan
    * primitives the split readers share. */
  private final class Scanner(in: FsIO.In) {
    private val ChunkSize = 1 << 16
    private var bufStart = 0L
    private var buf = new Array[Byte](0)

    private def ensure(pos: Long, len: Int): Boolean = {
      if (pos + len > in.length) return false
      if (pos >= bufStart && pos + len <= bufStart + buf.length) return true
      val want = math.max(len, math.min(ChunkSize.toLong, in.length - pos).toInt)
      val b = new Array[Byte](want)
      in.seek(pos); in.readFully(b)
      bufStart = pos; buf = b
      true
    }
    def byteAt(pos: Long): Int = {
      if (!ensure(pos, 1)) return -1
      buf((pos - bufStart).toInt) & 0xff
    }
    def read(pos: Long, len: Int): Array[Byte] = {
      val b = new Array[Byte](len)
      in.seek(pos); in.readFully(b)
      b
    }
    def length: Long = in.length
  }

  /** Plain-form record read at `pos`: two-phase — locate the header
    * block's CRLF-CRLF terminator with a geometrically growing window
    * (typical blocks are a few hundred bytes; reading the 1 MiB cap
    * per record would tax every record with a megabyte of I/O), then
    * read exactly headers + declared payload + trailer and parse. */
  private def parsePlainAt(sc: Scanner, pos: Long): Option[(Rec, Long)] = {
    val avail = sc.length - pos
    if (avail < 12) return None
    var window = math.min(4096L, avail).toInt
    var head = sc.read(pos, window)
    var hdrEnd = -1
    var searched = 0
    while (hdrEnd < 0) {
      var i = math.max(0, searched - 3)
      while (hdrEnd < 0 && i + 3 < head.length) {
        if (head(i) == '\r' && head(i + 1) == '\n' &&
            head(i + 2) == '\r' && head(i + 3) == '\n') hdrEnd = i + 4
        else i += 1
      }
      if (hdrEnd < 0) {
        searched = head.length
        if (window.toLong >= math.min(MaxHeaderBytes.toLong, avail)) return None
        window = math.min(math.min(window * 4L, MaxHeaderBytes.toLong), avail).toInt
        head = sc.read(pos, window)
      }
    }
    // phase 2: declared length from a cheap pre-parse of the block.
    // The pattern MUST anchor at line start (a header like
    // 'X-Content-Length: 5' earlier in the block would otherwise
    // yield a wrong record extent and silently drop a valid record)
    val hdrStr = new String(head, 0, hdrEnd, java.nio.charset.StandardCharsets.UTF_8)
    val clIdx = ContentLengthLine.findFirstMatchIn(hdrStr)
      .map(_.end).getOrElse(return None)
    val clEnd = hdrStr.indexOf("\r\n", clIdx)
    if (clEnd < 0) return None
    val cl = try hdrStr.substring(clIdx, clEnd).trim.toLong
      catch { case _: NumberFormatException => return None }
    if (cl < 0 || cl > MaxPayloadBytes) return None
    val total = hdrEnd.toLong + cl + 4
    if (pos + total > sc.length) return None
    val bytes = if (total <= head.length) head else sc.read(pos, total.toInt)
    parseRecord(bytes, 0).map(r => (r, pos + r.byteLen))
  }

  /** Record end `next` chains when it is EOF or another record start
    * — the plain-form acceptance condition applied IDENTICALLY by the
    * split scanner and the sequential reader, so which records a file
    * yields never depends on where split boundaries fall. The cost is
    * symmetric too: a valid record immediately followed by corruption
    * is always dropped (the resync recovers everything after). */
  private def chainsAt(sc: Scanner, next: Long): Boolean =
    next == sc.length ||
      (sc.byteAt(next) == 'W' && sc.byteAt(next + 1) == 'A' &&
        sc.byteAt(next + 2) == 'R' && sc.byteAt(next + 3) == 'C' &&
        sc.byteAt(next + 4) == '/')

  /** First valid plain-form record start at/after `from`: offset 0, or
    * a `WARC/` preceded by CRLF-CRLF that parses as a complete record
    * AND chains ([[chainsAt]]). */
  private def findPlainStart(sc: Scanner, from: Long): Long = {
    if (from == 0L) return 0L
    var p = from
    while (p + 5 <= sc.length) {
      if (sc.byteAt(p) == 'W' && sc.byteAt(p + 1) == 'A' &&
          sc.byteAt(p + 2) == 'R' && sc.byteAt(p + 3) == 'C' &&
          sc.byteAt(p + 4) == '/' &&
          p >= 4 && sc.byteAt(p - 4) == '\r' && sc.byteAt(p - 3) == '\n' &&
          sc.byteAt(p - 2) == '\r' && sc.byteAt(p - 1) == '\n') {
        parsePlainAt(sc, p) match {
          case Some((_, next)) if chainsAt(sc, next) => return p
          case _ => ()
        }
      }
      p += 1
    }
    sc.length
  }

  /** Inflate one gzip member at `pos`; returns (plaintext, memberLen)
    * or None if the bytes are not a valid member (bad magic/CM,
    * inflate error, CRC/ISIZE mismatch, cap exceeded). */
  private def inflateMemberAt(sc: Scanner, pos: Long): Option[(Array[Byte], Long)] = {
    if (sc.byteAt(pos) != 0x1f || sc.byteAt(pos + 1) != 0x8b ||
        sc.byteAt(pos + 2) != 8) return None
    val flg = sc.byteAt(pos + 3)
    if (flg < 0) return None
    var p = pos + 10
    if ((flg & 4) != 0) { // FEXTRA
      val xlen = sc.byteAt(p) | (sc.byteAt(p + 1) << 8)
      if (xlen < 0) return None
      p += 2 + xlen
    }
    if ((flg & 8) != 0) { // FNAME (NUL-terminated)
      while (p < sc.length && sc.byteAt(p) != 0) p += 1
      p += 1
    }
    if ((flg & 16) != 0) { // FCOMMENT
      while (p < sc.length && sc.byteAt(p) != 0) p += 1
      p += 1
    }
    if ((flg & 2) != 0) p += 2 // FHCRC
    if (p >= sc.length) return None
    val inflater = new Inflater(true)
    val out = new java.io.ByteArrayOutputStream(1 << 16)
    val outBuf = new Array[Byte](1 << 16)
    try {
      var feedPos = p
      while (!inflater.finished()) {
        if (inflater.needsInput()) {
          if (feedPos >= sc.length) return None // truncated member
          val chunk = sc.read(feedPos,
            math.min((1 << 16).toLong, sc.length - feedPos).toInt)
          inflater.setInput(chunk)
          feedPos += chunk.length
        }
        val k = try inflater.inflate(outBuf)
          catch { case _: java.util.zip.DataFormatException => return None }
        if (k == 0 && inflater.needsDictionary()) return None
        out.write(outBuf, 0, k)
        if (out.size() > MaxPayloadBytes) return None
      }
      val compLen = inflater.getBytesRead
      val trailerPos = p + compLen
      if (trailerPos + 8 > sc.length) return None
      val tr = sc.read(trailerPos, 8)
      def le32(o: Int): Long =
        (tr(o) & 0xffL) | ((tr(o + 1) & 0xffL) << 8) |
          ((tr(o + 2) & 0xffL) << 16) | ((tr(o + 3) & 0xffL) << 24)
      val plain = out.toByteArray
      val crc = new CRC32
      crc.update(plain)
      if (le32(0) != crc.getValue) return None
      if (le32(4) != (plain.length.toLong & 0xffffffffL)) return None
      Some((plain, trailerPos + 8 - pos))
    } finally inflater.end()
  }

  /** First valid gzip-member start at/after `from` whose plaintext is
    * a WARC record (magic + full inflate + CRC + `WARC/` prefix). */
  private def findGzStart(sc: Scanner, from: Long): Long = {
    if (from == 0L) return 0L
    var p = from
    while (p + 18 <= sc.length) {
      if (sc.byteAt(p) == 0x1f && sc.byteAt(p + 1) == 0x8b && sc.byteAt(p + 2) == 8) {
        inflateMemberAt(sc, p) match {
          case Some((plain, _)) if plain.length >= 5 &&
              plain(0) == 'W' && plain(1) == 'A' && plain(2) == 'R' &&
              plain(3) == 'C' && plain(4) == '/' =>
            return p
          case _ => ()
        }
      }
      p += 1
    }
    sc.length
  }

  /** Distributed read of one `.warc` / `.warc.gz` file. Splits the
    * byte range into `defaultParallelism` spans (floored at
    * `minSplitBytes` so tiny files do not fan out into empty tasks);
    * each task scans into its span and reads records whose start
    * offset it owns. */
  def fromWarc(spark: SparkSession, path: String,
               minSplitBytes: Long = 1L << 20): DataFrame = {
    val gz = path.endsWith(".gz")
    val fileLen = { val in = new FsIO.In(path); try in.length finally in.close() }
    val target = spark.sparkContext.defaultParallelism
    val nSplits = math.max(1,
      math.min(target.toLong, fileLen / math.max(1L, minSplitBytes)).toInt)
    val span = (fileLen + nSplits - 1) / nSplits
    val ranges = (0 until nSplits).map(i => (i * span, math.min((i + 1) * span, fileLen)))
    val p = path
    val rdd = spark.sparkContext.parallelize(ranges, nSplits).flatMap { case (start, end) =>
      val in = new FsIO.In(p)
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit](_ => in.close())
      val sc = new Scanner(in)
      var pos = if (gz) findGzStart(sc, start) else findPlainStart(sc, start)
      val it = new Iterator[Row] {
        private var nextRec: Option[(Long, Rec)] = advance()
        private def advance(): Option[(Long, Rec)] = {
          while (pos < end) {
            val at = pos
            // the plain form applies the SAME chain acceptance as the
            // split scanner (chainsAt) — without it, which records
            // survive adjacent corruption would depend on whether a
            // split boundary happened to precede them
            val parsed =
              if (gz) inflateMemberAt(sc, pos).flatMap { case (plain, mlen) =>
                parseRecord(plain, 0).map(r => (r, pos + mlen))
              }
              else parsePlainAt(sc, pos).filter { case (_, next) => chainsAt(sc, next) }
            parsed match {
              case Some((r, next)) =>
                pos = next
                return Some((at, r))
              case None =>
                // mid-file corruption: resync to the next valid start
                // instead of silently ending the split
                pos = if (gz) findGzStart(sc, pos + 1) else findPlainStart(sc, pos + 1)
            }
          }
          if (tc == null) in.close()
          None
        }
        override def hasNext: Boolean = nextRec.isDefined
        override def next(): Row = {
          val (off, r) = nextRec.get
          nextRec = advance()
          toRow(off, r)
        }
      }
      // outside a Spark task there is no completion listener: a
      // consumer abandoning the iterator early (take/limit) would
      // otherwise leak the open handle. Close when the iterator
      // becomes unreachable (close() is idempotent, so the
      // exhaustion-path close above stays correct). The cleanable
      // must capture `in` only — capturing `it` would pin it live.
      if (tc == null) cleaner.register(it, new Runnable {
        private val handle = in
        override def run(): Unit = handle.close()
      })
      it
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Last-resort handle reclamation for iterators consumed outside a
    * Spark task (see fromWarc). */
  private lazy val cleaner = java.lang.ref.Cleaner.create()
}
