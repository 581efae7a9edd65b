package graft.operators

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** Dependency-free still-image codec (JDK-only — this container ships
  * no image libraries, so the "real codec" is written against the
  * public file-format specs directly):
  *
  *   - PNG: full IHDR parse + REAL pixel decode — zlib-inflate the
  *     IDAT stream and undo all five row filters (None/Sub/Up/Average/
  *     Paeth) for 8- and 16-bit gray/RGB/gray+alpha/RGBA/palette,
  *     non-interlaced or Adam7, yielding an exact mean brightness —
  *     plus nearest-neighbor RESIZE (decode -> sample -> re-encode).
  *   - JPEG: REAL baseline pixel decode via [[JpegCodec]] (Huffman +
  *     IDCT over the luma plane); progressive/arithmetic files fall
  *     back to the SOFn header walk (metadata only).
  *   - GIF / BMP: logical-screen / info-header dimensions.
  *
  * Plus a minimal-but-valid PNG ENCODER (filter-0 rows, zlib, CRC32
  * chunks; grayscale or RGB) so tests and oracle-gated queries can
  * round-trip genuinely decodable payloads without fixtures on disk.
  *
  * The reference has no media pipeline (this is brief-mandated
  * beyond-parity for training-data pipelines); format layouts follow
  * the public PNG (RFC 2083), JPEG (ITU T.81), GIF89a and BMP specs.
  */
object ImageCodec {

  /** Decoded metadata; `brightness` is the mean over color channels
    * (alpha excluded) when pixel decode is supported for the format. */
  final case class Decoded(format: String, width: Int, height: Int,
                           brightness: Option[Double], nFrames: Long)

  // ------------------------------------------------------------ byte utils

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  // ------------------------------------------------------------ dispatch

  /** Sniff the signature and decode; None when no known format. */
  def decode(bytes: Array[Byte]): Option[Decoded] =
    if (bytes == null) None
    else if (isPng(bytes)) decodePng(bytes)
    else if (isJpeg(bytes)) decodeJpeg(bytes)
    else if (isGif(bytes)) decodeGif(bytes)
    else if (isBmp(bytes)) decodeBmp(bytes)
    else None

  private def isPng(b: Array[Byte]): Boolean =
    b.length > 24 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G' && (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a &&
      (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0x0a
  private def isJpeg(b: Array[Byte]): Boolean =
    b.length > 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8
  private def isGif(b: Array[Byte]): Boolean =
    b.length > 9 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a'
  private def isBmp(b: Array[Byte]): Boolean =
    b.length > 25 && b(0) == 'B' && b(1) == 'M'

  // ------------------------------------------------------------ PNG decode

  private final case class PngRaw(width: Int, height: Int, depth: Int,
                                  colorType: Int, interlace: Int,
                                  idat: Array[Byte], nFrames: Long,
                                  palette: Array[Byte]) // PLTE RGB triples (may be empty)

  /** Chunk walk: dims + concatenated IDAT payload (shared by metadata
    * decode and pixel decode/resize). */
  private def pngChunks(b: Array[Byte]): Option[PngRaw] = try {
    var off = 8
    var width = -1; var height = -1; var depth = 0; var colorType = -1
    var interlace = 0
    var nFrames = 1L
    val idat = new ByteArrayOutputStream()
    var palette = Array.empty[Byte]
    var done = false
    while (!done && off + 12 <= b.length) {
      val len = be32(b, off)
      val typ = new String(b, off + 4, 4, "US-ASCII")
      if (len < 0 || off + 12L + len > b.length) done = true
      else {
        typ match {
          case "IHDR" =>
            width = be32(b, off + 8); height = be32(b, off + 12)
            depth = b(off + 16) & 0xff; colorType = b(off + 17) & 0xff
            if (len >= 13) interlace = b(off + 20) & 0xff
          case "acTL" => nFrames = math.max(1, be32(b, off + 8)).toLong // APNG
          case "PLTE" => palette = java.util.Arrays.copyOfRange(b, off + 8, off + 8 + len)
          case "IDAT" => idat.write(b, off + 8, len)
          case "IEND" => done = true
          case _ =>
        }
        off += 12 + len
      }
    }
    if (width <= 0 || height <= 0) None
    else Some(PngRaw(width, height, depth, colorType, interlace,
      idat.toByteArray, nFrames, palette))
  } catch { case _: Exception => None }

  private def decodePng(b: Array[Byte]): Option[Decoded] =
    pngChunks(b).map { raw =>
      val brightness = unfilterPixels(raw).map { case (ch, px) =>
        if (raw.colorType == 3) { // palette indices -> mean of RGB entries
          var sum = 0.0; var i = 0
          while (i < px.length) {
            val o = px(i) * 3
            sum += ((raw.palette(o) & 0xff) + (raw.palette(o + 1) & 0xff) +
              (raw.palette(o + 2) & 0xff)) / 3.0
            i += 1
          }
          sum / math.max(px.length, 1)
        } else {
          val colorCh = raw.colorType match { case 4 => 1; case 6 => 3; case _ => ch }
          var sum = 0.0; var cnt = 0L; var i = 0
          while (i < px.length) {
            if (i % ch < colorCh) { sum += px(i); cnt += 1 }
            i += 1
          }
          sum / math.max(cnt, 1L)
        }
      }
      Decoded("png", raw.width, raw.height, brightness, raw.nFrames)
    }

  /** Samples per pixel; palette (ct 3) is 1 index/pixel resolved
    * through PLTE. -1 = unsupported for pixel decode. */
  private def channelsOf(ct: Int): Int = ct match {
    case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4; case _ => -1
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Adam7 pass origins and steps: (x0, y0, dx, dy), PNG spec §8.2. */
  private val Adam7Passes: Seq[(Int, Int, Int, Int)] = Seq(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Inflate + unfilter to raw samples: (channels, row-major samples).
    * 8-bit and 16-bit (high byte kept — the standard 16->8 reduction),
    * non-interlaced and Adam7. Filtering is BYTE-wise with
    * bpp = channels·bytes/sample (spec §9); each Adam7 pass is an
    * independent filtered sub-image whose pixels scatter back to
    * (x0 + i·dx, y0 + j·dy). None for shapes outside that envelope. */
  private def unfilterPixels(rawPng: PngRaw): Option[(Int, Array[Int])] = {
    val w = rawPng.width; val h = rawPng.height
    val ch = channelsOf(rawPng.colorType)
    if (ch < 0 || (rawPng.depth != 8 && rawPng.depth != 16) ||
      rawPng.idat.isEmpty) return None
    if (rawPng.interlace != 0 && rawPng.interlace != 1) return None
    if (rawPng.colorType == 3 &&
      (rawPng.palette.length < 3 || rawPng.depth == 16)) return None
    val sampleBytes = rawPng.depth / 8
    val bpp = ch * sampleBytes
    if (w.toLong * ch * h > (1L << 28)) return None // sanity cap, ~256M samples
    val passes =
      if (rawPng.interlace == 0) Seq((0, 0, 1, 1)) else Adam7Passes
    def passDims(p: (Int, Int, Int, Int)): (Int, Int) = {
      val (x0, y0, dx, dy) = p
      (math.max(0, (w - x0 + dx - 1) / dx), math.max(0, (h - y0 + dy - 1) / dy))
    }
    // empty passes (sub-image narrower than the origin) contribute no
    // bytes at all — not even filter bytes (spec §8.2)
    val totalBytes = passes.map { p =>
      val (pw, ph) = passDims(p)
      if (pw == 0 || ph == 0) 0L else ph.toLong * (1L + pw.toLong * bpp)
    }.sum
    if (totalBytes > (1L << 29)) return None
    val raw = new Array[Byte](totalBytes.toInt)
    val inf = new Inflater()
    inf.setInput(rawPng.idat)
    var got = 0
    try {
      while (!inf.finished() && got < raw.length) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        got += n
      }
    } finally inf.end()
    if (got < raw.length) return None
    val px = new Array[Int](w * ch * h)
    var off = 0
    for (p @ (x0, y0, dx, dy) <- passes) {
      val (pw, ph) = passDims(p)
      if (pw > 0 && ph > 0) {
        val stride = pw * bpp
        val buf = new Array[Int](stride * ph) // unfiltered pass BYTES
        var y = 0
        while (y < ph) {
          val f = raw(off + y * (stride + 1)) & 0xff
          var x = 0
          while (x < stride) {
            val cur = raw(off + y * (stride + 1) + 1 + x) & 0xff
            val a = if (x >= bpp) buf(y * stride + x - bpp) else 0
            val up = if (y > 0) buf((y - 1) * stride + x) else 0
            val c = if (x >= bpp && y > 0) buf((y - 1) * stride + x - bpp) else 0
            val v = f match {
              case 0 => cur
              case 1 => (cur + a) & 0xff
              case 2 => (cur + up) & 0xff
              case 3 => (cur + (a + up) / 2) & 0xff
              case 4 => (cur + paeth(a, up, c)) & 0xff
              case _ => return None
            }
            buf(y * stride + x) = v
            x += 1
          }
          // scatter the completed row back into the full-size image
          val iy = y0 + y * dy
          var sx = 0
          while (sx < pw) {
            val ix = x0 + sx * dx
            var cc = 0
            while (cc < ch) {
              // 16-bit samples are big-endian: byte 0 is the high byte
              px((iy * w + ix) * ch + cc) =
                buf(y * stride + sx * bpp + cc * sampleBytes)
              cc += 1
            }
            sx += 1
          }
          y += 1
        }
        off += ph * (stride + 1)
      }
    }
    if (rawPng.colorType == 3) {
      // palette indices are attacker-controlled: a truncated PLTE with
      // out-of-range indices must read as undecodable, not throw from
      // the palette lookups downstream (brightness/resize)
      val entries = rawPng.palette.length / 3
      var i = 0
      while (i < px.length) {
        if (px(i) >= entries) return None
        i += 1
      }
    }
    Some((ch, px))
  }

  /** Grayscale (luma) plane of a PNG — the pixel source perceptual
    * hashing needs ([[Multimodal.dhashImages]]). Gray/gray+alpha use
    * the gray channel directly; RGB/RGBA and palette images take the
    * integer Rec.601 luma (299r + 587g + 114b) / 1000 — exact integer
    * arithmetic, alpha ignored. 16-bit samples are read at 8-bit
    * precision (high byte — the same truncation the whole PNG pixel
    * path applies; a hash/brightness consumer never needs the low
    * byte); None when pixel decode is unsupported. */
  def grayPixels(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    for {
      raw <- pngChunks(bytes)
      (ch, px) <- unfilterPixels(raw)
    } yield {
      val n = raw.width * raw.height
      val out = new Array[Int](n)
      if (raw.colorType == 3) {
        var i = 0
        while (i < n) {
          val p = px(i) * 3
          out(i) = (299 * (raw.palette(p) & 0xff) +
            587 * (raw.palette(p + 1) & 0xff) +
            114 * (raw.palette(p + 2) & 0xff)) / 1000
          i += 1
        }
      } else if (ch <= 2) { // gray or gray+alpha: channel 0
        var i = 0
        while (i < n) { out(i) = px(i * ch); i += 1 }
      } else { // RGB / RGBA
        var i = 0
        while (i < n) {
          val p = i * ch
          out(i) = (299 * px(p) + 587 * px(p + 1) + 114 * px(p + 2)) / 1000
          i += 1
        }
      }
      (raw.width, raw.height, out)
    }

  /** Nearest-neighbor PNG resize: full pixel decode -> grid sample ->
    * re-encode. Grayscale stays grayscale (alpha dropped), anything
    * with color re-encodes as RGB. None for inputs the pixel decoder
    * doesn't handle (sub-8-bit depths). The media-pipeline
    * "resize" transform — decode and encode both run in the calling
    * task, so a resize over a binary column is embarrassingly
    * parallel. */
  def resizePng(bytes: Array[Byte], newW: Int, newH: Int): Option[Array[Byte]] = {
    require(newW > 0 && newH > 0, "resize dims must be positive")
    for {
      raw <- pngChunks(bytes)
      (ch, px) <- unfilterPixels(raw)
    } yield {
      val stride = raw.width * ch
      if (raw.colorType == 3) { // palette indices -> RGB output
        encodePng(newW, newH, 3, (x, y, c) => {
          val sx = (x.toLong * raw.width / newW).toInt
          val sy = (y.toLong * raw.height / newH).toInt
          raw.palette(px(sy * stride + sx) * 3 + c) & 0xff
        })
      } else {
        val colorCh = raw.colorType match { case 4 => 1; case 6 => 3; case _ => ch }
        val outCh = if (colorCh == 1) 1 else 3
        encodePng(newW, newH, outCh, (x, y, c) => {
          val sx = (x.toLong * raw.width / newW).toInt
          val sy = (y.toLong * raw.height / newH).toInt
          px(sy * stride + sx * ch + c)
        })
      }
    }
  }

  // ------------------------------------------------------------ JPEG decode

  /** Baseline (SOF0/1), progressive (SOF2), arithmetic (SOF9/10,
    * QM-coder) and lossless (SOF3, Annex H predictive) files get a
    * REAL pixel decode ([[JpegCodec.decodePixels]]) so brightness is
    * defined like PNG's; the rest (hierarchical pyramids — a formal
    * rejection, see decodePixels — and oversized frames) falls back
    * to the SOFn header walk for metadata only. */
  private def decodeJpeg(b: Array[Byte]): Option[Decoded] =
    JpegCodec.decodePixels(b) match {
      case Some((w, h, brightness)) =>
        Some(Decoded("jpeg", w, h, Some(brightness), 1L))
      case None => decodeJpegHeader(b)
    }

  /** Walk marker segments to the first SOFn (start-of-frame) header. */
  private def decodeJpegHeader(b: Array[Byte]): Option[Decoded] = try {
    def isSof(m: Int): Boolean =
      m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
    var pos = 2
    while (pos + 4 <= b.length) {
      if ((b(pos) & 0xff) != 0xff) return None
      var mOff = pos + 1
      while (mOff < b.length - 1 && (b(mOff) & 0xff) == 0xff) mOff += 1 // fill bytes
      val m = b(mOff) & 0xff
      if (m >= 0xd0 && m <= 0xd9) pos = mOff + 1 // standalone RSTn/SOI/EOI
      else if (m == 0xda) return None            // SOS before any SOF: give up
      else {
        if (mOff + 3 > b.length) return None
        val segLen = be16(b, mOff + 1)
        if (segLen < 2 || mOff + 1 + segLen > b.length) return None
        if (isSof(m)) {
          if (segLen < 8) return None
          val h = be16(b, mOff + 4); val w = be16(b, mOff + 6)
          return if (w > 0 && h > 0) Some(Decoded("jpeg", w, h, None, 1L)) else None
        }
        pos = mOff + 1 + segLen
      }
    }
    None
  } catch { case _: Exception => None }

  // ------------------------------------------------------------ GIF / BMP

  private def decodeGif(b: Array[Byte]): Option[Decoded] = {
    val w = le16(b, 6); val h = le16(b, 8)
    if (w > 0 && h > 0) Some(Decoded("gif", w, h, None, 1L)) else None
  }

  private def decodeBmp(b: Array[Byte]): Option[Decoded] = {
    val w = le32(b, 18); val h = math.abs(le32(b, 22))
    if (w > 0 && h > 0) Some(Decoded("bmp", w, h, None, 1L)) else None
  }

  // ------------------------------------------------------------ PNG encode

  private[graft] def pngChunk(out: ByteArrayOutputStream, typ: String,
                              data: Array[Byte]): Unit = {
    val lenBuf = new Array[Byte](4)
    putBe32(lenBuf, 0, data.length)
    out.write(lenBuf)
    val typBytes = typ.getBytes("US-ASCII")
    out.write(typBytes)
    out.write(data)
    val crc = new CRC32()
    crc.update(typBytes); crc.update(data)
    val crcBuf = new Array[Byte](4)
    putBe32(crcBuf, 0, crc.getValue.toInt)
    out.write(crcBuf)
  }

  private def putBe32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v >>> 24).toByte; b(o + 1) = (v >>> 16).toByte
    b(o + 2) = (v >>> 8).toByte; b(o + 3) = v.toByte
  }

  private[graft] def zlibDeflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val out = new ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
    d.end()
    out.toByteArray
  }

  private[graft] val PngSignature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Minimal valid 8-bit PNG from a pixel function; grayscale
    * (`channels = 1`, color type 0) or RGB (`channels = 3`, color
    * type 2); filter-0 rows, single IDAT. Round-trips through
    * [[decode]] (and any standards-compliant viewer). */
  def encodePng(width: Int, height: Int, channels: Int,
                sample: (Int, Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, "dims must be positive")
    require(channels == 1 || channels == 3, "grayscale or RGB")
    val stride = width * channels
    val raw = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < stride) {
        raw(y * (stride + 1) + 1 + x) = (sample(x / channels, y, x % channels) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    out.write(PngSignature)
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width); putBe32(ihdr, 4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = (if (channels == 1) 0 else 2).toByte // color type
    pngChunk(out, "IHDR", ihdr)
    pngChunk(out, "IDAT", zlibDeflate(raw))
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Constant-gray convenience encoder. */
  def encodePngGray(width: Int, height: Int, gray: Int): Array[Byte] =
    encodePng(width, height, 1, (_, _, _) => gray)

  /** Adam7-interlaced PNG encoder (8-bit gray/RGB, filter-0 rows):
    * the seven passes' filtered sub-images concatenated into one
    * zlib stream, exactly the layout [[unfilterPixels]] re-assembles.
    * Exists so interlaced decode is pinned by a fixture we can
    * generate without image libraries on the container. */
  def encodePngAdam7(width: Int, height: Int, channels: Int,
                     sample: (Int, Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, "dims must be positive")
    require(channels == 1 || channels == 3, "grayscale or RGB")
    val rawOut = new ByteArrayOutputStream()
    for ((x0, y0, dx, dy) <- Adam7Passes) {
      val pw = math.max(0, (width - x0 + dx - 1) / dx)
      val ph = math.max(0, (height - y0 + dy - 1) / dy)
      if (pw > 0 && ph > 0) {
        var y = 0
        while (y < ph) {
          rawOut.write(0) // filter type 0
          var sx = 0
          while (sx < pw) {
            var c = 0
            while (c < channels) {
              rawOut.write(sample(x0 + sx * dx, y0 + y * dy, c) & 0xff)
              c += 1
            }
            sx += 1
          }
          y += 1
        }
      }
    }
    val out = new ByteArrayOutputStream()
    out.write(PngSignature)
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width); putBe32(ihdr, 4, height)
    ihdr(8) = 8
    ihdr(9) = (if (channels == 1) 0 else 2).toByte
    ihdr(12) = 1 // Adam7
    pngChunk(out, "IHDR", ihdr)
    pngChunk(out, "IDAT", zlibDeflate(rawOut.toByteArray))
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** 16-bit grayscale PNG encoder (filter-0 rows, big-endian
    * samples) — fixture generator for the 16-bit decode path. */
  def encodePng16Gray(width: Int, height: Int,
                      sample: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, "dims must be positive")
    val stride = width * 2
    val raw = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = sample(x, y) & 0xffff
        raw(y * (stride + 1) + 1 + x * 2) = (v >>> 8).toByte
        raw(y * (stride + 1) + 2 + x * 2) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    out.write(PngSignature)
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width); putBe32(ihdr, 4, height)
    ihdr(8) = 16
    ihdr(9) = 0 // grayscale
    pngChunk(out, "IHDR", ihdr)
    pngChunk(out, "IDAT", zlibDeflate(raw))
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
