package graft.operators

import java.io.ByteArrayOutputStream

/** Dependency-free audio/video-container codec (JDK-only), extending
  * the multimodal pipeline beyond still images ([[ImageCodec]]):
  *
  *   - WAV (RIFF): full chunk walk (`fmt `/`data`, even-byte padding
  *     honored) + REAL PCM16 sample decode — exact RMS / peak over the
  *     interleaved samples, frame count and duration. This is the
  *     audio analog of the PNG pixel decode: the metadata comes from
  *     the actual payload bytes, not from a header guess.
  *   - MP4 / ISO-BMFF: top-level box walk to `ftyp` (major brand) and
  *     `moov`, recursing to `mvhd` (version 0 AND 1 layouts: movie
  *     timescale + duration) and counting `trak` children. Container-
  *     level only — elementary-stream decode needs real codecs and is
  *     out of scope, exactly like JPEG entropy decode in ImageCodec.
  *
  * Plus ENCODERS for both (a PCM16 WAV writer and a box-structural
  * MP4 metadata writer: `ftyp` + `moov{mvhd, trak{tkhd}…}` with a
  * spec-complete 108-byte mvhd and 92-byte tkhd), so tests and
  * oracle-gated queries round-trip genuinely decodable payloads.
  *
  * The reference has no media pipeline (brief-mandated beyond-parity
  * for training-data pipelines); layouts follow the public RIFF/WAVE
  * (Microsoft/IBM 1991) and ISO/IEC 14496-12 specs.
  */
object AvCodec {

  /** Decoded audio metadata. `nFrames` = samples per channel; `rms` /
    * `peak` are over ALL interleaved samples (exact, in-order double
    * accumulation — oracle-reproducible). */
  final case class AudioDecoded(format: String, sampleRate: Int, channels: Int,
                                bitsPerSample: Int, nFrames: Long,
                                durationS: Double, rms: Double, peak: Int)

  /** Decoded video-container metadata. `durationS` =
    * durationUnits / timescale. */
  final case class VideoDecoded(format: String, brand: String, timescale: Long,
                                durationUnits: Long, durationS: Double,
                                nTracks: Int)

  // ------------------------------------------------------------ byte utils

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  private def putLe16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
  }
  private def putLe32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }
  private def putBe32(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
    out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
  }

  // ------------------------------------------------------------ WAV decode

  def isWav(b: Array[Byte]): Boolean =
    b != null && b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** Parse the RIFF chunk list and decode the PCM16 `data` payload.
    * None for non-PCM / non-16-bit / malformed payloads. */
  def decodeWav(b: Array[Byte]): Option[AudioDecoded] = try {
    if (!isWav(b)) return None
    var off = 12
    var audioFormat = -1; var channels = -1; var sampleRate = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= b.length) {
      val id = fourcc(b, off)
      val len = le32(b, off + 4)
      if (len < 0 || off + 8L + len > b.length) return None
      id match {
        case "fmt " =>
          if (len < 16) return None
          audioFormat = le16(b, off + 8)
          channels = le16(b, off + 10)
          sampleRate = le32(b, off + 12)
          bits = le16(b, off + 22)
        case "data" => dataOff = off + 8; dataLen = len
        case _ => // LIST/fact/... skipped
      }
      off += 8 + len + (len & 1) // chunks are padded to even byte counts
    }
    if (audioFormat != 1 || bits != 16 || channels <= 0 || sampleRate <= 0 ||
        dataOff < 0) return None
    val bytesPerFrame = channels * 2
    val nSamples = dataLen / 2
    val nFrames = (dataLen / bytesPerFrame).toLong
    var sumSq = 0.0
    var peak = 0
    var i = 0
    while (i < nSamples) {
      val s = le16(b, dataOff + 2 * i).toShort.toInt
      sumSq += s.toDouble * s.toDouble
      val a = math.abs(s)
      if (a > peak) peak = a
      i += 1
    }
    val rms = if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples)
    Some(AudioDecoded("wav", sampleRate, channels, bits, nFrames,
      nFrames.toDouble / sampleRate, rms, peak))
  } catch { case _: Exception => None }

  /** Raw PCM16 samples: (sampleRate, channels, interleaved samples).
    * None for non-PCM16 payloads — the pixel-decode analog for audio
    * transforms. */
  def wavSamples(b: Array[Byte]): Option[(Int, Int, Array[Short])] = try {
    if (!isWav(b)) return None
    var off = 12
    var audioFormat = -1; var channels = -1; var sampleRate = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= b.length) {
      val id = fourcc(b, off)
      val len = le32(b, off + 4)
      if (len < 0 || off + 8L + len > b.length) return None
      id match {
        case "fmt " =>
          if (len < 16) return None
          audioFormat = le16(b, off + 8)
          channels = le16(b, off + 10)
          sampleRate = le32(b, off + 12)
          bits = le16(b, off + 22)
        case "data" => dataOff = off + 8; dataLen = len
        case _ =>
      }
      off += 8 + len + (len & 1)
    }
    if (audioFormat != 1 || bits != 16 || channels <= 0 || sampleRate <= 0 ||
        dataOff < 0) return None
    val samples = Array.tabulate(dataLen / 2)(i => le16(b, dataOff + 2 * i).toShort)
    Some((sampleRate, channels, samples))
  } catch { case _: Exception => None }

  /** Integer-factor decimation of a PCM16 WAV: keep every `factor`-th
    * FRAME and divide the sample rate — the audio transform stage
    * (frame-sampling analog of [[ImageCodec.resizePng]]). None for
    * payloads [[wavSamples]] can't decode. */
  def decimateWav(b: Array[Byte], factor: Int): Option[Array[Byte]] = {
    require(factor > 0, "factor must be positive")
    wavSamples(b).map { case (rate, ch, samples) =>
      val frames = samples.length / ch
      val outFrames = (frames + factor - 1) / factor
      val out = new Array[Short](outFrames * ch)
      var f = 0
      while (f < outFrames) {
        var c = 0
        while (c < ch) { out(f * ch + c) = samples(f * factor * ch + c); c += 1 }
        f += 1
      }
      encodeWavPcm16(math.max(1, rate / factor), ch, out)
    }
  }

  // ------------------------------------------------------------ WAV encode

  /** Minimal valid PCM16 WAV: RIFF + fmt + data. `samples` are
    * interleaved (frame-major); length must be a channel multiple. */
  def encodeWavPcm16(sampleRate: Int, channels: Int,
                     samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0, "rate/channels must be positive")
    require(samples.length % channels == 0, "samples must be frame-aligned")
    val dataLen = samples.length * 2
    val out = new ByteArrayOutputStream(44 + dataLen)
    out.write("RIFF".getBytes("US-ASCII"))
    putLe32(out, 36 + dataLen) // riff payload size
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII"))
    putLe32(out, 16)
    putLe16(out, 1) // PCM
    putLe16(out, channels)
    putLe32(out, sampleRate)
    putLe32(out, sampleRate * channels * 2) // byte rate
    putLe16(out, channels * 2)              // block align
    putLe16(out, 16)                        // bits per sample
    out.write("data".getBytes("US-ASCII"))
    putLe32(out, dataLen)
    samples.foreach(s => putLe16(out, s & 0xffff))
    out.toByteArray
  }

  /** Deterministic square wave: frame i holds `+amplitude` when
    * `(i / halfPeriod)` is even, else `-amplitude`, on every channel —
    * so RMS == amplitude and peak == amplitude EXACTLY, which is what
    * lets a SQL oracle recompute the decoded stats arithmetically. */
  def squareWave(nFrames: Int, channels: Int, amplitude: Int,
                 halfPeriod: Int): Array[Short] = {
    require(amplitude >= 0 && amplitude <= Short.MaxValue, "amplitude range")
    require(halfPeriod > 0, "halfPeriod must be positive")
    val s = new Array[Short](nFrames * channels)
    var i = 0
    while (i < nFrames) {
      val v = (if ((i / halfPeriod) % 2 == 0) amplitude else -amplitude).toShort
      var c = 0
      while (c < channels) { s(i * channels + c) = v; c += 1 }
      i += 1
    }
    s
  }

  // ------------------------------------------------------------ MP4 decode

  def isMp4(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 && fourcc(b, 4) == "ftyp"

  /** Walk top-level boxes; recurse into `moov` for mvhd + trak count.
    * Handles 32-bit sizes, 64-bit `largesize` (size==1) and
    * to-end-of-file (size==0) boxes. */
  def decodeMp4(b: Array[Byte]): Option[VideoDecoded] = try {
    if (!isMp4(b)) return None
    var brand = ""
    var timescale = -1L; var duration = -1L; var nTracks = 0
    var off = 0L
    while (off + 8 <= b.length) {
      val size0 = be32(b, off.toInt)
      val typ = fourcc(b, off.toInt + 4)
      var hdr = 8L
      val size =
        if (size0 == 1) { hdr = 16L; be64(b, off.toInt + 8) }
        else if (size0 == 0) b.length - off
        else size0
      if (size < hdr || off + size > b.length) return None
      typ match {
        case "ftyp" =>
          if (size >= hdr + 4) brand = fourcc(b, (off + hdr).toInt)
        case "moov" =>
          var in = off + hdr
          val end = off + size
          while (in + 8 <= end) {
            val isz0 = be32(b, in.toInt)
            val ityp = fourcc(b, in.toInt + 4)
            var ihdr = 8L
            val isz =
              if (isz0 == 1) { ihdr = 16L; be64(b, in.toInt + 8) }
              else if (isz0 == 0) end - in
              else isz0
            if (isz < ihdr || in + isz > end) return None
            ityp match {
              case "mvhd" if isz >= ihdr + 4 =>
                val p = (in + ihdr).toInt
                val version = b(p) & 0xff
                if (version == 1 && isz >= ihdr + 32) {
                  // v1: creation(8) modification(8) timescale(4) duration(8)
                  timescale = be32(b, p + 20)
                  duration = be64(b, p + 24)
                } else if (version == 0 && isz >= ihdr + 20) {
                  // v0: creation(4) modification(4) timescale(4) duration(4)
                  timescale = be32(b, p + 12)
                  duration = be32(b, p + 16)
                } else return None // truncated mvhd: refuse, don't read into the next box
              case "trak" => nTracks += 1
              case _ =>
            }
            in += isz
          }
        case _ =>
      }
      off += size
    }
    if (timescale <= 0 || duration < 0) None
    else Some(VideoDecoded("mp4", brand, timescale, duration,
      duration.toDouble / timescale, nTracks))
  } catch { case _: Exception => None }

  // ------------------------------------------------------------ MP4 encode

  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(8 + payload.length)
    putBe32(out, 8L + payload.length)
    out.write(typ.getBytes("US-ASCII"))
    out.write(payload)
    out.toByteArray
  }

  /** Identity transformation matrix (fixed-point, per 14496-12). */
  private def unityMatrix(out: ByteArrayOutputStream): Unit = {
    val m = Array(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L)
    m.foreach(putBe32(out, _))
  }

  /** Box-structurally valid metadata container: `ftyp` + `moov{mvhd,
    * trak{tkhd}×n}`. mvhd is the full spec-complete version-0 layout
    * (108 bytes incl. rate/volume/matrix/next-track-id); each tkhd the
    * full 92-byte version-0 layout. Playable media would additionally
    * need `mdia`/`mdat` with real codec data — out of scope; the
    * decoder above (and any box parser, e.g. mp4box) walks this
    * structure as genuine ISO-BMFF. */
  def encodeMp4Meta(brand: String, timescale: Long, duration: Long,
                    nTracks: Int): Array[Byte] = {
    require(brand.length == 4, "brand must be a 4cc")
    require(timescale > 0 && duration >= 0 && nTracks >= 0, "arg ranges")
    // version-0 mvhd fields are 32-bit; refuse rather than silently truncate
    require(timescale <= 0xffffffffL && duration <= 0xffffffffL,
      "timescale/duration must fit 32 bits for a version-0 mvhd")
    val ftypP = new ByteArrayOutputStream()
    ftypP.write(brand.getBytes("US-ASCII"))
    putBe32(ftypP, 0L)                        // minor version
    ftypP.write(brand.getBytes("US-ASCII"))   // compatible brands
    val mvhdP = new ByteArrayOutputStream()
    putBe32(mvhdP, 0L)          // version 0 + flags
    putBe32(mvhdP, 0L)          // creation
    putBe32(mvhdP, 0L)          // modification
    putBe32(mvhdP, timescale)
    putBe32(mvhdP, duration)
    putBe32(mvhdP, 0x00010000L)        // rate 1.0 (16.16 fixed)
    mvhdP.write(0x01); mvhdP.write(0x00) // volume 1.0 (8.8 fixed, BE)
    mvhdP.write(0x00); mvhdP.write(0x00) // reserved(2)
    putBe32(mvhdP, 0L); putBe32(mvhdP, 0L) // reserved(8)
    unityMatrix(mvhdP)
    (0 until 6).foreach(_ => putBe32(mvhdP, 0L)) // pre_defined(24)
    putBe32(mvhdP, nTracks + 1L)       // next_track_ID
    val traks = (0 until nTracks).map { i =>
      val tkhdP = new ByteArrayOutputStream()
      putBe32(tkhdP, 0x00000007L) // version 0, flags: enabled|in_movie|in_preview
      putBe32(tkhdP, 0L)          // creation
      putBe32(tkhdP, 0L)          // modification
      putBe32(tkhdP, i + 1L)      // track_ID
      putBe32(tkhdP, 0L)          // reserved
      putBe32(tkhdP, duration)
      putBe32(tkhdP, 0L); putBe32(tkhdP, 0L) // reserved(8)
      putBe32(tkhdP, 0L)          // layer(2) + alternate_group(2)
      putBe32(tkhdP, 0L)          // volume(2, video=0) + reserved(2)
      unityMatrix(tkhdP)
      putBe32(tkhdP, 0L)          // width (fixed-point)
      putBe32(tkhdP, 0L)          // height
      box("trak", box("tkhd", tkhdP.toByteArray))
    }
    val moovP = new ByteArrayOutputStream()
    moovP.write(box("mvhd", mvhdP.toByteArray))
    traks.foreach(moovP.write)
    val out = new ByteArrayOutputStream()
    out.write(box("ftyp", ftypP.toByteArray))
    out.write(box("moov", moovP.toByteArray))
    out.toByteArray
  }
}
