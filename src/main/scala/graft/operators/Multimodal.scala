package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline: image/audio/video payloads as opaque
  * `binary` columns with typed metadata extracted by distributed
  * per-partition batch processing (the Scala analog of a Pandas-UDF /
  * mapInPandas stage: one JVM-side iterator per partition, records
  * streamed, no driver materialization).
  *
  * The decode step is REAL for still images: [[ImageCodec]] parses
  * PNG/JPEG/GIF/BMP headers from the raw bytes and fully decodes PNG
  * pixels (zlib inflate + row unfilter) for an exact brightness — all
  * JDK-only. Payloads in no known format fall back to `decodeStub`,
  * a deterministic fingerprint fake (format = "fingerprint") that
  * keeps non-image byte columns flowing through the same schema; a
  * video/audio codec would slot into the same dispatch.
  */
object Multimodal {

  /** One media payload: id + raw bytes (+ any caller metadata kept
    * alongside by joining back on id). */
  final case class MediaRecord(doc_id: Long, media: Array[Byte])

  /** Typed decoded metadata (brightness = -1.0 when the format's pixel
    * decode is unsupported, e.g. JPEG without a DCT pipeline). */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Long, width: Int, height: Int,
      brightness: Double, n_frames: Long, format: String)

  /** Fallback for unrecognized payloads: deterministic fake properties
    * from the payload's MD5 digest, so arbitrary binary columns still
    * produce a stable, testable metadata row. */
  def decodeStub(r: MediaRecord): MediaMeta = {
    val digest = java.security.MessageDigest.getInstance("MD5").digest(r.media)
    val b = digest.map(x => (x & 0xff).toLong)
    MediaMeta(
      doc_id = r.doc_id,
      n_bytes = r.media.length.toLong,
      width = (16 + b(0) % 64).toInt,
      height = (16 + b(1) % 64).toInt,
      brightness = b.sum.toDouble / 16.0,
      n_frames = r.media.length / 1000L + 1L,
      format = "fingerprint")
  }

  /** Real decode of one record: sniff + parse via [[ImageCodec]],
    * fingerprint fallback for unknown formats. Audio/video payloads
    * route through [[AvCodec]] (width/height are 0 for audio; frame
    * count = PCM frames / movie-duration units). */
  def decodeRecord(r: MediaRecord): MediaMeta = ImageCodec.decode(r.media) match {
    case Some(d) => MediaMeta(r.doc_id, r.media.length.toLong, d.width, d.height,
      d.brightness.getOrElse(-1.0), d.nFrames, d.format)
    case None => AvCodec.decodeWav(r.media) match {
      case Some(a) => MediaMeta(r.doc_id, r.media.length.toLong, 0, 0,
        -1.0, a.nFrames, a.format)
      case None => AvCodec.decodeMp4(r.media) match {
        case Some(v) => MediaMeta(r.doc_id, r.media.length.toLong, 0, 0,
          -1.0, v.durationUnits, v.format)
        case None => decodeStub(r)
      }
    }
  }

  // ------------------------------------------------------------ audio lane

  /** Typed decoded audio metadata row. */
  final case class AudioMetaRow(
      doc_id: Long, n_bytes: Long, sample_rate: Int, channels: Int,
      bits: Int, n_frames: Long, duration_s: Double, rms: Double,
      peak: Int, format: String)

  /** Distributed WAV decode: binary column -> typed audio metadata via
    * the same partition-wise batch socket as [[decodeMeta]]. Non-WAV
    * payloads yield a row of zeros with format = "unknown" (total
    * function — a 100 TB pipeline must not die on one bad payload). */
  def decodeAudio(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(binCol).as("media"))
      .as[MediaRecord]
      .mapPartitions(_.map { r =>
        AvCodec.decodeWav(r.media) match {
          case Some(a) => AudioMetaRow(r.doc_id, r.media.length.toLong,
            a.sampleRate, a.channels, a.bitsPerSample, a.nFrames,
            a.durationS, a.rms, a.peak, a.format)
          case None => AudioMetaRow(r.doc_id, r.media.length.toLong,
            0, 0, 0, 0L, 0.0, 0.0, 0, "unknown")
        }
      }).toDF()
  }

  /** Per-row spec for synthesized square-wave WAV payloads. */
  final case class WavSpec(doc_id: Long, sample_rate: Int, channels: Int,
                           n_frames: Int, amplitude: Int, half_period: Int)

  /** Synthesize REAL (decodable) PCM16 WAV payloads — square waves, so
    * the decoded RMS/peak equal the spec amplitude exactly and a SQL
    * oracle can recompute every decoded field arithmetically. */
  def synthesizeWav(df: DataFrame, idCol: String, rateCol: String,
                    chCol: String, framesCol: String, ampCol: String,
                    halfPeriodCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"),
        col(rateCol).cast("int").as("sample_rate"),
        col(chCol).cast("int").as("channels"),
        col(framesCol).cast("int").as("n_frames"),
        col(ampCol).cast("int").as("amplitude"),
        col(halfPeriodCol).cast("int").as("half_period"))
      .as[WavSpec]
      .mapPartitions(_.map(sp => MediaRecord(sp.doc_id,
        AvCodec.encodeWavPcm16(sp.sample_rate, sp.channels,
          AvCodec.squareWave(sp.n_frames, sp.channels, sp.amplitude,
            sp.half_period)))))
      .toDF()
  }

  // ------------------------------------------------------------ video lane

  /** Typed decoded video-container metadata row. */
  final case class VideoMetaRow(
      doc_id: Long, n_bytes: Long, brand: String, timescale: Long,
      duration_units: Long, duration_s: Double, n_tracks: Int,
      format: String)

  /** Distributed MP4 box-walk decode (container metadata: brand,
    * movie timescale/duration, track count). Total function like
    * [[decodeAudio]]. */
  def decodeVideo(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(binCol).as("media"))
      .as[MediaRecord]
      .mapPartitions(_.map { r =>
        AvCodec.decodeMp4(r.media) match {
          case Some(v) => VideoMetaRow(r.doc_id, r.media.length.toLong,
            v.brand, v.timescale, v.durationUnits, v.durationS,
            v.nTracks, v.format)
          case None => VideoMetaRow(r.doc_id, r.media.length.toLong,
            "", 0L, 0L, 0.0, 0, "unknown")
        }
      }).toDF()
  }

  /** Per-row spec for synthesized MP4 metadata containers. */
  final case class Mp4Spec(doc_id: Long, brand: String, timescale: Long,
                           duration_units: Long, n_tracks: Int)

  /** Synthesize REAL (box-parseable) ISO-BMFF payloads. */
  def synthesizeMp4(df: DataFrame, idCol: String, brandCol: String,
                    tsCol: String, durCol: String, tracksCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"),
        col(brandCol).cast("string").as("brand"),
        col(tsCol).cast("long").as("timescale"),
        col(durCol).cast("long").as("duration_units"),
        col(tracksCol).cast("int").as("n_tracks"))
      .as[Mp4Spec]
      .mapPartitions(_.map(sp => MediaRecord(sp.doc_id,
        AvCodec.encodeMp4Meta(sp.brand, sp.timescale, sp.duration_units,
          sp.n_tracks))))
      .toDF()
  }

  /** Distributed decode: binary column -> typed metadata frame via
    * mapPartitions (partition-wise batches, codegen-friendly encoders,
    * zero shuffle). */
  def decodeMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[MediaRecord] =
      df.select(col(idCol).cast("long").as("doc_id"), col(binCol).as("media")).as[MediaRecord]
    ds.mapPartitions(_.map(decodeRecord)).toDF()
  }

  /** Per-row spec for synthesized PNG payloads. */
  final case class PngSpec(doc_id: Long, width: Int, height: Int, gray: Int)

  /** Synthesize REAL (decodable) grayscale PNG payloads from per-row
    * specs — the encode half of the codec round-trip, on the same
    * partition-wise batch socket a production media pipeline uses. */
  def synthesizePng(df: DataFrame, idCol: String, widthCol: String,
                    heightCol: String, grayCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"),
        col(widthCol).cast("int").as("width"),
        col(heightCol).cast("int").as("height"),
        col(grayCol).cast("int").as("gray"))
      .as[PngSpec]
      .mapPartitions(_.map(s => MediaRecord(s.doc_id,
        ImageCodec.encodePngGray(s.width, s.height, s.gray))))
      .toDF()
  }

  /** Media TRANSFORM stage: nearest-neighbor resize of every PNG
    * payload in a binary column (the decode -> transform -> re-encode
    * loop of an image-training pipeline); non-PNG or undecodable
    * payloads pass through untouched. Partition-wise over the typed
    * Dataset — zero shuffle, total function, same 100 TB shape as
    * [[decodeMeta]]. */
  def resizeImages(df: DataFrame, idCol: String, binCol: String,
                   width: Int, height: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(binCol).as("media"))
      .as[MediaRecord]
      .mapPartitions(_.map(r => MediaRecord(r.doc_id,
        ImageCodec.resizePng(r.media, width, height)
          .orElse(resizeLosslessJpeg(r.media, width, height))
          .getOrElse(r.media))))
      .toDF()
  }

  /** Nearest-neighbor resize for GRAYSCALE lossless-JPEG payloads:
    * exact pixel decode -> grid sample -> lossless re-encode
    * (pixel-exact at both ends, like the PNG path). None for color
    * lossless frames (re-encoding one component would silently drop
    * the rest) and for other JPEG flavors — lossy re-encode is a
    * quality policy the caller must opt into. */
  private def resizeLosslessJpeg(bytes: Array[Byte], newW: Int,
      newH: Int): Option[Array[Byte]] =
    JpegCodec.decodeLosslessGrayPixels(bytes).flatMap { case (w, h, px) =>
      if (px.exists(v => v < 0 || v > 255)) None // >8-bit precision
      else {
        val out = new Array[Int](newW * newH)
        var y = 0
        while (y < newH) {
          val sy = (y.toLong * h / newH).toInt
          var x = 0
          while (x < newW) {
            out(y * newW + x) = px(sy * w + (x.toLong * w / newW).toInt)
            x += 1
          }
          y += 1
        }
        Some(JpegCodec.encodeLosslessJpeg(newW, newH, out))
      }
    }

  /** Same shape for baseline JPEG payloads ([[JpegCodec]]): constant
    * gray, all-ones quant table, so the decoded brightness round-trips
    * the spec exactly — the web's dominant image format exercised with
    * real entropy-coded pixels. */
  def synthesizeJpeg(df: DataFrame, idCol: String, widthCol: String,
                     heightCol: String, grayCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"),
        col(widthCol).cast("int").as("width"),
        col(heightCol).cast("int").as("height"),
        col(grayCol).cast("int").as("gray"))
      .as[PngSpec]
      .mapPartitions(_.map { s =>
        // ids rotate through all FOUR decodable JPEG regimes —
        // id%4==0 PROGRESSIVE (SOF2, DC successive approximation),
        // id%4==1 baseline Huffman (SOF0), id%4==2 ARITHMETIC (SOF9,
        // QM-coder, [[JpegArith]]), id%4==3 LOSSLESS (SOF3, Annex H
        // predictive) — each decodes a constant gray exactly, so one
        // oracle lane pins all four entropy decoders
        val bytes = (s.doc_id % 4) match {
          case 0 =>
            val nBlocks = ((s.width + 7) / 8) * ((s.height + 7) / 8)
            val block = new Array[Int](64)
            block(0) = 8 * (s.gray - 128)
            JpegCodec.encodeProgressiveJpeg(s.width, s.height,
              Seq.fill(nBlocks)(block))
          case 1 => JpegCodec.encodeGrayJpeg(s.width, s.height, s.gray)
          case 2 => JpegArith.encodeArithGrayJpeg(s.width, s.height, s.gray)
          case _ => JpegCodec.encodeLosslessJpeg(s.width, s.height,
            Array.fill(s.width * s.height)(s.gray))
        }
        MediaRecord(s.doc_id, bytes)
      })
      .toDF()
  }

  /** Deterministic patterned-image fixture pixels: 4x4 tiles whose
    * brightness is an md5 mix of (base id, tile) — pseudo-random per
    * base so distinct bases get distinct dHashes (simple arithmetic
    * mixes left modular structure that collided bases; the md5 idiom
    * is the repo's standard engine-portable hash) — while odd ids add
    * a constant +2 brightness shift on their even sibling's pattern:
    * a brightness-shifted near-duplicate that dHash (gradient-based)
    * is invariant to. Mirrored verbatim in the q_mm_phash oracle. */
  private[graft] def patternPixel(docId: Long, x: Int, y: Int): Int =
    tileValue(docId, x / 4, y / 4) + ((docId % 2) * 2).toInt

  /** One md5 per 4x4 tile, not per pixel — synthesizeJpegPattern
    * computes each tile once (a 36x32 image has 72 tiles, not 1152
    * digests). */
  private def tileValue(docId: Long, tx: Int, ty: Int): Int = {
    val k = (docId / 2) * 10007L + ty * 251L + tx
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(k.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (d(0) & 0xff) % 200
  }

  /** Patterned LOSSLESS-JPEG synthesizer ([[patternPixel]] content —
    * lossless so the decoded plane is bit-exactly the formula, and
    * the perceptual-hash oracle can recompute it in SQL). */
  def synthesizeJpegPattern(df: DataFrame, idCol: String,
                            width: Int, height: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        // one digest per 4x4 tile; pixels read the tile table
        val tw = (width + 3) / 4; val th = (height + 3) / 4
        val tiles = Array.tabulate(th, tw)((ty, tx) => tileValue(id, tx, ty))
        val shift = ((id % 2) * 2).toInt
        val px = new Array[Int](width * height)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            px(y * width + x) = tiles(y / 4)(x / 4) + shift
            x += 1
          }
          y += 1
        }
        MediaRecord(id, JpegCodec.encodeLosslessJpeg(width, height, px))
      })
      .toDF()
  }

  /** Per-image difference hash (dHash) row. */
  final case class DHashRow(doc_id: Long, width: Int, height: Int,
      dhash_hi: Long, dhash_lo: Long)

  /** Perceptual-hash image dedup primitive: dHash (difference hash —
    * the standard 64-bit gradient fingerprint used for near-duplicate
    * image detection; see e.g. the pHash/dHash family surveyed in
    * Zauner 2010, "Implementation and Benchmarking of Perceptual
    * Image Hash Functions"). The image is block-averaged onto an
    * 8-row x 9-column grid; bit (r,c) = [avg(r,c+1) > avg(r,c)],
    * compared exactly via cross-multiplied integer sums so unequal
    * block sizes need no floating division. Uniform brightness
    * shifts and uniform rescaling of block structure leave every bit
    * unchanged — exactly the invariance image dedup wants. The 64
    * bits are emitted as two BIGINT halves (bit 63 would overflow a
    * checked signed shift in the SQL oracle).
    *
    * Decode path: lossless-JPEG plane ([[JpegCodec.decodeLosslessPixels]])
    * or PNG gray plane ([[ImageCodec]]); unsupported payloads yield
    * (-1, -1) geometry with zero hash (total function — a corrupt
    * image must not kill a 100 TB scan). Scale shape: pure
    * partition-wise decode, zero shuffle; the dedup consumer groups
    * by (dhash_hi, dhash_lo) — one hash-keyed shuffle of 16 bytes per
    * image, never pixels. */
  def dhashImages(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"),
        col(binCol).cast("binary").as("media")).as[MediaRecord]
      .mapPartitions(_.map { r =>
        grayPlane(r.media) match {
          case Some((w, h, px)) if w >= 9 && h >= 8 =>
            val (hi, lo) = dhashBits(w, h, px)
            DHashRow(r.doc_id, w, h, hi, lo)
          case _ => DHashRow(r.doc_id, -1, -1, 0L, 0L)
        }
      })
      .toDF()
  }

  /** Grayscale plane from any decodable payload: lossless-JPEG sample
    * plane, or a PNG's integer Rec.601 luma (gray/RGB/palette,
    * 8/16-bit). */
  private def grayPlane(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    JpegCodec.decodeLosslessPixels(bytes)
      .orElse(ImageCodec.grayPixels(bytes))

  /** 8x9-grid difference hash over a row-major gray plane; returns
    * (hi, lo) = bits 32..63 and 0..31 of idx = r*8 + c. */
  private[graft] def dhashBits(w: Int, h: Int, px: Array[Int]): (Long, Long) = {
    val sums = new Array[Long](8 * 9)
    val cnts = new Array[Long](8 * 9)
    var y = 0
    while (y < h) {
      val r = y * 8 / h
      var x = 0
      while (x < w) {
        val c = x * 9 / w
        val i = r * 9 + c
        sums(i) += px(y * w + x)
        cnts(i) += 1L
        x += 1
      }
      y += 1
    }
    var hi = 0L; var lo = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        val a = r * 9 + c
        val b = a + 1
        // avg(b) > avg(a) without division: cross-multiply exact sums.
        // 16-bit planes near the 2^24-pixel cap can push sums to
        // ~2^49 and the product past Long range — fall back to exact
        // BigInt when either product could overflow (never on 8-bit
        // images; a wrapped product would flip hash bits silently).
        val safe = (cnts(a) == 0L || sums(b) <= Long.MaxValue / cnts(a)) &&
          (cnts(b) == 0L || sums(a) <= Long.MaxValue / cnts(b))
        val gtv =
          if (safe) sums(b) * cnts(a) > sums(a) * cnts(b)
          else BigInt(sums(b)) * cnts(a) > BigInt(sums(a)) * cnts(b)
        if (gtv) {
          val idx = r * 8 + c
          if (idx >= 32) hi |= 1L << (idx - 32) else lo |= 1L << idx
        }
        c += 1
      }
      r += 1
    }
    (hi, lo)
  }

  /** The SAME stub decode as pure Column expressions — because this
    * particular stub (md5-derived fields) needs no imperative code,
    * routing queries through it keeps whole-stage codegen intact
    * (mapPartitions breaks the codegen span for zero functional gain
    * today). The typed-Dataset `decodeMeta` path stays as the socket a
    * REAL codec (ImageIO/ffmpeg) plugs into, where imperative
    * per-partition batching is genuinely required. */
  def decodeMetaColumns(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val media = col(binCol)
    val hex = md5(media) // 32 hex chars = 16 digest bytes
    def byteAt(i: Int) = conv(substring(hex, 2 * i + 1, 2), 16, 10).cast("long")
    val byteSum = (0 until 16).map(byteAt).reduce(_ + _)
    df.select(
      col(idCol).cast("long").as("doc_id"),
      octet_length(media).cast("long").as("n_bytes"),
      (lit(16) + byteAt(0) % 64).cast("int").as("width"),
      (lit(16) + byteAt(1) % 64).cast("int").as("height"),
      (byteSum.cast("double") / 16.0).as("brightness"),
      (floor(octet_length(media) / lit(1000)).cast("long") + 1L).as("n_frames"))
  }

  /** Make a binary payload column from a string column (UTF-8 bytes) —
    * the testdata has no true media blobs, so documents.text stands in
    * as the payload. */
  def payloadFromText(df: DataFrame, textCol: String, as: String): DataFrame =
    df.withColumn(as, encode(col(textCol), "UTF-8"))
}
