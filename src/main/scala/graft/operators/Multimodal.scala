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
    * fingerprint fallback for unknown formats. */
  def decodeRecord(r: MediaRecord): MediaMeta = ImageCodec.decode(r.media) match {
    case Some(d) => MediaMeta(r.doc_id, r.media.length.toLong, d.width, d.height,
      d.brightness.getOrElse(-1.0), d.nFrames, d.format)
    case None => decodeStub(r)
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
