package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline: image/audio/video payloads as opaque
  * `binary` columns with typed metadata extracted by distributed
  * per-partition batch processing (the Scala analog of a Pandas-UDF /
  * mapInPandas stage: one JVM-side iterator per partition, records
  * streamed, no driver materialization).
  *
  * The actual codec step is STUBBED — this container ships no
  * image/audio libraries — behind `decodeStub`, a deterministic fake
  * that derives "decoded" properties (dimensions, brightness, frame
  * count) from the MD5 digest of the payload bytes. Everything around
  * the stub — binary schema, typed Dataset plumbing, partition-wise
  * batch iteration, digest computation over raw bytes — is real and
  * is exactly the shape a real decoder plugs into (replace
  * `decodeStub`'s body with e.g. ImageIO/ffmpeg calls).
  */
object Multimodal {

  /** One media payload: id + raw bytes (+ any caller metadata kept
    * alongside by joining back on id). */
  final case class MediaRecord(doc_id: Long, media: Array[Byte])

  /** Typed "decoded" metadata. */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Long, width: Int, height: Int,
      brightness: Double, n_frames: Long)

  /** STUB decoder: deterministic fake properties from the payload's
    * MD5 digest (a real implementation would parse the codec headers
    * and pixel data here — `???` territory without codec libs). */
  def decodeStub(r: MediaRecord): MediaMeta = {
    val digest = java.security.MessageDigest.getInstance("MD5").digest(r.media)
    val b = digest.map(x => (x & 0xff).toLong)
    MediaMeta(
      doc_id = r.doc_id,
      n_bytes = r.media.length.toLong,
      width = (16 + b(0) % 64).toInt,
      height = (16 + b(1) % 64).toInt,
      brightness = b.sum.toDouble / 16.0,
      n_frames = r.media.length / 1000L + 1L)
  }

  /** Distributed decode: binary column -> typed metadata frame via
    * mapPartitions (partition-wise batches, codegen-friendly encoders,
    * zero shuffle). */
  def decodeMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[MediaRecord] =
      df.select(col(idCol).cast("long").as("doc_id"), col(binCol).as("media")).as[MediaRecord]
    ds.mapPartitions(_.map(decodeStub)).toDF()
  }

  /** Make a binary payload column from a string column (UTF-8 bytes) —
    * the testdata has no true media blobs, so documents.text stands in
    * as the payload. */
  def payloadFromText(df: DataFrame, textCol: String, as: String): DataFrame =
    df.withColumn(as, encode(col(textCol), "UTF-8"))
}
