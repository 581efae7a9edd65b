package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, SimilaritySearch}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def emb(id: Long, v: Float*) = (id, v.toArray)

  test("IVF: assignment picks nearest centroid, ties break by cid") {
    val df = Seq(
      emb(0L, 1f, 0f), emb(1L, 0f, 1f),              // centroids
      emb(2L, 0.9f, 0.1f), emb(3L, 0.1f, 0.9f),
      emb(4L, 1f, 1f)                                 // equidistant -> cell 0
    ).toDF("vec_id", "embedding")
    val cents = SimilaritySearch.trainTakeFirst(df, "vec_id", "embedding", 2)
    assert(cents.map(_._1) == Seq(0, 1))
    val assigned = SimilaritySearch.assignCells(df.where(col("vec_id") >= 2), "embedding", cents)
      .select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(assigned == Map(2L -> 0, 3L -> 1, 4L -> 0))
  }

  test("IVF topK searches only the query's cell and ranks by cosine") {
    val df = Seq(
      emb(0L, 1f, 0f), emb(1L, 0f, 1f),
      emb(10L, 1f, 0.1f), emb(11L, 1f, 0.2f), emb(12L, 0.1f, 1f)
    ).toDF("vec_id", "embedding")
    val cents = SimilaritySearch.trainTakeFirst(df, "vec_id", "embedding", 2)
    val pts = SimilaritySearch.assignCells(df.where(col("vec_id") >= 10), "embedding", cents)
    val top = SimilaritySearch.ivfTopK(pts, Seq(10L), "vec_id", "embedding", "cell", 5)
      .select("nbr_id").collect().map(_.getLong(0)).toSet
    assert(top == Set(11L)) // 12 is in the other cell, never probed
  }

  test("Multimodal.resizeImages: PNGs resize in place, other payloads pass through") {
    import graft.operators.ImageCodec
    val rows = Seq(
      (1L, ImageCodec.encodePngGray(40, 20, 99)),
      (2L, "not an image".getBytes))
    val df = rows.toDF("doc_id", "media")
    val out = Multimodal.resizeImages(df, "doc_id", "media", 10, 5)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val d1 = ImageCodec.decode(out(1L)).get
    assert(d1.width == 10 && d1.height == 5 && d1.brightness.contains(99.0))
    assert(out(2L).toSeq == "not an image".getBytes.toSeq) // untouched
  }

  test("multimodal decode: deterministic stub metadata from bytes") {
    val df = Seq((1L, "hello world"), (2L, "hello world"), (3L, "x")).toDF("doc_id", "text")
    val meta = Multimodal.decodeMeta(
      Multimodal.payloadFromText(df, "text", "media"), "doc_id", "media")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getDouble(4)))
    assert(meta(0)._2 == 11L)              // n_bytes of "hello world"
    assert(meta(0).productIterator.drop(1).toSeq == meta(1).productIterator.drop(1).toSeq) // deterministic
    assert(meta(2)._2 == 1L)
    assert(meta.forall(m => m._3 >= 16 && m._3 < 80 && m._4 >= 16 && m._4 < 80))
  }
}
