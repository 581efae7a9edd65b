package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorExpressions.{fdot, fnorm}

/** Approximate nearest-neighbor search over embedding columns — the
  * scale path beyond the brute-force baseline
  * (VectorQueries.q_similarity_topk).
  *
  * Architecture = classic IVF (inverted-file) coarse quantization:
  *   1. TRAIN: a small, deterministic set of coarse centroids. At
  *      100 TB this is a sample + k-means on the driver or a tiny
  *      Spark job; the quantizer is always small enough to broadcast.
  *   2. ASSIGN: every vector gets a `cell` = argmin over centroids of
  *      cosine distance. With centroids inlined as literals this is a
  *      pure projection — ZERO shuffle, embarrassingly parallel, and
  *      the codegen'd FloatVectorDot kernel does each distance in a
  *      tight primitive loop.
  *   3. PROBE: a query searches only its own cell (nProbe=1 here;
  *      widening to n cells is a union of cell keys). The candidate
  *      join shuffles on `cell` — cardinality ~ n/cells per bucket —
  *      instead of the O(n·q) cross join of the brute-force path.
  *
  * Tie-breaks are deterministic everywhere (struct ordering by
  * (dist, cid), row_number by (cos DESC, vec_id)), so results are
  * exactly reproducible and oracle-checkable.
  */
object SimilaritySearch {

  /** Driver-side exact norm matching the engine/oracle fold order. */
  private def normOf(v: Seq[Float]): Double =
    math.sqrt(v.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))

  /** Cosine distance (1 - cos) of an embedding column vs one literal
    * centroid vector; 1.0 when either norm is zero. */
  private def centroidDist(embCol: Column, v: Seq[Float]): Column = {
    val c = typedlit(v)
    val denom = fnorm(embCol) * lit(normOf(v))
    when(denom === 0.0, lit(1.0)).otherwise(lit(1.0) - fdot(embCol, c) / denom)
  }

  /** Assign each row's embedding to its nearest centroid cell —
    * a shuffle-free projection (array_min over (dist, cid) structs). */
  def assignCells(df: DataFrame, embCol: String,
                  centroids: Seq[(Int, Seq[Float])], cellCol: String = "cell"): DataFrame = {
    val entries = centroids.map { case (cid, v) =>
      struct(centroidDist(col(embCol), v).as("dist"), lit(cid).as("cid"))
    }
    df.withColumn(cellCol, array_min(array(entries: _*)).getField("cid"))
  }

  /** Deterministic "training": use the rows with id < nCells as
    * centroids (collected to the driver — always tiny). A production
    * quantizer would k-means a sample; the plumbing is identical. */
  def trainTakeFirst(df: DataFrame, idCol: String, embCol: String,
                     nCells: Int): Seq[(Int, Seq[Float])] =
    df.where(col(idCol) < nCells)
      .select(col(idCol).cast("int"), col(embCol))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
      .sortBy(_._1)
      .toSeq

  /** IVF top-k: for each query row, the k nearest neighbors among
    * non-query rows sharing its cell. Queries are broadcast (small);
    * candidates shuffle only by cell. */
  def ivfTopK(points: DataFrame, queryIds: Seq[Long], idCol: String,
              embCol: String, cellCol: String, k: Int): DataFrame = {
    val pts = points.select(col(idCol).as("nbr_id"), col(embCol).as("emb"),
      col(cellCol).as("cell"), fnorm(col(embCol)).as("nrm"))
    val qs = points.where(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(embCol).as("q_emb"),
        col(cellCol).as("q_cell"), fnorm(col(embCol)).as("q_nrm"))
    val denom = col("q_nrm") * col("nrm")
    val scored = pts.join(broadcast(qs),
        col("cell") === col("q_cell") && col("nbr_id") =!= col("query_id"))
      .select(col("query_id"), col("nbr_id"), col("cell"),
        when(denom === 0.0, lit(0.0))
          .otherwise(fdot(col("q_emb"), col("emb")) / denom).as("cos"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("nbr_id"))))
      .where(col("rank") <= k)
  }
}
