package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilaritySearch

/** The vector kernels (SrpBandKeysExpr / PqEncodeExpr) must be
  * bit-identical to the interpreted Column formulations they replaced
  * — srpBit composition and array_min-over-structs encode — which are
  * what the DuckDB oracles mirror. */
class VectorKernelsSpec extends SparkSpec {

  private def randomVecs(n: Int, dim: Int, seed: Int, withNulls: Boolean = false) = {
    val rnd = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      val v = (0 until dim).map { j =>
        if (withNulls && rnd.nextInt(50) == 0) null
        else java.lang.Float.valueOf((rnd.nextFloat() - 0.5f) * 4f)
      }
      (i.toLong, v)
    }
    val rdd = spark.sparkContext.parallelize(rows, 3)
    spark.createDataFrame(rdd).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
  }

  /** The pre-r11 formulation, from the kept srpBit reference. */
  private def refBandKeys(emb: org.apache.spark.sql.Column, dim: Int,
      nBands: Int, bitsPerBand: Int) =
    array((0 until nBands).map { b =>
      val key = (0 until bitsPerBand).map { r =>
        SimilaritySearch.srpBit(emb, b * bitsPerBand + r, dim) * (1L << r)
      }.reduce(_ + _)
      struct(lit(b).as("band"), key.as("bkey"))
    }: _*)

  test("SRP band keys kernel matches the srpBit composition") {
    val df = randomVecs(200, 64, seed = 7)
    val got = df.select(col("vec_id"),
        SimilaritySearch.srpBandKeys(col("embedding"), 64, 4, 8).as("bk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    val want = df.select(col("vec_id"),
        refBandKeys(col("embedding"), 64, 4, 8).as("bk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(got === want)
  }

  test("SRP kernel null-element semantics: any null -> all band keys 0") {
    val df = randomVecs(120, 16, seed = 11, withNulls = true)
    val got = df.select(col("vec_id"),
        SimilaritySearch.srpBandKeys(col("embedding"), 16, 4, 8).as("bk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    val want = df.select(col("vec_id"),
        refBandKeys(col("embedding"), 16, 4, 8).as("bk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(got === want)
  }

  test("PQ encode kernel matches the array_min-over-structs reference") {
    val dim = 32
    val df = randomVecs(300, dim, seed = 13)
    // codebook trained on the data itself (m=4 subspaces, k=8)
    val cb = SimilaritySearch.pqTrainKMeans(df, "vec_id", "embedding",
      m = 4, k = 8)
    val got = SimilaritySearch.pqEncode(df, "embedding", cb)
      .select(col("vec_id"), col("codes"), col("recon_err"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[Int](1), r.getDouble(2))).toMap
    val want = SimilaritySearch.pqEncodeReference(df, "embedding", cb)
      .select(col("vec_id"), col("codes"), col("recon_err"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[Int](1), r.getDouble(2))).toMap
    assert(got.keySet === want.keySet)
    for ((id, (codes, err)) <- want) {
      assert(got(id)._1 === codes, s"codes id=$id")
      assert(java.lang.Double.doubleToLongBits(got(id)._2) ==
        java.lang.Double.doubleToLongBits(err), s"err id=$id")
    }
  }

  test("null embedding array produces (band, 0) keys, not a dropped row") {
    // the old per-bit when() lowered a null dot product to bit 0 —
    // a null embedding must not vanish from candidate generation
    import spark.implicits._
    val df = Seq((0L, Some(Seq(1.0f, -2.0f))), (1L, None))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val out = df.select(col("vec_id"),
        SimilaritySearch.srpBandKeys(col("embedding"), 2, 3, 4).as("bk"))
      .collect().sortBy(_.getLong(0))
    assert(!out(1).isNullAt(1))
    val rows = out(1).getSeq[org.apache.spark.sql.Row](1)
    assert(rows.map(r => (r.getInt(0), r.getLong(1))) ===
      Seq((0, 0L), (1, 0L), (2, 0L)))
  }

  test("PQ encode emits real code ids for a non-dense codebook") {
    import spark.implicits._
    val cb: SimilaritySearch.PqCodebook = Seq(
      (0, 0, Seq(0.0f, 0.0f)), (0, 2, Seq(5.0f, 5.0f)), (0, 3, Seq(9.0f, 9.0f)))
    val df = Seq((0L, Seq(5.1f, 4.9f)), (1L, Seq(8.7f, 9.4f)), (2L, Seq(0.2f, -0.1f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val got = SimilaritySearch.pqEncode(df, "embedding", cb)
      .select("vec_id", "codes").orderBy("vec_id").collect()
    assert(got(0).getSeq[Int](1) === Seq(2)) // the cid, not position 1
    assert(got(1).getSeq[Int](1) === Seq(3))
    assert(got(2).getSeq[Int](1) === Seq(0))
    // and it still matches the reference exactly
    val want = SimilaritySearch.pqEncodeReference(df, "embedding", cb)
      .select("vec_id", "codes").orderBy("vec_id").collect()
    assert(got.map(_.getSeq[Int](1)) === want.map(_.getSeq[Int](1)))
  }

  test("PQ encode on a non-finite embedding returns a row, not a crash") {
    import spark.implicits._
    val cb: SimilaritySearch.PqCodebook = Seq(
      (0, 0, Seq(0.0f, 0.0f)), (0, 1, Seq(5.0f, 5.0f)))
    val df = Seq(
      (0L, Seq(Float.NaN, 1.0f)),                    // all dists NaN
      (1L, Seq(Float.PositiveInfinity, 0.0f)),       // all dists Inf
      (2L, Seq(4.9f, 5.2f)))                         // finite control
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val got = SimilaritySearch.pqEncode(df, "embedding", cb)
      .select("vec_id", "codes", "recon_err").orderBy("vec_id").collect()
    // all-NaN dists tie -> smallest cid (Spark total order: NaN == NaN)
    assert(got(0).getSeq[Int](1) === Seq(0))
    assert(got(0).getDouble(2).isNaN)
    // Inf dists: both Inf -> tie -> cid 0; err NaN-class (non-finite)
    assert(got(1).getSeq[Int](1) === Seq(0))
    assert(!java.lang.Double.isFinite(got(1).getDouble(2)))
    assert(got(2).getSeq[Int](1) === Seq(1))
    assert(java.lang.Double.isFinite(got(2).getDouble(2)))
  }

  test("PQ encode ties break to the smaller code id") {
    import spark.implicits._
    // two identical centroids in one subspace force an exact tie
    val cb: SimilaritySearch.PqCodebook = Seq(
      (0, 0, Seq(1.0f, 1.0f)), (0, 1, Seq(1.0f, 1.0f)), (0, 2, Seq(9.0f, 9.0f)))
    val df = Seq((0L, Seq(1.0f, 1.0f)), (1L, Seq(8.5f, 9.2f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val got = SimilaritySearch.pqEncode(df, "embedding", cb)
      .select("vec_id", "codes").orderBy("vec_id").collect()
    assert(got(0).getSeq[Int](1) === Seq(0)) // tie -> code 0, not 1
    assert(got(1).getSeq[Int](1) === Seq(2))
  }
}
