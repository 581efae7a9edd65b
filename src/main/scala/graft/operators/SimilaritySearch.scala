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
  def normOf(v: Seq[Float]): Double =
    math.sqrt(v.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))

  // ------------------------------------------- hyperplane (SRP) LSH

  /** Signed-random-projection bit j of an embedding: the sign of the
    * dot product with a deterministic ±1 hyperplane. The hyperplane's
    * signs come from the integer universal-hash family (parity of
    * h_j(i)), so Spark and a SQL oracle derive byte-identical planes
    * with no float RNG; the fold accumulates left-to-right in double,
    * matching `list_sum` order in DuckDB. P(bits agree) = 1 − θ/π —
    * the cosine analog of MinHash (Charikar'02 SimHash; the reference
    * has no embedding LSH, its dedup is text-only). */
  def srpBit(embCol: Column, j: Int, dim: Int): Column = {
    import graft.functions.TextFunctions.{uhashA, uhashB, UHASH_P}
    val terms = transform(sequence(lit(0), lit(dim - 1)), i => {
      val parity = (lit(uhashA(j)) * (i + 1) + lit(uhashB(j))) % lit(UHASH_P) % 2
      (lit(1) - lit(2) * parity).cast("double") * element_at(embCol, i + 1).cast("double")
    })
    when(aggregate(terms, lit(0.0), (acc, x) => acc + x) > 0.0, 1L).otherwise(0L)
  }

  /** Array of (band, key) structs over `nBands` bands of
    * `bitsPerBand` SRP bits — vectors sharing any band key become
    * near-dup candidates. Signature computation is a pure projection
    * (O(nBits·dim) per row, zero shuffle); only (id, band, key) pairs
    * enter the candidate join, never the embeddings. Since r11 the
    * whole signature is ONE codegen'd kernel pass
    * ([[graft.functions.SrpBandKeysExpr]]; the ±1 planes precomputed
    * driver-side from the same universal-hash parity) — bit-identical
    * to the per-bit [[srpBit]] composition, which VectorKernelsSpec
    * keeps as the pinned reference. */
  def srpBandKeys(embCol: Column, dim: Int, nBands: Int, bitsPerBand: Int): Column = {
    val kernel = org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.SrpBandKeysExpr(
        org.apache.spark.sql.graftbridge.Bridge.expression(embCol),
        graft.functions.VectorKernels.srpSigns(dim, nBands, bitsPerBand),
        nBands, bitsPerBand))
    // a NULL embedding must still produce (band, 0) keys — the old
    // per-bit when() lowered the null dot product to bit 0, and
    // downstream explode() must not silently drop the row
    coalesce(kernel, array((0 until nBands).map(b =>
      struct(lit(b).as("band"), lit(0L).as("bkey"))): _*))
  }

  // ------------------------------------------- product quantization

  /** PQ codebook: entries (subspace m, code k, centroid subvector).
    * m·k·subDim floats — always broadcastable (inlined as literals). */
  type PqCodebook = Seq[(Int, Int, Seq[Float])]

  /** Deterministic PQ "training" twin of [[trainTakeFirst]]: subspace
    * m's codebook = the m-th subvector slices of rows id < k —
    * reproducible in a SQL oracle. Quality path: [[pqTrainKMeans]].
    * Codes are the DENSE rank of the seed row (0..n-1 in id order),
    * not the raw id: [[pqAdcTopK]] indexes its lookup table
    * positionally, so non-contiguous ids (a filtered frame) must not
    * leak into the code space. On a dense 0-based id column rank==id,
    * which is what the SQL oracle reproduces. */
  def pqTrainTakeFirst(df: DataFrame, idCol: String, embCol: String,
                       m: Int, k: Int): PqCodebook = {
    val rows = trainTakeFirst(df, idCol, embCol, k)
    val dim = rows.head._2.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    for (((_, v), rank) <- rows.zipWithIndex; mi <- 0 until m)
      yield (mi, rank, v.slice(mi * sub, (mi + 1) * sub))
  }

  /** Per-subspace plain-L2 Lloyd k-means on a deterministic driver
    * sample (PQ quantizes raw subvectors, so unlike the spherical
    * [[trainKMeans]] there is no normalization). Sample and codebook
    * are tiny regardless of table size. */
  def pqTrainKMeans(df: DataFrame, idCol: String, embCol: String,
                    m: Int, k: Int, sampleN: Int = 2048,
                    iters: Int = 10): PqCodebook = {
    val sample: Array[Array[Double]] = df
      .select(col(idCol), col(embCol)).orderBy(col(idCol)).limit(sampleN)
      .collect().map(_.getSeq[Float](1).toArray.map(_.toDouble))
    require(sample.nonEmpty, "empty training sample")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    (0 until m).flatMap { mi =>
      val pts = sample.map(v => v.slice(mi * sub, (mi + 1) * sub))
      val seeds = scala.collection.mutable.ArrayBuffer[Array[Double]]()
      var i = 0
      while (seeds.length < k && i < pts.length) {
        if (!seeds.exists(s => s.sameElements(pts(i)))) seeds += pts(i).clone()
        i += 1
      }
      var cents = seeds.toArray
      for (_ <- 0 until iters) {
        val sums = Array.fill(cents.length)(new Array[Double](sub))
        val counts = new Array[Long](cents.length)
        pts.foreach { v =>
          var best = 0; var bestD = Double.MaxValue
          for (c <- cents.indices) {
            var dd = 0.0; var d = 0
            while (d < sub) { val t = v(d) - cents(c)(d); dd += t * t; d += 1 }
            if (dd < bestD) { bestD = dd; best = c }
          }
          var d = 0
          while (d < sub) { sums(best)(d) += v(d); d += 1 }
          counts(best) += 1
        }
        cents = cents.indices.map { c =>
          if (counts(c) == 0) cents(c)
          else sums(c).map(_ / counts(c))
        }.toArray
      }
      cents.zipWithIndex.map { case (c, cid) =>
        (mi, cid, c.map(_.toFloat).toSeq) }
    }
  }

  /** Squared L2 distance of subspace `mi`'s slice vs a literal
    * centroid subvector — left-to-right double fold (`list_sum`
    * order parity for the SQL oracle). */
  private def pqSubDist(embCol: Column, mi: Int, subDim: Int,
                        c: Seq[Float]): Column = {
    val terms = transform(sequence(lit(0), lit(subDim - 1)), i => {
      val d = element_at(embCol, lit(mi * subDim) + i + 1).cast("double") -
        typedlit(c.map(_.toDouble)).getItem(i)
      d * d
    })
    aggregate(terms, lit(0.0), (acc, x) => acc + x)
  }

  /** PQ-encode: per subspace, the argmin-code over the codebook —
    * deterministic (dist, code) tie-break, pure projection, zero
    * shuffle. Adds `codes` (array<int>, one code per subspace, m·log2(k)
    * bits of storage per vector) and `reconErrCol` (exact-decimal sum
    * of the chosen subspace distances, √). */
  def pqEncode(df: DataFrame, embCol: String, codebook: PqCodebook,
               codesCol: String = "codes",
               reconErrCol: String = "recon_err"): DataFrame = {
    // Since r11 the whole encode (m x k x subDim distance folds,
    // lexicographic argmin, DECIMAL(28,10)-exact error chain) is ONE
    // codegen'd kernel pass ([[graft.functions.PqEncodeExpr]]) —
    // bit-identical to the array_min-over-structs composition, which
    // VectorKernelsSpec keeps as the pinned reference (built from
    // [[pqSubDist]]).
    val m = codebook.map(_._1).max + 1
    val sorted = (0 until m).map(mi => codebook.filter(_._1 == mi).sortBy(_._2))
    val cents: Array[Array[Array[Double]]] =
      sorted.map(_.map(_._3.map(_.toDouble).toArray).toArray).toArray
    // real code ids, positionally parallel to cents — a hand-built
    // non-dense codebook (cids 0,2,3) must emit 0/2/3, not 0/1/2
    val cids: Array[Array[Int]] = sorted.map(_.map(_._2).toArray).toArray
    val tmp = s"__pq_$codesCol"
    df.withColumn(tmp, org.apache.spark.sql.graftbridge.Bridge.column(
        graft.functions.PqEncodeExpr(
          org.apache.spark.sql.graftbridge.Bridge.expression(col(embCol)),
          cents, cids)))
      .withColumn(codesCol, col(tmp).getField("codes"))
      .withColumn(reconErrCol, col(tmp).getField("recon_err"))
      .drop(tmp)
  }

  /** The pre-r11 interpreted encode — kept as the spec's pinned
    * reference implementation (VectorKernelsSpec asserts the kernel
    * path is bit-identical). */
  private[graft] def pqEncodeReference(df: DataFrame, embCol: String,
      codebook: PqCodebook, codesCol: String = "codes",
      reconErrCol: String = "recon_err"): DataFrame = {
    val m = codebook.map(_._1).max + 1
    val subDim = codebook.head._3.length
    val mins = (0 until m).map { mi =>
      val entries = codebook.filter(_._1 == mi).sortBy(_._2).map { case (_, cid, c) =>
        struct(pqSubDist(col(embCol), mi, subDim, c).as("dist"), lit(cid).as("k"))
      }
      array_min(array(entries: _*))
    }
    // DECIMAL(28,10), not (38,10): Spark's add widens precision by 1
    // per term and at p=38 the cap forces a SCALE reduction instead
    // (a 4-term chain silently came out scale 7) — 28 leaves headroom
    // so the sum stays exact at scale 10, matching the oracle's
    // SUM(CAST(dist AS DECIMAL(28,10)))
    val err = sqrt(mins.map(_.getField("dist").cast("decimal(28,10)"))
      .reduce(_ + _).cast("double"))
    df.withColumn(codesCol, array(mins.map(_.getField("k")): _*))
      .withColumn(reconErrCol, err)
  }

  /** ADC (asymmetric distance) top-k: per query, a literal
    * lookup table LUT[mi][code] = ‖q_mi − c_mi,code‖² — the scan reads
    * ONLY the codes column (the compressed search that makes PQ the
    * memory-bound ANN path at scale: m bytes per vector instead of
    * 4·dim). Returns (qid, vec_id, adc_dist) top-k per query.
    * Plans one scan + TakeOrdered PER query — right for a handful of
    * literal queries; past ~a dozen use [[pqAdcTopKBatch]], which
    * answers every query in one scan. */
  /** The ADC LUTs are indexed positionally by stored code, so every
    * subspace's code ids must be exactly 0..k-1 (both train paths
    * emit dense codes; a hand-built codebook might not). Shared by
    * every ADC entry point — the validation and the LUT fold must
    * stay bit-identical across them or Spark/oracle parity breaks. */
  private def requireDenseCodes(fn: String, codebook: PqCodebook): Unit = {
    val m = codebook.map(_._1).max + 1
    for (mi <- 0 until m) {
      val cids = codebook.filter(_._1 == mi).map(_._2).sorted
      require(cids == (0 until cids.length),
        s"$fn: subspace $mi codes must be dense 0..k-1, got $cids")
    }
  }

  /** One query's asymmetric distance over `codesCol`: sum over
    * subspaces of LUT[mi][code], LUT entries accumulated in the
    * in-order double fold the SQL oracle mirrors. */
  private def adcDistColumn(codesCol: String, qv: Seq[Float],
      codebook: PqCodebook): Column = {
    val m = codebook.map(_._1).max + 1
    val subDim = codebook.head._3.length
    (0 until m).map { mi =>
      val lut = codebook.filter(_._1 == mi).sortBy(_._2).map { case (_, _, c) =>
        c.indices.foldLeft(0.0) { (acc, i) =>
          val d = qv(mi * subDim + i).toDouble - c(i).toDouble; acc + d * d }
      }
      typedlit(lut).getItem(element_at(col(codesCol), mi + 1))
    }.reduce(_ + _)
  }

  def pqAdcTopK(encoded: DataFrame, idCol: String, codesCol: String,
                queries: Seq[(Long, Seq[Float])], codebook: PqCodebook,
                kTop: Int): DataFrame = {
    requireDenseCodes("pqAdcTopK", codebook)
    val perQuery = queries.map { case (qid, qv) =>
      encoded.select(lit(qid).as("qid"), col(idCol),
          adcDistColumn(codesCol, qv, codebook).as("adc_dist"))
        .orderBy(col("adc_dist").asc, col(idCol).asc).limit(kTop)
    }
    perQuery.reduce(_ unionAll _)
  }

  /** Batch-query ADC top-k: ONE scan of `encoded` for ALL queries.
    * Every query's LUT is inlined into a single literal struct array
    * that the scan explodes, and the per-query top-k is a
    * `row_number <= k` window that Spark rewrites via WindowGroupLimit
    * into a partial per-partition limit BEFORE the shuffle — each map
    * task forwards at most queries·k rows, so the exchange carries
    * O(partitions·queries·k), never O(n·queries). Results equal
    * [[pqAdcTopK]] row-for-row (spec-asserted); prefer this form past
    * ~a dozen queries. */
  def pqAdcTopKBatch(encoded: DataFrame, idCol: String, codesCol: String,
                     queries: Seq[(Long, Seq[Float])], codebook: PqCodebook,
                     kTop: Int): DataFrame = {
    requireDenseCodes("pqAdcTopKBatch", codebook)
    val qd = queries.map { case (qid, qv) =>
      struct(lit(qid).as("qid"),
        adcDistColumn(codesCol, qv, codebook).as("adc_dist"))
    }
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adc_dist").asc, col(idCol).asc)
    encoded.select(col(idCol), explode(array(qd: _*)).as("__qd"))
      .select(col("__qd.qid").as("qid"), col(idCol), col("__qd.adc_dist").as("adc_dist"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= kTop).drop("__rn")
  }

  /** Driver-side multi-probe cell selection for a single query vector
    * — the same cosine distance and (dist, cid) tie-break as
    * [[assignCellsProbe]]'s Column form, accumulated in the identical
    * in-order double sum so the probed cells bit-match the oracle. */
  private[graft] def probeCells(qv: Seq[Float],
      centroids: Seq[(Int, Seq[Float])], nProbe: Int): Seq[Int] = {
    val qn = normOf(qv)
    centroids.map { case (cid, c) =>
      val denom = qn * normOf(c)
      val d = if (denom == 0.0) 1.0 else {
        var acc = 0.0
        var i = 0
        val n = math.min(qv.length, c.length)
        while (i < n) { acc += qv(i).toDouble * c(i).toDouble; i += 1 }
        1.0 - acc / denom
      }
      (d, cid)
    }.sortBy(identity).take(nProbe).map(_._2)
  }

  /** IVF-PQ search — the full composed ANN index (FAISS's IVFPQ
    * shape): an IVF coarse quantizer prunes the candidate set to each
    * query's `nProbe` nearest cells, and the surviving candidates are
    * ranked by PQ asymmetric distance over their m-byte codes. ONE
    * scan answers every query: the per-query (probed cells, LUT)
    * pairs are inlined as a literal struct array the scan explodes;
    * non-probed (query, point) pairs are filtered before the window,
    * and WindowGroupLimit keeps the exchange at
    * O(partitions·queries·k). At 100 TB this is the memory-bound ANN
    * path: the scan reads (cell, codes) — a few bytes per vector —
    * and the cell filter drops (nCells - nProbe)/nCells of the work
    * a flat PQ scan would do. */
  def ivfPqTopK(encoded: DataFrame, idCol: String, codesCol: String,
                cellCol: String, queries: Seq[(Long, Seq[Float])],
                centroids: Seq[(Int, Seq[Float])], nProbe: Int,
                codebook: PqCodebook, kTop: Int): DataFrame = {
    requireDenseCodes("ivfPqTopK", codebook)
    val qd = queries.map { case (qid, qv) =>
      struct(lit(qid).as("qid"),
        typedlit(probeCells(qv, centroids, nProbe)).as("cells"),
        adcDistColumn(codesCol, qv, codebook).as("adc_dist"))
    }
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adc_dist").asc, col(idCol).asc)
    encoded.select(col(idCol), col(cellCol), explode(array(qd: _*)).as("__qd"))
      .where(array_contains(col("__qd.cells"), col(cellCol)))
      .select(col("__qd.qid").as("qid"), col(idCol),
        col(cellCol).as("cell"), col("__qd.adc_dist").as("adc_dist"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= kTop).drop("__rn")
  }

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
    * centroids (collected to the driver — always tiny). Kept because
    * its centroids are reproducible in a SQL oracle; the quality
    * quantizer is [[trainKMeans]]. */
  def trainTakeFirst(df: DataFrame, idCol: String, embCol: String,
                     nCells: Int): Seq[(Int, Seq[Float])] =
    df.where(col(idCol) < nCells)
      .select(col(idCol).cast("int"), col(embCol))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
      .sortBy(_._1)
      .toSeq

  /** Sampled spherical k-means quantizer (Lloyd iterations on a
    * deterministic sample, driver-side — the sample and the quantizer
    * are tiny regardless of table size; at 100 TB the sample is a
    * TakeOrdered over the id column, not a scan-order dependent take).
    * Vectors are L2-normalized for training so the learned cells match
    * the cosine assignment metric of [[assignCells]]. Deterministic:
    * fixed sample, fixed seeds (first k distinct sample vectors),
    * fixed iteration count. */
  def trainKMeans(df: DataFrame, idCol: String, embCol: String, nCells: Int,
                  sampleN: Int = 2048, iters: Int = 10): Seq[(Int, Seq[Float])] = {
    val sample: Array[Array[Double]] = df
      .select(col(idCol), col(embCol)).orderBy(col(idCol)).limit(sampleN)
      .collect().map { r =>
        val v = r.getSeq[Float](1).toArray.map(_.toDouble)
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n == 0.0) v else v.map(_ / n)
      }
    require(sample.nonEmpty, "empty training sample")
    val dim = sample.head.length
    // seeds: first nCells pairwise-distinct sample vectors
    val seeds = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    var i = 0
    while (seeds.length < nCells && i < sample.length) {
      if (!seeds.exists(s => s.sameElements(sample(i)))) seeds += sample(i).clone()
      i += 1
    }
    var centroids = seeds.toArray
    for (_ <- 0 until iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Long](centroids.length)
      sample.foreach { v =>
        var best = 0; var bestDot = Double.NegativeInfinity
        for (c <- centroids.indices) {
          var dot = 0.0; var d = 0
          while (d < dim) { dot += v(d) * centroids(c)(d); d += 1 }
          if (dot > bestDot) { bestDot = dot; best = c }
        }
        var d = 0
        while (d < dim) { sums(best)(d) += v(d); d += 1 }
        counts(best) += 1
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c) // keep empty cells stable
        else {
          val m = sums(c).map(_ / counts(c))
          val n = math.sqrt(m.map(x => x * x).sum)
          if (n == 0.0) m else m.map(_ / n)
        }
      }.toArray
    }
    centroids.zipWithIndex.map { case (c, cid) => (cid, c.map(_.toFloat).toSeq) }.toSeq
  }

  /** nProbe nearest cells per row (ascending cosine distance) — for
    * query-side multi-cell probing. Pure projection, zero shuffle. */
  def assignCellsProbe(df: DataFrame, embCol: String,
                       centroids: Seq[(Int, Seq[Float])], nProbe: Int,
                       cellsCol: String = "cells"): DataFrame = {
    val entries = centroids.map { case (cid, v) =>
      struct(centroidDist(col(embCol), v).as("dist"), lit(cid).as("cid"))
    }
    df.withColumn(cellsCol,
      transform(slice(array_sort(array(entries: _*)), 1, nProbe), _.getField("cid")))
  }

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

  /** Multi-probe IVF top-k: each query searches its `nProbe` nearest
    * cells (recall knob). Points keep their single primary cell; the
    * query side explodes its probe list, so the join still shuffles by
    * cell only and a neighbor can match a query at most once. */
  def ivfTopKProbe(points: DataFrame, queryIds: Seq[Long], idCol: String,
                   embCol: String, cellCol: String,
                   centroids: Seq[(Int, Seq[Float])], nProbe: Int,
                   k: Int): DataFrame = {
    val pts = points.select(col(idCol).as("nbr_id"), col(embCol).as("emb"),
      col(cellCol).as("cell"), fnorm(col(embCol)).as("nrm"))
    val qs = assignCellsProbe(
        points.where(col(idCol).isin(queryIds: _*)), embCol, centroids, nProbe)
      .select(col(idCol).as("query_id"), col(embCol).as("q_emb"),
        explode(col("cells")).as("q_cell"), fnorm(col(embCol)).as("q_nrm"))
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

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster-blocked near-duplicate removal over an
    * embedding column. Every vector is assigned to its nearest coarse
    * centroid (a zero-shuffle projection, see [[assignCells]]); inside
    * each cluster, a vector is a duplicate when its cosine to ANY
    * lower-id vector of the same cluster is >= `tau`. The rule is
    * TRANSITIVE along similarity chains (A~B and B~C drops both B and
    * C even when cos(A,C) < tau) — i.e. roughly one survivor per
    * connected similarity component, like [[DedupResolve.keepList]],
    * slightly more aggressive than a strict greedy keep-first sweep
    * that re-compares only against survivors. Order-deterministic and
    * oracle-checkable with no iterative components pass. `dup_of` is
    * the smallest matching lower id and can itself be a dropped row
    * mid-chain (provenance, not the survivor; the survivor is the
    * component's minimum, reachable by following dup_of).
    *
    * Scale shape: the pairwise step is blocked by cluster — cost is
    * sum(n_c^2) over cluster sizes, never corpus-wide. The SemDeDup
    * design point is k chosen so clusters stay small (the paper runs
    * ~11k clusters for 100M docs); at 100 TB the assignment stays a
    * projection and the candidate join shuffles on the cluster id
    * only. The duplicate rule is a single self-join + groupBy — two
    * shuffles total, both keyed on cluster/id.
    *
    * Returns one row per input id: (idCol, cellCol, dup_of, is_dup)
    * where dup_of is the smallest same-cluster id with cos >= tau
    * (null for kept rows) and is_dup is 0/1. */
  def semDedup(df: DataFrame, idCol: String, embCol: String,
               centroids: Seq[(Int, Seq[Float])], tau: Double,
               cellCol: String = "cell"): DataFrame = {
    val assigned = assignCells(df, embCol, centroids, cellCol)
      .select(col(idCol), col(cellCol), col(embCol),
        fnorm(col(embCol)).as("__nrm"))
    val a = assigned.select(col(idCol).as("__id_a"),
      col(cellCol).as("__cell_a"), col(embCol).as("__emb_a"),
      col("__nrm").as("__nrm_a"))
    val b = assigned.select(col(idCol).as("__id_b"),
      col(cellCol).as("__cell_b"), col(embCol).as("__emb_b"),
      col("__nrm").as("__nrm_b"))
    val denom = col("__nrm_a") * col("__nrm_b")
    val cos = when(denom === 0.0, lit(0.0))
      .otherwise(fdot(col("__emb_a"), col("__emb_b")) / denom)
    val dups = a.join(b,
        col("__cell_a") === col("__cell_b") && col("__id_a") < col("__id_b"))
      .where(cos >= tau)
      .groupBy(col("__id_b").as(idCol))
      .agg(min(col("__id_a")).as("dup_of"))
    assigned.select(col(idCol), col(cellCol))
      .join(dups, Seq(idCol), "left")
      .select(col(idCol), col(cellCol), col("dup_of"),
        when(col("dup_of").isNotNull, 1L).otherwise(0L).as("is_dup"))
  }
}
