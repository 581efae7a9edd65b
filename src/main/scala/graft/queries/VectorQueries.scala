package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VxFunctions
import Q._

/** Embedding / array-column battery: list arithmetic (reference:
  * core/functions.py:110 list_sum, :2741 dot_product) and the
  * similarity-search baseline (brute-force cosine top-k) over the
  * `embeddings` table (64-dim float vectors).
  *
  * All vector math is `zip_with`/`aggregate` Column compositions —
  * codegen-friendly, no UDFs, no driver collection. The anchor row for
  * top-k is a 1-row broadcast join (scales to any table size).
  */
object VectorQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // per-label array statistics
    "q_array_stats" -> ((s, dir) => {
      val e = col("embedding")
      t(s, dir, "embeddings")
        .groupBy(col("label"))
        .agg(
          count(lit(1)).as("n"),
          max(size(e)).as("dim"),
          r(dsumD(VxFunctions.listSum(e)), 4).as("sum_elems"),
          r(dsumD(VxFunctions.l2Norm(e)), 4).as("sum_norm"),
          r(dsumD(element_at(e, 1).cast("double")), 6).as("sum_first")
        )
        .orderBy("label")
    }),

    // element-wise array transform + predicate
    "q_array_transform" -> ((s, dir) => {
      val e = col("embedding")
      t(s, dir, "embeddings").select(
        col("vec_id"),
        size(e).as("dim"),
        r(VxFunctions.listSum(transform(e, x => abs(x.cast("double")))), 6).as("l1"),
        size(filter(e, x => x > 0.0f)).as("n_pos"),
        r(aggregate(e, lit(Double.NegativeInfinity), (acc, x) => greatest(acc, x.cast("double"))), 6).as("maxval")
      ).orderBy("vec_id")
    }),

    // brute-force cosine top-k against one anchor vector — the exact
    // baseline for ANN (SURVEY M8); anchor is a 1-row cross join that
    // Spark broadcasts, the scan stays fully parallel. Dot product is
    // the codegen'd FloatVectorDot kernel, not an interpreted HOF.
    "q_similarity_topk" -> ((s, dir) => {
      import graft.functions.VectorExpressions.{fdot, fnorm}
      val emb = t(s, dir, "embeddings")
      val anchor = emb.where(col("vec_id") === 0)
        .select(col("embedding").as("anchor_emb"))
      val denom = fnorm(col("embedding")) * fnorm(col("anchor_emb"))
      emb.where(col("vec_id") =!= 0)
        .crossJoin(broadcast(anchor))
        .select(col("vec_id"), col("label"),
          r(when(denom === 0.0, lit(0.0))
            .otherwise(fdot(col("embedding"), col("anchor_emb")) / denom), 8).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
    }),

    // embedding-based near-duplicate candidates within one label:
    // self-join bounded by label blocking (the scale path buckets by
    // LSH instead; see graft.operators.Dedup). Norms are computed ONCE
    // per row before the join (O(n·d)), so each candidate pair costs a
    // single codegen'd dot product (O(d)) — not 3 interpreted folds.
    "q_embed_neardup" -> ((s, dir) => {
      import graft.functions.VectorExpressions.{fdot, fnorm}
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"), col("embedding"),
          fnorm(col("embedding")).as("nrm"))
      val a = emb.select(col("vec_id").as("id_a"), col("label"),
        col("embedding").as("emb_a"), col("nrm").as("nrm_a"))
      val b = emb.select(col("vec_id").as("id_b"), col("label").as("label_b"),
        col("embedding").as("emb_b"), col("nrm").as("nrm_b"))
      val denom = col("nrm_a") * col("nrm_b")
      a.join(b, col("label") === col("label_b") && col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("label"),
          r(when(denom === 0.0, lit(0.0))
            .otherwise(fdot(col("emb_a"), col("emb_b")) / denom), 8).as("cos"))
        .where(col("cos") > 0.9)
        .orderBy("id_a", "id_b")
    }),

    // hyperplane (SRP/SimHash-for-cosine) LSH near-dup — the BUCKETED
    // scale path that replaces q_embed_neardup's labeled-quadratic
    // self-join: 32 signed-random-projection bits from deterministic
    // ±1 hyperplanes (integer universal-hash parity — both engines
    // derive identical planes), 4 bands × 8 bits, candidates = pairs
    // sharing any band key, then exact cosine verify. The synthetic
    // corpus has no natural near-dups (max pairwise cos 0.51), so
    // every 5th vector gets a deterministically perturbed copy
    // (elementwise (1 + 0.002·((2i) mod 5)) — cos ≈ 0.9999) that the
    // banding must recover. Signatures are a projection; only
    // (id, band, key) rows shuffle into the candidate join.
    "q_embed_lsh" -> ((s, dir) => {
      import graft.functions.VectorExpressions.{fdot, fnorm}
      import graft.operators.SimilaritySearch.srpBandKeys
      val base = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val dup = base.where(col("vec_id") % 5 === 0).select(
        (col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x.cast("double") * (lit(1.0) +
            lit(0.002) * ((i * 7) % 5).cast("double"))).cast("float")).as("embedding"))
      val aug = base.unionAll(dup)
      val bands = aug.select(col("vec_id"),
          explode(srpBandKeys(col("embedding"), 64, nBands = 4, bitsPerBand = 8)).as("bk"))
        .select(col("vec_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b")).distinct()
      val ea = aug.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"),
        fnorm(col("embedding")).as("nrm_a"))
      val eb = aug.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"),
        fnorm(col("embedding")).as("nrm_b"))
      val denom = col("nrm_a") * col("nrm_b")
      cand.join(ea, "id_a").join(eb, "id_b")
        .select(col("id_a"), col("id_b"),
          r(when(denom === 0.0, lit(0.0))
            .otherwise(fdot(col("emb_a"), col("emb_b")) / denom), 8).as("cos"))
        .where(col("cos") > 0.99)
        .orderBy("id_a", "id_b")
    }),

    // SemDeDup (Abbas et al. 2023) semantic dedup: coarse k-cell
    // clustering blocks the pairwise cosine step (cost sum(n_c^2),
    // never corpus-wide), then every vector with a lower-id same-cell
    // neighbor at cos >= 0.99 is dropped (transitive along chains —
    // one survivor per similarity component). Reuses
    // q_embed_lsh's injected near-dup copies (the corpus has no
    // natural pairs above 0.51) and the deterministic take-first
    // centroids, so the whole pipeline — assignment argmin, pairwise
    // cosine, greedy resolution — is reproducible in SQL.
    "q_semdedup" -> ((s, dir) => {
      import graft.operators.SimilaritySearch
      val base = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val dup = base.where(col("vec_id") % 5 === 0).select(
        (col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x.cast("double") * (lit(1.0) +
            lit(0.002) * ((i * 7) % 5).cast("double"))).cast("float")).as("embedding"))
      val aug = base.unionAll(dup)
      val cents = SimilaritySearch.trainTakeFirst(base, "vec_id", "embedding", 8)
      SimilaritySearch.semDedup(aug, "vec_id", "embedding", cents, tau = 0.99)
        .orderBy("vec_id")
    }),

    // Hard-negative mining for contrastive training (the in-batch /
    // cross-batch negatives step of embedding-model pipelines, e.g.
    // DPR Karpukhin et al. 2020): for each anchor, the top-2 most
    // cosine-similar vectors with a DIFFERENT label. Anchors are a
    // small broadcast set; candidates stream through the codegen'd
    // FloatVectorDot kernel; WindowGroupLimit bounds the per-anchor
    // exchange to k rows per partition. At scale the brute-force
    // candidate side swaps for the IVF/PQ index — same downstream
    // shape.
    "q_hard_negatives" -> ((s, dir) => {
      import graft.functions.VectorExpressions._
      import org.apache.spark.sql.expressions.Window
      val emb = t(s, dir, "embeddings")
      val qs = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("anchor_id"), col("label").as("a_label"),
          col("embedding").as("a_emb"), fnorm(col("embedding")).as("a_nrm"))
      val pts = emb.select(col("vec_id").as("neg_id"),
        col("label").as("n_label"), col("embedding").as("emb"),
        fnorm(col("embedding")).as("nrm"))
      val denom = col("a_nrm") * col("nrm")
      val scored = pts.crossJoin(broadcast(qs))
        .where(col("n_label") =!= col("a_label"))
        .select(col("anchor_id"), col("a_label"), col("neg_id"),
          col("n_label"),
          when(denom === 0.0, lit(0.0))
            .otherwise(fdot(col("a_emb"), col("emb")) / denom).as("cos"))
      scored.withColumn("rk", row_number().over(
          Window.partitionBy("anchor_id").orderBy(col("cos").desc, col("neg_id")))
          .cast("long"))
        .where(col("rk") <= 2)
        .select(col("anchor_id"), col("a_label"), col("rk"), col("neg_id"),
          col("n_label"), r(col("cos"), 8).as("cos"))
        .orderBy("anchor_id", "rk")
    }),

    // product quantization (the 16-64x ANN compressor beyond int8's
    // 4x): 64 dims -> 4 subspaces x 8-entry codebooks = 4 codes
    // (12 bits) per vector. Deterministic take-first codebook for
    // oracle parity (the quality path is pqTrainKMeans + the ADC
    // recall spec); encoding is argmin per subspace with (dist, code)
    // tie-break — a pure projection over inlined literals, zero
    // shuffle. recon_err sums subspace distances in DECIMAL(38,10)
    // (4-term double addition order would differ between engines).
    "q_pq_encode" -> ((s, dir) => {
      import graft.operators.SimilaritySearch
      val emb = t(s, dir, "embeddings")
      val cb = SimilaritySearch.pqTrainTakeFirst(emb, "vec_id", "embedding",
        m = 4, k = 8)
      SimilaritySearch.pqEncode(emb, "embedding", cb)
        .select(col("vec_id"),
          element_at(col("codes"), 1).as("code0"),
          element_at(col("codes"), 2).as("code1"),
          element_at(col("codes"), 3).as("code2"),
          element_at(col("codes"), 4).as("code3"),
          r(col("recon_err"), 6).as("recon_err"))
        .orderBy("vec_id")
    }),

    // batch ADC search over PQ codes — the many-query compressed-ANN
    // form: ONE scan of the codes column answers all 5 queries (each
    // query's LUT is an inlined literal; WindowGroupLimit caps every
    // map task at queries*k rows before the shuffle). The oracle
    // rebuilds codes, LUTs and the 4-term left-to-right distance sum,
    // then ranks per query — end-to-end ADC parity, not just the
    // encode step (q_pq_encode).
    "q_pq_adc" -> ((s, dir) => {
      import graft.operators.SimilaritySearch
      val emb = t(s, dir, "embeddings")
      val cb = SimilaritySearch.pqTrainTakeFirst(emb, "vec_id", "embedding",
        m = 4, k = 8)
      val encoded = SimilaritySearch.pqEncode(emb, "embedding", cb)
        .select(col("vec_id"), col("codes"))
      val qs = emb.where(col("vec_id").between(8, 12))
        .select(col("vec_id"), col("embedding")).collect()
        .map(row => (row.getLong(0), row.getSeq[Float](1))).sortBy(_._1).toSeq
      SimilaritySearch.pqAdcTopKBatch(encoded, "vec_id", "codes", qs, cb, kTop = 3)
        .select(col("qid"), col("vec_id"), r(col("adc_dist"), 6).as("adc_dist"))
        .orderBy("qid", "adc_dist", "vec_id")
    }),

    // symmetric int8 quantization (the 4x embedding-storage compressor
    // for ANN at scale): q = floor(x·127/max|x| + 0.5). q_sum is an
    // INTEGER bit-parity check of the codes; max_abs_err bounds the
    // reconstruction. Staged selects keep scale computed once.
    "q_embed_quantize" -> ((s, dir) => {
      import graft.functions.VxFunctions._
      val staged = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          int8Scale(col("embedding")).as("scale"))
        .select(col("vec_id"), col("embedding"), col("scale"),
          quantizeInt8(col("embedding"), col("scale")).as("q"))
      staged.select(
        col("vec_id"),
        r(col("scale"), 6).as("scale"),
        aggregate(col("q"), lit(0L), (acc, v) => acc + v.cast("long")).as("q_sum"),
        array_max(col("q")).as("q_max"),
        r(when(col("scale") === 0.0, lit(0.0)).otherwise(
          array_max(zip_with(col("embedding"), dequantizeInt8(col("q"), col("scale")),
            (x, xq) => abs(x.cast("double") - xq)))), 6).as("max_abs_err")
      ).orderBy("vec_id")
    })
  )

  // DuckDB-side vector math written as explicit fold/list comprehensions
  // so the accumulation order matches the Spark zip_with/aggregate fold.
  private def ddbDot(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
  private def ddbNorm(a: String): String = s"SQRT(${ddbDot(a, a)})"

  // SRP signature bits in SQL: identical universal-hash ±1 planes and
  // the same left-to-right double fold as SimilaritySearch.srpBit.
  private def ddbSrpBit(j: Int): String = {
    import graft.functions.TextFunctions.{uhashA, uhashB, UHASH_P}
    s"(CASE WHEN list_sum(list_transform(range(0, 64), i -> " +
      s"CAST(1 - 2 * (((${uhashA(j)} * (i + 1) + ${uhashB(j)}) % $UHASH_P) % 2) AS DOUBLE)" +
      s" * CAST(embedding[i + 1] AS DOUBLE))) > 0.0 THEN 1 ELSE 0 END)"
  }
  private def ddbSrpBandKey(b: Int, bitsPerBand: Int): String =
    (0 until bitsPerBand).map(r =>
      s"${ddbSrpBit(b * bitsPerBand + r)} * ${1L << r}").mkString("(", " + ", ")")

  val oracleSql: Map[String, String] = Map(
    "q_array_stats" ->
      s"""SELECT label, COUNT(*) AS n,
         |  MAX(LEN(embedding)) AS dim,
         |  ${sqlR(sqlDsum("list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))"), 4)} AS sum_elems,
         |  ${sqlR(sqlDsum(ddbNorm("embedding")), 4)} AS sum_norm,
         |  ${sqlR(sqlDsum("CAST(embedding[1] AS DOUBLE)"), 6)} AS sum_first
         |FROM embeddings GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_array_transform" ->
      """SELECT vec_id,
        |  LEN(embedding) AS dim,
        |  ROUND(list_sum(list_transform(embedding, x -> ABS(CAST(x AS DOUBLE)))), 6) AS l1,
        |  LEN(list_filter(embedding, x -> x > 0.0)) AS n_pos,
        |  ROUND(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS maxval
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_similarity_topk" ->
      s"""WITH anchor AS (SELECT embedding AS a FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, label,
         |  ROUND(CASE WHEN ${ddbNorm("embedding")} * ${ddbNorm("a")} = 0.0 THEN 0.0
         |    ELSE ${ddbDot("embedding", "a")} / (${ddbNorm("embedding")} * ${ddbNorm("a")}) END, 8) AS cos
         |FROM embeddings, anchor WHERE vec_id <> 0
         |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin,

    "q_embed_quantize" ->
      """WITH m AS (
        |  SELECT vec_id, embedding,
        |    CASE WHEN list_max(list_transform(embedding, x -> ABS(CAST(x AS DOUBLE)))) = 0
        |      THEN 0.0
        |      ELSE 127.0 / list_max(list_transform(embedding, x -> ABS(CAST(x AS DOUBLE)))) END AS scale
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, embedding, scale,
        |    list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * scale + 0.5) AS INT)) AS qc
        |  FROM m)
        |SELECT vec_id,
        |  ROUND(scale, 6) AS scale,
        |  CAST(list_sum(list_transform(qc, v -> CAST(v AS BIGINT))) AS BIGINT) AS q_sum,
        |  CAST(list_max(qc) AS INT) AS q_max,
        |  ROUND(CASE WHEN scale = 0 THEN 0.0
        |    ELSE list_max(list_transform(list_zip(embedding, qc),
        |      p -> ABS(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE) / scale))) END, 6) AS max_abs_err
        |FROM q ORDER BY vec_id""".stripMargin,

    "q_embed_lsh" ->
      s"""WITH aug AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 100000, list_transform(range(0, 64), i ->
         |    CAST(CAST(embedding[i + 1] AS DOUBLE)
         |      * (1.0 + 0.002 * CAST((i * 7) % 5 AS DOUBLE)) AS REAL))
         |  FROM embeddings WHERE vec_id % 5 = 0),
         |bands AS (
         |${(0 until 4).map(b =>
              s"  SELECT vec_id, $b AS band, ${ddbSrpBandKey(b, 8)} AS bkey FROM aug")
             .mkString("\n  UNION ALL\n")}),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id)
         |SELECT * FROM (
         |  SELECT c.id_a, c.id_b,
         |    ROUND(CASE WHEN ${ddbNorm("x.embedding")} * ${ddbNorm("y.embedding")} = 0.0 THEN 0.0
         |      ELSE ${ddbDot("x.embedding", "y.embedding")}
         |           / (${ddbNorm("x.embedding")} * ${ddbNorm("y.embedding")}) END, 8) AS cos
         |  FROM cand c JOIN aug x ON c.id_a = x.vec_id JOIN aug y ON c.id_b = y.vec_id)
         |WHERE cos > 0.99 ORDER BY id_a, id_b""".stripMargin,

    "q_semdedup" ->
      s"""WITH aug AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 100000, list_transform(range(0, 64), i ->
         |    CAST(CAST(embedding[i + 1] AS DOUBLE)
         |      * (1.0 + 0.002 * CAST((i * 7) % 5 AS DOUBLE)) AS REAL))
         |  FROM embeddings WHERE vec_id % 5 = 0),
         |cents AS (SELECT vec_id AS cid, embedding AS cemb FROM embeddings WHERE vec_id < 8),
         |dists AS (
         |  SELECT p.vec_id, c.cid,
         |    CASE WHEN ${ddbNorm("p.embedding")} * ${ddbNorm("c.cemb")} = 0.0 THEN 1.0
         |         ELSE 1.0 - ${ddbDot("p.embedding", "c.cemb")}
         |              / (${ddbNorm("p.embedding")} * ${ddbNorm("c.cemb")}) END AS dist
         |  FROM aug p CROSS JOIN cents c),
         |asg AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |    FROM dists) WHERE rn = 1),
         |pts AS (SELECT g.vec_id, g.embedding, a.cid, ${ddbNorm("g.embedding")} AS nrm
         |  FROM aug g JOIN asg a USING (vec_id)),
         |pairs AS (
         |  SELECT x.vec_id AS id_a, y.vec_id AS id_b
         |  FROM pts x JOIN pts y ON x.cid = y.cid AND x.vec_id < y.vec_id
         |  WHERE (CASE WHEN x.nrm * y.nrm = 0.0 THEN 0.0
         |    ELSE ${ddbDot("x.embedding", "y.embedding")} / (x.nrm * y.nrm) END) >= 0.99),
         |dups AS (SELECT id_b AS vec_id, MIN(id_a) AS dup_of FROM pairs GROUP BY 1)
         |SELECT p.vec_id, CAST(p.cid AS INT) AS cell, d.dup_of,
         |  CAST(CASE WHEN d.dup_of IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_dup
         |FROM pts p LEFT JOIN dups d ON p.vec_id = d.vec_id
         |ORDER BY p.vec_id""".stripMargin,

    "q_hard_negatives" ->
      s"""WITH a AS (SELECT vec_id AS anchor_id, label AS a_label,
         |    embedding AS a_emb FROM embeddings WHERE vec_id < 10),
         |sc AS (
         |  SELECT a.anchor_id, a.a_label, p.vec_id AS neg_id,
         |    p.label AS n_label,
         |    CASE WHEN ${ddbNorm("a.a_emb")} * ${ddbNorm("p.embedding")} = 0.0
         |      THEN 0.0
         |      ELSE ${ddbDot("a.a_emb", "p.embedding")}
         |        / (${ddbNorm("a.a_emb")} * ${ddbNorm("p.embedding")}) END AS cos
         |  FROM embeddings p CROSS JOIN a
         |  WHERE p.label <> a.a_label)
         |SELECT anchor_id, a_label, rk, neg_id, n_label,
         |  ROUND(cos, 8) AS cos
         |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
         |    ORDER BY cos DESC, neg_id) AS rk FROM sc)
         |WHERE rk <= 2 ORDER BY anchor_id, rk""".stripMargin,

    "q_pq_encode" ->
      """WITH cb AS (
        |  SELECT mm.m, e.vec_id AS k,
        |    list_transform(range(0, 16), i -> e.embedding[mm.m * 16 + i + 1]) AS c
        |  FROM embeddings e, (SELECT UNNEST(range(0, 4)) AS m) mm
        |  WHERE e.vec_id < 8),
        |enc AS (
        |  SELECT e.vec_id, cb.m, cb.k,
        |    list_sum(list_transform(range(0, 16), i ->
        |      (CAST(e.embedding[cb.m * 16 + i + 1] AS DOUBLE) - CAST(cb.c[i + 1] AS DOUBLE))
        |      * (CAST(e.embedding[cb.m * 16 + i + 1] AS DOUBLE) - CAST(cb.c[i + 1] AS DOUBLE)))) AS dist
        |  FROM embeddings e CROSS JOIN cb),
        |best AS (
        |  SELECT vec_id, m, k, dist,
        |    ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, k) AS rn
        |  FROM enc)
        |SELECT vec_id,
        |  CAST(MAX(CASE WHEN m = 0 THEN k END) AS INT) AS code0,
        |  CAST(MAX(CASE WHEN m = 1 THEN k END) AS INT) AS code1,
        |  CAST(MAX(CASE WHEN m = 2 THEN k END) AS INT) AS code2,
        |  CAST(MAX(CASE WHEN m = 3 THEN k END) AS INT) AS code3,
        |  ROUND(SQRT(CAST(SUM(CAST(dist AS DECIMAL(28,10))) AS DOUBLE)), 6) AS recon_err
        |FROM best WHERE rn = 1 GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "q_pq_adc" ->
      """WITH cb AS (
        |  SELECT mm.m, e.vec_id AS k,
        |    list_transform(range(0, 16), i -> e.embedding[mm.m * 16 + i + 1]) AS c
        |  FROM embeddings e, (SELECT UNNEST(range(0, 4)) AS m) mm
        |  WHERE e.vec_id < 8),
        |enc AS (
        |  SELECT e.vec_id, cb.m, cb.k,
        |    list_sum(list_transform(range(0, 16), i ->
        |      (CAST(e.embedding[cb.m * 16 + i + 1] AS DOUBLE) - CAST(cb.c[i + 1] AS DOUBLE))
        |      * (CAST(e.embedding[cb.m * 16 + i + 1] AS DOUBLE) - CAST(cb.c[i + 1] AS DOUBLE)))) AS dist
        |  FROM embeddings e CROSS JOIN cb),
        |codes AS (
        |  SELECT vec_id,
        |    MAX(CASE WHEN m = 0 THEN k END) AS code0,
        |    MAX(CASE WHEN m = 1 THEN k END) AS code1,
        |    MAX(CASE WHEN m = 2 THEN k END) AS code2,
        |    MAX(CASE WHEN m = 3 THEN k END) AS code3
        |  FROM (SELECT vec_id, m, k,
        |          ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, k) AS rn
        |        FROM enc) WHERE rn = 1 GROUP BY vec_id),
        |lut AS (
        |  SELECT q.vec_id AS qid, cb.m, cb.k,
        |    list_sum(list_transform(range(0, 16), i ->
        |      (CAST(q.embedding[cb.m * 16 + i + 1] AS DOUBLE) - CAST(cb.c[i + 1] AS DOUBLE))
        |      * (CAST(q.embedding[cb.m * 16 + i + 1] AS DOUBLE) - CAST(cb.c[i + 1] AS DOUBLE)))) AS d
        |  FROM embeddings q CROSS JOIN cb WHERE q.vec_id BETWEEN 8 AND 12),
        |dist AS (
        |  SELECT l0.qid, c.vec_id, l0.d + l1.d + l2.d + l3.d AS adc_dist
        |  FROM codes c
        |  JOIN lut l0 ON l0.m = 0 AND l0.k = c.code0
        |  JOIN lut l1 ON l1.m = 1 AND l1.k = c.code1 AND l1.qid = l0.qid
        |  JOIN lut l2 ON l2.m = 2 AND l2.k = c.code2 AND l2.qid = l0.qid
        |  JOIN lut l3 ON l3.m = 3 AND l3.k = c.code3 AND l3.qid = l0.qid)
        |SELECT qid, vec_id, ROUND(adc_dist, 6) AS adc_dist FROM (
        |  SELECT qid, vec_id, adc_dist,
        |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_dist, vec_id) AS rn
        |  FROM dist) WHERE rn <= 3
        |ORDER BY qid, adc_dist, vec_id""".stripMargin,

    "q_embed_neardup" ->
      s"""SELECT * FROM (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label,
         |    ROUND(CASE WHEN ${ddbNorm("a.embedding")} * ${ddbNorm("b.embedding")} = 0.0 THEN 0.0
         |      ELSE ${ddbDot("a.embedding", "b.embedding")}
         |           / (${ddbNorm("a.embedding")} * ${ddbNorm("b.embedding")}) END, 8) AS cos
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id < b.vec_id)
         |WHERE cos > 0.9 ORDER BY id_a, id_b""".stripMargin
  )
}
