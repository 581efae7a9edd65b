package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-component decomposition of the two 2x-gate lanes
  * (`join_dense`, `binby_dense`): each lane's cost is isolated by
  * differencing structurally adjacent variants measured interleaved
  * in ONE JVM (the r8 A/B discipline — cross-run numbers on this
  * host are only comparable against the mem_bw + gen_only controls).
  *
  *   join_dense  = gen(genJ) + UnsafeRow + probe(w) + contains-filter
  *                 + dense agg(sum+count over 100 slots)
  *   variants:  agg_base   gen + row + agg sum(k2)+count  (no probe)
  *              probe_left probe, NO contains filter (left join)
  *              probe_full probe + filter      (== the bench lane)
  *   so probe cost = probe_left - agg_base; filter cost =
  *   probe_full - probe_left.
  *
  *   binby_dense = gen + 2x when-cascade bin + composite ordinal
  *                 + dense agg over 10k cells
  *   variants:  bin1d    ONE cascade, 10k bins on x alone
  *              bin2d    the real 100x100 lane
  *   so the second dimension's cascade+fma = bin2d - bin1d.
  *
  * Usage: SPARK_GRAFT_CPUS=32 tools/run.sh graft.JoinDenseProbe [reps]
  */
object JoinDenseProbe {
  private def time(run: () => Unit): Double = {
    val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val genN = 100_000_000L
    val gen = spark.range(genN).select(
      (col("id") % 100).as("k"),
      (col("id") % 1000).cast("double").as("x"),
      ((col("id") * 7) % 1000).cast("double").as("y"))
    val dim = spark.range(100_000L).select(col("id").as("k2"),
      (col("id") % 97).cast("double").as("w"))
    val genJ2 = spark.range(genN).select(
      (col("id") % 100).as("k"), (col("id") % 100_000L).as("k2"))
    val genCat = spark.range(genN).select(
      (col("id") % 10).cast("tinyint").as("code"),
      (col("id") % 1000).cast("double").as("x"))
    // 60k NON-dense long keys (scattered by a Knuth multiplier — not
    // 0..n ordinals, so the dense path genuinely needs the dictionary)
    val genWide = spark.range(genN).select(
      ((col("id") % 60000) * 2654435761L).as("k"),
      (col("id") % 1000).cast("double").as("x"))
    import graft.operators.{DenseCatAgg, DenseLookupJoin}
    def aggK(df: DataFrame, aggs: Seq[DenseCatAgg.Agg]): DataFrame =
      DenseCatAgg.groupByOrdinal(df, col("k"), 100, aggs, countAs = Some("n"))

    val lanes: Seq[(String, () => DataFrame)] = Seq(
      "gen_only" -> (() => genCat),
      "genJ_only" -> (() => genJ2),
      // gen + row boundary + dense agg, NO probe (sum of the key the
      // probe would consume — same row width as the probed lane)
      "agg_base" -> (() => aggK(genJ2,
        Seq(DenseCatAgg.Agg(col("k2").cast("double"), "sum", "sum_k2")))),
      // probe WITHOUT the inner-join contains filter
      "probe_left" -> (() => aggK(
        DenseLookupJoin.lookupJoin(genJ2, dim, col("k2"), "k2", 100_000,
          joinType = "left"),
        Seq(DenseCatAgg.Agg(col("w"), "sum", "sum_w")))),
      // the bench lane: probe + contains filter
      "probe_full" -> (() => aggK(
        DenseLookupJoin.lookupJoin(genJ2, dim, col("k2"), "k2", 100_000),
        Seq(DenseCatAgg.Agg(col("w"), "sum", "sum_w")))),
      "groupby_cat_dense" -> (() =>
        DenseCatAgg.groupByOrdinal(genCat, col("code"), 10,
          Seq(DenseCatAgg.Agg(col("x"), "sum", "sum_x")),
          countAs = Some("n"))),
      // the r15 #7 question: does the HASH-key lane take the fusion
      // once a dictionary probe emits the ordinal inline? cat_hash =
      // Spark's codegen'd HashAggregate (the recorded bench lane);
      // cat_dict = groupByKeys (distinct-pass dictionary + codegen'd
      // open-addressed probe + the fused dense kernel). The _wide
      // pair re-asks at 64k keys, where HashAggregate's map is big.
      "cat_hash" -> (() =>
        genCat.groupBy("code").agg(sum("x"), count(lit(1)))),
      "cat_dict" -> (() =>
        DenseCatAgg.groupByKeys(genCat, col("code"),
          Seq(DenseCatAgg.Agg(col("x"), "sum", "sum_x")),
          countAs = Some("n"))),
      "cat_hash_wide" -> (() =>
        genWide.groupBy("k").agg(sum("x"), count(lit(1)))),
      "cat_dict_wide" -> (() =>
        DenseCatAgg.groupByKeys(genWide, col("k"),
          Seq(DenseCatAgg.Agg(col("x"), "sum", "sum_x")),
          countAs = Some("n"))),
      // decomposition of cat_dict: the dictionary BUILD alone (the
      // extra distinct pass groupByKeys pays), and the PROBE+fused-agg
      // alone over a pre-built dictionary — isolates whether the
      // steady-state kernel or the build is the bill
      "dict_build_only" -> (() => {
        genCat.select(col("code").cast("bigint").as("__k"))
          .distinct().limit(1 << 16).collect()
        spark.range(0).toDF()
      }),
      "cat_dictprobe" -> (() => {
        import org.apache.spark.sql.graftbridge.Bridge
        import graft.operators.{LongDict, LongDictOrdinal}
        val dict = LongDict.build((0L until 10L).toArray, -1)
        DenseCatAgg.groupByOrdinal(genCat,
          Bridge.column(LongDictOrdinal(
            Bridge.expression(col("code").cast("bigint")), dict)),
          10, Seq(DenseCatAgg.Agg(col("x"), "sum", "sum_x")),
          countAs = Some("n"))
      }),
      "cat_dictprobe_wide" -> (() => {
        import org.apache.spark.sql.graftbridge.Bridge
        import graft.operators.{LongDict, LongDictOrdinal}
        val dict = LongDict.build(
          (0L until 60000L).map(_ * 2654435761L).sorted.toArray, -1)
        DenseCatAgg.groupByOrdinal(genWide,
          Bridge.column(LongDictOrdinal(
            Bridge.expression(col("k").cast("bigint")), dict)),
          60000, Seq(DenseCatAgg.Agg(col("x"), "sum", "sum_x")),
          countAs = Some("n"))
      }),
      // binby decomposition (VxFrame runs collect() internally via an
      // Array result — wrap to the common counted shape)
      "bin1d" -> (() => {
        VxFrame(gen).binby(Seq(("x", 0.0, 1000.0, 10000)), sum(col("x")))
        spark.range(0).toDF()
      }),
      "bin2d" -> (() => {
        VxFrame(gen).binby(
          Seq(("x", 0.0, 1000.0, 100), ("y", 0.0, 1000.0, 100)),
          sum(col("x")))
        spark.range(0).toDF()
      }),
      // conf-flag A/B twin: the same lane on the CLASSIC interpreted
      // accumulate (fusion off) — fused-vs-classic in one window
      "bin2d_classic" -> (() => {
        spark.conf.set("spark.graft.denseAgg.fuse", "false")
        try VxFrame(gen).binby(
          Seq(("x", 0.0, 1000.0, 100), ("y", 0.0, 1000.0, 100)),
          sum(col("x")))
        finally spark.conf.set("spark.graft.denseAgg.fuse", "true")
        spark.range(0).toDF()
      }),
      "probe_full_classic" -> (() => {
        spark.conf.set("spark.graft.denseAgg.fuse", "false")
        try aggK(
          DenseLookupJoin.lookupJoin(genJ2, dim, col("k2"), "k2", 100_000),
          Seq(DenseCatAgg.Agg(col("w"), "sum", "sum_w"))).count()
        finally spark.conf.set("spark.graft.denseAgg.fuse", "true")
        spark.range(0).toDF()
      }))

    // warm every lane once
    lanes.foreach { case (_, mk) => mk().count() }
    val best = collection.mutable.Map.empty[String, Double].withDefaultValue(1e99)
    val all = collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    val bwPre = BenchProbe.memBandwidthGbps(cpus.toInt)
    (1 to reps).foreach { _ =>
      lanes.foreach { case (name, mk) =>
        val t = time(() => { mk().count(); () })
        if (t < best(name)) best(name) = t
        all(name) = t :: all(name)
      }
    }
    val bwPost = BenchProbe.memBandwidthGbps(cpus.toInt)
    def rate(n: String): Long = (genN / best(n)).toLong
    val names = lanes.map(_._1)
    println("{" +
      s""""probe":"join_dense_decomp","cpus":$cpus,""" +
      s""""mem_bw_pre":${f"$bwPre%.1f"},"mem_bw_post":${f"$bwPost%.1f"},""" +
      names.map(n => s""""$n":{"best_sec":${f"${best(n)}%.3f"},""" +
        s""""rows_per_sec":${rate(n)},""" +
        s""""reps":[${all(n).reverse.map(t => f"$t%.3f").mkString(",")}]}""")
        .mkString(",") + "}")
    spark.stop()
  }
}
