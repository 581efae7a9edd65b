package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Isolated throughput probe — the A/B half of the baseline-gate
  * protocol (see ROUND NOTES / BENCH_AB artifacts).
  *
  * [[Bench]] times the BASELINE.md throughput lanes at the END of a
  * ~12-minute battery; this host throttles sustained multi-core load
  * (documented since round 1), so those recorded numbers carry
  * whatever throttle state the preceding battery accumulated. This
  * main runs ONLY the generated-data throughput lanes — code-identical
  * to Bench's (same genN, same shapes) — in a fresh JVM on an
  * otherwise idle host. Comparing its output to the same round's
  * battery-recorded numbers separates "the engine regressed" from
  * "the host was throttled when the lane ran".
  *
  * Usage: SPARK_GRAFT_CPUS=32 tools/run.sh graft.BenchProbe [reps]
  */
object BenchProbe {
  private def time(run: () => Unit): Double = {
    val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
  }

  /** Raw memory-bandwidth control (no Spark, no repo code): `threads`
    * JVM threads each stream-sum a disjoint range of one shared 512 MB
    * long array; returns aggregate GB/s. gen_only caps CPU/scheduler
    * health but is memory-LIGHT — r13 found a host window where
    * gen_only was at its historical best while every bandwidth-bound
    * dense kernel ran at half its recorded speed on git-identical
    * code. This control makes that state directly observable. */
  private[graft] def memBandwidthGbps(threads: Int): Double = {
    val n = 64 << 20 // 512 MB of longs
    val arr = new Array[Long](n)
    var i = 0
    while (i < n) { arr(i) = i.toLong; i += 1 }
    val sums = new Array[Long](threads)
    def pass(): Double = {
      val ts = (0 until threads).map { t =>
        new Thread(() => {
          val lo = (n.toLong * t / threads).toInt
          val hi = (n.toLong * (t + 1) / threads).toInt
          var s = 0L
          var j = lo
          while (j < hi) { s += arr(j); j += 1 }
          sums(t) = s
        })
      }
      val t0 = System.nanoTime()
      ts.foreach(_.start())
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    pass() // warm (page faults, JIT)
    val best = (1 to 3).map(_ => pass()).min
    (n.toLong * 8) / best / 1e9
  }

  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // lanes below mirror Bench.scala's throughput section verbatim
    val genN = 100_000_000L
    val gen = spark.range(genN).select(
      (col("id") % 100).as("k"),
      (col("id") % 1000).cast("double").as("x"),
      ((col("id") * 7) % 1000).cast("double").as("y"))
    val dim = spark.range(100_000L).select(col("id").as("k2"),
      (col("id") % 97).cast("double").as("w"))
    val genJ = spark.range(genN).select(
      (col("id") % 100).as("k"), (col("id") % 100_000L).as("k2"))
    val genCat = spark.range(genN).select(
      (col("id") % 10).cast("tinyint").as("code"),
      (col("id") % 1000).cast("double").as("x"))
    // decomposition lanes: `gen_only` times the synthesis that the
    // composite lanes charge inside their timed region; `_resident`
    // aggregates a pre-materialized (cached) input — the reference's
    // own methodology, which aggregates resident memory-mapped columns
    // (BASELINE.md README.md:60 shape) rather than generating rows
    // inside the timed loop
    val genCatResident = genCat.cache()
    genCatResident.count() // materialize before any timing
    val lanes: Seq[(String, () => DataFrame)] = Seq(
      "gen_only" -> (() => genCat),
      "groupby" -> (() =>
        gen.groupBy("k").agg(sum("x"), avg("y"), count(lit(1)))),
      "groupby_cat" -> (() =>
        genCat.groupBy("code").agg(sum("x"), count(lit(1)))),
      "groupby_cat_resident" -> (() =>
        genCatResident.groupBy("code").agg(sum("x"), count(lit(1)))),
      // dense ordinal fast path (operators.DenseCatAgg) — the shape
      // Bench's gate lane runs since r8
      "groupby_cat_dense" -> (() =>
        graft.operators.DenseCatAgg.groupByOrdinal(genCat, col("code"), 10,
          Seq(graft.operators.DenseCatAgg.Agg(col("x"), "sum", "sum_x")),
          countAs = Some("n"))),
      "binby" -> (() =>
        gen.groupBy(floor(col("x") / 10).cast("int").as("bx"),
            floor(col("y") / 10).cast("int").as("by"))
          .agg(count(lit(1)), sum("x"))),
      // VxFrame.binby's r9 dense lowering (composite bin ordinal
      // through DenseCatAgg), end-to-end incl. grid assembly
      "binby_dense" -> (() => {
        graft.VxFrame(gen).binby(
          Seq(("x", 0.0, 1000.0, 100), ("y", 0.0, 1000.0, 100)),
          sum(col("x")))
        spark.range(0).toDF()
      }),
      "join" -> (() =>
        genJ.join(broadcast(dim), "k2")
          .groupBy("k").agg(sum("w"), count(lit(1)))),
      // dense-lookup join path (r10, operators.DenseLookupJoin) —
      // mirror of Bench's join_dense lane
      "join_dense" -> (() => {
        val joined = graft.operators.DenseLookupJoin.lookupJoin(
          genJ, dim, col("k2"), "k2", 100_000)
        graft.operators.DenseCatAgg.groupByOrdinal(joined, col("k"), 100,
          Seq(graft.operators.DenseCatAgg.Agg(col("w"), "sum", "sum_w")),
          countAs = Some("n"))
      }))

    // one untimed warmup per lane (JIT/codegen), then rep-major timing
    lanes.foreach { case (_, fn) =>
      fn().write.format("noop").mode("overwrite").save()
    }
    val perRep = (1 to reps).map { _ =>
      lanes.map { case (_, fn) =>
        time(() => fn().write.format("noop").mode("overwrite").save())
      }
    }
    val out = lanes.map(_._1).zipWithIndex.map { case (name, i) =>
      val best = perRep.map(_(i)).min
      val rate = (genN / best).toLong
      s""""$name":{"best_sec":${f"$best%.3f"},"rows_per_sec":$rate,"reps":[${perRep.map(r => f"${r(i)}%.3f").mkString(",")}]}"""
    }.mkString(",")
    // bandwidth control measured LAST (after the Spark lanes) so its
    // reading reflects the same host window the lanes ran in
    val bw = memBandwidthGbps(cpus.toInt)
    println(s"""{"probe":"throughput_ab","cpus":$cpus,"genN":$genN,"mem_bw_gbps":${f"$bw%.1f"},$out}""")
    spark.stop()
  }
}
