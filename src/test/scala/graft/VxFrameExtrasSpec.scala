package graft

import org.apache.spark.sql.functions._

/** Specs for the facade completeness sweep: tail/take/fillNA,
  * nunique flags, limits, binby edge slots. */
class VxFrameExtrasSpec extends SparkSpec {
  import spark.implicits._

  private def vf = VxFrame(Seq(
    (0L, 1.0), (1L, 2.0), (2L, 2.0), (3L, 4.0), (4L, 5.0)).toDF("row_index", "x"))

  test("tail returns last rows in row_index order") {
    assert(vf.tail(2).df.select("row_index").collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L))
    // count-offset fallback without row_index
    val nof = VxFrame(Seq(1, 2, 3).toDF("a"))
    assert(nof.tail(1).count() == 1)
  }

  test("takeIndices selects by position") {
    assert(vf.takeIndices(Seq(0L, 3L)).df.select("x").collect().map(_.getDouble(0)).sorted.toSeq
      == Seq(1.0, 4.0))
  }

  test("fillNA fills both null and NaN") {
    val d = VxFrame(Seq[(java.lang.Long, java.lang.Double)](
      (1L, 1.0), (2L, null), (3L, Double.NaN)).toDF("i", "x"))
    val got = d.fillNA(9.0, Seq("x")).df.select("x").collect().map(_.getDouble(0)).sorted.toSeq
    assert(got == Seq(1.0, 9.0, 9.0))
  }

  test("uniqueValues returns distincts under the limit, raises loudly over it") {
    assert(vf.uniqueValues("x").toSet == Set(1.0, 2.0, 4.0, 5.0))
    // high-cardinality column: refuses instead of collecting 100k rows
    // to the driver (RowLimitException analog, reference
    // core/dataframe.py:575, core/__init__.py:870)
    val wide = VxFrame(spark.range(100000).toDF("v"))
    val e = intercept[IllegalStateException](wide.uniqueValues("v", limit = 1000))
    assert(e.getMessage.contains("row_limit"))
    // near-limit cardinality that HLL might under-estimate still raises
    // via the exact limit+1 backstop
    val near = VxFrame(spark.range(1050).toDF("v"))
    intercept[IllegalStateException](near.uniqueValues("v", limit = 1000))
    // exactly at the limit: succeeds
    assert(VxFrame(spark.range(50).toDF("v")).uniqueValues("v", limit = 50).size == 50)
  }

  test("sampleWeighted: inclusion frequency tracks the weight column") {
    // two strata: weight 3 vs weight 1, equal sizes -> sampled ratio ~3
    val d = VxFrame(spark.range(40000).select(
      col("id"), when(col("id") % 2 === 0, 3.0).otherwise(1.0).as("w")))
    val got = d.sampleWeighted(10000, "w", seed = 7).df
      .groupBy((col("id") % 2 === 0).as("heavy")).count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    val ratio = got(true).toDouble / got(false)
    assert(math.abs(ratio - 3.0) < 0.45, s"ratio=$ratio")
    // expected size within 5%
    val total = got.values.sum
    assert(math.abs(total - 10000.0) / 10000.0 < 0.05, s"total=$total")
    // null/zero weights never sample; empty frame gets the clear
    // error too (sum over zero rows is null, not an NPE)
    val z = VxFrame(spark.range(100).select(col("id"),
      when(col("id") < 50, lit(null)).otherwise(lit(0.0)).as("w")))
    intercept[IllegalArgumentException](z.sampleWeighted(10, "w"))
    val empty = VxFrame(spark.range(0).select(col("id"), lit(1.0).as("w")))
    intercept[IllegalArgumentException](empty.sampleWeighted(10, "w"))
    // weight expression (not just a column) works
    assert(d.sampleWeighted(100, "w * 2").count() > 0)
  }

  test("sampleWeightedExact: exact n, frequencies track weights, top-k plan") {
    val d = VxFrame(spark.range(40000).select(
      col("id"), when(col("id") % 2 === 0, 3.0).otherwise(1.0).as("w")))
    val s = d.sampleWeightedExact(10000, "w", seed = 11)
    assert(s.count() == 10000) // exact, not expected
    val got = s.df.groupBy((col("id") % 2 === 0).as("heavy")).count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    // without replacement from a finite pool, heavy items deplete:
    // E[ratio] sits between the weight ratio and 1 — just require a
    // strong, stable bias toward the heavy stratum
    val ratio = got(true).toDouble / got(false)
    assert(ratio > 1.8 && ratio < 3.0, s"ratio=$ratio")
    // plan is a top-k (TakeOrdered), not a global Sort+Exchange(range)
    val plan = s.df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
  }

  test("nuniqueFlags: NaN and null each count once by default, flags drop them") {
    val d = VxFrame(Seq[java.lang.Double](1.0, 1.0, 2.0, null, Double.NaN, Double.NaN).toDF("x"))
    assert(d.nuniqueFlags("x") == 4L)                          // {1, 2, NaN, null}
    assert(d.nuniqueFlags("x", dropMissing = true) == 3L)      // {1, 2, NaN}
    assert(d.nuniqueFlags("x", dropNan = true) == 3L)          // {1, 2, null}
    assert(d.nuniqueFlags("x", dropMissing = true, dropNan = true) == 2L)
  }

  test("limits and limitsPercentage") {
    assert(vf.limits("x") == ((1.0, 5.0)))
    val (lo, hi) = vf.limitsPercentage("x", 50.0) // central half: p25..p75
    assert(lo == 2.0 && hi == 4.0)
  }

  test("groupby rowLimit guard raises on explosive cardinality") {
    intercept[IllegalStateException] {
      vf.groupby(Seq("row_index"), Map("x" -> "sum"), rowLimit = Some(2))
    }
    // under the limit: fine
    assert(vf.groupby(Seq("row_index"), Map("x" -> "sum"), rowLimit = Some(100)).count() == 5)
  }

  test("binbyEdges routes outside/null/nan rows to edge slots") {
    val d = VxFrame(Seq[java.lang.Double](0.5, 1.5, 9.0, null, Double.NaN).toDF("x"))
    val g = d.binbyEdges(Seq(("x", 0.0, 2.0, 2)), count(lit(1)))
    // layout: [bin0, bin1, outside, null, nan]
    assert(g.toSeq == Seq(1.0, 1.0, 1.0, 1.0, 1.0))
    assert(g.sum == d.count().toDouble) // nothing dropped
  }

  test("binbyEdges rejects non-positive shapes despite the +3 edge slots") {
    val d = VxFrame(Seq[java.lang.Double](0.5, 1.5).toDF("x"))
    for (s <- Seq(0, -1, -2)) {
      val e = intercept[IllegalArgumentException](
        d.binbyEdges(Seq(("x", 0.0, 2.0, s)), count(lit(1))))
      assert(e.getMessage.contains("positive"), s"shape $s: ${e.getMessage}")
    }
  }

  test("binby is N-dimensional; grid-cell guard rejects explosive shapes") {
    // 3-d grid equals the nested-loop expectation on a tiny frame
    val d = VxFrame((for (x <- 0 until 4; y <- 0 until 4; z <- 0 until 4)
      yield (x.toDouble, y.toDouble, z.toDouble)).toDF("x", "y", "z"))
    val g = d.binby(Seq(("x", 0.0, 4.0, 2), ("y", 0.0, 4.0, 2), ("z", 0.0, 4.0, 2)),
      count(lit(1)))
    assert(g.length == 8 && g.forall(_ == 8.0)) // 64 pts, 8 octants of 8
    // 4-d works too (N-d, not special-cased at 3)
    val g4 = d.binby(Seq(("x", 0.0, 4.0, 2), ("y", 0.0, 4.0, 2),
      ("z", 0.0, 4.0, 2), ("x + y", 0.0, 8.0, 1)), count(lit(1)))
    assert(g4.sum == 64.0)
    // driver-tensor guard: 2^27 cells must refuse before any Spark job
    val e = intercept[IllegalArgumentException] {
      d.binby(Seq(("x", 0.0, 4.0, 1 << 14), ("y", 0.0, 4.0, 1 << 13)), count(lit(1)))
    }
    assert(e.getMessage.contains("cells"))
  }

  test("withApplied attaches a UDF column") {
    val square = org.apache.spark.sql.functions.udf((d: Double) => d * d)
    val got = vf.withApplied("x2", square, "x").df.agg(sum("x2")).head.getDouble(0)
    assert(got == 1 + 4 + 4 + 16 + 25)
  }

  test("covMatrix: single-pass pairwise covariances, symmetric") {
    val d = VxFrame(Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0)).toDF("a", "b"))
    val m = d.covMatrix(Seq("a", "b"))
    assert(math.abs(m(0)(0) - 2.0 / 3) < 1e-12)
    assert(m(0)(1) == m(1)(0))
    assert(math.abs(m(0)(1) - 4.0 / 3) < 1e-12)
    assert(math.abs(m(1)(1) - 8.0 / 3) < 1e-12)
  }

  test("selectBox equals selectRectangle in 2-d; handles reversed limits") {
    val pts = (for (x <- 0 until 10; y <- 0 until 10) yield (x.toDouble, y.toDouble)).toDF("x", "y")
    val viaBox = VxFrame(pts).selectBox(Seq("x", "y"), Seq((7.0, 2.0), (1.0, 3.0)))
    val n = viaBox.countExpr("x", Some("default"))
    assert(n == 6 * 3) // x in [2,7] (reversed limits normalized), y in [1,3]
  }

  test("selectInverse flips the selection; no selection inverts to empty") {
    val f = VxFrame(spark.range(10).select(col("id").cast("double").as("x")))
      .select("x < 3")
    assert(f.selectInverse().countExpr("x", Some("default")) == 7)
    assert(VxFrame(spark.range(10).select(col("id").cast("double").as("x")))
      .selectInverse().countExpr("x", Some("default")) == 0)
  }

  test("selectNonMissing: null and NaN rows deselected, composable") {
    val d = VxFrame(Seq[(java.lang.Double, java.lang.Long)](
      (1.0, 1L), (null, 2L), (Double.NaN, 3L), (4.0, null), (5.0, 5L))
      .toDF("x", "k"))
    assert(d.selectNonMissing().countExpr("k", Some("default")) == 2) // rows 1 and 5
    assert(d.selectNonMissing(Seq("x"), dropNan = false)
      .countExpr("*", Some("default")) == 4) // only the null-x row out
  }

  test("splitRandom partitions all rows with both call shapes") {
    val f = VxFrame(spark.range(1000).toDF("id"))
    val parts = f.splitRandom(0.3)
    assert(parts.size == 2 && parts.map(_.count()).sum == 1000)
    val three = f.splitRandom(3.0)
    assert(three.size == 3 && three.map(_.count()).sum == 1000)
  }

  test("skewExpr/kurtosisExpr match closed forms") {
    // symmetric uniform 0..99: skew 0, excess kurtosis of discrete uniform
    val u = VxFrame(spark.range(100).select(col("id").cast("double").as("x")))
    assert(math.abs(u.skewExpr("x")) < 1e-9)
    val nn = 100.0
    val expectedKurt = -6.0 / 5 * (nn * nn + 1) / (nn * nn - 1)
    assert(math.abs(u.kurtosisExpr("x") - expectedKurt) < 1e-9)
    // constant column -> NaN (zero variance guard)
    val const = VxFrame(spark.range(10).select(lit(5.0).as("x")))
    assert(const.skewExpr("x").isNaN && const.kurtosisExpr("x").isNaN)
    // selection-aware
    assert(math.abs(u.skewExpr("x", Some("x < 50"))) < 1e-9)
  }

  test("combinations enumerates column subspaces with exclusion") {
    import spark.implicits._
    val f = VxFrame(Seq((1, 2.0, "a", true)).toDF("w", "x", "y", "z"))
    assert(f.combinations(2) === Seq(
      Seq("w", "x"), Seq("w", "y"), Seq("w", "z"),
      Seq("x", "y"), Seq("x", "z"), Seq("y", "z")))
    assert(f.combinations(3, exclude = Seq("z")) === Seq(Seq("w", "x", "y")))
  }

  test("compare: schema gaps, type conflicts, value diffs, unmatched keys") {
    val a = VxFrame(Seq((1L, 1.0, "x"), (2L, 2.0, "y"), (3L, 3.0, "z"))
      .toDF("k", "v", "s"))
    val b = VxFrame(Seq((1L, 1.0, true), (2L, 9.0, false), (4L, 4.0, true))
      .toDF("k", "v", "extra"))
    val r = a.compare(b, "k")
    assert(r.missingInThis == Seq("extra") && r.missingInOther == Seq("s"))
    assert(r.typeMismatch.isEmpty)
    assert(r.differingCounts == Map("v" -> 1L)) // k=2 differs (2.0 vs 9.0)
    assert(r.unmatchedRows == 2)                // k=3 only in a, k=4 only in b
    assert(!r.identical)
    assert(a.compare(a, "k").identical)
    // type conflict detection
    val c = VxFrame(Seq((1L, "1.0")).toDF("k", "v"))
    assert(a.compare(c, "k").typeMismatch == Seq("v"))
  }

  test("evaluateIterator streams chunks without full materialization") {
    val chunks = vf.evaluateIterator(Seq("row_index", "x"), chunkSize = 2).toSeq
    assert(chunks.map(_.size).sum == 5)
    assert(chunks.forall(_.size <= 2))
  }

  test("percentile scaleSafe path equals the builtin bit-for-bit") {
    val f = VxFrame(graft.queries.Q.t(spark, sf0001, "lineitem")
      .select(col("l_quantity").cast("double").as("x")))
    for (q <- Seq(0.1, 0.5, 0.9, 0.999)) {
      val builtin = f.percentile("x", q, exact = true)
      val safe = f.percentile("x", q, exact = true, scaleSafe = true)
      assert(builtin == safe, s"q=$q: $builtin vs $safe")
    }
  }

  test("resultCache: fingerprint-keyed memoization hits, misses on changed input") {
    import graft.operators.ResultCache
    val dir = java.nio.file.Files.createTempDirectory("graft_rescache")
    val src = dir.resolve("src.parquet").toString
    val cache = dir.resolve("cache").toString
    spark.range(1000).selectExpr("id", "id % 7 AS k").write.parquet(src)
    def q() = spark.read.parquet(src).groupBy("k").count()
    // two independently-built but identical queries fingerprint the same
    assert(ResultCache.fingerprint(q()) == ResultCache.fingerprint(q()))
    // a different query fingerprints differently
    val other = spark.read.parquet(src).groupBy("k")
      .agg(sum("id").as("s"))
    assert(ResultCache.fingerprint(q()) != ResultCache.fingerprint(other))
    val first = ResultCache.cached(q(), cache)
    assert(first.count() == 7)
    // a hit reads the cache parquet, never the original input
    val second = ResultCache.cached(q(), cache)
    val scanned = second.inputFiles
    assert(scanned.nonEmpty && scanned.forall(_.contains("cache")),
      scanned.mkString(","))
    assert(second.collect().map(r => (r.getLong(0), r.getLong(1))).toMap ==
      first.collect().map(r => (r.getLong(0), r.getLong(1))).toMap)
    // rewriting the input changes the fingerprint -> miss, recompute
    val fpBefore = ResultCache.fingerprint(q())
    spark.range(2000).selectExpr("id", "id % 7 AS k")
      .write.mode("overwrite").parquet(src)
    val fpAfter = ResultCache.fingerprint(q())
    assert(fpBefore != fpAfter)
    assert(ResultCache.cached(q(), cache).agg(sum("count")).head.getLong(0) == 2000L)
    // facade surface
    val vfc = VxFrame(q()).resultCache(cache)
    assert(vfc.count() == 7)
    ResultCache.invalidate(spark, cache)
    assert(!new java.io.File(cache).exists())
  }
  test("facade exportDelta / upsertInto parity with the DeltaLake module") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_vx_delta").toString
    val t = s"$d/t.delta"
    VxFrame(Seq((1L, "a"), (2L, "b")).toDF("id", "s")).exportDelta(t)
    VxFrame(Seq((3L, "c")).toDF("id", "s")).exportDelta(t, mode = "append")
    val v = VxFrame(Seq((2L, "B2"), (4L, "d")).toDF("id", "s"))
      .upsertInto(t, Seq("id"))
    assert(v == 2L)
    val got = graft.sources.DeltaLake.fromDelta(spark, t)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got == Seq((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "d")))
  }

}
