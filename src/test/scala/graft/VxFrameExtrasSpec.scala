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

  test("evaluateIterator streams chunks without full materialization") {
    val chunks = vf.evaluateIterator(Seq("row_index", "x"), chunkSize = 2).toSeq
    assert(chunks.map(_.size).sum == 5)
    assert(chunks.forall(_.size <= 2))
  }
}
