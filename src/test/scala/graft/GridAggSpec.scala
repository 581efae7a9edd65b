package graft

import org.apache.spark.sql.functions._

/** Dense-grid aggregate kernels ([[graft.functions.GridAggregates]])
  * vs the generic hash-groupBy binby path — same tensors, cell for
  * cell, across stats and dimensionalities. */
class GridAggSpec extends SparkSpec {
  import spark.implicits._

  private def li = queries.Q.t(spark, sf0001, "lineitem")

  test("binbyGrid count/sum match binby on lineitem, 1-d and 2-d") {
    val f = VxFrame(li)
    for (specs <- Seq(
      Seq(("l_quantity", 0.0, 50.0, 25)),
      Seq(("l_quantity", 0.0, 50.0, 8), ("l_discount", 0.0, 0.12, 6)))) {
      val cGrid = f.binbyGrid(specs, VxFrame.GridCount)
      val cHash = f.binby(specs, count(lit(1)))
      assert(cGrid.toSeq == cHash.toSeq, s"count mismatch for $specs")
      val sGrid = f.binbyGrid(specs, VxFrame.GridSum("l_extendedprice"))
      val sHash = f.binby(specs, sum(col("l_extendedprice")))
      sGrid.zip(sHash).zipWithIndex.foreach { case ((g, h), i) =>
        assert(math.abs(g - h) <= math.max(1e-6, math.abs(h) * 1e-9),
          s"sum cell $i: grid $g vs hash $h")
      }
    }
  }

  test("binbyGrid mean/min/max: NaN empty cells, values match per-cell aggregates") {
    // x in [0,4): bins 0..3 at shape 4 with range [0,8) leaves 4..7 empty
    val d = VxFrame(Seq(0.5, 1.5, 1.7, 3.2).toDF("x")
      .withColumn("v", col("x") * 10))
    val specs = Seq(("x", 0.0, 8.0, 8))
    val mean = d.binbyGrid(specs, VxFrame.GridMean("v"))
    val mn = d.binbyGrid(specs, VxFrame.GridMin("v"))
    val mx = d.binbyGrid(specs, VxFrame.GridMax("v"))
    assert(mean(0) == 5.0 && mn(0) == 5.0 && mx(0) == 5.0)
    assert(math.abs(mean(1) - 16.0) < 1e-9 && mn(1) == 15.0 && mx(1) == 17.0)
    assert(mean(3) == 32.0)
    for (i <- Seq(2, 4, 5, 6, 7))
      assert(mean(i).isNaN && mn(i).isNaN && mx(i).isNaN, s"cell $i not NaN")
  }

  test("FP bin-edge: a value just under vmax lands in the last bin, every path") {
    // width = 0.1/3 rounds such that floor((v-0)/width) == 3 for
    // v = nextDown(0.1) even though v < vmax — unclamped this indexed
    // past the grid (binby last dim) or bled into the next dimension's
    // cell 0 (binbyGrid flattened ordinal)
    val v = math.nextDown(0.1)
    assert(v < 0.1 && math.floor(v / (0.1 / 3)) >= 3.0) // the hazard is real
    val d = VxFrame(Seq((v, v)).toDF("x", "y"))
    // 1-d: last bin, not an out-of-bounds crash
    assert(d.binby(Seq(("x", 0.0, 0.1, 3)), count(lit(1))).toSeq
      == Seq(0.0, 0.0, 1.0))
    // 2-d grid path: cell (2,2) of 3x3, not cell 0 of a shifted row
    val grid = d.binbyGrid(Seq(("x", 0.0, 0.1, 3), ("y", 0.0, 0.1, 3)),
      VxFrame.GridCount)
    assert(grid.toSeq == Seq.tabulate(9)(i => if (i == 8) 1.0 else 0.0))
    // edges layout: last REAL bin (index 2), not the `outside` slot (3)
    val edges = d.binbyEdges(Seq(("x", 0.0, 0.1, 3)), count(lit(1)))
    assert(edges.toSeq == Seq(0.0, 0.0, 1.0, 0.0, 0.0, 0.0))
  }

  test("binbyGrid drops nulls and out-of-range rows like binby") {
    val d = VxFrame(Seq[(java.lang.Double, java.lang.Double)](
      (0.5, 1.0), (1.5, null), (-3.0, 9.0), (99.0, 9.0), (null, 9.0),
      (1.6, 2.0)).toDF("x", "v"))
    val specs = Seq(("x", 0.0, 2.0, 2))
    assert(d.binbyGrid(specs, VxFrame.GridCount).toSeq == Seq(1.0, 2.0))
    // null v contributes nothing to the sum but the row still counted
    assert(d.binbyGrid(specs, VxFrame.GridSum("v")).toSeq == Seq(1.0, 2.0))
  }

  test("grid wrappers accept non-int ordinal columns (cast, not ClassCastException)") {
    import graft.functions.GridAggregates._
    val d = Seq((0L, 1.0), (1L, 2.0), (1L, 3.0)).toDF("ord", "v")
    assert(d.agg(gridCount(col("ord"), 2)).head.getSeq[Long](0) == Seq(1L, 2L))
    assert(d.agg(gridSum(col("ord"), col("v"), 2)).head.getSeq[Double](0)
      == Seq(1.0, 5.0))
  }

  test("gridSum composes with groupBy keys (grid per category)") {
    import graft.functions.GridAggregates._
    val d = Seq(("a", 0, 1.0), ("a", 1, 2.0), ("b", 0, 5.0), ("a", 0, 3.0))
      .toDF("k", "ord", "v")
    val got = d.groupBy("k")
      .agg(gridSum(col("ord"), col("v"), 2).as("g"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got("a") == Seq(4.0, 2.0) && got("b") == Seq(5.0, 0.0))
  }

  test("GridOrdinal rejects non-finite limits at construction") {
    // doGenCode interpolates limits as Java literals — an Infinity/NaN
    // limit would emit uncompilable source ("InfinityD") and silently
    // fall back to interpreted eval; construction must reject instead
    import graft.functions.GridOrdinal
    import org.apache.spark.sql.catalyst.expressions.Literal
    val c = Seq(Literal(1.0))
    val e = intercept[IllegalArgumentException](
      GridOrdinal(c, Seq(Double.NegativeInfinity), Seq(1.0), Seq(4)))
    assert(e.getMessage.contains("finite"))
    intercept[IllegalArgumentException](
      GridOrdinal(c, Seq(0.0), Seq(Double.NaN), Seq(4)))
    // finite limits still construct fine
    GridOrdinal(c, Seq(0.0), Seq(1.0), Seq(4))
  }

  test("binbyGrid virtual columns resolve and the cell cap raises") {
    val f = VxFrame(li).withVirtualColumn("qty2", "l_quantity * 2")
    val g = f.binbyGrid(Seq(("qty2", 0.0, 100.0, 25)), VxFrame.GridCount)
    val h = VxFrame(li).binbyGrid(Seq(("l_quantity", 0.0, 50.0, 25)),
      VxFrame.GridCount)
    assert(g.toSeq == h.toSeq)
    val e = intercept[IllegalArgumentException](
      VxFrame(li).binbyGrid(Seq(("l_quantity", 0.0, 50.0, 3000),
        ("l_discount", 0.0, 0.12, 3000)), VxFrame.GridCount))
    assert(e.getMessage.contains("hash path"))
  }
}
