package graft

import org.apache.spark.sql.functions._

/** Facade semantics tests: the vaex behaviors that do NOT map 1:1 to
  * plain Spark calls (widening filters, selection algebra, variables,
  * state round-trip, binby grids, category labels). */
class VxFrameSpec extends SparkSpec {
  import spark.implicits._

  private def vf = VxFrame(Seq(
    (0L, 1.0, "a"), (1L, 2.0, "b"), (2L, 3.0, "a"),
    (3L, 4.0, "c"), (4L, 5.0, "b")).toDF("row_index", "x", "s"))

  test("virtual columns + variables evaluate lazily and chain") {
    val f = vf.withVariable("t", 2.0)
      .withVirtualColumn("y", "x * t")
      .withVirtualColumn("z", "y + 1")
    assert(f.df.select(sum("z")).head.getDouble(0) == 2 * (1 + 2 + 3 + 4 + 5) + 5)
    // variable update recomputes dependents
    val f2 = f.withVariable("t", 3.0)
    assert(f2.df.select(sum("y")).head.getDouble(0) == 45.0)
  }

  test("widening filter: or-mode widens, and-mode narrows") {
    val narrowed = vf.filter("x < 2")            // {1}
    assert(narrowed.count() == 1)
    val widened = narrowed.filter("x > 4", "or") // {1, 5}
    assert(widened.count() == 2)
    val both = widened.filter("x > 2", "and")    // {5}
    assert(both.count() == 1)
  }

  test("selection algebra: and/or/xor/subtract + undo") {
    val f = vf.select("x < 4")                       // {1,2,3}
    assert(f.countExpr("*", Some("default")) == 3)
    val f2 = f.select("x > 1", "and")                // {2,3}
    assert(f2.countExpr("*", Some("default")) == 2)
    val f3 = f2.select("x > 4", "or")                // {2,3,5}
    assert(f3.countExpr("*", Some("default")) == 3)
    val f4 = f3.select("x > 2", "subtract")          // {2}
    assert(f4.countExpr("*", Some("default")) == 1)
    val undone = f4.selectionUndo()
    assert(undone.countExpr("*", Some("default")) == 3)
  }

  test("selection-aware aggregation runs without filtering the frame") {
    val f = vf.select("s = 'a'")
    assert(f.count() == 5) // selection does not filter
    assert(f.sumExpr("x", Some("default")) == 4.0) // 1 + 3
    assert(f.sumExpr("x") == 15.0)
    assert(f.meanExpr("x", Some("default")) == 2.0)
  }

  test("aggregate() fuses multiple aggs in one pass") {
    val r = vf.aggregate("n" -> count(lit(1)), "sx" -> sum(col("x")), "mx" -> max(col("x")))
    assert(r.getAs[Long]("n") == 5 && r.getAs[Double]("sx") == 15.0 && r.getAs[Double]("mx") == 5.0)
  }

  test("minmax single pass; var/std use ddof=0 like vaex") {
    assert(vf.minmax("x") == ((1.0, 5.0)))
    assert(math.abs(vf.varExpr("x") - 2.0) < 1e-12) // population var of 1..5
    assert(math.abs(vf.stdExpr("x") - math.sqrt(2.0)) < 1e-12)
  }

  test("dropMissing/dropNaN/dropNA trichotomy") {
    val d = VxFrame(Seq[(java.lang.Long, java.lang.Double)](
      (1L, 1.0), (2L, null), (3L, Double.NaN)).toDF("i", "x"))
    assert(d.dropMissing(Seq("x")).count() == 2)
    assert(d.dropNaN(Seq("x")).count() == 2)
    assert(d.dropNA(Seq("x")).count() == 1)
  }

  test("sort puts nulls last in both directions") {
    val d = VxFrame(Seq[java.lang.Double](3.0, null, 1.0).toDF("x"))
    assert(d.sort(Seq("x")).df.collect().map(r => Option(r.get(0))).last.isEmpty)
    assert(d.sort(Seq("x"), ascending = false).df.collect().map(r => Option(r.get(0))).last.isEmpty)
  }

  test("join mangles collisions; positional join zips by row_index") {
    val right = VxFrame(Seq((0L, 10.0, "z"), (1L, 20.0, "w")).toDF("row_index", "x", "t"))
    val j = vf.join(right, Seq("row_index"), "inner")
    assert(j.df.columns.toSeq.contains("x_r"))
    assert(j.count() == 2)
    val p = vf.joinPositional(right)
    assert(p.count() == 5)
    assert(p.df.where("row_index = 0").head.getAs[Double]("x_r") == 10.0)
  }

  test("concat flexible resolver fills missing columns with null") {
    val other = VxFrame(Seq((9L, 9.9)).toDF("row_index", "x"))
    val c = vf.concat(other)
    assert(c.count() == 6)
    assert(c.df.where("row_index = 9").head.getAs[String]("s") == null)
  }

  test("shift/diff/rolling honor row_index order") {
    val shifted = vf.shift("x", 1)
    assert(Option(shifted.df.where("row_index = 0").head.get(1)).isEmpty)
    assert(shifted.df.where("row_index = 1").head.getDouble(1) == 1.0)
    val diffed = vf.diff("x")
    assert(diffed.df.where("row_index = 4").head.getDouble(1) == 1.0)
    val rolled = vf.rollingSum("x", 2, "rs")
    assert(rolled.df.where("row_index = 4").head.getAs[Double]("rs") == 9.0)
  }

  test("groupby agg-spec with first/last in row order") {
    val g = vf.groupby(Seq("s"), Map("x" -> "first"), sort = true)
    val got = g.df.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got == Seq(("a", 1.0), ("b", 2.0), ("c", 4.0)))
  }

  test("binby 1-d and 2-d dense grids") {
    val g1 = vf.binby(Seq(("x", 0.0, 5.0, 5)), count(lit(1)))
    assert(g1.toSeq == Seq(0.0, 1.0, 1.0, 1.0, 1.0)) // x=5 out of [0,5)
    val g2 = vf.binby(Seq(("x", 0.0, 6.0, 2), ("row_index", 0.0, 6.0, 2)), count(lit(1)))
    assert(g2.sum == 5.0 && g2.length == 4)
  }

  test("categorize + label virtual column") {
    val d = VxFrame(Seq(0, 1, 2, 1).toDF("code"))
      .categorize("code", Seq("red", "green", "blue"))
      .withCategoryLabels("code", "color")
    assert(d.isCategory("code"))
    assert(d.df.groupBy("color").count().count() == 3)
  }

  test("state round-trips through JSON") {
    val f = vf.withVariable("t", 2.0)
      .withVirtualColumn("y", "x * t")
      .select("x < 4")
      .filter("x > 1")
      .categorize("code", Seq("a", "b"))
    val restored = VxFrame(vf.base).stateSet(f.stateGet())
    assert(restored.count() == f.count())
    assert(restored.df.select(sum("y")).head.getDouble(0) ==
      f.df.select(sum("y")).head.getDouble(0))
    assert(restored.countExpr("*", Some("default")) == f.countExpr("*", Some("default")))
    assert(restored.categories == f.categories)
  }

  test("slice/head/sample/split") {
    assert(vf.head(2).count() == 2)
    assert(vf.slice(1, 4).count() == 3)
    val parts = vf.split(Seq(0.5, 0.5))
    assert(parts.map(_.count()).sum == 5)
  }
}
