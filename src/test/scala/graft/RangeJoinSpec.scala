package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.RangeJoin

/** Binned range join: equality with the naive cartesian-filter
  * formulation, exactly-once pairing, the explode guard, and the plan
  * shape that is the operator's whole point (an equi-join, never a
  * nested-loop/cartesian). */
class RangeJoinSpec extends SparkSpec {

  private def pointsDf(n: Int, seed: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val rows = (0 until n).map(i => Row(i.toLong, rnd.nextInt(2001) - 1000L))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3),
      StructType(Seq(StructField("pid", LongType, false), StructField("p", LongType, false))))
  }

  private def intervalsDf(n: Int, seed: Int, maxLen: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      val s = rnd.nextInt(2001) - 1000L
      // include some degenerate (e < s) intervals: must match nothing
      val e = if (i % 11 == 0) s - 3 else s + rnd.nextInt(maxLen + 1)
      Row(i.toLong, s, e)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("iid", LongType, false),
        StructField("s", LongType, false), StructField("e", LongType, false))))
  }

  private def key(df: DataFrame, cols: String*): Set[Seq[Any]] =
    df.select(cols.map(col): _*).collect().map(_.toSeq).toSet

  test("pointInInterval == naive cartesian filter (several widths, signs)") {
    val pts = pointsDf(300, 1)
    val ivs = intervalsDf(80, 2, 120)
    val naive = pts.crossJoin(ivs)
      .where(col("p") >= col("s") && col("p") <= col("e"))
    val expect = key(naive, "pid", "iid")
    assert(expect.nonEmpty)
    for (w <- Seq(1L, 7L, 64L, 5000L)) {
      val got = RangeJoin.pointInInterval(pts, ivs, "p", "s", "e", w)
      assert(key(got, "pid", "iid") == expect, s"width $w")
      // exactly-once: no duplicate pairs
      assert(got.count() == expect.size, s"width $w duplicates")
    }
  }

  test("left-outer pointInInterval == naive left theta join, unmatched points once") {
    val pts = pointsDf(300, 30)
    val ivs = intervalsDf(40, 31, 80)
    val naiveDf = pts.join(ivs,
      col("p") >= col("s") && col("p") <= col("e"), "left")
    def rows(df: DataFrame): Set[(Long, Option[Long])] =
      df.select("pid", "iid").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    val expect = rows(naiveDf)
    assert(expect.exists(_._2.isEmpty) && expect.exists(_._2.nonEmpty))
    for (w <- Seq(1L, 16L, 512L)) {
      val got = RangeJoin.pointInInterval(pts, ivs, "p", "s", "e", w,
        joinType = "left")
      assert(rows(got) == expect, s"width $w")
      assert(got.count() == naiveDf.count(), s"width $w multiplicity")
    }
    // every point survives (the preserved side is the point side)
    val gotPids = RangeJoin.pointInInterval(pts, ivs, "p", "s", "e", 16,
      joinType = "left").select("pid").distinct().count()
    assert(gotPids == pts.count())
    val bad = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts, ivs, "p", "s", "e", 16, joinType = "full")
    }
    assert(bad.getMessage.contains("joinType"))
  }

  test("exclusive end excludes the boundary point") {
    val pts = pointsDf(200, 3)
    val ivs = intervalsDf(50, 4, 60)
    val naive = pts.crossJoin(ivs)
      .where(col("p") >= col("s") && col("p") < col("e"))
    val got = RangeJoin.pointInInterval(pts, ivs, "p", "s", "e", 32,
      inclusiveEnd = false)
    assert(key(got, "pid", "iid") == key(naive, "pid", "iid"))
  }

  test("intervalOverlap == naive, exactly once, touching endpoints overlap") {
    val l = intervalsDf(60, 5, 90)
      .select(col("iid").as("lid"), col("s").as("ls"), col("e").as("le"))
    val r = intervalsDf(70, 6, 90)
      .select(col("iid").as("rid"), col("s").as("rs"), col("e").as("re"))
    val naive = l.where(col("le") >= col("ls")).crossJoin(r.where(col("re") >= col("rs")))
      .where(col("ls") <= col("re") && col("rs") <= col("le"))
    val expect = key(naive, "lid", "rid")
    assert(expect.nonEmpty)
    for (w <- Seq(1L, 16L, 128L)) {
      val got = RangeJoin.intervalOverlap(l, r, "ls", "le", "rs", "re", w)
      assert(key(got, "lid", "rid") == expect, s"width $w")
      assert(got.count() == expect.size, s"width $w duplicates")
    }
    // touching endpoints: [0,5] and [5,9] overlap (closed intervals)
    val a = l.limit(0).unionByName(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, 0L, 5L)), 1), l.schema))
    val b = r.limit(0).unionByName(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(2L, 5L, 9L)), 1), r.schema))
    assert(RangeJoin.intervalOverlap(a, b, "ls", "le", "rs", "re", 4).count() == 1)
  }

  test("plan is an equi-join, never a nested loop or cartesian") {
    val pts = pointsDf(100, 7)
    val ivs = intervalsDf(40, 8, 50)
    // defeat AQE's small-table broadcast so the SHUFFLED shape shows
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = RangeJoin.pointInInterval(pts, ivs, "p", "s", "e", 32)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"range join planned a quadratic join:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffled equi-join:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("explode guard fails loudly on a mis-sized bin width") {
    val pts = pointsDf(10, 9)
    val wide = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, 0L, 10_000_000L)), 1),
      StructType(Seq(StructField("iid", LongType, false),
        StructField("s", LongType, false), StructField("e", LongType, false))))
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(pts, wide, "p", "s", "e", 1, maxBinsPerInterval = 100)
        .count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("bins")), s"unhelpful error: $e")
  }

  test("column-name collisions are rejected up front") {
    val pts = pointsDf(5, 10)
    val ivs = intervalsDf(5, 11, 10).withColumnRenamed("iid", "pid")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts, ivs, "p", "s", "e", 8)
    }
    assert(e.getMessage.contains("disjoint"))
    // the internal bin column on ONE side passes disjointness but
    // would be silently overwritten then dropped — reject it too
    val poisoned = pointsDf(5, 12).withColumn("__rj_bin", lit(1L))
    val e2 = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(poisoned, intervalsDf(5, 13, 10), "p", "s", "e", 8)
    }
    assert(e2.getMessage.contains("__rj_bin"))
  }

  test("facade joinRange/joinAsof delegate to the operators, suffixing collisions") {
    val p = pointsDf(80, 20)
    // collide on 'pid' AND use colliding interval bound names
    val i = intervalsDf(30, 21, 40)
      .withColumnRenamed("iid", "pid")
    val direct = RangeJoin.pointInInterval(
      pointsDf(80, 20), intervalsDf(30, 21, 40), "p", "s", "e", 16)
      .select(col("pid"), col("iid")).collect().map(_.toSeq).toSet
    val viaFacade = VxFrame(p).joinRange(VxFrame(i), "p", "s", "e", 16)
    assert(viaFacade.df.columns.count(_ == "pid") == 1) // suffixed, not duplicated
    val got = viaFacade.df.select(col("pid"), col("pid_r")).collect().map(_.toSeq).toSet
    assert(got == direct)
    // suffix cascade: a left column already named like the suffixed
    // rename must not break the documented collision contract
    val pWithSr = p.withColumn("s", lit(0L)).withColumn("s_r", lit(1L))
    val cascaded = VxFrame(pWithSr).joinRange(VxFrame(i), "p", "s", "e", 16)
    assert(cascaded.df.columns.count(_ == "s_r") == 1 &&
      cascaded.df.columns.contains("s_r_r"))
    assert(cascaded.df.select(col("pid"), col("pid_r")).collect().map(_.toSeq).toSet
      == direct)
    // maxBinsPerInterval passes through to the operator guard
    val wide = intervalsDf(3, 22, 10)
      .withColumn("e", col("s") + 100000L)
    val err = intercept[Exception] {
      VxFrame(pointsDf(5, 23)).joinRange(VxFrame(wide), "p", "s", "e", 1,
        maxBinsPerInterval = 50).df.count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("50")))

    // joinAsof facade == operator
    val l = spark.createDataFrame(spark.sparkContext.parallelize(
      Seq(Row(1L, 10L), Row(1L, 20L), Row(2L, 15L)), 1),
      StructType(Seq(StructField("k", LongType, false), StructField("t", LongType, false))))
    val r = spark.createDataFrame(spark.sparkContext.parallelize(
      Seq(Row(1L, 5L, 100.0), Row(1L, 15L, 200.0), Row(2L, 30L, 300.0)), 1),
      StructType(Seq(StructField("k", LongType, false),
        StructField("rt", LongType, false), StructField("v", DoubleType, false))))
    val viaF = VxFrame(l).joinAsof(VxFrame(r), Seq("k"), "t", "rt", Seq("v"))
      .df.select("k", "t", "asof_v").collect()
      .map(x => (x.getLong(0), x.getLong(1), Option(x.get(2)))).toSet
    assert(viaF == Set((1L, 10L, Some(100.0)), (1L, 20L, Some(200.0)), (2L, 15L, None)))
  }

  test("double-valued points and intervals") {
    val pts = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(1L, -0.5), Row(2L, 0.0), Row(3L, 2.75), Row(4L, 9.99)), 1),
      StructType(Seq(StructField("pid", LongType, false),
        StructField("p", DoubleType, false))))
    val ivs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(10L, -1.0, 0.0), Row(11L, 2.5, 10.0)), 1),
      StructType(Seq(StructField("iid", LongType, false),
        StructField("s", DoubleType, false), StructField("e", DoubleType, false))))
    val got = key(RangeJoin.pointInInterval(pts, ivs, "p", "s", "e", 2), "pid", "iid")
    assert(got == Set(Seq(1L, 10L), Seq(2L, 10L), Seq(3L, 11L), Seq(4L, 11L)))
  }
}
