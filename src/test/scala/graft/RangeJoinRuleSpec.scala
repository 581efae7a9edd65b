package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterEach

/** The injected optimizer rule (GraftExtensions ->
  * graft.plans.RangeJoinRule): plain `join(pred)` / SQL BETWEEN range
  * joins rewrite to binned equi-joins when
  * spark.graft.rangeJoin.binWidth is set, with identical results and
  * no NestedLoop/Cartesian in the plan. */
class RangeJoinRuleSpec extends SparkSpec with BeforeAndAfterEach {

  private val WidthKey = "spark.graft.rangeJoin.binWidth"
  private val MaxBinsKey = "spark.graft.rangeJoin.maxBinsPerInterval"

  override def afterEach(): Unit = {
    // session-wide conf: never leak the rewrite into other suites'
    // plan-shape assertions
    spark.conf.unset(WidthKey)
    spark.conf.unset(MaxBinsKey)
    super.afterEach()
  }

  private def pts(n: Int, seed: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val rows = (0 until n).map(i => Row(i.toLong, rnd.nextInt(1201) - 600L))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3),
      StructType(Seq(StructField("pid", LongType, false), StructField("p", LongType, false))))
  }

  private def ivs(n: Int, seed: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      val s = rnd.nextInt(1201) - 600L
      Row(i.toLong, s, if (i % 9 == 0) s - 2 else s + rnd.nextInt(80).toLong)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("iid", LongType, false),
        StructField("s", LongType, false), StructField("e", LongType, false))))
  }

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("DataFrame range join rewrites to an equi-join with identical results") {
    val (p, i) = (pts(250, 1), ivs(60, 2))
    val joined = p.join(i, col("p") >= col("s") && col("p") <= col("e"))
    val naive = pairs(joined) // conf unset: stock plan
    assert(naive.nonEmpty)
    val stockPlan = joined.queryExecution.executedPlan.toString
    assert(stockPlan.contains("NestedLoop") || stockPlan.contains("Cartesian"),
      s"expected the stock plan to be quadratic:\n$stockPlan")

    spark.conf.set(WidthKey, "32")
    val rewritten = p.join(i, col("p") >= col("s") && col("p") <= col("e"))
    val plan = rewritten.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"rule did not fire:\n$plan")
    assert(pairs(rewritten) == naive)
    assert(rewritten.count() == naive.size) // exactly-once, no dup pairs
  }

  test("SQL BETWEEN joins rewrite too") {
    pts(200, 3).createOrReplaceTempView("rj_pts")
    ivs(50, 4).createOrReplaceTempView("rj_ivs")
    val sql = "SELECT pid, iid FROM rj_pts JOIN rj_ivs ON p BETWEEN s AND e"
    val naive = pairs(spark.sql(sql))
    spark.conf.set(WidthKey, "16")
    val rewritten = spark.sql(sql)
    val plan = rewritten.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
    assert(pairs(rewritten) == naive)
  }

  test("strict bounds and reversed operand order still rewrite, exactly") {
    val (p, i) = (pts(200, 5), ivs(60, 6))
    val cond = col("s") < col("p") && col("e") > col("p")
    val naive = pairs(p.join(i, cond))
    spark.conf.set(WidthKey, "8")
    val rewritten = p.join(i, cond)
    assert(!rewritten.queryExecution.executedPlan.toString.contains("NestedLoop"))
    assert(pairs(rewritten) == naive)
  }

  test("points on the RIGHT side of the join rewrite with preserved output order") {
    val (p, i) = (pts(150, 7), ivs(40, 8))
    val cond = col("p") >= col("s") && col("p") <= col("e")
    val naive = i.join(p, cond).select("iid", "pid").collect().map(_.toSeq).toSet
    spark.conf.set(WidthKey, "32")
    val rewritten = i.join(p, cond)
    assert(rewritten.columns.toSeq == Seq("iid", "s", "e", "pid", "p"))
    assert(!rewritten.queryExecution.executedPlan.toString.contains("NestedLoop"))
    assert(rewritten.select("iid", "pid").collect().map(_.toSeq).toSet == naive)
  }

  test("extra cross-side conjuncts are preserved") {
    val (p, i) = (pts(200, 9), ivs(60, 10))
    val cond = col("p") >= col("s") && col("p") <= col("e") && col("pid") % 3 =!= col("iid") % 2
    val naive = pairs(p.join(i, cond))
    spark.conf.set(WidthKey, "32")
    val rewritten = p.join(i, cond)
    assert(!rewritten.queryExecution.executedPlan.toString.contains("NestedLoop"))
    assert(pairs(rewritten) == naive)
  }

  test("joins that already have an equi key are left alone") {
    val p = pts(100, 11).withColumn("k", col("pid") % 5)
    val i = ivs(40, 12).withColumn("k2", col("iid") % 5)
    spark.conf.set(WidthKey, "32")
    val joined = p.join(i, col("k") === col("k2") && col("p") >= col("s") && col("p") <= col("e"))
    val plan = joined.queryExecution.optimizedPlan.toString
    assert(!plan.contains("__graft_rj_bin"), s"rule fired on an equi join:\n$plan")
  }

  test("LEFT OUTER point-in-interval (point side preserved) rewrites, exactly") {
    val (p, i) = (pts(250, 13), ivs(40, 14))
    val cond = col("p") >= col("s") && col("p") <= col("e")
    def rows(df: DataFrame): Set[(Long, Option[Long])] =
      df.select("pid", "iid").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    val naiveDf = p.join(i, cond, "left")
    val naive = rows(naiveDf)
    // left outer must actually exercise null-extension
    assert(naive.exists(_._2.isEmpty) && naive.exists(_._2.nonEmpty))
    spark.conf.set(WidthKey, "32")
    val rewritten = p.join(i, cond, "left")
    val plan = rewritten.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"rule did not fire on LeftOuter:\n$plan")
    assert(rows(rewritten) == naive)
    assert(rewritten.count() == naiveDf.count()) // unmatched points extend ONCE
  }

  test("RIGHT OUTER with the point side on the right (preserved) rewrites; " +
      "outer shapes preserving the INTERVAL side are left alone") {
    val (p, i) = (pts(150, 15), ivs(30, 16))
    val cond = col("p") >= col("s") && col("p") <= col("e")
    def rows(df: DataFrame): Set[(Option[Long], Long)] =
      df.select("iid", "pid").collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getLong(1))).toSet
    val naive = rows(i.join(p, cond, "right"))
    spark.conf.set(WidthKey, "32")
    val rewritten = i.join(p, cond, "right")
    assert(rewritten.queryExecution.optimizedPlan.toString.contains("__graft_rj_bin"))
    assert(rows(rewritten) == naive)
    // interval side preserved: the rewrite would null-extend an
    // unmatched interval once per covered bin — must NOT fire
    val badLeft = i.join(p, cond, "left")
    assert(!badLeft.queryExecution.optimizedPlan.toString.contains("__graft_rj_bin"))
    val badRight = p.join(i, cond, "right")
    assert(!badRight.queryExecution.optimizedPlan.toString.contains("__graft_rj_bin"))
    val full = p.join(i, cond, "full")
    assert(!full.queryExecution.optimizedPlan.toString.contains("__graft_rj_bin"))
  }

  test("maxBinsPerInterval guard raises through the rewrite") {
    val p = pts(10, 15)
    val wide = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, 0L, 50_000_000L)), 1),
      StructType(Seq(StructField("iid", LongType, false),
        StructField("s", LongType, false), StructField("e", LongType, false))))
    spark.conf.set(WidthKey, "1")
    spark.conf.set(MaxBinsKey, "1000")
    val joined = p.join(wide, col("p") >= col("s") && col("p") <= col("e"))
    assert(joined.queryExecution.optimizedPlan.toString.contains("__graft_rj_bin"))
    val e = intercept[Exception] { joined.count() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("bins")), s"unhelpful: $e")
  }

  test("timestamp BETWEEN (the SCD2 validity shape) rewrites; binWidth in seconds") {
    def t(min: Int) = java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusMinutes(min)
    val evRows = (0 until 120).map(i => Row(i.toLong, t(i * 7 % 300)))
    val ev = spark.createDataFrame(spark.sparkContext.parallelize(evRows, 2),
      StructType(Seq(StructField("eid", LongType, false),
        StructField("ts", TimestampNTZType, false))))
    val winRows = (0 until 12).map(i => Row(i.toLong, t(i * 20), t(i * 20 + 15)))
    val win = spark.createDataFrame(spark.sparkContext.parallelize(winRows, 1),
      StructType(Seq(StructField("wid", LongType, false),
        StructField("vf", TimestampNTZType, false),
        StructField("vt", TimestampNTZType, false))))
    val cond = col("ts") >= col("vf") && col("ts") < col("vt")
    val naive = ev.join(win, cond).select("eid", "wid").collect().map(_.toSeq).toSet
    assert(naive.nonEmpty)
    spark.conf.set(WidthKey, (15 * 60).toString) // 15-minute bins
    val rewritten = ev.join(win, cond)
    val plan = rewritten.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
    assert(rewritten.select("eid", "wid").collect().map(_.toSeq).toSet == naive)
  }

  test("date ranges rewrite; binWidth in days") {
    def d(n: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(n))
    val p = spark.createDataFrame(spark.sparkContext.parallelize(
      (0 until 90).map(i => Row(i.toLong, d(i * 3 % 200))), 2),
      StructType(Seq(StructField("pid", LongType, false),
        StructField("day", DateType, false))))
    val i = spark.createDataFrame(spark.sparkContext.parallelize(
      (0 until 10).map(k => Row(k.toLong, d(k * 19), d(k * 19 + 12))), 1),
      StructType(Seq(StructField("iid", LongType, false),
        StructField("s", DateType, false), StructField("e", DateType, false))))
    val cond = col("day") >= col("s") && col("day") <= col("e")
    val naive = pairs(p.join(i, cond).withColumnRenamed("day", "p"))
    spark.conf.set(WidthKey, "14")
    val rewritten = p.join(i, cond)
    assert(!rewritten.queryExecution.executedPlan.toString.contains("NestedLoop"))
    assert(pairs(rewritten.withColumnRenamed("day", "p")) == naive)
  }

  test("a present-but-invalid conf value fails loudly, not silently quadratic") {
    spark.conf.set(WidthKey, "16k")
    val e = intercept[Exception] {
      pts(5, 30).join(ivs(5, 31), col("p") >= col("s") && col("p") <= col("e")).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("positive long")), s"got: $e")
    spark.conf.set(WidthKey, "32")
    spark.conf.set(MaxBinsKey, "-5")
    val e2 = intercept[Exception] {
      pts(5, 32).join(ivs(5, 33), col("p") >= col("s") && col("p") <= col("e")).count()
    }
    assert(messages(e2).exists(_.contains("positive long")), s"got: $e2")
  }

  test("degenerate intervals and double-typed ranges behave like the stock plan") {
    val p = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(1L, -3.5), Row(2L, 0.0), Row(3L, 7.25)), 1),
      StructType(Seq(StructField("pid", LongType, false),
        StructField("p", DoubleType, false))))
    val i = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(10L, -4.0, -3.0), Row(11L, 5.0, 2.0), Row(12L, 0.0, 8.0)), 1),
      StructType(Seq(StructField("iid", LongType, false),
        StructField("s", DoubleType, false), StructField("e", DoubleType, false))))
    val cond = col("p") >= col("s") && col("p") <= col("e")
    val naive = pairs(p.join(i, cond))
    spark.conf.set(WidthKey, "4")
    assert(pairs(p.join(i, cond)) == naive)
    assert(naive == Set((1L, 10L), (2L, 12L), (3L, 12L)))
  }
}
