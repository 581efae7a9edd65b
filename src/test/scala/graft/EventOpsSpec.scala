package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.EventOps

/** EventOps (funnel / cohort retention) and their VxFrame facade:
  * pinned against a driver-side naive recomputation on synthetic
  * events (independent of the Column algebra), plus the oracle lanes
  * q_event_funnel / q_cohort_retention which gate the SAME shared
  * definition against DuckDB. */
class EventOpsSpec extends SparkSpec {

  private def ts(min: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.of(2024, 3, 1, 0, 0).plusMinutes(min)

  /** (user, type, minute-offset) events with ties, out-of-order
    * stages, repeats, and users stalling at every stage. */
  private def events(): (org.apache.spark.sql.DataFrame, Seq[(Long, String, Long)]) = {
    val rnd = new scala.util.Random(7)
    val types = Seq("view", "click", "purchase", "refund")
    val rows = (0 until 400).map { i =>
      (rnd.nextInt(40).toLong, types(rnd.nextInt(4)), rnd.nextInt(500).toLong)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (u, t, m) => Row(u, t, ts(m)) }, 4),
      StructType(Seq(StructField("user_id", LongType, false),
        StructField("event_type", StringType, false),
        StructField("ts", TimestampNTZType, false))))
    (df, rows)
  }

  /** Naive funnel: per user, first stage-k event strictly after the
    * user's stage-(k-1) time. */
  private def naiveFunnel(rows: Seq[(Long, String, Long)],
                          stages: Seq[String]): Seq[(String, Long, Option[Long])] = {
    var reach: Map[Long, Long] = rows.filter(_._2 == stages.head)
      .groupBy(_._1).map { case (u, es) => u -> es.map(_._3).min }
    val out = scala.collection.mutable.ArrayBuffer[(String, Long, Option[Long])](
      (s"1_${stages.head}", reach.size.toLong, Some(0L)))
    stages.zipWithIndex.drop(1).foreach { case (st, k) =>
      val next = rows.filter(_._2 == st).groupBy(_._1).flatMap { case (u, es) =>
        reach.get(u).flatMap { prev =>
          val later = es.map(_._3).filter(_ > prev)
          if (later.isEmpty) None else Some(u -> (later.min, prev))
        }
      }
      val lag = if (next.isEmpty) None
        else Some(next.values.map { case (cur, prev) => (cur - prev) * 60000000L }.sum)
      out += ((s"${k + 1}_$st", next.size.toLong, lag))
      reach = next.map { case (u, (cur, _)) => u -> cur }
    }
    out.toSeq
  }

  test("funnel == naive recomputation (3 and 4 stages, strictly-later semantics)") {
    val (df, rows) = events()
    for (stages <- Seq(Seq("view", "click", "purchase"),
        Seq("view", "click", "purchase", "refund"), Seq("click", "view"))) {
      val got = EventOps.funnel(df, "user_id", "event_type", "ts", stages)
        .collect().map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
      assert(got == naiveFunnel(rows, stages), s"stages $stages")
    }
  }

  test("funnel: simultaneous events do NOT advance a stage (strict >)") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "view", ts(10)), Row(1L, "click", ts(10)), // tie: no advance
        Row(2L, "view", ts(10)), Row(2L, "click", ts(11))), 1),
      StructType(Seq(StructField("user_id", LongType, false),
        StructField("event_type", StringType, false),
        StructField("ts", TimestampNTZType, false))))
    val got = EventOps.funnel(df, "user_id", "event_type", "ts",
        Seq("view", "click")).collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq
      == Seq(("1_view", 2L), ("2_click", 1L)))
    assert(got(1).getLong(2) == 60000000L) // exactly one minute, in micros
  }

  test("cohortRetention == naive recomputation (periods 7 and 3)") {
    val (df, rows) = events()
    // anchor == the events' own date floor (2024-03-01), so
    // day-since-anchor = minute-offset / 1440
    for (period <- Seq(7, 3)) {
      val days = rows.map { case (u, _, m) => (u, m / 1440) }
      val firstDay = days.groupBy(_._1).map { case (u, ds) => u -> ds.map(_._2).min }
      val expect = days.map { case (u, d) =>
        (firstDay(u) / period, (d - firstDay(u)) / period, u)
      }.distinct.groupBy(t => (t._1, t._2)).map { case ((c, o), us) =>
        (c, o, us.size.toLong)
      }.toSeq.sorted
      val got = EventOps.cohortRetention(df, "user_id", "ts", "2024-03-01", period)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == expect, s"period $period")
    }
  }

  test("facade == operator, and both ride ONE shared definition") {
    val (df, _) = events()
    val viaOp = EventOps.funnel(df, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase")).collect().map(_.toSeq).toSeq
    val viaFacade = VxFrame(df).funnel(Seq("view", "click", "purchase"))
      .df.collect().map(_.toSeq).toSeq
    assert(viaOp == viaFacade)
    val cOp = EventOps.cohortRetention(df, "user_id", "ts", "2024-03-01", 7)
      .collect().map(_.toSeq).toSeq
    val cFacade = VxFrame(df).cohortRetention("2024-03-01", 7)
      .df.collect().map(_.toSeq).toSeq
    assert(cOp == cFacade)
  }

  test("10+ stages: padded ordinals keep lexicographic order == funnel order") {
    val types = (0 until 12).map(k => s"t$k")
    val rows = (0 until 12).flatMap(k =>
      (0 until 3).map(u => Row(u.toLong, s"t$k", ts(k * 10 + u))))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("user_id", LongType, false),
        StructField("event_type", StringType, false),
        StructField("ts", TimestampNTZType, false))))
    val got = EventOps.funnel(df, "user_id", "event_type", "ts", types)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // rows arrive ordered by stage; the ordinals must match funnel order
    assert(got.map(_._1).toSeq ==
      (0 until 12).map(k => f"${k + 1}%02d_t$k"), got.map(_._1).toSeq)
    assert(got.forall(_._2 == 3L)) // every user advances each stage
    // <= 9 stages keep the unpadded labels the oracle pins
    val small = EventOps.funnel(df, "user_id", "event_type", "ts",
      Seq("t0", "t1")).collect().map(_.getString(0)).toSeq
    assert(small == Seq("1_t0", "2_t1"))
  }

  test("argument validation") {
    val (df, _) = events()
    intercept[IllegalArgumentException] {
      EventOps.funnel(df, "user_id", "event_type", "ts", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      EventOps.funnel(df, "user_id", "event_type", "ts", Seq("view", "view"))
    }
    intercept[IllegalArgumentException] {
      EventOps.cohortRetention(df, "user_id", "ts", "2024-03-01", 0)
    }
  }
}
