package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin
import graft.queries.Q

/** Scale-path mechanisms: salted skew joins, bucketed co-located joins
  * (no exchange in the plan), and the approx variants of exact
  * operators (percentile_approx, approx_count_distinct) that replace
  * their exact forms at extreme scale. */
class ScalePathSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin: same result as plain join, hot key spread over salt buckets") {
    // skew: key 1 has 1000 rows, others 1 each
    val left = ((1 to 1000).map(i => (1L, i.toDouble)) ++ Seq((2L, 1.0), (3L, 2.0)))
      .toDF("k", "v")
    val right = Seq((1L, "hot"), (2L, "a"), (3L, "b")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).groupBy("k").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val salted = SkewJoin.saltedJoin(left, right, Seq("k"), salt = 8)
      .groupBy("k").count().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(salted == plain)
    assert(salted(1L) == 1000L)
  }

  test("saltedJoin left-outer keeps unmatched rows") {
    val left = Seq((1L, 1.0), (9L, 2.0)).toDF("k", "v")
    val right = Seq((1L, "a")).toDF("k", "name")
    val got = SkewJoin.saltedJoin(left, right, Seq("k"), 4, "left")
      .collect().map(r => (r.getLong(0), Option(r.getAs[String]("name")))).toMap
    assert(got == Map(1L -> Some("a"), 9L -> None))
  }

  test("bucketed tables join without a shuffle exchange") {
    val a = (0 until 1000).map(i => (i.toLong % 50, i.toDouble)).toDF("k", "va")
    val b = (0 until 500).map(i => (i.toLong % 50, i.toString)).toDF("k", "vb")
    a.write.mode("overwrite").bucketBy(8, "k").saveAsTable("bkt_a")
    b.write.mode("overwrite").bucketBy(8, "k").saveAsTable("bkt_b")
    val joined = spark.table("bkt_a").join(spark.table("bkt_b"), Seq("k"))
    // disable broadcast so the co-location is what avoids the shuffle
    withBroadcastOff {
      val j2 = spark.table("bkt_a").join(spark.table("bkt_b"), Seq("k"))
      j2.collect()
      val p = j2.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"), p.take(2000))
      assert(p.contains("SortMergeJoin"), p.take(500))
    }
    assert(joined.count() == 10000) // 1000 x 500 / 50 matches
  }

  private def withBroadcastOff[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("approx percentile tracks exact within tolerance") {
    val df = Q.t(spark, sf0001, "lineitem")
    val r = df.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("percentile_approx(l_extendedprice, 0.5, 1000)").as("approx")).head()
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(exact - approx) / exact < 0.05, s"$exact vs $approx")
  }

  test("approx_count_distinct tracks exact within documented error") {
    val df = Q.t(spark, sf0001, "lineitem")
    val r = df.agg(
      count_distinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey"), 0.02).as("approx")).head()
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(exact - approx).toDouble / exact < 0.05, s"$exact vs $approx")
  }
}
