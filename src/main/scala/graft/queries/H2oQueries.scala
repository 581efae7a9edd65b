package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Q._

/** H2O db-benchmark-style groupby battery (reference:
  * benchmarks/groupbyh2o.py:7-80 — sum/mean by low- and high-
  * cardinality keys, range per group, top-k per group), adapted to the
  * star schema: l_returnflag×l_linestatus = low cardinality,
  * l_suppkey = medium, l_orderkey = high. These are the benchmark
  * queries BASELINE.md tracks for groupby throughput; at scale each is
  * one partial/final hash aggregation (or one window) over a pruned
  * 2-3 column scan. */
object H2oQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q1-style: sum by low-cardinality key
    "q_h2o_low" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(r(dsumD(col("l_quantity"))).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // q3-style: sum + mean by high-cardinality key, summarized (the
    // oracle hashes every group row; summarize to keep output bounded)
    "q_h2o_high" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity")).as("sq"), count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_groups"),
          r(max(col("sq")).cast("double"), 4).as("max_group_sum"),
          r(dsumD(col("sq").cast("double"))).as("total"),
          max(col("n")).as("max_group_n"))
    }),

    // q7-style: max - min per medium-cardinality group
    "q_h2o_range" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(r(max(col("l_extendedprice")) - min(col("l_extendedprice")), 4).as("price_range"))
        .orderBy("l_suppkey")
    }),

    // q8-style: top-2 rows per group by value (window + filter)
    "q_h2o_top2" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      t(s, dir, "lineitem")
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 2)
        .select(col("l_suppkey"), col("rk"), col("l_extendedprice"))
        .orderBy("l_suppkey", "rk")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_h2o_low" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty, COUNT(*) AS n
         |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_h2o_high" ->
      s"""WITH g AS (
         |  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(38,10))) AS sq, COUNT(*) AS n
         |  FROM lineitem GROUP BY 1)
         |SELECT COUNT(*) AS n_groups,
         |  ROUND(CAST(MAX(sq) AS DOUBLE), 4) AS max_group_sum,
         |  ${sqlR(sqlDsum("CAST(sq AS DOUBLE)"))} AS total,
         |  MAX(n) AS max_group_n
         |FROM g""".stripMargin,

    "q_h2o_range" ->
      """SELECT l_suppkey,
        |  ROUND(MAX(l_extendedprice) - MIN(l_extendedprice), 4) AS price_range
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_h2o_top2" ->
      """SELECT l_suppkey, rk, l_extendedprice FROM (
        |  SELECT l_suppkey, l_extendedprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS INT) AS rk
        |  FROM lineitem)
        |WHERE rk <= 2 ORDER BY l_suppkey, rk""".stripMargin
  )
}
