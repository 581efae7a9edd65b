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

    // q4-style: means of several measures by low-cardinality key
    "q_h2o_means" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(dmean(col("l_quantity")).as("m_qty"),
          dmean(col("l_extendedprice")).as("m_price"),
          dmean(col("l_discount")).as("m_disc"))
        .orderBy("l_returnflag")
    }),

    // q6-style: median + sd per group (sd from exact decimal moments —
    // Welford-style running variance is partition-order dependent)
    "q_h2o_median_sd" -> ((s, dir) => {
      val x = col("l_extendedprice")
      th(s, dir, "lineitem")
        .groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsumD(x).as("s1"), dsumD(x * x).as("s2"),
          expr("percentile(l_extendedprice, 0.5)").as("med0"))
        .select(col("l_linestatus"), r(col("med0"), 6).as("median_price"),
          r(sqrt(col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n"))), 6)
            .as("sd_price"))
        .orderBy("l_linestatus")
    }),

    // q9-style: r^2 = corr(x,y)^2 per group, from exact moment sums
    "q_h2o_r2" -> ((s, dir) => {
      val x = col("l_quantity"); val y = col("l_extendedprice")
      th(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), dsumD(x).as("sx"), dsumD(y).as("sy"),
          dsumD(x * y).as("sxy"), dsumD(x * x).as("sxx"), dsumD(y * y).as("syy"))
        .select(col("l_returnflag"),
          r(pow((col("sxy") - col("sx") * col("sy") / col("n"))
              / (sqrt(col("sxx") - col("sx") * col("sx") / col("n"))
                 * sqrt(col("syy") - col("sy") * col("sy") / col("n"))), 2), 6).as("r2"))
        .orderBy("l_returnflag")
    }),

    // q10-style: sum + count by many keys (wide-key hash aggregate)
    "q_h2o_many" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"),
          year(col("l_shipdate")).as("ship_year"),
          (col("l_quantity") < 25).as("small_qty"))
        .agg(r(dsumD(col("l_extendedprice"))).as("sum_price"), count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus", "ship_year", "small_qty")
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

    "q_h2o_means" ->
      s"""SELECT l_returnflag,
         |  ${sqlDmean("l_quantity")} AS m_qty,
         |  ${sqlDmean("l_extendedprice")} AS m_price,
         |  ${sqlDmean("l_discount")} AS m_disc
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_h2o_median_sd" ->
      s"""WITH g AS (
         |  SELECT l_linestatus, COUNT(*) AS n,
         |    ${sqlDsum("l_extendedprice")} AS s1,
         |    ${sqlDsum("l_extendedprice * l_extendedprice")} AS s2,
         |    quantile_cont(l_extendedprice, 0.5) AS med0
         |  FROM lineitem GROUP BY 1)
         |SELECT l_linestatus, ROUND(med0, 6) AS median_price,
         |  ROUND(SQRT(s2 / n - (s1 / n) * (s1 / n)), 6) AS sd_price
         |FROM g ORDER BY 1""".stripMargin,

    "q_h2o_r2" ->
      s"""WITH g AS (
         |  SELECT l_returnflag, COUNT(*) AS n,
         |    ${sqlDsum("l_quantity")} AS sx, ${sqlDsum("l_extendedprice")} AS sy,
         |    ${sqlDsum("l_quantity * l_extendedprice")} AS sxy,
         |    ${sqlDsum("l_quantity * l_quantity")} AS sxx,
         |    ${sqlDsum("l_extendedprice * l_extendedprice")} AS syy
         |  FROM lineitem GROUP BY 1)
         |SELECT l_returnflag,
         |  ROUND(POWER((sxy - sx * sy / n)
         |    / (SQRT(sxx - sx * sx / n) * SQRT(syy - sy * sy / n)), 2), 6) AS r2
         |FROM g ORDER BY 1""".stripMargin,

    "q_h2o_many" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(YEAR(l_shipdate) AS INT) AS ship_year,
         |  l_quantity < 25 AS small_qty,
         |  ${sqlR(sqlDsum("l_extendedprice"))} AS sum_price, COUNT(*) AS n
         |FROM lineitem GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""".stripMargin,

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
