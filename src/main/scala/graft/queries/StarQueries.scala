package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** Core relational battery over the star schema: scans, filters,
  * aggregations, groupbys, joins, set ops, sorts.
  *
  * Each query mirrors an operator row from SURVEY.md §2 and carries a
  * DuckDB oracle in `oracleSql`. Every query output is deterministically
  * ordered and floating aggregates follow the exact-decimal strategy in
  * [[Q]].
  */
object StarQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.2 projection + filter (pushed to parquet scan)
    "q_filter_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") < lit("1997-01-01").cast("timestamp") && col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // §2.2 widening filter (mode='or'): predicate union kept as one where
    "q_filter_widen" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_quantity") < 2 || col("l_discount") > 0.09)
        .groupBy(col("l_returnflag").as("flag"))
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_extendedprice"))).as("sum_price"))
        .orderBy("flag")
    }),

    // §2.2 named selection -> conditional aggregation (selection= kwarg)
    "q_selection_agg" -> ((s, dir) => {
      val sel = col("l_discount") > 0.05 // named selection predicate
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("flag"))
        .agg(
          count(lit(1)).as("n_all"),
          count(when(sel, lit(1))).as("n_sel"),
          r(dsumD(when(sel, col("l_quantity")).otherwise(lit(null)))).as("qty_sel")
        )
        .orderBy("flag")
    }),

    // §2.4 flagship multi-aggregation (TPC-H Q1 shape; single pass —
    // mirrors vaex's multi-agg fusion, core/execution.py:130-170)
    "q1_agg" -> ((s, dir) => {
      th(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          r(dsumD(col("l_quantity"))).as("sum_qty"),
          r(dsumD(col("l_extendedprice"))).as("sum_base_price"),
          r(dsumD(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
          r(dsumD(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))).as("sum_charge"),
          dmean(col("l_quantity")).as("avg_qty"),
          dmean(col("l_extendedprice")).as("avg_price"),
          dmean(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order")
        )
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // §2.4 var/std from exact moment sums (vaex decomposition,
    // core/agg.py:421-457)
    "q_agg_stats" -> ((s, dir) => {
      val x = col("l_quantity")
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("flag"))
        .agg(count(x).as("n"), dsumD(x).as("s1"), dsumD(x * x).as("s2"))
        .select(
          col("flag"), col("n"),
          r(col("s1") / col("n"), 6).as("mean_qty"),
          r((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1), 6).as("var_qty"),
          r(sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1)), 6).as("std_qty")
        )
        .orderBy("flag")
    }),

    // §2.4 skew/kurtosis via population-moment formulas
    // (reference: core/agg.py:458-520)
    "q_agg_skew_kurt" -> ((s, dir) => {
      val x = col("l_extendedprice")
      th(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("flag"))
        .agg(count(x).as("n"), dsumD(x).as("s1"), dsumD(x * x).as("s2"),
             dsumD(x * x * x).as("s3"), dsumD(x * x * x * x).as("s4"))
        .select(
          col("flag"),
          r((col("s3") / col("n") - lit(3) * (col("s1") / col("n")) * (col("s2") / col("n"))
             + lit(2) * (col("s1") / col("n")) * (col("s1") / col("n")) * (col("s1") / col("n")))
            / ((col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n")))
               * sqrt(col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n")))), 6).as("skew"),
          r((col("s4") / col("n") - lit(4) * (col("s1") / col("n")) * (col("s3") / col("n"))
             + lit(6) * (col("s1") / col("n")) * (col("s1") / col("n")) * (col("s2") / col("n"))
             - lit(3) * (col("s1") / col("n")) * (col("s1") / col("n")) * (col("s1") / col("n")) * (col("s1") / col("n")))
            / ((col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n")))
               * (col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n")))) - lit(3), 6).as("kurt")
        )
        .orderBy("flag")
    }),

    // §2.4 covar/corr from moment sums (reference: core/dataframe.py:1248,1302)
    "q_corr_covar" -> ((s, dir) => {
      val x = col("l_quantity"); val y = col("l_extendedprice")
      th(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("flag"))
        .agg(count(lit(1)).as("n"), dsumD(x).as("sx"), dsumD(y).as("sy"),
             dsumD(x * y).as("sxy"), dsumD(x * x).as("sxx"), dsumD(y * y).as("syy"))
        .select(
          col("flag"), col("n"),
          r((col("sxy") - col("sx") * col("sy") / col("n")) / col("n"), 6).as("covar_pop"),
          r((col("sxy") - col("sx") * col("sy") / col("n"))
            / (sqrt(col("sxx") - col("sx") * col("sx") / col("n"))
               * sqrt(col("syy") - col("sy") * col("sy") / col("n"))), 6).as("corr")
        )
        .orderBy("flag")
    }),

    // §2.4 minmax (single-pass min+max, core/dataframe.py:1487)
    "q_minmax" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_linestatus").as("status"))
        .agg(min(col("l_quantity")).as("min_qty"), max(col("l_quantity")).as("max_qty"),
             min(col("l_extendedprice")).as("min_price"), max(col("l_extendedprice")).as("max_price"),
             min(col("l_shipdate")).as("min_ship"), max(col("l_shipdate")).as("max_ship"))
        .orderBy("status")
    }),

    // §2.4 exact per-group distinct (vaex nunique, src/agg_nunique.cpp)
    "q_nunique" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("flag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
             countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy("flag")
    }),

    // §2.4 ordered first/last -> min_by/max_by over a unique order key
    // (reference: core/agg.py:556-577 first/last with order_expression)
    "q_first_last" -> ((s, dir) => {
      // (orderkey, linenumber) is NOT unique in the synthetic data, so
      // the order key folds the value in: ties then pick equal values.
      val ord = (col("l_orderkey") * 100 + col("l_linenumber")) * lit(1000000000L) +
        round(col("l_extendedprice") * 100).cast("long")
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("flag"))
        .agg(min_by(col("l_extendedprice"), ord).as("first_price"),
             max_by(col("l_extendedprice"), ord).as("last_price"))
        .orderBy("flag")
    }),

    // §2.4 any/all (rewritten to bool aggs; reference core/agg.py:615-652)
    "q_any_all" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("flag"))
        .agg(bool_or(col("l_quantity") > 49).as("any_big"),
             bool_and(col("l_quantity") > 0).as("all_pos"),
             bool_or(col("l_discount") > 0.5).as("any_huge_disc"))
        .orderBy("flag")
    }),

    // §2.7 value_counts (reference: core/expression.py:994)
    "q_value_counts" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("value"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("value"))
    }),

    // §2.4 multi-key groupby (GrouperCombined, core/groupby.py:330)
    "q_groupby_multi" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"), year(col("l_shipdate")).cast("long").as("ship_year"))
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"))
        .orderBy("l_returnflag", "l_linestatus", "ship_year")
    }),

    // §2.4 BinnerTime -> date_trunc (reference: core/groupby.py:64)
    "q_groupby_time" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month"))
        .agg(count(lit(1)).as("n"), r(dsumD(col("o_totalprice"))).as("sum_total"))
        .orderBy("month")
    }),

    // §2.4 GrouperLimited: keep listed values, rest -> 'other'
    // (reference: core/groupby.py:468)
    "q_grouper_limited" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), col("o_orderpriority"))
          .otherwise(lit("other")).as("prio"))
        .agg(count(lit(1)).as("n"))
        .orderBy("prio")
    }),

    // §2.4 binby: 1-d fixed-width histogram grid (reference:
    // core/dataframe.py:7208 binby; src/binners.cpp BinnerScalar)
    "q_binby_1d" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(floor(col("l_quantity") / 5.0).cast("long").as("bin"))
        .agg(count(lit(1)).as("cnt"), r(dsumD(col("l_extendedprice"))).as("sum_price"))
        .orderBy("bin")
    }),

    // §2.4 binby 2-d grid (histogram2d shape)
    "q_binby_2d" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(floor(col("l_quantity") / 10.0).cast("long").as("bx"),
                 floor(col("l_discount") / 0.02).cast("long").as("by"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("bx", "by")
    }),

    // §2.4 binby 3-d: oracle-gates the N-dimensional DENSE-GRID path
    // itself (VxFrame.binby row-major tensor assembly, reference
    // core/dataframe.py:7208 binby is N-d) — the returned flat tensor
    // is re-exploded to (bx,by,bz,v) rows so every cell, including
    // empty ones, is hash-compared. Widths are spelled (vmax/shape) in
    // BOTH engines so IEEE division agrees bit-for-bit at bin edges.
    "q_binby_3d" -> ((s, dir) => {
      import s.implicits._
      val specs = Seq(
        ("l_quantity", 0.0, 50.0, 5),
        ("l_discount", 0.0, 0.12, 4),
        ("l_tax", 0.0, 0.09, 3))
      val grid = graft.VxFrame(t(s, dir, "lineitem")).binby(specs, count(lit(1)))
      val rows = for {
        ix <- 0 until 5; iy <- 0 until 4; iz <- 0 until 3
      } yield (ix.toLong, iy.toLong, iz.toLong, grid((ix * 4 + iy) * 3 + iz))
      rows.toDF("bx", "by", "bz", "v")
        .orderBy("bx", "by", "bz")
    }),

    // §2.4 binby dense-kernel path: oracle-gates the GridAggregates
    // TypedImperativeAggregates (count + min/max — deterministic
    // stats only; sum/mean accumulate doubles in partition order and
    // would hash-mismatch). Empty cells: count 0, extrema NULL
    // (binbyGrid's NaN mapped to null to match the oracle's LEFT
    // JOIN shape).
    "q_binby_grid" -> ((s, dir) => {
      import s.implicits._
      val f = graft.VxFrame(t(s, dir, "lineitem"))
      val specs = Seq(("l_quantity", 0.0, 50.0, 10), ("l_discount", 0.0, 0.12, 6))
      val cnt = f.binbyGrid(specs, graft.VxFrame.GridCount)
      val mn = f.binbyGrid(specs, graft.VxFrame.GridMin("l_extendedprice"))
      val mx = f.binbyGrid(specs, graft.VxFrame.GridMax("l_extendedprice"))
      def opt(v: Double): Option[Double] = if (v.isNaN) None else Some(v)
      val rows = for (ix <- 0 until 10; iy <- 0 until 6) yield {
        val i = ix * 6 + iy
        (ix.toLong, iy.toLong, cnt(i).toLong, opt(mn(i)), opt(mx(i)))
      }
      rows.toDF("bx", "by", "cnt", "mn", "mx").orderBy("bx", "by")
    }),

    // §2.3 inner equi-join, small dim broadcast
    "q_join_inner" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "inner")
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_orders"), r(dsumD(col("o_totalprice"))).as("revenue"))
        .orderBy("segment")
    }),

    // §2.3 dense-lookup join — the reference's join fast path (index
    // array probe, reference packages/vaex-core/vaex/join.py:36): dim
    // columns collected into flat arrays keyed by the surrogate key,
    // probe is a codegen'd array read inside the fact scan, zero
    // shuffle. Must produce bit-identical rows to the hash equi-join.
    "q_join_dense" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      val domain = c.agg(max("c_custkey")).head.getLong(0).toInt + 1
      graft.operators.DenseLookupJoin.lookupJoin(
          o, c.select("c_custkey", "c_mktsegment", "c_acctbal"),
          col("o_custkey"), "c_custkey", domain)
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_orders"),
          r(dsumD(col("o_totalprice"))).as("revenue"),
          r(dsumD(col("c_acctbal"))).as("bal"))
        .orderBy("segment")
    }),

    // §2.3 dense-lookup LEFT join: unmatched fact keys pad the dim
    // columns with nulls (the dim is filtered so ~1/3 of probes miss)
    "q_join_dense_left" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      val domain = c.agg(max("c_custkey")).head.getLong(0).toInt + 1
      val dim = c.where(col("c_custkey") % 3 =!= 0)
        .select("c_custkey", "c_mktsegment", "c_acctbal")
      graft.operators.DenseLookupJoin.lookupJoin(
          o, dim, col("o_custkey"), "c_custkey", domain, "left")
        .groupBy(coalesce(col("c_mktsegment"), lit("UNMATCHED")).as("segment"))
        .agg(count(lit(1)).as("n_orders"),
          count(col("c_acctbal")).as("n_matched"),
          r(coalesce(dsumD(col("c_acctbal")), lit(0.0))).as("bal"))
        .orderBy("segment")
    }),

    // §2.3 left join preserving unmatched build rows
    "q_join_left" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
             r(coalesce(dsumD(col("o_totalprice")), lit(0.0))).as("total"))
        .orderBy("c_custkey")
    }),

    // §2.3 multi-table star join (TPC-H Q5 shape; dims broadcast)
    "q_join_multi" -> ((s, dir) => {
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer"); val n = t(s, dir, "nation"); val rg = t(s, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(rg), n("n_regionkey") === rg("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(r(dsumD(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
        .orderBy("r_name", "n_name")
    }),

    // §2.3 semi join (isin-style EXISTS; reference core/expression.py:1194)
    "q_join_semi" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val big = t(s, dir, "lineitem").where(col("l_quantity") > 49)
      o.join(big, o("o_orderkey") === big("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // §2.3 anti join (NOT EXISTS)
    "q_join_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // §2.5 sort with deterministic tiebreak + limit (TakeOrdered)
    "q_sort" -> ((s, dir) => {
      t(s, dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // §2.5 top-k
    "q_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // §2.7 distinct (unique, reference core/dataframe.py:575)
    "q_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // §2.7 isin membership filter
    "q_isin" -> ((s, dir) => {
      t(s, dir, "nation")
        .where(col("n_regionkey").isin(0, 2))
        .select("n_nationkey", "n_name")
        .orderBy("n_nationkey")
    }),

    // §2.4 categorize fast path: dense ordinal-array aggregation
    // (reference README.md:60's >1e9 rows/s categorical groupby; our
    // DenseCatAgg kernel — flat per-task arrays, no hash probe).
    // l_quantity is integral-valued, so the double sums are exact and
    // bit-match the oracle regardless of merge order.
    "q_groupby_dense" -> ((s, dir) => {
      import graft.operators.DenseCatAgg
      DenseCatAgg.groupByOrdinal(t(s, dir, "lineitem"),
        col("l_linenumber"), 8,
        Seq(DenseCatAgg.Agg(col("l_quantity"), "sum", "sum_qty"),
          DenseCatAgg.Agg(col("l_quantity"), "min", "min_qty"),
          DenseCatAgg.Agg(col("l_quantity"), "max", "max_qty"),
          DenseCatAgg.Agg(col("l_quantity"), "mean", "avg_qty")),
        countAs = Some("n"))
        .withColumn("avg_qty", round(col("avg_qty"), 6))
        .orderBy("code")
    }),

    // Dense groupBy over ARBITRARY (non-ordinal) integral keys: the
    // r16 dictionary path — one bounded distinct pass builds the
    // key->ordinal dictionary, the scan probes it through a codegen'd
    // open-addressed lookup, the accumulate is the fused dense
    // kernel. Scattered keys (suppkey * 7919 mod 1e5) prove the
    // dictionary genuinely maps, not a cast. Integral l_quantity =
    // exact double sums, bit-stable vs the oracle.
    "q_groupby_dict" -> ((s, dir) => {
      import graft.operators.DenseCatAgg
      DenseCatAgg.groupByKeys(
        t(s, dir, "lineitem").select(
          ((col("l_suppkey") * 7919) % 100000).as("k"), col("l_quantity")),
        col("k"),
        Seq(DenseCatAgg.Agg(col("l_quantity"), "sum", "sum_qty"),
          DenseCatAgg.Agg(col("l_quantity"), "max", "max_qty")),
        countAs = Some("n"), keyAs = "k")
        .orderBy("k")
    }),

    // STRING-key dictionary-probe dense groupBy (r17): the commonest
    // real grouping key without ordinal_encode preprocessing — the
    // key string synthesizes from two columns so the dictionary is
    // genuinely observed, nulls form a group.
    "q_groupby_dict_str" -> ((s, dir) => {
      import graft.operators.DenseCatAgg
      DenseCatAgg.groupByKeys(
        t(s, dir, "lineitem").select(
          when(col("l_linenumber") === 7, lit(null)).otherwise(
            concat(col("l_returnflag"), lit("#"),
              (col("l_suppkey") % 50).cast("string"))).as("k"),
          col("l_quantity")),
        col("k"),
        Seq(DenseCatAgg.Agg(col("l_quantity"), "sum", "sum_qty"),
          DenseCatAgg.Agg(col("l_quantity"), "min", "min_qty")),
        countAs = Some("n"), keyAs = "k")
        .orderBy("k")
    }),

    // §2.7 concat / union with flexible resolve (reference:
    // core/dataset.py:687 DatasetConcatenated)
    "q_concat" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val a = li.where(col("l_quantity") < 10)
      val b = li.where(col("l_quantity") > 40)
      a.unionByName(b)
        .groupBy(col("l_returnflag").as("flag"))
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"))
        .orderBy("flag")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_groupby_dense" ->
      """SELECT l_linenumber AS code,
        |  CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
        |  CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
        |  CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
        |  ROUND(CAST(SUM(l_quantity) AS DOUBLE) / COUNT(l_quantity), 6) AS avg_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_groupby_dict" ->
      """SELECT (l_suppkey * 7919) % 100000 AS k,
        |  CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
        |  CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_groupby_dict_str" ->
      """SELECT CASE WHEN l_linenumber = 7 THEN NULL
        |  ELSE l_returnflag || '#' || CAST(l_suppkey % 50 AS VARCHAR) END AS k,
        |  CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
        |  CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1997-01-01' AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_filter_widen" ->
      s"""SELECT l_returnflag AS flag, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_extendedprice"))} AS sum_price
         |FROM lineitem WHERE l_quantity < 2 OR l_discount > 0.09
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_selection_agg" ->
      s"""SELECT l_returnflag AS flag, COUNT(*) AS n_all,
         |  COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_sel,
         |  ${sqlR(sqlDsum("CASE WHEN l_discount > 0.05 THEN l_quantity END"))} AS qty_sel
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty,
         |  ${sqlR(sqlDsum("l_extendedprice"))} AS sum_base_price,
         |  ${sqlR(sqlDsum("l_extendedprice * (1 - l_discount)"))} AS sum_disc_price,
         |  ${sqlR(sqlDsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)"))} AS sum_charge,
         |  ${sqlDmean("l_quantity")} AS avg_qty,
         |  ${sqlDmean("l_extendedprice")} AS avg_price,
         |  ${sqlDmean("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_stats" ->
      s"""WITH m AS (
         |  SELECT l_returnflag AS flag, COUNT(l_quantity) AS n,
         |    ${sqlDsum("l_quantity")} AS s1,
         |    ${sqlDsum("l_quantity * l_quantity")} AS s2
         |  FROM lineitem GROUP BY 1)
         |SELECT flag, n,
         |  ROUND(s1 / n, 6) AS mean_qty,
         |  ROUND((s2 - s1 * s1 / n) / (n - 1), 6) AS var_qty,
         |  ROUND(SQRT((s2 - s1 * s1 / n) / (n - 1)), 6) AS std_qty
         |FROM m ORDER BY flag""".stripMargin,

    "q_agg_skew_kurt" ->
      s"""WITH m AS (
         |  SELECT l_returnflag AS flag, COUNT(l_extendedprice) AS n,
         |    ${sqlDsum("l_extendedprice")} AS s1,
         |    ${sqlDsum("l_extendedprice * l_extendedprice")} AS s2,
         |    ${sqlDsum("l_extendedprice * l_extendedprice * l_extendedprice")} AS s3,
         |    ${sqlDsum("l_extendedprice * l_extendedprice * l_extendedprice * l_extendedprice")} AS s4
         |  FROM lineitem GROUP BY 1)
         |SELECT flag,
         |  ROUND((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
         |    / ((s2 / n - (s1 / n) * (s1 / n)) * SQRT(s2 / n - (s1 / n) * (s1 / n))), 6) AS skew,
         |  ROUND((s4 / n - 4 * (s1 / n) * (s3 / n) + 6 * (s1 / n) * (s1 / n) * (s2 / n)
         |    - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
         |    / ((s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n))) - 3, 6) AS kurt
         |FROM m ORDER BY flag""".stripMargin,

    "q_corr_covar" ->
      s"""WITH m AS (
         |  SELECT l_returnflag AS flag, COUNT(*) AS n,
         |    ${sqlDsum("l_quantity")} AS sx, ${sqlDsum("l_extendedprice")} AS sy,
         |    ${sqlDsum("l_quantity * l_extendedprice")} AS sxy,
         |    ${sqlDsum("l_quantity * l_quantity")} AS sxx,
         |    ${sqlDsum("l_extendedprice * l_extendedprice")} AS syy
         |  FROM lineitem GROUP BY 1)
         |SELECT flag, n,
         |  ROUND((sxy - sx * sy / n) / n, 6) AS covar_pop,
         |  ROUND((sxy - sx * sy / n)
         |    / (SQRT(sxx - sx * sx / n) * SQRT(syy - sy * sy / n)), 6) AS corr
         |FROM m ORDER BY flag""".stripMargin,

    "q_minmax" ->
      """SELECT l_linestatus AS status,
        |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
        |  MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
        |  MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_nunique" ->
      """SELECT l_returnflag AS flag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_first_last" ->
      """SELECT l_returnflag AS flag,
        |  ARG_MIN(l_extendedprice, (l_orderkey * 100 + l_linenumber) * 1000000000 + CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS first_price,
        |  ARG_MAX(l_extendedprice, (l_orderkey * 100 + l_linenumber) * 1000000000 + CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS last_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_any_all" ->
      """SELECT l_returnflag AS flag,
        |  BOOL_OR(l_quantity > 49) AS any_big,
        |  BOOL_AND(l_quantity > 0) AS all_pos,
        |  BOOL_OR(l_discount > 0.5) AS any_huge_disc
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_value_counts" ->
      """SELECT l_returnflag AS value, COUNT(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY cnt DESC, value""".stripMargin,

    "q_groupby_multi" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(YEAR(l_shipdate) AS BIGINT) AS ship_year,
         |  COUNT(*) AS n, ${sqlR(sqlDsum("l_quantity"))} AS sum_qty
         |FROM lineitem GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q_groupby_time" ->
      s"""SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month,
         |  COUNT(*) AS n, ${sqlR(sqlDsum("o_totalprice"))} AS sum_total
         |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_grouper_limited" ->
      """SELECT CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |  THEN o_orderpriority ELSE 'other' END AS prio, COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_binby_1d" ->
      s"""SELECT CAST(FLOOR(l_quantity / 5.0) AS BIGINT) AS bin,
         |  COUNT(*) AS cnt, ${sqlR(sqlDsum("l_extendedprice"))} AS sum_price
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_binby_2d" ->
      """SELECT CAST(FLOOR(l_quantity / 10.0) AS BIGINT) AS bx,
        |  CAST(FLOOR(l_discount / 0.02) AS BIGINT) AS by,
        |  COUNT(*) AS cnt
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_binby_3d" ->
      """WITH g AS (
        |  SELECT CAST(FLOOR(l_quantity / (50.0/5)) AS INT) AS bx,
        |    CAST(FLOOR(l_discount / (0.12/4)) AS INT) AS by,
        |    CAST(FLOOR(l_tax / (0.09/3)) AS INT) AS bz
        |  FROM lineitem
        |  WHERE l_quantity >= 0 AND l_quantity < 50
        |    AND l_discount >= 0 AND l_discount < 0.12
        |    AND l_tax >= 0 AND l_tax < 0.09),
        |c AS (SELECT bx, by, bz, COUNT(*) AS n FROM g GROUP BY 1, 2, 3),
        |cells AS (SELECT x.range AS bx, y.range AS by, z.range AS bz
        |  FROM range(0, 5) x, range(0, 4) y, range(0, 3) z)
        |SELECT CAST(cells.bx AS BIGINT) AS bx, CAST(cells.by AS BIGINT) AS by,
        |  CAST(cells.bz AS BIGINT) AS bz, CAST(COALESCE(c.n, 0) AS DOUBLE) AS v
        |FROM cells LEFT JOIN c
        |  ON cells.bx = c.bx AND cells.by = c.by AND cells.bz = c.bz
        |ORDER BY 1, 2, 3""".stripMargin,

    "q_binby_grid" ->
      """WITH g AS (
        |  SELECT CAST(FLOOR(l_quantity / (50.0/10)) AS INT) AS bx,
        |    CAST(FLOOR(l_discount / (0.12/6)) AS INT) AS by,
        |    l_extendedprice AS p
        |  FROM lineitem
        |  WHERE l_quantity >= 0 AND l_quantity < 50
        |    AND l_discount >= 0 AND l_discount < 0.12),
        |c AS (SELECT bx, by, COUNT(*) AS n, MIN(p) AS mn, MAX(p) AS mx
        |  FROM g GROUP BY 1, 2),
        |cells AS (SELECT x.range AS bx, y.range AS by
        |  FROM range(0, 10) x, range(0, 6) y)
        |SELECT CAST(cells.bx AS BIGINT) AS bx, CAST(cells.by AS BIGINT) AS by,
        |  CAST(COALESCE(c.n, 0) AS BIGINT) AS cnt, c.mn AS mn, c.mx AS mx
        |FROM cells LEFT JOIN c ON cells.bx = c.bx AND cells.by = c.by
        |ORDER BY 1, 2""".stripMargin,

    "q_join_inner" ->
      s"""SELECT c_mktsegment AS segment, COUNT(*) AS n_orders,
         |  ${sqlR(sqlDsum("o_totalprice"))} AS revenue
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_join_dense" ->
      s"""SELECT c_mktsegment AS segment, COUNT(*) AS n_orders,
         |  ${sqlR(sqlDsum("o_totalprice"))} AS revenue,
         |  ${sqlR(sqlDsum("c_acctbal"))} AS bal
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_join_dense_left" ->
      s"""SELECT COALESCE(c_mktsegment, 'UNMATCHED') AS segment,
         |  COUNT(*) AS n_orders, COUNT(c_acctbal) AS n_matched,
         |  ROUND(COALESCE(${sqlDsum("c_acctbal")}, 0.0), 4) AS bal
         |FROM orders LEFT JOIN
         |  (SELECT * FROM customer WHERE c_custkey % 3 <> 0) c
         |  ON o_custkey = c_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_join_left" ->
      s"""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
         |  ROUND(COALESCE(${sqlDsum("o_totalprice")}, 0.0), 4) AS total
         |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_join_multi" ->
      s"""SELECT r_name, n_name,
         |  ${sqlR(sqlDsum("l_extendedprice * (1 - l_discount)"))} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_join_semi" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity > 49)
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_sort" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 20""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus
        |FROM lineitem ORDER BY 1, 2""".stripMargin,

    "q_isin" ->
      """SELECT n_nationkey, n_name FROM nation
        |WHERE n_regionkey IN (0, 2) ORDER BY n_nationkey""".stripMargin,

    "q_concat" ->
      s"""SELECT l_returnflag AS flag, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty
         |FROM (SELECT * FROM lineitem WHERE l_quantity < 10
         |      UNION ALL
         |      SELECT * FROM lineitem WHERE l_quantity > 40)
         |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
