package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.VxFrame
import Q._

/** Oracle-gated queries exercising the VxFrame facade end-to-end —
  * virtual columns + variables, widening filters, selection-aware
  * conditional aggregation, state round-trip, and the groupby
  * agg-spec path. These prove the facade lowers to exactly the plans
  * the plain-DataFrame batteries run (reference semantics:
  * core/dataframe.py filter/select/add_virtual_column).
  */
object FacadeQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // virtual columns + variable substitution, computed per l_returnflag
    "q_facade_virtual" -> ((s, dir) => {
      VxFrame(t(s, dir, "lineitem"))
        .withVariable("taxRate", 0.08)
        .withVirtualColumn("gross", "l_extendedprice * (1 - l_discount)")
        .withVirtualColumn("taxed", "gross * (1 + taxRate)")
        .df.groupBy(col("l_returnflag"))
        .agg(r(dsumD(col("taxed"))).as("sum_taxed"))
        .orderBy("l_returnflag")
    }),

    // widening filter: and-narrow then or-widen, count per flag
    "q_facade_filter_widen" -> ((s, dir) => {
      VxFrame(t(s, dir, "lineitem"))
        .filter("l_quantity < 5")
        .filter("l_quantity > 45", "or")
        .df.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // selection-aware aggregation: one pass, selected vs total sums
    "q_facade_selection" -> ((s, dir) => {
      val f = VxFrame(t(s, dir, "lineitem")).select("l_discount > 0.05")
      f.df.groupBy(col("l_returnflag"))
        .agg(
          r(dsumD(when(f.selectionColumn(), col("l_quantity")))).as("sum_sel"),
          r(dsumD(col("l_quantity"))).as("sum_all"))
        .orderBy("l_returnflag")
    }),

    // state round-trip: serialize virtual cols + filter, re-apply on a
    // fresh frame over the same base, then aggregate
    "q_facade_state" -> ((s, dir) => {
      val configured = VxFrame(t(s, dir, "orders"))
        .withVirtualColumn("bucket", "CAST(FLOOR(o_totalprice / 50000) AS INT)")
        .filter("o_orderstatus = 'F'")
      val restored = VxFrame(t(s, dir, "orders")).stateSet(configured.stateGet())
      restored.df.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), r(dsumD(col("o_totalprice"))).as("sum_price"))
        .orderBy("bucket")
    }),

    // categorize: int codes -> label metadata -> virtual label column
    // (reference: core/dataframe.py:5858 categorize; the groupBy runs on
    // the int code — the categorical ordinal fast path — and labels are
    // attached by expression, no join)
    "q_facade_categorize" -> ((s, dir) => {
      graft.VxFrame(t(s, dir, "lineitem"))
        .withVirtualColumn("qty_code", "CAST(l_quantity AS INT) % 4")
        .categorize("qty_code", Seq("tiny", "small", "med", "large"))
        .withCategoryLabels("qty_code", "qty_label")
        .df.groupBy(col("qty_code"), col("qty_label"))
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_extendedprice"))).as("sum_price"))
        .orderBy("qty_code")
    }),

    // virtual columns authored in VAEX PYTHON-EXPRESSION syntax
    // (reference grammar: core/expresso.py:33-41; canonical state shape
    // z = x + t*y with variable t, tests/common.py:379-381), translated
    // by ExprLang before Catalyst parsing
    "q_facade_pyexpr" -> ((s, dir) => {
      val f = VxFrame(t(s, dir, "lineitem"))
        .withVariable("t", 2.0)
        .withVirtualColumn("z", "l_quantity + t*l_discount")
        .withVirtualColumn("zpow", "l_quantity**2 // 3")
        .select("(l_quantity > 25) & (l_discount < 0.05)")
      f.df.groupBy(col("l_returnflag"))
        .agg(
          r(dsumD(col("z"))).as("sum_z"),
          sum(col("zpow")).as("sum_zpow"),
          count(when(f.selectionColumn(), lit(1))).as("n_sel"))
        .orderBy("l_returnflag")
    }),

    // categorize'd groupby AUTO-ROUTES through the dense ordinal
    // kernel (reference: core/dataframe.py:5858 — categorize makes the
    // ordinal fast path the DEFAULT; README.md:60's >1e9 rows/s lane).
    // Multi-key: the facade composes one row-major composite code,
    // decodes the (domain-bounded) result and casts back to the hash
    // path's exact schema — so this oracle IS the hash-path oracle
    // shape. DenseCatAggSpec asserts the dense kernel actually ran.
    "q_facade_groupby_dense" -> ((s, dir) => {
      import scala.collection.immutable.ListMap
      VxFrame(t(s, dir, "lineitem"))
        .withVirtualColumn("qty_code", "CAST(l_quantity AS INT) % 4")
        .categorize("l_linenumber", (0 until 8).map(i => s"line$i"))
        .categorize("qty_code", Seq("tiny", "small", "med", "large"))
        .groupby(Seq("l_linenumber", "qty_code"),
          ListMap("l_quantity" -> "sum", "l_discount" -> "max",
            "l_tax" -> "min", "l_extendedprice" -> "count",
            "l_suppkey" -> "mean"),
          sort = true)
        .df.select(col("l_linenumber"), col("qty_code"),
          col("l_quantity_sum").as("sum_qty"),
          col("l_discount_max").as("max_disc"),
          col("l_tax_min").as("min_tax"),
          col("l_extendedprice_count").as("n_price"),
          round(col("l_suppkey_mean"), 6).as("avg_sk"))
    }),

    // groupby agg-spec normalization incl. file-order first (min_by row_index)
    "q_facade_groupby" -> ((s, dir) => {
      val base = t(s, dir, "orders")
        .withColumn("row_index", col("o_orderkey")) // deterministic stand-in order
      VxFrame(base)
        .groupby(Seq("o_orderpriority"),
          Map("o_totalprice" -> "max", "o_orderkey" -> "nunique", "o_custkey" -> "first"),
          sort = true)
        .df.select(
          col("o_orderpriority"),
          r(col("o_totalprice_max"), 2).as("max_price"),
          col("o_orderkey_nunique").as("n_orders"),
          col("o_custkey_first").as("first_cust"))
    }),

    // facade join auto-routing through the dense-lookup fast path: a
    // categorize'd right key (known ordinal domain) makes
    // VxFrame.join lower to operators.DenseLookupJoin — this row
    // hash-matches the same aggregation the hash-join lane computes
    "q_facade_join_dense" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      val domain = c.agg(max("c_custkey")).head.getLong(0).toInt + 1
      val cf = VxFrame(c.select("c_custkey", "c_mktsegment", "c_acctbal"))
        .categorizeOrdinal("c_custkey", domain)
      VxFrame(o.withColumnRenamed("o_custkey", "c_custkey"))
        .join(cf, Seq("c_custkey"), how = "inner")
        .df.groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_orders"),
          r(dsumD(col("o_totalprice"))).as("revenue"))
        .orderBy("segment")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_facade_virtual" ->
      s"""SELECT l_returnflag,
         |  ${sqlR(sqlDsum("l_extendedprice * (1 - l_discount) * (1 + (0.08))"))} AS sum_taxed
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_facade_filter_widen" ->
      """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
        |WHERE (l_quantity < 5) OR (l_quantity > 45)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_facade_selection" ->
      s"""SELECT l_returnflag,
         |  ${sqlR(sqlDsum("CASE WHEN l_discount > 0.05 THEN l_quantity END"))} AS sum_sel,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_all
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_facade_state" ->
      s"""SELECT CAST(FLOOR(o_totalprice / 50000) AS INT) AS bucket, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("o_totalprice"))} AS sum_price
         |FROM orders WHERE o_orderstatus = 'F' GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_facade_categorize" ->
      s"""SELECT CAST(l_quantity AS INT) % 4 AS qty_code,
         |  CASE CAST(l_quantity AS INT) % 4
         |    WHEN 0 THEN 'tiny' WHEN 1 THEN 'small'
         |    WHEN 2 THEN 'med' WHEN 3 THEN 'large' END AS qty_label,
         |  COUNT(*) AS n, ${sqlR(sqlDsum("l_extendedprice"))} AS sum_price
         |FROM lineitem GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    "q_facade_pyexpr" ->
      s"""SELECT l_returnflag,
         |  ${sqlR(sqlDsum("l_quantity + 2.0*l_discount"))} AS sum_z,
         |  CAST(SUM(CAST(FLOOR(POWER(l_quantity, 2) / 3) AS BIGINT)) AS BIGINT) AS sum_zpow,
         |  COUNT(CASE WHEN l_quantity > 25 AND l_discount < 0.05 THEN 1 END) AS n_sel
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_facade_groupby_dense" ->
      """SELECT l_linenumber, CAST(l_quantity AS INT) % 4 AS qty_code,
        |  SUM(l_quantity) AS sum_qty,
        |  MAX(l_discount) AS max_disc,
        |  MIN(l_tax) AS min_tax,
        |  COUNT(l_extendedprice) AS n_price,
        |  ROUND(CAST(SUM(l_suppkey) AS DOUBLE) / COUNT(l_suppkey), 6) AS avg_sk
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_facade_groupby" ->
      """SELECT o_orderpriority, ROUND(MAX(o_totalprice), 2) AS max_price,
        |  COUNT(DISTINCT o_orderkey) AS n_orders,
        |  MIN_BY(o_custkey, o_orderkey) AS first_cust
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_facade_join_dense" ->
      s"""SELECT c_mktsegment AS segment, COUNT(*) AS n_orders,
         |  ${sqlR(sqlDsum("o_totalprice"))} AS revenue
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
