package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VxFunctions
import Q._

/** Scalar-function batteries (SURVEY.md §2.8): strings, datetime,
  * timedelta, null/NaN trichotomy. Each battery applies the
  * [[graft.functions.VxFunctions]] surface over a star table and is
  * checked value-for-value against DuckDB.
  */
object FuncQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // str.* family (reference: core/functions.py:963-2402)
    "q_str_funcs" -> ((s, dir) => {
      val F = VxFunctions.str
      t(s, dir, "part").select(
        col("p_partkey"),
        F.upper(col("p_name")).as("up"),
        F.lower(col("p_brand")).as("lo"),
        F.len(col("p_name")).as("len"),
        F.slice(col("p_name"), 0, 8).as("sl"),
        F.zfill(col("p_size").cast("string"), 5).as("zf"),
        concat(col("p_brand"), lit("-"), col("p_type")).as("cat"),
        F.contains(col("p_name"), "a").as("has_a"),
        F.startswith(col("p_type"), "S").as("sw"),
        F.endswith(col("p_type"), "D").as("ew"),
        F.find(col("p_name"), "art").as("pos"),
        F.repeat(col("p_brand"), 2).as("rep"),
        F.strip(F.ljust(col("p_brand"), 12)).as("just_strip"),
        element_at(split(col("p_type"), " "), 1).as("tok0"),
        F.get(col("p_name"), 2).as("ch2"),
        F.get(col("p_name"), -1).as("chlast"),
        reverse(col("p_brand")).as("rev")
      ).orderBy("p_partkey")
    }),

    // str regex + predicate family
    "q_str_regex" -> ((s, dir) => {
      val F = VxFunctions.str
      t(s, dir, "part").select(
        col("p_partkey"),
        F.extractRegex(col("p_name"), "([0-9]+)").as("num"),
        F.replace(col("p_name"), "[aeiou]", "_", regex = true).as("novowel"),
        F.replace(col("p_brand"), "BRAND", "B", regex = false).as("lit_repl"),
        F.matchPattern(col("p_type"), "[A-Z]+").as("m"),
        col("p_name").rlike("part_[0-9]").as("rl"),
        F.isdigit(F.extractRegex(col("p_name"), "([0-9]+)")).as("isdig"),
        F.isalpha(col("p_brand")).as("isalp"),
        F.count(col("p_name"), "a").as("cnt_a")
      ).orderBy("p_partkey")
    }),

    // str.* family part 2: padding/case/class predicates
    "q_str_funcs2" -> ((s, dir) => {
      val F = VxFunctions.str
      t(s, dir, "part").select(
        col("p_partkey"),
        F.capitalize(col("p_type")).as("cap"),
        F.title(col("p_name")).as("tit"),
        F.center(col("p_brand"), 12, "*").as("ctr"),
        F.rjust(col("p_brand"), 10, ".").as("rj"),
        F.lstrip(F.center(col("p_brand"), 12)).as("lst"),
        F.rstrip(F.center(col("p_brand"), 12)).as("rst"),
        F.byteLength(col("p_name")).as("blen"),
        F.isalnum(regexp_replace(col("p_brand"), "#", "")).as("aln"),
        F.isspace(lit("  ")).as("sp"),
        F.islower(col("p_name")).as("low"),
        F.isupper(col("p_brand")).as("upp"),
        F.join("-", split(col("p_type"), " ")).as("joined")
      ).orderBy("p_partkey")
    }),

    // str stragglers: rfind/rindex/index (reference: core/functions.py
    // :1757/:1793/:1376) and rsplit (:1943) — right-anchored search and
    // split, built from reversed builtins (no UDF)
    "q_str_funcs3" -> ((s, dir) => {
      val F = VxFunctions.str
      t(s, dir, "part").select(
        col("p_partkey"),
        F.rfind(col("p_name"), " ").as("rf"),
        F.rindex(col("p_name"), " ").as("ri"),
        F.index(col("p_name"), " ").as("ix"),
        F.find(col("p_name"), "zzzz").as("nf"),
        F.rfind(col("p_name"), "zzzz").as("nrf"),
        element_at(F.rsplit(col("p_name"), " ", 1), 1).as("rs_head"),
        element_at(F.rsplit(col("p_name"), " ", 1), 2).as("rs_tail"),
        array_join(F.rsplit(col("p_type"), " ", 2), "|").as("rs2")
      ).orderBy("p_partkey")
    }),

    // dt.* family (reference: core/functions.py:302-808); Monday=0
    // dayofweek and ISO week are the two documented gaps vs Spark.

    "q_dt_funcs" -> ((s, dir) => {
      val D = VxFunctions.dt
      t(s, dir, "events").select(
        col("event_id"),
        D.year(col("ts")).as("y"),
        D.month(col("ts")).as("mo"),
        D.day(col("ts")).as("d"),
        D.hour(col("ts")).as("h"),
        D.minute(col("ts")).as("mi"),
        D.second(col("ts")).as("sec"),
        D.dayofweek(col("ts")).as("dow"),
        D.dayofyear(col("ts")).as("doy"),
        D.weekofyear(col("ts")).as("wk"),
        D.quarter(col("ts")).as("q"),
        D.isLeapYear(col("ts")).as("leap"),
        D.monthName(col("ts")).as("mname"),
        D.dayName(col("ts")).as("dname"),
        D.strftime(col("ts"), "yyyy-MM-dd HH").as("fmt"),
        D.floor(col("ts"), "D").cast("date").as("day_floor"),
        epochUs(col("ts")).as("us")
      ).orderBy("event_id")
    }),

    // td.* family (reference: core/functions.py:810-962)
    "q_td_funcs" -> ((s, dir) => {
      val T = VxFunctions.td
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val j = li.join(o, li("l_orderkey") === o("o_orderkey"))
      val micros = T.between(col("o_orderdate"), col("l_shipdate"))
      j.groupBy(col("l_returnflag").as("flag"))
        .agg(
          min(T.days(micros)).as("min_days"),
          max(T.days(micros)).as("max_days"),
          r(dsumD(T.totalSeconds(micros)), 2).as("sum_secs"),
          count(lit(1)).as("n")
        ).orderBy("flag")
    }),

    // null/NaN trichotomy (reference: core/functions.py:147-268):
    // nulls and NaNs synthesized deterministically from `value`,
    // aggregations reproduce vaex's skip-NaN sum semantics.
    "q_null_funcs" -> ((s, dir) => {
      val v = when(col("value") < 1.0, lit(null)).otherwise(col("value"))
      val nv = when(col("value") >= 1.0 && col("value") < 2.0, lit(Double.NaN)).otherwise(v)
      t(s, dir, "events").groupBy(col("event_type").as("etype"))
        .agg(
          count(lit(1)).as("n"),
          count(v).as("n_notmissing"),
          count(when(VxFunctions.ismissing(nv), lit(1))).as("n_missing"),
          count(when(VxFunctions.isnan_(nv), lit(1))).as("n_nan"),
          count(when(VxFunctions.isna(nv), lit(1))).as("n_na"),
          r(dsumD(when(VxFunctions.notna(nv), nv)), 4).as("sum_valid"),
          r(dsumD(VxFunctions.fillna(nv, lit(0.0))), 4).as("sum_filled"),
          r(dsumD(VxFunctions.fillmissing(v, lit(-1.0))), 4).as("sum_fillmissing")
        ).orderBy("etype")
    }),

    // dict-mapper (reference: core/expression.py map): literal remap
    // with default, no UDF, no join
    "q_map_values" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(VxFunctions.mapValues(col("l_returnflag"),
            Map("A" -> 1.0, "R" -> 2.0), lit(-1.0)).as("score"),
          col("l_quantity"))
        .groupBy("score")
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"))
        .orderBy("score")
    }),

    // math battery: sinc/clip/digitize/log/sqrt/trig over one pass
    "q_math_funcs" -> ((s, dir) => {
      val x = col("l_quantity"); val d = col("l_discount")
      t(s, dir, "lineitem").groupBy(col("l_returnflag").as("flag"))
        .agg(
          r(dsumD(VxFunctions.clip(x, lit(5.0), lit(45.0))), 4).as("sum_clip"),
          r(dsumD(sqrt(x)), 6).as("sum_sqrt"),
          r(dsumD(log(x + 1.0)), 6).as("sum_log1p"),
          r(dsumD(VxFunctions.digitize(x, Seq(10.0, 20.0, 30.0, 40.0)).cast("double")), 4).as("sum_digitize"),
          r(dsumD(abs(d - 0.05)), 6).as("sum_absdev"),
          r(dsumD(pow(x, 2.0)), 4).as("sum_x2"),
          r(dsumD(floor(x / 7.0) + ceil(d * 10.0)), 4).as("sum_floorceil"),
          r(dsumD(VxFunctions.where_(x > 25, x * 2, x / 2)), 4).as("sum_where")
        ).orderBy("flag")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_map_values" ->
      s"""SELECT CAST(CASE l_returnflag WHEN 'A' THEN 1.0 WHEN 'R' THEN 2.0
         |    ELSE -1.0 END AS DOUBLE) AS score,
         |  COUNT(*) AS n, ${sqlR(sqlDsum("l_quantity"))} AS sum_qty
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_str_funcs" ->
      """SELECT p_partkey,
        |  UPPER(p_name) AS up, LOWER(p_brand) AS lo,
        |  CAST(LENGTH(p_name) AS BIGINT) AS len,
        |  SUBSTRING(p_name, 1, 8) AS sl,
        |  CASE WHEN LENGTH(CAST(p_size AS VARCHAR)) >= 5 THEN CAST(p_size AS VARCHAR)
        |       ELSE LPAD(CAST(p_size AS VARCHAR), 5, '0') END AS zf,
        |  p_brand || '-' || p_type AS cat,
        |  CONTAINS(p_name, 'a') AS has_a,
        |  STARTS_WITH(p_type, 'S') AS sw,
        |  p_type LIKE '%D' AS ew,
        |  CAST(STRPOS(p_name, 'art') AS BIGINT) - 1 AS pos,
        |  REPEAT(p_brand, 2) AS rep,
        |  TRIM(CASE WHEN LENGTH(p_brand) >= 12 THEN p_brand ELSE RPAD(p_brand, 12, ' ') END) AS just_strip,
        |  SPLIT_PART(p_type, ' ', 1) AS tok0,
        |  SUBSTRING(p_name, 3, 1) AS ch2,
        |  SUBSTRING(p_name, LENGTH(p_name), 1) AS chlast,
        |  REVERSE(p_brand) AS rev
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_str_regex" ->
      """SELECT p_partkey,
        |  REGEXP_EXTRACT(p_name, '([0-9]+)', 1) AS num,
        |  REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS novowel,
        |  REPLACE(p_brand, 'BRAND', 'B') AS lit_repl,
        |  REGEXP_MATCHES(p_type, '^(?:[A-Z]+)') AS m,
        |  REGEXP_MATCHES(p_name, 'part_[0-9]') AS rl,
        |  REGEXP_MATCHES(REGEXP_EXTRACT(p_name, '([0-9]+)', 1), '^[0-9]+$') AS isdig,
        |  REGEXP_MATCHES(p_brand, '^[A-Za-z]+$') AS isalp,
        |  CAST((LENGTH(p_name) - LENGTH(REPLACE(p_name, 'a', ''))) AS BIGINT) AS cnt_a
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_str_funcs2" ->
      """SELECT p_partkey,
        |  UPPER(SUBSTRING(p_type, 1, 1)) || LOWER(SUBSTRING(p_type, 2)) AS cap,
        |  list_aggregate(list_transform(string_split(p_name, ' '),
        |    w -> UPPER(SUBSTRING(w, 1, 1)) || LOWER(SUBSTRING(w, 2))), 'string_agg', ' ') AS tit,
        |  CASE WHEN LENGTH(p_brand) >= 12 THEN p_brand
        |       ELSE RPAD(LPAD(p_brand, CAST(LENGTH(p_brand) + FLOOR((12 - LENGTH(p_brand)) / 2) AS INT), '*'), 12, '*') END AS ctr,
        |  CASE WHEN LENGTH(p_brand) >= 10 THEN p_brand ELSE LPAD(p_brand, CAST(10 AS INT), '.') END AS rj,
        |  LTRIM(CASE WHEN LENGTH(p_brand) >= 12 THEN p_brand
        |    ELSE RPAD(LPAD(p_brand, CAST(LENGTH(p_brand) + FLOOR((12 - LENGTH(p_brand)) / 2) AS INT), ' '), 12, ' ') END) AS lst,
        |  RTRIM(CASE WHEN LENGTH(p_brand) >= 12 THEN p_brand
        |    ELSE RPAD(LPAD(p_brand, CAST(LENGTH(p_brand) + FLOOR((12 - LENGTH(p_brand)) / 2) AS INT), ' '), 12, ' ') END) AS rst,
        |  CAST(strlen(p_name) AS BIGINT) AS blen,
        |  regexp_matches(REPLACE(p_brand, '#', ''), '^[A-Za-z0-9]+$') AS aln,
        |  TRUE AS sp,
        |  regexp_matches(p_name, '^[^A-Z]*[a-z][^A-Z]*$') AS low,
        |  regexp_matches(p_brand, '^[^a-z]*[A-Z][^a-z]*$') AS upp,
        |  list_aggregate(string_split(p_type, ' '), 'string_agg', '-') AS joined
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_str_funcs3" ->
      """SELECT p_partkey,
        |  CAST(LENGTH(p_name) - STRPOS(REVERSE(p_name), ' ') AS BIGINT) AS rf,
        |  CAST(LENGTH(p_name) - STRPOS(REVERSE(p_name), ' ') AS BIGINT) AS ri,
        |  CAST(STRPOS(p_name, ' ') - 1 AS BIGINT) AS ix,
        |  CAST(STRPOS(p_name, 'zzzz') - 1 AS BIGINT) AS nf,
        |  CASE WHEN STRPOS(REVERSE(p_name), REVERSE('zzzz')) = 0 THEN CAST(-1 AS BIGINT)
        |       ELSE CAST(LENGTH(p_name) - STRPOS(REVERSE(p_name), REVERSE('zzzz')) + 1 - 4 AS BIGINT) END AS nrf,
        |  regexp_extract(p_name, '^(.*) [^ ]*$', 1) AS rs_head,
        |  regexp_extract(p_name, '^.* ([^ ]*)$', 1) AS rs_tail,
        |  list_aggregate(string_split(p_type, ' '), 'string_agg', '|') AS rs2
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_dt_funcs" ->
      """SELECT event_id,
        |  CAST(YEAR(ts) AS BIGINT) AS y, CAST(MONTH(ts) AS BIGINT) AS mo,
        |  CAST(DAY(ts) AS BIGINT) AS d, CAST(HOUR(ts) AS BIGINT) AS h,
        |  CAST(MINUTE(ts) AS BIGINT) AS mi, CAST(SECOND(ts) AS BIGINT) AS sec,
        |  CAST(ISODOW(ts) - 1 AS BIGINT) AS dow,
        |  CAST(DAYOFYEAR(ts) AS BIGINT) AS doy,
        |  CAST(WEEK(ts) AS BIGINT) AS wk,
        |  CAST(QUARTER(ts) AS BIGINT) AS q,
        |  (YEAR(ts) % 4 = 0 AND (YEAR(ts) % 100 <> 0 OR YEAR(ts) % 400 = 0)) AS leap,
        |  MONTHNAME(ts) AS mname, DAYNAME(ts) AS dname,
        |  STRFTIME(ts, '%Y-%m-%d %H') AS fmt,
        |  DATE_TRUNC('day', ts) AS day_floor,
        |  EPOCH_US(ts) AS us
        |FROM events ORDER BY event_id""".stripMargin,

    "q_td_funcs" ->
      s"""SELECT l_returnflag AS flag,
         |  MIN(CAST(FLOOR((EPOCH_US(l_shipdate) - EPOCH_US(o_orderdate)) / 86400000000) AS BIGINT)) AS min_days,
         |  MAX(CAST(FLOOR((EPOCH_US(l_shipdate) - EPOCH_US(o_orderdate)) / 86400000000) AS BIGINT)) AS max_days,
         |  ${sqlR(sqlDsum("(EPOCH_US(l_shipdate) - EPOCH_US(o_orderdate)) / 1e6"), 2)} AS sum_secs,
         |  COUNT(*) AS n
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_null_funcs" ->
      s"""WITH e AS (
         |  SELECT event_type,
         |    CASE WHEN value < 1.0 THEN NULL ELSE value END AS v,
         |    CASE WHEN value >= 1.0 AND value < 2.0 THEN 'NaN'::DOUBLE
         |         WHEN value < 1.0 THEN NULL ELSE value END AS nv
         |  FROM events)
         |SELECT event_type AS etype, COUNT(*) AS n,
         |  COUNT(v) AS n_notmissing,
         |  COUNT(CASE WHEN nv IS NULL THEN 1 END) AS n_missing,
         |  COUNT(CASE WHEN nv IS NOT NULL AND ISNAN(nv) THEN 1 END) AS n_nan,
         |  COUNT(CASE WHEN nv IS NULL OR ISNAN(nv) THEN 1 END) AS n_na,
         |  ${sqlR(sqlDsum("CASE WHEN nv IS NOT NULL AND NOT ISNAN(nv) THEN nv END"), 4)} AS sum_valid,
         |  ${sqlR(sqlDsum("CASE WHEN nv IS NULL OR ISNAN(nv) THEN 0.0 ELSE nv END"), 4)} AS sum_filled,
         |  ${sqlR(sqlDsum("COALESCE(v, -1.0)"), 4)} AS sum_fillmissing
         |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_math_funcs" ->
      s"""SELECT l_returnflag AS flag,
         |  ${sqlR(sqlDsum("LEAST(GREATEST(l_quantity, 5.0), 45.0)"), 4)} AS sum_clip,
         |  ${sqlR(sqlDsum("SQRT(l_quantity)"), 6)} AS sum_sqrt,
         |  ${sqlR(sqlDsum("LN(l_quantity + 1.0)"), 6)} AS sum_log1p,
         |  ${sqlR(sqlDsum("CAST(CASE WHEN l_quantity < 10.0 THEN 0 WHEN l_quantity < 20.0 THEN 1 WHEN l_quantity < 30.0 THEN 2 WHEN l_quantity < 40.0 THEN 3 ELSE 4 END AS DOUBLE)"), 4)} AS sum_digitize,
         |  ${sqlR(sqlDsum("ABS(l_discount - 0.05)"), 6)} AS sum_absdev,
         |  ${sqlR(sqlDsum("POW(l_quantity, 2.0)"), 4)} AS sum_x2,
         |  ${sqlR(sqlDsum("FLOOR(l_quantity / 7.0) + CEIL(l_discount * 10.0)"), 4)} AS sum_floorceil,
         |  ${sqlR(sqlDsum("CASE WHEN l_quantity > 25 THEN l_quantity * 2 ELSE l_quantity / 2 END"), 4)} AS sum_where
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
