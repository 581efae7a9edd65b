package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps
import Q._

/** Oracle-gated batch-mode execution of the streaming operators
  * (graft.streaming.StreamOps): the transforms are mode-agnostic, so
  * running them on the batch `events` table gates their logic through
  * the DuckDB oracle, while StreamingSpec asserts stream == batch on a
  * MemoryStream. Together: streaming operators are oracle-verified.
  */
object StreamQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // tumbling 1-hour event-time windows per event_type
    "q_stream_tumbling" -> ((s, dir) => {
      StreamOps.tumblingAgg(
        t(s, dir, "events"), "ts", "1 hour", Seq("event_type"),
        Seq(count(lit(1)).as("n"), r(dsumD(col("value"))).as("sum_value")))
        .select(col("window_start").cast("timestamp_ntz"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("window_start", "event_type")
    }),

    // sliding 2-hour windows every hour, global counts
    "q_stream_sliding" -> ((s, dir) => {
      StreamOps.slidingAgg(
        t(s, dir, "events"), "ts", "2 hours", "1 hour", Nil,
        Seq(count(lit(1)).as("n")))
        .select(col("window_start").cast("timestamp_ntz"), col("n"))
        .orderBy("window_start")
    }),

    // streaming dedup (batch face): drop repeated (user, type) keys,
    // then count survivors per type. Output depends only on the key
    // SET (not which duplicate survived), so it is deterministic and
    // oracle-checkable; the stream path is asserted in StreamingSpec.
    "q_stream_dedup" -> ((s, dir) => {
      StreamOps.dedupByKey(
          t(s, dir, "events").select(col("user_id"), col("event_type")),
          Seq("user_id", "event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_unique_users"))
        .orderBy("event_type")
    }),

    // stream-static enrichment: events joined to the broadcast nation
    // dim (user_id -> nation via mod), aggregated per nation name
    "q_stream_enrich" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("nkey", pmod(col("user_id"), lit(25)))
      val dim = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      StreamOps.enrichJoin(ev, dim, col("nkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n"), r(dsumD(col("value"))).as("sum_value"))
        .orderBy("n_name")
    }),

    // streaming heavy hitters, batch face: per-shard count-min
    // sketches + top-k candidates — the mapGroupsWithState op runs
    // mode-agnostically on a batch Dataset (empty prior state), so
    // the full stateful path is oracle-gated: DuckDB rebuilds each
    // shard's sketch from the same md5-prefix + Carter-Wegman family
    // and ranks with the same (estimate DESC, token ASC) tie-break.
    "q_stream_heavy_hitters" -> ((s, dir) => {
      import s.implicits._
      val toks = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token")).as[String]
      StreamOps.streamingHeavyHitters(toks, groups = 8, k = 5)
        .toDF()
        .select(col("shard").cast("long").as("shard"), col("token"),
          col("cms_est"))
        .orderBy("shard", "token")
    }),

    // streaming ordered funnel, batch face: O(1)-state-per-user
    // mapGroupsWithState (stage reached + last completion time),
    // time-ordered greedy advance == the batch min-chain funnel, so
    // the full stateful path is oracle-gated: DuckDB rebuilds each
    // user's chain with the q_event_funnel CTE recipe and buckets
    // users by stages reached.
    "q_stream_funnel" -> ((s, dir) => {
      import s.implicits._
      // a 4-stage funnel over a one-week event prefix: the cutoff is
      // what makes users DROP OUT at every stage (full history lets
      // everyone finish — a 1-bucket result gates nothing)
      val stages = Seq("signup", "view", "click", "purchase")
      val idx = stages.zipWithIndex
        .foldLeft(lit(-1)) { case (acc, (st, i)) =>
          when(col("event_type") === st, lit(i)).otherwise(acc)
        }
      val ev = t(s, dir, "events")
        .where(col("ts") < lit("2024-01-08").cast("timestamp_ntz"))
        .select(col("user_id").as("user"), idx.as("stage"),
          unix_micros(col("ts").cast("timestamp")).as("tsUs"))
        .as[StreamOps.FunnelEvent]
      StreamOps.streamingFunnel(ev, stages.size)
        .toDF()
        .groupBy("reached")
        .agg(count(lit(1)).as("n_users"),
          min(col("last_us")).as("min_last"), max(col("last_us")).as("max_last"))
        .orderBy("reached")
    }),

    // SCD2 (slowly-changing dimension) enrich, batch face: every event
    // joins the customer VERSION valid at its event time — two
    // validity epochs per customer synthesized from the customer
    // table; a plain equi enrich would serve version-2 attributes for
    // version-1-era events (the classic silent lookup bug).
    "q_scd2_enrich" -> ((s, dir) => {
      val ev = t(s, dir, "events").select("event_id", "user_id", "ts", "value")
      val dim = t(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
        .withColumn("v", explode(array(lit(0), lit(1))))
        .select(col("user_id"),
          concat(col("c_mktsegment"), lit("_v"), col("v").cast("string")).as("segment"),
          when(col("v") === 0, lit("2024-01-01 00:00:00"))
            .otherwise(lit("2024-01-15 00:00:00")).cast("timestamp_ntz").as("valid_from"),
          when(col("v") === 0, lit("2024-01-15 00:00:00"))
            .otherwise(lit("2025-01-01 00:00:00")).cast("timestamp_ntz").as("valid_to"))
      StreamOps.scd2Enrich(ev, dim, Seq("user_id"), "ts", "valid_from", "valid_to")
        .groupBy("segment")
        .agg(count(lit(1)).as("n"),
          min(col("event_id")).as("min_ev"), max(col("event_id")).as("max_ev"),
          r(dsumD(col("value"))).as("sum_value"))
        .orderBy("segment")
    }),

    // stream-stream interval join (batch face): purchases within 1 hour
    // after a view by the same user; per-user pair count + value sum
    "q_stream_interval_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("value"))
      StreamOps.intervalJoin(views, purchases,
          col("v_user") === col("p_user"), "v_ts", "p_ts", "1 hour")
        .groupBy(col("v_user").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"), r(dsumD(col("value"))).as("sum_value"))
        .orderBy("user_id")
    }),

    // session windows (30-min gap) per user -> session count + event count
    "q_stream_session" -> ((s, dir) => {
      StreamOps.sessionAgg(
        t(s, dir, "events"), "ts", "30 minutes", Seq("user_id"),
        Seq(count(lit(1)).as("n_events")))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
        .orderBy("user_id")
    })
  )

  /** Generated oracle for q_stream_heavy_hitters: per-shard CMS
    * rebuilt from the same hash family (q_heavy_hitters_cms recipe,
    * sharded), top-5 per shard with the (est DESC, token ASC)
    * tie-break the operator uses. */
  private lazy val hhSql: String = {
    import Q.sqlUh
    def uh(j: Int, e: String) = sqlUh(j, e)
    val sketchRows = (0 until 4).map { j =>
      s"SELECT base % 8 AS shard, $j AS j, ${uh(j, "base")} % 256 AS b FROM tk"
    }.mkString(" UNION ALL ")
    val probeRows = (0 until 4).map { j =>
      s"SELECT token, shard, $j AS j, ${uh(j, "base")} % 256 AS b FROM dtok"
    }.mkString(" UNION ALL ")
    s"""WITH toks AS (
       |  SELECT UNNEST(string_split(text, ' ')) AS token FROM documents),
       |tk AS (SELECT token,
       |  ('0x' || substring(md5(token), 1, 7))::BIGINT AS base FROM toks),
       |cells AS (SELECT shard, j, b, COUNT(*) AS c
       |  FROM ($sketchRows) GROUP BY 1, 2, 3),
       |dtok AS (SELECT DISTINCT token, base, base % 8 AS shard FROM tk),
       |pr AS ($probeRows),
       |est AS (SELECT pr.token, pr.shard, MIN(cells.c) AS est
       |  FROM pr JOIN cells ON cells.shard = pr.shard
       |    AND cells.j = pr.j AND cells.b = pr.b
       |  GROUP BY 1, 2),
       |rk AS (SELECT shard, token, est,
       |  ROW_NUMBER() OVER (PARTITION BY shard ORDER BY est DESC, token) AS rn
       |  FROM est)
       |SELECT CAST(shard AS BIGINT) AS shard, token, CAST(est AS BIGINT) AS cms_est
       |FROM rk WHERE rn <= 5 ORDER BY shard, token""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q_stream_tumbling" ->
      s"""SELECT DATE_TRUNC('hour', ts)::TIMESTAMP AS window_start, event_type,
         |  COUNT(*) AS n, ${sqlR(sqlDsum("value"))} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // sliding(2h, 1h): each event lands in 2 hourly-aligned windows —
    // starts at trunc(ts)-1h and trunc(ts)
    "q_stream_sliding" ->
      """WITH w AS (
        |  SELECT DATE_TRUNC('hour', ts)::TIMESTAMP - INTERVAL 1 HOUR AS window_start FROM events
        |  UNION ALL
        |  SELECT DATE_TRUNC('hour', ts)::TIMESTAMP AS window_start FROM events)
        |SELECT window_start, COUNT(*) AS n FROM w GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_stream_dedup" ->
      """SELECT event_type, COUNT(*) AS n_unique_users FROM (
        |  SELECT DISTINCT user_id, event_type FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_stream_enrich" ->
      s"""SELECT n_name, COUNT(*) AS n, ${sqlR(sqlDsum("value"))} AS sum_value
         |FROM events JOIN nation ON user_id % 25 = n_nationkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_stream_heavy_hitters" -> hhSql,
    "q_stream_funnel" ->
      """WITH ev AS (SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-08'),
        |u AS (SELECT DISTINCT user_id FROM ev),
        |s1 AS (SELECT user_id, MIN(ts) AS t FROM ev
        |  WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM ev e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY 1),
        |s3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM ev e
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY 1),
        |s4 AS (SELECT e.user_id, MIN(e.ts) AS t FROM ev e
        |  JOIN s3 ON e.user_id = s3.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY 1),
        |r AS (SELECT u.user_id,
        |    CASE WHEN s4.t IS NOT NULL THEN 4 WHEN s3.t IS NOT NULL THEN 3
        |         WHEN s2.t IS NOT NULL THEN 2 WHEN s1.t IS NOT NULL THEN 1
        |         ELSE 0 END AS reached,
        |    COALESCE(epoch_us(COALESCE(s4.t, s3.t, s2.t, s1.t)), 0) AS last_us
        |  FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |    LEFT JOIN s3 USING (user_id) LEFT JOIN s4 USING (user_id))
        |SELECT reached, COUNT(*) AS n_users,
        |  MIN(last_us) AS min_last, MAX(last_us) AS max_last
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_scd2_enrich" ->
      s"""WITH dim AS (
         |  SELECT c_custkey AS user_id,
         |    c_mktsegment || '_v' || CAST(v AS VARCHAR) AS segment,
         |    CASE WHEN v = 0 THEN TIMESTAMP '2024-01-01 00:00:00'
         |         ELSE TIMESTAMP '2024-01-15 00:00:00' END AS vf,
         |    CASE WHEN v = 0 THEN TIMESTAMP '2024-01-15 00:00:00'
         |         ELSE TIMESTAMP '2025-01-01 00:00:00' END AS vt
         |  FROM customer, unnest([0, 1]) AS t(v))
         |SELECT segment, COUNT(*) AS n,
         |  MIN(event_id) AS min_ev, MAX(event_id) AS max_ev,
         |  ${sqlR(sqlDsum("value"))} AS sum_value
         |FROM events e JOIN dim d ON e.user_id = d.user_id
         |  AND e.ts >= d.vf AND e.ts < d.vt
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_stream_interval_join" ->
      s"""SELECT v.user_id AS user_id, COUNT(*) AS n_pairs,
         |  ${sqlR(sqlDsum("p.value"))} AS sum_value
         |FROM (SELECT user_id, ts FROM events WHERE event_type = 'view') v
         |JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
         |  ON v.user_id = p.user_id
         |  AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // gaps-and-islands: new session when gap > 30min (session_window
    // half-open edge [start, last+gap) coincides for continuous data)
    "q_stream_session" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              >= INTERVAL 30 MINUTE OR
        |              LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events)
        |SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
