package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-analytics operators — ordered conversion funnels and cohort
  * retention matrices, the product-analytics primitives over event
  * streams (beyond the reference, which has no event operators; its
  * users drop to pandas for these).
  *
  * ONE definition of the Column algebra shared by the oracle lanes
  * (queries.WindowQueries q_event_funnel / q_cohort_retention) and
  * the VxFrame facade (funnel / cohortRetention) — the same
  * lane-to-facade promotion discipline as the curation facade: the
  * facade can never drift from what the oracle gates.
  *
  * 100 TB shape: every stage is one user-keyed groupBy (partial
  * aggregation before the shuffle, shuffle keys are user ids) — never
  * a per-user window over the full event stream; the retention matrix
  * is two user-keyed aggregations plus one distinct.
  */
object EventOps {

  /** Exact integer event-time in microseconds — timestamps flow
    * through as TIMESTAMP_NTZ, lossless under the UTC session. */
  private def epochUs(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Ordered conversion funnel: stage k counts users whose first
    * qualifying `stages(k)` event is STRICTLY LATER than their stage
    * k-1 time (first-touch attribution). Output one row per stage:
    *   stage       "1_<type>", "2_<type>", ... (ordinal-prefixed so
    *               lexicographic order == funnel order)
    *   n_users     users reaching the stage
    *   sum_lag_us  total stage-(k-1)->k lag in exact integer
    *               microseconds (0 for stage 1)
    * Staged conditional aggregation: each stage is one groupBy on
    * `user`, never a per-user full-stream window. */
  def funnel(events: DataFrame, user: String, eventType: String,
             ts: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel: stages must be non-empty")
    require(stages.distinct.size == stages.size,
      s"funnel: duplicate stage types in $stages")
    val ev = events.select(col(user).as("__u"), col(eventType).as("__t"),
      col(ts).as("__ts"))

    // ordinal prefixes are zero-padded to the stage count's width so
    // the documented invariant (lexicographic order == funnel order)
    // survives 10+ stages ("10_x" would otherwise sort before "2_y");
    // <= 9 stages keep the unpadded labels the oracle pins
    val w = stages.size.toString.length
    def label(k: Int, st: String): String = {
      val ord = (k + 1).toString
      ("0" * (w - ord.length)) + ord + "_" + st
    }

    // per-user first-qualifying time per stage, chained
    var reached = ev.where(col("__t") === stages.head)
      .groupBy("__u").agg(min(col("__ts")).as("__cur"))
      .withColumn("__prev", col("__cur"))
    val rows = scala.collection.mutable.ArrayBuffer[DataFrame](
      reached.agg(count(lit(1)).as("n_users"), lit(0L).as("sum_lag_us"))
        .select(lit(label(0, stages.head)).as("stage"),
          col("n_users"), col("sum_lag_us")))
    stages.zipWithIndex.drop(1).foreach { case (st, k) =>
      val prev = reached.select(col("__u"), col("__cur").as("__prev_ts"))
      reached = ev.where(col("__t") === st)
        .join(prev, "__u").where(col("__ts") > col("__prev_ts"))
        .groupBy("__u").agg(min(col("__ts")).as("__cur"),
          min(col("__prev_ts")).as("__prev"))
      rows += reached.agg(count(lit(1)).as("n_users"),
          sum(epochUs(col("__cur")) - epochUs(col("__prev"))).as("sum_lag_us"))
        .select(lit(label(k, st)).as("stage"), col("n_users"),
          col("sum_lag_us"))
    }
    rows.reduce(_ union _).orderBy("stage")
  }

  /** Cohort retention matrix: cohort = period of a user's FIRST
    * event (days since `anchor`, floor-divided by `periodDays`), cell
    * = distinct users active at each period offset. Output:
    * (cohort_period, period_offset, n_users). */
  def cohortRetention(events: DataFrame, user: String, ts: String,
                      anchor: String, periodDays: Int): DataFrame = {
    require(periodDays >= 1, s"cohortRetention: periodDays must be >= 1")
    val days = events.select(col(user).as("__u"),
      datediff(to_date(col(ts)), to_date(lit(anchor))).cast("long").as("__day"))
    val first = days.groupBy("__u").agg(min(col("__day")).as("__cohort_day"))
    days.join(first, "__u")
      .select(
        floor(col("__cohort_day") / periodDays).cast("long").as("cohort_period"),
        floor((col("__day") - col("__cohort_day")) / periodDays).cast("long")
          .as("period_offset"),
        col("__u"))
      .distinct()
      .groupBy("cohort_period", "period_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_period", "period_offset")
  }
}
