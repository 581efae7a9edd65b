package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join — an extension beyond the reference (which has
  * equi-joins only, core/join.py:189-206): joins on a RANGE predicate
  * with no equality key, the case where Spark's planner can only
  * produce BroadcastNestedLoopJoin or a cartesian product (quadratic
  * at scale, and the broadcast form caps the build side).
  *
  * The standard binning rewrite (as popularized by the interval-join
  * literature and engine range-join hints): pick a bin width `W`,
  * explode every interval to the integer bins it covers
  * (`floor(start/W) .. floor(end/W)`), tag every point with its single
  * bin, and equi-join on the bin before applying the exact range
  * predicate. The plan becomes an ordinary shuffled equi-join:
  *  - shuffle keys are bin ordinals — partial aggregation, AQE skew
  *    handling and all the equi-join machinery apply;
  *  - each (point, interval) candidate pair meets in EXACTLY ONE bin
  *    (the point's), so no dedup pass is needed;
  *  - the interval side replicates by `ceil(len/W)+1` — a bounded,
  *    user-visible factor, guarded by `maxBinsPerInterval` with
  *    `raise_error` so a mis-sized W fails loudly instead of silently
  *    exploding the shuffle 1000x (the real operational hazard).
  *
  * For interval-vs-interval overlap the same rewrite applies to both
  * sides; a candidate pair then meets in EVERY shared bin, so the
  * exactly-once rule keeps the pair only in the bin containing the
  * overlap start (`floor(max(ls, rs)/W)`).
  *
  * Values must be numeric (or castable: dates/timestamps cast to days/
  * seconds upstream) with |v/W| < 2^52 so the double floor is exact.
  * Intervals with `end < start` match nothing (SQL BETWEEN semantics)
  * and are dropped before binning — `sequence()` would otherwise
  * generate a DESCENDING bin range.
  */
object RangeJoin {

  /** withColumn would silently OVERWRITE a pre-existing column named
    * like our internal bin key (and the final drop would then remove
    * the user's data) — reject it loudly instead. */
  private def requireNoInternal(cols: Array[String]*): Unit =
    cols.foreach(cs => require(!cs.contains("__rj_bin"),
      "range join: inputs must not carry a column named __rj_bin"))

  private def bin(c: Column, w: Long): Column =
    floor(c.cast("double") / w.toDouble).cast("long")

  /** Guarded bin list for one interval: fails the JOB (raise_error)
    * when an interval covers more than `maxBins` bins. The guard is
    * inline in the bins expression so column pruning can never drop
    * it (a detached assert_true column would be optimized away). */
  private def binsOf(s: Column, e: Column, w: Long, maxBins: Int): Column = {
    val lo = bin(s, w)
    val hi = bin(e, w)
    when(hi - lo >= maxBins, raise_error(concat(
      lit(s"range join: interval covers more than $maxBins bins of width $w "),
      lit("(raise binWidth or maxBinsPerInterval); interval start="),
      s.cast("string"), lit(" end="), e.cast("string"))).cast("array<long>"))
      .otherwise(sequence(lo, hi))
  }

  /** Point-in-interval join (the timestamp-enrichment shape): every
    * `points` row paired with every `intervals` row whose
    * `[start, end]` contains it (`end` exclusive when
    * `inclusiveEnd=false`). Both sides' columns are preserved, so
    * column names must be disjoint.
    *
    * `joinType` may be `"inner"` (default) or `"left"`/`"left_outer"`
    * — the "enrich events with the validity window, KEEP unmatched
    * events" production shape (the reference's default join is left,
    * core/join.py:135). The rewrite stays exact for left outer because
    * the PRESERVED side is the point side: every true match still
    * meets in exactly one bin (the point's), and a point matching no
    * interval null-extends exactly once by join semantics (a NULL
    * point gets a NULL bin, matches nothing, and null-extends the same
    * way the original theta join would). A left-outer with the
    * INTERVAL side preserved is NOT expressible here — the explode
    * replicates interval rows, so an unmatched interval would
    * null-extend once per covered bin; callers wanting that shape flip
    * the sides.
    *
    * @param binWidth bin size in the point column's units — pick
    *   roughly the typical interval length so intervals explode to
    *   ~1-2 bins each
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      point: String, start: String, end: String,
                      binWidth: Long, maxBinsPerInterval: Int = 4096,
                      inclusiveEnd: Boolean = true,
                      joinType: String = "inner"): DataFrame = {
    require(binWidth >= 1, s"range join: binWidth must be positive ($binWidth)")
    val jt = joinType.toLowerCase.replace("_", "")
    require(jt == "inner" || jt == "left" || jt == "leftouter",
      s"range join: joinType must be inner or left ($joinType)")
    val dup = points.columns.toSet.intersect(intervals.columns.toSet)
    require(dup.isEmpty, s"range join: column names must be disjoint ($dup)")
    requireNoInternal(points.columns, intervals.columns)
    val pts = points.withColumn("__rj_bin", bin(col(point), binWidth))
    val ivs = intervals
      .where(col(end) >= col(start))
      .withColumn("__rj_bin",
        explode(binsOf(col(start), col(end), binWidth, maxBinsPerInterval)))
    val rangePred = col(point) >= col(start) &&
      (if (inclusiveEnd) col(point) <= col(end) else col(point) < col(end))
    pts.join(ivs, pts("__rj_bin") === ivs("__rj_bin") && rangePred,
        if (jt == "inner") "inner" else "left_outer")
      .drop(pts("__rj_bin")).drop(ivs("__rj_bin"))
  }

  /** Interval-overlap join: every (`left`, `right`) pair whose
    * `[ls, le]` and `[rs, re]` intervals intersect (closed intervals;
    * touching endpoints overlap). Both sides explode to their bins;
    * the pair is kept only in the bin containing the overlap start so
    * each pair emits exactly once. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      ls: String, le: String, rs: String, re: String,
                      binWidth: Long, maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth >= 1, s"range join: binWidth must be positive ($binWidth)")
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"range join: column names must be disjoint ($dup)")
    requireNoInternal(left.columns, right.columns)
    val l = left.where(col(le) >= col(ls)).withColumn("__rj_bin",
      explode(binsOf(col(ls), col(le), binWidth, maxBinsPerInterval)))
    val r = right.where(col(re) >= col(rs)).withColumn("__rj_bin",
      explode(binsOf(col(rs), col(re), binWidth, maxBinsPerInterval)))
    val overlap = col(ls) <= col(re) && col(rs) <= col(le)
    val once = l("__rj_bin") ===
      floor(greatest(col(ls), col(rs)).cast("double") / binWidth.toDouble).cast("long")
    l.join(r, l("__rj_bin") === r("__rj_bin") && overlap && once)
      .drop(l("__rj_bin")).drop(r("__rj_bin"))
  }
}
