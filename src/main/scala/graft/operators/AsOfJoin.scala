package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (backward) join — an extension beyond the reference, which has
  * equi-joins only (reference: core/join.py:189-206; SURVEY §2.3 notes
  * as-of join as our addition).
  *
  * Implementation: union both sides tagged with a side marker, sort
  * within key partitions by (ts, side), and carry the most recent
  * right-side payload forward with `last(..., ignoreNulls)` over an
  * unbounded-preceding-to-previous-row window. Each left row then holds
  * the latest right row with right.ts < left.ts (strict: at equal ts
  * the right row sorts after the left row, so it is excluded).
  *
  * Scale: one shuffle on the join keys + one per-partition sort —
  * O(n log n) per key group. The naive join+aggregate alternative
  * materializes every (left, earlier-right) PAIR before aggregating:
  * quadratic per key (1k clicks × 1k purchases = 1M intermediate
  * rows per user). This formulation never builds pairs.
  */
object AsOfJoin {

  /** @param left    probe side
    * @param right   reference side (its latest earlier row attaches)
    * @param keys    equi-key column names present on both sides
    * @param leftTs  event-time column on `left`
    * @param rightTs event-time column on `right`
    * @param payload right-side columns to attach as `asof_<name>`
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   payload: Seq[String]): DataFrame = {
    val carry = left.columns.toSeq.filterNot(c => keys.contains(c) || c == leftTs)
    val taggedLeft = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(0).as("__side")) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")) ++
        carry.map(col): _*)
    val taggedRight = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(1).as("__side")) ++
        payload.map(c => col(c).as(s"__p_$c")) ++
        carry.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carried = payload.foldLeft(taggedLeft.unionByName(taggedRight)) { (d, c) =>
      d.withColumn(s"asof_$c", last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    carried.where(col("__side") === 0)
      .withColumnRenamed("__ts", leftTs)
      .select(keys.map(col) ++ Seq(col(leftTs)) ++ carry.map(col) ++
        payload.map(c => col(s"asof_$c")): _*)
  }
}
