package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-column data skipping —
  * the write-side optimization that makes 100 TB selective scans cheap
  * on MORE than one predicate column.
  *
  * A table sorted by one column prunes row groups only for filters on
  * that column; interleaving the bits of k column ranks into one sort
  * key clusters rows so every z-ordered file covers a small hyper-
  * rectangle of the value space — parquet min/max footer stats then
  * prune files/row-groups for selective filters on ANY of the k
  * columns (the same layout idea as Delta Lake's OPTIMIZE ZORDER BY
  * and ClickHouse's mortonEncode, built here from plain Column
  * bit-arithmetic so the whole key stays inside codegen).
  *
  * Scale shape: one bounded aggregate computes per-column min/max
  * (2k values to the driver), then a single `repartitionByRange` on
  * the key (sampled range boundaries — no global sort) with
  * `sortWithinPartitions` clusters each output file internally for
  * row-group-level pruning too. Rows are NEVER changed — layout only —
  * which is what the q_zorder oracle pins (filtered aggregate over the
  * rewritten table == same over the original).
  */
object ZOrderLayout {

  /** Bits per column in the interleaved key: generous for pruning
    * granularity while k·bits stays far below 63. */
  private def bitsFor(k: Int): Int = k match {
    case 1 => 32
    case 2 => 16
    case 3 => 12
    case _ => 8
  }

  /** Spread `v`'s low `bits` bits so consecutive bits land `k` apart
    * (bit b of v → bit b·k of the result), as a pure Column
    * expression: a sum of shifted single-bit masks — branch-free,
    * whole-stage-codegen friendly. */
  private def spread(v: Column, bits: Int, k: Int): Column =
    (0 until bits).map { b =>
      shiftleft(shiftright(v, b).bitwiseAND(lit(1L)), b * k)
    }.reduce(_.bitwiseOR(_))

  /** Rank a column to [0, 2^bits) by linear min/max scaling; nulls
    * rank 0 (cluster together at the curve origin). */
  private def rank(c: Column, mn: Double, mx: Double, bits: Int): Column = {
    val span = mx - mn
    val top = (1L << bits) - 1
    val scaled =
      if (span <= 0) lit(0L)
      else least(lit(top), greatest(lit(0L),
        ((c.cast("double") - lit(mn)) / lit(span) * lit(top.toDouble)).cast("long")))
    coalesce(scaled, lit(0L))
  }

  /** Add the interleaved z-order key column. Runs ONE bounded
    * aggregate over `df` to learn each column's min/max (2k scalars
    * to the driver — the same two-pass shape as the distributed
    * percentile operators). */
  def withZOrderKey(df: DataFrame, cols: Seq[String],
                    keyCol: String = "__zorder"): DataFrame = {
    require(cols.nonEmpty && cols.size <= 8, s"z-order over 1..8 columns, got ${cols.size}")
    val bits = bitsFor(cols.size)
    val stats = df.select(
      cols.flatMap(c => Seq(min(col(c).cast("double")).as(s"mn_$c"),
        max(col(c).cast("double")).as(s"mx_$c"))): _*).head()
    val key = cols.zipWithIndex.map { case (c, i) =>
      val mn = Option(stats.getAs[Any](s"mn_$c")).fold(0.0)(_.asInstanceOf[Double])
      val mx = Option(stats.getAs[Any](s"mx_$c")).fold(0.0)(_.asInstanceOf[Double])
      shiftleft(spread(rank(col(c), mn, mx, bits), bits, cols.size), i)
    }.reduce(_.bitwiseOR(_))
    df.withColumn(keyCol, key)
  }

  /** Rewrite `df` as z-order-clustered parquet: range-partition on the
    * interleaved key (sampled boundaries, one shuffle), sort within
    * each partition, drop the key, write `numFiles` files. */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
                    numFiles: Int): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    withZOrderKey(df, cols)
      .repartitionByRange(numFiles, col("__zorder"))
      .sortWithinPartitions("__zorder")
      .drop("__zorder")
      .write.mode("overwrite").parquet(path)
  }
}
