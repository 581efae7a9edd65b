package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scale-safe ordered operators: shift / diff / rolling over a total
  * order WITHOUT a global single-reducer `Window.orderBy`.
  *
  * A plain `Window.orderBy(row_index)` funnels every row through ONE
  * task — fine on 60k rows, fatal at 100 TB. Instead we re-express the
  * reference's chunk-stream realignment (reference:
  * packages/vaex-core/vaex/shift.py:204-340 — shift is "re-align chunk
  * streams and carry the boundary rows") in Spark terms:
  *
  *   1. bucket rows into ordered blocks (`row_index div blockSize`);
  *   2. compute the operator *within* each block with a partitioned
  *      window (parallel, one hash exchange on the block id);
  *   3. fix up the first/last `p` rows of each block by broadcasting
  *      only the boundary rows of the neighbouring block (p rows per
  *      block — tiny) and joining them back map-side.
  *
  * Requirements: `rowIndex` must be a DENSE 0-based index (what
  * [[graft.sources.Tables.withRowIndex]] produces) so that block `b`
  * holds exactly `blockSize` rows (except the last); callers holding a
  * filtered/sparse index should re-index first (`extract()`).
  * `blockSize` must exceed `|periods|` / `window` (enforced).
  */
object OrderedOps {
  val DefaultBlockSize: Long = 1L << 20

  private def staged(df: DataFrame, rowIndex: String, blockSize: Long): DataFrame = {
    val asc = Window.partitionBy(col("__blk")).orderBy(col(rowIndex).asc)
    val desc = Window.partitionBy(col("__blk")).orderBy(col(rowIndex).desc)
    df.withColumn("__blk", (col(rowIndex) / lit(blockSize)).cast("long"))
      .withColumn("__rn", row_number().over(asc))
      .withColumn("__rnd", row_number().over(desc))
  }

  /** Shifted value of `column` by `periods` (positive = lag, negative =
    * lead) in `rowIndex` order; out-of-range rows become null
    * (reference: core/dataframe.py:4781 shift fill semantics). */
  def shift(df: DataFrame, column: String, periods: Int,
            rowIndex: String = "row_index", as: Option[String] = None,
            blockSize: Long = DefaultBlockSize): DataFrame = {
    val out = as.getOrElse(column)
    if (periods == 0) return df.withColumn(out, col(column))
    val p = math.abs(periods)
    require(blockSize >= p, s"blockSize=$blockSize must be >= |periods|=$p")
    val asc = Window.partitionBy(col("__blk")).orderBy(col(rowIndex).asc)
    val st = staged(df, rowIndex, blockSize).withColumn("__intra",
      if (periods > 0) lag(col(column), p).over(asc) else lead(col(column), p).over(asc))
    // receiving position within the neighbour block, and which boundary
    // rows of THIS block are carried to it:
    //   lag : last p rows of block b feed rows __rn = p-__rnd+1 of b+1
    //   lead: first p rows of block b feed rows __rnd = p-__rn+1 of b-1
    val (carrySrc, carryBlk, carryPos, recvPos) =
      if (periods > 0)
        (col("__rnd") <= p, col("__blk") + 1L, lit(p + 1) - col("__rnd"), col("__rn"))
      else
        (col("__rn") <= p, col("__blk") - 1L, lit(p + 1) - col("__rn"), col("__rnd"))
    val carries = st.where(carrySrc)
      .select(carryBlk.as("__blk"), carryPos.as("__pos"), col(column).as("__carry"))
    st.withColumn("__pos", recvPos)
      .join(broadcast(carries), Seq("__blk", "__pos"), "left")
      .withColumn(out, coalesce(col("__intra"), col("__carry")))
      .drop("__blk", "__rn", "__rnd", "__pos", "__intra", "__carry")
  }

  /** diff = x - shift(x, periods) (reference: core/dataframe.py:4749). */
  def diff(df: DataFrame, column: String, periods: Int = 1,
           rowIndex: String = "row_index",
           blockSize: Long = DefaultBlockSize): DataFrame =
    shift(df, column, periods, rowIndex, Some("__shifted"), blockSize)
      .withColumn(column, col(column) - col("__shifted"))
      .drop("__shifted")

  /** Trailing rolling aggregate over `window` rows in `rowIndex` order
    * (reference: core/dataframe.py:5656 rolling, core/rolling.py:4-31 —
    * the reference exposes sum/array over the sliding matrix; here the
    * decomposable aggregates sum/count/mean/min/max). Partial windows
    * at the global head match rowsBetween(-(w-1), 0) edge behavior.
    *
    * Same block decomposition as [[shift]]: the intra-block window
    * covers rows >= `window` into a block; the first window-1 rows of
    * each block combine their intra result with the carried tail of the
    * previous block (every aggregate here is decomposable: the combine
    * is +, least or greatest). */
  def rollingAgg(df: DataFrame, column: String, window: Int, as: String, how: String,
                 rowIndex: String = "row_index",
                 blockSize: Long = DefaultBlockSize): DataFrame = {
    require(window >= 1, "window must be >= 1")
    require(blockSize >= window, s"blockSize=$blockSize must be >= window=$window")
    val (aggFn, combine): (Column => Column, (Column, Column) => Column) = how match {
      case "sum" => (sum(_), (a, b) => when(a.isNull && b.isNull, lit(null))
        .otherwise(coalesce(a, lit(0)) + coalesce(b, lit(0))))
      case "count" => (c => count(c), (a, b) => coalesce(a, lit(0L)) + coalesce(b, lit(0L)))
      case "min" => (min(_), (a, b) => least(a, b)) // least skips nulls
      case "max" => (max(_), (a, b) => greatest(a, b))
      case other => throw new IllegalArgumentException(s"unknown rolling agg: $other")
    }
    val asc = Window.partitionBy(col("__blk")).orderBy(col(rowIndex).asc)
    val st = staged(df, rowIndex, blockSize).withColumn("__intra",
      aggFn(col(column)).over(asc.rowsBetween(-(window - 1), 0)))
    if (window == 1)
      return st.withColumn(as, col("__intra")).drop("__blk", "__rn", "__rnd", "__intra")
    // row j (j < window) of block b+1 still needs the last (window - j)
    // rows of block b: carry those boundary rows, aggregate per receiver.
    val carries = st.where(col("__rnd") <= window - 1)
      .select((col("__blk") + 1L).as("__blk"), col("__rnd").as("__k"),
        col(column).as("__carry"))
    val extra = st.where(col("__rn") <= window - 1)
      .select(col("__blk"), col("__rn"), col(rowIndex))
      .join(broadcast(carries), Seq("__blk"), "left")
      .where(col("__k") <= lit(window) - col("__rn"))
      .groupBy(col(rowIndex)).agg(aggFn(col("__carry")).as("__extra"))
    st.join(broadcast(extra), Seq(rowIndex), "left")
      .withColumn(as, combine(col("__intra"), col("__extra")))
      .drop("__blk", "__rn", "__rnd", "__intra", "__extra")
  }

  def rollingSum(df: DataFrame, column: String, window: Int, as: String,
                 rowIndex: String = "row_index",
                 blockSize: Long = DefaultBlockSize): DataFrame =
    rollingAgg(df, column, window, as, "sum", rowIndex, blockSize)

  /** Rolling mean = rolling sum / rolling non-null count (one pass of
    * each; both reuse the same staged block computation shape). */
  def rollingMean(df: DataFrame, column: String, window: Int, as: String,
                  rowIndex: String = "row_index",
                  blockSize: Long = DefaultBlockSize): DataFrame =
    rollingAgg(rollingAgg(df, column, window, "__rsum", "sum", rowIndex, blockSize),
      column, window, "__rcnt", "count", rowIndex, blockSize)
      .withColumn(as, col("__rsum").cast("double") / col("__rcnt"))
      .drop("__rsum", "__rcnt")
}
