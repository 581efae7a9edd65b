package graft.ml

import org.apache.spark.sql.functions._
import graft.VxFrame

/** ML preprocessing transformers (reference: packages/vaex-ml/vaex/ml/
  * transformations.py) re-expressed in the engine's own state model:
  * vaex pipelines are "just state" — virtual columns + variables
  * captured by state_get (reference: core/dataframe.py:2502,
  * ml/state.py) — so every transformer here is
  *
  *   fit:       one distributed aggregation pass -> a few scalars
  *   transform: a virtual column added to the VxFrame
  *
  * and the fitted pipeline serializes/restores through
  * `VxFrame.stateGet/stateSet` with no extra machinery. All transforms
  * are expression strings -> whole-stage codegen; fit passes are single
  * `agg` calls -> partial/final hash aggregation at any scale.
  */
object Transformers {

  /** StandardScaler (reference: ml/transformations.py:582): fit =
    * mean/std (ddof=0) pass; transform = (x - mean) / std. */
  def standardScaler(f: VxFrame, column: String, prefix: String = "standard_scaled_"): VxFrame = {
    val r = f.df.agg(
      avg(col(column)).as("mean"),
      stddev_pop(col(column)).as("std")).head()
    val (m, s) = (r.getDouble(0), r.getDouble(1))
    f.withVariable(s"__${column}_mean", m)
      .withVariable(s"__${column}_std", if (s == 0.0) 1.0 else s)
      .withVirtualColumn(s"$prefix$column",
        s"($column - __${column}_mean) / __${column}_std")
  }

  /** MinMaxScaler (reference: ml/transformations.py:653) onto
    * [lo, hi] (default [0,1]); single minmax pass. */
  def minMaxScaler(f: VxFrame, column: String, lo: Double = 0.0, hi: Double = 1.0,
                   prefix: String = "minmax_scaled_"): VxFrame = {
    val r = f.df.agg(min(col(column)).cast("double"), max(col(column)).cast("double")).head()
    val (mn, mx) = (r.getDouble(0), r.getDouble(1))
    val span = if (mx == mn) 1.0 else mx - mn
    f.withVariable(s"__${column}_min", mn)
      .withVariable(s"__${column}_span", span)
      .withVirtualColumn(s"$prefix$column",
        s"(($column - __${column}_min) / __${column}_span) * ${hi - lo} + $lo")
  }

  /** MaxAbsScaler (reference: ml/transformations.py:726). */
  def maxAbsScaler(f: VxFrame, column: String, prefix: String = "absmax_scaled_"): VxFrame = {
    val m = f.df.agg(max(abs(col(column))).cast("double")).head().getDouble(0)
    f.withVariable(s"__${column}_absmax", if (m == 0.0) 1.0 else m)
      .withVirtualColumn(s"$prefix$column", s"$column / __${column}_absmax")
  }

  /** RobustScaler (reference: ml/transformations.py:784): center by
    * median, scale by IQR — exact percentiles (at extreme scale swap in
    * percentile_approx; the state shape is identical). */
  def robustScaler(f: VxFrame, column: String, prefix: String = "robust_scaled_"): VxFrame = {
    val r = f.df.agg(
      expr(s"percentile($column, 0.5)"),
      expr(s"percentile($column, 0.75) - percentile($column, 0.25)")).head()
    val iqr = if (r.getDouble(1) == 0.0) 1.0 else r.getDouble(1)
    f.withVariable(s"__${column}_median", r.getDouble(0))
      .withVariable(s"__${column}_iqr", iqr)
      .withVirtualColumn(s"$prefix$column",
        s"($column - __${column}_median) / __${column}_iqr")
  }

  /** LabelEncoder (reference: ml/transformations.py:302): fit =
    * sorted distinct values -> ordinal codes; transform = CASE chain
    * (dictionary is expression-encoded state, so it serializes).
    * Guard `maxCardinality` mirrors vaex's row_limit idiom. */
  def labelEncoder(f: VxFrame, column: String, prefix: String = "label_encoded_",
                   maxCardinality: Int = 10000): VxFrame = {
    val values = f.df.select(col(column).cast("string")).distinct()
      .orderBy(col(column)).limit(maxCardinality + 1)
      .collect().map(_.getString(0))
    require(values.length <= maxCardinality, s"cardinality of $column exceeds $maxCardinality")
    val cases = values.zipWithIndex
      .map { case (v, i) => s"WHEN $column = '${v.replace("'", "''")}' THEN $i" }
      .mkString("CASE ", " ", " ELSE -1 END")
    f.withVirtualColumn(s"$prefix$column", cases)
  }

  /** OneHotEncoder (reference: ml/transformations.py:366): one 0/1
    * virtual column per distinct value. */
  def oneHotEncoder(f: VxFrame, column: String, maxCardinality: Int = 64): VxFrame = {
    val values = f.df.select(col(column).cast("string")).distinct()
      .orderBy(col(column)).limit(maxCardinality + 1)
      .collect().map(_.getString(0))
    require(values.length <= maxCardinality, s"cardinality of $column exceeds $maxCardinality")
    values.foldLeft(f) { (acc, v) =>
      val safe = v.replaceAll("[^A-Za-z0-9_]", "_")
      acc.withVirtualColumn(s"${column}_$safe",
        s"CASE WHEN $column = '${v.replace("'", "''")}' THEN 1 ELSE 0 END")
    }
  }

  /** FrequencyEncoder (reference: ml/transformations.py:523): value ->
    * relative frequency. */
  def frequencyEncoder(f: VxFrame, column: String, prefix: String = "frequency_encoded_",
                       maxCardinality: Int = 10000): VxFrame = {
    val rows = f.df.groupBy(col(column).cast("string").as("v"))
      .agg(count(lit(1)).as("n")).limit(maxCardinality + 1).collect()
    require(rows.length <= maxCardinality, s"cardinality of $column exceeds $maxCardinality")
    val total = rows.map(_.getLong(1)).sum.toDouble
    val cases = rows.sortBy(_.getString(0))
      .map(r => s"WHEN $column = '${r.getString(0).replace("'", "''")}' THEN ${r.getLong(1) / total}D")
      .mkString("CASE ", " ", " ELSE 0.0D END")
    f.withVirtualColumn(s"$prefix$column", cases)
  }

  /** KBinsDiscretizer (reference: ml/transformations.py:1067),
    * uniform strategy: fixed-width bins from one minmax pass. */
  def kBinsDiscretizer(f: VxFrame, column: String, nBins: Int,
                       prefix: String = "binned_"): VxFrame = {
    val r = f.df.agg(min(col(column)).cast("double"), max(col(column)).cast("double")).head()
    val (mn, mx) = (r.getDouble(0), r.getDouble(1))
    val width = if (mx == mn) 1.0 else (mx - mn) / nBins
    f.withVariable(s"__${column}_binmin", mn)
      .withVariable(s"__${column}_binwidth", width)
      .withVirtualColumn(s"$prefix$column",
        s"LEAST(CAST(FLOOR(($column - __${column}_binmin) / __${column}_binwidth) AS INT), ${nBins - 1})")
  }

  /** CycleTransformer (reference: ml/transformations.py:859): encode a
    * cyclic feature (hour, weekday...) as sin/cos pair. */
  def cycleTransformer(f: VxFrame, column: String, period: Double): VxFrame =
    f.withVirtualColumn(s"${column}_sin", s"SIN(2 * pi * $column / $period)")
      .withVirtualColumn(s"${column}_cos", s"COS(2 * pi * $column / $period)")
}
