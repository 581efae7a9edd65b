package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-evaluation metrics (reference: packages/vaex-ml/vaex/ml/
  * metrics.py:102-476) as distributed one-pass aggregations.
  *
  * Scale design: every scalar metric is ONE `agg` over codegen'd
  * conditional counts — partial/final hash aggregation, no shuffle of
  * rows, no driver-side label arrays (the reference materializes numpy
  * arrays per class; here multiclass averaging aggregates per label in
  * a single groupBy whose cardinality is the number of classes).
  */
object Metrics {

  /** reference: metrics.py:102 accuracy_score. */
  def accuracyScore(df: DataFrame, yTrue: String, yPred: String): Double =
    df.agg(avg(when(col(yTrue) === col(yPred), 1.0).otherwise(0.0)))
      .head().getDouble(0)

  /** reference: metrics.py:128 confusion_matrix — (true, pred, count)
    * rows; the dense matrix is shape-bounded by the label cardinality. */
  def confusionMatrix(df: DataFrame, yTrue: String, yPred: String): DataFrame =
    df.groupBy(col(yTrue).as("label_true"), col(yPred).as("label_pred"))
      .agg(count(lit(1)).as("n"))

  /** Binary precision/recall/F1 for the positive class
    * (reference: metrics.py:157 average='binary'). One pass: TP/FP/FN
    * from conditional sums. Zero denominators yield 0.0 (the
    * reference's zero_division behavior). */
  def precisionRecallF1(df: DataFrame, yTrue: String, yPred: String,
                        positive: Any = 1): (Double, Double, Double) = {
    val t = col(yTrue) === lit(positive)
    val p = col(yPred) === lit(positive)
    val r = df.agg(
      sum(when(t && p, 1L).otherwise(0L)).as("tp"),
      sum(when(!t && p, 1L).otherwise(0L)).as("fp"),
      sum(when(t && !p, 1L).otherwise(0L)).as("fn")).head()
    val (tp, fp, fn) = (r.getLong(0).toDouble, r.getLong(1).toDouble, r.getLong(2).toDouble)
    val precision = if (tp + fp == 0) 0.0 else tp / (tp + fp)
    val recall = if (tp + fn == 0) 0.0 else tp / (tp + fn)
    val f1 = if (precision + recall == 0) 0.0
      else 2 * precision * recall / (precision + recall)
    (precision, recall, f1)
  }

  /** Macro-averaged precision/recall/F1 (reference: metrics.py:157
    * average='macro'): per-label counts in ONE groupBy over the union
    * of true and predicted labels, averaged driver-side over the
    * (shape-bounded) label set. */
  def precisionRecallF1Macro(df: DataFrame, yTrue: String, yPred: String)
  : (Double, Double, Double) = {
    val byTrue = df.groupBy(col(yTrue).as("label"))
      .agg(count(lit(1)).as("support"),
        sum(when(col(yTrue) === col(yPred), 1L).otherwise(0L)).as("tp"))
    val byPred = df.groupBy(col(yPred).as("label"))
      .agg(count(lit(1)).as("predicted"))
    val rows = byTrue.join(byPred, Seq("label"), "full_outer")
      .na.fill(0L, Seq("support", "tp", "predicted")).collect()
    val perLabel = rows.map { r =>
      val support = r.getLong(1).toDouble
      val tp = r.getLong(2).toDouble
      val predicted = r.getLong(3).toDouble
      val precision = if (predicted == 0) 0.0 else tp / predicted
      val recall = if (support == 0) 0.0 else tp / support
      val f1 = if (precision + recall == 0) 0.0
        else 2 * precision * recall / (precision + recall)
      (precision, recall, f1)
    }
    val n = perLabel.length.toDouble
    (perLabel.map(_._1).sum / n, perLabel.map(_._2).sum / n, perLabel.map(_._3).sum / n)
  }

  /** reference: metrics.py:327 matthews_correlation_coefficient
    * (binary). */
  def matthewsCorrCoef(df: DataFrame, yTrue: String, yPred: String,
                       positive: Any = 1): Double = {
    val t = col(yTrue) === lit(positive)
    val p = col(yPred) === lit(positive)
    val r = df.agg(
      sum(when(t && p, 1L).otherwise(0L)),
      sum(when(!t && p, 1L).otherwise(0L)),
      sum(when(t && !p, 1L).otherwise(0L)),
      sum(when(!t && !p, 1L).otherwise(0L))).head()
    val (tp, fp, fn, tn) = (r.getLong(0).toDouble, r.getLong(1).toDouble,
      r.getLong(2).toDouble, r.getLong(3).toDouble)
    val den = math.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    if (den == 0) 0.0 else (tp * tn - fp * fn) / den
  }

  /** reference: metrics.py:409/:435 mean absolute / squared error. */
  def meanAbsoluteError(df: DataFrame, yTrue: String, yPred: String): Double =
    df.agg(avg(abs(col(yTrue) - col(yPred)))).head().getDouble(0)
  def meanSquaredError(df: DataFrame, yTrue: String, yPred: String): Double = {
    val d = col(yTrue) - col(yPred)
    df.agg(avg(d * d)).head().getDouble(0)
  }

  /** reference: metrics.py:461 r2_score = 1 - SS_res/SS_tot, one pass
    * via raw moments (no second scan for the mean). */
  def r2Score(df: DataFrame, yTrue: String, yPred: String): Double = {
    val y = col(yTrue).cast("double"); val d = y - col(yPred)
    val r = df.agg(count(y), sum(y), sum(y * y), sum(d * d)).head()
    val n = r.getLong(0).toDouble
    val (sy, syy, ssRes) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val ssTot = syy - sy * sy / n
    if (ssTot == 0) 0.0 else 1.0 - ssRes / ssTot
  }
}
