package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.queries.Q

/** Distributed batch gradient descent for linear least squares as K
  * DECLARATIVE Spark plans — model training under the engine's
  * iterative-plan discipline (the same shape as BPE merge learning
  * and the PageRank power iterations): each step is ONE aggregation
  * over the data computing the exact-decimal gradient, and the
  * weight vector rides the plan as a broadcast 1-row frame (never a
  * driver collect).
  *
  * Scale shape: step t is scan -> partial agg -> (k+1) doubles — the
  * canonical distributed-GD communication pattern (gradient size is
  * the MODEL size, not the data size). The caller persists the
  * feature frame once (it is scanned `iters` times); the 1-row
  * weights frames need no persisting (each is consumed exactly once
  * as the next step's broadcast stage).
  *
  * Cross-engine determinism (what makes the lane oracle-exact):
  * per-row residual terms are plain double arithmetic (identical in
  * any IEEE engine given identical operands), gradient sums
  * accumulate in DECIMAL(38,10) (order-free), each gradient
  * component rounds to 6 dp before the update, and the learning rate
  * is a power of two — so the weight trajectory is BIT-IDENTICAL in
  * Spark and the unrolled-CTE SQL mirror `oracleSql` generates.
  * There is deliberately no transcendental (sigmoid) in the loop:
  * libm exp last-ulp differences would compound across iterations.
  */
object GradientDescent {

  /** `iters` GD steps from w=0 with learning rate `lr` (use a power
    * of two). Returns a ONE-ROW frame: w0 (intercept), w1..wk in
    * `features` order, each rounded to 6 dp. */
  def linearFit(data: DataFrame, features: Seq[String], label: String,
      iters: Int, lr: Double): DataFrame =
    fit(data, features, label, iters, lr, hinge = false)

  /** Linear CLASSIFIER training via squared-hinge loss (L2-SVM
    * shape): labels are +-1, the per-row gradient factor is
    * -2*y*max(0, 1 - y*f) — pure comparisons and arithmetic, so the
    * trajectory stays cross-engine bit-identical where a logistic
    * sigmoid could not (libm exp ulp drift compounds per step). This
    * is the "train the quality classifier ON the cluster" primitive:
    * the engine's FeatureWeightSum scoring kernel consumes exactly
    * such linear weights. */
  def squaredHingeFit(data: DataFrame, features: Seq[String], label: String,
      iters: Int, lr: Double): DataFrame =
    fit(data, features, label, iters, lr, hinge = true)

  private def fit(data: DataFrame, features: Seq[String], label: String,
      iters: Int, lr: Double, hinge: Boolean): DataFrame = {
    require(features.nonEmpty && iters >= 1, "features and iters required")
    // zero rows would propagate NULL gradients into all-NULL weights —
    // fail loudly instead (one cheap limit-1 probe)
    require(!data.isEmpty, "GradientDescent: empty input frame")
    // internal weight/gradient columns are namespaced so input frames
    // that happen to carry w0/g1-style columns cannot collide
    val reserved = (data.columns.toSet & (0 to features.size)
      .flatMap(j => Seq(s"__gd_w$j", s"__gd_g$j")).toSet)
    require(reserved.isEmpty,
      s"GradientDescent: reserved column names in input: ${reserved.mkString(",")}")
    val k = features.size
    val spark = data.sparkSession
    var w: DataFrame = spark.range(1)
      .select((0 to k).map(j => lit(0.0).as(s"__gd_w$j")): _*)
    // each 1-row weights frame is consumed exactly once by the next
    // step's broadcast, so the chain needs NO per-step persisting
    // (unlike BPE's full-corpus generations) — one final action runs
    // each gradient aggregation once, as nested broadcast stages.
    // The caller persists `data` (scanned `iters` times).
    (1 to iters).foreach { _ =>
      val joined = data.crossJoin(broadcast(w)) // 1-row scalar anchor
      val pred = (1 to k).foldLeft(col("__gd_w0")) { (acc, j) =>
        acc + col(s"__gd_w$j") * col(features(j - 1))
      }
      // squares: d/dw of (f-y)^2 ~ (f-y)*x_j; squared hinge:
      // d/dw of max(0,1-y*f)^2 = -2*y*max(0,1-y*f)*x_j
      val base =
        if (hinge) lit(-2.0) * col(label) *
          greatest(lit(0.0), lit(1.0) - col(label) * pred)
        else pred - col(label)
      val gradAggs = (0 to k).map { j =>
        val term = if (j == 0) base else base * col(features(j - 1))
        Q.r(Q.dsumD(term) / count(lit(1)), 6).as(s"__gd_g$j")
      }
      val carry = (0 to k).map(j => first(col(s"__gd_w$j")).as(s"__gd_w$j"))
      val aggs = carry ++ gradAggs
      w = joined.agg(aggs.head, aggs.tail: _*)
        .select((0 to k).map(j =>
          (col(s"__gd_w$j") - lit(lr) * col(s"__gd_g$j")).as(s"__gd_w$j")): _*)
    }
    // public output names: w0 (intercept), w1..wk
    w.select((0 to k).map(j => round(col(s"__gd_w$j"), 6).as(s"w$j")): _*)
  }

  /** The DuckDB mirror: unrolled CTE chain computing the identical
    * weight trajectory over `fromSql` (a subquery producing the same
    * feature/label columns). One rendering of the arithmetic shared
    * with linearFit via the Q.sql* builders. */
  def oracleSql(fromSql: String, features: Seq[String], label: String,
      iters: Int, lr: Double, hinge: Boolean = false): String = {
    val k = features.size
    def wRef(i: Int, j: Int): String =
      if (i == 0) "CAST(0.0 AS DOUBLE)" else s"(SELECT w$j FROM w$i)"
    // MATERIALIZED: DuckDB inlines plain CTEs, and the w/g reference
    // chain would expand exponentially (observed as thousands of
    // parquet re-opens); materialization evaluates each step once —
    // exactly the Spark side's execution shape
    val ctes = Seq.newBuilder[String]
    ctes += s"d AS MATERIALIZED ($fromSql)"
    (1 to iters).foreach { i =>
      val pred = (1 to k).foldLeft(wRef(i - 1, 0)) { (acc, j) =>
        s"($acc + ${wRef(i - 1, j)} * ${features(j - 1)})"
      }
      val base =
        if (hinge)
          s"(-2.0 * $label * GREATEST(0.0, 1.0 - $label * $pred))"
        else s"($pred - $label)"
      val grads = (0 to k).map { j =>
        val term = if (j == 0) base else s"($base * ${features(j - 1)})"
        s"${Q.sqlR(s"${Q.sqlDsum(term)} / COUNT(*)", 6)} AS g$j"
      }
      ctes += s"g$i AS MATERIALIZED (SELECT ${grads.mkString(", ")} FROM d)"
      val ws = (0 to k).map(j =>
        s"(${wRef(i - 1, j)} - $lr * (SELECT g$j FROM g$i)) AS w$j")
      ctes += s"w$i AS MATERIALIZED (SELECT ${ws.mkString(", ")})"
    }
    val out = (0 to k).map(j => s"ROUND(w$j, 6) AS w$j")
    s"WITH ${ctes.result().mkString(",\n")}\nSELECT ${out.mkString(", ")} FROM w$iters"
  }
}
