package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Flat-loop kernels for the OrderedOps rolling order statistics
  * (r18 opt session 2). The interpreted higher-order chain they
  * replace (`transform` + `sort_array` + `filter` + `element_at` per
  * row — HOFs do not participate in whole-stage codegen, the r11
  * lesson) was the dominant per-row cost of rollingMedian /
  * rollingQuantile; the kernel gathers the window's non-null values,
  * sorts a primitive double[] and interpolates, mirroring the Column
  * formulations operation-for-operation (pinned by
  * RollingKernelsSpec against the old formulation kept verbatim).
  */
object RollingKernels {

  /** Interpolated quantile over the non-null `v` fields of an
    * `array<struct<i,v>>` window (order irrelevant — the quantile
    * sorts values). `midpoint = true` is SQL MEDIAN's (a+b)/2 even-n
    * formula with q pinned 0.5; `false` is numpy-linear
    * `lov + (hiv - lov) * frac` at position q*(n-1). Returns null
    * (boxed) for an all-null window. NaN sorts greatest, matching
    * Spark's double ordering. */
  def quantileOfItems(arr: ArrayData, q: Double, midpoint: Boolean): Any = {
    val m = arr.numElements()
    val vals = new Array[Double](m)
    var n = 0
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, 2)
        if (!row.isNullAt(1)) { vals(n) = row.getDouble(1); n += 1 }
      }
      i += 1
    }
    quantileOfSorted(vals, n, q, midpoint)
  }

  /** Sort-and-interpolate tail of [[quantileOfItems]], shared with the
    * block generators (RollingBlockQuantile): sorts vals[0, n) in
    * place and applies the identical interpolation formulas. */
  def quantileOfSorted(vals: Array[Double], n: Int, q: Double,
                       midpoint: Boolean): Any = {
    if (n == 0) return null
    java.util.Arrays.sort(vals, 0, n) // NaN last == Spark NaN-greatest
    if (midpoint) {
      // mirrors: half = floor(n/2); odd -> a[half]; even ->
      // (element_at(half) + element_at(half+1)) / 2.0
      val half = n / 2
      if (n % 2 == 1) java.lang.Double.valueOf(vals(half))
      else java.lang.Double.valueOf((vals(half - 1) + vals(half)) / 2.0)
    } else {
      // mirrors: pos = q * (n-1); lo = floor(pos); frac = pos - lo;
      // lov + (hiv - lov) * frac with hiv at min(lo+1, n-1)
      val pos = q * (n - 1).toDouble
      val lo = math.floor(pos).toInt
      val frac = pos - lo.toDouble
      val lov = vals(lo)
      val hiv = vals(math.min(lo + 1, n - 1))
      java.lang.Double.valueOf(lov + (hiv - lov) * frac)
    }
  }
}

/** `array<struct<i, v: double>> -> double`: interpolated rolling
  * window quantile (see [[RollingKernels.quantileOfItems]]). */
case class WindowQuantileItems(child: Expression, q: Double, midpoint: Boolean)
    extends UnaryExpression {
  require(q >= 0.0 && q <= 1.0, s"quantile out of range: $q")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fields), _)
        if fields.length == 2 && fields(1).dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<_, double>>, got ${t.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "window_quantile_items"

  override def nullSafeEval(a: Any): Any =
    RollingKernels.quantileOfItems(a.asInstanceOf[ArrayData], q, midpoint)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("wq")
    nullSafeCodeGen(ctx, ev, a =>
      s"""Object $res = graft.functions.RollingKernels.quantileOfItems($a, $q, $midpoint);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) $res).doubleValue(); }""".stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): WindowQuantileItems =
    copy(child = c)
}
