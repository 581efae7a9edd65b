package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types._

/** Flat-loop kernels for the curation lanes (r19). */
object CurateKernels {

  /** Sparse weighted dot over the key intersection of two
    * `map<string,double>` term-weight vectors, mirroring the HOF chain
    *
    *   aggregate(filter(map_values(map_zip_with(ma, mb,
    *     (k,x,y) => round(x*y,6))), notNull),
    *     0 as DECIMAL(38,10), (acc,v) => acc + v as DECIMAL(38,10))
    *     .cast(double)
    *
    * operation-for-operation: per shared key the product is Spark
    * `round(x*y, 6)` (BigDecimal.valueOf(double).setScale(6, HALF_UP)),
    * each product enters the accumulator through the double ->
    * DECIMAL(38,10) cast (valueOf + setScale(10, HALF_UP)), and the
    * accumulation is exact decimal addition — order-independent, so
    * hashing the intersection instead of walking ma's key order cannot
    * move the result. The HOF chain is interpreted per element with
    * boxed lambdas (HOFs do not whole-stage-codegen — the r11 lesson);
    * this kernel is one static call inside codegen. */
  def mapDotRound6(a: MapData, b: MapData): Double = {
    val (small, large) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val sk = small.keyArray(); val sv = small.valueArray()
    val lk = large.keyArray(); val lv = large.valueArray()
    val idx = new java.util.HashMap[Any, Integer](small.numElements() * 2)
    var j = 0
    while (j < small.numElements()) {
      if (!sv.isNullAt(j)) idx.put(sk.getUTF8String(j), Integer.valueOf(j))
      j += 1
    }
    var acc = JBigDecimal.ZERO.setScale(10)
    var i = 0
    while (i < large.numElements()) {
      if (!lv.isNullAt(i)) {
        val m = idx.get(lk.getUTF8String(i))
        if (m != null) {
          val prod = JBigDecimal.valueOf(lv.getDouble(i) * sv.getDouble(m.intValue()))
            .setScale(6, RoundingMode.HALF_UP).doubleValue()
          acc = acc.add(JBigDecimal.valueOf(prod).setScale(10, RoundingMode.HALF_UP))
        }
      }
      i += 1
    }
    acc.doubleValue()
  }
}

/** `map<string,double> x map<string,double> -> double`: exact-decimal
  * rounded sparse dot (see [[CurateKernels.mapDotRound6]]). */
case class TfidfMapDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case MapType(StringType, DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two map<string,double> arguments, " +
        s"got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "tfidf_map_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    CurateKernels.mapDotRound6(a.asInstanceOf[MapData], b.asInstanceOf[MapData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CurateKernels.mapDotRound6($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): TfidfMapDot = copy(left = l, right = r)
}
