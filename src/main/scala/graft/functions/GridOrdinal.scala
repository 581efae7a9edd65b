package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** The N-d bin composite ordinal as ONE codegen'd kernel — the
  * reference's binner_ordinal inner loop (reference:
  * src/binner_ordinal.cpp:9) expressed as a single expression: per
  * dimension a range gate and `floor((c - vmin) / width)` with the
  * last-bin clamp, folded row-major into one long. Null, NaN and
  * out-of-range inputs yield NULL (the dense accumulate drops null
  * codes — exactly the rows the hash path's `where(inRange)` removes).
  *
  * BIT-PARITY contract with the Catalyst formulation it replaces
  * (`least(floor((c - vmin) / width).cast("int"), shape-1)` +
  * standalone range filter): identical IEEE double subtract/divide,
  * `Math.floor` == Catalyst FLOOR on doubles, the clamp == `least`,
  * and the range compares are the filter's own — pinned by the
  * dense-vs-hash parity specs and the binby oracle lanes. What it
  * SAVES per row: the ANSI double->int cast's range-check branches,
  * the `least` null-logic, per-dim intermediate columns, and the
  * separate FilterExec — one straight-line block per dimension
  * instead. */
case class GridOrdinal(children: Seq[Expression], mins: Seq[Double],
    maxs: Seq[Double], shapes: Seq[Int]) extends Expression {

  require(children.nonEmpty &&
    children.size == mins.size && mins.size == maxs.size &&
    maxs.size == shapes.size, "gridOrdinal: dimension arity mismatch")
  require(shapes.forall(_ > 0), s"gridOrdinal: shapes must be positive: $shapes")
  // doGenCode interpolates limits as Java double literals — an
  // Infinity/NaN limit would render as uncompilable source
  // ("InfinityD") and silently fall back to interpreted eval
  require(mins.forall(d => !d.isNaN && !d.isInfinite) &&
    maxs.forall(d => !d.isNaN && !d.isInfinite),
    s"gridOrdinal: limits must be finite: mins=$mins maxs=$maxs")

  private val widths: Seq[Double] =
    mins.lazyZip(maxs).lazyZip(shapes).map((lo, hi, s) => (hi - lo) / s)

  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = children.map(_.dataType).filterNot(_ == DoubleType)
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires double inputs, got ${bad.map(_.catalogString)}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def foldable: Boolean = false
  override def prettyName: String = "grid_ordinal"

  override def eval(input: InternalRow): Any = {
    var ord = 0L
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      if (v == null) return null
      val c = v.asInstanceOf[Double]
      // NaN fails both compares — dropped like the range filter
      if (!(c >= mins(i) && c < maxs(i))) return null
      var b = math.floor((c - mins(i)) / widths(i)).toLong
      if (b > shapes(i) - 1) b = shapes(i) - 1 // FP edge clamp (== least)
      ord = ord * shapes(i) + b
      i += 1
    }
    ord
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    val ord = ctx.freshName("gridOrd")
    val dims = gens.zipWithIndex.map { case (g, i) =>
      val c = ctx.freshName("c")
      val b = ctx.freshName("b")
      s"""
         |${g.code}
         |if (${g.isNull}) { ${ev.isNull} = true; break; }
         |final double $c = ${g.value};
         |if (!($c >= ${mins(i)}D && $c < ${maxs(i)}D)) {
         |  ${ev.isNull} = true; break;
         |}
         |long $b = (long) Math.floor(($c - ${mins(i)}D) / ${widths(i)}D);
         |if ($b > ${shapes(i) - 1}L) $b = ${shapes(i) - 1}L;
         |$ord = $ord * ${shapes(i)}L + $b;""".stripMargin
    }.mkString("\n")
    ev.copy(code = code"""
      boolean ${ev.isNull} = false;
      long $ord = 0L;
      do {
        $dims
      } while (false);
      long ${ev.value} = ${ev.isNull} ? 0L : $ord;""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GridOrdinal =
    copy(children = newChildren)
}
