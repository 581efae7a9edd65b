package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.execution.{CodegenSupport, SparkPlan, UnaryExecNode, UnionExec, WholeStageCodegenExec}
import org.apache.spark.sql.types.BinaryType

/** WHOLE-STAGE-CODEGEN fusion of the dense ordinal aggregation
  * ([[DenseCatAgg.groupByOrdinal]]'s hot loop): the per-task flat-grid
  * accumulate runs INSIDE the child pipeline's generated loop — no
  * UnsafeRow materialization, no iterator hand-off per row, the key
  * and value expressions feed the accumulator arrays straight from
  * registers. The r15 decomposition probe (JoinDenseProbe) showed the
  * row boundary + interpreted loop costing ~1.9 ns/row — MORE than
  * the dense-join probe itself — so this is the lever for the
  * join_dense/binby_dense throughput gates.
  *
  * Plan surgery instead of a planner strategy: groupByOrdinal is an
  * EAGER operator (its result is a driver-local grid, merged
  * executor-side via RDD reduce — never a composable lazy frame), so
  * there is no logical plan to rewrite. We take the projected input's
  * own executed plan and, when its top is a WholeStageCodegenExec
  * (scan -> project pipelines; unions of them), re-wrap the INNER
  * pipeline under [[DenseAggFusedExec]] inside a fresh
  * WholeStageCodegenExec — exactly what CollapseCodegenStages would
  * have produced had the operator existed at planning time. Any other
  * plan shape (or `spark.graft.denseAgg.fuse=false`) falls back to
  * the interpreted mapPartitions loop, and the exec's own doExecute
  * IS that loop (the engine's codegen-compile-failure fallback).
  *
  * The emitted "rows" are one [[GenericInternalRow]] per task holding
  * the raw accumulator arrays (declared BinaryType — nothing
  * downstream inspects the schema; the consumer unwraps in the same
  * pipelined stage and reduces [[DenseCatAgg.Buf]]s as before). */
private[graft] object DenseAggFused {

  /** Try to build the fused partial-buffer RDD for `projected`
    * (columns: __code bigint, __v0..__v{nv-1} double). */
  def tryFused(projected: DataFrame, domain: Int, nv: Int,
      needMM: Boolean): Option[RDD[InternalRow]] = {
    def wrap(p: SparkPlan): Option[SparkPlan] = p match {
      case w: WholeStageCodegenExec =>
        Some(WholeStageCodegenExec(
          DenseAggFusedExec(w.child, domain, nv, needMM))(w.codegenStageId))
      case u: UnionExec =>
        val kids = u.children.map(wrap)
        if (kids.forall(_.isDefined)) Some(u.withNewChildren(kids.map(_.get)))
        else None
      case _ => None
    }
    wrap(projected.queryExecution.executedPlan).map(_.execute())
  }
}

/** The codegen participant: consumes the child pipeline, accumulates
  * into per-task flat arrays, emits ONE buffer row when the input is
  * exhausted. See [[DenseAggFused]]. */
private[graft] case class DenseAggFusedExec(child: SparkPlan, domain: Int,
    nv: Int, needMM: Boolean) extends UnaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] = DenseAggFusedExec.BufOutput
  override protected def withNewChildInternal(c: SparkPlan): DenseAggFusedExec =
    copy(child = c)

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    child.asInstanceOf[CodegenSupport].inputRDDs()

  /** Interpreted fallback — also what WholeStageCodegenExec runs if
    * the generated code fails to compile. Same loop as the classic
    * mapPartitions path. */
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions { it =>
      Iterator.single(
        DenseAggFusedExec.accumulateRow(it, domain, nv, needMM))
    }

  private var rowCntVar: String = _
  private var sumsVar: String = _
  private var cntsVar: String = _
  private var minsVar: String = _
  private var maxsVar: String = _

  override protected def doProduce(ctx: CodegenContext): String = {
    val done = ctx.addMutableState("boolean", "denseAggDone")
    rowCntVar = ctx.addMutableState("long[]", "denseAggRowCnt")
    sumsVar = ctx.addMutableState("double[]", "denseAggSums")
    cntsVar = ctx.addMutableState("long[]", "denseAggCnts")
    minsVar = ctx.addMutableState("double[]", "denseAggMins")
    maxsVar = ctx.addMutableState("double[]", "denseAggMaxs")
    // the child loop lives in its own function (HashAggregate's shape)
    val childProduce = child.asInstanceOf[CodegenSupport].produce(ctx, this)
    val outRow = ctx.freshName("denseAggBufRow")
    val mmInit =
      if (needMM)
        s"""$minsVar = new double[${nv * domain}];
           |java.util.Arrays.fill($minsVar, Double.NaN);
           |$maxsVar = new double[${nv * domain}];
           |java.util.Arrays.fill($maxsVar, Double.NEGATIVE_INFINITY);"""
          .stripMargin
      else s"$minsVar = null; $maxsVar = null;"
    s"""
       |if (!$done) {
       |  $rowCntVar = new long[$domain];
       |  $sumsVar = new double[${nv * domain}];
       |  $cntsVar = new long[${nv * domain}];
       |  $mmInit
       |  $childProduce
       |  $done = true;
       |  InternalRow $outRow =
       |    graft.operators.DenseAggFusedExec.bufRow($rowCntVar, $sumsVar,
       |      $cntsVar, $minsVar, $maxsVar);
       |  ${consume(ctx, null, outRow)}
       |}
     """.stripMargin
  }

  override def doConsume(ctx: CodegenContext, input: Seq[ExprCode],
      row: ExprCode): String = {
    val code = input.head
    val values = input.tail
    val kl = ctx.freshName("kl")
    val k = ctx.freshName("k")
    val perValue = values.zipWithIndex.map { case (v, j) =>
      val slot = if (j == 0) k else s"($k + ${j * domain})"
      val mm =
        if (needMM)
          s"""if (java.lang.Double.compare(${v.value}, $minsVar[$slot]) < 0)
             |  $minsVar[$slot] = ${v.value};
             |if (java.lang.Double.compare(${v.value}, $maxsVar[$slot]) > 0)
             |  $maxsVar[$slot] = ${v.value};""".stripMargin
        else ""
      s"""
         |${v.code}
         |if (!${v.isNull}) {
         |  $sumsVar[$slot] += ${v.value};
         |  $cntsVar[$slot] += 1L;
         |  $mm
         |}""".stripMargin
    }.mkString("\n")
    s"""
       |${code.code}
       |if (!${code.isNull}) {
       |  final long $kl = ${code.value};
       |  if ($kl >= 0L && $kl < ${domain}L) {
       |    final int $k = (int) $kl;
       |    $rowCntVar[$k] += 1L;
       |    $perValue
       |  }
       |}
     """.stripMargin
  }
}

private[graft] object DenseAggFusedExec {
  /** Opaque one-row-per-task schema (never inspected downstream). */
  val BufOutput: Seq[Attribute] = Seq(
    AttributeReference("rowCnt", BinaryType, nullable = false)(),
    AttributeReference("sums", BinaryType, nullable = false)(),
    AttributeReference("cnts", BinaryType, nullable = false)(),
    AttributeReference("mins", BinaryType, nullable = true)(),
    AttributeReference("maxs", BinaryType, nullable = true)())

  /** Static target for generated code: wrap the task's accumulator
    * arrays as one row (shallow — the consumer unwraps in-stage). */
  def bufRow(rowCnt: Array[Long], sums: Array[Double], cnts: Array[Long],
      mins: Array[Double], maxs: Array[Double]): InternalRow =
    new GenericInternalRow(Array[Any](rowCnt, sums, cnts, mins, maxs))

  /** Interpreted accumulate (fallback + classic path), emitting the
    * same buffer-row shape as the generated code. */
  def accumulateRow(it: Iterator[InternalRow], domain: Int, nv: Int,
      needMM: Boolean): InternalRow = {
    val rowCnt = new Array[Long](domain)
    val sums = new Array[Double](nv * domain)
    val cnts = new Array[Long](nv * domain)
    val mins = if (needMM) Array.fill(nv * domain)(Double.NaN) else null
    val maxs =
      if (needMM) Array.fill(nv * domain)(Double.NegativeInfinity) else null
    if (nv == 1 && !needMM) {
      while (it.hasNext) {
        val r = it.next()
        if (!r.isNullAt(0)) {
          val kl = r.getLong(0)
          if (kl >= 0L && kl < domain) {
            val k = kl.toInt
            rowCnt(k) += 1L
            if (!r.isNullAt(1)) { sums(k) += r.getDouble(1); cnts(k) += 1L }
          }
        }
      }
    } else {
      while (it.hasNext) {
        val r = it.next()
        if (!r.isNullAt(0)) {
          val kl = r.getLong(0)
          if (kl >= 0L && kl < domain) {
            val k = kl.toInt
            rowCnt(k) += 1L
            var j = 0
            while (j < nv) {
              if (!r.isNullAt(j + 1)) {
                val v = r.getDouble(j + 1)
                val i = j * domain + k
                sums(i) += v
                cnts(i) += 1L
                if (needMM) {
                  if (java.lang.Double.compare(v, mins(i)) < 0) mins(i) = v
                  if (java.lang.Double.compare(v, maxs(i)) > 0) maxs(i) = v
                }
              }
              j += 1
            }
          }
        }
      }
    }
    bufRow(rowCnt, sums, cnts, mins, maxs)
  }
}
