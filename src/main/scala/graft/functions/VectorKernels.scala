package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen kernels for the embedding hot path (round-11, the vector
  * siblings of TextKernels): SRP-LSH band signatures and PQ encoding
  * were interpreted `transform`+`aggregate` lambdas over every vector
  * element × every bit/centroid — O(nBits·dim) and O(m·k·subDim)
  * boxed evaluations per row. Each kernel is one flat loop inside
  * whole-stage codegen, bit-identical to the Column formulation it
  * replaces (left-to-right double folds, lexicographic (dist, code)
  * argmin, DECIMAL(28,10) exact error sums — property-spec'd in
  * VectorKernelsSpec), so the DuckDB oracles are unchanged.
  *
  * Reference capability class: vaex's C++ SIMD kernels over mmap'd
  * float columns (src/agg_*.cpp) — the per-element-dispatch-free
  * design, as Catalyst expressions.
  */
object VectorKernels {

  /** The deterministic ±1 hyperplane matrix both the Column API and
    * the SQL registration derive SRP planes from — ONE definition so
    * the two surfaces can never drift (sign = parity of the
    * universal-hash image of the element index). */
  def srpSigns(dim: Int, nBands: Int, bitsPerBand: Int): Array[Array[Byte]] =
    Array.tabulate(nBands * bitsPerBand) { j =>
      Array.tabulate(dim) { i =>
        val parity = (TextFunctions.uhashA(j) * (i + 1) +
          TextFunctions.uhashB(j)) % TextFunctions.UHASH_P % 2
        (1 - 2 * parity.toInt).toByte
      }
    }

  /** SRP band keys: bit r of band b is the sign of the dot product of
    * the embedding with the ±1 hyperplane `signs(b*bitsPerBand+r)`;
    * key = Σ bit_r·2^r. Fold is element-order double accumulation —
    * identical to the aggregate() formulation, including its null
    * semantics (any null element nulls the dot product, which the
    * when() lowered to bit 0). */
  def srpBandKeys(emb: ArrayData, signs: Array[Array[Byte]],
      nBands: Int, bitsPerBand: Int): ArrayData = {
    val dim = signs(0).length
    // intentional loud-fail on a short embedding, consistent with the
    // replaced formulation (ANSI element_at past the end errors too):
    // zeroing the keys instead would bucket every degenerate row into
    // one giant key-0 candidate cluster — a quadratic blowup at scale
    require(emb.numElements() >= dim,
      s"embedding has ${emb.numElements()} elements, need $dim")
    val x = new Array[Double](dim)
    var anyNull = false
    var i = 0
    while (i < dim) {
      if (emb.isNullAt(i)) anyNull = true
      else x(i) = emb.getFloat(i).toDouble
      i += 1
    }
    val out = new Array[Any](nBands)
    var b = 0
    while (b < nBands) {
      var key = 0L
      if (!anyNull) {
        var r = 0
        while (r < bitsPerBand) {
          val s = signs(b * bitsPerBand + r)
          var acc = 0.0
          var j = 0
          while (j < dim) { acc += s(j) * x(j); j += 1 }
          if (acc > 0.0) key |= (1L << r)
          r += 1
        }
      }
      out(b) = new GenericInternalRow(Array[Any](b, key))
      b += 1
    }
    new GenericArrayData(out)
  }

  /** PQ encode: per subspace the argmin-code over k centroids
    * (lexicographic (dist, code) tie-break — array_min over structs),
    * plus the reconstruction error = sqrt of the EXACT
    * DECIMAL(28,10)-chained sum of the chosen distances (the oracle's
    * SUM(CAST(dist AS DECIMAL(28,10)))). Distances fold left-to-right
    * in double. `cents(mi)(cid)(i)` are the codebook subvectors as
    * doubles. */
  def pqEncode(emb: ArrayData, cents: Array[Array[Array[Double]]],
      cids: Array[Array[Int]]): InternalRow = {
    val m = cents.length
    val subDim = cents(0)(0).length
    require(emb.numElements() >= m * subDim,
      s"embedding has ${emb.numElements()} elements, need ${m * subDim}")
    var j = 0
    while (j < m * subDim) {
      // fail fast instead of reading garbage through getFloat on a
      // null slot (the replaced formulation's behavior on element
      // nulls was an undefined struct ordering — embeddings carry no
      // element nulls by contract, so loud beats silent-wrong)
      require(!emb.isNullAt(j), s"null embedding element at $j")
      j += 1
    }
    val codes = new Array[Int](m)
    var errScaled = java.math.BigDecimal.ZERO
    var errNaN = false
    var mi = 0
    while (mi < m) {
      val base = mi * subDim
      var bestDist = Double.NaN
      var bestPos = -1
      var pos = 0
      while (pos < cents(mi).length) {
        val c = cents(mi)(pos)
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          val d = emb.getFloat(base + i).toDouble - c(i)
          acc += d * d
          i += 1
        }
        // lexicographic (dist, cid) minimum under Spark's TOTAL
        // ordering (NaN largest, NaN == NaN), matching array_min over
        // struct(dist, k): strictly smaller dist wins; equal dist
        // (incl. all-NaN) keeps the smaller cid — so a non-finite
        // embedding still encodes (first cid) instead of crashing
        if (bestPos < 0 || java.lang.Double.compare(acc, bestDist) < 0) {
          bestDist = acc; bestPos = pos
        }
        pos += 1
      }
      // emit the codebook's ACTUAL cid, not the table position — a
      // hand-built non-dense codebook (cids 0,2,3) must round-trip
      // exactly like the array_min-over-structs reference
      codes(mi) = cids(mi)(bestPos)
      if (java.lang.Double.isFinite(bestDist))
        errScaled = errScaled.add(java.math.BigDecimal.valueOf(bestDist)
          .setScale(10, java.math.RoundingMode.HALF_UP))
      else errNaN = true // NaN/Inf distance -> NaN error, like a double sum
      mi += 1
    }
    val err = if (errNaN) Double.NaN else math.sqrt(errScaled.doubleValue())
    new GenericInternalRow(Array[Any](new GenericArrayData(codes), err))
  }
}

/** `array<float> -> array<struct<band:int,bkey:bigint>>`
  * ([[VectorKernels.srpBandKeys]]). */
case class SrpBandKeysExpr(child: Expression, signs: Array[Array[Byte]],
    nBands: Int, bitsPerBand: Int) extends UnaryExpression {
  require(signs.length == nBands * bitsPerBand, "signs/bands mismatch")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("band", IntegerType, nullable = false),
    StructField("bkey", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "srp_band_keys"
  override def nullSafeEval(x: Any): Any =
    VectorKernels.srpBandKeys(x.asInstanceOf[ArrayData], signs, nBands, bitsPerBand)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("srpSigns", signs, "byte[][]")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.VectorKernels.srpBandKeys($x, $signsRef, $nBands, $bitsPerBand);")
  }
  override protected def withNewChildInternal(c: Expression): SrpBandKeysExpr =
    copy(child = c)
}

/** `array<float> -> struct<codes:array<int>,recon_err:double>`
  * ([[VectorKernels.pqEncode]]). `cids(mi)(pos)` maps each centroid
  * table position back to its codebook code id (ascending), so
  * non-dense hand-built codebooks emit their real ids. */
case class PqEncodeExpr(child: Expression, cents: Array[Array[Array[Double]]],
    cids: Array[Array[Int]]) extends UnaryExpression {
  require(cents.length == cids.length &&
    cents.indices.forall(mi => cents(mi).length == cids(mi).length &&
      cids(mi).sorted.sameElements(cids(mi))),
    "cids must parallel cents, ascending per subspace")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("recon_err", DoubleType, nullable = false)))
  override def prettyName: String = "pq_encode"
  override def nullSafeEval(x: Any): Any =
    VectorKernels.pqEncode(x.asInstanceOf[ArrayData], cents, cids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("pqCents", cents, "double[][][]")
    val cidsRef = ctx.addReferenceObj("pqCids", cids, "int[][]")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.VectorKernels.pqEncode($x, $centsRef, $cidsRef);")
  }
  override protected def withNewChildInternal(c: Expression): PqEncodeExpr =
    copy(child = c)
}
