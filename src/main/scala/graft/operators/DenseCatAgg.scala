package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dense ordinal-key aggregation — the reference's `categorize` fast
  * path (reference README.md:60: ">1e9 rows/s groupby" is measured
  * over categorize'd integer codes; execution in src/agg_sum.cpp /
  * src/agg_count.cpp: each thread owns a flat array indexed by code,
  * updates in place, arrays merge elementwise).
  *
  * Spark-first shape: the upstream projection (code cast + value
  * casts) stays inside whole-stage codegen; the kernel is a
  * mapPartitions over the child's codegen'd InternalRow iterator that
  * touches four primitive arrays per value column — no per-row hash
  * probe, no UnsafeRow re-materialization, no ObjectHashAggregate
  * virtual dispatch. Measured at 1e8 generated rows, local[32]: ~2x
  * Spark's codegen'd HashAggregate on a 10-code tinyint key (715M vs
  * 362M rows/s), saturating the generation pipeline itself.
  *
  * Why not a TypedImperativeAggregate: measured 2x SLOWER than
  * HashAggregate (see GridAggregates scaladoc) — the agg sits behind
  * the codegen boundary. Why not a custom SparkPlan: the kernel IS
  * per-partition imperative logic over an already-codegen'd child;
  * mapPartitions over toRdd is the same execution with less
  * machinery.
  *
  * Scale shape: each task emits exactly `domain` cells x 4 arrays per
  * value column regardless of row count or skew — a hot code costs
  * nothing extra (no skewed shuffle partition exists at all). Merge is
  * `treeReduce` (depth 2 beyond 64 partitions), so 1000 executors
  * send bounded partials up a tree, not all to the driver at once.
  * The domain cap keeps task memory and merge fan-in bounded; huge or
  * unknown key domains belong on the hash-groupBy path.
  *
  * Determinism: double sums are exact (hence bit-deterministic) when
  * the inputs are integral-valued with magnitude < 2^53 — the oracle
  * lane uses such values. For general doubles the merge order
  * reassociates floating addition, the same caveat as any parallel
  * sum (including Spark's own). min/max follow Spark's NaN-is-largest
  * total ordering (Double.compare): max of a cell containing NaN is
  * NaN, min of an all-NaN cell is NaN — hash-path parity, spec'd.
  * Signed-zero caveat: for a cell holding both -0.0 and 0.0 this
  * kernel deterministically returns -0.0 as min / 0.0 as max
  * (Double.compare orders them), while Spark's hash Min/Max treats
  * them as EQUAL and keeps whichever it encountered first — an
  * encounter-order-nondeterministic result no kernel can bit-match;
  * the sign is observable only through 1/x-style probes.
  */
object DenseCatAgg {

  /** Per-task partial: flat arrays indexed [j * domain + k] — a
    * single bounds check per update and no nested-array indirection
    * in the per-row hot loop (measured: the nested form cost ~3x). */
  private case class Buf(rowCnt: Array[Long], sums: Array[Double],
      cnts: Array[Long], mins: Array[Double],
      maxs: Array[Double]) extends Serializable {
    def merge(o: Buf): Buf = {
      var k = 0
      while (k < rowCnt.length) { rowCnt(k) += o.rowCnt(k); k += 1 }
      val mm = mins != null // null when no min/max agg was requested
      var i = 0
      while (i < sums.length) {
        sums(i) += o.sums(i); cnts(i) += o.cnts(i)
        if (!mm) { i += 1 }
        else {
        // Double.compare = Spark's NaN-is-largest total ordering. The
        // init sentinels make every case fall out of one comparison:
        // min slots start at NaN (the ordering's TOP — any real value
        // replaces it, and an all-NaN cell correctly stays NaN); max
        // slots start at -Inf (the BOTTOM — any value incl. NaN
        // replaces it, and once NaN wins nothing displaces it).
        if (java.lang.Double.compare(o.mins(i), mins(i)) < 0) mins(i) = o.mins(i)
        if (java.lang.Double.compare(o.maxs(i), maxs(i)) > 0) maxs(i) = o.maxs(i)
        i += 1
        }
      }
      this
    }
  }

  /** One requested aggregate: `op` in sum|count|mean|min|max (count =
    * non-null count of `col`; use `countAs` for the row count). */
  case class Agg(col: Column, op: String, as: String)

  val MaxDomain: Int = 1 << 20

  /** Driver-side invocation counter — a test probe so specs can assert
    * the dense kernel (not the hash path) actually ran a given call.
    * Incremented once per groupByOrdinal call, on the driver. */
  val invocations = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Counts calls that fell back to the interpreted (non-fused)
    * accumulate — spec probe for the r15 codegen fusion. */
  val classicPath = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Dense groupBy over an ordinal code column with domain [0, n).
    * Rows with a null or out-of-domain code are dropped (binby
    * `edges=False` semantics — same as the reference, where a
    * categorize'd column's missing values carry code -1). Codes with
    * no surviving rows emit no row (hash-groupBy parity). */
  def groupByOrdinal(df: DataFrame, code: Column, domain: Int,
      aggs: Seq[Agg], countAs: Option[String] = None,
      codeAs: String = "code"): DataFrame = {
    require(domain > 0 && domain <= MaxDomain,
      s"domain must be in [1, $MaxDomain], got $domain")
    val bad = aggs.map(_.op).filterNot(Set("sum", "count", "mean", "min", "max"))
    require(bad.isEmpty, s"unsupported ops: ${bad.distinct.mkString(",")}")
    invocations.incrementAndGet()
    val spark = df.sparkSession
    val nv = aggs.length

    // integrality + range safety: a bare cast("int") WRAPS longs
    // (2^32+3 -> 3) under non-ANSI and THROWS under ANSI, and either
    // way truncates fractional doubles (3.7 -> 3), silently aliasing
    // out-of-domain keys into valid buckets. Integral inputs (the
    // canonical categorize shape — tinyint codes) widen to bigint
    // EXACTLY, so they take the plain cast and the per-row [0,
    // domain) guard; only fractional/other inputs pay the try_cast +
    // double-image integrality check (keeps the hot lane's scan
    // projection a single widening cast).
    val codeType = df.select(code).schema.head.dataType
    val safeCode = codeType match {
      case ByteType | ShortType | IntegerType | LongType => code.cast("bigint")
      case _ =>
        val cl = code.try_cast("bigint")
        when(cl.cast("double") === code.try_cast("double"), cl)
    }
    val projected = df.select(
      safeCode.as("__code") +:
        aggs.zipWithIndex.map {
          case (a, j) => a.col.cast("double").as(s"__v$j")
        }: _*)
    val rdd = projected.queryExecution.toRdd
    val schema = StructType(
      StructField(codeAs, IntegerType, nullable = false) +:
        (aggs.map(a => StructField(a.as,
          if (a.op == "count") LongType else DoubleType,
          nullable = a.op != "count")) ++
          countAs.map(n => StructField(n, LongType, nullable = false))))

    if (rdd.getNumPartitions == 0)
      return spark.createDataFrame(new java.util.ArrayList[Row](), schema)

    // Accumulation path selection: the r15 FUSED whole-stage-codegen
    // operator (DenseAggFused — the per-row loop runs inside the
    // child pipeline's generated code, no UnsafeRow boundary) when
    // the plan shape allows and spark.graft.denseAgg.fuse != false;
    // otherwise the classic interpreted mapPartitions loop over the
    // codegen'd iterator. Both emit identical per-task buffer rows.
    val useFuse = spark.conf.get("spark.graft.denseAgg.fuse", "true").toBoolean
    val needMM = aggs.exists(a => a.op == "min" || a.op == "max")
    val bufRows: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow] =
      (if (useFuse) DenseAggFused.tryFused(projected, domain, nv, needMM)
       else None).getOrElse {
        classicPath.incrementAndGet()
        rdd.mapPartitions(it => Iterator.single(
          DenseAggFusedExec.accumulateRow(it, domain, nv, needMM)))
      }
    val partials = bufRows.mapPartitions(_.map { r =>
      val g = r.asInstanceOf[
        org.apache.spark.sql.catalyst.expressions.GenericInternalRow]
      Buf(g.values(0).asInstanceOf[Array[Long]],
        g.values(1).asInstanceOf[Array[Double]],
        g.values(2).asInstanceOf[Array[Long]],
        g.values(3).asInstanceOf[Array[Double]],
        g.values(4).asInstanceOf[Array[Double]])
    })
    val merged =
      if (rdd.getNumPartitions > 64) partials.treeReduce(_ merge _, depth = 2)
      else partials.reduce(_ merge _)

    val out = new java.util.ArrayList[Row](domain)
    var k = 0
    while (k < domain) {
      if (merged.rowCnt(k) > 0L) {
        val fields = new Array[Any](1 + nv + (if (countAs.isDefined) 1 else 0))
        fields(0) = k
        var j = 0
        while (j < nv) {
          val i = j * domain + k
          val c = merged.cnts(i)
          fields(1 + j) = aggs(j).op match {
            case "count" => c
            case "sum"   => if (c > 0L) merged.sums(i) else null
            case "mean"  => if (c > 0L) merged.sums(i) / c else null
            case "min"   => if (c > 0L) merged.mins(i) else null
            case "max"   => if (c > 0L) merged.maxs(i) else null
          }
          j += 1
        }
        if (countAs.isDefined) fields(1 + nv) = merged.rowCnt(k)
        out.add(Row.fromSeq(fields.toIndexedSeq))
      }
      k += 1
    }
    spark.createDataFrame(out, schema)
  }

  /** Dense groupBy over an ARBITRARY integral key with a small
    * OBSERVED domain (not pre-categorized): one bounded distinct pass
    * builds a sorted key -> dense-ordinal dictionary (<= `maxKeys`
    * longs on the driver — the DenseLookupJoin gate discipline), the
    * scan probes it through ONE codegen'd open-addressed lookup
    * ([[LongDictOrdinal]] — no boxing, no UnsafeRow hash map), and
    * the accumulate runs the same fused dense kernel as
    * [[groupByOrdinal]]. Null keys form their own group (SQL
    * groupBy parity). Ordinals map back to original key values on
    * the (cardinality-sized) RESULT only.
    *
    * The 100 TB shape: the distinct pass is a shuffle bounded by the
    * observed cardinality; the main pass stays scan -> dense partial
    * arrays -> treeReduce, no wide shuffle, no skew sensitivity.
    * Unknown/huge domains reject loudly at the gate — they belong on
    * the hash path. */
  def groupByKeys(df: DataFrame, key: Column, aggs: Seq[Agg],
      countAs: Option[String] = None, keyAs: String = "key",
      maxKeys: Int = 1 << 16): DataFrame = {
    require(maxKeys >= 1 && maxKeys <= MaxDomain,
      s"maxKeys must be in [1, $MaxDomain], got $maxKeys")
    val keyType = df.select(key).schema.head.dataType
    val isString = keyType == StringType
    require(isString ||
      Seq(ByteType, ShortType, IntegerType, LongType).contains(keyType),
      s"groupByKeys: integral or string keys only, got " +
        s"${keyType.catalogString} (fractional: use the hash path)")
    val kl = if (isString) key else key.cast("bigint")
    // bounded distinct: limit(maxKeys+1) caps the collect whatever the
    // true cardinality — pigeonhole proves the violation
    val distinctRows = df.select(kl.as("__k")).distinct()
      .limit(maxKeys + 1).collect()
    require(distinctRows.length <= maxKeys,
      s"groupByKeys: observed key cardinality exceeds maxKeys=$maxKeys; " +
        "use the hash groupBy for huge domains")
    val hasNull = distinctRows.exists(_.isNullAt(0))
    val schemaOut = StructType(
      StructField(keyAs, keyType, nullable = hasNull) +:
        (aggs.map(a => StructField(a.as,
          if (a.op == "count") LongType else DoubleType,
          nullable = a.op != "count")) ++
          countAs.map(n => StructField(n, LongType, nullable = false))))
    if (distinctRows.isEmpty)
      return df.sparkSession.createDataFrame(
        new java.util.ArrayList[Row](), schemaOut)
    import org.apache.spark.sql.graftbridge.Bridge
    val (ord, nKeys, keyOf: (Column => Column)) =
      if (isString) {
        val ks = distinctRows.filterNot(_.isNullAt(0)).map(_.getString(0))
          .sortBy(s => org.apache.spark.unsafe.types.UTF8String
            .fromString(s))(
            Ordering.comparatorToOrdering(java.util.Comparator
              .naturalOrder[org.apache.spark.unsafe.types.UTF8String]()))
        // strings are unbounded per key — gate the DICTIONARY bytes
        // like DenseLookupJoin gates string dims (the collect itself
        // was already row-capped)
        val bytes = ks.map(_.getBytes(
          java.nio.charset.StandardCharsets.UTF_8).length.toLong).sum
        require(bytes <= (64L << 20),
          s"groupByKeys: string dictionary is $bytes bytes (> 64 MiB); " +
            "use the hash groupBy")
        val dict = Utf8Dict.build(ks.map(
          org.apache.spark.unsafe.types.UTF8String.fromString),
          if (hasNull) ks.length else -1)
        (Bridge.column(Utf8DictOrdinal(Bridge.expression(kl), dict)),
          ks.length, (o: Column) => element_at(lit(ks), o + 1))
      } else {
        val ks = distinctRows.filterNot(_.isNullAt(0)).map(_.getLong(0)).sorted
        val dict = LongDict.build(ks, if (hasNull) ks.length else -1)
        (Bridge.column(LongDictOrdinal(Bridge.expression(kl), dict)),
          ks.length, (o: Column) => element_at(lit(ks), o + 1))
      }
    val cardinality = nKeys + (if (hasNull) 1 else 0)
    val out = groupByOrdinal(df, ord, cardinality, aggs, countAs,
      codeAs = "__ord")
    val keyCol0 = keyOf(col("__ord"))
    val keyCol =
      (if (hasNull) when(col("__ord") === nKeys, lit(null))
        .otherwise(keyCol0)
       else keyCol0).cast(keyType).as(keyAs)
    out.select(keyCol +:
      out.columns.filterNot(_ == "__ord").toIndexedSeq.map(col): _*)
  }
}
