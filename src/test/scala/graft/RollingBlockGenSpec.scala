package graft

import org.apache.spark.sql.functions._
import graft.operators.OrderedOps
import graft.operators.OrderedOps.RollSpec

/** Focused spec for the r19 block-array generator kernels
  * ([[graft.functions.RollingBlockAgg]] /
  * [[graft.functions.RollingBlockQuantile]], `graft.rollBlockGen`):
  * the generator path must be BIT-IDENTICAL to the r18 window+carry
  * join form it replaces (which is itself pinned to global windows by
  * OrderedOpsSpec and to the DuckDB oracle by the battery), across
  * hostile inputs — nulls, NaN, decimals, ints — and hostile layouts:
  * short last block, exact-multiple last block, window == blockSize,
  * window == 1, single block. Validation must keep the dense-index
  * contract, including the duplicate-with-aligned-max class the join
  * form could not see (ADVICE r18 #1). */
class RollingBlockGenSpec extends SparkSpec {

  /** Build plans under a toggle value — plans bake the path in at
    * construction time, so collect() may run after restore. */
  private def withProp[A](prop: String, v: String)(f: => A): A = {
    val old = System.getProperty(prop)
    System.setProperty(prop, v)
    try f
    finally if (old == null) System.clearProperty(prop)
            else System.setProperty(prop, old)
  }

  /** 100 rows, 7 input splits: double with nulls, double with NaN and
    * nulls, decimal(12,2) with nulls, int with nulls. */
  private lazy val hostile = spark.range(100).repartition(7)
    .select(col("id").as("row_index"),
      when(col("id") % 5 === 0, lit(null))
        .otherwise((col("id") * 3 % 17).cast("double")).as("d"),
      when(col("id") % 11 === 3, lit(Double.NaN))
        .when(col("id") % 7 === 2, lit(null))
        .otherwise((col("id") * 13 % 23).cast("double") - 11.0).as("dn"),
      when(col("id") % 4 === 1, lit(null))
        .otherwise(((col("id") * 7 % 19).cast("decimal(10,2)") * lit(0.25))
          .cast("decimal(12,2)")).as("dec"),
      when(col("id") % 6 === 5, lit(null))
        .otherwise((col("id") % 13).cast("int")).as("iv"))
    .cache()

  /** NaN-safe value normalization: Scala == on boxed doubles treats
    * NaN != NaN; compare floating values by their bits instead. */
  private def norm(v: Any): Any = v match {
    case d: java.lang.Double => java.lang.Double.doubleToLongBits(d)
    case f: java.lang.Float => java.lang.Float.floatToIntBits(f)
    case x => x
  }

  private def byIndex(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Option[Any]]] =
    df.collect().map { r =>
      r.getLong(r.fieldIndex("row_index")) ->
        r.schema.fieldNames.toSeq.filter(_ != "row_index").sorted
          .map(n => Option(r.get(r.fieldIndex(n))).map(norm))
    }.toMap

  // (window, blockSize): short last block, exact-multiple last block,
  // window == blockSize, window == 1, single block
  private val layouts = Seq((3, 7L), (1, 7L), (4, 10L), (5, 5L), (4, 25L), (7, 100L))

  test("rollingAggMulti generator == window+carry join form (bit-exact)") {
    val specs = Seq(
      RollSpec("d", "sum", "sd"), RollSpec("dn", "sum", "sn"),
      RollSpec("dec", "sum", "sdec"), RollSpec("iv", "sum", "si"),
      RollSpec("d", "count", "cd"), RollSpec("dn", "min", "mn"),
      RollSpec("dn", "max", "mx"), RollSpec("dec", "max", "mdec"),
      RollSpec("iv", "min", "mi"))
    for ((w, bs) <- layouts) {
      val on = withProp("graft.rollBlockGen", "1")(
        OrderedOps.rollingAggMulti(hostile, specs, w, blockSize = bs))
      val off = withProp("graft.rollBlockGen", "0")(
        OrderedOps.rollingAggMulti(hostile, specs, w, blockSize = bs))
      assert(on.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
        off.schema.fields.map(f => (f.name, f.dataType)).toSeq, s"w=$w bs=$bs")
      assert(byIndex(on) === byIndex(off), s"w=$w bs=$bs")
    }
  }

  test("rollingMedian/rollingQuantile generator == rollingArray+kernel form (bit-exact)") {
    for ((w, bs) <- layouts.filter(_._1 > 1)) {
      val mOn = withProp("graft.rollBlockGen", "1")(
        OrderedOps.rollingMedian(hostile, "dn", w, "med", blockSize = bs))
      val mOff = withProp("graft.rollBlockGen", "0")(
        OrderedOps.rollingMedian(hostile, "dn", w, "med", blockSize = bs))
      assert(byIndex(mOn) === byIndex(mOff), s"median w=$w bs=$bs")
      for (q <- Seq(0.0, 0.25, 0.9, 1.0)) {
        val qOn = withProp("graft.rollBlockGen", "1")(
          OrderedOps.rollingQuantile(hostile, "dn", w, q, "rq", blockSize = bs))
        val qOff = withProp("graft.rollBlockGen", "0")(
          OrderedOps.rollingQuantile(hostile, "dn", w, q, "rq", blockSize = bs))
        assert(byIndex(qOn) === byIndex(qOff), s"q=$q w=$w bs=$bs")
      }
    }
  }

  test("map-typed payload columns ride the generator path untouched") {
    // the generator's own index sort has no orderability requirement
    // on payload fields (unlike e.g. a sort_array formulation — the
    // r19 carry-derive negative); a map column must pass through
    val withMap = hostile.withColumn("mcol", map(lit("k"), col("d")))
    val viaMap = OrderedOps.rollingAggMulti(withMap,
      Seq(RollSpec("d", "sum", "sd")), 3, blockSize = 7L)
    val plain = OrderedOps.rollingAggMulti(hostile,
      Seq(RollSpec("d", "sum", "sd")), 3, blockSize = 7L)
    val a = viaMap.select("row_index", "sd").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(norm)).toMap
    val b = plain.select("row_index", "sd").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(norm)).toMap
    assert(a === b)
  }

  test("generator falls back to the join form on output-name collision") {
    // withColumn-replace semantics: the join form REPLACES an existing
    // column of the same name; the generator path declines and the
    // operator must still produce the replace behavior via fallback.
    val out = OrderedOps.rollingAggMulti(hostile, Seq(RollSpec("d", "sum", "dn")),
      3, blockSize = 7L)
    assert(out.columns.count(_ == "dn") === 1)
    val both = withProp("graft.rollBlockGen", "0")(
      OrderedOps.rollingAggMulti(hostile, Seq(RollSpec("d", "sum", "dn")),
        3, blockSize = 7L))
    assert(byIndex(out) === byIndex(both))
  }

  test("decimal sum overflow: throws under ANSI, null with ANSI off — both forms") {
    val big = new java.math.BigDecimal("9" * 38)
    def frame = spark.range(10).select(col("id").as("row_index"),
      when(col("id") < 2, lit(big)).otherwise(lit(1).cast("decimal(38,0)")).as("v"))
    def run(gen: String): Map[Long, Option[Any]] = withProp("graft.rollBlockGen", gen)(
      OrderedOps.rollingAggMulti(frame, Seq(RollSpec("v", "sum", "sv")), 2,
        blockSize = 7L))
      .collect().map(r => r.getLong(0) -> Option(r.get(r.fieldIndex("sv")))).toMap
    // ANSI on (this engine's default): 2 x 1e38-ish overflows -> error
    for (v <- Seq("1", "0")) {
      val e = intercept[Exception](run(v))
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
      assert(msgs(e).exists(m => m != null &&
        (m.contains("Decimal(38, 0)") || m.contains("overflow"))), s"gen=$v: $e")
    }
    // ANSI off: overflow -> null, identically in both forms
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      for (v <- Seq("1", "0")) {
        val m = run(v)
        assert(m(1L).isEmpty, s"rollBlockGen=$v: overflow must be null with ansi off")
        assert(m(0L).contains(new java.math.BigDecimal(big.toString)), s"rollBlockGen=$v")
        assert(m(3L).contains(java.math.BigDecimal.valueOf(2).setScale(0)), s"rollBlockGen=$v")
      }
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
  }

  test("generator path: sparse, gapped and duplicated indexes fail loudly") {
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    def dies(f: => Unit): Unit = {
      val e = intercept[Exception](f)
      assert(msgs(e).exists(m => m != null && m.contains("dense")), e.getMessage)
    }
    // filtered frame keeps its original (sparse) index
    val sparse = spark.range(100).where(col("id") % 7 =!= 3)
      .select(col("id").as("row_index"), col("id").cast("double").as("x"))
    dies(OrderedOps.rollingSum(sparse, "x", 3, "rs", blockSize = 10L).collect())
    dies(OrderedOps.rollingMedian(sparse, "x", 3, "rm", blockSize = 10L).collect())
    // tail-aligned gap: whole tail of block 1 missing, block 2 present
    val tailGap = spark.range(30).where(col("id") < 17 || col("id") >= 20)
      .select(col("id").as("row_index"), col("id").cast("double").as("x"))
    dies(OrderedOps.rollingSum(tailGap, "x", 3, "rs", blockSize = 10L).collect())
    // duplicate index arranged so the block max STILL aligns (the
    // ADVICE r18 #1 residual class): id 17 replaced by a second 18 —
    // caught by the generator's per-row contiguity check
    val dup = spark.range(30)
      .select(when(col("id") === 17, lit(18L)).otherwise(col("id")).as("row_index"),
        col("id").cast("double").as("x"))
    dies(OrderedOps.rollingSum(dup, "x", 3, "rs", blockSize = 10L).collect())
    dies(OrderedOps.rollingQuantile(dup, "x", 3, 0.5, "rq", blockSize = 10L).collect())
  }
}
