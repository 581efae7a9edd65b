package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import graft.functions.WindowQuantileItems

/** Pins [[graft.functions.RollingKernels]] bit-identical to the Column
  * (higher-order-function) formulation it replaced in
  * OrderedOps.rollingMedian / rollingQuantile — the house kernel
  * discipline: the OLD formulation is kept verbatim below as the
  * reference, so oracle parity carries over to the kernel path. */
class RollingKernelsSpec extends SparkSpec {

  /** Hostile window corpus: lengths 0..6, null values, NaN, negatives,
    * duplicate values — as array<struct<i: long, v: double>>. */
  private def windows = spark.range(600).select(col("id"),
    transform(sequence(lit(1), pmod(col("id"), lit(7)).cast("int")),
      j => struct((col("id") * 10 + j).cast("long").as("i"),
        when(pmod(col("id") + j, lit(5)) === 0, lit(null).cast("double"))
          .when(pmod(col("id") + j, lit(11)) === 0, lit(Double.NaN))
          .otherwise(pmod(col("id") * 31 + j * 17, lit(100)).cast("double") - lit(50.0))
          .as("v"))).as("win"))

  /** The replaced HOF formulation, verbatim modulo operating on the
    * struct array directly (the finished array's pad slots were null
    * and filtered out, so extracting v first is the same multiset). */
  private def hofVals = array_sort(filter(
    transform(col("win"), e => e.getField("v")), v => v.isNotNull))

  test("kernel median == HOF median formulation (bit-exact)") {
    val vals = hofVals
    val n = size(vals)
    val half = (n.cast("double") / 2.0).cast("int")
    val med = when(n === 0, lit(null).cast("double"))
      .when(n % 2 === 1, element_at(vals, half + 1))
      .otherwise((element_at(vals, half) + element_at(vals, half + 1)) / 2.0)
    val rows = windows.select(col("id"), med.as("old"),
      Bridge.column(WindowQuantileItems(
        Bridge.expression(col("win")), 0.5, midpoint = true)).as("neu"))
      .collect()
    assert(rows.length == 600)
    rows.foreach { r =>
      val o = if (r.isNullAt(1)) None else Some(r.getDouble(1))
      val k = if (r.isNullAt(2)) None else Some(r.getDouble(2))
      assert(o.map(java.lang.Double.doubleToRawLongBits(_)) ==
        k.map(java.lang.Double.doubleToRawLongBits(_)),
        s"id=${r.getLong(0)}: old=$o kernel=$k")
    }
  }

  test("kernel linear quantile == HOF quantile formulation at q=0, 0.25, 0.5, 0.9, 1") {
    for (q <- Seq(0.0, 0.25, 0.5, 0.9, 1.0)) {
      val vals = hofVals
      val n = size(vals)
      val pos = lit(q) * (n - 1).cast("double")
      val lo = floor(pos).cast("int")
      val frac = pos - lo.cast("double")
      val lov = element_at(vals, lo + 1)
      val hiv = element_at(vals, least(lo + 2, n))
      val out = when(n === 0, lit(null).cast("double"))
        .otherwise(lov + (hiv - lov) * frac)
      val rows = windows.select(col("id"), out.as("old"),
        Bridge.column(WindowQuantileItems(
          Bridge.expression(col("win")), q, midpoint = false)).as("neu"))
        .collect()
      rows.foreach { r =>
        val o = if (r.isNullAt(1)) None else Some(r.getDouble(1))
        val k = if (r.isNullAt(2)) None else Some(r.getDouble(2))
        assert(o.map(java.lang.Double.doubleToRawLongBits(_)) ==
          k.map(java.lang.Double.doubleToRawLongBits(_)),
          s"q=$q id=${r.getLong(0)}: old=$o kernel=$k")
      }
    }
  }

  test("kernel handles empty and all-null windows as null") {
    val df = spark.range(1).select(
      array().cast("array<struct<i: bigint, v: double>>").as("win"))
    val r = df.select(Bridge.column(WindowQuantileItems(
      Bridge.expression(col("win")), 0.5, midpoint = true))).collect()
    assert(r.head.isNullAt(0))
    val allNull = spark.range(1).select(
      array(struct(lit(1L).as("i"), lit(null).cast("double").as("v")),
        struct(lit(2L).as("i"), lit(null).cast("double").as("v"))).as("win"))
    val r2 = allNull.select(Bridge.column(WindowQuantileItems(
      Bridge.expression(col("win")), 0.25, midpoint = false))).collect()
    assert(r2.head.isNullAt(0))
  }
}
