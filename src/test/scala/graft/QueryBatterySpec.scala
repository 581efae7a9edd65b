package graft

/** Smoke test: every SparkEntry query runs end-to-end on sf0.001 and
  * produces a non-empty schema (value-level correctness is gated by
  * the DuckDB oracle — tools/check_oracle.py / the driver). */
class QueryBatterySpec extends SparkSpec {

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries and oracleSql keys line up") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle without query: ${o -- q}")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes on sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.schema.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
