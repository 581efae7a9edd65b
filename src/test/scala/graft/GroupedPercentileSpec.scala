package graft

import org.apache.spark.sql.functions._
import graft.operators.GroupedPercentile
import graft.operators.GroupedPercentile.Spec

/** Distributed exact percentile ([[GroupedPercentile]]) vs Spark's
  * builtin buffering `percentile` — the selection-over-buckets path
  * must be bit-identical (same values selected, same interpolation
  * formula). */
class GroupedPercentileSpec extends SparkSpec {
  import spark.implicits._

  private def builtin(df: org.apache.spark.sql.DataFrame, group: Seq[String],
                      specs: Seq[Spec]): Map[Seq[Any], Seq[Any]] = {
    val aggs = specs.map(s => expr(s"percentile(${s.expr}, ${s.q})").as(s.name))
    val out = if (group.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(group.map(col): _*).agg(aggs.head, aggs.tail: _*)
    out.collect().map { r =>
      group.indices.map(r.get).toSeq -> specs.indices.map(i => r.get(group.size + i)).toSeq
    }.toMap
  }

  private def ours(df: org.apache.spark.sql.DataFrame, group: Seq[String],
                   specs: Seq[Spec], buckets: Int = 0): Map[Seq[Any], Seq[Any]] =
    GroupedPercentile.exact(df, group, specs, buckets).collect().map { r =>
      group.indices.map(r.get).toSeq -> specs.indices.map(i => r.get(group.size + i)).toSeq
    }.toMap

  private def assertSame(a: Map[Seq[Any], Seq[Any]], b: Map[Seq[Any], Seq[Any]]): Unit = {
    assert(a.keySet == b.keySet, s"group sets differ: ${a.keySet} vs ${b.keySet}")
    a.foreach { case (k, va) =>
      val vb = b(k)
      va.zip(vb).zipWithIndex.foreach { case ((x, y), i) =>
        (x, y) match {
          case (null, null) => ()
          case (dx: java.lang.Double, dy: java.lang.Double) =>
            assert(java.lang.Double.compare(dx, dy) == 0 ||
              math.abs(dx - dy) < 1e-12,
              s"group $k stat $i: $dx vs $dy")
          case _ => fail(s"group $k stat $i: $x vs $y")
        }
      }
    }
  }

  test("grouped percentiles match builtin bit-for-bit on random data with nulls") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 5000).map { i =>
      (s"g${i % 5}",
        if (rnd.nextInt(20) == 0) None else Some(rnd.nextDouble() * 100),
        if (rnd.nextInt(10) == 0) None else Some(math.pow(rnd.nextDouble(), 4) * 1e6))
    }
    val df = rows.toDF("g", "a", "b")
    val specs = Seq(Spec("a", 0.5, "a50"), Spec("a", 0.25, "a25"),
      Spec("b", 0.9, "b90"), Spec("b", 0.0, "b0"), Spec("b", 1.0, "b100"))
    assertSame(ours(df, Seq("g"), specs), builtin(df, Seq("g"), specs))
  }

  test("global (no group), expression values, few buckets") {
    val df = (1 to 1000).map(i => i.toDouble).toDF("x")
    val specs = Seq(Spec("x * 2 + 1", 0.37, "p37"), Spec("x * 2 + 1", 0.5, "med"))
    assertSame(ours(df, Nil, specs, buckets = 4), builtin(df, Nil, specs))
  }

  test("edge groups: single row, all-null, ties, null group key, NaN ordering") {
    val df = Seq(
      ("solo", Some(3.0)),
      ("nulls", None), ("nulls", None),
      ("ties", Some(7.0)), ("ties", Some(7.0)), ("ties", Some(7.0)),
      (null, Some(1.0)), (null, Some(2.0)),
      ("nan", Some(1.0)), ("nan", Some(Double.NaN)), ("nan", Some(2.0))
    ).toDF("g", "v")
    val specs = Seq(Spec("v", 0.5, "med"), Spec("v", 0.9, "p90"))
    assertSame(ours(df, Seq("g"), specs), builtin(df, Seq("g"), specs))
  }

  test("empty frame: global yields one all-null row, grouped yields none") {
    val df = Seq.empty[(String, Double)].toDF("g", "v")
    val specs = Seq(Spec("v", 0.5, "med"))
    assert(ours(df, Nil, specs) == Map(Seq.empty -> Seq(null)))
    assert(GroupedPercentile.exact(df, Seq("g"), specs).count() == 0)
  }

  test("two-row interpolation is exact") {
    val df = Seq(("a", 10.0), ("a", 20.0)).toDF("g", "v")
    val r = GroupedPercentile.exact(df, Seq("g"), Seq(Spec("v", 0.25, "p")))
      .head().getDouble(1)
    assert(r == 12.5)
  }

  test("quantile bounds and duplicate names rejected") {
    val df = Seq(("a", 1.0)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      GroupedPercentile.exact(df, Seq("g"), Seq(Spec("v", 1.5, "p")))
    }
    intercept[IllegalArgumentException] {
      GroupedPercentile.exact(df, Seq("g"),
        Seq(Spec("v", 0.5, "p"), Spec("v", 0.6, "p")))
    }
  }
}
