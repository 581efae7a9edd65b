package graft

import java.sql.Timestamp
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("asofBackward attaches latest strictly-earlier right row per key") {
    val left = Seq((1L, ts(10), "p1"), (1L, ts(20), "p2"), (2L, ts(5), "p3"))
      .toDF("uid", "lts", "tag")
    val right = Seq((1L, ts(8), 100.0), (1L, ts(15), 200.0), (2L, ts(5), 300.0))
      .toDF("uid", "rts", "v")
    val got = AsOfJoin.asofBackward(left, right, Seq("uid"), "lts", "rts", Seq("v"))
      .collect().map(r => (r.getAs[String]("tag"), Option(r.getAs[java.lang.Double]("asof_v")))).toMap
    assert(got("p1").contains(100.0))   // only ts(8) earlier
    assert(got("p2").contains(200.0))   // latest earlier is ts(15)
    assert(got("p3").isEmpty)           // equal ts excluded (strict <)
  }

  test("asofBackward carries multiple payload columns") {
    val left = Seq((1L, ts(10))).toDF("uid", "lts")
    val right = Seq((1L, ts(3), 1.0, "a"), (1L, ts(7), 2.0, "b")).toDF("uid", "rts", "v", "s")
    val r = AsOfJoin.asofBackward(left, right, Seq("uid"), "lts", "rts", Seq("v", "s")).head()
    assert(r.getAs[Double]("asof_v") == 2.0 && r.getAs[String]("asof_s") == "b")
  }
}
