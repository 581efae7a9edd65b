package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrderLayout

/** Z-order layout: row preservation + the actual data-skipping
  * property (per-file min/max hyper-rectangles shrink on EVERY
  * clustered column, so selective filters on any of them can prune
  * most files from their parquet footers alone). */
class ZOrderSpec extends SparkSpec {

  private lazy val dir = java.nio.file.Files.createTempDirectory("zorder").toString

  private def events = graft.queries.Q.t(spark, "/root/testdata/sf0.01", "events")

  test("z-ordered rewrite preserves rows exactly") {
    val path = s"$dir/ev"
    ZOrderLayout.writeZOrdered(events, path, Seq("user_id", "value"), numFiles = 8)
    val back = spark.read.parquet(path)
    assert(back.count() == events.count())
    val a = events.agg(sum("event_id"), sum(hash(col("event_type"), col("user_id")).cast("long"))).head()
    val b = back.agg(sum("event_id"), sum(hash(col("event_type"), col("user_id")).cast("long"))).head()
    assert(a == b, "row content changed by the layout rewrite")
  }

  test("per-file ranges shrink on BOTH clustered columns (file-level pruning)") {
    val path = s"$dir/ev2"
    val nFiles = 16
    ZOrderLayout.writeZOrdered(events, path, Seq("user_id", "value"), nFiles)
    val back = spark.read.parquet(path)
    val spans = back.groupBy(input_file_name().as("f"))
      .agg(min("user_id").as("u0"), max("user_id").as("u1"),
        min("value").as("v0"), max("value").as("v1"))
      .collect()
    assert(spans.length >= nFiles / 2, s"expected many files, got ${spans.length}")
    val g = events.agg(min("user_id"), max("user_id"), min("value"), max("value")).head()
    val uMin = g.getLong(0); val uMax = g.getLong(1)
    val vMin = g.getDouble(2); val vMax = g.getDouble(3)
    val uSpanFrac = spans.map(r => (r.getAs[Long]("u1") - r.getAs[Long]("u0")).toDouble)
      .sum / spans.length / math.max(uMax - uMin, 1L).toDouble
    val vSpanFrac = spans.map(r => r.getAs[Double]("v1") - r.getAs[Double]("v0"))
      .sum / spans.length / math.max(vMax - vMin, 1e-9)
    // a single-column sort would give ~1/16 on one axis and ~1 on the
    // other; the z-order layout must shrink BOTH axes substantially
    assert(uSpanFrac < 0.6, s"user_id avg span fraction $uSpanFrac")
    assert(vSpanFrac < 0.6, s"value avg span fraction $vSpanFrac")
    // pruning capability: a 10%-range filter on EITHER column
    // intersects well under half the file hyper-rectangles
    val uLo = uMin + (uMax - uMin) / 2; val uHi = uMin + (uMax - uMin) * 6 / 10
    val uHit = spans.count(r => r.getAs[Long]("u1") >= uLo && r.getAs[Long]("u0") <= uHi)
    val vLo = vMin + (vMax - vMin) * 0.5; val vHi = vMin + (vMax - vMin) * 0.6
    val vHit = spans.count(r => r.getAs[Double]("v1") >= vLo && r.getAs[Double]("v0") <= vHi)
    assert(uHit <= spans.length / 2, s"user_id range hits $uHit/${spans.length} files")
    assert(vHit <= spans.length / 2, s"value range hits $vHit/${spans.length} files")
  }

  test("single-column z-order degenerates to a plain range layout") {
    val path = s"$dir/ev1"
    ZOrderLayout.writeZOrdered(events, path, Seq("user_id"), numFiles = 8)
    val back = spark.read.parquet(path)
    val spans = back.groupBy(input_file_name())
      .agg(min("user_id").as("u0"), max("user_id").as("u1")).collect()
      .map(r => (r.getAs[Long]("u0"), r.getAs[Long]("u1"))).sortBy(_._1)
    // files must tile the key space nearly disjointly
    spans.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(lo2 >= hi - 1, s"overlap: $hi vs $lo2")
      case _ => ()
    }
  }
}
