package graft

import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions

/** HEALPix ring-scheme ang2pix (Column math) + healpix_count grid. */
class HealpixSpec extends SparkSpec {
  import spark.implicits._

  private def pix(nside: Int, lonDeg: Double, latDeg: Double): Long =
    spark.range(1).select(
      GeoFunctions.healpixAng2pixRing(nside, lit(lonDeg), lit(latDeg))).head.getLong(0)

  test("nside=1: poles, equator and ring structure") {
    // north polar cap = pixels 0..3, equatorial belt = 4..7, south = 8..11
    assert(pix(1, 0, 89.9999) == 0)
    assert((0L to 3L).contains(pix(1, 200, 89.9999)))
    assert(pix(1, 0, 0) == 4)
    assert((4L to 7L).contains(pix(1, 180, 0)))
    assert(pix(1, 0, -89.9999) == 8)
    assert((8L to 11L).contains(pix(1, 300, -89.9999)))
  }

  test("all pixels hit and in range on an angle grid") {
    for (nside <- Seq(1, 2, 4)) {
      val npix = 12L * nside * nside
      val grid = spark.range(40000).select(
        ((col("id") % 200).cast("double") * 1.79 + 0.3).as("lon"),
        ((floor(col("id") / 200).cast("double") * 0.89) - 89.0).as("lat"))
      val pixes = grid.select(
        GeoFunctions.healpixAng2pixRing(nside, col("lon"), col("lat")).as("p"))
      val mm = pixes.agg(min("p"), max("p"), count_distinct(col("p"))).head()
      assert(mm.getLong(0) >= 0L && mm.getLong(1) < npix, s"nside=$nside out of range")
      assert(mm.getLong(2) == npix, s"nside=$nside: ${mm.getLong(2)} of $npix pixels hit")
    }
  }

  test("pixel areas are approximately equal (uniform sphere sample)") {
    // uniform on the sphere: lon ~ U(0,360), lat = asin(2u-1)
    val n = 120000L
    val pts = spark.range(n).select(
      (rand(1) * 360.0).as("lon"),
      (asin(rand(2) * 2.0 - 1.0) * 180.0 / math.Pi).as("lat"))
    val counts = pts.select(GeoFunctions.healpixAng2pixRing(1, col("lon"), col("lat")).as("p"))
      .groupBy("p").count().collect().map(_.getLong(1))
    assert(counts.length == 12)
    val expected = n / 12.0
    counts.foreach(c => assert(math.abs(c - expected) / expected < 0.05,
      s"pixel count $c deviates >5% from $expected"))
  }

  test("healpixCount reduces levels like the reference formula") {
    // level-2 healpix ids (192 pixels) counted at level 1 (48 cells)
    val pts = spark.range(50000).select(
      (rand(3) * 360.0).as("lon"),
      (asin(rand(4) * 2.0 - 1.0) * 180.0 / math.Pi).as("lat"))
    val f = VxFrame(pts).withColumnHealpix("hp", "lon", "lat", healpixOrder = 2)
    val grid = f.healpixCount("hp", healpixMaxLevel = 2, healpixLevel = 1)
    assert(grid.length == 48)
    assert(grid.sum == 50000.0)
    // cross-check against a direct groupBy of hp div 4
    val direct = f.df.groupBy(floor(col("hp") / 4).cast("int").as("cell"))
      .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    grid.zipWithIndex.foreach { case (v, i) =>
      assert(v == direct.getOrElse(i, 0L).toDouble, s"cell $i")
    }
  }

  test("healpixCount level bound agrees with binby's dense-grid cap") {
    val f = VxFrame(Seq((0.0, 0.0)).toDF("lon", "lat"))
      .withColumnHealpix("hp", "lon", "lat", healpixOrder = 12)
    // level 12 = 201M cells: must fail at the healpix require with a
    // clear message, not deep inside binby's cell check
    val e = intercept[IllegalArgumentException](
      f.healpixCount("hp", healpixMaxLevel = 12, healpixLevel = 12))
    assert(e.getMessage.contains("healpix level 12"), e.getMessage)
    // level 11 (50.3M cells) passes both guards — run a degenerate
    // 1-row frame through to prove the guard boundary, not the perf
    assert(f.healpixCount("hp", healpixMaxLevel = 12, healpixLevel = 11)
      .sum == 1.0)
  }
}
