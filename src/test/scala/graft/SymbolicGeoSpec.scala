package graft

import org.apache.spark.sql.functions._
import graft.functions.{GeoFunctions, Symbolic}

class SymbolicGeoSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ symbolic

  test("derivative: polynomial and product rules") {
    assert(Symbolic.derivative("x * x + 3 * x + 7", "x") == "((x + x) + 3)")
    assert(Symbolic.derivative("x * y", "x") == "y")
    assert(Symbolic.derivative("y", "x") == "0")
  }

  test("derivative: chain rule through sin/sqrt/exp/log") {
    assert(Symbolic.derivative("sin(2 * x)", "x") == "(cos((2 * x)) * 2)")
    assert(Symbolic.derivative("exp(x)", "x") == "exp(x)")
    assert(Symbolic.derivative("ln(x)", "x") == "(1 / x)")
    assert(Symbolic.derivative("sqrt(x)", "x") == "(1 / (2 * sqrt(x)))")
  }

  test("derivative: quotient rule") {
    // d/dx (x/y) = 1/y
    assert(Symbolic.derivative("x / y", "x") == "(1 / y)")
    // d/dy (x/y) = -x/y^2
    assert(Symbolic.derivative("x / y", "y") == "(-(x / (y * y)))")
  }

  test("derivatives evaluate correctly in Spark SQL") {
    val df = Seq((2.0, 3.0)).toDF("x", "y")
    val d = Symbolic.derivative("x * x * y + sin(x)", "x") // 2xy + cos(x)
    val got = df.select(expr(d)).head.getDouble(0)
    assert(math.abs(got - (2 * 2 * 3 + math.cos(2.0))) < 1e-12)
  }

  test("propagated sigma matches the analytic formula; state round-trips") {
    // f = x * y: sigma_f = sqrt(y² σx² + x² σy²)
    val f = VxFrame(Seq((2.0, 3.0, 0.1, 0.2)).toDF("x", "y", "ex", "ey"))
      .propagateUncertainties("f", "x * y", Map("x" -> "ex", "y" -> "ey"))
    val r = f.df.select(col("f"), col("f_uncertainty")).head
    assert(r.getDouble(0) == 6.0)
    val expect = math.sqrt(9 * 0.01 + 4 * 0.04)
    assert(math.abs(r.getDouble(1) - expect) < 1e-12)
    // survives state save/load (it's just virtual columns)
    val restored = VxFrame(f.base).stateSet(f.stateGet())
    assert(restored.df.select("f_uncertainty").head.getDouble(0) == r.getDouble(1))
  }

  // ------------------------------------------------------------ geo

  test("polar <-> cartesian round trip") {
    val df = Seq((3.0, 4.0)).toDF("x", "y")
    val r = df.select(
      GeoFunctions.cartesianToPolarR(col("x"), col("y")).as("r"),
      GeoFunctions.cartesianToPolarTheta(col("x"), col("y")).as("th"))
    val back = r.select(
      round(GeoFunctions.polarToCartesianX(col("r"), col("th")), 10),
      round(GeoFunctions.polarToCartesianY(col("r"), col("th")), 10)).head
    assert(back.getDouble(0) == 3.0 && back.getDouble(1) == 4.0)
  }

  test("spherical <-> cartesian round trip") {
    val df = Seq((0.5, 0.3, 2.0)).toDF("alpha", "delta", "dist")
    val c = df.select(
      GeoFunctions.sphericalToCartesianX(col("alpha"), col("delta"), col("dist")).as("x"),
      GeoFunctions.sphericalToCartesianY(col("alpha"), col("delta"), col("dist")).as("y"),
      GeoFunctions.sphericalToCartesianZ(col("alpha"), col("delta"), col("dist")).as("z"))
    val back = c.select(
      round(GeoFunctions.cartesianToSphericalAlpha(col("x"), col("y")), 10),
      round(GeoFunctions.cartesianToSphericalDelta(col("x"), col("y"), col("z")), 10),
      round(GeoFunctions.cartesianToSphericalDistance(col("x"), col("y"), col("z")), 10)).head
    assert(back.getDouble(0) == 0.5 && back.getDouble(1) == 0.3 && back.getDouble(2) == 2.0)
  }

  test("haversine: quarter circumference between pole and equator") {
    val r = spark.range(1).select(
      GeoFunctions.haversine(lit(0.0), lit(0.0), lit(0.0), lit(math.Pi / 2)).as("d")).head
    assert(math.abs(r.getDouble(0) - math.Pi / 2) < 1e-12)
  }

  test("insidePolygon: unit square and concave polygon") {
    val square = Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0))
    val df = Seq((0.5, 0.5), (1.5, 0.5), (-0.1, 0.2), (0.9, 0.99)).toDF("x", "y")
    val got = df.select(GeoFunctions.insidePolygon(col("x"), col("y"), square)).collect()
      .map(_.getBoolean(0)).toSeq
    assert(got == Seq(true, false, false, true))
    // concave "L" shape: (2.0, 1.5) sits in the notch
    val ell = Seq((0.0, 0.0), (3.0, 0.0), (3.0, 1.0), (1.0, 1.0), (1.0, 3.0), (0.0, 3.0))
    val got2 = Seq((0.5, 2.0), (2.0, 0.5), (2.0, 1.5)).toDF("x", "y")
      .select(GeoFunctions.insidePolygon(col("x"), col("y"), ell)).collect()
      .map(_.getBoolean(0)).toSeq
    assert(got2 == Seq(true, true, false))
  }

  test("velocity transforms: polar<->cartesian round-trip and spherical closed forms") {
    // point at (3,4), velocity (1,2): vr = (3+8)/5 = 2.2, vphi = (6-4)/5 = 0.4
    val row = Seq((3.0, 4.0, 1.0, 2.0)).toDF("x", "y", "vx", "vy")
    val r = row.select(
      GeoFunctions.velocityCartesianToPolarVr(col("x"), col("y"), col("vx"), col("vy")).as("vr"),
      GeoFunctions.velocityCartesianToPolarVphi(col("x"), col("y"), col("vx"), col("vy")).as("vp")).head
    assert(math.abs(r.getDouble(0) - 2.2) < 1e-12 && math.abs(r.getDouble(1) - 0.4) < 1e-12)
    // round-trip back to cartesian
    val rt = row.select(
      GeoFunctions.velocityPolarToCartesianVx(col("x"), col("y"), lit(2.2), lit(0.4)).as("vx2"),
      GeoFunctions.velocityPolarToCartesianVy(col("x"), col("y"), lit(2.2), lit(0.4)).as("vy2")).head
    assert(math.abs(rt.getDouble(0) - 1.0) < 1e-12 && math.abs(rt.getDouble(1) - 2.0) < 1e-12)
    // radial motion on the x-axis is purely vr; vlat for equatorial point is vz
    val sph = Seq((2.0, 0.0, 0.0, 5.0, 0.0, 7.0)).toDF("x", "y", "z", "vx", "vy", "vz")
      .select(
        GeoFunctions.velocityCartesianToSphericalVr(col("x"), col("y"), col("z"),
          col("vx"), col("vy"), col("vz")).as("vr"),
        GeoFunctions.velocityCartesianToSphericalVlong(col("x"), col("y"),
          col("vx"), col("vy")).as("vlong"),
        GeoFunctions.velocityCartesianToSphericalVlat(col("x"), col("y"), col("z"),
          col("vx"), col("vy"), col("vz")).as("vlat")).head
    assert(math.abs(sph.getDouble(0) - 5.0) < 1e-12)  // vr = vx on the x-axis
    assert(math.abs(sph.getDouble(1) - 0.0) < 1e-12)
    assert(math.abs(sph.getDouble(2) - 7.0) < 1e-12)  // vlat = +vz at the equator
  }

  test("rotation2d and projections: known values") {
    val p = Seq((1.0, 0.0)).toDF("x", "y")
    val rot = p.select(
      GeoFunctions.rotation2dX(col("x"), col("y"), 90).as("xn"),
      GeoFunctions.rotation2dY(col("x"), col("y"), 90).as("yn")).head
    assert(math.abs(rot.getDouble(0)) < 1e-12 && math.abs(rot.getDouble(1) - 1.0) < 1e-12)
    // aitoff at the origin-adjacent point: small angles map ~(alpha/pi, delta/pi)
    val ai = Seq((0.01, 0.01)).toDF("a", "d").select(
      GeoFunctions.projectAitoffX(col("a"), col("d")).as("x"),
      GeoFunctions.projectAitoffY(col("a"), col("d")).as("y")).head
    assert(math.abs(ai.getDouble(0) - 0.01 / math.Pi) < 1e-4)
    assert(math.abs(ai.getDouble(1) - 0.01 / math.Pi) < 1e-4)
    // gnomic centered at the point itself projects to (0,0); small
    // offsets are ~linear
    val gn = Seq((0.02, 0.01)).toDF("a", "d").select(
      GeoFunctions.projectGnomicX(col("a"), col("d"), 0.0, 0.0).as("x"),
      GeoFunctions.projectGnomicY(col("a"), col("d"), 0.0, 0.0).as("y")).head
    assert(math.abs(gn.getDouble(0) - 0.02) < 1e-3)
    assert(math.abs(gn.getDouble(1) - 0.01) < 1e-3)
  }

  test("selectLasso (SQL text) equals the insidePolygon Column predicate") {
    val poly = Seq((0.0, 0.0), (3.0, 0.0), (3.0, 1.0), (1.0, 1.0), (1.0, 3.0), (0.0, 3.0))
    val pts = (for (i <- 0 until 200) yield (i % 20 * 0.2 - 0.5, i / 20 * 0.2 - 0.5))
      .toDF("x", "y")
    val viaColumn = pts.where(GeoFunctions.insidePolygon(col("x"), col("y"), poly))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    val f = graft.VxFrame(pts).selectLasso("x", "y", poly.map(_._1), poly.map(_._2))
    val viaLasso = f.df.where(f.selectionColumn())
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(viaLasso == viaColumn && viaColumn.nonEmpty)
  }

  test("insideWhichPolygon: first match wins, null when outside all") {
    val polys = Seq(
      Seq((0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)),
      Seq((1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0))) // overlaps first
    val got = Seq((0.5, 0.5), (1.5, 1.5), (2.5, 2.5), (5.0, 5.0)).toDF("x", "y")
      .select(GeoFunctions.insideWhichPolygon(col("x"), col("y"), polys))
      .collect().map(r => Option(r.get(0)))
    assert(got.toSeq == Seq(Some(0), Some(0), Some(1), None)) // overlap -> first
  }

  test("propagated sigma covariance cross-terms: analytic closed forms") {
    import graft.functions.Symbolic
    // f = x + y: sigma² = sx² + sy² + 2 cov
    val fSum = Symbolic.propagatedSigma("x + y",
      Map("x" -> "sx", "y" -> "sy"), Map(("y", "x") -> "cxy"))
    // f = x * y: sigma² = y² sx² + x² sy² + 2 x y cov
    val fMul = Symbolic.propagatedSigma("x * y",
      Map("x" -> "sx", "y" -> "sy"), Map(("x", "y") -> "cxy"))
    val row = Seq((3.0, 4.0, 0.1, 0.2, 0.01)).toDF("x", "y", "sx", "sy", "cxy")
      .select(expr(fSum).as("s"), expr(fMul).as("m")).head
    assert(math.abs(row.getDouble(0) -
      math.sqrt(0.01 + 0.04 + 2 * 0.01)) < 1e-12)
    assert(math.abs(row.getDouble(1) -
      math.sqrt(16 * 0.01 + 9 * 0.04 + 2 * 3 * 4 * 0.01)) < 1e-12)
    // zero-derivative pairs drop out entirely
    assert(Symbolic.propagatedSigma("x", Map("x" -> "sx", "y" -> "sy"),
      Map(("x", "y") -> "cxy")) == "sqrt(power(1, 2) * power(sx, 2))")
  }
}
