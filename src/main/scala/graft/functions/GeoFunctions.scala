package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geo / coordinate-transform functions (reference: packages/vaex-core/
  * vaex/geo.py, 574 LoC: DataFrameAccessorGeo — polar/spherical/
  * cartesian virtual-column transforms; point-in-polygon via the C++
  * pnpoly kernel, src/vaexfast.cpp:1856).
  *
  * All transforms are plain Column arithmetic (whole-stage codegen).
  * Point-in-polygon with a *literal* polygon unrolls the pnpoly
  * ray-casting loop into an XOR chain of per-edge crossing tests —
  * still pure codegen'd arithmetic, no UDF; for polygons with
  * thousands of vertices a custom Expression with a data array would
  * take over (same pattern as FloatVectorDot).
  */
object GeoFunctions {

  /** 2-D cartesian -> polar (r, theta in radians; atan2 convention).
    * reference: geo.py add_virtual_columns_cartesian_to_polar. */
  def cartesianToPolarR(x: Column, y: Column): Column = sqrt(x * x + y * y)
  def cartesianToPolarTheta(x: Column, y: Column): Column = atan2(y, x)

  /** polar -> cartesian. */
  def polarToCartesianX(r: Column, theta: Column): Column = r * cos(theta)
  def polarToCartesianY(r: Column, theta: Column): Column = r * sin(theta)

  /** spherical (alpha=lon, delta=lat, radians; distance) -> cartesian.
    * reference: geo.py add_virtual_columns_spherical_to_cartesian. */
  def sphericalToCartesianX(alpha: Column, delta: Column, distance: Column): Column =
    distance * cos(delta) * cos(alpha)
  def sphericalToCartesianY(alpha: Column, delta: Column, distance: Column): Column =
    distance * cos(delta) * sin(alpha)
  def sphericalToCartesianZ(alpha: Column, delta: Column, distance: Column): Column =
    distance * sin(delta)

  /** cartesian -> spherical. */
  def cartesianToSphericalDistance(x: Column, y: Column, z: Column): Column =
    sqrt(x * x + y * y + z * z)
  def cartesianToSphericalAlpha(x: Column, y: Column): Column = atan2(y, x)
  def cartesianToSphericalDelta(x: Column, y: Column, z: Column): Column =
    asin(z / cartesianToSphericalDistance(x, y, z))

  /** Great-circle (haversine) distance in radians between two
    * (lon, lat) pairs given in radians. */
  def haversine(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val dLat = (lat2 - lat1) / 2
    val dLon = (lon2 - lon1) / 2
    val a = sin(dLat) * sin(dLat) + cos(lat1) * cos(lat2) * sin(dLon) * sin(dLon)
    lit(2.0) * asin(sqrt(a))
  }

  /** HEALPix ang2pix, RING scheme, as pure Column arithmetic (the
    * reference calls healpy, core/dataframe.py:3541 add_column_healpix;
    * this is the standard HEALPix sphere-tessellation algorithm —
    * equatorial belt + polar caps — from the Gorski et al. 2005 paper,
    * re-derived as when/otherwise expressions so it runs inside
    * whole-stage codegen, no UDF). `lon`/`lat` in degrees when
    * `degrees` (astronomical convention: lat=90 north pole). */
  def healpixAng2pixRing(nside: Int, lon: Column, lat: Column,
                         degrees: Boolean = true): Column = {
    require(nside >= 1 && (nside & (nside - 1)) == 0, "nside must be a power of 2")
    val toRad = if (degrees) math.Pi / 180.0 else 1.0
    val phiRaw = lon * toRad
    val theta = lit(math.Pi / 2.0) - lat * toRad
    val z = cos(theta)
    val za = abs(z)
    // tt = phi scaled to [0, 4)
    val twoPi = 2.0 * math.Pi
    val phi = phiRaw - floor(phiRaw / twoPi) * twoPi
    val tt = phi / lit(math.Pi / 2.0)
    val ns = lit(nside.toLong)
    val npix = 12L * nside.toLong * nside
    val ncap = 2L * nside * (nside - 1L)
    // equatorial belt: |z| <= 2/3
    val temp1 = ns * (lit(0.5) + tt)
    val temp2 = ns * z * lit(0.75)
    val jpE = floor(temp1 - temp2).cast("long")
    val jmE = floor(temp1 + temp2).cast("long")
    val irE = ns + 1L + jpE - jmE
    val kshift = lit(1L) - pmod(irE, lit(2L))
    val ipE = pmod(floor((jpE + jmE - ns + kshift + 1L).cast("double") / 2.0).cast("long"),
      ns * 4L)
    val pixE = lit(ncap) + (irE - 1L) * (4L * nside) + ipE
    // polar caps: |z| > 2/3
    val tp = tt - floor(tt)
    val tmp = ns.cast("double") * sqrt(lit(3.0) * (lit(1.0) - za))
    val jpP = floor(tp * tmp).cast("long")
    val jmP = floor((lit(1.0) - tp) * tmp).cast("long")
    val irP = jpP + jmP + 1L
    val ipP = pmod(floor(tt * irP.cast("double")).cast("long"), irP * 4L)
    val pixNorth = lit(2L) * irP * (irP - 1L) + ipP
    val pixSouth = lit(npix) - lit(2L) * irP * (irP + 1L) + ipP
    when(za <= 2.0 / 3.0, pixE)
      .otherwise(when(z > 0, pixNorth).otherwise(pixSouth))
  }

  /** pnpoly ray-casting point-in-polygon for a literal polygon
    * (reference: src/vaexfast.cpp:1856; geo.py:377 inside_polygon):
    * count edge crossings of the +x ray via XOR of per-edge tests.
    * Boundary behavior matches the C pnpoly original. */
  def insidePolygon(x: Column, y: Column, polygon: Seq[(Double, Double)]): Column = {
    require(polygon.size >= 3, "polygon needs >= 3 vertices")
    val edges = polygon.indices.map { i =>
      val (xi, yi) = polygon(i)
      val (xj, yj) = polygon((i + polygon.size - 1) % polygon.size)
      val crossesY = (lit(yi) > y) =!= (lit(yj) > y)
      val xAtY = (lit(xj - xi) * (y - lit(yi)) / lit(yj - yi)) + lit(xi)
      crossesY && (x < xAtY)
    }
    edges.reduce(_ =!= _) // odd number of crossings -> inside
  }

  // ------------------------------------------------------- velocity fields

  /** reference: core/geo.py:158 velocity_cartesian2polar —
    * vr = (x·vx + y·vy)/r, vφ = (x·vy − y·vx)/r. */
  def velocityCartesianToPolarVr(x: Column, y: Column, vx: Column, vy: Column): Column =
    (x * vx + y * vy) / sqrt(x * x + y * y)
  def velocityCartesianToPolarVphi(x: Column, y: Column, vx: Column, vy: Column): Column =
    (x * vy - y * vx) / sqrt(x * x + y * y)

  /** reference: core/geo.py:128 velocity_polar2cartesian (azimuth from
    * atan2 when not given). */
  def velocityPolarToCartesianVx(x: Column, y: Column, vr: Column, vphi: Column): Column = {
    val az = atan2(y, x); vr * cos(az) - vphi * sin(az)
  }
  def velocityPolarToCartesianVy(x: Column, y: Column, vr: Column, vphi: Column): Column = {
    val az = atan2(y, x); vr * sin(az) + vphi * cos(az)
  }

  /** reference: core/geo.py:186 velocity_cartesian2spherical
    * (vr radial, vlong azimuthal, vlat toward the north pole). */
  def velocityCartesianToSphericalVr(x: Column, y: Column, z: Column,
                                     vx: Column, vy: Column, vz: Column): Column =
    (x * vx + y * vy + z * vz) / sqrt(x * x + y * y + z * z)
  def velocityCartesianToSphericalVlong(x: Column, y: Column,
                                        vx: Column, vy: Column): Column =
    -(vx * y - x * vy) / sqrt(x * x + y * y)
  def velocityCartesianToSphericalVlat(x: Column, y: Column, z: Column,
                                       vx: Column, vy: Column, vz: Column): Column = {
    val rxy2 = x * x + y * y
    -(z * (x * vx + y * vy) - rxy2 * vz) / (sqrt(rxy2 + z * z) * sqrt(rxy2))
  }

  // ------------------------------------------------------- frame transforms

  /** reference: core/geo.py:257 rotation_2d — rotate (x, y) by
    * `degrees` counter-clockwise (constants folded driver-side). */
  def rotation2dX(x: Column, y: Column, degrees: Double): Column = {
    val (c, s) = (math.cos(math.toRadians(degrees)), math.sin(math.toRadians(degrees)))
    x * c - y * s
  }
  def rotation2dY(x: Column, y: Column, degrees: Double): Column = {
    val (c, s) = (math.cos(math.toRadians(degrees)), math.sin(math.toRadians(degrees)))
    x * s + y * c
  }

  /** reference: core/geo.py:212 project_aitoff (radians in/out) —
    * the sinc in the reference is numpy's normalized sinc(t) =
    * sin(pi t)/(pi t), so sinc(alpha/pi) = sin(alpha)/alpha. */
  def projectAitoffX(alpha: Column, delta: Column): Column = {
    val a = acos(cos(delta) * cos(alpha / 2))
    lit(2) * cos(delta) * sin(alpha / 2) / (sin(a) / a) / math.Pi
  }
  def projectAitoffY(alpha: Column, delta: Column): Column = {
    val a = acos(cos(delta) * cos(alpha / 2))
    sin(delta) / (sin(a) / a) / math.Pi
  }

  /** reference: core/geo.py:233 project_gnomic — tangent-plane
    * projection around (alpha0, delta0), all in radians. */
  def projectGnomicX(alpha: Column, delta: Column,
                     alpha0: Double, delta0: Double): Column = {
    val den = tan(delta) * math.sin(delta0) +
      cos(alpha - alpha0) * math.cos(delta0)
    sin(alpha - lit(alpha0)) / den
  }
  def projectGnomicY(alpha: Column, delta: Column,
                     alpha0: Double, delta0: Double): Column = {
    val den = tan(delta) * math.sin(delta0) +
      cos(alpha - alpha0) * math.cos(delta0)
    (tan(delta) * math.cos(delta0) - cos(alpha - alpha0) * math.sin(delta0)) / den
  }

  /** The same pnpoly XOR-fold as SQL text (valid in both Spark SQL and
    * DuckDB, constants folded driver-side) — used for serializable
    * lasso selections and for generating bit-identical oracles. */
  def insidePolygonSql(x: String, y: String, polygon: Seq[(Double, Double)]): String = {
    require(polygon.size >= 3, "polygon needs >= 3 vertices")
    val edges = polygon.indices.map { i =>
      val (xi, yi) = polygon(i)
      val (xj, yj) = polygon((i + polygon.size - 1) % polygon.size)
      s"((($yi > $y) != ($yj > $y)) AND ($x < (${xj - xi} * ($y - $yi) / ${yj - yi}) + $xi))"
    }
    edges.reduce((a, b) => s"($a != $b)") // left-fold XOR, explicit parens
  }

  /** First polygon containing each point: 0-based index, null when none
    * (reference: core/geo.py:530 inside_which_polygon) — a CASE chain of
    * pnpoly predicates, pure column algebra, zero shuffle. */
  def insideWhichPolygon(x: Column, y: Column,
                         polygons: Seq[Seq[(Double, Double)]]): Column =
    polygons.zipWithIndex.foldRight(lit(null).cast("int")) {
      case ((poly, i), acc) => when(insidePolygon(x, y, poly), lit(i)).otherwise(acc)
    }
}
