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
}
