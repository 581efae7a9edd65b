package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.VxFrame
import graft.functions.GeoFunctions
import Q._

/** Accessor-family queries: geo transforms + point-in-polygon
  * (reference: core/geo.py), uncertainty propagation (reference:
  * core/dataframe.py:3648), and nested struct access via parsed JSON
  * (reference: core/struct.py:173 struct_get — the events.props column
  * plays the struct role). */
object AccessorQueries {

  /** Test polygon (concave) for the pnpoly gate. */
  private val POLY = Seq((0.0, 0.0), (8.0, 0.0), (8.0, 4.0), (4.0, 4.0), (4.0, 8.0), (0.0, 8.0))

  /** Polygon set for inside_which_polygon (first-match-wins): the
    * concave POLY, the square notch it excludes, a right-side strip. */
  private val POLYS = Seq(
    POLY,
    Seq((4.0, 4.0), (8.0, 4.0), (8.0, 8.0), (4.0, 8.0)),
    Seq((8.0, 0.0), (10.0, 0.0), (10.0, 10.0), (8.0, 10.0)))

  /** DuckDB rendering of the same XOR-fold pnpoly chain, generated from
    * the same vertex list so the two engines stay in lockstep. */
  private def insideSql(x: String, y: String, poly: Seq[(Double, Double)] = POLY): String =
    GeoFunctions.insidePolygonSql(x, y, poly)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // polar/spherical transforms over synthesized coordinates
    "q_geo_transform" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(
        col("event_id"),
        (col("value") / 100.0).as("x"),
        ((col("user_id") % 10).cast("double") / 5.0 - 1.0).as("y"))
      ev.select(
        col("event_id"),
        r(GeoFunctions.cartesianToPolarR(col("x"), col("y")), 8).as("r"),
        r(GeoFunctions.cartesianToPolarTheta(col("x"), col("y")), 8).as("theta"),
        r(GeoFunctions.haversine(lit(0.0), lit(0.0), col("x"), col("y")), 8).as("gc"))
        .orderBy("event_id")
    }),

    // point-in-polygon selection: count + value sum of events whose
    // synthesized (x, y) lands in a concave polygon
    "q_geo_polygon" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(
        col("value"),
        (col("value") % 10.0).as("x"),
        (col("user_id") % 10).cast("double").as("y"))
      ev.where(GeoFunctions.insidePolygon(col("x"), col("y"), POLY))
        .agg(count(lit(1)).as("n"), r(dsumD(col("value"))).as("sum_value"))
    }),

    // inside_which_polygon dispatch (reference: core/geo.py:530):
    // first polygon containing each point, -1 when none; per-polygon
    // count + value sum. Pure CASE-chain column algebra — one
    // aggregation shuffle, no UDF.
    "q_geo_which_polygon" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(
        col("value"),
        (col("value") % 10.0).as("x"),
        (col("user_id") % 10).cast("double").as("y"))
      ev.select(col("value"),
          coalesce(GeoFunctions.insideWhichPolygon(col("x"), col("y"), POLYS),
            lit(-1)).as("poly"))
        .groupBy("poly")
        .agg(count(lit(1)).as("n"), r(dsumD(col("value"))).as("sum_value"))
        .orderBy("poly")
    }),

    // velocity-field transforms (reference: core/geo.py:128-210):
    // synthesize positions/velocities from events, convert cartesian ->
    // polar velocity components, aggregate per event_type
    "q_geo_velocity" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(
        col("event_type"),
        (col("value") % 10.0 + 1.0).as("x"),
        ((col("user_id") % 10) + lit(1)).cast("double").as("y"),
        (col("value") % 3.0).as("vx"),
        ((col("user_id") % 5) + lit(1)).cast("double").as("vy"))
      ev.select(col("event_type"),
          GeoFunctions.velocityCartesianToPolarVr(col("x"), col("y"), col("vx"), col("vy")).as("vr"),
          GeoFunctions.velocityCartesianToPolarVphi(col("x"), col("y"), col("vx"), col("vy")).as("vphi"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), r(dsumD(col("vr"))).as("sum_vr"),
          r(dsumD(col("vphi"))).as("sum_vphi"))
        .orderBy("event_type")
    }),

    // uncertainty propagation through revenue = price * (1 - discount)
    "q_uncertainty" -> ((s, dir) => {
      VxFrame(t(s, dir, "lineitem"))
        .withVirtualColumn("sigma_p", "l_extendedprice * 0.01")
        .withVirtualColumn("sigma_d", "0.001")
        .propagateUncertainties("revenue", "l_extendedprice * (1 - l_discount)",
          Map("l_extendedprice" -> "sigma_p", "l_discount" -> "sigma_d"))
        .df.groupBy(col("l_returnflag"))
        .agg(r(dsumD(col("revenue"))).as("sum_rev"),
          r(dsumD(col("revenue_uncertainty"))).as("sum_sigma"))
        .orderBy("l_returnflag")
    }),

    // uncertainty propagation WITH correlated inputs: the covariance
    // cross-term 2 (df/dp)(df/dd) cov_pd joins the diagonal terms.
    // Oracle parity is by construction: the oracle embeds the very SQL
    // string Symbolic generates (valid in DuckDB too), so both engines
    // evaluate the identical expression tree.
    "q_uncertainty_cov" -> ((s, dir) => {
      VxFrame(t(s, dir, "lineitem"))
        .propagateUncertainties("revenue", "l_extendedprice * (1 - l_discount)",
          Map("l_extendedprice" -> "(l_extendedprice * 0.01)", "l_discount" -> "0.001"),
          Map(("l_extendedprice", "l_discount") -> "(l_extendedprice * 0.00001)"))
        .df.groupBy(col("l_returnflag"))
        .agg(r(dsumD(col("revenue_uncertainty"))).as("sum_sigma"))
        .orderBy("l_returnflag")
    }),

    // struct access on parsed JSON props (nested data path)
    "q_struct_json" -> ((s, dir) => {
      val schema = StructType(Seq(StructField("k", LongType)))
      t(s, dir, "events")
        .select(col("event_type"), from_json(col("props"), schema).as("p"))
        .select(col("event_type"), col("p").getField("k").as("k"))
        .groupBy(col("event_type"), (col("k") % 5).as("k_mod"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy("event_type", "k_mod")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_geo_transform" ->
      """SELECT event_id,
        |  ROUND(SQRT(x*x + y*y), 8) AS r,
        |  ROUND(ATAN2(y, x), 8) AS theta,
        |  ROUND(2 * ASIN(SQRT(
        |    SIN(y/2)*SIN(y/2) + COS(0.0)*COS(y)*SIN(x/2)*SIN(x/2))), 8) AS gc
        |FROM (SELECT event_id, value / 100.0 AS x,
        |        CAST(user_id % 10 AS DOUBLE) / 5.0 - 1.0 AS y FROM events)
        |ORDER BY event_id""".stripMargin,

    "q_geo_polygon" ->
      s"""SELECT COUNT(*) AS n, ${sqlR(sqlDsum("value"))} AS sum_value
         |FROM (SELECT value, value % 10.0 AS x,
         |        CAST(user_id % 10 AS DOUBLE) AS y FROM events)
         |WHERE ${insideSql("x", "y")}""".stripMargin,

    "q_geo_which_polygon" -> {
      val cases = POLYS.zipWithIndex
        .map { case (p, i) => s"WHEN ${insideSql("x", "y", p)} THEN $i" }
        .mkString(" ")
      s"""SELECT poly, COUNT(*) AS n, ${sqlR(sqlDsum("value"))} AS sum_value
         |FROM (
         |  SELECT value, CAST(CASE $cases ELSE -1 END AS INT) AS poly
         |  FROM (SELECT value, value % 10.0 AS x,
         |          CAST(user_id % 10 AS DOUBLE) AS y FROM events))
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q_geo_velocity" ->
      s"""SELECT event_type, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("(x*vx + y*vy) / sqrt(x*x + y*y)"))} AS sum_vr,
         |  ${sqlR(sqlDsum("(x*vy - y*vx) / sqrt(x*x + y*y)"))} AS sum_vphi
         |FROM (
         |  SELECT event_type,
         |    value % 10.0 + 1.0 AS x,
         |    CAST(user_id % 10 + 1 AS DOUBLE) AS y,
         |    value % 3.0 AS vx,
         |    CAST(user_id % 5 + 1 AS DOUBLE) AS vy
         |  FROM events)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // closed form: sigma = sqrt((1-d)^2 (0.01 p)^2 + p^2 (0.001)^2)
    "q_uncertainty" ->
      s"""SELECT l_returnflag,
         |  ${sqlR(sqlDsum("l_extendedprice * (1 - l_discount)"))} AS sum_rev,
         |  ${sqlR(sqlDsum(
              "sqrt(power(1 - l_discount, 2) * power(l_extendedprice * 0.01, 2)" +
              " + power(l_extendedprice, 2) * power(0.001, 2))"))} AS sum_sigma
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_uncertainty_cov" -> {
      val sigmaSql = graft.functions.Symbolic.propagatedSigma(
        "l_extendedprice * (1 - l_discount)",
        Map("l_extendedprice" -> "(l_extendedprice * 0.01)", "l_discount" -> "0.001"),
        Map(("l_extendedprice", "l_discount") -> "(l_extendedprice * 0.00001)"))
      s"""SELECT l_returnflag, ${sqlR(sqlDsum(sigmaSql))} AS sum_sigma
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q_struct_json" ->
      """SELECT event_type,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) % 5 AS k_mod,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
