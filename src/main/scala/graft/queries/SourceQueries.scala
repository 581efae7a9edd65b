package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** Reader-path queries (SURVEY §2.1): the same aggregation shape as
  * q1_agg, but the lineitem rows take a round trip through a text
  * format first (parquet -> csv/json on disk -> Spark reader), proving
  * the CSV/JSON readers preserve values bit-exactly (the oracle runs
  * against the ORIGINAL parquet). Double round-trips are lossless:
  * Spark writes shortest-round-trip representations and the readers
  * parse them back to identical IEEE doubles.
  */
object SourceQueries {

  private def cacheDir(dir: String, leaf: String): String =
    s"/tmp/graft_src_cache/${dir.replaceAll("[^A-Za-z0-9.]", "_")}/$leaf"

  private def narrowLineitem(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")

  private def agg(df: DataFrame): DataFrame =
    df.groupBy("l_returnflag", "l_linestatus")
      .agg(r(dsumD(col("l_quantity"))).as("sum_qty"),
        r(dsumD(col("l_extendedprice"))).as("sum_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // from_csv (reference: core/__init__.py:571): write lineitem as
    // headered CSV, read it back with schema inference, aggregate.
    "q_csv_agg" -> ((s, dir) => {
      val cache = cacheDir(dir, "lineitem_csv")
      narrowLineitem(s, dir).write.mode("overwrite").option("header", "true").csv(cache)
      agg(graft.sources.Readers.fromCsv(s, cache))
    }),

    // from_json (reference: core/__init__.py:493): JSON-lines round trip.
    "q_json_agg" -> ((s, dir) => {
      val cache = cacheDir(dir, "lineitem_json")
      narrowLineitem(s, dir).write.mode("overwrite").json(cache)
      agg(graft.sources.Readers.fromJson(s, cache))
    })
  )

  private val aggSql =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty,
       |  ${sqlR(sqlDsum("l_extendedprice"))} AS sum_price,
       |  COUNT(*) AS n
       |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_csv_agg" -> aggSql,
    "q_json_agg" -> aggSql)
}
