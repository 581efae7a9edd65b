package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Loaders for the driver-provided star schema (TESTDATA.md) and for
  * generic sources.
  *
  * Mirrors the reference's `vaex.open` dispatch
  * (reference: packages/vaex-core/vaex/__init__.py:111) re-expressed as
  * `spark.read.format(...)`; the convert-to-native-store idiom
  * (`convert=` kwarg) becomes an explicit write-through Parquet cache.
  */
object Tables {
  val starTables: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")

  /** `spark.read.parquet` on `<dir>/<name>.parquet`. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Register every star table as a temp view so `spark.sql` works. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    starTables.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))

  /** Attach a stable 0-based `row_index` column in *file order*.
    *
    * vaex semantics (shift/diff/rolling, positional join, no-order
    * `first`) assume deterministic file-order rows
    * (reference: packages/vaex-core/vaex/dataframe.py:4781 shift;
    * join on=None positional paste, core/join.py:164). Spark has no
    * implicit order, so ordered operators require this column.
    *
    * Implementation: zipWithIndex over the scan — a single extra pass,
    * no shuffle; indices are assigned per partition in partition order,
    * which reproduces file order for a Parquet scan. At 100 TB this is
    * still safe: no driver materialization, no global sort.
    */
  def withRowIndex(df: DataFrame, name: String = "row_index"): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema
    val rdd = df.rdd.zipWithIndex.map { case (row, idx) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ idx)
    }
    spark.createDataFrame(rdd, schema.add(name, org.apache.spark.sql.types.LongType, nullable = false))
  }

  /** Cheap ordered index when a natural total-order key exists — stays
    * fully in the DataFrame API (codegen-friendly, no RDD round-trip).
    * Prefer this at scale: `row_number` over an explicit sort key.
    */
  def withRowIndexBy(df: DataFrame, orderCols: Seq[String], name: String = "row_index"): DataFrame =
    df.withColumn(name,
      row_number().over(Window.orderBy(orderCols.map(col): _*)).cast("long") - 1L)
}
