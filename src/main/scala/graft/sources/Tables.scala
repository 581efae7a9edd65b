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
    * Implementation: per-partition offset fix-up, fully columnar (no
    * RDD round-trip, stays inside whole-stage codegen):
    * pass 1 counts rows per `spark_partition_id` (a partial-agg job
    * whose shuffle moves one row per partition); pass 2 projects
    * `offset(pid) + intra-partition counter`, where the counter comes
    * from `monotonically_increasing_id`'s documented layout
    * (pid in the upper 31 bits, per-partition record number in the
    * lower 33). No global sort, no driver materialization; safe
    * whenever the frame's partitioning is deterministic across jobs
    * (file scans, hash shuffles — NOT round-robin `repartition(n)`).
    */
  def withRowIndex(df: DataFrame, name: String = "row_index"): DataFrame = {
    val counts = df.groupBy(spark_partition_id().as("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) return df.withColumn(name, lit(0L))
    val offsets: Map[Int, Long] = {
      var acc = 0L
      (0 to counts.keys.max).map { p =>
        val entry = p -> acc; acc += counts.getOrElse(p, 0L); entry
      }.toMap
    }
    val intra = monotonically_increasing_id() -
      shiftleft(spark_partition_id().cast("long"), 33)
    // a partition id the count job never saw means the partitioning was
    // NOT deterministic across jobs (e.g. round-robin repartition or a
    // rand() source) — fail loudly instead of emitting null indices
    // that ordered ops would silently consume
    val offset = coalesce(
      element_at(typedLit(offsets), spark_partition_id()),
      raise_error(lit("withRowIndex: partition layout changed between the " +
        "count job and the projection job (non-deterministic partitioning, " +
        "e.g. round-robin repartition) — materialize or re-read the input first"))
        .cast("long"))
    df.withColumn(name, offset + intra)
  }

  /** 0-based dense index in the total order of `orderCols` — WITHOUT a
    * global single-reducer window. Strategy (deterministic, parallel):
    *
    *   1. sample the leading order column (fixed seed) and pick
    *      key-range boundaries on the driver — fixed literals, so every
    *      job sees identical bucketing (unlike `repartitionByRange`,
    *      whose per-job sampling can disagree between the count pass
    *      and the main pass);
    *   2. count rows per bucket (partial-agg job) -> cumulative offsets;
    *   3. `row_number` over a window PARTITIONED by bucket (parallel,
    *      max task = bucket size) + the bucket's offset.
    *
    * Ties on the leading column land in one bucket, and the in-bucket
    * window orders by the full composite key, so the result equals a
    * global `row_number() over (order by orderCols)` (nulls first). */
  def withRowIndexBy(df: DataFrame, orderCols: Seq[String], name: String = "row_index",
                     buckets: Int = 0): DataFrame = {
    val nb = if (buckets > 0) buckets
      else math.max(df.sparkSession.sparkContext.defaultParallelism, 8)
    val k = col(orderCols.head)
    val n = df.count()
    if (n == 0) return df.withColumn(name, lit(0L))
    val frac = math.min(1.0, (nb * 200.0) / n)
    val ord = new Ordering[Any] {
      def compare(a: Any, b: Any): Int = a.asInstanceOf[Comparable[Any]].compareTo(b)
    }
    val sampled = df.select(k.as("__k")).where(col("__k").isNotNull)
      .sample(withReplacement = false, frac, 42L).collect().map(_.get(0)).sorted(ord)
    val boundaries =
      if (sampled.isEmpty) Array.empty[Any]
      else (1 until nb).map(i => sampled(i * sampled.length / nb)).distinct.toArray
    // searchsorted over the fixed boundaries; nulls sort first (Spark asc)
    val bucketExpr = when(k.isNull, lit(-1)).otherwise(
      boundaries.foldLeft(lit(0)) { (acc, b) =>
        acc + when(k > lit(b), 1).otherwise(0)
      })
    val bucketed = df.withColumn("__bucket", bucketExpr)
    val counts = bucketed.groupBy("__bucket").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets: Map[Int, Long] = {
      var acc = 0L
      counts.keys.toSeq.sorted.map { b =>
        val entry = b -> acc; acc += counts(b); entry
      }.toMap
    }
    val w = Window.partitionBy(col("__bucket")).orderBy(orderCols.map(col): _*)
    bucketed
      .withColumn(name,
        element_at(typedLit(offsets), col("__bucket")) +
          row_number().over(w).cast("long") - 1L)
      .drop("__bucket")
  }
}
