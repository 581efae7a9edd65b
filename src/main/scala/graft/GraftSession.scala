package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Design notes (scale-first):
  *   - AQE on: runtime coalescing of shuffle partitions + skew-join
  *     splitting replaces vaex's hand-tuned chunk sizing
  *     (reference: core/execution.py:283-292 chunk_size_for).
  *   - UTC session timezone so datetime semantics are stable across
  *     the cluster and match the DuckDB oracle.
  *   - shuffle.partitions defaults to the local core count here; on a
  *     real cluster this should be ~2-3x total executor cores (or left
  *     to AQE with a high initial value).
  */
object GraftSession {
  def builder(master: String = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"),
              shufflePartitions: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      // SQL surface for the codegen text kernels (GraftExtensions) —
      // also installable on a foreign session via
      // spark.sql.extensions=graft.GraftExtensions
      .withExtensions(GraftExtensions.install)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // events.parquet stores TIMESTAMP(NANOS) which Spark only reads
      // as long; Q.t normalizes the column back to TIMESTAMP_NTZ.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")

  def getOrCreate(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
