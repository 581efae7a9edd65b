package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.sources.StreamSourceProvider

import graft.sources.{DeltaLake, FsIO}

/** Structured-Streaming SOURCE over a Delta table's commit tail —
  * the incremental-consumption face of [[graft.sources.DeltaLake
  * .fromDeltaChanges]]: offsets ARE commit versions, each micro-batch
  * delivers exactly the dataChange=true adds of the claimed version
  * range `(start, end]` tagged with `_commit_version`, compactions
  * (dataChange=false) deliver nothing, and the engine's offset log
  * makes restart exactly-once (a restarted query resumes from the
  * last COMMITTED version, never re-delivering). This completes the
  * engine story: ingest -> curate -> lakehouse table -> streaming
  * consumers tail it.
  *
  * Usage:
  * {{{
  * spark.readStream
  *   .format(classOf[DeltaTailSourceProvider].getName)
  *   .option("path", table)
  *   .option("startingVersion", "-1") // default: latest at start
  *   .load()
  * }}}
  *
  * Scale: `getOffset` is one log LISTING (driver metadata);
  * `getBatch` plans the same distributed scan-per-version
  * fromDeltaChanges plans (one branch per commit, 256-commit plan
  * cap guards runaway ranges — fall back to a snapshot read + fresh
  * tail if a consumer is further behind). Schema drift inside an
  * uncommitted range and DV-carrying adds reject loudly through the
  * shared fromDeltaChanges guards — a tail consumer must never see
  * half-reinterpreted rows.
  *
  * V1 `Source` (getBatch returns a driver-planned DataFrame) rather
  * than a DSv2 MicroBatchStream: the batch IS a first-class Spark
  * plan (stats-typed parquet branches, partition literals), which a
  * row-level PartitionReader cannot express.
  */
final class DeltaTailSourceProvider extends StreamSourceProvider {

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val table = DeltaTailSourceProvider.tableOf(parameters)
    ("delta-tail", DeltaTailSourceProvider.tailSchema(
      sqlContext.sparkSession, table))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val table = DeltaTailSourceProvider.tableOf(parameters)
    val starting = parameters.get("startingVersion") match {
      case Some(v) => v.trim.toLong
      case None => DeltaLake.latestVersion(table) // new commits only
    }
    new DeltaTailSource(sqlContext.sparkSession, table, starting)
  }
}

object DeltaTailSourceProvider {
  private[streaming] def tableOf(parameters: Map[String, String]): String =
    FsIO.normalize(parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "delta-tail source requires option 'path' (the Delta table root)"))
      .stripSuffix("/"))

  private[streaming] def tailSchema(spark: SparkSession,
      table: String): StructType = {
    // schema from log METADATA only (building a fromDelta scan plan
    // here would list/assemble the whole union plan twice per stream
    // start for nothing); the protocol gate still runs
    val base = DeltaLake.tableSchema(spark, table)
    StructType(base :+ StructField("_commit_version", LongType, nullable = false))
  }
}

final class DeltaTailSource(spark: SparkSession, table: String,
    startingVersion: Long) extends Source {

  override val schema: StructType =
    DeltaTailSourceProvider.tailSchema(spark, table)

  /** Newest commit version, as a claimable offset — None while the
    * consumer is caught up (no batch scheduled). */
  override def getOffset: Option[Offset] = {
    val latest = DeltaLake.latestVersion(table)
    if (latest > startingVersion) Some(LongOffset(latest)) else None
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(asLong).getOrElse(startingVersion)
    val to = asLong(end)
    val batch =
      if (to <= from) // engine replay of an empty range after restart
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          schema)
      else DeltaLake.fromDeltaChanges(spark, table, from, Some(to))
    org.apache.spark.sql.graftbridge.Bridge.asStreamingFrame(batch)
  }

  private def asLong(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other => throw new IllegalArgumentException(
      s"unexpected offset type ${other.getClass.getName}")
  }

  override def stop(): Unit = ()
}
