package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.sources.StreamSourceProvider

import graft.sources.{FsIO, Iceberg}

/** Structured-Streaming SOURCE over an Iceberg table's snapshot tail —
  * the incremental-consumption face of [[graft.sources.Iceberg
  * .fromIcebergChangesBySeq]], completing the mixed-lakehouse story:
  * a pipeline can now tail Delta AND Iceberg tables with the same
  * discipline. Offsets are SEQUENCE NUMBERS (the v2 spec's monotonic
  * commit clock — snapshot ids are random and cannot order a
  * restart); each micro-batch delivers exactly the data files added
  * by main-chain snapshots in the claimed `(start, end]` sequence
  * range, tagged `_snapshot_id` + `_sequence_number`. Compactions
  * (`replace`) deliver nothing; `overwrite`/`delete` snapshots and
  * chain gaps from expired snapshots reject loudly through the shared
  * fromIcebergChanges guards.
  *
  * Usage:
  * {{{
  * spark.readStream
  *   .format(classOf[IcebergTailSourceProvider].getName)
  *   .option("path", dir)
  *   .option("startingSequence", "0")     // default: latest at start
  *   .option("maxSnapshotsPerBatch", "64") // backlog drain rate
  *   .load()
  * }}}
  *
  * Scale: `getOffset` is one metadata-json read (driver metadata);
  * `getBatch` plans one distributed scan branch set per snapshot
  * (256-snapshot plan cap; `maxSnapshotsPerBatch`, default 64, paces
  * offset claims so a backlogged consumer drains across micro-batches
  * instead of dying on the cap — sequence numbers advance by one per
  * commit, so the sequence window bounds the snapshot count).
  * V1 `Source` for the same reason as [[DeltaTailSource]]: the batch
  * IS a first-class driver-planned DataFrame.
  */
final class IcebergTailSourceProvider extends StreamSourceProvider {

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val dir = IcebergTailSourceProvider.tableOf(parameters)
    IcebergTailSourceProvider.maxPerBatchOf(parameters) // validate early
    ("iceberg-tail", Iceberg.tailSchema(dir,
      IcebergTailSourceProvider.cdfOf(parameters)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val dir = IcebergTailSourceProvider.tableOf(parameters)
    val starting = parameters.get("startingSequence") match {
      case Some(v) => v.trim.toLong
      case None => Iceberg.lastSequence(dir) // new commits only
    }
    new IcebergTailSource(sqlContext.sparkSession, dir, starting,
      IcebergTailSourceProvider.maxPerBatchOf(parameters),
      IcebergTailSourceProvider.cdfOf(parameters))
  }
}

object IcebergTailSourceProvider {
  private[streaming] def tableOf(parameters: Map[String, String]): String =
    FsIO.normalize(parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "iceberg-tail source requires option 'path' (the table root)"))
      .stripSuffix("/"))

  /** `readChangeFeed=true`: deliver the row-level CHANGELOG
    * (`_change_type` insert/delete via
    * [[Iceberg.fromIcebergChangelogBySeq]]) instead of the
    * append-only tail — MoR delete snapshots stream their masked
    * rows, overwrites their replaced state. */
  private[streaming] def cdfOf(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists { v =>
      require(v.trim.equalsIgnoreCase("true") ||
          v.trim.equalsIgnoreCase("false"),
        s"readChangeFeed must be true|false, got '$v'")
      v.trim.toBoolean
    }

  private[streaming] def maxPerBatchOf(parameters: Map[String, String]): Long = {
    val m = parameters.get("maxSnapshotsPerBatch")
      .map(_.trim.toLong).getOrElse(64L)
    require(m >= 1 && m <= 256,
      s"maxSnapshotsPerBatch must be in [1, 256] (the fromIcebergChanges " +
        s"plan cap), got $m")
    m
  }
}

final class IcebergTailSource(spark: SparkSession, dir: String,
    startingSequence: Long, maxSnapshotsPerBatch: Long = 64L,
    readChangeFeed: Boolean = false) extends Source {

  override val schema: StructType = Iceberg.tailSchema(dir, readChangeFeed)

  // highest sequence this source has OFFERED as an offset — rate
  // limiting happens HERE (the engine always getBatches up to the
  // last offered offset; see DeltaTailSource for the full rationale)
  @volatile private var offered: Long = startingSequence

  override def getOffset: Option[Offset] = {
    val latest = Iceberg.lastSequence(dir)
    if (latest <= offered) None
    else {
      offered = math.min(latest, offered + maxSnapshotsPerBatch)
      Some(LongOffset(offered))
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(asLong).getOrElse(startingSequence)
    val to = asLong(end)
    if (to > offered) offered = to // restart replay: resync the cursor
    val batch =
      if (to <= from) // engine replay of an empty range after restart
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          schema)
      else if (readChangeFeed)
        Iceberg.fromIcebergChangelogBySeq(spark, dir, from, Some(to))
      else Iceberg.fromIcebergChangesBySeq(spark, dir, from, Some(to))
    org.apache.spark.sql.graftbridge.Bridge.asStreamingFrame(batch)
  }

  /** Resync the pacing cursor on engine commit — covers clean
    * restarts, where getBatch never replays committed ranges. */
  override def commit(end: Offset): Unit = {
    val v = asLong(end)
    if (v > offered) offered = v
  }

  private def asLong(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other => throw new IllegalArgumentException(
      s"unexpected offset type ${other.getClass.getName}")
  }

  override def stop(): Unit = ()
}
