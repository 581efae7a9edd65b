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
  *   // or by TIME (epoch millis / ISO date / ISO date-time, UTC):
  *   .option("startingTimestamp", "2026-08-16T12:00:00")
  *   .option("maxVersionsPerBatch", "64") // backlog drain rate
  *   .option("maxBytesPerBatch", "1073741824") // ...or by add bytes
  *   .load()
  * }}}
  *
  * Scale: `getOffset` is one log LISTING (driver metadata);
  * `getBatch` plans the same distributed scan-per-version
  * fromDeltaChanges plans (one branch per commit, 256-commit plan
  * cap guards runaway ranges; `maxVersionsPerBatch`, default 64,
  * paces offset claims so a backlogged consumer drains across
  * micro-batches instead of dying on the cap). Schema drift inside an
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
    // validate every option EARLY — sourceSchema runs synchronously in
    // load(), createSource only on the stream thread
    DeltaTailSourceProvider.maxPerBatchOf(parameters)
    DeltaTailSourceProvider.maxBytesOf(parameters)
    parameters.get("startingTimestamp")
      .foreach(DeltaTailSourceProvider.parseTimestamp(_,
        sqlContext.sparkSession))
    require(!(parameters.contains("startingVersion") &&
        parameters.contains("startingTimestamp")),
      "options startingVersion and startingTimestamp are mutually exclusive")
    ("delta-tail", DeltaTailSourceProvider.tailSchema(
      sqlContext.sparkSession, table,
      DeltaTailSourceProvider.cdfOf(parameters)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val table = DeltaTailSourceProvider.tableOf(parameters)
    require(!(parameters.contains("startingVersion") &&
        parameters.contains("startingTimestamp")),
      "options startingVersion and startingTimestamp are mutually exclusive")
    val starting = parameters.get("startingVersion") match {
      case Some(v) => v.trim.toLong
      case None => parameters.get("startingTimestamp") match {
        // the common operational entry point: "everything since <ts>"
        // (ISO local date[-time], or epoch millis) — resolved against
        // commitInfo timestamps / commit-file mtimes
        case Some(ts) => DeltaLake.versionAtOrAfterTimestamp(table,
          DeltaTailSourceProvider.parseTimestamp(ts,
            sqlContext.sparkSession))
        case None => DeltaLake.latestVersion(table) // new commits only
      }
    }
    new DeltaTailSource(sqlContext.sparkSession, table, starting,
      DeltaTailSourceProvider.maxPerBatchOf(parameters),
      DeltaTailSourceProvider.maxBytesOf(parameters),
      DeltaTailSourceProvider.cdfOf(parameters))
  }
}

object DeltaTailSourceProvider {
  private[streaming] def tableOf(parameters: Map[String, String]): String =
    FsIO.normalize(parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "delta-tail source requires option 'path' (the Delta table root)"))
      .stripSuffix("/"))

  private[streaming] def maxPerBatchOf(parameters: Map[String, String]): Long = {
    val m = parameters.get("maxVersionsPerBatch")
      .map(_.trim.toLong).getOrElse(64L)
    require(m >= 1 && m <= 256,
      s"maxVersionsPerBatch must be in [1, 256] (the fromDeltaChanges " +
        s"plan cap), got $m")
    m
  }

  /** `readChangeFeed=true`: deliver the row-level CHANGE DATA FEED
    * (`_change_type` column) via [[DeltaLake.fromDeltaCdf]] instead
    * of the append tail — update/delete images stream too. */
  private[graft] def cdfOf(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists { v =>
      require(v.trim.equalsIgnoreCase("true") ||
          v.trim.equalsIgnoreCase("false"),
        s"readChangeFeed must be true|false, got '$v'")
      v.trim.toBoolean
    }

  private[graft] def maxBytesOf(parameters: Map[String, String]): Long = {
    val m = parameters.get("maxBytesPerBatch")
      .map(_.trim.toLong).getOrElse(Long.MaxValue)
    require(m >= 1, s"maxBytesPerBatch must be positive, got $m")
    m
  }

  /** `startingTimestamp`: epoch millis, ISO date (`2026-08-16`) or
    * ISO local date-time (`2026-08-16T12:30:00`). Zone-free ISO forms
    * resolve against `spark.sql.session.timeZone` — the same rule the
    * upstream Delta streaming source applies, so migrating pipelines
    * keep their start offset (commitInfo carries epoch millis; only
    * the user-supplied wall-clock string needs a zone). */
  private[graft] def parseTimestamp(s0: String,
      spark: SparkSession): Long = {
    val s = s0.trim
    if (s.forall(_.isDigit)) s.toLong
    else {
      val zone = java.time.ZoneId.of(
        spark.conf.get("spark.sql.session.timeZone"))
      val ldt =
        if (s.contains("T")) java.time.LocalDateTime.parse(s)
        else java.time.LocalDate.parse(s).atStartOfDay()
      ldt.atZone(zone).toInstant.toEpochMilli
    }
  }

  private[streaming] def tailSchema(spark: SparkSession,
      table: String, cdf: Boolean = false): StructType = {
    // schema from log METADATA only (building a fromDelta scan plan
    // here would list/assemble the whole union plan twice per stream
    // start for nothing); the protocol gate still runs
    val base = DeltaLake.tableSchema(spark, table)
    val withCt =
      if (!cdf) base
      else StructType(base :+ org.apache.spark.sql.types.StructField(
        "_change_type", org.apache.spark.sql.types.StringType,
        nullable = false))
    StructType(withCt :+ StructField("_commit_version", LongType, nullable = false))
  }
}

final class DeltaTailSource(spark: SparkSession, table: String,
    startingVersion: Long, maxVersionsPerBatch: Long = 64L,
    maxBytesPerBatch: Long = Long.MaxValue,
    readChangeFeed: Boolean = false) extends Source {

  override val schema: StructType =
    DeltaTailSourceProvider.tailSchema(spark, table, readChangeFeed)

  // highest version this source has OFFERED as an offset; the engine
  // always getBatches up to the last offered offset, so rate limiting
  // must happen HERE (a backlogged consumer would otherwise claim a
  // range past the fromDeltaChanges plan cap and fail forever)
  @volatile private var offered: Long = startingVersion

  // memoized per-version add bytes for the byte-based pacing (one
  // commit-file scan per version EVER; pruned as the cursor advances)
  private val bytesCache = scala.collection.mutable.HashMap.empty[Long, Long]
  private def addBytes(v: Long): Long = bytesCache.synchronized {
    bytesCache.getOrElseUpdate(v, DeltaLake.commitAddBytes(table, v))
  }

  /** Newest claimable offset, capped at `maxVersionsPerBatch` commits
    * past what was last offered — a consumer behind by thousands of
    * commits drains the backlog across successive micro-batches
    * instead of dying on the 256-commit plan cap. With
    * `maxBytesPerBatch` set, the claim additionally stops once the
    * cumulative dataChange add bytes (from the log actions — free)
    * reach the budget, always claiming at least one commit. None
    * while caught up. */
  override def getOffset: Option[Offset] = {
    val latest = DeltaLake.latestVersion(table)
    if (latest <= offered) None
    else {
      val end =
        if (maxBytesPerBatch == Long.MaxValue) // never scan commits here
          math.min(latest, offered + maxVersionsPerBatch)
        else {
          var e = offered
          var bytes = 0L
          var full = false
          while (!full && e < latest && e - offered < maxVersionsPerBatch) {
            val b = addBytes(e + 1)
            if (e > offered && bytes + b > maxBytesPerBatch) full = true
            else {
              e += 1; bytes += b
              if (bytes >= maxBytesPerBatch) full = true
            }
          }
          e
        }
      offered = end
      bytesCache.synchronized {
        bytesCache.filterInPlace((v, _) => v > end)
      }
      Some(LongOffset(offered))
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(asLong).getOrElse(startingVersion)
    val to = asLong(end)
    if (to > offered) offered = to // restart replay: resync the cursor
    val batch =
      if (to <= from) // engine replay of an empty range after restart
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          schema)
      else if (readChangeFeed)
        DeltaLake.fromDeltaCdf(spark, table, from, Some(to))
      else DeltaLake.fromDeltaChanges(spark, table, from, Some(to))
    org.apache.spark.sql.graftbridge.Bridge.asStreamingFrame(batch)
  }

  /** The engine calls commit() after each batch completes AND during
    * restart initialization with the last committed offset — resync
    * the pacing cursor there, or a cleanly-restarted source would
    * re-offer (and re-deliver) versions below the committed offset
    * (getBatch only replays UNCOMMITTED batches, so its resync alone
    * does not cover clean restarts). */
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
