package graft.sources

import java.nio.charset.StandardCharsets
import scala.collection.mutable
import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.avro.{Schema => ASchema}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Dependency-free Apache Iceberg table source (+ a minimal v2
  * writer), built straight from the public Iceberg table spec
  * (iceberg.apache.org/spec): table state lives in
  * `metadata/vN.metadata.json` (schemas, snapshots), each snapshot
  * points at an Avro MANIFEST LIST, each manifest-list entry points
  * at an Avro MANIFEST whose entries carry the data files. The
  * manifests are ordinary Avro object-container files — read and
  * written here with the avro-core jars Spark already ships (the
  * same classes the in-house Avro source uses).
  *
  * Scale shape mirrors DeltaLake.scala: the metadata chain is
  * driver-side (one entry per file/manifest), the DATA read is a
  * plain distributed parquet scan over the live file set — and
  * unlike Delta/Hive layouts, Iceberg data files CONTAIN their
  * partition source columns, so no literal re-injection is needed
  * and parquet min/max pushdown prunes files on partition predicates
  * out of the box.
  *
  * Read support: format-version 1 and 2; PARQUET and ORC data files;
  * time travel by snapshot id; merge-on-read POSITION deletes
  * (content=1 delete manifests, PARQUET data files — ORC scans have
  * no `_metadata.row_index`, so ORC+MoR rejects loudly): rows named
  * by (file_path, pos) drop via a distributed left-anti join against
  * the delete files on canonical per-file int ids
  * ([[PathKeys]]/[[PathId]] bridge the manifest / resolved /
  * percent-encoded-URI spellings; scan side strict-loud, delete side
  * lenient for stale deletes) — sequence-number scoping is not
  * needed for positional deletes because file paths are unique per
  * file instance (a compaction rewrite mints new paths, so stale
  * deletes match nothing). EQUALITY deletes (content=2, the
  * Flink-CDC shape) apply with the spec's STRICT sequence scoping:
  * an anti-join on the delete file's equality columns (null-safe)
  * restricted to data files whose sequence number is below the
  * delete's — rows appended after the delete survive even when they
  * match. REJECTED loudly (changed data
  * interpretation, silently misread otherwise): AVRO data files,
  * unsupported column types (uuid, time, map — the writer never
  * produces them), schema histories with renames/field-id reuse
  * (name-based resolution would misread).
  *
  * Write support: unpartitioned v2 copy-on-write append/overwrite —
  * stage-and-rename data parquet (the DeltaLake promote discipline),
  * one new manifest per commit, fast-append manifest lists (append
  * re-lists prior manifests verbatim), spec field-ids on the data
  * schema, record counts from parquet footers. Partitioned writes go
  * through the Delta sink; this writer exists so Iceberg round trips
  * are testable end-to-end without the reference implementation.
  */
object Iceberg {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private final case class SnapshotInfo(
      id: Long, sequenceNumber: Long, timestampMs: Long, manifestList: String,
      operation: String = null, parentId: Long = -1L)
  private final case class Metadata(
      dir: String, formatVersion: Int, location: String, lastColumnId: Int,
      schema: StructType, schemaNode: JsonNode, snapshots: Seq[SnapshotInfo],
      currentSnapshotId: Long, lastSequenceNumber: Long, version: Int,
      tableUuid: String, file: String, renameDrift: Option[String])
  private final case class DataFileInfo(path: String, format: String,
      records: Long, statsJson: String, rawPath: String = null,
      seq: Long = 0L, partition: GenericRecord = null)
  private final case class DeleteFileInfo(path: String, format: String,
      records: Long, seq: Long = 0L, equalityIds: Seq[Int] = Nil)

  // ------------------------------------------------------------------
  // Read path
  // ------------------------------------------------------------------

  /** Open an Iceberg table — current snapshot, or `snapshotId`.
    * `where`: optional predicate for BOUNDS-BASED FILE SKIPPING —
    * evaluated driver-side against each manifest entry's
    * lower/upper_bounds + null_value_counts (via the shared
    * DeltaStats evaluator), then re-applied as a real filter so the
    * answer never depends on bounds availability. */
  def fromIceberg(spark: SparkSession, dir0: String,
      snapshotId: Option[Long] = None,
      where: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val dir = FsIO.normalize(dir0.stripSuffix("/"))
    val meta = loadMetadata(dir)
    // data files resolve columns by NAME here; the schema history
    // proves whether that is equivalent to the spec's by-field-id
    // resolution — reject loudly when it is not (silent NULLs /
    // wrong-column reads otherwise).
    meta.renameDrift.foreach(msg => throw new IllegalArgumentException(
      s"Iceberg table $dir has schema-evolution the name-based reader " +
        s"cannot honor ($msg); data files must be resolved by field id"))
    val snap = snapshotId match {
      case Some(id) => meta.snapshots.find(_.id == id).getOrElse(
        throw new IllegalArgumentException(
          s"snapshot $id not in ${meta.snapshots.map(_.id).mkString(",")}"))
      case None =>
        if (meta.currentSnapshotId < 0 || meta.snapshots.isEmpty)
          return spark.createDataFrame(new java.util.ArrayList[Row](), meta.schema)
        meta.snapshots.find(_.id == meta.currentSnapshotId).getOrElse(
          throw new IllegalArgumentException(
            s"current-snapshot-id ${meta.currentSnapshotId} missing from snapshots"))
    }
    val (files0, deleteFiles) = liveFiles(meta, snap, withStats = where.isDefined)
    val files = where match {
      case Some(w) =>
        val pred = DeltaLake.resolvePredicate(spark, meta.schema, w)
        val tz = spark.conf.get("spark.sql.session.timeZone",
          java.util.TimeZone.getDefault.getID)
        files0.filter(f => DeltaStats.mightMatch(pred, meta.schema, Nil,
          Map.empty, f.statsJson, tz))
      case None => files0
    }
    def finish(df: DataFrame): DataFrame = where.map(df.filter).getOrElse(df)
    if (files.isEmpty)
      return finish(
        spark.createDataFrame(new java.util.ArrayList[Row](), meta.schema))
    val (eqDels, posDels) = deleteFiles.partition(_.equalityIds.nonEmpty)
    val mor = deleteFiles.nonEmpty
    // merge-on-read. POSITION deletes (content=1): a distributed
    // left-anti join on (file id, row position) — sequence scoping
    // unnecessary (paths are unique per file instance; stale deletes
    // match nothing). EQUALITY deletes (content=2): an anti-join on
    // the delete file's equality columns with STRICT sequence
    // scoping (they apply only to data files whose data sequence
    // number is < the delete file's), null-safe equality per the
    // spec. Paths travel in THREE spellings (manifest raw /
    // driver-resolved / _metadata's percent-encoded URI), so the
    // scan maps _metadata.file_path to a canonical per-file int id
    // through a driver-built spelling table (PathKeys/PathId, the
    // Delta DV discipline): scan side strict-loud (a spelling gap
    // must never silently resurrect deleted rows), position-delete
    // side lenient (unknown path = stale delete, matches nothing).
    // The per-row data sequence number rides as
    // element_at(<literal seq array>, fid + 1) — file count is
    // driver metadata, never a shuffle.
    import org.apache.spark.sql.functions.{col, lit, element_at}
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.unsafe.types.UTF8String
    lazy val pathIds: java.util.HashMap[UTF8String, Integer] = {
      val m = new java.util.HashMap[UTF8String, Integer]()
      files.zipWithIndex.foreach { case (f, i) =>
        (Option(f.rawPath).toSeq ++ PathKeys.spellings(f.path)).foreach(s =>
          m.put(UTF8String.fromString(s), Integer.valueOf(i)))
      }
      m
    }
    def scan(schema: StructType, fmt: String, paths: Seq[String]): DataFrame = {
      val base = fmt match {
        case "PARQUET" => spark.read.schema(schema).parquet(paths: _*)
        case "ORC" =>
          require(posDels.isEmpty, "position deletes over ORC data " +
            "files are unsupported (Spark exposes _metadata.row_index " +
            "for parquet scans only)")
          spark.read.schema(schema).orc(paths: _*)
        case other => throw new IllegalArgumentException(
          s"unsupported Iceberg data file format $other (${paths.head})")
      }
      if (!mor) base
      else {
        val fid = Bridge.column(PathId(Bridge.expression(
          col("_metadata.file_path")), pathIds, strict = true)).as("__ice_fid")
        val extra =
          if (posDels.nonEmpty)
            Seq(fid, col("_metadata.row_index").as("__ice_pos"))
          else Seq(fid)
        base.select(
          (schema.fieldNames.toIndexedSeq.map(col) ++ extra): _*)
      }
    }
    val byFormat = files.groupBy(_.format)
    val parts = byFormat.toSeq.sortBy(_._1).map { case (fmt, fs) =>
      scan(meta.schema, fmt, fs.map(_.path)) }
    var data = parts.reduce(_ union _)
    if (!mor) return finish(data)
    def readDel(schema: StructType, dfs: Seq[DeleteFileInfo]): DataFrame =
      dfs.groupBy(_.format).toSeq.sortBy(_._1).map {
        case ("PARQUET", fs) =>
          spark.read.schema(schema).parquet(fs.map(_.path): _*)
        case ("ORC", fs) => spark.read.schema(schema).orc(fs.map(_.path): _*)
        case (other, fs) => throw new IllegalArgumentException(
          s"unsupported Iceberg delete file format $other (${fs.head.path})")
      }.reduce(_ union _)
    if (posDels.nonEmpty) {
      val delSchema = StructType(Seq(
        StructField("file_path", StringType, nullable = false),
        StructField("pos", LongType, nullable = false)))
      val dels = readDel(delSchema, posDels).select(
        Bridge.column(PathId(Bridge.expression(col("file_path")),
          pathIds, strict = false)).as("__ice_fid"),
        col("pos").as("__ice_pos"))
      data = data.join(dels, Seq("__ice_fid", "__ice_pos"), "left_anti")
    }
    if (eqDels.nonEmpty) {
      // field id -> current-schema column name (top-level only — the
      // writer-side spec restricts equality ids to primitive fields)
      val idToName: Map[Int, String] = {
        val fs = meta.schemaNode.get("fields")
        (0 until fs.size()).map(i =>
          fs.get(i).get("id").asInt() -> fs.get(i).get("name").asText()).toMap
      }
      val seqByFid = files.map(_.seq).toArray
      data = data.withColumn("__ice_seq",
        element_at(lit(seqByFid), col("__ice_fid") + 1))
      val groups = eqDels.groupBy(d => (d.equalityIds, d.seq)).toSeq
        .sortBy { case ((ids, s), _) => (ids.mkString(","), s) }
      require(groups.size <= 256,
        s"fromIceberg: ${groups.size} distinct equality-delete " +
          "(field-set, sequence) groups exceeds the 256 anti-join cap")
      groups.foreach { case ((ids, delSeq), fs) =>
        val names = ids.map(id => idToName.getOrElse(id,
          throw new IllegalArgumentException(
            s"equality delete references unknown field id $id")))
        val delSchema = StructType(names.map(n =>
          meta.schema(n).copy(nullable = true)))
        val del = readDel(delSchema, fs).select(
          names.zipWithIndex.map { case (n, i) =>
            col(n).as(s"__ice_eq$i") }: _*)
        val cond = names.zipWithIndex.map { case (n, i) =>
          data(n) <=> del(s"__ice_eq$i") }.reduce(_ && _) &&
          data("__ice_seq") < lit(delSeq)
        data = data.join(del, cond, "left_anti")
      }
    }
    finish(data.select(meta.schema.fieldNames.toIndexedSeq.map(col): _*))
  }

  /** Snapshot history (driver-side metadata). */
  def snapshots(spark: SparkSession, dir0: String): DataFrame = {
    val meta = loadMetadata(FsIO.normalize(dir0.stripSuffix("/")))
    val rows = meta.snapshots.sortBy(_.id).map(s =>
      Row(s.id, s.sequenceNumber, s.timestampMs, s.id == meta.currentSnapshotId))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava),
      StructType(Seq(
        StructField("snapshot_id", LongType, nullable = false),
        StructField("sequence_number", LongType, nullable = false),
        StructField("timestamp_ms", LongType, nullable = false),
        StructField("is_current", BooleanType, nullable = false))))
  }

  /** Incremental read: the rows ADDED between two snapshots — the
    * spec's incremental append scan ("added-data-files" between
    * ancestors). Walks the parent chain from `toSnapshotId` (default:
    * current) back to `fromSnapshotId` EXCLUSIVE (-1 = from the
    * beginning), delivering each in-range snapshot's ADDED data files
    * tagged `_snapshot_id` + `_sequence_number`. The Iceberg twin of
    * [[DeltaLake.fromDeltaChanges]]:
    *  - `append` snapshots deliver their added files;
    *  - `replace` (compaction — layout-only rewrite) delivers nothing;
    *  - `overwrite`/`delete`/anything else rejects loudly — the table
    *    is not append-only over the range and a tail consumer would
    *    double-count or miss rows (a parentless first-commit
    *    `overwrite` removes nothing and counts as the initial append);
    *  - a chain gap (expired snapshot) rejects loudly.
    * Scale: the chain walk + manifest reads are driver metadata
    * (bounded by file counts); each snapshot's rows are one
    * distributed scan branch. 256-snapshot plan cap, as in Delta. */
  def fromIcebergChanges(spark: SparkSession, dir0: String,
      fromSnapshotId: Long = -1L,
      toSnapshotId: Option[Long] = None): DataFrame = {
    val dir = FsIO.normalize(dir0.stripSuffix("/"))
    val meta = loadMetadata(dir)
    meta.renameDrift.foreach(msg => throw new IllegalArgumentException(
      s"fromIcebergChanges: table $dir has schema-evolution the " +
        s"name-based reader cannot honor ($msg)"))
    val out = StructType(meta.schema
      :+ StructField("_snapshot_id", LongType, nullable = false)
      :+ StructField("_sequence_number", LongType, nullable = false))
    def empty() = spark.createDataFrame(new java.util.ArrayList[Row](), out)
    val toId = toSnapshotId.getOrElse(meta.currentSnapshotId)
    if (toId < 0 || toId == fromSnapshotId) return empty()
    val chain = changesChain(meta, fromSnapshotId, toId)
    val perSnap = chain.flatMap { s =>
      val op = s.operation
      require(op != null,
        s"fromIcebergChanges: snapshot ${s.id} of $dir carries no " +
          "summary.operation — cannot prove the range is append-only; " +
          "read a full snapshot")
      op match {
        case "append" => Some(s)
        case "replace" => None // compaction: layout-only, no new rows
        case "overwrite" if s.parentId < 0 => Some(s) // initial commit
        case other => throw new IllegalArgumentException(
          s"fromIcebergChanges: snapshot ${s.id} of $dir is a '$other' — " +
            "the table is not append-only over this range; read a full " +
            "snapshot")
      }
    }
    val frames = perSnap.flatMap { s =>
      val files = addedFiles(meta, s)
      if (files.isEmpty) None
      else Some(files.groupBy(_.format).toSeq.sortBy(_._1).map {
        case ("PARQUET", fs) =>
          spark.read.schema(meta.schema).parquet(fs.map(_.path): _*)
        case ("ORC", fs) =>
          spark.read.schema(meta.schema).orc(fs.map(_.path): _*)
        case (other, fs) => throw new IllegalArgumentException(
          s"unsupported Iceberg data file format $other (${fs.head.path})")
      }.reduce(_ union _)
        .withColumn("_snapshot_id", org.apache.spark.sql.functions.lit(s.id))
        .withColumn("_sequence_number",
          org.apache.spark.sql.functions.lit(s.sequenceNumber)))
    }
    if (frames.isEmpty) empty() else frames.reduce(_ union _)
  }

  /** Sequence-number face of [[fromIcebergChanges]] — rows added by
    * main-chain snapshots with `fromSeq < sequence_number <= toSeq`.
    * Sequence numbers are the table's MONOTONIC commit clock (v2), so
    * they are what a streaming tail checkpoints ([[graft.streaming
    * .IcebergTailSource]]); snapshot ids are random and cannot order a
    * restart. */
  def fromIcebergChangesBySeq(spark: SparkSession, dir0: String,
      fromSeq: Long, toSeq: Option[Long] = None): DataFrame = {
    val dir = FsIO.normalize(dir0.stripSuffix("/"))
    val meta = loadMetadata(dir)
    require(meta.formatVersion == 2,
      s"fromIcebergChangesBySeq: format-version ${meta.formatVersion} " +
        "tables have no sequence numbers; use snapshot ids")
    val to = snapAtSeq(meta, toSeq.getOrElse(Long.MaxValue))
    val from = snapAtSeq(meta, fromSeq)
    fromIcebergChanges(spark, dir, from.map(_.id).getOrElse(-1L),
      Some(to.map(_.id).getOrElse(-1L)))
  }

  /** Sequence-number face of [[fromIcebergChangelog]] — the
    * changelog of main-chain snapshots with
    * `fromSeq < sequence_number <= toSeq` (what a streaming
    * changelog tail checkpoints). */
  def fromIcebergChangelogBySeq(spark: SparkSession, dir0: String,
      fromSeq: Long, toSeq: Option[Long] = None): DataFrame = {
    val dir = FsIO.normalize(dir0.stripSuffix("/"))
    val meta = loadMetadata(dir)
    require(meta.formatVersion == 2,
      s"fromIcebergChangelogBySeq: format-version ${meta.formatVersion} " +
        "tables have no sequence numbers; use snapshot ids")
    val to = snapAtSeq(meta, toSeq.getOrElse(Long.MaxValue))
    val from = snapAtSeq(meta, fromSeq)
    fromIcebergChangelog(spark, dir, from.map(_.id).getOrElse(-1L),
      Some(to.map(_.id).getOrElse(-1L)))
  }

  /** The streaming tail's schema/cursor probes (log metadata only —
    * one json read, no scan plan). `cdf`: the changelog face adds
    * `_change_type`. */
  private[graft] def tailSchema(dir0: String,
      cdf: Boolean = false): StructType = {
    val meta = loadMetadata(FsIO.normalize(dir0.stripSuffix("/")))
    val base =
      if (!cdf) meta.schema
      else StructType(meta.schema :+
        StructField("_change_type", StringType, nullable = false))
    StructType(base
      :+ StructField("_snapshot_id", LongType, nullable = false)
      :+ StructField("_sequence_number", LongType, nullable = false))
  }
  private[graft] def lastSequence(dir0: String): Long =
    loadMetadata(FsIO.normalize(dir0.stripSuffix("/"))).lastSequenceNumber

  /** Newest MAIN-CHAIN snapshot with sequenceNumber <= seq (walking
    * parent links from the current snapshot — the `snapshots` array
    * may hold orphaned branch heads whose seq range overlaps). None
    * when `seq` predates the chain; loud when the walk crosses an
    * expired (missing) ancestor. */
  private def snapAtSeq(meta: Metadata, seq: Long): Option[SnapshotInfo] = {
    if (meta.currentSnapshotId < 0) return None
    val byId = meta.snapshots.map(s => s.id -> s).toMap
    var cur = byId.getOrElse(meta.currentSnapshotId,
      throw new IllegalArgumentException(
        s"current-snapshot-id ${meta.currentSnapshotId} missing from snapshots"))
    while (cur.sequenceNumber > seq) {
      if (cur.parentId < 0) return None
      cur = byId.getOrElse(cur.parentId,
        throw new IllegalArgumentException(
          s"snapshot ${cur.parentId} was expired mid-chain; " +
            "restart from a full snapshot"))
    }
    Some(cur)
  }

  /** Parent-chain snapshots `(fromId, toId]`, oldest first. A
    * history whose root has no parent-snapshot-id is only trusted
    * when the walked chain COVERS every snapshot at/below `toId`'s
    * sequence — a table written by a writer that never recorded
    * parent links (pre-r16 graft, some foreign writers) would
    * otherwise silently truncate the read to the newest snapshot
    * (and misclassify a legacy mid-chain overwrite as the initial
    * commit); such histories reject loudly instead. */
  private def changesChain(meta: Metadata, fromId: Long,
      toId: Long): Seq[SnapshotInfo] = {
    val byId = meta.snapshots.map(s => s.id -> s).toMap
    val chain = Seq.newBuilder[SnapshotInfo]
    var cur = toId
    var steps = 0
    while (cur != fromId && cur >= 0) {
      steps += 1
      require(steps <= 256,
        s"fromIcebergChanges: range exceeds the 256-snapshot plan cap " +
          "(one scan branch set per snapshot) — pull in chunks")
      val s = byId.getOrElse(cur, throw new IllegalArgumentException(
        s"fromIcebergChanges: snapshot $cur is not in the table " +
          "metadata (expired?); restart from a full snapshot"))
      chain += s
      cur = s.parentId
    }
    require(cur == fromId || fromId < 0,
      s"fromIcebergChanges: snapshot $fromId is not an ancestor of " +
        s"$toId; restart from a full snapshot")
    val out = chain.result().reverse
    if (cur < 0) { // walked to a parentless root with fromId = -1
      val toSeq = byId(toId).sequenceNumber
      val covered = out.map(_.id).toSet
      val missed = meta.snapshots.filter(s =>
        s.sequenceNumber <= toSeq && !covered(s.id))
      require(missed.isEmpty,
        s"fromIcebergChanges: ${missed.size} snapshot(s) at/below " +
          s"sequence $toSeq are OFF the parent chain (history written " +
          "without parent-snapshot-id links, or a branch) — the walk " +
          "cannot prove completeness; read a full snapshot")
    }
    out
  }

  /** Data files ADDED by snapshot `s`: manifests the snapshot itself
    * added (added_snapshot_id == s.id), entries with status ADDED
    * owned by it. A delete manifest added by a supposedly-append
    * snapshot is loud (the operation summary lied). */
  private def addedFiles(meta: Metadata, s: SnapshotInfo): Seq[DataFileInfo] = {
    val outF = Seq.newBuilder[DataFileInfo]
    eachAvro(resolvePath(meta, s.manifestList)) { e =>
      if (longField(e, "added_snapshot_id").contains(s.id)) {
        val content = longField(e, "content").getOrElse(0L)
        require(content == 0L,
          s"fromIcebergChanges: snapshot ${s.id} added a DELETE " +
            s"manifest (${e.get("manifest_path")}) — the table is not " +
            "append-only over this range; read a full snapshot")
        val mpath = e.get("manifest_path").toString
        eachAvro(resolvePath(meta, mpath)) { entry =>
          val status = longField(entry, "status").getOrElse(0L)
          val ownerId = longField(entry, "snapshot_id").getOrElse(s.id)
          if (status == 1L && ownerId == s.id) {
            val df = entry.get("data_file").asInstanceOf[GenericRecord]
            require(df != null, s"manifest entry without data_file in $mpath")
            require(longField(df, "content").getOrElse(0L) == 0L,
              s"delete FILE in data manifest $mpath: ${df.get("file_path")}")
            outF += DataFileInfo(
              resolvePath(meta, df.get("file_path").toString),
              df.get("file_format").toString.toUpperCase,
              longField(df, "record_count").getOrElse(0L), null)
          }
        }
      }
    }
    outF.result()
  }

  /** Files a snapshot ADDED, split into data files and delete files
    * (the changelog walker — unlike [[addedFiles]] it accepts delete
    * manifests instead of rejecting them). Equality deletes reject:
    * resolving them to rows needs full sequence-scoped evaluation. */
  private def addedFilesAndDeletes(meta: Metadata, s: SnapshotInfo)
      : (Seq[DataFileInfo], Seq[DeleteFileInfo]) = {
    val outF = Seq.newBuilder[DataFileInfo]
    val outD = Seq.newBuilder[DeleteFileInfo]
    eachAvro(resolvePath(meta, s.manifestList)) { e =>
      if (longField(e, "added_snapshot_id").contains(s.id)) {
        val content = longField(e, "content").getOrElse(0L)
        val mpath = e.get("manifest_path").toString
        val manifestSeq = longField(e, "sequence_number").getOrElse(0L)
        eachAvro(resolvePath(meta, mpath)) { entry =>
          val status = longField(entry, "status").getOrElse(0L)
          val ownerId = longField(entry, "snapshot_id").getOrElse(s.id)
          if (status == 1L && ownerId == s.id) {
            val df = entry.get("data_file").asInstanceOf[GenericRecord]
            require(df != null, s"manifest entry without data_file in $mpath")
            val fc = longField(df, "content").getOrElse(0L)
            if (content == 0L) {
              require(fc == 0L,
                s"delete FILE in data manifest $mpath: ${df.get("file_path")}")
              outF += DataFileInfo(
                resolvePath(meta, df.get("file_path").toString),
                df.get("file_format").toString.toUpperCase,
                longField(df, "record_count").getOrElse(0L), null)
            } else {
              require(fc == 1L,
                s"fromIcebergChangelog: snapshot ${s.id} added an " +
                  s"EQUALITY delete file (${df.get("file_path")}) — " +
                  "equality deletes cannot resolve to changelog rows; " +
                  "read full snapshots")
              outD += DeleteFileInfo(
                resolvePath(meta, df.get("file_path").toString),
                df.get("file_format").toString.toUpperCase,
                longField(df, "record_count").getOrElse(0L),
                longField(entry, "sequence_number").getOrElse(manifestSeq),
                Nil)
            }
          }
        }
      }
    }
    (outF.result(), outD.result())
  }

  /** CHANGELOG read — the Iceberg twin of [[DeltaLake.fromDeltaCdf]]:
    * row-level changes of the main-chain snapshots in
    * `(fromSnapshotId, toSnapshotId]`, tagged `_change_type`
    * (insert / delete), `_snapshot_id` and `_sequence_number`.
    *  - `append` snapshots deliver their added data files as inserts;
    *  - `delete` snapshots (merge-on-read position deletes) resolve
    *    their added delete files against the PARENT snapshot's live
    *    data files — exactly the rows the commit masked; rows already
    *    masked by the parent's own position deletes are excluded, so
    *    re-deleting delivers nothing new;
    *  - `overwrite` (the logical replace) delivers the parent's
    *    visible rows as deletes and the new state as inserts;
    *  - `replace` (compaction) delivers nothing;
    *  - equality-deleted history and unknown operations reject loudly.
    * Scale: manifests walk on the driver (metadata-bounded); each
    * snapshot contributes distributed scan branches; the delete
    * resolution is one (fid, pos) semi-join against the parent's live
    * files — never all-pairs, never driver-materialized rows. */
  def fromIcebergChangelog(spark: SparkSession, dir0: String,
      fromSnapshotId: Long = -1L,
      toSnapshotId: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.unsafe.types.UTF8String
    val dir = FsIO.normalize(dir0.stripSuffix("/"))
    val meta = loadMetadata(dir)
    meta.renameDrift.foreach(msg => throw new IllegalArgumentException(
      s"fromIcebergChangelog: table $dir has schema-evolution the " +
        s"name-based reader cannot honor ($msg)"))
    val out = StructType(meta.schema
      :+ StructField("_change_type", StringType, nullable = false)
      :+ StructField("_snapshot_id", LongType, nullable = false)
      :+ StructField("_sequence_number", LongType, nullable = false))
    def empty() = spark.createDataFrame(new java.util.ArrayList[Row](), out)
    val toId = toSnapshotId.getOrElse(meta.currentSnapshotId)
    if (toId < 0 || toId == fromSnapshotId) return empty()
    val chain = changesChain(meta, fromSnapshotId, toId)
    def tag(df: DataFrame, ct: String, s: SnapshotInfo): DataFrame =
      df.select(meta.schema.fieldNames.toIndexedSeq.map(col): _*)
        .withColumn("_change_type", lit(ct))
        .withColumn("_snapshot_id", lit(s.id))
        .withColumn("_sequence_number", lit(s.sequenceNumber))
    def insertsOf(files: Seq[DataFileInfo], s: SnapshotInfo): Seq[DataFrame] =
      if (files.isEmpty) Nil
      else Seq(tag(files.groupBy(_.format).toSeq.sortBy(_._1).map {
        case ("PARQUET", fs) =>
          spark.read.schema(meta.schema).parquet(fs.map(_.path): _*)
        case ("ORC", fs) =>
          spark.read.schema(meta.schema).orc(fs.map(_.path): _*)
        case (other, fs) => throw new IllegalArgumentException(
          s"unsupported Iceberg data file format $other (${fs.head.path})")
      }.reduce(_ union _), "insert", s))
    val frames = chain.flatMap { s =>
      val op = s.operation
      require(op != null,
        s"fromIcebergChangelog: snapshot ${s.id} of $dir carries no " +
          "summary.operation; read a full snapshot")
      op match {
        case "replace" => Nil
        case "append" => insertsOf(addedFilesAndDeletes(meta, s)._1, s)
        case "overwrite" if s.parentId < 0 => // initial commit
          insertsOf(addedFilesAndDeletes(meta, s)._1, s)
        case "overwrite" => // logical replace: old state out, new in
          Seq(tag(fromIceberg(spark, dir, Some(s.parentId)), "delete", s),
            tag(fromIceberg(spark, dir, Some(s.id)), "insert", s))
        case "delete" =>
          val (dAdds, dDels) = addedFilesAndDeletes(meta, s)
          val parent = meta.snapshots.find(_.id == s.parentId).getOrElse(
            throw new IllegalArgumentException(
              s"fromIcebergChangelog: snapshot ${s.id}'s parent " +
                s"${s.parentId} is expired; read a full snapshot"))
          val (pFiles, pDels) = liveFiles(meta, parent)
          require(pDels.forall(_.equalityIds.isEmpty),
            s"fromIcebergChangelog: snapshot ${parent.id} carries " +
              "equality deletes; read full snapshots")
          require(pFiles.forall(_.format == "PARQUET") &&
              (pDels ++ dDels).forall(_.format == "PARQUET"),
            "fromIcebergChangelog: parquet data/delete files only " +
              "(position resolution needs _metadata.row_index)")
          val ids = new java.util.HashMap[UTF8String, Integer]()
          pFiles.zipWithIndex.foreach { case (f, i) =>
            (Option(f.rawPath).toSeq ++ PathKeys.spellings(f.path))
              .foreach(sp => ids.put(UTF8String.fromString(sp),
                Integer.valueOf(i)))
          }
          val delSchema = StructType(Seq(
            StructField("file_path", StringType, nullable = false),
            StructField("pos", LongType, nullable = false)))
          def readDel(fs: Seq[DeleteFileInfo]): DataFrame =
            spark.read.schema(delSchema).parquet(fs.map(_.path): _*)
              .select(Bridge.column(PathId(Bridge.expression(
                col("file_path")), ids, strict = false)).as("__ice_fid"),
                col("pos").as("__ice_pos"))
          val data = spark.read.schema(meta.schema)
            .parquet(pFiles.map(_.path): _*)
            .select(meta.schema.fieldNames.toIndexedSeq.map(col) ++ Seq(
              Bridge.column(PathId(Bridge.expression(
                col("_metadata.file_path")), ids, strict = true))
                .as("__ice_fid"),
              col("_metadata.row_index").as("__ice_pos")): _*)
          var deleted = data.join(readDel(dDels),
            Seq("__ice_fid", "__ice_pos"), "left_semi")
          if (pDels.nonEmpty) // already-masked rows are not re-deleted
            deleted = deleted.join(readDel(pDels),
              Seq("__ice_fid", "__ice_pos"), "left_anti")
          Seq(tag(deleted, "delete", s)) ++ insertsOf(dAdds, s)
        case other => throw new IllegalArgumentException(
          s"fromIcebergChangelog: snapshot ${s.id} of $dir is a " +
            s"'$other' — unsupported operation; read a full snapshot")
      }
    }
    if (frames.isEmpty) empty() else frames.reduce(_ union _)
  }

  /** Expire all but the newest `retainLast` snapshots (the VACUUM
    * analog — Iceberg's expire_snapshots): a new metadata version
    * lists only the retained snapshots, then the data files,
    * manifests and manifest lists referenced ONLY by expired
    * snapshots are deleted. Fast-append sharing is handled by set
    * subtraction — a manifest re-listed by a retained snapshot
    * survives. `dryRun` (default) returns the would-delete paths and
    * touches nothing. Time travel to expired snapshot ids stops
    * working — that is the operation's contract. */
  def expireSnapshots(spark: SparkSession, dir0: String,
      retainLast: Int = 1, dryRun: Boolean = true): Seq[String] = {
    require(retainLast >= 1, "must retain at least one snapshot")
    val dir = FsIO.normalize(dir0.stripSuffix("/"))
    val meta = loadMetadata(dir)
    val ordered = meta.snapshots.sortBy(s => (s.sequenceNumber, s.timestampMs, s.id))
    val retained = ordered.takeRight(retainLast)
    val expired = ordered.dropRight(retainLast)
    require(meta.currentSnapshotId < 0 ||
        retained.exists(_.id == meta.currentSnapshotId),
      "expireSnapshots: the current snapshot must be retained")
    if (expired.isEmpty) return Nil
    // branch/tag refs (v2 `refs`) pin snapshots outside the retention
    // window; expiring a ref target would orphan the ref AND delete
    // its data — refuse loudly (real expire_snapshots keeps them)
    val metaJson = mapper.readTree(readAll(s"$dir/metadata/${meta.file}"))
    Option(metaJson.get("refs")).filter(_.isObject).foreach { r =>
      val retainedIds = retained.map(_.id).toSet
      val it = r.properties().iterator()
      while (it.hasNext) {
        val e = it.next()
        val sid = Option(e.getValue.get("snapshot-id")).map(_.asLong())
        sid.foreach(id => require(retainedIds.contains(id),
          s"expireSnapshots: ref '${e.getKey}' pins snapshot $id which " +
            "would be expired — drop the ref first or retain more snapshots"))
      }
    }

    final case class Refs(lists: Set[String], manifests: Set[String],
        data: Set[String])
    // fast-append re-lists prior manifests in every list: memoize the
    // per-manifest data-file sets or the sweep is O(N^2) avro reads
    val manifestData = mutable.Map.empty[String, Set[String]]
    def dataOf(m: String): Set[String] = manifestData.getOrElseUpdate(m, {
      val b = Set.newBuilder[String]
      eachAvro(m) { entry =>
        // DELETED entries still name on-disk files — collect ALL
        val df = entry.get("data_file").asInstanceOf[GenericRecord]
        if (df != null)
          b += FsIO.normalize(resolvePath(meta, df.get("file_path").toString))
      }
      b.result()
    })
    def refs(ss: Seq[SnapshotInfo]): Refs = {
      val lists = Set.newBuilder[String]
      val manifests = Set.newBuilder[String]
      val data = Set.newBuilder[String]
      ss.foreach { s =>
        val list = FsIO.normalize(resolvePath(meta, s.manifestList))
        lists += list
        eachAvro(list) { e =>
          val m = FsIO.normalize(resolvePath(meta, e.get("manifest_path").toString))
          manifests += m
          data ++= dataOf(m)
        }
      }
      Refs(lists.result(), manifests.result(), data.result())
    }
    val keep = refs(retained)
    val drop = refs(expired)
    val candidates = ((drop.lists -- keep.lists) ++
      (drop.manifests -- keep.manifests) ++
      (drop.data -- keep.data)).toSeq.sorted
    if (!dryRun) {
      // new metadata version with the retained snapshots only (the
      // SAME parsed document the keep/drop sets came from — no
      // re-read window for a concurrent commit to slip into)
      val mdir = s"$dir/metadata"
      val j = metaJson.deepCopy[JsonNode]().asInstanceOf[ObjectNode]
      val keepIds = retained.map(_.id).toSet
      def filterArray(name: String, idField: String): Unit = {
        val arr = j.get(name)
        if (arr != null && arr.isArray) {
          val out = mapper.createArrayNode()
          (0 until arr.size()).foreach { i =>
            val e = arr.get(i)
            if (e.hasNonNull(idField) && keepIds(e.get(idField).asLong()))
              out.add(e)
          }
          j.set[JsonNode](name, out)
        }
      }
      filterArray("snapshots", "snapshot-id")
      filterArray("snapshot-log", "snapshot-id")
      val version = meta.version + 1
      val mpath = f"$mdir/v$version%05d.metadata.json"
      require(!FsIO.exists(mpath),
        s"Iceberg metadata version $version already exists (concurrent writer?)")
      writeText(mpath,
        mapper.writerWithDefaultPrettyPrinter().writeValueAsString(j))
      writeHint(s"$mdir/version-hint.text", version.toString)
      candidates.foreach(FsIO.deleteRecursive)
    }
    candidates.map(_.stripPrefix(dir).stripPrefix("/"))
  }


  /** Latest metadata: `version-hint.text` if present, else the
    * highest-numbered `vN.metadata.json` / `NNNNN-uuid.metadata.json`
    * (the two public naming conventions). */
  private def loadMetadata(dir: String): Metadata = {
    val mdir = s"$dir/metadata"
    val names = FsIO.listFileNames(mdir)
    require(names.nonEmpty, s"not an Iceberg table (no metadata dir): $dir")
    val hint = s"$mdir/version-hint.text"
    val VRe = """^v(\d+)\.metadata\.json$""".r
    val NRe = """^(\d+)-[0-9a-fA-F-]+\.metadata\.json$""".r
    val byVersion = names.collect {
      case n @ VRe(v) => (v.toInt, n)
      case n @ NRe(v) => (v.toInt, n)
    }
    // an EMPTY hint is a foreign writer's non-atomic rewrite caught
    // mid-truncate (ours renames) — fall back to the newest metadata
    // file; a non-empty unparsable hint stays loud (structural damage)
    val hintV: Option[Int] =
      if (!FsIO.exists(hint)) None
      else readAll(hint).trim match {
        case "" => None
        case s => Some(s.toInt)
      }
    val (version, file) = hintV match {
      case Some(v) =>
        (v, byVersion.find(_._1 == v).map(_._2).getOrElse(
          throw new IllegalArgumentException(
            s"version-hint.text says $v but no matching metadata file in $mdir")))
      case None =>
        require(byVersion.nonEmpty, s"no *.metadata.json files in $mdir")
        byVersion.maxBy(_._1)
    }
    val j = mapper.readTree(readAll(s"$mdir/$file"))
    val fv = j.get("format-version").asInt()
    require(fv == 1 || fv == 2, s"unsupported Iceberg format-version $fv")
    // current schema: v2 schemas[current-schema-id]; v1 fallback "schema"
    val schemaNode: JsonNode =
      if (j.hasNonNull("schemas")) {
        val cur = j.get("current-schema-id").asInt()
        val arr = j.get("schemas")
        (0 until arr.size()).map(arr.get)
          .find(s => s.get("schema-id").asInt() == cur)
          .getOrElse(throw new IllegalArgumentException(
            s"current-schema-id $cur not found in schemas"))
      } else j.get("schema")
    require(schemaNode != null, s"metadata has no schema: $mdir/$file")
    val snaps = Option(j.get("snapshots")).filter(_.isArray).map { arr =>
      (0 until arr.size()).map { i =>
        val s = arr.get(i)
        SnapshotInfo(
          s.get("snapshot-id").asLong(),
          Option(s.get("sequence-number")).map(_.asLong()).getOrElse(0L),
          Option(s.get("timestamp-ms")).map(_.asLong()).getOrElse(0L),
          s.get("manifest-list").asText(),
          Option(s.get("summary")).flatMap(sm =>
            Option(sm.get("operation")).map(_.asText())).orNull,
          Option(s.get("parent-snapshot-id")).map(_.asLong()).getOrElse(-1L))
      }.toSeq
    }.getOrElse(Nil)
    // Rename-drift detection (driver-side, zero I/O): the spec
    // resolves data-file columns by FIELD ID, but we read by NAME —
    // sound only while every schema the table has ever had agrees on
    // id<->name. The metadata keeps the full schema history, so a
    // rename (one id, two names: old files carry the old physical
    // name -> would read as silent NULLs) or a name reuse (one name,
    // two ids: old files would read the WRONG column) is visible
    // here. Recorded on Metadata; the data-read path throws,
    // metadata-only ops (snapshots/expire) still work.
    val renameDrift: Option[String] =
      if (!j.hasNonNull("schemas")) None
      else {
        val idNames = scala.collection.mutable.Map.empty[Int, scala.collection.mutable.Set[String]]
        val nameIds = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Set[Int]]
        def walk(structNode: JsonNode, prefix: String): Unit = {
          val fs = structNode.get("fields")
          if (fs != null) (0 until fs.size()).foreach { i =>
            val f = fs.get(i)
            val nm = prefix + f.get("name").asText()
            val id = f.get("id").asInt()
            idNames.getOrElseUpdate(id, scala.collection.mutable.Set.empty) += nm
            nameIds.getOrElseUpdate(nm, scala.collection.mutable.Set.empty) += id
            val t = f.get("type")
            if (t != null && t.isObject &&
                t.hasNonNull("type") && t.get("type").asText() == "struct")
              walk(t, nm + ".")
          }
        }
        val arr = j.get("schemas")
        (0 until arr.size()).foreach(i => walk(arr.get(i), ""))
        val renamed = idNames.collectFirst { case (id, ns) if ns.size > 1 =>
          s"field id $id has carried names ${ns.toSeq.sorted.mkString("/")}" }
        val reused = nameIds.collectFirst { case (nm, ids) if ids.size > 1 =>
          s"name '$nm' has identified field ids ${ids.toSeq.sorted.mkString("/")}" }
        renamed.orElse(reused)
      }
    Metadata(dir, fv,
      Option(j.get("location")).map(_.asText()).getOrElse(dir),
      Option(j.get("last-column-id")).map(_.asInt()).getOrElse(0),
      icebergToSpark(schemaNode), schemaNode, snaps,
      Option(j.get("current-snapshot-id")).map(_.asLong()).getOrElse(-1L),
      Option(j.get("last-sequence-number")).map(_.asLong()).getOrElse(0L),
      version,
      Option(j.get("table-uuid")).map(_.asText())
        .getOrElse(java.util.UUID.randomUUID().toString),
      file, renameDrift)
  }

  /** Walk manifest list -> manifests -> live data files (with their
    * bounds rendered as Delta-shaped stats JSON for skipping). */
  private def liveFiles(meta: Metadata, snap: SnapshotInfo,
      withStats: Boolean = false): (Seq[DataFileInfo], Seq[DeleteFileInfo]) = {
    lazy val fieldsById: Map[Int, StructField] = {
      val fs = meta.schemaNode.get("fields")
      (0 until fs.size()).flatMap { i =>
        val f = fs.get(i)
        val name = f.get("name").asText()
        meta.schema.find(_.name == name)
          .filter(sf => IcebergBounds.statEligible(sf.dataType))
          .map(sf => f.get("id").asInt() -> sf)
      }.toMap
    }
    val out = Seq.newBuilder[DataFileInfo]
    val dels = Seq.newBuilder[DeleteFileInfo]
    eachAvro(resolvePath(meta, snap.manifestList)) { e =>
      val content = longField(e, "content").getOrElse(0L)
      require(content == 0L || content == 1L,
        s"unknown manifest content $content in snapshot ${snap.id}: " +
          s"${e.get("manifest_path")}")
      val mpath = e.get("manifest_path").toString
      // v2 sequence inheritance: an entry with a null sequence_number
      // (status ADDED) inherits the manifest's own sequence number
      // from the list entry; v1 has neither (0 everywhere)
      val manifestSeq = longField(e, "sequence_number").getOrElse(0L)
      eachAvro(resolvePath(meta, mpath)) { entry =>
        val status = longField(entry, "status").getOrElse(0L)
        if (status != 2L) { // 2 = DELETED
          val df = entry.get("data_file").asInstanceOf[GenericRecord]
          require(df != null, s"manifest entry without data_file in $mpath")
          val seq = longField(entry, "sequence_number").getOrElse(manifestSeq)
          val fc = longField(df, "content").getOrElse(0L)
          if (content == 1L) {
            // delete manifest: POSITION deletes (content=1) apply by
            // exact (file_path, pos) — sequence numbers unnecessary
            // (a rewritten data file has a NEW path, stale deletes
            // match nothing); EQUALITY deletes (content=2) carry
            // their equality field-id set and apply with strict
            // sequence scoping in fromIceberg.
            require(fc == 1L || fc == 2L,
              s"unknown delete-file content $fc in $mpath: " +
                s"${df.get("file_path")}")
            val eqIds: Seq[Int] =
              if (fc != 2L) Nil
              // absent FIELD (foreign minimal schema) and null VALUE
              // both mean an unusable equality delete — loud either
              // way (Record.get(String) THROWS on unknown fields)
              else (if (df.getSchema.getField("equality_ids") == null) null
                    else df.get("equality_ids")) match {
                case null => throw new IllegalArgumentException(
                  s"equality delete without equality_ids in $mpath: " +
                    s"${df.get("file_path")}")
                case l: java.util.List[_] =>
                  require(!l.isEmpty,
                    s"equality delete with EMPTY equality_ids in $mpath: " +
                      s"${df.get("file_path")}")
                  scala.jdk.CollectionConverters.ListHasAsScala(l)
                    .asScala.map {
                      case i: java.lang.Integer => i.intValue()
                      case x: java.lang.Long => x.intValue()
                      case other => throw new IllegalArgumentException(
                        s"bad equality_ids entry $other in $mpath")
                    }.toSeq
                case other => throw new IllegalArgumentException(
                  s"bad equality_ids $other in $mpath")
              }
            dels += DeleteFileInfo(
              resolvePath(meta, df.get("file_path").toString),
              df.get("file_format").toString.toUpperCase,
              longField(df, "record_count").getOrElse(0L),
              seq, eqIds)
          } else {
            require(fc == 0L,
              s"delete FILE in data manifest $mpath: ${df.get("file_path")}")
            val raw = df.get("file_path").toString
            out += DataFileInfo(
              resolvePath(meta, raw),
              df.get("file_format").toString.toUpperCase,
              longField(df, "record_count").getOrElse(0L),
              // bounds decoding + JSON rendering only when a predicate
              // will consume it (plain reads skip the per-file work)
              if (withStats) IcebergBounds.statsJsonFor(df, fieldsById) else null,
              rawPath = raw, seq = seq,
              // the partition tuple rides along for delete commits —
              // copied through verbatim, transform-agnostic
              partition = if (df.getSchema.getField("partition") == null) null
                else df.get("partition").asInstanceOf[GenericRecord])
          }
        }
      }
    }
    (out.result(), dels.result())
  }

  /** int-or-long Avro field as Long (spec fields vary by writer). */
  private def longField(r: GenericRecord, name: String): Option[Long] =
    if (r.getSchema.getField(name) == null) None
    else r.get(name) match {
      case null => None
      case i: java.lang.Integer => Some(i.longValue())
      case l: java.lang.Long => Some(l.longValue())
      case other => throw new IllegalArgumentException(
        s"manifest field $name has non-integer value $other")
    }

  /** Manifest paths are absolute URIs in the wild; resolve file: and
    * schemeless forms, fall back to table-location-relative. */
  private def resolvePath(meta: Metadata, p: String): String = {
    val u = try new java.net.URI(p) catch {
      case _: java.net.URISyntaxException => null
    }
    if (u != null && u.isAbsolute) new org.apache.hadoop.fs.Path(u).toString
    else if (p.startsWith("/")) p
    else s"${meta.dir}/$p"
  }

  private def eachAvro(path: String)(f: GenericRecord => Unit): Unit = {
    val in = new Avro.HadoopSeekableInput(path)
    val reader = try new DataFileReader(in, new GenericDatumReader[GenericRecord]())
    catch { case e: Throwable => in.close(); throw e }
    try { while (reader.hasNext) f(reader.next()) }
    finally reader.close()
  }

  private def readAll(path: String): String = {
    val in = FsIO.open(path)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  // ------------------------------------------------------------------
  // Schema mapping (Iceberg JSON <-> Spark)
  // ------------------------------------------------------------------

  private val DecimalRe = """^decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)$""".r
  private val FixedRe = """^fixed\[(\d+)\]$""".r

  private[graft] def icebergToSpark(node: JsonNode): StructType = {
    def typ(t: JsonNode, ctx: String): DataType =
      if (t.isTextual) t.asText() match {
        case "boolean" => BooleanType
        case "int" => IntegerType
        case "long" => LongType
        case "float" => FloatType
        case "double" => DoubleType
        case "date" => DateType
        case "timestamp" => TimestampNTZType // without zone
        case "timestamptz" => TimestampType
        case "string" => StringType
        case "binary" => BinaryType
        case DecimalRe(p, s) => DecimalType(p.toInt, s.toInt)
        case FixedRe(_) => BinaryType
        case other => throw new IllegalArgumentException(
          s"unsupported Iceberg type $other at $ctx")
      } else t.get("type").asText() match {
        case "struct" => struct(t, ctx)
        case "list" =>
          ArrayType(typ(t.get("element"), s"$ctx.element"),
            containsNull = !t.get("element-required").asBoolean(false))
        case other => throw new IllegalArgumentException(
          s"unsupported Iceberg nested type $other at $ctx")
      }
    def struct(t: JsonNode, ctx: String): StructType = {
      val fields = t.get("fields")
      StructType((0 until fields.size()).map { i =>
        val f = fields.get(i)
        val name = f.get("name").asText()
        StructField(name, typ(f.get("type"), s"$ctx.$name"),
          nullable = !f.get("required").asBoolean(false))
      })
    }
    struct(node, "schema")
  }

  /** Spark -> Iceberg schema JSON with sequential field-ids (unique
    * across the whole tree, as the spec requires). Returns
    * (schemaNode, lastColumnId). */
  private[graft] def sparkToIceberg(st: StructType,
      startId: Int = 0): (ObjectNode, Int) = {
    var nextId = startId
    def id(): Int = { nextId += 1; nextId }
    def typJson(dt: DataType, ctx: String): Any = dt match {
      case BooleanType => "boolean"
      case IntegerType | ShortType | ByteType => "int"
      case LongType => "long"
      case FloatType => "float"
      case DoubleType => "double"
      case DateType => "date"
      case TimestampNTZType => "timestamp"
      case TimestampType => "timestamptz"
      case StringType => "string"
      case BinaryType => "binary"
      case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
      case s: StructType => structJson(s, ctx)
      case a: ArrayType =>
        val n = mapper.createObjectNode()
        n.put("type", "list")
        n.put("element-id", id())
        n.put("element-required", !a.containsNull)
        typJson(a.elementType, s"$ctx.element") match {
          case s: String => n.put("element", s)
          case o: ObjectNode => n.set[JsonNode]("element", o)
        }
        n
      case other => throw new IllegalArgumentException(
        s"toIceberg: unsupported Spark type ${other.simpleString} at $ctx")
    }
    def structJson(s: StructType, ctx: String): ObjectNode = {
      val n = mapper.createObjectNode()
      n.put("type", "struct")
      val fs = n.putArray("fields")
      s.foreach { f =>
        val fn = mapper.createObjectNode()
        fn.put("id", id())
        fn.put("name", f.name)
        fn.put("required", !f.nullable)
        typJson(f.dataType, s"$ctx.${f.name}") match {
          case str: String => fn.put("type", str)
          case o: ObjectNode => fn.set[JsonNode]("type", o)
        }
        fs.add(fn)
      }
      n
    }
    val root = structJson(st, "schema")
    root.put("schema-id", 0)
    (root, nextId)
  }

  // ------------------------------------------------------------------
  // Write path (v2, unpartitioned, copy-on-write)
  // ------------------------------------------------------------------

  private val ManifestEntrySchemaJson: String = (
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int","field-id":0},
      |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
      |{"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
      |{"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
      |  {"name":"content","type":"int","field-id":134},
      |  {"name":"file_path","type":"string","field-id":100},
      |  {"name":"file_format","type":"string","field-id":101},
      |  {"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[]}},
      |  {"name":"record_count","type":"long","field-id":103},
      |  {"name":"file_size_in_bytes","type":"long","field-id":104},
      |  {"name":"value_counts","field-id":109,"default":null,"type":["null",
      |    {"type":"array","logicalType":"map","items":{"type":"record","name":"k119_v120","fields":[
      |      {"name":"key","type":"int","field-id":119},{"name":"value","type":"long","field-id":120}]}}]},
      |  {"name":"null_value_counts","field-id":110,"default":null,"type":["null",
      |    {"type":"array","logicalType":"map","items":{"type":"record","name":"k121_v122","fields":[
      |      {"name":"key","type":"int","field-id":121},{"name":"value","type":"long","field-id":122}]}}]},
      |  {"name":"nan_value_counts","field-id":137,"default":null,"type":["null",
      |    {"type":"array","logicalType":"map","items":{"type":"record","name":"k138_v139","fields":[
      |      {"name":"key","type":"int","field-id":138},{"name":"value","type":"long","field-id":139}]}}]},
      |  {"name":"lower_bounds","field-id":125,"default":null,"type":["null",
      |    {"type":"array","logicalType":"map","items":{"type":"record","name":"k126_v127","fields":[
      |      {"name":"key","type":"int","field-id":126},{"name":"value","type":"bytes","field-id":127}]}}]},
      |  {"name":"upper_bounds","field-id":128,"default":null,"type":["null",
      |    {"type":"array","logicalType":"map","items":{"type":"record","name":"k129_v130","fields":[
      |      {"name":"key","type":"int","field-id":129},{"name":"value","type":"bytes","field-id":130}]}}]},
      |  {"name":"equality_ids","field-id":135,"default":null,
      |    "type":["null",{"type":"array","items":"int","element-id":136}]}
      |]}}]}""".stripMargin.replace("\n", ""))

  private val ManifestEntrySchema: ASchema =
    new ASchema.Parser().parse(ManifestEntrySchemaJson)

  /** Manifest entry schema whose `data_file.partition` record carries
    * the given avro record json (the spec's per-partition-field
    * declarations, field-ids included) — unpartitioned manifests keep
    * the shared empty-record schema. Spliced on the RAW json template
    * (the parsed schema's toString would re-order custom props). */
  private def manifestEntrySchemaFor(partitionRecordJson: String): ASchema =
    if (partitionRecordJson == null) ManifestEntrySchema
    else new ASchema.Parser().parse(ManifestEntrySchemaJson.replace(
      """{"type":"record","name":"r102","fields":[]}""", partitionRecordJson))

  /** Avro record json for a partition tuple over `fields`
    * (name, spec field-id, transform RESULT Spark type — identity
    * mirrors the source, temporal/bucket transforms land here as
    * int/date). Result types outside the supported set are loud. */
  private def partitionRecordJson(
      fields: Seq[(String, Int, DataType)]): String = {
    def avroType(dt: DataType): String = dt match {
      case IntegerType => "\"int\""
      case LongType => "\"long\""
      case StringType => "\"string\""
      case BooleanType => "\"boolean\""
      case DateType => """{"type":"int","logicalType":"date"}"""
      case other => throw new IllegalArgumentException(
        "toIceberg: partition tuple value of type " + other.catalogString +
          " is unsupported (int/long/string/boolean/date only)")
    }
    fields.map { case (n, fid, dt) =>
      require(n.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"toIceberg: partition column '$n' is not a legal avro name")
      s"""{"name":"$n","type":["null",${avroType(dt)}],"default":null,"field-id":$fid}"""
    }.mkString("""{"type":"record","name":"r102","fields":[""", ",", "]}")
  }

  /** One partition field of a spec: the SPEC's field name (display
    * only — independent of source column names; a foreign rename
    * leaves old spec names behind), the transform string ("identity",
    * "year", "month", "day", "hour", "bucket[N]", "truncate[W]"),
    * the source column's CURRENT logical name (resolved through
    * source-id, never by spec name), its schema id, and the spec
    * field id. */
  private final case class PartField(name: String, transform: String,
      sourceCol: String, sourceId: Int, fieldId: Int)

  private val BucketTf = """bucket\[(\d+)\]""".r
  private val TruncTf = """truncate\[(\d+)\]""".r
  private val TemporalTfs = Set("year", "month", "day", "hour")

  private def fmtSpecField(f: PartField): String = f.transform match {
    case "identity" => f.sourceCol
    case BucketTf(n) => s"bucket($n, ${f.sourceCol})"
    case TruncTf(w) => s"truncate($w, ${f.sourceCol})"
    case tf => s"$tf(${f.sourceCol})"
  }

  /** (default spec fields, default-spec-id) in ONE metadata read —
    * toIceberg needs both and must not re-parse per use. Source
    * columns resolve through source-id against the CURRENT schema
    * (spec field names are display-only and survive source renames);
    * transforms outside the supported set are loud — a write against
    * such a table would mis-declare its manifests. */
  private def defaultSpecFieldsAndId(dir: String,
      meta: Metadata): (Seq[PartField], Int) = {
    val mj = mapper.readTree(readAll(s"$dir/metadata/${meta.file}"))
    val v1Spec = Option(mj.get("partition-spec")).filter(_.isArray)
    val defaultSpec = Option(mj.get("default-spec-id")).map(_.asInt()).getOrElse(0)
    val nameById: Map[Int, String] = {
      val fs = meta.schemaNode.get("fields")
      (0 until fs.size()).map(i =>
        fs.get(i).get("id").asInt() -> fs.get(i).get("name").asText()).toMap
    }
    val fields: Option[JsonNode] =
      Option(mj.get("partition-specs")).filter(_.isArray).flatMap { arr =>
        (0 until arr.size()).map(arr.get)
          .find(sp => Option(sp.get("spec-id")).exists(_.asInt() == defaultSpec))
          .flatMap(sp => Option(sp.get("fields")))
      }.orElse(v1Spec)
    (fields.toSeq.flatMap { fs =>
      (0 until fs.size()).map { i =>
        val f = fs.get(i)
        val transform = f.get("transform").asText()
        // `void` appears when a v1 spec evolution DROPS a partition
        // field (the slot stays, always-null) — supported: the
        // staging column is a null literal, tuples record null
        require(transform == "identity" || transform == "void" ||
            TemporalTfs(transform) ||
            BucketTf.pattern.matcher(transform).matches() ||
            TruncTf.pattern.matcher(transform).matches(),
          s"table $dir partitions by transform '$transform' — writes " +
            "support identity/void/year/month/day/hour/bucket[N]/truncate[W]")
        val sid = f.get("source-id").asInt()
        val src = nameById.getOrElse(sid, throw new IllegalArgumentException(
          s"table $dir: partition spec field '${f.get("name").asText()}' " +
            s"sources schema id $sid, absent from the current schema"))
        PartField(f.get("name").asText(), transform, src, sid,
          Option(f.get("field-id")).map(_.asInt()).getOrElse(1000 + i))
      }
    }, defaultSpec)
  }

  private val PbTemporal = """(year|month|day|hour|void)\(\s*([^\s(),]+)\s*\)""".r
  private val PbBucket = """bucket\(\s*(\d+)\s*,\s*([^\s(),]+)\s*\)""".r
  private val PbTrunc = """truncate\(\s*(\d+)\s*,\s*([^\s(),]+)\s*\)""".r

  /** Parse one user partitionBy entry into (transform, source column):
    * a bare column name is identity; `year(ts)`/`month(ts)`/`day(ts)`/
    * `hour(ts)`, `bucket(16, id)` and `truncate(4, name)` are the
    * spec's transforms. */
  private def parsePartitionEntry(s: String): (String, String) = s.trim match {
    case PbTemporal(tf, c) => (tf, c)
    case PbBucket(n, c) =>
      require(n.toInt > 0, s"toIceberg: bucket($n, $c): N must be positive")
      (s"bucket[$n]", c)
    case PbTrunc(w, c) =>
      require(w.toInt > 0, s"toIceberg: truncate($w, $c): W must be positive")
      (s"truncate[$w]", c)
    case c =>
      require(c.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"toIceberg: cannot parse partition field '$s' (expected a " +
          "column name, year/month/day/hour(col), bucket(N, col) or " +
          "truncate(W, col))")
      ("identity", c)
  }

  /** Conventional spec field name for a transform (the Java
    * implementation's generated names). */
  private def specFieldName(tf: String, c: String): String = tf match {
    case "identity" => c
    case BucketTf(_) => s"${c}_bucket"
    case TruncTf(_) => s"${c}_trunc"
    case t => s"${c}_$t"
  }

  /** Spark type of a transform's RESULT — the partition tuple's value
    * domain: temporal counts and buckets are ints (`day` renders as a
    * date per the spec), truncate/identity mirror the source. */
  private def transformResultType(tf: String, src: DataType): DataType =
    tf match {
      case "identity" => src
      case "void" => IntegerType // always-null; the type is nominal
      case "day" => DateType
      case "year" | "month" | "hour" => IntegerType
      case BucketTf(_) => IntegerType
      case TruncTf(_) => src
      case other => throw new IllegalArgumentException(
        s"unsupported partition transform $other")
    }

  /** The staging Column computing transform `tf` over source field
    * `f`. TimestampType goes through exact epoch-micros math on the
    * UTC instant ([[IcebergMicrosField]] — Spark's calendar functions
    * render in the SESSION zone, which is not the transform's
    * domain); dates and NTZ timestamps use naive calendar functions;
    * `bucket` hashes per the spec's Appendix B
    * ([[IcebergTransforms]]). Unsupported (transform, source-type)
    * pairs are loud. */
  private def transformColumn(tf: String,
      f: StructField): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val c = col(f.name)
    def bad(): Nothing = throw new IllegalArgumentException(
      s"toIceberg: transform $tf over ${f.dataType.catalogString} " +
        s"column ${f.name} is unsupported")
    val epoch = to_date(lit("1970-01-01"))
    def mfield(unit: Int) = Bridge.column(IcebergMicrosField(
      Bridge.expression(unix_micros(c)), unit))
    tf match {
      case "identity" => c
      case "void" => lit(null).cast(IntegerType)
      case "year" => f.dataType match {
        case DateType | TimestampNTZType => year(c) - 1970
        case TimestampType => mfield(0)
        case _ => bad()
      }
      case "month" => f.dataType match {
        case DateType | TimestampNTZType =>
          (year(c) - 1970) * 12 + month(c) - 1
        case TimestampType => mfield(1)
        case _ => bad()
      }
      case "day" => f.dataType match {
        case DateType => c
        case TimestampNTZType => c.cast(DateType)
        case TimestampType => date_add(epoch, mfield(2))
        case _ => bad()
      }
      case "hour" => f.dataType match {
        case TimestampNTZType =>
          datediff(c.cast(DateType), epoch) * 24 + hour(c)
        case TimestampType => mfield(3)
        case _ => bad()
      }
      case BucketTf(n0) =>
        val n = n0.toInt
        f.dataType match {
          case IntegerType | LongType => Bridge.column(
            IcebergBucketLong(Bridge.expression(c.cast(LongType)), n))
          case DateType => Bridge.column(IcebergBucketLong(
            Bridge.expression(datediff(c, epoch).cast(LongType)), n))
          case TimestampType => Bridge.column(
            IcebergBucketLong(Bridge.expression(unix_micros(c)), n))
          case StringType => Bridge.column(
            IcebergBucketUtf8(Bridge.expression(c), n))
          case _ => bad()
        }
      case TruncTf(w0) =>
        val w = w0.toInt
        f.dataType match {
          case IntegerType => c - pmod(c, lit(w))
          case LongType => c - pmod(c, lit(w.toLong))
          case StringType => substring(c, 1, w)
          case _ => bad()
        }
      case _ => bad()
    }
  }

  private val ManifestFileSchema: ASchema = new ASchema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"partition_spec_id","type":"int","field-id":502},
      |{"name":"content","type":"int","field-id":517},
      |{"name":"sequence_number","type":"long","field-id":515},
      |{"name":"min_sequence_number","type":"long","field-id":516},
      |{"name":"added_snapshot_id","type":"long","field-id":503},
      |{"name":"added_files_count","type":"int","field-id":504},
      |{"name":"existing_files_count","type":"int","field-id":505},
      |{"name":"deleted_files_count","type":"int","field-id":506},
      |{"name":"added_rows_count","type":"long","field-id":512},
      |{"name":"existing_rows_count","type":"long","field-id":513},
      |{"name":"deleted_rows_count","type":"long","field-id":514}
      |]}""".stripMargin.replace("\n", ""))

  /** Write `df` as an Iceberg v2 commit. `mode`: "overwrite" or
    * "append" — append fast-appends a new manifest and re-lists the
    * prior snapshot's manifests verbatim; old snapshots stay readable
    * by id. `partitionBy` entries: bare column names (identity) or
    * the spec's transforms — `year(c)`/`month(c)`/`day(c)`/`hour(c)`,
    * `bucket(N, c)`, `truncate(W, c)`; appends validate against the
    * table's default spec by (transform, source-id-resolved column)
    * and reuse its field ids and display names. */
  def toIceberg(df: DataFrame, dir0: String, mode: String = "overwrite",
      partitionBy: Seq[String] = Nil): Unit = {
    // Partitioned writes: identity, temporal (year/month/day/hour),
    // bucket[N] and truncate[W] transforms. Iceberg data files CONTAIN
    // their partition source columns, so staging derives each
    // transform value into a __gpt_* column for the directory split
    // and keeps the sources in the file; manifest entries carry the
    // typed partition tuple (the transform's RESULT domain) and the
    // metadata json the spec with its transform strings.
    val parsedPb: Seq[(String, String)] = partitionBy.map(parsePartitionEntry)
    parsedPb.foreach { case (tf, c) =>
      require(df.schema.fieldNames.contains(c),
        s"toIceberg: partition source column $c (transform $tf) " +
          "missing from the data schema") }
    require(parsedPb.distinct == parsedPb,
      s"toIceberg: duplicate partition fields in ${partitionBy.mkString(",")}")
    // normalized: the paths stored in manifests must be absolute, and
    // staging-prefix arithmetic must match the listing output
    val dir = FsIO.normalize(dir0.stripSuffix("/"))
    require(mode == "overwrite" || mode == "append",
      s"toIceberg: mode must be overwrite|append, got $mode")
    val spark = df.sparkSession
    val existing: Option[Metadata] =
      if (FsIO.exists(s"$dir/metadata") &&
          FsIO.listFileNames(s"$dir/metadata").exists(_.endsWith(".metadata.json")))
        Some(loadMetadata(dir))
      else None
    // ONE metadata parse per append serves the schema check, the spec
    // fields and the declared spec id (object stores bill per GET)
    val exSpecInfo: Option[(Seq[PartField], Int)] =
      existing.map(m => defaultSpecFieldsAndId(dir, m))
    existing.foreach { m =>
      if (relaxed(m.schema) != relaxed(df.schema))
        require(mode == "append" &&
            evolutionNewFields(m.schema, df.schema).isDefined,
          s"toIceberg: schema mismatch with existing table $dir (appends " +
            "may only ADD new columns after the table's own fields)\n" +
            s"  table: ${m.schema.simpleString}\n" +
            s"  data:  ${df.schema.simpleString}")
      // spec fields match by (transform, source column resolved
      // through source-id) — spec field NAMES are display-only and a
      // foreign column rename legally leaves them stale
      val exSpec = exSpecInfo.get._1
      require(exSpec.map(f => (f.transform, f.sourceCol)) == parsedPb,
        s"toIceberg: partitionBy [${partitionBy.mkString(",")}] != " +
          s"table's default spec [${exSpec.map(fmtSpecField).mkString(",")}]" +
          " (matched by transform + source column; spec field names " +
          "are independent of source column names)")
    }
    val now = System.currentTimeMillis()
    val snapshotId = math.abs(java.util.UUID.randomUUID()
      .getMostSignificantBits) max 1L
    val seq = existing.map(_.lastSequenceNumber + 1).getOrElse(1L)
    val mdir = s"$dir/metadata"
    FsIO.mkdirs(mdir)

    val (schemaNode, lastCol) = existing match {
      case Some(m) if relaxed(m.schema) != relaxed(df.schema) =>
        // append-time schema evolution (validated above): extend the
        // table schema with the new columns at FRESH ids above
        // last-column-id; they record as optional regardless of the
        // data's nullability — every pre-evolution file lacks them
        // and reads them as null
        val newFs = evolutionNewFields(m.schema, df.schema).get
          .map(_.copy(nullable = true))
        val node = m.schemaNode.deepCopy[JsonNode]().asInstanceOf[ObjectNode]
        val (tmp, newLast) =
          sparkToIceberg(StructType(newFs), m.lastColumnId)
        val dst = node.get("fields").asInstanceOf[ArrayNode]
        val src = tmp.get("fields")
        (0 until src.size()).foreach(i => dst.add(src.get(i)))
        (node, newLast)
      case Some(m) =>
        (m.schemaNode.deepCopy[JsonNode]().asInstanceOf[ObjectNode],
          m.lastColumnId)
      case None => sparkToIceberg(df.schema)
    }
    // v1 metadata carries a bare "schema" node without schema-id; the
    // v2 form we write back requires one
    if (!schemaNode.hasNonNull("schema-id")) schemaNode.put("schema-id", 0)
    val idsByName: Map[String, Int] = {
      val fs = schemaNode.get("fields")
      (0 until fs.size()).map(i =>
        fs.get(i).get("name").asText() -> fs.get(i).get("id").asInt()).toMap
    }
    // spec fields: from the EXISTING default spec when one exists
    // (ids never re-minted; covers specs whose display names differ
    // from source columns); minted with the 1000+k convention on
    // creation. The manifest + list entry must declare the table's
    // DEFAULT spec id — a foreign table whose spec evolved (spec 0
    // empty, spec 1 live) resolves partition tuples by this id.
    val (specFields: Seq[PartField], specId: Int) = exSpecInfo match {
      case Some((fields, id)) => (fields, id)
      case None => (parsedPb.zipWithIndex.map { case ((tf, c), k) =>
        PartField(specFieldName(tf, c), tf, c, idsByName(c), 1000 + k) }, 0)
    }
    require(specFields.map(_.name).distinct.size == specFields.size,
      s"toIceberg: partition spec field names collide: " +
        specFields.map(_.name).mkString(","))
    def resultTypeOf(pf: PartField): DataType =
      transformResultType(pf.transform, df.schema(pf.sourceCol).dataType)
    // fail BEFORE staging: every transform must compute over its
    // source type and land in a tuple-representable value domain
    specFields.foreach { pf =>
      transformColumn(pf.transform, df.schema(pf.sourceCol))
      val rt = resultTypeOf(pf)
      require(rt == IntegerType || rt == LongType || rt == StringType ||
          rt == BooleanType || rt == DateType,
        s"toIceberg: partition over ${rt.catalogString} values is " +
          s"unsupported (field ${pf.name}; int/long/string/boolean/date " +
          "tuple values only)")
    }

    // stage + promote data files (the DeltaLake discipline).
    // Partitioned: the writer splits directories on __gpt_* columns
    // holding the TRANSFORM VALUES, so the data files keep the source
    // columns (Iceberg data files contain their partition sources);
    // hive-escaped dir values become the manifest partition tuples.
    val staging = s"$dir/_staging"
    FsIO.deleteRecursive(staging)
    val stageDf = specFields.foldLeft(df)((d, pf) => d.withColumn(
      s"__gpt_${pf.name}",
      transformColumn(pf.transform, df.schema(pf.sourceCol))))
    // hive staging writes BOTH null and '' partition values to
    // __HIVE_DEFAULT_PARTITION__; an empty-string value would come
    // back as a NULL manifest tuple, and a foreign reader pruning on
    // (field = '') would skip the file — reject before writing
    val strFields = specFields.filter(pf => resultTypeOf(pf) == StringType)
    if (strFields.nonEmpty) {
      import org.apache.spark.sql.functions.col
      val cond = strFields.map(pf =>
        col(s"__gpt_${pf.name}") === "").reduce(_ || _)
      require(stageDf.filter(cond).isEmpty,
        "toIceberg: empty-string value in string partition field(s) " +
          strFields.map(_.name).mkString(",") + " — the hive staging " +
          "layout cannot distinguish '' from null, which would " +
          "mis-declare the manifest partition tuple (filter or remap " +
          "empty strings first)")
    }
    val w0 = stageDf.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
    (if (specFields.isEmpty) w0
     else w0.partitionBy(specFields.map("__gpt_" + _.name): _*)).parquet(staging)
    val dataFiles: Seq[(String, Long, Seq[String])] =
      FsIO.listFilesRecursive(staging).collect {
        case (p, len, _) if p.endsWith(".parquet") =>
          val name = p.substring(p.lastIndexOf('/') + 1)
          val rel = p.stripPrefix(staging).stripPrefix("/")
          val dirSegs = rel.split('/').toSeq.dropRight(1)
          require(dirSegs.length == specFields.length,
            s"toIceberg: staged file $rel has ${dirSegs.length} partition " +
              s"dirs, expected ${specFields.length}")
          val rawVals = specFields.zip(dirSegs).map { case (pf, seg) =>
            require(seg.startsWith(s"__gpt_${pf.name}="),
              s"toIceberg: unexpected staging dir $seg (expected __gpt_${pf.name}=)")
            seg.drop(s"__gpt_${pf.name}=".length)
          }
          // promote under data/<field>=<v>/ (the conventional layout;
          // the manifest path is authoritative either way)
          val outDir = (Seq("data") ++ specFields.zip(rawVals).map {
            case (pf, v) => s"${pf.name}=$v" }).mkString("/")
          val dst = s"$dir/$outDir/$name"
          FsIO.rename(p, dst)
          (dst, len, rawVals)
      }
    FsIO.deleteRecursive(staging)
    // ONE distributed footer pass per file gives record counts AND
    // typed column bounds (DeltaStats.footerStats — the same stats
    // machinery as the Delta sink)
    val statCols = df.schema.filter(f =>
      IcebergBounds.statEligible(f.dataType)).map(_.name)
    val counted: Seq[(String, Long, DeltaStats.FileColStats, Seq[String])] =
      if (dataFiles.isEmpty) Nil
      else {
        val sc = spark.sparkContext
        val cols = statCols
        val statsByPath = sc.parallelize(dataFiles.map(_._1),
            math.min(dataFiles.size, sc.defaultParallelism))
          .map(p => (p, DeltaStats.footerStats(p, cols))).collect().toMap
        dataFiles.map { case (p, len, pv) => (p, len, statsByPath(p), pv) }
      }

    val entrySchema =
      if (specFields.isEmpty) ManifestEntrySchema
      else manifestEntrySchemaFor(partitionRecordJson(specFields.map(pf =>
        (pf.name, pf.fieldId, resultTypeOf(pf)))))
    // one new manifest for this commit
    val manifestPath = s"$mdir/graft-m-${java.util.UUID.randomUUID()}.avro"
    val addedRows = counted.map(_._3.numRecords).sum
    writeAvro(manifestPath, entrySchema,
      Map("format-version" -> "2", "content" -> "data",
        "partition-spec-id" -> specId.toString),
      counted.map { case (p, len, st, rawVals) =>
        val e = new GenericData.Record(entrySchema)
        e.put("status", 1) // ADDED
        e.put("snapshot_id", snapshotId)
        e.put("sequence_number", seq)
        e.put("file_sequence_number", seq)
        val d = new GenericData.Record(
          entrySchema.getField("data_file").schema())
        d.put("content", 0)
        d.put("file_path", p)
        d.put("file_format", "PARQUET")
        val pr = new GenericData.Record(
          d.getSchema.getField("partition").schema())
        specFields.zip(rawVals).foreach { case (pf, raw) =>
          pr.put(pf.name, partitionValueAvro(raw, resultTypeOf(pf))) }
        d.put("partition", pr)
        d.put("record_count", st.numRecords)
        d.put("file_size_in_bytes", len)
        IcebergBounds.populate(d, st, df.schema, idsByName)
        e.put("data_file", d)
        e
      })
    val manifestLen = { val (fs, p) = FsIO.resolve(manifestPath)
      fs.getFileStatus(p).getLen }

    // manifest list: new manifest (+ prior manifests on append)
    val newEntry = {
      val e = new GenericData.Record(ManifestFileSchema)
      e.put("manifest_path", manifestPath)
      e.put("manifest_length", manifestLen)
      e.put("partition_spec_id", specId)
      e.put("content", 0)
      e.put("sequence_number", seq)
      e.put("min_sequence_number", seq)
      e.put("added_snapshot_id", snapshotId)
      e.put("added_files_count", counted.size)
      e.put("existing_files_count", 0)
      e.put("deleted_files_count", 0)
      e.put("added_rows_count", addedRows)
      e.put("existing_rows_count", 0L)
      e.put("deleted_rows_count", 0L)
      e
    }
    val prior: Seq[GenericRecord] =
      if (mode == "append") existing.map(relistManifests).getOrElse(Nil)
      else Nil
    val listPath = s"$mdir/snap-$snapshotId-1-${java.util.UUID.randomUUID()}.avro"
    writeAvro(listPath, ManifestFileSchema,
      Map("format-version" -> "2"), newEntry +: prior)

    publishSnapshot(dir, existing, schemaNode, lastCol, seq, snapshotId,
      listPath, now, if (mode == "append") "append" else "overwrite",
      specFields)
  }

  /** Hive-escaped staging dir value -> typed avro partition value
    * (null for the hive default-partition marker). */
  private def partitionValueAvro(raw: String, dt: DataType): AnyRef =
    if (raw == "__HIVE_DEFAULT_PARTITION__") null
    else {
      val v = DeltaLake.unescapeHive(raw)
      dt match {
        case IntegerType => Integer.valueOf(v.toInt)
        case LongType => java.lang.Long.valueOf(v.toLong)
        case StringType => v
        case BooleanType => java.lang.Boolean.valueOf(v)
        case DateType =>
          Integer.valueOf(java.time.LocalDate.parse(v).toEpochDay.toInt)
        case other => throw new IllegalArgumentException(
          s"toIceberg: unsupported partition type ${other.catalogString}")
      }
    }

  /** Publish a new table version: metadata json with the new snapshot
    * appended (prior snapshots stay time-travelable), version-hint
    * update, concurrent-writer guard. Shared by toIceberg and the
    * delete-commit fixture builder. */
  private def publishSnapshot(dir: String, existing: Option[Metadata],
      schemaNode: ObjectNode, lastCol: Int, seq: Long, snapshotId: Long,
      listPath: String, now: Long, operation: String,
      specFields: Seq[PartField] = Nil): Unit = {
    val mdir = s"$dir/metadata"
    val version = existing.map(_.version + 1).getOrElse(1)
    val j = mapper.createObjectNode()
    j.put("format-version", 2)
    j.put("table-uuid", existing.map(_.tableUuid).getOrElse(
      java.util.UUID.randomUUID().toString))
    j.put("location", dir)
    j.put("last-sequence-number", seq)
    j.put("last-updated-ms", now)
    j.put("last-column-id", lastCol)
    val prevJson: Option[JsonNode] = existing.map(m =>
      mapper.readTree(readAll(s"$dir/metadata/${m.file}")))
    // schema history: carried VERBATIM from the previous metadata
    // version (a rewrite must never clobber a foreign table's schema
    // history, and current-schema-id must name the schema we actually
    // write — a foreign current id need not be 0). An append-time
    // evolution mints the next free schema-id and adds its node.
    prevJson.flatMap(pj => Option(pj.get("schemas")).filter(_.isArray)
        .map(_.asInstanceOf[ArrayNode])) match {
      case Some(prev) =>
        val out = j.putArray("schemas")
        (0 until prev.size()).foreach(i =>
          out.add(prev.get(i).deepCopy[JsonNode]()))
        val sameAs = (0 until prev.size()).map(prev.get)
          .find(_.equals(schemaNode))
        sameAs match {
          case Some(s) =>
            j.put("current-schema-id", s.get("schema-id").asInt())
          case None =>
            val nid = ((0 until prev.size())
              .map(prev.get(_).get("schema-id").asInt()) :+ -1).max + 1
            schemaNode.put("schema-id", nid)
            out.add(schemaNode)
            j.put("current-schema-id", nid)
        }
      case None =>
        j.putArray("schemas").add(schemaNode)
        j.put("current-schema-id", schemaNode.get("schema-id").asInt())
    }
    // partition specs: carried VERBATIM from the previous metadata
    // version when one exists (a metadata rewrite must never clobber a
    // foreign table's spec history); built from `specFields` (with
    // their transform strings) on table creation (empty ->
    // unpartitioned spec 0)
    prevJson.flatMap(pj => Option(pj.get("partition-specs"))
        .filter(_.isArray).filter(_.size() > 0)) match {
      case Some(prevSpecs) =>
        j.set[JsonNode]("partition-specs", prevSpecs.deepCopy[JsonNode]())
        j.put("default-spec-id", prevJson.flatMap(pj =>
          Option(pj.get("default-spec-id")).map(_.asInt())).getOrElse(0))
        j.put("last-partition-id", prevJson.flatMap(pj =>
          Option(pj.get("last-partition-id")).map(_.asInt())).getOrElse(999))
      case None =>
        val specs = j.putArray("partition-specs")
        val spec0 = mapper.createObjectNode()
        spec0.put("spec-id", 0)
        val sf = spec0.putArray("fields")
        specFields.foreach { pf =>
          val f = mapper.createObjectNode()
          f.put("name", pf.name)
          f.put("transform", pf.transform)
          f.put("source-id", pf.sourceId)
          f.put("field-id", pf.fieldId)
          sf.add(f)
        }
        specs.add(spec0)
        j.put("default-spec-id", 0)
        j.put("last-partition-id",
          (999 +: specFields.map(_.fieldId)).max)
    }
    j.putArray("sort-orders").add {
      val so = mapper.createObjectNode()
      so.put("order-id", 0); so.putArray("fields"); so
    }
    j.put("default-sort-order-id", 0)
    val props = j.putObject("properties")
    props.put("schema.name-mapping.default", nameMapping(schemaNode))
    j.put("current-snapshot-id", snapshotId)
    val snapArr = j.putArray("snapshots")
    val keptSnapshots: Seq[SnapshotInfo] =
      existing.map(_.snapshots).getOrElse(Nil)
    keptSnapshots.foreach { s =>
      val sn = mapper.createObjectNode()
      sn.put("snapshot-id", s.id)
      if (s.parentId >= 0) sn.put("parent-snapshot-id", s.parentId)
      sn.put("sequence-number", s.sequenceNumber)
      sn.put("timestamp-ms", s.timestampMs)
      sn.put("manifest-list", s.manifestList)
      // each kept snapshot keeps ITS OWN recorded operation (stamping
      // the current one over history would mislead incremental readers
      // that trust summary.operation)
      sn.putObject("summary").put("operation",
        if (s.operation != null) s.operation else operation)
      snapArr.add(sn)
    }
    val sn = mapper.createObjectNode()
    sn.put("snapshot-id", snapshotId)
    existing.filter(_.currentSnapshotId >= 0).foreach(m =>
      sn.put("parent-snapshot-id", m.currentSnapshotId))
    sn.put("sequence-number", seq)
    sn.put("timestamp-ms", now)
    sn.put("manifest-list", listPath)
    sn.putObject("summary").put("operation",
      operation)
    snapArr.add(sn)
    val log = j.putArray("snapshot-log")
    (keptSnapshots :+ SnapshotInfo(snapshotId, seq, now, listPath)).foreach { s =>
      val le = mapper.createObjectNode()
      le.put("snapshot-id", s.id)
      le.put("timestamp-ms", s.timestampMs)
      log.add(le)
    }
    val mpath = f"$mdir/v$version%05d.metadata.json"
    require(!FsIO.exists(mpath),
      s"Iceberg metadata version $version already exists (concurrent writer?)")
    writeText(mpath, mapper.writerWithDefaultPrettyPrinter().writeValueAsString(j))
    writeHint(s"$mdir/version-hint.text", version.toString)
  }



  /** MERGE-ON-READ DELETE (production): rows matching `cond` become
    * POSITION-delete entries — the layout Spark/Flink Iceberg writers
    * produce in merge-on-read mode, readable back by [[fromIceberg]]
    * and by conforming foreign readers (delete parquet carries the
    * spec field ids, paths are the manifests' own raw spellings,
    * files are (file_path, pos)-sorted).
    *
    * The 100 TB shape, mirroring the Delta DV delete: candidate files
    * prefilter through the SAME bounds evaluator as reads, the scan
    * emits (file, row_index) inside whole-stage codegen (PathId maps
    * _metadata spellings to canonical ordinals — never per-row
    * normalization), and the delete rows range-shuffle ONCE into
    * sorted sharded parquet written by the executors; the driver
    * handles only file metadata. Rows already masked by prior
    * position deletes may re-enter new delete files — (path, pos)
    * anti-joins are idempotent, so that is harmless duplication, not
    * corruption. Tables with EQUALITY deletes, partitioned default
    * specs, non-parquet data files or rename drift reject loudly.
    * Returns the new snapshot id (unchanged when nothing matches). */
  def deleteWhere(spark: SparkSession, dir0: String,
      cond: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions.{broadcast => _, _}
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.unsafe.types.UTF8String
    val dir = FsIO.normalize(dir0.stripSuffix("/"))
    val meta = loadMetadata(dir)
    meta.renameDrift.foreach(msg => throw new IllegalArgumentException(
      s"deleteWhere: table $dir has schema-evolution the name-based " +
        s"reader cannot honor ($msg)"))
    require(meta.formatVersion == 2,
      s"deleteWhere: format-version ${meta.formatVersion} tables have " +
        "no sequence numbers; rewrite via toIceberg instead")
    require(meta.currentSnapshotId >= 0, s"empty Iceberg table: $dir")
    // partitioned tables: delete files are partition-scoped like data
    // files — each staged delete file covers ONE partition tuple,
    // copied VERBATIM from the referenced data files' manifest entries
    // (transform-agnostic: the tuple is never re-derived). The
    // manifest declares the table's default spec id.
    val mj = mapper.readTree(readAll(s"$dir/metadata/${meta.file}"))
    val defaultSpec = Option(mj.get("default-spec-id")).map(_.asInt()).getOrElse(0)
    val snap = meta.snapshots.find(_.id == meta.currentSnapshotId).get
    val (files0, priorDels) = liveFiles(meta, snap, withStats = true)
    // existing EQUALITY deletes (the Flink-CDC shape) co-exist with a
    // new position delete: ours commits at lastSequenceNumber+1 — ABOVE
    // every prior delete's sequence — so the read side's strict
    // equality scoping (data seq < eq-delete seq) is untouched, and a
    // row masked by both is idempotent under the (path, pos) anti-join.
    // The candidate scan reads raw data files, so already-eq-deleted
    // rows matching `cond` re-enter the new delete file — harmless
    // duplication, same as re-deleting position-masked rows.
    require(priorDels.isEmpty || priorDels.map(_.seq).max <
        meta.lastSequenceNumber + 1,
      "deleteWhere: a prior delete file carries a sequence number at or " +
        "above the next commit's — corrupt metadata ordering")
    require(files0.forall(_.format == "PARQUET"),
      "deleteWhere: parquet data files only (position deletes need " +
        "_metadata.row_index)")
    if (files0.isEmpty) return meta.currentSnapshotId
    // bounds prefilter: provably-clean files never become scan tasks
    val pred = DeltaLake.resolvePredicate(spark, meta.schema, cond)
    val tz = spark.conf.get("spark.sql.session.timeZone",
      java.util.TimeZone.getDefault.getID)
    val candidates = files0.filter(f => DeltaStats.mightMatch(pred,
      meta.schema, Nil, Map.empty, f.statsJson, tz))
    if (candidates.isEmpty) return meta.currentSnapshotId
    // one partition-record schema across candidates (spec evolution
    // mid-table would need one delete manifest per spec — loud)
    val pSchemas = candidates.flatMap(f => Option(f.partition))
      .map(_.getSchema).distinct
    require(pSchemas.size <= 1,
      s"deleteWhere: candidate files span ${pSchemas.size} partition " +
        "record schemas (spec evolution) — delete per-spec subsets")
    val tuples: IndexedSeq[GenericRecord] =
      candidates.map(_.partition).distinct.toIndexedSeq
    val tupleIdxOfFile: Array[Int] = candidates.map(f =>
      tuples.indexOf(f.partition)).toArray
    val pathIds = new java.util.HashMap[UTF8String, Integer]()
    candidates.zipWithIndex.foreach { case (f, i) =>
      (Option(f.rawPath).toSeq ++ PathKeys.spellings(f.path)).foreach(sp =>
        pathIds.put(UTF8String.fromString(sp), Integer.valueOf(i)))
    }
    // the delete file must record the MANIFESTS' own path spelling —
    // foreign readers compare file_path strings exactly
    val rawByOrd: Array[String] = // lit() takes arrays, not Lists
      candidates.map(f => if (f.rawPath != null) f.rawPath else f.path).toArray
    val hits = spark.read.schema(meta.schema)
      .parquet(candidates.map(_.path): _*)
      .filter(coalesce(cond, lit(false)))
      .select(Bridge.column(PathId(Bridge.expression(
        col("_metadata.file_path")), pathIds, strict = true)).as("__fid"),
        col("_metadata.row_index").as("__pos"))
      // __pt = the file's partition-tuple ordinal: delete files are
      // partition-scoped, so staging splits directories on it (the
      // written files themselves carry only file_path + pos)
      .select(element_at(lit(rawByOrd), col("__fid") + 1)
        .as("file_path", fieldIdMeta(2147483546L)),
        col("__pos").as("pos", fieldIdMeta(2147483545L)),
        element_at(lit(tupleIdxOfFile), col("__fid") + 1).as("__pt"))
    val parts = math.max(1, math.min(candidates.size,
      spark.sparkContext.defaultParallelism))
    val staging = s"$dir/_staging/${java.util.UUID.randomUUID()}"
    // fieldId.write is enabled in a CLONED session (Bridge), never by
    // toggling the caller's conf — a concurrent write on the same
    // session must not race the flag
    val staged: Seq[(String, Long, Int)] = Bridge.withSessionConf(hits,
        Map("spark.sql.parquet.fieldId.write.enabled" -> "true")) { h =>
      h.repartitionByRange(parts, col("__pt"), col("file_path"), col("pos"))
        .sortWithinPartitions("__pt", "file_path", "pos") // spec sort order
        .write.partitionBy("__pt")
        .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(staging)
      FsIO.listFilesRecursive(staging).collect {
        case (p, len, _) if p.endsWith(".parquet") =>
          val seg = p.split('/').takeRight(2).head
          require(seg.startsWith("__pt="), s"unexpected staging dir for $p")
          (p, len, seg.drop("__pt=".length).toInt)
      }.toSeq.sortBy(_._1)
    }
    // per-file record counts in ONE scan (footer-only shape); empty
    // shards are dropped — a no-match delete commits nothing
    val counts: Map[String, Long] =
      if (staged.isEmpty) Map.empty
      else {
        val bySpelling = staged.flatMap { case (p, _, _) =>
          PathKeys.spellings(p).map(_ -> p) }.toMap
        spark.read.parquet(staged.map(_._1): _*)
          .groupBy(col("_metadata.file_path").as("f")).count()
          .collect().map { r =>
            bySpelling.getOrElse(r.getString(0),
              throw new IllegalStateException(
                s"unmatched staged spelling ${r.getString(0)}")) -> r.getLong(1)
          }.toMap
      }
    val nonEmpty = staged.filter(s => counts.getOrElse(s._1, 0L) > 0L)
    if (nonEmpty.isEmpty) { FsIO.deleteRecursive(staging); return meta.currentSnapshotId }
    val now = System.currentTimeMillis()
    val snapshotId = math.abs(java.util.UUID.randomUUID()
      .getMostSignificantBits) max 1L
    val seq = meta.lastSequenceNumber + 1
    val delFiles = nonEmpty.map { case (p, len, pt) =>
      val dst = s"$dir/data/delete-${java.util.UUID.randomUUID()}.parquet"
      FsIO.rename(p, dst)
      (dst, len, counts(p), tuples(pt))
    }
    FsIO.deleteRecursive(staging)
    commitDeleteManifest(dir, meta, delFiles, fileContent = 1,
      equalityIds = Nil, snapshotId = snapshotId, seq = seq, now = now,
      partitionRecordSchema = pSchemas.headOption.orNull,
      specId = defaultSpec)
    snapshotId
  }

  // ------------------------------------------------------------------
  // Foreign-table fixture builder (tests + oracle lanes ONLY)
  // ------------------------------------------------------------------

  /** Field metadata carrying a real parquet field id (Spark's
    * `parquet.field.id` key, written when fieldId.write is enabled) —
    * the delete-file fixtures use the Iceberg spec ids so external
    * id-resolving readers can cross-validate the bytes. */
  private def fieldIdMeta(id: Long): org.apache.spark.sql.types.Metadata =
    new MetadataBuilder().putLong("parquet.field.id", id).build()

  /** Simulate a foreign merge-on-read DELETE: rows of the current
    * snapshot matching `pred` become POSITION-delete entries — one
    * sorted parquet delete file (file_path, pos), one delete manifest
    * (content=1), a new manifest list re-listing the prior data
    * manifests, and a new snapshot/metadata version. This is the
    * layout Spark/Flink Iceberg writers produce in
    * merge-on-read mode; it exists so the MoR read path can be
    * oracle-gated. Fixture-scale only (deleted (file, pos) pairs
    * collect to the driver). Returns the new snapshot id. */
  private[graft] def foreignPositionDeletes(spark: SparkSession,
      dir0: String, pred: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions.{col, regexp_replace}
    val dir = FsIO.normalize(dir0.stripSuffix("/"))
    val meta = loadMetadata(dir)
    require(meta.currentSnapshotId >= 0, s"empty Iceberg table: $dir")
    val snap = meta.snapshots.find(_.id == meta.currentSnapshotId).get
    val (dataFiles, priorDels) = liveFiles(meta, snap)
    require(priorDels.forall(_.equalityIds.nonEmpty),
      "foreignPositionDeletes: one POSITION-delete generation only")
    require(dataFiles.forall(_.format == "PARQUET"),
      "foreignPositionDeletes: parquet data files only")
    val bySpelling: Map[String, String] = dataFiles.flatMap(f =>
      PathKeys.spellings(f.path).map(_ -> f.path)).toMap
    val hits = spark.read.schema(meta.schema).parquet(dataFiles.map(_.path): _*)
      .filter(pred)
      .select(col("_metadata.file_path"), col("_metadata.row_index"))
      .collect()
      .map(r => (bySpelling.getOrElse(r.getString(0),
        throw new IllegalStateException(
          s"unmatched scan spelling ${r.getString(0)}")), r.getLong(1)))
      .sortBy(identity) // the spec requires (file_path, pos) sort order
    val now = System.currentTimeMillis()
    val snapshotId = math.abs(java.util.UUID.randomUUID()
      .getMostSignificantBits) max 1L
    val seq = meta.lastSequenceNumber + 1
    val mdir = s"$dir/metadata"
    if (hits.isEmpty) return meta.currentSnapshotId
    // the delete parquet carries the exact spec column ids
    // (file_path=2147483546, pos=2147483545) as REAL parquet field ids
    // via Spark's parquet.field.id metadata, so an id-resolving foreign
    // Iceberg reader can read the bytes too (our own reader resolves by
    // name). Remaining fixture gap: no partition/spec linkage beyond
    // spec-id 0 — documented, unpartitioned fixtures only.
    val staging = s"$dir/_staging"
    FsIO.deleteRecursive(staging)
    import spark.implicits._
    Bridge.withSessionConf(hits.toSeq.toDF("file_path", "pos")
        .select(col("file_path").as("file_path", fieldIdMeta(2147483546L)),
          col("pos").as("pos", fieldIdMeta(2147483545L))),
        Map("spark.sql.parquet.fieldId.write.enabled" -> "true")) { h =>
      h.coalesce(1)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(staging)
    }
    val delPath = FsIO.listFilesRecursive(staging).collect {
      case (p, len, _) if p.endsWith(".parquet") =>
        val dst = s"$dir/data/delete-${java.util.UUID.randomUUID()}.parquet"
        FsIO.rename(p, dst)
        (dst, len)
    }.head
    FsIO.deleteRecursive(staging)
    commitDeleteManifest(dir, meta,
      Seq((delPath._1, delPath._2, hits.length.toLong, null)),
      fileContent = 1, equalityIds = Nil, snapshotId = snapshotId,
      seq = seq, now = now)
    snapshotId
  }


  /** Simulate a foreign EQUALITY delete: every data row whose
    * `equalityCols` tuple appears in `deleteRows` is masked for data
    * files with sequence number < the delete's (the spec's strict
    * scoping — rows appended AFTER the delete survive even when they
    * match). Writes one sorted delete parquet + a content=1 delete
    * manifest whose data_file carries content=2 + equality_ids. The
    * Flink-CDC layout; exists so the equality read path is testable.
    * Returns the new snapshot id. */
  private[graft] def foreignEqualityDeletes(spark: SparkSession,
      dir0: String, deleteRows: DataFrame,
      equalityCols: Seq[String]): Long = {
    val dir = FsIO.normalize(dir0.stripSuffix("/"))
    val meta = loadMetadata(dir)
    require(meta.currentSnapshotId >= 0, s"empty Iceberg table: $dir")
    require(equalityCols.nonEmpty, "foreignEqualityDeletes: no columns")
    val idsByName: Map[String, Int] = {
      val fs = meta.schemaNode.get("fields")
      (0 until fs.size()).map(i =>
        fs.get(i).get("name").asText() -> fs.get(i).get("id").asInt()).toMap
    }
    equalityCols.foreach(c => require(idsByName.contains(c),
      s"foreignEqualityDeletes: unknown column $c"))
    val now = System.currentTimeMillis()
    val snapshotId = math.abs(java.util.UUID.randomUUID()
      .getMostSignificantBits) max 1L
    val seq = meta.lastSequenceNumber + 1
    val mdir = s"$dir/metadata"
    val staging = s"$dir/_staging"
    FsIO.deleteRecursive(staging)
    // stamp each equality column with its SOURCE schema field id as a
    // real parquet field id (id-resolving foreign readers need it)
    val rows = deleteRows.select(equalityCols.map(c =>
      org.apache.spark.sql.functions.col(c)
        .as(c, fieldIdMeta(idsByName(c).toLong))): _*)
      .distinct().orderBy(equalityCols.map(
        org.apache.spark.sql.functions.col): _*)
    val n = rows.count()
    Bridge.withSessionConf(rows,
        Map("spark.sql.parquet.fieldId.write.enabled" -> "true")) { r =>
      r.coalesce(1).write
        .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(staging)
    }
    val delPath = FsIO.listFilesRecursive(staging).collect {
      case (p, len, _) if p.endsWith(".parquet") =>
        val dst = s"$dir/data/eq-delete-${java.util.UUID.randomUUID()}.parquet"
        FsIO.rename(p, dst)
        (dst, len)
    }.head
    FsIO.deleteRecursive(staging)
    commitDeleteManifest(dir, meta, Seq((delPath._1, delPath._2, n, null)),
      fileContent = 2,
      equalityIds = equalityCols.map(idsByName), snapshotId = snapshotId,
      seq = seq, now = now)
    snapshotId
  }


  /** Shared tail of the delete-commit paths (production deleteWhere +
    * the two foreign fixture builders): write ONE delete MANIFEST
    * listing every delete file (content=1 list entry; data_file
    * content = 1 position / 2 equality with its equality_ids), a
    * manifest list re-listing the prior manifests, and the new
    * snapshot/metadata version. `delFiles`: (path, byteLen, records)
    * per delete parquet. */
  private def commitDeleteManifest(dir: String, meta: Metadata,
      delFiles: Seq[(String, Long, Long, GenericRecord)], fileContent: Int,
      equalityIds: Seq[Int], snapshotId: Long, seq: Long,
      now: Long, partitionRecordSchema: ASchema = null,
      specId: Int = 0): Unit = {
    require(delFiles.nonEmpty, "commitDeleteManifest: no delete files")
    val mdir = s"$dir/metadata"
    val prefix = if (fileContent == 2) "graft-e" else "graft-d"
    val delManifest = s"$mdir/$prefix-${java.util.UUID.randomUUID()}.avro"
    // the delete manifest's partition record mirrors the data files'
    // own (copied through verbatim — delete files are partition-scoped
    // like data files); unpartitioned tables keep the empty record
    val entrySchema =
      if (partitionRecordSchema == null ||
          partitionRecordSchema.getFields.isEmpty) ManifestEntrySchema
      else manifestEntrySchemaFor(partitionRecordSchema.toString)
    writeAvro(delManifest, entrySchema,
      Map("format-version" -> "2", "content" -> "deletes",
        "partition-spec-id" -> specId.toString),
      delFiles.map { case (path, len, n, tuple) =>
        val e = new GenericData.Record(entrySchema)
        e.put("status", 1)
        e.put("snapshot_id", snapshotId)
        e.put("sequence_number", seq)
        e.put("file_sequence_number", seq)
        val d = new GenericData.Record(
          entrySchema.getField("data_file").schema())
        d.put("content", fileContent)
        d.put("file_path", path)
        d.put("file_format", "PARQUET")
        val pSchema = d.getSchema.getField("partition").schema()
        val pr = new GenericData.Record(pSchema)
        if (tuple != null) pSchema.getFields.forEach { f =>
          pr.put(f.name(), tuple.get(f.name()) match {
            case u: org.apache.avro.util.Utf8 => u.toString
            case o => o
          })
        }
        d.put("partition", pr)
        d.put("record_count", n)
        d.put("file_size_in_bytes", len)
        if (equalityIds.nonEmpty) {
          val ids = new java.util.ArrayList[Integer]()
          equalityIds.foreach(c => ids.add(Integer.valueOf(c)))
          d.put("equality_ids", ids)
        }
        e.put("data_file", d)
        e
      })
    val delLen = { val (fs, p) = FsIO.resolve(delManifest)
      fs.getFileStatus(p).getLen }
    val nTotal = delFiles.map(_._3).sum
    val delEntry = {
      val e = new GenericData.Record(ManifestFileSchema)
      e.put("manifest_path", delManifest)
      e.put("manifest_length", delLen)
      e.put("partition_spec_id", specId)
      e.put("content", 1) // DELETES manifest
      e.put("sequence_number", seq)
      e.put("min_sequence_number", seq)
      e.put("added_snapshot_id", snapshotId)
      e.put("added_files_count", delFiles.size)
      e.put("existing_files_count", 0)
      e.put("deleted_files_count", 0)
      e.put("added_rows_count", nTotal)
      e.put("existing_rows_count", 0L)
      e.put("deleted_rows_count", 0L)
      e
    }
    val listPath = s"$mdir/snap-$snapshotId-1-${java.util.UUID.randomUUID()}.avro"
    writeAvro(listPath, ManifestFileSchema,
      Map("format-version" -> "2"), delEntry +: relistManifests(meta))
    val schemaNode = meta.schemaNode.deepCopy[JsonNode]().asInstanceOf[ObjectNode]
    if (!schemaNode.hasNonNull("schema-id")) schemaNode.put("schema-id", 0)
    publishSnapshot(dir, Some(meta), schemaNode, meta.lastColumnId, seq,
      snapshotId, listPath, now, "delete")
  }

  /** Re-list the current snapshot's manifest entries verbatim onto OUR
    * ManifestFileSchema (field subset by name) — the fast-append and
    * delete-commit building block. */
  private def relistManifests(m: Metadata): Seq[GenericRecord] =
    m.snapshots.find(_.id == m.currentSnapshotId).map { cur =>
      val b = Seq.newBuilder[GenericRecord]
      eachAvro(resolvePath(m, cur.manifestList)) { r =>
        val e = new GenericData.Record(ManifestFileSchema)
        ManifestFileSchema.getFields.forEach { f =>
          val v = if (r.getSchema.getField(f.name()) == null) null
                  else r.get(f.name())
          e.put(f.name(), v match {
            case u: org.apache.avro.util.Utf8 => u.toString
            // v1-era manifests lack content/sequence/count fields;
            // the v2 spec reads those as 0 -- fill, don't NPE the
            // non-nullable int/long schema fields
            case null => f.schema().getType match {
              case ASchema.Type.INT => Integer.valueOf(0)
              case ASchema.Type.LONG => java.lang.Long.valueOf(0L)
              case _ => null
            }
            case o => o
          })
        }
        b += e
      }
      b.result()
    }.getOrElse(Nil)

  /** Iceberg name-mapping JSON for the schema (table property
    * `schema.name-mapping.default`): external Iceberg readers resolve
    * columns by FIELD ID, and plain-Spark parquet files carry none —
    * the name mapping is the spec-sanctioned bridge that keeps
    * graft-written tables readable by iceberg-runtime/Trino instead
    * of projecting every column as NULL. */
  private def nameMapping(schemaNode: JsonNode): String = {
    def fields(struct: JsonNode): ArrayNode = {
      val arr = mapper.createArrayNode()
      val fs = struct.get("fields")
      (0 until fs.size()).foreach { i =>
        val f = fs.get(i)
        val e = mapper.createObjectNode()
        e.put("field-id", f.get("id").asInt())
        e.putArray("names").add(f.get("name").asText())
        val t = f.get("type")
        if (t.isObject && t.get("type").asText() == "struct")
          e.set[JsonNode]("fields", fields(t))
        if (t.isObject && t.get("type").asText() == "list") {
          val el = mapper.createObjectNode()
          el.put("field-id", t.get("element-id").asInt())
          el.putArray("names").add("element")
          val sub = mapper.createArrayNode(); sub.add(el)
          e.set[JsonNode]("fields", sub)
        }
        arr.add(e)
      }
      arr
    }
    mapper.writeValueAsString(fields(schemaNode))
  }

  private def writeAvro(path: String, schema: ASchema,
      meta: Map[String, String], records: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    meta.foreach { case (k, v) => w.setMeta(k, v) }
    val out = FsIO.create(path)
    try {
      w.create(schema, out) // DataFileWriter closes `out` on close()
      records.foreach(w.append)
    } finally w.close()
  }

  private def writeText(path: String, text: String): Unit = {
    val out = FsIO.create(path)
    try out.write(text.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** version-hint.text is REWRITTEN on every commit while tailing
    * readers poll it. Truncate-in-place (NOT delete+rename): the file
    * must keep EXISTING — Readers.open dispatches Iceberg tables on
    * its presence, so a missing-file window would misroute a
    * concurrent open, while the create-truncated EMPTY window is
    * handled by loadMetadata's empty-hint fallback (and a stale hint
    * is just snapshot isolation). */
  private def writeHint(path: String, text: String): Unit =
    writeText(path, text)

  private def relaxed(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.map(f =>
      StructField(f.name, relaxed(f.dataType), nullable = true)))
    case a: ArrayType => ArrayType(relaxed(a.elementType), containsNull = true)
    case m: MapType =>
      MapType(relaxed(m.keyType), relaxed(m.valueType), valueContainsNull = true)
    case o => o
  }

  /** Append-time schema evolution test: the table's fields must be a
    * PREFIX of the data's (matched by name + relaxed type — the
    * ALTER TABLE ADD COLUMN shape); the remainder are the NEW
    * columns. New names must not collide case-insensitively with
    * existing ones (Spark resolves case-insensitively). Returns None
    * when the data schema is not such a superset. */
  private def evolutionNewFields(table: StructType,
      data: StructType): Option[Seq[StructField]] = {
    if (data.length <= table.length) return None
    val prefixOk = table.fields.zip(data.fields.take(table.length)).forall {
      case (t, d) => t.name == d.name &&
        relaxed(t.dataType) == relaxed(d.dataType) }
    if (!prefixOk) return None
    val newFs = data.fields.drop(table.length).toSeq
    val existingLower = table.fieldNames.map(_.toLowerCase).toSet
    if (newFs.exists(f => existingLower(f.name.toLowerCase))) None
    else Some(newFs)
  }
}
