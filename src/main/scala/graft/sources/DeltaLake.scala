package graft.sources

import java.nio.charset.StandardCharsets
import scala.collection.mutable
import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dependency-free Delta Lake table source/sink (the lakehouse table
  * layer a 100 TB corpus actually lives in — versioned parquet with an
  * ACID transaction log). Built straight from the public Delta
  * transaction-log protocol (github.com/delta-io/delta PROTOCOL.md):
  * a table is a directory of parquet data files plus `_delta_log/`
  * holding ordered JSON commits `%020d.json` (one action per line:
  * `protocol`, `metaData`, `add`, `remove`, `commitInfo`) and periodic
  * parquet checkpoints `%020d.checkpoint.parquet` that compact the
  * state so readers replay only the JSON tail.
  *
  * The reference has no table-versioning layer at all — its closest
  * analog is the `convert=` parquet cache
  * (packages/vaex-core/vaex/__init__.py:111); this module is the
  * beyond-reference piece that makes exported corpora appendable,
  * time-travelable and atomically replaceable.
  *
  * Scale design:
  *  - The LOG is driver-side metadata (one `add` entry per data file:
  *    ~100k entries for 100 TB at 1 GB files — small). The DATA never
  *    touches the driver: each snapshot read is a plain distributed
  *    parquet scan over the live file set, so predicate pushdown,
  *    column pruning and whole-stage codegen all apply unchanged.
  *  - Partition columns are NOT stored in the data files (per the
  *    protocol); they are injected as typed literals per
  *    partition-value group, so a filter on a partition column prunes
  *    entire scan branches at plan time.
  *  - Checkpoints bound replay cost: a reader lists the log once,
  *    loads the newest checkpoint <= the target version, and replays
  *    only the JSON commits after it.
  *  - Writes stage through `_staging/` (a normal distributed
  *    `df.write.parquet`), promote files into the table by rename
  *    (metadata-only on HDFS-like stores), and publish them in a
  *    single commit file — readers never see partial data because
  *    only logged files exist. Single-writer discipline: the version
  *    claim is exists-check + rename, not a distributed lock (OSS
  *    Delta needs a LogStore with put-if-absent for S3 for the same
  *    reason).
  *
  * Protocol gate (read path): we support `minReaderVersion` 1, 2
  * (column mapping era — `name` mode reads by per-field physicalName
  * metadata, `id` mode rejects loudly), and 3 when every
  * `readerFeatures` entry is in the supported set (`timestampNtz`,
  * `columnMapping`, `deletionVectors`, `v2Checkpoint`). Deletion
  * vectors apply as a codegen'd per-file roaring-bitmap anti-filter
  * over `_metadata.row_index` inside the scan stage ([[RoaringDv]]) —
  * no shuffle, no join. Anything else that changes data-file
  * interpretation (type widening, ...) rejects loudly rather than
  * misreads; per the protocol such features REQUIRE the corresponding
  * reader version/feature flags, so gating on the protocol action
  * alone is sufficient. Tables carrying the `v2Checkpoint` WRITER
  * feature are fully writable: [[writeCheckpoint]] produces the v2
  * layout (uuid manifest + sidecars) on such tables, which is the
  * feature's only writer obligation.
  *
  * Column-mapped (name mode) and DV-carrying tables are FULLY
  * writable (r17): every rewrite op reads/stages in the physical
  * namespace under column mapping, reads through the DV anti-filter
  * (materializing masked deletes, descriptors riding the tombstones)
  * on DV tables, and checkpoints carry the descriptors — there is no
  * remaining read-only class of modern Delta table here.
  */
object DeltaLake {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val SupportedReaderFeatures =
    Set("timestampNtz", "columnMapping", "deletionVectors", "v2Checkpoint",
      // type widening: the table schema records the WIDE type, files
      // written before the widening keep the narrow one — Spark's
      // parquet readers promote narrow stored types to the requested
      // wider type (the capability added for exactly this feature),
      // and any promotion they cannot do fails LOUD, never misreads.
      "typeWidening", "typeWidening-preview")
  /** Checkpoint cadence (OSS Delta default: 10 commits). */
  val DefaultCheckpointInterval = 10

  private val CommitRe = """^(\d{20})\.json$""".r
  private val CheckpointRe = """^(\d{20})\.checkpoint\.parquet$""".r
  /** Classic multi-part: `v.checkpoint.<part>.<numParts>.parquet`. */
  private val MultiPartCheckpointRe =
    """^(\d{20})\.checkpoint\.(\d{10})\.(\d{10})\.parquet$""".r
  /** V2 (uuid-named) checkpoint manifest: `v.checkpoint.<uuid>.{parquet|json}`
    * — single middle segment, so no overlap with the two-segment
    * multi-part form. */
  private val V2CheckpointRe =
    """^(\d{20})\.checkpoint\.[^.]+\.(?:parquet|json)$""".r

  private final case class Meta(
      id: String, schemaString: String, partitionColumns: Seq[String],
      columnMapping: String = "none",
      configuration: Map[String, String] = Map.empty,
      // carried VERBATIM through metadata rewrites (rename) and
      // checkpoints — a foreign table's name/description must never
      // silently vanish
      name: String = null, description: String = null,
      createdTime: Long = 0L)
  /** `add.deletionVector` descriptor (PROTOCOL.md): storageType
    * `u` (relative z85-uuid file) / `p` (absolute path) / `i`
    * (inline z85 payload). */
  private final case class DvDescriptor(
      storageType: String, pathOrInlineDv: String, offset: Int,
      sizeInBytes: Int, cardinality: Long)
  private final case class AddFile(
      path: String, partitionValues: Map[String, String], size: Long,
      modificationTime: Long, stats: String = null,
      dv: DvDescriptor = null)
  /** A `cdc` action's change file (PROTOCOL.md Change Data Feed):
    * parquet under `_change_data/` holding the commit's change rows
    * plus `_change_type` (insert / delete / update_preimage /
    * update_postimage); always dataChange=false — invisible to
    * normal reads, authoritative for CDF reads. */
  private final case class CdcFile(
      path: String, partitionValues: Map[String, String], size: Long)
  private final case class Snapshot(
      table: String, version: Long, meta: Meta, minReaderVersion: Int,
      readerFeatures: Set[String], minWriterVersion: Int,
      writerFeatures: Set[String], adds: Seq[AddFile])

  private def logDir(table: String): String = s"$table/_delta_log"
  private def commitPath(table: String, v: Long): String =
    f"${logDir(table)}/$v%020d.json"

  // ------------------------------------------------------------------
  // Read path
  // ------------------------------------------------------------------

  /** Open a Delta table as a DataFrame — the current snapshot, or the
    * state as of `versionAsOf` (time travel).
    *
    * `where`: optional predicate used for STATS-BASED FILE SKIPPING —
    * evaluated driver-side against each add's `stats` bounds
    * (numRecords/minValues/maxValues/nullCount) and partition values,
    * so provably-non-matching files never become scan tasks; it is
    * then re-applied as a real filter, so the answer equals
    * `fromDelta(...).filter(where)` whether or not any file has
    * stats. This is the 100 TB lever: Spark's own parquet footer
    * pruning runs inside already-scheduled tasks, stats skipping
    * removes the tasks. */
  def fromDelta(spark: SparkSession, table0: String,
      versionAsOf: Option[Long] = None,
      where: Option[Column] = None): DataFrame = {
    val table = FsIO.normalize(table0.stripSuffix("/"))
    val snap = snapshot(spark, table, versionAsOf)
    gate(snap)
    val schema = DataType.fromJson(snap.meta.schemaString).asInstanceOf[StructType]
    val partCols = snap.meta.partitionColumns
    partCols.foreach(c => require(schema.fieldNames.contains(c),
      s"fromDelta: partition column $c missing from table schema"))
    val dataSchema = StructType(schema.filterNot(f => partCols.contains(f.name)))
    require(dataSchema.nonEmpty,
      s"fromDelta: every column of $table is a partition column")
    val cm = snap.meta.columnMapping
    val kept = where match {
      case Some(w) =>
        // under column mapping, stats keys + partitionValues keys are
        // PHYSICAL names — evaluate skipping in the physical namespace
        val (pred, statsSchema, statsPartCols) = statsNamespace(
          snap, schema, partCols, resolvePredicate(spark, schema, w))
        val tz = spark.conf.get("spark.sql.session.timeZone",
          java.util.TimeZone.getDefault.getID)
        snap.adds.filter(a =>
          DeltaStats.mightMatch(pred, statsSchema, statsPartCols,
            a.partitionValues, a.stats, tz))
      case None => snap.adds
    }
    def finish(df: DataFrame): DataFrame =
      where.map(df.filter).getOrElse(df)
    if (kept.isEmpty)
      return finish(spark.createDataFrame(
        new java.util.ArrayList[Row](), schema))
    finish(readAdds(spark, table, schema, partCols, kept, cm))
  }

  /** Incremental read: the rows ADDED in versions (fromVersion,
    * toVersion] — exactly the dataChange=true add files of those
    * commits, each tagged with its commit version (`_commit_version`
    * column). This is the exactly-once tailing primitive an
    * incremental pipeline needs: consumers persist the last version
    * they processed and pull `(last, latest]` on each trigger; a
    * compaction (dataChange=false) contributes nothing, so OPTIMIZE
    * never re-delivers rows. Updates/deletes: a commit CARRYING cdc
    * actions (a CDF-enabled table's MERGE/DELETE) delivers exactly
    * its change files' `insert` rows — the genuinely new rows — so
    * such tables tail finely (DeltaTail included); row-level
    * update/delete images are [[fromDeltaCdf]]'s surface. A rewrite
    * commit WITHOUT cdc still rejects loudly (re-added survivors
    * would silently duplicate the tail). */
  def fromDeltaChanges(spark: SparkSession, table0: String,
      fromVersion: Long, toVersion: Option[Long] = None): DataFrame = {
    val table = FsIO.normalize(table0.stripSuffix("/"))
    val latest = latestVersion(table)
    require(latest >= 0, s"not a Delta table: $table")
    val to = toVersion.getOrElse(latest)
    require(fromVersion <= to && to <= latest,
      s"fromDeltaChanges: bad version range ($fromVersion, $to] of latest $latest")
    require(to - fromVersion <= 256,
      s"fromDeltaChanges: range of ${to - fromVersion} versions exceeds the " +
        "256-commit plan cap (one scan branch set per version) — pull in " +
        "chunks or read a full snapshot")
    // the newest snapshot <= `to` carries schema + protocol for the range
    val snap = snapshot(spark, table, Some(to))
    gate(snap)
    val schema = DataType.fromJson(snap.meta.schemaString).asInstanceOf[StructType]
    val partCols = snap.meta.partitionColumns
    // Schema-drift guard: every add in (from, to] is read with the
    // schema AT `to` — on a foreign table whose schema evolved inside
    // the range, older files would surface dropped/renamed columns as
    // silent NULLs and misread type changes. Reject loudly instead
    // (toDelta's discipline): drift shows either as the `from`
    // snapshot's schema differing from `to`'s, or (a change + revert)
    // as an in-range metaData action differing from `to`'s.
    if (fromVersion >= 0) {
      val before = snapshot(spark, table, Some(fromVersion)).meta
      require(before.schemaString == snap.meta.schemaString &&
          before.partitionColumns == snap.meta.partitionColumns,
        s"fromDeltaChanges: table schema/partitioning changed inside " +
          s"($fromVersion, $to] — incremental adds cannot be read with " +
          "the newer schema; restart from a full snapshot")
    }
    val out = StructType(schema :+ StructField("_commit_version", LongType, nullable = false))
    val perVersion = ((fromVersion + 1) to to).flatMap { v =>
      if (!FsIO.exists(commitPath(table, v)))
        throw new IllegalArgumentException(
          s"fromDeltaChanges: commit $v of $table was log-cleaned; " +
            "restart from a full snapshot")
      // a commit carrying cdc actions describes its changes FULLY
      // (the protocol's CDF rule): the appended rows are exactly the
      // change files' `insert` rows — MERGE/DELETE commits on
      // CDF-enabled tables tail finely instead of rejecting
      val cdcs = Seq.newBuilder[CdcFile]
      eachAction(commitPath(table, v))(n =>
        if (n.has("cdc")) cdcs += parseCdc(n.get("cdc")))
      val vCdcs = cdcs.result()
      if (vCdcs.nonEmpty)
        Some(readCdc(spark, table, schema, partCols, vCdcs,
            snap.meta.columnMapping)
          .filter(col("_change_type") === "insert")
          .drop("_change_type")
          .withColumn("_commit_version", lit(v)))
      else {
      val adds = Seq.newBuilder[AddFile]
      eachAction(commitPath(table, v)) { n =>
        if (n.has("add")) {
          val a = n.get("add")
          // dataChange=false (compaction) re-adds carry no NEW rows
          if (!a.hasNonNull("dataChange") || a.get("dataChange").asBoolean()) {
            val ad = parseAdd(a)
            // a DV add is a DELETE (remove+re-add of the same file with
            // more rows masked), not an append — "rows added" is the
            // wrong read of it, so the incremental tail rejects loudly
            require(ad.dv == null,
              s"fromDeltaChanges: commit $v adds ${ad.path} with a " +
                "deletion vector — the table is not append-only over " +
                "this range; read a full snapshot")
            adds += ad
          }
        } else if (n.has("remove")) {
          // a dataChange=true remove is a copy-on-write DELETE/UPDATE/
          // RESTORE: the commit re-adds rewritten survivor files whose
          // contents are mostly previously-delivered rows — delivering
          // them as "rows added" silently duplicates the tail. Reject
          // loudly, same as the DV flavor above. dataChange=false
          // removes (OPTIMIZE/Z-order layout rewrites) stay fine.
          val r = n.get("remove")
          require(r.hasNonNull("dataChange") && !r.get("dataChange").asBoolean(),
            s"fromDeltaChanges: commit $v removes " +
              s"${r.get("path").asText()} with dataChange=true — the " +
              "table is not append-only over this range; read a full snapshot")
        } else if (n.has("metaData")) {
          val m = n.get("metaData")
          val ss = if (m.hasNonNull("schemaString"))
            m.get("schemaString").asText() else null
          require(ss == null || ss == snap.meta.schemaString,
            s"fromDeltaChanges: commit $v changed the table schema " +
              s"inside ($fromVersion, $to]; restart from a full snapshot")
        }
      }
      val vAdds = adds.result()
      if (vAdds.isEmpty) None
      else Some(readAdds(spark, table, schema, partCols, vAdds,
          cm = snap.meta.columnMapping)
        .withColumn("_commit_version", lit(v)))
      }
    }
    if (perVersion.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[Row](), out)
    else perVersion.reduce(_ union _)
  }

  /** CHANGE DATA FEED read: row-level changes committed in versions
    * `(fromVersion, toVersion]`, tagged `_change_type` (insert /
    * delete / update_preimage / update_postimage) and
    * `_commit_version`. A commit carrying `cdc` actions reads its
    * change files EXCLUSIVELY (the protocol's rule — precise update
    * pre/post images). A commit without cdc reconstructs
    * relationally: dataChange adds deliver their VISIBLE rows as
    * inserts (a DV add's mask applies in-scan), dataChange removes
    * deliver the removed file VERSION's visible rows as deletes —
    * exact for appends, overwrites and full-file deletes; a foreign
    * partial rewrite without cdc shows as delete+insert of the
    * affected file's rows (the same net change, without update
    * pairing). dataChange=false layout commits deliver nothing. */
  def fromDeltaCdf(spark: SparkSession, table0: String,
      fromVersion: Long, toVersion: Option[Long] = None): DataFrame = {
    val table = FsIO.normalize(table0.stripSuffix("/"))
    val latest = latestVersion(table)
    require(latest >= 0, s"not a Delta table: $table")
    val to = toVersion.getOrElse(latest)
    require(fromVersion <= to && to <= latest,
      s"fromDeltaCdf: bad version range ($fromVersion, $to] of latest $latest")
    require(to - fromVersion <= 256,
      s"fromDeltaCdf: range of ${to - fromVersion} versions exceeds the " +
        "256-commit plan cap — pull in chunks")
    val snap = snapshot(spark, table, Some(to))
    gate(snap)
    val schema = DataType.fromJson(snap.meta.schemaString).asInstanceOf[StructType]
    val partCols = snap.meta.partitionColumns
    if (fromVersion >= 0) {
      val before = snapshot(spark, table, Some(fromVersion)).meta
      require(before.schemaString == snap.meta.schemaString &&
          before.partitionColumns == snap.meta.partitionColumns,
        s"fromDeltaCdf: table schema/partitioning changed inside " +
          s"($fromVersion, $to]; restart from a full snapshot")
    }
    val out = StructType(schema :+
      StructField("_change_type", StringType, nullable = false) :+
      StructField("_commit_version", LongType, nullable = false))
    val cm = snap.meta.columnMapping
    val perVersion = ((fromVersion + 1) to to).flatMap { v =>
      if (!FsIO.exists(commitPath(table, v)))
        throw new IllegalArgumentException(
          s"fromDeltaCdf: commit $v of $table was log-cleaned; " +
            "restart from a full snapshot")
      val cdcs = Seq.newBuilder[CdcFile]
      val adds = Seq.newBuilder[AddFile]
      val removes = Seq.newBuilder[String]
      eachAction(commitPath(table, v)) { n =>
        if (n.has("cdc")) cdcs += parseCdc(n.get("cdc"))
        else if (n.has("add")) {
          val a = n.get("add")
          if (!a.hasNonNull("dataChange") || a.get("dataChange").asBoolean())
            adds += parseAdd(a)
        } else if (n.has("remove")) {
          val r = n.get("remove")
          if (r.hasNonNull("dataChange") && r.get("dataChange").asBoolean())
            removes += r.get("path").asText()
        } else if (n.has("metaData")) {
          // a schema change + revert INSIDE the range would evade the
          // endpoint drift compare — same guard as fromDeltaChanges
          val m = n.get("metaData")
          val ss = if (m.hasNonNull("schemaString"))
            m.get("schemaString").asText() else null
          require(ss == null || ss == snap.meta.schemaString,
            s"fromDeltaCdf: commit $v changed the table schema inside " +
              s"($fromVersion, $to]; restart from a full snapshot")
        }
      }
      val vCdcs = cdcs.result()
      val frames =
        if (vCdcs.nonEmpty)
          Seq(readCdc(spark, table, schema, partCols, vCdcs, cm))
        else {
          val ins = adds.result() match {
            case Nil => None
            case as => Some(readAdds(spark, table, schema, partCols, as, cm)
              .withColumn("_change_type", lit("insert")))
          }
          val del = removes.result() match {
            case Nil => None
            case rs =>
              // the removed file VERSION (partition values, stats and
              // PRE-commit deletion vector) comes from the prior
              // snapshot — the tombstone carries only path + dv
              val prior = snapshot(spark, table, Some(v - 1))
              val byPath = prior.adds.map(a => a.path -> a).toMap
              val removed = rs.map(p => byPath.getOrElse(p,
                throw new IllegalArgumentException(
                  s"fromDeltaCdf: commit $v removes $p, absent from " +
                    s"version ${v - 1} (corrupt log)")))
              removed.foreach(a => require(
                FsIO.exists(resolveDataPath(table, a.path)),
                s"fromDeltaCdf: removed file ${a.path} of commit $v was " +
                  "vacuumed; restart from a full snapshot"))
              Some(readAdds(spark, table, schema, partCols, removed, cm)
                .withColumn("_change_type", lit("delete")))
          }
          ins.toSeq ++ del.toSeq
        }
      if (frames.isEmpty) None
      else Some(frames.reduce(_ unionByName _)
        .withColumn("_commit_version", lit(v)))
    }
    if (perVersion.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[Row](), out)
    else perVersion.reduce(_ union _)
  }

  /** Distributed scan over a SET of adds: one branch per distinct
    * partition tuple — the protocol keeps partition values out of the
    * data files, so each branch reads its files with the DATA schema
    * and attaches the partition columns as typed literals (Catalyst
    * folds filters on them to scan pruning). Shared by fromDelta and
    * the merge rewrites (which scan file subsets). */
  private def readAdds(spark: SparkSession, table: String,
      schema: StructType, partCols: Seq[String],
      adds: Seq[AddFile], cm: String = "none"): DataFrame = {
    // column mapping: data files + partitionValues + stats all use
    // per-field PHYSICAL names; scan physical, rename back to logical
    // after the scan (identity aliases when cm="none"). In `id` mode
    // the requested fields ALSO carry parquet.field.id metadata and
    // the scan runs under fieldId.read — columns resolve by FIELD ID,
    // so files whose parquet column names drifted from the metadata
    // (the converted-table shape id mode exists for) still read
    // correctly, and a file missing the ids is loud.
    val physSchema = cm match {
      case "name" => physicalType(schema).asInstanceOf[StructType]
      case "id" => fieldIdType(schema).asInstanceOf[StructType]
      case _ => schema
    }
    if (cm != "none") physSchema.fieldNames.foreach(n =>
      require(!n.contains(".") && !n.contains("`"),
        s"fromDelta: physical column name '$n' needs quoting we don't do"))
    // id mode: BUILD the scans under a CLONED session carrying
    // fieldId.read (a parquet relation captures its creating session,
    // so wrapping the finished plan would not change resolution; the
    // clone never touches the caller's conf — the Bridge discipline).
    // The parquet readers then match requested fields by their
    // parquet.field.id metadata instead of by name; a file missing
    // the ids is loud.
    val scanSpark =
      if (cm == "id") org.apache.spark.sql.graftbridge.Bridge
        .sessionWithConf(spark, Map(
          "spark.sql.parquet.fieldId.read.enabled" -> "true"))
      else spark
    val physOf = schema.fieldNames.zip(physSchema.fieldNames).toMap
    val physPartCols = partCols.map(physOf)
    val dataSchemaPhys =
      StructType(physSchema.filterNot(f => physPartCols.contains(f.name)))
    val groups = adds.groupBy(_.partitionValues).toSeq
      .sortBy(_._1.toSeq.sortBy(_._1).map { case (k, v) =>
        s"$k=${if (v == null) "\u0000" else v}" }.mkString("/"))
    require(groups.size <= 4096,
      s"fromDelta: ${groups.size} distinct partition tuples exceeds the " +
        "4096 union-branch cap; repartition the table coarser or read " +
        "partition subsets")
    val branches = groups.map { case (pv, files) =>
      // NOTE: leaf-file inputs keep Spark's own dir-based partition
      // inference OFF (each file's parent is its base path) -- the log,
      // not the directory layout, is the source of partition values.
      // Files with deletion vectors scan separately (they pay the
      // _metadata.row_index anti-filter); plain files scan untouched.
      val (dvFiles, plainFiles) = files.partition(_.dv != null)
      val scans = Seq.newBuilder[DataFrame]
      if (plainFiles.nonEmpty)
        scans += scanSpark.read.schema(dataSchemaPhys)
          .parquet(plainFiles.map(f => resolveDataPath(table, f.path)): _*)
      if (dvFiles.nonEmpty)
        scans += dvFilteredScan(scanSpark, table, dataSchemaPhys, dvFiles)
      val base = scans.result().reduce(_ union _)
      // physical -> logical data columns (cast renames nested struct
      // fields positionally; top-level identical types stay cast-free
      // so filter pushdown reaches the scan)
      val renamed = base.select(
        schema.fields.toIndexedSeq.filterNot(f => partCols.contains(f.name)).map { f =>
          val pf = physSchema(schema.fieldIndex(f.name))
          val c = col(pf.name)
          (if (pf.dataType == f.dataType) c else c.cast(f.dataType)).as(f.name)
        }: _*)
      val withParts = partCols.foldLeft(renamed) { (d, c) =>
        d.withColumn(c, typedPartitionValue(
          pv.getOrElse(physOf(c), null), schema(c).dataType))
      }
      withParts.select(schema.fieldNames.map(col).toIndexedSeq: _*)
    }
    branches.reduce(_ union _)
  }

  /** Distributed scan over a commit's cdc change files: like
    * [[readAdds]] (partition re-injection, column-mapping
    * namespaces) plus the files' own `_change_type` column; cdc
    * files never carry deletion vectors. */
  private def readCdc(spark: SparkSession, table: String,
      schema: StructType, partCols: Seq[String],
      files: Seq[CdcFile], cm: String): DataFrame = {
    val physSchema = cm match {
      case "name" => physicalType(schema).asInstanceOf[StructType]
      case "id" => fieldIdType(schema).asInstanceOf[StructType]
      case _ => schema
    }
    val scanSpark =
      if (cm == "id") org.apache.spark.sql.graftbridge.Bridge
        .sessionWithConf(spark, Map(
          "spark.sql.parquet.fieldId.read.enabled" -> "true"))
      else spark
    val physOf = schema.fieldNames.zip(physSchema.fieldNames).toMap
    val physPartCols = partCols.map(physOf)
    val dataSchemaPhys = StructType(
      physSchema.filterNot(f => physPartCols.contains(f.name)) :+
        StructField("_change_type", StringType))
    val groups = files.groupBy(_.partitionValues).toSeq
      .sortBy(_._1.toSeq.sortBy(_._1).map { case (k, v) =>
        s"$k=${if (v == null) "\u0000" else v}" }.mkString("/"))
    val branches = groups.map { case (pv, fs) =>
      val base = scanSpark.read.schema(dataSchemaPhys)
        .parquet(fs.map(f => resolveDataPath(table, f.path)): _*)
      val renamed = base.select((schema.fields.toIndexedSeq
        .filterNot(f => partCols.contains(f.name)).map { f =>
          val pf = physSchema(schema.fieldIndex(f.name))
          val c = col(pf.name)
          (if (pf.dataType == f.dataType) c else c.cast(f.dataType)).as(f.name)
        } :+ col("_change_type")): _*)
      val withParts = partCols.foldLeft(renamed) { (d, c) =>
        d.withColumn(c, typedPartitionValue(
          pv.getOrElse(physOf(c), null), schema(c).dataType))
      }
      withParts.select(
        (schema.fieldNames.toIndexedSeq :+ "_change_type").map(col): _*)
    }
    branches.reduce(_ union _)
  }

  /** Scan DV-carrying files: the per-file deletion bitmaps are
    * deserialized driver-side (bounded by the surviving files' DV
    * payload bytes) and shipped into a codegen'd row filter over
    * `_metadata.row_index` -- no shuffle, no join, deleted rows drop
    * inside the scan stage ([[DvDeleted]]). */
  private def dvFilteredScan(spark: SparkSession, table: String,
      dataSchemaPhys: StructType, files: Seq[AddFile]): DataFrame = {
    import org.apache.spark.unsafe.types.UTF8String
    // keyed by EVERY spelling _metadata.file_path may render
    // (PathKeys — incl. the percent-encoded qualified URI), probed
    // raw per row: no normalization in the hot loop, and a residual
    // spelling gap stays LOUD (DvDeleted throws), never silent.
    val dvMap = new java.util.HashMap[UTF8String, RoaringDv.Dv]()
    val paths = files.map { f =>
      val p = resolveDataPath(table, f.path)
      val dv = loadDv(table, f.dv)
      require(dv.cardinality == f.dv.cardinality,
        s"deletion vector for ${f.path} has cardinality ${dv.cardinality}, " +
          s"descriptor says ${f.dv.cardinality}")
      PathKeys.spellings(p).foreach(s =>
        dvMap.put(UTF8String.fromString(s), dv))
      p
    }
    import org.apache.spark.sql.graftbridge.Bridge
    val base = spark.read.schema(dataSchemaPhys).parquet(paths: _*)
    val deleted = Bridge.column(DvDeleted(
      Bridge.expression(col("_metadata.file_path")),
      Bridge.expression(col("_metadata.row_index")),
      dvMap))
    base.filter(!deleted)
      .select(dataSchemaPhys.fieldNames.map(col).toIndexedSeq: _*)
  }


  /** Load + parse one deletion vector (storage types: `u` relative
    * file, `p` absolute file, `i` inline z85). */
  private def loadDv(table: String, d: DvDescriptor): RoaringDv.Dv =
    d.storageType match {
      case "u" => RoaringDv.parse(RoaringDv.readFromFile(
        s"$table/${RoaringDv.relativeDvPath(d.pathOrInlineDv)}",
        d.offset, d.sizeInBytes))
      case "p" => RoaringDv.parse(RoaringDv.readFromFile(
        d.pathOrInlineDv, d.offset, d.sizeInBytes))
      case "i" =>
        val b = RoaringDv.z85Decode(d.pathOrInlineDv)
        require(b.length >= d.sizeInBytes,
          s"inline DV decodes to ${b.length} bytes < ${d.sizeInBytes}")
        RoaringDv.parse(java.util.Arrays.copyOf(b, d.sizeInBytes))
      case other => throw new IllegalArgumentException(
        s"unsupported deletion vector storageType '$other'")
    }

  /** Resolve a user predicate against the TABLE schema through the
    * analyzer (typed AttributeReferences, literals coerced to column
    * types), then fold constant subtrees (Cast(Literal) etc.) so the
    * stats evaluator sees plain typed literals. The filter runs over
    * an empty local frame — analysis only, nothing executes. */
  private[graft] def resolvePredicate(spark: SparkSession,
      schema: StructType,
      w: Column): org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
    val empty = spark.createDataFrame(new java.util.ArrayList[Row](), schema)
    val cond = empty.filter(w).queryExecution.analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }.getOrElse(throw new IllegalStateException(
      "filter did not analyze to a Filter node"))
    // RuntimeReplaceable (to_timestamp, to_date, ...) only becomes
    // evaluable after optimizer replacement — do that first, then fold
    val replaced = cond.transformUp {
      case r: org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable =>
        r.replacement
    }
    replaced.transformUp {
      case e: Expression if e.foldable && !e.isInstanceOf[Literal] =>
        Literal.create(
          e.eval(org.apache.spark.sql.catalyst.expressions.EmptyRow), e.dataType)
    }
  }

  /** The table's current schema from log METADATA alone (no scan
    * plan, no file listing beyond the log) — the streaming tail's
    * schema probe. */
  private[graft] def tableSchema(spark: SparkSession, table0: String): StructType = {
    val table = FsIO.normalize(table0.stripSuffix("/"))
    val snap = snapshot(spark, table, None)
    gate(snap)
    DataType.fromJson(snap.meta.schemaString).asInstanceOf[StructType]
  }

  /** The table's current protocol as
    * (minReader, minWriter, readerFeatures, writerFeatures) —
    * introspection for specs and callers deciding writability. */
  private[graft] def tableProtocol(spark: SparkSession, table0: String)
      : (Int, Int, Set[String], Set[String]) = {
    val snap = snapshot(spark, FsIO.normalize(table0.stripSuffix("/")), None)
    (snap.minReaderVersion, snap.minWriterVersion,
      snap.readerFeatures, snap.writerFeatures)
  }

  /** The timestamp of commit `v`: commitInfo.timestamp when present,
    * else the commit file's modification time (the protocol's own
    * in-commit-timestamp fallback order). */
  private def commitTimestamp(table: String, v: Long): Long = {
    var ts = -1L
    eachAction(commitPath(table, v)) { n =>
      if (n.has("commitInfo") && n.get("commitInfo").hasNonNull("timestamp"))
        ts = n.get("commitInfo").get("timestamp").asLong()
    }
    if (ts >= 0) ts
    else {
      val (fs, p) = FsIO.resolve(commitPath(table, v))
      fs.getFileStatus(p).getModificationTime
    }
  }

  /** Streaming-tail entry point by TIME: the version just BEFORE the
    * first commit whose timestamp is >= `tsMs` — i.e. the exclusive
    * start offset that makes a `(start, latest]` pull deliver exactly
    * the commits at/after `tsMs`. Commit timestamps are monotonic in
    * practice (single-writer clock); ties and clock skew resolve to
    * the FIRST qualifying version, so a consumer never misses a
    * commit stamped at its start time. Only surviving (non-log-
    * cleaned) commits are inspectable — a `tsMs` older than the
    * surviving tail resolves to its beginning. */
  private[graft] def versionAtOrAfterTimestamp(table0: String,
      tsMs: Long): Long = {
    val table = FsIO.normalize(table0.stripSuffix("/"))
    val listing = listLog(table)
    require(listing.allVersions.nonEmpty, s"not a Delta table: $table")
    val json = listing.json.sorted
    if (json.isEmpty) // checkpoint-only (log-cleaned) table: only the
      return listing.allVersions.max // tail is inspectable — start there
    json.find(v => commitTimestamp(table, v) >= tsMs)
      .map(_ - 1).getOrElse(json.max) // all older: start at latest
  }

  /** Total dataChange add bytes of commit `v` (log metadata — the
    * sizes ride in the add actions). The streaming tail's byte-based
    * pacing reads this, one commit file scan per version, memoized by
    * the source. */
  private[graft] def commitAddBytes(table0: String, v: Long): Long = {
    val table = FsIO.normalize(table0.stripSuffix("/"))
    var bytes = 0L
    eachAction(commitPath(table, v)) { n =>
      if (n.has("add")) {
        val a = n.get("add")
        if (!a.hasNonNull("dataChange") || a.get("dataChange").asBoolean())
          bytes += Option(a.get("size")).map(_.asLong()).getOrElse(0L)
      }
    }
    bytes
  }

  /** Commit history (driver-side metadata): one row per JSON commit,
    * newest first — version, timestamp, operation, action counts. */
  def history(spark: SparkSession, table0: String): DataFrame = {
    val table = table0.stripSuffix("/")
    val versions = listLog(table).json
    require(versions.nonEmpty, s"history: no Delta log at $table")
    val rows = versions.sorted.reverse.map { v =>
      var ts = 0L; var op: String = null; var nAdd = 0L; var nRemove = 0L
      eachAction(commitPath(table, v)) { n =>
        if (n.has("commitInfo")) {
          val ci = n.get("commitInfo")
          if (ci.hasNonNull("timestamp")) ts = ci.get("timestamp").asLong()
          if (ci.hasNonNull("operation")) op = ci.get("operation").asText()
        }
        if (n.has("add")) nAdd += 1
        if (n.has("remove")) nRemove += 1
      }
      Row(v, ts, op, nAdd, nRemove)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava),
      StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("timestamp", LongType, nullable = false),
        StructField("operation", StringType, nullable = true),
        StructField("num_added_files", LongType, nullable = false),
        StructField("num_removed_files", LongType, nullable = false))))
  }

  /** Latest committed version, or -1 when the table does not exist. */
  def latestVersion(table0: String): Long =
    listLog(table0.stripSuffix("/")).allVersions.maxOption.getOrElse(-1L)

  /** One log listing, every checkpoint form the protocol names:
    * classic single-part, classic multi-part (version -> part file
    * names), and v2 uuid-named manifests (version -> manifest names —
    * several writers may race; any one is a complete state). */
  private final case class LogListing(json: Seq[Long], classic: Seq[Long],
      multi: Map[Long, Seq[String]], v2: Map[Long, Seq[String]]) {
    def allVersions: Seq[Long] =
      json ++ classic ++ multi.keys ++ v2.keys
  }

  private def listLog(table: String): LogListing = {
    val names = FsIO.listFileNames(logDir(table))
    LogListing(
      names.collect { case CommitRe(v) => v.toLong },
      names.collect { case CheckpointRe(v) => v.toLong },
      names.collect { case n @ MultiPartCheckpointRe(v, _, _) => (v.toLong, n) }
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap,
      names.collect { case n @ V2CheckpointRe(v) => (v.toLong, n) }
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap)
  }

  private def snapshot(spark: SparkSession, table: String,
      versionAsOf: Option[Long]): Snapshot = {
    val listing = listLog(table)
    val all = listing.allVersions
    require(all.nonEmpty, s"not a Delta table (no _delta_log commits): $table")
    val latest = all.max
    val target = versionAsOf.getOrElse(latest)
    require(target >= 0 && target <= latest,
      s"versionAsOf $target out of range [0, $latest] for $table")
    // COMPLETE multi-part checkpoints only: the protocol allows
    // SEVERAL complete checkpoints of one version with different part
    // counts (racing writers), each a full state — group the part
    // files by (version, numParts) and accept any set whose parts
    // 1..n are all present, preferring the smallest numParts (fewest
    // files to read). An in-flight or damaged set is simply not a
    // candidate — never an error, the JSON tail may still cover it.
    val completeMulti: Map[Long, Seq[String]] =
      listing.multi.flatMap { case (v, names) =>
        val parts = names.map {
          case n @ MultiPartCheckpointRe(_, p, tot) => (p.toInt, tot.toInt, n)
        }
        parts.groupBy(_._2).toSeq.sortBy(_._1).collectFirst {
          case (tot, set) if set.map(_._1).distinct.sorted == (1 to tot) =>
            v -> set.sortBy(_._1).map(_._3)
        }
      }
    // newest usable checkpoint <= target, any form (equal versions
    // hold identical state — prefer the cheapest read: classic, then
    // multi-part, then v2)
    val cp: Option[(Long, () => CpState)] =
      (listing.classic.filter(_ <= target).map(v => (v, 0,
          () => readCheckpoint(spark,
            Seq(f"${logDir(table)}/$v%020d.checkpoint.parquet")))) ++
        completeMulti.keys.filter(_ <= target).map(v => (v, 1,
          () => readCheckpoint(spark,
            completeMulti(v).map(n => s"${logDir(table)}/$n")))) ++
        listing.v2.keys.filter(_ <= target).map(v => (v, 2,
          () => readV2Checkpoint(spark, table, v, listing.v2(v).min))))
        .minByOption { case (v, pref, _) => (-v, pref) }
        .map { case (v, _, load) => (v, load) }
    val replayFrom = cp.map(_._1 + 1).getOrElse(0L)
    val need = (replayFrom to target).filterNot(listing.json.contains)
    if (need.nonEmpty)
      throw new IllegalArgumentException(
        s"Delta log of $table is missing commit versions ${need.mkString(",")}")
    var meta: Meta = null
    var minReader = 1
    var readerFeatures = Set.empty[String]
    var minWriter = 2
    var writerFeatures = Set.empty[String]
    val adds = mutable.LinkedHashMap.empty[String, AddFile]
    cp.foreach { case (_, load) =>
      val st = load()
      require(st.sidecars.isEmpty, // v2 loads resolve them; classic never has them
        s"checkpoint of $table carries unresolved sidecar references")
      if (st.meta != null) meta = st.meta
      if (st.minReader > 0) { minReader = st.minReader
                              readerFeatures = st.readerFeatures
                              minWriter = st.minWriter
                              writerFeatures = st.writerFeatures }
      st.adds.foreach(ad => adds(ad.path) = ad)
    }
    (replayFrom to target).foreach { v =>
      // A COMMIT is an atomic state transition: its removes apply to
      // the PRIOR state and its adds define the new one, regardless
      // of action ORDER inside the file. A DELETE-with-DV commit can
      // legally serialize as [add(path, newDv), remove(path)] — the
      // spec reconciles order-independently, and applying that pair
      // in line order would silently drop the file (all its live
      // rows). So: buffer per commit, removes first, then adds.
      val commitAdds = Seq.newBuilder[AddFile]
      val commitRemoves = Seq.newBuilder[String]
      eachAction(commitPath(table, v)) { n =>
        if (n.has("metaData")) meta = parseMeta(n.get("metaData"))
        if (n.has("protocol")) {
          val p = n.get("protocol")
          minReader = p.get("minReaderVersion").asInt()
          readerFeatures = jsonStrings(p.get("readerFeatures"))
          minWriter = Option(p.get("minWriterVersion")).map(_.asInt()).getOrElse(2)
          writerFeatures = jsonStrings(p.get("writerFeatures"))
        }
        if (n.has("add")) commitAdds += parseAdd(n.get("add"))
        if (n.has("remove")) commitRemoves += n.get("remove").get("path").asText()
      }
      commitRemoves.result().foreach(adds.remove)
      commitAdds.result().foreach(a => adds(a.path) = a)
    }
    require(meta != null, s"Delta snapshot of $table@$target has no metaData action")
    Snapshot(table, target, meta, minReader, readerFeatures, minWriter,
      writerFeatures, adds.values.toSeq)
  }

  private def gate(s: Snapshot): Unit = s.minReaderVersion match {
    case 1 => ()
    case 2 => () // column-mapping era; parseMeta gates the actual mode
    case 3 =>
      val unsupported = s.readerFeatures -- SupportedReaderFeatures
      require(unsupported.isEmpty,
        s"Delta table ${s.table} requires unsupported reader features: " +
          s"${unsupported.toSeq.sorted.mkString(", ")}")
    case v => throw new IllegalArgumentException(
      s"Delta table ${s.table} requires minReaderVersion $v (supported: 1, 2, " +
        "or 3 with features " + SupportedReaderFeatures.mkString(",") + ")")
  }

  /** Writers reject `id`-mode column mapping: our write paths stage
    * by physical NAME, while an id-resolved foreign table's file
    * column names may have drifted from the metadata — mixing the
    * namespaces would write files its own readers misresolve. Reads
    * (and vacuum, which never interprets columns) stay available. */
  private def writerGate(s: Snapshot, op: String): Unit =
    require(s.meta.columnMapping != "id",
      s"$op: delta.columnMapping.mode=id tables are read-only here " +
        "(id-resolved file column names may not match physical names)")

  /** (predicate, schema, partCols) in the namespace the table's STATS
    * and partitionValues keys use: physical under column mapping
    * `name`, identity otherwise. One definition — fromDelta skipping,
    * both deleteWhere flavors and upsert's prefilter share it. */
  private def statsNamespace(snap: Snapshot, schema: StructType,
      partCols: Seq[String],
      pred: org.apache.spark.sql.catalyst.expressions.Expression)
      : (org.apache.spark.sql.catalyst.expressions.Expression,
         StructType, Seq[String]) =
    if (snap.meta.columnMapping == "none") (pred, schema, partCols)
    else {
      val phys = physicalType(schema).asInstanceOf[StructType]
      val physOf = schema.fieldNames.zip(phys.fieldNames).toMap
      (pred.transform {
        case a: org.apache.spark.sql.catalyst.expressions.AttributeReference
            if physOf.contains(a.name) => a.withName(physOf(a.name))
      }, phys, partCols.map(physOf))
    }

  /** Stage `df` (LOGICAL columns) as new data files of `snap`'s
    * table: under column mapping the staging renames to physical
    * names and partitions by physical dirs — exactly the layout the
    * table's own writer produces. Shared by every rewrite op. */
  private def stageAddsFor(spark: SparkSession, table: String,
      snap: Snapshot, df: DataFrame,
      partCols: Seq[String]): Seq[AddFile] =
    if (snap.meta.columnMapping != "name")
      stageAdds(spark, table, df, partCols)
    else {
      val logical = DataType.fromJson(snap.meta.schemaString)
        .asInstanceOf[StructType]
      val phys = physicalType(logical).asInstanceOf[StructType]
      val physOf = logical.fieldNames.zip(phys.fieldNames).toMap
      stageAdds(spark, table,
        df.select(logical.fieldNames.toIndexedSeq.map(n =>
          col(n).as(physOf(n))): _*),
        partCols.map(physOf))
    }

  /** Per-field physical name under column mapping `name` mode. */
  private def physName(f: StructField): String =
    if (f.metadata.contains("delta.columnMapping.physicalName"))
      f.metadata.getString("delta.columnMapping.physicalName")
    else f.name

  /** Logical -> physical schema: rename every field (recursively —
    * nested struct fields carry their own physicalName metadata). */
  private def physicalType(dt: DataType): DataType = dt match {
    case st: StructType => StructType(st.fields.map(f =>
      f.copy(name = physName(f), dataType = physicalType(f.dataType))))
    case ArrayType(et, n) => ArrayType(physicalType(et), n)
    case MapType(k, v, n) => MapType(physicalType(k), physicalType(v), n)
    case other => other
  }

  /** Physical schema for `id`-mode scans: physicalName-named fields
    * carrying `parquet.field.id` metadata from their
    * delta.columnMapping.id (recursively) — Spark's fieldId.read path
    * then resolves columns by ID, the id-mode contract. A field
    * without an id is loud (reading it by name could silently read a
    * renamed column's bytes). */
  private def fieldIdType(dt: DataType): DataType = dt match {
    case st: StructType => StructType(st.fields.map { f =>
      require(f.metadata.contains("delta.columnMapping.id"),
        s"id-mode table: field ${f.name} lacks delta.columnMapping.id " +
          "metadata — cannot resolve it by parquet field id")
      f.copy(name = physName(f), dataType = fieldIdType(f.dataType),
        metadata = new MetadataBuilder().withMetadata(f.metadata)
          .putLong("parquet.field.id",
            f.metadata.getLong("delta.columnMapping.id")).build())
    })
    case ArrayType(et, n) => ArrayType(fieldIdType(et), n)
    case MapType(k, v, n) => MapType(fieldIdType(k), fieldIdType(v), n)
    case other => other
  }

  /** Stream a commit file's action lines through `f` (one JSON object
    * per line; blank lines skipped). */
  private def eachAction(path: String)(f: JsonNode => Unit): Unit = {
    val in = FsIO.open(path)
    try {
      val br = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, StandardCharsets.UTF_8))
      var line = br.readLine()
      while (line != null) {
        if (line.trim.nonEmpty) f(mapper.readTree(line))
        line = br.readLine()
      }
    } finally in.close()
  }

  private def parseMeta(m: JsonNode): Meta = {
    require(!m.has("format") || m.get("format").get("provider").asText() == "parquet",
      "only parquet-format Delta tables are supported")
    val cfg = Option(m.get("configuration")).filter(_.isObject).map { c =>
      val it = c.properties().iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
      b.result()
    }.getOrElse(Map.empty[String, String])
    // column mapping: `name` mode reads by per-field physicalName
    // metadata (DBR's default after any rename); `id` mode reads by
    // parquet FIELD ID (fieldIdType + the fieldId.read session conf —
    // converted/foreign tables whose file column names drifted from
    // the metadata still resolve). Writers reject id mode.
    val cm = cfg.getOrElse("delta.columnMapping.mode", "none")
    require(cm == "none" || cm == "name" || cm == "id",
      s"delta.columnMapping.mode=$cm is unsupported (none/name/id)")
    val arr = m.get("partitionColumns")
    val partCols = // declared ORDER matters (dir nesting), keep it
      if (arr == null || !arr.isArray) Seq.empty[String]
      else (0 until arr.size()).map(arr.get(_).asText())
    Meta(Option(m.get("id")).map(_.asText()).orNull,
      m.get("schemaString").asText(), partCols, cm, cfg,
      name = Option(m.get("name")).filter(!_.isNull).map(_.asText()).orNull,
      description = Option(m.get("description")).filter(!_.isNull)
        .map(_.asText()).orNull,
      createdTime = Option(m.get("createdTime")).filter(!_.isNull)
        .map(_.asLong()).getOrElse(0L))
  }

  private def parseAdd(a: JsonNode): AddFile = {
    val dv = Option(a.get("deletionVector")).filter(_.isObject).map { d =>
      DvDescriptor(
        d.get("storageType").asText(),
        d.get("pathOrInlineDv").asText(),
        Option(d.get("offset")).map(_.asInt()).getOrElse(0),
        d.get("sizeInBytes").asInt(),
        d.get("cardinality").asLong())
    }.orNull
    val pv = Option(a.get("partitionValues")).filter(_.isObject).map { o =>
      val it = o.properties().iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) {
        val e = it.next()
        b += e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText())
      }
      b.result()
    }.getOrElse(Map.empty[String, String])
    AddFile(a.get("path").asText(), pv,
      Option(a.get("size")).map(_.asLong()).getOrElse(0L),
      Option(a.get("modificationTime")).map(_.asLong()).getOrElse(0L),
      Option(a.get("stats")).filter(_.isTextual).map(_.asText()).orNull,
      dv)
  }

  private def parseCdc(c: JsonNode): CdcFile = {
    val pv = Option(c.get("partitionValues")).filter(_.isObject).map { o =>
      val it = o.properties().iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) {
        val e = it.next()
        b += e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText())
      }
      b.result()
    }.getOrElse(Map.empty[String, String])
    CdcFile(c.get("path").asText(), pv,
      Option(c.get("size")).map(_.asLong()).getOrElse(0L))
  }

  private def jsonStrings(n: JsonNode): Set[String] =
    if (n == null || !n.isArray) Set.empty
    else (0 until n.size()).map(n.get(_).asText()).toSet

  /** Checkpoint state as read back from parquet/json checkpoint
    * files: table meta + protocol + live adds, plus any sidecar file
    * references (v2 manifests only). */
  private final case class CpState(
      meta: Meta, minReader: Int, readerFeatures: Set[String],
      minWriter: Int, writerFeatures: Set[String], adds: Seq[AddFile],
      sidecars: Seq[String] = Nil, declaredVersion: Option[Long] = None)

  /** Checkpoint parquet -> CpState. Accepts several paths at once —
    * a classic multi-part checkpoint is one logical table scanned as
    * N parts (exactly one part carries metaData/protocol). The
    * checkpoint is file METADATA (one row per live file), so a driver
    * collect is the protocol-intended shape. */
  private def readCheckpoint(spark: SparkSession, paths: Seq[String]): CpState = {
    val df = spark.read.parquet(paths: _*)
    val have = df.schema.fieldNames.toSet
    var meta: Meta = null
    var minReader = 0
    var features = Set.empty[String]
    var minWriter = 2
    var wFeatures = Set.empty[String]
    val adds = Seq.newBuilder[AddFile]
    val sidecars = Seq.newBuilder[String]
    var declared: Option[Long] = None
    val ctx = paths.head
    val cols = Seq("metaData", "protocol", "add", "sidecar",
      "checkpointMetadata").filter(have)
    df.select(cols.map(col): _*).collect().foreach { row =>
      cols.zipWithIndex.foreach { case (c, i) =>
        if (!row.isNullAt(i)) {
          val st = row.getStruct(i)
          c match {
            // collected arrays/maps are runtime mutable.ArraySeq /
            // collection.Map — convert before they land in immutable-
            // typed fields (the checkcast is at the constructor)
            case "metaData" =>
              require(meta == null,
                s"duplicate metaData rows across checkpoint parts: $ctx")
              val cfg = get[scala.collection.Map[String, String]](st, "configuration")
                .map(_.toMap).getOrElse(Map.empty[String, String])
              val cm = cfg.getOrElse("delta.columnMapping.mode", "none")
              require(cm == "none" || cm == "name" || cm == "id",
                s"delta.columnMapping.mode=$cm is unsupported (none/name/id)")
              meta = Meta(
                get[String](st, "id").orNull,
                get[String](st, "schemaString").getOrElse(
                  throw new IllegalArgumentException(
                    s"checkpoint metaData without schemaString: $ctx")),
                get[scala.collection.Seq[String]](st, "partitionColumns")
                  .map(_.toSeq).getOrElse(Nil),
                cm, cfg,
                name = get[String](st, "name").orNull,
                description = get[String](st, "description").orNull,
                createdTime = get[Long](st, "createdTime").getOrElse(0L))
            case "protocol" =>
              minReader = get[Int](st, "minReaderVersion").getOrElse(1)
              features = get[scala.collection.Seq[String]](st, "readerFeatures")
                .map(_.toSet).getOrElse(Set.empty)
              minWriter = get[Int](st, "minWriterVersion").getOrElse(2)
              wFeatures = get[scala.collection.Seq[String]](st, "writerFeatures")
                .map(_.toSet).getOrElse(Set.empty)
            case "add" => adds += addFromRow(st, ctx)
            case "sidecar" =>
              sidecars += get[String](st, "path").getOrElse(
                throw new IllegalArgumentException(
                  s"sidecar action without path: $ctx"))
            case "checkpointMetadata" =>
              declared = get[Long](st, "version")
          }
        }
      }
    }
    CpState(meta, minReader, features, minWriter, wFeatures,
      adds.result(), sidecars.result(), declared)
  }

  /** One collected checkpoint `add` struct -> AddFile (shared by the
    * classic/multi-part/v2-manifest readers and the sidecar scan). */
  private def addFromRow(st: Row, ctx: String): AddFile = {
    val dv = get[Row](st, "deletionVector").map { d =>
      DvDescriptor(
        get[String](d, "storageType").getOrElse(
          throw new IllegalArgumentException(
            s"checkpoint deletionVector without storageType: $ctx")),
        get[String](d, "pathOrInlineDv").get,
        get[Int](d, "offset").getOrElse(0),
        get[Int](d, "sizeInBytes").get,
        get[Long](d, "cardinality").get)
    }.orNull
    AddFile(
      get[String](st, "path").get,
      get[scala.collection.Map[String, String]](st, "partitionValues")
        .map(_.toMap).getOrElse(Map.empty[String, String]),
      get[Long](st, "size").getOrElse(0L),
      get[Long](st, "modificationTime").getOrElse(0L),
      get[String](st, "stats").orNull,
      dv)
  }

  /** V2 (uuid-named) checkpoint: the manifest (parquet or json) holds
    * protocol/metaData/checkpointMetadata plus either the add actions
    * directly or `sidecar` references to parquet files under
    * `_delta_log/_sidecars/` that carry them. Sidecar scans stay one
    * bounded parquet read of file METADATA — same driver-memory shape
    * as classic checkpoints. */
  private def readV2Checkpoint(spark: SparkSession, table: String,
      version: Long, manifestName: String): CpState = {
    val path = s"${logDir(table)}/$manifestName"
    val st0: CpState =
      if (manifestName.endsWith(".json")) {
        var meta: Meta = null
        var minReader = 0
        var features = Set.empty[String]
        var minWriter = 2
        var wFeatures = Set.empty[String]
        val adds = Seq.newBuilder[AddFile]
        val sidecars = Seq.newBuilder[String]
        eachAction(path) { n =>
          if (n.has("metaData")) meta = parseMeta(n.get("metaData"))
          if (n.has("protocol")) {
            val p = n.get("protocol")
            minReader = p.get("minReaderVersion").asInt()
            features = jsonStrings(p.get("readerFeatures"))
            minWriter = Option(p.get("minWriterVersion")).map(_.asInt()).getOrElse(2)
            wFeatures = jsonStrings(p.get("writerFeatures"))
          }
          if (n.has("add")) adds += parseAdd(n.get("add"))
          if (n.has("sidecar"))
            sidecars += n.get("sidecar").get("path").asText()
          if (n.has("checkpointMetadata")) {
            val v = n.get("checkpointMetadata").get("version").asLong()
            require(v == version,
              s"v2 checkpoint $manifestName declares version $v, " +
                s"expected $version")
          }
        }
        CpState(meta, minReader, features, minWriter, wFeatures,
          adds.result(), sidecars.result())
      } else readCheckpoint(spark, Seq(path))
    // a misnamed/copied manifest must not apply at the wrong version —
    // the filename is the log's claim, checkpointMetadata the writer's
    st0.declaredVersion.foreach(v => require(v == version,
      s"v2 checkpoint $manifestName declares version $v, " +
        s"expected $version"))
    if (st0.sidecars.isEmpty) st0
    else {
      // sidecar path: file name relative to _delta_log/_sidecars/, or
      // an absolute URI (PROTOCOL.md "Sidecar File Information")
      val scPaths = st0.sidecars.map { raw =>
        val u = try new java.net.URI(raw) catch {
          case e: java.net.URISyntaxException => throw
            new IllegalArgumentException(s"invalid sidecar path URI: $raw", e)
        }
        if (u.isAbsolute) new org.apache.hadoop.fs.Path(u).toString
        else s"${logDir(table)}/_sidecars/${u.getPath}"
      }
      scPaths.foreach(p => require(FsIO.exists(p),
        s"v2 checkpoint $manifestName references a missing sidecar: $p"))
      val df = spark.read.parquet(scPaths: _*)
      require(df.schema.fieldNames.contains("add"),
        s"v2 checkpoint sidecars of $manifestName carry no add column")
      val scAdds = df.select(col("add")).collect().collect {
        case row if !row.isNullAt(0) => addFromRow(row.getStruct(0), scPaths.head)
      }.toSeq
      st0.copy(adds = st0.adds ++ scAdds, sidecars = Nil)
    }
  }

  /** Null-safe by-name struct field access (checkpoint schemas vary
    * by writer — absent and null fields both read as None). */
  private def get[T](r: Row, name: String): Option[T] = {
    val i = try r.fieldIndex(name) catch { case _: IllegalArgumentException => -1 }
    if (i < 0 || r.isNullAt(i)) None else Some(r.get(i).asInstanceOf[T])
  }

  /** `add.path` is a URL-encoded path relative to the table root, or
    * an absolute URI (PROTOCOL.md "Add File and Remove File"). */
  private def resolveDataPath(table: String, raw: String): String = {
    val u = try new java.net.URI(raw) catch {
      case e: java.net.URISyntaxException =>
        throw new IllegalArgumentException(s"invalid add.path URI: $raw", e)
    }
    if (u.isAbsolute) new org.apache.hadoop.fs.Path(u).toString
    else s"$table/${u.getPath}"
  }

  /** Partition-value string -> typed literal, per the protocol's
    * partition-value serialization (numbers/bools plain, dates
    * yyyy-MM-dd, timestamps yyyy-MM-dd HH:mm:ss[.SSSSSS] — all exactly
    * what a string cast parses under the UTC session). */
  private def typedPartitionValue(v: String, dt: DataType): Column = dt match {
    case BinaryType => throw new IllegalArgumentException(
      "binary partition columns are not part of the Delta protocol")
    case _ if v == null => lit(null).cast(dt)
    case _ => lit(v).cast(dt)
  }

  // ------------------------------------------------------------------
  // Write path
  // ------------------------------------------------------------------

  /** Write `df` as a Delta commit. `mode`: "overwrite" (logical
    * replace — previous files get `remove` actions, old versions stay
    * time-travelable) or "append". Creates the table (version 0 with
    * `protocol`+`metaData`) when none exists; otherwise the schema and
    * partitioning must match the table's (loud mismatch, no silent
    * evolution). Writes a single-part checkpoint + `_last_checkpoint`
    * every `checkpointInterval` commits. */
  def toDelta(df: DataFrame, table0: String, mode: String = "overwrite",
      partitionBy: Seq[String] = Nil,
      checkpointInterval: Int = DefaultCheckpointInterval): Unit = {
    // normalized so staging-prefix arithmetic matches listing output
    // for file:/, relative and remote-scheme table paths alike
    val table = FsIO.normalize(table0.stripSuffix("/"))
    require(mode == "overwrite" || mode == "append",
      s"toDelta: mode must be overwrite|append, got $mode")
    partitionBy.foreach(c => require(df.schema.fieldNames.contains(c),
      s"toDelta: partition column $c not in the DataFrame"))
    require(partitionBy.size < df.schema.size,
      "toDelta: at least one non-partition column is required")
    val spark = df.sparkSession
    val existing: Option[Snapshot] =
      if (latestVersion(table) >= 0) Some(snapshot(spark, table, None)) else None
    existing.foreach { s =>
      gate(s) // must be able to READ a table before mutating its log
      writerGate(s, "toDelta")
      // column-mapped (name mode) tables ACCEPT writes — the staging
      // below renames to physical columns. DV-carrying tables accept
      // blind APPENDS (new files touch no DV) AND overwrites (r17 —
      // the logical replace tombstones every file, descriptors riding
      // on the tombstones for DV-file bookkeeping).
      val exSchema = DataType.fromJson(s.meta.schemaString).asInstanceOf[StructType]
      require(relaxed(exSchema) == relaxed(df.schema),
        s"toDelta: schema mismatch with existing table $table\n  table: " +
          s"${exSchema.simpleString}\n  data:  ${df.schema.simpleString}")
      require(s.meta.partitionColumns == partitionBy,
        s"toDelta: partitionBy ${partitionBy.mkString(",")} != table's " +
          s"${s.meta.partitionColumns.mkString(",")}")
    }
    val version = existing.map(_.version + 1).getOrElse(0L)
    val now = System.currentTimeMillis()

    // Stage distributed, promote by rename, publish in one commit.
    // Column-mapped target: stage under PHYSICAL names (data files,
    // partition dirs, stats keys all live in the physical namespace —
    // exactly the layout the table's own writer produces).
    val (stageDf, stagePartBy) = existing
      .filter(_.meta.columnMapping == "name").map { s =>
        val logical = DataType.fromJson(s.meta.schemaString)
          .asInstanceOf[StructType]
        val phys = physicalType(logical).asInstanceOf[StructType]
        val physOf = logical.fieldNames.zip(phys.fieldNames).toMap
        (df.select(logical.fieldNames.toIndexedSeq.map(n =>
          col(n).as(physOf(n))): _*), partitionBy.map(physOf))
      }.getOrElse((df, partitionBy))
    val adds = stageAdds(spark, table, stageDf, stagePartBy)

    val removes: Seq[AddFile] =
      if (mode == "overwrite") existing.map(_.adds).getOrElse(Nil)
      else Nil
    val lines = Seq.newBuilder[String]
    val ci = mapper.createObjectNode()
    val cib = ci.putObject("commitInfo")
    cib.put("timestamp", now)
    cib.put("operation", "WRITE")
    cib.putObject("operationParameters").put("mode",
      if (mode == "overwrite") "Overwrite" else "Append")
    cib.put("engineInfo", "graft")
    lines += mapper.writeValueAsString(ci)
    if (existing.isEmpty) {
      val pn = mapper.createObjectNode()
      val p = pn.putObject("protocol")
      p.put("minReaderVersion", 1)
      p.put("minWriterVersion", 2)
      lines += mapper.writeValueAsString(pn)
      val mn = mapper.createObjectNode()
      val m = mn.putObject("metaData")
      m.put("id", java.util.UUID.randomUUID().toString)
      val fmt = m.putObject("format")
      fmt.put("provider", "parquet")
      fmt.putObject("options")
      m.put("schemaString", df.schema.json)
      val pc = m.putArray("partitionColumns")
      partitionBy.foreach(pc.add)
      m.putObject("configuration")
      m.put("createdTime", now)
      lines += mapper.writeValueAsString(mn)
    }
    removes.foreach { rm =>
      val rn = mapper.createObjectNode()
      val r = rn.putObject("remove")
      r.put("path", rm.path)
      r.put("deletionTimestamp", now)
      r.put("dataChange", true)
      // the removed file VERSION's descriptor rides on the tombstone
      // (PROTOCOL.md) so DV-file bookkeeping sees every reference
      if (rm.dv != null) {
        val dn = r.putObject("deletionVector")
        dn.put("storageType", rm.dv.storageType)
        dn.put("pathOrInlineDv", rm.dv.pathOrInlineDv)
        dn.put("offset", rm.dv.offset)
        dn.put("sizeInBytes", rm.dv.sizeInBytes)
        dn.put("cardinality", rm.dv.cardinality)
      }
      lines += mapper.writeValueAsString(rn)
    }
    adds.foreach { a =>
      val an = mapper.createObjectNode()
      val ad = an.putObject("add")
      ad.put("path", a.path)
      val pv = ad.putObject("partitionValues")
      a.partitionValues.foreach { case (k, v) =>
        if (v == null) pv.putNull(k) else pv.put(k, v)
      }
      ad.put("size", a.size)
      ad.put("modificationTime", a.modificationTime)
      ad.put("dataChange", true)
      if (a.stats != null) ad.put("stats", a.stats)
      lines += mapper.writeValueAsString(an)
    }
    commit(table, version, lines.result())
    if (checkpointInterval > 0 && version > 0 &&
        version % checkpointInterval == 0)
      writeCheckpoint(spark, table, version)
  }

  /** Move staged part files into the table root (keeping partition
    * subdirs) and build their `add` entries. Partition VALUES come
    * from hive-unescaping the `col=value` dir names our own staging
    * write produced; the `add.path` is the URL-encoded on-disk
    * relative path per the protocol. */
  private def promoteStaged(table: String, staging: String,
      partitionBy: Seq[String]): Seq[AddFile] = {
    val files = FsIO.listFilesRecursive(staging)
      .filter { case (p, _, _) =>
        val name = p.substring(p.lastIndexOf('/') + 1)
        name.endsWith(".parquet") && !name.startsWith("_") && !name.startsWith(".")
      }
    files.map { case (src, size, _) =>
      val rel = src.stripPrefix(staging).stripPrefix("/")
      val segs = rel.split("/", -1).toSeq
      val dirSegs = segs.dropRight(1)
      require(dirSegs.size == partitionBy.size,
        s"staged file depth ${dirSegs.size} != ${partitionBy.size} partition levels: $rel")
      val pv = dirSegs.zip(partitionBy).map { case (seg, expect) =>
        val eq = seg.indexOf('=')
        require(eq > 0 && seg.substring(0, eq) == expect,
          s"staged dir $seg does not match partition column $expect")
        val raw = seg.substring(eq + 1)
        expect -> (if (raw == "__HIVE_DEFAULT_PARTITION__") null
                   else unescapeHive(raw))
      }.toMap
      val dst = s"$table/$rel"
      FsIO.rename(src, dst)
      val (fs, p) = FsIO.resolve(dst)
      val mtime = fs.getFileStatus(p).getModificationTime
      AddFile(encodePath(rel), pv, size, mtime)
    }
  }

  /** OPTIMIZE: rewrite the current snapshot's data files into
    * ~`targetFileBytes` files per partition group — optionally
    * Z-ORDER clustered on `zorderBy` (ZOrderLayout's bit-interleaved
    * rank key: range partition + sort within, so every output file
    * covers a small hyper-rectangle and the recollected stats bounds
    * get TIGHT — the same layout move as Delta's OPTIMIZE ZORDER BY).
    * The rewrite commits with dataChange=false adds/removes per the
    * protocol (no data changed — incremental consumers skip it); old
    * versions stay time-travelable until vacuum. Returns the new
    * version. */
  def compact(spark: SparkSession, table0: String,
      targetFileBytes: Long = 128L << 20, zorderBy: Seq[String] = Nil,
      checkpointInterval: Int = DefaultCheckpointInterval): Long = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val table = FsIO.normalize(table0.stripSuffix("/"))
    val snap = snapshot(spark, table, None)
    gate(snap)
    writerGate(snap, "compact")
    val schema = DataType.fromJson(snap.meta.schemaString).asInstanceOf[StructType]
    val partCols = snap.meta.partitionColumns
    val dataSchema = StructType(schema.filterNot(f => partCols.contains(f.name)))
    zorderBy.foreach(c => require(dataSchema.fieldNames.contains(c),
      s"compact: zorderBy column $c is not a data column of $table"))
    // layout-only rewrite: read AND write in the files' own namespace
    // (physical under column mapping) — no renaming round trip needed
    val cmPhysOf: Map[String, String] =
      if (snap.meta.columnMapping != "name") Map.empty
      else schema.fieldNames.zip(
        physicalType(schema).asInstanceOf[StructType].fieldNames).toMap
    val dataSchemaDisk =
      if (cmPhysOf.isEmpty) dataSchema
      else StructType(dataSchema.fields.map(f =>
        f.copy(name = cmPhysOf(f.name),
          dataType = physicalType(f.dataType))))
    val zorderDisk = zorderBy.map(c => cmPhysOf.getOrElse(c, c))
    val version = snap.version + 1
    val staging = s"$table/_staging/${java.util.UUID.randomUUID()}"
    val groups = snap.adds.groupBy(_.partitionValues).toSeq.zipWithIndex
    // one rewrite job per partition group, submitted CONCURRENTLY
    // (Spark schedules independent jobs in parallel; a serial loop
    // would underutilize the cluster on many small groups)
    import scala.concurrent.{Await, Future, ExecutionContext}
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(groups.size, 8).max(1))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val newAdds = try {
      val futures = groups.map { case ((pv, files), gi) => Future {
        // the group's on-disk partition dir comes from its existing
        // files (same pv -> same hive dir by construction)
        val relDir = {
          val u = new java.net.URI(files.head.path)
          val rel = u.getPath
          // foreign absolute add.paths: place rewritten files at root
          if (u.isAbsolute || rel.startsWith("/")) ""
          else {
            val cut = rel.lastIndexOf('/')
            if (cut < 0) "" else rel.substring(0, cut + 1)
          }
        }
        val nFiles = math.max(1L,
          (files.map(_.size).sum + targetFileBytes - 1) / targetFileBytes).toInt
        // DV-carrying files compact through the DV-filtered scan: the
        // rewrite MATERIALIZES the masked deletes (logical rows are
        // unchanged, so dataChange=false still holds — this is purge
        // semantics folded into the layout rewrite)
        val (dvFiles, plainFiles) = files.partition(_.dv != null)
        val scans = Seq.newBuilder[DataFrame]
        if (plainFiles.nonEmpty)
          scans += spark.read.schema(dataSchemaDisk)
            .parquet(plainFiles.map(f => resolveDataPath(table, f.path)): _*)
        if (dvFiles.nonEmpty)
          scans += dvFilteredScan(spark, table, dataSchemaDisk, dvFiles)
        val df = scans.result().reduce(_ union _)
        val gdir = s"$staging/g$gi"
        if (zorderBy.isEmpty) // pure compaction: no shuffle
          df.coalesce(nFiles).write.mode(SaveMode.Overwrite).parquet(gdir)
        else // ONE clustering recipe, owned by ZOrderLayout
          graft.operators.ZOrderLayout.writeZOrdered(df, gdir, zorderDisk, nFiles)
        FsIO.listFilesRecursive(gdir).collect {
          case (pth, size, _) if pth.endsWith(".parquet") &&
              !pth.substring(pth.lastIndexOf('/') + 1).startsWith("_") =>
            val name = pth.substring(pth.lastIndexOf('/') + 1)
            val dst = s"$table/$relDir$name"
            FsIO.rename(pth, dst)
            val (fs, hp) = FsIO.resolve(dst)
            AddFile(encodePath(s"$relDir$name"), pv, size,
              fs.getFileStatus(hp).getModificationTime)
        }
      } }
      Await.result(Future.sequence(futures),
        scala.concurrent.duration.Duration.Inf).flatten
    } finally {
      pool.shutdown()
      FsIO.deleteRecursive(staging) // failed rewrites leak no staging
    }
    val statsByPath = DeltaStats.collect(spark, dataSchemaDisk.map(_.name),
      newAdds.map(a => resolveDataPath(table, a.path)))
    val withStats = newAdds.map(a =>
      a.copy(stats = statsByPath.getOrElse(resolveDataPath(table, a.path), null)))
    commitActions(table, version, "OPTIMIZE",
      Map("targetFileBytes" -> targetFileBytes.toString) ++
        (if (zorderBy.nonEmpty) Map("zOrderBy" -> zorderBy.mkString(","))
         else Map.empty),
      removes = snap.adds.map(_.path), adds = withStats,
      dataChange = false, // layout-only rewrite (DV masks materialized)
      removeDvs = snap.adds.collect {
        case a if a.dv != null => a.path -> a.dv }.toMap)
    if (checkpointInterval > 0 && version % checkpointInterval == 0)
      writeCheckpoint(spark, table, version)
    version
  }

  /** VACUUM: delete data files referenced by NONE of the newest
    * `retainVersions` snapshots. Time travel to older versions stops
    * working — that is vacuum's contract (files are gone; the log
    * stays). `dryRun` (default true) only returns the would-delete
    * table-relative paths. */
  def vacuum(spark: SparkSession, table0: String, retainVersions: Int = 1,
      dryRun: Boolean = true): Seq[String] = {
    require(retainVersions >= 1, "vacuum must retain at least the current version")
    val table = FsIO.normalize(table0.stripSuffix("/"))
    val latest = latestVersion(table)
    require(latest >= 0, s"not a Delta table: $table")
    val keepFrom = math.max(0L, latest - retainVersions + 1)
    val retained = (keepFrom to latest).flatMap { v =>
      try Some(snapshot(spark, table, Some(v)))
      catch { // versions compacted away below a checkpoint still vacuum fine
        case e: IllegalArgumentException
          if e.getMessage != null && e.getMessage.contains("missing commit") => None
      }
    }
    val referenced = retained.flatMap(_.adds
      .map(a => FsIO.normalize(resolveDataPath(table, a.path)))).toSet
    // deletion-vector .bin files referenced by any retained version —
    // everything else matching the DV naming convention is an orphan
    // (a purge/overwrite dropped its last reference)
    val referencedBins = retained.flatMap(_.adds.flatMap(a => Option(a.dv))
      .collect {
        case d if d.storageType == "u" => FsIO.normalize(
          s"$table/${RoaringDv.relativeDvPath(d.pathOrInlineDv)}")
        case d if d.storageType == "p" => FsIO.normalize(d.pathOrInlineDv)
      }).toSet
    // cdc change files are referenced by RETAINED commits' cdc
    // actions (never by adds, and never carried into checkpoints);
    // files of aged-out commits become sweepable like data files
    val referencedCdc: Set[String] = (keepFrom to latest).flatMap { v =>
      val p = commitPath(table, v)
      if (!FsIO.exists(p)) Nil
      else {
        val b = Seq.newBuilder[String]
        eachAction(p)(n => if (n.has("cdc")) b += FsIO.normalize(
          resolveDataPath(table, n.get("cdc").get("path").asText())))
        b.result()
      }
    }.toSet
    val all = FsIO.listFilesRecursive(table)
    val onDisk = all.collect {
      case (p, _, _) if p.endsWith(".parquet") &&
          !p.contains("/_delta_log/") && !p.contains("/_staging/") &&
          !p.contains("/_change_data/") => p
    }
    // _change_data gets the same 24h grace as staging (an in-flight
    // commit stages its change files before the commit references them)
    val cdcStaleCutoff = System.currentTimeMillis() - 24L * 3600 * 1000
    val cdcOrphans = all.collect {
      case (p, _, mtime) if p.contains("/_change_data/") &&
          p.endsWith(".parquet") && mtime < cdcStaleCutoff &&
          !referencedCdc(FsIO.normalize(p)) => p
    }
    // stale staging attempts (a CRASHED writer's attempt-unique
    // subdir is otherwise never reclaimed): sweep files older than
    // 24h — far beyond any live write's staging lifetime
    val staleCutoff = System.currentTimeMillis() - 24L * 3600 * 1000
    // DV .bin orphans get the SAME 24h grace as staging:
    // deleteWhereDv writes its .bin at the table root BEFORE the
    // commit that references it, so a freshly written unreferenced
    // .bin may be an in-flight delete, not garbage. (Truly orphaned
    // bins — purged/overwritten references — age past the window.)
    val binOrphans = all.collect {
      case (p, _, mtime) if p.endsWith(".bin") &&
          p.substring(p.lastIndexOf('/') + 1).startsWith("deletion_vector_") &&
          !p.contains("/_delta_log/") && mtime < staleCutoff &&
          !referencedBins(FsIO.normalize(p)) => p
    }
    val staleStaging = FsIO.listFilesRecursive(s"$table/_staging").collect {
      case (p, _, mtime) if mtime < staleCutoff => p
    }
    val candidates = onDisk.filterNot(referenced) ++ binOrphans ++
      cdcOrphans ++ staleStaging
    if (!dryRun) candidates.foreach(FsIO.deleteRecursive)
    candidates.map(_.stripPrefix(table).stripPrefix("/"))
  }

  /** REORG-PURGE (Delta's `REORG TABLE ... APPLY (PURGE)`): rewrite
    * exactly the files carrying deletion vectors to their surviving
    * rows, dropping the DVs. Logical rows are unchanged, so the
    * commit is dataChange=false — incremental tails deliver nothing,
    * like OPTIMIZE. This closes the DV lifecycle: after a purge the
    * snapshot is DV-free, so checkpoints, maintenance and full
    * writes unlock, and [[vacuum]] reclaims the orphaned .bin files
    * once the DV-carrying versions age out. Untouched files stay
    * untouched metadata — cost scales with the DV-carrying files
    * only. Returns the committed version (unchanged when no file
    * carries a DV). */
  def purgeDeletionVectors(spark: SparkSession, table0: String,
      checkpointInterval: Int = DefaultCheckpointInterval): Long = {
    val table = FsIO.normalize(table0.stripSuffix("/"))
    val snap = snapshot(spark, table, None)
    gate(snap)
    writerGate(snap, "purgeDeletionVectors")
    val dvFiles = snap.adds.filter(_.dv != null)
    if (dvFiles.isEmpty) return snap.version // already clean
    val schema = DataType.fromJson(snap.meta.schemaString).asInstanceOf[StructType]
    val partCols = snap.meta.partitionColumns
    // readAdds applies the DV anti-filter in-scan: survivors only
    val survivors = readAdds(spark, table, schema, partCols, dvFiles,
      cm = snap.meta.columnMapping)
    val adds = stageAddsFor(spark, table, snap, survivors, partCols)
    val version = snap.version + 1
    commitActions(table, version, "REORG",
      Map("applyPurge" -> "true", "purgedFiles" -> dvFiles.size.toString),
      removes = dvFiles.map(_.path), adds = adds, dataChange = false,
      removeDvs = dvFiles.map(a => a.path -> a.dv).toMap)
    // the NEW snapshot is DV-free, so checkpointing is legal again
    if (checkpointInterval > 0 && version % checkpointInterval == 0)
      writeCheckpoint(spark, table, version)
    version
  }

  /** RESTORE: make the table's CURRENT state equal version `toVersion`
    * again, as a NEW commit (re-add that version's files, remove the
    * current files not in it) — history is preserved, nothing is
    * copied or rewritten (metadata-only, like Delta's RESTORE
    * command). Fails if the target version's files were vacuumed.
    * Returns the committed version. */
  def restore(spark: SparkSession, table0: String, toVersion: Long,
      checkpointInterval: Int = DefaultCheckpointInterval): Long = {
    val table = FsIO.normalize(table0.stripSuffix("/"))
    val target = snapshot(spark, table, Some(toVersion))
    val current = snapshot(spark, table, None)
    gate(current)
    writerGate(current, "restore")
    require(target.meta.schemaString == current.meta.schemaString &&
        target.meta.partitionColumns == current.meta.partitionColumns,
      s"restore: schema/partitioning changed since version $toVersion")
    target.adds.foreach { a =>
      require(FsIO.exists(resolveDataPath(table, a.path)),
        s"restore: data file of version $toVersion was vacuumed: ${a.path}")
      // a DV-masked file version needs its .bin too (restore is
      // metadata-only on DV tables: re-adds carry the descriptors);
      // 'u' = relative uuid file, 'p' = absolute path, 'i' = inline
      if (a.dv != null && a.dv.storageType != "i") {
        val dvPath =
          if (a.dv.storageType == "u")
            s"$table/${RoaringDv.relativeDvPath(a.dv.pathOrInlineDv)}"
          else a.dv.pathOrInlineDv
        require(FsIO.exists(dvPath),
          s"restore: deletion vector of version $toVersion was vacuumed: " +
            a.dv.pathOrInlineDv)
      }
    }
    // file-VERSION identity is (path, dv): the same path can live in
    // both versions under different deletion vectors, and restoring
    // must swap the descriptor (remove-then-add within the commit —
    // replay applies a commit's removes before its adds)
    def fileKey(a: AddFile): (String, String) =
      (a.path, if (a.dv == null) "" else a.dv.pathOrInlineDv + "@" +
        a.dv.offset + ":" + a.dv.sizeInBytes)
    val currentKeys = current.adds.map(fileKey).toSet
    val targetKeys = target.adds.map(fileKey).toSet
    val readds = target.adds.filterNot(a => currentKeys(fileKey(a)))
    val removes = current.adds.filterNot(a => targetKeys(fileKey(a)))
    val version = current.version + 1
    commitActions(table, version, "RESTORE",
      Map("version" -> toVersion.toString),
      removes = removes.map(_.path), adds = readds, dataChange = true,
      removeDvs = removes.collect {
        case a if a.dv != null => a.path -> a.dv }.toMap)
    if (checkpointInterval > 0 && version % checkpointInterval == 0)
      writeCheckpoint(spark, table, version)
    version
  }

  /** ALTER TABLE ... RENAME COLUMN — the operation column mapping
    * exists for, METADATA-ONLY: no data file is touched, the field's
    * physical name stays whatever the files carry, and only the
    * LOGICAL name in the schemaString changes. A plain table upgrades
    * to column mapping `name` mode on its first rename: every field
    * gets physicalName = its on-disk name (the identity mapping the
    * existing files already satisfy) + a stable column id, the
    * configuration gains mode/maxColumnId, and the protocol upgrades
    * (legacy reader 2 / writer 5, or the columnMapping feature on
    * feature-era tables). Stats and partitionValues keys are physical
    * and stay valid untouched. Returns the committed version. */
  def renameColumn(spark: SparkSession, table0: String,
      from: String, to: String,
      checkpointInterval: Int = DefaultCheckpointInterval): Long = {
    val table = FsIO.normalize(table0.stripSuffix("/"))
    val snap = snapshot(spark, table, None)
    gate(snap)
    writerGate(snap, "renameColumn")
    val old = DataType.fromJson(snap.meta.schemaString).asInstanceOf[StructType]
    require(old.fieldNames.contains(from),
      s"renameColumn: no column '$from' in ${old.fieldNames.mkString(",")}")
    // case-INSENSITIVE collision guard: Spark resolves names
    // case-insensitively by default, so 'ID' next to 'id' bricks reads
    require(!old.fieldNames.exists(_.equalsIgnoreCase(to)),
      s"renameColumn: column '$to' already exists (case-insensitive)")
    require(to.nonEmpty && !to.contains(".") && !to.contains("`"),
      s"renameColumn: '$to' would break name-based references")
    // CHECK constraints / generation expressions referencing the
    // renamed column would silently dangle — reject loudly (the
    // protocol requires a conforming rename to update them). The test
    // PARSES the expression and looks for a real attribute reference
    // (a name inside a string literal or comment is not one);
    // unparseable foreign text falls back to a conservative
    // word-boundary match. Generation expressions are collected from
    // NESTED struct fields too — each field carries its own metadata.
    def referencesFrom(text: String): Boolean =
      try {
        import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
        org.apache.spark.sql.graftbridge.Bridge
          .parseExpression(spark, text).collect {
            case a: UnresolvedAttribute => a.nameParts.head
          }.exists(_.equalsIgnoreCase(from))
      } catch {
        case scala.util.control.NonFatal(_) =>
          ("(?i)\\b" + java.util.regex.Pattern.quote(from) + "\\b").r
            .findFirstIn(text).isDefined
      }
    snap.meta.configuration.foreach { case (k, v) =>
      require(!(k.startsWith("delta.constraints.") && referencesFrom(v)),
        s"renameColumn: CHECK constraint $k references '$from' — drop " +
          "the constraint first")
    }
    def genExprs(st: StructType, prefix: String): Seq[(String, String)] =
      st.fields.toSeq.flatMap { f =>
        val own =
          if (f.metadata.contains("delta.generationExpression"))
            Seq((prefix + f.name,
              f.metadata.getString("delta.generationExpression")))
          else Nil
        own ++ (f.dataType match {
          case s: StructType => genExprs(s, prefix + f.name + ".")
          case _ => Nil
        })
      }
    genExprs(old, "").foreach { case (path, gen) =>
      require(!referencesFrom(gen),
        s"renameColumn: generated column $path references '$from' — " +
          "unsupported")
    }
    val wasCm = snap.meta.columnMapping == "name"
    // first rename upgrades to column mapping with the IDENTITY
    // physical mapping — exactly the layout the existing files carry.
    // Already-CM tables: PIN every field's physical name explicitly
    // (a foreign field missing the key resolves by FALLBACK to its
    // logical name today; renaming such a field without stamping the
    // old name would silently re-point it at a column the files do
    // not contain — all-NULL reads)
    val upgraded =
      if (wasCm) StructType(old.fields.map { f =>
        f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
          .putString("delta.columnMapping.physicalName", physName(f))
          .build())
      })
      else StructType(old.fields.zipWithIndex.map { case (f, i) =>
        f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
          .putString("delta.columnMapping.physicalName", f.name)
          .putLong("delta.columnMapping.id", i + 1L)
          .build())
      })
    val renamed = StructType(upgraded.fields.map(f =>
      if (f.name == from) f.copy(name = to) else f))
    val newPartCols = snap.meta.partitionColumns.map(c =>
      if (c == from) to else c)
    val newCfg = snap.meta.configuration ++
      (if (wasCm) Map.empty[String, String]
       else Map("delta.columnMapping.mode" -> "name",
         "delta.columnMapping.maxColumnId" -> old.size.toString))
    val lines = Seq.newBuilder[String]
    val ci = mapper.createObjectNode()
    val cib = ci.putObject("commitInfo")
    cib.put("timestamp", System.currentTimeMillis())
    cib.put("operation", "RENAME COLUMN")
    val op = cib.putObject("operationParameters")
    op.put("from", from); op.put("to", to)
    cib.put("engineInfo", "graft")
    lines += mapper.writeValueAsString(ci)
    if (!wasCm) {
      // protocol upgrade: feature-era tables ENUMERATE columnMapping;
      // legacy tables move to reader 2 / writer 5 (which imply it)
      val pn = mapper.createObjectNode()
      val pj = pn.putObject("protocol")
      if (snap.minReaderVersion >= 3 || snap.minWriterVersion >= 7) {
        val rf = (if (snap.minReaderVersion >= 3) snap.readerFeatures
          else legacyReaderFeatures(snap.minReaderVersion)) + "columnMapping"
        val wf = (if (snap.minWriterVersion >= 7) snap.writerFeatures
          else legacyWriterFeatures(snap.minWriterVersion)) + "columnMapping"
        pj.put("minReaderVersion", 3)
        pj.put("minWriterVersion", 7)
        val rfA = pj.putArray("readerFeatures"); rf.toSeq.sorted.foreach(rfA.add)
        val wfA = pj.putArray("writerFeatures"); wf.toSeq.sorted.foreach(wfA.add)
      } else {
        pj.put("minReaderVersion", math.max(2, snap.minReaderVersion))
        pj.put("minWriterVersion", math.max(5, snap.minWriterVersion))
      }
      lines += mapper.writeValueAsString(pn)
    }
    val mn = mapper.createObjectNode()
    val m = mn.putObject("metaData")
    m.put("id", snap.meta.id)
    // a foreign table's name/description/createdTime ride VERBATIM —
    // a rename must not erase catalog identity
    if (snap.meta.name != null) m.put("name", snap.meta.name)
    if (snap.meta.description != null)
      m.put("description", snap.meta.description)
    val fmt = m.putObject("format")
    fmt.put("provider", "parquet")
    fmt.putObject("options")
    m.put("schemaString", renamed.json)
    val pc = m.putArray("partitionColumns")
    newPartCols.foreach(pc.add)
    val cfg = m.putObject("configuration")
    newCfg.foreach { case (k, v) => cfg.put(k, v) }
    m.put("createdTime", snap.meta.createdTime)
    lines += mapper.writeValueAsString(mn)
    val version = snap.version + 1
    commit(table, version, lines.result())
    if (checkpointInterval > 0 && version % checkpointInterval == 0)
      writeCheckpoint(spark, table, version)
    version
  }

  /** Stage `df` distributed, promote files by rename, collect
    * per-file footer stats -> add entries. The shared write tail of
    * toDelta and the merge rewrites. Stats exclude partition columns
    * (not in the data files — the log value IS their exact bound). */
  /** Is Change Data Feed enabled on this snapshot's table? */
  private def cdfEnabled(snap: Snapshot): Boolean =
    snap.meta.configuration.get("delta.enableChangeDataFeed")
      .exists(_.equalsIgnoreCase("true"))

  /** Should this writer emit cdc change files? CDF must be on; and
    * under column mapping the change files would need the physical
    * namespace — not wired, so CM tables fall back to the commit's
    * add/remove reconstruction (coarser, still correct). */
  private def emitCdc(snap: Snapshot): Boolean =
    cdfEnabled(snap) && snap.meta.columnMapping == "none"

  /** Stage a change frame (table columns + `_change_type`) as cdc
    * parquet under `_change_data/`, partitioned like the table. */
  private def stageCdc(spark: SparkSession, table: String, df: DataFrame,
      partitionBy: Seq[String]): Seq[CdcFile] = {
    val staging = s"$table/_staging/${java.util.UUID.randomUUID()}"
    try {
      df.write.mode(SaveMode.Overwrite).partitionBy(partitionBy: _*)
        .parquet(staging)
      FsIO.listFilesRecursive(staging).collect {
        case (src, size, _) if src.endsWith(".parquet") &&
            !src.substring(src.lastIndexOf('/') + 1).startsWith("_") =>
          val rel = src.stripPrefix(staging).stripPrefix("/")
          val dirSegs = rel.split("/", -1).toSeq.dropRight(1)
          require(dirSegs.size == partitionBy.size,
            s"staged cdc depth ${dirSegs.size} != ${partitionBy.size}: $rel")
          val pv = dirSegs.zip(partitionBy).map { case (seg, expect) =>
            val eq = seg.indexOf('=')
            require(eq > 0 && seg.substring(0, eq) == expect,
              s"staged cdc dir $seg does not match partition column $expect")
            val raw = seg.substring(eq + 1)
            expect -> (if (raw == "__HIVE_DEFAULT_PARTITION__") null
                       else unescapeHive(raw))
          }.toMap
          val relDst = s"_change_data/$rel"
          FsIO.rename(src, s"$table/$relDst")
          CdcFile(relDst, pv, size)
      }
    } finally FsIO.deleteRecursive(staging)
  }

  /** Enable Change Data Feed on an existing table: a metadata-only
    * commit adding `delta.enableChangeDataFeed=true` plus the
    * protocol it requires (legacy minWriterVersion 4, or the
    * `changeDataFeed` writer feature on features-era tables). After
    * it, [[upsert]] and copy-on-write [[deleteWhere]] write cdc
    * change files and [[fromDeltaCdf]] reads them precisely. */
  def enableChangeDataFeed(spark: SparkSession, table0: String): Long = {
    val table = FsIO.normalize(table0.stripSuffix("/"))
    val snap = snapshot(spark, table, None)
    gate(snap)
    writerGate(snap, "enableChangeDataFeed")
    if (cdfEnabled(snap)) return snap.version
    val lines = Seq.newBuilder[String]
    if (snap.minWriterVersion >= 7) {
      val pn = mapper.createObjectNode()
      val pj = pn.putObject("protocol")
      pj.put("minReaderVersion", math.max(snap.minReaderVersion, 1))
      pj.put("minWriterVersion", 7)
      if (snap.minReaderVersion >= 3) {
        val rfA = pj.putArray("readerFeatures")
        snap.readerFeatures.toSeq.sorted.foreach(rfA.add)
      }
      val wfA = pj.putArray("writerFeatures")
      (snap.writerFeatures + "changeDataFeed").toSeq.sorted.foreach(wfA.add)
      lines += mapper.writeValueAsString(pn)
    } else if (snap.minWriterVersion < 4) {
      val pn = mapper.createObjectNode()
      val pj = pn.putObject("protocol")
      pj.put("minReaderVersion", snap.minReaderVersion)
      pj.put("minWriterVersion", 4)
      lines += mapper.writeValueAsString(pn)
    }
    val mn = mapper.createObjectNode()
    val m = mn.putObject("metaData")
    m.put("id", snap.meta.id)
    if (snap.meta.name != null) m.put("name", snap.meta.name)
    if (snap.meta.description != null)
      m.put("description", snap.meta.description)
    val fmt = m.putObject("format")
    fmt.put("provider", "parquet")
    fmt.putObject("options")
    m.put("schemaString", snap.meta.schemaString)
    val pc = m.putArray("partitionColumns")
    snap.meta.partitionColumns.foreach(pc.add)
    val cfg = m.putObject("configuration")
    (snap.meta.configuration +
      ("delta.enableChangeDataFeed" -> "true")).foreach {
      case (k, v) => cfg.put(k, v) }
    m.put("createdTime", snap.meta.createdTime)
    lines += mapper.writeValueAsString(mn)
    val version = snap.version + 1
    commit(table, version, lines.result())
    version
  }

  private def stageAdds(spark: SparkSession, table: String, df: DataFrame,
      partitionBy: Seq[String]): Seq[AddFile] = {
    // attempt-unique SUBDIR of _staging/ (concurrent writers must not
    // clobber each other's staged files; the parent prefix keeps
    // vacuum's /_staging/ exclusion working)
    val staging = s"$table/_staging/${java.util.UUID.randomUUID()}"
    val promoted =
      try {
        df.write.mode(SaveMode.Overwrite).partitionBy(partitionBy: _*)
          .parquet(staging)
        promoteStaged(table, staging, partitionBy)
      } finally FsIO.deleteRecursive(staging) // failed attempts leak no staging
    val statCols = df.schema.filterNot(f => partitionBy.contains(f.name))
      .map(_.name)
    val statsByPath = DeltaStats.collect(spark, statCols,
      promoted.map(a => resolveDataPath(table, a.path)))
    promoted.map(a =>
      a.copy(stats = statsByPath.getOrElse(resolveDataPath(table, a.path), null)))
  }

  /** MERGE (key upsert): source rows REPLACE target rows sharing
    * `keys`; unmatched source rows INSERT. Copy-on-write at FILE
    * granularity — an `input_file_name` semi-join probe finds the
    * files that actually contain matching keys, ONLY those rewrite
    * (matched rows anti-joined out, source unioned in); every other
    * file is untouched metadata. That is the 100 TB shape: a 1%
    * upsert rewrites ~1% of files, not the table. Source keys must
    * be unique — ambiguous multi-row updates reject loudly. Returns
    * the committed version. */
  def upsert(spark: SparkSession, table0: String, source: DataFrame,
      keys: Seq[String],
      checkpointInterval: Int = DefaultCheckpointInterval): Long = {
    val table = FsIO.normalize(table0.stripSuffix("/"))
    require(keys.nonEmpty, "upsert: at least one key column")
    val snap = snapshot(spark, table, None)
    gate(snap)
    writerGate(snap, "upsert")
    val schema = DataType.fromJson(snap.meta.schemaString).asInstanceOf[StructType]
    val partCols = snap.meta.partitionColumns
    require(relaxed(schema) == relaxed(source.schema),
      s"upsert: schema mismatch with $table\n  table: ${schema.simpleString}" +
        s"\n  source: ${source.schema.simpleString}")
    keys.foreach(k => require(schema.fieldNames.contains(k),
      s"upsert: key column $k not in the table schema"))
    val src = source.select(schema.fieldNames.map(col).toIndexedSeq: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val keyCols = keys.map(col)
      require(src.select(keyCols: _*).distinct().count() == src.count(),
        s"upsert: source keys ${keys.mkString(",")} are not unique")
      // stats prefilter: a file can hold a matching key only if EVERY
      // key column's bounds intersect the source's [min,max] — prune
      // before paying a probe scan task per file (one tiny agg job)
      val candidates: Seq[AddFile] =
        if (snap.adds.isEmpty) Nil
        else {
          val mm = src.select(keys.flatMap(k =>
            Seq(min(col(k)).as(s"mn_$k"), max(col(k)).as(s"mx_$k"))): _*).head()
          val rangePred = keys.flatMap { k =>
            val mn = mm.getAs[Any](s"mn_$k")
            val mx = mm.getAs[Any](s"mx_$k")
            if (mn == null || mx == null) None // all-null keys match nothing
            else Some(col(k) >= lit(mn) && col(k) <= lit(mx))
          }.reduceOption(_ && _)
          rangePred match {
            case None if keys.exists(k => mm.isNullAt(mm.fieldIndex(s"mn_$k"))) =>
              Nil // a key column is entirely null in the source
            case None => snap.adds
            case Some(rp) =>
              val (pred, sSchema, sParts) = statsNamespace(snap, schema,
                partCols, resolvePredicate(spark, schema, rp))
              val tz = spark.conf.get("spark.sql.session.timeZone",
                java.util.TimeZone.getDefault.getID)
              snap.adds.filter(a => DeltaStats.mightMatch(pred, sSchema,
                sParts, a.partitionValues, a.stats, tz))
          }
        }
      val cm = snap.meta.columnMapping
      // probe: which candidate files actually hold matching keys
      val affected: Set[String] =
        if (candidates.isEmpty) Set.empty
        else readAdds(spark, table, schema, partCols, candidates, cm)
          .select((keys :+ "__nothing").map {
            case "__nothing" => input_file_name().as("__file")
            case k => col(k)
          }: _*)
          .join(src.select(keyCols: _*).distinct(), keys, "left_semi")
          .select("__file").distinct()
          .collect().map(r => normalizeScanUri(r.getString(0)))
          .toSet // bounded by the FILE count
      val (hit, _) = snap.adds.partition(a =>
        affected(FsIO.normalize(resolveDataPath(table, a.path))))
      require(hit.size == affected.size,
        s"upsert: probe matched ${affected.size} files but resolved ${hit.size}")
      val rewritten =
        if (hit.isEmpty) src
        else readAdds(spark, table, schema, partCols, hit, cm)
          .join(src.select(keyCols: _*), keys, "left_anti")
          .unionByName(src)
      val adds = stageAddsFor(spark, table, snap, rewritten, partCols)
      // CDF: matched old rows = update_preimage, their replacements =
      // update_postimage, brand-new keys = insert. Every matched key
      // lives in a hit file (the probe is exhaustive over key-bound
      // intersections), so the hit scan covers all pre-images.
      val cdc = if (!emitCdc(snap)) Nil else {
        val oldHit =
          if (hit.isEmpty) null
          else readAdds(spark, table, schema, partCols, hit, cm)
        val pre =
          if (oldHit == null) None
          else Some(oldHit.join(src.select(keyCols: _*), keys, "left_semi")
            .withColumn("_change_type", lit("update_preimage")))
        val matchedKeys = // keys present in BOTH the table and source
          if (oldHit == null) null
          else oldHit.select(keyCols: _*)
            .join(src.select(keyCols: _*), keys, "left_semi").distinct()
        val post =
          if (matchedKeys == null) None
          else Some(src.join(matchedKeys, keys, "left_semi")
            .withColumn("_change_type", lit("update_postimage")))
        val ins = (if (matchedKeys == null) src
                   else src.join(matchedKeys, keys, "left_anti"))
          .withColumn("_change_type", lit("insert"))
        stageCdc(spark, table,
          (pre.toSeq ++ post.toSeq :+ ins).reduce(_ unionByName _),
          partCols)
      }
      val version = snap.version + 1
      commitActions(table, version, "MERGE",
        Map("matchedFiles" -> hit.size.toString),
        removes = hit.map(_.path), adds = adds, dataChange = true,
        removeDvs = hit.collect {
          case a if a.dv != null => a.path -> a.dv }.toMap,
        cdcAdds = cdc)
      if (checkpointInterval > 0 && version % checkpointInterval == 0)
        writeCheckpoint(spark, table, version)
      version
    } finally src.unpersist()
  }

  /** DELETE rows matching `cond`, touching ONLY the files whose
    * stats/partition values might contain matches (the same bounds
    * evaluation as read-side skipping — provably-clean files are
    * untouched metadata). No-op (no commit) when no file can match.
    *
    * Two physical strategies:
    *  - default (copy-on-write): each candidate file is rewritten to
    *    its survivors;
    *  - `viaDeletionVectors = true` (merge-on-read): no data file is
    *    touched — matching row indexes are collected PER FILE on the
    *    executors (the filtered scan emits (file, row_index), one
    *    roaring bitmap is built per file executor-side), the driver
    *    only assembles descriptors and publishes remove + re-add
    *    actions carrying them. Works on tables that already carry
    *    DVs: the scan marks a row deleted when its file's existing DV
    *    masks it OR `cond` matches, so the new bitmap is the union —
    *    repeated DV deletes compose. This is the 100 TB shape for
    *    selective deletes: commit cost scales with MATCHING rows'
    *    bitmaps, not with candidate-file bytes.
    *
    * Returns the resulting table version. */
  def deleteWhere(spark: SparkSession, table0: String, cond: Column,
      checkpointInterval: Int = DefaultCheckpointInterval,
      viaDeletionVectors: Boolean = false): Long = {
    val table = FsIO.normalize(table0.stripSuffix("/"))
    val snap = snapshot(spark, table, None)
    gate(snap)
    writerGate(snap, "deleteWhere")
    if (viaDeletionVectors)
      return deleteWhereDv(spark, table, snap, cond, checkpointInterval)
    val schema = DataType.fromJson(snap.meta.schemaString).asInstanceOf[StructType]
    val partCols = snap.meta.partitionColumns
    val (pred, sSchema, sParts) = statsNamespace(snap, schema, partCols,
      resolvePredicate(spark, schema, cond))
    val tz = spark.conf.get("spark.sql.session.timeZone",
      java.util.TimeZone.getDefault.getID)
    val (hit, _) = snap.adds.partition(a =>
      DeltaStats.mightMatch(pred, sSchema, sParts, a.partitionValues,
        a.stats, tz))
    if (hit.isEmpty) return snap.version // provably nothing to delete
    // DELETE removes rows where cond is TRUE; NULL-evaluating rows
    // SURVIVE (NOT(NULL) is NULL and would silently drop them — and
    // drop them only in rewritten files, a file-dependent fate)
    // readAdds applies any existing DV anti-filter in-scan, so the
    // rewritten survivors have prior deletes MATERIALIZED (their
    // descriptors ride the tombstones; the new files are DV-free)
    val survivors = readAdds(spark, table, schema, partCols, hit,
        cm = snap.meta.columnMapping)
      .filter(!coalesce(cond, lit(false)))
    val adds = stageAddsFor(spark, table, snap, survivors, partCols)
    // CDF: the deleted rows become `delete` change rows (one extra
    // scan over the hit files — cost scales with the candidates, not
    // the table)
    val cdc = if (!emitCdc(snap)) Nil else stageCdc(spark, table,
      readAdds(spark, table, schema, partCols, hit,
          cm = snap.meta.columnMapping)
        .filter(coalesce(cond, lit(false)))
        .withColumn("_change_type", lit("delete")), partCols)
    val version = snap.version + 1
    commitActions(table, version, "DELETE",
      Map("candidateFiles" -> hit.size.toString),
      removes = hit.map(_.path), adds = adds, dataChange = true,
      removeDvs = hit.collect {
        case a if a.dv != null => a.path -> a.dv }.toMap,
      cdcAdds = cdc)
    if (checkpointInterval > 0 && version % checkpointInterval == 0)
      writeCheckpoint(spark, table, version)
    version
  }

  /** Legacy protocol versions imply feature sets; an upgrade to the
    * table-features era must ENUMERATE them (PROTOCOL.md "Table
    * Features") or a conforming reader would treat the table as
    * feature-free. */
  private def legacyReaderFeatures(v: Int): Set[String] =
    if (v >= 2) Set("columnMapping") else Set.empty
  private def legacyWriterFeatures(v: Int): Set[String] = {
    var f = Set.empty[String]
    if (v >= 2) f ++= Set("appendOnly", "invariants")
    if (v >= 3) f += "checkConstraints"
    if (v >= 4) f ++= Set("generatedColumns", "changeDataFeed")
    if (v >= 5) f += "columnMapping"
    if (v >= 6) f += "identityColumns"
    f
  }

  /** The merge-on-read DELETE (see [[deleteWhere]]). */
  private def deleteWhereDv(spark: SparkSession, table: String,
      snap: Snapshot, cond: Column,
      checkpointInterval: Int = DefaultCheckpointInterval): Long = {
    val schema = DataType.fromJson(snap.meta.schemaString).asInstanceOf[StructType]
    val partCols = snap.meta.partitionColumns
    // column mapping `name` mode composes with DVs (the common modern
    // DBR table): the scan runs in the PHYSICAL namespace (data files,
    // stats keys, partitionValues keys are physical — the CM append
    // path's discipline), aliased back to logical names before `cond`
    // applies. DVs themselves key on (file_path, row_index), which is
    // namespace-free.
    val cm = snap.meta.columnMapping == "name"
    val physSchema =
      if (cm) physicalType(schema).asInstanceOf[StructType] else schema
    if (cm) physSchema.fieldNames.foreach(n =>
      require(!n.contains(".") && !n.contains("`"),
        s"deleteWhere: physical column name '$n' needs quoting we don't do"))
    val physOf = schema.fieldNames.zip(physSchema.fieldNames).toMap
    val physPartCols = partCols.map(physOf)
    // stats skipping evaluates in the physical namespace under CM
    val (pred, _, _) = statsNamespace(snap, schema, partCols,
      resolvePredicate(spark, schema, cond))
    val tz = spark.conf.get("spark.sql.session.timeZone",
      java.util.TimeZone.getDefault.getID)
    val hit = snap.adds.filter(a =>
      DeltaStats.mightMatch(pred, physSchema, physPartCols,
        a.partitionValues, a.stats, tz))
    if (hit.isEmpty) return snap.version
    // every _metadata.file_path spelling -> the add's relative path,
    // enumerated DRIVER-side (the PathKeys lesson)
    val bySpelling: Map[String, String] = hit.flatMap { a =>
      PathKeys.spellings(resolveDataPath(table, a.path)).map(_ -> a.path)
    }.toMap
    val byPath: Map[String, AddFile] = hit.map(a => a.path -> a).toMap
    // per partition-group scans emitting (file, row_index) of rows to
    // mask in the NEW bitmap: already-deleted (existing DV) OR cond —
    // the union semantics that make repeated DV deletes compose.
    // NULL-evaluating rows survive, exactly like the CoW path.
    val groups = hit.groupBy(_.partitionValues).toSeq
    require(groups.size <= 4096, // readAdds' union-branch cap, same reason
      s"deleteWhere: ${groups.size} distinct partition tuples exceeds " +
        "the 4096 union-branch cap; delete partition subsets")
    // driver-memory bound: the candidates' EXISTING DVs ship into the
    // scan closure as a driver-built map. Their total compressed size
    // is already on the descriptors — a very wide delete over
    // thousands of DV-heavy files fails loudly BEFORE loading a byte
    // (split the delete by partition or predicate), never by
    // ballooning the driver.
    val existingDvBytes =
      hit.collect { case a if a.dv != null => a.dv.sizeInBytes.toLong }.sum
    val dvBytesCap = spark.conf.get(
      "spark.graft.dv.maxExistingDvBytes", (1L << 30).toString).toLong
    require(existingDvBytes <= dvBytesCap,
      s"deleteWhere: candidate files carry $existingDvBytes bytes of " +
        s"existing deletion vectors (cap $dvBytesCap, " +
        "spark.graft.dv.maxExistingDvBytes); delete narrower subsets")
    // loop-invariant: the physical data schema and the logical alias
    // list are per-TABLE, not per-partition-group
    val dataSchemaPhys =
      StructType(physSchema.filterNot(f => physPartCols.contains(f.name)))
    val logicalAliases = schema.fields.toIndexedSeq
      .filterNot(f => partCols.contains(f.name)).map { f =>
        val pf = physSchema(schema.fieldIndex(f.name))
        val c = col(pf.name)
        (if (pf.dataType == f.dataType) c else c.cast(f.dataType)).as(f.name)
      }
    val branchPairs = groups.map { case (pv, files) =>
      val (dvFiles, plainFiles) = files.partition(_.dv != null)
      val scans = Seq.newBuilder[DataFrame]
      // scan physical, alias data columns back to logical so `cond`
      // resolves (identity aliases when cm=false)
      def base(fs: Seq[AddFile]): DataFrame =
        spark.read.schema(dataSchemaPhys)
          .parquet(fs.map(f => resolveDataPath(table, f.path)): _*)
          .select(col("_metadata.file_path").as("__dv_fp") +:
            col("_metadata.row_index").as("__dv_ri") +:
            logicalAliases: _*)
      if (plainFiles.nonEmpty)
        scans += base(plainFiles).withColumn("__dv_del", lit(false))
      if (dvFiles.nonEmpty) {
        import org.apache.spark.unsafe.types.UTF8String
        import org.apache.spark.sql.graftbridge.Bridge
        val dvMap = new java.util.HashMap[UTF8String, RoaringDv.Dv]()
        dvFiles.foreach { f =>
          val dv = loadDv(table, f.dv)
          PathKeys.spellings(resolveDataPath(table, f.path))
            .foreach(s => dvMap.put(UTF8String.fromString(s), dv))
        }
        scans += base(dvFiles).withColumn("__dv_del", Bridge.column(
          DvDeleted(Bridge.expression(col("__dv_fp")),
            Bridge.expression(col("__dv_ri")), dvMap)))
      }
      val withParts = partCols.foldLeft(scans.result().reduce(_ union _)) {
        (d, c) => d.withColumn(c, typedPartitionValue(
          pv.getOrElse(physOf(c), null), schema(c).dataType))
      }
      val bitmapRows = withParts
        .filter(col("__dv_del") || coalesce(cond, lit(false)))
        .select(col("__dv_fp"), col("__dv_ri"))
      // CDF: the NEWLY masked rows (matching and not already deleted)
      // are this commit's `delete` change rows
      val cdcRows = withParts
        .filter(!col("__dv_del") && coalesce(cond, lit(false)))
        .select(schema.fieldNames.map(col).toIndexedSeq: _*)
      (bitmapRows, cdcRows)
    }
    val branches = branchPairs.map(_._1)
    // one bitmap per file, built where the rows are; the driver
    // collects only (file, payload, cardinality) — metadata scale.
    // Default path: DvBitmapAgg, a roaring-union TypedImperative-
    // Aggregate whose buffer IS the compressed bitmap, so executor
    // memory is bounded by payload bytes at every stage (partial
    // buffers included). The collect_list fallback (A/B flag) holds
    // 8 bytes per deleted row of one file in one buffer — fine at
    // ~10M-row files, concentrated for a mostly-deleted huge file.
    import spark.implicits._
    val grouped = branches.reduce(_ union _).groupBy(col("__dv_fp"))
    val perFile: Seq[(String, Array[Byte], Long)] =
      if (spark.conf.get("spark.graft.dv.unionAgg", "true").toBoolean) {
        import org.apache.spark.sql.graftbridge.Bridge
        grouped
          .agg(Bridge.column(DvBitmapAgg(Bridge.expression(col("__dv_ri")))
            .toAggregateExpression()).as("dv"))
          .select(col("__dv_fp"), col("dv.payload"), col("dv.cardinality"))
          .as[(String, Array[Byte], Long)]
          .collect().toSeq
      } else {
        // cardinality travels from the executors (rows are DISTINCT
        // per file, so it is rows.length) — the driver never re-parses
        grouped
          .agg(sort_array(collect_list(col("__dv_ri"))).as("rows"))
          .as[(String, Array[Long])]
          .map { case (fp, rows) =>
            (fp, RoaringDv.serialize(rows), rows.length.toLong) }
          .collect().toSeq
      }
    val resolved: Seq[(AddFile, Array[Byte], Long)] =
      perFile.map { case (sp, pl, card) =>
        val p = bySpelling.getOrElse(sp, throw new IllegalStateException(
          s"deleteWhere: unmatched scan spelling $sp"))
        (byPath(p), pl, card)
      }.sortBy(_._1.path)
    // drop no-change files: a DV file whose existing mask already
    // covers every matching row re-emits its own set (union ⊇ old +
    // equal cardinality ⇒ equal set)
    val changed = resolved.filter { case (a, _, card) =>
      a.dv == null || card != a.dv.cardinality
    }
    if (changed.isEmpty) return snap.version // nothing new to delete
    // CDF: one extra pass over the candidates (same cost class as
    // the bitmap scan) staging the newly-masked rows as `delete`
    // change rows — AFTER the no-change early return, so a no-op
    // delete stages nothing
    val cdcFiles: Seq[CdcFile] =
      if (!emitCdc(snap)) Nil
      else stageCdc(spark, table, branchPairs.map(_._2)
        .reduce(_ union _)
        .withColumn("_change_type", lit("delete")), partCols)
    val uuid = java.util.UUID.randomUUID()
    val offs = RoaringDv.writeFile(
      s"$table/deletion_vector_$uuid.bin", changed.map(_._2))
    val now = System.currentTimeMillis()
    val newAdds = changed.zip(offs).map { case ((a, _, card), (off, len)) =>
      a.copy(modificationTime = now, dv = DvDescriptor("u",
        RoaringDv.encodeDvPath(uuid), off, len, card))
    }
    // protocol upgrade: preserve declared features, enumerate the
    // legacy-implied ones when first crossing into the features era
    val rf = (if (snap.minReaderVersion >= 3) snap.readerFeatures
              else legacyReaderFeatures(snap.minReaderVersion)) + "deletionVectors"
    val wf = (if (snap.minWriterVersion >= 7) snap.writerFeatures
              else legacyWriterFeatures(snap.minWriterVersion)) + "deletionVectors"
    val pn = mapper.createObjectNode()
    val p = pn.putObject("protocol")
    p.put("minReaderVersion", 3)
    p.put("minWriterVersion", 7)
    val rfA = p.putArray("readerFeatures"); rf.toSeq.sorted.foreach(rfA.add)
    val wfA = p.putArray("writerFeatures"); wf.toSeq.sorted.foreach(wfA.add)
    val version = snap.version + 1
    commitActions(table, version, "DELETE",
      Map("candidateFiles" -> hit.size.toString, "mode" -> "deletionVectors"),
      removes = changed.map(_._1.path), adds = newAdds, dataChange = true,
      extraActions = Seq(mapper.writeValueAsString(pn)),
      removeDvs = changed.collect {
        case (a, _, _) if a.dv != null => a.path -> a.dv }.toMap,
      cdcAdds = cdcFiles)
    // checkpoint adds carry DV descriptors (r17), so the cadence runs
    // through merge-on-read deletes like any other commit
    if (checkpointInterval > 0 && version % checkpointInterval == 0)
      writeCheckpoint(spark, table, version)
    version
  }

  /** input_file_name() URI -> the normalized path form add-resolution
    * uses. */
  private def normalizeScanUri(u: String): String = {
    val p = try new org.apache.hadoop.fs.Path(new java.net.URI(u)).toString
            catch { case _: java.net.URISyntaxException => u }
    FsIO.normalize(p)
  }

  /** One merge/maintenance commit: commitInfo + optional extra
    * actions (pre-serialized, e.g. a protocol upgrade) + removes +
    * adds (deletionVector descriptors serialized when present). */
  private def commitActions(table: String, version: Long, operation: String,
      params: Map[String, String], removes: Seq[String], adds: Seq[AddFile],
      dataChange: Boolean, extraActions: Seq[String] = Nil,
      removeDvs: Map[String, DvDescriptor] = Map.empty,
      cdcAdds: Seq[CdcFile] = Nil): Unit = {
    val now = System.currentTimeMillis()
    val lines = Seq.newBuilder[String]
    val ci = mapper.createObjectNode()
    val cib = ci.putObject("commitInfo")
    cib.put("timestamp", now)
    cib.put("operation", operation)
    val op = cib.putObject("operationParameters")
    params.foreach { case (k, v) => op.put(k, v) }
    cib.put("engineInfo", "graft")
    lines += mapper.writeValueAsString(ci)
    lines ++= extraActions
    removes.foreach { pth =>
      val rn = mapper.createObjectNode()
      val r = rn.putObject("remove")
      r.put("path", pth)
      r.put("deletionTimestamp", now)
      r.put("dataChange", dataChange)
      // the removed file VERSION's deletionVector rides on the
      // tombstone (PROTOCOL.md) so DV-file bookkeeping — foreign
      // vacuum implementations included — sees every reference
      removeDvs.get(pth).foreach { d =>
        val dn = r.putObject("deletionVector")
        dn.put("storageType", d.storageType)
        dn.put("pathOrInlineDv", d.pathOrInlineDv)
        dn.put("offset", d.offset)
        dn.put("sizeInBytes", d.sizeInBytes)
        dn.put("cardinality", d.cardinality)
      }
      lines += mapper.writeValueAsString(rn)
    }
    adds.foreach { a =>
      val an = mapper.createObjectNode()
      val ad = an.putObject("add")
      ad.put("path", a.path)
      val pvN = ad.putObject("partitionValues")
      a.partitionValues.foreach { case (k, v) =>
        if (v == null) pvN.putNull(k) else pvN.put(k, v)
      }
      ad.put("size", a.size)
      ad.put("modificationTime", a.modificationTime)
      ad.put("dataChange", dataChange)
      if (a.stats != null) ad.put("stats", a.stats)
      if (a.dv != null) {
        val dn = ad.putObject("deletionVector")
        dn.put("storageType", a.dv.storageType)
        dn.put("pathOrInlineDv", a.dv.pathOrInlineDv)
        dn.put("offset", a.dv.offset)
        dn.put("sizeInBytes", a.dv.sizeInBytes)
        dn.put("cardinality", a.dv.cardinality)
      }
      lines += mapper.writeValueAsString(an)
    }
    cdcAdds.foreach { c =>
      val cn = mapper.createObjectNode()
      val cd = cn.putObject("cdc")
      cd.put("path", c.path)
      val pvN = cd.putObject("partitionValues")
      c.partitionValues.foreach { case (k, v) =>
        if (v == null) pvN.putNull(k) else pvN.put(k, v)
      }
      cd.put("size", c.size)
      cd.put("dataChange", false)
      lines += mapper.writeValueAsString(cn)
    }
    commit(table, version, lines.result())
  }

  /** Claim version `v` of the log: exists-check + temp-file rename
    * (single-writer; a true multi-writer deployment needs a
    * put-if-absent LogStore, exactly as in OSS Delta). */
  /** Claim version `v` of the log: exists-check, stage, rename. On
    * HDFS-like stores rename-to-existing FAILS, so two racing writers
    * cannot both land `v` — one loses loudly at one of the two
    * checks. On object stores without atomic rename (plain S3) this
    * check-then-rename has a race window; OSS Delta solves it with a
    * LogStore whose `write` is put-if-absent (S3: DynamoDB mutual
    * exclusion; GCS/Azure: native preconditions) — deploying there
    * means routing this one call through such a primitive. The
    * single-writer discipline everywhere else is exactly this
    * function. Within ONE JVM the claim is made atomic by a per-table
    * monitor (local-fs rename REPLACES existing files, so the
    * exists-check alone would let two driver threads silently lose an
    * update) — two concurrent writers racing the same version get
    * exactly one success and one loud failure. */
  private val commitLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def commit(table: String, v: Long, lines: Seq[String]): Unit = {
    val dest = commitPath(table, v)
    val lock = commitLocks.computeIfAbsent(table, _ => new Object)
    lock.synchronized {
      require(!FsIO.exists(dest),
        s"Delta version $v already exists (concurrent writer?): $dest")
      val tmp = f"${logDir(table)}/.$v%020d.json.tmp"
      val out = FsIO.create(tmp)
      try out.write((lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
      finally out.close()
      FsIO.rename(tmp, dest)
    }
  }

  /** Compact the state at `v` into a checkpoint (+ the
    * `_last_checkpoint` pointer). Tables carrying the `v2Checkpoint`
    * WRITER feature get a V2 checkpoint (uuid-named parquet manifest +
    * parquet sidecars — a conforming writer must produce those, which
    * is what makes such tables writable here); everything else gets
    * the classic single-part `%020d.checkpoint.parquet`. Checkpoint
    * `add`s carry dataChange=false per the protocol. */
  private def writeCheckpoint(spark: SparkSession, table: String, v: Long): Unit = {
    val s = snapshot(spark, table, Some(v))
    // checkpoint adds CARRY their deletionVector descriptors (r17 —
    // the protocol's checkpoint schema includes add.deletionVector),
    // so DV-carrying tables checkpoint on the normal cadence and their
    // JSON log stops growing unboundedly between purges; the read side
    // (addFromRow) has parsed checkpoint DVs since r16.
    if (s.writerFeatures.contains("v2Checkpoint")) {
      // one sidecar per ~50k adds: sidecars are file METADATA, so the
      // per-file row count — not data volume — sizes them; a 100 TB
      // table with ~1M adds spreads over ~20 sidecar files, each an
      // independently scannable bounded parquet read
      val numSidecars = math.max(1, math.min(64,
        (s.adds.size + 49999) / 50000))
      writeV2CheckpointFiles(spark, table, s,
        s.minReaderVersion, s.minWriterVersion,
        if (s.minReaderVersion >= 3) s.readerFeatures.toSeq.sorted else null,
        if (s.minWriterVersion >= 7) s.writerFeatures.toSeq.sorted else null,
        numSidecars, jsonManifest = false)
      // size = actions stored in the checkpoint: protocol + metaData +
      // checkpointMetadata + sidecar refs + the adds in the sidecars
      writeLastCheckpoint(table, v, 3L + numSidecars + s.adds.size,
        parts = 0)
      return
    } else {
      val rows = new java.util.ArrayList[Row]()
      rows.add(Row(cpProtocolRow(s), null, null))
      rows.add(Row(null, cpMetaRow(s), null))
      s.adds.foreach(a => rows.add(Row(null, null, cpAddRow(a))))
      writeOneParquet(spark, spark.createDataFrame(rows, CpSchema),
        f"${logDir(table)}/$v%020d.checkpoint.parquet")
    }
    writeLastCheckpoint(table, v, 2L + s.adds.size, parts = 0)
  }

  private val CpMapT = MapType(StringType, StringType, valueContainsNull = true)
  private val CpProtocolT = StructType(Seq(
    StructField("minReaderVersion", IntegerType),
    StructField("minWriterVersion", IntegerType),
    StructField("readerFeatures", ArrayType(StringType, containsNull = false)),
    StructField("writerFeatures", ArrayType(StringType, containsNull = false))))
  private val CpMetaT = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("description", StringType),
    StructField("format", StructType(Seq(
      StructField("provider", StringType),
      StructField("options", CpMapT)))),
    StructField("schemaString", StringType),
    StructField("partitionColumns", ArrayType(StringType, containsNull = false)),
    StructField("configuration", CpMapT),
    StructField("createdTime", LongType)))
  private val CpDvT = StructType(Seq(
    StructField("storageType", StringType),
    StructField("pathOrInlineDv", StringType),
    StructField("offset", IntegerType),
    StructField("sizeInBytes", IntegerType),
    StructField("cardinality", LongType)))
  private val CpAddT = StructType(Seq(
    StructField("path", StringType),
    StructField("partitionValues", CpMapT),
    StructField("size", LongType),
    StructField("modificationTime", LongType),
    StructField("dataChange", BooleanType),
    StructField("stats", StringType),
    StructField("deletionVector", CpDvT)))
  private val CpSchema = StructType(Seq(
    StructField("protocol", CpProtocolT),
    StructField("metaData", CpMetaT),
    StructField("add", CpAddT)))

  /** Carry the table's REAL protocol (a feature-gated table must not
    * have its checkpoint silently downgrade it); feature arrays are
    * null below reader/writer version 3/7 per the protocol. */
  private def cpProtocolRow(s: Snapshot): Row =
    Row(s.minReaderVersion, s.minWriterVersion,
      if (s.minReaderVersion >= 3) s.readerFeatures.toSeq.sorted else null,
      if (s.minWriterVersion >= 7) s.writerFeatures.toSeq.sorted else null)

  /** The REAL table configuration rides along: a checkpoint that
    * dropped delta.columnMapping.mode would make every replay-from-
    * checkpoint read physical-named files with logical names — silent
    * all-NULL columns (r15 second review pass). */
  private def cpMetaRow(s: Snapshot): Row =
    Row(s.meta.id, s.meta.name, s.meta.description,
      Row("parquet", Map.empty[String, String]),
      s.meta.schemaString, s.meta.partitionColumns,
      s.meta.configuration, s.meta.createdTime)

  private def cpAddRow(a: AddFile): Row =
    Row(a.path, a.partitionValues, a.size, a.modificationTime, false, a.stats,
      if (a.dv == null) null
      else Row(a.dv.storageType, a.dv.pathOrInlineDv, a.dv.offset,
        a.dv.sizeInBytes, a.dv.cardinality))

  /** Stage a 1-file parquet write of `df` and promote it to exactly
    * `dst` by rename; returns the file's length in bytes. */
  private def writeOneParquet(spark: SparkSession, df: DataFrame,
      dst: String): Long = {
    val tmpDir = dst + ".tmp"
    FsIO.deleteRecursive(tmpDir)
    try {
      df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmpDir)
      val part = FsIO.listFilesRecursive(tmpDir).collect {
        case (p, len, _) if p.endsWith(".parquet") => (p, len)
      }
      require(part.size == 1, s"expected one part file, found ${part.size}")
      FsIO.rename(part.head._1, dst)
      part.head._2
    } finally FsIO.deleteRecursive(tmpDir)
  }

  private def writeLastCheckpoint(table: String, v: Long, size: Long,
      parts: Int): Unit = {
    val lc = mapper.createObjectNode()
    lc.put("version", v)
    lc.put("size", size)
    if (parts > 0) lc.put("parts", parts)
    val out = FsIO.create(s"${logDir(table)}/_last_checkpoint")
    try out.write((mapper.writeValueAsString(lc) + "\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Hive path-name unescape (%XX, single-byte — hive only escapes
    * ASCII specials) for partition dir values. */

  // ------------------------------------------------------------------
  // Foreign-table fixture builders (tests + oracle lanes ONLY)
  // ------------------------------------------------------------------

  /** Build a column-mapping `name`-mode table the way a foreign
    * writer (DBR after a rename) lays it out: data files carry
    * PHYSICAL column names, the schemaString carries per-field
    * physicalName/id metadata, partitionColumns stay LOGICAL while
    * add.partitionValues and stats keys are PHYSICAL. This exists so
    * the read path can be oracle-gated against real foreign layouts —
    * production writes to column-mapped tables stay rejected
    * ([[requireWritable]]). */
  private[graft] def foreignColumnMapped(df: DataFrame, table0: String,
      physicalOf: Map[String, String],
      partitionBy: Seq[String] = Nil): Unit = {
    val table = FsIO.normalize(table0.stripSuffix("/"))
    require(latestVersion(table) < 0,
      s"foreignColumnMapped: $table already exists")
    df.schema.fieldNames.foreach(n => require(physicalOf.contains(n),
      s"foreignColumnMapped: no physical name for column $n"))
    require(physicalOf.values.toSet.size == physicalOf.size,
      "foreignColumnMapped: physical names must be distinct")
    val spark = df.sparkSession
    val now = System.currentTimeMillis()
    val physPartCols = partitionBy.map(physicalOf)
    val dfPhys = df.select(df.schema.fieldNames.toIndexedSeq.map(n =>
      col(n).as(physicalOf(n))): _*)
    // stage + promote + stats exactly like stageAdds, in the
    // physical namespace (partitionValues/stats keys come out physical),
    // with stageAdds' attempt-unique staging dir so concurrent writers
    // cannot clobber each other's staged files
    val staging = s"$table/_staging/${java.util.UUID.randomUUID()}"
    val adds = try {
      dfPhys.write.mode(SaveMode.Overwrite)
        .partitionBy(physPartCols: _*).parquet(staging)
      val promoted = promoteStaged(table, staging, physPartCols)
      val statCols = dfPhys.schema.fieldNames.filterNot(physPartCols.contains).toSeq
      val statsByPath = DeltaStats.collect(spark, statCols,
        promoted.map(a => resolveDataPath(table, a.path)))
      promoted.map(a =>
        a.copy(stats = statsByPath.getOrElse(resolveDataPath(table, a.path), null)))
    } finally FsIO.deleteRecursive(staging)
    // logical schema with column-mapping metadata
    val mapped = StructType(df.schema.fields.zipWithIndex.map { case (f, i) =>
      f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
        .putString("delta.columnMapping.physicalName", physicalOf(f.name))
        .putLong("delta.columnMapping.id", i + 1L)
        .build())
    })
    val lines = Seq.newBuilder[String]
    val pn = mapper.createObjectNode()
    val p = pn.putObject("protocol")
    p.put("minReaderVersion", 2)
    p.put("minWriterVersion", 5)
    lines += mapper.writeValueAsString(pn)
    val mn = mapper.createObjectNode()
    val m = mn.putObject("metaData")
    m.put("id", java.util.UUID.randomUUID().toString)
    val fmt = m.putObject("format")
    fmt.put("provider", "parquet")
    fmt.putObject("options")
    m.put("schemaString", mapped.json)
    val pc = m.putArray("partitionColumns")
    partitionBy.foreach(pc.add)
    val cfg = m.putObject("configuration")
    cfg.put("delta.columnMapping.mode", "name")
    cfg.put("delta.columnMapping.maxColumnId", df.schema.size.toString)
    m.put("createdTime", now)
    lines += mapper.writeValueAsString(mn)
    adds.foreach { a =>
      val an = mapper.createObjectNode()
      val ad = an.putObject("add")
      ad.put("path", a.path)
      val pv = ad.putObject("partitionValues")
      a.partitionValues.foreach { case (k, v) =>
        if (v == null) pv.putNull(k) else pv.put(k, v)
      }
      ad.put("size", a.size)
      ad.put("modificationTime", a.modificationTime)
      ad.put("dataChange", true)
      if (a.stats != null) ad.put("stats", a.stats)
      lines += mapper.writeValueAsString(an)
    }
    commit(table, 0L, lines.result())
  }

  /** Foreign-shaped TYPE WIDENING commit (fixture/lane builder): a
    * metadata-only ALTER that rewrites the table schema with `widen`
    * (column -> wider Spark type), stamps `delta.typeChanges` on each
    * widened field and upgrades the protocol to the typeWidening
    * feature. Existing files keep their narrow on-disk types — the
    * read side promotes them inside the parquet readers. */
  private[graft] def foreignWidenTypes(spark: SparkSession, table0: String,
      widen: Map[String, DataType]): Long = {
    val table = FsIO.normalize(table0.stripSuffix("/"))
    val snap = snapshot(spark, table, None)
    val old = DataType.fromJson(snap.meta.schemaString).asInstanceOf[StructType]
    widen.keys.foreach(c => require(old.fieldNames.contains(c),
      s"foreignWidenTypes: no column '$c'"))
    val version = snap.version + 1
    val widened = StructType(old.fields.map { f =>
      widen.get(f.name) match {
        case Some(to) =>
          require(to != f.dataType, s"foreignWidenTypes: $to == ${f.dataType}")
          val change = new MetadataBuilder()
            .putString("toType", to.typeName)
            .putString("fromType", f.dataType.typeName)
            .putLong("tableVersion", version).build()
          f.copy(dataType = to,
            metadata = new MetadataBuilder().withMetadata(f.metadata)
              .putMetadataArray("delta.typeChanges", Array(change)).build())
        case None => f
      }
    })
    val lines = Seq.newBuilder[String]
    val pn = mapper.createObjectNode()
    val pj = pn.putObject("protocol")
    val rf = (if (snap.minReaderVersion >= 3) snap.readerFeatures
      else legacyReaderFeatures(snap.minReaderVersion)) + "typeWidening"
    val wf = (if (snap.minWriterVersion >= 7) snap.writerFeatures
      else legacyWriterFeatures(snap.minWriterVersion)) + "typeWidening"
    pj.put("minReaderVersion", 3)
    pj.put("minWriterVersion", 7)
    val rfA = pj.putArray("readerFeatures"); rf.toSeq.sorted.foreach(rfA.add)
    val wfA = pj.putArray("writerFeatures"); wf.toSeq.sorted.foreach(wfA.add)
    lines += mapper.writeValueAsString(pn)
    val mn = mapper.createObjectNode()
    val m = mn.putObject("metaData")
    m.put("id", snap.meta.id)
    if (snap.meta.name != null) m.put("name", snap.meta.name)
    if (snap.meta.description != null)
      m.put("description", snap.meta.description)
    val fmt = m.putObject("format")
    fmt.put("provider", "parquet")
    fmt.putObject("options")
    m.put("schemaString", widened.json)
    val pc = m.putArray("partitionColumns")
    snap.meta.partitionColumns.foreach(pc.add)
    val cfg = m.putObject("configuration")
    snap.meta.configuration.foreach { case (k, v) => cfg.put(k, v) }
    m.put("createdTime", snap.meta.createdTime)
    lines += mapper.writeValueAsString(mn)
    commit(table, version, lines.result())
    version
  }

  /** Foreign `id`-mode column-mapped fixture: metadata declares
    * delta.columnMapping.mode=id with per-field ids + physicalNames;
    * data files carry parquet FIELD IDS and — where `fileNameOf`
    * diverges from `physicalOf` — file column names matching NEITHER
    * the logical nor the physical name (the converted-table shape id
    * mode exists for: only the field id links them). Stats keys stay
    * PHYSICAL per the protocol (rekeyed from the file namespace).
    * Unpartitioned. */
  private[graft] def foreignIdMapped(df: DataFrame, table0: String,
      physicalOf: Map[String, String],
      fileNameOf: Map[String, String] = Map.empty): Unit = {
    val table = FsIO.normalize(table0.stripSuffix("/"))
    require(latestVersion(table) < 0,
      s"foreignIdMapped: $table already exists")
    df.schema.fieldNames.foreach(n => require(physicalOf.contains(n),
      s"foreignIdMapped: no physical name for column $n"))
    val fileOf = df.schema.fieldNames.map(n =>
      n -> fileNameOf.getOrElse(n, physicalOf(n))).toMap
    require(fileOf.values.toSet.size == fileOf.size &&
        physicalOf.values.toSet.size == physicalOf.size,
      "foreignIdMapped: physical/file names must be distinct")
    val spark = df.sparkSession
    val now = System.currentTimeMillis()
    val idOf: Map[String, Long] =
      df.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> (i + 1L) }.toMap
    // file frame: FILE column names, each carrying its parquet field
    // id; written under fieldId.write in a cloned session
    val dfFile = df.select(df.schema.fieldNames.toIndexedSeq.map { n =>
      col(n).as(fileOf(n), new MetadataBuilder()
        .putLong("parquet.field.id", idOf(n)).build())
    }: _*)
    val staging = s"$table/_staging/${java.util.UUID.randomUUID()}"
    val adds = try {
      org.apache.spark.sql.graftbridge.Bridge.withSessionConf(dfFile,
        Map("spark.sql.parquet.fieldId.write.enabled" -> "true")) { d =>
        d.write.mode(SaveMode.Overwrite).parquet(staging)
      }
      val promoted = promoteStaged(table, staging, Nil)
      val statsByPath = DeltaStats.collect(spark,
        dfFile.schema.fieldNames.toSeq,
        promoted.map(a => resolveDataPath(table, a.path)))
      // stats keys are PHYSICAL names in both CM modes — rekey from
      // the file namespace
      val physOfFile = df.schema.fieldNames
        .map(n => fileOf(n) -> physicalOf(n)).toMap
      def rekey(json: String): String = {
        import com.fasterxml.jackson.databind.node.ObjectNode
        val node = mapper.readTree(json).asInstanceOf[ObjectNode]
        Seq("minValues", "maxValues", "nullCount").foreach { sec =>
          Option(node.get(sec)).collect { case o: ObjectNode =>
            val renamed = mapper.createObjectNode()
            val it = o.properties().iterator()
            while (it.hasNext) {
              val e = it.next()
              renamed.set[JsonNode](
                physOfFile.getOrElse(e.getKey, e.getKey), e.getValue)
            }
            node.set[JsonNode](sec, renamed)
          }
        }
        mapper.writeValueAsString(node)
      }
      promoted.map { a =>
        val st = statsByPath.getOrElse(resolveDataPath(table, a.path), null)
        a.copy(stats = if (st == null) null else rekey(st))
      }
    } finally FsIO.deleteRecursive(staging)
    val mapped = StructType(df.schema.fields.map { f =>
      f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
        .putString("delta.columnMapping.physicalName", physicalOf(f.name))
        .putLong("delta.columnMapping.id", idOf(f.name))
        .build())
    })
    val lines = Seq.newBuilder[String]
    val pn = mapper.createObjectNode()
    val p = pn.putObject("protocol")
    p.put("minReaderVersion", 2)
    p.put("minWriterVersion", 5)
    lines += mapper.writeValueAsString(pn)
    val mn = mapper.createObjectNode()
    val m = mn.putObject("metaData")
    m.put("id", java.util.UUID.randomUUID().toString)
    val fmt = m.putObject("format")
    fmt.put("provider", "parquet")
    fmt.putObject("options")
    m.put("schemaString", mapped.json)
    m.putArray("partitionColumns")
    val cfg = m.putObject("configuration")
    cfg.put("delta.columnMapping.mode", "id")
    cfg.put("delta.columnMapping.maxColumnId", df.schema.size.toString)
    m.put("createdTime", now)
    lines += mapper.writeValueAsString(mn)
    adds.foreach { a =>
      val an = mapper.createObjectNode()
      val ad = an.putObject("add")
      ad.put("path", a.path)
      ad.putObject("partitionValues")
      ad.put("size", a.size)
      ad.put("modificationTime", a.modificationTime)
      ad.put("dataChange", true)
      if (a.stats != null) ad.put("stats", a.stats)
      lines += mapper.writeValueAsString(an)
    }
    commit(table, 0L, lines.result())
  }

  /** Re-checkpoint the CURRENT snapshot as a classic MULTI-PART
    * checkpoint (`v.checkpoint.<part>.<numParts>.parquet` — the
    * long-lived OSS-table layout) + a `parts`-carrying
    * `_last_checkpoint`. Fixture builder: specs/lanes delete the
    * pre-checkpoint JSON commits and prove the table still opens
    * from the parts alone. */
  private[graft] def foreignMultiPartCheckpoint(spark: SparkSession,
      table0: String, numParts: Int): Unit = {
    val table = FsIO.normalize(table0.stripSuffix("/"))
    val s = snapshot(spark, table, None)
    require(numParts >= 2,
      s"foreignMultiPartCheckpoint: need >= 2 parts, got $numParts")
    val v = s.version
    var total = 0L
    (1 to numParts).foreach { k =>
      val rows = new java.util.ArrayList[Row]()
      if (k == 1) { // exactly one part carries protocol + metaData
        rows.add(Row(cpProtocolRow(s), null, null))
        rows.add(Row(null, cpMetaRow(s), null))
      }
      s.adds.zipWithIndex.filter(_._2 % numParts == k - 1)
        .foreach { case (a, _) => rows.add(Row(null, null, cpAddRow(a))) }
      total += rows.size()
      writeOneParquet(spark, spark.createDataFrame(rows, CpSchema),
        f"${logDir(table)}/$v%020d.checkpoint.$k%010d.$numParts%010d.parquet")
    }
    writeLastCheckpoint(table, v, total, numParts)
  }

  private val CpSidecarT = StructType(Seq(
    StructField("path", StringType),
    StructField("sizeInBytes", LongType),
    StructField("modificationTime", LongType)))
  private val CpCheckpointMetadataT = StructType(Seq(
    StructField("version", LongType)))

  /** Re-checkpoint the CURRENT snapshot as a V2 (uuid-named)
    * checkpoint — the modern DBR layout: a manifest
    * `v.checkpoint.<uuid>.{parquet|json}` holding protocol/metaData/
    * checkpointMetadata, with the add actions either inline
    * (`numSidecars` = 0, parquet manifests only) or spread over
    * `numSidecars` parquet sidecar files under `_delta_log/_sidecars/`.
    * Upgrades the declared protocol to readerVersion 3 / writerVersion
    * 7 with the `v2Checkpoint` feature, exactly what a conforming
    * writer publishes. Fixture builder (tests + oracle lanes). */
  private[graft] def foreignV2Checkpoint(spark: SparkSession,
      table0: String, numSidecars: Int,
      jsonManifest: Boolean = false): Unit = {
    val table = FsIO.normalize(table0.stripSuffix("/"))
    val s = snapshot(spark, table, None)
    require(numSidecars >= 0, s"bad numSidecars $numSidecars")
    val rf = (s.readerFeatures + "v2Checkpoint").toSeq.sorted
    val wf = (s.writerFeatures + "v2Checkpoint").toSeq.sorted
    writeV2CheckpointFiles(spark, table, s, 3, 7, rf, wf,
      numSidecars, jsonManifest)
  }

  /** Write the V2 checkpoint FILES for snapshot `s`: `numSidecars`
    * parquet sidecars under `_delta_log/_sidecars/` carrying the add
    * actions, plus a uuid-named manifest (parquet, or json action
    * lines when `jsonManifest`) declaring the given protocol rows +
    * metaData + checkpointMetadata. Shared by the production
    * checkpoint writer (real table protocol) and the foreign-layout
    * fixture builder (upgraded 3/7 + v2Checkpoint protocol). */
  private def writeV2CheckpointFiles(spark: SparkSession, table: String,
      s: Snapshot, minReader: Int, minWriter: Int,
      rf: Seq[String], wf: Seq[String], numSidecars: Int,
      jsonManifest: Boolean): Unit = {
    require(!jsonManifest || numSidecars >= 1,
      "v2 checkpoint: a json manifest carries adds via sidecars")
    val v = s.version
    // sidecar files first (a manifest must never reference missing ones)
    val sidecarSchema = StructType(Seq(StructField("add", CpAddT)))
    val groups = if (numSidecars == 0) Nil
      else (0 until numSidecars).map(k =>
        s.adds.zipWithIndex.filter(_._2 % numSidecars == k).map(_._1))
    val now = System.currentTimeMillis()
    val sidecars = groups.map { adds =>
      val rows = new java.util.ArrayList[Row]()
      adds.foreach(a => rows.add(Row(cpAddRow(a))))
      val name = s"${java.util.UUID.randomUUID()}.parquet"
      val len = writeOneParquet(spark,
        spark.createDataFrame(rows, sidecarSchema),
        s"${logDir(table)}/_sidecars/$name")
      (name, len)
    }
    val uuid = java.util.UUID.randomUUID().toString
    if (jsonManifest) {
      val lines = Seq.newBuilder[String]
      val pn = mapper.createObjectNode()
      val p = pn.putObject("protocol")
      p.put("minReaderVersion", minReader)
      p.put("minWriterVersion", minWriter)
      if (rf != null) { val rfA = p.putArray("readerFeatures"); rf.foreach(rfA.add) }
      if (wf != null) { val wfA = p.putArray("writerFeatures"); wf.foreach(wfA.add) }
      lines += mapper.writeValueAsString(pn)
      val mn = mapper.createObjectNode()
      val m = mn.putObject("metaData")
      m.put("id", s.meta.id)
      if (s.meta.name != null) m.put("name", s.meta.name)
      if (s.meta.description != null) m.put("description", s.meta.description)
      val fmt = m.putObject("format")
      fmt.put("provider", "parquet")
      fmt.putObject("options")
      m.put("schemaString", s.meta.schemaString)
      val pc = m.putArray("partitionColumns")
      s.meta.partitionColumns.foreach(pc.add)
      val cfg = m.putObject("configuration")
      s.meta.configuration.foreach { case (k, vv) => cfg.put(k, vv) }
      m.put("createdTime", s.meta.createdTime)
      lines += mapper.writeValueAsString(mn)
      val cn = mapper.createObjectNode()
      cn.putObject("checkpointMetadata").put("version", v)
      lines += mapper.writeValueAsString(cn)
      sidecars.foreach { case (name, len) =>
        val sn = mapper.createObjectNode()
        val sc = sn.putObject("sidecar")
        sc.put("path", name)
        sc.put("sizeInBytes", len)
        sc.put("modificationTime", now)
        lines += mapper.writeValueAsString(sn)
      }
      val out = FsIO.create(f"${logDir(table)}/$v%020d.checkpoint.$uuid.json")
      try out.write((lines.result().mkString("\n") + "\n")
        .getBytes(StandardCharsets.UTF_8))
      finally out.close()
    } else {
      val manifestSchema = StructType(Seq(
        StructField("protocol", CpProtocolT),
        StructField("metaData", CpMetaT),
        StructField("add", CpAddT),
        StructField("sidecar", CpSidecarT),
        StructField("checkpointMetadata", CpCheckpointMetadataT)))
      val rows = new java.util.ArrayList[Row]()
      rows.add(Row(Row(minReader, minWriter, rf, wf), null, null, null, null))
      rows.add(Row(null, cpMetaRow(s), null, null, null))
      rows.add(Row(null, null, null, null, Row(v)))
      if (numSidecars == 0)
        s.adds.foreach(a => rows.add(Row(null, null, cpAddRow(a), null, null)))
      else sidecars.foreach { case (name, len) =>
        rows.add(Row(null, null, null, Row(name, len, now), null))
      }
      writeOneParquet(spark, spark.createDataFrame(rows, manifestSchema),
        f"${logDir(table)}/$v%020d.checkpoint.$uuid.parquet")
    }
  }

  /** Simulate a foreign DELETE via deletion vectors: rows of the
    * CURRENT snapshot matching `pred` (data columns only) are masked
    * by per-file roaring bitmaps — each affected file gets a
    * remove + re-add carrying a `deletionVector` descriptor, and the
    * commit upgrades the protocol to readerVersion 3 +
    * `deletionVectors`, exactly the foreign layout the read path must
    * honor. `inline`: store each DV z85-inline (`i`) instead of in a
    * shared `u`-storage .bin file. Fixture-scale only (the deleted
    * (file, row) set collects to the driver); production DV writes
    * stay rejected. Returns the committed version. */
  private[graft] def foreignDeleteRows(spark: SparkSession, table0: String,
      pred: Column, inline: Boolean = false): Long = {
    val table = FsIO.normalize(table0.stripSuffix("/"))
    val snap = snapshot(spark, table, None)
    gate(snap)
    require(snap.meta.columnMapping == "none",
      "foreignDeleteRows: combine with foreignColumnMapped is unsupported")
    require(snap.adds.forall(_.dv == null),
      "foreignDeleteRows: one DV generation only")
    val schema = DataType.fromJson(snap.meta.schemaString).asInstanceOf[StructType]
    val partCols = snap.meta.partitionColumns
    val dataSchema = StructType(schema.filterNot(f => partCols.contains(f.name)))
    val paths = snap.adds.map(a => resolveDataPath(table, a.path))
    // raw _metadata spellings resolve through the shared spellings
    // enumeration (never per-row normalization)
    val bySpelling: Map[String, AddFile] = snap.adds.flatMap { a =>
      PathKeys.spellings(resolveDataPath(table, a.path)).map(_ -> a)
    }.toMap
    val hits = spark.read.schema(dataSchema).parquet(paths: _*)
      .filter(pred)
      .select(col("_metadata.file_path"), col("_metadata.row_index"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (sp, rows) =>
        bySpelling.getOrElse(sp, throw new IllegalStateException(
          s"unmatched scan spelling $sp")) -> rows.map(_.getLong(1)).sorted }
    if (hits.isEmpty) return snap.version // nothing to delete
    val now = System.currentTimeMillis()
    val affected = hits.keys.toSeq.sortBy(_.path)
    val payloads = affected.map(a => RoaringDv.serialize(hits(a)))
    val descriptors: Seq[DvDescriptor] =
      if (inline) payloads.map { pl =>
        // z85 needs length % 4 == 0: pad, keep sizeInBytes exact
        val padded = java.util.Arrays.copyOf(pl, (pl.length + 3) / 4 * 4)
        DvDescriptor("i", RoaringDv.z85Encode(padded), 0, pl.length,
          cardinalityOf(pl))
      } else {
        val uuid = java.util.UUID.randomUUID()
        val offs = RoaringDv.writeFile(
          s"$table/deletion_vector_$uuid.bin", payloads)
        payloads.zip(offs).map { case (pl, (off, len)) =>
          DvDescriptor("u", RoaringDv.encodeDvPath(uuid), off, len,
            cardinalityOf(pl))
        }
      }
    val lines = Seq.newBuilder[String]
    val pn = mapper.createObjectNode()
    val p = pn.putObject("protocol")
    p.put("minReaderVersion", 3)
    p.put("minWriterVersion", 7)
    p.putArray("readerFeatures").add("deletionVectors")
    p.putArray("writerFeatures").add("deletionVectors")
    lines += mapper.writeValueAsString(pn)
    affected.zip(descriptors).foreach { case (a, d) =>
      val rn = mapper.createObjectNode()
      val r = rn.putObject("remove")
      r.put("path", a.path)
      r.put("deletionTimestamp", now)
      r.put("dataChange", true)
      lines += mapper.writeValueAsString(rn)
      val an = mapper.createObjectNode()
      val ad = an.putObject("add")
      ad.put("path", a.path)
      val pv = ad.putObject("partitionValues")
      a.partitionValues.foreach { case (k, v) =>
        if (v == null) pv.putNull(k) else pv.put(k, v)
      }
      ad.put("size", a.size)
      ad.put("modificationTime", now)
      ad.put("dataChange", true)
      if (a.stats != null) ad.put("stats", a.stats)
      val dv = ad.putObject("deletionVector")
      dv.put("storageType", d.storageType)
      dv.put("pathOrInlineDv", d.pathOrInlineDv)
      dv.put("offset", d.offset)
      dv.put("sizeInBytes", d.sizeInBytes)
      dv.put("cardinality", d.cardinality)
      lines += mapper.writeValueAsString(an)
    }
    val v = snap.version + 1
    commit(table, v, lines.result())
    v
  }

  private def cardinalityOf(payload: Array[Byte]): Long =
    RoaringDv.parse(payload).cardinality


  private[sources] def unescapeHive(s: String): String = {
    if (!s.contains('%')) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val hi = Character.digit(s.charAt(i + 1), 16)
        val lo = Character.digit(s.charAt(i + 2), 16)
        if (hi >= 0 && lo >= 0) { sb.append(((hi << 4) | lo).toChar); i += 3 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** URL-encode an on-disk relative path for `add.path` (UTF-8
    * percent-encoding, '/' kept as the segment separator). */
  private def encodePath(rel: String): String = {
    val keep = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789" +
      "-._~!$&'()*+,;=:@/"
    val bytes = rel.getBytes(StandardCharsets.UTF_8)
    val sb = new StringBuilder(bytes.length)
    bytes.foreach { b =>
      val c = (b & 0xff).toChar
      if (b >= 0 && keep.indexOf(c) >= 0) sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  /** Nullability-relaxed schema for append compatibility (Spark
    * writers widen nullability; value equality is what matters). */
  private def relaxed(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.map(f =>
      StructField(f.name, relaxed(f.dataType), nullable = true)))
    case a: ArrayType => ArrayType(relaxed(a.elementType), containsNull = true)
    case m: MapType =>
      MapType(relaxed(m.keyType), relaxed(m.valueType), valueContainsNull = true)
    case o => o
  }
}
