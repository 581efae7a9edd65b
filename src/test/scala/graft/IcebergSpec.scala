package graft

import java.nio.charset.StandardCharsets
import org.apache.avro.{Schema => ASchema}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{Export, FsIO, Iceberg, Readers}

/** Iceberg table source/sink. Independence: the "foreign-shaped v1
  * table" test hand-builds metadata JSON + manifest Avro files in the
  * spec itself with avro-java and ITS OWN schema strings (no graft
  * writer on that path) — covering the v1 schema fallback, file: URI
  * resolution, int-typed status fields and the ORC data-file branch. */
class IcebergSpec extends SparkSpec {

  private def tmp(leaf: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_iceberg").toString
    s"$d/$leaf"
  }

  private def writeText(path: String, s: String): Unit = {
    val out = FsIO.create(path)
    try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  private def readAll(path: String): String = {
    val in = FsIO.open(path)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  test("round trip preserves typed values incl. decimal/date/timestamps/arrays") {
    val t = tmp("t.iceberg")
    import spark.implicits._
    val df = spark.range(0, 30).select(
      col("id"),
      (col("id") % 5).cast("int").as("i"),
      (col("id") * 0.5 - 2.0).as("d"),
      concat(lit("v"), col("id")).as("s"),
      col("id").cast("decimal(14,4)").as("dec"),
      date_add(lit(java.sql.Date.valueOf("2024-06-01")), col("id").cast("int")).as("dt"),
      to_timestamp(lit("2024-06-01 08:00:00")).cast("timestamp_ntz").as("tsn"),
      array(col("id").cast("double"), lit(1.5)).as("arr"))
    Iceberg.toIceberg(df, t)
    val back = Iceberg.fromIceberg(spark, t)
    assert(back.schema("tsn").dataType == TimestampNTZType)
    assert(back.schema("dec").dataType == DecimalType(14, 4))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
    assert(!FsIO.exists(s"$t/_staging"))
  }

  test("append fast-appends; overwrite replaces; snapshots time travel by id") {
    val t = tmp("tt.iceberg")
    import spark.implicits._
    Iceberg.toIceberg(Seq((1L, "a")).toDF("id", "s"), t)
    Iceberg.toIceberg(Seq((2L, "b")).toDF("id", "s"), t, mode = "append")
    Iceberg.toIceberg(Seq((9L, "z")).toDF("id", "s"), t, mode = "overwrite")
    val snaps = Iceberg.snapshots(spark, t).orderBy("sequence_number").collect()
    assert(snaps.length == 3)
    assert(snaps.map(_.getAs[Long]("sequence_number")).toSeq == Seq(1L, 2L, 3L))
    assert(snaps.last.getAs[Boolean]("is_current"))
    def ids(sid: Option[Long]) = Iceberg.fromIceberg(spark, t, sid)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val sIds = snaps.map(_.getAs[Long]("snapshot_id"))
    assert(ids(Some(sIds(0))) == Seq(1L))
    assert(ids(Some(sIds(1))) == Seq(1L, 2L))
    assert(ids(Some(sIds(2))) == Seq(9L))
    assert(ids(None) == Seq(9L))
    intercept[IllegalArgumentException] { ids(Some(123456L)) }
    // schema mismatch on append is loud
    val e = intercept[IllegalArgumentException] {
      Iceberg.toIceberg(Seq((1L, 2.0)).toDF("id", "s"), t, mode = "append")
    }
    assert(e.getMessage.contains("schema mismatch"))
  }

  test("schema JSON round trip: spark -> iceberg -> spark, unique field ids") {
    val st = new StructType()
      .add("a", LongType, nullable = false)
      .add("b", new StructType()
        .add("x", DoubleType).add("y", StringType), nullable = true)
      .add("c", ArrayType(IntegerType, containsNull = false))
      .add("d", DecimalType(20, 5))
      .add("ts", TimestampType).add("tn", TimestampNTZType)
      .add("dt", DateType).add("bin", BinaryType)
    val (node, lastId) = Iceberg.sparkToIceberg(st)
    val back = Iceberg.icebergToSpark(node)
    assert(back == st)
    // ids unique and dense across the whole tree (struct members +
    // list element ids): 8 top + 2 nested + 1 element
    assert(lastId == 11)
    val ids = """"id"\s*:\s*(\d+)|"element-id"\s*:\s*(\d+)""".r
      .findAllMatchIn(node.toString)
      .map(m => Option(m.group(1)).getOrElse(m.group(2)).toInt).toSeq
    assert(ids.sorted == (1 to 11))
  }

  test("foreign-shaped v1 table: hand-built metadata, file: URIs, ORC data") {
    val root = tmp("foreign")
    FsIO.mkdirs(s"$root/metadata"); FsIO.mkdirs(s"$root/data")
    import spark.implicits._
    // ORC data written by Spark itself
    val staging = s"$root/orcstage"
    Seq((1L, 10.5), (2L, 20.5), (3L, 30.5)).toDF("k", "v")
      .coalesce(1).write.orc(staging)
    val orcFile = FsIO.listFilesRecursive(staging)
      .collect { case (p, _, _) if p.endsWith(".orc") => p }.head
    val dataPath = s"$root/data/d0.orc"
    FsIO.rename(orcFile, dataPath)
    // manifest avro (spec-local schema strings: int status, no seq)
    val entrySchema = new ASchema.Parser().parse(
      """{"type":"record","name":"e","fields":[
        |{"name":"status","type":"int"},
        |{"name":"data_file","type":{"type":"record","name":"d","fields":[
        |{"name":"file_path","type":"string"},
        |{"name":"file_format","type":"string"},
        |{"name":"record_count","type":"long"}]}}]}"""
        .stripMargin.replace("\n", ""))
    val manifestPath = s"$root/metadata/m0.avro"
    locally {
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](entrySchema))
      val out = FsIO.create(manifestPath)
      try {
        w.create(entrySchema, out)
        val live = new GenericData.Record(entrySchema)
        live.put("status", 1)
        val d = new GenericData.Record(entrySchema.getField("data_file").schema())
        d.put("file_path", s"file://$dataPath") // absolute URI form
        d.put("file_format", "ORC")
        d.put("record_count", 3L)
        live.put("data_file", d)
        w.append(live)
        // a DELETED entry pointing at a nonexistent file must be skipped
        val dead = new GenericData.Record(entrySchema)
        dead.put("status", 2)
        val dd = new GenericData.Record(entrySchema.getField("data_file").schema())
        dd.put("file_path", s"$root/data/KILLED.parquet")
        dd.put("file_format", "PARQUET")
        dd.put("record_count", 99L)
        dead.put("data_file", dd)
        w.append(dead)
      } finally w.close()
    }
    val listSchema = new ASchema.Parser().parse(
      """{"type":"record","name":"mf","fields":[
        |{"name":"manifest_path","type":"string"},
        |{"name":"manifest_length","type":"long"},
        |{"name":"partition_spec_id","type":"int"},
        |{"name":"added_snapshot_id","type":["null","long"],"default":null}]}"""
        .stripMargin.replace("\n", "")) // v1: no content/sequence fields
    val listPath = s"$root/metadata/snap-77.avro"
    locally {
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](listSchema))
      val out = FsIO.create(listPath)
      try {
        w.create(listSchema, out)
        val e = new GenericData.Record(listSchema)
        e.put("manifest_path", s"file://$manifestPath")
        e.put("manifest_length", 1L)
        e.put("partition_spec_id", 0)
        e.put("added_snapshot_id", 77L)
        w.append(e)
      } finally w.close()
    }
    // v1 metadata: bare "schema", no version-hint (listing fallback)
    writeText(s"$root/metadata/v1.metadata.json",
      s"""{"format-version":1,"table-uuid":"u","location":"$root",
         |"last-column-id":2,
         |"schema":{"type":"struct","fields":[
         |  {"id":1,"name":"k","required":true,"type":"long"},
         |  {"id":2,"name":"v","required":false,"type":"double"}]},
         |"partition-spec":[],
         |"current-snapshot-id":77,
         |"snapshots":[{"snapshot-id":77,"timestamp-ms":5,
         |  "manifest-list":"file://$listPath"}]}""".stripMargin)
    // (no version-hint.text and no .iceberg suffix here — loading
    // goes through the module; Readers.open dispatch is tested below)
    val got = Iceberg.fromIceberg(spark, root)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 10.5), (2L, 20.5), (3L, 30.5)))
    // fast-append onto the FOREIGN v1 table: the prior manifest-list
    // entry lacks every v2 field (content/sequence/counts) — the
    // re-listing must default-fill, not NPE — and the result reads
    // through BOTH manifests (v1 ORC + new parquet)
    Iceberg.toIceberg(Seq((9L, 90.5)).toDF("k", "v"), root, mode = "append")
    val after = Iceberg.fromIceberg(spark, root)
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(after == Seq(1L, 2L, 3L, 9L))
    // (required:true -> non-nullable mapping is pinned by the schema
    // round-trip test; the READ frame relaxes it — Spark file sources
    // force user schemas nullable, asNullable in FileSourceStrategy)
  }

  test("merge-on-read positional deletes apply; equality deletes and bad versions reject") {
    // REAL MoR table: our v2 writer + a foreign-shaped position-delete
    // commit (sorted (file_path, pos) parquet + content=1 manifest)
    val morRoot = tmp("mor2")
    import spark.implicits._
    val df = spark.range(0, 300)
      .select(col("id"), (col("id") % 9).as("m"),
        concat(lit("x"), col("id")).as("s"))
      .repartitionByRange(3, col("id"))
    Iceberg.toIceberg(df, morRoot)
    val firstSnap = Iceberg.snapshots(spark, morRoot)
      .filter(col("is_current")).head.getLong(0)
    val sid = Iceberg.foreignPositionDeletes(spark, morRoot, col("m") === 4)
    assert(sid != firstSnap)
    val back = Iceberg.fromIceberg(spark, morRoot)
    assert(back.count() == 300 - 33) // ids 4,13,...,292
    assert(back.filter(col("m") === 4).count() == 0)
    assert(back.filter(col("id") === 5).count() == 1) // neighbors survive
    // bounds skipping composes with the delete anti-join
    val f = Iceberg.fromIceberg(spark, morRoot, None, Some(col("id") < 100))
    assert(f.count() == 100 - 11) // 4,13,...,94 deleted below 100
    // time travel BEFORE the delete still sees every row
    assert(Iceberg.fromIceberg(spark, morRoot, Some(firstSnap)).count() == 300)
    // snapshot history gained the delete commit
    assert(Iceberg.snapshots(spark, morRoot).count() == 2)

    // EQUALITY deletes (content=2 in a delete manifest) reject loudly
    val root = tmp("mor")
    FsIO.mkdirs(s"$root/metadata")
    val entrySchema = new ASchema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |  {"name":"content","type":"int"},
        |  {"name":"file_path","type":"string"},
        |  {"name":"file_format","type":"string"},
        |  {"name":"record_count","type":"long"}]}}]}"""
        .stripMargin.replace("\n", ""))
    val eqManifest = s"$root/metadata/eq-m.avro"
    locally {
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](entrySchema))
      val out = FsIO.create(eqManifest)
      try {
        w.create(entrySchema, out)
        val e = new GenericData.Record(entrySchema)
        e.put("status", 1)
        val d = new GenericData.Record(
          entrySchema.getField("data_file").schema())
        d.put("content", 2) // EQUALITY_DELETES
        d.put("file_path", "eq-del.parquet")
        d.put("file_format", "PARQUET")
        d.put("record_count", 1L)
        e.put("data_file", d)
        w.append(e)
      } finally w.close()
    }
    val listSchema = new ASchema.Parser().parse(
      """{"type":"record","name":"mf","fields":[
        |{"name":"manifest_path","type":"string"},
        |{"name":"manifest_length","type":"long"},
        |{"name":"partition_spec_id","type":"int"},
        |{"name":"content","type":"int"}]}""".stripMargin.replace("\n", ""))
    val listPath = s"$root/metadata/snap-1.avro"
    locally {
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](listSchema))
      val out = FsIO.create(listPath)
      try {
        w.create(listSchema, out)
        val e = new GenericData.Record(listSchema)
        e.put("manifest_path", eqManifest)
        e.put("manifest_length", 1L)
        e.put("partition_spec_id", 0)
        e.put("content", 1) // DELETES manifest
        w.append(e)
      } finally w.close()
    }
    def meta(fv: Int, snapId: Long): String =
      s"""{"format-version":$fv,"location":"$root","last-column-id":1,
         |"schema":{"type":"struct","fields":[
         |  {"id":1,"name":"k","required":false,"type":"long"}]},
         |"current-snapshot-id":$snapId,
         |"snapshots":[{"snapshot-id":1,"timestamp-ms":5,
         |  "manifest-list":"$listPath"}]}""".stripMargin
    writeText(s"$root/metadata/v1.metadata.json", meta(2, 1))
    writeText(s"$root/metadata/version-hint.text", "1")
    val e1 = intercept[IllegalArgumentException] {
      Iceberg.fromIceberg(spark, root)
    }
    assert(e1.getMessage.contains("equality delete"))
    // empty table: current-snapshot-id -1
    writeText(s"$root/metadata/v2.metadata.json", meta(2, -1))
    writeText(s"$root/metadata/version-hint.text", "2")
    val empty = Iceberg.fromIceberg(spark, root)
    assert(empty.count() == 0 && empty.columns.toSeq == Seq("k"))
    // format-version 3 rejects
    writeText(s"$root/metadata/v3.metadata.json", meta(3, -1))
    writeText(s"$root/metadata/version-hint.text", "3")
    val e2 = intercept[IllegalArgumentException] {
      Iceberg.fromIceberg(spark, root)
    }
    assert(e2.getMessage.contains("format-version"))
    // hint pointing at a missing file rejects
    writeText(s"$root/metadata/version-hint.text", "9")
    val e3 = intercept[IllegalArgumentException] {
      Iceberg.fromIceberg(spark, root)
    }
    assert(e3.getMessage.contains("version-hint"))
  }

  test("rename drift in the schema history rejects data reads (name != field-id resolution)") {
    val root = tmp("renamed")
    import spark.implicits._
    Iceberg.toIceberg(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), root)
    // forge the foreign evolution: a second schema renaming s -> txt
    // becomes current — old data files still carry the physical name
    // "s", which a by-name reader would surface as silent NULLs
    val mdir = s"$root/metadata"
    val hint = readAll(s"$mdir/version-hint.text").trim.toInt
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val j = om.readTree(readAll(f"$mdir/v$hint%05d.metadata.json"))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val schemas = j.get("schemas")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode]
    val s2 = schemas.get(0).deepCopy()
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    s2.put("schema-id", 1)
    val fields = s2.get("fields")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode]
    (0 until fields.size()).foreach { i =>
      val f = fields.get(i)
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      if (f.get("name").asText() == "s") f.put("name", "txt")
    }
    schemas.add(s2)
    j.put("current-schema-id", 1)
    writeText(f"$mdir/v$hint%05d.metadata.json", om.writeValueAsString(j))
    val e = intercept[IllegalArgumentException] {
      Iceberg.fromIceberg(spark, root)
    }
    assert(e.getMessage.contains("field id"))
    // metadata-only surfaces still work on the renamed table
    assert(Iceberg.snapshots(spark, root).count() == 1)
    // name REUSE (same name, new field id) is the nastier variant —
    // old files would silently read the WRONG column
    val s3 = schemas.get(0).deepCopy()
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    s3.put("schema-id", 2)
    val f3 = s3.get("fields")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode]
    (0 until f3.size()).foreach { i =>
      val f = f3.get(i)
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      if (f.get("name").asText() == "s") f.put("id", 99)
    }
    val j2 = om.readTree(readAll(f"$mdir/v$hint%05d.metadata.json"))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val sch2 = j2.get("schemas")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode]
    sch2.removeAll(); sch2.add(s3)
    sch2.add(om.readTree(om.writeValueAsString(
      j.get("schemas").get(0)))) // original back as non-current
    j2.put("current-schema-id", 0)
    writeText(f"$mdir/v$hint%05d.metadata.json", om.writeValueAsString(j2))
    val e2 = intercept[IllegalArgumentException] {
      Iceberg.fromIceberg(spark, root)
    }
    assert(e2.getMessage.contains("field id"))
  }

  test("equality deletes: sequence-scoped masking; later appends survive; composes with position deletes") {
    val root = tmp("eq")
    import spark.implicits._
    val df = spark.range(0, 100).select(col("id"),
      when(col("id") % 3 === 0, "del").otherwise("keep").as("grp"),
      (col("id") % 5).cast("int").as("m"))
      .repartitionByRange(2, col("id"))
    Iceberg.toIceberg(df, root) // seq 1
    // equality delete on grp='del' at seq 2
    Iceberg.foreignEqualityDeletes(spark, root,
      Seq("del").toDF("grp"), Seq("grp"))
    val afterEq = Iceberg.fromIceberg(spark, root)
    assert(afterEq.count() == 100 - 34) // ids 0,3,...,99
    assert(afterEq.filter(col("grp") === "del").count() == 0)
    // rows appended AFTER the delete (seq 3) match the tuple but
    // SURVIVE — the strict sequence scoping the spec requires
    Iceberg.toIceberg(
      spark.range(1000, 1010).select(col("id"), lit("del").as("grp"),
        lit(1).as("m")), root, mode = "append")
    val afterAppend = Iceberg.fromIceberg(spark, root)
    assert(afterAppend.filter(col("grp") === "del").count() == 10)
    assert(afterAppend.count() == 66 + 10)
    // a SECOND equality delete (multi-column) at seq 4 masks both
    // generations below it
    Iceberg.foreignEqualityDeletes(spark, root,
      Seq(("keep", 2)).toDF("grp", "m"), Seq("grp", "m"))
    val afterEq2 = Iceberg.fromIceberg(spark, root)
    assert(afterEq2.filter(col("grp") === "keep" && col("m") === 2).count() == 0)
    assert(afterEq2.filter(col("grp") === "del").count() == 10) // untouched
    // position deletes compose on top (dropping two surviving ids)
    Iceberg.foreignPositionDeletes(spark, root, col("id").isin(1000L, 1001L))
    val afterPos = Iceberg.fromIceberg(spark, root)
    assert(afterPos.filter(col("id").isin(1000L, 1001L)).count() == 0)
    assert(afterPos.count() == afterEq2.count() - 2)
    // bounds skipping still composes
    val f = Iceberg.fromIceberg(spark, root, None, Some(col("id") >= 1000))
    assert(f.count() == 8)
  }

  test("deleteWhere on top of existing equality deletes (mixed-delete table)") {
    import spark.implicits._
    val root = tmp("mixdel.iceberg")
    val df = spark.range(0, 100).select(
      col("id"), (col("id") % 4).cast("int").as("g"))
      .repartitionByRange(2, col("id"))
    Iceberg.toIceberg(df, root)
    // Flink-style equality delete: mask g=3 rows of files BELOW its seq
    Iceberg.foreignEqualityDeletes(spark, root, Seq(3).toDF("g"), Seq("g"))
    assert(Iceberg.fromIceberg(spark, root).count() == 75)
    // our position delete commits at a HIGHER sequence — both apply
    Iceberg.deleteWhere(spark, root, col("id") % 10 === 2)
    val after = Iceberg.fromIceberg(spark, root)
    // CoW equivalent: g<>3 AND id%10<>2
    assert(after.count() == (0L until 100L).count(i => i % 4 != 3 && i % 10 != 2))
    assert(after.filter(col("g") === 3).count() == 0)
    assert(after.filter(col("id") % 10 === 2).count() == 0)
    // an append AFTER both deletes: matching-tuple rows SURVIVE the
    // older equality delete (strict sequence scoping) and were never
    // in the position delete
    Iceberg.toIceberg(spark.range(1000, 1010).select(
      col("id"), lit(3).cast("int").as("g")), root, mode = "append")
    val appended = Iceberg.fromIceberg(spark, root)
    assert(appended.filter(col("g") === 3).count() == 10)
    // deleting from the appended slab composes too
    Iceberg.deleteWhere(spark, root, col("id") === 1005L)
    assert(Iceberg.fromIceberg(spark, root).filter(col("g") === 3).count() == 9)
  }

  test("partitioned toIceberg: identity spec round trip, appends, pruning, deletes") {
    import spark.implicits._
    val root = tmp("part.iceberg")
    val df = spark.range(0, 120).select(
      col("id"), (col("id") % 3).cast("int").as("grp"),
      concat(lit("v"), col("id")).as("label"))
      .repartitionByRange(2, col("id"))
    Iceberg.toIceberg(df, root, partitionBy = Seq("grp"))
    val back = Iceberg.fromIceberg(spark, root)
    assert(back.columns.toSeq == Seq("id", "grp", "label"))
    assert(back.count() == 120)
    // data files CONTAIN the partition source column (the Iceberg
    // layout, unlike Delta/Hive) and live under grp=<v>/ dirs
    val files = back.inputFiles
    assert(files.forall(_.contains("grp=")))
    assert(spark.read.parquet(files.head).columns.contains("grp"))
    // bounds-based pruning on the partition column plans fewer files
    val pruned = Iceberg.fromIceberg(spark, root, None, Some(col("grp") === 1))
    assert(pruned.inputFiles.length < files.length)
    assert(pruned.count() == 40)
    // the metadata json declares the identity spec
    val metaFile = FsIO.listFileNames(s"$root/metadata")
      .filter(_.endsWith(".metadata.json")).max
    val mj = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/metadata/$metaFile")),
      StandardCharsets.UTF_8)
    val mjc = mj.replaceAll("\\s", "")
    assert(mjc.contains("\"transform\":\"identity\"") &&
      mjc.contains("\"source-id\":2") && mjc.contains("\"field-id\":1000"),
      mj.take(400))
    // appends keep the spec; a mismatched partitionBy is loud
    Iceberg.toIceberg(df.withColumn("id", col("id") + 1000), root,
      "append", partitionBy = Seq("grp"))
    assert(Iceberg.fromIceberg(spark, root).count() == 240)
    val e = intercept[IllegalArgumentException](
      Iceberg.toIceberg(df, root, "append"))
    assert(e.getMessage.contains("default spec"))
    // merge-on-read DELETE on the partitioned table: delete files are
    // partition-scoped (tuples copied from the data files' entries)
    Iceberg.deleteWhere(spark, root, col("id") % 10 === 4)
    val afterDel = Iceberg.fromIceberg(spark, root)
    assert(afterDel.count() == 240 - 24)
    assert(afterDel.filter(col("id") % 10 === 4).count() == 0)
    // values survive intact in every partition
    assert(afterDel.filter(col("grp") === 2).count() ==
      (0L until 120L).count(i => i % 3 == 2 && i % 10 != 4) +
      (1000L until 1120L).count(i => i % 3 == 2 && i % 10 != 4))
    // the delete manifest's entries carry the partition tuple schema
    val delManifest = FsIO.listFileNames(s"$root/metadata")
      .find(_.startsWith("graft-d-")).get
    var sawTuple = false
    val rd = new org.apache.avro.file.DataFileReader(
      new java.io.File(s"$root/metadata/$delManifest"),
      new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
    try while (rd.hasNext) {
      val entry = rd.next()
      val pt = entry.get("data_file").asInstanceOf[GenericRecord]
        .get("partition").asInstanceOf[GenericRecord]
      assert(pt.getSchema.getField("grp") != null)
      assert(pt.get("grp") != null)
      sawTuple = true
    } finally rd.close()
    assert(sawTuple)
    // null partition values round-trip (hive default-partition marker)
    val rootN = tmp("partnull.iceberg")
    val dfn = spark.range(0, 30).select(col("id"),
      when(col("id") % 3 === 0, lit(null)).otherwise(col("id") % 3)
        .cast("int").as("grp"))
    Iceberg.toIceberg(dfn, rootN, partitionBy = Seq("grp"))
    val backN = Iceberg.fromIceberg(spark, rootN)
    assert(backN.count() == 30)
    assert(backN.filter(col("grp").isNull).count() == 10)
    // non-identity-typed partition sources stay loud
    val e2 = intercept[IllegalArgumentException](Iceberg.toIceberg(
      spark.range(3).select(col("id"), (col("id") * 0.5).as("d")),
      tmp("partbad.iceberg"), partitionBy = Seq("d")))
    assert(e2.getMessage.contains("partition over double"))
    // EVOLVED spec id: a foreign table whose default spec is NOT 0
    // must see its id declared on new manifests (readers resolve the
    // partition tuple by it) — simulate by renumbering the spec
    val rootE = tmp("partevo.iceberg")
    Iceberg.toIceberg(df, rootE, partitionBy = Seq("grp"))
    val mf = FsIO.listFileNames(s"$rootE/metadata")
      .filter(_.endsWith(".metadata.json")).max
    val mPath = s"$rootE/metadata/$mf"
    val mTxt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(mPath)), StandardCharsets.UTF_8)
    java.nio.file.Files.write(java.nio.file.Paths.get(mPath), mTxt
      .replace("\"spec-id\" : 0", "\"spec-id\" : 3")
      .replace("\"default-spec-id\" : 0", "\"default-spec-id\" : 3")
      .getBytes(StandardCharsets.UTF_8))
    Iceberg.toIceberg(df.withColumn("id", col("id") + 5000), rootE,
      "append", partitionBy = Seq("grp"))
    assert(Iceberg.fromIceberg(spark, rootE).count() == 240)
    // the NEW manifest-list entry declares spec 3
    val meta2 = FsIO.listFileNames(s"$rootE/metadata")
      .filter(_.endsWith(".metadata.json")).max
    var sawSpec3 = false
    val listName = {
      val mj = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$rootE/metadata/$meta2")),
        StandardCharsets.UTF_8)
      val re = raw""""manifest-list"\s*:\s*"([^"]+)"""".r
      re.findAllMatchIn(mj).toSeq.last.group(1)
    }
    val rd2 = new org.apache.avro.file.DataFileReader(
      new java.io.File(listName),
      new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
    try while (rd2.hasNext) {
      val e = rd2.next()
      if (e.get("partition_spec_id").asInstanceOf[Int] == 3) sawSpec3 = true
    } finally rd2.close()
    assert(sawSpec3, "appended manifest does not declare the evolved spec id")
  }

  test("Appendix D single-value serialization round-trips every bound type") {
    import graft.sources.{DeltaStats, IcebergBounds => B}
    // spec-pinned byte layouts (little-endian numerics, UTF-8 string,
    // BE two's-complement decimal unscaled)
    assert(B.toBytes(new java.math.BigDecimal(100), IntegerType).get.toSeq ==
      Seq[Byte](100, 0, 0, 0))
    assert(B.toBytes(new java.math.BigDecimal(1L << 40), LongType).get.toSeq ==
      Seq[Byte](0, 0, 0, 0, 0, 1, 0, 0))
    assert(B.toBytes(new java.math.BigDecimal("1.0"), FloatType).get.toSeq ==
      Seq[Byte](0, 0, -128, 63)) // IEEE 1.0f = 0x3F800000 LE
    assert(B.toBytes("abc", StringType).get.toSeq == Seq[Byte](97, 98, 99))
    assert(B.toBytes(new java.math.BigDecimal("12.34"),
      DecimalType(9, 2)).get.toSeq == Seq[Byte](4, -46)) // unscaled 1234 BE
    val types: Seq[(Any, DataType)] = Seq(
      (new java.math.BigDecimal(-7), IntegerType),
      (new java.math.BigDecimal(Long.MaxValue), LongType),
      (new java.math.BigDecimal("3.25"), DoubleType),
      (new java.math.BigDecimal("-0.5"), FloatType),
      ("héllo", StringType),
      (true, BooleanType),
      (DeltaStats.Days(19723L), DateType),
      (DeltaStats.Micros(1700000000123456L), TimestampNTZType),
      (new java.math.BigDecimal("-987.654"), DecimalType(12, 3)))
    types.foreach { case (v, dt) =>
      val rt = B.fromBytes(B.toBytes(v, dt).get, dt).get
      assert(rt == v, s"$dt round trip: $v -> $rt")
    }
  }

  test("bounds-based file skipping prunes manifest entries; answers stay exact") {
    val t = tmp("skip.iceberg")
    import spark.implicits._
    val df = spark.range(0, 400).select(
      col("id"), concat(lit("s"), lpad(col("id").cast("string"), 4, "0")).as("s"),
      when(col("id") % 10 === 0, lit(null)).otherwise(col("id") * 0.5).as("v"))
      .repartitionByRange(4, col("id"))
    Iceberg.toIceberg(df, t)
    val all = Iceberg.fromIceberg(spark, t)
    assert(all.inputFiles.length == 4)
    val one = Iceberg.fromIceberg(spark, t, None, Some(col("id") === 250))
    assert(one.inputFiles.length == 1)
    assert(one.collect().map(_.getLong(0)).toSeq == Seq(250L))
    val pre = Iceberg.fromIceberg(spark, t, None, Some(col("s") >= "s0350"))
    assert(pre.inputFiles.length <= 2 && pre.count() == 50)
    // null-count entries drive IsNull pruning too
    val nn = Iceberg.fromIceberg(spark, t, None, Some(col("v").isNull && col("id") < 100))
    assert(nn.inputFiles.length == 1 && nn.count() == 10)
    // the foreign v1 table has NO bounds: conservative, still exact
    // (covered by the foreign test reading through fromIceberg)
  }

  test("expireSnapshots reclaims only expired-exclusive files; shared manifests survive") {
    val t = tmp("exp.iceberg")
    import spark.implicits._
    Iceberg.toIceberg(Seq((1L, "a")).toDF("id", "s"), t)                  // snap A
    Iceberg.toIceberg(Seq((2L, "b")).toDF("id", "s"), t, mode = "append") // B (re-lists A's manifest)
    Iceberg.toIceberg(Seq((9L, "z")).toDF("id", "s"), t, mode = "overwrite") // C
    Iceberg.toIceberg(Seq((10L, "y")).toDF("id", "s"), t, mode = "append")  // D
    val snaps = Iceberg.snapshots(spark, t).orderBy("sequence_number")
      .collect().map(_.getAs[Long]("snapshot_id"))
    // dry run deletes nothing
    val dry = Iceberg.expireSnapshots(spark, t, retainLast = 2)
    assert(dry.nonEmpty)
    assert(Iceberg.fromIceberg(spark, t, Some(snaps(0))).count() == 1)
    // expire A,B: their data files (id=1,2) are exclusive; C's file is
    // shared with retained D's manifest list and must survive
    val gone = Iceberg.expireSnapshots(spark, t, retainLast = 2, dryRun = false)
    assert(gone == dry)
    assert(gone.exists(_.endsWith(".avro")))    // lists/manifests reclaimed
    assert(gone.exists(_.contains("data/")))    // data files reclaimed
    val after = Iceberg.snapshots(spark, t).collect().map(_.getAs[Long]("snapshot_id"))
    assert(after.toSet == Set(snaps(2), snaps(3)))
    // retained snapshots read fully (C's file survived the sweep)
    assert(Iceberg.fromIceberg(spark, t).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(9L, 10L))
    assert(Iceberg.fromIceberg(spark, t, Some(snaps(2)))
      .collect().map(_.getLong(0)).toSeq == Seq(9L))
    // expired ids are gone from the log
    intercept[IllegalArgumentException] {
      Iceberg.fromIceberg(spark, t, Some(snaps(0)))
    }
  }

  test("Export/Readers dispatch .iceberg and the version-hint probe") {
    val t = tmp("d.iceberg")
    import spark.implicits._
    Export.export(Seq((5L, "q")).toDF("id", "s"), t)
    assert(Readers.open(spark, t).count() == 1L)
    // no .iceberg suffix: version-hint.text probe
    val plain = tmp("plainIce")
    Iceberg.toIceberg(Seq(Tuple1(4L)).toDF("id"), plain)
    assert(Readers.open(spark, plain).count() == 1L)
  }

  test("production deleteWhere: sorted sharded position deletes, composition, guards") {
    val t = tmp("pdel.iceberg")
    import spark.implicits._
    val df = spark.range(0, 200).select(
      col("id"), (col("id") % 7).as("m"), (col("id") % 5).as("k"))
      .repartitionByRange(4, col("id"))
    Iceberg.toIceberg(df, t)
    val files0 = Iceberg.fromIceberg(spark, t).inputFiles.toSet
    val sid = Iceberg.deleteWhere(spark, t, col("m") === 3)
    val back = Iceberg.fromIceberg(spark, t)
    assert(back.count() == 200 - 29)
    assert(back.filter(col("m") === 3).count() == 0)
    // merge-on-read: the DATA files are untouched
    assert(back.inputFiles.filter(files0).toSet == files0)
    // the delete parquet itself: (file_path, pos)-sorted, spec columns
    val delFiles = graft.sources.FsIO.listFilesRecursive(s"$t/data")
      .collect { case (p, _, _) if p.contains("/delete-") => p }
    assert(delFiles.nonEmpty)
    val del = spark.read.parquet(delFiles: _*)
    assert(del.columns.toSeq == Seq("file_path", "pos"))
    val delRows = spark.read.parquet(delFiles.head)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(delRows == delRows.sorted, "delete file not (file_path, pos) sorted")
    // repeated deletes COMPOSE
    Iceberg.deleteWhere(spark, t, col("k") === 2)
    val third = Iceberg.fromIceberg(spark, t)
    assert(third.filter(col("m") === 3 || col("k") === 2).count() == 0)
    assert(third.count() ==
      (0L until 200L).count(i => i % 7 != 3 && i % 5 != 2))
    // appends after the delete land untouched rows
    Iceberg.toIceberg(spark.range(1000, 1010).select(
      col("id"), (col("id") % 7).as("m"), (col("id") % 5).as("k")),
      t, mode = "append")
    val after = Iceberg.fromIceberg(spark, t)
    assert(after.filter(col("id") >= 1000).count() == 10)
    assert(after.filter(col("id") >= 1000 && col("m") === 3).count() ==
      (1000L until 1010L).count(_ % 7 == 3)) // delete predates them
    // a no-match delete commits NOTHING
    val snapsBefore = Iceberg.snapshots(spark, t).count()
    val vSame = Iceberg.deleteWhere(spark, t, col("id") === -1L)
    assert(Iceberg.snapshots(spark, t).count() == snapsBefore)
    // equality deletes present: ours stacks on top (the dedicated
    // mixed-delete spec drills the sequencing; here just both apply)
    val te = tmp("pdeleq.iceberg")
    Iceberg.toIceberg(df, te)
    Iceberg.foreignEqualityDeletes(spark, te,
      Seq(Tuple1(3L)).toDF("m"), Seq("m"))
    Iceberg.deleteWhere(spark, te, col("k") === 1)
    assert(Iceberg.fromIceberg(spark, te).count() ==
      (0L until 200L).count(i => i % 7 != 3 && i % 5 != 1))
    // time travel to the pre-delete snapshot still sees all rows
    assert(Iceberg.fromIceberg(spark, t,
      snapshotId = Some(sid)).count() == 200 - 29)
  }

  test("fromIcebergChanges tails appended snapshots exactly-once") {
    val t = tmp("chg.iceberg")
    import spark.implicits._
    Iceberg.toIceberg(Seq((1L, "a")).toDF("id", "s"), t)                  // seq 1 (initial overwrite)
    Iceberg.toIceberg(Seq((2L, "b")).toDF("id", "s"), t, mode = "append") // seq 2
    Iceberg.toIceberg(Seq((3L, "c")).toDF("id", "s"), t, mode = "append") // seq 3
    val ids = Iceberg.snapshots(spark, t).orderBy("sequence_number")
      .collect().map(_.getLong(0)).toSeq
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.select("id", "_sequence_number").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val all = Iceberg.fromIcebergChanges(spark, t)
    assert(rows(all) == Seq((1L, 1L), (2L, 2L), (3L, 3L)))
    // the _snapshot_id column carries the real snapshot ids
    assert(all.select("_snapshot_id").distinct().collect()
      .map(_.getLong(0)).toSet == ids.toSet)
    // two half-open pulls == one big pull (exactly-once composition)
    assert((rows(Iceberg.fromIcebergChanges(spark, t, -1L, Some(ids(1)))) ++
      rows(Iceberg.fromIcebergChanges(spark, t, ids(1)))) == rows(all))
    // caught up: from the current snapshot -> empty
    assert(Iceberg.fromIcebergChanges(spark, t, ids(2)).count() == 0)
    // the sequence-number face (the streaming tail's clock)
    assert(rows(Iceberg.fromIcebergChangesBySeq(spark, t, 1L)) ==
      Seq((2L, 2L), (3L, 3L)))
    assert(rows(Iceberg.fromIcebergChangesBySeq(spark, t, 0L, Some(2L))) ==
      Seq((1L, 1L), (2L, 2L)))
  }

  test("fromIcebergChanges rejects non-append snapshots and expired chains") {
    val t = tmp("chgow.iceberg")
    import spark.implicits._
    Iceberg.toIceberg(Seq((1L, "a")).toDF("id", "s"), t)
    Iceberg.toIceberg(Seq((2L, "b")).toDF("id", "s"), t, mode = "append")
    val beforeOw = Iceberg.snapshots(spark, t).orderBy("sequence_number")
      .collect().map(_.getLong(0)).toSeq
    Iceberg.toIceberg(Seq((9L, "z")).toDF("id", "s"), t, mode = "overwrite")
    // an overwrite WITH a parent rewrites history — not append-only
    val e1 = intercept[IllegalArgumentException](
      Iceberg.fromIcebergChanges(spark, t, beforeOw(1)).collect())
    assert(e1.getMessage.contains("not append-only"))
    // a range that ends BEFORE the overwrite still tails fine
    assert(Iceberg.fromIcebergChanges(spark, t, -1L, Some(beforeOw(1)))
      .count() == 2)
    // MoR delete snapshots reject too
    val td = tmp("chgdel.iceberg")
    val df = spark.range(0, 40).select(col("id"), (col("id") % 4).as("m"))
    Iceberg.toIceberg(df, td)
    Iceberg.foreignPositionDeletes(spark, td, col("m") === 1)
    val e2 = intercept[IllegalArgumentException](
      Iceberg.fromIcebergChanges(spark, td).collect())
    assert(e2.getMessage.contains("not append-only") ||
      e2.getMessage.contains("'delete'"))
    // a history WITHOUT parent-snapshot-id links (pre-r16 graft /
    // foreign writers) must reject, never silently deliver only the
    // newest snapshot's rows
    val tl = tmp("chgleg.iceberg")
    Iceberg.toIceberg(Seq((1L, "a")).toDF("id", "s"), tl)
    Iceberg.toIceberg(Seq((2L, "b")).toDF("id", "s"), tl, mode = "append")
    val mdir = s"$tl/metadata"
    val mfile = graft.sources.FsIO.listFileNames(mdir)
      .filter(_.endsWith(".metadata.json")).max
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val mj = mapper.readTree(readAll(s"$mdir/$mfile"))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val snapsN = mj.get("snapshots")
    (0 until snapsN.size()).foreach(i =>
      snapsN.get(i).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        .remove("parent-snapshot-id"))
    writeText(s"$mdir/$mfile", mapper.writeValueAsString(mj))
    val eL = intercept[IllegalArgumentException](
      Iceberg.fromIcebergChanges(spark, tl).collect())
    assert(eL.getMessage.contains("OFF the parent chain"))
    // expired mid-chain ancestors are loud, never a silent partial tail
    val te = tmp("chgexp.iceberg")
    Iceberg.toIceberg(Seq((1L, "a")).toDF("id", "s"), te)
    Iceberg.toIceberg(Seq((2L, "b")).toDF("id", "s"), te, mode = "append")
    Iceberg.toIceberg(Seq((3L, "c")).toDF("id", "s"), te, mode = "append")
    Iceberg.expireSnapshots(spark, te, retainLast = 1, dryRun = false)
    val e3 = intercept[IllegalArgumentException](
      Iceberg.fromIcebergChanges(spark, te).collect())
    assert(e3.getMessage.contains("expired"))
  }

  test("bucket hash matches the Iceberg spec's Appendix B vectors") {
    import graft.sources.IcebergTransforms._
    // published single-value hash vectors (iceberg.apache.org/spec)
    assert(hashLong(34L) == 2017239379)           // int + long 34
    assert(hashLong(17486L) == -653330422)        // date 2017-11-16
    assert(hashLong(1510871468000000L) == -2047944441) // ts 2017-11-16T22:31:08
    val b = "iceberg".getBytes(StandardCharsets.UTF_8)
    assert(hashBytes(b, 0, b.length) == 1210000089)
    // bucket = (hash & Int.MaxValue) % N
    assert(bucketLong(34L, 16) == (2017239379 & Int.MaxValue) % 16)
    // temporal fields on the UTC instant: 2017-11-16T22:31:08Z
    val m = 1510871468000000L
    assert(microsField(m, 2) == 17486)            // day
    assert(microsField(m, 3) == 17486 * 24 + 22)  // hour
    assert(microsField(m, 0) == 47)               // year: 2017 - 1970
    assert(microsField(m, 1) == 47 * 12 + 10)     // month: nov 2017
    // pre-epoch floors toward -inf, not toward zero
    assert(microsField(-1L, 2) == -1 && microsField(-1L, 3) == -1)
  }

  test("bucket-partitioned toIceberg: write, append, prune, deleteWhere") {
    import spark.implicits._
    val root = tmp("bucket.iceberg")
    val df = spark.range(0, 200).select(col("id"),
      concat(lit("v"), col("id")).as("s"))
    Iceberg.toIceberg(df, root, partitionBy = Seq("bucket(4, id)"))
    val back = Iceberg.fromIceberg(spark, root)
    assert(back.count() == 200)
    assert(back.columns.toSeq == Seq("id", "s"))
    // data dirs carry the bucket ordinal; every file's dir index
    // matches the spec hash of the ids inside it
    val files = back.inputFiles
    assert(files.forall(_.contains("id_bucket=")))
    files.take(2).foreach { f =>
      val bIdx = f.split("id_bucket=")(1).split("/")(0).toInt
      val ids = spark.read.parquet(f).select("id").as[Long].collect()
      assert(ids.nonEmpty && ids.forall(id =>
        graft.sources.IcebergTransforms.bucketLong(id, 4) == bIdx))
    }
    // the metadata json declares bucket[4]
    val metaFile = FsIO.listFileNames(s"$root/metadata")
      .filter(_.endsWith(".metadata.json")).max
    val mjc = readAll(s"$root/metadata/$metaFile").replaceAll("\\s", "")
    assert(mjc.contains("\"transform\":\"bucket[4]\"") &&
      mjc.contains("\"name\":\"id_bucket\""))
    // append validates by (transform, source) and keeps the spec
    Iceberg.toIceberg(df.withColumn("id", col("id") + 1000), root,
      "append", partitionBy = Seq("bucket(4, id)"))
    assert(Iceberg.fromIceberg(spark, root).count() == 400)
    val e = intercept[IllegalArgumentException](Iceberg.toIceberg(
      df, root, "append", partitionBy = Seq("bucket(8, id)")))
    assert(e.getMessage.contains("default spec"))
    // MoR delete on the bucket-partitioned table (tuples verbatim)
    Iceberg.deleteWhere(spark, root, col("id") % 10 === 7)
    val afterDel = Iceberg.fromIceberg(spark, root)
    assert(afterDel.count() == 400 - 40)
    assert(afterDel.filter(col("id") % 10 === 7).count() == 0)
    // string bucketing hits the bytes-hash path
    val rootS = tmp("bucketstr.iceberg")
    Iceberg.toIceberg(df, rootS, partitionBy = Seq("bucket(3, s)"))
    assert(Iceberg.fromIceberg(spark, rootS).count() == 200)
    assert(Iceberg.fromIceberg(spark, rootS).inputFiles
      .forall(_.contains("s_bucket=")))
  }

  test("day/hour-partitioned toIceberg evaluate on the UTC instant") {
    import spark.implicits._
    val root = tmp("day.iceberg")
    // session zone is NOT utc for this table's lifetime: the transform
    // must still count days/hours from the epoch in UTC
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val df = spark.range(0, 96).select(col("id"),
        (col("id") * 3600).cast("long").as("secs"))
        .select(col("id"),
          timestamp_seconds(col("secs") + 1704067200L).as("ts")) // 2024-01-01T00Z
      Iceberg.toIceberg(df, root, partitionBy = Seq("day(ts)"))
      val back = Iceberg.fromIceberg(spark, root)
      assert(back.count() == 96)
      // four UTC days of hourly rows -> four day dirs, date-rendered
      val days = back.inputFiles.map(_.split("ts_day=")(1).split("/")(0)).distinct.sorted
      assert(days.toSeq == Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"))
      val metaFile = FsIO.listFileNames(s"$root/metadata")
        .filter(_.endsWith(".metadata.json")).max
      val mjc = readAll(s"$root/metadata/$metaFile").replaceAll("\\s", "")
      assert(mjc.contains("\"transform\":\"day\"") &&
        mjc.contains("\"name\":\"ts_day\""))
      // hour partitioning: 96 hourly rows -> 96 hour ordinals
      val rootH = tmp("hour.iceberg")
      Iceberg.toIceberg(df, rootH, partitionBy = Seq("hour(ts)"))
      val hours = Iceberg.fromIceberg(spark, rootH).inputFiles
        .map(_.split("ts_hour=")(1).split("/")(0).toInt).distinct
      assert(hours.length == 96 && hours.min == 1704067200 / 3600)
      // appends with an empty partitionBy are loud (explicit spec)
      val e = intercept[IllegalArgumentException](
        Iceberg.toIceberg(df, root, "append"))
      assert(e.getMessage.contains("default spec"))
      Iceberg.toIceberg(df.withColumn("id", col("id") + 500), root,
        "append", partitionBy = Seq("day(ts)"))
      assert(Iceberg.fromIceberg(spark, root).count() == 192)
      // deletes on the day-partitioned table
      Iceberg.deleteWhere(spark, root, col("id") === 3L)
      assert(Iceberg.fromIceberg(spark, root).count() == 191)
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("truncate-partitioned toIceberg; empty-string partition value is loud") {
    import spark.implicits._
    val root = tmp("trunc.iceberg")
    val df = spark.range(0, 60).select(col("id"),
      concat(lit("grp"), (col("id") % 4)).as("name"),
      (col("id") - 30).cast("int").as("v"))
    Iceberg.toIceberg(df, root, partitionBy = Seq("truncate(3, name)"))
    val back = Iceberg.fromIceberg(spark, root)
    assert(back.count() == 60)
    // all four name values share the 3-char prefix "grp"
    val dirs = back.inputFiles.map(_.split("name_trunc=")(1).split("/")(0)).distinct
    assert(dirs.toSeq == Seq("grp"))
    val metaFile = FsIO.listFileNames(s"$root/metadata")
      .filter(_.endsWith(".metadata.json")).max
    assert(readAll(s"$root/metadata/$metaFile").replaceAll("\\s", "")
      .contains("\"transform\":\"truncate[3]\""))
    // int truncate floors toward -inf (negative values too)
    val rootI = tmp("trunci.iceberg")
    Iceberg.toIceberg(df, rootI, partitionBy = Seq("truncate(10, v)"))
    val ivals = Iceberg.fromIceberg(spark, rootI).inputFiles
      .map(_.split("v_trunc=")(1).split("/")(0).toInt).distinct.sorted
    assert(ivals.toSeq == Seq(-30, -20, -10, 0, 10, 20))
    // hive staging conflates '' with null: an empty-string partition
    // value must reject loudly instead of becoming a null tuple
    val eEmpty = intercept[IllegalArgumentException](Iceberg.toIceberg(
      spark.range(3).select(col("id"),
        when(col("id") === 1, lit("")).otherwise(lit("x")).as("s")),
      tmp("empty.iceberg"), partitionBy = Seq("s")))
    assert(eEmpty.getMessage.contains("empty-string"))
    // ...while genuine nulls keep round-tripping as null tuples
    val rootN = tmp("nulls.iceberg")
    Iceberg.toIceberg(spark.range(6).select(col("id"),
      when(col("id") % 2 === 0, lit(null)).otherwise(lit("x")).as("s")),
      rootN, partitionBy = Seq("truncate(1, s)"))
    assert(Iceberg.fromIceberg(spark, rootN)
      .filter(col("s").isNull).count() == 3)
  }

  test("append-time schema evolution: new nullable columns at fresh ids") {
    import spark.implicits._
    val t = tmp("evo.iceberg")
    Iceberg.toIceberg(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t)
    Iceberg.toIceberg(Seq((3L, "c", 30.5)).toDF("id", "s", "v"), t,
      mode = "append")
    val back = Iceberg.fromIceberg(spark, t)
    assert(back.columns.toSeq == Seq("id", "s", "v"))
    assert(back.count() == 3)
    // pre-evolution files read the new column as null
    assert(back.filter(col("v").isNull).count() == 2)
    assert(back.filter(col("id") === 3).select("v").as[Double].head() == 30.5)
    // a new schema entry at the next id; fresh field ids above the
    // old last-column-id
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def meta() = {
      val mfile = FsIO.listFileNames(s"$t/metadata")
        .filter(_.endsWith(".metadata.json")).max
      mapper.readTree(readAll(s"$t/metadata/$mfile"))
    }
    val m1 = meta()
    assert(m1.get("schemas").size() == 2)
    assert(m1.get("current-schema-id").asInt() == 1)
    assert(m1.get("last-column-id").asInt() == 3)
    // evolutions stack; plain appends after them carry the history
    Iceberg.toIceberg(Seq((4L, "d", 1.0, 7)).toDF("id", "s", "v", "k"), t,
      mode = "append")
    Iceberg.toIceberg(Seq((5L, "e", 2.0, 8)).toDF("id", "s", "v", "k"), t,
      mode = "append")
    val b2 = Iceberg.fromIceberg(spark, t)
    assert(b2.columns.toSeq == Seq("id", "s", "v", "k"))
    assert(b2.count() == 5 && b2.filter(col("k").isNull).count() == 3)
    val m2 = meta()
    assert(m2.get("schemas").size() == 3 &&
      m2.get("current-schema-id").asInt() == 2)
    // deletes work across the evolution boundary
    Iceberg.deleteWhere(spark, t, col("id") === 1L)
    assert(Iceberg.fromIceberg(spark, t).count() == 4)
    // overwrite with a narrower schema, reordered fields, and
    // case-colliding new names all stay loud
    intercept[IllegalArgumentException](Iceberg.toIceberg(
      Seq((9L, "z", 1.0)).toDF("id", "s", "v"), t))
    intercept[IllegalArgumentException](Iceberg.toIceberg(
      Seq((9L, 1.0, "z", 7, 1)).toDF("id", "v", "s", "k", "w"), t,
      mode = "append"))
    intercept[IllegalArgumentException](Iceberg.toIceberg(
      Seq((9L, "z", 1.0, 7, 5)).toDF("id", "s", "v", "k", "V"), t,
      mode = "append"))
  }

  test("fromIcebergChangelog: inserts, MoR deletes resolve to rows, overwrite replaces") {
    val t = tmp("chl.iceberg")
    import spark.implicits._
    Iceberg.toIceberg((0L until 20).map(i => (i, s"v$i")).toDF("id", "s")
      .coalesce(1), t)                                           // seq 1
    Iceberg.toIceberg((20L until 30).map(i => (i, s"v$i")).toDF("id", "s"),
      t, "append")                                               // seq 2
    Iceberg.deleteWhere(spark, t, col("id") % 7 === 3)           // seq 3
    // re-deleting already-masked rows plus ONE new row delivers only
    // the new row (the parent's masks exclude the rest)
    Iceberg.deleteWhere(spark, t,
      col("id") % 7 === 3 || col("id") === 5)                    // seq 4
    val chl = Iceberg.fromIcebergChangelog(spark, t)
    val bySeq = chl.groupBy("_sequence_number", "_change_type").count()
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    assert(bySeq((1L, "insert")) == 20)
    assert(bySeq((2L, "insert")) == 10)
    assert(bySeq((3L, "delete")) == 4) // ids 3, 10, 17, 24
    assert(bySeq((4L, "delete")) == 1)
    assert(chl.filter(col("_sequence_number") === 4)
      .select("id").as[Long].head() == 5L)
    assert(chl.filter(col("_sequence_number") === 3)
      .select("id").as[Long].collect().sorted.toSeq == Seq(3L, 10L, 17L, 24L))
    // overwrite = logical replace: parent's visible rows out, new in
    Iceberg.toIceberg(Seq((100L, "x")).toDF("id", "s"), t, "overwrite") // seq 5
    val v5 = Iceberg.fromIcebergChangelog(spark, t)
      .filter(col("_sequence_number") === 5)
    assert(v5.filter(col("_change_type") === "delete").count() == 25)
    assert(v5.filter(col("_change_type") === "insert").count() == 1)
    // ranges by snapshot id: from the seq-2 snapshot, only 3..5 deliver
    val id2 = Iceberg.snapshots(spark, t)
      .filter(col("sequence_number") === 2).select("snapshot_id")
      .as[Long].head()
    val part = Iceberg.fromIcebergChangelog(spark, t, id2)
    assert(part.select("_sequence_number").distinct().as[Long]
      .collect().sorted.toSeq == Seq(3L, 4L, 5L))
  }

  test("void transform (dropped partition field) accepts writes") {
    import spark.implicits._
    val root = tmp("void.iceberg")
    val df = spark.range(0, 30).select(col("id"),
      (col("id") % 3).cast("int").as("grp"))
    Iceberg.toIceberg(df, root, partitionBy = Seq("grp"))
    // a foreign v1 spec evolution DROPS grp: the slot stays as `void`
    val mdir = s"$root/metadata"
    val mfile = FsIO.listFileNames(mdir).filter(_.endsWith(".metadata.json")).max
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val mj = mapper.readTree(readAll(s"$mdir/$mfile"))
    mj.get("partition-specs").get(0).get("fields").get(0)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      .put("transform", "void")
    writeText(s"$mdir/$mfile", mapper.writeValueAsString(mj))
    Iceberg.toIceberg(df.withColumn("id", col("id") + 100), root,
      "append", partitionBy = Seq("void(grp)"))
    val back = Iceberg.fromIceberg(spark, root)
    assert(back.count() == 60)
    assert(back.filter(col("id") >= 100).count() == 30)
    // the appended files land under the null-tuple dir
    assert(back.inputFiles.exists(_.contains("__HIVE_DEFAULT_PARTITION__")))
    // deletes still work across the mixed identity/void-era files
    Iceberg.deleteWhere(spark, root, col("id") === 5L)
    assert(Iceberg.fromIceberg(spark, root).count() == 59)
  }

  test("spec field names stay independent of source columns on append") {
    import spark.implicits._
    val root = tmp("specname.iceberg")
    val df = spark.range(0, 40).select(col("id"),
      (col("id") % 2).cast("int").as("grp"))
    Iceberg.toIceberg(df, root, partitionBy = Seq("grp"))
    // a foreign writer may leave the spec's display name stale after
    // a column rename; source-id must still resolve the column
    val mdir = s"$root/metadata"
    val mfile = FsIO.listFileNames(mdir).filter(_.endsWith(".metadata.json")).max
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val mj = mapper.readTree(readAll(s"$mdir/$mfile"))
    mj.get("partition-specs").get(0).get("fields").get(0)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      .put("name", "grp_old_display")
    writeText(s"$mdir/$mfile", mapper.writeValueAsString(mj))
    Iceberg.toIceberg(df.withColumn("id", col("id") + 100), root,
      "append", partitionBy = Seq("grp"))
    assert(Iceberg.fromIceberg(spark, root).count() == 80)
    // new files landed under the SPEC's display name
    assert(Iceberg.fromIceberg(spark, root).inputFiles
      .exists(_.contains("grp_old_display=")))
  }
}
