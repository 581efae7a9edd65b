package graft

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{DeltaLake, Export, FsIO, Readers}

/** Dependency-free Delta Lake source/sink: transaction-log commits,
  * checkpoints, time travel, partition-value typing, protocol gating.
  * Independence: the protocol-gate and missing-version tests run over
  * HAND-WRITTEN log JSON (no graft writer on that path), and the
  * partitioned read is checked against values Spark itself computed
  * before export. */
class DeltaLakeSpec extends SparkSpec {

  private def tmp(leaf: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_delta").toString
    s"$d/$leaf"
  }

  private def writeLog(table: String, v: Long, lines: Seq[String]): Unit = {
    FsIO.mkdirs(s"$table/_delta_log")
    val out = FsIO.create(f"$table/_delta_log/$v%020d.json")
    try out.write((lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private def typedDf: DataFrame = {
    import spark.implicits._
    spark.range(0, 20).select(
      col("id"),
      (col("id") % 3).cast("int").as("i"),
      (col("id") * 1.5 - 4.0).as("d"),
      concat(lit("s"), col("id")).as("s"),
      (col("id") % 2 === 0).as("b"),
      date_add(lit(java.sql.Date.valueOf("2024-03-01")), col("id").cast("int")).as("dt"),
      to_timestamp(lit("2024-03-01 10:30:00")).cast("timestamp_ntz").as("ts"),
      col("id").cast("decimal(12,3)").as("dec"),
      array(col("id").cast("double"), lit(0.25)).as("arr"))
  }

  test("unpartitioned round trip preserves typed values") {
    val t = tmp("t.delta")
    val df = typedDf
    DeltaLake.toDelta(df, t)
    val back = DeltaLake.fromDelta(spark, t)
    assert(back.schema == df.schema ||
      back.schema.map(_.name) == df.schema.map(_.name))
    assert(back.orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
    // staging hygiene: promoted, then removed (the attempt-unique
    // subdir is gone; the shared parent may linger empty — deleting
    // it would race a concurrent writer's staging)
    assert(!FsIO.exists(s"$t/_staging") ||
      FsIO.listFilesRecursive(s"$t/_staging").isEmpty)
  }

  test("partitioned: values come from the log, typed; nasty strings survive") {
    val t = tmp("p.delta")
    import spark.implicits._
    // no non-ASCII here: the shared test JVM runs without a UTF-8
    // locale, so SPARK'S OWN staging write cannot create such file
    // names (sun.nio InvalidPathException) — hive-escaping is what's
    // under test and it is per-ASCII-special ('#','=',':','%',' ')
    val df = Seq(
      ("a b", 1L, 0.5), ("x=y:z", 2L, 1.5), ("pct%20lit", 3L, 2.5),
      ("ha#sh*q?", 4L, 3.5), (null.asInstanceOf[String], 5L, 4.5))
      .toDF("k", "n", "v")
    DeltaLake.toDelta(df, t, partitionBy = Seq("k"))
    val back = DeltaLake.fromDelta(spark, t)
    // partition column restored by NAME and TYPE, no Spark-inferred extras
    assert(back.columns.sorted.toSeq == Seq("k", "n", "v"))
    assert(back.schema("k").dataType == StringType)
    val got = back.orderBy("n").collect().toSeq.map(r =>
      (r.getAs[String]("k"), r.getAs[Long]("n"), r.getAs[Double]("v")))
    assert(got == Seq(("a b", 1L, 0.5), ("x=y:z", 2L, 1.5),
      ("pct%20lit", 3L, 2.5), ("ha#sh*q?", 4L, 3.5), (null, 5L, 4.5)))
  }

  test("typed partition columns: date and int filter-prunable") {
    val t = tmp("pd.delta")
    import spark.implicits._
    val df = Seq((java.sql.Date.valueOf("2024-01-01"), 1, 10L),
      (java.sql.Date.valueOf("2024-01-02"), 2, 20L))
      .toDF("day", "bucket", "x")
    DeltaLake.toDelta(df, t, partitionBy = Seq("day", "bucket"))
    val back = DeltaLake.fromDelta(spark, t)
    assert(back.schema("day").dataType == DateType)
    assert(back.schema("bucket").dataType == IntegerType)
    val one = back.filter(col("day") === "2024-01-02").collect()
    assert(one.map(_.getAs[Long]("x")).toSeq == Seq(20L))
  }

  test("append accumulates; overwrite logically replaces; time travel sees each") {
    val t = tmp("tt.delta")
    import spark.implicits._
    DeltaLake.toDelta(Seq((1L, "a")).toDF("id", "s"), t)                    // v0
    DeltaLake.toDelta(Seq((2L, "b")).toDF("id", "s"), t, mode = "append")   // v1
    DeltaLake.toDelta(Seq((3L, "c")).toDF("id", "s"), t, mode = "overwrite") // v2
    def ids(v: Option[Long]) =
      DeltaLake.fromDelta(spark, t, v).select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(Some(0)) == Seq(1L))
    assert(ids(Some(1)) == Seq(1L, 2L))
    assert(ids(Some(2)) == Seq(3L))
    assert(ids(None) == Seq(3L))
    intercept[IllegalArgumentException] { ids(Some(3)) }
    val h = DeltaLake.history(spark, t).orderBy("version").collect()
    assert(h.map(_.getAs[Long]("version")).toSeq == Seq(0L, 1L, 2L))
    assert(h.map(_.getAs[String]("operation")).forall(_ == "WRITE"))
    assert(h(2).getAs[Long]("num_removed_files") >= 1L)
  }

  test("schema / partitioning mismatches are loud") {
    val t = tmp("mm.delta")
    import spark.implicits._
    DeltaLake.toDelta(Seq((1L, "a")).toDF("id", "s"), t)
    val e1 = intercept[IllegalArgumentException] {
      DeltaLake.toDelta(Seq((1L, 2.0)).toDF("id", "s"), t, mode = "append")
    }
    assert(e1.getMessage.contains("schema mismatch"))
    val e2 = intercept[IllegalArgumentException] {
      DeltaLake.toDelta(Seq((1L, "a")).toDF("id", "s"), t,
        mode = "append", partitionBy = Seq("s"))
    }
    assert(e2.getMessage.contains("partitionBy"))
  }

  test("checkpoint compacts state; reads resolve from checkpoint + json tail") {
    val t = tmp("cp.delta")
    import spark.implicits._
    (0 to 5).foreach { i =>
      DeltaLake.toDelta(Seq((i.toLong, s"r$i")).toDF("id", "s"), t,
        mode = if (i == 0) "overwrite" else "append", checkpointInterval = 2)
    }
    // checkpoints at v2 and v4 (+ the pointer file)
    assert(FsIO.exists(f"$t/_delta_log/${2L}%020d.checkpoint.parquet"))
    assert(FsIO.exists(f"$t/_delta_log/${4L}%020d.checkpoint.parquet"))
    assert(FsIO.exists(s"$t/_delta_log/_last_checkpoint"))
    def ids(v: Long) = DeltaLake.fromDelta(spark, t, Some(v))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(2) == Seq(0L, 1L, 2L))   // exactly at a checkpoint
    assert(ids(3) == Seq(0L, 1L, 2L, 3L)) // checkpoint + one json
    assert(ids(5) == (0L to 5L))
    // checkpoint-only resolution: delete the compacted json commits —
    // versions <= 4 must still resolve through the checkpoint
    (0L to 4L).foreach(v => FsIO.deleteRecursive(f"$t/_delta_log/$v%020d.json"))
    assert(ids(5) == (0L to 5L))
    assert(ids(4) == (0L to 4L))
    // but a version BEFORE the earliest surviving checkpoint is gone
    val e = intercept[IllegalArgumentException] { ids(1) }
    assert(e.getMessage.contains("missing commit versions"))
  }

  test("protocol gate: reader v2 and unsupported v3 features reject; timestampNtz passes") {
    import spark.implicits._
    val schemaJson = new StructType().add("id", LongType).json
    def mk(protocol: String): String = {
      val t = tmp("gate.delta")
      // a real data file so only the protocol can fail the read
      DeltaLake.toDelta(Seq(Tuple1(1L)).toDF("id"), t)
      writeLog(t, 1L, Seq(protocol))
      t
    }
    // reader v2 (column-mapping era) and the columnMapping /
    // deletionVectors v3 features are SUPPORTED since r15 — a bare
    // protocol bump alone must not fail the read
    assert(DeltaLake.fromDelta(spark, mk(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}"""))
      .count() == 1L)
    assert(DeltaLake.fromDelta(spark, mk(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors","columnMapping"]}}"""))
      .count() == 1L)
    // v2Checkpoint reads are supported since r16; typeWidening since
    // r18 (narrow files promote inside the parquet readers); an
    // unknown future feature still rejects loudly
    assert(DeltaLake.fromDelta(spark, mk(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["v2Checkpoint"]}}"""))
      .count() == 1L)
    assert(DeltaLake.fromDelta(spark, mk(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["typeWidening"]}}"""))
      .count() == 1L)
    val e3 = intercept[IllegalArgumentException] {
      DeltaLake.fromDelta(spark, mk(
        """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
          """"readerFeatures":["futureMagicEncoding"]}}"""))
    }
    assert(e3.getMessage.contains("futureMagicEncoding"))
    val ok = mk(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["timestampNtz"]}}""")
    assert(DeltaLake.fromDelta(spark, ok).count() == 1L)
    // a column mapping mode outside none/name/id stays loud
    val cm = tmp("cm.delta")
    writeLog(cm, 0L, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},"schemaString":${com.fasterxml.jackson.databind.node.JsonNodeFactory.instance.textNode(schemaJson).toString},"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"weird"},"createdTime":0}}"""))
    val e4 = intercept[IllegalArgumentException] { DeltaLake.fromDelta(spark, cm) }
    assert(e4.getMessage.contains("columnMapping.mode=weird"))
  }

  test("malformed deletion vectors are loud; multi-part checkpoints reject") {
    import spark.implicits._
    val t = tmp("dv.delta")
    DeltaLake.toDelta(Seq(Tuple1(1L)).toDF("id"), t)
    // a structurally bogus DV descriptor (u-storage path too short to
    // carry a z85 uuid) must fail the read LOUDLY at DV load — never
    // silently scan the file unmasked
    writeLog(t, 1L, Seq(
      """{"add":{"path":"x.parquet","partitionValues":{},"size":1,""" +
        """"modificationTime":0,"dataChange":true,"deletionVector":""" +
        """{"storageType":"u","pathOrInlineDv":"a","offset":1,"sizeInBytes":1,"cardinality":1}}}"""))
    val e = intercept[IllegalArgumentException] { DeltaLake.fromDelta(spark, t) }
    assert(e.getMessage.contains("too short"))
    // unknown storage type is loud too (v2 swaps the bogus add out)
    writeLog(t, 2L, Seq(
      """{"remove":{"path":"x.parquet","deletionTimestamp":0,"dataChange":true}}""",
      """{"add":{"path":"y.parquet","partitionValues":{},"size":1,""" +
        """"modificationTime":0,"dataChange":true,"deletionVector":""" +
        """{"storageType":"z","pathOrInlineDv":"a","offset":0,"sizeInBytes":1,"cardinality":1}}}"""))
    val ez = intercept[IllegalArgumentException] { DeltaLake.fromDelta(spark, t) }
    assert(ez.getMessage.contains("storageType"))
    // an INCOMPLETE multi-part part set (part 0 of 2 — parts number
    // from 1) is never a candidate: with the json commits gone the
    // read fails loudly instead of serving partial state
    val m = tmp("mp.delta")
    DeltaLake.toDelta(Seq(Tuple1(1L)).toDF("id"), m)
    DeltaLake.toDelta(Seq(Tuple1(2L)).toDF("id"), m, mode = "append")
    val log = s"$m/_delta_log"
    val part = f"$log/${1L}%020d.checkpoint.${0}%010d.${2}%010d.parquet"
    val out = FsIO.create(part); out.close()
    FsIO.deleteRecursive(f"$log/${0L}%020d.json")
    FsIO.deleteRecursive(f"$log/${1L}%020d.json")
    val e5 = intercept[IllegalArgumentException] {
      DeltaLake.fromDelta(spark, m)
    }
    assert(e5.getMessage.contains("missing commit versions"))
  }

  test("empty append commits zero adds and stays readable; empty snapshot has schema") {
    val t = tmp("e.delta")
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "s")
    DeltaLake.toDelta(df, t)
    DeltaLake.toDelta(df.limit(0), t, mode = "append")
    assert(DeltaLake.fromDelta(spark, t).count() == 1L)
    // overwrite WITH empty -> empty snapshot, schema intact
    DeltaLake.toDelta(df.limit(0), t, mode = "overwrite")
    val empty = DeltaLake.fromDelta(spark, t)
    assert(empty.count() == 0L)
    assert(empty.columns.toSeq == Seq("id", "s"))
    // and the data is still one version back
    assert(DeltaLake.fromDelta(spark, t, Some(1L)).count() == 1L)
  }

  test("add actions carry footer stats: numRecords, typed min/max, nullCount") {
    val t = tmp("st.delta")
    import spark.implicits._
    val df = spark.range(0, 50).select(
      col("id"),
      when(col("id") % 10 === 0, lit(null)).otherwise(col("id") * 0.5).as("d"),
      concat(lit("k"), lpad(col("id").cast("string"), 3, "0")).as("s"),
      date_add(lit(java.sql.Date.valueOf("2024-01-01")), col("id").cast("int")).as("dt"),
      to_timestamp(lit("2024-01-01 06:00:00")).cast("timestamp_ntz").as("ts"),
      rpad(lit("x"), 100, "y").as("long_s")) // > 64 chars: bounds omitted
      .coalesce(1)
    DeltaLake.toDelta(df, t)
    val commit = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(f"$t/_delta_log/${0L}%020d.json")),
      StandardCharsets.UTF_8)
    val addLine = commit.split("\n").find(_.contains("\"add\"")).get
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val stats = mapper.readTree(
      mapper.readTree(addLine).get("add").get("stats").asText())
    assert(stats.get("numRecords").asLong() == 50L)
    assert(stats.get("minValues").get("id").asLong() == 0L)
    assert(stats.get("maxValues").get("id").asLong() == 49L)
    assert(stats.get("minValues").get("s").asText() == "k000")
    assert(stats.get("maxValues").get("s").asText() == "k049")
    assert(stats.get("minValues").get("dt").asText() == "2024-01-01")
    assert(stats.get("minValues").get("ts").asText().startsWith("2024-01-01T06:00:00"))
    assert(stats.get("nullCount").get("d").asLong() == 5L)
    assert(stats.get("nullCount").get("s").asLong() == 0L)
    // >64-char strings: bounds omitted (truncation would break max)
    assert(stats.get("minValues").get("long_s") == null)
  }

  test("stats-based file skipping prunes scan files; answers stay exact") {
    val t = tmp("skip.delta")
    import spark.implicits._
    val df = spark.range(0, 400).select(
      col("id"), (col("id") % 7).cast("double").as("v"),
      concat(lit("u"), lpad(col("id").cast("string"), 4, "0")).as("s"))
      .repartitionByRange(4, col("id")) // 4 files, disjoint id ranges
    DeltaLake.toDelta(df, t)
    val all = DeltaLake.fromDelta(spark, t)
    assert(all.inputFiles.length == 4)
    // point lookup: one surviving file
    val one = DeltaLake.fromDelta(spark, t, None, Some(col("id") === 250))
    assert(one.inputFiles.length == 1)
    assert(one.collect().map(_.getAs[Long]("id")).toSeq == Seq(250L))
    // range: two files
    val range = DeltaLake.fromDelta(spark, t, None,
      Some(col("id") >= 90 && col("id") < 210)) // spans 3 of 4 range files
    assert(range.inputFiles.length == 3)
    assert(range.count() == 120)
    // string prefix bound
    val pre = DeltaLake.fromDelta(spark, t, None, Some(col("s").startsWith("u039")))
    assert(pre.inputFiles.length == 1 && pre.count() == 10)
    // unsupported predicate shape: conservative (all files), still exact
    val weird = DeltaLake.fromDelta(spark, t, None,
      Some(length(col("s")) === lit(5) && col("id") < 100))
    assert(weird.inputFiles.length == 1) // the And's supported leg prunes
    assert(weird.count() == 100)
    // parity with post-filter on a column with no usable stats
    val v = DeltaLake.fromDelta(spark, t, None, Some(col("v") === 3.0))
    assert(v.count() == all.filter(col("v") === 3.0).count())
  }

  test("mightMatch bounds logic on synthetic stats") {
    val schema = new StructType().add("x", LongType).add("s", StringType)
      .add("day", DateType)
    val stats =
      """{"numRecords":10,"minValues":{"x":100,"s":"mango","day":"2024-03-10"},
        |"maxValues":{"x":200,"s":"peach","day":"2024-03-20"},
        |"nullCount":{"x":0,"s":10}}""".stripMargin.replace("\n", "")
    def m(c: org.apache.spark.sql.Column, pv: Map[String, String] = Map.empty,
        parts: Seq[String] = Nil) =
      graft.sources.DeltaStats.mightMatch(
        graft.sources.DeltaLake.resolvePredicate(spark, schema, c),
        schema, parts, pv, stats)
    assert(m(col("x") === 150) && !m(col("x") === 99) && !m(col("x") === 201))
    assert(m(col("x") > 199) && !m(col("x") > 200) && m(col("x") >= 200))
    assert(m(col("x") < 101) && !m(col("x") < 100) && m(col("x") <= 100))
    assert(m(lit(150) > col("x")) && !m(lit(100) > col("x"))) // reversed operands
    assert(m(col("x").isin(1, 2, 150)) && !m(col("x").isin(1, 2, 99)))
    assert(!m(col("x").isNull) && m(col("x").isNotNull))
    assert(m(col("s").isNull) && !m(col("s").isNotNull)) // all-null column
    assert(!m(col("s") === "nnn")) // allNull kills comparisons too
    assert(m(col("day") === "2024-03-15") && !m(col("day") === "2024-03-01"))
    assert(m(col("day") === java.sql.Date.valueOf("2024-03-10")))
    // Or keeps the file when either leg might; And prunes on one leg
    assert(m(col("x") === 99 || col("x") === 150))
    assert(!m(col("x") === 99 && col("x") === 150))
    // unsupported -> conservative
    assert(m(abs(col("x")) === 5))
    assert(m(col("x") === Double.NaN))
    // partition values: exact bounds; null partition value
    val parts = Seq("p")
    val pSchema = schema.add("p", StringType)
    def mp(c: org.apache.spark.sql.Column, v: String) =
      graft.sources.DeltaStats.mightMatch(
        graft.sources.DeltaLake.resolvePredicate(spark, pSchema, c),
        pSchema, parts, Map("p" -> v), stats)
    assert(mp(col("p") === "A", "A") && !mp(col("p") === "B", "A"))
    assert(!mp(col("p").isNotNull, null) && mp(col("p").isNull, null))
  }

  test("string bounds compare in UTF-8 byte order, not UTF-16") {
    // U+FFFF encodes EF BF BF; U+1F600 encodes F0 9F 98 80 — byte
    // order puts the supplementary char ABOVE, UTF-16 puts its
    // surrogate (0xD83D) BELOW. Wrong order here silently skips a
    // file whose rows match.
    val smiley = new String(Character.toChars(0x1F600))
    assert(graft.sources.DeltaStats.cmpUtf8("\uFFFF", smiley) < 0)
    assert("\uFFFF".compareTo(smiley) > 0) // the trap being avoided
    val schema = new StructType().add("s", StringType)
    val stats = s"""{"numRecords":2,"minValues":{"s":"a"},
      |"maxValues":{"s":"$smiley"},"nullCount":{"s":0}}"""
      .stripMargin.replace("\n", "")
    val pred = DeltaLake.resolvePredicate(spark, schema, col("s") === "\uFFFF")
    assert(graft.sources.DeltaStats.mightMatch(pred, schema, Nil, Map.empty, stats))
  }

  test("StartsWith skipping compares in UTF-8 byte order with byte-length cuts") {
    val smiley = new String(Character.toChars(0x1F600)) // F0 9F 98 80
    val schema = new StructType().add("s", StringType)
    def stats(min: String, max: String) =
      s"""{"numRecords":2,"minValues":{"s":"$min"},
        |"maxValues":{"s":"$max"},"nullCount":{"s":0}}"""
        .stripMargin.replace("\n", "")
    def m(min: String, max: String, prefix: String) =
      graft.sources.DeltaStats.mightMatch(
        DeltaLake.resolvePredicate(spark, schema,
          col("s").startsWith(prefix)),
        schema, Nil, Map.empty, stats(min, max))
    // U+FFFF prefix vs an emoji max: prefix <= max in UTF-8 (EF < F0)
    // but NOT in UTF-16 (FFFF > D83D) \u2014 a UTF-16 compare would skip a
    // file whose rows (e.g. "\uFFFFx") match, silently losing rows.
    assert(m("a", smiley + "x", "\uFFFF"))
    // min-side cut at UTF-8 BYTE length: min = emoji (4 bytes) cut to
    // the prefix's 3 bytes is F0 9F 98 > EF BF BF -> every row is
    // above the prefix region -> correct skip. (A UTF-16 take(1)
    // would compare a lone high surrogate instead.)
    assert(!m(smiley, smiley + "x", "\uFFFF"))
    // plain ASCII sanity both ways
    assert(m("mango", "peach", "pe") && !m("mango", "peach", "z") &&
      !m("mango", "peach", "a"))
    // prefix exactly the max: still a candidate
    assert(m("mango", "peach", "peach"))
  }

  test("infinite doubles: write survives, bounds omitted, skipping conservative") {
    val t = tmp("inf.delta")
    import spark.implicits._
    val df = Seq(1.0, Double.PositiveInfinity, Double.NegativeInfinity, 4.0)
      .toDF("v").coalesce(1)
    DeltaLake.toDelta(df, t) // must not throw on Infinity footer stats
    val commit = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(f"$t/_delta_log/${0L}%020d.json")),
      StandardCharsets.UTF_8)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val stats = mapper.readTree(mapper.readTree(
      commit.split("\n").find(_.contains("\"add\"")).get)
      .get("add").get("stats").asText())
    assert(stats.get("numRecords").asLong() == 4L)
    assert(stats.get("minValues").get("v") == null) // inf disqualifies bounds
    val read = DeltaLake.fromDelta(spark, t, None, Some(col("v") === 4.0))
    assert(read.inputFiles.length == 1) // conservative: kept, not skipped
    assert(read.collect().map(_.getDouble(0)).toSeq == Seq(4.0))
  }

  test("file: scheme and relative table paths normalize (staging promote works)") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val t1 = "file://" + tmp("scheme.delta")
    DeltaLake.toDelta(df, t1)
    assert(DeltaLake.fromDelta(spark, t1).count() == 2)
    val rel = "target/tmp_delta_rel.delta" // relative to the CWD
    FsIO.deleteRecursive(rel)
    try {
      DeltaLake.toDelta(df, rel)
      assert(DeltaLake.fromDelta(spark, rel).count() == 2)
    } finally FsIO.deleteRecursive(rel)
  }

  test("checkpoints carry the real protocol (features, writer version)") {
    val t = tmp("proto.delta")
    import spark.implicits._
    DeltaLake.toDelta(Seq(Tuple1(1L)).toDF("id"), t)
    // upgrade the table's protocol by hand (v3 reader + timestampNtz,
    // v7 writer + a writer feature)
    writeLog(t, 1L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["timestampNtz"],"writerFeatures":["appendOnly"]}}"""))
    DeltaLake.toDelta(Seq(Tuple1(2L)).toDF("id"), t,
      mode = "append", checkpointInterval = 2) // v2 -> checkpoint
    val cp = spark.read.parquet(f"$t/_delta_log/${2L}%020d.checkpoint.parquet")
    val proto = cp.filter(col("protocol").isNotNull)
      .select("protocol.*").head
    assert(proto.getAs[Int]("minReaderVersion") == 3)
    assert(proto.getAs[Int]("minWriterVersion") == 7)
    assert(proto.getSeq[String](proto.fieldIndex("readerFeatures")) == Seq("timestampNtz"))
    assert(proto.getSeq[String](proto.fieldIndex("writerFeatures")) == Seq("appendOnly"))
    // and the checkpoint-resolved read still gates + answers correctly
    FsIO.deleteRecursive(f"$t/_delta_log/${0L}%020d.json")
    FsIO.deleteRecursive(f"$t/_delta_log/${1L}%020d.json")
    assert(DeltaLake.fromDelta(spark, t).count() == 2)
  }

  test("timestamp partition skipping honors the session timezone flavor") {
    val schema = new StructType().add("x", LongType)
      .add("ts", TimestampType)
    val pred = DeltaLake.resolvePredicate(spark, schema,
      col("ts") === to_timestamp(lit("2024-01-01 10:00:00")))
    def m(tz: String) = graft.sources.DeltaStats.mightMatch(
      pred, schema, Seq("ts"), Map("ts" -> "2024-01-01 10:00:00"), null, tz)
    // session is UTC: literal micros == partition wall-time-as-UTC
    assert(m("UTC"))
    // under a non-UTC session the partition string means a DIFFERENT
    // instant; the evaluator must not match the UTC reading
    assert(!m("America/Los_Angeles"))
  }

  test("compact merges small files (dataChange=false); zorder tightens bounds; vacuum reclaims") {
    val t = tmp("opt.delta")
    import spark.implicits._
    // 6 small appends -> 6 files; two predicate columns with
    // ANTI-correlated layout so plain concatenation can't prune both
    (0 until 6).foreach { i =>
      val df = spark.range(i * 100, i * 100 + 100).select(
        col("id"), (lit(599) - col("id")).as("rid"),
        (col("id") % 9).cast("double").as("v")).coalesce(1)
      DeltaLake.toDelta(df, t, mode = if (i == 0) "overwrite" else "append")
    }
    assert(DeltaLake.fromDelta(spark, t).inputFiles.length == 6)
    val v = DeltaLake.compact(spark, t, targetFileBytes = 4L << 10,
      zorderBy = Seq("id", "rid"))
    assert(v == 6L)
    val after = DeltaLake.fromDelta(spark, t)
    assert(after.inputFiles.length < 6) // ~4KB target merges the tiny files
    // data invariance
    assert(after.count() == 600 &&
      after.agg(sum("id")).head.getLong(0) == (0L until 600L).sum)
    // the rewrite is dataChange=false on BOTH action kinds
    val commit = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(f"$t/_delta_log/${6L}%020d.json")),
      StandardCharsets.UTF_8)
    assert(commit.contains("\"operation\":\"OPTIMIZE\""))
    assert(!commit.split("\n").filter(l =>
      l.contains("\"add\"") || l.contains("\"remove\""))
      .exists(_.contains("\"dataChange\":true")))
    // skipping works on BOTH z-order columns over the new stats
    val total = after.inputFiles.length
    assert(DeltaLake.fromDelta(spark, t, None, Some(col("id") === 5))
      .inputFiles.length < total)
    assert(DeltaLake.fromDelta(spark, t, None, Some(col("rid") === 5))
      .inputFiles.length < total)
    // time travel still sees the pre-compaction version...
    assert(DeltaLake.fromDelta(spark, t, Some(5L)).count() == 600)
    // ...until vacuum reclaims the 6 old files
    val dry = DeltaLake.vacuum(spark, t, retainVersions = 1)
    assert(dry.length == 6)
    assert(DeltaLake.fromDelta(spark, t).count() == 600) // dry run deleted nothing
    val gone = DeltaLake.vacuum(spark, t, retainVersions = 1, dryRun = false)
    assert(gone.length == 6)
    assert(DeltaLake.fromDelta(spark, t).count() == 600) // current unaffected
    intercept[Exception] { // old version's files are gone now
      DeltaLake.fromDelta(spark, t, Some(5L)).count()
    }
  }

  test("upsert rewrites only key-matching files; inserts land; untouched files survive") {
    val t = tmp("up.delta")
    import spark.implicits._
    // 4 range files over id 0..399
    val base = spark.range(0, 400).select(
      col("id"), concat(lit("v"), col("id")).as("s"))
      .repartitionByRange(4, col("id"))
    DeltaLake.toDelta(base, t)
    def paths = {
      val commit = (0L to DeltaLake.latestVersion(t)).flatMap { v =>
        val f = java.nio.file.Paths.get(f"$t/_delta_log/$v%020d.json")
        if (java.nio.file.Files.exists(f))
          new String(java.nio.file.Files.readAllBytes(f), StandardCharsets.UTF_8)
            .split("\n").toSeq
        else Nil
      }
      commit
    }
    // update 3 rows in ONE file's range + insert 2 new keys
    val src = Seq((10L, "NEW10"), (11L, "NEW11"), (12L, "NEW12"),
      (1000L, "INS0"), (1001L, "INS1")).toDF("id", "s")
    val v = DeltaLake.upsert(spark, t, src, Seq("id"))
    assert(v == 1L)
    val after = DeltaLake.fromDelta(spark, t)
    assert(after.count() == 402)
    assert(after.filter(col("id") === 11).head.getAs[String]("s") == "NEW11")
    assert(after.filter(col("id") === 1000).head.getAs[String]("s") == "INS0")
    assert(after.filter(col("id") === 13).head.getAs[String]("s") == "v13")
    // only the ONE matched file was removed; the other 3 survive
    val merge = paths.filter(_.contains("\"MERGE\""))
    assert(merge.nonEmpty)
    val removed = paths.drop(0).filter(l =>
      l.contains("\"remove\"") && l.contains("\"dataChange\":true"))
    assert(removed.length == 1)
    // duplicate source keys reject
    val e = intercept[IllegalArgumentException] {
      DeltaLake.upsert(spark, t,
        Seq((1L, "a"), (1L, "b")).toDF("id", "s"), Seq("id"))
    }
    assert(e.getMessage.contains("not unique"))
  }

  test("deleteWhere rewrites only candidate files; clean predicate is a no-op") {
    val t = tmp("del.delta")
    import spark.implicits._
    val base = spark.range(0, 400).select(
      col("id"), (col("id") % 5).cast("double").as("v"))
      .repartitionByRange(4, col("id"))
    DeltaLake.toDelta(base, t)
    // provably-impossible predicate: stats say no file can match
    assert(DeltaLake.deleteWhere(spark, t, col("id") > 100000) == 0L) // no commit
    assert(DeltaLake.latestVersion(t) == 0L)
    // delete a range inside one file
    val v = DeltaLake.deleteWhere(spark, t, col("id") >= 150 && col("id") < 160)
    assert(v == 1L)
    val after = DeltaLake.fromDelta(spark, t)
    assert(after.count() == 390)
    assert(after.filter(col("id") === 155).count() == 0)
    assert(after.filter(col("id") === 149).count() == 1)
    // only the candidate file rewrote
    val commit = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(f"$t/_delta_log/${1L}%020d.json")),
      StandardCharsets.UTF_8)
    assert(commit.contains("\"operation\":\"DELETE\""))
    assert(commit.split("\n").count(_.contains("\"remove\"")) == 1)
  }

  test("deleteWhere: NULL-evaluating rows SURVIVE; upsert into an emptied table inserts") {
    val t = tmp("nulldel.delta")
    import spark.implicits._
    val df = Seq((1L, java.lang.Double.valueOf(100.0)),
      (2L, null.asInstanceOf[java.lang.Double]),
      (3L, java.lang.Double.valueOf(500.0))).toDF("id", "v").coalesce(1)
    DeltaLake.toDelta(df, t)
    DeltaLake.deleteWhere(spark, t, col("v") < 200)
    // only the TRUE row is deleted; the NULL row is NOT (DELETE
    // semantics — NOT(NULL) must not silently drop it)
    val left = DeltaLake.fromDelta(spark, t).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(left == Seq(2L, 3L))
    // empty the table, then upsert = pure insert (no empty.reduce)
    DeltaLake.deleteWhere(spark, t, col("id") >= 0)
    assert(DeltaLake.fromDelta(spark, t).count() == 0)
    DeltaLake.upsert(spark, t, Seq((9L, java.lang.Double.valueOf(9.0)))
      .toDF("id", "v"), Seq("id"))
    assert(DeltaLake.fromDelta(spark, t).collect().map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("fromDeltaChanges tails commits exactly-once; compaction delivers nothing") {
    val t = tmp("cdc.delta")
    import spark.implicits._
    DeltaLake.toDelta(Seq((1L, "a")).toDF("id", "s").coalesce(1), t)         // v0
    DeltaLake.toDelta(Seq((2L, "b")).toDF("id", "s").coalesce(1), t, "append") // v1
    DeltaLake.toDelta(Seq((3L, "c")).toDF("id", "s").coalesce(1), t, "append") // v2
    DeltaLake.compact(spark, t)                                              // v3: no new rows
    DeltaLake.toDelta(Seq((4L, "d")).toDF("id", "s").coalesce(1), t, "append") // v4
    def pull(from: Long, to: Option[Long] = None) =
      DeltaLake.fromDeltaChanges(spark, t, from, to)
        .select("id", "_commit_version").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(pull(-1L, Some(1L)) == Seq((1L, 0L), (2L, 1L)))
    assert(pull(1L) == Seq((3L, 2L), (4L, 4L))) // v3 OPTIMIZE contributes 0
    assert(pull(4L) == Seq()) // caught up
    // two half-open pulls == one big pull (exactly-once composition)
    assert((pull(-1L, Some(2L)) ++ pull(2L)) == pull(-1L))
    intercept[IllegalArgumentException] { pull(5L) } // beyond latest
  }

  test("fromDeltaChanges rejects copy-on-write rewrites in range (not append-only)") {
    val t = tmp("cdcow.delta")
    import spark.implicits._
    DeltaLake.toDelta(Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1), t) // v0
    DeltaLake.toDelta(Seq((3L, "c")).toDF("id", "s").coalesce(1), t, "append")  // v1
    // v2: CoW DELETE — remove(dataChange=true) + re-add of survivors;
    // the re-added file's rows were already delivered, so a tail over
    // the range would duplicate them as "rows added". Must reject.
    DeltaLake.deleteWhere(spark, t, col("id") === 1L)
    DeltaLake.toDelta(Seq((4L, "d")).toDF("id", "s").coalesce(1), t, "append")  // v3
    val e = intercept[IllegalArgumentException] {
      DeltaLake.fromDeltaChanges(spark, t, -1L).collect()
    }
    assert(e.getMessage.contains("not append-only"))
    // ranges that exclude the rewrite commit still tail fine
    assert(DeltaLake.fromDeltaChanges(spark, t, 2L)
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(4L))
    assert(DeltaLake.fromDeltaChanges(spark, t, -1L, Some(1L)).count() == 3)
  }

  test("typeWidening: narrow files promote to the widened table schema") {
    val t = tmp("tw.delta")
    import spark.implicits._
    // v0: narrow table (int i, float f, long k) via our own writer
    DeltaLake.toDelta(spark.range(0, 50).select(
      col("id").cast("int").as("i"),
      (col("id").cast("float") * 1.5f).as("f"),
      col("id").as("k")), t)
    // v1: a foreign ALTER widens i->long, f->double — metadata-only:
    // wide schemaString carrying delta.typeChanges + the feature
    // protocol; the v0 files stay narrow on disk
    val wide = StructType(Seq(
      StructField("i", LongType, nullable = true, metadata = Metadata.fromJson(
        """{"delta.typeChanges":[{"toType":"long","fromType":"integer","tableVersion":1}]}""")),
      StructField("f", DoubleType, nullable = true, metadata = Metadata.fromJson(
        """{"delta.typeChanges":[{"toType":"double","fromType":"float","tableVersion":1}]}""")),
      StructField("k", LongType)))
    val ssNode = com.fasterxml.jackson.databind.node.JsonNodeFactory.instance
      .textNode(wide.json).toString
    writeLog(t, 1L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["typeWidening"],"writerFeatures":["typeWidening"]}}""",
      s"""{"metaData":{"id":"tw","format":{"provider":"parquet","options":{}},"schemaString":$ssNode,"partitionColumns":[],"configuration":{},"createdTime":0}}"""))
    // v2: a wide append through our own writer composes
    DeltaLake.toDelta(spark.range(100, 120).select(
      col("id").as("i"), (col("id") * 2.5).as("f"), col("id").as("k")),
      t, "append")
    val back = DeltaLake.fromDelta(spark, t)
    assert(back.schema("i").dataType == LongType)
    assert(back.schema("f").dataType == DoubleType)
    assert(back.count() == 70)
    // narrow rows really promote inside the scan
    assert(back.filter(col("k") === 7).select("i").as[Long].head() == 7L)
    assert(back.filter(col("k") === 7).select("f").as[Double].head() == 10.5)
    assert(back.filter(col("k") === 110).select("i").as[Long].head() == 110L)
    // aggregates spanning narrow + wide files
    assert(back.agg(sum(col("i"))).as[Long].head() ==
      (0L until 50).sum + (100L until 120).sum)
    // stats skipping still evaluates over narrow-recorded stats
    val skipped = DeltaLake.fromDelta(spark, t, None, Some(col("i") <= 10L))
    assert(skipped.count() == 11)
    assert(skipped.inputFiles.length < back.inputFiles.length)
  }

  test("column mapping id mode: field-id resolution, drifted file names, writers reject") {
    val t = tmp("cmid.delta")
    import spark.implicits._
    val df = spark.range(0, 100).select(
      col("id"), (col("id") % 5).cast("int").as("grp"),
      concat(lit("v"), col("id")).as("label"))
      .repartitionByRange(4, col("id"))
    // two file column names match NEITHER logical nor physical names —
    // only the parquet field id links them (the converted-table shape)
    DeltaLake.foreignIdMapped(df, t,
      physicalOf = Map("id" -> "col-aaaa", "grp" -> "col-bbbb",
        "label" -> "col-cccc"),
      fileNameOf = Map("id" -> "legacy_id", "label" -> "legacy_label"))
    val back = DeltaLake.fromDelta(spark, t)
    assert(back.columns.toSeq == Seq("id", "grp", "label"))
    assert(back.count() == 100)
    assert(back.filter(col("id") === 42).select("label").head.getString(0) == "v42")
    // the files genuinely carry the drifted names
    val phys = spark.read.parquet(back.inputFiles.head)
    assert(phys.columns.toSet == Set("legacy_id", "col-bbbb", "legacy_label"))
    // stats skipping evaluates in the physical namespace and prunes
    val skipped = DeltaLake.fromDelta(spark, t, None, Some(col("id") <= 20))
    assert(skipped.inputFiles.length < 4)
    assert(skipped.count() == 21)
    // every writer rejects loudly; reads stay available
    val extra = spark.range(100, 110).select(
      col("id"), (col("id") % 5).cast("int").as("grp"),
      concat(lit("v"), col("id")).as("label"))
    assert(intercept[IllegalArgumentException](
      DeltaLake.toDelta(extra, t, "append")).getMessage.contains("read-only"))
    assert(intercept[IllegalArgumentException](
      DeltaLake.deleteWhere(spark, t, col("id") === 1))
      .getMessage.contains("read-only"))
    assert(intercept[IllegalArgumentException](
      DeltaLake.upsert(spark, t, extra, Seq("id")))
      .getMessage.contains("read-only"))
    assert(intercept[IllegalArgumentException](
      DeltaLake.compact(spark, t)).getMessage.contains("read-only"))
    assert(intercept[IllegalArgumentException](
      DeltaLake.renameColumn(spark, t, "label", "l2"))
      .getMessage.contains("read-only"))
    // a field missing delta.columnMapping.id is loud, never misread
    val t2 = tmp("cmid2.delta")
    DeltaLake.foreignIdMapped(df, t2,
      physicalOf = Map("id" -> "col-a", "grp" -> "col-b", "label" -> "col-c"))
    val logF = s"$t2/_delta_log/00000000000000000000.json"
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val patched = scala.io.Source.fromFile(logF).getLines().map { line =>
      val n = mapper.readTree(line)
      if (!n.has("metaData")) line
      else {
        val md = n.get("metaData").asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        val ss = mapper.readTree(md.get("schemaString").asText())
        ss.get("fields").get(1).get("metadata")
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          .remove("delta.columnMapping.id")
        md.put("schemaString", mapper.writeValueAsString(ss))
        mapper.writeValueAsString(n)
      }
    }.mkString("\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(logF),
      patched.getBytes("UTF-8"))
    val eMiss = intercept[IllegalArgumentException](
      DeltaLake.fromDelta(spark, t2).collect())
    assert(eMiss.getMessage.contains("lacks delta.columnMapping.id"))
  }

  test("column mapping name mode: logical columns, physical stats skipping, read-only") {
    val t = tmp("cm.delta")
    import spark.implicits._
    val df = spark.range(0, 100).select(
      col("id"), (col("id") % 5).cast("int").as("grp"),
      concat(lit("v"), col("id")).as("label"))
      .repartitionByRange(4, col("id"))
    DeltaLake.foreignColumnMapped(df, t,
      Map("id" -> "col-aaaa1111", "grp" -> "col-bbbb2222",
        "label" -> "col-cccc3333"))
    val back = DeltaLake.fromDelta(spark, t)
    assert(back.columns.toSeq == Seq("id", "grp", "label"))
    assert(back.count() == 100)
    assert(back.filter(col("id") === 42).select("label").head.getString(0) == "v42")
    // the DATA files really carry physical names (foreign layout)
    val onePart = back.inputFiles.head
    val phys = spark.read.parquet(onePart)
    assert(phys.columns.toSet == Set("col-aaaa1111", "col-bbbb2222", "col-cccc3333"))
    // stats skipping translates the predicate into the physical
    // namespace: 4 range shards, id<=20 must plan strictly fewer files
    val skipped = DeltaLake.fromDelta(spark, t, None, Some(col("id") <= 20))
    assert(skipped.inputFiles.length < 4)
    assert(skipped.count() == 21)
    // partitioned variant: partitionColumns logical, partitionValues
    // keyed physical, re-injected as typed literals
    val tp = tmp("cmp.delta")
    DeltaLake.foreignColumnMapped(df, tp,
      Map("id" -> "col-a", "grp" -> "col-b", "label" -> "col-c"),
      partitionBy = Seq("grp"))
    val backP = DeltaLake.fromDelta(spark, tp)
    assert(backP.columns.toSeq == Seq("id", "grp", "label"))
    assert(backP.filter(col("grp") === 3).count() == 20)
    assert(backP.schema("grp").dataType == IntegerType)
    // partition pruning through the physical partitionValues
    assert(DeltaLake.fromDelta(spark, tp, None, Some(col("grp") === 3))
      .inputFiles.length < backP.inputFiles.length)
    // APPENDS to a column-mapped table stage under PHYSICAL names —
    // the new files must look exactly like the foreign writer's own
    val extra = spark.range(100, 120).select(
      col("id"), (col("id") % 5).cast("int").as("grp"),
      concat(lit("v"), col("id")).as("label"))
    DeltaLake.toDelta(extra, t, "append")
    val appended = DeltaLake.fromDelta(spark, t)
    assert(appended.count() == 120)
    assert(appended.filter(col("id") === 110).head.getString(2) == "v110")
    // the appended data FILES carry physical names like the originals
    val newest = appended.inputFiles.map(f =>
      spark.read.parquet(f).columns.toSet).distinct
    assert(newest.toSeq == Seq(Set("col-aaaa1111", "col-bbbb2222", "col-cccc3333")))
    // partitioned CM append: partition dirs/values keyed physical
    DeltaLake.toDelta(df, tp, "append", partitionBy = Seq("grp"))
    assert(DeltaLake.fromDelta(spark, tp).count() == 200)
    assert(DeltaLake.fromDelta(spark, tp, None, Some(col("grp") === 3))
      .count() == 40)
    // CHECKPOINTS on a CM table must carry the configuration — a
    // checkpoint recording columnMapping=none would make every
    // replay-from-checkpoint read physical files with logical names
    // (silent all-NULL columns)
    (0 until 3).foreach(_ => DeltaLake.toDelta(extra, t, "append",
      checkpointInterval = 2))
    assert(FsIO.listFileNames(s"$t/_delta_log")
      .exists(_.endsWith(".checkpoint.parquet")))
    // drop the compacted json commits: the read must resolve the
    // mapping FROM the checkpoint alone
    val cpV = FsIO.listFileNames(s"$t/_delta_log")
      .collect { case n if n.endsWith(".checkpoint.parquet") =>
        n.takeWhile(_ != '.').toLong }.max
    (0L to cpV).foreach(v =>
      FsIO.deleteRecursive(f"$t/_delta_log/$v%020d.json"))
    val fromCp = DeltaLake.fromDelta(spark, t)
    assert(fromCp.count() == 180)
    assert(fromCp.filter(col("id") === 110).count() == 4) // values, not NULLs
    assert(fromCp.filter(col("label").isNull).count() == 0)
    // MAINTENANCE works on column-mapped tables (r17): every rewrite
    // op reads/stages in the physical namespace
    val nBefore = DeltaLake.fromDelta(spark, t).count()
    // CoW delete: physical stats prefilter + logical predicate
    DeltaLake.deleteWhere(spark, t, col("id") === 110)
    val afterDel = DeltaLake.fromDelta(spark, t)
    assert(afterDel.count() == nBefore - 4) // 110 appeared 4x above
    assert(afterDel.filter(col("id") === 110).count() == 0)
    assert(afterDel.filter(col("label").isNull).count() == 0)
    // upsert: replace one key, insert one new
    DeltaLake.upsert(spark, t, spark.range(111, 113).select(
      col("id"), (col("id") % 5).cast("int").as("grp"),
      concat(lit("up"), col("id")).as("label")), Seq("id"))
    val afterUp = DeltaLake.fromDelta(spark, t)
    assert(afterUp.filter(col("id") === 111)
      .select("label").distinct().head.getString(0) == "up111")
    assert(afterUp.filter(col("id") === 112).count() == 1)
    // compact: layout-only rewrite in the physical namespace — row
    // set identical, physical file names preserved in the new files
    val expectRows = afterUp.orderBy("id", "label").collect().toSeq
    DeltaLake.compact(spark, t, zorderBy = Seq("id"))
    val afterOpt = DeltaLake.fromDelta(spark, t)
    assert(afterOpt.orderBy("id", "label").collect().toSeq == expectRows)
    assert(spark.read.parquet(afterOpt.inputFiles.head).columns.toSet ==
      Set("col-aaaa1111", "col-bbbb2222", "col-cccc3333"))
    // skipping still prunes through the recollected physical stats
    assert(DeltaLake.fromDelta(spark, t, None, Some(col("id") <= 20))
      .count() == afterUp.filter(col("id") <= 20).count())
    // restore (metadata-only) back to the checkpoint version
    DeltaLake.restore(spark, t, cpV)
    assert(DeltaLake.fromDelta(spark, t).count() == nBefore)
  }

  private def vacuumedLogFixture(name: String): (String, Long, Long) = {
    // 3 commits (v0 overwrite + 2 appends) of 60+60+60 ids over 4 range
    // shards each; returns (table, latestVersion, expectedCount)
    val t = tmp(name)
    import spark.implicits._
    def slab(lo: Long): org.apache.spark.sql.DataFrame =
      spark.range(lo, lo + 60).select(col("id"), (col("id") % 5).as("g"))
        .repartitionByRange(4, col("id"))
    DeltaLake.toDelta(slab(0), t, checkpointInterval = 0)
    DeltaLake.toDelta(slab(60), t, "append", checkpointInterval = 0)
    DeltaLake.toDelta(slab(120), t, "append", checkpointInterval = 0)
    (t, 2L, 180L)
  }

  private def dropJsonCommits(t: String, upTo: Long): Unit =
    (0L to upTo).foreach(v =>
      FsIO.deleteRecursive(f"$t/_delta_log/$v%020d.json"))

  test("multi-part classic checkpoint opens a table with vacuumed json commits") {
    val (t, v, n) = vacuumedLogFixture("mpcp.delta")
    DeltaLake.foreignMultiPartCheckpoint(spark, t, numParts = 3)
    dropJsonCommits(t, v)
    val back = DeltaLake.fromDelta(spark, t)
    assert(back.count() == n)
    assert(back.agg(sum("id")).head.getLong(0) == (0L until 180L).sum)
    // stats skipping still works through the multi-part adds
    assert(DeltaLake.fromDelta(spark, t, where = Some(col("id") <= 50))
      .inputFiles.length < back.inputFiles.length)
    // versions BEFORE the checkpoint are genuinely gone — loud
    val e = intercept[IllegalArgumentException](
      DeltaLake.fromDelta(spark, t, versionAsOf = Some(0L)))
    assert(e.getMessage.contains("missing commit versions"))
    // the table stays writable (classic protocol): append + read back
    import spark.implicits._
    DeltaLake.toDelta(spark.range(300, 310)
      .select(col("id"), (col("id") % 5).as("g")), t, "append")
    assert(DeltaLake.fromDelta(spark, t).count() == n + 10)
  }

  test("racing multi-part checkpoints: two complete sets of one version both usable") {
    // the protocol allows several complete checkpoints of the SAME
    // version with different part counts (racing writers) — any
    // complete set is full state; selection groups by (version,
    // numParts) and prefers the smallest part count
    val (t, v, n) = vacuumedLogFixture("mpcprace.delta")
    DeltaLake.foreignMultiPartCheckpoint(spark, t, numParts = 2)
    DeltaLake.foreignMultiPartCheckpoint(spark, t, numParts = 3)
    dropJsonCommits(t, v)
    assert(DeltaLake.fromDelta(spark, t).count() == n)
    // one racing set INCOMPLETE (damaged) — the other still opens
    val part2of3 = FsIO.listFileNames(s"$t/_delta_log")
      .find(_.matches(raw"\d{20}\.checkpoint\.0000000002\.0000000003\.parquet")).get
    FsIO.deleteRecursive(s"$t/_delta_log/$part2of3")
    assert(DeltaLake.fromDelta(spark, t).count() == n)
    assert(DeltaLake.fromDelta(spark, t)
      .agg(sum("id")).head.getLong(0) == (0L until 180L).sum)
  }

  test("incomplete multi-part checkpoint is not a candidate (loud, never partial state)") {
    val (t, v, _) = vacuumedLogFixture("mpcpbad.delta")
    DeltaLake.foreignMultiPartCheckpoint(spark, t, numParts = 3)
    // damage: drop part 2 of 3, then the json commits
    val part2 = FsIO.listFileNames(s"$t/_delta_log")
      .find(_.matches(raw"\d{20}\.checkpoint\.0000000002\.0000000003\.parquet")).get
    FsIO.deleteRecursive(s"$t/_delta_log/$part2")
    dropJsonCommits(t, v)
    val e = intercept[IllegalArgumentException](DeltaLake.fromDelta(spark, t))
    assert(e.getMessage.contains("missing commit versions"))
  }

  test("v2 checkpoint (parquet manifest + sidecars) opens a vacuumed-log table; writes reject") {
    val (t, v, n) = vacuumedLogFixture("v2cp.delta")
    DeltaLake.foreignV2Checkpoint(spark, t, numSidecars = 2)
    dropJsonCommits(t, v)
    val back = DeltaLake.fromDelta(spark, t)
    assert(back.count() == n)
    assert(back.agg(sum("id")).head.getLong(0) == (0L until 180L).sum)
    assert(DeltaLake.fromDelta(spark, t, where = Some(col("id") <= 50))
      .inputFiles.length < back.inputFiles.length)
    // the v2Checkpoint WRITER feature obliges a writer to PRODUCE v2
    // checkpoints — which writeCheckpoint now does, so the table is
    // fully writable: append with a cadence that forces a checkpoint
    // at the next version
    import spark.implicits._
    val extra = spark.range(300, 310).select(col("id"), (col("id") % 5).as("g"))
    DeltaLake.toDelta(extra, t, "append", checkpointInterval = 3)   // v3
    assert(DeltaLake.fromDelta(spark, t).count() == n + 10)
    // the cadence checkpoint at v3 must be the V2 layout (uuid
    // manifest), never a classic one (a conforming writer's duty)
    val names3 = FsIO.listFileNames(s"$t/_delta_log")
    assert(names3.exists(_.matches(
      raw"0{17}003\.checkpoint\.[^.]+\.parquet")), s"no v3 v2cp: $names3")
    assert(!names3.exists(_.matches(raw"\d{20}\.checkpoint\.parquet")))
    // OUR v2 checkpoint is self-sufficient: drop every json commit at
    // or below it and reopen (round-trip our-writer -> our-reader)
    dropJsonCommits(t, 3L)
    val reopened = DeltaLake.fromDelta(spark, t)
    assert(reopened.count() == n + 10)
    assert(reopened.agg(sum("id")).head.getLong(0) ==
      (0L until 180L).sum + (300L until 310L).sum)
    // maintenance + merge-on-read ops work too
    DeltaLake.compact(spark, t)                                      // v4
    DeltaLake.deleteWhere(spark, t, col("id") >= 305)                // v5
    assert(DeltaLake.fromDelta(spark, t).count() == n + 5)
    // protocol is NOT silently downgraded by our checkpoints
    val snapFeatures = DeltaLake.tableProtocol(spark, t)
    assert(snapFeatures._4.contains("v2Checkpoint"), snapFeatures.toString)
  }

  test("v2 checkpoint: json manifest and inline-adds manifest both open") {
    val (t1, v1, n1) = vacuumedLogFixture("v2cpj.delta")
    DeltaLake.foreignV2Checkpoint(spark, t1, numSidecars = 1, jsonManifest = true)
    dropJsonCommits(t1, v1)
    assert(DeltaLake.fromDelta(spark, t1).count() == n1)
    val (t2, v2, n2) = vacuumedLogFixture("v2cpi.delta")
    DeltaLake.foreignV2Checkpoint(spark, t2, numSidecars = 0) // adds inline
    dropJsonCommits(t2, v2)
    assert(DeltaLake.fromDelta(spark, t2).count() == n2)
  }

  test("v2 parquet manifest misnamed to another version rejects (declared-version check)") {
    val (t, v, _) = vacuumedLogFixture("v2cpv.delta")
    DeltaLake.foreignV2Checkpoint(spark, t, numSidecars = 1)
    val manifest = FsIO.listFileNames(s"$t/_delta_log")
      .find(_.matches(raw"\d{20}\.checkpoint\.[^.]+\.parquet")).get
    // a copied/misnamed manifest claims a HIGHER version than its
    // checkpointMetadata declares — applying it there would skip
    // replaying the intervening commits
    val renamed = f"${v + 3}%020d" + manifest.drop(20)
    FsIO.rename(s"$t/_delta_log/$manifest", s"$t/_delta_log/$renamed")
    val e = intercept[IllegalArgumentException](
      DeltaLake.fromDelta(spark, t))
    assert(e.getMessage.contains("declares version"))
  }

  test("DV tombstones carry the removed file version's deletionVector") {
    val t = tmp("dvrm.delta")
    import spark.implicits._
    DeltaLake.toDelta(spark.range(0, 100).select(
      col("id"), (col("id") % 7).as("m")).coalesce(1), t)
    DeltaLake.deleteWhere(spark, t, col("m") === 3, viaDeletionVectors = true) // v1
    DeltaLake.deleteWhere(spark, t, col("m") === 5, viaDeletionVectors = true) // v2
    // v2 removes the v1 file VERSION (which carried a DV): per the
    // protocol the tombstone must reference it so DV-file bookkeeping
    // sees every reference
    val lines = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(f"$t/_delta_log/${2L}%020d.json")),
      java.nio.charset.StandardCharsets.UTF_8).linesIterator.toSeq
    val removeLine = lines.find(_.contains("\"remove\"")).get
    assert(removeLine.contains("\"deletionVector\""))
    // v1's remove (of a DV-free file version) carries none
    val lines1 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(f"$t/_delta_log/${1L}%020d.json")),
      java.nio.charset.StandardCharsets.UTF_8).linesIterator.toSeq
    assert(!lines1.find(_.contains("\"remove\"")).get
      .contains("\"deletionVector\""))
  }

  test("v2 checkpoint with a missing sidecar rejects loudly") {
    val (t, v, _) = vacuumedLogFixture("v2cpm.delta")
    DeltaLake.foreignV2Checkpoint(spark, t, numSidecars = 2)
    dropJsonCommits(t, v)
    val sc = FsIO.listFileNames(s"$t/_delta_log/_sidecars").head
    FsIO.deleteRecursive(s"$t/_delta_log/_sidecars/$sc")
    val e = intercept[IllegalArgumentException](
      DeltaLake.fromDelta(spark, t).count())
    assert(e.getMessage.contains("missing sidecar"))
  }

  test("a newer json tail replays on top of every checkpoint form") {
    // checkpoint at v2, then two MORE commits; the snapshot must be
    // checkpoint state + replayed tail, for multi-part AND v2
    for ((name, mk) <- Seq[(String, String => Unit)](
        "mt" -> (t => DeltaLake.foreignMultiPartCheckpoint(spark, t, 2)),
        "v2" -> (t => DeltaLake.foreignV2Checkpoint(spark, t, 2)))) {
      val (t, v, n) = vacuumedLogFixture(s"tail$name.delta")
      mk(t)
      import spark.implicits._
      // both forms stay writable (v2cp tables since writeCheckpoint
      // produces the v2 layout)
      DeltaLake.toDelta(spark.range(200, 220)
        .select(col("id"), (col("id") % 5).as("g")), t, "append",
        checkpointInterval = 0)
      dropJsonCommits(t, v)
      assert(DeltaLake.fromDelta(spark, t).count() == n + 20)
      // time travel TO the checkpoint version still works
      assert(DeltaLake.fromDelta(spark, t, Some(v)).count() == n)
    }
  }

  test("DV deleteWhere mostly-deletes a large single file; agg paths byte-identical") {
    // 95% of a 400k-row SINGLE file deleted: the roaring-union
    // aggregate's buffer is the compressed bitmap (~payload bytes),
    // never 8 B/deleted-row in one task — and both paths (union agg vs
    // the collect_list fallback) must publish byte-identical DV files
    val t = tmp("dvbig.delta")
    import spark.implicits._
    val df = spark.range(0, 400000).select(
      col("id"), (col("id") % 20).as("m")).coalesce(1)
    DeltaLake.toDelta(df, t)
    DeltaLake.deleteWhere(spark, t, col("m") =!= 0, viaDeletionVectors = true)
    val back = DeltaLake.fromDelta(spark, t)
    assert(back.count() == 20000)
    assert(back.agg(sum("id")).head.getLong(0) ==
      (0L until 400000L by 20).sum)
    val aggBin = FsIO.listFilesRecursive(t).collect {
      case (p, len, _) if p.endsWith(".bin") => len }.toSeq
    // A/B: same delete through the collect_list fallback
    val t2 = tmp("dvbig2.delta")
    DeltaLake.toDelta(df, t2)
    spark.conf.set("spark.graft.dv.unionAgg", "false")
    try DeltaLake.deleteWhere(spark, t2, col("m") =!= 0,
      viaDeletionVectors = true)
    finally spark.conf.unset("spark.graft.dv.unionAgg")
    assert(DeltaLake.fromDelta(spark, t2).count() == 20000)
    val fallbackBin = FsIO.listFilesRecursive(t2).collect {
      case (p, len, _) if p.endsWith(".bin") => len }.toSeq
    assert(aggBin == fallbackBin, s"DV file sizes differ: $aggBin vs $fallbackBin")
  }

  test("DV deleteWhere on a column-mapped table (CM+DV, the modern combination)") {
    val t = tmp("cmdv.delta")
    import spark.implicits._
    val df = spark.range(0, 200).select(
      col("id"), (col("id") % 7).as("m"),
      concat(lit("v"), col("id")).as("label"))
      .repartitionByRange(4, col("id"))
    DeltaLake.foreignColumnMapped(df, t,
      Map("id" -> "col-x1", "m" -> "col-x2", "label" -> "col-x3"))
    val filesBefore = DeltaLake.fromDelta(spark, t).inputFiles.toSet
    val v1 = DeltaLake.deleteWhere(spark, t, col("m") === 3,
      viaDeletionVectors = true)
    assert(v1 == 1L)
    val back = DeltaLake.fromDelta(spark, t)
    assert(back.count() == 200 - 29) // 29 ids with id%7==3
    assert(back.filter(col("m") === 3).count() == 0)
    // merge-on-read under CM: the physical-named data files untouched
    assert(back.inputFiles.toSet == filesBefore)
    // repeated DV deletes compose (union semantics)
    DeltaLake.deleteWhere(spark, t, col("m") === 5, viaDeletionVectors = true)
    val back2 = DeltaLake.fromDelta(spark, t)
    assert(back2.filter(col("m") === 5 || col("m") === 3).count() == 0)
    assert(back2.count() == 200 - 29 - 28)
    // the logical aliasing really ran — values, never NULLs
    assert(back2.filter(col("label").isNull).count() == 0)
    assert(back2.filter(col("id") === 42).select("label").head.getString(0)
      == "v42")
    // PARTITIONED CM + DV: partitionValues keys are physical, the
    // stats prefilter + partition typing run in the physical namespace
    val tp = tmp("cmdvp.delta")
    DeltaLake.foreignColumnMapped(df, tp,
      Map("id" -> "col-a", "m" -> "col-b", "label" -> "col-c"),
      partitionBy = Seq("m"))
    DeltaLake.deleteWhere(spark, tp, col("id") >= 100 && col("m") === 2,
      viaDeletionVectors = true)
    val backP = DeltaLake.fromDelta(spark, tp)
    assert(backP.count() == 200 - 15) // 7k+2 in [100,199]: k=14..28
    assert(backP.filter(col("m") === 2).count() == 29 - 15)
    // the protocol upgrade enumerated the CM legacy feature alongside DVs
    val proto = DeltaLake.tableProtocol(spark, tp)
    assert(proto._3.contains("columnMapping") &&
      proto._3.contains("deletionVectors"), proto.toString)
    // blind appends still compose on the CM+DV table
    DeltaLake.toDelta(df.filter(col("id") < 10)
      .withColumn("id", col("id") + 1000), tp, "append",
      partitionBy = Seq("m"))
    assert(DeltaLake.fromDelta(spark, tp).count() == 200 - 15 + 10)
    // purge closes the CM+DV lifecycle too (r17): physical-namespace
    // rewrite of the DV-carrying files, then full maintenance unlocks
    val expectP = DeltaLake.fromDelta(spark, tp)
      .orderBy("id").collect().toSeq
    DeltaLake.purgeDeletionVectors(spark, tp)
    assert(DeltaLake.fromDelta(spark, tp)
      .orderBy("id").collect().toSeq == expectP)
    DeltaLake.compact(spark, tp)
    assert(DeltaLake.fromDelta(spark, tp)
      .orderBy("id").collect().toSeq == expectP)
  }

  test("DV-emitting deleteWhere: no rewrite, appends compose, repeated deletes merge") {
    val t = tmp("dvdel.delta")
    import spark.implicits._
    val df = spark.range(0, 200).select(
      col("id"), (col("id") % 7).as("m"),
      when(col("id") % 10 === 0, lit(null)).otherwise(col("id") % 5).as("mn"))
      .repartitionByRange(4, col("id"))
    DeltaLake.toDelta(df, t)
    val filesBefore = DeltaLake.fromDelta(spark, t).inputFiles.toSet
    val v1 = DeltaLake.deleteWhere(spark, t, col("m") === 3,
      viaDeletionVectors = true)
    assert(v1 == 1L)
    val back = DeltaLake.fromDelta(spark, t)
    assert(back.count() == 200 - 29) // 29 ids with id%7==3
    assert(back.filter(col("m") === 3).count() == 0)
    // merge-on-read: the DATA files are untouched
    assert(back.inputFiles.toSet == filesBefore)
    // blind append onto the DV table
    DeltaLake.toDelta(spark.range(1000, 1010).select(
      col("id"), (col("id") % 7).as("m"),
      (col("id") % 5).cast("long").as("mn")), t, "append")
    val after = DeltaLake.fromDelta(spark, t)
    assert(after.count() == 171 + 10)
    // appended rows with m==3 are LIVE (the delete predates them)
    assert(after.filter(col("m") === 3).count() ==
      (1000L until 1010L).count(_ % 7 == 3))
    // second DV delete MERGES with the existing bitmaps (and masks
    // rows in the new file too)
    DeltaLake.deleteWhere(spark, t, col("m") === 5, viaDeletionVectors = true)
    val third = DeltaLake.fromDelta(spark, t)
    assert(third.filter(col("m") === 3 && col("id") < 200).count() == 0)
    assert(third.filter(col("m") === 5).count() == 0)
    assert(third.count() ==
      (0L until 200L).count(i => i % 7 != 3 && i % 7 != 5) +
      // appended rows with m==3 predate no delete — only m==5 masks them
      (1000L until 1010L).count(_ % 7 != 5))
    // a delete matching ONLY already-masked rows commits nothing
    val vNow = DeltaLake.latestVersion(t)
    assert(DeltaLake.deleteWhere(spark, t, col("m") === 5,
      viaDeletionVectors = true) == vNow)
    assert(DeltaLake.latestVersion(t) == vNow)
    // NULL-evaluating rows SURVIVE (same contract as the CoW path)
    DeltaLake.deleteWhere(spark, t, col("mn") === 1, viaDeletionVectors = true)
    val fourth = DeltaLake.fromDelta(spark, t)
    assert(fourth.filter(col("mn").isNull).count() ==
      (0L until 200L).count(i => i % 10 == 0 && i % 7 != 3 && i % 7 != 5))
    assert(fourth.filter(col("mn") === 1).count() == 0)
    // checkpoints CARRY deletionVector descriptors (r17): an append
    // with interval 1 checkpoints the DV-carrying snapshot, and a
    // vacuumed-log open replays from the checkpoint with every DV
    // still applied
    DeltaLake.toDelta(spark.range(2000, 2002).select(
      col("id"), (col("id") % 7).as("m"),
      (col("id") % 5).cast("long").as("mn")), t, "append",
      checkpointInterval = 1)
    val cpNames = FsIO.listFileNames(s"$t/_delta_log")
      .filter(_.contains("checkpoint"))
    assert(cpNames.nonEmpty, "DV snapshot did not checkpoint")
    val expect5 = fourth.count() + 2
    assert(DeltaLake.fromDelta(spark, t).count() == expect5)
    val cpV = DeltaLake.latestVersion(t)
    (0L to cpV).foreach(v =>
      FsIO.deleteRecursive(f"$t/_delta_log/$v%020d.json"))
    val fromCp = DeltaLake.fromDelta(spark, t)
    assert(fromCp.count() == expect5)
    assert(fromCp.filter(col("m") === 3).count() ==
      (1000L until 1010L).count(_ % 7 == 3) +
        (2000L until 2002L).count(_ % 7 == 3))
    // vacuum through the checkpoint-only log keeps the referenced .bin
    DeltaLake.vacuum(spark, t, retainVersions = 1, dryRun = false)
    assert(FsIO.listFilesRecursive(t).exists(_._1.endsWith(".bin")))
    assert(DeltaLake.fromDelta(spark, t).count() == expect5)
    // r17: DV tables are fully writable. COMPACT materializes the
    // masks (logical rows unchanged -> dataChange=false), dropping the
    // DVs from the new file versions
    val beforeCompact = DeltaLake.fromDelta(spark, t)
      .orderBy("id").collect().toSeq
    DeltaLake.compact(spark, t)
    val afterCompact = DeltaLake.fromDelta(spark, t)
    assert(afterCompact.orderBy("id").collect().toSeq == beforeCompact)
    // the compacted snapshot is DV-free; the tail saw NO new rows
    assert(DeltaLake.fromDeltaChanges(spark, t,
      DeltaLake.latestVersion(t) - 1).count() == 0)
    // CoW delete on what is still a DV-history table works too
    DeltaLake.deleteWhere(spark, t, col("id") === 1000L)
    assert(DeltaLake.fromDelta(spark, t).count() == beforeCompact.size - 1)
    // OVERWRITE tombstones every file (descriptors ride along when
    // the snapshot still carries DVs — here they were just purged by
    // the compact, so this pins the plain path)
    DeltaLake.toDelta(df, t, "overwrite")
    assert(DeltaLake.fromDelta(spark, t).count() == df.count())
    // rebuild a DV state and overwrite THROUGH live DVs
    DeltaLake.deleteWhere(spark, t, col("m") === 2, viaDeletionVectors = true)
    assert(DeltaLake.fromDelta(spark, t).filter(col("m") === 2).count() == 0)
    DeltaLake.toDelta(df.limit(5), t, "overwrite")
    assert(DeltaLake.fromDelta(spark, t).count() == 5)
    val owCommit = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(f"$t/_delta_log/${DeltaLake.latestVersion(t)}%020d.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(owCommit.linesIterator.exists(l =>
      l.contains("\"remove\"") && l.contains("\"deletionVector\"")))
  }

  test("DV-carrying V2 checkpoint: DV delete on a v2cp table checkpoints and replays") {
    val t = tmp("dvv2cp.delta")
    import spark.implicits._
    val df = spark.range(0, 120).select(col("id"), (col("id") % 6).as("m"))
      .repartitionByRange(3, col("id"))
    DeltaLake.toDelta(df, t, checkpointInterval = 0)          // v0
    DeltaLake.foreignV2Checkpoint(spark, t, numSidecars = 1)  // feature on
    // the DV delete itself checkpoints (interval 1) — in V2 form,
    // with the DV descriptors riding in the sidecar adds
    DeltaLake.deleteWhere(spark, t, col("m") === 2,
      viaDeletionVectors = true, checkpointInterval = 1)      // v1 + v2cp
    val names = FsIO.listFileNames(s"$t/_delta_log")
    assert(names.exists(_.matches(
      raw"0{19}1\.checkpoint\.[^.]+\.parquet")), names.toString)
    assert(!names.exists(_.matches(raw"\d{20}\.checkpoint\.parquet")))
    dropJsonCommits(t, 1L)
    val back = DeltaLake.fromDelta(spark, t)
    assert(back.count() == 100)
    assert(back.filter(col("m") === 2).count() == 0)
    // and the lifecycle continues from the checkpoint-only log
    DeltaLake.toDelta(df.withColumn("id", col("id") + 1000), t, "append")
    assert(DeltaLake.fromDelta(spark, t).count() == 100 + 120)
  }

  test("purgeDeletionVectors closes the DV lifecycle: rewrite, unlock, reclaim") {
    val t = tmp("dvpurge.delta")
    import spark.implicits._
    val df = spark.range(0, 200).select(
      col("id"), (col("id") % 7).as("m"))
      .repartitionByRange(4, col("id"))
    DeltaLake.toDelta(df, t)                                             // v0
    DeltaLake.deleteWhere(spark, t, col("m") === 3,
      viaDeletionVectors = true)                                         // v1
    val masked = DeltaLake.fromDelta(spark, t)
    val expect = masked.orderBy("id").collect().toSeq
    val v = DeltaLake.purgeDeletionVectors(spark, t)                     // v2
    assert(v == 2L)
    val purged = DeltaLake.fromDelta(spark, t)
    // logical rows are IDENTICAL; the DV-carrying files were rewritten
    assert(purged.orderBy("id").collect().toSeq == expect)
    // the incremental tail sees NOTHING from the purge (dataChange=false)
    assert(DeltaLake.fromDeltaChanges(spark, t, 1L).count() == 0)
    // the snapshot is DV-free: maintenance and full writes unlock
    DeltaLake.compact(spark, t)                                          // v3
    DeltaLake.upsert(spark, t,
      Seq((500L, 1L)).toDF("id", "m"), Seq("id"))                        // v4
    assert(DeltaLake.fromDelta(spark, t).count() == expect.size + 1)
    // checkpointing is legal again (interval forces one here)
    DeltaLake.toDelta(Seq((600L, 2L)).toDF("id", "m"), t, "append",
      checkpointInterval = 5)                                            // v5
    assert(FsIO.listFileNames(s"$t/_delta_log")
      .exists(_.endsWith(".checkpoint.parquet")))
    // vacuum reclaims the orphaned DV .bin once its versions age out —
    // but a FRESH orphan gets the same 24h grace as staging (an
    // in-flight deleteWhereDv writes its .bin before the commit that
    // references it), so it is spared until its mtime ages past the
    // window
    assert(FsIO.listFilesRecursive(t).exists(_._1.endsWith(".bin")))
    val fresh = DeltaLake.vacuum(spark, t, retainVersions = 1, dryRun = false)
    assert(!fresh.exists(_.endsWith(".bin")),
      s"fresh orphan .bin swept inside the grace window: $fresh")
    FsIO.listFilesRecursive(t).collect { case (p, _, _) if p.endsWith(".bin") =>
      new java.io.File(p).setLastModified(
        System.currentTimeMillis() - 25L * 3600 * 1000)
    }
    val swept = DeltaLake.vacuum(spark, t, retainVersions = 1, dryRun = false)
    assert(swept.exists(_.endsWith(".bin")), s"no .bin swept: $swept")
    assert(!FsIO.listFilesRecursive(t).exists(_._1.endsWith(".bin")))
    assert(DeltaLake.fromDelta(spark, t).count() == expect.size + 2)
    // a purge with no DVs is a no-op (no commit)
    assert(DeltaLake.purgeDeletionVectors(spark, t) ==
      DeltaLake.latestVersion(t))
    // vacuum never sweeps a STILL-REFERENCED bin (current version)
    val t2 = tmp("dvkeep.delta")
    DeltaLake.toDelta(df, t2)
    DeltaLake.deleteWhere(spark, t2, col("m") === 3, viaDeletionVectors = true)
    val swept2 = DeltaLake.vacuum(spark, t2, retainVersions = 1, dryRun = false)
    assert(!swept2.exists(_.endsWith(".bin")))
    assert(DeltaLake.fromDelta(spark, t2).filter(col("m") === 3).count() == 0)
  }

  test("DV-emitting deleteWhere on a PARTITIONED table prunes via stats and masks per file") {
    val t = tmp("dvdelp.delta")
    import spark.implicits._
    val df = spark.range(0, 120).select(
      col("id"), (col("id") % 3).cast("int").as("g"), (col("id") % 11).as("k"))
      .repartitionByRange(4, col("id"))
    DeltaLake.toDelta(df, t, partitionBy = Seq("g"))
    // predicate over a partition column + a data column
    DeltaLake.deleteWhere(spark, t, col("g") === 1 && col("k") === 2,
      viaDeletionVectors = true)
    val back = DeltaLake.fromDelta(spark, t)
    assert(back.filter(col("g") === 1 && col("k") === 2).count() == 0)
    assert(back.count() ==
      120 - (0L until 120L).count(i => i % 3 == 1 && i % 11 == 2))
    // untouched partitions are fully live
    assert(back.filter(col("g") === 0).count() == 40)
  }

  test("deletion vectors: u-storage and inline DVs mask rows inside the scan") {
    val t = tmp("dv.delta")
    import spark.implicits._
    val df = spark.range(0, 200).select(
      col("id"), (col("id") % 7).as("m"),
      concat(lit("r"), col("id")).as("s"))
      .repartitionByRange(4, col("id"))
    DeltaLake.toDelta(df, t)
    val v = DeltaLake.foreignDeleteRows(spark, t, col("m") === 3)
    assert(v == 1L)
    val back = DeltaLake.fromDelta(spark, t)
    assert(back.count() == 200 - 200 / 7 - 1) // 29 ids with id%7==3
    assert(back.filter(col("m") === 3).count() == 0)
    assert(back.filter(col("id") === 4).count() == 1) // neighbors survive
    // time travel BEFORE the delete still sees every row
    assert(DeltaLake.fromDelta(spark, t, Some(0L)).count() == 200)
    // stats skipping composes with the DV filter
    val f = DeltaLake.fromDelta(spark, t, None, Some(col("id") <= 50))
    assert(f.count() == 51 - 7) // ids 3,10,...,45 deleted within 0..50
    // inline storage type on a fresh generation
    val t2 = tmp("dvi.delta")
    DeltaLake.toDelta(df, t2)
    DeltaLake.foreignDeleteRows(spark, t2, col("id") < 10, inline = true)
    assert(DeltaLake.fromDelta(spark, t2).count() == 190)
    assert(DeltaLake.fromDelta(spark, t2).agg(min("id")).head.getLong(0) == 10L)
  }

  test("deletion vectors: incremental tail and writes reject loudly; vacuum spares DV files") {
    val t = tmp("dvg.delta")
    import spark.implicits._
    val df = spark.range(0, 60).select(col("id"), (col("id") % 3).as("m"))
      .coalesce(2)
    DeltaLake.toDelta(df, t)
    DeltaLake.foreignDeleteRows(spark, t, col("m") === 1)
    // fromDeltaChanges across the DV commit is NOT append-only
    val e1 = intercept[IllegalArgumentException] {
      DeltaLake.fromDeltaChanges(spark, t, -1L).collect()
    }
    // (the commit's dataChange=true remove or its DV add — whichever
    // the line order surfaces first — both reject with this phrase)
    assert(e1.getMessage.contains("not append-only"))
    // r17: overwrite + maintenance WORK on DV tables (the full-write
    // battery is pinned in the DV-emitting deleteWhere spec); vacuum
    // only sweeps .parquet here — the referenced DV .bin survives and
    // the table still reads
    DeltaLake.vacuum(spark, t, retainVersions = 1, dryRun = false)
    assert(DeltaLake.fromDelta(spark, t).count() == 40)
    DeltaLake.toDelta(df, t, "overwrite") // descriptors on tombstones
    assert(DeltaLake.fromDelta(spark, t).count() == 60)
  }

  test("concurrent-commit race: two writers, one version — one wins, one is loud") {
    val t = tmp("race.delta")
    import spark.implicits._
    DeltaLake.toDelta(Seq((1L, "a")).toDF("id", "s"), t) // v0
    // two appenders race through the PUBLIC write path: both snapshot
    // v0, both stage, both try to claim v1. The per-table commit
    // monitor makes the outcome deterministic: exactly one success,
    // one loud "concurrent writer" failure — never a silent
    // lost-update (local-fs rename REPLACES, so without the atomic
    // claim the loser would overwrite the winner's commit).
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[String, Unit]]()
    val threads = Seq("x", "y").map { tag =>
      new Thread(() => {
        val df = Seq((2L, tag)).toDF("id", "s")
        barrier.await()
        try {
          DeltaLake.toDelta(df, t, "append")
          results.add(Right(()))
        } catch {
          case e: IllegalArgumentException => results.add(Left(e.getMessage))
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    val (losers, winners) = results.toArray(Array.empty[Either[String, Unit]])
      .partition(_.isLeft)
    assert(winners.length == 1 && losers.length == 1, results.toString)
    assert(losers.head.swap.toOption.get.contains("concurrent writer"))
    // the committed table is the WINNER's state, intact and readable:
    // exactly one append landed, history is v0, v1
    val back = DeltaLake.fromDelta(spark, t)
    assert(back.count() == 2)
    assert(DeltaLake.latestVersion(t) == 1L)
    // no staged files linger (attempt-unique staging subdirs cleaned)
    assert(!FsIO.exists(s"$t/_staging") ||
      FsIO.listFilesRecursive(s"$t/_staging").isEmpty)
  }

  test("replay is order-independent inside a commit: add-before-remove keeps the file") {
    val t = tmp("ord.delta")
    import spark.implicits._
    val df = spark.range(0, 40).select(col("id"),
      concat(lit("s"), col("id")).as("s")).coalesce(1)
    DeltaLake.toDelta(df, t) // v0
    DeltaLake.foreignDeleteRows(spark, t, col("id") < 10) // v1: remove+add
    // REWRITE v1 with the add line BEFORE the remove line — a legal
    // foreign serialization (the spec reconciles order-independently);
    // line-order application would silently drop the whole file
    val v1 = f"$t/_delta_log/${1L}%020d.json"
    val lines = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(v1)), StandardCharsets.UTF_8)
      .split('\n').filter(_.nonEmpty)
    val (adds, rest) = lines.partition(_.contains("\"add\""))
    assert(adds.nonEmpty && rest.exists(_.contains("\"remove\"")))
    java.nio.file.Files.write(java.nio.file.Paths.get(v1),
      ((adds ++ rest).mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    val back = DeltaLake.fromDelta(spark, t)
    assert(back.count() == 30) // file present, DV applied
    assert(back.agg(min("id")).head.getLong(0) == 10L)
  }

  test("DV paths that percent-encode in _metadata (spaces) still read") {
    val t = tmp("sp.delta")
    import spark.implicits._
    // partition value with a space -> data file dir 'k=a b' -> the
    // scan renders file:/.../k=a%20b/... in _metadata.file_path; the
    // spelling table must bridge it (the r15 review's finding: the
    // old regex normalization crashed loudly on every row here)
    val df = spark.range(0, 60).select(col("id"),
      when(col("id") % 2 === 0, "a b").otherwise("plain").as("k"))
    DeltaLake.toDelta(df, t, partitionBy = Seq("k"))
    DeltaLake.foreignDeleteRows(spark, t, col("id") < 20)
    val back = DeltaLake.fromDelta(spark, t)
    assert(back.count() == 40)
    assert(back.filter(col("k") === "a b").count() == 20)
    assert(back.agg(min("id")).head.getLong(0) == 20L)
  }

  test("fromDeltaChanges rejects a schema change inside the range") {
    val t = tmp("cdcdrift.delta")
    import spark.implicits._
    DeltaLake.toDelta(Seq((1L, "a")).toDF("id", "s").coalesce(1), t)           // v0
    DeltaLake.toDelta(Seq((2L, "b")).toDF("id", "s").coalesce(1), t, "append") // v1
    // foreign schema evolution: hand-write v2 as a metaData-only
    // commit whose schemaString renames column s -> t (our own
    // writer rejects drift, so forge the commit like a DBR would)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val v0 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(f"$t/_delta_log/${0L}%020d.json")),
      StandardCharsets.UTF_8)
    val metaLine = v0.split('\n').find(_.contains("\"metaData\"")).get
    val node = om.readTree(metaLine)
    val md = node.get("metaData").asInstanceOf[
      com.fasterxml.jackson.databind.node.ObjectNode]
    md.put("schemaString",
      md.get("schemaString").asText().replace("\"s\"", "\"t\""))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(f"$t/_delta_log/${2L}%020d.json"),
      (om.writeValueAsString(node) + "\n").getBytes(StandardCharsets.UTF_8))
    // snapshot at latest reads with the renamed schema (full reads OK)
    assert(DeltaLake.fromDelta(spark, t).columns.toSeq == Seq("id", "t"))
    // but an incremental pull across the change would read v0/v1 adds
    // with the NEW schema (silent NULL for the renamed column) — loud
    val e1 = intercept[IllegalArgumentException] {
      DeltaLake.fromDeltaChanges(spark, t, -1L).collect()
    }
    assert(e1.getMessage.contains("schema"))
    val e2 = intercept[IllegalArgumentException] {
      DeltaLake.fromDeltaChanges(spark, t, 0L).collect()
    }
    assert(e2.getMessage.contains("schema"))
    // a range entirely after the change is fine (and empty here)
    assert(DeltaLake.fromDeltaChanges(spark, t, 2L).count() == 0)
    // and a range entirely before it is fine too
    assert(DeltaLake.fromDeltaChanges(spark, t, 0L, Some(1L)).count() == 1)
  }

  test("renameColumn: metadata-only, upgrades plain tables to column mapping") {
    val t = tmp("ren.delta")
    import spark.implicits._
    val df = spark.range(0, 60).select(
      col("id"), (col("id") % 4).cast("int").as("grp"),
      concat(lit("v"), col("id")).as("label"))
      .repartitionByRange(3, col("id"))
    DeltaLake.toDelta(df, t, partitionBy = Seq("grp"))                   // v0
    val filesBefore = DeltaLake.fromDelta(spark, t).inputFiles.toSet
    val v = DeltaLake.renameColumn(spark, t, "label", "title")           // v1
    assert(v == 1L)
    val back = DeltaLake.fromDelta(spark, t)
    assert(back.columns.toSeq == Seq("id", "grp", "title"))
    assert(back.filter(col("id") === 42).select("title").head.getString(0)
      == "v42")
    // METADATA-ONLY: same data files; they still carry the OLD name
    assert(back.inputFiles.toSet == filesBefore)
    assert(spark.read.parquet(filesBefore.head).columns.contains("label"))
    // stats skipping survives (stats keys are physical = old names)
    assert(DeltaLake.fromDelta(spark, t, None, Some(col("id") <= 10))
      .inputFiles.length < filesBefore.size)
    // protocol upgraded to the column-mapping era
    val proto = DeltaLake.tableProtocol(spark, t)
    assert(proto._1 >= 2 && proto._2 >= 5, proto.toString)
    // renaming a PARTITION column updates partitionColumns (logical)
    DeltaLake.renameColumn(spark, t, "grp", "bucket")                    // v2
    val back2 = DeltaLake.fromDelta(spark, t)
    assert(back2.filter(col("bucket") === 3).count() == 15)
    // pruning on the renamed partition column still works
    assert(DeltaLake.fromDelta(spark, t, None, Some(col("bucket") === 3))
      .inputFiles.length < back2.inputFiles.length)
    // the table stays fully writable after the upgrade
    DeltaLake.toDelta(spark.range(100, 110).select(
      col("id"), (col("id") % 4).cast("int").as("bucket"),
      concat(lit("n"), col("id")).as("title")), t, "append",
      partitionBy = Seq("bucket"))
    assert(DeltaLake.fromDelta(spark, t).count() == 70)
    DeltaLake.deleteWhere(spark, t, col("title") === "n105")
    assert(DeltaLake.fromDelta(spark, t).count() == 69)
    // time travel BEFORE the rename serves the old names
    assert(DeltaLake.fromDelta(spark, t, Some(0L)).columns.toSeq ==
      Seq("id", "grp", "label"))
    // guards: unknown/duplicate (case-INSENSITIVE)/illegal names
    intercept[IllegalArgumentException](
      DeltaLake.renameColumn(spark, t, "nope", "x"))
    intercept[IllegalArgumentException](
      DeltaLake.renameColumn(spark, t, "id", "title"))
    intercept[IllegalArgumentException](
      DeltaLake.renameColumn(spark, t, "id", "TITLE"))
    intercept[IllegalArgumentException](
      DeltaLake.renameColumn(spark, t, "id", "a.b"))
    // a CHECK constraint referencing the column rejects the rename;
    // a foreign `name` in the metaData survives the rewrite verbatim
    val tn = tmp("renn.delta")
    DeltaLake.toDelta(df, tn)
    val v0p = java.nio.file.Paths.get(f"$tn/_delta_log/${0L}%020d.json")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val edited = new String(java.nio.file.Files.readAllBytes(v0p),
      StandardCharsets.UTF_8).linesIterator.map { line =>
      val n = mapper.readTree(line)
      if (n.has("metaData")) {
        val md = n.get("metaData")
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        md.put("name", "mytable")
        md.putObject("configuration")
          .put("delta.constraints.c1", "label IS NOT NULL")
        mapper.writeValueAsString(n)
      } else line
    }.mkString("\n") + "\n"
    java.nio.file.Files.write(v0p, edited.getBytes(StandardCharsets.UTF_8))
    val ec = intercept[IllegalArgumentException](
      DeltaLake.renameColumn(spark, tn, "label", "txt"))
    assert(ec.getMessage.contains("constraint"))
    DeltaLake.renameColumn(spark, tn, "grp", "bucket") // no constraint ref
    val v1txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(f"$tn/_delta_log/${1L}%020d.json")),
      StandardCharsets.UTF_8)
    assert(v1txt.contains("\"name\":\"mytable\""), v1txt.take(300))
    // renaming on an ALREADY column-mapped (foreign) table keeps the
    // foreign physical names
    val tf = tmp("renf.delta")
    DeltaLake.foreignColumnMapped(df, tf,
      Map("id" -> "col-a", "grp" -> "col-b", "label" -> "col-c"))
    DeltaLake.renameColumn(spark, tf, "label", "name")
    val backF = DeltaLake.fromDelta(spark, tf)
    assert(backF.columns.toSeq == Seq("id", "grp", "name"))
    assert(backF.filter(col("id") === 7).select("name").head.getString(0)
      == "v7")
    // the reference guard PARSES: a constraint mentioning the column
    // only inside a STRING LITERAL must not block the rename, while a
    // genuine reference still does (r18, was a word-boundary regex)
    val tl = tmp("renlit.delta")
    DeltaLake.toDelta(df, tl)
    val v0l = java.nio.file.Paths.get(f"$tl/_delta_log/${0L}%020d.json")
    val editedL = new String(java.nio.file.Files.readAllBytes(v0l),
      StandardCharsets.UTF_8).linesIterator.map { line =>
      val n = mapper.readTree(line)
      if (n.has("metaData")) {
        n.get("metaData")
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          .putObject("configuration")
          .put("delta.constraints.c1", "id >= 0 AND 'label' <> 'grp x'")
        mapper.writeValueAsString(n)
      } else line
    }.mkString("\n") + "\n"
    java.nio.file.Files.write(v0l, editedL.getBytes(StandardCharsets.UTF_8))
    DeltaLake.renameColumn(spark, tl, "label", "txt") // literal only: OK
    assert(DeltaLake.fromDelta(spark, tl).columns.contains("txt"))
    val eg = intercept[IllegalArgumentException](
      DeltaLake.renameColumn(spark, tl, "id", "key"))
    assert(eg.getMessage.contains("constraint"))
    // generation expressions on NESTED struct fields are scanned too
    val tg = tmp("rengen.delta")
    val dfn = spark.range(0, 5).select(col("id"),
      struct(col("id").as("a"), (col("id") * 2).as("twice")).as("s"))
    DeltaLake.toDelta(dfn, tg)
    val v0g = java.nio.file.Paths.get(f"$tg/_delta_log/${0L}%020d.json")
    val editedG = new String(java.nio.file.Files.readAllBytes(v0g),
      StandardCharsets.UTF_8).linesIterator.map { line =>
      val n = mapper.readTree(line)
      if (n.has("metaData")) {
        val md = n.get("metaData")
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        val ss = mapper.readTree(md.get("schemaString").asText())
        // stamp a generationExpression on the NESTED field s.twice
        ss.get("fields").get(1).get("type").get("fields").get(1)
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          .putObject("metadata")
          .put("delta.generationExpression", "id * 2")
        md.put("schemaString", mapper.writeValueAsString(ss))
        mapper.writeValueAsString(n)
      } else line
    }.mkString("\n") + "\n"
    java.nio.file.Files.write(v0g, editedG.getBytes(StandardCharsets.UTF_8))
    val en = intercept[IllegalArgumentException](
      DeltaLake.renameColumn(spark, tg, "id", "key"))
    assert(en.getMessage.contains("s.twice"))
  }

  test("change data feed: cdc from upsert/delete, fromDeltaCdf, vacuum safety") {
    val t = tmp("cdf.delta")
    import spark.implicits._
    val df0 = spark.range(0, 20).select(col("id"),
      (col("id") % 4).as("g"), concat(lit("v"), col("id")).as("s"))
    DeltaLake.toDelta(df0, t)                // v0: plain insert commit
    DeltaLake.enableChangeDataFeed(spark, t) // v1: metadata + protocol
    assert(DeltaLake.tableProtocol(spark, t)._2 >= 4)
    // v2: upsert — ids 18,19 update; 20..22 insert
    val src = spark.range(18, 23).select(col("id"), lit(9L).as("g"),
      concat(lit("u"), col("id")).as("s"))
    DeltaLake.upsert(spark, t, src, Seq("id"))
    // v3: copy-on-write delete of g==1 (ids 1,5,9,13,17)
    DeltaLake.deleteWhere(spark, t, col("g") === 1)
    val cdf = DeltaLake.fromDeltaCdf(spark, t, 1)
    val v2 = cdf.filter(col("_commit_version") === 2)
    assert(v2.filter(col("_change_type") === "update_preimage").count() == 2)
    assert(v2.filter(col("_change_type") === "update_postimage").count() == 2)
    assert(v2.filter(col("_change_type") === "insert").count() == 3)
    assert(v2.filter(col("_change_type") === "update_preimage" &&
      col("id") === 18).select("s").head.getString(0) == "v18")
    assert(v2.filter(col("_change_type") === "update_postimage" &&
      col("id") === 18).select("s").head.getString(0) == "u18")
    val v3 = cdf.filter(col("_commit_version") === 3)
    assert(v3.count() == 5 &&
      v3.filter(col("_change_type") === "delete").count() == 5)
    assert(v3.select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 5L, 9L, 13L, 17L))
    // change files are INVISIBLE to normal reads
    assert(DeltaLake.fromDelta(spark, t).count() == 20 + 3 - 5)
    // fromDeltaChanges PREFERS cdc: the MERGE commit delivers its
    // genuine inserts instead of rejecting the rewrite
    val ch = DeltaLake.fromDeltaChanges(spark, t, 1, Some(2))
    assert(ch.count() == 3)
    assert(ch.select("id").as[Long].collect().sorted.toSeq ==
      Seq(20L, 21L, 22L))
    // commits WITHOUT cdc reconstruct: v0 append = inserts
    val cdf0 = DeltaLake.fromDeltaCdf(spark, t, -1, Some(0))
    assert(cdf0.filter(col("_change_type") === "insert").count() == 20)
    // vacuum never sweeps cdc files referenced by retained commits
    val swept = DeltaLake.vacuum(spark, t, retainVersions = 4, dryRun = true)
    assert(!swept.exists(_.contains("_change_data")), swept.mkString(","))
    // reconstruction delete shape: a CoW delete WITHOUT cdc (CDF
    // disabled table) reads the removed files' rows as full-file
    // delete+insert of the rewrite
    val t2 = tmp("cdf2.delta")
    DeltaLake.toDelta(df0, t2)
    DeltaLake.deleteWhere(spark, t2, col("id") === 3)
    val r2 = DeltaLake.fromDeltaCdf(spark, t2, 0, Some(1))
    // net change = deletes minus re-inserts == exactly row id 3
    assert(r2.filter(col("_change_type") === "delete").count() -
      r2.filter(col("_change_type") === "insert").count() == 1)
  }

  test("CDF on partitioned tables; foreign-shaped cdc actions read back") {
    val t = tmp("cdfp.delta")
    import spark.implicits._
    val df0 = spark.range(0, 40).select(col("id"),
      (col("id") % 4).cast("int").as("p"), concat(lit("v"), col("id")).as("s"))
    DeltaLake.toDelta(df0, t, partitionBy = Seq("p"))
    DeltaLake.enableChangeDataFeed(spark, t)
    // partitioned cdc staging: change files split by partition dirs,
    // partitionValues ride the cdc actions, readCdc re-injects them
    DeltaLake.deleteWhere(spark, t, col("id") % 10 === 3) // ids 3,13,23,33
    val cdf = DeltaLake.fromDeltaCdf(spark, t, 1)
    assert(cdf.count() == 4)
    assert(cdf.select("id").as[Long].collect().sorted.toSeq ==
      Seq(3L, 13L, 23L, 33L))
    // the partition column comes back typed from partitionValues
    assert(cdf.filter(col("id") === 13).select("p").head.getInt(0) == 1)
    assert(cdf.schema("p").dataType == IntegerType)
    // upsert on the partitioned CDF table
    DeltaLake.upsert(spark, t,
      Seq((2L, 2, "u2"), (200L, 0, "u200")).toDF("id", "p", "s"), Seq("id"))
    val v3 = DeltaLake.fromDeltaCdf(spark, t, 2, Some(3))
    assert(v3.filter(col("_change_type") === "update_preimage").count() == 1)
    assert(v3.filter(col("_change_type") === "insert").count() == 1)
    assert(v3.filter(col("_change_type") === "update_postimage" &&
      col("id") === 2).select("p").head.getInt(0) == 2)
    // FOREIGN-shaped cdc: hand-written action json referencing
    // hand-written change parquet (no graft writer on this path)
    val tf = tmp("cdff.delta")
    DeltaLake.toDelta(spark.range(0, 5).select(col("id"),
      concat(lit("v"), col("id")).as("s")), tf)
    val chDir = s"$tf/_change_data"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(chDir))
    spark.createDataFrame(java.util.Arrays.asList(
        Row(99L, "zz", "insert"), Row(1L, "v1", "delete")),
      StructType(Seq(StructField("id", LongType),
        StructField("s", StringType),
        StructField("_change_type", StringType))))
      .coalesce(1).write.mode("overwrite").parquet(s"$chDir/tmp")
    val part = FsIO.listFilesRecursive(s"$chDir/tmp")
      .filter(_._1.endsWith(".parquet")).head
    val relCdc = "_change_data/cdc-foreign.parquet"
    FsIO.rename(part._1, s"$tf/$relCdc")
    FsIO.deleteRecursive(s"$chDir/tmp")
    // the foreign commit: the cdc action is authoritative for CDF
    writeLog(tf, 1L, Seq(
      s"""{"cdc":{"path":"$relCdc","partitionValues":{},"size":${part._2},"dataChange":false}}""",
      s"""{"commitInfo":{"operation":"MERGE","timestamp":1}}"""))
    val fcdf = DeltaLake.fromDeltaCdf(spark, tf, 0, Some(1))
    assert(fcdf.count() == 2)
    assert(fcdf.filter(col("_change_type") === "insert")
      .select("id").as[Long].head() == 99L)
    assert(fcdf.filter(col("_change_type") === "delete")
      .select("s").head.getString(0) == "v1")
    // the plain changes tail prefers the cdc inserts
    assert(DeltaLake.fromDeltaChanges(spark, tf, 0, Some(1))
      .select("id").as[Long].collect().toSeq == Seq(99L))
  }

  test("deleteWhereDv existing-DV driver bytes cap is loud") {
    val t = tmp("dvcap.delta")
    import spark.implicits._
    DeltaLake.toDelta(spark.range(0, 1000).select(col("id"),
      (col("id") % 7).as("g")), t)
    // first DV delete creates descriptors
    DeltaLake.deleteWhere(spark, t, col("g") === 1, viaDeletionVectors = true)
    assert(DeltaLake.fromDelta(spark, t).count() < 1000)
    // second delete must total the EXISTING descriptors' bytes against
    // the cap before loading any of them
    spark.conf.set("spark.graft.dv.maxExistingDvBytes", "1")
    try {
      val e = intercept[IllegalArgumentException](
        DeltaLake.deleteWhere(spark, t, col("g") === 2,
          viaDeletionVectors = true))
      assert(e.getMessage.contains("maxExistingDvBytes"))
    } finally spark.conf.unset("spark.graft.dv.maxExistingDvBytes")
    // with the default cap the delete proceeds
    DeltaLake.deleteWhere(spark, t, col("g") === 2, viaDeletionVectors = true)
    assert(DeltaLake.fromDelta(spark, t)
      .filter(col("g") === 2).count() == 0)
  }

  test("restore rolls the current state back as a new commit, history intact") {
    val t = tmp("rst.delta")
    import spark.implicits._
    DeltaLake.toDelta(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t)           // v0
    DeltaLake.toDelta(Seq((3L, "c")).toDF("id", "s"), t, mode = "append")     // v1
    DeltaLake.toDelta(Seq((9L, "z")).toDF("id", "s"), t, mode = "overwrite")  // v2
    val v = DeltaLake.restore(spark, t, 1L)                                   // v3 == v1 state
    assert(v == 3L)
    def ids(ver: Option[Long]) = DeltaLake.fromDelta(spark, t, ver)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(None) == Seq(1L, 2L, 3L))
    assert(ids(Some(2L)) == Seq(9L)) // the overwrite is still travelable
    // metadata-only: the restore commit re-adds v1's files verbatim
    val commit = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(f"$t/_delta_log/${3L}%020d.json")),
      StandardCharsets.UTF_8)
    assert(commit.contains("\"RESTORE\""))
    // stats ride along on the re-adds (skipping still works)
    assert(DeltaLake.fromDelta(spark, t, None, Some(col("id") === 3L))
      .count() == 1)
    // restoring past vacuumed files is loud
    DeltaLake.vacuum(spark, t, retainVersions = 1, dryRun = false)
    val e = intercept[IllegalArgumentException] {
      DeltaLake.restore(spark, t, 2L)
    }
    assert(e.getMessage.contains("vacuumed"))
  }

  test("restore on DV tables swaps deletion vectors (file version = path + dv)") {
    val t = tmp("rstdv.delta")
    import spark.implicits._
    val df = spark.range(0, 100).select(col("id"), (col("id") % 7).as("m"))
      .coalesce(1)
    DeltaLake.toDelta(df, t)                                              // v0
    DeltaLake.deleteWhere(spark, t, col("m") === 3,
      viaDeletionVectors = true)                                          // v1
    DeltaLake.deleteWhere(spark, t, col("m") === 5,
      viaDeletionVectors = true)                                          // v2
    assert(DeltaLake.fromDelta(spark, t).count() ==
      (0L until 100L).count(i => i % 7 != 3 && i % 7 != 5))
    // restore to v1: the SAME data path must come back under v1's DV
    // (remove the v2 descriptor version, re-add the v1 one)
    val v = DeltaLake.restore(spark, t, 1L)                               // v3
    assert(v == 3L)
    val back = DeltaLake.fromDelta(spark, t)
    assert(back.count() == (0L until 100L).count(_ % 7 != 3))
    assert(back.filter(col("m") === 5).count() ==
      (0L until 100L).count(i => i % 7 == 5))
    // the restore commit carries the descriptor on BOTH sides
    val commit = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(f"$t/_delta_log/${3L}%020d.json")),
      StandardCharsets.UTF_8)
    val addLine = commit.linesIterator.find(_.contains("\"add\"")).get
    val rmLine = commit.linesIterator.find(_.contains("\"remove\"")).get
    assert(addLine.contains("\"deletionVector\""))
    assert(rmLine.contains("\"deletionVector\""))
    // restore to v0 (no DVs at all): full row set returns
    DeltaLake.restore(spark, t, 0L)                                       // v4
    assert(DeltaLake.fromDelta(spark, t).count() == 100)
    // a restore whose target's .bin is GONE is loud (the DV twin of
    // the vacuumed-data-file check)
    FsIO.listFilesRecursive(t).collect {
      case (p, _, _) if p.endsWith(".bin") => FsIO.deleteRecursive(p) }
    val e2 = intercept[IllegalArgumentException](
      DeltaLake.restore(spark, t, 2L))
    assert(e2.getMessage.contains("deletion vector"), e2.getMessage)
  }

  test("Readers.open / Export.export dispatch .delta; log-presence fallback") {
    val t = tmp("d.delta")
    import spark.implicits._
    Export.export(Seq((7L, 0.5)).toDF("id", "v"), t)
    assert(Readers.open(spark, t).count() == 1L)
    // a table named WITHOUT .delta still opens via the _delta_log probe
    val plain = tmp("plainTable")
    DeltaLake.toDelta(Seq(Tuple1(3L)).toDF("id"), plain)
    assert(Readers.open(spark, plain).count() == 1L)
  }
}
