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
    // staging hygiene: promoted, then removed
    assert(!FsIO.exists(s"$t/_staging"))
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
    val e2 = intercept[IllegalArgumentException] {
      DeltaLake.fromDelta(spark, mk(
        """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}"""))
    }
    assert(e2.getMessage.contains("minReaderVersion 2"))
    val e3 = intercept[IllegalArgumentException] {
      DeltaLake.fromDelta(spark, mk(
        """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
          """"readerFeatures":["deletionVectors"]}}"""))
    }
    assert(e3.getMessage.contains("deletionVectors"))
    val ok = mk(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["timestampNtz"]}}""")
    assert(DeltaLake.fromDelta(spark, ok).count() == 1L)
    // column mapping rejects through metaData configuration
    val cm = tmp("cm.delta")
    writeLog(cm, 0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},"schemaString":${com.fasterxml.jackson.databind.node.JsonNodeFactory.instance.textNode(schemaJson).toString},"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name"},"createdTime":0}}"""))
    val e4 = intercept[IllegalArgumentException] { DeltaLake.fromDelta(spark, cm) }
    assert(e4.getMessage.contains("columnMapping"))
  }

  test("deletion vectors on add actions reject; multi-part checkpoints reject") {
    import spark.implicits._
    val t = tmp("dv.delta")
    DeltaLake.toDelta(Seq(Tuple1(1L)).toDF("id"), t)
    writeLog(t, 1L, Seq(
      """{"add":{"path":"x.parquet","partitionValues":{},"size":1,""" +
        """"modificationTime":0,"dataChange":true,"deletionVector":""" +
        """{"storageType":"u","pathOrInlineDv":"a","offset":1,"sizeInBytes":1,"cardinality":1}}}"""))
    val e = intercept[IllegalArgumentException] { DeltaLake.fromDelta(spark, t) }
    assert(e.getMessage.contains("deletion vector"))
    // multi-part checkpoint that would be REQUIRED to bridge -> loud
    val m = tmp("mp.delta")
    DeltaLake.toDelta(Seq(Tuple1(1L)).toDF("id"), m)
    DeltaLake.toDelta(Seq(Tuple1(2L)).toDF("id"), m, mode = "append")
    val log = s"$m/_delta_log"
    val part = f"$log/${1L}%020d.checkpoint.${0}%010d.${2}%010d.parquet"
    val out = FsIO.create(part); out.close()
    FsIO.deleteRecursive(f"$log/${0L}%020d.json")
    FsIO.deleteRecursive(f"$log/${1L}%020d.json")
    val e5 = intercept[IllegalArgumentException] {
      DeltaLake.fromDelta(spark, m) // wait: latest json gone too -> v1 via cp name
    }
    assert(e5.getMessage.contains("multi-part"))
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
