package graft

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.functions._
import graft.sources.{DeltaLake, FsIO, Iceberg}

/** Corruption behavior of the lakehouse log parsers: damaged
  * transaction logs / metadata chains must fail LOUDLY (a parse
  * error naming the file), never hang, never silently serve partial
  * data. (JSON logs carry no checksums, so a byte flip inside a
  * string VALUE is undetectable by any reader — the loud-failure
  * contract covers structural damage, the realistic failure mode of
  * torn writes and truncated uploads.) */
class LakehouseCorruptionSpec extends SparkSpec {

  private def tmp(leaf: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_corrupt").toString
    s"$d/$leaf"
  }

  private def overwrite(path: String, bytes: Array[Byte]): Unit = {
    val out = FsIO.create(path)
    try out.write(bytes) finally out.close()
  }

  private def readBytes(path: String): Array[Byte] = {
    val in = FsIO.open(path)
    try in.readAllBytes() finally in.close()
  }

  test("delta: structural log damage is loud; originals keep reading") {
    import spark.implicits._
    val t = tmp("t.delta")
    DeltaLake.toDelta(Seq((1L, "a")).toDF("id", "s"), t)
    DeltaLake.toDelta(Seq((2L, "b")).toDF("id", "s"), t, mode = "append")
    DeltaLake.toDelta(Seq((3L, "c")).toDF("id", "s"), t, mode = "append")
    val v1 = f"$t/_delta_log/${1L}%020d.json"
    val good = readBytes(v1)

    // invalid JSON line
    overwrite(v1, "{\"add\": not json}\n".getBytes(StandardCharsets.UTF_8))
    intercept[Exception] { DeltaLake.fromDelta(spark, t).collect() }
    // truncated mid-record
    overwrite(v1, good.take(good.length / 2))
    intercept[Exception] { DeltaLake.fromDelta(spark, t).collect() }
    // add action without a path
    overwrite(v1, ("""{"add":{"partitionValues":{},"size":1,""" +
      """"modificationTime":0,"dataChange":true}}""" + "\n")
      .getBytes(StandardCharsets.UTF_8))
    intercept[Exception] { DeltaLake.fromDelta(spark, t).collect() }
    // restore -> reads recover fully (no cached corruption)
    overwrite(v1, good)
    assert(DeltaLake.fromDelta(spark, t).count() == 3)

    // a MID-CHAIN gap is loud (a deleted TAIL commit is legitimately
    // indistinguishable from "never committed" — listing is truth)
    FsIO.deleteRecursive(v1)
    val e = intercept[IllegalArgumentException] {
      DeltaLake.fromDelta(spark, t).collect()
    }
    assert(e.getMessage.contains("missing commit"))
  }

  test("delta: corrupt checkpoint parquet is loud; garbage stats degrade to no skipping") {
    import spark.implicits._
    val t = tmp("cp.delta")
    DeltaLake.toDelta(Seq((1L, "a")).toDF("id", "s"), t)
    DeltaLake.toDelta(Seq((2L, "b")).toDF("id", "s"), t,
      mode = "append", checkpointInterval = 2)
    DeltaLake.toDelta(Seq((3L, "c")).toDF("id", "s"), t,
      mode = "append", checkpointInterval = 2) // v2 -> checkpoint
    val cp = f"$t/_delta_log/${2L}%020d.checkpoint.parquet"
    assert(FsIO.exists(cp))
    val good = readBytes(cp)
    overwrite(cp, good.take(good.length / 3)) // torn checkpoint
    // force checkpoint resolution by dropping the compacted jsons
    FsIO.deleteRecursive(f"$t/_delta_log/${0L}%020d.json")
    FsIO.deleteRecursive(f"$t/_delta_log/${1L}%020d.json")
    intercept[Exception] { DeltaLake.fromDelta(spark, t).collect() }
    overwrite(cp, good)
    assert(DeltaLake.fromDelta(spark, t).count() == 3)
    // stats JSON that is garbage must NOT break predicate reads —
    // mightMatch parses defensively and keeps the file
    val t2 = tmp("st.delta")
    DeltaLake.toDelta(Seq((5L, "x")).toDF("id", "s"), t2)
    val c0 = f"$t2/_delta_log/${0L}%020d.json"
    // rewrite through the JSON layer (the stats string is ESCAPED in
    // the log line — a byte-level regex silently fails to match)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val lines = new String(readBytes(c0), StandardCharsets.UTF_8)
      .split("\n").map { line =>
        if (!line.contains("\"add\"")) line
        else {
          val n = mapper.readTree(line)
          val add = n.get("add").asInstanceOf[
            com.fasterxml.jackson.databind.node.ObjectNode]
          assert(add.hasNonNull("stats"), "fixture must carry stats")
          add.put("stats", "NOT JSON AT ALL")
          mapper.writeValueAsString(n)
        }
      }
    overwrite(c0, (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    val got = DeltaLake.fromDelta(spark, t2, None, Some(col("id") === 5L))
    assert(got.collect().map(_.getLong(0)).toSeq == Seq(5L))
  }

  test("iceberg: damaged metadata / manifests are loud; originals recover") {
    import spark.implicits._
    val t = tmp("t.iceberg")
    Iceberg.toIceberg(Seq((1L, 0.5)).toDF("id", "v"), t)
    val mdir = s"$t/metadata"
    val metaFile = FsIO.listFileNames(mdir).filter(_.endsWith(".metadata.json")).head
    val metaPath = s"$mdir/$metaFile"
    val goodMeta = readBytes(metaPath)
    // garbage metadata json
    overwrite(metaPath, "{]".getBytes(StandardCharsets.UTF_8))
    intercept[Exception] { Iceberg.fromIceberg(spark, t).collect() }
    overwrite(metaPath, goodMeta)
    assert(Iceberg.fromIceberg(spark, t).count() == 1)
    // truncated manifest avro
    val manifest = FsIO.listFileNames(mdir).find(_.startsWith("graft-m-")).get
    val mPath = s"$mdir/$manifest"
    val goodM = readBytes(mPath)
    overwrite(mPath, goodM.take(goodM.length / 2))
    intercept[Exception] { Iceberg.fromIceberg(spark, t).collect() }
    overwrite(mPath, goodM)
    assert(Iceberg.fromIceberg(spark, t).count() == 1)
    // manifest list pointing at a missing manifest
    FsIO.deleteRecursive(mPath)
    intercept[Exception] { Iceberg.fromIceberg(spark, t).collect() }
  }
}
