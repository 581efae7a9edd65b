package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{Export, Tables}

/** Round-trip tests for the export/source surface. */
class ExportSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_$name").toFile
    d.deleteOnExit()
    s"${d.getAbsolutePath}/$name"
  }

  private lazy val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5))
    .toDF("id", "k", "v")

  test("parquet round-trip preserves schema and rows") {
    val p = tmp("rt.parquet")
    Export.export(df, p)
    val back = spark.read.parquet(p)
    // parquet reads back everything nullable; compare names+types
    assert(back.schema.map(f => (f.name, f.dataType)) == df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("csv round-trip with header") {
    val p = tmp("rt.csv")
    Export.export(df, p)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(p)
    assert(back.count() == 3)
    assert(back.columns.toSeq == Seq("id", "k", "v"))
  }

  test("json round-trip") {
    val p = tmp("rt.json")
    Export.export(df, p)
    assert(spark.read.json(p).count() == 3)
  }

  test("partitioned export writes hive key=value layout and prunes on read") {
    val p = tmp("part")
    Export.exportPartitioned(df, p, Seq("k"))
    val dirs = new java.io.File(p).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("k=a", "k=b"))
    val pruned = spark.read.parquet(p).where(col("k") === "a")
    assert(pruned.count() == 2)
    // partition pruning visible in the plan
    val plan = pruned.queryExecution.executedPlan.toString
    assert(!plan.contains("k=b"))
  }

  test("sharded export produces the requested file count") {
    val p = tmp("shards")
    Export.exportMany(df, p, 3)
    val parts = new java.io.File(p).listFiles().count(f => f.getName.startsWith("part-"))
    assert(parts == 3)
  }

  test("fromColumns builds a frame from driver-side arrays") {
    val d = Export.fromColumns(spark,
      "x" -> Seq(1L, 2L, null),
      "s" -> Seq("a", null, "c"))
    assert(d.count() == 3)
    assert(d.where("x IS NULL").count() == 1)
    assert(d.schema("x").dataType == org.apache.spark.sql.types.LongType)
  }

  test("vrange and vconstant are generated sources") {
    assert(Export.vrange(spark, 0, 10).agg(sum("x")).head.getLong(0) == 45L)
    assert(Export.vconstant(spark, 2.5, 4).agg(sum("x")).head.getDouble(0) == 10.0)
  }

  test("withRowIndex assigns 0-based contiguous indices") {
    val d = Tables.withRowIndex(Seq("a", "b", "c").toDF("s"))
    assert(d.select("row_index").collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L, 2L))
  }

  test("fromAscii parses whitespace table with header") {
    val d = java.nio.file.Files.createTempDirectory("graft_ascii")
    val f = d.resolve("t.txt")
    java.nio.file.Files.writeString(f, "x y name\n1.5 2 alpha\n3.25 4 beta\n")
    val got = Export.fromAscii(spark, f.toString)
    assert(got.columns.toSeq == Seq("x", "y", "name"))
    assert(got.agg(sum("x")).head.getDouble(0) == 4.75)
    assert(got.where("name = 'beta'").count() == 1)
  }

  test("fromAscii: irregular whitespace header, ragged lines, header-only file") {
    val d = java.nio.file.Files.createTempDirectory("graft_ascii2")
    val f = d.resolve("t.txt")
    // header with irregular spacing must still be dropped; ragged line dropped
    java.nio.file.Files.writeString(f, "x   y \t name\n1.5 2 alpha\nbadline\n3.25 4 beta\n")
    val got = sources.Export.fromAscii(spark, f.toString)
    assert(got.count() == 2)
    assert(got.agg(sum("x")).head.getDouble(0) == 4.75)
    val h = d.resolve("headeronly.txt")
    java.nio.file.Files.writeString(h, "a b c\n")
    val empty = sources.Export.fromAscii(spark, h.toString)
    assert(empty.columns.toSeq == Seq("a", "b", "c") && empty.count() == 0)
  }

  test("toAscii round-trips nulls as NaN and rejects whitespace strings") {
    val d = java.nio.file.Files.createTempDirectory("graft_ascii3")
    val p = d.resolve("t_ascii").toString
    val src = Seq((1.0: java.lang.Double, "alpha"), (null: java.lang.Double, "beta"),
      (3.0: java.lang.Double, null)).toDF("x", "name")
    sources.Export.toAscii(src, p)
    val got = sources.Export.fromAscii(spark, p)
    // no row lost: the null x row comes back as NaN, null string as literal
    assert(got.count() == 3)
    assert(got.where(isnan(col("x"))).count() == 1)
    assert(got.where("name = 'NaN'").count() == 1)
    assert(got.where("name = 'beta'").select("x").head.isNullAt(0) == false)
    // a string cell with embedded whitespace cannot survive the format:
    // raise inline instead of writing a ragged line that reads back short
    val bad = Seq((1.0, "two words")).toDF("x", "name")
    val e = intercept[Exception](
      sources.Export.toAscii(bad, d.resolve("bad").toString))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("whitespace")))
  }

  test("Readers.open dispatches by extension and convert caches to parquet") {
    val d = java.nio.file.Files.createTempDirectory("graft_open")
    val csvDir = d.resolve("t.csv").toString
    df.write.option("header", "true").csv(csvDir)
    val direct = sources.Readers.open(spark, csvDir)
    assert(direct.count() == 3 && direct.schema("id").dataType == org.apache.spark.sql.types.IntegerType)
    val cache = d.resolve("t_conv.parquet").toString
    val converted = sources.Readers.open(spark, csvDir, convert = Some(cache))
    assert(converted.count() == 3)
    assert(new java.io.File(cache).exists())
    // second open must hit the cache (mutate the csv, reread: unchanged)
    df.limit(1).write.mode("overwrite").option("header", "true").csv(csvDir)
    assert(sources.Readers.open(spark, csvDir, convert = Some(cache)).count() == 3)
  }

  test("fromCsv with explicit schema skips inference") {
    val d = java.nio.file.Files.createTempDirectory("graft_csvschema")
    val p = d.resolve("s.csv").toString
    df.write.option("header", "true").csv(p)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType)))
    val got = sources.Readers.fromCsv(spark, p, schema = Some(schema))
    assert(got.schema("id").dataType == org.apache.spark.sql.types.LongType)
    assert(got.agg(sum("v")).head.getDouble(0) == 7.5)
  }

  test("openMany / glob open concatenates custom-format shards") {
    val d = java.nio.file.Files.createTempDirectory("graft_openmany")
    // three hdf5 shards with a schema drift: shard 2 lacks column v
    // (flexible resolver -> null there), shard order is by file name
    val parts = Seq(
      Seq((1L, "a", 1.5), (2L, "b", 2.5)),
      Seq((3L, "c", 3.5)),
      Seq((4L, "d", 4.5), (5L, "e", 5.5)))
    parts.zipWithIndex.foreach { case (rows, i) =>
      val frame =
        if (i == 1) rows.map(r => (r._1, r._2)).toDF("id", "k")
        else rows.toDF("id", "k", "v")
      sources.Hdf5.toHdf5(frame, d.resolve(f"part_$i%02d.hdf5").toString)
    }
    val glob = sources.Readers.open(spark, d.resolve("part_*.hdf5").toString)
    assert(glob.count() == 5)
    assert(glob.columns.toSet == Set("id", "k", "v"))
    assert(glob.where(col("v").isNull).select("id").collect().map(_.getLong(0)).toSeq == Seq(3L))
    assert(glob.agg(sum("id")).head.getLong(0) == 15L)
    // arrow shards through the same path
    Seq(Seq((10L, 1.0), (11L, 2.0)), Seq((12L, 3.0))).zipWithIndex.foreach { case (rows, i) =>
      sources.ArrowIpc.write(rows.toDF("id", "x"), d.resolve(s"emb_$i.arrow").toString)
    }
    val arrows = sources.Readers.open(spark, d.resolve("emb_*.arrow").toString)
    assert(arrows.count() == 3 && arrows.agg(sum("x")).head.getDouble(0) == 6.0)
    // no match -> clear error
    val err = intercept[IllegalArgumentException] {
      sources.Readers.open(spark, d.resolve("nope_*.hdf5").toString)
    }
    assert(err.getMessage.contains("matched no files"))
  }

  test("single-file csv/json exports round-trip incl. quoting edge cases") {
    val d = java.nio.file.Files.createTempDirectory("graft_singlefile")
    // quoting stress: separators, quotes, newlines, nulls, unicode
    val tricky = Seq(
      (1L, Option("plain"), Option(1.5)),
      (2L, Option("has,comma"), Option(-2.25)),
      (3L, Option("has\"quote"), Option.empty[Double]),
      (4L, Option("multi\nline"), Option(0.0)),
      (5L, Option.empty[String], Option(1e-7)),
      (6L, Option("ünïcode"), Option(123456.789)))
      .toDF("id", "s", "v")
    val csvPath = d.resolve("t.csv").toString
    sources.Export.toCsvFile(tricky, csvPath)
    assert(java.nio.file.Files.isRegularFile(java.nio.file.Paths.get(csvPath)))
    val csvBack = spark.read.schema(tricky.schema)
      .option("header", "true").option("multiLine", "true")
      .option("escape", "\"").csv(csvPath) // RFC 4180 doubled quotes
    assert(csvBack.orderBy("id").collect().toSeq == tricky.orderBy("id").collect().toSeq)
    val jsonPath = d.resolve("t.json").toString
    sources.Export.toJsonFile(tricky, jsonPath)
    val jsonBack = spark.read.schema(tricky.schema).json(jsonPath)
    assert(jsonBack.orderBy("id").collect().toSeq == tricky.orderBy("id").collect().toSeq)
  }

  test("export(path) dispatches every single-file format by extension") {
    val d = java.nio.file.Files.createTempDirectory("graft_expdisp")
    for (ext <- Seq("fits", "arrows", "txt", "hdf5", "arrow")) {
      val p = d.resolve(s"t.$ext").toString
      sources.Export.export(df, p)
      val back = sources.Readers.open(spark, p)
      assert(back.count() == 3, ext)
      assert(back.agg(sum("v")).head.getDouble(0) == 7.5, ext)
    }
  }

  test("state write/load round-trips through a file") {
    val f = java.nio.file.Files.createTempDirectory("graft_state").resolve("s.json")
    val configured = VxFrame(Seq((1.0, 2.0)).toDF("x", "y"))
      .withVirtualColumn("z", "x + y").filter("x > 0")
    configured.stateWrite(f.toString)
    val restored = VxFrame(Seq((5.0, 6.0)).toDF("x", "y")).stateLoad(f.toString)
    assert(restored.df.select("z").head.getDouble(0) == 11.0)
  }
}
