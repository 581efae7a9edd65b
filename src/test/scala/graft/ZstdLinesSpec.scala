package graft

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{Export, FsIO, Readers, ZstdLines}

/** zstd line formats (.jsonl.zst / .csv.zst). Independence: the
  * multi-frame and csv fixtures are produced by zstd-jni's ONE-SHOT
  * static `Zstd.compress` (the simple API — a different code path
  * from the module's streaming ZstdOutputStream), and the streaming
  * writer's output is re-read through `Zstd.decompress` on raw
  * frames in the round-trip check below. */
class ZstdLinesSpec extends SparkSpec {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_zst").toString

  private def writeOneShot(path: String, text: String): Unit = {
    val out = FsIO.create(path)
    try out.write(com.github.luben.zstd.Zstd.compress(
      text.getBytes(StandardCharsets.UTF_8)))
    finally out.close()
  }

  test("jsonl round trip: sharded write, glob read, typed values") {
    val dir = tmpDir()
    import spark.implicits._
    val df = spark.range(0, 100).select(
      col("id"), (col("id") * 0.25 - 3.0).as("v"),
      concat(lit("s"), col("id")).as("s"),
      (col("id") % 2 === 0).as("b")).repartition(4)
    val n = ZstdLines.toZstJsonlSharded(df, dir)
    assert(n == 4)
    val back = Readers.open(spark, s"$dir/part-*.jsonl.zst")
    assert(back.count() == 100)
    val r = back.filter(col("id") === 7).head
    assert(r.getAs[Double]("v") == 7 * 0.25 - 3.0)
    assert(r.getAs[String]("s") == "s7")
    assert(r.getAs[Boolean]("b") == false)
    // read parallelism = one task per shard file
    assert(ZstdLines.lines(spark, s"$dir/part-*.jsonl.zst").rdd.getNumPartitions == 4)
    // task-commit protocol: every attempt temp was promoted or
    // discarded — only the final shards remain
    val leftover = new java.io.File(dir).listFiles()
      .map(_.getName).filterNot(_.matches("part-\\d{5}\\.jsonl\\.zst")).toSeq
    assert(leftover.isEmpty, s"uncommitted temp files: $leftover")
  }

  test("multi-frame files (concatenated one-shot frames) decode through") {
    val dir = tmpDir()
    val f1 = com.github.luben.zstd.Zstd.compress(
      "{\"a\":1}\n{\"a\":2}\n".getBytes(StandardCharsets.UTF_8))
    val f2 = com.github.luben.zstd.Zstd.compress(
      "{\"a\":3}\n".getBytes(StandardCharsets.UTF_8))
    val out = FsIO.create(s"$dir/x.jsonl.zst")
    try { out.write(f1); out.write(f2) } finally out.close()
    val back = Readers.open(spark, s"$dir/x.jsonl.zst")
    assert(back.select("a").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("csv.zst: per-shard headers dropped, one header drives inference") {
    val dir = tmpDir()
    writeOneShot(s"$dir/part-00000.csv.zst", "k,v\na,1\nb,2\n")
    writeOneShot(s"$dir/part-00001.csv.zst", "k,v\nc,3\n")
    val df = Readers.open(spark, s"$dir/part-*.csv.zst")
    assert(df.columns.toSeq == Seq("k", "v"))
    assert(df.schema("v").dataType == IntegerType) // inferred, not string
    val got = df.collect().map(r => (r.getAs[String]("k"), r.getAs[Int]("v"))).sortBy(_._1)
    assert(got.toSeq == Seq(("a", 1), ("b", 2), ("c", 3)))
    // explicit schema path skips the driver header read
    val sch = new StructType().add("k", StringType).add("v", LongType)
    val typed = ZstdLines.fromZstCsv(spark, s"$dir/part-*.csv.zst", schema = Some(sch))
    assert(typed.count() == 3 && typed.schema("v").dataType == LongType)
  }

  test("single-file export dispatches and reads back; raw frame decodes independently") {
    val dir = tmpDir()
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    Export.export(df, s"$dir/one.jsonl.zst")
    assert(Readers.open(spark, s"$dir/one.jsonl.zst").count() == 2)
    // independent decode of the streaming writer's output
    val (fs, p) = FsIO.resolve(s"$dir/one.jsonl.zst")
    val len = fs.getFileStatus(p).getLen.toInt
    val bytes = new Array[Byte](len)
    val in = new FsIO.In(s"$dir/one.jsonl.zst")
    try in.readFully(bytes) finally in.close()
    val plain = new String(
      com.github.luben.zstd.Zstd.decompress(bytes, 1 << 20),
      StandardCharsets.UTF_8)
    assert(plain.split("\n").count(_.nonEmpty) == 2)
    assert(plain.contains("\"s\":\"x\""))
  }

  test("corrupt zstd payload fails loudly; empty partitions write no shards") {
    val dir = tmpDir()
    val out = FsIO.create(s"$dir/bad.jsonl.zst")
    try out.write(Array.tabulate[Byte](64)(i => (i * 7).toByte)) finally out.close()
    val e = intercept[Exception] {
      Readers.open(spark, s"$dir/bad.jsonl.zst").count()
    }
    assert(e.getMessage != null)
    import spark.implicits._
    val sparse = Seq((1L, "x")).toDF("id", "s").repartition(4)
    val n = ZstdLines.toZstJsonlSharded(sparse, s"$dir/sparse")
    assert(n == 1)
    assert(FsIO.listFileNames(s"$dir/sparse").count(_.endsWith(".jsonl.zst")) == 1)
  }

  // ---- r19: bounded-prefix schema inference (graft.zstInferPrefix) ----

  private def withProp[A](prop: String, v: String)(f: => A): A = {
    val old = System.getProperty(prop)
    System.setProperty(prop, v)
    try f
    finally if (old == null) System.clearProperty(prop)
            else System.setProperty(prop, old)
  }

  test("prefix inference == full-pass inference: schema and rows, cross-shard field union") {
    val dir = tmpDir()
    // shard 1 carries (id, a); shard 2 carries (id, b) — the inferred
    // schema must be the UNION even though neither shard alone has it
    writeOneShot(s"$dir/part-0.jsonl.zst",
      (0 until 50).map(i => s"""{"id":$i,"a":"x$i"}""").mkString("", "\n", "\n"))
    writeOneShot(s"$dir/part-1.jsonl.zst",
      (50 until 100).map(i => s"""{"id":$i,"b":${i * 0.5}}""").mkString("", "\n", "\n"))
    val fast = withProp("graft.zstInferPrefix", "1")(
      ZstdLines.fromZstJsonl(spark, s"$dir/part-*.jsonl.zst"))
    val full = withProp("graft.zstInferPrefix", "0")(
      ZstdLines.fromZstJsonl(spark, s"$dir/part-*.jsonl.zst"))
    assert(fast.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      full.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.orderBy("id").collect().map(_.toSeq.map(Option(_))).toSeq
    assert(key(fast) === key(full))
  }

  test("type drift past the inference prefix fails loudly (FAILFAST)") {
    val dir = tmpDir()
    // first InferPrefixLines lines are integral -> inferred long; a
    // fractional value past the prefix must raise, not silently null
    val k = ZstdLines.InferPrefixLines
    val lines = (0 until k).map(i => s"""{"id":$i,"v":$i}""") :+
      s"""{"id":$k,"v":1.5}"""
    writeOneShot(s"$dir/part-0.jsonl.zst", lines.mkString("", "\n", "\n"))
    val df = ZstdLines.fromZstJsonl(spark, s"$dir/part-0.jsonl.zst")
    assert(df.schema("v").dataType === LongType)
    val e = intercept[Exception](df.agg(sum(col("v"))).collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null &&
      (m.contains("FAILFAST") || m.contains("Malformed") || m.contains("parse"))), e.toString)
  }
}
