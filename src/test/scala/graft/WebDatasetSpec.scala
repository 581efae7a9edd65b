package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{Export, Readers, WebDataset}

/** WebDataset (tar) source/sink. Independence: GNU tar itself (in
  * this container) lists and extracts our writer's archives
  * byte-identically, and our reader reads archives CREATED by GNU tar
  * — conformance in both directions against the reference
  * implementation, not our own code. */
class WebDatasetSpec extends SparkSpec {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_wds").toString

  private val shape = StructType(Seq(
    StructField("key", StringType, false),
    StructField("files", MapType(StringType, BinaryType, false), false)))

  private def sampleDf(n: Int, parts: Int = 2) = {
    val rows = (0 until n).map { i =>
      Row(f"s$i%05d", Map(
        "txt" -> s"caption $i é".getBytes("UTF-8"),
        "cls" -> i.toString.getBytes("UTF-8"),
        "bin" -> Array.tabulate(100 + i % 400)(j => ((i * 31 + j) % 251).toByte)))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, parts), shape)
  }

  test("GNU tar lists and extracts our archives byte-identically") {
    val dir = tmpDir()
    val path = s"$dir/w.tar"
    WebDataset.toWebDataset(sampleDf(5, 1), path)
    import scala.sys.process._
    val listed = Seq("tar", "-tf", path).!!.trim.split("\n").toSeq.sorted
    assert(listed == (0 until 5).flatMap(i =>
      Seq(f"s$i%05d.bin", f"s$i%05d.cls", f"s$i%05d.txt")).sorted)
    val xdir = s"$dir/x"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(xdir))
    assert(Seq("tar", "-xf", path, "-C", xdir).! == 0)
    val got = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$xdir/s00003.txt"))
    assert(new String(got, "UTF-8") == "caption 3 é")
    val b2 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$xdir/s00002.bin"))
    assert(b2.length == 102 && (b2(5) & 0xff) == (2 * 31 + 5) % 251)
  }

  test("our reader reads archives created by GNU tar") {
    val dir = tmpDir()
    val src = s"$dir/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    for (i <- 0 until 4; ext <- Seq("txt", "json")) {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$src/k$i.$ext"),
        s"""$ext payload $i""".getBytes("UTF-8"))
    }
    import scala.sys.process._
    val path = s"$dir/gnu.tar"
    val names = (0 until 4).flatMap(i => Seq(s"k$i.txt", s"k$i.json"))
    assert((Seq("tar", "-cf", path, "-C", src) ++ names).! == 0)
    val df = WebDataset.fromWebDataset(spark, path)
    assert(df.count() == 4)
    val r = df.where(col("key") === "k2").collect().head
    val m = r.getMap[String, Array[Byte]](1)
    assert(new String(m("txt"), "UTF-8") == "txt payload 2")
    assert(new String(m("json"), "UTF-8") == "json payload 2")
  }

  test("sharded round trip + glob; payload reads spread member-level") {
    val dir = tmpDir() + "/shards"
    val df = sampleDf(60, 4)
    assert(WebDataset.toWebDatasetSharded(df, dir) == 4)
    val back = Readers.open(spark, s"$dir/part-*.tar")
    assert(back.count() == 60)
    val r = back.where(col("key") === "s00041").collect().head
    val m = r.getMap[String, Array[Byte]](1)
    assert(new String(m("cls"), "UTF-8") == "41")
    assert(m("bin").length == 100 + 41 % 400)
    assert(m.keys.toSeq.sorted == Seq("bin", "cls", "txt"))
    // re-shard clears stale files
    assert(WebDataset.toWebDatasetSharded(df.repartition(2), dir) == 2)
    assert(Readers.open(spark, s"$dir/part-*.tar").count() == 60)
  }

  test("WebDataset key rule: name up to the FIRST dot; dirs belong to the key") {
    assert(WebDataset.splitKey("x.seg.png") == (("x", "seg.png")))
    assert(WebDataset.splitKey("a/b/c.txt") == (("a/b/c", "txt")))
    assert(WebDataset.splitKey("noext") == (("noext", "")))
    val dir = tmpDir()
    val rows = Seq(Row("d/k1", Map("seg.png" -> "sp".getBytes("UTF-8"),
      "png" -> "p".getBytes("UTF-8"))))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), shape)
    val path = s"$dir/k.tar"
    Export.export(df, path) // extension dispatch
    val back = Readers.open(spark, path).collect().head
    assert(back.getString(0) == "d/k1")
    assert(back.getMap[String, Array[Byte]](1).keys.toSeq.sorted
      == Seq("png", "seg.png"))
  }

  test("POSIX ustar prefix-split paths keep the full directory in the key") {
    // a path over 100 bytes whose basename fits: --format=ustar splits
    // it into prefix(155)+name(100); ignoring the prefix would key the
    // sample by basename only and collide across directories
    val dir = tmpDir()
    val src = s"$dir/src"
    val deep = ("d" * 40) + "/" + ("e" * 40) + "/" + ("f" * 40)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$src/$deep"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$src/$deep/k1.txt"),
      "deep payload".getBytes("UTF-8"))
    import scala.sys.process._
    val path = s"$dir/prefix.tar"
    assert(Seq("tar", "--format=ustar", "-cf", path, "-C", src,
      s"$deep/k1.txt").! == 0)
    val df = WebDataset.fromWebDataset(spark, path)
    val rows = df.collect()
    assert(rows.length == 1)
    assert(rows.head.getString(0) == s"$deep/k1",
      s"prefix lost: key = ${rows.head.getString(0)}")
    assert(new String(rows.head.getMap[String, Array[Byte]](1)("txt"),
      "UTF-8") == "deep payload")
  }

  test("long names and PAX path overrides are rejected loudly, not mis-keyed") {
    val dir = tmpDir()
    val src = s"$dir/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    val long = "k" * 120 + ".txt"
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$src/$long"),
      "x".getBytes("UTF-8"))
    import scala.sys.process._
    // GNU format emits an 'L' long-name member; pax format a path= record
    val gnuTar = s"$dir/long_gnu.tar"
    assert(Seq("tar", "--format=gnu", "-cf", gnuTar, "-C", src, long).! == 0)
    val e1 = intercept[Exception] {
      WebDataset.fromWebDataset(spark, gnuTar).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e1).exists(_.contains("long-name")), s"got: $e1")
    val paxTar = s"$dir/long_pax.tar"
    assert(Seq("tar", "--format=pax", "-cf", paxTar, "-C", src, long).! == 0)
    val e2 = intercept[Exception] {
      WebDataset.fromWebDataset(spark, paxTar).collect()
    }
    assert(messages(e2).exists(m =>
      m.contains("path override") || m.contains("long-name")), s"got: $e2")
    // and the writer refuses to create them in the first place
    val rows = Seq(Row("k" * 120, Map("txt" -> "x".getBytes("UTF-8"))))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), shape)
    val e3 = intercept[Exception] {
      WebDataset.toWebDataset(df, s"$dir/reject.tar")
    }
    assert(messages(e3).exists(_.contains("100 bytes")), s"got: $e3")
  }

  test("shape validation and corrupt-archive detection") {
    val bad = spark.range(3).toDF()
    val e = intercept[IllegalArgumentException] {
      WebDataset.toWebDataset(bad, tmpDir() + "/bad.tar")
    }
    assert(e.getMessage.contains("map<string, binary>"))
    // flip a header byte: the sequential walk must fail with the offset
    val dir = tmpDir()
    val path = s"$dir/c.tar"
    WebDataset.toWebDataset(sampleDf(3, 1), path)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    bytes(262) = 'X'.toByte // corrupt the magic of the first header
    val cpath = s"$dir/corrupt.tar"
    java.nio.file.Files.write(java.nio.file.Paths.get(cpath), bytes)
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val e2 = intercept[Exception] {
      WebDataset.fromWebDataset(spark, cpath).collect()
    }
    assert(messages(e2).exists(m => m.contains("invalid tar header")), s"got: $e2")
  }
}
