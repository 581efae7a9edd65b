package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{Export, Readers, Warc}

/** WARC file source/sink: plain + per-record-gzip round trips, the
  * distributed split contract (exactly-once at any span size), header
  * semantics (declared Content-Length slicing, payloads containing
  * CRLF-CRLF), sharded export + glob read, corruption resync, and the
  * fail-fast caps. */
class WarcSpec extends SparkSpec {

  private def tmp(leaf: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_warc").toString
    s"$d/$leaf"
  }

  private val recSchema = StructType(Seq(
    StructField("warc_type", StringType),
    StructField("record_id", StringType),
    StructField("target_uri", StringType),
    StructField("content_type", StringType),
    StructField("payload", BinaryType)))

  /** 120 records; payloads include empty, CRLF-CRLF-embedding, and
    * high-byte binary cases — the shapes that break naive splitters. */
  private lazy val recDf = {
    val rows = (0 until 120).map { i =>
      val payload: Array[Byte] =
        if (i % 10 == 0) Array.emptyByteArray
        else if (i % 7 == 0)
          s"first paragraph $i\r\n\r\nsecond paragraph after a blank line $i".getBytes("UTF-8")
        else if (i % 5 == 0) Array.tabulate(50 + i)(j => ((i * 31 + j * 7) % 256).toByte)
        else s"plain body of record $i with some text".getBytes("UTF-8")
      Row(
        Seq("response", "request", "metadata")(i % 3),
        s"<urn:uuid:rec-$i>",
        if (i % 11 == 0) null else s"https://site${i % 9}.example.com/p$i",
        if (i % 13 == 0) null else "text/html",
        payload)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), recSchema)
  }

  private def checkRoundTrip(back: org.apache.spark.sql.DataFrame): Unit = {
    val rows = back.orderBy("offset").collect()
    assert(rows.length === 120)
    val byId = rows.map(r => r.getString(2) -> r).toMap
    (0 until 120).foreach { i =>
      val r = byId(s"<urn:uuid:rec-$i>")
      assert(r.getString(1) === Seq("response", "request", "metadata")(i % 3))
      if (i % 11 == 0) assert(r.isNullAt(3))
      else assert(r.getString(3) === s"https://site${i % 9}.example.com/p$i")
      val expected: Array[Byte] =
        if (i % 10 == 0) Array.emptyByteArray
        else if (i % 7 == 0)
          s"first paragraph $i\r\n\r\nsecond paragraph after a blank line $i".getBytes("UTF-8")
        else if (i % 5 == 0) Array.tabulate(50 + i)(j => ((i * 31 + j * 7) % 256).toByte)
        else s"plain body of record $i with some text".getBytes("UTF-8")
      assert(r.getAs[Array[Byte]](8).toSeq === expected.toSeq, s"payload of rec $i")
      assert(r.getLong(6) === expected.length.toLong)
      // the full header map rides along
      assert(r.getAs[Map[String, String]](7)("WARC-Record-ID") === s"<urn:uuid:rec-$i>")
    }
  }

  test("plain .warc round trip: payloads (empty/CRLFCRLF/binary) exact") {
    val path = tmp("t.warc")
    Warc.toWarc(recDf, path, gzip = false)
    checkRoundTrip(Warc.fromWarc(spark, path))
  }

  test("per-record gzip .warc.gz round trip") {
    val path = tmp("t.warc.gz")
    Warc.toWarc(recDf, path, gzip = true)
    checkRoundTrip(Warc.fromWarc(spark, path))
  }

  test("split contract: every record exactly once at any span size, both forms") {
    for (gz <- Seq(false, true)) {
      val path = tmp(if (gz) "s.warc.gz" else "s.warc")
      Warc.toWarc(recDf, path, gzip = gz)
      // tiny minSplitBytes forces defaultParallelism-many splits whose
      // boundaries land INSIDE records — the scan-to-first-owned-start
      // contract must still read each record exactly once
      val ids = Warc.fromWarc(spark, path, minSplitBytes = 128)
        .select("record_id").collect().map(_.getString(0)).toSeq
      assert(ids.length === 120, s"gz=$gz: ${ids.length} records")
      assert(ids.distinct.length === 120, s"gz=$gz: duplicates")
    }
  }

  test("sharded export + glob read; stale shards cleared; dispatch") {
    val dir = tmp("shards")
    val n = Warc.toWarcSharded(recDf.repartition(5), dir, gzip = true)
    assert(n === 5)
    val back = Readers.open(spark, s"$dir/part-*.warc.gz")
    assert(back.count() === 120)
    // re-export with fewer partitions: higher shards must be swept
    val n2 = Warc.toWarcSharded(recDf.repartition(2), dir, gzip = true)
    assert(n2 === 2)
    assert(Readers.open(spark, s"$dir/part-*.warc.gz").count() === 120)
    // single-file dispatch through Export/Readers
    val single = tmp("d.warc")
    Export.export(recDf, single)
    assert(Readers.open(spark, single).count() === 120)
  }

  test("mid-file corruption: resync recovers the remaining records, never hangs") {
    for (gz <- Seq(false, true)) {
      val path = tmp(if (gz) "c.warc.gz" else "c.warc")
      Warc.toWarc(recDf, path, gzip = gz)
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
      // stomp a 64-byte window at 1/3 of the file — kills the record
      // under it (bad structure / bad CRC); the reader must resync to
      // the next valid start and keep going
      val at = bytes.length / 3
      (0 until 64).foreach(j => bytes(at + j) = 0x5a)
      val mut = tmp(if (gz) "m.warc.gz" else "m.warc")
      java.nio.file.Files.write(java.nio.file.Paths.get(mut), bytes)
      val t0 = System.nanoTime()
      val got = Warc.fromWarc(spark, mut).select("record_id").collect()
      val secs = (System.nanoTime() - t0) / 1e9
      assert(secs < 120.0, s"gz=$gz took ${secs}s")
      assert(got.length >= 100 && got.length <= 120,
        s"gz=$gz recovered ${got.length}")
      assert(got.map(_.getString(0)).distinct.length === got.length)
      // split-invariance on the CORRUPTED file: which records survive
      // must not depend on where split boundaries fall (the sequential
      // reader applies the same chain acceptance as the split scanner)
      // String.valueOf: a stomp window can merge header lines into a
      // record that is still structurally valid but has no Record-ID —
      // the reader correctly surfaces it with a null id
      val idsOneSplit = Warc.fromWarc(spark, mut, minSplitBytes = Long.MaxValue)
        .select("record_id").collect().map(r => String.valueOf(r.getString(0)))
        .sorted.toSeq
      val idsManySplits = Warc.fromWarc(spark, mut, minSplitBytes = 128)
        .select("record_id").collect().map(r => String.valueOf(r.getString(0)))
        .sorted.toSeq
      assert(idsOneSplit === idsManySplits, s"gz=$gz split-variant recovery")
    }
  }

  test("a header NAME containing 'Content-Length' does not poison the record extent") {
    // the pre-parse that sizes the read window must anchor at line
    // start: 'X-Content-Length-Hint: 5' before the real Content-Length
    // used to truncate the window and silently drop a valid record
    val payload = "this payload is clearly longer than five bytes"
    val rec = ("WARC/1.0\r\n" +
      "X-Content-Length-Hint: 5\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:uuid:hdr>\r\n" +
      "WARC-Date: 2026-01-01T00:00:00Z\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n" +
      payload + "\r\n\r\n").getBytes("UTF-8")
    val path = tmp("hdr.warc")
    java.nio.file.Files.write(java.nio.file.Paths.get(path), rec)
    val rows = Warc.fromWarc(spark, path).collect()
    assert(rows.length === 1)
    assert(new String(rows.head.getAs[Array[Byte]](8), "UTF-8") === payload)
    assert(rows.head.getAs[Map[String, String]](7)("X-Content-Length-Hint") === "5")
  }

  test("corrupt-byte fuzz: single-byte mutations never hang or OOM") {
    val path = tmp("f.warc.gz")
    Warc.toWarc(recDf.limit(20), path, gzip = true)
    val orig = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val rnd = new scala.util.Random(42)
    val t0 = System.nanoTime()
    (0 until 60).foreach { k =>
      val bytes = orig.clone()
      val at = rnd.nextInt(bytes.length)
      bytes(at) = (bytes(at) ^ (1 << rnd.nextInt(8))).toByte
      val mut = tmp(s"fz$k.warc.gz")
      java.nio.file.Files.write(java.nio.file.Paths.get(mut), bytes)
      try Warc.fromWarc(spark, mut).count()
      catch { case _: Exception => () } // prompt failure is fine; hang/OOM is not
    }
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 300.0, s"fuzz took ${secs}s")
  }

  test("declared Content-Length over the cap is rejected, not allocated") {
    // hand-build a record whose declared length is absurd: the parser
    // must reject it (and find nothing else), not allocate 1 TB
    val body = "WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <x>\r\n" +
      "Content-Length: 1099511627776\r\n\r\npayload\r\n\r\n"
    val path = tmp("cap.warc")
    java.nio.file.Files.write(java.nio.file.Paths.get(path), body.getBytes("UTF-8"))
    assert(Warc.fromWarc(spark, path).count() === 0L)
  }

  test("parseRecord matches the oracle-gated q_warc_parse semantics") {
    // payload containing CRLF-CRLF must slice by DECLARED length with
    // the trailer validated at that exact offset (the r12 lesson both
    // engines originally got wrong)
    val payload = "para one\r\n\r\npara two"
    val rec = Warc.recordBytes("response", "<urn:uuid:7>",
      "https://x.example.com/p", "2026-01-01T00:00:00Z", "text/html",
      payload.getBytes("UTF-8"))
    val parsed = Warc.parseRecord(rec, 0).get
    assert(new String(parsed.payload, "UTF-8") === payload)
    assert(parsed.warcType === "response")
    assert(parsed.targetUri === "https://x.example.com/p")
    assert(parsed.byteLen === rec.length.toLong)
  }
}
