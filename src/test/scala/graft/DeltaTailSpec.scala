package graft

import org.apache.spark.sql.functions._
import graft.sources.{DeltaLake, FsIO}
import graft.streaming.DeltaTailSourceProvider

/** The Delta commit-tail streaming source: version offsets,
  * incremental delivery across triggers, stream == batch against
  * fromDeltaChanges, exactly-once restart from the engine's offset
  * log, compaction invisibility, and loud guards shared with the
  * batch tail. */
class DeltaTailSpec extends SparkSpec {

  private def tmp(leaf: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_dtail").toString
    s"$d/$leaf"
  }

  private def append(t: String, vals: (Long, String)*): Unit = {
    import spark.implicits._
    DeltaLake.toDelta(vals.toDF("id", "s").coalesce(1), t, "append")
  }

  private def collectSink(name: String): Seq[(Long, String, Long)] =
    spark.table(name).select("id", "s", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq

  test("incremental delivery across triggers == batch fromDeltaChanges; OPTIMIZE invisible") {
    import spark.implicits._
    val t = tmp("tail.delta")
    DeltaLake.toDelta(Seq((1L, "a")).toDF("id", "s").coalesce(1), t) // v0
    append(t, 2L -> "b")                                            // v1
    val q = spark.readStream
      .format(classOf[DeltaTailSourceProvider].getName)
      .option("path", t)
      .option("startingVersion", "-1")
      .load()
      .writeStream.format("memory").queryName("t_tail")
      .start()
    try {
      q.processAllAvailable()
      assert(collectSink("t_tail") == Seq((1L, "a", 0L), (2L, "b", 1L)))
      // commits land WHILE the query runs; only the new tail delivers
      append(t, 3L -> "c")                  // v2
      DeltaLake.compact(spark, t)           // v3: dataChange=false
      append(t, 4L -> "d")                  // v4
      q.processAllAvailable()
      assert(collectSink("t_tail") == Seq(
        (1L, "a", 0L), (2L, "b", 1L), (3L, "c", 2L), (4L, "d", 4L)))
      // stream == batch: the sink equals one batch pull of everything
      val batch = DeltaLake.fromDeltaChanges(spark, t, -1L)
        .select("id", "s", "_commit_version").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
      assert(collectSink("t_tail") == batch)
    } finally q.stop()
  }

  test("default start = latest at source creation (new commits only)") {
    import spark.implicits._
    val t = tmp("tail2.delta")
    DeltaLake.toDelta(Seq((1L, "a")).toDF("id", "s").coalesce(1), t) // v0
    append(t, 2L -> "b")                                            // v1
    val q = spark.readStream
      .format(classOf[DeltaTailSourceProvider].getName)
      .option("path", t)
      .load()
      .writeStream.format("memory").queryName("t_tail2")
      .start()
    try {
      q.processAllAvailable()
      assert(collectSink("t_tail2").isEmpty) // history not re-delivered
      append(t, 3L -> "c") // v2
      q.processAllAvailable()
      assert(collectSink("t_tail2") == Seq((3L, "c", 2L)))
    } finally q.stop()
  }

  test("restart from the offset log is exactly-once") {
    import spark.implicits._
    val t = tmp("tail3.delta")
    val cp = tmp("cp")
    DeltaLake.toDelta(Seq((1L, "a")).toDF("id", "s").coalesce(1), t) // v0
    // the memory sink cannot recover from a checkpoint — use
    // foreachBatch (the production consumption shape) into a
    // per-run buffer
    def run(): Seq[(Long, String, Long)] = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]()
      val q = spark.readStream
        .format(classOf[DeltaTailSourceProvider].getName)
        .option("path", t)
        .option("startingVersion", "-1")
        .load()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("id", "s", "_commit_version").collect().foreach(r =>
            got.add((r.getLong(0), r.getString(1), r.getLong(2))))
          ()
        }
        .option("checkpointLocation", cp)
        .start()
      try q.processAllAvailable() finally q.stop()
      got.toArray(Array.empty[(Long, String, Long)]).sorted.toSeq
    }
    assert(run() == Seq((1L, "a", 0L)))
    append(t, 2L -> "b") // v1 lands between runs
    append(t, 3L -> "c") // v2
    // the restarted query resumes AFTER v0: no re-delivery
    assert(run() == Seq((2L, "b", 1L), (3L, "c", 2L)))
    // caught up: a third run delivers nothing
    assert(run().isEmpty)
  }

  test("backlog pacing: maxVersionsPerBatch drains deep history across micro-batches") {
    import spark.implicits._
    val t = tmp("tail5.delta")
    // 9 commits of one row each — a consumer starting from -1 with
    // maxVersionsPerBatch=3 must claim offsets 2, 5, 8 and still
    // deliver EVERY row exactly once
    DeltaLake.toDelta(Seq((0L, "r0")).toDF("id", "s").coalesce(1), t)
    (1 to 8).foreach(i => append(t, i.toLong -> s"r$i"))
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[Long])]()
    val q = spark.readStream
      .format(classOf[DeltaTailSourceProvider].getName)
      .option("path", t)
      .option("startingVersion", "-1")
      .option("maxVersionsPerBatch", "3")
      .load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.add((id, df.select("id").collect().map(_.getLong(0)).sorted.toSeq))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = batches.toArray(Array.empty[(Long, Seq[Long])]).sortBy(_._1)
    // every row exactly once, in version order
    assert(got.flatMap(_._2).toSeq == (0L to 8L))
    // paced: no batch carries more than 3 commits' rows, and the
    // 9-commit backlog took at least 3 batches
    assert(got.forall(_._2.size <= 3))
    assert(got.count(_._2.nonEmpty) >= 3)
    // clean RESTART with the paced source must not re-deliver: the
    // engine's commit() callback resyncs the cursor (getBatch only
    // replays uncommitted batches, so without it a restarted source
    // would re-offer versions below the committed offset)
    val cp = tmp("cp5")
    def run(name: String): Seq[Long] = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
      val q2 = spark.readStream
        .format(classOf[DeltaTailSourceProvider].getName)
        .option("path", t)
        .option("startingVersion", "-1")
        .option("maxVersionsPerBatch", "2")
        .load()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("id").collect().foreach(r => got.add(r.getLong(0)))
          ()
        }
        .option("checkpointLocation", cp)
        .start()
      try q2.processAllAvailable() finally q2.stop()
      // ConcurrentLinkedQueue[Long] boxes — toArray needs the boxed type
      got.toArray(Array.empty[java.lang.Long]).map(_.longValue()).sorted.toSeq
    }
    assert(run("a") == (0L to 8L)) // drains the 9-commit backlog
    append(t, 9L -> "r9")
    assert(run("b") == Seq(9L)) // ONLY the new commit — no re-delivery
    // out-of-range option is loud
    intercept[IllegalArgumentException] {
      spark.readStream
        .format(classOf[DeltaTailSourceProvider].getName)
        .option("path", t)
        .option("maxVersionsPerBatch", "1000")
        .load()
    }
  }

  test("startingTimestamp resolves to the first commit at/after the time") {
    import spark.implicits._
    val t = tmp("tail5.delta")
    DeltaLake.toDelta(Seq((1L, "a")).toDF("id", "s").coalesce(1), t) // v0
    Thread.sleep(15)
    val cut = System.currentTimeMillis()
    Thread.sleep(15)
    append(t, 2L -> "b") // v1, stamped after `cut`
    append(t, 3L -> "c") // v2
    val q = spark.readStream
      .format(classOf[DeltaTailSourceProvider].getName)
      .option("path", t)
      .option("startingTimestamp", cut.toString) // epoch-millis form
      .load()
      .writeStream.format("memory").queryName("t_tail5")
      .start()
    try {
      q.processAllAvailable()
      assert(collectSink("t_tail5") == Seq((2L, "b", 1L), (3L, "c", 2L)))
    } finally q.stop()
    // a timestamp older than every commit delivers the full tail
    assert(DeltaLake.versionAtOrAfterTimestamp(t, 0L) == -1L)
    // newer than every commit: start at latest (new commits only)
    assert(DeltaLake.versionAtOrAfterTimestamp(t,
      System.currentTimeMillis() + 60000) == 2L)
    // ISO forms parse in the SESSION timezone (UTC here; the upstream
    // Delta source's rule); both options together reject
    assert(DeltaTailSourceProvider.parseTimestamp("1970-01-01", spark) == 0L)
    assert(DeltaTailSourceProvider.parseTimestamp(
      "1970-01-01T00:00:01", spark) == 1000L)
    // a non-UTC session shifts the resolved instant accordingly
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Etc/GMT-2") // UTC+2
      assert(DeltaTailSourceProvider.parseTimestamp("1970-01-01T02:00:00",
        spark) == 0L)
      assert(DeltaTailSourceProvider.parseTimestamp("123456", spark) == 123456L)
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format(classOf[DeltaTailSourceProvider].getName)
        .option("path", t)
        .option("startingVersion", "0")
        .option("startingTimestamp", "0")
        .load() // option validation is synchronous in load()
    }
    assert(e.getMessage.contains("mutually exclusive"))
  }

  test("maxBytesPerBatch paces claims by add bytes from the log") {
    import spark.implicits._
    val t = tmp("tail6.delta")
    DeltaLake.toDelta(Seq((0L, "s0")).toDF("id", "s").coalesce(1), t) // v0
    (1L to 4L).foreach(i => append(t, i -> s"s$i")) // v1..v4
    // each commit adds one small file of some KB — a 1-byte budget
    // still claims AT LEAST one commit per batch, so the backlog
    // drains one version at a time
    val perBatch = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
    val q = spark.readStream
      .format(classOf[DeltaTailSourceProvider].getName)
      .option("path", t)
      .option("startingVersion", "-1")
      .option("maxBytesPerBatch", "1")
      .load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        perBatch.add(df.select("_commit_version").distinct().count().toInt)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val sizes = perBatch.toArray(Array.empty[Integer]).toSeq.map(_.intValue)
    assert(sizes.filter(_ > 0).forall(_ == 1),
      s"a batch claimed more than one commit under a 1-byte budget: $sizes")
    assert(sizes.sum == 5) // every commit delivered exactly once
    intercept[IllegalArgumentException] {
      DeltaTailSourceProvider.maxBytesOf(Map("maxBytesPerBatch" -> "0"))
    }
  }

  test("readChangeFeed streams the row-level CDF; plain tail skips cdc rewrites") {
    import spark.implicits._
    val t = tmp("cdftail.delta")
    DeltaLake.toDelta((0L until 10).map(i => (i, s"v$i")).toDF("id", "s")
      .coalesce(1), t)                                       // v0
    DeltaLake.enableChangeDataFeed(spark, t)                 // v1
    val q = spark.readStream
      .format(classOf[DeltaTailSourceProvider].getName)
      .option("path", t)
      .option("startingVersion", "1") // deliver (1, ...]
      .option("readChangeFeed", "true")
      .load()
      .writeStream.format("memory").queryName("t_cdf")
      .start()
    try {
      // v2: upsert (1 update + 1 insert); v3: CoW delete of id 4
      DeltaLake.upsert(spark, t,
        Seq((3L, "u3"), (100L, "u100")).toDF("id", "s"), Seq("id"))
      DeltaLake.deleteWhere(spark, t, col("id") === 4L)
      q.processAllAvailable()
      val sink = spark.table("t_cdf")
        .select("id", "s", "_change_type", "_commit_version").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .sorted.toSeq
      assert(sink == Seq(
        (3L, "u3", "update_postimage", 2L),
        (3L, "v3", "update_preimage", 2L),
        (4L, "v4", "delete", 3L),
        (100L, "u100", "insert", 2L)))
      // stream == batch cdf
      val batch = DeltaLake.fromDeltaCdf(spark, t, 1L)
        .select("id", "s", "_change_type", "_commit_version").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .sorted.toSeq
      assert(sink == batch)
    } finally q.stop()
    // the PLAIN tail over the same range delivers only genuine
    // inserts (cdc-preferred) instead of rejecting the rewrites
    val plain = DeltaLake.fromDeltaChanges(spark, t, 1L)
      .select("id", "s").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(plain.toSeq == Seq((100L, "u100")))
    // DV deletes emit cdc too: precise delete rows in the feed
    DeltaLake.deleteWhere(spark, t, col("id") === 7L,
      viaDeletionVectors = true)                             // v4
    val v4 = DeltaLake.fromDeltaCdf(spark, t, 3L, Some(4L))
    assert(v4.select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((7L, "delete")))
    // ...and the plain tail sees the DV commit as zero inserts, not
    // an error
    assert(DeltaLake.fromDeltaChanges(spark, t, 3L, Some(4L)).count() == 0)
  }

  test("guards fire through the stream: missing path option; DV adds reject") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      spark.readStream
        .format(classOf[DeltaTailSourceProvider].getName)
        .load()
    }
    val t = tmp("tail4.delta")
    DeltaLake.toDelta(
      spark.range(0, 40).select(col("id"), concat(lit("x"), col("id")).as("s"))
        .coalesce(2), t)
    DeltaLake.foreignDeleteRows(spark, t, col("id") < 5)
    val q = spark.readStream
      .format(classOf[DeltaTailSourceProvider].getName)
      .option("path", t)
      .option("startingVersion", "-1")
      .load()
      .writeStream.format("memory").queryName("t_tail4")
      .start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    assert(e.getMessage.contains("not append-only") ||
      Option(e.getCause).exists(_.getMessage.contains("not append-only")))
  }
}
