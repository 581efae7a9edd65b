package graft

import org.apache.spark.sql.functions._
import graft.sources.Iceberg
import graft.streaming.IcebergTailSourceProvider

/** The Iceberg snapshot-tail streaming source: sequence-number
  * offsets, incremental delivery across triggers, stream == batch
  * against fromIcebergChanges, exactly-once restart from the engine's
  * offset log, and loud guards shared with the batch tail. */
class IcebergTailSpec extends SparkSpec {

  private def tmp(leaf: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_itail").toString
    s"$d/$leaf"
  }

  private def append(t: String, vals: (Long, String)*): Unit = {
    import spark.implicits._
    Iceberg.toIceberg(vals.toDF("id", "s").coalesce(1), t, mode = "append")
  }

  private def collectSink(name: String): Seq[(Long, String, Long)] =
    spark.table(name).select("id", "s", "_sequence_number").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq

  test("incremental delivery across triggers == batch fromIcebergChanges") {
    import spark.implicits._
    val t = tmp("itail.iceberg")
    Iceberg.toIceberg(Seq((1L, "a")).toDF("id", "s").coalesce(1), t) // seq 1
    append(t, 2L -> "b")                                             // seq 2
    val q = spark.readStream
      .format(classOf[IcebergTailSourceProvider].getName)
      .option("path", t)
      .option("startingSequence", "0")
      .load()
      .writeStream.format("memory").queryName("i_tail")
      .start()
    try {
      q.processAllAvailable()
      assert(collectSink("i_tail") == Seq((1L, "a", 1L), (2L, "b", 2L)))
      // snapshots land WHILE the query runs; only the new tail delivers
      append(t, 3L -> "c") // seq 3
      append(t, 4L -> "d") // seq 4
      q.processAllAvailable()
      assert(collectSink("i_tail") == Seq(
        (1L, "a", 1L), (2L, "b", 2L), (3L, "c", 3L), (4L, "d", 4L)))
      // stream == batch: the sink equals one batch pull of everything
      val batch = Iceberg.fromIcebergChanges(spark, t)
        .select("id", "s", "_sequence_number").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
      assert(collectSink("i_tail") == batch)
    } finally q.stop()
  }

  test("default start = latest at source creation; restart is exactly-once") {
    import spark.implicits._
    val t = tmp("itail2.iceberg")
    val cp = tmp("cp")
    Iceberg.toIceberg(Seq((1L, "a")).toDF("id", "s").coalesce(1), t) // seq 1
    // default start: history is NOT re-delivered
    val q0 = spark.readStream
      .format(classOf[IcebergTailSourceProvider].getName)
      .option("path", t)
      .load()
      .writeStream.format("memory").queryName("i_tail2")
      .start()
    try {
      q0.processAllAvailable()
      assert(collectSink("i_tail2").isEmpty)
      append(t, 2L -> "b") // seq 2
      q0.processAllAvailable()
      assert(collectSink("i_tail2") == Seq((2L, "b", 2L)))
    } finally q0.stop()
    // restart from the offset log (foreachBatch — the memory sink
    // cannot recover checkpoints)
    def run(): Seq[(Long, String, Long)] = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]()
      val q = spark.readStream
        .format(classOf[IcebergTailSourceProvider].getName)
        .option("path", t)
        .option("startingSequence", "0")
        .load()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("id", "s", "_sequence_number").collect().foreach(r =>
            got.add((r.getLong(0), r.getString(1), r.getLong(2))))
          ()
        }
        .option("checkpointLocation", cp)
        .start()
      try q.processAllAvailable() finally q.stop()
      got.toArray(Array.empty[(Long, String, Long)]).sorted.toSeq
    }
    assert(run() == Seq((1L, "a", 1L), (2L, "b", 2L)))
    append(t, 3L -> "c") // seq 3, lands between runs
    assert(run() == Seq((3L, "c", 3L))) // no re-delivery
    assert(run().isEmpty) // caught up
  }

  test("readChangeFeed streams the row-level changelog incl. MoR deletes") {
    import spark.implicits._
    val t = tmp("ichl.iceberg")
    Iceberg.toIceberg((0L until 10).map(i => (i, s"v$i")).toDF("id", "s")
      .coalesce(1), t)                                            // seq 1
    val q = spark.readStream
      .format(classOf[IcebergTailSourceProvider].getName)
      .option("path", t)
      .option("startingSequence", "0")
      .option("readChangeFeed", "true")
      .load()
      .writeStream.format("memory").queryName("i_chl")
      .start()
    try {
      q.processAllAvailable()
      append(t, 100L -> "x")                                      // seq 2
      Iceberg.deleteWhere(spark, t, col("id") === 4L)             // seq 3
      q.processAllAvailable()
      val sink = spark.table("i_chl")
        .select("id", "s", "_change_type", "_sequence_number").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .sorted.toSeq
      assert(sink.count(_._3 == "insert") == 11)
      assert(sink.filter(_._3 == "delete") == Seq((4L, "v4", "delete", 3L)))
      // stream == batch changelog
      val batch = Iceberg.fromIcebergChangelog(spark, t)
        .select("id", "s", "_change_type", "_sequence_number").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .sorted.toSeq
      assert(sink == batch)
    } finally q.stop()
  }

  test("backlog pacing via maxSnapshotsPerBatch; guards fire through the stream") {
    import spark.implicits._
    val t = tmp("itail3.iceberg")
    Iceberg.toIceberg(Seq((0L, "s0")).toDF("id", "s").coalesce(1), t)
    (1L to 5L).foreach(i => append(t, i -> s"s$i")) // seq 1..6
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
    val q = spark.readStream
      .format(classOf[IcebergTailSourceProvider].getName)
      .option("path", t)
      .option("startingSequence", "0")
      .option("maxSnapshotsPerBatch", "2")
      .load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.add(df.count().toInt); ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val sizes = batches.toArray(Array.empty[Integer]).toSeq.map(_.intValue)
    assert(sizes.sum == 6)
    assert(sizes.forall(_ <= 2), s"a batch exceeded the pacing cap: $sizes")
    // a non-append snapshot fails the stream LOUDLY
    Iceberg.toIceberg(Seq((9L, "z")).toDF("id", "s"), t, mode = "overwrite")
    val q2 = spark.readStream
      .format(classOf[IcebergTailSourceProvider].getName)
      .option("path", t)
      .option("startingSequence", "6")
      .load()
      .writeStream.format("memory").queryName("i_tail3")
      .start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q2.processAllAvailable() finally q2.stop()
    }
    assert(e.getMessage.contains("not append-only") ||
      Option(e.getCause).exists(_.getMessage.contains("not append-only")))
    // option validation is early and loud
    intercept[IllegalArgumentException] {
      spark.readStream.format(classOf[IcebergTailSourceProvider].getName)
        .load()
    }
  }
}
