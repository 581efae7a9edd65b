package graft

import org.apache.spark.sql.SparkSession

/** Isolated A/B probe for the LSH near-dup VERIFY tail — exact
  * jaccard over full shingle-hash sets (q_lsh_neardup) vs the
  * signature-only minhash-agreement estimate (q_lsh_neardup_sig).
  *
  * Broadcast joins are disabled so the verify joins take the
  * cluster-scale shuffle path: the shuffle-BYTES delta is the
  * design's evidence (wall-clock on one box can't show it — local
  * shuffle is CPU-cheap, network shuffle is not; the r9 bloom
  * lesson). Both lanes share the identical candidate head (shingle
  * -> sign -> band -> bucket-join), so the byte difference isolates
  * the verify payload: full hash sets (~n_shingles longs per doc,
  * unbounded in document length) vs exactly K=8 longs per doc.
  *
  * Usage: SPARK_GRAFT_CPUS=8 tools/run.sh graft.LshVerifyProbe [pairs]
  */
object LshVerifyProbe {
  /** Accumulates shuffle-write bytes across completed stages. */
  private final class ShuffleBytesListener
      extends org.apache.spark.scheduler.SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
  }

  def main(args: Array[String]): Unit = {
    val pairs = if (args.nonEmpty) args(0).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // force the verify joins onto the shuffle path — the regime the
      // probe is about (at 100 TB neither join side broadcasts)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def lane(name: String): () => Unit = {
      val fn = SparkEntry.queries(name)
      () => fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    val exact = lane("q_lsh_neardup")
    val sig = lane("q_lsh_neardup_sig")

    val listener = new ShuffleBytesListener
    spark.sparkContext.addSparkListener(listener)
    def shuffleBytesOf(run: () => Unit): Long = {
      run() // warmup (JIT/codegen); also primes file listing
      Thread.sleep(500) // listener events drain async
      val before = listener.bytes.get()
      run()
      Thread.sleep(500)
      listener.bytes.get() - before
    }
    val eBytes = shuffleBytesOf(exact)
    val gBytes = shuffleBytesOf(sig)

    var eMin = Double.MaxValue
    var gMin = Double.MaxValue
    for (_ <- 1 to pairs) { // interleaved pairs, min per lane (r4 protocol)
      val t0 = System.nanoTime()
      exact()
      eMin = math.min(eMin, (System.nanoTime() - t0) / 1e9)
      val t1 = System.nanoTime()
      sig()
      gMin = math.min(gMin, (System.nanoTime() - t1) / 1e9)
    }
    val mib = 1024.0 * 1024.0
    println(f"exact-set verify (q_lsh_neardup):     shuffle=${eBytes / mib}%.2f MiB  min=$eMin%.3f s")
    println(f"signature verify (q_lsh_neardup_sig): shuffle=${gBytes / mib}%.2f MiB  min=$gMin%.3f s")
    println(f"total-bytes ratio: ${eBytes.toDouble / gBytes}%.2fx; verify-tail delta: ${(eBytes - gBytes) / mib}%.2f MiB")
    spark.stop()
  }
}
