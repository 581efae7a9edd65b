package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._
import graft.streaming.StreamOps

/** Streaming correctness: the same transform over (a) a batch frame and
  * (b) a MemoryStream must agree — the unified-Dataset guarantee the
  * module is designed around. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  private val rows = Seq(
    (1L, ts(0), 10.0), (1L, ts(4), 20.0),   // window [0,5)
    (1L, ts(5), 30.0),                      // window [5,10)
    (2L, ts(1), 5.0), (2L, ts(59), 7.0))    // two windows

  test("tumblingAgg: batch and stream agree") {
    val batch = rows.toDF("user_id", "ts", "value")
    val expected = StreamOps.tumblingAgg(batch, "ts", "5 minutes",
      Seq("user_id"), Seq(count(lit(1)).as("n"), sum("value").as("s")))
      .collect().map(_.toSeq).toSet

    val stream = MemoryStream[(Long, Timestamp, Double)]
    stream.addData(rows.map(r => (r._1, r._2, r._3)): _*)
    val streamed = StreamOps.tumblingAgg(
      StreamOps.withEventTimeWatermark(stream.toDF.toDF("user_id", "ts", "value"), "ts", "0 seconds"),
      "ts", "5 minutes", Seq("user_id"),
      Seq(count(lit(1)).as("n"), sum("value").as("s")))
    val got = StreamOps.runToMemory(streamed, "t_tumbling", OutputMode.Complete())
      .collect().map(_.toSeq).toSet
    assert(got == expected)
    assert(expected.size == 4)
  }

  test("sessionAgg: batch session_window matches manual islands") {
    val batch = rows.toDF("user_id", "ts", "value")
    val sessions = StreamOps.sessionAgg(batch, "ts", "10 minutes",
      Seq("user_id"), Seq(count(lit(1)).as("n")))
      .select("user_id", "n").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // user 1: events at 0,4,5 -> one session of 3; user 2: 1 and 59 -> two sessions of 1
    assert(sessions == Set((1L, 3L), (2L, 1L)) || sessions == Set((1L, 3L), (2L, 1L), (2L, 1L)))
    val n = StreamOps.sessionAgg(batch, "ts", "10 minutes", Seq("user_id"),
      Seq(count(lit(1)).as("n"))).count()
    assert(n == 3)
  }

  test("sessionAgg: stream emits the same sessions") {
    val stream = MemoryStream[(Long, Timestamp, Double)]
    stream.addData(rows.map(r => (r._1, r._2, r._3)): _*)
    val streamed = StreamOps.sessionAgg(
      StreamOps.withEventTimeWatermark(stream.toDF.toDF("user_id", "ts", "value"), "ts", "0 seconds"),
      "ts", "10 minutes", Seq("user_id"), Seq(count(lit(1)).as("n")))
    val got = StreamOps.runToMemory(streamed, "t_session", OutputMode.Complete())
    assert(got.count() == 3)
  }

  test("enrichJoin: stream-static join matches batch join") {
    val dim = Seq((0L, "alpha"), (1L, "beta")).toDF("dk", "name")
    val batch = rows.toDF("user_id", "ts", "value")
      .withColumn("k", pmod(col("user_id"), lit(2)))
    val expected = StreamOps.enrichJoin(batch, dim, col("k") === col("dk"))
      .select("user_id", "value", "name").collect().map(_.toSeq)
      .groupBy(identity).view.mapValues(_.size).toMap

    val stream = MemoryStream[(Long, Timestamp, Double)]
    stream.addData(rows.map(r => (r._1, r._2, r._3)): _*)
    val streamed = StreamOps.enrichJoin(
      stream.toDF.toDF("user_id", "ts", "value")
        .withColumn("k", pmod(col("user_id"), lit(2))),
      dim, col("k") === col("dk"))
      .select("user_id", "value", "name")
    val got = StreamOps.runToMemory(streamed, "t_enrich", OutputMode.Append())
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
    assert(got == expected && expected.nonEmpty)
  }

  test("scd2Enrich: the version valid at event time attaches, stream == batch") {
    // two versions per user: v0 valid [0, 5), v1 valid [5, 100) minutes
    val dim = Seq(
      (1L, "u1_v0", ts(0), ts(5)), (1L, "u1_v1", ts(5), ts(100)),
      (2L, "u2_v0", ts(0), ts(5)), (2L, "u2_v1", ts(5), ts(100)))
      .toDF("user_id", "segment", "valid_from", "valid_to")
    val batch = rows.toDF("user_id", "ts", "value")
    val expect2 = StreamOps.scd2Enrich(batch, dim, Seq("user_id"),
        "ts", "valid_from", "valid_to")
      .select(batch("user_id"), col("value"), col("segment"))
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
    // event at minute 0 and 4 get v0; minutes 5 and 59 get v1
    assert(expect2.keySet.map(_(2)) == Set("u1_v0", "u1_v1", "u2_v0", "u2_v1"))

    val stream = MemoryStream[(Long, Timestamp, Double)]
    stream.addData(rows.map(r => (r._1, r._2, r._3)): _*)
    val sDf = stream.toDF.toDF("user_id", "ts", "value")
    val streamed = StreamOps.scd2Enrich(sDf, dim, Seq("user_id"),
        "ts", "valid_from", "valid_to")
      .select(sDf("user_id"), col("value"), col("segment"))
    val got = StreamOps.runToMemory(streamed, "t_scd2", OutputMode.Append())
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
    assert(got == expect2 && expect2.nonEmpty)
  }

  test("intervalJoin: stream-stream join matches batch range join") {
    // views at t=0 (user 1), t=1 (user 2); purchases within/outside 10m
    val views = Seq((1L, ts(0)), (2L, ts(1)))
    val purchases = Seq(
      (1L, ts(5), 100.0),   // in range for user 1
      (1L, ts(20), 200.0),  // outside 10m
      (2L, ts(4), 50.0),    // in range for user 2
      (3L, ts(2), 75.0))    // no matching view
    val vDf = views.toDF("v_user", "v_ts")
    val pDf = purchases.toDF("p_user", "p_ts", "value")
    val expected = StreamOps.intervalJoin(vDf, pDf,
        col("v_user") === col("p_user"), "v_ts", "p_ts", "10 minutes")
      .select("v_user", "value").collect().map(_.toSeq).toSet
    assert(expected == Set(Seq(1L, 100.0), Seq(2L, 50.0)))

    val vs = MemoryStream[(Long, Timestamp)]
    val ps = MemoryStream[(Long, Timestamp, Double)]
    vs.addData(views: _*); ps.addData(purchases: _*)
    val streamed = StreamOps.intervalJoin(
      StreamOps.withEventTimeWatermark(vs.toDF.toDF("v_user", "v_ts"), "v_ts", "1 hour"),
      StreamOps.withEventTimeWatermark(ps.toDF.toDF("p_user", "p_ts", "value"), "p_ts", "1 hour"),
      col("v_user") === col("p_user"), "v_ts", "p_ts", "10 minutes")
      .select("v_user", "value")
    val got = StreamOps.runToMemory(streamed, "t_interval", OutputMode.Append())
      .collect().map(_.toSeq).toSet
    assert(got == expected)
  }

  test("streamingHeavyHitters: bounded sketch state, stream == batch, Column-math parity") {
    val words1 = Seq("alpha", "beta", "alpha", "gamma", "alpha", "beta")
    val words2 = Seq("beta", "beta", "delta", "alpha")
    val all = words1 ++ words2

    // batch face (mode-agnostic mapGroupsWithState): final estimates
    val batch = StreamOps.streamingHeavyHitters(all.toDS(), groups = 1, k = 100)
      .collect().map(h => h.token -> h.cms_est).toMap
    assert(batch.keySet == Set("alpha", "beta", "gamma", "delta"))
    // CMS never undercounts
    assert(batch("alpha") >= 4 && batch("beta") >= 4 &&
      batch("gamma") >= 1 && batch("delta") >= 1)

    // Column-math parity: the same estimates via the oracle-gated
    // batch lane's formulation (one global sketch, min over rows)
    import graft.functions.TextFunctions._
    val M = 256; val D = 4
    val toks = all.toDF("token")
    def buckets(c: org.apache.spark.sql.Column) = array((0 until D).map { j =>
      struct(lit(j).as("j"), (universalHash(j, baseHash(c)) % M).as("b"))
    }: _*)
    val sketch = toks.select(explode(buckets(col("token"))).as("jb"))
      .groupBy(col("jb.j").as("j"), col("jb.b").as("b")).agg(count(lit(1)).as("c"))
    val colEst = toks.distinct()
      .select(col("token"), explode(buckets(col("token"))).as("jb"))
      .select(col("token"), col("jb.j").as("j"), col("jb.b").as("b"))
      .join(sketch, Seq("j", "b"))
      .groupBy("token").agg(min(col("c")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(batch == colEst, "JVM sketch must be bit-identical to the Column formulation")

    // ONE continuous query over two micro-batches: the second trigger
    // must carry the first trigger's sketch forward through the state
    // store (a fresh-state reprocess would leave alpha's second
    // estimate at 1 and fail the equality below)
    val stream = MemoryStream[String]
    val q = StreamOps.streamingHeavyHitters(stream.toDS(), groups = 1, k = 100)
      .toDF().writeStream.format("memory").queryName("t_hh")
      .outputMode(OutputMode.Update()).start()
    try {
      stream.addData(words1: _*); q.processAllAvailable()
      stream.addData(words2: _*); q.processAllAvailable()
    } finally q.stop()
    val emissions = spark.table("t_hh").collect()
      .map(r => (r.getString(1), r.getLong(2)))
    // two triggers really ran: alpha was emitted with two different
    // cumulative estimates
    assert(emissions.filter(_._1 == "alpha").map(_._2).distinct.length >= 2)
    // estimates only grow; the max emission per token is the final one
    val streamed = emissions
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(streamed == batch)

    // candidate cap: k=3 keeps only the top-3 by estimate
    val capped = StreamOps.streamingHeavyHitters(all.toDS(), groups = 1, k = 3)
      .collect().map(_.token).toSet
    assert(capped.size == 3 && capped.contains("alpha") && capped.contains("beta"))
  }

  test("streamingFunnel: batch == EventOps min-chain; state carries across triggers") {
    import graft.streaming.StreamOps.FunnelEvent
    def us(min: Long): Long = 1700000000000000L + min * 60000000L
    // user 1 completes all 3; user 2 stalls at stage 1 (tie not >);
    // user 3 has stage-1 before any stage-0 (no advance); user 4 only
    // non-stage events (reached 0)
    val evs = Seq(
      FunnelEvent(1L, 0, us(10)), FunnelEvent(1L, 1, us(20)), FunnelEvent(1L, 2, us(30)),
      FunnelEvent(1L, 0, us(5)), // earlier stage-0: min-chain uses it? arrives same trigger
      FunnelEvent(2L, 0, us(10)), FunnelEvent(2L, 1, us(10)), // tie: strict > blocks
      FunnelEvent(3L, 1, us(1)), FunnelEvent(3L, 0, us(2)),
      FunnelEvent(4L, -1, us(7)))
    val batch = StreamOps.streamingFunnel(evs.toDS(), 3)
      .collect().map(f => f.user_id -> (f.reached, f.last_us)).toMap
    // user 1: time-ordered greedy -> c0 = us(5); click us(20) > c0; purchase us(30)
    assert(batch(1L) == ((3, us(30))))
    assert(batch(2L) == ((1, us(10))))
    assert(batch(3L) == ((1, us(2)))) // stage-1 at us(1) precedes any stage-0
    assert(batch(4L) == ((0, 0L)))

    // equality with the batch funnel on the same synthetic events (the
    // per-user chain EventOps computes): reached counts must match
    val names = Seq("s0", "s1", "s2")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(evs.filter(_.stage >= 0).map(e =>
        Row(e.user, names(e.stage),
          java.time.LocalDateTime.ofEpochSecond(e.tsUs / 1000000L, 0,
            java.time.ZoneOffset.UTC))), 2),
      StructType(Seq(StructField("user_id", LongType, false),
        StructField("event_type", StringType, false),
        StructField("ts", TimestampNTZType, false))))
    val funnelCounts = graft.operators.EventOps
      .funnel(df, "user_id", "event_type", "ts", names)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val reachedCounts = batch.values.groupBy(_._1).view.mapValues(_.size.toLong)
    // EventOps n_users at stage k == users with reached >= k
    assert(funnelCounts("1_s0") == batch.values.count(_._1 >= 1).toLong)
    assert(funnelCounts("2_s1") == batch.values.count(_._1 >= 2).toLong)
    assert(funnelCounts("3_s2") == batch.values.count(_._1 >= 3).toLong)
    assert(reachedCounts.nonEmpty)

    // ONE continuous query over two in-order triggers: trigger 2's
    // events must advance state carried from trigger 1
    val stream = MemoryStream[FunnelEvent]
    val q = StreamOps.streamingFunnel(stream.toDS(), 3)
      .toDF().writeStream.format("memory").queryName("t_funnel")
      .outputMode(OutputMode.Update()).start()
    try {
      stream.addData(FunnelEvent(9L, 0, us(1)), FunnelEvent(9L, 1, us(2)))
      q.processAllAvailable()
      stream.addData(FunnelEvent(9L, 2, us(3)))
      q.processAllAvailable()
    } finally q.stop()
    val ems = spark.table("t_funnel").collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    assert(ems.contains((2, us(2))) && ems.contains((3, us(3))),
      s"state did not carry across triggers: ${ems.toSeq}")
  }

  test("runningStats mapGroupsWithState accumulates per key") {
    val stream = MemoryStream[StreamOps.KeyedValue]
    stream.addData(StreamOps.KeyedValue(1L, 2.0), StreamOps.KeyedValue(1L, 4.0),
      StreamOps.KeyedValue(2L, 10.0))
    val q = StreamOps.runningStats(stream.toDS()).toDF()
      .writeStream.format("memory").queryName("t_running")
      .outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("t_running").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(4))).toSet
    assert(got == Set((1L, 2L, 6.0, 3.0), (2L, 1L, 10.0, 10.0)))

    // second batch updates existing state
    stream.addData(StreamOps.KeyedValue(1L, 6.0))
    val q2 = StreamOps.runningStats(stream.toDS()).toDF()
      .writeStream.format("memory").queryName("t_running2")
      .outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination()
  }

  test("dedupByKey: stream drops repeated keys, matches batch distinct") {
    val dupRows = Seq(
      (1L, ts(0), 1.0), (1L, ts(1), 2.0), // duplicate key 1
      (2L, ts(2), 3.0), (2L, ts(3), 4.0), // duplicate key 2
      (3L, ts(4), 5.0))
    val batchCount = StreamOps.dedupByKey(
      dupRows.toDF("k", "ts", "v"), Seq("k")).count()
    assert(batchCount == 3)

    val stream = MemoryStream[(Long, Timestamp, Double)]
    stream.addData(dupRows: _*)
    val deduped = StreamOps.dedupByKey(
      StreamOps.withEventTimeWatermark(
        stream.toDF.toDF("k", "ts", "v"), "ts", "10 minutes"),
      Seq("k"), withinWatermark = true)
    val got = StreamOps.runToMemory(deduped, "t_dedup", OutputMode.Append())
      .select("k").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 2L, 3L))
  }

  test("slidingAgg produces overlapping windows") {
    val batch = rows.toDF("user_id", "ts", "value")
    val slid = StreamOps.slidingAgg(batch, "ts", "10 minutes", "5 minutes",
      Seq("user_id"), Seq(count(lit(1)).as("n")))
    // event at minute 0 belongs to windows [-5,5) and [0,10)
    assert(slid.where("user_id = 1 and n >= 1").count() >= 3)
  }

  test("streamingNearDupCandidates: stream equals batch equals the LSH band join") {
    // two planted near-dup pairs + unrelated docs; long texts so the
    // 3-gram shingle sets are meaningful
    val mk = (s: String) => s + " the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (0L, mk("alpha beta gamma delta epsilon zeta")),
      (1L, mk("alpha beta gamma delta epsilon zeta")),      // dup of 0
      (2L, mk("one two three four five six seven eight")),
      (3L, mk("one two three four five six seven eight")),  // dup of 2
      (4L, "totally different content with no overlap whatsoever at all in it"))
    val batchDf = docs.toDF("doc_id", "text")
    val p = graft.operators.LshDedup.Params()

    def pairSet(ds: org.apache.spark.sql.Dataset[StreamOps.StreamCandidate]): Set[(Long, Long)] =
      ds.collect().map(c => (c.idA, c.idB)).toSet

    // batch flatMapGroupsWithState equals the batch band self-join
    val viaState = pairSet(StreamOps.streamingNearDupCandidates(batchDf, "doc_id", "text", p))
    val bands = graft.operators.LshDedup.bandEntries(batchDf, "doc_id", "text", p)
    val viaJoin = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaState == viaJoin)
    assert(viaState.contains((0L, 1L)) && viaState.contains((2L, 3L)))
    assert(!viaState.exists { case (a, b) => a == 4L || b == 4L })

    // streamed in two micro-batches: same pair set, and a cross-batch
    // pair (doc 1 arrives after doc 0's batch) is still found
    val stream = MemoryStream[(Long, String)]
    stream.addData(docs.take(2).map(d => (d._1, d._2)): _*)
    stream.addData(docs.drop(2).map(d => (d._1, d._2)): _*)
    val streamed = StreamOps.streamingNearDupCandidates(
      stream.toDF.toDF("doc_id", "text"), "doc_id", "text", p)
    val got = StreamOps.runToMemory(streamed.toDF(), "t_neardup", OutputMode.Append())
      .select("idA", "idB").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == viaState)
  }

  test("streamingEmbedNearDupCandidates: stream equals batch equals the SRP band join") {
    import graft.operators.SimilaritySearch.srpBandKeys
    // deterministic vectors; dups are uniformly scaled copies (scaling
    // preserves every SRP sign bit, so dup pairs are guaranteed
    // candidates in all bands)
    def vec(seed: Int): Seq[Float] = {
      val r = new scala.util.Random(seed)
      Seq.fill(16)(r.nextFloat() * 2f - 1f)
    }
    val base = (0L until 6L).map(i => (i, vec(i.toInt)))
    val dups = Seq(0L, 2L).map(i => (100L + i, vec(i.toInt).map(x => x * 1.001f)))
    val docs = base ++ dups
    val batchDf = docs.toDF("vec_id", "embedding")

    def pairSet(ds: org.apache.spark.sql.Dataset[StreamOps.StreamCandidate]): Set[(Long, Long)] =
      ds.collect().map(c => (c.idA, c.idB)).toSet

    val viaState = pairSet(StreamOps.streamingEmbedNearDupCandidates(
      batchDf, "vec_id", "embedding", dim = 16))
    val bands = batchDf.select(col("vec_id"),
        explode(srpBandKeys(col("embedding"), 16, nBands = 4, bitsPerBand = 8)).as("bk"))
      .select(col("vec_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val viaJoin = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id"), col("y.vec_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaState == viaJoin)
    assert(viaState.contains((0L, 100L)) && viaState.contains((2L, 102L)))

    // streamed in two micro-batches: the dup of doc 0 arrives a batch
    // later and must still pair against the retained bucket state
    val stream = MemoryStream[(Long, Seq[Float])]
    stream.addData(docs.take(6): _*)
    stream.addData(docs.drop(6): _*)
    val streamed = StreamOps.streamingEmbedNearDupCandidates(
      stream.toDF.toDF("vec_id", "embedding"), "vec_id", "embedding", dim = 16)
    val got = StreamOps.runToMemory(streamed.toDF(), "t_embed_neardup", OutputMode.Append())
      .select("idA", "idB").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == viaState)
  }

  test("streamingNearDupCandidates TTL evicts idle bucket state") {
    // A processing-time-TTL query never quiesces (the state operator
    // requests a batch every trigger so wall-clock timers can fire —
    // Spark semantics), so processAllAvailable would block forever;
    // this spec polls the memory sink instead. Plan: docs 0,1
    // (near-dups) seed buckets and emit (0,1); after the TTL the
    // batch churn fires the timers and evicts the buckets; docs 3,4
    // (dups of 0 AND of each other) then emit (3,4) — proving their
    // batch ran — but nothing against the evicted 0/1.
    val mk = (s: String) => s + " the quick brown fox jumps over the lazy dog again and again"
    val p = graft.operators.LshDedup.Params()
    val stream = MemoryStream[(Long, String)]
    val streamed = StreamOps.streamingNearDupCandidates(
      stream.toDF.toDF("doc_id", "text"), "doc_id", "text", p,
      ttl = Some("500 milliseconds"))
    val q = streamed.toDF().writeStream.format("memory")
      .queryName("t_neardup_ttl").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      .start()
    def pairs(): Set[(Long, Long)] = spark.table("t_neardup_ttl")
      .select("idA", "idB").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def awaitPair(pr: (Long, Long)): Unit = {
      val deadline = System.nanoTime() + 60e9.toLong
      while (!pairs().contains(pr)) {
        assert(System.nanoTime() < deadline, s"timed out waiting for $pr; got ${pairs()}")
        assert(q.exception.isEmpty, q.exception)
        Thread.sleep(100)
      }
    }
    stream.addData((0L, mk("alpha beta gamma delta epsilon zeta")),
      (1L, mk("alpha beta gamma delta epsilon zeta")))
    awaitPair((0L, 1L))
    Thread.sleep(2000) // > TTL + several triggers: timers fire, buckets evict
    stream.addData((3L, mk("alpha beta gamma delta epsilon zeta")),
      (4L, mk("alpha beta gamma delta epsilon zeta")))
    awaitPair((3L, 4L))
    q.stop()
    assert(pairs() == Set((0L, 1L), (3L, 4L)), pairs())
  }

  test("curation projections are mode-agnostic: PII redact + quality on a stream") {
    import graft.functions.TextFunctions
    val docs = Seq(
      (0L, "contact me at bob@example.com or 555-123-4567 thanks"),
      (1L, "server at 10.0.0.1 logged the the the the repeated words"),
      (2L, "clean text with nothing sensitive at all"))
    def curate(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      TextFunctions.redactPii(col("text")).as("clean"),
      TextFunctions.piiCount(col("text"),
        TextFunctions.PiiEmailPattern).as("n_email"),
      TextFunctions.maxRunLength(array_sort(split(col("text"), " ")))
        .as("max_run"),
      // r11 kernels are stateless projections too — streamable as-is
      TextFunctions.charEntropy(col("text")).getField("entropy").as("ent"),
      graft.functions.AhoCorasick.matchedPatternIndices(col("text"),
        Seq("repeated", "sensitive", "absent phrase")).as("blocked"))
    val expected = curate(docs.toDF("doc_id", "text"))
      .collect().map(_.toSeq).toSet
    val stream = MemoryStream[(Long, String)]
    stream.addData(docs: _*)
    val got = StreamOps.runToMemory(
        curate(stream.toDF.toDF("doc_id", "text")),
        "t_curation", OutputMode.Append())
      .collect().map(_.toSeq).toSet
    assert(got == expected)
    assert(expected.exists(_.exists(v =>
      v.toString.contains("<EMAIL>") && v.toString.contains("<PHONE>"))))
  }

  test("r12 projections are mode-agnostic: text clean + classifier + luhn on a stream") {
    import graft.functions.TextFunctions
    val docs = Seq(
      (0L, "mojibake cafÃ© tail card 4242424242424242 ok"),
      (1L, "plain words only card 4242424242424243 no"),
      (2L, "the quick brown fox jumps again and again"))
    def curate(df: org.apache.spark.sql.DataFrame) = {
      val toks = split(col("text"), " ")
      val feats = array_distinct(concat(toks, TextFunctions.gramStrings(toks, 2)))
      val hs = TextFunctions.hashedGrams(feats, TextFunctions.Md5Hash, 60)
      df.select(col("doc_id"),
        TextFunctions.mojibakeRepair(col("text")).as("clean"),
        TextFunctions.luhnValid(
          regexp_extract(col("text"), "\\d{16}", 0)).as("card_ok"),
        TextFunctions.featureWeightSum(hs, 4096,
          TextFunctions.uhashA(7), TextFunctions.uhashB(7))
          .getField("wsum_milli").as("w"))
    }
    val expected = curate(docs.toDF("doc_id", "text"))
      .collect().map(_.toSeq).toSet
    val stream = MemoryStream[(Long, String)]
    stream.addData(docs: _*)
    val got = StreamOps.runToMemory(
        curate(stream.toDF.toDF("doc_id", "text")),
        "t_curation12", OutputMode.Append())
      .collect().map(_.toSeq).toSet
    assert(got == expected)
    assert(expected.exists(_.exists(v => v.toString.contains("café"))))
    assert(expected.exists(r => r(2) == true) && expected.exists(r => r(2) == false))
  }

  test("streamingDecontaminate: stream equals batch; clean docs emit nothing") {
    // eval docs carry known 5-grams; train doc 11 repeats eval doc 0's
    // opening 5-gram verbatim, 12 shares one with eval doc 10, 13+14
    // are clean (distinct vocabularies)
    val evalDocs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (10L, "one two three four five six seven eight"))
    val trainDocs = Seq(
      (11L, "noise alpha beta gamma delta epsilon more noise"),
      (12L, "pad pad two three four five six pad"),
      (13L, "completely different clean words nothing shared here"),
      (14L, "another spotless document with private vocabulary only"))
    import graft.functions.TextFunctions
    val evalG = evalDocs.toDF("doc_id", "text")
      .select(explode(transform(TextFunctions.shingles(col("text"), 5),
        g => TextFunctions.portableHash(g, TextFunctions.Xx64Hash))).as("g"))
    // mode-agnostic operator: batch invocation is the expectation
    val expected = StreamOps.streamingDecontaminate(
        trainDocs.toDF("doc_id", "text"), "doc_id", "text", evalG)
      .collect().map(_.toSeq).toSet
    val stream = MemoryStream[(Long, String)]
    stream.addData(trainDocs: _*)
    val got = StreamOps.runToMemory(
        StreamOps.streamingDecontaminate(
          stream.toDF.toDF("doc_id", "text"), "doc_id", "text", evalG),
        "t_decon", OutputMode.Append())
      .collect().map(_.toSeq).toSet
    assert(got == expected)
    val contaminated = got.map(_.head.asInstanceOf[Long])
    assert(contaminated == Set(11L, 12L), s"got $contaminated")
  }

  test("streamingIncrementalDedup: stream equals batch; only unseen docs pass") {
    import graft.functions.TextFunctions
    val oldCorpus = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "one two three four"))
    val increment = Seq(
      (30L, "alpha beta gamma delta"),   // exact copy of old doc 1 -> dropped
      (31L, "fresh new document text"),  // unseen -> passes
      (32L, "one two three four"),       // exact copy of old doc 2 -> dropped
      (33L, "another unseen document"))  // unseen -> passes
    val oldHashes = oldCorpus.toDF("doc_id", "text")
      .select(TextFunctions.portableHash(col("text"), TextFunctions.Xx64Hash).as("h"))
    val expected = StreamOps.streamingIncrementalDedup(
        increment.toDF("doc_id", "text"), "doc_id", "text", oldHashes)
      .collect().map(_.toSeq).toSet
    val stream = MemoryStream[(Long, String)]
    stream.addData(increment: _*)
    val got = StreamOps.runToMemory(
        StreamOps.streamingIncrementalDedup(
          stream.toDF.toDF("doc_id", "text"), "doc_id", "text", oldHashes),
        "t_incdedup", OutputMode.Append())
      .collect().map(_.toSeq).toSet
    assert(got == expected)
    assert(got.map(_.head.asInstanceOf[Long]) == Set(31L, 33L))
  }

  test("streamingSimhashNearDupCandidates: stream equals batch equals band join") {
    import graft.functions.TextFunctions._
    // docs 0/1 and 2/3 are word-level near-identical (one token
    // changed) so their simhashes share bands; doc 4 is disjoint text
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota mu"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "one two three four five six seven eight nine eleven"),
      (4L, "completely different vocabulary with other words entirely used here now"))
    val batchDf = docs.toDF("doc_id", "text")
    val viaState = StreamOps.streamingSimhashNearDupCandidates(
        batchDf, "doc_id", "text")
      .collect().map(c => (c.idA, c.idB)).toSet
    // reference: the batch band self-join over the same 4x8 banding
    val sh = batchDf.select(col("doc_id"),
      simhashFromHashes(tokenHashes(tokens(col("text"))), 32).as("sh"))
    val bands = sh.select(col("doc_id"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sh"), b * 8).bitwiseAND(lit(0xffL))): _*))
        .as(Seq("band", "bval")))
    val viaJoin = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bval") === col("y.bval") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaState == viaJoin)
    assert(viaState.contains((0L, 1L)) && viaState.contains((2L, 3L)))

    // streamed in two micro-batches: cross-batch pairs still found
    val stream = MemoryStream[(Long, String)]
    stream.addData(docs.take(2): _*)
    stream.addData(docs.drop(2): _*)
    val got = StreamOps.runToMemory(
        StreamOps.streamingSimhashNearDupCandidates(
          stream.toDF.toDF("doc_id", "text"), "doc_id", "text").toDF(),
        "t_simhash_neardup", OutputMode.Append())
      .select("idA", "idB").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == viaState)
  }

  test("streamingParagraphDedup: stream equals batch, cross-batch dups dropped") {
    // doc 0 and doc 2 share the "cookie banner" paragraph; doc 1 and
    // doc 3 share "newsletter"; doc 3 arrives in a LATER micro-batch
    // so its duplicate must be dropped against batch-1 state
    val docs = Seq(
      (0L, "alpha beta\ncookie banner\ngamma"),
      (1L, "newsletter\ndelta"),
      (2L, "cookie banner\nepsilon"),
      (3L, "zeta\nnewsletter"))
    val batchKept = StreamOps.streamingParagraphDedup(
        docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
    // 9 paragraphs, 2 duplicates -> 7 distinct survive
    assert(batchKept.length == 7)
    val batchHashes = batchKept.map(_.getAs[Long]("para_hash")).toSet
    assert(batchHashes.size == 7)

    val stream = MemoryStream[(Long, String)]
    stream.addData(docs.take(2): _*)
    stream.addData(docs.drop(2): _*)
    val got = StreamOps.runToMemory(
        StreamOps.streamingParagraphDedup(
          stream.toDF.toDF("doc_id", "text"), "doc_id", "text"),
        "t_paradedup", OutputMode.Append())
      .collect()
    assert(got.length == 7)
    assert(got.map(_.getAs[Long]("para_hash")).toSet == batchHashes)
    // the cross-batch duplicates (docs 2/3 re-sending batch-1
    // paragraphs) were dropped against state, not re-emitted
    val keptByDoc = got.groupBy(_.getAs[Long]("doc_id")).view.mapValues(_.length).toMap
    assert(keptByDoc == Map(0L -> 3, 1L -> 2, 2L -> 1, 3L -> 1))
  }
}
