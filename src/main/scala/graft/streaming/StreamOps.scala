package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operator library — a NEW capability relative to
  * the reference, which has no streaming subsystem (SURVEY.md §2.10:
  * closest analogs are chunked pull iteration, core/dataframe.py:3112
  * evaluate_iterator, and BinnerTime resampling, core/groupby.py:64).
  *
  * Design rule: every transform here is *execution-mode agnostic* — a
  * pure `DataFrame => DataFrame` over event-time columns that Spark
  * runs identically on a batch frame or a stream (the unified Dataset
  * model). That gives us the reference repo's representation-
  * parametrized testing idea (tests/common.py:228-260) for free:
  * correctness of the streaming operators is gated batch-side by the
  * DuckDB oracle, and the stream path is asserted equal to the batch
  * path in `StreamingSpec` via MemoryStream.
  *
  * Scale notes: windowed aggregations shuffle by (window, keys) — the
  * same partial/final hash agg as batch groupBy; watermarks bound state
  * size so a 1000-executor job with unbounded input holds only
  * in-flight windows in the state store.
  */
object StreamOps {

  /** Tumbling event-time window aggregation. On a stream, pair with
    * `withEventTimeWatermark` so closed windows are emitted and evicted. */
  def tumblingAgg(events: DataFrame, tsCol: String, windowLength: String,
                  keyCols: Seq[String], aggs: Seq[Column]): DataFrame = {
    val keys = window(col(tsCol), windowLength) +: keyCols.map(col)
    events.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")
  }

  /** Sliding window (length, slide) event-time aggregation. */
  def slidingAgg(events: DataFrame, tsCol: String, windowLength: String,
                 slide: String, keyCols: Seq[String], aggs: Seq[Column]): DataFrame = {
    val keys = window(col(tsCol), windowLength, slide) +: keyCols.map(col)
    events.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")
  }

  /** Session windows with an inactivity gap — Spark's native
    * `session_window` (merging windows), usable in batch AND stream.
    * Semantically equal to the gaps-and-islands rewrite the batch
    * battery oracle-checks (WindowQueries.q_sessionize). */
  def sessionAgg(events: DataFrame, tsCol: String, gap: String,
                 keyCols: Seq[String], aggs: Seq[Column]): DataFrame = {
    val keys = session_window(col(tsCol), gap) +: keyCols.map(col)
    events.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("session_window.start"))
      .withColumn("session_end", col("session_window.end"))
      .drop("session_window")
  }

  /** Attach an event-time watermark (stream only — on a batch frame
    * Spark ignores it, keeping mode-agnosticism). */
  /** Streaming exact dedup — the streaming face of the training-data
    * dedup pipeline: drop repeat keys (e.g. content fingerprints from
    * TextFunctions.portableHash) as records arrive. With a watermark,
    * `withinWatermark = true` bounds the dedup state store to the
    * watermark horizon (Spark evicts expired keys), which is the only
    * shape that survives an unbounded 100 TB/day stream; without it
    * state grows forever (batch mode: plain dropDuplicates). */
  def dedupByKey(df: DataFrame, keyCols: Seq[String],
                 withinWatermark: Boolean = false): DataFrame =
    if (withinWatermark) df.dropDuplicatesWithinWatermark(keyCols)
    else df.dropDuplicates(keyCols)

  def withEventTimeWatermark(df: DataFrame, tsCol: String, delay: String): DataFrame =
    df.withWatermark(tsCol, delay)

  // ------------------------------------------------------------ joins

  /** Stream-static enrichment join: each micro-batch joins against the
    * (small) static dimension, broadcast to every executor — no state
    * store, no shuffle of the stream side. The standard "attach
    * user/document metadata to an event firehose" shape; on a batch
    * frame it is a plain broadcast join, keeping mode-agnosticism. */
  def enrichJoin(stream: DataFrame, dim: DataFrame, on: Column,
                 how: String = "inner"): DataFrame =
    stream.join(broadcast(dim), on, how)

  /** Stream-static SCD2 (slowly-changing dimension, type 2) enrich:
    * each event joins the dimension VERSION valid at its event time —
    * equi key plus a validity-interval condition over the dimension's
    * `[validFrom, validTo)` columns. Stateless on a streaming left
    * (stream-static join: no watermark, append mode); the validity
    * predicate rides the broadcast equi join as a post-join filter,
    * so the plan stays a key join at any dimension size. The standard
    * "attach the customer record AS OF the event" shape — a plain
    * equi enrich silently serves today's attributes for yesterday's
    * events. */
  def scd2Enrich(events: DataFrame, dim: DataFrame, keys: Seq[String],
                 eventTs: String, validFrom: String, validTo: String,
                 how: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "scd2Enrich: at least one equi key required")
    val cond = keys.map(k => events(k) === dim(k)).reduce(_ && _) &&
      events(eventTs) >= dim(validFrom) && events(eventTs) < dim(validTo)
    // drop the dim's key copies so downstream col("key") stays
    // unambiguous (the using-join schema contract enrichJoin users
    // expect); the validity predicate stays in the join condition,
    // which outer-join correctness requires
    keys.foldLeft(events.join(broadcast(dim), cond, how))((d, k) => d.drop(dim(k)))
  }

  /** Stream-stream interval join: pairs of (left, right) rows with
    * equal keys where the right event lands in [leftTs, leftTs +
    * maxDelay]. On streams BOTH sides must carry watermarks
    * (`withEventTimeWatermark`); the time bound is what lets Spark
    * evict buffered rows once the watermark passes leftTs + maxDelay —
    * state is O(events within the horizon), not O(stream). On batch
    * frames the same expression is an ordinary range join, so the
    * logic is oracle-checkable batch-side. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyEq: Column,
                   leftTs: String, rightTs: String, maxDelay: String): DataFrame =
    left.join(right, keyEq &&
      col(rightTs) >= col(leftTs) &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $maxDelay"))

  // ------------------------------------------------------------ stateful

  /** One token-shard's sketch state: flattened d x m count-min cells
    * plus the current candidates (token -> 28-bit base hash, carried
    * so emission never recomputes MD5). */
  case class HHState(cells: Array[Long], candidates: Map[String, Long])
  case class HHOut(shard: Int, token: String, cms_est: Long)

  /** Streaming heavy hitters over a token stream with BOUNDED state —
    * the sketch-in-streaming shape of the oracle-gated batch lane
    * (q_heavy_hitters_cms; Cormode & Muthukrishnan 2005): tokens group
    * by a fixed hash shard, each shard's state is ONE count-min sketch
    * (d x m cells, the SAME md5-prefix + Carter-Wegman hash family as
    * the batch lane — TextKernels.md5Base28 is spec-pinned
    * bit-identical to the Column formulation) plus the current top-k
    * candidate tokens by estimate. Total state is O(groups * (d*m +
    * k)) REGARDLESS of vocabulary — the shape that survives an
    * unbounded stream where exact per-token counts grow without
    * bound. Emits each shard's top-k (token, estimate) per trigger
    * (Update mode). Estimates are the CMS min-over-rows (order-free,
    * so stream == batch exactly); the candidate LIST is exact while a
    * shard holds <= k distinct tokens and an estimate-ranked superset
    * cap beyond that (CMS never undercounts).
    *
    * Mode-agnostic: on a batch Dataset the same mapGroupsWithState
    * runs once per shard with empty prior state. */
  def streamingHeavyHitters(tokens: org.apache.spark.sql.Dataset[String],
                            groups: Int, k: Int,
                            d: Int = 4, m: Int = 256)
  : org.apache.spark.sql.Dataset[HHOut] = {
    require(groups >= 1 && k >= 1 && d >= 1 && m >= 1)
    import tokens.sparkSession.implicits._
    import graft.functions.{TextFunctions, TextKernels}
    val (dd, mm, kk) = (d, m, k)
    val as = (0 until dd).map(TextFunctions.uhashA).toArray
    val bs = (0 until dd).map(TextFunctions.uhashB).toArray
    val p = TextFunctions.UHASH_P
    // hash ONCE per occurrence; the base rides alongside the token
    // through grouping, sketch updates and candidate estimates
    tokens.map(t => (t, TextKernels.md5Base28(t)))
      .groupByKey { case (_, base) => Math.floorMod(base, groups.toLong).toInt }
      .mapGroupsWithState[HHState, List[HHOut]](GroupStateTimeout.NoTimeout()) {
        (shard: Int, it: Iterator[(String, Long)], state: GroupState[HHState]) =>
          val prev = state.getOption.getOrElse(
            HHState(new Array[Long](dd * mm), Map.empty))
          val cells = prev.cells.clone()
          var cand = prev.candidates
          it.foreach { case (t, base) =>
            var j = 0
            while (j < dd) {
              cells(j * mm + ((as(j) * base + bs(j)) % p % mm).toInt) += 1L
              j += 1
            }
            if (!cand.contains(t)) cand = cand.updated(t, base)
          }
          def est(base: Long): Long = {
            var e = Long.MaxValue
            var j = 0
            while (j < dd) {
              val c = cells(j * mm + ((as(j) * base + bs(j)) % p % mm).toInt)
              if (c < e) e = c
              j += 1
            }
            e
          }
          val kept = cand.toSeq.map { case (t, b) => (t, b, est(b)) }
            .sortBy { case (t, _, e) => (-e, t) }.take(kk)
          state.update(HHState(cells, kept.map(x => x._1 -> x._2).toMap))
          kept.map { case (t, _, e) => HHOut(shard, t, e) }.toList
      }.flatMap(identity)
  }

  /** One funnel input event: `stage` is the 0-based index in the
    * stage list (-1 for non-stage events — they keep the user visible
    * with reached = 0 but never advance), `tsUs` exact integer event
    * time in microseconds. */
  case class FunnelEvent(user: Long, stage: Int, tsUs: Long)
  case class FunnelState(reached: Int, lastUs: Long)
  case class FunnelOut(user_id: Long, reached: Int, last_us: Long)

  /** Streaming ordered funnel with O(1) state per user: each user's
    * state is (stages reached, timestamp of the last completion).
    * Events within a trigger are processed in (tsUs, stage) order and
    * advance the funnel greedily — the NEXT stage with a STRICTLY
    * later timestamp. Processing time-ordered events greedily is
    * EXACTLY the batch min-chain funnel (c(k) = min ts of stage-k
    * events with ts > c(k-1)): the first qualifying event met in time
    * order IS the minimum, and a completed c(k) can never be improved
    * by later-in-time events. Hence on a batch Dataset (one trigger
    * holding everything) this equals operators.EventOps.funnel's
    * per-user chain, which is what the q_stream_funnel oracle gates;
    * on a stream it stays exact while events arrive in event-time
    * order across triggers, and degrades gracefully (a late
    * cross-trigger event may miss an already-completed earlier stage
    * — the documented bounded-state tradeoff; exact late-data
    * semantics would require retaining per-stage event sets, i.e.
    * unbounded state). Emits each user's current state per trigger
    * (Update mode). */
  def streamingFunnel(events: org.apache.spark.sql.Dataset[FunnelEvent],
                      nStages: Int)
  : org.apache.spark.sql.Dataset[FunnelOut] = {
    require(nStages >= 1, "streamingFunnel: need at least one stage")
    import events.sparkSession.implicits._
    events.groupByKey(_.user)
      .mapGroupsWithState[FunnelState, FunnelOut](GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          var s = state.getOption.getOrElse(FunnelState(0, 0L))
          // per-trigger sort: the iterator's order is partition order,
          // not event time (a trigger's batch is bounded, so this is
          // bounded work — never cross-trigger history)
          it.toSeq.sortBy(e => (e.tsUs, e.stage)).foreach { e =>
            if (s.reached < nStages && e.stage == s.reached &&
                (s.reached == 0 || e.tsUs > s.lastUs))
              s = FunnelState(s.reached + 1, e.tsUs)
          }
          state.update(s)
          FunnelOut(user, s.reached, s.lastUs)
      }
  }

  /** Per-key running aggregate state for mapGroupsWithState. */
  case class RunningState(n: Long, sum: Double, max: Double)
  case class KeyedValue(key: Long, value: Double)
  case class RunningResult(key: Long, n: Long, sum: Double, max: Double, mean: Double)

  /** Custom stateful operator: per-key running count/sum/max/mean via
    * `mapGroupsWithState` — the Structured Streaming analog of a
    * vaex-style incremental statistic (reference: incremental ML,
    * ml/transformations.py:134 PCAIncremental, is the closest thing the
    * reference has to stateful updates). State is one small record per
    * key, partitioned by key across executors — O(distinct keys) total,
    * no history retained. */
  def runningStats(input: org.apache.spark.sql.Dataset[KeyedValue])
  : org.apache.spark.sql.Dataset[RunningResult] = {
    import input.sparkSession.implicits._
    input.groupByKey(_.key)
      .mapGroupsWithState[RunningState, RunningResult](GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[KeyedValue], state: GroupState[RunningState]) =>
          val prev = state.getOption.getOrElse(RunningState(0L, 0.0, Double.NegativeInfinity))
          val next = rows.foldLeft(prev) { (acc, r) =>
            RunningState(acc.n + 1, acc.sum + r.value, math.max(acc.max, r.value))
          }
          state.update(next)
          RunningResult(key, next.n, next.sum, next.max, next.sum / next.n)
      }
  }

  case class BandEntry(band: Int, bkey: Long, docId: Long)
  case class StreamCandidate(idA: Long, idB: Long, band: Int)

  /** STREAMING near-duplicate candidate filter: MinHash-LSH composed
    * with `flatMapGroupsWithState` — each LSH bucket (band, key) keeps
    * the doc ids seen so far; a new arrival emits candidate pairs
    * against every prior member of its bucket. The streaming analog of
    * the batch band self-join ([[graft.operators.LshDedup]]): same
    * candidate contract, but incremental — a document stream is
    * checked against everything already ingested without re-scanning
    * history. Downstream, verify candidates batch-side (jaccard over
    * hash sets) exactly as the batch pipeline does.
    *
    * Scale/state: state is O(min(bucket size, `maxBucketSize`) doc
    * ids) per occupied bucket, partitioned by bucket key across
    * executors; `maxBucketSize` caps degenerate hot buckets (a bucket
    * that hot is a near-dup CLUSTER — its membership is already fully
    * paired; which member ids survive the cap depends on arrival
    * order).
    *
    * Horizon: with `ttl = None` buckets live for the stream's life —
    * fine for a bounded backfill, unbounded state for infinite ingest.
    * Pass `ttl = Some("7 days")` for a processing-time horizon: a
    * bucket idle longer than the TTL is evicted (Spark fires the
    * timeout on the next micro-batch), so state is bounded by the
    * ingest rate times the horizon and a re-arrival after eviction
    * simply reseeds the bucket (near-dups farther apart than the TTL
    * are no longer candidates — the documented trade). Batch frames
    * ignore timeouts (Spark semantics), so stream==batch still holds
    * for the no-TTL contract.
    *
    * Deployment note: with a processing-time timeout the state
    * operator requests a micro-batch EVERY trigger so wall-clock
    * timers can fire (Spark semantics — the query never quiesces and
    * `processAllAvailable` never returns). Always pair a TTL with a
    * real `Trigger.ProcessingTime(...)` interval; the default ASAP
    * trigger busy-loops empty batches. */
  def streamingNearDupCandidates(docs: DataFrame, idCol: String, textCol: String,
                                 p: graft.operators.LshDedup.Params =
                                   graft.operators.LshDedup.Params(),
                                 maxBucketSize: Int = 64,
                                 ttl: Option[String] = None)
  : org.apache.spark.sql.Dataset[StreamCandidate] = {
    import docs.sparkSession.implicits._
    val entries = graft.operators.LshDedup.bandEntries(docs, idCol, textCol, p)
      .select(col("band").cast("int").as("band"), col("bkey").cast("long").as("bkey"),
        col("doc_id").cast("long").as("docId"))
      .as[BandEntry]
    bucketCandidateFilter(entries, maxBucketSize, ttl)
  }

  /** STREAMING near-duplicate candidate filter for EMBEDDINGS: the
    * SRP (hyperplane) LSH band keys of
    * [[graft.operators.SimilaritySearch.srpBandKeys]] fed through the
    * same capped/TTL'd bucket state as the text MinHash filter — an
    * embedding stream is checked against everything already ingested
    * without re-scanning history. The signature is a pure projection
    * (zero shuffle); only (id, band, key) rows reach the state store.
    * Same contract as [[streamingNearDupCandidates]]: candidate pairs
    * only — verify with exact cosine downstream, batch-side the pair
    * set equals the batch band self-join (spec-asserted). */
  def streamingEmbedNearDupCandidates(docs: DataFrame, idCol: String,
                                      embCol: String, dim: Int,
                                      nBands: Int = 4, bitsPerBand: Int = 8,
                                      maxBucketSize: Int = 64,
                                      ttl: Option[String] = None)
  : org.apache.spark.sql.Dataset[StreamCandidate] = {
    import docs.sparkSession.implicits._
    val entries = docs.select(col(idCol).cast("long").as("docId"),
        explode(graft.operators.SimilaritySearch.srpBandKeys(
          col(embCol), dim, nBands, bitsPerBand)).as("bk"))
      .select(col("bk.band").cast("int").as("band"),
        col("bk.bkey").cast("long").as("bkey"), col("docId"))
      .as[BandEntry]
    bucketCandidateFilter(entries, maxBucketSize, ttl)
  }

  /** STREAMING SimHash-banded near-dup candidates (the Manku design's
    * streaming face, matching batch q_simhash_neardup): each doc's
    * 32-bit simhash splits into 4 x 8-bit bands, so the candidate set
    * is COMPLETE for pairs within hamming distance 3 (pigeonhole:
    * d < B); pairs flow through the same capped/TTL'd bucket state as
    * the MinHash and SRP filters. Verify survivors with popcount on
    * the fingerprints downstream. */
  def streamingSimhashNearDupCandidates(docs: DataFrame, idCol: String,
                                        textCol: String,
                                        maxBucketSize: Int = 64,
                                        ttl: Option[String] = None)
  : org.apache.spark.sql.Dataset[StreamCandidate] = {
    import docs.sparkSession.implicits._
    import graft.functions.TextFunctions._
    val sh = simhashFromHashes(tokenHashes(tokens(col(textCol))), 32)
    val entries = docs.select(col(idCol).cast("long").as("docId"), sh.as("__sh"))
      .select(col("docId"), posexplode(array((0 until 4).map(b =>
        shiftright(col("__sh"), b * 8).bitwiseAND(lit(0xffL))): _*))
        .as(Seq("band", "bkey")))
      .select(col("band").cast("int").as("band"),
        col("bkey").cast("long").as("bkey"), col("docId"))
      .as[BandEntry]
    bucketCandidateFilter(entries, maxBucketSize, ttl)
  }

  /** Shared LSH-bucket membership state: each (band, key) bucket keeps
    * up to `maxBucketSize` member ids; a new arrival emits candidate
    * pairs against every prior member. See
    * [[streamingNearDupCandidates]] for the state/horizon contract. */
  private def bucketCandidateFilter(entries: org.apache.spark.sql.Dataset[BandEntry],
                                    maxBucketSize: Int, ttl: Option[String])
  : org.apache.spark.sql.Dataset[StreamCandidate] = {
    import entries.sparkSession.implicits._
    val timeout =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    entries.groupByKey(e => (e.band, e.bkey))
      .flatMapGroupsWithState[Seq[Long], StreamCandidate](
        OutputMode.Append(), timeout) {
        case ((band, _), rows, state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // state stays an insertion-ordered Seq (stable cap
            // semantics + cheap encoder); membership checks go through
            // a set so each arrival is O(1), not O(bucket)
            val seen = scala.collection.mutable.ArrayBuffer.from(
              state.getOption.getOrElse(Seq.empty[Long]))
            val member = scala.collection.mutable.HashSet.from(seen)
            val out = Seq.newBuilder[StreamCandidate]
            rows.foreach { e =>
              if (!member.contains(e.docId)) {
                seen.foreach(s => out += StreamCandidate(
                  math.min(s, e.docId), math.max(s, e.docId), band))
                if (member.size < maxBucketSize) {
                  member += e.docId; seen += e.docId
                }
              }
            }
            state.update(seen.toSeq)
            ttl.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }

  /** STREAMING benchmark decontamination — the ingest-time guard the
    * batch lanes (`q_decontaminate_*`) imply: every arriving document
    * is screened against a STATIC eval-set gram dictionary and its
    * exactly-matching grams are emitted as (doc_id, g) rows.
    *
    * Fully STATELESS (append mode, no watermark, no aggregation
    * state): the broadcast Bloom filter over the eval grams — built
    * once at query start, word-wise-OR distributed build — screens
    * each doc's gram array in a zero-shuffle codegen'd projection, so
    * a clean doc (the overwhelming majority) contributes NOTHING
    * downstream; only bloom survivors explode into the stream-static
    * LEFT SEMI join that removes the ~0.05% false positives. Any
    * emitted row means "this doc shares this gram with the eval set";
    * per-doc aggregation (count, frac) is the consumer's choice of
    * state regime — `dedupByKey(_, Seq("doc_id"))` gives the bounded
    * "contaminated doc ids" stream.
    *
    * Mode-agnostic: pass a batch frame and the same plan runs as a
    * batch query (the stream==batch spec relies on this). */
  def streamingDecontaminate(docs: DataFrame, idCol: String, textCol: String,
                             evalGramHashes: DataFrame, gramN: Int = 5): DataFrame = {
    import graft.functions.{BloomFunctions, TextFunctions}
    val gcol = evalGramHashes.columns.head
    val evalG = evalGramHashes.select(col(gcol).cast("bigint").as("g")).distinct()
    // one persisted pass sizes AND builds the broadcast filter (the
    // distinct-gram shuffle would otherwise recompute per pass); the
    // semi-join below still re-derives evalG per micro-batch — the
    // standard stream-static shape; callers keeping a long-lived
    // query over an expensive dictionary should persist it themselves
    val bloom = BloomFunctions.buildSizedBloom(evalG, col("g"))
    val grams = docs.select(col(idCol).as("doc_id"),
      TextFunctions.hashedGrams(
        TextFunctions.shingles(col(textCol), gramN),
        TextFunctions.Xx64Hash).as("__g"))
    grams
      .select(col("doc_id"),
        explode(BloomFunctions.bloomFilterCandidates(col("__g"), bloom)).as("g"))
      .join(evalG, Seq("g"), "left_semi")
      .select("doc_id", "g")
  }

  /** Streaming incremental dedup — the streaming face of
    * q_incremental_dedup (the RETRO/CCNet cross-snapshot pass): every
    * arriving document's 60-bit content hash (portableHash's masked
    * xxhash64 — NOT raw 64-bit xxhash64, whose negative values would
    * never match) is probed against the
    * PREVIOUS corpus snapshot's hash dictionary; only unseen documents
    * pass. Fully stateless (append mode, no watermark): the dictionary
    * is a static frame re-read per micro-batch, and the join is
    * stream-static LEFT OUTER + null filter (the supported stream
    * shape for an anti join). Mode-agnostic — a batch frame runs the
    * identical plan, so the stream==batch spec is one collect. At
    * scale the dictionary side gets a broadcast bloom prefilter
    * exactly like [[streamingDecontaminate]].
    *
    * `oldHashes`: single-column frame of the previous snapshot's
    * 60-bit text hashes — build with
    * `old.select(portableHash(col(text), Xx64Hash))` so both sides
    * hash in the same masked domain. */
  def streamingIncrementalDedup(docs: DataFrame, idCol: String,
      textCol: String, oldHashes: DataFrame): DataFrame = {
    import graft.functions.TextFunctions
    val hcol = oldHashes.columns.head
    val oldH = oldHashes.select(col(hcol).cast("bigint").as("h")).distinct()
      .withColumn("__seen", lit(1))
    docs.select(col(idCol).as("doc_id"),
        TextFunctions.portableHash(col(textCol), TextFunctions.Xx64Hash).as("h"))
      .join(oldH, Seq("h"), "left")
      .where(col("__seen").isNull)
      .select("doc_id", "h")
  }

  /** Streaming corpus-level paragraph dedup — the streaming face of
    * q_paragraph_dedup (the CCNet pass): split each arriving doc into
    * paragraphs, hash them, and emit only paragraphs whose hash has
    * not been seen before. State = one 64-bit hash per distinct
    * paragraph ever kept; `withinWatermark = true` bounds it to the
    * watermark horizon (the only shape that survives an unbounded
    * stream — cross-horizon boilerplate then dedups per horizon,
    * which is the deliberate CCNet trade: shard-local dedup).
    *
    * Mode-agnostic: a batch frame runs the same plan as a plain
    * dropDuplicates (which batch-keeps an arbitrary occurrence —
    * compare kept hash SETS, not row identity, across modes).
    *
    * `sep` is a Java REGEX (Spark `split` semantics) — callers
    * splitting on a literal metacharacter like "." or "|" must
    * `Pattern.quote` it; the default "\n" and the common "\n{2,}"
    * paragraph split both read naturally as regexes. */
  def streamingParagraphDedup(docs: DataFrame, idCol: String, textCol: String,
                              sep: String = "\n",
                              withinWatermark: Boolean = false): DataFrame = {
    val shaped = docs
      .select(col("*"), posexplode(split(col(textCol), sep)).as(Seq("idx", "para")))
      .select(col(idCol).as("doc_id"), col("idx"), col("para"),
        xxhash64(col("para")).as("para_hash"))
    dedupByKey(shaped, Seq("para_hash"), withinWatermark)
  }

  /** Stream-sink helper: run a streaming frame to completion against a
    * memory sink and return the collected table (test/driver utility). */
  def runToMemory(streamed: DataFrame, name: String, outputMode: OutputMode): DataFrame = {
    val q = streamed.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    streamed.sparkSession.table(name)
  }
}
