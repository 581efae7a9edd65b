package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Q._

/** Reader-path queries (SURVEY §2.1): the same aggregation shape as
  * q1_agg, but the lineitem rows take a round trip through a text
  * format first (parquet -> csv/json on disk -> Spark reader), proving
  * the CSV/JSON readers preserve values bit-exactly (the oracle runs
  * against the ORIGINAL parquet). Double round-trips are lossless:
  * Spark writes shortest-round-trip representations and the readers
  * parse them back to identical IEEE doubles.
  */
object SourceQueries {

  // q_webdataset_mm persists its shard read (consumed twice); each
  // build rotates out the previous build's cache (tfidf discipline)
  private val wdsMmPersisted =
    new java.util.concurrent.atomic.AtomicReference[Seq[DataFrame]](Nil)

  private def cacheDir(dir: String, leaf: String): String =
    s"/tmp/graft_src_cache/${dir.replaceAll("[^A-Za-z0-9.]", "_")}/$leaf"

  private def narrowLineitem(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")

  private def agg(df: DataFrame): DataFrame =
    df.groupBy("l_returnflag", "l_linestatus")
      .agg(r(dsumD(col("l_quantity"))).as("sum_qty"),
        r(dsumD(col("l_extendedprice"))).as("sum_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")

  /** ONE embedding-table aggregate shared by the npz and safetensors
    * lanes (one oracle text — the formats must be invisible). */
  private def embedAgg(df: DataFrame): DataFrame =
    df.groupBy((col("vec_id") % 8).as("g"))
      .agg(count(lit(1)).as("n"),
        min(col("vec_id")).as("min_id"), max(col("vec_id")).as("max_id"),
        sum(col("label")).as("sum_label"),
        r(dsumD(element_at(col("embedding"), 1).cast("double"))).as("sum_first"),
        r(dsumD(element_at(col("embedding"), -1).cast("double"))).as("sum_last"))
      .orderBy("g")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // from_csv (reference: core/__init__.py:571): write lineitem as
    // headered CSV, read it back with schema inference, aggregate.
    "q_csv_agg" -> ((s, dir) => {
      val cache = cacheDir(dir, "lineitem_csv")
      narrowLineitem(s, dir).write.mode("overwrite").option("header", "true").csv(cache)
      agg(graft.sources.Readers.fromCsv(s, cache))
    }),

    // from_ascii (reference: core/__init__.py:460, dataset_misc.py:203):
    // whitespace-separated headered text round trip through
    // Export.toAscii/fromAscii; doubles survive via shortest-round-trip
    // formatting. Oracle runs on the ORIGINAL parquet.
    "q_ascii_agg" -> ((s, dir) => {
      val cache = cacheDir(dir, "lineitem_ascii")
      graft.sources.Export.toAscii(narrowLineitem(s, dir), cache)
      agg(graft.sources.Export.fromAscii(s, cache))
    }),

    // from_json (reference: core/__init__.py:493): JSON-lines round trip.
    "q_json_agg" -> ((s, dir) => {
      val cache = cacheDir(dir, "lineitem_json")
      narrowLineitem(s, dir).write.mode("overwrite").json(cache)
      agg(graft.sources.Readers.fromJson(s, cache))
    }),

    // ORC round trip (beyond reference — Spark-native columnar format,
    // dispatched by extension in Export.export / Readers.open). Oracle
    // runs on the ORIGINAL parquet.
    "q_orc_agg" -> ((s, dir) => {
      val cache = cacheDir(dir, "lineitem_orc") + "/t.orc"
      graft.sources.Export.export(narrowLineitem(s, dir), cache)
      agg(graft.sources.Readers.open(s, cache))
    }),

    // Avro round trip (beyond reference — the row-oriented interchange
    // format of the Kafka/Hadoop world; no spark-avro connector here,
    // so this is the dependency-free graft.sources.Avro path): export
    // a single container file with a SMALL sync interval (many blocks)
    // so the distributed sync-split reader genuinely exercises its
    // range logic, read it back, aggregate. Oracle runs on the
    // ORIGINAL parquet — a value error in either direction fails the
    // hash compare.
    "q_avro_agg" -> ((s, dir) => {
      val cache = cacheDir(dir, "lineitem_avro") + "/t.avro"
      graft.sources.Avro.toAvro(narrowLineitem(s, dir), cache,
        codec = Some("deflate"), syncInterval = 4096)
      agg(graft.sources.Readers.open(s, cache))
    }),

    // Avro temporal logical types: events (timestamp_ntz ts) round
    // trips through local-timestamp-micros; min/max of the decoded
    // timestamps hash-gate the micros conversion in both directions.
    "q_avro_events" -> ((s, dir) => {
      val cache = cacheDir(dir, "events_avro") + "/events.avro"
      graft.sources.Avro.toAvro(
        t(s, dir, "events").select("event_id", "ts", "user_id", "event_type", "value"),
        cache)
      graft.sources.Readers.open(s, cache)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          min(col("ts")).as("ts_min"), max(col("ts")).as("ts_max"),
          r(dsumD(col("value"))).as("sum_value"))
        .orderBy("event_type")
    }),

    // Avro nested type surface: struct, map, and decimal columns
    // survive the round trip (converter-tree encode/decode at every
    // nesting depth). The aggregate reads a struct FIELD, a map VALUE
    // and sums the decimal exactly, so a value error anywhere in the
    // nesting fails the hash compare against the ORIGINAL parquet.
    "q_avro_nested" -> ((s, dir) => {
      val cache = cacheDir(dir, "orders_avro_nested") + "/o.avro"
      val df = t(s, dir, "orders").select(
        col("o_orderkey"),
        struct(col("o_custkey").as("ck"), col("o_totalprice").as("tp")).as("st"),
        map(lit("p"), col("o_totalprice")).as("m"),
        col("o_totalprice").cast("decimal(12,2)").as("dec"))
      graft.sources.Avro.toAvro(df, cache, codec = Some("deflate"),
        syncInterval = 4096)
      graft.sources.Readers.open(s, cache)
        .groupBy((col("o_orderkey") % 7).as("g"))
        .agg(count(lit(1)).as("n"),
          r(dsumD(col("st.tp"))).as("sum_tp"),
          sum(col("st.ck")).as("sum_ck"),
          r(dsumD(element_at(col("m"), "p"))).as("sum_m"),
          sum(col("dec")).cast("double").as("sum_dec"))
        .orderBy("g")
    }),

    // Real WARC FILES (the r12 verdict's top missing piece): documents
    // become WARC/1.0 records sharded as per-record-gzip `.warc.gz`
    // (the Common Crawl physical form), then read back through the
    // glob + distributed member-scan split reader and re-parsed. The
    // oracle recomputes every projected field from the ORIGINAL
    // parquet, so a byte error anywhere in the record framing, gzip
    // member framing, split logic or payload slicing fails the hash
    // compare. Same synthesized host/type scheme as q_warc_parse.
    "q_warc_file" -> ((s, dir) => {
      val cache = cacheDir(dir, "docs_warc")
      val docs = t(s, dir, "documents")
      val host = concat(lit("site"), (col("doc_id") % 17).cast("string"),
        lit(".example"), (col("doc_id") % 5).cast("string"), lit(".com"))
      val wtype = when(col("doc_id") % 3 === 0, "response")
        .when(col("doc_id") % 3 === 1, "request").otherwise("metadata")
      val recs = docs.select(
        wtype.as("warc_type"),
        concat(lit("<urn:uuid:"), col("doc_id").cast("string"), lit(">")).as("record_id"),
        concat(lit("https://"), host, lit("/page"),
          (col("doc_id") % 9).cast("string")).as("target_uri"),
        lit("text/html").as("content_type"),
        col("text").as("payload"))
      graft.sources.Warc.toWarcSharded(recs.repartition(4), cache, gzip = true)
      graft.sources.Readers.open(s, s"$cache/part-*.warc.gz")
        .select(
          regexp_extract(col("record_id"), "uuid:([0-9]+)", 1).cast("long").as("doc_id"),
          col("warc_type"),
          regexp_extract(col("target_uri"), "https://([^/]+)/", 1).as("host"),
          col("content_length"),
          substring(col("payload").cast("string"), 1, 20).as("payload_head"))
        .orderBy("doc_id")
    }),

    // End-to-end crawl ingest: HTML pages inside real .warc.gz files
    // -> distributed split read -> boilerplate strip -> per-doc text
    // metrics. The composition a Common-Crawl user actually runs
    // (file ingest + q_html_extract's extraction + token stats), with
    // the oracle recomputing everything from the original parquet —
    // a byte error in WARC framing, gzip members, split ownership or
    // the HTML strip chain fails the hash compare.
    "q_warc_pipeline" -> ((s, dir) => {
      val cache = cacheDir(dir, "docs_warc_pipe")
      val docs = t(s, dir, "documents")
      val page = concat(
        lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit("</title><script type=\"text/javascript\">var a=1 < 2;var b=\"</div>\";</script></head><body><h1>Doc "),
        col("doc_id").cast("string"), lit("</h1><p>"),
        regexp_replace(col("text"), " the ", " <b>the</b> "),
        lit("</p><div class=\"nav\">nav menu links</div><!-- hidden --></body></html>"))
      val recs = docs.select(
        lit("response").as("warc_type"),
        concat(lit("<urn:uuid:"), col("doc_id").cast("string"), lit(">")).as("record_id"),
        concat(lit("https://site"), (col("doc_id") % 17).cast("string"),
          lit(".example.com/p"), (col("doc_id") % 9).cast("string")).as("target_uri"),
        lit("text/html").as("content_type"),
        page.as("payload"))
      graft.sources.Warc.toWarcSharded(recs.repartition(4), cache, gzip = true)
      val html = col("payload").cast("string")
      val noScript = regexp_replace(html, "<script[^>]*>.*?</script>", " ")
      val noComment = regexp_replace(noScript, "<!--.*?-->", " ")
      val noTags = regexp_replace(noComment, "<[^>]*>", " ")
      val cleanText = trim(regexp_replace(noTags, " +", " "))
      graft.sources.Readers.open(s, s"$cache/part-*.warc.gz")
        .select(
          regexp_extract(col("record_id"), "uuid:([0-9]+)", 1).cast("long").as("doc_id"),
          cleanText.as("extracted"))
        .select(col("doc_id"),
          length(col("extracted")).cast("long").as("n_chars"),
          size(split(col("extracted"), " ")).cast("long").as("n_tokens"),
          substring(col("extracted"), 1, 25).as("head"))
        .orderBy("doc_id")
    }),

    // numpy .npy round trip (beyond reference — the interchange format
    // of the python ML world; dependency-free graft.sources.Npy):
    // lineitem becomes a structured record array (i8/f8 fields + U
    // strings), read back through the distributed positioned-range
    // reader, aggregated. Oracle runs on the ORIGINAL parquet.
    "q_npy_agg" -> ((s, dir) => {
      val cache = cacheDir(dir, "lineitem_npy") + "/t.npy"
      graft.sources.Npy.toNpy(narrowLineitem(s, dir), cache)
      agg(graft.sources.Readers.open(s, cache))
    }),

    // distributed sharded npy export + glob read-back (per-partition
    // part files via the RowSpill geometry pass)
    "q_npy_sharded" -> ((s, dir) => {
      val cache = cacheDir(dir, "lineitem_npy_sh")
      graft.sources.Npy.toNpySharded(
        narrowLineitem(s, dir).repartition(5), cache)
      agg(graft.sources.Readers.open(s, s"$cache/part-*.npy"))
    }),

    // npz (np.savez layout, STORED members): the embeddings table —
    // an i8 id member, an (n, 64) f4 MATRIX member and an i4 label
    // member — written by toNpz, read back row-aligned by the
    // distributed multi-member range reader. First/last matrix
    // elements hash-gate the row alignment; a value error anywhere in
    // the zip framing or 2-D decode fails the compare.
    "q_npz_embed" -> ((s, dir) => {
      val cache = cacheDir(dir, "embeddings_npz") + "/e.npz"
      graft.sources.Npy.toNpz(
        t(s, dir, "embeddings").select("vec_id", "embedding", "label"), cache)
      embedAgg(graft.sources.Readers.open(s, cache))
    }),

    // safetensors round trip (the Hugging Face tensor interchange
    // format — embedding dumps increasingly ship in it): vec_id as a
    // rank-1 I64 tensor, embeddings as an (n, d) F32 tensor, labels
    // I32. Write is column-major (one streamed pass per tensor); read
    // is DISTRIBUTED fixed-width positioned range reads, same
    // contract as npy/FITS. Same aggregate (and oracle) as
    // q_npz_embed — the format must be invisible to the numbers.
    "q_safetensors_embed" -> ((s, dir) => {
      val cache = cacheDir(dir, "embeddings_st") + "/e.safetensors"
      graft.sources.Safetensors.toSafetensors(
        t(s, dir, "embeddings").select("vec_id", "embedding", "label"), cache)
      embedAgg(graft.sources.Readers.open(s, cache))
    }),

    // distributed sharded safetensors export + glob read-back (every
    // partition spills once to local disk, then streams its own
    // column-major shard file)
    "q_safetensors_sharded" -> ((s, dir) => {
      val cache = cacheDir(dir, "embeddings_st_sh")
      graft.sources.Safetensors.toSafetensorsSharded(
        t(s, dir, "embeddings").select("vec_id", "embedding", "label")
          .repartition(5), cache)
      embedAgg(graft.sources.Readers.open(s, s"$cache/part-*.safetensors"))
    }),

    // TFRecord round trip (the TensorFlow training-data container):
    // sharded write (one CRC-framed tf.train.Example file per
    // partition — the production layout) -> glob read, one task per
    // file. Floats are the container's only real type for decimals —
    // quantities cast to float32 at write and the oracle mirrors with
    // CAST(x AS REAL) (bit-identical rounding, the r5 recipe).
    "q_tfrecord_agg" -> ((s, dir) => {
      val cache = cacheDir(dir, "lineitem_tfr")
      graft.sources.Tfrecord.toTfRecordSharded(
        t(s, dir, "lineitem").select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity").cast("float").as("qf"),
          col("l_extendedprice").cast("float").as("pf"))
          .repartition(5), cache)
      val schema = StructType(Seq(
        StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
        StructField("qf", FloatType), StructField("pf", FloatType)))
      graft.sources.Tfrecord.fromTfRecord(s, s"$cache/part-*.tfrecord", schema)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(r(dsumD(col("qf").cast("double"))).as("sum_qty"),
          r(dsumD(col("pf").cast("double"))).as("sum_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // TFRecord embeddings: int64 + float-list features, single-file
    // write, explicit read schema (label widens int32 -> int64 in the
    // container). Same aggregate + oracle as the npz/safetensors
    // lanes — the container must be invisible to the numbers.
    "q_tfrecord_embed" -> ((s, dir) => {
      val cache = cacheDir(dir, "embeddings_tfr") + "/e.tfrecord"
      graft.sources.Tfrecord.toTfRecord(
        t(s, dir, "embeddings").select("vec_id", "embedding", "label"), cache)
      val schema = StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("label", LongType)))
      embedAgg(graft.sources.Tfrecord.fromTfRecord(s, cache, schema))
    }),

    // WebDataset round trip (the multimodal training-data convention:
    // samples as grouped members in plain tar shards): documents
    // become (key, {txt, json}) samples, sharded-written (one tar per
    // partition), glob-read via the two-phase index (header walk per
    // file, payload reads member-level) and re-aggregated. GNU tar
    // itself validates the archives in WebDatasetSpec.
    "q_webdataset" -> ((s, dir) => {
      val cache = cacheDir(dir, "documents_wds")
      val samples = t(s, dir, "documents").select(
        col("doc_id").cast("string").as("key"),
        map(lit("txt"), encode(col("text"), "UTF-8"),
          lit("json"), encode(concat(lit("{\"lang\":\""), col("lang"),
            lit("\"}")), "UTF-8")).as("files"))
      graft.sources.WebDataset.toWebDatasetSharded(samples.repartition(4), cache)
      graft.sources.Readers.open(s, s"$cache/part-*.tar")
        .select(col("key").cast("long").as("doc_id"),
          decode(element_at(col("files"), "txt"), "UTF-8").as("txt"),
          decode(element_at(col("files"), "json"), "UTF-8").as("js"))
        .groupBy((col("doc_id") % 7).as("g"))
        .agg(count(lit(1)).as("n"),
          sum(length(col("txt"))).cast("long").as("sum_len"),
          min(col("doc_id")).as("min_id"),
          sum(length(col("js"))).cast("long").as("sum_js"))
        .orderBy("g")
    }),

    // MULTIMODAL WebDataset end-to-end: real JPEG payloads (JpegCodec
    // encoder, constant-gray = losslessly-quantized brightness) plus
    // text captions packed as (key, {jpg, txt}) samples into tar
    // shards, glob-read, the jpg member decoded through the full
    // Huffman+IDCT pipeline — the image-caption training-data shape.
    // The oracle re-derives every decoded field from the spec formula
    // (any defect in tar framing, sample assembly, the encoder or the
    // decoder breaks the row hash).
    "q_webdataset_mm" -> ((s, dir) => {
      val cache = cacheDir(dir, "documents_wds_mm")
      val specs = t(s, dir, "documents").select(
        col("doc_id"),
        (lit(9) + col("doc_id") % 40).as("w"),
        (lit(9) + (col("doc_id") * 11) % 40).as("h"),
        ((col("doc_id") * 7) % 256).as("g"))
      val media = graft.operators.Multimodal.synthesizeJpeg(
        specs, "doc_id", "w", "h", "g")
      val samples = media.select(col("doc_id").cast("string").as("key"),
        map(lit("jpg"), col("media"),
          lit("txt"), encode(concat(lit("img "), col("doc_id").cast("string")),
            "UTF-8")).as("files"))
      graft.sources.WebDataset.toWebDatasetSharded(samples.repartition(4), cache)
      // `back` feeds decodeMeta AND the caption self-join — persist so
      // the tar shards are scanned (and every member parsed) ONCE, not
      // twice; rotation keeps rep-major bench calls cache-bounded
      val back = graft.sources.Readers.open(s, s"$cache/part-*.tar")
        .select(col("key").cast("long").as("doc_id"),
          element_at(col("files"), "jpg").as("media"),
          length(decode(element_at(col("files"), "txt"), "UTF-8"))
            .cast("long").as("caption_len"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      wdsMmPersisted.getAndSet(Seq(back)).foreach(_.unpersist(false))
      graft.operators.Multimodal.decodeMeta(back, "doc_id", "media")
        .join(back.select("doc_id", "caption_len"), "doc_id")
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          r(col("brightness"), 6).as("brightness"), col("caption_len"))
        .orderBy("doc_id")
    }),

    // Zarr v2 round trip (the chunked-ndarray store — modern
    // embedding/science dumps): the embeddings table becomes a group
    // of zlib-chunked arrays (vec_id i8, embedding (n,d) f4, label
    // i4), read back chunk-row-range per task with zero shuffle.
    // Same aggregate + oracle as the npz/safetensors/tfrecord lanes.
    "q_zarr_embed" -> ((s, dir) => {
      val cache = cacheDir(dir, "embeddings_zarr") + "/e.zarr"
      // the DISTRIBUTED write (executors own disjoint chunks via one
      // chunk-keyed sorted shuffle) — the 100 TB path; the driver-
      // streamed toZarr is the small-interchange convenience
      graft.sources.Zarr.toZarrDistributed(
        t(s, dir, "embeddings").select("vec_id", "embedding", "label"),
        cache, chunkRows = 512)
      embedAgg(graft.sources.Readers.open(s, cache))
    }),

    // zarr + BLOSC chunks (zarr-python's default container): the same
    // distributed write/read, chunks now blosc1-framed byte-shuffled
    // lz4 blocks ([[Blosc]]) — the codec must be invisible, so the
    // lane shares the embeddings oracle verbatim.
    "q_zarr_blosc" -> ((s, dir) => {
      val cache = cacheDir(dir, "embeddings_zarr_blosc") + "/emb.zarr"
      graft.sources.FsIO.deleteRecursive(cache)
      graft.sources.Zarr.toZarrDistributed(
        t(s, dir, "embeddings").select("vec_id", "embedding", "label"),
        cache, chunkRows = 512, codec = "blosc-lz4")
      embedAgg(graft.sources.Readers.open(s, cache))
    }),

    // Zarr + blosc BITshuffle (the bitshuffle/hdf5 ecosystem's common
    // numeric-science layout): same distributed round trip with
    // bit-transposed blocks (flag 0x4) — the bit kernel is pinned
    // bidirectionally against an independent numpy implementation in
    // ZarrSpec; this lane oracle-gates the full distributed path.
    "q_zarr_bitshuf" -> ((s, dir) => {
      val cache = cacheDir(dir, "embeddings_zarr_bitshuf") + "/emb.zarr"
      graft.sources.FsIO.deleteRecursive(cache)
      graft.sources.Zarr.toZarrDistributed(
        t(s, dir, "embeddings").select("vec_id", "embedding", "label"),
        cache, chunkRows = 512, codec = "blosc-zstd-bit")
      embedAgg(graft.sources.Readers.open(s, cache))
    }),

    // Zarr V3 (zarr-python's default store format since 3.0): same
    // distributed round trip through the v3 layout — zarr.json nodes,
    // c/-prefixed chunk keys, bytes+zstd codec pipeline. The v3
    // reader/writer are cross-pinned against an independent python
    // producer/decoder in ZarrSpec; this lane oracle-gates the
    // distributed path.
    "q_zarr_v3" -> ((s, dir) => {
      val cache = cacheDir(dir, "embeddings_zarr_v3") + "/emb.zarr"
      graft.sources.FsIO.deleteRecursive(cache)
      graft.sources.Zarr.toZarrDistributed(
        t(s, dir, "embeddings").select("vec_id", "embedding", "label"),
        cache, chunkRows = 512, codec = "zstd", zarrVersion = 3)
      embedAgg(graft.sources.Readers.open(s, cache))
    }),

    // zarr v3 sharding_indexed: the large-tensor layout (many small
    // inner chunks per stored object, so object stores hold millions
    // of chunks in thousands of files) — distributed write with
    // 64-row inner chunks inside 512-row shards, read back through
    // the shard index (crc32c-protected offset/nbytes table).
    "q_zarr_shard" -> ((s, dir) => {
      val cache = cacheDir(dir, "embeddings_zarr_shard") + "/emb.zarr"
      graft.sources.FsIO.deleteRecursive(cache)
      graft.sources.Zarr.toZarrDistributed(
        t(s, dir, "embeddings").select("vec_id", "embedding", "label"),
        cache, chunkRows = 512, codec = "gzip", zarrVersion = 3,
        shardInnerRows = 64)
      embedAgg(graft.sources.Readers.open(s, cache))
    }),

    // zstd JSON-lines round trip (the corpus-release container: The
    // Pile / SlimPajama / Dolma ship .jsonl.zst shards): distributed
    // sharded write (executors stream-compress), glob read (one
    // decode task per shard). Oracle runs on the ORIGINAL parquet —
    // doubles survive via shortest-round-trip JSON formatting.
    "q_jsonl_zst" -> ((s, dir) => {
      val cache = cacheDir(dir, "lineitem_jsonl_zst")
      graft.sources.ZstdLines.toZstJsonlSharded(narrowLineitem(s, dir), cache)
      agg(graft.sources.Readers.open(s, s"$cache/part-*.jsonl.zst"))
    }),

    // Delta Lake round trip (the lakehouse table layer — versioned
    // parquet + ACID JSON transaction log, built straight from the
    // public PROTOCOL.md): narrow lineitem becomes a Delta table, the
    // snapshot read resolves the log and scans only live files. The
    // oracle runs on the ORIGINAL parquet — the log must be invisible.
    "q_delta_agg" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_delta") + "/t.delta"
      graft.sources.FsIO.deleteRecursive(table) // idempotent rebuild
      graft.sources.Export.export(narrowLineitem(s, dir), table)
      agg(graft.sources.Readers.open(s, table))
    }),

    // Delta partitioned table: l_returnflag lives ONLY in the log's
    // partitionValues (per the protocol the data files drop partition
    // columns), so the aggregate proves the typed re-injection.
    "q_delta_partitioned" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_delta_part") + "/t.delta"
      graft.sources.FsIO.deleteRecursive(table)
      graft.sources.DeltaLake.toDelta(narrowLineitem(s, dir), table,
        partitionBy = Seq("l_returnflag"))
      agg(graft.sources.Readers.open(s, table))
    }),

    // Delta time travel through a checkpoint: four commits (overwrite
    // g=0, append g=1, append g=2, overwrite back to g<=1) with a
    // checkpoint at v2, then reads at v1 (pure json replay), v2
    // (exactly the checkpoint) and v3 (checkpoint + remove/add tail).
    "q_delta_timetravel" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_delta_tt") + "/t.delta"
      graft.sources.FsIO.deleteRecursive(table)
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
      def part(gs: Int*) = li.filter((col("l_orderkey") % 3).isin(gs.map(g => g: Any): _*))
      val D = graft.sources.DeltaLake
      D.toDelta(part(0), table, mode = "overwrite", checkpointInterval = 2)
      D.toDelta(part(1), table, mode = "append", checkpointInterval = 2)
      D.toDelta(part(2), table, mode = "append", checkpointInterval = 2)
      D.toDelta(part(0, 1), table, mode = "overwrite", checkpointInterval = 2)
      Seq(1L, 2L, 3L).map { v =>
        D.fromDelta(s, table, Some(v))
          .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"))
          .select(lit(v.toInt).as("v"), col("n"), col("sum_qty"))
      }.reduce(_ union _).orderBy("v")
    }),

    // Delta stats-based file skipping: the table is written in
    // l_orderkey range shards (disjoint min/max per file), the read
    // pushes the predicate into fromDelta so non-matching files never
    // become scan tasks — the oracle sees only that the ANSWER equals
    // a plain filtered aggregate (skipping must be invisible).
    "q_delta_skipping" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_delta_skip") + "/t.delta"
      graft.sources.FsIO.deleteRecursive(table)
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        .repartitionByRange(8, col("l_orderkey"))
      graft.sources.DeltaLake.toDelta(li, table)
      val hi = 1000L // sf-stable: orderkeys are dense from 1
      graft.sources.DeltaLake.fromDelta(s, table,
          where = Some(col("l_orderkey") <= hi))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"),
          max(col("l_orderkey")).as("max_key"))
        .orderBy("l_returnflag")
    }),

    // Delta column mapping (`name` mode): the table is laid out the
    // way a foreign writer (DBR post-rename) produces it — PHYSICAL
    // column names in the data files, partitionValues and stats;
    // logical names only in the schemaString metadata. The read (with
    // a stats-skipping predicate, so the physical-namespace bounds
    // translation is exercised) must make the mapping invisible: the
    // oracle is a plain filtered aggregate on the original parquet.
    "q_delta_colmap" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_delta_cm") + "/t.delta"
      graft.sources.FsIO.deleteRecursive(table)
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        .repartitionByRange(8, col("l_orderkey"))
      graft.sources.DeltaLake.foreignColumnMapped(li, table,
        Map("l_orderkey" -> "col-0a1b2c3d", "l_quantity" -> "col-4e5f6a7b",
          "l_returnflag" -> "col-8c9d0e1f"))
      graft.sources.DeltaLake.fromDelta(s, table,
          where = Some(col("l_orderkey") <= 1000))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"),
          max(col("l_orderkey")).as("max_key"))
        .orderBy("l_returnflag")
    }),

    // Delta column mapping `id` MODE (r18): the converted-table shape
    // where file column names drifted from the metadata and only the
    // parquet FIELD ID links them — the scan runs under fieldId.read
    // in a cloned session, stats skipping stays physical-namespace.
    // Oracle = the same aggregate on plain parquet.
    "q_delta_colmap_id" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_delta_cmid") + "/t.delta"
      graft.sources.FsIO.deleteRecursive(table)
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        .repartitionByRange(8, col("l_orderkey"))
      graft.sources.DeltaLake.foreignIdMapped(li, table,
        physicalOf = Map("l_orderkey" -> "col-0a1b", "l_quantity" -> "col-2c3d",
          "l_returnflag" -> "col-4e5f"),
        fileNameOf = Map("l_orderkey" -> "legacy_okey",
          "l_returnflag" -> "legacy_flag"))
      graft.sources.DeltaLake.fromDelta(s, table,
          where = Some(col("l_orderkey") <= 1000))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"),
          max(col("l_orderkey")).as("max_key"))
        .orderBy("l_returnflag")
    }),

    // Delta CHANGE DATA FEED (r18): enable CDF, run an upsert
    // (updates + inserts) and a CoW delete — both emit cdc change
    // files with pre/post images — then read the row-level feed back
    // through fromDeltaCdf and aggregate by (version, change type).
    // Oracle reconstructs each change class relationally from orders.
    "q_delta_cdf" -> ((s, dir) => {
      val table = cacheDir(dir, "orders_delta_cdf") + "/t.delta"
      graft.sources.FsIO.deleteRecursive(table)
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_custkey"), col("o_totalprice"), col("o_orderstatus"))
      val D = graft.sources.DeltaLake
      D.toDelta(o, table)                  // v0
      D.enableChangeDataFeed(s, table)     // v1
      val upd = o.filter(col("o_orderkey") % 10 === 3)
        .withColumn("o_totalprice", col("o_totalprice") + 1000)
      val ins = o.filter(col("o_orderkey") % 10 === 4)
        .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
          col("o_custkey"), col("o_totalprice"), col("o_orderstatus"))
      D.upsert(s, table, upd.unionByName(ins), Seq("o_orderkey")) // v2
      D.deleteWhere(s, table, col("o_orderkey") % 10 === 7)       // v3
      D.fromDeltaCdf(s, table, 1)
        .groupBy(col("_commit_version").cast("int").as("v"),
          col("_change_type").as("ct"))
        .agg(count(lit(1)).as("n"), r(dsumD(col("o_totalprice"))).as("sum_tp"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy("v", "ct")
    }),

    // Delta TYPE WIDENING (r18): a narrow era (int keys, float
    // quantities — the values are float-exact) gets a foreign-shaped
    // metadata-only widening ALTER (int->long, float->double with
    // delta.typeChanges + the feature protocol), then a wide append;
    // the read promotes narrow files inside the parquet scan. Oracle
    // = the plain aggregate (float round-trip is identity here).
    "q_delta_widen" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_delta_widen") + "/t.delta"
      graft.sources.FsIO.deleteRecursive(table)
      val li = t(s, dir, "lineitem")
      val D = graft.sources.DeltaLake
      D.toDelta(li.filter(col("l_orderkey") <= 4000)
        .select(col("l_orderkey").cast("int").as("l_orderkey"),
          col("l_quantity").cast("float").as("l_quantity"),
          col("l_returnflag")), table)
      D.foreignWidenTypes(s, table, Map(
        "l_orderkey" -> org.apache.spark.sql.types.LongType,
        "l_quantity" -> org.apache.spark.sql.types.DoubleType))
      D.toDelta(li.filter(col("l_orderkey") > 4000)
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag")),
        table, "append")
      D.fromDelta(s, table, where = Some(col("l_orderkey") <= 4500))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"),
          max(col("l_orderkey")).as("max_key"))
        .orderBy("l_returnflag")
    }),

    // Delta RENAME COLUMN (r17): the metadata-only rename upgrades a
    // plain table to column mapping (identity physical names — the
    // existing files are untouched and still carry the old names),
    // then reads, skipping and appends run under the NEW logical
    // name. Oracle = the plain aggregate with the renamed alias.
    "q_delta_rename" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_delta_ren") + "/t.delta"
      graft.sources.FsIO.deleteRecursive(table)
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        .repartitionByRange(8, col("l_orderkey"))
      val D = graft.sources.DeltaLake
      D.toDelta(li.filter(col("l_orderkey") <= 4000), table)
      D.renameColumn(s, table, "l_quantity", "qty")
      D.toDelta(li.filter(col("l_orderkey") > 4000)                 // append
          .withColumnRenamed("l_quantity", "qty"), table, "append")
      D.deleteWhere(s, table, col("qty") > 49)                      // CoW
      D.fromDelta(s, table, where = Some(col("l_orderkey") <= 3000))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), r(dsumD(col("qty"))).as("sum_qty"),
          max(col("l_orderkey")).as("max_key"))
        .orderBy("l_returnflag")
    }),

    // Delta CM MAINTENANCE (r17): copy-on-write delete + key upsert +
    // z-ordered compaction all run on a column-mapped table (physical
    // namespace reads/staging); the filtered read then prunes through
    // the RECOLLECTED physical stats. Oracle = the same operations as
    // plain SQL over the original parquet.
    "q_delta_colmap_maint" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_delta_cmmaint") + "/t.delta"
      graft.sources.FsIO.deleteRecursive(table)
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        .repartitionByRange(8, col("l_orderkey"))
      val D = graft.sources.DeltaLake
      D.foreignColumnMapped(li, table,
        Map("l_orderkey" -> "col-0a1b2c3d", "l_quantity" -> "col-4e5f6a7b",
          "l_returnflag" -> "col-8c9d0e1f"))
      D.deleteWhere(s, table, col("l_orderkey") % 11 === 7)     // CoW
      // key-unique MERGE source: one row per %13==0 orderkey (upsert
      // replaces every matching-key row with the source row)
      D.upsert(s, table,
        li.filter(col("l_orderkey") % 13 === 0).groupBy("l_orderkey")
          .agg((max(col("l_quantity")) + 100).as("l_quantity"),
            max(col("l_returnflag")).as("l_returnflag"))
          .select("l_orderkey", "l_quantity", "l_returnflag"),
        Seq("l_orderkey"))
      D.compact(s, table, zorderBy = Seq("l_orderkey"))          // OPTIMIZE
      D.fromDelta(s, table, where = Some(col("l_orderkey") <= 3000))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"),
          max(col("l_orderkey")).as("max_key"))
        .orderBy("l_returnflag")
    }),

    // Delta deletion vectors: a foreign DELETE masks rows via per-file
    // roaring bitmaps (remove + re-add with a `deletionVector`
    // descriptor, protocol v3 + deletionVectors) — the read applies
    // them as a codegen'd anti-filter on _metadata.row_index inside
    // the scan, no shuffle/join. The oracle just excludes the same
    // rows with a WHERE on the original parquet.
    "q_delta_dv" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_delta_dv") + "/t.delta"
      graft.sources.FsIO.deleteRecursive(table)
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        .repartitionByRange(8, col("l_orderkey"))
      val D = graft.sources.DeltaLake
      D.toDelta(li, table)
      D.foreignDeleteRows(s, table, col("l_orderkey") % 7 === 3)
      D.fromDelta(s, table)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"),
          max(col("l_orderkey")).as("max_key"))
        .orderBy("l_returnflag")
    }),

    // Delta DV-emitting DELETE (merge-on-read): deleteWhere with
    // viaDeletionVectors masks matching rows via executor-built
    // per-file roaring bitmaps — no data file rewritten — then a
    // blind APPEND lands more rows on the DV-carrying table. The
    // oracle is the logically-equivalent row set: lineitem minus the
    // deleted predicate, plus the appended slice.
    "q_delta_dv_delete" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_delta_dvdel") + "/t.delta"
      graft.sources.FsIO.deleteRecursive(table)
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        .repartitionByRange(8, col("l_orderkey"))
      val D = graft.sources.DeltaLake
      D.toDelta(li.filter(col("l_orderkey") <= 4000), table)
      D.deleteWhere(s, table, col("l_orderkey") % 7 === 3,
        viaDeletionVectors = true)
      D.toDelta(li.filter(col("l_orderkey") > 4000), table, "append")
      D.fromDelta(s, table)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"),
          max(col("l_orderkey")).as("max_key"))
        .orderBy("l_returnflag")
    }),

    // Delta DV + CHECKPOINT (r17): checkpoint adds carry their
    // deletionVector descriptors, so DV tables checkpoint on the
    // normal cadence — the lane vacuums every json commit at/below
    // the checkpoint and the replay-from-checkpoint must apply every
    // DV. Oracle = the CoW-equivalent WHERE on the original parquet.
    "q_delta_dv_checkpoint" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_delta_dvcp") + "/t.delta"
      graft.sources.FsIO.deleteRecursive(table)
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        .repartitionByRange(8, col("l_orderkey"))
      val D = graft.sources.DeltaLake
      D.toDelta(li, table, checkpointInterval = 0)              // v0
      D.deleteWhere(s, table, col("l_orderkey") % 7 === 3,
        viaDeletionVectors = true, checkpointInterval = 1)      // v1 + cp
      (0L to 1L).foreach(v => graft.sources.FsIO.deleteRecursive(
        f"$table/_delta_log/$v%020d.json"))
      D.toDelta(li.filter(col("l_orderkey") % 13 === 0)
          .withColumn("l_orderkey", col("l_orderkey") + 10000000L),
        table, "append", checkpointInterval = 0)                // v2
      D.fromDelta(s, table)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"),
          max(col("l_orderkey")).as("max_key"))
        .orderBy("l_returnflag")
    }),

    // Delta OPTIMIZE over LIVE deletion vectors (r17): compact reads
    // through the DV anti-filter, materializing the masks into the
    // rewritten files (logical rows unchanged -> dataChange=false,
    // descriptors on the tombstones) — OPTIMIZE on a DV table needs no
    // prior purge. The oracle is the same logical row set.
    "q_delta_dv_compact" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_delta_dvopt") + "/t.delta"
      graft.sources.FsIO.deleteRecursive(table)
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        .repartitionByRange(8, col("l_orderkey"))
      val D = graft.sources.DeltaLake
      D.toDelta(li, table)
      D.deleteWhere(s, table, col("l_orderkey") % 7 === 3,
        viaDeletionVectors = true)
      D.compact(s, table, zorderBy = Seq("l_orderkey")) // through live DVs
      D.fromDelta(s, table, where = Some(col("l_orderkey") <= 3000))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"),
          max(col("l_orderkey")).as("max_key"))
        .orderBy("l_returnflag")
    }),

    // Delta REORG-PURGE: after a DV delete, purgeDeletionVectors
    // rewrites exactly the masked files to their survivors
    // (dataChange=false — logically invisible), unlocking
    // maintenance/checkpoints; a compact afterwards proves the
    // unlock. The oracle is the same logical row set as the delete.
    "q_delta_dv_purge" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_delta_dvpurge") + "/t.delta"
      graft.sources.FsIO.deleteRecursive(table)
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        .repartitionByRange(8, col("l_orderkey"))
      val D = graft.sources.DeltaLake
      D.toDelta(li, table)
      D.deleteWhere(s, table, col("l_orderkey") % 7 === 3,
        viaDeletionVectors = true)
      D.purgeDeletionVectors(s, table)
      D.compact(s, table) // unlocked by the purge
      D.fromDelta(s, table)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"),
          max(col("l_orderkey")).as("max_key"))
        .orderBy("l_returnflag")
    }),

    // Delta V2 checkpoint: the modern DBR log layout — a uuid-named
    // manifest + parquet sidecar files under _delta_log/_sidecars/,
    // with every pre-checkpoint JSON commit vacuumed away. The read
    // must reconstruct the snapshot from the manifest + sidecars
    // alone (stats skipping included); the oracle is the plain
    // filtered aggregate on the original parquet.
    "q_delta_v2cp" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_delta_v2cp") + "/t.delta"
      graft.sources.FsIO.deleteRecursive(table)
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        .repartitionByRange(8, col("l_orderkey"))
      val D = graft.sources.DeltaLake
      D.toDelta(li.filter(col("l_orderkey") % 2 === 0), table,
        checkpointInterval = 0)
      D.toDelta(li.filter(col("l_orderkey") % 2 === 1), table, "append",
        checkpointInterval = 0)
      D.foreignV2Checkpoint(s, table, numSidecars = 2)
      (0L to 1L).foreach(v => graft.sources.FsIO.deleteRecursive(
        f"$table/_delta_log/$v%020d.json"))
      D.fromDelta(s, table, where = Some(col("l_orderkey") <= 1000))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"),
          max(col("l_orderkey")).as("max_key"))
        .orderBy("l_returnflag")
    }),

    // Delta CM+DV DELETE: the common modern DBR table enables BOTH
    // column mapping and deletion vectors — our merge-on-read
    // deleteWhere runs its scan in the physical namespace (aliased
    // back to logical for the predicate) and emits DVs onto the
    // column-mapped files. The oracle is the CoW delete's result: the
    // same rows excluded by a plain WHERE on the original parquet.
    "q_delta_dv_colmap_delete" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_delta_cmdv") + "/t.delta"
      graft.sources.FsIO.deleteRecursive(table)
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        .repartitionByRange(8, col("l_orderkey"))
      val D = graft.sources.DeltaLake
      D.foreignColumnMapped(li, table,
        Map("l_orderkey" -> "col-0a1b2c3d", "l_quantity" -> "col-4e5f6a7b",
          "l_returnflag" -> "col-8c9d0e1f"))
      D.deleteWhere(s, table, col("l_orderkey") % 7 === 3,
        viaDeletionVectors = true)
      D.deleteWhere(s, table, col("l_orderkey") % 7 === 5, // composes
        viaDeletionVectors = true)
      D.fromDelta(s, table)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"),
          max(col("l_orderkey")).as("max_key"))
        .orderBy("l_returnflag")
    }),

    // Delta V2 checkpoint WRITE: a table carrying the v2Checkpoint
    // writer feature (the modern DBR default) is fully writable — our
    // own checkpoint cadence emits the v2 layout (uuid manifest +
    // sidecars), proved by vacuuming every json commit at/below our
    // checkpoint and appending + merge-on-read deleting on top of it.
    "q_delta_v2cp_write" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_delta_v2cpw") + "/t.delta"
      graft.sources.FsIO.deleteRecursive(table)
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        .repartitionByRange(8, col("l_orderkey"))
      val D = graft.sources.DeltaLake
      D.toDelta(li.filter(col("l_orderkey") % 3 === 0), table,
        checkpointInterval = 0)                                   // v0
      D.foreignV2Checkpoint(s, table, numSidecars = 2)            // feature on
      // our writer: append at v1, cadence forces OUR v2 checkpoint
      D.toDelta(li.filter(col("l_orderkey") % 3 === 1), table, "append",
        checkpointInterval = 1)                                   // v1 + v2cp
      (0L to 1L).foreach(v => graft.sources.FsIO.deleteRecursive(
        f"$table/_delta_log/$v%020d.json"))
      D.toDelta(li.filter(col("l_orderkey") % 3 === 2), table, "append",
        checkpointInterval = 0)                                   // v2
      D.deleteWhere(s, table, col("l_orderkey") % 11 === 4)       // v3
      D.fromDelta(s, table)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"),
          max(col("l_orderkey")).as("max_key"))
        .orderBy("l_returnflag")
    }),

    // Delta classic MULTI-PART checkpoint (long-lived OSS tables):
    // same vacuumed-log discipline, state reconstructed by unioning
    // the N checkpoint parts; the table stays WRITABLE afterwards
    // (classic protocol) — the lane appends one more slab through our
    // own writer after the foreign checkpoint.
    "q_delta_multicp" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_delta_mcp") + "/t.delta"
      graft.sources.FsIO.deleteRecursive(table)
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        .repartitionByRange(8, col("l_orderkey"))
      val D = graft.sources.DeltaLake
      D.toDelta(li.filter(col("l_orderkey") % 3 === 0), table,
        checkpointInterval = 0)
      D.toDelta(li.filter(col("l_orderkey") % 3 === 1), table, "append",
        checkpointInterval = 0)
      D.foreignMultiPartCheckpoint(s, table, numParts = 3)
      (0L to 1L).foreach(v => graft.sources.FsIO.deleteRecursive(
        f"$table/_delta_log/$v%020d.json"))
      D.toDelta(li.filter(col("l_orderkey") % 3 === 2), table, "append",
        checkpointInterval = 0)
      D.fromDelta(s, table)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"),
          max(col("l_orderkey")).as("max_key"))
        .orderBy("l_returnflag")
    }),

    // Delta OPTIMIZE: six small appends compacted into z-ordered
    // files (dataChange=false rewrite) — the oracle proves layout
    // changes are INVISIBLE to query results; skipping then works on
    // both clustered columns (spec-pinned file counts).
    "q_delta_optimize" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_delta_opt") + "/t.delta"
      graft.sources.FsIO.deleteRecursive(table)
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      val D = graft.sources.DeltaLake
      (0 until 3).foreach { g =>
        D.toDelta(li.filter(col("l_orderkey") % 3 === g), table,
          mode = if (g == 0) "overwrite" else "append")
      }
      D.compact(s, table, targetFileBytes = 64L << 20,
        zorderBy = Seq("l_orderkey", "l_partkey"))
      D.fromDelta(s, table, where = Some(col("l_orderkey") <= 1000))
        .groupBy((col("l_partkey") % 4).as("g"))
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"))
        .orderBy("g")
    }),

    // SQL-only lakehouse access: the delta_table() table-valued
    // function (GraftExtensions.injectTableFunction) — a pure
    // spark.sql consumer reads the versioned table with pushdown
    // working through the TVF plan.
    "q_delta_sql" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_delta_sql") + "/t.delta"
      graft.sources.FsIO.deleteRecursive(table)
      graft.sources.DeltaLake.toDelta(narrowLineitem(s, dir), table)
      s.sql(
        s"""SELECT l_returnflag, l_linestatus,
           |  ${Q.sqlR(Q.sqlDsum("l_quantity"))} AS sum_qty,
           |  ${Q.sqlR(Q.sqlDsum("l_extendedprice"))} AS sum_price,
           |  COUNT(*) AS n
           |FROM delta_table('$table')
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    }),

    // Delta incremental tailing: three commits + an OPTIMIZE, then
    // fromDeltaChanges(0) pulls exactly the rows added by commits 1-2
    // tagged with their version — the compaction (dataChange=false)
    // must deliver NOTHING (exactly-once for incremental consumers).
    "q_delta_changes" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_delta_cdc") + "/t.delta"
      graft.sources.FsIO.deleteRecursive(table)
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
      def part(g: Int) = li.filter(col("l_orderkey") % 3 === g)
      val D = graft.sources.DeltaLake
      D.toDelta(part(0), table, mode = "overwrite")
      D.toDelta(part(1), table, mode = "append")
      D.toDelta(part(2), table, mode = "append")
      D.compact(s, table) // v3: layout only, no new rows
      D.fromDeltaChanges(s, table, fromVersion = 0L)
        .groupBy(col("_commit_version").cast("int").as("v"))
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"))
        .orderBy("v")
    }),


    // Delta streaming TAIL: the same commit sequence consumed through
    // the graft.streaming.DeltaTailSource V1 source over TWO trigger
    // phases (v1 before start, v2 + a compaction while running) —
    // offsets are commit versions, so the union of the delivered
    // micro-batches must equal the batch fromDeltaChanges pull and
    // the compaction must deliver nothing. Oracle = the same SQL as
    // q_delta_changes.
    "q_delta_tail" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_delta_tail") + "/t.delta"
      graft.sources.FsIO.deleteRecursive(table)
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
      def part(g: Int) = li.filter(col("l_orderkey") % 3 === g)
      val D = graft.sources.DeltaLake
      D.toDelta(part(0), table, mode = "overwrite") // v0 (excluded)
      D.toDelta(part(1), table, mode = "append")    // v1
      val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double, Long)]()
      val q = s.readStream
        .format(classOf[graft.streaming.DeltaTailSourceProvider].getName)
        .option("path", table)
        .option("startingVersion", "0")
        .load()
        .writeStream
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.select("l_orderkey", "l_quantity", "_commit_version")
            .collect().foreach(r =>
              got.add((r.getLong(0), r.getDouble(1), r.getLong(2))))
          ()
        }
        .start()
      try {
        q.processAllAvailable()
        D.toDelta(part(2), table, mode = "append")  // v2, while running
        D.compact(s, table)                          // v3: no new rows
        q.processAllAvailable()
      } finally q.stop()
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      got.forEach(x => rows.add(org.apache.spark.sql.Row(x._1, x._2, x._3)))
      s.createDataFrame(rows, org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("l_orderkey",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("l_quantity",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("_commit_version",
            org.apache.spark.sql.types.LongType))))
        .groupBy(col("_commit_version").cast("int").as("v"))
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"))
        .orderBy("v")
    }),

    // Delta CDF STREAMING tail (r18): the q_delta_cdf change sequence
    // consumed through DeltaTail readChangeFeed=true over TWO trigger
    // phases — the union of the delivered micro-batches must equal
    // the batch fromDeltaCdf pull, so it shares q_delta_cdf's oracle
    // shape (reconstructed relationally from orders).
    "q_delta_cdf_tail" -> ((s, dir) => {
      val table = cacheDir(dir, "orders_delta_cdft") + "/t.delta"
      graft.sources.FsIO.deleteRecursive(table)
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_custkey"), col("o_totalprice"), col("o_orderstatus"))
      val D = graft.sources.DeltaLake
      D.toDelta(o, table)                  // v0
      D.enableChangeDataFeed(s, table)     // v1
      val upd = o.filter(col("o_orderkey") % 10 === 3)
        .withColumn("o_totalprice", col("o_totalprice") + 1000)
      val ins = o.filter(col("o_orderkey") % 10 === 4)
        .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
          col("o_custkey"), col("o_totalprice"), col("o_orderstatus"))
      val got = new java.util.concurrent.ConcurrentLinkedQueue[
        (Long, Double, String, Long)]()
      val q = s.readStream
        .format(classOf[graft.streaming.DeltaTailSourceProvider].getName)
        .option("path", table)
        .option("startingVersion", "1")
        .option("readChangeFeed", "true")
        .load()
        .writeStream
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.select("o_orderkey", "o_totalprice", "_change_type",
              "_commit_version")
            .collect().foreach(r => got.add(
              (r.getLong(0), r.getDouble(1), r.getString(2), r.getLong(3))))
          ()
        }
        .start()
      try {
        D.upsert(s, table, upd.unionByName(ins), Seq("o_orderkey")) // v2
        q.processAllAvailable()
        D.deleteWhere(s, table, col("o_orderkey") % 10 === 7)       // v3
        q.processAllAvailable()
      } finally q.stop()
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      got.forEach(x => rows.add(org.apache.spark.sql.Row(
        x._1, x._2, x._3, x._4)))
      s.createDataFrame(rows, org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("o_orderkey",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("o_totalprice",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("_change_type",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("_commit_version",
            org.apache.spark.sql.types.LongType))))
        .groupBy(col("_commit_version").cast("int").as("v"),
          col("_change_type").as("ct"))
        .agg(count(lit(1)).as("n"), r(dsumD(col("o_totalprice"))).as("sum_tp"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy("v", "ct")
    }),

    // Delta MERGE (key upsert): documents become a Delta table, a
    // source of updates (every 7th doc's n_chars bumped) + inserts
    // (fresh doc_ids) merges in — only key-matching files rewrite
    // (spec-pinned); the oracle recomputes the merged state in SQL.
    "q_delta_upsert" -> ((s, dir) => {
      val table = cacheDir(dir, "docs_delta_upsert") + "/t.delta"
      graft.sources.FsIO.deleteRecursive(table)
      val docs = t(s, dir, "documents").select("doc_id", "lang", "n_chars")
      val D = graft.sources.DeltaLake
      D.toDelta(docs.repartitionByRange(4, col("doc_id")), table)
      val src = docs.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"), col("lang"), (col("n_chars") + 100000).as("n_chars"))
        .unionByName(docs.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 10000000L).as("doc_id"), lit("xx").as("lang"),
            (col("doc_id") % 97).cast("int").as("n_chars")))
      D.upsert(s, table, src, Seq("doc_id"))
      D.fromDelta(s, table)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).cast("long").as("sum_chars"))
        .orderBy("lang")
    }),

    // Delta DELETE: stats-guided row deletion (only files whose
    // bounds might match rewrite); oracle = the complement filter.
    "q_delta_delete" -> ((s, dir) => {
      val table = cacheDir(dir, "docs_delta_delete") + "/t.delta"
      graft.sources.FsIO.deleteRecursive(table)
      val docs = t(s, dir, "documents").select("doc_id", "lang", "n_chars")
      val D = graft.sources.DeltaLake
      D.toDelta(docs.repartitionByRange(4, col("doc_id")), table)
      D.deleteWhere(s, table, col("doc_id") % 10 === 3 || col("n_chars") < 200)
      D.fromDelta(s, table)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).cast("long").as("sum_chars"),
          min(col("doc_id")).as("min_id"))
        .orderBy("lang")
    }),

    // Iceberg round trip (the other lakehouse table layer — JSON
    // metadata + Avro manifest chain per the public table spec):
    // snapshot read resolves metadata -> manifest list -> manifests
    // -> live parquet scan. Oracle on the ORIGINAL parquet.
    "q_iceberg_agg" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_iceberg") + "/t.iceberg"
      graft.sources.FsIO.deleteRecursive(table)
      graft.sources.Export.export(narrowLineitem(s, dir), table)
      agg(graft.sources.Readers.open(s, table))
    }),

    // Iceberg production MoR DELETE: deleteWhere emits sorted sharded
    // position-delete parquet executor-side (the Spark/Flink
    // merge-on-read layout), a blind append lands after it, and the
    // read anti-joins the deletes back out. Oracle = lineitem minus
    // the deleted predicate plus the appended slice.
    // Iceberg PARTITIONED write + read-back + delete: identity spec
    // over l_returnflag — data files keep the source column (the
    // Iceberg layout), manifests carry typed partition tuples, the
    // filtered read prunes on partition bounds, an append composes,
    // and the merge-on-read delete stages partition-scoped delete
    // files whose entries copy the data files' tuples. Oracle = the
    // same aggregate with the delete's WHERE on the original parquet.
    "q_iceberg_partitioned" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_iceberg_part") + "/t.iceberg"
      graft.sources.FsIO.deleteRecursive(table)
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        .repartitionByRange(4, col("l_orderkey"))
      val I = graft.sources.Iceberg
      I.toIceberg(li.filter(col("l_orderkey") <= 4000), table,
        partitionBy = Seq("l_returnflag"))
      I.toIceberg(li.filter(col("l_orderkey") > 4000), table,
        mode = "append", partitionBy = Seq("l_returnflag"))
      I.deleteWhere(s, table, col("l_orderkey") % 9 === 2)
      I.fromIceberg(s, table, None, Some(col("l_orderkey") <= 3000))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"),
          max(col("l_orderkey")).as("max_key"))
        .orderBy("l_returnflag")
    }),

    // Iceberg BUCKET-partitioned write: bucket(8, l_orderkey) — the
    // spec's murmur3_x86_32 transform (Appendix B vectors pinned in
    // IcebergTransformsSpec lanes). Data files keep the source column
    // under id_bucket=<k>/ dirs, manifests carry int bucket tuples
    // and the metadata json declares bucket[8]; an append reuses the
    // spec's field ids, a MoR delete stages partition-scoped delete
    // files (tuples verbatim), and the filtered read prunes on the
    // SOURCE column's bounds. Oracle = the same aggregate on parquet.
    "q_iceberg_bucket" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_iceberg_bucket") + "/t.iceberg"
      graft.sources.FsIO.deleteRecursive(table)
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        .repartitionByRange(4, col("l_orderkey"))
      val I = graft.sources.Iceberg
      I.toIceberg(li.filter(col("l_orderkey") <= 4000), table,
        partitionBy = Seq("bucket(8, l_orderkey)"))
      I.toIceberg(li.filter(col("l_orderkey") > 4000), table,
        mode = "append", partitionBy = Seq("bucket(8, l_orderkey)"))
      I.deleteWhere(s, table, col("l_orderkey") % 7 === 5)
      I.fromIceberg(s, table, None, Some(col("l_orderkey") <= 3000))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"),
          max(col("l_orderkey")).as("max_key"))
        .orderBy("l_returnflag")
    }),

    // Iceberg DAY-partitioned write over the events stream table:
    // day(ts) evaluates the temporal transform (UTC instant for tz
    // timestamps, naive calendar for NTZ), files land under
    // ts_day=<date>/ dirs with date-typed manifest tuples, appends
    // and partition-scoped MoR deletes compose. Oracle groups the
    // surviving events by CAST(ts AS DATE).
    "q_iceberg_day" -> ((s, dir) => {
      val table = cacheDir(dir, "events_iceberg_day") + "/t.iceberg"
      graft.sources.FsIO.deleteRecursive(table)
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      val I = graft.sources.Iceberg
      I.toIceberg(ev.filter(col("event_id") % 2 === 0), table,
        partitionBy = Seq("day(ts)"))
      I.toIceberg(ev.filter(col("event_id") % 2 === 1), table,
        mode = "append", partitionBy = Seq("day(ts)"))
      I.deleteWhere(s, table, col("event_id") % 5 === 1)
      I.fromIceberg(s, table)
        .groupBy(col("ts").cast("date").as("d"))
        .agg(count(lit(1)).as("n"), r(dsumD(col("value"))).as("sum_value"),
          countDistinct(col("user_id")).as("users"))
        .orderBy("d")
    }),

    "q_iceberg_delete" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_iceberg_pdel") + "/t.iceberg"
      graft.sources.FsIO.deleteRecursive(table)
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        .repartitionByRange(8, col("l_orderkey"))
      val I = graft.sources.Iceberg
      I.toIceberg(li.filter(col("l_orderkey") <= 4000), table)
      I.deleteWhere(s, table, col("l_orderkey") % 7 === 3)
      I.toIceberg(li.filter(col("l_orderkey") > 4000), table, mode = "append")
      I.fromIceberg(s, table)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"),
          max(col("l_orderkey")).as("max_key"))
        .orderBy("l_returnflag")
    }),

    // Iceberg append-time SCHEMA EVOLUTION: the second append carries
    // a new column — it records in a fresh schema entry at ids above
    // last-column-id, pre-evolution files read it as null (the read
    // side name-maps), and the aggregate spans the boundary. Oracle
    // reconstructs the null region from the write predicate.
    "q_iceberg_evolve" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_iceberg_evo") + "/t.iceberg"
      graft.sources.FsIO.deleteRecursive(table)
      val li = t(s, dir, "lineitem")
      val I = graft.sources.Iceberg
      I.toIceberg(li.filter(col("l_orderkey") <= 4000)
        .select(col("l_orderkey"), col("l_quantity")), table)
      I.toIceberg(li.filter(col("l_orderkey") > 4000)
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag")),
        table, mode = "append")
      I.fromIceberg(s, table)
        .groupBy(coalesce(col("l_returnflag"), lit("_none")).as("flag"))
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"),
          max(col("l_orderkey")).as("max_key"))
        .orderBy("flag")
    }),

    // Iceberg CHANGELOG (r18): the Iceberg twin of q_delta_cdf —
    // inserts from appends, row-level DELETES resolved from the MoR
    // position-delete files against the parent snapshot's live files.
    // Sequence numbers are the deterministic commit clock. Oracle
    // reconstructs each change class relationally from orders.
    "q_iceberg_changelog" -> ((s, dir) => {
      val table = cacheDir(dir, "orders_iceberg_chl") + "/t.iceberg"
      graft.sources.FsIO.deleteRecursive(table)
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_custkey"), col("o_totalprice"), col("o_orderstatus"))
      val I = graft.sources.Iceberg
      I.toIceberg(o.filter(col("o_orderkey") % 3 === 0), table)   // seq 1
      I.toIceberg(o.filter(col("o_orderkey") % 3 =!= 0), table,
        mode = "append")                                           // seq 2
      I.deleteWhere(s, table, col("o_orderkey") % 10 === 7)        // seq 3
      I.fromIcebergChangelog(s, table)
        .groupBy(col("_sequence_number").cast("int").as("v"),
          col("_change_type").as("ct"))
        .agg(count(lit(1)).as("n"), r(dsumD(col("o_totalprice"))).as("sum_tp"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy("v", "ct")
    }),

    // Iceberg incremental changes: the spec's added-data-files walk
    // between snapshots — initial write + two fast-appends, pulled as
    // one (beginning, current] range tagged with the MONOTONIC
    // sequence number (snapshot ids are random). The Iceberg twin of
    // q_delta_changes; a mixed lakehouse pipeline tails both the same
    // way.
    "q_iceberg_changes" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_iceberg_cdc") + "/t.iceberg"
      graft.sources.FsIO.deleteRecursive(table)
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
      def part(g: Int) = li.filter(col("l_orderkey") % 3 === g)
      val I = graft.sources.Iceberg
      I.toIceberg(part(0), table)                   // seq 1 (initial)
      I.toIceberg(part(1), table, mode = "append")  // seq 2
      I.toIceberg(part(2), table, mode = "append")  // seq 3
      I.fromIcebergChanges(s, table)
        .groupBy(col("_sequence_number").cast("int").as("v"))
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"))
        .orderBy("v")
    }),

    // Iceberg streaming TAIL: the same snapshot sequence consumed
    // through graft.streaming.IcebergTailSource over TWO trigger
    // phases — offsets are sequence numbers, so the union of the
    // delivered micro-batches must equal the batch fromIcebergChanges
    // pull over (1, 3].
    "q_iceberg_tail" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_iceberg_tail") + "/t.iceberg"
      graft.sources.FsIO.deleteRecursive(table)
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
      def part(g: Int) = li.filter(col("l_orderkey") % 3 === g)
      val I = graft.sources.Iceberg
      I.toIceberg(part(0), table)                   // seq 1 (excluded)
      I.toIceberg(part(1), table, mode = "append")  // seq 2
      val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double, Long)]()
      val q = s.readStream
        .format(classOf[graft.streaming.IcebergTailSourceProvider].getName)
        .option("path", table)
        .option("startingSequence", "1")
        .load()
        .writeStream
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.select("l_orderkey", "l_quantity", "_sequence_number")
            .collect().foreach(r =>
              got.add((r.getLong(0), r.getDouble(1), r.getLong(2))))
          ()
        }
        .start()
      try {
        q.processAllAvailable()
        I.toIceberg(part(2), table, mode = "append") // seq 3, while running
        q.processAllAvailable()
      } finally q.stop()
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      got.forEach(x => rows.add(org.apache.spark.sql.Row(x._1, x._2, x._3)))
      s.createDataFrame(rows, org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("l_orderkey",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("l_quantity",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("_sequence_number",
            org.apache.spark.sql.types.LongType))))
        .groupBy(col("_sequence_number").cast("int").as("v"))
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"))
        .orderBy("v")
    }),

    // Iceberg snapshot time travel: overwrite + two fast-appends,
    // then reads at each snapshot id (append re-lists prior manifests
    // verbatim, so snapshot 3 reads through THREE manifests).
    "q_iceberg_snapshot" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_iceberg_tt") + "/t.iceberg"
      graft.sources.FsIO.deleteRecursive(table)
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
      def part(g: Int) = li.filter(col("l_orderkey") % 3 === g)
      val I = graft.sources.Iceberg
      I.toIceberg(part(0), table, mode = "overwrite")
      I.toIceberg(part(1), table, mode = "append")
      I.toIceberg(part(2), table, mode = "append")
      val snaps = I.snapshots(s, table).orderBy("sequence_number")
        .collect().map(_.getAs[Long]("snapshot_id")) // 3-row metadata collect
      snaps.zipWithIndex.map { case (sid, i) =>
        I.fromIceberg(s, table, Some(sid))
          .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"))
          .select(lit(i + 1).as("v"), col("n"), col("sum_qty"))
      }.reduce(_ union _).orderBy("v")
    }),

    // Iceberg bounds-based file skipping: range-sharded table, the
    // predicate pushed into fromIceberg prunes manifest entries via
    // lower/upper_bounds (Appendix D decode) — the oracle only sees
    // that the answer equals a plain filtered aggregate.
    "q_iceberg_skipping" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_iceberg_skip") + "/t.iceberg"
      graft.sources.FsIO.deleteRecursive(table)
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        .repartitionByRange(8, col("l_orderkey"))
      graft.sources.Iceberg.toIceberg(li, table)
      graft.sources.Iceberg.fromIceberg(s, table,
          where = Some(col("l_orderkey") <= 1000))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"),
          max(col("l_orderkey")).as("max_key"))
        .orderBy("l_returnflag")
    }),


    // Iceberg merge-on-read: a foreign position-delete commit (sorted
    // (file_path, pos) parquet + content=1 delete manifest) masks rows
    // — the read applies them as a distributed left-anti join on the
    // scan's _metadata coordinates. The oracle just excludes the same
    // rows with a WHERE on the original parquet.
    "q_iceberg_mor" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_iceberg_mor") + "/t.iceberg"
      graft.sources.FsIO.deleteRecursive(table)
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        .repartitionByRange(8, col("l_orderkey"))
      graft.sources.Iceberg.toIceberg(li, table)
      graft.sources.Iceberg.foreignPositionDeletes(s, table,
        col("l_orderkey") % 7 === 3)
      graft.sources.Iceberg.fromIceberg(s, table)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"),
          max(col("l_orderkey")).as("max_key"))
        .orderBy("l_returnflag")
    }),


    // Iceberg EQUALITY deletes (the Flink-CDC merge-on-read shape):
    // a content=2 delete file masks every row matching its equality
    // tuple in data files BELOW its sequence number — rows appended
    // AFTER the delete survive even when they match. The lane deletes
    // flag 'R', then appends fresh 'R' rows; the oracle rebuilds the
    // same state in SQL.
    // Iceberg MIXED deletes: a Flink-style EQUALITY delete (masking
    // l_returnflag='R' rows of data files below its sequence) with OUR
    // position delete committed ON TOP at a higher sequence — the read
    // applies both (strict sequence scoping for the equality delete,
    // exact (path, pos) anti-join for ours). Oracle = the CoW
    // equivalent: both WHEREs on the original parquet.
    "q_iceberg_mixed_deletes" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_iceberg_mixdel") + "/t.iceberg"
      graft.sources.FsIO.deleteRecursive(table)
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        .repartitionByRange(4, col("l_orderkey"))
      val I = graft.sources.Iceberg
      I.toIceberg(li, table)
      import s.implicits._
      I.foreignEqualityDeletes(s, table,
        Seq("R").toDF("l_returnflag"), Seq("l_returnflag"))
      I.deleteWhere(s, table, col("l_orderkey") % 5 === 1)
      I.fromIceberg(s, table)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"),
          max(col("l_orderkey")).as("max_key"))
        .orderBy("l_returnflag")
    }),

    "q_iceberg_eqdel" -> ((s, dir) => {
      val table = cacheDir(dir, "lineitem_iceberg_eq") + "/t.iceberg"
      graft.sources.FsIO.deleteRecursive(table)
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        .repartitionByRange(4, col("l_orderkey"))
      val I = graft.sources.Iceberg
      I.toIceberg(li, table)
      import s.implicits._
      I.foreignEqualityDeletes(s, table,
        Seq("R").toDF("l_returnflag"), Seq("l_returnflag"))
      I.toIceberg(
        t(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R" && col("l_orderkey") <= 100)
          .select((col("l_orderkey") + 10000000L).as("l_orderkey"),
            col("l_quantity"), col("l_returnflag")),
        table, mode = "append")
      I.fromIceberg(s, table)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), r(dsumD(col("l_quantity"))).as("sum_qty"),
          max(col("l_orderkey")).as("max_key"))
        .orderBy("l_returnflag")
    }),

    // npy temporal fields: events round trip through datetime64[us]
    // (NTZ micros) + U-string event types; min/max of the decoded
    // timestamps gate the epoch conversion in both directions.
    "q_npy_events" -> ((s, dir) => {
      val cache = cacheDir(dir, "events_npy") + "/events.npy"
      graft.sources.Npy.toNpy(
        t(s, dir, "events").select(col("event_id"),
          col("ts").cast("timestamp_ntz").as("ts"),
          col("event_type"), col("value")),
        cache)
      graft.sources.Readers.open(s, cache)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          min(col("ts")).as("ts_min"), max(col("ts")).as("ts_max"),
          r(dsumD(col("value"))).as("sum_value"))
        .orderBy("event_type")
    }),

    // distributed sharded Avro export + glob read-back (the scale
    // shape: every partition streams its own container file; the glob
    // read unions per-file distributed reads)
    "q_avro_sharded" -> ((s, dir) => {
      val cache = cacheDir(dir, "lineitem_avro_sh")
      graft.sources.Avro.toAvroSharded(
        narrowLineitem(s, dir).repartition(5), cache)
      agg(graft.sources.Readers.open(s, s"$cache/part-*.avro"))
    }),

    // hdf5 (the reference's NATIVE format): write lineitem as a
    // vaex-layout hdf5 file with the dependency-free writer, read it
    // back with the distributed range-read path, aggregate. The oracle
    // runs on the ORIGINAL parquet, so a round-trip value error in
    // either direction fails the hash compare.
    "q_hdf5_agg" -> ((s, dir) => {
      val cache = new java.io.File(cacheDir(dir, "lineitem_hdf5"), "lineitem.hdf5")
      cache.getParentFile.mkdirs()
      graft.sources.Hdf5.toHdf5(narrowLineitem(s, dir), cache.toString)
      agg(graft.sources.Readers.open(s, cache.toString))
    }),

    // hdf5 CHUNKED+gzip+shuffle (the layout h5py-written scientific
    // files use): same round trip through the chunked writer and the
    // distributed per-chunk-inflate read path; small chunks force a
    // multi-level (level-1) chunk B-tree at sf >= 0.01. Oracle runs on
    // the original parquet.
    "q_hdf5_chunked" -> ((s, dir) => {
      val cache = new java.io.File(cacheDir(dir, "lineitem_hdf5c"), "lineitem_chunked.hdf5")
      cache.getParentFile.mkdirs()
      graft.sources.Hdf5.toHdf5Chunked(narrowLineitem(s, dir), cache.toString,
        chunkElems = 512)
      agg(graft.sources.Hdf5.fromHdf5(s, cache.toString))
    }),

    // hdf5 MODERN format (h5py libver='latest'): superblock v3,
    // version-2 object headers, link-message groups — DENSE
    // (fractal-heap) for the 9-column columns group, past the 8-link
    // compact threshold — v4 chunked data layout with a Fixed Array
    // chunk index + gzip+shuffle filters: the layout the reference
    // reads through h5py (packages/vaex-hdf5/vaex/hdf5/dataset.py:57)
    // when files are written with the latest library version. Oracle
    // runs on the original parquet; the 5 extra columns exist to
    // force dense link storage and are pruned by the read.
    "q_hdf5_latest" -> ((s, dir) => {
      val cache = new java.io.File(cacheDir(dir, "lineitem_hdf5l"), "lineitem_latest.hdf5")
      cache.getParentFile.mkdirs()
      val wide = t(s, dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_orderkey", "l_partkey", "l_suppkey")
      graft.sources.Hdf5.toHdf5Latest(wide, cache.toString,
        chunked = Some((512, 6, true)))
      agg(graft.sources.Hdf5.fromHdf5(s, cache.toString,
        columns = Seq("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")))
    }),

    // Arrow IPC with DICTIONARY-encoded categoricals (what
    // pandas.to_feather writes for category dtypes): the documents
    // table round-trips with lang and source dictionary-encoded +
    // lz4-compressed batches, read back through the distributed
    // footer-indexed path, aggregated per category.
    "q_arrow_dict" -> ((s, dir) => {
      val cache = new java.io.File(cacheDir(dir, "docs_arrowd"), "docs_dict.arrow")
      cache.getParentFile.mkdirs()
      graft.sources.ArrowIpc.write(
        t(s, dir, "documents").select("doc_id", "lang", "source", "n_chars"),
        cache.toString, batchRows = 128, compression = Some("lz4"),
        dictColumns = Seq("lang", "source"))
      graft.sources.Readers.open(s, cache.toString)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("first_doc"))
        .orderBy("lang", "source")
    }),

    // vaex.open('part_*.hdf5') / open_many: lineitem split into three
    // hdf5 shards (hash-partitioned on the order key), opened back as
    // ONE frame through the glob path, aggregated — shard routing,
    // concat order-insensitivity and per-shard reads all hash-gate
    // against the single original parquet.
    "q_open_many" -> ((s, dir) => {
      val cache = new java.io.File(cacheDir(dir, "lineitem_shards"))
      cache.mkdirs()
      val narrow = t(s, dir, "lineitem")
        .select("l_orderkey", "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
      (0 until 3).foreach { i =>
        graft.sources.Hdf5.toHdf5(
          narrow.where(pmod(col("l_orderkey"), lit(3)) === i)
            .drop("l_orderkey"),
          new java.io.File(cache, f"part_$i%02d.hdf5").toString)
      }
      agg(graft.sources.Readers.open(s, s"${cache.toString}/part_*.hdf5"))
    }),

    // DISTRIBUTED sharded hdf5 export: each partition writes its own
    // part file from its executor (the per-file 2^31 caps apply per
    // shard); the shards glob-open back as one frame.
    "q_hdf5_sharded" -> ((s, dir) => {
      val cache = new java.io.File(cacheDir(dir, "lineitem_h5sh"))
      graft.sources.Hdf5.toHdf5Sharded(
        narrowLineitem(s, dir).repartition(6), cache.toString)
      agg(graft.sources.Readers.open(s, s"${cache.toString}/part-*.hdf5"))
    }),

    // DISTRIBUTED sharded Arrow export: every lineitem partition
    // writes its own part file from its executor (no driver
    // streaming), the shards glob-open back as one frame.
    "q_arrow_sharded" -> ((s, dir) => {
      val cache = new java.io.File(cacheDir(dir, "lineitem_arrowsh"))
      graft.sources.ArrowIpc.writeSharded( // clears stale shards itself
        narrowLineitem(s, dir).repartition(6), cache.toString,
        batchRows = 8192, compression = Some("lz4"))
      agg(graft.sources.Readers.open(s, s"${cache.toString}/part-*.arrow"))
    }),

    // Arrow IPC LIST columns (the pyarrow shape embedding dumps and
    // token lists ship in — vaex stores string/array columns as arrow
    // lists natively): the embeddings table round-trips vec_id +
    // list<float> embedding + int32 label through the IPC writer with
    // zstd batches, reads back distributed, and drives vector math —
    // list offsets, float bits and row alignment all hash-gate
    // against the original parquet.
    "q_arrow_embed" -> ((s, dir) => {
      val cache = new java.io.File(cacheDir(dir, "emb_arrowl"), "embeddings.arrow")
      cache.getParentFile.mkdirs()
      graft.sources.ArrowIpc.write(
        t(s, dir, "embeddings").select("vec_id", "embedding", "label"),
        cache.toString, batchRows = 256, compression = Some("zstd"))
      graft.sources.Readers.open(s, cache.toString)
        .select(col("vec_id"), col("label"),
          size(col("embedding")).as("n_dims"),
          round(sqrt(aggregate(col("embedding"), lit(0.0d),
            (a, x) => a + x.cast("double") * x.cast("double"))), 6).as("norm"))
        .orderBy("vec_id")
    }),

    // Arrow IPC TEMPORAL columns (pandas timestamp[us] frames): the
    // events table round-trips naive microsecond timestamps plus a
    // dictionary-encoded category column; min/max timestamps and the
    // exact-decimal value sum hash-gate microsecond fidelity.
    "q_arrow_events" -> ((s, dir) => {
      val cache = new java.io.File(cacheDir(dir, "events_arrowt"), "events.arrow")
      cache.getParentFile.mkdirs()
      graft.sources.ArrowIpc.write(
        t(s, dir, "events").select("event_id", "ts", "user_id", "event_type", "value"),
        cache.toString, batchRows = 1024, compression = Some("lz4"),
        dictColumns = Seq("event_type"))
      graft.sources.Readers.open(s, cache.toString)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          min(col("ts")).as("ts_min"), max(col("ts")).as("ts_max"),
          r(dsumD(col("value"))).as("sum_value"))
        .orderBy("event_type")
    }),

    // Arrow IPC STRUCT columns (nested pandas/pyarrow frames): events
    // round-trips a struct<user_id, value> column; struct validity,
    // child alignment and values hash-gate against the flat parquet.
    "q_arrow_struct" -> ((s, dir) => {
      val cache = new java.io.File(cacheDir(dir, "events_arrows"), "events_struct.arrow")
      cache.getParentFile.mkdirs()
      graft.sources.ArrowIpc.write(
        t(s, dir, "events").select(col("event_id"), col("event_type"),
          struct(col("user_id"), col("value")).as("ev")),
        cache.toString, batchRows = 1024, compression = Some("zstd"))
      graft.sources.Readers.open(s, cache.toString)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("ev.user_id")).as("sum_user"),
          r(dsumD(col("ev.value"))).as("sum_value"))
        .orderBy("event_type")
    }),

    // hdf5 VARIABLE-LENGTH datasets (what generic h5py files carry
    // by default: str dtype = vlen strings through the global heap,
    // vlen_dtype = ragged numeric arrays): documents' text/lang go
    // out as vlen strings, a ragged per-doc array derived from
    // doc_id as a vlen int64 sequence, read back and aggregated —
    // string bytes, heap resolution and array lengths all hash-gate
    // against the original parquet.
    "q_hdf5_vlen" -> ((s, dir) => {
      val cache = new java.io.File(cacheDir(dir, "docs_hdf5v"), "docs_vlen.hdf5")
      cache.getParentFile.mkdirs()
      val docs = t(s, dir, "documents")
        .select("doc_id", "text", "lang", "n_chars").orderBy("doc_id")
        .collect()
      graft.sources.Hdf5.writeFlatFile(cache.toString,
        longs = Seq(
          "doc_id" -> docs.map(_.getAs[Long]("doc_id")),
          "n_chars" -> docs.map(_.getAs[Long]("n_chars"))),
        vlenStrings = Seq(
          "text" -> docs.map(_.getAs[String]("text")),
          "lang" -> docs.map(_.getAs[String]("lang"))),
        vlenLongSeqs = Seq("marks" -> docs.map { r =>
          val id = r.getAs[Long]("doc_id")
          Array.tabulate((id % 5).toInt)(j => id * 10 + j)
        }))
      graft.sources.Hdf5.fromHdf5(s, cache.toString)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(length(col("text")).cast("long")).as("sum_text_len"),
          sum(size(col("marks")).cast("long")).as("sum_marks"))
        .orderBy("lang")
    }),

    // hdf5 2-D MATRIX datasets (the (N, D) float32 shape ML embedding
    // dumps ship in): the embeddings table round-trips through a
    // matrix dataset + vec_id vector, reads back as an ArrayType
    // column, and drives vector math — element order, float bits and
    // row alignment all hash-gate against the original parquet.
    "q_hdf5_matrix" -> ((s, dir) => {
      val cache = new java.io.File(cacheDir(dir, "emb_hdf5m"), "embeddings.hdf5")
      cache.getParentFile.mkdirs()
      val rows = t(s, dir, "embeddings").orderBy("vec_id").collect()
      graft.sources.Hdf5.writeFlatFile(cache.toString,
        longs = Seq("vec_id" -> rows.map(_.getAs[Long]("vec_id"))),
        floatMatrices = Seq("embedding" ->
          rows.map(_.getSeq[Float](1).toArray)))
      val df = graft.sources.Hdf5.fromHdf5(s, cache.toString)
      df.select(col("vec_id"),
          size(col("embedding")).as("n_dims"),
          round(sqrt(aggregate(col("embedding"), lit(0.0d),
            (a, x) => a + x.cast("double") * x.cast("double"))), 6).as("norm"))
        .orderBy("vec_id")
    }),

    // hdf5 BOOLEAN datasets (h5py np.bool_ = ENUM{FALSE,TRUE} over
    // int8): derived plain + nullable bool columns round-trip through
    // the chunked writer; enum decode, null bitmap and values gate
    // against the original parquet.
    "q_hdf5_bool" -> ((s, dir) => {
      val cache = new java.io.File(cacheDir(dir, "lineitem_hdf5b"), "lineitem_bool.hdf5")
      cache.getParentFile.mkdirs()
      val df = t(s, dir, "lineitem").select(
        (col("l_returnflag") === "R").as("is_return"),
        when(col("l_quantity") > 25, col("l_linestatus") === "F").as("big_final"))
      graft.sources.Hdf5.toHdf5Chunked(df, cache.toString, chunkElems = 2048)
      graft.sources.Hdf5.fromHdf5(s, cache.toString)
        .groupBy("is_return")
        .agg(count(lit(1)).as("n"),
          count(col("big_final")).as("n_big"),
          sum(when(col("big_final") === true, 1L).otherwise(0L)).as("n_big_final"))
        .orderBy("is_return")
    }),

    // hdf5 ARRAY-COLUMN export (the vaex table layout for embedding
    // columns): the embeddings table goes through the STANDARD
    // streaming toHdf5 path — array columns become (n, d) matrix
    // datasets in the column group, chunked+gzip — and reads back to
    // drive vector math; element order, float bits, chunk boundaries
    // and row alignment hash-gate against the original parquet.
    "q_hdf5_embed" -> ((s, dir) => {
      val cache = new java.io.File(cacheDir(dir, "emb_hdf5e"), "embeddings_col.hdf5")
      cache.getParentFile.mkdirs()
      graft.sources.Hdf5.toHdf5Chunked(
        t(s, dir, "embeddings").select("vec_id", "embedding", "label"),
        cache.toString, chunkElems = 512)
      graft.sources.Hdf5.fromHdf5(s, cache.toString)
        .select(col("vec_id"), col("label"),
          size(col("embedding")).as("n_dims"),
          round(sqrt(aggregate(col("embedding"), lit(0.0d),
            (a, x) => a + x.cast("double") * x.cast("double"))), 6).as("norm"))
        .orderBy("vec_id")
    }),

    // FITS (the astronomy format the reference exports via astropy,
    // core/dataframe.py:6973 export_fits and vaex-astro reads): same
    // round trip through the BINTABLE writer and the distributed
    // fixed-width-row range read. Oracle runs on the original parquet.
    "q_fits_agg" -> ((s, dir) => {
      val cache = new java.io.File(cacheDir(dir, "lineitem_fits"), "lineitem.fits")
      cache.getParentFile.mkdirs()
      graft.sources.Fits.toFits(narrowLineitem(s, dir), cache.toString)
      agg(graft.sources.Readers.open(s, cache.toString))
    }),

    // FITS VECTOR columns (TFORM repeat counts — astropy's array
    // columns): embeddings round-trip as an rE vector column and
    // drive the same norm math as the hdf5 matrix lane.
    "q_fits_vector" -> ((s, dir) => {
      val cache = new java.io.File(cacheDir(dir, "emb_fitsv"), "embeddings.fits")
      cache.getParentFile.mkdirs()
      graft.sources.Fits.toFits(
        t(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
        cache.toString)
      graft.sources.Fits.fromFits(s, cache.toString)
        .select(col("vec_id"),
          size(col("embedding")).as("n_dims"),
          round(sqrt(aggregate(col("embedding"), lit(0.0d),
            (a, x) => a + x.cast("double") * x.cast("double"))), 6).as("norm"))
        .orderBy("vec_id")
    }),

    // FITS TSCAL/TZERO scaled columns (astropy's uint32 convention +
    // float calibration): l_orderkey stores as raw-signed TFORM J
    // with TZERO 2^31, quantity/price store calibrated with
    // binary-exact factors; descaling on read hash-gates against the
    // original parquet.
    "q_fits_scaled" -> ((s, dir) => {
      val cache = new java.io.File(cacheDir(dir, "lineitem_fitss"), "lineitem_scaled.fits")
      cache.getParentFile.mkdirs()
      val df = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_returnflag"), col("l_linestatus"),
        col("l_quantity"), col("l_extendedprice"))
      graft.sources.Fits.toFits(df, cache.toString, scales = Map(
        "l_orderkey" -> ((1.0, 2147483648.0)),
        "l_quantity" -> ((0.25, 1024.0)),
        "l_extendedprice" -> ((0.25, 0.0))))
      graft.sources.Fits.fromFits(s, cache.toString)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(r(dsumD(col("l_quantity"))).as("sum_qty"),
          r(dsumD(col("l_extendedprice"))).as("sum_price"),
          count(lit(1)).as("n"),
          min(col("l_orderkey")).as("min_ok"),
          max(col("l_orderkey")).as("max_ok"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // DISTRIBUTED sharded FITS export: per-partition part files from
    // executors (string widths resolved per shard), glob-opened back.
    "q_fits_sharded" -> ((s, dir) => {
      val cache = new java.io.File(cacheDir(dir, "lineitem_fitsh"))
      graft.sources.Fits.toFitsSharded(
        narrowLineitem(s, dir).repartition(5), cache.toString)
      agg(graft.sources.Readers.open(s, s"${cache.toString}/part-*.fits"))
    }),

    // bucketed co-located join: orders and customer are exported
    // bucketed on the customer key, then joined through the catalog —
    // at scale the join plans with zero Exchange (asserted in
    // PlanQualitySpec); here the oracle checks the result matches the
    // plain parquet join bit-for-bit.
    "q_bucketed_join" -> ((s, dir) => {
      val cache = cacheDir(dir, "bkt")
      graft.sources.Export.exportBucketed(t(s, dir, "orders"),
        "graft_bkt_orders", s"$cache/orders", Seq("o_custkey"), 8, Seq("o_custkey"))
      graft.sources.Export.exportBucketed(t(s, dir, "customer"),
        "graft_bkt_customer", s"$cache/customer", Seq("c_custkey"), 8, Seq("c_custkey"))
      val o = s.table("graft_bkt_orders"); val c = s.table("graft_bkt_customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), r(dsumD(col("o_totalprice"))).as("sum_total"))
        .orderBy("c_mktsegment")
    })
  )

  /** Shared by q_npz_embed + the two safetensors lanes. */
  private val embedAggSql =
    s"""SELECT vec_id % 8 AS g, COUNT(*) AS n,
       |  MIN(vec_id) AS min_id, MAX(vec_id) AS max_id,
       |  CAST(SUM(label) AS BIGINT) AS sum_label,
       |  ${sqlR(sqlDsum("CAST(embedding[1] AS DOUBLE)"))} AS sum_first,
       |  ${sqlR(sqlDsum("CAST(embedding[-1] AS DOUBLE)"))} AS sum_last
       |FROM embeddings GROUP BY 1 ORDER BY g""".stripMargin

  private val aggSql =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty,
       |  ${sqlR(sqlDsum("l_extendedprice"))} AS sum_price,
       |  COUNT(*) AS n
       |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_arrow_dict" ->
      """SELECT lang, source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  MIN(doc_id) AS first_doc
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_arrow_embed" ->
      """SELECT vec_id, label, CAST(LEN(embedding) AS INT) AS n_dims,
        |  ROUND(SQRT(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_arrow_events" ->
      s"""SELECT event_type, COUNT(*) AS n,
         |  MIN(ts) AS ts_min, MAX(ts) AS ts_max,
         |  ${sqlR(sqlDsum("value"))} AS sum_value
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_arrow_struct" ->
      s"""SELECT event_type, COUNT(*) AS n,
         |  CAST(SUM(user_id) AS BIGINT) AS sum_user,
         |  ${sqlR(sqlDsum("value"))} AS sum_value
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_hdf5_vlen" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_text_len,
        |  CAST(SUM(doc_id % 5) AS BIGINT) AS sum_marks
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_hdf5_matrix" ->
      """SELECT vec_id, CAST(LEN(embedding) AS INT) AS n_dims,
        |  ROUND(SQRT(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_fits_vector" ->
      """SELECT vec_id, CAST(LEN(embedding) AS INT) AS n_dims,
        |  ROUND(SQRT(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_hdf5_embed" ->
      """SELECT vec_id, label, CAST(LEN(embedding) AS INT) AS n_dims,
        |  ROUND(SQRT(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_fits_scaled" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty,
         |  ${sqlR(sqlDsum("l_extendedprice"))} AS sum_price,
         |  COUNT(*) AS n,
         |  MIN(l_orderkey) AS min_ok, MAX(l_orderkey) AS max_ok
         |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_hdf5_bool" ->
      """SELECT (l_returnflag = 'R') AS is_return, COUNT(*) AS n,
        |  CAST(COUNT(CASE WHEN l_quantity > 25 THEN 1 END) AS BIGINT) AS n_big,
        |  CAST(SUM(CASE WHEN l_quantity > 25 AND l_linestatus = 'F'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_big_final
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_open_many" -> aggSql,
    "q_arrow_sharded" -> aggSql,
    "q_hdf5_sharded" -> aggSql,
    "q_fits_sharded" -> aggSql,
    "q_csv_agg" -> aggSql,
    "q_ascii_agg" -> aggSql,
    "q_json_agg" -> aggSql,
    "q_orc_agg" -> aggSql,
    "q_avro_agg" -> aggSql,
    "q_avro_sharded" -> aggSql,
    "q_npy_agg" -> aggSql,
    "q_npy_sharded" -> aggSql,
    "q_npz_embed" -> embedAggSql,
    "q_safetensors_embed" -> embedAggSql,
    "q_safetensors_sharded" -> embedAggSql,
    "q_tfrecord_embed" -> embedAggSql,
    "q_zarr_embed" -> embedAggSql,
    "q_zarr_blosc" -> embedAggSql,
    "q_zarr_bitshuf" -> embedAggSql,
    "q_zarr_v3" -> embedAggSql,
    "q_zarr_shard" -> embedAggSql,
    "q_jsonl_zst" -> aggSql,
    "q_delta_agg" -> aggSql,
    "q_delta_skipping" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty,
         |  MAX(l_orderkey) AS max_key
         |FROM lineitem WHERE l_orderkey <= 1000
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_delta_rename" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty,
         |  MAX(l_orderkey) AS max_key
         |FROM lineitem
         |WHERE l_quantity <= 49 AND l_orderkey <= 3000
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_delta_colmap_maint" ->
      s"""WITH state AS (
         |  SELECT l_orderkey, l_quantity, l_returnflag FROM lineitem
         |  WHERE l_orderkey % 11 <> 7 AND l_orderkey % 13 <> 0
         |  UNION ALL
         |  SELECT l_orderkey, MAX(l_quantity) + 100, MAX(l_returnflag)
         |  FROM lineitem WHERE l_orderkey % 13 = 0 GROUP BY 1)
         |SELECT l_returnflag, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty,
         |  MAX(l_orderkey) AS max_key
         |FROM state WHERE l_orderkey <= 3000
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_delta_colmap" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty,
         |  MAX(l_orderkey) AS max_key
         |FROM lineitem WHERE l_orderkey <= 1000
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_delta_colmap_id" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty,
         |  MAX(l_orderkey) AS max_key
         |FROM lineitem WHERE l_orderkey <= 1000
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_delta_widen" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty,
         |  MAX(l_orderkey) AS max_key
         |FROM lineitem WHERE l_orderkey <= 4500
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_delta_cdf" ->
      s"""SELECT 2 AS v, 'insert' AS ct, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("o_totalprice"))} AS sum_tp,
         |  MAX(o_orderkey) + 100000000 AS max_key
         |FROM orders WHERE o_orderkey % 10 = 4
         |UNION ALL SELECT 2, 'update_postimage', COUNT(*),
         |  ${sqlR(sqlDsum("o_totalprice + 1000"))}, MAX(o_orderkey)
         |FROM orders WHERE o_orderkey % 10 = 3
         |UNION ALL SELECT 2, 'update_preimage', COUNT(*),
         |  ${sqlR(sqlDsum("o_totalprice"))}, MAX(o_orderkey)
         |FROM orders WHERE o_orderkey % 10 = 3
         |UNION ALL SELECT 3, 'delete', COUNT(*),
         |  ${sqlR(sqlDsum("o_totalprice"))}, MAX(o_orderkey)
         |FROM orders WHERE o_orderkey % 10 = 7
         |ORDER BY v, ct""".stripMargin,
    "q_delta_cdf_tail" ->
      s"""SELECT 2 AS v, 'insert' AS ct, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("o_totalprice"))} AS sum_tp,
         |  MAX(o_orderkey) + 100000000 AS max_key
         |FROM orders WHERE o_orderkey % 10 = 4
         |UNION ALL SELECT 2, 'update_postimage', COUNT(*),
         |  ${sqlR(sqlDsum("o_totalprice + 1000"))}, MAX(o_orderkey)
         |FROM orders WHERE o_orderkey % 10 = 3
         |UNION ALL SELECT 2, 'update_preimage', COUNT(*),
         |  ${sqlR(sqlDsum("o_totalprice"))}, MAX(o_orderkey)
         |FROM orders WHERE o_orderkey % 10 = 3
         |UNION ALL SELECT 3, 'delete', COUNT(*),
         |  ${sqlR(sqlDsum("o_totalprice"))}, MAX(o_orderkey)
         |FROM orders WHERE o_orderkey % 10 = 7
         |ORDER BY v, ct""".stripMargin,
    "q_delta_dv" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty,
         |  MAX(l_orderkey) AS max_key
         |FROM lineitem WHERE l_orderkey % 7 <> 3
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_delta_dv_purge" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty,
         |  MAX(l_orderkey) AS max_key
         |FROM lineitem WHERE l_orderkey % 7 <> 3
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_delta_dv_delete" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty,
         |  MAX(l_orderkey) AS max_key
         |FROM lineitem
         |WHERE NOT (l_orderkey <= 4000 AND l_orderkey % 7 = 3)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_delta_v2cp" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty,
         |  MAX(l_orderkey) AS max_key
         |FROM lineitem WHERE l_orderkey <= 1000
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_delta_dv_compact" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty,
         |  MAX(l_orderkey) AS max_key
         |FROM lineitem
         |WHERE l_orderkey % 7 <> 3 AND l_orderkey <= 3000
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_delta_dv_checkpoint" ->
      s"""WITH state AS (
         |  SELECT l_orderkey, l_quantity, l_returnflag FROM lineitem
         |  WHERE l_orderkey % 7 <> 3
         |  UNION ALL
         |  SELECT l_orderkey + 10000000, l_quantity, l_returnflag
         |  FROM lineitem WHERE l_orderkey % 13 = 0)
         |SELECT l_returnflag, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty,
         |  MAX(l_orderkey) AS max_key
         |FROM state GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_delta_dv_colmap_delete" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty,
         |  MAX(l_orderkey) AS max_key
         |FROM lineitem
         |WHERE l_orderkey % 7 <> 3 AND l_orderkey % 7 <> 5
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_delta_v2cp_write" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty,
         |  MAX(l_orderkey) AS max_key
         |FROM lineitem WHERE l_orderkey % 11 <> 4
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_delta_multicp" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty,
         |  MAX(l_orderkey) AS max_key
         |FROM lineitem
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_delta_optimize" ->
      s"""SELECT l_partkey % 4 AS g, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty
         |FROM lineitem WHERE l_orderkey <= 1000
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_delta_sql" -> aggSql,
    "q_delta_changes" ->
      s"""WITH g AS (SELECT l_orderkey % 3 AS grp, l_quantity FROM lineitem)
         |SELECT 1 AS v, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty FROM g WHERE grp = 1
         |UNION ALL SELECT 2 AS v, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty FROM g WHERE grp = 2
         |ORDER BY v""".stripMargin,
    "q_delta_tail" ->
      s"""WITH g AS (SELECT l_orderkey % 3 AS grp, l_quantity FROM lineitem)
         |SELECT 1 AS v, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty FROM g WHERE grp = 1
         |UNION ALL SELECT 2 AS v, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty FROM g WHERE grp = 2
         |ORDER BY v""".stripMargin,
    "q_delta_upsert" ->
      """WITH up AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id % 7 = 0 THEN n_chars + 100000 ELSE n_chars END AS n_chars
        |  FROM documents),
        |ins AS (
        |  SELECT doc_id + 10000000 AS doc_id, 'xx' AS lang,
        |    CAST(doc_id % 97 AS INT) AS n_chars
        |  FROM documents WHERE doc_id % 7 = 0),
        |merged AS (SELECT * FROM up UNION ALL SELECT * FROM ins)
        |SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_delta_delete" ->
      """SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  MIN(doc_id) AS min_id
        |FROM documents
        |WHERE NOT (doc_id % 10 = 3 OR n_chars < 200)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_iceberg_agg" -> aggSql,
    "q_iceberg_skipping" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty,
         |  MAX(l_orderkey) AS max_key
         |FROM lineitem WHERE l_orderkey <= 1000
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_iceberg_mor" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty,
         |  MAX(l_orderkey) AS max_key
         |FROM lineitem WHERE l_orderkey % 7 <> 3
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_iceberg_mixed_deletes" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty,
         |  MAX(l_orderkey) AS max_key
         |FROM lineitem
         |WHERE l_returnflag <> 'R' AND l_orderkey % 5 <> 1
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_iceberg_eqdel" ->
      s"""WITH state AS (
         |  SELECT l_orderkey, l_quantity, l_returnflag FROM lineitem
         |  WHERE l_returnflag <> 'R'
         |  UNION ALL
         |  SELECT l_orderkey + 10000000, l_quantity, l_returnflag
         |  FROM lineitem WHERE l_returnflag = 'R' AND l_orderkey <= 100)
         |SELECT l_returnflag, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty,
         |  MAX(l_orderkey) AS max_key
         |FROM state GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_iceberg_delete" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty,
         |  MAX(l_orderkey) AS max_key
         |FROM lineitem
         |WHERE NOT (l_orderkey <= 4000 AND l_orderkey % 7 = 3)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_iceberg_partitioned" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty,
         |  MAX(l_orderkey) AS max_key
         |FROM lineitem
         |WHERE l_orderkey % 9 <> 2 AND l_orderkey <= 3000
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_iceberg_bucket" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty,
         |  MAX(l_orderkey) AS max_key
         |FROM lineitem
         |WHERE l_orderkey % 7 <> 5 AND l_orderkey <= 3000
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_iceberg_day" ->
      s"""SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("value"))} AS sum_value,
         |  COUNT(DISTINCT user_id) AS users
         |FROM events WHERE event_id % 5 <> 1
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_iceberg_evolve" ->
      s"""SELECT CASE WHEN l_orderkey <= 4000 THEN '_none'
         |  ELSE l_returnflag END AS flag,
         |  COUNT(*) AS n, ${sqlR(sqlDsum("l_quantity"))} AS sum_qty,
         |  MAX(l_orderkey) AS max_key
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_iceberg_changelog" ->
      s"""SELECT 1 AS v, 'insert' AS ct, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("o_totalprice"))} AS sum_tp,
         |  MAX(o_orderkey) AS max_key
         |FROM orders WHERE o_orderkey % 3 = 0
         |UNION ALL SELECT 2, 'insert', COUNT(*),
         |  ${sqlR(sqlDsum("o_totalprice"))}, MAX(o_orderkey)
         |FROM orders WHERE o_orderkey % 3 <> 0
         |UNION ALL SELECT 3, 'delete', COUNT(*),
         |  ${sqlR(sqlDsum("o_totalprice"))}, MAX(o_orderkey)
         |FROM orders WHERE o_orderkey % 10 = 7
         |ORDER BY v, ct""".stripMargin,
    "q_iceberg_changes" ->
      s"""WITH g AS (SELECT l_orderkey % 3 AS grp, l_quantity FROM lineitem)
         |SELECT 1 AS v, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty FROM g WHERE grp = 0
         |UNION ALL SELECT 2 AS v, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty FROM g WHERE grp = 1
         |UNION ALL SELECT 3 AS v, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty FROM g WHERE grp = 2
         |ORDER BY v""".stripMargin,
    "q_iceberg_tail" ->
      s"""WITH g AS (SELECT l_orderkey % 3 AS grp, l_quantity FROM lineitem)
         |SELECT 2 AS v, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty FROM g WHERE grp = 1
         |UNION ALL SELECT 3 AS v, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty FROM g WHERE grp = 2
         |ORDER BY v""".stripMargin,
    "q_iceberg_snapshot" ->
      s"""WITH g AS (SELECT l_orderkey % 3 AS grp, l_quantity FROM lineitem)
         |SELECT 1 AS v, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty FROM g WHERE grp <= 0
         |UNION ALL SELECT 2 AS v, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty FROM g WHERE grp <= 1
         |UNION ALL SELECT 3 AS v, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty FROM g WHERE grp <= 2
         |ORDER BY v""".stripMargin,
    "q_delta_partitioned" -> aggSql,
    "q_delta_timetravel" ->
      s"""WITH g AS (SELECT l_orderkey % 3 AS grp, l_quantity FROM lineitem)
         |SELECT 1 AS v, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty FROM g WHERE grp <= 1
         |UNION ALL SELECT 2 AS v, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty FROM g WHERE grp <= 2
         |UNION ALL SELECT 3 AS v, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("l_quantity"))} AS sum_qty FROM g WHERE grp <= 1
         |ORDER BY v""".stripMargin,
    "q_webdataset_mm" ->
      """SELECT doc_id, 'jpeg' AS format,
        |  CAST(9 + doc_id % 40 AS INT) AS width,
        |  CAST(9 + (doc_id * 11) % 40 AS INT) AS height,
        |  ROUND(CAST((doc_id * 7) % 256 AS DOUBLE), 6) AS brightness,
        |  CAST(LENGTH('img ' || doc_id) AS BIGINT) AS caption_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_webdataset" ->
      """SELECT doc_id % 7 AS g, COUNT(*) AS n,
        |  CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_len,
        |  MIN(doc_id) AS min_id,
        |  CAST(SUM(LENGTH('{"lang":"' || lang || '"}')) AS BIGINT) AS sum_js
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_tfrecord_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlR(sqlDsum("CAST(CAST(l_quantity AS REAL) AS DOUBLE)"))} AS sum_qty,
         |  ${sqlR(sqlDsum("CAST(CAST(l_extendedprice AS REAL) AS DOUBLE)"))} AS sum_price,
         |  COUNT(*) AS n
         |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_npy_events" ->
      s"""SELECT event_type, COUNT(*) AS n,
         |  MIN(ts) AS ts_min, MAX(ts) AS ts_max,
         |  ${sqlR(sqlDsum("value"))} AS sum_value
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_warc_pipeline" ->
      """WITH page AS (
        |  SELECT doc_id,
        |    '<html><head><title>Doc ' || doc_id || '</title><script type="text/javascript">var a=1 < 2;var b="</div>";</script></head><body><h1>Doc '
        |    || doc_id || '</h1><p>' || regexp_replace(text, ' the ', ' <b>the</b> ', 'g')
        |    || '</p><div class="nav">nav menu links</div><!-- hidden --></body></html>' AS p
        |  FROM documents),
        |ext AS (
        |  SELECT doc_id, TRIM(regexp_replace(
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(p, '<script[^>]*>.*?</script>', ' ', 'g'),
        |        '<!--.*?-->', ' ', 'g'),
        |      '<[^>]*>', ' ', 'g'),
        |    ' +', ' ', 'g')) AS extracted
        |  FROM page)
        |SELECT doc_id,
        |  CAST(LENGTH(extracted) AS BIGINT) AS n_chars,
        |  CAST(LEN(string_split(extracted, ' ')) AS BIGINT) AS n_tokens,
        |  substring(extracted, 1, 25) AS head
        |FROM ext ORDER BY doc_id""".stripMargin,
    "q_warc_file" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'response'
        |       WHEN doc_id % 3 = 1 THEN 'request' ELSE 'metadata' END AS warc_type,
        |  'site' || CAST(doc_id % 17 AS VARCHAR) || '.example' ||
        |    CAST(doc_id % 5 AS VARCHAR) || '.com' AS host,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
        |  substring(text, 1, 20) AS payload_head
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_avro_nested" ->
      s"""SELECT o_orderkey % 7 AS g, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("o_totalprice"))} AS sum_tp,
         |  CAST(SUM(o_custkey) AS BIGINT) AS sum_ck,
         |  ${sqlR(sqlDsum("o_totalprice"))} AS sum_m,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_dec
         |FROM orders GROUP BY 1 ORDER BY g""".stripMargin,
    "q_avro_events" ->
      s"""SELECT event_type, COUNT(*) AS n,
         |  MIN(ts) AS ts_min, MAX(ts) AS ts_max,
         |  ${sqlR(sqlDsum("value"))} AS sum_value
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_hdf5_agg" -> aggSql,
    "q_hdf5_chunked" -> aggSql,
    "q_hdf5_latest" -> aggSql,
    "q_fits_agg" -> aggSql,
    "q_bucketed_join" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n,
         |  ${sqlR(sqlDsum("o_totalprice"))} AS sum_total
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin)
}
