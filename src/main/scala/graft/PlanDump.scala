package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans of headline queries to PLANS.md —
  * the plan-review artifact: shows pushdown, pruning, broadcast,
  * partial aggregation, and codegen stage boundaries per query.
  * Usage: tools/run.sh graft.PlanDump /root/testdata/sf0.001 PLANS.md
  */
object PlanDump {
  private val HEADLINE = Seq(
    "q1_agg", "q_filter_project", "q_join_left", "q_groupby_multi",
    "q_shift_diff", "q_lsh_neardup", "q_ivf_ann", "q_similarity_topk",
    "q_stream_tumbling", "q_h2o_high", "q_facade_selection",
    "q_join_positional", "q_dedup_groups", "q_csv_agg", "q_mm_decode",
    "q_facade_pyexpr", "q_hdf5_agg", "q_bucketed_join",
    "q_stream_interval_join", "q_geo_which_polygon",
    "q_rolling_median", "q_hdf5_latest", "q_decontaminate", "q_seq_pack",
    "q_embed_lsh", "q_pq_encode", "q_span_dedup", "q_semdedup",
    "q_pq_adc", "q_source_cap",
    // r10: the dense-lookup join must show ZERO Exchange/Join operators
    // (pure projection over the fact scan); paragraph dedup one hash
    // window + one doc groupBy; ivf_pq one scan + WindowGroupLimit
    "q_join_dense", "q_paragraph_dedup", "q_ivf_pq",
    // r11: kernel lanes — winnowing/blocklist/entropy must show a
    // single codegen'd Project over the scan (zero Exchange before the
    // final sort); bm25 shows the vocabulary filter pushed below the
    // tf aggregation and broadcast df/avgdl
    "q_winnow_fingerprint", "q_blocklist_filter", "q_char_entropy",
    "q_bm25_topk",
    // signature-only LSH verify: the post-candidate joins must carry
    // only the fixed-width sig arrays (K longs/doc), never the hs sets
    "q_lsh_neardup_sig",
    // r12: classifier/cleanup must be single codegen'd Projects over
    // the scan; incremental dedup one hash-dictionary join; tfidf
    // shows the rare-term candidate join feeding a (pair, term)
    // weight join — nothing all-pairs, n-docs as a 1-row broadcast
    "q_quality_classifier", "q_text_clean", "q_incremental_dedup",
    "q_tfidf_cosine", "q_shard_assign", "q_corpus_diff", "q_robots_rules",
    // r13: tfidf persists tf/w (<=2 corpus scans), shard_assign rides
    // (shard, hash-bucket) windows, warc_file is the distributed
    // member-scan split read, avro_nested the converter-tree read
    "q_warc_file", "q_avro_nested", "q_warc_pipeline",
    // r13 session 2: range join must show an equi-join on bin
    // ordinals (no NestedLoop/Cartesian); bpe one pair-count shuffle
    // per iteration feeding a 1-row broadcast merge decision; npz is
    // the distributed multi-member aligned range read
    "q_range_join", "q_range_overlap", "q_bpe_learn", "q_npz_embed",
    // r14: left-outer range join keeps the binned equi-join shape
    // with the point side preserved; bpe_apply is one codegen'd
    // Project over the scan feeding a short-key count shuffle; the
    // new container reads must show distributed scans (safetensors =
    // range-read splits, tfrecord = one task per file, webdataset =
    // per-file index + member-level payload reads)
    "q_range_join_left", "q_bpe_apply", "q_event_funnel",
    "q_safetensors_sharded", "q_tfrecord_agg", "q_webdataset",
    "q_stream_funnel", "q_zarr_embed", "q_webdataset_mm",
    // r14 lakehouse/GD tail + r15: the skipping lanes must show
    // PRUNED scan branches (fewer files than the table holds), the
    // GD per-step plan is one scan -> partial agg -> 1-row broadcast
    // weight join per iteration, jsonl_zst one decode task per
    // shard; colmap scans physical names under logical aliases; the
    // DV lane shows the dv filter INSIDE the scan stage (no join);
    // iceberg MoR is the left-anti join on (path, pos)
    "q_delta_skipping", "q_iceberg_skipping", "q_gd_linreg",
    "q_jsonl_zst", "q_delta_colmap", "q_delta_dv", "q_iceberg_mor",
    "q_zarr_blosc",
    // r16: v2cp/multicp must plan the SAME pruned scan shapes as the
    // classic-checkpoint lanes (checkpoint form is invisible to the
    // plan); dv_delete shows the dv anti-filter inside the scan with
    // NO rewrite job; iceberg_changes is per-snapshot scan branches
    // unioned (no join); groupby_dict is one codegen'd dictionary
    // probe feeding the fused dense kernel (no Exchange before the
    // partials)
    "q_delta_v2cp", "q_delta_multicp", "q_delta_dv_delete",
    "q_iceberg_changes", "q_groupby_dict", "q_zarr_bitshuf",
    // r16 session 2: purge leaves plain scans (DVs gone, no filter);
    // iceberg_delete is the broadcast left-anti on (fid, pos) over
    // the sharded delete files; zarr_v3 is the same chunk-range scan
    // as v2 (store format invisible to the plan)
    "q_delta_dv_purge", "q_iceberg_delete", "q_zarr_v3",
    // r17: v2cp WRITE reads back through the same pruned scan as the
    // classic-checkpoint lanes (checkpoint form invisible to the
    // plan); dv_colmap_delete shows the DV anti-filter INSIDE a
    // physical-namespace scan with logical aliases above it;
    // iceberg_partitioned/mixed_deletes show partition-scoped scan
    // branches with bounds pruning; groupby_dict_str is the codegen'd
    // Utf8 dictionary probe feeding the fused dense kernel (no
    // Exchange before the partials); zarr_shard is the same
    // chunk-range scan (shard form invisible); dv_checkpoint/
    // dv_compact/colmap_maint/rename read back through plain pruned
    // scans after their maintenance ops
    "q_delta_v2cp_write", "q_delta_dv_colmap_delete",
    "q_delta_dv_checkpoint", "q_delta_dv_compact", "q_delta_colmap_maint",
    "q_delta_rename", "q_iceberg_partitioned", "q_iceberg_mixed_deletes",
    "q_groupby_dict_str", "q_zarr_shard",
    // r18: bucket/day transform lanes read back through bounds-pruned
    // scans on the SOURCE columns (transform form invisible to the
    // read plan); evolve unions narrow-file scans (new column null-
    // filled) with wide-file scans; colmap_id scans under field-id
    // resolution with logical aliases; widen promotes narrow files
    // inside the scan (no cast operator above it for matching types)
    "q_iceberg_bucket", "q_iceberg_day", "q_iceberg_evolve",
    "q_delta_colmap_id", "q_delta_widen",
    // r18 session 2: cdf reads its cdc change-file branches (insert/
    // delete/update images unioned, no join); the iceberg changelog
    // shows the (fid, pos) semi-join resolving MoR deletes to rows
    "q_delta_cdf", "q_iceberg_changelog")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "PLANS.md"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# Physical plans of headline queries\n\n")
    sb.append(s"Generated by `graft.PlanDump` on `$sfDir`. Things to check per plan:\n")
    sb.append("`PushedFilters` non-empty where a filter exists, `ReadSchema` pruned to\n")
    sb.append("used columns, `BroadcastHashJoin` for small sides, `partial_*` aggregates\n")
    sb.append("before the exchange, and wide `WholeStageCodegen` spans.\n")
    sb.append("A terminal `Exchange SinglePartition` directly under a keyless\n")
    sb.append("final HashAggregate (one-row global result) is the correct shape:\n")
    sb.append("it moves only per-partition partials, O(partitions) rows. The\n")
    sb.append("scale hazard is SinglePartition under a Sort/Window/row-producing\n")
    sb.append("operator — OrderedOpsSpec asserts none exist.\n")
    HEADLINE.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        val df = fn(spark, sfDir)
        val plan0 = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        // iterative lanes (bpe) stringify each InMemoryRelation WITH
        // its full cached child plan — one lane would otherwise be a
        // quarter of the file; the operator list at the top is the
        // reviewable part
        val cap = 16000
        val plan = if (plan0.length <= cap) plan0
          else plan0.take(cap) +
            s"\n... [truncated: ${plan0.length - cap} more chars of nested cached-plan repetition]\n"
        sb.append(s"\n## $name\n\n```\n$plan```\n")
      }
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
