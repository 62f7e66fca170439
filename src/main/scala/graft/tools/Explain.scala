package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan for the named
  * queries (or a default audit set) so pushdown / broadcast / codegen
  * can be reviewed. Usage:
  *   runMain graft.tools.Explain [sfDir] [query ...]
  */
object Explain {
  val AuditSet = Seq(
    "lake_scan", "q1_pricing_summary", "q5_local_supplier",
    "q_heavy_hitters", "d_minhash_lsh", "s_ann_bruteforce",
    "lake_partitioned_write",
    // round-2 flagships
    "q2_min_cost_supp", "q17_small_qty_rev", "q21_waiting_supplier",
    "q_skew_join_salted", "s_ann_pq", "s_hybrid_rrf",
    "t_fluency_score", "st_hopping_window", "lake_schema_evolution",
    // round-3 flagships: ex-all-pairs LSH blocking, broadcast scalar
    // subquery, commit-log time travel, health/mirror lake ops
    "d_embed_neardup", "m_feature_pairs", "q_scalar_subquery",
    "lake_time_travel", "lake_health", "lake_mirror", "lake_acl_audit",
    "d_corpus_curate", "s_ann_ivf_partitioned", "st_stream_neardup",
    "d_decontaminate", "t_pii_scrub",
    // round-5 flagships: index-backed RRF arms, the stored-band-index
    // arrival path, and the namespace layer's read-enforcement join
    "d_incremental_dedup", "lake_links", "lake_upgrade",
    "lake_acl_enforce", "lake_set_times", "lake_delegation",
    "lake_vacuum", "s_ann_recall", "lake_analyze", "t_lang_rebalance",
    // round-5 continued: layout/analytics/insights families
    "lake_zorder", "lake_compact_incremental", "q_bloom_join",
    "q_mv_incremental", "ts_resample", "d_edit_distance",
    "q_pareto_frontier", "st_lateness_audit", "g_pagerank",
    "lake_snapshot_diff", "q_funnel", "q_retention_cohorts",
    "q_event_transitions", "t_vocab_coverage",
    "lake_delete_cow", "lake_clone", "q_window_percentile",
    "lake_point_lookup", "q_scd2", "q_gaps_islands", "s_ann_rerank",
    // round-6: decommission/restore/cadence ceremonies, the re-shaped
    // two-phase lateness scan, and the repetition quality signal
    "lake_drain", "lake_restore", "lake_checkpoint_cadence",
    "t_repetition_filter", "s_ann_filtered",
    // round-6 continued: the trained-centroid/cluster-prune pair,
    // the rule-based quality gate, mixture sampling, and anomaly scan
    "s_kmeans", "d_semdedup", "t_c4_filter", "t_stratified_sample",
    "ts_anomaly", "ts_baseline_anomaly", "s_index_scoreboard",
    "lake_journal_audit",
    // round-7: the convergence loop over the trained centroids, the
    // two scale-step rewrites (DF-ordered prefix filtering,
    // bucket-local sorted neighborhood), and sequence packing
    "s_kmeans_loop", "d_ngram_jaccard", "t_seq_pack",
    // round-7 continued: BPE merge counting over the vocab table,
    // the deterministic training shuffle, and the cell-blocked
    // symmetric k-NN graph
    "t_bpe_pairs", "t_shuffle_shard", "s_knn_graph", "d_substring_dup",
    "g_knn_triangles", "ts_seasonality", "m_scene_cuts",
    // round-8: durability ceremonies, the sketch-evaluation pair, and
    // the oracle-gated listing
    "lake_quarantine", "lake_standby", "q_approx_percentile",
    "q_approx_distinct", "lake_ls", "lake_scrub_cadence",
    "m_binary_ingest",
    // round-8 continued: the lease-recovery ceremony, the tokenizer
    // encode pass, mixture materialization, melt, and frame sampling
    "lake_lease_recover", "t_bpe_encode", "t_dataset_mix", "q_unpivot",
    "m_frame_sample",
    // round-8 final batch: chunk manifest, leak-audited split, the
    // knn-graph component/BFS pair, and the CUSUM drift audit
    "t_doc_chunk", "t_train_split", "g_knn_components", "g_knn_hops",
    "ts_changepoint", "s_ann_ivf_sq8",
    // round-9/10: safe mode + export manifest, the block-token gate,
    // the topology report, and the reworked mirror/pagerank
    "lake_safemode", "lake_export_manifest", "lake_block_tokens",
    "lake_topology",
    // round-10 additions: the balancer contract, the trash lifecycle,
    // batch sessionization, and the LSH band-config scoreboard
    "lake_balancer", "lake_trash", "q_sessionize", "d_lsh_recall",
    "lake_image_report", "t_dataset_card",
    // round-10 continued: basket pairs, audience growth, the Gopher
    // rule gate, the clustering-coefficient graph signal, and the
    // admission-control batch truth
    "q_itemset_pairs", "q_cumulative_distinct", "t_gopher_filter",
    "g_knn_clustering_coeff", "st_rate_limit", "q_rfm_segmentation",
    "q_top_paths", "t_zipf_report", "st_windowed_topk", "m_caption_pairs",
    // round-10 continued: cohort revenue, the engagement board, the
    // source-composition board, dead-air detection, and the VAD gate
    "q_cohort_ltv", "q_rolling_active_users", "t_keyword_lift",
    "ts_outage_gaps", "m_audio_vad",
    // round-10 continued: the contamination-by-source-pair board, the
    // Benford screen, row-local diversity, and the heartbeat monitor
    "d_cross_source_dup", "q_benford_audit", "t_lexical_diversity",
    "st_feed_silence", "s_mmr_rerank",
    // round-10 continued: the association-lift layer, the boilerplate
    // content report, and the decile transition matrix
    "q_itemset_lift", "t_boilerplate_ngrams", "q_decile_migration",
    // round-10 continued: the online anomaly gate and the
    // weak-supervision label amplifier
    "st_stream_anomaly", "g_knn_label_prop",
    // round-10 continued: the privacy screen and the order-discovery
    // census
    "q_k_anonymity", "q_seq_patterns",
    // round-10 final: the vocab-fairness metric and the funnel-latency
    // distribution
    "t_tokenizer_fertility", "q_time_to_convert",
    // round-10 final: the forecast baseline scoreboard and the
    // curation-ROI statement
    "ts_forecast_naive", "d_dedup_impact",
    // round-10 final: the graph-navigation index arm, chunk-store
    // dedup, and the Lorenz table
    "s_ann_graph", "d_chunk_dedup", "q_revenue_concentration",
    "g_knn_modularity", "t_effective_mix",
    // round-10 final: the SNN edge-weight layer and the bounded
    // 2-core peel
    "g_knn_jaccard_edges", "g_knn_kcore",
    // round-10 final: the NN-descent refinement round and the
    // per-doc bigram novelty screen
    "s_ann_nn_descent", "t_bigram_novelty",
    // round-10 final: the bounded-Boruvka spanning forest, the
    // single-linkage cut ladder, and the streaming quota gate's
    // batch truth
    "g_knn_mst", "g_knn_cluster_cut", "st_quota_gate",
    "g_knn_assortativity", "m_phash_dedup",
    // round-11: the image-now verb, failed-storage re-admission,
    // config introspection, and the distributed exact-NTILE rework
    "lake_save_namespace", "lake_restore_storage", "lake_server_defaults",
    "st_cusum_drift",
    // round-11: the experiment readout, the boundary-leak score, the
    // class-separability audit, and the funnel twin's batch truth
    "q_ab_test", "g_knn_conductance", "s_centroid_separation",
    "st_funnel_steps",
    // round-11: the lag-structure diagnostic, the rank-correlation
    // screen, the per-slice length audit, and the reciprocity census
    "ts_autocorr", "q_rank_corr", "t_length_outlier",
    "g_knn_reciprocity",
    // round-11: the FK orphan board, the cross-series timing
    // diagnostic, and the sessionizer twin's batch truth
    "q_fk_integrity", "ts_lead_lag", "st_sessionize",
    // round-11: the reorder-cadence board, the YoY trend table, and
    // the acquisition revenue split
    "q_interpurchase", "q_yoy_growth", "q_acquisition_revenue",
    "q_hhi", "m_cross_modal_dedup",
    // round-12: the flush-visibility and lease-renewal ceremonies,
    // the percentileExact rework's second consumer, and the LSH
    // band auto-tuner
    "lake_flush_visibility", "lake_renew_lease", "q_time_to_convert",
    "d_lsh_autotune",
    // round-13: the paged corrupt-entry board
    "lake_corrupt_board")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    // "ALL" = full-registry census (CartesianProduct / BNLJ counting)
    val names =
      if (args.length > 1 && args(1) == "ALL") SparkEntry.queries.keys.toSeq.sorted
      else if (args.length > 1) args.drop(1).toSeq
      else AuditSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
