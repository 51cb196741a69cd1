package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Registry invariants for the r10 per-domain split of ExtQueries:
  * the refactor's contract is that the public surface is IDENTICAL —
  * same query names, every query oracle-checked. The pinned list is
  * the full registry at the time of the split (177 entries); additions
  * belong HERE as well as in the maps, so an accidental drop during a
  * future refactor fails this suite by name.
  */
class RegistrySpec extends AnyFunSuite {

  private val Pinned = Seq(
    "a10_incremental", "a11_outliers", "a12_winsorize", "a1_max",
    "a2_groupby_agg", "a3_rollup", "a4_percentile", "a5_stats",
    "a6_approx_percentile", "a7_cube", "a8_grouping_sets", "a9_histogram",
    "d1_distinct_map", "f1_pivot_filter", "f2_date_split", "j1_dim_join",
    "j2_multi_left_join", "j3_semi_anti", "j5_catalog_star",
    "m1_update_merge", "m2_full_upsert", "m3_lww_upsert", "m4_flag_reset",
    "m5_scd2", "m6_cdc_diff", "m7_evolve_upsert", "p10_fillna",
    "p12_regexp_clean", "p13_profile", "p4_upper_cols", "p8_date_parts",
    "p9_cast_round", "q1_agg", "q_reconcile", "s11_schema_merge",
    "s12_compact", "s13_orc_roundtrip", "s14_csv_export",
    "s15_incr_manifest", "s16_dyn_overwrite", "s17_jsonl_export",
    "s18_snapshot_publish", "s19_snapshot_cdc", "s20_delta_scan",
    "s21_delta_time_travel", "s22_delta_append", "s23_delta_partitioned",
    "s24_delta_partitioned_append", "s25_delta_compact", "s26_delta_evolve",
    "s27_iceberg_scan", "s28_iceberg_time_travel", "s29_avro_roundtrip",
    "s29b_avro_logical", "s30_delta_merge", "s31_delta_delete",
    "s32_iceberg_partitioned", "s33_delta_dv", "s34_iceberg_v2_delete",
    "s35_delta_zorder", "s36_delta_restore", "s37_iceberg_eq_delete",
    "s38_delta_changes", "s39_delta_dv_merge", "s40_delta_v2_checkpoint",
    "s41_delta_column_mapping", "s42_delta_cm_id", "s43_delta_cdf",
    "s44_delta_replicate", "s45_iceberg_eq_scoped", "s46_iceberg_rewrite",
    "s47_delta_clone", "s48_delta_rename_drop", "s49_delta_type_widening",
    "s50_iceberg_rename_drop", "s51_iceberg_widening",
    "s52_iceberg_files_table", "s53_delta_row_tracking", "s54_iceberg_range",
    "s55_iceberg_tag", "s56_iceberg_incremental", "s57_iceberg_txn_sink",
    "s58_delta_row_tracking_write", "s59_delta_identity",
    "s60_iceberg_v3_dv", "s61_iceberg_replication",
    "s3_malformed_scan",
    "s3_scan_project", "s7_partitioned_write", "set1_except", "set2_union",
    "set3_union_by_name", "w1_surrogate_key", "w1_surrogate_key_scalable",
    "w2_running_sum", "w3_lag_delta", "w4_range_frame", "w5_date_spine",
    "w6_ntile", "w7_interpolate", "x_ann_compact", "x_ann_delete",
    "x_ann_delete_churn", "x_ann_ivf", "x_ann_ivf_probe2", "x_ann_lsh",
    "x_ann_novel_recall", "x_ann_query_novel", "x_ann_recall",
    "x_ann_recall_curve", "x_ann_sq8", "x_ann_sq8_recall",
    "x_approx_distinct", "x_asof_join", "x_bloom_filter", "x_bm25",
    "x_bpe_corpus_tokens", "x_bpe_drift", "x_bpe_encode",
    "x_bpe_fertility", "x_bpe_merges", "x_bpe_merges_local",
    "x_chunk_tokens", "x_cluster_labels", "x_collocations",
    "x_containment", "x_containment_quality", "x_contamination",
    "x_contamination_incr",
    "x_cosine_topk", "x_cosine_topk_agg", "x_countmin",
    "x_curation_funnel", "x_curriculum", "x_datacard", "x_datacard_diff",
    "x_dedup_canonical", "x_dedup_components", "x_dedup_edit",
    "x_dedup_exact", "x_dedup_incremental", "x_dedup_lsh_quality",
    "x_dedup_minhash", "x_dedup_minhash_pairs", "x_dedup_ngram_jaccard",
    "x_dedup_simhash", "x_dedup_substring", "x_dsir_select",
    "x_dup_source_matrix", "x_embed_neardup", "x_embed_quantize",
    "x_events_json", "x_events_session", "x_events_sliding",
    "x_events_window", "x_fingerprint", "x_frame_sample", "x_funnel",
    "x_hard_negatives", "x_heaps_law", "x_heavy_hitters", "x_hybrid_rrf",
    "x_inverted_index", "x_ivf_retrain_drift", "x_ivf_silhouette",
    "x_jpeg_roundtrip",
    "x_ivfpq_recall", "x_ivfpq_serve", "x_join_size_est", "x_knn_bulk",
    "x_knn_bulk_agreement", "x_knn_classify", "x_ks_drift", "x_lang_id",
    "x_lm_score", "x_media_decode", "x_mixture_sample", "x_mp3_scan", "x_mp3_decode",
    "x_mp4_demux", "x_mp4_frame_sample",
    "x_encoding_quality", "x_lr_eval", "x_lr_model", "x_lr_pr_curve",
    "x_lr_score",
    "x_mixture_temperature", "x_multimodal_meta", "x_nb_eval",
    "x_nb_model", "x_nb_score", "x_pack_sequences", "x_pack_stats",
    "x_pagerank", "x_pca_power", "x_pii_redact", "x_posting_skew",
    "x_pq_encode", "x_pq_quality", "x_pq_serve", "x_pq_serve_agreement",
    "x_psi_drift", "x_quality_filter", "x_range_join", "x_repetition",
    "x_release_pipeline",
    "x_reshard_rendezvous", "x_retained_by_source", "x_retention",
    "x_retrieval_eval", "x_semantic_dedup", "x_semantic_dedup_incr",
    "x_semantic_dedup_r2", "x_semdedup_coverage", "x_semdedup_coverage_r2",
    "x_shard_mixing", "x_shuffle_shard", "x_sketch_merge", "x_source_cap",
    "x_source_stats", "x_split_assign", "x_split_leakage",
    "x_split_sample", "x_text_stats", "x_tfidf_top_terms",
    "x_token_budget", "x_token_count", "x_triangles", "x_unigram_entropy",
    "x_whiten_top", "x_zipf_fit", "x_zorder_key")

  test("SparkEntry registry: every pinned query name is present") {
    val missing = Pinned.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"queries dropped from the registry: $missing")
    val unoracled = Pinned.filterNot(SparkEntry.oracleSql.contains)
    assert(unoracled.isEmpty, s"queries without an oracle: $unoracled")
  }

  test("registry is internally consistent: queries and oracleSql share a key set") {
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
    assert(ExtQueries.queries.keySet == ExtQueries.oracleSql.keySet)
    assert(SparkEntry.queries.size >= Pinned.size)
  }

  test("every registered query is pinned (additions must update Pinned)") {
    // the r10 verdict's one-line hardening: the pin list used to catch
    // only DELETIONS; a new query added to the maps but not to Pinned
    // sailed through on `size >= Pinned.size`. Both directions now
    // fail by name, so the sync is self-enforcing.
    val unpinned = SparkEntry.queries.keySet -- Pinned
    assert(unpinned.isEmpty,
      s"new queries not in RegistrySpec.Pinned — pin your new query: $unpinned")
  }
}
