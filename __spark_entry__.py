"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``mit_map_reduce_spark`` package; this
module only aggregates the per-module QUERIES / ORACLES registries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mit_map_reduce_spark import operators
from mit_map_reduce_spark.streaming import queries as streaming_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: word count over documents at sf0.001 — the
    DataFrame-native descendant of the reference's flagship wc app
    (reference src/mrapps/wc.go over pg-*.txt)."""
    from mit_map_reduce_spark.operators.mr_queries import mr_wordcount

    return mr_wordcount(spark, "/root/testdata/sf0.001")


#: Enumeration order for the differential harness. The driver verifies
#: a bounded prefix of this registry per round (50 entries in round 1),
#: so entries are ordered by how much a fresh correctness row is worth:
#: queries fixed/added/behavior-changed this round and those never yet
#: verified come first; long-stable queries whose round-1 rows stand
#: come last. Every entry is still verified by the full local gate
#: (tools/check_correctness.py) regardless of position.
_PRIORITY = [
    # ---- driver window (50 rows/round): red-latest-driver-row
    # queries first, then every entry ordered STALEST DRIVER ROW
    # FIRST so each round's window refreshes the oldest evidence.
    # Regenerated per round by tools/rotate_priority.py from the
    # CORRECTNESS_r*.json vintages; do not hand-sort.
    # -- pinned (touched this optimization round; last driver-verified round 10) --
    "stream_incremental_restart",
    "graph_label_propagation",
    "mm_audio_energy_windows",
    "stream_late_data_metrics",
    "sketch_cms_topk_by_source",
    "sim_ann_mmr_topk",
    "text_trigram_backoff_logprob",
    # -- pinned (touched this optimization round; last driver-verified round 11) --
    "text_vocab_growth",
    "graph_jaccard_link_prediction",
    "sim_hard_negative_mining",
    "graph_personalized_pagerank",
    "mm_shot_boundaries",
    "stream_dedup_within_watermark",
    "dedup_lsh_tuning_report",
    "mm_audio_vad_segments",
    "stream_outer_join_unattributed",
    "dedup_split_leakage_audit",
    "dedup_cluster_size_report",
    "graph_bfs_reach",
    "stream_topk_trending_users",
    "mm_keyframe_select",
    "sim_embedding_gram_matrix",
    # -- pinned (touched this optimization round; last driver-verified round 12) --
    "sim_ivf_cell_balance_report",
    "text_pmi_collocations",
    "stream_error_rate_alerts",
    "graph_hits_scores",
    "dedup_survivorship_report",
    "adv_sequence_pattern_support",
    "text_stopword_discovery",
    "adv_linear_touch_attribution",
    "dedup_bbit_minhash_report",
    "mr_udtf_wordcount",
    "stream_multi_grain_counts",
    # -- pinned (touched this optimization round; last driver-verified round 13) --
    "text_cooccurrence_pairs",
    "dedup_ngram_jaccard_pairs",
    "mm_decode_assets",
    "dedup_embedding_lsh_pairs",
    "graph_pagerank_trade",
    # -- pinned (touched this optimization round; last driver-verified round 14) --
    "sim_ann_ivf_topk",
    "dedup_simhash_band_pairs",
    "dedup_ngram_containment_pairs",
    "dedup_near_dup_keep_list",
    "stream_dedup_first_seen",
    "text_unigram_logprob",
    "sketch_cms_heavy_hitters",
    "stream_cms_user_sketch",
    # -- pinned (touched this optimization round; last driver-verified round 15) --
    "stream_stream_join_attribution",
    # -- last driver-verified round 10 --
    "dedup_incremental_ingest",
    "text_bpe_pair_counts",
    "text_chunk_overlap",
    "sketch_hll_union_merge",
    "sim_embedding_quantize_int8",
    "mr_reduce_side_join",
    "text_shuffle_order",
    "sim_embedding_random_projection",
    "adv_retention_cohorts",
    "adv_ab_experiment_readout",
    # -- last driver-verified round 11 --
    "graph_triangle_count",
    "adv_markov_event_transitions",
    "adv_rolling_active_users",
    "adv_association_rules_sessions",
    "text_zipf_slope",
    "text_term_burstiness",
    "sketch_hll_intersection",
    "src_schema_evolution_merge",
    "rel_table_profile_orders",
    "rel_monthly_revenue_mom",
    "rel_price_balance_correlation",
    "src_compact_small_files",
    "sim_ann_recall_report",
    "adv_activity_heatmap",
    "graph_degree_assortativity",
    "text_oov_rate",
    "adv_k_anonymity_audit",
    "rel_benford_price_audit",
    "text_distinctive_terms",
    "text_priority_sample",
    "graph_modularity_report",
    "sim_quantization_recall_report",
    "sketch_ams_second_moment",
    "text_quality_drift",
    "rel_revenue_trend_forecast",
    "rel_fk_integrity_audit",
    "rel_incremental_agg_merge",
    "adv_scd2_user_tier_history",
    "adv_cusum_changepoint_revenue",
    "adv_campaign_session_overlap",
    "text_langid_agreement",
    "text_char_entropy",
    "text_tokenizer_fertility",
    "sim_embedding_norm_audit",
    "src_gzip_jsonl_roundtrip_docs",
    # -- last driver-verified round 12 --
    "rel_seasonality_index_monthly",
    "rel_snapshot_diff_orders",
    "rel_table_checksums",
    "mr_positional_index",
    "text_perplexity_buckets",
    "src_dynamic_partition_overwrite",
    "adv_pit_join_purchase_tier",
    "rel_segment_priority_chi2",
    "text_js_divergence_sources",
    "adv_new_vs_returning_users",
    "adv_rolling_zscore_anomalies",
    "rel_calendar_gap_audit",
    "adv_kaplan_meier_retention",
    "text_pipeline_funnel_report",
    "rel_pk_uniqueness_audit",
    "text_vocab_coverage_curve",
    "adv_cohort_ltv_curve",
    "sim_embedding_drift_report",
    "adv_smoothed_conversion_ranking",
    "graph_clustering_coefficient",
    "rel_revenue_autocorrelation",
    "sketch_bloom_union_merge",
    "rel_equidepth_histogram",
    "rel_constraint_expectations",
    "rel_cdc_apply_changelog",
    "rel_zorder_clustering_receipt",
    "adv_logistic_regression_gd",
    "adv_l_diversity_audit",
    "adv_dp_noisy_counts",
    "adv_mad_outlier_orders",
    "dedup_exact_substring_spans",
    "sketch_quantile_merge_report",
    "text_mojibake_detect",
    "text_doc_novelty",
    "src_fixed_width_roundtrip",
    "adv_ks_test_segments",
    "adv_cumulative_distinct_users",
    "text_keyword_topic_classify",
    "rel_q2_min_cost_supplier",
    # -- last driver-verified round 13 --
    "rel_q4_late_orders",
    "rel_q16_supplier_variety",
    "adv_ntile_balance_quartiles",
    "rel_q21_waiting_suppliers",
    "adv_funnel_conversion",
    "rel_merge_upsert_customers",
    "mr_wordcount",
    "mr_inverted_index",
    "mr_distributed_grep",
    "text_stats",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh_pairs",
    "dedup_connected_components",
    "dedup_simhash_fingerprints",
    "dedup_embedding_cosine_pairs",
    "sim_ann_lsh_topk",
    "rel_q6_forecast_revenue",
    "rel_q19_disjunctive_revenue",
    "adv_window_range_frame_spend",
    "adv_time_resample_daily",
    "rel_array_funcs_embeddings",
    "mm_feature_extract",
    "mm_asset_stats",
    "mm_frame_sample",
    "mm_resize_images",
    "text_token_count",
    "text_tfidf_top_terms",
    "text_rolling_hash",
    "text_deterministic_sample",
    "text_corpus_pipeline",
    "text_token_stats_by_lang",
    "sketch_approx_distinct_buyers",
    "sketch_approx_percentile_order_value",
    "rel_q1_pricing_summary",
    "rel_q3_shipping_priority",
    "rel_q5_local_supplier_volume",
    "rel_window_running_spend",
    "rel_scalar_json_events",
    "rel_unpivot_nation_metrics",
    "rel_rollup_acctbal",
    "rel_distinct_aggs_per_segment",
    "rel_q22_idle_rich_customers",
    "rel_q7_nation_trade",
    "rel_cube_orders",
    "rel_salted_agg_events_per_type",
    # -- last driver-verified round 14 --
    "adv_range_join_price_bands",
    "adv_correlated_subquery_small_qty",
    "adv_grouping_sets_revenue",
    "text_langid",
    "text_quality",
    "text_fingerprint",
    "text_repetition",
    "text_contamination",
    "text_stratified_sample",
    "text_training_mix",
    "adv_time_resample_interp",
    "dedup_exact",
    "sim_ann_bruteforce_topk",
    "src_csv_malformed_quarantine",
    "adv_asof_join_last_click",
    "adv_grouped_map_median_gap",
    "adv_percentiles_order_value",
    "adv_lag_lead_event_deltas",
    "adv_fuzzy_blocked_match",
    "adv_pivot_segment_priority",
    "rel_topk_parts_per_brand",
    "rel_setops_summary",
    "rel_setops_all_summary",
    "rel_scalar_string_funcs",
    "rel_scalar_date_math_funcs",
    "rel_map_funcs_priority_profile",
    "rel_anti_join_customers_without_orders",
    "rel_semi_join_urgent_buyers_per_nation",
    "rel_q13_order_histogram",
    "rel_full_outer_nation_presence",
    "rel_q18_large_orders",
    "stream_stateful_user_profile",
    "rel_q9_product_profit",
    "adv_sessionize_events",
    "text_langid_ngram",
    "rel_bucketed_join_revenue",
    "mr_secondary_sort",
    "graph_degree_distribution",
    "graph_kcore_prune",
    "src_csv_roundtrip_orders",
    "src_orc_roundtrip_lineitem",
    "src_json_roundtrip_events",
    # -- last driver-verified round 15 --
    "src_partitioned_pruning_events",
    "adv_window_rank_functions",
    "adv_asof_join_next_purchase",
    "adv_gaps_and_islands",
    "dedup_span_clean",
    "text_weighted_sample",
    "mm_pipeline",
    "sim_ann_bruteforce_topk_np",
    "sim_knn_label_vote",
    "text_hash_features",
    "rel_q10_returned_items",
    "rel_q11_important_parts",
    "rel_q12_late_shipment_priority",
    "rel_q15_top_supplier",
    "rel_q17_small_quantity_revenue",
    "rel_q20_excess_stock_suppliers",
    "dedup_embedding_cosine_pairs_np",
    "stream_session_windows",
    "stream_tumbling_counts",
    "stream_sliding_counts",
    "stream_static_enrich_by_segment",
    "stream_windowed_distinct_users",
    "stream_append_tumbling_file_sink",
    "text_bigram_logprob",
    "text_pii_scrub",
    "text_pack_sequences",
    "graph_supplier_projection",
    "sketch_bloom_prefilter",
    "rel_decimal_sum_by_segment",
    "rel_window_cumulative_share",
    "adv_salted_skew_join_events",
    "adv_latest_event_per_user",
    "src_text_kv_roundtrip_wc",
    "mm_phash_dedup",
    "rel_q8_market_share",
    "rel_q14_promo_share",
    "text_weighted_median_quality",
    "adv_decile_lift_table",
    "adv_auc_purchase_score",
    "adv_rfm_segmentation",
    "rel_join_key_skew_report",
    "mr_terasort_manifest",
    "adv_iqr_outlier_orders",
    "rel_trimmed_mean_acctbal",
    "text_bpe_train_merges",
    "text_bpe_apply_encode",
    "sim_pq_encode_report",
    "sim_pq_adc_topk",
    "dedup_semantic_ivf",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    all_q = dict(operators.all_queries())
    all_q.update(streaming_queries.QUERIES)
    missing = [n for n in _PRIORITY if n not in all_q]
    assert not missing, f"_PRIORITY names not registered: {missing}"
    out = {n: all_q[n] for n in _PRIORITY}
    out.update({n: f for n, f in all_q.items() if n not in out})
    return out


def oracle_sql() -> dict[str, str]:
    out = dict(operators.all_oracles())
    out.update(streaming_queries.ORACLES)
    return out
