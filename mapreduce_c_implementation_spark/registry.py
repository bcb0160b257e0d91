"""Operator registry: the driver-facing catalog of everything we implement.

The reference's "query surface" is a compiled-in triple of C callbacks
(Map/Combine/Reduce — /root/reference/src/job.h:36-127).  Our analog is a
declarative registry: each operator is a named pair of

    query_fn(spark, sf_dir) -> DataFrame      (the PySpark implementation)
    oracle_sql: str | None                    (DuckDB-equivalent ANSI SQL)

wired verbatim into ``__spark_entry__.py``'s ``queries()`` /
``oracle_sql()`` driver contract.  Operators whose semantics SQL cannot
express (streaming state, iterative algos) register oracle_sql=None and
get the driver's rows-only check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "Operator"] = {}

# Modules whose import registers operators.  Extended as phases land.
_OPERATOR_MODULES = [
    "mapreduce_c_implementation_spark.operators.mapreduce_core",
    "mapreduce_c_implementation_spark.operators.aggregates",
    "mapreduce_c_implementation_spark.operators.joins",
    "mapreduce_c_implementation_spark.operators.windows",
    "mapreduce_c_implementation_spark.operators.setops",
    "mapreduce_c_implementation_spark.operators.scalars",
    "mapreduce_c_implementation_spark.operators.udfs",
    "mapreduce_c_implementation_spark.operators.analytics",
    "mapreduce_c_implementation_spark.operators.tpch_extra",
    "mapreduce_c_implementation_spark.operators.features",
    "mapreduce_c_implementation_spark.operators.modern_sql",
    "mapreduce_c_implementation_spark.operators.dedup",
    "mapreduce_c_implementation_spark.operators.similarity",
    "mapreduce_c_implementation_spark.operators.textanalysis",
    "mapreduce_c_implementation_spark.operators.corpus_filters",
    "mapreduce_c_implementation_spark.operators.sampling",
    "mapreduce_c_implementation_spark.operators.graph",
    "mapreduce_c_implementation_spark.operators.timeseries",
    "mapreduce_c_implementation_spark.operators.robust_stats",
    "mapreduce_c_implementation_spark.operators.multimodal",
    "mapreduce_c_implementation_spark.streaming.queries",
    "mapreduce_c_implementation_spark.sources.io_ops",
]


@dataclass(frozen=True)
class Operator:
    name: str
    query_fn: QueryFn
    oracle_sql: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def register(
    name: str, oracle_sql: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as operator ``name``.

    ``oracle_sql`` must alias every computed column to the SAME name the
    DataFrame uses — the driver's compare sorts columns by name before
    hashing values.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate operator name: {name}")
        _REGISTRY[name] = Operator(
            name=name, query_fn=fn, oracle_sql=oracle_sql, doc=fn.__doc__ or "", tags=tags
        )
        return fn

    return deco


# The driver's CORRECTNESS gate verifies a bounded prefix of ``queries()``
# (50 names per round).  Names listed here are emitted FIRST, in this
# order; everything else follows in registration order.  Rounds 1-10
# together hard-verified ALL 387 operators registered through round 10
# (CORRECTNESS_r01-r10; round 5's window duplicated round 4's — their
# union is frozen in ``_DRIVER_VERIFIED_PRIOR``).  With first-time
# verification complete, the window is a REGRESSION ROTATION: new
# round-N additions go in ``_DRIVER_NEW_THIS_ROUND`` (verified first),
# and the remaining slots re-verify previously-green operators
# oldest-first in registration order (``_DRIVER_REGRESSION``).  After
# each round's artifact lands, fold the first-time keys into
# ``_DRIVER_VERIFIED_PRIOR`` and advance the regression cursor past the
# names the artifact actually re-checked.  The rotated-out ops keep
# their in-repo oracle coverage (tests/test_operators_vs_oracle.py runs
# every registered operator), and tests/test_extensions.py's
# coverage-ledger test asserts prior + new covers the full registry.

# Round-13 additions, in priority order (appended as they land).  The
# 50-slot window = these new names first, then the regression cursor.
# CORRECTNESS_r12 re-checked the first 45 names of round 12's queue
# (``cogroup_reconcile`` .. ``tpch_q22_sales_opportunity``); the five
# TPC-H names it left queued resume first below.
_DRIVER_NEW_THIS_ROUND: list[str] = [
    "stream_substring_screen_resumable",
    "index_snapshot_vacuum",
    "stream_substring_screen_rtbf",
]

# Regression re-verification queue: the 5 names round 12's window left
# queued, then the STALEST greens — ops whose most recent driver row is
# oldest, by the CORRECTNESS_r* artifacts themselves (the r02 cohort:
# the dedup/ANN/text/multimodal/streaming/source families first driver-
# verified in round 2 and not re-surfaced since), in last-green-round
# then registration order.  Names past the 50-slot window roll to the
# next round's cursor.
_DRIVER_REGRESSION = [
    "tpch_q2_min_cost_supplier", "tpch_q9_product_profit",
    "tpch_q11_important_stock", "tpch_q16_supplier_counts",
    "tpch_q20_potential_promotion",
    # r02 cohort (stalest greens), registration order
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_simhash_pairs", "ann_bruteforce_topk", "ann_lsh_bucketed",
    "embedding_centroids", "dedup_embedding_cosine", "text_lang_id",
    "text_quality_score", "token_count", "doc_fingerprint", "ngram_frequencies",
    "corpus_quality_filter", "deterministic_split", "multimodal_ingest",
    "multimodal_decode_features", "multimodal_frame_sample",
    "multimodal_metadata_stats", "stream_tumbling_window", "stream_sliding_window",
    "stream_session_window", "stream_dedup", "stream_stateful_totals",
    "stream_static_join", "stream_foreach_batch_sink", "stream_update_mode_counts",
    "stream_stream_join", "text_source_inverted_index", "csv_source_roundtrip",
    "json_source_roundtrip", "text_sink_roundtrip", "partitioned_parquet_sink",
    # r03 cohort begins (next-stalest), registration order
    "feature_quantile_bins", "feature_label_encode", "recursive_cte_month_spine",
    "lateral_topk_per_customer", "sql_params_group_by_all",
    "collation_insensitive_grouping", "filtered_aggregates",
    "width_bucket_histogram",
]

_DRIVER_PRIORITY = _DRIVER_NEW_THIS_ROUND + _DRIVER_REGRESSION

# Operators hard-verified by the driver in prior rounds (the union of
# CORRECTNESS_r01..r07 key sets; CORRECTNESS_r05 duplicated r04's window,
# all green at their latest check).  Used by the coverage-ledger
# test to prove the rotation schedule reaches every registered operator.
_DRIVER_VERIFIED_PRIOR = frozenset({
    # round 1 (CORRECTNESS_r01.json)
    "agg_minmax_orders", "approx_count_distinct_check", "approx_quantile_check",
    "argmax_minmax_by", "array_functions", "conditional_functions", "count_distinct_parts",
    "cube_sales", "date_functions", "distinct_pairs", "except_lapsed_customers",
    "filter_project_pushdown", "grouping_sets_sales", "histogram_events", "input_lineage",
    "intersect_active_customers", "inverted_index", "inverted_index_formatted", "join_anti",
    "join_asof_nearest", "join_cross", "join_full_outer", "join_left_outer",
    "join_orders_lineitem", "join_range_bucketed", "join_semi", "join_star_broadcast",
    "json_functions", "map_functions", "math_functions", "regex_functions", "rollup_sales",
    "sessionize_batch", "sorted_word_count", "string_functions", "tokenize_flatmap", "tpch_q1",
    "tpch_q6", "union_all_slices", "union_distinct_customers", "variance_stats",
    "window_lag_lead", "window_moving_avg", "window_ntile_cume", "window_rank_percent",
    "window_running_sum", "window_topk_per_group", "window_value_functions", "word_count",
    "word_count_topk",
    # round 2 (CORRECTNESS_r02.json)
    "ann_bruteforce_topk", "ann_lsh_bucketed", "apply_in_pandas_zscore", "corpus_quality_filter",
    "csv_source_roundtrip", "dedup_embedding_cosine", "dedup_exact", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_simhash", "dedup_simhash_pairs", "deterministic_split",
    "doc_fingerprint", "embedding_centroids", "explode_outer_tokens", "grouped_agg_pandas_udf",
    "json_source_roundtrip", "multimodal_decode_features", "multimodal_frame_sample",
    "multimodal_ingest", "multimodal_metadata_stats", "ngram_frequencies", "null_semantics",
    "pandas_udf_scalar_score", "partitioned_parquet_sink", "pivot_status_by_flag",
    "row_python_udf_format", "salted_aggregation", "sql_subquery_surface", "stream_dedup",
    "stream_foreach_batch_sink", "stream_session_window", "stream_sliding_window",
    "stream_stateful_totals", "stream_static_join", "stream_stream_join",
    "stream_tumbling_window", "stream_update_mode_counts", "text_lang_id", "text_quality_score",
    "text_sink_roundtrip", "text_source_inverted_index", "tfidf_top_terms", "token_count",
    "tpch_q3_shipping_priority", "tpch_q4_order_priority", "tpch_q5_local_supplier",
    "udtf_tokenize", "unpivot_measures",
    # round 3 (CORRECTNESS_r03.json)
    "ann_ivf_coarse", "collation_insensitive_grouping", "contamination_ngram_overlap",
    "corpus_pipeline_end2end", "cross_split_leakage_audit", "dedup_connected_components",
    "dedup_keep_representatives", "embedding_gram_matrix", "exact_substring_duplicates",
    "feature_label_encode", "feature_quantile_bins", "filtered_aggregates",
    "graph_degree_stats", "graph_pagerank_nations", "json_corrupt_records", "kmeans_lloyd",
    "lateral_topk_per_customer", "multimodal_cas_index", "orc_source_roundtrip",
    "pii_redaction", "python_datasource_scan", "recursive_cte_month_spine",
    "repetition_ngram_stats", "schema_evolution_merge", "semdedup_cells",
    "small_file_compaction", "sql_params_group_by_all", "stream_chained_aggregation",
    "stream_dedup_within_watermark", "stream_stream_left_join", "stream_upsert_latest",
    "tpch_q10_returned_items", "tpch_q11_important_stock", "tpch_q12_late_lines",
    "tpch_q13_customer_distribution", "tpch_q14_promo_effect", "tpch_q15_top_supplier",
    "tpch_q16_supplier_counts", "tpch_q17_small_qty_revenue", "tpch_q18_large_orders",
    "tpch_q19_discounted_revenue", "tpch_q20_potential_promotion", "tpch_q21_waiting_supplier",
    "tpch_q22_sales_opportunity", "tpch_q2_min_cost_supplier", "tpch_q7_nation_volume",
    "tpch_q8_market_share", "tpch_q9_product_profit", "width_bucket_histogram",
    "xml_source_roundtrip",
    # round 4 (CORRECTNESS_r04.json; re-confirmed by r05)
    "ann_ivf_pq", "ann_pq_adc", "approx_heavy_hitters", "bitmap_exact_distinct",
    "bm25_topk_docs", "bucketed_join_colocated", "cogroup_reconcile", "correlation_matrix",
    "cube_grouping_id", "dedup_cc_stars", "dedup_minhash_incremental", "document_chunking",
    "dynamic_partition_pruning_join", "embedding_quantize_int8", "event_funnel",
    "event_transition_matrix", "expectation_checks", "fk_integrity_check",
    "group_mad_outliers", "group_median_disc", "hashing_trick_features",
    "higher_order_functions", "hll_sketch_mergeable", "join_asof_keyed", "key_skew_profile",
    "listagg_ordered", "map_higher_order_functions", "map_in_arrow_doc_stats",
    "merge_upsert_scd1", "percentile_cont_groups", "pmi_term_cooccurrence",
    "quality_bucket_sample", "record_linkage_blocked", "scd2_history", "sequence_packing",
    "skew_join_salted", "source_token_budget_mix", "stratified_sample",
    "stratified_sample_balanced", "table_profile", "time_gap_fill_ffill",
    "time_rollup_multigrain", "token_pmi_pairs", "tpch_rf1_rf2_refresh",
    "try_arithmetic_safety", "unigram_logprob_score", "variant_json_shred",
    "window_range_frame", "window_time_range", "zorder_layout",
    # round 6 (CORRECTNESS_r06.json — the 49 final pre-r6 names + ks_two_sample)
    "ann_recall_eval", "benford_first_digit", "bottomk_sample_per_group",
    "char_entropy_quality", "concurrency_sweep", "customer_rfm_segmentation",
    "dataset_card_stats", "decayed_event_counts", "dedup_minhash_bucketed_probe",
    "dedup_recall_eval", "embedding_random_projection", "event_attribution_last_touch",
    "event_daily_anomaly", "event_retention_cohorts", "feature_minmax_scale",
    "feature_target_encode", "gopher_quality_rules", "gram_power_iteration",
    "graph_bfs_distances", "graph_common_neighbors", "graph_label_propagation",
    "graph_triangle_count", "group_linear_regression", "group_mode_frequent",
    "heaps_vocab_growth", "hybrid_search_rrf", "join_null_safe", "k_anonymity_check",
    "ks_two_sample", "lexical_diversity_ttr", "multimodal_simhash_neardup",
    "parquet_agg_pushdown_stats", "part_abc_classification", "poisson_bootstrap_mean",
    "running_distinct_users", "runtime_bloom_filter_join", "seasonality_month_index",
    "set_similarity_prefix_join", "shingle_containment_pairs", "shingle_novelty_curve",
    "size_balanced_shards", "skipgram_cooccurrence", "sliding_distinct_users",
    "stream_corpus_ingest", "stream_windowed_topk", "text_canonicalize_dedup",
    "time_weighted_avg", "vocab_coverage_topk", "winsorized_group_stats",
    "zipf_rank_frequency",
    # round 7 (CORRECTNESS_r07.json — all 50 green, rows+schema+hash)
    "bloom_contamination_screen", "boilerplate_ngram_removal", "bpe_merge_steps",
    "chi_square_contingency", "cohen_kappa_agreement", "contamination_filter_rewrite",
    "corpus_entropy_rate", "corpus_js_divergence", "corpus_version_diff",
    "cosine_similarity_histogram", "cvm_two_sample_binned", "dedup_cluster_size_histogram",
    "dedup_paragraph_rewrite", "domain_cap_rewrite", "embedding_centroid_outliers",
    "feature_rank_normalize", "fim_transformation", "graph_adamic_adar",
    "graph_random_walk_pairs", "hard_negative_mining", "intersect_except_all_bags",
    "interval_overlap_join", "join_cardinality_estimate", "join_fuzzy_levenshtein",
    "kaplan_meier_retention", "ks_two_sample_binned", "langid_confusion_matrix",
    "length_bucket_batching", "lsh_parameter_sweep", "mann_whitney_u_binned",
    "mlm_token_masking", "nb_quality_classifier_train_apply", "ngram_lm_perplexity",
    "perplexity_filter_rewrite", "preference_pair_construction", "psi_population_stability",
    "quality_classifier_inference", "rag_chunk_index_build", "score_calibration_reliability",
    "source_concentration_metrics", "source_temperature_mixing", "span_corruption_masking",
    "stream_psi_drift_monitor", "token_drift_topk", "token_label_mutual_information",
    "tokenizer_apply_bpe", "url_blocklist_filter", "url_canonicalize_dedup",
    "welch_t_test_pairs", "window_funnel_timeout",
    # round 8 (CORRECTNESS_r08.json — 36 first-time keys; the window's other
    # 14 rows were regression re-checks of round-1 names already listed above)
    "tokenizer_fertility_stats", "duplicate_token_run_collapse",
    "cross_source_contamination_matrix", "curriculum_data_ordering",
    "embedding_dimension_whitening", "dsir_importance_resampling",
    "ngram_novelty_score", "dedup_soft_weighting", "cusum_changepoint_scan",
    "dp_laplace_source_histogram", "pass_at_k_eval", "spearman_rank_correlation",
    "group_holdout_split", "stratified_kfold_assign", "feature_hash_collision_stats",
    "dedup_quality_representatives", "isotonic_calibration_rewrite",
    "leakage_split_repair", "substring_overlap_spans", "toxicity_wordlist_filter",
    "winnowing_fingerprint_dedup", "generation_eval_overlap",
    "doremi_domain_reweighting", "best_of_n_rejection_sampling",
    "lm_holdout_perplexity", "elo_pairwise_ratings", "cluster_capped_diversity_sample",
    "kneser_ney_bigram_lm", "quality_signal_ensemble_rank", "substring_trim_rewrite",
    "count_min_sketch_tokens", "matryoshka_truncation_recall",
    "stream_rate_anomaly_monitor", "entity_resolution_clusters",
    "conformal_prediction_threshold", "woe_information_value",
    # round 9 (CORRECTNESS_r09.json — 17 first-time keys; the window's
    # other 33 rows were the 2 linkage rewrites + regression re-checks
    # of names already listed above)
    "suffix_array_ranked_lcp", "substring_exact_spans",
    "quantile_sketch_mergeable", "stream_quantile_sketch_windows",
    "stream_asof_join", "association_rules_parts", "ndcg_ranking_eval",
    "generation_cer_eval", "brier_score_decomposition",
    "paired_bootstrap_significance", "autocorrelation_daily_values",
    "theil_sen_daily_trend", "substring_exact_trim_rewrite",
    "knn_classification_eval", "kcenter_greedy_coreset",
    "multimodal_cdc_chunk_dedup", "negative_sampling_table",
    # round 10 (CORRECTNESS_r10.json — 35 first-time keys; the window's
    # other 15 rows were the 3 rewrite re-checks + regression re-checks
    # of names already listed above)
    "substring_tiered_trim_rewrite", "priority_sample_weighted",
    "rouge_n_overlap_eval", "f1_threshold_sweep",
    "confident_learning_label_noise", "char_class_profile",
    "sequential_pattern_mining", "unimax_budget_allocation",
    "key_gini_concentration", "hilbert_curve_layout", "l_diversity_check",
    "tfidf_cosine_pairs", "event_burstiness_fano",
    "diff_in_differences_events", "kruskal_wallis_binned",
    "benjamini_hochberg_fdr", "median_of_means_value", "graph_hits_scores",
    "graph_kcore_peel_layers", "t_closeness_check", "rake_keyword_extraction",
    "ewma_daily_anomaly", "lsh_euclidean_e2lsh", "mmr_diverse_reranking",
    "dbscan_grid_clusters", "heaps_law_power_fit",
    "wilcoxon_signed_rank_daily", "knn_shapley_valuation",
    "stream_windowed_distinct_users", "anova_one_way_value",
    "brown_forsythe_levene", "gumbel_weighted_sample_per_group",
    "platt_scaling_calibration", "quantile_treatment_effects",
    "greedy_set_cover_docs",
    # round 11 (CORRECTNESS_r11.json — 25 first-time keys; the window's
    # other 25 rows were regression re-checks of names already listed
    # above, ``union_all_slices`` through ``row_python_udf_format``)
    "stream_substring_screen", "join_asof_binned", "roc_auc_rank_exact",
    "average_precision_eval", "mcnemar_paired_eval",
    "bleu_ngram_component_eval", "friedman_test_daily",
    "kendall_tau_topk_terms", "graph_clustering_coefficient",
    "luhn_checksum_pii_screen", "feature_target_encode_oof",
    "fk_candidate_discovery", "holt_linear_daily",
    "maxsim_late_interaction_topk", "graph_widest_path_bottleneck",
    "cohort_ltv_accumulation", "sql_scalar_udf_inline",
    "sql_pipe_syntax_revenue", "udtf_table_argument_partitioned",
    "label_shift_bbse_estimate", "phrase_query_positional_index",
    "unicode_nfc_canonicalize", "span_token_alignment",
    "observed_metrics_pipeline", "sql_identifier_dynamic_table",
    # round 12 (CORRECTNESS_r12.json — 5 first-time keys; the window's
    # other 45 rows were regression re-checks of names already listed
    # above, ``cogroup_reconcile`` through ``tpch_q22_sales_opportunity``)
    "stream_substring_screen_cumulative", "index_delete_propagation",
    "dedup_minhash_index_append", "index_bucket_compaction",
    "index_upsert_delete_lifecycle",
})


def _load_all() -> None:
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)


def _ordered(reg: dict[str, Operator]) -> dict[str, Operator]:
    head = [n for n in _DRIVER_PRIORITY if n in reg]
    tail = [n for n in reg if n not in set(_DRIVER_PRIORITY)]
    return {n: reg[n] for n in head + tail}


def all_operators() -> dict[str, Operator]:
    _load_all()
    return _ordered(_REGISTRY)


def get_operator(name: str) -> Operator:
    _load_all()
    return _REGISTRY[name]


def query_map() -> dict[str, QueryFn]:
    """The ``queries()`` dict for the driver contract."""
    return {name: op.query_fn for name, op in all_operators().items()}


def oracle_map() -> dict[str, str]:
    """The ``oracle_sql()`` dict for the driver contract (SQL-expressible only)."""
    return {
        name: op.oracle_sql
        for name, op in all_operators().items()
        if op.oracle_sql is not None
    }
