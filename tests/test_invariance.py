"""Config-sweep invariance (FIXTURES.md §5, mirroring the reference's
-i/-m/-r thread sweeps and MR_DISABLE_COMBINER on/off: results must not
depend on parallelism or optimizer mode).

Every swept query must produce identical canonical rows across
spark.sql.shuffle.partitions in {1, 4, 40} and AQE on/off.  This is the
test that catches partition-layout-dependent bugs (unordered window
ties, float summation order) before they become 1000-executor bugs.
"""

from __future__ import annotations

import pytest

from mapreduce_c_implementation_spark.registry import get_operator
from tests.oracle import canonical_rows

SWEPT_OPS = [
    "inverted_index",
    "tpch_q1",
    "tpch_q5_local_supplier",
    "join_orders_lineitem",
    "join_full_outer",
    "window_running_sum",
    "window_value_functions",
    "sessionize_batch",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "ann_lsh_bucketed",
    "pivot_status_by_flag",
    "window_range_frame",
    "dedup_connected_components",
    "ann_ivf_coarse",
    "skew_join_salted",
    "stratified_sample",
    "window_time_range",
    "table_profile",
    "merge_upsert_scd1",
    "time_rollup_multigrain",
    "event_funnel",
    "group_median_disc",
    "zorder_layout",
    "tpch_q14_promo_effect",
    "fk_integrity_check",
    "sequence_packing",
    "document_chunking",
    "repetition_ngram_stats",
    "contamination_ngram_overlap",
    "exact_substring_duplicates",
    "embedding_gram_matrix",
    "scd2_history",
    "semdedup_cells",
    "percentile_cont_groups",
    "cross_split_leakage_audit",
    "cogroup_reconcile",
    "time_gap_fill_ffill",
    "variant_json_shred",
    "tpch_q10_returned_items",
    "tpch_q18_large_orders",
    "tpch_q7_nation_volume",
    "event_transition_matrix",
    "token_pmi_pairs",
    "group_mad_outliers",
    "multimodal_cas_index",
    "map_higher_order_functions",
    "expectation_checks",
    "key_skew_profile",
    "graph_pagerank_nations",
    "graph_degree_stats",
    "tpch_q8_market_share",
    "tpch_q12_late_lines",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_discounted_revenue",
    "tpch_q21_waiting_supplier",
    "tpch_q22_sales_opportunity",
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q16_supplier_counts",
    "tpch_q20_potential_promotion",
    "kmeans_lloyd",
    "correlation_matrix",
    "map_in_arrow_doc_stats",
    "hll_sketch_mergeable",
    "feature_quantile_bins",
    "feature_label_encode",
    "python_datasource_scan",
    "recursive_cte_month_spine",
    "lateral_topk_per_customer",
    "sql_params_group_by_all",
    "collation_insensitive_grouping",
    "filtered_aggregates",
    "width_bucket_histogram",
    "record_linkage_blocked",
    "cube_grouping_id",
    "join_asof_keyed",
    "bitmap_exact_distinct",
    "try_arithmetic_safety",
    "listagg_ordered",
    "approx_heavy_hitters",
    "stratified_sample_balanced",
    "source_token_budget_mix",
    "quality_bucket_sample",
    "dedup_minhash_incremental",
    "pmi_term_cooccurrence",
    "ann_pq_adc",
    "dynamic_partition_pruning_join",
    "tpch_rf1_rf2_refresh",
    # round-4 additions
    "ann_ivf_pq",
    "dedup_cc_stars",
    "dedup_minhash_bucketed_probe",
    "graph_triangle_count",
    "graph_label_propagation",
    "gopher_quality_rules",
    "k_anonymity_check",
    "time_weighted_avg",
    "gram_power_iteration",
    # round-4 second wave
    "feature_minmax_scale",
    "feature_target_encode",
    "skipgram_cooccurrence",
    "char_entropy_quality",
    "lexical_diversity_ttr",
    "graph_bfs_distances",
    "dataset_card_stats",
    "vocab_coverage_topk",
    "event_retention_cohorts",
    "ann_recall_eval",
    "hybrid_search_rrf",
    "multimodal_simhash_neardup",
    "event_attribution_last_touch",
    "poisson_bootstrap_mean",
    # round-4 third wave
    "decayed_event_counts",
    "event_daily_anomaly",
    "benford_first_digit",
    "group_mode_frequent",
    "group_linear_regression",
    "winsorized_group_stats",
    "zipf_rank_frequency",
    "heaps_vocab_growth",
    "text_canonicalize_dedup",
    "set_similarity_prefix_join",
    "shingle_containment_pairs",
    "embedding_random_projection",
    "graph_common_neighbors",
    "size_balanced_shards",
    "concurrency_sweep",
    "running_distinct_users",
    "sliding_distinct_users",
    "join_null_safe",
    "seasonality_month_index",
    "shingle_novelty_curve",
    "customer_rfm_segmentation",
    "part_abc_classification",
    # round-6 wave: hash-decided masking/walks/pairs and the drift &
    # survival statistics all claim partitioning-invariance — sweep it.
    "ks_two_sample",
    "psi_population_stability",
    "ngram_lm_perplexity",
    "bpe_merge_steps",
    "tokenizer_apply_bpe",
    "interval_overlap_join",
    "dedup_paragraph_rewrite",
    "span_corruption_masking",
    "mlm_token_masking",
    "graph_random_walk_pairs",
    "rag_chunk_index_build",
    "corpus_version_diff",
    "contamination_filter_rewrite",
    "intersect_except_all_bags",
    "kaplan_meier_retention",
    "preference_pair_construction",
    "window_funnel_timeout",
    "lsh_parameter_sweep",
    "corpus_js_divergence",
    "token_drift_topk",
    "join_cardinality_estimate",
    "source_concentration_metrics",
    "dedup_cluster_size_histogram",
    "score_calibration_reliability",
    "chi_square_contingency",
    "token_label_mutual_information",
    "langid_confusion_matrix",
    "welch_t_test_pairs",
    "embedding_centroid_outliers",
    # round-7 wave: URL hygiene, binned stats, classifier filters,
    # bloom screen, batching economics, fuzzy/blocked joins, mixing.
    "url_canonicalize_dedup",
    "url_blocklist_filter",
    "domain_cap_rewrite",
    "ks_two_sample_binned",
    "quality_classifier_inference",
    "nb_quality_classifier_train_apply",
    "perplexity_filter_rewrite",
    "bloom_contamination_screen",
    "length_bucket_batching",
    "join_fuzzy_levenshtein",
    "graph_adamic_adar",
    "source_temperature_mixing",
    "cvm_two_sample_binned",
    "corpus_entropy_rate",
    "feature_rank_normalize",
    "cosine_similarity_histogram",
    # round-7 second wave: rank/agreement stats, hash-decided FIM cuts,
    # template removal, and LSH-mined triplets all claim invariance.
    "mann_whitney_u_binned",
    "cohen_kappa_agreement",
    "fim_transformation",
    "boilerplate_ngram_removal",
    "hard_negative_mining",
    # round-7 third wave: fertility report, run collapse, source
    # matrix, two-pass curriculum rank, dimension whitening.
    "tokenizer_fertility_stats",
    "duplicate_token_run_collapse",
    "cross_source_contamination_matrix",
    "curriculum_data_ordering",
    "embedding_dimension_whitening",
    # round-7 fourth wave: DSIR selection (decimal-sum scores + total
    # order), novelty firsts, soft-dedup weights, integer CUSUM scan,
    # and the hash-seeded DP release.
    "dsir_importance_resampling",
    "ngram_novelty_score",
    "dedup_soft_weighting",
    "cusum_changepoint_scan",
    "dp_laplace_source_histogram",
    # round-7 fifth wave: pass@k's integer products, the doubled-rank
    # Spearman moments, both deterministic splits, and the bucket fold.
    "pass_at_k_eval",
    "spearman_rank_correlation",
    "group_holdout_split",
    "stratified_kfold_assign",
    "feature_hash_collision_stats",
    # round-8 wave: quality-argmax representatives, the max-min isotonic
    # fit, digest-keyed split repair, and the span-merge islands.
    "dedup_quality_representatives",
    "isotonic_calibration_rewrite",
    "leakage_split_repair",
    "substring_overlap_spans",
    # round-8 second wave: lexicon filter map, doc-partitioned winnowing
    # windows, pair-keyed overlap counts, source-grain EG step, and the
    # prompt-grain best-of-n window.
    "toxicity_wordlist_filter",
    "winnowing_fingerprint_dedup",
    "generation_eval_overlap",
    "doremi_domain_reweighting",
    "best_of_n_rejection_sampling",
    # round-8 third wave: vocab-join holdout scoring and the pair-keyed
    # match aggregation.
    "lm_holdout_perplexity",
    "elo_pairwise_ratings",
    # round-8 fourth wave: bucket-capped diversity window, KN type-grain
    # model joins, and the triple rank-table ensemble.
    "cluster_capped_diversity_sample",
    "kneser_ney_bigram_lm",
    "quality_signal_ensemble_rank",
    # round-8 fifth wave: ordered span stitching, constant-cell sketch
    # build, and the dual-ground-truth recall eval.
    "substring_trim_rewrite",
    "count_min_sketch_tokens",
    "matryoshka_truncation_recall",
    # round-8 sixth wave: blocked-linkage CC rollup (the streaming rate
    # monitor is covered by test_streaming's provider/restart harness).
    "entity_resolution_clusters",
    # round-8 seventh wave: exact order-statistic threshold + coverage,
    # and the fixed-bucket WOE cells.
    "conformal_prediction_threshold",
    "woe_information_value",
    # round-9 first wave: bucket-partitioned suffix ranking, stride-free
    # island merge, and the fixed-bin sketch rollup (streaming twins are
    # covered by test_streaming's provider/restart harness).
    "suffix_array_ranked_lcp",
    "substring_exact_spans",
    "quantile_sketch_mergeable",
    # round-9 second wave: Apriori-pruned pair join, integer-DCG ranking
    # eval, in-row edit-distance map, bin-table decomposition, and the
    # replicate-grain paired bootstrap.
    "association_rules_parts",
    "ndcg_ranking_eval",
    "generation_cer_eval",
    "brier_score_decomposition",
    "paired_bootstrap_significance",
    # round-9 third wave: day-grain moment joins, the bounded pairwise
    # slope medians, and the exact-tier cut-and-stitch.
    "autocorrelation_daily_values",
    "theil_sen_daily_trend",
    "substring_exact_trim_rewrite",
    # round-9 fourth wave: probe-broadcast vote windows, the
    # checkpointed maximin traversal, and the boundary-window CDC.
    "knn_classification_eval",
    "kcenter_greedy_coreset",
    "multimodal_cdc_chunk_dedup",
    # round-9 fifth wave: vocab-grain smoothing windows.
    "negative_sampling_table",
    # round-10 wave: the tiered exact pipeline, postings/pair joins,
    # two-pass bucketed ranks, bounded-table water-filling, and the
    # keyed 2x2 / type-grain rollups.
    "substring_tiered_trim_rewrite",
    "priority_sample_weighted",
    "rouge_n_overlap_eval",
    "f1_threshold_sweep",
    "confident_learning_label_noise",
    "char_class_profile",
    "sequential_pattern_mining",
    "unimax_budget_allocation",
    "key_gini_concentration",
    "hilbert_curve_layout",
    "l_diversity_check",
    "tfidf_cosine_pairs",
    "event_burstiness_fano",
    "diff_in_differences_events",
    # round-10 second wave: bounded bin/hypothesis/bucket tables after
    # one map-side-combined aggregate each; the checkpointed iterative
    # graph loops (HITS halves, the peel cascade).
    "graph_hits_scores",
    "graph_kcore_peel_layers",
    "kruskal_wallis_binned",
    "benjamini_hochberg_fdr",
    "median_of_means_value",
    # round-10 third wave: doc-partitioned islands window + TakeOrdered
    # head, and the bounded QI x band grid.
    "rake_keyword_extraction",
    "t_closeness_check",
    # round-10 fourth wave: calendar-keyed lag fan-out, cell-signature
    # equi-join, and the checkpointed greedy trace.
    "ewma_daily_anomaly",
    "lsh_euclidean_e2lsh",
    "mmr_diverse_reranking",
    # round-10 fifth wave: bounded cell-graph CC and the source-
    # partitioned log-log moment rollup.
    "dbscan_grid_clusters",
    "heaps_law_power_fit",
    # round-10 sixth wave: calendar-bounded signed ranks and the
    # probe-partitioned valuation windows.
    "wilcoxon_signed_rank_daily",
    "knn_shapley_valuation",
    # round-10 seventh wave: group-grain moment rollups, the grouped
    # Gumbel top-k window, and the checkpointed Newton trace.
    "anova_one_way_value",
    "brown_forsythe_levene",
    "gumbel_weighted_sample_per_group",
    "platt_scaling_calibration",
    # round-10 eighth wave: exact order-statistic unpivot and the
    # checkpointed coverage loop.
    "quantile_treatment_effects",
    "greedy_set_cover_docs",
    # round-11 wave: the binned as-of's (key, bin) equi-join + argmax,
    # the bounded score-grain rank metrics (AUC's margin windows, AP's
    # two-pass bucketed rank), the 1-row paired test, and BLEU's
    # (doc, gram)-keyed clip joins.
    "join_asof_binned",
    "roc_auc_rank_exact",
    "average_precision_eval",
    "mcnemar_paired_eval",
    "bleu_ngram_component_eval",
    # round-11 second wave: calendar-bounded block ranks, the bounded
    # top-K pair grid, and the triangle/degree assembly joins.
    "friedman_test_daily",
    "kendall_tau_topk_terms",
    "graph_clustering_coefficient",
    # round-11 third wave: pure-map Luhn folds, the (category, fold)
    # grain encoder joins, key-grain containment semi-joins, and the
    # calendar-bounded Holt recursion.
    "luhn_checksum_pii_screen",
    "feature_target_encode_oof",
    "fk_candidate_discovery",
    "holt_linear_daily",
    # round-11 fourth wave: broadcast-probe MaxSim windows, the
    # checkpointed max-min relaxation, and the cohort-triangle windows.
    "maxsim_late_interaction_topk",
    "graph_widest_path_bottleneck",
    "cohort_ltv_accumulation",
    # round-11 fifth wave: analyzer-inlined SQL UDFs, pipe-syntax
    # lowering, and the table-argument UDTF's partition-keyed shuffle.
    "sql_scalar_udf_inline",
    "sql_pipe_syntax_revenue",
    "udtf_table_argument_partitioned",
    "label_shift_bbse_estimate",
    "phrase_query_positional_index",
    "unicode_nfc_canonicalize",
    "span_token_alignment",
    "observed_metrics_pipeline",
    "sql_identifier_dynamic_table",
    # round-12 additions (the streaming cumulative screen is covered by
    # its own batch-plan determinism test, like the plain screen)
    "index_delete_propagation",
    "dedup_minhash_index_append",
    "index_bucket_compaction",
    "index_upsert_delete_lifecycle",
    # round-13 additions (the two streaming r13 ops are deterministic
    # staged-batch plans covered by tests/test_round13_ops.py)
    "index_snapshot_vacuum",
]


@pytest.mark.parametrize("name", SWEPT_OPS)
def test_partitioning_invariance(spark, sf_correct, name):
    op = get_operator(name)
    baseline = None
    orig_parts = spark.conf.get("spark.sql.shuffle.partitions")
    orig_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        for parts, aqe in [("1", "false"), ("4", "true"), ("40", "true")]:
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            rows = canonical_rows(op.query_fn(spark, sf_correct).toPandas())
            if baseline is None:
                baseline = rows
            else:
                assert rows == baseline, (
                    f"{name}: result depends on partitions={parts}/aqe={aqe}"
                )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig_parts)
        spark.conf.set("spark.sql.adaptive.enabled", orig_aqe)
