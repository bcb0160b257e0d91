#!/usr/bin/env python
"""Scaling probe: replicate the sf0.1 fixtures K-fold (key-shifted, so
join fan-outs stay realistic) into a staging dir, then time a
representative operator set at 1x vs Kx and report the wall-clock
ratio.  Near-linear ratios (~K) are the evidence that the plans scale
by DATA, not by plan pathology (a super-linear ratio flags an
accidental quadratic — the thing that kills a 100 TB run).

Writes docs/SCALING.md.  Usage: python scripts/scale_probe.py [K]

DIMENSION axis (round-9, verdict r8 item 3): the default probe
replicates FACT/corpus tables and holds dimensions fixed — which is
exactly what hid the round-8 entity-resolution quadratic (its cost
grew with `part`, which the probe never grew).  `python
scripts/scale_probe.py --dims [D]` replicates `part` and `supplier`
D-fold instead (facts fixed) and times the dimension-joined operator
set; it also stages a name-space-GROWN part variant (replica names
prefixed, so distinct-name count actually grows D-fold) to measure the
record-linkage blocking selectivity rather than assume it.  Writes a
`## dims Dx` section.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

DIMS_MODE = len(sys.argv) > 1 and sys.argv[1] == "--dims"
_k_arg = sys.argv[2] if DIMS_MODE else (sys.argv[1] if len(sys.argv) > 1 else None)
K = int(_k_arg) if _k_arg else (8 if DIMS_MODE else 4)
SF_DIR = "/root/testdata/sf0.1"
REPS = 2

# (table, key columns to shift per replica) — shifts keep keys unique
# across replicas while preserving intra-replica FK structure.
TABLES = {
    "region": [],
    "nation": [],
    "customer": [],
    "supplier": [],
    "part": [],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

PROBE_OPS = [
    "word_count",
    "inverted_index",
    "tpch_q1",
    "join_orders_lineitem",
    "dedup_minhash_lsh",
    "char_entropy_quality",
    "skipgram_cooccurrence",
    "dedup_exact",
    # round-4 second wave: the similarity-join family is where an
    # accidental quadratic would live — probe it explicitly.
    "set_similarity_prefix_join",
    "shingle_containment_pairs",
    "embedding_random_projection",
    "concurrency_sweep",
    # round-6: the de-weaked two-pass prefix-sum/rank rewrites — probe
    # that distributing the global windows kept them linear.
    "sequence_packing",
    "zorder_layout",
    "customer_rfm_segmentation",
    "part_abc_classification",
    # round-6 additions with non-trivial shuffle shapes: bigram-LM
    # (two vocab-grain exchanges), BPE (iterated vocab-grain passes),
    # paragraph rewrite (digest shuffle + doc rebuild), interval join
    # (bin equi-join), token-label MI (cell-grain aggregate).
    "ngram_lm_perplexity",
    "bpe_merge_steps",
    "dedup_paragraph_rewrite",
    "interval_overlap_join",
    "token_label_mutual_information",
    # round-6 second wave: pure-map span masking, the RAG index
    # composition (chunk->featurize->route->manifest), and the
    # shingle-join decontamination rewrite.
    "span_corruption_masking",
    "rag_chunk_index_build",
    "contamination_filter_rewrite",
    # round-6 third wave (verdict r6 item 4): the remaining unprobed
    # additions — hash-decided MLM masking (pure map), survival / t-test
    # / confusion statistics (group-grain reduces), DPO pair windows,
    # and the degree-bounded random-walk joins.
    "mlm_token_masking",
    "kaplan_meier_retention",
    "welch_t_test_pairs",
    "langid_confusion_matrix",
    "preference_pair_construction",
    "graph_random_walk_pairs",
    # round-7 additions with non-trivial shapes: URL canonical groupBy,
    # bloom probe (broadcast bit-set join), NB train+apply (vocab-grain
    # shuffle join), perplexity filter (LM + threshold), per-host cap
    # window, blocked fuzzy join.
    "url_canonicalize_dedup",
    "bloom_contamination_screen",
    "nb_quality_classifier_train_apply",
    "perplexity_filter_rewrite",
    "domain_cap_rewrite",
    "join_fuzzy_levenshtein",
    # round-7 second/third waves: cross-doc template join (boilerplate),
    # LSH triplet mining, rank/entropy stats, FIM row map, the
    # cross-source shingle matrix, the two-pass curriculum rank, and
    # dimension whitening (d-row broadcast join).
    "boilerplate_ngram_removal",
    "hard_negative_mining",
    "feature_rank_normalize",
    "corpus_entropy_rate",
    "fim_transformation",
    "cross_source_contamination_matrix",
    "curriculum_data_ordering",
    "embedding_dimension_whitening",
    "duplicate_token_run_collapse",
    # round-7 fourth wave: DSIR's two 1-row total broadcasts, the
    # novelty first-occurrence shuffle, soft-dedup digest groupBy,
    # the day-grain CUSUM scan, and the source-grain DP release.
    "dsir_importance_resampling",
    "ngram_novelty_score",
    "dedup_soft_weighting",
    "cusum_changepoint_scan",
    "dp_laplace_source_histogram",
    # round-7 fifth wave: pass@k's problem-grain HOF products, the
    # Spearman value-grain rank joins, both split assigners (the
    # k-fold one carries the per-stratum window), and the
    # vocabulary-grain collision fold.
    "pass_at_k_eval",
    "spearman_rank_correlation",
    "group_holdout_split",
    "stratified_kfold_assign",
    "feature_hash_collision_stats",
    # round-7 closure (verdict r7 item 5): the remaining unprobed
    # additions — all bin/group-grain reduces or broadcast-residual
    # joins of families already probed, now with numbers.
    "url_blocklist_filter",
    "ks_two_sample_binned",
    "quality_classifier_inference",
    "length_bucket_batching",
    "graph_adamic_adar",
    "source_temperature_mixing",
    "cvm_two_sample_binned",
    "cosine_similarity_histogram",
    "mann_whitney_u_binned",
    "cohen_kappa_agreement",
    # round-8 wave: cluster-grain quality argmax, the constant-size
    # isotonic bin-triple join + doc rewrite, digest-keyed split
    # repair, and the doc-partitioned span merge.
    "dedup_quality_representatives",
    "isotonic_calibration_rewrite",
    "leakage_split_repair",
    "substring_overlap_spans",
    # round-8 second/third waves: lexicon filter, winnowing windows,
    # pair-keyed overlap eval, EG mixture step, prompt-grain argmax,
    # holdout LM scoring, match-rating aggregation — plus the cosine
    # histogram re-probed after its fixed-budget sample fix.
    "toxicity_wordlist_filter",
    "winnowing_fingerprint_dedup",
    "generation_eval_overlap",
    "doremi_domain_reweighting",
    "best_of_n_rejection_sampling",
    "lm_holdout_perplexity",
    "elo_pairwise_ratings",
    "cluster_capped_diversity_sample",
    "kneser_ney_bigram_lm",
    "quality_signal_ensemble_rank",
    "substring_trim_rewrite",
    "count_min_sketch_tokens",
    "matryoshka_truncation_recall",
    "entity_resolution_clusters",
    "conformal_prediction_threshold",
    "woe_information_value",
    # round-9 wave: the exact suffix tier (all-position enumeration is
    # the family's cost ceiling — probe that it stays linear), the
    # sketch rollup, the Apriori pair join, the ranked eval, the
    # in-row CER map, the bin-table decomposition, the replicate
    # bootstrap, the day-grain ACF/Theil-Sen pair (calendar-bounded
    # pair stages must hold ~flat), and the exact trim.
    "suffix_array_ranked_lcp",
    "substring_exact_spans",
    "substring_exact_trim_rewrite",
    "quantile_sketch_mergeable",
    "association_rules_parts",
    "ndcg_ranking_eval",
    "generation_cer_eval",
    "brier_score_decomposition",
    "paired_bootstrap_significance",
    "autocorrelation_daily_values",
    "theil_sen_daily_trend",
    # round-9 fourth wave: probe-broadcast kNN vote, the K-round
    # maximin traversal (K corpus passes — must stay ~linear), and the
    # per-byte CDC boundary scan.
    "knn_classification_eval",
    "kcenter_greedy_coreset",
    "multimodal_cdc_chunk_dedup",
    "negative_sampling_table",
    # round-10 additions
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
    # round-10 second wave
    "kruskal_wallis_binned",
    "benjamini_hochberg_fdr",
    "median_of_means_value",
    "graph_hits_scores",
    "graph_kcore_peel_layers",
    "t_closeness_check",
    "rake_keyword_extraction",
    "ewma_daily_anomaly",
    "lsh_euclidean_e2lsh",
    "mmr_diverse_reranking",
    "dbscan_grid_clusters",
    "heaps_law_power_fit",
    "wilcoxon_signed_rank_daily",
    "knn_shapley_valuation",
    "anova_one_way_value",
    "brown_forsythe_levene",
    "gumbel_weighted_sample_per_group",
    "platt_scaling_calibration",
    "quantile_treatment_effects",
    "greedy_set_cover_docs",
    # round-11 additions (one-off probed as they landed; see SCALING.md)
    "stream_substring_screen",
    "join_asof_binned",
    "roc_auc_rank_exact",
    "average_precision_eval",
    "mcnemar_paired_eval",
    "bleu_ngram_component_eval",
    "friedman_test_daily",
    "kendall_tau_topk_terms",
    "graph_clustering_coefficient",
    "luhn_checksum_pii_screen",
    "feature_target_encode_oof",
    "fk_candidate_discovery",
    "holt_linear_daily",
    "maxsim_late_interaction_topk",
    "graph_widest_path_bottleneck",
    "cohort_ltv_accumulation",
    "sql_scalar_udf_inline",
    "sql_pipe_syntax_revenue",
    "udtf_table_argument_partitioned",
    "label_shift_bbse_estimate",
    "phrase_query_positional_index",
    "unicode_nfc_canonicalize",
    "span_token_alignment",
    "observed_metrics_pipeline",
    "sql_identifier_dynamic_table",
    # round-12 additions
    "stream_substring_screen_cumulative",
    "index_delete_propagation",
    "dedup_minhash_index_append",
    "index_bucket_compaction",
    "index_upsert_delete_lifecycle",
    # round-13 additions
    "stream_substring_screen_resumable",
    "index_snapshot_vacuum",
    "stream_substring_screen_rtbf",
]


# Dimension-axis probe set: every op whose cost is driven by the
# part/supplier DIMENSION tables (the axis the default probe holds
# fixed).  record_linkage_blocked appears twice: once under catalog
# replication (same name space — the value-grain compaction must hold
# cost ~flat) and once under name-space growth (staged separately).
DIM_PROBE_OPS = [
    "record_linkage_blocked",
    "entity_resolution_clusters",
    # round-11: containment counts ride the parent-side distincts
    "fk_candidate_discovery",
    "join_fuzzy_levenshtein",
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_profit",
    "tpch_q16_supplier_counts",
]
DIM_TABLES = {"part": ("p_partkey", "p_name"), "supplier": ("s_suppkey", None)}


def stage_dims(spark, out_dir: str, grow_names: bool) -> None:
    """Replicate part/supplier K-fold (keys shifted; facts copied
    verbatim).  With grow_names, replica r > 0 gets names prefixed
    'v{r} ' so the DISTINCT-name space grows K-fold too — the axis that
    measures blocking selectivity instead of value-grain compaction."""
    from pyspark.sql import functions as F

    for table in TABLES:
        df = spark.read.parquet(f"{SF_DIR}/{table}.parquet")
        if table in DIM_TABLES:
            key, name_col = DIM_TABLES[table]
            span = df.agg(F.max(key)).collect()[0][0] + 1
            parts = []
            for r in range(K):
                p = df.withColumn(key, F.col(key) + F.lit(r * span))
                if grow_names and name_col and r > 0:
                    p = p.withColumn(
                        name_col, F.concat(F.lit(f"v{r} "), F.col(name_col))
                    )
                parts.append(p)
            big = parts[0]
            for p in parts[1:]:
                big = big.unionByName(p)
        else:
            big = df  # facts stay fixed — isolating the dimension axis
        big.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")


def main_dims() -> None:
    from mapreduce_c_implementation_spark.registry import all_operators
    from mapreduce_c_implementation_spark.session import build_session

    spark = build_session("scale_probe_dims")
    reg = all_operators()
    ops = {n: reg[n] for n in DIM_PROBE_OPS}
    staged = tempfile.mkdtemp(prefix="scale_probe_dim_")
    staged_names = tempfile.mkdtemp(prefix="scale_probe_dimn_")
    try:
        stage_dims(spark, staged, grow_names=False)
        stage_dims(spark, staged_names, grow_names=True)
        base = time_ops(spark, ops, SF_DIR)
        big = time_ops(spark, ops, staged)
        link_ops = {n: reg[n] for n in ("record_linkage_blocked", "entity_resolution_clusters")}
        grown = time_ops(spark, link_ops, staged_names)
        section = [
            "",
            f"## dims {K}x",
            "",
            f"`part`/`supplier` replicated {K}x (facts fixed).  Rows marked",
            "*names grown* use the name-space-grown staging (replica names",
            f"prefixed — {K}x distinct names), the axis that measures the",
            "linkage blocking selectivity.",
            "",
            f"| Operator | 1x wall (s) | dims {K}x wall (s) | ratio |",
            "|---|---|---|---|",
        ]
        for n in DIM_PROBE_OPS:
            ratio = round(big[n] / base[n], 2) if base[n] else float("nan")
            section.append(f"| `{n}` | {base[n]} | {big[n]} | {ratio}x |")
        for n in link_ops:
            ratio = round(grown[n] / base[n], 2) if base[n] else float("nan")
            section.append(
                f"| `{n}` *(names grown)* | {base[n]} | {grown[n]} | {ratio}x |"
            )
        out = Path(__file__).resolve().parents[1] / "docs" / "SCALING.md"
        text = out.read_text() if out.exists() else "# Scaling probe\n"
        marker = f"\n## dims {K}x\n"
        if marker in text:  # replace the stale section in place
            head, _, rest = text.partition(marker)
            tail = ""
            nxt = rest.find("\n## ")
            if nxt != -1:
                tail = rest[nxt:]
            text = head + "\n".join(section) + "\n" + tail
        else:
            text = text.rstrip("\n") + "\n" + "\n".join(section) + "\n"
        out.write_text(text)
        print(f"wrote {out}")
        for ln in section[8:]:
            print(ln)
    finally:
        shutil.rmtree(staged, ignore_errors=True)
        shutil.rmtree(staged_names, ignore_errors=True)
    spark.stop()


def stage(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    for table, shift_cols in TABLES.items():
        df = spark.read.parquet(f"{SF_DIR}/{table}.parquet")
        if shift_cols:
            span = df.agg(F.max(shift_cols[0])).collect()[0][0] + 1
            parts = []
            for r in range(K):
                p = df
                for c in shift_cols:
                    p = p.withColumn(c, F.col(c) + F.lit(r * span))
                parts.append(p)
            big = parts[0]
            for p in parts[1:]:
                big = big.unionByName(p)
        else:
            big = df  # dims stay fixed — the realistic scale-up shape
        big.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")


def time_ops(spark, ops, sf_dir: str) -> dict[str, float]:
    timings = {n: float("inf") for n in ops}
    for _ in range(REPS):
        for n in ops:
            t0 = time.perf_counter()
            df = ops[n].query_fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[n] = min(timings[n], time.perf_counter() - t0)
            spark.catalog.clearCache()
    return {n: round(t, 3) for n, t in timings.items()}


def main() -> None:
    from mapreduce_c_implementation_spark.registry import all_operators
    from mapreduce_c_implementation_spark.session import build_session

    spark = build_session("scale_probe")
    reg = all_operators()
    ops = {n: reg[n] for n in PROBE_OPS}
    staged = tempfile.mkdtemp(prefix="scale_probe_")
    try:
        stage(spark, staged)
        base = time_ops(spark, ops, SF_DIR)
        big = time_ops(spark, ops, staged)
        header = [
            "# Scaling probe",
            "",
            "sf0.1 fixtures replicated Kx (fact keys shifted per replica,",
            "dims fixed — the realistic scale-up shape), representative",
            f"operators timed at both sizes (best of {REPS}, local[32]).",
            "A wall-clock ratio near Kx (or below: fixed per-query costs",
            "amortize) means the plan scales with DATA; a super-linear ratio",
            "would flag an accidental quadratic.  Regenerate a section with",
            "`python scripts/scale_probe.py <K>`.",
        ]
        section = [
            "",
            f"## {K}x",
            "",
            f"| Operator | 1x wall (s) | {K}x wall (s) | ratio |",
            "|---|---|---|---|",
        ]
        for n in PROBE_OPS:
            ratio = round(big[n] / base[n], 2) if base[n] else float("nan")
            section.append(f"| `{n}` | {base[n]} | {big[n]} | {ratio}x |")
        out = Path(__file__).resolve().parents[1] / "docs" / "SCALING.md"
        sections: dict[int, str] = {}
        prose: list[str] = []  # non-numeric sections (e.g. ## Findings)
        if out.exists():
            for chunk in out.read_text().split("\n## ")[1:]:
                head = chunk.split("x", 1)[0]
                if head.isdigit():
                    sections[int(head)] = "\n## " + chunk.rstrip("\n")
                else:
                    prose.append("\n## " + chunk.rstrip("\n"))
        sections[K] = "\n" + "\n".join(section[1:])
        body = (
            "\n".join(header)
            + "\n"
            + "".join(sections[k] + "\n" for k in sorted(sections))
            + "".join(pc + "\n" for pc in prose)
        )
        out.write_text(body)
        print(f"wrote {out}")
        for ln in section[-len(PROBE_OPS):]:
            print(ln)
    finally:
        shutil.rmtree(staged, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main_dims() if DIMS_MODE else main()
