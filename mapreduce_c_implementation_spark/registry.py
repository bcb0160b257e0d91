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
# order; everything else follows in registration order.  Rounds 1 and 2
# together hard-verified 99 unique operators (CORRECTNESS_r01/r02.json —
# their union is frozen in ``_DRIVER_VERIFIED_PRIOR``); round 3 rotates
# 50 of the remaining 90 never-driver-verified names into the window.
# The rotated-out ops keep their in-repo oracle coverage
# (tests/test_operators_vs_oracle.py runs every registered operator), and
# tests/test_extensions.py's coverage-ledger test asserts the leftover
# set still fits in one final 50-row round (round 4 takes the rest).
# ROUND-4 ROTATION NOTE: after the round-3 driver run lands
# CORRECTNESS_r03, fold these 50 names into _DRIVER_VERIFIED_PRIOR and
# rebuild this list from the remaining never-verified operators (the
# ledger test test_driver_coverage_ledger computes that leftover set —
# 47 names as of round 3, including the six round-3 additions).
_DRIVER_PRIORITY = [
    # dedup / similarity capstones — the 100 TB-critical pieces
    "dedup_connected_components",
    "dedup_keep_representatives",
    "ann_ivf_coarse",
    "semdedup_cells",
    "kmeans_lloyd",
    "embedding_gram_matrix",
    # TPC-H shapes never driver-verified (q1/q3/q4/q5/q6 green in r1/r2)
    "tpch_q2_min_cost_supplier",
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_late_lines",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_counts",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_discounted_revenue",
    "tpch_q20_potential_promotion",
    "tpch_q21_waiting_supplier",
    "tpch_q22_sales_opportunity",
    # corpus filters
    "repetition_ngram_stats",
    "contamination_ngram_overlap",
    "exact_substring_duplicates",
    "pii_redaction",
    "cross_split_leakage_audit",
    "corpus_pipeline_end2end",
    # modern SQL
    "recursive_cte_month_spine",
    "lateral_topk_per_customer",
    "sql_params_group_by_all",
    "collation_insensitive_grouping",
    "filtered_aggregates",
    "width_bucket_histogram",
    # round-2 streaming additions
    "stream_upsert_latest",
    "stream_dedup_within_watermark",
    "stream_chained_aggregation",
    "stream_stream_left_join",
    # graph
    "graph_pagerank_nations",
    "graph_degree_stats",
    # features
    "feature_quantile_bins",
    "feature_label_encode",
    # io
    "orc_source_roundtrip",
    "small_file_compaction",
    "json_corrupt_records",
    "schema_evolution_merge",
    "xml_source_roundtrip",
    "python_datasource_scan",
    # multimodal
    "multimodal_cas_index",
]

# Operators hard-verified by the driver in prior rounds (the union of
# CORRECTNESS_r01.json and CORRECTNESS_r02.json key sets, all green at
# their latest check).  Used by the coverage-ledger test to prove the
# rotation schedule reaches every registered operator within 4 rounds.
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
