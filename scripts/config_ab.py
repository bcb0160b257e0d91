#!/usr/bin/env python
"""Same-session A/B of runtime SQL configs (VERDICT r13 item 7): run a
representative query set with and without a config overlay, interleaved
pass by pass in ONE SparkSession, with a no-change control query between
passes.  Both configs are runtime-settable so plans re-derive per query.

Default overlay: the guide §3.1/§9 join pair the builder deferred in
r13 — preferSortMergeJoin=false (planner may pick shuffled-hash when its
size conditions fit) + AQE maxShuffledHashJoinLocalMapThreshold (lets
AQE rewrite SMJ -> SHJ at runtime for small post-shuffle partitions).

Usage: python scripts/config_ab.py [--reps 2] [q1 q2 ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

OVERLAY = {
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "67108864",
}

# Join-heavy representative set: TPC-H multi-join, fact-fact joins,
# linkage/dedup join families, plus the heaviest headline queries.
DEFAULT_QUERIES = [
    "tpch_q9_product_profit",
    "tpch_q21_waiting_supplier",
    "join_orders_lineitem",
    "merge_upsert_scd1",
    "cross_split_leakage_audit",
    "record_linkage_blocked",
    "dedup_recall_eval",
    "customer_rfm_segmentation",
    "cogroup_reconcile",
    "skew_join_salted",
    "dedup_minhash_lsh",
    "exact_substring_duplicates",
    "substring_tiered_trim_rewrite",
    "interval_overlap_join",
    "set_similarity_prefix_join",
    "fk_candidate_discovery",
    "tfidf_cosine_pairs",
    "association_rules_parts",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--control", default="tpch_q6")
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument(
        "--first",
        default="base",
        choices=("base", "overlay"),
        help="which form runs first within each rep (swap to cancel "
        "warm-up ordering bias across two runs)",
    )
    args = ap.parse_args()
    names = args.queries or DEFAULT_QUERIES

    from pyspark.sql import functions as F

    from mapreduce_c_implementation_spark.registry import all_operators
    from mapreduce_c_implementation_spark.session import build_session

    spark = build_session("config-ab")
    ops = all_operators()

    warm = (
        spark.read.parquet(f"{args.sf_dir}/documents.parquet")
        .limit(50)
        .select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.collect_set("w"))
    )
    warm.write.format("noop").mode("overwrite").save()

    def set_overlay(on: bool) -> None:
        for k, v in OVERLAY.items():
            if on:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)

    def timed(name: str) -> float:
        spark.sparkContext.setJobDescription(f"config-ab: {name}")
        t0 = time.perf_counter()
        ops[name].query_fn(spark, args.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        return round(dt, 3)

    res = {n: {"base": [], "overlay": []} for n in names}
    controls = {"base": [], "overlay": []}
    forms = [("base", False), ("overlay", True)]
    if args.first == "overlay":
        forms.reverse()
    for _ in range(args.reps):
        for tag, on in forms:
            set_overlay(on)
            controls[tag].append(timed(args.control))
            for n in names:
                res[n][tag].append(timed(n))
            set_overlay(False)
        spark.sparkContext._jvm.System.gc()

    import math

    out = {}
    logs = []
    for n in names:
        b, o = min(res[n]["base"]), min(res[n]["overlay"])
        out[n] = {**res[n], "best_base": b, "best_overlay": o,
                  "speedup_overlay": round(b / o, 3) if o else None}
        logs.append(math.log(b / o))
    geo = round(math.exp(sum(logs) / len(logs)), 3)
    report = {
        "overlay": OVERLAY,
        "geomean_speedup_overlay": geo,
        "controls": controls,
        "results": out,
    }
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
