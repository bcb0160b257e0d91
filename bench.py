#!/usr/bin/env python
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is forced with the noop sink (full plan, no collect, no sink
I/O) — the distributed-friendly way to measure query time.  Baseline
context: the reference indexes ~37 MB/s of raw text end-to-end on 20
cores (BASELINE.md); our flagship inverted_index at sf0.1 is the direct
comparison point.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# Headline set: the flagship pipeline + one representative per operator
# family.  Extended as phases land.
HEADLINE = [
    "inverted_index",
    "word_count",
    "distinct_pairs",
    "word_count_topk",
    "tpch_q1",
    "tpch_q6",
    "join_star_broadcast",
    "join_orders_lineitem",
    "window_topk_per_group",
    "sessionize_batch",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_quality_score",
    "doc_fingerprint",
    "ann_bruteforce_topk",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tfidf_top_terms",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not Path(sf_dir).is_dir():
        sys.exit(f"bench.py: SPARK_GRAFT_SF_DIR={sf_dir!r} is not a directory")
    try:
        sf = float(Path(sf_dir).name.removeprefix("sf"))
    except ValueError:
        sf = -1.0  # non-sf-named dir; still benchable

    from mapreduce_c_implementation_spark.registry import all_operators
    from mapreduce_c_implementation_spark.session import build_session

    spark = build_session("bench")
    ops = all_operators()
    names = [n for n in HEADLINE if n in ops]

    # Warm the JVM once (codegen, arrow, shuffle machinery, noop sink) on
    # a representative tiny pipeline so timings measure steady-state
    # query execution, not first-query session initialization.
    from pyspark.sql import functions as F

    warm = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(50)
        .select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.collect_set("w"))
    )
    warm.write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names:
        df = ops[name].query_fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
