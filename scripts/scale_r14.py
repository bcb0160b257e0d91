#!/usr/bin/env python
"""Scale evidence for the heaviest headline queries (VERDICT r13 item
5): stage a K-fold (default 10x) replica of the sf0.1 fixtures (fact
keys shifted, dims fixed — scale_probe's staging recipe), then time the
TOP-N heaviest headline queries at that size under local[8] and
local[32] sessions.  At sf0.1 ~180 queries are bound by fixed per-query
overhead and show 8-core == 32-core walls; at 10x the data-bound ones
must separate (ratio -> ~2+), which converts the "plans parallelize"
assertion into a measurement.  Serial bottlenecks (ratio ~1 at 10x)
are flagged for investigation.

Writes plans/r14/SCALING_r14.json and a table to stdout.  Two sessions
run SEQUENTIALLY (never concurrently — timing integrity), each built
via build_session(cores=...), honoring the same code path the bench
uses.  Usage: python scripts/scale_r14.py [--k 10] [--top 10]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.1"
OUT = Path(__file__).resolve().parents[1] / "plans" / "r14" / "SCALING_r14.json"

# scale_probe.py's staging recipe: shift fact keys per replica so FK
# fan-outs stay realistic; dims stay fixed (the realistic scale-up).
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


def stage(spark, out_dir: str, k: int) -> None:
    from pyspark.sql import functions as F

    for table, shift_cols in TABLES.items():
        df = spark.read.parquet(f"{SF_DIR}/{table}.parquet")
        if shift_cols:
            span = df.agg(F.max(shift_cols[0])).collect()[0][0] + 1
            parts = []
            for r in range(k):
                p = df
                for c in shift_cols:
                    p = p.withColumn(c, F.col(c) + F.lit(r * span))
                parts.append(p)
            big = parts[0]
            for p in parts[1:]:
                big = big.unionByName(p)
        else:
            big = df
        big.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")


def time_at(cores: int, names: list[str], sf_dir: str, reps: int) -> dict:
    from pyspark.sql import functions as F

    from mapreduce_c_implementation_spark.registry import all_operators
    from mapreduce_c_implementation_spark.session import build_session

    spark = build_session(f"scale-r14-{cores}", cores=cores)
    ops = all_operators()
    warm = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(50)
        .select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.collect_set("w"))
    )
    warm.write.format("noop").mode("overwrite").save()

    def _warm_py(batches):
        import pandas as pd  # noqa: F401

        yield from batches

    spark.range(0, 64, 1, 64).mapInPandas(_warm_py, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    timings = {n: float("inf") for n in names}
    for _ in range(reps):
        for n in names:
            spark.sparkContext.setJobDescription(f"scale[{cores}]: {n}")
            t0 = time.perf_counter()
            ops[n].query_fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            timings[n] = min(timings[n], time.perf_counter() - t0)
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(None)
        spark.sparkContext._jvm.System.gc()
    spark.stop()
    return {n: round(t, 3) for n, t in timings.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--names", nargs="*", default=None)
    args = ap.parse_args()

    if args.names:
        names = args.names
    else:
        # Heaviest headline queries by the committed r14 baseline.
        base = json.load(
            open(Path(__file__).resolve().parents[1] / "plans" / "r14" / "BENCH_baseline_suite.json")
        )["queries"]
        # Exclude maintained-index staging ops: their wall is dominated
        # by in-op warehouse table writes whose staging caches per
        # sf_dir, so a fresh staged dir would measure (and re-write)
        # staging, not the query.
        skip = {
            "index_delete_propagation",
            "index_upsert_delete_lifecycle",
            "index_bucket_compaction",
            "index_snapshot_vacuum",
            "dedup_minhash_index_append",
        }
        names = [
            n for n, _ in sorted(base.items(), key=lambda kv: -kv[1]) if n not in skip
        ][: args.top]

    from mapreduce_c_implementation_spark.session import build_session

    staged = tempfile.mkdtemp(prefix="scale_r14_")
    try:
        s = build_session("scale-r14-stage")
        stage(s, staged, args.k)
        s.stop()
        t8 = time_at(8, names, staged, args.reps)
        t32 = time_at(32, names, staged, args.reps)
        rows = {
            n: {
                "wall_8c_s": t8[n],
                "wall_32c_s": t32[n],
                "ratio_8c_over_32c": round(t8[n] / t32[n], 2) if t32[n] else None,
            }
            for n in names
        }
        report = {"k": args.k, "reps": args.reps, "sf_base": SF_DIR, "queries": rows}
        OUT.parent.mkdir(parents=True, exist_ok=True)
        OUT.write_text(json.dumps(report, indent=1) + "\n")
        print(json.dumps(report, indent=1))
    finally:
        shutil.rmtree(staged, ignore_errors=True)


if __name__ == "__main__":
    main()
