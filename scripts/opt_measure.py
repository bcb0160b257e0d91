#!/usr/bin/env python
"""Optimization-round harness: isolate one or more registered
queries, time them with the noop sink (guide §1.4), and write their
``explain("formatted")`` plans to plans/<round>/<query>_<tag>.txt
(guide §1 — the judge checks plan claims against these files).

Usage:
    python scripts/opt_measure.py [--tag before|after] [--reps N]
        [--round r14] [--control <query>] q1 q2 ...

--control interleaves a fixed no-change query between every rep of
every measured query and reports its readings alongside — the host
drifts through slow windows (r13 postmortem), so a measured delta only
counts when the control stayed flat across the same span.

Timing methodology matches bench.py (clock includes query construction,
min over reps, cache cleared between queries) so numbers are directly
comparable to BENCH_LOCAL.json rows.
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--tag", default=None, help="write plans/<round>/<q>_<tag>.txt")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--round", default="r14", dest="round_dir")
    ap.add_argument(
        "--control",
        default=None,
        help="no-change query interleaved between reps as a host-drift control",
    )
    args = ap.parse_args()
    plans_dir = Path(__file__).resolve().parents[1] / "plans" / args.round_dir

    from mapreduce_c_implementation_spark.plans.inspect import physical_plan
    from mapreduce_c_implementation_spark.registry import all_operators
    from mapreduce_c_implementation_spark.session import build_session

    spark = build_session("opt-measure")
    ops = all_operators()

    # Same warm-up as bench.py: JVM codegen/noop machinery + Python
    # worker pool, so the first measured query isn't billed for either.
    from pyspark.sql import functions as F

    warm = (
        spark.read.parquet(f"{args.sf_dir}/documents.parquet")
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

    if args.control and args.control not in ops:
        sys.exit(f"unknown control operator {args.control!r}")

    def _timed(name: str) -> float:
        spark.sparkContext.setJobDescription(f"opt-measure: {name}")
        t0 = time.perf_counter()
        df = ops[name].query_fn(spark, args.sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        return dt

    results: dict[str, dict] = {}
    for name in args.queries:
        if name not in ops:
            sys.exit(f"unknown operator {name!r}")
        best = float("inf")
        runs = []
        controls = []
        for _ in range(args.reps):
            if args.control:
                controls.append(round(_timed(args.control), 3))
            dt = _timed(name)
            runs.append(round(dt, 3))
            best = min(best, dt)
        spark.sparkContext._jvm.System.gc()
        plan = physical_plan(ops[name].query_fn(spark, args.sf_dir))
        spark.catalog.clearCache()
        if args.tag:
            plans_dir.mkdir(parents=True, exist_ok=True)
            (plans_dir / f"{name}_{args.tag}.txt").write_text(plan)
        n_exch = plan.count("Exchange")
        results[name] = {
            "best_s": round(best, 3),
            "runs": runs,
            "exchange_nodes": n_exch,
            "batch_eval_python": plan.count("BatchEvalPython"),
            "arrow_eval_python": plan.count("ArrowEvalPython"),
        }
        if args.control:
            results[name]["control_runs"] = controls
            results[name]["control"] = args.control
        print(json.dumps({name: results[name]}), flush=True)

    print(json.dumps({"sf_dir": args.sf_dir, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
