#!/usr/bin/env python
"""Same-session A/B of operator forms across git revisions (VERDICT r13
item 2): load the CURRENT package, measure the named queries, then purge
the package from sys.modules, point sys.path at a worktree of the OLD
revision, re-import, and measure the same names — interleaved rep by rep
in ONE SparkSession with a fixed no-change control query between every
measurement.  The host drifts through slow windows; a delta only counts
when the control stayed flat across the same span.

Usage:
    git worktree add /tmp/ab_old <rev>
    python scripts/ab_forms.py --old-root /tmp/ab_old \
        --control tpch_q6 mmr_diverse_reranking ...

The SparkSession is module-independent (a py4j handle), so both forms
execute on identical JVM state; the reader-plan memo (sources/tables.py)
is keyed per (session, module) and each form pays its own first-load.
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import sys
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parents[1])
PKG = "mapreduce_c_implementation_spark"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _purge_pkg() -> None:
    for mod in [m for m in sys.modules if m == PKG or m.startswith(PKG + ".")]:
        del sys.modules[mod]


def _ops_from(root: str):
    _purge_pkg()
    if sys.path[0] in (REPO_ROOT,) or "/ab_" in sys.path[0]:
        sys.path.pop(0)
    sys.path.insert(0, root)
    reg = importlib.import_module(PKG + ".registry")
    return reg.all_operators()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--old-root", required=True)
    ap.add_argument("--control", default="tpch_q6")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default=SF_DIR)
    args = ap.parse_args()

    sys.path.insert(0, REPO_ROOT)
    from mapreduce_c_implementation_spark.session import build_session
    from pyspark.sql import functions as F

    spark = build_session("ab-forms")

    # bench.py's warm-up pair: JVM noop/codegen machinery + worker pool.
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

    def timed(ops, name: str) -> float:
        spark.sparkContext.setJobDescription(f"ab: {name}")
        t0 = time.perf_counter()
        ops[name].query_fn(spark, args.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        return round(dt, 3)

    results: dict[str, dict] = {
        n: {"new": [], "old": [], "control_new": [], "control_old": []}
        for n in args.queries
    }
    for _ in range(args.reps):
        for root, tag in ((REPO_ROOT, "new"), (args.old_root, "old")):
            ops = _ops_from(root)
            for n in args.queries:
                if n not in ops:
                    sys.exit(f"{n!r} missing from {root}")
                results[n][f"control_{tag}"].append(timed(ops, args.control))
                results[n][tag].append(timed(ops, n))
        spark.sparkContext._jvm.System.gc()

    out = {}
    for n, r in results.items():
        bn, bo = min(r["new"]), min(r["old"])
        cn, co = min(r["control_new"]), min(r["control_old"])
        out[n] = {
            **r,
            "best_new": bn,
            "best_old": bo,
            "speedup_new_over_old": round(bo / bn, 3) if bn else None,
            "control_ratio_old_over_new": round(co / cn, 3) if cn else None,
        }
        print(json.dumps({n: out[n]}), flush=True)
    print(json.dumps({"control": args.control, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
