#!/usr/bin/env python
"""Flagship throughput probe (VERDICT r13 item 1): re-establish the
BASELINE.md headline number with host-drift controls.

For each corpus size (1x/2x/4x of the reference's 708 MB) this stages
the text corpus once, then runs N reps of the full flagship job
interleaved with a fixed no-change CONTROL query (tpch_q6 at sf0.1)
between reps — the control calibrates the host window, so a flagship
reading only counts when its bracketing control readings sit at their
usual level.  Also decomposes the wall once per size:

    scan floor   — read text + sum(length)         (I/O + row assembly)
    tokenize     — + regexp_extract_all + explode   (the map stage)
    full job     — + groupBy/collect_set + sink     (the flagship)

Writes plans/r14/FLAGSHIP_r14.json.  Usage:
    python scripts/flagship_probe.py [--reps 5] [--sizes 708,1416,2832]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = Path(__file__).resolve().parents[1] / "plans" / "r14" / "FLAGSHIP_r14.json"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sizes", default="708,1416,2832")
    ap.add_argument("--control", default="tpch_q6")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mapreduce_c_implementation_spark.functions.text import tokenize
    from mapreduce_c_implementation_spark.job import (
        MapReduceJob,
        run_inverted_index_job,
    )
    from mapreduce_c_implementation_spark.metrics import input_bytes
    from mapreduce_c_implementation_spark.registry import all_operators
    from mapreduce_c_implementation_spark.session import build_session

    spark = build_session("flagship-probe")
    ops = all_operators()
    control_fn = ops[args.control].query_fn

    warm = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .limit(50)
        .select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.collect_set("w"))
    )
    warm.write.format("noop").mode("overwrite").save()

    def control() -> float:
        spark.sparkContext.setJobDescription("control")
        t0 = time.perf_counter()
        control_fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        return round(dt, 3)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("text")
    base_bytes = docs.agg(F.sum(F.octet_length("text") + F.lit(1)).alias("b")).collect()[
        0
    ][0]

    report: dict = {"control": args.control, "sizes": {}}
    for target_mb in [int(s) for s in args.sizes.split(",")]:
        copies = max(1, math.ceil(target_mb * 1_000_000 / max(1, base_bytes)))
        corpus = tempfile.mkdtemp(prefix="flagship_probe_")
        out_dir = tempfile.mkdtemp(prefix="flagship_probe_out_")
        try:
            (
                docs.crossJoin(F.broadcast(spark.range(copies)))
                .select("text")
                .repartition(64)
                .write.mode("overwrite")
                .text(corpus)
            )
            corpus_bytes = input_bytes([corpus])
            mb = corpus_bytes / 1e6

            # Decomposition (once per size, best of 2 each).
            lines = spark.read.text(corpus).select(
                F.col("value").alias("line"),
                F.element_at(F.split(F.input_file_name(), "/"), -1).alias("fname"),
            )

            def best2(df, label: str) -> float:
                spark.sparkContext.setJobDescription(f"decomp: {label}")
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    df.write.format("noop").mode("overwrite").save()
                    best = min(best, time.perf_counter() - t0)
                spark.sparkContext.setJobDescription(None)
                return round(best, 3)

            decomp = {
                "scan_floor_s": best2(
                    spark.read.text(corpus).select(F.length("value").alias("n")),
                    "scan",
                ),
                "tokenize_s": best2(
                    lines.select(F.explode(tokenize(F.col("line"))).alias("w")),
                    "tokenize",
                ),
                "tokenize_agg_s": best2(
                    lines.select(
                        F.explode(tokenize(F.col("line"))).alias("word"), "fname"
                    )
                    .groupBy("word")
                    .agg(F.sort_array(F.collect_set("fname")).alias("files")),
                    "tokenize+agg",
                ),
            }

            walls, controls = [], [control()]
            for _ in range(args.reps):
                job = MapReduceJob(
                    input_paths=[corpus], output_dir=out_dir, metrics_path=None
                )
                result = run_inverted_index_job(spark, job)
                walls.append(result.metrics.wall_s)
                controls.append(control())
            best = min(walls)
            report["sizes"][str(target_mb)] = {
                "corpus_mb": round(mb, 1),
                "walls_s": walls,
                "best_wall_s": best,
                "mb_per_s": round(mb / best, 1),
                "controls_s": controls,
                "decomposition": decomp,
            }
            print(json.dumps({str(target_mb): report["sizes"][str(target_mb)]}), flush=True)
        finally:
            shutil.rmtree(corpus, ignore_errors=True)
            shutil.rmtree(out_dir, ignore_errors=True)

    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps(report, indent=1) + "\n")
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
