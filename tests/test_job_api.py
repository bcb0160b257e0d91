"""End-to-end job API test: the reference's full MR_Run flow (text files
in, part-%05d text shards out) plus metrics report."""

from __future__ import annotations

import tempfile
from pathlib import Path

import pytest

from mapreduce_c_implementation_spark.job import MapReduceJob, run_inverted_index_job
from mapreduce_c_implementation_spark.sources.io_ops import _stage_text_files


def test_inverted_index_job_end_to_end(spark, sf_correct):
    corpus = _stage_text_files(spark, sf_correct)
    outdir = tempfile.mkdtemp(prefix="mr_out_")
    job = MapReduceJob(
        input_paths=sorted(str(p) for p in Path(corpus).glob("*.txt")),
        output_dir=outdir,
        num_partitions=8,
        metrics_path=f"{outdir}/metrics_report.txt",
    )
    res = run_inverted_index_job(spark, job)

    # part-%05d naming, exactly num_partitions shards
    names = [Path(f).name for f in res.output_files]
    assert len(names) == 8
    assert names[0] == "part-00000" or names[0].startswith("part-00000-")

    # output format parity: 'word -> [shard_a.txt, shard_b.txt]'
    lines = []
    for f in res.output_files:
        lines += Path(f).read_text().splitlines()
    assert lines
    assert all(" -> [" in ln and ln.endswith("]") for ln in lines)
    # every word appears exactly once across all shards
    words = [ln.split(" -> ")[0] for ln in lines]
    assert len(words) == len(set(words))

    # metrics report exists with the stable section order
    report = Path(job.metrics_path).read_text()
    assert report.index("=== JOB CONFIG ===") < report.index("=== TIMING ===")
    assert res.metrics.counters["n_output_files"] == 8
    assert res.metrics.wall_s > 0


def test_job_validation():
    with pytest.raises(ValueError):
        MapReduceJob(input_paths=[], output_dir="/tmp/x").validate()
    with pytest.raises(ValueError):
        MapReduceJob(input_paths=["a"], output_dir="/tmp/x", num_partitions=0).validate()
