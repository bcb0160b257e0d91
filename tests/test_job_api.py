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


def test_arrow_tokenizer_matches_jvm_tokenize(spark):
    """The flagship job's Arrow map+combine (tokenize_pairs_arrow, r14)
    must produce exactly the postings the JVM ``tokenize`` path did —
    including the reference's edge semantics: >255-char alnum runs keep
    their first 255 chars with the tail DROPPED, Unicode characters are
    delimiters (never lowercased into ASCII tokens), empty and
    delimiter-only lines contribute nothing."""
    from pyspark.sql import functions as F

    from mapreduce_c_implementation_spark.functions.text import (
        tokenize,
        tokenize_pairs_arrow,
    )

    rows = [
        ("a" * 300 + " tail", "f1"),  # long run: first 255 kept, tail dropped
        ("İstanbul naïve café ŷz", "f1"),  # unicode delimiters
        ("", "f2"),
        ("...---...", "f2"),
        ("MiXeD CaSe 123abc", "f3"),
        ("x" + "9" * 260, "f3"),
        ("tab\tsep and ümlaut", "f4"),
        ("ıIİi", "f4"),  # dotless/dotted i family must not merge
    ]
    df = spark.createDataFrame(rows, "line string, fname string")
    jvm = (
        df.select(F.explode(tokenize(F.col("line"))).alias("word"), "fname")
        .groupBy("word")
        .agg(F.sort_array(F.collect_set("fname")).alias("files"))
    )
    arrow = (
        df.mapInArrow(tokenize_pairs_arrow, schema="word string, fname string")
        .groupBy("word")
        .agg(F.sort_array(F.collect_set("fname")).alias("files"))
    )
    jvm_rows = sorted((r.word, tuple(r.files)) for r in jvm.collect())
    arrow_rows = sorted((r.word, tuple(r.files)) for r in arrow.collect())
    assert jvm_rows == arrow_rows
    assert ("a" * 255, ("f1",)) in jvm_rows  # truncation actually exercised


def test_job_validation():
    with pytest.raises(ValueError):
        MapReduceJob(input_paths=[], output_dir="/tmp/x").validate()
    with pytest.raises(ValueError):
        MapReduceJob(input_paths=["a"], output_dir="/tmp/x", num_partitions=0).validate()


def test_corpus_pipeline_job_end_to_end(spark, tmp_path):
    """The second application on the job API: filter -> dedup -> split ->
    partitioned parquet shards, with Observation counters and the same
    metrics report as the flagship job."""
    import duckdb

    from mapreduce_c_implementation_spark.job import run_corpus_pipeline_job

    src = "/root/testdata/sf0.001/documents.parquet"
    job = MapReduceJob(
        input_paths=[src],
        output_dir=str(tmp_path / "corpus_out"),
        num_partitions=4,
        metrics_path=str(tmp_path / "corpus_metrics.txt"),
    )
    res = run_corpus_pipeline_job(spark, job)

    n_input = duckdb.sql(f"SELECT count(*) FROM '{src}'").fetchone()[0]
    c = res.metrics.counters
    assert c["n_input_docs"] == n_input
    assert 0 < c["n_output_docs"] <= n_input
    assert c["n_output_tokens"] > 0

    # read back: splits partition the kept set; doc_ids unique; token
    # counts agree with the observation counter
    back = spark.read.parquet(res.output_dir)
    rows = back.collect()
    assert len(rows) == c["n_output_docs"]
    assert len({r.doc_id for r in rows}) == len(rows)
    assert {r.split for r in rows} <= {"train", "valid", "test"}
    assert sum(r.n_tokens for r in rows) == c["n_output_tokens"]

    # deterministic: second run (clear_output) produces identical content
    res2 = run_corpus_pipeline_job(spark, job)
    back2 = spark.read.parquet(res2.output_dir)
    assert sorted((r.doc_id, r.split) for r in back2.collect()) == sorted(
        (r.doc_id, r.split) for r in rows
    )

    report = (tmp_path / "corpus_metrics.txt").read_text()
    assert "=== JOB CONFIG ===" in report and "corpus_pipeline" in report
