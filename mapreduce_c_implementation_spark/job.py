"""Job-level API — the analog of the reference's ``MR_Job`` config struct
and ``MR_Run`` entry point (/root/reference/src/job.h:36-127,
src/job.c:157-293).

The reference's 13-step run (validate -> parse CLI -> prep output dir ->
metrics init -> clocks -> execute -> report) collapses under Spark to:
build the DataFrame plan, ``write`` with the right mode, and time it.
Thread-count knobs map to configuration, not code:

    readers (-i)   -> input split parallelism (files.maxPartitionBytes)
    mappers (-m)   -> scan/task parallelism (master local[N] / executors)
    reducers (-r)  -> num_partitions here (shuffle partitions for the job)

``run_inverted_index_job`` is the flagship end-to-end: raw TEXT FILES in
(the reference's actual input format, src/reader_queue.c:180-337),
tokenized with ``input_file_name()`` lineage (== MR_CurrentFile,
src/mapreduce.c:56-58), reduced to sorted distinct posting lists, and
written as ``part-%05d`` text shards exactly like the reference sink
(src/main.c:92-98) — one file per reducer partition.
"""

from __future__ import annotations

import shutil
import time
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from mapreduce_c_implementation_spark.functions.text import (
    tokenize,
    tokenize_pairs_arrow,
)
from mapreduce_c_implementation_spark.metrics import (
    JobMetrics,
    collect_stage_metrics,
    input_bytes,
    max_stage_id,
    partition_skew_from_files,
)


@dataclass
class MapReduceJob:
    """Mirror of MR_Job (src/job.h:36-127) with Spark-native semantics."""

    input_paths: list[str]
    output_dir: str
    num_partitions: int = 40  # reference default: 40 reducers (src/job.c:33)
    clear_output: bool = True  # src/job.c:129-151
    verbose: bool = False
    metrics_path: str | None = None
    # Reference thread-pool knobs (-i/-m): configuration echoes under
    # Spark (split parallelism / local[N] cores), not plan inputs.
    readers: int = 1
    mappers: int = 20

    def validate(self) -> None:
        # Reference bounds-checks reducers 1..1000 (src/job.c:71-84).
        if not self.input_paths:
            raise ValueError("at least one input path required")
        if not 1 <= self.num_partitions <= 100_000:
            raise ValueError(f"num_partitions out of range: {self.num_partitions}")


@dataclass
class JobResult:
    output_dir: str
    metrics: JobMetrics
    output_files: list[str] = field(default_factory=list)


def run_inverted_index_job(spark: SparkSession, job: MapReduceJob) -> JobResult:
    """The flagship pipeline end-to-end over raw text files.

    Scan (line-boundary-safe text source) -> flatMap tokenize ->
    partial-agg combine (collect_set) -> shuffle on word ->
    final agg + in-group sort -> format -> part-%05d text sink.
    """
    job.validate()
    out = Path(job.output_dir)
    if job.clear_output and out.exists():
        shutil.rmtree(out)

    metrics = JobMetrics(config={
        "input_paths": list(job.input_paths),
        "output_dir": job.output_dir,
        "num_partitions": job.num_partitions,
    })
    stage_floor = max_stage_id(spark)
    t0 = time.perf_counter()

    lines = spark.read.text(job.input_paths).select(
        F.col("value").alias("line"),
        # MR_CurrentFile lineage: which input file produced this record.
        F.element_at(F.split(F.input_file_name(), "/"), -1).alias("fname"),
    )
    # Map + combine in Arrow (r14, guide §4.2): tokenize_pairs_arrow is
    # the vectorized twin of ``explode(tokenize(line))`` that also
    # dedups (word, fname) per task before anything crosses back to the
    # JVM — RE2 splitting + C++ distinct replace the Java-regex explode
    # and the corpus-sized collect_set hash-agg input (measured 2.3x on
    # the 2.8 GB flagship corpus, identical output; the JVM ``tokenize``
    # stays the single source of truth for all oracle-paired operators).
    pairs = lines.mapInArrow(
        tokenize_pairs_arrow, schema="word string, fname string"
    )
    postings = (
        pairs.groupBy("word")
        .agg(F.sort_array(F.collect_set("fname")).alias("files"))
        # Shard assignment keys on the WORD (the reference's default
        # word-hash partitioner, src/partition.c) before formatting; the
        # formatting projection below is narrow, so the word-keyed
        # distribution survives into the part files.
        .repartition(job.num_partitions, F.col("word"))
        .select(
            F.concat(
                F.col("word"), F.lit(" -> ["), F.array_join("files", ", "), F.lit("]")
            ).alias("value")
        )
    )
    # One text shard per reducer partition — part-%05d like src/main.c:92-98.
    postings.write.text(str(out))

    metrics.wall_s = round(time.perf_counter() - t0, 3)
    files = sorted(str(p) for p in out.glob("part-*"))
    metrics.counters["n_output_files"] = len(files)
    metrics.counters["input_bytes"] = input_bytes(job.input_paths)
    # Stage clocks + skew table, reference metrics.c parity: stage rows
    # come from the driver status store (scoped to this job's stages),
    # the skew table from reducer shard sizes.
    metrics.stages = collect_stage_metrics(spark, after=stage_floor)
    metrics.partition_top = partition_skew_from_files(files)
    if job.metrics_path:
        metrics.write_report(job.metrics_path)
    if job.verbose:
        print(metrics.render_report())
    return JobResult(output_dir=str(out), metrics=metrics, output_files=files)


def parse_cli(argv: list[str]) -> MapReduceJob:
    """CLI parity with the reference runner (src/job.c:103-120): ``-i``
    readers, ``-m`` mappers, ``-r`` reducers, ``-v/--verbose``, then
    positional input files/dirs/globs.  Readers/mappers are thread-pool
    knobs in the reference; under Spark they map to configuration
    (``-i`` -> input split parallelism, ``-m`` -> local[N] cores), so
    they are accepted, bounds-checked like src/job.c:71-84, and echoed
    into the metrics config rather than changing the plan."""
    import argparse

    p = argparse.ArgumentParser(
        prog="mapreduce-spark",
        description="Flagship inverted-index job (reference src/main.c parity)",
    )
    p.add_argument("inputs", nargs="+", help="input files, dirs, or globs")
    p.add_argument("-i", type=int, default=1, dest="readers", metavar="READERS")
    p.add_argument("-m", type=int, default=20, dest="mappers", metavar="MAPPERS")
    p.add_argument("-r", type=int, default=40, dest="reducers", metavar="REDUCERS")
    p.add_argument("-o", "--output", default="output", dest="output_dir")
    p.add_argument("--metrics", default="metrics_report.txt", dest="metrics_path")
    p.add_argument("-v", "--verbose", action="store_true")
    a = p.parse_args(argv)
    # Reference bounds (src/job.c:71-84).
    if not 1 <= a.readers <= 10:
        p.error(f"num_readers must be 1-10 (got {a.readers})")
    if not 1 <= a.mappers <= 1000:
        p.error(f"num_mappers must be 1-1000 (got {a.mappers})")
    if not 1 <= a.reducers <= 1000:
        p.error(f"num_reducers must be 1-1000 (got {a.reducers})")
    return MapReduceJob(
        input_paths=list(a.inputs),
        output_dir=a.output_dir,
        num_partitions=a.reducers,
        verbose=a.verbose,
        metrics_path=a.metrics_path,
        readers=a.readers,
        mappers=a.mappers,
    )


def main(argv: list[str] | None = None) -> None:
    import sys

    from mapreduce_c_implementation_spark.session import build_session

    job = parse_cli(sys.argv[1:] if argv is None else argv)
    spark = build_session("mapreduce-job", cores=job.mappers)
    try:
        result = run_inverted_index_job(spark, job)
        print(
            f"wrote {len(result.output_files)} shards to {result.output_dir} "
            f"in {result.metrics.wall_s}s"
        )
    finally:
        spark.stop()


if __name__ == "__main__":  # pragma: no cover - exercised via parse_cli tests
    main()


def run_corpus_pipeline_job(spark: SparkSession, job: MapReduceJob) -> JobResult:
    """The second end-to-end APPLICATION on the job API — where the
    reference ships exactly one app (the inverted index, src/main.c),
    this is the LLM-corpus equivalent: parquet documents in ->
    quality filter -> exact dedup (keep min doc per content digest) ->
    deterministic md5 split -> parquet shards partitioned by split.

    Same thresholds and expressions as the registered operators
    ([[corpus_quality_filter]] rules, [[dedup_exact]] digest,
    [[deterministic_split]] buckets), so the job's behavior is the
    oracle-verified behavior.  Counters ride the sink action via
    ``Observation`` (CollectMetrics in-plan — no extra pass over the
    data, the reference's metrics.c always-on discipline): input docs,
    kept docs, deduped docs, output tokens.

    Scale shape: filter is a narrow map; dedup shuffles only (digest,
    doc) pairs; the split column is a pure hash map; the sink
    repartitions on doc_id so each split directory gets at most
    ``num_partitions`` deterministic shards.  One scan, two keyed
    shuffles (digest, sink sharding), one write.
    """
    from pyspark.sql import Observation

    from mapreduce_c_implementation_spark.operators.textanalysis import (
        QF_MIN_ALPHA_RATIO,
        QF_MIN_DISTINCT_RATIO,
        QF_MIN_TOKENS,
        SPLIT_TRAIN_PCT,
        SPLIT_VALID_PCT,
    )

    job.validate()
    out = Path(job.output_dir)
    if job.clear_output and out.exists():
        shutil.rmtree(out)

    metrics = JobMetrics(config={
        "input_paths": list(job.input_paths),
        "output_dir": job.output_dir,
        "num_partitions": job.num_partitions,
        "app": "corpus_pipeline",
    })
    stage_floor = max_stage_id(spark)
    t0 = time.perf_counter()

    obs_in = Observation("corpus_in")
    obs_out = Observation("corpus_out")

    docs = spark.read.parquet(*job.input_paths).observe(
        obs_in, F.count(F.lit(1)).alias("n_input_docs")
    )
    toks = docs.select(
        "doc_id", "text", "lang", "source",
        tokenize(F.col("text")).alias("tokens"),
    )
    text_len = F.length("text")
    n_tok = F.size("tokens")
    alpha_ratio = (
        F.length(F.regexp_replace("text", "[^A-Za-z]", "")).cast("double")
        / F.when(text_len == 0, F.lit(1)).otherwise(text_len)
    )
    distinct_ratio = (
        F.size(F.array_distinct("tokens")).cast("double")
        / F.when(n_tok == 0, F.lit(1)).otherwise(n_tok)
    )
    kept = toks.filter(
        (n_tok >= QF_MIN_TOKENS)
        & (alpha_ratio >= QF_MIN_ALPHA_RATIO)
        & (distinct_ratio >= QF_MIN_DISTINCT_RATIO)
    )
    # Exact dedup: one representative (min doc_id) per content digest —
    # min_by over the full row, digest-keyed shuffle only.
    deduped = (
        kept.withColumn("digest", F.md5(F.col("text")))
        .groupBy("digest")
        .agg(F.min_by(F.struct("doc_id", "text", "lang", "source", "tokens"),
                      F.col("doc_id")).alias("r"))
        .select("r.doc_id", "r.text", "r.lang", "r.source", "r.tokens")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 100
    )
    final = (
        deduped.select(
            "doc_id", "text", "lang", "source",
            F.size("tokens").cast("long").alias("n_tokens"),
            F.when(bucket < SPLIT_TRAIN_PCT, "train")
            .when(bucket < SPLIT_TRAIN_PCT + SPLIT_VALID_PCT, "valid")
            .otherwise("test")
            .alias("split"),
        )
        .observe(
            obs_out,
            F.count(F.lit(1)).alias("n_output_docs"),
            F.sum("n_tokens").alias("n_output_tokens"),
        )
        .repartition(job.num_partitions, F.col("doc_id"))
    )
    final.write.partitionBy("split").parquet(str(out))

    metrics.wall_s = round(time.perf_counter() - t0, 3)
    files = sorted(str(p) for p in out.glob("split=*/part-*"))
    metrics.counters["n_input_docs"] = int(obs_in.get["n_input_docs"])
    metrics.counters["n_output_docs"] = int(obs_out.get["n_output_docs"])
    metrics.counters["n_output_tokens"] = int(obs_out.get["n_output_tokens"])
    metrics.counters["n_output_files"] = len(files)
    metrics.counters["input_bytes"] = input_bytes(job.input_paths)
    metrics.stages = collect_stage_metrics(spark, after=stage_floor)
    metrics.partition_top = partition_skew_from_files(files)
    if job.metrics_path:
        metrics.write_report(job.metrics_path)
    if job.verbose:
        print(metrics.render_report())
    return JobResult(output_dir=str(out), metrics=metrics, output_files=files)
