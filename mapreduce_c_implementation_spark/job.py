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

from mapreduce_c_implementation_spark.functions.text import tokenize
from mapreduce_c_implementation_spark.metrics import JobMetrics


@dataclass
class MapReduceJob:
    """Mirror of MR_Job (src/job.h:36-127) with Spark-native semantics."""

    input_paths: list[str]
    output_dir: str
    num_partitions: int = 40  # reference default: 40 reducers (src/job.c:33)
    clear_output: bool = True  # src/job.c:129-151
    verbose: bool = False
    metrics_path: str | None = None

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
    t0 = time.perf_counter()

    lines = spark.read.text(job.input_paths).select(
        F.col("value").alias("line"),
        # MR_CurrentFile lineage: which input file produced this record.
        F.element_at(F.split(F.input_file_name(), "/"), -1).alias("fname"),
    )
    pairs = lines.select(
        F.explode(tokenize(F.col("line"))).alias("word"), "fname"
    )
    postings = (
        pairs.groupBy("word")
        .agg(F.sort_array(F.collect_set("fname")).alias("files"))
        .select(
            F.concat(
                F.col("word"), F.lit(" -> ["), F.array_join("files", ", "), F.lit("]")
            ).alias("value")
        )
    )
    # One text shard per reducer partition, hash-distributed by word —
    # the exact output contract of the reference sink (part-%05d).
    postings.repartition(job.num_partitions, F.col("value")).write.text(str(out))

    metrics.wall_s = round(time.perf_counter() - t0, 3)
    files = sorted(str(p) for p in out.glob("part-*"))
    metrics.counters["n_output_files"] = len(files)
    metrics.counters["input_bytes"] = sum(
        Path(p).stat().st_size for p in job.input_paths if Path(p).is_file()
    )
    if job.metrics_path:
        metrics.write_report(job.metrics_path)
    if job.verbose:
        print(metrics.render_report())
    return JobResult(output_dir=str(out), metrics=metrics, output_files=files)
