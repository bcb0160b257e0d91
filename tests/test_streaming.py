"""Streaming-specific behavior tests (oracle diffs run in
test_operators_vs_oracle.py like every other operator)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_c_implementation_spark.registry import get_operator


def test_stateful_totals_equal_batch_groupby(spark, sf_correct):
    """The applyInPandasWithState op has no SQL oracle; its final
    per-user totals must equal the plain batch aggregate."""
    streamed = {
        r.user_id: (r.n_events, round(r.sum_value, 6))
        for r in get_operator("stream_stateful_totals")
        .query_fn(spark, sf_correct)
        .collect()
    }
    batch = {
        r.user_id: (r.n, round(r.s, 6))
        for r in spark.read.parquet(f"{sf_correct}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            # same integer-cents arithmetic as the stateful operator
            (
                F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0
            ).alias("s"),
        )
        .collect()
    }
    assert streamed == batch


def test_stream_dedup_drops_replays(spark, sf_correct):
    """Replay batch re-delivers ~1/7 of events; sink must still hold each
    event exactly once."""
    out = get_operator("stream_dedup").query_fn(spark, sf_correct)
    total = sum(r.n_unique_events for r in out.collect())
    n_events = spark.read.parquet(f"{sf_correct}/events.parquet").count()
    assert total == n_events


def test_tumbling_drops_late_rows(spark, sf_correct):
    """The staged late rows (event_id % 10 == 7 with old ts) whose window
    closed must be missing from the streamed counts: total streamed n
    < total events."""
    out = get_operator("stream_tumbling_window").query_fn(spark, sf_correct)
    streamed_total = sum(r.n for r in out.collect())
    n_events = spark.read.parquet(f"{sf_correct}/events.parquet").count()
    assert streamed_total < n_events  # something was genuinely dropped
    assert streamed_total > n_events * 0.8  # but only the late tail
