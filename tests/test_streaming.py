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


def test_rocksdb_state_store_provider_invariance(spark, sf_correct):
    """The state store you'd run at 100 TB is RocksDB (HDFS-backed state
    keeps every key in executor memory; RocksDB spills to local disk
    with changelog checkpointing).  Streaming results must be identical
    under either provider — this is the state-store analog of the
    shuffle-partition invariance sweep.  Exercises a stateful windowed
    aggregate AND the arbitrary-state operator under RocksDB."""
    from tests.oracle import canonical_rows, run_oracle

    provider_conf = "spark.sql.streaming.stateStore.providerClass"
    rocksdb = (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    orig = spark.conf.get(provider_conf)
    # stream_asof_join covers the chained stateful pipeline (interval
    # join -> windowed max) under RocksDB, not just single-operator state.
    # The RocksDB run is compared against the op's DuckDB ORACLE rather
    # than a fresh default-provider re-run: default-provider == oracle is
    # already proven by test_operators_vs_oracle for all three ops, so
    # the transitive guarantee is identical and the test runs 3 streaming
    # executions instead of 6 (r14 — this test was the suite's single
    # heaviest at ~96 s, half of it re-deriving known baselines).
    for name in ["stream_tumbling_window", "stream_stateful_totals", "stream_asof_join"]:
        op = get_operator(name)
        try:
            spark.conf.set(provider_conf, rocksdb)
            under_rocksdb = canonical_rows(op.query_fn(spark, sf_correct).toPandas())
        finally:
            spark.conf.set(provider_conf, orig)
        oracle = canonical_rows(run_oracle(op.oracle_sql, sf_correct))
        assert under_rocksdb == oracle, f"{name} diverged under RocksDB"


def test_checkpoint_restart_exactly_once(spark, sf_correct, tmp_path):
    """Kill-and-restart recovery: run a grouped count over PART of the
    input with a durable checkpoint, stop the query, add the rest of
    the input, restart the SAME query from the SAME checkpoint.  The
    file-source offsets and the state store in the checkpoint must
    prevent any reprocessing: the recovered aggregate counts each event
    exactly once — equal to the batch aggregate over everything.

    Scope (ADVICE r2): the sink here is a memory sink in complete
    mode, so what this proves is SOURCE-offset recovery plus aggregate
    STATE recovery across restart — not sink-side idempotent delivery
    (that contract belongs to transactional file/Delta sinks and is
    exercised by the file-sink ops in streaming/queries.py).  This is
    the failure-recovery contract a 1000-executor streaming job lives
    on (the reference, being single-process batch, has no analog)."""
    import shutil

    from mapreduce_c_implementation_spark.sources import load_table
    from mapreduce_c_implementation_spark.streaming.staging import stage_events

    staged = stage_events(sf_correct)
    batches = sorted(
        f for f in __import__("os").listdir(staged) if f.endswith(".parquet")
    )
    assert len(batches) >= 3
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    schema = load_table(spark, sf_correct, "events").schema

    def run_until_drained():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
            .groupBy("user_id")
            .agg(F.count("*").alias("n"))
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("ckpt_restart_sink")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    # Phase 1: first batch file only.
    shutil.copy(f"{staged}/{batches[0]}", src / batches[0])
    run_until_drained()
    partial = {r.user_id: r.n for r in spark.table("ckpt_restart_sink").collect()}

    # Phase 2: deliver the rest, restart from the same checkpoint.
    for b in batches[1:]:
        shutil.copy(f"{staged}/{b}", src / b)
    run_until_drained()
    recovered = {r.user_id: r.n for r in spark.table("ckpt_restart_sink").collect()}

    expected = {
        r.user_id: r.n
        for r in spark.read.parquet(f"{sf_correct}/events.parquet")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # The staging plan appends one sentinel row under user_id -1.
    expected[-1] = 1
    assert recovered == expected, "restart lost or double-counted events"
    # and phase 1 really was a strict subset (the restart did real work)
    assert partial != recovered
    assert sum(partial.values()) < sum(recovered.values())


def test_transform_with_state_gate_is_not_silent():
    """The streaming ladder's transformWithStateInPandas rung registers
    iff google.protobuf is importable (its state protocol is protobuf-
    framed; this container ships none).  Pin the gate both ways so the
    rung can neither vanish silently where the dependency exists nor
    crash registration where it doesn't (VERDICT r2 item 6)."""
    from mapreduce_c_implementation_spark.registry import all_operators
    from mapreduce_c_implementation_spark.streaming.queries import (
        _twspandas_available,
    )

    try:
        from google.protobuf import descriptor  # noqa: F401

        have_protobuf = True
    except ImportError:
        have_protobuf = False

    assert _twspandas_available() == have_protobuf
    registered = "stream_transform_with_state" in all_operators()
    assert registered == have_protobuf, (
        "transform_with_state registration must exactly track the "
        "protobuf gate — a silent hole either way is a ladder defect"
    )
    if registered:  # where it runs, it must be oracle-paired
        assert all_operators()["stream_transform_with_state"].oracle_sql


def test_file_sink_restart_idempotent_delivery(spark, sf_correct, tmp_path):
    """Sink-side exactly-once (the contract test_checkpoint_restart
    scopes OUT): stream to a REAL parquet file sink in append mode with
    a durable checkpoint, stop mid-input, restart from the same
    checkpoint, and read the sink back like a downstream consumer.  The
    file sink's transaction log (_spark_metadata) must expose each input
    row exactly once — no loss, no duplicates — even though the second
    run re-lists a directory whose earlier files were already committed.
    This is the idempotent-commit protocol a 1000-executor job relies on
    when executors die mid-write: uncommitted files are invisible."""
    import shutil

    from mapreduce_c_implementation_spark.sources import load_table
    from mapreduce_c_implementation_spark.streaming.staging import stage_events

    staged = stage_events(sf_correct)
    batches = sorted(
        f for f in __import__("os").listdir(staged) if f.endswith(".parquet")
    )
    assert len(batches) >= 3
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    schema = load_table(spark, sf_correct, "events").schema

    def run_until_drained():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
            .select("event_id", "user_id", "event_type")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    shutil.copy(f"{staged}/{batches[0]}", src / batches[0])
    run_until_drained()
    n_partial = spark.read.parquet(sink).count()

    for b in batches[1:]:
        shutil.copy(f"{staged}/{b}", src / b)
    run_until_drained()

    out = spark.read.parquet(sink)
    n_total = out.count()
    assert n_partial < n_total
    # exactly once: every event_id appears exactly once, and the id SET
    # matches the batch input exactly
    assert out.select("event_id").distinct().count() == n_total
    expected = (
        spark.read.parquet(str(src)).select("event_id").distinct().count()
    )
    assert n_total == expected


def test_windowed_distinct_matches_batch(spark, sf_correct):
    """The chained (window, user) -> count pipeline must equal the
    batch COUNT(DISTINCT) per closed hour window (no late rows are
    staged into closed windows beyond the oracle's drop rule — this
    checks the on-time majority reconciles exactly)."""
    from pyspark.sql import functions as F

    from mapreduce_c_implementation_spark.registry import get_operator
    from mapreduce_c_implementation_spark.sources import load_table

    got = (
        get_operator("stream_windowed_distinct_users")
        .query_fn(spark, sf_correct)
        .orderBy("window_start")
        .collect()
    )
    batch = (
        load_table(spark, sf_correct, "events")
        .groupBy(F.window("ts", "1 hour"))
        .agg(
            F.countDistinct("user_id").alias("d"),
            F.count("*").alias("n"),
        )
        .select(F.col("window.start").alias("ws"), "d", "n")
        .collect()
    )
    bm = {r.ws: (r.d, r.n) for r in batch}
    # every emitted window's counts match the batch number unless the
    # oracle's late-drop rule removed rows (event_id % 10 == 7 rows in
    # closed windows) — so emitted <= batch, equal for on-time windows
    assert len(got) > 0
    for r in got:
        d, n = bm[r.window_start]
        assert r.n_distinct_users <= d and r.n_events <= n
        assert r.n_distinct_users > 0


def test_stream_substring_screen_exactly_once_and_batch_invariant(
    spark, sf_correct
):
    """Replayed arrivals (the doc staging's crawl re-fetches) must be
    screened exactly once — one sink row per distinct odd doc — and an
    unflagged arrival's digest must equal md5 of its original text
    (pass-through contract)."""
    from pyspark.sql import functions as F

    from mapreduce_c_implementation_spark.registry import get_operator

    out = get_operator("stream_substring_screen").query_fn(spark, sf_correct)
    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    n_odd = docs.filter(F.col("doc_id") % 2 == 1).count()
    assert out.count() == n_odd
    assert out.select("doc_id").distinct().count() == n_odd
    # pass-through rule for unflagged arrivals
    joined = (
        out.filter(F.col("flagged") == 0)
        .join(docs.select("doc_id", "text"), "doc_id")
        .withColumn("orig_md5", F.md5("text"))
    )
    bad = joined.filter(F.col("trimmed_md5") != F.col("orig_md5")).count()
    assert bad == 0
    # flagged arrivals actually lost characters or matched a base doc
    assert (
        out.filter((F.col("flagged") == 1) & (F.col("n_matched_base") == 0)).count()
        == 0
    )


def test_stream_substring_screen_cumulative_closes_cross_batch_seam(
    spark, sf_correct
):
    """The cumulative screen must (a) keep exactly-once + pass-through
    semantics, (b) be STRICTLY STRONGER than the write-once screen —
    every arrival the base-only index flags is still flagged (the index
    only grows) and at least one arrival is flagged ONLY because a prior
    batch's accepted arrival was appended to the index (the cross-batch
    near-dup seam the op exists to close), and (c) stamp batch_id with
    the deterministic staged-batch slice (doc_id % 3)."""
    from pyspark.sql import functions as F

    from mapreduce_c_implementation_spark.registry import get_operator

    cum = (
        get_operator("stream_substring_screen_cumulative")
        .query_fn(spark, sf_correct)
        .cache()
    )
    plain = get_operator("stream_substring_screen").query_fn(spark, sf_correct)
    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    try:
        n_odd = docs.filter(F.col("doc_id") % 2 == 1).count()
        assert cum.count() == n_odd
        assert cum.select("doc_id").distinct().count() == n_odd
        # batch_id is the deterministic staging slice
        assert (
            cum.filter(F.col("batch_id") != F.col("doc_id") % 3).count() == 0
        )
        # pass-through digest for unflagged arrivals
        joined = (
            cum.filter(F.col("flagged") == 0)
            .join(docs.select("doc_id", "text"), "doc_id")
            .withColumn("orig_md5", F.md5("text"))
        )
        assert joined.filter(F.col("trimmed_md5") != F.col("orig_md5")).count() == 0
        # accepted == (kept_chars > 0) everywhere
        assert (
            cum.filter(
                (F.col("accepted") == 1) != (F.col("kept_chars") > 0)
            ).count()
            == 0
        )
        # monotone vs the write-once screen: flags only ever ADD
        both = cum.alias("c").join(plain.alias("p"), "doc_id")
        assert both.filter("p.flagged = 1 AND c.flagged = 0").count() == 0
        # and the maintenance path genuinely catches cross-batch dups
        extra = both.filter("c.flagged = 1 AND p.flagged = 0")
        assert extra.count() > 0
        # cross-batch catches can only happen after batch 0 (batch 0
        # probes the base-only index, identical to the plain screen)
        assert extra.filter("c.batch_id = 0").count() == 0
    finally:
        cum.unpersist()
