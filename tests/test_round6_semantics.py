"""Semantic invariants for the round-6 operator families — properties
the DuckDB differential diff cannot express because BOTH engines could
be wrong the same way (the oracle mirrors the implementation's
formulas).  Each test pins a mathematical law of the operator's
OUTPUT: monotone survival, funnel-level conservation, masking-rate
accounting, LSH collision monotonicity."""

from __future__ import annotations

from mapreduce_c_implementation_spark.registry import get_operator


def test_kaplan_meier_survival_is_monotone_nonincreasing(spark, sf_correct):
    """S(t) is a product of factors <= 1, so the cumulative log must
    never increase with t; at-risk counts must never increase either."""
    rows = (
        get_operator("kaplan_meier_retention")
        .query_fn(spark, sf_correct)
        .collect()
    )
    assert rows, "empty survival curve"
    prev_log, prev_risk = 0, None
    for r in rows:  # already ordered by t_days
        assert r.km_log_micro <= prev_log, r
        prev_log = r.km_log_micro
        if prev_risk is not None:
            assert r.n_at_risk <= prev_risk, r
        prev_risk = r.n_at_risk
        assert r.n_events + r.n_censored <= r.n_at_risk, r


def test_window_funnel_levels_conserve_users(spark, sf_correct):
    """Every user lands in exactly one level bucket, and level >= 1
    exactly for users with at least one view event."""
    import pyspark.sql.functions as F

    rows = (
        get_operator("window_funnel_timeout")
        .query_fn(spark, sf_correct)
        .collect()
    )
    total = sum(r.n_users for r in rows)
    e = spark.read.parquet(f"{sf_correct}/events.parquet")
    n_users = e.select("user_id").distinct().count()
    n_viewers = (
        e.filter(F.col("event_type") == "view")
        .select("user_id")
        .distinct()
        .count()
    )
    assert total == n_users
    reached = sum(r.n_users for r in rows if r.funnel_level >= 1)
    assert reached == n_viewers


def test_mlm_masking_accounting(spark, sf_correct):
    """Per document: corrupted = |target tokens|; mask+random <=
    corrupted (the rest keep surface form); corruption rate tracks
    MLM_PCT loosely on long docs; masked_text length == n_tokens."""
    from mapreduce_c_implementation_spark.operators.textanalysis import MLM_PCT

    rows = (
        get_operator("mlm_token_masking").query_fn(spark, sf_correct).collect()
    )
    assert rows
    for r in rows:
        n_target = len(r.target_text.split()) if r.target_text else 0
        assert n_target == r.n_corrupted, r
        assert r.n_mask + r.n_random <= r.n_corrupted, r
        assert len(r.masked_text.split()) == r.n_tokens, r
    big = [r for r in rows if r.n_tokens >= 40]
    rate = sum(r.n_corrupted for r in big) / sum(r.n_tokens for r in big)
    assert abs(rate - MLM_PCT / 100) < 0.05, rate


def test_span_corruption_sentinels_are_sequential(spark, sf_correct):
    """Targets contain exactly one <extra_id_b> per block, in order."""
    rows = (
        get_operator("span_corruption_masking")
        .query_fn(spark, sf_correct)
        .collect()
    )
    for r in rows[:50]:
        sentinels = [
            t for t in r.target_text.split() if t.startswith("<extra_id_")
        ]
        assert sentinels == [f"<extra_id_{b}>" for b in range(r.n_spans)], r


def test_lsh_sweep_collisions_grow_with_bands(spark, sf_correct):
    """For a fixed signature, shorter bands collide more: collision
    slots must be non-decreasing in the number of bands, and the
    s-curve threshold strictly decreasing."""
    rows = (
        get_operator("lsh_parameter_sweep").query_fn(spark, sf_correct).collect()
    )
    assert [r.bands for r in rows] == sorted(r.bands for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert b.n_collision_slots >= a.n_collision_slots, (a, b)
        assert b.threshold_milli < a.threshold_milli, (a, b)


def test_preference_pairs_chain_structure(spark, sf_correct):
    """Each document appears at most once as chosen and at most once
    as rejected (adjacent-rank chain), margins strictly positive."""
    rows = (
        get_operator("preference_pair_construction")
        .query_fn(spark, sf_correct)
        .collect()
    )
    assert rows
    chosen = [r.chosen_id for r in rows]
    rejected = [r.rejected_id for r in rows]
    assert len(chosen) == len(set(chosen))
    assert len(rejected) == len(set(rejected))
    assert all(r.margin_bp > 0 for r in rows)


def test_bpe_apply_conserves_corpus_tokens(spark, sf_correct):
    """Weighted symbol occurrences after merging must reconstruct the
    corpus CHARACTER count exactly (merges concatenate, never drop),
    when summed as len(symbol) * occurrences over the FULL vocabulary
    (query the unlimited aggregate, not the top-k view)."""
    import pyspark.sql.functions as F

    from mapreduce_c_implementation_spark.operators.textanalysis import (
        _bpe_chain,
    )
    from mapreduce_c_implementation_spark.functions.text import tokenize

    _, seqs = _bpe_chain(spark, sf_correct)
    total_sym_chars = (
        seqs.select(
            F.explode(F.split(F.trim(F.col("seq")), " ")).alias("s"), "c"
        )
        .agg(F.sum(F.length("s") * F.col("c")))
        .collect()[0][0]
    )
    d = spark.read.parquet(f"{sf_correct}/documents.parquet")
    total_tok_chars = (
        d.select(F.explode(tokenize(F.col("text"))).alias("t"))
        .agg(F.sum(F.length("t")))
        .collect()[0][0]
    )
    assert total_sym_chars == total_tok_chars
