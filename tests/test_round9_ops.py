"""Semantic contracts for the round-9 operators — intent checks the
cross-engine oracle diff (tests/test_operators_vs_oracle.py) cannot see:
the oracle proves Spark == DuckDB, these prove both equal the SPEC.
"""

from __future__ import annotations

from collections import defaultdict

import duckdb
import pytest

from mapreduce_c_implementation_spark.operators.corpus_filters import (
    SUFFIX_K,
    SUFFIX_MINLEN,
)
from mapreduce_c_implementation_spark.registry import get_operator


def _rows(spark, sf_dir, name):
    return get_operator(name).query_fn(spark, sf_dir).collect()


def _docs(sf_dir):
    con = duckdb.connect()
    try:
        return dict(
            con.sql(
                f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
            ).fetchall()
        )
    finally:
        con.close()


def _suffix_buckets(docs):
    """gram(SUFFIX_MINLEN) -> [(doc_id, pos, key(SUFFIX_K))] over all
    positions — the brute-force mirror of the suffix enumeration."""
    buckets = defaultdict(list)
    for doc_id, text in docs.items():
        for i in range(len(text) - SUFFIX_MINLEN + 1):
            buckets[text[i : i + SUFFIX_MINLEN]].append(
                (doc_id, i + 1, text[i : i + SUFFIX_K])
            )
    return buckets


def _lcp(a: str, b: str) -> int:
    n = min(len(a), len(b))
    for j in range(n):
        if a[j] != b[j]:
            return j
    return n


def test_suffix_array_ranked_lcp_matches_bruteforce(spark, sf_smoke):
    """Doc-grain (n_dup_suffixes, max_match_len, argmax_pos) equals a
    full Python suffix-ranking brute force over every position."""
    docs = _docs(sf_smoke)
    agg: dict[int, list] = {}
    for members in _suffix_buckets(docs).values():
        if len(members) < 2:
            continue
        members.sort(key=lambda m: (m[2], m[0], m[1]))
        for k, (doc_id, pos, key) in enumerate(members):
            prev = members[k - 1][2] if k > 0 else ""
            nxt = members[k + 1][2] if k + 1 < len(members) else ""
            ml = max(_lcp(key, prev), _lcp(key, nxt))
            a = agg.setdefault(doc_id, [0, 0, {}])
            a[0] += 1
            a[1] = max(a[1], ml)
            a[2].setdefault(ml, pos)
            a[2][ml] = min(a[2][ml], pos)
    expected = {
        d: (n, mx, pos_by_len[mx]) for d, (n, mx, pos_by_len) in agg.items()
    }
    got = {
        r.doc_id: (r.n_dup_suffixes, r.max_match_len, r.argmax_pos)
        for r in _rows(spark, sf_smoke, "suffix_array_ranked_lcp")
    }
    assert got == expected
    assert all(SUFFIX_MINLEN <= mx <= SUFFIX_K for _, mx, _ in got.values())


def test_substring_exact_spans_matches_bruteforce(spark, sf_smoke):
    """Span table equals the Python islands merge over every position
    whose gram occurs in >= 2 distinct documents (stride-free)."""
    docs = _docs(sf_smoke)
    marks = defaultdict(list)
    for gram, members in _suffix_buckets(docs).items():
        if len({d for d, _, _ in members}) >= 2:
            for doc_id, pos, _ in members:
                marks[doc_id].append(pos)
    expected = set()
    for doc_id, positions in marks.items():
        positions.sort()
        span_id, start, end, nwin = 0, None, None, 0
        for p in positions:
            if start is None or p > end:
                if start is not None:
                    expected.add((doc_id, span_id, start, end, end - start, nwin))
                span_id += 1
                start, nwin = p, 0
            end = p + SUFFIX_MINLEN
            nwin += 1
        if start is not None:
            expected.add((doc_id, span_id, start, end, end - start, nwin))
    got = {
        (r.doc_id, r.span_id, r.span_start, r.span_end, r.span_len, r.n_windows)
        for r in _rows(spark, sf_smoke, "substring_exact_spans")
    }
    assert got == expected
    # exactness vs the anchored screen: spans cover at least as many
    # marked positions as the stride-anchored op can see
    assert got, "fixture must contain cross-doc duplicated substrings"


def test_quantile_sketch_error_bounded_and_mergeable(spark, sf_correct):
    """Every sketch estimate sits within one bin width of the exact
    order statistic, and the 'ALL' sketch is the sum of the per-flag
    sketches (mergeability)."""
    from mapreduce_c_implementation_spark.operators.aggregates import QSK_WIDTH

    rows = _rows(spark, sf_correct, "quantile_sketch_mergeable")
    con = duckdb.connect()
    try:
        exact = {}
        for grp, q in {(r.grp, r.q_pct) for r in rows}:
            flt = "1=1" if grp == "ALL" else f"l_returnflag = '{grp}'"
            exact[(grp, q)] = con.sql(
                f"""
                WITH v AS (SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                                       AS BIGINT) AS c
                           FROM '{sf_correct}/lineitem.parquet' WHERE {flt})
                SELECT c FROM (SELECT c, row_number() OVER (ORDER BY c) - 1 AS r,
                                      count(*) OVER () AS n FROM v)
                WHERE r = (n - 1) * {q} // 100
                """
            ).fetchone()[0]
    finally:
        con.close()
    for r in rows:
        assert abs(r.est_cents - exact[(r.grp, r.q_pct)]) < QSK_WIDTH, r
    ns = {r.grp: r.n for r in rows}
    assert ns["ALL"] == sum(n for g, n in ns.items() if g != "ALL")


def test_stream_quantile_sketch_windows_shape(spark, sf_correct):
    """Both served percentiles exist per window, agree on n, and are
    monotone (p90 >= p50)."""
    rows = _rows(spark, sf_correct, "stream_quantile_sketch_windows")
    assert rows
    by_win = defaultdict(dict)
    for r in rows:
        by_win[r.window_start][r.q_pct] = (r.est_cents, r.n)
    for win, qs in by_win.items():
        assert set(qs) == {50, 90}, win
        assert qs[90][1] == qs[50][1], win
        assert qs[90][0] >= qs[50][0], win


def test_stream_asof_join_matches_batch_bruteforce(spark, sf_correct):
    """The streaming as-of result equals the batch point-in-time rule
    computed in Python: latest purchase (ties -> higher event_id) by the
    same user within the 2h lookback, late held-back rows excluded."""
    con = duckdb.connect()
    try:
        ev = con.sql(
            f"""SELECT event_id, user_id, event_type, ts, value
                FROM '{sf_correct}/events.parquet'
                WHERE event_type IN ('click', 'purchase')
                  AND NOT (ts < TIMESTAMP '2024-01-20 00:00:00'
                           AND event_id % 10 = 7)"""
        ).fetchall()
    finally:
        con.close()
    purchases = defaultdict(list)
    for eid, uid, etype, ts, val in ev:
        if etype == "purchase":
            purchases[uid].append((ts, eid, val))
    expected = {}
    for eid, uid, etype, ts, _ in ev:
        if etype != "click":
            continue
        best = None
        for pts, pid, pval in purchases.get(uid, ()):
            if pts <= ts and (ts - pts).total_seconds() <= 7200:
                key = (pts, pid)
                if best is None or key > best[0]:
                    best = (key, pid, pval)
        if best is not None:
            expected[eid] = (uid, best[1], best[2])
    got = {
        r.click_id: (r.user_id, r.purchase_id, r.purchase_value)
        for r in _rows(spark, sf_correct, "stream_asof_join")
    }
    assert got == expected
    assert expected, "fixture must produce as-of matches"
