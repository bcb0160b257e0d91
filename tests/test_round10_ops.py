"""Semantic contracts for the round-10 operators — intent checks the
cross-engine oracle diff (tests/test_operators_vs_oracle.py) cannot see:
the oracle proves Spark == DuckDB, these prove both equal the SPEC.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import duckdb

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


def _merge_spans(marks, minlen):
    """[(start 1-based)] -> merged [(s, e)] islands with window minlen."""
    spans = []
    for i in sorted(marks):
        if spans and spans[-1][1] >= i:
            spans[-1][1] = max(spans[-1][1], i + minlen)
        else:
            spans.append([i, i + minlen])
    return [(s, e) for s, e in spans]


def _trim(text, spans):
    kept, prev = [], 1
    for s, e in spans:
        if s > prev:
            kept.append(text[prev - 1 : s - 1])
        prev = max(prev, e)
    kept.append(text[prev - 1 :])
    return "".join(kept)


def test_tiered_trim_rewrite_matches_bruteforce(spark, sf_smoke):
    """Full Python replay of the tiered pipeline: anchored screen ->
    flagged docs -> exact suffix spans on the subset -> trim."""
    from mapreduce_c_implementation_spark.operators.corpus_filters import (
        SUBSTR_GRAM,
        SUBSTR_STRIDE,
        SUBSTR_WIN,
        SUFFIX_MINLEN,
    )

    docs = _docs(sf_smoke)
    # stage 1: anchored screen
    win_occ = defaultdict(set)
    for doc_id, text in docs.items():
        for i in range(1, len(text) - SUBSTR_WIN + 2):
            g = text[i - 1 : i - 1 + SUBSTR_GRAM]
            h = int(hashlib.md5(g.encode()).hexdigest()[:4], 16)
            if h % SUBSTR_STRIDE == 0:
                w = text[i - 1 : i - 1 + SUBSTR_WIN]
                win_occ[hashlib.md5(w.encode()).hexdigest()].add(doc_id)
    flagged = set()
    for ds in win_occ.values():
        if len(ds) >= 2:
            flagged |= ds
    # stage 2: exact suffix spans over the flagged subset only
    buckets = defaultdict(set)
    for doc_id in flagged:
        text = docs[doc_id]
        for i in range(1, len(text) - SUFFIX_MINLEN + 2):
            buckets[text[i - 1 : i - 1 + SUFFIX_MINLEN]].add(doc_id)
    marks = defaultdict(list)
    for doc_id in flagged:
        text = docs[doc_id]
        for i in range(1, len(text) - SUFFIX_MINLEN + 2):
            ds = buckets[text[i - 1 : i - 1 + SUFFIX_MINLEN]]
            if len(ds) >= 2:
                marks[doc_id].append(i)
    expected = {}
    for doc_id, text in docs.items():
        spans = _merge_spans(marks.get(doc_id, []), SUFFIX_MINLEN)
        trimmed = _trim(text, spans) if spans else text
        expected[doc_id] = (
            1 if doc_id in flagged else 0,
            len(spans),
            sum(e - s for s, e in spans),
            len(text) - sum(e - s for s, e in spans),
            hashlib.md5(trimmed.encode()).hexdigest(),
        )
    got = {
        r.doc_id: (
            r.flagged, r.n_cut_spans, r.n_cut_chars, r.kept_chars,
            r.trimmed_md5,
        )
        for r in _rows(spark, sf_smoke, "substring_tiered_trim_rewrite")
    }
    assert got == expected
    assert any(v[0] == 1 for v in expected.values()), "fixture must flag docs"
    assert any(v[0] == 0 for v in expected.values()), "screen must prune docs"


def test_tiered_trim_passthrough_for_unflagged(spark, sf_smoke):
    """Unflagged documents pass through verbatim: zero cut spans and
    trimmed_md5 == md5(text)."""
    docs = _docs(sf_smoke)
    for r in _rows(spark, sf_smoke, "substring_tiered_trim_rewrite"):
        if r.flagged == 0:
            assert r.n_cut_spans == 0 and r.n_cut_chars == 0
            assert r.kept_chars == len(docs[r.doc_id])
            assert (
                r.trimmed_md5
                == hashlib.md5(docs[r.doc_id].encode()).hexdigest()
            )


def _xy2d(n, x, y):
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_layout_matches_bruteforce(spark, sf_smoke):
    """Bucket rollups equal a full Python xy2d replay: equal-count
    buckets over the true Hilbert order, and every key pair lands in
    the bucket its curve position dictates."""
    from mapreduce_c_implementation_spark.operators.analytics import (
        HB_BUCKETS,
        HB_N,
    )

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) "
        f"FROM '{sf_smoke}/orders.parquet'"
    ).fetchall()
    con.close()
    import datetime

    epoch = datetime.date(1970, 1, 1)
    keyed = sorted(
        (
            _xy2d(HB_N, ck % HB_N, (dt - epoch).days % HB_N),
            ok,
            ck,
            dt,
        )
        for ok, ck, dt in rows
    )
    n = len(keyed)
    expected = {}
    for i, (hd, ok, ck, dt) in enumerate(keyed):
        b = (i * HB_BUCKETS) // n
        e = expected.setdefault(b, [0, None, None, None, None])
        e[0] += 1
        e[1] = ck if e[1] is None else min(e[1], ck)
        e[2] = ck if e[2] is None else max(e[2], ck)
        e[3] = dt if e[3] is None else min(e[3], dt)
        e[4] = dt if e[4] is None else max(e[4], dt)
    got = {
        r.bucket: [
            r.n_rows, r.min_cust, r.max_cust,
            r.min_date.date() if hasattr(r.min_date, "date") else r.min_date,
            r.max_date.date() if hasattr(r.max_date, "date") else r.max_date,
        ]
        for r in _rows(spark, sf_smoke, "hilbert_curve_layout")
    }
    assert got == {b: list(v) for b, v in expected.items()}
