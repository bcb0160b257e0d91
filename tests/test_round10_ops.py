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


def test_priority_sample_matches_bruteforce(spark, sf_smoke):
    """Sample membership, ranks, tau, and estimates equal the Python
    priority-sampling replay with the same md5-derived uniforms."""
    from mapreduce_c_implementation_spark.operators.sampling import (
        PRIO_SAMPLE_K,
        PRIO_U_SCALE,
    )

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, n_chars FROM '{sf_smoke}/documents.parquet'"
    ).fetchall()
    con.close()
    pri = []
    for doc_id, w in rows:
        u = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) \
            % PRIO_U_SCALE + 1
        pri.append((w * PRIO_U_SCALE // u, doc_id, w, u))
    pri.sort(key=lambda t: (-t[0], t[1]))
    top = pri[: PRIO_SAMPLE_K + 1]
    tau = top[PRIO_SAMPLE_K][0] if len(top) > PRIO_SAMPLE_K else 0
    expected = {
        doc_id: (w, u, q, rk + 1, max(w, tau))
        for rk, (q, doc_id, w, u) in enumerate(top[:PRIO_SAMPLE_K])
    }
    got = {
        r.doc_id: (r.weight, r.u, r.priority, r.sample_rank, r.est_weight)
        for r in _rows(spark, sf_smoke, "priority_sample_weighted")
    }
    assert got == expected


def test_rouge_n_matches_bruteforce(spark, sf_smoke):
    """ROUGE-1/2 clipped overlaps and integer F1 equal a Python replay
    of the same corruption pairs."""
    import re
    from collections import Counter

    from mapreduce_c_implementation_spark.operators.textanalysis import (
        CER_DROP_MOD,
    )

    docs = _docs(sf_smoke)
    expected = {}
    for doc_id, text in docs.items():
        ref = [
            t.lower()[:255]
            for t in re.split(r"[^a-zA-Z0-9]+", text)
            if t
        ]
        if not ref:
            continue
        gen = [t for i, t in enumerate(ref) if (i + 1) % CER_DROP_MOD != 0]
        r1 = sum((Counter(ref) & Counter(gen)).values())
        rb = list(zip(ref, ref[1:]))
        gb = list(zip(gen, gen[1:]))
        r2 = sum((Counter(rb) & Counter(gb)).values())
        f1_1 = 2 * r1 * 1000000 // (len(ref) + len(gen))
        d2 = len(rb) + len(gb)
        f1_2 = (2 * r2 * 1000000 // d2) if d2 > 0 else 0
        expected[doc_id] = (
            r1, len(ref), len(gen), f1_1, r2, len(rb), len(gb), f1_2,
        )
    got = {
        r.doc_id: (
            r.r1_match, r.r1_ref, r.r1_gen, r.rouge1_f1_ppm,
            r.r2_match, r.r2_ref, r.r2_gen, r.rouge2_f1_ppm,
        )
        for r in _rows(spark, sf_smoke, "rouge_n_overlap_eval")
    }
    assert got == expected
    assert any(v[3] < 1000000 for v in expected.values())


def test_gini_matches_bruteforce(spark, sf_smoke):
    """Gini and Lorenz shares equal the Python closed form over exact
    token counts."""
    import re
    from collections import Counter

    docs = _docs(sf_smoke)
    counts = Counter()
    for text in docs.values():
        counts.update(
            t.lower()[:255] for t in re.split(r"[^a-zA-Z0-9]+", text) if t
        )
    asc = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(asc)
    t = sum(c for _, c in asc)
    s = sum((i + 1) * c for i, (_, c) in enumerate(asc))
    gini = (2 * s - (n + 1) * t) * 1000000 // (n * t)
    top10 = sum(c for _, c in asc[-10:]) * 1000000 // t
    top1 = sum(c for _, c in asc[-max(n // 100, 1):]) * 1000000 // t
    (r,) = _rows(spark, sf_smoke, "key_gini_concentration")
    assert (r.n_keys, r.total_count, r.gini_ppm, r.top10_share_ppm,
            r.top1pct_share_ppm) == (n, t, gini, top10, top1)


def test_unimax_matches_bruteforce(spark, sf_smoke):
    """Water-filling allocation equals the Python greedy replay, every
    budget respects the cap, and the capped/uncapped split is the
    ascending-prefix rule."""
    import re

    from mapreduce_c_implementation_spark.operators.sampling import (
        UNIMAX_BUDGET_DEN,
        UNIMAX_BUDGET_NUM,
        UNIMAX_CAP_MILLI,
    )

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT lang, text FROM '{sf_smoke}/documents.parquet'"
    ).fetchall()
    con.close()
    toks = {}
    for lang, text in rows:
        toks[lang] = toks.get(lang, 0) + len(
            [t for t in re.split(r"[^a-zA-Z0-9]+", text) if t]
        )
    langs = sorted(toks.items(), key=lambda kv: (kv[1], kv[0]))
    total = sum(toks.values())
    budget = total * UNIMAX_BUDGET_NUM // UNIMAX_BUDGET_DEN
    caps = {l: n * UNIMAX_CAP_MILLI // 1000 for l, n in langs}
    n_src = len(langs)
    m, pre = 0, 0
    for i, (l, n) in enumerate(langs, 1):
        if caps[l] * (n_src - i + 1) <= budget - pre:
            m, pre = i, pre + caps[l]
        else:
            break
    share = (budget - pre) // (n_src - m) if m < n_src else None
    expected = {}
    for i, (l, n) in enumerate(langs, 1):
        alloc = caps[l] if i <= m else min(caps[l], share)
        expected[l] = (
            n, caps[l], 1 if i <= m else 0, alloc, alloc * 1000 // n,
        )
    got = {
        r.lang: (r.n_tokens, r.cap_tokens, r.is_capped, r.budget_tokens,
                 r.epochs_milli)
        for r in _rows(spark, sf_smoke, "unimax_budget_allocation")
    }
    assert got == expected


def test_sequential_patterns_match_bruteforce(spark, sf_smoke):
    """Pattern supports equal the Python first-before-last replay."""
    from mapreduce_c_implementation_spark.operators.analytics import (
        SEQPAT_MIN_SUP,
    )

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT user_id, event_type, ts, event_id"
        f" FROM '{sf_smoke}/events.parquet'"
    ).fetchall()
    con.close()
    first, last = {}, {}
    users = set()
    for u, et, ts, eid in rows:
        users.add(u)
        k = (u, et)
        v = (ts, eid)
        first[k] = v if k not in first else min(first[k], v)
        last[k] = v if k not in last else max(last[k], v)
    sup1 = defaultdict(int)
    for (u, et) in first:
        sup1[et] += 1
    kept = {et for et, c in sup1.items() if c >= SEQPAT_MIN_SUP}
    both = defaultdict(int)
    for (u, a) in first:
        if a not in kept:
            continue
        for b in kept:
            if b != a and (u, b) in last and first[(u, a)] < last[(u, b)]:
                both[(a, b)] += 1
    n = len(users)
    expected = {
        (a, b): (
            c, sup1[a], sup1[b],
            c * 1000000 // n, c * 1000000 // sup1[a],
            c * n * 1000 // (sup1[a] * sup1[b]),
        )
        for (a, b), c in both.items()
    }
    got = {
        (r.antecedent, r.consequent): (
            r.n_users_both, r.n_users_a, r.n_users_b,
            r.support_ppm, r.confidence_ppm, r.lift_milli,
        )
        for r in _rows(spark, sf_smoke, "sequential_pattern_mining")
    }
    assert got == expected


def test_fano_matches_bruteforce(spark, sf_smoke):
    """Fano factors equal the Python day-series replay (zero days
    included via the closed form)."""
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT event_type, CAST(date_trunc('day', ts) AS DATE), count(*)"
        f" FROM '{sf_smoke}/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    con.close()
    per = defaultdict(dict)
    for et, d, c in rows:
        per[et][d] = c
    expected = {}
    for et, days in per.items():
        k = (max(days) - min(days)).days + 1
        n = sum(days.values())
        ssq = sum(c * c for c in days.values())
        expected[et] = (
            n, len(days), k, n * 1000 // k,
            (k * ssq - n * n) * 1000 // (k * n),
        )
    got = {
        r.event_type: (r.n_events, r.n_active_days, r.n_days,
                       r.mean_milli, r.fano_milli)
        for r in _rows(spark, sf_smoke, "event_burstiness_fano")
    }
    assert got == expected


def test_did_matches_bruteforce(spark, sf_smoke):
    """The 2x2 cells and DiD estimate equal a Python replay."""
    import datetime
    import math

    from mapreduce_c_implementation_spark.operators.analytics import (
        DID_CUTOFF,
    )

    cutoff = datetime.datetime.fromisoformat(DID_CUTOFF)
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT user_id, event_type, ts, value"
        f" FROM '{sf_smoke}/events.parquet'"
    ).fetchall()
    con.close()
    errs = defaultdict(int)
    for u, et, ts, v in rows:
        if et == "error" and ts < cutoff:
            errs[u] += 1
    avg = sum(errs.values()) // len(errs)
    treated = {u for u, c in errs.items() if c > avg}
    cells = defaultdict(lambda: [0, 0])
    for u, et, ts, v in rows:
        if et != "purchase":
            continue
        key = (1 if u in treated else 0, 1 if ts >= cutoff else 0)
        cells[key][0] += 1
        cells[key][1] += math.floor(v * 100)
    mean = {k: s * 1000 // n for k, (n, s) in cells.items()}
    (r,) = _rows(spark, sf_smoke, "diff_in_differences_events")
    assert (
        r.n_treated_pre, r.n_treated_post, r.n_control_pre, r.n_control_post
    ) == (cells[(1, 0)][0], cells[(1, 1)][0], cells[(0, 0)][0],
          cells[(0, 1)][0])
    assert (
        r.treated_pre_milli, r.treated_post_milli,
        r.control_pre_milli, r.control_post_milli,
    ) == (mean[(1, 0)], mean[(1, 1)], mean[(0, 0)], mean[(0, 1)])
    assert r.did_milli == (
        mean[(1, 1)] - mean[(1, 0)] - mean[(0, 1)] + mean[(0, 0)]
    )


def test_f1_sweep_best_row_is_argmax(spark, sf_smoke):
    """Exactly the F1-argmax row (stricter threshold on ties) carries
    is_best, and the curve's TP/FP are monotone in the threshold."""
    rows = sorted(
        _rows(spark, sf_smoke, "f1_threshold_sweep"),
        key=lambda r: -r.threshold_bp,
    )
    best = max(rows, key=lambda r: (r.f1_ppm, r.threshold_bp))
    for r in rows:
        assert r.is_best == (1 if r is best else 0) or (
            (r.f1_ppm, r.threshold_bp) == (best.f1_ppm, best.threshold_bp)
        ) == bool(r.is_best)
    tps = [r.tp for r in rows]
    fps = [r.fp for r in rows]
    assert tps == sorted(tps) and fps == sorted(fps)
    assert sum(r.is_best for r in rows) == 1


def test_confident_learning_cells_are_consistent(spark, sf_smoke):
    """Joint cells partition the confident docs: per-label shares sum
    to ~1e6 and error cells are exactly the off-diagonals."""
    rows = _rows(spark, sf_smoke, "confident_learning_label_noise")
    assert rows, "confident joint must be non-empty"
    by_label = defaultdict(list)
    for r in rows:
        assert r.is_error_cell == (
            1 if r.label != r.confident_class else 0
        )
        by_label[r.label].append(r)
    for label, cells in by_label.items():
        total = sum(c.n_docs for c in cells)
        for c in cells:
            assert c.label_share_ppm == c.n_docs * 1000000 // total
