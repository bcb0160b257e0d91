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


TOKEN_RE = __import__("re").compile(r"([A-Za-z0-9]{1,255})[A-Za-z0-9]*")


def _tok(text: str) -> list[str]:
    return [m.group(1).lower() for m in TOKEN_RE.finditer(text)]


def test_association_rules_matches_bruteforce(spark, sf_smoke):
    """Rule table equals the Python Apriori brute force: distinct-part
    baskets, support floors, both directions, integer ppm floors."""
    from mapreduce_c_implementation_spark.operators.analytics import (
        ARULE_MIN_ITEM_ORDERS,
        ARULE_MIN_PAIR_ORDERS,
    )

    con = duckdb.connect()
    try:
        li = con.sql(
            f"SELECT DISTINCT l_orderkey, l_partkey FROM '{sf_smoke}/lineitem.parquet'"
        ).fetchall()
        n_baskets = con.sql(
            f"SELECT count(DISTINCT l_orderkey) FROM '{sf_smoke}/lineitem.parquet'"
        ).fetchone()[0]
    finally:
        con.close()
    baskets = defaultdict(set)
    item_n = defaultdict(int)
    for o, p in li:
        baskets[o].add(p)
        item_n[p] += 1
    freq = {p for p, n in item_n.items() if n >= ARULE_MIN_ITEM_ORDERS}
    pair_n = defaultdict(int)
    for parts in baskets.values():
        fs = sorted(p for p in parts if p in freq)
        for i, pa in enumerate(fs):
            for pb in fs[i + 1 :]:
                pair_n[(pa, pb)] += 1
    expected = set()
    for (pa, pb), np_ in pair_n.items():
        if np_ < ARULE_MIN_PAIR_ORDERS:
            continue
        for a, b in [(pa, pb), (pb, pa)]:
            na, nb = item_n[a], item_n[b]
            expected.add(
                (a, b, na, nb, np_,
                 np_ * 1000000 // na,
                 np_ * n_baskets * 1000000 // (na * nb))
            )
    got = {
        (r.antecedent, r.consequent, r.n_ante, r.n_cons, r.n_pair,
         r.confidence_ppm, r.lift_ppm)
        for r in _rows(spark, sf_smoke, "association_rules_parts")
    }
    assert got == expected
    assert expected, "fixture must contain frequent pairs"


def test_ndcg_matches_bruteforce(spark, sf_smoke):
    """Per-query nDCG/MRR equals a Python replay with the exact same
    fold-order dot products and HALF_UP round-6 cosines."""
    from decimal import ROUND_HALF_UP, Decimal

    from mapreduce_c_implementation_spark.operators.similarity import (
        _NDCG_PREFIX,
        N_QUERIES,
        NDCG_DISC_MICRO,
        NDCG_K,
    )

    con = duckdb.connect()
    try:
        vecs = con.sql(
            f"SELECT vec_id, embedding, label FROM '{sf_smoke}/embeddings.parquet'"
        ).fetchall()
    finally:
        con.close()

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + float(x) * float(y)
        return acc

    norms = {v: dot(e, e) ** 0.5 for v, e, _ in vecs}
    expected = {}
    for qv, qe, ql in vecs:
        if qv >= N_QUERIES:
            continue
        scored = []
        for cv, ce, cl in vecs:
            if cv == qv:
                continue
            cos = dot(qe, ce) / (norms[qv] * norms[cv])
            cos6 = float(
                Decimal(repr(cos)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
            )
            rel = 2 if cl == ql else (1 if abs(cl - ql) == 1 else 0)
            scored.append((-cos6, cv, rel))
        scored.sort()
        topk = scored[:NDCG_K]
        gain = {2: 3, 1: 1, 0: 0}
        dcg = sum(gain[r] * NDCG_DISC_MICRO[i] for i, (_, _, r) in enumerate(topk))
        first = next((i + 1 for i, (_, _, r) in enumerate(topk) if r > 0), None)
        n2 = sum(1 for _, _, r in scored if r == 2)
        n1 = sum(1 for _, _, r in scored if r == 1)
        p2 = _NDCG_PREFIX[min(n2, NDCG_K)]
        p21 = _NDCG_PREFIX[min(n2 + n1, NDCG_K)]
        idcg = 3 * p2 + (p21 - p2)
        expected[qv] = (
            dcg,
            idcg,
            dcg * 1000000 // idcg if idcg > 0 else 0,
            1000000 // first if first else 0,
            sum(1 for _, _, r in topk if r > 0),
        )
    got = {
        r.query_id: (r.dcg_micro, r.idcg_micro, r.ndcg_ppm, r.mrr_micro,
                     r.n_rel_at_k)
        for r in _rows(spark, sf_smoke, "ndcg_ranking_eval")
    }
    assert got == expected
    assert all(v[0] <= v[1] for v in got.values())  # DCG <= IDCG


def test_generation_cer_matches_bruteforce(spark, sf_smoke):
    """CER rows equal a Python levenshtein replay on a doc sample."""
    from mapreduce_c_implementation_spark.operators.textanalysis import (
        CER_DROP_MOD,
    )

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    docs = _docs(sf_smoke)
    got = {r.doc_id: r for r in _rows(spark, sf_smoke, "generation_cer_eval")}
    sample = sorted(docs)[::20][:25]
    checked = 0
    for doc_id in sample:
        ts = _tok(docs[doc_id])
        if not ts:
            assert doc_id not in got
            continue
        ref = " ".join(ts)
        gen = " ".join(t for i, t in enumerate(ts, 1) if i % CER_DROP_MOD != 0)
        d = lev(gen, ref)
        r = got[doc_id]
        assert (r.ref_len, r.lev_dist, r.cer_ppm) == (
            len(ref), d, d * 1000000 // len(ref)
        ), doc_id
        checked += 1
    assert checked >= 20


def test_brier_decomposition_matches_bruteforce(spark, sf_smoke):
    """All four decomposition terms equal the Python integer replay,
    and the Murphy identity holds up to binning/floor residue."""
    import duckdb as _dd

    from mapreduce_c_implementation_spark.operators.textanalysis import (
        CAL_BIN_BP,
        CAL_NBINS,
        LANG_PROFILES,
    )

    con = _dd.connect()
    try:
        rows = con.sql(
            f"SELECT doc_id, text, lang FROM '{sf_smoke}/documents.parquet'"
        ).fetchall()
    finally:
        con.close()
    stop = set(LANG_PROFILES["en"])
    pts = []
    for _, text, lang in rows:
        ts = _tok(text)
        if not ts:
            continue
        score_bp = len(set(ts) & stop) * 10000 // len(ts)
        pts.append((1 if lang == "en" else 0, score_bp))
    n = len(pts)
    npos = sum(y for y, _ in pts)
    sdd = sum((s - 10000 * y) ** 2 for y, s in pts)
    bins = defaultdict(lambda: [0, 0, 0])
    for y, s in pts:
        b = bins[min(s // CAL_BIN_BP, CAL_NBINS - 1)]
        b[0] += 1
        b[1] += s
        b[2] += y
    base_ppm = npos * 1000000 // n
    rel = sum(
        (sk * 100 // nk - hk * 1000000 // nk) ** 2 * nk
        for nk, sk, hk in bins.values()
    ) // (1000000 * n)
    res = sum(
        (hk * 1000000 // nk - base_ppm) ** 2 * nk
        for nk, sk, hk in bins.values()
    ) // (1000000 * n)
    unc = npos * (n - npos) * 1000000 // (n * n)
    brier = sdd // (100 * n)
    (r,) = _rows(spark, sf_smoke, "brier_score_decomposition")
    assert (r.n, r.n_pos, r.brier_ppm, r.reliability_ppm,
            r.resolution_ppm, r.uncertainty_ppm) == (n, npos, brier, rel, res, unc)
    # Murphy identity up to within-bin variance + flooring residue
    assert abs(r.brier_ppm - (r.reliability_ppm - r.resolution_ppm
                              + r.uncertainty_ppm)) < 30000


def test_paired_bootstrap_matches_bruteforce(spark, sf_smoke):
    """Replicate weighting, sign counts, and the p-value equal a Python
    md5 replay of the deterministic Poisson machinery."""
    import hashlib

    from mapreduce_c_implementation_spark.operators.sampling import (
        _BOOT_SCALE,
        BOOT_CDF_THRESHOLDS,
        PB_REPLICATES,
    )
    from mapreduce_c_implementation_spark.operators.textanalysis import (
        LANG_PROFILES,
    )

    docs = _docs(sf_smoke)
    stop = set(LANG_PROFILES["en"])
    deltas = {}
    for doc_id, text in docs.items():
        ts = _tok(text)
        if not ts:
            continue
        a = len(set(ts)) * 1000000 // len(ts)
        b = sum(1 for t in ts if t not in stop) * 1000000 // len(ts)
        deltas[doc_id] = a - b

    def weight(doc_id, r):
        u = int(
            hashlib.md5(f"{doc_id}:{r}".encode()).hexdigest()[:6], 16
        ) % _BOOT_SCALE
        for w, t in enumerate(BOOT_CDF_THRESHOLDS):
            if u < t:
                return w
        return 5

    swd = [
        sum(weight(d, r) * dd for d, dd in deltas.items())
        for r in range(PB_REPLICATES)
    ]
    sd = sum(deltas.values())
    n_le = sum(1 for s in swd if s <= 0)
    n_ge = sum(1 for s in swd if s >= 0)
    (r,) = _rows(spark, sf_smoke, "paired_bootstrap_significance")
    assert r.n_docs == len(deltas)
    assert r.b == PB_REPLICATES
    assert r.point_sign == (1 if sd > 0 else -1 if sd < 0 else 0)
    assert r.point_abs_mean_ppm == abs(sd) // len(deltas)
    assert r.n_pos == sum(1 for s in swd if s > 0)
    assert r.n_neg == sum(1 for s in swd if s < 0)
    assert r.p_two_sided_milli == min(
        1000, 2 * min(n_le, n_ge) * 1000 // PB_REPLICATES
    )


def _daily_cents(sf_dir):
    con = duckdb.connect()
    try:
        return dict(
            con.sql(
                f"""SELECT date_diff('day', DATE '1970-01-01',
                                     CAST(date_trunc('day', ts) AS DATE)),
                           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                    FROM '{sf_dir}/events.parquet' GROUP BY 1"""
            ).fetchall()
        )
    finally:
        con.close()


def test_autocorrelation_matches_bruteforce(spark, sf_smoke):
    """Per-lag power sums and the signed r^2 ppm equal a Python replay
    over the day-grain series."""
    from mapreduce_c_implementation_spark.operators.timeseries import (
        ACF_MAX_LAG,
        ACF_V_UNIT,
    )

    daily = {x: c // ACF_V_UNIT for x, c in _daily_cents(sf_smoke).items()}
    expected = {}
    for lag in range(1, ACF_MAX_LAG + 1):
        pairs = [
            (daily[x], daily[x + lag]) for x in daily if x + lag in daily
        ]
        n = len(pairs)
        sx = sum(a for a, _ in pairs)
        sy = sum(b for _, b in pairs)
        sxx = sum(a * a for a, _ in pairs)
        syy = sum(b * b for _, b in pairs)
        sxy = sum(a * b for a, b in pairs)
        num = n * sxy - sx * sy
        den = (n * sxx - sx * sx) * (n * syy - sy * sy)
        sign = 0 if den <= 0 else (1 if num > 0 else -1 if num < 0 else 0)
        r2 = num * num * 1000000 // den if den > 0 else 0
        expected[lag] = (n, sign, r2)
    got = {
        r.lag: (r.n_pairs, r.r_sign, r.r2_ppm)
        for r in _rows(spark, sf_smoke, "autocorrelation_daily_values")
    }
    assert got == expected
    assert len(got) == ACF_MAX_LAG


def test_theil_sen_matches_bruteforce(spark, sf_smoke):
    """Slope/intercept medians equal the Python pairwise replay with
    true floor-divided integer slopes (Python // IS floor — the exact
    semantics the engines' sign/abs split reproduces)."""
    from mapreduce_c_implementation_spark.operators.robust_stats import (
        TS_SLOPE_SCALE,
    )

    daily = _daily_cents(sf_smoke)
    xs = sorted(daily)
    slopes = []
    for i, xi in enumerate(xs):
        for xj in xs[i + 1 :]:
            dy, dx = daily[xj] - daily[xi], xj - xi
            m = (dy * TS_SLOPE_SCALE) // dx
            slopes.append((m, xi, xj))
    slopes.sort()
    med_m = slopes[(len(slopes) - 1) // 2][0]
    resid = sorted(
        (daily[x] * TS_SLOPE_SCALE - med_m * x, x) for x in xs
    )
    med_b = resid[(len(resid) - 1) // 2][0]
    (r,) = _rows(spark, sf_smoke, "theil_sen_daily_trend")
    assert (r.n_days, r.n_pairs, r.slope_milli, r.intercept_milli) == (
        len(xs), len(slopes), med_m, med_b
    )


def test_exact_trim_rewrite_matches_bruteforce(spark, sf_smoke):
    """Trimmed md5 / cut stats equal a Python rebuild from the exact
    brute-force spans, for every document."""
    import hashlib

    docs = _docs(sf_smoke)
    marks = defaultdict(list)
    for gram, members in _suffix_buckets(docs).items():
        if len({d for d, _, _ in members}) >= 2:
            for doc_id, pos, _ in members:
                marks[doc_id].append(pos)
    spans = defaultdict(list)
    for doc_id, positions in marks.items():
        positions.sort()
        start, end = None, None
        for p in positions:
            if start is None or p > end:
                if start is not None:
                    spans[doc_id].append((start, end))
                start = p
            end = p + SUFFIX_MINLEN
        spans[doc_id].append((start, end))
    got = {r.doc_id: r for r in _rows(spark, sf_smoke, "substring_exact_trim_rewrite")}
    assert set(got) == set(docs)
    for doc_id, text in docs.items():
        ss = spans.get(doc_id, [])
        kept = ""
        prev_end = 1
        for s, e in ss:
            kept += text[prev_end - 1 : s - 1]
            prev_end = e
        kept += text[prev_end - 1 :]
        r = got[doc_id]
        assert r.n_cut_spans == len(ss), doc_id
        assert r.n_cut_chars == sum(e - s for s, e in ss), doc_id
        assert r.kept_chars == len(text) - sum(e - s for s, e in ss), doc_id
        assert r.trimmed_md5 == hashlib.md5(kept.encode()).hexdigest(), doc_id


def _vecs(sf_dir):
    con = duckdb.connect()
    try:
        return con.sql(
            f"SELECT vec_id, embedding, label FROM '{sf_dir}/embeddings.parquet'"
        ).fetchall()
    finally:
        con.close()


def _fold_dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def _round6(x: float) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def test_knn_classification_matches_bruteforce(spark, sf_smoke):
    """Confusion table equals the Python replay: top-5 cosine vote over
    the held-out corpus, ties to the smaller label/id."""
    from collections import Counter

    from mapreduce_c_implementation_spark.operators.similarity import (
        KNN_K,
        KNN_N_QUERIES,
    )

    vecs = _vecs(sf_smoke)
    norms = {v: _fold_dot(e, e) ** 0.5 for v, e, _ in vecs}
    confusion = Counter()
    for qv, qe, ql in vecs:
        if qv >= KNN_N_QUERIES:
            continue
        scored = sorted(
            (-_round6(_fold_dot(qe, ce) / (norms[qv] * norms[cv])), cv, cl)
            for cv, ce, cl in vecs
            if cv >= KNN_N_QUERIES
        )[:KNN_K]
        votes = Counter(cl for _, _, cl in scored)
        pred = min(votes, key=lambda l: (-votes[l], l))
        confusion[(ql, pred)] += 1
    got = {
        (r.true_label, r.pred_label): (r.n, r.n_correct)
        for r in _rows(spark, sf_smoke, "knn_classification_eval")
    }
    expected = {
        (t, p): (n, n if t == p else 0) for (t, p), n in confusion.items()
    }
    assert got == expected
    assert sum(n for n, _ in got.values()) == KNN_N_QUERIES


def test_kcenter_matches_bruteforce(spark, sf_smoke):
    """Selection trace equals the Python farthest-point traversal with
    the same fold-order distances."""
    from mapreduce_c_implementation_spark.operators.similarity import K_CENTERS

    vecs = _vecs(sf_smoke)
    n2 = {v: _fold_dot(e, e) for v, e, _ in vecs}
    emb = {v: e for v, e, _ in vecs}
    chosen = [min(emb)]
    md = {}
    trace = [(0, chosen[0], 0.0)]
    for r in range(1, K_CENTERS):
        c = chosen[-1]
        for v in emb:
            dist = n2[v] + n2[c] - 2.0 * _fold_dot(emb[v], emb[c])
            md[v] = dist if v not in md else min(md[v], dist)
        best = max(emb, key=lambda v: (md[v], -v))
        chosen.append(best)
        trace.append((r, best, _round6(md[best])))
    got = sorted(
        (r.round, r.vec_id, r.min_dist_r6)
        for r in _rows(spark, sf_smoke, "kcenter_greedy_coreset")
    )
    assert got == sorted(trace)
    # maximin property: coverage radius is non-increasing
    dists = [d for _, _, d in got[1:]]
    assert dists == sorted(dists, reverse=True)


def test_cdc_chunk_dedup_matches_bruteforce(spark, sf_smoke):
    """Doc rollups equal the Python CDC replay (BYTE-indexed boundaries,
    hex digests, (doc_id, s)-struct owner rule), and chunks tile each
    payload exactly."""
    import hashlib

    from mapreduce_c_implementation_spark.operators.multimodal import (
        CDC_GRAM,
        CDC_MOD,
    )

    docs = _docs(sf_smoke)
    occ = []
    for doc_id, text in docs.items():
        payload = text.encode("utf-8")
        n = len(payload)
        bounds = [1]
        for i in range(2, n - CDC_GRAM + 2):
            window_hex = payload[i - 1 : i - 1 + CDC_GRAM].hex().upper()
            h = int(hashlib.md5(window_hex.encode()).hexdigest()[:4], 16)
            if h % CDC_MOD == 0:
                bounds.append(i)
        bounds.append(n + 1)
        for s, e in zip(bounds, bounds[1:]):
            chunk_hex = payload[s - 1 : e - 1].hex().upper()
            occ.append(
                (doc_id, s, e - s,
                 hashlib.md5(chunk_hex.encode()).hexdigest())
            )
        assert sum(e - s for s, e in zip(bounds, bounds[1:])) == n
    owners, copies = {}, defaultdict(int)
    for doc_id, s, ln, dig in occ:
        copies[dig] += 1
        key = (doc_id, s)
        owners[dig] = min(owners.get(dig, key), key)
    expected = {}
    for doc_id, s, ln, dig in occ:
        e = expected.setdefault(doc_id, [0, 0, 0, 0])
        e[0] += 1
        e[1] += ln
        e[2] += 1 if copies[dig] > 1 else 0
        e[3] += ln if (doc_id, s) != owners[dig] else 0
    got = {
        r.doc_id: [r.n_chunks, r.payload_bytes, r.n_dup_chunks,
                   r.reclaimable_bytes]
        for r in _rows(spark, sf_smoke, "multimodal_cdc_chunk_dedup")
    }
    assert got == expected
    assert any(e[3] > 0 for e in expected.values()), "fixture must dedup bytes"


def test_negative_sampling_table_matches_bruteforce(spark, sf_smoke):
    """Smoothed weights, cumulative ranges, and ppm probabilities equal
    the Python replay (sqrt-exact 3/4 power, integer freezes)."""
    import math

    from mapreduce_c_implementation_spark.operators.sampling import (
        NEG_SMOOTH_SCALE,
    )

    docs = _docs(sf_smoke)
    counts = defaultdict(int)
    for text in docs.values():
        for t in _tok(text):
            counts[t] += 1
    weights = {
        t: math.floor(NEG_SMOOTH_SCALE * math.sqrt(c * math.sqrt(c)))
        for t, c in counts.items()
    }
    total = sum(weights.values())
    expected, cum = {}, 0
    for t in sorted(weights):
        expected[t] = (counts[t], weights[t], cum, weights[t] * 1000000 // total)
        cum += weights[t]
    got = {
        r.token: (r.cnt, r.weight_milli, r.cum_before_milli, r.prob_ppm)
        for r in _rows(spark, sf_smoke, "negative_sampling_table")
    }
    assert got == expected
    # ranges tile [0, total): every token's range starts where the
    # previous ends
    assert cum == total
