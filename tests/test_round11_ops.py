"""Semantic contracts for the round-11 operators — intent checks the
cross-engine oracle diff (tests/test_operators_vs_oracle.py) cannot see:
the oracle proves Spark == DuckDB, these prove both equal the SPEC.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

from mapreduce_c_implementation_spark.registry import get_operator
from tests.test_property_tokenizer import reference_map


def _rows(spark, sf_dir, name):
    return get_operator(name).query_fn(spark, sf_dir).collect()


def _docs(sf_dir):
    con = duckdb.connect()
    try:
        return con.sql(
            f"SELECT doc_id, lang, text FROM '{sf_dir}/documents.parquet'"
            " ORDER BY doc_id"
        ).fetchall()
    finally:
        con.close()


_F1_STOPS = {"the", "a", "and", "of", "to", "is", "fast", "slow"}


def _scored(sf_dir):
    """(doc_id, y, score_bp) replay of the shared eval construction."""
    out = []
    for doc_id, lang, text in _docs(sf_dir):
        ts = reference_map(text)
        if not ts:
            continue
        n_stop = len(set(ts) & _F1_STOPS)
        score = 10000 - n_stop * 10000 // len(ts)
        out.append((doc_id, 1 if lang == "en" else 0, score))
    return out


def test_roc_auc_matches_bruteforce_pairs(spark, sf_smoke):
    """AUC from the rank-sum identity must equal the O(n^2) pair count:
    (correct pairs + ties/2) / (n_pos * n_neg)."""
    scored = _scored(sf_smoke)
    pos = [s for _, y, s in scored if y == 1]
    neg = [s for _, y, s in scored if y == 0]
    num2 = 0  # doubled: win = 2, tie = 1
    for p in pos:
        for q in neg:
            if p > q:
                num2 += 2
            elif p == q:
                num2 += 1
    (row,) = _rows(spark, sf_smoke, "roc_auc_rank_exact")
    assert row.n_pos == len(pos) and row.n_neg == len(neg)
    assert row.auc_num2 == num2
    assert row.auc_ppm == num2 * 1_000_000 // (2 * len(pos) * len(neg))
    assert row.gini_ppm == num2 * 1_000_000 // (len(pos) * len(neg)) - 1_000_000


def test_average_precision_matches_bruteforce(spark, sf_smoke):
    """AP replay under the pinned order (score DESC, doc_id ASC) with the
    scaled-integer term formula."""
    scored = sorted(_scored(sf_smoke), key=lambda t: (-t[2], t[0]))
    ap_sum, cum_pos = 0, 0
    for k, (_, y, _) in enumerate(scored, start=1):
        cum_pos += y
        if y == 1:
            ap_sum += cum_pos * 10**12 // k
    n_pos = sum(y for _, y, _ in scored)
    (row,) = _rows(spark, sf_smoke, "average_precision_eval")
    assert row.n_pos == n_pos and row.n_total == len(scored)
    assert row.ap_ppm == ap_sum // (n_pos * 1_000_000)


def test_mcnemar_cells_match_bruteforce(spark, sf_smoke):
    from mapreduce_c_implementation_spark.operators.textanalysis import (
        _MCN_A_BP,
        _MCN_B_BP,
    )

    b = c = n = acc_a = acc_b = 0
    for _, lang, text in _docs(sf_smoke):
        ts = reference_map(text)
        if not ts:
            continue
        y = 1 if lang == "en" else 0
        score = 10000 - len(set(ts) & _F1_STOPS) * 10000 // len(ts)
        pa = 1 if score >= _MCN_A_BP else 0
        pb = 1 if len(set(ts)) * 10000 // len(ts) >= _MCN_B_BP else 0
        n += 1
        acc_a += pa == y
        acc_b += pb == y
        if pa == y and pb != y:
            b += 1
        if pa != y and pb == y:
            c += 1
    (row,) = _rows(spark, sf_smoke, "mcnemar_paired_eval")
    assert (row.n, row.b_only_a, row.c_only_b) == (n, b, c)
    assert (row.acc_a_n, row.acc_b_n) == (acc_a, acc_b)
    assert row.chi2_ppm == (
        (b - c) ** 2 * 1_000_000 // (b + c) if b + c else 0
    )


def test_bleu_components_match_bruteforce(spark, sf_smoke):
    """Clipped n-gram matches replayed in Python for every doc."""
    from mapreduce_c_implementation_spark.operators.textanalysis import (
        CER_DROP_MOD,
    )

    got = {r.doc_id: r for r in _rows(spark, sf_smoke, "bleu_ngram_component_eval")}
    checked = 0
    for doc_id, _, text in _docs(sf_smoke):
        ref = reference_map(text)
        if not ref:
            assert doc_id not in got
            continue
        gen = [t for i, t in enumerate(ref, start=1) if i % CER_DROP_MOD != 0]
        r = got[doc_id]
        assert (r.r_len, r.c_len) == (len(ref), len(gen))
        for n in (1, 2, 3, 4):
            rg = Counter(tuple(ref[i : i + n]) for i in range(len(ref) - n + 1))
            gg = Counter(tuple(gen[i : i + n]) for i in range(len(gen) - n + 1))
            m = sum(min(cnt, gg[g]) for g, cnt in rg.items())
            assert getattr(r, f"m{n}") == m, (doc_id, n)
            assert getattr(r, f"g{n}") == max(len(gen) - n + 1, 0)
        checked += 1
    assert checked > 100


def test_friedman_rank_sums_close_over_blocks(spark, sf_correct):
    """In a complete design the doubled rank sums must total
    n_days * k * (k + 1) exactly, and every treatment shares n_days."""
    from mapreduce_c_implementation_spark.operators.robust_stats import (
        FRIEDMAN_K,
    )

    rows = _rows(spark, sf_correct, "friedman_test_daily")
    assert len(rows) == FRIEDMAN_K
    n_days = {r.n_days for r in rows}
    assert len(n_days) == 1
    n = n_days.pop()
    assert sum(r.rank2_sum for r in rows) == n * FRIEDMAN_K * (FRIEDMAN_K + 1)
    assert len({r.chi2_ppm for r in rows}) == 1


def test_kendall_matches_bruteforce_replay(spark, sf_correct):
    """Full Python replay: token counts per source, top-K head under the
    pinned order, pairwise concordance census.  (The fixture vocabulary
    is smaller than K, so the head is the whole joint vocabulary.)"""
    from mapreduce_c_implementation_spark.operators.robust_stats import (
        KT_SRC_A,
        KT_SRC_B,
        KT_TOPK,
    )

    con = duckdb.connect()
    docs = con.sql(
        f"SELECT source, text FROM '{sf_correct}/documents.parquet'"
        f" WHERE source IN ('{KT_SRC_A}', '{KT_SRC_B}')"
    ).fetchall()
    con.close()
    a_cnt, b_cnt = Counter(), Counter()
    for source, text in docs:
        (a_cnt if source == KT_SRC_A else b_cnt).update(reference_map(text))
    terms = sorted(
        set(a_cnt) | set(b_cnt),
        key=lambda t: (-(a_cnt[t] + b_cnt[t]), t),
    )[:KT_TOPK]
    con_n = dis = tie_a = tie_b = tie_ab = 0
    for i, t1 in enumerate(terms):
        for t2 in terms[i + 1 :]:
            # census is symmetric under pair swap, so the head order works
            da, db = a_cnt[t1] - a_cnt[t2], b_cnt[t1] - b_cnt[t2]
            if da == 0 and db == 0:
                tie_ab += 1
            elif da == 0:
                tie_a += 1
            elif db == 0:
                tie_b += 1
            elif da * db > 0:
                con_n += 1
            else:
                dis += 1
    (row,) = _rows(spark, sf_correct, "kendall_tau_topk_terms")
    v = len(terms)
    assert row.n_pairs == v * (v - 1) // 2
    assert (row.concordant, row.discordant) == (con_n, dis)
    assert (row.ties_a, row.ties_b, row.ties_both) == (tie_a, tie_b, tie_ab)
    sign = 1 if con_n >= dis else -1
    assert row.tau_a_ppm == sign * (
        abs(con_n - dis) * 1_000_000 // row.n_pairs
    )


def test_clustering_coefficient_reconciles_with_triangles(spark, sf_correct):
    cc = {r.n_name: r for r in _rows(spark, sf_correct, "graph_clustering_coefficient")}
    tri = {
        r.n_name: r.n_triangles
        for r in _rows(spark, sf_correct, "graph_triangle_count")
    }
    assert set(cc) == set(tri)
    for name, r in cc.items():
        assert r.n_triangles == tri[name]
        assert 0 <= r.cc_ppm <= 1_000_000
        if r.degree >= 2:
            assert r.cc_ppm == 2 * r.n_triangles * 1_000_000 // (
                r.degree * (r.degree - 1)
            )
        else:
            assert r.cc_ppm == 0


def _luhn_ok(s: str) -> bool:
    tot = 0
    for i, ch in enumerate(reversed(s)):
        v = int(ch)
        if i % 2 == 1:
            v = v * 2
            if v > 9:
                v -= 9
        tot += v
    return tot % 10 == 0


def test_luhn_screen_matches_python_replay(spark, sf_smoke):
    from mapreduce_c_implementation_spark.operators.corpus_filters import (
        _LUHN_PANS,
    )

    got = {r.doc_id: r for r in _rows(spark, sf_smoke, "luhn_checksum_pii_screen")}
    for doc_id, _, _text in _docs(sf_smoke):
        pans = [_LUHN_PANS[doc_id % 6]]
        if doc_id % 5 == 0:
            pans.append(_LUHN_PANS[(doc_id + 2) % 6])
        r = got[doc_id]
        assert r.n_candidates == len(pans)
        assert r.n_luhn_valid == sum(_luhn_ok(p) for p in pans)
        assert r.has_pan == (1 if r.n_luhn_valid > 0 else 0)


def test_oof_encoding_excludes_own_fold(spark, sf_smoke):
    """Python replay: each (segment, fold) encoding must be computable
    from the OTHER folds' sums alone."""
    from mapreduce_c_implementation_spark.operators.features import (
        TE_OOF_FOLDS,
        TE_SMOOTH_M,
    )

    con = duckdb.connect()
    cust = con.sql(
        f"SELECT c_custkey, c_mktsegment, CAST(round(c_acctbal * 100) AS BIGINT)"
        f" FROM '{sf_smoke}/customer.parquet'"
    ).fetchall()
    con.close()

    def tdiv(u, m):  # trunc toward zero
        q = abs(u) // m
        return q if u >= 0 else -q

    seg_fold = defaultdict(lambda: [0, 0])
    fold_tot = defaultdict(lambda: [0, 0])
    g = [0, 0]
    for k, seg, cents in cust:
        f = k % TE_OOF_FOLDS
        for acc in (seg_fold[(seg, f)], fold_tot[f], g):
            acc[0] += 1
            acc[1] += cents
    seg_tot = defaultdict(lambda: [0, 0])
    for (seg, _f), (n, s) in seg_fold.items():
        seg_tot[seg][0] += n
        seg_tot[seg][1] += s
    rows = _rows(spark, sf_smoke, "feature_target_encode_oof")
    assert len(rows) == len(cust)
    for r in rows:
        f = r.fold
        gmean = tdiv(g[1] - fold_tot[f][1], g[0] - fold_tot[f][0])
        n_cf, s_cf = seg_fold[(r.c_mktsegment, f)]
        n_c, s_c = seg_tot[r.c_mktsegment]
        assert r.gmean_oof == gmean
        assert r.enc_cents == tdiv(
            s_c - s_cf + TE_SMOOTH_M * gmean, n_c - n_cf + TE_SMOOTH_M
        )


def test_fk_discovery_true_fks_fully_contained(spark, sf_correct):
    rows = {r.child_col: r for r in _rows(spark, sf_correct, "fk_candidate_discovery")}
    for child in (
        "lineitem.l_orderkey",
        "lineitem.l_partkey",
        "lineitem.l_suppkey",
        "orders.o_custkey",
    ):
        assert rows[child].containment_ppm == 1_000_000, child
        assert rows[child].n_contained == rows[child].n_child_distinct
    # the reversed direction is a strict subset check (orders without
    # lineitems exist in the fixture) and must NOT read as an FK
    assert rows["orders.o_orderkey"].containment_ppm < 1_000_000


def test_holt_matches_python_recursion(spark, sf_smoke):
    import math

    con = duckdb.connect()
    daily = con.sql(
        f"""SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, count(*)
        FROM '{sf_smoke}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"""
    ).fetchall()
    con.close()
    series = defaultdict(dict)
    for et, d, c in daily:
        series[et][d] = c
    expect = {}
    for et, days in series.items():
        d0, d1 = min(days), max(days)
        spine = []
        d = d0
        while d <= d1:
            spine.append((d, days.get(d, 0)))
            d = type(d).fromordinal(d.toordinal() + 1)
        lvl, trend = float(spine[0][1]), 0.0
        expect[(et, str(spine[0][0]))] = (
            math.floor(lvl * 1000),
            0,
            math.floor(lvl * 1000),
        )
        for d, c in spine[1:]:
            fc = lvl + trend
            new_l = (float(c) + (lvl + trend)) * 0.5
            trend = (new_l - lvl) * 0.25 + trend * 0.75
            lvl = new_l
            expect[(et, str(d))] = (
                math.floor(lvl * 1000),
                math.floor(trend * 1000),
                math.floor(fc * 1000),
            )
    rows = _rows(spark, sf_smoke, "holt_linear_daily")
    assert len(rows) == len(expect)
    for r in rows:
        lm, tm, fm = expect[(r.event_type, r.day)]
        assert (r.level_milli, r.trend_milli, r.forecast_milli) == (lm, tm, fm)
        assert r.resid_milli == r.n * 1000 - fm


def test_asof_binned_horizon_and_miss_semantics(spark, sf_smoke):
    """Python replay: in-horizon true matches must be reported exactly;
    pre-horizon true matches must flag missed_earlier."""
    from mapreduce_c_implementation_spark.operators.joins import (
        ASOF_BIN_DAYS,
    )

    con = duckdb.connect()
    ref = con.sql(
        f"""SELECT o_custkey, o_orderdate, max(o_totalprice)
        FROM '{sf_smoke}/orders.parquet' GROUP BY 1, 2"""
    ).fetchall()
    con.close()
    hist = defaultdict(list)
    for k, d, p in ref:
        hist[k].append((d, p))
    for k in hist:
        hist[k].sort()
    rows = _rows(spark, sf_smoke, "join_asof_binned")
    n_missed = n_hit = 0
    for r in rows:
        past = [(d, p) for d, p in hist.get(r.user_id, []) if d <= r.ts]
        if not past:
            assert r.asof_orderdate is None and r.missed_earlier == 0
            continue
        true_d, true_p = past[-1]
        pb = (r.ts.date().toordinal() - 719163) // ASOF_BIN_DAYS
        horizon_day = (pb - 1) * ASOF_BIN_DAYS
        if (true_d.date().toordinal() - 719163) >= horizon_day:
            assert r.asof_orderdate == true_d and r.asof_totalprice == true_p
            assert r.missed_earlier == 0
            n_hit += 1
        else:
            assert r.asof_orderdate is None and r.missed_earlier == 1
            n_missed += 1
    assert n_hit > 0 and n_missed > 0  # both branches exercised


def test_maxsim_matches_python_replay(spark, sf_smoke):
    """Brute-force MaxSim over the sub-vector grid in Python."""
    import math

    from mapreduce_c_implementation_spark.operators.similarity import (
        MAXSIM_QUERIES,
        MAXSIM_SUBDIM,
        MAXSIM_SUBS,
        MAXSIM_TOPK,
    )

    con = duckdb.connect()
    vecs = dict(
        con.sql(
            f"SELECT vec_id, embedding FROM '{sf_smoke}/embeddings.parquet'"
        ).fetchall()
    )
    con.close()

    def subs(v):
        return [
            v[i * MAXSIM_SUBDIM : (i + 1) * MAXSIM_SUBDIM]
            for i in range(MAXSIM_SUBS)
        ]

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    expect = {}
    for qid in range(MAXSIM_QUERIES):
        qs = subs(vecs[qid])
        scored = []
        for cid, cv in vecs.items():
            if cid == qid:
                continue
            cs = subs(cv)
            s = sum(max(dot(q, c) for c in cs) for q in qs)
            scored.append((-math.floor(s * 1000), cid))
        scored.sort()
        for rnk, (neg_s, cid) in enumerate(scored[:MAXSIM_TOPK], start=1):
            expect[(qid, cid)] = (rnk, -neg_s)
    rows = _rows(spark, sf_smoke, "maxsim_late_interaction_topk")
    assert len(rows) == len(expect)
    for r in rows:
        rnk, s = expect[(r.query_id, r.neighbor_id)]
        assert (r.rnk, r.score_milli) == (rnk, s)


def test_widest_path_matches_python_relaxation(spark, sf_smoke):
    """Python replay of the backbone build + max-min relaxation."""
    from mapreduce_c_implementation_spark.operators.graph import (
        BFS_NODE_DEGREE,
        WP_INIT,
        WP_ITERS,
        WP_SOURCE,
    )

    con = duckdb.connect()
    sf = sf_smoke
    edges = con.sql(
        f"""SELECT least(c.c_nationkey, s.s_nationkey) AS u,
               greatest(c.c_nationkey, s.s_nationkey) AS v, count(*) AS w
        FROM '{sf}/lineitem.parquet' l
        JOIN '{sf}/orders.parquet' o ON o.o_orderkey = l.l_orderkey
        JOIN '{sf}/customer.parquet' c ON c.c_custkey = o.o_custkey
        JOIN '{sf}/supplier.parquet' s ON s.s_suppkey = l.l_suppkey
        WHERE c.c_nationkey <> s.s_nationkey GROUP BY 1, 2"""
    ).fetchall()
    names = dict(
        con.sql(
            f"SELECT n_nationkey, n_name FROM '{sf}/nation.parquet'"
        ).fetchall()
    )
    con.close()
    inc = defaultdict(list)
    for u, v, w in edges:
        inc[u].append((w, v))
        inc[v].append((w, u))
    kept = {}
    for a, lst in inc.items():
        for w, b in sorted(lst, key=lambda t: (-t[0], t[1]))[:BFS_NODE_DEGREE]:
            key = (min(a, b), max(a, b))
            kept[key] = max(kept.get(key, 0), w)
    width = {WP_SOURCE: WP_INIT}
    for _ in range(WP_ITERS):
        new = dict(width)
        for (u, v), w in kept.items():
            for a, b in ((u, v), (v, u)):
                if a in width:
                    cand = min(width[a], w)
                    if cand > new.get(b, 0):
                        new[b] = cand
        if new == width:
            break
        width = new
    rows = _rows(spark, sf_smoke, "graph_widest_path_bottleneck")
    got = {names_k: w for names_k, w in ((r.n_name, r.width) for r in rows)}
    expect = {names[n]: w for n, w in width.items() if n != WP_SOURCE}
    assert got == expect


def test_cohort_ltv_closes_over_purchases(spark, sf_correct):
    """The max-age cumulative revenue per cohort must total the corpus
    purchase revenue, and curves must be monotone."""
    con = duckdb.connect()
    total = con.sql(
        f"SELECT CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)"
        f" FROM '{sf_correct}/events.parquet' WHERE event_type = 'purchase'"
    ).fetchone()[0]
    con.close()
    rows = _rows(spark, sf_correct, "cohort_ltv_accumulation")
    last = {}
    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[r.cohort_w].append((r.age_w, r.cum_rev_cents))
        if r.cohort_w not in last or r.age_w > last[r.cohort_w][0]:
            last[r.cohort_w] = (r.age_w, r.cum_rev_cents)
    for curve in by_cohort.values():
        curve.sort()
        assert all(c1 <= c2 for (_, c1), (_, c2) in zip(curve, curve[1:]))
    assert sum(c for _, c in last.values()) == total


def test_bbse_solves_moment_equation_exactly(spark, sf_smoke):
    """Python replay of the staged splits and the exact rational
    inversion pi1 = (mu1 - c10) / (c11 - c10)."""
    from mapreduce_c_implementation_spark.operators.textanalysis import (
        BBSE_PRED_TOKS,
        BBSE_Y_CHARS,
    )

    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, n_chars, text FROM '{sf_smoke}/documents.parquet'"
    ).fetchall()
    con.close()
    s1 = s0 = s11 = s10 = m1 = mt = true_pos = 0
    for doc_id, n_chars, text in docs:
        y = 1 if n_chars >= BBSE_Y_CHARS else 0
        pred = 1 if len(reference_map(text)) >= BBSE_PRED_TOKS else 0
        if doc_id % 2 == 0:
            s1 += y
            s0 += 1 - y
            s11 += pred and y
            s10 += pred and not y
        elif not (y == 0 and doc_id % 4 == 1):
            m1 += pred
            mt += 1
            true_pos += y
    (row,) = _rows(spark, sf_smoke, "label_shift_bbse_estimate")
    assert (row.s1, row.s0, row.s11, row.s10) == (s1, s0, s11, s10)
    assert (row.m1, row.mt) == (m1, mt)
    num = (m1 * s0 - s10 * mt) * s1
    den = mt * (s11 * s0 - s10 * s1)
    sign = 1 if (num >= 0) == (den >= 0) else -1
    assert row.pi1_ppm == sign * (abs(num) * 1_000_000 // abs(den))
    # the staged shift is real: target's true rate differs from source's
    assert row.naive_pred_rate_ppm != row.pi1_ppm  # correction engaged


def test_phrase_query_matches_python_replay(spark, sf_smoke):
    """Python replay: most-frequent trigram (ties lexicographic), then
    exact positional occurrences per doc."""
    docs = [(d, reference_map(t)) for d, _, t in _docs(sf_smoke)]
    tri = Counter()
    for _, ts in docs:
        for i in range(len(ts) - 2):
            tri[" ".join(ts[i : i + 3])] += 1
    phrase = min(tri.items(), key=lambda kv: (-kv[1], kv[0]))[0].split(" ")
    expect = {}
    for doc_id, ts in docs:
        hits = [
            i + 1
            for i in range(len(ts) - 2)
            if ts[i : i + 3] == phrase
        ]
        if hits:
            expect[doc_id] = (len(hits), hits[0])
    rows = _rows(spark, sf_smoke, "phrase_query_positional_index")
    got = {r.doc_id: (r.n_occurrences, r.first_pos) for r in rows}
    assert got == expect and len(got) > 0


def test_nfc_canonicalize_detects_decomposed_class(spark, sf_smoke):
    """Exactly the doc_id % 3 == 2 class (planted NFD suffix) changes;
    digests match a Python unicodedata replay."""
    import hashlib
    import unicodedata

    from mapreduce_c_implementation_spark.operators.corpus_filters import (
        _NFC_COMPOSED,
        _NFC_DECOMPOSED,
    )

    assert unicodedata.normalize("NFC", _NFC_DECOMPOSED) == _NFC_COMPOSED
    got = {r.doc_id: r for r in _rows(spark, sf_smoke, "unicode_nfc_canonicalize")}
    for doc_id, _, text in _docs(sf_smoke):
        raw = text + (
            " " + _NFC_COMPOSED
            if doc_id % 3 == 1
            else (" " + _NFC_DECOMPOSED if doc_id % 3 == 2 else "")
        )
        norm = unicodedata.normalize("NFC", raw)
        r = got[doc_id]
        assert r.changed == (1 if norm != raw else 0)
        assert r.changed == (1 if doc_id % 3 == 2 else 0)
        assert (r.raw_codepoints, r.norm_codepoints) == (len(raw), len(norm))
        assert r.norm_md5 == hashlib.md5(norm.encode()).hexdigest()


def test_span_alignment_matches_python_replay(spark, sf_smoke):
    """Offsets and coverage replayed with plain Python string math."""
    import hashlib

    from mapreduce_c_implementation_spark.operators.textanalysis import (
        SPAN_ALIGN_LEN,
    )

    got = {r.doc_id: r for r in _rows(spark, sf_smoke, "span_token_alignment")}
    for doc_id, _, text in _docs(sf_smoke):
        toks = text.split(" ")
        s = len(text) // 4 + 1
        e = s + SPAN_ALIGN_LEN
        starts, pos = [], 1
        for t in toks:
            starts.append(pos)
            pos += len(t) + 1
        cov = [
            i + 1
            for i, t in enumerate(toks)
            if starts[i] < e and starts[i] + len(t) > s
        ]
        r = got[doc_id]
        assert (r.char_start, r.char_end) == (s, e)
        assert r.n_tokens_covered == len(cov)
        if cov:
            assert (r.tok_start, r.tok_end) == (cov[0], cov[-1])
            covered = " ".join(toks[cov[0] - 1 : cov[-1]])
            assert r.covered_md5 == hashlib.md5(covered.encode()).hexdigest()
        else:
            assert r.tok_start is None and r.covered_md5 is None
