"""Semantic contracts for the round-10 second-wave operators — intent
checks the cross-engine oracle diff (tests/test_operators_vs_oracle.py)
cannot see: the oracle proves Spark == DuckDB, these prove both equal
the SPEC (Python brute-force replays of the statistics).
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


def _events(sf_dir):
    con = duckdb.connect()
    try:
        return con.sql(
            f"SELECT event_id, ts, event_type, value"
            f" FROM '{sf_dir}/events.parquet'"
        ).fetchall()
    finally:
        con.close()


def test_kruskal_wallis_matches_bruteforce(spark, sf_smoke):
    """Full replay: bin, midrank, per-group rank sums, H, tie-corrected
    H — all from first principles in Python floats, compared at milli
    tolerance 1 (the Spark path floor-divides group terms)."""
    ev = _events(sf_smoke)
    binned = [
        (t, min(63, int(v / 8.0))) for (_, _, t, v) in ev
    ]
    bc = defaultdict(int)
    for _, b in binned:
        bc[b] += 1
    # midrank per bin
    rank = {}
    cum = 0
    for b in sorted(bc):
        rank[b] = cum + (bc[b] + 1) / 2.0
        cum += bc[b]
    rsum = defaultdict(float)
    ng = defaultdict(int)
    for t, b in binned:
        rsum[t] += rank[b]
        ng[t] += 1
    n = len(binned)
    s = sum(rsum[t] ** 2 / ng[t] for t in rsum)
    h = 12.0 * s / (n * (n + 1)) - 3.0 * (n + 1)
    ties = sum(c**3 - c for c in bc.values())
    h_tie = h / (1 - ties / float(n**3 - n))
    rows = {r.grp: r for r in _rows(spark, sf_smoke, "kruskal_wallis_binned")}
    assert set(rows) == set(ng)
    for t, r in rows.items():
        assert r.n_g == ng[t]
        assert r.r2_g == int(round(2 * rsum[t]))
        assert r.n_total == n
        assert r.tie_cubes == ties
        # floor-divided group terms shave < k off S; allow 1 milli
        assert abs(r.h_milli - round(h * 1000)) <= 1
        assert abs(r.h_tie_milli - round(h_tie * 1000)) <= 1


def test_bh_step_up_rule(spark, sf_smoke):
    """The step-up invariant: rejected == (rank <= k*) where k* is the
    LARGEST rank whose p bound sits under alpha*rank/m — including
    rows above their own critical line but below k*."""
    rows = _rows(spark, sf_smoke, "benjamini_hochberg_fdr")
    m = rows[0].m
    assert all(r.m == m for r in rows) and m == len(rows)
    by_rank = sorted(rows, key=lambda r: r.rank)
    # p bounds are Chebyshev: min(1e6, 1e12 // z^2)
    for r in by_rank:
        assert r.p_bound_ppm == min(
            10**6, 10**12 // max(r.z_milli * r.z_milli, 1)
        )
        assert r.crit_ppm == 100_000 * r.rank // m
    sat = [r.rank for r in by_rank if r.p_bound_ppm <= r.crit_ppm]
    kstar = max(sat) if sat else 0
    for r in by_rank:
        assert r.rejected == (1 if r.rank <= kstar else 0)
    # ranks are the p order
    ps = [r.p_bound_ppm for r in by_rank]
    assert ps == sorted(ps)


def test_median_of_means_matches_bruteforce(spark, sf_smoke):
    """Replay: md5 bucket assignment, integer bucket means, lower
    median — byte-for-byte the same rule."""
    ev = _events(sf_smoke)
    buckets = defaultdict(lambda: defaultdict(list))
    totals = defaultdict(list)
    for eid, _, t, v in ev:
        h = int(hashlib.md5(str(eid).encode()).hexdigest()[:4], 16) % 16
        cents = int(round(v * 100))
        buckets[t][h].append(cents)
        totals[t].append(cents)
    rows = {r.event_type: r for r in _rows(spark, sf_smoke, "median_of_means_value")}
    assert set(rows) == set(totals)
    for t, r in rows.items():
        means = sorted(
            (sum(vs) * 10 // len(vs), b) for b, vs in buckets[t].items()
        )
        lower_median = means[(len(means) + 1) // 2 - 1][0]
        assert r.mom_milli == lower_median
        assert r.n == len(totals[t])
        assert r.mean_milli == sum(totals[t]) * 10 // len(totals[t])
        assert r.n_buckets == len(buckets[t])


def _lineitem_pairs(sf_dir):
    con = duckdb.connect()
    try:
        return con.sql(
            f"SELECT DISTINCT l_orderkey, l_partkey"
            f" FROM '{sf_dir}/lineitem.parquet'"
        ).fetchall()
    finally:
        con.close()


def test_kcore_peel_matches_bruteforce(spark, sf_smoke):
    """Python replay of the bounded peel: same edges (pairs sharing
    >= 2 orders), same rounds, same layers and death degrees."""
    lp = _lineitem_pairs(sf_smoke)
    orders = defaultdict(set)
    for o, p in lp:
        orders[o].add(p)
    wc = defaultdict(int)
    for ps in orders.values():
        ps = sorted(ps)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                wc[(ps[i], ps[j])] += 1
    adj = defaultdict(set)
    for (u, v), w in wc.items():
        if w >= 2:
            adj[u].add(v)
            adj[v].add(u)
    alive = set(adj)
    expect = {}
    for r in range(1, 9):
        deg = {u: len(adj[u] & alive) for u in alive}
        drop = {u for u in alive if deg[u] < 2}
        for u in drop:
            expect[u] = (r, deg[u])
        alive -= drop
    for u in alive:
        expect[u] = (0, len(adj[u] & alive))
    rows = _rows(spark, sf_smoke, "graph_kcore_peel_layers")
    got = {r.p_partkey: (r.peel_layer, r.degree_at_peel) for r in rows}
    assert got == expect


def test_hits_matches_bruteforce(spark, sf_smoke):
    """Python integer replay of the alternating normalized power
    iteration over the nation trade graph."""
    con = duckdb.connect()
    try:
        edges = con.sql(f"""
        SELECT c.c_nationkey, s.s_nationkey, count(*) FROM
          '{sf_smoke}/lineitem.parquet' l
          JOIN '{sf_smoke}/orders.parquet' o ON o.o_orderkey = l.l_orderkey
          JOIN '{sf_smoke}/customer.parquet' c ON c.c_custkey = o.o_custkey
          JOIN '{sf_smoke}/supplier.parquet' s ON s.s_suppkey = l.l_suppkey
        GROUP BY 1, 2
        """).fetchall()
        nations = dict(
            con.sql(
                f"SELECT n_nationkey, n_name FROM '{sf_smoke}/nation.parquet'"
            ).fetchall()
        )
    finally:
        con.close()
    SCALE = 1_000_000
    hub = {n: SCALE for n in nations}
    auth = {}
    for _ in range(6):
        raw = defaultdict(int)
        for u, v, w in edges:
            raw[v] += hub[u] * w
        tot = sum(raw.values())
        auth = {n: raw.get(n, 0) * SCALE // tot if n in raw else 0 for n in nations}
        raw = defaultdict(int)
        for u, v, w in edges:
            raw[u] += auth[v] * w
        tot = sum(raw.values())
        hub = {n: raw.get(n, 0) * SCALE // tot if n in raw else 0 for n in nations}
    rows = _rows(spark, sf_smoke, "graph_hits_scores")
    got = {r.n_name: (r.hub_scaled, r.auth_scaled) for r in rows}
    expect = {nations[n]: (hub[n], auth[n]) for n in nations}
    assert got == expect


def test_t_closeness_matches_bruteforce(spark, sf_smoke):
    """Python replay of the ordered-1D EMD closed form per QI group."""
    con = duckdb.connect()
    try:
        cust = con.sql(
            f"SELECT c_nationkey, c_mktsegment,"
            f" CAST(floor(c_acctbal / 2000) AS BIGINT)"
            f" FROM '{sf_smoke}/customer.parquet'"
        ).fetchall()
    finally:
        con.close()
    import math

    bands = sorted({s for _, _, s in cust})
    m, n = len(bands), len(cust)
    gcount = defaultdict(int)
    groups = defaultdict(lambda: defaultdict(int))
    for nk, seg, s in cust:
        gcount[s] += 1
        groups[(nk, seg)][s] += 1
    rows = {
        (r.nationkey, r.mktsegment): r
        for r in _rows(spark, sf_smoke, "t_closeness_check")
    }
    assert set(rows) == set(groups)
    for key, cnts in groups.items():
        ng = sum(cnts.values())
        acc = cum_c = cum_g = 0
        for s in bands:
            cum_c += cnts.get(s, 0)
            cum_g += gcount[s]
            acc += abs(cum_c * n - cum_g * ng)
        emd = acc * 1_000_000 // (ng * n * (m - 1))
        r = rows[key]
        assert r.emd_ppm == emd
        assert r.group_size == ng and r.n_bands == m
        assert r.t_close == (1 if emd <= 150_000 else 0)


def test_rake_matches_bruteforce(spark, sf_smoke):
    """Full RAKE replay: islands, degree/freq word scores, phrase
    scores, top-30 head."""
    import re

    docs = _docs(sf_smoke)
    stops = {"the", "a", "and", "of", "to", "is"}
    phrases = []  # list of word tuples
    for text in docs.values():
        toks = [
            t.lower()[:255] for t in re.findall(r"[A-Za-z0-9]+", text)
        ]
        run = []
        for t in toks + [None]:
            if t is None or t in stops:
                if run and len(run) <= 3:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(t)
    freq = defaultdict(int)
    deg = defaultdict(int)
    for ws in phrases:
        for w in ws:
            freq[w] += 1
            deg[w] += len(ws)
    wsc = {w: deg[w] * 1000 // freq[w] for w in freq}
    agg = defaultdict(lambda: [0, 0])
    for ws in phrases:
        key = " ".join(ws)
        agg[key][0] += 1
        agg[key][1] = sum(wsc[w] for w in ws)
    ranked = sorted(agg.items(), key=lambda kv: (-kv[1][1], kv[0]))[:30]
    rows = sorted(
        _rows(spark, sf_smoke, "rake_keyword_extraction"),
        key=lambda r: r.rank,
    )
    assert [(r.phrase, r.n_occurrences, r.score_milli) for r in rows] == [
        (p, c, s) for p, (c, s) in ranked
    ]


def test_ewma_matches_bruteforce(spark, sf_smoke):
    """Python replay: zero-filled spine, truncated integer EWMA,
    doubling/halving flags."""
    import datetime

    ev = _events(sf_smoke)
    daily = defaultdict(lambda: defaultdict(int))
    for _, ts, t, _ in ev:
        daily[t][ts.date()] += 1
    W = [3 ** (j - 1) * 4 ** (12 - j) for j in range(1, 13)]
    D = 4**12 - 3**12
    expect = {}
    for t, cs in daily.items():
        d0, d1 = min(cs), max(cs)
        days = [d0 + datetime.timedelta(days=i) for i in range((d1 - d0).days + 1)]
        for i, d in enumerate(days):
            if i < 12:
                continue
            num = sum(
                cs.get(days[i - j], 0) * W[j - 1] for j in range(1, 13)
            )
            level = num * 1000 // D
            n = cs.get(d, 0)
            expect[(t, d.isoformat())] = (
                n,
                level,
                n * 1000 - level,
                1 if (n * 1000 > 2 * level or 2 * n * 1000 < level) else 0,
            )
    rows = _rows(spark, sf_smoke, "ewma_daily_anomaly")
    got = {
        (r.event_type, r.day): (r.n, r.level_milli, r.resid_milli, r.anomaly)
        for r in rows
    }
    assert got == expect


def _embeddings(sf_dir):
    con = duckdb.connect()
    try:
        return con.sql(
            f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'"
        ).fetchall()
    finally:
        con.close()


def _seq_dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def test_e2lsh_matches_bruteforce(spark, sf_smoke):
    """Python replay: same ±1 line rule, same staggered quantization,
    same exact-L2 verify — sequential-fold floats throughout."""
    import math

    vecs = dict(_embeddings(sf_smoke))
    cells = {}
    norms = {}
    for vid, v in vecs.items():
        norms[vid] = math.sqrt(_seq_dot(v, v))
        sig = []
        for j in range(4):
            proj = 0.0
            for i, x in enumerate(v, start=1):
                w = 1.0 if (i * (j + 13)) % 17 < 8 else -1.0
                proj += w * float(x)
            sig.append(math.floor((proj + j * 0.5) / 2.0))
        cells[vid] = tuple(sig)
    expect = set()
    ids = sorted(vecs)
    buckets = defaultdict(list)
    for vid in ids:
        buckets[cells[vid]].append(vid)
    for vs in buckets.values():
        for i in range(len(vs)):
            for j in range(i + 1, len(vs)):
                a, b = vs[i], vs[j]
                l2 = math.sqrt(
                    norms[a] ** 2 + norms[b] ** 2
                    - 2 * _seq_dot(vecs[a], vecs[b])
                )
                if l2 <= 1.2:
                    expect.add((a, b, round(l2, 6)))
    rows = _rows(spark, sf_smoke, "lsh_euclidean_e2lsh")
    got = {(r.vec_id_a, r.vec_id_b, r.l2_r6) for r in rows}
    assert got == expect


def test_mmr_matches_bruteforce(spark, sf_smoke):
    """Python replay of the greedy MMR trace (integer objective,
    smaller-id tie-break)."""
    import math

    vecs = dict(_embeddings(sf_smoke))
    norms = {v: math.sqrt(_seq_dot(e, e)) for v, e in vecs.items()}

    def cos_micro(a, b):
        return int(
            round(_seq_dot(vecs[a], vecs[b]) / (norms[a] * norms[b]) * 1e6)
        )

    rel = {v: cos_micro(0, v) for v in vecs if v != 0}
    cand = sorted(rel, key=lambda v: (-rel[v], v))[:20]
    sel = [min(cand, key=lambda v: (-rel[v], v))]
    trace = [(1, sel[0], rel[sel[0]], 700 * rel[sel[0]])]
    for k in range(2, 9):
        best = None
        for c in cand:
            if c in sel:
                continue
            ms = max(cos_micro(c, s) for s in sel)
            sc = 700 * rel[c] - 300 * ms
            key = (-sc, c)
            if best is None or key < best[0]:
                best = (key, c, sc)
        sel.append(best[1])
        trace.append((k, best[1], rel[best[1]], best[2]))
    rows = sorted(
        _rows(spark, sf_smoke, "mmr_diverse_reranking"),
        key=lambda r: r.round,
    )
    assert [(r.round, r.vec_id, r.rel_micro, r.mmr_scaled) for r in rows] == trace


def test_dbscan_grid_matches_bruteforce(spark, sf_smoke):
    """Python replay: quantize, dense cells, 8-neighborhood CC with
    min-rank labels, noise flags."""
    import math

    con = duckdb.connect()
    try:
        pts = con.sql(
            f"SELECT vec_id, CAST(embedding[1] AS DOUBLE),"
            f" CAST(embedding[2] AS DOUBLE)"
            f" FROM '{sf_smoke}/embeddings.parquet'"
        ).fetchall()
    finally:
        con.close()
    cellof = {
        v: (math.floor(x / 0.04), math.floor(y / 0.04)) for v, x, y in pts
    }
    counts = defaultdict(int)
    for c in cellof.values():
        counts[c] += 1
    dense = sorted(c for c, n in counts.items() if n >= 4)
    cid = {c: i + 1 for i, c in enumerate(dense)}
    parent = {c: c for c in dense}

    def find(c):
        while parent[c] != c:
            parent[c] = parent[parent[c]]
            c = parent[c]
        return c

    for (i, j) in dense:
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                nb = (i + di, j + dj)
                if nb in parent:
                    ra, rb = find((i, j)), find(nb)
                    if ra != rb:
                        parent[ra] = rb
    comp_min = {}
    for c in dense:
        r = find(c)
        comp_min[r] = min(comp_min.get(r, cid[c]), cid[c])
    rows = _rows(spark, sf_smoke, "dbscan_grid_clusters")
    for r in rows:
        c = cellof[r.vec_id]
        assert (r.ci, r.cj) == c
        if c in cid:
            assert r.noise == 0
            assert r.cluster_id == comp_min[find(c)]
        else:
            assert r.noise == 1 and r.cluster_id == -1
    assert len(rows) == len(pts)


def test_heaps_fit_matches_bruteforce(spark, sf_smoke):
    """Python replay: bucketed growth curve per source, milli-log OLS."""
    import math
    import re

    con = duckdb.connect()
    try:
        docs = con.sql(
            f"SELECT doc_id, source, text FROM '{sf_smoke}/documents.parquet'"
        ).fetchall()
    finally:
        con.close()
    per = defaultdict(lambda: defaultdict(lambda: [0, 0]))  # src -> bucket -> [toks, newterms]
    seen = defaultdict(set)
    for doc_id, src, text in sorted(docs):
        b = doc_id // 50
        toks = [t.lower()[:255] for t in re.findall(r"[A-Za-z0-9]+", text)]
        per[src][b][0] += len(toks)
        for t in toks:
            if t not in seen[src]:
                seen[src].add(t)
                per[src][b][1] += 1
    rows = {r.source: r for r in _rows(spark, sf_smoke, "heaps_law_power_fit")}
    for src, buckets in per.items():
        cn = cv = 0
        xs, ys = [], []
        for b in sorted(buckets):
            if buckets[b][0] == 0:
                continue
            cn += buckets[b][0]
            cv += buckets[b][1]
            xs.append(round(math.log(cn) * 1000))
            ys.append(round(math.log(cv) * 1000))
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        r = rows[src]
        assert r.n_points == n
        if n >= 2 and n * sxx - sx * sx != 0:
            num = float(n) * sxy - float(sx) * sy
            den = float(n) * sxx - float(sx) * sx
            assert r.beta_micro == round(num / den * 1e6)
            assert r.lnk_milli == round((sy - num / den * sx) / n)
            deny = float(n) * syy - float(sy) * sy
            if deny != 0:
                assert r.r2_ppm == round(num * num / (den * deny) * 1e6)
        else:
            assert r.beta_micro == 0 and r.lnk_milli == 0 and r.r2_ppm == 0


def test_wilcoxon_matches_bruteforce(spark, sf_smoke):
    """Python replay: paired daily cents, midranks over |d| ties,
    tie-corrected z."""
    import math

    ev = _events(sf_smoke)
    daily = defaultdict(lambda: [0, 0])
    for _, ts, t, v in ev:
        if t == "purchase":
            daily[ts.date()][0] += int(round(v * 100))
        elif t == "view":
            daily[ts.date()][1] += int(round(v * 100))
    ds = [a - b for a, b in daily.values() if a != b]
    ads = sorted(abs(d) for d in ds)
    # midrank per |d| value
    from collections import Counter

    cnt = Counter(ads)
    rank = {}
    cum = 0
    for v in sorted(cnt):
        rank[v] = cum + (cnt[v] + 1) / 2.0
        cum += cnt[v]
    w_plus = sum(rank[abs(d)] for d in ds if d > 0)
    n = len(ds)
    ties = sum(c**3 - c for c in cnt.values())
    z = (w_plus - n * (n + 1) / 4) / math.sqrt(
        n * (n + 1) * (2 * n + 1) / 24 - ties / 48
    )
    (r,) = _rows(spark, sf_smoke, "wilcoxon_signed_rank_daily")
    assert r.n_pairs == n
    assert r.n_pos == sum(1 for d in ds if d > 0)
    assert r.w2_plus == int(round(2 * w_plus))
    assert r.tie_cubes == ties
    assert r.z_milli == round(z * 1000)


def test_knn_shapley_matches_bruteforce(spark, sf_smoke):
    """Python replay of the exact backward recursion (integer micro,
    per-term floor, sign-carried division)."""
    import math

    con = duckdb.connect()
    try:
        rows_e = con.sql(
            f"SELECT vec_id, embedding, label"
            f" FROM '{sf_smoke}/embeddings.parquet'"
        ).fetchall()
    finally:
        con.close()
    vecs = {v: e for v, e, _ in rows_e}
    labels = {v: l for v, _, l in rows_e}
    norms = {v: math.sqrt(_seq_dot(e, e)) for v, e in vecs.items()}
    train = sorted(v for v in vecs if v >= 10)
    expect = defaultdict(int)
    K = 5
    for t in range(10):
        order = sorted(
            train,
            key=lambda v: (
                -(_seq_dot(vecs[t], vecs[v]) / (norms[t] * norms[v])),
                v,
            ),
        )
        n = len(order)
        ind = [1 if labels[v] == labels[t] else 0 for v in order]
        s = [0] * n
        s[n - 1] = ind[n - 1] * 1_000_000 // n
        for i in range(n - 2, -1, -1):
            d = ind[i] - ind[i + 1]
            mag = 1_000_000 * min(i + 1, K) // (K * (i + 1))
            s[i] = s[i + 1] + d * mag
        for v, sv in zip(order, s):
            expect[v] += sv
    rows = _rows(spark, sf_smoke, "knn_shapley_valuation")
    got = {r.vec_id: r.shapley_micro for r in rows}
    assert got == dict(expect)
    for r in rows:
        assert r.label == labels[r.vec_id]


def test_anova_and_levene_match_bruteforce(spark, sf_smoke):
    """Replay both F statistics from raw floats (tolerance 1 milli for
    the floor-divided between-group terms)."""
    ev = _events(sf_smoke)
    groups = defaultdict(list)
    for _, _, t, v in ev:
        groups[t].append(int(round(v * 100)))

    def f_stat(groups):
        k = len(groups)
        n = sum(len(g) for g in groups.values())
        mean = sum(sum(g) for g in groups.values()) / n
        ssb = sum(len(g) * (sum(g) / len(g) - mean) ** 2 for g in groups.values())
        ssw = sum(
            sum((x - sum(g) / len(g)) ** 2 for x in g) for g in groups.values()
        )
        return ssb / (k - 1) / (ssw / (n - k))

    (r,) = _rows(spark, sf_smoke, "anova_one_way_value")
    assert r.k_groups == len(groups)
    assert abs(r.f_milli - round(f_stat(groups) * 1000)) <= 1
    # Brown-Forsythe: ANOVA on |x - group median| (lower median,
    # matching percentile_disc on integer data)
    devs = {}
    for t, g in groups.items():
        sg = sorted(g)
        med = sg[(len(sg) + 1) // 2 - 1]
        devs[t] = [abs(x - med) for x in g]
    (r2,) = _rows(spark, sf_smoke, "brown_forsythe_levene")
    assert abs(r2.w_milli - round(f_stat(devs) * 1000)) <= 1


def test_gumbel_sample_matches_bruteforce(spark, sf_smoke):
    """Replay the Gumbel keys and per-source top-5."""
    import math

    con = duckdb.connect()
    try:
        docs = con.sql(
            f"SELECT doc_id, source, n_chars FROM '{sf_smoke}/documents.parquet'"
            f" WHERE n_chars > 0"
        ).fetchall()
    finally:
        con.close()
    per = defaultdict(list)
    for doc_id, src, w in docs:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:5], 16)
        u = (h % 1_048_576 + 0.5) / 1_048_576
        g = round((math.log(w) - math.log(-math.log(u))) * 1e6)
        per[src].append((-g, doc_id, w, g))
    expect = {}
    for src, rows in per.items():
        for rank, (_, doc_id, w, g) in enumerate(sorted(rows)[:5], start=1):
            expect[(src, doc_id)] = (w, g, rank)
    rows = _rows(spark, sf_smoke, "gumbel_weighted_sample_per_group")
    got = {
        (r.source, r.doc_id): (r.weight, r.gumbel_micro, r.rank) for r in rows
    }
    assert got == expect


def test_platt_fit_calibrates(spark, sf_smoke):
    """Semantic checks on the Newton trace: iterations converge (last
    two steps within a few micro) and the fitted curve reproduces the
    overall positive rate within 2% (the mean-matching property of
    logistic MLE; the slope's SIGN is data-dependent at smoke scale,
    so it is not asserted)."""
    import math
    import re

    rows = sorted(
        _rows(spark, sf_smoke, "platt_scaling_calibration"),
        key=lambda r: r.iter,
    )
    assert [r.iter for r in rows] == [1, 2, 3, 4, 5, 6]
    a, b = rows[-1].a_micro / 1e6, rows[-1].b_micro / 1e6
    assert abs(rows[-1].a_micro - rows[-2].a_micro) <= 16
    assert abs(rows[-1].b_micro - rows[-2].b_micro) <= 16
    docs = _docs(sf_smoke)
    con = duckdb.connect()
    try:
        langs = dict(
            con.sql(
                f"SELECT doc_id, lang FROM '{sf_smoke}/documents.parquet'"
            ).fetchall()
        )
    finally:
        con.close()
    stops = {"the", "a", "and", "of", "to", "is", "fast", "slow"}
    tot = pos = fit = 0.0
    n = 0
    for doc_id, text in docs.items():
        ts = [t.lower()[:255] for t in re.findall(r"[A-Za-z0-9]+", text)]
        if not ts:
            continue
        x = len(set(ts) & stops) * 10000 // len(ts)
        n += 1
        pos += 1 if langs[doc_id] == "en" else 0
        fit += 1 / (1 + math.exp(-(a * x / 1e4 + b)))
    assert abs(fit / n - pos / n) < 0.02


def test_qte_matches_bruteforce(spark, sf_smoke):
    """Replay: treated users (error before cutoff), post-cutoff
    purchase cents, lower-style percentile_disc order statistics."""
    import datetime
    import math

    ev = _events(sf_smoke)
    cutoff = datetime.datetime(2024, 1, 16)
    con = duckdb.connect()
    try:
        users = con.sql(
            f"SELECT DISTINCT user_id FROM '{sf_smoke}/events.parquet'"
            f" WHERE event_type = 'error' AND ts < TIMESTAMP '2024-01-16'"
        ).fetchall()
        rows_e = con.sql(
            f"SELECT user_id, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
            f" FROM '{sf_smoke}/events.parquet'"
            f" WHERE event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-16'"
        ).fetchall()
    finally:
        con.close()
    treated = {u for (u,) in users}
    groups = {0: [], 1: []}
    for u, v in rows_e:
        groups[1 if u in treated else 0].append(v)

    def pdisc(vals, p):
        if not vals:
            return None  # a degenerate arm yields NULL quantiles
        s = sorted(vals)
        # percentile_disc: smallest value at cumulative distribution >= p
        k = math.ceil(p * len(s))
        return s[max(k, 1) - 1]

    rows = {r.percentile: r for r in _rows(spark, sf_smoke, "quantile_treatment_effects")}
    assert set(rows) == {10, 25, 50, 75, 90}
    for p, r in rows.items():
        tq = pdisc(groups[1], p / 100)
        cq = pdisc(groups[0], p / 100)
        assert r.treated_q_cents == tq and r.control_q_cents == cq
        if tq is not None and cq is not None:
            assert r.qte_cents == tq - cq
        else:
            assert r.qte_cents is None
        assert r.n_treated == (len(groups[1]) or None)
        assert r.n_control == (len(groups[0]) or None)


def test_set_cover_matches_bruteforce(spark, sf_smoke):
    """Replay the greedy loop: max-new-coverage argmax with doc_id
    ties, cumulative coverage, emission stops at exhaustion."""
    import re

    docs = _docs(sf_smoke)
    terms = {
        d: {t.lower()[:255] for t in re.findall(r"[A-Za-z0-9]+", txt)}
        for d, txt in docs.items()
    }
    covered = set()
    expect = []
    for r in range(1, 9):
        best = None
        for d in sorted(terms):
            g = len(terms[d] - covered)
            if g == 0 and not (terms[d] - covered):
                pass
            key = (-g, d)
            if best is None or key < best[0]:
                best = (key, d, g)
        if best[2] == 0:
            # oracle emits nothing once no doc has uncovered terms
            # (the gain table is empty, so LIMIT 1 selects no row)
            break
        covered |= terms[best[1]]
        expect.append((r, best[1], best[2], len(covered)))
    rows = sorted(
        _rows(spark, sf_smoke, "greedy_set_cover_docs"),
        key=lambda r: r.round,
    )
    assert [
        (r.round, r.doc_id, r.new_terms, r.covered_total) for r in rows
    ] == expect
