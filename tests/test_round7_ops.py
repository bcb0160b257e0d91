"""Semantic contracts for the round-7 operators — intent checks that the
cross-engine oracle diff (tests/test_operators_vs_oracle.py) cannot see:
the oracle proves Spark == DuckDB, these prove both equal the SPEC.
"""

from __future__ import annotations

from mapreduce_c_implementation_spark.operators.corpus_filters import (
    DOMAIN_CAP,
)
from mapreduce_c_implementation_spark.registry import get_operator


def _rows(spark, sf_dir, name):
    return get_operator(name).query_fn(spark, sf_dir).collect()


def test_url_canonical_normalization_contract(spark, sf_correct):
    """Canonical URLs carry no scheme/www/port/tracking/fragment noise
    and no trailing slash, while REAL query params survive."""
    rows = _rows(spark, sf_correct, "url_canonicalize_dedup")
    urls = [r.canonical_url for r in rows]
    assert urls, "no canonical urls produced"
    for u in urls:
        assert not u.startswith("http"), u
        assert not u.startswith("www."), u
        assert "#" not in u, u
        assert "utm_" not in u, u
        assert ":443" not in u, u
        assert not u.endswith("/"), u
        assert u == u.lower(), u
    # the non-tracking ?page=2 param must survive canonicalization
    assert any("?page=2" in u for u in urls)
    # and the derivation must actually produce collapsible variants
    assert any(r.n_raw_variants > 1 for r in rows)


def test_url_blocklist_blocks_whole_hosts_and_prefixes(spark, sf_correct):
    rows = {r.source: r for r in _rows(spark, sf_correct, "url_blocklist_filter")}
    # whole-host rules: every src1/src17 doc blocked
    for src in ("src1", "src17"):
        assert rows[src].n_blocked == rows[src].n_total
        assert rows[src].n_kept == 0
    # prefix rule on src0 blocks a strict, non-empty subset
    assert 0 < rows["src0"].n_blocked < rows["src0"].n_total
    # untouched hosts keep everything
    assert rows["src5"].n_blocked == 0


def test_domain_cap_keeps_exactly_cap(spark, sf_correct):
    for r in _rows(spark, sf_correct, "domain_cap_rewrite"):
        assert r.n_kept == min(r.n_total, DOMAIN_CAP)
        assert r.last_kept_doc is not None


def test_bloom_screen_no_false_negatives(spark, sf_correct):
    """A Bloom filter may over-flag but can never miss a member."""
    (r,) = _rows(spark, sf_correct, "bloom_contamination_screen")
    assert r.n_bloom_hits >= r.n_exact_hits
    assert r.n_false_pos == r.n_bloom_hits - r.n_exact_hits
    assert r.n_false_pos >= 0
    assert 0 < r.n_bits_set <= 3 * r.n_eval_shingles


def test_fuzzy_lookup_finds_near_match_for_every_probe(spark, sf_correct):
    rows = _rows(spark, sf_correct, "join_fuzzy_levenshtein")
    from mapreduce_c_implementation_spark.operators.joins import FUZZY_K

    assert len(rows) == FUZZY_K
    # each probe was derived by deleting one char from a real name, so a
    # match at distance <= 1 always exists inside its block
    assert all(r.dist <= 1 for r in rows)


def test_binned_two_sample_stats_are_bounded(spark, sf_correct):
    (ks,) = _rows(spark, sf_correct, "ks_two_sample_binned")
    assert 0 <= ks.d_ppm <= 1_000_000
    assert ks.n_bins <= 64
    (cvm,) = _rows(spark, sf_correct, "cvm_two_sample_binned")
    assert 0 <= cvm.omega2_micro <= 1_000_000
    assert (cvm.n_a, cvm.n_b) == (ks.n_a, ks.n_b)


def test_rank_normalize_spans_full_unit_interval(spark, sf_correct):
    rows = _rows(spark, sf_correct, "feature_rank_normalize")
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        ppms = sorted(r.rank_ppm for r in rs)
        assert ppms[0] == 0, src
        assert ppms[-1] == 1_000_000, src
        ranks = sorted(r.rnk for r in rs)
        assert ranks == list(range(1, len(rs) + 1)), src


def test_temperature_mixing_flattens_shares(spark, sf_correct):
    rows = _rows(spark, sf_correct, "source_temperature_mixing")
    total_temp = sum(r.temp_ppm for r in rows)
    # shares floor-divide, so the sum undershoots 1e6 by < |sources|
    assert 1_000_000 - len(rows) <= total_temp <= 1_000_000
    # sqrt temperature moves every share toward the mean: the smallest
    # source gains share, the largest loses it
    smallest = min(rows, key=lambda r: r.n_tokens)
    largest = max(rows, key=lambda r: r.n_tokens)
    assert smallest.temp_ppm >= smallest.prop_ppm
    assert largest.temp_ppm <= largest.prop_ppm


def test_nb_classifier_covers_the_apply_half(spark, sf_correct):
    rows = _rows(spark, sf_correct, "nb_quality_classifier_train_apply")
    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    n_odd = docs.filter("doc_id % 2 = 1").count()
    assert sum(r.n_docs for r in rows) == n_odd
    assert all(r.actual in (0, 1) and r.predicted in (0, 1) for r in rows)


def test_length_buckets_pad_upward_only(spark, sf_correct):
    rows = _rows(spark, sf_correct, "length_bucket_batching")
    for r in rows:
        assert r.width & (r.width - 1) == 0, "width must be a power of two"
        assert r.padded_tokens >= r.real_tokens
        assert 0 <= r.pad_waste_ppm < 1_000_000
        assert r.n_batches >= 1


def test_entropy_rate_bounds(spark, sf_correct):
    import math

    (r,) = _rows(spark, sf_correct, "corpus_entropy_rate")
    assert r.n_bigrams > 0
    assert 0 <= r.cond_entropy_micro
    assert 0 <= r.history_entropy_micro
    # both entropies are bounded by ln(respective support size)
    assert r.cond_entropy_micro <= math.log(r.vocab_bigrams) * 1e6


def test_mann_whitney_bounds_and_totals(spark, sf_correct):
    (r,) = _rows(spark, sf_correct, "mann_whitney_u_binned")
    n_events = spark.read.parquet(f"{sf_correct}/events.parquet").count()
    assert r.n_a + r.n_b == n_events
    # 2U is bounded by 2 * n_a * n_b; ties only shrink the variance
    assert 0 <= r.u2_a <= 2 * r.n_a * r.n_b
    assert r.tie_cubes >= 0
    assert r.z_milli is not None


def test_cohen_kappa_table_is_consistent(spark, sf_correct):
    (r,) = _rows(spark, sf_correct, "cohen_kappa_agreement")
    assert r.n11 + r.n10 + r.n01 + r.n00 == r.n
    assert r.po_ppm == (r.n11 + r.n00) * 1_000_000 // r.n
    assert -1000 <= r.kappa_milli <= 1000
    # the fixture thresholds sit at the medians: both raters must
    # actually split the corpus (no degenerate all-one-cell table)
    assert r.n11 > 0 and r.n00 > 0 and r.n10 + r.n01 > 0


def test_fim_reorders_only_selected_docs(spark, sf_correct):
    from mapreduce_c_implementation_spark.operators.textanalysis import FIM_RATE_PCT

    rows = _rows(spark, sf_correct, "fim_transformation")
    fim = [r for r in rows if r.is_fim == 1]
    plain = [r for r in rows if r.is_fim == 0]
    # the md5 draw should land near the configured rate
    assert abs(len(fim) / len(rows) * 100 - FIM_RATE_PCT) < 10
    for r in fim:
        assert 0 <= r.cut1 <= r.cut2 <= r.n_tokens
        assert r.n_middle == r.cut2 - r.cut1
        assert r.fim_text.startswith("<fim_prefix>")
        # PSM adds exactly the three sentinels, no token lost
        assert len(r.fim_text.split(" ")) == r.n_tokens + 3
    for r in plain:
        assert "<fim_" not in r.fim_text
        assert len(r.fim_text.split(" ")) == r.n_tokens


def test_boilerplate_templates_are_stripped(spark, sf_correct):
    rows = _rows(spark, sf_correct, "boilerplate_ngram_removal")
    assert sum(r.n_covered for r in rows) > 0
    for r in rows:
        assert r.n_kept == r.n_tokens - r.n_covered
        # the injected footer (>=30% of every source) must never survive
        assert "follow us on spark today" not in r.kept_text
        # nor the injected per-source header
        assert not r.kept_text.startswith(f"about {r.source} daily news digest")
        if r.doc_id % 3 != 0 or r.doc_id % 2 == 0:
            assert r.n_covered >= 5, r.doc_id


def test_hard_negatives_have_wrong_label_positives_right(spark, sf_correct):
    rows = _rows(spark, sf_correct, "hard_negative_mining")
    assert rows, "no triplets mined"
    labels = {
        r.vec_id: r.label
        for r in spark.read.parquet(f"{sf_correct}/embeddings.parquet").collect()
    }
    for r in rows:
        assert r.anchor_id % 17 == 0
        assert r.anchor_id not in (r.positive_id, r.negative_id)
        assert labels[r.positive_id] == r.anchor_label
        assert labels[r.negative_id] != r.anchor_label
        assert r.margin_micro == round((r.positive_cos - r.negative_cos) * 1_000_000)


def test_fertility_ratios_are_consistent(spark, sf_correct):
    rows = _rows(spark, sf_correct, "tokenizer_fertility_stats")
    assert sum(r.n_docs for r in rows) == 500
    for r in rows:
        assert r.chars_per_token_milli == r.token_chars * 1000 // r.n_tokens
        assert r.tokens_per_doc_milli == r.n_tokens * 1000 // r.n_docs
        assert 0 < r.vocab <= r.n_tokens
        # fixture tokens are short English-ish words
        assert 1000 <= r.chars_per_token_milli <= 10000


def test_run_collapse_removes_exactly_adjacent_dups(spark, sf_correct):
    rows = _rows(spark, sf_correct, "duplicate_token_run_collapse")
    assert sum(r.n_collapsed for r in rows) > 0, "fixture has no runs?"
    for r in rows:
        kept = r.kept_text.split(" ") if r.kept_text else []
        assert len(kept) == r.n_tokens - r.n_collapsed
        # no adjacent duplicates survive
        assert all(a != b for a, b in zip(kept, kept[1:]))


def test_cross_source_matrix_bounds(spark, sf_correct):
    rows = _rows(spark, sf_correct, "cross_source_contamination_matrix")
    assert rows, "no overlapping source pairs"
    for r in rows:
        assert r.source_a < r.source_b
        assert 0 < r.shared <= min(r.n_a, r.n_b)
        assert (
            r.jaccard_ppm
            == r.shared * 1_000_000 // (r.n_a + r.n_b - r.shared)
        )


def test_curriculum_rank_is_a_permutation(spark, sf_correct):
    from mapreduce_c_implementation_spark.operators.sampling import (
        CURR_SHARD_DOCS,
    )

    rows = sorted(
        _rows(spark, sf_correct, "curriculum_data_ordering"),
        key=lambda r: r.curriculum_rank,
    )
    assert [r.curriculum_rank for r in rows] == list(range(1, len(rows) + 1))
    # difficulty is non-decreasing along the curriculum
    diffs = [r.difficulty_milli for r in rows]
    assert diffs == sorted(diffs)
    # shards are consecutive rank blocks of CURR_SHARD_DOCS
    for r in rows:
        assert r.shard_id == (r.curriculum_rank - 1) // CURR_SHARD_DOCS


def test_whitening_z_is_standardized(spark, sf_correct):
    rows = _rows(spark, sf_correct, "embedding_dimension_whitening")
    assert len(rows) == 500
    dims = {r.n_dims for r in rows}
    assert dims == {rows[0].n_dims}, "ragged embedding widths?"
    # dim-0 standardizes: mean(z0) ~ 0 and spread ~ 1e6 micro-units
    z0 = [r.z0_micro for r in rows]
    n = len(z0)
    mean = sum(z0) / n
    var = sum((z - mean) ** 2 for z in z0) / n
    assert abs(mean) < 200_000, mean
    assert 0.5e6 < var**0.5 < 1.5e6, var**0.5


def test_dsir_selection_skews_toward_target(spark, sf_correct):
    """DSIR's whole point: the selected head is enriched in the target
    distribution (lang='en') relative to the raw corpus, scores come
    back in non-increasing order, and the head is exactly TOP_K."""
    from mapreduce_c_implementation_spark.operators.sampling import DSIR_TOP_K

    rows = _rows(spark, sf_correct, "dsir_importance_resampling")
    assert len(rows) == DSIR_TOP_K
    scores = [r.dsir_logratio for r in rows]
    assert scores == sorted(scores, reverse=True)
    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    langs = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    sel_en = sum(1 for r in rows if langs[r.doc_id] == "en") / len(rows)
    corpus_en = sum(1 for v in langs.values() if v == "en") / len(langs)
    assert sel_en > corpus_en, (sel_en, corpus_en)


def test_novelty_firsts_partition_the_shingle_vocabulary(spark, sf_correct):
    """The earliest doc scores 1.0 novelty; per-doc novel counts are
    bounded by distinct counts; summed novel counts equal the corpus
    distinct-shingle vocabulary (each shingle is novel exactly once)."""
    rows = _rows(spark, sf_correct, "ngram_novelty_score")
    assert rows
    by_doc = {r.doc_id: r for r in rows}
    first = by_doc[min(by_doc)]
    assert first.novelty_ppm == 1_000_000
    for r in rows:
        assert 0 <= r.novel_ngrams <= r.n_distinct_ngrams
    from mapreduce_c_implementation_spark.functions.text import ngrams, tokenize
    from mapreduce_c_implementation_spark.operators.textanalysis import NOVELTY_N
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    vocab = (
        docs.select(
            F.explode(
                F.array_distinct(ngrams(tokenize(F.col("text")), NOVELTY_N))
            ).alias("sh")
        )
        .agg(F.count_distinct("sh"))
        .collect()[0][0]
    )
    assert sum(r.novel_ngrams for r in rows) == vocab


def test_soft_dedup_weights_sum_to_one_per_cluster(spark, sf_correct):
    """Every exact-content cluster's weights total 1e6 ppm up to floor
    loss (< n_copies), and every document keeps a row."""
    rows = _rows(spark, sf_correct, "dedup_soft_weighting")
    n_docs = spark.read.parquet(f"{sf_correct}/documents.parquet").count()
    assert len(rows) == n_docs
    from collections import defaultdict

    clusters = defaultdict(list)
    for r in rows:
        assert r.weight_ppm == 1_000_000 // r.n_copies
        clusters[(r.n_copies, r.weight_ppm)].append(r)
    for (n, w), members in clusters.items():
        assert len(members) % n == 0  # whole clusters of size n
        total = n * w
        assert 1_000_000 - n < total <= 1_000_000


def test_cusum_scan_prefixes_and_peak(spark, sf_correct):
    """Prefix counts strictly increase, the final (complete) prefix is
    excluded, and at least one row carries the peak flag with the
    maximal statistic."""
    rows = _rows(spark, sf_correct, "cusum_changepoint_scan")
    assert rows
    cums = [r.n_cum for r in rows]
    assert cums == sorted(cums) and len(set(cums)) == len(cums)
    n_events = spark.read.parquet(f"{sf_correct}/events.parquet").count()
    assert cums[-1] < n_events
    mx = max(r.cusum_abs for r in rows)
    peaks = [r for r in rows if r.is_peak]
    assert peaks and all(r.cusum_abs == mx for r in peaks)


def test_dp_release_noise_is_bounded_laplace(spark, sf_correct):
    """released = true + noise; |noise| is bounded by the seed-space
    tail ln(2^21)/eps; totals reconcile with the corpus."""
    import math

    rows = _rows(spark, sf_correct, "dp_laplace_source_histogram")
    n_docs = spark.read.parquet(f"{sf_correct}/documents.parquet").count()
    assert sum(r.n_true for r in rows) == n_docs
    bound = math.log(2 * 1048576) * 1000  # b=1, |u| <= 0.5 - 1/2^21
    for r in rows:
        assert r.released_milli == r.n_true * 1000 + r.noise_milli
        assert abs(r.noise_milli) <= bound
    # noise must actually vary across cells (it is a per-source draw)
    assert len({r.noise_milli for r in rows}) > 1


def test_pass_at_k_matches_bruteforce(spark, sf_correct):
    """Recompute pass@k per user in plain Python (exact fractions) and
    check the macro mean; k=1's macro must equal the mean per-user
    success rate, and pass@k must be monotone non-decreasing in k."""
    rows = {r.k: r for r in _rows(spark, sf_correct, "pass_at_k_eval")}
    assert set(rows) == {1, 5, 10}
    events = (
        spark.read.parquet(f"{sf_correct}/events.parquet")
        .select("user_id", "event_type")
        .collect()
    )
    from collections import Counter

    n = Counter(r.user_id for r in events)
    c = Counter(r.user_id for r in events if r.event_type == "purchase")
    import math

    for k, row in rows.items():
        ppms = []
        for u, nu in n.items():
            if nu < k:
                continue
            cu = c.get(u, 0)
            num = den = 1
            for i in range(k):
                num *= max(nu - cu - i, 0)
                den *= nu - i
            # mirror the engines: exact UNREDUCED integer products,
            # ONE double division, floor of the 1e6-scaled ratio
            ppms.append(
                1_000_000
                - math.floor(1_000_000.0 * (float(num) / float(den)))
            )
        assert row.n_problems == len(ppms)
        assert row.macro_pass_ppm == sum(ppms) // len(ppms), k
    assert rows[1].macro_pass_ppm <= rows[5].macro_pass_ppm <= rows[10].macro_pass_ppm


def test_spearman_matches_scipy_free_reference(spark, sf_correct):
    """Recompute Spearman rho with average ranks in plain Python and
    check the ppm quantization; rho must be strongly positive (length
    vs distinct tokens) and within [-1, 1]."""
    row = _rows(spark, sf_correct, "spearman_rank_correlation")[0]
    docs = spark.read.parquet(f"{sf_correct}/documents.parquet").collect()
    from mapreduce_c_implementation_spark.functions.text import (
        MAX_TOKEN_CHARS,
    )
    import re

    xs, ys = [], []
    for d in docs:
        toks = {
            t[:MAX_TOKEN_CHARS].lower()
            for t in re.findall("[a-zA-Z0-9]+", d.text)
        }
        xs.append(d.n_chars)
        ys.append(len(toks))

    def avg_ranks(v):
        order = sorted(range(len(v)), key=lambda i: v[i])
        ranks = [0.0] * len(v)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and v[order[j + 1]] == v[order[i]]:
                j += 1
            r = (i + j) / 2 + 1
            for t in range(i, j + 1):
                ranks[order[t]] = r
            i = j + 1
        return ranks

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    nn = len(rx)
    mx, my = sum(rx) / nn, sum(ry) / nn
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = (
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    ) ** 0.5
    rho = num / den
    assert row.n_docs == nn
    assert abs(row.rho_ppm - round(rho * 1_000_000)) <= 1, (row.rho_ppm, rho)
    assert 0 < row.rho_ppm <= 1_000_000


def test_group_holdout_split_is_leakage_safe(spark, sf_correct):
    """Every source appears in exactly one split; totals reconcile."""
    rows = _rows(spark, sf_correct, "group_holdout_split")
    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    n_docs = docs.count()
    n_sources = docs.select("source").distinct().count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert sum(r.n_sources for r in rows) == n_sources
    assert {r.split for r in rows} <= {"train", "val", "test"}


def test_kfold_strata_balance_within_one(spark, sf_correct):
    """Within each lang, fold sizes differ by at most one doc, every
    fold id in [0, K) appears, and totals reconcile."""
    from mapreduce_c_implementation_spark.operators.sampling import KFOLD_K

    rows = _rows(spark, sf_correct, "stratified_kfold_assign")
    from collections import defaultdict

    per_lang = defaultdict(dict)
    for r in rows:
        per_lang[r.lang][r.fold] = r.n_docs
    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    lang_tot = {
        r.lang: r.c
        for r in docs.groupBy("lang").count().withColumnRenamed("count", "c").collect()
    }
    for lang, folds in per_lang.items():
        assert set(folds) == set(range(KFOLD_K)), lang
        sizes = list(folds.values())
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        assert sum(sizes) == lang_tot[lang]


def test_hash_collision_stats_reconcile_with_vocabulary(spark, sf_correct):
    """Bucket token counts sum to the vocabulary size, occurrence mass
    sums to the corpus token count, and has_collision <=> n_tokens>1."""
    rows = _rows(spark, sf_correct, "feature_hash_collision_stats")
    from mapreduce_c_implementation_spark.functions.text import tokenize
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    tok = docs.select(F.explode(tokenize(F.col("text"))).alias("t"))
    vocab, total = tok.agg(
        F.count_distinct("t"), F.count("*")
    ).collect()[0]
    assert sum(r.n_tokens for r in rows) == vocab
    assert sum(r.n_occurrences for r in rows) == total
    for r in rows:
        assert r.has_collision == (r.n_tokens > 1)
