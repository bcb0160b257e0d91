"""Semantic contracts for the round-8 operators — intent checks the
cross-engine oracle diff (tests/test_operators_vs_oracle.py) cannot see:
the oracle proves Spark == DuckDB, these prove both equal the SPEC.
"""

from __future__ import annotations

from mapreduce_c_implementation_spark.operators.corpus_filters import SUBSTR_WIN
from mapreduce_c_implementation_spark.registry import get_operator


def _rows(spark, sf_dir, name):
    return get_operator(name).query_fn(spark, sf_dir).collect()


def test_quality_representatives_argmax_contract(spark, sf_correct):
    """The kept doc is a cluster member whose classifier score equals the
    cluster max (min doc_id among ties), and cluster partitioning is
    identical to the min-id representative op's."""
    from pyspark.sql import functions as F

    from mapreduce_c_implementation_spark.operators.dedup import dedup_cc_stars
    from mapreduce_c_implementation_spark.operators.textanalysis import (
        quality_classifier_inference,
    )

    reps = {r.cluster_id: r for r in _rows(spark, sf_correct, "dedup_quality_representatives")}
    assert reps

    # same clusters + sizes as the min-id variant (labels are shared)
    minid = {
        r.doc_id: r.cluster_size
        for r in _rows(spark, sf_correct, "dedup_keep_representatives")
    }
    assert {c: r.cluster_size for c, r in reps.items()} == minid

    labels = dedup_cc_stars(spark, sf_correct)
    scores = quality_classifier_inference(spark, sf_correct).select(
        "doc_id", "score_sum_micro"
    )
    member = (
        labels.join(scores, "doc_id", "left")
        .select(
            "cluster_id",
            "doc_id",
            F.coalesce("score_sum_micro", F.lit(0)).alias("score"),
        )
        .collect()
    )
    by_cluster: dict = {}
    for m in member:
        by_cluster.setdefault(m.cluster_id, []).append((m.score, m.doc_id))
    for cid, r in reps.items():
        best_score = max(s for s, _ in by_cluster[cid])
        best_doc = min(d for s, d in by_cluster[cid] if s == best_score)
        assert r.kept_score_micro == best_score, cid
        assert r.kept_doc_id == best_doc, cid
    # the quality rule must actually diverge from min-id somewhere on a
    # multi-doc cluster, or the op is vacuous on this fixture
    multi = [c for c, r in reps.items() if r.cluster_size > 1]
    assert multi, "fixture has no multi-doc near-dup clusters"
    assert any(reps[c].kept_doc_id != c for c in multi), (
        "argmax-by-quality never disagreed with min-id — check the score join"
    )


def test_isotonic_fit_is_monotone_and_bounded(spark, sf_correct):
    """The calibrated rate must be non-decreasing in the score bin
    (the whole point of isotonic regression) and bounded by the raw
    bin rates' range (a PAV invariant)."""
    rows = _rows(spark, sf_correct, "isotonic_calibration_rewrite")
    assert rows
    per_bin = {}
    for r in rows:
        per_bin[r.bin] = (r.raw_rate_ppm, r.iso_rate_ppm)
    bins = sorted(per_bin)
    iso = [per_bin[b][1] for b in bins]
    raw = [per_bin[b][0] for b in bins]
    assert iso == sorted(iso), f"isotonic fit not monotone: {list(zip(bins, iso))}"
    assert min(raw) <= min(iso) and max(iso) <= max(raw)
    assert all(0 <= v <= 1_000_000 for v in iso)
    # the fixture's raw curve must have at least one violation for the
    # fit to actually pool (otherwise iso == raw and the op is a no-op)
    if raw != sorted(raw):
        assert iso != raw, "raw curve has violations but the fit changed nothing"


def test_leakage_repair_closes_the_audit(spark, sf_correct):
    """After applying the repair, every previously leaked fingerprint
    group lives in exactly one split; every leaked group from the audit
    is covered; moved docs are a strict, non-empty subset."""
    audit = _rows(spark, sf_correct, "cross_split_leakage_audit")
    leaked_keys = {r.content_key for r in audit if r.leaked == 1}
    assert leaked_keys, "fixture has no cross-split leaks to repair"

    repair = _rows(spark, sf_correct, "leakage_split_repair")
    assert {r.content_key for r in repair} == leaked_keys

    by_key: dict = {}
    for r in repair:
        by_key.setdefault(r.content_key, []).append(r)
    n_moved = 0
    for key, members in by_key.items():
        new_splits = {m.new_split for m in members}
        assert len(new_splits) == 1, f"group {key} repaired into {new_splits}"
        # canonical split is the min-doc_id member's original split
        canon = min(members, key=lambda m: m.doc_id)
        assert new_splits == {canon.old_split}, key
        for m in members:
            assert m.moved == (1 if m.old_split != m.new_split else 0)
        n_moved += sum(m.moved for m in members)
    assert n_moved > 0, "a leaked group must move at least one doc"


def test_overlap_spans_are_maximal_disjoint_windows(spark, sf_correct):
    """Per-doc spans are disjoint, non-adjacent (else they'd have been
    merged), at least one window wide, and consistent with the window
    counts of exact_substring_duplicates."""
    rows = _rows(spark, sf_correct, "substring_overlap_spans")
    assert rows
    by_doc: dict = {}
    for r in rows:
        assert r.span_len == r.span_end - r.span_start
        assert r.span_len >= SUBSTR_WIN
        assert r.n_windows >= 1
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    for doc, spans in by_doc.items():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            # a next span starting at or before the previous end would
            # have been merged into it
            assert s2 > e1, f"doc {doc}: spans [{s1},{e1}) and [{s2},{e2})"
    # total duplicated-window occurrences must match the pair detector's
    n_span_windows = sum(r.n_windows for r in rows)
    dup_occurrences = sum(
        r.n_occurrences
        for r in _rows(spark, sf_correct, "exact_substring_duplicates")
    )
    assert n_span_windows == dup_occurrences


def test_toxicity_filter_verdicts_consistent(spark, sf_correct):
    from mapreduce_c_implementation_spark.operators.corpus_filters import (
        TOX_MAX_PPM,
    )

    rows = _rows(spark, sf_correct, "toxicity_wordlist_filter")
    assert rows
    assert any(r.verdict == "drop" for r in rows), "threshold never fires"
    assert any(r.verdict == "keep" for r in rows), "threshold always fires"
    for r in rows:
        assert r.flagged_ppm == r.n_flagged * 1_000_000 // r.n_tokens
        assert r.verdict == ("drop" if r.flagged_ppm >= TOX_MAX_PPM else "keep")
        assert 0 <= r.n_flagged <= r.n_tokens


def test_winnowing_guarantees_coverage_of_long_shared_runs(spark, sf_correct):
    """Every fingerprint pair detected by mod-stride anchoring's token
    twin should also be findable by winnowing on dense-duplicate docs;
    cheap proxy: winnowing must select at least one fingerprint per
    WINNOW_W-gram window, so per-doc selected counts are bounded below
    by n_grams/WINNOW_W (coverage) and the multi-doc table is non-empty
    on this fixture."""
    rows = _rows(spark, sf_correct, "winnowing_fingerprint_dedup")
    assert rows, "fixture word salad must collide on 3-gram fingerprints"
    for r in rows:
        assert r.n_docs >= 2
        assert r.n_selected >= r.n_docs
        assert r.min_doc < r.max_doc


def test_generation_eval_metric_bounds(spark, sf_correct):
    rows = _rows(spark, sf_correct, "generation_eval_overlap")
    assert rows
    for r in rows:
        assert 0 <= r.rouge1_f_ppm <= 1_000_000
        assert 0 <= r.rouge2_f_ppm <= 1_000_000
        assert r.overlap2 <= r.overlap1 or r.overlap1 == 0
        if r.exact_match == 1:
            assert r.rouge1_f_ppm == 1_000_000
    # the word-salad fixture shares vocabulary: overlap must be non-trivial
    assert any(r.rouge1_f_ppm > 0 for r in rows)


def test_doremi_upweights_hard_domains(spark, sf_correct):
    rows = _rows(spark, sf_correct, "doremi_domain_reweighting")
    assert rows
    total_new = sum(r.new_weight_ppm for r in rows)
    total_base = sum(r.base_weight_ppm for r in rows)
    # floor divisions under-count by < 1 ppm per source
    assert 1_000_000 - len(rows) <= total_new <= 1_000_000
    assert 1_000_000 - len(rows) <= total_base <= 1_000_000
    # exponentiated gradient: ordering by excess shifts weight toward
    # high-surprisal sources relative to their base share
    hardest = max(rows, key=lambda r: r.excess_micro)
    easiest = min(rows, key=lambda r: r.excess_micro)
    if hardest.excess_micro > easiest.excess_micro:
        assert (
            hardest.new_weight_ppm * easiest.base_weight_ppm
            >= easiest.new_weight_ppm * hardest.base_weight_ppm
        )


def test_best_of_n_keeps_group_argmax(spark, sf_correct):
    rows = _rows(spark, sf_correct, "best_of_n_rejection_sampling")
    assert rows
    for r in rows:
        assert r.best_reward_bp >= r.mean_reward_bp
        assert r.gain_bp == r.best_reward_bp - r.mean_reward_bp
        assert r.best_doc_id // 4 == r.prompt_id
        assert 1 <= r.n_samples <= 4
    assert any(r.gain_bp > 0 for r in rows), "best-of-n never gained"


def test_lm_holdout_scores_unseen_mass(spark, sf_correct):
    rows = _rows(spark, sf_correct, "lm_holdout_perplexity")
    assert rows
    for r in rows:
        assert 0 <= r.n_oov <= r.n_tokens
        assert r.oov_ppm == r.n_oov * 1_000_000 // r.n_tokens
        assert r.avg_nll_micro > 0
        # ppl = exp(avg_nll) must exceed 1 (milli > 1000)
        assert r.ppl_milli > 1000
    # held-out perplexity must not be degenerate: at least one source
    # with in-vocabulary tokens (oov < 100%)
    assert any(r.oov_ppm < 1_000_000 for r in rows)


def test_elo_ratings_are_consistent(spark, sf_correct):
    rows = _rows(spark, sf_correct, "elo_pairwise_ratings")
    assert rows
    total_w = sum(r.n_wins for r in rows)
    total_l = sum(r.n_losses for r in rows)
    total_t = sum(r.n_ties for r in rows)
    # every match contributes one win+loss or two ties
    assert total_w == total_l
    assert total_t % 2 == 0
    assert sum(r.n_matches for r in rows) == total_w + total_l + total_t
    for r in rows:
        assert r.n_matches == r.n_wins + r.n_losses + r.n_ties
        if r.n_wins > r.n_losses:
            assert r.rating_milli > 0
        if r.n_wins < r.n_losses:
            assert r.rating_milli < 0


def test_diversity_cap_binds_on_dense_buckets(spark, sf_correct):
    from mapreduce_c_implementation_spark.operators.similarity import DIV_CAP

    rows = _rows(spark, sf_correct, "cluster_capped_diversity_sample")
    assert rows
    by_bucket: dict = {}
    for r in rows:
        assert 1 <= r.rk <= DIV_CAP
        by_bucket.setdefault(r.bucket, []).append(r)
    for bucket, members in by_bucket.items():
        n_bucket = members[0].n_bucket
        assert all(m.n_bucket == n_bucket for m in members)
        assert len(members) == min(n_bucket, DIV_CAP)
    # the cap must actually bind somewhere on this fixture
    assert any(m[0].n_bucket > DIV_CAP for m in by_bucket.values())


def test_kneser_ney_scores_are_valid_nll(spark, sf_correct):
    """KN probabilities are in (0, 1), so every per-doc NLL is positive;
    the KN ranking must correlate with (but not equal) the add-one LM's."""
    kn = {r.doc_id: r for r in _rows(spark, sf_correct, "kneser_ney_bigram_lm")}
    addone = {
        r.doc_id: r.avg_neg_logprob_micro
        for r in _rows(spark, sf_correct, "ngram_lm_perplexity")
    }
    assert kn
    for r in kn.values():
        assert r.neg_logprob_micro > 0
        assert r.avg_neg_logprob_micro > 0
        assert r.n_bigrams >= 1
    assert set(kn) == set(addone)
    # different smoothing must produce different numbers somewhere
    assert any(
        kn[d].avg_neg_logprob_micro != addone[d] for d in kn
    ), "KN degenerated to the add-one model"


def test_ensemble_rank_is_percentile_average(spark, sf_correct):
    rows = _rows(spark, sf_correct, "quality_signal_ensemble_rank")
    assert rows
    n = len(rows)
    for r in rows:
        assert 0 < r.ensemble_ppm < 1_000_000
    # a doc that dominates another on ALL THREE signals must not rank lower
    import random

    rng = random.Random(8)
    sample = rng.sample(rows, min(60, n))
    checked = 0
    for a in sample:
        for b in sample:
            if (
                a.s1_bp > b.s1_bp and a.s2_bp > b.s2_bp and a.s3_milli > b.s3_milli
            ):
                assert a.ensemble_ppm > b.ensemble_ppm, (a, b)
                checked += 1
    assert checked > 0


def test_trim_rewrite_reconstructs_exact_remainder(spark, sf_correct):
    """Recompute one trimmed doc in Python from the span table and the
    raw text: the op's md5 must match the ground-truth stitch."""
    import hashlib

    spans = {}
    for r in _rows(spark, sf_correct, "substring_overlap_spans"):
        spans.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    rows = {r.doc_id: r for r in _rows(spark, sf_correct, "substring_trim_rewrite")}
    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_correct}/documents.parquet").collect()
    }
    assert set(rows) == set(texts)
    checked_cut = 0
    for doc_id, r in rows.items():
        text = texts[doc_id]
        cut = sorted(spans.get(doc_id, []))
        expected = ""
        pos = 1  # 1-based char offsets, span_end exclusive
        for s, e in cut:
            expected += text[pos - 1 : s - 1]
            pos = e
        expected += text[pos - 1 :]
        assert r.n_cut_spans == len(cut)
        assert r.kept_chars == len(expected)
        assert r.n_cut_chars == len(text) - len(expected)
        assert r.trimmed_md5 == hashlib.md5(expected.encode()).hexdigest(), doc_id
        if cut:
            checked_cut += 1
    assert checked_cut > 0, "no doc was actually trimmed on this fixture"


def test_count_min_never_undercounts(spark, sf_correct):
    from mapreduce_c_implementation_spark.operators.textanalysis import CM_TOPK

    rows = _rows(spark, sf_correct, "count_min_sketch_tokens")
    assert len(rows) == CM_TOPK
    for r in rows:
        assert r.cm_estimate >= r.exact_count, r.token
        assert r.overcount == r.cm_estimate - r.exact_count
    # with 64 counters vs a larger vocabulary, collisions must exist
    assert any(r.overcount > 0 for r in rows), "no collision — sketch too wide?"


def test_matryoshka_recall_bounds(spark, sf_correct):
    from mapreduce_c_implementation_spark.operators.similarity import (
        MRL_K,
        N_QUERIES,
    )

    rows = _rows(spark, sf_correct, "matryoshka_truncation_recall")
    assert len(rows) == N_QUERIES
    for r in rows:
        assert 0 <= r.n_hits <= MRL_K
        assert r.recall_ppm == r.n_hits * 1_000_000 // MRL_K
    # truncating 64 -> 16 dims on random-ish embeddings must lose SOME
    # neighbor somewhere (else the eval is vacuous)
    assert any(r.n_hits < MRL_K for r in rows)
    assert any(r.n_hits > 0 for r in rows)


def test_entity_resolution_partitions_all_parts(spark, sf_correct):
    """Entities partition the part table: member counts sum to |part|,
    the canonical record is always the min-key member's name, and
    union-find over the value-grain linkage pairs reproduces the op's
    (entity_id, n_members, n_name_variants) table exactly."""
    rows = {r.entity_id: r for r in _rows(spark, sf_correct, "entity_resolution_clusters")}
    assert rows
    n_parts = spark.read.parquet(f"{sf_correct}/part.parquet").count()
    assert sum(r.n_members for r in rows.values()) == n_parts
    assert all(r.canonical_name is not None for r in rows.values())
    assert any(r.n_members > 1 for r in rows.values()), "no entity merged"
    assert any(r.n_name_variants > 1 for r in rows.values())
    # ground truth: union-find over the NAME-grain linkage pairs (the
    # value-grain contract: every row of a name follows its name's
    # component; unmatched names are one entity per NAME)
    from mapreduce_c_implementation_spark.operators.dedup import (
        record_linkage_blocked,
    )

    pair_rows = record_linkage_blocked(spark, sf_correct).collect()
    part = (
        spark.read.parquet(f"{sf_correct}/part.parquet")
        .select("p_partkey", "p_name")
        .collect()
    )
    rep, cnt = {}, {}
    for p in part:
        rep[p.p_name] = min(rep.get(p.p_name, p.p_partkey), p.p_partkey)
        cnt[p.p_name] = cnt.get(p.p_name, 0) + 1
    parent = {k: k for k in rep.values()}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for pr in pair_rows:
        assert pr.key_a == rep[pr.name_a] and pr.key_b == rep[pr.name_b]
        assert (pr.n_rows_a, pr.n_rows_b) == (cnt[pr.name_a], cnt[pr.name_b])
        ra, rb = find(pr.key_a), find(pr.key_b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth = {}
    for name, r in rep.items():
        root = find(r)  # min-key root (unions always point max -> min)
        members, variants = truth.get(root, (0, 0))
        truth[root] = (members + cnt[name], variants + 1)
    assert truth == {e: (r.n_members, r.n_name_variants) for e, r in rows.items()}


def test_stream_rate_monitor_alert_consistency(spark, sf_correct):
    from mapreduce_c_implementation_spark.streaming.queries import (
        RATE_ALERT_Z2_MILLI,
    )

    rows = _rows(spark, sf_correct, "stream_rate_anomaly_monitor")
    assert rows
    for r in rows:
        assert 0 <= r.n_hits <= r.n_events
        assert r.rate_ppm == r.n_hits * 1_000_000 // r.n_events
        assert r.z2_milli >= 0
        assert r.alert == (1 if r.z2_milli >= RATE_ALERT_Z2_MILLI else 0)
    # all windows share one baseline
    assert len({r.base_rate_ppm for r in rows}) == 1


def test_conformal_coverage_meets_guarantee(spark, sf_correct):
    """Split-conformal with alpha=10%: empirical held-out coverage of the
    exact calibration order statistic should sit near (and in
    expectation above) 1 - alpha; hard-check the construction instead
    of the stochastic bound: threshold covers >= ceil((n+1)*0.9)/n of
    the calibration scores by definition."""
    (r,) = _rows(spark, sf_correct, "conformal_prediction_threshold")
    assert 0 <= r.threshold_bp <= 10_000
    assert r.n_covered <= r.n_test_pos
    assert r.coverage_ppm == r.n_covered * 1_000_000 // r.n_test_pos
    # coverage should land in a loose band around 1 - alpha = 0.9
    assert 750_000 <= r.coverage_ppm <= 1_000_000, r.coverage_ppm


def test_woe_iv_signs_track_rates(spark, sf_correct):
    rows = _rows(spark, sf_correct, "woe_information_value")
    assert rows
    tot_pos = sum(r.n_pos for r in rows)
    tot_neg = sum(r.n_neg for r in rows)
    b = len(rows)
    for r in rows:
        # WOE positive iff the bucket's smoothed positive share exceeds
        # its smoothed negative share
        lhs = (r.n_pos + 1) * (tot_neg + b)
        rhs = (r.n_neg + 1) * (tot_pos + b)
        if lhs > rhs:
            assert r.woe_micro > 0, r
        if lhs < rhs:
            assert r.woe_micro < 0, r
        # IV contribution has the sign of share_delta * woe: both flip
        # together, so iv >= 0 except for floor-division edge ties
        if abs(r.woe_micro) > 5:
            assert r.iv_pico >= 0, r
