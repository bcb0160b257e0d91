"""Property tests for the algorithmic guarantees the round-4 operators
lean on — pure-Python mirrors of the exact formulas the Spark code
uses, hypothesis-driven so the guarantees are checked far beyond the
fixture (the randomized upgrade of the reference's sequential-oracle
discipline, SURVEY.md §5).

These don't re-run Spark (the registry-wide oracle diff already does);
they attack the two spots where a silent off-by-one would produce
wrong-but-plausible results at scale:

1. the PREFIX-LENGTH formula in set_similarity_prefix_join
   (dedup.py): prefix = n - ceil(t*n) + 1 must guarantee that any two
   sets with Jaccard >= t share a prefix element under ANY global
   total order — a formula one shorter silently loses pairs;
2. the SWEEP-ORDER rule in concurrency_sweep (timeseries.py):
   half-open intervals require ends (-1) to sort before starts (+1)
   at equal timestamps — the opposite order overcounts the peak.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

# --- 1. prefix-filter completeness -------------------------------------

T_NUM, T_DEN = 3, 5  # dedup.py PFX_T_NUM / PFX_T_DEN


def prefix(sorted_set: list[int]) -> set[int]:
    """Exactly dedup.py's slice: n - ceil(t*n) + 1 leading elements of
    the globally-ordered set, with ceil(t*n) = (t_num*n + t_den-1) div
    t_den."""
    n = len(sorted_set)
    k = n - ((T_NUM * n + T_DEN - 1) // T_DEN) + 1
    return set(sorted_set[:k])


@settings(max_examples=300, deadline=None)
@given(
    st.sets(st.integers(0, 60), min_size=1, max_size=40),
    st.sets(st.integers(0, 60), min_size=1, max_size=40),
    st.permutations(list(range(61))),
)
def test_prefix_filter_has_no_false_negatives(a, b, order):
    """For ANY global total order, any pair with J >= t must share a
    prefix element — the PPJoin completeness theorem the Spark join
    relies on for exactness."""
    rank = {v: i for i, v in enumerate(order)}
    inter = len(a & b)
    union = len(a | b)
    if inter * T_DEN >= union * T_NUM:  # J >= 3/5
        pa = prefix(sorted(a, key=rank.__getitem__))
        pb = prefix(sorted(b, key=rank.__getitem__))
        assert pa & pb, (sorted(a), sorted(b), order[:10])


def test_prefix_one_shorter_would_miss_pairs():
    """The formula is TIGHT: shrinking the prefix by one element loses
    a qualifying pair — the regression this file exists to catch."""
    # |A| = |B| = 5, J = 4/6 >= 3/5, prefix length 5 - 3 + 1 = 3.
    a, b = {0, 1, 2, 3, 4}, {2, 3, 4, 5, 6}
    order = list(range(7))
    rank = {v: i for i, v in enumerate(order)}
    pa = sorted(a, key=rank.__getitem__)
    pb = sorted(b, key=rank.__getitem__)
    full_a, full_b = prefix(pa), prefix(pb)
    assert full_a & full_b
    # one-shorter prefixes: {0,1} and {2,3} — disjoint, pair lost
    assert not (set(pa[:2]) & set(pb[:2]))


# --- 2. sweep-line order for half-open intervals -----------------------

HOLD = 5  # abstract hold length


def sweep_peak(starts: list[int], ends_before_starts: bool) -> int:
    pts = [(s, 1, i) for i, s in enumerate(starts)] + [
        (s + HOLD, -1, i) for i, s in enumerate(starts)
    ]
    # timeseries.py orders by (t, delta, id): delta=-1 < +1, so ends
    # sweep first at equal t — the half-open rule.
    key = (lambda p: (p[0], p[1], p[2])) if ends_before_starts else (
        lambda p: (p[0], -p[1], p[2])
    )
    load = peak = 0
    for _, d, _ in sorted(pts, key=key):
        load += d
        peak = max(peak, load)
    return peak


def brute_peak(starts: list[int]) -> int:
    """Ground truth: max over every start point of intervals covering
    it (the peak of a step function is attained at some start)."""
    return max(sum(1 for s2 in starts if s2 <= s < s2 + HOLD) for s in starts)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(0, 30), min_size=1, max_size=25))
def test_sweep_order_matches_half_open_truth(starts):
    assert sweep_peak(starts, ends_before_starts=True) == brute_peak(starts)


def test_wrong_sweep_order_overcounts():
    """Starts-before-ends at the same instant counts a closing and an
    opening interval as concurrent — the off-by-one the sort key
    prevents."""
    starts = [0, HOLD]  # back-to-back, never concurrent
    assert brute_peak(starts) == 1
    assert sweep_peak(starts, ends_before_starts=True) == 1
    assert sweep_peak(starts, ends_before_starts=False) == 2


# ---------------------------------------------------------------------------
# BPE merge rewrite: cross-engine string-replace semantics
# ---------------------------------------------------------------------------
# bpe_merge_steps encodes a merge as the literal replace
# ' a b ' -> ' ab ' over the padded symbol string.  Correctness of the
# whole operator rests on Spark's `replace` and DuckDB's `replace`
# agreeing on LEFT-TO-RIGHT NON-OVERLAPPING scan semantics — for a
# self-overlapping pair (' a a ' in ' a a a '), the first match must
# consume its trailing delimiter so the scan resumes AFTER the
# replacement.  The sf0.01 oracle diff may never exercise this case
# (the learned merges there are non-overlapping), so pin it directly.

import duckdb as _duckdb
import pytest as _pytest


@_pytest.mark.parametrize(
    "padded,pair",
    [
        (" a a a ", "a a"),          # odd self-overlap: one merge, tail survives
        (" a a a a ", "a a"),        # even self-overlap: two merges
        (" x a a a y ", "a a"),      # interior run
        (" a b a b a ", "a b"),      # alternating pair
        (" q e r e r ", "e r"),      # realistic suffix run
    ],
)
def test_bpe_replace_semantics_cross_engine(spark, padded, pair):
    merged = pair.replace(" ", "")
    search, repl = f" {pair} ", f" {merged} "
    got_spark = spark.sql(
        "SELECT replace(:s, :f, :t) AS r",
        args={"s": padded, "f": search, "t": repl},
    ).collect()[0].r
    got_duck = _duckdb.sql(
        "SELECT replace(?, ?, ?) AS r", params=[padded, search, repl]
    ).fetchone()[0]
    # python str.replace is the left-to-right non-overlapping reference
    assert got_spark == padded.replace(search, repl) == got_duck
