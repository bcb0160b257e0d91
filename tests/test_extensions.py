"""Behavioral tests for the training-data-pipeline extensions beyond the
oracle diffs (which test_operators_vs_oracle.py covers)."""

from __future__ import annotations

import pytest

from mapreduce_c_implementation_spark.registry import get_operator


def test_real_decode_is_stubbed():
    from mapreduce_c_implementation_spark.operators.multimodal import _decode_image_real

    with pytest.raises(NotImplementedError):
        _decode_image_real(b"\x89PNG fake")


def test_lsh_is_subset_of_bruteforce(spark, sf_correct):
    """LSH neighbors must be genuine corpus vectors with correct cosines:
    every (query, neighbor, cosine) in the LSH result appears in the
    brute-force scored set (rank may differ — recall loss is expected)."""
    bf = (
        get_operator("ann_bruteforce_topk")
        .query_fn(spark, sf_correct)
        .select("query_id", "neighbor_id", "cosine")
        .collect()
    )
    lsh = (
        get_operator("ann_lsh_bucketed")
        .query_fn(spark, sf_correct)
        .select("query_id", "neighbor_id", "cosine")
        .collect()
    )
    bf_top = {(r.query_id, r.neighbor_id): r.cosine for r in bf}
    # LSH top-ranked pairs that ARE in the brute-force top-k must agree
    # on the cosine value exactly (same fold order).
    agreeing = [
        r for r in lsh if (r.query_id, r.neighbor_id) in bf_top
    ]
    assert agreeing, "LSH found nothing from the exact top-k at all"
    for r in agreeing:
        assert abs(bf_top[(r.query_id, r.neighbor_id)] - r.cosine) < 1e-9


def test_minhash_flags_jaccard_similar_pairs(spark, sf_correct):
    """MinHash-LSH candidates and exact Jaccard pairs overlap: every
    high-jaccard pair (>= 0.5) should be recalled by at least the exact
    pipeline, and minhash candidates must be real documents."""
    jac = (
        get_operator("dedup_ngram_jaccard").query_fn(spark, sf_correct).collect()
    )
    mh = get_operator("dedup_minhash_lsh").query_fn(spark, sf_correct).collect()
    jac_pairs = {(r.doc_a, r.doc_b) for r in jac if r.jaccard >= 0.5}
    mh_pairs = {(r.doc_a, r.doc_b) for r in mh}
    if jac_pairs:
        # banding (4 bands x 3 rows) catches most >= 0.5-jaccard pairs;
        # require at least half to guard against a broken signature.
        assert len(jac_pairs & mh_pairs) >= len(jac_pairs) // 2


def test_dedup_exact_identity_when_no_dups(spark, sf_correct):
    df = get_operator("dedup_exact").query_fn(spark, sf_correct)
    rows = df.collect()
    n_docs = spark.read.parquet(f"{sf_correct}/documents.parquet").count()
    assert sum(r.n_copies for r in rows) == n_docs

def test_driver_priority_window():
    """The driver's CORRECTNESS gate checks a 50-query prefix of queries().
    Round 2 rotates every round-1-unchecked operator (plus the fixed
    input_lineage) into that window — pin the contract here."""
    import __spark_entry__ as se
    from mapreduce_c_implementation_spark.registry import _DRIVER_PRIORITY, all_operators

    names = list(se.queries())
    ops = all_operators()
    # priority names exist, are unique, and lead the queries() ordering
    assert len(_DRIVER_PRIORITY) == len(set(_DRIVER_PRIORITY))
    assert len(_DRIVER_PRIORITY) <= 50
    missing = [n for n in _DRIVER_PRIORITY if n not in ops]
    assert not missing, f"priority names not registered: {missing}"
    assert names[: len(_DRIVER_PRIORITY)] == _DRIVER_PRIORITY
    window = set(names[:50])
    must_check = {
        "input_lineage", "dedup_minhash_lsh", "ann_lsh_bucketed",
        "tpch_q3_shipping_priority", "tpch_q5_local_supplier",
        "stream_stateful_totals", "apply_in_pandas_zscore",
        "null_semantics", "explode_outer_tokens",
        "corpus_quality_filter", "deterministic_split",
        "tpch_q4_order_priority",
    }
    assert must_check <= window
    # oracle_sql() ordering must mirror queries() so the driver pairs them
    osql = list(se.oracle_sql())
    assert [n for n in names if n in set(osql)] == osql


def test_frame_sample_digest_non_ascii_parity():
    """The frame digest is BYTE-based in both engines (hex-slice route):
    parity must hold for non-ASCII text, not just the ASCII fixture."""
    import hashlib

    import duckdb

    from mapreduce_c_implementation_spark.operators.multimodal import (
        FRAME_BYTES,
        FRAME_STRIDE,
    )

    text = "Ωmélange ÷ 中文テキスト ß " * 37
    data = text.encode()
    frames = [data[o : o + FRAME_BYTES] for o in range(0, len(data), FRAME_BYTES)]
    sampled = frames[::FRAME_STRIDE]
    py_count = len(sampled)
    py_digest = hashlib.md5(
        "".join(f.hex() for f in sampled).encode()
    ).hexdigest()

    con = duckdb.connect()
    n, digest = con.execute(f"""
    SELECT CAST(count(*) AS BIGINT),
           md5(string_agg(chunk_hex, '' ORDER BY i))
    FROM (
      SELECT i, lower(substr(hex(encode(?)),
                             (i - 1) * {2 * FRAME_BYTES} + 1,
                             {2 * FRAME_BYTES})) AS chunk_hex
      FROM unnest(generate_series(
             1, CAST(ceil(octet_length(encode(?)) / {FRAME_BYTES}.0) AS INT),
             {FRAME_STRIDE})) AS t(i)
    )
    """, [text, text]).fetchone()
    assert (n, digest) == (py_count, py_digest)
