"""Round-12 operator semantics: delete propagation across persisted
indexes, and supporting checks the driver's DuckDB differential cannot
express (reading the maintained catalog tables themselves)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from mapreduce_c_implementation_spark.registry import get_operator


def test_rtbf_propagation_matches_rebuild_and_tables_are_clean(
    spark, sf_correct
):
    """The audit must report rebuild_match=1 for every index (post-delete
    snapshot == from-scratch derivation on survivors), the row arithmetic
    must close, and — the part the oracle can't see — the v2 CATALOG
    TABLES must contain zero rows for deleted doc_ids."""
    from mapreduce_c_implementation_spark.operators.dedup import (
        RTBF_DELETE_MOD,
        RTBF_DELETE_REM,
    )

    rows = (
        get_operator("index_delete_propagation")
        .query_fn(spark, sf_correct)
        .collect()
    )
    assert len(rows) == 3
    by_name = {r.index_name: r for r in rows}
    assert set(by_name) == {
        "substring_win_index",
        "minhash_band_index",
        "cas_membership_index",
    }
    for r in rows:
        assert r.rebuild_match == 1, r
        assert r.rows_before - r.rows_deleted == r.rows_after, r
        assert r.rows_deleted > 0, r  # the delete set is non-empty

    tag = hashlib.md5(sf_correct.encode()).hexdigest()[:8]
    for short in ("sscr", "mh", "cas"):
        v2 = spark.table(f"b_rtbf_{short}_{tag}_v2")
        leaked = v2.filter(
            F.col("doc_id") % RTBF_DELETE_MOD == RTBF_DELETE_REM
        ).count()
        assert leaked == 0, f"deleted docs leaked in b_rtbf_{short}_{tag}_v2"


def test_rtbf_cas_keeper_promotion_on_synthetic_dups(spark):
    """When a CAS group's keeper doc is deleted, the served aggregate
    over the surviving membership must promote the next-lowest member
    and decrement the refcount — exercised synthetically because the
    sf0.001 CORRECTNESS fixture has no byte-identical payloads (sf0.1
    does ship 8 duplicate texts; the membership-vs-group count grain
    that distinction exposes is pinned by
    test_rtbf_cas_counts_are_membership_grain below)."""
    members = spark.createDataFrame(
        [
            # group A: keeper 5 deleted (5 % 13 == 5), survivors 6, 20
            (5, "sha_a", 100),
            (6, "sha_a", 100),
            (20, "sha_a", 100),
            # group B: untouched
            (2, "sha_b", 50),
            (7, "sha_b", 50),
            # group C: sole member deleted -> group disappears
            (18 + 13 * 2, "sha_c", 9),  # 44 % 13 == 5
        ],
        "doc_id long, payload_sha256 string, n_bytes long",
    )
    deletes = members.filter(F.col("doc_id") % 13 == 5).select("doc_id")
    survivors = members.join(F.broadcast(deletes), "doc_id", "anti")
    served = (
        survivors.groupBy("payload_sha256")
        .agg(
            F.count("*").cast("long").alias("n_copies"),
            F.min("doc_id").cast("long").alias("keeper_doc"),
            F.min("n_bytes").cast("long").alias("n_bytes"),
        )
        .collect()
    )
    by_sha = {r.payload_sha256: r for r in served}
    assert by_sha["sha_a"].keeper_doc == 6  # promoted past deleted 5
    assert by_sha["sha_a"].n_copies == 2  # refcount decremented
    assert by_sha["sha_b"].keeper_doc == 2  # untouched group unchanged
    assert by_sha["sha_b"].n_copies == 2
    assert "sha_c" not in by_sha  # fully-deleted group removed


def test_rtbf_cas_counts_are_membership_grain(spark, tmp_path):
    """ADVICE r12 (high): on a corpus WITH byte-identical payloads the
    CAS audit's row counts must stay at MEMBERSHIP grain (one row per
    (doc, payload)) while the checksum covers the served refcount
    aggregate — a count taken over the aggregate view undercounts and
    diverges from the oracle.  Run the full op against a synthetic
    corpus where the grains demonstrably differ."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapreduce_c_implementation_spark.operators.dedup import (
        RTBF_DELETE_MOD,
        RTBF_DELETE_REM,
    )

    # 12 docs, 3 payload groups (sizes 6/4/2) — membership grain 12,
    # group grain 3.  Texts are long enough to survive every index
    # derivation; doc_ids 5 and 18 (% 13 == 5) are the delete set, both
    # members of group A, so group A's refcount drops by 2.
    texts = {"A": "alpha " * 40, "B": "bravo " * 40, "C": "charlie " * 40}
    members = [(5, "A"), (6, "A"), (18, "A"), (20, "A"), (33, "A"),
               (46, "A"), (2, "B"), (7, "B"), (9, "B"), (11, "B"),
               (3, "C"), (4, "C")]
    rows = [(i, texts[g], "en", "synthetic", len(texts[g]))
            for i, g in members]
    tbl = pa.Table.from_pylist(
        [dict(zip(("doc_id", "text", "lang", "source", "n_chars"), r))
         for r in rows],
        schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                          ("lang", pa.string()), ("source", pa.string()),
                          ("n_chars", pa.int64())]),
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    out = (
        get_operator("index_delete_propagation")
        .query_fn(spark, str(tmp_path))
        .collect()
    )
    cas = {r.index_name: r for r in out}["cas_membership_index"]
    deleted = [i for i, _ in members
               if i % RTBF_DELETE_MOD == RTBF_DELETE_REM]
    assert deleted == [5, 18]
    assert cas.rows_before == len(members)          # 12, not 3 groups
    assert cas.rows_deleted == len(deleted)         # 2 membership rows
    assert cas.rows_after == len(members) - len(deleted)  # 10, not 3
    assert cas.rebuild_match == 1, cas


def test_mh_index_append_table_state(spark, sf_correct):
    """After dedup_minhash_index_append runs, the maintained catalog
    table must equal old-corpus bands ∪ accepted docs' bands exactly —
    verified against the table itself, not just the audit columns — and
    the staged increment must exercise BOTH decision branches."""
    import hashlib

    from pyspark.sql import functions as F

    from mapreduce_c_implementation_spark.operators.dedup import (
        _inc_is_new,
        _minhash_bands,
    )

    out = (
        get_operator("dedup_minhash_index_append")
        .query_fn(spark, sf_correct)
        .cache()
    )
    try:
        n_acc = out.filter(F.col("accepted") == 1).count()
        n_rej = out.filter(F.col("accepted") == 0).count()
        assert n_acc > 0 and n_rej > 0, (n_acc, n_rej)
        # audit columns are constant across rows
        assert out.select("index_rows_after").distinct().count() == 1

        tag = hashlib.md5(sf_correct.encode()).hexdigest()[:8]
        tbl = spark.table(f"b_mha_index_{tag}")
        bands = _minhash_bands(spark, sf_correct).select(
            "doc_id",
            F.concat_ws(
                "#", F.col("band_idx").cast("string"), F.col("band_key")
            ).alias("bkey"),
        )
        accepted_ids = out.filter(F.col("accepted") == 1).select("doc_id")
        expected = bands.filter(~_inc_is_new()).unionByName(
            bands.join(accepted_ids, "doc_id", "semi")
        )
        assert tbl.count() == expected.count()
        assert tbl.exceptAll(expected).isEmpty()
        assert expected.exceptAll(tbl).isEmpty()
        # rejected docs' bands must NOT be in the index
        rejected_ids = out.filter(F.col("accepted") == 0).select("doc_id")
        assert tbl.join(rejected_ids, "doc_id", "semi").count() == 0
    finally:
        out.unpersist()


def test_bucket_compaction_restores_one_file_per_bucket(spark, sf_correct):
    """Compaction must preserve content exactly (audit columns all
    green) AND restore the one-file-per-bucket layout: the staged
    append history leaves CMPB_SLICES files per bucket, the v2 snapshot
    exactly CMPB_BUCKETS files total."""
    import glob

    from mapreduce_c_implementation_spark.sources.io_ops import (
        CMPB_BUCKETS,
        CMPB_SLICES,
        index_bucket_compaction,
    )

    row = (
        get_operator("index_bucket_compaction")
        .query_fn(spark, sf_correct)
        .collect()[0]
    )
    assert row.content_match == 1 and row.files_reduced == 1, row
    tbl, v2 = index_bucket_compaction.last_tables
    warehouse = "spark-warehouse"
    n_before = len(glob.glob(f"{warehouse}/{tbl}/*.parquet"))
    n_after = len(glob.glob(f"{warehouse}/{v2}/*.parquet"))
    assert n_before == CMPB_BUCKETS * CMPB_SLICES, n_before
    assert n_after == CMPB_BUCKETS, n_after


def test_lifecycle_mor_semantics_and_compaction(spark, sf_correct):
    """Merge-on-read lifecycle: epoch audits must be monotone-consistent
    (inserts grow the live set, tombstones shrink it), the post-
    compaction row must equal the final live view exactly, and the
    compacted table must be physically clean (no tombstoned doc, one
    file per bucket)."""
    import glob

    from pyspark.sql import functions as F

    from mapreduce_c_implementation_spark.operators.dedup import (
        LIFE_DEL_MOD,
        LIFE_EPOCHS,
        MH_INDEX_BUCKETS,
        index_upsert_delete_lifecycle,
    )

    rows = {
        r.epoch: r
        for r in get_operator("index_upsert_delete_lifecycle")
        .query_fn(spark, sf_correct)
        .collect()
    }
    assert set(rows) == set(range(LIFE_EPOCHS + 1))
    assert rows[0].tombstoned_rows == 0
    # tombstones accumulate; live never counts a tombstoned row
    for e in range(1, LIFE_EPOCHS):
        assert rows[e].tombstoned_rows >= rows[e - 1].tombstoned_rows
    assert rows[1].tombstoned_rows > 0  # the staged deletes are non-empty
    # post-compaction == final live view, physically applied
    final, compacted = rows[LIFE_EPOCHS - 1], rows[LIFE_EPOCHS]
    assert compacted.rows_live == final.rows_live
    assert compacted.checksum_live == final.checksum_live
    assert compacted.tombstoned_rows == 0

    tbl, v2 = index_upsert_delete_lifecycle.last_tables
    v2df = spark.table(v2)
    leaked = v2df.filter(
        (F.col("doc_id") % LIFE_EPOCHS < 1)
        & (F.col("doc_id") % LIFE_DEL_MOD == 1)
        | (F.col("doc_id") % LIFE_EPOCHS < 2)
        & (F.col("doc_id") % LIFE_DEL_MOD == 2)
    ).count()
    assert leaked == 0
    n_files = len(glob.glob(f"spark-warehouse/{v2}/*.parquet"))
    assert n_files <= MH_INDEX_BUCKETS, n_files
