"""Set operations (SURVEY.md §2.2).

The reference's multi-file input is an implicit UNION ALL — the chunk
planner concatenates every input file into one stream
(src/mapreduce.c:119-134).  UNION/INTERSECT/EXCEPT proper have no
reference analog; Spark built-ins supply them.

Scale: UNION ALL is free (plan concatenation, no shuffle).  The
DISTINCT variants are one hash-aggregate shuffle each — Catalyst
rewrites INTERSECT/EXCEPT into aggregated semi/anti joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_c_implementation_spark.registry import register
from mapreduce_c_implementation_spark.sources import load_table


@register(
    "union_all_slices",
    oracle_sql="""
    SELECT o_orderkey, 'high_value' AS src FROM orders WHERE o_totalprice > 150000
    UNION ALL
    SELECT o_orderkey, 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    tags=("setop", "union"),
)
def union_all_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two predicate slices — duplicates retained (bag
    semantics, like the reference's multimap §1.1); an order that is
    both high-value and urgent appears twice with different tags."""
    o = load_table(spark, sf_dir, "orders")
    high = o.filter(F.col("o_totalprice") > 150000).select(
        "o_orderkey", F.lit("high_value").alias("src")
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", F.lit("urgent").alias("src")
    )
    return high.unionAll(urgent)


@register(
    "union_distinct_customers",
    oracle_sql="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
    tags=("setop", "union"),
)
def union_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two overlapping key sets."""
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.union(b).distinct()


@register(
    "intersect_active_customers",
    oracle_sql="""
    SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    """,
    tags=("setop", "intersect"),
)
def intersect_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers ordering in both halves of the date range."""
    o = load_table(spark, sf_dir, "orders")
    early = o.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")).select(
        "o_custkey"
    )
    late = o.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")).select(
        "o_custkey"
    )
    return early.intersect(late)


@register(
    "except_lapsed_customers",
    oracle_sql="""
    SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    """,
    tags=("setop", "except"),
)
def except_lapsed_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers who ordered early but never late."""
    o = load_table(spark, sf_dir, "orders")
    early = o.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")).select(
        "o_custkey"
    )
    late = o.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")).select(
        "o_custkey"
    )
    # subtract == SQL EXCEPT (distinct): any appearance in `late` removes
    # the key entirely (exceptAll would be bag difference — wrong here).
    return early.subtract(late)


@register(
    "merge_upsert_scd1",
    oracle_sql="""
    WITH updates AS (
      SELECT c_custkey,
             round(c_acctbal + 100.0, 2) AS c_acctbal,
             'upd' AS src
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey + 1000000, 0.01, 'new'
      FROM customer WHERE c_custkey % 97 = 0
    )
    SELECT coalesce(u.c_custkey, b.c_custkey) AS c_custkey,
           coalesce(u.c_acctbal, b.c_acctbal) AS acctbal,
           CASE WHEN u.c_custkey IS NULL THEN 'keep'
                WHEN b.c_custkey IS NULL THEN 'insert'
                ELSE 'update' END AS action
    FROM customer b
    FULL OUTER JOIN updates u ON b.c_custkey = u.c_custkey
    """,
    tags=("setop", "merge", "upsert"),
)
def merge_upsert_scd1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert (SCD type 1) from DataFrame primitives — the Delta/
    Iceberg `MERGE INTO` semantics on plain parquet: a full-outer join
    of base vs updates on the key, update wins per column, unmatched
    updates become inserts, unmatched base rows are kept.

    The update set is derived deterministically from the fixture (every
    10th customer re-priced, every 97th cloned to a new key) so both
    engines see identical inputs without a second table.  Scale: one
    key-keyed shuffle join — with the base table BUCKETED on the key
    (see bucketed_join_colocated) the nightly upsert never reshuffles
    the big side; that is exactly how lakehouse MERGE stays linear.
    """
    c = load_table(spark, sf_dir, "customer")
    base = c.select("c_custkey", "c_acctbal")
    updates = (
        base.filter(F.col("c_custkey") % 10 == 0)
        .select(
            "c_custkey",
            F.round(F.col("c_acctbal") + 100.0, 2).alias("u_acctbal"),
        )
        .union(
            base.filter(F.col("c_custkey") % 97 == 0).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                F.lit(0.01).alias("u_acctbal"),
            )
        )
        .withColumnRenamed("c_custkey", "u_custkey")
    )
    merged = base.join(
        updates, base.c_custkey == updates.u_custkey, "full_outer"
    )
    action = (
        F.when(F.col("u_custkey").isNull(), F.lit("keep"))
        .when(F.col("c_custkey").isNull(), F.lit("insert"))
        .otherwise(F.lit("update"))
    )
    return merged.select(
        F.coalesce("u_custkey", "c_custkey").alias("c_custkey"),
        F.coalesce("u_acctbal", "c_acctbal").alias("acctbal"),
        action.alias("action"),
    )


@register(
    "intersect_except_all_bags",
    oracle_sql="""
    WITH a AS (SELECT o_custkey AS k FROM orders
               WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
    b AS (SELECT o_custkey AS k FROM orders
          WHERE o_orderstatus = 'F'),
    i AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b),
    x AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
    SELECT 'intersect_all' AS op,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT k) AS BIGINT) AS n_keys,
           CAST(sum(k) AS BIGINT) AS key_checksum
    FROM i
    UNION ALL
    SELECT 'except_all' AS op,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT k) AS BIGINT) AS n_keys,
           CAST(sum(k) AS BIGINT) AS key_checksum
    FROM x
    ORDER BY op
    """,
    tags=("setop", "bag-semantics"),
)
def intersect_except_all_bags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL bag semantics: INTERSECT ALL keeps min(m, n) copies of a row
    appearing m and n times in the inputs, EXCEPT ALL keeps max(m-n, 0)
    — the multiset algebra the DISTINCT variants
    ([[intersect_active_customers]], [[except_lapsed_customers]])
    deliberately collapse, and the correct tool when row MULTIPLICITY
    is the signal (e.g. per-event streams).  Spark's
    ``intersectAll``/``exceptAll`` compile to one count-aggregate per
    side plus a replicate generator — the same shuffle budget as the
    DISTINCT forms.  Output is a 2-row summary (row count, key count,
    key checksum) so the oracle pins every retained multiplicity
    without a 10k-row result.
    """
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k")
    )

    def summarize(df: DataFrame, op: str) -> DataFrame:
        return df.agg(
            F.lit(op).alias("op"),
            F.count("*").cast("long").alias("n_rows"),
            F.countDistinct("k").cast("long").alias("n_keys"),
            F.sum("k").cast("long").alias("key_checksum"),
        ).select("op", "n_rows", "n_keys", "key_checksum")

    return (
        summarize(a.intersectAll(b), "intersect_all")
        .unionAll(summarize(a.exceptAll(b), "except_all"))
        .orderBy("op")
    )
