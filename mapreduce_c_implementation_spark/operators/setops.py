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
