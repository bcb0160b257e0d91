"""Feature-engineering operators — the tabular-side preprocessing a
training-data pipeline runs next to the text/embedding ops: equi-depth
quantile binning and deterministic label encoding.

Both are built purely from window/aggregate primitives (no fitted
"model" object — the fit IS a query), deterministic under any
partitioning via total-order tie-breaks, and exactly reproducible in the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduce_c_implementation_spark.registry import register
from mapreduce_c_implementation_spark.sources import load_table

N_BINS = 10


@register(
    "feature_quantile_bins",
    oracle_sql=f"""
    WITH binned AS (
      SELECT o_orderkey, o_totalprice,
             ntile({N_BINS}) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
      FROM orders
    )
    SELECT bin, CAST(count(*) AS BIGINT) AS n,
           min(o_totalprice) AS lo, max(o_totalprice) AS hi
    FROM binned
    GROUP BY bin
    ORDER BY bin
    """,
    tags=("features", "binning", "window"),
)
def feature_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth quantile binning (the QuantileDiscretizer shape):
    ntile({N_BINS}) over a TOTAL order (value, then key — ties broken
    deterministically, so bin edges cannot depend on partition layout),
    reported as per-bin count and [lo, hi] envelope.

    Scale note: a global ntile is a single range-partitioned sort — fine
    as the exact form; at 100 TB the approximate path is
    approxQuantile-derived cut points applied as a codegen'd CASE, the
    same trade documented for the sketch ops.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    binned = o.select(
        "o_orderkey", "o_totalprice", F.ntile(N_BINS).over(w).alias("bin")
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("bin")
    )


@register(
    "feature_label_encode",
    oracle_sql="""
    WITH vocab AS (
      SELECT c_mktsegment,
             CAST(count(*) AS BIGINT) AS freq,
             CAST(row_number() OVER (ORDER BY count(*) DESC, c_mktsegment ASC)
                  - 1 AS BIGINT) AS label_idx
      FROM customer
      GROUP BY c_mktsegment
    )
    SELECT c.c_custkey, c.c_mktsegment, v.label_idx
    FROM customer c
    JOIN vocab v ON v.c_mktsegment = c.c_mktsegment
    ORDER BY c.c_custkey
    """,
    tags=("features", "encoding"),
)
def feature_label_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ordered label encoding (the StringIndexer shape):
    categories rank by descending frequency with a lexicographic
    tie-break — fully deterministic, unlike hash-based encoders — and
    the vocabulary joins back to assign each row its integer index.

    Scale: the vocabulary is category-cardinality-sized; it is joined
    WITHOUT a broadcast hint so Catalyst broadcasts it only while it
    actually fits (the TF-IDF vocabulary rule — at 100 TB a string
    column can hold billions of categories, and the join must be
    allowed to fall back to a keyed shuffle).
    """
    c = load_table(spark, sf_dir, "customer")
    vocab = (
        c.groupBy("c_mktsegment")
        .agg(F.count("*").cast("long").alias("freq"))
        .select(
            F.col("c_mktsegment").alias("v_seg"),
            (
                F.row_number().over(
                    Window.orderBy(F.desc("freq"), F.asc("c_mktsegment"))
                )
                - 1
            ).cast("long").alias("label_idx"),
        )
    )
    return (
        c.join(vocab, c.c_mktsegment == F.col("v_seg"))
        .select("c_custkey", "c_mktsegment", "label_idx")
        .orderBy("c_custkey")
    )
