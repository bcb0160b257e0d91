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
RANK_PARTS = 32


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
    exact ntile({N_BINS}) semantics over a TOTAL order (value, then key
    — ties broken deterministically, so bin edges cannot depend on
    partition layout), reported as per-bin count and [lo, hi] envelope.

    A bare ``ntile() OVER (ORDER BY ...)`` moves the whole table into
    ONE window task (ADVICE r2) — instead the global rank is computed
    the scalable way (the QuantileDiscretizer recipe, made exact):

    1. ``approxQuantile`` cut points split the value domain into
       {RANK_PARTS} ranges; each row's range id ``pid`` is a pure
       codegen'd fold over the cut literals — a DETERMINISTIC function
       of the value, so every consumer branch agrees on it (a
       ``repartitionByRange``+``spark_partition_id`` pid would depend
       on boundary sampling and break if the exchange isn't reused).
    2. ``row_number`` ranks WITHIN each pid (window groups are
       ~data/{RANK_PARTS}, parallel); a broadcast of the
       {RANK_PARTS}-row per-pid prefix sums lifts local ranks to
       global ranks.
    3. The ntile bucket is then pure arithmetic on (rank, total): with
       q = n div {N_BINS}, r = n mod {N_BINS}, the first r buckets
       take q+1 rows and the rest q — byte-identical to the oracle's
       ntile.

    No stage ever holds more than one value-range of the data; the
    driver-sized objects are the cut-point list and the
    {RANK_PARTS}-row offsets table.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    cuts = o.approxQuantile(
        "o_totalprice", [i / RANK_PARTS for i in range(1, RANK_PARTS)], 0.01
    )
    # pid = #cuts below the value — a flat sum of comparisons (NOT an
    # F.aggregate lambda: a higher-order function inside a grouping
    # expression trips Catalyst attribute binding on a plain session).
    pid_expr = sum(
        (F.when(F.col("o_totalprice") >= float(c), 1).otherwise(0) for c in cuts),
        F.lit(0),
    ).alias("pid")
    keyed = o.select("o_orderkey", "o_totalprice", pid_expr)
    local = keyed.withColumn(
        "lr",
        F.row_number().over(
            Window.partitionBy("pid").orderBy("o_totalprice", "o_orderkey")
        ),
    )
    # RANK_PARTS-row side table: exclusive prefix sum of range sizes
    # plus the grand total — metadata-scale, broadcast by size.
    wpid = Window.orderBy("pid")
    offsets = (
        keyed.groupBy("pid")
        .agg(F.count("*").alias("c"))
        .select(
            "pid",
            F.coalesce(
                F.sum("c").over(wpid.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ).alias("off"),
            F.sum("c")
            .over(wpid.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
            .alias("total"),
        )
    )
    rank = F.col("off") + F.col("lr")
    q = F.floor(F.col("total") / N_BINS)
    r = F.col("total") % N_BINS
    cut = r * (q + 1)  # ranks <= cut live in the first r (fat) buckets
    binned = local.join(F.broadcast(offsets), "pid").select(
        "o_totalprice",
        F.when(rank <= cut, F.floor((rank - 1) / (q + 1)) + 1)
        .otherwise(r + F.floor((rank - cut - 1) / q) + 1)
        .cast("int")
        .alias("bin"),
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
