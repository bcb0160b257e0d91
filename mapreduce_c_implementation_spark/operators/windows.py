"""Window functions (absent in the reference — SURVEY.md §2.2).

The closest reference concept is the sorted-key-per-partition contract
(src/sorting.c + src/reduce.c:64-84): "see a partition's rows in key
order" is exactly what ``Window.partitionBy(...).orderBy(...)`` gives,
generalized with frames and ranking.

Determinism rule (SURVEY §7 risk register): every orderBy includes a
unique tiebreaker column (event_id / o_orderkey / p_partkey) so window
results are a function of the data, not of partition layout.  Running
double sums use the fixed-point trick from functions.exactagg.

Scale: one window spec == one hash exchange on partitionBy keys + one
in-partition sort.  Multiple window columns below share a single spec so
Catalyst computes them in one Window operator, one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduce_c_implementation_spark.functions.exactagg import dec
from mapreduce_c_implementation_spark.registry import register
from mapreduce_c_implementation_spark.sources import load_table


@register(
    "window_topk_per_group",
    oracle_sql="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
    tags=("window", "topk", "headline"),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — THE per-group top-k idiom
    (row_number over partitioned desc order, filter <= k).  Scales as a
    single shuffle+sort; no global sort, no collect."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_lag_lead",
    oracle_sql="""
    SELECT event_id, user_id, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           lag(event_type, 1, 'none') OVER w AS prev_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window", "lag"),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over each user's event timeline (event_id breaks ts
    ties).  All three columns share one window spec -> one shuffle."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("event_type", 1, "none").over(w).alias("prev_type"),
    )


@register(
    "window_running_sum",
    oracle_sql="""
    SELECT event_id, user_id,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DECIMAL(30,6)) AS DOUBLE) AS running_value,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
    FROM events
    """,
    tags=("window", "running"),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-user sum (frame = unbounded preceding .. current).
    Fixed-point accumulation keeps every prefix bit-identical to the
    oracle regardless of each engine's internal frame evaluation."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "event_id",
        "user_id",
        F.sum(dec("value")).over(wf).cast("decimal(30,6)").cast("double").alias(
            "running_value"
        ),
        F.row_number().over(w).cast("long").alias("seq"),
    )


@register(
    "window_rank_percent",
    oracle_sql="""
    SELECT p_brand, p_partkey, p_retailprice,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           CAST(percent_rank() OVER w AS DOUBLE) AS prank
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC)
    """,
    tags=("window", "rank"),
)
def window_rank_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / percent_rank with ties — tie rows get equal
    rank in both engines, so no tiebreaker is needed (or wanted)."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    return p.select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.percent_rank().over(w).cast("double").alias("prank"),
    )


@register(
    "window_moving_avg",
    oracle_sql="""
    SELECT event_id, user_id,
           (CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w3
                 AS DECIMAL(30,6)) AS DOUBLE)
            / count(value) OVER w3) AS moving_avg
    FROM events
    WINDOW w3 AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "sliding"),
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row sliding average per user (sum/count over the frame, in
    fixed point so partial frames at partition start stay exact)."""
    e = load_table(spark, sf_dir, "events")
    w3 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        (
            F.sum(dec("value")).over(w3).cast("decimal(30,6)").cast("double")
            / F.count("value").over(w3)
        ).alias("moving_avg"),
    )


@register(
    "window_ntile_cume",
    oracle_sql="""
    SELECT c_custkey, c_mktsegment,
           ntile(4) OVER w AS quartile,
           CAST(cume_dist() OVER w AS DOUBLE) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    tags=("window", "rank"),
)
def window_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile quartiles + cume_dist per market segment."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.cume_dist().over(w).cast("double").alias("cume"),
    )


@register(
    "sessionize_batch",
    oracle_sql="""
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), sessions AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM gaps
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sessions
    GROUP BY 1, 2
    """,
    tags=("window", "session", "headline"),
)
def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: lag-gap flag + running sum = session id —
    the classic two-window composition (streaming analog:
    streaming/queries.py session_window).  30-minute inactivity gap.
    One shuffle: both windows and the final agg share user_id
    partitioning, which Catalyst reuses."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    is_new = F.when(
        gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        e.select("user_id", "ts", "event_id", is_new.alias("is_new"))
        .select(
            "user_id",
            "ts",
            F.sum("is_new").over(run).cast("long").alias("session_id"),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


@register(
    "window_value_functions",
    oracle_sql="""
    SELECT o_orderkey, o_custkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER w AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window", "value"),
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over the FULL partition frame
    (the default frame ends at CURRENT ROW, which silently makes
    last_value ≡ current row — the classic window footgun; unbounded
    frame + unique orderBy keeps it deterministic)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@register(
    "window_range_frame",
    oracle_sql="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER wr
                AS DECIMAL(30,6)) AS DOUBLE) AS nearby_sum,
           CAST(count(*) OVER wr AS BIGINT) AS nearby_cnt
    FROM orders
    WINDOW wr AS (PARTITION BY o_custkey ORDER BY o_totalprice
                  RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "range-frame"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame: per customer, total and count of orders
    priced within 100 below the current order.  RANGE frames are the
    window form rows-frames can't express (membership by VALUE distance,
    ties all-in) — deterministic without a tiebreaker because the frame
    is a pure function of the order values.  Same single-shuffle cost
    profile as any window: one exchange on o_custkey + in-partition sort.
    """
    o = load_table(spark, sf_dir, "orders")
    wr = (
        "(PARTITION BY o_custkey ORDER BY o_totalprice "
        "RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)"
    )
    return o.selectExpr(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER "
        f"{wr} AS DECIMAL(30,6)) AS DOUBLE) AS nearby_sum",
        f"CAST(count(*) OVER {wr} AS BIGINT) AS nearby_cnt",
    )


@register(
    "window_time_range",
    oracle_sql="""
    WITH cents AS (
      SELECT event_id, user_id, ts,
             CAST(floor(value * 100) AS BIGINT) AS v_cents
      FROM events
    )
    SELECT event_id, user_id,
           CAST(sum(v_cents) OVER wt AS BIGINT) AS trailing_cents,
           CAST(count(*) OVER wt AS BIGINT) AS trailing_n
    FROM cents
    WINDOW wt AS (PARTITION BY user_id ORDER BY ts
                  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "time-range"),
)
def window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing time-interval frame: per user, value-cents total and
    event count over the last hour *by timestamp*, not by row count —
    the rolling-metric shape (rate limits, spend caps, trailing
    velocity) that ROWS frames can't express when events are unevenly
    spaced.  Equal timestamps are frame peers in both engines, so ties
    need no tiebreaker.  Values go through floor(value*100) integer
    cents so the windowed sum is int64 — immune to fold order.  One
    exchange on user_id + in-partition time sort, the standard window
    cost profile.
    """
    e = load_table(spark, sf_dir, "events")
    wt = (
        "(PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.col("value") * 100).cast("long").alias("v_cents"),
    ).selectExpr(
        "event_id",
        "user_id",
        f"CAST(sum(v_cents) OVER {wt} AS BIGINT) AS trailing_cents",
        f"CAST(count(*) OVER {wt} AS BIGINT) AS trailing_n",
    )


@register(
    "time_gap_fill_ffill",
    oracle_sql="""
    WITH cents AS (
      SELECT user_id, date_trunc('hour', ts) AS hour,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    hourly AS (
      SELECT user_id, hour, CAST(sum(cents) AS BIGINT) AS v
      FROM cents GROUP BY user_id, hour
    ),
    spans AS (
      SELECT user_id, min(hour) AS h0, max(hour) AS h1 FROM hourly GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
      FROM spans
    )
    SELECT g.user_id, g.hour,
           CASE WHEN h.v IS NULL THEN 1 ELSE 0 END AS is_gap,
           last_value(h.v IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_v
    FROM grid g LEFT JOIN hourly h
      ON h.user_id = g.user_id AND h.hour = g.hour
    """,
    tags=("window", "timeseries", "gapfill"),
)
def time_gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling with forward fill: build each user's
    dense hourly grid (min..max event hour), left-join the real hourly
    totals, and carry the last observed value through the gaps — the
    resample + ffill primitive time-series stores ship natively,
    expressed as sequence-explode + LAST(ignoreNulls) window.

    Value totals go through half-up integer cents so hourly sums are
    exact in both engines.  Scale shape: the hourly rollup and the
    span aggregate co-partition on user_id, the grid explode is a
    narrow flatMap bounded by span-hours, and the fill window reuses
    the same user_id partitioning — one keyed exchange end to end
    (the grid side's tiny span table joins back on (user_id, hour)).
    The first grid row is never null by construction (the span starts
    at an observed hour).
    """
    e = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    hourly = (
        e.select(
            "user_id",
            F.date_trunc("hour", "ts").alias("hour"),
            cents.alias("cents"),
        )
        .groupBy("user_id", "hour")
        .agg(F.sum("cents").cast("long").alias("v"))
    )
    spans = hourly.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = spans.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("interval 1 hour"))
        ).alias("hour"),
    )
    joined = grid.join(hourly, ["user_id", "hour"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id",
        "hour",
        F.when(F.col("v").isNull(), 1).otherwise(0).alias("is_gap"),
        F.last("v", ignorenulls=True).over(w).alias("filled_v"),
    )
