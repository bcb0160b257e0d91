"""Time-decay and anomaly operators over the event stream.

The reference reduces a keyed stream to per-key totals
(/root/reference/src/main.c:61-75); production event analytics needs the
two refinements every monitoring/feature pipeline adds on top of plain
counts: RECENCY weighting (old events matter less) and ANOMALY flags
(which days deviate from a key's own baseline).  Both are expressed
here as single-pass keyed aggregates — the same shuffle profile as the
reference's reducer — with all decay/deviation math in exact integer
arithmetic so the DuckDB oracle hash-matches bit-for-bit:

- Decay weights are powers of two (`1 << (CAP - age_bucket)`), never
  float ``exp``: the half-life semantics survive, and integer shifts
  are engine-independent.
- Anomaly scores are squared deviations over variance in integer basis
  points, computed from (n, sum, sum-of-squares) without ever forming a
  float mean — the [[group-mad-outliers]] discipline.

Scale shape: each op is one scan + one keyed aggregate (map-side
combined) + a broadcast of a tiny per-key baseline table.  Nothing here
shuffles the event stream more than once, so the 100 TB cost is the
scan, which is the floor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_c_implementation_spark.registry import register
from mapreduce_c_implementation_spark.sources import load_table

# Half-life in days for the decayed counter, and the bucket cap: ages
# beyond CAP half-lives contribute weight 1 (the smallest non-zero
# weight) — a floor, not a drop, so totals still reconcile.
DECAY_HALF_LIFE_DAYS = 7
DECAY_CAP = 16
DECAY_SCALE = 1 << DECAY_CAP


@register(
    "decayed_event_counts",
    oracle_sql=f"""
    WITH mx AS (SELECT max(CAST(ts AS DATE)) AS max_d FROM events),
    aged AS (
      SELECT e.event_type,
             least(date_diff('day', CAST(e.ts AS DATE), mx.max_d)
                   // {DECAY_HALF_LIFE_DAYS}, {DECAY_CAP}) AS bucket
      FROM events e, mx
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(1::BIGINT << ({DECAY_CAP} - bucket)) AS BIGINT)
             AS decayed_scaled,
           CAST((sum(1::BIGINT << ({DECAY_CAP} - bucket)) * 1000)
                // {DECAY_SCALE} AS BIGINT) AS decayed_milli
    FROM aged
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("timeseries", "decay", "aggregate"),
)
def decayed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-life-decayed event counters per type — the recency-weighted
    count feature stores and trending-topic rankers maintain (an event
    {DECAY_HALF_LIFE_DAYS} days old counts half as much, capped at
    {DECAY_CAP} half-lives where the weight floors at 1).

    Exactness: the decay weight is ``1 << (CAP - age_bucket)`` — an
    integer power of two, so "decayed count x 2^CAP" is an exact BIGINT
    in both engines and the milli-scaled report derives from one shared
    integer.  Float ``exp(-ln2 * age/hl)`` would differ in the last ulp
    between libm implementations; the bucketed shift never can.

    Scale shape: the reference-point (max event date) is a one-row
    aggregate broadcast back via crossJoin — no collect, no second scan
    of the stream (Spark reuses the scan across the two branches; at
    100 TB you would pass the watermark in as a parameter instead).
    The decayed sum itself map-side combines per event_type, so the
    only full-width shuffle carries #event_types rows.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("d")
    )
    mx = e.agg(F.max("d").alias("max_d"))
    bucket = F.least(
        F.floor(F.datediff(F.col("max_d"), F.col("d")) / DECAY_HALF_LIFE_DAYS),
        F.lit(DECAY_CAP),
    ).cast("int")
    return (
        e.crossJoin(F.broadcast(mx))
        .select("event_type", bucket.alias("bucket"))
        .select(
            "event_type",
            F.expr(f"shiftleft(1L, {DECAY_CAP} - bucket)").alias("w"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_total"),
            F.sum("w").cast("long").alias("decayed_scaled"),
            F.expr(f"CAST(sum(w) * 1000L div {DECAY_SCALE} AS BIGINT)").alias(
                "decayed_milli"
            ),
        )
        .orderBy("event_type")
    )


# A day is anomalous when its squared deviation from the type's own
# daily mean exceeds ANOMALY_BP x the daily variance (basis points;
# 30000 bp = 3x variance ~= 1.73 sigma).
ANOMALY_BP = 30_000


@register(
    "event_daily_anomaly",
    oracle_sql=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    base AS (
      SELECT event_type, count(*) AS nd,
             sum(n) AS s, sum(n * n) AS ss
      FROM daily GROUP BY event_type
    )
    SELECT d.event_type, strftime(d.d, '%Y-%m-%d') AS day,
           CAST(d.n AS BIGINT) AS n,
           CAST(CASE WHEN b.nd * b.ss - b.s * b.s > 0
                THEN ((b.nd * d.n - b.s) * (b.nd * d.n - b.s) * 10000)
                     // (b.nd * (b.nd * b.ss - b.s * b.s))
                ELSE 0 END AS BIGINT) AS dev2_bp,
           CAST(CASE WHEN b.nd * b.ss - b.s * b.s > 0
                AND ((b.nd * d.n - b.s) * (b.nd * d.n - b.s) * 10000)
                    // (b.nd * (b.nd * b.ss - b.s * b.s)) >= {ANOMALY_BP}
                THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
    FROM daily d JOIN base b ON b.event_type = d.event_type
    ORDER BY d.event_type, day
    """,
    tags=("timeseries", "anomaly", "aggregate"),
)
def event_daily_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type daily-count anomaly detection against the type's own
    baseline — the ops-dashboard "this day is off" flag, scored as the
    squared deviation over the population variance in integer basis
    points ({ANOMALY_BP} bp ~= 1.73 sigma).

    Exactness: with nd days, S = sum(n), SS = sum(n^2), the z^2 score
    is (nd*x - S)^2 / (nd * (nd*SS - S^2)) — every term an exact
    BIGINT, no float mean or sqrt anywhere, so floor-to-basis-points is
    engine-independent.  (Magnitudes: nd*x <= ~3e5 on the fixture,
    squared 1e11, x1e4 = 1e15 — comfortably inside int64; a corpus
    with >1e5 events/day/type would lift the products to DECIMAL(38,0)
    exactly like time_weighted_avg.)

    Scale shape: daily rollup (map-side combine to #types x #days
    rows), then a per-type baseline over THAT tiny table, broadcast
    back.  The event stream shuffles once, to day granularity.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("d")
    )
    daily = e.groupBy("event_type", "d").agg(F.count("*").alias("n"))
    base = daily.groupBy("event_type").agg(
        F.count("*").alias("nd"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("ss"),
    )
    j = daily.join(F.broadcast(base), "event_type")
    var_term = F.col("nd") * F.col("ss") - F.col("s") * F.col("s")
    dev2 = F.when(
        var_term > 0,
        F.expr(
            "(nd * n - s) * (nd * n - s) * 10000L div (nd * (nd * ss - s * s))"
        ),
    ).otherwise(F.lit(0))
    return (
        j.select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col("n").cast("long").alias("n"),
            dev2.cast("long").alias("dev2_bp"),
        )
        .withColumn(
            "is_anomaly", (F.col("dev2_bp") >= ANOMALY_BP).cast("long")
        )
        .orderBy("event_type", "day")
    )
