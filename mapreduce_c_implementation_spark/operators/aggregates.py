"""Typed grouped aggregation (SURVEY.md §2 #14/#16 on typed data, §2.2).

The reference's aggregation machinery is map-side hash grouping with a
combiner plus reduce-side per-group fold (src/buffer.c:88-176,
src/reduce.c:64-84).  On typed tables that pattern is ``groupBy().agg``;
Catalyst's partial/final HashAggregate supplies the combiner.  Grouping
sets / cube / rollup / approx sketches are capabilities the reference
lacks (SURVEY §2.2) supplied by Spark built-ins.

Scale: every query here is one shuffle on the grouping key, map-side
pre-aggregated.  Low-cardinality keys (l_returnflag: 3 values) are fine
because partial aggregation collapses each map partition to ~|groups|
rows before the exchange — the same reason the reference's combiner cut
shuffle 83%.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_c_implementation_spark.functions.exactagg import (
    dec,
    exact_avg,
    exact_sum,
    sql_exact_avg,
    sql_exact_sum,
)
from mapreduce_c_implementation_spark.registry import register
from mapreduce_c_implementation_spark.sources import load_table


@register(
    "tpch_q1",
    oracle_sql=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_exact_sum("l_quantity")} AS sum_qty,
           {sql_exact_sum("l_extendedprice")} AS sum_base_price,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)) *
                         (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))
                AS DECIMAL(30,6)) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)) *
                         (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))) *
                         (CAST(1 AS DECIMAL(18,6)) + CAST(l_tax AS DECIMAL(18,6))))
                AS DECIMAL(30,6)) AS DOUBLE) AS sum_charge,
           {sql_exact_avg("l_quantity")} AS avg_qty,
           {sql_exact_avg("l_extendedprice")} AS avg_price,
           {sql_exact_avg("l_discount")} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("aggregate", "headline"),
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary — the word-count pattern on typed data.

    Reference analog: Map emit + combiner partial-sum + Reduce fold
    (src/mapreduce.h:110-119).  Fixed-point sums (see exactagg) keep the
    differential oracle bit-exact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(18,6)")
    disc_price = dec("l_extendedprice") * (one - dec("l_discount"))
    charge = disc_price * (one + dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum("l_quantity").alias("sum_qty"),
            exact_sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("decimal(30,6)").cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("decimal(30,6)").cast("double").alias("sum_charge"),
            exact_avg("l_quantity").alias("avg_qty"),
            exact_avg("l_extendedprice").alias("avg_price"),
            exact_avg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "tpch_q6",
    oracle_sql="""
    SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)) *
                         CAST(l_discount AS DECIMAL(18,6)))
               AS DECIMAL(30,6)) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    tags=("aggregate", "filter", "headline"),
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + project + global aggregate (TPC-H Q6 shape).

    The filter/projection lives in the reference's Map callback
    (SURVEY §2 row 5 note); here it's declarative so Catalyst pushes the
    shipdate/discount/quantity predicates into the parquet scan —
    asserted in tests/test_plans.py.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount"))
            .cast("decimal(30,6)")
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "agg_minmax_orders",
    oracle_sql="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price,
           min(o_orderdate) AS first_order,
           max(o_orderdate) AS last_order,
           count(DISTINCT o_custkey) AS n_customers
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("aggregate",),
)
def agg_minmax_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/count/count_distinct — order-insensitive aggregates
    (exact double min/max need no fixed-point treatment)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
            F.count_distinct("o_custkey").alias("n_customers"),
        )
    )


@register(
    "count_distinct_parts",
    oracle_sql="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregate", "distinct"),
)
def count_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi count-distinct in one pass (reference analog: doc_count in
    the oracle, SimpleInvertedIndex/inverted_index.c:72)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_partkey").alias("n_parts"),
            F.count_distinct("l_suppkey").alias("n_supps"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "rollup_sales",
    oracle_sql=f"""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           {sql_exact_sum("l_quantity")} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("aggregate", "grouping-sets"),
)
def rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP — hierarchical subtotals (absent in reference, SURVEY §2.2)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), exact_sum("l_quantity").alias("sum_qty"))
    )


@register(
    "cube_sales",
    oracle_sql=f"""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           {sql_exact_sum("l_extendedprice")} AS sum_price
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("aggregate", "grouping-sets"),
)
def cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all grouping combinations."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), exact_sum("l_extendedprice").alias("sum_price"))
    )


@register(
    "grouping_sets_sales",
    oracle_sql=f"""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           {sql_exact_sum("l_quantity")} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """,
    tags=("aggregate", "grouping-sets"),
)
def grouping_sets_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL surface (same Catalyst Expand
    operator as cube/rollup — one scan, one shuffle)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(30,6))
                    AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                (l_returnflag, l_linestatus))
        """
    )


@register(
    "approx_count_distinct_check",
    oracle_sql="""
    SELECT l_returnflag, true AS approx_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregate", "approx"),
)
def approx_count_distinct_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch (approx_count_distinct) validated against the exact
    count within 5% — the sketch value itself is implementation-defined,
    so the oracle-checkable output is the tolerance verdict.

    Scale: HLL is THE count-distinct at 100 TB (constant memory per
    group vs a shuffle-heavy exact distinct).
    """
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_nd"),
        F.count_distinct("l_partkey").alias("exact_nd"),
    )
    return agg.select(
        "l_returnflag",
        (
            F.abs(F.col("approx_nd") - F.col("exact_nd"))
            / F.col("exact_nd")
            < F.lit(0.05)
        ).alias("approx_ok"),
    )


@register(
    "approx_quantile_check",
    oracle_sql="""
    SELECT o_orderpriority, true AS quantile_ok
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("aggregate", "approx"),
)
def approx_quantile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (t-digest-ish sketch) vs the exact percentile,
    within 2% relative — same tolerance-verdict pattern as the HLL check."""
    od = load_table(spark, sf_dir, "orders")
    agg = od.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx_med"),
        F.expr("percentile(o_totalprice, 0.5)").alias("exact_med"),
    )
    return agg.select(
        "o_orderpriority",
        (
            F.abs(F.col("approx_med") - F.col("exact_med")) / F.col("exact_med")
            < F.lit(0.02)
        ).alias("quantile_ok"),
    )


@register(
    "histogram_events",
    oracle_sql="""
    SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket,
           count(*) AS n,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1
    """,
    tags=("aggregate", "histogram"),
)
def histogram_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram — floor-bucket then count (single IEEE
    division + floor: bit-identical across engines)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.floor(F.col("value") / 50.0).cast("long").alias("bucket"))
        .agg(F.count("*").alias("n"), F.count_distinct("user_id").alias("n_users"))
    )


@register(
    "variance_stats",
    oracle_sql="""
    SELECT l_returnflag,
           count(*) AS n,
           round(sqrt(
             (CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6)) *
                            CAST(l_quantity AS DECIMAL(18,6)))
                   AS DECIMAL(38,6)) AS DOUBLE)
              - (CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(30,6))
                      AS DOUBLE)
                 * CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(30,6))
                      AS DOUBLE) / count(*))
             ) / count(*)), 6) AS stddev_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregate", "variance"),
)
def variance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stddev computed from EXACT decimal sums (sum, sum of
    squares) rather than the engines' native var_pop — Welford vs
    textbook accumulation differ in ulps across engines, but the
    two-exact-sums formula is reproducible everywhere.  round(6) absorbs
    the final sqrt/divide ulp."""
    li = load_table(spark, sf_dir, "lineitem")
    sum_q = F.sum(dec("l_quantity")).cast("decimal(30,6)").cast("double")
    sum_q2 = (
        F.sum(dec("l_quantity") * dec("l_quantity")).cast("decimal(38,6)").cast("double")
    )
    n = F.count("*")
    return li.groupBy("l_returnflag").agg(
        n.alias("n"),
        F.round(F.sqrt((sum_q2 - sum_q * sum_q / n) / n), 6).alias("stddev_qty"),
    )


@register(
    "argmax_minmax_by",
    oracle_sql="""
    SELECT o_orderpriority,
           arg_max(o_orderkey, o_totalprice) AS priciest_order,
           arg_min(o_orderkey, o_totalprice) AS cheapest_order,
           max(o_totalprice) AS max_price,
           min(o_totalprice) AS min_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("aggregate", "argmax"),
)
def argmax_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax/argmin) — deterministic because the fixture
    has unique extreme prices per group (ties would make the picked key
    engine-dependent; for tie-prone data use the window row_number
    idiom, window_topk_per_group)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
    )


@register(
    "percentile_cont_groups",
    oracle_sql="""
    SELECT event_type,
           round(quantile_cont(value, 0.25), 6) AS p25,
           round(quantile_cont(value, 0.50), 6) AS p50,
           round(quantile_cont(value, 0.90), 6) AS p90,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
    tags=("aggregate", "percentile"),
)
def percentile_cont_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (PERCENTILE_CONT semantics: linear
    interpolation at rank (n-1)*p) per group — the exact complement of
    ``approx_quantile_check``'s sketch.  Exactness costs a per-group
    sort, which Spark's ``percentile`` aggregate does partition-locally
    after the group shuffle; at 100 TB the sketch is the default and
    this is the audit path — both belong in the registry.

    Rounded to 6 places: the interpolation arithmetic is the same IEEE
    expression in both engines, but the guard keeps last-ulp drift out
    of the hash.
    """
    e = load_table(spark, sf_dir, "events")
    pct = F.percentile("value", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.9)))
    return e.groupBy("event_type").agg(
        F.round(F.element_at(pct, 1), 6).alias("p25"),
        F.round(F.element_at(pct, 2), 6).alias("p50"),
        F.round(F.element_at(pct, 3), 6).alias("p90"),
        F.count("*").alias("n"),
    )


# Robust outlier rule: a value is an outlier when its absolute deviation
# from the group median exceeds MAD_K times the median absolute deviation.
MAD_K = 3.0


@register(
    "group_mad_outliers",
    oracle_sql=f"""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
      FROM events e JOIN med m ON m.event_type = e.event_type
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           round(min(d.med), 6) AS med,
           round(min(mad.mad), 6) AS mad,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(CASE WHEN d.adev > {MAD_K} * mad.mad THEN 1 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad ON mad.event_type = d.event_type
    GROUP BY d.event_type
    """,
    tags=("aggregate", "robust", "outliers"),
)
def group_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per group: median absolute deviation
    (MAD) with the {MAD_K}-MAD rule — the quality-pipeline outlier
    filter that, unlike z-scores, is not itself dragged by the
    outliers it hunts.

    Two exact interpolated medians (group median, then median of
    absolute deviations) and a final count — three aggregates and two
    joins, ALL keyed on event_type, so Catalyst reuses one
    group-keyed exchange lineage end to end.  Median/MAD arithmetic
    is the identical interpolation expression in both engines, so the
    strict '>' outlier cut cannot straddle them.
    """
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = e.join(med, "event_type").select(
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.min("med"), 6).alias("med"),
            F.round(F.min("mad"), 6).alias("mad"),
            F.count("*").cast("long").alias("n"),
            F.count(F.when(F.col("adev") > MAD_K * F.col("mad"), 1))
            .cast("long")
            .alias("n_outliers"),
        )
    )


@register(
    "expectation_checks",
    oracle_sql="""
    WITH m AS (
      SELECT count(*) AS n_rows,
             count(CASE WHEN l_quantity IS NULL THEN 1 END) AS null_qty,
             count(CASE WHEN l_quantity < 0 THEN 1 END) AS neg_qty,
             count(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 END)
               AS bad_discount,
             count(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 END)
               AS bad_flag,
             count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS dup_pk
      FROM lineitem
    )
    SELECT rule, violations,
           CASE WHEN violations = 0 THEN 'pass' ELSE 'fail' END AS status
    FROM (
      SELECT 'quantity_not_null' AS rule, CAST(null_qty AS BIGINT) AS violations FROM m
      UNION ALL SELECT 'quantity_non_negative', CAST(neg_qty AS BIGINT) FROM m
      UNION ALL SELECT 'discount_in_unit_range', CAST(bad_discount AS BIGINT) FROM m
      UNION ALL SELECT 'returnflag_in_domain', CAST(bad_flag AS BIGINT) FROM m
      UNION ALL SELECT 'pk_unique', CAST(dup_pk AS BIGINT) FROM m
    )
    """,
    tags=("aggregate", "quality", "expectations"),
)
def expectation_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations (the Deequ/Great-
    Expectations shape): completeness, range, domain, and key-uniqueness
    rules over lineitem, evaluated in ONE scan and reported as a
    per-rule (violations, pass/fail) table — the pre-ingest contract
    check a 100 TB pipeline runs before accepting a batch.

    All rules fold into a single aggregate pass (conditional counts +
    one distinct-key count), then unpivot to rows — so adding a rule
    costs one more counter, not another scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    m = li.agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(F.col("l_quantity").isNull(), 1)).alias("null_qty"),
        F.count(F.when(F.col("l_quantity") < 0, 1)).alias("neg_qty"),
        F.count(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)
        ).alias("bad_discount"),
        F.count(
            F.when(~F.col("l_returnflag").isin("A", "N", "R"), 1)
        ).alias("bad_flag"),
        (
            F.count("*")
            - F.count_distinct(F.struct("l_orderkey", "l_linenumber"))
        ).alias("dup_pk"),
    )
    rules = m.select(
        F.expr(
            "stack(5, "
            "'quantity_not_null', CAST(null_qty AS LONG), "
            "'quantity_non_negative', CAST(neg_qty AS LONG), "
            "'discount_in_unit_range', CAST(bad_discount AS LONG), "
            "'returnflag_in_domain', CAST(bad_flag AS LONG), "
            "'pk_unique', CAST(dup_pk AS LONG)) AS (rule, violations)"
        )
    )
    return rules.select(
        "rule",
        "violations",
        F.when(F.col("violations") == 0, "pass").otherwise("fail").alias("status"),
    )


# Skew profiler: report the SKEW_TOPN hottest keys with their row share.
SKEW_TOPN = 10


@register(
    "key_skew_profile",
    oracle_sql=f"""
    WITH counts AS (
      SELECT o_custkey AS key, count(*) AS c FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT sum(c) AS n, count(*) AS n_keys FROM counts)
    SELECT key, CAST(c AS BIGINT) AS n_rows,
           round(CAST(c AS DOUBLE) / tot.n, 6) AS share,
           round(CAST(c AS DOUBLE) * tot.n_keys / tot.n, 6) AS skew_factor,
           rank
    FROM (SELECT *, row_number() OVER (ORDER BY c DESC, key ASC) AS rank
          FROM counts) r
    CROSS JOIN tot
    WHERE rank <= {SKEW_TOPN}
    """,
    tags=("aggregate", "skew", "diagnostics"),
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profiler: the top-{SKEW_TOPN} hottest keys of a
    prospective join/agg column with their row share and skew factor
    (count / mean-count) — the diagnostic that decides whether a key
    needs the salted-join/salted-agg treatment before a 100 TB shuffle
    (AQE fixes skew reactively; this finds it ahead of time).

    One partial/final count per key, a 1-row totals broadcast, and a
    TakeOrderedAndProject-shaped top-N — cost is one scan regardless of
    key cardinality.
    """
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count("*").alias("c")
    )
    tot = counts.agg(
        F.sum("c").alias("n"), F.count("*").alias("n_keys")
    )
    top = counts.orderBy(F.desc("c"), F.asc("key")).limit(SKEW_TOPN)
    w = Window.orderBy(F.desc("c"), F.asc("key"))
    return (
        top.crossJoin(F.broadcast(tot))
        .select(
            "key",
            F.col("c").cast("long").alias("n_rows"),
            F.round(F.col("c").cast("double") / F.col("n"), 6).alias("share"),
            F.round(
                F.col("c").cast("double") * F.col("n_keys") / F.col("n"), 6
            ).alias("skew_factor"),
            F.row_number().over(w).cast("long").alias("rank"),
        )
    )


@register(
    "hll_sketch_mergeable",
    oracle_sql="""
    SELECT l.l_returnflag, true AS sketch_ok,
           CAST(count(DISTINCT l.l_partkey) AS BIGINT) AS exact_nd
    FROM lineitem l
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
    tags=("aggregate", "approx", "sketch"),
)
def hll_sketch_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGEABLE-sketch pattern (Spark 4 Datasketches HLL): build
    binary HLL sketches per (returnflag, linestatus) sub-group, then
    hll_union_agg the serialized sketches up to per-returnflag and
    estimate.  This is the architecture approx_count_distinct hides:
    sketches are data — they persist, re-aggregate along any rollup
    path, and merge across days/partitions without rescanning, which is
    what makes distinct-count dashboards possible at 100 TB.

    The estimate is implementation-defined, so the oracle-checkable
    outputs are the tolerance verdict (union estimate within 5% of
    exact) plus the exact count itself — which also proves the
    re-aggregation path produced a sane sketch, not a default.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sub = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.hll_sketch_agg("l_partkey").alias("sketch"),
        F.count_distinct("l_partkey").alias("sub_nd"),
    )
    merged = sub.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("union_nd"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").cast("long").alias("exact_nd")
    )
    return (
        merged.join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            (
                F.abs(F.col("union_nd") - F.col("exact_nd"))
                / F.col("exact_nd")
                < F.lit(0.05)
            ).alias("sketch_ok"),
            "exact_nd",
        )
        .orderBy("l_returnflag")
    )


@register(
    "cube_grouping_id",
    oracle_sql="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
           CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority
    """,
    tags=("aggregate", "cube", "grouping"),
)
def cube_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with grouping() indicators — the disambiguation every cube
    consumer needs: a NULL group key can mean "the value was NULL" or
    "this row is a subtotal", and only grouping(col) (0 = real value,
    1 = aggregated-across) tells them apart.  Without it, downstream
    dashboards silently merge NULL-valued groups into totals.

    Scale: same single expand+aggregate pipeline as cube_sales; the
    indicator costs nothing (it is derived from the grouping-set id
    Spark already carries through the Expand operator).
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
            F.count("*").cast("long").alias("n"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "g_status", "g_priority", "n"
        )
        .orderBy("g_status", "g_priority", "o_orderstatus", "o_orderpriority")
    )


@register(
    "bitmap_exact_distinct",
    oracle_sql="""
    SELECT o_orderpriority,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("aggregate", "bitmap", "sketch", "spark4"),
)
def bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct count via Spark 4's bitmap aggregates —
    the roaring-bitmap architecture: keys bucket by
    ``bitmap_bucket_number``, each (group, bucket) builds a fixed-size
    bitmap with ``bitmap_construct_agg``, bitmaps OR-merge up the
    rollup path with ``bitmap_or_agg``, and ``bitmap_count`` reads the
    total.  Unlike HLL (hll_sketch_mergeable) the result is EXACT, so
    no tolerance verdict — the oracle is a plain count distinct and
    hashes must match.

    Scale: this is how warehouses do re-aggregable exact distincts —
    per-bucket bitmaps are bounded binary state that merges along any
    dimension without rescanning; the expensive expand-the-raw-keys
    distinct never happens.
    """
    o = load_table(spark, sf_dir, "orders")
    per_bucket = (
        o.select(
            "o_orderpriority",
            F.expr("bitmap_bucket_number(o_custkey)").alias("bkt"),
            F.expr("bitmap_bit_position(o_custkey)").alias("pos"),
        )
        .groupBy("o_orderpriority", "bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    return (
        per_bucket.groupBy("o_orderpriority")
        .agg(
            F.expr("sum(bitmap_count(bm))").cast("long").alias("n_customers")
        )
        .orderBy("o_orderpriority")
    )


@register(
    "try_arithmetic_safety",
    oracle_sql="""
    SELECT l_linenumber,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN l_discount = 0 THEN NULL
                         ELSE round(l_extendedprice / l_discount, 2)
                    END) IS NOT NULL AS BOOLEAN) AS any_ratio,
           CAST(count(*) FILTER (WHERE l_discount = 0) AS BIGINT) AS n_div0,
           CAST(count(*) FILTER (WHERE try_cast(l_returnflag AS INT) IS NULL)
                AS BIGINT) AS n_noncast
    FROM lineitem
    GROUP BY l_linenumber
    ORDER BY l_linenumber
    """,
    tags=("scalar", "ansi", "spark4"),
)
def try_arithmetic_safety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic surface: ``try_divide`` / ``try_cast``
    return NULL instead of failing on division-by-zero and bad casts —
    the per-row error quarantine that keeps a 100 TB job from dying on
    one malformed record (the batch analog of PERMISSIVE corrupt-record
    parsing).  The oracle reproduces NULL-on-error with CASE guards, so
    the NULL pattern — not just the happy path — is what's diffed.
    """
    li = load_table(spark, sf_dir, "lineitem")
    ratio = F.round(F.try_divide(F.col("l_extendedprice"), F.col("l_discount")), 2)
    return (
        li.groupBy("l_linenumber")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(ratio).isNotNull().alias("any_ratio"),
            F.sum(F.when(F.col("l_discount") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_div0"),
            F.sum(
                F.when(F.try_to_number(F.col("l_returnflag"), F.lit("9")).isNull(), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_noncast"),
        )
        .orderBy("l_linenumber")
    )


@register(
    "listagg_ordered",
    oracle_sql="""
    SELECT n.n_name,
           string_agg(s.s_name, ',' ORDER BY s.s_name) AS suppliers,
           CAST(count(*) AS BIGINT) AS n_suppliers
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    tags=("aggregate", "listagg", "spark4"),
)
def listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2016 LISTAGG ... WITHIN GROUP (ORDER BY ...) — new in Spark
    4: ordered string aggregation as a first-class aggregate (DuckDB's
    string_agg ORDER BY is the same standard feature).  The explicit
    WITHIN GROUP order is what makes concatenation deterministic under
    any partitioning — the same rule as the reference's sorted posting
    lists (src/main.c:124), stated declaratively instead of via
    sort_array(collect_set(...)).

    Scale: an ordered aggregate buffers one group's members — fine for
    report-shaped groups (suppliers per nation); unbounded groups want
    the top-k cut first, as everywhere else.
    """
    from mapreduce_c_implementation_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name,
               listagg(s.s_name, ',') WITHIN GROUP (ORDER BY s.s_name)
                 AS suppliers,
               CAST(count(*) AS BIGINT) AS n_suppliers
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        GROUP BY n.n_name
        ORDER BY n.n_name
        """
    )


TOPK_ITEMS = 10
# approx_top_k tracked-item capacity.  The exact-front contract of
# approx_heavy_hitters holds only while the fixture vocabulary stays
# under this (ADVICE r2); tests/test_extensions.py::
# test_heavy_hitters_fixture_under_capacity fails loudly if a fixture
# regeneration outgrows it, and ...::test_heavy_hitters_overflow_regime
# pins the error bound in the capacity<vocabulary regime.
HH_CAPACITY = 100_000


@register(
    "approx_heavy_hitters",
    # With maxItemsTracked well above the true distinct count the
    # sketch degrades to exact counting, so the verdict compares its
    # top-k front against the exact one — order-insensitive set
    # equality on (word, count), the same contract as the HLL checks
    # but on a FREQUENCY sketch.
    oracle_sql=f"""
    WITH exact AS (
      SELECT word, count(*) AS cnt
      FROM (SELECT unnest(list_transform(list_filter(string_split_regex(text, '[^a-zA-Z0-9]+'), t -> t <> ''), t -> lower(substr(t, 1, 255)))) AS word FROM documents)
      GROUP BY word
    ),
    front AS (
      SELECT word, cnt,
             row_number() OVER (ORDER BY cnt DESC, word ASC) AS r
      FROM exact
    )
    SELECT word, CAST(cnt AS BIGINT) AS cnt, true AS in_topk
    FROM front WHERE r <= {TOPK_ITEMS}
    ORDER BY cnt DESC, word
    """,
    tags=("aggregate", "sketch", "heavy-hitters", "spark4"),
)
def approx_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via Spark 4's ``approx_top_k`` frequency sketch —
    the streaming-friendly answer to "most frequent items" that never
    materializes the full frequency table (state is maxItemsTracked
    counters, merged across partitions).  Tracked capacity here exceeds
    the fixture vocabulary, so the sketch is provably exact and the
    top-{TOPK_ITEMS} front (ties broken by word) matches the exact
    count's front — diffed value-for-value, not just verdict-for-
    verdict.  At 100 TB capacity < vocabulary and counts become
    approximate: this op is the calibration harness for that setting.
    """
    from mapreduce_c_implementation_spark.functions.text import tokenize
    from mapreduce_c_implementation_spark.sources.tables import parallel_scan

    d = parallel_scan(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokenize(F.col("text"))).alias("word"))
    sketch = toks.agg(
        F.expr(f"approx_top_k(word, {TOPK_ITEMS * 4}, {HH_CAPACITY})").alias("tk")
    )
    items = sketch.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("word"), F.col("e.count").cast("long").alias("cnt")
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("cnt"), F.asc("word"))
    return (
        items.select("*", F.row_number().over(w).alias("r"))
        .filter(F.col("r") <= TOPK_ITEMS)
        .select("word", "cnt", F.lit(True).alias("in_topk"))
        .orderBy(F.desc("cnt"), "word")
    )


# --- Round 9: mergeable quantile sketch --------------------------------
#
# Fixed-boundary histogram sketch: the deterministic member of the
# KLL / t-digest family.  Because bin boundaries are DATA-INDEPENDENT
# literals (width QSK_WIDTH cents), per-group sketches merge by plain
# counter addition — the same mergeability contract KLL compactors and
# t-digest centroid buffers provide, minus their randomized/greedy
# placement (which would break the cross-engine hash gate).  Estimate
# error is bounded by one bin width BY CONSTRUCTION.
QSK_WIDTH = 20_000  # bin width in cents ($200); l_extendedprice < $110k
QSK_QS = (10, 25, 50, 75, 90, 99)  # report percentiles


from pyspark.sql.window import Window as _W  # noqa: E402  (sketch rollup)


@register(
    "quantile_sketch_mergeable",
    oracle_sql=f"""
    WITH pts AS (
      SELECT l_returnflag AS grp,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM lineitem
    ),
    sketch AS (
      SELECT grp, v // {QSK_WIDTH} AS bin, count(*) AS cnt
      FROM pts GROUP BY 1, 2
    ),
    merged AS (
      SELECT grp, bin, cnt FROM sketch
      UNION ALL
      SELECT 'ALL' AS grp, bin, sum(cnt) AS cnt FROM sketch GROUP BY bin
    ),
    cum AS (
      SELECT grp, bin, cnt,
             sum(cnt) OVER (PARTITION BY grp) AS n,
             coalesce(sum(cnt) OVER (
               PARTITION BY grp ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      FROM merged
    )
    SELECT grp,
           CAST(q_pct AS BIGINT) AS q_pct,
           CAST(bin * {QSK_WIDTH}
                + ((n - 1) * q_pct // 100 - cb) * {QSK_WIDTH} // cnt
                AS BIGINT) AS est_cents,
           CAST(n AS BIGINT) AS n
    FROM cum, unnest([{", ".join(str(q) for q in QSK_QS)}]) AS t(q_pct)
    WHERE (n - 1) * q_pct // 100 >= cb
      AND (n - 1) * q_pct // 100 < cb + cnt
    """,
    tags=("aggregate", "sketch", "quantile", "mergeable"),
)
def quantile_sketch_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch over order-line prices: per-group
    fixed-boundary histograms (width {QSK_WIDTH} cents) whose counters
    ADD — the per-returnflag sketches and the corpus-wide 'ALL' row are
    read off the SAME sketch table, no second scan (the rollup property
    KLL/t-digest are built for, in their deterministic fixed-bin
    special case; completes the sketch shelf next to
    [[hll_sketch_mergeable]] and [[count_min_sketch_tokens]]).
    Percentile q is located by 0-based rank (n-1)*q//100 in the
    cumulative sketch and linearly interpolated INSIDE the bin with
    integer arithmetic — estimate error <= one bin width by
    construction (asserted against the exact order statistic in
    tests/test_round9_ops.py).

    Scale shape: the sketch build is ONE map-side-combined aggregate
    collapsing every partition to <= |groups| x |bins| counter rows
    (~550 bins here) before the exchange — the reference's combiner
    discipline (/root/reference/src/buffer.c:107-116) applied to a
    sketch, and the exact reason the merge stage touches kilobytes at
    any corpus size.  Quantile extraction windows run over the bounded
    sketch table, never the data.  At 100 TB per-executor sketches
    stream into the same 550-counter merge; changing accuracy is one
    literal.

    Reference analog: src/reduce.c:64-84 (per-group fold) — here the
    fold state is the whole distribution, not one scalar.
    """
    pts = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("v"),
    )
    sketch = (
        pts.select("grp", F.expr(f"v div {QSK_WIDTH}").alias("bin"))
        .groupBy("grp", "bin")
        .agg(F.count("*").alias("cnt"))
        .cache()  # bounded (|groups| x ~550 bins); consumed twice (per-grp + ALL)
    )
    merged = sketch.unionAll(
        sketch.groupBy("bin")
        .agg(F.sum("cnt").alias("cnt"))
        .select(F.lit("ALL").alias("grp"), "bin", "cnt")
    )
    w_n = _W.partitionBy("grp")
    w_cum = (
        _W.partitionBy("grp")
        .orderBy("bin")
        .rowsBetween(_W.unboundedPreceding, -1)
    )
    cum = merged.select(
        "grp",
        "bin",
        "cnt",
        F.sum("cnt").over(w_n).alias("n"),
        F.coalesce(F.sum("cnt").over(w_cum), F.lit(0)).alias("cb"),
    )
    qs = F.explode(F.array(*[F.lit(q) for q in QSK_QS])).alias("q_pct")
    r = F.expr("(n - 1) * q_pct div 100")
    return (
        cum.select("*", qs)
        .filter((r >= F.col("cb")) & (r < F.col("cb") + F.col("cnt")))
        .select(
            "grp",
            F.col("q_pct").cast("long").alias("q_pct"),
            F.expr(
                f"CAST(bin * {QSK_WIDTH}"
                f" + ((n - 1) * q_pct div 100 - cb) * {QSK_WIDTH} div cnt"
                f" AS BIGINT)"
            ).alias("est_cents"),
            F.col("n").cast("long").alias("n"),
        )
    )
