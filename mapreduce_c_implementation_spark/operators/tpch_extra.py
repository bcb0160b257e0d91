"""The remaining TPC-H query shapes: Q2, Q8, Q9, Q11, Q12, Q13, Q15,
Q16, Q17, Q19, Q20, Q21, Q22 — completing all 22 shapes together with
Q1/Q3/Q4/Q5/Q6/Q7/Q10/Q14/Q18 in analytics.py.

The fixture (TESTDATA.md) has no ``partsupp`` table and lacks a few spec
columns (l_shipmode, l_commitdate/l_receiptdate, o_comment, c_phone,
p_container); the queries here substitute a fixture column wherever a
missing one appears — each docstring names the substitution — and the
five partsupp-dependent shapes run on a deterministic DERIVED partsupp
(see the block comment below).  What is preserved is the query *shape*:
the join graph, the correlated-subquery structure, and the aggregate
pattern that makes each TPC-H query a distinct optimizer exercise (the
same reason the reference validates against a sequential oracle,
/root/reference/SimpleInvertedIndex/inverted_index.c:1).

Scale notes follow the analytics.py discipline: dims broadcast, the one
fact-fact shuffle keys on the order key, money sums in fixed-point
decimal (functions/exactagg.py) so threshold cuts and top-k fronts are
bit-identical across engines, and correlated EXISTS/NOT EXISTS compile
to semi/anti joins — never per-row subquery execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_c_implementation_spark.functions.exactagg import dec, exact_sum
from mapreduce_c_implementation_spark.registry import register
from mapreduce_c_implementation_spark.sources import load_table
from mapreduce_c_implementation_spark.sources.tables import register_views

_REV_SQL = (
    "sum(CAST(l_extendedprice AS DECIMAL(18,6)) * "
    "(CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))"
)


def _rev_term():
    one = F.lit(1).cast("decimal(18,6)")
    return dec("l_extendedprice") * (one - dec("l_discount"))


@register(
    "tpch_q8_market_share",
    oracle_sql=f"""
    WITH flat AS (
      SELECT year(o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,6))
               * (CAST(1 AS DECIMAL(18,6)) - CAST(l.l_discount AS DECIMAL(18,6)))
               AS volume,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = cn.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      WHERE r.r_name = (SELECT min(r_name) FROM region)
        AND p.p_type = 'ECONOMY'
    )
    SELECT o_year,
           round(CAST(CAST(sum(CASE WHEN supp_nation = (SELECT min(n_name) FROM nation)
                                    THEN volume ELSE CAST(0 AS DECIMAL(18,6)) END)
                           AS DECIMAL(30,6)) AS DOUBLE)
                 / CAST(CAST(sum(volume) AS DECIMAL(30,6)) AS DOUBLE), 6)
             AS mkt_share
    FROM flat
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("analytics", "tpch", "join"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): the revenue share one
    supplier nation holds, per year, of a region's market for one part
    type.  Eight-table join; the nation/region picks are scalar
    subqueries (min over the dims) so the query is fixture-agnostic and
    issues no driver action.

    Scale: the only exchange is lineitem⋈orders on the order key —
    part, customer, supplier, nation x2, region all broadcast; the
    numerator/denominator sum in one grouped pass (conditional sum, no
    second scan).  Both sums are exact decimal, so the share divides
    two bit-identical doubles.
    """
    register_views(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    s = load_table(spark, sf_dir, "supplier")
    min_region = F.expr("(SELECT min(r_name) FROM region)")
    min_nation = F.expr("(SELECT min(n_name) FROM nation)")
    cn = n.select(
        F.col("n_nationkey").alias("cn_nationkey"),
        F.col("n_regionkey").alias("cn_regionkey"),
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    flat = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_nationkey"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == min_region)),
            F.col("cn_regionkey") == r.r_regionkey,
        )
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _rev_term().alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,6)")
    num = F.sum(
        F.when(F.col("supp_nation") == min_nation, F.col("volume")).otherwise(zero)
    )
    den = F.sum("volume")
    return (
        flat.groupBy("o_year")
        .agg(
            F.round(
                num.cast("decimal(30,6)").cast("double")
                / den.cast("decimal(30,6)").cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "tpch_q12_late_lines",
    oracle_sql="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
    tags=("analytics", "tpch",),
)
def tpch_q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-priority audit): count critical- vs
    normal-priority order lines among late shipments, per category.
    Fixture substitutions: the spec's ``l_shipmode`` dimension becomes
    ``l_linestatus`` and the commit/receipt-date lateness test becomes
    ``l_shipdate > o_orderdate + 60 days`` (the fixture carries only
    the ship date).

    Scale: one order-key shuffle join with a residual date predicate;
    the two conditional counts fold into a single grouped pass over the
    join output (Q12's signature CASE-inside-SUM pattern).
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "tpch_q13_customer_distribution",
    oracle_sql="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("analytics", "tpch", "outer-join"),
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order distribution): histogram of
    order counts per customer, zero-order customers included — the
    left-outer-join-then-double-aggregate pattern.  The spec's
    ``o_comment NOT LIKE`` exclusion becomes ``o_orderpriority <>
    '5-LOW'``; crucially it stays INSIDE the join condition so excluded
    customers still appear with c_count = 0.

    Scale: customer⋈orders shuffles on the customer key, the first
    aggregate reuses that partitioning (no second exchange), and the
    second aggregate groups a tiny histogram.  count(o_orderkey) —
    not count(*) — so unmatched customers count 0, exactly the
    outer-join semantics the oracle checks.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").cast("long").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "tpch_q15_top_supplier",
    oracle_sql=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST({_REV_SQL} AS DECIMAL(30,6)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
    tags=("analytics", "tpch", "subquery"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): the supplier(s) with maximum
    revenue over one quarter — the aggregate-vs-its-own-max pattern the
    spec writes as a view plus scalar subquery.

    The max filter is an equi semi join of the revenue aggregate
    against its own 1-row max (broadcast), not a driver-side collect;
    ties return every row at the front, and because revenue is exact
    decimal the max front is engine-identical.  Scale: revenue is one
    suppkey-grouped pass over the date-pruned scan; the supplier dim
    broadcasts.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_term()).cast("decimal(30,6)").alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    top = rev.join(F.broadcast(mx), rev.total_revenue == F.col("mx"), "semi")
    return (
        top.join(F.broadcast(s), top.supplier_no == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q17_small_qty_revenue",
    oracle_sql="""
    WITH per_part AS (
      SELECT l_partkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(30,6))
               AS sum_qty,
             count(*) AS cnt
      FROM lineitem
      GROUP BY l_partkey
    )
    SELECT round(CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,6)))
                           AS DECIMAL(30,6)) AS DOUBLE) / 7.0, 6) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN per_part a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND CAST(l.l_quantity AS DECIMAL(18,6)) * 5 * a.cnt < a.sum_qty
    """,
    tags=("analytics", "tpch", "subquery"),
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): revenue lost to
    lineitems ordering under 20% of their part's average quantity — the
    correlated-scalar-subquery-per-group pattern, decorrelated into a
    join against a per-part aggregate.  The spec's p_container filter
    becomes p_brand (the fixture's only part attribute of that kind).

    The 20%-of-average threshold is evaluated as
    ``qty * 5 * cnt < sum_qty`` in exact decimals — algebraically
    identical to ``qty < 0.2 * avg`` but with no double division, so
    the cut cannot straddle engines on a borderline row.  Scale: both
    the aggregate and the probe key on l_partkey, so AQE plans one
    shuffle lineage; part broadcasts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    per_part = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.sum(dec("l_quantity")).cast("decimal(30,6)").alias("sum_qty"),
        F.count("*").alias("cnt"),
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(per_part, li.l_partkey == F.col("a_partkey"))
        .filter(dec("l_quantity") * F.lit(5) * F.col("cnt") < F.col("sum_qty"))
        .agg(
            F.round(
                F.sum(dec("l_extendedprice")).cast("decimal(30,6)").cast("double")
                / F.lit(7.0),
                6,
            ).alias("avg_yearly")
        )
    )


@register(
    "tpch_q19_discounted_revenue",
    oracle_sql=f"""
    SELECT CAST(CAST({_REV_SQL} AS DECIMAL(30,6)) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("analytics", "tpch",),
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue): revenue over three OR-ed
    brand/size/quantity predicate branches — the disjunctive-predicate
    query that tests an optimizer's ability to keep an equi join
    underneath OR conditions.  The spec's p_container and l_shipmode
    legs drop (absent from the fixture); brand, size, and quantity
    bands remain.

    Scale: the join stays a broadcast hash join on p_partkey (part is
    the dim); the OR predicate is a residual filter on the join output,
    NOT a join condition — so no nested-loop fallback.  A single
    scalar result in exact decimal.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & sz.between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & sz.between(1, 35) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.sum(_rev_term()).cast("decimal(30,6)").cast("double").alias("revenue"))
    )


@register(
    "tpch_q21_waiting_supplier",
    oracle_sql="""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM late l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name ASC
    LIMIT 10
    """,
    tags=("analytics", "tpch", "semi-join", "anti-join"),
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): suppliers
    who shipped late on a finished multi-supplier order where every
    OTHER supplier shipped on time — the EXISTS + NOT-EXISTS double
    correlated subquery, the hardest decorrelation in the suite.
    Lateness is ``l_shipdate > o_orderdate + 30 days`` (the fixture has
    no commit/receipt dates).

    Both correlations compile to order-key-equi joins with a
    same-order-different-supplier residual: EXISTS -> left semi against
    all lineitems, NOT EXISTS -> left anti against the late subset.
    Scale: every join in the plan keys on l_orderkey, so the late CTE,
    the semi, and the anti probe share one shuffle lineage; supplier
    broadcasts; top-10 compiles to TakeOrderedAndProject.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    l1 = (
        late.join(
            l2,
            (late.l_orderkey == F.col("o2")) & (late.l_suppkey != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (late.l_orderkey == F.col("o3")) & (late.l_suppkey != F.col("s3")),
            "left_anti",
        )
    )
    return (
        l1.join(F.broadcast(s), l1.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


# Country-code set for Q22: nationkey mod 10 buckets standing in for the
# spec's phone-prefix country codes (the fixture has no c_phone).
Q22_CODES = (1, 2, 3, 4, 5)


@register(
    "tpch_q22_sales_opportunity",
    oracle_sql=f"""
    WITH pool AS (
      SELECT c_custkey,
             CAST(c_nationkey % 10 AS BIGINT) AS cntrycode,
             CAST(c_acctbal AS DECIMAL(18,6)) AS bal
      FROM customer
      WHERE CAST(c_nationkey % 10 AS BIGINT) IN {Q22_CODES}
    ),
    thresh AS (
      SELECT CAST(sum(bal) AS DECIMAL(30,6)) AS sum_bal, count(*) AS cnt
      FROM pool WHERE bal > 0
    )
    SELECT p.cntrycode,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(CAST(sum(p.bal) AS DECIMAL(30,6)) AS DOUBLE) AS totacctbal
    FROM pool p, thresh t
    WHERE p.bal * t.cnt > t.sum_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = p.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY p.cntrycode
    ORDER BY p.cntrycode
    """,
    tags=("analytics", "tpch", "anti-join"),
)
def tpch_q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): well-funded
    customers in selected countries who never ordered — the
    anti-join-plus-global-average-threshold pattern.  Country code is
    ``c_nationkey % 10`` standing in for the spec's phone prefix, and
    "never ordered" is the spec's own "no orders in the recent window"
    (every fixture customer has SOME order; none would match otherwise).

    The above-average test is ``bal * cnt > sum_bal`` in exact decimals
    (no double division, so the threshold cannot straddle engines); the
    1-row threshold aggregate enters the plan as a scalar subquery via
    registered views — no driver action, no nested-loop join.  NOT
    EXISTS compiles to a left anti join against orders on the customer
    key.  Scale: pool and orders shuffle on custkey; everything else is
    scan-local.
    """
    register_views(spark, sf_dir)
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    pool = (
        c.select(
            "c_custkey",
            (F.col("c_nationkey") % 10).cast("long").alias("cntrycode"),
            dec("c_acctbal").alias("bal"),
        )
        .filter(F.col("cntrycode").isin(*Q22_CODES))
    )
    sum_bal = F.expr(
        "(SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DECIMAL(30,6))"
        " FROM customer WHERE CAST(c_nationkey % 10 AS BIGINT)"
        f" IN {Q22_CODES} AND c_acctbal > 0)"
    )
    cnt = F.expr(
        "(SELECT count(*) FROM customer"
        " WHERE CAST(c_nationkey % 10 AS BIGINT)"
        f" IN {Q22_CODES} AND c_acctbal > 0)"
    )
    return (
        pool.filter(F.col("bal") * cnt > sum_bal)
        .join(o, pool.c_custkey == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.sum("bal").cast("decimal(30,6)").cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# ---------------------------------------------------------------------------
# Q2/Q9/Q11/Q16/Q20 — the partsupp-dependent shapes.  The driver schema
# ships no partsupp table, so these run on a DERIVED one: the distinct
# (l_partkey, l_suppkey) pairs actually traded, with supply cost and
# available quantity synthesized from the keys by the same integer
# formulas in both engines (deterministic, exact — supplycost is an
# integer number of cents times an exactly-representable 0.01).  The
# query SHAPES — correlated min-cost subquery, profit expression,
# HAVING-vs-global-scalar, count-distinct with NOT-IN exclusion, nested
# IN with a correlated half-of-shipped threshold — are the spec's.
# ---------------------------------------------------------------------------

_SQL_PARTSUPP = """
    partsupp AS (
      SELECT ps_partkey, ps_suppkey,
             CAST((ps_partkey * 31 + ps_suppkey * 17) % 10000 + 100
                  AS DECIMAL(18,6)) * CAST(0.01 AS DECIMAL(18,6))
               AS ps_supplycost,
             CAST((ps_partkey * 7 + ps_suppkey * 13) % 1000 + 1 AS BIGINT)
               AS ps_availqty
      FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
            FROM lineitem)
    )
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).distinct()
    cents = (F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17) % 10000 + 100
    return ps.select(
        "ps_partkey",
        "ps_suppkey",
        (cents.cast("decimal(18,6)") * F.lit(0.01).cast("decimal(18,6)"))
        .alias("ps_supplycost"),
        ((F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 13) % 1000 + 1)
        .cast("long")
        .alias("ps_availqty"),
    )


@register(
    "tpch_q2_min_cost_supplier",
    oracle_sql=f"""
    WITH {_SQL_PARTSUPP},
    eligible AS (
      SELECT ps.ps_partkey, ps.ps_suppkey, ps.ps_supplycost,
             s.s_name, s.s_acctbal, n.n_name
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = (SELECT min(r_name) FROM region)
    ),
    minc AS (
      SELECT ps_partkey, min(ps_supplycost) AS min_cost
      FROM eligible GROUP BY ps_partkey
    )
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_type,
           CAST(e.ps_supplycost AS DOUBLE) AS supplycost
    FROM eligible e
    JOIN part p ON p.p_partkey = e.ps_partkey
    JOIN minc m ON m.ps_partkey = e.ps_partkey
               AND e.ps_supplycost = m.min_cost
    WHERE p.p_type = 'LARGE' AND p.p_size <= 10
    ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
    LIMIT 100
    """,
    tags=("analytics", "tpch", "subquery"),
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for each qualifying part,
    the region-local supplier(s) offering the minimum supply cost — the
    correlated-min-subquery-per-part pattern, decorrelated into a join
    against a per-part min aggregate over the SAME region-filtered set.

    Scale: supplier/nation/region broadcast into the derived partsupp;
    the min aggregate and the equality probe both key on ps_partkey, so
    they share one exchange lineage; cost ties return every minimal
    supplier (exact decimals — no engine can disagree about a tie);
    top-100 with a total-order sort compiles to TakeOrderedAndProject.
    """
    ps = _partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 10)
    )
    min_r = r.agg(F.min("r_name").alias("r_name_min"))
    r = r.join(F.broadcast(min_r), r.r_name == min_r.r_name_min, "semi")
    eligible = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("ps_partkey", "ps_supplycost", "s_name", "s_acctbal", "n_name")
    )
    minc = eligible.groupBy(F.col("ps_partkey").alias("m_partkey")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        eligible.join(
            minc,
            (eligible.ps_partkey == F.col("m_partkey"))
            & (eligible.ps_supplycost == F.col("min_cost")),
        )
        .join(F.broadcast(p), eligible.ps_partkey == p.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.col("ps_supplycost").cast("double").alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q9_product_profit",
    oracle_sql=f"""
    WITH {_SQL_PARTSUPP}
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(CAST(sum(
             CAST(l.l_extendedprice AS DECIMAL(18,6))
               * (CAST(1 AS DECIMAL(18,6)) - CAST(l.l_discount AS DECIMAL(18,6)))
             - ps.ps_supplycost * CAST(l.l_quantity AS DECIMAL(18,6))
           ) AS DECIMAL(38,6)) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
                    AND ps.ps_suppkey = l.l_suppkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%r%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
    tags=("analytics", "tpch", "join"),
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): nation/year profit where
    profit = revenue minus supply cost times quantity, over parts whose
    name matches a pattern — the six-table join with a compound measure
    expression.

    Scale: lineitem⋈orders is the fact-fact exchange; the derived
    partsupp joins on the composite (partkey, suppkey) key; part,
    supplier, nation broadcast.  The profit expression is entirely
    fixed-point decimal, so per-group sums are order-independent and
    engine-identical.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%r%"))
    ps = _partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    one = F.lit(1).cast("decimal(18,6)")
    profit = dec("l_extendedprice") * (one - dec("l_discount")) - F.col(
        "ps_supplycost"
    ) * dec("l_quantity")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(
            ps,
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.sum(profit).cast("decimal(38,6)").cast("double").alias("sum_profit")
        )
    )


# Q11's importance threshold: a part group is "important stock" when its
# value exceeds 1/1000 of the nation's total (the spec's 0.0001/SF knob).
Q11_FRACTION_DENOM = 1000


@register(
    "tpch_q11_important_stock",
    oracle_sql=f"""
    WITH {_SQL_PARTSUPP},
    natps AS (
      SELECT ps.ps_partkey, ps.ps_supplycost * ps.ps_availqty AS val
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = (SELECT min(n_name) FROM nation)
    )
    SELECT ps_partkey,
           CAST(CAST(sum(val) AS DECIMAL(38,6)) AS DOUBLE) AS stock_value
    FROM natps
    GROUP BY ps_partkey
    HAVING sum(val) * {Q11_FRACTION_DENOM} > (SELECT sum(val) FROM natps)
    ORDER BY stock_value DESC, ps_partkey
    """,
    tags=("analytics", "tpch", "subquery"),
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification): per-part stock
    value within one nation, keeping parts whose value exceeds a
    fraction of the nation's total — the HAVING-vs-global-scalar
    pattern.

    The threshold compares ``group_sum * 1000 > total_sum`` in exact
    decimals (integer multiply, no division), so the cut is
    engine-exact.  The 1-row total enters as a broadcast joined to the
    per-part aggregate — both aggregates reuse ONE natps exchange
    lineage under AQE.  Scale: supplier/nation broadcast; everything
    shuffles once on ps_partkey.
    """
    ps = _partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    min_n = n.agg(F.min("n_name").alias("n_name_min"))
    n = n.join(F.broadcast(min_n), n.n_name == min_n.n_name_min, "semi")
    natps = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "ps_partkey",
            (F.col("ps_supplycost") * F.col("ps_availqty")).alias("val"),
        )
    )
    per_part = natps.groupBy("ps_partkey").agg(F.sum("val").alias("sum_val"))
    total = natps.agg(F.sum("val").alias("total_val"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("sum_val") * Q11_FRACTION_DENOM > F.col("total_val"))
        .select(
            "ps_partkey",
            F.col("sum_val").cast("decimal(38,6)").cast("double").alias(
                "stock_value"
            ),
        )
        .orderBy(F.desc("stock_value"), "ps_partkey")
    )


@register(
    "tpch_q16_supplier_counts",
    oracle_sql=f"""
    WITH {_SQL_PARTSUPP}
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 4, 7, 10, 15, 23, 45, 50)
      AND ps.ps_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    tags=("analytics", "tpch", "anti-join"),
)
def tpch_q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (part-supplier relationship count): distinct
    supplier counts per (brand, type, size) with brand/type/size
    screens and a NOT-IN supplier exclusion — count-distinct under an
    anti join.  The spec's comment-LIKE exclusion becomes negative
    account balance (the fixture has no comments).

    Scale: the exclusion list is dim-sized and compiles to a broadcast
    anti join (s_suppkey is never null, so NOT IN == anti); part
    broadcasts; the count-distinct expands to the standard two-level
    aggregate on the group keys.
    """
    ps = _partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 7, 10, 15, 23, 45, 50))
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        ps.join(F.broadcast(bad), ps.ps_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q20_potential_promotion",
    oracle_sql=f"""
    WITH {_SQL_PARTSUPP},
    shipped AS (
      SELECT l_partkey, l_suppkey,
             sum(CAST(l_quantity AS DECIMAL(18,6))) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_partkey, l_suppkey
    ),
    excess AS (
      SELECT DISTINCT ps.ps_suppkey
      FROM partsupp ps
      JOIN part p ON p.p_partkey = ps.ps_partkey AND p.p_name LIKE 'r%'
      LEFT JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                          AND sh.l_suppkey = ps.ps_suppkey
      WHERE CAST(ps.ps_availqty * 2 AS DECIMAL(18,6))
            > coalesce(sh.qty, CAST(0 AS DECIMAL(18,6)))
    )
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = (SELECT min(n_name) FROM nation)
      AND s.s_suppkey IN (SELECT ps_suppkey FROM excess)
    ORDER BY s.s_name
    """,
    tags=("analytics", "tpch", "semi-join"),
)
def tpch_q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers in one
    nation holding excess stock — available quantity more than half of
    what they shipped of pattern-matched parts in one year.  The
    spec's nested IN subqueries with a correlated sum become: a
    (partkey, suppkey)-grouped shipped aggregate, a left join for the
    never-shipped case, and a semi join into supplier.

    The half threshold is ``availqty * 2 > shipped_qty`` in exact
    decimals — no halving division to disagree about.  Scale: the
    shipped aggregate and the partsupp probe share the composite key;
    part broadcasts; the final semi join ships only supplier keys.
    """
    ps = _partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("r%"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    min_n = n.agg(F.min("n_name").alias("n_name_min"))
    n = n.join(F.broadcast(min_n), n.n_name == min_n.n_name_min, "semi")
    shipped = li.groupBy(
        F.col("l_partkey").alias("sh_partkey"),
        F.col("l_suppkey").alias("sh_suppkey"),
    ).agg(F.sum(dec("l_quantity")).alias("qty"))
    excess = (
        ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .join(
            shipped,
            (ps.ps_partkey == F.col("sh_partkey"))
            & (ps.ps_suppkey == F.col("sh_suppkey")),
            "left",
        )
        .filter(
            (F.col("ps_availqty") * 2).cast("decimal(18,6)")
            > F.coalesce(F.col("qty"), F.lit(0).cast("decimal(18,6)"))
        )
        .select("ps_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(excess, s.s_suppkey == excess.ps_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# --- TPC-H refresh functions RF1/RF2 -------------------------------------
# The spec's throughput test interleaves the 22 queries with refresh
# streams: RF1 inserts ~0.1% new orders, RF2 deletes ~0.1% existing
# ones.  The fixture ships no refresh files, so both sets are derived
# deterministically: RF2 deletes orders whose md5 bucket hits 1-in-64;
# RF1 re-inserts a transformed copy of a DIFFERENT 1-in-64 slice under
# fresh keys (max key + old key), which both engines synthesize
# identically.
RF_MOD = 64


@register(
    "tpch_rf1_rf2_refresh",
    oracle_sql="""
    WITH maxk AS (SELECT max(o_orderkey) AS mk FROM orders),
    inserts AS (
      SELECT o_orderkey + (SELECT mk FROM maxk) AS o_orderkey,
             o_custkey, o_orderstatus, o_totalprice, o_orderdate,
             o_orderpriority
      FROM orders
      WHERE CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4)
                 AS BIGINT) % 64 = 1
    ),
    refreshed AS (
      SELECT * FROM orders
      WHERE CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4)
                 AS BIGINT) % 64 <> 0
      UNION ALL
      SELECT * FROM inserts
    )
    SELECT o_orderstatus,
           count(*) AS n_orders,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(30,6)) AS DOUBLE)
             AS sum_price,
           max(o_orderkey) AS max_key
    FROM refreshed
    GROUP BY o_orderstatus
    """,
    tags=("tpch", "refresh", "merge"),
)
def tpch_rf1_rf2_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H refresh streams RF1 (insert) + RF2 (delete) applied as one
    batch merge, completing the spec surface beyond the 22 query shapes:
    delete a deterministic 1-in-{RF_MOD} key slice, insert a re-keyed
    copy of a disjoint slice (fresh keys above max), then audit the
    refreshed table per order status (count, exact-decimal price sum,
    max key — so a missed delete, doubled insert, or key collision all
    break the diff).

    Scale shape: the delete is a narrow hash-predicate filter (NO
    anti-join — the delete set is defined by the key itself, the
    batch-pipeline analog of partition-level deletes); the insert side
    is a second narrow map over the same scan unioned in, and the 1-row
    max-key aggregate broadcasts.  One scan feeds both branches, one
    tiny shuffle for the final audit agg.  On a real lakehouse table
    this maps to MERGE INTO / copy-on-write semantics; the dataflow —
    filter ∪ transformed-insert, then audit — is exactly this plan.
    """
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % RF_MOD
    )
    maxk = o.agg(F.max("o_orderkey").alias("mk"))
    inserts = (
        o.filter(bucket == 1)
        .crossJoin(F.broadcast(maxk))
        .select(
            (F.col("o_orderkey") + F.col("mk")).alias("o_orderkey"),
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
    )
    refreshed = o.filter(bucket != 0).unionByName(inserts)
    return refreshed.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        exact_sum("o_totalprice").alias("sum_price"),
        F.max("o_orderkey").alias("max_key"),
    )
