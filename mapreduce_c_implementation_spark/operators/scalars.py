"""Scalar function pack (SURVEY.md §2.2: string/date/math/array/json).

The reference's only scalar functions are ``tolower``/``isalnum``/
``atoi`` inside user callbacks (src/main.c:41-44, src/mapreduce.h:115);
everything here is Spark built-ins, chosen and cast so DuckDB computes
bit-identical values (ints -> BIGINT, single-rounding IEEE double ops
only, no locale- or tz-dependent functions outside UTC).

All pure column expressions — full whole-stage codegen, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_c_implementation_spark.functions.text import DUCKDB_TOKENIZE, tokenize
from mapreduce_c_implementation_spark.registry import register
from mapreduce_c_implementation_spark.sources import load_table
from mapreduce_c_implementation_spark.sources.tables import parallel_scan


@register(
    "string_functions",
    oracle_sql="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           substr(p_name, 1, 5) AS name_prefix,
           replace(p_type, ' ', '_') AS type_snake,
           concat(p_brand, ':', p_type) AS brand_type,
           CAST(length(p_name) AS BIGINT) AS name_len,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           trim('  ' || p_brand || ' ') AS brand_trimmed,
           reverse(p_brand) AS brand_rev,
           CAST(strpos(p_name, 'a') AS BIGINT) AS first_a
    FROM part
    """,
    tags=("scalar", "string"),
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar pack over part (ASCII fixture data, so Unicode-vs-
    ASCII semantics don't diverge; instr/strpos are 1-based in both)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias(
            "brand_trimmed"
        ),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.instr(F.col("p_name"), "a").cast("long").alias("first_a"),
    )


@register(
    "date_functions",
    oracle_sql="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(month(o_orderdate) AS BIGINT) AS order_month,
           CAST(day(o_orderdate) AS BIGINT) AS order_day,
           CAST(quarter(o_orderdate) AS BIGINT) AS order_quarter,
           date_trunc('month', o_orderdate) AS month_start,
           o_orderdate + INTERVAL 30 DAY AS due_ts,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
             AS days_since_epoch_start,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date_str
    FROM orders
    """,
    tags=("scalar", "date"),
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar pack over orders (UTC session — SURVEY §7).
    Avoids dayofweek (Spark 1=Sunday vs DuckDB 0=Sunday) by design."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.timestamp_add("DAY", F.lit(30), F.col("o_orderdate")).alias("due_ts"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_start"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
    )


@register(
    "math_functions",
    oracle_sql="""
    SELECT l_orderkey, l_linenumber, l_partkey,
           abs(l_extendedprice - 50000.0) AS abs_diff,
           round(l_extendedprice, 1) AS price_round,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           sqrt(l_quantity) AS qty_sqrt,
           l_partkey % 7 AS partkey_mod,
           CAST(greatest(l_quantity, 25.0) AS DOUBLE) AS qty_hi,
           CAST(least(l_quantity, 25.0) AS DOUBLE) AS qty_lo,
           CAST(sign(l_extendedprice - 50000.0) AS DOUBLE) AS price_sign
    FROM lineitem
    """,
    tags=("scalar", "math"),
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar pack — only IEEE-correctly-rounded ops (abs, sqrt,
    floor/ceil, mod); transcendentals (ln/exp) are excluded from oracle
    checks since libm vs JDK may differ in the last ulp."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.abs(F.col("l_extendedprice") - 50000.0).alias("abs_diff"),
        F.round("l_extendedprice", 1).alias("price_round"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_partkey") % 7).alias("partkey_mod"),
        F.greatest(F.col("l_quantity"), F.lit(25.0)).cast("double").alias("qty_hi"),
        F.least(F.col("l_quantity"), F.lit(25.0)).cast("double").alias("qty_lo"),
        F.signum(F.col("l_extendedprice") - 50000.0).cast("double").alias("price_sign"),
    )


@register(
    "json_functions",
    oracle_sql="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
           (CAST(json_extract_string(props, '$.k') AS BIGINT) > 50) AS k_high
    FROM events
    """,
    tags=("scalar", "json"),
)
def json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from events.props (the driver fixture's JSON
    column — FIXTURES.md §3) via get_json_object / from_json."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("long").alias("k_num"),
        (F.get_json_object("props", "$.k").cast("long") > 50).alias("k_high"),
    )


@register(
    "array_functions",
    oracle_sql="""
    WITH toks AS (
      SELECT doc_id,
             list_transform(
               list_filter(string_split_regex(text, '[^a-zA-Z0-9]+'), t -> t <> ''),
               t -> lower(substr(t, 1, 255))) AS tokens
      FROM documents
    )
    SELECT doc_id,
           CAST(len(tokens) AS BIGINT) AS n_tokens,
           tokens[1] AS first_token,
           tokens[-1] AS last_token,
           array_to_string(list_sort(tokens)[1:3], '|') AS first3_sorted,
           list_contains(tokens, 'data') AS has_data,
           CAST(len(list_distinct(tokens)) AS BIGINT) AS n_distinct_tokens
    FROM toks
    """,
    tags=("scalar", "array"),
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar pack over tokenized documents: size, indexing,
    slice, sort, containment, distinct — all JVM-side array functions
    (no explode, no shuffle: a purely narrow map)."""
    from mapreduce_c_implementation_spark.functions.text import tokenize

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokenize(F.col("text")).alias("tokens"))
    return toks.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_tokens"),
        # try_element_at: NULL (not an ANSI error) on empty token arrays
        F.try_element_at("tokens", F.lit(1)).alias("first_token"),
        F.try_element_at("tokens", F.lit(-1)).alias("last_token"),
        F.array_join(F.slice(F.sort_array("tokens"), 1, 3), "|").alias("first3_sorted"),
        F.array_contains("tokens", "data").alias("has_data"),
        F.size(F.array_distinct("tokens")).cast("long").alias("n_distinct_tokens"),
    )


@register(
    "conditional_functions",
    oracle_sql="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS balance_tier,
           coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_masked,
           (c_acctbal BETWEEN 0 AND 1000) AS small_positive,
           if(c_nationkey % 2 = 0, 'even', 'odd') AS nation_parity
    FROM customer
    """,
    tags=("scalar", "conditional"),
)
def conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif / between / if over customer."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("balance_tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER"))
        .alias("segment_masked"),
        F.col("c_acctbal").between(0, 1000).alias("small_positive"),
        F.when(F.col("c_nationkey") % 2 == 0, "even").otherwise("odd").alias(
            "nation_parity"
        ),
    )


@register(
    "filter_project_pushdown",
    oracle_sql="""
    SELECT l_orderkey, l_partkey, l_quantity,
           (CAST(CAST(l_extendedprice AS DECIMAL(18,6)) *
                 (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
            AS DOUBLE)) AS net_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
      AND l_quantity > 40
    """,
    tags=("scalar", "filter", "pushdown"),
)
def filter_project_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level filter + computed projection — the reference does this
    inside Map (SURVEY §2 row 5 note); declaratively, Catalyst pushes
    all three predicates into the parquet scan and prunes to 6 columns
    (asserted in tests/test_plans.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(18,6)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_returnflag") == "R")
            & (F.col("l_quantity") > 40)
        )
        .select(
            "l_orderkey",
            "l_partkey",
            "l_quantity",
            (
                F.col("l_extendedprice").cast("decimal(18,6)")
                * (one - F.col("l_discount").cast("decimal(18,6)"))
            )
            .cast("double")
            .alias("net_price"),
        )
    )


@register(
    "map_functions",
    oracle_sql="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_from_map,
           1 AS n_keys,
           'k' AS first_key,
           (json_extract_string(props, '$.k') IS NOT NULL) AS has_k
    FROM events
    """,
    tags=("scalar", "map"),
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: parse events.props into map<string,bigint> with
    from_json, then map_keys/map_values/element access/map_contains_key
    — the typed-map view of semi-structured data (SURVEY §2.2 scalar
    row).  The oracle reads the same facts straight from the JSON."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return e.select(
        "event_id",
        F.try_element_at(m, F.lit("k")).alias("k_from_map"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.try_element_at(F.map_keys(m), F.lit(1)).alias("first_key"),
        F.map_contains_key(m, F.lit("k")).alias("has_k"),
    )


@register(
    "regex_functions",
    oracle_sql="""
    SELECT p_partkey,
           regexp_extract(p_type, '([A-Z]+)', 1) AS first_upper_run,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           regexp_matches(p_brand, '[0-9]$') AS ends_with_digit,
           CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS BIGINT) AS n_lower_runs
    FROM part
    """,
    tags=("scalar", "regex"),
)
def regex_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar pack: extract / replace-all / match-test / count.
    Patterns restricted to simple character classes where Java regex and
    DuckDB's RE2 agree (no lookaround, no \\b, no Unicode classes —
    those diverge between dialects).  Note Spark regexp_replace replaces
    ALL matches by default; DuckDB needs the explicit 'g' flag."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", "([A-Z]+)", 1).alias("first_upper_run"),
        F.regexp_replace(F.col("p_name"), "[aeiou]", "_").alias("devoweled"),
        F.col("p_brand").rlike("[0-9]$").alias("ends_with_digit"),
        F.size(F.regexp_extract_all("p_name", F.lit("[a-z]+"), F.lit(0)))
        .cast("long")
        .alias("n_lower_runs"),
    )


@register(
    "null_semantics",
    oracle_sql="""
    SELECT l_returnflag,
           count(*) AS n_rows,
           count(nullif(l_discount, 0.0)) AS n_discounted,
           CAST(CAST(sum(CAST(nullif(l_discount, 0.0) AS DECIMAL(18,6)))
                AS DECIMAL(30,6)) AS DOUBLE) AS sum_nonzero_disc,
           (CAST(CAST(sum(CAST(nullif(l_discount, 0.0) AS DECIMAL(18,6)))
                 AS DECIMAL(30,6)) AS DOUBLE)
            / count(nullif(l_discount, 0.0))) AS avg_nonzero_disc,
           count(*) - count(nullif(l_discount, 0.0)) AS n_null_skipped,
           max(coalesce(nullif(l_discount, 0.0), -1.0)) AS max_or_sentinel
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("scalar", "null"),
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling parity (the reference has no NULL concept —
    SURVEY §1.4; SQL engines must agree on skip-vs-count): aggregates
    over a derived nullable column pin down count(col) vs count(*),
    null-skipping sums/avgs, and coalesce fallbacks."""
    li = load_table(spark, sf_dir, "lineitem")
    nd = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.count(nd).alias("n_discounted"),
        F.sum(nd.cast("decimal(18,6)")).cast("decimal(30,6)").cast("double").alias(
            "sum_nonzero_disc"
        ),
        (
            F.sum(nd.cast("decimal(18,6)")).cast("decimal(30,6)").cast("double")
            / F.count(nd)
        ).alias("avg_nonzero_disc"),
        (F.count("*") - F.count(nd)).alias("n_null_skipped"),
        F.max(F.coalesce(nd, F.lit(-1.0))).alias("max_or_sentinel"),
    )


@register(
    "explode_outer_tokens",
    oracle_sql="""
    WITH toks AS (
      SELECT doc_id,
             list_transform(
               list_filter(string_split_regex(text, '[^a-zA-Z0-9]+'), t -> t <> ''),
               t -> lower(substr(t, 1, 255))) AS tokens
      FROM documents
    )
    SELECT doc_id, unnest(CASE WHEN len(tokens) = 0 THEN [NULL] ELSE tokens END)
             AS word
    FROM toks
    WHERE doc_id % 25 = 0
    """,
    tags=("scalar", "explode"),
)
def explode_outer_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: rows with EMPTY token arrays survive as a single
    NULL-word row (plain explode silently drops them — the lateral-join
    footgun when counting documents after tokenization)."""
    from mapreduce_c_implementation_spark.functions.text import tokenize

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    return d.select(
        "doc_id",
        F.explode_outer(tokenize(F.col("text"))).alias("word"),
    )


@register(
    "higher_order_functions",
    oracle_sql=f"""
    SELECT doc_id,
           CAST(len(list_filter(lens, x -> x >= 5)) AS BIGINT) AS n_long,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), lens),
                            (acc, x) -> acc + x) AS BIGINT) AS len_sum,
           CAST(len(lens) > 0 AND len(list_filter(lens, x -> x > 10)) > 0
                AS BOOLEAN) AS has_giant,
           CAST(list_reduce(
                  list_prepend(CAST(0 AS BIGINT),
                    list_transform(generate_series(1, len(lens)),
                                   i -> i * lens[i])),
                  (acc, x) -> acc + x) AS BIGINT) AS pos_weighted
    FROM (
      SELECT doc_id,
             list_transform({DUCKDB_TOKENIZE.format(col="text")},
                            t -> CAST(length(t) AS BIGINT)) AS lens
      FROM documents
    )
    """,
    tags=("scalar", "array", "higher-order"),
)
def higher_order_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lambda/higher-order array surface in one operator: transform
    (token -> length), filter (count long tokens), exists (any > 10),
    aggregate (sum), and an indexed transform+aggregate (position-
    weighted sum, the zip_with-with-indices idiom).  All five compile
    to codegen'd array expressions — per-row lambdas run INSIDE the
    JVM, not as Python UDFs, which is why HOFs are the scale-safe way
    to process array columns (contrast a row-at-a-time Python UDF at
    ~100x the cost).
    """
    d = parallel_scan(spark, sf_dir, "documents")
    lens = F.transform(tokenize(F.col("text")), lambda t: F.length(t).cast("long"))
    base = d.select("doc_id", lens.alias("lens"))
    len_sum = F.aggregate(
        F.col("lens"), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    pos_weighted = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.size("lens")),
            lambda i: i.cast("long") * F.element_at(F.col("lens"), i),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return base.select(
        "doc_id",
        F.size(F.filter(F.col("lens"), lambda x: x >= 5)).cast("long").alias("n_long"),
        len_sum.alias("len_sum"),
        ((F.size("lens") > 0) & F.exists(F.col("lens"), lambda x: x > 10)).alias(
            "has_giant"
        ),
        pos_weighted.alias("pos_weighted"),
    )


@register(
    "variant_json_shred",
    oracle_sql="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS min_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k,
           CAST(count(CASE WHEN json_extract_string(props, '$.missing') IS NOT NULL
                           THEN 1 END) AS BIGINT) AS n_unexpected_field
    FROM events
    GROUP BY event_type
    """,
    tags=("scalar", "variant", "json"),
)
def variant_json_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured shredding through Spark 4's VARIANT type:
    ``parse_json`` turns the props JSON string into a binary variant
    once, then ``variant_get`` path extraction pulls typed fields —
    the open-format answer to schema-on-read (parse once, extract
    many, no per-field JSON re-parse).  Absent paths return NULL, not
    errors — n_unexpected_field counts rows where the absent '$.missing'
    path unexpectedly RESOLVES (0 by construction), pinning that
    contract.

    At 100 TB this is the difference between one JSON parse per row
    and one per field: variant shreds to a columnar-friendly binary
    the extractions share.  The aggregate after the shred is an
    ordinary partial/final groupBy.
    """
    e = load_table(spark, sf_dir, "events")
    v = e.select(
        "event_type", F.parse_json("props").alias("v")
    ).select(
        "event_type",
        F.try_variant_get(F.col("v"), "$.k", "bigint").alias("k"),
        F.try_variant_get(F.col("v"), "$.missing", "bigint").alias("m"),
    )
    return v.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("k").cast("long").alias("sum_k"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
        F.count("m").cast("long").alias("n_unexpected_field"),
    )


@register(
    "map_higher_order_functions",
    oracle_sql="""
    SELECT event_id,
           CAST(2 * k + 6 * k + 14 AS BIGINT) AS doubled_sum,
           'BONUS,K,K2' AS upper_keys,
           CAST((CASE WHEN k > 5 THEN 1 ELSE 0 END)
                + (CASE WHEN 3 * k > 5 THEN 1 ELSE 0 END)
                + 1 AS BIGINT) AS n_over_5,
           CAST(CASE WHEN k IS NULL THEN 10 ELSE 4 * k + 10 END AS BIGINT)
             AS zipped_sum
    FROM (
      SELECT event_id,
             TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    """,
    tags=("scalar", "map", "higher-order"),
)
def map_higher_order_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed higher-order lambdas — transform_values, transform_keys,
    map_filter, map_zip_with — the MapType half of the lambda surface
    (``higher_order_functions`` covers arrays).  A 3-entry map is built
    from the event's k value; every HOF result is reduced to a scalar.

    The oracle does NOT mirror the map machinery: it computes each
    expected value arithmetically from k (doubled_sum = 2k+6k+14,
    zipped_sum = 4k+10, …), so a wrong lambda, a dropped entry, or bad
    null handling in the map path cannot cancel itself out.  The
    missing-k contract is encoded explicitly (zipped_sum coalesces
    absent values to 0 -> 10; the other aggregates propagate NULL), so
    a fixture lacking k on some rows still diffs clean.  All JVM-side,
    no shuffle.
    """
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    m = F.create_map(
        F.lit("k"), k, F.lit("k2"), k * 3, F.lit("bonus"), F.lit(7).cast("long")
    )
    m2 = F.create_map(
        F.lit("k"), F.lit(1).cast("long"), F.lit("k2"), F.lit(2).cast("long")
    )
    doubled = F.transform_values(m, lambda _, v: v * 2)
    sum_vals = lambda mm: F.aggregate(  # noqa: E731
        F.map_values(mm), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    upper_keys = F.array_join(
        F.array_sort(F.map_keys(F.transform_keys(m, lambda key, _: F.upper(key)))),
        ",",
    )
    n_over_5 = F.size(F.map_filter(m, lambda _, v: v > 5))
    zipped = F.map_zip_with(
        m,
        m2,
        lambda _, v1, v2: F.coalesce(v1, F.lit(0)) + F.coalesce(v2, F.lit(0)),
    )
    return e.select(
        "event_id",
        sum_vals(doubled).alias("doubled_sum"),
        upper_keys.alias("upper_keys"),
        n_over_5.cast("long").alias("n_over_5"),
        sum_vals(zipped).alias("zipped_sum"),
    )
