"""The user-function surface (SURVEY.md §2.2: "UDF/UDAF/UDTF — this is
the whole API" of the reference):

    reference Mapper  (1 -> n rows,  src/mapreduce.h:91)  -> Python UDTF
    reference Reducer (group fold,   src/mapreduce.h:121) -> pandas GROUPED_AGG
    reference Combiner(partial agg,  src/mapreduce.h:135) -> automatic partial agg
    per-group arbitrary logic (Getter iterator protocol)  -> applyInPandas

Performance ladder (each docstring states where the op sits):
built-in expressions (codegen) >> Arrow pandas_udf >> row Python udf.
The built-in formulations of these same operators live in
mapreduce_core/aggregates; these exist to prove the full API surface
with the same differential-oracle rigor.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_c_implementation_spark.functions.text import DUCKDB_TOKENIZE
from mapreduce_c_implementation_spark.registry import register
from mapreduce_c_implementation_spark.sources.tables import load_table

_TOK = DUCKDB_TOKENIZE.format(col="text")


@register(
    "udtf_tokenize",
    oracle_sql=f"""
    SELECT doc_id, unnest({_TOK}) AS word
    FROM documents
    """,
    tags=("udf", "udtf"),
)
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference Mapper as a literal Python UDTF: one input row ->
    0..n output rows via lateral join (typedef void (*Mapper), emitting
    through MR_Emit == yield).

    Slow path by design (per-row Python); the production formulation is
    the codegen'd explode/split in mapreduce_core.tokenize_flatmap —
    this op proves the 1->n user-function contract itself.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string")
    class TokenizeUDTF:
        def eval(self, text: str):  # noqa: ANN001
            if text is None:
                return
            word = []
            for ch in text:
                if ch.isascii() and ch.isalnum():
                    if len(word) < 255:
                        word.append(ch.lower())
                else:
                    if word:
                        yield ("".join(word),)
                        word = []
            if word:
                yield ("".join(word),)

    spark.udtf.register("tokenize_udtf", TokenizeUDTF)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents_v")
    return spark.sql(
        "SELECT d.doc_id, t.word FROM documents_v d, LATERAL tokenize_udtf(d.text) t"
    )


@register(
    "pandas_udf_scalar_score",
    oracle_sql="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS gross
    FROM lineitem
    WHERE l_quantity > 45
    """,
    tags=("udf", "pandas"),
)
def pandas_udf_scalar_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas_udf (Arrow batches, ~10-100x over row
    Python): per-row gross price.  numpy evaluates the same IEEE double
    ops in the same per-element order as the SQL expression, so values
    are bit-identical UNROUNDED; rounding would actually break parity
    here, because exact 6-decimal products hit .5 boundaries where
    numpy (banker's) and DuckDB (half-away) disagree."""

    @F.pandas_udf("double")
    def gross(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1.0 - disc) * (1.0 + tax)

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        gross("l_extendedprice", "l_discount", "l_tax").alias("gross"),
    )


@register(
    "grouped_agg_pandas_udf",
    oracle_sql="""
    SELECT l_returnflag,
           (CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * CAST(l_quantity AS BIGINT)) AS DOUBLE)
            / sum(CAST(l_quantity AS BIGINT))) AS wavg_price_cents
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("udf", "udaf"),
)
def grouped_agg_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User aggregate (the reference Reducer contract) as a GROUPED_AGG
    pandas_udf: quantity-weighted average price.

    Arithmetic is integer-exact (prices quantized to cents, int64
    accumulation) so the result is independent of pandas' row order vs
    DuckDB's — the same order-insensitivity rule the reference's own
    apps must follow (SURVEY §1.1).
    """

    @F.pandas_udf("double")
    def wavg_cents(price: pd.Series, qty: pd.Series) -> float:
        cents = (price * 100).round().astype("int64")
        q = qty.astype("int64")
        return float((cents * q).sum()) / float(q.sum())

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        wavg_cents("l_extendedprice", "l_quantity").alias("wavg_price_cents")
    )


@register(
    "apply_in_pandas_zscore",
    oracle_sql="""
    WITH stats AS (
      SELECT o_orderpriority AS grp,
             avg(o_totalprice) AS m,
             sqrt(avg(o_totalprice * o_totalprice) - avg(o_totalprice) * avg(o_totalprice))
               AS sd
      FROM orders GROUP BY 1
    )
    SELECT o.o_orderkey, o.o_orderpriority,
           round((o.o_totalprice - s.m) / s.sd, 6) AS zscore
    FROM orders o JOIN stats s ON s.grp = o.o_orderpriority
    """,
    tags=("udf", "grouped-map"),
)
def apply_in_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary per-group logic (the reference's Reducer + Getter
    iterator protocol, src/reduce.c:25-47) via applyInPandas: per-group
    z-score normalization, a transform SQL needs a join/window for but a
    grouped-map UDF does in one pass.

    The UDF sorts its group by key before reducing, making its float
    accumulation deterministic; round(6) absorbs the sub-ulp difference
    vs the oracle's aggregation order.  Scale: one shuffle on the group
    key; each group must fit one executor's memory (fine for bounded
    groups; use window functions for unbounded ones).
    """

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("o_orderkey")
        x = pdf["o_totalprice"].astype("float64")
        m = float(x.sum()) / len(x)
        sd = (float((x * x).sum()) / len(x) - m * m) ** 0.5
        return pd.DataFrame(
            {
                "o_orderkey": pdf["o_orderkey"],
                "o_orderpriority": pdf["o_orderpriority"],
                "zscore": ((x - m) / sd).round(6),
            }
        )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    return o.groupBy("o_orderpriority").applyInPandas(
        zscore, schema="o_orderkey long, o_orderpriority string, zscore double"
    )


@register(
    "row_python_udf_format",
    oracle_sql="""
    SELECT n_nationkey,
           'nation:' || lower(n_name) || '#' || CAST(n_regionkey AS VARCHAR) AS tag
    FROM nation
    """,
    tags=("udf", "row-python"),
)
def row_python_udf_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — the DISCOURAGED bottom of the ladder
    (per-row serde, no vectorization, breaks codegen).  Registered on a
    25-row dim table only, to complete the API surface; anything hot
    uses built-ins or pandas_udf."""

    @F.udf("string")
    def tag(name: str, regionkey: int) -> str:
        return f"nation:{name.lower()}#{regionkey}"

    n = load_table(spark, sf_dir, "nation")
    return n.select("n_nationkey", tag("n_name", "n_regionkey").alias("tag"))


@register(
    "cogroup_reconcile",
    oracle_sql="""
    WITH o AS (
      SELECT o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS order_cents
      FROM orders WHERE o_orderkey % 100 = 0
    ),
    l AS (
      SELECT l_orderkey,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                           AS BIGINT)) AS BIGINT) AS charged_cents
      FROM lineitem WHERE l_orderkey % 100 = 0 GROUP BY l_orderkey
    )
    SELECT coalesce(o.o_orderkey, l.l_orderkey) AS o_orderkey,
           coalesce(l.n_lines, 0) AS n_lines,
           coalesce(o.order_cents, 0) AS order_cents,
           coalesce(l.charged_cents, 0) AS charged_cents,
           coalesce(o.order_cents, 0) - coalesce(l.charged_cents, 0) AS diff_cents
    FROM o FULL OUTER JOIN l ON l.l_orderkey = o.o_orderkey
    """,
    tags=("udf", "cogroup", "pandas"),
)
def cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The last rung of the UDF ladder: COGROUPED ``applyInPandas`` —
    two tables grouped on the same key, each group pair handed to one
    Python function (the reference's Reducer iterating two sorted
    streams at once; Spark ships both sides of a key to one task).
    Reconciles order header totals against the sum of line charges,
    keeping orders without lines and lines without orders (the cogroup
    contract: a key present on either side produces a call).

    Exactness: money goes through half-up integer cents in BOTH engines
    (floor(x*100+0.5) is the identical IEEE expression), so pandas'
    int64 sums are aggregation-order independent.  Scale: cogroup is
    one co-partitioned shuffle of both tables on the key — the 1%
    orderkey slice keeps fixture Python time bounded (cogroup pays one
    Python round-trip PER KEY, so group count, not row count, is the
    fixture cost driver); the plan shape is
    scale-free.
    """
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select("o_orderkey", "o_totalprice")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 100 == 0)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )

    def recon(key, odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        order_cents = (
            int(np.floor(odf["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64").sum())
            if len(odf)
            else 0
        )
        charged_cents = (
            int(
                np.floor(
                    ldf["l_extendedprice"].to_numpy()
                    * (1 - ldf["l_discount"].to_numpy())
                    * 100
                    + 0.5
                )
                .astype("int64")
                .sum()
            )
            if len(ldf)
            else 0
        )
        return pd.DataFrame(
            {
                "o_orderkey": [key[0]],
                "n_lines": [len(ldf)],
                "order_cents": [order_cents],
                "charged_cents": [charged_cents],
                "diff_cents": [order_cents - charged_cents],
            }
        )

    return (
        o.groupby("o_orderkey")
        .cogroup(li.groupby("l_orderkey"))
        .applyInPandas(
            recon,
            schema=(
                "o_orderkey long, n_lines long, order_cents long, "
                "charged_cents long, diff_cents long"
            ),
        )
    )


@register(
    "map_in_arrow_doc_stats",
    oracle_sql="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
    """,
    tags=("udf", "arrow"),
)
def map_in_arrow_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow-native rung of the UDF ladder: ``mapInArrow`` hands the
    Python function raw ``pyarrow.RecordBatch``es — no pandas
    conversion at all, the cheapest possible Python crossing.  Computes
    per-document character and byte lengths with pyarrow compute
    kernels (C++-vectorized, zero-copy on the Arrow buffers).

    Parity: pyarrow ``utf8_length`` counts codepoints exactly like
    DuckDB/Spark ``length`` on strings, and ``binary_length`` counts
    UTF-8 bytes like ``octet_length``.  Scale: a narrow map — batches
    stream through the worker, nothing shuffles, and the text column
    never leaves the batch it arrived in.
    """
    import pyarrow as pa

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def stats(batches):
        import pyarrow.compute as pc

        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            text = tbl.column("text")
            out = pa.table(
                {
                    "doc_id": tbl.column("doc_id"),
                    "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
                    "n_bytes": pc.cast(pc.binary_length(text), pa.int64()),
                }
            )
            yield from out.to_batches()

    return d.mapInArrow(stats, schema="doc_id long, n_chars long, n_bytes long")


@register(
    "udtf_table_argument_partitioned",
    oracle_sql="""
    WITH toks AS (
      SELECT source, doc_id, len(list_filter(
        string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9]', ' ', 'g')),
                           ' '), t -> t <> '')) AS n_toks
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS n_tokens,
           CAST(max(n_toks) AS BIGINT) AS max_doc_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc_id
    FROM toks GROUP BY source
    """,
    tags=("udf", "udtf", "table-argument", "spark4"),
)
def udtf_table_argument_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF with a TABLE argument, PARTITION BY source (Spark 4's
    polymorphic table function) — the top rung of the UDF ladder and
    the closest modern analog of the reference's Reducer+Getter
    protocol (src/job.h: the framework hands the user function one
    PARTITION's rows to iterate, user emits on terminate): Spark
    shuffles the table by the PARTITION BY key, streams each group's
    rows through ``eval``, and ``terminate`` emits the per-group
    summary.  Unlike ``applyInPandas`` the function is addressable from
    PURE SQL (``FROM summarize(TABLE(docs) PARTITION BY source)``) —
    the form a SQL-only consumer can call.

    Tokens are counted with the same simple whitespace-class rule in
    both engines (per-row Python here, list ops in the oracle).  Slow
    path by design, like every ladder rung below the built-ins — the
    production form is the plain groupBy; this op proves the
    table-argument CONTRACT (partition isolation, terminate-time
    emission, SQL addressability).

    Scale shape: one hash shuffle on the partition key (exactly a
    groupBy's movement), per-group state = 4 integers.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType=(
        "source: string, n_docs: bigint, n_tokens: bigint,"
        " max_doc_tokens: bigint, first_doc_id: bigint"
    ))
    class SummarizeDocs:
        def __init__(self):
            self._source = None
            self._n_docs = 0
            self._n_tokens = 0
            self._max_toks = 0
            self._first_doc = None

        def eval(self, row):  # noqa: ANN001
            text = row["text"] or ""
            word, n = [], 0
            for ch in text:
                if ch.isascii() and ch.isalnum():
                    word.append(ch)
                else:
                    if word:
                        n += 1
                        word = []
            if word:
                n += 1
            self._source = row["source"]
            self._n_docs += 1
            self._n_tokens += n
            self._max_toks = max(self._max_toks, n)
            did = row["doc_id"]
            self._first_doc = did if self._first_doc is None else min(self._first_doc, did)

        def terminate(self):
            if self._source is not None:
                yield (
                    self._source,
                    self._n_docs,
                    self._n_tokens,
                    self._max_toks,
                    self._first_doc,
                )

    spark.udtf.register("summarize_docs_udtf", SummarizeDocs)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents_tv"
    )
    return spark.sql(
        "SELECT * FROM summarize_docs_udtf("
        "TABLE(SELECT source, doc_id, text FROM documents_tv)"
        " PARTITION BY source)"
    )
