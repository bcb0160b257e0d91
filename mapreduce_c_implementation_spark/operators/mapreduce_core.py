"""The reference's own operator surface, Spark-first (SURVEY.md §2.1).

The reference pipeline — chunked scan → Map (flatMap) → map-side combine →
hash shuffle → per-partition sort → Reduce — is expressed here as
DataFrame plans; Catalyst inserts the partial aggregate (the combiner,
src/buffer.c:107-116) and the shuffle exchange (src/buffer.c:88-176)
automatically.  Scale note: every query below is scan → narrow map →
single hash-agg shuffle on the group key; at 100 TB the only wide op is
that one exchange, pre-shrunk by partial aggregation exactly like the
reference's 83%-shuffle-cut combiner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_c_implementation_spark.functions.text import DUCKDB_TOKENIZE, tokenize
from mapreduce_c_implementation_spark.registry import register
from mapreduce_c_implementation_spark.sources import load_table
from mapreduce_c_implementation_spark.sources.tables import parallel_scan

_TOK = DUCKDB_TOKENIZE.format(col="text")


def tokens_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Map stage of the flagship app: documents -> (doc_id, word) pairs.

    Mirrors Map at /root/reference/src/main.c:28-59 with ``documents.text``
    standing in for file chunks and ``doc_id`` for ``MR_CurrentFile()``.
    """
    docs = parallel_scan(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("word")
    )


@register(
    "tokenize_flatmap",
    oracle_sql=f"""
    SELECT doc_id, unnest({_TOK}) AS word
    FROM documents
    """,
    tags=("reference", "map"),
)
def tokenize_flatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map/flatMap alone (SURVEY §2 #4-5): one doc row -> 0..n (doc_id, word).

    Reference: mapper worker src/mapper.c:75-95 driving Map src/main.c:28-59.
    """
    return tokens_df(spark, sf_dir)


@register(
    "word_count",
    oracle_sql=f"""
    SELECT word, count(*) AS cnt
    FROM (SELECT unnest({_TOK}) AS word FROM documents)
    GROUP BY word
    """,
    tags=("reference", "aggregate"),
)
def word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documented word-count app (SURVEY §2 #16; src/mapreduce.h:110-119).

    groupBy().count() == Map emit("word","1") + combiner partial-sum +
    Reduce sum; Catalyst's partial/final HashAggregate IS the combiner.
    """
    return tokens_df(spark, sf_dir).groupBy("word").agg(F.count("*").alias("cnt"))


@register(
    "inverted_index",
    oracle_sql=f"""
    SELECT word,
           array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS postings,
           count(DISTINCT doc_id) AS doc_count
    FROM (SELECT doc_id, unnest({_TOK}) AS word FROM documents)
    GROUP BY word
    """,
    tags=("reference", "flagship"),
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship app: inverted index word -> sorted distinct posting list.

    Reference: Map src/main.c:28-59, dedup combiner src/main.c:62-81,
    Reduce (drain + sort + unique + format) src/main.c:90-140, validated
    against SimpleInvertedIndex/inverted_index.c.  ``collect_set`` dedups
    map-side in the partial aggregate — the combiner's 83% shuffle cut for
    free — and ``sort_array`` restores the determinism the reference gets
    by sorting values in Reduce (value arrival order is nondeterministic
    in both engines).  Postings rendered as a CSV string so the oracle
    hash is array-encoding-independent.

    Plan note: doc_count is ``size(collect_set)`` — NOT a separate
    ``count_distinct``, which would force Spark's two-phase distinct
    aggregation and a second shuffle (asserted single-shuffle in
    tests/test_plans.py).
    """
    return (
        tokens_df(spark, sf_dir)
        .groupBy("word")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("docs"))
        .select(
            "word",
            F.array_join("docs", ",").alias("postings"),
            F.size("docs").cast("long").alias("doc_count"),
        )
    )


@register(
    "inverted_index_formatted",
    oracle_sql=f"""
    SELECT word || ' -> [' ||
           array_to_string(list_sort(list(DISTINCT doc_id)), ', ') || ']' AS line
    FROM (SELECT doc_id, unnest({_TOK}) AS word FROM documents)
    GROUP BY word
    """,
    tags=("reference", "flagship", "sink"),
)
def inverted_index_formatted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-format parity with the reference text sink: ``word -> [a, b]``.

    Reference Reduce output format src/main.c:133-137 (and the oracle's
    identical format SimpleInvertedIndex/inverted_index.c:165-171).  The
    sink itself is ``df.write.text`` — one file per partition, the same
    part-%05d naming scheme as src/main.c:92-98.
    """
    return (
        tokens_df(spark, sf_dir)
        .groupBy("word")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("docs"))
        .select(
            F.concat(
                F.col("word"),
                F.lit(" -> ["),
                F.array_join(F.col("docs"), ", "),
                F.lit("]"),
            ).alias("line")
        )
    )


@register(
    "distinct_pairs",
    oracle_sql=f"""
    SELECT DISTINCT doc_id, word
    FROM (SELECT doc_id, unnest({_TOK}) AS word FROM documents)
    """,
    tags=("reference", "distinct"),
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key dedup as a standalone operator (SURVEY §2 #8).

    Reference: DedupCombiner src/main.c:62-81 removes duplicate
    (word, file) pairs; ``dropDuplicates`` is the whole-dataset form and
    compiles to the same partial/final aggregate shape.
    """
    return tokens_df(spark, sf_dir).dropDuplicates(["doc_id", "word"])


@register(
    "word_count_topk",
    oracle_sql=f"""
    SELECT word, cnt FROM (
      SELECT word, count(*) AS cnt
      FROM (SELECT unnest({_TOK}) AS word FROM documents)
      GROUP BY word
    )
    ORDER BY cnt DESC, word ASC
    LIMIT 100
    """,
    tags=("reference", "sort", "limit"),
)
def word_count_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global order-by + limit (SURVEY §2.2 sorts/limits; metrics top-10
    tables src/metrics.c:365-421 are the reference's only top-k).

    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject — per-
    partition top-k then a driver merge of k*partitions rows, never a
    global sort; this is the 100 TB-safe formulation.
    """
    wc = word_count(spark, sf_dir)
    return wc.orderBy(F.desc("cnt"), F.asc("word")).limit(100)


@register(
    "sorted_word_count",
    oracle_sql=f"""
    SELECT word, count(*) AS cnt
    FROM (SELECT unnest({_TOK}) AS word FROM documents)
    GROUP BY word
    ORDER BY word
    """,
    tags=("reference", "sort"),
)
def sorted_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-key reduce contract (SURVEY §2 #11-12): keys in byte order.

    Reference: per-partition qsort by strcmp src/sorting.c:67-146 + the
    documented sorted-iteration guarantee src/mapreduce.h:105.  Spark UTF-8
    binary ordering == strcmp byte order.  Globally ordered via a range-
    partitioned exchange (RangePartitioning) — the distributed upgrade of
    the reference's per-partition sort.
    """
    return word_count(spark, sf_dir).orderBy("word")


@register(
    "input_lineage",
    oracle_sql="""
    SELECT lang AS source_tag, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang
    """,
    tags=("reference", "lineage"),
)
def input_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provenance-aware aggregation (SURVEY §2 #17, MR_CurrentFile).

    Reference: thread-local current-file lineage src/mapreduce.c:56-58.
    Spark's ``input_file_name()`` is the literal analog but is path-
    dependent (not oracle-comparable), so the checked query aggregates by
    the ``lang`` provenance column; see tests for input_file_name itself.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.col("lang").alias("source_tag")).agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )
