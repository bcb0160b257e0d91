"""Reference-surface behavior tests (oracle diffs for all registered
operators live in test_operators_vs_oracle.py)."""

from __future__ import annotations

CORE_OPS = [
    "tokenize_flatmap",
    "word_count",
    "inverted_index",
    "inverted_index_formatted",
    "distinct_pairs",
    "word_count_topk",
    "sorted_word_count",
    "input_lineage",
]


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert set(df.columns) == {"word", "postings", "doc_count"}


def test_contract_shapes():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= len(CORE_OPS)


def test_tokenizer_truncates_at_255(spark):
    from pyspark.sql import functions as F

    from mapreduce_c_implementation_spark.functions.text import tokenize

    long_tok = "a" * 300
    df = spark.createDataFrame([(f"x {long_tok} Y,b2",)], ["text"])
    toks = df.select(F.explode(tokenize(F.col("text"))).alias("w")).collect()
    words = [r.w for r in toks]
    assert words == ["x", "a" * 255, "y", "b2"]


def test_tokenizer_edge_cases(spark):
    """FIXTURES.md §1 edge cases, pinned on constructed rows: mixed case,
    digit-adjacent splits, multi-delimiter runs, empty text, whitespace-
    only, non-ASCII treated as delimiters."""
    from pyspark.sql import functions as F

    from mapreduce_c_implementation_spark.functions.text import tokenize

    rows = [
        ("Foo,BAR a1b2", ["foo", "bar", "a1b2"]),
        ("--__!!", []),
        ("", []),
        ("   ", []),
        ("héllo wörld", ["h", "llo", "w", "rld"]),  # non-ASCII = delimiter
        ("a..b", ["a", "b"]),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], ["text"])
    got = [
        r.toks
        for r in df.select(tokenize(F.col("text")).alias("toks")).collect()
    ]
    assert got == [exp for _, exp in rows]


def test_sort_within_partitions_contract(spark, sf_correct):
    """SURVEY §2 rows 11-12: the reference guarantees reducers see keys
    sorted WITHIN each partition (src/sorting.c + src/reduce.c:69).
    Spark analog: repartition(key) + sortWithinPartitions — verify every
    partition's key sequence is monotonically non-decreasing."""
    from pyspark.sql import functions as F

    from mapreduce_c_implementation_spark.registry import get_operator

    wc = get_operator("word_count").query_fn(spark, sf_correct)
    parted = wc.repartition(8, "word").sortWithinPartitions("word")

    def check(it):
        import pandas as pd

        for pdf in it:
            ok = bool((pdf["word"].astype(str) == pdf["word"].astype(str).sort_values(
                ignore_index=True)).all()) if len(pdf) else True
            yield pd.DataFrame({"sorted_ok": [ok], "n": [len(pdf)]})

    res = parted.select("word").mapInPandas(check, "sorted_ok boolean, n long").collect()
    assert all(r.sorted_ok for r in res)
    assert sum(r.n for r in res) == wc.count()
