"""Property-based differential test of the tokenizer against a pure-
Python reimplementation of the reference Map
(/root/reference/src/main.c:28-59) — hypothesis generates adversarial
inputs the fixtures don't contain (the randomized upgrade of the
reference's sequential-oracle discipline, SURVEY.md §5)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def reference_map(text: str) -> list[str]:
    """Faithful Python port of the reference tokenizer SEMANTICS (per
    SURVEY §2 row 5): ASCII isalnum runs, lowercased, capped at 255
    chars with the tail DROPPED (not emitted as a new token)."""
    out: list[str] = []
    word: list[str] = []
    for ch in text:
        if ch.isascii() and ch.isalnum():
            if len(word) < 255:
                word.append(ch.lower())
        else:
            if word:
                out.append("".join(word))
                word = []
    if word:
        out.append("".join(word))
    return out


# Printable-ish ASCII plus a few multibyte chars to probe the
# non-ASCII-as-delimiter rule.
_ALPHABET = st.characters(
    codec="utf-8", categories=("L", "N", "P", "S", "Z"), include_characters=" \t"
)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.text(_ALPHABET, max_size=600), min_size=1, max_size=40))
def test_tokenize_matches_reference_semantics(spark, texts):
    from pyspark.sql import functions as F

    from mapreduce_c_implementation_spark.functions.text import tokenize

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "text"])
    got = {
        r.i: r.toks
        for r in df.select("i", tokenize(F.col("text")).alias("toks")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == reference_map(t), f"mismatch on {t!r}"


@settings(deadline=None, max_examples=30, suppress_health_check=[HealthCheck.too_slow])
@given(
    tokens=st.lists(
        st.text(alphabet="abc012", min_size=1, max_size=5), max_size=8
    ),
    n=st.integers(min_value=1, max_value=4),
)
def test_ngram_helper_cross_engine_parity(tokens, n):
    """functions.text.ngrams (Spark) and duckdb_ngrams (oracle SQL) must
    produce identical n-gram lists for ANY token list and any n — the
    single-source-of-truth contract the corpus-hygiene oracles rely on."""
    import duckdb

    from mapreduce_c_implementation_spark.functions.text import duckdb_ngrams

    expected = [
        " ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)
    ] if len(tokens) >= n else []
    lits = ", ".join("'" + t + "'" for t in tokens)
    sql = duckdb_ngrams(f"[{lits}]", n) if tokens else duckdb_ngrams("CAST([] AS VARCHAR[])", n)
    got_sql = duckdb.sql(f"SELECT {sql} AS g").fetchone()[0]
    assert list(got_sql) == expected


def test_ngram_helper_spark_matches_python(spark):
    """Spark side of the ngram helper over a handful of pinned shapes."""
    from pyspark.sql import functions as F

    from mapreduce_c_implementation_spark.functions.text import ngrams

    rows = [(["a"],), (["a", "b"],), (["a", "b", "c", "d"],), ([],)]
    df = spark.createDataFrame(rows, "tokens: array<string>")
    for n in (1, 2, 3):
        got = [r[0] for r in df.select(ngrams(F.col("tokens"), n)).collect()]
        want = [
            [" ".join(t[i : i + n]) for i in range(len(t) - n + 1)]
            if len(t) >= n
            else []
            for (t,) in rows
        ]
        assert got == want, (n, got, want)
