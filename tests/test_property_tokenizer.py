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
