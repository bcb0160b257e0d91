"""Column-expression helpers shared by the text operators.

Tokenizer parity with the reference Map (/root/reference/src/main.c:28-59):
C ``isalnum``/``tolower`` in the C locale are ASCII-only, and tokens are
capped at 255 bytes (a longer alnum run keeps its first 255 chars; the
tail is dropped, NOT emitted as a second token).  We therefore:

1. split on the ASCII class ``[^a-zA-Z0-9]+`` (never ``\\W``/``\\p{Alnum}``,
   which are Unicode-aware);
2. lowercase AFTER splitting — the surviving tokens are pure ASCII, where
   Spark/DuckDB Unicode ``lower`` coincides exactly with C ``tolower``;
3. truncate to 255 chars (== bytes for ASCII-only tokens).

All pure JVM column expressions — no Python UDFs — so the whole map stage
stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_DELIM_REGEX = "[^a-zA-Z0-9]+"
MAX_TOKEN_CHARS = 255  # reference: char word[256] (src/main.c:38,42-44)


def tokenize(text: Column) -> Column:
    """text -> array<string> of lowercased ASCII-alnum tokens (no empties).

    Implemented as ``regexp_extract_all`` with a POSITIVE class — not
    ``split`` on the negated class: semantically identical (alnum runs ==
    complement-split tokens minus empties), but measured ~20x faster on a
    668 MB corpus (87s -> 4.3s per scan; Pattern.split on long lines is
    pathologically slow), and it needs no empty-token filter.

    The 255-char truncation is folded INTO the pattern: the capture
    group keeps the first 255 chars of a run and ``[A-Za-z0-9]*``
    swallows the tail (reference semantics: tail dropped, never emitted
    as a second token).  That leaves only a plain per-token ``lower`` in
    the array lambda — the fused lower∘substring lambda it replaces
    evaluated interpreted per element and measured ~1.6x slower
    steady-state (4x cold) on the flagship corpus.  Extraction runs on
    the RAW text so Unicode lowercasing can never manufacture ASCII
    tokens (e.g. İ -> i̇) that C tokenization would not produce.

    Equivalent DuckDB expression (oracle side):
        list_transform(
          list_filter(string_split_regex(text, '[^a-zA-Z0-9]+'), t -> t <> ''),
          t -> lower(substr(t, 1, 255)))
    """
    raw = F.regexp_extract_all(
        text,
        F.lit(f"([A-Za-z0-9]{{1,{MAX_TOKEN_CHARS}}})[A-Za-z0-9]*"),
        F.lit(1),
    )
    return F.transform(raw, F.lower)


def tokenize_pairs_arrow(batches):
    """Arrow-native twin of ``tokenize`` for the flagship job's map+combine
    stage: an iterator-of-record-batches function (``mapInArrow``) that
    turns (line, fname) batches into DISTINCT (word, fname) pairs per
    task (guide §4.2 — hand whole batches to vectorized native kernels
    instead of row-at-a-time JVM expressions; §2.3 — combine before the
    exchange).

    Semantics are tokenize()'s exactly, kernel by kernel:

    - ``split_pattern_regex('[^a-zA-Z0-9]+')`` on the RAW text == the
      ASCII-class split (RE2 on UTF-8: any non-ASCII-alnum codepoint,
      multibyte included, is a delimiter — same as Java's pattern);
    - empty strings from leading/trailing delimiters are filtered (the
      positive-class extraction never produced them);
    - ``utf8_slice_codeunits(0, 255)`` keeps a long run's first 255
      chars and DROPS the tail (reference src/main.c:38-44 semantics:
      never a second token);
    - ``ascii_lower`` after splitting — surviving tokens are pure ASCII
      by construction, where ascii/Unicode/C lower coincide.

    Verified equivalent to the JVM form on adversarial inputs (>255-char
    runs, İ/ı, combining marks, delimiter-only and empty lines) and on
    the staged corpus; see tests/test_job_api.py.

    The per-batch + end-of-task ``group_by().aggregate([])`` (distinct)
    is the map-side combiner: state is bounded by |vocab| x |files per
    task|, and only distinct pairs cross back into the JVM and the
    word-keyed exchange — the reference's combiner shuffle cut
    (src/main.c:62-81), done in Arrow.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    acc = []
    for b in batches:
        lists = pc.split_pattern_regex(
            b.column("line"), pattern=TOKEN_DELIM_REGEX
        )
        words = pc.list_flatten(lists)
        parents = pc.list_parent_indices(lists)
        mask = pc.not_equal(words, "")
        words = pc.filter(words, mask)
        parents = pc.filter(parents, mask)
        words = pc.ascii_lower(
            pc.utf8_slice_codeunits(words, 0, MAX_TOKEN_CHARS)
        )
        fn = pc.take(b.column("fname"), parents)
        acc.append(
            pa.table({"word": words, "fname": fn})
            .group_by(["word", "fname"])
            .aggregate([])
        )
    if acc:
        out = pa.concat_tables(acc).group_by(["word", "fname"]).aggregate([])
        yield from out.to_batches(max_chunksize=1 << 16)


# The DuckDB-side rendering of ``tokenize`` over a column named {col}.
DUCKDB_TOKENIZE = (
    "list_transform("
    "list_filter(string_split_regex({col}, '[^a-zA-Z0-9]+'), t -> t <> ''), "
    "t -> lower(substr(t, 1, 255)))"
)


def ngrams(tokens: Column, n: int) -> Column:
    """array<string> of space-joined word n-grams over a token array;
    empty array when the document has fewer than ``n`` tokens.  The
    single source of truth for n-gram construction — the DuckDB mirror
    is ``duckdb_ngrams`` and both are parameterized by the same ``n``,
    so the Spark and oracle sides cannot drift."""
    return (
        F.when(
            F.size(tokens) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(tokens, i + j) for j in range(n)]
                ),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
    )


def duckdb_ngrams(tokens_sql: str, n: int) -> str:
    """DuckDB rendering of :func:`ngrams` over a list expression.

    ``tokens_sql`` is inlined at each use site (pass a CTE column name,
    not a heavy expression) — a correlated scalar subquery would let us
    bind it once, but DuckDB's binder rejects self-shadowing aliases
    there, and every caller passes a plain column anyway."""
    joined = " || ' ' || ".join(
        f"{tokens_sql}[i + {j}]" if j else f"{tokens_sql}[i]" for j in range(n)
    )
    return (
        f"CASE WHEN len({tokens_sql}) >= {n} THEN "
        f"list_transform(generate_series(1, len({tokens_sql}) - {n - 1}), "
        f"i -> {joined}) "
        f"ELSE [] END"
    )
