"""Unit + property tests for the custom Python DataSource's boundary
rules (sources/chunked_source.py) — the reference's trickiest reader
code (src/reader_queue.c:208-306), tested the way the reference never
did: exhaustively, without Spark, on crafted and random corpora.

Invariant: concatenating every chunk's fragment tokens (ASCII-alnum
runs) in chunk order reproduces the file's token sequence exactly —
no split words, no duplicated words, no lost words — for ANY chunk
size, including sizes that land mid-word."""

from __future__ import annotations

import os
import re
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from mapreduce_c_implementation_spark.sources.chunked_source import (
    ChunkedTextReader,
    ChunkPartition,
)

TOKEN_RE = re.compile(r"[A-Za-z0-9]+")


def _read_all(text: str, chunk_size: int) -> list[str]:
    d = tempfile.mkdtemp(prefix="chunksrc_")
    path = os.path.join(d, "input.txt")
    with open(path, "wb") as f:
        f.write(text.encode("utf-8"))
    reader = ChunkedTextReader({"path": d, "chunk_size": str(chunk_size)})
    parts = reader.partitions()
    frags: list[tuple[int, str]] = []
    for p in parts:
        assert isinstance(p, ChunkPartition)
        for _, idx, fragment in reader.read(p):
            frags.append((idx, fragment))
    frags.sort()
    return [t for _, frag in frags for t in TOKEN_RE.findall(frag)]


def test_word_straddles_every_boundary():
    # 'abcdef' repeated with single-space separators; chunk size 4 cuts
    # inside nearly every word.
    text = " ".join(["abcdef"] * 50)
    assert _read_all(text, 4) == TOKEN_RE.findall(text)


def test_chunk_exactly_at_word_edges():
    # 3-byte words + 1-byte delimiter = period 4; chunk size 4 places
    # every boundary exactly on a delimiter (rule 1 and 2 both no-op).
    text = "abc def ghi jkl mno"
    assert _read_all(text, 4) == TOKEN_RE.findall(text)


def test_single_word_larger_than_chunk():
    # One 100-byte word with 8-byte chunks: chunk 0 must extend to own
    # the whole word; chunks 1.. must skip it entirely.
    text = "x" * 100 + " tail"
    assert _read_all(text, 8) == ["x" * 100, "tail"]


def test_empty_and_delimiter_only_chunks():
    text = "a" + " " * 50 + "b"
    assert _read_all(text, 7) == ["a", "b"]


@settings(max_examples=60, deadline=None)
@given(
    text=st.text(
        alphabet=st.sampled_from("ab1 .\n\t-é"), min_size=0, max_size=400
    ),
    chunk_size=st.integers(min_value=1, max_value=64),
)
def test_token_stream_invariant_under_any_chunking(text, chunk_size):
    """Random text (including a non-ASCII char as delimiter) chunked at
    any size yields exactly the file's token stream."""
    assert _read_all(text, chunk_size) == TOKEN_RE.findall(text)
