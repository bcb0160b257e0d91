"""A Spark 4 Python DataSource replicating the reference's reader
subsystem — the one part of the C engine that is genuinely a SOURCE
implementation rather than a query:

- chunk planner: each input file is stat()ed and sliced into fixed-size
  byte ranges (/root/reference/src/mapreduce.c:98-134, CHUNK_SIZE at
  src/reader_queue.h:59) -> ``ChunkedTextReader.partitions()`` emits one
  ``InputPartition`` per byte range, so Spark schedules exactly the
  reference's chunk manifest.
- boundary-safe reads: a reader must never split a word across chunks —
  skip the partial word at the start (it belongs to the previous chunk:
  src/reader_queue.c:208-231) and extend past the end to the next
  delimiter (src/reader_queue.c:263-306).  ``read()`` reproduces both
  rules byte-for-byte ("word" = ASCII-alnum run, the reference's
  isalnum in the C locale).

Correctness is proven differentially the same way the reference proves
its reader (SimpleInvertedIndex oracle): word counts through this source
must equal word counts over the original documents — any boundary bug
splits or duplicates a boundary word and fails the count diff.  The
fixture operator deliberately uses a SMALL chunk size so hundreds of
boundaries are exercised.

Scale: partitions() is pure metadata (os.path.getsize, no reads);
chunks read independently with no shared state, so the source scales
like any file source.  The API also exposes ``pushFilters`` for
predicate pushdown into Python sources; this reader keeps full scans
(its query pushes nothing filterable).
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

DEFAULT_CHUNK_SIZE = 256 * 1024  # the reference's CHUNK_SIZE


def _is_word_byte(b: int) -> bool:
    """ASCII isalnum — the reference's C-locale word definition.
    Multi-byte UTF-8 continuation bytes are >= 0x80, never word bytes,
    so a chunk boundary can never cut a word even in non-ASCII text."""
    return (
        0x30 <= b <= 0x39 or 0x41 <= b <= 0x5A or 0x61 <= b <= 0x7A
    )


class ChunkPartition(InputPartition):
    def __init__(self, path: str, idx: int, offset: int, size: int):
        self.path = path
        self.idx = idx
        self.offset = offset
        self.size = size


class ChunkedTextReader(DataSourceReader):
    def __init__(self, options: dict):
        self.dir = options["path"]
        self.chunk_size = int(options.get("chunk_size", DEFAULT_CHUNK_SIZE))

    def partitions(self) -> Sequence[InputPartition]:
        parts: list[InputPartition] = []
        for name in sorted(os.listdir(self.dir)):
            if not name.endswith(".txt"):
                continue
            path = os.path.join(self.dir, name)
            size = os.path.getsize(path)
            n_chunks = max(1, -(-size // self.chunk_size))  # ceil
            for i in range(n_chunks):
                parts.append(
                    ChunkPartition(path, i, i * self.chunk_size, self.chunk_size)
                )
        return parts

    def read(self, partition: ChunkPartition) -> Iterator[tuple]:
        with open(partition.path, "rb") as f:
            start = partition.offset
            prev_is_word = False
            if start > 0:
                f.seek(start - 1)
                prev_is_word = _is_word_byte(f.read(1)[0])
            else:
                f.seek(0)
            data = f.read(partition.size)
            if not data:
                return
            # Rule 1 (src/reader_queue.c:208-231): if the byte before
            # this chunk is mid-word, the chunk's leading word bytes
            # belong to the PREVIOUS chunk — skip them.
            lo = 0
            if prev_is_word:
                while lo < len(data) and _is_word_byte(data[lo]):
                    lo += 1
            # Rule 2 (src/reader_queue.c:263-306): if the chunk ends
            # mid-word, extend byte-by-byte to the next delimiter so
            # THIS chunk owns the whole word.  EXCEPT when rule 1
            # swallowed the entire chunk (a word spanning >2 chunks):
            # the trailing bytes are the same skipped word, owned by
            # the chunk where it started — extending here would re-emit
            # a partial copy of it (caught by the chunking property
            # test, tests/test_chunked_source.py).
            tail = bytearray()
            if lo < len(data) and _is_word_byte(data[-1]):
                while True:
                    nxt = f.read(1)
                    if not nxt or not _is_word_byte(nxt[0]):
                        break
                    tail += nxt
            fragment = (data[lo:] + bytes(tail)).decode("utf-8", errors="replace")
            yield (os.path.basename(partition.path), partition.idx, fragment)


class ChunkedTextDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "chunked_text"

    def schema(self) -> str:
        return "file string, chunk_idx int, fragment string"

    def reader(self, schema) -> ChunkedTextReader:
        return ChunkedTextReader(self.options)


def register_chunked_source(spark) -> None:
    """Idempotent per-session registration."""
    try:
        spark.dataSource.register(ChunkedTextDataSource)
    except Exception:
        pass  # already registered in this session
