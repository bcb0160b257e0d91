"""Deterministic file-source staging for the streaming operators.

Structured Streaming needs an unbounded source; for reproducible tests
the standard trick is a file source consumed one file per trigger
(``maxFilesPerTrigger=1``), so batch boundaries — and therefore
watermark advancement — are fully deterministic functions of how we
split ``events`` into files.

Batch plan (shared by the windowed streaming ops):
  batch0  on-time prefix: ts < SPLIT_TS and not held back
  batch1  tail:           ts >= SPLIT_TS (advances the watermark)
  batch2  LATE rows:      held-back old rows (event_id % 10 == 7,
          ts < SPLIT_TS) arriving two batches after their peers
  batch3  sentinel row at SENTINEL_TS (far future): pushes the
          watermark past every real window so append-mode sinks flush
          everything; the sentinel's own window never closes and is
          excluded from results downstream.

Late rows sit TWO batches after batch0 because Spark filters late
events with the watermark in effect during the PREVIOUS batch (the
late-events watermark lags the eviction watermark by one batch —
verified empirically on this Spark build): a late row in batch1 would
still see watermark 0.  With this plan, batch2's late filter uses
W1 = max(batch0.ts) - delay, which is exactly what the oracles encode.

The dedup variant is simpler: [all events, replay of event_id % 7 == 3,
sentinel] — replays are removed by dedup state (watermark still 0
during the replay batch, so nothing is dropped as late; every event
reaches the sink exactly once).

The staging dir is built once per sf_dir under /tmp and reused; files
are written in batch order with distinct mtimes so the file source
replays them in sequence.
"""

from __future__ import annotations

import os
import tempfile
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SPLIT_TS = "2024-01-20 00:00:00"
SENTINEL_TS = "2024-06-01 00:00:00"
SENTINEL_TYPE = "__sentinel__"
LATE_MOD = 10
LATE_REM = 7
DUP_MOD = 7
DUP_REM = 3
WATERMARK_DELAY = "10 minutes"
WATERMARK_DELAY_US = 10 * 60 * 1_000_000

_CACHE: dict[tuple[str, str], str] = {}

_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()),
        ("event_type", pa.string()),
        ("value", pa.float64()),
        ("props", pa.string()),
    ]
)


def _events_pdf(sf_dir: str) -> pd.DataFrame:
    pdf = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")  # fixture is µs-aligned
    return pdf[[f.name for f in _SCHEMA]]


def _write_batch(path: str, pdf: pd.DataFrame, order: int) -> None:
    pq.write_table(pa.Table.from_pandas(pdf, schema=_SCHEMA, preserve_index=False), path)
    # File sources order by modification time.  Set explicit mtimes a
    # full 2 seconds apart so the ordering survives filesystems with
    # whole-second mtime granularity (sleep-based spacing would not).
    mtime = time.time() + 2.0 * order
    os.utime(path, (mtime, mtime))


def stage_events(sf_dir: str, with_dup_replay: bool = False) -> str:
    """Materialize the batch plan; returns the staging directory.

    with_dup_replay=True additionally appends a batch that REPLAYS rows
    (event_id % 7 == 3) verbatim — duplicate arrivals for the streaming
    dedup operator.
    """
    key = (sf_dir, "dup" if with_dup_replay else "plain")
    if key in _CACHE and os.path.isdir(_CACHE[key]):
        return _CACHE[key]

    pdf = _events_pdf(sf_dir)
    split = pd.Timestamp(SPLIT_TS)
    is_old = pdf["ts"] < split
    held_back = is_old & ((pdf["event_id"] % LATE_MOD) == LATE_REM)

    sentinel = pd.DataFrame(
        {
            "event_id": [-1],
            "ts": [pd.Timestamp(SENTINEL_TS)],
            "user_id": [-1],
            "event_type": [SENTINEL_TYPE],
            "value": [0.0],
            "props": ["{}"],
        }
    )

    d = tempfile.mkdtemp(prefix="stream_events_")
    if with_dup_replay:
        _write_batch(f"{d}/batch_00.parquet", pdf, 0)
        _write_batch(
            f"{d}/batch_01_replay.parquet",
            pdf[(pdf["event_id"] % DUP_MOD) == DUP_REM],
            1,
        )
        _write_batch(f"{d}/batch_99_sentinel.parquet", sentinel, 2)
    else:
        _write_batch(f"{d}/batch_00.parquet", pdf[is_old & ~held_back], 0)
        _write_batch(f"{d}/batch_01.parquet", pdf[~is_old], 1)
        _write_batch(f"{d}/batch_02_late.parquet", pdf[held_back], 2)
        _write_batch(f"{d}/batch_99_sentinel.parquet", sentinel, 3)
    _CACHE[key] = d
    return d


_DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
    ]
)

DOC_REPLAY_MOD = 5
DOC_REPLAY_REM = 2


def stage_documents(sf_dir: str) -> str:
    """Batch plan for the streaming corpus-ingest operator: documents
    arrive in three doc_id-sliced batches, and batch1 additionally
    REPLAYS a deterministic subset of batch0 verbatim (crawl re-fetches
    — the duplicate arrivals streaming dedup must drop).  Batch
    boundaries are deterministic, so first-arrival semantics are too.
    """
    key = (sf_dir, "docs")
    if key in _CACHE and os.path.isdir(_CACHE[key]):
        return _CACHE[key]

    pdf = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    pdf = pdf[[f.name for f in _DOC_SCHEMA]]
    b0 = pdf[pdf["doc_id"] % 3 == 0]
    b1 = pdf[pdf["doc_id"] % 3 == 1]
    b2 = pdf[pdf["doc_id"] % 3 == 2]
    replay = b0[(b0["doc_id"] % DOC_REPLAY_MOD) == DOC_REPLAY_REM]

    d = tempfile.mkdtemp(prefix="stream_docs_")

    def _w(path: str, frame: pd.DataFrame, order: int) -> None:
        pq.write_table(
            pa.Table.from_pandas(frame, schema=_DOC_SCHEMA, preserve_index=False),
            path,
        )
        mtime = time.time() - 1000 + order * 2
        os.utime(path, (mtime, mtime))

    _w(f"{d}/batch_00.parquet", b0, 0)
    _w(f"{d}/batch_01.parquet", pd.concat([b1, replay]), 1)
    _w(f"{d}/batch_02.parquet", b2, 2)
    _CACHE[key] = d
    return d


RTBF_SOURCE = "__rtbf__"


def stage_documents_rtbf(sf_dir: str, delete_mod: int, delete_rem: int) -> str:
    """``stage_documents``' batch plan with an RTBF CONTROL batch
    interposed between arrival batches 1 and 2: a file of delete
    requests — one row per doc_id with doc_id % delete_mod ==
    delete_rem (base docs and arrivals alike), marked by
    ``source == RTBF_SOURCE`` with no text.  The streaming op routes
    these rows to its delete-propagation path instead of the screen;
    batch boundaries stay deterministic, so the exact cumulative
    oracle extends with the delete epoch."""
    key = (sf_dir, f"docs_rtbf_{delete_mod}_{delete_rem}")
    if key in _CACHE and os.path.isdir(_CACHE[key]):
        return _CACHE[key]

    pdf = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    pdf = pdf[[f.name for f in _DOC_SCHEMA]]
    b0 = pdf[pdf["doc_id"] % 3 == 0]
    b1 = pdf[pdf["doc_id"] % 3 == 1]
    b2 = pdf[pdf["doc_id"] % 3 == 2]
    replay = b0[(b0["doc_id"] % DOC_REPLAY_MOD) == DOC_REPLAY_REM]
    del_ids = pdf.loc[
        (pdf["doc_id"] % delete_mod) == delete_rem, "doc_id"
    ].sort_values()
    ctrl = pd.DataFrame(
        {
            "doc_id": del_ids,
            "text": None,
            "lang": "xx",
            "source": RTBF_SOURCE,
            "n_chars": 0,
        }
    )

    d = tempfile.mkdtemp(prefix="stream_docs_rtbf_")

    def _w(path: str, frame: pd.DataFrame, order: int) -> None:
        pq.write_table(
            pa.Table.from_pandas(frame, schema=_DOC_SCHEMA, preserve_index=False),
            path,
        )
        mtime = time.time() - 1000 + order * 2
        os.utime(path, (mtime, mtime))

    _w(f"{d}/batch_00.parquet", b0, 0)
    _w(f"{d}/batch_01.parquet", pd.concat([b1, replay]), 1)
    _w(f"{d}/batch_02_rtbf.parquet", ctrl, 2)
    _w(f"{d}/batch_03.parquet", b2, 3)
    _CACHE[key] = d
    return d
