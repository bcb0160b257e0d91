"""Differential-oracle harness: run a registered operator's Spark query and
its DuckDB oracle SQL on the same parquet fixtures, compare order-
insensitively — the in-repo mirror of the driver's CORRECTNESS gate and
the Spark-era version of the reference's sequential-oracle diff
(/root/reference/SimpleInvertedIndex/inverted_index.c:1).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from mapreduce_c_implementation_spark.registry import get_operator
from mapreduce_c_implementation_spark.sources import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<NULL>"
    if isinstance(v, float):
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        # 12 significant digits absorbs summation-order jitter
        return f"{v:.12g}"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "item") and type(v).__module__ == "numpy":  # numpy scalar
        return _canon_cell(v.item())
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def assert_matches_oracle(spark, name: str, sf_dir: str) -> None:
    op = get_operator(name)
    assert op.oracle_sql is not None, f"{name} has no oracle SQL"
    spark_pdf = op.query_fn(spark, sf_dir).toPandas()
    oracle_pdf = run_oracle(op.oracle_sql, sf_dir)

    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    # Dtype-KIND parity: canonical_rows forgives int64-vs-float64
    # ("19525" == "19525.0" after %.12g), but the driver's hash does
    # not — that exact divergence was round 1's only CORRECTNESS
    # failure (DuckDB HUGEINT sums materializing as float64).  Guard
    # the kind here so a bare integer sum() in an oracle fails loudly
    # in-repo instead of silently red at the driver.
    kind = lambda d: {"u": "i"}.get(d.kind, d.kind)  # noqa: E731
    for col in spark_pdf.columns:
        ks, ko = kind(spark_pdf[col].dtype), kind(oracle_pdf[col].dtype)
        assert ks == ko, (
            f"{name}.{col}: dtype kind mismatch spark={spark_pdf[col].dtype} "
            f"oracle={oracle_pdf[col].dtype} — driver hash would diverge; "
            f"CAST the oracle column (usually sum(int) -> HUGEINT -> float64)"
        )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    s_rows = canonical_rows(spark_pdf)
    o_rows = canonical_rows(oracle_pdf)
    if s_rows != o_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, o_rows) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
