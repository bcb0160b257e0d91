"""Cross-engine-exact numeric aggregation helpers.

Problem: ``sum(double)`` is summation-order-dependent, and the driver's
correctness gate hashes values computed independently by Spark and
DuckDB.  Solution: sum in fixed-point.  Each term is cast to
``decimal(18,6)`` (exactly representable, both engines round the same
IEEE double the same way), products/sums stay exact decimal, and the
final result is rounded to scale 6 BEFORE the cast back to double —
empirically the decimal->double cast diverges by 1 ulp between engines
at scale 12 but is exact at scale 6.

Scale note: decimal aggregation is Tungsten-native (sum over decimal is
codegen'd, no UDFs); at 100 TB this costs a constant factor over double
sums and keeps results reproducible run-to-run — worth it for an engine
whose correctness contract is differential.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC_IN = "decimal(18,6)"  # per-term fixed point
DEC_OUT = "decimal(30,6)"  # pre-double rounding of aggregates


def dec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC_IN)


def exact_sum(col: Column | str) -> Column:
    """Order-independent sum of a double column, returned as double."""
    return F.sum(dec(col)).cast(DEC_OUT).cast("double")


def exact_avg(col: Column | str) -> Column:
    """avg = exact decimal sum (as double) / count — identical both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return exact_sum(c) / F.count(c)


# ---- DuckDB oracle-side SQL renderings of the same expressions ----

def sql_dec(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(18,6))"


def sql_exact_sum(expr: str) -> str:
    return f"CAST(CAST(sum({sql_dec(expr)}) AS DECIMAL(30,6)) AS DOUBLE)"


def sql_exact_avg(expr: str) -> str:
    return f"({sql_exact_sum(expr)} / count({expr}))"
