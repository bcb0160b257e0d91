"""Cross-engine-exact vector math shared by dedup and similarity.

The dot product is a sequential left fold in BOTH engines (Spark
``aggregate`` over ``zip_with`` vs DuckDB ``list_reduce`` with a
prepended 0.0), so float accumulation order — and therefore every
cosine — is bit-identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# DuckDB rendering; format with a=<list expr>, b=<list expr>.
SQL_DOT = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform(generate_series(1, len({a})), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
    "(acc, x) -> acc + x)"
)


def spark_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def np_dot():
    """Vectorized twin of :func:`spark_dot` (guide §4.2): an
    Arrow-batched pandas UDF whose result is BIT-IDENTICAL to the
    interpreted fold — the loop adds term i = a[i] * b[i] in exactly
    the fold's ascending order from an initial 0.0, and numpy
    elementwise multiply/add are strict IEEE doubles (no FMA, no
    reassociation), so every downstream round(cos, 6) and threshold
    compare agrees with both the JVM fold and the DuckDB
    ``list_reduce``.  For equal-length non-null vector columns only
    (all embedding fixtures); ``spark_dot`` stays the general form.

    Returns a fresh UDF object per call so callers in different
    operators don't share Catalyst expression state."""

    @F.pandas_udf("double")
    def dot(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.stack(a.to_numpy()).astype(np.float64, copy=False)
        mb = np.stack(b.to_numpy()).astype(np.float64, copy=False)
        acc = np.zeros(ma.shape[0])
        for i in range(ma.shape[1]):  # fold order: i ascending, acc + term
            acc = acc + ma[:, i] * mb[:, i]
        return pd.Series(acc)

    return dot
