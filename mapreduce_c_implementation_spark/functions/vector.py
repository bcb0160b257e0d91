"""Cross-engine-exact vector math shared by dedup and similarity.

The dot product is a sequential left fold in BOTH engines (Spark
``aggregate`` over ``zip_with`` vs DuckDB ``list_reduce`` with a
prepended 0.0), so float accumulation order — and therefore every
cosine — is bit-identical.
"""

from __future__ import annotations

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
