"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``mapreduce_c_implementation_spark``: the operator registry
supplies ``queries()`` / ``oracle_sql()`` pairs; ``entry`` runs the
flagship inverted-index query (the reference's flagship app,
/root/reference/src/main.c) at sf0.001.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mapreduce_c_implementation_spark import oracle_map, query_map
from mapreduce_c_implementation_spark.registry import get_operator
from mapreduce_c_implementation_spark.session import ensure_runtime_conf

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    ensure_runtime_conf(spark)
    return get_operator("inverted_index").query_fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    qm = query_map()

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_runtime_conf(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in qm.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return oracle_map()
