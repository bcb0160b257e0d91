"""Operator registry: the driver-facing catalog of everything we implement.

The reference's "query surface" is a compiled-in triple of C callbacks
(Map/Combine/Reduce — /root/reference/src/job.h:36-127).  Our analog is a
declarative registry: each operator is a named pair of

    query_fn(spark, sf_dir) -> DataFrame      (the PySpark implementation)
    oracle_sql: str | None                    (DuckDB-equivalent ANSI SQL)

wired verbatim into ``__spark_entry__.py``'s ``queries()`` /
``oracle_sql()`` driver contract.  Operators whose semantics SQL cannot
express (streaming state, iterative algos) register oracle_sql=None and
get the driver's rows-only check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "Operator"] = {}

# Modules whose import registers operators.  Extended as phases land.
_OPERATOR_MODULES = [
    "mapreduce_c_implementation_spark.operators.mapreduce_core",
    "mapreduce_c_implementation_spark.operators.aggregates",
    "mapreduce_c_implementation_spark.operators.joins",
    "mapreduce_c_implementation_spark.operators.windows",
    "mapreduce_c_implementation_spark.operators.setops",
    "mapreduce_c_implementation_spark.operators.scalars",
    "mapreduce_c_implementation_spark.operators.udfs",
    "mapreduce_c_implementation_spark.operators.analytics",
    "mapreduce_c_implementation_spark.operators.dedup",
    "mapreduce_c_implementation_spark.operators.similarity",
    "mapreduce_c_implementation_spark.operators.textanalysis",
    "mapreduce_c_implementation_spark.operators.multimodal",
    "mapreduce_c_implementation_spark.streaming.queries",
    "mapreduce_c_implementation_spark.sources.io_ops",
]


@dataclass(frozen=True)
class Operator:
    name: str
    query_fn: QueryFn
    oracle_sql: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def register(
    name: str, oracle_sql: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as operator ``name``.

    ``oracle_sql`` must alias every computed column to the SAME name the
    DataFrame uses — the driver's compare sorts columns by name before
    hashing values.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate operator name: {name}")
        _REGISTRY[name] = Operator(
            name=name, query_fn=fn, oracle_sql=oracle_sql, doc=fn.__doc__ or "", tags=tags
        )
        return fn

    return deco


def _load_all() -> None:
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)


def all_operators() -> dict[str, Operator]:
    _load_all()
    return dict(_REGISTRY)


def get_operator(name: str) -> Operator:
    _load_all()
    return _REGISTRY[name]


def query_map() -> dict[str, QueryFn]:
    """The ``queries()`` dict for the driver contract."""
    return {name: op.query_fn for name, op in all_operators().items()}


def oracle_map() -> dict[str, str]:
    """The ``oracle_sql()`` dict for the driver contract (SQL-expressible only)."""
    return {
        name: op.oracle_sql
        for name, op in all_operators().items()
        if op.oracle_sql is not None
    }
