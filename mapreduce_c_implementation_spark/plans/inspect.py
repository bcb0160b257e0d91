"""Physical-plan inspection helpers.

The reference's optimizer section is empty (SURVEY.md §4.1) — Catalyst
supplies it all.  These helpers let tests ASSERT that the free
optimizations actually happened: predicate pushdown and column pruning
into the parquet scan, broadcast joins for small dims, whole-stage
codegen coverage.  This is the 100 TB insurance: a plan that reads all
columns or shuffles a 5-row dim table is a bug at scale even though it
passes correctness at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_parquet_pushdown(df: DataFrame, pushed_fragment: str) -> None:
    """Assert a filter fragment reached the parquet scan's PushedFilters."""
    plan = physical_plan(df)
    if "PushedFilters" not in plan:
        raise AssertionError(f"no PushedFilters in plan:\n{plan}")
    if pushed_fragment not in plan:
        raise AssertionError(f"{pushed_fragment!r} not pushed down:\n{plan}")


def assert_read_schema_only(df: DataFrame, allowed_cols: set[str]) -> None:
    """Assert column pruning: the parquet ReadSchema mentions only allowed_cols."""
    import re

    plan = physical_plan(df)
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
        extra = cols - allowed_cols
        if extra:
            raise AssertionError(f"unpruned columns {extra} in scan:\n{plan}")


def assert_broadcast_join(df: DataFrame, expect: int = 1) -> None:
    import re

    plan = physical_plan(df)
    # Count tree nodes, not the per-operator detail sections.
    n = len(re.findall(r"BroadcastHashJoin \w+ Build\w+ \(\d+\)", plan))
    if n < expect:
        raise AssertionError(f"expected >= {expect} BroadcastHashJoin, got {n}:\n{plan}")


def count_shuffles(df: DataFrame) -> int:
    """Number of SHUFFLE exchanges (hash/range/round-robin repartitions)
    in the physical plan — scale red flag #1.  Broadcast exchanges are
    deliberately excluded: they ship dim tables, not the fact stream.
    In "formatted" explain output each Exchange's partitioning appears
    on its Arguments line, so count those."""
    import re

    plan = physical_plan(df)
    return len(
        re.findall(
            r"Arguments: (?:(?:hash|range|roundrobin)partitioning\(|SinglePartition)",
            plan,
        )
    )
