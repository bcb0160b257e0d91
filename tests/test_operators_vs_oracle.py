"""Every oracle-paired operator vs DuckDB at sf0.01 — the in-repo mirror
of the driver's CORRECTNESS gate, parameterized over the registry so new
operators are tested the moment they register."""

from __future__ import annotations

import pytest

from mapreduce_c_implementation_spark.registry import all_operators
from tests.oracle import assert_matches_oracle

ORACLE_OPS = sorted(n for n, op in all_operators().items() if op.oracle_sql)


@pytest.mark.parametrize("name", ORACLE_OPS)
def test_operator_matches_oracle(spark, sf_correct, name):
    assert_matches_oracle(spark, name, sf_correct)
