"""The correctness gate, run locally: every registered query with an
oracle must match DuckDB exactly at sf0.01 (same compare the driver
does: schema names + order-insensitive values)."""

from __future__ import annotations

import pytest

from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.queries import QUERIES
from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.queries.registry import (
    _ensure_loaded,
)

from .conftest import SF_ORACLE
from .oracle_utils import assert_matches_oracle

_ensure_loaded()
WITH_ORACLE = sorted(n for n, s in QUERIES.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in QUERIES.items() if s.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, duck, name):
    spec = QUERIES[name]
    df = spec.func(spark, SF_ORACLE)
    assert_matches_oracle(df, duck, spec.oracle, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    spec = QUERIES[name]
    df = spec.func(spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
