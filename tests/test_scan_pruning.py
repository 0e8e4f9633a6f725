"""Scan-time pruning evidence (SURVEY §4.2 — the reference's real
optimizer: PKCondition mark-range skipping + month-partition pruning).

These tests assert on the *physical plan*, not just results: filters
must reach the parquet scan (PushedFilters), the month-partition layout
written by write_mergetree must prune partitions (PartitionFilters),
and column pruning must shrink ReadSchema — the Spark analogs of
markRangesFromPKRange (MergeTreeDataSelectExecutor.cpp:93,507) and the
per-part date-range part selection (MergeTreeData.h:48-52).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_is_a_free_analytics_dbms_for_big_data__spark import register_tables
from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.dialect import ChEngine
from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.sources.mergetree import (
    read_mergetree,
    write_mergetree,
)

from .conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_from_dialect_prewhere(spark):
    register_tables(spark, SF_SMOKE)
    eng = ChEngine(spark)
    df = eng.sql(
        "SELECT count() FROM orders PREWHERE o_totalprice > 100000"
    )
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "o_totalprice" in plan.split("PushedFilters")[1][:200], (
        "PREWHERE predicate did not reach the parquet scan"
    )


def test_column_pruning(spark):
    register_tables(spark, SF_SMOKE)
    df = spark.table("lineitem").select("l_orderkey", "l_quantity")
    plan = _plan(df)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema and "l_shipdate" not in read_schema, (
        "projection did not prune the scan schema"
    )


@pytest.fixture(scope="module")
def mergetree_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mt") / "orders_mt")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    write_mergetree(
        orders, path, date_col="o_orderdate", order_by=["o_orderkey"], mode="overwrite"
    )
    return path


def test_partition_pruning_on_month(spark, mergetree_path):
    df = read_mergetree(
        spark, mergetree_path, date_range=("1997-01-01", "1997-03-31")
    )
    plan = _plan(df)
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters")[1][:300]
    assert "_partition" in seg, "month partition filter not pushed to scan"
    # pruned read touches exactly the three selected months
    months = {
        r["_partition"]
        for r in read_mergetree(
            spark,
            mergetree_path,
            date_range=("1997-01-01", "1997-03-31"),
            keep_partition_col=True,
        )
        .select("_partition")
        .distinct()
        .collect()
    }
    # partition values type-infer as INT on read; compare numerically
    assert months == {199701, 199702, 199703}
    total = (
        read_mergetree(spark, mergetree_path, keep_partition_col=True)
        .select("_partition")
        .distinct()
        .count()
    )
    assert total > 12  # multiple years of months exist
    assert df.count() > 0


def test_sorted_write_rowgroup_stats(spark, mergetree_path):
    """Sorted-by-PK writes → parquet min/max stats on the PK column →
    a PK range predicate is pushdown-eligible (the row-group skip
    itself happens inside the parquet reader)."""
    df = read_mergetree(spark, mergetree_path).filter(F.col("o_orderkey") < 100)
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "o_orderkey" in plan.split("PushedFilters")[1][:200]


def test_broadcast_in_star_join(spark):
    """Small dims must broadcast (reference ships GLOBAL subqueries the
    same way, ExpressionAnalyzer.cpp:553-574)."""
    register_tables(spark, SF_SMOKE)
    df = (
        spark.table("customer")
        .join(spark.table("nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .count()
    )
    assert "BroadcastHashJoin" in _plan(df)
