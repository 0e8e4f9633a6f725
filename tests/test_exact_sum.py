"""exact_sum_scaled: the scaled-long exact-sum primitive
(AggregateFunctionSum over scaled Int64 in the reference — see
operators/exact_sum.py header for the split hi/lo derivation)."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.operators import (
    exact_sum_scaled,
)


def test_exact_sum_matches_decimal_sum(spark):
    df = spark.createDataFrame(
        [(1, 1.01), (1, 2.02), (1, None), (2, -0.005), (3, None)],
        "k int, v double",
    )
    got = {
        r.k: (r.s, r.ref)
        for r in df.groupBy("k")
        .agg(
            exact_sum_scaled(F.col("v"), 2).alias("s"),
            F.sum(F.col("v").cast("decimal(18,2)")).alias("ref"),
        )
        .collect()
    }
    assert got[1][0] == got[1][1] == Decimal("3.03")
    # HALF_UP at scale 2: -0.005 -> -0.01 (same as CAST to decimal(18,2))
    assert got[2][0] == got[2][1] == Decimal("-0.01")
    # all-NULL group yields NULL, matching SUM
    assert got[3] == (None, None)


def test_exact_sum_scale_zero_is_plain_long_sum(spark):
    df = spark.createDataFrame([(2.4,), (2.4,), (0.5,)], "v double")
    got = df.agg(exact_sum_scaled(F.col("v"), 0).alias("s")).collect()[0].s
    # round-half-up per value: 2 + 2 + 1
    assert got == Decimal("5")


def test_exact_sum_rejects_bad_scale(spark):
    for bad in (-1, 19, 2.5, "2"):
        with pytest.raises(ValueError):
            exact_sum_scaled(F.col("v"), bad)


def test_scaled_long_equals_round_on_exact_decimals(spark):
    """r11: scaled_long replaces F.round(v*10^s).cast(long) (which
    allocates a BigDecimal per row).  Pin value-identity on a dense
    grid of exact 2-decimal values crossing zero — the domain the
    helper is documented for — including the sign-aware negative
    half-offset (JVM long cast truncates toward zero)."""
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.operators.exact_sum import (
        scaled_long,
    )

    # every cent in [-50.00, 50.00] plus large-magnitude money values
    vals = [round(c / 100.0, 2) for c in range(-5000, 5001)]
    vals += [round(x + c / 100.0, 2) for x in (1e6, -1e6, 1e9, -1e9)
             for c in range(0, 100, 7)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = df.select(
        scaled_long(F.col("v"), 2).alias("fast"),
        F.round(F.col("v") * 100).cast("long").alias("ref"),
    ).collect()
    bad = [(r.fast, r.ref) for r in out if r.fast != r.ref]
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"
