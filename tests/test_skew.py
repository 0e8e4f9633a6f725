"""Salted-join / salted-aggregate equivalence tests (operators/skew.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.operators.skew import (
    salted_collect_set,
    salted_join,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # hot key 7 carries 5000 rows; keys 0-9 carry 10 each
    hot = spark.range(5000).selectExpr("7 AS k", "id AS payload")
    cold = spark.range(100).selectExpr("id % 10 AS k", "id + 100000 AS payload")
    return hot.unionByName(cold)


@pytest.fixture(scope="module")
def dim(spark):
    return spark.range(10).selectExpr("id AS k", "concat('d', id) AS dname")


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_join_matches_unsalted(spark, skewed, dim, how):
    # drop key 3 from the dim so left/anti actually differ from inner
    d = dim.filter(F.col("k") != 3)
    plain = skewed.join(d, "k", how)
    salted = salted_join(skewed, d, "k", how, salts=8)
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_join_rejects_right_outer(spark, skewed, dim):
    with pytest.raises(ValueError):
        salted_join(skewed, dim, "k", how="full")


def test_salted_collect_set_matches_plain(spark, skewed):
    plain = (
        skewed.groupBy("k")
        .agg(F.collect_set("payload").alias("values"))
        .collect()
    )
    salted = salted_collect_set(skewed, "k", "payload", salts=8).collect()
    p = {r.k: sorted(r["values"]) for r in plain}
    s = {r.k: sorted(r["values"]) for r in salted}
    assert p == s
