"""ASOF JOIN semantics + plan shape (operators/asof.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.operators.asof import (
    asof_join,
)


def _probe(spark):
    return spark.createDataFrame(
        [(1, 10), (1, 20), (1, 3), (2, 7)], "k long, ts long"
    )


def _build(spark):
    return spark.createDataFrame(
        [(1, 5, "a"), (1, 15, "b"), (1, 20, "c"), (3, 1, "z")],
        "k long, ts long, v string",
    )


def test_asof_backward(spark):
    got = {
        (r.k, r.ts): r.v
        for r in asof_join(
            _probe(spark), _build(spark), ["k"], "ts", ["v"]
        ).collect()
    }
    # ts=3: no build <= 3 -> NULL; ts=10 -> 'a'(5); ts=20 -> exact 'c';
    # k=2 has no build rows at all -> NULL
    assert got == {(1, 3): None, (1, 10): "a", (1, 20): "c", (2, 7): None}


def test_asof_backward_strict(spark):
    got = {
        (r.k, r.ts): r.v
        for r in asof_join(
            _probe(spark), _build(spark), ["k"], "ts", ["v"],
            allow_exact_matches=False,
        ).collect()
    }
    # strict: ts=20 must NOT see the ts=20 build row -> 'b'(15)
    assert got[(1, 20)] == "b"
    assert got[(1, 10)] == "a"


def test_asof_forward(spark):
    got = {
        (r.k, r.ts): r.v
        for r in asof_join(
            _probe(spark), _build(spark), ["k"], "ts", ["v"],
            direction="forward",
        ).collect()
    }
    # earliest build >= probe: ts=3 -> 'a'(5); ts=10 -> 'b'(15);
    # ts=20 -> exact 'c'; k=2 -> NULL
    assert got == {(1, 3): "a", (1, 10): "b", (1, 20): "c", (2, 7): None}


def test_asof_duplicate_build_ts_deterministic(spark):
    build = spark.createDataFrame(
        [(1, 5, "a"), (1, 5, "zz")], "k long, ts long, v string"
    )
    probe = spark.createDataFrame([(1, 10)], "k long, ts long")
    rows = asof_join(probe, build, ["k"], "ts", ["v"]).collect()
    # duplicate (k, ts) build rows resolve to the GREATEST payload
    assert rows[0].v == "zz"


def test_asof_plan_single_exchange_no_join(spark):
    from tests.test_plan_shapes import _n_exchanges, _plan

    df = asof_join(_probe(spark), _build(spark), ["k"], "ts", ["v"])
    plan = _plan(df)
    assert "Join" not in plan  # union+window composition, no join node
    # probe-side exchange + build-side agg may each exchange; the
    # window itself adds exactly one — no more than 3 total, and the
    # raw tables are never cartesian-expanded
    assert _n_exchanges(plan) <= 3
    assert "CartesianProduct" not in plan
