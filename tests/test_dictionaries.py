"""Dictionary-layout unit tests (flat / range_hashed / hierarchy)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.functions.dictionaries import (
    Dictionary,
    HierarchyDictionary,
    RangeDictionary,
)


def test_flat_get_and_default(spark):
    dim = spark.createDataFrame([(1, "one"), (2, "two")], "k INT, name STRING")
    d = Dictionary(dim, "k")
    facts = spark.createDataFrame([(1,), (2,), (9,)], "fk INT")
    rows = {
        r["fk"]: r["name"]
        for r in d.get(facts, "name", F.col("fk"), default="??").collect()
    }
    assert rows == {1: "one", 2: "two", 9: "??"}


def test_flat_has(spark):
    dim = spark.createDataFrame([(1,), (2,)], "k INT")
    d = Dictionary(dim, "k")
    facts = spark.createDataFrame([(2,), (5,)], "fk INT")
    rows = {r["fk"]: r["has"] for r in d.has(facts, F.col("fk")).collect()}
    assert rows == {2: True, 5: False}


def test_flat_get_is_broadcast(spark):
    dim = spark.createDataFrame([(1, "one")], "k INT, name STRING")
    facts = spark.createDataFrame([(1,)], "fk INT")
    out = Dictionary(dim, "k").get(facts, "name", F.col("fk"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_range_get(spark):
    dim = spark.createDataFrame(
        [(7, 0, 9, "low"), (7, 10, 99, "high")],
        "k INT, lo INT, hi INT, tier STRING",
    )
    d = RangeDictionary(dim, "k", "lo", "hi")
    facts = spark.createDataFrame([(7, 5), (7, 50), (7, 100), (8, 5)], "k INT, v INT")
    rows = {
        (r["k"], r["v"]): r["tier"]
        for r in d.get(facts, "tier", F.col("k"), F.col("v"), default="none").collect()
    }
    assert rows == {(7, 5): "low", (7, 50): "high", (7, 100): "none", (8, 5): "none"}


def test_hierarchy(spark):
    #      1
    #     / \
    #    2   3
    #        |
    #        4
    nodes = spark.createDataFrame(
        [(1, None), (2, 1), (3, 1), (4, 3)], "id INT, parent INT"
    )
    h = HierarchyDictionary(nodes, "id", "parent")
    probe = spark.createDataFrame([(4,), (2,), (1,), (99,)], "x INT")
    out = probe.select(
        "x",
        h.hierarchy_expr(F.col("x")).alias("anc"),
        h.is_in_expr(F.col("x"), F.lit(1)).alias("under_root"),
        h.ancestor_at_expr(F.col("x"), 1).alias("up1"),
    ).collect()
    got = {r["x"]: (r["anc"], r["under_root"], r["up1"]) for r in out}
    assert got[4] == ([4, 3, 1], True, 3)
    assert got[2] == ([2, 1], True, 1)
    assert got[1] == ([1], True, None)
    assert got[99] == ([99], False, None)


def test_dialect_hierarchy_dictionary(spark):
    """dictGetHierarchy/dictIsIn through the CH-SQL dialect: the
    ancestor closure embeds as a broadcast map literal at registration
    (FunctionsExternalDictionaries; RegionsHierarchy layout)."""
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.dialect import (
        ChEngine,
    )

    eng = ChEngine(spark)
    dim = spark.createDataFrame(
        [(1, 0, "root"), (2, 1, "mid"), (3, 2, "leaf"), (10, 0, "x")],
        "id long, pid long, nm string",
    )
    eng.register_dictionary("geo_t", dim, key="id", parent="pid")
    get = lambda q: eng.execute(q).first()[0]
    assert get("SELECT dictGetString('geo_t', 'nm', toUInt64(2))") == "mid"
    assert get("SELECT dictGetHierarchy('geo_t', toUInt64(3))") == [3, 2, 1]
    assert get("SELECT dictIsIn('geo_t', toUInt64(3), toUInt64(1))") is True
    assert get("SELECT dictIsIn('geo_t', toUInt64(3), toUInt64(10))") is False
    # unknown keys fall back to a self-chain (reference: hierarchy of
    # an absent id is just the id)
    assert get("SELECT dictGetHierarchy('geo_t', toUInt64(99))") == [99]


def test_dialect_unknown_dictionary_is_clean_error(spark):
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.dialect import (
        ChEngine,
    )
    import pytest as _pytest

    eng = ChEngine(spark)
    with _pytest.raises(Exception, match="unknown dictionary"):
        eng.execute("SELECT dictGetString('no_such_dict', 'a', toUInt64(1))")
