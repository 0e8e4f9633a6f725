"""Dictionary-function queries (FunctionsExternalDictionaries.cpp /
FunctionsEmbeddedDictionaries.cpp surface) with DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.exact_sum import exact_sum_scaled
from ..functions.dictionaries import Dictionary, HierarchyDictionary, RangeDictionary
from ..sources.catalog import load_tables
from .registry import query


def _t(spark: SparkSession, sf_dir: str, *names: str):
    dfs = load_tables(spark, sf_dir, tuple(names))
    return [dfs[n] for n in names]


@query(
    "dict_flat_lookup",
    """
    SELECT coalesce(n.n_name, 'unknown') AS nation_name, COUNT(*) AS cnt
    FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY nation_name ORDER BY nation_name
    """,
    doc="dictGetStringOrDefault over a flat-layout dictionary — "
    "broadcast-join lookup (FunctionsExternalDictionaries.cpp dictGetT).",
    tags=("dictionary", "functions"),
)
def dict_flat_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, nation = _t(spark, sf_dir, "customer", "nation")
    d = Dictionary(nation.select("n_nationkey", "n_name"), key="n_nationkey")
    return (
        d.get(customer, "n_name", F.col("c_nationkey"), default="unknown", out="nation_name")
        .groupBy("nation_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("nation_name")
    )


@query(
    "dict_range_lookup",
    """
    SELECT era, COUNT(*) AS cnt,
           CAST(SUM(o_totalprice::DECIMAL(18,2)) AS DOUBLE) AS revenue
    FROM orders
    LEFT JOIN (
      VALUES (1992, 1994, 'early'), (1995, 1996, 'mid'), (1997, 1998, 'late')
    ) AS eras(y_lo, y_hi, era)
      ON YEAR(o_orderdate) BETWEEN y_lo AND y_hi
    GROUP BY era ORDER BY era
    """,
    doc="range_hashed dictionary lookup — the reference's one range join "
    "(Dictionaries/RangeHashedDictionary; SURVEY §2.8 dict row).",
    tags=("dictionary", "range_join"),
)
def dict_range_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    eras = spark.createDataFrame(
        [(0, 1992, 1994, "early"), (0, 1995, 1996, "mid"), (0, 1997, 1998, "late")],
        "k INT, y_lo INT, y_hi INT, era STRING",
    )
    d = RangeDictionary(eras, key="k", range_min="y_lo", range_max="y_hi")
    probed = d.get(
        orders.withColumn("__zero", F.lit(0)),
        "era",
        F.col("__zero"),
        F.year("o_orderdate"),
    )
    return (
        probed.groupBy("era")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            exact_sum_scaled(F.col("o_totalprice"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("era")
    )


@query(
    "dict_hierarchy",
    """
    SELECT n_nationkey,
           ARRAY_TO_STRING([n_nationkey, 100 + n_regionkey], ',') AS ancestors,
           (n_regionkey = 1) AS in_america
    FROM nation ORDER BY n_nationkey
    """,
    doc="dictGetHierarchy + dictIsIn over a hierarchical dictionary "
    "(regionTo* family; RegionsHierarchy embedded dicts).  The ancestors "
    "chain is serialized to a CSV string on both sides: the driver's "
    "pandas canonicalizer cannot sort bare array columns "
    "(unhashable-list TypeError).",
    tags=("dictionary", "hierarchy"),
)
def dict_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    (nation,) = _t(spark, sf_dir, "nation")
    # hierarchy: nation node (id = key) → region node (id = 100 + key)
    nodes = nation.select(
        F.col("n_nationkey").cast("int").alias("id"),
        (F.lit(100) + F.col("n_regionkey")).cast("int").alias("parent"),
    ).unionByName(
        nation.select((F.lit(100) + F.col("n_regionkey")).cast("int").alias("id"))
        .distinct()
        .withColumn("parent", F.lit(None).cast("int"))
    )
    h = HierarchyDictionary(nodes, "id", "parent")
    return nation.select(
        "n_nationkey",
        F.array_join(
            h.hierarchy_expr(F.col("n_nationkey").cast("int")).cast("array<string>"),
            ",",
        ).alias("ancestors"),
        h.is_in_expr(F.col("n_nationkey").cast("int"), F.lit(101)).alias("in_america"),
    ).orderBy("n_nationkey")
