"""Long-tail function queries: arrayEnumerateUniq sessionization,
arrayReduce, reinterpret roundtrip."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.arrays import arrayReduce
from ..functions.reinterpret import reinterpretAsString, reinterpretAsUInt32
from ..sources.catalog import load_tables
from .registry import query


def _t(spark: SparkSession, sf_dir: str, *names: str):
    dfs = load_tables(spark, sf_dir, tuple(names))
    return [dfs[n] for n in names]


@query(
    "fn_enumerate_uniq_sessionize",
    """
    SELECT doc_id, p[1] AS tok,
           ROW_NUMBER() OVER (
             PARTITION BY doc_id, p[1] ORDER BY p[2]
           ) AS occurrence
    FROM (
      SELECT doc_id,
             unnest(list_zip(toks, generate_series(1, len(toks)))) AS p
      FROM (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        WHERE doc_id % 97 = 0
      )
    )
    """,
    doc="arrayEnumerateUniq (FunctionsArray.cpp) — occurrence rank per "
    "value, the reference's sessionization primitive.  r11: computed "
    "at TABLE level (posexplode + row_number per (doc_id, tok) by "
    "position) — the form the array operator's own doc prescribes for "
    "long arrays: the array-side lambda is O(len^2) and higher-order "
    "functions run INTERPRETED per element (no codegen), measured "
    "4.4 s vs 0.3 s here on ~200-token docs, and quadratic blowup on "
    "the long documents a 100 TB corpus contains.  The array-side "
    "operator (functions/arrays.arrayEnumerateUniq) stays for short "
    "arrays and the dialect; values are identical (the oracle always "
    "computed it relationally).",
    tags=("functions", "array"),
)
def fn_enumerate_uniq_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    (docs,) = _t(spark, sf_dir, "documents")
    toks = (
        docs.filter(F.col("doc_id") % 97 == 0)
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tok"))
    )
    w = Window.partitionBy("doc_id", "tok").orderBy("pos0")
    return (
        toks.withColumn("occurrence", F.row_number().over(w).cast("long"))
        .orderBy("doc_id", F.col("pos0"))
        .select("doc_id", "tok", "occurrence")
    )


@query(
    "fn_array_reduce",
    """
    SELECT o_custkey,
           CAST(list_sum(prices) AS DOUBLE) AS total,
           CAST(list_max(prices) AS DOUBLE) AS biggest,
           len(prices) AS n
    FROM (
      SELECT o_custkey, list(o_totalprice ORDER BY o_orderkey) AS prices
      FROM orders GROUP BY o_custkey
    )
    WHERE o_custkey % 50 = 0
    ORDER BY o_custkey
    """,
    doc="arrayReduce('sum'/'max'/'count', arr) (FunctionsArray.h:1387) "
    "over per-key collected arrays — array-native, no second shuffle.",
    tags=("functions", "array"),
)
def fn_array_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    per_key = (
        orders.groupBy("o_custkey")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("o_orderkey", "o_totalprice"))
            ).alias("sorted_pairs")
        )
        .withColumn(
            "prices", F.transform("sorted_pairs", lambda s: s["o_totalprice"])
        )
    )
    return (
        per_key.filter(F.col("o_custkey") % 50 == 0)
        .select(
            "o_custkey",
            arrayReduce("sum", "prices").alias("total"),
            arrayReduce("max", "prices").cast("double").alias("biggest"),
            arrayReduce("count", "prices").cast("long").alias("n"),
        )
        .orderBy("o_custkey")
    )


@query(
    "fn_reinterpret_roundtrip",
    """
    SELECT n_nationkey,
           chr(65 + (n_nationkey % 26)) AS s,
           (65 + (n_nationkey % 26)) AS back
    FROM nation ORDER BY n_nationkey
    """,
    doc="reinterpretAsString / reinterpretAsUInt32 roundtrip "
    "(FunctionsReinterpret.cpp): int bytes ↔ string, little-endian.",
    tags=("functions", "reinterpret"),
)
def fn_reinterpret_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    (nation,) = _t(spark, sf_dir, "nation")
    code = (F.lit(65) + F.col("n_nationkey") % 26).cast("long")
    return nation.select(
        "n_nationkey",
        reinterpretAsString(code).alias("s"),
        reinterpretAsUInt32(reinterpretAsString(code)).cast("long").alias("back"),
    ).orderBy("n_nationkey")


@query(
    "fn_sum_foreach",
    """
    WITH a AS (
      SELECT l_returnflag,
             ([CAST(l_quantity AS BIGINT), CAST(l_linenumber AS BIGINT),
               CAST(l_partkey % 10 AS BIGINT)])[:(l_linenumber % 3 + 1)] AS arr
      FROM lineitem
    )
    SELECT l_returnflag,
           ARRAY_TO_STRING(LIST_TRANSFORM(
               [CAST(COALESCE(SUM(arr[1]), 0) AS BIGINT),
                CAST(COALESCE(SUM(arr[2]), 0) AS BIGINT),
                CAST(COALESCE(SUM(arr[3]), 0) AS BIGINT)],
               x -> CAST(x AS VARCHAR)), ',') AS sums
    FROM a GROUP BY 1 ORDER BY 1
    """,
    doc="sumForEach — the -ForEach combinator "
    "(AggregateFunctions/AggregateFunctionForEach.h, factory "
    "AggregateFunctionFactory.cpp:51-55): per-index aggregation across "
    "variable-length arrays; missing indexes sum as 0 (the combinator's "
    "zero-fill semantics).  Output serialized to a CSV string: the "
    "driver's pandas canonicalizer cannot sort bare array columns.",
    tags=("functions", "aggregate", "combinator"),
)
def fn_sum_foreach(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.aggregates import sumForEach

    (li,) = _t(spark, sf_dir, "lineitem")
    arr = F.slice(
        F.array(
            F.col("l_quantity").cast("long"),
            F.col("l_linenumber").cast("long"),
            (F.col("l_partkey") % 10).cast("long"),
        ),
        F.lit(1),
        (F.col("l_linenumber") % 3 + 1).cast("int"),
    )
    return (
        li.select("l_returnflag", arr.alias("arr"))
        .groupBy("l_returnflag")
        .agg(sumForEach(F.col("arr")).alias("sums_raw"))
        .select(
            "l_returnflag",
            F.array_join(
                F.expr("transform(sums_raw, x -> cast(cast(x as bigint) as string))"),
                ",",
            ).alias("sums"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "fn_quantile_weighted",
    """
    SELECT l_returnflag, quantile_cont(v, 0.5) AS q FROM (
      SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS v
      FROM lineitem, UNNEST(range(CAST(l_linenumber AS BIGINT))) AS t(i)
    ) GROUP BY 1 ORDER BY 1
    """,
    doc="quantileExactWeighted "
    "(AggregateFunctionQuantileExactWeighted.h): exact weighted median "
    "via percentile(x, p, frequency); oracle expands each row by its "
    "weight and takes the continuous quantile.",
    tags=("functions", "aggregate"),
)
def fn_quantile_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.aggregates import quantileExactWeighted

    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            quantileExactWeighted(
                F.col("l_quantity").cast("long"), F.col("l_linenumber")
            ).alias("q")
        )
        .orderBy("l_returnflag")
    )
