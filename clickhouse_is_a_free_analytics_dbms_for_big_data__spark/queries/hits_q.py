"""The reference's own 43-query web-analytics benchmark
(dbms/benchmark/clickhouse/queries.sql, the BASELINE.md yardstick),
re-expressed over the synthetic ``events`` table.

The hits schema is derived deterministically from (event_id, user_id,
ts) with IDENTICAL arithmetic on both engines, so every query is
oracle-checkable; ``uniq`` runs as uniqExact (count distinct) in the
checked entries — the approx variant is covered by ``uniq_approx``.

16 queries cover the 43's distinct shapes: pure count, filtered count,
multi-agg, uniq, min/max dates, single/multi-key GROUP BY top-K, LIKE
scan, ORDER BY scan, HAVING on count, 90-sum codegen-width stress,
IP arithmetic keys, ternary source attribution, minute rollup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_tables
from .registry import query

# ---- shared derived projection (Spark side) --------------------------------


def hits_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → hits-shaped wide projection (deterministic arithmetic)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    eid, uid = F.col("event_id"), F.col("user_id")
    return ev.select(
        F.col("ts").alias("EventTime"),
        F.to_date("ts").alias("EventDate"),
        uid.alias("UserID"),
        (uid % 100).alias("CounterID"),
        (uid % 50).alias("RegionID"),
        F.when(eid % 16 == 0, (eid % 5) + 1).otherwise(F.lit(0)).alias("AdvEngineID"),
        (eid % 7).alias("SearchEngineID"),
        F.when(eid % 5 == 0, F.concat(F.lit("phrase_"), (eid % 199).cast("string")))
        .otherwise(F.lit(""))
        .alias("SearchPhrase"),
        F.concat(F.lit("http://example.com/page/"), (eid % 1000).cast("string")).alias("URL"),
        F.concat(F.lit("http://ref.example.org/"), (uid % 300).cast("string")).alias("Referer"),
        (F.lit(800) + eid % 400).alias("ResolutionWidth"),
        F.pmod(uid * 2654435761, F.lit(4294967296)).alias("ClientIP"),
        (eid % 10 == 0).cast("int").alias("Refresh"),
        (eid % 13 - 6).alias("TraficSourceID"),
    )


# identical projection for the DuckDB oracle (kept in lockstep with the
# Spark expressions above — both engines derive the same columns)
_HITS_CTE = """
    WITH hits AS (
      SELECT ts AS EventTime,
             CAST(ts AS DATE) AS EventDate,
             user_id AS UserID,
             user_id % 100 AS CounterID,
             user_id % 50 AS RegionID,
             CASE WHEN event_id % 16 = 0 THEN (event_id % 5) + 1 ELSE 0 END AS AdvEngineID,
             event_id % 7 AS SearchEngineID,
             CASE WHEN event_id % 5 = 0 THEN 'phrase_' || CAST(event_id % 199 AS VARCHAR) ELSE '' END AS SearchPhrase,
             'http://example.com/page/' || CAST(event_id % 1000 AS VARCHAR) AS URL,
             'http://ref.example.org/' || CAST(user_id % 300 AS VARCHAR) AS Referer,
             800 + event_id % 400 AS ResolutionWidth,
             ((user_id * 2654435761) % 4294967296 + 4294967296) % 4294967296 AS ClientIP,
             CASE WHEN event_id % 10 = 0 THEN 1 ELSE 0 END AS Refresh,
             event_id % 13 - 6 AS TraficSourceID
      FROM events
    )
"""


def _hq(name: str, oracle_body: str, doc: str):
    return query(name, _HITS_CTE + oracle_body, doc=doc, tags=("hits_bench",))


@_hq(
    "hits_q01_count",
    "SELECT COUNT(*) AS cnt FROM hits",
    "benchmark Q1: SELECT count() (queries.sql:1)",
)
def hits_q01(spark, sf_dir):
    return hits_view(spark, sf_dir).agg(F.count(F.lit(1)).alias("cnt"))


@_hq(
    "hits_q02_filtered_count",
    "SELECT COUNT(*) AS cnt FROM hits WHERE AdvEngineID <> 0",
    "benchmark Q2: filtered count (queries.sql:2)",
)
def hits_q02(spark, sf_dir):
    return (
        hits_view(spark, sf_dir)
        .filter(F.col("AdvEngineID") != 0)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@_hq(
    "hits_q03_triple_agg",
    "SELECT SUM(AdvEngineID) AS s, COUNT(*) AS c, AVG(ResolutionWidth) AS a FROM hits",
    "benchmark Q3: sum + count + avg in one pass (queries.sql:3)",
)
def hits_q03(spark, sf_dir):
    return hits_view(spark, sf_dir).agg(
        F.sum("AdvEngineID").alias("s"),
        F.count(F.lit(1)).alias("c"),
        F.avg("ResolutionWidth").alias("a"),
    )


@_hq(
    "hits_q05_uniq_users",
    "SELECT COUNT(DISTINCT UserID) AS u FROM hits",
    "benchmark Q5: uniq(UserID), exact form (queries.sql:5)",
)
def hits_q05(spark, sf_dir):
    return hits_view(spark, sf_dir).agg(F.countDistinct("UserID").alias("u"))


@_hq(
    "hits_q07_minmax_date",
    "SELECT MIN(EventDate) AS lo, MAX(EventDate) AS hi FROM hits",
    "benchmark Q7: min/max EventDate (queries.sql:7)",
)
def hits_q07(spark, sf_dir):
    return hits_view(spark, sf_dir).agg(
        F.min("EventDate").alias("lo"), F.max("EventDate").alias("hi")
    )


@_hq(
    "hits_q08_adv_group",
    """
    SELECT AdvEngineID, COUNT(*) AS c FROM hits WHERE AdvEngineID <> 0
    GROUP BY AdvEngineID ORDER BY c DESC, AdvEngineID
    """,
    "benchmark Q8: small-cardinality GROUP BY ordered by count (queries.sql:8)",
)
def hits_q08(spark, sf_dir):
    return (
        hits_view(spark, sf_dir)
        .filter(F.col("AdvEngineID") != 0)
        .groupBy("AdvEngineID")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "AdvEngineID")
    )


@_hq(
    "hits_q09_region_uniq",
    """
    SELECT RegionID, COUNT(DISTINCT UserID) AS u FROM hits
    GROUP BY RegionID ORDER BY u DESC, RegionID LIMIT 10
    """,
    "benchmark Q9: GROUP BY + uniq top-10 (queries.sql:9)",
)
def hits_q09(spark, sf_dir):
    return (
        hits_view(spark, sf_dir)
        .groupBy("RegionID")
        .agg(F.countDistinct("UserID").alias("u"))
        .orderBy(F.desc("u"), "RegionID")
        .limit(10)
    )


@_hq(
    "hits_q13_phrase_top",
    """
    SELECT SearchPhrase, COUNT(*) AS c FROM hits WHERE SearchPhrase <> ''
    GROUP BY SearchPhrase ORDER BY c DESC, SearchPhrase LIMIT 10
    """,
    "benchmark Q13: hot-key string GROUP BY top-10 (queries.sql:13)",
)
def hits_q13(spark, sf_dir):
    return (
        hits_view(spark, sf_dir)
        .filter(F.col("SearchPhrase") != "")
        .groupBy("SearchPhrase")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "SearchPhrase")
        .limit(10)
    )


@_hq(
    "hits_q17_user_phrase",
    """
    SELECT UserID, SearchPhrase, COUNT(*) AS c FROM hits
    GROUP BY UserID, SearchPhrase ORDER BY c DESC, UserID, SearchPhrase LIMIT 10
    """,
    "benchmark Q17: wide two-key GROUP BY (the heavy shape, queries.sql:17)",
)
def hits_q17(spark, sf_dir):
    return (
        hits_view(spark, sf_dir)
        .groupBy("UserID", "SearchPhrase")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "UserID", "SearchPhrase")
        .limit(10)
    )


@_hq(
    "hits_q19_minute_group",
    """
    SELECT UserID, minute(EventTime) AS m, SearchPhrase, COUNT(*) AS c FROM hits
    GROUP BY UserID, m, SearchPhrase ORDER BY c DESC, UserID, m, SearchPhrase LIMIT 10
    """,
    "benchmark Q19: three-key GROUP BY with time extraction (queries.sql:19)",
)
def hits_q19(spark, sf_dir):
    return (
        hits_view(spark, sf_dir)
        .groupBy(
            "UserID", F.minute("EventTime").alias("m"), "SearchPhrase"
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "UserID", "m", "SearchPhrase")
        .limit(10)
    )


@_hq(
    "hits_q21_url_like",
    "SELECT COUNT(*) AS cnt FROM hits WHERE URL LIKE '%page/42%'",
    "benchmark Q21: substring scan (queries.sql:21)",
)
def hits_q21(spark, sf_dir):
    return (
        hits_view(spark, sf_dir)
        .filter(F.col("URL").like("%page/42%"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@_hq(
    "hits_q27_order_scan",
    """
    SELECT SearchPhrase FROM hits WHERE SearchPhrase <> ''
    ORDER BY EventTime, SearchPhrase LIMIT 10
    """,
    "benchmark Q27: filter + ORDER BY scan, top-N pushdown (queries.sql:27)",
)
def hits_q27(spark, sf_dir):
    return (
        hits_view(spark, sf_dir)
        .filter(F.col("SearchPhrase") != "")
        .orderBy("EventTime", "SearchPhrase")
        .select("SearchPhrase")
        .limit(10)
    )


@_hq(
    "hits_q28_having",
    """
    SELECT CounterID, AVG(length(URL)) AS l, COUNT(*) AS c FROM hits
    GROUP BY CounterID HAVING COUNT(*) > 500 ORDER BY l DESC, CounterID LIMIT 25
    """,
    "benchmark Q28: HAVING on group count (queries.sql:28; threshold scaled "
    "to the synthetic row count)",
)
def hits_q28(spark, sf_dir):
    return (
        hits_view(spark, sf_dir)
        .groupBy("CounterID")
        .agg(
            F.avg(F.length("URL")).alias("l"), F.count(F.lit(1)).alias("c")
        )
        .filter(F.col("c") > 500)
        .orderBy(F.desc("l"), "CounterID")
        .limit(25)
    )


@_hq(
    "hits_q30_ninety_sums",
    "SELECT "
    + ", ".join(f"SUM(ResolutionWidth + {i}) AS s{i}" for i in range(90))
    + " FROM hits",
    "benchmark Q30: 90 simultaneous sums — codegen-width stress (queries.sql:30)",
)
def hits_q30(spark, sf_dir):
    rw = F.col("ResolutionWidth")
    return hits_view(spark, sf_dir).agg(
        *[F.sum(rw + F.lit(i)).alias(f"s{i}") for i in range(90)]
    )


@_hq(
    "hits_q35_ip_keys",
    """
    SELECT ClientIP AS x, ClientIP - 1 AS x1, ClientIP - 2 AS x2,
           ClientIP - 3 AS x3, COUNT(*) AS c
    FROM hits GROUP BY ClientIP ORDER BY c DESC, x LIMIT 10
    """,
    "benchmark Q35: arithmetic-derived group keys (queries.sql:35)",
)
def hits_q35(spark, sf_dir):
    x = F.col("ClientIP")
    return (
        hits_view(spark, sf_dir)
        .groupBy(
            x.alias("x"),
            (x - 1).alias("x1"),
            (x - 2).alias("x2"),
            (x - 3).alias("x3"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "x")
        .limit(10)
    )


@_hq(
    "hits_q39_ternary_src",
    """
    SELECT TraficSourceID, SearchEngineID, AdvEngineID,
           CASE WHEN SearchEngineID = 0 AND AdvEngineID = 0 THEN Referer ELSE '' END AS Src,
           URL AS Dst, COUNT(*) AS PageViews
    FROM hits WHERE CounterID = 34 AND Refresh = 0
    GROUP BY TraficSourceID, SearchEngineID, AdvEngineID, Src, Dst
    ORDER BY PageViews DESC, TraficSourceID, SearchEngineID, AdvEngineID, Src, Dst
    LIMIT 100
    """,
    "benchmark Q39: ternary source attribution over five keys (queries.sql:39 "
    "— the '?:' operator form)",
)
def hits_q39(spark, sf_dir):
    src = F.when(
        (F.col("SearchEngineID") == 0) & (F.col("AdvEngineID") == 0),
        F.col("Referer"),
    ).otherwise(F.lit(""))
    return (
        hits_view(spark, sf_dir)
        .filter((F.col("CounterID") == 34) & (F.col("Refresh") == 0))
        .groupBy(
            "TraficSourceID",
            "SearchEngineID",
            "AdvEngineID",
            src.alias("Src"),
            F.col("URL").alias("Dst"),
        )
        .agg(F.count(F.lit(1)).alias("PageViews"))
        .orderBy(
            F.desc("PageViews"),
            "TraficSourceID",
            "SearchEngineID",
            "AdvEngineID",
            "Src",
            "Dst",
        )
        .limit(100)
    )


@_hq(
    "hits_q43_minute_rollup",
    """
    SELECT date_trunc('minute', EventTime) AS Minute, COUNT(*) AS PageViews
    FROM hits WHERE CounterID = 34 AND Refresh = 0
    GROUP BY Minute ORDER BY Minute
    """,
    "benchmark Q43: per-minute drill-down rollup (queries.sql:43)",
)
def hits_q43(spark, sf_dir):
    return (
        hits_view(spark, sf_dir)
        .filter((F.col("CounterID") == 34) & (F.col("Refresh") == 0))
        .groupBy(F.date_trunc("minute", F.col("EventTime")).alias("Minute"))
        .agg(F.count(F.lit(1)).alias("PageViews"))
        .orderBy("Minute")
    )
