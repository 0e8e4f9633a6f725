"""SparkSession factory for the engine.

Defaults target local[N] testing but are written for a real cluster:
AQE (runtime re-plan, skew-join splitting, partition coalescing) is the
scale story for 100 TB — it replaces the reference's hand-rolled
two-level aggregation/IN-shard machinery (reference:
dbms/src/Interpreters/Aggregator.cpp:859, two-level conversion) with
runtime shuffle statistics.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "clickhouse_dbms_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Env overrides: ``SPARK_GRAFT_CPUS`` sets local parallelism,
    ``SPARK_GRAFT_SHUFFLE_PARTITIONS`` the shuffle width.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus))
        )

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # Shuffle width ~= cores locally; AQE coalesces down at runtime,
        # so on a real cluster this is a ceiling, not a fixed cost.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for every pandas_udf / toPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Oracle comparisons (DuckDB) are UTC-naive; pin the session TZ.
        .config("spark.sql.session.timeZone", "UTC")
        # The reference treats missing values as type defaults, not NULL;
        # ANSI off keeps casts forgiving (toUInt32OrZero-style semantics).
        .config("spark.sql.ansi.enabled", "false")
        # Test corpus writes events.ts as TIMESTAMP(NANOS); read as long
        # nanos and convert in the catalog (Spark has no nanos timestamps).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # decode() of non-UTF-8 bytes substitutes U+FFFD instead of
        # throwing (reinterpretAsString builds strings from raw
        # little-endian integer bytes — golden 00003)
        .config("spark.sql.legacy.codingErrorAction", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
