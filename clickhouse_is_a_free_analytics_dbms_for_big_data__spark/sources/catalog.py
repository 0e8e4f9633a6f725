"""Table catalog: parquet dirs -> DataFrames / temp views.

Plays the role of the reference's table registry
(dbms/src/Storages/StorageFactory.cpp) for the test corpus: every table
is columnar storage read through the vectorized parquet reader with
predicate pushdown and column pruning — the Spark analog of the
reference's column files + PREWHERE.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load each parquet table lazily; missing files are skipped."""
    # Queries must run under ANY caller-provided session (the driver
    # builds its own), so pin the runtime confs the engine relies on:
    # nanos timestamps read as long, and non-ANSI arithmetic (the
    # reference wraps on overflow; ANSI would throw on hash mixing).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            # TIMESTAMP(NANOS) columns arrive as long nanos (see session
            # conf); surface them as microsecond timestamps like every
            # other engine (DuckDB/pyarrow truncate the same way).
            if name == "events" and isinstance(
                df.schema["ts"].dataType, T.LongType
            ):
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
                )
            out[name] = df
    return out


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load and register every table as a temp view (idempotent)."""
    dfs = load_tables(spark, sf_dir, tables)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
