"""Bucketed (co-located) storage: the Spark analog of joining two
MergeTree tables that share an ORDER BY key.

In the reference, a JOIN between tables sorted on the same primary key
still hashes the right side into memory (Interpreters/Join.cpp) — it
has no co-located merge join.  Spark does, via bucketing: writing both
tables with ``bucketBy(n, key)`` [+ ``sortBy``] records the hash
partitioning in the catalog, and a later equi-join on the bucket key
is planned WITHOUT an Exchange on either side (and without a Sort when
sortBy matches) — the shuffle a repeated big-big join would otherwise
pay on every run is paid once at write time.

This is the 100 TB lever for repeated fact-to-fact joins (events ⋈
user profiles on user_id): at a thousand executors the avoided
exchange is the dominant cost.  The bucket count is a layout decision:
pick ~(table size / target partition size), and keep it IDENTICAL on
both sides — mismatched bucket counts fall back to a one-sided
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        buckets, *keys
    )
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left: str,
    right: str,
    key: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Equi-join two same-bucketed catalog tables on the bucket key —
    plans with no Exchange on either side (asserted by
    tests/test_plan_shapes.py)."""
    keys = [key] if isinstance(key, str) else list(key)
    return spark.table(left).join(spark.table(right), keys, how)
