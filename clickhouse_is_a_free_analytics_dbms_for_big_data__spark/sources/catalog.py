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

# Table-reader memo (r11): ``spark.read.parquet`` pays a driver-side
# footer read + schema inference of ~80 ms PER CALL, re-paid by every
# query build over the same immutable table (measured r11; guide §7.3
# driver-side planning cost).  The memo caches the lazy DataFrame —
# a PLAN, not data; every execution still scans parquet — keyed on the
# session AND an on-disk staleness signature (mtime+size), so a
# rewritten table is re-read, mirroring the reference's table-metadata
# registry (Storages/StorageFactory.cpp: tables are constructed once,
# not per query).
_READER_CACHE: dict[tuple, DataFrame] = {}
_CONF_PINNED: set[tuple] = set()


def _stat_sig(path: str) -> tuple:
    """Staleness signature: file (mtime_ns, size); for Spark-written
    directory tables, the dir mtime plus per-file (name, mtime, size)."""
    st = os.stat(path)
    if os.path.isfile(path):
        return (st.st_mtime_ns, st.st_size)
    entries = []
    for f in sorted(os.listdir(path)):
        try:
            s = os.stat(os.path.join(path, f))
            entries.append((f, s.st_mtime_ns, s.st_size))
        except OSError:
            pass
    return (st.st_mtime_ns, tuple(entries))


def parquet_row_count(path: str) -> int | None:
    """Exact row count from the parquet FOOTERS (file or directory of
    part files) — a metadata read, no data scan: the same way the
    reference serves a bare count() from part metadata
    (MergeTree data parts carry row counts).  Returns None when the
    path is not readable parquet so callers can fall back to a scan.
    """
    import pyarrow.parquet as pq

    try:
        if os.path.isfile(path):
            return pq.ParquetFile(path).metadata.num_rows
        total = 0
        found = False
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    total += pq.ParquetFile(
                        os.path.join(root, f)
                    ).metadata.num_rows
                    found = True
        return total if found else None
    except Exception:
        return None


def load_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load each parquet table lazily; missing files are skipped."""
    # Queries must run under ANY caller-provided session (the driver
    # builds its own), so pin the runtime confs the engine relies on:
    # nanos timestamps read as long, and non-ANSI arithmetic (the
    # reference wraps on overflow; ANSI would throw on hash mixing).
    # Pinned once per session (two py4j round trips otherwise re-paid
    # on every query build).
    app = spark.sparkContext.applicationId
    sess = (app, id(spark))
    # keyed on the (app, id) SESSION tuple, not the app alone:
    # spark.conf.set is per-SparkSession, and a driver may hand us a
    # spark.newSession() clone that shares the applicationId but not
    # the runtime conf (r11 advice)
    if sess not in _CONF_PINNED:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.ansi.enabled", "false")
        _CONF_PINNED.add(sess)
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        key = (sess, path, _stat_sig(path))
        df = _READER_CACHE.get(key)
        if df is None:
            if len(_READER_CACHE) > 256:  # dead sessions / rewritten paths
                _READER_CACHE.clear()
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
            _READER_CACHE[key] = df
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
