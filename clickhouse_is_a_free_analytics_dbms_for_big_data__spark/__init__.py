"""PySpark-native analytics engine with the query surface of the reference
OLAP DBMS (early ClickHouse, v1.1.54189 — see SURVEY.md).

Architecture (Spark-first, not a port):

- ``session``      — SparkSession factory tuned for columnar OLAP (AQE on,
                     Arrow on, UTC, shuffle partitions sized to cores).
- ``sources``      — table catalog over parquet dirs + MergeTree-family
                     write/compaction policies re-expressed as Spark jobs.
- ``functions``    — the reference's scalar-function dialect as Column
                     expression builders (JVM-side, no Python UDFs in the
                     hot path).  functions/aggregates.py adds the aggregate
                     dialect incl. -If/-Array combinators.
- ``operators``    — query-clause operators Spark lacks natively:
                     ANY JOIN, ARRAY JOIN, LIMIT BY, WITH TOTALS,
                     deterministic SAMPLE, FINAL dedup, sequenceMatch.
- ``streaming``    — Buffer / MaterializedView semantics on Structured
                     Streaming.
- ``pipeline``     — large-scale training-data ops: dedup (exact, MinHash-
                     LSH, SimHash, n-gram Jaccard, embedding), similarity
                     search, text analysis, multimodal column plumbing.

Everything here is plain DataFrame/Catalyst; physical execution
(vectorization, codegen, spill, partial aggregation — reference §4.3) is
delegated to Tungsten by construction.
"""

from .session import get_session
from .sources.catalog import TABLES, load_tables, register_tables

__all__ = ["get_session", "load_tables", "register_tables", "TABLES"]
