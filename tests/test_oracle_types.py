"""Type-parity gate for every oracle entry.

The driver's correctness compare hashes *serialized typed values*, so a
DuckDB column whose type differs from the Spark column's hashes
differently even when the values are numerically identical.  The
classic trap: DuckDB promotes ``SUM(int)`` to HUGEINT (int128) while
Spark sums as BIGINT — rows/schema still "match", only the value-hash
fails (all 8 CORRECTNESS_r04 fails were exactly this).

This test canonicalizes both engines' result types and asserts they
agree for every registered oracle, so an un-pinned aggregate type can
never regress again.  Calibration against r01-r04 driver evidence:

- int widths <= 64 bits hash identically (``fn_date_parts`` is green
  with duck BIGINT vs spark int) -> all collapse to ``int``.
- HUGEINT/UBIGINT (int128) never hashes equal to anything Spark can
  produce -> it keeps its own tag (always a failure).
- DECIMAL(p,s) must match exactly (q24 failed on (20,0) vs (21,0)).
- duck naive TIMESTAMP == spark session-tz ``timestamp`` (q43 green),
  but NOT spark ``timestamp_ntz`` -> ntz keeps its own tag.
"""

from __future__ import annotations

import re

import pytest

from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.queries import QUERIES
from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.queries.registry import (
    _ensure_loaded,
)

from .conftest import SF_ORACLE

_ensure_loaded()
WITH_ORACLE = sorted(n for n, s in QUERIES.items() if s.oracle is not None)

_RENAMES = [
    # int128 first (before the <=64-bit collapse could eat "bigint")
    (r"\bhugeint\b|\bubigint\b", "int128"),
    (r"\btinyint\b|\bsmallint\b|\binteger\b|\bbigint\b|\bint\b|\blong\b", "int"),
    (r"\butinyint\b|\busmallint\b|\buinteger\b", "int"),
    (r"\bvarchar\b|\btext\b", "string"),
    (r"\breal\b", "float"),
    (r"\bbool\b", "boolean"),
]


def canon(t: str) -> str:
    """Canonical comparable tag for a DuckDB or Spark type string."""
    t = t.lower().replace(" ", "")
    # duck's T[] list syntax -> spark's array<T>
    while True:
        m = re.search(r"([a-z0-9_()<>,]+)\[\]", t)
        if not m:
            break
        t = t[: m.start()] + f"array<{m.group(1)}>" + t[m.end() :]
    for pat, rep in _RENAMES:
        t = re.sub(pat, rep, t)
    return t


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_type_parity(spark, duck, name):
    spec = QUERIES[name]
    rel = duck.sql(spec.oracle)
    dtypes = {c: canon(str(t)) for c, t in zip(rel.columns, rel.types)}
    df = spec.func(spark, SF_ORACLE)
    stypes = {f.name: canon(f.dataType.simpleString()) for f in df.schema.fields}
    assert dtypes == stypes, (
        f"{name}: oracle/spark type mismatch\n duck ={dtypes}\n spark={stypes}\n"
        "Pin the oracle (CAST(... AS BIGINT) for integer SUMs, exact "
        "DECIMAL(p,s), no HUGEINT) or the Spark side until they agree."
    )
