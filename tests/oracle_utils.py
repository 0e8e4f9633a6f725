"""Local replica of the driver's oracle comparison: run the Spark query
and the DuckDB oracle side by side, sort columns by name, sort rows,
and compare values exactly (doubles must be bit-identical — the engine
guarantees this via decimal-exact aggregation)."""

from __future__ import annotations

import datetime
import math
from typing import Any


def _norm(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _keyed(v: Any) -> tuple:
    # total order across None / mixed types for row sorting
    return (v is None, str(type(v)), str(v))


def rows_from_spark(df) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = [tuple(_norm(r[c]) for c in cols) for r in df.collect()]
    return cols, rows


def rows_from_duck(con, sql: str) -> tuple[list[str], list[tuple]]:
    res = con.sql(sql)
    cols_in = res.columns
    order = sorted(range(len(cols_in)), key=lambda i: cols_in[i])
    cols = [cols_in[i] for i in order]
    rows = [tuple(_norm(r[i]) for i in order) for r in res.fetchall()]
    return cols, rows


def assert_matches_oracle(spark_df, duck_con, oracle_sql: str, name: str = "") -> None:
    scols, srows = rows_from_spark(spark_df)
    dcols, drows = rows_from_duck(duck_con, oracle_sql)
    assert scols == dcols, f"{name}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} vs {len(drows)}"
    )
    srows_sorted = sorted(srows, key=lambda r: tuple(_keyed(v) for v in r))
    drows_sorted = sorted(drows, key=lambda r: tuple(_keyed(v) for v in r))
    for i, (a, b) in enumerate(zip(srows_sorted, drows_sorted)):
        assert a == b, f"{name}: row {i} mismatch\n spark={a}\n duck ={b}"
