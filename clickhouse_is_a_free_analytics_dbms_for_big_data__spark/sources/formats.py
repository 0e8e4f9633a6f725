"""I/O formats (reference: dbms/src/DataStreams/FormatFactory.cpp).

Two families, mirroring how the reference uses them:

**Storage/interchange formats** (TabSeparated*, CSV*, JSONEachRow,
TSKV, Values) — distributed ``spark.read``/``df.write`` mappings.
These scale: a TSV read is a parallel text scan with schema applied;
a TSKV read stays JVM-side via ``str_to_map``.

**Display formats** (Pretty, PrettyCompact, Vertical, JSON,
JSONCompact, XML) — client-side renderers over a *collected* result,
exactly like the reference's output-only formats (they exist to format
a query result for a human/client, never to store data).  ``max_rows``
guards the collect.

Not mapped: Native and RowBinary are the reference's internal wire
formats (IDataType binary bulk serde, IDataType.h:55-60) — Arrow and
Parquet fill that role on Spark by construction.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = ["read_format", "write_format", "format_result", "FORMATS"]

_TSV_FAMILY = {
    "TabSeparated": {"sep": "\t", "header": False},
    "TSV": {"sep": "\t", "header": False},
    "TabSeparatedWithNames": {"sep": "\t", "header": True},
    "TSVWithNames": {"sep": "\t", "header": True},
    "CSV": {"sep": ",", "header": False},
    "CSVWithNames": {"sep": ",", "header": True},
}

FORMATS = sorted(
    list(_TSV_FAMILY)
    + ["JSONEachRow", "TSKV", "Values", "Pretty", "PrettyCompact", "Vertical",
       "JSON", "JSONCompact", "XML", "Null"]
)


# ------------------------------------------------------------------ read


def read_format(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: StructType | str | None = None,
) -> DataFrame:
    """Distributed read of an interchange format into a DataFrame."""
    if fmt in _TSV_FAMILY:
        opts = _TSV_FAMILY[fmt]
        reader = spark.read.option("sep", opts["sep"]).option(
            "header", str(opts["header"]).lower()
        )
        if schema is not None:
            reader = reader.schema(schema)
        else:
            reader = reader.option("inferSchema", "true")
        return reader.csv(path)
    if fmt == "JSONEachRow":
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.json(path)
    if fmt == "TSKV":
        return _read_tskv(spark, path, schema)
    if fmt == "Values":
        return _read_values(spark, path, schema)
    raise ValueError(f"unsupported read format {fmt!r} (supported: {FORMATS})")


def _read_tskv(
    spark: SparkSession, path: str, schema: StructType | str | None
) -> DataFrame:
    """TSKV: ``k=v<TAB>k=v`` lines.  Parsed JVM-side: split on tabs,
    str_to_map, then typed extraction — no Python in the scan."""
    raw = spark.read.text(path)
    kv = raw.select(
        F.str_to_map(F.col("value"), F.lit("\t"), F.lit("=")).alias("m")
    )
    if schema is None:
        return kv
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    cols = [
        F.element_at(F.col("m"), f.name).cast(f.dataType).alias(f.name)
        for f in schema.fields
    ]
    return kv.select(*cols)


def _read_values(
    spark: SparkSession, path_or_text: str, schema: StructType | str | None
) -> DataFrame:
    """Values: ``(v, ...), (v, ...)`` — the reference's INSERT literal
    format (small payloads by design); parsed on the driver."""
    import ast
    import os

    if os.path.exists(path_or_text):
        with open(path_or_text) as f:
            text = f.read()
    else:
        text = path_or_text
    rows = list(ast.literal_eval(f"[{text.strip().rstrip(',')}]"))
    rows = [r if isinstance(r, tuple) else (r,) for r in rows]
    if schema is not None:
        return spark.createDataFrame(rows, schema)
    return spark.createDataFrame(rows)


# ----------------------------------------------------------------- write


def write_format(df: DataFrame, path: str, fmt: str, mode: str = "overwrite") -> None:
    """Distributed write of a DataFrame in an interchange format."""
    if fmt in _TSV_FAMILY:
        opts = _TSV_FAMILY[fmt]
        (
            df.write.mode(mode)
            .option("sep", opts["sep"])
            .option("header", str(opts["header"]).lower())
            .csv(path)
        )
        return
    if fmt == "JSONEachRow":
        df.write.mode(mode).json(path)
        return
    if fmt == "TSKV":
        line = F.concat_ws(
            "\t",
            *[
                F.concat(F.lit(c), F.lit("="), F.col(c).cast("string"))
                for c in df.columns
            ],
        )
        df.select(line.alias("value")).write.mode(mode).text(path)
        return
    if fmt == "Null":  # StorageFactory.cpp:402 — discard
        df.foreach(lambda _: None)
        return
    raise ValueError(f"unsupported write format {fmt!r}")


# --------------------------------------------------------------- display


def format_result(
    df: DataFrame, fmt: str, max_rows: int = 10000, totals: bool = False
) -> str:
    """Render a (small) result the way the reference's output formats do.

    Collects up to ``max_rows`` — display formats are a client concern,
    same as Pretty*/Vertical/JSON in the reference (output-only,
    FormatFactory.cpp).

    ``totals``: the LAST collected row is a WITH TOTALS row (the
    translator orders totals last); TabSeparated writes it as its own
    block after an empty separator line, with NULLed grouping keys
    rendered as their type defaults (TotalsHaving fills key columns
    with default values)."""
    rows = df.limit(max_rows).collect()
    names = df.columns
    types = [f.dataType.simpleString() for f in df.schema.fields]

    if totals and rows and fmt in ("TabSeparated", "TSV"):
        body, trow = rows[:-1], rows[-1]
        tcells = [
            _tsv_cell(_totals_default(trow[n], t))
            for n, t in zip(names, types)
        ]
        return (
            "".join(
                "\t".join(_tsv_cell(r[n]) for n in names) + "\n"
                for r in body
            )
            + "\n"
            + "\t".join(tcells)
            + "\n"
        )

    if fmt in ("Pretty", "PrettyCompact"):
        return _pretty(names, rows, compact=fmt == "PrettyCompact")
    if fmt == "Vertical":
        out = []
        for i, r in enumerate(rows):
            out.append(f"Row {i + 1}:")
            width = max((len(n) for n in names), default=0)
            for n in names:
                out.append(f"{n.rjust(width)}: {_cell(r[n])}")
            out.append("")
        return "\n".join(out).rstrip() + "\n"
    if fmt in ("JSON", "JSONCompact"):
        meta = [{"name": n, "type": t} for n, t in zip(names, types)]
        if fmt == "JSON":
            data = [{n: _jsonable(r[n]) for n in names} for r in rows]
        else:
            data = [[_jsonable(r[n]) for n in names] for r in rows]
        return json.dumps(
            {"meta": meta, "data": data, "rows": len(rows)}, indent=1, default=str
        )
    if fmt == "JSONEachRow":
        return "\n".join(
            json.dumps({n: _jsonable(r[n]) for n in names}, default=str) for r in rows
        )
    if fmt == "Values":
        return ", ".join(
            "(" + ", ".join(_sql_literal(r[n]) for n in names) + ")" for r in rows
        )
    if fmt in ("TabSeparated", "TSV"):
        # every row newline-terminated (IO/WriteHelpers.h writeChar after
        # each row) — zero rows is the empty string, one empty-string
        # cell is a single blank line; they must stay distinguishable
        return "".join(
            "\t".join(
                _tsv_cell(_f32(r[n], t)) for n, t in zip(names, types)
            )
            + "\n"
            for r in rows
        )
    if fmt == "XML":
        out = ["<result>"]
        for r in rows:
            out.append(" <row>")
            for n in names:
                out.append(f"  <{n}>{_cell(r[n])}</{n}>")
            out.append(" </row>")
        out.append("</result>")
        return "\n".join(out)
    raise ValueError(f"unsupported display format {fmt!r}")


def _totals_default(v, spark_type: str):
    """NULLed grouping key in the totals row → the column type's
    default value (TotalsHavingBlockInputStream fills key columns with
    defaults; non-key NULLs cannot occur in non-Nullable output)."""
    if v is not None:
        return v
    t = spark_type.lower()
    if t in ("tinyint", "smallint", "int", "bigint") or t.startswith("decimal"):
        return 0
    if t in ("float", "double"):
        return 0.0
    if t == "string":
        return ""
    if t == "date":
        import datetime as _dt

        return _dt.date(1970, 1, 1)
    if t.startswith("timestamp"):
        import datetime as _dt

        return _dt.datetime(1970, 1, 1, 0, 0, 0)
    if t.startswith("array"):
        return []
    return v


def _pretty(names: list[str], rows, compact: bool) -> str:
    cells = [[_cell(r[n]) for n in names] for r in rows]
    widths = [
        max([len(n)] + [len(c[i]) for c in cells]) for i, n in enumerate(names)
    ]
    def line(l, m, r):
        return l + m.join("─" * (w + 2) for w in widths) + r
    header = "│" + "│".join(f" {n.ljust(w)} " for n, w in zip(names, widths)) + "│"
    body = [
        "│" + "│".join(f" {c.ljust(w)} " for c, w in zip(row, widths)) + "│"
        for row in cells
    ]
    if compact:
        return "\n".join([line("┌", "┬", "┐"), header, line("├", "┼", "┤"), *body, line("└", "┴", "┘")])
    sep = line("├", "┼", "┤")
    parts = [line("┌", "┬", "┐"), header, sep]
    for b in body:
        parts.append(b)
    parts.append(line("└", "┴", "┘"))
    return "\n".join(parts)


def _ch_date_text(v) -> str:
    """Date/DateTime text form.  The zero value (epoch) prints as
    0000-00-00 — CH stores Date as days-since-epoch and renders 0
    specially (IO/WriteHelpers.h writeDateText), so 1970-01-01 is
    indistinguishable from the zero date there too."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        naive = v.replace(tzinfo=None)
        if naive == _dt.datetime(1970, 1, 1):
            return "0000-00-00 00:00:00"
        return naive.strftime("%Y-%m-%d %H:%M:%S")
    if v == _dt.date(1970, 1, 1):
        return "0000-00-00"
    return v.isoformat()


def _cell(v) -> str:
    import datetime as _dt

    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float):
        return _ch_float(v)
    if isinstance(v, (_dt.date, _dt.datetime)):
        return _ch_date_text(v)
    # Row subclasses tuple — check it first so structs render (…)
    from pyspark.sql import Row

    if isinstance(v, Row):
        return _ch_composite(tuple(v), parens=True)
    if isinstance(v, (list, tuple)):
        return _ch_composite(v)
    return str(v)


def _ch_float(v: float) -> str:
    """Float text like the reference's writeFloatText
    (IO/WriteHelpers.h): integral doubles print without '.0',
    nan/inf by name."""
    if v != v:
        return "nan"
    if v == float("inf"):
        return "inf"
    if v == float("-inf"):
        return "-inf"
    if v == int(v) and abs(v) < 1e16:
        return str(int(v))
    return repr(v)


def _ch_composite(v, parens: bool = False) -> str:
    """Array/tuple text form (DataTypeArray/DataTypeTuple text serde):
    no spaces, strings single-quoted with backslash escapes."""
    inner = ",".join(_ch_nested(x) for x in v)
    return f"({inner})" if parens else f"[{inner}]"


def _ch_nested(x) -> str:
    import datetime as _dt

    if isinstance(x, (_dt.date, _dt.datetime)):
        # dates/datetimes quote like strings inside composites
        # (DataTypeDate::serializeTextQuoted)
        return f"'{_ch_date_text(x)}'"
    if isinstance(x, str):
        esc = (
            x.replace("\\", "\\\\")
            .replace("'", "\\'")
            .replace("\t", "\\t")
            .replace("\n", "\\n")
            .replace("\r", "\\r")
            .replace("\x00", "\\0")
            .replace("\b", "\\b")
            .replace("\f", "\\f")
        )
        return f"'{esc}'"
    if x is None:
        return "NULL"
    return _cell(x)


def _f32(v, spark_type: str):
    """Float32 columns print with FLOAT precision (the reference's
    shortest-roundtrip Float32 text, WriteHelpers writeFloatText):
    21.99f must render 21.99, not the double-widened
    21.989999771118164."""
    if spark_type == "float" and isinstance(v, float):
        try:
            import numpy as _np

            return float(repr(_np.float32(v)))
        except Exception:
            return v
    if (
        spark_type == "array<float>"
        and isinstance(v, list)
    ):
        try:
            import numpy as _np

            return [
                float(repr(_np.float32(x))) if isinstance(x, float) else x
                for x in v
            ]
        except Exception:
            return v
    return v


def _tsv_cell(v) -> str:
    """TabSeparated escapes embedded separators in string values
    (IO/WriteHelpers.h writeEscapedString = writeAnyEscapedString<'\\''>:
    \\, tab, newline, AND single quotes) — without this a value
    containing a tab corrupts the column structure, and a quote
    diverges from the reference's byte output."""
    s = _cell(v)
    if isinstance(v, str):
        s = (
            s.replace("\\", "\\\\")
            .replace("'", "\\'")
            .replace("\t", "\\t")
            .replace("\n", "\\n")
            .replace("\r", "\\r")
            .replace("\x00", "\\0")
            .replace("\b", "\\b")
            .replace("\f", "\\f")
        )
    return s


def _jsonable(v):
    if isinstance(v, (list, dict, int, float, str, bool)) or v is None:
        return v
    return str(v)


def _sql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "\\'") + "'"
    return str(v)
