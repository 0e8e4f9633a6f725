"""Non-SELECT statements: CREATE TABLE / INSERT / DROP / SET.

Reference: Interpreters/InterpreterFactory.cpp dispatches on AST node
type — InterpreterCreateQuery (Parsers/ParserCreateQuery.cpp schema +
ENGINE clause), InterpreterInsertQuery (VALUES / INSERT SELECT), Drop.
Here a created table is a named DataFrame (temp view) plus TableMeta
derived from the classic MergeTree-family engine arguments
(StorageFactory.cpp:242-859); INSERT unions new rows in and re-registers
the view — the Spark analog of appending a part.

CH semantics kept:
- column types map per §1.2 (UInt widened one size, Enum8/16 stored as
  the NAME string with insert-time value→name mapping, Nullable as the
  nullable flag, FixedString zero-padded);
- INSERT with a column subset fills the others with TYPE DEFAULTS
  (0 / '' / [] — ColumnDefault.h: missing means default, never NULL);
- Replacing/Collapsing/Summing engine args land in TableMeta so FINAL
  works on the created table.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .lexer import Token, tokenize
from .translate import TableMeta, _match_paren, _split_top

__all__ = ["execute_statement", "TableDef"]


_NUM_TYPES = {
    "UINT8": "SMALLINT", "UINT16": "INT", "UINT32": "BIGINT",
    "UINT64": "BIGINT", "INT8": "TINYINT", "INT16": "SMALLINT",
    "INT32": "INT", "INT64": "BIGINT", "FLOAT32": "FLOAT",
    "FLOAT64": "DOUBLE",
}
_TYPE_DEFAULTS = {
    "SMALLINT": "0", "INT": "0", "BIGINT": "0", "TINYINT": "0",
    "FLOAT": "0.0", "DOUBLE": "0.0", "STRING": "''",
    "DATE": "DATE'1970-01-01'", "TIMESTAMP": "TIMESTAMP'1970-01-01 00:00:00'",
}


@dataclass
class ColumnDef:
    name: str
    spark_type: str          # Spark SQL type text
    wrapper: str | None = None  # value transform template with {v}
    default: str | None = None  # type-specific default (Enum: first name)

    def default_sql(self) -> str:
        if self.default is not None:
            return self.default
        if self.spark_type.startswith("ARRAY"):
            return f"CAST(array() AS {self.spark_type})"
        return _TYPE_DEFAULTS.get(self.spark_type, "NULL")


@dataclass
class TableDef:
    name: str
    columns: list[ColumnDef]
    engine: str
    meta: TableMeta


def _ch_type(toks: list[Token]) -> ColumnDef | None:
    """Parse one CH type spec into (spark type, optional insert wrap)."""
    if not toks:
        return None
    up = toks[0].text.upper()
    if len(toks) == 1:
        if up in _NUM_TYPES:
            return ColumnDef("", _NUM_TYPES[up])
        if up == "STRING":
            return ColumnDef("", "STRING")
        if up == "DATE":
            return ColumnDef("", "DATE")
        if up == "DATETIME":
            return ColumnDef("", "TIMESTAMP")
        return None
    if toks[1].text != "(":
        return None
    args = _split_top(toks[2:-1], ",")
    if up == "NULLABLE":
        return _ch_type(args[0])
    if up == "FIXEDSTRING":
        n = args[0][0].text
        return ColumnDef("", "STRING", wrapper=f"rpad(CAST({{v}} AS STRING), {n}, chr(0))")
    if up in ("ENUM8", "ENUM16"):
        whens, names = [], []
        for pair in args:
            name_tok = pair[0].text
            val = pair[-1].text
            if len(pair) >= 2 and pair[-2].text == "-":
                val = "-" + val
            names.append(name_tok)
            whens.append(f"WHEN ({{v}}) = {val} THEN {name_tok}")
        ladder = " ".join(whens)
        in_names = ", ".join(names)
        return ColumnDef(
            "",
            "STRING",
            wrapper=(
                f"(CASE WHEN CAST({{v}} AS STRING) IN ({in_names}) "
                f"THEN CAST({{v}} AS STRING) {ladder} END)"
            ),
            default=names[0],  # DataTypeEnum default = first member
        )
    if up == "ARRAY":
        elem = _ch_type(args[0])
        if elem is None or elem.wrapper is not None:
            return None
        return ColumnDef("", f"ARRAY<{elem.spark_type}>")
    if up == "AGGREGATEFUNCTION":
        return None
    return None


def _parse_columns(toks: list[Token]) -> list[ColumnDef] | None:
    cols: list[ColumnDef] = []
    for item in _split_top(toks, ","):
        if not item:
            return None
        name = item[0].text
        # strip DEFAULT/MATERIALIZED/ALIAS expressions (ColumnDefault.h)
        type_toks = item[1:]
        for k, t in enumerate(type_toks):
            if t.is_kw("DEFAULT", "MATERIALIZED", "ALIAS"):
                type_toks = type_toks[:k]
                break
        cd = _ch_type(type_toks)
        if cd is None:
            return None
        cd.name = name
        cols.append(cd)
    return cols


def _engine_meta(engine: str, args: list[list[Token]]) -> TableMeta:
    """Classic engine-argument syntax (StorageFactory.cpp):
    MergeTree(date, (pk...), granularity);
    ReplacingMergeTree(date, (pk...), granularity[, version]);
    CollapsingMergeTree(date, (pk...), granularity, sign);
    SummingMergeTree(date, (pk...), granularity[, (sum cols)])."""
    meta = TableMeta(engine=engine)

    def key_of(toks: list[Token]) -> tuple[str, ...]:
        if toks and toks[0].text == "(":
            return tuple(
                t[0].text for t in _split_top(toks[1:-1], ",") if t
            )
        return (toks[0].text,) if toks else ()

    if engine.endswith("MergeTree") and args:
        if len(args) >= 2:
            meta.primary_key = key_of(args[1])
        if engine == "ReplacingMergeTree" and len(args) >= 4:
            meta.version_col = args[3][0].text
        if engine == "CollapsingMergeTree" and len(args) >= 4:
            meta.sign_col = args[3][0].text
    return meta


def execute_statement(engine, ch_sql: str) -> DataFrame | None:
    """Execute one CH statement.  Returns a DataFrame for SELECTs,
    None for DDL/DML/SET.  ``engine`` is the owning ChEngine."""
    tokens = tokenize(ch_sql)
    while tokens and tokens[-1].text == ";":
        tokens = tokens[:-1]
    if not tokens:
        return None
    head = tokens[0].text.upper()
    if head == "SELECT" or tokens[0].is_kw("WITH"):
        return engine.spark.sql(engine.translate(ch_sql))
    if head == "SET":
        return None  # settings are advisory (Settings.h) — no-op
    if head == "CREATE":
        return _create(engine, tokens)
    if head == "INSERT":
        return _insert(engine, tokens)
    if head == "DROP":
        return _drop(engine, tokens)
    raise ValueError(f"unsupported statement kind: {head}")


def _table_name(tokens: list[Token], i: int) -> tuple[str, int]:
    """Dotted CH table name (db.t) — kept dotted as the canonical key;
    the temp view uses a dot-free twin (db__t)."""
    name = tokens[i].text
    if i + 2 < len(tokens) and tokens[i + 1].text == ".":
        name = f"{name}.{tokens[i + 2].text}"
        i += 2
    return name, i + 1


def _view_of(name: str) -> str:
    return name.replace(".", "__")


def _create(engine, tokens: list[Token]) -> None:
    i = 1
    assert tokens[i].is_kw("TABLE"), "only CREATE TABLE is supported"
    i += 1
    if tokens[i].is_kw("IF"):
        i += 3  # IF NOT EXISTS
    name, i = _table_name(tokens, i)
    assert tokens[i].text == "(", "CREATE TABLE needs a column list"
    close = _match_paren(tokens, i)
    cols = _parse_columns(tokens[i + 1 : close])
    if cols is None:
        raise ValueError("unsupported column type in CREATE TABLE")
    i = close + 1
    eng_name, eng_args = "Memory", []
    if i < len(tokens) and tokens[i].is_kw("ENGINE"):
        i += 2  # ENGINE =
        eng_name = tokens[i].text
        i += 1
        if i < len(tokens) and tokens[i].text == "(":
            ec = _match_paren(tokens, i)
            eng_args = _split_top(tokens[i + 1 : ec], ",")
    meta = _engine_meta(eng_name, eng_args)
    ddl = ", ".join(f"`{c.name}` {c.spark_type}" for c in cols)
    df = engine.spark.createDataFrame([], ddl)
    view = _view_of(name)
    engine.tables[name] = TableDef(name, cols, eng_name, meta)
    engine.table_views[name] = view
    engine.table_meta[view] = meta  # FINAL looks up by rendered name
    engine.register_table(view, df, meta)


def _drop(engine, tokens: list[Token]) -> None:
    i = 1
    assert tokens[i].is_kw("TABLE")
    i += 1
    if tokens[i].is_kw("IF"):
        i += 2  # IF EXISTS
    name, _ = _table_name(tokens, i)
    engine.tables.pop(name, None)
    view = engine.table_views.pop(name, _view_of(name))
    engine.table_meta.pop(view, None)
    engine.spark.catalog.dropTempView(view)


def _insert(engine, tokens: list[Token]) -> None:
    from .translate import Ctx, _rewrite, _translate_union

    i = 1
    assert tokens[i].is_kw("INTO")
    i += 1
    name, i = _table_name(tokens, i)
    tdef = engine.tables.get(name)
    if tdef is None:
        raise ValueError(f"INSERT into unknown table {name!r}")
    subset = [c.name for c in tdef.columns]
    if tokens[i].text == "(":
        close = _match_paren(tokens, i)
        subset = [t[0].text for t in _split_top(tokens[i + 1 : close], ",")]
        i = close + 1
    ctx = Ctx(table_meta=engine.table_meta, columns_of=engine._columns_of,
              dictionaries=engine.dictionaries, table_views=engine.table_views)
    if tokens[i].is_kw("VALUES"):
        rows_sql = []
        k = i + 1
        while k < len(tokens):
            assert tokens[k].text == "(", "VALUES expects tuples"
            close = _match_paren(tokens, k)
            vals = [
                _rewrite(v, ctx)
                for v in _split_top(tokens[k + 1 : close], ",")
            ]
            rows_sql.append(f"({', '.join(vals)})")
            k = close + 1
            if k < len(tokens) and tokens[k].text == ",":
                k += 1
        aliases = ", ".join(f"c{j}" for j in range(len(subset)))
        src = f"SELECT * FROM (VALUES {', '.join(rows_sql)}) AS __v({aliases})"
        new_df = engine.spark.sql(src)
    elif tokens[i].is_kw("SELECT") or tokens[i].text == "(":
        sub = _translate_union(tokens[i:], ctx)
        new_df = engine.spark.sql(sub)
    else:
        raise ValueError("INSERT expects VALUES or SELECT")

    # project into the full schema: subset columns (wrapped/cast), the
    # rest type defaults (ColumnDefault.h: missing = default, not NULL)
    view = engine.table_views.get(name, _view_of(name))
    new_df.createOrReplaceTempView(f"__ins_{view}")
    sel = []
    src_cols = new_df.columns
    for c in tdef.columns:
        if c.name in subset:
            src = f"`{src_cols[subset.index(c.name)]}`"
            v = c.wrapper.format(v=src) if c.wrapper else src
            sel.append(f"CAST({v} AS {c.spark_type}) AS `{c.name}`")
        else:
            sel.append(f"CAST({c.default_sql()} AS {c.spark_type}) AS `{c.name}`")
    shaped = engine.spark.sql(
        f"SELECT {', '.join(sel)} FROM __ins_{view}"
    )
    existing = engine.spark.table(view)
    # break lineage: the re-registered view must not reference itself
    merged = existing.unionByName(shaped).localCheckpoint(eager=True)
    engine.register_table(view, merged, tdef.meta)
