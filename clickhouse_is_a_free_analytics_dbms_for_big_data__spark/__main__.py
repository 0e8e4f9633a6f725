"""CLI entry — the clickhouse-local analog (reference:
Server/LocalServer.cpp runs executeQuery against a local context; here
the local context is a SparkSession over a parquet directory).

    python -m clickhouse_is_a_free_analytics_dbms_for_big_data__spark \
        -q "SELECT count() FROM lineitem FORMAT Pretty" \
        [--data-dir /root/testdata/sf0.001] [--format TabSeparated]

A trailing ``FORMAT X`` clause in the query wins over --format,
mirroring the reference's query-level FORMAT (ParserQueryWithOutput).
Reads statements from stdin when -q is absent (';'-separated).
"""

from __future__ import annotations

import argparse
import sys

from . import get_session, register_tables
from .dialect import ChEngine, TableMeta
from .dialect.lexer import tokenize
from .sources.formats import format_result


def extract_format(sql: str) -> tuple[str, str | None]:
    """Split a trailing top-level ``FORMAT <name>`` off the query."""
    try:
        tokens = tokenize(sql)
    except ValueError:
        return sql, None
    # the reference's FORMAT clause is trailing (ParserQueryWithOutput):
    # match only a final top-level "FORMAT <name>" and cut at the
    # keyword token's recorded offset (comments after it are dropped by
    # the tokenizer, so rfind-style text scans are never needed).
    if len(tokens) >= 2 and tokens[-2].is_kw("FORMAT") and tokens[-1].kind == "ident":
        depth = 0
        for t in tokens[:-2]:
            if t.text == "(":
                depth += 1
            elif t.text == ")":
                depth -= 1
        if depth == 0:
            return sql[: tokens[-2].pos].rstrip(), tokens[-1].text
    return sql, None


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="clickhouse_is_a_free_analytics_dbms_for_big_data__spark",
        description="CH-dialect SQL over parquet tables (Spark-backed).",
    )
    ap.add_argument("-q", "--query", help="query text; stdin if omitted")
    ap.add_argument(
        "--data-dir",
        default="/root/testdata/sf0.001",
        help="directory of <table>.parquet files to register",
    )
    ap.add_argument("--format", default="PrettyCompact", help="default output format")
    ap.add_argument("--max-rows", type=int, default=10000)
    args = ap.parse_args(argv)

    spark = get_session(app_name="ch-local")
    register_tables(spark, args.data_dir)
    eng = ChEngine(spark)
    eng.set_meta("events", TableMeta(sample_key="user_id"))

    text = args.query if args.query is not None else sys.stdin.read()
    rc = 0
    for stmt in _split(text):
        body, fmt = extract_format(stmt)
        try:
            df = eng.sql(body)
            print(format_result(df, fmt or args.format, max_rows=args.max_rows))
        except Exception as e:  # surface engine errors like the client does
            print(f"Error: {e}", file=sys.stderr)
            rc = 1
    spark.stop()
    return rc


def _split(text: str) -> list[str]:
    stmts, cur, in_str = [], [], False
    i = 0
    while i < len(text):
        ch = text[i]
        if in_str and ch == "\\":
            cur.append(text[i : i + 2])
            i += 2
            continue
        if ch == "'":
            in_str = not in_str
        if ch == ";" and not in_str:
            stmts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    stmts.append("".join(cur))
    return [s.strip() for s in stmts if s.strip()]


if __name__ == "__main__":
    raise SystemExit(main())
