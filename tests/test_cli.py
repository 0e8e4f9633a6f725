"""CLI helpers (clickhouse-local analog, __main__.py)."""

from __future__ import annotations

from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.__main__ import (
    _split,
    extract_format,
)


def test_extract_format():
    body, fmt = extract_format("SELECT 1 FORMAT JSON")
    assert body == "SELECT 1" and fmt == "JSON"
    body, fmt = extract_format("SELECT 1")
    assert body == "SELECT 1" and fmt is None
    # FORMAT inside a subquery must not be stripped
    body, fmt = extract_format("SELECT * FROM (SELECT 1) x")
    assert fmt is None


def test_split_statements():
    assert _split("SELECT 1; SELECT 2;") == ["SELECT 1", "SELECT 2"]
    assert _split("SELECT 'a;b'; SELECT 2") == ["SELECT 'a;b'", "SELECT 2"]


def test_extract_format_offset_robust():
    # identifier containing FORMAT before the real clause (ADVICE regression)
    body, fmt = extract_format("SELECT my_format FROM t FORMAT JSON")
    assert body == "SELECT my_format FROM t" and fmt == "JSON"
    # trailing comment mentioning FORMAT after the real clause
    body, fmt = extract_format("SELECT 1 FORMAT JSON -- prefer FORMAT Pretty")
    assert body == "SELECT 1" and fmt == "JSON"
    # column literally named format, no clause
    body, fmt = extract_format("SELECT format FROM t")
    assert fmt is None
