"""I/O format tests (reference FormatFactory.cpp surface)."""

from __future__ import annotations

import json
import os

import pytest

from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.sources.formats import (
    format_result,
    read_format,
    write_format,
)


@pytest.fixture(scope="module")
def sample(spark):
    return spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", 2.5), (3, "gam ma", 3.5)],
        "id INT, name STRING, score DOUBLE",
    )


SCHEMA = "id INT, name STRING, score DOUBLE"


@pytest.mark.parametrize(
    "fmt", ["TabSeparated", "TabSeparatedWithNames", "CSVWithNames", "JSONEachRow", "TSKV"]
)
def test_roundtrip(spark, sample, fmt, tmp_path):
    path = str(tmp_path / fmt)
    write_format(sample, path, fmt)
    back = read_format(spark, path, fmt, schema=SCHEMA)
    got = sorted((r["id"], r["name"], r["score"]) for r in back.collect())
    exp = sorted((r["id"], r["name"], r["score"]) for r in sample.collect())
    assert got == exp


def test_headerless_tsv_positional(spark, sample, tmp_path):
    path = str(tmp_path / "tsv")
    write_format(sample, path, "TSV")
    back = read_format(spark, path, "TSV", schema=SCHEMA)
    assert back.count() == 3 and back.columns == ["id", "name", "score"]


def test_values_literal(spark):
    df = read_format(spark, "(1, 'a'), (2, 'b')", "Values", schema="id INT, s STRING")
    assert sorted((r["id"], r["s"]) for r in df.collect()) == [(1, "a"), (2, "b")]


def test_values_file(spark, tmp_path):
    p = tmp_path / "vals.txt"
    p.write_text("(10, 'x'), (20, 'y'),")
    df = read_format(spark, str(p), "Values", schema="id INT, s STRING")
    assert df.count() == 2


def test_pretty(sample):
    out = format_result(sample.orderBy("id"), "Pretty")
    assert "│" in out and "alpha" in out and out.count("\n") >= 5


def test_vertical(sample):
    out = format_result(sample.orderBy("id").limit(1), "Vertical")
    # reference VerticalRowOutputStream pads 'name: ' labels to the
    # widest name (left-aligned) under a dash rule
    assert "Row 1:" in out and "name:  alpha" in out and "──────" in out


def test_json_document(sample):
    out = json.loads(format_result(sample, "JSON"))
    assert out["rows"] == 3
    assert {m["name"] for m in out["meta"]} == {"id", "name", "score"}
    assert out["data"][0]["id"] in (1, 2, 3)


def test_json_compact(sample):
    out = json.loads(format_result(sample, "JSONCompact"))
    assert isinstance(out["data"][0], list) and len(out["data"][0]) == 3


def test_values_output(sample):
    out = format_result(sample.orderBy("id").limit(1), "Values")
    assert out == "(1, 'alpha', 1.5)"


def test_xml(sample):
    out = format_result(sample.limit(1), "XML")
    # CH-exact writer (XMLRowOutputStream.cpp): declaration + meta block
    assert out.startswith("<?xml version='1.0' encoding='UTF-8' ?>\n<result>")
    assert "<name>id</name>" in out and "<id>" in out


def test_null_sink(sample, tmp_path):
    write_format(sample, str(tmp_path / "ignored"), "Null")
    assert not os.path.exists(str(tmp_path / "ignored"))


def test_unknown_format(spark, sample):
    with pytest.raises(ValueError):
        read_format(spark, "/tmp/x", "Protobuf")
    with pytest.raises(ValueError):
        write_format(sample, "/tmp/x", "Native")


# ------------------------------------------------------- Native format


def test_native_known_bytes(spark):
    """Hand-computed vector (NativeBlockOutputStream::write, revision
    0): varint cols/rows, then per column name + type + column-wise
    data."""
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.sources.formats import (
        format_result,
    )

    df = spark.createDataFrame([(1, "ab"), (2, "c")], "x INT, s STRING")
    out = format_result(
        df, "Native", ch_types=["Int32", "String"]
    ).encode("utf-8", "surrogateescape")
    exp = (
        b"\x02"              # 2 columns
        b"\x02"              # 2 rows
        b"\x01x"             # name "x"
        b"\x05Int32"         # type
        b"\x01\x00\x00\x00\x02\x00\x00\x00"   # 1, 2 LE
        b"\x01s"             # name "s"
        b"\x06String"        # type
        b"\x02ab\x01c"       # varint-length strings
    )
    assert out == exp


def test_native_roundtrip_nullable_array(spark):
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.sources.formats import (
        format_result,
        parse_native,
    )

    df = spark.createDataFrame(
        [(1, None, [1, 2]), (2, "hi", []), (3, "yo", [7])],
        "id BIGINT, s STRING, a ARRAY<INT>",
    )
    blob = format_result(
        df, "Native",
        ch_types=["UInt64", "Nullable(String)", "Array(Int32)"],
    ).encode("utf-8", "surrogateescape")
    names, ch_types, rows = parse_native(blob)
    assert names == ["id", "s", "a"]
    assert ch_types == ["UInt64", "Nullable(String)", "Array(Int32)"]
    assert sorted(rows) == [(1, None, [1, 2]), (2, "hi", []), (3, "yo", [7])]


def test_native_respects_block_structure(spark):
    """INSERT-recorded block boundaries produce one Native block each
    (the reference streams blocks; a 3+1 split must not merge)."""
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.sources.formats import (
        format_result,
        parse_native,
    )

    df = spark.createDataFrame([(i,) for i in range(4)], "v INT")
    blob = format_result(
        df, "Native", ch_types=["Int32"], block_rows=[3, 1]
    ).encode("utf-8", "surrogateescape")
    # two block headers: count occurrences of the column descriptor
    assert blob.count(b"\x01v\x05Int32") == 2
    names, ch_types, rows = parse_native(blob)
    assert sorted(rows) == [(0,), (1,), (2,), (3,)]


def test_native_empty_result(spark):
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.sources.formats import (
        format_result,
        parse_native,
    )

    df = spark.createDataFrame([], "v INT")
    blob = format_result(df, "Native", ch_types=["Int32"]).encode(
        "utf-8", "surrogateescape"
    )
    names, ch_types, rows = parse_native(blob)
    assert names == ["v"] and rows == []
