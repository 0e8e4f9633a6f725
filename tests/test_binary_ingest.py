"""Binary wire-format INGEST (the input direction of
FormatFactory.cpp's both-way Native/RowBinary registration):
``ChEngine.insert_native`` / ``insert_rowbinary`` / ``read_native``.

Round-trip contract: ``_render_native`` output -> ``parse_native`` ->
DataFrame -> re-render is byte-identical, and a RowBinary payload
inserted into a table reads back exactly through the dialect."""

from __future__ import annotations

import pytest

from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.dialect import (
    ChEngine,
)
from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.sources.formats import (
    format_result,
    parse_native,
    parse_rowbinary,
)


@pytest.fixture(scope="module")
def eng(spark):
    return ChEngine(spark)


def _tsv(eng, q):
    df = eng.execute(q)
    return format_result(
        df, "TabSeparated", ch_types=getattr(eng, "last_out_ch_types", None)
    ).strip()


def test_rowbinary_parse_roundtrip():
    # writer -> reader twin over every RowBinary scalar family
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.sources.formats import (
        _rb_value,
    )

    types = [
        "UInt32", "Int64", "Float64", "String", "Date", "DateTime",
        "Nullable(String)", "Array(UInt16)", "FixedString(3)",
    ]
    rows = [
        (7, -9, 1.5, "héllo", 17897, 1546300800, None, [1, 2, 3], "abc"),
        (0, 2**62, -0.25, "", 0, 0, "x", [], "z\x00\x00"),
    ]
    out = bytearray()
    for r in rows:
        for v, t in zip(r, types):
            _rb_value(out, v, t)
    got = parse_rowbinary(bytes(out), types)
    assert got == [tuple(r) for r in rows]


def test_rowbinary_nullable_wire_format_matches_reference():
    """A set null flag is the ENTIRE encoding of a NULL — no value
    payload follows (DataTypeNullable::serializeBinary writes the
    nested value only when !is_null; deserializeBinary's
    safeDeserialize reads nothing after a flag of 1).  Pinned to
    hand-written byte sequences matching the reference wire format so
    the writer/reader twins can't drift together."""
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.sources.formats import (
        _rb_value,
    )

    types = ["Nullable(UInt32)", "Nullable(String)", "UInt8"]
    # row 1: (NULL, "ab", 7)  row 2: (5, NULL, 9)
    ref_bytes = bytes(
        [1]                                # NULL -> flag only
        + [0, 0x61, 0x62][:0]              # (nothing for the null)
        + [0, 2, 0x61, 0x62]               # "ab" -> flag 0, varint 2, bytes
        + [7]
        + [0, 5, 0, 0, 0]                  # 5 -> flag 0, u32 LE
        + [1]                              # NULL -> flag only
        + [9]
    )
    assert parse_rowbinary(ref_bytes, types) == [
        (None, "ab", 7), (5, None, 9),
    ]
    out = bytearray()
    for row in [(None, "ab", 7), (5, None, 9)]:
        for v, t in zip(row, types):
            _rb_value(out, v, t)
    assert bytes(out) == ref_bytes


def test_insert_rowbinary_into_table(eng):
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.sources.formats import (
        _rb_value,
    )

    eng.execute(
        "CREATE TABLE rb_t (x UInt32, s String, d Date) ENGINE = Memory"
    )
    payload = bytearray()
    for row in [(3, "c", 10), (1, "a", 0), (2, "béta", 400)]:
        for v, t in zip(row, ["UInt32", "String", "Date"]):
            _rb_value(payload, v, t)
    eng.insert_rowbinary("rb_t", bytes(payload))
    # Date 0 renders as the reference's zero date 0000-00-00
    assert _tsv(eng, "SELECT * FROM rb_t ORDER BY x") == (
        "1\ta\t0000-00-00\n"
        "2\tbéta\t1971-02-05\n"
        "3\tc\t1970-01-11"
    )


def test_insert_native_into_table_preserves_blocks(eng):
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.sources.formats import (
        _render_native,
    )

    eng.execute(
        "CREATE TABLE nat_t (k UInt16, v String) ENGINE = Memory"
    )
    rows = [(1, "one"), (2, "two"), (3, "three"), (4, "four")]
    blob = _render_native(
        rows, ["k", "v"], ["SMALLINT", "STRING"],
        ["UInt16", "String"], block_rows=[3, 1],
    ).encode("utf-8", "surrogateescape")
    eng.insert_native("nat_t", blob)
    assert _tsv(eng, "SELECT * FROM nat_t ORDER BY k") == (
        "1\tone\n2\ttwo\n3\tthree\n4\tfour"
    )
    # default settings: the ingest pipeline SQUASHES the small 3+1
    # blocks into one (SquashingBlockOutputStream under
    # min_insert_block_size_rows, InterpreterInsertQuery.cpp:102)
    assert _tsv(
        eng,
        "SELECT DISTINCT blockSize() AS b FROM nat_t ORDER BY b",
    ) == "4"
    # squashing disabled: per-block structure of the Native stream
    # survives ingest (one stored block per wire block)
    eng.execute("SET min_insert_block_size_rows = 1")
    eng.execute(
        "CREATE TABLE nat_t2 (k UInt16, v String) ENGINE = Memory"
    )
    try:
        eng.insert_native("nat_t2", blob)
        assert _tsv(
            eng,
            "SELECT DISTINCT blockSize() AS b FROM nat_t2 ORDER BY b",
        ) == "1\n3"
    finally:
        eng.execute("SET min_insert_block_size_rows = 1048576")


def test_native_render_parse_rerender_byte_identical(spark):
    """dump -> parse -> DataFrame -> re-dump is byte-identical (the
    reader and writer are exact twins)."""
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.sources.formats import (
        _render_native,
    )

    rows = [
        (1, "a", [10, 20], None),
        (2, "", [], 2.5),
        (3, "ccc", [7], -1.0),
    ]
    names = ["id", "s", "arr", "f"]
    ch_types = ["UInt64", "String", "Array(Int32)", "Nullable(Float64)"]
    blob1 = _render_native(
        rows, names, ["DECIMAL(20,0)", "STRING", "ARRAY<INT>", "DOUBLE"],
        ch_types,
    ).encode("utf-8", "surrogateescape")
    got_names, got_types, got_rows = parse_native(blob1)
    assert got_names == names and got_types == ch_types
    blob2 = _render_native(
        got_rows, got_names, [None] * 4, got_types
    ).encode("utf-8", "surrogateescape")
    assert blob1 == blob2


def test_read_native_dump(eng, tmp_path):
    """read_native over a file: schema comes from the stream."""
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.sources.formats import (
        _render_native,
    )

    rows = [(1, "x", 17897), (2, "y", 0)]
    blob = _render_native(
        rows, ["a", "b", "d"], [None] * 3, ["UInt32", "String", "Date"]
    ).encode("utf-8", "surrogateescape")
    p = tmp_path / "dump.native"
    p.write_bytes(blob)
    df = eng.read_native(str(p))
    got = sorted((r.a, r.b, str(r.d)) for r in df.collect())
    assert got == [(1, "x", "2019-01-01"), (2, "y", "1970-01-01")]


def _multi_block_dump(rows, block_rows):
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.sources.formats import (
        _render_native,
    )

    return _render_native(
        rows, ["k", "s", "arr", "f"], [None] * 4,
        ["UInt32", "String", "Array(Int16)", "Nullable(Float64)"],
        block_rows=block_rows,
    ).encode("utf-8", "surrogateescape")


def test_scan_native_blocks_boundaries():
    """The skip-only scanner finds exact block boundaries: spans tile
    the stream and each span independently re-parses to its rows."""
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.sources.formats import (
        scan_native_blocks,
    )

    rows = [(i, f"s{i}" * (i % 5), list(range(i % 4)), None if i % 3 else i / 2.0)
            for i in range(10)]
    blob = _multi_block_dump(rows, [4, 1, 5])
    spans = scan_native_blocks(blob)
    assert [nr for _o, _l, nr in spans] == [4, 1, 5]
    pos = 0
    seen = []
    for off, ln, nr in spans:
        assert off == pos
        _n, _t, blk_rows = parse_native(blob[off:off + ln])
        assert len(blk_rows) == nr
        seen.extend(blk_rows)
        pos = off + ln
    assert pos == len(blob)
    assert len(seen) == 10


def test_read_native_dist_executor_decode(eng, tmp_path):
    """Distributed dump replay: multi-file multi-block dir decodes
    EXECUTOR-side (MapInPandas; no data rows through driver
    createDataFrame), values equal the driver-side reader, and the
    lineage columns reproduce the dump byte-identically."""
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.sources.formats import (
        _render_native,
    )

    d = tmp_path / "dump"
    d.mkdir()
    all_rows = [
        (i, f"v{i}", list(range(i % 3)), None if i % 4 == 0 else i * 0.5)
        for i in range(20)
    ]
    files = {"a.native": (all_rows[:12], [5, 7]),
             "b.native": (all_rows[12:], [8])}
    for fname, (rows, blocks) in files.items():
        (d / fname).write_bytes(_multi_block_dump(rows, blocks))

    for split in (False, True):
        df = eng.read_native_dir(str(d), split_blocks=split, lineage=True)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan
        # only metadata (paths / spans) may driver-materialize: no
        # LocalTableScan line carries the data columns
        for line in plan.splitlines():
            if "LocalTableScan" in line:
                assert "arr" not in line and " s#" not in line, line
        got = df.collect()
        assert len(got) == 20
        # byte-identical re-render per file from lineage order
        for fname, (rows, blocks) in files.items():
            frows = sorted(
                (r for r in got if r._file.endswith(fname)),
                key=lambda r: (r._block, r._row_in_block),
            )
            rendered = _render_native(
                [(int(r.k), r.s, [int(e) for e in r.arr],
                  None if r.f is None else float(r.f)) for r in frows],
                ["k", "s", "arr", "f"], [None] * 4,
                ["UInt32", "String", "Array(Int16)", "Nullable(Float64)"],
                block_rows=list(blocks),
            ).encode("utf-8", "surrogateescape")
            assert rendered == (d / fname).read_bytes(), (fname, split)


def test_read_native_dist_matches_driver_reader(eng, tmp_path):
    rows = [(1, "x", [1], 0.5), (2, "y", [], None), (3, "z", [7, 8], 2.0)]
    blob = _multi_block_dump(rows, [2, 1])
    p = tmp_path / "one.native"
    p.write_bytes(blob)
    dist = sorted(
        (r.k, r.s, tuple(r.arr), r.f)
        for r in eng.read_native_dir(str(p), split_blocks=True).collect()
    )
    drv = sorted(
        (r.k, r.s, tuple(r.arr), r.f)
        for r in eng.read_native(str(p)).collect()
    )
    assert dist == drv


def test_insert_native_path_distributed(eng, tmp_path):
    """insert_native_path: dump replay into a table with the decode in
    executors, through the same _ingest_df pipeline (projection +
    defaults evaluated) — the scale path of insert_native."""
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.sources.formats import (
        _render_native,
    )

    eng.execute(
        "CREATE TABLE np_t (k UInt32, s String, twice UInt32 "
        "DEFAULT k * 2) ENGINE = Memory"
    )
    d = tmp_path / "npdump"
    d.mkdir()
    (d / "part1.native").write_bytes(
        _render_native([(1, "a"), (2, "b")], ["k", "s"], [None] * 2,
                       ["UInt32", "String"], block_rows=[1, 1]
        ).encode("utf-8", "surrogateescape")
    )
    (d / "part2.native").write_bytes(
        _render_native([(3, "c")], ["k", "s"], [None] * 2,
                       ["UInt32", "String"]
        ).encode("utf-8", "surrogateescape")
    )
    eng.insert_native_path("np_t", str(d), split_blocks=True)
    assert _tsv(eng, "SELECT k, s, twice FROM np_t ORDER BY k") == (
        "1\ta\t2\n2\tb\t4\n3\tc\t6"
    )


def test_insert_native_mergetree_parts(eng):
    """Native ingest through a MergeTree table records parts like a
    token-level INSERT (same _ingest_df pipeline)."""
    eng.execute(
        "CREATE TABLE nat_mt (d Date, k UInt32) "
        "ENGINE = MergeTree(d, k, 8192)"
    )
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.sources.formats import (
        _render_native,
    )

    blob = _render_native(
        [(17897, 5), (17898, 6)], ["d", "k"], [None, None],
        ["Date", "UInt32"],
    ).encode("utf-8", "surrogateescape")
    eng.insert_native("nat_mt", blob)
    assert _tsv(eng, "SELECT k FROM nat_mt ORDER BY k") == "5\n6"
    assert _tsv(
        eng,
        "SELECT count() FROM system.parts "
        "WHERE table = 'nat_mt' AND active",
    ) == "1"


def test_read_native_dist_no_driver_span_collect(eng, tmp_path):
    """split_blocks keeps the block-span index DISTRIBUTED: building
    the DataFrame performs no driver collect (the span list of a
    100 TB dump must never materialize on the driver — the reference
    streams blocks, NativeBlockInputStream.h), and the plan carries
    scan -> exchange -> decode with both stages as MapInPandas."""
    from pyspark.sql import DataFrame

    rows = [(i, f"s{i}", [i], i * 1.0) for i in range(9)]
    p = tmp_path / "big.native"
    p.write_bytes(_multi_block_dump(rows, [3, 3, 3]))

    calls = []
    orig = DataFrame.collect
    DataFrame.collect = lambda self: (calls.append(1), orig(self))[1]
    try:
        df = eng.read_native_dir(str(p), split_blocks=True)
        assert calls == [], "read_native_dist collected during plan build"
    finally:
        DataFrame.collect = orig
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 2  # span scan + decode stages
    assert "Exchange" in plan  # spans shuffle straight into the decode
    got = sorted((r.k, r.s, tuple(r.arr), r.f) for r in df.collect())
    assert got == sorted((k, s, tuple(a), f) for k, s, a, f in rows)


def test_read_native_dist_truncated_file_raises(eng, tmp_path):
    """A file with no complete block fails schema discovery with a
    clear error, not a downstream IndexError."""
    full = _multi_block_dump([(1, "x", [1], 0.5)], [1])
    p = tmp_path / "trunc.native"
    p.write_bytes(full[: len(full) - 3])
    with pytest.raises(ValueError, match="no complete Native block"):
        eng.read_native_dir(str(p))


def test_read_native_dist_schema_mismatch_raises(eng, tmp_path):
    """Every block re-states names/types; a directory mixing files
    with different column order fails LOUDLY at decode instead of
    silently misattributing values via the first file's schema."""
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.sources.formats import (
        _render_native,
    )

    d = tmp_path / "mixdump"
    d.mkdir()
    (d / "a.native").write_bytes(
        _render_native([(1, "x")], ["k", "s"], [None] * 2,
                       ["UInt32", "String"]
                       ).encode("utf-8", "surrogateescape"))
    (d / "b.native").write_bytes(
        _render_native([("y", 2)], ["s", "k"], [None] * 2,
                       ["String", "UInt32"]
                       ).encode("utf-8", "surrogateescape"))
    for split in (False, True):
        df = eng.read_native_dir(str(d), split_blocks=split)
        with pytest.raises(Exception, match="declares schema"):
            df.collect()
