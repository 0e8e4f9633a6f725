"""Distributed FORMAT Native dump ingest.

``ChEngine.read_native`` parses a dump in driver Python and
``createDataFrame``s the rows — fine for golden-scale replay, but a
real migration replays multi-GB dumps, which that shape materializes
twice in driver memory.  The reference streams blocks pull-based
(DataStreams/NativeBlockInputStream.h); the Spark-first twin is to
treat each dump FILE (and optionally each BLOCK — every Native block
is self-describing, re-stating names/types) as an independently
decodable split and run the decode in executors:

    binaryFile scan (or block-span list)  ->  Arrow mapInPandas decode

The driver touches only the FIRST BLOCK of one file (schema discovery)
and the tiny span list; data bytes flow scan -> executor decode.

Scale notes: per-file parallelism matches how dumps are produced
(one file per table/partition/chunk).  ``split_blocks=True`` adds
block-level parallelism for a single giant file: stage 1 scans block
boundaries executor-side (skip-only, no row materialization —
``scan_native_blocks``), stage 2 decodes one span per task reading
only its byte range.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .formats import parse_native, scan_native_blocks, spark_ingest_type

_LINEAGE_DDL = "_file STRING, _block BIGINT, _row_in_block BIGINT"


def _local_path(p: str) -> str:
    if p.startswith("file:"):
        p = p[len("file:"):]
        while p.startswith("//"):
            p = p[1:]
    return p


def _read_range(path: str, offset: int = 0, length: int | None = None) -> bytes:
    """Byte range of ``path`` — local/NFS via open(); other schemes via
    pyarrow.fs when available (import-gated)."""
    if "://" in path and not path.startswith("file:"):
        from pyarrow import fs as pafs  # optional at runtime

        filesystem, rel = pafs.FileSystem.from_uri(path)
        with filesystem.open_input_file(rel) as f:
            if offset:
                f.seek(offset)
            return f.read(length if length is not None else -1)
    with open(_local_path(path), "rb") as f:
        if offset:
            f.seek(offset)
        return f.read(length if length is not None else -1)


def _first_block(path: str) -> bytes:
    """Bytes of the first block only — read incrementally (doubling)
    so schema discovery never pulls a whole dump onto the driver."""
    size = 1 << 16
    while True:
        head = _read_range(path, 0, size)
        try:
            (off, ln, _nr) = scan_native_blocks(head[: len(head)])[0]
            if off + ln <= len(head):
                return head[off:off + ln]
        except IndexError:
            pass
        if len(head) < size:  # whole file read, still no complete block
            raise ValueError(f"no complete Native block in {path!r}")
        size *= 2


def _schema_of(path: str):
    names, ch_types, _rows = parse_native(_first_block(path))
    pairs = [spark_ingest_type(t) for t in ch_types]
    ddl = ", ".join(f"`{c}` {d}" for c, (d, _f) in zip(names, pairs))
    return names, ch_types, ddl, [f for _d, f in pairs]


def _list_native_files(spark: SparkSession, src: str) -> list[str]:
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(src)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    st = fs.getFileStatus(hpath)
    if st.isFile():
        return [st.getPath().toString()]
    return sorted(
        s.getPath().toString()
        for s in fs.listStatus(hpath)
        if s.isFile() and not s.getPath().getName().startswith((".", "_"))
    )


def _rows_to_pdf(names, convs, types, rows, lineage=None):
    import pandas as pd

    def cell(f, t, v):
        if v is None:
            return None
        v = f(v)
        if t.replace("Nullable(", "").startswith("Tuple(") and isinstance(
            v, tuple
        ):
            # Arrow structs convert from dicts, not tuples
            return {f"_{i + 1}": e for i, e in enumerate(v)}
        return v

    data = {
        c: [cell(f, t, r[i]) for r in rows]
        for i, (c, f, t) in enumerate(zip(names, convs, types))
    }
    if lineage is not None:
        fpath, block = lineage
        data["_file"] = [fpath] * len(rows)
        data["_block"] = [block] * len(rows)
        data["_row_in_block"] = list(range(len(rows)))
    return pd.DataFrame(data)


def read_native_dist(
    spark: SparkSession,
    src: str,
    split_blocks: bool = False,
    lineage: bool = False,
    decode_partitions: int | None = None,
) -> DataFrame:
    """A FORMAT Native dump (file or directory of files) as a
    DataFrame, decoded in EXECUTORS (Arrow ``mapInPandas``); the
    driver reads only the first block of one file (schema discovery).
    With ``split_blocks`` the block-span index flows scan -> shuffle ->
    decode entirely as a DataFrame — a 100 TB dump's block list never
    lives on the driver (the reference streams blocks too,
    DataStreams/NativeBlockInputStream.h — no materialized index).

    Every block re-states names/types; the decode verifies each
    block's header against the discovered schema and raises on
    mismatch, so a mixed-schema directory fails loudly instead of
    misattributing values.

    ``lineage`` adds ``_file``/``_block``/``_row_in_block`` columns —
    enough to reproduce the dump's exact row order and block structure
    (deterministic replay / byte-identical re-render).
    ``decode_partitions`` sizes the decode stage for ``split_blocks``
    (default: the session's defaultParallelism).
    """
    paths = _list_native_files(spark, src)
    if not paths:
        raise ValueError(f"no Native dump files under {src!r}")
    names, ch_types, ddl, convs = _schema_of(paths[0])
    out_ddl = ddl + (", " + _LINEAGE_DDL if lineage else "")
    want_lineage = lineage

    def check_block(bn, bt, p):
        if list(bn) != list(names) or list(bt) != list(ch_types):
            raise ValueError(
                f"Native block in {p!r} declares schema "
                f"{list(zip(bn, bt))}, expected "
                f"{list(zip(names, ch_types))}"
            )

    if split_blocks:
        # stage 1: block-boundary scan, executor-side, one task/file
        def scan_iter(batches):
            import pandas as pd

            for pdf in batches:
                recs = []
                for p in pdf["path"]:
                    data = _read_range(p)
                    for i, (off, ln, nr) in enumerate(
                        scan_native_blocks(data)
                    ):
                        recs.append((p, i, off, ln, nr))
                yield pd.DataFrame(
                    recs,
                    columns=["path", "block", "offset", "length", "n_rows"],
                )

        files_df = spark.createDataFrame(
            [(p,) for p in paths], "path string"
        ).repartition(len(paths))
        spans_df = files_df.mapInPandas(
            scan_iter,
            "path string, block long, offset long, length long, n_rows long",
        )

        def decode_span_iter(batches):
            for pdf in batches:
                for p, blk, off, ln in zip(
                    pdf["path"], pdf["block"], pdf["offset"], pdf["length"]
                ):
                    data = _read_range(p, int(off), int(ln))
                    bn, bt, rows = parse_native(data)
                    check_block(bn, bt, p)
                    yield _rows_to_pdf(
                        names, convs, ch_types, rows,
                        (p, int(blk)) if want_lineage else None,
                    )

        # span rows shuffle straight into the decode stage — a plain
        # hash repartition on (path, block); no count job, no driver
        # materialization (the span index stays distributed end-to-end)
        width = decode_partitions or spark.sparkContext.defaultParallelism
        return spans_df.repartition(width, "path", "block").mapInPandas(
            decode_span_iter, out_ddl
        )

    # per-file parallelism: binaryFile scan feeds the decode directly
    def decode_file_iter(batches):
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                # per-block decode in both modes: every block re-states
                # names/types, and check_block validates each one (a
                # whole-file parse_native would surface only the first
                # block's header)
                for i, (off, ln, _nr) in enumerate(
                    scan_native_blocks(data)
                ):
                    bn, bt, rows = parse_native(data[off:off + ln])
                    check_block(bn, bt, p)
                    yield _rows_to_pdf(
                        names, convs, ch_types, rows,
                        (p, i) if want_lineage else None,
                    )

    files = (
        spark.read.format("binaryFile")
        .load(paths)
        .select("path", "content")
    )
    return files.mapInPandas(decode_file_iter, out_ddl)
