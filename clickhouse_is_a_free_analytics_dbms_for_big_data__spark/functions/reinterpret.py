"""Reinterpret functions (reference: Functions/FunctionsReinterpret.cpp).

The reference reinterprets a value's raw bytes as another type
(little-endian).  The byte-level pairs that matter in practice —
integer ↔ short string, integer → Date/DateTime — are expressible as
JVM-side expressions; IEEE-754 float bitcasts are NOT exposed by Spark
SQL and are intentionally unsupported (raise, don't silently differ).

Byte loops are unrolled in Python (8 fixed positions), so every term is
an exact integer shift — no doubles, no precision cliff at 2^53.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ._util import col_of

__all__ = [
    "reinterpretAsString",
    "reinterpretAsUInt32",
    "reinterpretAsUInt64",
    "reinterpretAsInt64",
    "reinterpretAsDate",
    "reinterpretAsDateTime",
]


def reinterpretAsString(x) -> Column:
    """Integer bytes (little-endian) as a string, stopping at the first
    NUL — reinterpretAsString(65) = 'A', (12345 = 0x3039) = '90'.

    Faithful for bytes < 0x80.  For bytes >= 0x80 the reference emits
    a byte string that is invalid UTF-8, which Spark's StringType
    cannot hold; this emits the CODEPOINT instead (so the string->int
    reinterpret of such output reads that codepoint's UTF-8 bytes,
    not the original byte — an inherent string-model limit)."""
    n = col_of(x).cast("long")
    bytes_ = F.array(
        *[
            F.shiftrightunsigned(n, 8 * i).bitwiseAND(F.lit(255)).cast("int")
            for i in range(8)
        ]
    )
    # array_position yields 0 (not NULL) when no NUL byte exists — take
    # all 8 bytes in that case, else everything before the first NUL.
    nul_pos = F.array_position(bytes_, 0)
    trimmed = F.slice(
        bytes_,
        F.lit(1),
        F.when(nul_pos == 0, F.lit(8)).otherwise((nul_pos - 1).cast("int")),
    )
    return F.array_join(F.transform(trimmed, lambda b: F.char(b)), "")


def _string_to_int(x, width: int) -> Column:
    """First ``width`` BYTES of the string's UTF-8 encoding, little-
    endian.  Bytes are read off ``hex(encode(s))`` (2 hex chars per
    byte) — ``substring``/``ascii`` would count CHARACTERS, so a
    multibyte string would reinterpret codepoints instead of the raw
    bytes the reference memcpys."""
    h = F.hex(F.encode(col_of(x), "UTF-8"))
    total = F.lit(0).cast("long")
    for i in range(1, width + 1):
        byte = F.when(
            F.length(h) >= 2 * i,
            F.conv(F.substring(h, 2 * i - 1, 2), 16, 10).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        total = total + byte * F.lit(1 << (8 * (i - 1))).cast("long")
    return total


def reinterpretAsUInt32(x) -> Column:
    return _string_to_int(x, 4)


def reinterpretAsUInt64(x) -> Column:
    return _string_to_int(x, 8)


def reinterpretAsInt64(x) -> Column:
    return _string_to_int(x, 8)


def reinterpretAsDate(x) -> Column:
    """UInt16 days-since-epoch → Date (DataTypeDate is UInt16 days)."""
    return F.date_add(F.lit("1970-01-01").cast("date"), col_of(x).cast("int"))


def reinterpretAsDateTime(x) -> Column:
    """UInt32 unix seconds → DateTime (DataTypeDateTime is UInt32 secs)."""
    return F.timestamp_seconds(col_of(x).cast("long"))
