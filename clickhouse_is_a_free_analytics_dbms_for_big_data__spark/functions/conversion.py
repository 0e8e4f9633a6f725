"""Type conversion functions.

Reference: dbms/src/Functions/FunctionsConversion.cpp (header 1781 LoC):
toUInt8..toFloat64 (+OrZero), toDate, toDateTime, toString,
toFixedString, toUnixTimestamp, CAST.

Unsigned widths widen by one signed size (SURVEY.md §1.2); UInt64 maps
to LongType by default (wraparound documented) with a Decimal(20,0)
escape hatch for full-range literals.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ._util import col_of

__all__ = [
    "toUInt8", "toUInt16", "toUInt32", "toUInt64", "toUInt64Full",
    "toInt8", "toInt16", "toInt32", "toInt64", "toFloat32", "toFloat64",
    "toUInt8OrZero", "toUInt16OrZero", "toUInt32OrZero", "toUInt64OrZero",
    "toInt8OrZero", "toInt16OrZero", "toInt32OrZero", "toInt64OrZero",
    "toFloat32OrZero", "toFloat64OrZero",
    "toDate", "toDateTime", "toString", "toFixedString",
    "toUnixTimestamp", "cast_",
]


def _to(t: str):
    def conv(x) -> Column:
        return col_of(x).cast(t)

    return conv


def _to_or_zero(t: str):
    def conv(x) -> Column:
        return F.coalesce(col_of(x).try_cast(t), F.lit(0).cast(t))

    return conv


toUInt8 = _to("smallint")     # widen unsigned by one size
toUInt16 = _to("int")
toUInt32 = _to("bigint")
toUInt64 = _to("bigint")      # wraparound at 2^63 documented


def toUInt64Full(x) -> Column:
    """Full-range UInt64 via Decimal(20,0) (bench Q20 literals)."""
    return col_of(x).cast("decimal(20,0)")


toInt8 = _to("tinyint")
toInt16 = _to("smallint")
toInt32 = _to("int")
toInt64 = _to("bigint")
toFloat32 = _to("float")
toFloat64 = _to("double")

toUInt8OrZero = _to_or_zero("smallint")
toUInt16OrZero = _to_or_zero("int")
toUInt32OrZero = _to_or_zero("bigint")
toUInt64OrZero = _to_or_zero("bigint")
toInt8OrZero = _to_or_zero("tinyint")
toInt16OrZero = _to_or_zero("smallint")
toInt32OrZero = _to_or_zero("int")
toInt64OrZero = _to_or_zero("bigint")
toFloat32OrZero = _to_or_zero("float")
toFloat64OrZero = _to_or_zero("double")


def toDate(x) -> Column:
    return F.to_date(col_of(x))


def toDateTime(x) -> Column:
    """Second-precision DateTime (reference DataTypeDateTime)."""
    return F.date_trunc("second", col_of(x).cast("timestamp"))


def toString(x) -> Column:
    return col_of(x).cast("string")


def toFixedString(x, n: int) -> Column:
    """FixedString(N): pad/truncate to exactly N chars."""
    return F.rpad(col_of(x).cast("string"), n, "\x00").substr(1, n)


def toUnixTimestamp(x) -> Column:
    return col_of(x).cast("timestamp").cast("long")


def cast_(x, t: str) -> Column:
    return col_of(x).cast(t)
