"""IP / encoding functions.

Reference: dbms/src/Functions/FunctionsCoding.cpp: IPv4NumToString,
IPv4StringToNum, IPv4NumToStringClassC, hex, unhex, bitmaskToArray,
bitTest, bitTestAny, bitTestAll, UUIDNumToString/UUIDStringToNum.
IPv6 handling is reduced to the widely-used v4-mapped cases.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ._util import col_of

__all__ = [
    "IPv4NumToString", "IPv4StringToNum", "IPv4NumToStringClassC",
    "IPv4ToIPv6", "hex_", "unhex", "bitmaskToArray", "bitTest",
    "bitTestAny", "bitTestAll", "UUIDStringToNum", "UUIDNumToString",
]


def IPv4NumToString(n) -> Column:
    n_ = col_of(n).cast("long")
    return F.concat_ws(
        ".",
        F.shiftrightunsigned(n_, 24).bitwiseAND(F.lit(255)).cast("string"),
        F.shiftrightunsigned(n_, 16).bitwiseAND(F.lit(255)).cast("string"),
        F.shiftrightunsigned(n_, 8).bitwiseAND(F.lit(255)).cast("string"),
        n_.bitwiseAND(F.lit(255)).cast("string"),
    )


def IPv4StringToNum(s) -> Column:
    parts = F.split(col_of(s), "\\.")
    return (
        F.element_at(parts, 1).cast("long") * 16777216
        + F.element_at(parts, 2).cast("long") * 65536
        + F.element_at(parts, 3).cast("long") * 256
        + F.element_at(parts, 4).cast("long")
    )


def IPv4NumToStringClassC(n) -> Column:
    """Last octet replaced by 'xxx' (reference privacy helper)."""
    n_ = col_of(n).cast("long")
    return F.concat_ws(
        ".",
        F.shiftrightunsigned(n_, 24).bitwiseAND(F.lit(255)).cast("string"),
        F.shiftrightunsigned(n_, 16).bitwiseAND(F.lit(255)).cast("string"),
        F.shiftrightunsigned(n_, 8).bitwiseAND(F.lit(255)).cast("string"),
        F.lit("xxx"),
    )


def IPv4ToIPv6(n) -> Column:
    """v4-mapped v6 text form ::ffff:a.b.c.d."""
    return F.concat(F.lit("::ffff:"), IPv4NumToString(n))


def hex_(x) -> Column:
    return F.upper(F.hex(col_of(x)))


def unhex(s) -> Column:
    return F.unhex(col_of(s))


def bitmaskToArray(x) -> Column:
    """Powers of two summing to x, ascending (reference bitmaskToArray)."""
    x_ = col_of(x).cast("long")
    bits = F.sequence(F.lit(0), F.lit(62))
    # 2^i via pow is exact (powers of two have exact double repr);
    # shiftleft can't take a Column bit count.
    mask = lambda i: F.pow(F.lit(2.0), i).cast("long")  # noqa: E731
    return F.filter(
        F.transform(
            bits,
            lambda i: F.when(
                x_.bitwiseAND(mask(i)) != 0, mask(i)
            ).otherwise(F.lit(None).cast("long")),
        ),
        lambda v: v.isNotNull(),
    )


def bitTest(x, pos) -> Column:
    return F.shiftrightunsigned(col_of(x).cast("long"), pos).bitwiseAND(F.lit(1))


def bitTestAny(x, *positions) -> Column:
    out = bitTest(x, positions[0]) == 1
    for p in positions[1:]:
        out = out | (bitTest(x, p) == 1)
    return out


def bitTestAll(x, *positions) -> Column:
    out = bitTest(x, positions[0]) == 1
    for p in positions[1:]:
        out = out & (bitTest(x, p) == 1)
    return out


def UUIDStringToNum(s) -> Column:
    """UUID text -> 16 raw bytes (FixedString(16) analog = binary)."""
    return F.unhex(F.regexp_replace(col_of(s), "-", ""))


def UUIDNumToString(b) -> Column:
    h = F.lower(F.hex(col_of(b)))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )
