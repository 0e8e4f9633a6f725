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

# ---- IPv6 (FunctionsCoding.cpp: FunctionIPv6NumToString,
# FunctionIPv6StringToNum, FunctionCutIPv6) ----------------------------------
# IPv6 "num" form is FixedString(16) in the reference -> BINARY(16) here.
# Pure expressions over the 32-char hex rendering.  The input column is
# let-bound (functions/_util.let_) so the derived group/run expressions
# reference a lambda variable instead of duplicating the input subtree
# (composition like IPv6NumToString(IPv6StringToNum(s)) would otherwise
# blow the analyzer up combinatorially).

from ._util import let_ as _let  # noqa: E402


def _ipv6_format_from_hex(h: Column) -> Column:
    """Canonical text from the 32-char lowercase hex: leading zeros
    stripped, leftmost-longest zero run >= 2 collapsed to '::',
    v4-mapped rendered as ::ffff:a.b.c.d (RFC 5952 / formatIPv6)."""
    vals = [
        F.conv(F.substring(h, 1 + 4 * i, 4), 16, 10).cast("long")
        for i in range(8)
    ]
    gtxt = [F.lower(F.format_string("%x", v)) for v in vals]

    # run[i] = length of the zero run starting at group i (linear chain)
    runs: list[Column] = [None] * 8
    runs[7] = F.when(vals[7] == 0, F.lit(1)).otherwise(F.lit(0))
    for i in range(6, -1, -1):
        runs[i] = F.when(vals[i] == 0, runs[i + 1] + 1).otherwise(F.lit(0))

    def fmt(run_arr: Column) -> Column:
        best_len = F.array_max(run_arr)
        best_start = F.lit(7)
        for i in range(7, -1, -1):
            best_start = F.when(
                F.get(run_arr, i) == best_len, F.lit(i)
            ).otherwise(best_start)
        garr = F.array(*gtxt)
        left = F.array_join(F.slice(garr, F.lit(1), best_start), ":")
        right = F.array_join(
            F.slice(
                garr, best_start + best_len + 1, F.lit(8) - best_start - best_len
            ),
            ":",
        )
        compressed = F.concat(left, F.lit("::"), right)
        plain = F.array_join(garr, ":")
        last4 = (vals[6] * F.lit(65536) + vals[7]).cast("long")
        is_v4_mapped = (
            (vals[0] == 0) & (vals[1] == 0) & (vals[2] == 0)
            & (vals[3] == 0) & (vals[4] == 0) & (vals[5] == 65535)
        )
        return (
            F.when(
                is_v4_mapped, F.concat(F.lit("::ffff:"), IPv4NumToString(last4))
            )
            .when(best_len >= 2, compressed)
            .otherwise(plain)
        )

    return _let(F.array(*runs), fmt)


def IPv6NumToString(b) -> Column:
    """BINARY(16) -> canonical IPv6 text (FunctionIPv6NumToString)."""
    return _let(F.lower(F.hex(col_of(b))), _ipv6_format_from_hex)


def IPv6StringToNum(s) -> Column:
    """IPv6 text (optionally '::'-compressed, optionally dotted-v4
    tail) -> BINARY(16) (FunctionIPv6StringToNum)."""

    def parse(s_: Column) -> Column:
        v4_tail = F.regexp_extract(s_, r"((\d{1,3}\.){3}\d{1,3})$", 1)

        def with_tail(tail: Column) -> Column:
            v4_hex = F.lpad(
                F.lower(F.format_string("%x", IPv4StringToNum(tail))), 8, "0"
            )
            return F.when(
                tail != "",
                F.concat(
                    F.substring(s_, 1, F.length(s_) - F.length(tail)),
                    F.substring(v4_hex, 1, 4),
                    F.lit(":"),
                    F.substring(v4_hex, 5, 4),
                ),
            ).otherwise(s_)

        def build(s2: Column) -> Column:
            def from_halves(halves: Column) -> Column:
                lgroups = F.filter(
                    F.split(F.element_at(halves, 1), ":"), lambda g: g != ""
                )
                rgroups = F.when(
                    F.size(halves) > 1,
                    F.filter(
                        F.split(F.element_at(halves, 2), ":"), lambda g: g != ""
                    ),
                ).otherwise(F.array().cast("array<string>"))

                def pad(lg: Column, rg: Column) -> Column:
                    missing = F.lit(8) - F.size(lg) - F.size(rg)
                    groups = F.when(
                        F.size(halves) > 1,
                        F.concat(lg, F.array_repeat(F.lit("0"), missing), rg),
                    ).otherwise(lg)
                    return F.unhex(
                        F.array_join(
                            F.transform(groups, lambda g: F.lpad(g, 4, "0")), ""
                        )
                    )

                return _let(lgroups, lambda lg: _let(rgroups, lambda rg: pad(lg, rg)))

            return _let(F.split(s2, "::", -1), from_halves)

        # unparseable / empty input yields all-zero bytes, never NULL
        # (FunctionIPv6StringToNum writes a zeroed in6_addr on failure)
        return _let(
            with_tail(v4_tail),
            lambda s3: _let(
                build(s3),
                lambda b: F.when(F.length(b) == 16, b).otherwise(
                    F.lit(bytes(16))
                ),
            ),
        )

    return _let(F.lower(col_of(s)), parse)


def cutIPv6(b, bytes_to_cut_v6: int, bytes_to_cut_v4: int) -> Column:
    """Zero the last N bytes (N differs for v4-mapped addresses — the
    reference's anonymization helper) and format (FunctionCutIPv6)."""

    def go(h: Column) -> Column:
        is_v4_mapped = (
            F.substring(h, 1, 20) == "0" * 20
        ) & (F.substring(h, 21, 4) == "ffff")

        def cut(n: int) -> Column:
            return F.rpad(F.substring(h, 1, (16 - n) * 2), 32, "0")

        cut_hex = F.when(is_v4_mapped, cut(bytes_to_cut_v4)).otherwise(
            cut(bytes_to_cut_v6)
        )
        return _let(cut_hex, _ipv6_format_from_hex)

    return _let(F.lower(F.hex(col_of(b))), go)
