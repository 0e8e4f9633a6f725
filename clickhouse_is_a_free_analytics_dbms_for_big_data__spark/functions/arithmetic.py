"""Arithmetic / comparison / logical functions.

Reference: dbms/src/Functions/FunctionsArithmetic.cpp,
FunctionsComparison.cpp, FunctionsLogical.cpp (SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ._util import col_of, lit_of

__all__ = [
    "plus", "minus", "multiply", "divide", "intDiv", "intDivOrZero",
    "modulo", "negate", "abs_", "bitAnd", "bitOr", "bitXor", "bitNot",
    "bitShiftLeft", "bitShiftRight", "bitRotateLeft", "bitRotateRight",
    "least", "greatest",
    "equals", "notEquals", "less", "greater", "lessOrEquals",
    "greaterOrEquals",
    "and_", "or_", "xor", "not_",
]


def plus(a, b) -> Column:
    return col_of(a) + lit_of(b)


def minus(a, b) -> Column:
    return col_of(a) - lit_of(b)


def multiply(a, b) -> Column:
    return col_of(a) * lit_of(b)


def divide(a, b) -> Column:
    """Always float division (reference divides to Float64)."""
    return col_of(a).cast("double") / lit_of(b).cast("double")


def intDiv(a, b) -> Column:
    """Integer division truncated toward zero (reference intDiv).

    Computed as (a - a % b) / b in integer space: Spark's % follows the
    dividend's sign, so a - a%b is exactly divisible and the final
    double division is exact for quotients < 2^53.
    """
    a_, b_ = col_of(a).cast("long"), lit_of(b).cast("long")
    return ((a_ - (a_ % b_)) / b_).cast("long")


def intDivOrZero(a, b) -> Column:
    b_ = lit_of(b)
    return F.when(b_ == 0, F.lit(0)).otherwise(intDiv(a, b_))


def modulo(a, b) -> Column:
    return col_of(a) % lit_of(b)


def negate(a) -> Column:
    return -col_of(a)


def abs_(a) -> Column:
    return F.abs(col_of(a))


def bitAnd(a, b) -> Column:
    return col_of(a).bitwiseAND(lit_of(b))


def bitOr(a, b) -> Column:
    return col_of(a).bitwiseOR(lit_of(b))


def bitXor(a, b) -> Column:
    return col_of(a).bitwiseXOR(lit_of(b))


def bitNot(a) -> Column:
    return F.bitwise_not(col_of(a))


def bitShiftLeft(a, n) -> Column:
    return F.shiftleft(col_of(a), n)


def bitShiftRight(a, n) -> Column:
    return F.shiftright(col_of(a), n)


def bitRotateLeft(a, n, bits: int = 64) -> Column:
    a_ = col_of(a)
    return F.shiftleft(a_, n).bitwiseOR(F.shiftrightunsigned(a_, bits - n))


def bitRotateRight(a, n, bits: int = 64) -> Column:
    a_ = col_of(a)
    return F.shiftrightunsigned(a_, n).bitwiseOR(F.shiftleft(a_, bits - n))


def least(a, b) -> Column:
    return F.least(col_of(a), lit_of(b))


def greatest(a, b) -> Column:
    return F.greatest(col_of(a), lit_of(b))


def equals(a, b) -> Column:
    return col_of(a) == lit_of(b)


def notEquals(a, b) -> Column:
    return col_of(a) != lit_of(b)


def less(a, b) -> Column:
    return col_of(a) < lit_of(b)


def greater(a, b) -> Column:
    return col_of(a) > lit_of(b)


def lessOrEquals(a, b) -> Column:
    return col_of(a) <= lit_of(b)


def greaterOrEquals(a, b) -> Column:
    return col_of(a) >= lit_of(b)


def and_(*cols) -> Column:
    out = col_of(cols[0])
    for c in cols[1:]:
        out = out & col_of(c)
    return out


def or_(*cols) -> Column:
    out = col_of(cols[0])
    for c in cols[1:]:
        out = out | col_of(c)
    return out


def xor(a, b) -> Column:
    return col_of(a).cast("boolean") != col_of(b).cast("boolean")


def not_(a) -> Column:
    return ~col_of(a).cast("boolean")
