"""Array functions.

Reference: dbms/src/Functions/FunctionsArray.cpp (2950 LoC).

Semantics traps (SURVEY.md §2.8): arrayElement is 1-based, negative
indexes count from the end, and out-of-range returns the TYPE DEFAULT
(0 / '' / empty), not NULL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ._util import col_of, lit_of

__all__ = [
    "array", "arrayElement", "arrayElementOrNull", "has", "indexOf",
    "countEqual", "arrayEnumerate", "arrayUniq", "range_",
    "arrayReverse", "emptyArrayToSingle", "arrayConcat", "arraySlice",
    "arrayPushBack", "arrayPushFront", "arrayResize", "arrayDistinct",
]

_TYPE_DEFAULTS = {"string": "", "double": 0.0, "float": 0.0}


def array(*items) -> Column:
    return F.array(*[lit_of(i) for i in items])


def arrayElementOrNull(arr, idx) -> Column:
    """1-based element access, negative from end, NULL when out of range."""
    a = col_of(arr)
    if isinstance(idx, int):
        return F.get(a, idx - 1 if idx > 0 else F.size(a) + idx)
    i = col_of(idx)
    return F.get(a, F.when(i > 0, i - 1).otherwise(F.size(a) + i))


def arrayElement(arr, idx, type_default=None) -> Column:
    """Reference arrayElement: out-of-range yields the type default
    (0, '', ...), not NULL.  Pass ``type_default`` to override the
    inferred default (numeric 0)."""
    v = arrayElementOrNull(arr, idx)
    default = lit_of(type_default if type_default is not None else 0)
    return F.coalesce(v, default)


def has(arr, value) -> Column:
    return F.array_contains(col_of(arr), value)


def indexOf(arr, value) -> Column:
    """1-based position of value; 0 if absent."""
    return F.coalesce(
        F.array_position(col_of(arr), value), F.lit(0)
    )


def countEqual(arr, value) -> Column:
    return F.size(F.filter(col_of(arr), lambda x: x == lit_of(value)))


def arrayEnumerate(arr) -> Column:
    """[1, 2, ..., len(arr)]."""
    return F.sequence(F.lit(1), F.size(col_of(arr)))


def arrayUniq(arr) -> Column:
    return F.size(F.array_distinct(col_of(arr)))


def range_(n) -> Column:
    """range(n) = [0, ..., n-1] (reference range is 0-based exclusive)."""
    n_ = col_of(n) if not isinstance(n, int) else F.lit(n)
    return F.when(n_ <= 0, F.array()).otherwise(
        F.sequence(F.lit(0), n_ - 1)
    )


def arrayReverse(arr) -> Column:
    return F.reverse(col_of(arr))


def emptyArrayToSingle(arr, default=0) -> Column:
    a = col_of(arr)
    return F.when(F.size(a) == 0, F.array(lit_of(default))).otherwise(a)


def arrayConcat(*arrs) -> Column:
    return F.concat(*[col_of(a) for a in arrs])


def arraySlice(arr, offset, length_=None) -> Column:
    if length_ is None:
        a = col_of(arr)
        return F.slice(a, offset, F.size(a))
    return F.slice(col_of(arr), offset, length_)


def arrayPushBack(arr, value) -> Column:
    return F.concat(col_of(arr), F.array(lit_of(value)))


def arrayPushFront(arr, value) -> Column:
    return F.concat(F.array(lit_of(value)), col_of(arr))


def arrayResize(arr, size: int, fill=0) -> Column:
    a = col_of(arr)
    padded = F.concat(
        a, F.array_repeat(lit_of(fill), F.greatest(F.lit(size) - F.size(a), F.lit(0)))
    )
    return F.slice(padded, 1, size)


def arrayDistinct(arr) -> Column:
    return F.array_distinct(col_of(arr))
