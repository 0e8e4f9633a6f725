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
    "arrayEnumerateUniq", "arrayReduce",
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


def arrayEnumerateUniq(arr) -> Column:
    """arrayEnumerateUniq(a): occurrence rank of each element —
    [10, 20, 10] → [1, 1, 2].  Reference: FunctionsArray.cpp
    arrayEnumerateUniq (the sessionization primitive).

    Pure JVM expression: for position i, count equal elements in the
    prefix a[1..i].  Quadratic in array length but codegen'd and
    shuffle-free — the right trade for typical (short) arrays; for long
    arrays use posexplode + row_number at table level instead.
    """
    a = col_of(arr)
    return F.transform(
        a,
        lambda x, i: F.size(F.filter(F.slice(a, 1, i + 1), lambda y: y == x)),
    )


def arrayReduce(agg_name: str, arr) -> Column:
    """arrayReduce('agg', a): apply an aggregate function to an array
    (FunctionsArray.h:1387).  Dispatches to array-native expressions —
    no explode, no shuffle."""
    a = col_of(arr)
    name = agg_name.lower()
    if name == "sum":
        return F.aggregate(
            a, F.lit(0).cast("double"), lambda acc, x: acc + x.cast("double")
        )
    if name == "min":
        return F.array_min(a)
    if name == "max":
        return F.array_max(a)
    if name == "avg":
        total = F.aggregate(
            a, F.lit(0).cast("double"), lambda acc, x: acc + x.cast("double")
        )
        return total / F.size(a)
    if name == "count":
        return F.size(a)
    if name in ("uniq", "uniqexact"):
        return F.size(F.array_distinct(a))
    if name == "any":
        return F.element_at(a, 1)
    if name == "anylast":
        return F.element_at(a, -1)
    if name in ("median", "quantile"):
        s = F.array_sort(a)
        return F.element_at(s, ((F.size(s) + 1) / 2).cast("int"))
    if name == "grouparray":
        return a
    if name == "groupuniqarray":
        return F.array_distinct(a)
    raise ValueError(f"arrayReduce: unsupported aggregate {agg_name!r}")
