"""Higher-order (lambda-taking) array functions.

Reference: dbms/src/Functions/FunctionsHigherOrder.h:34-853 (shared
driver FunctionArrayMapped:599).  Spark's higher-order built-ins
(transform/filter/exists/forall/aggregate/array_sort) are the direct,
codegen-eligible equivalents.

Lambdas here are Python callables Column -> Column, compiled by Spark
into JVM lambda expressions — no Python execution at runtime.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ._util import col_of

__all__ = [
    "arrayMap", "arrayFilter", "arrayCount", "arrayExists", "arrayAll",
    "arraySum", "arrayAvg", "arrayFirst", "arrayFirstIndex", "arraySort",
    "arrayReverseSort", "arrayCumSum", "arrayReduceSum", "arrayFold",
]


def arrayMap(fn, arr) -> Column:
    return F.transform(col_of(arr), fn)


def arrayFilter(fn, arr) -> Column:
    return F.filter(col_of(arr), fn)


def arrayCount(fn, arr) -> Column:
    return F.size(F.filter(col_of(arr), fn))


def arrayExists(fn, arr) -> Column:
    return F.exists(col_of(arr), fn)


def arrayAll(fn, arr) -> Column:
    return F.forall(col_of(arr), fn)


def arraySum(arr, fn=None) -> Column:
    a = col_of(arr)
    if fn is not None:
        a = F.transform(a, fn)
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double"))


def arrayAvg(arr) -> Column:
    a = col_of(arr)
    return arraySum(a) / F.size(a)


def arrayFirst(fn, arr) -> Column:
    """First element matching the predicate (NULL if none)."""
    return F.get(F.filter(col_of(arr), fn), 0)


def arrayFirstIndex(fn, arr) -> Column:
    """1-based index of the first match; 0 if none.

    Implemented by zipping values with positions, filtering, and taking
    the head — stays entirely in Catalyst expressions.
    """
    a = col_of(arr)
    pos = F.filter(
        F.zip_with(
            a, F.sequence(F.lit(1), F.greatest(F.size(a), F.lit(1))),
            lambda x, i: F.struct(x.alias("x"), i.alias("i")),
        ),
        lambda s: fn(s.getField("x")),
    )
    return F.coalesce(F.get(pos, 0).getField("i"), F.lit(0))


def arraySort(arr, fn=None) -> Column:
    """Ascending sort; with fn, sort by the key fn(x) (reference
    arraySort(fn, arr))."""
    a = col_of(arr)
    if fn is None:
        return F.array_sort(a)
    keyed = F.transform(a, lambda x: F.struct(fn(x).alias("k"), x.alias("v")))
    return F.transform(F.array_sort(keyed), lambda s: s.getField("v"))


def arrayReverseSort(arr, fn=None) -> Column:
    return F.reverse(arraySort(arr, fn))


def arrayCumSum(arr) -> Column:
    """Running sums (reference arrayCumSum); expression-only via
    aggregate over struct(acc_list, total)."""
    a = col_of(arr)
    return F.aggregate(
        a,
        F.struct(
            F.array().cast("array<double>").alias("acc"),
            F.lit(0.0).alias("total"),
        ),
        lambda st, x: F.struct(
            F.concat(
                st.getField("acc"),
                F.array(st.getField("total") + x.cast("double")),
            ).alias("acc"),
            (st.getField("total") + x.cast("double")).alias("total"),
        ),
        lambda st: st.getField("acc"),
    )


def arrayReduceSum(arr) -> Column:
    """arrayReduce('sum', arr) — the most-used arrayReduce case
    (reference FunctionsArray.h:1387).  General aggregate-by-name
    dispatch lives in functions/aggregates.py::array_reduce."""
    return arraySum(arr)


def arrayFold(fn, arr, init) -> Column:
    from ._util import lit_of

    return F.aggregate(col_of(arr), lit_of(init), fn)
