"""Conditional + null-handling functions.

Reference: dbms/src/Functions/FunctionsConditional.cpp (if, multiIf,
caseWithExpr), FunctionsNull.cpp (isNull, coalesce, ifNull, nullIf,
assumeNotNull, toNullable).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ._util import col_of, lit_of

__all__ = [
    "if_", "multiIf", "caseWithExpr",
    "isNull", "isNotNull", "coalesce", "ifNull", "nullIf",
    "assumeNotNull", "toNullable",
]


def if_(cond, then, else_) -> Column:
    return F.when(col_of(cond), lit_of(then)).otherwise(lit_of(else_))


def multiIf(*args) -> Column:
    """multiIf(cond1, then1, cond2, then2, ..., else)."""
    if len(args) < 3 or len(args) % 2 == 0:
        raise ValueError("multiIf needs cond/then pairs plus an else")
    out = F.when(col_of(args[0]), lit_of(args[1]))
    pairs = args[2:-1]
    for i in range(0, len(pairs), 2):
        out = out.when(col_of(pairs[i]), lit_of(pairs[i + 1]))
    return out.otherwise(lit_of(args[-1]))


def caseWithExpr(expr, *args) -> Column:
    """CASE expr WHEN v1 THEN r1 ... ELSE d END."""
    e = col_of(expr)
    if len(args) % 2 == 0:
        raise ValueError("caseWithExpr needs value/result pairs plus an else")
    out = F.when(e == lit_of(args[0]), lit_of(args[1]))
    pairs = args[2:-1]
    for i in range(0, len(pairs), 2):
        out = out.when(e == lit_of(pairs[i]), lit_of(pairs[i + 1]))
    return out.otherwise(lit_of(args[-1]))


def isNull(x) -> Column:
    return col_of(x).isNull()


def isNotNull(x) -> Column:
    return col_of(x).isNotNull()


def coalesce(*cols) -> Column:
    return F.coalesce(*[lit_of(c) if not isinstance(c, (Column, str)) else col_of(c) for c in cols])


def ifNull(x, alt) -> Column:
    return F.coalesce(col_of(x), lit_of(alt))


def nullIf(a, b) -> Column:
    return F.nullif(col_of(a), lit_of(b))


def assumeNotNull(x) -> Column:
    """The reference unwraps Nullable; Spark nullability is advisory,
    so this is an identity with a nullability assertion."""
    return col_of(x)


def toNullable(x) -> Column:
    return col_of(x)
