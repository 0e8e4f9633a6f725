"""Rounding functions.

Reference: dbms/src/Functions/FunctionsRound.cpp: round, ceil, floor,
roundToExp2, roundDuration, roundAge (the last three are CH-specific
bucketing used by the web-analytics schema).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ._util import col_of

__all__ = ["round_", "ceil", "floor", "roundToExp2", "roundDuration", "roundAge"]

_DURATION_BUCKETS = [1, 10, 30, 60, 120, 180, 240, 300, 600, 1200, 1800, 3600,
                     7200, 18000, 36000]
_AGE_BUCKETS = [(1, 17), (18, 24), (25, 34), (35, 44), (45, 54)]


def round_(x, n: int = 0) -> Column:
    """Banker's rounding in the reference (round half to even) — Spark's
    ``bround`` matches; plain ``F.round`` is half-away-from-zero."""
    return F.bround(col_of(x), n)


def ceil(x, n: int = 0) -> Column:
    if n == 0:
        return F.ceil(col_of(x))
    factor = 10 ** n
    return F.ceil(col_of(x) * factor) / factor


def floor(x, n: int = 0) -> Column:
    if n == 0:
        return F.floor(col_of(x))
    factor = 10 ** n
    return F.floor(col_of(x) * factor) / factor


def roundToExp2(x) -> Column:
    """Round down to the nearest power of two (0 for x<1).
    Reference: FunctionsRound.cpp roundToExp2."""
    x_ = col_of(x)
    return F.when(x_ < 1, F.lit(0)).otherwise(
        F.pow(F.lit(2.0), F.floor(F.log2(x_.cast("double")))).cast("long")
    )


def roundDuration(x) -> Column:
    """Bucket a duration in seconds to the reference's fixed scale
    (0, 1, 10, 30, 60, ..., 36000)."""
    x_ = col_of(x)
    result = F.lit(0)
    for lo in _DURATION_BUCKETS:
        result = F.when(x_ >= lo, F.lit(lo)).otherwise(result)
    return result


def roundAge(x) -> Column:
    """Reference age buckets: 0, 17(<18), 18, 25, 35, 45, 55(>=55)."""
    x_ = col_of(x)
    return (
        F.when(x_ < 1, F.lit(0))
        .when(x_ < 18, F.lit(17))
        .when(x_ < 25, F.lit(18))
        .when(x_ < 35, F.lit(25))
        .when(x_ < 45, F.lit(35))
        .when(x_ < 55, F.lit(45))
        .otherwise(F.lit(55))
    )
