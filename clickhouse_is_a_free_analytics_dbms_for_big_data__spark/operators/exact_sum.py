"""Exact fixed-scale money sums as primitive long math.

The reference stores Decimal as scaled integers and sums them with
integer adds (AggregateFunctionSum over Int64 columns).  Spark's
``SUM(decimal(p,s))`` uses a ``decimal(p+10, s)`` buffer — beyond
long-backing once p > 8 — so every row update allocates a JVM
BigDecimal: measured r9 at sf0.1, four decimal sums cost 1.06 s vs
0.42 s for primitive sums on the same scan.

``exact_sum_scaled`` reproduces the exact decimal sum with long
arithmetic: each value becomes its exact scaled-integer image
(``round(x * 10^s) AS LONG`` — HALF_UP, identical to the
``CAST(x AS DECIMAL(p,s))`` rounding both Spark and DuckDB apply), and
the sum runs as SPLIT hi/lo longs recombined exactly per group:

    v = trunc(v / 10^6) * 10^6 + (v % 10^6)        (Java division identity)
    sum(v) = sum(hi) * 10^6 + sum(lo)              (exact, per group)

Overflow bounds: with per-row |value| < 10^10 (so |v| < 10^12 at
scale 2), sum(lo) < 10^6 * n and sum(hi) < 10^6 * n stay inside int64
for n up to ~9 * 10^12 rows — an order of magnitude past a 100 TB
lineitem.  The recombination happens ONCE per group in decimal(36,0)
and the descale multiply (36,0) x (s+1,s) -> decimal(38,s) cannot
clip, so the result equals SUM(CAST(x AS DECIMAL(18,s))) bit-for-bit.

NULL semantics match SUM: a NULL value contributes to neither long
sum; an all-NULL group yields NULL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_M = 1_000_000


def scaled_long(value: Column, scale: int = 2) -> Column:
    """Exact scaled-integer image of an exact ``scale``-decimal double:
    ``round(value * 10^scale) AS LONG`` without the per-row BigDecimal.

    Spark's ``Round`` on DoubleType allocates a java.math.BigDecimal
    per row (r11 measured the agg_pricing core at 757 ms with F.round
    vs 388 ms with this form, value-identical).  For a double that is
    the image of an exact ``scale``-decimal value, ``value * 10^scale``
    lands within ~1 ulp of an integer — never near a .5 midpoint — so
    HALF_UP rounding equals truncation-toward-zero after nudging half
    a unit AWAY from zero: ``(v*10^s + sign(v)*0.5) CAST LONG`` (the
    JVM long cast truncates toward zero; the sign keeps negatives
    exact, e.g. c_acctbal).  Arbitrary doubles (true midpoints) must
    keep F.round — this helper is only for exact fixed-scale inputs.
    """
    v = value * F.lit(float(10 ** scale))
    return (v + F.signum(v) * F.lit(0.5)).cast("long")


def exact_sum_scaled(value: Column, scale: int = 2) -> Column:
    """Aggregate expression: exact SUM of ``value`` rounded to
    ``scale`` decimals, computed in primitive long math.  Returns a
    decimal(38, scale) — cast to double at the edge if the consumer
    wants floats."""
    if not isinstance(scale, int) or not (0 <= scale <= 18):
        raise ValueError(
            f"exact_sum_scaled: scale must be an int in [0, 18], got {scale!r}"
        )
    v = scaled_long(value, scale)
    hi = F.sum((v / _M).cast("long")).cast("decimal(36,0)")
    lo = F.sum(v % _M)
    total = hi * F.lit(_M) + lo
    if scale == 0:
        # degenerate case: scaled image IS the value; no descale step
        return total.cast("decimal(38,0)")
    descale = F.lit("0." + "0" * (scale - 1) + "1").cast(
        f"decimal({scale + 1},{scale})"
    )
    return (total * descale).cast(f"decimal(38,{scale})")
