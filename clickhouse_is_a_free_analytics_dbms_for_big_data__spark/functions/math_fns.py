"""Math functions.

Reference: dbms/src/Functions/FunctionsMath.cpp: e, pi, exp, log, exp2,
log2, exp10, log10, sqrt, cbrt, erf, erfc, lgamma, tgamma, trig, pow.

erf/erfc have no Spark built-in: implemented as the Abramowitz-Stegun
7.1.26 polynomial approximation (|error| <= 1.5e-7) in pure Column
expressions — good enough for the reference's use (probability maths),
and it stays inside codegen.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from ._util import col_of

__all__ = [
    "e", "pi", "exp", "log", "exp2", "log2", "exp10", "log10", "sqrt",
    "cbrt", "sin", "cos", "tan", "asin", "acos", "atan", "pow_", "erf",
    "erfc", "lgamma", "tgamma",
]


def e() -> Column:
    return F.lit(math.e)


def pi() -> Column:
    return F.lit(math.pi)


def exp(x) -> Column:
    return F.exp(col_of(x))


def log(x) -> Column:
    return F.log(col_of(x))


def exp2(x) -> Column:
    return F.pow(F.lit(2.0), col_of(x))


def log2(x) -> Column:
    return F.log2(col_of(x))


def exp10(x) -> Column:
    return F.pow(F.lit(10.0), col_of(x))


def log10(x) -> Column:
    return F.log10(col_of(x))


def sqrt(x) -> Column:
    return F.sqrt(col_of(x))


def cbrt(x) -> Column:
    return F.cbrt(col_of(x))


def sin(x) -> Column:
    return F.sin(col_of(x))


def cos(x) -> Column:
    return F.cos(col_of(x))


def tan(x) -> Column:
    return F.tan(col_of(x))


def asin(x) -> Column:
    return F.asin(col_of(x))


def acos(x) -> Column:
    return F.acos(col_of(x))


def atan(x) -> Column:
    return F.atan(col_of(x))


def pow_(x, y) -> Column:
    return F.pow(col_of(x), col_of(y) if isinstance(y, (Column, str)) else F.lit(y))


def erf(x) -> Column:
    """Abramowitz-Stegun 7.1.26 rational approximation, |err| <= 1.5e-7."""
    x_ = col_of(x).cast("double")
    sign = F.when(x_ < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    ax = F.abs(x_)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * ax)
    poly = (
        t * F.lit(0.254829592)
        + t * t * F.lit(-0.284496736)
        + t * t * t * F.lit(1.421413741)
        + t * t * t * t * F.lit(-1.453152027)
        + t * t * t * t * t * F.lit(1.061405429)
    )
    # erf(±0) = ±0 exactly (IEEE odd function)
    return F.when(x_ == 0, F.lit(0.0)).otherwise(
        sign * (F.lit(1.0) - poly * F.exp(-ax * ax))
    )


def erfc(x) -> Column:
    return F.lit(1.0) - erf(x)


def lgamma(x) -> Column:
    """log|Gamma(x)| via Stirling/Lanczos approximation in expressions.
    Accurate to ~1e-10 for x > 0 (g=7, n=9 Lanczos coefficients)."""
    x_ = col_of(x).cast("double")
    coeffs = [
        676.5203681218851, -1259.1392167224028, 771.32342877765313,
        -176.61502916214059, 12.507343278686905, -0.13857109526572012,
        9.9843695780195716e-6, 1.5056327351493116e-7,
    ]
    z = x_ - 1.0
    acc = F.lit(0.99999999999980993)
    for i, c in enumerate(coeffs):
        acc = acc + F.lit(c) / (z + F.lit(float(i + 1)))
    t = z + F.lit(7.5)
    # poles at non-positive integers → +inf (the series would hit a
    # NULL-ing division by zero in Spark)
    return F.when(
        (x_ <= 0) & (F.floor(x_) == x_), F.lit(float("inf"))
    ).otherwise(
        F.lit(0.5 * math.log(2 * math.pi))
        + (z + F.lit(0.5)) * F.log(t)
        - t
        + F.log(acc)
    )


def tgamma(x) -> Column:
    """Gamma with libm edges: pole at 0 → +inf, negative integers →
    nan, exact factorials at small integer arguments."""
    x_ = col_of(x).cast("double")
    return (
        F.when(x_ == 0, F.lit(float("inf")))
        .when((x_ < 0) & (F.floor(x_) == x_), F.lit(float("nan")))
        .when(
            (F.floor(x_) == x_) & (x_ <= 21),
            F.factorial((x_ - 1).cast("int")).cast("double"),
        )
        .otherwise(F.exp(lgamma(x)))
    )
