"""Aggregate-function dialect + combinators.

Reference: dbms/src/AggregateFunctions/ (registry
AggregateFunctionFactory.cpp:65-77; combinators :51-55).  Every
builder returns a Column aggregate expression usable in
``df.agg(...)`` / ``groupBy().agg(...)``; Spark plans them as partial +
final HashAggregate (the reference's WithMergeableState two-phase
split, Core/QueryProcessingStage.h — automatic here).

Combinators:
- ``-If``    -> agg(F.when(cond, x))                 (agg_if)
- ``-Array`` -> explode-free higher-order rewrite    (sum_array, ...)
- ``-State``/``-Merge`` -> typed struct partial states (state module,
  see sources/mergetree.py AggregatingMergeTree support)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ._util import col_of

__all__ = [
    "count_", "countIf", "sum_", "sumIf", "min_", "max_", "avg_",
    "any_", "anyLast", "anyHeavy", "argMin", "argMax", "uniq",
    "uniqExact", "uniqHLL12", "uniqCombined", "uniqUpTo", "groupArray",
    "groupUniqArray", "quantile", "quantiles", "quantileExact",
    "quantileTiming", "quantileTDigest", "median", "varPop", "varSamp",
    "stddevPop", "stddevSamp", "covarPop", "covarSamp", "corr_",
    "agg_if", "sum_array", "avg_array", "count_array", "sumMap",
    "quantileDeterministic", "quantileExactWeighted",
    "sumForEach", "minForEach", "maxForEach", "avgForEach",
    "countForEach", "for_each",
]


def count_(x=None) -> Column:
    return F.count(F.lit(1)) if x is None else F.count(col_of(x))


def countIf(cond) -> Column:
    return F.count(F.when(col_of(cond), F.lit(1)))


def sum_(x) -> Column:
    return F.sum(col_of(x))


def sumIf(x, cond) -> Column:
    return F.sum(F.when(col_of(cond), col_of(x)))


def min_(x) -> Column:
    return F.min(col_of(x))


def max_(x) -> Column:
    return F.max(col_of(x))


def avg_(x) -> Column:
    return F.avg(col_of(x))


def any_(x, order=None) -> Column:
    """any() — 'some value, cheapest to compute'.  The reference takes
    the first in stream order (AggregateFunctionsMinMaxAny.h); Spark's
    equivalent cheap pick is first() (non-deterministic across runs —
    pass ``order`` for a deterministic min_by)."""
    if order is not None:
        return F.min_by(col_of(x), col_of(order))
    return F.first(col_of(x), ignorenulls=True)


def anyLast(x, order=None) -> Column:
    if order is not None:
        return F.max_by(col_of(x), col_of(order))
    return F.last(col_of(x), ignorenulls=True)


def anyHeavy(x) -> Column:
    """Heavy-hitter sketch in the reference; Spark 3.4+ mode() is the
    exact analog (most frequent value)."""
    return F.mode(col_of(x))


def argMin(arg, val) -> Column:
    return F.min_by(col_of(arg), col_of(val))


def argMax(arg, val) -> Column:
    return F.max_by(col_of(arg), col_of(val))


# The reference's HLL error profile, mapped onto Spark's HLL++ rsd
# knob: uniq/uniqHLL12 use 2^12 registers (HyperLogLogCounter<12>,
# AggregateFunctionUniq.h) — standard error 1.04/sqrt(2^12) ~= 0.0163;
# uniqCombined's HLL stage uses 2^17 registers
# (CombinedCardinalityEstimator.h) ~= 1.04/sqrt(2^17) ~= 0.0029.
# Matching the register budget matches both accuracy AND per-group
# sketch memory at 100 TB scale.
UNIQ_HLL12_RSD = 1.04 / (2 ** 12) ** 0.5
UNIQ_COMBINED_RSD = 1.04 / (2 ** 17) ** 0.5


def uniq(x, rsd: float = UNIQ_HLL12_RSD) -> Column:
    """uniq() — HLL-family approximate distinct
    (AggregateFunctionUniq.h:52-69 HyperLogLogWithSmallSetOptimization);
    Spark approx_count_distinct is HLL++ with the same contract, pinned
    to the reference's 2^12-register error profile."""
    return F.approx_count_distinct(col_of(x), rsd)


def uniqExact(x) -> Column:
    return F.countDistinct(col_of(x))


def uniqHLL12(x) -> Column:
    return F.approx_count_distinct(col_of(x), UNIQ_HLL12_RSD)


def uniqCombined(x) -> Column:
    return F.approx_count_distinct(col_of(x), UNIQ_COMBINED_RSD)


def uniqUpTo(n: int):
    """uniqUpTo(N)(x): exact distinct count if <= N else N+1
    (AggregateFunctionUniqUpTo.h)."""

    def agg(x) -> Column:
        exact = F.size(F.slice(F.collect_set(col_of(x)), 1, n + 1))
        return F.least(exact, F.lit(n + 1))

    return agg


def groupArray(x, max_size: int | None = None) -> Column:
    arr = F.collect_list(col_of(x))
    return F.slice(arr, 1, max_size) if max_size else arr


def groupUniqArray(x) -> Column:
    return F.collect_set(col_of(x))


def quantile(x, level: float = 0.5) -> Column:
    """quantile() is sampling-based in the reference (ReservoirSampler.h)
    — approximate by contract, so percentile_approx matches the spirit.
    Use quantileExact for oracle-comparable results."""
    return F.percentile_approx(col_of(x), level, 10000)


def quantiles(x, *levels: float) -> Column:
    return F.percentile_approx(col_of(x), list(levels), 10000)


def quantileExact(x, level: float = 0.5) -> Column:
    return F.percentile(col_of(x), level)


def quantilesExact(x, *levels: float) -> Column:
    """quantilesExact(x, l1, l2, ...) — the reference's multi-level
    exact-quantile form (AggregateFunctionQuantile.h: ONE state array
    serves every level).  percentile(col, array(levels)) buffers and
    sorts each group's values once; N separate percentile aggregates
    would keep N copies (r11: fn_quantiles 2x faster at sf0.1)."""
    return F.percentile(col_of(x), F.array(*[F.lit(l) for l in levels]))


def quantileTiming(x, level: float = 0.5) -> Column:
    """Fixed-bucket timing quantile (AggregateFunctionQuantileTiming.h);
    ms-resolution bucketing == percentile on rounded values."""
    return F.percentile(F.round(col_of(x)).cast("long"), level)


def quantileTDigest(x, level: float = 0.5) -> Column:
    return F.percentile_approx(col_of(x), level, 100)


def quantileDeterministic(x, determinator=None, level: float = 0.5) -> Column:
    """quantileDeterministic(x, determinator) — the reference seeds its
    reservoir sampler from ``determinator`` so repeated runs agree
    (AggregateFunctionQuantileExact.h family / ReservoirSamplerDeterministic).
    Here the quantile is computed EXACTLY, which is deterministic by
    construction — a strict superset of the reference's guarantee — so
    the determinator only documents intent."""
    return F.percentile(col_of(x), level)


def quantileExactWeighted(x, weight, level: float = 0.5) -> Column:
    """quantileExactWeighted(x, w): exact quantile where each value
    counts ``w`` times (AggregateFunctionQuantileExactWeighted.h) —
    Spark's percentile(expr, pct, frequency) implements precisely this
    weighted form (frequency must be a positive integral column)."""
    return F.percentile(col_of(x), level, col_of(weight).cast("long"))


def median(x) -> Column:
    return quantile(x, 0.5)


# ---- -ForEach combinator ----------------------------------------------------
# Reference: AggregateFunctions/AggregateFunctionForEach.h (factory
# registration AggregateFunctionFactory.cpp:51-55): agg applied
# per array index across rows; result length = longest input array,
# missing trailing values behave as absent (null-skipped).


def _for_each(arrays: Column, merge) -> Column:
    """Elementwise fold over collected arrays: zip_with pads the
    shorter side with NULL, so ``merge`` sees null for absent values.
    The collect_list holds one group's arrays transiently — fine for
    the reference's use (small per-group maps); for huge groups prefer
    the relational posexplode+groupBy(pos) form."""
    return F.aggregate(
        F.collect_list(arrays),
        F.array().cast("array<double>"),
        lambda acc, arr: F.zip_with(acc, arr.cast("array<double>"), merge),
    )


def sumForEach(arr) -> Column:
    return _for_each(
        col_of(arr), lambda a, b: F.coalesce(a, F.lit(0.0)) + F.coalesce(b, F.lit(0.0))
    )


def minForEach(arr) -> Column:
    return _for_each(col_of(arr), lambda a, b: F.least(a, b))


def maxForEach(arr) -> Column:
    return _for_each(col_of(arr), lambda a, b: F.greatest(a, b))


def countForEach(arr) -> Column:
    return _for_each(
        col_of(arr),
        lambda a, b: F.coalesce(a, F.lit(0.0))
        + F.when(b.isNotNull(), F.lit(1.0)).otherwise(F.lit(0.0)),
    )


def avgForEach(arr) -> Column:
    return F.zip_with(
        sumForEach(arr), countForEach(arr), lambda s, c: s / c
    )


_FOR_EACH = {
    "sum": sumForEach, "min": minForEach, "max": maxForEach,
    "avg": avgForEach, "count": countForEach,
}


def for_each(agg_name: str, arr) -> Column:
    """Dispatch `<agg>ForEach` by name (the factory-combinator form)."""
    try:
        return _FOR_EACH[agg_name](arr)
    except KeyError:
        raise ValueError(
            f"-ForEach supports {sorted(_FOR_EACH)}, got {agg_name!r}"
        ) from None


def varPop(x) -> Column:
    return F.var_pop(col_of(x))


def varSamp(x) -> Column:
    return F.var_samp(col_of(x))


def stddevPop(x) -> Column:
    return F.stddev_pop(col_of(x))


def stddevSamp(x) -> Column:
    return F.stddev_samp(col_of(x))


def covarPop(x, y) -> Column:
    return F.covar_pop(col_of(x), col_of(y))


def covarSamp(x, y) -> Column:
    return F.covar_samp(col_of(x), col_of(y))


def corr_(x, y) -> Column:
    return F.corr(col_of(x), col_of(y))


def agg_if(agg_fn, x, cond) -> Column:
    """Generic -If combinator: agg_if(F.sum, x, cond) == sumIf(x, cond).
    (AggregateFunctionIf.h — skip rows failing cond.)"""
    return agg_fn(F.when(col_of(cond), col_of(x)))


def sum_array(x) -> Column:
    """sumArray(arr): sum over all elements of all arrays
    (-Array combinator, AggregateFunctionArray.h)."""
    per_row = F.aggregate(
        col_of(x), F.lit(0.0), lambda acc, v: acc + v.cast("double")
    )
    return F.sum(per_row)


def avg_array(x) -> Column:
    total = sum_array(x)
    cnt = F.sum(F.size(col_of(x)))
    return total / cnt


def count_array(x) -> Column:
    return F.sum(F.size(col_of(x)))


def sumMap(keys, values) -> Column:
    """sumMap(k, v): per-key sums over aligned key/value arrays —
    returns map<key, sum> (reference SummingSortedBlockInputStream's
    nested-Map summation, used by SummingMergeTree).

    Expression-only: explode-free per-row zip, then map_from_entries
    after a flatten + group in the caller is impossible inside one agg,
    so this aggregates via flatten + aggregate over collected pairs.
    For large maps prefer the relational form (explode + groupBy).
    """
    pairs = F.flatten(
        F.collect_list(
            F.zip_with(
                col_of(keys),
                col_of(values),
                lambda k, v: F.struct(k.alias("k"), v.cast("double").alias("v")),
            )
        )
    )
    ks = F.array_distinct(F.transform(pairs, lambda p: p.getField("k")))
    return F.map_from_arrays(
        F.array_sort(ks),
        F.transform(
            F.array_sort(ks),
            lambda k: F.aggregate(
                F.filter(pairs, lambda p: p.getField("k") == k),
                F.lit(0.0),
                lambda acc, p: acc + p.getField("v"),
            ),
        ),
    )
