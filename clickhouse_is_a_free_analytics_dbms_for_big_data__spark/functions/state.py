"""-State / -Merge combinator emulation: partial-aggregate handoff.

Reference: AggregateFunctionState.h / AggregateFunctionMerge.h and the
AggregateFunction(f, T...) column type
(DataTypes/DataTypeAggregateFunction.h) — opaque partial states stored
in a table (AggregatingMergeTree) and finalized at read time.

Spark has no public opaque-state type, so states are *typed columns*
(SURVEY.md §7 hard part):

- sum/min/max/count: state == plain value (merge = same agg)
- avg:   struct<sum double, cnt bigint>
- uniq:  Spark's HLL sketch binary (hll_sketch_agg / hll_union_agg —
  a real mergeable sketch, same contract as the reference's HLL state)
- groupArray: array (merge = flatten)

Each fn has fState (partial agg expression), fMerge (merge partial
states), and the state schema is ordinary Catalyst metadata — states
survive parquet round-trips, which is exactly what AggregatingMergeTree
needs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ._util import col_of

__all__ = [
    "sumState", "sumMerge", "countState", "countMerge", "minState",
    "minMerge", "maxState", "maxMerge", "avgState", "avgMerge",
    "uniqState", "uniqMerge", "uniqStateEstimate", "groupArrayState",
    "groupArrayMerge",
]


def sumState(x) -> Column:
    return F.sum(col_of(x))


def sumMerge(state) -> Column:
    return F.sum(col_of(state))


def countState(x=None) -> Column:
    return F.count(F.lit(1)) if x is None else F.count(col_of(x))


def countMerge(state) -> Column:
    return F.sum(col_of(state))


def minState(x) -> Column:
    return F.min(col_of(x))


def minMerge(state) -> Column:
    return F.min(col_of(state))


def maxState(x) -> Column:
    return F.max(col_of(x))


def maxMerge(state) -> Column:
    return F.max(col_of(state))


def avgState(x) -> Column:
    x_ = col_of(x)
    return F.struct(
        F.sum(x_.cast("double")).alias("sum"),
        F.count(x_).alias("cnt"),
    )


def avgMerge(state) -> Column:
    s = col_of(state)
    return F.sum(s.getField("sum")) / F.sum(s.getField("cnt"))


def uniqState(x) -> Column:
    """Mergeable HLL sketch (binary) — the real analog of the
    reference's uniq state."""
    return F.hll_sketch_agg(col_of(x))


def uniqMerge(state) -> Column:
    return F.hll_sketch_estimate(F.hll_union_agg(col_of(state)))


def uniqStateEstimate(state) -> Column:
    """Finalize a single sketch without merging (finalizeAggregation)."""
    return F.hll_sketch_estimate(col_of(state))


def groupArrayState(x) -> Column:
    return F.collect_list(col_of(x))


def groupArrayMerge(state) -> Column:
    return F.flatten(F.collect_list(col_of(state)))
