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

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from ._util import col_of

__all__ = [
    "sumState", "sumMerge", "countState", "countMerge", "minState",
    "minMerge", "maxState", "maxMerge", "avgState", "avgMerge",
    "uniqState", "uniqMerge", "uniqStateEstimate", "groupArrayState",
    "groupArrayMerge", "groupUniqArrayState", "groupUniqArrayMerge",
    "argMinState", "argMinMerge", "argMaxState", "argMaxMerge",
    "quantileExactState", "quantileExactMerge", "quantilesExactMerge",
    "sequenceState", "sequenceMatchMerge", "sequenceCountMerge",
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
    reference's uniq state.  lgConfigK=14: exact through ~10^3-10^4
    like the reference's small-set optimization
    (AggregateFunctionUniq.h HyperLogLogWithSmallSetOptimization),
    ~0.5% beyond."""
    return F.hll_sketch_agg(col_of(x), 14)


def uniqMerge(state) -> Column:
    return F.hll_sketch_estimate(F.hll_union_agg(col_of(state)))


def uniqStateEstimate(state) -> Column:
    """Finalize a single sketch without merging (finalizeAggregation)."""
    return F.hll_sketch_estimate(col_of(state))


def groupArrayState(x) -> Column:
    return F.collect_list(col_of(x))


def groupArrayMerge(state) -> Column:
    return F.flatten(F.collect_list(col_of(state)))


def groupUniqArrayState(x) -> Column:
    return F.collect_set(col_of(x))


def groupUniqArrayMerge(state) -> Column:
    return F.array_distinct(F.flatten(F.collect_list(col_of(state))))


def argMinState(val, cmp) -> Column:
    """State = struct<k, v> of the best (k, val) so far.  Struct min
    orders by k then v — the reference keeps the first-seen row on
    ties (AggregateFunctionsArgMinMax.h), which is stream-order
    dependent; the v tie-break makes it deterministic instead."""
    return F.min(F.struct(col_of(cmp).alias("k"), col_of(val).alias("v")))


def argMinMerge(state) -> Column:
    return F.min(col_of(state)).getField("v")


def argMaxState(val, cmp) -> Column:
    return F.max(F.struct(col_of(cmp).alias("k"), col_of(val).alias("v")))


def argMaxMerge(state) -> Column:
    return F.max(col_of(state)).getField("v")


def quantileExactState(x) -> Column:
    """quantileExact state = the exact value multiset
    (AggregateFunctionQuantileExact.h keeps a plain value array)."""
    return F.collect_list(col_of(x))


def _nth_of_sorted(arr: Column, level: float) -> Column:
    """The reference's nth_element rule: n = level * size (clamped to
    size-1), 0-based (AggregateFunctionQuantileExact.h)."""
    from ._util import let_

    return let_(
        F.array_sort(arr),
        lambda a: F.element_at(
            a,
            (
                F.least(
                    F.floor(F.size(a) * F.lit(level)),
                    (F.size(a) - 1).cast("bigint"),
                )
                + 1
            ).cast("int"),
        ),
    )


def quantileExactMerge(state, level: float = 0.5) -> Column:
    return _nth_of_sorted(F.flatten(F.collect_list(col_of(state))), level)


def quantilesExactMerge(state, levels: Sequence[float]) -> Column:
    from ._util import let_

    return let_(
        F.flatten(F.collect_list(col_of(state))),
        lambda merged: F.array(
            *[_nth_of_sorted(merged, lv) for lv in levels]
        ),
    )


def sequenceState(ts, conds) -> Column:
    """sequenceMatch/Count state = the (time, condition-digit) event
    list (AggregateFunctionSequenceMatch.h stores (timestamp, bitset)
    events; merge concatenates then sorts)."""
    from ..operators.sequence_match import _cond_char

    return F.collect_list(
        F.struct(col_of(ts).alias("t"), _cond_char(conds).alias("c"))
    )


def sequenceMatchMerge(pattern: str, state) -> Column:
    from ..operators.sequence_match import _pattern_to_regex

    merged = F.flatten(F.collect_list(col_of(state)))
    encoded = F.array_join(
        F.transform(F.array_sort(merged), lambda s: s.getField("c")), ""
    )
    return encoded.rlike(_pattern_to_regex(pattern)).cast("int")


def sequenceCountMerge(pattern: str, state) -> Column:
    import re as _re

    from ..operators.sequence_match import _pattern_to_regex

    merged = F.flatten(F.collect_list(col_of(state)))
    encoded = F.array_join(
        F.transform(F.array_sort(merged), lambda s: s.getField("c")), ""
    )
    regex = _pattern_to_regex(pattern)
    if _re.match(f"(?:{regex})$", ""):
        # empty-matchable: forced-progress rule — one event per match
        return F.length(encoded).cast("long")
    return F.size(
        F.regexp_extract_all(encoded, F.lit(f"({regex})"), 1)
    ).cast("long")
