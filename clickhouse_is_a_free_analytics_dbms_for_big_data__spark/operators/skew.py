"""Skew mitigation: explicit key salting for the cases AQE cannot fix.

AQE's skew-join split (on in pkg/session.py) handles most runtime skew
by splitting oversized shuffle partitions, and Spark's partial (map-
side) aggregation already flattens skew for algebraic aggregates.  Two
shapes remain where an EXPLICIT salt is the only lever at 100 TB:

- a shuffle join whose hot key exceeds one task even after AQE splits
  (splitting helps the probe side but every split still joins the full
  matching build rows), or any join under a strategy AQE won't touch;
- non-reducing aggregates (collect_list/collect_set-style) where the
  hot key's entire value set lands on ONE reducer regardless of
  partial aggregation.

The reference's answer to the same problem is two-level aggregation —
Aggregator.cpp converts to a two-level hash table past a size
threshold and merges buckets in parallel; the salt here is the
shuffle-based equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__skew_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salts: int = 16,
) -> DataFrame:
    """Join a huge, key-skewed ``left`` against a ``right`` that is too
    big to broadcast: the left side gets a uniform per-row salt, the
    right side is replicated once per salt value, and the join key
    becomes (key, salt) — the hot key's rows spread over ``salts``
    tasks instead of one.  Cost model: right side shuffles ``salts``×
    its size; pick salts ≈ (hot-key rows / target task rows).

    Row-identical to the unsalted join for inner/left/left_semi (the
    replicated right contributes each match exactly once per salt, and
    every left row carries exactly one salt).  The salt is derived
    from the row CONTENT (xxhash64 over all left columns), so task
    retries and replays place every row in the same partition —
    ``monotonically_increasing_id`` would re-deal salts per attempt.
    Fully duplicate left rows share a salt, which only matters if the
    hot key's rows are also near-total duplicates.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports left-preserving joins, not {how!r} "
            "(a right/full join would multiply unmatched right rows "
            "by the salt count)"
        )
    keys = [on] if isinstance(on, str) else list(on)
    l = left.withColumn(
        _SALT,
        F.pmod(
            F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salts)
        ).cast("int"),
    )
    r = right.withColumn(
        _SALT,
        F.explode(F.sequence(F.lit(0), F.lit(salts - 1))),
    )
    return l.join(r, keys + [_SALT], how).drop(_SALT)


def salted_collect_set(
    df: DataFrame,
    group_keys: str | list[str],
    value_col: str,
    salts: int = 16,
) -> DataFrame:
    """collect_set per group without a single-reducer hotspot: partial
    sets per (keys, salt) — each bounded by the per-salt slice — then
    a final flatten + distinct per keys.  Two shuffles, but the second
    moves pre-deduplicated sets, not raw rows.  Output column:
    ``values`` (array, order not defined — sort before comparing)."""
    keys = [group_keys] if isinstance(group_keys, str) else list(group_keys)
    partial = (
        df.withColumn(
            _SALT,
            F.pmod(F.xxhash64(F.col(value_col)), F.lit(salts)).cast("int"),
        )
        .groupBy(*keys, _SALT)
        .agg(F.collect_set(value_col).alias("_vs"))
    )
    return (
        partial.groupBy(*keys)
        .agg(
            F.array_distinct(F.flatten(F.collect_list("_vs"))).alias(
                "values"
            )
        )
    )
