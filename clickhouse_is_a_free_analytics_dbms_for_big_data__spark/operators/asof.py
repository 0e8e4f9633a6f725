"""ASOF JOIN — match each left row with the temporally-closest right
row per key (backward: latest right.ts <= left.ts; forward: earliest
right.ts >= left.ts).

The 2017 reference predates ClickHouse's own ASOF JOIN, but the brief
treats it as a required custom operator for a time-series engine, and
every migration corpus has the shape (trades x quotes, clicks x
impressions).  Spark has no native ASOF, so this is the canonical
distributed composition:

    union(left tagged probe, right tagged build)
      -> ONE shuffle+sort on (keys..., ts, side)
      -> last non-null build payload per window row
      -> keep probe rows

One exchange, one sort, no join node at all — the same cost as a
window dedup, and strictly better than the naive range join (which
explodes to |L| x |R| candidate pairs per key before aggregation).
Skew note: a hot key serializes through one reducer like any window;
pre-split by coarse time bucket when a single key's history exceeds a
task (bucket boundaries then need a per-bucket seed row — not modeled
here).

Tie semantics: a build row AT the probe's exact timestamp matches
(``allow_exact_matches=True``, pandas merge_asof naming); with
``False`` the inequality is strict.  Multiple build rows sharing
(key, ts) are resolved deterministically to the one with the greatest
payload struct (documented, engine-independent).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts: str,
    value_cols: Sequence[str],
    direction: str = "backward",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Left ASOF join: every ``left`` row, plus ``value_cols`` from the
    matched ``right`` row (NULLs when no right row qualifies).

    ``left`` and ``right`` must both have ``keys`` and ``ts`` columns;
    ``value_cols`` exist on ``right`` only (or are overwritten).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    keys = list(keys)
    vals = list(value_cols)
    probe = left.drop(*[c for c in vals if c in left.columns]).withColumn(
        "__side", F.lit(1)
    )
    # collapse duplicate (key, ts) build rows to ONE deterministic
    # payload (greatest struct) so the match is engine-independent
    build = (
        right.select(*keys, ts, F.struct(*vals).alias("__payload"))
        .groupBy(*keys, ts)
        .agg(F.max("__payload").alias("__payload"))
        .withColumn("__side", F.lit(0))
    )
    u = probe.unionByName(build, allowMissingColumns=True)
    # order: build rows sort BEFORE probe rows at equal ts, so an
    # exact-ts build is visible to the probe; strict mode flips the
    # tag order so the probe precedes it instead
    side_order = F.col("__side") if allow_exact_matches else -F.col("__side")
    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(ts).asc(), side_order.asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = F.last("__payload", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(ts).desc(), side_order.asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = F.last("__payload", ignorenulls=True).over(w)
    out = (
        u.withColumn("__m", filled)
        .filter(F.col("__side") == 1)
        .select(
            *[c for c in left.columns if c not in vals],
            *[F.col(f"__m.{v}").alias(v) for v in vals],
        )
    )
    return out
