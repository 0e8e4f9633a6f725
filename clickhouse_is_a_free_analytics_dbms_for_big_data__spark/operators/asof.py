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

Skew: by default a hot key serializes through one reducer like any
window.  ``split_bucket`` enables the time-bucket pre-split: both
sides bucket by ``floor(ts / width)`` and the window partitions on
(key, bucket), so one key's history spreads over many tasks.  Each
probe bucket gets ONE injected seed row — the build row the unsplit
window would carry across the bucket boundary (greatest (ts, payload)
from earlier buckets for backward; smallest ts / greatest payload
from later buckets for forward) — so results are exactly equal to the
unsplit operator.  The seed pass runs on per-bucket aggregates (one
row per key x bucket), not on data rows.

Tie semantics: a build row AT the probe's exact timestamp matches
(``allow_exact_matches=True``, pandas merge_asof naming); with
``False`` the inequality is strict.  Multiple build rows sharing
(key, ts) are resolved deterministically to the one with the greatest
payload struct (documented, engine-independent).

NULL-timestamp contract: a NULL ts never satisfies a temporal
inequality (same as DuckDB's ASOF JOIN and SQL comparison semantics) —
build rows with NULL ts are dropped, probe rows with NULL ts come out
with NULL value columns.  The window orders NULL-ts probes FIRST in
both directions so they can never see a build row.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _epoch(ts_col, dtype: str):
    """Exact sortable integer image of the ts column (unix micros for
    timestamps, the raw value for numerics) — used only by the
    pre-split's bucket and seed math."""
    if dtype.startswith("timestamp"):
        return F.unix_micros(ts_col.cast("timestamp"))
    return ts_col


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts: str,
    value_cols: Sequence[str],
    direction: str = "backward",
    allow_exact_matches: bool = True,
    split_bucket: float | None = None,
) -> DataFrame:
    """Left ASOF join: every ``left`` row, plus ``value_cols`` from the
    matched ``right`` row (NULLs when no right row qualifies).

    ``left`` and ``right`` must both have ``keys`` and ``ts`` columns;
    ``value_cols`` exist on ``right`` only (or are overwritten).

    ``split_bucket``: hot-key pre-split width — seconds for timestamp
    ``ts``, the column's own unit for numeric ``ts``.  Pick it so one
    key's densest bucket fits a task (e.g. 3600 for a key logging
    ~1k rows/s).  Results are identical to the unsplit operator.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    backward = direction == "backward"
    keys = list(keys)
    vals = list(value_cols)
    probe = left.drop(*[c for c in vals if c in left.columns]).withColumn(
        "__side", F.lit(1)
    )
    # NULL-ts build rows can never qualify (NULL fails both inequality
    # directions); dropping them here also keeps them out of the seed
    # aggregates below
    build = (
        right.filter(F.col(ts).isNotNull())
        .select(*keys, ts, F.struct(*vals).alias("__payload"))
        .withColumn("__side", F.lit(0))
    )
    part_keys: list = list(keys)
    if split_bucket is not None:
        ts_dtype = dict(right.dtypes)[ts]
        width = (
            int(split_bucket * 1_000_000)
            if ts_dtype.startswith("timestamp")
            else split_bucket
        )
        bucket_col = F.floor(_epoch(F.col(ts), ts_dtype) / F.lit(width))
        probe = probe.withColumn("__b", bucket_col)
        build = build.withColumn("__b", bucket_col)
        part_keys.append("__b")
        # per (key, bucket) EDGE row — the build row the unsplit window
        # would carry across this bucket's boundary, reduced under the
        # same total order the window uses: (ts, payload) lexicographic
        # ascending, greatest wins (backward); for forward, negate the
        # exact epoch so max() picks min-ts-then-greatest-payload
        o = _epoch(F.col(ts), ts_dtype)
        edge_key = F.struct(
            (o if backward else -o).alias("o"),
            F.col("__payload").alias("p"),
            F.col(ts).alias("t"),
        )
        # bucket spine = probe buckets (need seeds) + build buckets
        # (supply seeds); one row per key x bucket — tiny vs data rows.
        # ONE partial-aggregated groupBy over the tagged union computes
        # both the per-bucket edge row (max edge_key over build rows;
        # probe rows contribute NULL, which max ignores) and the
        # has-probe flag — the former edge-agg + spine-agg + join-back
        # shape paid three exchanges for the same rows (r12, guide
        # §2.4; result-identical by construction, covered by the
        # split-vs-unsplit equivalence property test).
        spine = (
            build.select(
                *keys, "__b", edge_key.alias("__ek"), F.lit(0).alias("__hasp")
            )
            .unionByName(
                probe.filter(F.col("__b").isNotNull()).select(
                    *keys, "__b", F.lit(1).alias("__hasp")
                ),
                allowMissingColumns=True,
            )
            .groupBy(*keys, "__b")
            .agg(
                F.max("__ek").alias("__e"),
                F.max("__hasp").alias("__hasp"),
            )
        )
        seed_w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__b").asc() if backward else F.col("__b").desc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        seeds = (
            spine.withColumn("__seed", F.max("__e").over(seed_w))
            .filter((F.col("__hasp") == 1) & F.col("__seed").isNotNull())
            .select(
                *keys,
                F.col("__seed.t").alias(ts),
                F.col("__seed.p").alias("__payload"),
                F.lit(0).alias("__side"),
                "__b",
            )
        )
        build = build.unionByName(seeds)
    u = probe.unionByName(build, allowMissingColumns=True)
    # order: build rows sort BEFORE probe rows at equal ts, so an
    # exact-ts build is visible to the probe; strict mode flips the
    # tag order so the probe precedes it instead.  Duplicate (key, ts)
    # build rows are resolved INSIDE the window order — payload asc
    # puts the greatest struct last, and last() takes it — instead of
    # a pre-aggregation, which would cost an extra exchange plus two
    # sort passes over the build side (measured r9: the benched entry
    # went 0.91 -> 0.67 s at sf0.1; what remains is the two input
    # scans at 0.38 s plus one window pass).
    side_order = F.col("__side") if allow_exact_matches else -F.col("__side")
    # NULLS FIRST in BOTH directions: a NULL-ts probe must precede
    # every (non-null-ts) build row so it accumulates no payload —
    # plain desc would be NULLS LAST and spuriously match the
    # smallest-ts build (the NULL-ts contract above)
    ts_order = (
        F.col(ts).asc_nulls_first()
        if backward
        else F.col(ts).desc_nulls_first()
    )
    w = (
        Window.partitionBy(*part_keys)
        .orderBy(ts_order, side_order.asc(), F.col("__payload").asc())
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
