"""windowFunnel-style analytics: max funnel depth per key within a
time window, built by COMPOSING forward ASOF joins.

ClickHouse's (later-era) windowFunnel searches, per key, for the
longest chain stage_1 -> stage_2 -> ... with non-decreasing timestamps
where every chained event falls within ``window`` seconds of the
stage-1 event.  The greedy earliest-next chain is optimal for any
fixed starting event (taking the earliest qualifying next stage can
only leave more window budget), so per-start greedy + max over starts
is exact.

Spark-first shape: one forward ASOF join per funnel stage
(operators/asof.py — union + single window pass each, no join node),
then a per-key max.  Total cost: (stages-1) shuffle+sort cycles over
the NARROW (key, ts) projections, never the raw event rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .asof import asof_join

# far-future sentinel: a broken chain probes with this ts, finds no
# (or an out-of-window) next stage, and scores no further levels
_FAR = "9999-01-01 00:00:00"


def window_funnel(
    df: DataFrame,
    key: str,
    ts_col: str,
    event_col: str,
    stages: Sequence[str],
    window_seconds: int,
    split_bucket: float | None = None,
    strict_increase: bool = False,
    strict_dedup: bool = False,
) -> DataFrame:
    """Per-key max funnel level (1..len(stages)); keys with no stage-1
    event are absent.  Chains allow equal timestamps between
    consecutive stages (ts_i <= ts_{i+1}); every chained event must
    satisfy ts_i <= ts_1 + window.

    ``strict_increase`` requires strictly increasing chain timestamps
    (ts_i < ts_{i+1}) — ClickHouse windowFunnel's strict_increase
    mode; greedy earliest-strictly-later stays optimal per start.

    ``strict_dedup`` (CH windowFunnel 'strict_dedup'): while searching
    for stage i+1 from ts_i, a REPEAT of any already-matched stage
    (1..i) occurring strictly after ts_i and strictly before the
    stage-(i+1) candidate interrupts the chain at level i.  One extra
    strict forward ASOF per (step, earlier stage) — O(stages²) narrow
    passes, each over (key, ts) projections only.  Ties: a duplicate
    AT the candidate's exact timestamp does not interrupt (documented;
    the reference's tie behavior is insertion-order-dependent, which a
    distributed sort cannot reproduce).

    ``split_bucket`` threads the ASOF hot-key pre-split (seconds per
    time bucket) through every stage join, so one key's event history
    never serializes through a single window task."""
    stages = list(stages)
    if len(stages) < 2:
        raise ValueError("window_funnel needs at least 2 stages")
    cur = df.filter(F.col(event_col) == stages[0]).select(
        F.col(key).alias(key), F.col(ts_col).alias("ts1")
    )
    for i, st in enumerate(stages[1:], start=2):
        build = df.filter(F.col(event_col) == st).select(
            F.col(key).alias(key),
            F.col(ts_col).alias("__ts"),
            F.col(ts_col).alias(f"ts{i}"),
        )
        probe = cur.withColumn(
            "__ts",
            F.coalesce(
                F.col(f"ts{i - 1}"), F.lit(_FAR).cast("timestamp")
            ),
        )
        cur = asof_join(
            probe, build, [key], "__ts", [f"ts{i}"],
            direction="forward", split_bucket=split_bucket,
            allow_exact_matches=not strict_increase,
        )
        if strict_dedup:
            # earliest repeat of each already-matched stage strictly
            # after the probe point; the chain survives only when the
            # stage-i candidate comes no later than every repeat
            dup_cols = []
            for j in range(1, i):
                dcol = f"__dup{i}_{j}"
                dup_cols.append(dcol)
                dup_build = df.filter(
                    F.col(event_col) == stages[j - 1]
                ).select(
                    F.col(key).alias(key),
                    F.col(ts_col).alias("__ts"),
                    F.col(ts_col).alias(dcol),
                )
                cur = asof_join(
                    cur, dup_build, [key], "__ts", [dcol],
                    direction="forward", split_bucket=split_bucket,
                    allow_exact_matches=False,
                )
            broke = F.coalesce(
                F.least(*dup_cols) < F.col(f"ts{i}")
                if len(dup_cols) > 1
                else F.col(dup_cols[0]) < F.col(f"ts{i}"),
                F.lit(False),
            )
            cur = cur.withColumn(
                f"ts{i}", F.when(~broke, F.col(f"ts{i}"))
            ).drop(*dup_cols)
        cur = cur.drop("__ts")
    # level = longest prefix within window; the per-stage indicator is
    # prefix-monotone because chained timestamps are non-decreasing
    deadline = F.col("ts1") + F.expr(f"INTERVAL {int(window_seconds)} SECONDS")
    level = F.lit(1)
    for i in range(2, len(stages) + 1):
        level = level + F.when(
            F.col(f"ts{i}").isNotNull() & (F.col(f"ts{i}") <= deadline),
            F.lit(1),
        ).otherwise(F.lit(0))
    return (
        cur.withColumn("__lvl", level)
        .groupBy(key)
        .agg(F.max("__lvl").cast("int").alias("level"))
    )


def window_funnel_strict_order(
    df: DataFrame,
    key: str,
    ts_col: str,
    event_col: str,
    stages: Sequence[str],
    window_seconds: int,
) -> DataFrame:
    """windowFunnel 'strict_order' mode: interleaving events break the
    chain — stage i+1 must be the IMMEDIATELY NEXT event in the key's
    timeline (ClickHouse windowFunnel('strict_order')).

    That consecutiveness makes the windowed-ASOF composition
    unnecessary: per key, sort events once and check the next
    ``len(stages)-1`` events with ``lead()`` — the chain for a start
    at position p is exactly events p, p+1, ..., so the level is the
    longest matching prefix of leads within the window.  ONE
    shuffle+sort total (the window), then a per-key max.

    Keys with no stage-1 event are absent (same contract as
    ``window_funnel``).  Ties: equal-ts events order by event value
    (deterministic, documented — the reference's order within equal
    timestamps is insertion order, which a distributed sort cannot
    reproduce)."""
    from pyspark.sql import Window

    stages = list(stages)
    if len(stages) < 2:
        raise ValueError("window_funnel_strict_order needs at least 2 stages")
    w = Window.partitionBy(key).orderBy(
        F.col(ts_col).asc_nulls_last(), F.col(event_col)
    )
    cur = df.select(key, ts_col, event_col)
    for j in range(1, len(stages)):
        cur = cur.withColumn(f"__e{j}", F.lead(event_col, j).over(w))
        cur = cur.withColumn(f"__t{j}", F.lead(ts_col, j).over(w))
    deadline = F.col(ts_col) + F.expr(
        f"INTERVAL {int(window_seconds)} SECONDS"
    )
    level = F.lit(1)
    ok = F.lit(True)
    for j, st in enumerate(stages[1:], start=1):
        ok = ok & (
            (F.col(f"__e{j}") == st)
            & F.col(f"__t{j}").isNotNull()
            & (F.col(f"__t{j}") <= deadline)
        )
        level = level + F.when(ok, 1).otherwise(0)
    return (
        cur.filter(F.col(event_col) == stages[0])
        .withColumn("__lvl", level)
        .groupBy(key)
        .agg(F.max("__lvl").cast("int").alias("level"))
    )


def retention(
    df: DataFrame,
    key: str,
    conds: Sequence[Column],
) -> DataFrame:
    """ClickHouse ``retention(cond1, ..., condN)``: per key, an array
    of 0/1 flags where ``r[0]`` = some event satisfied cond1 and
    ``r[i]`` = cond1 AND cond_{i+1} were both satisfied (by any events
    of the key — the classic day-0/day-N cohort-retention aggregate).

    Spark-first: one groupBy with ``max(cond)`` per condition and an
    ``array()`` projection — a single partial+final agg shuffle, no
    windows, no joins."""
    conds = list(conds)
    if not conds:
        raise ValueError("retention needs at least one condition")
    aggs = [
        F.max(c.cast("int")).alias(f"__c{i}") for i, c in enumerate(conds)
    ]
    grouped = df.groupBy(key).agg(*aggs)
    first = F.coalesce(F.col("__c0"), F.lit(0))
    flags = [first] + [
        first * F.coalesce(F.col(f"__c{i}"), F.lit(0))
        for i in range(1, len(conds))
    ]
    return grouped.select(
        key, F.array(*flags).alias("r")
    )
