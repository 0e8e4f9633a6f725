"""ASOF JOIN semantics + plan shape (operators/asof.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.operators.asof import (
    asof_join,
)


def _probe(spark):
    return spark.createDataFrame(
        [(1, 10), (1, 20), (1, 3), (2, 7)], "k long, ts long"
    )


def _build(spark):
    return spark.createDataFrame(
        [(1, 5, "a"), (1, 15, "b"), (1, 20, "c"), (3, 1, "z")],
        "k long, ts long, v string",
    )


def test_asof_backward(spark):
    got = {
        (r.k, r.ts): r.v
        for r in asof_join(
            _probe(spark), _build(spark), ["k"], "ts", ["v"]
        ).collect()
    }
    # ts=3: no build <= 3 -> NULL; ts=10 -> 'a'(5); ts=20 -> exact 'c';
    # k=2 has no build rows at all -> NULL
    assert got == {(1, 3): None, (1, 10): "a", (1, 20): "c", (2, 7): None}


def test_asof_backward_strict(spark):
    got = {
        (r.k, r.ts): r.v
        for r in asof_join(
            _probe(spark), _build(spark), ["k"], "ts", ["v"],
            allow_exact_matches=False,
        ).collect()
    }
    # strict: ts=20 must NOT see the ts=20 build row -> 'b'(15)
    assert got[(1, 20)] == "b"
    assert got[(1, 10)] == "a"


def test_asof_forward(spark):
    got = {
        (r.k, r.ts): r.v
        for r in asof_join(
            _probe(spark), _build(spark), ["k"], "ts", ["v"],
            direction="forward",
        ).collect()
    }
    # earliest build >= probe: ts=3 -> 'a'(5); ts=10 -> 'b'(15);
    # ts=20 -> exact 'c'; k=2 -> NULL
    assert got == {(1, 3): "a", (1, 10): "b", (1, 20): "c", (2, 7): None}


def test_asof_duplicate_build_ts_deterministic(spark):
    build = spark.createDataFrame(
        [(1, 5, "a"), (1, 5, "zz")], "k long, ts long, v string"
    )
    probe = spark.createDataFrame([(1, 10)], "k long, ts long")
    rows = asof_join(probe, build, ["k"], "ts", ["v"]).collect()
    # duplicate (k, ts) build rows resolve to the GREATEST payload
    assert rows[0].v == "zz"


def test_asof_plan_single_exchange_no_join(spark):
    from tests.test_plan_shapes import _n_exchanges, _plan

    df = asof_join(_probe(spark), _build(spark), ["k"], "ts", ["v"])
    plan = _plan(df)
    assert "Join" not in plan  # union+window composition, no join node
    # probe-side exchange + build-side agg may each exchange; the
    # window itself adds exactly one — no more than 3 total, and the
    # raw tables are never cartesian-expanded
    assert _n_exchanges(plan) <= 3
    assert "CartesianProduct" not in plan


def test_asof_null_ts_contract(spark):
    """NULL ts never satisfies a temporal inequality (DuckDB ASOF /
    SQL comparison semantics): NULL-ts probes yield NULL value columns
    in BOTH directions, and NULL-ts build rows are ignored."""
    probe = spark.createDataFrame(
        [(1, None), (1, 10)], "k long, ts long"
    )
    build = spark.createDataFrame(
        [(1, 5, "a"), (1, None, "ghost")], "k long, ts long, v string"
    )
    for direction in ("backward", "forward"):
        got = {
            (r.k, r.ts): r.v
            for r in asof_join(
                probe, build, ["k"], "ts", ["v"], direction=direction
            ).collect()
        }
        assert got[(1, None)] is None, direction
        # the NULL-ts build row must never be the match
        assert got[(1, 10)] in ("a", None) and got[(1, 10)] != "ghost"
    # and the non-null cases still resolve correctly around the ghost
    back = asof_join(probe, build, ["k"], "ts", ["v"]).collect()
    assert {(r.k, r.ts): r.v for r in back}[(1, 10)] == "a"


def _hot_key_frames(spark):
    """One hot key with 1e5 build + 1e5 probe rows (duplicate build
    timestamps via the %50000 wrap), a sparse key, a probe-only key,
    probes stretching past the build range (seed must carry across
    build-less buckets), and NULL-ts rows on both sides."""
    build = spark.range(100_000).selectExpr(
        "CAST(1 AS LONG) AS k",
        "CAST((id * 7) % 50000 AS LONG) AS ts",
        "CAST(id AS STRING) AS v",
    )
    sparse = spark.createDataFrame(
        [(2, 100, "s1"), (2, 40_000, "s2"), (2, None, "s3")],
        "k long, ts long, v string",
    )
    build = build.unionByName(sparse)
    probe = spark.range(100_000).selectExpr(
        "CAST(1 AS LONG) AS k",
        "CAST((id * 13 + 3) % 120000 AS LONG) AS ts",
    )
    extras = spark.createDataFrame(
        [(2, 50), (2, 99_999), (3, 10), (1, None)], "k long, ts long"
    )
    return probe.unionByName(extras), build


@pytest.mark.slow
def test_asof_hot_key_split_equivalent(spark):
    """split_bucket (time-bucket pre-split + per-bucket seed rows) is
    result-identical to the unsplit operator on a hot-key fixture, in
    both directions and in strict mode."""
    probe, build = _hot_key_frames(spark)
    nskey = lambda t: tuple((x is None, x) if x is not None else (True, 0)  # noqa: E731
                            for x in t)
    for direction in ("backward", "forward"):
        for exact in (True, False):
            base = sorted(
                ((r.k, r.ts, r.v)
                 for r in asof_join(
                     probe, build, ["k"], "ts", ["v"],
                     direction=direction, allow_exact_matches=exact,
                 ).collect()),
                key=nskey,
            )
            split = sorted(
                ((r.k, r.ts, r.v)
                 for r in asof_join(
                     probe, build, ["k"], "ts", ["v"],
                     direction=direction, allow_exact_matches=exact,
                     split_bucket=1000,
                 ).collect()),
                key=nskey,
            )
            assert split == base, (direction, exact)


def test_asof_split_window_partitions_on_bucket(spark):
    """The pre-split's window must partition on (key, bucket) — that
    IS the skew escape; a plan that still windows on the bare key
    would serialize the hot key through one task."""
    probe, build = _hot_key_frames(spark)
    df = asof_join(
        probe, build, ["k"], "ts", ["v"], split_bucket=1000
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    wins = [ln for ln in plan.splitlines() if "Window" in ln]
    assert any(re.search(r"k.*__b|__b.*k", w) for w in wins), wins


def _funnel(spark, rows, window=100):
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.operators.funnel import (
        window_funnel,
    )

    df = spark.createDataFrame(rows, "k long, ts timestamp, e string")
    return {
        r.k: r.level
        for r in window_funnel(
            df, "k", "ts", "e", ["a", "b", "c"], window
        ).collect()
    }


def _t(s):
    import datetime

    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)


def test_window_funnel_levels(spark):
    rows = [
        # k=1: full chain within window -> 3
        (1, _t(0), "a"), (1, _t(10), "b"), (1, _t(20), "c"),
        # k=2: no stage-2 at all -> 1
        (2, _t(0), "a"), (2, _t(5), "c"),
        # k=3: stage-2 outside the window -> 1 (and the later c is
        # chained AFTER that b, so it cannot rescue the level)
        (3, _t(0), "a"), (3, _t(200), "b"), (3, _t(250), "c"),
        # k=4: c BEFORE b never matches (chain needs b.ts <= c.ts) -> 2
        (4, _t(0), "a"), (4, _t(30), "c"), (4, _t(50), "b"),
        # k=5: equal timestamps chain (ties allowed) -> 3
        (5, _t(0), "a"), (5, _t(0), "b"), (5, _t(0), "c"),
    ]
    got = _funnel(spark, rows)
    assert got == {1: 3, 2: 1, 3: 1, 4: 2, 5: 3}


def test_window_funnel_max_over_starts(spark):
    # the first 'a' has no completion inside its window; a later 'a'
    # completes — the per-key answer is the max over starting events
    rows = [
        (7, _t(0), "a"), (7, _t(500), "a"),
        (7, _t(510), "b"), (7, _t(520), "c"),
    ]
    assert _funnel(spark, rows) == {7: 3}


def test_window_funnel_split_bucket_equivalent(spark):
    """split_bucket threads the hot-key pre-split through every stage
    join without changing funnel levels (incl. broken chains, whose
    far-future sentinel probes land in build-less buckets)."""
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.operators.funnel import (
        window_funnel,
    )

    rows = []
    for k in range(5):
        for i in range(200):
            rows.append((k, _t(i * 7 + k), "a"))
            if i % 3 == 0:
                rows.append((k, _t(i * 7 + k + 2), "b"))
            if i % 5 == 0:
                rows.append((k, _t(i * 7 + k + 4), "c"))
    rows.append((9, _t(0), "a"))  # never completes
    df = spark.createDataFrame(rows, "k long, ts timestamp, e string")
    base = {
        r.k: r.level
        for r in window_funnel(df, "k", "ts", "e", ["a", "b", "c"], 60).collect()
    }
    split = {
        r.k: r.level
        for r in window_funnel(
            df, "k", "ts", "e", ["a", "b", "c"], 60, split_bucket=100
        ).collect()
    }
    assert split == base


def test_window_funnel_strict_increase(spark):
    """strict_increase: equal timestamps never chain (ClickHouse
    windowFunnel 'strict_increase' mode); default mode ties still do."""
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.operators.funnel import (
        window_funnel,
    )

    rows = [
        (1, _t(0), "a"), (1, _t(0), "b"), (1, _t(5), "c"),   # a==b ts
        (2, _t(0), "a"), (2, _t(1), "b"), (2, _t(2), "c"),   # clean chain
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, e string")
    loose = {
        r.k: r.level
        for r in window_funnel(df, "k", "ts", "e", ["a", "b", "c"], 100).collect()
    }
    strict = {
        r.k: r.level
        for r in window_funnel(
            df, "k", "ts", "e", ["a", "b", "c"], 100, strict_increase=True
        ).collect()
    }
    assert loose == {1: 3, 2: 3}
    assert strict == {1: 1, 2: 3}


def test_window_funnel_strict_dedup(spark):
    """strict_dedup: a repeat of an already-matched stage strictly
    between ts_i and the next-stage candidate interrupts the chain."""
    rows = [
        # k=1: a -> b, REPEATED b before c (not a chain start) -> 2
        (1, _t(0), "a"), (1, _t(5), "b"), (1, _t(8), "b"), (1, _t(10), "c"),
        # k=2: a -> b, then a repeat of 'a' before c — but that repeat
        # is itself a start whose own b-search hits... no later b ->
        # interrupted chain caps at 2, repeat-start caps at 1 -> 2
        (2, _t(0), "a"), (2, _t(10), "b"), (2, _t(15), "a"), (2, _t(20), "c"),
        # k=3: clean chain; a repeat only AFTER completion -> 3
        (3, _t(0), "a"), (3, _t(10), "b"), (3, _t(20), "c"), (3, _t(30), "a"),
    ]
    got = dict(_funnel(spark, rows).items())
    # default mode: repeats don't interrupt
    assert got == {1: 3, 2: 3, 3: 3}
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.operators.funnel import (
        window_funnel,
    )

    df = spark.createDataFrame(rows, "k long, ts timestamp, e string")
    strict = {
        r.k: r.level
        for r in window_funnel(
            df, "k", "ts", "e", ["a", "b", "c"], 100, strict_dedup=True
        ).collect()
    }
    assert strict == {1: 2, 2: 2, 3: 3}


def test_window_funnel_strict_order(spark):
    """strict_order: an interleaving foreign event breaks the chain —
    stage i+1 must be the IMMEDIATELY next event on the key's
    timeline; a later clean start can still score."""
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.operators.funnel import (
        window_funnel_strict_order,
    )

    rows = [
        # k=1: a -> b -> c consecutive -> 3
        (1, _t(0), "a"), (1, _t(1), "b"), (1, _t(2), "c"),
        # k=2: 'x' interleaves between a and b -> 1
        (2, _t(0), "a"), (2, _t(1), "x"), (2, _t(2), "b"), (2, _t(3), "c"),
        # k=3: first start broken by x, SECOND start is clean -> 3
        (3, _t(0), "a"), (3, _t(1), "x"),
        (3, _t(10), "a"), (3, _t(11), "b"), (3, _t(12), "c"),
        # k=4: chain consecutive but c outside the window -> 2
        (4, _t(0), "a"), (4, _t(5), "b"), (4, _t(500), "c"),
        # k=5: no stage-1 at all -> absent
        (5, _t(0), "b"), (5, _t(1), "c"),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, e string")
    got = {
        r.k: r.level
        for r in window_funnel_strict_order(
            df, "k", "ts", "e", ["a", "b", "c"], 100
        ).collect()
    }
    assert got == {1: 3, 2: 1, 3: 3, 4: 2}


def test_window_funnel_greedy_earliest_next(spark):
    # greedy takes the EARLIEST next stage; a later b would also work
    # but greedy must not lose the c that follows only the later b...
    # here the early b at t=5 leaves c at t=90 inside the window -> 3
    rows = [
        (8, _t(0), "a"), (8, _t(5), "b"), (8, _t(80), "b"),
        (8, _t(90), "c"),
    ]
    assert _funnel(spark, rows) == {8: 3}


def test_retention_cohort(spark):
    """retention(cond1..condN): r[0] = cond1 held; r[i] = cond1 AND
    cond_{i+1} both held (any events of the key)."""
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.operators.funnel import (
        retention,
    )
    from pyspark.sql import functions as F

    rows = [
        (1, "a"), (1, "b"),            # cond1+cond2 -> [1,1,0]
        (2, "b"), (2, "c"),            # no cond1 -> [0,0,0]
        (3, "a"), (3, "c"), (3, "c"),  # cond1+cond3 -> [1,0,1]
    ]
    df = spark.createDataFrame(rows, "k long, e string")
    got = {
        r.k: list(r.r)
        for r in retention(
            df, "k",
            [F.col("e") == "a", F.col("e") == "b", F.col("e") == "c"],
        ).collect()
    }
    assert got == {1: [1, 1, 0], 2: [0, 0, 0], 3: [1, 0, 1]}


# --- brute-force property oracle for window_funnel -------------------------
#
# The DuckDB oracle for funnel_strict_dedup mirrors the chained-ASOF
# construction (engines.py documents this honestly), so it proves
# engine-equivalence but not independence of the FORMULATION.  The
# oracle below is the independent form: a direct per-key greedy chain
# simulation in pure Python, derived from the documented semantics
# (window_funnel docstring; reference
# AggregateFunctions/AggregateFunctionWindowFunnel.h semantics for the
# mode flags), with no ASOF joins, windows, or sorting tricks.


def _brute_funnel_level(events, stages, window,
                        strict_increase=False, strict_dedup=False):
    """Max funnel level for ONE key's event soup: for every stage-1
    event, greedily take the earliest qualifying next-stage event
    (optimal per start), applying the strict_increase (strictly later)
    and strict_dedup (a repeat of any already-matched stage strictly
    between the probe point and the candidate interrupts) rules, then
    score the longest prefix within the window."""
    best = 0
    starts = [ts for ts, e in events if e == stages[0]]
    for ts1 in starts:
        chain = [ts1]
        cur = ts1
        for i, st in enumerate(stages[1:], start=2):
            cands = [
                ts for ts, e in events
                if e == st and (ts > cur if strict_increase else ts >= cur)
            ]
            if not cands:
                break
            cand = min(cands)
            if strict_dedup:
                matched = set(stages[: i - 1])
                repeats = [
                    ts for ts, e in events
                    if e in matched and cur < ts < cand
                ]
                if repeats:
                    break
            chain.append(cand)
            cur = cand
        level = 1
        for ts in chain[1:]:
            if ts <= ts1 + window:
                level += 1
            else:
                break
        best = max(best, level)
    return best


def _brute_strict_order_level(events, stages, window):
    """strict_order mode for ONE key: sort by (ts, event); the chain
    from a stage-1 start must be the IMMEDIATELY following events."""
    timeline = sorted(events)
    best = 0
    for p, (ts1, e1) in enumerate(timeline):
        if e1 != stages[0]:
            continue
        level = 1
        for j, st in enumerate(stages[1:], start=1):
            if p + j >= len(timeline):
                break
            ts, e = timeline[p + j]
            if e != st or ts > ts1 + window:
                break
            level += 1
        best = max(best, level)
    return best


@pytest.mark.slow
def test_window_funnel_property_sweep_all_modes(spark):
    """150 randomized per-key event soups (seeded), each a fixture:
    window_funnel must equal the pure-Python greedy simulation in all
    four (strict_increase x strict_dedup) combinations, and
    window_funnel_strict_order must equal its timeline simulation.
    Timestamps collide on purpose (small range) to exercise the
    equal-ts tie rules."""
    import random

    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.operators.funnel import (
        window_funnel,
        window_funnel_strict_order,
    )

    rng = random.Random(0xC1ACDB)
    stages = ["a", "b", "c", "d"]
    window = 40
    per_key = {}
    rows = []
    for k in range(150):
        n = rng.randint(1, 14)
        evs = [
            (rng.randint(0, 60), rng.choice("abcd"))
            for _ in range(n)
        ]
        per_key[k] = evs
        rows.extend((k, _t(ts), e) for ts, e in evs)
    df = spark.createDataFrame(rows, "k long, ts timestamp, e string")

    for si in (False, True):
        for sd in (False, True):
            got = {
                r.k: r.level
                for r in window_funnel(
                    df, "k", "ts", "e", stages, window,
                    strict_increase=si, strict_dedup=sd,
                ).collect()
            }
            want = {
                k: _brute_funnel_level(
                    evs, stages, window,
                    strict_increase=si, strict_dedup=sd,
                )
                for k, evs in per_key.items()
            }
            want = {k: v for k, v in want.items() if v > 0}
            assert got == want, f"strict_increase={si} strict_dedup={sd}"

    got = {
        r.k: r.level
        for r in window_funnel_strict_order(
            df, "k", "ts", "e", stages, window
        ).collect()
    }
    want = {
        k: _brute_strict_order_level(evs, stages, window)
        for k, evs in per_key.items()
    }
    want = {k: v for k, v in want.items() if v > 0}
    assert got == want


def test_window_funnel_strict_dedup_hand_fixtures(spark):
    """Hand-computed strict_dedup levels from the documented rules —
    covers repeat-at-equal-ts (no interrupt: the repeat must fall
    STRICTLY between probe and candidate) and multi-repeat cases."""
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.operators.funnel import (
        window_funnel,
    )

    rows = [
        # k=1: b@5 repeats inside (b@1, c@6) -> interrupt at 2
        (1, _t(0), "a"), (1, _t(1), "b"), (1, _t(5), "b"), (1, _t(6), "c"),
        # k=2: repeat of 'a' AT the probe ts (a@3 == b@3) — not
        # strictly after the probe, no interrupt -> 3
        (2, _t(0), "a"), (2, _t(3), "b"), (2, _t(3), "a"), (2, _t(5), "c"),
        # k=3: repeat of 'a' AT the candidate ts (a@4 == c@4) — not
        # strictly before the candidate, no interrupt -> 3
        (3, _t(0), "a"), (3, _t(2), "b"), (3, _t(4), "a"), (3, _t(4), "c"),
        # k=4: repeat strictly inside (b@2, c@4) -> interrupt at 2
        (4, _t(0), "a"), (4, _t(2), "b"), (4, _t(3), "a"), (4, _t(4), "c"),
        # k=5: MULTIPLE repeats (a@2 and b@3) inside (b@1, c@9) ->
        # interrupt at 2 (and the restart a@2 finds no later b... it
        # finds b@3 then c@9 with a repeat? a@2 -> b@3: ok; b@3 -> c@9
        # has no repeat strictly inside (3,9)?  none of a/b in (3,9)
        # -> that start reaches 3)
        (5, _t(0), "a"), (5, _t(1), "b"), (5, _t(2), "a"),
        (5, _t(3), "b"), (5, _t(9), "c"),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, e string")
    got = {
        r.k: r.level
        for r in window_funnel(
            df, "k", "ts", "e", ["a", "b", "c"], 100, strict_dedup=True
        ).collect()
    }
    assert got == {1: 2, 2: 3, 3: 3, 4: 2, 5: 3}
