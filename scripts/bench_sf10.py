"""10M-row hits parity bench — the reference baseline's OWN smallest
scale point (BASELINE.md / website/benchmark.html:426 "data_size":
10000000, FORMAT Null, warm = best of runs 2-3).

Prior rounds measured the hits shapes at 1M rows and compared against
ClickHouse's published 10M-row warm numbers — a flattering basis (10x
fewer rows through the same plan).  This script replicates the
1M-row bench table to 10M rows (same per-replica key offsetting as
scripts/bench_sf1.py, one decade higher so ids stay disjoint) and
times the stored + derived hits entries at TRUE parity scale.

Run on a QUIET machine:  python scripts/bench_sf10.py
Prints one JSON line: {"sf10": {"queries": {...}}, "events_rows": N}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from clickhouse_is_a_free_analytics_dbms_for_big_data__spark import (  # noqa: E402
    get_session,
)

SRC = os.path.join(REPO, ".bench_sf1")  # 1M rows (scripts/bench_sf1.py)
DST = os.path.join(REPO, ".bench_sf10")
REPLICAS = 10

# CH v1.1.53960 warm @10M (best of runs 2-3), benchmark.html:431-474
CH_WARM_10M = {
    "hits_q13_phrase_top": 0.090,
    "hits_q13_stored": 0.090,
    "hits_q17_user_phrase": 0.210,
    "hits_q17_stored": 0.210,
    "hits_q19_minute_group": 0.346,
    "hits_q19_stored": 0.346,
    "hits_q21_url_like": 0.072,
    "hits_q21_stored": 0.072,
    "hits_q30_ninety_sums": 0.462,
    "hits_q34_url_top": 0.332,
    "hits_q34_stored": 0.332,
}

QUERIES = list(CH_WARM_10M)


def build(spark) -> None:
    from pyspark.sql import functions as F

    out = os.path.join(DST, "events.parquet")
    if not os.path.exists(out):
        ev = spark.read.parquet(os.path.join(SRC, "events.parquet"))
        reps = None
        for r in range(REPLICAS):
            # one decade above bench_sf1's offsets (r*1e9 / r*1e10) so
            # the 100 effective replicas' ids stay pairwise disjoint
            part = ev.withColumn(
                "user_id", F.col("user_id") + F.lit(r * 100_000_000_000)
            ).withColumn(
                "event_id", F.col("event_id") + F.lit(r * 1_000_000_000_000)
            )
            reps = part if reps is None else reps.unionByName(part)
        reps.write.mode("overwrite").parquet(out)
    for t in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings".split()
    ):
        dst = os.path.join(DST, f"{t}.parquet")
        src = os.path.join(SRC, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.realpath(src), dst)


def main() -> None:
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.queries import (
        queries_map,
    )
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.session import (
        dir_size_bytes,
        sized_shuffle_partitions,
    )

    os.makedirs(DST, exist_ok=True)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    width = sized_shuffle_partitions(dir_size_bytes(SRC) * REPLICAS, cpus)
    spark = get_session(app_name="bench_sf10", shuffle_partitions=width)
    build(spark)
    # build the stored table BEFORE any timing: the first measured
    # r11 run timed q13_stored's warm runs right after the in-session
    # 40 s store build and read 4.1 s for a query that is 0.31 s in a
    # settled process (GC/page-cache churn from the build)
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.queries.hits_q import (
        ensure_hits_stored,
    )

    ensure_hits_stored(spark, DST)

    qmap = queries_map()

    def run(name: str) -> None:
        # noop sink: full plan executes, nothing pruned (bench.py rule)
        qmap[name](spark, DST).write.mode("overwrite").format("noop").save()

    timings: dict[str, dict] = {}
    for name in QUERIES:
        t0 = time.perf_counter()
        run(name)  # cold (first *_stored call also builds the store)
        cold = time.perf_counter() - t0
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            run(name)
            runs.append(time.perf_counter() - t0)
        runs.sort()
        med = runs[len(runs) // 2]
        timings[name] = {
            "cold": round(cold, 4),
            "warm_median": round(med, 4),
            "warm_best": round(runs[0], 4),
            "ch_warm_10m": CH_WARM_10M[name],
            "ratio_vs_ch": round(med / CH_WARM_10M[name], 3),
        }
        print(
            f"{name}: warm {med:.3f}s (CH {CH_WARM_10M[name]:.3f}s, "
            f"{med / CH_WARM_10M[name]:.2f}x)",
            file=sys.stderr,
        )

    rows = spark.read.parquet(os.path.join(DST, "events.parquet")).count()
    print(json.dumps({"sf10": {"queries": timings}, "events_rows": rows}))


if __name__ == "__main__":
    main()
