"""Split each headline query's bench time into BUILD (Python/py4j
DataFrame construction + analysis) vs EXECUTE (noop-sink run of a
pre-built DataFrame).

The bench methodology times build+execute together (the driver's
contract); this experiment tells us which side a slow query's time
lives on, per guide §1 "measure first".

Usage: python scripts/exp_breakdown.py [name ...]   (default: all)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_is_a_free_analytics_dbms_for_big_data__spark import get_session
from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.queries import (
    queries_map,
)
from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.session import (
    dir_size_bytes,
    sized_shuffle_partitions,
)

import bench


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    width = sized_shuffle_partitions(dir_size_bytes(sf_dir), cpus)
    spark = get_session(app_name="exp_breakdown", shuffle_partitions=width)
    qmap = queries_map()
    names = sys.argv[1:] or [n for n in bench.HEADLINE if n in qmap]
    if any(n.endswith("_stored") for n in names):
        from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.queries.hits_q import (
            ensure_hits_stored,
        )

        ensure_hits_stored(spark, sf_dir)

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    print(f"{'query':32s} {'build_ms':>9s} {'exec_ms':>9s} {'total_ms':>9s}")
    for name in names:
        fn = qmap[name]
        # cold
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        builds, execs = [], []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        builds.sort()
        execs.sort()
        b = builds[len(builds) // 2] * 1000
        e = execs[len(execs) // 2] * 1000
        print(f"{name:32s} {b:9.1f} {e:9.1f} {b + e:9.1f}")


if __name__ == "__main__":
    main()
