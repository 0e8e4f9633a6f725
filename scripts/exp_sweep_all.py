"""Time EVERY registry entry once (cold + 2 warm, min of warm) at
sf0.1 with the noop sink — a coarse outlier finder for the r11
optimization checklist, not a benchmark (ambient noise applies).

Entries that need stores build them on first (cold) run; the warm
numbers then measure the query itself.
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    width = sized_shuffle_partitions(dir_size_bytes(sf_dir), cpus)
    spark = get_session(app_name="sweep_all", shuffle_partitions=width)
    qmap = queries_map()
    rows = []
    for name, fn in qmap.items():
        try:
            def run() -> float:
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                return time.perf_counter() - t0
            run()
            t = min(run(), run())
            rows.append((t, name))
        except Exception as e:
            rows.append((float("nan"), f"{name} ERROR {str(e)[:80]}"))
    rows.sort(reverse=True)
    for t, name in rows:
        print(f"{t:8.3f}  {name}")


if __name__ == "__main__":
    main()
