"""Capture .explain('formatted') for every headline bench query.

Usage: python scripts/capture_plans.py <outdir> [suffix] [name ...]
Writes <outdir>/<query>_<suffix>.txt (default suffix 'before');
explicit names (any registry entry) override the headline list.
Plan capture only — no jobs are executed (except the tiny eager work
some builders do at construction, e.g. store discovery).
"""

from __future__ import annotations

import os
import sys

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
    outdir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    width = sized_shuffle_partitions(dir_size_bytes(sf_dir), cpus)
    spark = get_session(app_name="capture_plans", shuffle_partitions=width)
    qmap = queries_map()
    names = sys.argv[3:] or [n for n in bench.HEADLINE if n in qmap]
    if any(n.endswith("_stored") for n in names):
        from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.queries.hits_q import (
            ensure_hits_stored,
        )

        ensure_hits_stored(spark, sf_dir)
    for name in names:
        df = qmap[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")


if __name__ == "__main__":
    main()
