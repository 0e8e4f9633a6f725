"""Interleaved A/B: q13_stored decode-BEFORE-TopK (current entry) vs
decode-AFTER-TopK on codes (r10 verdict task: filter + order entirely
on int codes — valid because overwrite-mode LC codes are assigned in
value order, so ORDER BY code == ORDER BY value — and decode only the
10 survivor rows).

Run on a QUIET machine:  python scripts/exp_q13_code_topk.py
Both variants are asserted result-identical before timing.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from clickhouse_is_a_free_analytics_dbms_for_big_data__spark import (  # noqa: E402
    get_session,
)
from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.queries import (  # noqa: E402
    hits_q,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", os.path.join(REPO, ".bench_sf1"))


def variant_decode_first(spark):
    return hits_q.hits_q13_stored(spark, SF_DIR)


def variant_code_topk(spark):
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.sources.mergetree import (
        lc_decode_expr,
        lc_dict_map,
    )

    path, hits = hits_q._stored(spark, SF_DIR)
    m = lc_dict_map(spark, path, "SearchPhrase")
    empty_codes = [c for c, v in m.items() if v == ""]
    out = hits.select("SearchPhrase").groupBy("SearchPhrase").agg(
        F.count(F.lit(1)).alias("c")
    )
    # filter on the CODE (empty string is one dict entry), order on
    # (c, code) — code order == value order for overwrite-built dicts
    if empty_codes:
        out = out.filter(~F.col("SearchPhrase").isin(empty_codes))
    out = out.filter(F.col("SearchPhrase").isNotNull())
    return (
        out.orderBy(F.desc("c"), "SearchPhrase")
        .limit(10)
        .withColumn("SearchPhrase", lc_decode_expr(spark, path, "SearchPhrase"))
    )


def main() -> None:
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.session import (
        dir_size_bytes,
        sized_shuffle_partitions,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    width = sized_shuffle_partitions(dir_size_bytes(SF_DIR), cpus)
    spark = get_session(app_name="exp_q13", shuffle_partitions=width)

    a = [tuple(r) for r in variant_decode_first(spark).collect()]
    b = [tuple(r) for r in variant_code_topk(spark).collect()]
    assert a == b, f"variants diverge:\nA={a}\nB={b}"
    print("variants identical:", len(a), "rows")

    variants = {
        "decode_first": variant_decode_first,
        "code_topk": variant_code_topk,
    }
    times: dict[str, list[float]] = {k: [] for k in variants}
    for k, fn in variants.items():  # cold
        fn(spark).write.mode("overwrite").format("noop").save()
    for _ in range(7):  # interleaved warm runs
        for k, fn in variants.items():
            t0 = time.perf_counter()
            fn(spark).write.mode("overwrite").format("noop").save()
            times[k].append(time.perf_counter() - t0)
    for k, ts in times.items():
        ts.sort()
        print(f"{k}: median {ts[len(ts) // 2]:.4f}s  runs {[round(t, 4) for t in ts]}")


if __name__ == "__main__":
    main()
