"""A/B: is F.round(x*100).cast(long) the agg_pricing hot spot?

Spark's Round on DoubleType allocates a java.math.BigDecimal per row;
for exact 2-decimal money doubles, floor(x*100 + 0.5) (a primitive
double add + cast) is value-identical for non-negative inputs.

Interleaved variants, median of N, plus a value-equality assertion.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from clickhouse_is_a_free_analytics_dbms_for_big_data__spark import get_session
from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.session import (
    dir_size_bytes,
    sized_shuffle_partitions,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    width = sized_shuffle_partitions(dir_size_bytes(SF), cpus)
    spark = get_session(app_name="exp_round", shuffle_partitions=width)
    li = spark.read.parquet(os.path.join(SF, "lineitem.parquet"))

    def scaled_round(c: str) -> F.Column:
        return F.round(F.col(c) * 100).cast("long")

    def scaled_cast(c: str) -> F.Column:
        return (F.col(c) * 100 + F.lit(0.5)).cast("long")

    def build(scaled) -> "F.DataFrame":
        q, p, d, t = (scaled(c) for c in
                      ("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        disc4 = p * (F.lit(100) - d)
        chg6 = disc4 * (F.lit(100) + t)
        return (
            li.select("l_returnflag", "l_linestatus", q.alias("q"),
                      p.alias("p"), d.alias("d"), disc4.alias("dp"),
                      chg6.alias("ch"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("q").alias("sq"), F.sum("p").alias("sp"),
                 F.sum("d").alias("sd"), F.sum("dp").alias("sdp"),
                 F.sum("ch").alias("sch"))
        )

    a = build(scaled_round)
    b = build(scaled_cast)
    # value equality gate
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb, "variants differ!"
    print("variants value-identical:", len(ra), "groups")

    def run(df) -> float:
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    run(a); run(b)  # warm
    ta, tb = [], []
    for _ in range(7):
        ta.append(run(a))
        tb.append(run(b))
    ta.sort(); tb.sort()
    print(f"round-variant median {ta[3]*1000:.1f} ms, "
          f"cast-variant median {tb[3]*1000:.1f} ms")


if __name__ == "__main__":
    main()
