"""Build the sf1 (10x sf0.1) correctness/bench dataset under
``/root/repo/.sf1``.

The driver-generated testdata caps at sf0.1; the registry is designed
for 100 TB but had never been VALUE-verified above that.  This script
scales the fact tables 10x by replication with per-replica key
remapping, so the full oracle sweep (scripts/drive_driver.py) and the
bench can run one order of magnitude higher:

- events:    user_id/event_id offset per replica (distinct counts
             scale with the data; each replica user keeps the original
             event history, so ASOF/funnel/session shapes persist)
- orders +
  lineitem:  o_orderkey/l_orderkey offset IN LOCKSTEP (FK integrity:
             per-order line sets are preserved); dim FKs unchanged
- documents: doc_id strided; every other token gets a per-replica
             salt so cross-replica copies are NOT near-dups — the
             corpus keeps sf0.1's dup structure at 10x volume
- embeddings: vec_id offset; one vec_id-dependent dimension gets a
             per-replica epsilon so replicas are directionally
             distinct (cosine is scale-invariant — a pure scale would
             manufacture exact top-k ties that no real corpus has)
- dims (region/nation/customer/supplier/part): copied 1:1 — fact/dim
  fan-in grows 10x, like a real corpus growing against fixed entities

Both the Spark engine and the DuckDB oracle read the SAME output
files, so every value comparison stays exact.  Idempotent: each table
is skipped when its output dir exists.

Run:  python scripts/make_sf1.py
Then: SPARK_GRAFT_ORACLE_SF_DIR=/root/repo/.sf1 python scripts/drive_driver.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
DST = os.path.join(REPO, ".sf1")
REPLICAS = 10
# key offsets far above any sf0.1 id range
EVENT_OFF = 10_000_000_000
USER_OFF = 1_000_000_000
ORDER_OFF = 100_000_000
VEC_OFF = 1_000_000


def build(spark) -> None:
    from pyspark.sql import functions as F

    def out_path(t):
        return os.path.join(DST, f"{t}.parquet")

    def replicate(df, transform):
        reps = None
        for r in range(REPLICAS):
            part = transform(df, r)
            reps = part if reps is None else reps.unionByName(part)
        return reps

    def write(df, t, parts):
        df.repartition(parts).write.mode("overwrite").parquet(out_path(t))

    if not os.path.exists(out_path("events")):
        ev = spark.read.parquet(os.path.join(SRC, "events.parquet"))
        if dict(ev.dtypes)["ts"] == "bigint":  # TIMESTAMP(NANOS) source
            ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        write(
            replicate(
                ev,
                lambda df, r: df.withColumn(
                    "user_id", F.col("user_id") + F.lit(r * USER_OFF)
                ).withColumn(
                    "event_id", F.col("event_id") + F.lit(r * EVENT_OFF)
                ),
            ),
            "events", 16,
        )

    if not os.path.exists(out_path("orders")):
        orders = spark.read.parquet(os.path.join(SRC, "orders.parquet"))
        write(
            replicate(
                orders,
                lambda df, r: df.withColumn(
                    "o_orderkey", F.col("o_orderkey") + F.lit(r * ORDER_OFF)
                ),
            ),
            "orders", 8,
        )

    if not os.path.exists(out_path("lineitem")):
        li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
        write(
            replicate(
                li,
                lambda df, r: df.withColumn(
                    "l_orderkey", F.col("l_orderkey") + F.lit(r * ORDER_OFF)
                ),
            ),
            "lineitem", 32,
        )

    if not os.path.exists(out_path("documents")):
        docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
        n = docs.count()
        write(
            replicate(
                docs,
                lambda df, r: df.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(r * n)
                ).withColumn(
                    "text", F.regexp_replace(F.col("text"), " ", f" r{r} ")
                ),
            ),
            "documents", 8,
        )

    if not os.path.exists(out_path("embeddings")):
        emb = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))

        def perturb(df, r):
            if r == 0:
                return df
            # replica r adds a NORM-SIZED component on a per-replica
            # dimension: cos(original, replica) ~ 0.707 and
            # cos(replica_r, replica_s) ~ 0.5 — replicas are real
            # distinct directions, never near-dups (a small epsilon
            # would make every replica pair cosine ~1 and break the
            # near-dup entries' exact-empty-result oracles; a pure
            # scale would be cosine-invariant and manufacture top-k
            # ties no real corpus has)
            return df.withColumn(
                "embedding",
                F.expr(
                    "transform(embedding, (x, i) -> CASE WHEN i = "
                    f"CAST(pmod(vec_id + {r}, size(embedding)) AS INT) "
                    "THEN CAST(x + sqrt(aggregate(embedding, 0D, "
                    "(a, e) -> a + CAST(e AS DOUBLE) * e)) AS FLOAT) "
                    "ELSE x END)"
                ),
            ).withColumn("vec_id", F.col("vec_id") + F.lit(r * VEC_OFF))

        write(replicate(emb, perturb), "embeddings", 4)

    for t in ("region", "nation", "customer", "supplier", "part"):
        p = out_path(t)
        if not os.path.exists(p):
            write(spark.read.parquet(os.path.join(SRC, f"{t}.parquet")), t, 1)


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark import (
        get_session,
    )

    spark = get_session(app_name="make_sf1")
    build(spark)
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        n = spark.read.parquet(os.path.join(DST, f"{t}.parquet")).count()
        print(f"{t}: {n}")


if __name__ == "__main__":
    main()
