"""Stateful streaming tests: continuous aggregation (AggregatingMergeTree
analog), watermarked windows, and the applyInPandasWithState funnel."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.streaming import (
    streaming_aggregate,
    streaming_funnel,
    streaming_windowed_counts,
)


def test_streaming_aggregate_upserts_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [(1, 10.0), (2, 5.0)], "k long, v double"
    ).write.parquet(src)

    stream = spark.readStream.schema("k long, v double").parquet(src)
    q = streaming_aggregate(
        stream, ["k"], [F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")],
        target, ckpt,
    ).start()
    q.processAllAvailable()

    # second insert: state must accumulate, not reset
    spark.createDataFrame([(1, 7.0), (3, 2.0)], "k long, v double").write.mode(
        "append"
    ).parquet(src)
    q.processAllAvailable()
    q.stop()

    rows = {r["k"]: (r["s"], r["n"]) for r in spark.read.parquet(target).collect()}
    assert rows == {1: (17.0, 2), 2: (5.0, 1), 3: (2.0, 1)}


def test_streaming_windowed_counts(spark, tmp_path):
    src = str(tmp_path / "wsrc")
    spark.createDataFrame(
        [
            ("2024-01-01 00:00:10", "a"),
            ("2024-01-01 00:00:20", "a"),
            ("2024-01-01 00:01:10", "b"),
        ],
        "ts_s string, k string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s").write.parquet(src)

    stream = spark.readStream.schema("k string, ts timestamp").parquet(src)
    windowed = streaming_windowed_counts(stream, "ts", ["k"], "1 minute", "2 minutes")
    q = (
        windowed.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_counts")
        .option("checkpointLocation", str(tmp_path / "wckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # append mode only emits closed windows; with a static file source the
    # watermark advances after the batch, so re-reading gives final counts
    rows = spark.sql("SELECT k, cnt FROM win_counts").collect()
    got = {(r["k"], r["cnt"]) for r in rows}
    assert got <= {("a", 2), ("b", 1)}  # may be empty if watermark held them


def test_streaming_funnel(spark, tmp_path):
    src = str(tmp_path / "fsrc")
    spark.createDataFrame(
        [
            ("u1", "view", "2024-01-01 00:00:01"),
            ("u1", "cart", "2024-01-01 00:00:02"),
            ("u2", "view", "2024-01-01 00:00:03"),
            ("u2", "buy", "2024-01-01 00:00:04"),  # skips cart: stage stays 1
        ],
        "user string, etype string, ts_s string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s").write.parquet(src)

    stream = spark.readStream.schema("user string, etype string, ts timestamp").parquet(src)
    funnel = streaming_funnel(stream, "user", "etype", "ts", ["view", "cart", "buy"])
    q = (
        funnel.writeStream.outputMode("update")
        .format("memory")
        .queryName("funnel_out")
        .option("checkpointLocation", str(tmp_path / "fckpt"))
        .start()
    )
    q.processAllAvailable()

    # u1 completes the funnel with a later 'buy' event — state must carry over
    spark.createDataFrame(
        [("u1", "buy", "2024-01-01 00:00:09")], "user string, etype string, ts_s string"
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s").write.mode(
        "append"
    ).parquet(src)
    q.processAllAvailable()
    q.stop()

    rows = spark.sql(
        "SELECT user, max(stage_reached) AS s, max(completed) AS done "
        "FROM funnel_out GROUP BY user"
    ).collect()
    got = {r["user"]: (r["s"], r["done"]) for r in rows}
    assert got["u1"] == (3, True)
    assert got["u2"] == (1, False)


def test_streaming_dedup_state_survives_batches(spark, tmp_path):
    src = str(tmp_path / "dsrc")
    spark.createDataFrame(
        [("fpA", 1), ("fpB", 2)], "fp string, doc_id long"
    ).write.parquet(src)

    stream = spark.readStream.schema("fp string, doc_id long").parquet(src)
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.streaming import (
        streaming_dedup,
    )

    q = (
        streaming_dedup(stream, ["fp"])
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "dckpt"))
        .start()
    )
    q.processAllAvailable()

    # batch 2 replays fpA (must be dropped by cross-batch state) and
    # introduces fpC (must pass)
    spark.createDataFrame(
        [("fpA", 3), ("fpC", 4)], "fp string, doc_id long"
    ).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    fps = sorted(
        r.fp for r in spark.sql("SELECT fp FROM dedup_out").collect()
    )
    assert fps == ["fpA", "fpB", "fpC"]


def test_streaming_dedup_watermark_bounded(spark, tmp_path):
    src = str(tmp_path / "wdsrc")
    spark.createDataFrame(
        [("fpA", "2024-01-01 00:00:00"), ("fpA", "2024-01-01 00:00:30")],
        "fp string, ts_s string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop(
        "ts_s"
    ).write.parquet(src)

    stream = spark.readStream.schema("fp string, ts timestamp").parquet(src)
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.streaming import (
        streaming_dedup,
    )

    q = (
        streaming_dedup(stream, ["fp"], ts_col="ts", watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("wdedup_out")
        .option("checkpointLocation", str(tmp_path / "wdckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT fp FROM wdedup_out").collect()
    assert [r.fp for r in rows] == ["fpA"]  # in-watermark dup dropped


def test_streaming_sessionize(spark, tmp_path):
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.streaming.stateful import (
        streaming_sessionize,
    )

    src = str(tmp_path / "sess_src")
    spark.createDataFrame(
        [
            # user u: one 3-event session (gaps < 10 min), then a
            # separate single-event session 2h later
            ("2024-01-01 00:00:00", "u"),
            ("2024-01-01 00:05:00", "u"),
            ("2024-01-01 00:12:00", "u"),
            ("2024-01-01 02:30:00", "u"),
            ("2024-01-01 00:00:00", "v"),
        ],
        "ts_s string, user string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s").write.parquet(src)

    stream = spark.readStream.schema("user string, ts timestamp").parquet(src)
    sess = streaming_sessionize(
        stream, "ts", ["user"], gap="10 minutes", watermark="1 minute"
    )
    q = (
        sess.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(
        "SELECT user, n_events FROM sessions ORDER BY user, n_events"
    ).collect()
    got = {(r["user"], r["n_events"]) for r in rows}
    # append mode emits watermark-closed sessions; the late 02:30 event
    # may stay open, so assert the subset relationship plus the merged
    # 3-event session when emitted
    assert got <= {("u", 3), ("u", 1), ("v", 1)}
    if ("u", 3) in got:
        # the 00:00/00:05/00:12 events merged into ONE session even
        # though first->last exceeds the gap (chained proximity)
        assert ("u", 2) not in got
