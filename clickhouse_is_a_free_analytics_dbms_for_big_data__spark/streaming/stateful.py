"""Stateful streaming operators (SURVEY §2.10).

The reference has no streaming runtime — its streaming-shaped
capabilities are merge-time accumulation (AggregatingMergeTree) and
the sequenceMatch funnel aggregate.  Structured Streaming expresses
both properly:

- ``streaming_aggregate``: continuous keyed aggregation — state lives
  in the streaming state store and every micro-batch upserts into the
  target, which is exactly AggregatingMergeTree's "partial states
  merged per key on write" (DataStreams/AggregatingSortedBlockInputStream.h:21)
  with real exactly-once epochs instead of eventual merges.
- ``streaming_windowed_counts``: watermark + tumbling window — the
  late-data story the reference lacks entirely (its answer is
  re-merge-on-read; ours is bounded state with explicit lateness).
- ``streaming_funnel``: sequenceMatch-style staged funnel per key via
  ``applyInPandasWithState`` (AggregateFunctionSequenceMatch.h:145 —
  the '(?1)(?2)(?3)' chain form), state = highest stage reached,
  emitted on change.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = [
    "streaming_aggregate",
    "streaming_windowed_counts",
    "streaming_funnel",
    "streaming_dedup",
]


def streaming_aggregate(
    stream_df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[Column],
    target_path: str,
    checkpoint: str,
) -> DataStreamWriter:
    """Continuous groupBy-agg with per-epoch upsert into a parquet
    target keyed by ``keys`` (AggregatingMergeTree analog: the target
    always holds the current merged state per key)."""
    agged = stream_df.groupBy(*keys).agg(*aggs)
    key_list = list(keys)

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df.persist()
        try:
            try:
                current = spark.read.parquet(target_path)
                keep = current.join(
                    batch_df.select(*key_list), on=key_list, how="left_anti"
                )
                out = keep.unionByName(batch_df)
            except Exception:  # first epoch: no target yet
                out = batch_df
            out.write.mode("overwrite").parquet(target_path + "_next")
            spark.read.parquet(target_path + "_next").write.mode(
                "overwrite"
            ).parquet(target_path)
        finally:
            batch_df.unpersist()

    return (
        agged.writeStream.outputMode("update")
        .foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
    )


def streaming_windowed_counts(
    stream_df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts — bounded state, explicit
    late-data cutoff (the capability the reference approximates with
    background re-merges)."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration), *keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("window.start").alias("window_start"),
            *keys,
            "cnt",
        )
    )


def streaming_sessionize(
    stream_df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based sessionization over a stream: Spark's native
    ``session_window`` merges events separated by less than ``gap``
    into one session whose state closes when the watermark passes the
    session end — bounded state, no custom stateful code.  (The
    reference has no streaming sessionization; its users emulate
    sessions with minute-rollup GROUP BYs — hits q19/q43 shapes.)
    Emits (keys..., session_start, session_end, n_events)."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            *keys,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_funnel(
    stream_df: DataFrame,
    key_col: str,
    event_col: str,
    ts_col: str,
    stages: Sequence[str],
    timeout_ms: int = 0,
) -> DataFrame:
    """sequenceMatch('(?1)(?2)...(?N)') as a continuous per-key funnel.

    State: the highest stage index reached (0-based; -1 = none).  Each
    batch's events are ordered by ``ts_col`` and advance the stage
    pointer; a row (key, stage_reached, completed) is emitted whenever
    the stage advances.  applyInPandasWithState keeps the state in the
    store across micro-batches — the streaming form of the reference's
    in-aggregate event list (AggregateFunctionSequenceMatch.h:157).
    """
    stages = list(stages)
    n_stages = len(stages)
    out_schema = f"{key_col} string, stage_reached int, completed boolean"
    state_schema = "stage int"

    def step(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        stage = state.get[0] if state.exists else -1
        before = stage
        events = pd.concat(list(pdfs))
        events = events.sort_values(ts_col)
        for ev in events[event_col]:
            if stage + 1 < n_stages and ev == stages[stage + 1]:
                stage += 1
        state.update((stage,))
        if stage != before:
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "stage_reached": [stage + 1],
                    "completed": [stage + 1 == n_stages],
                }
            )

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            step,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_dedup(
    stream_df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str | None = None,
    watermark: str = "24 hours",
) -> DataFrame:
    """Ingest-time exact deduplication: rows whose ``key_cols`` (e.g. a
    normalized content fingerprint) were already seen are dropped, with
    the seen-set living in the streaming state store across
    micro-batches — the streaming twin of ``pipeline.dedup.exact_dedup``
    (and of ReplacingMergeTree's merge-time collapse,
    MergeTreeDataMerger's Replacing mode — but at INSERT time with
    exactly-once state instead of eventual merges).

    With ``ts_col`` the state is WATERMARK-BOUNDED
    (``dropDuplicatesWithinWatermark``): fingerprints older than the
    watermark are evicted, so state size is rate×window, not corpus
    size — the only shape that survives an unbounded 100 TB/day ingest.
    Without it, state grows with distinct keys (fine for bounded
    backfills, documented trade-off).
    """
    if ts_col is not None:
        return stream_df.withWatermark(ts_col, watermark)\
            .dropDuplicatesWithinWatermark(list(key_cols))
    return stream_df.dropDuplicates(list(key_cols))
