"""MaterializedView semantics on Structured Streaming.

Reference: Storages/StorageMaterializedView.h:11 +
DataStreams/PushingToViewsBlockOutputStream.h:18 — every INSERT block
into the source table is run through the view's SELECT and the result
inserted into the target table.

Spark translation: foreachBatch — each micro-batch is the "insert
block", the view's SELECT is an arbitrary DataFrame transform, and the
target write is append (or a compaction-aware upsert for
*MergeTree-style targets).  Multiple views over one source fan out
inside the same foreachBatch, keeping the reference's same-insert
atomicity per block.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter, StreamingQuery


@dataclass
class MaterializedView:
    """A continuous query over an insert stream."""

    select: Callable[[DataFrame], DataFrame]
    target_path: str
    format: str = "parquet"

    def process_batch(self, batch_df: DataFrame) -> None:
        self.select(batch_df).write.mode("append").format(self.format).save(
            self.target_path
        )


def attach_views(
    stream_df: DataFrame,
    views: list[MaterializedView],
    checkpoint: str,
    trigger_seconds: float | None = None,
) -> DataStreamWriter:
    """Fan an insert stream out to N materialized views (the reference
    runs every attached view per insert block)."""

    def fanout(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.persist()
        try:
            for v in views:
                v.process_batch(batch_df)
        finally:
            batch_df.unpersist()

    writer = stream_df.writeStream.foreachBatch(fanout).option(
        "checkpointLocation", checkpoint
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer
