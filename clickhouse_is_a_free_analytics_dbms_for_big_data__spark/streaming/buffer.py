"""Buffer engine semantics on Structured Streaming.

Reference: dbms/src/Storages/StorageBuffer.h:22-39 — a RAM buffer in
front of a destination table, flushed when any of
{min_time..max_time, min_rows..max_rows, min_bytes..max_bytes} trips.

Spark translation: micro-batching IS buffering.  The flush-time
threshold maps to the processingTime trigger; the rows/bytes
thresholds map to source rate limits (e.g. maxFilesPerTrigger) because
a Spark trigger drains whatever arrived.  The destination-table write
happens in foreachBatch, so the sink is exactly-once per epoch.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter


@dataclass
class BufferSink:
    """Flush policy for a buffered write (reference Buffer engine args:
    num_layers is dropped — Spark parallelism replaces it)."""

    dest_path: str
    max_time_seconds: float = 10.0
    format: str = "parquet"

    def writer(self, stream_df: DataFrame, checkpoint: str) -> DataStreamWriter:
        dest, fmt = self.dest_path, self.format

        def flush(batch_df: DataFrame, epoch_id: int) -> None:
            batch_df.write.mode("append").format(fmt).save(dest)

        return (
            stream_df.writeStream.foreachBatch(flush)
            .trigger(processingTime=f"{self.max_time_seconds} seconds")
            .option("checkpointLocation", checkpoint)
        )


def buffered_writer(
    stream_df: DataFrame,
    dest_path: str,
    checkpoint: str,
    max_time_seconds: float = 10.0,
) -> DataStreamWriter:
    return BufferSink(dest_path, max_time_seconds).writer(stream_df, checkpoint)
