from .buffer import BufferSink, buffered_writer
from .materialized_view import MaterializedView, attach_views
from .stateful import (
    streaming_aggregate,
    streaming_dedup,
    streaming_funnel,
    streaming_windowed_counts,
)

__all__ = [
    "BufferSink",
    "buffered_writer",
    "MaterializedView",
    "attach_views",
    "streaming_aggregate",
    "streaming_dedup",
    "streaming_funnel",
    "streaming_windowed_counts",
]
