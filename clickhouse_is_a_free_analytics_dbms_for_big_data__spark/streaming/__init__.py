from .buffer import BufferSink, buffered_writer
from .materialized_view import MaterializedView, attach_views

__all__ = ["BufferSink", "buffered_writer", "MaterializedView", "attach_views"]
