from .events import (
    EVENTS_SCHEMA,
    hourly_counts,
    read_events_stream,
    sessionize,
    sessionize_batch,
    stream_dedup,
)

__all__ = [
    "EVENTS_SCHEMA",
    "hourly_counts",
    "read_events_stream",
    "sessionize",
    "sessionize_batch",
    "stream_dedup",
]
