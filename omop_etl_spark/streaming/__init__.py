from .events import (
    EVENTS_SCHEMA,
    enrich_stream,
    hourly_counts,
    read_events_stream,
    sessionize,
    sessionize_batch,
    stream_dedup,
    stream_interval_join,
)

__all__ = [
    "EVENTS_SCHEMA",
    "enrich_stream",
    "hourly_counts",
    "read_events_stream",
    "sessionize",
    "sessionize_batch",
    "stream_dedup",
    "stream_interval_join",
]
