from .docs import flag_stream_neardups, read_docs_stream
from .events import (
    EVENTS_SCHEMA,
    enrich_stream,
    hourly_counts,
    sliding_counts,
    read_events_stream,
    sessionize,
    sessionize_batch,
    stream_dedup,
    stream_interval_join,
    stream_kmv_distinct,
    dq_monitor_stream,
    stream_latest_state,
    stream_cdc_state,
)

__all__ = [
    "EVENTS_SCHEMA",
    "enrich_stream",
    "flag_stream_neardups",
    "hourly_counts",
    "sliding_counts",
    "read_docs_stream",
    "read_events_stream",
    "sessionize",
    "sessionize_batch",
    "stream_dedup",
    "stream_interval_join",
    "stream_kmv_distinct",
    "dq_monitor_stream",
    "stream_latest_state",
    "stream_cdc_state",
]
