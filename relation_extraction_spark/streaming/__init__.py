"""Structured-Streaming analogues (SURVEY.md §2.9 T1-T6).

The reference is a batch compiler with no streaming surface; these map
its incremental-ingest story (and the driver's stream-shaped ``events``
fixture) onto Structured Streaming. Transform functions are defined ONCE
and work on both batch and streaming DataFrames — the unified-API
property the tests assert (stream availableNow == batch on same files).
"""

from .jobs import (
    dedup_events,
    incremental_extract,
    read_event_stream,
    run_available_now,
    session_counts,
    sliding_counts,
    tumbling_counts,
)

__all__ = [
    "read_event_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "dedup_events",
    "run_available_now",
    "incremental_extract",
]
