from coltt_spark.streaming.events import (
    hourly_counts_stream,
    read_events_stream,
    run_to_memory,
    session_stream,
    stream_dedup,
)

__all__ = [
    "hourly_counts_stream",
    "read_events_stream",
    "run_to_memory",
    "session_stream",
    "stream_dedup",
]
