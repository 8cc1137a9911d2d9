from coltt_spark.streaming.events import (
    distinct_users_stream,
    hourly_counts_stream,
    read_events_stream,
    run_to_memory,
    session_stream,
    stream_dedup,
    value_histogram_stream,
)
from coltt_spark.streaming.ingest import read_table_stream, stream_upsert

__all__ = [
    "distinct_users_stream",
    "hourly_counts_stream",
    "read_events_stream",
    "read_table_stream",
    "run_to_memory",
    "session_stream",
    "stream_dedup",
    "stream_upsert",
    "value_histogram_stream",
]
