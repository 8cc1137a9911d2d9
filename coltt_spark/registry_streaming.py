"""Streaming queries as first-class correctness entries.

Each callable replays the bounded events file through a real
Structured Streaming query (``availableNow`` trigger → memory sink)
and returns the result as a batch DataFrame, so the driver's DuckDB
oracle checks the STREAMING operator's output values — not just a
batch twin. In production the same queries run unmodified against a
live landing directory / Kafka source.
"""

from __future__ import annotations

import itertools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coltt_spark.registry_analytics import _ORACLE_EVENTS_HOURLY
from coltt_spark.streaming import (
    hourly_counts_stream,
    read_events_stream,
    run_to_memory,
)

#: memory-sink table names must be fresh per run within a session
_MEM_SEQ = itertools.count()


def q_stream_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window aggregation, replayed to completion
    — shares the batch ``events_hourly`` oracle."""
    sdf = hourly_counts_stream(read_events_stream(spark, sf_dir))
    return run_to_memory(sdf, f"q_stream_hourly_{next(_MEM_SEQ)}")


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful dedup over a deliberately DOUBLED stream (the events
    file unioned with itself): every event arrives twice, the stateful
    operator must emit each exactly once — so the oracle is simply the
    events table.

    Uses the native JVM ``dropDuplicates`` state store (exact key
    dedup is expressible built-in, so that's the fast path — per-key
    state without per-key Python calls; ~100k keys/s faster than the
    pandas-state variant). :func:`coltt_spark.streaming.stream_dedup`
    is the applyInPandasWithState shape for dedup logic the built-in
    can't express, covered by tests/test_streaming_media.py."""
    s = read_events_stream(spark, sf_dir)
    doubled = s.union(s)
    out = run_to_memory(
        doubled.dropDuplicates(["event_id"]),
        f"q_stream_dedup_{next(_MEM_SEQ)}",
        mode="append",
    )
    return out.select("event_id", "user_id", "event_type", "value")


_ORACLE_STREAM_DEDUP = """
SELECT event_id, user_id, event_type, value FROM events
"""


STREAMING_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "stream_hourly": q_stream_hourly,
    "stream_dedup": q_stream_dedup,
}

STREAMING_ORACLES: dict[str, str] = {
    "stream_hourly": _ORACLE_EVENTS_HOURLY,
    "stream_dedup": _ORACLE_STREAM_DEDUP,
}
