"""Structured Streaming over the events table.

The reference has no streaming surface (SURVEY §2.5) — this is the
engine-breadth layer for continuous ingestion: file-source streams,
watermarked tumbling-window aggregation, and gap-based session
windows. Each streaming aggregation has a batch twin in
``operators/analytics.py`` (``events_hourly`` / ``sessionize``) whose
DuckDB oracle covers the semantics; the streaming tests assert
stream-equals-batch on a bounded replay (availableNow trigger).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: per-process cache of probed events schemas, keyed by
#: (path, mtime_ns) — the driver may regenerate the testdata with a
#: different ts physical type between rounds, so a long-lived process
#: must re-probe a rewritten file (same invalidation contract as the
#: blocks payload cache, operators/blocks.py)
_SCHEMA_CACHE: dict[tuple[str, int], T.StructType] = {}

def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet. The file source
    needs a directory to watch (in production: the landing dir new
    files arrive in); for the single-file testdata we stage a symlink
    directory.

    The ``ts`` physical type depends on the writer: TIMESTAMP(NANOS)
    reads as int64 (``nanosAsLong``) and needs a micros conversion,
    TIMESTAMP(MICROS) reads as a timestamp directly — probe the footer
    with a batch read and mirror whatever sources/tables.py would do."""
    from coltt_spark.tmpdirs import scratch_dir

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    ck = (path, os.stat(path).st_mtime_ns)
    if ck not in _SCHEMA_CACHE:  # footer probe costs a job — do it once
        _SCHEMA_CACHE[ck] = spark.read.parquet(path).schema
    batch_schema = _SCHEMA_CACHE[ck]
    stage = scratch_dir(prefix="coltt_stream_")
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(path, link)
    sdf = spark.readStream.schema(batch_schema).parquet(stage)
    if isinstance(batch_schema["ts"].dataType, T.LongType):
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # watermarks/windows require TIMESTAMP_LTZ; NTZ → LTZ is a no-op
    # rendering-wise because the session zone is pinned to UTC
    return sdf.withColumn("ts", F.col("ts").cast("timestamp_ltz"))


def hourly_counts_stream(events: DataFrame, *, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregation (late data beyond the
    watermark is dropped; state is bounded by watermark horizon)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
            "total_value",
            "avg_value",
        )
    )


def session_stream(
    events: DataFrame, *, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based session windows per user (native session_window —
    state merges adjacent events until a gap > ``gap`` closes the
    session)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            "user_id",
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


def run_to_memory(sdf: DataFrame, name: str, *, mode: str = "complete") -> DataFrame:
    """Replay all available input through the streaming query into an
    in-memory table and return it as a batch DataFrame."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(name)


def stream_dedup(events: DataFrame, *, key_cols=("event_id",)) -> DataFrame:
    """Streaming first-seen deduplication with explicit per-key state
    (``applyInPandasWithState``) — the custom stateful operator shape:
    a key's first row is emitted, every later duplicate is suppressed
    for as long as the key's state lives.

    State per key is a single "seen" flag, so memory is O(distinct
    keys in flight), and keys hash-partition across executors — the
    same layout that serves billions of keys on a real cluster. (For
    bounded TTL state, layer ``withWatermark`` + an event-time timeout
    on top; the bounded-replay tests run with unexpiring state.)
    """
    import pandas as pd  # noqa: F401  (pdfs arrive as pandas frames)
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = events.schema
    state_schema = T.StructType([T.StructField("seen", T.LongType())])

    def first_seen(key, pdfs, state):
        seen = state.get[0] if state.exists else 0
        for pdf in pdfs:
            if len(pdf) and seen == 0:
                seen = 1
                yield pdf.iloc[[0]]
        state.update((seen,))

    return events.groupBy(*[F.col(c) for c in key_cols]).applyInPandasWithState(
        first_seen, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def interval_join_stream(
    events: DataFrame,
    *,
    left_type: str = "purchase",
    right_type: str = "click",
    join_window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream INTERVAL join: each ``left_type`` event joined to
    the same user's ``right_type`` events within the preceding
    ``join_window`` — the attribution join (purchase ← recent clicks)
    as a continuous query. Both sides carry a watermark and the join
    carries the time-range predicate, so Spark bounds the join state
    to the watermark horizon instead of keeping either stream forever
    (the canonical stream-stream join discipline). Semantics equal
    the batch interval join over the same data."""
    l = (
        events.filter(F.col("event_type") == left_type)
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("l_ts"),
        )
    )
    r = (
        events.filter(F.col("event_type") == right_type)
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("r_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("r_ts"),
        )
    )
    joined = l.join(
        r,
        F.expr(
            f"user_id = r_user AND r_ts <= l_ts "
            f"AND r_ts >= l_ts - INTERVAL {join_window}"
        ),
    )
    return joined.select(
        "user_id",
        "purchase_id",
        "click_id",
        F.date_format("l_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("r_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
    )


def distinct_users_stream(
    events: DataFrame, *, watermark: str = "2 hours"
) -> DataFrame:
    """Per-hour HLL register build as a watermarked streaming
    aggregation — the streaming-cardinality classic: state per
    window is the 256-register file (max is the merge operator, so
    micro-batches fold into the state store associatively), never
    the distinct keys themselves. Emits (hour, _bucket, _m, _c)
    register rows; finalize the replayed table with
    :func:`coltt_spark.operators.sketch.hll_finalize`."""
    from coltt_spark.functions.text import hash60
    from coltt_spark.operators.sketch import _M, hll_rho

    hashed = events.where(F.col("user_id").isNotNull()).select(
        "ts", hash60(F.col("user_id").cast("string")).alias("_h")
    )
    rows = hashed.select(
        "ts",
        # mask derives from the estimator's register count — raising
        # sketch._M retunes batch and streaming together
        F.col("_h").bitwiseAND(F.lit(_M - 1)).alias("_bucket"),
        hll_rho(F.col("_h")).alias("_rho"),
    )
    return (
        rows.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("_bucket"))
        .agg(F.max("_rho").alias("_m"), F.count(F.lit(1)).alias("_c"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "_bucket",
            "_m",
            "_c",
        )
    )


def value_histogram_stream(
    events: DataFrame, *, bin_width: float = 8.0, watermark: str = "2 hours"
) -> DataFrame:
    """Per-hour value histogram as a watermarked streaming
    aggregation — state per window is the bounded bin table (counts
    sum-merge across micro-batches), never the raw values. Finalize
    the replayed (hour, bin, n) table with
    :func:`coltt_spark.operators.sketch.quantile_finalize` for
    streaming percentiles. Power-of-two ``bin_width`` keeps bin
    assignment bit-identical across engines (NULL values dropped,
    SQL percentile semantics)."""
    rows = events.where(F.col("value").isNotNull()).select(
        "ts", F.floor(F.col("value") / F.lit(bin_width)).alias("bin")
    )
    return (
        rows.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "bin",
            "n",
        )
    )
