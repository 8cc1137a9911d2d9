"""Structured-streaming equivalence + multimodal plumbing tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from coltt_spark.operators.analytics import events_hourly, sessionize
from coltt_spark.operators.multimodal import extract_features, media_table, resize_image, sample_frames
from coltt_spark.sources.tables import load_table
from coltt_spark.streaming import (
    hourly_counts_stream,
    read_events_stream,
    run_to_memory,
    session_stream,
)

from .conftest import SF_SMOKE


def test_stream_hourly_equals_batch(spark):
    """Replaying the events file through the watermarked streaming agg
    gives the same windows as the batch twin."""
    sdf = hourly_counts_stream(read_events_stream(spark, SF_SMOKE))
    stream_rows = {
        (r["hour"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in run_to_memory(sdf, "hourly_t").collect()
    }
    batch_rows = {
        (r["hour"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in events_hourly(load_table(spark, SF_SMOKE, "events")).collect()
    }
    assert stream_rows == batch_rows


def test_stream_sessions_match_batch_totals(spark):
    """session_window (streaming state) and the lag/cumsum batch
    sessionizer agree on session count and per-user event totals."""
    sdf = session_stream(read_events_stream(spark, SF_SMOKE))
    stream = run_to_memory(sdf, "sessions_t")
    batch = sessionize(load_table(spark, SF_SMOKE, "events"))
    s_per_user = {
        (r["user_id"]): (r["n"], r["ev"])
        for r in stream.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("n_events").alias("ev"))
        .collect()
    }
    b_per_user = {
        (r["user_id"]): (r["n"], r["ev"])
        for r in batch.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("n_events").alias("ev"))
        .collect()
    }
    assert s_per_user == b_per_user


def test_media_features_deterministic(spark):
    media = media_table(load_table(spark, SF_SMOKE, "documents"))
    f1 = {r["doc_id"]: r["features"] for r in extract_features(media, dim=16).collect()}
    f2 = {r["doc_id"]: r["features"] for r in extract_features(media, dim=16).collect()}
    assert f1 == f2
    assert all(len(v) == 16 and all(0.0 <= x <= 1.0 for x in v) for v in f1.values())


def test_media_features_real_decoder_seam(spark):
    """The decoder parameter is a real injection seam: swap the fake
    for an actual codec (zlib DEFLATE — stdlib, runs on executors) and
    the same plan decodes genuinely compressed payloads."""
    import zlib

    import numpy as np

    raw = {i: bytes(bytearray((i * 37 + j) % 256 for j in range(64))) for i in range(1, 9)}
    media = spark.createDataFrame(
        [(i, "image", zlib.compress(raw[i])) for i in raw],
        "doc_id long, media_type string, payload binary",
    )

    def zlib_decoder(payload: bytes, out_len: int) -> np.ndarray:
        pixels = np.frombuffer(zlib.decompress(payload), dtype=np.uint8)
        return (np.resize(pixels, out_len) / 255.0).astype(np.float32)

    out = {r["doc_id"]: r["features"] for r in extract_features(media, dim=32, decoder=zlib_decoder).collect()}
    assert set(out) == set(raw)
    for i, payload in raw.items():
        expect = (np.resize(np.frombuffer(payload, dtype=np.uint8), 32) / 255.0).astype(np.float32)
        assert np.allclose(out[i], expect)


def test_media_resize_and_frames(spark):
    media = media_table(load_table(spark, SF_SMOKE, "documents"))
    resized = resize_image(media, width=8, height=4).collect()
    assert resized and all(len(r["payload"]) == 32 for r in resized)
    n_videos = media.filter(F.col("media_type") == "video").count()
    frames = sample_frames(media, n_frames=4)
    assert frames.count() == 4 * n_videos
    assert frames.filter(F.length("frame") == 0).count() == 0


def test_stream_dedup_first_seen(spark):
    """Doubling the stream (union with itself) then running the
    stateful first-seen dedup yields each event exactly once."""
    from coltt_spark.streaming import stream_dedup

    s = read_events_stream(spark, SF_SMOKE)
    out = run_to_memory(
        stream_dedup(s.union(s), key_cols=("event_id",)), "dedup_t", mode="append"
    )
    n_events = load_table(spark, SF_SMOKE, "events").count()
    ids = [r["event_id"] for r in out.select("event_id").collect()]
    assert len(ids) == n_events
    assert len(set(ids)) == n_events
