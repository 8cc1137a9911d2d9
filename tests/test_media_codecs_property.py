"""Property tests for the dependency-free media codecs: encode→decode
round-trips over random geometries, and the PII regexes checked
against an independent engine (Python re) — no Spark session needed,
these are pure-kernel properties."""

from __future__ import annotations

import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from coltt_spark.operators.media_codecs import (
    decode_avi,
    decode_bmp,
    decode_ppm,
    decode_wav,
    encode_avi,
    encode_bmp,
    encode_ppm,
    encode_wav,
)
from coltt_spark.operators.pipeline import PII_PATTERNS


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_image_codecs_roundtrip_any_geometry(w, h, seed):
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(1, 2000),
    rate=st.integers(1, 192000),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_any_length_and_rate(n, rate, seed):
    samples = np.random.default_rng(seed).integers(-32768, 32768, n, dtype=np.int16)
    got, got_rate = decode_wav(encode_wav(samples, rate))
    assert got_rate == rate
    assert np.array_equal(got, samples)


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 16),
    h=st.integers(1, 16),
    n_frames=st.integers(1, 6),
    fps=st.sampled_from([1.0, 5.0, 24.0, 30.0]),
    seed=st.integers(0, 2**31 - 1),
)
def test_avi_roundtrip_any_geometry(w, h, n_frames, fps, seed):
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n_frames)]
    got, got_fps = decode_avi(encode_avi(frames, fps))
    assert abs(got_fps - fps) < 0.01
    assert len(got) == n_frames
    for a, b in zip(got, frames):
        assert np.array_equal(a, b)


_pii_text = st.text(
    alphabet=st.sampled_from(list("abc XY.019@+-%_()[]:/")), max_size=80
)


@settings(max_examples=200, deadline=None)
@given(parts=st.lists(_pii_text, min_size=1, max_size=4), seed=st.integers(0, 999))
def test_pii_patterns_are_total_under_python_re(parts, seed):
    """The PII patterns, run under an independent regex engine
    (Python re — same backtracking family as Spark's Java regex; the
    operator restricts itself to the common RE2-safe subset), must be
    TOTAL over randomly spliced snippets: every injected email /
    phone / IP is found (per-kind match count ≥ injected count) and
    destroyed by sequential redaction. Spark ≡ this-engine agreement
    on fixed rows is pinned by test_redact_pii_semantics; Spark ≡
    DuckDB on the corpus by the text_redact_pii oracle."""
    rng = np.random.default_rng(seed)
    snippets = [
        f"u{seed}@ex-{seed % 7}.org",
        f"+{seed % 90 + 1}-{seed % 900 + 100}-{seed % 9000 + 1000}",
        f"{rng.integers(0, 256)}.{rng.integers(0, 256)}.{rng.integers(0, 256)}.{rng.integers(0, 256)}",
    ]
    pieces = []
    injected = {kind: 0 for kind, _, _ in PII_PATTERNS}
    for i, p in enumerate(parts):
        pieces.append(p)
        pieces.append(" " + snippets[i % 3] + " ")
        injected[PII_PATTERNS[i % 3][0]] += 1
    text = "".join(pieces)
    for kind, pat, _ in PII_PATTERNS:
        assert len(re.findall(pat, text)) >= injected[kind], kind
    redacted = text
    for _, pat, token in PII_PATTERNS:
        redacted = re.sub(pat, lambda _m, t=token: t, redacted)
    for s in snippets[: min(len(parts), 3)]:
        assert s not in redacted
