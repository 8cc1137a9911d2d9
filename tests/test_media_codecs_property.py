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
    # one snippet per PII kind, in PII_PATTERNS order (email, phone,
    # ssn, ip); the phone snippet cycles the broadened shape family
    phone_shapes = [
        f"+{seed % 90 + 1}-{seed % 900 + 100}-{seed % 9000 + 1000}",
        f"({seed % 900 + 100}) {seed % 900 + 100}-{seed % 9000 + 1000}",
        f"{seed % 900 + 100}.{seed % 900 + 100}.{seed % 9000 + 1000}",
        f"{seed % 900 + 100} {seed % 900 + 100} {seed % 9000 + 1000}",
    ]
    snippets = [
        f"u{seed}@ex-{seed % 7}.org",
        phone_shapes[seed % 4],
        f"{seed % 900 + 100}-{seed % 90 + 10}-{seed % 9000 + 1000}",
        f"{rng.integers(0, 256)}.{rng.integers(0, 256)}.{rng.integers(0, 256)}.{rng.integers(0, 256)}",
    ]
    pieces = []
    injected = {kind: 0 for kind, _, _ in PII_PATTERNS}
    for i, p in enumerate(parts):
        pieces.append(p)
        pieces.append(" " + snippets[i % 4] + " ")
        injected[PII_PATTERNS[i % 4][0]] += 1
    text = "".join(pieces)
    for kind, pat, _ in PII_PATTERNS:
        assert len(re.findall(pat, text)) >= injected[kind], kind
    redacted = text
    for _, pat, token in PII_PATTERNS:
        redacted = re.sub(pat, lambda _m, t=token: t, redacted)
    for s in snippets[: min(len(parts), 4)]:
        assert s not in redacted


def _spec_unfilter(raw: bytes, w: int, h: int, bpp: int = 3) -> np.ndarray:
    """Independent PNG inverse-filter oracle: a pure-Python per-byte
    transcription of RFC 2083 §6 (Recon formulas), no numpy, no
    shared code with the codec — so a bug present in BOTH
    encode_png's vectorized forward filters and decode_png's inverse
    loops cannot cancel out unseen."""
    stride = w * bpp
    out = []
    prior = [0] * stride
    for r in range(h):
        ft = raw[r * (stride + 1)]
        line = list(raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        cur = [0] * stride
        for x in range(stride):
            a = cur[x - bpp] if x >= bpp else 0      # Recon(a): left
            b = prior[x]                              # Recon(b): up
            c = prior[x - bpp] if x >= bpp else 0     # Recon(c): up-left
            if ft == 0:
                rec = line[x]
            elif ft == 1:
                rec = line[x] + a
            elif ft == 2:
                rec = line[x] + b
            elif ft == 3:
                rec = line[x] + (a + b) // 2
            elif ft == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec = line[x] + pred
            else:
                raise AssertionError(ft)
            cur[x] = rec % 256
        out.append(cur)
        prior = cur
    return np.array(out, dtype=np.uint8).reshape(h, w, bpp)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    seed=st.integers(0, 10_000),
    base=st.integers(0, 4),
    bpp=st.sampled_from([3, 4]),
)
def test_png_roundtrip_and_spec_parity(w, h, seed, base, bpp):
    """PNG encode→decode round-trips any geometry under every filter
    assignment — for BOTH truecolor (bpp=3) and truecolor+alpha
    (bpp=4, PNG color type 6) — and the decoder agrees byte-for-byte
    with the independent spec-literal unfilter oracle applied to the
    inflated stream — two implementations, one answer."""
    import zlib

    from coltt_spark.operators.media_codecs import decode_png, encode_png

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, bpp), dtype=np.uint8)
    filters = [(base + r) % 5 for r in range(h)]
    payload = encode_png(img, filters=filters)
    got = decode_png(payload)
    assert np.array_equal(got, img)
    # independently unfilter the raw inflated stream
    idat = b""
    pos = 8
    while pos + 12 <= len(payload):
        (ln,) = np.frombuffer(payload[pos : pos + 4], dtype=">u4")
        ctype = payload[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + int(ln)]
        pos += 12 + int(ln)
    spec = _spec_unfilter(zlib.decompress(idat), w, h, bpp)
    assert np.array_equal(spec, img)


def test_png_rejects_corruption_and_unsupported_flavors():
    """CRC tampering, truncation, and unsupported PNG flavors fail
    loudly — never silently-wrong pixels."""
    import pytest
    import struct as _struct
    import zlib

    from coltt_spark.operators.media_codecs import decode_png, encode_png

    img = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
    payload = bytearray(encode_png(img))
    # flip one IDAT byte: CRC check must catch it
    idat_at = bytes(payload).find(b"IDAT") + 6
    payload[idat_at] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))
    with pytest.raises(ValueError, match="PNG"):
        decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 4)
    # grayscale (color type 0) is out of scope — loud rejection
    def chunk(ctype, body):
        return (
            _struct.pack(">I", len(body)) + ctype + body
            + _struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )
    gray = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00\x07\x09"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(gray)


@settings(max_examples=150, deadline=None)
@given(seed=st.integers(0, 1_000), pos_frac=st.floats(0.0, 1.0))
def test_png_any_single_byte_flip_is_detected(seed, pos_frac):
    """Corruption totality: flipping ANY single byte of a valid PNG
    raises ValueError — it can never silently yield wrong pixels.
    Every region is covered by a check: the signature by the magic
    test, chunk types/bodies by CRC32, length fields by CRC-or-
    truncation, CRC fields by themselves. (zlib stream corruption
    inside IDAT is caught by the chunk CRC before inflate runs.)"""
    import pytest

    from coltt_spark.operators.media_codecs import decode_png, encode_png

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (4, 5, 3), dtype=np.uint8)
    payload = bytearray(encode_png(img))
    pos = min(int(pos_frac * len(payload)), len(payload) - 1)
    payload[pos] ^= 0x5A
    with pytest.raises(ValueError):
        decode_png(bytes(payload))
