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
    def chunk(ctype, body):
        return (
            _struct.pack(">I", len(body)) + ctype + body
            + _struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )
    # 8-bit grayscale (type 0) is a SUPPORTED flavor since r6
    gray = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00\x07\x09"))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(gray), np.array([[7, 9]], dtype=np.uint8))
    # 16-bit and gray+alpha (type 4) remain out of scope — loud rejection
    for depth, color, px in ((16, 0, b"\x00\x00\x07\x00\x09"), (8, 4, b"\x00\x07\x01\x09\x02")):
        flavor = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", _struct.pack(">IIBBBBB", 2, 1, depth, color, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(px))
            + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="unsupported"):
            decode_png(flavor)


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


# -- JPEG (sequential baseline, ITU-T T.81) ---------------------------

_JPEG_EXTERNAL_444 = (
    "/usr/lib/google-cloud-sdk/platform/gsutil/third_party/requests/ext/"
    "flower-of-life.jpg"
)
_JPEG_EXTERNAL_420 = (
    "/usr/lib/google-cloud-sdk/platform/gsutil/third_party/pyparsing/docs/"
    "_static/pyparsingClassDiagram_1.5.2.jpg"
)


def _jpeg_expected_rgb(ycc: np.ndarray) -> np.ndarray:
    """The pinned YCbCr→RGB contract (floor(x+0.5), clamp) — the same
    expression the SQL oracle for media_jpeg_features inlines."""
    y = ycc[:, :, 0].astype(np.float64)
    cb = ycc[:, :, 1].astype(np.float64)
    cr = ycc[:, :, 2].astype(np.float64)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


@settings(max_examples=60, deadline=None)
@given(
    by=st.integers(1, 3),
    bx=st.integers(1, 3),
    seed=st.integers(0, 2**31 - 1),
    restart=st.integers(0, 3),
)
def test_jpeg_dc_only_is_bit_exact(by, bx, seed, restart):
    """DC-only (per-8×8-block-constant) YCbCr images survive encode→
    decode BIT-EXACTLY when q[0]=8 (the quantizer divides the DCT's
    8·(v−128) DC gain) — the property the media_jpeg_features SQL
    oracle relies on to regenerate pixels without seeing the
    container. Restart markers are exercised inside the checked
    path."""
    from coltt_spark.operators.media_codecs import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    qt = np.full(64, 8, dtype=np.int64)
    blocks = rng.integers(0, 256, size=(by, bx, 3), dtype=np.uint8)
    ycc = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    payload = encode_jpeg(
        ycc,
        input_color="ycbcr",
        luma_quant=qt,
        chroma_quant=qt,
        restart_interval=restart,
    )
    assert np.array_equal(decode_jpeg(payload), _jpeg_expected_rgb(ycc))


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 33),
    h=st.integers(1, 33),
    seed=st.integers(0, 2**31 - 1),
    gray=st.booleans(),
    restart=st.integers(0, 2),
)
def test_jpeg_roundtrip_bounded_error(w, h, seed, gray, restart):
    """With unit quantization tables the only loss is coefficient
    rounding (±0.5 per DCT coefficient) plus the two pinned color
    rounds — random images round-trip within a tight bound (measured
    max: 1 grayscale, 3 color)."""
    from coltt_spark.operators.media_codecs import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    one = np.ones(64, dtype=np.int64)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    payload = encode_jpeg(
        img, luma_quant=one, chroma_quant=one, restart_interval=restart
    )
    got = decode_jpeg(payload)
    assert got.shape == img.shape
    err = np.abs(got.astype(np.int64) - img.astype(np.int64)).max()
    assert err <= (3 if gray else 6), err


@settings(max_examples=30, deadline=None)
@given(w=st.integers(1, 24), h=st.integers(1, 24), seed=st.integers(0, 2**31 - 1))
def test_jpeg_420_chroma_subsampling_roundtrip(w, h, seed):
    """4:2:0 with chroma constant per 2×2 cell: the box-average
    downsample and replication upsample are exact inverses, so the
    only loss is DCT rounding — same bound as 4:4:4. Pins the
    subsample/upsample geometry (odd dims included)."""
    from coltt_spark.operators.media_codecs import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    one = np.ones(64, dtype=np.int64)
    # cell-constant pixels → cell-constant chroma (per-pixel luma
    # detail is covered by the other round-trip tests)
    cells = rng.integers(0, 256, size=((h + 1) // 2, (w + 1) // 2, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(cells, 2, axis=0), 2, axis=1)[:h, :w]
    payload = encode_jpeg(img, subsampling="4:2:0", luma_quant=one, chroma_quant=one)
    got = decode_jpeg(payload)
    assert got.shape == img.shape
    err = np.abs(got.astype(np.int64) - img.astype(np.int64)).max()
    assert err <= 6, err


def test_jpeg_rejects_corruption_and_unsupported_flavors():
    """Unsupported JPEG flavors and structural corruption fail loudly
    — never silently-wrong pixels. (Progressive SOF2 is a SUPPORTED
    flavor since r6 — covered by its own tests.)"""
    import pytest

    from coltt_spark.operators.media_codecs import decode_jpeg, encode_jpeg

    img = np.arange(192, dtype=np.uint8).reshape(8, 8, 3)
    payload = bytearray(encode_jpeg(img))
    # not a JPEG
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x00\x01")
    # lossless frame marker: rewrite SOF0 -> SOF3
    lossless = bytes(payload).replace(b"\xff\xc0", b"\xff\xc3")
    with pytest.raises(ValueError, match="SOF3"):
        decode_jpeg(lossless)
    # arithmetic-coded progressive: SOF0 -> SOF10 (0xCA)
    with pytest.raises(ValueError, match="SOF10"):
        decode_jpeg(bytes(payload).replace(b"\xff\xc0", b"\xff\xca"))
    # 16-bit quant table precision
    dqt_at = bytes(payload).find(b"\xff\xdb") + 4
    bad = bytearray(payload)
    bad[dqt_at] = 0x10
    with pytest.raises(ValueError, match="16-bit"):
        decode_jpeg(bytes(bad))
    # truncated entropy stream
    with pytest.raises(ValueError, match="truncated|RST"):
        decode_jpeg(bytes(payload[: len(payload) // 2]))
    # sampling factor 3 is out of decoder scope
    sof_at = bytes(payload).find(b"\xff\xc0")
    bad = bytearray(payload)
    bad[sof_at + 11] = 0x33  # component 1 sampling 3x3
    with pytest.raises(ValueError, match="sampling"):
        decode_jpeg(bytes(bad))


def test_jpeg_decodes_externally_encoded_files():
    """The decoder must accept files from encoders this repo did NOT
    write: two baseline JPEGs shipped with host packages — one 4:4:4
    WITH restart markers (DRI=21), one 1.9-megapixel 4:2:0. Channel
    means are regression pins from the first decode (both variants of
    this decoder — the original bit-at-a-time reader and the inlined
    segment reader — produced these same values independently);
    structural plausibility: a line-drawing scan is near-white."""
    import os

    import pytest

    from coltt_spark.operators.media_codecs import decode_jpeg

    if not os.path.exists(_JPEG_EXTERNAL_444):
        pytest.skip("external JPEG fixture not on this host")
    img = decode_jpeg(open(_JPEG_EXTERNAL_444, "rb").read())
    assert img.shape == (161, 161, 3)
    means = [round(float(img[:, :, c].mean()), 4) for c in range(3)]
    assert means == [215.5554, 215.5554, 215.5554], means
    if os.path.exists(_JPEG_EXTERNAL_420):
        img = decode_jpeg(open(_JPEG_EXTERNAL_420, "rb").read())
        assert img.shape == (1659, 1155, 3)
        means = [round(float(img[:, :, c].mean()), 4) for c in range(3)]
        assert means == [242.3265, 239.2916, 234.1055], means


def test_decode_image_sniffs_jpeg_and_replicates_grayscale():
    from coltt_spark.operators.media_codecs import decode_image, encode_jpeg

    gray = np.arange(64, dtype=np.uint8).reshape(8, 8)
    img = decode_image(encode_jpeg(gray, luma_quant=np.ones(64, dtype=np.int64)))
    assert img.shape == (8, 8, 3)
    assert np.array_equal(img[:, :, 0], img[:, :, 1])
    assert np.array_equal(img[:, :, 0], img[:, :, 2])


@settings(max_examples=150, deadline=None)
@given(seed=st.integers(0, 1_000), pos_frac=st.floats(0.0, 1.0))
def test_jpeg_any_single_byte_flip_is_total(seed, pos_frac):
    """Corruption totality for a CRC-less container: JPEG cannot
    promise detection (a flipped AC coefficient decodes to different
    pixels, legitimately), but a flip must NEVER escape as anything
    other than a clean decode or a ValueError — no IndexError /
    OverflowError / numpy shape blowups from marker-walk or entropy
    state corruption. (An exhaustive all-positions sweep at one seed
    ran 859 flips: 659 decoded, 200 ValueError, 0 crashes.)"""
    from coltt_spark.operators.media_codecs import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    payload = bytearray(encode_jpeg(img, restart_interval=int(rng.integers(0, 3))))
    pos = min(2 + int(pos_frac * (len(payload) - 2)), len(payload) - 1)
    payload[pos] ^= 0x5A
    try:
        out = decode_jpeg(bytes(payload))
        assert out.shape[2] == 3
    except ValueError:
        pass


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 14),
    h=st.integers(1, 14),
    seed=st.integers(0, 2**31 - 1),
    depth=st.sampled_from([1, 2, 4, 8]),
    base=st.integers(0, 4),
)
def test_png_grayscale_and_palette_roundtrip(w, h, seed, depth, base):
    """The two remaining real-corpus PNG flavors: grayscale (type 0)
    round-trips with the exact 255/(2^d−1) sample scale-up, and
    indexed color (type 3) round-trips through PLTE (+ tRNS alpha)
    at every legal bit depth — sub-byte rows pack big-endian and
    filter at byte distance 1 per the spec, under every filter
    assignment."""
    from coltt_spark.operators.media_codecs import (
        decode_png,
        encode_png_gray,
        encode_png_indexed,
    )

    rng = np.random.default_rng(seed)
    filters = [(base + r) % 5 for r in range(h)]
    gray = rng.integers(0, 1 << depth, (h, w), dtype=np.uint8)
    got = decode_png(encode_png_gray(gray, depth=depth, filters=filters))
    assert got.shape == (h, w)
    assert np.array_equal(got, gray * (255 // ((1 << depth) - 1)))

    n = int(rng.integers(1, (1 << depth) + 1))
    pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    idx = rng.integers(0, n, (h, w), dtype=np.uint8)
    got = decode_png(encode_png_indexed(idx, pal, depth=depth, filters=filters))
    assert np.array_equal(got, pal[idx])
    alpha = rng.integers(0, 256, n, dtype=np.uint8)
    got = decode_png(
        encode_png_indexed(idx, pal, alpha=alpha, depth=depth, filters=filters)
    )
    assert got.shape == (h, w, 4)
    assert np.array_equal(got[:, :, :3], pal[idx])
    assert np.array_equal(got[:, :, 3], alpha[idx])


def test_png_palette_index_out_of_range_is_loud():
    """A palette index past PLTE must raise, not wrap or clamp."""
    import pytest

    from coltt_spark.operators.media_codecs import decode_png, encode_png_indexed

    pal = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]], dtype=np.uint8)
    idx = np.full((2, 2), 2, dtype=np.uint8)
    payload = bytearray(encode_png_indexed(idx, pal, depth=8))
    # shrink PLTE to 2 entries: rewrite length, drop 3 bytes, fix CRC
    import struct as _struct
    import zlib as _zlib

    at = bytes(payload).find(b"PLTE") - 4
    (ln,) = _struct.unpack_from(">I", payload, at)
    body = bytes(payload[at + 8 : at + 8 + ln - 3])
    rebuilt = (
        bytes(payload[:at])
        + _struct.pack(">I", ln - 3)
        + b"PLTE"
        + body
        + _struct.pack(">I", _zlib.crc32(b"PLTE" + body) & 0xFFFFFFFF)
        + bytes(payload[at + 12 + ln :])
    )
    with pytest.raises(ValueError, match="palette index"):
        decode_png(rebuilt)


def test_g711_tables_match_stdlib_audioop():
    """The G.711 μ-law/A-law expansion tables, checked against an
    INDEPENDENT implementation (stdlib audioop, the Sun convention
    every audio library ships) for all 256 codes × both laws."""
    import pytest

    audioop = pytest.importorskip("audioop")  # removed in 3.13
    from coltt_spark.operators.media_codecs import _g711_table

    codes = bytes(range(256))
    want_mu = np.frombuffer(audioop.ulaw2lin(codes, 2), dtype="<i2")
    want_a = np.frombuffer(audioop.alaw2lin(codes, 2), dtype="<i2")
    assert np.array_equal(_g711_table("mu"), want_mu)
    assert np.array_equal(_g711_table("a"), want_a)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 500),
    rate=st.integers(8000, 48000),
    seed=st.integers(0, 2**31 - 1),
    law=st.sampled_from(["mu", "a"]),
    stereo=st.booleans(),
)
def test_wav_g711_and_stereo_roundtrip(n, rate, seed, law, stereo):
    """G.711 WAV (format tags 6/7 — the first COMPRESSED audio in the
    codec family) and stereo PCM16 round-trip through the container:
    companded codes expand through the spec table; stereo frames
    deinterleave to (n, 2)."""
    from coltt_spark.operators.media_codecs import (
        _g711_table,
        decode_wav,
        encode_wav,
        encode_wav_g711,
    )

    rng = np.random.default_rng(seed)
    shape = (n, 2) if stereo else (n,)
    codes = rng.integers(0, 256, shape, dtype=np.uint8)
    got, got_rate = decode_wav(encode_wav_g711(codes, rate, law=law))
    assert got_rate == rate
    assert got.shape == shape
    assert np.array_equal(got, _g711_table(law)[codes])
    pcm = rng.integers(-32768, 32768, shape, dtype=np.int16)
    got, _ = decode_wav(encode_wav(pcm, rate))
    assert got.shape == shape
    assert np.array_equal(got, pcm)


def test_audio_decoder_downmixes_stereo():
    from coltt_spark.operators.media_codecs import audio_decoder, encode_wav

    pcm = np.array([[1000, 3000], [-2000, -4000], [0, 0], [500, 500]], dtype=np.int16)
    vec = audio_decoder(encode_wav(pcm, 8000), 4)
    want = pcm.astype(np.float64).mean(axis=1) / 32768.0
    assert np.allclose(vec, want.astype(np.float32))


def test_jpeg_quality_knob():
    """IJG quality convention: q=50 reproduces the Annex-K tables,
    q=100 is all-ones, file size grows monotonically with quality on
    a smooth image, and high quality round-trips tightly."""
    from coltt_spark.operators.media_codecs import (
        _JPEG_STD_QUANT_CHROMA,
        _JPEG_STD_QUANT_LUMA,
        decode_jpeg,
        encode_jpeg,
        jpeg_quality_tables,
    )

    lq50, cq50 = jpeg_quality_tables(50)
    assert np.array_equal(lq50, _JPEG_STD_QUANT_LUMA)
    assert np.array_equal(cq50, _JPEG_STD_QUANT_CHROMA)
    lq100, cq100 = jpeg_quality_tables(100)
    assert lq100.max() == 1 and cq100.max() == 1

    base = np.linspace(0, 255, 24)[None, :] * np.ones((24, 1))
    img = np.stack([base, base.T, (base + base.T) / 2], axis=-1).astype(np.uint8)
    sizes = [len(encode_jpeg(img, quality=q)) for q in (10, 50, 90, 100)]
    assert sizes == sorted(sizes), sizes
    got = decode_jpeg(encode_jpeg(img, quality=100))
    assert np.abs(got.astype(np.int64) - img.astype(np.int64)).max() <= 6


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 34),
    h=st.integers(1, 34),
    seed=st.integers(0, 2**31 - 1),
    gray=st.booleans(),
    sub420=st.booleans(),
    quality=st.integers(30, 100),
    restart=st.integers(0, 3),
)
def test_jpeg_progressive_matches_baseline_bit_exactly(
    w, h, seed, gray, sub420, quality, restart
):
    """Progressive (SOF2) and baseline (SOF0) encode the SAME
    quantized coefficients, so both streams must decode to
    BIT-IDENTICAL pixels — across geometries, grayscale/color, 4:2:0,
    qualities, and restart intervals. The default scan script
    exercises interleaved DC with successive approximation, split
    spectral bands, per-block EOB runs, and AC refinement down to
    Al=0 — so this property covers every progressive decode path
    against the independently-tested baseline path."""
    from coltt_spark.operators.media_codecs import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    sub = "4:2:0" if (not gray and sub420) else "4:4:4"
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    kw = dict(subsampling=sub, quality=quality, restart_interval=restart)
    base = decode_jpeg(encode_jpeg(img, **kw))
    prog = decode_jpeg(encode_jpeg(img, progressive=True, **kw))
    assert np.array_equal(base, prog)


def test_jpeg_progressive_spectral_selection_only_script():
    """The scan-script shape real encoders emit without successive
    approximation (per-component DC scans + split AC bands, all
    Ah=Al=0 — exactly what the external progressive files on this
    host use) decodes bit-identically to baseline."""
    from coltt_spark.operators.media_codecs import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (21, 19, 3), dtype=np.uint8)
    script = [
        ([0], 0, 0, 0, 0), ([1], 0, 0, 0, 0), ([2], 0, 0, 0, 0),
        ([0], 1, 8, 0, 0), ([0], 9, 63, 0, 0),
        ([1], 1, 63, 0, 0), ([2], 1, 63, 0, 0),
    ]
    base = decode_jpeg(encode_jpeg(img, quality=80))
    prog = decode_jpeg(encode_jpeg(img, quality=80, progressive=script))
    assert np.array_equal(base, prog)


def test_jpeg_decodes_externally_encoded_progressive_files():
    """Progressive files from encoders this repo did not write: the
    two small SOF2 JPEGs shipped with host packages (per-component DC
    scans + split spectral bands). Channel means are regression pins
    from the first decode; plausibility: both images are named for
    their near-white content."""
    import os

    import pytest

    from coltt_spark.operators.media_codecs import decode_jpeg

    thin = "/usr/share/doc/nodejs/thin-white-stripe.jpg"
    full = "/usr/share/doc/nodejs/full-white-stripe.jpg"
    if not os.path.exists(thin):
        pytest.skip("external progressive JPEG fixtures not on this host")
    img = decode_jpeg(open(thin, "rb").read())
    assert img.shape == (58, 493, 3)
    means = [round(float(img[:, :, c].mean()), 4) for c in range(3)]
    assert means == [231.6468, 238.4543, 230.036], means
    assert img.mean() > 200  # near-white, as named
    if os.path.exists(full):
        img = decode_jpeg(open(full, "rb").read())
        assert img.shape == (312, 493, 3)
        means = [round(float(img[:, :, c].mean()), 4) for c in range(3)]
        assert means == [249.5286, 250.82, 249.0812], means


@settings(max_examples=100, deadline=None)
@given(seed=st.integers(0, 1_000), pos_frac=st.floats(0.0, 1.0))
def test_jpeg_progressive_single_byte_flip_is_total(seed, pos_frac):
    """Corruption totality for the progressive path: any single-byte
    flip either decodes cleanly or raises ValueError — never any
    other exception (exhaustive all-positions sweeps on both paths
    ran with zero non-ValueError failures)."""
    from coltt_spark.operators.media_codecs import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    payload = bytearray(
        encode_jpeg(img, progressive=True, restart_interval=int(rng.integers(0, 3)))
    )
    pos = min(2 + int(pos_frac * (len(payload) - 2)), len(payload) - 1)
    payload[pos] ^= 0x5A
    try:
        out = decode_jpeg(bytes(payload))
        assert out.shape[2] == 3
    except ValueError:
        pass


@settings(max_examples=60, deadline=None)
@given(w=st.integers(1, 40), h=st.integers(1, 40), seed=st.integers(0, 2**31 - 1))
def test_jpeg_color_transform_matches_literal_formula(w, h, seed):
    """The in-place YCbCr→RGB evaluation (temporaries dominated
    megapixel decode cost) must stay BIT-IDENTICAL to the literal
    pinned formula the SQL oracle inlines — only IEEE-exact rewrites
    (commutativity, x−a ≡ x+(−a)) are allowed in the optimization."""
    from coltt_spark.operators.media_codecs import _jpeg_ycbcr_to_rgb

    rng = np.random.default_rng(seed)
    y, cb, cr = (rng.integers(0, 256, (h, w), dtype=np.uint8) for _ in range(3))
    yf, cbf, crf = (p.astype(np.float64) for p in (y, cb, cr))
    r = yf + 1.402 * (crf - 128.0)
    g = yf - 0.344136 * (cbf - 128.0) - 0.714136 * (crf - 128.0)
    b = yf + 1.772 * (cbf - 128.0)
    ref = np.clip(np.floor(np.stack([r, g, b], axis=-1) + 0.5), 0, 255).astype(np.uint8)
    assert np.array_equal(_jpeg_ycbcr_to_rgb(y, cb, cr), ref)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 20),
    seed=st.integers(0, 2**31 - 1),
    kind=st.integers(0, 3),
)
def test_png_adam7_interlaced_roundtrip(w, h, seed, kind):
    """Adam7 interlaced PNGs round-trip across the full flavor matrix
    (truecolor/RGBA/grayscale/palette at every legal bit depth) —
    each pass filtered as its own sub-image and scattered on the
    pass grid; tiny geometries exercise empty passes (which
    contribute NO bytes, not even filter bytes). Interlaced and
    sequential encodings of the same image must decode identically."""
    from coltt_spark.operators.media_codecs import (
        decode_png,
        encode_png,
        encode_png_gray,
        encode_png_indexed,
    )

    rng = np.random.default_rng(seed)
    if kind in (0, 1):
        img = rng.integers(0, 256, (h, w, 3 + kind), dtype=np.uint8)
        payload = encode_png(img, interlace=True)
        want = img
        sequential = encode_png(img)
    elif kind == 2:
        d = int(rng.choice([1, 2, 4, 8]))
        s = rng.integers(0, 1 << d, (h, w), dtype=np.uint8)
        payload = encode_png_gray(s, depth=d, interlace=True)
        want = s * (255 // ((1 << d) - 1))
        sequential = encode_png_gray(s, depth=d)
    else:
        d = int(rng.choice([1, 2, 4, 8]))
        n = int(rng.integers(1, (1 << d) + 1))
        pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
        idx = rng.integers(0, n, (h, w), dtype=np.uint8)
        payload = encode_png_indexed(idx, pal, depth=d, interlace=True)
        want = pal[idx]
        sequential = encode_png_indexed(idx, pal, depth=d)
    got = decode_png(payload)
    assert np.array_equal(got, want)
    assert np.array_equal(got, decode_png(sequential))


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
    n_colors=st.integers(1, 256),
)
def test_gif_roundtrip_flavor_matrix(w, h, seed, n_colors):
    """encode_gif → decode_gif is the identity on palette-mapped
    pixels across the full flavor matrix: 87a/89a, sequential vs
    4-pass INTERLACED, global vs LOCAL color table, with a comment
    extension exercising the sub-block skip walk (LZW is lossless,
    so parity is exact, unlike JPEG's bounded-error round-trip)."""
    from coltt_spark.operators.media_codecs import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, (h, w), dtype=np.uint8)
    for version, interlace, local in (
        ("87a", False, False),
        ("89a", True, False),
        ("89a", False, True),
        ("87a", True, True),
    ):
        payload = encode_gif(
            idx,
            pal,
            version=version,
            interlace=interlace,
            local_palette=local,
            comment=b"skip me \x00\xff" * 40 if version == "89a" else None,
        )
        out = decode_gif(payload)
        assert out.shape == (h, w, 3)
        assert np.array_equal(out, pal[idx]), (version, interlace, local)


def test_gif_lzw_table_growth_and_deferred_clear():
    """Two LZW edge regimes: (a) a 320×320 256-color noise image
    drives the table through every width 9→12 and across the
    4096-entry table-full encoder reset; (b) a hand-built
    literal-only code stream that keeps emitting AFTER the table
    fills WITHOUT a Clear — the spec's deferred-clear behavior the
    repo's own encoder never produces (it resets on full), so this
    path gets an independent hand-crafted stream."""
    from coltt_spark.operators.media_codecs import (
        _gif_lzw_decode,
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (320, 320), dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(idx, pal)), pal[idx])

    # (b) literal-only stream, replaying the decoder's width rule
    literals = (np.arange(5000, dtype=np.int64) * 37 % 256).astype(np.uint8)
    out = bytearray()
    buf = nbits = 0

    def emit(code, width):
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    width, size = 9, 258  # min_code_size 8: clear=256, eoi=257
    emit(256, width)
    for i, lit in enumerate(literals):
        emit(int(lit), width)
        if i > 0 and size < 4096:  # decoder defines an entry per code after the first
            size += 1
            if size >= (1 << width) and width < 12:
                width += 1
    emit(257, width)
    if nbits:
        out.append(buf & 0xFF)
    decoded = _gif_lzw_decode(bytes(out), 8, len(literals))
    assert np.array_equal(decoded, literals)


def test_gif_lzw_kwkwk_and_bad_codes():
    """The KwKwK case (code == the entry being defined) decodes per
    spec; a code BEYOND the next undefined entry is structural
    corruption and raises (GIF has no CRC — bad-code detection is the
    corruption surface)."""
    import pytest

    from coltt_spark.operators.media_codecs import _gif_lzw_decode

    # min=2: clear=4, eoi=5. Stream [clear, 1, 6, eoi] at width 3:
    # code 6 names the entry being defined from prev=1 → output 1,1.
    bits = 4 | (1 << 3) | (6 << 6) | (5 << 9)
    data = bytes([bits & 0xFF, (bits >> 8) & 0xFF])
    assert list(_gif_lzw_decode(data, 2, 3)) == [1, 1, 1]
    # code 7 skips past the next undefined entry (6) → loud
    bits = 4 | (1 << 3) | (7 << 6) | (5 << 9)
    data = bytes([bits & 0xFF, (bits >> 8) & 0xFF])
    with pytest.raises(ValueError, match="beyond table"):
        _gif_lzw_decode(data, 2, 3)
    # first code after clear must be a literal
    bits = 4 | (6 << 3)
    with pytest.raises(ValueError, match="not a literal"):
        _gif_lzw_decode(bytes([bits & 0xFF]), 2, 1)


def test_gif_rejects_corruption_and_unsupported_flavors():
    """Structural corruption fails loudly: bad magic, truncation,
    missing trailer/palette, out-of-screen rects, pixel-count
    mismatches, and the unsupported disposal mode."""
    import pytest
    import struct as _struct

    from coltt_spark.operators.media_codecs import (
        decode_gif,
        decode_gif_frames,
        encode_gif,
        encode_gif_frames,
    )

    pal = np.arange(24, dtype=np.uint8).reshape(8, 3)
    idx = (np.arange(25, dtype=np.uint8) % 8).reshape(5, 5)
    good = encode_gif(idx, pal)
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"GIF90a" + good[6:])
    with pytest.raises(ValueError, match="truncated GIF header"):
        decode_gif(good[:10])
    with pytest.raises(ValueError, match="trailer|truncated"):
        decode_gif(good[:-1])
    # truncate mid color table
    with pytest.raises(ValueError, match="truncated"):
        decode_gif(good[:20])
    # image rect outside the logical screen: shrink declared screen
    small = bytearray(good)
    _struct.pack_into("<HH", small, 6, 4, 4)
    with pytest.raises(ValueError, match="outside the logical screen"):
        decode_gif(bytes(small))
    # no palette anywhere: strip the GCT flag from a global-table file
    nopal = bytearray(good)
    nopal[10] &= 0x7F  # clear GCT flag; table bytes now parse as garbage blocks
    with pytest.raises(ValueError):
        decode_gif(bytes(nopal))
    # declared pixel count ≠ LZW output: grow the image descriptor
    overrun = bytearray(encode_gif(idx, pal, local_palette=True))
    at = bytes(overrun).find(b"\x2c")
    _struct.pack_into("<HH", overrun, at + 5, 6, 6)  # claim 6×6
    _struct.pack_into("<HH", overrun, 6, 6, 6)
    with pytest.raises(ValueError, match="LZW"):
        decode_gif(bytes(overrun))
    with pytest.raises(ValueError, match="restore-previous"):
        decode_gif_frames(
            encode_gif_frames([idx, idx], pal, disposals=[0, 3])
        )
    with pytest.raises(ValueError, match="palette index"):
        encode_gif(np.full((2, 2), 9, dtype=np.uint8), pal)


def test_gif_transparency_and_animation_compositing():
    """GCE semantics: a transparent index yields RGBA on single-image
    decode; animation frames composite transparent pixels over the
    prior canvas (disposal 0/1) and disposal 2 restores the rect to
    background before the next frame."""
    from coltt_spark.operators.media_codecs import (
        decode_gif,
        decode_gif_frames,
        encode_gif,
        encode_gif_frames,
    )

    pal = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0], [0, 0, 200]], np.uint8)
    base = np.ones((4, 4), dtype=np.uint8)
    overlay = np.full((4, 4), 3, dtype=np.uint8)
    overlay[1:3, 1:3] = 2  # index 2 will be transparent on frame 2
    img = decode_gif(encode_gif(overlay, pal, transparent=2))
    assert img.shape == (4, 4, 4)
    assert np.array_equal(img[:, :, 3] == 0, overlay == 2)
    frames, fps = decode_gif_frames(
        encode_gif_frames(
            [base, overlay, base],
            pal,
            delay_cs=4,
            disposals=[0, 2, 0],
            transparents=[None, 2, None],
        )
    )
    assert fps == 25.0 and len(frames) == 3
    assert np.array_equal(frames[0], pal[base])
    # frame 2: index-3 ring painted, transparent center shows frame 1
    expect = pal[overlay].copy()
    expect[1:3, 1:3] = pal[1]
    assert np.array_equal(frames[1], expect)
    # disposal 2 wiped the rect to background (index 0) before frame 3
    assert np.array_equal(frames[2], pal[base])


def test_gif_decodes_externally_encoded_files():
    """The decoder must accept files from encoders this repo did NOT
    write: stdlib-shipped icons (interlace/transparency flavors from
    real-world tools). Channel means are regression pins from the
    first decode; structural plausibility: plusnode is grayscale
    (r=g=b), tk is red-dominant."""
    import os

    import pytest

    from coltt_spark.operators.media_codecs import decode_gif

    icons = "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/idlelib/Icons"
    if not os.path.isdir(icons):
        pytest.skip("external GIF fixtures not on this host")
    img = decode_gif(open(f"{icons}/plusnode.gif", "rb").read())
    assert img.shape == (11, 11, 4)
    means = [round(float(img[:, :, c].mean()), 4) for c in range(3)]
    assert means[0] == means[1] == means[2] == 181.3554, means
    img = decode_gif(open(f"{icons}/tk.gif", "rb").read())
    assert img.shape == (11, 14, 4)
    means = [round(float(img[:, :, c].mean()), 4) for c in range(3)]
    assert means == [217.3636, 114.7013, 114.7013], means
    img = decode_gif(open(f"{icons}/python.gif", "rb").read())
    assert img.shape == (16, 16, 4)
    means = [round(float(img[:, :, c].mean()), 4) for c in range(3)]
    assert means == [91.5898, 97.1484, 67.4453], means


def test_decode_image_sniffs_gif():
    from coltt_spark.operators.media_codecs import decode_image, encode_gif

    pal = np.arange(12, dtype=np.uint8).reshape(4, 3)
    idx = (np.arange(6, dtype=np.uint8) % 4).reshape(2, 3)
    out = decode_image(encode_gif(idx, pal))
    assert out.shape == (2, 3, 3)
    assert np.array_equal(out, pal[idx])


def test_ima_state_machine_matches_stdlib_audioop():
    """The IMA ADPCM nibble decoder AND the greedy quantizer are
    bit-identical to an engine this repo did not write — stdlib
    ``audioop``'s Intel/DVI coder — over random nibble streams and
    random/sine sample streams (audioop packs HIGH nibble first; IMA
    WAV packs LOW first, so the test re-packs)."""
    import audioop
    import warnings

    from coltt_spark.operators.media_codecs import (
        _ima_decode_nibbles,
        _ima_encode_samples,
    )

    warnings.filterwarnings("ignore", category=DeprecationWarning)
    rng = np.random.default_rng(11)
    nib = rng.integers(0, 16, 4096, dtype=np.uint8)
    packed = bytes(
        (int(nib[i]) << 4) | int(nib[i + 1]) for i in range(0, len(nib), 2)
    )
    ref = np.frombuffer(audioop.adpcm2lin(packed, 2, (0, 0))[0], dtype="<i2")
    assert np.array_equal(_ima_decode_nibbles(nib, 0, 0), ref)
    for sam in (
        (np.sin(np.arange(3000) / 17) * 25000).astype(np.int16),
        rng.integers(-32768, 32768, 3000).astype(np.int16),
    ):
        refcodes, _ = audioop.lin2adpcm(sam.tobytes(), 2, (0, 0))
        arr = np.frombuffer(refcodes, dtype=np.uint8)
        refnib = np.empty(len(arr) * 2, dtype=np.uint8)
        refnib[0::2] = arr >> 4
        refnib[1::2] = arr & 0x0F
        assert np.array_equal(
            _ima_encode_samples(sam.astype(np.int64), 0, 0), refnib
        )


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 2000),
    rate=st.sampled_from([8000, 16000, 44100]),
    block_align=st.sampled_from([32, 64, 256]),
    stereo=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_ima_roundtrip_tracks_smooth_signals(n, rate, block_align, stereo, seed):
    """encode_wav_ima → decode_wav round-trips the container exactly
    (geometry, rate, block walk) and the LOSSY samples track a smooth
    signal: every block's first sample is verbatim (stored in the
    block header), and the quantizer keeps a slow sine within a small
    RMS envelope once the step size has adapted."""
    from coltt_spark.operators.media_codecs import decode_wav, encode_wav_ima

    rng = np.random.default_rng(seed)
    phase = rng.uniform(0, 6.28)
    base = (np.sin(np.arange(n) / 50 + phase) * 12000).astype(np.int16)
    x = np.stack([base, -base], axis=1) if stereo else base
    out, out_rate = decode_wav(encode_wav_ima(x, rate, block_align=block_align))
    assert out_rate == rate
    ch = 2 if stereo else 1
    out = out.reshape(-1, ch)
    xin = x.reshape(n, ch)
    assert len(out) >= n  # final block pads by repeating the last sample
    spb = (block_align - 4 * ch) * 2 // ch + 1
    # block-header samples are exact
    heads = np.arange(0, n, spb)
    assert np.array_equal(out[heads], xin[heads])
    err = out[:n].astype(np.int64) - xin.astype(np.int64)
    assert np.sqrt((err.astype(np.float64) ** 2).mean()) < 600.0


def test_wav_ima_rejects_corruption():
    import pytest
    import struct as _struct

    from coltt_spark.operators.media_codecs import decode_wav, encode_wav_ima

    x = (np.sin(np.arange(500) / 30) * 9000).astype(np.int16)
    good = encode_wav_ima(x, 8000, block_align=64)
    data_at = good.find(b"data")
    # corrupt a block header's step index beyond 88
    bad = bytearray(good)
    bad[data_at + 8 + 2] = 200
    with pytest.raises(ValueError, match="block header"):
        decode_wav(bytes(bad))
    # truncate mid-block: data size not whole blocks of nibble words
    trunc = bytearray(good[:-3])
    _struct.pack_into("<I", trunc, data_at + 4, len(trunc) - data_at - 8)
    _struct.pack_into("<I", trunc, 4, len(trunc) - 8)
    with pytest.raises(ValueError, match="truncated IMA"):
        decode_wav(bytes(trunc))
    with pytest.raises(ValueError, match="block align"):
        encode_wav_ima(x, 8000, block_align=7)


def test_audio_decoder_accepts_ima_adpcm():
    """The extract_features audio seam decodes IMA ADPCM payloads
    through the same decode_wav dispatch as PCM16/G.711."""
    from coltt_spark.operators.media_codecs import audio_decoder, encode_wav_ima

    x = (np.sin(np.arange(800) / 40) * 15000).astype(np.int16)
    v = audio_decoder(encode_wav_ima(x, 8000), 16)
    assert v.shape == (16,) and v.dtype == np.float32
    assert float(np.abs(v).max()) <= 1.0


def test_decode_video_dispatch_avi_and_gif_agree():
    """The video seam's magic-sniffing dispatch: the SAME frames
    packed as uncompressed AVI/DIB and as a palette-quantized
    animated GIF decode to identical pixel arrays and fps."""
    from coltt_spark.operators.media_codecs import (
        decode_video,
        encode_avi,
        encode_gif_frames,
    )

    rng = np.random.default_rng(21)
    frames = [rng.integers(0, 256, (6, 5, 3), dtype=np.uint8) for _ in range(3)]
    stack = np.stack(frames).reshape(-1, 3)
    palette, inverse = np.unique(stack, axis=0, return_inverse=True)
    idx = list(inverse.astype(np.uint8).reshape(3, 6, 5))
    a_frames, a_fps = decode_video(encode_avi(frames, 5.0))
    g_frames, g_fps = decode_video(encode_gif_frames(idx, palette, delay_cs=20))
    assert a_fps == g_fps == 5.0
    assert len(a_frames) == len(g_frames) == 3
    for fa, fg, orig in zip(a_frames, g_frames, frames):
        assert np.array_equal(fa, orig) and np.array_equal(fg, orig)
    import pytest

    with pytest.raises(ValueError, match="unknown video magic"):
        decode_video(b"\x00" * 32)


def test_g711_sql_expansion_matches_tables_for_all_codes():
    """The oracle's integer-SQL G.711 expansions (registry_media)
    are bit-identical to the decoder's expansion tables for ALL 256
    codes × both laws — the claim that lets the driver value-check
    companded audio without the oracle ever seeing WAV bytes."""
    import duckdb

    from coltt_spark.operators.media_codecs import _g711_table
    from coltt_spark.registry_media import _DD_G711_ALAW_MAG, _DD_G711_MU

    con = duckdb.connect()
    mu = np.array(
        con.sql(
            f"SELECT list_transform(range(0, 256), x -> {_DD_G711_MU})"
        ).fetchone()[0]
    )
    alaw = np.array(
        con.sql(
            "SELECT list_transform(range(0, 256), x -> "
            f"CASE WHEN xor(x, 85) >= 128 THEN {_DD_G711_ALAW_MAG} "
            f"ELSE -({_DD_G711_ALAW_MAG}) END)"
        ).fetchone()[0]
    )
    assert np.array_equal(mu, _g711_table("mu").astype(np.int64))
    assert np.array_equal(alaw, _g711_table("a").astype(np.int64))


@settings(max_examples=120, deadline=None)
@given(seed=st.integers(0, 1_000), pos_frac=st.floats(0.0, 1.0))
def test_gif_any_single_byte_flip_is_total(seed, pos_frac):
    """Corruption totality for the second CRC-less container: GIF
    cannot promise detection (a flipped palette byte decodes to
    different colors, legitimately), but a flip must NEVER escape as
    anything other than a clean decode or a ValueError — no
    IndexError / struct.error / infinite LZW loop from block-walk or
    code-table corruption."""
    from coltt_spark.operators.media_codecs import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (9, 9), dtype=np.uint8)
    payload = bytearray(
        encode_gif(
            idx,
            pal,
            version="89a",
            interlace=bool(seed % 2),
            local_palette=bool(seed % 3 == 0),
            comment=b"x" * 20,
        )
    )
    pos = min(int(pos_frac * len(payload)), len(payload) - 1)
    payload[pos] ^= 0x5A
    try:
        out = decode_gif(bytes(payload))
        assert out.ndim == 3 and out.shape[2] in (3, 4)
    except ValueError:
        pass


@settings(max_examples=80, deadline=None)
@given(seed=st.integers(0, 1_000), pos_frac=st.floats(0.0, 1.0))
def test_wav_ima_any_single_byte_flip_is_total(seed, pos_frac):
    """Corruption totality for IMA ADPCM WAV: a flipped nibble byte
    decodes to different samples (legitimately — no CRC), but a flip
    must never escape as anything but a clean decode or ValueError."""
    from coltt_spark.operators.media_codecs import decode_wav, encode_wav_ima

    rng = np.random.default_rng(seed)
    x = (rng.standard_normal(300) * 8000).astype(np.int16)
    payload = bytearray(encode_wav_ima(x, 8000, block_align=64))
    pos = min(int(pos_frac * len(payload)), len(payload) - 1)
    payload[pos] ^= 0x5A
    try:
        samples, rate = decode_wav(bytes(payload))
        assert samples.dtype == np.int16
    except ValueError:
        pass


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
)
def test_tiff_roundtrip_flavor_matrix(w, h, seed):
    """encode_tiff → decode_tiff is the identity across the flavor
    matrix: none/LZW/PackBits × II/MM × predictor × strip splitting,
    plus grayscale (both photometrics), palette, and RGBA."""
    from coltt_spark.operators.media_codecs import decode_tiff, encode_tiff

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    for comp, bo, pred, rps in (
        ("none", "<", 1, None),
        ("lzw", ">", 2, None),
        ("packbits", "<", 1, 3),
        ("lzw", "<", 1, 2),
        ("packbits", ">", 2, None),
    ):
        out = decode_tiff(
            encode_tiff(
                img,
                compression=comp,
                byte_order=bo,
                predictor=pred,
                rows_per_strip=rps,
            )
        )
        assert np.array_equal(out, img), (comp, bo, pred, rps)
    gray = rng.integers(0, 256, (h, w), dtype=np.uint8)
    for photo in (0, 1):
        assert np.array_equal(
            decode_tiff(encode_tiff(gray, photometric=photo, compression="lzw")),
            gray,
        )
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (h, w), dtype=np.uint8)
    assert np.array_equal(
        decode_tiff(encode_tiff(idx, palette=pal, compression="packbits")), pal[idx]
    )
    rgba = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    assert np.array_equal(
        decode_tiff(encode_tiff(rgba, compression="lzw", predictor=2)), rgba
    )


def test_tiff_lzw_early_change_hand_built_stream():
    """The dialect's distinguishing rule, checked WITHOUT the repo's
    own encoder: a hand-built MSB-first literal-only code stream that
    replays the spec's early-change width schedule (grow at table
    size 511/1023/2047, one code earlier than the GIF arithmetic)
    and keeps emitting after the table fills without a Clear."""
    from coltt_spark.operators.media_codecs import _tiff_lzw_decode

    literals = (np.arange(5000, dtype=np.int64) * 41 % 256).astype(np.uint8)
    out = bytearray()
    buf = nbits = 0

    def emit(code, width):
        nonlocal buf, nbits
        buf = (buf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    width, size = 9, 258
    emit(256, width)  # clear
    for i, lit in enumerate(literals):
        emit(int(lit), width)
        if i > 0 and size < 4096:
            size += 1
            if size >= (1 << width) - 1 and width < 12:  # early change
                width += 1
    emit(257, width)  # eoi
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    assert np.array_equal(
        _tiff_lzw_decode(bytes(out), len(literals)), literals
    )


def test_tiff_rejects_corruption_and_unsupported_flavors():
    import pytest
    import struct as _struct

    from coltt_spark.operators.media_codecs import decode_tiff, encode_tiff

    img = np.arange(75, dtype=np.uint8).reshape(5, 5, 3)
    good = encode_tiff(img, compression="lzw")
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"XX" + good[2:])
    with pytest.raises(ValueError, match="bad TIFF magic"):
        decode_tiff(b"II\x2b\x00" + good[4:])
    with pytest.raises(ValueError):
        decode_tiff(good[:40])  # truncated: strip/IFD out of bounds
    # unsupported: 16-bit samples
    bad_bits = bytearray(encode_tiff(img))
    at = bad_bits.find(_struct.pack("<HHI", 258, 3, 3))
    _struct.pack_into("<H", bad_bits, at + 8, 16)  # first BitsPerSample slot
    # (258 count=3 overflows to the data area; patch the stored copy too)
    with pytest.raises(ValueError):
        decode_tiff(bytes(bad_bits))
    # uncompressed strip size mismatch
    bad_cnt = bytearray(encode_tiff(img))
    at = bad_cnt.find(_struct.pack("<HHI", 279, 4, 1))
    _struct.pack_into("<I", bad_cnt, at + 8, 10)
    with pytest.raises(ValueError, match="strip size mismatch"):
        decode_tiff(bytes(bad_cnt))


def test_tiff_decodes_externally_encoded_files():
    """Files from encoders this repo did not write: the stdlib-shipped
    python.tiff (16×16 uncompressed RGBA, little-endian, ExtraSamples)
    — channel means are regression pins from the first decode, and
    the RGB means sit within ~5 of the python.gif logo's (same
    artwork through an entirely different container)."""
    import os

    import pytest

    from coltt_spark.operators.media_codecs import decode_tiff

    path = (
        "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11"
        "/test/test_email/data/python.tiff"
    )
    if not os.path.exists(path):
        pytest.skip("external TIFF fixture not on this host")
    img = decode_tiff(open(path, "rb").read())
    assert img.shape == (16, 16, 4)
    means = [round(float(img[:, :, c].mean()), 4) for c in range(4)]
    assert means == [96.418, 101.8945, 70.1172, 152.2305], means


@settings(max_examples=100, deadline=None)
@given(seed=st.integers(0, 1_000), pos_frac=st.floats(0.0, 1.0))
def test_tiff_any_single_byte_flip_is_total(seed, pos_frac):
    """Corruption totality for the third CRC-less container: a flip
    either decodes cleanly (possibly different pixels) or raises
    ValueError — never an IndexError/struct.error/overflow from IFD
    or LZW state corruption."""
    from coltt_spark.operators.media_codecs import decode_tiff, encode_tiff

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (9, 9, 3), dtype=np.uint8)
    comp = ("none", "lzw", "packbits")[seed % 3]
    payload = bytearray(
        encode_tiff(
            img,
            compression=comp,
            byte_order="<" if seed % 2 else ">",
            predictor=2 if comp == "lzw" else 1,
            rows_per_strip=4,
        )
    )
    pos = min(int(pos_frac * len(payload)), len(payload) - 1)
    payload[pos] ^= 0x5A
    try:
        out = decode_tiff(bytes(payload))
        assert out.ndim in (2, 3)
    except ValueError:
        pass


def test_decode_image_sniffs_tiff():
    from coltt_spark.operators.media_codecs import decode_image, encode_tiff

    img = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
    for bo in ("<", ">"):
        out = decode_image(encode_tiff(img, byte_order=bo, compression="lzw"))
        assert np.array_equal(out, img)
    gray = np.arange(9, dtype=np.uint8).reshape(3, 3)
    out = decode_image(encode_tiff(gray))
    assert out.shape == (3, 3, 3)  # luma replicated
    assert np.array_equal(out[:, :, 0], gray)


def test_lzw_coders_are_linear_on_pathological_inputs():
    """Regression pin for two latent quadratic bugs the small random
    fixtures never tripped: (a) byte-string match keys copied the
    whole current match per input byte — quadratic on long runs
    (fixed: (prefix_code, byte) int keys); (b) the TIFF MSB-first bit
    buffer grew as an unbounded bignum — quadratic in emitted codes
    (fixed: mask consumed bits). A long constant run stresses (a), a
    long incompressible block stresses (b); with either bug present
    this test runs for minutes instead of milliseconds."""
    from coltt_spark.operators.media_codecs import (
        _gif_lzw_decode,
        _gif_lzw_encode,
        _tiff_lzw_decode,
        _tiff_lzw_encode,
    )

    rng = np.random.default_rng(9)
    run = b"\x07" * 300_000                       # match-length pathology
    noise = bytes(rng.integers(0, 256, 300_000, dtype=np.uint8))  # code-count pathology
    for data in (run, noise):
        assert bytes(_tiff_lzw_decode(_tiff_lzw_encode(data), len(data))) == data
        assert (
            bytes(_gif_lzw_decode(_gif_lzw_encode(data, 8), 8, len(data))) == data
        )


def test_audio_containers_match_stdlib_on_real_files():
    """decode_audio is bit-exact against the stdlib wave/aifc/sunau
    readers — engines this repo did not write — on the stdlib-shipped
    pluck corpus: 3 containers × PCM 8/16/32 plus μ-law/A-law AU and
    AIFC (which also re-checks the G.711 tables against real files).
    24/32-bit cross-container sample equality is asserted where the
    corpus provides it."""
    import os
    import warnings

    import pytest

    warnings.filterwarnings("ignore", category=DeprecationWarning)
    base = (
        "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11"
        "/test/audiodata"
    )
    if not os.path.isdir(base):
        pytest.skip("stdlib audio corpus not on this host")
    import aifc
    import sunau
    import wave

    from coltt_spark.operators.media_codecs import decode_audio

    def mine(name):
        return decode_audio(open(f"{base}/{name}", "rb").read())

    for name, mod, dt in (
        ("pluck-pcm16.wav", wave, "<i2"),
        ("pluck-pcm16.aiff", aifc, ">i2"),
        ("pluck-pcm16.au", sunau, ">i2"),
        ("pluck-pcm32.wav", wave, "<i4"),
        ("pluck-pcm32.au", sunau, ">i4"),
        # aifc expands compressed frames via audioop → little-endian
        ("pluck-ulaw.au", sunau, "=i2"),
        ("pluck-ulaw.aifc", aifc, "<i2"),
        ("pluck-alaw.aifc", aifc, "<i2"),
    ):
        r = mod.open(f"{base}/{name}")
        ref = np.frombuffer(r.readframes(r.getnframes()), dtype=dt).reshape(
            -1, r.getnchannels()
        )
        got, rate = mine(name)
        assert rate == r.getframerate(), name
        assert np.array_equal(got, ref), name
    for name, mod in (
        ("pluck-pcm8.wav", wave),
        ("pluck-pcm8.aiff", aifc),
        ("pluck-pcm8.au", sunau),
    ):
        r = mod.open(f"{base}/{name}")
        raw = np.frombuffer(
            r.readframes(r.getnframes()), dtype=np.uint8
        ).reshape(-1, r.getnchannels())
        # WAV 8-bit is unsigned (center 128); AIFF/AU signed — both
        # scale to int16 full-scale in the family convention
        if name.endswith(".wav"):
            ref = (raw.astype(np.int16) - 128) << 8
        else:
            ref = raw.view(np.int8).astype(np.int16) << 8
        assert np.array_equal(mine(name)[0], ref), name
    # 24/32-bit: the corpus carries the SAME samples in every
    # container (the 8/16-bit variants differ by conversion LSBs)
    for depth in (24, 32):
        outs = [
            mine(f"pluck-pcm{depth}.{ext}")[0] for ext in ("wav", "aiff", "au")
        ]
        assert outs[0].dtype == np.int32
        assert np.array_equal(outs[0], outs[1]) and np.array_equal(
            outs[0], outs[2]
        ), depth


def test_aiff_au_roundtrip_and_rejections():
    import pytest

    from coltt_spark.operators.media_codecs import (
        _g711_table,
        decode_aiff,
        decode_au,
        decode_audio,
        encode_aiff,
        encode_au,
    )

    rng = np.random.default_rng(13)
    mono = rng.integers(-32768, 32768, 333).astype(np.int16)
    stereo = rng.integers(-32768, 32768, (222, 2)).astype(np.int16)
    for x in (mono, stereo):
        for enc, dec in ((encode_aiff, decode_aiff), (encode_au, decode_au)):
            out, rate = dec(enc(x, 44100))
            assert rate == 44100
            assert np.array_equal(out.reshape(x.shape), x)
    codes = rng.integers(0, 256, 100).astype(np.uint8)
    out, rate = decode_au(encode_au(codes, 8000, law="mu"))
    assert np.array_equal(out, _g711_table("mu")[codes])
    with pytest.raises(ValueError, match="not an AIFF"):
        decode_aiff(b"FORM\x00\x00\x00\x04WAVE")
    with pytest.raises(ValueError, match="not an AU"):
        decode_au(b"dns." + b"\x00" * 24)
    with pytest.raises(ValueError, match="unknown audio magic"):
        decode_audio(b"\x00" * 32)
    with pytest.raises(ValueError, match="missing COMM"):
        decode_aiff(b"FORM" + (12).to_bytes(4, "big") + b"AIFF" + b"JUNK" + (0).to_bytes(4, "big"))
    with pytest.raises(ValueError, match="unsupported AU encoding"):
        import struct as _struct

        decode_au(_struct.pack(">4sIIIII", b".snd", 24, 4, 99, 8000, 1) + b"\x00" * 4)


def test_wav_wide_pcm_roundtrip_via_external_convention():
    """8/24/32-bit WAV decode follows the container conventions
    (8-bit unsigned, 24-bit packed LE sign-extended, 32-bit LE) —
    checked by fabricating containers byte-by-byte, independent of
    any repo encoder."""
    import struct as _struct

    from coltt_spark.operators.media_codecs import decode_wav

    def wav(data, bits, channels=1, rate=8000):
        block = channels * bits // 8
        fmt = _struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
        body = (
            b"WAVEfmt " + _struct.pack("<I", len(fmt)) + fmt
            + b"data" + _struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + _struct.pack("<I", len(body)) + body

    s8, _ = decode_wav(wav(bytes([0, 128, 255]), 8))
    assert list(s8) == [-32768, 0, 127 << 8]
    s24, _ = decode_wav(wav(b"\x01\x00\x00" + b"\xff\xff\xff" + b"\x00\x00\x80", 24))
    assert list(s24) == [1 << 8, -1 << 8, (-(1 << 23)) << 8]
    s32, _ = decode_wav(
        wav(_struct.pack("<3i", 7, -7, -(1 << 31)), 32)
    )
    assert list(s32) == [7, -7, -(1 << 31)]


# ---------------------------------------------------------------------------
# FLAC — the first lossless COMPRESSED audio codec behind decode_audio


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(1, 700),
    stereo=st.booleans(),
    block_size=st.sampled_from([16, 100, 192, 256]),
    lpc_order=st.sampled_from([0, 4, 8]),
    partition_order=st.sampled_from([0, 1, 2]),
    seed=st.integers(0, 2**31 - 1),
)
def test_flac_roundtrip_property(n, stereo, block_size, lpc_order, partition_order, seed):
    """encode_flac → decode_flac is the identity for ANY int16 signal —
    FLAC prediction is exact integer arithmetic, so losslessness is a
    property, not a tolerance — across block/LPC/partition/channel
    configurations incl. short last frames and single-sample clips."""
    from coltt_spark.operators.flac_codec import decode_flac, encode_flac

    if partition_order and block_size % (1 << partition_order):
        partition_order = 0
    rng = np.random.default_rng(seed)
    shape = (n, 2) if stereo else (n,)
    x = rng.integers(-32768, 32768, shape, dtype=np.int16)
    out, rate = decode_flac(
        encode_flac(
            x, 8000,
            block_size=block_size,
            lpc_order=lpc_order,
            partition_order=partition_order,
        )
    )
    assert rate == 8000
    assert out.dtype == np.int16 and np.array_equal(out, x)


def test_flac_roundtrip_flavor_matrix():
    """Deterministic sweep of the encoder surface: every stereo
    decorrelation mode, coded-table and explicit block sizes, table /
    16-bit sample rates, forced VERBATIM, CONSTANT, and an LPC stream
    that actually beats the fixed predictors (subframe type >= 32 on
    the wire, verified with a decode spy)."""
    from coltt_spark.operators import flac_codec as fc

    rng = np.random.default_rng(11)
    t = np.arange(2500)
    smooth = (900 * np.sin(t / 40) + 120 * np.sin(t / 6)).astype(np.int16)
    st2 = np.stack([smooth, (smooth + rng.integers(-9, 9, len(t))).astype(np.int16)], 1)
    for mode in ("auto", "independent", "left_side", "right_side", "mid_side"):
        out, _ = fc.decode_flac(fc.encode_flac(st2, 44100, stereo=mode))
        assert np.array_equal(out, st2), mode
    for bs in (192, 576, 1024, 100, 5000):
        out, _ = fc.decode_flac(fc.encode_flac(smooth, 8000, block_size=bs))
        assert np.array_equal(out, smooth), bs
    for rate in (8000, 44100, 12345):
        _, got = fc.decode_flac(fc.encode_flac(smooth[:64], rate))
        assert got == rate
    out, _ = fc.decode_flac(fc.encode_flac(smooth[:300], 8000, force="verbatim"))
    assert np.array_equal(out, smooth[:300])
    out, _ = fc.decode_flac(fc.encode_flac(np.full(500, -7, np.int16), 8000))
    assert np.array_equal(out, np.full(500, -7, np.int16))

    # an AR(8) signal the fixed predictors cannot model: LPC must win
    coefs = np.array([0.6, -0.3, 0.2, -0.15, 0.1, -0.08, 0.05, -0.02])
    x = np.zeros(6000)
    e = rng.normal(0, 40, 6000)
    for i in range(8, 6000):
        x[i] = float(np.dot(coefs, x[i - 8 : i][::-1])) + e[i]
    sig = np.clip(x, -32768, 32767).astype(np.int16)
    b_fixed = fc.encode_flac(sig, 8000)
    b_lpc = fc.encode_flac(sig, 8000, lpc_order=8)
    assert len(b_lpc) < len(b_fixed)  # prediction actually helped
    types = []
    orig = fc._decode_subframe

    def spy(r, bs, bps):
        p = r.pos
        r.read(1)
        types.append(r.read(6))
        r.pos = p
        return orig(r, bs, bps)

    fc._decode_subframe = spy
    try:
        out, _ = fc.decode_flac(b_lpc)
    finally:
        fc._decode_subframe = orig
    assert np.array_equal(out, sig)
    assert any(tp >= 32 for tp in types)  # LPC subframes on the wire


def test_flac_handbuilt_conformance_stream():
    """Decode a hand-assembled stream exercising paths our encoder
    never emits: wasted bits (samples stored >>1 with a reduced
    sample size), an ESCAPED Rice partition (raw 5-bit residuals),
    block-size code 6 (8-bit explicit), and sample-rate code 14
    (16-bit in daHz) — built bit-by-bit from the spec, not via
    encode_flac."""
    import hashlib
    import struct as _struct

    from coltt_spark.operators import flac_codec as fc

    samples = [2 * v for v in (5, -3, 8, 0, -12, 7, 1, -1) * 4]  # 32, all even
    n = len(samples)
    rate = 8010  # divisible by 10 → representable in daHz code 14

    si = fc._BitWriter()
    si.write(16, 16)  # min block size (spec floor)
    si.write(n, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(0, 3)  # mono
    si.write(15, 5)  # bps 16
    si.write(n, 36)
    si.align()
    pcm = b"".join(_struct.pack("<h", v) for v in samples)
    streaminfo = si.getvalue() + hashlib.md5(pcm).digest()

    w = fc._BitWriter()
    w.write(0x3FFE, 14)
    w.write(0, 1)
    w.write(0, 1)
    w.write(6, 4)  # block size code 6: 8-bit follows
    w.write(14, 4)  # sample rate code 14: 16-bit daHz follows
    w.write(0, 4)  # mono
    w.write(4, 3)  # 16-bit
    w.write(0, 1)
    fc._write_utf8_coded(w, 0)
    w.write(n - 1, 8)
    w.write(rate // 10, 16)
    w.align()
    hdr = w.getvalue()
    frame = bytearray(hdr)
    frame.append(fc._crc8(hdr))

    b = fc._BitWriter()
    b.write(0, 1)
    b.write(8, 6)  # FIXED order 0
    b.write(1, 1)  # wasted-bits flag
    b.write(1, 1)  # unary 0 → k=1 wasted bit
    # residual: method 0, partition order 1 → two partitions of 16
    half = [v >> 1 for v in samples]  # wasted bit removed, bps=15
    b.write(0, 2)
    b.write(1, 4)
    b.write(15, 4)  # partition 1: ESCAPE
    b.write(5, 5)  # raw 5-bit residuals
    for v in half[:16]:
        b.write_signed(v, 5)
    b.write(2, 4)  # partition 2: rice param 2
    for v in half[16:]:
        z = (v << 1) if v >= 0 else (((-v) << 1) - 1)
        b.write_unary(z >> 2)
        b.write(z & 3, 2)
    b.align()
    frame.extend(b.getvalue())
    frame.extend(_struct.pack(">H", fc._crc16(bytes(frame))))

    blob = (
        b"fLaC" + bytes([0x80]) + len(streaminfo).to_bytes(3, "big")
        + streaminfo + bytes(frame)
    )
    out, got_rate = fc.decode_flac(blob)
    assert got_rate == rate
    assert list(out) == samples


@settings(max_examples=120, deadline=None)
@given(seed=st.integers(0, 1_000), pos_frac=st.floats(0.0, 1.0))
def test_flac_any_single_byte_flip_never_yields_wrong_samples(seed, pos_frac):
    """FLAC corruption contract: frames are CRC-8/CRC-16 covered and
    the decoded PCM is MD5-checked against STREAMINFO, so a single
    flipped byte can NEVER silently change the output — decode either
    raises ValueError or returns the identical samples (a flip in a
    redundant STREAMINFO bounds field may be benign; a flip anywhere
    in the frame bytes must raise)."""
    from coltt_spark.operators.flac_codec import decode_flac, encode_flac

    rng = np.random.default_rng(seed)
    n = int(rng.integers(20, 400))
    shape = (n, 2) if seed % 2 else (n,)
    x = rng.integers(-32768, 32768, shape, dtype=np.int16)
    payload = bytearray(encode_flac(x, 8000, block_size=64, partition_order=1))
    pos = min(int(pos_frac * len(payload)), len(payload) - 1)
    payload[pos] ^= 0x5A
    try:
        out, _ = decode_flac(bytes(payload))
        assert np.array_equal(out, x)  # benign flip only
    except ValueError:
        pass
    if pos >= 4 + 4 + 34:  # past magic + block header + STREAMINFO: CRC land
        try:
            decode_flac(bytes(payload))
            raise AssertionError("frame-byte flip escaped the CRCs")
        except ValueError:
            pass


def test_flac_streaminfo_md5_and_total_are_enforced():
    """Splicing STREAMINFO from one stream onto the frames of another
    fails the PCM-MD5 check (every frame CRC still valid); splicing a
    stream with a different length fails the total-samples check."""
    import pytest

    from coltt_spark.operators.flac_codec import decode_flac, encode_flac

    rng = np.random.default_rng(3)
    a = rng.integers(-2000, 2000, 128, dtype=np.int16)
    b = a.copy()
    b[64] += 1
    blob_a = encode_flac(a, 8000, block_size=64)
    blob_b = encode_flac(b, 8000, block_size=64)
    hdr_len = 4 + 4 + 34
    spliced = blob_a[:hdr_len] + blob_b[hdr_len:]
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(spliced)

    short = encode_flac(a[:64], 8000, block_size=64)
    spliced2 = blob_a[:hdr_len] + short[hdr_len:]
    with pytest.raises(ValueError, match="samples|MD5"):
        decode_flac(spliced2)


def test_flac_same_samples_across_audio_containers():
    """The SAME PCM stream through WAV, AIFF, and FLAC containers
    decodes to identical samples via the decode_audio dispatch — the
    container-invariance contract the audio fixture's single oracle
    relies on."""
    from coltt_spark.operators.flac_codec import encode_flac
    from coltt_spark.operators.media_codecs import (
        decode_audio,
        encode_aiff,
        encode_wav,
    )

    rng = np.random.default_rng(99)
    x = rng.integers(-32768, 32768, 32, dtype=np.int16)
    outs = [
        decode_audio(enc(x, 8000))
        for enc in (encode_wav, encode_aiff, encode_flac)
    ]
    for samples, rate in outs:
        assert rate == 8000
        assert np.array_equal(samples, x)


def test_mjpeg_avi_roundtrip_and_geometry_guard():
    """Motion-JPEG AVI: DC-only frames (the bit-exact JPEG contract)
    wrapped via encode_avi_mjpeg decode back exactly through both
    decode_avi and the decode_video dispatch; an MJPG frame whose
    decoded geometry disagrees with strf raises instead of returning
    misshapen pixels."""
    import pytest

    from coltt_spark.operators.media_codecs import (
        decode_avi,
        decode_jpeg,
        decode_video,
        encode_avi_mjpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(21)
    qt = np.full(64, 8, dtype=np.int64)
    jpegs, expected = [], []
    for _ in range(5):
        ycc = rng.integers(0, 256, (2, 2, 3), dtype=np.uint8)
        img = np.repeat(np.repeat(ycc, 8, axis=0), 8, axis=1)
        blob = encode_jpeg(img, input_color="ycbcr", luma_quant=qt, chroma_quant=qt)
        jpegs.append(blob)
        expected.append(decode_jpeg(blob))
    payload = encode_avi_mjpeg(jpegs, 16, 16, fps=12.5)
    frames, fps = decode_avi(payload)
    assert fps == 12.5 and len(frames) == 5
    assert all(np.array_equal(a, b) for a, b in zip(frames, expected))
    frames2, _ = decode_video(payload)
    assert all(np.array_equal(a, b) for a, b in zip(frames2, expected))
    # strf says 8x8 but the frames are 16x16 → loud error
    with pytest.raises(ValueError, match="geometry"):
        decode_avi(encode_avi_mjpeg(jpegs, 8, 8))


@settings(max_examples=120, deadline=None)
@given(seed=st.integers(0, 1_000), pos_frac=st.floats(0.0, 1.0))
def test_aiff_au_any_single_byte_flip_is_total(seed, pos_frac):
    """Corruption totality for the CRC-less big-endian containers:
    AIFF and AU cannot promise detection (a flipped sample byte is a
    different legal sample), but a flip must never escape as anything
    other than a clean decode or ValueError — no struct.error /
    IndexError / numpy reshape blowups from chunk-walk or header
    corruption."""
    from coltt_spark.operators.media_codecs import (
        decode_aiff,
        decode_au,
        encode_aiff,
        encode_au,
    )

    rng = np.random.default_rng(seed)
    n = int(rng.integers(4, 200))
    shape = (n, 2) if seed % 2 else (n,)
    x = rng.integers(-32768, 32768, shape, dtype=np.int16)
    for enc, dec in ((encode_aiff, decode_aiff), (encode_au, decode_au)):
        payload = bytearray(enc(x, 8000))
        pos = min(int(pos_frac * len(payload)), len(payload) - 1)
        payload[pos] ^= 0x5A
        try:
            samples, rate = dec(bytes(payload))
            assert samples.dtype in (np.int16, np.int32)
        except ValueError:
            pass

def test_g711_mulaw_compress_matches_expansion_table():
    """The μ-law compressor must be the exact inverse-domain map of the
    shipped expansion table for EVERY int16 value: expanding the
    compressed code yields the standard quantized value (monotone,
    sign-preserving, idempotent under re-compression), and every one
    of the 256 codes round-trips code → linear → code (up to the ±0
    code pair). This is the contract the audio-dedup oracle replays in
    integer SQL."""
    import numpy as np

    from coltt_spark.operators.media_codecs import (
        _g711_table,
        g711_mulaw_compress,
    )

    table = _g711_table("mu")
    s = np.arange(-32768, 32768, dtype=np.int64)
    codes = g711_mulaw_compress(s)
    q = table[codes].astype(np.int64)
    # sign preserved, quantization error bounded by the segment step
    assert (np.sign(q) == np.sign(s)).all() or ((q == 0) & (s == 0)).any()
    m = np.minimum(np.abs(s), 32635) + 132
    seg = np.zeros_like(m)
    for t in range(8, 15):
        seg += (m >= (1 << t)).astype(np.int64)
    step = 1 << (seg + 3)
    assert (np.abs(q - np.clip(s, -32635, 32635)) <= step).all()
    # idempotent in the VALUE domain: re-compressing the quantized
    # value expands back to the same value (the code itself may cross
    # the ±0 pair: -1..-3 quantize to -0, which re-compresses as +0)
    assert (table[g711_mulaw_compress(q)].astype(np.int64) == q).all()
    # monotone in the magnitude domain
    pos = q[s >= 0]
    assert (np.diff(pos) >= 0).all()

def test_g711_mulaw_compress_vs_stdlib_audioop():
    """Independent cross-check of the μ-law COMPRESSOR: stdlib
    audioop's lin2ulaw runs the CCITT 14-bit reference pipeline
    (magnitude pre-truncated by 2 bits before the bias), so 381 of the
    65536 int16 values land one code away from our full-16-bit
    truncating encoder. Pin the relationship exactly: codes agree
    everywhere else, never differ by more than one, and on every
    disagreement OUR code's expanded value is strictly NEARER the
    input (the pre-truncation loses exactly that information)."""
    import pytest

    audioop = pytest.importorskip("audioop")  # removed in 3.13
    import numpy as np

    from coltt_spark.operators.media_codecs import (
        _g711_table,
        g711_mulaw_compress,
    )

    s = np.arange(-32768, 32768, dtype=np.int64)
    want = np.frombuffer(
        audioop.lin2ulaw(s.astype("<i2").tobytes(), 2), dtype=np.uint8
    )
    got = g711_mulaw_compress(s)
    diff = np.nonzero(want != got)[0]
    assert len(diff) == 381
    assert (np.abs(want[diff].astype(int) - got[diff].astype(int)) == 1).all()
    table = _g711_table("mu").astype(np.int64)
    err_ours = np.abs(table[got[diff]] - s[diff])
    err_aop = np.abs(table[want[diff]] - s[diff])
    assert (err_ours < err_aop).all()
