"""Real, dependency-free image codecs for the media decode seam.

PIL / pyav are not available in this environment, but two real image
formats are decodable with nothing but ``struct`` + numpy: 24-bit
uncompressed BMP and binary PPM (P6). This module implements them and
exposes :func:`image_decoder`, a drop-in for the
``extract_features(decoder=...)`` seam (``(payload, out_len) ->
float32[out_len]``) — so the multimodal path is exercised end-to-end
with REAL pixel decoding, not only the deterministic fake
(reference scope stops at opaque blobs; this is the engine-side
plumbing a training pipeline needs).

Scale note: decoding runs inside the Arrow-batched ``mapInPandas``
kernel on executors — one Python pass per batch, no driver
involvement, same plan as the fake decoder.
"""

from __future__ import annotations

import struct

import numpy as np


def _decode_dib_rows(body: bytes, width: int, height: int, *, offset: int = 0) -> np.ndarray:
    """Unpack one 24-bit DIB pixel block (bottom-up when ``height`` is
    positive, BGR, rows padded to 4 bytes — the layout BMP files and
    AVI '00db' chunks share) → (H, W, 3) uint8 RGB. Validates
    geometry and length, raising ValueError."""
    if width <= 0 or height == 0:
        raise ValueError(f"invalid DIB dimensions {width}x{height}")
    flipped = height > 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    if len(body) < offset + row_bytes * height:
        raise ValueError("truncated DIB pixel block")
    rows = np.frombuffer(
        body, dtype=np.uint8, count=row_bytes * height, offset=offset
    ).reshape(height, row_bytes)
    img = rows[:, : width * 3].reshape(height, width, 3)
    if flipped:
        img = img[::-1]
    return img[:, :, ::-1]  # BGR → RGB


def _encode_dib_rows(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → bottom-up padded BGR DIB pixel block."""
    h, w, _ = img.shape
    row_bytes = (w * 3 + 3) & ~3
    pad = b"\x00" * (row_bytes - w * 3)
    bgr = img[:, :, ::-1]
    return b"".join(
        bgr[r].astype(np.uint8).tobytes() + pad for r in range(h - 1, -1, -1)
    )


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed bottom-up BMP → (H, W, 3) uint8
    (RGB). Raises ValueError on any other BMP flavor."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    return _decode_dib_rows(payload, width, height, offset=data_offset)


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode a binary PPM (P6, maxval 255) → (H, W, 3) uint8 RGB."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: magic, width, height, maxval — whitespace separated,
    # '#' comments allowed between tokens
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = width * height * 3
    if len(payload) - pos < need:
        raise ValueError("truncated PPM payload")
    return np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos).reshape(
        height, width, 3
    )


def decode_image(payload: bytes) -> np.ndarray:
    """Sniff the magic and decode BMP, PPM, or PNG → (H, W, 3) uint8
    (PNG color type 6 yields (H, W, 4) RGBA; RGB consumers slice
    ``[..., :3]``)."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(payload)
    raise ValueError("unknown image magic")


def image_decoder(payload: bytes, out_len: int) -> np.ndarray:
    """Real-image drop-in for the ``extract_features`` decoder seam:
    decode → grayscale (ITU-R BT.601 luma) → resample the flattened
    luma to ``out_len`` by linear interpolation → [0, 1] float32."""
    img = decode_image(bytes(payload))
    luma = (
        0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
    ).ravel()
    if len(luma) == 0:
        raise ValueError("empty image")
    xs = np.linspace(0.0, len(luma) - 1.0, out_len)
    return (np.interp(xs, np.arange(len(luma)), luma) / 255.0).astype(np.float32)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE payload → ``(int16 samples, sample_rate)``.

    Supports the format a stdlib ``wave.open`` writer produces:
    uncompressed PCM (format tag 1), 16-bit, mono. Walks the chunk
    list (chunks pad to even offsets per RIFF), so extra chunks
    (LIST/INFO, fact) before ``data`` are fine. Raises ValueError on
    any other flavor — loud beats silently-wrong samples."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = None
    for cid, body in _riff_subchunks(payload[12:]):
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError("short WAV fmt chunk")
    audio_fmt, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_fmt != 1 or bits != 16 or channels != 1:
        raise ValueError(
            f"unsupported WAV (fmt={audio_fmt}, channels={channels}, bits={bits})"
        )
    if len(data) % 2:
        raise ValueError("odd WAV data size for 16-bit samples")
    return np.frombuffer(data, dtype="<i2"), int(rate)


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM16 bytes (fixture helper —
    byte-compatible with what stdlib ``wave`` writes)."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def audio_decoder(payload: bytes, out_len: int) -> np.ndarray:
    """Real-audio drop-in for the ``extract_features`` decoder seam:
    decode WAV → normalize to [-1, 1] → resample to ``out_len`` by
    linear interpolation → float32 (the fixed-width "embedding" shape
    downstream retrieval expects)."""
    samples, _ = decode_wav(bytes(payload))
    if len(samples) == 0:
        raise ValueError("empty WAV data chunk")
    xs = np.linspace(0.0, len(samples) - 1.0, out_len)
    return (
        np.interp(xs, np.arange(len(samples)), samples.astype(np.float64)) / 32768.0
    ).astype(np.float32)


def _riff_subchunks(buf: bytes):
    """Yield ``(chunk_id, body)`` pairs from a RIFF chunk run
    (chunks pad to even offsets)."""
    pos = 0
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", buf, pos + 4)
        if pos + 8 + csize > len(buf):
            raise ValueError("truncated RIFF chunk")
        yield cid, buf[pos + 8 : pos + 8 + csize]
        pos += 8 + csize + (csize & 1)


def decode_avi(payload: bytes) -> tuple[list[np.ndarray], float]:
    """Decode an AVI container with uncompressed 24-bit DIB frames →
    ``(frames, fps)`` where each frame is (H, W, 3) uint8 RGB.

    Walks RIFF 'AVI ' → LIST 'hdrl' (avih for the frame interval,
    strf BITMAPINFOHEADER for geometry) → LIST 'movi' ('00db'/'##db'
    uncompressed frame chunks, bottom-up BGR rows padded to 4 bytes —
    the same DIB layout as BMP). Raises ValueError on compressed
    streams or any other bpp — loud beats silently-wrong pixels."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    usec_per_frame = width = height = bpp = compression = None
    frame_bodies: list[bytes] = []
    for cid, body in _riff_subchunks(payload[12:]):
        if cid != b"LIST":
            continue
        list_type = body[:4]
        if list_type == b"hdrl":
            for sub, sbody in _riff_subchunks(body[4:]):
                if sub == b"avih":
                    (usec_per_frame,) = struct.unpack_from("<I", sbody, 0)
                elif sub == b"LIST" and sbody[:4] == b"strl":
                    for s2, s2body in _riff_subchunks(sbody[4:]):
                        if s2 == b"strf":
                            _, width, height, _, bpp, compression = struct.unpack_from(
                                "<IiiHHI", s2body, 0
                            )
        elif list_type == b"movi":
            for sub, sbody in _riff_subchunks(body[4:]):
                if sub[2:4] in (b"db", b"dc"):
                    frame_bodies.append(sbody)
    if width is None or usec_per_frame is None:
        raise ValueError("AVI missing hdrl/strf metadata")
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported AVI stream (bpp={bpp}, compression={compression})")
    frames = [_decode_dib_rows(body, width, height) for body in frame_bodies]
    if usec_per_frame <= 0:
        raise ValueError("invalid AVI frame interval")
    return frames, 1e6 / usec_per_frame


def encode_avi(frames: list[np.ndarray], fps: float = 5.0) -> bytes:
    """(H, W, 3) uint8 RGB frames → AVI bytes with uncompressed 24-bit
    DIB frames ('00db' chunks, bottom-up BGR, 4-byte row padding) and
    a standards-shaped hdrl + idx1 so external players accept the file
    (fixture helper)."""
    if not frames:
        raise ValueError("no frames")
    h, w, _ = frames[0].shape
    frame_size = ((w * 3 + 3) & ~3) * h

    usec = int(round(1e6 / fps))
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec, int(round(frame_size * fps)), 0, 0x10, len(frames), 0, 1,
        frame_size, w, h,
        0, 0, 0, 0,
    )
    # strh timing is scale/rate — use per-mille so non-integer frame
    # rates (12.5, 29.97) survive; players derive timing from here,
    # avih's usec is advisory
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1000, int(round(fps * 1000)), 0, len(frames),
        frame_size, 0xFFFFFFFF, 0, 0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    strl = b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)
    hdrl = b"hdrl" + chunk(b"avih", avih) + chunk(b"LIST", strl)
    movi_items = [chunk(b"00db", _encode_dib_rows(f)) for f in frames]
    movi = b"movi" + b"".join(movi_items)
    idx, offset = [], 4
    for item in movi_items:
        idx.append(struct.pack("<4sIII", b"00db", 0x10, offset, len(item) - 8))
        offset += len(item)
    body = (
        b"AVI "
        + chunk(b"LIST", hdrl)
        + chunk(b"LIST", movi)
        + chunk(b"idx1", b"".join(idx))
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary PPM bytes (test fixture helper)."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit bottom-up BMP bytes (test fixture
    helper)."""
    h, w, _ = img.shape
    data = _encode_dib_rows(img)
    offset = 14 + 40
    size = offset + len(data)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, offset)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + dib + bytes(data)


# -- PNG (the first COMPRESSED format in the codec family) ------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunks(payload: bytes):
    """Yield ``(chunk_type, body)`` pairs from a PNG byte stream,
    verifying each chunk's CRC32 (loud beats silently-wrong pixels).
    Stops at IEND; raises ValueError on truncation or CRC mismatch."""
    import zlib

    pos = 8
    while pos + 12 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        if pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, body
        if ctype == b"IEND":
            return
        pos += 12 + length
    raise ValueError("PNG missing IEND")


def _paeth(a: int, b: int, c: int) -> int:
    """PaethPredictor from the PNG spec (a=left, b=up, c=up-left)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit truecolor (color type 2) or truecolor+alpha
    (color type 6), non-interlaced PNG → (H, W, 3|4) uint8 — the
    first codec in this family that walks a COMPRESSED payload
    end-to-end: CRC-checked chunk walk → IDAT concat → stdlib
    ``zlib`` inflate → per-row unfiltering (None/Sub/Up/Average/
    Paeth, bpp-aware). Raises ValueError on any other PNG flavor
    (palette, grayscale, 16-bit, interlaced) — loud beats
    silently-wrong pixels. Downstream RGB consumers slice
    ``[..., :3]`` (alpha rarely carries training signal).

    The inverse filters reconstruct each row from the RECONSTRUCTED
    left/up neighbors (spec §9): Up is vectorized, Sub is a per-channel
    cumulative sum mod 256, Average/Paeth carry a true left-dependency
    and run as per-pixel loops (a production build would push these
    into a C kernel; the container walk and inflate dominate here)."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    ihdr = None
    idat: list[bytes] = []
    for ctype, body in _png_chunks(payload):
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat.append(body)
    if ihdr is None or len(ihdr) != 13 or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or color not in (2, 6) or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={color}, "
            f"interlace={interlace})"
        )
    if w <= 0 or h <= 0:
        raise ValueError(f"invalid PNG dimensions {w}x{h}")
    raw = zlib.decompress(b"".join(idat))
    bpp = 4 if color == 6 else 3
    stride = w * bpp
    if len(raw) != (stride + 1) * h:
        raise ValueError("PNG pixel data length mismatch")
    img = np.empty((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).copy()
        if ft == 0:  # None
            cur = line
        elif ft == 1:  # Sub: prefix sum per channel, mod 256
            cur = np.cumsum(line.reshape(w, bpp), axis=0, dtype=np.uint64).astype(
                np.uint8
            ).reshape(stride)
        elif ft == 2:  # Up: uint8 addition wraps mod 256
            cur = line + prior
        elif ft == 3:  # Average
            cur = line
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(cur[x]) + ((left + int(prior[x])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            cur = line
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                upleft = int(prior[x - bpp]) if x >= bpp else 0
                cur[x] = (int(cur[x]) + _paeth(left, int(prior[x]), upleft)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        img[r] = cur
        prior = cur
    return img.reshape(h, w, bpp)


# -- JPEG baseline (ITU-T T.81 — the real-world compressed format) ----
#
# Sequential baseline DCT, 8-bit, 4:4:4 (no chroma subsampling) or
# grayscale, Huffman entropy coding, optional restart markers. The
# decoder builds its Huffman tables from the file's own DHT segments
# (never from the encoder's constants), dequantizes from the file's
# DQT, and runs a separable float IDCT — so a file from ANY conforming
# baseline encoder with these sampling factors decodes. The pinned
# integer rounding (floor(x + 0.5)) in the IDCT level shift and the
# YCbCr→RGB conversion makes decoded pixels reproducible in SQL for
# DC-only (per-block-constant) fixtures — the discipline every codec
# in this family follows.

#: Zigzag scan order: _JPEG_ZIGZAG[i] = flat (row*8+col) index of the
#: i-th zigzag coefficient (T.81 Figure 5). Generated, not typed: for
#: each anti-diagonal d=row+col, odd d walks row-ascending, even d
#: row-descending.
_JPEG_ZIGZAG = np.array(
    [
        r * 8 + (d - r)
        for d in range(15)
        for r in (
            range(max(0, d - 7), min(d, 7) + 1)
            if d % 2 == 1
            else range(min(d, 7), max(0, d - 7) - 1, -1)
        )
    ],
    dtype=np.int64,
)

#: 8×8 DCT-II basis: F = M @ S @ M.T (forward), S = M.T @ F @ M
#: (inverse) for an 8×8 spatial block S and coefficient block F.
_JPEG_DCT_M = np.array(
    [
        [
            0.5 * (1.0 / np.sqrt(2.0) if u == 0 else 1.0)
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

#: Standard Huffman tables from T.81 Annex K.3 (the tables every
#: baseline encoder ships): (BITS[1..16], HUFFVAL) per class.
_JPEG_STD_DC_LUMA = (
    bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]),
    bytes(range(12)),
)
_JPEG_STD_DC_CHROMA = (
    bytes([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]),
    bytes(range(12)),
)
_JPEG_STD_AC_LUMA = (
    bytes([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]),
    bytes.fromhex(
        "01020300041105122131410613516107"
        "22711432" "8191a108" "2342b1c1" "1552d1f0"
        "24336272" "82090a16" "1718191a" "25262728"
        "292a3435" "36373839" "3a434445" "46474849"
        "4a535455" "56575859" "5a636465" "66676869"
        "6a737475" "76777879" "7a838485" "86878889"
        "8a929394" "95969798" "999aa2a3" "a4a5a6a7"
        "a8a9aab2" "b3b4b5b6" "b7b8b9ba" "c2c3c4c5"
        "c6c7c8c9" "cad2d3d4" "d5d6d7d8" "d9dae1e2"
        "e3e4e5e6" "e7e8e9ea" "f1f2f3f4" "f5f6f7f8"
        "f9fa"
    ),
)
_JPEG_STD_AC_CHROMA = (
    bytes([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]),
    bytes.fromhex(
        "00010203110405213106124151076171"
        "1322328108144291a1b1c109233352f0"
        "156272d10a162434e125f11718191a26"
        "2728292a35363738393a434445464748"
        "494a535455565758595a636465666768"
        "696a737475767778797a828384858687"
        "88898a92939495969798999aa2a3a4a5"
        "a6a7a8a9aab2b3b4b5b6b7b8b9bac2c3"
        "c4c5c6c7c8c9cad2d3d4d5d6d7d8d9da"
        "e2e3e4e5e6e7e8e9eaf2f3f4f5f6f7f8"
        "f9fa"
    ),
)


def _jpeg_build_codes(bits: bytes, vals: bytes) -> dict:
    """Canonical Huffman code assignment (T.81 Annex C):
    symbol → (code, length)."""
    if sum(bits) != len(vals):
        raise ValueError("JPEG Huffman BITS/HUFFVAL mismatch")
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >> length:
                raise ValueError("JPEG Huffman code overflow")
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def encode_png(img: np.ndarray, *, filters=None, level: int = 6) -> bytes:
    """(H, W, 3|4) uint8 → 8-bit truecolor (type 2) or
    truecolor+alpha (type 6) non-interlaced PNG bytes (fixture
    helper). ``filters`` picks the per-row filter type (default:
    cycle 0..4 so every inverse filter is exercised on decode).
    Forward filtering reads RAW neighbor bytes (spec §9), so it
    vectorizes — deliberately a different implementation shape from
    the sequential inverse in :func:`decode_png`, which keeps a shared
    encode/decode bug from cancelling out in round-trip tests."""
    import zlib

    h, w, bpp = img.shape
    if bpp not in (3, 4):
        raise ValueError(f"expected 3 (RGB) or 4 (RGBA) channels, got {bpp}")
    stride = w * bpp
    rows = np.ascontiguousarray(img, dtype=np.uint8).reshape(h, stride)
    if filters is None:
        filters = [r % 5 for r in range(h)]
    out = bytearray()
    zero = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        line = rows[r]
        prior = rows[r - 1] if r > 0 else zero
        left = np.concatenate([np.zeros(bpp, dtype=np.uint8), line[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, dtype=np.uint8), prior[:-bpp]])
        ft = int(filters[r])
        if ft == 0:
            enc = line
        elif ft == 1:
            enc = line - left
        elif ft == 2:
            enc = line - prior
        elif ft == 3:
            enc = line - ((left.astype(np.uint16) + prior) >> 1).astype(np.uint8)
        elif ft == 4:
            a = left.astype(np.int16)
            b = prior.astype(np.int16)
            c = upleft.astype(np.int16)
            p = a + b - c
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
            pred = np.where(
                (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
            ).astype(np.uint8)
            enc = line - pred
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out.append(ft)
        out.extend(enc.tobytes())

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6 if bpp == 4 else 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out), level))
        + chunk(b"IEND", b"")
    )
