"""Vector quantization: float32 → f16 / bf16 / f8 compact storage.

Reference parity: picking a ``Quantization`` selects a vector store
with identical logic but compressed vectors (``edge/vectorstore.go:69-80``,
``edge/quantization.go:27-32``); similarity always decompresses back to
float32 and reuses the float32 kernels — quantization saves memory,
not compute (``edge/f16_quantization.go:35-45``). IEEE conversion lives
in ``pkg/compresshelper/{float16,float8,bf16}.go``; this module
re-derives the public formats from scratch with vectorized numpy:

- f16  — IEEE 754 binary16 (numpy native)
- bf16 — bfloat16: round-to-nearest-even truncation of the top 16
  bits of binary32
- f8   — E4M3FN minifloat (1 sign / 4 exp / 3 mantissa, bias 7, no
  infinities, max finite 448) — the public ML float8 convention
- bq   — binary quantization (1 bit per element): the ``BQ`` member
  the reference's enum declares but never implements
  (``idl/proto/v3/core.proto:105-112``). Encode keeps the strict
  ``x > 0`` sign bit, little-endian packed (32× compression);
  decode reconstructs the ±1/√dim unit vector, so the standard
  decompress-then-float-similarity contract holds unchanged —
  cosine against the decoded pattern is a monotone proxy for the
  Hamming distance the packed form supports directly
  (:mod:`coltt_spark.operators.pq` is the Hamming-scan path).
  Requires ``dim % 8 == 0``.
- sq8  — symmetric per-vector int8 scalar quantization (the other
  declared-but-unimplemented enum member next to BQ): one float32
  scale header (max |x| of the row) + ``round(x / scale * 127)``
  per element, 4-byte header + 1 byte/element (≈4× compression).
  All scaling arithmetic is double precision with a fixed operation
  order so an SQL oracle can replay it bit-for-bit; decode returns
  ``float32(code * scale / 127)``.

Spark mapping: a quantized vector is a compact ``binary`` cell (2 or
1 bytes per element vs 4); Parquet stores it raw. Quantize/dequantize
are Arrow-batched pandas UDFs (the only Python in the path — one
decode pass per scan, amortized across the whole batch).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

KINDS = ("f16", "bf16", "f8", "bq", "sq8")


# ---------------------------------------------------------------------------
# numpy kernels (shared by UDFs and tests)


def _f8_encode(arr: np.ndarray) -> np.ndarray:
    """float32 → E4M3FN byte per element (round-half-up on mantissa)."""
    bits = np.ascontiguousarray(arr, dtype=np.float32).view(np.uint32)
    sign = ((bits >> 31) & 1).astype(np.uint8)
    exp = ((bits >> 23) & 0xFF).astype(np.int32) - 127  # unbiased
    mant = (bits & 0x7FFFFF).astype(np.uint32)

    out = np.zeros(arr.shape, dtype=np.uint8)
    a = np.abs(arr.astype(np.float32))

    # normal range: unbiased exponent in [-6, 8]
    norm = (a != 0) & (exp >= -6) & (exp <= 8)
    m8 = ((mant + (1 << 19)) >> 20).astype(np.uint32)  # round mantissa to 3 bits
    e8 = (exp + 7).astype(np.uint32)
    carry = m8 > 7  # mantissa rounding overflowed into the exponent
    m8 = np.where(carry, 0, m8)
    e8 = np.where(carry, e8 + 1, e8)
    # e8=15,m8=7 is E4M3FN's NaN bit pattern — rounding into it (inputs
    # in (452, 480]) must clamp to max finite 448, not emit NaN bits
    over = norm & ((e8 > 15) | ((e8 == 15) & (m8 == 7))) | (a != 0) & (exp > 8)
    out[norm] = ((e8[norm] << 3) | m8[norm]).astype(np.uint8)

    # subnormal range: |x| < 2^-6 → m = round(|x| * 2^9), exponent field 0
    sub = (a != 0) & (exp < -6)
    msub = np.clip(np.round(a * 512.0), 0, 7).astype(np.uint8)
    out[sub] = msub[sub]

    # overflow clamps to max finite 0b1111_110 (= 448); E4M3FN has no inf
    out[over] = 0x7E
    out |= sign << 7
    return out


def _f8_decode(b: np.ndarray) -> np.ndarray:
    """E4M3FN byte → float32."""
    b = b.astype(np.uint8)
    sign = np.where((b >> 7) & 1, np.float32(-1.0), np.float32(1.0))
    e = ((b >> 3) & 0xF).astype(np.int32)
    m = (b & 0x7).astype(np.float32)
    normal = np.ldexp((1.0 + m / 8.0).astype(np.float32), e - 7)
    subnormal = np.ldexp((m / 8.0).astype(np.float32), -6)
    return (sign * np.where(e > 0, normal, subnormal)).astype(np.float32)


def _bf16_encode(arr: np.ndarray) -> np.ndarray:
    """float32 → bfloat16 uint16 (round-to-nearest-even truncation)."""
    bits = np.ascontiguousarray(arr, dtype=np.float32).view(np.uint32)
    rounded = bits + 0x7FFF + ((bits >> 16) & 1)
    return (rounded >> 16).astype(np.uint16)


def _bf16_decode(u: np.ndarray) -> np.ndarray:
    return (u.astype(np.uint32) << 16).view(np.float32)


def _bq_encode(a: np.ndarray) -> np.ndarray:
    if a.size % 8:
        raise ValueError(f"bq requires dim % 8 == 0, got {a.size}")
    return np.packbits(a > 0, bitorder="little")


def _bq_decode(raw: bytes) -> np.ndarray:
    bits = np.unpackbits(np.frombuffer(raw, dtype=np.uint8), bitorder="little")
    return ((bits.astype(np.float64) * 2.0 - 1.0) / np.sqrt(bits.size)).astype(
        np.float32
    )


def _sq8_codes(flat64: np.ndarray, scale_per_elem: np.ndarray) -> np.ndarray:
    """``round_half_away(x / scale * 127)`` in double with a FIXED
    operation order — ``(x / s) * 127`` then ``sign * floor(|y| + 0.5)``
    — so the SQL oracle replays it exactly. ``|x| <= s`` guarantees
    ``|y| <= 127``, no clamp needed."""
    y = flat64 / scale_per_elem * 127.0
    return (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int8)


def _sq8_encode(a: np.ndarray) -> bytes:
    a = np.ascontiguousarray(a, dtype=np.float32)
    scale = np.float32(np.max(np.abs(a))) if a.size else np.float32(0.0)
    if scale > 0:
        codes = _sq8_codes(a.astype(np.float64), np.float64(scale))
    else:
        codes = np.zeros(a.size, dtype=np.int8)
    return scale.tobytes() + codes.tobytes()


def _sq8_decode(raw: bytes) -> np.ndarray:
    scale = float(np.frombuffer(raw[:4], dtype=np.float32)[0])
    codes = np.frombuffer(raw[4:], dtype=np.int8)
    return (codes.astype(np.float64) * scale / 127.0).astype(np.float32)


def quantize_np(kind: str, arr) -> bytes:
    a = np.asarray(arr, dtype=np.float32)
    if kind == "f16":
        with np.errstate(over="ignore"):  # |x| > 65504 → ±inf (IEEE)
            return a.astype(np.float16).tobytes()
    if kind == "bf16":
        return _bf16_encode(a).tobytes()
    if kind == "f8":
        return _f8_encode(a).tobytes()
    if kind == "bq":
        return _bq_encode(a).tobytes()
    if kind == "sq8":
        return _sq8_encode(a)
    raise ValueError(f"unknown quantization {kind!r}; expected one of {KINDS}")


def dequantize_np(kind: str, raw: bytes) -> np.ndarray:
    if kind == "f16":
        return np.frombuffer(raw, dtype=np.float16).astype(np.float32)
    if kind == "bf16":
        return _bf16_decode(np.frombuffer(raw, dtype=np.uint16))
    if kind == "f8":
        return _f8_decode(np.frombuffer(raw, dtype=np.uint8))
    if kind == "bq":
        return _bq_decode(raw)
    if kind == "sq8":
        return _sq8_decode(raw)
    raise ValueError(f"unknown quantization {kind!r}; expected one of {KINDS}")


# ---------------------------------------------------------------------------
# batch kernels: one numpy op over the WHOLE Arrow batch, never per row


def _encode_flat(kind: str, flat: np.ndarray) -> np.ndarray:
    if kind == "f16":
        with np.errstate(over="ignore"):  # |x| > 65504 → ±inf (IEEE)
            return flat.astype(np.float16)
    if kind == "bf16":
        return _bf16_encode(flat)
    return _f8_encode(flat)


def _decode_flat(kind: str, raw: bytes) -> np.ndarray:
    if kind == "f16":
        return np.frombuffer(raw, dtype=np.float16).astype(np.float32)
    if kind == "bf16":
        return _bf16_decode(np.frombuffer(raw, dtype=np.uint16))
    return _f8_decode(np.frombuffer(raw, dtype=np.uint8))


def quantize_batch(kind: str, s) -> "list[bytes | None]":
    """Encode a pandas Series of float vectors in one pass: concatenate
    all rows, one vectorized encode, re-split by byte offsets. The only
    per-row work left is a C-level ``bytes`` slice. (bq rows are each
    a multiple of 8 elements, so row boundaries in the concatenated
    bit stream land on byte boundaries and the same slice works.)"""
    vals = s.to_numpy()
    idx = [i for i, v in enumerate(vals) if v is not None]
    out: list[bytes | None] = [None] * len(vals)
    if not idx:
        return out
    present = [np.asarray(vals[i], dtype=np.float32) for i in idx]
    lens = np.fromiter((len(v) for v in present), dtype=np.int64, count=len(present))
    if kind == "sq8":
        flat = np.concatenate(present)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        scales = np.maximum.reduceat(np.abs(flat), starts)  # float32, per row
        safe = np.where(scales > 0, scales, np.float32(1.0)).astype(np.float64)
        codes = _sq8_codes(flat.astype(np.float64), np.repeat(safe, lens))
        codes[np.repeat(scales == 0, lens)] = 0
        bounds = np.concatenate(([0], np.cumsum(lens)))
        raw = codes.tobytes()
        hdrs = scales.tobytes()  # 4 bytes per row, contiguous
        for j, i in enumerate(idx):
            out[i] = hdrs[4 * j : 4 * j + 4] + raw[bounds[j] : bounds[j + 1]]
        return out
    if kind == "bq":
        if (lens % 8).any():
            raise ValueError("bq requires dim % 8 == 0 for every row")
        enc = np.packbits(np.concatenate(present) > 0, bitorder="little")
        bounds = np.concatenate(([0], np.cumsum(lens) // 8))
    else:
        enc = _encode_flat(kind, np.concatenate(present))
        bounds = np.concatenate(([0], np.cumsum(lens))) * enc.dtype.itemsize
    raw = enc.tobytes()
    for j, i in enumerate(idx):
        out[i] = raw[bounds[j] : bounds[j + 1]]
    return out


def dequantize_batch(kind: str, s) -> "pd.Series":
    """Decode a pandas Series of quantized byte cells in one pass:
    join buffers, one vectorized decode, ``np.split`` back into
    per-row float32 views. (bq scales each row by its OWN 1/√dim, so
    the split happens on the ±1 pattern before scaling.)"""
    import pandas as pd

    vals = s.to_numpy()
    idx = [i for i, b in enumerate(vals) if b is not None]
    out: list = [None] * len(vals)
    if not idx:
        return pd.Series(out)
    present = [bytes(vals[i]) for i in idx]
    if kind == "sq8":
        scales = np.frombuffer(
            b"".join(b[:4] for b in present), dtype=np.float32
        ).astype(np.float64)
        codes = np.frombuffer(b"".join(b[4:] for b in present), dtype=np.int8)
        lens = np.fromiter(
            (len(b) - 4 for b in present), dtype=np.int64, count=len(present)
        )
        vals64 = codes.astype(np.float64) * np.repeat(scales, lens) / 127.0
        parts = np.split(vals64.astype(np.float32), np.cumsum(lens)[:-1])
        for j, i in enumerate(idx):
            out[i] = parts[j]
        return pd.Series(out)
    if kind == "bq":
        bits = np.unpackbits(
            np.frombuffer(b"".join(present), dtype=np.uint8), bitorder="little"
        )
        signs = bits.astype(np.float64) * 2.0 - 1.0
        lens = np.fromiter((len(b) * 8 for b in present), dtype=np.int64, count=len(present))
        parts = np.split(signs, np.cumsum(lens)[:-1])
        for j, i in enumerate(idx):
            out[i] = (parts[j] / np.sqrt(parts[j].size)).astype(np.float32)
        return pd.Series(out)
    dec = _decode_flat(kind, b"".join(present))
    width = {"f16": 2, "bf16": 2, "f8": 1}[kind]
    lens = np.fromiter((len(b) // width for b in present), dtype=np.int64, count=len(present))
    parts = np.split(dec, np.cumsum(lens)[:-1])
    for j, i in enumerate(idx):
        out[i] = parts[j]
    return pd.Series(out)


# ---------------------------------------------------------------------------
# Spark column functions (Arrow-batched)


def quantize(kind: str, col: Column | str) -> Column:
    if kind not in KINDS:
        raise ValueError(f"unknown quantization {kind!r}; expected one of {KINDS}")

    @pandas_udf(T.BinaryType())
    def _q(s):
        import pandas as pd

        return pd.Series(quantize_batch(kind, s))

    return _q(F.col(col) if isinstance(col, str) else col)


def dequantize(kind: str, col: Column | str) -> Column:
    if kind not in KINDS:
        raise ValueError(f"unknown quantization {kind!r}; expected one of {KINDS}")

    @pandas_udf(T.ArrayType(T.FloatType()))
    def _dq(s):
        return dequantize_batch(kind, s)

    return _dq(F.col(col) if isinstance(col, str) else col)
