"""FLAC codec (RFC 9639 / xiph spec) — dependency-free decode/encode.

The first LOSSLESS COMPRESSED audio codec behind the
``decode_audio`` seam (WAV/AIFF/AU carry PCM or byte-mapped G.711 /
IMA ADPCM; FLAC adds real prediction + entropy coding). Decode
covers the full fixed-blocksize subset a conforming encoder emits
for 1–2 channel audio: CONSTANT / VERBATIM / FIXED(0–4) / LPC
subframes, Rice-coded residual partitions (both 4- and 5-bit
parameter methods, escape-to-raw), wasted bits, and all three
stereo decorrelation modes (left/side, right/side, mid/side).
Every integrity field the format defines is ENFORCED: frame-header
CRC-8, whole-frame CRC-16, and the STREAMINFO MD5 of the decoded
PCM — so corruption fails loudly instead of returning wrong
samples (same discipline as the PNG CRC checks).

The encoder exists for fixtures and round-trip tests: per-channel
best-of CONSTANT / FIXED(0–4) / optional LPC (Levinson–Durbin,
quantized coefficients), per-partition Rice parameter search with
escape, and a stereo-mode search. Because FLAC prediction is exact
integer arithmetic, encode→decode is bit-exact for ANY input — the
property tests lean on that.

Reference parity note: the reference engine has no audio surface
(media is an engine-side pipeline extension, SURVEY §8); the codec
exists so the multimodal seam exercises a real compressed format
end-to-end, like JPEG/PNG/GIF on the image side.

Scale note: decode runs inside Arrow-batched ``mapInPandas``
kernels on executors — per-clip Python work, no shuffle, no driver
involvement. The bit-level loops are pure Python by design
(dependency-free); the plan shape is identical to the other audio
codecs and the kernel is swappable for a C decoder without touching
the plan.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

# ---------------------------------------------------------------------------
# CRCs (table-driven; FLAC uses CRC-8 poly 0x07 over the frame header
# and CRC-16 poly 0x8005 over the whole frame, both init 0, MSB-first)


def _make_crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
        table.append(crc & mask)
    return table


_CRC8_TABLE = _make_crc_table(0x07, 8)
_CRC16_TABLE = _make_crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC16_TABLE[((crc >> 8) ^ b) & 0xFF] ^ ((crc << 8) & 0xFFFF)
    return crc


# ---------------------------------------------------------------------------
# MSB-first bit IO


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, bit_pos: int = 0):
        self.data = data
        self.pos = bit_pos  # absolute bit position

    def read(self, n: int) -> int:
        """Read ``n`` bits MSB-first as an unsigned int."""
        pos, data = self.pos, self.data
        end = pos + n
        if end > len(data) * 8:
            raise ValueError("FLAC bitstream truncated")
        out = 0
        while n > 0:
            byte_i, bit_i = divmod(pos, 8)
            take = min(8 - bit_i, n)
            chunk = (data[byte_i] >> (8 - bit_i - take)) & ((1 << take) - 1)
            out = (out << take) | chunk
            pos += take
            n -= take
        self.pos = pos
        return out

    def read_signed(self, n: int) -> int:
        if n == 0:
            return 0
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        """Count 0 bits until the terminating 1 bit."""
        q = 0
        pos, data = self.pos, self.data
        total = len(data) * 8
        while True:
            if pos >= total:
                raise ValueError("FLAC bitstream truncated in unary code")
            byte_i, bit_i = divmod(pos, 8)
            rest = data[byte_i] & ((1 << (8 - bit_i)) - 1)
            if rest == 0:
                q += 8 - bit_i
                pos += 8 - bit_i
                continue
            lead = (8 - bit_i) - rest.bit_length()
            q += lead
            pos += lead + 1  # consume the terminating 1
            self.pos = pos
            return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        if self.pos % 8:
            raise ValueError("bit reader not byte-aligned")
        return self.pos // 8


class _BitWriter:
    __slots__ = ("_chunks", "_acc", "_nbits")

    def __init__(self):
        self._chunks = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        if value < 0 or value >> n:
            raise ValueError(f"value {value} does not fit in {n} bits")
        self._acc = (self._acc << n) | value
        self._nbits += n
        while self._nbits >= 8:
            self._nbits -= 8
            self._chunks.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_signed(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def getvalue(self) -> bytes:
        if self._nbits:
            raise ValueError("bit writer not byte-aligned")
        return bytes(self._chunks)


# ---------------------------------------------------------------------------
# Header code tables

_BLOCK_SIZE_CODES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_SAMPLE_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

#: fixed-predictor coefficients by order (RFC 9639 §9.2.3)
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _read_utf8_coded(r: _BitReader) -> int:
    """FLAC's extended-UTF-8 frame/sample number (up to 7 bytes)."""
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    probe = b0
    while probe & 0x80:
        n += 1
        probe = (probe << 1) & 0xFF
    if n < 2 or n > 7:
        raise ValueError(f"invalid FLAC coded-number lead byte {b0:#x}")
    val = b0 & (0x7F >> n)
    for _ in range(n - 1):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("invalid FLAC coded-number continuation byte")
        val = (val << 6) | (b & 0x3F)
    return val


def _write_utf8_coded(w: _BitWriter, val: int) -> None:
    if val < 0x80:
        w.write(val, 8)
        return
    payload = []
    n = 2
    while val >= (1 << (5 * n + 1)) and n < 7:
        n += 1
    for _ in range(n - 1):
        payload.append(0x80 | (val & 0x3F))
        val >>= 6
    lead = ((0xFF << (8 - n)) & 0xFF) | val
    w.write(lead, 8)
    for b in reversed(payload):
        w.write(b, 8)


# ---------------------------------------------------------------------------
# Decode


def _decode_residual(r: _BitReader, block_size: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    part_order = r.read(4)
    nparts = 1 << part_order
    if block_size % nparts:
        raise ValueError("FLAC partition order does not divide block size")
    out: list[int] = []
    for p in range(nparts):
        n = (block_size >> part_order) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC first partition shorter than predictor order")
        param = r.read(plen)
        if param == escape:
            nbits = r.read(5)
            if nbits == 0:
                out.extend([0] * n)
            else:
                out.extend(r.read_signed(nbits) for _ in range(n))
        else:
            for _ in range(n):
                q = r.read_unary()
                v = (q << param) | r.read(param)
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


def _decode_subframe(r: _BitReader, block_size: int, bps: int) -> list[int]:
    if r.read(1):
        raise ValueError("FLAC subframe padding bit set")
    sf_type = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
        bps -= wasted
        if bps <= 0:
            raise ValueError("FLAC wasted bits exceed sample size")
    if sf_type == 0:  # CONSTANT
        samples = [r.read_signed(bps)] * block_size
    elif sf_type == 1:  # VERBATIM
        samples = [r.read_signed(bps) for _ in range(block_size)]
    elif 8 <= sf_type <= 12:  # FIXED, order 0-4
        order = sf_type - 8
        samples = [r.read_signed(bps) for _ in range(order)]
        res = _decode_residual(r, block_size, order)
        coefs = _FIXED_COEFS[order]
        for i, e in enumerate(res):
            pred = sum(c * samples[order + i - 1 - j] for j, c in enumerate(coefs))
            samples.append(pred + e)
    elif sf_type >= 32:  # LPC, order 1-32
        order = (sf_type & 31) + 1
        samples = [r.read_signed(bps) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision code 1111")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [r.read_signed(prec) for _ in range(order)]
        res = _decode_residual(r, block_size, order)
        for i, e in enumerate(res):
            acc = sum(c * samples[order + i - 1 - j] for j, c in enumerate(coefs))
            samples.append((acc >> shift) + e)
    else:
        raise ValueError(f"reserved FLAC subframe type {sf_type}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC payload → ``(samples, sample_rate)`` in the
    audio-family convention (int16 for 8/16-bit, int32 for 24/32-bit;
    stereo ``(n, 2)``). Frame-header CRC-8, whole-frame CRC-16, and
    the STREAMINFO PCM MD5 are all verified — a ValueError names the
    first failing check."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    streaminfo = None
    last = False
    while not last:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC metadata block header")
        hdr = payload[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        size = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + size]
        if len(body) != size:
            raise ValueError("truncated FLAC metadata block")
        if btype == 127:
            raise ValueError("invalid FLAC metadata block type 127")
        if btype == 0:
            if size != 34:
                raise ValueError(f"FLAC STREAMINFO must be 34 bytes, got {size}")
            streaminfo = body
        pos += 4 + size
    if streaminfo is None:
        raise ValueError("FLAC stream missing STREAMINFO")
    r = _BitReader(streaminfo)
    min_bs = r.read(16)
    max_bs = r.read(16)
    if min_bs < 16 or min_bs > max_bs:
        raise ValueError("invalid FLAC STREAMINFO block-size bounds")
    min_fs = r.read(24)  # 0 = unknown
    max_fs = r.read(24)
    rate = r.read(20)
    channels = r.read(3) + 1
    bps = r.read(5) + 1
    total = r.read(36)
    md5_expect = streaminfo[18:34]
    if rate == 0:
        raise ValueError("FLAC sample rate 0")
    if channels not in (1, 2):
        raise ValueError(f"unsupported FLAC channel count {channels}")
    if bps not in (8, 16, 24, 32):
        raise ValueError(f"unsupported FLAC bits-per-sample {bps}")

    chans: list[list[int]] = [[] for _ in range(channels)]
    decoded = 0
    while pos < len(payload) and (total == 0 or decoded < total):
        frame_start = pos
        r = _BitReader(payload, pos * 8)
        sync = r.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"bad FLAC frame sync {sync:#x}")
        if r.read(1):
            raise ValueError("FLAC frame reserved bit set")
        r.read(1)  # blocking strategy (frame vs sample number)
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        if r.read(1):
            raise ValueError("FLAC frame header reserved bit set")
        _read_utf8_coded(r)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code 0")
        elif bs_code == 6:
            block_size = r.read(8) + 1
        elif bs_code == 7:
            block_size = r.read(16) + 1
        else:
            block_size = _BLOCK_SIZE_CODES[bs_code]
        if sr_code == 0:
            frame_rate = rate
        elif sr_code == 12:
            frame_rate = r.read(8) * 1000
        elif sr_code == 13:
            frame_rate = r.read(16)
        elif sr_code == 14:
            frame_rate = r.read(16) * 10
        elif sr_code == 15:
            raise ValueError("invalid FLAC sample rate code 15")
        else:
            frame_rate = _SAMPLE_RATE_CODES[sr_code]
        if frame_rate != rate:
            raise ValueError("FLAC frame sample rate differs from STREAMINFO")
        if ss_code == 0:
            frame_bps = bps
        elif ss_code == 3:
            raise ValueError("reserved FLAC sample size code 3")
        else:
            frame_bps = _SAMPLE_SIZE_CODES[ss_code]
        if frame_bps != bps:
            raise ValueError("FLAC frame sample size differs from STREAMINFO")
        r.align()
        hdr_end = r.byte_pos()
        crc8_got = r.read(8)
        if _crc8(payload[frame_start:hdr_end]) != crc8_got:
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ch_code <= 7:
            frame_ch = ch_code + 1
            side_idx = -1
        elif ch_code in (8, 9, 10):
            frame_ch = 2
            side_idx = 1 if ch_code in (8, 10) else 0
        else:
            raise ValueError(f"reserved FLAC channel assignment {ch_code}")
        if frame_ch != channels:
            raise ValueError("FLAC frame channel count differs from STREAMINFO")

        sub = []
        for ch in range(frame_ch):
            ch_bps = bps + (1 if ch == side_idx else 0)
            sub.append(_decode_subframe(r, block_size, ch_bps))
        r.align()
        frame_end = r.byte_pos()
        crc16_got = r.read(16)
        if _crc16(payload[frame_start:frame_end]) != crc16_got:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = frame_end + 2
        frame_len = pos - frame_start
        if (min_fs and frame_len < min_fs) or (max_fs and frame_len > max_fs):
            raise ValueError("FLAC frame size outside STREAMINFO bounds")

        if ch_code == 8:  # left/side
            left = sub[0]
            right = [left_i - s for left_i, s in zip(left, sub[1])]
            sub = [left, right]
        elif ch_code == 9:  # right/side
            right = sub[1]
            left = [r_i + s for r_i, s in zip(right, sub[0])]
            sub = [left, right]
        elif ch_code == 10:  # mid/side
            left, right = [], []
            for m, s in zip(sub[0], sub[1]):
                m = (m << 1) | (s & 1)
                left.append((m + s) >> 1)
                right.append((m - s) >> 1)
            sub = [left, right]
        for ch in range(channels):
            chans[ch].extend(sub[ch])
        decoded += block_size

    if total and decoded != total:
        raise ValueError(
            f"FLAC stream decoded {decoded} samples, STREAMINFO says {total}"
        )
    dtype = np.int16 if bps <= 16 else np.int32
    arr = np.array(chans, dtype=np.int64).T  # (n, channels)
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if arr.size and (arr.min() < lo or arr.max() > hi):
        raise ValueError("FLAC decoded sample out of range for bits-per-sample")
    if md5_expect != b"\x00" * 16:
        width = bps // 8
        pcm = b"".join(
            int(v).to_bytes(width, "little", signed=True) for v in arr.reshape(-1)
        )
        if hashlib.md5(pcm).digest() != md5_expect:
            raise ValueError("FLAC STREAMINFO PCM MD5 mismatch")
    out = arr.astype(dtype)
    return (out[:, 0] if channels == 1 else out), int(rate)


# ---------------------------------------------------------------------------
# Encode


def _rice_cost(res: list[int], param: int) -> int:
    return sum((((e << 1) ^ (e >> 63)) >> param) + 1 + param for e in res)


def _zigzag(e: int) -> int:
    return (e << 1) if e >= 0 else (((-e) << 1) - 1)


def _best_rice_param(res: list[int], max_param: int) -> tuple[int, int]:
    best_p, best_c = 0, _rice_cost(res, 0)
    for p in range(1, max_param):
        c = _rice_cost(res, p)
        if c < best_c:
            best_p, best_c = p, c
    return best_p, best_c


def _write_residual(
    w: _BitWriter, res: list[int], block_size: int, order: int, partition_order: int
) -> None:
    if block_size % (1 << partition_order):
        raise ValueError("partition order does not divide block size")
    w.write(0, 2)  # method 0: 4-bit rice params
    w.write(partition_order, 4)
    idx = 0
    for p in range(1 << partition_order):
        n = (block_size >> partition_order) - (order if p == 0 else 0)
        part = res[idx : idx + n]
        idx += n
        param, rice_bits = _best_rice_param(part, 15)
        raw_n = max((abs(e).bit_length() + 1 for e in part), default=1)
        if part and 5 + raw_n * n < rice_bits:
            w.write(15, 4)  # escape
            w.write(raw_n, 5)
            for e in part:
                w.write_signed(e, raw_n)
        else:
            w.write(param, 4)
            for e in part:
                v = _zigzag(e)
                w.write_unary(v >> param)
                w.write(v & ((1 << param) - 1), param)


def _fixed_residual(sig: list[int], order: int) -> list[int]:
    coefs = _FIXED_COEFS[order]
    return [
        sig[i] - sum(c * sig[i - 1 - j] for j, c in enumerate(coefs))
        for i in range(order, len(sig))
    ]


def _lpc_analyze(sig: list[int], order: int, precision: int = 12):
    """Levinson–Durbin on the raw autocorrelation → quantized integer
    coefficients ``(coefs, shift)`` or None when the signal is too
    short / degenerate. Any prediction quality is LEGAL (the residual
    absorbs the error exactly); better prediction just compresses
    smaller."""
    n = len(sig)
    if n <= order:
        return None
    x = np.asarray(sig, dtype=np.float64)
    auto = [float(np.dot(x[: n - lag], x[lag:])) for lag in range(order + 1)]
    if auto[0] == 0.0:
        return None
    err = auto[0]
    lpc = np.zeros(order)
    for i in range(order):
        acc = auto[i + 1] - float(np.dot(lpc[:i], auto[i:0:-1][:i]))
        k = acc / err
        lpc[: i + 1] = np.r_[lpc[:i] - k * lpc[:i][::-1], k]
        err *= 1.0 - k * k
        if err <= 0.0:
            return None
    cmax = float(np.max(np.abs(lpc)))
    if not np.isfinite(cmax) or cmax == 0.0:
        return None
    shift = precision - 1 - max(0, int(np.floor(np.log2(cmax))) + 1)
    shift = max(1, min(15, shift))
    q = np.round(lpc * (1 << shift)).astype(np.int64)
    lim = 1 << (precision - 1)
    q = np.clip(q, -lim, lim - 1)
    if not np.any(q):
        return None
    return [int(c) for c in q], shift


def _lpc_residual(sig: list[int], coefs: list[int], shift: int) -> list[int]:
    order = len(coefs)
    return [
        sig[i] - (sum(c * sig[i - 1 - j] for j, c in enumerate(coefs)) >> shift)
        for i in range(order, len(sig))
    ]


def _encode_subframe(
    w: _BitWriter,
    sig: list[int],
    bps: int,
    *,
    lpc_order: int,
    partition_order: int,
    force: str | None = None,
) -> None:
    block_size = len(sig)
    if force == "verbatim":
        w.write(0, 1)
        w.write(1, 6)
        w.write(0, 1)
        for s in sig:
            w.write_signed(s, bps)
        return
    if force != "no_constant" and len(set(sig)) == 1:
        w.write(0, 1)
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)
        w.write_signed(sig[0], bps)
        return
    # pick the cheapest FIXED order by residual magnitude, then let an
    # LPC attempt beat it if asked for
    best = None
    for order in range(min(4, block_size - 1) + 1):
        if block_size >> partition_order <= order and partition_order:
            continue
        res = _fixed_residual(sig, order)
        cost = sum(abs(e) for e in res)
        if best is None or cost < best[0]:
            best = (cost, "fixed", order, res, None, None)
    if lpc_order and block_size > lpc_order:
        fit = _lpc_analyze(sig, lpc_order)
        if fit is not None and not (
            partition_order and block_size >> partition_order <= lpc_order
        ):
            coefs, shift = fit
            res = _lpc_residual(sig, coefs, shift)
            cost = sum(abs(e) for e in res)
            if cost < best[0]:
                best = (cost, "lpc", lpc_order, res, coefs, shift)
    _, kind, order, res, coefs, shift = best
    w.write(0, 1)
    if kind == "fixed":
        w.write(8 + order, 6)
    else:
        w.write(32 + order - 1, 6)
    w.write(0, 1)  # no wasted bits
    for s in sig[:order]:
        w.write_signed(s, bps)
    if kind == "lpc":
        w.write(12 - 1, 4)  # precision 12
        w.write_signed(shift, 5)
        for c in coefs:
            w.write_signed(c, 12)
    _write_residual(w, res, block_size, order, partition_order)


def encode_flac(
    samples: np.ndarray,
    rate: int,
    *,
    block_size: int = 4096,
    lpc_order: int = 0,
    stereo: str = "auto",
    partition_order: int = 0,
    force: str | None = None,
) -> bytes:
    """int16 samples — 1-D mono or (n, 2) stereo — → FLAC bytes.
    ``lpc_order`` 0 means FIXED-only; ``stereo`` is 'auto' (cost
    search), 'independent', 'left_side', 'right_side' or 'mid_side';
    ``force='verbatim'`` pins every subframe VERBATIM (test hook).
    The STREAMINFO MD5 is always filled in, so decode self-checks."""
    arr = np.asarray(samples, dtype=np.int16)
    channels = 1 if arr.ndim == 1 else arr.shape[1]
    if arr.ndim > 2 or channels not in (1, 2):
        raise ValueError("expected (n,) mono or (n, 2) stereo int16 samples")
    if not 16 <= block_size <= 65535:
        raise ValueError("block_size must be in [16, 65535]")
    n = len(arr)
    if n == 0:
        raise ValueError("cannot encode empty audio")
    bps = 16
    md5 = hashlib.md5(arr.astype("<i2").tobytes()).digest()

    frames = bytearray()
    n_frames = -(-n // block_size)
    for fi in range(n_frames):
        chunk = arr[fi * block_size : (fi + 1) * block_size]
        bs = len(chunk)
        if channels == 1:
            mode, subs = 0, [[int(v) for v in chunk]]
        else:
            left = [int(v) for v in chunk[:, 0]]
            right = [int(v) for v in chunk[:, 1]]
            side = [l - r for l, r in zip(left, right)]
            mid = [(l + r) >> 1 for l, r in zip(left, right)]
            options = {
                "independent": (1, [left, right]),
                "left_side": (8, [left, side]),
                "right_side": (9, [side, right]),
                "mid_side": (10, [mid, side]),
            }
            if stereo == "auto":
                def cost(chs):
                    return sum(
                        sum(abs(e) for e in _fixed_residual(c, min(2, bs - 1)))
                        for c in chs
                    )
                mode, subs = min(
                    options.values(), key=lambda opt: cost(opt[1])
                )
            else:
                mode, subs = options[stereo]
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed block-size strategy: coded number = frame index
        exact = {v: k for k, v in _BLOCK_SIZE_CODES.items()}
        if bs in exact:
            bs_code, bs_extra = exact[bs], None
        elif bs <= 256:
            bs_code, bs_extra = 6, (bs - 1, 8)
        else:
            bs_code, bs_extra = 7, (bs - 1, 16)
        w.write(bs_code, 4)
        sr_exact = {v: k for k, v in _SAMPLE_RATE_CODES.items()}
        if rate in sr_exact:
            sr_code, sr_extra = sr_exact[rate], None
        elif rate < 65536:
            sr_code, sr_extra = 13, (rate, 16)
        else:
            sr_code, sr_extra = 0, None
        w.write(sr_code, 4)
        w.write(mode, 4)
        w.write(4, 3)  # sample size code 4 = 16-bit
        w.write(0, 1)
        _write_utf8_coded(w, fi)
        if bs_extra:
            w.write(*bs_extra)
        if sr_extra:
            w.write(*sr_extra)
        w.align()
        hdr = w.getvalue()
        frame = bytearray(hdr)
        frame.append(_crc8(hdr))
        w2 = _BitWriter()
        side_idx = {8: 1, 10: 1, 9: 0}.get(mode, -1)
        # the LAST frame may be short: clamp the partition order to one
        # that divides its block size (order 0 always qualifies)
        po = partition_order
        while po and bs % (1 << po):
            po -= 1
        for ch, sig in enumerate(subs):
            ch_bps = bps + (1 if ch == side_idx else 0)
            _encode_subframe(
                w2, sig, ch_bps,
                lpc_order=lpc_order, partition_order=po, force=force,
            )
        w2.align()
        frame.extend(w2.getvalue())
        frame.extend(struct.pack(">H", _crc16(bytes(frame))))
        frames.extend(frame)

    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si.align()
    streaminfo = si.getvalue() + md5
    assert len(streaminfo) == 34
    return (
        b"fLaC"
        + bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
        + bytes(frames)
    )
