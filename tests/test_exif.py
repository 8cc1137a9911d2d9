"""EXIF extraction (operators/exif.py): writer↔parser round-trips
over randomized fields and both byte orders, a HAND-ASSEMBLED golden
byte fixture (so the writer and parser cannot co-drift), corruption
totality under single-byte flips, and the GPS decimal fold."""

from __future__ import annotations

import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from coltt_spark.operators.exif import (
    build_exif_tiff,
    exif_app1,
    insert_app1,
    parse_exif,
)
from coltt_spark.operators.media_codecs import encode_jpeg

_BASE = encode_jpeg(np.full((8, 8, 3), 128, dtype=np.uint8))


def _jpeg_with(tiff: bytes) -> bytes:
    return insert_app1(_BASE, exif_app1(tiff))


def test_no_exif_jpeg(spark=None):
    out = parse_exif(_BASE)
    assert out["has_exif"] is False
    assert out["make"] is None and out["lat"] is None


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 100_000))
def test_round_trip_random_fields(seed):
    rng = np.random.default_rng(seed)
    bo = "<" if seed % 2 == 0 else ">"
    make = f"Make{rng.integers(0, 1000)}"
    model = None if seed % 5 == 0 else f"Model {rng.integers(0, 1000)}"
    orientation = int(rng.integers(1, 9))
    dt = f"20{rng.integers(10, 30):02d}:01:02 03:04:05"
    exposure = (1, int(rng.integers(1, 8000)))
    fnumber = (int(rng.integers(10, 220)), 10)
    iso = int(rng.integers(50, 26000))
    px, py = int(rng.integers(1, 10000)), int(rng.integers(1, 10000))
    gps = None
    if seed % 3 != 0:
        gps = (
            "NS"[seed % 2],
            (int(rng.integers(0, 90)), int(rng.integers(0, 60)), int(rng.integers(0, 60))),
            "EW"[(seed // 2) % 2],
            (int(rng.integers(0, 180)), int(rng.integers(0, 60)), int(rng.integers(0, 60))),
        )
    tiff = build_exif_tiff(
        byte_order=bo, make=make, model=model, orientation=orientation,
        datetime=dt, exposure=exposure, fnumber=fnumber, iso=iso,
        datetime_original=dt, pixel_x=px, pixel_y=py, gps=gps,
    )
    out = parse_exif(_jpeg_with(tiff))
    assert out["has_exif"] is True
    assert out["byte_order"] == ("II" if bo == "<" else "MM")
    assert out["make"] == make
    assert out["model"] == model
    assert out["orientation"] == orientation
    assert out["datetime"] == dt
    assert (out["exposure_num"], out["exposure_den"]) == exposure
    assert out["fnumber"] == fnumber[0] / fnumber[1]
    assert out["iso"] == iso
    assert out["exif_version"] == "0232"
    assert out["pixel_x"] == px and out["pixel_y"] == py
    if gps is None:
        assert out["lat"] is None and out["lon"] is None
    else:
        lat_sign = -1.0 if gps[0] == "S" else 1.0
        d, m, s = gps[1]
        assert out["lat"] == lat_sign * (d + m / 60.0 + s / 3600.0)
        lon_sign = -1.0 if gps[2] == "W" else 1.0
        d, m, s = gps[3]
        assert out["lon"] == lon_sign * (d + m / 60.0 + s / 3600.0)


def test_golden_hand_assembled_bytes():
    """A minimal EXIF TIFF assembled BY HAND from the spec (TIFF 6.0
    §2 layout, little-endian): IFD0 with Make (ASCII, oversize →
    offset), Orientation (SHORT, inline), and the Exif pointer to a
    sub-IFD holding ISO (SHORT, inline). If the writer and parser
    ever co-drift from the spec, this fixture catches it."""
    # layout: header(8) | IFD0: count(2) + 3*12 + next(4) = 42 → value
    # area at 50: "GoldenCam\0" (10 bytes) → Exif IFD at 60
    ifd0 = struct.pack("<H", 3)
    ifd0 += struct.pack("<HHII", 271, 2, 10, 50)          # Make @50
    ifd0 += struct.pack("<HHI", 274, 3, 1) + struct.pack("<HH", 6, 0)
    ifd0 += struct.pack("<HHII", 0x8769, 4, 1, 60)        # Exif IFD @60
    ifd0 += struct.pack("<I", 0)
    exif = struct.pack("<H", 1)
    exif += struct.pack("<HHI", 34855, 3, 1) + struct.pack("<HH", 320, 0)
    exif += struct.pack("<I", 0)
    tiff = b"II" + struct.pack("<HI", 42, 8) + ifd0 + b"GoldenCam\x00" + exif
    assert len(b"II" + struct.pack("<HI", 42, 8) + ifd0) == 50
    out = parse_exif(_jpeg_with(tiff))
    assert out["make"] == "GoldenCam"
    assert out["orientation"] == 6
    assert out["iso"] == 320
    assert out["model"] is None and out["lat"] is None


def test_offsets_are_tiff_relative_not_file_relative():
    """The classic EXIF bug: value offsets are relative to the TIFF
    header, which sits deep inside the JPEG. A parser that resolves
    them against the file start reads garbage — the Make string here
    would come out wrong, not error."""
    tiff = build_exif_tiff(
        byte_order=">", make="RelativityCam", orientation=1,
        exposure=(1, 30), fnumber=(40, 10),
    )
    # push the APP1 deeper into the file: an APP0/JFIF segment first
    jfif = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    payload = _BASE[:2] + jfif + exif_app1(tiff) + _BASE[2:]
    out = parse_exif(payload)
    assert out["make"] == "RelativityCam"
    assert out["exposure_den"] == 30


def test_header_leniency_fill_and_standalone_markers():
    """T.81-legal header noise must not abort the walk: 0xFF fill
    bytes before a marker (§B.1.1.2) and standalone length-less
    markers (TEM, RSTn) are skipped; genuine corruption (a stuffed
    FF 00 in the header, a non-FF marker byte) stays loud."""
    tiff = build_exif_tiff(make="M", orientation=3)
    app1 = exif_app1(tiff)
    noisy = (
        b"\xff\xd8"          # SOI
        + b"\xff\x01"        # standalone TEM
        + b"\xff\xd4"        # standalone RST4
        + b"\xff\xff"        # fill-byte run folding into APP1's FF E1
        + app1
        + _BASE[2:]
    )
    out = parse_exif(noisy)
    assert out["has_exif"] is True
    assert out["make"] == "M" and out["orientation"] == 3

    import pytest

    with pytest.raises(ValueError):
        parse_exif(b"\xff\xd8" + b"\xff\x00" + app1 + _BASE[2:])
    with pytest.raises(ValueError):
        parse_exif(b"\xff\xd8" + b"\x12\x34" + app1 + _BASE[2:])


def test_seam_tolerates_malformed_rows(spark):
    """One garbage payload in a batch yields has_exif=false for that
    row — it must not abort the whole mapInPandas task (real-crawl
    posture; parse_exif itself stays loud, pinned above)."""
    from pyspark.sql import functions as F, types as T

    from coltt_spark.operators.exif import exif_features

    good = _jpeg_with(build_exif_tiff(make="OK"))
    bad = b"\xff\xd8\x99garbage-not-a-marker"
    df = spark.createDataFrame(
        [(0, bytearray(good)), (1, bytearray(bad)), (2, bytearray(b"\x00"))],
        T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )
    rows = {r["doc_id"]: r for r in exif_features(df).collect()}
    assert rows[0]["has_exif"] is True and rows[0]["make"] == "OK"
    assert rows[1]["has_exif"] is False and rows[1]["make"] is None
    assert rows[2]["has_exif"] is False


@settings(max_examples=120, deadline=None)
@given(seed=st.integers(0, 1_000), pos_frac=st.floats(0.0, 1.0))
def test_exif_any_single_byte_flip_is_total(seed, pos_frac):
    """Corruption totality: a flipped byte anywhere in the payload
    either parses (possibly different metadata, possibly has_exif
    False) or raises ValueError — never IndexError/struct.error/
    decode crash from IFD pointer or type corruption."""
    gps = ("N", (10, 20, 30), "W", (40, 50, 59)) if seed % 2 else None
    tiff = build_exif_tiff(
        byte_order="<" if seed % 3 else ">", make=f"C{seed}", model="M",
        orientation=1 + seed % 8, datetime="2024:01:01 00:00:00",
        exposure=(1, 125), fnumber=(18, 10), iso=200,
        pixel_x=640, pixel_y=480, gps=gps,
    )
    payload = bytearray(_jpeg_with(tiff))
    pos = min(int(pos_frac * len(payload)), len(payload) - 1)
    payload[pos] ^= 0x5A
    try:
        out = parse_exif(bytes(payload))
        assert isinstance(out, dict)
    except ValueError:
        pass


def test_exif_features_seam(spark):
    """The Spark seam end-to-end on a tiny fabricated frame: fixture
    row classes (no-EXIF / byte orders / absent Model / GPS parity)
    land in the typed columns."""
    from pyspark.sql import functions as F

    from coltt_spark.operators.exif import exif_features
    from coltt_spark.operators.multimodal import exif_jpeg_table

    docs = spark.range(12).select(
        F.col("id").alias("doc_id"), F.lit("t").alias("text")
    )
    rows = {
        r["doc_id"]: r
        for r in exif_features(exif_jpeg_table(docs)).collect()
    }
    assert set(rows) == {0, 3, 6, 9}
    assert rows[3]["has_exif"] is False and rows[3]["make"] is None
    assert rows[0]["byte_order"] == "II" and rows[9]["byte_order"] == "MM"
    assert rows[6]["make"] == "Cam1"
    assert rows[9]["model"] is None  # 9 % 4 == 1 drops the Model tag
    assert rows[0]["lat"] == 0.0  # d=0: N (0 + 0/60 + 0/3600)
    # d=6: ref S, dms (6, 6, 6) → -(6 + 6/60 + 6/3600)
    assert rows[6]["lat"] == -(6 + 6 / 60.0 + 6 / 3600.0)
    assert rows[9]["lat"] is None  # 9 % 6 != 0: no GPS IFD


def test_apply_orientation_against_numpy_reference():
    """The 8 transforms against numpy's own rot90/flip compositions
    (an independent statement of TIFF 6.0 orientation semantics), on
    an asymmetric image so every wrong direction is visible."""
    import numpy as np

    from coltt_spark.operators.exif import apply_orientation

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(6, 10, 3), dtype=np.uint8)
    ref = {
        1: img,
        2: np.fliplr(img),
        3: np.rot90(img, 2),
        4: np.flipud(img),
        5: np.rot90(np.fliplr(img), 1),   # transpose
        6: np.rot90(img, -1),             # 90 clockwise
        7: np.rot90(np.fliplr(img), -1),  # anti-transpose
        8: np.rot90(img, 1),              # 90 counter-clockwise
    }
    for o, want in ref.items():
        got = apply_orientation(img, o)
        assert got.shape == want.shape, o
        assert np.array_equal(got, want), o
    # out-of-range / default values are identity
    for o in (0, 9, -1):
        assert np.array_equal(apply_orientation(img, o), img)


def test_oriented_stats_seam(spark):
    """oriented_image_stats end-to-end on the fabricated fixture:
    orientation 5-8 rows swap geometry, sums are invariant vs the
    unoriented stats, and no-EXIF rows default to orientation 1."""
    from pyspark.sql import functions as F

    from coltt_spark.operators.exif import oriented_image_stats
    from coltt_spark.operators.multimodal import exif_oriented_jpeg_table

    docs = spark.range(30).select(
        F.col("id").alias("doc_id"), F.lit("txt").alias("text")
    )
    rows = {
        r["doc_id"]: r
        for r in oriented_image_stats(exif_oriented_jpeg_table(docs)).collect()
    }
    assert set(rows) == {0, 3, 6, 9, 12, 15, 18, 21, 24, 27}
    for d, r in rows.items():
        want_o = 1 if d % 9 == 3 else 1 + d % 8
        assert r["orientation"] == want_o, d
        if want_o >= 5:
            assert (r["width"], r["height"]) == (16, 24), d
        else:
            assert (r["width"], r["height"]) == (24, 16), d


def test_mistyped_tags_degrade_not_abort(spark):
    """ADVICE r7: a tag stored with the WRONG TIFF type raises
    TypeError, not ValueError — e.g. Orientation stored RATIONAL
    decodes to a tuple (int() on it must degrade to 1, and the
    exif_features row must not poison the Arrow conversion), and
    ExposureTime stored SHORT makes the (num, den) unpack fail. Both
    seams must degrade per-row instead of aborting the task."""
    import struct as _s

    from pyspark.sql import types as T

    from coltt_spark.operators.exif import (
        TAG_EXIF_IFD,
        TAG_EXPOSURE_TIME,
        TAG_ORIENTATION,
        _ifd_bytes,
        _ifd_size,
        exif_features,
        oriented_image_stats,
    )

    head = b"II" + _s.pack("<HI", 42, 8)
    # Orientation as RATIONAL (type 5) → parse yields a tuple
    bad_orient = head + _ifd_bytes([(TAG_ORIENTATION, 5, [(6, 1)])], "<", 8)
    # ExposureTime as SHORT (type 3) → (num, den) unpack TypeErrors
    ifd0 = [(TAG_EXIF_IFD, 4, [0])]
    exif_off = 8 + _ifd_size(ifd0, "<")
    ifd0 = [(TAG_EXIF_IFD, 4, [exif_off])]
    exifd = [(TAG_EXPOSURE_TIME, 3, [125])]
    bad_exp = head + _ifd_bytes(ifd0, "<", 8) + _ifd_bytes(exifd, "<", exif_off)

    df = spark.createDataFrame(
        [
            (0, bytearray(_jpeg_with(bad_orient))),
            (1, bytearray(_jpeg_with(bad_exp))),
        ],
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )
    rows = {r["doc_id"]: r for r in exif_features(df).collect()}
    # tuple orientation is coerced out of the LONG column; the rest
    # of the row survives
    assert rows[0]["has_exif"] is True and rows[0]["orientation"] is None
    # TypeError inside parse_exif → the documented empty-row degrade
    assert rows[1]["has_exif"] is False
    srows = {r["doc_id"]: r for r in oriented_image_stats(df).collect()}
    assert srows[0]["orientation"] == 1 and srows[1]["orientation"] == 1
    assert srows[0]["width"] == 8 and srows[0]["height"] == 8
