"""Quantization precision + quantized-collection search + CFLAT
multi-vector collections (compresshelper_test.go / F1 quantization
matrix / F4 shapes)."""

from __future__ import annotations

import numpy as np
import pytest

from coltt_spark.catalog import Catalog
from coltt_spark.functions.quantization import dequantize_np, quantize_np
from coltt_spark.schema import IndexField

rng = np.random.default_rng(42)


@pytest.mark.parametrize(
    "kind,rtol",
    [("f16", 1e-3), ("bf16", 8e-3), ("f8", 7e-2), ("sq8", 2e-2)],
)
def test_roundtrip_precision(kind, rtol):
    x = rng.normal(0, 1, 4096).astype(np.float32)
    back = dequantize_np(kind, quantize_np(kind, x))
    assert back.dtype == np.float32
    assert np.allclose(back, x, rtol=rtol, atol=rtol)


def test_f16_matches_numpy_half():
    x = rng.normal(0, 3, 1024).astype(np.float32)
    back = dequantize_np("f16", quantize_np("f16", x))
    assert np.array_equal(back, x.astype(np.float16).astype(np.float32))


def test_bf16_is_truncation_of_f32():
    x = rng.normal(0, 1, 1024).astype(np.float32)
    back = dequantize_np("bf16", quantize_np("bf16", x))
    # bf16 keeps ~8 mantissa bits: relative error < 2^-8
    err = np.abs(back - x) / np.maximum(np.abs(x), 1e-30)
    assert err.max() < 2**-8


def test_f8_e4m3_properties():
    # exact values representable in E4M3 round-trip exactly
    exact = np.array([0.0, 1.0, -1.0, 0.5, 2.0, 448.0, -448.0, 0.015625], dtype=np.float32)
    assert np.array_equal(dequantize_np("f8", quantize_np("f8", exact)), exact)
    # overflow clamps to max finite 448 (E4M3FN has no inf)
    big = np.array([1e9, -1e9], dtype=np.float32)
    assert np.array_equal(dequantize_np("f8", quantize_np("f8", big)), [448.0, -448.0])
    # storage is 1 byte per element
    assert len(quantize_np("f8", exact)) == len(exact)
    assert len(quantize_np("f16", exact)) == 2 * len(exact)


def test_sq8_roundtrip_and_format():
    x = rng.normal(0, 2, 256).astype(np.float32)
    raw = quantize_np("sq8", x)
    assert len(raw) == 4 + 256  # float32 scale header + 1 byte/element
    scale = np.frombuffer(raw[:4], dtype=np.float32)[0]
    assert scale == np.max(np.abs(x))
    back = dequantize_np("sq8", raw)
    assert back.dtype == np.float32
    assert np.max(np.abs(back - x)) <= scale / 127.0 * 0.501
    zeros = np.zeros(16, dtype=np.float32)
    assert np.array_equal(dequantize_np("sq8", quantize_np("sq8", zeros)), zeros)


def test_bq_roundtrip_signs():
    """BQ keeps exactly the strict x>0 sign bits at 1 bit/element and
    decodes to the ±1/√dim unit pattern."""
    x = rng.normal(0, 1, 256).astype(np.float32)
    x[7] = 0.0  # zero maps to the negative bit (strict > 0)
    raw = quantize_np("bq", x)
    assert len(raw) == 32  # 256 bits
    back = dequantize_np("bq", raw)
    assert back.dtype == np.float32
    assert np.allclose(np.abs(back), 1.0 / 16.0)
    assert ((back > 0) == (x > 0)).all()
    assert abs(float(np.linalg.norm(back.astype(np.float64))) - 1.0) < 1e-6
    with pytest.raises(ValueError):
        quantize_np("bq", np.ones(13, dtype=np.float32))


@pytest.mark.parametrize("kind", ["f16", "bf16", "f8", "bq", "sq8"])
def test_quantized_collection_search(spark, tmp_path, kind):
    """F1 quantization matrix: search over a quantized collection
    ranks (near-)identically to the unquantized collection."""
    cat = Catalog(spark, str(tmp_path / f"wh_{kind}"))
    fields = [IndexField("id", "string", primary_key=True), IndexField("g", "integer")]
    rows = [
        {"id": f"r{i}", "g": i % 5, "vector": rng.normal(0, 1, 16).astype(float).tolist()}
        for i in range(300)
    ]
    plain = cat.create_collection("plain", dim=16, distance="cosine", fields=fields)
    quant = cat.create_collection(kind, dim=16, distance="cosine", quantization=kind, fields=fields)
    plain.upsert(rows)
    quant.upsert(rows)

    q = rng.normal(0, 1, 16).astype(float).tolist()
    exact = [r["id"] for r in plain.search(q, limit=10).collect()]
    approx = [r["id"] for r in quant.search(q, limit=10).collect()]
    overlap = len(set(exact) & set(approx)) / 10  # recall@10 utility shape
    # bq keeps 1 bit/element — at dim 16 the ranking is a coarse sign
    # sketch, so only a loose floor holds; the exact decode/rank
    # semantics are value-pinned by the knn_bq oracle instead
    min_overlap = {"f16": 1.0, "bf16": 0.9, "f8": 0.6, "bq": 0.1, "sq8": 0.6}[kind]
    assert overlap >= min_overlap, f"{kind}: recall@10 {overlap}"
    # quantized storage survives flush → reload
    quant.flush()
    fresh = Catalog(spark, str(tmp_path / f"wh_{kind}")).get_collection(kind)
    assert [r["id"] for r in fresh.search(q, limit=10).collect()] == approx


def test_multi_vector_collection(spark, tmp_path):
    """F4 match_profiles: two named vector fields, weighted fusion."""
    cat = Catalog(spark, str(tmp_path / "wh_mv"))
    fields = [
        IndexField("id", "string", primary_key=True),
        IndexField("group_name", "string"),
        IndexField("personality_vec", "vector"),
        IndexField("ideal_type_vec", "vector"),
    ]
    coll = cat.create_collection("profiles", dim=8, distance="cosine", fields=fields)
    rows = [
        {
            "id": f"p{i}",
            "group_name": "ABCDE"[i % 5],
            "personality_vec": rng.normal(0, 1, 8).astype(float).tolist(),
            "ideal_type_vec": rng.normal(0, 1, 8).astype(float).tolist(),
        }
        for i in range(200)
    ]
    coll.upsert(rows)
    qp = rng.normal(0, 1, 8).astype(float).tolist()
    qi = rng.normal(0, 1, 8).astype(float).tolist()

    res = coll.multi_search(
        {
            "personality_vec": {"query": qp, "ratio": 70, "include": True},
            "ideal_type_vec": {"query": qi, "ratio": 30, "include": True},
        },
        limit=10,
    ).collect()
    assert len(res) == 10
    scores = [r["score"] for r in res]
    assert scores == sorted(scores, reverse=True)

    # single-field include with ratio 100; per-field search needs a name
    only = coll.multi_search(
        {
            "personality_vec": {"query": qp, "ratio": 100, "include": True},
            "ideal_type_vec": {"query": qi, "ratio": 50, "include": False},
        },
        limit=5,
    ).collect()
    named = coll.search(qp, vector_field="personality_vec", limit=5).collect()
    assert [r["id"] for r in only] == [r["id"] for r in named]

    with pytest.raises(ValueError):
        coll.multi_search({"personality_vec": {"query": qp, "ratio": 60, "include": True}})
    with pytest.raises(ValueError):
        coll.multi_search({"bogus": {"query": qp, "ratio": 100, "include": True}})
    with pytest.raises(ValueError):
        coll.search(qp)  # ambiguous: two vector fields, no name given


def test_sql_dequantizer_bit_exact_vs_numpy():
    """The registry's SQL quantize→dequantize emulation must stay
    bit-for-bit identical to the numpy kernels for every format —
    this is what makes the quantized-KNN oracles exact. Property
    test over adversarial values: normals, per-format subnormals,
    rounding ties (half-even and half-up boundaries), and the E4M3FN
    448 clamp."""
    import duckdb
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from coltt_spark.functions.quantization import dequantize_np, quantize_np
    from coltt_spark.registry import _sql_dequantized

    con = duckdb.connect()

    def check(vals: np.ndarray):
        for kind in ("f16", "bf16", "f8"):
            ref = dequantize_np(kind, quantize_np(kind, vals)).astype(np.float64)
            got = np.array(
                con.execute(
                    f"SELECT {_sql_dequantized(kind, '?::DOUBLE[]')} AS v",
                    [vals.astype(np.float64).tolist()],
                ).fetchone()[0]
            )
            assert (ref == got).all(), (
                kind,
                vals[np.nonzero(ref != got)][:3],
            )

    # deterministic adversarial battery
    check(np.array([
        0.0, 1.0, -1.0, 0.5, -0.5, 2**-14, 2**-15, 2**-24, 2**-6, 2**-7,
        447.9, 448.0, 448.1, 500.0, 0.4999999, 0.50000006, 1.0009765625,
        -1.0009765625, 2.0, 65504.0 / 65536,
    ]).astype(np.float32))

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.floats(
                min_value=-500.0, max_value=500.0,
                allow_nan=False, allow_infinity=False, width=32,
            ),
            min_size=1, max_size=64,
        )
    )
    def prop(xs):
        check(np.asarray(xs, dtype=np.float32))

    prop()


def test_quantized_blocks_layout_matches_rows(spark, tmp_path):
    """quantization × layout matrix: a quantized blocks collection
    must serve the same results as a quantized rows twin (the index
    packs DEQUANTIZED vectors, so the stored-precision contract is
    identical on both paths)."""
    import random

    rng = random.Random(77)
    fields = [IndexField("id", "string", primary_key=True)]
    rows = [
        {"id": f"r{i}", "vector": [rng.gauss(0, 1) for _ in range(16)]}
        for i in range(200)
    ]
    q = [rng.gauss(0, 1) for _ in range(16)]
    for kind in ("f16", "sq8", "bq"):
        cat = Catalog(spark, str(tmp_path / f"wh_{kind}"))
        blk = cat.create_collection(
            f"b_{kind}", dim=16, distance="cosine", fields=fields,
            layout="blocks", block_dtype="float64", quantization=kind,
        )
        ivf = cat.create_collection(
            f"i_{kind}", dim=16, distance="cosine", fields=fields,
            layout="ivf", ivf_centroids=4, ivf_nprobe=4, quantization=kind,
            block_dtype="float64",
        )
        twin = cat.create_collection(
            f"r_{kind}", dim=16, distance="cosine", fields=fields,
            quantization=kind,
        )
        for c in (blk, ivf, twin):
            c.upsert(rows)
        blk.flush()
        ivf.flush()
        b = [(r["id"], round(r["dist"], 6)) for r in twin.search(q, limit=12).collect()]
        a = [(r["id"], round(r["dist"], 6)) for r in blk.search(q, limit=12).collect()]
        assert a == b, ("blocks", kind)
        # all partitions probed → ivf is exact and must match too
        c = [(r["id"], round(r["dist"], 6)) for r in ivf.search(q, limit=12).collect()]
        assert c == b, ("ivf", kind)


def test_multi_vector_collection_quantized(spark, tmp_path):
    """CFLAT multi-vector collections quantize each vector field
    independently; fused search stays consistent with the float twin
    to quantization precision."""
    fields = [
        IndexField("id", "string", primary_key=True),
        IndexField("title_vec", "vector"),
        IndexField("body_vec", "vector"),
    ]
    rows = [
        {
            "id": f"d{i}",
            "title_vec": rng.normal(0, 1, 8).astype(float).tolist(),
            "body_vec": rng.normal(0, 1, 8).astype(float).tolist(),
        }
        for i in range(120)
    ]
    qt = rng.normal(0, 1, 8).astype(float).tolist()
    qb = rng.normal(0, 1, 8).astype(float).tolist()
    spec = {
        "title_vec": {"query": qt, "ratio": 60, "include": True},
        "body_vec": {"query": qb, "ratio": 40, "include": True},
    }
    got = {}
    for kind in ("none", "f16"):
        cat = Catalog(spark, str(tmp_path / f"mvq_{kind}"))
        coll = cat.create_collection(
            f"mv_{kind}", dim=8, distance="cosine", fields=fields,
            quantization=kind,
        )
        coll.upsert(rows)
        got[kind] = [
            (r["id"], r["score"]) for r in coll.multi_search(spec, limit=10).collect()
        ]
    ids_none = [x[0] for x in got["none"]]
    ids_f16 = [x[0] for x in got["f16"]]
    # f16 round-trip is ~1e-3 relative: rankings agree on this data
    assert ids_none == ids_f16
    for (_, s0), (_, s1) in zip(got["none"], got["f16"]):
        assert abs(s0 - s1) < 0.1
