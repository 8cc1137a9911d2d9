"""Property-based quantization guarantees, driven by hypothesis over
adversarial float inputs (subnormals, ±0, huge magnitudes, repeated
values): the Arrow-batch kernels must be byte-identical to the
per-row kernels, and every decode must stay within the format's error
envelope. These are the invariants the SQL oracles lean on."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from coltt_spark.functions.quantization import (
    dequantize_batch,
    dequantize_np,
    quantize_batch,
    quantize_np,
)

_vals = st.one_of(
    st.floats(-1e4, 1e4, allow_nan=False, width=32),
    st.sampled_from(
        [0.0, -0.0, 1e-40, -1e-40, 448.0, 452.0, 460.0, 1e30, -1e30, 2.0**-24]
    ),
)

_vec = st.lists(_vals, min_size=8, max_size=64).map(
    lambda v: v[: len(v) - len(v) % 8]  # bq needs dim % 8 == 0
)


@settings(max_examples=200, deadline=None)
@given(vecs=st.lists(_vec, min_size=1, max_size=6))
def test_batch_kernels_match_per_row(vecs):
    for kind in ("f16", "bf16", "f8", "bq", "sq8"):
        enc = quantize_batch(kind, pd.Series(list(vecs) + [None]))
        assert enc[-1] is None
        for v, b in zip(vecs, enc):
            assert b == quantize_np(kind, v), (kind, v)
        dec = dequantize_batch(kind, pd.Series(enc))
        for v, d in zip(vecs, dec):
            assert np.array_equal(d, dequantize_np(kind, quantize_np(kind, v))), (
                kind,
                v,
            )


@settings(max_examples=200, deadline=None)
@given(vec=_vec.filter(lambda v: len(v) > 0))
def test_roundtrip_error_envelopes(vec):
    x = np.asarray(vec, dtype=np.float32)
    # f16: exact for |x| < 65504 up to 2^-11 relative; clamps beyond
    back = dequantize_np("f16", quantize_np("f16", x))
    fin = np.abs(x) < 65504
    assert np.allclose(back[fin], x[fin], rtol=2**-10, atol=1e-7)
    # sq8: absolute error ≤ scale/254 + representation slack
    back = dequantize_np("sq8", quantize_np("sq8", x))
    scale = float(np.max(np.abs(x)))
    assert np.all(np.abs(back - x) <= scale / 127.0 * 0.51 + 1e-6)
    # bq: decode is the ±1/√dim unit pattern with matching signs
    back = dequantize_np("bq", quantize_np("bq", x))
    assert np.allclose(np.abs(back), 1.0 / np.sqrt(x.size), atol=1e-7)
    assert np.all((back > 0) == (x > 0))
