"""r13-opt seams: SQL-text-parsed expressions must equal their
Column-built twins BIT-EXACTLY.

The optimization round replaced per-operator py4j construction with
single-parse ``F.expr`` fragments in the hot constructors
(lit_double_array, sign_block/sign_bands, the simhash packs, the
minhash aggregates, registrable_domain_expr). Values are pinned
against the (still-present) Column forms so any future drift in the
SQL rendering — float formatting, escaping, precedence — fails
loudly here instead of surfacing as an oracle mismatch.
"""

from __future__ import annotations

import struct

from pyspark.sql import functions as F


def _bits(x: float) -> bytes:
    return struct.pack("<d", float(x))


def test_lit_double_array_bit_exact(spark):
    from coltt_spark.functions.vector import lit_double_array

    vals = [0.1, -0.0, 1e-300, 1.5e17, 123456789.123456789, 3.3e-5,
            -7.25, 2.0 ** -1074, 0.30000000000000004]
    per_element = F.array(*[F.lit(float(x)) for x in vals])
    row = spark.range(1).select(
        lit_double_array(vals).alias("a"), per_element.alias("b")
    ).first()
    assert [_bits(x) for x in row["a"]] == [_bits(x) for x in row["b"]]


def test_lit_long_array_min_long(spark):
    from coltt_spark.functions.vector import lit_long_array
    from coltt_spark.operators.pq import _pow2_long

    vals = [_pow2_long(i) for i in (0, 1, 31, 62, 63)]
    row = spark.range(1).select(lit_long_array(vals).alias("a")).first()
    assert list(row["a"]) == vals  # incl. the bit-63 wrap to Long.MIN


def test_sign_bands_expr_equals_column_path(spark):
    import pytest

    from coltt_spark.operators.dedup import sign_bands

    emb = spark.createDataFrame(
        [(i, [((i * 7 + j) % 5) - 2.0 for j in range(64)]) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    got = emb.select(
        sign_bands("embedding", bands=4, band_bits=16).alias("s"),  # expr path
        sign_bands(F.col("embedding"), bands=4, band_bits=16).alias("c"),  # Column path
    ).collect()
    for r in got:
        assert list(r["s"]) == list(r["c"])
    # under ANSI (the Spark 4 default) an out-of-range component fails
    # loudly in BOTH construction paths — parity of the failure mode
    short = spark.createDataFrame(
        [(0, [1.0] * 40)], "vec_id long, embedding array<double>"
    )
    for col in (
        sign_bands("embedding", bands=4, band_bits=16),
        sign_bands(F.col("embedding"), bands=4, band_bits=16),
    ):
        with pytest.raises(Exception, match="INVALID_ARRAY_INDEX"):
            short.select(col.alias("k")).collect()


def test_minhash_agg_exprs_match_column_form(spark):
    from coltt_spark.functions.text import HASH_P, MINHASH_PARAMS, minhash_term
    from coltt_spark.operators.dedup import _minhash_agg_exprs

    sh = spark.createDataFrame(
        [(i % 7, (i * 982_451_653 + 11) % (1 << 60)) for i in range(500)],
        "id long, sh long",
    )
    new = sh.groupBy("id").agg(*_minhash_agg_exprs())
    old = sh.groupBy("id").agg(
        *[
            F.min(minhash_term(F.col("sh"), a, b)).alias(f"mh{i}")
            for i, (a, b) in enumerate(MINHASH_PARAMS)
        ]
    )
    assert sorted(map(tuple, new.collect())) == sorted(map(tuple, old.collect()))
    assert HASH_P == 2_147_483_647  # the SQL text inlines this constant


def test_registrable_domain_expr_equals_column_form(spark):
    from coltt_spark.functions.urls import registrable_domain, registrable_domain_expr

    hosts = ["", "a", "a.b", "a..b", "a.b.", ".b", "www.ck", "x.www.ck",
             "foo.ck", "a.foo.ck", "github.io", "u.github.io",
             "deep.k12.ca.us", "a.deep.k12.ca.us", "localhost", "b.a.np",
             "c.b.a.np", "s3.amazonaws.com", "b.s3.amazonaws.com",
             "example.com.", ".example.com", "news.portal.com.fj",
             "xn--55qx5d.cn", "a.xn--55qx5d.cn"]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    rows = df.select(
        "host",
        registrable_domain_expr("host").alias("e"),
        registrable_domain(F.col("host")).alias("c"),
    ).collect()
    for r in rows:
        assert r["e"] == r["c"], r["host"]
