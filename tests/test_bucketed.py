"""Bucketed table layout (sources/bucketed.py): the write/read
round-trip preserves rows exactly, lands one file per bucket (the
layout that lets Spark elide both Exchange and, with single-file
buckets, exploit the per-bucket sort), and the co-located join
returns exactly what a plain join returns — the layout is a pure
performance property, never a semantics change."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from coltt_spark.sources.bucketed import (
    co_located_join,
    read_bucketed,
    write_bucketed,
)
from coltt_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def test_bucketed_roundtrip_preserves_rows_one_file_per_bucket(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    write_bucketed(orders, "t_bucket_rt", "o_orderkey", 8)
    back = read_bucketed(spark, "t_bucket_rt")
    # exact multiset equality via full-row anti-joins both ways
    assert back.count() == orders.count()
    assert back.exceptAll(orders).count() == 0
    assert orders.exceptAll(back).count() == 0
    # the pre-write repartition aligns task and bucket hashing:
    # exactly one data file per bucket
    loc = (
        spark.sql("DESCRIBE TABLE EXTENDED t_bucket_rt")
        .filter(F.col("col_name") == "Location")
        .first()["data_type"]
    )
    path = loc.removeprefix("file:")
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == 8, files
    spark.sql("DROP TABLE t_bucket_rt")


def test_co_located_join_matches_plain_join(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    write_bucketed(orders, "t_bucket_o", "o_orderkey", 8)
    write_bucketed(lineitem, "t_bucket_l", "l_orderkey", 8)
    bo, bl = read_bucketed(spark, "t_bucket_o"), read_bucketed(spark, "t_bucket_l")
    got = (
        co_located_join(bo, bl, "o_orderkey", "l_orderkey")
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"), F.sum("l_partkey").alias("s"))
    )
    want = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"), F.sum("l_partkey").alias("s"))
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    spark.sql("DROP TABLE t_bucket_o")
    spark.sql("DROP TABLE t_bucket_l")
