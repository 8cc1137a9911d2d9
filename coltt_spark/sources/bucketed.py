"""Bucketed table layout — shuffle-free co-located joins.

The reference serves every query from one node, so join locality is
free; on a cluster the equivalent property must be DESIGNED: two fact
tables joined on the same key should be hash-CO-LOCATED on disk so
the join (and any aggregation keyed by the same column) runs with
ZERO shuffle. Spark's native mechanism is bucketing
(``DataFrameWriter.bucketBy``): each table is written pre-hashed into
``n_buckets`` files per partition using the same Murmur3 bucket hash
the planner assumes at read time, so a SortMergeJoin of two tables
bucketed on the join key by the same bucket count satisfies both
children's required distribution and the Exchange nodes vanish from
the plan (pinned in tests/test_plans.py).

This is the 100 TB story for the repeated fact-fact joins a training
pipeline runs daily (orders ⋈ lineitem here; (doc ⋈ annotations) or
(url ⋈ fetch-log) in a crawl pipeline): pay the partitioning shuffle
ONCE at ingest, then every downstream join/groupBy on that key is
map-side. At 1000 executors the bucket count is sized to the target
partition size (~n_rows·row_bytes / 256 MB), not to the executor
count — bucket files are split-read by many tasks only when a bucket
is a single file, so keep buckets ≥ executor parallelism.

Design notes for scale:

- ``co_located_join`` pins the MERGE strategy via a join hint: a
  fact-fact join must never broadcast (either side may be tens of
  TB), and pinning SMJ makes the bucket co-location actually carry
  the plan instead of an AQE-chosen broadcast at toy scale.
- The writer repartitions by the bucket column into ``n_buckets``
  first: repartition's HashPartitioning and the bucket spec use the
  same Murmur3-pmod layout, so each task holds exactly one bucket's
  rows and writes ONE file per bucket — the layout Spark needs to
  also elide the per-bucket Sort when ``sort=True``.
- Tables are registered EXTERNAL (explicit ``path``) under a
  process-lifetime scratch dir: the session catalog only holds
  metadata; dropping or losing the session never orphans data files.

Reference parity: the reference's single-node diskv layout
(diskv/diskv.go) co-locates by construction; this module is the
distributed restatement of that property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coltt_spark.tmpdirs import scratch_dir

__all__ = ["write_bucketed", "read_bucketed", "co_located_join"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Write ``df`` as an external parquet table bucketed (and
    per-bucket sorted) on ``bucket_col``.

    Overwrites both catalog entry and files if the table exists. The
    pre-write ``repartition(n_buckets, bucket_col)`` aligns task
    boundaries with bucket boundaries (same Murmur3-pmod hash), so
    the layout lands as one file per bucket.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    path = scratch_dir(prefix=f"coltt_bucketed_{table}_")
    writer = (
        df.repartition(n_buckets, F.col(bucket_col))
        .write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back through the catalog (the bucket
    metadata lives there — reading the parquet path directly would
    silently drop the co-location property)."""
    return spark.table(table)


def co_located_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on the join keys with the same bucket
    count — zero-Exchange by construction.

    The ``merge`` hint pins SortMergeJoin: broadcast is wrong for
    fact-fact joins at any real scale, and at toy scale AQE would
    otherwise pick it and mask the co-location this module exists to
    provide. With both children reporting HashPartitioning from their
    bucket specs, the SMJ's required distribution is already
    satisfied and no Exchange is planned (tests/test_plans.py pins
    this shape).
    """
    return left.hint("merge").join(
        right, left[left_on] == right[right_on], how
    )
