"""Parquet table sources for the driver-generated test data.

Tables (TPC-H-ish star schema + ``events`` stream table + ``documents``
/ ``embeddings`` pipeline tables) live one-parquet-per-table under an
``sf`` directory. Reads are plain ``spark.read.parquet`` so Catalyst
predicate pushdown / column pruning / partition pruning all apply.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: columns written as parquet TIMESTAMP(NANOS) — Spark has no nanosecond
#: timestamp type, so they're read as raw int64 (nanosAsLong) and
#: converted to microsecond timestamps here (same truncation DuckDB
#: applies when it reads the file).
_NANO_TS_COLS = {
    "events": ("ts",),
    "lineitem": ("l_shipdate",),
    "orders": ("o_orderdate",),
}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


#: (sf_dir, name) → resolved DataFrame — the catalog role: a real
#: deployment registers a table once and reuses the resolved relation;
#: re-running ``spark.read.parquet`` per query re-read footers and
#: re-inferred the schema every time (~0.1 s × ~700 calls per bench
#: pass, r13-opt). The cached object is a LAZY plan — every action
#: still scans the parquet files, so no results are ever cached.
#: PER-PROCESS ASSUMPTION (ADVICE r13): the parquet files under an
#: sf_dir are immutable for the life of the process — the driver
#: regenerates testdata only BETWEEN rounds (fresh process), and the
#: resolved schema/footers would go stale if a file were rewritten
#: mid-process. A test that rewrites table files must call
#: :func:`clear_table_cache` after doing so.
_TABLE_CACHE: dict[tuple[str, str], DataFrame] = {}


def clear_table_cache(sf_dir: str | None = None) -> None:
    """Drop cached relations (all, or one sf_dir's) so the next
    ``load_table`` re-reads footers/schema from disk. For tests that
    regenerate parquet files mid-process."""
    if sf_dir is None:
        _TABLE_CACHE.clear()
        return
    for key in [k for k in _TABLE_CACHE if k[0] == sf_dir]:
        del _TABLE_CACHE[key]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table. ``name`` must be in :data:`TABLE_NAMES`."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    key = (sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None and cached.sparkSession is spark:
        return cached
    if name in _NANO_TS_COLS:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in _NANO_TS_COLS.get(name, ()):
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    _TABLE_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for ``spark.sql`` use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def ensure_parallelism(df: DataFrame, *keys: str) -> DataFrame:
    """Spread a narrow input across the cluster before per-row-heavy
    work (shingling, hashing, UDF batches).

    Small parquet files scan as ONE split (files.maxPartitionBytes),
    so everything downstream of the scan runs on one core; at real
    scale the input already has thousands of splits and this is a
    no-op — the guard only repartitions when the scan has fewer
    splits than the session's parallelism, so it never adds a shuffle
    of a large input."""
    target = df.sparkSession.sparkContext.defaultParallelism
    # the ``.rdd`` probe replans the DataFrame every call (~50 ms);
    # memoize it on the (immutable, now catalog-cached) object so
    # repeated queries over the same table skip the replan (r13-opt)
    nparts = getattr(df, "_coltt_nparts", None)
    if nparts is None:
        nparts = df.rdd.getNumPartitions()
        try:
            df._coltt_nparts = nparts
        except AttributeError:
            pass
    if nparts >= target:
        return df
    return df.repartition(target, *keys) if keys else df.repartition(target)
