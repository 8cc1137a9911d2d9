"""Local mirror of the driver's DuckDB correctness gate.

Runs a registry query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and
order-insensitive values. Used by the test suite so regressions are
caught before the driver's per-round CORRECTNESS check.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
from typing import Any

import duckdb
import numpy as np
from pyspark.sql import DataFrame, SparkSession

from coltt_spark.sources.tables import TABLE_NAMES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def _canon(value: Any) -> Any:
    """Canonicalize a cell for order-insensitive comparison.

    Type-strict: an int and a float with equal value canonicalize to
    DIFFERENT tokens. The driver's gate hashes typed values, so a
    DuckDB HUGEINT fetched as float64 (99111.0) must NOT locally
    equal Spark's int64 (99111) — Python's `99111 == 99111.0` hid
    exactly that mismatch in round 1 (`events_json`).
    """
    if value is None:
        return ("n",)
    if isinstance(value, (bool, np.bool_)):
        return ("b", bool(value))
    if isinstance(value, (float, np.floating)):
        if math.isnan(value):
            return ("f", "NaN")
        # collapse -0.0 / 1e-13 noise left after upstream round(…, 4)
        return ("f", round(float(value), 6) + 0.0)
    if isinstance(value, (int, np.integer)):
        return ("i", int(value))
    # tag temporals/decimals so repr-sorted rows align between Spark's
    # datetime.datetime and pandas' Timestamp (whose reprs sort
    # differently) — both canonicalize to the same ISO string
    if isinstance(value, datetime.datetime):
        return ("t", value.isoformat())
    if isinstance(value, datetime.date):
        return ("d", value.isoformat())
    if isinstance(value, decimal.Decimal):
        return ("D", str(value))
    if isinstance(value, (list, tuple, np.ndarray)):
        return tuple(_canon(v) for v in value)
    return value


def compare(spark_df: DataFrame, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    sp_cols = sorted(spark_df.columns)
    sp_rows = sorted(
        (tuple(_canon(row[c]) for c in sp_cols) for row in spark_df.collect()),
        key=repr,
    )
    # Fetch through pandas, NOT fetchall(): the driver's gate fetches via
    # pandas/arrow, where a DuckDB HUGEINT (e.g. sum(BIGINT)) lands as
    # float64 — fetchall() would hand back a Python int and hide the
    # type mismatch the driver sees (round-1 `events_json`).
    dk_df = con.execute(sql).df()
    dk_cols_raw = list(dk_df.columns)
    dk_cols = sorted(dk_cols_raw)
    idx = [dk_cols_raw.index(c) for c in dk_cols]
    dk_rows = sorted(
        (
            tuple(_canon(r[i]) for i in idx)
            for r in dk_df.itertuples(index=False, name=None)
        ),
        key=repr,
    )
    if sp_cols != dk_cols:
        return False, f"columns differ: spark={sp_cols} duckdb={dk_cols}"
    if len(sp_rows) != len(dk_rows):
        return False, f"row count differs: spark={len(sp_rows)} duckdb={len(dk_rows)}"
    for i, (a, b) in enumerate(zip(sp_rows, dk_rows)):
        if a != b:
            return False, f"row {i} differs:\n  spark ={a}\n  duckdb={b}"
    return True, "ok"


def check_query(
    spark: SparkSession, sf_dir: str, name: str
) -> tuple[bool, str]:
    from coltt_spark.registry import ORACLES, QUERIES

    df = QUERIES[name](spark, sf_dir)
    if name not in ORACLES:
        n = df.count()
        return n >= 0, f"rows-only check: {n} rows"
    sql = ORACLES[name]
    if callable(sql):
        # lazy oracle: the SQL inlines constants derived from the gate
        # data (e.g. the OPQ rotation — registry._opq_collection_constants)
        sql = sql(sf_dir)
    con = duckdb_conn(sf_dir)
    try:
        return compare(df, con, sql)
    finally:
        con.close()
