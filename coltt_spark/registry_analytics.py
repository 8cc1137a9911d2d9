"""Analytics section of the query registry (joins / aggregations /
windows / rollup / set ops / JSON / sessionization)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coltt_spark.operators import analytics as A
from coltt_spark.sources.tables import load_table


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return A.pricing_summary(load_table(spark, sf_dir, "lineitem"))


_ORACLE_PRICING = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return A.top_revenue_orders(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


_ORACLE_TOP_REVENUE = """
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return A.region_revenue(
        load_table(spark, sf_dir, "region"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


_ORACLE_REGION_REVENUE = """
SELECT r_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_window_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return A.top_orders_per_customer(load_table(spark, sf_dir, "orders"))


_ORACLE_WINDOW_TOP = """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rank AS BIGINT) AS rank FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM orders
) WHERE rank <= 3
"""


def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return A.rollup_revenue(load_table(spark, sf_dir, "lineitem"))


_ORACLE_ROLLUP = """
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       round(sum(l_extendedprice), 2) AS sum_price,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""



def q_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return A.cube_revenue(load_table(spark, sf_dir, "lineitem"))


_ORACLE_CUBE = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       round(sum(l_extendedprice), 2) AS sum_price,
       count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return A.price_percentiles(load_table(spark, sf_dir, "lineitem"))


_ORACLE_PERCENTILES = """
SELECT l_returnflag,
       count(*) AS n,
       round(min(l_extendedprice), 2) AS min_price,
       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
       round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
       round(max(l_extendedprice), 2) AS max_price
FROM lineitem
GROUP BY l_returnflag
"""


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return A.events_hourly(load_table(spark, sf_dir, "events"))


_ORACLE_EVENTS_HOURLY = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value,
       round(avg(value), 4) AS avg_value
FROM events
GROUP BY 1, 2
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return A.sessionize(load_table(spark, sf_dir, "events"))


_ORACLE_SESSIONIZE = """
WITH lagged AS (
  SELECT user_id, event_id, ts, value,
         epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END AS is_new
  FROM lagged
),
sess AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       count(*) AS n_events, round(sum(value), 2) AS total_value
FROM sess
GROUP BY user_id, session_id
"""


def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    return A.events_json_extract(load_table(spark, sf_dir, "events"))


_ORACLE_EVENTS_JSON = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
FROM events
GROUP BY event_type
"""


def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return A.purchasers_with_errors(load_table(spark, sf_dir, "events"))


_ORACLE_SET_INTERSECT = """
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'error'
"""


def q_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: every purchase matched to the user's most recent
    click at or before it (greatest ts ≤ purchase ts, ties to the
    greatest event_id) — the time-series join Spark lacks natively,
    built as union + one keyed shuffle + in-partition sort +
    last-non-null carry-forward. The oracle is DuckDB's LATERAL
    top-1 (deterministic, unlike raw ASOF JOIN under ts ties)."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    res = A.as_of_join(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "click"),
        on="user_id",
        ts_col="ts",
        tie_col="event_id",
        left_cols=["event_id", "ts", "value"],
        right_cols=["event_id", "ts"],
    )
    epoch_l = F.col("ts").cast("timestamp_ltz").cast("long")
    epoch_r = F.col("asof_ts").cast("timestamp_ltz").cast("long")
    # unmatched rows coalesce to sentinels (NULL int columns degrade
    # to NaN floats in the pandas fetch both engines are compared
    # through, so the sentinel keeps the column integer-typed)
    return res.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.round("value", 2).alias("purchase_value"),
        F.coalesce(F.col("asof_event_id"), F.lit(-1)).alias("click_event_id"),
        F.coalesce(
            F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss"), F.lit("-")
        ).alias("click_ts"),
        F.coalesce(epoch_l - epoch_r, F.lit(-1)).alias("lag_seconds"),
    )


_ORACLE_EVENTS_ASOF = """
SELECT l.user_id, l.event_id,
       strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       round(l.value, 2) AS purchase_value,
       COALESCE(r.event_id, -1) AS click_event_id,
       COALESCE(strftime(r.ts, '%Y-%m-%d %H:%M:%S'), '-') AS click_ts,
       COALESCE(CAST(floor(epoch(l.ts)) AS BIGINT) - CAST(floor(epoch(r.ts)) AS BIGINT), -1) AS lag_seconds
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
LEFT JOIN LATERAL (
  SELECT c.event_id, c.ts FROM events c
  WHERE c.event_type = 'click' AND c.user_id = l.user_id AND c.ts <= l.ts
  ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
) r ON true
"""


#: bucketed-table fixture: (sf_dir) -> (orders_table, lineitem_table)
_BUCKETED_CACHE: dict[str, tuple[str, str]] = {}


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Build-once external bucketed copies of orders/lineitem, both
    hashed into 16 buckets on the order key (the pay-the-shuffle-once
    ingest step). Rebuilds if a fresh session lost the catalog
    entries — the data files live under a scratch dir either way."""
    import hashlib

    from coltt_spark.sources.bucketed import read_bucketed, write_bucketed

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    names = (f"coltt_b_orders_{tag}", f"coltt_b_lineitem_{tag}")
    if _BUCKETED_CACHE.get(sf_dir) != names or not all(
        spark.catalog.tableExists(n) for n in names
    ):
        write_bucketed(
            load_table(spark, sf_dir, "orders"), names[0], "o_orderkey", 16
        )
        write_bucketed(
            load_table(spark, sf_dir, "lineitem"), names[1], "l_orderkey", 16
        )
        _BUCKETED_CACHE[sf_dir] = names
    return read_bucketed(spark, names[0]), read_bucketed(spark, names[1])


def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located fact-fact join — the bucketing story a
    100 TB deployment runs on: orders and lineitem are written ONCE as
    16-bucket tables hashed on the order key
    (:mod:`coltt_spark.sources.bucketed`), then the join AND the
    order-keyed aggregation both reuse the on-disk hash layout — the
    executed plan has SortMergeJoin with ZERO Exchange nodes (pinned
    in tests/test_plans.py::test_bucketed_join_has_no_exchange; the
    reference gets this locality for free on one node —
    diskv/diskv.go co-locates by construction — a cluster must design
    for it). The oracle runs the plain join/aggregate on the raw
    parquet, so the bucketed write+read round-trip (row preservation,
    bucket pruning, hash layout) is value-checked end-to-end."""
    orders, lineitem = _bucketed_tables(spark, sf_dir)
    from coltt_spark.sources.bucketed import co_located_join

    j = co_located_join(orders, lineitem, "o_orderkey", "l_orderkey")
    # price/discount are exact cents: sum the integer numerator of
    # extprice·(1−discount) so the aggregate is order-independent and
    # bit-identical across engines (CLAUDE.md float-parity recipe —
    # a plain double sum flips the rounding boundary; the quotient is
    # an exact 4-decimal value, so round-4 is boundary-free)
    cents_p = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    cents_d = F.round(F.col("l_discount") * 100, 0).cast("long")
    return (
        j.groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.round(F.sum(cents_p * (100 - cents_d)) / 10000.0, 4).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .filter(F.col("n_items") >= 5)
        .select("o_orderkey", "o_orderpriority", "revenue", "n_items")
    )


_ORACLE_BUCKETED_JOIN = """
SELECT o_orderkey, o_orderpriority,
       round(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) / 10000.0,
             4) AS revenue,
       count(*) AS n_items
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderkey, o_orderpriority
HAVING count(*) >= 5
"""


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering key — the multi-dimensional data-skipping
    layout (Delta ``OPTIMIZE ZORDER`` / Iceberg zorder rewrite): the
    Morton interleave of (l_partkey, l_suppkey) plus the fixed-width
    file assignment (z >> 28 → 16 z-contiguous files, each a compact
    rectangle in key space whose parquet min/max stats prune 2-D box
    predicates). The key is a static 32-term shift/mask expression —
    whole-stage codegen, no UDF — and the oracle regenerates it from
    the SAME generating loop (``dd_zvalue``), so a bit-placement or
    masking divergence breaks value parity on every row. The
    locality/pruning property itself is pinned in
    tests/test_zorder.py (box queries touch ≤¼ of z-ordered files vs
    nearly all hash-layout files)."""
    from coltt_spark.sources.zorder import zvalue

    li = load_table(spark, sf_dir, "lineitem")
    z = zvalue(F.col("l_partkey"), F.col("l_suppkey"))
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        z.alias("z"),
        F.shiftright(z, 28).alias("file_id"),
    )


def _zorder_oracle() -> str:
    from coltt_spark.sources.zorder import dd_zvalue

    z = dd_zvalue("l_partkey", "l_suppkey")
    return f"""
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       {z} AS z,
       ({z} >> 28) AS file_id
FROM lineitem
"""


ANALYTICS_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "pricing_summary": q_pricing_summary,
    "top_revenue_orders": q_top_revenue,
    "region_revenue": q_region_revenue,
    "window_top_orders": q_window_top_orders,
    "rollup_revenue": q_rollup_revenue,
    "cube_revenue": q_cube_revenue,
    "price_percentiles": q_price_percentiles,
    "events_hourly": q_events_hourly,
    "events_sessionize": q_sessionize,
    "events_json": q_events_json,
    "set_intersect": q_set_intersect,
    "events_asof": q_events_asof,
    "bucketed_join": q_bucketed_join,
    "zorder_layout": q_zorder_layout,
}

ANALYTICS_ORACLES: dict[str, str] = {
    "pricing_summary": _ORACLE_PRICING,
    "top_revenue_orders": _ORACLE_TOP_REVENUE,
    "region_revenue": _ORACLE_REGION_REVENUE,
    "window_top_orders": _ORACLE_WINDOW_TOP,
    "rollup_revenue": _ORACLE_ROLLUP,
    "cube_revenue": _ORACLE_CUBE,
    "price_percentiles": _ORACLE_PERCENTILES,
    "events_hourly": _ORACLE_EVENTS_HOURLY,
    "events_sessionize": _ORACLE_SESSIONIZE,
    "events_json": _ORACLE_EVENTS_JSON,
    "set_intersect": _ORACLE_SET_INTERSECT,
    "events_asof": _ORACLE_EVENTS_ASOF,
    "bucketed_join": _ORACLE_BUCKETED_JOIN,
    "zorder_layout": _zorder_oracle(),
}
