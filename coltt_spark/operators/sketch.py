"""Mergeable sketches (HyperLogLog cardinality, count-min frequency)
over the portable 60-bit hash.

The classic 100 TB problem `count(DISTINCT key) GROUP BY group`
shuffles every distinct key; the HLL register array (m small
integers per group) is an associative, mergeable summary that
reduces the shuffle to m·|groups| bytes — Flajolet et al. 2007, the
same estimator behind Spark's `approx_count_distinct` (HLL++).

Spark's built-in is a black-box JVM implementation no external
oracle can replay, so this operator builds the sketch from the
repo's portable primitives instead: [[hash60]] (first 15 md5 hex
chars), power-of-two bucket split via bit ops, leading-zero rank via
the minimal binary string — every step reproducible bit-for-bit in
ANSI SQL (see registry `distinct_sketch` oracle). Estimator:
``E = α·m² / Σ 2^(−M_j)`` with the standard linear-counting
small-range correction ``m·ln(m/V)`` when ``E ≤ 2.5m`` and empty
registers remain. The 32-bit large-range correction does not apply:
the register input is a 52-bit hash, whose collision term is
negligible below ~2^40 distinct keys.

Scale shape: ONE hash aggregation keyed by (group, bucket) with
map-side combine (`max` is associative — partial registers merge in
the map stage), then a per-group fold over exactly m=256 rows. The
distinct keys themselves never shuffle. Accuracy is the standard
1.04/√m ≈ 6.5% at m=256; raise `m` (any power of two) for tighter
bounds at 32 bytes/group per doubling.

Float parity: Σ 2^(−M) folds exact powers of two in bucket order
(Spark ``F.aggregate`` ≡ DuckDB ``list_sum(list(x ORDER BY
bucket))``); α is inlined as the same shortest-repr double literal
on both sides; ``ln`` sees bit-identical rationals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from coltt_spark.functions.memo import memo_columns
from coltt_spark.functions.text import (
    MINHASH_PARAMS,
    hash60,
    minhash_term,
)

#: Bias-correction constant for m = 256 registers (Flajolet et al.,
#: Fig. 3). Inlined verbatim into the SQL oracle — keep the Python
#: expression the single source of the literal.
ALPHA_256 = 0.7213 / (1.0 + 1.079 / 256.0)

#: Register-count exponent: m = 2^8 buckets from the hash low byte;
#: the remaining 52 bits feed the leading-zero rank, so registers
#: fit in 6 bits (max rank 53).
_M = 256


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    *,
    include_exact: bool = False,
) -> DataFrame:
    """Approximate distinct ``key_col`` per group: (group…, n_rows,
    hll_distinct[, exact_distinct]).

    ``include_exact=True`` adds the exact `count(DISTINCT)` column —
    useful for accuracy validation at test scale, but it reintroduces
    the distinct-key shuffle the sketch exists to avoid; leave it off
    in production pipelines.

    NULL keys are ignored (SQL ``count(DISTINCT)`` semantics) —
    ``n_rows`` counts rows with a non-null key; a group whose keys
    are all NULL disappears from the output rather than reporting a
    bogus zero-row register file.
    """
    df = df.where(F.col(key_col).isNotNull())
    # hash once per row; bucket and rank remainder derive from the
    # materialized column (not two copies of the md5 tree)
    hashed = df.select(
        *[F.col(g) for g in group_cols],
        F.col(key_col),
        hash60(F.col(key_col).cast("string")).alias("_h"),
    )
    rows = hashed.select(
        *[F.col(g) for g in group_cols],
        F.col(key_col),
        F.col("_h").bitwiseAND(F.lit(_M - 1)).alias("_bucket"),
        hll_rho(F.col("_h")).alias("_rho"),
    )
    rho = F.col("_rho")
    exact_aggs = (
        [F.countDistinct(F.col(key_col)).alias("_exact")] if include_exact else []
    )
    reg = rows.groupBy(*group_cols, "_bucket").agg(
        F.max(rho).alias("_m"),
        F.count(F.lit(1)).alias("_c"),
        *exact_aggs,
    )
    return hll_finalize(reg, group_cols, include_exact=include_exact)


def hll_rho(h: Column) -> Column:
    """Leading-zero rank of a 60-bit hash's 52-bit remainder:
    53 − bitlength(h >> 8). bin() emits the minimal binary string in
    both engines, so the only leading zero is v=0's lone '0' —
    stripping it maps v=0 to length 0, i.e. rank 53 (all bits zero).
    The oracle's ``53 - length(ltrim(bin(h >> 8), '0'))`` computes
    the same value."""
    return F.lit(53) - F.length(
        F.regexp_replace(F.bin(F.shiftright(h, 8)), "^0+", "")
    )


def hll_finalize(
    reg: DataFrame,
    group_cols: list[str],
    *,
    include_exact: bool = False,
) -> DataFrame:
    """Estimate from a register table (group…, _bucket, _m, _c[,
    _exact]) — the shared back half of the batch and streaming HLL
    paths (streaming builds the registers incrementally in the state
    store; this finalizes the replayed table).

    Empty registers in closed form — no bucket grid, no join, no
    second walk of the aggregation lineage: an observed bucket
    always has rank ≥ 1 (bitlen(v) ≤ 52), so the zero registers are
    exactly the m − |observed| missing buckets, each contributing
    2^-0 = 1.0 to the harmonic sum. The observed part folds in
    bucket order; adding the (m − |observed|)·1.0 remainder is one
    final add of an exact integer-valued double, mirrored verbatim
    by the oracle."""
    arr = F.sort_array(F.collect_list(F.struct("_bucket", "_m")))
    s_obs = F.aggregate(
        arr, F.lit(0.0), lambda acc, x: acc + F.pow(F.lit(2.0), -x["_m"])
    )
    n_obs = F.size(arr)
    per_group = reg.groupBy(*group_cols).agg(
        F.sum("_c").alias("n_rows"),
        (s_obs + (F.lit(_M) - n_obs).cast("double")).alias("_s"),
        (F.lit(_M) - n_obs).cast("long").alias("_v0"),
        *([F.sum("_exact").alias("exact_distinct")] if include_exact else []),
    )
    e_raw = F.lit(ALPHA_256) * F.lit(float(_M * _M)) / F.col("_s")
    est = F.when(
        (e_raw <= F.lit(2.5 * _M)) & (F.col("_v0") > 0),
        F.lit(float(_M)) * F.log(F.lit(float(_M)) / F.col("_v0")),
    ).otherwise(e_raw)
    keep = [*group_cols, "n_rows"] + (["exact_distinct"] if include_exact else [])
    return per_group.select(*keep, F.round(est, 4).alias("hll_distinct"))


#: Count-min geometry: d=4 independent rows (universal-hash params
#: reused from the MinHash family's fixed table, rows 0-3) × w=1024
#: counters — 32 KB of state regardless of key cardinality.
CM_D = 4
CM_W = 1024


def _cm_cells(h: Column) -> list[Column]:
    """The d counter cells of a 60-bit key hash: row i is
    ``minhash_term(h, aᵢ, bᵢ) mod w`` — the same integer-exact
    universal-hash family the MinHash signatures verify."""
    return [
        minhash_term(h, a, b) % F.lit(CM_W)
        for a, b in MINHASH_PARAMS[:CM_D]
    ]


def cm_build(df: DataFrame, key_col: str) -> DataFrame:
    """Build a count-min sketch (Cormode & Muthukrishnan 2005) of
    ``key_col``'s frequency distribution: returns the (r, cell, n)
    counter table, at most d·w = 4096 rows.

    The 100 TB story: a full frequency table over an unbounded key
    space (urls, shingles, tokens) is itself huge and skew-prone;
    the sketch is a FIXED d·w-cell aggregate with map-side combine,
    mergeable across shards/days by cell-wise addition. Estimates
    only ever over-count (min over d rows bounds the additive error
    by ~2N/w with probability 1-2^-d).
    """
    # materialize the md5-derived hash once per row in its own
    # projection — the four cells then derive from the column, not
    # from four copies of the md5 expression tree
    hashed = df.select(hash60(F.col(key_col).cast("string")).alias("_h"))
    # fixed tree over _h — built once per session (r14-opt, guide §4)
    rc = memo_columns(
        "sketch.cm_build.rc",
        lambda: F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("r"), c.alias("cell"))
                    for i, c in enumerate(_cm_cells(F.col("_h")))
                ]
            )
        ),
    )
    return (
        hashed.select(rc.alias("_rc"))
        .select(F.col("_rc.r").alias("r"), F.col("_rc.cell").alias("cell"))
        .groupBy("r", "cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cm_estimate(sketch: DataFrame, keys: list[str]) -> DataFrame:
    """Point-query the sketch: (key, cm_estimate) per probe key —
    the minimum of the key's d counters. Probes are a tiny literal
    table joined against the ≤4096-row sketch; never a corpus scan."""
    if not keys:
        raise ValueError("cm_estimate: no probe keys")
    spark = sketch.sparkSession
    probe = spark.createDataFrame([(k,) for k in keys], ["key"])
    # fixed tree over the probe key column — built once per session
    rc = memo_columns(
        "sketch.cm_estimate.rc",
        lambda: F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("r"), c.alias("cell"))
                    for i, c in enumerate(_cm_cells(hash60(F.col("key"))))
                ]
            )
        ),
    )
    pr = probe.select("key", rc.alias("_rc")).select(
        "key", F.col("_rc.r").alias("r"), F.col("_rc.cell").alias("cell")
    )
    j = pr.join(sketch, on=["r", "cell"], how="left").select(
        "key", F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
    return j.groupBy("key").agg(F.min("n").alias("cm_estimate"))


#: Bloom geometry: m = 2^16 bits (8 KB as a bitmap), k = 4 hash
#: functions — universal-hash params rows 4-7 of the MinHash table
#: (rows 0-3 belong to the count-min sketch). FP rate ≈ (1-e^(-kn/m))^k
#: — ~2.4% at n = 10k members.
BLOOM_M = 1 << 16
BLOOM_K = 4


def _bloom_bits(h: Column) -> list[Column]:
    """The k bit positions of a 60-bit key hash — universal-hash
    rows via :func:`minhash_term`, folded onto m bits."""
    return [
        minhash_term(h, a, b) % F.lit(BLOOM_M)
        for a, b in MINHASH_PARAMS[CM_D : CM_D + BLOOM_K]
    ]


def bloom_build(df: DataFrame, hash_col: str) -> DataFrame:
    """Set-bit table of a Bloom filter over a 60-bit-hash column:
    distinct `bit` positions, ≤ m rows (≤ 8 KB as a real bitmap).
    This is the broadcastable membership summary: a 100 TB corpus
    probes it with NO shuffle, vs broadcasting the raw member set."""
    h = F.col(hash_col)
    return (
        df.select(
            F.explode(F.array(*_bloom_bits(h))).alias("bit")
        )
        .distinct()
    )


def bloom_probe(df: DataFrame, hash_col: str, bits: DataFrame) -> DataFrame:
    """Filter ``df`` to DISTINCT rows whose ``hash_col`` passes the
    Bloom membership test (ALL k bit positions set). Membership is
    judged by the count of DISTINCT hash indices whose bit is set, so
    neither colliding bit positions (two j's, one bit) nor duplicate
    input rows can under- or over-count — a duplicated member row
    must never turn into a false negative. May pass false positives
    (never false negatives) — the standard trade. Output rows are
    deduplicated (set semantics, like the bitmap it models).
    """
    h = F.col(hash_col)
    probe = df.select(
        "*",
        F.posexplode(F.array(*_bloom_bits(h))).alias("_j", "bit"),
    )
    passed = (
        probe.join(F.broadcast(bits), on="bit")
        .groupBy(*df.columns)
        # distinct hash indices via a k-element set in the agg buffer
        # — one hash aggregation, no count-distinct Expand rewrite
        .agg(F.size(F.collect_set("_j")).alias("_set"))
        .filter(F.col("_set") == BLOOM_K)
        .drop("_set")
    )
    return passed


#: Histogram-quantile bin width: a POWER OF TWO so `value / width` is
#: an exact double operation — bin assignment is bit-identical on any
#: IEEE engine, no rounding-boundary drift.
QS_BIN_WIDTH = 256.0


def quantile_histogram(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    *,
    bin_width: float = QS_BIN_WIDTH,
) -> DataFrame:
    """Histogram-sketch quantiles: (q, est, n_rows) per requested
    quantile, est = midpoint of the bin where the cumulative count
    crosses ``ceil(q·N)``. Additive error ≤ bin_width/2.

    The exact quantile (`price_percentiles`) sorts every group; this
    is the bounded-state alternative: ONE hash aggregation onto
    ``floor(value / bin_width)`` bins (map-side combined, mergeable
    across shards by addition), then a cumulative walk over the tiny
    histogram — the corpus is never sorted. Power-of-two bin width
    keeps bin assignment exact; thresholds ``ceil(q·N)`` and midpoints
    ``bin·w + w/2`` are reproducible double arithmetic, so the whole
    sketch is oracle-checkable.
    """
    # NULLs are invisible to SQL percentile semantics — drop them
    # before binning (they would otherwise sort as the smallest bin
    # in Spark and the largest in engines that order NULLS LAST,
    # corrupting every cumulative count)
    hist = (
        df.where(F.col(value_col).isNotNull())
        .select((F.floor(F.col(value_col) / F.lit(bin_width))).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # the ungrouped case of the shared estimator: one bounded-window
    # stage carries both the cumulative walk and the grand total, so
    # the corpus aggregation runs exactly once
    return quantile_finalize(hist, [], qs, bin_width=bin_width)


def quantile_finalize(
    hist: DataFrame,
    group_cols: list[str],
    qs: list[float],
    *,
    bin_width: float = QS_BIN_WIDTH,
) -> DataFrame:
    """Per-group quantile estimates from a (group…, bin, n) histogram
    — the shared back half of the batch and streaming histogram
    sketches (streaming accumulates per-window bin counts in the
    state store by addition; this finalizes the replayed table).
    Returns (group…, q, n_rows, est); windows are PARTITIONED by the
    group columns over the bounded per-group histogram."""
    if not qs:
        raise ValueError("quantile_finalize: no quantiles requested")
    from pyspark.sql import Window

    w_run = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    cum = hist.select(
        *group_cols,
        "bin",
        F.sum("n").over(w_run).alias("cum"),
        F.sum("n").over(w_all).alias("n_rows"),
    )
    qdf = hist.sparkSession.createDataFrame([(float(q),) for q in qs], ["q"])
    picked = (
        cum.crossJoin(F.broadcast(qdf))
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("n_rows")))
        .groupBy(*group_cols, "q", "n_rows")
        .agg(F.min("bin").alias("_bin"))
    )
    est = F.col("_bin") * F.lit(bin_width) + F.lit(bin_width / 2.0)
    return picked.select(
        *group_cols, "q", "n_rows", F.round(est, 4).alias("est")
    )
