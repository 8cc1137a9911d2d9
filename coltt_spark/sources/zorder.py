"""Z-order (Morton) clustered layout — multi-dimensional data skipping.

Bucketing (:mod:`coltt_spark.sources.bucketed`) buys shuffle-free
JOINS on one key; Z-ordering buys SCAN PRUNING on several: interleave
the bits of two columns into one sort key, write the table sorted by
it, and every file/row-group covers a compact rectangle in
(a, b)-space — so the parquet min/max statistics both engines already
maintain become a 2-D index. A box predicate
``a BETWEEN .. AND b BETWEEN ..`` then touches only the few files
whose rectangle intersects the box, instead of every file the way a
single-column sort leaves the second dimension scattered. This is
the layout step the large-table ecosystems ship as ``OPTIMIZE
ZORDER BY`` (Delta) / ``rewrite_data_files(strategy => 'sort',
sort_order => zorder(..))`` (Iceberg); at 100 TB it is the
difference between a 2-D filter scanning everything and scanning
~(box volume / table volume) of the data.

Mechanics: ``zvalue`` is a PURE static Catalyst expression (32
shift-mask-multiply terms for 16-bit interleave — whole-stage
codegen, no UDF) with an exactly matching DuckDB fragment generated
from the same loop, so the key itself is oracle-checkable.
``write_zordered`` range-partitions by the key (contiguous z-ranges
per file — the property the pruning relies on) and sorts within
partitions so row groups inside each file are compact too.

Scale notes: the one-time layout cost is a range shuffle + local
sort — the same price as any global sort, paid once at ingest like
bucketing's shuffle. ``n_files`` is sized to the target file size
(~256 MB), not executor count. Columns are masked to ``bits`` low
bits; dimensions with larger domains should be quantile-bucketed to
``2^bits`` ranks first (rank interleave preserves locality; raw
magnitudes past the mask would alias).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zvalue", "dd_zvalue", "write_zordered", "ZORDER_BITS"]

#: default interleave width per dimension (z fits in 32 bits)
ZORDER_BITS = 16


def zvalue(a: Column, b: Column, *, bits: int = ZORDER_BITS) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    integer columns: bit ``i`` of ``a`` lands at position ``2i``, bit
    ``i`` of ``b`` at ``2i+1``. Static expression — no fold, no UDF."""
    mask = (1 << bits) - 1
    am = a.cast("long").bitwiseAND(F.lit(mask))
    bm = b.cast("long").bitwiseAND(F.lit(mask))
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = (
            out
            + F.shiftright(am, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
            + F.shiftright(bm, i).bitwiseAND(F.lit(1)) * F.lit(2 << (2 * i))
        )
    return out


def dd_zvalue(a: str, b: str, *, bits: int = ZORDER_BITS) -> str:
    """The DuckDB replay of :func:`zvalue` — generated from the same
    loop so the two engines cannot drift."""
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        terms.append(f"((({a} & {mask}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({b} & {mask}) >> {i}) & 1) * {2 << (2 * i)}")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int,
    *,
    bits: int = ZORDER_BITS,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered by the
    Z-order of ``(col_a, col_b)``: range-partitioned on the z key
    (each file owns a contiguous z interval → a compact rectangle in
    key space) and sorted within each file (compact row groups)."""
    z = zvalue(F.col(col_a), F.col(col_b), bits=bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
