"""Packed block-matrix vector layout — the FLAT-scan fast path.

The reference holds 1M vectors in 16 in-RAM shard maps and scans them
with SIMD distance kernels (``edge/none_vectorstore.go:129-180``,
``pkg/distance/simd/*``). The Spark-native equivalent of "a shard held
in RAM, scanned by SIMD" is a **block**: ~32k vectors packed into ONE
DataFrame row as a contiguous float32/float64 buffer (a binary cell)
together with their ids and precomputed L2 norms. A KNN scan is then
one BLAS matvec per block inside an Arrow batch — per-row overhead
amortizes to zero (the array-of-struct layout pays it a million times)
— and each block emits only its local top-k, so the global merge is a
``TakeOrderedAndProject`` over k·n_blocks tiny rows.

Scale story (100 TB): blocks are ordinary rows in an ordinary table,
so the scan is shuffle-free and embarrassingly parallel across any
number of executors; per-query data movement is k rows per block. The
written index (:func:`write_block_index` + :func:`block_index_topk`)
adds an executor-side decoded-matrix cache, which is the moral
equivalent of the reference's "LoadCollection into RAM" — after the
first query, repeat queries never re-decode (and with Spark's
deterministic task locality they mostly hit the same executors).
"""

from __future__ import annotations

import os
from collections import OrderedDict
from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DTYPES = {"float32": np.float32, "float64": np.float64}

BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("block_id", T.LongType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("ids", T.BinaryType(), False),  # int64 little-endian
        T.StructField("vecs", T.BinaryType(), False),  # row-major (n, dim)
        T.StructField("norms", T.BinaryType(), False),  # L2 norms, same dtype
    ]
)


def pack_blocks(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    dim: int,
    block_rows: int = 32768,
    dtype: str = "float32",
) -> DataFrame:
    """Pack (id, vector) rows into contiguous matrix blocks.

    One output row per ≤ ``block_rows`` input rows: ids as an int64
    buffer, vectors as a row-major ``dtype`` matrix buffer, L2 norms
    precomputed (the reference precomputes normalization at write time
    for the same reason — ``edge/none_vectorstore.go:95-97``).
    Block ids are unique across partitions (partition id in the high
    bits), and packing never shuffles: each partition packs locally.
    """
    np_dtype = _DTYPES[dtype]

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seq = 0
        buf_ids: list[np.ndarray] = []
        buf_X: list[np.ndarray] = []
        pending = 0

        def emit(ids: np.ndarray, X: np.ndarray) -> pd.DataFrame:
            nonlocal seq
            norms = np.linalg.norm(X, axis=1).astype(np_dtype)
            row = pd.DataFrame(
                {
                    "block_id": [(pid << 32) | seq],
                    "n": [len(ids)],
                    "ids": [ids.astype(np.int64).tobytes()],
                    "vecs": [np.ascontiguousarray(X, dtype=np_dtype).tobytes()],
                    "norms": [norms.tobytes()],
                }
            )
            seq += 1
            return row

        for pdf in batches:
            if len(pdf) == 0:
                continue
            buf_ids.append(pdf[id_col].to_numpy(dtype=np.int64))
            buf_X.append(np.array(pdf[vec_col].tolist(), dtype=np_dtype))
            pending += len(pdf)
            while pending >= block_rows:
                ids = np.concatenate(buf_ids)
                X = np.concatenate(buf_X, axis=0)
                yield emit(ids[:block_rows], X[:block_rows])
                buf_ids, buf_X = [ids[block_rows:]], [X[block_rows:]]
                pending -= block_rows
        if pending:
            yield emit(np.concatenate(buf_ids), np.concatenate(buf_X, axis=0))

    src = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(vec_col).cast(f"array<{'float' if dtype == 'float32' else 'double'}>"),
    )
    return src.mapInPandas(pack, BLOCK_SCHEMA)


def _scan_block(
    ids: np.ndarray,
    X: np.ndarray,
    norms: np.ndarray,
    q: np.ndarray,
    *,
    distance: str,
    k: int,
) -> pd.DataFrame:
    """One block → its local top-k (id, dist). One BLAS matvec."""
    if distance == "manhattan":
        D = np.abs(X - q[None, :]).sum(axis=1)
    else:
        dots = X @ q
        if distance == "cosine":
            qn = np.linalg.norm(q)
            D = np.abs(1.0 - dots / np.maximum(norms * qn, 1e-300))
        elif distance == "euclidean":
            qq = float(q @ q)
            D = np.sqrt(np.maximum(norms.astype(np.float64) ** 2 + qq - 2.0 * dots, 0.0))
        elif distance == "dot":
            D = -dots
        else:
            raise ValueError(f"unknown distance {distance!r}")
    kk = min(k, len(ids))
    sel = np.argpartition(D, kk - 1)[:kk] if kk < len(ids) else np.arange(len(ids))
    return pd.DataFrame({"id": ids[sel], "dist": D[sel].astype(np.float64)})


def _decode(row, dim: int, np_dtype) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    n = int(row["n"])
    ids = np.frombuffer(row["ids"], dtype=np.int64, count=n)
    X = np.frombuffer(row["vecs"], dtype=np_dtype, count=n * dim).reshape(n, dim)
    norms = np.frombuffer(row["norms"], dtype=np_dtype, count=n)
    return ids, X, norms


def block_topk(
    blocks: DataFrame,
    query: Sequence[float],
    *,
    dim: int,
    k: int = 10,
    distance: str = "cosine",
    dtype: str = "float32",
) -> DataFrame:
    """Exhaustive FLAT KNN over packed blocks → (id, dist), best
    first. Per-block local top-k inside ``mapInPandas`` (zero-copy
    ``frombuffer`` decode + one matvec), merged by a global
    ``ORDER BY dist LIMIT k`` — the same per-shard-PQ-then-merge
    physical shape as the reference's parallel scan."""
    np_dtype = _DTYPES[dtype]
    q = np.asarray([float(x) for x in query], dtype=np_dtype)

    out_schema = T.StructType(
        [T.StructField("id", T.LongType(), False), T.StructField("dist", T.DoubleType(), False)]
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                _scan_block(*_decode(row, dim, np_dtype), q, distance=distance, k=k)
                for _, row in pdf.iterrows()
            ]
            if out:
                yield pd.concat(out, ignore_index=True)

    local = blocks.mapInPandas(scan, out_schema)
    return local.orderBy(F.col("dist").asc(), F.col("id").asc()).limit(k)


# ---------------------------------------------------------------------------
# written index + executor-side cache (the serving shape)

_FILE_CACHE: OrderedDict[tuple, list] = OrderedDict()
_FILE_CACHE_MAX_BYTES = int(os.environ.get("COLTT_BLOCK_CACHE_BYTES", 2 << 30))


def write_block_index(
    blocks: DataFrame, path: str, *, n_files: int | None = None
) -> None:
    """Persist packed blocks as Parquet, one task-sized file per
    executor slot (the file is the cache/scan granule)."""
    n_files = n_files or blocks.sparkSession.sparkContext.defaultParallelism
    blocks.repartition(n_files, "block_id").write.mode("overwrite").parquet(path)


def _cached_file_blocks(path: str, dim: int, np_dtype) -> list:
    """Decode a block file to [(ids, X, norms)], cached per-worker.
    Keyed by (path, mtime, size) so a rewritten index invalidates;
    LRU-bounded by COLTT_BLOCK_CACHE_BYTES (default 2 GiB/worker)."""
    st = os.stat(path)
    key = (path, st.st_mtime_ns, st.st_size, np_dtype)
    hit = _FILE_CACHE.get(key)
    if hit is not None:
        _FILE_CACHE.move_to_end(key)
        return hit
    import pyarrow.parquet as pq

    tbl = pq.read_table(path)
    out = []
    nbytes = 0
    for i in range(tbl.num_rows):
        n = tbl["n"][i].as_py()
        ids = np.frombuffer(tbl["ids"][i].as_py(), dtype=np.int64, count=n)
        X = np.frombuffer(tbl["vecs"][i].as_py(), dtype=np_dtype, count=n * dim).reshape(
            n, dim
        )
        norms = np.frombuffer(tbl["norms"][i].as_py(), dtype=np_dtype, count=n)
        out.append((ids, X, norms))
        nbytes += X.nbytes + ids.nbytes + norms.nbytes
    _FILE_CACHE[key] = out
    total = nbytes + sum(
        sum(x.nbytes + i.nbytes + nn.nbytes for i, x, nn in v) for v in _FILE_CACHE.values()
    )
    while len(_FILE_CACHE) > 1 and total > _FILE_CACHE_MAX_BYTES:
        _, old = _FILE_CACHE.popitem(last=False)
        total -= sum(i.nbytes + x.nbytes + nn.nbytes for i, x, nn in old)
    return out


def block_index_topk(
    spark: SparkSession,
    path: str,
    query: Sequence[float],
    *,
    dim: int,
    k: int = 10,
    distance: str = "cosine",
    dtype: str = "float32",
) -> DataFrame:
    """KNN over a written block index with an executor-side decoded
    cache — the serving path. The Spark plan per query ships only FILE
    PATHS (a handful of rows); each task scans its file's blocks from
    the worker cache (first touch decodes from Parquet) and returns
    k rows. Nothing but file names and k·n_files result rows ever
    crosses the JVM↔Python or executor↔driver boundary."""
    np_dtype = _DTYPES[dtype]
    q = np.asarray([float(x) for x in query], dtype=np_dtype)
    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    if not files:
        raise FileNotFoundError(f"no block files under {path}")
    fdf = spark.createDataFrame([(f,) for f in files], "path string").repartition(
        len(files)
    )
    out_schema = T.StructType(
        [T.StructField("id", T.LongType(), False), T.StructField("dist", T.DoubleType(), False)]
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p in pdf["path"]:
                out = [
                    _scan_block(ids, X, norms, q, distance=distance, k=k)
                    for ids, X, norms in _cached_file_blocks(p, dim, np_dtype)
                ]
                if out:
                    yield pd.concat(out, ignore_index=True)

    local = fdf.mapInPandas(scan, out_schema)
    return local.orderBy(F.col("dist").asc(), F.col("id").asc()).limit(k)
