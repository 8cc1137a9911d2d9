"""Collection catalog: DDL/DML surface of the engine.

Reference parity (SURVEY §2.1/§2.2): Create/Get/Delete/Load/Release/
Flush collection (``edge/edge.go:78-553``) and the Index write path —
PK upsert with last-writer-wins, equality-filter delete
(``edge/edge.go:555-608``, ``edge/none_vectorstore.go:66-127``).

Spark-first storage: a collection is a directory of versioned Parquet
snapshots plus a JSON manifest (dim, distance, quantization, index
design, current version) — the manifest plays the role of coltt's
MinIO ``.meta.json`` blob and the version swap plays the diskv commit
log: every flush writes ``v{N+1}`` then atomically repoints the
manifest, so readers never observe a half-written table (same
guarantee Delta's transaction log provides; plain Parquet keeps the
container dependency-free).

Write model: like the reference (in-memory until Flush), upserts and
deletes update a lazy DataFrame view immediately; ``flush()``
materializes. Upsert compiles to ``new_batch ∪ (current ⟕anti
new_keys)`` — a broadcast anti-join when the batch is small, which is
the scalable MERGE shape. At 100 TB you would swap the storage layer
for Delta ``MERGE INTO`` keyed on the PK; the operator surface here is
deliberately identical.
"""

from __future__ import annotations

import json
import math
import os
import re
import shutil
from collections.abc import Sequence
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

import numpy as np

from coltt_spark.filters import compile_filter, validate_delete_key
from coltt_spark.functions.quantization import dequantize, quantize, quantize_np
from coltt_spark.functions.vector import lit_double_array, score as score_expr, vector_distance
from coltt_spark.operators.search import _paginate_topk, multi_vector_search
from coltt_spark.schema import SPARK_TYPES as _SPARK_META
from coltt_spark.schema import _NULL_DEFAULT, IndexDesign, validate_metadata, validate_vector

DISTANCES = ("cosine", "euclidean", "manhattan")
QUANTIZATIONS = ("none", "f16", "bf16", "f8", "bq", "sq8")
LAYOUTS = ("rows", "blocks", "ivf", "ivfpq")

_VEC = "vector"
_COMMIT = "_commit_id"


def _link_tree(src: str, dst: str) -> None:
    """:func:`_link_parts` over a partitioned layout: replicate the
    ``key=value`` directory structure of ``src`` under ``dst`` and
    hardlink every part file inside — the manifest-reference shape for
    a partition-pruned index."""
    for entry in os.listdir(src):
        s = os.path.join(src, entry)
        if os.path.isdir(s):
            d = os.path.join(dst, entry)
            os.makedirs(d, exist_ok=True)
            _link_tree(s, d)
    _link_parts(src, dst)


def _link_parts(src: str, dst: str) -> None:
    """Reference every Parquet part file of ``src`` from ``dst`` via
    hardlink (metadata-only; the files are immutable once written —
    the local-FS realization of a table-format manifest pointing at
    unchanged base files). Falls back to a copy across filesystems."""
    for f in os.listdir(src):
        if not (f.startswith("part-") and f.endswith(".parquet")):
            continue
        s, d = os.path.join(src, f), os.path.join(dst, f)
        if os.path.exists(d):
            continue
        try:
            os.link(s, d)
        except OSError:
            shutil.copy2(s, d)


@dataclass
class Manifest:
    name: str
    dim: int
    distance: str
    quantization: str
    index_design: IndexDesign
    version: int = 0
    next_commit: int = 0
    layout: str = "rows"
    block_dtype: str = "float32"
    versioning: bool = False
    ivf_centroids: int = 16
    ivf_nprobe: int = 4
    ivf_kmeans_iters: int = 1
    #: Auto-compaction trigger: when any inverted list has GROWN by
    #: this many part files since the last full build, the next
    #: flush() folds the whole collection (0 disables). Growth-based,
    #: not absolute: a large fresh build legitimately writes many
    #: parts per list, and an absolute threshold would then force a
    #: full O(collection) fold on EVERY flush. The measured
    #: read-amplification curve (SURVEY §8) shows IVF probe latency
    #: drifting ~25% by ~20 delta flushes and compaction restoring it
    #: — the same ticker-driven merge discipline as the reference's
    #: diskv store (diskv/merge.go:40-181,
    #: pkg/index/optimization.go:27-74), keyed on observed fan-out
    #: instead of wall clock.
    ivf_max_list_files: int = 10
    #: Worst per-list part-file count recorded at the last full IVF
    #: build — the baseline the growth trigger measures against.
    ivf_base_list_files: int = 0
    #: layout="ivfpq" knobs: residual product-quantization geometry
    #: (M subspaces × ks codes per subspace — each stored row costs M
    #: bytes instead of dim·4, the billion-scale serving layout) and
    #: the default exact-rerank depth (0 = ADC-only serving).
    pq_subspaces: int = 8
    pq_codes: int = 16
    ivfpq_refine: int = 50
    #: OPQ (Ge et al. 2014): train an orthogonal rotation that
    #: balances residual variance across the PQ subspaces before
    #: encoding (operators.pq.opq_train_np). Stored as rotation.npy
    #: beside the codebooks; queries rotate their residuals, the exact
    #: rerank stays in the raw space (rotation-invariant distances).
    pq_opq: bool = False

    def to_json(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "dim": self.dim,
            "distance": self.distance,
            "quantization": self.quantization,
            "index_design": self.index_design.to_json(),
            "version": self.version,
            "next_commit": self.next_commit,
            "layout": self.layout,
            "block_dtype": self.block_dtype,
            "versioning": self.versioning,
            "ivf_centroids": self.ivf_centroids,
            "ivf_nprobe": self.ivf_nprobe,
            "ivf_kmeans_iters": self.ivf_kmeans_iters,
            "ivf_max_list_files": self.ivf_max_list_files,
            "ivf_base_list_files": self.ivf_base_list_files,
            "pq_subspaces": self.pq_subspaces,
            "pq_codes": self.pq_codes,
            "ivfpq_refine": self.ivfpq_refine,
            "pq_opq": self.pq_opq,
        }

    @classmethod
    def from_json(cls, d: dict[str, Any]) -> Manifest:
        return cls(
            name=d["name"],
            dim=d["dim"],
            distance=d["distance"],
            quantization=d["quantization"],
            index_design=IndexDesign.from_json(d["index_design"]),
            version=d["version"],
            next_commit=d["next_commit"],
            layout=d.get("layout", "rows"),
            block_dtype=d.get("block_dtype", "float32"),
            versioning=d.get("versioning", False),
            ivf_centroids=d.get("ivf_centroids", 16),
            ivf_nprobe=d.get("ivf_nprobe", 4),
            ivf_kmeans_iters=d.get("ivf_kmeans_iters", 1),
            ivf_max_list_files=d.get("ivf_max_list_files", 10),
            ivf_base_list_files=d.get("ivf_base_list_files", 0),
            pq_subspaces=d.get("pq_subspaces", 8),
            pq_codes=d.get("pq_codes", 16),
            ivfpq_refine=d.get("ivfpq_refine", 50),
            pq_opq=d.get("pq_opq", False),
        )


class Collection:
    """Handle over one collection: lazy current view + manifest."""

    def __init__(self, spark: SparkSession, root: str, manifest: Manifest):
        self.spark = spark
        self.root = root
        self.manifest = manifest
        self._view: DataFrame = self._read_version()
        self._cached = False
        self._dirty = False  # unflushed DML ⇒ block index (if any) is stale
        self._reset_pending()

    def _reset_pending(self) -> None:
        """Clear the since-last-flush DML bookkeeping that makes an
        incremental flush O(change): the pending-rows view (inserted/
        updated rows still live), the upserted-PK set, and the delete
        predicates — enough to derive delta files and tombstones
        WITHOUT diffing the whole collection at flush time."""
        self._pending: DataFrame | None = None
        self._upserted_pks: DataFrame | None = None
        self._delete_asts: list[dict[str, Any]] = []

    def _track_upsert(self, new: DataFrame) -> None:
        """Fold an upsert batch into the pending view (same LWW shape
        as the main view, but over ONLY the rows changed since flush —
        so every maintenance op here is O(pending), not O(collection))
        and remember its PKs (their base-version commit ids become
        tombstones at flush)."""
        pk = self.manifest.index_design.primary_key
        if self._pending is None:
            self._pending = new
        else:
            keep = self._pending.join(
                F.broadcast(new.select(pk)), on=pk, how="left_anti"
            )
            self._pending = keep.unionByName(new.select(keep.columns))
        pks = new.select(pk)
        self._upserted_pks = (
            pks if self._upserted_pks is None else self._upserted_pks.unionByName(pks)
        )

    # -- storage ------------------------------------------------------

    def _data_dir(self, version: int | None = None) -> str:
        v = self.manifest.version if version is None else version
        return os.path.join(self.root, f"v{v}")

    def _blocks_dir(self, vector_col: str, version: int | None = None) -> str:
        v = self.manifest.version if version is None else version
        return os.path.join(self.root, f"v{v}_blocks", vector_col)

    def _ivf_dir(self, vector_col: str, version: int | None = None) -> str:
        v = self.manifest.version if version is None else version
        return os.path.join(self.root, f"v{v}_ivf", vector_col)

    def _tombstones_dir(self, version: int | None = None) -> str:
        v = self.manifest.version if version is None else version
        return os.path.join(self.root, f"v{v}_tombstones")

    def _ivf_ready(
        self, vector_col: str, version: int | None = None, *, strict: bool = True
    ) -> bool:
        """True when the IVF index for ``vector_col`` exists in the
        current packed-per-centroid layout (a ``blocks/`` subtree
        beside ``centroids.npy``). An index directory WITHOUT
        ``blocks/`` is a stale or partially-written format — probing
        it would list zero files and silently serve EMPTY results, so
        serving gates (``strict=True``) fail loudly instead; flush's
        incremental gate passes ``strict=False`` and treats it as
        not-ready, which routes into the full rebuild that heals it.
        An ``ivfpq`` index additionally needs its residual codebooks
        (``book.npy``) beside the centroids — codes are unreadable
        without them."""
        d = self._ivf_dir(vector_col, version)
        if not os.path.isdir(d):
            return False
        if os.path.isdir(os.path.join(d, "blocks")):
            if self.manifest.layout == "ivfpq" and not os.path.isfile(
                os.path.join(d, "book.npy")
            ):
                if strict:
                    raise RuntimeError(
                        f"ivfpq index at {d} has no book.npy — codes "
                        "cannot be decoded; run flush(compact=True) to rebuild"
                    )
                return False
            if (
                self.manifest.layout == "ivfpq"
                and not strict
                and not os.path.isdir(os.path.join(d, "vecs"))
            ):
                # pre-rerank-tree index: SERVING still works (the
                # refined search falls back to the snapshot join), but
                # the incremental-flush gate treats it as not-ready so
                # the next flush full-rebuilds and heals the layout
                return False
            return True
        if strict:
            raise RuntimeError(
                f"IVF index at {d} has no blocks/ subdirectory — stale or "
                "partially written layout; run flush(compact=True) to rebuild"
            )
        return False

    def _ivf_worst_list_fanout(self, vector_col: str, version: int) -> int:
        """Read amplification of the IVF delta layout: the largest
        per-inverted-list Parquet part count. Each delta flush appends
        part files inside every touched ``centroid=`` partition; a
        probe opens every file of the probed lists, so this number IS
        the per-list file fan-out compaction exists to bound."""
        blocks = os.path.join(self._ivf_dir(vector_col, version), "blocks")
        worst = 0
        if os.path.isdir(blocks):
            for entry in os.listdir(blocks):
                d = os.path.join(blocks, entry)
                if entry.startswith("centroid=") and os.path.isdir(d):
                    n = sum(1 for f in os.listdir(d) if f.endswith(".parquet"))
                    worst = max(worst, n)
        return worst


    def _vector_cols(self) -> list[str]:
        """Named vector fields from the index design (experimental
        CFLAT multi-vector records), or the default single ``vector``
        column when none are declared."""
        named = [f.name for f in self.manifest.index_design.fields if f.type == "vector"]
        return named or [_VEC]

    def _storage_schema(self) -> T.StructType:
        quantized = self.manifest.quantization != "none"
        vec_type: T.DataType = T.BinaryType() if quantized else T.ArrayType(T.FloatType())
        fields: list[T.StructField] = [
            T.StructField(f.name, vec_type if f.type == "vector" else _SPARK_META[f.type], False)
            for f in self.manifest.index_design.fields
        ]
        if not any(f.type == "vector" for f in self.manifest.index_design.fields):
            fields.append(T.StructField(_VEC, vec_type, False))
        fields.append(T.StructField(_COMMIT, T.LongType(), False))
        return T.StructType(fields)

    def _read_version(self) -> DataFrame:
        df = self.spark.read.schema(self._storage_schema()).parquet(self._data_dir())
        return self._minus_tombstones(df, self._tombstones_dir())

    def _minus_tombstones(self, df: DataFrame, tomb_dir: str) -> DataFrame:
        """Subtract a version's tombstoned commit ids (rows superseded
        or deleted since the last compact) — an anti-join against the
        small tombstone table, broadcast by AQE. Versions written by a
        full flush/compact have no tombstone dir and read as-is."""
        if os.path.isdir(tomb_dir):
            dead = self.spark.read.schema(
                T.StructType([T.StructField(_COMMIT, T.LongType(), False)])
            ).parquet(tomb_dir)
            df = df.join(dead, on=_COMMIT, how="left_anti")
        return df

    def _write_manifest(self) -> None:
        tmp = os.path.join(self.root, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(self.manifest.to_json(), f, indent=2)
        os.replace(tmp, os.path.join(self.root, "manifest.json"))

    # -- DML ----------------------------------------------------------

    def upsert(self, rows: list[dict[str, Any]]) -> int:
        """PK upsert, last-writer-wins (edge Index(CHANGED) semantics).

        Each row = metadata dict + ``vector``. Validation mirrors
        standardAnalyzer; within a batch the last occurrence of a PK
        wins (matching sequential per-row gRPC application).
        """
        m = self.manifest
        design = m.index_design
        vcols = self._vector_cols()
        cleaned: dict[str, dict[str, Any]] = {}
        for row in rows:
            meta = validate_metadata(design, {k: v for k, v in row.items() if k not in vcols})
            for vc in vcols:
                vec = validate_vector(m.dim, row.get(vc))
                if m.distance == "cosine":
                    # normalize-at-write so cosine ≡ |1-dot| at query
                    # time (edge/none_vectorstore.go:95-97); quantize
                    # AFTER normalizing, like the reference
                    a = np.asarray(vec, dtype=np.float64)
                    n = float(np.linalg.norm(a))
                    vec = [float(x) for x in a / n] if n else vec
                meta[vc] = (
                    quantize_np(m.quantization, vec) if m.quantization != "none" else vec
                )
            cleaned[meta[design.primary_key]] = meta  # batch-internal LWW
        batch = list(cleaned.values())
        for i, r in enumerate(batch):
            r[_COMMIT] = m.next_commit + i
        m.next_commit += len(batch)

        new = self.spark.createDataFrame(batch, self._storage_schema())
        pk = design.primary_key
        survivors = self._view.join(F.broadcast(new.select(pk)), on=pk, how="left_anti")
        self._view = survivors.unionByName(new.select(survivors.columns))
        self._track_upsert(new)
        self._dirty = True
        return len(batch)

    def upsert_df(self, df: DataFrame, *, dedupe_batch: bool = True) -> int:
        """Bulk DataFrame-native upsert — the ingest path that scales.

        Same semantics as :meth:`upsert` (standardAnalyzer-style
        validation, PK last-writer-wins against the current view,
        normalize-at-write for cosine, quantize-at-write), but every
        transform is a Catalyst expression or Arrow-batched kernel —
        no row ever touches the driver, so the same call ingests 100
        rows or 100 TB. Input: one column per metadata field (missing
        nullable fields get the type default) plus each vector column
        as ``array<numeric>``. Bad rows (wrong dim, NaN/Inf, null PK)
        fail the job via ``raise_error`` — the bulk analogue of the
        per-row ValueError.

        Commit ids are snowflake-like: sparse, strictly above every
        earlier batch (``lit(next_commit) + monotonically_increasing_id``,
        then the manifest skips a block). With ``dedupe_batch`` PK
        duplicates inside the batch resolve to the highest commit id;
        pass ``False`` when the batch is known PK-unique to skip that
        shuffle.
        """
        m = self.manifest
        design = m.index_design
        vcols = self._vector_cols()
        meta_fields = [f for f in design.fields if f.type != "vector"]
        known = {f.name for f in meta_fields} | set(vcols)
        unknown = set(df.columns) - known
        if unknown:
            raise ValueError(f"unknown metadata keys: {sorted(unknown)}")

        cols: list = []
        for f in meta_fields:
            t = _SPARK_META[f.type]
            if f.name not in df.columns:
                if f.primary_key or not f.enable_null:
                    raise ValueError(f"field {f.name!r} is required")
                cols.append(F.lit(_NULL_DEFAULT[f.type]).cast(t).alias(f.name))
                continue
            c = F.col(f.name).cast(t)
            if f.primary_key or not f.enable_null:
                c = F.coalesce(
                    c, F.raise_error(f"field {f.name!r} may not be null").cast(t)
                )
            else:
                c = F.coalesce(c, F.lit(_NULL_DEFAULT[f.type]).cast(t))
            cols.append(c.alias(f.name))

        prepared = df.select(
            *cols, *[F.col(vc).cast(T.ArrayType(T.DoubleType())).alias(vc) for vc in vcols]
        )
        for vc in vcols:
            vd = F.col(vc)
            ok = (F.size(vd) == m.dim) & ~F.exists(
                vd, lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf")))
            )
            guarded = F.coalesce(
                F.when(ok, vd),
                F.raise_error(f"vector {vc!r}: missing, wrong dim, or NaN/Inf").cast(
                    T.ArrayType(T.DoubleType())
                ),
            )
            prepared = prepared.withColumn(vc, guarded)
            if m.distance == "cosine":
                # normalize-at-write so cosine ≡ |1-dot| at query time
                # (edge/none_vectorstore.go:95-97); quantize AFTER
                # normalizing, like the reference
                norm = F.sqrt(
                    F.aggregate(F.col(vc), F.lit(0.0), lambda a, x: a + x * x)
                )
                prepared = prepared.withColumn("_nrm", norm).withColumn(
                    vc,
                    F.when(
                        F.col("_nrm") > 0,
                        F.transform(F.col(vc), lambda x: x / F.col("_nrm")),
                    ).otherwise(F.col(vc)),
                ).drop("_nrm")
            vf = F.transform(F.col(vc), lambda x: x.cast("float"))
            prepared = prepared.withColumn(
                vc, quantize(m.quantization, vf) if m.quantization != "none" else vf
            )

        prepared = prepared.withColumn(
            _COMMIT, F.lit(m.next_commit) + F.monotonically_increasing_id()
        )
        m.next_commit += 1 << 45  # block above any partitionId<<33 offset
        pk = design.primary_key
        if dedupe_batch:
            from pyspark.sql import Window

            w = Window.partitionBy(pk).orderBy(F.col(_COMMIT).desc())
            prepared = (
                prepared.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        order = [f.name for f in design.fields] + (
            [] if any(f.type == "vector" for f in design.fields) else [_VEC]
        )
        new = prepared.select(*order, _COMMIT).localCheckpoint(eager=True)
        n = new.count()
        # no broadcast hint: the batch may be any size — AQE picks the
        # join strategy from the materialized checkpoint stats
        survivors = self._view.join(new.select(pk), on=pk, how="left_anti")
        self._view = survivors.unionByName(new.select(survivors.columns))
        self._track_upsert(new)
        self._dirty = True
        return n

    def delete_where(self, filter_ast: dict[str, Any]) -> None:
        """Equality/range-filter delete (edge Index(DELETE)). The
        delete key is strictly validated first — unknown index or
        type-mismatched literal raises (dropKeyAnalyzer intended
        semantics), unlike query filters which coerce."""
        validate_delete_key(self._view, filter_ast)
        pred = compile_filter(self._view, filter_ast)
        self._view = self._view.filter(~pred)
        if self._pending is not None:
            self._pending = self._pending.filter(
                ~compile_filter(self._pending, filter_ast)
            )
        self._delete_asts.append(filter_ast)
        self._dirty = True

    # -- queries ------------------------------------------------------

    def _dequantized(self) -> DataFrame:
        """Current view with vector columns restored to float32 arrays
        (the reference's decompress-then-float32-similarity contract,
        edge/f16_quantization.go:35-45)."""
        df = self._view
        if self.manifest.quantization != "none":
            for vc in self._vector_cols():
                df = df.withColumn(vc, dequantize(self.manifest.quantization, vc))
        return df

    def df(self) -> DataFrame:
        """Current state as a DataFrame (metadata + float32 vectors)."""
        return self._dequantized().drop(_COMMIT)

    def search(
        self,
        query: list[float],
        *,
        filter_ast: dict[str, Any] | None = None,
        vector_field: str | None = None,
        limit: int = 10,
        offset: int = 0,
        nprobe: int | None = None,
        refine: int | None = None,
    ) -> DataFrame:
        """Filtered FLAT KNN over the collection (edge Search path).

        ``layout="blocks"`` collections serve searches — filtered or
        not — from the packed block index written at flush: one BLAS
        matvec per block file through the node-local mmap spool, k
        rows per block moved. A metadata filter is evaluated against
        the per-block packed payload (which carries every metadata
        column) right before the distance kernel, the same
        scan-the-packed-store-restricted-to-candidates shape as the
        reference's filtered search
        (``edge/none_vectorstore.go:182-253``). Falls back to the row
        scan only when unflushed DML makes the index stale.

        ``nprobe`` (ivf/ivfpq layouts only) overrides the manifest's
        probe count per query — the standard IVF recall/latency dial:
        probing every list makes the search exact, fewer lists trade
        recall for a proportionally smaller scan.

        ``refine`` (ivfpq layout only) overrides the manifest's
        ``ivfpq_refine``: the top ``refine`` ADC candidates are
        re-scored with the exact distance from the snapshot vectors
        (B·refine rows), so ``dist`` is exact; ``refine=0`` serves
        the ADC approximation directly (no vector access at all —
        the M-bytes-per-row cost profile end to end).
        """
        m = self.manifest
        qv = validate_vector(m.dim, query)
        vcols = self._vector_cols()
        vc = vector_field or (vcols[0] if len(vcols) == 1 else None)
        if vc is None or vc not in vcols:
            raise ValueError(f"vector_field must be one of {vcols}")
        if (
            m.layout == "blocks"
            and not self._dirty
            and os.path.isdir(self._blocks_dir(vc))
        ):
            return self._search_blocks(
                qv, vc, limit=limit, offset=offset, filter_ast=filter_ast
            )
        if m.layout == "ivf" and not self._dirty and self._ivf_ready(vc):
            return self._search_ivf(
                qv, vc, limit=limit, offset=offset, filter_ast=filter_ast,
                nprobe=nprobe,
            )
        if m.layout == "ivfpq" and not self._dirty and self._ivf_ready(vc):
            return self._search_ivfpq(
                qv, vc, limit=limit, offset=offset, filter_ast=filter_ast,
                nprobe=nprobe, refine=refine,
            )
        df = self._dequantized()
        if filter_ast is not None:
            df = df.filter(compile_filter(df, filter_ast))
        if m.distance == "cosine":
            # stored vectors are unit; |1 - dot| on a normalized query
            qv = self._normalize_query(qv)
            dist = F.abs(
                F.lit(1.0)
                - F.aggregate(
                    F.zip_with(
                        F.col(vc).cast("array<double>"),
                        lit_double_array(qv),
                        lambda x, y: x * y,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            )
        else:
            dist = vector_distance(m.distance, F.col(vc), qv)
        scored = df.withColumn("dist", dist)
        top = _paginate_topk(scored, limit, offset, m.index_design.primary_key)
        out = top.withColumn("score", score_expr(m.distance, F.col("dist"))).drop(_COMMIT)
        if m.layout in ("blocks", "ivf", "ivfpq"):
            # keep the schema identical to the fast path regardless of
            # which path served the call (dirty state / filter present):
            # index-served results never carry the stored vector columns
            out = out.drop(*vcols)
        return out

    @staticmethod
    def _normalize_query(qv: list[float]) -> list[float]:
        """Unit-normalize a cosine query in float64 (zero-norm guard).

        The norm is a SEQUENTIAL left-to-right sum (not numpy pairwise)
        so a SQL oracle's ``sqrt(list_dot_product(q, q))`` — also a
        sequential fold — reproduces it bit-for-bit; that exactness is
        what lets the quantized-KNN oracles replay f16/bf16/f8 rounding
        on identical inputs."""
        acc = 0.0
        for x in qv:
            acc += float(x) * float(x)
        n = math.sqrt(acc)
        return [float(x) / n for x in qv] if n else [float(x) for x in qv]

    def _block_scan_plumbing(self, filter_ast):
        """Shared plumbing for every packed-index scan: the payload
        schema (all metadata columns), the compiled block-local mask
        (or None), and the tombstones argument (or None when no delta
        has been flushed). One definition so the single, grouped, and
        batched paths can never drift apart."""
        payload_schema = T.StructType(
            [
                f for f in self._storage_schema()
                if f.name not in self._vector_cols() and f.name != _COMMIT
            ]
        )
        payload_filter = None
        if filter_ast is not None:
            from coltt_spark.filters import compile_filter_mask

            payload_filter = compile_filter_mask(payload_schema, filter_ast)
        tomb = self._tombstones_dir()
        return payload_schema, payload_filter, (tomb if os.path.isdir(tomb) else None)

    def _search_blocks(
        self,
        qv: list[float],
        vc: str,
        *,
        limit: int,
        offset: int,
        filter_ast: dict[str, Any] | None = None,
    ) -> DataFrame:
        """Serve a KNN from the written block index: top-(offset+limit)
        ``(_commit_id, dist)`` from the block scan (only file paths and
        k rows per task cross any boundary), then a broadcast join of
        those ≤ offset+limit winners back to the snapshot for metadata
        — and the winners come back WITH their metadata (packed as a
        per-block payload), so the whole search is ONE lazy job: scan
        → per-file top-k rows → TakeOrderedAndProject merge. Results
        carry metadata + dist + score but not the stored vector, like
        the reference's search response. A ``filter_ast`` compiles to
        a vectorized payload mask evaluated block-locally before the
        top-k (filters.compile_filter_mask) — the fast layout serves
        filtered searches too."""
        from coltt_spark.operators.blocks import block_index_scan

        m = self.manifest
        if m.distance == "cosine":
            qv = self._normalize_query(qv)
        payload_schema, payload_filter, tomb = self._block_scan_plumbing(filter_ast)
        # cosine collections normalize at write, so the packed scan
        # scores |1 - dot| like the row path (stored norms are NOT
        # re-applied — quantized rows would otherwise drift from the
        # row path's contract)
        local = block_index_scan(
            self.spark,
            self._blocks_dir(vc),
            qv,
            dim=m.dim,
            k=offset + limit,
            distance="cosine_unit" if m.distance == "cosine" else m.distance,
            dtype=m.block_dtype,
            payload_schema=payload_schema,
            id_alias=_COMMIT,  # payload may carry a user column named "id"
            payload_filter=payload_filter,
            tombstones=tomb,
        )
        paged = _paginate_topk(local.drop(_COMMIT), limit, offset, m.index_design.primary_key)
        return paged.withColumn("score", score_expr(m.distance, F.col("dist")))

    def search_grouped(
        self,
        qv: list[float],
        group_by: str,
        *,
        vector_field: str | None = None,
        limit: int = 10,
        per_group: int = 1,
        filter_ast: dict[str, Any] | None = None,
        nprobe: int | None = None,
    ) -> DataFrame:
        """Grouped KNN — the ``group_by`` search surface modern vector
        DBs expose for diversified results: per distinct value of
        ``group_by``, keep only the nearest ``per_group`` rows, then
        return the global top-``limit`` of the survivors (so no group
        dominates the page).

        Scale shape: on a clean ``layout="blocks"`` collection the
        per-GROUP top-``per_group`` is taken inside each packed block
        (group values ride in the payload — one matvec per file, ≤
        groups·per_group rows out per file), then one window keyed by
        the group merges block-local winners. Other layouts/states
        scan the row view: distance + ONE window partitioned by the
        group key (a keyed shuffle — never a global sort; group keys
        are metadata values, far coarser than rows), then a
        TakeOrdered final cut over the ≤ groups·per_group survivors.

        ``nprobe`` (clean ivf layouts only): by DEFAULT grouped is a
        SET contract — one winner per group value — so every inverted
        list is scanned (exact; the win is the packed scan). Passing
        ``nprobe`` opts into the APPROXIMATE variant: only the query's
        ``nprobe`` nearest lists are scanned, so a group whose nearest
        members all live in unprobed lists is dropped and a group's
        winner may be a farther member — the result is exactly the
        exact semantics applied to the probed subset. Use it when
        group coverage matters less than latency at very large
        ``n_centroids``."""
        from pyspark.sql import Window

        m = self.manifest
        qv = validate_vector(m.dim, qv)
        vcols = self._vector_cols()
        vc = vector_field or (vcols[0] if len(vcols) == 1 else None)
        if vc is None or vc not in vcols:
            raise ValueError(f"vector_field must be one of {vcols}")
        pk = m.index_design.primary_key
        meta_names = [
            f.name for f in self._storage_schema()
            if f.name not in vcols and f.name != _COMMIT
        ]
        if group_by not in meta_names:
            raise KeyError(f"group_by references unknown metadata column {group_by!r}")
        if (
            m.layout == "blocks"
            and not self._dirty
            and os.path.isdir(self._blocks_dir(vc))
        ):
            return self._search_grouped_blocks(
                qv, vc, group_by,
                limit=limit, per_group=per_group, filter_ast=filter_ast,
            )
        if m.layout == "ivf" and not self._dirty and self._ivf_ready(vc):
            from coltt_spark.operators.blocks import ivf_files, ivf_probe_centroids

            if nprobe is None:
                probes: Sequence[int] = range(m.ivf_centroids)
            else:
                Cn = np.load(os.path.join(self._ivf_dir(vc), "centroids.npy"))
                probes = ivf_probe_centroids(Cn, qv, nprobe)
            return self._search_grouped_blocks(
                qv, vc, group_by,
                limit=limit, per_group=per_group, filter_ast=filter_ast,
                files=ivf_files(
                    os.path.join(self._ivf_dir(vc), "blocks"), probes
                ),
            )
        df = self._dequantized()
        if filter_ast is not None:
            df = df.filter(compile_filter(df, filter_ast))
        if m.distance == "cosine":
            qv = self._normalize_query(qv)
            dist = vector_distance("cosine_unit", F.col(vc), qv)
        else:
            dist = vector_distance(m.distance, F.col(vc), qv)
        scored = df.withColumn("dist", dist)
        w = Window.partitionBy(group_by).orderBy(F.col("dist").asc(), F.col(pk).asc())
        ranked = (
            scored.withColumn("_gr", F.row_number().over(w))
            .filter(F.col("_gr") <= per_group)
            .drop("_gr")
        )
        top = ranked.orderBy(F.col("dist").asc(), F.col(pk).asc()).limit(limit)
        out = top.withColumn("score", score_expr(m.distance, F.col("dist"))).drop(_COMMIT)
        if m.layout in ("blocks", "ivf", "ivfpq"):
            out = out.drop(*vcols)
        return out

    def search_radius(
        self,
        qv: list[float],
        radius: float,
        *,
        vector_field: str | None = None,
        filter_ast: dict[str, Any] | None = None,
        nprobe: int | None = None,
    ) -> DataFrame:
        """Radius query through the collection: every row with
        ``dist ≤ radius`` (unbounded result set — the caller filters
        or aggregates downstream). A pure narrow filter over the scan:
        no window, no top-k state, survives any corpus size. Cosine
        collections score ``|1 - dot|`` on normalize-at-write vectors
        like every other read path.

        Clean packed layouts serve the radius from the block index:
        one matvec per file through the spool, only the in-ball rows
        move. By DEFAULT an ivf collection scans EVERY inverted
        list's files — a probe subset would silently miss qualifying
        rows, so radius stays exact and the win is the packed scan,
        not pruning. Passing ``nprobe`` opts into the APPROXIMATE
        variant: only the query's ``nprobe`` nearest lists are
        scanned, so in-ball rows living in unprobed lists are missed
        — the result is exactly the exact semantics applied to the
        probed subset (every returned row still genuinely satisfies
        ``dist ≤ radius``). Use it when the ball is known to be small
        relative to the list granularity at very large
        ``n_centroids``."""
        m = self.manifest
        qv = validate_vector(m.dim, qv)
        vcols = self._vector_cols()
        vc = vector_field or (vcols[0] if len(vcols) == 1 else None)
        if vc is None or vc not in vcols:
            raise ValueError(f"vector_field must be one of {vcols}")
        packed_dir = None
        if not self._dirty:
            if m.layout == "blocks" and os.path.isdir(self._blocks_dir(vc)):
                packed_dir, packed_files = self._blocks_dir(vc), None
            elif m.layout == "ivf" and self._ivf_ready(vc):
                from coltt_spark.operators.blocks import ivf_files, ivf_probe_centroids

                if nprobe is None:
                    probes: Sequence[int] = range(m.ivf_centroids)
                else:
                    Cn = np.load(os.path.join(self._ivf_dir(vc), "centroids.npy"))
                    probes = ivf_probe_centroids(Cn, qv, nprobe)
                packed_dir = ""
                packed_files = ivf_files(
                    os.path.join(self._ivf_dir(vc), "blocks"), probes
                )
        if packed_dir is not None:
            from coltt_spark.operators.blocks import block_index_scan

            if m.distance == "cosine":
                qv = self._normalize_query(qv)
            payload_schema, payload_filter, tomb = self._block_scan_plumbing(
                filter_ast
            )
            local = block_index_scan(
                self.spark,
                packed_dir or None,
                qv,
                dim=m.dim,
                distance="cosine_unit" if m.distance == "cosine" else m.distance,
                dtype=m.block_dtype,
                payload_schema=payload_schema,
                id_alias=_COMMIT,
                payload_filter=payload_filter,
                tombstones=tomb,
                files=packed_files,
                radius=float(radius),
            )
            return local.drop(_COMMIT).withColumn(
                "score", score_expr(m.distance, F.col("dist"))
            )
        df = self._dequantized()
        if filter_ast is not None:
            df = df.filter(compile_filter(df, filter_ast))
        if m.distance == "cosine":
            qv = self._normalize_query(qv)
            dist = vector_distance("cosine_unit", F.col(vc), qv)
        else:
            dist = vector_distance(m.distance, F.col(vc), qv)
        out = (
            df.withColumn("dist", dist)
            .filter(F.col("dist") <= F.lit(float(radius)))
            .withColumn("score", score_expr(m.distance, F.col("dist")))
            .drop(_COMMIT)
        )
        if m.layout in ("blocks", "ivf", "ivfpq"):
            out = out.drop(*vcols)
        return out

    def search_hybrid_text(
        self,
        text_index,
        query_text: str,
        query_vector: list[float],
        *,
        vector_field: str | None = None,
        filter_ast: dict[str, Any] | None = None,
        candidates: int = 50,
        top_k: int = 10,
    ) -> DataFrame:
        """Product-level lexical + vector hybrid: this collection's
        (optionally filtered) KNN candidates fused with a
        :class:`coltt_spark.textindex.TextIndex`'s BM25 candidates by
        reciprocal-rank fusion, joined on the primary key. Returns
        (pk, bm25_rank, vec_rank, rrf_score) with rank 0 = absent
        from that list — the modern vector-DB "hybrid search" the
        reference's filter ∩ candidates hybrid stops short of.

        Scale: both candidate generators are the verified serving
        shapes (packed-block KNN; term-pruned postings BM25), each
        emitting ``candidates`` rows; fusion touches 2·K rows.
        """
        from coltt_spark.operators.fulltext import _ranked, rrf_fuse

        pk = self.manifest.index_design.primary_key
        vec = self.search(
            query_vector,
            vector_field=vector_field,
            filter_ast=filter_ast,
            limit=candidates,
        )
        vec_ranked = _ranked(vec, pk, F.col("dist").asc(), candidates)
        # raw scores: rank by the unrounded double so display-rounding
        # ties cannot reshuffle ranks vs the oracle-verified ad-hoc
        # fusion
        lex = text_index.search(query_text, top_k=candidates, raw_scores=True)
        if text_index.id_col != pk:
            lex = lex.withColumnRenamed(text_index.id_col, pk)
        lex_type = dict(lex.dtypes)[pk]
        vec_type = dict(vec.dtypes)[pk]
        if lex_type != vec_type:
            # a silent type coercion would NULL the join keys and
            # degenerate the fusion into two disjoint lists
            raise ValueError(
                f"search_hybrid_text: text index id type {lex_type!r} != "
                f"collection pk type {vec_type!r} — build the index with "
                f"ids cast to the collection's primary-key type"
            )
        lex_ranked = _ranked(lex, pk, F.col("score").desc(), candidates)
        fused = rrf_fuse([lex_ranked, vec_ranked], pk, top_k=top_k)
        return fused.select(
            F.col(pk),
            F.coalesce(F.col("rank_0"), F.lit(0)).alias("bm25_rank"),
            F.coalesce(F.col("rank_1"), F.lit(0)).alias("vec_rank"),
            F.round("rrf_score", 4).alias("rrf_score"),
        )

    def search_hybrid_text_batch(
        self,
        text_index,
        queries: dict[int, tuple[str, list[float]]],
        *,
        vector_field: str | None = None,
        filter_ast: dict[str, Any] | None = None,
        candidates: int = 50,
        top_k: int = 10,
    ) -> DataFrame:
        """Batched hybrid serving: B (query_text, query_vector) pairs
        answered together — the vector legs ride ONE
        :meth:`search_batch` job over the union of probed lists, the
        lexical legs ONE pruned postings read
        (``TextIndex.search_batch``), and fusion is the per-query RRF
        fold (:func:`~coltt_spark.operators.fulltext.rrf_fuse_batch`).
        Returns (query_id, pk, bm25_rank, vec_rank, rrf_score);
        batch ≡ sequential :meth:`search_hybrid_text` is pinned by
        tests/test_fulltext.py."""
        from coltt_spark.operators.fulltext import _ranked_batch, rrf_fuse_batch

        pk = self.manifest.index_design.primary_key
        vec = self.search_batch(
            {int(i): v for i, (_t, v) in queries.items()},
            vector_field=vector_field,
            filter_ast=filter_ast,
            limit=candidates,
        )
        vec_ranked = _ranked_batch(vec, pk, F.col("dist").asc(), candidates)
        lex = text_index.search_batch(
            {int(i): t for i, (t, _v) in queries.items()},
            k=candidates,
            raw_scores=True,
        )
        if text_index.id_col != pk:
            lex = lex.withColumnRenamed(text_index.id_col, pk)
        lex_type = dict(lex.dtypes)[pk]
        vec_type = dict(vec.dtypes)[pk]
        if lex_type != vec_type:
            raise ValueError(
                f"search_hybrid_text_batch: text index id type {lex_type!r} "
                f"!= collection pk type {vec_type!r} — build the index with "
                f"ids cast to the collection's primary-key type"
            )
        lex_ranked = _ranked_batch(lex, pk, F.col("score").desc(), candidates)
        fused = rrf_fuse_batch([lex_ranked, vec_ranked], pk, top_k=top_k)
        return fused.select(
            "query_id",
            F.col(pk),
            F.coalesce(F.col("rank_0"), F.lit(0)).alias("bm25_rank"),
            F.coalesce(F.col("rank_1"), F.lit(0)).alias("vec_rank"),
            F.round("rrf_score", 4).alias("rrf_score"),
        )

    def _search_grouped_blocks(
        self,
        qv: list[float],
        vc: str,
        group_by: str,
        *,
        limit: int,
        per_group: int,
        filter_ast: dict[str, Any] | None,
        files: list[str] | None = None,
    ) -> DataFrame:
        """Grouped KNN from the packed index: each file emits its
        per-group top-``per_group`` (group values decoded from the
        packed payload, filter applied as the usual block-local mask),
        one window keyed by the group merges file-local winners, then
        a TakeOrdered final cut — the block layout's cost shape held
        under diversification. ``files`` points the scan at an ivf
        layout's per-centroid block files (all lists — grouped is a
        set contract, see search_grouped)."""
        from pyspark.sql import Window

        from coltt_spark.operators.blocks import block_index_scan

        m = self.manifest
        if m.distance == "cosine":
            qv = self._normalize_query(qv)
        payload_schema, payload_filter, tomb = self._block_scan_plumbing(filter_ast)
        local = block_index_scan(
            self.spark,
            None if files is not None else self._blocks_dir(vc),
            qv,
            files=files,
            dim=m.dim,
            distance="cosine_unit" if m.distance == "cosine" else m.distance,
            dtype=m.block_dtype,
            payload_schema=payload_schema,
            id_alias=_COMMIT,
            payload_filter=payload_filter,
            tombstones=tomb,
            group_col=group_by,
            per_group=per_group,
        )
        pk = m.index_design.primary_key
        w = Window.partitionBy(group_by).orderBy(F.col("dist").asc(), F.col(pk).asc())
        ranked = (
            local.withColumn("_gr", F.row_number().over(w))
            .filter(F.col("_gr") <= per_group)
            .drop("_gr")
        )
        top = ranked.orderBy(F.col("dist").asc(), F.col(pk).asc()).limit(limit)
        return top.withColumn("score", score_expr(m.distance, F.col("dist"))).drop(
            _COMMIT
        )

    def search_batch(
        self,
        queries: dict[int, list[float]],
        *,
        vector_field: str | None = None,
        limit: int = 10,
        filter_ast: dict[str, Any] | None = None,
        nprobe: int | None = None,
        refine: int | None = None,
    ) -> DataFrame:
        """Bulk KNN: answer all B queries in ONE job — the
        embed-a-batch / answer-a-batch serving shape whose per-query
        cost amortizes toward memory bandwidth (bench: ~0.02 s/query
        at B=64 over 1M×64, vs ~0.3 s single). Returns (query_id,
        metadata…, dist, score), top-``limit`` per query.

        On a clean ``layout="blocks"`` collection this is one
        ``X @ Qᵀ`` BLAS matmul per block file through the node-local
        spool; only B·k winner rows leave the scan, and metadata comes
        from a broadcast join of those winners back to the
        (vector-pruned) snapshot. A clean ``layout="ivf"`` collection
        answers the batch with one broadcast-probes join over the
        union of probed partitions (each query reranks only its own
        ``nprobe`` lists; metadata rides in the index). Other
        layouts/states fall back to one exact scan with the query set
        broadcast (same semantics, row-layout cost).

        ``filter_ast`` restricts every query of the batch to the
        matching rows on whatever path serves it: a block-local
        payload mask on the packed index, a pushed predicate on the
        pruned IVF scan (metadata rides in the index), or a plain
        pushed filter on the fallback scan.
        """
        m = self.manifest
        qvs = {int(i): validate_vector(m.dim, v) for i, v in queries.items()}
        if m.distance == "cosine":
            qvs = {i: self._normalize_query(v) for i, v in qvs.items()}
        vcols = self._vector_cols()
        vc = vector_field or (vcols[0] if len(vcols) == 1 else None)
        if vc is None or vc not in vcols:
            raise ValueError(f"vector_field must be one of {vcols}")
        pk = m.index_design.primary_key
        if m.layout == "ivf" and not self._dirty and self._ivf_ready(vc):
            # batched probe over the packed inverted lists: ONE job
            # scans the union of every query's probed lists, and each
            # file is scored only for the queries whose probe set
            # includes its list (file_query_ids), so every query
            # reranks exactly its own nprobe lists — then the B·k
            # winners join back to the snapshot for metadata and the
            # (dist, pk) re-rank, like the blocks batch path
            from coltt_spark.operators.blocks import (
                block_index_topk_batch,
                ivf_files,
                ivf_probe_centroids,
            )

            Cn = np.load(os.path.join(self._ivf_dir(vc), "centroids.npy"))
            blocks_dir = os.path.join(self._ivf_dir(vc), "blocks")
            np_ = m.ivf_nprobe if nprobe is None else nprobe
            probes_by_q = {
                qid: ivf_probe_centroids(Cn, v, np_) for qid, v in qvs.items()
            }
            # list each probed centroid's directory ONCE for the batch
            files_by_c = {
                c: ivf_files(blocks_dir, [c])
                for c in {c for cs in probes_by_q.values() for c in cs}
            }
            file_query_ids: dict[str, list[int]] = {}
            for qid, cs in probes_by_q.items():
                for c in cs:
                    for f in files_by_c[c]:
                        file_query_ids.setdefault(f, []).append(int(qid))
            _, payload_filter, tomb = self._block_scan_plumbing(filter_ast)
            winners = block_index_topk_batch(
                self.spark,
                None,
                qvs,
                dim=m.dim,
                k=limit,
                distance="cosine_unit" if m.distance == "cosine" else m.distance,
                dtype=m.block_dtype,
                tombstones=tomb,
                payload_filter=payload_filter,
                files=sorted(file_query_ids),
                file_query_ids=file_query_ids,
            ).withColumnRenamed("id", _COMMIT)
            meta = self._view.drop(*vcols)
            joined = F.broadcast(winners).join(meta, on=_COMMIT).drop(_COMMIT)
            from pyspark.sql import Window

            wb = Window.partitionBy("query_id").orderBy(
                F.col("dist").asc(), F.col(pk).asc()
            )
            out = (
                joined.withColumn("_rn", F.row_number().over(wb))
                .filter(F.col("_rn") <= limit)
                .drop("_rn")
            )
            return out.withColumn("score", score_expr(m.distance, F.col("dist")))
        if m.layout == "ivfpq" and not self._dirty and self._ivf_ready(vc):
            return self._search_batch_ivfpq(
                qvs, vc, limit=limit, filter_ast=filter_ast,
                nprobe=nprobe, refine=refine,
            )
        if refine is not None and m.layout != "ivfpq":
            raise ValueError(
                "refine is an ivfpq-layout dial; this collection serves "
                f"batches from the {m.layout!r} path (exact distances, "
                "nothing to refine)"
            )
        # (a dirty/not-ready ivfpq collection falls through to the
        # exact fallback scan below — distances are exact there, so a
        # caller-set refine is a no-op by construction)
        if (
            m.layout == "blocks"
            and not self._dirty
            and os.path.isdir(self._blocks_dir(vc))
        ):
            from coltt_spark.operators.blocks import block_index_topk_batch

            _, payload_filter, tomb = self._block_scan_plumbing(filter_ast)
            winners = block_index_topk_batch(
                self.spark,
                self._blocks_dir(vc),
                qvs,
                dim=m.dim,
                k=limit,
                distance="cosine_unit" if m.distance == "cosine" else m.distance,
                dtype=m.block_dtype,
                tombstones=tomb,
                payload_filter=payload_filter,
            ).withColumnRenamed("id", _COMMIT)
            meta = self._view.drop(*vcols)
            joined = F.broadcast(winners).join(meta, on=_COMMIT).drop(_COMMIT)
            # re-rank the B·k winner rows by (dist, pk): the scan's
            # surrogate-id tie-break need not match the primary key,
            # so boundary ties are resolved here, exactly like the
            # single-query path's _paginate_topk
            from pyspark.sql import Window

            wb = Window.partitionBy("query_id").orderBy(
                F.col("dist").asc(), F.col(pk).asc()
            )
            out = (
                joined.withColumn("_rn", F.row_number().over(wb))
                .filter(F.col("_rn") <= limit)
                .drop("_rn")
            )
        else:
            # one corpus scan for the whole batch: broadcast the B-row
            # query table, score the cross join, keep top-k per query
            # with a window partitioned by query_id — the brute_topk
            # shape (operators/ann.py). The corpus is read ONCE instead
            # of B times; the window shuffles n·B scored rows but never
            # a global sort (B partitions, each independently top-k'd).
            qrows = [(int(i), [float(x) for x in v]) for i, v in sorted(qvs.items())]
            qdf = self.spark.createDataFrame(
                qrows,
                T.StructType(
                    [
                        T.StructField("query_id", T.LongType(), False),
                        T.StructField("_qv", T.ArrayType(T.DoubleType()), False),
                    ]
                ),
            )
            from pyspark.sql import Window

            base = self._dequantized()
            if filter_ast is not None:
                base = base.filter(compile_filter(base, filter_ast))
            scored = (
                base
                .crossJoin(F.broadcast(qdf))
                .withColumn(
                    "dist",
                    vector_distance(
                        # normalize-at-write: |1 - dot| like every
                        # other read path (qvs are already normalized)
                        "cosine_unit" if m.distance == "cosine" else m.distance,
                        F.col(vc),
                        F.col("_qv"),
                    ),
                )
            )
            w = Window.partitionBy("query_id").orderBy(
                F.col("dist").asc(), F.col(pk).asc()
            )
            out = (
                scored.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= limit)
                .drop("_rn", "_qv", _COMMIT, *vcols)
            )
        return out.withColumn("score", score_expr(m.distance, F.col("dist")))

    def multi_search(
        self,
        fields: dict[str, dict[str, Any]],
        *,
        filter_ast: dict[str, Any] | None = None,
        limit: int = 10,
        offset: int = 0,
    ) -> DataFrame:
        """CFLAT weighted multi-vector fusion over named vector fields
        (experimental MultiVertexSearch; ratios must sum to 100)."""
        vcols = set(self._vector_cols())
        bad = set(fields) - vcols
        if bad:
            raise ValueError(f"unknown vector fields {sorted(bad)}; declared: {sorted(vcols)}")
        for spec in fields.values():
            validate_vector(self.manifest.dim, spec.get("query"))
        df = self._dequantized().drop(_COMMIT)
        if filter_ast is not None:
            df = df.filter(compile_filter(df, filter_ast))
        return multi_vector_search(
            df,
            fields,
            distance=self.manifest.distance,
            limit=limit,
            offset=offset,
            tie_break=self.manifest.index_design.primary_key,
        )

    def count(self) -> int:
        return self._view.count()

    # -- lifecycle ----------------------------------------------------

    def flush(self, *, compact: bool = False) -> None:
        """Materialize the in-memory view to a new snapshot version and
        atomically repoint the manifest (durability boundary, like
        coltt Flush → MinIO). For ``layout="blocks"`` collections this
        is also where vectors are packed into the block index — the
        Spark analogue of the reference rebuilding its packed shard
        store on Flush (``edge/none_vectorstore.go:129-180``): pack
        before the manifest repoint so readers only ever see a version
        whose index is complete.

        Blocks collections flush INCREMENTALLY once a base index
        exists: only rows new since the previous version are written
        and packed (delta files beside hardlinked base files, plus a
        tombstone list of superseded commit ids — the Iceberg/Delta
        manifest shape, realized with hardlinks on a local FS), so
        flush cost scales with the CHANGE, not the collection. The
        reference's per-write in-place store update
        (``edge/none_vectorstore.go:66-103``) amortizes the same way.
        ``compact=True`` (or :meth:`compact`) forces the full rewrite,
        folding deltas and dropping tombstones.

        IVF collections flush incrementally too, with the standard IVF
        delta discipline: centroids stay FIXED (they only move on an
        explicit compact/rebuild) and new rows are routed into the
        existing inverted lists (one broadcast-matmul assignment over
        the delta only), appended as new part files inside the probed
        partition layout; superseded index rows die via the same
        commit-id tombstone mask. When any inverted list's part-file
        fan-out has grown by ``ivf_max_list_files`` since the last
        full build (manifest knob, default 10, 0 disables), the flush
        AUTO-COMPACTS — full fold instead of append — so probe-time
        read amplification stays bounded without anyone remembering
        to call :meth:`compact`."""
        m = self.manifest
        old_v = m.version
        new_v = old_v + 1
        if m.layout == "blocks":
            idx_ready = all(
                os.path.isdir(self._blocks_dir(vc, old_v))
                for vc in self._vector_cols()
            )
        elif m.layout in ("ivf", "ivfpq"):
            idx_ready = all(
                self._ivf_ready(vc, old_v, strict=False)
                for vc in self._vector_cols()
            )
        else:
            idx_ready = False
        incremental = (
            idx_ready and not compact and os.path.isdir(self._data_dir(old_v))
        )
        if (
            incremental
            and m.layout in ("ivf", "ivfpq")
            and m.ivf_max_list_files > 0
            and any(
                self._ivf_worst_list_fanout(vc, old_v) - m.ivf_base_list_files
                >= m.ivf_max_list_files
                for vc in self._vector_cols()
            )
        ):
            # Auto-compaction: the delta layout's per-list file fan-out
            # grew past the manifest threshold since the last full
            # build, so this flush folds the whole collection instead
            # of appending — bounding probe-time read amplification the
            # way the reference's ticker-driven diskv merge does
            # (diskv/merge.go:40-181), except keyed on the observed
            # fan-out rather than wall clock. Threshold rationale: the
            # measured curve (SURVEY §8) drifts ~25% by ~20 files/list;
            # 10 keeps the drift under ~10% while amortizing the
            # rebuild over ~10 delta flushes.
            incremental = False
        if incremental:
            self._flush_delta(old_v, new_v)
        else:
            self._view.write.mode("overwrite").parquet(self._data_dir(new_v))
            if m.layout == "blocks":
                self._write_blocks(new_v)
            elif m.layout in ("ivf", "ivfpq"):
                if m.layout == "ivf":
                    self._write_ivf(new_v)
                else:
                    self._write_ivfpq(new_v)
                # record the fresh layout's fan-out — the baseline the
                # growth-triggered auto-compaction measures against
                m.ivf_base_list_files = max(
                    (self._ivf_worst_list_fanout(vc, new_v) for vc in self._vector_cols()),
                    default=0,
                )
        m.version = new_v
        self._write_manifest()
        self._view = self._read_version()
        self._dirty = False
        self._reset_pending()
        if not m.versioning:
            for old_dir in (
                self._data_dir(old_v),
                os.path.join(self.root, f"v{old_v}_blocks"),
                os.path.join(self.root, f"v{old_v}_ivf"),
                os.path.join(self.root, f"v{old_v}_tombstones"),
            ):
                if os.path.isdir(old_dir):
                    # hardlinked inodes survive in the new version
                    shutil.rmtree(old_dir)

    def compact(self) -> None:
        """Full rewrite: fold all delta files and tombstones into one
        clean snapshot + freshly packed index (the explicit compaction
        a delta-maintained collection runs off the serving path)."""
        self.flush(compact=True)

    def _flush_delta(self, old_v: int, new_v: int) -> None:
        """Incremental blocks flush. The new version is a MANIFEST
        over immutable files: hardlinks to every base data/index part
        (metadata-only ops — on an object store these would be file
        references in a table manifest) + freshly written delta parts
        + a cumulative tombstone table (commit ids superseded by
        upserts or removed by deletes). Readers subtract tombstones;
        the block scan masks them per file.

        Cost shape: delta rows come straight from the DML bookkeeping
        (:meth:`_track_upsert` — already checkpointed batches, no
        collection diff), and tombstones from ONE column-pruned pass
        over the base files (PK semi-join against the upserted-PK set
        + the recorded delete predicates; Catalyst prunes the scan to
        the referenced columns). Nothing re-reads, rewrites, or
        re-packs the unchanged bulk — flush work is O(change), the
        delta analogue of the reference's per-write in-place store
        update."""
        schema = self._storage_schema()
        pk = self.manifest.index_design.primary_key
        delta = (
            self._pending
            if self._pending is not None
            else self.spark.createDataFrame([], schema)
        ).localCheckpoint(eager=True)
        n_delta = delta.count()
        base = self.spark.read.schema(schema).parquet(self._data_dir(old_v))
        dead_parts = []
        if self._upserted_pks is not None:
            dead_parts.append(
                base.join(
                    F.broadcast(self._upserted_pks.distinct()), on=pk, how="left_semi"
                ).select(_COMMIT)
            )
        for ast in self._delete_asts:
            # a base row matching the predicate but whose pk was since
            # re-upserted is dead via the pk semi-join anyway, so
            # evaluating against base values (not view state) is safe
            dead_parts.append(base.filter(compile_filter(base, ast)).select(_COMMIT))
        old_tomb = self._tombstones_dir(old_v)
        if os.path.isdir(old_tomb):
            dead_parts.append(
                self.spark.read.schema(
                    T.StructType([T.StructField(_COMMIT, T.LongType(), False)])
                ).parquet(old_tomb)
            )
        if dead_parts:
            from functools import reduce

            dead = reduce(lambda a, b: a.unionByName(b), dead_parts).distinct()
        else:
            dead = self.spark.createDataFrame(
                [], T.StructType([T.StructField(_COMMIT, T.LongType(), False)])
            )
        delta.write.mode("overwrite").parquet(self._data_dir(new_v))
        _link_parts(self._data_dir(old_v), self._data_dir(new_v))
        dead.write.mode("overwrite").parquet(self._tombstones_dir(new_v))
        if self.manifest.layout == "ivf":
            self._flush_delta_ivf(old_v, new_v, delta, n_delta)
            return
        if self.manifest.layout == "ivfpq":
            self._flush_delta_ivfpq(old_v, new_v, delta, n_delta)
            return
        # pack ONLY the delta rows; base block files ride along as links
        from coltt_spark.operators.blocks import pack_blocks, write_block_index

        m = self.manifest
        df = delta
        if m.quantization != "none":
            for vc in self._vector_cols():
                df = df.withColumn(vc, dequantize(m.quantization, vc))
        meta_cols = [
            f.name for f in schema
            if f.name not in self._vector_cols() and f.name != _COMMIT
        ]
        n_files = max(1, min(
            self.spark.sparkContext.defaultParallelism,
            -(-n_delta // 32768),  # ceil — don't shatter a small delta
        ))
        for vc in self._vector_cols():
            blocks = pack_blocks(
                df.select(_COMMIT, *meta_cols, vc),
                id_col=_COMMIT,
                vec_col=vc,
                dim=m.dim,
                dtype=m.block_dtype,
                payload_cols=meta_cols,
            )
            write_block_index(blocks, self._blocks_dir(vc, new_v), n_files=n_files)
            _link_parts(self._blocks_dir(vc, old_v), self._blocks_dir(vc, new_v))

    def _flush_delta_ivf(
        self, old_v: int, new_v: int, delta: DataFrame, n_delta: int
    ) -> None:
        """Incremental IVF index maintenance: centroids are FIXED
        (loaded from the previous version — they only move on
        compact), delta rows are routed into the existing inverted
        lists with one broadcast-matmul assignment
        (:func:`coltt_spark.operators.ann.ivf_assign`), PACKED into
        per-list block files (``pack_blocks(group_col="centroid")``)
        and appended INSIDE the centroid-partitioned block layout, so
        probe-time path pruning keeps working unchanged. Base index
        files ride along as hardlinks; superseded rows are masked by
        the commit-id tombstones the shared delta flush just wrote.
        Flush work is O(delta), never O(collection)."""
        from coltt_spark.operators.ann import ivf_assign
        from coltt_spark.operators.blocks import pack_blocks

        m = self.manifest
        schema = self._storage_schema()
        df = delta
        if m.quantization != "none":
            for vc in self._vector_cols():
                df = df.withColumn(vc, dequantize(m.quantization, vc))
        pcols = [
            f.name for f in schema
            if f.name not in self._vector_cols() and f.name != _COMMIT
        ]
        n_files = max(1, min(
            self.spark.sparkContext.defaultParallelism,
            -(-max(n_delta, 1) // 32768),  # ceil — don't shatter a small delta
        ))
        for vc in self._vector_cols():
            old_dir = self._ivf_dir(vc, old_v)
            new_dir = self._ivf_dir(vc, new_v)
            Cn = np.load(os.path.join(old_dir, "centroids.npy"))
            assigned = ivf_assign(
                df.select(_COMMIT, vc), Cn, id_col=_COMMIT, vec_col=vc
            ).join(df.select(_COMMIT, *pcols), on=_COMMIT)
            blocks = pack_blocks(
                assigned.repartition(n_files, "centroid"),
                id_col=_COMMIT,
                vec_col=vc,
                dim=m.dim,
                dtype=m.block_dtype,
                payload_cols=pcols,
                group_col="centroid",
            )
            os.makedirs(os.path.join(new_dir, "blocks"), exist_ok=True)
            _link_tree(os.path.join(old_dir, "blocks"), os.path.join(new_dir, "blocks"))
            blocks.write.mode("append").partitionBy("centroid").parquet(
                os.path.join(new_dir, "blocks")
            )
            np.save(os.path.join(new_dir, "centroids.npy"), Cn)

    def versions(self) -> list[int]:
        """Snapshot versions currently retained on storage."""
        out = []
        for name in os.listdir(self.root):
            m = re.fullmatch(r"v(\d+)", name)
            if m and os.path.isdir(os.path.join(self.root, name)):
                out.append(int(m.group(1)))
        return sorted(out)

    def read_version(self, version: int) -> DataFrame:
        """Time-travel read of a retained snapshot version (edge v4
        ``versioning`` buckets keep prior object versions until the
        lifecycle job prunes them — ``edge/edge_helper.go:97-105``)."""
        if not os.path.isdir(self._data_dir(version)):
            raise ValueError(
                f"version {version} is not retained (have {self.versions()})"
            )
        df = self.spark.read.schema(self._storage_schema()).parquet(
            self._data_dir(version)
        )
        return self._minus_tombstones(df, self._tombstones_dir(version))

    def lifecycle_cleanup(self) -> None:
        """Prune every non-latest snapshot version — the Spark analogue
        of the reference's BucketLifeCycleJob → VersionCleanUp, which
        removes all non-latest object versions from a versioned bucket
        (``edge/edge_helper.go:97-105``,
        ``pkg/minio/bucket_handler.go:106-119``)."""
        cur = self.manifest.version
        for v in self.versions():
            if v != cur:
                for d in (
                    self._data_dir(v),
                    os.path.join(self.root, f"v{v}_blocks"),
                    os.path.join(self.root, f"v{v}_ivf"),
                    os.path.join(self.root, f"v{v}_tombstones"),
                ):
                    if os.path.isdir(d):
                        shutil.rmtree(d)

    def _write_blocks(self, version: int) -> None:
        """Pack each vector column of snapshot ``version`` into a
        written block index keyed by ``_commit_id`` (unique int64 per
        live row — the block store's surrogate id, joined back to the
        snapshot at query time to recover metadata/PK)."""
        from coltt_spark.operators.blocks import pack_blocks, write_block_index

        m = self.manifest
        df = self.spark.read.schema(self._storage_schema()).parquet(self._data_dir(version))
        if m.quantization != "none":
            for vc in self._vector_cols():
                df = df.withColumn(vc, dequantize(m.quantization, vc))
        meta_cols = [
            f.name for f in self._storage_schema()
            if f.name not in self._vector_cols() and f.name != _COMMIT
        ]
        for vc in self._vector_cols():
            blocks = pack_blocks(
                df.select(_COMMIT, *meta_cols, vc),
                id_col=_COMMIT,
                vec_col=vc,
                dim=m.dim,
                dtype=m.block_dtype,
                payload_cols=meta_cols,  # winners return metadata in-scan
            )
            write_block_index(blocks, self._blocks_dir(vc, version))

    def _write_ivf(self, version: int) -> None:
        """Build the IVF index for snapshot ``version``: deterministic
        md5-seeded centroids + Lloyd refinement (operators/ann.py),
        then each inverted list PACKED INTO BLOCK FILES under its own
        ``centroid=<c>/`` directory (``pack_blocks(group_col=
        "centroid")`` + ``partitionBy`` — no block spans two lists).
        A probe prunes by PATH (only the probed lists' files are ever
        opened — the Spark analogue of HNSW's sub-linear candidate
        generation, ``core/vectorindex/hnsw.go:243-278``) and scans
        them through the same node-local decoded-matrix spool as the
        ``blocks`` layout, so probe cost is (nprobe/n_centroids) of a
        packed full scan instead of a per-query Parquet array decode.
        Metadata + the primary key ride in each block's payload (and
        the commit id is the block row id), so probes serve filters
        and results with no second scan and delta flushes tombstone
        superseded rows by commit id. Centroids land beside the lists
        as ``centroids.npy``."""
        from coltt_spark.operators.ann import ivf_build
        from coltt_spark.operators.blocks import pack_blocks

        m = self.manifest
        df = self.spark.read.schema(self._storage_schema()).parquet(self._data_dir(version))
        if m.quantization != "none":
            for vc in self._vector_cols():
                df = df.withColumn(vc, dequantize(m.quantization, vc))
        pk = m.index_design.primary_key
        # payload = every non-vector field in STORAGE ORDER (pk
        # included) — must match _block_scan_plumbing's payload schema
        pcols = [
            f.name for f in self._storage_schema()
            if f.name not in self._vector_cols() and f.name != _COMMIT
        ]
        n_files = self.spark.sparkContext.defaultParallelism
        for vc in self._vector_cols():
            assigned, Cn = ivf_build(
                df.select(pk, vc),
                id_col=pk,
                vec_col=vc,
                n_centroids=m.ivf_centroids,
                kmeans_iters=m.ivf_kmeans_iters,
            )
            assigned = assigned.join(
                df.select(_COMMIT, *pcols), on=pk
            )
            blocks = pack_blocks(
                assigned.repartition(n_files, "centroid"),
                id_col=_COMMIT,
                vec_col=vc,
                dim=m.dim,
                dtype=m.block_dtype,
                payload_cols=pcols,
                group_col="centroid",
            )
            out = self._ivf_dir(vc, version)
            # lists under <dir>/blocks keep partition discovery away
            # from the centroids sidecar
            blocks.write.mode("overwrite").partitionBy("centroid").parquet(
                os.path.join(out, "blocks")
            )
            np.save(os.path.join(out, "centroids.npy"), Cn)

    def _search_ivf(
        self,
        qv: list[float],
        vc: str,
        *,
        limit: int,
        offset: int,
        nprobe: int | None = None,
        filter_ast: dict[str, Any] | None = None,
    ) -> DataFrame:
        """Serve an approximate KNN from the IVF index: rank centroids
        on the driver (k·dim floats), then scan ONLY the probed
        inverted lists' PACKED BLOCK FILES (path-pruned — unprobed
        lists' files are never opened) through the node-local spool,
        exact-reranking inside — the same one-matvec-per-file cost
        shape as the ``blocks`` layout, over (nprobe/n_centroids) of
        the corpus. Metadata lives in the block payload, so a metadata
        filter (HybridSearch's intended filter ∩ candidates semantics,
        ``core/core.go:760-839``) evaluates as a vectorized block-local
        mask and results come back without any second scan or join;
        delta-superseded rows are masked by the commit-id tombstones."""
        from coltt_spark.operators.blocks import (
            block_index_scan,
            ivf_files,
            ivf_probe_centroids,
        )

        m = self.manifest
        nprobe = m.ivf_nprobe if nprobe is None else nprobe
        if m.distance == "cosine":
            qv = self._normalize_query(qv)
        Cn = np.load(os.path.join(self._ivf_dir(vc), "centroids.npy"))
        probes = ivf_probe_centroids(Cn, qv, nprobe)
        files = ivf_files(os.path.join(self._ivf_dir(vc), "blocks"), probes)
        payload_schema, payload_filter, tomb = self._block_scan_plumbing(filter_ast)
        # normalize-at-write: index rows are unit for cosine — score
        # |1 - dot| exactly like the row path (uniform across layouts
        # even when quantization perturbs stored norms)
        local = block_index_scan(
            self.spark,
            None,
            qv,
            dim=m.dim,
            k=offset + limit,
            distance="cosine_unit" if m.distance == "cosine" else m.distance,
            dtype=m.block_dtype,
            payload_schema=payload_schema,
            id_alias=_COMMIT,
            payload_filter=payload_filter,
            tombstones=tomb,
            files=files,
        )
        paged = _paginate_topk(
            local.drop(_COMMIT), limit, offset, m.index_design.primary_key
        )
        return paged.withColumn("score", score_expr(m.distance, F.col("dist")))

    def _write_ivfpq(self, version: int) -> None:
        """Build the fused IVF-PQ (IVFADC) serving index for snapshot
        ``version`` — the collection-level form of
        :func:`coltt_spark.operators.pq.ivfpq_build` (Jégou et al.
        2011; the reference DECLARES PQ as a collection quantization
        and never implements it, ``idl/proto/v3/core.proto:105-112``):
        the coarse quantizer is the same md5-seeded, Lloyd-refined
        k-means as the ivf layout, PQ codebooks are trained on the
        RESIDUALS (stored vector − coarse centroid), and each row's M
        uint8 codes are packed into per-centroid block files through
        the very same machinery as the ivf layout (dim = M, dtype
        uint8, metadata in the payload) — so path pruning, payload
        filters, tombstones, and the node-local spool all apply
        unchanged while each row costs M BYTES instead of dim·4.
        Sidecars: ``centroids.npy`` (coarse) + ``book.npy`` (M, ks,
        dsub residual codebooks).

        Beside the code blocks, the EXACT vectors land as plain
        ``(commit id, vector)`` Parquet rows under ``vecs/centroid=<c>/``
        — the refined search's rerank source. Refine candidates are by
        construction members of the probed lists, so reranking needs
        only the probed lists' vector rows: path-pruned exactly like
        the code scan, the rerank reads nprobe/n_centroids of the
        vector bytes instead of joining against a full snapshot scan
        (the one plan that would equal a flat exhaustive scan's IO at
        100×, VERDICT r9 #2). Stored as array<double> of the SAME
        dequantized values the snapshot join used to produce, so the
        rerank's sequential-fold arithmetic — and therefore the SQL
        oracle — is unchanged to the bit."""
        from coltt_spark.operators.ann import ivf_build
        from coltt_spark.operators.blocks import pack_blocks
        from coltt_spark.operators.pq import _encode_udf, pq_train

        m = self.manifest
        if m.dim % m.pq_subspaces:
            raise ValueError(
                f"dim {m.dim} not divisible by pq_subspaces {m.pq_subspaces}"
            )
        df = self.spark.read.schema(self._storage_schema()).parquet(
            self._data_dir(version)
        )
        if m.quantization != "none":
            for vc in self._vector_cols():
                df = df.withColumn(vc, dequantize(m.quantization, vc))
        pk = m.index_design.primary_key
        pcols = [
            f.name for f in self._storage_schema()
            if f.name not in self._vector_cols() and f.name != _COMMIT
        ]
        n_files = self.spark.sparkContext.defaultParallelism
        for vc in self._vector_cols():
            assigned, Cn = ivf_build(
                df.select(pk, vc),
                id_col=pk,
                vec_col=vc,
                n_centroids=m.ivf_centroids,
                kmeans_iters=m.ivf_kmeans_iters,
            )
            resid = self._ivfpq_residuals(assigned, Cn, vc)
            if m.pq_opq:
                # OPQ (Ge et al. 2014): learn an orthogonal rotation on
                # a deterministic residual sample, then rotate-encode
                # every residual in the same Arrow pass. The coarse
                # quantizer, the vecs rerank tree, and the exact rerank
                # are untouched — distances are rotation-invariant.
                from coltt_spark.operators.pq import opq_sample, opq_train_np

                sample = opq_sample(resid, id_col=pk, vec_col="_rv")
                rot, book = opq_train_np(
                    sample, n_subspaces=m.pq_subspaces, n_codes=m.pq_codes
                )
            else:
                rot = None
                book = pq_train(
                    resid, id_col=pk, vec_col="_rv",
                    n_subspaces=m.pq_subspaces, n_codes=m.pq_codes,
                )
            codes = resid.select(
                pk,
                "centroid",
                _encode_udf(book, rotation=rot)(F.col("_rv")).alias("_codes"),
            ).join(df.select(_COMMIT, *pcols), on=pk)
            blocks = pack_blocks(
                codes.repartition(n_files, "centroid"),
                id_col=_COMMIT,
                vec_col="_codes",
                dim=m.pq_subspaces,
                dtype="uint8",
                payload_cols=pcols,
                group_col="centroid",
            )
            out = self._ivf_dir(vc, version)
            blocks.write.mode("overwrite").partitionBy("centroid").parquet(
                os.path.join(out, "blocks")
            )
            # exact-vector rerank rows, one file per inverted list
            # (repartition by centroid keeps each list in one writer)
            (
                assigned.select(pk, "centroid")
                .join(df.select(pk, _COMMIT, vc), on=pk)
                .select(
                    "centroid",
                    _COMMIT,
                    F.col(vc).cast("array<double>").alias(vc),
                )
                .repartition(n_files, "centroid")
                .write.mode("overwrite")
                .partitionBy("centroid")
                .parquet(os.path.join(out, "vecs"))
            )
            np.save(os.path.join(out, "centroids.npy"), Cn)
            np.save(os.path.join(out, "book.npy"), book)
            if rot is not None:
                np.save(os.path.join(out, "rotation.npy"), rot)

    def _ivfpq_residuals(
        self, assigned: DataFrame, Cn: np.ndarray, vc: str
    ) -> DataFrame:
        """(id, centroid, _rv): residual of each assigned stored
        vector against its coarse centroid — the quantity the PQ
        codebooks are trained on and encode (broadcast centroid join,
        residual in double)."""
        cent_df = self.spark.createDataFrame(
            [(int(i), [float(x) for x in Cn[i]]) for i in range(len(Cn))],
            T.StructType(
                [
                    T.StructField("centroid", T.IntegerType(), False),
                    T.StructField("_cv", T.ArrayType(T.DoubleType()), False),
                ]
            ),
        )
        keep = [c for c in assigned.columns if c not in (vc, "centroid")]
        return assigned.join(F.broadcast(cent_df), on="centroid").select(
            *keep,
            "centroid",
            F.zip_with(
                F.col(vc).cast("array<double>"), F.col("_cv"), lambda x, c: x - c
            ).alias("_rv"),
        )

    def _flush_delta_ivfpq(
        self, old_v: int, new_v: int, delta: DataFrame, n_delta: int
    ) -> None:
        """Incremental IVFADC maintenance — the same fixed-quantizer
        discipline as the ivf delta path, extended to the codebooks:
        coarse centroids AND residual codebooks are FIXED (loaded from
        the previous version — they only move on compact), delta rows
        are routed into the existing inverted lists, their residuals
        re-encoded against the FIXED book, and the resulting code
        blocks appended inside the centroid-partitioned layout. The
        delta rows' exact vectors append into the same-shaped
        ``vecs/centroid=<c>/`` rerank tree (base files hardlink
        across), so the refined search's path-pruned rerank keeps
        covering every live row; its per-list file fan-out grows in
        lockstep with the code blocks', so the same auto-compaction
        trigger bounds both. Base index files hardlink across;
        superseded rows die via the shared commit-id tombstones.
        Flush work is O(delta)."""
        from coltt_spark.operators.ann import ivf_assign
        from coltt_spark.operators.blocks import pack_blocks
        from coltt_spark.operators.pq import _encode_udf

        m = self.manifest
        schema = self._storage_schema()
        df = delta
        if m.quantization != "none":
            for vc in self._vector_cols():
                df = df.withColumn(vc, dequantize(m.quantization, vc))
        pcols = [
            f.name for f in schema
            if f.name not in self._vector_cols() and f.name != _COMMIT
        ]
        n_files = max(1, min(
            self.spark.sparkContext.defaultParallelism,
            -(-max(n_delta, 1) // 32768),  # ceil — don't shatter a small delta
        ))
        for vc in self._vector_cols():
            old_dir = self._ivf_dir(vc, old_v)
            new_dir = self._ivf_dir(vc, new_v)
            Cn = np.load(os.path.join(old_dir, "centroids.npy"))
            book = np.load(os.path.join(old_dir, "book.npy"))
            rot_path = os.path.join(old_dir, "rotation.npy")
            # the OPQ rotation is FROZEN alongside the codebooks (it
            # only moves on compact) — delta rows rotate-encode against
            # the same basis the base codes were trained in
            rot = np.load(rot_path) if os.path.isfile(rot_path) else None
            assigned = ivf_assign(
                df.select(_COMMIT, vc), Cn, id_col=_COMMIT, vec_col=vc
            )
            codes = self._ivfpq_residuals(assigned, Cn, vc).select(
                _COMMIT,
                "centroid",
                _encode_udf(book, rotation=rot)(F.col("_rv")).alias("_codes"),
            ).join(df.select(_COMMIT, *pcols), on=_COMMIT)
            blocks = pack_blocks(
                codes.repartition(n_files, "centroid"),
                id_col=_COMMIT,
                vec_col="_codes",
                dim=m.pq_subspaces,
                dtype="uint8",
                payload_cols=pcols,
                group_col="centroid",
            )
            os.makedirs(os.path.join(new_dir, "blocks"), exist_ok=True)
            _link_tree(os.path.join(old_dir, "blocks"), os.path.join(new_dir, "blocks"))
            blocks.write.mode("append").partitionBy("centroid").parquet(
                os.path.join(new_dir, "blocks")
            )
            if os.path.isdir(os.path.join(old_dir, "vecs")):
                os.makedirs(os.path.join(new_dir, "vecs"), exist_ok=True)
                _link_tree(
                    os.path.join(old_dir, "vecs"), os.path.join(new_dir, "vecs")
                )
                (
                    assigned.select(
                        "centroid",
                        _COMMIT,
                        F.col(vc).cast("array<double>").alias(vc),
                    )
                    .repartition(n_files, "centroid")
                    .write.mode("append")
                    .partitionBy("centroid")
                    .parquet(os.path.join(new_dir, "vecs"))
                )
            np.save(os.path.join(new_dir, "centroids.npy"), Cn)
            np.save(os.path.join(new_dir, "book.npy"), book)
            if rot is not None:
                np.save(os.path.join(new_dir, "rotation.npy"), rot)

    def _search_ivfpq(
        self,
        qv: list[float],
        vc: str,
        *,
        limit: int,
        offset: int,
        nprobe: int | None = None,
        refine: int | None = None,
        filter_ast: dict[str, Any] | None = None,
    ) -> DataFrame:
        """Serve a KNN from the IVFADC index: rank coarse centroids on
        the driver, build one residual LUT per probed list (the query
        residual differs per coarse centroid — the defining IVFADC
        detail), ADC-scan ONLY the probed lists' packed CODE files
        (path-pruned, M bytes per row, metadata filter as a block-local
        payload mask), cut to the top ``refine`` candidates by (adc,
        pk), and re-score them with the exact distance via ONE
        broadcast join of the ≤ refine winners against the PROBED
        LISTS' exact-vector rows (``vecs/centroid=<c>/`` written at
        flush — candidates are members of the probed lists by
        construction, so the rerank reads nprobe/n_centroids of the
        vector bytes, never a full snapshot scan; VERDICT r9 #2).
        ``refine=0`` skips the rerank and serves the ADC
        approximation — no vector data is touched at any point.

        Cosine collections run the whole funnel in the unit domain
        (normalize-at-write rows, normalized query): euclidean
        ordering over unit vectors is monotone with cosine, so the
        residual-euclidean ADC is the principled candidate generator
        and the rerank scores ``|1 − dot|`` exactly like every other
        layout's read path. All driver-side float math is
        sequential-fold double (LUTs, probe ranking) and the scan's
        ADC sum folds left-to-right over subspaces, so the registry
        oracle replays the ENTIRE pipeline in SQL
        (registry._collection_ivfpq_oracle)."""
        from coltt_spark.operators.blocks import (
            block_index_scan,
            ivf_files,
            ivf_probe_centroids,
        )

        m = self.manifest
        nprobe = m.ivf_nprobe if nprobe is None else nprobe
        refine = m.ivfpq_refine if refine is None else refine
        pk = m.index_design.primary_key
        if m.distance == "cosine":
            qv = self._normalize_query(qv)
        d = self._ivf_dir(vc)
        Cn = np.load(os.path.join(d, "centroids.npy"))
        book = np.load(os.path.join(d, "book.npy"))
        n_sub, ks, dsub = book.shape
        probes = ivf_probe_centroids(Cn, qv, nprobe)
        files = ivf_files(os.path.join(d, "blocks"), probes)
        # per-probed-centroid residual LUTs, sequential-fold double —
        # the same arithmetic ivfpq_topk uses and the oracle replays
        # (ivfpq_residual_luts vectorizes across codes but keeps the
        # ordinal fold order, so values are bit-identical to the old
        # per-element loop)
        from coltt_spark.operators.pq import ivfpq_residual_luts

        qrs = np.array(
            [[float(qv[j]) - float(Cn[c][j]) for j in range(len(qv))] for c in probes],
            dtype=np.float64,
        )
        rot_path = os.path.join(d, "rotation.npy")
        if os.path.isfile(rot_path):
            # OPQ index: codes encode the ROTATED residual, so the LUT
            # compares against the rotated query residual; the exact
            # rerank below stays in the raw space (rotation-invariant)
            qrs = qrs @ np.load(rot_path)
        lut_mat = ivfpq_residual_luts(qrs, book)
        luts: dict[int, list[float]] = {
            int(c): [float(x) for x in lut_mat[i]] for i, c in enumerate(probes)
        }
        payload_schema, payload_filter, tomb = self._block_scan_plumbing(filter_ast)
        k_local = (offset + limit) if not refine else max(refine, offset + limit)
        local = block_index_scan(
            self.spark,
            None,
            None,
            dim=n_sub,
            k=k_local,
            distance="adc",
            dtype="uint8",
            adc_luts=luts,
            payload_schema=payload_schema,
            id_alias=_COMMIT,
            payload_filter=payload_filter,
            tombstones=tomb,
            files=files,
        )
        if not refine:
            adc_only = local.drop(_COMMIT)
            if m.distance == "cosine":
                # the ADC scan estimates the residual EUCLIDEAN
                # distance; on unit vectors |1 − dot| = euclid²/2, so
                # map the estimate into the cosine domain (monotone —
                # the TakeOrdered ranking is unchanged) before
                # paginating/scoring: the refine dial must not flip
                # the dist/score scale between 0 and >0 (r9 review)
                adc_only = adc_only.withColumn(
                    "dist", F.col("dist") * F.col("dist") / F.lit(2.0)
                )
            paged = _paginate_topk(adc_only, limit, offset, pk)
            return paged.withColumn("score", score_expr(m.distance, F.col("dist")))
        # ADC funnel cut: deterministic (adc, pk) total order — pk is
        # unique, so orderBy().limit() (TakeOrderedAndProject, no
        # global window) is exactly the top-``refine`` the SQL oracle's
        # row_number() replay produces. Pagination past the refine
        # budget widens the cut (refine is a floor, not a truncation
        # of the caller's limit — r9 review)
        cand = (
            local.orderBy(F.col("dist").asc(), F.col(pk).asc())
            .limit(max(refine, offset + limit))
            .drop("dist")
        )
        # rerank source: the probed lists' exact-vector rows (same
        # dequantized values the snapshot holds, stored as double at
        # flush so the fold below is bit-identical to a snapshot join
        # and the SQL oracle's replay). Only probed centroid=<c>/
        # directories are ever opened — rerank IO is nprobe/n_centroids
        # of the vector data. Collections flushed before the rerank
        # tree existed fall back to the column-pruned snapshot join.
        vecs_root = os.path.join(d, "vecs")
        if os.path.isdir(vecs_root):
            vschema = T.StructType(
                [
                    T.StructField(_COMMIT, T.LongType(), False),
                    T.StructField(vc, T.ArrayType(T.DoubleType()), False),
                ]
            )
            vdirs = [
                p
                for p in (
                    os.path.join(vecs_root, f"centroid={c}") for c in probes
                )
                if os.path.isdir(p)
            ]
            vecs = (
                self.spark.read.schema(vschema).parquet(*vdirs)
                if vdirs
                else self.spark.createDataFrame([], vschema)
            ).select(_COMMIT, F.col(vc).alias("_v"))
        else:
            vecs = self._dequantized().select(_COMMIT, F.col(vc).alias("_v"))
        if m.distance == "cosine":
            exact = F.abs(
                F.lit(1.0)
                - F.aggregate(
                    F.zip_with(
                        F.col("_v").cast("array<double>"),
                        lit_double_array(qv),
                        lambda x, y: x * y,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            )
        else:
            exact = vector_distance(m.distance, F.col("_v"), qv)
        rescored = (
            vecs.join(F.broadcast(cand), on=_COMMIT)
            .withColumn("dist", exact)
            .drop("_v", _COMMIT)
            # same column order as every other packed serving path
            .select("dist", *[f.name for f in payload_schema])
        )
        paged = _paginate_topk(rescored, limit, offset, pk)
        return paged.withColumn("score", score_expr(m.distance, F.col("dist")))

    def _search_batch_ivfpq(
        self,
        qvs: dict[int, list[float]],
        vc: str,
        *,
        limit: int,
        filter_ast: dict[str, Any] | None = None,
        nprobe: int | None = None,
        refine: int | None = None,
    ) -> DataFrame:
        """Batched IVFADC serving: all B queries in ONE job over the
        union of their probed lists' packed CODE files. Per-(query,
        list) residual LUTs become one numpy batch build
        (:func:`~coltt_spark.operators.pq.ivfpq_residual_luts` — the
        oracle-matched sequential-over-ordinals fold, VERDICT r9 #3a)
        keyed ``(query_id, centroid)``; each file is ADC-scored only
        for the queries whose probe set includes its list
        (``file_query_ids``), exactly the ivf batch contract. The
        B·refine ADC candidates broadcast-join the vector-pruned
        snapshot for metadata + the primary key, are cut per query by
        (adc, pk) — the SAME deterministic order as the sequential
        path's refine cut — and exact-rerank against ONLY the probed
        lists' exact-vector files (``vecs/centroid=<c>/``), so batch
        results EQUAL a per-query loop of :meth:`search` row for row
        while the scan cost amortizes toward one pass over the probed
        code bytes."""
        from pyspark.sql import Window

        from coltt_spark.operators.blocks import (
            block_index_topk_batch,
            ivf_files,
            ivf_probe_centroids,
        )
        from coltt_spark.operators.pq import ivfpq_residual_luts

        m = self.manifest
        nprobe = m.ivf_nprobe if nprobe is None else nprobe
        refine = m.ivfpq_refine if refine is None else refine
        pk = m.index_design.primary_key
        d = self._ivf_dir(vc)
        Cn = np.load(os.path.join(d, "centroids.npy"))
        book = np.load(os.path.join(d, "book.npy"))
        probes_by_q = {
            int(qid): ivf_probe_centroids(Cn, v, nprobe) for qid, v in qvs.items()
        }
        pairs = [
            (qid, int(c))
            for qid, cs in sorted(probes_by_q.items())
            for c in cs
        ]
        qrs = np.array(
            [
                [float(qvs[qid][j]) - float(Cn[c][j]) for j in range(m.dim)]
                for qid, c in pairs
            ],
            dtype=np.float64,
        )
        rot_path = os.path.join(d, "rotation.npy")
        if os.path.isfile(rot_path):
            # OPQ: rotate the whole (query, list) residual batch once
            qrs = qrs @ np.load(rot_path)
        lut_mat = ivfpq_residual_luts(qrs, book)
        adc_luts = {pair: lut_mat[i] for i, pair in enumerate(pairs)}
        blocks_dir = os.path.join(d, "blocks")
        files_by_c = {
            c: ivf_files(blocks_dir, [c])
            for c in {c for cs in probes_by_q.values() for c in cs}
        }
        file_query_ids: dict[str, list[int]] = {}
        for qid, cs in probes_by_q.items():
            for c in cs:
                for f in files_by_c[c]:
                    file_query_ids.setdefault(f, []).append(int(qid))
        _, payload_filter, tomb = self._block_scan_plumbing(filter_ast)
        k_local = max(refine, limit) if refine else limit
        winners = block_index_topk_batch(
            self.spark,
            None,
            qvs,
            dim=m.pq_subspaces,
            k=k_local,
            distance="adc",
            dtype="uint8",
            tombstones=tomb,
            payload_filter=payload_filter,
            files=sorted(file_query_ids),
            file_query_ids=file_query_ids,
            adc_luts=adc_luts,
        ).withColumnRenamed("id", _COMMIT)
        meta = self._view.drop(*self._vector_cols())
        joined = F.broadcast(winners).join(meta, on=_COMMIT)
        wb = Window.partitionBy("query_id").orderBy(
            F.col("dist").asc(), F.col(pk).asc()
        )
        if not refine:
            if m.distance == "cosine":
                # residual-euclidean estimate → cosine domain, exactly
                # like the sequential ADC-only path (monotone)
                joined = joined.withColumn(
                    "dist", F.col("dist") * F.col("dist") / F.lit(2.0)
                )
            out = (
                joined.withColumn("_rn", F.row_number().over(wb))
                .filter(F.col("_rn") <= limit)
                .drop("_rn", _COMMIT)
            )
            return out.withColumn("score", score_expr(m.distance, F.col("dist")))
        cand = (
            joined.withColumn("_rn", F.row_number().over(wb))
            .filter(F.col("_rn") <= max(refine, limit))
            .drop("_rn", "dist")
        )
        vecs_root = os.path.join(d, "vecs")
        if os.path.isdir(vecs_root):
            vschema = T.StructType(
                [
                    T.StructField(_COMMIT, T.LongType(), False),
                    T.StructField(vc, T.ArrayType(T.DoubleType()), False),
                ]
            )
            vdirs = [
                p
                for p in (
                    os.path.join(vecs_root, f"centroid={c}")
                    for c in sorted({c for cs in probes_by_q.values() for c in cs})
                )
                if os.path.isdir(p)
            ]
            vecs = (
                self.spark.read.schema(vschema).parquet(*vdirs)
                if vdirs
                else self.spark.createDataFrame([], vschema)
            ).select(_COMMIT, F.col(vc).alias("_v"))
        else:
            vecs = self._dequantized().select(_COMMIT, F.col(vc).alias("_v"))
        qdf = self.spark.createDataFrame(
            [(int(i), [float(x) for x in v]) for i, v in sorted(qvs.items())],
            T.StructType(
                [
                    T.StructField("query_id", T.LongType(), False),
                    T.StructField("_qv", T.ArrayType(T.DoubleType()), False),
                ]
            ),
        )
        rescored = (
            vecs.join(F.broadcast(cand), on=_COMMIT)
            .join(F.broadcast(qdf), on="query_id")
            .withColumn(
                "dist",
                vector_distance(
                    # normalize-at-write: |1 − dot| on unit rows, like
                    # every other read path (qvs already normalized)
                    "cosine_unit" if m.distance == "cosine" else m.distance,
                    F.col("_v"),
                    F.col("_qv"),
                ),
            )
            .drop("_v", "_qv", _COMMIT)
        )
        out = (
            rescored.withColumn("_rn", F.row_number().over(wb))
            .filter(F.col("_rn") <= limit)
            .drop("_rn")
        )
        return out.withColumn("score", score_expr(m.distance, F.col("dist")))

    def load(self) -> None:
        """Pin the collection in memory (LoadCollection ⇔ cache)."""
        self._view = self._view.cache()
        self._cached = True

    def release(self) -> None:
        """Persist then evict (ReleaseCollection semantics)."""
        self.flush()
        if self._cached:
            self._view.unpersist()
            self._cached = False

    def info(self) -> dict[str, Any]:
        return {**self.manifest.to_json(), "rows": self.count(), "loaded": self._cached}


class Catalog:
    """Warehouse of collections (CreateCollection / GetCollection /
    DeleteCollection ⇔ directory + manifest lifecycle)."""

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)
        self._open: dict[str, Collection] = {}

    def _root(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def create_collection(
        self,
        name: str,
        *,
        dim: int,
        distance: str = "cosine",
        quantization: str = "none",
        fields: list | None = None,
        layout: str = "rows",
        block_dtype: str = "float32",
        versioning: bool = False,
        ivf_centroids: int = 16,
        ivf_nprobe: int = 4,
        ivf_kmeans_iters: int = 1,
        ivf_max_list_files: int = 10,
        pq_subspaces: int = 8,
        pq_codes: int = 16,
        ivfpq_refine: int = 50,
        opq: bool = False,
    ) -> Collection:
        if distance not in DISTANCES:
            raise ValueError(f"distance must be one of {DISTANCES}")
        if quantization not in QUANTIZATIONS:
            raise ValueError(f"quantization must be one of {QUANTIZATIONS}")
        if quantization == "bq" and dim % 8:
            raise ValueError(f"bq quantization requires dim % 8 == 0, got dim={dim}")
        if layout not in LAYOUTS:
            raise ValueError(f"layout must be one of {LAYOUTS}")
        if layout == "ivfpq" and dim % pq_subspaces:
            raise ValueError(
                f"ivfpq layout requires dim % pq_subspaces == 0, got "
                f"dim={dim}, pq_subspaces={pq_subspaces}"
            )
        if opq and layout != "ivfpq":
            raise ValueError(
                "opq=True is an ivfpq-layout dial (an OPQ rotation only "
                f"affects PQ subspace encoding), got layout={layout!r}"
            )
        if layout == "ivfpq" and not 2 <= pq_codes <= 256:
            # codes are packed as uint8 — a bigger codebook would wrap
            # silently at pack time and ADC-score with wrong LUT rows
            raise ValueError(
                f"ivfpq layout requires 2 <= pq_codes <= 256 (codes are "
                f"stored as uint8), got pq_codes={pq_codes}"
            )
        root = self._root(name)
        if os.path.exists(root):
            raise ValueError(f"collection {name!r} already exists")
        design = IndexDesign(fields or [])
        manifest = Manifest(
            name, dim, distance, quantization, design, version=0,
            layout=layout, block_dtype=block_dtype, versioning=versioning,
            ivf_centroids=ivf_centroids, ivf_nprobe=ivf_nprobe,
            ivf_kmeans_iters=ivf_kmeans_iters,
            ivf_max_list_files=ivf_max_list_files,
            pq_subspaces=pq_subspaces, pq_codes=pq_codes,
            ivfpq_refine=ivfpq_refine, pq_opq=opq,
        )
        os.makedirs(root)
        coll = Collection.__new__(Collection)
        coll.spark, coll.root, coll.manifest, coll._cached = self.spark, root, manifest, False
        coll._dirty = False
        coll._reset_pending()
        # seed v0 with an empty snapshot so reads always succeed
        empty = self.spark.createDataFrame([], coll._storage_schema())
        empty.write.mode("overwrite").parquet(coll._data_dir(0))
        coll._write_manifest()
        coll._view = coll._read_version()
        self._open[name] = coll
        return coll

    def get_collection(self, name: str) -> Collection:
        if name in self._open:
            return self._open[name]
        root = self._root(name)
        path = os.path.join(root, "manifest.json")
        if not os.path.exists(path):
            raise KeyError(f"collection {name!r} does not exist")
        with open(path) as f:
            manifest = Manifest.from_json(json.load(f))
        coll = Collection(self.spark, root, manifest)
        self._open[name] = coll
        return coll

    def drop_collection(self, name: str) -> None:
        self._open.pop(name, None)
        root = self._root(name)
        if not os.path.isdir(root):
            raise KeyError(f"collection {name!r} does not exist")
        shutil.rmtree(root)

    def list_collections(self) -> list[str]:
        return sorted(
            d
            for d in os.listdir(self.warehouse)
            if os.path.isfile(os.path.join(self.warehouse, d, "manifest.json"))
        )
