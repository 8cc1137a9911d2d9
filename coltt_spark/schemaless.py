"""Schemaless collections — the reference's core-v3/edge-v2 surface.

Reference parity: core v3 accepts any metadata map and auto-indexes
every key as a string (``pkg/index/bitmap_index.go:86-97``,
UPDATE-LOG.md:222-231); records are keyed by an engine-assigned
snowflake ``_id`` (``core/core.go:398-469``). Operators: Insert,
Update (remove+reinsert, falls back to Insert if absent,
``core/core.go:471-564``), Delete by ``_id`` (``core/core.go:566-631``),
``PureSearch`` — equality-only all-AND map filter over stringified
values (``pkg/index/search.go:48-72``), ``FilterSearch`` (score 100,
``core/core.go:697-758``), ``VectorSearch`` (KNN), and ``HybridSearch``
— ANN top-(3k) candidates intersected with the filter
(``core/core.go:760-839``; the reference computes the intersection but
forgets to apply it — we implement the documented *intended*
semantics, SURVEY §2.4 note).

Spark mapping: ``metadata`` is a ``map<string,string>`` column;
equality filters compile to ``metadata['k'] = 'v'`` conjunctions that
Catalyst evaluates during the scan. No inverted index is materialized
(same trade as the typed catalog).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from coltt_spark.functions.vector import score as score_expr, vector_distance
from coltt_spark.schema import validate_vector

_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.LongType(), False),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("vector", T.ArrayType(T.FloatType()), False),
    ]
)


def stringify(value: Any) -> str:
    """Go-style stringification used by the core bitmap index: bools
    are true/false, integral floats collapse to ints."""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float) and value.is_integer():
        return str(int(value))
    return str(value)


class SchemalessCollection:
    """In-memory schemaless collection (persist via ``to_parquet`` /
    ``from_parquet`` — one snapshot, no version chain needed for the
    v3 surface)."""

    def __init__(self, spark: SparkSession, dim: int, distance: str = "cosine"):
        self.spark = spark
        self.dim = dim
        self.distance = distance
        self._next_id = 0
        self._view: DataFrame = spark.createDataFrame([], _SCHEMA)

    # -- DML -----------------------------------------------------------

    def insert(self, rows: list[dict[str, Any]]) -> list[int]:
        """Insert records ``{"metadata": {...}, "vector": [...]}``;
        returns assigned ids (snowflake-style monotonic)."""
        batch = []
        ids = []
        for row in rows:
            vec = validate_vector(self.dim, row.get("vector"))
            meta = {str(k): stringify(v) for k, v in (row.get("metadata") or {}).items()}
            batch.append((self._next_id, meta, vec))
            ids.append(self._next_id)
            self._next_id += 1
        new = self.spark.createDataFrame(batch, _SCHEMA)
        self._view = self._view.unionByName(new)
        return ids

    def insert_df(self, df: DataFrame, *, order_col: str | None = None) -> int:
        """Bulk DataFrame insert — no row touches the driver.

        ``df`` needs a ``metadata`` ``map<string,string>`` column
        (Go-style stringification is the caller's job in bulk — use
        ``cast("string")`` per value) and a ``vector`` array column.
        With ``order_col`` the assigned ``_id``\\ s are dense and
        sequential in that order (the reference's arrival-order ids;
        costs one global sort — fine for a bounded ingest batch).
        Without it, ids are sparse snowflake-like
        (``monotonically_increasing_id`` offset) — the 100 TB path.
        """
        from pyspark.sql import Window

        base = df.select(
            F.col("metadata").cast("map<string,string>").alias("metadata"),
            F.col("vector").cast(T.ArrayType(T.DoubleType())).alias("vector"),
            *([F.col(order_col).alias("_ord")] if order_col else []),
        )
        ok = (F.size(F.col("vector")) == self.dim) & ~F.exists(
            F.col("vector"), lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf")))
        )
        base = base.withColumn(
            "vector",
            F.coalesce(
                F.when(ok, F.col("vector")),
                F.raise_error("vector: missing, wrong dim, or NaN/Inf").cast(
                    T.ArrayType(T.DoubleType())
                ),
            ).cast(T.ArrayType(T.FloatType())),
        )
        if order_col is not None:
            # unpartitioned window over the INSERT BATCH (user-sized,
            # never the corpus) — sequential-id semantics per the
            # reference's insert contract; WindowExec's global-window
            # warning is expected and bounded here
            w = Window.orderBy("_ord")
            base = base.withColumn(
                "_id", F.row_number().over(w).cast("long") - 1 + F.lit(self._next_id)
            ).drop("_ord")
        else:
            base = base.withColumn(
                "_id", F.lit(self._next_id) + F.monotonically_increasing_id()
            )
        new = base.select("_id", "metadata", "vector").localCheckpoint(eager=True)
        n = new.count()
        self._next_id += n if order_col is not None else 1 << 45
        self._view = self._view.unionByName(new)
        return n

    def update(self, _id: int, row: dict[str, Any]) -> int:
        """Remove + reinsert under a fresh id; inserts if absent
        (core Update semantics, ``core/core.go:471-564``)."""
        self.delete(_id)
        return self.insert([row])[0]

    def delete(self, _id: int) -> None:
        """Delete by engine id (``core/core.go:566-631``)."""
        self._view = self._view.filter(F.col("_id") != _id)

    def delete_ids(self, ids: "list[int] | DataFrame") -> None:
        """Bulk Delete: drop every listed ``_id``. A DataFrame of ids
        anti-joins (broadcast — the delete set is small relative to
        the collection); a Python list compiles to an ``isin``
        predicate evaluated during the scan."""
        if isinstance(ids, DataFrame):
            self._view = self._view.join(
                F.broadcast(ids.select(F.col(ids.columns[0]).alias("_id"))),
                on="_id",
                how="left_anti",
            )
        else:
            self._view = self._view.filter(~F.col("_id").isin([int(i) for i in ids]))

    def update_df(self, df: DataFrame) -> int:
        """Bulk Update — the distributed form of core's
        remove-then-reinsert: drop the given ``_id``\\ s, reinsert the
        new (metadata, vector) rows under fresh ids assigned in
        old-id order (deterministic, so final state is
        oracle-checkable). ``df`` columns: ``_id, metadata, vector``.
        Returns the number of reinserted rows."""
        new = df.select(F.col("_id").alias("_old"), "metadata", "vector")
        self.delete_ids(new.select("_old"))
        return self.insert_df(new.select("metadata", "vector", "_old"), order_col="_old")

    # -- queries ---------------------------------------------------------

    def df(self) -> DataFrame:
        return self._view

    def _pure_pred(self, filters: dict[str, Any]):
        """Equality-only, all-AND map filter (PureSearch)."""
        pred = F.lit(True)
        for k, v in filters.items():
            pred = pred & (F.col("metadata").getItem(str(k)) == F.lit(stringify(v)))
        return pred

    def filter_search(self, filters: dict[str, Any]) -> DataFrame:
        """Metadata-only query, hardcoded score 100."""
        return self._view.filter(self._pure_pred(filters)).withColumn("score", F.lit(100.0))

    def vector_search(self, query: list[float], *, k: int = 10) -> DataFrame:
        qv = validate_vector(self.dim, query)
        scored = self._view.withColumn(
            "dist", vector_distance(self.distance, F.col("vector"), qv)
        )
        top = scored.orderBy(F.col("dist").asc(), F.col("_id").asc()).limit(k)
        return top.withColumn("score", score_expr(self.distance, F.col("dist")))

    def hybrid_search(
        self, query: list[float], filters: dict[str, Any], *, k: int = 10, expand: int = 3
    ) -> DataFrame:
        """Intended HybridSearch: ANN top-(expand·k) candidate set,
        intersected with the metadata filter, best k of the survivors.
        (Candidate-set-then-filter can return < k rows when the filter
        is selective — that is the reference's documented contract.)"""
        qv = validate_vector(self.dim, query)
        scored = self._view.withColumn(
            "dist", vector_distance(self.distance, F.col("vector"), qv)
        )
        cand = scored.orderBy(F.col("dist").asc(), F.col("_id").asc()).limit(expand * k)
        survivors = cand.filter(self._pure_pred(filters))
        top = survivors.orderBy(F.col("dist").asc(), F.col("_id").asc()).limit(k)
        return top.withColumn("score", score_expr(self.distance, F.col("dist")))

    # -- persistence -----------------------------------------------------

    def to_parquet(self, path: str) -> None:
        self._view.write.mode("overwrite").parquet(path)

    @classmethod
    def from_parquet(
        cls, spark: SparkSession, path: str, *, dim: int, distance: str = "cosine"
    ) -> SchemalessCollection:
        coll = cls(spark, dim, distance)
        coll._view = spark.read.schema(_SCHEMA).parquet(path)
        coll._next_id = (coll._view.agg(F.max("_id")).first()[0] or 0) + 1
        return coll
