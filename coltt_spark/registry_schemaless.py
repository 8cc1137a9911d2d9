"""Schemaless (core-v3) section of the query registry."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coltt_spark.schemaless import SchemalessCollection
from coltt_spark.sources.tables import load_table


#: cache of (materialized base view, next_id) per fixture — each call
#: still gets a FRESH collection object (DML in one query must not
#: leak into another), but the eager ingest checkpoint is shared
_SL_CACHE: dict[tuple[str, str], tuple] = {}


def _docs_collection(spark: SparkSession, sf_dir: str) -> SchemalessCollection:
    """Documents as a schemaless collection: every metadata value
    auto-stringified; _id = insertion order (doc_id ascending)."""
    if (sf_dir, "docs") not in _SL_CACHE:
        docs = load_table(spark, sf_dir, "documents")
        coll = SchemalessCollection(spark, dim=4, distance="euclidean")
        coll.insert_df(
            docs.select(
                F.create_map(
                    F.lit("lang"), F.col("lang"),
                    F.lit("source"), F.col("source"),
                    F.lit("n_chars"), F.col("n_chars").cast("long").cast("string"),
                ).alias("metadata"),
                F.array(*[(F.col("doc_id") % m).cast("double") for m in (7, 5, 3, 2)]).alias(
                    "vector"
                ),
                "doc_id",
            ),
            order_col="doc_id",
        )
        _SL_CACHE[(sf_dir, "docs")] = (coll._view, coll._next_id, 4)
    view, next_id, dim = _SL_CACHE[(sf_dir, "docs")]
    coll = SchemalessCollection(spark, dim=dim, distance="euclidean")
    coll._view, coll._next_id = view, next_id
    return coll


def q_schemaless_pure_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PureSearch: equality-only all-AND map filter over stringified
    values (int 128 matches because values stringify at write)."""
    coll = _docs_collection(spark, sf_dir)
    res = coll.filter_search({"lang": "en", "n_chars": 128})
    return res.select(
        "_id",
        F.col("metadata").getItem("lang").alias("lang"),
        F.col("metadata").getItem("source").alias("source"),
        "score",
    )


_ORACLE_SCHEMALESS_PURE = """
WITH numbered AS (
  SELECT CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS _id, lang, source, n_chars
  FROM documents
)
SELECT _id, lang, source, 100.0 AS score
FROM numbered WHERE lang = 'en' AND n_chars = 128
"""


def q_schemaless_update_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core Update/Delete final state (``core/core.go:471-631``): bulk
    delete of every ``_id ≡ 3 (mod 10)``, then bulk Update of every
    ``_id ≡ 4 (mod 10)`` — remove + reinsert under fresh sequential
    ids with ``lang`` rewritten to ``'xx'``. The returned final state
    (survivors ∪ reinserted rows) is fully deterministic, so the
    whole DML sequence is value-checked against the SQL oracle."""
    coll = _docs_collection(spark, sf_dir)
    view = coll.df()
    coll.delete_ids(view.filter(F.col("_id") % 10 == 3).select("_id"))
    updated = view.filter(F.col("_id") % 10 == 4).select(
        "_id",
        F.create_map(
            F.lit("lang"), F.lit("xx"),
            F.lit("source"), F.col("metadata").getItem("source"),
            F.lit("n_chars"), F.col("metadata").getItem("n_chars"),
        ).alias("metadata"),
        "vector",
    )
    coll.update_df(updated)
    return coll.df().select(
        "_id",
        F.col("metadata").getItem("lang").alias("lang"),
        F.col("metadata").getItem("source").alias("source"),
        F.col("metadata").getItem("n_chars").cast("long").alias("n_chars"),
    )


_ORACLE_SCHEMALESS_UPDATE_DELETE = """
WITH numbered AS (
  SELECT CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS _id, lang, source, n_chars
  FROM documents
),
survivors AS (
  SELECT _id, lang, source, CAST(n_chars AS BIGINT) AS n_chars
  FROM numbered WHERE _id % 10 <> 3 AND _id % 10 <> 4
),
updated AS (
  SELECT (SELECT count(*) FROM documents) + row_number() OVER (ORDER BY _id) - 1 AS _id,
         'xx' AS lang, source, CAST(n_chars AS BIGINT) AS n_chars
  FROM numbered WHERE _id % 10 = 4
)
SELECT CAST(_id AS BIGINT) AS _id, lang, source, n_chars FROM survivors
UNION ALL
SELECT CAST(_id AS BIGINT) AS _id, lang, source, n_chars FROM updated
"""


def _emb_schemaless(spark: SparkSession, sf_dir: str) -> SchemalessCollection:
    if (sf_dir, "emb") not in _SL_CACHE:
        emb = load_table(spark, sf_dir, "embeddings")
        dim = len(emb.select("embedding").first()["embedding"])
        coll = SchemalessCollection(spark, dim=dim, distance="euclidean")
        coll.insert_df(
            emb.select(
                F.create_map(
                    F.lit("label"), F.col("label").cast("long").cast("string")
                ).alias("metadata"),
                F.col("embedding").alias("vector"),
                "vec_id",
            ),
            order_col="vec_id",
        )
        _SL_CACHE[(sf_dir, "emb")] = (coll._view, coll._next_id, dim)
    view, next_id, dim = _SL_CACHE[(sf_dir, "emb")]
    coll = SchemalessCollection(spark, dim=dim, distance="euclidean")
    coll._view, coll._next_id = view, next_id
    return coll


def q_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intended HybridSearch semantics: euclidean top-30 candidates →
    metadata filter label=5 → best 10 survivors."""
    coll = _emb_schemaless(spark, sf_dir)
    qv = [
        float(x)
        for x in load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .first()["embedding"]
    ]
    res = coll.hybrid_search(qv, {"label": 5}, k=10, expand=3)
    return res.select(
        "_id",
        F.col("metadata").getItem("label").alias("label"),
        F.round("dist", 4).alias("dist"),
        F.round("score", 4).alias("score"),
    )


_ORACLE_HYBRID = """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
d AS (
  SELECT e.vec_id AS _id, CAST(e.label AS VARCHAR) AS label,
         sqrt(list_sum(list_transform(list_zip(e.embedding::DOUBLE[], q.qv),
              p -> (p[1] - p[2]) * (p[1] - p[2])))) AS dist
  FROM embeddings e, q
),
cand AS (SELECT * FROM d ORDER BY dist ASC, _id ASC LIMIT 30)
SELECT _id, label, round(dist, 4) AS dist,
       round(greatest(0.0, 100.0 - dist), 4) AS score
FROM cand WHERE label = '5'
ORDER BY dist ASC, _id ASC LIMIT 10
"""


SCHEMALESS_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "schemaless_pure_search": q_schemaless_pure_search,
    "schemaless_update_delete": q_schemaless_update_delete,
    "hybrid_search": q_hybrid_search,
}

SCHEMALESS_ORACLES: dict[str, str] = {
    "schemaless_pure_search": _ORACLE_SCHEMALESS_PURE,
    "schemaless_update_delete": _ORACLE_SCHEMALESS_UPDATE_DELETE,
    "hybrid_search": _ORACLE_HYBRID,
}
