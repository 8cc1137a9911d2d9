"""Schemaless (core-v3) section of the query registry."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coltt_spark.schemaless import SchemalessCollection
from coltt_spark.sources.tables import load_table


def _docs_collection(spark: SparkSession, sf_dir: str) -> SchemalessCollection:
    """Documents as a schemaless collection: every metadata value
    auto-stringified; _id = insertion order (doc_id ascending)."""
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


def _emb_schemaless(spark: SparkSession, sf_dir: str) -> SchemalessCollection:
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
    "hybrid_search": q_hybrid_search,
}

SCHEMALESS_ORACLES: dict[str, str] = {
    "schemaless_pure_search": _ORACLE_SCHEMALESS_PURE,
    "hybrid_search": _ORACLE_HYBRID,
}
