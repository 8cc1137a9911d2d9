"""coltt_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the ``sjy-dv/coltt`` vector database,
re-expressed Spark-first.

The reference (``/root/reference``, Go) is a vector store: collections of
(primary-key, typed-metadata, float32-vector) records queried by
filtered top-K distance search. Here every operation compiles to a
declarative DataFrame plan over Parquet tables so Catalyst/Tungsten pick
the physical strategy: predicate pushdown replaces the roaring-bitmap
inverted index, ``TakeOrderedAndProject`` replaces the sharded
bounded-priority-queue scan, and Parquet/manifest-JSON replaces the
MinIO blob + diskv commit-log persistence.

Beyond reference parity the package adds the operators a large-scale
training-data pipeline needs: deduplication (exact / MinHash-LSH /
SimHash / n-gram Jaccard / embedding-cosine), approximate nearest
neighbor search, text analysis, multimodal binary-column plumbing, and
structured-streaming event processing.
"""

from coltt_spark.session import get_spark


def __getattr__(name):
    # lazy top-level API: importing the package must stay cheap (no
    # pyspark.sql plan modules pulled in until actually used)
    if name == "Catalog":
        from coltt_spark.catalog import Catalog

        return Catalog
    if name == "TextIndex":
        from coltt_spark.textindex import TextIndex

        return TextIndex
    if name in ("IndexField", "IndexDesign"):
        import coltt_spark.schema as _s

        return getattr(_s, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = ["get_spark", "Catalog", "TextIndex", "IndexField", "IndexDesign"]
__version__ = "0.1.0"
