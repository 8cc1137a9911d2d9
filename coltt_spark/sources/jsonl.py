"""JSONL (newline-delimited JSON) sharded export / import — the
interchange format LLM training pipelines actually exchange corpora
in (one JSON object per line, directory of shard files).

Spark-first: ``df.write.partitionBy("shard").json`` IS the sharded
writer — each shard directory is written by the executors that own
its rows (co-located via one hash repartition on the shard column,
the same deterministic ``hash60(id) % n`` routing the reference's
FNV shard map uses, ``pkg/sharding/shard.go:34-47``). Reading back
takes an explicit schema so ingest is a single pass with no
inference scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coltt_spark.functions.text import hash60


def write_jsonl_shards(
    df: DataFrame, path: str, *, id_col: str, n_shards: int = 8,
    compression: str | None = None,
) -> None:
    """Write ``df`` as ``n_shards`` JSONL shard directories under
    ``path`` (``shard=K/part-*.json``). Deterministic routing:
    ``shard = hash60(id) % n_shards``, one repartition so every shard
    is written by the executor that owns it — no driver funneling,
    no post-hoc file moves.

    ``compression``: any Spark text codec (``gzip``, ``bzip2``,
    ``lz4``, ``snappy``; ``zstd`` where the Hadoop native codec is
    present) — public corpora ship as ``.jsonl.gz``/``.jsonl.zst``,
    and :func:`read_jsonl` reads the compressed tree back
    transparently (codec sniffed per file by extension, so mixed
    trees work). gzip files are not splittable — at 100 TB keep
    shards small enough that one file ≈ one task (more shards, or a
    splittable codec like bzip2, is the scale answer)."""
    out = df.withColumn(
        "shard", (hash60(F.col(id_col).cast("string")) % n_shards).cast("int")
    )
    writer = out.repartition(n_shards, "shard").write.mode("overwrite")
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.partitionBy("shard").json(path)


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Read a JSONL shard tree back with an explicit schema (single
    pass, no inference job); the ``shard`` partition column comes back
    as a readable column."""
    return spark.read.schema(schema).json(path)
