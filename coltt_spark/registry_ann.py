"""ANN section of the query registry."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coltt_spark.operators.ann import brute_topk, ivf_topk, lsh_topk
from coltt_spark.sources.tables import load_table

_DD_COS = (
    "abs(1.0 - list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))))"
)


def _queries_from_embeddings(spark: SparkSession, sf_dir: str, ids=(0, 1, 2)):
    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.filter(F.col("vec_id").isin(*ids)).select("vec_id", "embedding").collect()
    return {int(r["vec_id"]): list(r["embedding"]) for r in rows}


def _ann_exact(strategy: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        res = brute_topk(
            emb,
            _queries_from_embeddings(spark, sf_dir),
            id_col="vec_id",
            vec_col="embedding",
            k=5,
            distance="cosine",
            strategy=strategy,
        )
        return res.select("query_id", "vec_id", F.round("dist", 4).alias("dist"))

    return q


_ORACLE_ANN_EXACT = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id IN (0, 1, 2)
),
d AS (
  SELECT q.query_id, e.vec_id,
         {_DD_COS.format(a="e.embedding::DOUBLE[]", b="q.qv")} AS dist
  FROM embeddings e, q
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id ASC) AS rn
  FROM d
)
SELECT query_id, vec_id, round(dist, 4) AS dist FROM r WHERE rn <= 5
"""


def _lsh_oracle(*, dim: int = 64, nbits: int = 6, n_tables: int = 6,
                seed: int = 42, k: int = 5) -> str:
    """Value-check the ENTIRE LSH pipeline in SQL: the hyperplanes are
    seed-deterministic, so they inline as literals (n_tables·nbits
    rows of DOUBLE[dim]) and DuckDB reproduces signatures (strict
    ``dot > 0`` sign bits, little-endian packed per table), the ±1-bit
    multiprobe buckets, the (table, bucket) candidate equi-join, and
    the exact cosine rerank — the same treatment the MinHash oracle
    gets. Floating-point safe because sign bits only flip when a dot
    product sits within summation-order error of zero (never the case
    on the fixed test embeddings, |dot| ≫ 1e-12)."""
    from coltt_spark.operators.ann import lsh_planes

    rows = []
    for t in range(n_tables):
        pl = lsh_planes(dim, nbits, seed + t)
        for j in range(nbits):
            vec = ", ".join(repr(float(x)) for x in pl[j])
            rows.append(f"({t}, {j}, [{vec}]::DOUBLE[])")
    planes = ",\n    ".join(rows)
    probes_j = ", ".join(str(j) for j in range(nbits))
    return f"""
WITH planes(tbl, bit, pv) AS (VALUES
    {planes}
),
qs AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id IN (0, 1, 2)
),
csig AS (
  SELECT e.vec_id, p.tbl,
         SUM(CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.pv) > 0
             THEN (1::BIGINT << p.bit) ELSE 0 END) AS bucket
  FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id, p.tbl
),
qsig AS (
  SELECT q.query_id, p.tbl,
         SUM(CASE WHEN list_dot_product(q.qv, p.pv) > 0
             THEN (1::BIGINT << p.bit) ELSE 0 END) AS bucket
  FROM qs q CROSS JOIN planes p GROUP BY q.query_id, p.tbl
),
probes AS (
  SELECT query_id, tbl, bucket FROM qsig
  UNION ALL
  SELECT query_id, tbl, xor(bucket, (1::BIGINT << j.j)) AS bucket
  FROM qsig CROSS JOIN (SELECT unnest([{probes_j}]) AS j) j
),
cand AS (
  SELECT DISTINCT p.query_id, c.vec_id
  FROM csig c JOIN probes p ON c.tbl = p.tbl AND c.bucket = p.bucket
),
d AS (
  SELECT cand.query_id, cand.vec_id,
         {_DD_COS.format(a="e.embedding::DOUBLE[]", b="q.qv")} AS dist
  FROM cand
  JOIN embeddings e ON e.vec_id = cand.vec_id
  JOIN qs q ON q.query_id = cand.query_id
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id ASC) AS rn
  FROM d
)
SELECT query_id, vec_id, round(dist, 4) AS dist FROM r WHERE rn <= {k}
"""


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate KNN, value-checked end-to-end: the
    oracle (:func:`_lsh_oracle`) inlines the seed-deterministic
    hyperplanes as SQL literals and replays signatures → multiprobe →
    candidate join → exact rerank; recall vs exact is additionally
    asserted in tests/test_ann.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    res = lsh_topk(
        emb,
        _queries_from_embeddings(spark, sf_dir),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        nbits=6,
        n_tables=6,
    )
    return res.select("query_id", "vec_id", F.round("dist", 4).alias("dist"))


def _ivf_oracle(*, n_centroids: int = 16, nprobe: int = 4, k: int = 5) -> str:
    """Replay the ENTIRE IVF pipeline in SQL: the md5-derived
    (``hash60``) seed pick, seed normalization, one spherical-Lloyd
    round (assign by max normalized-dot → per-centroid mean of RAW
    vectors → renormalize, empty clusters keeping their seed), the
    final assignment against refined centroids, per-query ``nprobe``
    nearest lists, and the exact cosine rerank inside them.

    Floating-point parity: both engines do the heavy sums in double;
    numpy's pairwise/BLAS order differs from SQL's sequential fold
    only at ~1e-16, which can only flip an argmax/argsort when two
    candidates are equidistant to that precision — never the case on
    the fixed random embeddings. The output distances are computed
    from exact stored vectors, so values match bit-for-bit after
    ``round(4)``."""
    nrm = "greatest(sqrt(list_dot_product({v}, {v})), 1e-30)"
    unit = f"list_transform({{v}}, x -> x / {nrm})"
    return f"""
WITH h AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT AS hh
  FROM embeddings
),
nn AS (SELECT greatest(count(*) // {2 * n_centroids}, 1) AS step FROM embeddings),
seeds AS (
  SELECT vec_id, v, row_number() OVER (ORDER BY hh) - 1 AS cid
  FROM h, nn WHERE hh % step = 0
  ORDER BY hh LIMIT {n_centroids}
),
c0 AS (SELECT cid, {unit.format(v="v")} AS cv FROM seeds),
a0 AS (
  SELECT e.vec_id, e.v, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product({unit.format(v="e.v")}, c.cv) DESC, c.cid ASC) AS rn
  FROM h e CROSS JOIN c0 c
),
g AS (SELECT unnest(generate_series(1, (SELECT max(len(embedding)) FROM embeddings))) AS ord),
m0 AS (
  SELECT t.cid, g.ord, avg(t.v[g.ord]) AS mx
  FROM (SELECT cid, v FROM a0 WHERE rn = 1) t CROSS JOIN g
  GROUP BY t.cid, g.ord
),
c1m AS (SELECT cid, list(mx ORDER BY ord) AS mv FROM m0 GROUP BY cid),
c1 AS (
  SELECT c0.cid,
         COALESCE({unit.format(v="c1m.mv")}, c0.cv) AS cv
  FROM c0 LEFT JOIN c1m USING (cid)
),
a1 AS (
  SELECT e.vec_id, e.v, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product({unit.format(v="e.v")}, c.cv) DESC, c.cid ASC) AS rn
  FROM h e CROSS JOIN c1 c
),
qs AS (SELECT vec_id AS query_id, v AS qv FROM h WHERE vec_id IN (0, 1, 2)),
probes AS (
  SELECT q.query_id, c.cid,
         row_number() OVER (PARTITION BY q.query_id
             ORDER BY list_dot_product({unit.format(v="q.qv")}, c.cv) DESC, c.cid ASC) AS pr
  FROM qs q CROSS JOIN c1 c
),
cand AS (
  SELECT p.query_id, a.vec_id, a.v
  FROM (SELECT vec_id, v, cid FROM a1 WHERE rn = 1) a
  JOIN (SELECT query_id, cid FROM probes WHERE pr <= {nprobe}) p ON a.cid = p.cid
),
d AS (
  SELECT c.query_id, c.vec_id,
         {_DD_COS.format(a="c.v", b="q.qv")} AS dist
  FROM cand c JOIN qs q ON q.query_id = c.query_id
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id ASC) AS rn
  FROM d
)
SELECT query_id, vec_id, round(dist, 4) AS dist FROM r WHERE rn <= {k}
"""


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate KNN, value-checked end-to-end: the oracle
    (:func:`_ivf_oracle`) replays the md5-seeded centroid pick, one
    Lloyd round, probe selection, and exact rerank in SQL; recall vs
    exact is additionally asserted in tests/test_ann.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    res = ivf_topk(
        emb,
        _queries_from_embeddings(spark, sf_dir),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        n_centroids=16,
        nprobe=4,
    )
    return res.select("query_id", "vec_id", F.round("dist", 4).alias("dist"))


ANN_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "ann_topk_batch": _ann_exact("window"),
    "ann_topk_blas": _ann_exact("blas"),
    "ann_lsh": q_ann_lsh,
    "ann_ivf": q_ann_ivf,
}

ANN_ORACLES: dict[str, str] = {
    "ann_topk_batch": _ORACLE_ANN_EXACT,
    "ann_topk_blas": _ORACLE_ANN_EXACT,
    "ann_lsh": _lsh_oracle(),
    "ann_ivf": _ivf_oracle(),
}
