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


def _kmeans_ctes(*, n_centroids: int = 16) -> str:
    """Shared SQL CTE prefix (``h`` … ``a1``) replaying the spherical
    k-means every IVF-shaped oracle builds on: the md5-derived
    (``hash60``) seed pick, seed normalization, one spherical-Lloyd
    round (assign by max normalized-dot → per-centroid mean of RAW
    vectors → renormalize, empty clusters keeping their seed), and the
    final assignment ``a1`` (rows where ``rn = 1``) against the
    refined centroids ``c1``. See :func:`_ivf_oracle` for the
    floating-point parity argument."""
    nrm = "greatest(sqrt(list_dot_product({v}, {v})), 1e-30)"
    unit = f"list_transform({{v}}, x -> x / {nrm})"
    return f"""h AS (
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
)"""


def _ivf_oracle(*, n_centroids: int = 16, nprobe: int = 4, k: int = 5) -> str:
    """Replay the ENTIRE IVF pipeline in SQL: the shared k-means
    prefix (:func:`_kmeans_ctes`), per-query ``nprobe`` nearest lists,
    and the exact cosine rerank inside them.

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
WITH {_kmeans_ctes(n_centroids=n_centroids)},
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


_DD_L2 = (
    "sqrt(list_sum(list_transform(list_zip({a}, {b}), "
    "p -> (p[1]-p[2])*(p[1]-p[2]))))"
)


def _bq_oracle(*, rerank: int = 50, k: int = 5) -> str:
    """Replay the BQ two-phase scan in SQL: the Hamming distance is
    the count of dimensions whose strict ``> 0`` sign bits differ
    (bit-packing is a layout detail — xor+popcount over packed words
    counts exactly these positions), top-``rerank`` per query by
    (hamming, id), exact cosine rerank inside. Signs are exact: the
    stored floats cast to DOUBLE unchanged, so both engines see the
    identical ``x > 0`` bit."""
    return f"""
WITH qs AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id IN (0, 1, 2)
),
hm AS (
  SELECT q.query_id, e.vec_id, e.embedding::DOUBLE[] AS v, q.qv,
         len(list_filter(list_zip(e.embedding::DOUBLE[], q.qv),
             p -> (p[1] > 0) != (p[2] > 0)))::BIGINT AS hamming
  FROM embeddings e CROSS JOIN qs q
),
r1 AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY hamming ASC, vec_id ASC) AS rn
  FROM hm
),
d AS (
  SELECT query_id, vec_id, hamming,
         {_DD_COS.format(a="v", b="qv")} AS dist
  FROM r1 WHERE rn <= {rerank}
),
r2 AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id ASC) AS rn
  FROM d
)
SELECT query_id, vec_id, hamming, round(dist, 4) AS dist FROM r2 WHERE rn <= {k}
"""


def q_ann_bq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized KNN (sign bits + Hamming + exact rerank) —
    the ``BQ`` member of the reference's Quantization enum
    (``idl/proto/v3/core.proto:105-112``, declared but never
    implemented there). Value-checked end-to-end by
    :func:`_bq_oracle`."""
    from coltt_spark.operators.pq import bq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    res = bq_topk(
        emb,
        _queries_from_embeddings(spark, sf_dir),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        rerank=50,
    )
    return res.select("query_id", "vec_id", "hamming", F.round("dist", 4).alias("dist"))


def _pq_oracle(
    *, n_subspaces: int = 8, n_codes: int = 16, refine: int = 50, k: int = 5
) -> str:
    """Replay the ENTIRE PQ pipeline in SQL: the md5 (``hash60``)
    hash-mod seed pick (same recipe as IVF), per-subspace slicing,
    one Lloyd round of plain L2 k-means per subspace (assign by min
    ordered-fold squared distance → per-(subspace, code, ordinal)
    mean, empty codes keeping their seed), re-encode, the per-query
    subspace LUT, the ADC sum in subspace order, the top-``refine``
    ADC cut, and the exact euclidean rerank. Same float-parity
    argument as :func:`_ivf_oracle`: heavy sums are double on both
    sides; avg-order drift (~1e-16) can only flip an argmin on exact
    ties, and the output distances are exact-vector euclidean after
    the refine phase, so values match after ``round(4)``."""
    m, ks = n_subspaces, n_codes
    dsub_sql = f"(len_d.dim // {m})"
    sq = (
        "list_sum(list_transform(list_zip({a}, {b}), "
        "p -> (p[1]-p[2])*(p[1]-p[2])))"
    )
    return f"""
WITH h AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT AS hh
  FROM embeddings
),
len_d AS (SELECT max(len(embedding)) AS dim FROM embeddings),
nn AS (SELECT greatest(count(*) // {2 * ks}, 1) AS step FROM embeddings),
seeds AS (
  SELECT v, row_number() OVER (ORDER BY hh) - 1 AS cid
  FROM h, nn WHERE hh % step = 0
  ORDER BY hh LIMIT {ks}
),
ms AS (SELECT unnest(generate_series(0, {m - 1})) AS m),
hs AS (
  SELECT h.vec_id, ms.m,
         h.v[ms.m * {dsub_sql} + 1 : (ms.m + 1) * {dsub_sql}] AS sv
  FROM h CROSS JOIN ms, len_d
),
b0 AS (
  SELECT s.cid, ms.m,
         s.v[ms.m * {dsub_sql} + 1 : (ms.m + 1) * {dsub_sql}] AS cv
  FROM seeds s CROSS JOIN ms, len_d
),
a0 AS (
  SELECT hs.vec_id, hs.m, b.cid, hs.sv,
         row_number() OVER (PARTITION BY hs.vec_id, hs.m
             ORDER BY {sq.format(a="hs.sv", b="b.cv")} ASC, b.cid ASC) AS rn
  FROM hs JOIN b0 b ON b.m = hs.m
),
g AS (SELECT unnest(generate_series(1, (SELECT dim // {m} FROM len_d))) AS ord),
m0 AS (
  SELECT t.m, t.cid, g.ord, avg(t.sv[g.ord]) AS mx
  FROM (SELECT m, cid, sv FROM a0 WHERE rn = 1) t CROSS JOIN g
  GROUP BY t.m, t.cid, g.ord
),
b1m AS (SELECT m, cid, list(mx ORDER BY ord) AS mv FROM m0 GROUP BY m, cid),
b1 AS (
  SELECT b0.m, b0.cid, COALESCE(b1m.mv, b0.cv) AS cv
  FROM b0 LEFT JOIN b1m ON b1m.m = b0.m AND b1m.cid = b0.cid
),
a1 AS (
  SELECT hs.vec_id, hs.m, b.cid,
         row_number() OVER (PARTITION BY hs.vec_id, hs.m
             ORDER BY {sq.format(a="hs.sv", b="b.cv")} ASC, b.cid ASC) AS rn
  FROM hs JOIN b1 b ON b.m = hs.m
),
qs AS (SELECT vec_id AS query_id, v AS qv FROM h WHERE vec_id IN (0, 1, 2)),
qsub AS (
  SELECT q.query_id, ms.m,
         q.qv[ms.m * {dsub_sql} + 1 : (ms.m + 1) * {dsub_sql}] AS qsv
  FROM qs q CROSS JOIN ms, len_d
),
lut AS (
  SELECT q.query_id, q.m, b.cid, {sq.format(a="q.qsv", b="b.cv")} AS d
  FROM qsub q JOIN b1 b ON b.m = q.m
),
adc AS (
  SELECT l.query_id, a.vec_id, sqrt(list_sum(list(l.d ORDER BY l.m))) AS dist
  FROM (SELECT vec_id, m, cid FROM a1 WHERE rn = 1) a
  JOIN lut l ON l.m = a.m AND l.cid = a.cid
  GROUP BY l.query_id, a.vec_id
),
r1 AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id ASC) AS rn
  FROM adc
),
refined AS (
  SELECT r.query_id, r.vec_id,
         {_DD_L2.format(a="e.embedding::DOUBLE[]", b="q.qv")} AS dist
  FROM r1 r
  JOIN embeddings e ON e.vec_id = r.vec_id
  JOIN qs q ON q.query_id = r.query_id
  WHERE r.rn <= {refine}
),
r2 AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id ASC) AS rn
  FROM refined
)
SELECT query_id, vec_id, round(dist, 4) AS dist FROM r2 WHERE rn <= {k}
"""


_PQ_BOOK_CACHE: dict = {}
_KMEANS_CACHE: dict = {}


def _kmeans_fixture(spark: SparkSession, sf_dir: str):
    """Shared deterministic k-means build over the embeddings table
    (n_clusters=16, one Lloyd round), cached + persisted per sf_dir —
    the serving pattern: cluster ONCE, run every curation query
    (occupancy, balanced sampling, SemDeDup, outlier pruning) against
    the same assignment. Returns (assigned DataFrame, centroid
    matrix)."""
    from coltt_spark.operators.ann import ivf_build

    if sf_dir not in _KMEANS_CACHE:
        emb = load_table(spark, sf_dir, "embeddings")
        assigned, Cn = ivf_build(
            emb, id_col="vec_id", vec_col="embedding", n_centroids=16, kmeans_iters=1
        )
        assigned = assigned.cache()
        assigned.count()  # materialize once
        _KMEANS_CACHE[sf_dir] = (assigned, Cn)
    return _KMEANS_CACHE[sf_dir]


def _pq_book(spark: SparkSession, sf_dir: str):
    """Deterministic PQ codebooks for the embeddings table, trained
    once per sf_dir (hash-mod seeds + one Lloyd round — the build a
    serving deployment amortizes across every query; bench counts it
    as fixture build)."""
    from coltt_spark.operators.pq import pq_train

    if sf_dir not in _PQ_BOOK_CACHE:
        emb = load_table(spark, sf_dir, "embeddings")
        _PQ_BOOK_CACHE[sf_dir] = pq_train(
            emb, id_col="vec_id", vec_col="embedding", n_subspaces=8, n_codes=16
        )
    return _PQ_BOOK_CACHE[sf_dir]


def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized KNN (per-subspace codebooks + ADC + exact
    refine) — the ``PQ`` member of the reference's Quantization enum
    (``idl/proto/v3/core.proto:105-112``, declared but never
    implemented there). Value-checked end-to-end by
    :func:`_pq_oracle`, which replays seed pick, per-subspace Lloyd,
    encode, LUT, ADC, and refine in SQL."""
    from coltt_spark.operators.pq import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    res = pq_topk(
        emb,
        _queries_from_embeddings(spark, sf_dir),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        n_subspaces=8,
        n_codes=16,
        refine=50,
        book=_pq_book(spark, sf_dir),
    )
    return res.select("query_id", "vec_id", F.round("dist", 4).alias("dist"))


def _ivfpq_oracle(
    *,
    n_centroids: int = 16,
    nprobe: int = 4,
    n_subspaces: int = 8,
    n_codes: int = 16,
    refine: int = 50,
    k: int = 5,
) -> str:
    """Replay the ENTIRE fused IVF-PQ (IVFADC) pipeline in SQL: the
    shared coarse spherical-k-means prefix (:func:`_kmeans_ctes`),
    per-row residuals against the refined coarse centroids, the PQ
    chain of :func:`_pq_oracle` re-derived ON THE RESIDUALS (hash-mod
    seed pick over the same ids, per-subspace slicing, one Lloyd
    round, re-encode), per-query ``nprobe`` probe order, the
    per-(query, probed-centroid) residual LUT — the query residual
    differs per coarse list, which is what distinguishes IVFADC from
    plain ADC — the ADC sum in subspace order restricted to probed
    lists, the top-``refine`` ADC cut, and the exact euclidean
    rerank. Same float-parity argument as :func:`_ivf_oracle` /
    :func:`_pq_oracle`: every heavy sum is a sequential double fold
    on both sides, avg-order drift (~1e-16) can only flip an argmin
    on exact ties, and the output distances are exact-vector
    euclidean after refine, so values match after ``round(4)``."""
    m, ks = n_subspaces, n_codes
    dsub_sql = f"(len_d.dim // {m})"
    sq = (
        "list_sum(list_transform(list_zip({a}, {b}), "
        "p -> (p[1]-p[2])*(p[1]-p[2])))"
    )
    nrm = "greatest(sqrt(list_dot_product({v}, {v})), 1e-30)"
    unit = f"list_transform({{v}}, x -> x / {nrm})"
    return f"""
WITH {_kmeans_ctes(n_centroids=n_centroids)},
len_d AS (SELECT max(len(embedding)) AS dim FROM embeddings),
res AS (
  SELECT a.vec_id, a.cid AS ccid,
         list_transform(list_zip(a.v, c.cv), p -> p[1] - p[2]) AS rv
  FROM (SELECT vec_id, v, cid FROM a1 WHERE rn = 1) a
  JOIN c1 c ON c.cid = a.cid
),
pnn AS (SELECT greatest(count(*) // {2 * ks}, 1) AS step FROM embeddings),
pseeds AS (
  SELECT r.rv AS v, row_number() OVER (ORDER BY h.hh) - 1 AS cid
  FROM res r JOIN h ON h.vec_id = r.vec_id, pnn
  WHERE h.hh % step = 0
  ORDER BY h.hh LIMIT {ks}
),
ms AS (SELECT unnest(generate_series(0, {m - 1})) AS m),
rs AS (
  SELECT r.vec_id, r.ccid, ms.m,
         r.rv[ms.m * {dsub_sql} + 1 : (ms.m + 1) * {dsub_sql}] AS sv
  FROM res r CROSS JOIN ms, len_d
),
pb0 AS (
  SELECT s.cid, ms.m,
         s.v[ms.m * {dsub_sql} + 1 : (ms.m + 1) * {dsub_sql}] AS cv
  FROM pseeds s CROSS JOIN ms, len_d
),
pa0 AS (
  SELECT rs.vec_id, rs.m, b.cid, rs.sv,
         row_number() OVER (PARTITION BY rs.vec_id, rs.m
             ORDER BY {sq.format(a="rs.sv", b="b.cv")} ASC, b.cid ASC) AS rn
  FROM rs JOIN pb0 b ON b.m = rs.m
),
pg AS (SELECT unnest(generate_series(1, (SELECT dim // {m} FROM len_d))) AS ord),
pm0 AS (
  SELECT t.m, t.cid, pg.ord, avg(t.sv[pg.ord]) AS mx
  FROM (SELECT m, cid, sv FROM pa0 WHERE rn = 1) t CROSS JOIN pg
  GROUP BY t.m, t.cid, pg.ord
),
pb1m AS (SELECT m, cid, list(mx ORDER BY ord) AS mv FROM pm0 GROUP BY m, cid),
pb1 AS (
  SELECT pb0.m, pb0.cid, COALESCE(pb1m.mv, pb0.cv) AS cv
  FROM pb0 LEFT JOIN pb1m ON pb1m.m = pb0.m AND pb1m.cid = pb0.cid
),
pa1 AS (
  SELECT rs.vec_id, rs.ccid, rs.m, b.cid,
         row_number() OVER (PARTITION BY rs.vec_id, rs.m
             ORDER BY {sq.format(a="rs.sv", b="b.cv")} ASC, b.cid ASC) AS rn
  FROM rs JOIN pb1 b ON b.m = rs.m
),
qs AS (SELECT vec_id AS query_id, v AS qv FROM h WHERE vec_id IN (0, 1, 2)),
prb AS (
  SELECT query_id, cid AS ccid, qv FROM (
    SELECT q.query_id, c.cid, q.qv,
           row_number() OVER (PARTITION BY q.query_id
               ORDER BY list_dot_product({unit.format(v="q.qv")}, c.cv) DESC, c.cid ASC) AS pr
    FROM qs q CROSS JOIN c1 c
  ) WHERE pr <= {nprobe}
),
qres AS (
  SELECT p.query_id, p.ccid,
         list_transform(list_zip(p.qv, c.cv), p2 -> p2[1] - p2[2]) AS qr
  FROM prb p JOIN c1 c ON c.cid = p.ccid
),
qsub AS (
  SELECT q.query_id, q.ccid, ms.m,
         q.qr[ms.m * {dsub_sql} + 1 : (ms.m + 1) * {dsub_sql}] AS qsv
  FROM qres q CROSS JOIN ms, len_d
),
lut AS (
  SELECT q.query_id, q.ccid, q.m, b.cid, {sq.format(a="q.qsv", b="b.cv")} AS d
  FROM qsub q JOIN pb1 b ON b.m = q.m
),
adc AS (
  SELECT l.query_id, a.vec_id, sqrt(list_sum(list(l.d ORDER BY l.m))) AS dist
  FROM (SELECT vec_id, ccid, m, cid FROM pa1 WHERE rn = 1) a
  JOIN lut l ON l.ccid = a.ccid AND l.m = a.m AND l.cid = a.cid
  GROUP BY l.query_id, a.vec_id
),
r1 AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id ASC) AS rn
  FROM adc
),
refined AS (
  SELECT r.query_id, r.vec_id,
         {_DD_L2.format(a="e.embedding::DOUBLE[]", b="q.qv")} AS dist
  FROM r1 r
  JOIN embeddings e ON e.vec_id = r.vec_id
  JOIN qs q ON q.query_id = r.query_id
  WHERE r.rn <= {refine}
),
r2 AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id ASC) AS rn
  FROM refined
)
SELECT query_id, vec_id, round(dist, 4) AS dist FROM r2 WHERE rn <= {k}
"""


_IVFPQ_CACHE: dict = {}


def _ivfpq_index(spark: SparkSession, sf_dir: str):
    """Deterministic fused IVF-PQ index over the embeddings table,
    built once per sf_dir (coarse k-means + residual PQ codebooks +
    encoded corpus, cached — the build a serving deployment amortizes
    across every query; bench counts it as fixture build)."""
    from coltt_spark.operators.pq import ivfpq_build

    if sf_dir not in _IVFPQ_CACHE:
        emb = load_table(spark, sf_dir, "embeddings")
        codes, Cn, book = ivfpq_build(
            emb,
            id_col="vec_id",
            vec_col="embedding",
            n_centroids=16,
            n_subspaces=8,
            n_codes=16,
        )
        codes = codes.cache()
        codes.count()
        _IVFPQ_CACHE[sf_dir] = (codes, Cn, book)
    return _IVFPQ_CACHE[sf_dir]


def q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused IVF-PQ (IVFADC) KNN — the standard billion-scale ANN
    layout (coarse inverted lists + product-quantized residuals +
    per-list query LUTs + exact refine), composing the audited IVF
    and PQ primitives. Value-checked end-to-end by
    :func:`_ivfpq_oracle`, which replays coarse k-means, residuals,
    residual-PQ training, probe order, per-centroid LUTs, ADC, and
    refine in SQL."""
    from coltt_spark.operators.pq import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    res = ivfpq_topk(
        emb,
        _queries_from_embeddings(spark, sf_dir),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        nprobe=4,
        refine=50,
        index=_ivfpq_index(spark, sf_dir),
    )
    return res.select("query_id", "vec_id", F.round("dist", 4).alias("dist"))


_DD_H60 = "('0x' || substr(md5({x}), 1, 15))::BIGINT"


def _cluster_sizes_oracle(*, n_clusters: int = 16) -> str:
    """Cluster occupancy on top of the shared k-means replay."""
    return f"""
WITH {_kmeans_ctes(n_centroids=n_clusters)}
SELECT CAST(cid AS BIGINT) AS centroid, count(*) AS n_vectors
FROM a1 WHERE rn = 1 GROUP BY cid
"""


def _cluster_sample_oracle(*, n_clusters: int = 16, quota: int = 10) -> str:
    """Cluster-balanced sampling: the shared k-means replay feeding
    the stratified sampler's hash-threshold + ranked-window replay
    (same double-precision threshold literals, in the same order, as
    operators/pipeline.stratified_sample)."""
    keep = float(8 * quota + 256)
    h60 = _DD_H60.format(x="a.vec_id::VARCHAR")
    return f"""
WITH {_kmeans_ctes(n_centroids=n_clusters)},
asg AS (SELECT vec_id, cid FROM a1 WHERE rn = 1),
cnt AS (SELECT cid, count(*) AS sn FROM asg GROUP BY cid),
f AS (
  SELECT a.vec_id, a.cid, {h60} AS hsel
  FROM asg a JOIN cnt USING (cid)
  WHERE ({h60})::DOUBLE < {keep!r} / sn * 1152921504606846976.0
),
r AS (
  SELECT vec_id, cid,
         row_number() OVER (PARTITION BY cid ORDER BY hsel ASC, vec_id ASC) AS rk
  FROM f
)
SELECT vec_id, CAST(cid AS BIGINT) AS centroid, CAST(rk AS BIGINT) AS sample_rank
FROM r WHERE rk <= {quota}
"""


def _semantic_dedup_oracle(*, n_clusters: int = 16, threshold: float = 0.4) -> str:
    """SemDeDup survivors on top of the shared k-means replay: drop
    every row with a lower-id same-cluster neighbor at cosine ≥
    threshold. The similarity is the identical double fold on both
    sides (list_dot_product ≡ F.aggregate zip_with), so the ≥
    comparison cannot disagree."""
    sim = (
        "list_dot_product(x.v, y.v) / "
        "(sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v)))"
    )
    return f"""
WITH {_kmeans_ctes(n_centroids=n_clusters)},
asg AS (SELECT vec_id, v, cid FROM a1 WHERE rn = 1),
dropped AS (
  SELECT DISTINCT y.vec_id
  FROM asg x JOIN asg y ON x.cid = y.cid AND x.vec_id < y.vec_id
  WHERE {sim} >= {threshold!r}
)
SELECT a.vec_id, CAST(a.cid AS BIGINT) AS centroid
FROM asg a WHERE a.vec_id NOT IN (SELECT vec_id FROM dropped)
"""


def _cluster_outliers_oracle(*, n_clusters: int = 16, min_sim: float = 0.2) -> str:
    """Outlier report on top of the shared k-means replay: cosine of
    each row's unit vector against its own refined centroid, kept
    when below the threshold."""
    unit = "list_transform({v}, x -> x / greatest(sqrt(list_dot_product({v}, {v})), 1e-30))"
    return f"""
WITH {_kmeans_ctes(n_centroids=n_clusters)},
asg AS (SELECT vec_id, v, cid FROM a1 WHERE rn = 1),
s AS (
  SELECT a.vec_id, a.cid, list_dot_product({unit.format(v="a.v")}, c.cv) AS sim
  FROM asg a JOIN c1 c ON c.cid = a.cid
)
SELECT vec_id, CAST(cid AS BIGINT) AS centroid, round(sim, 4) AS centroid_sim
FROM s WHERE sim < {min_sim!r}
"""


def q_embed_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid-distance outlier pruning: rows whose cosine to their
    own k-means centroid is below 0.2 — the off-distribution prune
    list of an embedding-curation pass. One assignment scan + one
    broadcast join; the oracle replays k-means and the per-row
    centroid cosine."""
    from coltt_spark.operators.cluster import cluster_outliers

    emb = load_table(spark, sf_dir, "embeddings")
    return cluster_outliers(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=16, min_sim=0.2,
        built=_kmeans_fixture(spark, sf_dir),
    )


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic deduplication: cluster-confined cosine
    ε-ball dedup over the embedding space (threshold 0.4 — sized to
    the synthetic corpus's similarity range so drops actually occur).
    The oracle replays k-means assignment plus the within-cluster
    pair rule in SQL."""
    from coltt_spark.operators.cluster import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _ = _kmeans_fixture(spark, sf_dir)
    return semantic_dedup(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=16, threshold=0.4,
        assigned=assigned,
    )


def q_embed_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means cluster occupancy over the embedding space — the
    curation-pass entry point (which clusters are boilerplate
    mega-clusters?). Reuses the IVF build; the oracle replays seed
    pick + Lloyd + assignment via the shared k-means CTEs."""
    from coltt_spark.operators.cluster import cluster_sizes

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _ = _kmeans_fixture(spark, sf_dir)
    return cluster_sizes(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=16, assigned=assigned
    )


def q_sample_cluster_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced selection (SemDeDup-style curation): ≤ 10 rows
    per k-means cluster in deterministic md5-hash order — composition
    of two oracle-checked engine pieces (IVF build + skew-safe
    stratified sampler)."""
    from coltt_spark.operators.cluster import cluster_balanced_sample

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _ = _kmeans_fixture(spark, sf_dir)
    return cluster_balanced_sample(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=16, quota=10,
        assigned=assigned,
    )



def _recall_oracle() -> str:
    """Per-query recall@5 of the LSH path against the exact path —
    both sides replayed by their existing full-pipeline oracles,
    composed as nested CTE subqueries."""
    return f"""
WITH lsh AS ({_lsh_oracle()}),
exact AS ({_ORACLE_ANN_EXACT}),
h AS (
  SELECT l.query_id, count(*) AS n_hits
  FROM lsh l JOIN exact e ON e.query_id = l.query_id AND e.vec_id = l.vec_id
  GROUP BY l.query_id
),
q AS (SELECT DISTINCT query_id FROM exact)
SELECT q.query_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(COALESCE(h.n_hits, 0) / 5.0, 4) AS recall
FROM q LEFT JOIN h USING (query_id)
"""


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation as an engine table: per-query recall@5
    of the multiprobe-LSH path vs the exact scan — the monitoring
    query a serving deployment runs continuously. The oracle composes
    the two already-value-checked pipeline replays."""
    from coltt_spark.operators.ann import recall_report

    emb = load_table(spark, sf_dir, "embeddings")
    qs = _queries_from_embeddings(spark, sf_dir)
    approx = lsh_topk(
        emb, qs, id_col="vec_id", vec_col="embedding", k=5, nbits=6, n_tables=6
    )
    truth = brute_topk(
        emb, qs, id_col="vec_id", vec_col="embedding", k=5,
        distance="cosine", strategy="window",
    )
    return recall_report(approx, truth, id_col="vec_id", k=5)



def _projection_oracle(*, out_dim: int = 16, seed: int = 7, dim: int = 64) -> str:
    """Inline the seed-deterministic planes as literals (same
    generator as the Spark op) and replay every projected value."""
    from coltt_spark.operators.ann import lsh_planes

    planes = lsh_planes(dim, out_dim, seed)
    cols = ",\n       ".join(
        "round(list_dot_product(embedding::DOUBLE[], ["
        + ", ".join(repr(float(x)) for x in planes[j])
        + "]::DOUBLE[]), 4) AS p" + str(j)
        for j in range(out_dim)
    )
    return f"SELECT vec_id, {cols} FROM embeddings"


def q_embed_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss random projection (64 → 16 dims) over the
    embedding corpus — the cheap narrow pre-step before clustering /
    ANN at very high input dimension. The oracle inlines the identical
    seeded planes and value-checks every coordinate."""
    from coltt_spark.operators.cluster import random_projection

    emb = load_table(spark, sf_dir, "embeddings")
    return random_projection(emb, id_col="vec_id", vec_col="embedding", out_dim=16)


ANN_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "ann_topk_batch": _ann_exact("window"),
    "ann_topk_blas": _ann_exact("blas"),
    "ann_lsh": q_ann_lsh,
    "ann_ivf": q_ann_ivf,
    "ann_bq": q_ann_bq,
    "ann_pq": q_ann_pq,
    "ann_ivfpq": q_ann_ivfpq,
    "embed_cluster_sizes": q_embed_cluster_sizes,
    "sample_cluster_balanced": q_sample_cluster_balanced,
    "semantic_dedup": q_semantic_dedup,
    "embed_outliers": q_embed_outliers,
    "ann_recall": q_ann_recall,
    "embed_project": q_embed_project,
}

ANN_ORACLES: dict[str, str] = {
    "ann_topk_batch": _ORACLE_ANN_EXACT,
    "ann_topk_blas": _ORACLE_ANN_EXACT,
    "ann_lsh": _lsh_oracle(),
    "ann_ivf": _ivf_oracle(),
    "ann_bq": _bq_oracle(),
    "ann_pq": _pq_oracle(),
    "ann_ivfpq": _ivfpq_oracle(),
    "embed_cluster_sizes": _cluster_sizes_oracle(),
    "sample_cluster_balanced": _cluster_sample_oracle(),
    "semantic_dedup": _semantic_dedup_oracle(),
    "embed_outliers": _cluster_outliers_oracle(),
    "ann_recall": _recall_oracle(),
    "embed_project": _projection_oracle(),
}
