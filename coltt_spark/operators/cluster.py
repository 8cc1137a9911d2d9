"""Embedding-space clustering for training-data curation.

The large-scale curation pattern (SemDeDup, cluster-balanced
selection): k-means the corpus's embedding space, then inspect or
rebalance the data per cluster — cap mega-clusters (boilerplate,
templates), keep the tail (diversity). Built entirely from engine
pieces that are already oracle-checked:

- clustering = :func:`coltt_spark.operators.ann.ivf_build` — the
  deterministic hash-mod seed pick + distributed spherical Lloyd
  round that also powers the IVF index (one scan to assign, k·dim
  numbers to the driver per round);
- per-cluster quotas = :func:`coltt_spark.operators.pipeline.
  stratified_sample` with the cluster id as the stratum — the
  skew-safe hash-threshold sampler, so a mega-cluster never funnels
  through one sort task.

Scale shape: one assignment scan (broadcast centroids, Arrow-batched
matmul), one map-side-combined count aggregate, one window over
hash-prefiltered survivors. No all-pairs anything; the cluster id is
the only shuffle key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from coltt_spark.operators.ann import ivf_build
from coltt_spark.operators.pipeline import stratified_sample


def cluster_embeddings(
    corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    n_clusters: int = 16,
    iters: int = 1,
) -> DataFrame:
    """Assign every row to its nearest (max-cosine) k-means centroid.
    Returns (id, vector, centroid) — the same artifact the IVF layout
    persists, surfaced as a curation table."""
    assigned, _ = ivf_build(
        corpus, id_col=id_col, vec_col=vec_col, n_centroids=n_clusters, kmeans_iters=iters
    )
    return assigned


def cluster_sizes(
    corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    n_clusters: int = 16,
    iters: int = 1,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """Cluster occupancy report (centroid, n_vectors) — the first
    thing a curation pass looks at: which clusters are template
    mega-clusters and which are the long tail. One scan + one
    map-side-combined count. ``assigned`` short-circuits the build
    with a precomputed (cached) assignment — the serving pattern:
    cluster once, run every curation query against it."""
    if assigned is None:
        assigned = cluster_embeddings(
            corpus, id_col=id_col, vec_col=vec_col, n_clusters=n_clusters, iters=iters
        )
    return assigned.groupBy(F.col("centroid").cast("long").alias("centroid")).agg(
        F.count(F.lit(1)).alias("n_vectors")
    )


def random_projection(
    corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    out_dim: int = 16,
    seed: int = 7,
) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction: project every
    embedding onto ``out_dim`` seed-deterministic Gaussian directions
    — the standard cheap pre-step before clustering / ANN / dedup on
    very high-dimensional embeddings (distances are preserved to
    (1±ε) with out_dim = O(log n / ε²), independent of the input
    dimension). Returns (id, p0..p{out_dim-1}).

    Scale shape: a pure narrow projection — each output coordinate is
    one fused multiply-add fold over the row against a PLANE LITERAL
    (same seeded generator as the LSH hyperplanes, so a SQL oracle
    inlines identical planes and replays every value exactly); no
    shuffle, no Python, no driver collect."""
    from coltt_spark.functions.vector import dot_fold_sql, sql_double_array
    from coltt_spark.operators.ann import lsh_planes

    planes = lsh_planes(
        len(corpus.select(vec_col).first()[0]), out_dim, seed
    )
    # one parsed expression per output coordinate (r13-opt): the
    # Column form marshaled every plane element through py4j — the
    # fold is the same zip_with/aggregate, values bit-identical
    cols = [
        F.expr(
            f"round({dot_fold_sql(f'`{vec_col}`', sql_double_array(planes[j]))}, 4)"
        ).alias(f"p{j}")
        for j in range(out_dim)
    ]
    return corpus.select(F.col(id_col), *cols)


def cluster_outliers(
    corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    n_clusters: int = 16,
    min_sim: float = 0.1,
    iters: int = 1,
    built: "tuple[DataFrame, object] | None" = None,
) -> DataFrame:
    """Embedding-space outlier report: rows whose cosine similarity to
    their OWN cluster centroid falls below ``min_sim`` — the points no
    cluster explains (noise, encoding failures, off-distribution
    content), the standard prune list next to SemDeDup in a curation
    pass. Returns (id, centroid, centroid_sim).

    Scale shape: one assignment scan + one broadcast join against the
    k-row centroid table + a narrow filter — nothing shuffles."""
    from pyspark.sql import types as T

    from coltt_spark.functions.vector import dot
    from coltt_spark.operators.ann import ivf_build

    assigned, Cn = built if built is not None else ivf_build(
        corpus, id_col=id_col, vec_col=vec_col, n_centroids=n_clusters, kmeans_iters=iters
    )
    spark = corpus.sparkSession
    cdf = spark.createDataFrame(
        [(int(i), [float(x) for x in Cn[i]]) for i in range(len(Cn))],
        T.StructType(
            [
                T.StructField("centroid", T.IntegerType(), False),
                T.StructField("_cv", T.ArrayType(T.DoubleType()), False),
            ]
        ),
    )
    v = F.col(vec_col).cast("array<double>")
    nrm = F.greatest(F.sqrt(dot(v, v)), F.lit(1e-30))
    unit = F.transform(v, lambda x: x / nrm)
    sim = dot(unit, F.col("_cv"))
    return (
        assigned.join(F.broadcast(cdf), on="centroid")
        .withColumn("centroid_sim", sim)
        .filter(F.col("centroid_sim") < F.lit(float(min_sim)))
        .select(
            F.col(id_col),
            F.col("centroid").cast("long").alias("centroid"),
            F.round("centroid_sim", 4).alias("centroid_sim"),
        )
    )


def semantic_dedup(
    corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    n_clusters: int = 16,
    threshold: float = 0.85,
    iters: int = 1,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: k-means the embedding
    space, then inside each cluster drop every row that has a
    LOWER-id neighbor with cosine similarity ≥ ``threshold`` (the
    one-pass ε-ball rule — the lowest id of each near-dup set is the
    canonical survivor). Returns surviving (id, centroid) rows.

    Scale shape: the pairwise comparison is CONFINED to a cluster —
    the cluster id is the only join key, so the pair count is
    Σ|cluster|², bounded by choosing ``n_clusters`` ∝ corpus size
    (the SemDeDup recipe: k ≈ n/1000 keeps clusters ~constant-sized
    as the corpus grows). One assignment scan (broadcast centroids,
    Arrow-batched matmul), one within-cluster equi-join, one
    anti-join. No global window, no driver collect."""
    from coltt_spark.functions.vector import dot

    if assigned is None:
        assigned = cluster_embeddings(
            corpus, id_col=id_col, vec_col=vec_col, n_clusters=n_clusters, iters=iters
        )
    v = F.col(vec_col).cast("array<double>")
    a = assigned.select(
        F.col("centroid"),
        F.col(id_col).alias("_i"),
        v.alias("_vi"),
        (F.sqrt(dot(v, v))).alias("_ni"),
    )
    b = assigned.select(
        F.col("centroid"),
        F.col(id_col).alias("_j"),
        v.alias("_vj"),
        (F.sqrt(dot(v, v))).alias("_nj"),
    )
    sim = dot(F.col("_vi"), F.col("_vj")) / (F.col("_ni") * F.col("_nj"))
    dropped = (
        a.join(b, on="centroid")
        .filter(F.col("_i") < F.col("_j"))
        .filter(sim >= F.lit(float(threshold)))
        .select(F.col("_j").alias(id_col))
        .distinct()
    )
    return assigned.join(dropped, on=id_col, how="left_anti").select(
        F.col(id_col), F.col("centroid").cast("long").alias("centroid")
    )


def cluster_balanced_sample(
    corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    n_clusters: int = 16,
    quota: int = 10,
    iters: int = 1,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """Cluster-balanced selection: at most ``quota`` rows per cluster,
    picked in deterministic md5-hash order — flattens the cluster-size
    distribution the way curation pipelines cap boilerplate clusters
    while keeping rare ones intact. Returns (id, centroid,
    sample_rank); re-runs select the same rows."""
    if assigned is None:
        assigned = cluster_embeddings(
            corpus, id_col=id_col, vec_col=vec_col, n_clusters=n_clusters, iters=iters
        )
    out = stratified_sample(
        assigned.select(id_col, "centroid"), id_col, "centroid", quota=quota
    )
    return out.select(
        F.col(id_col), F.col("centroid").cast("long").alias("centroid"), "sample_rank"
    )
