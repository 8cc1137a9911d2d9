"""ANN recall + strategy-equivalence tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from coltt_spark.operators.ann import brute_topk, ivf_topk, lsh_topk, recall_at_k
from coltt_spark.sources.tables import load_table

from .conftest import SF_CORRECT, SF_SMOKE

K = 10


def _queries(spark, n=5):
    emb = load_table(spark, SF_CORRECT, "embeddings")
    rows = emb.filter(F.col("vec_id") < n).select("vec_id", "embedding").collect()
    return {int(r["vec_id"]): list(r["embedding"]) for r in rows}


def test_blas_equals_window(spark):
    emb = load_table(spark, SF_CORRECT, "embeddings")
    qs = _queries(spark)
    a = brute_topk(emb, qs, id_col="vec_id", vec_col="embedding", k=K, strategy="window")
    b = brute_topk(emb, qs, id_col="vec_id", vec_col="embedding", k=K, strategy="blas")
    ra = sorted((r["query_id"], r["vec_id"], round(r["dist"], 8)) for r in a.collect())
    rb = sorted((r["query_id"], r["vec_id"], round(r["dist"], 8)) for r in b.collect())
    assert ra == rb


def test_blas_euclidean_equals_window(spark):
    emb = load_table(spark, SF_CORRECT, "embeddings")
    qs = _queries(spark, 3)
    a = brute_topk(emb, qs, id_col="vec_id", vec_col="embedding", k=K,
                   distance="euclidean", strategy="window")
    b = brute_topk(emb, qs, id_col="vec_id", vec_col="embedding", k=K,
                   distance="euclidean", strategy="blas")
    ra = sorted((r["query_id"], r["vec_id"], round(r["dist"], 6)) for r in a.collect())
    rb = sorted((r["query_id"], r["vec_id"], round(r["dist"], 6)) for r in b.collect())
    assert ra == rb


def test_lsh_recall(spark):
    emb = load_table(spark, SF_CORRECT, "embeddings")
    qs = _queries(spark)
    truth = brute_topk(emb, qs, id_col="vec_id", vec_col="embedding", k=K)
    approx = lsh_topk(emb, qs, id_col="vec_id", vec_col="embedding", k=K,
                      nbits=6, n_tables=6)
    r = recall_at_k(approx, truth, id_col="vec_id", k=K)
    # the synthetic embeddings are near-uniform (weak neighbor
    # structure) — 0.55 is the honest bar at ~35% candidate fraction
    assert r >= 0.55, f"LSH recall@{K} = {r}"


def test_ivf_recall_and_candidate_fraction(spark):
    emb = load_table(spark, SF_CORRECT, "embeddings")
    qs = _queries(spark)
    truth = brute_topk(emb, qs, id_col="vec_id", vec_col="embedding", k=K)
    approx = ivf_topk(emb, qs, id_col="vec_id", vec_col="embedding", k=K,
                      n_centroids=16, nprobe=4)
    r = recall_at_k(approx, truth, id_col="vec_id", k=K)
    # near-uniform synthetic embeddings (weak neighbor structure):
    # ~0.48 at a 25% candidate fraction is the honest floor — the
    # exact value shifts a few points with the seed hash
    assert r >= 0.45, f"IVF recall@{K} = {r}"


def test_recall_identity(spark):
    emb = load_table(spark, SF_CORRECT, "embeddings")
    qs = _queries(spark, 3)
    truth = brute_topk(emb, qs, id_col="vec_id", vec_col="embedding", k=K)
    assert recall_at_k(truth, truth, id_col="vec_id", k=K) == 1.0


def test_two_phase_equals_exact(spark):
    """f16-coarse two-phase KNN returns exactly the full-precision
    top-k (phase-2 rerank is exact; f16 coarse error << rank margin)."""
    from coltt_spark.operators.search import two_phase_topk, vertex_search
    from coltt_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = list(emb.filter(F.col("vec_id") == 3).first()["embedding"])
    exact = vertex_search(
        emb, q, vector_col="embedding", distance="cosine", limit=10, tie_break="vec_id"
    )
    two = two_phase_topk(
        emb, q, vector_col="embedding", kind="f16", distance="cosine",
        limit=10, expand=4, tie_break="vec_id",
    )
    assert [r["vec_id"] for r in two.collect()] == [r["vec_id"] for r in exact.collect()]


def test_wide_layout_equals_array_layout(spark):
    """The wide columnar FLAT scan returns the same top-k (ids and
    4-decimal distances) as the array-layout scan, for every distance."""
    from coltt_spark.operators.search import (
        vertex_search,
        vertex_search_wide,
        widen_vectors,
    )
    from coltt_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = list(emb.filter(F.col("vec_id") == 7).first()["embedding"])
    wide = widen_vectors(emb, vector_col="embedding", dim=len(q))
    for dist in ("cosine", "euclidean", "manhattan"):
        a = vertex_search(
            emb, q, vector_col="embedding", distance=dist, limit=10, tie_break="vec_id"
        ).select("vec_id", F.round("dist", 4).alias("d")).collect()
        w = vertex_search_wide(
            wide, q, distance=dist, limit=10, tie_break="vec_id"
        ).select("vec_id", F.round("dist", 4).alias("d")).collect()
        assert [(r["vec_id"], r["d"]) for r in a] == [(r["vec_id"], r["d"]) for r in w]


def test_ivf_kmeans_refinement(spark):
    """Lloyd-refined centroids keep IVF recall at least as good as the
    sampled ones, and the refined centroids stay unit-norm."""
    import numpy as np

    from coltt_spark.operators.ann import kmeans_refine

    emb = load_table(spark, SF_CORRECT, "embeddings")
    qs = _queries(spark, 5)
    truth = brute_topk(emb, qs, id_col="vec_id", vec_col="embedding", k=K)
    base = ivf_topk(emb, qs, id_col="vec_id", vec_col="embedding", k=K,
                    n_centroids=8, nprobe=3)
    refined = ivf_topk(emb, qs, id_col="vec_id", vec_col="embedding", k=K,
                       n_centroids=8, nprobe=3, kmeans_iters=3)
    r_base = recall_at_k(base, truth, id_col="vec_id", k=K)
    r_ref = recall_at_k(refined, truth, id_col="vec_id", k=K)
    assert r_ref >= r_base - 0.1  # refinement must not collapse recall

    rows = emb.select("embedding").limit(64).collect()
    C = np.array([list(map(float, r["embedding"])) for r in rows[:8]], dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-30)
    out = kmeans_refine(emb, Cn, vec_col="embedding", iters=2)
    assert np.allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-9)


def test_bq_sign_words_match_python(spark):
    """JVM bit packing ≡ the driver-side twin, including the bit-63
    two's-complement wrap."""
    from coltt_spark.operators.pq import sign_words, sign_words_py

    emb = load_table(spark, SF_CORRECT, "embeddings")
    rows = emb.limit(20).select(
        "vec_id", "embedding", sign_words("embedding", 64).alias("bits")
    ).collect()
    for r in rows:
        assert list(r["bits"]) == sign_words_py(list(r["embedding"]))


def test_bq_recall_and_exact_rerank(spark):
    """BQ hamming prefilter + exact rerank: the surviving top-k carry
    EXACT cosine distances (subset of the flat scan's candidates), and
    recall is far above the random floor."""
    from coltt_spark.operators.pq import bq_topk

    emb = load_table(spark, SF_CORRECT, "embeddings")
    qs = _queries(spark)
    truth = brute_topk(emb, qs, id_col="vec_id", vec_col="embedding", k=K)
    approx = bq_topk(emb, qs, id_col="vec_id", vec_col="embedding", k=K, rerank=100)
    r = recall_at_k(approx, truth, id_col="vec_id", k=K)
    assert r >= 0.5, r
    # exact-rerank contract: dist values agree with the flat scan
    t = {(x["query_id"], x["vec_id"]): round(x["dist"], 8) for x in truth.collect()}
    for x in approx.collect():
        key = (x["query_id"], x["vec_id"])
        if key in t:
            assert round(x["dist"], 8) == t[key]


def test_pq_adc_and_refine(spark):
    """PQ: codes are in range, ADC is deterministic, and the refine
    phase returns exact euclidean distances with recall above the
    coarse ADC path."""
    from coltt_spark.operators.pq import pq_encode, pq_topk, pq_train

    emb = load_table(spark, SF_CORRECT, "embeddings")
    qs = _queries(spark)
    book = pq_train(emb, id_col="vec_id", vec_col="embedding", n_subspaces=8, n_codes=16)
    assert book.shape == (8, 16, 8)
    codes = pq_encode(emb, book, id_col="vec_id", vec_col="embedding").collect()
    assert all(len(r["codes"]) == 8 and all(0 <= c < 16 for c in r["codes"]) for r in codes)

    truth = brute_topk(emb, qs, id_col="vec_id", vec_col="embedding", k=K,
                       distance="euclidean")
    adc = pq_topk(emb, qs, id_col="vec_id", vec_col="embedding", k=K, book=book)
    refined = pq_topk(emb, qs, id_col="vec_id", vec_col="embedding", k=K,
                      book=book, refine=100)
    r_adc = recall_at_k(adc, truth, id_col="vec_id", k=K)
    r_ref = recall_at_k(refined, truth, id_col="vec_id", k=K)
    assert r_ref >= r_adc - 0.05
    assert r_ref >= 0.5, (r_adc, r_ref)
    # refine contract: returned distances are the exact euclidean ones
    t = {(x["query_id"], x["vec_id"]): round(x["dist"], 8) for x in truth.collect()}
    for x in refined.collect():
        key = (x["query_id"], x["vec_id"])
        if key in t:
            assert round(x["dist"], 8) == t[key]


def test_cluster_sizes_and_balanced_sample(spark):
    """Curation composition: occupancy covers the whole corpus, the
    balanced sample caps every cluster at the quota, and re-running
    selects the identical rows (deterministic md5-hash order)."""
    from coltt_spark.operators.cluster import cluster_balanced_sample, cluster_sizes

    emb = load_table(spark, SF_CORRECT, "embeddings")
    n = emb.count()
    sizes = cluster_sizes(emb, id_col="vec_id", vec_col="embedding", n_clusters=8)
    rows = sizes.collect()
    assert sum(r["n_vectors"] for r in rows) == n
    assert len(rows) <= 8

    s1 = cluster_balanced_sample(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=8, quota=5
    ).collect()
    per = {}
    for r in s1:
        per.setdefault(r["centroid"], []).append(r["vec_id"])
        assert 1 <= r["sample_rank"] <= 5
    assert all(len(v) <= 5 for v in per.values())
    s2 = cluster_balanced_sample(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=8, quota=5
    ).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))


def test_semantic_dedup_drops_near_neighbors(spark):
    """Every dropped row has a surviving lower-id same-cluster
    neighbor at sim >= threshold; survivors at a threshold above the
    corpus max similarity = whole corpus."""
    import numpy as np

    from coltt_spark.operators.cluster import semantic_dedup

    emb = load_table(spark, SF_CORRECT, "embeddings")
    n = emb.count()
    kept = semantic_dedup(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=8, threshold=0.4
    ).collect()
    assert 0 < len(kept) < n  # threshold sized to actually drop rows
    # survivors are closed under the rule: no kept pair within one
    # cluster may sit at sim >= threshold with BOTH ids kept unless
    # the higher id has no lower-id neighbor (greedy one-pass rule
    # allows chains); spot-check determinism instead
    kept2 = semantic_dedup(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=8, threshold=0.4
    ).collect()
    assert sorted(map(tuple, kept)) == sorted(map(tuple, kept2))
    all_kept = semantic_dedup(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=8, threshold=1.1
    )
    assert all_kept.count() == n


def test_cluster_outliers_below_threshold(spark):
    from coltt_spark.operators.cluster import cluster_outliers

    emb = load_table(spark, SF_CORRECT, "embeddings")
    out = cluster_outliers(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=8, min_sim=0.25
    ).collect()
    assert out, "threshold sized to flag some rows"
    assert all(r["centroid_sim"] < 0.25 for r in out)


def test_ivfpq_recall_and_exact_refine(spark):
    """Fused IVF-PQ: codes are in range and carry the coarse
    assignment, recall against the exact euclidean truth clears the
    floor the probe fraction allows, widening nprobe never hurts
    recall, and refined distances are the exact euclidean ones."""
    from coltt_spark.operators.pq import ivfpq_build, ivfpq_topk

    emb = load_table(spark, SF_CORRECT, "embeddings")
    qs = _queries(spark)
    index = ivfpq_build(emb, id_col="vec_id", vec_col="embedding",
                        n_centroids=16, n_subspaces=8, n_codes=16)
    codes, Cn, book = index
    assert book.shape == (8, 16, 8)
    rows = codes.collect()
    assert all(
        len(r["codes"]) == 8
        and all(0 <= c < 16 for c in r["codes"])
        and 0 <= r["centroid"] < 16
        for r in rows
    )

    truth = brute_topk(emb, qs, id_col="vec_id", vec_col="embedding", k=K,
                       distance="euclidean")
    narrow = ivfpq_topk(emb, qs, id_col="vec_id", vec_col="embedding", k=K,
                        nprobe=4, refine=100, index=index)
    wide = ivfpq_topk(emb, qs, id_col="vec_id", vec_col="embedding", k=K,
                      nprobe=16, refine=100, index=index)
    r_narrow = recall_at_k(narrow, truth, id_col="vec_id", k=K)
    r_wide = recall_at_k(wide, truth, id_col="vec_id", k=K)
    # near-uniform synthetic embeddings: recall at nprobe=4/16 is
    # bounded by the ~25% candidate fraction, same floor as the plain
    # IVF test (test_ivf_recall_and_candidate_fraction, ~0.48), and
    # the 8×16 ADC is coarse on unclustered data (plain PQ's floor
    # here is 0.5) — the recall DIAL is what's under test, not an
    # absolute: widening nprobe must never hurt
    assert r_narrow >= 0.4, r_narrow
    assert r_wide >= r_narrow, (r_narrow, r_wide)
    # exact limit: probing every list with refine ≥ corpus size makes
    # the ADC cut a no-op, so IVFPQ must EQUAL the flat exact scan
    n = emb.count()
    exact_limit = ivfpq_topk(emb, qs, id_col="vec_id", vec_col="embedding",
                             k=K, nprobe=16, refine=n, index=index)
    assert recall_at_k(exact_limit, truth, id_col="vec_id", k=K) == 1.0
    # refine contract: returned distances are the exact euclidean ones
    t = {(x["query_id"], x["vec_id"]): round(x["dist"], 8) for x in truth.collect()}
    for x in narrow.collect():
        key = (x["query_id"], x["vec_id"])
        if key in t:
            assert round(x["dist"], 8) == t[key]


def test_ivfpq_refine_zero_returns_adc_topk(spark):
    """refine=0 = ADC-only serving (the pq_topk convention): same
    candidate ids as the rank-k prefix of a wide-refine run's ADC
    ordering would allow — non-empty, k rows per query, approximate
    distances (not the exact euclidean ones)."""
    from coltt_spark.operators.pq import ivfpq_build, ivfpq_topk

    emb = load_table(spark, SF_CORRECT, "embeddings")
    qs = _queries(spark, n=2)
    index = ivfpq_build(emb, id_col="vec_id", vec_col="embedding")
    adc_only = ivfpq_topk(emb, qs, id_col="vec_id", vec_col="embedding",
                          k=5, nprobe=4, refine=0, index=index).collect()
    per_q = {}
    for r in adc_only:
        per_q.setdefault(r["query_id"], []).append(r)
    assert set(per_q) == set(qs) and all(len(v) == 5 for v in per_q.values())


def test_ivfpq_build_is_deterministic(spark):
    """Two independent builds must produce identical codebooks and
    identical per-row codes — everything derives from md5 seeds and
    fixed arithmetic, nothing from partition order."""
    import numpy as np

    from coltt_spark.operators.pq import ivfpq_build

    emb = load_table(spark, SF_CORRECT, "embeddings")
    c1, Cn1, b1 = ivfpq_build(emb, id_col="vec_id", vec_col="embedding")
    c2, Cn2, b2 = ivfpq_build(emb, id_col="vec_id", vec_col="embedding")
    assert np.array_equal(Cn1, Cn2) and np.array_equal(b1, b2)
    r1 = {r["vec_id"]: (r["centroid"], tuple(r["codes"])) for r in c1.collect()}
    r2 = {r["vec_id"]: (r["centroid"], tuple(r["codes"])) for r in c2.collect()}
    assert r1 == r2


def _aniso_corpus(spark, n=2000, dim=32, n_clusters=8):
    """Deterministic ANISOTROPIC clustered corpus: per-dimension
    decaying scale (0.9^j) then a fixed non-axis-aligned rotation —
    the decaying-spectrum shape real embedding models emit, and the
    regime OPQ exists for (on isotropic data it is a measured no-op)."""
    import numpy as np

    rng = np.random.default_rng(424242)
    centers = rng.normal(size=(n_clusters, dim))
    X = centers[rng.integers(0, n_clusters, n)] + rng.normal(size=(n, dim))
    scale = 0.9 ** np.arange(dim)
    Q, _ = np.linalg.qr(rng.normal(size=(dim, dim)))
    X = (X * scale) @ Q
    rows = [(int(i), [float(x) for x in X[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_opq_rotation_is_orthogonal_and_deterministic(spark):
    """The OPQ build must be reproducible bit-for-bit (identity init,
    first-ks-rows seeds on an id-sorted sample, fixed iteration
    counts) and its rotation must be orthogonal to numerical
    precision — the property that makes the raw-space exact rerank
    legitimate."""
    import numpy as np

    from coltt_spark.operators.pq import ivfpq_build_opq

    emb = _aniso_corpus(spark)
    c1, Cn1, b1, R1 = ivfpq_build_opq(
        emb, id_col="vec_id", vec_col="embedding",
        n_centroids=4, n_subspaces=4, n_codes=16, opq_sample_rows=2000,
    )
    assert np.allclose(R1 @ R1.T, np.eye(R1.shape[0]), atol=1e-9)
    c2, Cn2, b2, R2 = ivfpq_build_opq(
        emb, id_col="vec_id", vec_col="embedding",
        n_centroids=4, n_subspaces=4, n_codes=16, opq_sample_rows=2000,
    )
    assert np.array_equal(R1, R2) and np.array_equal(b1, b2)
    assert np.array_equal(Cn1, Cn2)
    r1 = {r["vec_id"]: (r["centroid"], tuple(r["codes"])) for r in c1.collect()}
    r2 = {r["vec_id"]: (r["centroid"], tuple(r["codes"])) for r in c2.collect()}
    assert r1 == r2


def test_opq_improves_anisotropic_adc_and_keeps_exact_refine(spark):
    """On the anisotropic corpus the OPQ-rotated ADC ranking must beat
    plain PQ's at the same (M, ks, nprobe, refine) budget — the Ge
    et al. 2014 claim, measured — and the refined output's distances
    must STILL be the exact raw-space euclidean ones (rotation
    invariance: the rerank never sees R)."""
    from coltt_spark.operators.pq import ivfpq_build, ivfpq_build_opq, ivfpq_topk

    emb = _aniso_corpus(spark)
    qs = {
        j: list(emb.filter(F.col("vec_id") == 137 * j).first()["embedding"])
        for j in range(4)
    }
    truth = brute_topk(emb, qs, id_col="vec_id", vec_col="embedding", k=K,
                       distance="euclidean")
    kw = dict(id_col="vec_id", vec_col="embedding",
              n_centroids=4, n_subspaces=4, n_codes=16)
    pq_index = ivfpq_build(emb, **kw)
    codes_o, Cn_o, book_o, R = ivfpq_build_opq(emb, opq_sample_rows=2000, **kw)
    run = dict(id_col="vec_id", vec_col="embedding", k=K, n_centroids=4,
               nprobe=4, n_subspaces=4, n_codes=16)
    r_pq = recall_at_k(
        ivfpq_topk(emb, qs, refine=0, index=pq_index, **run),
        truth, id_col="vec_id", k=K,
    )
    r_opq = recall_at_k(
        ivfpq_topk(emb, qs, refine=0, index=(codes_o, Cn_o, book_o),
                   opq_rotation=R, **run),
        truth, id_col="vec_id", k=K,
    )
    assert r_opq >= r_pq, (r_pq, r_opq)
    # exact-refine contract unchanged under rotation
    refined = ivfpq_topk(emb, qs, refine=100, index=(codes_o, Cn_o, book_o),
                         opq_rotation=R, **run)
    t = {(x["query_id"], x["vec_id"]): round(x["dist"], 8) for x in truth.collect()}
    hits = 0
    for x in refined.collect():
        key = (x["query_id"], x["vec_id"])
        if key in t:
            assert round(x["dist"], 8) == t[key]
            hits += 1
    assert hits > 0

def test_opq_through_collection_surface(spark):
    """VERDICT r10 #2: the anisotropic ADC gain must be reachable
    through ``create_collection(layout="ivfpq", opq=True)`` — the
    rotation trains at flush, lands as rotation.npy beside the
    codebooks, applies to both the stored-residual encode and the
    query residual, stays FROZEN across delta flushes, and the refined
    output's distances remain exact raw-space euclidean (rotation
    invariance). The refined rerank keeps the r10 scale contract: its
    only file inputs are the probed lists' vecs tree."""
    import os
    import tempfile

    import numpy as np

    from coltt_spark.catalog import Catalog
    from coltt_spark.schema import IndexField

    emb = _aniso_corpus(spark)
    qs = {
        j: list(emb.filter(F.col("vec_id") == 137 * j).first()["embedding"])
        for j in range(4)
    }
    # truth over the STORED values: the collection casts vectors to
    # float32 at write (normalize-at-write discipline), so the exact
    # rerank's distances are doubles over the float32-cast corpus
    stored = emb.select(
        "vec_id",
        F.col("embedding").cast("array<float>").cast("array<double>").alias(
            "embedding"
        ),
    )
    truth = brute_topk(
        stored, qs, id_col="vec_id", vec_col="embedding", k=K, distance="euclidean"
    ).collect()
    t_ids: dict[int, set[str]] = {}
    t_dist: dict[tuple[int, str], float] = {}
    for r in truth:
        t_ids.setdefault(int(r["query_id"]), set()).add(str(r["vec_id"]))
        t_dist[(int(r["query_id"]), str(r["vec_id"]))] = round(float(r["dist"]), 8)
    colls = {}
    for opq in (False, True):
        cat = Catalog(spark, tempfile.mkdtemp(prefix=f"wh_opq{int(opq)}_"))
        coll = cat.create_collection(
            "c", dim=32, distance="euclidean",
            fields=[IndexField("id", "string", primary_key=True)],
            layout="ivfpq", ivf_centroids=4, ivf_nprobe=4,
            pq_subspaces=4, pq_codes=16, opq=opq, block_dtype="float64",
        )
        coll.upsert_df(
            emb.select(
                F.col("vec_id").cast("string").alias("id"),
                F.col("embedding").alias("vector"),
            ),
            dedupe_batch=False,
        )
        coll.flush()
        colls[opq] = coll
    d = colls[True]._ivf_dir("vector")
    R = np.load(os.path.join(d, "rotation.npy"))
    assert np.allclose(R @ R.T, np.eye(32), atol=1e-9)
    assert not os.path.isfile(
        os.path.join(colls[False]._ivf_dir("vector"), "rotation.npy")
    )
    # ADC-only recall at the same (M, ks, nprobe) budget: OPQ >= PQ on
    # the anisotropic corpus (nprobe = all lists isolates ADC quality)
    rec = {}
    for opq, coll in colls.items():
        hits = 0
        for j, q in qs.items():
            got = {r["id"] for r in coll.search(q, limit=K, refine=0).collect()}
            hits += len(got & t_ids[j])
        rec[opq] = hits / (K * len(qs))
    assert rec[True] >= rec[False], rec
    # refined output: exact raw-space distances, rerank path-pruned
    refined = colls[True].search(qs[0], limit=K)
    hits = 0
    for r in refined.collect():
        key = (0, r["id"])
        if key in t_dist:
            assert round(float(r["dist"]), 8) == t_dist[key]
            hits += 1
    assert hits > 0
    for f in refined.inputFiles():
        assert "vecs/centroid=" in f or f"vecs{os.sep}centroid=" in f, f
    # batch path rotates the whole (query, list) residual batch once:
    # batch == per-query loop, row for row
    batch = colls[True].search_batch({0: qs[0], 1: qs[1]}, limit=K).collect()
    by_q: dict[int, list] = {}
    for r in sorted(batch, key=lambda r: (r["query_id"], r["dist"], r["id"])):
        by_q.setdefault(int(r["query_id"]), []).append((r["id"], round(r["dist"], 8)))
    for j in (0, 1):
        seq = [
            (r["id"], round(r["dist"], 8))
            for r in colls[True].search(qs[j], limit=K).collect()
        ]
        assert by_q[j] == seq
    # delta flush freezes the rotation alongside the codebooks
    coll = colls[True]
    coll.upsert_df(
        emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").cast("string").alias("id"),
            F.col("embedding").alias("vector"),
        ),
        dedupe_batch=False,
    )
    coll.flush()
    R2 = np.load(os.path.join(coll._ivf_dir("vector"), "rotation.npy"))
    assert np.array_equal(R, R2)
    for r in coll.search(qs[0], limit=K).collect():
        key = (0, r["id"])
        if key in t_dist:
            assert round(float(r["dist"]), 8) == t_dist[key]
    # compact() RE-TRAINS R+book on the merged corpus (VERDICT r11
    # #8): change some stored values via upsert (so the deterministic
    # trainer sees a different residual sample), compact, and verify
    # (a) the persisted rotation is a NEW orthogonal matrix, (b) the
    # refined search is exact brute force over the UPDATED corpus —
    # search correctness holds across the retrain boundary.
    mutated = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").cast("string").alias("id"),
        F.reverse(F.col("embedding")).alias("vector"),
    )
    coll.upsert_df(mutated, dedupe_batch=False)
    coll.compact()
    R3 = np.load(os.path.join(coll._ivf_dir("vector"), "rotation.npy"))
    assert np.allclose(R3 @ R3.T, np.eye(32), atol=1e-9)
    assert not np.array_equal(R, R3)  # retrained, not carried over
    stored3 = (
        emb.filter(F.col("vec_id") >= 3)
        .select("vec_id", "embedding")
        .unionByName(
            emb.filter(F.col("vec_id") < 3).select(
                "vec_id", F.reverse("embedding").alias("embedding")
            )
        )
        .select(
            "vec_id",
            F.col("embedding")
            .cast("array<float>")
            .cast("array<double>")
            .alias("embedding"),
        )
    )
    truth3 = brute_topk(
        stored3, {0: qs[0]}, id_col="vec_id", vec_col="embedding", k=K,
        distance="euclidean",
    ).collect()
    t3 = {
        str(r["vec_id"]): round(float(r["dist"]), 8) for r in truth3
    }
    hits = 0
    for r in coll.search(qs[0], limit=K).collect():
        if r["id"] in t3:
            assert round(float(r["dist"]), 8) == t3[r["id"]]
            hits += 1
    assert hits > 0
