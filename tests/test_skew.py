"""Adversarial-skew stress tests (VERDICT r3 #6): a hot token in half
the corpus and a mega-duplicate template cluster — the pathologies a
100 TB training-data corpus actually has and the synthetic testdata's
e2e fixtures never stress. Each test pins that the operator keeps its
bucketed/broadcast plan shape and bounded candidate work under skew,
not just on benign data."""

from __future__ import annotations

from pyspark.sql import functions as F

from coltt_spark.plans import has_broadcast_hash_join, has_take_ordered
from coltt_spark.plans.inspect import executed_plan


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_hot_token_keeps_broadcast_takeordered(spark):
    """One term in 50% of documents: the document-frequency and
    corpus-stats sides must STAY broadcast (a df row is one value per
    query term no matter how hot the term is) and the top-k must stay
    a TakeOrderedAndProject — a token-keyed corpus shuffle or global
    sort here would melt at scale exactly when a stopword-like term
    sneaks into a query."""
    from coltt_spark.operators.fulltext import bm25_search

    rows = [
        (i, ("hot common filler " if i % 2 == 0 else "cold filler ")
            + f"word{i % 97} " + ("needle " if i == 7 else ""))
        for i in range(2000)
    ]
    df = bm25_search(_corpus(spark, rows), "doc_id", "text", "hot needle")
    assert has_broadcast_hash_join(df)
    assert has_take_ordered(df)
    plan = executed_plan(df)
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    top = df.collect()
    # the rare term dominates idf: the needle doc must rank first
    assert top[0]["doc_id"] == 7


def test_minhash_lsh_mega_cluster_collapses_to_one_representative(spark):
    """A 5000-copy template cluster: banding/verify must run over ONE
    content representative (the exact-content collapse), with the
    within-cluster pairs emitted straight from the content groups —
    the output is inherently C(n,2) but the candidate join must never
    be. Also plants one real near-dup pair among distinct docs and
    checks it survives alongside the cluster."""
    from coltt_spark.functions.text import tokens
    from coltt_spark.operators.dedup import minhash_lsh_pairs, shingle_table

    n_cluster = 5000
    template = "spark packs blocks into contiguous buffers for scan speed"
    base_toks = " ".join(f"tok{i}" for i in range(30))
    near_a = base_toks + " kappa"
    near_b = base_toks + " lambda"
    rows = [(i, template) for i in range(n_cluster)] + [
        (n_cluster + 0, near_a),
        (n_cluster + 1, near_b),
        (n_cluster + 2, "completely different text about databases and joins"),
    ]
    df = _corpus(spark, rows)
    # structural pin: identical shingle sets collapse to ONE group —
    # this is what bounds the band join under the cluster
    sh = shingle_table(df, "doc_id", "text", 3)
    fp = sh.groupBy("doc_id").agg(
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_set("sh")), lambda c: c.cast("string")
                ),
            )
        ).alias("fp")
    )
    assert fp.filter(F.col("doc_id") < n_cluster).select("fp").distinct().count() == 1
    pairs = minhash_lsh_pairs(df, "doc_id", "text", n=3, threshold=0.5)
    assert "CartesianProduct" not in executed_plan(pairs)
    in_cluster = pairs.filter(
        (F.col("id_a") < n_cluster) & (F.col("id_b") < n_cluster)
    )
    assert in_cluster.count() == n_cluster * (n_cluster - 1) // 2
    assert in_cluster.filter(F.col("jaccard") != 1.0).count() == 0
    planted = pairs.filter(F.col("id_a") == n_cluster).collect()
    assert [(r["id_a"], r["id_b"]) for r in planted] == [(n_cluster, n_cluster + 1)]
    assert 0.5 <= planted[0]["jaccard"] < 1.0


def test_simhash_mega_cluster_blocks_on_distinct_signatures(spark):
    """The same 5000-copy cluster through SimHash: the chunk self-join
    runs over DISTINCT signatures (the cluster contributes ONE row per
    join bucket), and the expansion returns exactly the C(n,2)
    hamming-0 within-cluster pairs."""
    from coltt_spark.operators.dedup import simhash, simhash_pairs

    n_cluster = 5000
    template = "spark packs blocks into contiguous buffers for scan speed"
    rows = [(i, template) for i in range(n_cluster)] + [
        (n_cluster + j, f"unrelated documents mention topic{j} and engine{j}")
        for j in range(3)
    ]
    df = _corpus(spark, rows)
    # the cluster is one signature — the join-side row count is the
    # distinct-signature count, not the document count
    assert (
        simhash(df, "doc_id", "text").select("simhash").distinct().count() <= 4
    )
    pairs = simhash_pairs(df, "doc_id", "text", max_hamming=3)
    assert "CartesianProduct" not in executed_plan(pairs)
    in_cluster = pairs.filter(
        (F.col("id_a") < n_cluster) & (F.col("id_b") < n_cluster)
    )
    assert in_cluster.count() == n_cluster * (n_cluster - 1) // 2
    assert in_cluster.filter(F.col("hamming") != 0).count() == 0


def test_embedding_neardup_mega_cluster_bounded_by_answer(spark):
    """Embedding near-dup under a mega-cluster of identical vectors:
    the sign-LSH blocked join's candidate work equals the true answer
    (all pairs are genuine near-dups), never a cross join across
    blocks — output is exactly C(n,2) within the cluster plus the
    planted near pair, and distinct vectors land in other blocks."""
    from coltt_spark.operators.dedup import embedding_neardup_pairs, sign_block

    n_cluster = 1500
    base = [0.5, -0.25, 0.75, -0.5, 0.25, -0.75, 0.5, 0.25]
    near = [x * 1.01 + 0.001 for x in base]       # cos ≈ 1 to base
    far = [-x for x in base]                       # cos = -1
    rows = (
        [(i, base) for i in range(n_cluster)]
        + [(n_cluster, near), (n_cluster + 1, far)]
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    df = df.withColumn("block", sign_block(F.col("embedding"), bits=8))
    pairs = embedding_neardup_pairs(
        df, "vec_id", "embedding", threshold=0.99, block_col="block"
    )
    assert "CartesianProduct" not in executed_plan(pairs)
    in_cluster = pairs.filter(
        (F.col("id_a") < n_cluster) & (F.col("id_b") < n_cluster)
    ).count()
    assert in_cluster == n_cluster * (n_cluster - 1) // 2
    # the planted near vector pairs with every cluster member; the
    # opposite vector (different sign block) contributes nothing
    assert pairs.filter(F.col("id_b") == n_cluster).count() == n_cluster
    assert pairs.filter(
        (F.col("id_a") == n_cluster + 1) | (F.col("id_b") == n_cluster + 1)
    ).count() == 0
