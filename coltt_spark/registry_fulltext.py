"""Full-text (BM25), hybrid-RRF, and sketch sections of the query
registry."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coltt_spark.operators.fulltext import (
    BM25_B,
    BM25_K1,
    bm25_search,
    bm25_topk_batch,
    hybrid_rrf_search,
    query_terms,
)
from coltt_spark.functions.text import HASH_P, MINHASH_PARAMS, tokens
from coltt_spark.operators.sketch import (
    ALPHA_256,
    CM_D,
    CM_W,
    cm_build,
    cm_estimate,
    hll_distinct,
)
from coltt_spark.sources.tables import load_table

# shared DuckDB fragments — single source of the portable tokenizer
# and cosine recipe (a drift between copies would silently desync
# oracles from the Spark operators)
from coltt_spark.registry_ann import _DD_COS  # noqa: E402
from coltt_spark.registry_pipeline import _DD_TOKS as _TOKS  # noqa: E402

#: One discriminative rare term ('dup', df≈25/500) + three common
#: terms — exercises the idf spread of the synthetic vocabulary.
_BM25_QUERY = "vector hash join dup"


def _bm25_sql_core(terms: list[str], *, k1: float, b: float) -> str:
    """The BM25 scoring pipeline as DuckDB CTEs ending in
    ``agg(doc_id, n_terms_hit, score)`` — shared by the bm25 and
    hybrid oracles. Float-critical constants are inlined from the
    SAME Python doubles the Spark operator uses (`repr` round-trips
    exactly), and every expression mirrors the operator's
    parenthesization so both engines execute the identical
    double-precision op sequence."""
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
d AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
dl AS (SELECT doc_id, len(tk) AS dl, tk FROM d),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                 CAST(sum(dl) AS DOUBLE) AS total_dl FROM dl),
hits AS (SELECT doc_id, dl, unnest(tk) AS t FROM dl),
tf AS (
  SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
  FROM hits WHERE t IN ({in_list}) GROUP BY doc_id, dl, t
),
dfreq AS (SELECT t, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY t),
ts AS (
  SELECT tf.doc_id, tf.t,
         ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
           * (tf.tf * {k1 + 1.0!r})
           / (tf.tf + {k1!r} * (1.0 - {b!r} + {b!r} * (tf.dl / (s.total_dl / s.n_docs))))
           AS ts
  FROM tf JOIN dfreq f USING (t), stats s
),
agg AS (
  SELECT doc_id, count(*) AS n_terms_hit,
         list_sum(list(ts ORDER BY t)) AS score
  FROM ts GROUP BY doc_id
)"""


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 BM25 lexical search over `documents` — the lexical half
    the reference's vector-only search surface lacks (its hybrid is
    filter ∩ candidates, edge/none_vectorstore.go:182-253)."""
    return bm25_search(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", _BM25_QUERY
    )


_ORACLE_BM25 = f"""
WITH {_bm25_sql_core(query_terms(_BM25_QUERY), k1=BM25_K1, b=BM25_B)}
SELECT doc_id, n_terms_hit, round(score, 4) AS score
FROM agg ORDER BY agg.score DESC, doc_id ASC LIMIT 10
"""


#: Batch-serving queries: mixed rare/common terms.
_BM25_BATCH = {
    0: "vector hash join dup",
    1: "stream window agg",
    2: "customer order big table",
}


def q_bm25_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B queries, one corpus scan: batched BM25 serving (the lexical
    twin of `ann_topk_batch`)."""
    return bm25_topk_batch(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", _BM25_BATCH, k=5
    )


def _bm25_batch_oracle() -> str:
    terms_by_q = {q: query_terms(t) for q, t in _BM25_BATCH.items()}
    values = ", ".join(
        f"({q}, '{t}')" for q in sorted(terms_by_q) for t in terms_by_q[q]
    )
    all_terms = ", ".join(
        f"'{t}'" for t in sorted({t for ts in terms_by_q.values() for t in ts})
    )
    k1, b = BM25_K1, BM25_B
    return f"""
WITH qt (query_id, t) AS (SELECT * FROM (VALUES {values})),
d AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
dl AS (SELECT doc_id, len(tk) AS dl, tk FROM d),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                 CAST(sum(dl) AS DOUBLE) AS total_dl FROM dl),
hits AS (SELECT doc_id, dl, unnest(tk) AS t FROM dl),
tf AS (
  SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
  FROM hits WHERE t IN ({all_terms}) GROUP BY doc_id, dl, t
),
dfreq AS (SELECT t, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY t),
ts AS (
  SELECT qt.query_id, tf.doc_id, tf.t,
         ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
           * (tf.tf * {k1 + 1.0!r})
           / (tf.tf + {k1!r} * (1.0 - {b!r} + {b!r} * (tf.dl / (s.total_dl / s.n_docs))))
           AS ts
  FROM tf JOIN dfreq f USING (t) JOIN qt USING (t), stats s
),
agg AS (
  SELECT query_id, doc_id, count(*) AS n_terms_hit,
         list_sum(list(ts ORDER BY t)) AS score
  FROM ts GROUP BY query_id, doc_id
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, doc_id ASC) AS rn
  FROM agg
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, n_terms_hit,
       round(score, 4) AS score
FROM r WHERE rn <= 5
"""


#: (sf_dir, str_ids) → built index ROOT (not the object: a TextIndex
#: binds the SparkSession alive at construction, and a cached object
#: would serve reads through a stopped session after a restart)
_TEXTINDEX_CACHE: dict[tuple[str, bool], str] = {}


def _text_index(spark: SparkSession, sf_dir: str, *, str_ids: bool = False):
    """Build-once inverted BM25 index fixture (cached per sf_dir) —
    the serving configuration the bench measures lookups against.
    ``str_ids=True`` builds the ids as strings so the index joins
    against a string-primary-key collection (`search_hybrid_text`
    type-checks the id/pk pairing)."""
    from coltt_spark.tmpdirs import scratch_dir

    from coltt_spark.textindex import TextIndex

    key = (sf_dir, str_ids)
    if key not in _TEXTINDEX_CACHE:
        root = scratch_dir(prefix="coltt_textidx_")
        docs = load_table(spark, sf_dir, "documents")
        if str_ids:
            docs = docs.select(
                F.col("doc_id").cast("string").alias("doc_id"), "text"
            )
        TextIndex.build(docs, "doc_id", "text", root)
        _TEXTINDEX_CACHE[key] = root
    return TextIndex(spark, _TEXTINDEX_CACHE[key])


def q_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 served from the inverted index: bit-identical scores to
    `bm25_search` (same term-score expression), but the only data
    read is the term-pruned postings — verified against the SAME
    oracle as the ad-hoc path."""
    return _text_index(spark, sf_dir).search(_BM25_QUERY)


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical+vector hybrid: BM25 and exact-cosine candidate lists
    (K=50 each) fused by reciprocal-rank fusion."""
    from coltt_spark.registry import _query_vec  # cached across entries

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    return hybrid_rrf_search(
        load_table(spark, sf_dir, "documents"),
        emb,
        _BM25_QUERY,
        qv,
    )


_ORACLE_HYBRID_RRF = f"""
WITH {_bm25_sql_core(query_terms(_BM25_QUERY), k1=BM25_K1, b=BM25_B)},
lex_top AS (SELECT doc_id, score FROM agg ORDER BY score DESC, doc_id ASC LIMIT 50),
lexr AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
  FROM lex_top
),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
vd AS (
  SELECT e.vec_id AS doc_id,
         {_DD_COS.format(a="e.embedding::DOUBLE[]", b="q.qv")} AS dist
  FROM embeddings e, q
),
vec_top AS (SELECT doc_id, dist FROM vd ORDER BY dist ASC, doc_id ASC LIMIT 50),
vecr AS (
  SELECT doc_id, row_number() OVER (ORDER BY dist ASC, doc_id ASC) AS r
  FROM vec_top
),
fused AS (
  SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
         coalesce(l.r, 0) AS bm25_rank, coalesce(v.r, 0) AS vec_rank,
         coalesce(1.0 / (60.0 + l.r), 0.0)
           + coalesce(1.0 / (60.0 + v.r), 0.0) AS rrf
  FROM lexr l FULL JOIN vecr v ON l.doc_id = v.doc_id
)
SELECT doc_id, bm25_rank, vec_rank, round(rrf, 4) AS rrf_score
FROM fused ORDER BY rrf DESC, doc_id ASC LIMIT 10
"""


#: sf_dir → index root WITH tombstones applied (built once per process)
_DELETED_TEXTINDEX_CACHE: dict[str, str] = {}


def q_bm25_index_deleted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mask-only index deletes, served: every seventh document is
    tombstoned (`TextIndex.delete`) and search must skip them while
    scoring the REST with the as-built corpus statistics — the Lucene
    deleted-but-unmerged-segment semantics, exactly replayable in SQL
    (full-corpus df/stats, deleted ids excluded only from the final
    ranking). `compact()` folding and the deletes→compact→merge
    lifecycle are pinned by tests/test_fulltext.py."""
    import os

    from coltt_spark.textindex import TextIndex
    from coltt_spark.tmpdirs import scratch_dir

    if sf_dir not in _DELETED_TEXTINDEX_CACHE:
        root = scratch_dir(prefix="coltt_textidx_del_")
        docs = load_table(spark, sf_dir, "documents")
        idx = TextIndex.build(
            docs, "doc_id", "text", os.path.join(root, "idx")
        )
        idx.delete(
            docs.filter(F.col("doc_id") % 7 == 0).select("doc_id")
        )
        _DELETED_TEXTINDEX_CACHE[sf_dir] = os.path.join(root, "idx")
    return TextIndex(spark, _DELETED_TEXTINDEX_CACHE[sf_dir]).search(_BM25_QUERY)


_ORACLE_BM25_DELETED = f"""
WITH {_bm25_sql_core(query_terms(_BM25_QUERY), k1=BM25_K1, b=BM25_B)}
SELECT doc_id, n_terms_hit, round(score, 4) AS score
FROM agg WHERE doc_id % 7 <> 0
ORDER BY agg.score DESC, doc_id ASC LIMIT 10
"""


#: sf_dir → merged-index root (shards built once per process)
_MERGED_TEXTINDEX_CACHE: dict[str, str] = {}


def q_bm25_index_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental postings maintenance, served: the corpus is built
    as THREE disjoint postings shards (doc_id mod 3 — each tokenized
    independently, the way micro-batches or ingest partitions land)
    and folded with ``TextIndex.merge`` (postings union + df/stats
    addition, no re-tokenize). The merged index must score
    bit-identically to the one-shot build and the ad-hoc scan, so
    this entry shares ``bm25_search``'s oracle verbatim. The
    streaming composition (micro-batch shards → merge) is pinned by
    tests/test_streaming_media.py::test_stream_text_index_merge_matches_adhoc."""
    import os

    from coltt_spark.textindex import TextIndex
    from coltt_spark.tmpdirs import scratch_dir

    if sf_dir not in _MERGED_TEXTINDEX_CACHE:
        root = scratch_dir(prefix="coltt_textidx_merged_")
        docs = load_table(spark, sf_dir, "documents")
        shards = [
            TextIndex.build(
                docs.filter(F.col("doc_id") % 3 == i),
                "doc_id",
                "text",
                os.path.join(root, f"shard_{i}"),
                n_files=4,
            )
            for i in range(3)
        ]
        TextIndex.merge(shards, os.path.join(root, "merged"))
        _MERGED_TEXTINDEX_CACHE[sf_dir] = os.path.join(root, "merged")
    return TextIndex(spark, _MERGED_TEXTINDEX_CACHE[sf_dir]).search(_BM25_QUERY)


def q_collection_hybrid_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-level hybrid serving: the ``layout="blocks"``
    collection's packed-index KNN candidates fused with the inverted
    BM25 index's candidates by reciprocal-rank fusion on the primary
    key (`Collection.search_hybrid_text`, catalog.py) — the COMPOSED
    path, not just its two independently-verified halves. The
    reference's hybrid stops at filter ∩ candidates
    (edge/none_vectorstore.go:182-253); this is the lexical+vector
    fusion a modern vector DB layers on top."""
    from coltt_spark.registry import _blocks_collection, _query_vec

    coll = _blocks_collection(spark, sf_dir)
    idx = _text_index(spark, sf_dir, str_ids=True)
    return coll.search_hybrid_text(
        idx, _BM25_QUERY, _query_vec(spark, sf_dir)
    )


#: Oracle mirrors the composed path end-to-end: BM25 candidate list
#: (string-id tie-breaks!) + euclidean KNN candidate list over the
#: same corpus the blocks collection packed, RRF-fused. All id
#: ordering is VARCHAR — the collection pk is string, so '10' < '2'.
_ORACLE_COLLECTION_HYBRID_TEXT = f"""
WITH {_bm25_sql_core(query_terms(_BM25_QUERY), k1=BM25_K1, b=BM25_B)},
lex_top AS (
  SELECT CAST(doc_id AS VARCHAR) AS id, score
  FROM agg ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC LIMIT 50
),
lexr AS (
  SELECT id, row_number() OVER (ORDER BY score DESC, id ASC) AS r
  FROM lex_top
),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
vd AS (
  SELECT CAST(e.vec_id AS VARCHAR) AS id,
         sqrt(list_sum(list_transform(list_zip(e.embedding::DOUBLE[], q.qv),
              p -> (p[1] - p[2]) * (p[1] - p[2])))) AS dist
  FROM embeddings e, q
),
vec_top AS (SELECT id, dist FROM vd ORDER BY dist ASC, id ASC LIMIT 50),
vecr AS (
  SELECT id, row_number() OVER (ORDER BY dist ASC, id ASC) AS r
  FROM vec_top
),
fused AS (
  SELECT coalesce(l.id, v.id) AS id,
         coalesce(l.r, 0) AS bm25_rank, coalesce(v.r, 0) AS vec_rank,
         coalesce(1.0 / (60.0 + l.r), 0.0)
           + coalesce(1.0 / (60.0 + v.r), 0.0) AS rrf
  FROM lexr l FULL JOIN vecr v ON l.id = v.id
)
SELECT id, bm25_rank, vec_rank, round(rrf, 4) AS rrf_score
FROM fused ORDER BY rrf DESC, id ASC LIMIT 10
"""


def q_collection_hybrid_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid text+vector through the QUANTIZED layout (VERDICT r11
    #7): the ``layout="ivfpq", opq=True`` collection's full serving
    funnel — coarse probe → OPQ-rotated residual → LUT → batched ADC
    → refine cut → exact rerank — produces the vector candidate leg,
    fused with the inverted BM25 index's lexical leg by reciprocal-
    rank fusion on the primary key (`Collection.search_hybrid_text`,
    the same composed product path the blocks-layout twin verifies).
    The oracle replays BOTH legs end-to-end: the entire IVFADC+OPQ
    funnel over the inlined (R, book) constants and the BM25 scoring,
    then the identical RRF fold — so the quantized layout serves the
    full hybrid contract, not just its KNN half."""
    from coltt_spark.registry import _ivfpq_opq_collection, _query_vec

    coll = _ivfpq_opq_collection(spark, sf_dir)
    idx = _text_index(spark, sf_dir, str_ids=True)
    return coll.search_hybrid_text(
        idx, _BM25_QUERY, _query_vec(spark, sf_dir)
    )


def _collection_hybrid_ivfpq_oracle(sf_dir: str | None = None) -> str:
    """Lazy (callable) oracle — the OPQ funnel constants derive from
    the gate data. Vector leg: the shared funnel replay's ``refined``
    pool ranked (dist ASC, id ASC); lexical leg: the BM25 core ranked
    (score DESC, id ASC) over VARCHAR ids; RRF fold identical to
    _ORACLE_COLLECTION_HYBRID_TEXT."""
    return _hybrid_ivfpq_single_sql(sf_dir, 0, _BM25_QUERY)


def _hybrid_ivfpq_single_sql(
    sf_dir: str | None, vec_id: int, query_text: str
) -> str:
    """One (query_text, query_vector) hybrid replay — the funnel with
    the query vector swapped in (``qv_sql``), the BM25 core over the
    text's terms, the RRF fold. The single-query oracle IS the
    ``vec_id=0, _BM25_QUERY`` instance; the batch oracle UNION ALLs
    one instance per query_id (each branch a self-contained
    WITH-subquery, so the replay per query is literally the verified
    single-query replay)."""
    from coltt_spark.registry import _SF_GATE, _opq_funnel_sql

    qv_sql = (
        "SELECT embedding::DOUBLE[] AS qv FROM embeddings "
        f"WHERE vec_id = {int(vec_id)}"
    )
    return (
        _opq_funnel_sql(
            sf_dir if sf_dir is not None else _SF_GATE, qv_sql=qv_sql
        )
        + f""",
{_bm25_sql_core(query_terms(query_text), k1=BM25_K1, b=BM25_B)},
lex_top AS (
  SELECT CAST(doc_id AS VARCHAR) AS lid, score
  FROM agg ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC LIMIT 50
),
lexr AS (
  SELECT lid, row_number() OVER (ORDER BY score DESC, lid ASC) AS r
  FROM lex_top
),
vec_top AS (
  SELECT id, dist FROM refined ORDER BY dist ASC, id ASC LIMIT 50
),
vecr AS (
  SELECT id, row_number() OVER (ORDER BY dist ASC, id ASC) AS r
  FROM vec_top
),
fused AS (
  SELECT coalesce(l.lid, v.id) AS id,
         coalesce(l.r, 0) AS bm25_rank, coalesce(v.r, 0) AS vec_rank,
         coalesce(1.0 / (60.0 + l.r), 0.0)
           + coalesce(1.0 / (60.0 + v.r), 0.0) AS rrf
  FROM lexr l FULL JOIN vecr v ON l.lid = v.id
)
SELECT id, bm25_rank, vec_rank, round(rrf, 4) AS rrf_score
FROM fused ORDER BY rrf DESC, id ASC LIMIT 10
"""
    )


#: the batch-hybrid query set: (query_text, embeddings vec_id) per
#: query_id — three distinct texts over the corpus vocabulary, three
#: distinct query vectors
_HYBRID_BATCH_QUERIES: list[tuple[str, int]] = [
    (_BM25_QUERY, 0),
    ("scan filter merge sort", 1),
    ("stream window group batch", 2),
]


def q_collection_hybrid_ivfpq_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched hybrid serving through the quantized layout (VERDICT
    r12 #7): three (query_text, query_vector) pairs answered together
    — the vector legs ride ONE batched-ADC job over the union of
    probed lists (`Collection.search_batch`'s ivfpq path), the
    lexical legs ONE pruned postings read
    (`TextIndex.search_batch`), and fusion is the per-query RRF fold.
    Batch ≡ sequential `search_hybrid_text` is pinned by
    tests/test_fulltext.py; the oracle replays each query_id's ENTIRE
    funnel + BM25 + fusion as its own WITH-branch — literally the
    verified single-query replay, three times."""
    from coltt_spark.registry import _ivfpq_opq_collection, _query_vec

    coll = _ivfpq_opq_collection(spark, sf_dir)
    idx = _text_index(spark, sf_dir, str_ids=True)
    queries = {
        qid: (text, _query_vec(spark, sf_dir, vid))
        for qid, (text, vid) in enumerate(_HYBRID_BATCH_QUERIES)
    }
    res = coll.search_hybrid_text_batch(idx, queries)
    return res.select(
        F.col("query_id").cast("long").alias("query_id"),
        "id",
        "bm25_rank",
        "vec_rank",
        "rrf_score",
    )


def _collection_hybrid_ivfpq_batch_oracle(sf_dir: str | None = None) -> str:
    """Lazy batch oracle: UNION ALL of the single-query hybrid replay
    per query_id (DuckDB WITH-subquery branches — each branch is the
    self-contained verified single replay with its own funnel over
    that query's vector and its own BM25 terms)."""
    branches = [
        f"SELECT CAST({qid} AS BIGINT) AS query_id, * FROM "
        f"({_hybrid_ivfpq_single_sql(sf_dir, vid, text)})"
        for qid, (text, vid) in enumerate(_HYBRID_BATCH_QUERIES)
    ]
    return (
        "SELECT query_id, id, bm25_rank, vec_rank, rrf_score FROM ("
        + "\nUNION ALL\n".join(branches)
        + ")"
    )


def q_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user counts per event type (m=256
    registers over [[hash60]]), with the exact count alongside for
    accuracy inspection."""
    return hll_distinct(
        load_table(spark, sf_dir, "events"),
        "user_id",
        ["event_type"],
        include_exact=True,
    )


_ORACLE_DISTINCT_SKETCH = f"""
WITH h AS (
  SELECT event_type,
         user_id,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events WHERE user_id IS NOT NULL
),
r AS (SELECT event_type, user_id, h & 255 AS bucket, h >> 8 AS v FROM h),
reg AS (
  SELECT event_type, bucket,
         max(53 - length(ltrim(bin(v), '0'))) AS m,
         count(*) AS c
  FROM r GROUP BY event_type, bucket
),
-- empty registers in closed form (observed buckets always rank >= 1):
-- v0 = 256 - |observed|, harmonic sum = observed fold + v0 * 1.0
s AS (
  SELECT event_type,
         CAST(sum(c) AS BIGINT) AS n_rows,
         list_sum(list(power(2.0, -m) ORDER BY bucket))
           + CAST(256 - count(*) AS DOUBLE) AS s,
         256 - count(*) AS v0
  FROM reg GROUP BY event_type
),
ex AS (
  SELECT event_type, count(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY event_type
)
SELECT s.event_type, s.n_rows, ex.exact_distinct,
       round(CASE WHEN (CAST({ALPHA_256!r} AS DOUBLE) * 65536.0 / s.s) <= 640.0 AND s.v0 > 0
                  THEN 256.0 * ln(256.0 / s.v0)
                  ELSE CAST({ALPHA_256!r} AS DOUBLE) * 65536.0 / s.s END, 4) AS hll_distinct
FROM s JOIN ex USING (event_type)
"""


#: Probe keys for the count-min demo: the full head of the synthetic
#: vocabulary plus the rare tail token.
_CM_PROBES = [
    "agg", "big", "customer", "dup", "hash",
    "join", "order", "stream", "vector", "window",
]


def q_freq_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency estimates vs exact counts for the probe
    tokens — bounded-state (d·w counters) heavy-hitter counting."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("token"))
    sketch = cm_build(toks, "token")
    est = cm_estimate(sketch, _CM_PROBES).withColumnRenamed("key", "token")
    exact = (
        toks.where(F.col("token").isin(_CM_PROBES))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    return est.join(exact, on="token").select("token", "exact_n", "cm_estimate")


def _freq_sketch_oracle() -> str:
    params = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(MINHASH_PARAMS[:CM_D])
    )
    probes = ", ".join(f"('{t}')" for t in _CM_PROBES)
    in_list = ", ".join(f"'{t}'" for t in _CM_PROBES)
    return f"""
WITH t AS (SELECT unnest({_TOKS}) AS token FROM documents),
h AS (SELECT token, ('0x' || substr(md5(token), 1, 15))::BIGINT AS h FROM t),
params (r, a, b) AS (SELECT * FROM (VALUES {params})),
cells AS (
  SELECT h.token, p.r,
         ((p.a * (h.h % {HASH_P}) + p.b) % {HASH_P}) % {CM_W} AS cell
  FROM h, params p
),
sketch AS (SELECT r, cell, count(*) AS n FROM cells GROUP BY r, cell),
probes (token) AS (SELECT * FROM (VALUES {probes})),
ph AS (SELECT token, ('0x' || substr(md5(token), 1, 15))::BIGINT AS h FROM probes),
pc AS (
  SELECT ph.token, p.r,
         ((p.a * (ph.h % {HASH_P}) + p.b) % {HASH_P}) % {CM_W} AS cell
  FROM ph, params p
),
est AS (
  SELECT pc.token, min(coalesce(s.n, 0)) AS cm_estimate
  FROM pc LEFT JOIN sketch s ON pc.r = s.r AND pc.cell = s.cell
  GROUP BY pc.token
),
ex AS (
  SELECT token, count(*) AS exact_n FROM t
  WHERE token IN ({in_list}) GROUP BY token
)
SELECT e.token, ex.exact_n, e.cm_estimate
FROM est e JOIN ex USING (token)
"""


_QS = [0.25, 0.5, 0.75, 0.95, 0.99]


def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-sketch price quantiles over lineitem — the
    bounded-state alternative to `price_percentiles`' exact per-group
    sort: one hash aggregation onto power-of-two bins, cumulative
    walk over the tiny histogram."""
    from coltt_spark.operators.sketch import quantile_histogram

    return quantile_histogram(
        load_table(spark, sf_dir, "lineitem"), "l_extendedprice", _QS
    )


def _quantile_sketch_oracle() -> str:
    from coltt_spark.operators.sketch import QS_BIN_WIDTH

    w = QS_BIN_WIDTH
    qvals = ", ".join(f"({q!r})" for q in _QS)
    return f"""
WITH hist AS (
  SELECT CAST(floor(l_extendedprice / {w!r}) AS BIGINT) AS bin, count(*) AS n
  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY bin
),
cum AS (
  SELECT bin,
         sum(n) OVER (ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         CAST(sum(n) OVER (ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS BIGINT) AS n_rows
  FROM hist
),
qs AS (SELECT CAST(q AS DOUBLE) AS q FROM (VALUES {qvals}) v(q)),
picked AS (
  SELECT q, n_rows, min(bin) AS b
  FROM cum, qs
  WHERE cum >= ceil(q * n_rows)
  GROUP BY q, n_rows
)
SELECT q, n_rows, round(b * {w!r} + {w / 2.0!r}, 4) AS est FROM picked
"""


FULLTEXT_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "bm25_search": q_bm25_search,
    "bm25_indexed": q_bm25_indexed,
    "bm25_topk_batch": q_bm25_batch,
    "hybrid_rrf": q_hybrid_rrf,
    "collection_hybrid_text": q_collection_hybrid_text,
    "collection_hybrid_ivfpq": q_collection_hybrid_ivfpq,
    "collection_hybrid_ivfpq_batch": q_collection_hybrid_ivfpq_batch,
    "bm25_index_merged": q_bm25_index_merged,
    "bm25_index_deleted": q_bm25_index_deleted,
    "distinct_sketch": q_distinct_sketch,
    "freq_sketch": q_freq_sketch,
    "quantile_sketch": q_quantile_sketch,
}

FULLTEXT_ORACLES: dict[str, str | Callable[..., str]] = {
    "bm25_search": _ORACLE_BM25,
    "bm25_indexed": _ORACLE_BM25,
    "bm25_topk_batch": _bm25_batch_oracle(),
    "hybrid_rrf": _ORACLE_HYBRID_RRF,
    "collection_hybrid_text": _ORACLE_COLLECTION_HYBRID_TEXT,
    # lazy: the OPQ funnel constants derive from the gate data
    "collection_hybrid_ivfpq": _collection_hybrid_ivfpq_oracle,
    # lazy callable — three WITH-branches of the single-query replay
    "collection_hybrid_ivfpq_batch": _collection_hybrid_ivfpq_batch_oracle,
    "bm25_index_merged": _ORACLE_BM25,
    "bm25_index_deleted": _ORACLE_BM25_DELETED,
    "distinct_sketch": _ORACLE_DISTINCT_SKETCH,
    "freq_sketch": _freq_sketch_oracle(),
    "quantile_sketch": _quantile_sketch_oracle(),
}
