"""Training-data pipeline section of the query registry.

Queries over the ``documents`` table exercising
:mod:`coltt_spark.operators.pipeline` — chunking, benchmark
decontamination, stratified sampling, shard export, sequence packing
— each with an exact DuckDB oracle (same md5-derived ``hash60`` and
tokenizer recipes the dedup/text oracles already share).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coltt_spark.operators.pipeline import (
    PII_PATTERNS,
    chunk_documents,
    decontaminate,
    decontaminate_bloom,
    fraction_sample,
    pack_sequences,
    redact_pii,
    semantic_decontaminate,
    shard_assign,
    source_mix,
    stratified_sample,
)
from coltt_spark.sources.tables import load_table

#: shared DuckDB fragments — the portable tokenizer and 60-bit hash
_DD_TOKS = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')"
)
_DD_H60 = "('0x' || substr(md5({x}), 1, 15))::BIGINT"


def q_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (size 64, stride 48) of every document
    — the tokenize-and-window step in front of an embedding or
    training pipeline. Zero-shuffle narrow plan."""
    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, "doc_id", "text", size=64, stride=48)


_ORACLE_DOC_CHUNK = f"""
WITH t AS (SELECT doc_id, {_DD_TOKS} AS toks FROM documents),
g AS (SELECT unnest(generate_series(0, (SELECT max(len(toks)) FROM t) // 48)) AS i),
c AS (
  SELECT doc_id, g.i AS chunk_id, toks[g.i * 48 + 1 : g.i * 48 + 64] AS chunk
  FROM t CROSS JOIN g
  WHERE g.i * 48 < len(toks)
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(len(chunk) AS BIGINT) AS n_tokens,
       array_to_string(chunk, ' ') AS chunk_text
FROM c
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every tenth document plays the held
    -out eval set; training documents sharing any distinct 5-gram
    shingle with it are flagged (the planted near-duplicate pairs in
    the corpus are exactly what this catches). Benchmark side is
    broadcast — the corpus never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter((docs.doc_id % 10) == 0)
    train = docs.filter((docs.doc_id % 10) != 0)
    return decontaminate(train, bench, "doc_id", "text", ngram=5, min_hits=1)


#: 5-gram shingle-hash CTE prefix shared by the decontamination
#: oracles — ends in shd(doc_id, sh) of DISTINCT shingle hashes.
_SHINGLE5_CTES = f"""
toks AS (SELECT doc_id, {_DD_TOKS} AS tk FROM documents),
shing AS (
  SELECT doc_id, unnest(CASE WHEN len(tk) < 5 THEN []::VARCHAR[]
      ELSE list_transform(range(1, len(tk) - 3), i -> array_to_string(tk[i:i+4], ' ')) END) AS s
  FROM toks
),
shd AS (SELECT DISTINCT doc_id, {_DD_H60.format(x="s")} AS sh FROM shing)"""


_ORACLE_DECONTAMINATE = f"""
WITH {_SHINGLE5_CTES},
b AS (SELECT doc_id AS bench_id, sh FROM shd WHERE doc_id % 10 = 0),
t AS (SELECT doc_id, sh FROM shd WHERE doc_id % 10 <> 0)
SELECT t.doc_id,
       CAST(count(DISTINCT t.sh) AS BIGINT) AS n_hit_shingles,
       CAST(count(DISTINCT b.bench_id) AS BIGINT) AS n_benchmark_docs
FROM t JOIN b USING (sh)
GROUP BY t.doc_id
HAVING count(DISTINCT t.sh) >= 1
"""


from coltt_spark.registry_dedup import (  # noqa: E402
    _FLIPPED_PLANTS_SQL,
    _flipped_bench_plants,
)


def q_decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMBEDDING-space decontamination: every 50th embedding plays the
    benchmark suite; the training corpus contains the benchmark rows
    verbatim (the common raw-leak case), planted ×1.2-scaled copies
    (cosine-invariant — "the eval item re-embedded inside a training
    document"), AND planted sign-flip paraphrases — copies whose 1-3
    smallest components among the first 16 flip sign, the leak class
    the r10 single-block sign-LSH missed by construction (VERDICT r10
    #2). Multi-band sign-LSH (4 bands × 16 bits over disjoint
    coordinate slices, OR-union of candidate blocks) makes the
    bipartite comparison an equi-join on the exploded band key with
    the tiny benchmark side broadcast; ≤ 3 flips dirty ≤ 3 bands, so
    every planted paraphrase still collides by pigeonhole. The oracle
    replays the plants, every band key, the cosine folds, the
    threshold, and the per-id aggregation."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    bench = emb.filter(F.col("vec_id") % 50 == 0)
    copies = bench.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.2)).alias("embedding"),
    )
    train = emb.unionByName(copies).unionByName(_flipped_bench_plants(bench))
    return semantic_decontaminate(
        train, bench, "vec_id", "embedding", threshold=0.95, bands=4, band_bits=16
    )


def _decontaminate_semantic_oracle() -> str:
    from coltt_spark.operators.dedup import sign_bands_sql

    tkeys = ", ".join(sign_bands_sql("v", bands=4, band_bits=16))
    bkeys = ", ".join(sign_bands_sql("bv", bands=4, band_bits=16))
    return f"""
WITH bench AS (
  SELECT vec_id AS bench_id, embedding::DOUBLE[] AS bv
  FROM embeddings WHERE vec_id % 50 = 0
),
bb AS (SELECT bench_id, bv, unnest([{bkeys}]) AS bkey FROM bench),
train AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, list_transform(embedding::DOUBLE[], x -> x * 1.2)
  FROM embeddings WHERE vec_id % 50 = 0
  UNION ALL
{_FLIPPED_PLANTS_SQL}
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE vec_id % 50 = 0)
),
tb AS (SELECT vec_id, v, unnest([{tkeys}]) AS bkey FROM train),
hits AS (
  SELECT t.vec_id, b.bench_id,
         list_dot_product(t.v, b.bv) /
         (sqrt(list_dot_product(t.v, t.v)) * sqrt(list_dot_product(b.bv, b.bv))) AS cs
  FROM tb t JOIN bb b USING (bkey)
)
SELECT vec_id,
       CAST(count(DISTINCT bench_id) AS BIGINT) AS n_benchmark_hits,
       round(max(cs), 4) AS max_cos_sim
FROM hits WHERE cs >= 0.95
GROUP BY vec_id
"""


def q_decontaminate_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level benchmark decontamination over the multilingual
    fixture: the eval set is every tenth BASE document; the training
    side keeps every planted variant (1-char-CJK-suffix near-dups and
    whitespace-mangled copies), so variants of eval documents are the
    planted contamination. Word-shingle decontamination sees NOTHING
    here — the corpus has no [a-z0-9] 5-grams — which is exactly the
    multilingual blind spot this entry closes. Benchmark side
    broadcast, corpus never shuffles (same topology as
    ``decontaminate``)."""
    from coltt_spark.registry_dedup import _uni_neardup_docs

    corpus = _uni_neardup_docs(spark, sf_dir)
    is_bench = (F.col("doc_id") < 500000) & (F.col("doc_id") % 10 == 0)
    bench = corpus.filter(is_bench)
    train = corpus.filter(~is_bench)
    return decontaminate(
        train, bench, "doc_id", "text", min_hits=1, byte_level=True, n_bytes=24
    )


def _decontaminate_bytes_oracle() -> str:
    from coltt_spark.registry_dedup import _byte_shingles_cte

    return f"""
WITH {_byte_shingles_cte(24)},
b AS (SELECT doc_id AS bench_id, sh FROM shd WHERE doc_id < 500000 AND doc_id % 10 = 0),
t AS (SELECT doc_id, sh FROM shd WHERE NOT (doc_id < 500000 AND doc_id % 10 = 0))
SELECT t.doc_id,
       CAST(count(DISTINCT t.sh) AS BIGINT) AS n_hit_shingles,
       CAST(count(DISTINCT b.bench_id) AS BIGINT) AS n_benchmark_docs
FROM t JOIN b USING (sh)
GROUP BY t.doc_id
HAVING count(DISTINCT t.sh) >= 1
"""


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language quota sample (25 docs per ``lang``)
    ranked by the md5-derived hash — the reproducible training-mix
    sampler. One shuffle, on the stratum key."""
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(docs, "doc_id", "lang", quota=25)


_ORACLE_SAMPLE_STRATIFIED = f"""
WITH n AS (SELECT lang, count(*) AS sn FROM documents GROUP BY lang),
f AS (
  SELECT d.doc_id, d.lang, {_DD_H60.format(x="d.doc_id::VARCHAR")} AS h
  FROM documents d JOIN n USING (lang)
  WHERE ({_DD_H60.format(x="d.doc_id::VARCHAR")})::DOUBLE
        < 456.0 / sn * 1152921504606846976.0
),
r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY h ASC, doc_id ASC) AS rk
  FROM f
)
SELECT doc_id, lang, CAST(rk AS BIGINT) AS sample_rank FROM r WHERE rk <= 25
"""


def q_export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 8-way shard assignment + per-shard balance stats
    (the pre-flight check before ``write.partitionBy("shard")``) —
    the stable analogue of the reference's FNV-mod-16 shard routing
    (``pkg/sharding/shard.go:34-47``)."""
    docs = load_table(spark, sf_dir, "documents")
    return shard_assign(docs, "doc_id", n_shards=8, text_col="text")


_ORACLE_EXPORT_SHARDS = f"""
WITH t AS (
  SELECT CAST({_DD_H60.format(x="doc_id::VARCHAR")} % 8 AS INT) AS shard,
         len({_DD_TOKS}) AS nt, doc_id
  FROM documents
)
SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS total_tokens,
       min(doc_id) AS min_id, max(doc_id) AS max_id
FROM t GROUP BY shard
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy in-order sequence packing into 256-token training
    sequences, independently per deterministic shard (no global sort
    — the per-worker packing shape a streaming tokenizer uses)."""
    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs, "doc_id", "text", budget=256, n_shards=8)


_ORACLE_PACK_SEQUENCES = f"""
WITH t AS (
  SELECT CAST({_DD_H60.format(x="doc_id::VARCHAR")} % 8 AS INT) AS shard,
         {_DD_H60.format(x="doc_id::VARCHAR")} AS h,
         doc_id, len({_DD_TOKS}) AS nt
  FROM documents
),
c AS (
  SELECT shard, doc_id, nt,
         sum(nt) OVER (PARTITION BY shard ORDER BY h ASC, doc_id ASC
                       ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
),
p AS (SELECT shard, floor((cum - nt) / 256) AS seq_id, doc_id, nt FROM c)
SELECT shard, CAST(seq_id AS BIGINT) AS seq_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS seq_tokens
FROM p GROUP BY shard, seq_id
"""


def q_pack_sequences_firstfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit-with-restart sequence packing: same deterministic
    per-shard order as `pack_sequences`, but a document that would
    push the running fill past the budget starts a NEW sequence
    (overshoot only when one document alone exceeds it) — the
    alternative packing contract ADVICE r3 asked to pin with its own
    oracle. The sequential per-shard fold runs as applyInPandas; the
    oracle replays it as a DuckDB recursive CTE."""
    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(
        docs, "doc_id", "text", budget=256, n_shards=8, mode="first_fit"
    )


#: first-fit fold as a recursive CTE: one recursion step per document
#: per shard, carrying (fill, seq_id). The restart guard mirrors the
#: operator exactly: restart only when the CURRENT fill is non-zero
#: AND adding the doc would exceed the budget.
_ORACLE_PACK_SEQUENCES_FIRSTFIT = f"""
WITH RECURSIVE t AS (
  SELECT CAST({_DD_H60.format(x="doc_id::VARCHAR")} % 8 AS INT) AS shard,
         {_DD_H60.format(x="doc_id::VARCHAR")} AS h,
         doc_id, len({_DD_TOKS}) AS nt
  FROM documents
),
o AS (
  SELECT shard, doc_id, nt,
         row_number() OVER (PARTITION BY shard ORDER BY h ASC, doc_id ASC) AS rn
  FROM t
),
fold AS (
  SELECT shard, rn, nt, nt AS fill, CAST(0 AS BIGINT) AS seq_id
  FROM o WHERE rn = 1
  UNION ALL
  SELECT o.shard, o.rn, o.nt,
         CASE WHEN f.fill > 0 AND f.fill + o.nt > 256
              THEN o.nt ELSE f.fill + o.nt END,
         CASE WHEN f.fill > 0 AND f.fill + o.nt > 256
              THEN f.seq_id + 1 ELSE f.seq_id END
  FROM fold f JOIN o ON o.shard = f.shard AND o.rn = f.rn + 1
)
SELECT shard, seq_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS seq_tokens
FROM fold GROUP BY shard, seq_id
"""



def q_sample_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free deterministic ~10% sample — a pure hash filter the
    scan absorbs; stable across engines and reruns."""
    docs = load_table(spark, sf_dir, "documents")
    return fraction_sample(docs, "doc_id", denominator=10)


_ORACLE_SAMPLE_FRACTION = f"""
SELECT doc_id, {_DD_H60.format(x="doc_id::VARCHAR")} AS sample_hash
FROM documents
WHERE {_DD_H60.format(x="doc_id::VARCHAR")} % 10 = 0
"""


def q_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened (α = 1/2) source rebalancing: the
    multilingual mixing rule as a deterministic hash-threshold filter;
    over-represented sources are downsampled toward share^α targets.
    Every float step (division, sqrt, source-ordered sequential sum)
    is correctly-rounded IEEE, so the oracle reproduces the exact row
    set."""
    from coltt_spark.operators.pipeline import temperature_sample

    docs = load_table(spark, sf_dir, "documents")
    return temperature_sample(docs, "doc_id", "source")


_ORACLE_SAMPLE_TEMPERATURE = f"""
WITH n AS (SELECT source, count(*) AS cnt FROM documents GROUP BY source),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM n),
zt AS (
  SELECT list_sum(list(sqrt(cnt::DOUBLE / total) ORDER BY source)) AS z
  FROM n, tot
),
r AS (
  SELECT n.source,
         least(1.0, (sqrt(cnt::DOUBLE / total) / z) / (cnt::DOUBLE / total)) AS rate
  FROM n, tot, zt
)
SELECT d.doc_id, d.source, round(r.rate, 4) AS keep_rate
FROM documents d JOIN r ON r.source = d.source
WHERE ({_DD_H60.format(x="d.doc_id::VARCHAR")})::DOUBLE
      < r.rate * 1152921504606846976.0
"""


def q_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus audit: counts, token totals, token share,
    average lengths — the table a curator reads before setting
    training-mix weights."""
    docs = load_table(spark, sf_dir, "documents")
    return source_mix(docs, "doc_id", "text", "source")


_ORACLE_SOURCE_MIX = f"""
WITH per AS (
  SELECT source, len({_DD_TOKS}) AS t, length(text) AS c FROM documents
),
agg AS (
  SELECT source, count(*) AS n_docs, CAST(sum(t) AS BIGINT) AS total_tokens,
         round(avg(t), 4) AS avg_tokens, round(avg(c), 4) AS avg_chars
  FROM per GROUP BY source
)
SELECT source, n_docs, total_tokens, avg_tokens, avg_chars,
       round(total_tokens / (SELECT sum(total_tokens)::DOUBLE FROM agg), 4) AS token_share
FROM agg
"""



_ARCHIVE_CACHE: dict = {}


def q_archive_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archive-corpus ingestion round-trip — the formats real corpora
    ARRIVE in: the documents table exported as 4 hash-routed ZIP
    shards, 4 tar.gz shards, AND 4 WARC shards (the Common Crawl
    delivery format — one gzip member per resource record,
    Content-Length-framed), then read back through the ``binaryFile``
    → stdlib-extract kernel (one task per archive — archives are not
    splittable, so parallelism == shard count by construction). The
    output proves byte-level text fidelity (md5), member/record
    identity, ALL THREE container walks, and routing determinism:
    the shard is parsed from the ARCHIVE FILE NAME each row actually
    came from and must equal the recomputed hash route in the
    oracle."""
    from pyspark.sql import functions as F

    from coltt_spark.sources.archives import read_archive_docs, write_archive_shards
    from coltt_spark.tmpdirs import scratch_dir

    if sf_dir not in _ARCHIVE_CACHE:
        docs = load_table(spark, sf_dir, "documents")
        paths = {}
        for fmt in ("zip", "tar", "warc"):
            p = scratch_dir(prefix=f"coltt_{fmt}_")
            write_archive_shards(
                docs, p, id_col="doc_id", n_shards=4, fmt=fmt
            ).collect()
            paths[fmt] = p
        _ARCHIVE_CACHE[sf_dir] = paths
    paths = _ARCHIVE_CACHE[sf_dir]
    parts = [
        read_archive_docs(spark, p).withColumn("kind", F.lit(fmt))
        for fmt, p in paths.items()
    ]
    both = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return both.select(
        "doc_id",
        "kind",
        F.md5("text").alias("text_md5"),
        F.regexp_extract("archive", r"shard-(\d+)", 1).cast("long").alias("shard"),
    )


_ORACLE_ARCHIVE_ROUNDTRIP = f"""
SELECT doc_id, k.kind AS kind, md5(text) AS text_md5,
       CAST({_DD_H60.format(x="doc_id::VARCHAR")} % 4 AS BIGINT) AS shard
FROM documents, (SELECT unnest(['zip', 'tar', 'warc']) AS kind) k
"""


_WARC_HTML_CACHE: dict = {}


def q_warc_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Common-Crawl-shaped ingestion chain end-to-end: fabricate
    a deterministic HTML page per document (four markup flavors on
    ``doc_id % 4`` — attribute soup with a quoted ``>``, comment
    traps, a script whose body contains fake tags, a style element,
    nested inline tags — all extracting to IDENTICAL text), ship the
    pages as 4 hash-routed ``text/html`` WARC shards (one gzip
    member per record), read them back through ``binaryFile`` →
    ``read_warc_records``, and run the linear-scanner HTML→text
    extraction (:mod:`coltt_spark.operators.html_text`). The output
    fingerprints the extraction (md5 / line count / char count); the
    oracle regenerates the EXPECTED text from the source column in
    SQL — title line, whitespace-collapsed document text, the
    entity-decoded line, the anchor line — and never sees HTML or
    WARC bytes, so a bug in the record walk, the raw-text skip, the
    quote-aware tag scan, entity decoding, block segmentation, or
    whitespace collapse breaks value parity."""
    from coltt_spark.operators.html_text import (
        html_extract,
        html_page_table,
        html_text_stats,
    )
    from coltt_spark.sources.archives import read_warc_records, write_archive_shards
    from coltt_spark.tmpdirs import scratch_dir

    if sf_dir not in _WARC_HTML_CACHE:
        docs = load_table(spark, sf_dir, "documents")
        p = scratch_dir(prefix="coltt_warc_html_")
        write_archive_shards(
            html_page_table(docs),
            p,
            id_col="doc_id",
            text_col="html",
            n_shards=4,
            fmt="warc",
            content_type="text/html",
        ).collect()
        _WARC_HTML_CACHE[sf_dir] = p
    recs = read_warc_records(spark, _WARC_HTML_CACHE[sf_dir]).filter(
        F.col("content_type") == "text/html"
    )
    pages = recs.select(
        F.regexp_extract("uri", r"urn:doc:(-?\d+)", 1).cast("long").alias("doc_id"),
        F.col("payload").alias("html"),
    )
    return html_text_stats(html_extract(pages))


_ORACLE_WARC_HTML_EXTRACT = """
WITH nt AS (
  SELECT doc_id,
         trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')) AS t
  FROM documents
), exp AS (
  SELECT doc_id,
         'Doc ' || doc_id || chr(10)
         || CASE WHEN t = '' THEN '' ELSE t || chr(10) END
         || 'Tom & Jerry <"quoted''>' || chr(10) || 'Read more' AS e
  FROM nt
)
SELECT doc_id, md5(e) AS text_md5,
       CAST(length(e) - length(replace(e, chr(10), '')) + 1 AS BIGINT) AS n_lines,
       CAST(length(e) AS BIGINT) AS n_chars
FROM exp
"""


def q_web_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup — the step between crawl ingestion and text
    processing in every web pipeline (C4/RefinedWeb style): fabricate
    a deterministically MESSY url per document (case-varied scheme
    and host, default ports, ``utm_``/``gclid``/``ref`` tracking
    params in three arrangements, fragments — with ``doc_id % 97``
    collision groups so real duplicates exist under the mess), apply
    the five-step normalization contract
    (:mod:`coltt_spark.functions.urls` — pure Catalyst regexp/array
    expressions, NO Python, whole-stage codegen), extract host +
    registrable domain (eTLD+1 heuristic incl. ``co.uk``-family
    two-level suffixes), and group by the canonical URL (ONE shuffle
    with map-side combine). The oracle replays fabrication AND
    normalization in DuckDB SQL, so any divergence in the regexp
    semantics, the param filter, the port/fragment rules, or the
    domain heuristic breaks value parity."""
    from coltt_spark.functions.urls import (
        registrable_domain_expr,
        url_host,
        url_normalize,
    )

    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    base = (d % 97).cast("string")
    host = (
        F.when((d % 4 == 0) & (d % 2 == 0), F.lit("Example.COM"))
        .when((d % 4 == 2) & (d % 2 == 0), F.lit("example.com:80"))
        .when(d % 4 == 1, F.lit("Blog.Example.co.UK"))
        .otherwise(F.lit("blog.example.co.uk:80"))
    )
    scheme = F.when(d % 8 < 4, F.lit("HTTP")).otherwise(F.lit("http"))
    query = (
        F.when(d % 3 == 0, F.concat(F.lit("?utm_source=feed&id="), base))
        .when(d % 3 == 1, F.concat(F.lit("?id="), base, F.lit("&utm_campaign=x&gclid=abc")))
        .otherwise(F.concat(F.lit("?ref=rss&id="), base))
    )
    frag = F.when(d % 5 == 0, F.lit("#Section-2")).otherwise(F.lit(""))
    messy = F.concat(
        scheme, F.lit("://"), host, F.lit("/Articles/"), base, query, frag
    )
    # two-step select: alias the host once, then apply the PSL chain
    # via registrable_domain_expr — ONE JVM-parsed expression instead
    # of ~3.3k per-literal py4j round-trips per query construction
    # (r13-opt; same values, still a narrow codegen projection — the
    # alias materializes the host CASE once in an inner Project where
    # the single-select form re-inlined it per reference; plan guard
    # pins the no-Exchange/no-Join shape)
    urls = docs.select(
        "doc_id",
        url_normalize(messy).alias("url"),
        url_host(messy).alias("_h"),
    ).select(
        "doc_id",
        "url",
        registrable_domain_expr("_h").alias("domain"),
    )
    return (
        urls.groupBy("url", "domain")
        .agg(
            F.count("*").cast("long").alias("n_urls"),
            F.min("doc_id").alias("first_doc"),
        )
        .select("url", "domain", "n_urls", "first_doc")
    )


def q_web_url_psl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSL-backed registrable-domain extraction across every rule
    class the shipped publicsuffix.org snapshot exercises (r7 —
    VERDICT r6 Missing #2): fabricated hosts cycle through an
    unknown-to-the-old-heuristic default case, two-level ccTLD
    registries (``co.nz``, ``com.tw``, ``co.id``), private-section
    hosting suffixes (``github.io`` subdomains are SEPARATE
    registrable domains), 3-label rules (``k12.ca.us``,
    ``s3.amazonaws.com``), the wildcard ``*.ck``, its ``!www.ck``
    exception, ``*.np``, and bare-suffix/single-label whole-host
    fallbacks. Both the Catalyst expression and the oracle's CASE are
    GENERATED from the same parsed rule file, so any drift in rule
    precedence (exceptions > most-labels), wildcard arithmetic, or
    the whole-host fallback breaks value parity."""
    from coltt_spark.functions.urls import registrable_domain_expr

    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    k = (d % 5).cast("string")
    host = (
        F.when(d % 12 == 0, F.concat(F.lit("site"), k, F.lit(".example.com")))
        .when(d % 12 == 1, F.concat(F.lit("shop"), k, F.lit(".foo.co.nz")))
        .when(d % 12 == 2, F.concat(F.lit("foo"), k, F.lit(".com.tw")))
        .when(d % 12 == 3, F.concat(F.lit("blog"), k, F.lit(".co.id")))
        .when(d % 12 == 4, F.concat(F.lit("user"), k, F.lit(".github.io")))
        .when(d % 12 == 5, F.concat(F.lit("deep"), k, F.lit(".k12.ca.us")))
        .when(d % 12 == 6, F.concat(F.lit("bar"), k, F.lit(".foo.ck")))
        .when(d % 12 == 7, F.concat(F.lit("sub"), k, F.lit(".www.ck")))
        .when(d % 12 == 8, F.concat(F.lit("b"), k, F.lit(".a.np")))
        .when(
            d % 12 == 9,
            F.concat(F.lit("bucket"), k, F.lit(".s3.amazonaws.com")),
        )
        .when(d % 12 == 10, F.lit("github.io"))  # bare suffix
        .otherwise(F.lit("localhost"))  # single label
    )
    # alias-then-apply: the PSL chain parses JVM-side in one call
    # (r13-opt, see registrable_domain_expr) — same values, still a
    # narrow codegen projection (host materialized once in an inner
    # Project; plan guard pins the shape)
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        host.alias("host"),
    ).select(
        "doc_id",
        "host",
        registrable_domain_expr("host").alias("domain"),
    )


def _web_url_psl_oracle() -> str:
    from coltt_spark.functions.urls import DD_REGISTRABLE_DOMAIN

    host = (
        "(CASE doc_id % 12"
        " WHEN 0 THEN 'site' || kk || '.example.com'"
        " WHEN 1 THEN 'shop' || kk || '.foo.co.nz'"
        " WHEN 2 THEN 'foo' || kk || '.com.tw'"
        " WHEN 3 THEN 'blog' || kk || '.co.id'"
        " WHEN 4 THEN 'user' || kk || '.github.io'"
        " WHEN 5 THEN 'deep' || kk || '.k12.ca.us'"
        " WHEN 6 THEN 'bar' || kk || '.foo.ck'"
        " WHEN 7 THEN 'sub' || kk || '.www.ck'"
        " WHEN 8 THEN 'b' || kk || '.a.np'"
        " WHEN 9 THEN 'bucket' || kk || '.s3.amazonaws.com'"
        " WHEN 10 THEN 'github.io'"
        " ELSE 'localhost' END)"
    )
    return f"""
WITH m AS (
  SELECT doc_id, {host} AS host
  FROM (SELECT doc_id, CAST(doc_id % 5 AS VARCHAR) AS kk FROM documents)
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, host,
       {DD_REGISTRABLE_DOMAIN.format(h="host")} AS domain
FROM m
"""


def q_web_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registrable-domain document quota (C4 / RefinedWeb style —
    no site may contribute more than ``cap`` documents): fabricate a
    ZIPF-ish host distribution where one megadomain
    (``news.portal.com.fj``) holds ~4/11 of the corpus and the rest
    spreads over gob.do / co.uk / *.kh-wildcard / github.io-private /
    host-is-suffix / org.mw / single-label domain classes (several
    covered only by the r9 PSL tranche), score each doc with a
    deterministic priority, and keep the top-3 per PSL-backed
    registrable domain via the skew-safe count-adaptive two-phase top-K
    (:func:`coltt_spark.operators.pipeline.domain_quota`). The oracle
    replays fabrication, the generated PSL CASE, and the quota as ONE
    window — provably equivalent to the salted two-phase rank — so
    any divergence in rule precedence, priority order, tie-break, or
    the pre-quota domain counts breaks value parity."""
    from coltt_spark.functions.urls import registrable_domain_expr
    from coltt_spark.operators.pipeline import domain_quota

    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    host = (
        F.when(d % 11 <= 3, F.lit("news.portal.com.fj"))
        .when(d % 11 == 4, F.concat(F.lit("m"), (d % 5).cast("string"), F.lit(".gob.do")))
        .when(d % 11 == 5, F.concat(F.lit("site"), (d % 7).cast("string"), F.lit(".co.uk")))
        .when(d % 11 == 6, F.concat(F.lit("s"), (d % 3).cast("string"), F.lit(".media.kh")))
        .when(d % 11 == 7, F.concat(F.lit("u"), (d % 5).cast("string"), F.lit(".github.io")))
        .when(d % 11 == 8, F.lit("saotome.st"))
        .when(d % 11 == 9, F.concat(F.lit("w"), (d % 4).cast("string"), F.lit(".org.mw")))
        .otherwise(F.lit("localhost"))
    )
    # alias-then-apply (r13-opt): one JVM-parsed PSL chain, not ~3.3k
    # py4j literal calls — same domain values, same plan shape
    rows = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        host.alias("_h"),
        ((d * 37) % 101).cast("long").alias("score"),
    ).select(
        "doc_id",
        registrable_domain_expr("_h").alias("domain"),
        "score",
    )
    # Materialize the PSL-resolved (doc_id, domain, score) projection
    # ONCE (r14-opt, guide §1.2/§5): domain_quota consumes its input
    # in two plan branches (the counts aggregate and the join side),
    # and Catalyst never shares consumer subtrees — without the
    # checkpoint the ~2.6k-rule registrable-domain CASE is evaluated
    # and codegen-compiled per branch. A real pipeline materializes
    # the domain column once; the lazy checkpoint (materialized
    # inside the first consuming job — no standalone action) models
    # exactly that. Per-run intermediate, nothing cached across runs.
    rows = rows.localCheckpoint(eager=False)
    # target sized so the fixture megadomain actually fans out
    # (sf0.01: 184 rows -> 3 salts; sf0.1: 1847 -> 29) — the driver
    # check exercises the salted machinery, not just its salts_d=1
    # degenerate
    return domain_quota(
        rows, "doc_id", "domain", "score", cap=3, target_partition_rows=64
    )


def _web_domain_quota_oracle() -> str:
    from coltt_spark.functions.urls import DD_REGISTRABLE_DOMAIN

    host = (
        "(CASE WHEN doc_id % 11 <= 3 THEN 'news.portal.com.fj'"
        " WHEN doc_id % 11 = 4 THEN 'm' || CAST(doc_id % 5 AS VARCHAR) || '.gob.do'"
        " WHEN doc_id % 11 = 5 THEN 'site' || CAST(doc_id % 7 AS VARCHAR) || '.co.uk'"
        " WHEN doc_id % 11 = 6 THEN 's' || CAST(doc_id % 3 AS VARCHAR) || '.media.kh'"
        " WHEN doc_id % 11 = 7 THEN 'u' || CAST(doc_id % 5 AS VARCHAR) || '.github.io'"
        " WHEN doc_id % 11 = 8 THEN 'saotome.st'"
        " WHEN doc_id % 11 = 9 THEN 'w' || CAST(doc_id % 4 AS VARCHAR) || '.org.mw'"
        " ELSE 'localhost' END)"
    )
    return f"""
WITH h AS (SELECT doc_id, {host} AS host FROM documents),
m AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         {DD_REGISTRABLE_DOMAIN.format(h="host")} AS domain,
         CAST((doc_id * 37) % 101 AS BIGINT) AS score
  FROM h
),
c AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_domain_docs FROM m GROUP BY domain),
r AS (
  SELECT m.*, CAST(row_number() OVER (
           PARTITION BY domain ORDER BY score DESC, doc_id ASC
         ) AS BIGINT) AS rk
  FROM m
)
SELECT r.doc_id, r.domain, r.score, r.rk, c.n_domain_docs
FROM r JOIN c USING (domain)
WHERE r.rk <= 3
"""


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level repeated-line removal (C4 / RefinedWeb line
    dedup) end-to-end: fabricate 4-line documents — a GLOBAL
    boilerplate line every document shares, the document's own text,
    a mid-frequency ``Category <doc_id % 7>`` line (~1/7 of the
    corpus each), and a unique per-document footer — then drop every
    line appearing in ≥ 3 distinct documents
    (:func:`coltt_spark.operators.pipeline.dedup_lines`: one
    count-distinct shuffle + a broadcast anti-lookup + one rebuild
    shuffle, no self-joins). The global and category lines must
    vanish, the body and footer survive in order; the oracle replays
    the fabrication AND the distinct-doc counting rule in SQL, so an
    off-by-one in the threshold, a lost line-order, or an
    occurrence-vs-document miscount breaks value parity."""
    from coltt_spark.operators.pipeline import dedup_lines

    docs = load_table(spark, sf_dir, "documents")
    multi = docs.select(
        "doc_id",
        F.concat(
            F.lit("Subscribe to our newsletter\n"),
            "text",
            F.lit("\nCategory "),
            (F.col("doc_id") % 7).cast("string"),
            F.lit("\nDoc footer "),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    out = dedup_lines(multi, "doc_id", "text", min_docs=3)
    return out.select(
        "doc_id", F.md5("text").alias("text_md5"), "n_kept", "n_removed"
    )


_ORACLE_LINE_DEDUP = """
WITH m AS (
  SELECT doc_id,
         'Subscribe to our newsletter' || chr(10) || text || chr(10)
         || 'Category ' || CAST(doc_id % 7 AS VARCHAR) || chr(10)
         || 'Doc footer ' || CAST(doc_id AS VARCHAR) AS mt
  FROM documents
), l AS (
  SELECT doc_id, i.pos, string_split(mt, chr(10))[i.pos] AS line
  FROM m, (SELECT unnest(generate_series(1, 4)) AS pos) i
), freq AS (
  SELECT line FROM l GROUP BY line HAVING count(DISTINCT doc_id) >= 3
), k AS (
  SELECT doc_id, pos, line, line IN (SELECT line FROM freq) AS dropped
  FROM l
)
SELECT doc_id,
       md5(coalesce(string_agg(line, chr(10) ORDER BY pos)
                    FILTER (WHERE NOT dropped), '')) AS text_md5,
       CAST(count(*) FILTER (WHERE NOT dropped) AS BIGINT) AS n_kept,
       CAST(count(*) FILTER (WHERE dropped) AS BIGINT) AS n_removed
FROM k GROUP BY doc_id
"""


def _web_url_oracle() -> str:
    from coltt_spark.functions.urls import (
        DD_REGISTRABLE_DOMAIN,
        DD_URL_HOST,
        DD_URL_NORMALIZE,
    )

    messy = (
        "(CASE WHEN doc_id % 8 < 4 THEN 'HTTP' ELSE 'http' END || '://' || "
        "CASE WHEN doc_id % 4 = 0 AND doc_id % 2 = 0 THEN 'Example.COM' "
        " WHEN doc_id % 4 = 2 AND doc_id % 2 = 0 THEN 'example.com:80' "
        " WHEN doc_id % 4 = 1 THEN 'Blog.Example.co.UK' "
        " ELSE 'blog.example.co.uk:80' END || "
        "'/Articles/' || CAST(doc_id % 97 AS VARCHAR) || "
        "CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&id=' || CAST(doc_id % 97 AS VARCHAR) "
        " WHEN doc_id % 3 = 1 THEN '?id=' || CAST(doc_id % 97 AS VARCHAR) || '&utm_campaign=x&gclid=abc' "
        " ELSE '?ref=rss&id=' || CAST(doc_id % 97 AS VARCHAR) END || "
        "CASE WHEN doc_id % 5 = 0 THEN '#Section-2' ELSE '' END)"
    )
    return f"""
WITH m AS (
  SELECT doc_id, {messy} AS messy FROM documents
), u AS (
  SELECT doc_id,
         {DD_URL_NORMALIZE.format(x="messy")} AS url,
         {DD_REGISTRABLE_DOMAIN.format(h=DD_URL_HOST.format(x="messy"))} AS domain
  FROM m
)
SELECT url, domain, CAST(count(*) AS BIGINT) AS n_urls,
       min(doc_id) AS first_doc
FROM u GROUP BY url, domain
"""


_FORMAT_CACHE: dict = {}


def q_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interchange-format round-trip through Spark's OTHER tabular
    sources — CSV and ORC — with the text column deliberately made
    CSV-HOSTILE first (embedded comma, double quote, and a real
    newline appended), so the writer's quoting, the reader's
    multiLine record splitting, and the RFC-4180 doubled-quote escape
    are all load-bearing: documents → CSV shard dir (header, quoted,
    escape='\"') → read back with an explicit schema → ORC → read
    back. The output proves byte-level text fidelity (md5 of the
    stressed text), column fidelity, and row completeness; the
    oracle derives the same md5 from the original table, so a
    quoting/escape/record-splitting bug in either hop breaks value
    parity (the JSONL sibling is ``jsonl_roundtrip``)."""
    from pyspark.sql import functions as F

    from coltt_spark.tmpdirs import scratch_dir

    if sf_dir not in _FORMAT_CACHE:
        docs = load_table(spark, sf_dir, "documents")
        stressed = docs.select(
            "doc_id",
            F.concat("text", F.lit(',"'), F.lit("\n"), "lang").alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        csv_path = scratch_dir(prefix="coltt_csv_")
        (
            stressed.write.mode("overwrite")
            .option("header", True)
            .option("escape", '"')
            .csv(csv_path)
        )
        back_csv = (
            spark.read.schema(
                "doc_id long, text string, lang string, source string, n_chars long"
            )
            .option("header", True)
            .option("multiLine", True)
            .option("escape", '"')
            .csv(csv_path)
        )
        orc_path = scratch_dir(prefix="coltt_orc_")
        back_csv.write.mode("overwrite").orc(orc_path)
        _FORMAT_CACHE[sf_dir] = orc_path
    back = spark.read.orc(_FORMAT_CACHE[sf_dir])
    return back.select(
        "doc_id",
        "lang",
        "n_chars",
        F.md5("text").alias("text_md5"),
    )


_ORACLE_FORMAT_ROUNDTRIP = """
SELECT doc_id, lang, n_chars,
       md5(text || ',"' || chr(10) || lang) AS text_md5
FROM documents
"""


_JSONL_CACHE: dict = {}


def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL sharded export → import round-trip: the documents table
    written as 8 deterministic hash-routed JSONL shard directories
    (the LLM-corpus interchange format) and read back with an
    explicit schema. The output proves byte-level text fidelity
    (md5), column fidelity, and routing determinism (the read-back
    partition column equals the recomputed hash route); the oracle is
    the original table with the same derivations."""
    from coltt_spark.tmpdirs import scratch_dir

    from pyspark.sql import functions as F

    from coltt_spark.sources.jsonl import read_jsonl, write_jsonl_shards

    if sf_dir not in _JSONL_CACHE:
        docs = load_table(spark, sf_dir, "documents")
        path = scratch_dir(prefix="coltt_jsonl_")
        write_jsonl_shards(docs, path, id_col="doc_id", n_shards=8)
        _JSONL_CACHE[sf_dir] = path
    back = read_jsonl(
        spark,
        _JSONL_CACHE[sf_dir],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    return back.select(
        "doc_id",
        "lang",
        "n_chars",
        F.md5("text").alias("text_md5"),
        F.col("shard").cast("long").alias("shard"),
    )


_ORACLE_JSONL_ROUNDTRIP = f"""
SELECT doc_id, lang, n_chars, md5(text) AS text_md5,
       CAST({_DD_H60.format(x="doc_id::VARCHAR")} % 8 AS BIGINT) AS shard
FROM documents
"""


def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-summarized decontamination: same benchmark split as
    `decontaminate`, but the corpus probes an 8 KB set-bit table
    instead of the raw benchmark shingle hashes — constant-size
    broadcast no matter how large the deny list grows. Deterministic
    false positives only over-flag."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter((docs.doc_id % 10) == 0)
    train = docs.filter((docs.doc_id % 10) != 0)
    return decontaminate_bloom(train, bench, "doc_id", "text", ngram=5, min_hits=1)


def _bloom_oracle() -> str:
    from coltt_spark.functions.text import HASH_P, MINHASH_PARAMS
    from coltt_spark.operators.sketch import BLOOM_K, BLOOM_M, CM_D

    params = ", ".join(
        f"({j}, {a}, {b})"
        for j, (a, b) in enumerate(MINHASH_PARAMS[CM_D : CM_D + BLOOM_K])
    )
    return f"""
WITH {_SHINGLE5_CTES},
bparams (j, a, b) AS (SELECT * FROM (VALUES {params})),
bbits AS (
  SELECT DISTINCT ((p.a * (shd.sh % {HASH_P}) + p.b) % {HASH_P}) % {BLOOM_M} AS bit
  FROM shd, bparams p WHERE shd.doc_id % 10 = 0
),
t AS (SELECT doc_id, sh FROM shd WHERE doc_id % 10 <> 0),
probe AS (
  SELECT t.doc_id, t.sh, p.j,
         ((p.a * (t.sh % {HASH_P}) + p.b) % {HASH_P}) % {BLOOM_M} AS bit
  FROM t, bparams p
),
pass AS (
  SELECT doc_id, sh FROM probe JOIN bbits USING (bit)
  GROUP BY doc_id, sh HAVING count(*) = {BLOOM_K}
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bloom_shingles
FROM pass GROUP BY doc_id HAVING count(*) >= 1
"""


def q_text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing value-checked end-to-end: deterministically
    inject emails / phone numbers (FOUR real-corpus shapes, cycled by
    doc_id: ``+1-555-XXXX``, ``(555) 123-XXXX``, ``555.123.XXXX``,
    ``+44 555 123 XXXX``) / SSNs (ids % 7) / IPv4 literals
    (ids % 5) — all derived from doc_id so the oracle rebuilds the
    identical dirty text in SQL — plus a NEGATIVE: a bare 10-digit
    product code (ids % 3 == 1) that must survive redaction
    untouched. Run the JVM-side `redact_pii` pass and compare the
    per-kind match COUNTS plus the md5 OF THE REDACTED TEXT — any
    divergence in regex-dialect matching, alternation order, or
    replacement order between engines (or a false positive on the
    product code) breaks the hash. All outputs are integers/strings:
    no float parity surface at all."""
    docs = load_table(spark, sf_dir, "documents")
    n4 = F.col("doc_id") % 10000
    phone = (
        F.when(F.col("doc_id") % 8 == 0, F.format_string(" call +1-555-%04d", n4))
        .when(F.col("doc_id") % 8 == 2, F.format_string(" call (555) 123-%04d", n4))
        .when(F.col("doc_id") % 8 == 4, F.format_string(" call 555.123.%04d", n4))
        .when(F.col("doc_id") % 8 == 6, F.format_string(" call +44 555 123 %04d", n4))
        .otherwise(F.lit(""))
    )
    dirty = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.expr(
                "repeat(format_string(' contact user%d@example.com', doc_id),"
                " cast(doc_id % 3 as int))"
            ),
            phone,
            F.when(
                F.col("doc_id") % 7 == 0,
                F.format_string(" ssn 123-45-%04d", n4),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 3 == 1,
                F.format_string(" sku 555123%04d", n4),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.format_string(" from 10.0.%d.%d", F.col("doc_id") % 256, F.col("doc_id") % 100),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    red = redact_pii(dirty)
    return red.select(
        "doc_id",
        "n_email",
        "n_phone",
        "n_ssn",
        "n_ip",
        F.md5("text").alias("redacted_md5"),
        F.length("text").cast("long").alias("redacted_len"),
    )


def _redact_oracle() -> str:
    """Generated from the SAME PII_PATTERNS constants the operator
    uses (single source of truth — the established sketch-oracle
    discipline)."""
    redacted = "text"
    for _, pat, token in PII_PATTERNS:
        redacted = f"regexp_replace({redacted}, '{pat}', '{token}', 'g')"
    counts = ",\n       ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{kind}"
        for kind, pat, _ in PII_PATTERNS
    )
    return f"""
WITH dirty AS (
  SELECT doc_id,
         text
         || repeat(' contact user' || CAST(doc_id AS VARCHAR) || '@example.com',
                   CAST(doc_id % 3 AS INT))
         || CASE WHEN doc_id % 8 = 0
                 THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 WHEN doc_id % 8 = 2
                 THEN ' call (555) 123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 WHEN doc_id % 8 = 4
                 THEN ' call 555.123.' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 WHEN doc_id % 8 = 6
                 THEN ' call +44 555 123 ' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 3 = 1
                 THEN ' sku 555123' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR)
                 ELSE '' END
         AS text
  FROM documents
)
SELECT doc_id,
       {counts},
       md5({redacted}) AS redacted_md5,
       CAST(length({redacted}) AS BIGINT) AS redacted_len
FROM dirty
"""


def q_web_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt URL filtering — the crawl-politeness gate between
    URL dedup and fetching: fabricate one robots.txt per domain
    (4 domains; a decoy group for another crawler that must be
    ignored, case-varied ``User-agent`` naming us exactly on even
    domains vs ``*`` on odd, longest-match Allow override under a
    Disallow prefix, an ``/admin`` prefix rule AFTER an ignored
    ``Crawl-delay`` directive, a ``$``-anchored exact-path rule, a
    ``*``-wildcard rule on half the domains, an explicit ``Allow: /``
    on odd domains, and an empty ``Disallow:`` that is no rule),
    parse ONCE PER DOMAIN with the pure-Catalyst RFC 9309 fold
    (:mod:`coltt_spark.operators.robots`), then BROADCAST the 4
    parsed rule arrays into the per-document URL table and decide
    per URL — zero shuffles end to end (plan pinned in
    tests/test_plans.py). The oracle regenerates the RULE TABLE from
    the fabrication formulas in SQL (it never sees robots.txt) and
    replays longest-match/Allow-tie with a window over
    regexp-matched rules, so a bug in group selection, directive
    parsing, wildcard/anchor regexification, specificity, or the
    tie rule breaks value parity."""
    from coltt_spark.functions.memo import memo_columns

    docs = load_table(spark, sf_dir, "documents")
    ex = memo_columns("q_web_robots_filter.exprs", _robots_exprs)
    urls = docs.select(
        "doc_id", ex["domain_of_doc"].alias("domain"), ex["path"].alias("path")
    )
    domains = spark.range(4).select(
        ex["domain_of_id"].alias("domain"), ex["rules"].alias("rules")
    )
    joined = urls.join(F.broadcast(domains), "domain")
    return joined.select(
        "doc_id",
        "domain",
        "path",
        ex["allowed"].alias("allowed"),
        ex["rule_len"].alias("rule_len"),
    )


def _robots_exprs() -> dict:
    """The web_robots_filter fabrication + RFC 9309 parse/decision
    Columns — fixed formulas over ``doc_id``/``id``/the join aliases,
    built once per session via memo_columns (~2.9k py4j round-trips
    to describe — r14-opt, guide §4)."""
    from coltt_spark.operators.robots import parse_robots, robots_decision

    d, k = F.col("doc_id") % 4, (F.col("doc_id") % 97).cast("string")
    path = (
        F.when(F.col("doc_id") % 6 == 0, F.concat(F.lit("/articles/p"), k))
        .when(F.col("doc_id") % 6 == 1, F.concat(F.lit("/private/p"), k))
        .when(F.col("doc_id") % 6 == 2, F.concat(F.lit("/admin/p"), k))
        .when(F.col("doc_id") % 6 == 3, F.concat(F.lit("/tmp/p"), k, F.lit(".json")))
        .when(F.col("doc_id") % 6 == 4, F.concat(F.lit("/tmp/p"), k, F.lit(".html")))
        .otherwise(F.concat(F.lit("/private/ok/p"), k))
    )
    dd = F.col("id")
    robots_txt = F.concat(
        F.lit("# robots for site"), dd.cast("string"), F.lit("\n"),
        F.lit("User-agent: otherbot\nDisallow: /\nAllow: /admin\n\n"),
        F.when(dd % 2 == 0, F.lit("User-agent: ColttBot\n")).otherwise(
            F.lit("User-agent: *\n")
        ),
        F.lit("Disallow: /private/\nAllow: /private/ok/\n"),
        F.lit("Crawl-delay: 10\nDisallow: /admin\n"),
        F.lit("Disallow: /articles/p13$\n"),
        F.when(dd >= 2, F.lit("Disallow: /tmp/*.json\n")).otherwise(F.lit("")),
        F.when(dd % 2 == 1, F.lit("Allow: /\n")).otherwise(F.lit("")),
        F.when(dd == 3, F.lit("Disallow:\n")).otherwise(F.lit("")),
    )
    best = robots_decision(F.col("path"), F.col("rules"))
    return {
        "domain_of_doc": F.concat(
            F.lit("site"), d.cast("string"), F.lit(".com")
        ),
        "path": path,
        "domain_of_id": F.concat(F.lit("site"), dd.cast("string"), F.lit(".com")),
        "rules": parse_robots(robots_txt, "colttbot"),
        "allowed": best["allow"],
        "rule_len": best["rlen"].cast("long"),
    }


_ORACLE_WEB_ROBOTS = r"""
WITH dom AS (SELECT unnest(generate_series(0, 3)) AS d),
rules AS (
  SELECT d, rlen, allow, pattern
  FROM dom, (VALUES (9, false, '^/private/'),
                    (12, true, '^/private/ok/'),
                    (6, false, '^/admin'),
                    (14, false, '^/articles/p13$')) r(rlen, allow, pattern)
  UNION ALL SELECT d, 11, false, '^/tmp/.*\.json' FROM dom WHERE d >= 2
  UNION ALL SELECT d, 1, true, '^/' FROM dom WHERE d % 2 = 1
),
urls AS (
  SELECT doc_id, doc_id % 4 AS d,
         'site' || CAST(doc_id % 4 AS VARCHAR) || '.com' AS domain,
         CASE doc_id % 6
           WHEN 0 THEN '/articles/p' || CAST(doc_id % 97 AS VARCHAR)
           WHEN 1 THEN '/private/p' || CAST(doc_id % 97 AS VARCHAR)
           WHEN 2 THEN '/admin/p' || CAST(doc_id % 97 AS VARCHAR)
           WHEN 3 THEN '/tmp/p' || CAST(doc_id % 97 AS VARCHAR) || '.json'
           WHEN 4 THEN '/tmp/p' || CAST(doc_id % 97 AS VARCHAR) || '.html'
           ELSE '/private/ok/p' || CAST(doc_id % 97 AS VARCHAR)
         END AS path
  FROM documents
),
m AS (
  SELECT u.doc_id, r.rlen, r.allow,
         row_number() OVER (PARTITION BY u.doc_id
                            ORDER BY r.rlen DESC, r.allow DESC) AS rn
  FROM urls u JOIN rules r ON u.d = r.d AND regexp_matches(u.path, r.pattern)
)
SELECT u.doc_id, u.domain, u.path,
       COALESCE(b.allow, TRUE) AS allowed,
       CAST(COALESCE(b.rlen, -1) AS BIGINT) AS rule_len
FROM urls u
LEFT JOIN (SELECT doc_id, rlen, allow FROM m WHERE rn = 1) b USING (doc_id)
"""


def q_web_sitemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap parsing — the crawl-DISCOVERY step in front of the
    URL-dedup → robots-gate chain: fabricate one ``<urlset>`` sitemap
    per document (1–3 ``<url>`` entries each, all fields derived from
    doc_id so the oracle regenerates the expected OUTPUT rows by
    formula — it never sees XML) plus four ``<sitemapindex>``
    documents, parse with the pure-Catalyst sitemap fold
    (:mod:`coltt_spark.operators.sitemaps`), and feed the extracted
    locs straight into ``url_normalize`` — zero shuffles end to end
    (plan pinned in tests/test_plans.py).

    The fabricated entries cycle through the variation real sitemaps
    exhibit, each a parity probe: CDATA-wrapped locs with RAW ``&``
    and case-varied scheme/host/:443 port (CDATA verbatim rule +
    normalization), entity-escaped ``&amp;`` locs with surrounding
    whitespace (entity decode + trim), numeric character references
    ``&#x2F;``/``&#38;`` in path and query (hex + decimal decode —
    the r7 xml_unescape extension), tracking params the
    normalizer must drop, W3C lastmod both date-only and full
    datetime (date-prefix rule), case-varied changefreq (lowercase
    rule), explicit ``<priority>`` vs the protocol's 0.5 default,
    and index entries with the subset schema. A divergence in block
    splitting, CDATA/entity handling, field defaulting, or
    normalization breaks value parity."""
    from coltt_spark.functions.memo import memo_columns

    docs = load_table(spark, sf_dir, "documents")
    ex = memo_columns("q_web_sitemap.exprs", _sitemap_exprs)
    leaf = docs.select(
        F.col("doc_id").cast("long").alias("src_id"), ex["leaf_xml"].alias("xml")
    )
    idx = spark.range(4).select(
        (F.col("id") + 1000000).cast("long").alias("src_id"),
        ex["idx_xml"].alias("xml"),
    )
    sm = leaf.unionByName(idx)
    parsed = sm.select(
        "src_id",
        ex["kind"].alias("kind"),
        F.posexplode(ex["entries"]).alias("ord", "e"),
    )
    return parsed.select(
        "src_id",
        "kind",
        F.col("ord").cast("long").alias("ord"),
        ex["loc"].alias("loc"),
        ex["host"].alias("host"),
        F.col("e.lastmod_s").alias("lastmod"),
        F.col("e.changefreq").alias("changefreq"),
        F.round(F.col("e.priority"), 4).alias("priority"),
    )


def _sitemap_exprs() -> dict:
    """The web_sitemap fabrication + parse Columns — every tree here
    is a fixed formula over ``doc_id``/``id``/the parse aliases, so
    the whole dict is built once per session via
    :func:`coltt_spark.functions.memo.memo_columns` (the chain is
    ~2.7k py4j round-trips to describe — r14-opt, guide §4)."""
    from coltt_spark.functions.urls import url_host, url_normalize
    from coltt_spark.operators.sitemaps import sitemap_entries, sitemap_kind

    d = (F.col("doc_id") % 4).cast("string")

    def urlblock(j: Column) -> Column:
        m = F.col("doc_id") + j
        k = (F.col("doc_id") * 4 + j).cast("string")
        loc = (
            F.when(
                m % 5 == 0,
                F.concat(
                    F.lit("<loc><![CDATA[HTTPS://Site"), d,
                    F.lit(".Example.com:443/page/"), k, F.lit("?a="), k,
                    F.lit("&utm_source=feed]]></loc>"),
                ),
            )
            .when(
                (m % 5 == 1) | (m % 5 == 3),
                F.concat(
                    F.lit("<loc>\n      https://site"), d,
                    F.lit(".example.com/page/"), k, F.lit("?a="), k,
                    F.lit("&amp;utm_source=feed\n    </loc>"),
                ),
            )
            .when(
                m % 5 == 4,
                # numeric character references — hex in the path,
                # decimal joining the query params (XML-legal; real
                # sitemap generators emit these)
                F.concat(
                    F.lit("<loc>https://site"), d,
                    F.lit(".example.com/page&#x2F;"), k, F.lit("?a="), k,
                    F.lit("&#38;utm_source=feed</loc>"),
                ),
            )
            .otherwise(
                F.concat(
                    F.lit("<loc>https://site"), d,
                    F.lit(".example.com/page/"), k, F.lit("</loc>"),
                )
            )
        )
        lastmod = F.when(
            m % 3 == 0,
            F.concat(
                F.lit("<lastmod> "),
                F.date_format(
                    F.date_add(
                        F.to_date(F.lit("2024-01-01")), (m % 366).cast("int")
                    ),
                    "yyyy-MM-dd",
                ),
                F.when(m % 6 == 0, F.lit("T08:30:00+00:00")).otherwise(F.lit("")),
                F.lit(" </lastmod>"),
            ),
        ).otherwise(F.lit(""))
        freq = F.when(
            m % 2 == 0,
            F.concat(
                F.lit("<changefreq>"),
                F.element_at(
                    F.array(F.lit("Daily"), F.lit("weekly"), F.lit("monthly")),
                    (m % 3).cast("int") + 1,
                ),
                F.lit("</changefreq>"),
            ),
        ).otherwise(F.lit(""))
        prio = F.when(
            m % 2 == 1,
            F.concat(
                F.lit("<priority>0."), (m % 10).cast("string"), F.lit("</priority>")
            ),
        ).otherwise(F.lit(""))
        return F.concat(
            F.lit("  <url>\n    "), loc, F.lit("\n    "), lastmod, freq, prio,
            F.lit("\n  </url>"),
        )

    leaf_xml = F.concat(
        F.lit(
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        ),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), (F.col("doc_id") % 3).cast("int")), urlblock
            ),
            "\n",
        ),
        F.lit("\n</urlset>\n"),
    )
    i = F.col("id").cast("string")
    idx_xml = F.concat(
        F.lit(
            '<?xml version="1.0"?>\n'
            '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
            "  <sitemap>\n    <loc>https://site"
        ),
        i,
        F.lit(".example.com/sitemap-0.xml</loc>\n    <lastmod>2024-02-0"),
        (F.col("id") + 1).cast("string"),
        F.lit(
            "</lastmod>\n  </sitemap>\n"
            "  <sitemap><loc> https://site"
        ),
        i,
        F.lit(".example.com/sitemap-1.xml </loc></sitemap>\n</sitemapindex>"),
    )
    loc_n = url_normalize(F.col("e.loc"))
    return {
        "leaf_xml": leaf_xml,
        "idx_xml": idx_xml,
        "kind": sitemap_kind(F.col("xml")),
        "entries": sitemap_entries(F.col("xml")),
        "loc": loc_n,
        "host": url_host(loc_n),
    }


_ORACLE_WEB_SITEMAP = """
WITH g AS (SELECT unnest(generate_series(0, 2)) AS j),
u AS (
  SELECT doc_id AS src_id, CAST(g.j AS BIGINT) AS ord,
         doc_id + g.j AS m, doc_id * 4 + g.j AS k, doc_id % 4 AS d
  FROM documents CROSS JOIN g WHERE g.j <= doc_id % 3
),
leaf AS (
  SELECT src_id, 'urlset' AS kind, ord,
    CASE WHEN m % 5 IN (0, 1, 3, 4)
         THEN 'https://site' || CAST(d AS VARCHAR) || '.example.com/page/'
              || CAST(k AS VARCHAR) || '?a=' || CAST(k AS VARCHAR)
         ELSE 'https://site' || CAST(d AS VARCHAR) || '.example.com/page/'
              || CAST(k AS VARCHAR) END AS loc,
    'site' || CAST(d AS VARCHAR) || '.example.com' AS host,
    CASE WHEN m % 3 = 0
         THEN strftime(DATE '2024-01-01' + CAST(m % 366 AS INT), '%Y-%m-%d')
         END AS lastmod,
    CASE WHEN m % 2 = 0 THEN
      CASE CAST(m % 3 AS INT) WHEN 0 THEN 'daily' WHEN 1 THEN 'weekly'
           ELSE 'monthly' END END AS changefreq,
    CASE WHEN m % 2 = 1 THEN round((m % 10) / 10.0, 4) ELSE 0.5 END AS priority
  FROM u
),
idx AS (
  SELECT CAST(1000000 + r.i AS BIGINT) AS src_id, 'index' AS kind,
    CAST(s.j AS BIGINT) AS ord,
    'https://site' || CAST(r.i AS VARCHAR) || '.example.com/sitemap-'
      || CAST(s.j AS VARCHAR) || '.xml' AS loc,
    'site' || CAST(r.i AS VARCHAR) || '.example.com' AS host,
    CASE WHEN s.j = 0
         THEN strftime(DATE '2024-02-01' + CAST(r.i AS INT), '%Y-%m-%d')
         END AS lastmod,
    CAST(NULL AS VARCHAR) AS changefreq,
    0.5 AS priority
  FROM range(4) r(i) CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS j) s
)
SELECT * FROM leaf UNION ALL SELECT * FROM idx
"""


PIPELINE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "format_roundtrip": q_format_roundtrip,
    "archive_roundtrip": q_archive_roundtrip,
    "warc_html_extract": q_warc_html_extract,
    "web_url_dedup": q_web_url_dedup,
    "web_url_psl": q_web_url_psl,
    "web_domain_quota": q_web_domain_quota,
    "web_robots_filter": q_web_robots_filter,
    "web_sitemap": q_web_sitemap,
    "line_dedup": q_line_dedup,
    "doc_chunk": q_doc_chunk,
    "decontaminate": q_decontaminate,
    "decontaminate_bytes": q_decontaminate_bytes,
    "decontaminate_semantic": q_decontaminate_semantic,
    "decontaminate_bloom": q_decontaminate_bloom,
    "sample_stratified": q_sample_stratified,
    "sample_fraction": q_sample_fraction,
    "sample_temperature": q_sample_temperature,
    "source_mix": q_source_mix,
    "export_shards": q_export_shards,
    "jsonl_roundtrip": q_jsonl_roundtrip,
    "pack_sequences": q_pack_sequences,
    "pack_sequences_firstfit": q_pack_sequences_firstfit,
    "text_redact_pii": q_text_redact_pii,
}

PIPELINE_ORACLES: dict[str, str] = {
    "format_roundtrip": _ORACLE_FORMAT_ROUNDTRIP,
    "archive_roundtrip": _ORACLE_ARCHIVE_ROUNDTRIP,
    "warc_html_extract": _ORACLE_WARC_HTML_EXTRACT,
    "web_url_dedup": _web_url_oracle(),
    "web_url_psl": _web_url_psl_oracle(),
    "web_domain_quota": _web_domain_quota_oracle(),
    "web_robots_filter": _ORACLE_WEB_ROBOTS,
    "web_sitemap": _ORACLE_WEB_SITEMAP,
    "line_dedup": _ORACLE_LINE_DEDUP,
    "doc_chunk": _ORACLE_DOC_CHUNK,
    "decontaminate": _ORACLE_DECONTAMINATE,
    "decontaminate_bytes": _decontaminate_bytes_oracle(),
    "decontaminate_semantic": _decontaminate_semantic_oracle(),
    "decontaminate_bloom": _bloom_oracle(),
    "sample_stratified": _ORACLE_SAMPLE_STRATIFIED,
    "sample_fraction": _ORACLE_SAMPLE_FRACTION,
    "sample_temperature": _ORACLE_SAMPLE_TEMPERATURE,
    "source_mix": _ORACLE_SOURCE_MIX,
    "export_shards": _ORACLE_EXPORT_SHARDS,
    "jsonl_roundtrip": _ORACLE_JSONL_ROUNDTRIP,
    "pack_sequences": _ORACLE_PACK_SEQUENCES,
    "pack_sequences_firstfit": _ORACLE_PACK_SEQUENCES_FIRSTFIT,
    "text_redact_pii": _redact_oracle(),
}
