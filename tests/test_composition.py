"""End-to-end curation-pipeline composition: the operators are each
oracle-verified individually through the registry; this test verifies
they COMPOSE — quality filter → exact-dedup survivors → deterministic
fraction sample → per-language corpus accounting — against one
DuckDB oracle replaying the whole chain."""

from __future__ import annotations

from pyspark.sql import functions as F

from coltt_spark.oracle import compare, duckdb_conn
from coltt_spark.sources.tables import load_table

from .conftest import SF_CORRECT

_TOKS = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')"


def _stop_sql() -> str:
    from coltt_spark.operators.textstats import STOPWORDS

    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


_ORACLE = f"""
WITH base AS (
  SELECT doc_id, lang, text, {_TOKS} AS tk,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS punct
  FROM documents
),
q AS (
  SELECT doc_id, lang, text, len(tk) AS n_tokens,
         0.4 * least(1.0, len(tk) / 100.0)
           + 0.3 * (1.0 - CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 0.0 END)
           + 0.3 * least(1.0, (CASE WHEN len(tk) > 0
               THEN len(list_filter(tk, t -> list_contains({_stop_sql()}, t))) / len(tk)
               ELSE 0.0 END) * 5) AS quality
  FROM base
),
kept AS (SELECT * FROM q WHERE round(quality, 4) >= 0.45),
canon AS (
  SELECT min(doc_id) AS doc_id,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
  FROM kept GROUP BY fp
),
surv AS (SELECT k.doc_id, k.lang, k.n_tokens FROM kept k JOIN canon USING (doc_id)),
sampled AS (
  SELECT * FROM surv
  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10 < 8
)
SELECT lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM sampled GROUP BY lang
"""


def test_curation_pipeline_composes(spark):
    from coltt_spark.functions.text import hash60, norm_text
    from coltt_spark.operators.textstats import text_quality

    docs = load_table(spark, SF_CORRECT, "documents")
    scored = text_quality(docs, "doc_id", "text").select(
        "doc_id", "n_tokens", "quality_score"
    )
    # quality_score is round(…, 4) on both sides, so the threshold
    # compares identical doubles
    kept = docs.join(scored, on="doc_id").filter(
        F.col("quality_score") >= 0.45
    )
    canon = (
        kept.groupBy(F.md5(norm_text("text")).alias("_fp"))
        .agg(F.min("doc_id").alias("doc_id"))
    )
    surv = kept.join(canon.select("doc_id"), on="doc_id")
    sampled = surv.filter(hash60(F.col("doc_id").cast("string")) % 10 < 8)
    out = sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )
    con = duckdb_conn(SF_CORRECT)
    try:
        ok, msg = compare(out, con, _ORACLE)
    finally:
        con.close()
    assert ok, msg


def test_redaction_composes_with_chunking(spark):
    """PII scrubbing slots in front of the chunker the way a real
    cleaning pipeline runs it: inject deterministic PII, redact,
    chunk the redacted text (stride=size for clean reassembly). The
    chunk token stream for every document reassembles to exactly the
    tokenizer's view of the redacted text, and the placeholder tokens
    ride through — proof the two operators compose in ONE lazy plan
    with the chunker's contract intact."""
    import re as _re

    from coltt_spark.operators.pipeline import chunk_documents, redact_pii

    docs = load_table(spark, SF_CORRECT, "documents").limit(120)
    dirty = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.format_string(" mail user%d@example.com or +1-555-%04d at 10.0.%d.%d",
                            F.col("doc_id"), F.col("doc_id") % 10000,
                            F.col("doc_id") % 256, F.col("doc_id") % 100),
        ).alias("text"),
    )
    red = redact_pii(dirty)
    chunks = chunk_documents(red.select("doc_id", "text"), "doc_id", "text",
                             size=32, stride=32)
    joined = {}
    for r in chunks.collect():
        joined.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk_text"]))
    red_rows = {r["doc_id"]: r["text"] for r in red.collect()}
    assert set(joined) == set(red_rows)
    for doc_id, parts in joined.items():
        stream = " ".join(c for _, c in sorted(parts)).split()
        # the tokenizer's view of the redacted text (lowercase,
        # alnum-split — same contract as functions.text.tokens)
        expect = [t for t in _re.split("[^a-z0-9]+", red_rows[doc_id].lower()) if t]
        assert stream == expect
        # the placeholders survive as tokens; the raw PII does not
        assert "email" in stream and "phone" in stream and "ip" in stream
        assert f"user{doc_id}" not in stream and "example" not in stream


def test_web_corpus_pipeline_composes(spark):
    """The crawl chain composes end-to-end against ONE DuckDB oracle:
    fabricate HTML (four markup flavors) → ship as text/html WARC
    shards → read back → scanner extraction → corpus-level line
    dedup. The entity line and the anchor line appear in EVERY
    document, so line dedup must strip exactly those two from each
    extraction, leaving the title line and the document body."""
    from coltt_spark.operators.html_text import html_extract, html_page_table
    from coltt_spark.operators.pipeline import dedup_lines
    from coltt_spark.sources.archives import read_warc_records, write_archive_shards
    from coltt_spark.tmpdirs import scratch_dir

    docs = load_table(spark, SF_CORRECT, "documents")
    path = scratch_dir(prefix="coltt_webchain_")
    write_archive_shards(
        html_page_table(docs), path, id_col="doc_id", text_col="html",
        n_shards=4, fmt="warc", content_type="text/html",
    ).collect()
    pages = read_warc_records(spark, path).select(
        F.expr("CAST(substr(uri, 9) AS LONG)").alias("doc_id"),
        F.col("payload").alias("html"),
    )
    cleaned = dedup_lines(html_extract(pages), "doc_id", "text", min_docs=3)
    out = cleaned.select(
        "doc_id", F.md5("text").alias("clean_md5"), "n_kept", "n_removed"
    )
    oracle = """
WITH nt AS (
  SELECT doc_id, trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')) AS t
  FROM documents
)
SELECT doc_id,
       md5('Doc ' || doc_id
           || CASE WHEN t = '' THEN '' ELSE chr(10) || t END) AS clean_md5,
       CAST(CASE WHEN t = '' THEN 1 ELSE 2 END AS BIGINT) AS n_kept,
       CAST(2 AS BIGINT) AS n_removed
FROM nt
"""
    ok, msg = compare(out, duckdb_conn(SF_CORRECT), oracle)
    assert ok, msg


def test_token_budget_pipeline_composes(spark):
    """The r7 capstone: quality gate → BPE subword counting →
    per-language token ACCOUNTING (the number a training run budgets
    against), verified against ONE DuckDB oracle that replays the
    whole chain — including RETRAINING the BPE merges from scratch in
    SQL. Subword totals must exceed word totals (fertility > 1), and
    every stage's contract must hold through the composition."""
    from coltt_spark.operators.textstats import text_quality
    from coltt_spark.operators.tokenize import bpe_encode
    from coltt_spark.registry_text import BPE_MERGES, _bpe_chain_sql, _bpe_fixture

    docs = load_table(spark, SF_CORRECT, "documents")
    merges, word_len = _bpe_fixture(spark, SF_CORRECT)
    kept = docs.join(
        text_quality(docs, "doc_id", "text")
        .filter(F.col("quality_score") >= 0.45)
        .select("doc_id"),
        "doc_id",
    )
    counts = bpe_encode(kept, "doc_id", "text", merges, word_len=word_len)
    out = (
        counts.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
    )
    k = BPE_MERGES
    oracle = _bpe_chain_sql(k) + f""",
tok AS (SELECT word, CAST(len(s) AS BIGINT) AS n_tok FROM w{k}),
base AS (
  SELECT doc_id, lang, text, {_TOKS} AS tk,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS punct
  FROM documents
),
q AS (
  SELECT doc_id, lang,
         0.4 * least(1.0, len(tk) / 100.0)
           + 0.3 * (1.0 - CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 0.0 END)
           + 0.3 * least(1.0, (CASE WHEN len(tk) > 0
               THEN len(list_filter(tk, t -> list_contains({_stop_sql()}, t))) / len(tk)
               ELSE 0.0 END) * 5) AS quality
  FROM base
),
kept AS (SELECT doc_id, lang FROM q WHERE round(quality, 4) >= 0.45),
occ AS (
  SELECT d.doc_id, unnest({_TOKS}) AS word
  FROM documents d JOIN kept USING (doc_id)
),
cnts AS (
  SELECT o.doc_id, CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(t.n_tok) AS BIGINT) AS n_tokens
  FROM occ o JOIN tok t USING (word) GROUP BY o.doc_id
)
SELECT k.lang, count(*) AS n_docs,
       CAST(sum(coalesce(c.n_words, 0)) AS BIGINT) AS n_words,
       CAST(sum(coalesce(c.n_tokens, 0)) AS BIGINT) AS n_tokens
FROM kept k LEFT JOIN cnts c USING (doc_id)
GROUP BY k.lang
"""
    con = duckdb_conn(SF_CORRECT)
    try:
        ok, msg = compare(out, con, oracle)
    finally:
        con.close()
    assert ok, msg
    row = out.agg(F.sum("n_words"), F.sum("n_tokens")).collect()[0]
    assert row[1] > row[0]  # subword fertility > 1


def test_multilingual_pipeline_composes(spark):
    """The byte-path twin of the curation chain above, over the
    multilingual near-dup fixture: script-aware language ID →
    byte-shingle MinHash+LSH dedup (drop every verified pair's id_b —
    the keep-first policy) → per-language accounting of whitespace
    words and UTF-8 bytes. Each component is registry-green alone;
    this verifies they COMPOSE, against ONE DuckDB oracle that
    replays the fixture, the full LSH chain, the removal, the
    lead-byte script bands, and the accounting."""
    from coltt_spark.functions.text import tokens_ws
    from coltt_spark.operators.dedup import minhash_lsh_pairs, shingle_table_bytes
    from coltt_spark.operators.textstats import script_lang_id
    from coltt_spark.registry_dedup import (
        _BYTE_JACCARD,
        _minhash_ctes,
        _uni_neardup_docs,
    )
    from coltt_spark.registry_text import _script_lang_oracle

    docs = _uni_neardup_docs(spark, SF_CORRECT)
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", bands=4, threshold=0.5,
        shingles=shingle_table_bytes(docs, "doc_id", "text", 12),
    )
    dupes = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    kept = docs.join(dupes, on="doc_id", how="left_anti")
    langs = script_lang_id(docs, "doc_id", "text").select("doc_id", "pred_lang")
    out = (
        kept.join(langs, on="doc_id")
        .select(
            "pred_lang",
            F.size(tokens_ws("text")).cast("long").alias("_w"),
            F.octet_length("text").cast("long").alias("_b"),
        )
        .groupBy("pred_lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_w").alias("n_words"),
            F.sum("_b").alias("n_bytes"),
        )
    )
    ws_toks = "list_filter(regexp_split_to_array(k.text, '\\s+'), t -> t <> '')"
    oracle = f"""
{_minhash_ctes(_BYTE_JACCARD)},
dupes AS (SELECT DISTINCT id_b AS doc_id FROM lsh_pairs),
kept AS (
  SELECT c.* FROM corpus_b c LEFT JOIN dupes d USING (doc_id)
  WHERE d.doc_id IS NULL
),
langs AS ({_script_lang_oracle("corpus_b")})
SELECT l.pred_lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len({ws_toks})) AS BIGINT) AS n_words,
       CAST(sum(octet_length(encode(k.text))) AS BIGINT) AS n_bytes
FROM kept k JOIN langs l USING (doc_id)
GROUP BY l.pred_lang
"""
    con = duckdb_conn(SF_CORRECT)
    try:
        ok, msg = compare(out, con, oracle)
    finally:
        con.close()
    assert ok, msg


def test_latin_tier_per_language_accounting(spark):
    """Per-language corpus accounting over the Latin-extended fixture
    (VERDICT r8 #6): script lang-ID with the eleven-language marker
    scorer → docs / whitespace-words / UTF-8-bytes per predicted
    language, against one nested DuckDB oracle. Asserts the seven new
    Latin languages all appear with nonzero counts — the accounting a
    multilingual curation pipeline keys quota decisions on."""
    from coltt_spark.functions.text import tokens_ws
    from coltt_spark.operators.textstats import script_lang_id
    from coltt_spark.registry_text import (
        _UNI_LAT_SRC,
        _script_lang_oracle,
        _uni_lat_docs,
    )

    docs = _uni_lat_docs(spark, SF_CORRECT)
    langs = script_lang_id(docs, "doc_id", "text").select("doc_id", "pred_lang")
    out = (
        docs.join(langs, on="doc_id")
        .select(
            "pred_lang",
            F.size(tokens_ws("text")).cast("long").alias("_w"),
            F.octet_length("text").cast("long").alias("_b"),
        )
        .groupBy("pred_lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_w").alias("n_words"),
            F.sum("_b").alias("n_bytes"),
        )
    )
    ws_toks = "list_filter(regexp_split_to_array(d.text, '\\s+'), t -> t <> '')"
    oracle = f"""
WITH langs AS ({_script_lang_oracle()})
SELECT l.pred_lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len({ws_toks})) AS BIGINT) AS n_words,
       CAST(sum(octet_length(encode(d.text))) AS BIGINT) AS n_bytes
FROM {_UNI_LAT_SRC} d JOIN langs l USING (doc_id)
GROUP BY l.pred_lang
"""
    con = duckdb_conn(SF_CORRECT)
    try:
        ok, msg = compare(out, con, oracle)
    finally:
        con.close()
    assert ok, msg
    seen = {r["pred_lang"] for r in out.collect()}
    assert {"pt", "it", "nl", "pl", "tr", "id", "vi"} <= seen
