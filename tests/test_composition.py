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
