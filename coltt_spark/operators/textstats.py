"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All four are pure Catalyst expressions (regexp + array lambdas inside
whole-stage codegen) — no Python in the row path, so a 100 TB
documents scan runs at parquet-read speed with the filter/projection
pushed down. Each has an exact DuckDB-SQL equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from coltt_spark.functions.text import HASH_P, hash60, tokens
from coltt_spark.sources.tables import ensure_parallelism

# marker stopwords per language for the n-gram/stopword heuristic.
# Deterministic and tiny by design — the oracle re-states the same
# sets; swap in real wordlists at deployment.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "es": ("el", "la", "los", "las", "de", "que", "y", "en", "un", "por"),
    "fr": ("le", "la", "les", "des", "et", "est", "une", "dans", "pour", "sur"),
}

#: fixed language evaluation order — ties resolve to the earliest
_LANG_ORDER = ("en", "de", "es", "fr")

#: rolling-hash base (fingerprint); with HASH_P < 2^31 the fold value
#: stays under 2^39 — no int64 overflow in either engine.
FP_BASE = 131

#: BPE-ish token pattern: letter runs, digit runs, single symbols
BPE_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

STOPWORDS = LANG_MARKERS["en"]


def _marker_score(toks: Column, lang: str) -> Column:
    markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-marker language ID: score each language by marker-token
    occurrences (with multiplicity), argmax with fixed-order
    tie-break, ``und`` when nothing matches."""
    df = ensure_parallelism(df, id_col)
    toks = tokens(text_col)
    scores = {lang: _marker_score(toks, lang) for lang in _LANG_ORDER}
    best = F.greatest(*scores.values())
    pred: Column = F.lit("und")
    for lang in reversed(_LANG_ORDER):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    return df.select(
        F.col(id_col),
        pred.alias("pred_lang"),
        best.cast("long").alias("marker_hits"),
    )


def text_quality(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Length / punctuation / stopword heuristics + a composite
    quality score in [0, 1].

    score = 0.4·min(1, tokens/100) + 0.3·(1 − punct_ratio)
          + 0.3·min(1, stopword_ratio·5)
    """
    df = ensure_parallelism(df, id_col)
    t = F.col(text_col)
    toks = tokens(text_col)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    punct = n_chars - F.length(F.regexp_replace(t, r"[^a-zA-Z0-9\s]", ""))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    stop_hits = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    stop_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0))
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), n_tokens / F.lit(100.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * F.least(F.lit(1.0), stop_ratio * 5)
    )
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


def token_count(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count (letter
    runs / digit runs / single symbols — a cheap proxy for subword
    tokenizer cost estimation)."""
    df = ensure_parallelism(df, id_col)
    t = F.col(text_col)
    ws = F.size(F.array_remove(F.split(F.trim(t), r"\s+"), ""))
    bpe = F.size(F.regexp_extract_all(F.lower(t), F.lit(BPE_PATTERN), 0))
    return df.select(
        F.col(id_col),
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Document fingerprints: md5 of canonical text (exact-dup key)
    plus an order-sensitive rolling polynomial hash over token hashes
    (acc·B + h mod p left fold — two docs with the same token
    *multiset* but different order fingerprint differently)."""
    df = ensure_parallelism(df, id_col)
    from coltt_spark.functions.text import norm_text

    toks = tokens(text_col)
    hs = F.transform(toks, lambda x: hash60(x) % F.lit(HASH_P))
    rolling = F.aggregate(
        hs,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(FP_BASE) + x) % F.lit(HASH_P),
    )
    return df.select(
        F.col(id_col),
        F.md5(norm_text(text_col)).alias("md5_fp"),
        rolling.alias("rolling_fp"),
    )


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str, *, ngram: int = 5
) -> DataFrame:
    """Gopher-style intra-document repetition signals, the standard
    quality-filter trio: the occurrence share of the most frequent
    unigram (``top_unigram_frac``) and bigram (``top_bigram_frac``),
    and the fraction of ``ngram``-gram occurrences that are repeats
    of an n-gram already seen in the same document
    (``dup_ngram_frac`` — Σ count over grams with count>1 / Σ count).
    Documents dominated by one token, one phrase, or looping n-grams
    score high and get dropped/downweighted.

    Scale: each signal is explode → count per (doc, gram) → reduce per
    doc — two map-side-combinable aggregations keyed by the document
    id (gram keys never leave their document, so no corpus-wide hot
    keys), joined back on the id. No windows, no Python, pure codegen.
    Documents with zero tokens produce no row; documents too short for
    a gram size report 0.0 for that signal.
    """
    from coltt_spark.functions.text import word_shingles

    df = ensure_parallelism(df, id_col)

    def gram_stats(grams, prefix: str) -> DataFrame:
        e = df.select(F.col(id_col), F.explode(grams).alias("_g"))
        per = e.groupBy(id_col, "_g").agg(F.count(F.lit(1)).alias("_c"))
        return per.groupBy(id_col).agg(
            F.max("_c").alias(f"{prefix}_max"),
            F.sum("_c").alias(f"{prefix}_tot"),
            F.sum(F.when(F.col("_c") > 1, F.col("_c")).otherwise(F.lit(0))).alias(
                f"{prefix}_dup"
            ),
        )

    uni = gram_stats(tokens(text_col), "u")
    bi = gram_stats(word_shingles(text_col, 2), "b")
    ng = gram_stats(word_shingles(text_col, ngram), "n")
    return (
        uni.join(bi, on=id_col, how="left")
        .join(ng, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.col("u_tot").alias("n_tokens"),
            F.round(F.col("u_max").cast("double") / F.col("u_tot"), 4).alias(
                "top_unigram_frac"
            ),
            F.round(
                F.coalesce(F.col("b_max").cast("double") / F.col("b_tot"), F.lit(0.0)), 4
            ).alias("top_bigram_frac"),
            F.round(
                F.coalesce(F.col("n_dup").cast("double") / F.col("n_tot"), F.lit(0.0)), 4
            ).alias("dup_ngram_frac"),
        )
    )
