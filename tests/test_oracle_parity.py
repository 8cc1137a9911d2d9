"""Mirror of the driver's correctness gate: every registry query with
an oracle must match DuckDB on sf0.01 (row count + columns + values);
oracle-less queries must at least run and return a stable schema."""

from __future__ import annotations

import pytest

from coltt_spark.oracle import check_query
from coltt_spark.registry import QUERIES

from .conftest import SF_CORRECT


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    ok, msg = check_query(spark, SF_CORRECT, name)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_every_query_is_oracle_backed():
    """Regression guard on full value-check coverage: a new registry
    entry without an oracle silently downgrades to the driver's weaker
    rows-only check — fail loudly here instead."""
    import __spark_entry__ as e

    missing = sorted(set(e.queries()) - set(e.oracle_sql()))
    assert not missing, f"queries without oracles: {missing}"


#: The round-8 rotation ledger (CLAUDE.md): entries promised a
#: round-9 driver slot — 39 of the 45 r6-green entries whose last
#: hard driver signal is r6, the oldest on the board (token_vocab
#: leads). The block's TAIL (upsert_delete, filter_coercion,
#: filter_search, multi_vector_search,
#: dedup_minhash_lsh, neardup_cosine) overflowed when the 11
#: new/touched seats landed and
#: keeps round-10 priority, exactly as the r8 ledger anticipated.
#: Machine-checked against _KEY_ORDER below so the ledger promise
#: cannot silently drift (ADVICE r3 #1).
ROTATION_LEDGER_R9 = [
    "token_vocab",
    "doc_lm_score",
    "filter_extended",
    "collection_time_travel",
    "jsonl_roundtrip",
    "ann_recall",
    "stream_join",
    "embed_project",
    "sample_temperature",
    "bm25_search",
    "distinct_sketch",
    "quantile_sketch",
    "decontaminate_bloom",
    "bm25_indexed",
    "collection_search",
    "media_jpeg_features",
    "media_gif_features",
    "format_roundtrip",
    "media_tiff_features",
    "archive_roundtrip",
    "warc_html_extract",
    "web_url_dedup",
    "line_dedup",
    "bucketed_join",
    "web_robots_filter",
    "doc_ppl_bigram",
    "dedup_span_removal",
    "zorder_layout",
    "media_png_features",
    "collection_search_ivf",
    "collection_search_ivf_delta",
    "stream_quantile",
    "ann_lsh",
    "dedup_simhash",
    "collection_hybrid_text",
    "bm25_index_merged",
    "media_audio_features",
    "media_video_stats",
    "collection_search_blocks",
]

#: the r6 overflow tail — displaced from the round-9 window by the 11
#: new/touched seats (5 new + 6 touched); they lead the round-10
#: rotation queue
R10_PRIORITY = [
    "upsert_delete",
    "filter_coercion",
    "filter_search",
    "multi_vector_search",
    "dedup_minhash_lsh",
    "neardup_cosine",
]


def test_registry_order_puts_unverified_entries_in_driver_window():
    """The driver hash-checks only the first _DRIVER_WINDOW queries()
    keys. Pin the ordering contract: the registry follows _KEY_ORDER
    exactly; the round-8 rotation-ledger entries (39 of the 45
    r6-green, oldest signal on the board) LEAD the round-9 window,
    every entry new or touched this round is inside it, and the r6
    overflow tail sits FIRST past the boundary with round-10
    priority. Past the boundary after it: the 44 remaining r7-green
    entries in their r7 order (text_lang_id was promoted into the
    window as touched), then the 45 r8-green entries in their r8
    order (pack_sequences_ids / bpe_train_bytes / bpe_encode_ids /
    text_lang_id_unicode / web_url_psl were promoted as touched).
    Every past-window entry is re-oracled by the local gate every
    pytest run."""
    from coltt_spark.registry import _DRIVER_WINDOW, _KEY_ORDER, QUERIES

    assert list(QUERIES) == _KEY_ORDER
    window = set(_KEY_ORDER[:_DRIVER_WINDOW])
    # ledger entries lead the window, in ledger order
    assert _KEY_ORDER[: len(ROTATION_LEDGER_R9)] == ROTATION_LEDGER_R9
    # the displaced r6 tail sits first past the boundary (r10 queue)
    assert (
        _KEY_ORDER[_DRIVER_WINDOW : _DRIVER_WINDOW + len(R10_PRIORITY)]
        == R10_PRIORITY
    )
    must_check = set(ROTATION_LEDGER_R9) | {
        # new this round (driver has never seen them)
        "collection_search_ivfpq",
        "collection_search_ivfpq_delta",
        "web_domain_quota",
        "token_fertility_by_lang",
        "bpe_encode_ids_pretok",
        # implementation touched this round: pack_sequences_ids
        # (attention-boundary offsets column), bpe_train_bytes /
        # bpe_encode_ids (pre_tokenizer threading through the byte
        # path), text_lang_id_unicode / text_lang_id (marker table
        # grown to eleven languages; the unicode entry also moved to
        # the Latin-extended fixture), web_url_psl (PSL snapshot
        # 1388 -> 2058 rules)
        "pack_sequences_ids",
        "bpe_train_bytes",
        "bpe_encode_ids",
        "text_lang_id_unicode",
        "text_lang_id",
        "web_url_psl",
    }
    assert must_check <= window, sorted(must_check - window)
