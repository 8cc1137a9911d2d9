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


#: The round-3 rotation ledger (CLAUDE.md): entries promised a
#: round-4 driver slot. Machine-checked against _KEY_ORDER below so
#: the ledger promise cannot silently drift (ADVICE r3 #1).
ROTATION_LEDGER_R4 = [
    # never driver-checked (new in r3, placed past the r3 window)
    "stream_distinct",
    "stream_quantile",
    "bm25_topk_batch",
    "hybrid_rrf",
    "freq_sketch",
    # implementation touched in r3 AFTER their last driver check (r2)
    "ann_lsh",
    "dedup_canonical",
    "dedup_simhash",
]


def test_registry_order_puts_unverified_entries_in_driver_window():
    """The driver hash-checks only the first _DRIVER_WINDOW queries()
    keys. Pin the ordering contract: the registry follows _KEY_ORDER
    exactly; the round-3 rotation-ledger entries lead the round-4
    window, every entry new this round is inside it, and the rest of
    the window is the longest-unchecked (r2-green) remainder."""
    from coltt_spark.registry import _DRIVER_WINDOW, _KEY_ORDER, QUERIES

    assert list(QUERIES) == _KEY_ORDER
    window = set(_KEY_ORDER[:_DRIVER_WINDOW])
    # ledger entries lead the window, in ledger order
    assert _KEY_ORDER[: len(ROTATION_LEDGER_R4)] == ROTATION_LEDGER_R4
    must_check = set(ROTATION_LEDGER_R4) | {
        # new this round (driver has never seen them)
        "collection_hybrid_text", "bm25_index_merged",
        "pack_sequences_firstfit", "bm25_index_deleted",
        "media_audio_features", "media_video_stats", "text_redact_pii",
        # implementation touched this round (pack_blocks group_col
        # refactor, file-subset scans, IVF-on-blocks serving + delta)
        "collection_search_blocks", "collection_search_batch",
        "collection_search_blocks_delta", "collection_search_ivf_delta",
        "collection_search_batch_filtered", "collection_search_grouped",
        "collection_search_ivf", "collection_hybrid_ivf", "ann_ivf",
        "knn_block",
        # longest-unchecked: last driver signal is r2 for all of
        # these; r3 spent its window on the 42 new-since-r2 entries
        "knn_cosine", "upsert_delete", "filter_coercion", "knn_filtered",
        "filter_search", "multi_vector_search", "dedup_minhash_lsh",
        "neardup_cosine", "dedup_exact", "dedup_groups",
        "dedup_ngram_jaccard", "text_lang_id", "text_quality",
        "doc_fingerprint", "pricing_summary",
        "region_revenue", "window_top_orders",
        "price_percentiles",
        "knn_f16", "ann_topk_batch",
        "dedup_containment",
        "rollup_revenue", "events_sessionize",
        "media_features",
        # knn_euclidean / knn_manhattan / compare_dist ceded their
        # slots (share knn_cosine's kernel and serving path, which the
        # in-window collection entries re-exercise); ann_topk_blas /
        # media_metadata / events_hourly / token_count / cube_revenue /
        # set_intersect ceded theirs to this round's touched serving
        # paths; top_revenue_orders (pure Catalyst join+agg+TakeOrdered)
        # ceded its slot to the new media_audio_features —
        # region_revenue / window_top_orders / pricing_summary cover
        # the identical machinery in-window; knn_wide (wide-row layout
        # variant) ceded its slot to the new media_video_stats — its
        # kernel rides in-window on knn_cosine + knn_block; events_json
        # (pure-builtin get_json_object projection) ceded its slot to
        # the new text_redact_pii — the events table rides in-window
        # on events_sessionize. Every demoted entry is re-oracled by
        # the local gate every pytest run.
    }
    assert must_check <= window, sorted(must_check - window)
