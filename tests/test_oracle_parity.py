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


#: The round-9 rotation ledger (CLAUDE.md): entries promised a
#: round-10 driver slot — the 6 r6-overflow entries lead (the oldest
#: driver signal on the board, displaced from the r9 window exactly as
#: the r8 ledger anticipated), then 35 of the 44 remaining r7-green
#: entries in r7 order. The r7 block's TAIL (knn_two_phase,
#: ann_topk_blas, media_metadata, events_hourly, token_count,
#: cube_revenue, set_intersect, top_revenue_orders, knn_wide)
#: overflowed when the 9 new/touched seats landed and keeps round-11
#: priority. Machine-checked against _KEY_ORDER below so the ledger
#: promise cannot silently drift (ADVICE r3 #1).
ROTATION_LEDGER_R10 = [
    "upsert_delete",
    "filter_coercion",
    "filter_search",
    "multi_vector_search",
    "dedup_minhash_lsh",
    "neardup_cosine",
    "stream_distinct",
    "collection_search_blocks_delta",
    "knn_cosine",
    "ann_ivf",
    "collection_search_batch",
    "freq_sketch",
    "dedup_canonical",
    "knn_filtered",
    "dedup_exact",
    "dedup_groups",
    "dedup_ngram_jaccard",
    "collection_search_batch_filtered",
    "hybrid_rrf",
    "bm25_topk_batch",
    "text_quality",
    "doc_fingerprint",
    "pricing_summary",
    "region_revenue",
    "window_top_orders",
    "price_percentiles",
    "knn_f16",
    "ann_topk_batch",
    "knn_pagination",
    "knn_block",
    "dedup_containment",
    "rollup_revenue",
    "events_sessionize",
    "media_features",
    "quality_classifier",
    "web_sitemap",
    "knn_euclidean",
    "knn_manhattan",
    "compare_dist",
    "knn_f8",
    "knn_bf16",
]

#: the r7 overflow tail — displaced from the round-10 window by the 9
#: new/touched seats (6 new + 3 touched); they lead the round-11
#: rotation queue
R11_PRIORITY = [
    "knn_two_phase",
    "ann_topk_blas",
    "media_metadata",
    "events_hourly",
    "token_count",
    "cube_revenue",
    "set_intersect",
    "top_revenue_orders",
    "knn_wide",
]


def test_registry_order_puts_unverified_entries_in_driver_window():
    """The driver hash-checks only the first _DRIVER_WINDOW queries()
    keys. Pin the ordering contract: the registry follows _KEY_ORDER
    exactly; the round-9 rotation-ledger entries (6 r6-overflow + 35
    r7-green, oldest signal on the board) LEAD the round-10 window,
    every entry new or touched this round is inside it, and the r7
    overflow tail sits FIRST past the boundary with round-11
    priority. Past the boundary after it: the 45 r8-green entries in
    their r8 order, then the 47 r9-green entries in their r9-window
    order (collection_search_ivfpq / collection_search_ivfpq_delta /
    web_url_psl were promoted into the window as touched). Every
    past-window entry is re-oracled by the local gate every pytest
    run."""
    from coltt_spark.registry import _DRIVER_WINDOW, _KEY_ORDER, QUERIES

    assert list(QUERIES) == _KEY_ORDER
    window = set(_KEY_ORDER[:_DRIVER_WINDOW])
    # ledger entries lead the window, in ledger order
    assert _KEY_ORDER[: len(ROTATION_LEDGER_R10)] == ROTATION_LEDGER_R10
    # the displaced r7 tail sits first past the boundary (r11 queue)
    assert (
        _KEY_ORDER[_DRIVER_WINDOW : _DRIVER_WINDOW + len(R11_PRIORITY)]
        == R11_PRIORITY
    )
    must_check = set(ROTATION_LEDGER_R10) | {
        # new this round (driver has never seen them)
        "media_image_dedup",
        "collection_search_ivfpq_batch",
        "media_image_dedup_groups",
        "decontaminate_semantic",
        "unigram_train",
        "unigram_encode_ids",
        # implementation touched this round: the ivfpq refined rerank
        # now reads only the probed lists' exact-vector files (and the
        # LUT build is the batched numpy fold) on both the base and
        # delta paths; web_url_psl rides the 2058 -> 2574-rule PSL
        # tranche
        "collection_search_ivfpq",
        "collection_search_ivfpq_delta",
        "web_url_psl",
    }
    assert must_check <= window, sorted(must_check - window)
