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


#: The round-4 rotation ledger (CLAUDE.md): entries promised a
#: round-5 driver slot — the 15 r2-demoted entries whose last hard
#: driver signal is r2, the oldest in the ledger. Machine-checked
#: against _KEY_ORDER below so the ledger promise cannot silently
#: drift (ADVICE r3 #1).
ROTATION_LEDGER_R5 = [
    "knn_euclidean",
    "knn_manhattan",
    "compare_dist",
    "knn_f8",
    "knn_bf16",
    "knn_two_phase",
    "ann_topk_blas",
    "media_metadata",
    "events_hourly",
    "token_count",
    "cube_revenue",
    "set_intersect",
    "top_revenue_orders",
    "knn_wide",
    "events_json",
]


def test_registry_order_puts_unverified_entries_in_driver_window():
    """The driver hash-checks only the first _DRIVER_WINDOW queries()
    keys. Pin the ordering contract: the registry follows _KEY_ORDER
    exactly; the round-4 rotation-ledger entries (the 15 r2-demoted,
    oldest signal on the board) LEAD the round-5 window, every entry
    new or touched this round is inside it, and the rest of the
    window rotates in the oldest of the r3-green block."""
    from coltt_spark.registry import _DRIVER_WINDOW, _KEY_ORDER, QUERIES

    assert list(QUERIES) == _KEY_ORDER
    window = set(_KEY_ORDER[:_DRIVER_WINDOW])
    # ledger entries lead the window, in ledger order
    assert _KEY_ORDER[: len(ROTATION_LEDGER_R5)] == ROTATION_LEDGER_R5
    must_check = set(ROTATION_LEDGER_R5) | {
        # new this round (driver has never seen it)
        "media_png_features",
        # implementation touched this round: broadened PII pattern
        # table + fixture (text_redact_pii); IVF stale-layout serving
        # gate (the three entries exercising the changed ivf
        # branches); TextIndex.delete id-type validation
        # (bm25_index_deleted)
        "text_redact_pii",
        "collection_search_ivf", "collection_search_ivf_delta",
        "collection_hybrid_ivf", "bm25_index_deleted",
        # touched late r5: opt-in nprobe variant on grouped/radius
        # (embed_outliers ceded its rotation slot, joins the r6 queue)
        "collection_search_grouped",
        # oldest of the r3-green block (r4 spent its window on
        # new/touched + the r2 remainder; these 29 are the front of
        # the r3 block in its r3 order)
        "media_knn", "media_frames", "schemaless_pure_search",
        "schemaless_update_delete", "hybrid_search", "doc_chunk",
        "decontaminate", "sample_stratified", "sample_fraction",
        "source_mix", "export_shards", "pack_sequences",
        "stream_hourly", "stream_sessionize", "stream_dedup",
        "collection_search_blocks_filtered", "events_asof",
        "ann_bq", "ann_pq", "embed_cluster_sizes",
        "sample_cluster_balanced", "dedup_spans", "text_repetition",
        "stream_ingest", "knn_bq", "knn_sq8", "semantic_dedup",
        "range_search",
        # The 15 remaining r3-green entries (token_vocab ..
        # collection_search) sit FIRST past the boundary and lead the
        # r6 rotation ledger; the 45 r4-green entries follow (freshest
        # driver signal). Every demoted entry is re-oracled by the
        # local gate every pytest run.
    }
    assert must_check <= window, sorted(must_check - window)
