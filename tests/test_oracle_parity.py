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


#: The round-10 rotation ledger (CLAUDE.md): entries promised a
#: round-11 driver slot — the 9 r7-overflow entries lead (displaced
#: from the r10 window by its 9 new/touched seats, the oldest driver
#: signal on the board), then the r8-green entries in r8 order. The
#: r8 block's TAIL overflows as this round's new/touched seats land
#: and keeps round-12 priority. Machine-checked against _KEY_ORDER
#: below so the ledger promise cannot silently drift (ADVICE r3 #1).
ROTATION_LEDGER_R11 = [
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
    "text_redact_pii",
    "collection_hybrid_ivf",
    "bm25_index_deleted",
    "collection_search_grouped",
    "media_knn",
    "media_frames",
    "schemaless_pure_search",
    "schemaless_update_delete",
    "hybrid_search",
    "doc_chunk",
    "decontaminate",
    "sample_stratified",
    "sample_fraction",
    "source_mix",
    "export_shards",
    "pack_sequences",
    "stream_hourly",
    "stream_sessionize",
    "stream_dedup",
    "collection_search_blocks_filtered",
    "events_asof",
    "ann_bq",
    "ann_pq",
    "embed_cluster_sizes",
    "sample_cluster_balanced",
    "dedup_spans",
    "text_repetition",
    "stream_ingest",
    "knn_bq",
    "knn_sq8",
    "semantic_dedup",
    "range_search",
    "token_count_unicode",
]

#: the r8 overflow tail — displaced from the round-11 window by this
#: round's new/touched seats; they lead the round-12 rotation queue
R12_PRIORITY = [
    "dedup_minhash_bytes",
    "ann_ivfpq",
    "decontaminate_bytes",
    "text_script_profile",
    "dedup_containment_bytes",
    "bpe_train",
    "bpe_encode",
    "media_exif",
    "media_exif_orientation",
    "pack_sequences_firstfit",
    "embed_outliers",
]


def test_registry_order_puts_unverified_entries_in_driver_window():
    """The driver hash-checks only the first _DRIVER_WINDOW queries()
    keys. Pin the ordering contract: the registry follows _KEY_ORDER
    exactly; the round-10 rotation-ledger entries (9 r7-overflow +
    the leading r8-green block) LEAD the round-11 window, every entry
    new or touched this round is inside it, and the r8 overflow tail
    sits FIRST past the boundary with round-12 priority. Past the
    boundary after it: the 47 r9-green entries in r9-window order,
    then the 50 r10-green entries in r10-window order. Every
    past-window entry is re-oracled by the local gate every pytest
    run."""
    from coltt_spark.registry import _DRIVER_WINDOW, _KEY_ORDER, QUERIES

    assert list(QUERIES) == _KEY_ORDER
    window = set(_KEY_ORDER[:_DRIVER_WINDOW])
    # ledger entries lead the window, in ledger order
    assert _KEY_ORDER[: len(ROTATION_LEDGER_R11)] == ROTATION_LEDGER_R11
    # the displaced r8 tail sits first past the boundary (r12 queue)
    assert (
        _KEY_ORDER[_DRIVER_WINDOW : _DRIVER_WINDOW + len(R12_PRIORITY)]
        == R12_PRIORITY
    )
    # new/touched this round — seats land here as they ship
    new_or_touched: set[str] = {
        # new r11: OPQ rotation through the Collection product surface
        "collection_search_ivfpq_opq",
        # new r11: acoustic near-dup fingerprint dedup
        "media_audio_dedup",
        # new r11: unigram vocabulary pruning (Kudo 2018 completed)
        "unigram_train_pruned",
        # new r11: streaming -> ivfpq composition through the batched ADC
        "stream_ingest_ivfpq",
        # touched r11: multi-band sign-LSH blocking (VERDICT r10 #3)
        # + planted sign-flip paraphrase fixtures
        "decontaminate_semantic",
        "neardup_cosine",
        # touched r11: PSL tranche 5 (2574 -> 2920 rules)
        "web_url_psl",
    }
    must_check = set(ROTATION_LEDGER_R11) | new_or_touched
    assert must_check <= window, sorted(must_check - window)
