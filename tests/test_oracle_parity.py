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


#: The round-7 rotation ledger (CLAUDE.md): entries promised a
#: round-8 driver slot — the 33 r5-green entries whose last hard
#: driver signal is r5, the oldest on the board (events_json leads).
#: Machine-checked against _KEY_ORDER below so the ledger promise
#: cannot silently drift (ADVICE r3 #1).
ROTATION_LEDGER_R8 = [
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
]


def test_registry_order_puts_unverified_entries_in_driver_window():
    """The driver hash-checks only the first _DRIVER_WINDOW queries()
    keys. Pin the ordering contract: the registry follows _KEY_ORDER
    exactly; the round-7 rotation-ledger entries (the 33 r5-green,
    oldest signal on the board) LEAD the round-8 window, every entry
    new or touched this round is inside it, and the rest of the
    window rotates in the oldest of the r6-green block
    (embed_outliers — the block's tail seats went back past the
    boundary one by one as the r8-new entries landed: ann_recall and
    stream_join made room for text_lang_id_unicode /
    pack_sequences_ids, then token_vocab, doc_lm_score,
    filter_extended, collection_time_travel and jsonl_roundtrip for
    dedup_containment_bytes, text_script_profile,
    decontaminate_bytes, ann_ivfpq and dedup_minhash_bytes). Past
    the boundary: the 45 remaining r6-green entries first, in their
    r6 order (they lead the r9 rotation ledger), then the 45
    r7-green entries (freshest driver
    signal; bpe_train / bpe_encode / web_url_psl / media_exif /
    media_exif_orientation were promoted back into the window as
    touched-this-round). Every past-window entry is re-oracled by
    the local gate every pytest run."""
    from coltt_spark.registry import _DRIVER_WINDOW, _KEY_ORDER, QUERIES

    assert list(QUERIES) == _KEY_ORDER
    window = set(_KEY_ORDER[:_DRIVER_WINDOW])
    # ledger entries lead the window, in ledger order
    assert _KEY_ORDER[: len(ROTATION_LEDGER_R8)] == ROTATION_LEDGER_R8
    must_check = set(ROTATION_LEDGER_R8) | {
        # new this round (driver has never seen them)
        "token_count_unicode",
        "text_lang_id_unicode",
        "bpe_train_bytes",
        "bpe_encode_ids",
        "pack_sequences_ids",
        "dedup_minhash_bytes",
        "ann_ivfpq",
        "decontaminate_bytes",
        "text_script_profile",
        "dedup_containment_bytes",
        # implementation touched this round: bpe_train / bpe_encode
        # (oracle chain degrades to identity on merge exhaustion —
        # ADVICE r7 #1 — and was generalized for the byte path),
        # web_url_psl (snapshot 221 → 1388 rules, *.sch.uk fix),
        # media_exif / media_exif_orientation (TypeError leniency,
        # LONG coercion — ADVICE r7 #2), pack_sequences_firstfit
        # (count_col coalesce — ADVICE r7 #4; pack_sequences itself
        # is in the ledger block above)
        "bpe_train",
        "bpe_encode",
        "web_url_psl",
        "media_exif",
        "media_exif_orientation",
        "pack_sequences_firstfit",
    }
    assert must_check <= window, sorted(must_check - window)
