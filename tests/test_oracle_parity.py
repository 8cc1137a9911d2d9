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


#: The round-13 rotation ledger (CLAUDE.md), executed this round:
#: the 22 r10-overflow entries lead (displaced from the r13 window,
#: the oldest driver signal on the board), then the leading r11-green
#: entries in r11-window order. The r11 block TAIL overflows as this
#: round's touched seats land and keeps round-15 priority.
#: Machine-checked against _KEY_ORDER below so the ledger promise
#: cannot silently drift (ADVICE r3 #1).
ROTATION_LEDGER_R14 = [
    # the 22 r10-overflow entries, r10 order (r14 priority per the
    # r13 ledger — oldest driver signal on the board)
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
    "media_image_dedup",
    "collection_search_ivfpq_batch",
    "media_image_dedup_groups",
    "unigram_train",
    "unigram_encode_ids",
    "collection_search_ivfpq",
    "collection_search_ivfpq_delta",
    # the leading 25 r11-green entries in r11-window order; the
    # 24-entry tail is displaced past the boundary (R15_PRIORITY)
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
]

#: the r11 overflow tail — displaced from the round-14 window by the
#: 22 r10-overflow entries + this round's 3 touched seats; they lead
#: the round-15 rotation queue, in r11-window order (pack_sequences
#: was the last leading-block entry until web_domain_quota's touched
#: seat displaced it).
R15_PRIORITY = [
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
    "stream_ingest_ivfpq",
    "unigram_train_pruned",
    "media_audio_dedup",
    "collection_search_ivfpq_opq",
    "decontaminate_semantic",
    "neardup_cosine",
]

#: touched this round (r14 = optimization round 2) — execution-shape
#: changes re-seated inside the window so the driver re-verifies them
#: (construction-only expr-ification changes are NOT re-seated: they
#: are value-pinned by tests/test_expr_parity.py, the r13 precedent).
NEW_OR_TOUCHED_R14: list[str] = [
    # touched r14-opt: the bigram stream is tokenized ONCE into a lazy
    # local checkpoint (was 5 re-derived scan+explode subtrees); the
    # count/context/probability consumers read the checkpoint
    "doc_ppl_bigram",
    # touched r14-opt: connected-components rounds fused to one job
    # each (lazy checkpoint materialized by the changed-count action);
    # heaviest registry key, VERDICT r13 #3
    "dedup_minhash_delta_canonical",
    # touched r14-opt: the PSL-resolved (doc_id, domain, score)
    # projection lands in a lazy localCheckpoint so the ~2.6k-rule
    # domain CASE is evaluated once, not once per domain_quota plan
    # branch (tranche-3 continuation of the doc_ppl_bigram pattern)
    "web_domain_quota",
]


def test_registry_order_puts_unverified_entries_in_driver_window():
    """The driver hash-checks only the first _DRIVER_WINDOW queries()
    keys. Pin the ordering contract: the registry follows _KEY_ORDER
    exactly; the round-13 rotation-ledger entries (22 r10-overflow +
    the leading 25 r11-green entries) LEAD the round-14 window, every
    entry touched this round is inside it (at the window tail), and
    the r11 overflow tail sits FIRST past the boundary with round-15
    priority. Past the boundary after it: the 47 remaining r12-green
    entries in r12-window order, then the 48 remaining r13-green
    entries in r13-window order (web_domain_quota left that block
    when promoted as touched). Every past-window entry is re-oracled
    by the local gate every pytest run."""
    from coltt_spark.registry import _DRIVER_WINDOW, _KEY_ORDER, QUERIES

    assert list(QUERIES) == _KEY_ORDER
    # ledger entries lead the window, in ledger order; touched
    # seats fill the window tail
    assert _KEY_ORDER[: len(ROTATION_LEDGER_R14)] == ROTATION_LEDGER_R14
    assert (
        _KEY_ORDER[len(ROTATION_LEDGER_R14) : _DRIVER_WINDOW]
        == NEW_OR_TOUCHED_R14
    )
    assert len(ROTATION_LEDGER_R14) + len(NEW_OR_TOUCHED_R14) == _DRIVER_WINDOW
    # the displaced r11 tail sits first past the boundary (r15 queue)
    assert (
        _KEY_ORDER[_DRIVER_WINDOW : _DRIVER_WINDOW + len(R15_PRIORITY)]
        == R15_PRIORITY
    )


def test_opq_oracle_training_matches_persisted_artifacts(spark):
    """ADVICE r11: the OPQ oracle's independence boundary sits at
    training — engine and oracle each run ``opq_train_np`` on residual
    samples that differ only in the last float bit (Spark vs DuckDB
    fold order). A near-tie k-means assignment or Procrustes flip
    inside training would cascade into divergent codebooks and surface
    only as an opaque gate hash mismatch. Detect fragility at the
    source: the oracle-derived (R, book) must match the gate
    collection's persisted rotation.npy / book.npy tightly."""
    import os

    import numpy as np

    from coltt_spark.registry import (
        _SF_GATE,
        _ivfpq_opq_collection,
        _opq_collection_arrays,
    )

    coll = _ivfpq_opq_collection(spark, _SF_GATE)
    d = coll._ivf_dir("vector")
    R = np.load(os.path.join(d, "rotation.npy"))
    book = np.load(os.path.join(d, "book.npy"))
    oR, obook = _opq_collection_arrays(_SF_GATE)
    assert R.shape == oR.shape and book.shape == obook.shape
    assert np.allclose(R, oR, atol=1e-9), np.abs(R - oR).max()
    assert np.allclose(book, obook, atol=1e-9), np.abs(book - obook).max()
