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


#: The round-12 rotation ledger (CLAUDE.md): entries promised a
#: round-13 driver slot — the 16 r9-overflow entries lead (displaced
#: from the r12 window by its 8 new/touched seats, the oldest driver
#: signal on the board), then the r10-green entries in r10-window
#: order. The r10 block's TAIL overflows as this round's new/touched
#: seats land and keeps round-14 priority. Machine-checked against
#: _KEY_ORDER below so the ledger promise cannot silently drift
#: (ADVICE r3 #1).
ROTATION_LEDGER_R13 = [
    # the 16 r9-overflow entries, r9 order (r13 priority per the
    # r12 ledger — oldest driver signal on the board)
    "stream_quantile",
    "ann_lsh",
    "dedup_simhash",
    "collection_hybrid_text",
    "bm25_index_merged",
    "media_audio_features",
    "media_video_stats",
    "collection_search_blocks",
    "web_domain_quota",
    "token_fertility_by_lang",
    "bpe_encode_ids_pretok",
    "pack_sequences_ids",
    "bpe_train_bytes",
    "bpe_encode_ids",
    "text_lang_id_unicode",
    "text_lang_id",
    # the r10-green block in r10-window order; its tail is displaced
    # past the boundary as new/touched r13 seats land
    "upsert_delete",
    "filter_coercion",
    "filter_search",
    "multi_vector_search",
    "dedup_minhash_lsh",
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
]

#: the r10 overflow tail — displaced from the round-13 window by this
#: round's new/touched seats; they lead the round-14 rotation queue.
#: Each new/touched r13 seat moves one more entry from the ledger's
#: r10 tail to the FRONT of this block (keep both lists in sync).
R14_PRIORITY = [
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
]

#: new/touched this round — seats land at the window tail as they
#: ship, each displacing the ledger's last r10 entry into R14_PRIORITY
NEW_OR_TOUCHED_R13: list[str] = [
    # new r13: incremental dedup against a frozen MinHash/LSH
    # signature index (VERDICT r12 #2)
    "dedup_minhash_delta",
    # touched r13: two-level (bucketed) ordered fold in the soft-EM
    # M-step (VERDICT r12 #4)
    "unigram_train_soft",
    # new r13: batched hybrid serving through the quantized layout
    # (VERDICT r12 #7)
    "collection_hybrid_ivfpq_batch",
    # touched r13: PSL tranche 7 (3199 -> 3262 rules)
    "web_url_psl",
    # new r13: audio-visual joint near-dup dedup (VERDICT r12 #6)
    "media_av_dedup",
    # new r13: incremental canonical assignments over the delta pairs
    "dedup_minhash_delta_canonical",
    # new r13: connected components over the AV pair edges
    "media_av_dedup_groups",
    # new r13: the frozen-index delta through the byte-shingle seam
    "dedup_minhash_delta_bytes",
    # new r13: streaming MinHashIndex maintenance (build + merges via
    # foreachBatch)
    "stream_dedup_index",
]


def test_registry_order_puts_unverified_entries_in_driver_window():
    """The driver hash-checks only the first _DRIVER_WINDOW queries()
    keys. Pin the ordering contract: the registry follows _KEY_ORDER
    exactly; the round-12 rotation-ledger entries (16 r9-overflow +
    the leading r10-green block) LEAD the round-13 window, every entry
    new or touched this round is inside it (at the window tail), and
    the r10 overflow tail sits FIRST past the boundary with round-14
    priority. Past the boundary after it: the 49 r11-green entries in
    r11-window order, then the 50 r12-green entries in r12-window
    order. Every past-window entry is re-oracled by the local gate
    every pytest run."""
    from coltt_spark.registry import _DRIVER_WINDOW, _KEY_ORDER, QUERIES

    assert list(QUERIES) == _KEY_ORDER
    # ledger entries lead the window, in ledger order; new/touched
    # seats fill the window tail
    assert _KEY_ORDER[: len(ROTATION_LEDGER_R13)] == ROTATION_LEDGER_R13
    assert (
        _KEY_ORDER[len(ROTATION_LEDGER_R13) : _DRIVER_WINDOW]
        == NEW_OR_TOUCHED_R13
    )
    assert len(ROTATION_LEDGER_R13) + len(NEW_OR_TOUCHED_R13) == _DRIVER_WINDOW
    # the displaced r9 tail sits first past the boundary (r13 queue)
    assert (
        _KEY_ORDER[_DRIVER_WINDOW : _DRIVER_WINDOW + len(R14_PRIORITY)]
        == R14_PRIORITY
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
