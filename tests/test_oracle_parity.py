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


#: The round-11 rotation ledger (CLAUDE.md): entries promised a
#: round-12 driver slot — the 11 r8-overflow entries lead (displaced
#: from the r11 window by its 7 new/touched seats, the oldest driver
#: signal on the board), then the r9-green entries in r9-window
#: order. The r9 block's TAIL overflows as this round's new/touched
#: seats land and keeps round-13 priority. Machine-checked against
#: _KEY_ORDER below so the ledger promise cannot silently drift
#: (ADVICE r3 #1).
ROTATION_LEDGER_R12 = [
    # the 11 r8-overflow entries, r8 order (r12 priority per the
    # r11 ledger — oldest driver signal on the board)
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
    # the r9-green block in r9-window order; its tail is displaced
    # past the boundary as new/touched r12 seats land
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
]

#: the r9 overflow tail — displaced from the round-12 window by this
#: round's new/touched seats; they lead the round-13 rotation queue.
#: Each new/touched r12 seat moves one more entry from the ledger's
#: r9 tail to the FRONT of this block (keep both lists in sync).
R13_PRIORITY = [
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
]

#: new/touched this round — seats land at the window tail as they
#: ship, each displacing the ledger's last r9 entry into R13_PRIORITY
NEW_OR_TOUCHED_R12: list[str] = [
    # new r12: temporal-ordinal video near-dup dedup (VERDICT r11 #2)
    "media_video_dedup",
    # new r12: WordPiece tokenizer family (VERDICT r11 #3)
    "wordpiece_train",
    "wordpiece_encode",
    # new r12: hybrid text+vector through the IVFADC+OPQ funnel
    # (VERDICT r11 #7)
    "collection_hybrid_ivfpq",
    # new r12: connected components over the video pair edges
    "media_video_dedup_groups",
    # new r12: soft-EM unigram training with a full replay oracle
    "unigram_train_soft",
    # touched r12: PSL tranche 6 (3091 -> 3199 rules)
    "web_url_psl",
    # new r12: windowed language segmentation (code-switch detection)
    "text_lang_id_windows",
]


def test_registry_order_puts_unverified_entries_in_driver_window():
    """The driver hash-checks only the first _DRIVER_WINDOW queries()
    keys. Pin the ordering contract: the registry follows _KEY_ORDER
    exactly; the round-11 rotation-ledger entries (11 r8-overflow +
    the leading r9-green block) LEAD the round-12 window, every entry
    new or touched this round is inside it (at the window tail), and
    the r9 overflow tail sits FIRST past the boundary with round-13
    priority. Past the boundary after it: the 47 r10-green entries in
    r10-window order, then the 50 r11-green entries in r11-window
    order. Every past-window entry is re-oracled by the local gate
    every pytest run."""
    from coltt_spark.registry import _DRIVER_WINDOW, _KEY_ORDER, QUERIES

    assert list(QUERIES) == _KEY_ORDER
    # ledger entries lead the window, in ledger order; new/touched
    # seats fill the window tail
    assert _KEY_ORDER[: len(ROTATION_LEDGER_R12)] == ROTATION_LEDGER_R12
    assert (
        _KEY_ORDER[len(ROTATION_LEDGER_R12) : _DRIVER_WINDOW]
        == NEW_OR_TOUCHED_R12
    )
    assert len(ROTATION_LEDGER_R12) + len(NEW_OR_TOUCHED_R12) == _DRIVER_WINDOW
    # the displaced r9 tail sits first past the boundary (r13 queue)
    assert (
        _KEY_ORDER[_DRIVER_WINDOW : _DRIVER_WINDOW + len(R13_PRIORITY)]
        == R13_PRIORITY
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
