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


#: The round-6 rotation ledger (CLAUDE.md): entries promised a
#: round-7 driver slot — the 29 r4-green entries whose last hard
#: driver signal is r4, the oldest on the board (stream_distinct
#: leads). Machine-checked against _KEY_ORDER below so the ledger
#: promise cannot silently drift (ADVICE r3 #1).
ROTATION_LEDGER_R7 = [
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
    "text_lang_id",
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
]


def test_registry_order_puts_unverified_entries_in_driver_window():
    """The driver hash-checks only the first _DRIVER_WINDOW queries()
    keys. Pin the ordering contract: the registry follows _KEY_ORDER
    exactly; the round-6 rotation-ledger entries (the 29 r4-green,
    oldest signal on the board) LEAD the round-7 window, every entry
    new or touched this round is inside it, and the rest of the
    window rotates in the oldest of the r5-green block
    (knn_euclidean .. text_redact_pii, in their r5 order). Past the
    boundary: the 31 remaining r5-green entries first (they lead the
    r8 rotation ledger), then the 47 r6-green entries (freshest
    driver signal; quality_classifier / web_sitemap / media_exif were
    promoted back into the window as touched-this-round). Every
    past-window entry is re-oracled by the local gate every pytest
    run."""
    from coltt_spark.registry import _DRIVER_WINDOW, _KEY_ORDER, QUERIES

    assert list(QUERIES) == _KEY_ORDER
    window = set(_KEY_ORDER[:_DRIVER_WINDOW])
    # ledger entries lead the window, in ledger order
    assert _KEY_ORDER[: len(ROTATION_LEDGER_R7)] == ROTATION_LEDGER_R7
    must_check = set(ROTATION_LEDGER_R7) | {
        # new this round (driver has never seen them)
        "bpe_train",
        "bpe_encode",
        "web_url_psl",
        "media_exif_orientation",
        # implementation touched this round: quality_classifier
        # (weight rounding + sigmoid quantization mirrored into the
        # oracle — ADVICE r6 #1/#2), web_sitemap (xml_unescape grew
        # numeric character references; fixture exercises them),
        # media_exif (lenient marker walk + per-row catch in the seam)
        "quality_classifier",
        "web_sitemap",
        "media_exif",
    }
    assert must_check <= window, sorted(must_check - window)
