"""Property-based BM25 parity: the Spark scorer must agree with an
independent pure-Python implementation on randomized corpora and
queries — same tokens, same idf/saturation math, same rounding.
Hypothesis drives corpus text (including empty docs, punctuation-only
docs, repeated tokens) and multi-term queries."""

from __future__ import annotations

import math
import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from coltt_spark.operators.fulltext import BM25_B, BM25_K1, bm25_score, query_terms

_WORDS = ["spark", "table", "join", "scan", "the", "xyzzy", "a1"]

_doc = st.lists(st.sampled_from(_WORDS + ["!!", ""]), min_size=0, max_size=12).map(
    " ".join
)
_corpus = st.lists(_doc, min_size=1, max_size=6)
_query = st.lists(st.sampled_from(_WORDS), min_size=1, max_size=3).map(" ".join)


def _py_bm25(corpus: dict[int, str], query: str):
    toks = {
        i: [t for t in re.split(r"[^a-z0-9]+", t_.lower()) if t]
        for i, t_ in corpus.items()
    }
    n = float(len(corpus))
    avgdl = sum(len(v) for v in toks.values()) / n
    terms = query_terms(query)
    dfreq = {t: float(sum(1 for v in toks.values() if t in v)) for t in terms}
    out = {}
    for i, v in toks.items():
        s, hit = 0.0, 0
        for t in sorted(terms):
            tf = float(v.count(t))
            if tf == 0:
                continue
            hit += 1
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * (tf * (BM25_K1 + 1.0)) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * (len(v) / avgdl))
            )
        if hit:
            out[i] = (hit, s)
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(corpus=_corpus, query=_query)
def test_bm25_matches_reference_on_random_corpora(spark, corpus, query):
    cdict = dict(enumerate(corpus))
    df = spark.createDataFrame(list(cdict.items()), ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_terms_hit"], r["score"])
        for r in bm25_score(df, "doc_id", "text", query).collect()
    }
    want = _py_bm25(cdict, query)
    assert set(got) == set(want)
    for i in got:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], rel=1e-12, abs=1e-12)
