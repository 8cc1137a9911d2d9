"""Model-based randomized DML fuzz of the collection state machine.

A seeded random program of upserts (new + overwriting ids, duplicate
ids within a batch), predicate deletes, flushes (full, delta, and
compact) runs against all three serving layouts, mirrored into a
plain Python dict model. After every flush — and at the end — the
collection's full state must equal the model, and random searches
must equal a numpy brute force over the model (same float32
normalize-at-write, same (dist, pk) tie-break). This exercises the
sequences unit tests don't enumerate: delete-then-reupsert the same
pk across delta flushes, overlapping deletes, compact-after-deltas,
searches against a dirty (unflushed) view."""

from __future__ import annotations

import random

import numpy as np
import pytest

from coltt_spark.catalog import Catalog
from coltt_spark.schema import IndexField

FIELDS = [
    IndexField("id", "string", primary_key=True),
    IndexField("type", "integer"),
]

DIM = 4
IDS = [f"k{i:02d}" for i in range(40)]


def _vec(rng):
    return [rng.gauss(0, 1) for _ in range(DIM)]


def _check_state(coll, model):
    got = {
        r["id"]: (r["type"], tuple(round(float(x), 5) for x in r["vector"]))
        for r in coll.df().collect()
    }
    want = {
        k: (t, tuple(round(float(np.float32(x)), 5) for x in v))
        for k, (t, v) in model.items()
    }
    assert got == want


def _check_search(coll, model, q):
    got = [
        (r["id"], round(r["dist"], 6))
        for r in coll.search(q, limit=5).collect()
    ]
    qa = np.asarray(q, dtype=np.float64)
    scored = []
    for k, (_t, v) in model.items():
        stored = np.asarray(v, dtype=np.float32).astype(np.float64)
        scored.append((float(np.sqrt(((stored - qa) ** 2).sum())), k))
    scored.sort(key=lambda p: (p[0], p[1]))
    want = [(k, round(d, 6)) for d, k in scored[:5]]
    assert got == want


@pytest.mark.parametrize("layout", ["rows", "blocks", "ivf", "ivfpq", "ivfpq_opq"])
def test_dml_state_machine_fuzz(spark, tmp_path, layout):
    # ivfpq arm: nprobe = n_centroids (every list probed) and the
    # default refine (50) ≥ the 40-id key space, so the ADC funnel
    # passes every live row to the exact rerank and search must equal
    # the brute force EXACTLY — codebook quality can affect nothing.
    # What the arm exercises is the full DML surface over the code
    # index: fixed-centroid/fixed-codebook delta re-encodes,
    # tombstone masking inside the ADC scan, compact retrains.
    rng = random.Random(1000 + len(layout))
    cat = Catalog(spark, str(tmp_path / f"wh_{layout}"))
    kwargs = {} if layout == "rows" else {"block_dtype": "float64"}
    if layout == "ivf":
        kwargs.update(ivf_centroids=4, ivf_nprobe=4)
    if layout.startswith("ivfpq"):
        kwargs.update(ivf_centroids=4, ivf_nprobe=4, pq_subspaces=4, pq_codes=8)
    if layout == "ivfpq_opq":
        # the OPQ arm: the rotation trains at every full build, stays
        # FROZEN across delta flushes, and must be as invisible to the
        # exhaustive-funnel equivalence as the codebooks are (nprobe =
        # all lists + refine >= key space => search == brute force)
        kwargs.update(opq=True)
        layout = "ivfpq"
    coll = cat.create_collection(
        "fuzz", dim=DIM, distance="euclidean", fields=FIELDS,
        layout=layout, **kwargs,
    )
    model: dict[str, tuple[int, list[float]]] = {}
    n_flushes = 0
    for step in range(28):
        op = rng.random()
        if op < 0.55:  # upsert a batch (with possible in-batch dup)
            batch = []
            for _ in range(rng.randint(1, 8)):
                k = rng.choice(IDS)
                t = rng.randint(0, 5)
                v = _vec(rng)
                batch.append({"id": k, "type": t, "vector": v})
            coll.upsert(batch)
            for row in batch:  # LWW: later batch rows win
                model[row["id"]] = (row["type"], row["vector"])
        elif op < 0.7 and model:  # predicate delete
            t = rng.randint(0, 5)
            coll.delete_where({"index_name": "type", "op": "eq", "value": t})
            model = {k: tv for k, tv in model.items() if tv[0] != t}
        elif op < 0.9:  # flush (occasionally a full compact)
            if model or n_flushes:
                compact = rng.random() < 0.25
                coll.flush(compact=compact)
                n_flushes += 1
                _check_state(coll, model)
        if model and rng.random() < 0.25:
            _check_search(coll, model, _vec(rng))
    if model or n_flushes:
        coll.flush()
        _check_state(coll, model)
        _check_search(coll, model, _vec(rng))


def test_versioned_time_travel_fuzz(spark, tmp_path):
    """Versioned twin of the fuzz: every flush snapshots the model,
    and at the end EVERY retained version must replay its historical
    state exactly through read_version (hardlinked bases + per-version
    tombstone views must never bleed between versions)."""
    rng = random.Random(4242)
    cat = Catalog(spark, str(tmp_path / "wh_tt"))
    coll = cat.create_collection(
        "fuzz_tt", dim=DIM, distance="euclidean", fields=FIELDS,
        layout="blocks", block_dtype="float64", versioning=True,
    )
    model: dict[str, tuple[int, list[float]]] = {}
    history: dict[int, dict] = {}
    for step in range(24):
        op = rng.random()
        if op < 0.6:
            batch = []
            for _ in range(rng.randint(1, 8)):
                k = rng.choice(IDS)
                batch.append({"id": k, "type": rng.randint(0, 5), "vector": _vec(rng)})
            coll.upsert(batch)
            for row in batch:
                model[row["id"]] = (row["type"], row["vector"])
        elif op < 0.75 and model:
            t = rng.randint(0, 5)
            coll.delete_where({"index_name": "type", "op": "eq", "value": t})
            model = {k: tv for k, tv in model.items() if tv[0] != t}
        elif model or history:
            coll.flush()
            history[coll.manifest.version] = dict(model)
    if model:
        coll.flush()
        history[coll.manifest.version] = dict(model)
    assert len(history) >= 3, "fuzz program produced too few versions"
    for v, snap in history.items():
        got = {
            r["id"]: (r["type"], tuple(round(float(x), 5) for x in r["vector"]))
            for r in coll.read_version(v).collect()
        }
        want = {
            k: (t, tuple(round(float(np.float32(x)), 5) for x in vec))
            for k, (t, vec) in snap.items()
        }
        assert got == want, f"version {v}"
