"""The README quickstart, executed verbatim (collection half) — doc
rot insurance: if this fails, the README is lying."""

from __future__ import annotations


def test_readme_quickstart(spark, tmp_path):
    from coltt_spark import Catalog, IndexField

    cat = Catalog(spark, str(tmp_path / "warehouse"))
    coll = cat.create_collection(
        "docs", dim=4, distance="cosine",
        fields=[IndexField("id", "string", primary_key=True),
                IndexField("lang", "string")],
        layout="blocks",
    )
    coll.upsert([
        {"id": "a", "lang": "en", "vector": [0.1, 0.2, 0.3, 0.4]},
        {"id": "b", "lang": "de", "vector": [0.4, 0.3, 0.2, 0.1]},
    ])
    coll.flush()
    hits = coll.search(
        [0.1, 0.2, 0.3, 0.4], limit=5,
        filter_ast={"index_name": "lang", "op": "eq", "value": "en"},
    ).collect()
    assert [r["id"] for r in hits] == ["a"]
    assert hits[0]["dist"] < 1e-6 and hits[0]["score"] > 99.9
    batch = coll.search_batch({0: [0.1, 0.2, 0.3, 0.4]}, limit=5).collect()
    assert {r["id"] for r in batch} == {"a", "b"}
