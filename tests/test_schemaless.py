"""Schemaless (core-v3) collection semantics."""

from __future__ import annotations

from coltt_spark.schemaless import SchemalessCollection, stringify


def test_stringify_matrix():
    assert stringify(True) == "true" and stringify(False) == "false"
    assert stringify(5) == "5"
    assert stringify(5.0) == "5"  # integral float collapses like Go fmt
    assert stringify(0.5) == "0.5"
    assert stringify("x") == "x"


def test_insert_update_delete(spark):
    coll = SchemalessCollection(spark, dim=2, distance="euclidean")
    ids = coll.insert(
        [
            {"metadata": {"k": 1, "flag": True}, "vector": [0.0, 0.0]},
            {"metadata": {"k": 2}, "vector": [1.0, 1.0]},
        ]
    )
    assert ids == [0, 1]
    # update = remove + reinsert under a NEW id (core semantics)
    new_id = coll.update(0, {"metadata": {"k": 9}, "vector": [2.0, 2.0]})
    assert new_id == 2
    rows = {r["_id"]: r["metadata"] for r in coll.df().collect()}
    assert set(rows) == {1, 2} and rows[2]["k"] == "9"
    # update of an absent id falls back to insert
    assert coll.update(777, {"metadata": {"k": 3}, "vector": [3.0, 3.0]}) == 3
    coll.delete(1)
    assert {r["_id"] for r in coll.df().collect()} == {2, 3}


def test_pure_and_hybrid_search(spark):
    coll = SchemalessCollection(spark, dim=2, distance="euclidean")
    coll.insert(
        [
            {"metadata": {"grp": i % 3, "odd": bool(i % 2)}, "vector": [float(i), 0.0]}
            for i in range(30)
        ]
    )
    # stringified equality: int filter value matches stringified map
    hits = coll.filter_search({"grp": 1, "odd": True}).collect()
    assert {r["_id"] for r in hits} == {i for i in range(30) if i % 3 == 1 and i % 2}
    assert all(r["score"] == 100.0 for r in hits)

    # hybrid: candidates = top-6 nearest to origin (ids 0..5), filter
    # odd=true → survivors {1,3,5} even though more odd rows exist
    res = coll.hybrid_search([0.0, 0.0], {"odd": True}, k=2, expand=3).collect()
    assert [r["_id"] for r in res] == [1, 3]


def test_parquet_roundtrip(spark, tmp_path):
    coll = SchemalessCollection(spark, dim=2, distance="euclidean")
    coll.insert([{"metadata": {"a": i}, "vector": [float(i), 1.0]} for i in range(10)])
    coll.delete(4)
    path = str(tmp_path / "sl.parquet")
    coll.to_parquet(path)
    back = SchemalessCollection.from_parquet(spark, path, dim=2, distance="euclidean")
    assert back.insert([{"metadata": {}, "vector": [0.0, 0.0]}]) == [10]
    a = sorted((r["_id"], r["metadata"]["a"]) for r in coll.df().collect())
    b = sorted((r["_id"], r["metadata"].get("a")) for r in back.df().collect() if r["_id"] != 10)
    assert a == b


def test_bulk_update_delete(spark):
    """Bulk delete_ids / update_df: distributed remove+reinsert with
    deterministic fresh ids in old-id order."""
    from pyspark.sql import functions as F

    coll = SchemalessCollection(spark, dim=2, distance="euclidean")
    coll.insert(
        [{"metadata": {"k": i}, "vector": [float(i), 0.0]} for i in range(6)]
    )
    coll.delete_ids([1, 3])
    assert {r["_id"] for r in coll.df().collect()} == {0, 2, 4, 5}
    # bulk update of ids 4,5 -> reinserted as 6,7 (old-id order)
    upd = coll.df().filter(F.col("_id") >= 4).select(
        "_id",
        F.create_map(F.lit("k"), F.lit("updated")).alias("metadata"),
        "vector",
    )
    n = coll.update_df(upd)
    assert n == 2
    rows = {r["_id"]: r["metadata"] for r in coll.df().collect()}
    assert set(rows) == {0, 2, 6, 7}
    assert rows[6]["k"] == "updated" and rows[7]["k"] == "updated"
    # delete_ids with a DataFrame of ids (anti-join path)
    coll.delete_ids(coll.df().filter(F.col("_id") == 2).select("_id"))
    assert {r["_id"] for r in coll.df().collect()} == {0, 6, 7}
