"""Property-based parity: the row-path filter compiler
(``compile_filter`` → Catalyst) and the block-path mask compiler
(``compile_filter_mask`` → numpy over Arrow payload) must agree on
EVERY AST — same coercion matrix, same three-valued NULL logic.
Hypothesis drives randomized ASTs over all ops (proto six + extended)
and nested and/or/not composites against a fixture with NULLs and
coercion-prone values in every column."""

from __future__ import annotations

import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from coltt_spark.filters import compile_filter, compile_filter_mask

ROWS = [
    # (id, tag,       n,    x,     flag)
    (0, "alpha", 5, 0.5, True),
    (1, "beta", 10, 1.5, False),
    (2, "gamma", 15, -2.0, True),
    (3, None, 20, 3.25, None),
    (4, "42", 25, 0.0, False),
    (5, "true", None, None, True),
    (6, "", 35, 7.5, None),
    (7, "alphabet", 40, -0.5, False),
    (8, "beta", 42, 1.5, True),
    (9, "Gamma", 50, 100.0, False),
]

_SCHEMA = "id long, tag string, n long, x double, flag boolean"

_ARROW = pa.table(
    {
        "id": pa.array([r[0] for r in ROWS], pa.int64()),
        "tag": pa.array([r[1] for r in ROWS], pa.string()),
        "n": pa.array([r[2] for r in ROWS], pa.int64()),
        "x": pa.array([r[3] for r in ROWS], pa.float64()),
        "flag": pa.array([r[4] for r in ROWS], pa.bool_()),
    }
)

_COLS = ["tag", "n", "x", "flag"]

_scalar = st.one_of(
    st.integers(-5, 50),
    st.sampled_from([0.0, 1.5, 3.25, -2.0, 42.0]),
    st.sampled_from(
        ["alpha", "beta", "42", "true", "false", "", "zz", "1.5", "not-a-number"]
    ),
    st.booleans(),
)

_leaf = st.one_of(
    st.fixed_dictionaries(
        {
            "index_name": st.sampled_from(_COLS),
            "op": st.sampled_from(["eq", "neq", "gt", "gte", "lt", "lte"]),
            "value": _scalar,
        }
    ),
    st.fixed_dictionaries(
        {
            "index_name": st.sampled_from(_COLS),
            "op": st.sampled_from(["in", "not_in"]),
            "value": st.lists(_scalar, min_size=1, max_size=4),
        }
    ),
    st.fixed_dictionaries(
        {
            "index_name": st.sampled_from(["n", "x"]),
            "op": st.just("between"),
            "value": st.tuples(st.integers(-5, 30), st.integers(0, 60)).map(list),
        }
    ),
    st.fixed_dictionaries(
        {
            "index_name": st.just("tag"),
            "op": st.just("like"),
            "value": st.sampled_from(
                ["%a%", "alpha%", "%et", "_eta", "%", "a_b", "42", "%ALPHA%"]
            ),
        }
    ),
)


def _composites(children):
    return st.one_of(
        st.fixed_dictionaries(
            {
                "op": st.sampled_from(["and", "or"]),
                "expressions": st.lists(children, min_size=1, max_size=3),
            }
        ),
        st.fixed_dictionaries(
            {"op": st.just("not"), "expressions": st.lists(children, min_size=1, max_size=1)}
        ),
    )


_ast = st.recursive(_leaf, _composites, max_leaves=6)


@pytest.fixture(scope="module")
def fixture_df(spark):
    return spark.createDataFrame(ROWS, _SCHEMA).cache()


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ast=_ast)
def test_mask_matches_row_path(fixture_df, ast):
    row_ids = sorted(
        r["id"] for r in fixture_df.filter(compile_filter(fixture_df, ast)).collect()
    )
    mask = compile_filter_mask(fixture_df.schema, ast)(_ARROW)
    mask_ids = sorted(ROWS[i][0] for i in range(len(ROWS)) if mask[i])
    assert row_ids == mask_ids, ast


# -- end-to-end: the three serving layouts must agree on FILTERED
# -- search for every AST (row scan ≡ packed-block mask ≡ IVF packed
# -- probe with all lists probed, so the comparison is exact)

_COLL_ROWS = [
    {
        "id": f"r{i:03d}",
        "label": i % 7,
        "tag": ["alpha", "beta", "gamma", "42", "true", ""][i % 6],
        "vector": [((i * 31 + j * 17) % 101) / 101.0 - 0.5 for j in range(6)],
    }
    for i in range(120)
]

_COLL_LEAF = st.one_of(
    st.fixed_dictionaries(
        {
            "index_name": st.sampled_from(["label", "tag"]),
            "op": st.sampled_from(["eq", "neq", "gt", "gte", "lt", "lte"]),
            "value": st.one_of(
                st.integers(-1, 8),
                st.sampled_from(["alpha", "beta", "42", "", "zz"]),
            ),
        }
    ),
    st.fixed_dictionaries(
        {
            "index_name": st.just("label"),
            "op": st.sampled_from(["in", "not_in"]),
            "value": st.lists(st.integers(0, 7), min_size=1, max_size=3),
        }
    ),
    st.fixed_dictionaries(
        {
            "index_name": st.just("tag"),
            "op": st.just("like"),
            "value": st.sampled_from(["%a%", "alpha%", "%", "4_"]),
        }
    ),
)

_COLL_AST = st.recursive(_COLL_LEAF, _composites, max_leaves=4)


@pytest.fixture(scope="module")
def layout_collections(spark, tmp_path_factory):
    from coltt_spark.catalog import Catalog
    from coltt_spark.schema import IndexField

    fields = [
        IndexField("id", "string", primary_key=True),
        IndexField("label", "integer"),
        IndexField("tag", "string"),
    ]
    cat = Catalog(spark, str(tmp_path_factory.mktemp("wh_layouts")))
    colls = {
        "rows": cat.create_collection(
            "fp_rows", dim=6, distance="euclidean", fields=fields
        ),
        "blocks": cat.create_collection(
            "fp_blocks", dim=6, distance="euclidean", fields=fields,
            layout="blocks", block_dtype="float64",
        ),
        "ivf": cat.create_collection(
            "fp_ivf", dim=6, distance="euclidean", fields=fields,
            layout="ivf", ivf_centroids=4, ivf_nprobe=4,
            block_dtype="float64",
        ),
    }
    for c in colls.values():
        c.upsert(_COLL_ROWS)
        c.flush()
    return colls


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ast=_COLL_AST)
def test_layouts_agree_on_filtered_search(layout_collections, ast):
    q = _COLL_ROWS[0]["vector"]
    got = {}
    for name, c in layout_collections.items():
        got[name] = [
            (r["id"], round(r["dist"], 6), r["label"], r["tag"])
            for r in c.search(q, filter_ast=ast, limit=15).collect()
        ]
    assert got["rows"] == got["blocks"], ast
    assert got["rows"] == got["ivf"], ast
