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
