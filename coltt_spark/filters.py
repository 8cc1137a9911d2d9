"""Filter-expression compiler: coltt filter AST → Spark ``Column``.

Reference parity: the proto filter tree (leaf ``Filter{index_name, op,
value}`` with ops EQ NEQ GT GTE LT LTE, composites AND/OR with arbitrary
nesting — ``idl/proto/v4/edge.proto:139-164``) is evaluated there
against a roaring-bitmap inverted index (``pkg/inverted/search.go``),
including a cross-type coercion matrix (string "5" matches integer 5,
ints compare against floats, bools against "true"/"false" —
``pkg/inverted/bitmap_index.go:99-356``).

Spark-first choice: no index structure is materialized. The tree
compiles to a boolean ``Column``; Catalyst pushes it below the
projection into the Parquet scan (row-group min/max + dictionary
pruning), which is the same work the bitmap index did, but free and
already distributed. AND → ``&``, OR → ``|`` — bitmap intersect/union
becomes predicate logic on the scan.

AST accepted (dict-shaped, mirroring the proto):

    {"index_name": "type", "op": "gte", "value": 5}                    # leaf
    {"op": "and"|"or", "expressions": [<ast>, ...]}                    # composite
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: The reference's six proto ops, plus the extended set a filter
#: surface at scale needs (each still compiles to a single pushable
#: predicate): ``in``/``not_in`` over a literal list, inclusive
#: ``between`` [lo, hi], SQL ``like`` patterns, and a ``not``
#: composite. Every extended leaf reuses the same per-literal
#: coercion matrix as the proto six.
OPS = ("eq", "neq", "gt", "gte", "lt", "lte", "in", "not_in", "between", "like")

_NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def _coerce(col: Column, col_type: T.DataType, value: Any) -> tuple[Column, Column]:
    """Replicate the reference coercion matrix for (column, literal).

    - numeric column vs string literal: parse the string as a number
      ("5" matches 5); an unparseable string matches nothing (the
      bitmap scan finds no coercible value).
    - string column vs numeric literal: cast the column to double;
      non-numeric strings become NULL and fail every comparison.
    - boolean column vs string literal: accept "true"/"false".
    - otherwise compare natively.
    """
    if isinstance(col_type, _NUMERIC_TYPES):
        if isinstance(value, str):
            try:
                value = float(value)
            except ValueError:
                return F.lit(None).cast("double"), F.lit(None).cast("double")
        if isinstance(value, bool):
            value = float(value)
        return col.cast("double"), F.lit(float(value))
    if isinstance(col_type, T.StringType):
        if isinstance(value, bool):
            return col, F.lit("true" if value else "false")
        if isinstance(value, (int, float)):
            return col.cast("double"), F.lit(float(value))
        return col, F.lit(value)
    if isinstance(col_type, T.BooleanType):
        if isinstance(value, str):
            return col, F.lit(value.strip().lower() == "true")
        if isinstance(value, (int, float)):
            return col, F.lit(bool(value))
        return col, F.lit(value)
    return col, F.lit(value)


def _leaf(df: DataFrame, name: str, op: str, value: Any) -> Column:
    field = dict(zip(df.schema.names, df.schema.fields))  # name -> StructField
    if name not in field:
        raise KeyError(f"filter references unknown column {name!r}")
    dt = field[name].dataType
    if op in ("in", "not_in"):
        if not isinstance(value, (list, tuple)) or not value:
            raise ValueError(f"{op} requires a non-empty list value, got {value!r}")
        out = None
        for v in value:  # each element independently coerced
            lhs_i, rhs_i = _coerce(F.col(name), dt, v)
            eq = lhs_i == rhs_i
            out = eq if out is None else (out | eq)
        return out if op == "in" else ~F.coalesce(out, F.lit(False))
    if op == "between":
        if not isinstance(value, (list, tuple)) or len(value) != 2:
            raise ValueError(f"between requires [lo, hi], got {value!r}")
        llo, rlo = _coerce(F.col(name), dt, value[0])
        lhi, rhi = _coerce(F.col(name), dt, value[1])
        return (llo >= rlo) & (lhi <= rhi)
    if op == "like":
        if not isinstance(value, str):
            raise ValueError(f"like requires a string pattern, got {value!r}")
        return F.col(name).cast("string").like(value)
    lhs, rhs = _coerce(F.col(name), dt, value)
    if op == "eq":
        return lhs == rhs
    if op == "neq":
        return lhs != rhs
    if op == "gt":
        return lhs > rhs
    if op == "gte":
        return lhs >= rhs
    if op == "lt":
        return lhs < rhs
    if op == "lte":
        return lhs <= rhs
    raise ValueError(f"unknown op {op!r}; expected one of {OPS}")


def compile_filter(df: DataFrame, ast: dict[str, Any]) -> Column:
    """Compile a filter AST into a boolean Column against ``df``."""
    if "index_name" in ast:
        return _leaf(df, ast["index_name"], str(ast["op"]).lower(), ast["value"])
    op = str(ast.get("op", "")).lower()
    exprs = ast.get("expressions", [])
    if op == "not":
        if len(exprs) != 1:
            raise ValueError(f"not takes exactly one expression: {ast!r}")
        return ~compile_filter(df, exprs[0])
    if op not in ("and", "or") or not exprs:
        raise ValueError(f"bad composite node: {ast!r}")
    out = compile_filter(df, exprs[0])
    for child in exprs[1:]:
        nxt = compile_filter(df, child)
        out = (out & nxt) if op == "and" else (out | nxt)
    return out


_INT_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOAT_TYPES = (T.FloatType, T.DoubleType, T.DecimalType)


def validate_delete_key(df: DataFrame, ast: dict[str, Any]) -> None:
    """Strict delete-key validation — the INTENDED semantics of edge's
    ``dropKeyAnalyzer`` (``edge/edge_analyzer.go:111-149``): every
    referenced index must exist, and the literal's type must match the
    declared column type — string↔str, int↔int (integral floats
    allowed, matching the reference's float64-with-integer-value
    case), float↔float, bool↔bool. Unlike query filters, the DELETE
    path performs NO cross-type coercion: a type mismatch is an error,
    not an empty match. (The reference function switches on the value
    where it means to switch on the declared type — a quirk we do not
    replicate.)"""
    if "index_name" in ast:
        name = ast["index_name"]
        field = dict(zip(df.schema.names, df.schema.fields))
        if name not in field:
            raise KeyError(f"delete key references unknown index {name!r}")
        value, dt = ast.get("value"), field[name].dataType
        ok = True
        if isinstance(dt, T.StringType):
            ok = isinstance(value, str)
        elif isinstance(dt, _INT_TYPES):
            ok = (isinstance(value, int) and not isinstance(value, bool)) or (
                isinstance(value, float) and value == int(value)
            )
        elif isinstance(dt, _FLOAT_TYPES):
            # ints are exact float values — mirror the integral-float
            # allowance on int columns, so delete({volume: 1}) works
            ok = isinstance(value, float) or (
                isinstance(value, int) and not isinstance(value, bool)
            )
        elif isinstance(dt, T.BooleanType):
            ok = isinstance(value, bool)
        if not ok:
            raise TypeError(
                f"delete key [{name}] type error: {type(value).__name__} "
                f"does not match declared type {dt.simpleString()}"
            )
        return
    for child in ast.get("expressions", []):
        validate_delete_key(df, child)


# ---------------------------------------------------------------------------
# payload-side evaluation (the block-index filtered-search path)


def compile_filter_mask(schema, ast: dict[str, Any]):
    """Compile a filter AST into a vectorized boolean-mask function
    over an Arrow table — the payload-side twin of
    :func:`compile_filter`, with the SAME coercion matrix and the same
    null semantics (a comparison against NULL never matches, exactly
    like Spark's three-valued logic dropping NULL rows in a filter).

    Used by the block-index filtered search: the packed payload
    already carries every metadata column next to the vectors, so the
    filter is evaluated block-locally as a numpy mask right before the
    distance kernel — the reference's filtered search likewise scans
    its packed store restricted to bitmap candidates
    (``edge/none_vectorstore.go:182-253``) instead of abandoning the
    fast layout.

    ``schema`` is the Spark ``StructType`` of the payload columns
    (declared types drive coercion, matching the row path). Returns
    ``fn(table: pa.Table) -> np.ndarray[bool]``. Raises ``KeyError``
    at compile time for a column the payload does not carry.
    """
    import numpy as np
    import pandas as pd

    types = {f.name: f.dataType for f in schema.fields}

    def leaf(name: str, op: str, value: Any):
        if name not in types:
            raise KeyError(f"filter references unknown column {name!r}")
        if op not in OPS:
            raise ValueError(f"unknown op {op!r}; expected one of {OPS}")
        dt = types[name]

        def ev(table) -> np.ndarray:
            s = table.column(name).to_pandas()
            rhs = value
            if isinstance(dt, _NUMERIC_TYPES):
                if isinstance(rhs, str):
                    try:
                        rhs = float(rhs)
                    except ValueError:
                        return np.zeros(len(s), dtype=bool)
                if isinstance(rhs, bool):
                    rhs = float(rhs)
                lhs = pd.to_numeric(s, errors="coerce").astype("float64")
                rhs = float(rhs)
            elif isinstance(dt, T.StringType):
                if isinstance(rhs, bool):
                    lhs, rhs = s, ("true" if rhs else "false")
                elif isinstance(rhs, (int, float)):
                    lhs = pd.to_numeric(s, errors="coerce").astype("float64")
                    rhs = float(rhs)
                else:
                    lhs = s
            elif isinstance(dt, T.BooleanType):
                if isinstance(rhs, str):
                    rhs = rhs.strip().lower() == "true"
                elif isinstance(rhs, (int, float)) and not isinstance(rhs, bool):
                    rhs = bool(rhs)
                lhs = s
            else:
                lhs = s
            valid = lhs.notna().to_numpy()
            # nulls are filled with a same-type placeholder so the
            # elementwise compare never throws; `& valid` then restores
            # NULL-never-matches (including for neq, where NaN != x
            # would otherwise leak True)
            if lhs.dtype == object:
                fill = "" if isinstance(rhs, str) else (False if isinstance(rhs, bool) else 0)
                lhs = lhs.where(lhs.notna(), other=fill)
            if op == "eq":
                m = lhs == rhs
            elif op == "neq":
                m = lhs != rhs
            elif op == "gt":
                m = lhs > rhs
            elif op == "gte":
                m = lhs >= rhs
            elif op == "lt":
                m = lhs < rhs
            else:
                m = lhs <= rhs
            return np.asarray(m, dtype=bool) & valid

        return ev

    def build(node: dict[str, Any]):
        if "index_name" in node:
            return leaf(node["index_name"], str(node["op"]).lower(), node["value"])
        op = str(node.get("op", "")).lower()
        exprs = node.get("expressions", [])
        if op not in ("and", "or") or not exprs:
            raise ValueError(f"bad composite node: {node!r}")
        kids = [build(c) for c in exprs]

        def ev(table) -> np.ndarray:
            out = kids[0](table)
            for k in kids[1:]:
                nxt = k(table)
                out = (out & nxt) if op == "and" else (out | nxt)
            return out

        return ev

    return build(ast)
