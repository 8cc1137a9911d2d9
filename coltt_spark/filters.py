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
            # try_cast, not cast: under ANSI a non-numeric string must
            # become NULL (fails every comparison — the bitmap-index
            # "no coercible value" outcome), never a query error
            return col.try_cast("double"), F.lit(float(value))
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
        # three-valued: NULL IN (…) is NULL, so NOT drops it too —
        # identical to SQL NOT IN and to the ``neq`` null behavior
        return out if op == "in" else ~out
    if op == "between":
        if not isinstance(value, (list, tuple)) or len(value) != 2:
            raise ValueError(f"between requires [lo, hi], got {value!r}")
        llo, rlo = _coerce(F.col(name), dt, value[0])
        lhi, rhi = _coerce(F.col(name), dt, value[1])
        return (llo >= rlo) & (lhi <= rhi)
    if op == "like":
        if not isinstance(value, str):
            raise ValueError(f"like requires a string pattern, got {value!r}")
        if not isinstance(dt, T.StringType):
            # restricting like to string columns keeps the row path and
            # the block-payload mask path bit-identical (pandas and
            # Spark stringify booleans/floats differently)
            raise ValueError(f"like requires a string column, {name!r} is {dt}")
        return F.col(name).like(value)
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
    null semantics. Internally every node evaluates to a Kleene pair
    (true_mask, null_mask) so that ``not`` composites and ``not_in``
    propagate NULL exactly like Spark/SQL three-valued logic (a NULL
    comparison is unknown, and NOT unknown is still unknown — the row
    is dropped either way); the final result keeps only definitely
    true rows.

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
    import re as _re

    import numpy as np
    import pandas as pd

    types = {f.name: f.dataType for f in schema.fields}

    def coerced(name: str, rhs: Any):
        """(lhs Series, rhs literal, valid ndarray) after the shared
        coercion matrix; ``valid`` is False where the coerced lhs is
        NULL (incl. uncoercible strings). A None lhs means the
        literal itself was uncoercible → nothing matches."""
        dt = types[name]

        def ev(table):
            s = table.column(name).to_pandas()
            r = rhs
            if isinstance(dt, _NUMERIC_TYPES):
                if isinstance(r, str):
                    try:
                        r = float(r)
                    except ValueError:
                        return None, None, np.zeros(len(s), dtype=bool)
                if isinstance(r, bool):
                    r = float(r)
                lhs = pd.to_numeric(s, errors="coerce").astype("float64")
                r = float(r)
            elif isinstance(dt, T.StringType):
                if isinstance(r, bool):
                    lhs, r = s, ("true" if r else "false")
                elif isinstance(r, (int, float)):
                    lhs = pd.to_numeric(s, errors="coerce").astype("float64")
                    r = float(r)
                else:
                    lhs = s
            elif isinstance(dt, T.BooleanType):
                if isinstance(r, str):
                    r = r.strip().lower() == "true"
                elif isinstance(r, (int, float)) and not isinstance(r, bool):
                    r = bool(r)
                lhs = s
            else:
                lhs = s
            valid = lhs.notna().to_numpy()
            if lhs.dtype == object:
                fill = "" if isinstance(r, str) else (False if isinstance(r, bool) else 0)
                lhs = lhs.where(lhs.notna(), other=fill)
            return lhs, r, valid
        return ev

    def cmp_leaf(name: str, op: str, value: Any):
        """One comparison → Kleene (true, null) masks."""
        ev = coerced(name, value)

        def run(table):
            lhs, r, valid = ev(table)
            if lhs is None:
                # uncoercible literal: the row path compares against a
                # NULL literal, so the whole comparison is NULL for
                # every row (matches nothing, and stays unknown under
                # NOT) — mirror that exactly
                n = len(valid)
                return np.zeros(n, dtype=bool), np.ones(n, dtype=bool)
            if op == "eq":
                m = lhs == r
            elif op == "neq":
                m = lhs != r
            elif op == "gt":
                m = lhs > r
            elif op == "gte":
                m = lhs >= r
            elif op == "lt":
                m = lhs < r
            else:
                m = lhs <= r
            return np.asarray(m, dtype=bool) & valid, ~valid
        return run

    def k_and(a, b):
        def run(table):
            ta, na = a(table)
            tb, nb = b(table)
            t = ta & tb
            n = (na | nb) & ~((~ta & ~na) | (~tb & ~nb))  # false dominates
            return t, n
        return run

    def k_or(a, b):
        def run(table):
            ta, na = a(table)
            tb, nb = b(table)
            t = ta | tb
            n = (na | nb) & ~t  # true dominates
            return t, n
        return run

    def k_not(a):
        def run(table):
            ta, na = a(table)
            return ~ta & ~na, na
        return run

    def leaf(name: str, op: str, value: Any):
        if name not in types:
            raise KeyError(f"filter references unknown column {name!r}")
        if op not in OPS:
            raise ValueError(f"unknown op {op!r}; expected one of {OPS}")
        if op in ("in", "not_in"):
            if not isinstance(value, (list, tuple)) or not value:
                raise ValueError(f"{op} requires a non-empty list value, got {value!r}")
            node = cmp_leaf(name, "eq", value[0])
            for v in value[1:]:
                node = k_or(node, cmp_leaf(name, "eq", v))
            return k_not(node) if op == "not_in" else node
        if op == "between":
            if not isinstance(value, (list, tuple)) or len(value) != 2:
                raise ValueError(f"between requires [lo, hi], got {value!r}")
            return k_and(cmp_leaf(name, "gte", value[0]), cmp_leaf(name, "lte", value[1]))
        if op == "like":
            if not isinstance(value, str):
                raise ValueError(f"like requires a string pattern, got {value!r}")
            if not isinstance(types[name], T.StringType):
                raise ValueError(
                    f"like requires a string column, {name!r} is {types[name]}"
                )
            # SQL LIKE → anchored regex (% → .*, _ → .), same as Spark
            rx = "".join(
                ".*" if c == "%" else "." if c == "_" else _re.escape(c) for c in value
            )
            # \Z, not $: '$' would match before a trailing newline,
            # which Spark LIKE does not
            pat = _re.compile(f"(?s)^{rx}\\Z")

            def run(table):
                s = table.column(name).to_pandas()
                valid = s.notna().to_numpy()
                m = (
                    s.where(s.notna(), other="")
                    .astype(str)
                    .map(lambda x: bool(pat.match(x)))
                    .to_numpy(dtype=bool)
                )
                return m & valid, ~valid
            return run
        return cmp_leaf(name, op, value)

    def build(node: dict[str, Any]):
        if "index_name" in node:
            return leaf(node["index_name"], str(node["op"]).lower(), node["value"])
        op = str(node.get("op", "")).lower()
        exprs = node.get("expressions", [])
        if op == "not":
            if len(exprs) != 1:
                raise ValueError(f"not takes exactly one expression: {node!r}")
            return k_not(build(exprs[0]))
        if op not in ("and", "or") or not exprs:
            raise ValueError(f"bad composite node: {node!r}")
        out = build(exprs[0])
        for child in exprs[1:]:
            out = (k_and if op == "and" else k_or)(out, build(child))
        return out

    kleene = build(ast)

    def final(table):
        t, _ = kleene(table)
        return t

    return final
