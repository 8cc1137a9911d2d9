"""Collection schema: index design + ingest validation.

Reference parity: a collection carries ``dim``, ``distance``,
``quantization`` and a typed index design (column schema) —
``idl/proto/v4/edge.proto:29-56``, ``edge/edge_metadata.go:22-28``.
Column types are String/Integer/Float/Boolean (+ Vector for the
experimental multi-vector engine), each with ``enable_null`` (null →
type default ""/0/0.0/false, ``edge/edge_analyzer.go:86-99``) and
``primary_key`` (must be a non-null string,
``edge/edge_analyzer.go:46-52``). Every write is validated by a
``standardAnalyzer`` (``edge/edge_analyzer.go:28-85``) that coerces
JSON numbers back to int64 for Integer columns.

Spark mapping: the index design builds a ``StructType`` with proper
nullability; validation happens at ingest so the stored Parquet is
always clean and Catalyst can trust the schema.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import types as T

FIELD_TYPES = ("string", "integer", "float", "boolean", "vector")

SPARK_TYPES = _SPARK_TYPE = {
    "string": T.StringType(),
    "integer": T.LongType(),
    "float": T.DoubleType(),
    "boolean": T.BooleanType(),
    "vector": T.ArrayType(T.FloatType()),
}

_NULL_DEFAULT = {"string": "", "integer": 0, "float": 0.0, "boolean": False}


@dataclass(frozen=True)
class IndexField:
    """One column of a collection's index design."""

    name: str
    type: str
    enable_null: bool = False
    primary_key: bool = False

    def __post_init__(self) -> None:
        if self.type not in FIELD_TYPES:
            raise ValueError(f"field {self.name!r}: unknown type {self.type!r}")
        if self.primary_key and self.type != "string":
            # edge/edge_analyzer.go:46-52 — PK must be string
            raise ValueError(f"primary key {self.name!r} must be a string field")
        if self.primary_key and self.enable_null:
            raise ValueError(f"primary key {self.name!r} cannot be nullable")


@dataclass
class IndexDesign:
    fields: list[IndexField] = field(default_factory=list)

    def __post_init__(self) -> None:
        pks = [f for f in self.fields if f.primary_key]
        if len(pks) != 1:
            raise ValueError(f"exactly one primary key required, got {len(pks)}")
        names = [f.name for f in self.fields]
        if len(set(names)) != len(names):
            raise ValueError("duplicate field names in index design")
        reserved = {"dist", "score", "_commit_id"} & set(names)
        if reserved:
            # search() synthesizes dist/score and the store owns
            # _commit_id; a metadata field by the same name would be
            # silently shadowed in results
            raise ValueError(f"reserved field names: {sorted(reserved)}")

    @property
    def primary_key(self) -> str:
        return next(f.name for f in self.fields if f.primary_key)

    def metadata_struct(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField(f.name, _SPARK_TYPE[f.type], nullable=False)
                for f in self.fields
            ]
        )

    def to_json(self) -> list[dict[str, Any]]:
        return [
            {
                "name": f.name,
                "type": f.type,
                "enable_null": f.enable_null,
                "primary_key": f.primary_key,
            }
            for f in self.fields
        ]

    @classmethod
    def from_json(cls, data: list[dict[str, Any]]) -> IndexDesign:
        return cls([IndexField(**f) for f in data])


def validate_metadata(design: IndexDesign, metadata: dict[str, Any]) -> dict[str, Any]:
    """standardAnalyzer-equivalent: returns cleaned metadata or raises.

    - unknown keys rejected;
    - missing/None on ``enable_null`` fields → type default;
    - missing/None on non-nullable fields → error;
    - JSON-ish values coerced per the reference matrix (number→int64
      for Integer when integral, int accepted for Float, strict
      string/bool).
    """
    known = {f.name for f in design.fields}
    unknown = set(metadata) - known
    if unknown:
        raise ValueError(f"unknown metadata keys: {sorted(unknown)}")
    out: dict[str, Any] = {}
    for f in design.fields:
        if f.type == "vector":
            continue  # vectors are validated separately against dim
        v = metadata.get(f.name)
        if v is None:
            if f.primary_key:
                raise ValueError(f"primary key {f.name!r} is required")
            if not f.enable_null:
                raise ValueError(f"field {f.name!r} is not nullable")
            out[f.name] = _NULL_DEFAULT[f.type]
            continue
        if f.type == "string":
            if not isinstance(v, str):
                raise TypeError(f"field {f.name!r}: expected string, got {type(v).__name__}")
            out[f.name] = v
        elif f.type == "integer":
            if isinstance(v, bool) or not isinstance(v, (int, float)):
                raise TypeError(f"field {f.name!r}: expected integer, got {type(v).__name__}")
            if isinstance(v, float) and not v.is_integer():
                raise TypeError(f"field {f.name!r}: non-integral number {v!r}")
            out[f.name] = int(v)
        elif f.type == "float":
            if isinstance(v, bool) or not isinstance(v, (int, float)):
                raise TypeError(f"field {f.name!r}: expected number, got {type(v).__name__}")
            out[f.name] = float(v)
        elif f.type == "boolean":
            if not isinstance(v, bool):
                raise TypeError(f"field {f.name!r}: expected boolean, got {type(v).__name__}")
            out[f.name] = v
    return out


def validate_vector(dim: int, vector: Any) -> list[float]:
    """Dim + element check (``edge/none_vectorstore.go:86-88``)."""
    if vector is None:
        raise ValueError("vector is required")
    vec = [float(x) for x in vector]
    if len(vec) != dim:
        raise ValueError(f"vector dim {len(vec)} != collection dim {dim}")
    if any(math.isnan(x) or math.isinf(x) for x in vec):
        raise ValueError("vector contains NaN/Inf")
    return vec
