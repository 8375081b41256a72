"""Field-spec schema DSL → Spark ``StructType``.

The reference declares BigQuery table schemas as data — a list of
field maps validated by clojure.spec (/root/reference/src/clj/
datasplash/bq.clj:357-436) and built into a ``TableSchema``
(bq.clj:145-204). This module keeps that declarative surface and
targets Spark types instead (the SURVEY §1.5 mapping): REPEATED →
``ArrayType``, RECORD/STRUCT → nested ``StructType``, NUMERIC /
BIGNUMERIC → ``DecimalType``.

Field spec: ``{"name": ..., "type": ..., "mode": "nullable" |
"required" | "repeated", "description": ..., "fields": [...]
(records), "maxLength": ..., "precision"/"scale" (numerics),
"rangeElementType" (ranges)}``. Names/types accept the reference's
keyword style (``":string"``) or plain strings, case-insensitive.

Name cleaning matches ``clean-name`` (bq.clj:93-100): ``-`` → ``_``,
``?`` stripped, keyword colons dropped.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T

#: BQ type → Spark type factory. TIME/GEOGRAPHY/JSON have no Spark
#: scalar type — carried as strings (documented approximation);
#: BIGNUMERIC (76,38) exceeds Spark's 38-digit decimals → (38,18).
_SIMPLE_TYPES: dict[str, Any] = {
    "STRING": T.StringType,
    "BYTES": T.BinaryType,
    "INTEGER": T.LongType,
    "INT64": T.LongType,
    "FLOAT": T.DoubleType,
    "FLOAT64": T.DoubleType,
    "BOOLEAN": T.BooleanType,
    "BOOL": T.BooleanType,
    "TIMESTAMP": T.TimestampType,
    "DATE": T.DateType,
    "TIME": T.StringType,
    "DATETIME": T.TimestampNTZType,
    "GEOGRAPHY": T.StringType,
    "JSON": T.StringType,
}

_MODES = {"NULLABLE", "REQUIRED", "REPEATED"}


class SchemaError(ValueError):
    pass


def clean_name(name: Any) -> str:
    """``clean-name`` (bq.clj:93-100): numbers/keywords stringified,
    ``-`` → ``_``, ``?`` removed."""
    s = str(name)
    if s.startswith(":"):
        s = s[1:]
    return s.replace("-", "_").replace("?", "")


def _norm(token: Any) -> str:
    s = str(token)
    if s.startswith(":"):
        s = s[1:]
    return s.upper()


def _check_scale(spec: dict, precision: int, scale: int) -> int:
    """Spark rejects DecimalType(p, s) with s > p only later, at use
    time, with an obscure error — fail fast here instead."""
    if scale > precision:
        raise SchemaError(
            f"field {spec.get('name')!r}: scale {scale} > precision {precision}"
        )
    return scale


def _field_type(spec: dict) -> T.DataType:
    t = _norm(spec.get("type", ""))
    if not t:
        raise SchemaError(f"field {spec.get('name')!r} has no type")
    if t in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[t]()
    if t == "NUMERIC":
        # BQ NUMERIC is (38, 9); explicit precision/scale override
        p = int(spec.get("precision", 38))
        s = int(spec.get("scale", 9))
        return T.DecimalType(p, _check_scale(spec, p, s))
    if t == "BIGNUMERIC":
        p = min(int(spec.get("precision", 38)), 38)
        s = min(int(spec.get("scale", 18)), 37)
        return T.DecimalType(p, _check_scale(spec, p, s))
    if t in ("RECORD", "STRUCT"):
        nested = spec.get("fields")
        if not nested:
            raise SchemaError(f"record field {spec.get('name')!r} needs 'fields'")
        return to_struct_type(nested)
    if t == "RANGE":
        elem = _norm(spec.get("rangeElementType", ""))
        if elem not in ("DATE", "DATETIME", "TIMESTAMP"):
            raise SchemaError(
                f"range field {spec.get('name')!r} needs rangeElementType "
                "of date/datetime/timestamp"
            )
        inner = _SIMPLE_TYPES[elem]() if elem != "DATETIME" else T.TimestampNTZType()
        return T.StructType(
            [T.StructField("start", inner, True), T.StructField("end", inner, True)]
        )
    raise SchemaError(f"unknown field type {spec.get('type')!r}")


def to_struct_field(spec: dict) -> T.StructField:
    name = clean_name(spec.get("name", ""))
    if not name:
        raise SchemaError("field needs a non-empty name")
    mode = _norm(spec.get("mode", "nullable")) or "NULLABLE"
    if mode not in _MODES:
        raise SchemaError(f"field {name!r}: unknown mode {spec.get('mode')!r}")
    dtype = _field_type(spec)
    metadata = {}
    desc = spec.get("description")
    if desc:
        metadata["description"] = str(desc)[:1024]  # BQ's 1024-char cap
    if spec.get("maxLength") is not None and _norm(spec["type"]) in ("STRING", "BYTES"):
        metadata["maxLength"] = int(spec["maxLength"])
    if spec.get("collation") and _norm(spec["type"]) == "STRING":
        metadata["collation"] = spec["collation"]
    if mode == "REPEATED":
        # BQ REPEATED implies non-null elements inside a nullable array
        return T.StructField(
            name, T.ArrayType(dtype, containsNull=False), True, metadata=metadata
        )
    return T.StructField(name, dtype, nullable=(mode != "REQUIRED"), metadata=metadata)


def to_struct_type(specs: list[dict]) -> T.StructType:
    """``->schema`` analog (bq.clj:197-204): field-spec list →
    ``StructType``. Idempotent on an existing StructType."""
    if isinstance(specs, T.StructType):
        return specs
    if not specs:
        raise SchemaError("schema needs at least one field")
    return T.StructType([to_struct_field(s) for s in specs])


def bqize_keys(value):
    """``bqize-keys`` (bq.clj:102-112): recursively clean all dict
    keys to BQ-valid names (for row payloads headed at a BQ sink)."""
    if isinstance(value, dict):
        return {clean_name(k): bqize_keys(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [bqize_keys(v) for v in value]
    if isinstance(value, (set, frozenset)):
        return [bqize_keys(v) for v in sorted(value, key=repr)]
    return value
