"""Field-spec DSL → StructType — mirrors the reference's BQ schema
tests (/root/reference/test/datasplash/bq_test.clj:11-296)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from datasplash_spark.schema import (
    SchemaError,
    bqize_keys,
    clean_name,
    to_struct_type,
)


def test_simple_types_and_modes():
    st = to_struct_type(
        [
            {"name": "id", "type": "integer", "mode": "required"},
            {"name": "score", "type": ":float64"},
            {"name": "ok?", "type": "bool"},
            {"name": "created-at", "type": "timestamp"},
            {"name": "day", "type": "date"},
            {"name": "tags", "type": "string", "mode": "repeated"},
        ]
    )
    assert st["id"].dataType == T.LongType() and not st["id"].nullable
    assert st["score"].dataType == T.DoubleType() and st["score"].nullable
    # name cleaning: '?' stripped, '-' → '_' (bq.clj:93-100)
    assert "ok" in st.fieldNames() and "created_at" in st.fieldNames()
    assert st["tags"].dataType == T.ArrayType(T.StringType(), containsNull=False)


def test_nested_record_recurses():
    st = to_struct_type(
        [
            {
                "name": "user",
                "type": "record",
                "fields": [
                    {"name": "name", "type": "string", "mode": "required"},
                    {
                        "name": "addresses",
                        "type": "struct",
                        "mode": "repeated",
                        "fields": [{"name": "city", "type": "string"}],
                    },
                ],
            }
        ]
    )
    user = st["user"].dataType
    assert isinstance(user, T.StructType)
    addrs = user["addresses"].dataType
    assert isinstance(addrs, T.ArrayType)
    assert isinstance(addrs.elementType, T.StructType)
    assert addrs.elementType["city"].dataType == T.StringType()


def test_numerics_and_range():
    st = to_struct_type(
        [
            {"name": "amount", "type": "numeric"},
            {"name": "precise", "type": "numeric", "precision": 20, "scale": 4},
            {"name": "big", "type": "bignumeric"},
            {"name": "window", "type": "range", "rangeElementType": "date"},
        ]
    )
    assert st["amount"].dataType == T.DecimalType(38, 9)
    assert st["precise"].dataType == T.DecimalType(20, 4)
    assert st["big"].dataType == T.DecimalType(38, 18)
    w = st["window"].dataType
    assert isinstance(w, T.StructType) and w["start"].dataType == T.DateType()


def test_metadata_carried():
    st = to_struct_type(
        [
            {
                "name": "s",
                "type": "string",
                "description": "d" * 2000,
                "maxLength": 10,
                "collation": "und:ci",
            }
        ]
    )
    md = st["s"].metadata
    assert len(md["description"]) == 1024  # BQ cap (bq.clj:163-166)
    assert md["maxLength"] == 10 and md["collation"] == "und:ci"


def test_errors():
    with pytest.raises(SchemaError, match="no type"):
        to_struct_type([{"name": "x"}])
    with pytest.raises(SchemaError, match="unknown field type"):
        to_struct_type([{"name": "x", "type": "uuid"}])
    with pytest.raises(SchemaError, match="needs 'fields'"):
        to_struct_type([{"name": "x", "type": "record"}])
    with pytest.raises(SchemaError, match="unknown mode"):
        to_struct_type([{"name": "x", "type": "string", "mode": "sometimes"}])
    with pytest.raises(SchemaError, match="rangeElementType"):
        to_struct_type([{"name": "x", "type": "range"}])
    with pytest.raises(SchemaError, match="at least one"):
        to_struct_type([])


def test_idempotent_on_struct_type():
    st = T.StructType([T.StructField("a", T.StringType())])
    assert to_struct_type(st) is st


def test_bqize_keys_recursive():
    assert bqize_keys({"a-b": {"c?": [{"d-e?": 1}]}}) == {"a_b": {"c": [{"d_e": 1}]}}


def test_usable_with_spark(spark):
    st = to_struct_type(
        [
            {"name": "id", "type": "int64", "mode": "required"},
            {"name": "tags", "type": "string", "mode": "repeated"},
        ]
    )
    df = spark.createDataFrame([(1, ["a", "b"])], st)
    assert df.schema == st and df.count() == 1


def test_clean_name_variants():
    assert clean_name(":my-field?") == "my_field"
    assert clean_name(42) == "42"


def test_decimal_scale_exceeding_precision_rejected():
    import pytest

    from datasplash_spark.schema import SchemaError, to_struct_type

    for typ in ("NUMERIC", "BIGNUMERIC"):
        with pytest.raises(SchemaError, match="scale"):
            to_struct_type(
                [{"name": "x", "type": typ, "precision": 10, "scale": 20}]
            )
