"""Schema-compiler unit tests — mirrors the reference's BatchUtilTest
(flat + nested envelope assertions on catalogString) plus our array/map
element-type improvements. No Spark session needed."""

import json

from pyspark.sql import types as T

from debezium_server_batch_spark.functions.connect_schema import (
    compile_connect_schema,
    schema_fingerprint,
    spark_type_to_connect,
    struct_to_connect_schema_json,
)

FLAT = {
    "type": "struct",
    "fields": [
        {"type": "int32", "field": "id", "optional": False},
        {"type": "int32", "field": "order_date", "optional": False, "name": "io.debezium.time.Date"},
        {"type": "int32", "field": "purchaser", "optional": False},
        {"type": "int32", "field": "quantity", "optional": False},
        {"type": "int32", "field": "product_id", "optional": False},
        {"type": "string", "field": "__op", "optional": True},
    ],
    "optional": False,
}

NESTED = {
    "type": "struct",
    "fields": [
        {
            "type": "struct",
            "field": "before",
            "optional": True,
            "fields": [{"type": "int32", "field": "id", "optional": False}],
        },
        {
            "type": "struct",
            "field": "after",
            "optional": True,
            "fields": [{"type": "int32", "field": "id", "optional": False}],
        },
        {"type": "string", "field": "op", "optional": False},
    ],
    "optional": False,
}


def test_flat_schema_matches_reference_catalog_string():
    # reference asserts: id:int,order_date:int,...,__op:string (BatchUtilTest.java:49)
    st = compile_connect_schema(json.dumps(FLAT))
    cat = st.simpleString()
    assert "id:int" in cat and "order_date:int" in cat and "__op:string" in cat


def test_nested_envelope_recursion():
    # reference asserts before:struct<id / after:struct<id (BatchUtilTest.java:56-57)
    st = compile_connect_schema(json.dumps(NESTED))
    cat = st.simpleString()
    assert "before:struct<id:int" in cat and "after:struct<id:int" in cat


def test_primitive_mapping_matrix():
    fields = [
        ("int8", T.IntegerType()),
        ("int16", T.IntegerType()),
        ("int32", T.IntegerType()),
        ("int64", T.LongType()),
        ("float32", T.FloatType()),
        ("float64", T.DoubleType()),
        ("boolean", T.BooleanType()),
        ("string", T.StringType()),
        ("bytes", T.BinaryType()),
        ("weird_unknown_type", T.StringType()),  # fallback branch
    ]
    doc = {
        "type": "struct",
        "fields": [{"type": t, "field": f"c_{i}", "optional": True} for i, (t, _) in enumerate(fields)],
    }
    st = compile_connect_schema(doc)
    for i, (_, expected) in enumerate(fields):
        assert st[f"c_{i}"].dataType == expected


def test_array_and_map_element_types_preserved():
    # deliberate improvement over the reference (element types lost there)
    doc = {
        "type": "struct",
        "fields": [
            {"type": "array", "field": "a", "items": {"type": "int64"}, "optional": True},
            {
                "type": "map",
                "field": "m",
                "keys": {"type": "string"},
                "values": {"type": "float64"},
                "optional": True,
            },
        ],
    }
    st = compile_connect_schema(doc)
    assert st["a"].dataType == T.ArrayType(T.LongType(), True)
    assert st["m"].dataType == T.MapType(T.StringType(), T.DoubleType(), True)


def test_roundtrip_struct_to_connect_and_back():
    st = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("n", T.LongType(), True),
            T.StructField("b", T.BinaryType(), True),
            T.StructField("nested", T.StructType([T.StructField("x", T.IntegerType(), True)]), True),
        ]
    )
    back = compile_connect_schema(struct_to_connect_schema_json(st))
    assert [f.name for f in back.fields] == [f.name for f in st.fields]
    assert back["nested"].dataType == st["nested"].dataType


def test_fingerprint_stability_and_null():
    s = json.dumps(FLAT)
    assert schema_fingerprint(s) == schema_fingerprint(s)
    assert schema_fingerprint(s) != schema_fingerprint(json.dumps(NESTED))
    assert schema_fingerprint(None) == "__no_schema__"


def test_null_schema_returns_none():
    assert compile_connect_schema(None) is None
    assert compile_connect_schema("null") is None
