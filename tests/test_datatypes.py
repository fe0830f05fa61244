"""Type-fidelity matrix (FIXTURES.md F4 / reference
BatchSparkChangeConsumerTest.java:58-129): a 16-type envelope parses with
the reference's flattening semantics — decimal-as-double, date as int32
days, timestamp as int64 micros, interval as int64 micros, uuid/json as
string, bytea as bytes — plus null propagation for every column."""

import base64
import json

import pytest
from pyspark.sql import types as T

from debezium_server_batch_spark.operators.envelope import parse_envelope_batch

FIELDS = [
    ("c_id", "int32", 1, T.IntegerType()),
    ("c_text", "string", "hello", T.StringType()),
    ("c_varchar", "string", "varchar", T.StringType()),
    ("c_int", "int32", 123, T.IntegerType()),
    ("c_date", "int32", 19723, T.IntegerType()),  # days since epoch
    ("c_timestamp", "int64", 1704067200000000, T.LongType()),  # micros
    ("c_timestamptz", "string", "2024-01-01T00:00:00Z", T.StringType()),
    ("c_float", "float64", 1.23, T.DoubleType()),
    ("c_decimal", "float64", 1234566.3446, T.DoubleType()),  # decimal.handling.mode=double
    ("c_numeric", "float64", 345.452, T.DoubleType()),
    ("c_interval", "int64", 86400000000, T.LongType()),  # 1 day in micros
    ("c_boolean", "boolean", True, T.BooleanType()),
    ("c_uuid", "string", "3f2504e0-4f89-11d3-9a0c-0305e82c3301", T.StringType()),
    ("c_bytea", "bytes", base64.b64encode(b"aBC").decode(), T.BinaryType()),
    ("c_json", "string", '{"k": 1}', T.StringType()),
    ("c_jsonb", "string", '{"j": true}', T.StringType()),
]

SCHEMA = {
    "type": "struct",
    "fields": [{"type": t, "field": n, "optional": True} for n, t, _, _ in FIELDS],
}


@pytest.fixture(scope="module")
def parsed(spark):
    populated = {n: v for n, _, v, _ in FIELDS}
    nulls = {n: None for n, _, _, _ in FIELDS}
    rows = [
        (0, "t.db.types", None, json.dumps({"schema": SCHEMA, "payload": populated})),
        (1, "t.db.types", None, json.dumps({"schema": SCHEMA, "payload": nulls})),
    ]
    df = spark.createDataFrame(rows, "offset long, destination string, key string, value string")
    groups = parse_envelope_batch(df)
    assert len(groups) == 1
    return groups[0]


def test_spark_types_match_reference_mapping(parsed):
    got = {f.name: f.dataType for f in parsed.struct.fields}
    for name, _, _, expected in FIELDS:
        assert got[name] == expected, name


def test_values_roundtrip(parsed):
    row = {r["offset"]: r for r in parsed.df.collect()}[0]
    assert row["c_bytea"] == b"aBC"  # base64 in JSON → binary
    assert row["c_interval"] == 86400000000
    assert row["c_date"] == 19723
    assert row["c_timestamp"] == 1704067200000000
    assert row["c_float"] == pytest.approx(1.23)
    assert row["c_decimal"] == pytest.approx(1234566.3446)
    assert row["c_boolean"] is True
    assert row["c_json"] == '{"k": 1}'
    assert row["c_uuid"].startswith("3f2504e0")


def test_null_propagation_per_column(parsed):
    row = {r["offset"]: r for r in parsed.df.collect()}[1]
    for name, _, _, _ in FIELDS:
        assert row[name] is None, name
