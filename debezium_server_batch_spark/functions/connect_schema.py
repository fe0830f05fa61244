"""Kafka-Connect JSON schema → Spark StructType compiler (SURVEY.md P4).

Behavior parity with the reference's recursive type switch
(`DebeziumSparkEvent.getSparkDfSchema`, DebeziumSparkEvent.java:31-97):

  int8/int16/int32 → IntegerType        int64 → LongType
  float8/16/32     → FloatType          float64 → DoubleType
  boolean          → BooleanType        string → StringType
  bytes            → BinaryType         struct → recursive StructType
  anything else    → StringType (fallback)

Deliberate improvements over the reference (documented divergence):
  * array — the reference loses the element type (`new ArrayType()`,
    :77-78); we derive it from the Connect ``items`` node.
  * map — the reference loses key/value types (`new MapType()`, :80-81);
    we derive them from ``keys``/``values`` nodes.
Connect logical-type *names* (io.debezium.time.Date etc.) are ignored —
only ``type`` is switched on, exactly like the reference (:48-51) — so
DATE stays int32 days-since-epoch, INTERVAL stays int64 micros, etc.
(type-fidelity matrix, SURVEY.md §1.4 / FIXTURES.md F4).
"""

from __future__ import annotations

import hashlib
import json
from typing import Any

from pyspark.sql import types as T

_PRIMITIVES: dict[str, T.DataType] = {
    "int8": T.IntegerType(),
    "int16": T.IntegerType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "float8": T.FloatType(),
    "float16": T.FloatType(),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
}


def connect_type_to_spark(node: dict[str, Any] | None) -> T.DataType:
    """Compile one Connect schema node to a Spark DataType."""
    if node is None:
        return T.StringType()
    ctype = node.get("type")
    if ctype == "struct":
        return _struct_of(node)
    if ctype == "array":
        return T.ArrayType(connect_type_to_spark(node.get("items")), True)
    if ctype == "map":
        key_t = connect_type_to_spark(node.get("keys"))
        val_t = connect_type_to_spark(node.get("values"))
        return T.MapType(key_t, val_t, True)
    return _PRIMITIVES.get(ctype, T.StringType())


def _struct_of(node: dict[str, Any]) -> T.StructType:
    fields = []
    for f in node.get("fields") or []:
        name = f.get("field")
        if name is None:
            continue
        nullable = bool(f.get("optional", True))
        fields.append(T.StructField(name, connect_type_to_spark(f), nullable))
    return T.StructType(fields)


def compile_connect_schema(schema_json: str | dict | None) -> T.StructType | None:
    """Compile a Connect value-schema document (the ``schema`` half of a
    ``{"schema":..., "payload":...}`` envelope) to a row StructType.

    Returns None for a null/absent schema — caller falls back to Spark
    JSON inference (reference: BatchSparkChangeConsumer.java:93-96).
    """
    if schema_json is None:
        return None
    node = json.loads(schema_json) if isinstance(schema_json, str) else schema_json
    if node is None:
        return None
    st = connect_type_to_spark(node)
    if not isinstance(st, T.StructType):
        raise ValueError(f"top-level Connect schema must be a struct, got {node.get('type')!r}")
    return st


def schema_fingerprint(schema_json: str | None) -> str:
    """Stable fingerprint of a schema document, for per-batch schema
    grouping (reference groups by exact JsonNode equality,
    AbstractChangeConsumer.java:124-131). Hash of the raw text is
    equivalent because one producer emits byte-stable schema JSON."""
    if schema_json is None:
        return "__no_schema__"
    return hashlib.sha256(schema_json.encode("utf-8")).hexdigest()


# ---------------------------------------------------------------------------
# Reverse direction: Spark StructType → Connect schema JSON. Used by the
# deterministic synthetic event-log generator (sources/synth.py) to emit
# per-event schema documents shaped like Debezium's.
# ---------------------------------------------------------------------------

_TO_CONNECT: list[tuple[type, str]] = [
    (T.IntegerType, "int32"),
    (T.ShortType, "int16"),
    (T.ByteType, "int8"),
    (T.LongType, "int64"),
    (T.FloatType, "float32"),
    (T.DoubleType, "float64"),
    (T.BooleanType, "boolean"),
    (T.StringType, "string"),
    (T.BinaryType, "bytes"),
]


def spark_type_to_connect(dt: T.DataType) -> dict[str, Any]:
    if isinstance(dt, T.StructType):
        return {
            "type": "struct",
            "fields": [
                {**spark_type_to_connect(f.dataType), "field": f.name, "optional": f.nullable}
                for f in dt.fields
            ],
        }
    if isinstance(dt, T.ArrayType):
        return {"type": "array", "items": spark_type_to_connect(dt.elementType)}
    if isinstance(dt, T.MapType):
        return {
            "type": "map",
            "keys": spark_type_to_connect(dt.keyType),
            "values": spark_type_to_connect(dt.valueType),
        }
    for py_t, name in _TO_CONNECT:
        if isinstance(dt, py_t):
            return {"type": name}
    return {"type": "string"}


def struct_to_connect_schema_json(st: T.StructType, name: str = "Value") -> str:
    doc = spark_type_to_connect(st)
    doc["optional"] = False
    doc["name"] = name
    return json.dumps(doc, separators=(",", ":"), sort_keys=False)
