"""Additive schema evolution against a field-ID registry.

Iceberg-style rules (public Iceberg spec semantics, re-implemented):

- every field has a stable integer ID assigned at first sight; names map to
  IDs, never the reverse
- new fields are APPENDED with fresh IDs; old data files simply lack the
  column and read as NULL (``spark.read.schema`` backfills)
- type changes are allowed only on the widening whitelist
  int→long, float→double (safe, lossless)
- renames/drops/narrowing are REJECTED — the reference has no analogue
  (its bronze is schemaless JSONB, ``/root/reference/sql/
  create_schemas.sql:7-13``; its silver casts are fixed), and the north
  rule mandates *additive* evolution only.

The registry is a JSON list ``[{"id": 1, "name": ..., "type": ...}]`` stored
in the table metadata (lake.table).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Keyed on Spark simpleString() names ("int"/"bigint"), which is what
# _type_name produces and what the registry stores. Symmetric lookup in
# reconcile() means an incoming NARROWER batch (int into a bigint field)
# also resolves to the wide type — align() casts it up at write time.
_WIDEN: dict[tuple[str, str], str] = {
    ("int", "bigint"): "bigint",
    ("float", "double"): "double",
}

_ATOMIC = {
    "string": T.StringType(),
    "bigint": T.LongType(),
    "int": T.IntegerType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "binary": T.BinaryType(),
    # legacy aliases: registries written before the simpleString
    # normalization may carry these spellings
    "long": T.LongType(),
    "integer": T.IntegerType(),
}

# registries written by older versions spelled types with DataType names
_CANON = {"integer": "int", "long": "bigint"}


def _type_name(dt: T.DataType) -> str:
    return dt.simpleString()


def _parse_type(name: str) -> T.DataType:
    if name in _ATOMIC:
        return _ATOMIC[name]
    # arrays/maps/structs via DDL parser (covers embedding array<float> etc.)
    return T._parse_datatype_string(name)  # noqa: SLF001 - public-enough helper


class IncompatibleSchemaChange(ValueError):
    pass


def schema_to_registry(schema: T.StructType) -> list[dict[str, Any]]:
    return [
        {"id": i + 1, "name": f.name, "type": _type_name(f.dataType)}
        for i, f in enumerate(schema.fields)
    ]


def registry_to_schema(registry: list[dict[str, Any]]) -> T.StructType:
    return T.StructType(
        [T.StructField(e["name"], _parse_type(e["type"]), True) for e in registry]
    )


def reconcile(registry: list[dict[str, Any]], incoming: T.StructType) -> list[dict[str, Any]]:
    """Union an incoming batch schema into the registry, additively.

    Returns the (possibly extended) registry. Raises
    IncompatibleSchemaChange on narrowing or type conflicts.
    """
    by_name = {e["name"]: e for e in registry}
    out = [dict(e) for e in registry]
    next_id = max((e["id"] for e in registry), default=0) + 1
    for f in incoming.fields:
        tname = _type_name(f.dataType)
        if f.name not in by_name:
            out.append({"id": next_id, "name": f.name, "type": tname})
            next_id += 1
            continue
        cur = _CANON.get(by_name[f.name]["type"], by_name[f.name]["type"])
        if cur == tname:
            continue
        widened = _WIDEN.get((cur, tname)) or _WIDEN.get((tname, cur))
        if widened:
            for e in out:
                if e["name"] == f.name:
                    e["type"] = widened
            continue
        raise IncompatibleSchemaChange(
            f"field {f.name!r}: {cur} -> {tname} is not an additive/widening change"
        )
    return out


def align(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project df onto the target schema: missing columns NULL-backfilled,
    widenable columns cast, column order normalized."""
    cols = []
    have = {f.name: f.dataType for f in df.schema.fields}
    for f in target.fields:
        if f.name in have:
            col = F.col(f.name)
            if have[f.name] != f.dataType:
                col = col.cast(f.dataType)
            cols.append(col.alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
