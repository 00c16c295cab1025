"""Canvas Data schema model: API schema dict -> Spark StructType.

Re-expresses the reference's entire type system — ``get_column_type``
(/root/reference/lambda/sync-canvas-data-files.py:150-167) — as a Spark
``DataType`` factory, including the deliberate passthrough branch for types
that are already valid engine type names (bigint, boolean, date; SURVEY.md
§1.2). The schema dict shape matches the Canvas Data API response used at
sync-canvas-data-files.py:116-118,206-216:

    {table: {"tableName": str, "description": str,
             "columns": [{"name", "type", "length", "description"}]}}

Varchar lengths are kept as column *metadata* rather than ``VarcharType`` —
matching the practical Athena behavior the reference relies on
(sync-canvas-data-files.py:155-159) while keeping Spark plans on plain
StringType (SURVEY.md §7 hard part e).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql.types import (
    BooleanType,
    DataType,
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Canvas Data API type -> Spark type. Mirrors every branch of
# sync-canvas-data-files.py:150-167 (see the table in SURVEY.md §1.2).
_TEXTUAL = {"text", "enum", "guid"}

_PASSTHROUGH: dict[str, DataType] = {
    # the reference passes these through verbatim because they are already
    # valid Hive type names (sync-canvas-data-files.py:166-167)
    "bigint": LongType(),
    "boolean": BooleanType(),
    "date": DateType(),
    "int": IntegerType(),
    "double": DoubleType(),
    "string": StringType(),
    "timestamp": TimestampType(),
}

#: Glue truncates comments at 255 chars; the reference trims to 254
#: (sync-canvas-data-files.py:172,209). Kept for description fidelity.
MAX_COMMENT_LEN = 254


def column_type(column: dict[str, Any]) -> DataType:
    """Map one Canvas Data column descriptor to a Spark DataType.

    Branch-for-branch parity with ``get_column_type``
    (sync-canvas-data-files.py:150-167)."""
    ctype = str(column.get("type", "")).lower()
    if ctype in _TEXTUAL:
        return StringType()
    if ctype == "varchar":
        # with or without length -> StringType; length recorded as metadata
        return StringType()
    if ctype == "double precision":
        return DoubleType()
    if ctype == "integer":
        return IntegerType()
    if ctype == "datetime":
        return TimestampType()
    if ctype in _PASSTHROUGH:
        return _PASSTHROUGH[ctype]
    raise ValueError(f"unknown Canvas Data column type: {ctype!r}")


def column_field(column: dict[str, Any]) -> StructField:
    meta: dict[str, Any] = {}
    desc = column.get("description")
    if desc:
        meta["comment"] = str(desc)[:MAX_COMMENT_LEN]
    if str(column.get("type", "")).lower() == "varchar" and column.get("length"):
        meta["varchar_length"] = int(column["length"])
    return StructField(str(column["name"]), column_type(column), nullable=True, metadata=meta)


def table_struct(table_schema: dict[str, Any]) -> StructType:
    """Canvas table descriptor ({tableName, description, columns}) -> StructType."""
    return StructType([column_field(c) for c in table_schema["columns"]])


def schema_registry(schema: dict[str, Any]) -> dict[str, StructType]:
    """Full API schema dict -> {table_name: StructType} (the engine-side
    mirror of the per-table loop at sync-canvas-data-files.py:114-122)."""
    out: dict[str, StructType] = {}
    for entry in schema.values():
        out[str(entry["tableName"])] = table_struct(entry)
    return out
