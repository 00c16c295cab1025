"""Table-driven tests for the Canvas type system port — every branch of the
reference's get_column_type (sync-canvas-data-files.py:150-167; SURVEY.md §5)."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    BooleanType,
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    TimestampType,
)

from canvas_data_aws_spark.sources.schema import (
    MAX_COMMENT_LEN,
    column_field,
    column_type,
    schema_registry,
    table_struct,
)


@pytest.mark.parametrize(
    ("ctype", "expected"),
    [
        ("text", StringType()),
        ("enum", StringType()),
        ("guid", StringType()),
        ("varchar", StringType()),
        ("double precision", DoubleType()),
        ("integer", IntegerType()),
        ("datetime", TimestampType()),
        # passthrough branch: already-valid engine type names
        ("bigint", LongType()),
        ("boolean", BooleanType()),
        ("date", DateType()),
    ],
)
def test_column_type_branches(ctype, expected):
    assert column_type({"name": "c", "type": ctype}) == expected


def test_unknown_type_raises():
    with pytest.raises(ValueError, match="unknown Canvas Data column type"):
        column_type({"name": "c", "type": "geometry"})


def test_varchar_length_recorded_as_metadata():
    f = column_field({"name": "code", "type": "varchar", "length": 36})
    assert f.dataType == StringType()
    assert f.metadata["varchar_length"] == 36


def test_varchar_without_length_is_plain_string():
    f = column_field({"name": "code", "type": "varchar"})
    assert f.dataType == StringType()
    assert "varchar_length" not in f.metadata


def test_comment_truncated_to_254():
    f = column_field({"name": "c", "type": "text", "description": "x" * 400})
    assert len(f.metadata["comment"]) == MAX_COMMENT_LEN


def test_table_struct_and_registry():
    schema = {
        "user_dim": {
            "tableName": "user_dim",
            "description": "users",
            "columns": [
                {"name": "id", "type": "bigint"},
                {"name": "name", "type": "varchar", "length": 256},
                {"name": "created_at", "type": "datetime"},
                {"name": "workflow_state", "type": "enum"},
            ],
        },
        "submission_fact": {
            "tableName": "submission_fact",
            "description": "facts",
            "columns": [
                {"name": "score", "type": "double precision"},
                {"name": "attempt", "type": "integer"},
            ],
        },
    }
    reg = schema_registry(schema)
    assert set(reg) == {"user_dim", "submission_fact"}
    ud = reg["user_dim"]
    assert [f.name for f in ud.fields] == ["id", "name", "created_at", "workflow_state"]
    assert ud.fields[0].dataType == LongType()
    assert ud.fields[2].dataType == TimestampType()
    assert all(f.nullable for f in table_struct(schema["user_dim"]).fields)
