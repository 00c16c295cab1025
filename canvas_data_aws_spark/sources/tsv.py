"""Raw-zone reader/writer: header-less gzip TSV with declared schema.

This is the reference's at-rest format — tab-delimited, gzip-compressed,
no header, registered with explicit typed columns
(/root/reference/lambda/sync-canvas-data-files.py:177-202: LazySimpleSerDe,
``delimiter \\t``, classification csv, compressionType gzip). Schemas are
always declared, never inferred (Glue columns are explicit, :206-218).

Scale note: gzip is non-splittable — one task per file. That is acceptable in
the raw zone (the upstream extract is many per-table files, so parallelism is
per-file, matching the reference's one-worker-per-file fan-out), but the
curated zone re-encodes to Parquet+snappy so scans split freely (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

#: The null marker used by Canvas-style TSV extracts ("\\N", Hive default).
NULL_MARKER = "\\N"


def read_tsv_gzip(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Read a directory of header-less gzip TSV part-files as one table.

    One table <-> one directory of files, exactly the reference's layout
    ``raw_files/{table}/{filename}`` (sync-canvas-data-files.py:60).
    """
    return (
        spark.read.schema(schema)
        .options(
            sep="\t",
            header="false",
            nullValue=NULL_MARKER,
            emptyValue=NULL_MARKER,  # empty string fields are also null in extracts
            timestampFormat="yyyy-MM-dd HH:mm:ss[.SSSSSS]",
            dateFormat="yyyy-MM-dd",
            mode="PERMISSIVE",
        )
        .csv(path)
    )


def write_tsv_gzip(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a DataFrame in raw-zone format (round-trip fidelity with
    :func:`read_tsv_gzip` — used by tests and the compaction job's inverse)."""
    (
        df.write.mode(mode)
        .options(
            sep="\t",
            header="false",
            nullValue=NULL_MARKER,
            emptyValue="",
            compression="gzip",
            timestampFormat="yyyy-MM-dd HH:mm:ss.SSSSSS",
            dateFormat="yyyy-MM-dd",
        )
        .csv(path)
    )
