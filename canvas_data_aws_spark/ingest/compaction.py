"""Raw-zone -> curated-zone compaction.

The reference stores gzip TSV with no partition keys
(sync-canvas-data-files.py:177-202,184): non-splittable files (one task per
file, SURVEY.md §4) that any query must fully scan and parse. This job
re-encodes a raw table into the curated zone as Parquet, optionally
partitioned, with sized output files — after which every downstream scan
gets vectorized reads, predicate pushdown, column pruning, and partition
pruning for free.

Scale levers:
- ``target_rows_per_file`` bounds output file size (the small-files and the
  giant-files problems both kill 100 TB scans); repartition count is derived
  from the input estimate rather than hardcoded.
- ``partition_by`` turns full scans into directory-pruned scans for the
  given predicates (fixing the reference's PartitionKeys: []).
- low-cardinality partitioning uses repartition(partition cols) first so
  each output directory is written by few tasks (no small-file explosion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from canvas_data_aws_spark.sources.tsv import read_tsv_gzip


def compact_table(
    df: DataFrame,
    out_path: str,
    partition_by: list[str] | None = None,
    target_rows_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    n = df.count()
    n_files = max(1, (n + target_rows_per_file - 1) // target_rows_per_file)
    if partition_by:
        # co-locate rows of each partition value; file sizing within a
        # directory is then governed by maxRecordsPerFile
        staged = df.repartition(*partition_by)
        (
            staged.write.mode(mode)
            .option("maxRecordsPerFile", target_rows_per_file)
            .partitionBy(*partition_by)
            .parquet(out_path)
        )
    else:
        df.repartition(n_files).write.mode(mode).option(
            "maxRecordsPerFile", target_rows_per_file
        ).parquet(out_path)


def compact_raw_tsv(
    spark: SparkSession,
    raw_table_dir: str,
    schema: StructType,
    out_path: str,
    partition_by: list[str] | None = None,
    target_rows_per_file: int = 1_000_000,
) -> DataFrame:
    """gzip TSV table directory -> curated Parquet; returns the curated
    DataFrame for verification."""
    raw = read_tsv_gzip(spark, raw_table_dir, schema)
    compact_table(raw, out_path, partition_by, target_rows_per_file)
    return spark.read.parquet(out_path)
