"""Curated-zone (columnar) table loaders.

The reference's at-rest model is row-oriented gzip TSV registered table-by-
table in a catalog (see /root/reference/lambda/sync-canvas-data-files.py:177-202);
its columnar benefits are delegated entirely to the downstream engine. Our
curated zone is Parquet so Catalyst gets predicate pushdown, column pruning
and vectorized scans for free — strictly better than the reference's storage
(SURVEY.md §4). The driver's fixture tables are already Parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# The driver fixture corpus (TESTDATA.md): TPC-H-ish star schema + extension
# tables for streaming / LLM-data operators.
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables — always broadcast-join candidates at any scale.
SMALL_DIMS: frozenset[str] = frozenset({"region", "nation", "supplier", "part", "customer"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Schema comes from the Parquet footer —
    schemas are *declared*, never inferred from data (the reference registers
    explicit typed columns; Parquet footers serve that role here).

    ``events.ts`` has shipped in three physical encodings across fixture
    generations: parquet TIMESTAMP(NANOS) (read as long via the legacy conf,
    then converted), TIMESTAMP(MICROS) timezone-naive (TIMESTAMP_NTZ), and
    plain TIMESTAMP. Normalize all three to a session-TZ TIMESTAMP by
    inspecting the footer dtype — never assume one encoding."""
    # Timestamps are stored timezone-naive; DuckDB (and the oracle) read them
    # as naive values, so Spark must render them in UTC regardless of the
    # caller's session default — pin it (runtime-settable, idempotent).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # Legacy nanos-as-long fixture: lossless nanos -> micros.
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if isinstance(ts_type, T.TimestampNTZType):
            # Naive micros fixture: with the session TZ pinned to UTC this
            # cast is a pure type relabel (identical wall-clock + epoch).
            return df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every fixture table to Spark SQL by name (the engine-native
    analog of the reference's Glue catalog registration)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
