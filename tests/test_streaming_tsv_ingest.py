"""Streaming ingestion of the raw zone: gzip TSV extract files with a
declared Canvas schema flowing through the file stream source into a
curated Parquet zone — the fully Spark-native version of the reference's
daily sync (discovery + exactly-once + typed load in one pipeline)."""

from __future__ import annotations

import gzip
import os

import pyspark.sql.functions as F

from canvas_data_aws_spark.sources.schema import table_struct
from canvas_data_aws_spark.streaming.ops import await_or_raise, file_stream_source

TABLE = {
    "tableName": "submission_fact",
    "columns": [
        {"name": "user_id", "type": "bigint"},
        {"name": "score", "type": "double precision"},
        {"name": "submitted_at", "type": "datetime"},
    ],
}


def _extract(dirpath: str, name: str, rows: list[str]) -> None:
    os.makedirs(dirpath, exist_ok=True)
    with gzip.open(os.path.join(dirpath, name), "wt") as f:
        f.write("\n".join(rows) + "\n")


def test_stream_canvas_tsv_to_curated(spark, tmp_path):
    raw = str(tmp_path / "raw_files" / "submission_fact")
    curated = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")
    struct = table_struct(TABLE)

    _extract(raw, "part-0.tsv.gz", ["1\t90.5\t2024-01-01 10:00:00", "2\t\\N\t2024-01-02 11:30:00"])

    def run_pass():
        stream = file_stream_source(spark, raw, struct, fmt="csv")
        q = (
            stream.writeStream.format("parquet")
            .option("path", curated)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, 120)

    run_pass()
    first = spark.read.parquet(curated)
    assert first.count() == 2
    assert dict(first.dtypes)["submitted_at"] == "timestamp"
    assert first.filter(F.col("score").isNull()).count() == 1  # \N fidelity

    # a new extract file lands (tomorrow's sync): only the new file processes
    _extract(raw, "part-1.tsv.gz", ["3\t75.0\t2024-01-03 09:15:00"])
    run_pass()
    after = spark.read.parquet(curated)
    assert after.count() == 3  # exactly-once: old file not re-ingested
    assert {r["user_id"] for r in after.collect()} == {1, 2, 3}
