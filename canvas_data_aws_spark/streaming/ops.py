"""Structured Streaming slice (SURVEY.md §2 B.9).

The reference's sync loop is a hand-rolled incremental file stream: daily
discovery of new files with an existence-check for exactly-once
(sync-canvas-data-files.py:58-84, fetch-canvas-data-file.py:25-31). Spark's
file source + checkpoint gives those guarantees natively:

- ``file_stream_source`` + ``Trigger.AvailableNow`` = the cron-triggered
  full pass (canvas_data_aws.yaml:234-242) with checkpointed file tracking
  replacing the idempotence guard;
- watermarks bound state for late data (the reference's "late files are
  reconciled by tomorrow's re-diff");
- ``foreachBatch`` upsert = the snapshot-mirror delete/replace semantics
  (sync-canvas-data-files.py:104-112) against a curated zone.

Every window aggregation here is also valid in batch — the oracle gate runs
the batch shape; integration tests run the streaming shape and assert both
agree (state correctness tested through batch-equivalent semantics,
SURVEY.md §7 hard part d).
"""

from __future__ import annotations

import os
import tempfile
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import DataStreamWriter
from pyspark.sql.types import StructType


def file_stream_source(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """stream_file_source: incremental discovery of files under a directory
    with exactly-once tracking via the checkpoint log."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if fmt == "csv":
        reader = reader.options(sep="\t", header="false", nullValue="\\N")
    return reader.load(path)


def tumbling_window_agg(events: DataFrame, width: str = "1 day") -> DataFrame:
    """stream_tumbling_window: fixed non-overlapping windows."""
    return (
        events.groupBy(F.window("ts", width).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


def sliding_window_agg(events: DataFrame, width: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    """stream_sliding_window: overlapping hop windows (each event lands in
    width/slide windows)."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_window_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """stream_session_window: dynamic-length sessions per user closed by a
    gap of inactivity."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


def with_watermark_dedup(events: DataFrame, delay: str = "1 hour") -> DataFrame:
    """stream_dedup: drop duplicate event_ids with bounded state — the
    streaming analog of the worker's existence check.

    Uses ``dropDuplicatesWithinWatermark`` so the watermark actually evicts
    per-key state: plain ``dropDuplicates(["event_id"])`` keeps every key
    forever (the event-time column is not in the subset, so nothing ages
    out) — unbounded state on a long-running stream. The WithinWatermark
    variant guarantees dedup of duplicates arriving within the delay and
    drops state once a key's first-seen time passes the watermark.
    """
    return events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(["event_id"])


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "6 hours",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """stream_stream_join: join two live streams on an equi-key plus an
    event-time interval (right.ts in [left.ts, left.ts + within]).

    Both sides carry watermarks and the join condition bounds event time in
    both directions, so Spark can size the state store: a buffered left row
    is droppable once the watermark passes ``left.ts + within``, a right row
    once it passes ``right.ts`` — without the time bound the state would
    grow with the stream. Inner output in append mode equals the batch
    join. With ``how='left_outer'`` an unmatched left row emits its
    null-padded result exactly when the watermark passes its join window
    (``left.ts + within``) — which is why outer stream joins NEED the time
    bound at all. Both shapes are proven against batch oracles that encode
    precisely those semantics.
    """
    a = left.withWatermark("ts", watermark).alias("a")
    b = right.withWatermark("ts", watermark).alias("b")
    cond = F.expr(
        f"a.{key} = b.{key} AND b.ts >= a.ts AND b.ts <= a.ts + interval {within}"
    )
    return a.join(b, cond, how).select(
        F.col(f"a.{key}").alias(key),
        F.col("a.event_id").alias("left_id"),
        F.col("b.event_id").alias("right_id"),
        F.col("a.ts").alias("left_ts"),
        F.col("b.ts").alias("right_ts"),
    )


def await_or_raise(query, timeout_sec: int) -> None:
    """awaitTermination with the boolean CHECKED: a still-running stream
    after ``timeout_sec`` raises instead of letting the caller silently
    read a partial sink (verdict log, memory table) and return wrong row
    counts. Every plan/test that awaits a bounded (availableNow) stream
    goes through here."""
    if not query.awaitTermination(timeout_sec):
        query.stop()
        raise TimeoutError(
            f"streaming query {query.name or query.id} did not finish "
            f"within {timeout_sec}s; sink contents would be partial"
        )


def start_available_now(
    df: DataFrame,
    sink_format: str = "memory",
    query_name: str | None = None,
    output_mode: str = "complete",
    path: str | None = None,
    checkpoint: str | None = None,
):
    """stream_trigger_batch: process everything available, then stop — the
    scheduled-batch analog of the reference's daily cron."""
    name = query_name or f"cda_q_{uuid.uuid4().hex[:8]}"
    ckpt = checkpoint or os.path.join(tempfile.mkdtemp(prefix="cda_ckpt_"), "ckpt")
    writer: DataStreamWriter = (
        df.writeStream.outputMode(output_mode)
        .format(sink_format)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
    )
    if sink_format == "memory":
        writer = writer.queryName(name)
    if path:
        writer = writer.option("path", path)
    return writer.start(), name


def start_processing_time(
    df: DataFrame,
    interval: str = "1 second",
    sink_format: str = "memory",
    query_name: str | None = None,
    output_mode: str = "append",
    checkpoint: str | None = None,
):
    """schedule_daily as a *running* schedule: a ProcessingTime trigger
    fires a micro-batch every ``interval`` over whatever new files arrived —
    the reference's cron rule (canvas_data_aws.yaml:234-242 'rate(1 day)')
    expressed as Spark's own scheduler instead of an external one.
    ``availableNow`` (start_available_now) is the catch-up/backfill shape;
    this is the steady-state daemon shape. Caller stops the query."""
    name = query_name or f"cda_sched_{uuid.uuid4().hex[:8]}"
    ckpt = checkpoint or os.path.join(tempfile.mkdtemp(prefix="cda_ckpt_"), "ckpt")
    writer: DataStreamWriter = (
        df.writeStream.outputMode(output_mode)
        .format(sink_format)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime=interval)
    )
    if sink_format == "memory":
        writer = writer.queryName(name)
    return writer.start(), name


def foreach_batch_upsert(curated_path: str, key_cols: list[str]):
    """stream_stateful_upsert: merge each micro-batch into a curated Parquet
    zone with last-writer-wins per key — the snapshot-mirror delete/replace
    (sync-canvas-data-files.py:104-112) expressed as a batch merge.

    Parquet has no row-level merge; the upsert is read-union-dedup-rewrite.
    At scale the curated zone would be partitioned and only affected
    partitions rewritten (dynamic partition overwrite); for table-sized
    batches a full rewrite is the honest cost.
    """

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        new = batch_df.dropDuplicates(key_cols)
        if os.path.exists(curated_path):
            existing = spark.read.parquet(curated_path)
            kept = existing.join(new.select(*key_cols), key_cols, "left_anti")
            merged = kept.unionByName(new)
        else:
            merged = new
        tmp_out = curated_path + f".tmp-{batch_id}"
        merged.write.mode("overwrite").parquet(tmp_out)
        final = spark.read.parquet(tmp_out)
        final.write.mode("overwrite").parquet(curated_path)
        import shutil

        shutil.rmtree(tmp_out, ignore_errors=True)

    return _upsert
