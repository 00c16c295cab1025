"""Streaming integration tests: incremental file discovery with checkpoint
resume, stateful upsert via foreachBatch, and the applyInPandasWithState
running-totals operator — all driven with availableNow triggers."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from canvas_data_aws_spark.sources.parquet import load_table
from canvas_data_aws_spark.streaming.ops import (
    await_or_raise,
    file_stream_source,
    foreach_batch_upsert,
    start_available_now,
    tumbling_window_agg,
    with_watermark_dedup,
)
from canvas_data_aws_spark.streaming.stateful import running_totals_per_user


def _stage_events(spark, sf_dir, out, keys_mod=None):
    ev = load_table(spark, sf_dir, "events")
    if keys_mod is not None:
        ev = ev.filter(F.col("event_id") % 2 == keys_mod)
    ev.write.mode("append").parquet(out)
    return ev


def test_file_source_checkpoint_resume(spark, sf_dir, tmp_path):
    """Two availableNow passes over a growing directory: the checkpoint must
    make the second pass process only new files, with the final result equal
    to the batch answer over everything (exactly-once discovery — the
    streaming replacement for diff_fetch_set + idempotence_guard)."""
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out_rows = {}

    _stage_events(spark, sf_dir, src, keys_mod=0)
    schema = spark.read.parquet(src).schema

    for round_no in (1, 2):
        stream = file_stream_source(spark, src, schema)
        agg = tumbling_window_agg(stream, "1 day")
        query, name = start_available_now(
            agg, sink_format="memory", output_mode="complete", checkpoint=ckpt
        )
        await_or_raise(query, 120)
        out_rows[round_no] = {
            r["window_start"]: (r["n_events"], r["sum_value"])
            for r in spark.table(name).collect()
        }
        if round_no == 1:
            _stage_events(spark, sf_dir, src, keys_mod=1)  # late-arriving files

    batch = {
        r["window_start"]: (r["n_events"], r["sum_value"])
        for r in tumbling_window_agg(load_table(spark, sf_dir, "events"), "1 day").collect()
    }
    assert out_rows[2] == batch
    # first pass saw only half the events
    assert sum(n for n, _ in out_rows[1].values()) * 2 == pytest.approx(
        sum(n for n, _ in batch.values()) * 1, abs=1
    )


def test_streaming_dedup(spark, sf_dir, tmp_path):
    src = str(tmp_path / "in")
    ev = load_table(spark, sf_dir, "events")
    # duplicate every event (two identical files)
    ev.write.mode("append").parquet(src)
    ev.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = with_watermark_dedup(file_stream_source(spark, src, schema), "2 hours")
    counted = stream.select("event_id")
    query, name = start_available_now(counted, sink_format="memory", output_mode="append")
    await_or_raise(query, 120)
    assert spark.table(name).count() == ev.count()


def test_foreach_batch_upsert(spark, sf_dir, tmp_path):
    """Snapshot-mirror upsert: second batch overwrites rows per key
    (last-writer-wins), never duplicates."""
    curated = str(tmp_path / "curated")
    src = str(tmp_path / "in")
    ev = load_table(spark, sf_dir, "events").limit(100).select("event_id", "user_id", "value")
    ev.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    upsert = foreach_batch_upsert(curated, ["event_id"])

    stream = file_stream_source(spark, src, schema)
    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, 120)
    first = spark.read.parquet(curated)
    assert first.count() == 100

    # re-deliver the same keys with value bumped: expect overwrite, not append
    ev.withColumn("value", F.col("value") + 1000).write.mode("overwrite").parquet(src + "2")
    stream2 = file_stream_source(spark, src + "2", schema)
    q2 = (
        stream2.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q2, 120)
    after = spark.read.parquet(curated)
    assert after.count() == 100
    assert after.agg(F.min("value")).collect()[0][0] >= 1000


def test_stateful_running_totals(spark, sf_dir, tmp_path):
    """applyInPandasWithState: totals accumulate across micro-batches in the
    state store; final emission equals the batch groupBy."""
    src = str(tmp_path / "in")
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "value")
    ev.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = file_stream_source(spark, src, schema, max_files_per_trigger=1)
    totals = running_totals_per_user(stream)
    query, name = start_available_now(totals, sink_format="memory", output_mode="update")
    await_or_raise(query, 180)

    # memory sink in update mode appends every emission; last row per user wins
    emitted = spark.table(name)
    w_last = (
        emitted.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_value")).alias("s"))
        .select("user_id", F.col("s.n_events").alias("n_events"), F.col("s.total_value").alias("total_value"))
    )
    expected = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value")
    )
    got = {r["user_id"]: (r["n_events"], r["total_value"]) for r in w_last.collect()}
    want = {r["user_id"]: (r["n_events"], r["total_value"]) for r in expected.collect()}
    assert set(got) == set(want)
    mismatch = {u: (got[u], want[u]) for u in want if got[u][0] != want[u][0]}
    assert not mismatch, f"running totals diverge for {len(mismatch)} users: {list(mismatch.items())[:3]}"


def test_processing_time_schedule_picks_up_new_files(spark, sf_dir, tmp_path):
    """The cron-analog daemon: a ProcessingTime-triggered query ingests
    files that arrive AFTER it starts — the reference's daily schedule as
    Spark's own trigger loop (schedule_daily, canvas_data_aws.yaml rate
    rule). Two drops of files must both land in the sink."""
    import time

    from canvas_data_aws_spark.streaming.ops import start_processing_time

    src = str(tmp_path / "in")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id").limit(200)
    first, second = ev.filter(F.col("event_id") % 2 == 0), ev.filter(F.col("event_id") % 2 == 1)
    first.coalesce(1).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = file_stream_source(spark, src, schema)
    query, name = start_processing_time(stream, interval="1 second")
    try:
        deadline = time.time() + 60
        while spark.table(name).count() < first.count() and time.time() < deadline:
            time.sleep(0.5)
        # drop a second batch of files while the schedule is live
        second.coalesce(1).write.mode("append").parquet(src)
        want = first.count() + second.count()
        while spark.table(name).count() < want and time.time() < deadline:
            time.sleep(0.5)
        got = spark.table(name).count()
    finally:
        query.stop()
    assert got == want, f"daemon ingested {got} of {want} rows"


def test_await_or_raise_times_out_on_live_stream(spark, sf_dir, tmp_path):
    """await_or_raise must RAISE (not silently return) when the stream is
    still running at the deadline — the failure mode the helper exists to
    close is a caller reading a partial sink after a quiet timeout."""
    import pytest

    from canvas_data_aws_spark.streaming.ops import (
        await_or_raise,
        start_processing_time,
    )

    src = str(tmp_path / "in")
    load_table(spark, sf_dir, "events").select("event_id").limit(10).coalesce(
        1
    ).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = file_stream_source(spark, src, schema)
    query, _ = start_processing_time(stream, interval="1 second")
    try:
        with pytest.raises(TimeoutError, match="did not finish"):
            await_or_raise(query, 1)
    finally:
        query.stop()


def test_user_profile_stateful_gate():
    """The Spark-4 transformWithState path requires protobuf; the selector
    must fall back to applyInPandasWithState when it's absent and still
    produce the declared output schema either way."""
    from canvas_data_aws_spark.streaming import stateful as st

    assert st.USER_PROFILE_SCHEMA.fieldNames() == [
        "user_id",
        "n_events",
        "total_value",
        "first_ts",
    ]
    if st._tws_runtime_available():
        import google.protobuf  # noqa: F401  (sanity: gate truthful)
    else:
        import pytest

        with pytest.raises(ImportError):
            from google.protobuf import descriptor  # noqa: F401
