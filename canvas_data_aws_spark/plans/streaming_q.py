"""B.9 streaming analog queries (SURVEY.md §2).

Driver checks are batch-shaped, so each windowed op registers its batch
equivalent (``window()``/``session_window()`` evaluate identically in batch)
— except ``stream_file_source``, which runs a REAL Structured Streaming job
(file source -> availableNow -> memory sink) and returns its result table:
the oracle then proves streaming and batch semantics agree.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from canvas_data_aws_spark.plans.registry import register
from canvas_data_aws_spark.sources.parquet import load_table
from canvas_data_aws_spark.streaming.ops import (
    await_or_raise,
    file_stream_source,
    session_window_agg,
    sliding_window_agg,
    start_available_now,
    tumbling_window_agg,
)

_TUMBLING_ORACLE = """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY 1
"""


@register(
    "stream_tumbling_window",
    _TUMBLING_ORACLE,
    doc="Tumbling 1-day windows over the event stream (batch shape; the "
    "streaming shape is identical and exercised by stream_file_source).",
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_window_agg(load_table(spark, sf_dir, "events"), "1 day")


@register(
    "stream_sliding_window",
    """
    WITH starts AS (
      SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS window_start FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE FROM events
    )
    SELECT window_start, COUNT(*) AS n_events
    FROM starts
    GROUP BY window_start
    """,
    doc="Sliding 1h/30m hop windows: every event lands in exactly 2 windows "
    "(oracle: union of the two phase-shifted tumbling assignments, via "
    "time_bucket — naive-timestamp arithmetic; an epoch()/to_timestamp() "
    "round-trip goes through TIMESTAMPTZ and silently shifts by the "
    "session timezone on non-UTC hosts).",
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_window_agg(load_table(spark, sf_dir, "events"), "1 hour", "30 minutes")


@register(
    "stream_session_window",
    """
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM ordered
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, sid
    """,
    doc="Session windows (30-min inactivity gap) per user. Oracle re-derives "
    "sessions via gaps-and-islands; boundary semantics pinned: a gap of "
    "exactly the timeout starts a NEW session (windows are [start, last+gap)).",
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_window_agg(load_table(spark, sf_dir, "events"), "30 minutes")


@register(
    "stream_watermark_late",
    """
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           COUNT(*) AS n_events
    FROM events
    WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR
          <= (SELECT MAX(ts) - INTERVAL 1 HOUR FROM events)
    GROUP BY 1
    """,
    doc="Watermark semantics in batch form: with watermark = max(ts) - 1h, "
    "exactly the hour-windows whose END is at-or-before the watermark are "
    "finalized (what append-mode streaming would have emitted).",
)
def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    horizon = ev.agg((F.max("ts") - F.expr("INTERVAL 1 HOUR")).alias("wm"))
    agg = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), "n_events")
    )
    return (
        agg.crossJoin(F.broadcast(horizon))
        .filter(F.col("window_end") <= F.col("wm"))
        .select("window_start", "n_events")
    )


@register(
    "stream_dedup",
    "SELECT DISTINCT user_id, event_type FROM events",
    doc="Streaming dedup analog (dropDuplicates; with a watermark in the "
    "streaming shape the key state is bounded — idempotence_guard parity, "
    "fetch-canvas-data-file.py:25-31).",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").dropDuplicates(["user_id", "event_type"]).select(
        "user_id", "event_type"
    )


@register(
    "stream_file_source",
    _TUMBLING_ORACLE,
    doc="REAL Structured Streaming run: events staged to a directory, file "
    "source with checkpointed discovery, availableNow trigger (the daily-"
    "cron analog), tumbling agg into a memory sink; returns the sink table. "
    "Oracle equality proves the streaming pipeline matches batch semantics.",
)
def stream_file_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    workdir = tempfile.mkdtemp(prefix="cda_stream_src_")
    src_dir = os.path.join(workdir, "in")
    events.write.mode("overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    stream = file_stream_source(spark, src_dir, schema, fmt="parquet")
    agg = tumbling_window_agg(stream, "1 day")
    query, name = start_available_now(agg, sink_format="memory", output_mode="complete")
    await_or_raise(query, 120)
    result = spark.table(name).cache()
    result.count()  # materialize before the temp dir is removed
    shutil.rmtree(workdir, ignore_errors=True)
    return result


@register(
    "stream_stream_join",
    """
    SELECT a.user_id,
           a.event_id AS left_id, b.event_id AS right_id,
           a.ts AS left_ts, b.ts AS right_ts
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 6 HOUR
    WHERE a.event_type = 'click' AND b.event_type = 'error'
    """,
    doc="REAL stream-stream interval join: clicks and errors staged as two "
    "file streams, each watermarked, joined on user_id with errors within "
    "6h after the click (streaming/ops.py::stream_stream_interval_join). "
    "The two-sided time bound is what lets Spark evict join state; append "
    "output after availableNow must equal the batch interval join — which "
    "is exactly what the oracle checks.",
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.streaming.ops import stream_stream_interval_join

    events = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type")
    workdir = tempfile.mkdtemp(prefix="cda_ssj_")
    click_dir = os.path.join(workdir, "clicks")
    err_dir = os.path.join(workdir, "errors")
    # coalesce staging: 2 files per side instead of 32 near-empty ones —
    # the file-source listing and per-file task overhead dominate at test
    # scale (a real deployment points the stream at an existing feed)
    events.filter(F.col("event_type") == "click").coalesce(2).write.mode("overwrite").parquet(click_dir)
    events.filter(F.col("event_type") == "error").coalesce(2).write.mode("overwrite").parquet(err_dir)
    schema = spark.read.parquet(click_dir).schema

    joined = stream_stream_interval_join(
        file_stream_source(spark, click_dir, schema),
        file_stream_source(spark, err_dir, schema),
        key="user_id",
        within="6 hours",
    )
    # State-store partition count is fixed at stream start (AQE never
    # re-plans streaming stages) and each partition costs two store
    # instances per micro-batch here; size it to the stream, not the
    # session default (32 -> 8: measured 13s -> 2.8s at sf0.1; a real
    # 100 TB stream would size UP the same way).
    shuffle_key = "spark.sql.shuffle.partitions"
    old_parts = spark.conf.get(shuffle_key)
    spark.conf.set(shuffle_key, "8")
    try:
        query, name = start_available_now(joined, sink_format="memory", output_mode="append")
        await_or_raise(query, 120)
        result = spark.table(name).cache()
        result.count()  # materialize before the temp dir is removed
    finally:
        spark.conf.set(shuffle_key, old_parts)
    shutil.rmtree(workdir, ignore_errors=True)
    return result


@register(
    "stream_stream_join_outer",
    """
    WITH clicks AS (SELECT * FROM events WHERE event_type = 'click'),
    errs AS (SELECT * FROM events WHERE event_type = 'error'),
    wm AS (SELECT LEAST(
             (SELECT date_trunc('millisecond', MAX(ts)) FROM clicks),
             (SELECT date_trunc('millisecond', MAX(ts)) FROM errs)
           ) - INTERVAL 1 HOUR AS w),
    matched AS (
      SELECT c.user_id, c.event_id AS left_id, e.event_id AS right_id,
             c.ts AS left_ts, e.ts AS right_ts
      FROM clicks c JOIN errs e
        ON c.user_id = e.user_id AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 6 HOUR
    ),
    unmatched AS (
      SELECT c.user_id, c.event_id AS left_id, CAST(NULL AS BIGINT) AS right_id,
             c.ts AS left_ts, CAST(NULL AS TIMESTAMP) AS right_ts
      FROM clicks c, wm
      WHERE NOT EXISTS (
              SELECT 1 FROM errs e
              WHERE e.user_id = c.user_id AND e.ts >= c.ts
                AND e.ts <= c.ts + INTERVAL 6 HOUR)
        AND c.ts + INTERVAL 6 HOUR < wm.w
    )
    SELECT * FROM matched UNION ALL SELECT * FROM unmatched
    """,
    doc="LEFT OUTER stream-stream interval join — the oracle encodes "
    "Spark's exact emission rule: matches always emit; an unmatched click "
    "emits null-padded only once the global watermark — the MIN of the two "
    "streams' per-source watermarks (multipleWatermarkPolicy=min), each "
    "stream max ms-truncated as Spark tracks it, minus the 1h delay — passes "
    "its entire join window (click ts + 6h). Clicks whose window was still "
    "open when the streams ended are correctly ABSENT — the semantic "
    "difference from a batch left join, checked exactly. Staging writes "
    "time-sliced files with strictly increasing mtimes because "
    "FileStreamSource orders by modification time: a random file order "
    "would put a late range first and late-drop whole batches.",
)
def stream_stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob

    from canvas_data_aws_spark.streaming.ops import stream_stream_interval_join

    events = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type")
    # Staging is ONE write job (round-6 advice: the old shape ran a driver
    # agg().first() for the time bounds plus EIGHT filtered scan+writes —
    # nine scans of events). The bounds become a broadcast scalar crossJoin
    # feeding a computed slice column, and one partitioned write lays out
    # event_type=*/slice=* dirs; the repartition on the write keys puts each
    # (type, slice) in exactly one task, i.e. one file, which the per-slice
    # mtime stamping (FileStreamSource orders by mtime) requires.
    bounds = events.agg(F.min("ts").alias("__lo"), F.max("ts").alias("__hi"))
    micros = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    sliced = (
        events.filter(F.col("event_type").isin("click", "error"))
        .crossJoin(F.broadcast(bounds))
        .withColumn(
            "slice",
            F.least(
                F.lit(3),
                F.floor(
                    (micros("ts") - micros("__lo"))
                    * 4
                    / F.greatest(F.lit(1), micros("__hi") - micros("__lo"))
                ),
            ).cast("int"),
        )
        .drop("__lo", "__hi")
    )
    workdir = tempfile.mkdtemp(prefix="cda_ssjo_")
    staged_root = os.path.join(workdir, "staged")
    (
        sliced.repartition("event_type", "slice")
        .write.partitionBy("event_type", "slice")
        .parquet(staged_root)
    )
    click_dir = os.path.join(staged_root, "event_type=click")
    err_dir = os.path.join(staged_root, "event_type=error")
    for d in (click_dir, err_dir):
        for i in range(4):
            for f in glob.glob(os.path.join(d, f"slice={i}", "*.parquet")):
                os.utime(f, (1_000_000 + i, 1_000_000 + i))
    schema = spark.read.parquet(click_dir).schema

    joined = stream_stream_interval_join(
        file_stream_source(spark, click_dir, schema, max_files_per_trigger=1),
        file_stream_source(spark, err_dir, schema, max_files_per_trigger=1),
        key="user_id",
        within="6 hours",
        how="left_outer",
    )
    shuffle_key = "spark.sql.shuffle.partitions"
    old_parts = spark.conf.get(shuffle_key)
    spark.conf.set(shuffle_key, "8")
    try:
        query, name = start_available_now(joined, sink_format="memory", output_mode="append")
        await_or_raise(query, 120)
        result = spark.table(name).cache()
        result.count()
    finally:
        spark.conf.set(shuffle_key, old_parts)
    shutil.rmtree(workdir, ignore_errors=True)
    return result


@register(
    "stream_static_join",
    """
    SELECT c.c_mktsegment AS mktsegment, e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(e.value), 2) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
    doc="REAL stream-static enrichment join — the most common production "
    "streaming shape (click stream x dimension): events staged as a "
    "checkpointed file stream, joined per micro-batch to the static "
    "customer dim (broadcast: the static side is planned once and hashed "
    "to every task; no state store involvement, unlike stream-stream "
    "joins), aggregated by (segment, type) into a memory sink in complete "
    "mode. availableNow output must equal the batch join+agg — exactly "
    "what the oracle checks.",
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.streaming.ops import (
        file_stream_source,
        start_available_now,
    )

    events = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    workdir = tempfile.mkdtemp(prefix="cda_stream_static_")
    src_dir = os.path.join(workdir, "in")
    events.write.mode("overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    stream = file_stream_source(spark, src_dir, schema, fmt="parquet")
    enriched = (
        stream.join(F.broadcast(dim), stream.user_id == dim.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("mktsegment"), "event_type"
        )
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    query, name = start_available_now(enriched, sink_format="memory", output_mode="complete")
    await_or_raise(query, 120)
    result = spark.table(name).cache()
    result.count()  # materialize before the temp dir is removed
    shutil.rmtree(workdir, ignore_errors=True)
    return result


def stage_arrival_batches(
    spark: SparkSession, df, workdir: str, n_batches: int = 4, key: str = "doc_id"
) -> str:
    """Stage ``df`` as ``n_batches`` single-file parquet arrivals with
    strictly increasing mtimes (``key % n_batches`` = arrival order), so a
    maxFilesPerTrigger=1 file source replays them as deterministic
    micro-batches — the fixture-side stand-in for a real ingest feed."""
    src_dir = os.path.join(workdir, "in")
    os.makedirs(src_dir, exist_ok=True)
    base = 1_700_000_000
    for b in range(n_batches):
        part_dir = os.path.join(workdir, f"stage_{b}")
        df.filter(F.col(key) % n_batches == b).coalesce(1).write.mode(
            "overwrite"
        ).parquet(part_dir)
        part = next(
            f for f in os.listdir(part_dir)
            if f.endswith(".parquet") and not f.startswith("_")
        )
        dst = os.path.join(src_dir, f"batch_{b}.parquet")
        shutil.move(os.path.join(part_dir, part), dst)
        os.utime(dst, (base + 60 * b, base + 60 * b))
        shutil.rmtree(part_dir, ignore_errors=True)
    return src_dir


@register(
    "stream_near_dedup",
    None,  # xxhash64-seeded MinHash state — rows-only; exact equality to a
    # sequential batch-by-batch replay (minhash_cross_pairs vs state +
    # within-batch minhash_lsh_pairs, identical seed/geometry) is asserted
    # in tests/test_streaming_near_dedup.py
    doc="REAL streaming near-dup dedup: documents replayed as 4 arrival "
    "micro-batches (file source, maxFilesPerTrigger=1, availableNow); each "
    "batch MinHash-signs its docs, band-joins them against the persisted "
    "band buckets of everything previously kept, drops near-matches "
    "(state hit, or within-batch hit with a smaller id), and appends "
    "survivors' bands+signatures to the state store "
    "(streaming/near_dedup.py). The continuous-ingestion shape of "
    "corpus_cross_dedup_near: per-batch cost is one delta signature pass "
    "+ a delta x state band equi-join; the state is write-once per kept "
    "doc and never rebuilt. Returns the per-doc verdict log.",
    tags=("streaming", "llm", "dedup"),
    quality_test="tests/test_streaming_near_dedup.py::test_stream_equals_sequential_replay",
)
def stream_near_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.streaming.near_dedup import stream_near_dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    workdir = tempfile.mkdtemp(prefix="cda_stream_neardup_")
    src_dir = stage_arrival_batches(spark, docs, workdir, n_batches=4)
    schema = spark.read.parquet(src_dir).schema

    out_dir = os.path.join(workdir, "verdicts")
    query = stream_near_dedup(
        spark,
        src_dir,
        schema,
        state_dir=os.path.join(workdir, "state"),
        out_dir=out_dir,
        jaccard_threshold=0.5,
    )
    await_or_raise(query, 300)
    result = spark.read.parquet(out_dir).cache()
    result.count()  # materialize before the temp dir is removed
    shutil.rmtree(workdir, ignore_errors=True)
    return result.select(
        "doc_id",
        # batch_id is a partition directory now (replay-idempotent sink);
        # partition-column inference reads it as int — pin the contract type
        F.col("batch_id").cast("bigint").alias("batch_id"),
        "matched_state",
        "matched_batch",
        "kept",
    )


@register(
    "stream_near_dedup_compacted",
    None,  # same rows-only rationale as stream_near_dedup; verdict
    # equivalence across a mid-stream compaction is the quality contract
    doc="stream_near_dedup with an offline STATE COMPACTION between "
    "arrival windows: the first half of the batches runs, compact_state "
    "folds the per-batch state partitions into one batch_id=-1 layer "
    "(one file per band bucket — the lakehouse OPTIMIZE action for the "
    "state store, streaming/near_dedup.py::compact_state), then the "
    "remaining batches run against the compacted state. Verdicts must be "
    "indistinguishable from the never-compacted run; what changes is the "
    "state scan's file count, which after B batches is B small files per "
    "bucket and is the classic streaming small-files bottleneck at "
    "100 TB. Returns the per-doc verdict log.",
    tags=("streaming", "llm", "dedup"),
    quality_test="tests/test_streaming_near_dedup.py::test_compaction_preserves_verdicts",
)
def stream_near_dedup_compacted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.streaming.near_dedup import (
        NearDedupConfig,
        compact_state,
        process_batch,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_batches = 4
    workdir = tempfile.mkdtemp(prefix="cda_stream_neardup_cmp_")
    cfg = NearDedupConfig(
        state_dir=os.path.join(workdir, "state"),
        out_dir=os.path.join(workdir, "verdicts"),
    )
    for b in range(n_batches):
        process_batch(
            spark, docs.filter(F.col("doc_id") % n_batches == b), b, cfg
        )
        if b == n_batches // 2 - 1:
            compact_state(spark, cfg)
    result = spark.read.parquet(cfg.out_dir).cache()
    result.count()  # materialize before the temp dir is removed
    shutil.rmtree(workdir, ignore_errors=True)
    return result.select(
        "doc_id",
        F.col("batch_id").cast("bigint").alias("batch_id"),
        "matched_state",
        "matched_batch",
        "kept",
    )
