"""Remaining SURVEY.md §2 inventory keys: declared-schema discipline (B.1),
the two streaming ops whose semantics live in side effects (B.9), and the
UDF/UDAF/UDTF surface (B.10) — each demonstrated with an exact oracle so
the Arrow machinery itself is value-checked.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

from canvas_data_aws_spark.plans.registry import register
from canvas_data_aws_spark.sources.parquet import load_table
from canvas_data_aws_spark.sources.schema import table_struct
from canvas_data_aws_spark.sources.tsv import read_tsv_gzip, write_tsv_gzip


@register(
    "schema_inference_off",
    """
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
    doc="Schemas are declared, never inferred (the reference registers "
    "explicit Glue columns, sync-canvas-data-files.py:206-218): a Canvas "
    "schema dict drives type_map -> StructType -> TSV read; the typed "
    "round-trip equals the source table.",
)
def schema_inference_off(spark: SparkSession, sf_dir: str) -> DataFrame:
    canvas_schema = {
        "tableName": "nation",
        "description": "nation dim",
        "columns": [
            {"name": "n_nationkey", "type": "integer"},
            {"name": "n_name", "type": "varchar", "length": 64},
            {"name": "n_regionkey", "type": "integer"},
        ],
    }
    struct = table_struct(canvas_schema)
    nation = load_table(spark, sf_dir, "nation")
    out = os.path.join(tempfile.gettempdir(), f"cda_schema_decl_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}", "nation")
    write_tsv_gzip(nation.select("n_nationkey", "n_name", "n_regionkey"), out)
    return read_tsv_gzip(spark, out, struct)


@register(
    "stream_trigger_batch",
    "SELECT CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_unique_events FROM events",
    doc="availableNow trigger (the reference's daily-cron analog, "
    "canvas_data_aws.yaml:234-242): a real streaming pass with watermark "
    "dedup over a doubled source; exactly-once count equals batch DISTINCT.",
)
def stream_trigger_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.streaming.ops import (
        await_or_raise,
        file_stream_source,
        start_available_now,
        with_watermark_dedup,
    )

    events = load_table(spark, sf_dir, "events")
    workdir = tempfile.mkdtemp(prefix="cda_trig_")
    src = os.path.join(workdir, "in")
    events.write.mode("append").parquet(src)
    events.write.mode("append").parquet(src)  # duplicate delivery
    schema = spark.read.parquet(src).schema

    stream = with_watermark_dedup(file_stream_source(spark, src, schema), "2 hours")
    query, name = start_available_now(
        stream.select("event_id"), sink_format="memory", output_mode="append"
    )
    await_or_raise(query, 120)
    result = (
        spark.table(name).agg(F.countDistinct("event_id").alias("n_unique_events"))
    ).cache()
    result.count()
    shutil.rmtree(workdir, ignore_errors=True)
    return result


@register(
    "stream_stateful_custom",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY user_id
    """,
    doc="Arbitrary stateful processing via applyInPandasWithState "
    "(streaming/stateful.py): per-user running (count, value-sum) carried "
    "in explicit GroupState across FOUR forced micro-batches "
    "(maxFilesPerTrigger=1 over a 4-file source). The final update-mode "
    "emission per user (struct-argmax on the monotone count) must equal "
    "the batch GROUP BY — state survival across batches is what's checked.",
)
def stream_stateful_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.streaming.ops import await_or_raise, file_stream_source, start_available_now
    from canvas_data_aws_spark.streaming.stateful import running_totals_per_user

    events = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    workdir = tempfile.mkdtemp(prefix="cda_state_")
    src = os.path.join(workdir, "in")
    events.repartition(4).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = running_totals_per_user(
        file_stream_source(spark, src, schema, max_files_per_trigger=1)
    )
    query, name = start_available_now(stream, sink_format="memory", output_mode="update")
    await_or_raise(query, 120)
    result = (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_value")).alias("s"))
        .select(
            "user_id",
            F.col("s.n_events").alias("n_events"),
            F.col("s.total_value").alias("total_value"),
        )
    ).cache()
    result.count()
    shutil.rmtree(workdir, ignore_errors=True)
    return result


@register(
    "stream_stateful_upsert",
    """
    SELECT event_id, user_id, value + 1000 AS value
    FROM events WHERE event_id < 100
    """,
    doc="Snapshot-mirror upsert via foreachBatch (the delete/replace "
    "semantics of sync-canvas-data-files.py:104-112): same keys delivered "
    "twice with bumped values — last writer wins, no duplicates.",
)
def stream_stateful_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.streaming.ops import await_or_raise, file_stream_source, foreach_batch_upsert

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 100)
        .select("event_id", "user_id", "value")
    )
    workdir = tempfile.mkdtemp(prefix="cda_upsert_")
    curated = os.path.join(workdir, "curated")
    upsert = foreach_batch_upsert(curated, ["event_id"])
    schema = None
    for round_no, batch in enumerate([ev, ev.withColumn("value", F.col("value") + 1000)]):
        src = os.path.join(workdir, f"in{round_no}")
        batch.write.mode("overwrite").parquet(src)
        schema = schema or spark.read.parquet(src).schema
        q = (
            file_stream_source(spark, src, schema)
            .writeStream.foreachBatch(upsert)
            .option("checkpointLocation", os.path.join(workdir, f"ck{round_no}"))
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, 120)
    result = spark.read.parquet(curated).cache()
    result.count()
    shutil.rmtree(workdir, ignore_errors=True)
    return result


@register(
    "udf_scalar_pandas",
    """
    SELECT doc_id,
           CAST(LENGTH(text) AS BIGINT) AS n_chars_udf,
           LOWER(substr(text, 1, 10))   AS prefix_udf
    FROM documents
    """,
    doc="Arrow-vectorized scalar pandas UDF (Series->Series): the Python "
    "crossing itself is value-checked against pure SQL.",
)
def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(LongType())
    def n_chars(texts: pd.Series) -> pd.Series:
        return texts.str.len().astype("int64")

    @F.pandas_udf(StringType())
    def prefix10(texts: pd.Series) -> pd.Series:
        return texts.str.slice(0, 10).str.lower()

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", n_chars("text").alias("n_chars_udf"), prefix10("text").alias("prefix_udf")
    )


@register(
    "udaf_grouped_agg",
    """
    SELECT event_type,
           ROUND(AVG(value), 4) AS avg_value,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY event_type
    """,
    doc="Grouped-aggregate pandas UDF (Series->scalar under groupBy.agg): "
    "Arrow-batched partial state per group.",
)
def udaf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(DoubleType())
    def avg_udaf(v: pd.Series) -> float:
        return round(float(v.mean()), 4)

    @F.pandas_udf(DoubleType())
    def sum_udaf(v: pd.Series) -> float:
        return round(float(v.sum()), 2)

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        avg_udaf("value").alias("avg_value"), sum_udaf("value").alias("sum_value")
    )


@register(
    "udtf_flatmap",
    """
    WITH words AS (
      SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ws
      FROM documents
    )
    SELECT doc_id,
           CAST(pos - 1 AS INT) AS token_no,
           w AS token
    FROM (SELECT doc_id, unnest(ws[1:5]) AS w,
                 generate_subscripts(ws[1:5], 1) AS pos
          FROM words)
    """,
    doc="UDTF-style 1:N expansion via mapInPandas: each document emits its "
    "first 5 tokens as rows (the flatMap shape a tokenizer pipeline uses).",
)
def udtf_flatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import IntegerType

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("token_no", IntegerType()),
            StructField("token", StringType()),
        ]
    )

    import re

    def _tokens(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, pos, toks = [], [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                ws = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
                for i, w in enumerate(ws[:5]):
                    ids.append(did)
                    pos.append(i)
                    toks.append(w)
            yield pd.DataFrame({"doc_id": ids, "token_no": pos, "token": toks})

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(_tokens, out_schema)


@register(
    "stream_transform_with_state",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total_value,
           MIN(ts) AS first_ts
    FROM events
    GROUP BY user_id
    """,
    doc="Arbitrary stateful processing via transformWithStateInPandas — "
    "Spark 4's typed-state successor to applyInPandasWithState "
    "(streaming/stateful.py::user_profile_transform_with_state): per-user "
    "(count, value-sum, first-seen ts) held in a named ValueState across "
    "FOUR forced micro-batches (maxFilesPerTrigger=1). Final update-mode "
    "emission per user (argmax on the monotone count) must equal the "
    "batch GROUP BY — state survival AND the first-seen minimum across "
    "batch boundaries are both value-checked. Containers without the "
    "protobuf runtime transformWithState needs fall back to an "
    "applyInPandasWithState twin with identical output (dependency gate, "
    "streaming/stateful.py::user_profile_stateful).",
)
def stream_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.streaming.ops import await_or_raise, file_stream_source, start_available_now
    from canvas_data_aws_spark.streaming.stateful import user_profile_stateful

    events = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    workdir = tempfile.mkdtemp(prefix="cda_tws_")
    src = os.path.join(workdir, "in")
    events.repartition(4).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = user_profile_stateful(
        file_stream_source(spark, src, schema, max_files_per_trigger=1)
    )
    query, name = start_available_now(stream, sink_format="memory", output_mode="update")
    await_or_raise(query, 120)
    result = (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_value", "first_ts")).alias("s"))
        .select(
            "user_id",
            F.col("s.n_events").alias("n_events"),
            F.col("s.total_value").alias("total_value"),
            F.col("s.first_ts").alias("first_ts"),
        )
    ).cache()
    result.count()
    shutil.rmtree(workdir, ignore_errors=True)
    return result


@register(
    "udtf_sentence_split",
    """
    WITH sents AS (
      SELECT doc_id, string_split(text, '.') AS parts FROM documents
    )
    SELECT doc_id,
           CAST(pos - 1 AS INT) AS sentence_no,
           trim(s) AS sentence,
           CAST(length(trim(s)) AS INT) AS n_chars
    FROM (SELECT doc_id, unnest(parts) AS s,
                 generate_subscripts(parts, 1) AS pos
          FROM sents)
    WHERE length(trim(s)) > 0
    """,
    doc="Native Python UDTF (Spark 4 @udtf class API — eval() yields "
    "output rows per input row): sentence segmentation of each document, "
    "emitting (sentence_no, sentence, n_chars). Lateral-joined per row, "
    "Arrow-batched (spark.sql.execution.pythonUDTF.arrow.enabled), "
    "row-local — zero shuffle, the 1:N expansion shape at its most "
    "idiomatic. Complements udtf_flatmap's mapInPandas formulation with "
    "the first-class UDTF surface.",
    tags=("udf",),
)
def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")

    @udtf(returnType="sentence_no int, sentence string, n_chars int")
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            for i, raw in enumerate(text.split(".")):
                s = raw.strip()
                if s:
                    yield i, s, len(s)

    SentenceSplit_reg = SentenceSplit  # local name; shipped by value
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.lateralJoin(
        SentenceSplit_reg(F.col("text").outer())
    ).select("doc_id", "sentence_no", "sentence", "n_chars")
