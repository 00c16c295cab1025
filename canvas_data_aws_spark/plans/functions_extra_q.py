"""Scalar-function tail: cryptographic hashes (cross-engine exact), URL
parsing, and ordered string aggregation."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from canvas_data_aws_spark.plans.registry import register
from canvas_data_aws_spark.sources.parquet import load_table


@register(
    "fn_hash",
    """
    SELECT doc_id,
           md5(text)                         AS md5_hex,
           sha256(text)                      AS sha256_hex,
           substr(sha256(lang || ':' || source), 1, 16) AS salt16
    FROM documents
    """,
    doc="Cryptographic digest family (md5/sha2-256): standardized, so the "
    "hex output is bit-identical across engines — the only hash family with "
    "an exact oracle (murmur/xxhash are engine-specific).",
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.sha2(F.col("text"), 256).alias("sha256_hex"),
        F.substring(F.sha2(F.concat_ws(":", "lang", "source"), 256), 1, 16).alias("salt16"),
    )


@register(
    "fn_url",
    """
    SELECT event_id,
           'events.example.com'                                  AS host,
           '/track/' || event_type                               AS path,
           'u=' || CAST(user_id AS VARCHAR)                      AS query,
           CAST(user_id AS VARCHAR)                              AS u_param
    FROM events
    """,
    doc="URL parsing (parse_url HOST/PATH/QUERY + keyed query param) over "
    "URLs fabricated from event columns; the oracle states the equal "
    "components directly.",
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    url = F.concat(
        F.lit("https://events.example.com/track/"),
        F.col("event_type"),
        F.lit("?u="),
        F.col("user_id").cast("string"),
    )
    return ev.select(
        "event_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("u")).alias("u_param"),
    )


@register(
    "agg_string_agg",
    """
    SELECT c_nationkey,
           string_agg(c_mktsegment, '|' ORDER BY c_mktsegment) AS segments
    FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer)
    GROUP BY c_nationkey
    """,
    doc="Ordered string aggregation (listagg/string_agg): distinct segments "
    "per nation joined in sorted order for determinism.",
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.sort_array(F.collect_list("c_mktsegment")), "|").alias("segments")
    )
