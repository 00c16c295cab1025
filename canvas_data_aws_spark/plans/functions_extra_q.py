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


@register(
    "fn_variant",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT)     AS k_int,
           CAST(json_extract_string(props, '$.k') AS DOUBLE)  AS k_dbl,
           json_extract_string(props, '$.missing') IS NULL    AS missing_is_null,
           CAST(CAST(json_extract_string(props, '$.k') AS INT) >= 50
                AS BOOLEAN)                                   AS k_high
    FROM events
    """,
    doc="Spark 4 VARIANT surface over events.props: parse_json into the "
    "shredded binary VARIANT type, then typed path extraction with "
    "variant_get — the open-format semi-structured column (the same "
    "engine path Iceberg/Delta variant columns use), distinct from "
    "fn_json's string-walking get_json_object/from_json: VARIANT parses "
    "ONCE per row into a binary encoding every subsequent extraction "
    "reads without re-tokenizing, the right shape when many paths are "
    "pulled from the same large document at 100 TB. Missing paths yield "
    "typed NULLs (checked), numerics extract at int and double width "
    "from one encoding. Oracle mirrors with DuckDB json_extract.",
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k_int"),
        F.expr("variant_get(parse_json(props), '$.k', 'double')").alias("k_dbl"),
        F.expr("variant_get(parse_json(props), '$.missing', 'string')")
        .isNull()
        .alias("missing_is_null"),
        (F.expr("variant_get(parse_json(props), '$.k', 'int')") >= 50).alias("k_high"),
    )


@register(
    "fn_xml",
    """
    SELECT event_id,
           event_type AS xml_event_type,
           value      AS xml_value,
           TRUE       AS has_type_tag
    FROM events
    """,
    doc="Spark 4 XML surface: to_xml renders a struct per row, from_xml "
    "parses it back under an explicit schema, and the query ships the "
    "ROUNDTRIPPED fields — so the oracle is the identity projection, "
    "proving parse(render(x)) == x value-exactly for string and double "
    "fields (the same roundtrip-oracle trick a renderer-less second "
    "engine allows; DuckDB has no XML functions to mirror the "
    "intermediate string, which never leaves the plan). has_type_tag "
    "additionally asserts the rendered form really contains the field "
    "element, pinning that to_xml emitted markup rather than a no-op.",
)
def fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DoubleType, StructField, StructType

    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql.types import StringType

    schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    rendered = F.to_xml(F.struct("event_type", "value"))
    parsed = F.from_xml(rendered, schema)
    return ev.select(
        "event_id",
        parsed.getField("event_type").alias("xml_event_type"),
        parsed.getField("value").alias("xml_value"),
        rendered.contains("<event_type>").alias("has_type_tag"),
    )
