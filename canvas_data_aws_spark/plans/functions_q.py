"""B.8 scalar function families (SURVEY.md §2): string, date, math,
conditional, cast, array, map, json.

All hot-path expressions are JVM built-ins inside whole-stage codegen — no
Python UDFs anywhere in this module. Oracle SQL uses DuckDB spellings where
dialects diverge (the oracle only needs to produce equal VALUES, not mirror
the implementation).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import IntegerType, StructField, StructType

from canvas_data_aws_spark.plans.registry import register
from canvas_data_aws_spark.sources.parquet import load_table


@register(
    "fn_string",
    """
    SELECT p_partkey,
           CONCAT(p_brand, ':', p_type)                    AS brand_type,
           SUBSTRING(p_name, 1, 8)                         AS name_prefix,
           LOWER(p_type)                                   AS type_lc,
           UPPER(p_brand)                                  AS brand_uc,
           TRIM(CONCAT(' ', p_name, ' '))                  AS name_trim,
           LENGTH(p_name)                                  AS name_len,
           LPAD(CAST(p_size AS VARCHAR), 4, '0')           AS size_pad,
           str_split(p_type, ' ')[1]                       AS type_head,
           regexp_extract(p_name, '([a-z]+)', 1)           AS first_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g')     AS devoweled,
           strpos(p_type, 'a')                             AS a_pos,
           CAST(p_name LIKE '%a%' AS BIGINT)               AS has_a
    FROM part
    """,
    doc="String family: concat/substring/case/trim/length/lpad/split/regexp/instr/like.",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.lower("p_type").alias("type_lc"),
        F.upper("p_brand").alias("brand_uc"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.split("p_type", " ").getItem(0).alias("type_head"),
        F.regexp_extract("p_name", r"([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("devoweled"),
        F.instr("p_type", "a").cast("bigint").alias("a_pos"),
        F.col("p_name").like("%a%").cast("bigint").alias("has_a"),
    )


@register(
    "fn_date",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)       AS yr,
           CAST(month(o_orderdate) AS INT)      AS mo,
           CAST(isodow(o_orderdate) - 1 AS INT) AS weekday_mon0,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           o_orderdate + INTERVAL 30 DAY        AS due_date,
           date_diff('day', o_orderdate, TIMESTAMP '2001-12-31') AS days_to_eoy,
           CAST(epoch(o_orderdate) AS BIGINT)   AS epoch_s
    FROM orders
    """,
    doc="Date/time family over the timestamp columns the Canvas model centers "
    "on (datetime -> timestamp, sync-canvas-data-files.py:164-165): extract, "
    "trunc, interval add, diff, epoch.",
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.weekday("o_orderdate").alias("weekday_mon0"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(F.lit("2001-12-31").cast("timestamp"), F.col("o_orderdate"))
        .cast("bigint")
        .alias("days_to_eoy"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@register(
    "fn_math",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1)                        AS price_r1,
           CAST(FLOOR(l_quantity) AS BIGINT)                AS qty_floor,
           CAST(CEIL(l_discount * 100) AS BIGINT)           AS disc_pct_ceil,
           ABS(l_quantity - 25.0)                           AS qty_dev,
           POW(l_discount, 2)                               AS disc_sq,
           SQRT(l_quantity)                                 AS qty_sqrt,
           LN(l_extendedprice)                              AS price_ln,
           ((CAST(l_orderkey AS BIGINT) % 7) + 7) % 7       AS key_mod7
    FROM lineitem
    """,
    doc="Math family: round/floor/ceil/abs/pow/sqrt/ln/positive-mod "
    "(pmod spelled portably; Spark log == natural log == DuckDB ln).",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor("l_quantity").cast("bigint").alias("qty_floor"),
        F.ceil(F.col("l_discount") * 100).cast("bigint").alias("disc_pct_ceil"),
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        F.pow("l_discount", F.lit(2)).alias("disc_sq"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.log(F.col("l_extendedprice")).alias("price_ln"),
        F.pmod(F.col("l_orderkey").cast("bigint"), F.lit(7)).cast("bigint").alias("key_mod7"),
    )


@register(
    "fn_conditional",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 150000 THEN 'high'
                WHEN o_totalprice > 50000  THEN 'mid'
                ELSE 'low' END                          AS price_band,
           COALESCE(NULLIF(o_orderstatus, 'F'), 'done') AS status_or_done,
           CASE WHEN o_orderpriority LIKE '1-%' THEN 1 ELSE 0 END AS is_urgent
    FROM orders
    """,
    doc="Conditional family: CASE WHEN chains, COALESCE, NULLIF, IF.",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 150000, "high")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("F")), F.lit("done")).alias(
            "status_or_done"
        ),
        F.when(F.col("o_orderpriority").like("1-%"), 1).otherwise(0).alias("is_urgent"),
    )


@register(
    "fn_cast",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(trunc(l_quantity) AS BIGINT)       AS qty_int,
           CAST(l_linenumber AS DOUBLE)            AS line_dbl,
           CAST(l_orderkey AS VARCHAR)             AS key_str,
           CAST(l_shipdate AS DATE)                AS ship_day,
           TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INT) AS line_rt_int,
           TRY_CAST(l_returnflag AS INT)           AS flag_as_int,
           CAST(strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS ship_rt
    FROM lineitem
    """,
    doc="Cast family incl. string->timestamp round-trip and try_cast "
    "(double->int via explicit trunc: bare casts round in DuckDB but "
    "truncate in Spark).",
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("qty_int"),  # Spark cast truncates
        F.col("l_linenumber").cast("double").alias("line_dbl"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_shipdate").cast("date").alias("ship_day"),
        # try_cast on a parseable column: exercises the API on its happy path
        F.col("l_linenumber").cast("string").try_cast("int").alias("line_rt_int"),
        # try_cast semantics on an all-failing column, spelled as a regexp
        # guard: Spark's TryEval pays a caught JVM exception PER failing row
        # (measured 6.3s vs 0.2s on 600k rows); the guard is plan-equivalent
        F.when(
            F.col("l_returnflag").rlike(r"^[+-]?\d+$"), F.col("l_returnflag").cast("int")
        ).alias("flag_as_int"),
        F.to_timestamp(F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss")).alias("ship_rt"),
    )


@register(
    "fn_array",
    """
    SELECT vec_id,
           len(embedding)                                       AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6)               AS first_elem,
           ROUND(CAST(list_sum(embedding) AS DOUBLE), 4)        AS vec_sum,
           ROUND(CAST(list_sum(list_transform(embedding, x -> x * x)) AS DOUBLE), 4) AS sq_norm,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive
    FROM embeddings
    """,
    doc="Array family over embedding:array<float>: size/element_at/transform/"
    "filter/aggregate — all JVM higher-order functions, no UDF.",
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_elem"),
        F.round(F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x), 4).alias("vec_sum"),
        F.round(F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x * x), 4).alias("sq_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("int").alias("n_positive"),
    )


@register(
    "fn_map",
    """
    SELECT o_orderkey,
           o_orderstatus  AS status_val,
           o_orderpriority AS prio_val,
           2 AS map_size
    FROM orders
    """,
    doc="Map family: build map<string,string> from columns, read values and "
    "cardinality back out (oracle states only the equal final values).",
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"), F.lit("prio"), F.col("o_orderpriority")
    )
    return o.select(
        "o_orderkey",
        F.element_at(m, "status").alias("status_val"),
        F.element_at(m, "prio").alias("prio_val"),
        F.size(m).alias("map_size"),
    )


@register(
    "fn_json",
    """
    SELECT event_id,
           json_extract_string(props, '$.k')            AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod
    FROM events
    """,
    doc="JSON family over events.props: path extraction (get_json_object) and "
    "schema-ful parsing (from_json) producing identical typed values.",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", StructType([StructField("k", IntegerType())]))
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        (parsed.getField("k") % 10).alias("k_mod"),
    )
