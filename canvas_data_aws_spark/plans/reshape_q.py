"""Reshaping + remaining scalar coverage: pivot/unpivot, exact quantiles,
bitwise ops — rounding out the relational surface beyond SURVEY §2's
explicit rows (Athena/Presto expresses these via CASE aggregation and
UNNEST; Spark has first-class operators)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from canvas_data_aws_spark.plans.registry import register
from canvas_data_aws_spark.sources.parquet import load_table


@register(
    "agg_pivot",
    """
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 2) AS qty_F,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 2) AS qty_O,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)    AS n_F,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)    AS n_O
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Pivot (long->wide): explicit pivot values keep the plan a single "
    "aggregate pass (value discovery would add a distinct scan).",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return p.select(
        "l_returnflag",
        F.coalesce(F.col("F_qty"), F.lit(0.0)).alias("qty_F"),
        F.coalesce(F.col("O_qty"), F.lit(0.0)).alias("qty_O"),
        F.coalesce(F.col("F_n"), F.lit(0)).cast("bigint").alias("n_F"),
        F.coalesce(F.col("O_n"), F.lit(0)).cast("bigint").alias("n_O"),
    )


@register(
    "reshape_unpivot",
    """
    SELECT s_suppkey, 'acctbal' AS metric, s_acctbal AS value FROM supplier
    UNION ALL
    SELECT s_suppkey, 'nationkey' AS metric, CAST(s_nationkey AS DOUBLE) AS value FROM supplier
    """,
    doc="Unpivot/melt (wide->long): one pass emitting (key, metric, value) "
    "rows — no join, no shuffle beyond the write.",
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_acctbal"), F.col("s_nationkey").cast("double").alias("s_nationkey")
    )
    return sup.unpivot(
        ids=["s_suppkey"],
        values=["s_acctbal", "s_nationkey"],
        variableColumnName="metric",
        valueColumnName="value",
    ).withColumn(
        "metric",
        F.when(F.col("metric") == "s_acctbal", "acctbal").otherwise("nationkey"),
    )


@register(
    "agg_median_exact",
    """
    SELECT l_returnflag,
           ROUND(median(l_extendedprice), 4)             AS median_price,
           ROUND(quantile_cont(l_quantity, 0.25), 4)     AS q1_qty,
           ROUND(quantile_cont(l_quantity, 0.75), 4)     AS q3_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Exact continuous-interpolation quantiles (median/Q1/Q3) — the "
    "sort-based exact path, vs the GK sketch in agg_approx_percentile.",
)
def agg_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_extendedprice"), 4).alias("median_price"),
        F.round(F.percentile("l_quantity", F.lit(0.25)), 4).alias("q1_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.75)), 4).alias("q3_qty"),
    )


@register(
    "fn_bitwise",
    """
    SELECT l_orderkey, l_linenumber,
           l_orderkey & 255                          AS and_low,
           l_orderkey | 7                            AS or_low,
           xor(l_orderkey, CAST(l_linenumber AS BIGINT)) AS xor_key,
           l_linenumber << 4                         AS shl,
           l_orderkey >> 8                           AS shr,
           CAST(bit_count(l_orderkey) AS INT)        AS popcount
    FROM lineitem
    """,
    doc="Bitwise family: AND/OR/XOR/shifts/popcount (sharding, bloom and "
    "banding primitives elsewhere in the engine).",
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_orderkey").bitwiseAND(F.lit(255)).alias("and_low"),
        F.col("l_orderkey").bitwiseOR(F.lit(7)).alias("or_low"),
        F.col("l_orderkey").bitwiseXOR(F.col("l_linenumber").cast("bigint")).alias("xor_key"),
        F.shiftleft(F.col("l_linenumber"), 4).alias("shl"),
        F.shiftright(F.col("l_orderkey"), 8).alias("shr"),
        F.bit_count(F.col("l_orderkey")).alias("popcount"),
    )
