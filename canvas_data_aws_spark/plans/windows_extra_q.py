"""Window-family completion (cume_dist, nth_value) and value binning
(width_bucket histograms) — the tail of the Athena/Presto analytic surface."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from canvas_data_aws_spark.plans.registry import register
from canvas_data_aws_spark.sources.parquet import load_table


@register(
    "win_cume_nth",
    """
    SELECT o_orderkey,
           ROUND(CUME_DIST() OVER (PARTITION BY o_custkey ORDER BY o_totalprice), 9) AS cume,
           NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_order
    FROM orders
    """,
    doc="cume_dist (deterministic under ties by definition) + nth_value with "
    "an explicit full frame and unique ordering.",
)
def win_cume_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w_price = Window.partitionBy("o_custkey").orderBy("o_totalprice")
    w_date = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        F.round(F.cume_dist().over(w_price), 9).alias("cume"),
        F.nth_value("o_orderkey", 2).over(w_date).alias("second_order"),
    )


@register(
    "agg_histogram",
    """
    SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
                     WHEN o_totalprice >= 400000 THEN 21
                     ELSE 1 + FLOOR(o_totalprice / 20000) END AS INT) AS bucket,
           COUNT(*) AS n_orders,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM orders
    GROUP BY 1
    """,
    doc="Equi-width histogram via width_bucket: one scan, one tiny "
    "aggregation — the profile pass run before choosing bucketing/salting "
    "strategies at scale.",
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.width_bucket("o_totalprice", F.lit(0), F.lit(400000), F.lit(20))
            .cast("int")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )
