"""Scale-machinery queries: the M7 operators (skew salting, compaction)
exercised through the oracle gate — both are result-preserving transforms,
so their oracles are the plain-layout equivalents."""

from __future__ import annotations

import hashlib
import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from canvas_data_aws_spark.ingest.compaction import compact_table
from canvas_data_aws_spark.operators.skew import salted_join
from canvas_data_aws_spark.plans.registry import register
from canvas_data_aws_spark.sources.parquet import load_table


@register(
    "join_salted_hot_key",
    """
    WITH hot AS (
      SELECT l_orderkey,
             CASE WHEN l_orderkey % 3 = 0 THEN 1 ELSE l_suppkey END AS l_suppkey,
             l_quantity
      FROM lineitem
    )
    SELECT h.l_suppkey,
           s.s_name,
           COUNT(*) AS n_items,
           ROUND(SUM(h.l_quantity), 2) AS total_qty
    FROM hot h
    JOIN supplier s ON s.s_suppkey = h.l_suppkey
    GROUP BY h.l_suppkey, s.s_name
    """,
    doc="Salted join under a fabricated hot key (30% of the fact lands on "
    "one supplier): salting spreads the key over 8 salts; the oracle is the "
    "plain join — salting must be result-invisible.",
)
def join_salted_hot_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.when(F.col("l_orderkey") % 3 == 0, F.lit(1))
        .otherwise(F.col("l_suppkey"))
        .alias("l_suppkey"),
        "l_quantity",
    )
    sup = load_table(spark, sf_dir, "supplier").withColumnRenamed("s_suppkey", "l_suppkey")
    joined = salted_join(li, sup, ["l_suppkey"], num_salts=8, fact_id_cols=["l_orderkey", "l_suppkey"])
    return joined.groupBy("l_suppkey", "s_name").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
    )


@register(
    "compaction_curated_zone",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="Raw->curated compaction (partitioned, file-sized parquet) then a "
    "partition-pruned aggregate over the curated zone; the oracle reads the "
    "original table — compaction must be lossless.",
)
def compaction_curated_zone(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    out = os.path.join(tempfile.gettempdir(), f"cda_compact_{tag}", "orders")
    compact_table(orders, out, partition_by=["o_orderstatus"], target_rows_per_file=100_000)
    curated = spark.read.parquet(out)
    return curated.groupBy(F.col("o_orderstatus").cast("string").alias("o_orderstatus")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )
