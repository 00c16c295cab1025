"""B.6 sorts/limits/top-k + B.7 set operations (SURVEY.md §2).

Determinism note: a LIMIT without a total order is nondeterministic, so
every limit here sits on a fully tie-broken ORDER BY — Catalyst fuses the
pair into TakeOrderedAndProject (per-partition top-k + driver merge; no
global sort materialization at any scale).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from canvas_data_aws_spark.plans.registry import register
from canvas_data_aws_spark.sources.parquet import load_table


@register(
    "sort_global",
    """
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC NULLS LAST, o_orderkey
    LIMIT 100
    """,
    doc="Global multi-key sort with NULLS LAST (range-partitioned exchange; "
    "the trailing LIMIT makes order observable to the order-insensitive hash).",
)
def sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .limit(100)
    )


@register(
    "sort_partition_local",
    "SELECT l_orderkey, l_linenumber FROM lineitem",
    doc="Per-partition sort (sortWithinPartitions): no exchange, no global "
    "order — result set equals the input, which is exactly what the "
    "order-insensitive oracle checks.",
)
def sort_partition_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber")
        .sortWithinPartitions("l_orderkey", "l_linenumber")
    )


@register(
    "limit_n",
    """
    SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey LIMIT 10
    """,
    doc="LIMIT n over a pinned order (unordered LIMIT is nondeterministic by "
    "definition and cannot be oracle-checked).",
)
def limit_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "nation")
        .orderBy("n_nationkey")
        .select("n_nationkey", "n_name")
        .limit(10)
    )


@register(
    "topk_order_limit",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 25
    """,
    doc="ORDER BY ... LIMIT k fused to TakeOrderedAndProject: k rows per "
    "partition, heap-merged at the driver — no global sort even at 100 TB.",
)
def topk_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(25)
    )


def _seg(df: DataFrame, seg: str) -> DataFrame:
    return df.filter(F.col("c_mktsegment") == seg).select("c_nationkey")


@register(
    "set_union_all",
    """
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
    doc="Bag union (no dedup shuffle).",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return _seg(c, "BUILDING").unionAll(_seg(c, "MACHINERY"))


@register(
    "set_union_distinct",
    """
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
    doc="UNION (distinct): union + hash-dedup.",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return _seg(c, "BUILDING").union(_seg(c, "MACHINERY")).distinct()


@register(
    "set_intersect",
    """
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT ALL
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
    doc="INTERSECT ALL (multiset semantics: min of per-side multiplicities).",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return _seg(c, "BUILDING").intersectAll(_seg(c, "MACHINERY"))


@register(
    "set_except",
    """
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT ALL
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
    doc="EXCEPT ALL (multiset difference).",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return _seg(c, "BUILDING").exceptAll(_seg(c, "MACHINERY"))
