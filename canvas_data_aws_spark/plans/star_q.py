"""Composite analyst queries over the star schema — the workload shape the
reference's users actually run against their warehouse (fact ⋈ dims with
aggregation; SURVEY.md §1.1: classic relational star schema over flat
files). Each composes many §2 operators in one plan; physically they are
broadcast-dim chains over a single fact scan + one aggregation shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from canvas_data_aws_spark.plans.registry import register
from canvas_data_aws_spark.sources.parquet import load_table


@register(
    "star_revenue_by_nation",
    """
    SELECT r.r_name AS region_name,
           n.n_name AS nation_name,
           CAST(year(o.o_orderdate) AS INT) AS order_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY r.r_name, n.n_name, year(o.o_orderdate)
    """,
    doc="TPC-H Q5-shaped 5-way star join: one fact scan; the spec-bounded "
    "dims (nation=25, region=5 rows at every SF) are broadcast by hint, "
    "while CUSTOMER — a dim that GROWS with the data — carries no hint: "
    "AQE broadcasts it at small scale and switches to a shuffle join when "
    "its measured size says so (a hard-coded hint would pin the 100 TB "
    "plan to an executor-OOM broadcast).",
    tags=("star",),
)
def star_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
            F.year("o_orderdate").alias("order_year"),
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "star_top_customers",
    """
    SELECT c.c_custkey, c.c_name,
           COUNT(DISTINCT o.o_orderkey) AS n_orders,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 10
    """,
    doc="TPC-H Q18-shaped: fact-fact join + grouped revenue + top-k. "
    "Plan shape: lineitem pre-aggregates to per-order revenue BEFORE any "
    "join (map-side combine on l_orderkey shrinks the fact shuffle to one "
    "row per order and turns COUNT(DISTINCT o_orderkey) into a plain "
    "count), then the per-customer rollup joins the customer dim with no "
    "forced hint — customer grows with the data, so the join strategy is "
    "left to AQE's measured sizes. Measured 2x vs the naive "
    "join-then-countDistinct at sf0.1; at 100 TB the pre-aggregation is "
    "the difference between shuffling line items and shuffling orders.",
    tags=("star",),
)
def star_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    per_order = l.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("ord_rev")
    )
    per_cust = (
        per_order.join(o.select("o_orderkey", "o_custkey"), per_order.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("ord_rev"), 2).alias("revenue"),
        )
    )
    return (
        per_cust.join(c.select("c_custkey", "c_name"), per_cust.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "n_orders", "revenue")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(10)
    )


@register(
    "star_part_type_share",
    """
    SELECT CAST(date_trunc('month', l.l_shipdate) AS TIMESTAMP) AS ship_month,
           ROUND(
             100.0 * SUM(CASE WHEN p.p_type LIKE 'a%' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
                   / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS type_a_share_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
    doc="TPC-H Q14-shaped conditional-share query: part dim join (no "
    "forced broadcast — part grows with the data, AQE picks the strategy "
    "from measured sizes), CASE-gated ratio aggregate per ship month.",
    tags=("star",),
)
def star_part_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            F.round(
                100.0 * F.sum(F.when(F.col("p_type").like("a%"), net).otherwise(0.0)) / F.sum(net),
                4,
            ).alias("type_a_share_pct")
        )
    )


@register(
    "star_event_engagement",
    """
    SELECT c.c_mktsegment,
           e.event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(e.value), 2) AS total_value,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment, e.event_type
    """,
    doc="Event-stream-to-dimension join (events.user_id -> customer): the "
    "engagement rollup a Canvas 'requests'-style fact feeds. Customer "
    "grows with the data, so no forced broadcast — AQE chooses from "
    "measured sizes.",
    tags=("star",),
)
def star_event_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    return (
        e.join(c, e.user_id == c.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "star_docs_embeddings",
    """
    SELECT e.label,
           d.lang,
           COUNT(*) AS n_docs,
           CAST(SUM(d.n_chars) AS BIGINT) AS total_chars,
           ROUND(AVG(len(e.embedding)), 2) AS avg_dim
    FROM documents d
    JOIN embeddings e ON e.vec_id = d.doc_id
    GROUP BY e.label, d.lang
    """,
    doc="Text-corpus ⋈ embedding-table join (1:1 by id): the metadata "
    "rollup a training-data pipeline runs before export.",
    tags=("star",),
)
def star_docs_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    return (
        d.join(e, e.vec_id == d.doc_id)
        .groupBy("label", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.round(F.avg(F.size("embedding")), 2).alias("avg_dim"),
        )
    )
