"""Warehouse-maintenance operators: MERGE-style upsert reconciliation and
graph triangle counting — declarative join plans with exact SQL oracles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from canvas_data_aws_spark.plans.registry import register
from canvas_data_aws_spark.sources.parquet import load_table


@register(
    "table_merge_upsert",
    """
    WITH target AS (
      SELECT o_orderkey, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 3 = 0
    ),
    source AS (
      SELECT o_orderkey, o_totalprice * 1.1 AS new_price
      FROM orders WHERE o_orderkey % 2 = 0
    )
    SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
           COALESCE(s.new_price, t.o_totalprice) AS o_totalprice,
           COALESCE(t.o_orderstatus, 'N') AS o_orderstatus,
           CASE WHEN t.o_orderkey IS NULL THEN 'insert'
                WHEN s.o_orderkey IS NULL THEN 'keep'
                ELSE 'update' END AS merge_action
    FROM target t FULL OUTER JOIN source s ON t.o_orderkey = s.o_orderkey
    """,
    doc="MERGE INTO semantics (upsert) as one full-outer join: matched rows "
    "take the source value, unmatched-target rows persist, unmatched-source "
    "rows insert — the lakehouse table-maintenance primitive. One shuffle "
    "on the merge key; at 100 TB both sides are bucketed/partitioned on "
    "that key so the merge is co-located (see join_bucketed_colocated).",
    tags=("warehouse",),
)
def table_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    target = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    source = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("s_orderkey"),
        (F.col("o_totalprice") * 1.1).alias("new_price"),
    )
    merged = target.join(
        source, target.o_orderkey == source.s_orderkey, "full_outer"
    )
    return merged.select(
        F.coalesce("o_orderkey", "s_orderkey").alias("o_orderkey"),
        F.coalesce("new_price", "o_totalprice").alias("o_totalprice"),
        F.coalesce("o_orderstatus", F.lit("N")).alias("o_orderstatus"),
        F.when(F.col("o_orderkey").isNull(), "insert")
        .when(F.col("s_orderkey").isNull(), "keep")
        .otherwise("update")
        .alias("merge_action"),
    )


@register(
    "graph_triangle_count",
    """
    WITH edges AS (
      SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT (SELECT COUNT(*) FROM edges) AS n_edges,
           (SELECT COUNT(*)
            FROM edges e1
            JOIN edges e2 ON e1.pb = e2.pa
            JOIN edges e3 ON e3.pa = e1.pa AND e3.pb = e2.pb) AS n_triangles
    """,
    doc="Triangle count over the part co-purchase graph (parts sharing an "
    "order): canonical ordered-edge (a<b<c) three-way self-join — each "
    "triangle matched exactly once. At 100 TB the standard refinement is "
    "degree orientation (direct edges low->high degree) so wedge fan-out "
    "is bounded by sqrt(2|E|) per node instead of max degree; the join "
    "shape (two equi-joins on node ids) is unchanged.",
    tags=("warehouse", "graph"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .distinct()
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.pb") == F.col("e2.pa"))
        .join(
            e3,
            (F.col("e3.pa") == F.col("e1.pa")) & (F.col("e3.pb") == F.col("e2.pb")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )
    return edges.agg(F.count("*").alias("n_edges")).crossJoin(tri)
