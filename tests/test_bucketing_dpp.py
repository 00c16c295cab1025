"""The two storage-layout scale levers beyond partitionBy (SURVEY.md §7 M7):

- bucketed co-located joins: both fact tables bucketed on the join key =>
  the join runs with NO shuffle exchange at all;
- dynamic partition pruning: a dim-side filter prunes fact partitions at
  runtime via a reused subquery broadcast.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from canvas_data_aws_spark.plans.audit import explain_str
from canvas_data_aws_spark.sources.parquet import load_table


@pytest.fixture()
def warehouse(spark):
    # warehouse.dir is a static conf — bucketed tables land in the session's
    # default spark-warehouse (gitignored) and are dropped afterwards
    yield spark
    for t in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS default.`{t}`")


def test_bucketed_join_has_no_exchange(warehouse, sf_dir):
    spark = warehouse
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
    )
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    bl, bo = spark.table("b_lineitem"), spark.table("b_orders")
    joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey)

    plan = explain_str(joined)
    # co-located buckets: the join must not shuffle either side
    assert "Exchange hashpartitioning" not in plan, plan[:2500]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan

    # and it still returns the right answer
    expected = (
        load_table(spark, sf_dir, "lineitem")
        .join(load_table(spark, sf_dir, "orders"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert joined.count() == expected


def test_dynamic_partition_pruning(warehouse, sf_dir, tmp_path):
    spark = warehouse
    fact_path = str(tmp_path / "fact_by_status")
    orders = load_table(spark, sf_dir, "orders")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(fact_path)
    fact = spark.read.parquet(fact_path)

    # literal dim filter: Catalyst propagates the constraint STATICALLY into
    # the fact scan's PartitionFilters — pruning without even a subquery
    dim = (
        orders.select(F.col("o_orderstatus").alias("status")).distinct()
        .filter(F.col("status") == "F")
    )
    joined = fact.join(dim, fact.o_orderstatus == dim.status)
    plan = explain_str(joined)
    pf_lines = [ln for ln in plan.splitlines() if "PartitionFilters:" in ln]
    assert any("o_orderstatus" in ln and "= F" in ln for ln in pf_lines), plan[:2500]
    assert joined.count() == orders.filter(F.col("o_orderstatus") == "F").count()

    # non-literal dim filter: the partition set is only known at runtime ->
    # dynamic partition pruning inserts a dynamicpruning subquery
    dim2 = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderstatus").alias("status"))
        .distinct()
    )
    joined2 = fact.join(dim2, fact.o_orderstatus == dim2.status)
    plan2 = explain_str(joined2)
    assert "dynamicpruning" in plan2.lower(), plan2[:2500]
