"""Scale-linter tests: synthetic anti-pattern plans must trip the matching
finding, clean plans must not, and — the dogfood gate — every registered
query must pass ``assert_scale_safe`` (errors only) with a short explicit
allowlist for queries whose whole point is the flagged shape."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from canvas_data_aws_spark.plans.linter import (
    ScaleLintError,
    assert_scale_safe,
    lint,
)
from canvas_data_aws_spark.plans.registry import all_queries
from canvas_data_aws_spark.sources.parquet import load_table


def _codes(df):
    return {f.code for f in lint(df)}


def test_cartesian_product_flagged(spark, sf_dir):
    a = load_table(spark, sf_dir, "nation")
    b = load_table(spark, sf_dir, "region")
    df = a.crossJoin(b)
    codes = _codes(df)
    assert codes & {"cartesian-product", "nested-loop-join"}, codes
    with pytest.raises(ScaleLintError):
        assert_scale_safe(df)
    # ...and the explicit opt-out works
    assert_scale_safe(df, allow={"cartesian-product", "nested-loop-join"})


def test_single_partition_window_flagged(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.orderBy("l_orderkey")  # no partitionBy: one giant partition
    df = li.withColumn("rn", F.row_number().over(w))
    assert "single-partition-window" in _codes(df)


def test_partitioned_window_not_flagged(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    df = li.withColumn("rn", F.row_number().over(w))
    assert "single-partition-window" not in _codes(df)


def test_row_python_udf_flagged(spark, sf_dir):
    from pyspark.sql.types import LongType

    slow = F.udf(lambda x: x + 1, LongType(), useArrow=False)
    df = load_table(spark, sf_dir, "nation").select(slow("n_nationkey").alias("k"))
    assert "python-row-udf" in _codes(df)


def test_clean_aggregate_plan_is_quiet(spark, sf_dir):
    df = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 10)
        .groupBy("l_returnflag")
        .agg(F.sum("l_extendedprice").alias("s"))
    )
    findings = assert_scale_safe(df)
    assert not [f for f in findings if f.severity == "error"]
    assert "single-partition-window" not in {f.code for f in findings}


# Queries whose flagged shape is the query's documented point:
#   join_cross          — the cross-join operator itself (bounded dims)
#   join_theta_nonequi  — nonequi theta join over bounded sides (BNLJ by
#                         construction; audit asserts no *cartesian*)
_ALLOW: dict[str, set[str]] = {
    "join_cross": {"cartesian-product", "nested-loop-join"},
    "join_theta_nonequi": {"nested-loop-join"},
}


def _registry_names():
    return sorted(all_queries().keys())


def pytest_generate_tests(metafunc):
    if "lint_qname" in metafunc.fixturenames:
        metafunc.parametrize("lint_qname", _registry_names())


def test_registry_query_is_scale_safe(lint_qname, spark, sf_dir):
    q = all_queries()[lint_qname]
    df = q.fn(spark, sf_dir)
    assert_scale_safe(df, allow=_ALLOW.get(lint_qname, set()))
