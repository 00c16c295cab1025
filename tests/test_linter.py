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
    findings = {f.code: f.severity for f in lint(df)}
    # promoted to ERROR (round-5 verdict): the shape must fail the gate
    assert findings.get("single-partition-window") == "error"
    with pytest.raises(ScaleLintError):
        assert_scale_safe(df)


def test_unbounded_broadcast_flagged(spark, sf_dir):
    # Broadcast of a raw, unfiltered FACT scan: nothing bounds its size.
    # (Regression test for the dead-check bug: every FileScan line contains
    # the substring "Filter" via PushedFilters:/PartitionFilters:, so a
    # substring test can never fire — the check must prefix-match nodes.)
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    df = o.join(F.broadcast(li), o.o_orderkey == li.l_orderkey)
    assert "unbounded-broadcast" in _codes(df)


def test_unbounded_broadcast_left_side_flagged(spark, sf_dir):
    # hint provenance must work for BOTH join sides (leftHint=/rightHint=)
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    df = F.broadcast(li).join(o, o.o_orderkey == li.l_orderkey)
    assert "unbounded-broadcast" in _codes(df)


def test_bounded_broadcast_not_flagged(spark, sf_dir):
    # A filtered build side is bounded-by-intent; a declared dimension
    # (nation: 25 rows at every scale factor) is bounded by the spec.
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    filtered = o.filter(F.col("o_orderstatus") == "F")
    assert "unbounded-broadcast" not in _codes(
        li.join(F.broadcast(filtered), li.l_orderkey == filtered.o_orderkey)
    )
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    assert "unbounded-broadcast" not in _codes(
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )


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
#   orders_pareto_share — the one single-partition window runs over the
#                         group-reduced DECILE table (<= 10 rows by
#                         construction: the bucket domain is 1..10); the
#                         customer-sized input is bucketed by broadcast
#                         percentile cutpoints, never globally sorted
_ALLOW: dict[str, set[str]] = {
    "join_cross": {"cartesian-product", "nested-loop-join"},
    "join_theta_nonequi": {"nested-loop-join"},
    "orders_pareto_share": {"single-partition-window"},
    # the global-merge window runs over the b x days CENTROID table
    # (state-bounded, never data-sized — operators/quantiles.py), and the
    # only data-sized global sort is the truth_at_rank oracle
    # instrumentation the entry's docstring declares
    "sketch_quantile_digest": {"single-partition-window"},
    # the day-over-day LAG runs over the ONE-ROW-PER-DAY p50 table
    # (days-bounded monitor output, never event rows)
    "dq_quantile_drift": {"single-partition-window"},
    # the cumulative-token window runs over the group-reduced STAGE table
    # (<= 3 rows by construction: the stage domain is the fixed q_score
    # bands); the document-sized input only ever sees a row-local scan +
    # map-side-combined agg
    "corpus_curriculum_schedule": {"single-partition-window"},
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
