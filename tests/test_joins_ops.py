"""Semantics tests for the composite join operators (as-of semantics are
pinned in SURVEY.md §7 hard part c: backward inclusive, tie-break desc,
left variant keeps unmatched rows)."""

from __future__ import annotations

import datetime as dt

import pytest

from canvas_data_aws_spark.operators.joins import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-10T00:00:00")),
            (2, 100, _ts("2024-01-05T00:00:00")),
            (3, 200, _ts("2024-01-01T00:00:00")),  # no order at-or-before
            (4, 300, _ts("2024-01-02T00:00:00")),  # key missing from right
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            (10, 100, _ts("2024-01-01T00:00:00")),
            (11, 100, _ts("2024-01-05T00:00:00")),  # exactly-at boundary
            (12, 100, _ts("2024-01-05T00:00:00")),  # tie on ts -> max key wins
            (13, 200, _ts("2024-06-01T00:00:00")),  # only after left ts
        ],
        ["order_id", "cust_id", "odate"],
    )
    return left, right


def test_asof_inner_backward_inclusive_with_ties(frames):
    left, right = frames
    out = asof_join(
        left, right, "user_id", "cust_id", "ts", "odate", tie_breakers=["order_id"], how="inner"
    )
    got = {r["event_id"]: r["order_id"] for r in out.collect()}
    # event 1: latest odate <= 01-10 is 01-05 (tie between 11,12 -> 12)
    # event 2: boundary inclusive at 01-05 -> 12; events 3,4: no match, dropped
    assert got == {1: 12, 2: 12}


def test_asof_left_keeps_unmatched(frames):
    left, right = frames
    out = asof_join(
        left, right, "user_id", "cust_id", "ts", "odate", tie_breakers=["order_id"], how="left"
    )
    got = {r["event_id"]: r["order_id"] for r in out.collect()}
    assert got == {1: 12, 2: 12, 3: None, 4: None}
    # row count preserved: exactly one output row per left row
    assert out.count() == left.count()


def test_asof_tolerance_subsecond_exact(spark):
    # Regression: a whole-second (long-cast) tolerance compare admits right
    # rows up to ~1s OUTSIDE the window when timestamps carry sub-second
    # parts: floor(08.400)=8 >= floor(10.500)-2=8 although the true gap
    # 2.1s exceeds tolerance=2s. The compare must run at microsecond
    # precision, matching pandas merge_asof's exact two-sided interval.
    left = spark.createDataFrame(
        [(1, 100, _ts("2024-01-01T00:00:10.500"))], ["event_id", "user_id", "ts"]
    )
    right = spark.createDataFrame(
        [
            (20, 100, _ts("2024-01-01T00:00:08.400")),  # gap 2.1s: OUT
            (21, 100, _ts("2024-01-01T00:00:08.500")),  # gap exactly 2.0s: IN
        ],
        ["order_id", "cust_id", "odate"],
    )
    out = asof_join(
        left, right, "user_id", "cust_id", "ts", "odate",
        tie_breakers=["order_id"], how="left", tolerance_seconds=2,
    )
    got = {r["event_id"]: r["order_id"] for r in out.collect()}
    assert got == {1: 21}
    # and with only the out-of-window candidate, no match at all
    out2 = asof_join(
        left, right.filter("order_id = 20"), "user_id", "cust_id", "ts", "odate",
        tie_breakers=["order_id"], how="left", tolerance_seconds=2,
    )
    assert {r["event_id"]: r["order_id"] for r in out2.collect()} == {1: None}


def test_asof_nearest_subsecond_distance(spark):
    # nearest must rank candidates by microsecond distance: 0.4s beats 0.6s
    # even though both floor to a 0-second whole gap.
    left = spark.createDataFrame(
        [(1, 100, _ts("2024-01-01T00:00:10.000"))], ["event_id", "user_id", "ts"]
    )
    right = spark.createDataFrame(
        [
            (30, 100, _ts("2024-01-01T00:00:10.600")),
            (31, 100, _ts("2024-01-01T00:00:09.600")),  # closer: 0.4s
        ],
        ["order_id", "cust_id", "odate"],
    )
    out = asof_join(
        left, right, "user_id", "cust_id", "ts", "odate",
        tie_breakers=["order_id"], direction="nearest",
    )
    assert {r["event_id"]: r["order_id"] for r in out.collect()} == {1: 31}
