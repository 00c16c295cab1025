"""Property test: asof_join equals a brute-force per-left-row argmax
computed independently in Python, over randomized key/timestamp data."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from canvas_data_aws_spark.operators.joins import asof_join

_BASE = dt.datetime(2024, 1, 1)

_left_rows = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 50)), min_size=1, max_size=15, unique=True
)
_right_rows = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 50)), min_size=0, max_size=15, unique=True
)

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from canvas_data_aws_spark.session import get_spark

        _spark = get_spark(app_name="cda-prop", master="local[2]", shuffle_partitions=2)
    return _spark


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=_left_rows, right=_right_rows)
def test_asof_left_equals_bruteforce(left, right):
    spark = _get_spark()
    ldf = spark.createDataFrame(
        [(i, k, _BASE + dt.timedelta(hours=h)) for i, (k, h) in enumerate(left)],
        ["lid", "key", "ts"],
    )
    rdf = spark.createDataFrame(
        [(j, k, _BASE + dt.timedelta(hours=h)) for j, (k, h) in enumerate(right)],
        "rid bigint, rkey bigint, rts timestamp",
    )
    out = asof_join(ldf, rdf, "key", "rkey", "ts", "rts", tie_breakers=["rid"], how="left")
    got = {r["lid"]: r["rid"] for r in out.collect()}

    for i, (k, h) in enumerate(left):
        lt = _BASE + dt.timedelta(hours=h)
        cands = [
            (_BASE + dt.timedelta(hours=rh), j)
            for j, (rk, rh) in enumerate(right)
            if rk == k and _BASE + dt.timedelta(hours=rh) <= lt
        ]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, k, h, got[i], want)
    assert len(got) == len(left)  # exactly one row per left row


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=_left_rows, right=_right_rows)
def test_asof_forward_equals_bruteforce(left, right):
    """direction='forward' mirrors the backward property: the EARLIEST right
    row at-or-after each left timestamp, ties to the lowest tie-breaker."""
    spark = _get_spark()
    ldf = spark.createDataFrame(
        [(i, k, _BASE + dt.timedelta(hours=h)) for i, (k, h) in enumerate(left)],
        ["lid", "key", "ts"],
    )
    rdf = spark.createDataFrame(
        [(j, k, _BASE + dt.timedelta(hours=h)) for j, (k, h) in enumerate(right)],
        "rid bigint, rkey bigint, rts timestamp",
    )
    out = asof_join(
        ldf, rdf, "key", "rkey", "ts", "rts",
        tie_breakers=["rid"], how="left", direction="forward",
    )
    got = {r["lid"]: r["rid"] for r in out.collect()}

    for i, (k, h) in enumerate(left):
        lt = _BASE + dt.timedelta(hours=h)
        cands = [
            (_BASE + dt.timedelta(hours=rh), j)
            for j, (rk, rh) in enumerate(right)
            if rk == k and _BASE + dt.timedelta(hours=rh) >= lt
        ]
        want = min(cands)[1] if cands else None
        assert got[i] == want, (i, k, h, got[i], want)
    assert len(got) == len(left)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=_left_rows, right=_right_rows)
def test_asof_nearest_equals_bruteforce(left, right):
    spark = _get_spark()
    ldf = spark.createDataFrame(
        [(i, k, _BASE + dt.timedelta(hours=h)) for i, (k, h) in enumerate(left)],
        ["lid", "key", "ts"],
    )
    rdf = spark.createDataFrame(
        [(j, k, _BASE + dt.timedelta(hours=h)) for j, (k, h) in enumerate(right)],
        "rid bigint, rkey bigint, rts timestamp",
    )
    out = asof_join(
        ldf, rdf, "key", "rkey", "ts", "rts",
        tie_breakers=["rid"], how="left", direction="nearest",
    )
    got = {r["lid"]: r["rid"] for r in out.collect()}

    for i, (k, h) in enumerate(left):
        lt = _BASE + dt.timedelta(hours=h)
        cands = [
            (abs((_BASE + dt.timedelta(hours=rh)) - lt), _BASE + dt.timedelta(hours=rh), j)
            for j, (rk, rh) in enumerate(right)
            if rk == k
        ]
        want = min(cands)[2] if cands else None
        assert got[i] == want, (i, k, h, got[i], want)
    assert len(got) == len(left)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=_left_rows, right=_right_rows, tol_hours=st.integers(0, 20))
def test_asof_tolerance_equals_bruteforce(left, right, tol_hours):
    """tolerance_seconds must equal the brute-force 'latest right at or
    before, but no older than tol' — including the left-row-survives-with-
    NULL case when nothing is inside the window."""
    spark = _get_spark()
    ldf = spark.createDataFrame(
        [(i, k, _BASE + dt.timedelta(hours=h)) for i, (k, h) in enumerate(left)],
        ["lid", "key", "ts"],
    )
    rdf = spark.createDataFrame(
        [(j, k, _BASE + dt.timedelta(hours=h)) for j, (k, h) in enumerate(right)],
        "rid bigint, rkey bigint, rts timestamp",
    )
    out = asof_join(
        ldf, rdf, "key", "rkey", "ts", "rts",
        tie_breakers=["rid"], how="left",
        tolerance_seconds=tol_hours * 3600,
    )
    got = {r["lid"]: r["rid"] for r in out.collect()}

    for i, (k, h) in enumerate(left):
        lt = _BASE + dt.timedelta(hours=h)
        lo = lt - dt.timedelta(hours=tol_hours)
        cands = [
            (j, _BASE + dt.timedelta(hours=rh))
            for j, (rk, rh) in enumerate(right)
            if rk == k and lo <= _BASE + dt.timedelta(hours=rh) <= lt
        ]
        want = max(cands, key=lambda c: (c[1], c[0]))[0] if cands else None
        assert got.get(i) == want, (i, got.get(i), want)


_ms_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 20_000)),  # millisecond offsets
    min_size=1,
    max_size=12,
    unique=True,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=_ms_rows, right=_ms_rows, tol=st.integers(1, 10))
def test_asof_tolerance_subsecond_equals_bruteforce(left, right, tol):
    """Tolerance semantics at MILLISECOND granularity vs an independent
    brute force: the exact two-sided interval [lt - tol, lt], matching
    pandas merge_asof (regression for the whole-second-floor compare that
    admitted rows up to ~1s outside the window)."""
    spark = _get_spark()
    ldf = spark.createDataFrame(
        [
            (i, k, _BASE + dt.timedelta(milliseconds=ms))
            for i, (k, ms) in enumerate(left)
        ],
        ["lid", "key", "ts"],
    )
    rdf = spark.createDataFrame(
        [
            (j, k, _BASE + dt.timedelta(milliseconds=ms))
            for j, (k, ms) in enumerate(right)
        ],
        "rid bigint, rkey bigint, rts timestamp",
    )
    out = asof_join(
        ldf, rdf, "key", "rkey", "ts", "rts",
        tie_breakers=["rid"], how="left", tolerance_seconds=tol,
    )
    got = {r["lid"]: r["rid"] for r in out.collect()}
    for i, (k, lms) in enumerate(left):
        cands = [
            (rms, j)
            for j, (rk, rms) in enumerate(right)
            if rk == k and lms - tol * 1000 <= rms <= lms
        ]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, k, lms, tol, got[i], want)
    assert len(got) == len(left)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=_ms_rows, right=_ms_rows, tol_ms=st.sampled_from([250, 500, 750, 1500]))
def test_asof_fractional_tolerance(left, right, tol_ms):
    """FRACTIONAL tolerance_seconds (e.g. 0.5) must mean half a second, not
    floor-to-zero (round-6 advice: int(0.5)*1e6 == 0 silently disabled the
    window)."""
    spark = _get_spark()
    ldf = spark.createDataFrame(
        [
            (i, k, _BASE + dt.timedelta(milliseconds=ms))
            for i, (k, ms) in enumerate(left)
        ],
        ["lid", "key", "ts"],
    )
    rdf = spark.createDataFrame(
        [
            (j, k, _BASE + dt.timedelta(milliseconds=ms))
            for j, (k, ms) in enumerate(right)
        ],
        "rid bigint, rkey bigint, rts timestamp",
    )
    out = asof_join(
        ldf, rdf, "key", "rkey", "ts", "rts",
        tie_breakers=["rid"], how="left", tolerance_seconds=tol_ms / 1000.0,
    )
    got = {r["lid"]: r["rid"] for r in out.collect()}
    for i, (k, lms) in enumerate(left):
        cands = [
            (rms, j)
            for j, (rk, rms) in enumerate(right)
            if rk == k and lms - tol_ms <= rms <= lms
        ]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, k, lms, tol_ms, got[i], want)
