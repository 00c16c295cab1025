"""Property-based tests (hypothesis) for the engine's pure/composable cores:
reconciler verdicts, rolling-hash fingerprint, salted-join equivalence."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from canvas_data_aws_spark.ingest.reconciler import RAW_PREFIX, reconcile
from canvas_data_aws_spark.operators.text import FP_BASE, FP_MOD

_names = st.sets(
    st.text(alphabet="abcdef0123456789", min_size=1, max_size=6), min_size=0, max_size=12
)

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from canvas_data_aws_spark.session import get_spark

        _spark = get_spark(app_name="cda-prop", master="local[2]", shuffle_partitions=2)
    return _spark


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(remote=_names, local=_names)
def test_reconcile_verdict_partition(remote, local):
    """Verdicts partition the key universe exactly like set algebra:
    fetch = remote-local, delete = local-remote, skip = intersection."""
    spark = _get_spark()
    remote_rows = [{"table": "t", "filename": f"{n}.gz", "url": None} for n in sorted(remote)]
    from pyspark.sql import Row
    from pyspark.sql.types import StringType, StructField, StructType

    remote_df = spark.createDataFrame(
        [Row(table="t", filename=f"{n}.gz", url=None) for n in sorted(remote)],
        StructType(
            [
                StructField("table", StringType()),
                StructField("filename", StringType()),
                StructField("url", StringType()),
            ]
        ),
    )
    local_df = spark.createDataFrame(
        [Row(key=f"{RAW_PREFIX}t/{n}.gz") for n in sorted(local)],
        StructType([StructField("key", StringType())]),
    )
    plan = {r["key"]: r["verdict"] for r in reconcile(remote_df, local_df).collect()}

    key = lambda n: f"{RAW_PREFIX}t/{n}.gz"
    assert {k for k, v in plan.items() if v == "fetch"} == {key(n) for n in remote - local}
    assert {k for k, v in plan.items() if v == "delete"} == {key(n) for n in local - remote}
    assert {k for k, v in plan.items() if v == "skip"} == {key(n) for n in remote & local}


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.text(alphabet="abcdefghij XYZ", min_size=0, max_size=40), min_size=1, max_size=8
    )
)
def test_fingerprint_matches_python_reference(texts):
    """The Spark rolling hash equals an independent pure-Python evaluation
    of the same recurrence (engine-portability property)."""
    spark = _get_spark()
    from canvas_data_aws_spark.operators.text import fingerprint_rolling

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    got = {
        r["i"]: r["fp"]
        for r in df.select("i", fingerprint_rolling(F.col("t")).alias("fp")).collect()
    }

    def ref(t: str) -> int:
        acc = 0
        for ch in t.strip().lower():
            acc = (acc * FP_BASE + ord(ch)) % FP_MOD
        return acc

    for i, t in enumerate(texts):
        assert got[i] == ref(t), (t, got[i], ref(t))


def test_ewma_long_key_matches_pandas(tmp_path):
    """Segmented ts_ewma on a SINGLE key spanning >3 segments (1600 rows,
    segment size 512) equals pandas ewm(adjust=True) after the query's 4dp
    rounding — pinning the depth-1 carry-chain truncation claim by test:
    history older than one full segment carries weight <= 0.7^512 ~ 2e-80
    (below one double ulp), so the truncated closed form and pandas' exact
    recurrence must agree bit-for-bit at 4dp."""
    import datetime as dt

    import pandas as pd

    from canvas_data_aws_spark.plans.registry import all_queries

    spark = _get_spark()
    n = 1600
    base = dt.datetime(2024, 1, 1)
    rows = [
        (
            7,  # one user: one window partition, 4 segments
            i,
            base + dt.timedelta(seconds=i),
            ((i * 2654435761) % 997) / 97.0,  # deterministic, non-round values
        )
        for i in range(1, n + 1)
    ]
    d = str(tmp_path / "ewma")
    spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    ).write.parquet(f"{d}/events.parquet")

    out = all_queries()["ts_ewma"].fn(spark, d).orderBy("event_id").collect()
    got = [r["ewma"] for r in out]
    want = (
        pd.Series([r[3] for r in rows]).ewm(alpha=0.3, adjust=True).mean().tolist()
    )
    assert len(got) == n
    for i, (g, w) in enumerate(zip(got, want)):
        # 4dp bit-equality modulo the engines' half-rounding convention:
        # require the unrounded reference to round to the same 4dp value
        # within one ulp of the rounding boundary
        assert abs(g - w) < 0.5e-4 + 1e-9, (i, g, w)
