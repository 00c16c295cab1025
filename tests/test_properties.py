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
