"""Production-shaped growth probe for sketch_quantile_digest (round-10
verdict item 3: the ledger's one super-linear reading).

probe10x.py's generic replica grows per-DAY row count with days FIXED at
the fixture's 30 — the exact opposite of how an event stream grows in
production, where days accumulate and per-day volume stays roughly
bounded. Under that shape the 300x probe read 3.5x wall for 3x data (the
per-day ntile sort's n log n showing), which the operator's scale story
says is a construction artifact. This probe builds the PRODUCTION shape:
N disjoint replicas of the 30-day fixture shifted by rid*31 days each, so
a factor-N corpus spans ~N*30 days at the fixture's per-day row count.
The digest's contract — per-day build cost bounded, merge/query touching
only b x days centroid rows — predicts WALL GROWTH ~LINEAR in N here;
that prediction becomes a ledger row instead of prose.

Usage (one fresh process per factor, like every probe):
    CDA_PROBE_FACTOR=100 python tools/probe_quantile_days.py
    CDA_PROBE_FACTOR=300 python tools/probe_quantile_days.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import pyspark.sql.functions as F

from canvas_data_aws_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
N = int(os.environ.get("CDA_PROBE_FACTOR", "100"))
DST = f"/tmp/cda_qd_days{N}x"
QUERY = "sketch_quantile_digest_days"  # ledger key; runs sketch_quantile_digest


def build(spark) -> None:
    out = f"{DST}/events.parquet"
    if os.path.exists(out):
        return
    os.makedirs(DST, exist_ok=True)
    base = spark.read.parquet(f"{SRC}/events.parquet")
    rep = base.withColumn("_rid", F.explode(F.sequence(F.lit(0), F.lit(N - 1))))
    rep = (
        rep.withColumn("event_id", F.col("event_id") + F.col("_rid").cast("bigint") * 10_000_000)
        .withColumn("user_id", F.col("user_id") + F.col("_rid").cast("bigint") * 10_000_000)
        # days scale with the factor; per-day rows stay at fixture volume
        .withColumn("ts", F.timestamp_add("DAY", (F.col("_rid") * 31).cast("int"), F.col("ts")))
        .drop("_rid")
    )
    rep.write.mode("overwrite").parquet(out)
    print(f"built events x{N} (days-proportional)", flush=True)


def run(spark, fn, sf_dir: str) -> float:
    warmups = 2 if sf_dir == SRC else 1
    for _ in range(warmups):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def digest_only(spark, sf_dir: str):
    """The registry entry carries an EXACT rank-select truth alongside the
    digest — a deliberately global single-partition row_number sort that
    exists only for the DuckDB oracle and is itself the textbook
    super-linear term (it is the thing the digest replaces). This plan is
    the digest alone: daily build -> merge -> quantile query, i.e. what a
    production rollup actually runs."""
    from canvas_data_aws_spark.operators.quantiles import (
        quantile_digest_build,
        quantile_digest_merge,
        quantile_digest_query,
    )
    from canvas_data_aws_spark.sources.parquet import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").cast("date").alias("day"), "event_id", "value"
    )
    daily = quantile_digest_build(ev, "value", "event_id", ["day"], b=32)
    merged = quantile_digest_merge(daily, [], ["day", "bucket"], b=64)
    return quantile_digest_query(merged, [10, 100, 250, 500, 750, 900, 990], [])


if __name__ == "__main__":
    import probe10x  # record() — same ledger, same (query, factor) keying

    probe10x.N = N  # record() stamps the factor from the module global
    spark = get_spark()
    build(spark)
    from canvas_data_aws_spark.plans.registry import all_queries

    fn = all_queries()["sketch_quantile_digest"].fn
    t1 = run(spark, fn, SRC)
    tn = run(spark, fn, DST)
    probe10x.record(QUERY, t1, tn)
    print(f"PROBE {QUERY}: 1x={t1:.2f}s {N}x={tn:.2f}s growth={tn / t1:.1f}x", flush=True)

    d1 = run(spark, digest_only, SRC)
    dn = run(spark, digest_only, DST)
    probe10x.record("quantile_digest_build_days", d1, dn)
    print(
        f"PROBE quantile_digest_build_days: 1x={d1:.2f}s {N}x={dn:.2f}s "
        f"growth={dn / d1:.1f}x",
        flush=True,
    )
