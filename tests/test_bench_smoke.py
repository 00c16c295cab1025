"""Bench harness must not ship broken (round-4 regression: bench.py crashed
rc=1 on a fixture-encoding change and the round recorded no numbers).

- every headline entry resolves in the registry and RUNS at sf0.001;
- the final stdout JSON line stays under the external recorder's ~2000-char
  tail buffer (round-5 regression: the full per-query line overflowed and
  recorded parsed=null);
- the events.ts loader handles all three historical fixture encodings.
"""

from __future__ import annotations

import json
import random

import pytest


def _bench():
    import bench

    return bench


def test_headline_names_all_registered():
    from canvas_data_aws_spark.plans.registry import all_queries

    bench = _bench()
    registry = all_queries()
    missing = [n for n in bench.HEADLINE if n not in registry]
    assert not missing, f"HEADLINE entries not in registry: {missing}"


def test_headline_queries_run(spark, sf_dir):
    from canvas_data_aws_spark.plans.registry import all_queries

    bench = _bench()
    registry = all_queries()
    failures = {}
    for name in bench.HEADLINE:
        try:
            registry[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # noqa: BLE001 — we want every failure listed
            failures[name] = f"{type(e).__name__}: {e}"[:200]
    assert not failures, f"headline queries crashed: {failures}"


def test_prebuilt_ann_entries_run(spark, sf_dir):
    bench = _bench()
    for name, fn in sorted(bench._prebuilt_ann_entries(spark, sf_dir).items()):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()


def test_final_line_fits_tail_buffer():
    bench = _bench()
    rng = random.Random(11)
    # worst case: every headline + prebuilt entry present with 2dp values
    names = bench.HEADLINE + [
        "sim_search_ivf_prebuilt",
        "sim_search_ivf_adc_prebuilt",
        "sim_search_lsh_prebuilt",
    ]
    timings = {n: round(rng.uniform(0.1, 99.99), 3) for n in names}
    line = json.dumps(bench.compact_result(timings, 0.1))
    assert len(line) <= bench.FINAL_LINE_BUDGET, len(line)
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total"
    assert parsed["queries"], "compact line carries no per-query entries"
    # slowest entries survive trimming
    slowest = max(timings, key=timings.get)
    assert slowest in parsed["queries"]


@pytest.mark.parametrize("encoding", ["nanos_long", "ntz_micros", "timestamp"])
def test_events_ts_encodings(spark, tmp_path, encoding):
    """sources/parquet.py footer-dtype dispatch: all three historical
    events.ts encodings load to identical session-TZ TIMESTAMP values."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from canvas_data_aws_spark.sources.parquet import load_table

    base = dt.datetime(2024, 3, 1, 12, 30, 45, 123456)
    times = [base + dt.timedelta(seconds=i) for i in range(5)]
    if encoding == "nanos_long":
        arr = pa.array([int(t.timestamp() * 1e6) * 1000 for t in times], pa.timestamp("ns"))
    elif encoding == "ntz_micros":
        arr = pa.array(times, pa.timestamp("us"))
    else:
        arr = pa.array(times, pa.timestamp("us", tz="UTC"))
    table = pa.table({"event_id": pa.array(range(5), pa.int64()), "ts": arr})
    d = tmp_path / encoding
    d.mkdir()
    pq.write_table(table, str(d / "events.parquet"))
    df = load_table(spark, str(d), "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    got = sorted(r["ts"].replace(tzinfo=None) for r in df.collect())
    assert got == times, (encoding, got[:2], times[:2])


def test_ref_query_probe_runs(spark):
    """The ambient-load reference probe (round-11 verdict item) must run and
    return a plausible machine-speed sample — it is the denominator of
    every cross-round normalization, so it shipping broken would silently
    void the noise protocol."""
    bench = _bench()
    v = bench._ref_query_sec(spark)
    assert isinstance(v, float) and 0.0 < v < 60.0, v


def test_bench_delta_normalization_rule():
    """tools/bench_delta.py IS the BENCH_NOISE.md normalization rule: a
    uniform machine-band shift (every query scaled by the ambient factor)
    must classify as ambient; only a delta that survives dividing by
    ref_new/ref_old AND exceeds the noise floor is a regression."""
    import sys

    sys.path.insert(0, "tools")
    from bench_delta import classify

    old = {
        "ref_query_sec": 0.6,
        "queries": {"uniform": 3.0, "real_regression": 3.0, "tiny": 0.4},
    }
    new = {
        "ref_query_sec": 0.72,  # box 1.2x slower
        "queries": {"uniform": 3.6, "real_regression": 6.0, "tiny": 0.55},
    }
    rep = classify(old, new)
    assert rep["ambient_factor"] == 1.2
    verd = {r["query"]: r["verdict"] for r in rep["rows"]}
    assert verd["uniform"] == "ambient"  # 1.2x raw == the band, norm 1.0
    assert verd["real_regression"] == "regressed"  # norm 1.67, delta 2.4s
    assert verd["tiny"] == "ambient"  # sub-2s, norm < 1.5x
    assert [r["query"] for r in rep["regressed"]] == ["real_regression"]

    # pre-round-12 snapshot without the reference probe: factor 1.0
    rep2 = classify({"queries": {"q": 1.0}}, {"queries": {"q": 1.1}, "ref_query_sec": 0.7})
    assert rep2["ambient_factor"] == 1.0
    assert "missing" in rep2["ambient_factor_source"]


def test_bench_delta_known_scatter_bands():
    """Queries with documented fresh-process scatter wider than the generic
    floor (the iterative graph/BSP family, BENCH_NOISE.md) use their own
    band — graph_connected_components moved 3.6-5.5 s across one session on
    identical code, so a 0.9 s swing must not read as a regression while
    the same swing on an undocumented query still does."""
    import sys

    sys.path.insert(0, "tools")
    from bench_delta import classify

    old = {"ref_query_sec": 0.6, "queries": {"graph_connected_components": 4.3, "steady": 4.3}}
    new = {"ref_query_sec": 0.6, "queries": {"graph_connected_components": 5.2, "steady": 5.2}}
    verd = {r["query"]: r["verdict"] for r in classify(old, new)["rows"]}
    assert verd["graph_connected_components"] == "ambient"
    assert verd["steady"] == "regressed"
