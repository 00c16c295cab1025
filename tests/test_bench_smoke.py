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


def test_costly_tagged_entries_are_benched():
    """Round-12 verdict item 2: HEADLINE membership is itself gated. The
    probe-coverage gate ratchets on the committed bench top-50, so a costly
    NEW entry left off the hand-curated HEADLINE list silently escaped both
    the bench series and that gate (round 12's corpus_classifier_reliability
    was the existence proof). This test walks the registry: every entry
    carrying the cost-marker tag (``iterative`` — the unrolled/multi-pass
    plans; every member measured >1 s at sf0.1) must be in HEADLINE or on
    the explicit, reason-bearing HEADLINE_EXCLUDED list."""
    from canvas_data_aws_spark.plans.registry import all_queries

    bench = _bench()
    registry = all_queries()
    costly = {n for n, q in registry.items() if "iterative" in q.tags}
    assert costly, "cost-marker tag vanished from the registry"
    missing = sorted(costly - set(bench.HEADLINE) - set(bench.HEADLINE_EXCLUDED))
    assert not missing, (
        f"iterative-tagged entries outside the bench series: {missing} — "
        "add them to bench.HEADLINE (and a 100x probe row if they enter "
        "the top-50) or to HEADLINE_EXCLUDED with a reason"
    )
    for name, reason in bench.HEADLINE_EXCLUDED.items():
        assert name in registry, f"stale exclusion (not a registry entry): {name}"
        assert name not in bench.HEADLINE, f"excluded AND benched: {name}"
        assert reason.strip(), f"exclusion without a reason: {name}"


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


def test_ref_io_probe_runs(sf_dir):
    """The I/O-axis ambient probe (round-12 verdict item 4) must run
    without Spark and return a plausible positive figure — it rides every
    bench child, so it shipping broken would crash the snapshot run."""
    bench = _bench()
    v = bench._ref_io_sec(sf_dir)
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
    rep = classify(old, new)
    verd = {r["query"]: r["verdict"] for r in rep["rows"]}
    assert verd["graph_connected_components"] == "ambient"
    assert verd["steady"] == "regressed"
    # suppression is never silent (round-12 advice): the band-absorbed
    # mover is flagged and listed, the generic-floor ambient one is not
    assert [r["query"] for r in rep["band_suppressed"]] == [
        "graph_connected_components"
    ]
    # the band scales with the baseline (ratio, not a stale constant):
    # the same 0.9 s swing on a 2.4 s baseline exceeds 0.35*2.4=0.84
    rep2 = classify(
        {"ref_query_sec": 0.6, "queries": {"graph_connected_components": 2.4}},
        {"ref_query_sec": 0.6, "queries": {"graph_connected_components": 3.3}},
    )
    assert rep2["rows"][0]["verdict"] == "regressed"


def test_bench_delta_ambient_uses_median_of_ref_samples():
    """Round-13 observation: the ambient factor is a RATIO of reference
    figures, and a ratio of mins has the sampling variance of extremes —
    one fluke 0.54 sample against a 0.645-0.71 cohort biased the factor
    17% and false-flagged a steady query. The factor must divide the
    MEDIAN over each snapshot's bracketing samples (runs[].ref_query_sec),
    falling back to the top-level min only when raw runs are absent."""
    import sys

    sys.path.insert(0, "tools")
    from bench_delta import classify

    old = {
        "ref_query_sec": 0.672,
        "runs": [{"ref_query_sec": [0.737, 0.672]}, {"ref_query_sec": [0.70, 0.686]}],
        "queries": {"steady": 3.3},
    }
    # min sample is a fluke (0.54); cohort says the box speed is unchanged
    new = {
        "ref_query_sec": 0.54,
        "runs": [{"ref_query_sec": [0.71, 0.54]}, {"ref_query_sec": [0.70, 0.69]}],
        "queries": {"steady": 3.5},
    }
    rep = classify(old, new)
    assert rep["ambient_factor"] == 1.003  # medians 0.693 vs 0.695 -> ~1.0
    assert rep["rows"][0]["verdict"] == "ambient", rep["rows"][0]
    # fallback: no runs recorded -> top-level figure still used
    rep2 = classify(
        {"ref_query_sec": 0.6, "queries": {"q": 3.0}},
        {"ref_query_sec": 0.72, "queries": {"q": 3.6}},
    )
    assert rep2["ambient_factor"] == 1.2


def test_bench_delta_band_escalation_rule():
    """Round-12 verdict task 3: within-band scatter is memoryless, so a
    band query that reads suppressed-positive in TWO consecutive committed
    snapshot pairs must classify ``regressed`` on the second pair — the
    band cannot hide a persistent drift forever. A one-off suppressed
    reading followed by recovery stays ambient."""
    import sys

    sys.path.insert(0, "tools")
    from bench_delta import classify_series, suppressed_positive

    q = "graph_connected_components"
    s0 = {"ref_query_sec": 0.6, "queries": {q: 4.0}}
    s1 = {"ref_query_sec": 0.6, "queries": {q: 5.2}}  # +1.2s, band 1.4: suppressed
    s2 = {"ref_query_sec": 0.6, "queries": {q: 6.7}}  # +1.5s on 5.2, band 1.82: suppressed AGAIN
    rep = classify_series([s0, s1, s2], ["s0", "s1", "s2"])
    row = rep["rows"][0]
    assert row["verdict"] == "regressed" and row.get("escalated"), row
    # recovery breaks the streak: pair 2 improves, nothing escalates
    s2_ok = {"ref_query_sec": 0.6, "queries": {q: 4.1}}
    rep_ok = classify_series([s0, s1, s2_ok], ["s0", "s1", "s2"])
    assert rep_ok["rows"][0]["verdict"] == "ambient"
    # the carried set is exactly the suppressed-POSITIVE movers
    first = classify_series([s0, s1], ["s0", "s1"])
    assert suppressed_positive(first) == {q}


def test_bench_delta_io_suspect_attribution():
    """A REGRESSED mover whose delta the I/O ambient factor alone places
    within the floor is flagged io_suspect — attribution, not suppression:
    the verdict stays regressed (fail-loud), and the flag never appears
    when the I/O factor does not explain the move or the I/O probe is
    absent (pre-round-13 snapshot)."""
    import sys

    sys.path.insert(0, "tools")
    from bench_delta import classify

    old = {
        "runs": [{"ref_query_sec": [0.6, 0.6], "ref_io_sec": [0.5, 0.5]}],
        "queries": {"io_bound": 3.0, "cpu_regression": 3.0},
    }
    new = {
        # CPU probe steady (factor 1.0) but the I/O probe 1.5x slower —
        # the io_bound query's 1.5x move is exactly what the I/O axis
        # predicts; the other mover's 2.5x exceeds it
        "runs": [{"ref_query_sec": [0.6, 0.6], "ref_io_sec": [0.75, 0.75]}],
        "queries": {"io_bound": 4.5, "cpu_regression": 7.5},
    }
    rep = classify(old, new)
    assert rep["ambient_io_factor"] == 1.5
    rows = {r["query"]: r for r in rep["rows"]}
    assert rows["io_bound"]["verdict"] == "regressed"  # fail-loud kept
    assert rows["io_bound"].get("io_suspect") is True
    assert rows["cpu_regression"]["verdict"] == "regressed"
    assert "io_suspect" not in rows["cpu_regression"]

    # no I/O probe on either side: no flag, report says None
    rep2 = classify(
        {"ref_query_sec": 0.6, "queries": {"q": 3.0}},
        {"ref_query_sec": 0.6, "queries": {"q": 4.5}},
    )
    assert rep2["ambient_io_factor"] is None
    assert "io_suspect" not in rep2["rows"][0]


def test_bench_delta_missing_queries_key_is_diagnostic():
    """A truncated/hand-edited snapshot (no 'queries' mapping) must raise a
    clear SystemExit naming the snapshot, not a bare KeyError traceback."""
    import sys

    import pytest

    sys.path.insert(0, "tools")
    from bench_delta import classify

    with pytest.raises(SystemExit, match="OLD.*no 'queries'"):
        classify({"ref_query_sec": 0.6}, {"queries": {"q": 1.0}})
    with pytest.raises(SystemExit, match="bad.json"):
        classify(
            {"queries": {"q": 1.0}},
            {"queries": {}},
            old_label="ok.json",
            new_label="bad.json",
        )
