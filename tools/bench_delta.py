"""Cross-round bench comparison under the ambient-normalization protocol.

BENCH_NOISE.md states the rule; this tool IS the rule, so no future drift
adjudication depends on hand arithmetic:

    python tools/bench_delta.py OLD.json [NEW.json]     # NEW defaults to
                                                        # the repo snapshot
    python tools/bench_delta.py OLD.json MID.json NEW.json
        # escalation mode: three CONSECUTIVE committed snapshots — a
        # band query suppressed-positive in BOTH pairs escalates to
        # ``regressed`` (scatter is memoryless; a real regression persists)

For every common query it computes the raw ratio new/old, divides by the
ambient factor ``ref_new / ref_old`` (the fixed machine-speed probe
bench.py records as ``ref_query_sec`` — the MEDIAN over each snapshot's
bracketing samples, see _ambient_ref; snapshots predating round 12 lack
the probe and fall back to factor 1.0 with a warning), and classifies:

- ``ambient``   — the normalized ratio is within the noise envelope
                  (|delta| <= NOISE_FLOOR_SEC or normalized ratio < 1.5x
                  on a sub-2 s query: BENCH_NOISE.md's measured floor);
- ``regressed`` / ``improved`` — survives normalization AND the floor.

Per-query scatter bands (``KNOWN_SCATTER_RATIO``) widen the floor for the
JIT-sensitive BSP family, but suppression is never silent: any mover the
band alone absorbed is flagged ``band_suppressed`` and listed separately,
and the three-snapshot escalation rule converts two consecutive
suppressed-positive readings into ``regressed``.

The I/O axis (``ref_io_sec``, recorded since round 13) is consulted for
ATTRIBUTION only: a regressed mover whose delta the I/O ambient factor
alone would place within the floor carries ``io_suspect`` — it stays
``regressed`` (fail-loud), but the adjudicator sees which axis to
investigate first. The flag is never applied in the suppressing
direction (a CPU-bound query normalized by a noisy I/O factor would
hide real regressions).

Exit code is 0 always (reporting, not a gate — the probe-coverage gate in
tests/test_probe_ledger.py is the committed-snapshot gate); the output is
one JSON line with the median band, the ambient factor, and the survivor
lists, followed by a human table of the worst movers.
"""

from __future__ import annotations

import json
import statistics
import sys

#: measured single-sample noise floor at sf0.1 (BENCH_NOISE.md)
NOISE_FLOOR_SEC = 0.7
#: sub-2 s queries additionally need >= this normalized ratio to count
SMALL_QUERY_RATIO = 1.5
SMALL_QUERY_SEC = 2.0
#: per-query scatter bands WIDER than the generic floor, expressed as a
#: RATIO of the query's own old-snapshot timing so they track the baseline
#: instead of going stale as absolute timings drift (round-12 advice; the
#: r12 tool hardcoded seconds). Derivation from fresh-process measurements
#: in BENCH_NOISE.md: graph_connected_components read 3.6-5.5 s across one
#: session on IDENTICAL code (r7 second-session observation and the r12
#: settlement table) — scatter ~1.9 s on a ~4.7 s baseline = 0.35; the
#: sibling BSP plans scatter proportionally less (r12 bands 1.0 s on
#: 3.3-3.6 s baselines = 0.30).
KNOWN_SCATTER_RATIO = {
    "graph_connected_components": 0.35,
    "graph_label_propagation": 0.30,
    "graph_k_core": 0.30,
}
#: escalation: a band query suppressed-positive in this many CONSECUTIVE
#: snapshot pairs classifies ``regressed`` — within-band JIT scatter is
#: memoryless, so persistence across independent committed snapshots is
#: evidence of code, and the band must not hide it forever (round-12
#: verdict task 3).
ESCALATE_CONSECUTIVE = 2


def _ambient_ref(snap: dict) -> float | None:
    """The reference figure the AMBIENT FACTOR divides: the MEDIAN over
    the snapshot's bracketing ref_query_sec samples (2 per child JVM x 2
    children), falling back to the top-level min for snapshots whose raw
    runs are unavailable. Why median, not the recorded min: the min is
    the box's attainable speed (the right HUMAN-readable figure), but a
    ratio of two mins has the sampling variance of extremes — round 13
    observed a single 0.54 sample against a 0.645-0.71 cohort bias the
    min-based factor by 17% and false-flag a steady query (raw 1.06x
    classified regressed at norm 1.32x). The median over the 4 samples
    is stable against one fluke in either direction."""
    samples = [
        s
        for r in snap.get("runs", [])
        for s in r.get("ref_query_sec", [])
        if isinstance(s, (int, float))
    ]
    if samples:
        return statistics.median(samples)
    return snap.get("ref_query_sec")


def _ambient_io_ref(snap: dict) -> float | None:
    """The I/O-axis companion to _ambient_ref: median over the snapshot's
    bracketing ref_io_sec samples (post-r13 snapshots), top-level min as
    the fallback. Used for ATTRIBUTION only (io_suspect flag), never to
    auto-suppress a mover — a CPU-bound query normalized by a noisy I/O
    factor would hide real regressions."""
    samples = [
        s
        for r in snap.get("runs", [])
        for s in r.get("ref_io_sec", [])
        if isinstance(s, (int, float))
    ]
    if samples:
        return statistics.median(samples)
    return snap.get("ref_io_sec")


def _queries_of(snap: dict, label: str) -> dict:
    """The snapshot's per-query timings, with a diagnostic error (not a
    bare KeyError traceback) on a truncated or hand-edited file."""
    q = snap.get("queries")
    if not isinstance(q, dict) or not q:
        raise SystemExit(
            f"bench_delta: snapshot {label!r} has no 'queries' mapping — "
            "truncated or hand-edited BENCH_FULL.json?"
        )
    return q


def classify(
    old: dict,
    new: dict,
    prior_suppressed: set[str] | None = None,
    old_label: str = "OLD",
    new_label: str = "NEW",
) -> dict:
    """Compare two snapshots. ``prior_suppressed``: queries that were
    band-suppressed with positive normalized drift in the IMMEDIATELY
    PREVIOUS committed-snapshot pair — a query in that set that is
    suppressed-positive again here escalates to ``regressed``."""
    prior_suppressed = prior_suppressed or set()
    ref_old = _ambient_ref(old)
    ref_new = _ambient_ref(new)
    if ref_old and ref_new:
        ambient = ref_new / ref_old
    else:
        ambient = 1.0
    io_old = _ambient_io_ref(old)
    io_new = _ambient_io_ref(new)
    ambient_io = (io_new / io_old) if io_old and io_new else None
    qo = _queries_of(old, old_label)
    qn = _queries_of(new, new_label)
    common = sorted(k for k in qn if k in qo and qo[k] > 0.05)
    rows = []
    for k in common:
        raw = qn[k] / qo[k]
        norm = raw / ambient
        delta = qn[k] - qo[k] * ambient
        band = KNOWN_SCATTER_RATIO.get(k, 0.0) * qo[k]
        floor = max(NOISE_FLOOR_SEC, band)
        generic_ambient = abs(delta) <= NOISE_FLOOR_SEC or (
            qo[k] < SMALL_QUERY_SEC and norm < SMALL_QUERY_RATIO
        )
        if generic_ambient or abs(delta) <= floor:
            verdict = "ambient"
        else:
            verdict = "regressed" if norm > 1.0 else "improved"
        # the band ALONE absorbed a mover the generic floor would have
        # surfaced — flag it so band-masked drift stays visible
        suppressed = verdict == "ambient" and not generic_ambient
        if suppressed and norm > 1.0 and k in prior_suppressed:
            verdict = "regressed"
            suppressed = False
            escalated = True
        else:
            escalated = False
        # attribution (BENCH_NOISE.md round-13 item 4): a REGRESSED mover
        # whose delta the I/O ambient factor alone would place within the
        # floor gets io_suspect — it stays regressed (fail-loud), but the
        # adjudicator sees which axis to investigate first. Never applied
        # in the suppressing direction.
        io_suspect = False
        if verdict == "regressed" and ambient_io:
            io_delta = qn[k] - qo[k] * ambient_io
            io_suspect = abs(io_delta) <= max(NOISE_FLOOR_SEC, band) or (
                qo[k] < SMALL_QUERY_SEC and raw / ambient_io < SMALL_QUERY_RATIO
            )
        rows.append(
            {
                "query": k,
                "old": qo[k],
                "new": qn[k],
                "raw_ratio": round(raw, 3),
                "norm_ratio": round(norm, 3),
                "verdict": verdict,
                **({"band_suppressed": True} if suppressed else {}),
                **({"escalated": True} if escalated else {}),
                **({"io_suspect": True} if io_suspect else {}),
            }
        )
    med = statistics.median(r["raw_ratio"] for r in rows) if rows else None
    return {
        "ambient_factor": round(ambient, 3),
        "ambient_factor_source": "ref_query_sec"
        if ref_old and ref_new
        else "missing (pre-round-12 snapshot) — factor 1.0",
        "ambient_io_factor": round(ambient_io, 3) if ambient_io else None,
        "n_common": len(rows),
        "median_raw_ratio": round(med, 3) if med is not None else None,
        "regressed": [r for r in rows if r["verdict"] == "regressed"],
        "improved": [r for r in rows if r["verdict"] == "improved"],
        "band_suppressed": [r for r in rows if r.get("band_suppressed")],
        "rows": rows,
    }


def suppressed_positive(report: dict) -> set[str]:
    """Queries the band absorbed while drifting SLOWER — the escalation
    rule's carry-over set between consecutive snapshot pairs."""
    return {
        r["query"]
        for r in report["band_suppressed"]
        if r["norm_ratio"] > 1.0
    }


def classify_series(snaps: list[dict], labels: list[str]) -> dict:
    """Escalation mode over >= 3 CONSECUTIVE committed snapshots: classify
    each adjacent pair, carrying each pair's suppressed-positive set into
    the next — ``ESCALATE_CONSECUTIVE`` suppressed-positive readings in a
    row classify ``regressed`` on the final pair. Returns the FINAL pair's
    report (the round-over-round answer) plus the carried set."""
    carried: set[str] = set()
    rep: dict = {}
    for i in range(len(snaps) - 1):
        rep = classify(
            snaps[i],
            snaps[i + 1],
            prior_suppressed=carried,
            old_label=labels[i],
            new_label=labels[i + 1],
        )
        carried = suppressed_positive(rep)
    rep["escalation_pairs"] = len(snaps) - 1
    return rep


def main(argv: list[str]) -> int:
    import os

    if not argv:
        print(__doc__, file=sys.stderr)
        return 2
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = list(argv)
    if len(paths) == 1:
        paths.append(os.path.join(repo, "BENCH_FULL.json"))
    snaps = []
    for p in paths:
        try:
            with open(p) as f:
                snaps.append(json.load(f))
        except (OSError, ValueError) as exc:
            raise SystemExit(f"bench_delta: cannot read snapshot {p!r}: {exc}")
    if len(snaps) == 2:
        rep = classify(snaps[0], snaps[1], old_label=paths[0], new_label=paths[1])
    else:
        rep = classify_series(snaps, paths)
    compact = {k: v for k, v in rep.items() if k != "rows"}
    print(json.dumps(compact))
    worst = sorted(rep["rows"], key=lambda r: -r["norm_ratio"])[:10]
    print(f"\nambient factor {rep['ambient_factor']} "
          f"({rep['ambient_factor_source']}); worst normalized movers:")
    for r in worst:
        flags = "".join(
            f" +{f}"
            for f in ("band_suppressed", "escalated", "io_suspect")
            if r.get(f)
        )
        print(
            f"  {r['query']:42s} {r['old']:7.2f} -> {r['new']:7.2f} "
            f"raw {r['raw_ratio']:5.2f}x norm {r['norm_ratio']:5.2f}x "
            f"[{r['verdict']}{flags}]"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
