"""Cross-round bench comparison under the ambient-normalization protocol.

BENCH_NOISE.md states the rule; this tool IS the rule, so no future drift
adjudication depends on hand arithmetic:

    python tools/bench_delta.py OLD.json [NEW.json]    # NEW defaults to
                                                       # the repo snapshot

For every common query it computes the raw ratio new/old, divides by the
ambient factor ``ref_new / ref_old`` (the fixed machine-speed probe
bench.py records as ``ref_query_sec``; snapshots predating round 12 lack
it and fall back to factor 1.0 with a warning), and classifies:

- ``ambient``   — the normalized ratio is within the noise envelope
                  (|delta| <= NOISE_FLOOR_SEC or normalized ratio < 1.5x
                  on a sub-2 s query: BENCH_NOISE.md's measured floor);
- ``regressed`` / ``improved`` — survives normalization AND the floor.

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
#: per-query scatter bands WIDER than the generic floor, each documented
#: with fresh-process measurements in BENCH_NOISE.md: the iterative
#: graph/BSP family is JIT/codegen-sensitive (graph_connected_components
#: measured 3.6-5.5 s across one session on IDENTICAL code — r7 second
#: -session observation and the r12 settlement table)
KNOWN_SCATTER_SEC = {
    "graph_connected_components": 1.6,
    "graph_label_propagation": 1.0,
    "graph_k_core": 1.0,
}


def classify(old: dict, new: dict) -> dict:
    ref_old = old.get("ref_query_sec")
    ref_new = new.get("ref_query_sec")
    if ref_old and ref_new:
        ambient = ref_new / ref_old
    else:
        ambient = 1.0
    qo, qn = old["queries"], new["queries"]
    common = sorted(k for k in qn if k in qo and qo[k] > 0.05)
    rows = []
    for k in common:
        raw = qn[k] / qo[k]
        norm = raw / ambient
        delta = qn[k] - qo[k] * ambient
        floor = max(NOISE_FLOOR_SEC, KNOWN_SCATTER_SEC.get(k, 0.0))
        if abs(delta) <= floor or (
            qo[k] < SMALL_QUERY_SEC and norm < SMALL_QUERY_RATIO
        ):
            verdict = "ambient"
        else:
            verdict = "regressed" if norm > 1.0 else "improved"
        rows.append(
            {
                "query": k,
                "old": qo[k],
                "new": qn[k],
                "raw_ratio": round(raw, 3),
                "norm_ratio": round(norm, 3),
                "verdict": verdict,
            }
        )
    med = statistics.median(r["raw_ratio"] for r in rows) if rows else None
    return {
        "ambient_factor": round(ambient, 3),
        "ambient_factor_source": "ref_query_sec"
        if ref_old and ref_new
        else "missing (pre-round-12 snapshot) — factor 1.0",
        "n_common": len(rows),
        "median_raw_ratio": round(med, 3) if med is not None else None,
        "regressed": [r for r in rows if r["verdict"] == "regressed"],
        "improved": [r for r in rows if r["verdict"] == "improved"],
        "rows": rows,
    }


def main(argv: list[str]) -> int:
    import os

    if not argv:
        print(__doc__, file=sys.stderr)
        return 2
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    old_path = argv[0]
    new_path = argv[1] if len(argv) > 1 else os.path.join(repo, "BENCH_FULL.json")
    with open(old_path) as f:
        old = json.load(f)
    with open(new_path) as f:
        new = json.load(f)
    rep = classify(old, new)
    compact = {k: v for k, v in rep.items() if k != "rows"}
    print(json.dumps(compact))
    worst = sorted(rep["rows"], key=lambda r: -r["norm_ratio"])[:10]
    print(f"\nambient factor {rep['ambient_factor']} "
          f"({rep['ambient_factor_source']}); worst normalized movers:")
    for r in worst:
        print(
            f"  {r['query']:42s} {r['old']:7.2f} -> {r['new']:7.2f} "
            f"raw {r['raw_ratio']:5.2f}x norm {r['norm_ratio']:5.2f}x "
            f"[{r['verdict']}]"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
