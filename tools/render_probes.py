"""Render SCALE.md's probe tables from tools/probe_ledger.json.

The ledger is machine-written by tools/probe10x.py (record()); this script
is the ONLY thing that turns it into markdown, so no probe number in the
generated blocks is ever hand-transcribed (the round-8 verdict found ~40
hand-copied 10x rows pasted inside the 100x table — exactly the failure
this renderer exists to prevent). Hand-written prose lives in the ledger's
per-entry ``reading`` field, which record() preserves across re-probes.

Usage:
    python tools/render_probes.py           # rewrite SCALE.md blocks in place
    python tools/render_probes.py --check   # exit 1 if SCALE.md is stale

SCALE.md must contain one marker pair per factor:

    <!-- BEGIN GENERATED: 10x-probes (tools/render_probes.py) -->
    ...
    <!-- END GENERATED: 10x-probes -->

and likewise for ``100x-probes``. Everything between the markers is
replaced wholesale on each render.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(REPO, "tools", "probe_ledger.json")
SCALE = os.path.join(REPO, "SCALE.md")

# Always render the canonical factors; any extra factor present in the
# ledger (300x/1000x spot probes) renders too — SCALE.md must carry a
# marker pair for each factor that has ledger entries.
BASE_FACTORS = (10, 100)


def _factors(entries: list[dict]) -> list[int]:
    return sorted(set(BASE_FACTORS) | {e["factor"] for e in entries})


def _begin(factor: int) -> str:
    return f"<!-- BEGIN GENERATED: {factor}x-probes (tools/render_probes.py) -->"


def _end(factor: int) -> str:
    return f"<!-- END GENERATED: {factor}x-probes -->"


def render_table(entries: list[dict], factor: int) -> str:
    rows = sorted(
        (e for e in entries if e["factor"] == factor), key=lambda e: e["query"]
    )
    lines = [
        f"| query | 1x | {factor}x | growth | reading |",
        "|---|---|---|---|---|",
    ]
    for e in rows:
        reading = str(e.get("reading", "")).replace("|", "\\|").replace("\n", " ")
        lines.append(
            f"| {e['query']} | {e['t1_sec']:.2f} s | {e['tn_sec']:.2f} s "
            f"| {e['growth']:.1f}x | {reading} |"
        )
    if not rows:
        lines.append("| _(no entries at this factor yet)_ | | | | |")
    return "\n".join(lines)


def render(scale_text: str, entries: list[dict]) -> str:
    out = scale_text
    for factor in _factors(entries):
        b, e = _begin(factor), _end(factor)
        if b not in out or e not in out:
            raise SystemExit(f"SCALE.md is missing the marker pair for {factor}x")
        head, rest = out.split(b, 1)
        _, tail = rest.split(e, 1)
        out = head + b + "\n" + render_table(entries, factor) + "\n" + e + tail
    return out


def main(argv: list[str]) -> int:
    with open(LEDGER) as f:
        entries = json.load(f)
    with open(SCALE) as f:
        current = f.read()
    rendered = render(current, entries)
    if "--check" in argv:
        if rendered != current:
            print("SCALE.md probe blocks are stale: run tools/render_probes.py")
            return 1
        print("SCALE.md probe blocks match the ledger")
        return 0
    if rendered != current:
        with open(SCALE, "w") as f:
            f.write(rendered)
        print("SCALE.md probe blocks re-rendered from the ledger")
    else:
        print("SCALE.md probe blocks already current")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
