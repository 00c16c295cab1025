"""Render COVERAGE.md's rows-only -> quality-test ledger from the registry.

Every ``oracle=None`` registry entry must carry a ``quality_test``
reference ("tests/file.py::test_name") — the named test that pins the
op's quality floor (recall / error bound / equivalence), because the
driver's check for these entries is rows-only. This script renders the
ledger table between COVERAGE.md markers; tests/test_rows_only_ledger.py
fails the suite if the block is stale or a reference does not resolve.

Usage:
    python tools/render_rows_only.py           # rewrite COVERAGE.md block
    python tools/render_rows_only.py --check   # exit 1 if stale
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

COVERAGE = os.path.join(REPO, "COVERAGE.md")
BEGIN = "<!-- BEGIN GENERATED: rows-only-ledger (tools/render_rows_only.py) -->"
END = "<!-- END GENERATED: rows-only-ledger -->"


def render_table() -> str:
    from canvas_data_aws_spark.plans.registry import all_queries

    rows = sorted(
        (n, q.quality_test or "MISSING")
        for n, q in all_queries().items()
        if q.oracle is None
    )
    lines = [
        f"{len(rows)} rows-only entries (oracle=None), each pinned by a named "
        "quality test:",
        "",
        "| query | quality test |",
        "|---|---|",
    ]
    lines += [f"| {n} | `{t}` |" for n, t in rows]
    return "\n".join(lines)


def render(text: str) -> str:
    if BEGIN not in text or END not in text:
        raise SystemExit("COVERAGE.md is missing the rows-only-ledger markers")
    head, rest = text.split(BEGIN, 1)
    _, tail = rest.split(END, 1)
    return head + BEGIN + "\n" + render_table() + "\n" + END + tail


def main(argv: list[str]) -> int:
    with open(COVERAGE) as f:
        current = f.read()
    rendered = render(current)
    if "--check" in argv:
        if rendered != current:
            print("COVERAGE.md rows-only ledger is stale: run tools/render_rows_only.py")
            return 1
        return 0
    if rendered != current:
        with open(COVERAGE, "w") as f:
            f.write(rendered)
        print("COVERAGE.md rows-only ledger re-rendered")
    else:
        print("COVERAGE.md rows-only ledger already current")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
