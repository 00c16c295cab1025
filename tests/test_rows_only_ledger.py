"""Enforced rows-only -> quality-test ledger (round-7/8 verdict item):
an ``oracle=None`` registry entry is only acceptable if a NAMED test pins
its quality floor — the driver's check for these entries is rows-only, so
without this gate a new approx/sketch op could land with no quality
evidence at all and nothing would fail."""

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _registry():
    from canvas_data_aws_spark.plans.registry import all_queries

    return all_queries()


def test_every_rows_only_entry_names_a_quality_test():
    missing = [
        n for n, q in _registry().items() if q.oracle is None and not q.quality_test
    ]
    assert not missing, (
        f"rows-only entries without a quality_test reference: {sorted(missing)} "
        "— pin each with quality_test='tests/file.py::test_name'"
    )


def test_quality_test_references_resolve():
    """Each reference must point at a real test function in a real file —
    a renamed or deleted test breaks the ledger loudly."""
    bad = []
    for n, q in sorted(_registry().items()):
        if not q.quality_test:
            continue
        if "::" not in q.quality_test:
            bad.append((n, q.quality_test, "not file.py::test_name form"))
            continue
        path, func = q.quality_test.split("::", 1)
        full = os.path.join(REPO, path)
        if not os.path.exists(full):
            bad.append((n, q.quality_test, "file missing"))
            continue
        with open(full) as f:
            src = f.read()
        if not re.search(rf"^def {re.escape(func)}\(", src, re.M):
            bad.append((n, q.quality_test, "test function missing"))
    assert not bad, f"unresolvable quality_test references: {bad}"


def test_oracle_entries_do_not_claim_quality_tests_they_lack():
    """quality_test on an oracle-checked entry is allowed but must still
    resolve (covered above); the ledger table itself must be fresh."""
    import render_rows_only

    with open(os.path.join(REPO, "COVERAGE.md")) as f:
        current = f.read()
    assert render_rows_only.render(current) == current, (
        "COVERAGE.md rows-only ledger is stale: run tools/render_rows_only.py"
    )
