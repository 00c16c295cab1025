"""CLI for the plan scale linter.

Usage::

    python -m canvas_data_aws_spark.lint <query_name> [sf_dir]
    python -m canvas_data_aws_spark.lint --all [sf_dir]

Prints one line per finding (severity, code, detail) for the named
registry query's physical plan — the same checks `tests/test_linter.py`
gates CI on, exposed for ad-hoc use while developing a new query.
"""

from __future__ import annotations

import sys


def main(argv: list[str]) -> int:
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    from canvas_data_aws_spark.plans.linter import lint
    from canvas_data_aws_spark.plans.registry import all_queries
    from canvas_data_aws_spark.session import get_spark

    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="cda-lint")
    registry = all_queries()
    names = sorted(registry) if argv[0] == "--all" else [argv[0]]
    rc = 0
    for name in names:
        if name not in registry:
            print(f"{name}: not in registry ({len(registry)} queries)", file=sys.stderr)
            return 2
        findings = lint(registry[name].fn(spark, sf_dir))
        if not findings:
            print(f"{name}: clean")
        for f in findings:
            print(f"{name}: [{f.severity}] {f.code}: {f.detail}")
            if f.severity == "error":
                rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
