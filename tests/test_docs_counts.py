"""README's registry counts must match the registry (drift regression:
rounds 3 and 5 both flagged stale hand-written counts)."""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_query_count_matches_registry():
    from canvas_data_aws_spark.plans.registry import all_queries

    n = len(all_queries())
    text = open(os.path.join(REPO, "README.md")).read()
    claimed = {int(m) for m in re.findall(r"\((\d+) (?:named )?queries", text)}
    assert claimed == {n}, (
        f"README claims {sorted(claimed)} queries; registry has {n} — "
        "update README.md (or this regex if the phrasing changed)"
    )
