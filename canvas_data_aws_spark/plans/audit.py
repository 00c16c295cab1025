"""Physical-plan audit helpers: make optimizer guarantees testable.

"Would this plan survive a 100x scale-up?" is a property of the *physical
plan*, not the output — these helpers expose the plan text so tests can
assert pushdown/pruning/broadcast/top-k fusion instead of hoping for them.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def read_schema_columns(plan: str) -> set[str]:
    """Columns that actually reach the Parquet reader (column pruning)."""
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def pushed_filters(plan: str) -> list[str]:
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(f.strip() for f in m.group(1).split(",") if f.strip())
    return out


def has_operator(plan: str, op: str) -> bool:
    return op in plan


def broadcast_hint_count(df: DataFrame) -> int:
    """Number of explicit broadcast hints in the *analyzed* logical plan.

    A `ResolvedHint` survives analysis wherever `F.broadcast(...)` (or a SQL
    /*+ BROADCAST */ hint) was written, regardless of what the optimizer
    later picks. Plans over growing-cardinality sides must show ZERO forced
    hints — the optimizer/AQE may still broadcast when stats say the side is
    genuinely small, which is exactly the behaviour we want at 100 TB."""
    analyzed = df._jdf.queryExecution().analyzed().toString()
    return analyzed.count("ResolvedHint")
