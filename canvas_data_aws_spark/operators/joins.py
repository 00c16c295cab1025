"""Composite join operators the engine provides as library functions.

The reference's query surface is star-schema SQL delegated to an external
engine (SURVEY.md §2 Part B); standard joins map 1:1 to DataFrame ``join``.
The two shapes Spark lacks as single primitives — point-in-interval range
join and as-of join — are built here as *compositions* of built-in operators
so Catalyst still owns the physical plan (SURVEY.md §4: no custom planner
rules needed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F


def range_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    interval_start: Column,
    interval_end: Column,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join: left rows matched to right rows whose
    [interval_start, interval_end] contains left[left_ts], with an equi-key
    prefix.

    Scale: the equi-key prefix keeps this a hash/sort-merge *equi* join with
    the range as a residual predicate — never a cross product. Shuffle is on
    the key; skewed keys are handled by AQE skew-join splitting. Without an
    equi-prefix Spark would fall back to BNLJ — callers must provide one
    (the reference's analog: per-table directory scoping, the implicit key).
    """
    cond = (
        (left[left_key] == right[right_key])
        & (left[left_ts] >= interval_start)
        & (left[left_ts] <= interval_end)
    )
    return left.join(right, cond, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    tie_breakers: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """As-of join: for every left row, the single latest right row with
    ``right_ts <= left_ts`` on the same key (SURVEY.md §2 B.3 `join_asof`).

    Semantics pinned (SURVEY.md §7 hard part c): backward-looking, inclusive
    (``<=``), ties broken by ``tie_breakers`` descending (must make the right
    side unique for determinism). ``how='left'`` keeps unmatched left rows.

    Implementation: equi-range join + per-left-row ``row_number`` dedup.
    Catalyst plans the equi-key shuffle; the window re-uses the same hash
    partitioning on the left key via the subsequent partitionBy, so at scale
    this is two stages over one logical shuffle footprint. For very wide time
    ranges, pre-bucket right by (key, coarse time bucket) to bound the
    intermediate fan-out.
    """
    tie_breakers = tie_breakers or []
    # Tag every left row uniquely so the dedup window has a stable partition.
    lid = F.monotonically_increasing_id().alias("__asof_lid")
    ltagged = left.select(lid, "*")
    cond = (ltagged[left_key] == right[right_key]) & (right[right_ts] <= ltagged[left_ts])
    joined = ltagged.join(right, cond, "left" if how == "left" else "inner")
    order = [F.col(right_ts).desc_nulls_last()] + [F.col(t).desc_nulls_last() for t in tie_breakers]
    w = Window.partitionBy("__asof_lid").orderBy(*order)
    return (
        joined.withColumn("__asof_rn", F.row_number().over(w))
        .filter(F.col("__asof_rn") == 1)
        .drop("__asof_rn", "__asof_lid")
    )
