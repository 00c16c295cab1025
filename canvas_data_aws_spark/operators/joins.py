"""Composite join operators the engine provides as library functions.

The reference's query surface is star-schema SQL delegated to an external
engine (SURVEY.md §2 Part B); standard joins map 1:1 to DataFrame ``join``.
The two shapes Spark lacks as single primitives — point-in-interval range
join and as-of join — are built here as *compositions* of built-in operators
so Catalyst still owns the physical plan (SURVEY.md §4: no custom planner
rules needed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join: for every left row, the single latest right row with
    ``right_ts <= left_ts`` on the same key (SURVEY.md §2 B.3 `join_asof`).

    Semantics pinned (SURVEY.md §7 hard part c): backward-looking, inclusive
    (``<=``), ties broken by ``tie_breakers`` descending (must make the right
    side unique for determinism). ``how='left'`` keeps unmatched left rows.
    ``direction='forward'`` flips both: the EARLIEST right row with
    ``right_ts >= left_ts``, ties ascending (pandas merge_asof's other
    direction) — same argmin/argmax-aggregate shape, so the scale behavior
    is identical. ``direction='nearest'`` picks the right row minimizing
    ``|right_ts - left_ts|`` (no range restriction; equal distances break
    toward the earlier right_ts, then tie_breakers ascending) via an
    argmin over an (abs-distance, right_ts, ...) struct — still one
    map-side-collapsed row per left row through the exchange.

    Implementation: equi-range join + per-left-row argmax via MAX over a
    (right_ts, tie_breakers..., right columns) struct. The aggregation gets
    map-side partial combine, so the join fan-out collapses to one row per
    left row *before* the shuffle — at scale this moves O(left rows), not
    O(join matches), through the exchange (a window-dedup would shuffle the
    full fan-out). For very wide time ranges, additionally pre-bucket right
    by (key, coarse time bucket) to bound the join fan-out itself.

    ``tolerance_seconds`` (pandas merge_asof's ``tolerance``) rejects
    matches farther than the given gap from the left timestamp. Besides the
    semantic use (a quote older than N days shouldn't price a trade), it is
    the scale lever for this operator: the range predicate becomes
    two-sided, so the join fan-out per left row is bounded by right-side
    density x tolerance instead of the whole key history — the
    pre-bucketing note above falls out for free once a tolerance exists.
    """
    tie_breakers = tie_breakers or []
    left_cols = left.columns
    right_cols = right.columns
    # Tag every left row uniquely so the argmax groups by exactly one left row.
    ltagged = left.select(F.monotonically_increasing_id().alias("__asof_lid"), "*")

    def _micros(col_name: str, frame: DataFrame):
        # Microsecond precision, NOT a long-seconds cast: flooring to whole
        # seconds would admit right rows up to ~1s OUTSIDE the tolerance
        # window for sub-second timestamps (floor(r) >= floor(l) - tol),
        # diverging from pandas merge_asof's exact two-sided interval.
        return F.unix_micros(frame[col_name].cast("timestamp"))

    # round, don't floor: int(0.5) * 1e6 would silently turn a half-second
    # tolerance into ZERO while the window compare is microsecond-exact
    tol = (
        None
        if tolerance_seconds is None
        else int(round(float(tolerance_seconds) * 1_000_000))
    )
    if direction == "forward":
        rng = right[right_ts] >= ltagged[left_ts]
        if tol is not None:
            rng = rng & (_micros(right_ts, right) <= _micros(left_ts, ltagged) + tol)
    elif direction == "nearest":
        rng = F.lit(True)
        if tol is not None:
            gap = _micros(right_ts, right) - _micros(left_ts, ltagged)
            rng = (gap >= -tol) & (gap <= tol)
    else:
        rng = right[right_ts] <= ltagged[left_ts]
        if tol is not None:
            rng = rng & (_micros(right_ts, right) >= _micros(left_ts, ltagged) - tol)
    cond = (ltagged[left_key] == right[right_key]) & rng
    joined = ltagged.join(right, cond, "left" if how == "left" else "inner")

    ordered_fields = [right_ts] + tie_breakers
    rest = [c for c in right_cols if c not in ordered_fields]
    if direction == "nearest":
        # microsecond distance (cast through TIMESTAMP: NTZ-typed columns
        # reject a direct unix_micros) — whole-second flooring would mis-rank
        # sub-second-separated candidates
        dist = F.abs(
            F.unix_micros(F.col(right_ts).cast("timestamp"))
            - F.unix_micros(F.col(left_ts).cast("timestamp"))
        ).alias("__asof_dist")
        best = F.min(F.struct(dist, *ordered_fields, *rest)).alias("__asof_best")
    else:
        pick = F.min if direction == "forward" else F.max
        best = pick(F.struct(*ordered_fields, *rest)).alias("__asof_best")
    agg = joined.groupBy("__asof_lid").agg(
        *[F.first(c).alias(c) for c in left_cols], best
    )
    return agg.select(
        *left_cols, *[F.col(f"__asof_best.{c}").alias(c) for c in right_cols]
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
) -> DataFrame:
    """Interval-overlap join: every (left, right) pair whose date intervals
    [left_start, left_end] and [right_start, right_end] overlap.

    A naive formulation (``l.start <= r.end AND r.start <= l.end``) has no
    equi-key, so Spark plans a broadcast-nested-loop / cartesian — O(|L||R|)
    comparisons, a non-starter at scale. This operator builds the classic
    *temporal-grid* equi-join instead: each interval is exploded to the
    month buckets it spans (bounded fan-out for bounded interval length),
    the two sides equi-join on the bucket, and the overlap predicate runs
    as a residual. Duplicate elimination is free — a pair is emitted only
    from the single bucket containing ``greatest(l.start, r.start)`` (the
    first month both intervals are live), so no ``distinct`` pass and no
    second shuffle.

    Scale: shuffle keys are months — at 100 TB pick the grid grain so
    per-bucket row counts stay executor-sized (day grain for dense data);
    AQE skew-split handles hot buckets. Fan-out = interval length / grain.
    """
    l_buck = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.trunc(F.col(left_start), "month"),
                F.trunc(F.col(left_end), "month"),
                F.expr("interval 1 month"),
            )
        ),
    )
    r_buck = right.withColumn(
        "__rbucket",
        F.explode(
            F.sequence(
                F.trunc(F.col(right_start), "month"),
                F.trunc(F.col(right_end), "month"),
                F.expr("interval 1 month"),
            )
        ),
    )
    cond = (
        (l_buck["__bucket"] == r_buck["__rbucket"])
        & (l_buck[left_start] <= r_buck[right_end])
        & (r_buck[right_start] <= l_buck[left_end])
        # emit each overlapping pair exactly once: from the bucket where
        # the overlap begins (no distinct needed afterwards)
        & (
            l_buck["__bucket"]
            == F.trunc(F.greatest(l_buck[left_start], r_buck[right_start]), "month")
        )
    )
    return l_buck.join(r_buck, cond).drop("__bucket", "__rbucket")
