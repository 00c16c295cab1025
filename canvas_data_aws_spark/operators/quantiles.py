"""Mergeable stratified quantile digest — percentiles at 100 TB without a
global sort.

The missing member of the sketch family (bloom / HLL / Misra-Gries / CMS,
plans/sketch_q.py): a quantile summary that is (a) FIXED-SIZE per group —
``b`` centroids regardless of input rows, (b) MERGEABLE — any rollup
window (week, month, trailing-7d) is a re-stratification of the daily
state table, never a rescan of history, and (c) fully DETERMINISTIC, so
unlike t-digest/KLL it earns an EXACT DuckDB oracle instead of the usual
rows-only check.

Reference parity note: the reference delegates all query execution to a
SQL warehouse (sync-canvas-data-files.py:170-235 registers tables and
lets Athena answer); `approx_percentile` over full history is the shape
users run there. This operator is that capability restructured for
incremental maintenance: per-day digests persist as a b-rows/day state
table; every later quantile is answered from the digest.

Determinism design (why this sketch hash-matches DuckDB bit-for-bit):
- strata assignment is ``ntile(b)`` over a UNIQUE order (value, tiebreak)
  — ANSI ntile, identical in both engines;
- per-centroid state is (SUM(value::DECIMAL(18,6)), COUNT) — decimal sums
  are exact and order-independent, so shuffle order cannot perturb them;
- merge re-stratifies by INTEGER arithmetic only:
  ``mbucket = (cum_before * b) div total`` (bigint div bigint — exact at
  any scale, where float division would lose exactness past 2^53 rows);
- the only float ops are one decimal→double cast + one division per
  output row, both IEEE-defined, rounded to 6 places.

Error bound: a b-strata digest pins every value's rank within total/b, so
a queried quantile's rank error is <= 2/b after one merge level
(build strata + merge strata); tests/test_sketches.py asserts it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

DIGEST_B = 64  # centroids per merged digest
BUILD_B = 32  # centroids per per-group (daily) digest


def quantile_digest_build(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    group_cols: list[str],
    b: int = BUILD_B,
) -> DataFrame:
    """Per-group digest: ``b`` equal-count strata over the sorted values.

    One shuffle (hash by group) + per-group sort — the build pays the sort
    ONCE per group partition (a day of data, not all history); everything
    downstream touches only the b-row summaries. Output columns:
    group_cols + (bucket, c_sum DECIMAL, c_w BIGINT).
    """
    w = Window.partitionBy(*group_cols).orderBy(value_col, tiebreak_col)
    return (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("bucket", F.ntile(b).over(w))
        .groupBy(*group_cols, "bucket")
        .agg(
            F.sum(F.col(value_col).cast("decimal(18,6)")).alias("c_sum"),
            F.count(F.lit(1)).alias("c_w"),
        )
    )


def quantile_digest_merge(
    centroids: DataFrame,
    merge_cols: list[str],
    order_tiebreaks: list[str],
    b: int = DIGEST_B,
) -> DataFrame:
    """Merge many digests into one ``b``-centroid digest per merge group.

    Sort centroids by their mean, re-stratify by cumulative weight into b
    equal-WEIGHT buckets (integer div keeps it exact at any scale), and
    collapse each bucket back to (sum, weight). The exchange carries only
    centroid rows — b_build x groups, never data rows. Output:
    merge_cols + (mbucket, m_sum, m_w, cum_w, total_w), cum_w strictly
    increasing within a group (weights >= 1) and totalled for querying.
    """
    mean = (F.col("c_sum").cast("double") / F.col("c_w")).alias("c_mean")
    cent = centroids.select(*merge_cols, "c_sum", "c_w", mean, *order_tiebreaks)
    w_ord = Window.partitionBy(*merge_cols).orderBy("c_mean", *order_tiebreaks)
    w_all = Window.partitionBy(*merge_cols)
    staged = cent.select(
        *merge_cols,
        "c_sum",
        "c_w",
        "c_mean",
        F.sum("c_w").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("c_w").over(w_all).alias("total"),
    ).withColumn(
        "mbucket",
        F.least(F.expr(f"((cum - c_w) * {b}) div total"), F.lit(b - 1)),
    )
    merged = staged.groupBy(*merge_cols, "mbucket").agg(
        F.sum("c_sum").alias("m_sum"), F.sum("c_w").alias("m_w")
    )
    w_m = Window.partitionBy(*merge_cols).orderBy("mbucket")
    w_mt = Window.partitionBy(*merge_cols)
    return merged.select(
        *merge_cols,
        "mbucket",
        "m_sum",
        "m_w",
        F.sum("m_w").over(w_m.rowsBetween(Window.unboundedPreceding, 0)).alias("cum_w"),
        F.sum("m_w").over(w_mt).alias("total_w"),
    )


def quantile_digest_query(
    merged: DataFrame, p_mils: list[int], merge_cols: list[str]
) -> DataFrame:
    """Answer quantiles from a merged digest — touches ZERO data rows.

    Quantiles arrive as integer permille (500 = median) so the target rank
    ``ceil(p_mil * total / 1000)`` stays in exact integer arithmetic. The
    estimate is the mean of the first centroid whose cumulative weight
    covers the target rank — rank-1 by cum_w among covering centroids,
    unique because cum_w is strictly increasing; one pass, no self-join
    (a min+join-back shape would recompute the digest branch twice —
    the same lesson the round-10 bounded-mode probe taught the doc-freq
    filter). Output: merge_cols + (p_mil, est, n_total).
    """
    spark = merged.sparkSession
    qs = spark.createDataFrame([(p,) for p in p_mils], "p_mil int")
    hits = (
        merged.crossJoin(F.broadcast(qs))
        .withColumn("target", F.expr("(p_mil * total_w + 999) div 1000"))
        .filter(F.col("cum_w") >= F.col("target"))
    )
    w_pick = Window.partitionBy(*merge_cols, "p_mil").orderBy("cum_w")
    return (
        hits.withColumn("rk", F.row_number().over(w_pick))
        .filter(F.col("rk") == 1)
        .select(
            *merge_cols,
            "p_mil",
            F.round(F.col("m_sum").cast("double") / F.col("m_w"), 6).alias("est"),
            F.col("total_w").cast("bigint").alias("n_total"),
        )
    )
