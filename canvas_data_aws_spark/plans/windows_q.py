"""B.5 window functions (SURVEY.md §2).

Determinism: every ORDER BY inside a window carries a unique tie-breaker
(o_orderkey) wherever the function is sensitive to row order (row_number,
ntile, lag/lead, frames); rank/dense_rank/percent_rank deliberately order by
a tie-prone key to exercise tie semantics — their outputs are still
deterministic. Scale: one shuffle per distinct partitioning; all five
queries below partition by o_custkey so a real pipeline would share one
exchange across them.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from canvas_data_aws_spark.plans.registry import register
from canvas_data_aws_spark.sources.parquet import load_table


@register(
    "win_rank",
    """
    SELECT o_orderkey,
           ROW_NUMBER()  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
           RANK()        OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS rnk,
           DENSE_RANK()  OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS drnk,
           NTILE(4)      OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS quartile,
           ROUND(PERCENT_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderdate), 9) AS pct_rnk
    FROM orders
    """,
    doc="Ranking family: row_number/rank/dense_rank/ntile/percent_rank.",
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w_unique = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_ties = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    w_key = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return o.select(
        "o_orderkey",
        F.row_number().over(w_unique).alias("rn"),
        F.rank().over(w_ties).alias("rnk"),
        F.dense_rank().over(w_ties).alias("drnk"),
        F.ntile(4).over(w_key).alias("quartile"),
        F.round(F.percent_rank().over(w_ties), 9).alias("pct_rnk"),
    )


@register(
    "win_analytic",
    """
    SELECT o_orderkey,
           LAG(o_totalprice)  OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           FIRST_VALUE(o_orderkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_key,
           LAST_VALUE(o_orderkey)  OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="Analytic offsets: lag/lead/first_value/last_value with explicit "
    "unbounded frames (default frames differ across engines).",
)
def win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_orderkey").over(w_full).alias("first_key"),
        F.last("o_orderkey").over(w_full).alias("last_key"),
    )


@register(
    "win_agg_frame_rows",
    """
    SELECT o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3
    FROM orders
    """,
    doc="ROWS frames: running total + 3-row moving average.",
)
def win_agg_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).alias(
            "running_total"
        ),
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).alias("moving_avg3"),
    )


@register(
    "win_agg_frame_range",
    """
    SELECT o_orderkey,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW) AS n_within_5k
    FROM orders
    """,
    doc="RANGE (value-based) frame: peers counted by totalprice proximity, "
    "not row position — deterministic under ties by construction.",
)
def win_agg_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-5000, 0)
    return o.select("o_orderkey", F.count(F.lit(1)).over(w).alias("n_within_5k"))


@register(
    "win_topk_per_group",
    """
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
      FROM orders
    )
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM ranked WHERE rn <= 3
    """,
    doc="Top-k per group (k=3 priciest orders per customer). At scale Catalyst "
    "pushes a per-partition rank limit before the final filter.",
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "win_ntile_buckets",
    """
    WITH t AS (
      SELECT o_orderstatus, o_totalprice,
             NTILE(10) OVER (PARTITION BY o_orderstatus
                             ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders
    )
    SELECT o_orderstatus, CAST(decile AS INT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(MIN(o_totalprice), 2) AS decile_min,
           ROUND(MAX(o_totalprice), 2) AS decile_max
    FROM t GROUP BY o_orderstatus, decile
    """,
    doc="Decile bucketing per status (NTILE) rolled into decile boundary "
    "stats — the spend-band segmentation query, with the o_orderkey "
    "tie-break pinning determinism. Honest scale note: the partition key "
    "here is LOW-cardinality (three statuses), so exact NTILE funnels "
    "each status into one sorted window partition — fine at warehouse "
    "dimension sizes, but at a 100 TB fact table the right shape is "
    "percentile cutpoints + a row-local bucket lookup — registered as "
    "win_quartile_cutpoints below; this query intentionally exercises "
    "the exact window surface.",
)
def win_ntile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return (
        o.withColumn("decile", F.ntile(10).over(w))
        .groupBy("o_orderstatus", F.col("decile").cast("int").alias("decile"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("decile_min"),
            F.round(F.max("o_totalprice"), 2).alias("decile_max"),
        )
    )


@register(
    "win_quartile_cutpoints",
    """
    WITH cuts AS (
      SELECT o_orderstatus,
             percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS q25,
             percentile_disc(0.50) WITHIN GROUP (ORDER BY o_totalprice) AS q50,
             percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS q75
      FROM orders GROUP BY o_orderstatus
    ),
    b AS (
      SELECT o.o_orderstatus,
             CAST(1 + (CASE WHEN o.o_totalprice > c.q25 THEN 1 ELSE 0 END)
                    + (CASE WHEN o.o_totalprice > c.q50 THEN 1 ELSE 0 END)
                    + (CASE WHEN o.o_totalprice > c.q75 THEN 1 ELSE 0 END)
               AS INT) AS quartile,
             o.o_totalprice
      FROM orders o JOIN cuts c ON c.o_orderstatus = o.o_orderstatus
    )
    SELECT o_orderstatus, quartile,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(MIN(o_totalprice), 2) AS band_min,
           ROUND(MAX(o_totalprice), 2) AS band_max
    FROM b GROUP BY o_orderstatus, quartile
    """,
    doc="Quartile spend bands per status via percentile_disc VALUE "
    "CUTPOINTS — the scale-safe counterpart to win_ntile_buckets' exact "
    "NTILE: one grouped exact-percentile aggregate (three cutpoints per "
    "status, group-count-bounded output) joined back on the group key, "
    "then a row-local CASE. No per-group sorted window anywhere, so a "
    "status whose rows outgrow one task costs nothing extra; tied values "
    "share a band (value-defined, unlike NTILE's rank split). The same "
    "pattern fixed the round-5 single-partition-window weak items "
    "(orders_pareto_share / customer_rfm_segments); at 100 TB swap "
    "percentile_disc for approx_percentile to make the cutpoint pass "
    "single-shuffle mergeable with identical plan shape.",
    tags=("windows", "warehouse"),
)
def win_quartile_cutpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderstatus", "o_totalprice")
    cuts = o.groupBy("o_orderstatus").agg(
        *[
            F.expr(f"percentile_disc({p}) WITHIN GROUP (ORDER BY o_totalprice)").alias(
                f"q{tag}"
            )
            for p, tag in ((0.25, 25), (0.50, 50), (0.75, 75))
        ]
    )
    quartile = (
        F.lit(1)
        + F.when(F.col("o_totalprice") > F.col("q25"), 1).otherwise(0)
        + F.when(F.col("o_totalprice") > F.col("q50"), 1).otherwise(0)
        + F.when(F.col("o_totalprice") > F.col("q75"), 1).otherwise(0)
    )
    return (
        o.join(cuts, "o_orderstatus")
        .groupBy("o_orderstatus", quartile.cast("int").alias("quartile"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("band_min"),
            F.round(F.max("o_totalprice"), 2).alias("band_max"),
        )
    )
