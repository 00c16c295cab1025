"""B.4 aggregations (SURVEY.md §2).

Catalyst plans every groupBy as partial (map-side) + final aggregation
automatically, so shuffled bytes scale with group cardinality, not row
count. Rounding discipline: SUM/AVG/VAR over doubles are rounded in both
engines (partition-order-dependent in IEEE754); MIN/MAX/COUNT are exact.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from canvas_data_aws_spark.plans.registry import register
from canvas_data_aws_spark.sources.parquet import load_table


@register(
    "agg_hash_groupby",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Grouped count/min/max/sum — the canonical partial+final hash aggregate.",
)
def agg_hash_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


@register(
    "agg_global",
    """
    SELECT COUNT(*) AS n_rows,
           ROUND(SUM(l_quantity), 2) AS total_qty,
           MIN(l_shipdate) AS first_ship,
           MAX(l_shipdate) AS last_ship,
           ROUND(AVG(l_extendedprice), 4) AS avg_price
    FROM lineitem
    """,
    doc="Ungrouped (global) aggregate — single final reduce.",
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
    )


@register(
    "agg_count_distinct",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Exact distinct counts (expand+two-phase aggregate in Catalyst).",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
    )


@register(
    "agg_approx_count_distinct",
    None,  # HLL sketches are engine-specific — rows-only check by design
    doc="HyperLogLog++ distinct estimate (rsd=0.01). At 100 TB this replaces "
    "the shuffle-heavy exact distinct with a mergeable fixed-size sketch.",
    quality_test="tests/test_sketches.py::test_agg_approx_count_distinct_error_bound",
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"))
    )


@register(
    "agg_approx_percentile",
    None,  # GK-sketch quantiles are engine-specific — rows-only check
    doc="Approximate percentiles via percentile_approx (Greenwald-Khanna): "
    "mergeable, bounded-memory — the scale path for quantiles. Output is "
    "scalar p50/p90/p99 columns (one sketch, element_at fan-out) so the "
    "harness can canonicalize rows.",
    quality_test="tests/test_sketches.py::test_agg_approx_percentile_rank_error",
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    pcts = F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10000)
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
            F.element_at(pcts, 1).alias("p50"),
            F.element_at(pcts, 2).alias("p90"),
            F.element_at(pcts, 3).alias("p99"),
        )
    )


@register(
    "agg_distinct_rows",
    "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    doc="SELECT DISTINCT as hash aggregate over the full row.",
)
def agg_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@register(
    "agg_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    doc="GROUP BY GROUPING SETS: one expand + one aggregate, not N scans.",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("cda_li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_rows,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM cda_li_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@register(
    "agg_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           ROUND(SUM(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="Hierarchical subtotals (rollup).",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


@register(
    "agg_cube",
    """
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="All grouping combinations (cube).",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "agg_collect",
    """
    SELECT c_mktsegment,
           array_to_string(list_sort(list(DISTINCT c_nationkey)), ',') AS nation_keys
    FROM customer
    GROUP BY c_mktsegment
    """,
    doc="Grouped collection (array_agg analog): collect_set sorted then joined "
    "to a string for a deterministic, dialect-portable value.",
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.array_join(F.sort_array(F.collect_set("c_nationkey")), ",").alias("nation_keys")
        )
    )


@register(
    "agg_stats",
    """
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
           ROUND(var_samp(l_quantity), 6)    AS var_qty,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_discount), 8) AS cov_qty_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Statistical aggregates: stddev/variance/corr/covar (all single-pass "
    "mergeable moments in both engines).",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 8).alias("cov_qty_disc"),
    )


@register(
    "agg_mode_deterministic",
    """
    WITH counts AS (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      FROM orders GROUP BY o_orderstatus, o_orderpriority
    )
    SELECT o_orderstatus,
           (MAX(struct_pack(n := n, p := o_orderpriority))).p AS mode_priority,
           CAST((MAX(struct_pack(n := n, p := o_orderpriority))).n AS BIGINT) AS mode_count
    FROM counts
    GROUP BY o_orderstatus
    """,
    doc="Deterministic MODE per group: two-level aggregate (count per "
    "value, then argmax-over-struct with the value itself as tie-break) — "
    "both shuffles carry only (group, value, count) partials, and unlike a "
    "bare mode() the tie behavior is pinned, so it oracle-checks exactly.",
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
    return counts.groupBy("o_orderstatus").agg(
        F.max_by("o_orderpriority", F.struct("n", "o_orderpriority")).alias("mode_priority"),
        F.max("n").cast("bigint").alias("mode_count"),
    )


@register(
    "agg_linear_fit",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(regr_slope(value, epoch_us(ts) / 3600000000.0), 5) AS slope_per_hour,
           ROUND(regr_intercept(value, epoch_us(ts) / 3600000000.0), 4) AS intercept,
           ROUND(corr(value, epoch_us(ts) / 3600000000.0), 5) AS r
    FROM events
    GROUP BY event_type
    """,
    doc="Per-group OLS trend (value vs. time-in-hours) via the closed-form "
    "regression AGGREGATES (regr_slope / regr_intercept / corr) — trend "
    "detection as one scan with map-side partial moments (sum, sum-sq, "
    "cross-product), never a per-group model fit or driver loop. The "
    "moments merge associatively, so the same query incrementalizes the "
    "way table_incremental_agg does.",
)
def agg_linear_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    x = F.unix_micros("ts") / 3.6e9
    return e.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.regr_slope("value", x), 5).alias("slope_per_hour"),
        F.round(F.regr_intercept("value", x), 4).alias("intercept"),
        F.round(F.corr("value", x), 5).alias("r"),
    )


@register(
    "agg_corr_matrix",
    """
    SELECT ROUND(corr(l_quantity, l_extendedprice), 5) AS qty_price,
           ROUND(corr(l_quantity, l_discount), 5) AS qty_disc,
           ROUND(corr(l_quantity, l_tax), 5) AS qty_tax,
           ROUND(corr(l_extendedprice, l_discount), 5) AS price_disc,
           ROUND(corr(l_extendedprice, l_tax), 5) AS price_tax,
           ROUND(corr(l_discount, l_tax), 5) AS disc_tax
    FROM lineitem
    """,
    doc="Pairwise correlation matrix of the lineitem measures in ONE scan: "
    "all six corr aggregates share a single pass with map-side partial "
    "moments (count, sums, cross-products) that merge associatively — the "
    "feature-screening step before a model fit, at 100 TB the same cost "
    "as any one of them.",
)
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pairs = [
        ("l_quantity", "l_extendedprice", "qty_price"),
        ("l_quantity", "l_discount", "qty_disc"),
        ("l_quantity", "l_tax", "qty_tax"),
        ("l_extendedprice", "l_discount", "price_disc"),
        ("l_extendedprice", "l_tax", "price_tax"),
        ("l_discount", "l_tax", "disc_tax"),
    ]
    return li.agg(
        *[F.round(F.corr(a, b), 5).alias(name) for a, b, name in pairs]
    )


@register(
    "agg_decimal_exact",
    """
    SELECT o_orderstatus,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18, 4))) AS DECIMAL(38, 4))
                AS DOUBLE) AS total_price_exact,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="Exact decimal money aggregation: prices cast to DECIMAL(18,4) "
    "BEFORE summing, so the group totals are exact integers-of-cents — "
    "identical regardless of partitioning or merge order, unlike double "
    "sums whose low bits depend on reduction order (the reason every "
    "float aggregate in this registry carries a ROUND). Spark's decimal "
    "sum stays mergeable (map-side partial aggregation applies, state is "
    "a 128-bit value per group); the final cast to DOUBLE is for the "
    "comparable surface only — by then the value is already exact.",
    tags=("aggregates",),
)
def agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderstatus", "o_totalprice")
    return o.groupBy("o_orderstatus").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("decimal(38,4)")
        .cast("double")
        .alias("total_price_exact"),
        F.count("*").cast("bigint").alias("n_orders"),
    )


@register(
    "agg_moments",
    """
    WITH sums AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             SUM(l_quantity) AS s1,
             SUM(l_quantity * l_quantity) AS s2,
             SUM(l_quantity * l_quantity * l_quantity) AS s3,
             SUM(l_quantity * l_quantity * l_quantity * l_quantity) AS s4
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_rows,
           ROUND(s1 / n, 4) AS mean_qty,
           ROUND(s2 / n - (s1 / n) * (s1 / n), 4) AS var_pop,
           ROUND((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
                 / POWER(s2 / n - (s1 / n) * (s1 / n), 1.5), 4) AS skewness,
           ROUND((s4 / n - 4 * (s1 / n) * (s3 / n) + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                  - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
                 / POWER(s2 / n - (s1 / n) * (s1 / n), 2) - 3, 4) AS excess_kurtosis
    FROM sums
    """,
    doc="Higher statistical moments (mean/variance/skewness/excess "
    "kurtosis) from raw power sums s1..s4 — ONE distributed agg with "
    "map-side partial combine and O(groups) state, then row-local central-"
    "moment algebra. Built-in skewness()/kurtosis() differ between engines "
    "(sample vs population conventions); spelling the power-sum formula "
    "out makes the computation engine-portable AND single-pass — the same "
    "trick streaming moment sketches use (mergeable power sums).",
    tags=("aggregates",),
)
def agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    q = F.col("l_quantity")
    sums = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
        F.sum(q * q * q).alias("s3"),
        F.sum(q * q * q * q).alias("s4"),
    )
    m = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - m * m
    m3 = F.col("s3") / F.col("n") - 3 * m * (F.col("s2") / F.col("n")) + 2 * m * m * m
    m4 = (
        F.col("s4") / F.col("n")
        - 4 * m * (F.col("s3") / F.col("n"))
        + 6 * m * m * (F.col("s2") / F.col("n"))
        - 3 * m * m * m * m
    )
    return sums.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n_rows"),
        F.round(m, 4).alias("mean_qty"),
        F.round(m2, 4).alias("var_pop"),
        F.round(m3 / F.pow(m2, 1.5), 4).alias("skewness"),
        F.round(m4 / F.pow(m2, 2) - 3, 4).alias("excess_kurtosis"),
    )
