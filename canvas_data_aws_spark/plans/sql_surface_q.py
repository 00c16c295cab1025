"""The SQL-string surface: the reference's analysts write Athena SQL, not
DataFrame code (SURVEY.md §3.3 — the delegated query path). These queries
run analyst-shaped SQL verbatim through spark.sql over registered views:
CTE chains, IN/EXISTS subqueries, correlated scalar subqueries — the
dialect-portable text is also the oracle."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from canvas_data_aws_spark.plans.registry import register
from canvas_data_aws_spark.sources.parquet import load_table

_VIEWS = ("customer", "orders", "lineitem")


def _ensure_views(spark: SparkSession, sf_dir: str) -> None:
    for t in _VIEWS:
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"cda_sql_{t}")


@register(
    "sql_in_subquery",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      AND o_orderstatus = 'O'
    """,
    doc="Uncorrelated IN subquery: Catalyst rewrites to a left-semi join.",
)
def sql_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM cda_sql_orders
        WHERE o_custkey IN (SELECT c_custkey FROM cda_sql_customer WHERE c_mktsegment = 'BUILDING')
          AND o_orderstatus = 'O'
        """
    )


@register(
    "sql_scalar_subquery",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
    """,
    doc="Uncorrelated scalar subquery: single-row broadcast into the filter.",
)
def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM cda_sql_orders
        WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM cda_sql_orders)
        """
    )


@register(
    "sql_correlated_exists",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_totalprice > (SELECT AVG(o2.o_totalprice) FROM orders o2)
    )
    """,
    doc="Correlated EXISTS with a nested scalar subquery: decorrelated by "
    "Catalyst into joins (subquery decorrelation, SURVEY.md §4).",
)
def sql_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM cda_sql_customer c
        WHERE EXISTS (
          SELECT 1 FROM cda_sql_orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_totalprice > (SELECT AVG(o2.o_totalprice) FROM cda_sql_orders o2)
        )
        """
    )


@register(
    "sql_cte_chain",
    """
    WITH cust_spend AS (
      SELECT o_custkey, SUM(o_totalprice) AS spend, COUNT(*) AS n_orders
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT o_custkey, spend, n_orders,
             ROW_NUMBER() OVER (ORDER BY spend DESC, o_custkey) AS rnk
      FROM cust_spend
    )
    SELECT r.rnk, r.o_custkey, ROUND(r.spend, 2) AS spend, r.n_orders, c.c_mktsegment
    FROM ranked r JOIN customer c ON c.c_custkey = r.o_custkey
    WHERE r.rnk <= 25
    """,
    doc="Multi-CTE pipeline (aggregate -> window rank -> join -> filter) run "
    "as one SQL string — the analyst-workflow shape, end to end.",
)
def sql_cte_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_views(spark, sf_dir)
    return spark.sql(
        """
        WITH cust_spend AS (
          SELECT o_custkey, SUM(o_totalprice) AS spend, COUNT(*) AS n_orders
          FROM cda_sql_orders GROUP BY o_custkey
        ),
        ranked AS (
          SELECT o_custkey, spend, n_orders,
                 ROW_NUMBER() OVER (ORDER BY spend DESC, o_custkey) AS rnk
          FROM cust_spend
        )
        SELECT r.rnk, r.o_custkey, ROUND(r.spend, 2) AS spend, r.n_orders, c.c_mktsegment
        FROM ranked r JOIN cda_sql_customer c ON c.c_custkey = r.o_custkey
        WHERE r.rnk <= 25
        """
    )


@register(
    "sql_lateral_explode",
    """
    SELECT o.o_orderkey, s.yr
    FROM (SELECT o_orderkey, year(o_orderdate) AS y0 FROM orders WHERE o_orderkey < 200) o,
         LATERAL (SELECT unnest([y0, y0 + 1]) AS yr) s
    ORDER BY o_orderkey, yr
    """,
    doc="LATERAL VIEW / table-generator in SQL: each order row expands to "
    "(year, year+1) via explode — the SQL spelling of the UDTF surface.",
)
def sql_lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, yr
        FROM (SELECT o_orderkey, year(o_orderdate) AS y0
              FROM cda_sql_orders WHERE o_orderkey < 200)
        LATERAL VIEW explode(array(y0, y0 + 1)) t AS yr
        ORDER BY o_orderkey, yr
        """
    )


@register(
    "sql_pivot",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS st_o,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS st_f,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS st_p
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="SQL PIVOT: order counts by priority x status as columns (oracle "
    "spells it as FILTERed aggregates — the dialect-portable equivalent).",
)
def sql_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT * FROM (
          SELECT o_orderpriority, o_orderstatus FROM cda_sql_orders
        )
        PIVOT (COUNT(*) FOR o_orderstatus IN ('O' AS st_o, 'F' AS st_f, 'P' AS st_p))
        """
    ).select(
        "o_orderpriority",
        F.coalesce("st_o", F.lit(0)).alias("st_o"),
        F.coalesce("st_f", F.lit(0)).alias("st_f"),
        F.coalesce("st_p", F.lit(0)).alias("st_p"),
    )


@register(
    "sql_window_in_text",
    """
    SELECT c_mktsegment, o_orderkey, o_totalprice,
           CAST(rnk AS INT) AS rnk,
           ROUND(seg_share, 6) AS seg_share
    FROM (
      SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             RANK() OVER (PARTITION BY c.c_mktsegment ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rnk,
             o.o_totalprice / SUM(o.o_totalprice) OVER (PARTITION BY c.c_mktsegment) AS seg_share
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    )
    WHERE rnk <= 5
    """,
    doc="Window functions in SQL text (rank + ratio-to-group-total sharing "
    "ONE partition spec/exchange), filtered on rank — the QUALIFY idiom.",
)
def sql_window_in_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment, o_orderkey, o_totalprice,
               CAST(rnk AS INT) AS rnk,
               ROUND(seg_share, 6) AS seg_share
        FROM (
          SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
                 RANK() OVER (PARTITION BY c.c_mktsegment ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rnk,
                 o.o_totalprice / SUM(o.o_totalprice) OVER (PARTITION BY c.c_mktsegment) AS seg_share
          FROM cda_sql_orders o JOIN cda_sql_customer c ON c.c_custkey = o.o_custkey
        )
        WHERE rnk <= 5
        """
    )


@register(
    "sql_recursive_cte",
    """
    WITH RECURSIVE days(d) AS (
      SELECT DATE '1998-01-01'
      UNION ALL
      SELECT d + 1 FROM days WHERE d < DATE '1998-03-31'
    )
    SELECT CAST(d AS DATE) AS day,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
    FROM days LEFT JOIN orders ON CAST(o_orderdate AS DATE) = d
    GROUP BY 1
    """,
    doc="Recursive CTE (Spark 4 WITH RECURSIVE): generate a calendar spine "
    "covering Q1'98 and LEFT JOIN order counts onto it — the gap-filling "
    "shape that shows zero-activity days, which a plain GROUP BY can never "
    "emit. The recursion is driver-bounded (90 single-row steps producing "
    "a broadcastable spine); the fact side stays a single scan with the "
    "date filter pushed through the join.",
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE days(d) AS (
          SELECT DATE '1998-01-01'
          UNION ALL
          SELECT d + INTERVAL 1 DAY FROM days WHERE d < DATE '1998-03-31'
        )
        SELECT CAST(d AS DATE) AS day,
               CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
        FROM days LEFT JOIN cda_sql_orders
          ON CAST(o_orderdate AS DATE) = CAST(d AS DATE)
        GROUP BY 1
        """
    )


@register(
    "ts_holt_linear",
    """
    WITH RECURSIVE daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS y
      FROM events GROUP BY 1
    ),
    d0 AS (SELECT MIN(day) AS first_day FROM daily),
    series AS (
      SELECT DATEDIFF('day', d0.first_day, daily.day) AS t, daily.day, daily.y
      FROM daily CROSS JOIN d0
      WHERE DATEDIFF('day', d0.first_day, daily.day) < 45
    ),
    holt AS (
      SELECT s0.t, s0.day, s0.y, s0.y AS level, s1.y - s0.y AS trend
      FROM (SELECT * FROM series WHERE t = 0) s0
      CROSS JOIN (SELECT * FROM series WHERE t = 1) s1
      UNION ALL
      SELECT s.t, s.day, s.y,
             0.5 * s.y + 0.5 * (h.level + h.trend),
             0.3 * ((0.5 * s.y + 0.5 * (h.level + h.trend)) - h.level)
               + 0.7 * h.trend
      FROM holt h JOIN series s ON s.t = h.t + 1
    )
    SELECT t, day, y, level, trend, level + trend AS forecast_next
    FROM holt
    """,
    doc="Holt linear (double exponential) smoothing over the daily revenue "
    "series. The recurrence l_t = a*y_t + (1-a)*(l+b), b_t = "
    "B*(l_t-l)+(1-B)*b is inherently sequential, so the Spark plan splits "
    "it: the HEAVY part (daily rollup with exact DECIMAL sums) is one "
    "distributed aggregate, and the 45-step scalar recurrence folds "
    "row-locally over the collected day array with F.aggregate — ONE job, "
    "no driver loop, no per-step Spark iteration (the first cut ran the "
    "recurrence as a Spark 4 WITH RECURSIVE CTE: semantically identical "
    "but 44 tiny joins = 44 scheduled jobs, 12.3 s at sf0.1 vs ~1 s for "
    "the fold — the recursion-depth cost lives in the scheduler, not the "
    "data). The DuckDB oracle keeps the recursive-CTE spelling, proving "
    "fold == recursion bit-exactly: both run the identical double "
    "operation order, and smoothed values ship UNROUNDED. alpha=0.5, "
    "beta=0.3; day-gap semantics match the CTE (recursion stops at the "
    "first missing t+1 — the fold keeps only the consecutive-t prefix). "
    "At 100 TB only the rollup scales with data; the fold state is <= 45 "
    "structs in one row.",
    tags=("sql", "timeseries"),
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("y"))
    first = daily.agg(F.min("day").alias("first_day"))
    series = (
        daily.crossJoin(F.broadcast(first))
        .select(F.datediff("day", "first_day").alias("t"), "day", "y")
        .filter(F.col("t") < 45)
    )
    packed = series.agg(
        F.array_sort(F.collect_list(F.struct("t", "day", "y"))).alias("arr")
    )
    # Consecutive-t prefix: t is strictly increasing, so once t != index
    # (a day gap) every later element also mismatches — the (x, i) filter
    # keeps exactly the prefix the recursive oracle reaches.
    packed = packed.select(
        F.filter("arr", lambda x, i: x["t"] == i).alias("arr")
    ).filter(F.size("arr") >= 2)
    e1 = F.element_at("arr", 1)
    e2 = F.element_at("arr", 2)
    init = F.array(
        F.struct(
            e1["t"].alias("t"),
            e1["day"].alias("day"),
            e1["y"].alias("y"),
            e1["y"].alias("level"),
            (e2["y"] - e1["y"]).alias("trend"),
        )
    )

    def step(acc, s_el):
        prev = F.element_at(acc, -1)
        new_level = 0.5 * s_el["y"] + 0.5 * (prev["level"] + prev["trend"])
        new_trend = (
            0.3
            * (
                (0.5 * s_el["y"] + 0.5 * (prev["level"] + prev["trend"]))
                - prev["level"]
            )
            + 0.7 * prev["trend"]
        )
        return F.concat(
            acc,
            F.array(
                F.struct(
                    s_el["t"].alias("t"),
                    s_el["day"].alias("day"),
                    s_el["y"].alias("y"),
                    new_level.alias("level"),
                    new_trend.alias("trend"),
                )
            ),
        )

    folded = packed.select(
        F.aggregate(
            F.slice("arr", 2, F.greatest(F.size("arr") - 1, F.lit(0))),
            init,
            step,
        ).alias("out")
    )
    return folded.select(F.explode("out").alias("r")).select(
        F.col("r.t").alias("t"),
        F.col("r.day").alias("day"),
        F.col("r.y").alias("y"),
        F.col("r.level").alias("level"),
        F.col("r.trend").alias("trend"),
        (F.col("r.level") + F.col("r.trend")).alias("forecast_next"),
    )


@register(
    "ts_holt_winters_additive",
    """
    WITH RECURSIVE daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS y
      FROM events GROUP BY 1
    ),
    d0 AS (SELECT MIN(day) AS first_day FROM daily),
    series AS (
      SELECT DATEDIFF('day', d0.first_day, daily.day) AS t, daily.day, daily.y
      FROM daily CROSS JOIN d0
      WHERE DATEDIFF('day', d0.first_day, daily.day) < 45
    ),
    init AS (
      SELECT 6 AS t,
             CAST((SELECT SUM(CAST(y AS DECIMAL(18,6))) FROM series WHERE t <= 6)
                  AS DOUBLE) / 7.0 AS level,
             (CAST((SELECT SUM(CAST(y AS DECIMAL(18,6))) FROM series
                     WHERE t BETWEEN 7 AND 13) AS DOUBLE) / 7.0
              - CAST((SELECT SUM(CAST(y AS DECIMAL(18,6))) FROM series
                       WHERE t <= 6) AS DOUBLE) / 7.0) / 7.0 AS trend,
             (SELECT LIST(y - CAST((SELECT SUM(CAST(y2.y AS DECIMAL(18,6)))
                                     FROM series y2 WHERE y2.t <= 6)
                                   AS DOUBLE) / 7.0
                          ORDER BY t)
                FROM series WHERE t <= 6) AS seas
    ),
    hw(t, day, y, level, trend, seas) AS (
      SELECT i.t, CAST(NULL AS DATE), CAST(NULL AS DOUBLE),
             i.level, i.trend, i.seas
      FROM init i
      UNION ALL
      SELECT s.t, s.day, s.y,
             0.3 * (s.y - h.seas[1]) + 0.7 * (h.level + h.trend),
             0.1 * ((0.3 * (s.y - h.seas[1]) + 0.7 * (h.level + h.trend))
                    - h.level)
               + 0.9 * h.trend,
             list_append(h.seas[2:7],
               0.2 * (s.y - (0.3 * (s.y - h.seas[1])
                             + 0.7 * (h.level + h.trend)))
                 + 0.8 * h.seas[1])
      FROM hw h JOIN series s ON s.t = h.t + 1
    )
    SELECT t, day, y, level, trend,
           level + trend + seas[1] AS forecast_next
    FROM hw WHERE t >= 7
    """,
    doc="Holt-Winters additive triple smoothing (weekly season, m=7; "
    "alpha=0.3, beta=0.1, gamma=0.2) over the daily revenue series — the "
    "ts_holt_linear pattern extended with a seasonal state VECTOR: the "
    "rolling 7-element seasonal list rides the recursion (DuckDB "
    "recursive CTE carrying a LIST column) and the Spark side folds the "
    "identical recurrence row-locally with F.aggregate over an "
    "(out, level, trend, seas[7]) accumulator struct — ONE job, no "
    "driver loop. Initialization is the classical first-season scheme "
    "(level = first-week mean, trend = week-over-week mean change / 7, "
    "s_i = y_i - level), with every init mean computed from exact "
    "DECIMAL sums so no unordered double-sum crosses the compare; the "
    "recurrence expressions re-expand identically on both sides (the "
    "fold == recursion bit-parity contract ts_holt_linear established). "
    "forecast_next = level + trend + s_{t+1-m} (the freshly-rotated "
    "seas[1]). At 100 TB only the daily rollup scales with data; the "
    "fold state is one row of <= 45 structs + a 7-float vector.",
    tags=("sql", "timeseries"),
)
def ts_holt_winters_additive(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("y"))
    first = daily.agg(F.min("day").alias("first_day"))
    series = (
        daily.crossJoin(F.broadcast(first))
        .select(F.datediff("day", "first_day").alias("t"), "day", "y")
        .filter(F.col("t") < 45)
    )
    packed = series.agg(
        F.array_sort(F.collect_list(F.struct("t", "day", "y"))).alias("arr")
    )
    packed = packed.select(
        F.filter("arr", lambda x, i: x["t"] == i).alias("arr")
    ).filter(F.size("arr") >= 14)

    # Exact init means: per-day y is an exact 1e-6 multiple (it left a
    # DECIMAL(18,6) sum), so folding DECIMAL adds is order-free exact —
    # matching the oracle's DECIMAL subquery sums bit-for-bit.
    def dec_sum(sl):
        # decimal addition widens the type, which F.aggregate rejects
        # (merge type must equal the init type) — re-cast each partial
        # back to (18,6); exact, the weekly sums are nowhere near 1e12
        return F.aggregate(
            sl,
            F.lit(0).cast("decimal(18,6)"),
            lambda acc, x: (acc + x["y"].cast("decimal(18,6)")).cast(
                "decimal(18,6)"
            ),
        ).cast("double")

    week1 = dec_sum(F.slice("arr", 1, 7)) / 7.0
    week2 = dec_sum(F.slice("arr", 8, 7)) / 7.0
    level0 = week1
    trend0 = (week2 - week1) / 7.0
    seas0 = F.transform(F.slice("arr", 1, 7), lambda x: x["y"] - week1)
    out_t = (
        "array<struct<t:int,day:date,y:double,level:double,trend:double,"
        "forecast_next:double>>"
    )
    init = F.struct(
        F.expr(f"CAST(array() AS {out_t})").alias("out"),
        level0.alias("level"),
        trend0.alias("trend"),
        seas0.alias("seas"),
    )

    def step(acc, s_el):
        s_old = F.element_at(acc["seas"], 1)
        lvl, trd = acc["level"], acc["trend"]
        new_level = 0.3 * (s_el["y"] - s_old) + 0.7 * (lvl + trd)
        new_trend = (
            0.1 * ((0.3 * (s_el["y"] - s_old) + 0.7 * (lvl + trd)) - lvl)
            + 0.9 * trd
        )
        s_new = (
            0.2 * (s_el["y"] - (0.3 * (s_el["y"] - s_old) + 0.7 * (lvl + trd)))
            + 0.8 * s_old
        )
        new_seas = F.concat(F.slice(acc["seas"], 2, 6), F.array(s_new))
        row = F.struct(
            s_el["t"].alias("t"),
            s_el["day"].alias("day"),
            s_el["y"].alias("y"),
            new_level.alias("level"),
            new_trend.alias("trend"),
            (new_level + new_trend + F.element_at(new_seas, 1)).alias(
                "forecast_next"
            ),
        )
        return F.struct(
            F.concat(acc["out"], F.array(row)).alias("out"),
            new_level.alias("level"),
            new_trend.alias("trend"),
            new_seas.alias("seas"),
        )

    folded = packed.select(
        F.aggregate(
            F.slice("arr", 8, F.greatest(F.size("arr") - 7, F.lit(0))),
            init,
            step,
        )["out"].alias("out")
    )
    return folded.select(F.explode("out").alias("r")).select(
        F.col("r.t").alias("t"),
        F.col("r.day").alias("day"),
        F.col("r.y").alias("y"),
        F.col("r.level").alias("level"),
        F.col("r.trend").alias("trend"),
        F.col("r.forecast_next").alias("forecast_next"),
    )
