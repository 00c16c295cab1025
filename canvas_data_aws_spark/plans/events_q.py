"""Event-stream analytics over the ``events`` table: batch sessionization,
funnel conversion, cohort retention, and SCD2 dimension building — the
product-analytics surface a warehouse replacement needs beyond raw SQL.

Every op here is a declarative DataFrame plan (windows + aggregations, no
UDFs) so Catalyst plans them as ordinary shuffles: at 100 TB each query is
one (or two) exchanges on ``user_id`` — the natural partitioning key — and
every window runs inside its user partition with no global ordering.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from canvas_data_aws_spark.plans.registry import register
from canvas_data_aws_spark.sources.parquet import load_table

#: Gap (seconds) that splits two events into separate sessions.
SESSION_GAP_S = 2 * 3600


@register(
    "events_sessionize",
    f"""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             date_diff('second',
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                       ts) AS gap_s
      FROM events
    ),
    flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN gap_s IS NULL OR gap_s > {SESSION_GAP_S} THEN 1 ELSE 0 END AS is_new
      FROM ordered
    ),
    numbered AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_s
    FROM numbered
    GROUP BY user_id, session_no
    """,
    doc="Gap-based batch sessionization (gap > 2 h starts a new session): "
    "lag -> new-session flag -> running sum = session id, then one "
    "per-session rollup. Single shuffle on user_id; windows and the final "
    "groupBy reuse the same partitioning.",
    tags=("events",),
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    flagged = e.withColumn(
        "is_new",
        F.when(gap_s.isNull() | (gap_s > SESSION_GAP_S), F.lit(1)).otherwise(F.lit(0)),
    )
    numbered = flagged.withColumn(
        "session_no",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return numbered.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long")))
        .cast("bigint")
        .alias("duration_s"),
    )


@register(
    "events_funnel",
    """
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM s1) AS n_view,
           (SELECT COUNT(*) FROM s2) AS n_view_click,
           (SELECT COUNT(*) FROM s3) AS n_full_funnel,
           (SELECT ROUND(AVG(date_diff('second', s1.t1, s3.t3)), 4)
            FROM s1 JOIN s3 ON s1.user_id = s3.user_id) AS avg_convert_s
    """,
    doc="Ordered funnel view -> click -> purchase: each stage is a "
    "conditional min-ts aggregation joined to the previous stage (strictly "
    "increasing timestamps), so conversion respects event ORDER, not mere "
    "presence. Three user_id-partitioned aggregations, no window fan-out.",
    tags=("events",),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    # Each stage is a narrow user-grain rollup consumed by SEVERAL
    # downstream branches (s1 by s2/conv/counts, s2 by s3/counts, s3 by
    # conv/counts); unmaterialized, the scalar-subquery fan-out replayed
    # the events scan 10x. Checkpointing the three stage tables (§10
    # narrow-derived-table pattern) brings the corpus passes down to the
    # algorithm's floor of 3 — one per stage predicate.
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .localCheckpoint(eager=True)
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .localCheckpoint(eager=True)
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
        .localCheckpoint(eager=True)
    )
    conv = s1.join(s3, "user_id").agg(
        F.round(F.avg(F.col("t3").cast("long") - F.col("t1").cast("long")), 4).alias(
            "avg_convert_s"
        )
    )
    counts = (
        s1.agg(F.count("*").alias("n_view"))
        .crossJoin(s2.agg(F.count("*").alias("n_view_click")))
        .crossJoin(s3.agg(F.count("*").alias("n_full_funnel")))
    )
    return counts.crossJoin(conv).select(
        "n_view", "n_view_click", "n_full_funnel", "avg_convert_s"
    )


@register(
    "events_retention_cohort",
    """
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    )
    SELECT CAST(f.cohort_week AS DATE) AS cohort_week,
           CAST(date_diff('week', f.cohort_week, date_trunc('week', e.ts)) AS INT) AS week_offset,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM events e JOIN first_seen f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
    doc="Weekly retention cohorts: users bucketed by first-seen week, "
    "activity counted per week offset. One agg for cohort assignment, a "
    "hash join back (first_seen has one row per distinct user — its "
    "cardinality grows with the data, so no broadcast hint: first_seen is "
    "already partitioned on user_id from its agg, the raw events side "
    "shuffles on user_id once for the join, and AQE may still broadcast a "
    "genuinely small cohort table at runtime), one distinct-count agg.",
    tags=("events",),
)
def events_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    return (
        e.join(first_seen, "user_id")
        .select(
            F.col("cohort_week").cast("date").alias("cohort_week"),
            (
                F.floor(
                    (
                        F.date_trunc("week", F.col("ts")).cast("long")
                        - F.col("cohort_week").cast("long")
                    )
                    / (7 * 24 * 3600)
                )
            )
            .cast("int")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@register(
    "scd2_dimension_build",
    """
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    changes AS (
      SELECT user_id, ts, event_id, event_type
      FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type AS status, ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
    FROM changes
    """,
    doc="Type-2 slowly-changing dimension built from an event log: collapse "
    "consecutive identical statuses (lag filter), then derive "
    "[valid_from, valid_to) intervals with lead — the standard "
    "change-data-capture -> dimension pattern. Both windows share one "
    "user_id partitioning; no self-join.",
    tags=("events", "warehouse"),
)
def scd2_dimension_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
        .drop("prev_type")
    )
    return changes.select(
        "user_id",
        F.col("event_type").alias("status"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@register(
    "ts_resample_ffill",
    """
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             ROUND(AVG(value), 4) AS day_avg
      FROM events GROUP BY 1, 2
    ),
    spans AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM spans
    )
    SELECT g.user_id, g.day,
           LAST_VALUE(d.day_avg IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.day
             ROWS UNBOUNDED PRECEDING) AS value_ffill,
           d.day_avg IS NULL AS was_gap
    FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
    """,
    doc="Hypertable-style resample + forward fill: per-user daily averages "
    "snapped onto the user's full daily grid (sequence+explode — no "
    "driver-side calendar), gaps forward-filled with last(ignorenulls) over "
    "the same user_id partitioning. Grid build, join, and fill share one "
    "user_id shuffle family; no cross-user ordering exists anywhere.",
    tags=("events", "timeseries"),
)
def ts_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    daily = e.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.round(F.avg("value"), 4).alias("day_avg"))
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = spans.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    joined = grid.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id",
        "day",
        F.last("day_avg", ignorenulls=True).over(w).alias("value_ffill"),
        F.col("day_avg").isNull().alias("was_gap"),
    )


@register(
    "events_anomaly_zscore",
    """
    WITH scored AS (
      SELECT user_id, value,
             AVG(value) OVER w AS mu,
             STDDEV_SAMP(value) OVER w AS sigma,
             COUNT(*) OVER w AS n_hist
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id,
           COUNT(*) AS n_scored,
           CAST(SUM(CASE WHEN n_hist >= 10 AND sigma > 0
                          AND ABS((value - mu) / sigma) > 3 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM scored GROUP BY user_id
    """,
    doc="Trailing-window anomaly detection: each event scored against the "
    "mean/stddev of its user's previous 30 events (works on an ordered "
    "stream — no global statistics, no second pass), |z| > 3 flagged once "
    "at least 10 history rows exist. One user_id shuffle shared by the "
    "window and the rollup; integer outputs keep the cross-engine "
    "comparison exact despite windowed float accumulation.",
    tags=("events", "timeseries"),
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-30, -1)
    scored = e.select(
        "user_id",
        "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sigma"),
        F.count("*").over(w).alias("n_hist"),
    )
    is_outlier = (
        (F.col("n_hist") >= 10)
        & (F.col("sigma") > 0)
        & (F.abs((F.col("value") - F.col("mu")) / F.col("sigma")) > 3)
    )
    return scored.groupBy("user_id").agg(
        F.count("*").alias("n_scored"),
        F.sum(F.when(is_outlier, 1).otherwise(0)).cast("bigint").alias("n_outliers"),
    )


@register(
    "events_top_paths",
    """
    WITH paths AS (
      SELECT user_id,
             STRING_AGG(event_type, '>' ORDER BY ts, event_id) AS path
      FROM (
        SELECT user_id, ts, event_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
      ) WHERE rn <= 5
      GROUP BY user_id
    )
    SELECT path, COUNT(*) AS n_users
    FROM paths
    GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT 20
    """,
    doc="Top-20 entry paths (first 5 events per user, ordered, joined with "
    "'>'): the product-analytics 'common journeys' query. One user_id "
    "exchange feeds BOTH the per-user window and the path assembly "
    "(sort_array over collect_list keeps ordering engine-portable, with "
    "event_id as the deterministic tie-break within equal timestamps); the "
    "path-frequency agg partially combines map-side and the final top-k "
    "fuses to TakeOrderedAndProject — no global sort of the path table.",
    tags=("events",),
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first5 = e.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)
    paths = first5.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.sort_array(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_users"))
        .orderBy(F.col("n_users").desc(), "path")
        .limit(20)
    )


@register(
    "events_dau_wau",
    """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY day),
    days AS (SELECT DISTINCT day FROM ud),
    wau AS (
      SELECT dy.day, COUNT(DISTINCT ud.user_id) AS wau
      FROM days dy JOIN ud ON ud.day BETWEEN dy.day - 6 AND dy.day
      GROUP BY dy.day
    )
    SELECT d.day, CAST(d.dau AS BIGINT) AS dau, CAST(w.wau AS BIGINT) AS wau,
           ROUND(d.dau / CAST(w.wau AS DOUBLE), 4) AS stickiness
    FROM dau d JOIN wau w USING (day)
    """,
    doc="DAU / trailing-7-day WAU / stickiness per active day — the "
    "engagement rollup every product-analytics stack ships. Exact rolling "
    "DISTINCT does not window (distinct state is not mergeable across "
    "frame slides), so the scale shape is: (1) dedupe to (user, day) — one "
    "exchange, map-side partial — then (2) each (user, day) row CONTRIBUTES "
    "row-locally to the 7 window-days it falls in (explode of a 7-element "
    "date sequence — fan-out bounded by the window length, not the data) "
    "and (3) one count-distinct per window-day. The join back to DAU keeps "
    "only observed days. At 100 TB the (user, day) table is ~3 orders "
    "smaller than the event log, and approx paths (HLL sketch union — see "
    "agg_approx_count_distinct) swap in when exactness is negotiable.",
    tags=("events",),
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    ud = e.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    dau = ud.groupBy("day").agg(F.count("*").alias("dau"))
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("day"),
    )
    wau = contrib.groupBy("day").agg(F.countDistinct("user_id").alias("wau"))
    return (
        dau.join(wau, "day")
        .select(
            "day",
            F.col("dau").cast("bigint").alias("dau"),
            F.col("wau").cast("bigint").alias("wau"),
            F.round(F.col("dau") / F.col("wau").cast("double"), 4).alias(
                "stickiness"
            ),
        )
    )


@register(
    "events_path_markov",
    """
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    trans AS (
      SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
      FROM ordered WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    )
    SELECT from_type, to_type, CAST(n AS BIGINT) AS n_transitions,
           ROUND(n / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE), 4)
             AS p_transition
    FROM trans
    """,
    doc="First-order Markov transition matrix over user event streams: "
    "within-user consecutive event pairs (lead over one user_id-partitioned "
    "window, event_id tie-break) counted into (from, to) transitions with "
    "row-normalized probabilities — the 'where do users go next' model "
    "behind funnel discovery. Shape: ONE user_id exchange for the lead "
    "window, one transition agg (map-side partial — the exchange carries "
    "at most |event_type|^2 partial rows per partition), and the "
    "normalizing sum is a window over the transition matrix itself, which "
    "is event-type-cardinality sized — tiny at any data scale.",
    tags=("events",),
)
def events_path_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        e.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    wn = Window.partitionBy("from_type")
    return trans.select(
        "from_type",
        "to_type",
        F.col("n").cast("bigint").alias("n_transitions"),
        F.round(F.col("n") / F.sum("n").over(wn).cast("double"), 4).alias(
            "p_transition"
        ),
    )


@register(
    "events_attribution",
    """
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
             FIRST_VALUE(CASE WHEN event_type IN ('view','click')
                              THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_touch,
             LAST_VALUE(CASE WHEN event_type IN ('view','click')
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch,
             LAST_VALUE(CASE WHEN event_type IN ('view','click')
                             THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch_ts
      FROM events
    )
    SELECT first_touch, last_touch,
           CAST(COUNT(*) AS BIGINT) AS n_conversions,
           ROUND(AVG(epoch_us(ts) - epoch_us(last_touch_ts)) / 1000000.0, 2)
             AS avg_s_from_last_touch
    FROM marked
    WHERE event_type = 'purchase' AND last_touch IS NOT NULL
    GROUP BY first_touch, last_touch
    """,
    doc="Marketing attribution: every purchase credited to the user's FIRST "
    "and LAST preceding touch (view/click), rolled up into a (first, last) "
    "attribution matrix with mean seconds-from-last-touch. Shape: ONE "
    "user_id exchange carries all three running windows (first/last touch "
    "type + last touch time share a frame over the same sort), then one "
    "tiny matrix agg (|touch_types|^2 rows) with map-side partials — the "
    "same single-shuffle discipline as events_sessionize; no self-join of "
    "the event log against itself (the naive formulation at 100 TB).",
    tags=("events",),
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin("view", "click")
    touch_type = F.when(is_touch, F.col("event_type"))
    touch_ts = F.when(is_touch, F.col("ts"))
    marked = e.select(
        "event_type",
        "ts",
        F.first(touch_type, ignorenulls=True).over(w).alias("first_touch"),
        F.last(touch_type, ignorenulls=True).over(w).alias("last_touch"),
        F.last(touch_ts, ignorenulls=True).over(w).alias("last_touch_ts"),
    )
    return (
        marked.filter(
            (F.col("event_type") == "purchase") & F.col("last_touch").isNotNull()
        )
        .groupBy("first_touch", "last_touch")
        .agg(
            F.count("*").cast("bigint").alias("n_conversions"),
            F.round(
                F.avg(
                    F.unix_micros("ts") - F.unix_micros("last_touch_ts")
                )
                / 1000000.0,
                2,
            ).alias("avg_s_from_last_touch"),
        )
    )


@register(
    "scd2_point_in_time_join",
    """
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    changes AS (
      SELECT user_id, ts, event_id, event_type
      FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type
    ),
    dim AS (
      SELECT user_id, event_type AS status, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      FROM changes
    )
    SELECT d.status AS status_at_purchase,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           ROUND(SUM(p.value), 2) AS sum_value
    FROM events p
    JOIN dim d ON d.user_id = p.user_id
              AND d.valid_from <= p.ts
              AND (d.valid_to IS NULL OR p.ts < d.valid_to)
    WHERE p.event_type = 'purchase'
    GROUP BY d.status
    """,
    doc="Point-in-time (SCD2) lookup: every purchase credited to the "
    "dimension STATUS valid at its timestamp. The oracle states it as the "
    "textbook interval join against the SCD2 table; the Spark plan "
    "implements the equivalent UNION-AS-OF shape — status-change rows and "
    "fact rows unioned into one stream, ordered per user, the running "
    "last(status, ignorenulls) window carrying the valid version onto "
    "each fact — because at 100 TB the union-window costs ONE user_id "
    "exchange with zero join fan-out, while the interval join must "
    "sort-merge facts against every candidate version. Change rows order "
    "before their own fact row at equal (ts, event_id), pinning the "
    "open/closed boundary exactly as [valid_from, valid_to).",
    tags=("events", "warehouse"),
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            "user_id",
            "ts",
            "event_id",
            F.lit(0).alias("tag"),
            F.col("event_type").alias("status"),
            F.lit(None).cast("double").alias("value"),
        )
    )
    facts = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(1).alias("tag"),
        F.lit(None).cast("string").alias("status"),
        "value",
    )
    wu = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id", "tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = changes.unionAll(facts).withColumn(
        "status_at", F.last("status", ignorenulls=True).over(wu)
    )
    return (
        merged.filter(F.col("tag") == 1)
        .groupBy(F.col("status_at").alias("status_at_purchase"))
        .agg(
            F.count("*").cast("bigint").alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "events_churn_by_cohort",
    """
    WITH gmax AS (SELECT MAX(ts) AS max_ts FROM events),
    per_user AS (
      SELECT user_id,
             date_trunc('week', MIN(ts)) AS cohort_week,
             MAX(ts) AS last_ts
      FROM events GROUP BY user_id
    )
    SELECT CAST(cohort_week AS DATE) AS cohort_week,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN last_ts < g.max_ts - INTERVAL 14 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
           ROUND(SUM(CASE WHEN last_ts < g.max_ts - INTERVAL 14 DAY
                          THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4) AS churn_rate
    FROM per_user CROSS JOIN gmax g
    GROUP BY cohort_week
    """,
    doc="Churn by signup cohort: per-user (first week, last activity) in "
    "ONE user_id exchange, churn = inactive for 14 days before the corpus "
    "high-water mark (a 1-row scalar crossJoin, broadcast for free), then "
    "a cohort rollup over the already-tiny per-user table. Counts only — "
    "fully deterministic; at 100 TB the user agg is the only data-sized "
    "shuffle and it map-side combines.",
    tags=("events",),
)
def events_churn_by_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    gmax = e.agg(F.max("ts").alias("max_ts"))
    per_user = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week"),
        F.max("ts").alias("last_ts"),
    )
    churned = F.when(
        F.col("last_ts") < F.col("max_ts") - F.expr("interval 14 days"), 1
    ).otherwise(0)
    return (
        per_user.crossJoin(gmax)
        .groupBy(F.col("cohort_week").cast("date").alias("cohort_week"))
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.sum(churned).cast("bigint").alias("n_churned"),
            F.round(F.sum(churned) / F.count("*"), 4).alias("churn_rate"),
        )
    )


@register(
    "events_funnel_windowed",
    """
    WITH ordered AS (
      SELECT user_id, ts, event_type,
             MIN(CASE WHEN event_type = 'click' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_click
      FROM events
    )
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_views,
           CAST(SUM(CASE WHEN next_click IS NOT NULL
                          AND next_click <= ts + INTERVAL 30 MINUTE
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
    FROM ordered
    WHERE event_type = 'view'
    GROUP BY 1
    """,
    doc="Time-bounded funnel: a view converts if the SAME user clicks "
    "within 30 minutes — the windowed variant of events_funnel (which is "
    "unbounded). One user_id exchange: a conditional MIN over the "
    "forward row frame finds each view's next click without any "
    "self-join fan-out (the naive formulation joins views x clicks per "
    "user — quadratic in per-user activity); the daily rollup then "
    "map-side combines. Counts only — deterministic.",
    tags=("events",),
)
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    next_click = F.min(
        F.when(F.col("event_type") == "click", F.col("ts"))
    ).over(w)
    converted = F.when(
        F.col("next_click").isNotNull()
        & (F.col("next_click") <= F.col("ts") + F.expr("interval 30 minutes")),
        1,
    ).otherwise(0)
    return (
        e.withColumn("next_click", next_click)
        .filter(F.col("event_type") == "view")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(
            F.count("*").cast("bigint").alias("n_views"),
            F.sum(converted).cast("bigint").alias("n_converted"),
        )
    )


@register(
    "events_ab_lift",
    """
    WITH per_user AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id
    ),
    tagged AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS is_a, converted
      FROM per_user
    )
    SELECT CAST(SUM(is_a) AS BIGINT) AS n_a,
           CAST(SUM(is_a * converted) AS BIGINT) AS conv_a,
           CAST(SUM(1 - is_a) AS BIGINT) AS n_b,
           CAST(SUM((1 - is_a) * converted) AS BIGINT) AS conv_b,
           ROUND(SUM(is_a * converted) * 1.0 / SUM(is_a), 4) AS rate_a,
           ROUND(SUM((1 - is_a) * converted) * 1.0 / SUM(1 - is_a), 4) AS rate_b,
           CASE WHEN SUM(is_a * converted) = 0 THEN NULL
                ELSE ROUND((SUM((1 - is_a) * converted) * 1.0 / SUM(1 - is_a))
                           / (SUM(is_a * converted) * 1.0 / SUM(is_a)) - 1, 4)
           END AS lift,
           CASE WHEN SUM(converted) = 0 OR SUM(converted) = COUNT(*) THEN NULL
                ELSE ROUND((SUM((1 - is_a) * converted) * 1.0 / SUM(1 - is_a)
                            - SUM(is_a * converted) * 1.0 / SUM(is_a))
                           / SQRT((SUM(converted) * 1.0 / COUNT(*))
                                  * (1 - SUM(converted) * 1.0 / COUNT(*))
                                  * (1.0 / SUM(is_a) + 1.0 / SUM(1 - is_a))), 4)
           END AS z_score
    FROM tagged
    """,
    doc="A/B experiment readout: deterministic hash-bucket assignment "
    "(user_id parity stands in for the production murmur-bucket), per-user "
    "conversion in ONE user_id exchange, then a single conditional "
    "aggregation emits both arms' counts, rates, relative lift and the "
    "two-proportion z-statistic in one row. No per-variant re-scan, no "
    "join; integer counts keep it deterministic and the derived floats "
    "round-pinned.",
    tags=("events",),
)
def events_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    per_user = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    )
    tagged = per_user.select(
        F.when(F.col("user_id") % 2 == 0, 1).otherwise(0).alias("is_a"),
        "converted",
    )
    s = tagged.agg(
        F.sum("is_a").alias("na"),
        F.sum(F.col("is_a") * F.col("converted")).alias("ca"),
        F.sum(1 - F.col("is_a")).alias("nb"),
        F.sum((1 - F.col("is_a")) * F.col("converted")).alias("cb"),
        F.sum("converted").alias("ctot"),
        F.count("*").alias("ntot"),
    )
    ra = F.col("ca") / F.col("na")
    rb = F.col("cb") / F.col("nb")
    p = F.col("ctot") / F.col("ntot")
    return s.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("ca").cast("bigint").alias("conv_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.col("cb").cast("bigint").alias("conv_b"),
        F.round(ra, 4).alias("rate_a"),
        F.round(rb, 4).alias("rate_b"),
        F.when(F.col("ca") > 0, F.round(rb / ra - 1, 4)).alias("lift"),
        F.when(
            (F.col("ctot") > 0) & (F.col("ctot") < F.col("ntot")),
            F.round(
                (rb - ra)
                / F.sqrt(p * (1 - p) * (1 / F.col("na") + 1 / F.col("nb"))),
                4,
            ),
        ).alias("z_score"),
    )


@register(
    "events_sequence_pattern",
    """
    WITH seq AS (
      SELECT user_id, ts, event_type,
             LEAD(event_type, 1) OVER w AS e2,
             LEAD(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_patterns
    FROM seq
    WHERE event_type = 'view' AND e2 = 'click' AND e3 = 'purchase'
    GROUP BY 1
    """,
    doc="MATCH_RECOGNIZE-style strict-sequence detection (Spark has no "
    "row-pattern clause): find view -> click -> purchase as THREE "
    "CONSECUTIVE events per user via two LEADs over one user_id window — "
    "stricter than funnels, which allow gaps. One data-sized exchange; "
    "the daily count map-side combines. The pattern extends to any fixed "
    "motif by adding LEAD columns; unbounded patterns belong to "
    "stream_stateful_custom's applyInPandasWithState surface.",
    tags=("events",),
)
def events_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "ts",
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.filter(
            (F.col("event_type") == "view")
            & (F.col("e2") == "click")
            & (F.col("e3") == "purchase")
        )
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count("*").cast("bigint").alias("n_patterns"))
    )


@register(
    "ts_interpolate_linear",
    """
    WITH daily AS (
      -- UNROUNDED averages: rounding before the lerp manufactures exact
      -- .00005 halves, where Spark (decimal-string HALF_UP) and DuckDB
      -- (binary-value rounding) disagree by 1 ulp; raw double averages
      -- never land on halves, and the single final ROUND is stable
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             AVG(value) AS day_avg
      FROM events GROUP BY 1, 2
    ),
    spans AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM spans
    ),
    j AS (
      SELECT g.user_id, g.day, d.day_avg
      FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
    ),
    f AS (
      SELECT user_id, day, day_avg,
        LAST_VALUE(day_avg IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY day ROWS UNBOUNDED PRECEDING) AS pv,
        LAST_VALUE(CASE WHEN day_avg IS NOT NULL THEN day END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY day ROWS UNBOUNDED PRECEDING) AS pd,
        FIRST_VALUE(day_avg IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY day
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        FIRST_VALUE(CASE WHEN day_avg IS NOT NULL THEN day END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY day
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM j
    )
    SELECT user_id, day,
           -- raw double, no in-query ROUND: both engines compute the
           -- bit-identical lerp, but their ROUND(double, n) differ when
           -- x*10^n lands exactly on .5 (Spark rounds the shortest decimal
           -- string, DuckDB the scaled binary) — the compare layer's
           -- 9-decimal canonicalization is the stable equality
           CASE
             WHEN day_avg IS NOT NULL THEN day_avg
             WHEN pv IS NULL THEN nv
             WHEN nv IS NULL THEN pv
             ELSE pv + (nv - pv) * date_diff('day', pd, day) * 1.0
                       / date_diff('day', pd, nd)
           END AS value_interp,
           day_avg IS NULL AS was_gap
    FROM f
    """,
    doc="Resample + LINEAR interpolation — ts_resample_ffill's sibling for "
    "signals where a gap should trend toward the next observation instead "
    "of holding the last: backward (last ignore-nulls) and forward (first "
    "ignore-nulls) references both ride the SAME user_id window sort, then "
    "the lerp is row-local arithmetic. Edges clamp to the nearest known "
    "value. One user_id exchange for grid, join, both window passes.",
    tags=("events", "timeseries"),
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    daily = e.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.avg("value").alias("day_avg"))
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = spans.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    j = grid.join(daily, ["user_id", "day"], "left")
    wb = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    known_day = F.when(F.col("day_avg").isNotNull(), F.col("day"))
    f = j.select(
        "user_id",
        "day",
        "day_avg",
        F.last("day_avg", ignorenulls=True).over(wb).alias("pv"),
        F.last(known_day, ignorenulls=True).over(wb).alias("pd"),
        F.first("day_avg", ignorenulls=True).over(wf).alias("nv"),
        F.first(known_day, ignorenulls=True).over(wf).alias("nd"),
    )
    lerp = F.col("pv") + (F.col("nv") - F.col("pv")) * F.datediff(
        "day", "pd"
    ) / F.datediff("nd", "pd")
    return f.select(
        "user_id",
        "day",
        F.when(F.col("day_avg").isNotNull(), F.col("day_avg"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(lerp)
        .alias("value_interp"),
        F.col("day_avg").isNull().alias("was_gap"),
    )


@register(
    "events_seasonality_profile",
    """
    SELECT CAST(EXTRACT(dow FROM ts) AS INT) AS dow,
           CAST(EXTRACT(hour FROM ts) AS INT) AS hod,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(AVG(value), 4) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Seasonality fingerprint: the (day-of-week x hour-of-day) activity "
    "matrix — the profile behind staffing/alert baselines and the "
    "seasonal-naive forecast. One scan, one map-side-combined aggregation "
    "onto a fixed 168-cell key space (the post-shuffle state is constant "
    "regardless of data volume). Day numbering pinned to Sunday=0 on both "
    "engines (Spark's dayofweek is 1-based).",
    tags=("events", "timeseries"),
)
def events_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("ts", "value")
    return (
        e.groupBy(
            (F.dayofweek("ts") - 1).cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hod"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


@register(
    "ts_ewma",
    """
    WITH r AS (
      SELECT user_id, event_id, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ), sg AS (
      SELECT user_id, event_id, ts, value, rn,
             (rn - 1) // 512 AS seg,
             rn - ((rn - 1) // 512) * 512 AS i
      FROM r
    ), cs0 AS (
      SELECT user_id, event_id, ts, rn, seg, i,
             SUM(value * POWER(0.7, -i)) OVER (
               PARTITION BY user_id, seg ORDER BY rn
               ROWS UNBOUNDED PRECEDING) AS cs
      FROM sg
    ), c AS (
      SELECT user_id, event_id, ts, rn, seg, i, cs,
             LAST_VALUE(cs) OVER (
               PARTITION BY user_id, seg ORDER BY rn
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS endcs
      FROM cs0
    ), segs AS (
      SELECT user_id, seg, endcs,
             LAG(endcs) OVER (PARTITION BY user_id ORDER BY seg) AS prev_end
      FROM (SELECT DISTINCT user_id, seg, endcs FROM c)
    )
    SELECT c.user_id, c.event_id, c.ts,
           ROUND(0.3 * POWER(0.7, c.i)
                 * (c.cs + POWER(0.7, 512) * COALESCE(segs.prev_end, 0))
                 / (1 - POWER(0.7, c.rn)), 4) AS ewma
    FROM c JOIN segs ON c.user_id = segs.user_id AND c.seg = segs.seg
    """,
    doc="Exponentially weighted moving average (alpha=0.3, adjust-normalized "
    "like pandas ewm(adjust=True)) per user over event values — the "
    "time-series smoothing primitive. EWMA is recursive, which Spark "
    "windows can't express directly; the closed form turns it into running "
    "SUM window math — but a single global closed form overflows IEEE "
    "double past ~1900 rows per key ((1/0.7)^rn). This plan runs the "
    "closed form PER 512-ROW SEGMENT and carries the previous segment's "
    "end total scaled by 0.7^512: local exponents stay <= 0.7^-512 "
    "(~1e79, two hundred orders of magnitude inside double range) for "
    "keys of ANY length. History older than one full segment is truncated "
    "— its relative weight is <= 0.7^512 ~ 2e-80, below one double ulp, "
    "and the oracle computes the identical truncated formula so results "
    "stay bit-comparable. All windows are partitioned by (user_id, seg); "
    "the segment-carry table is 512x smaller than the data and joins back "
    "on its partition keys — no global state, no Python.",
    tags=("events", "timeseries"),
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b, S = 0.3, 0.7, 512
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = (
        e.withColumn("rn", F.row_number().over(w))
        .withColumn("seg", F.expr(f"(rn - 1) div {S}"))
        .withColumn("i", F.col("rn") - F.col("seg") * S)
    )
    wcs = (
        Window.partitionBy("user_id", "seg")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wend = (
        Window.partitionBy("user_id", "seg")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    c = r.withColumn(
        "cs", F.sum(F.col("value") * F.pow(F.lit(b), -F.col("i"))).over(wcs)
    ).withColumn("endcs", F.last("cs").over(wend))
    segs = (
        c.select("user_id", "seg", "endcs")
        .distinct()
        .withColumn(
            "prev_end",
            F.lag("endcs").over(Window.partitionBy("user_id").orderBy("seg")),
        )
        .select("user_id", "seg", "prev_end")
    )
    j = c.join(segs, ["user_id", "seg"], "left")
    return j.select(
        "user_id",
        "event_id",
        "ts",
        F.round(
            F.lit(a)
            * F.pow(F.lit(b), F.col("i"))
            * (F.col("cs") + F.pow(F.lit(b), S) * F.coalesce(F.col("prev_end"), F.lit(0.0)))
            / (F.lit(1) - F.pow(F.lit(b), F.col("rn"))),
            4,
        ).alias("ewma"),
    )


@register(
    "events_concurrency",
    """
    WITH points AS (
      SELECT event_type, ts AS t, 1 AS delta, event_id FROM events
      UNION ALL
      SELECT event_type, ts + INTERVAL 300 SECOND, -1, event_id FROM events
    ),
    swept AS (
      SELECT event_type,
             SUM(delta) OVER (
               PARTITION BY event_type ORDER BY t, delta, event_id
               ROWS UNBOUNDED PRECEDING) AS conc
      FROM points
    )
    SELECT event_type, CAST(MAX(conc) AS INT) AS peak_concurrency
    FROM swept GROUP BY event_type
    """,
    doc="Peak concurrency per event type by the classic interval sweep: "
    "every event opens a 5-minute activity interval, open/close become "
    "+1/-1 boundary points, a running sum over the time order is the live "
    "concurrency, and its max is the peak. Closes sort before opens at the "
    "same instant (delta ASC tie-break) so back-to-back intervals don't "
    "overlap; event_id makes the order total and the sweep deterministic. "
    "The running sum is PARTITIONED by event_type — each sweep is an "
    "independent partition, no global ordering exists; for a single global "
    "timeline at 100 TB, pre-aggregate boundaries per time bucket (the "
    "sweep then runs over bucket deltas, thousands of rows, not raw "
    "events).",
    tags=("events",),
)
def events_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_type", "ts", "event_id")
    opens = e.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).alias("delta"), "event_id"
    )
    closes = e.select(
        "event_type",
        (F.col("ts") + F.expr("INTERVAL 300 SECOND")).alias("t"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    swept = opens.unionAll(closes).withColumn("conc", F.sum("delta").over(w))
    return swept.groupBy("event_type").agg(
        F.max("conc").cast("int").alias("peak_concurrency")
    )


@register(
    "events_winsorized_mean",
    """
    WITH cuts AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS p05,
             quantile_cont(value, 0.95) AS p95
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(AVG(LEAST(GREATEST(e.value, c.p05), c.p95)), 4) AS winsorized_mean,
           ROUND(AVG(e.value), 4) AS raw_mean
    FROM events e JOIN cuts c ON e.event_type = c.event_type
    GROUP BY e.event_type
    """,
    doc="Winsorized mean per event type: exact P05/P95 cutpoints (linear-"
    "interpolated percentile, identical convention in both engines), "
    "values clamped into the band, then averaged — the outlier-robust KPI "
    "variant next to the raw mean it corrects. Two aggregation passes over "
    "one event_type exchange family; the cutpoint table is one row per "
    "type (categorical, genuinely tiny) so AQE broadcasts the join back. "
    "Exact percentile sorts per group — at 100 TB swap in "
    "approx_percentile cutpoints (the sketch tier) with everything else "
    "unchanged.",
    tags=("events",),
)
def events_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    cuts = e.groupBy("event_type").agg(
        F.percentile("value", 0.05).alias("p05"),
        F.percentile("value", 0.95).alias("p95"),
    )
    clamped = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
    return (
        e.join(cuts, "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg(clamped), 4).alias("winsorized_mean"),
            F.round(F.avg("value"), 4).alias("raw_mean"),
        )
    )


@register(
    "events_activity_islands",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    keyed AS (
      SELECT user_id, day,
             day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
                        AS INT) AS island_key
      FROM days
    )
    SELECT user_id,
           MIN(day) AS streak_start,
           MAX(day) AS streak_end,
           CAST(COUNT(*) AS INT) AS streak_days
    FROM keyed
    GROUP BY user_id, island_key
    """,
    doc="Gaps-and-islands: maximal runs of CONSECUTIVE active days per "
    "user (activity streaks). The classic rewrite — day minus the row "
    "number of the day is constant exactly within a consecutive run, so "
    "one window plus one groupBy replaces any self-join formulation. "
    "Distinct, window, and agg all ride a single user_id exchange family; "
    "per-user day counts bound every partition.",
    tags=("events", "timeseries"),
)
def events_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    keyed = days.withColumn(
        "island_key", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    return keyed.groupBy("user_id", "island_key").agg(
        F.min("day").alias("streak_start"),
        F.max("day").alias("streak_end"),
        F.count("*").cast("int").alias("streak_days"),
    ).drop("island_key")


@register(
    "events_bounce_rate",
    """
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    sess AS (
      SELECT user_id,
             SUM(CASE WHEN prev_ts IS NULL
                        OR ts - prev_ts > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_no
      FROM ordered
    ),
    sizes AS (
      SELECT user_id, session_no, COUNT(*) AS n_events
      FROM sess GROUP BY user_id, session_no
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounced,
           ROUND(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4)
             AS bounce_rate
    FROM sizes
    """,
    doc="Bounce rate: share of 30-minute-gap sessions containing exactly "
    "one event — the engagement KPI beside DAU/retention. Session ids "
    "come from the standard gap-cumsum (one LAG + one running SUM on the "
    "same user_id window sort), session sizes from one grouped count, and "
    "the final ratio from a fixed-size global agg. The whole pipeline "
    "rides a single user_id exchange family.",
    tags=("events",),
)
def events_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag("ts").over(w).cast("long")
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = e.withColumn(
        "session_no",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sizes = sess.groupBy("user_id", "session_no").agg(F.count("*").alias("n_events"))
    bounced = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return sizes.agg(
        F.count("*").alias("n_sessions"),
        bounced.cast("bigint").alias("n_bounced"),
        F.round(bounced * 1.0 / F.count("*"), 4).alias("bounce_rate"),
    )


@register(
    "events_anomaly_mad",
    """
    WITH med AS (
      SELECT event_type,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS adev
      FROM events e JOIN med m ON m.event_type = e.event_type
    ),
    mad AS (
      SELECT event_type,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY adev) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN d.adev > 3 * 1.4826 * a.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
           ROUND(MAX(d.med), 4) AS median_value,
           ROUND(MAX(a.mad), 4) AS mad_value
    FROM dev d JOIN mad a ON a.event_type = d.event_type
    GROUP BY d.event_type
    """,
    doc="Robust anomaly detection per event type: median + MAD (median "
    "absolute deviation, the estimator outliers can't poison — unlike "
    "mean/stddev z-scores), flagging values beyond 3 robust sigmas "
    "(1.4826*MAD). Both medians are EXACT percentile_disc aggregates "
    "(multiset elements — engine-identical, no interpolation), computed "
    "in two grouped passes joined back on the bounded event_type key; "
    "counts are integers so the oracle never compares a float boundary. "
    "At 100 TB swap percentile_disc for approx_percentile, same shape.",
    tags=("events", "timeseries", "quality"),
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("med")
    )
    dev = e.join(med, "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)").alias("mad")
    )
    return (
        dev.join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(
                F.when(F.col("adev") > 3 * 1.4826 * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_anomalies"),
            F.round(F.max("med"), 4).alias("median_value"),
            F.round(F.max("mad"), 4).alias("mad_value"),
        )
    )


@register(
    "ts_forecast_seasonal_naive",
    """
    WITH train AS (
      SELECT event_type,
             CAST(EXTRACT(dow FROM ts) AS INT) AS dow,
             CAST(EXTRACT(hour FROM ts) AS INT) AS hod,
             value
      FROM events WHERE ts < TIMESTAMP '2024-01-24'
    ),
    profile AS (
      SELECT event_type, dow, hod, AVG(value) AS fc
      FROM train GROUP BY event_type, dow, hod
    ),
    eval_ AS (
      SELECT event_type,
             CAST(EXTRACT(dow FROM ts) AS INT) AS dow,
             CAST(EXTRACT(hour FROM ts) AS INT) AS hod,
             value
      FROM events WHERE ts >= TIMESTAMP '2024-01-24'
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           AVG(ABS(e.value - p.fc)) AS mae,
           AVG(e.value - p.fc) AS bias
    FROM eval_ e JOIN profile p
      ON p.event_type = e.event_type AND p.dow = e.dow AND p.hod = e.hod
    GROUP BY e.event_type
    """,
    doc="Seasonal-naive forecasting with a real holdout evaluation: the "
    "(event_type x day-of-week x hour) mean-value profile is fit on "
    "everything before the cutoff week and scored against the held-out "
    "week with MAE and signed bias — the baseline every fancier "
    "forecaster must beat, and the backtest shape (train window, frozen "
    "profile, out-of-sample error) a metrics pipeline runs daily. The "
    "profile is a BOUNDED aggregate (types x 168 cells) joined back on "
    "its key; both passes push their time predicate to the scan. MAE/bias "
    "ship UNROUNDED (quotients of float sums land on rounding halves "
    "where engines split — the comparator canonicalizes at 9dp). "
    "Day numbering pinned to Sunday=0 on both engines.",
    tags=("events", "timeseries"),
)
def ts_forecast_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    cut = F.lit("2024-01-24").cast("timestamp")
    keyed = e.select(
        "event_type",
        (F.dayofweek("ts") - 1).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hod"),
        "value",
        "ts",
    )
    profile = (
        keyed.filter(F.col("ts") < cut)
        .groupBy("event_type", "dow", "hod")
        .agg(F.avg("value").alias("fc"))
    )
    ev = keyed.filter(F.col("ts") >= cut)
    return (
        ev.join(profile, ["event_type", "dow", "hod"])
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_eval"),
            F.avg(F.abs(F.col("value") - F.col("fc"))).alias("mae"),
            F.avg(F.col("value") - F.col("fc")).alias("bias"),
        )
    )


@register(
    "events_lag_features",
    """
    WITH f AS (
      SELECT user_id, event_id, ts, value,
             LAG(value)  OVER w AS value_lag1,
             AVG(value)  OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
               AS value_roll3,
             date_diff('second', LAG(ts) OVER w, ts) AS secs_since_prev,
             ROW_NUMBER() OVER w AS user_event_no
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, value_lag1,
           ROUND(value_roll3, 6) AS value_roll3,
           CAST(secs_since_prev AS BIGINT) AS secs_since_prev,
           CAST(user_event_no AS INT) AS user_event_no
    FROM f
    """,
    doc="Per-user lag/rolling feature engineering — the feature-store "
    "transform an event-level ML training set needs: previous value, "
    "3-event rolling mean, seconds since the previous event, and the "
    "user's event ordinal. ALL four features ride ONE user_id window "
    "specification, so Catalyst plans a single exchange + single sort "
    "shared by every feature (asserted in the plan audit) — adding more "
    "lags/rolls to the same spec costs no extra shuffle at any scale. "
    "Rolling mean is a quotient of a fixed 3-row frame: identical "
    "operand order in both engines, rounded at 6dp.",
    tags=("events", "timeseries"),
)
def events_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w3 = w.rowsBetween(-2, 0)
    return e.select(
        "user_id",
        "event_id",
        F.lag("value").over(w).alias("value_lag1"),
        F.round(F.avg("value").over(w3), 6).alias("value_roll3"),
        (F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w))
        .cast("bigint")
        .alias("secs_since_prev"),
        F.row_number().over(w).cast("int").alias("user_event_no"),
    )


@register(
    "ts_decompose_additive",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour_ts,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS y
      FROM events GROUP BY 1, 2
    ),
    trended AS (
      SELECT event_type, hour_ts, y,
             AVG(y) OVER (
               PARTITION BY event_type ORDER BY hour_ts
               ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING) AS trend
      FROM hourly
    ),
    seasonal AS (
      SELECT event_type, CAST(EXTRACT(hour FROM hour_ts) AS INT) AS hod,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY y - trend) AS s
      FROM trended GROUP BY 1, 2
    )
    SELECT t.event_type, CAST(t.hour_ts AS TIMESTAMP) AS hour_ts,
           t.y, t.trend, s.s AS seasonal,
           t.y - t.trend - s.s AS residual
    FROM trended t
    JOIN seasonal s
      ON s.event_type = t.event_type
     AND s.hod = CAST(EXTRACT(hour FROM t.hour_ts) AS INT)
    """,
    doc="Classic additive time-series decomposition per event type: hourly "
    "series y, trend as a 24-point centered moving average (one "
    "event_type-partitioned frame window), hour-of-day seasonal as the "
    "mean detrended value (a 24-row-per-type rollup joined back on the "
    "bounded (type, hod) key), residual = y - trend - seasonal — the "
    "anomaly-detection / forecasting preprocessing primitive (STL's "
    "cheap windowed ancestor; a MEDIAN seasonal is also STL's own "
    "robustness choice). Determinism — every term is order-independent "
    "and nothing rounds at a flippable boundary: y is an exact DECIMAL "
    "sum divided by a count (bit-identical quotient of exact values); "
    "trend is the frame average of identical doubles (1-ulp-stable, "
    "inside the comparator's 9dp canonicalization); seasonal is "
    "percentile_disc — an ELEMENT of the multiset, never an order-"
    "dependent mean (ROUND(avg, 4) flipped on decimal halves under the "
    "test suite's different partition count); residual is pure "
    "arithmetic of those terms; y/trend/seasonal/residual all ship "
    "unrounded. All windows partition by "
    "event_type — at 100 TB each series decomposes independently; only "
    "the hour-bucketed rollup (8760 rows/type/year) flows into the "
    "window, never raw events.",
    tags=("events", "timeseries"),
)
def ts_decompose_additive(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("y")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(-11, 12)
    )
    trended = hourly.withColumn("trend", F.avg("y").over(w))
    seasonal = trended.withColumn("__d", F.col("y") - F.col("trend")).groupBy(
        F.col("event_type").alias("s_event_type"),
        F.hour("hour_ts").cast("int").alias("hod"),
    ).agg(F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY __d)").alias("s"))
    return (
        trended.join(
            F.broadcast(seasonal),  # bounded: 24 rows per event type
            (F.col("event_type") == F.col("s_event_type"))
            & (F.hour("hour_ts").cast("int") == F.col("hod")),
        )
        .select(
            "event_type",
            "hour_ts",
            "y",
            "trend",
            F.col("s").alias("seasonal"),
            (F.col("y") - F.col("trend") - F.col("s")).alias("residual"),
        )
    )


@register(
    "events_anomaly_stl",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour_ts,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS y
      FROM events GROUP BY 1, 2
    ),
    trended AS (
      SELECT event_type, hour_ts, y,
             AVG(y) OVER (
               PARTITION BY event_type ORDER BY hour_ts
               ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING) AS trend
      FROM hourly
    ),
    seasonal AS (
      SELECT event_type, CAST(EXTRACT(hour FROM hour_ts) AS INT) AS hod,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY y - trend) AS s
      FROM trended GROUP BY 1, 2
    ),
    resid AS (
      SELECT t.event_type, t.hour_ts, t.y - t.trend - s.s AS r
      FROM trended t
      JOIN seasonal s
        ON s.event_type = t.event_type
       AND s.hod = CAST(EXTRACT(hour FROM t.hour_ts) AS INT)
    ),
    rmed AS (
      SELECT event_type,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY r) AS med
      FROM resid GROUP BY event_type
    ),
    rmad AS (
      SELECT d.event_type,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY ABS(d.r - m.med)) AS mad
      FROM resid d JOIN rmed m ON m.event_type = d.event_type
      GROUP BY d.event_type
    )
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           CAST(SUM(CASE WHEN ABS(d.r - m.med) > 3 * 1.4826 * a.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous_hours
    FROM resid d
    JOIN rmed m ON m.event_type = d.event_type
    JOIN rmad a ON a.event_type = d.event_type
    GROUP BY d.event_type
    """,
    doc="Seasonal-aware anomaly detection — the composition "
    "ts_decompose_additive exists FOR: hours whose deseasonalized, "
    "detrended residual exceeds 3 robust sigmas (median + 1.4826*MAD of "
    "the residual per type, the events_anomaly_mad gate applied AFTER "
    "decomposition, so a nightly dip or weekend spike is no longer a "
    "false positive the way it is for raw-value gates). Every statistic "
    "is an order-independent element pick or exact-decimal quotient "
    "(the decompose determinism contract), counts are integers — exact "
    "cross-engine. Plan: the decompose stages plus two bounded "
    "event_type-keyed percentile passes; windows only ever see the "
    "hour-bucketed rollup.",
    tags=("events", "timeseries"),
)
def events_anomaly_stl(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("y")
    )
    w = Window.partitionBy("event_type").orderBy("hour_ts").rowsBetween(-11, 12)
    # trended is the only corpus-sized pass (events scan -> hourly rollup ->
    # trend window) and the join tree below consumes it through FOUR paths
    # (seasonal, and resid via rmed/dev/rmad) — unmaterialized, the census
    # showed the full scan+window subtree evaluated 8x. The rollup is
    # (event_type x hour)-bounded, so checkpointing it is the same
    # narrow-derived-table materialization the LM family uses (§10): the
    # corpus is scanned ONCE, every statistic re-derives from the tiny
    # checkpoint.
    trended = hourly.withColumn("trend", F.avg("y").over(w)).localCheckpoint(
        eager=True
    )
    seasonal = trended.withColumn("__d", F.col("y") - F.col("trend")).groupBy(
        F.col("event_type").alias("s_event_type"),
        F.hour("hour_ts").cast("int").alias("hod"),
    ).agg(F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY __d)").alias("s"))
    resid = (
        trended.join(
            F.broadcast(seasonal),
            (F.col("event_type") == F.col("s_event_type"))
            & (F.hour("hour_ts").cast("int") == F.col("hod")),
        )
        .select(
            "event_type",
            "hour_ts",
            (F.col("y") - F.col("trend") - F.col("s")).alias("r"),
        )
    )
    rmed = resid.groupBy(F.col("event_type").alias("m_event_type")).agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY r)").alias("med")
    )
    # dev feeds both rmad and the final aggregate; it is the same bounded
    # (event_type x hour) grain as trended, so one more checkpoint stops the
    # resid join tree being evaluated once per consumer.
    dev = (
        resid.join(F.broadcast(rmed), F.col("event_type") == F.col("m_event_type"))
        .withColumn("adev", F.abs(F.col("r") - F.col("med")))
        .localCheckpoint(eager=True)
    )
    rmad = dev.groupBy(F.col("event_type").alias("a_event_type")).agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)").alias("mad")
    )
    return (
        dev.join(F.broadcast(rmad), F.col("event_type") == F.col("a_event_type"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hours"),
            F.sum(
                F.when(F.col("adev") > 3 * 1.4826 * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_anomalous_hours"),
        )
    )


@register(
    "events_value_histogram",
    """
    WITH b AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events),
    bucketed AS (
      SELECT CAST(LEAST(19, FLOOR((e.value - b.lo) * 20 / (b.hi - b.lo)))
                  AS BIGINT) AS bucket,
             e.value, b.lo, b.hi
      FROM events e CROSS JOIN b
    )
    SELECT bucket,
           COUNT(*) AS n,
           lo + bucket * (hi - lo) / 20 AS lo_edge,
           MIN(value) AS min_v,
           MAX(value) AS max_v
    FROM bucketed
    GROUP BY bucket, lo, hi
    """,
    doc="Equi-width histogram of events.value in 20 buckets: data-driven "
    "bounds via ONE broadcast scalar crossJoin (no driver-side "
    "agg().first() pre-action), then a row-local FLOOR bucket id and a "
    "20-group aggregate that combines map-side. The max value clamps into "
    "the last bucket via LEAST. Bucket arithmetic is explicit FLOOR on "
    "identical double expressions both engines (CAST would round in "
    "DuckDB, truncate in Spark — the table_zorder_clustering lesson); no "
    "SUM(double) crosses the compare (partial-sum order is "
    "partition-count dependent), only COUNT/MIN/MAX, which are "
    "order-independent. At 100 TB: two scans (bounds + bucket) of one "
    "column each, both fully pushed down; the aggregate state is 20 "
    "groups per task.",
    tags=("events",),
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("value")
    bounds = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    bucketed = ev.crossJoin(F.broadcast(bounds)).withColumn(
        "bucket",
        F.least(
            F.lit(19),
            F.floor(
                (F.col("value") - F.col("lo")) * 20 / (F.col("hi") - F.col("lo"))
            ),
        ).cast("bigint"),
    )
    return bucketed.groupBy("bucket", "lo", "hi").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    ).select(
        "bucket",
        "n",
        (F.col("lo") + F.col("bucket") * (F.col("hi") - F.col("lo")) / 20).alias(
            "lo_edge"
        ),
        "min_v",
        "max_v",
    )


@register(
    "events_ab_cuped",
    """
    WITH cutoff AS (
      SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS cut FROM events
    ),
    per_user AS (
      SELECT e.user_id,
             e.user_id % 2 AS variant,
             CAST(SUM(CASE WHEN epoch_us(e.ts) < c.cut
                           THEN CAST(e.value AS DECIMAL(18,6))
                           ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS x,
             CAST(SUM(CASE WHEN epoch_us(e.ts) >= c.cut
                           THEN CAST(e.value AS DECIMAL(18,6))
                           ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS y
      FROM events e CROSS JOIN cutoff c
      GROUP BY e.user_id
    ),
    scaled AS (
      SELECT user_id, variant, x, y,
             CAST(ROUND(x * 1000000.0, 0) AS BIGINT) AS xi,
             CAST(ROUND(y * 1000000.0, 0) AS BIGINT) AS yi
      FROM per_user
    ),
    gl AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(xi AS DECIMAL(19,0)) * CAST(xi AS DECIMAL(19,0)))
                  AS DOUBLE) / 1000000000000.0 AS sxx,
             CAST(SUM(CAST(xi AS DECIMAL(19,0)) * CAST(yi AS DECIMAL(19,0)))
                  AS DOUBLE) / 1000000000000.0 AS sxy
      FROM scaled
    ),
    pv AS (
      SELECT variant,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(COUNT(*) AS DOUBLE) AS nv,
             CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sxv,
             CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS syv
      FROM per_user GROUP BY variant
    ),
    joined AS (
      SELECT pv.variant, pv.n_users, pv.nv, pv.sxv, pv.syv, g.n, g.sx,
             (g.sxy - g.sx * g.sy / g.n) / (g.sxx - g.sx * g.sx / g.n) AS theta
      FROM pv CROSS JOIN gl g
    )
    SELECT variant, n_users,
           syv / nv AS mean_post,
           theta,
           syv / nv - theta * (sxv / nv - sx / n) AS mean_cuped
    FROM joined
    """,
    doc="CUPED variance reduction for the A/B readout (Deng et al., WSDM "
    "2013): the pre-period covariate X (per-user spend before the "
    "experiment midpoint) adjusts the post-period metric Y as "
    "Y - theta*(X - mean(X)) with theta = cov(X,Y)/var(X), shrinking "
    "metric variance without biasing the between-variant delta. All "
    "moment sums are exact DECIMAL (double sums depend on partition merge "
    "order); theta and the adjusted means are quotient chains of those "
    "exact sums, shipped UNROUNDED (identical op order is bit-exact both "
    "engines; ROUND on a quotient flips rounding halves). Plan: one "
    "broadcast scalar cutoff, ONE user-keyed shuffle building (x, y), "
    "then a 2-group and a 1-group aggregate combined by a broadcast "
    "crossJoin — at 100 TB the per-user table is the only large "
    "intermediate and it shuffles once.",
    tags=("events",),
)
def events_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    cut = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    ).select(F.expr("(lo + hi) div 2").alias("cut"))
    dec = lambda c: c.cast("decimal(18,6)")  # noqa: E731
    zero = F.lit(0).cast("decimal(18,6)")
    micros = F.unix_micros("ts")
    per_user = (
        ev.crossJoin(F.broadcast(cut))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(micros < F.col("cut"), dec(F.col("value"))).otherwise(zero))
            .cast("double")
            .alias("x"),
            F.sum(F.when(micros >= F.col("cut"), dec(F.col("value"))).otherwise(zero))
            .cast("double")
            .alias("y"),
        )
        .withColumn("variant", F.col("user_id") % 2)
        # per_user feeds BOTH moment aggregates (glob, pv), and each
        # unmaterialized evaluation replays the events scan twice (cutoff
        # scalar + main pass) — 4 corpus scans where 2 is the floor.
        # Checkpointing the narrow user-grain table makes the doc's "the
        # per-user table shuffles once" claim literally true (§10 pattern).
        .localCheckpoint(eager=True)
    )
    # Second moments as scaled-integer products summed exactly in
    # DECIMAL(38,0): DuckDB's DECIMAL multiply does not widen past 18
    # digits (overflows where Spark would widen to (37,12)), and a BIGINT
    # product of ~1e10-sized scaled integers overflows int64 under ANSI —
    # so the operands are cast to DECIMAL(19,0) first: the product is
    # (38,0)-exact and identically typed in BOTH engines. x is an exact
    # multiple of 1e-6 (it left a DECIMAL(18,6) sum), so ROUND(x*1e6)
    # recovers the scaled integer exactly.
    xi = F.round(F.col("x") * 1000000.0, 0).cast("bigint").cast("decimal(19,0)")
    yi = F.round(F.col("y") * 1000000.0, 0).cast("bigint").cast("decimal(19,0)")
    glob = per_user.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dec(F.col("x"))).cast("double").alias("sx"),
        F.sum(dec(F.col("y"))).cast("double").alias("sy"),
        (F.sum(xi * xi).cast("double") / 1000000000000.0).alias("sxx"),
        (F.sum(xi * yi).cast("double") / 1000000000000.0).alias("sxy"),
    )
    pv = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.count(F.lit(1)).cast("double").alias("nv"),
        F.sum(dec(F.col("x"))).cast("double").alias("sxv"),
        F.sum(dec(F.col("y"))).cast("double").alias("syv"),
    )
    joined = pv.crossJoin(F.broadcast(glob)).withColumn(
        "theta",
        (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
        / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")),
    )
    return joined.select(
        "variant",
        "n_users",
        (F.col("syv") / F.col("nv")).alias("mean_post"),
        "theta",
        (
            F.col("syv") / F.col("nv")
            - F.col("theta") * (F.col("sxv") / F.col("nv") - F.col("sx") / F.col("n"))
        ).alias("mean_cuped"),
    )


@register(
    "events_cumulative_distinct_users",
    """
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS day
      FROM events GROUP BY user_id
    ),
    daily_new AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS n_new
      FROM first_seen GROUP BY day
    ),
    days AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day FROM events)
    SELECT d.day,
           CAST(COALESCE(n.n_new, 0) AS BIGINT) AS n_new,
           CAST((SELECT SUM(n2.n_new) FROM daily_new n2 WHERE n2.day <= d.day)
                AS BIGINT) AS cum_users
    FROM days d LEFT JOIN daily_new n USING (day)
    """,
    doc="Cumulative distinct users to date (the growth-accounting curve): "
    "distinct-to-date equals the running sum of FIRST-SEEN counts, so the "
    "expensive dedup is ONE user-keyed MIN aggregate and the cumulation "
    "runs over the day-grain table — which is span-bounded (days, not "
    "rows), so instead of a global single-partition window the running "
    "sum is a broadcast theta-join of the tiny day table against itself "
    "(day^2 pairs of a few-hundred-row table, fully parallel — the same "
    "no-global-window rule the linter enforces at error severity). At "
    "100 TB only the first-seen aggregate scales with data.",
    tags=("events",),
)
def events_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").cast("date").alias("day"), "user_id"
    )
    first_seen = ev.groupBy("user_id").agg(F.min("day").alias("day"))
    daily_new = first_seen.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new")
    )
    days = ev.select("day").distinct()
    prior = daily_new.select(
        F.col("day").alias("day2"), F.col("n_new").alias("n_new2")
    )
    cum = (
        days.join(F.broadcast(prior), F.col("day2") <= F.col("day"))
        .groupBy("day")
        .agg(F.sum("n_new2").cast("bigint").alias("cum_users"))
    )
    return (
        cum.join(daily_new, "day", "left")
        .select(
            "day",
            F.coalesce("n_new", F.lit(0)).cast("bigint").alias("n_new"),
            "cum_users",
        )
    )


@register(
    "events_duplicate_purchase_screen",
    """
    WITH p AS (
      SELECT event_id, user_id, value, epoch_us(ts) AS us
      FROM events WHERE event_type = 'purchase'
    )
    SELECT a.user_id,
           a.event_id AS event_a,
           b.event_id AS event_b,
           ABS(a.us - b.us) // 1000000 AS gap_s,
           a.value AS value_a,
           b.value AS value_b,
           CASE WHEN a.value = b.value THEN 1 ELSE 0 END AS same_value
    FROM p a JOIN p b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
    WHERE ABS(a.us - b.us) <= CAST(3600 AS BIGINT) * 1000000
    """,
    doc="Rapid-repeat purchase screen (the double-charge / card-testing "
    "fraud pattern): all pairs of purchases by the SAME user within one "
    "hour, with the exact seconds gap and a same-amount flag. Timestamps "
    "compare as exact integer microseconds (date_diff('second') would "
    "truncate at whole-second boundaries differently from a float delta); "
    "the pair key orders event_id a < b so each pair emits once. Plan: "
    "filter pushed to the scan (event_type = 'purchase'), then ONE "
    "user-keyed shuffle self-join — quadratic only within a (user, 1 h) "
    "neighborhood, which is bounded by per-user purchase rate, not data "
    "size; no global ordering anywhere. At 100 TB the join is an ordinary "
    "equi-shuffle on user_id and AQE handles hot users via skew split.",
    tags=("events",),
)
def events_duplicate_purchase_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value", F.unix_micros("ts").alias("us"))
    )
    a = p.select(
        "user_id",
        F.col("event_id").alias("event_a"),
        F.col("us").alias("us_a"),
        F.col("value").alias("value_a"),
    )
    b = p.select(
        "user_id",
        F.col("event_id").alias("event_b"),
        F.col("us").alias("us_b"),
        F.col("value").alias("value_b"),
    )
    gap_us = F.abs(F.col("us_a") - F.col("us_b"))
    return (
        a.join(b, "user_id")
        .filter((F.col("event_a") < F.col("event_b")) & (gap_us <= 3600 * 1_000_000))
        .select(
            "user_id",
            "event_a",
            "event_b",
            F.expr("abs(us_a - us_b) div 1000000").alias("gap_s"),
            "value_a",
            "value_b",
            F.when(F.col("value_a") == F.col("value_b"), F.lit(1))
            .otherwise(F.lit(0))
            .alias("same_value"),
        )
    )


@register(
    "ts_time_weighted_avg",
    """
    WITH e AS (
      SELECT user_id, value, epoch_us(ts) AS us, event_id
      FROM events
    ),
    seg AS (
      SELECT user_id,
             CAST(ROUND(value * 1000000.0, 0) AS BIGINT) AS vi,
             LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us
               AS dt_us
      FROM e
    ),
    agg AS (
      SELECT user_id,
             CAST(COUNT(dt_us) AS BIGINT) AS n_segments,
             CAST(SUM(dt_us) AS BIGINT) AS span_us,
             SUM(CAST(vi AS DECIMAL(19,0)) * CAST(dt_us AS DECIMAL(19,0)))
               AS wsum
      FROM seg WHERE dt_us IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, n_segments,
           span_us // 1000000 AS span_s,
           CAST(wsum AS DOUBLE) / (1000000.0 * CAST(span_us AS DOUBLE)) AS twap
    FROM agg
    """,
    doc="Time-weighted average (TWAP) of events.value per user over an "
    "IRREGULAR series: each observation holds until the next one, so the "
    "weight is the exact microsecond gap to the successor (LEAD inside "
    "the user partition; the last observation has no successor and "
    "carries no weight). The weighted sum is EXACT: value scales to an "
    "integer (x1e6), both factors cast to DECIMAL(19,0) so the product "
    "is (38,0)-exact and identically typed in both engines (the CUPED "
    "moment-sum pattern — BIGINT products overflow int64, DuckDB DECIMAL "
    "multiply won't widen past 18 digits on its own); the final TWAP is "
    "one quotient of exact values, shipped unrounded. Plan: ONE "
    "user-keyed shuffle feeding a user-partitioned LEAD window and the "
    "per-user aggregate — no global window, no second exchange.",
    tags=("timeseries",),
)
def ts_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.round(F.col("value") * 1000000.0, 0).cast("bigint").alias("vi"),
        F.unix_micros("ts").alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    seg = ev.select(
        "user_id",
        "vi",
        (F.lead("us").over(w) - F.col("us")).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    agg = seg.groupBy("user_id").agg(
        F.count("dt_us").cast("bigint").alias("n_segments"),
        F.sum("dt_us").cast("bigint").alias("span_us"),
        F.sum(
            F.col("vi").cast("decimal(19,0)") * F.col("dt_us").cast("decimal(19,0)")
        ).alias("wsum"),
    )
    return agg.select(
        "user_id",
        "n_segments",
        F.expr("span_us div 1000000").alias("span_s"),
        (
            F.col("wsum").cast("double")
            / (F.lit(1000000.0) * F.col("span_us").cast("double"))
        ).alias("twap"),
    )


@register(
    "events_survival_hazard",
    """
    WITH p AS (
      SELECT user_id,
             CAST(date_trunc('day', MIN(ts)) AS DATE) AS first_day,
             CAST(date_trunc('day', MAX(ts)) AS DATE) AS last_day
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    g AS (SELECT MAX(last_day) AS end_day FROM p),
    lifetimes AS (
      SELECT date_diff('day', first_day, last_day) AS dur,
             CASE WHEN date_diff('day', last_day, gg.end_day) > 3
                  THEN 1 ELSE 0 END AS churned
      FROM p CROSS JOIN g gg
    ),
    by_dur AS (
      SELECT dur,
             CAST(SUM(churned) AS BIGINT) AS n_churned,
             CAST(COUNT(*) - SUM(churned) AS BIGINT) AS n_censored,
             CAST(COUNT(*) AS BIGINT) AS n_total
      FROM lifetimes GROUP BY dur
    )
    SELECT d.dur,
           (SELECT CAST(SUM(b2.n_total) AS BIGINT) FROM by_dur b2
             WHERE b2.dur >= d.dur) AS n_at_risk,
           d.n_churned,
           d.n_censored,
           d.n_churned * 1.0 / (SELECT SUM(b3.n_total) FROM by_dur b3
                                 WHERE b3.dur >= d.dur) AS hazard
    FROM by_dur d
    """,
    doc="Kaplan-Meier style survival table over purchase activity: a "
    "user's lifetime is days between first and last purchase; users whose "
    "last purchase predates the corpus end by > 3 days count as churned "
    "(an event) at that duration, the rest are right-censored. Per "
    "duration d: n_at_risk = users with lifetime >= d, churn events, "
    "censorings, and the discrete hazard d_i/n_i — an exact quotient of "
    "integer counts (the survival curve is the running product of "
    "(1 - hazard); shipping hazards keeps every value engine-exact where "
    "an exp-sum-log product would drift). The at-risk cumulation runs "
    "over the duration spine — day-span-bounded, a few hundred rows — so "
    "it is a broadcast theta-join of the tiny by_dur table against "
    "itself, not a global window (the events_cumulative_distinct_users "
    "pattern). At 100 TB only the per-user MIN/MAX aggregate scales with "
    "data.",
    tags=("events",),
)
def events_survival_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.date_trunc("day", F.min("ts")).cast("date").alias("first_day"),
            F.date_trunc("day", F.max("ts")).cast("date").alias("last_day"),
        )
        # p is the only corpus-sized pass and feeds TWO consumers (the
        # end-day scalar and the lifetimes projection); it is a narrow
        # user-grain rollup, far smaller than the events it aggregates, so
        # materialize it once (§10 pattern) — the corpus is scanned ONCE.
        .localCheckpoint(eager=True)
    )
    g = p.agg(F.max("last_day").alias("end_day"))
    lifetimes = p.crossJoin(F.broadcast(g)).select(
        F.datediff("last_day", "first_day").alias("dur"),
        F.when(F.datediff("end_day", "last_day") > 3, F.lit(1))
        .otherwise(F.lit(0))
        .alias("churned"),
    )
    # by_dur (duration-spine-bounded, a few hundred rows) feeds THREE
    # consumers (the self theta-join's both sides and the final join);
    # checkpoint it so each reads the tiny table instead of replaying the
    # user rollup.
    by_dur = lifetimes.groupBy("dur").agg(
        F.sum("churned").cast("bigint").alias("n_churned"),
        (F.count(F.lit(1)) - F.sum("churned")).cast("bigint").alias("n_censored"),
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
    ).localCheckpoint(eager=True)
    other = by_dur.select(
        F.col("dur").alias("dur2"), F.col("n_total").alias("n_total2")
    )
    at_risk = (
        by_dur.select("dur")
        .join(F.broadcast(other), F.col("dur2") >= F.col("dur"))
        .groupBy("dur")
        .agg(F.sum("n_total2").cast("bigint").alias("n_at_risk"))
    )
    return (
        by_dur.join(F.broadcast(at_risk), "dur")
        .select(
            "dur",
            "n_at_risk",
            "n_churned",
            "n_censored",
            (F.col("n_churned") * F.lit(1.0) / F.col("n_at_risk")).alias("hazard"),
        )
    )


@register(
    "ts_backtest_rolling_origin",
    """
    WITH folds AS (
      SELECT * FROM (VALUES (CAST(1 AS INT), TIMESTAMP '2024-01-18'),
                            (CAST(2 AS INT), TIMESTAMP '2024-01-21'),
                            (CAST(3 AS INT), TIMESTAMP '2024-01-24'))
             AS t(fold, cutoff)
    ),
    keyed AS (
      SELECT event_type,
             CAST(EXTRACT(dow FROM ts) AS INT) AS dow,
             CAST(EXTRACT(hour FROM ts) AS INT) AS hod,
             ts, value,
             CAST(ROUND(value * 1000000.0, 0) AS BIGINT) AS vi
      FROM events
    ),
    train AS (
      SELECT f.fold, k.event_type, k.dow, k.hod,
             SUM(CAST(k.value AS DECIMAL(18,6))) AS sv,
             CAST(COUNT(*) AS BIGINT) AS np
      FROM keyed k CROSS JOIN folds f
      WHERE k.ts < f.cutoff
      GROUP BY f.fold, k.event_type, k.dow, k.hod
    ),
    profile AS (
      SELECT fold, event_type, dow, hod,
             CAST(FLOOR(CAST(sv AS DOUBLE) / np * 1000000.0) AS BIGINT) AS fcq
      FROM train
    ),
    eval_ AS (
      SELECT f.fold, k.event_type, k.dow, k.hod, k.vi
      FROM keyed k CROSS JOIN folds f
      WHERE k.ts >= f.cutoff AND k.ts < f.cutoff + INTERVAL 3 DAY
    )
    SELECT e.fold, e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           CAST(SUM(ABS(e.vi - p.fcq)) AS DOUBLE) / (1000000.0 * COUNT(*)) AS mae,
           CAST(SUM(e.vi - p.fcq) AS DOUBLE) / (1000000.0 * COUNT(*)) AS bias
    FROM eval_ e JOIN profile p
      ON p.fold = e.fold AND p.event_type = e.event_type
     AND p.dow = e.dow AND p.hod = e.hod
    GROUP BY e.fold, e.event_type
    """,
    doc="Rolling-origin forecast backtest (the time-series analog of "
    "cross-validation): three expanding-window folds, each fitting the "
    "(event_type x dow x hour) seasonal profile on data before its cutoff "
    "and scoring the next 3 days out-of-sample. Unlike the single-holdout "
    "ts_forecast_seasonal_naive, every error value here is ENGINE-EXACT: "
    "the profile mean is a quotient of a DECIMAL sum (bit-identical "
    "double), floor-quantized to an integer micro-forecast, so per-row "
    "errors and their sums are BIGINT arithmetic and the final MAE/bias "
    "are single quotients of exact integers — no float-sum order "
    "dependence anywhere, at any partition count. Plan: the 3-row fold "
    "table broadcast-crossJoins the scan (3x row amplification is the "
    "honest rolling-origin cost, applied row-locally before the "
    "(fold x type x 168)-bounded profile aggregate); eval rows join the "
    "profile on its full key and reduce map-side.",
    tags=("events", "timeseries"),
)
def ts_backtest_rolling_origin(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    folds = spark.createDataFrame(
        [(1, "2024-01-18"), (2, "2024-01-21"), (3, "2024-01-24")],
        "fold int, cut string",
    ).select("fold", F.col("cut").cast("timestamp").alias("cutoff"))
    keyed = e.select(
        "event_type",
        (F.dayofweek("ts") - 1).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hod"),
        "ts",
        "value",
        F.round(F.col("value") * 1000000.0, 0).cast("bigint").alias("vi"),
    )
    j = keyed.crossJoin(F.broadcast(folds))
    train = (
        j.filter(F.col("ts") < F.col("cutoff"))
        .groupBy("fold", "event_type", "dow", "hod")
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sv"),
            F.count(F.lit(1)).cast("bigint").alias("np"),
        )
    )
    profile = train.select(
        "fold",
        "event_type",
        "dow",
        "hod",
        F.floor(F.col("sv").cast("double") / F.col("np") * 1000000.0)
        .cast("bigint")
        .alias("fcq"),
    )
    ev = j.filter(
        (F.col("ts") >= F.col("cutoff"))
        & (F.col("ts") < F.col("cutoff") + F.expr("INTERVAL 3 DAY"))
    ).select("fold", "event_type", "dow", "hod", "vi")
    return (
        ev.join(profile, ["fold", "event_type", "dow", "hod"])
        .groupBy("fold", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_eval"),
            (
                F.sum(F.abs(F.col("vi") - F.col("fcq"))).cast("double")
                / (F.lit(1000000.0) * F.count(F.lit(1)))
            ).alias("mae"),
            (
                F.sum(F.col("vi") - F.col("fcq")).cast("double")
                / (F.lit(1000000.0) * F.count(F.lit(1)))
            ).alias("bias"),
        )
    )


@register(
    "events_ab_srm_check",
    """
    WITH per_user AS (
      SELECT user_id, CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS is_a
      FROM events GROUP BY user_id
    )
    SELECT CAST(SUM(is_a) AS BIGINT) AS n_a,
           CAST(SUM(1 - is_a) AS BIGINT) AS n_b,
           (SUM(is_a) - SUM(1 - is_a)) * (SUM(is_a) - SUM(1 - is_a)) * 1.0
             / COUNT(*) AS chi_sq,
           CASE WHEN (SUM(is_a) - SUM(1 - is_a))
                     * (SUM(is_a) - SUM(1 - is_a)) * 100
                    > 384 * COUNT(*)
                THEN 1 ELSE 0 END AS srm_suspect
    FROM per_user
    """,
    doc="Sample-ratio-mismatch guardrail for the A/B readout (the check "
    "that must gate events_ab_lift/cuped: a biased assignment invalidates "
    "everything downstream): chi-square against the expected 50/50 split "
    "simplifies to (n_a - n_b)^2 / n for two cells, an exact quotient of "
    "integer counts; the alert threshold (chi > 3.84, alpha = 0.05) is "
    "evaluated as an INTEGER cross-multiplication so the boolean can "
    "never sit on a float boundary. Plan: one user-grain dedup aggregate "
    "then a scalar fold — map-side combining, 2-counter state.",
    tags=("events",),
)
def events_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_user = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.first(F.lit(1)).alias("_one"))
        .select(
            F.when(F.col("user_id") % 2 == 0, F.lit(1)).otherwise(F.lit(0)).alias("is_a")
        )
    )
    diff = F.sum("is_a") - F.sum(F.lit(1) - F.col("is_a"))
    return per_user.agg(
        F.sum("is_a").cast("bigint").alias("n_a"),
        F.sum(F.lit(1) - F.col("is_a")).cast("bigint").alias("n_b"),
        (diff * diff * F.lit(1.0) / F.count(F.lit(1))).alias("chi_sq"),
        F.when(diff * diff * 100 > 384 * F.count(F.lit(1)), F.lit(1))
        .otherwise(F.lit(0))
        .alias("srm_suspect"),
    )


@register(
    "events_ab_power_mde",
    """
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS is_a,
             SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(value AS DECIMAL(18,6))
                      ELSE CAST(0 AS DECIMAL(18,6)) END) AS spend
      FROM events GROUP BY user_id
    ),
    scaled AS (
      SELECT is_a,
             CAST(spend AS DOUBLE) AS x,
             CAST(ROUND(CAST(spend AS DOUBLE) * 1000000.0, 0) AS BIGINT) AS xi
      FROM per_user
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(is_a) AS BIGINT) AS n_a,
             CAST(SUM(1 - is_a) AS BIGINT) AS n_b,
             -- x is an exact multiple of 1e-6 (it left a DECIMAL(18,6)
             -- sum), so the cast back recovers the exact first moment
             CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(xi AS DECIMAL(19,0)) * CAST(xi AS DECIMAL(19,0)))
                  AS DOUBLE) / 1000000000000.0 AS sxx
      FROM scaled
    )
    SELECT n_a, n_b,
           sx / n AS mean_metric,
           SQRT((sxx - sx * sx / n) / (n - 1)) AS sd_metric,
           2.801585 * SQRT(((sxx - sx * sx / n) / (n - 1))
                           * (1.0 / n_a + 1.0 / n_b)) AS mde_abs,
           2.801585 * SQRT(((sxx - sx * sx / n) / (n - 1))
                           * (1.0 / n_a + 1.0 / n_b)) / (sx / n) AS mde_rel
    FROM m
    """,
    doc="A/B power analysis: the minimum detectable effect at alpha=0.05 / "
    "power=0.8 for the per-user purchase-spend metric under the current "
    "50/50 split — (z_{0.975} + z_{0.8}) = 2.801585 ships as a shared "
    "hard literal (engine erf/quantile implementations differ; a literal "
    "cannot). Variance comes from exact DECIMAL first/second moments "
    "(the CUPED scaled-integer pattern), so mean/sd/MDE are identical "
    "op chains on identical operands in both engines, shipped unrounded "
    "(SQRT on the same double is bit-exact under IEEE754). Plan: one "
    "user-keyed aggregate then a 5-counter scalar fold.",
    tags=("events",),
)
def events_ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec = lambda c: c.cast("decimal(18,6)")  # noqa: E731
    zero = F.lit(0).cast("decimal(18,6)")
    per_user = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", dec(F.col("value"))).otherwise(
                    zero
                )
            ).alias("spend")
        )
        .select(
            F.when(F.col("user_id") % 2 == 0, F.lit(1)).otherwise(F.lit(0)).alias("is_a"),
            F.col("spend").cast("double").alias("x"),
        )
    )
    xi = F.round(F.col("x") * 1000000.0, 0).cast("bigint").cast("decimal(19,0)")
    m = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("is_a").cast("bigint").alias("n_a"),
        F.sum(F.lit(1) - F.col("is_a")).cast("bigint").alias("n_b"),
        F.sum(dec(F.col("x"))).cast("double").alias("sx"),
        (F.sum(xi * xi).cast("double") / F.lit(1000000000000.0)).alias("sxx"),
    )
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)
    mde = F.lit(2.801585) * F.sqrt(
        var * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    return m.select(
        "n_a",
        "n_b",
        (F.col("sx") / F.col("n")).alias("mean_metric"),
        F.sqrt(var).alias("sd_metric"),
        mde.alias("mde_abs"),
        (mde / (F.col("sx") / F.col("n"))).alias("mde_rel"),
    )


@register(
    "events_attribution_markov",
    None,  # the absorbing-chain solve is not SQL-expressible — rows-only;
    # an independent full-pipeline python reimplementation (power-series
    # absorption instead of the linear solve) is pinned by
    # tests/test_properties.py
    doc="Markov removal-effect attribution (Anderl et al. 2014 — the "
    "data-driven upgrade over first/last-touch in events_attribution): "
    "user journeys truncate at first purchase (CONV) or end (NULL), "
    "transition counts build the chain START -> channels -> absorbers, "
    "and each channel's credit is its REMOVAL EFFECT — how much total "
    "conversion probability disappears when every edge into the channel "
    "redirects to NULL — normalized into attribution shares. Execution "
    "splits by size: transitions are ONE user-partitioned LEAD window + "
    "a (from,to)-grain aggregate (<= (|channels|+2)^2 cells, map-side "
    "combined); the absorbing-chain linear solves run driver-side numpy "
    "on that tiny matrix (the kmeans-centroid / ridge-fit contract: "
    "driver state bounded by state-space size, never data size).",
    tags=("events", "iterative"),
    quality_test="tests/test_properties.py::test_markov_attribution_vs_independent_reimplementation",
)
def events_attribution_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", F.lit("CONV"))
        .otherwise(F.col("event_type"))
        .alias("state"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "state",
        F.row_number().over(w).alias("rn"),
        F.lead("state").over(w).alias("next_state"),
        F.min(F.when(F.col("state") == "CONV", F.row_number().over(w)))
        .over(Window.partitionBy("user_id"))
        .alias("conv_rn"),
    )
    # keep the journey up to (and including) the first conversion
    alive = marked.filter(
        F.col("conv_rn").isNull() | (F.col("rn") <= F.col("conv_rn"))
    )
    steps = alive.select(
        F.when(F.col("rn") == 1, F.lit("START")).otherwise(F.col("state")).alias(
            "dummy_from"
        ),
        "state",
        "rn",
        "next_state",
        "conv_rn",
    )
    trans = (
        steps.select(
            F.col("state").alias("from_state"),
            F.coalesce(
                F.when(
                    F.col("conv_rn").isNotNull() & (F.col("rn") == F.col("conv_rn")),
                    F.lit(None),
                ).otherwise(F.col("next_state")),
                F.lit("NULL"),
            ).alias("to_state"),
        )
        .filter(F.col("from_state") != "CONV")
        .unionByName(
            steps.filter(F.col("rn") == 1).select(
                F.lit("START").alias("from_state"), F.col("state").alias("to_state")
            )
        )
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    counts = {(r.from_state, r.to_state): r.n for r in trans.collect()}  # <= 49 cells
    channels = sorted(
        ({s for s, _ in counts} | {t for _, t in counts}) - {"START", "CONV", "NULL"}
    )
    transient = ["START"] + channels

    def conv_prob(removed: str | None) -> float:
        keep = [s for s in transient if s != removed]
        idx = {s: i for i, s in enumerate(keep)}
        q = np.zeros((len(keep), len(keep)))
        b = np.zeros(len(keep))
        for s in keep:
            tot = sum(n for (f, _), n in counts.items() if f == s)
            if tot == 0:
                continue
            for (f, t), n in counts.items():
                if f != s:
                    continue
                p = n / tot
                if t == "CONV":
                    b[idx[s]] += p
                elif t in idx:  # removed channel's inbound mass falls to NULL
                    q[idx[s], idx[t]] += p
        sol = np.linalg.solve(np.eye(len(keep)) - q, b)
        return float(sol[idx["START"]])

    base = conv_prob(None)
    effects = {
        c: max(0.0, 1.0 - (conv_prob(c) / base if base > 0 else 0.0))
        for c in channels
    }
    tot_eff = sum(effects.values()) or 1.0
    rows = [
        (c, round(effects[c], 6), round(effects[c] / tot_eff, 6), round(base, 6))
        for c in channels
    ]
    return spark.createDataFrame(
        rows, "channel string, removal_effect double, attribution_share double, base_conv_prob double"
    )


@register(
    "events_bot_score",
    """
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - LAG(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
               AS gap_us
      FROM events
    ),
    m AS (
      SELECT user_id,
             CAST(COUNT(gap_us) AS BIGINT) AS k,
             CAST(SUM(gap_us) AS BIGINT) AS sum_g,
             CAST(SUM(CAST(gap_us AS DECIMAL(19,0)) * CAST(gap_us AS DECIMAL(19,0)))
                  AS DOUBLE) AS sum_g2
      FROM g WHERE gap_us IS NOT NULL
      GROUP BY user_id HAVING COUNT(gap_us) >= 2
    )
    SELECT user_id,
           k + 1 AS n_events,
           sum_g // 1000000 AS span_s,
           (k + 1) * 3600000000.0 / sum_g AS events_per_hour,
           sum_g / (1000000.0 * k) AS mean_gap_s,
           SQRT((sum_g2 - CAST(sum_g AS DOUBLE) * CAST(sum_g AS DOUBLE) / k)
                / (k - 1)) / (CAST(sum_g AS DOUBLE) / k) AS gap_cv,
           CASE WHEN SQRT((sum_g2 - CAST(sum_g AS DOUBLE) * CAST(sum_g AS DOUBLE) / k)
                          / (k - 1)) / (CAST(sum_g AS DOUBLE) / k) < 0.2
                THEN 1 ELSE 0 END AS flag_regular,
           CASE WHEN (k + 1) * CAST(3600000000 AS BIGINT) > 50 * sum_g
                THEN 1 ELSE 0 END AS flag_high_rate
    FROM m
    """,
    doc="Behavioral bot screen per user: event rate and inter-arrival "
    "regularity — scripted traffic fires fast AND metronome-steady, so "
    "the two flags are events/hour > 50 (evaluated as an integer "
    "cross-multiplication on exact microsecond sums — no float boundary) "
    "and coefficient-of-variation of gaps < 0.2. Gap moments are exact: "
    "integer micro gaps, squared in DECIMAL(19,0)x(19,0) (the CUPED "
    "pattern), so the CV is an identical float-op chain on identical "
    "operands in both engines. Plan: ONE user-partitioned LAG window "
    "feeding a per-user moment aggregate — single exchange on user_id, "
    "3-counter state per user.",
    tags=("events", "quality"),
)
def events_bot_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    g = ev.select(
        "user_id", (F.col("us") - F.lag("us").over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    dec = F.col("gap_us").cast("decimal(19,0)")
    m = (
        g.groupBy("user_id")
        .agg(
            F.count("gap_us").cast("bigint").alias("k"),
            F.sum("gap_us").cast("bigint").alias("sum_g"),
            F.sum(dec * dec).cast("double").alias("sum_g2"),
        )
        .filter(F.col("k") >= 2)
    )
    sum_gd = F.col("sum_g").cast("double")
    mean = sum_gd / F.col("k")
    cv = F.sqrt((F.col("sum_g2") - sum_gd * sum_gd / F.col("k")) / (F.col("k") - 1)) / mean
    return m.select(
        "user_id",
        (F.col("k") + 1).alias("n_events"),
        F.expr("sum_g div 1000000").alias("span_s"),
        ((F.col("k") + 1) * F.lit(3600000000.0) / F.col("sum_g")).alias(
            "events_per_hour"
        ),
        (F.col("sum_g") / (F.lit(1000000.0) * F.col("k"))).alias("mean_gap_s"),
        cv.alias("gap_cv"),
        F.when(cv < 0.2, F.lit(1)).otherwise(F.lit(0)).alias("flag_regular"),
        F.when(
            (F.col("k") + 1) * F.lit(3600000000).cast("bigint") > 50 * F.col("sum_g"),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("flag_high_rate"),
    )


@register(
    "events_burst_detection",
    """
    WITH buckets AS (
      SELECT event_type,
             epoch_us(ts) // 3600000000 AS hour,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, epoch_us(ts) // 3600000000
    ),
    scored AS (
      SELECT event_type, hour, n,
             CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY hour
                               RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)
                  AS BIGINT) AS trailing_n,
             CAST(COUNT(n) OVER (PARTITION BY event_type ORDER BY hour
                                 RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)
                  AS BIGINT) AS trailing_hours
      FROM buckets
    )
    SELECT event_type, hour, n, trailing_n, trailing_hours,
           n * 1.0 * trailing_hours / trailing_n AS burst_ratio
    FROM scored
    WHERE trailing_hours >= 12
      AND 2 * n * trailing_hours > 3 * trailing_n
    """,
    doc="Burst detection over per-hour event rates: an hour is a burst "
    "when its count exceeds 1.5x the trailing-day average (computed over "
    "occupied hours via a RANGE frame, so gaps don't dilute the "
    "baseline; at least 12 trailing hours required before alerting). "
    "The alert predicate is an INTEGER cross-multiplication "
    "(2*n*trailing_hours > 3*trailing_n) — no float boundary anywhere; "
    "the reported ratio is one quotient of exact counts. Plan: the "
    "hour-grain rollup is the only data-sized aggregate; the RANGE "
    "window runs on the hour-grain table partitioned by event_type — "
    "span-bounded (hours in the corpus window), not row-bounded, the "
    "same grain contract as ts_resample/events_cumulative_distinct.",
    tags=("events", "timeseries"),
)
def events_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.expr("unix_micros(ts) div 3600000000").alias("hour"))
        .groupBy("event_type", "hour")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rangeBetween(-24, -1)
    )
    scored = b.select(
        "event_type",
        "hour",
        "n",
        F.sum("n").over(w).cast("bigint").alias("trailing_n"),
        F.count("n").over(w).cast("bigint").alias("trailing_hours"),
    )
    return scored.filter(
        (F.col("trailing_hours") >= 12)
        & (2 * F.col("n") * F.col("trailing_hours") > 3 * F.col("trailing_n"))
    ).select(
        "event_type",
        "hour",
        "n",
        "trailing_n",
        "trailing_hours",
        (
            F.col("n") * F.lit(1.0) * F.col("trailing_hours") / F.col("trailing_n")
        ).alias("burst_ratio"),
    )


@register(
    "events_causal_did",
    """
    WITH cutoff AS (
      SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS cut FROM events
    ),
    cell AS (
      SELECT e.user_id,
             CASE WHEN e.user_id % 2 = 0 THEN 1 ELSE 0 END AS treated,
             CASE WHEN epoch_us(e.ts) >= c.cut THEN 1 ELSE 0 END AS post,
             SUM(CASE WHEN e.event_type = 'purchase'
                      THEN CAST(e.value AS DECIMAL(18,6))
                      ELSE CAST(0 AS DECIMAL(18,6)) END) AS spend
      FROM events e CROSS JOIN cutoff c
      GROUP BY e.user_id, CASE WHEN e.user_id % 2 = 0 THEN 1 ELSE 0 END,
               CASE WHEN epoch_us(e.ts) >= c.cut THEN 1 ELSE 0 END
    ),
    m AS (
      SELECT treated, post,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(spend) AS DOUBLE) AS s
      FROM cell GROUP BY treated, post
    ),
    p AS (
      SELECT
        MAX(CASE WHEN treated = 1 AND post = 1 THEN s / n_users END) AS t_post,
        MAX(CASE WHEN treated = 1 AND post = 0 THEN s / n_users END) AS t_pre,
        MAX(CASE WHEN treated = 0 AND post = 1 THEN s / n_users END) AS c_post,
        MAX(CASE WHEN treated = 0 AND post = 0 THEN s / n_users END) AS c_pre,
        MAX(CASE WHEN treated = 1 AND post = 1 THEN n_users END) AS n_t_post,
        MAX(CASE WHEN treated = 1 AND post = 0 THEN n_users END) AS n_t_pre,
        MAX(CASE WHEN treated = 0 AND post = 1 THEN n_users END) AS n_c_post,
        MAX(CASE WHEN treated = 0 AND post = 0 THEN n_users END) AS n_c_pre
      FROM m
    )
    SELECT CAST(n_t_pre AS BIGINT) AS n_t_pre,
           CAST(n_t_post AS BIGINT) AS n_t_post,
           CAST(n_c_pre AS BIGINT) AS n_c_pre,
           CAST(n_c_post AS BIGINT) AS n_c_post,
           t_pre, t_post, c_pre, c_post,
           (t_post - t_pre) - (c_post - c_pre) AS did_estimate
    FROM p
    """,
    doc="Difference-in-differences readout — the causal estimate when "
    "assignment isn't randomized per-period: treated-vs-control change "
    "in per-user purchase spend across the period midpoint, with the "
    "control group's trend differenced out. Cell sums are exact "
    "DECIMAL(18,6) (the CUPED/A-B family convention), cell means and "
    "the DiD estimate are identical float-op chains on exact values, "
    "shipped unrounded. Per-user cells are counted per period they "
    "appear in (an inactive user contributes no cell — documented "
    "panel-composition caveat). Plan: broadcast scalar cutoff, one "
    "(user, period) aggregate, a 4-cell rollup, and a scalar pivot.",
    tags=("events",),
)
def events_causal_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec = lambda c: c.cast("decimal(18,6)")  # noqa: E731
    zero = F.lit(0).cast("decimal(18,6)")
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "value"
    )
    cut = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    ).select(F.expr("(lo + hi) div 2").alias("cut"))
    cell = (
        ev.crossJoin(F.broadcast(cut))
        .groupBy(
            "user_id",
            F.when(F.col("user_id") % 2 == 0, 1).otherwise(0).alias("treated"),
            F.when(F.unix_micros("ts") >= F.col("cut"), 1).otherwise(0).alias("post"),
        )
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", dec(F.col("value"))).otherwise(
                    zero
                )
            ).alias("spend")
        )
    )
    m = cell.groupBy("treated", "post").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("spend").cast("double").alias("s"),
    )
    pick = lambda t, p, col: F.max(  # noqa: E731
        F.when((F.col("treated") == t) & (F.col("post") == p), F.col(col))
    )
    p = m.select(
        "treated", "post", "n_users", (F.col("s") / F.col("n_users")).alias("mean")
    ).agg(
        pick(1, 1, "mean").alias("t_post"),
        pick(1, 0, "mean").alias("t_pre"),
        pick(0, 1, "mean").alias("c_post"),
        pick(0, 0, "mean").alias("c_pre"),
        pick(1, 1, "n_users").cast("bigint").alias("n_t_post"),
        pick(1, 0, "n_users").cast("bigint").alias("n_t_pre"),
        pick(0, 1, "n_users").cast("bigint").alias("n_c_post"),
        pick(0, 0, "n_users").cast("bigint").alias("n_c_pre"),
    )
    return p.select(
        "n_t_pre",
        "n_t_post",
        "n_c_pre",
        "n_c_post",
        "t_pre",
        "t_post",
        "c_pre",
        "c_post",
        (
            (F.col("t_post") - F.col("t_pre")) - (F.col("c_post") - F.col("c_pre"))
        ).alias("did_estimate"),
    )


@register(
    "events_markov_prediction_eval",
    """
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    trans AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM ordered WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    ),
    pred AS (
      SELECT from_type, to_type AS predicted, n
      FROM (
        SELECT from_type, to_type, n,
               ROW_NUMBER() OVER (PARTITION BY from_type
                                  ORDER BY n DESC, to_type ASC) AS rk
        FROM trans
      ) WHERE rk = 1
    )
    SELECT t.from_type,
           p.predicted,
           CAST(SUM(t.n) AS BIGINT) AS n_transitions,
           CAST(SUM(CASE WHEN t.to_type = p.predicted THEN t.n ELSE 0 END)
                AS BIGINT) AS n_correct,
           SUM(CASE WHEN t.to_type = p.predicted THEN t.n ELSE 0 END) * 1.0
             / SUM(t.n) AS top1_accuracy
    FROM trans t JOIN pred p ON p.from_type = t.from_type
    GROUP BY t.from_type, p.predicted
    """,
    doc="Next-event prediction eval — turns events_path_markov's "
    "transition matrix into a MEASURED top-1 predictor (the "
    "text_langid_confusion pattern applied to behavior): per from-state, "
    "the argmax next-event (count-desc, name-asc tie-break — "
    "deterministic) and its empirical accuracy over all transitions. "
    "Counts are exact; accuracy is one quotient of exact counts. The "
    "argmax window runs on the TRANSITION-GRAIN table (<= |types|^2 "
    "rows), never on events — the aggregate-first shape that keeps the "
    "per-from-state window trivially bounded at any corpus size. "
    "One user-partitioned LEAD is the only data-sized operation.",
    tags=("events",),
)
def events_markov_prediction_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    rk = Window.partitionBy("from_type").orderBy(F.col("n").desc(), F.col("to_type"))
    pred = (
        trans.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select("from_type", F.col("to_type").alias("predicted"))
    )
    return (
        trans.join(F.broadcast(pred), "from_type")
        .groupBy("from_type", "predicted")
        .agg(
            F.sum("n").cast("bigint").alias("n_transitions"),
            F.sum(F.when(F.col("to_type") == F.col("predicted"), F.col("n")).otherwise(0))
            .cast("bigint")
            .alias("n_correct"),
        )
        .select(
            "from_type",
            "predicted",
            "n_transitions",
            "n_correct",
            (F.col("n_correct") * F.lit(1.0) / F.col("n_transitions")).alias(
                "top1_accuracy"
            ),
        )
    )
