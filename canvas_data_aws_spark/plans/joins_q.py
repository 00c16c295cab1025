"""B.3 joins (SURVEY.md §2): the star-schema join surface.

Physical-strategy notes (the 100 TB story):
- dims (region/nation/supplier/part/customer at warehouse scale: small) are
  broadcast — zero shuffle on the fact side;
- fact-fact joins (lineitem ⋈ orders) shuffle on the join key once; AQE
  handles skew and coalesces post-shuffle partitions;
- theta/range joins always carry an equi-prefix so Catalyst keeps them
  hash-based — a bare inequality would be a broadcast-nested-loop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from canvas_data_aws_spark.operators.joins import asof_join, range_interval_join
from canvas_data_aws_spark.plans.registry import register
from canvas_data_aws_spark.sources.parquet import load_table


@register(
    "join_broadcast_equi",
    """
    SELECT r.r_name AS region_name,
           COUNT(*) AS n_customers,
           ROUND(SUM(c.c_acctbal), 2) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    doc="Small-dim chain broadcast: customer ⋈ nation ⋈ region with both dims "
    "broadcast — the fact side never shuffles for the join.",
)
def join_broadcast_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@register(
    "join_sortmerge_equi",
    """
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    doc="Large-large equi-join (lineitem ⋈ orders): sort-merge/shuffled-hash "
    "above the broadcast threshold; one shuffle on the join key, partial "
    "aggregation after.",
)
def join_sortmerge_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").hint("merge")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
    )


@register(
    "join_shuffle_hash",
    """
    SELECT o.o_orderstatus,
           COUNT(*) AS n_items,
           ROUND(AVG(l.l_quantity), 4) AS avg_qty
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
    doc="Shuffled hash join (SHUFFLE_HASH hint): avoids the sort phase when "
    "one side's per-partition build fits memory — often faster than SMJ for "
    "skew-free fact-fact joins.",
)
def join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").hint("shuffle_hash")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        )
    )


@register(
    "join_left_outer",
    """
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
    doc="Left outer: every customer kept, orderless customers count 0 "
    "(COUNT over the nullable right key).",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_right_outer",
    """
    SELECT p.p_partkey, COUNT(l.l_orderkey) AS n_lineitems
    FROM lineitem l
    RIGHT JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_partkey
    """,
    doc="Right outer: every part kept even if never ordered.",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(p, li.l_partkey == p.p_partkey, "right")
        .groupBy("p_partkey")
        .agg(F.count("l_orderkey").alias("n_lineitems"))
    )


@register(
    "join_full_outer",
    """
    WITH a AS (SELECT c_custkey AS k, c_acctbal FROM customer WHERE c_custkey % 3 = 0),
         b AS (SELECT c_custkey AS k, c_name    FROM customer WHERE c_custkey % 2 = 0)
    SELECT
      COALESCE(a.k, b.k) AS k,
      CASE WHEN a.k IS NULL THEN 'right_only'
           WHEN b.k IS NULL THEN 'left_only'
           ELSE 'both' END AS verdict
    FROM a FULL OUTER JOIN b ON a.k = b.k
    """,
    doc="Full outer with three-way verdict column — the exact shape of the "
    "sync reconciler's diff (SURVEY.md §2 Part A: skip/fetch/delete).",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_custkey") % 3 == 0).select(F.col("c_custkey").alias("ak"), "c_acctbal")
    b = c.filter(F.col("c_custkey") % 2 == 0).select(F.col("c_custkey").alias("bk"), "c_name")
    return a.join(b, a.ak == b.bk, "full_outer").select(
        F.coalesce("ak", "bk").alias("k"),
        F.when(F.col("ak").isNull(), "right_only")
        .when(F.col("bk").isNull(), "left_only")
        .otherwise("both")
        .alias("verdict"),
    )


@register(
    "join_left_semi",
    """
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
    doc="Existence filter (WHERE EXISTS) as left-semi join: right side only "
    "probes, never widens the row.",
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_mktsegment")


@register(
    "join_left_anti",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
    doc="Absence filter (NOT EXISTS) as left-anti join — also the core of the "
    "reference's sync diff (sync-canvas-data-files.py:58-112).",
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_theta_nonequi",
    """
    SELECT n.n_name AS nation_name,
           COUNT(*) AS n_pairs
    FROM supplier s
    JOIN customer c ON s.s_nationkey = c.c_nationkey AND s.s_acctbal < c.c_acctbal
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name
    """,
    doc="Theta join with equi-prefix (same nation) + inequality residual "
    "(s_acctbal < c_acctbal): stays a hash join on the prefix, never BNLJ.",
)
def join_theta_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(c, (s.s_nationkey == c.c_nationkey) & (s.s_acctbal < c.c_acctbal))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "join_cross",
    """
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
    doc="Cartesian product (tiny dims only; 5×25 rows).",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "join_range_interval",
    """
    SELECT l.l_returnflag,
           COUNT(*) AS n_in_window,
           ROUND(SUM(l.l_extendedprice), 2) AS window_price
    FROM lineitem l
    JOIN orders o
      ON o.o_orderkey = l.l_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
    GROUP BY l.l_returnflag
    """,
    doc="Point-in-interval join (lineitem shipped inside [orderdate, +30d] of "
    "its order) via the range_interval_join composite: equi-prefix on the "
    "order key keeps it hash-based.",
)
def join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    joined = range_interval_join(
        li,
        o,
        left_key="l_orderkey",
        right_key="o_orderkey",
        left_ts="l_shipdate",
        interval_start=o["o_orderdate"],
        interval_end=o["o_orderdate"] + F.expr("INTERVAL 30 DAYS"),
    )
    return joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_in_window"),
        F.round(F.sum("l_extendedprice"), 2).alias("window_price"),
    )


@register(
    "join_asof",
    """
    WITH j AS (
      SELECT e.event_id, o.o_orderkey, o.o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e
      JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    )
    SELECT event_id,
           o_orderkey   AS asof_orderkey,
           o_orderdate  AS asof_orderdate
    FROM j WHERE rn = 1
    """,
    doc="As-of join: latest order at-or-before each event's timestamp per "
    "customer; inclusive backward semantics, o_orderkey-desc tie-break "
    "(composite operator, operators/joins.py).",
)
def join_asof_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    j = asof_join(
        e,
        o,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        tie_breakers=["o_orderkey"],
        how="inner",
    )
    return j.select(
        "event_id",
        F.col("o_orderkey").alias("asof_orderkey"),
        F.col("o_orderdate").alias("asof_orderdate"),
    )


@register(
    "join_null_safe_equi",
    """
    WITH l AS (
      SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang
      FROM documents
    ),
    r AS (
      SELECT lang, COUNT(*) AS n_docs
      FROM (SELECT CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang
            FROM documents)
      GROUP BY lang
    )
    SELECT l.doc_id, l.lang, r.n_docs
    FROM l JOIN r ON l.lang IS NOT DISTINCT FROM r.lang
    """,
    doc="Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys MATCH "
    "each other instead of silently dropping — the semantics a sync diff "
    "needs when a nullable column is part of the key. Stays a hash join "
    "(EqualNullSafe is a valid hash key: NULL hashes to a bucket like any "
    "value), so the plan is identical in shape to join_sortmerge_equi — "
    "no fallback to BNLJ. The NULL bucket is also the canonical skew "
    "hazard: at 100 TB a mostly-null key column funnels to one partition, "
    "which is exactly what join_salted_hot_key's salting fixes.",
    tags=("joins",),
)
def join_null_safe_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    null_lang = F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(
        F.col("lang")
    )
    left = docs.select("doc_id", null_lang.alias("lang"))
    right = (
        docs.select(null_lang.alias("rlang"))
        .groupBy("rlang")
        .agg(F.count("*").alias("n_docs"))
    )
    return left.join(right, left.lang.eqNullSafe(right.rlang)).select(
        "doc_id", "lang", "n_docs"
    )


@register(
    "join_asof_forward",
    """
    WITH j AS (
      SELECT e.event_id, o.o_orderkey, o.o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate ASC, o.o_orderkey ASC) AS rn
      FROM events e
      JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
    )
    SELECT event_id,
           o_orderkey   AS next_orderkey,
           o_orderdate  AS next_orderdate
    FROM j WHERE rn = 1
    """,
    doc="Forward as-of join: the EARLIEST order at-or-after each event's "
    "timestamp per customer (pandas merge_asof direction='forward' — the "
    "'what happened next' lookup behind conversion and time-to-action "
    "analyses). Same argmin-aggregate shape as join_asof: the join "
    "fan-out collapses map-side to one row per event BEFORE the exchange, "
    "never a window over the full fan-out.",
    tags=("joins",),
)
def join_asof_forward_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    j = asof_join(
        e,
        o,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        tie_breakers=["o_orderkey"],
        how="inner",
        direction="forward",
    )
    return j.select(
        "event_id",
        F.col("o_orderkey").alias("next_orderkey"),
        F.col("o_orderdate").alias("next_orderdate"),
    )


@register(
    "join_interval_overlap",
    """
    WITH li AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_shipdate AS DATE) AS ship_start,
             CAST(l_shipdate AS DATE) + CAST(CAST(l_quantity AS INT) % 10 + 3 AS INT)
               AS ship_end
      FROM lineitem WHERE l_orderkey % 397 = 0
    ),
    promo AS (
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS promo_start,
             CAST(o_orderdate AS DATE) + 14 AS promo_end
      FROM orders WHERE o_orderkey % 131 = 0
    )
    SELECT li.l_orderkey, li.l_linenumber, promo.o_orderkey,
           CAST(date_diff('day',
                          GREATEST(li.ship_start, promo.promo_start),
                          LEAST(li.ship_end, promo.promo_end)) + 1 AS INT)
             AS overlap_days
    FROM li JOIN promo
      ON li.ship_start <= promo.promo_end AND promo.promo_start <= li.ship_end
    """,
    doc="Interval-overlap join (shipment windows x promo windows) via the "
    "temporal-grid rewrite in operators/joins.py::interval_overlap_join: "
    "both interval sets explode to the month buckets they span, equi-join "
    "on the bucket with the overlap test as a residual, and each pair is "
    "emitted only from the bucket where its overlap begins — exact, no "
    "distinct pass, no cartesian. The DuckDB oracle runs the naive "
    "inequality join, proving the grid introduces no duplicates or misses.",
    tags=("joins",),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.joins import interval_overlap_join

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 397 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_shipdate").cast("date").alias("ship_start"),
            F.date_add(
                F.col("l_shipdate").cast("date"),
                (F.col("l_quantity").cast("int") % 10 + 3),
            ).alias("ship_end"),
        )
    )
    promo = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 131 == 0)
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("promo_start"),
            F.date_add(F.col("o_orderdate").cast("date"), 14).alias("promo_end"),
        )
    )
    out = interval_overlap_join(
        li, promo, "ship_start", "ship_end", "promo_start", "promo_end"
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "o_orderkey",
        (
            F.datediff(
                F.least("ship_end", "promo_end"),
                F.greatest("ship_start", "promo_start"),
            )
            + 1
        )
        .cast("int")
        .alias("overlap_days"),
    )


@register(
    "join_runtime_bloom_filter",
    """
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18, 4))
                    * (1 - CAST(l_discount AS DECIMAL(18, 4)))) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY 1
    """,
    doc="Runtime bloom-filter semi-join reduction — Catalyst's row-level "
    "answer to scanning 100 TB of fact rows only to drop most of them at "
    "the join: the optimizer builds a bloom filter over the selectively "
    "filtered orders keys and injects a might_contain predicate into the "
    "lineitem scan, so non-matching rows die before the shuffle. Runs in "
    "an isolated newSession() because the demonstration lowers the "
    "application-side scan threshold (production default engages at 10 GB "
    "scans — far above fixture scale) and disables broadcast to force the "
    "shuffle join the filter exists to protect; tests/test_plan_audit "
    "asserts bloom_filter_agg + might_contain in the plan.",
    tags=("joins",),
)
def join_runtime_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    li = load_table(s2, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = (
        load_table(s2, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_orderdate")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("order_month")
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,4)")
                * (1 - F.col("l_discount").cast("decimal(18,4)"))
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "join_asof_nearest",
    """
    WITH j AS (
      SELECT e.event_id, o.o_orderkey, o.o_orderdate,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY ABS(date_diff('second', o.o_orderdate, e.ts)) ASC,
                        o.o_orderdate ASC, o.o_orderkey ASC) AS rn
      FROM events e
      JOIN orders o ON o.o_custkey = e.user_id
    )
    SELECT event_id,
           o_orderkey  AS nearest_orderkey,
           o_orderdate AS nearest_orderdate
    FROM j WHERE rn = 1
    """,
    doc="Nearest as-of join (pandas merge_asof direction='nearest', "
    "completing the backward/forward family): the order closest in time "
    "to each event in EITHER direction, equal distances breaking toward "
    "the earlier order then orderkey. Same map-side argmin-aggregate "
    "collapse — one row per event crosses the exchange, never the "
    "per-key fan-out.",
    tags=("joins",),
)
def join_asof_nearest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    j = asof_join(
        e,
        o,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        tie_breakers=["o_orderkey"],
        how="inner",
        direction="nearest",
    )
    return j.select(
        "event_id",
        F.col("o_orderkey").alias("nearest_orderkey"),
        F.col("o_orderdate").alias("nearest_orderdate"),
    )


@register(
    "join_asof_tolerance",
    """
    WITH j AS (
      SELECT e.event_id, o.o_orderkey, o.o_orderdate,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e
      LEFT JOIN orders o ON o.o_custkey = e.user_id
        AND o.o_orderdate <= e.ts
        AND o.o_orderdate >= e.ts - INTERVAL 30 DAY
    )
    SELECT event_id,
           o_orderkey  AS asof_orderkey,
           o_orderdate AS asof_orderdate
    FROM j WHERE rn = 1
    """,
    doc="Bounded as-of join (pandas merge_asof tolerance=30d): latest order "
    "at-or-before each event but no older than 30 days; events with no "
    "order inside the window keep NULLs (left semantics). The two-sided "
    "range predicate is also the scale control for as-of joins: per-event "
    "join fan-out is bounded by order density x 30 days instead of the "
    "customer's full history, so the pre-aggregation argmax collapse "
    "touches O(events x bounded window) rows however long the history "
    "grows (operators/joins.py::asof_join tolerance_seconds).",
    tags=("joins",),
)
def join_asof_tolerance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    j = asof_join(
        e,
        o,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        tie_breakers=["o_orderkey"],
        how="left",
        tolerance_seconds=30 * 86400,
    )
    return j.select(
        "event_id",
        F.col("o_orderkey").alias("asof_orderkey"),
        F.col("o_orderdate").alias("asof_orderdate"),
    )
