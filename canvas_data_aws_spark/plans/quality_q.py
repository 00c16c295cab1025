"""Data-quality operators: rule-based expectation checks and referential-
integrity audits — the validation pass a warehouse sync (reference:
sync-canvas-data-files.py registering typed tables) needs before publishing
a snapshot. Both are single-scan conditional aggregations / anti-joins:
no per-rule extra pass, no driver-side row iteration.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from canvas_data_aws_spark.plans.registry import register
from canvas_data_aws_spark.sources.parquet import load_table


@register(
    "dq_expectations",
    """
    SELECT
      COUNT(*) AS n_rows,
      CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_orderkey,
      CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 45 THEN 1 ELSE 0 END) AS BIGINT) AS qty_out_of_range,
      CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.08 THEN 1 ELSE 0 END) AS BIGINT) AS disc_out_of_range,
      CAST(SUM(CASE WHEN l_shipdate IS NULL OR l_shipdate < DATE '1993-06-01' THEN 1 ELSE 0 END) AS BIGINT) AS bad_shipdate,
      CAST(SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END) AS BIGINT) AS bad_returnflag,
      CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpositive_price
    FROM lineitem
    """,
    doc="Expectation suite over lineitem (null / range / ordering / domain / "
    "positivity rules) evaluated as ONE conditional aggregation: a 100 TB "
    "validation pass costs exactly one scan regardless of rule count, and "
    "every rule partially aggregates map-side to a single summary row.",
    tags=("quality",),
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def viol(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    return li.agg(
        F.count("*").alias("n_rows"),
        viol(F.col("l_orderkey").isNull()).alias("null_orderkey"),
        viol((F.col("l_quantity") < 1) | (F.col("l_quantity") > 45)).alias(
            "qty_out_of_range"
        ),
        viol((F.col("l_discount") < 0) | (F.col("l_discount") > 0.08)).alias(
            "disc_out_of_range"
        ),
        viol(
            F.col("l_shipdate").isNull()
            | (F.col("l_shipdate") < F.lit("1993-06-01").cast("date"))
        ).alias("bad_shipdate"),
        viol(~F.col("l_returnflag").isin("A", "N", "R")).alias("bad_returnflag"),
        viol(F.col("l_extendedprice") <= 0).alias("nonpositive_price"),
    )


@register(
    "dq_fk_integrity",
    """
    SELECT
      (SELECT COUNT(*) FROM lineitem l
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        AS orphan_lineitems,
      (SELECT COUNT(*) FROM orders o
       WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        AS orphan_orders,
      (SELECT COUNT(*) FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
        AS orphan_customers
    """,
    doc="Referential-integrity audit across the FK chain lineitem -> orders "
    "-> customer -> nation: each check is a left-anti join on the FK (the "
    "dimension side broadcasts when small; the fact-fact check shuffles "
    "both sides on the key once) feeding a count — never a row-level "
    "collect. The post-sync gate for the reference's typed star schema.",
    tags=("quality",),
)
def dq_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey")
    orphan_li = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count("*").alias("orphan_lineitems"))
    )
    orphan_o = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count("*").alias("orphan_orders"))
    )
    orphan_c = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left_anti")
        .agg(F.count("*").alias("orphan_customers"))
    )
    return orphan_li.crossJoin(orphan_o).crossJoin(orphan_c)


@register(
    "dq_skew_profile",
    """
    WITH per_key AS (
      SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
    )
    SELECT COUNT(*) AS n_keys,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(MAX(n) AS BIGINT) AS max_per_key,
           ROUND(quantile_cont(n, 0.5), 2) AS p50_per_key,
           ROUND(quantile_cont(n, 0.99), 2) AS p99_per_key,
           ROUND(MAX(n) / AVG(n), 4) AS skew_ratio
    FROM per_key
    """,
    doc="Key-distribution (skew) profile of the events log's shuffle key — "
    "the diagnostic run BEFORE choosing a partition/salting strategy: key "
    "count, max and p50/p99 rows-per-key, and max/mean skew ratio. Shape: "
    "one partially-aggregated count per key, then one single-row summary "
    "agg; the per-key table is the only exchange and the profile itself "
    "never leaves the executors until the final row. A skew_ratio >> 1 "
    "says the key needs salting (see join_salted_hot_key) before a 100 TB "
    "join/groupBy on it.",
    tags=("quality",),
)
def dq_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id")
    per_key = e.groupBy("user_id").agg(F.count("*").alias("n"))
    return per_key.agg(
        F.count("*").alias("n_keys"),
        F.sum("n").cast("bigint").alias("n_rows"),
        F.max("n").cast("bigint").alias("max_per_key"),
        F.round(F.expr("percentile(n, 0.5)"), 2).alias("p50_per_key"),
        F.round(F.expr("percentile(n, 0.99)"), 2).alias("p99_per_key"),
        F.round(F.max("n") / F.avg("n"), 4).alias("skew_ratio"),
    )


@register(
    "dq_row_count_drift",
    """
    WITH per_day AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY day
    ),
    stats AS (
      SELECT quantile_cont(n, 0.5) AS med FROM per_day
    )
    SELECT p.day, CAST(p.n AS BIGINT) AS n_rows,
           ROUND(p.n / s.med, 4) AS vs_median,
           p.n < 0.5 * s.med OR p.n > 2.0 * s.med AS is_anomalous
    FROM per_day p CROSS JOIN stats s
    """,
    doc="Load-volume drift check: per-day row counts scored against the "
    "median day — the monitor that catches a half-empty or doubled "
    "partition BEFORE it poisons downstream aggregates (the reference's "
    "sync has no such gate; a truncated extract lands silently). One "
    "map-side-combined count per day, a one-row median, and a row-local "
    "flag; the per-day table is calendar-sized, so every step after the "
    "first agg is negligible at any data scale.",
    tags=("quality",),
)
def dq_row_count_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").cast("date").alias("day")
    )
    per_day = e.groupBy("day").agg(F.count("*").alias("n"))
    stats = per_day.agg(F.expr("percentile(n, 0.5)").alias("med"))
    return per_day.crossJoin(F.broadcast(stats)).select(
        "day",
        F.col("n").cast("bigint").alias("n_rows"),
        F.round(F.col("n") / F.col("med"), 4).alias("vs_median"),
        ((F.col("n") < 0.5 * F.col("med")) | (F.col("n") > 2.0 * F.col("med"))).alias(
            "is_anomalous"
        ),
    )


@register(
    "dq_category_drift",
    """
    WITH src AS (
      SELECT source, lang, CAST(COUNT(*) AS DOUBLE) AS c
      FROM documents GROUP BY source, lang
    ),
    stot AS (SELECT source, SUM(c) AS n_src FROM src GROUP BY source),
    corp AS (
      SELECT lang, CAST(COUNT(*) AS DOUBLE) AS c_corp FROM documents GROUP BY lang
    ),
    ctot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_corp FROM documents),
    grid AS (
      SELECT st.source, st.n_src, co.lang, co.c_corp
      FROM stot st CROSS JOIN corp co
    )
    SELECT g.source,
           ROUND(0.5 * SUM(ABS(COALESCE(s.c, 0.0) / g.n_src
                               - g.c_corp / (SELECT n_corp FROM ctot))), 4)
             AS tv_distance
    FROM grid g LEFT JOIN src s ON s.source = g.source AND s.lang = g.lang
    GROUP BY g.source
    """,
    doc="Categorical drift monitor: per-source language distribution vs "
    "the corpus-wide distribution, scored as total-variation distance "
    "0.5*sum|p_src - p_corpus| — the data-quality check that catches a "
    "crawler or loader silently changing its language mix. The (source x "
    "lang) grid comes from crossing two AGGREGATED frames (categories, "
    "not rows — missing combinations count as zero share, which an inner "
    "join would silently drop). Heavy scans aggregate away first; "
    "everything after is category-sized.",
    tags=("quality",),
)
def dq_category_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("source", "lang")
    src = d.groupBy("source", "lang").agg(F.count("*").cast("double").alias("c"))
    stot = src.groupBy("source").agg(F.sum("c").alias("n_src"))
    corp = d.groupBy("lang").agg(F.count("*").cast("double").alias("c_corp"))
    ctot = d.agg(F.count("*").cast("double").alias("n_corp"))
    grid = stot.crossJoin(corp)
    return (
        grid.join(src, ["source", "lang"], "left")
        .crossJoin(F.broadcast(ctot))  # single-row scalar: safe broadcast
        .groupBy("source")
        .agg(
            F.round(
                0.5
                * F.sum(
                    F.abs(
                        F.coalesce(F.col("c"), F.lit(0.0)) / F.col("n_src")
                        - F.col("c_corp") / F.col("n_corp")
                    )
                ),
                4,
            ).alias("tv_distance")
        )
    )


@register(
    "dq_k_anonymity",
    """
    WITH cells AS (
      SELECT c.c_mktsegment, n.n_name, COUNT(*) AS cell_size
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY c.c_mktsegment, n.n_name
    )
    SELECT c_mktsegment, n_name, CAST(cell_size AS BIGINT) AS cell_size,
           cell_size < 5 AS below_k
    FROM cells
    """,
    doc="k-anonymity audit over the quasi-identifier pair (market segment, "
    "nation): every equivalence-class size, flagged when under k=5 — the "
    "data-governance gate a training-data release runs before shipping "
    "user-derived tables (small cells re-identify individuals). One "
    "broadcast dim join + one grouped count with map-side combine; the "
    "output is category-product-sized however big the input. "
    "Generalization/suppression of the flagged cells is the downstream "
    "policy step; this query is the measurement.",
    tags=("quality",),
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_mktsegment", "n_name")
        .agg(F.count("*").alias("cell_size"))
        .select(
            "c_mktsegment",
            "n_name",
            "cell_size",
            (F.col("cell_size") < 5).alias("below_k"),
        )
    )


@register(
    "text_gopher_rules",
    r"""
    WITH w AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\s+'),
                         x -> length(x) > 0) AS words,
             string_split(text, chr(10)) AS lines,
             length(regexp_replace(text, '\s', '', 'g')) AS n_wchars,
             (length(text) - length(replace(text, '#', '')))
               + (length(text) - length(replace(text, '...', ''))) / 3 AS n_sym
      FROM documents
    ),
    c AS (
      SELECT doc_id,
             CAST(len(words) AS BIGINT) AS n_words,
             CAST(n_wchars AS BIGINT) AS n_wchars,
             CAST(n_sym AS BIGINT) AS n_sym,
             CAST(len(list_filter(words,
                  x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS n_alpha_words,
             CAST(len(list_filter(lines,
                  x -> regexp_matches(x, '^\s*[-*•]'))) AS BIGINT) AS n_bullet,
             CAST(len(list_filter(lines,
                  x -> regexp_matches(x, '(\.\.\.|…)\s*$'))) AS BIGINT) AS n_ell,
             CAST(len(lines) AS BIGINT) AS n_lines,
             CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
                  s -> list_contains(words, s))) AS BIGINT) AS n_req
      FROM w
    )
    SELECT doc_id, n_words,
           (n_words BETWEEN 50 AND 100000)            AS ok_word_count,
           (3 * n_words <= n_wchars
             AND n_wchars <= 10 * n_words)            AS ok_mean_word_len,
           (10 * n_sym <= n_words)                    AS ok_symbol_ratio,
           (10 * n_bullet <= 9 * n_lines)             AS ok_bullets,
           (10 * n_ell <= 3 * n_lines)                AS ok_ellipses,
           (10 * n_alpha_words >= 8 * n_words)        AS ok_alpha_words,
           (n_req >= 2)                               AS ok_required_words,
           ((n_words BETWEEN 50 AND 100000)
             AND 3 * n_words <= n_wchars AND n_wchars <= 10 * n_words
             AND 10 * n_sym <= n_words
             AND 10 * n_bullet <= 9 * n_lines
             AND 10 * n_ell <= 3 * n_lines
             AND 10 * n_alpha_words >= 8 * n_words
             AND n_req >= 2)                          AS passes_all
    FROM c
    """,
    doc="Gopher-style quality rule set (Rae et al. 2021 §A1.1, the filter "
    "Dolma/RedPajama reuse): per-document booleans for word count in "
    "[50, 1e5], mean word length in [3, 10], symbol-to-word ratio <= 0.1 "
    "(#/ellipsis), <=90% bullet lines, <=30% ellipsis-ended lines, >=80% "
    "words containing a letter, and >=2 of the eight required English "
    "stop words. Every ratio threshold is evaluated as an INTEGER "
    "cross-multiplication (e.g. 10*n_sym <= n_words), so the oracle "
    "compare never touches a float boundary. Entirely row-local — one "
    "scan, zero exchanges at any corpus size; compose with a filter on "
    "passes_all for the curation funnel.",
    tags=("llm", "curation", "quality"),
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.filter(F.split(F.col("text"), r"\s+"), lambda x: F.length(x) > 0)
    lines = F.split(F.col("text"), "\n")
    c = docs.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_words"),
        F.length(F.regexp_replace("text", r"\s", "")).cast("bigint").alias("n_wchars"),
        (
            F.regexp_count("text", F.lit("#")) + F.regexp_count("text", F.lit(r"\.\.\."))
        ).cast("bigint").alias("n_sym"),
        F.size(F.filter(words, lambda x: x.rlike("[a-zA-Z]"))).cast("bigint").alias(
            "n_alpha_words"
        ),
        F.size(F.filter(lines, lambda x: x.rlike(r"^\s*[-*•]"))).cast("bigint").alias(
            "n_bullet"
        ),
        F.size(F.filter(lines, lambda x: x.rlike(r"(\.\.\.|…)\s*$"))).cast(
            "bigint"
        ).alias("n_ell"),
        F.size(lines).cast("bigint").alias("n_lines"),
        F.size(
            F.filter(
                F.array(*[F.lit(s) for s in
                          ("the", "be", "to", "of", "and", "that", "have", "with")]),
                lambda s: F.array_contains(words, s),
            )
        ).cast("bigint").alias("n_req"),
    )
    ok_wc = F.col("n_words").between(50, 100000)
    ok_mwl = (3 * F.col("n_words") <= F.col("n_wchars")) & (
        F.col("n_wchars") <= 10 * F.col("n_words")
    )
    ok_sym = 10 * F.col("n_sym") <= F.col("n_words")
    ok_bul = 10 * F.col("n_bullet") <= 9 * F.col("n_lines")
    ok_ell = 10 * F.col("n_ell") <= 3 * F.col("n_lines")
    ok_alpha = 10 * F.col("n_alpha_words") >= 8 * F.col("n_words")
    ok_req = F.col("n_req") >= 2
    return c.select(
        "doc_id",
        "n_words",
        ok_wc.alias("ok_word_count"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_sym.alias("ok_symbol_ratio"),
        ok_bul.alias("ok_bullets"),
        ok_ell.alias("ok_ellipses"),
        ok_alpha.alias("ok_alpha_words"),
        ok_req.alias("ok_required_words"),
        (ok_wc & ok_mwl & ok_sym & ok_bul & ok_ell & ok_alpha & ok_req).alias(
            "passes_all"
        ),
    )


@register(
    "dq_column_profile",
    """
    SELECT 'o_orderkey' AS column_name,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'o_orderstatus',
           CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'o_totalprice',
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'o_orderdate',
           CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderdate) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) FROM orders
    """,
    doc="Whole-table column profiler — the first report a data steward "
    "pulls on an unfamiliar table: per-column null count and EXACT "
    "distinct cardinality for every orders column, computed in ONE scan "
    "and one aggregate (Spark plans the multi-column COUNT DISTINCT via "
    "its Expand operator — rows multiply by column count map-side, then "
    "one exchange; the oracle states the same numbers as per-column "
    "aggregates). Exact distinct is the fixture-scale choice; the "
    "100 TB swap is approx_count_distinct per column in the same single "
    "pass (sketches merge map-side, no Expand blowup) at the documented "
    "~2% HLL error — the same trade agg_approx_count_distinct registers "
    "explicitly. The unpivoted (column, metric) shape feeds drift "
    "monitors directly (dq_row_count_drift / dq_category_drift).",
    tags=("quality",),
)
def dq_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ]
    o = load_table(spark, sf_dir, "orders").select(*cols)
    aggs = []
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"__n_{c}")
        )
        aggs.append(F.countDistinct(c).cast("bigint").alias(f"__d_{c}"))
    one = o.agg(*aggs)
    stacked = ", ".join(f"'{c}', __n_{c}, __d_{c}" for c in cols)
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stacked}) AS (column_name, n_nulls, n_distinct)"
        )
    )
