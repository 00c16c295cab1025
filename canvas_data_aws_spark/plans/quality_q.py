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


# Benford machinery: first-significant-digit of an exact integer (cents)
# via a floor-division CASE cascade — log10() would hit 1-ulp boundary
# disagreements between engines at exact powers of ten; integer compares
# and floor-divides cannot. The expected shares are hard literals (not
# engine-computed log10(1+1/d)) for the same reason.
_BENFORD_P = {
    1: "0.301029995663981", 2: "0.176091259055681", 3: "0.124938736608300",
    4: "0.096910013008056", 5: "0.079181246047625", 6: "0.066946789630613",
    7: "0.057991946977687", 8: "0.051152522447381", 9: "0.045757490560675",
}


def _digit_cascade(divop: str) -> str:
    clauses = []
    for k in range(17, 0, -1):
        p = 10 ** k
        clauses.append(f"WHEN c >= {p} THEN c {divop} {p}")
    clauses.append("ELSE c")
    return "CASE " + " ".join(clauses) + " END"


_BENFORD_CASE = (
    "CASE "
    + " ".join(f"WHEN digit = {d} THEN CAST({p} AS DOUBLE)" for d, p in _BENFORD_P.items())
    + " END"
)


@register(
    "dq_benford_first_digit",
    f"""
    WITH cents AS (
      SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS c
      FROM orders WHERE o_totalprice > 0
    ),
    digits AS (SELECT {_digit_cascade('//')} AS digit FROM cents),
    counts AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM digits GROUP BY digit
    ),
    tot AS (SELECT CAST(SUM(n_obs) AS DOUBLE) AS n FROM counts)
    SELECT c.digit, c.n_obs,
           c.n_obs / t.n AS obs_share,
           {_BENFORD_CASE.replace('digit', 'c.digit')} AS benford_share,
           (c.n_obs - t.n * ({_BENFORD_CASE.replace('digit', 'c.digit')}))
             * (c.n_obs - t.n * ({_BENFORD_CASE.replace('digit', 'c.digit')}))
             / (t.n * ({_BENFORD_CASE.replace('digit', 'c.digit')})) AS chi_term
    FROM counts c CROSS JOIN tot t
    """,
    doc="Benford's-law first-digit audit of order totals — the classic "
    "fraud/synthetic-data screen: observed first-significant-digit shares "
    "vs log10(1+1/d) expectations with per-digit chi-square terms. Digit "
    "extraction is an integer floor-division cascade over exact cents "
    "(log10 on doubles disagrees by 1 ulp at exact powers of ten between "
    "engines; integer compares cannot), and the Benford expectations are "
    "shared hard literals, so every output value is engine-exact with "
    "shares/chi terms shipped unrounded. Plan: one scan, 9-group "
    "aggregate with map-side combine, broadcast scalar total — the "
    "aggregate state is 9 counters regardless of input size.",
    tags=("quality",),
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    cents = o.select(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("c")
    )
    digits = cents.select(F.expr(_digit_cascade("div")).alias("digit"))
    counts = digits.groupBy("digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs")
    )
    tot = counts.agg(F.sum("n_obs").cast("double").alias("n"))
    bp = F.expr(_BENFORD_CASE)
    joined = counts.crossJoin(F.broadcast(tot))
    return joined.select(
        "digit",
        "n_obs",
        (F.col("n_obs") / F.col("n")).alias("obs_share"),
        bp.alias("benford_share"),
        (
            (F.col("n_obs") - F.col("n") * bp)
            * (F.col("n_obs") - F.col("n") * bp)
            / (F.col("n") * bp)
        ).alias("chi_term"),
    )


# Candidate functional dependencies for the FD audit: a mix of true keys
# (order/doc primary keys) and deliberately-violated candidates so the
# report exercises both verdicts. Each entry: (table, lhs, rhs).
_FD_CANDIDATES = [
    ("orders", "o_orderkey", "o_custkey"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("events", "user_id", "event_type"),
    ("documents", "doc_id", "lang"),
]


def _fd_oracle() -> str:
    parts = []
    for table, lhs, rhs in _FD_CANDIDATES:
        parts.append(
            f"""
    SELECT '{table}: {lhs} -> {rhs}' AS fd,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
           CAST(MAX(d) AS BIGINT) AS max_rhs_distinct,
           SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)
             AS violation_share
    FROM (SELECT {lhs}, COUNT(DISTINCT {rhs}) AS d FROM {table} GROUP BY {lhs})
    """
        )
    return " UNION ALL ".join(parts)


@register(
    "dq_functional_dependency",
    _fd_oracle(),
    doc="Functional-dependency audit: for each candidate FD A -> B, count "
    "the A-groups whose B is not single-valued (n_violating), the worst "
    "per-key distinct count, and the violation share — the check that "
    "catches denormalization drift (a 'key' silently mapping to two "
    "customers) before a downstream join fans out. The candidate list "
    "mixes true primary keys with deliberately-violated pairs so both "
    "verdicts appear. Plan: one COUNT(DISTINCT) aggregate per candidate "
    "(each an ordinary key-partitioned shuffle with partial aggregation) "
    "unioned into a six-row report; violation_share is a quotient of "
    "exact counts, shipped unrounded. At 100 TB each candidate is one "
    "exchange on its own key — independent, no global state.",
    tags=("quality",),
)
def dq_functional_dependency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    outs = []
    for table, lhs, rhs in _FD_CANDIDATES:
        per_key = (
            load_table(spark, sf_dir, table)
            .groupBy(lhs)
            .agg(F.countDistinct(rhs).alias("d"))
        )
        outs.append(
            per_key.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_keys"),
                F.sum(F.when(F.col("d") > 1, 1).otherwise(0))
                .cast("bigint")
                .alias("n_violating"),
                F.max("d").cast("bigint").alias("max_rhs_distinct"),
            ).select(
                F.lit(f"{table}: {lhs} -> {rhs}").alias("fd"),
                "n_keys",
                "n_violating",
                "max_rhs_distinct",
                (F.col("n_violating") * F.lit(1.0) / F.col("n_keys")).alias(
                    "violation_share"
                ),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), outs)


@register(
    "dq_order_total_reconciliation",
    """
    WITH li AS (
      SELECT l_orderkey,
             SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                            * 100, 0) AS BIGINT)) AS derived_c
      FROM lineitem GROUP BY l_orderkey
    ),
    recon AS (
      SELECT o.o_orderkey,
             CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) AS stated_c,
             CAST(li.derived_c AS BIGINT) AS derived_c
      FROM orders o JOIN li ON li.l_orderkey = o.o_orderkey
    ),
    bucketed AS (
      SELECT CASE
               WHEN stated_c = derived_c THEN 'exact'
               WHEN 100 * ABS(stated_c - derived_c)
                    <= 1 * GREATEST(stated_c, 1) THEN 'within_1pct'
               WHEN 100 * ABS(stated_c - derived_c)
                    <= 10 * GREATEST(stated_c, 1) THEN 'within_10pct'
               ELSE 'divergent' END AS verdict,
             stated_c, derived_c
      FROM recon
    )
    SELECT verdict,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(stated_c) AS BIGINT) AS stated_total_c,
           CAST(SUM(derived_c) AS BIGINT) AS derived_total_c
    FROM bucketed GROUP BY verdict
    """,
    doc="Cross-table financial reconciliation — the close-of-books check "
    "that a header total equals what its line items derive "
    "(sum of extendedprice*(1-disc)*(1+tax)): per-order verdicts "
    "bucketed exact / within-1% / within-10% / divergent, with stated "
    "and derived totals per bucket. Everything is integer cents: the "
    "per-line charge rounds to cents identically in both engines "
    "(identical double expression, ROUND half-away), sums are exact "
    "BIGINTs, and the tolerance buckets are integer "
    "cross-multiplications. On this synthetic fixture the header is NOT "
    "derived from the lines, so the report shows divergence — which is "
    "precisely the report's job. Plan: one orderkey-grain aggregate, "
    "one orderkey join, a 4-group verdict rollup.",
    tags=("quality", "warehouse"),
)
def dq_order_total_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                    * 100,
                    0,
                ).cast("bigint")
            ).alias("derived_c")
        )
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("stated_c"),
    )
    recon = o.join(li, o.o_orderkey == li.l_orderkey).select(
        "stated_c", F.col("derived_c").cast("bigint").alias("derived_c")
    )
    diff = F.abs(F.col("stated_c") - F.col("derived_c"))
    base = F.greatest(F.col("stated_c"), F.lit(1))
    verdict = (
        F.when(F.col("stated_c") == F.col("derived_c"), "exact")
        .when(100 * diff <= 1 * base, "within_1pct")
        .when(100 * diff <= 10 * base, "within_10pct")
        .otherwise("divergent")
    )
    return recon.select(verdict.alias("verdict"), "stated_c", "derived_c").groupBy(
        "verdict"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("stated_c").cast("bigint").alias("stated_total_c"),
        F.sum("derived_c").cast("bigint").alias("derived_total_c"),
    )


@register(
    "table_parquet_footer_audit",
    """
    SELECT regexp_extract(file_name, '[^/]+$') AS file_name,
           CAST(row_group_id AS BIGINT) AS row_group_id,
           CAST(ANY_VALUE(row_group_num_rows) AS BIGINT) AS num_rows,
           CAST(ANY_VALUE(row_group_bytes) AS BIGINT) AS total_byte_size,
           CAST(ANY_VALUE(row_group_num_columns) AS BIGINT) AS num_columns
    FROM parquet_metadata('/tmp/cda_footer_audit_orders/*.parquet')
    GROUP BY file_name, row_group_id
    """,
    doc="Parquet footer ground-truth audit: per-row-group row counts, "
    "byte sizes and column counts read straight from the file footer — "
    "the physical facts behind every scan-planning decision "
    "(maxPartitionBytes splits, row-group pruning, stats-based skipping)."
    " The engine side reads the footer via pyarrow (driver-side, bounded "
    "by file count — no data scan at all); the oracle is DuckDB's "
    "parquet_metadata() over the SAME file, so the compare pins both "
    "engines to the identical physical footer. Because oracle SQL is "
    "static, the query first copies its sf_dir's orders file to a fixed "
    "path (tmp + atomic rename; fn always runs before its oracle in the "
    "gate, so alternating scale factors stay consistent).",
    tags=("quality", "maintenance"),
)
def table_parquet_footer_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob as _glob
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, "orders.parquet")
    dst = "/tmp/cda_footer_audit_orders"
    tmp = tempfile.mkdtemp(dir="/tmp", prefix="cda_footer_tmp_")
    if os.path.isdir(src):
        members = sorted(_glob.glob(os.path.join(src, "*.parquet")))
        for m in members:
            shutil.copy(m, os.path.join(tmp, os.path.basename(m)))
    else:
        shutil.copy(src, os.path.join(tmp, "orders.parquet"))
    shutil.rmtree(dst, ignore_errors=True)
    os.rename(tmp, dst)
    rows = []
    for path in sorted(_glob.glob(os.path.join(dst, "*.parquet"))):
        md = pq.ParquetFile(path).metadata
        rows.extend(
            (
                os.path.basename(path),
                i,
                md.row_group(i).num_rows,
                md.row_group(i).total_byte_size,
                md.row_group(i).num_columns,
            )
            for i in range(md.num_row_groups)
        )
    return spark.createDataFrame(
        rows,
        "file_name string, row_group_id long, num_rows long, "
        "total_byte_size long, num_columns long",
    )
