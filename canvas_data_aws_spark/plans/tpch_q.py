"""Classic TPC-H query shapes over the fixture star schema — the
recognizable OLAP benchmarks a warehouse migration is judged against
(adapted where the fixture lacks a TPC-H column: Q3 reports
o_orderpriority for the missing o_shippriority; Q10 trims the customer
detail columns the fixture doesn't carry).

All revenue math runs in DECIMAL (exact, order-independent) and casts to
DOUBLE only at the edge, so the value oracle is bit-stable; top-k orders
carry unique key tie-breakers. Plan shapes: dimension joins broadcast
(customer/nation/region/supplier under the 64m threshold at fixture
scale; at 100 TB customer degrades gracefully to a shuffled hash join on
c_custkey), the fact scan keeps its date/flag predicates pushed down, and
each aggregate partial-combines before its exchange.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from canvas_data_aws_spark.plans.registry import register
from canvas_data_aws_spark.sources.parquet import load_table

_REV = (
    "SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * "
    "(1 - CAST(l_discount AS DECIMAL(18,4))))"
)


def _rev_col() -> F.Column:
    return F.sum(
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (1 - F.col("l_discount").cast("decimal(18,4)"))
    )


@register(
    "tpch_q3",
    f"""
    SELECT l_orderkey,
           CAST({_REV} AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 (shipping priority): unshipped high-value orders for one "
    "market segment. Segment filter broadcast-semi-joins customers into "
    "orders, both date predicates push to the scans, revenue aggregates "
    "per order with map-side combine, top-10 fuses to TakeOrdered.",
    tags=("tpch", "star"),
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-03-15"
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-03-15"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_rev_col().cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q5",
    f"""
    SELECT n_name, CAST({_REV} AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 (local supplier volume): revenue by nation where the "
    "customer and supplier share the nation, one region, one year. The "
    "snowflake chain region->nation->supplier all broadcasts; the "
    "customer-nation co-membership predicate rides the supplier join as "
    "an equi-condition, so no plan edge is non-equi; the one real "
    "shuffle is lineitem x orders on the order key.",
    tags=("tpch", "star"),
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select(
        "r_regionkey"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(_rev_col().cast("double").alias("revenue"))
    )


@register(
    "tpch_q10",
    f"""
    SELECT c_custkey, c_name,
           CAST({_REV} AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-10-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 (returned items): customers who returned the most "
    "revenue in one quarter. Quarter + returnflag predicates push to the "
    "fact scans, nation broadcasts, the per-customer agg partial-combines, "
    "top-20 fuses to TakeOrdered with c_custkey as the unique tie-break.",
    tags=("tpch", "star"),
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-10-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_rev_col().cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q6",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 (forecasting revenue change): the canonical scan-bound "
    "query — every predicate pushes to the parquet reader (row groups "
    "outside the year or discount band never decompress), the projection "
    "prunes to three columns, and the whole plan is one scan + one "
    "global DECIMAL sum with map-side partials. The query that measures "
    "raw scan throughput: at 100 TB it IS the I/O path.",
    tags=("tpch", "star"),
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,4)")
                * F.col("l_discount").cast("decimal(18,4)")
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "tpch_q18",
    """
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 250
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 (large-volume customers): orders whose total quantity "
    "clears a threshold, with customer detail. The HAVING subquery plans "
    "as aggregate -> LEFT SEMI join into orders: the filter collapses "
    "lineitem to one row per qualifying order BEFORE the main join, so "
    "the expensive three-way join runs on the small qualifying set. "
    "TakeOrdered top-100 with o_orderkey tie-break.",
    tags=("tpch", "star"),
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "tpch_q14",
    f"""
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))
                     ELSE 0 END) AS DOUBLE)
                 / CAST({_REV} AS DOUBLE), 4) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'
    GROUP BY ALL
    """,
    doc="TPC-H Q14 (promotion effect): share of one month's revenue from "
    "promo parts — the conditional-aggregate ratio shape. The month "
    "filter pushes to the lineitem scan, part broadcasts, and BOTH sums "
    "ride one aggregate pass (a CASE inside SUM, not two joins). DECIMAL "
    "internals, one ROUND at the edge.",
    tags=("tpch", "star"),
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    ).select("l_partkey", "l_extendedprice", "l_discount")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        1 - F.col("l_discount").cast("decimal(18,4)")
    )
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0 * F.sum(promo).cast("double") / F.sum(rev).cast("double"), 4
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "tpch_q7",
    f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
           CAST({_REV.replace("l_extendedprice", "l.l_extendedprice").replace("l_discount", "l.l_discount")} AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_8' AND cn.n_name = 'NATION_13')
        OR (sn.n_name = 'NATION_13' AND cn.n_name = 'NATION_8'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 (volume shipping; nation pair adapted to the fixture's "
    "NATION_8/NATION_13 — the spec's FRANCE/GERMANY matched nothing and "
    "returned an empty, vacuously-green result): bilateral trade revenue between two "
    "nations by ship year. The nation dimension joins TWICE under "
    "different roles (supplier side, customer side) — both broadcast; the "
    "nation-pair disjunction runs as a residual after the joins; the "
    "two-year ship window pushes to the lineitem scan. One real shuffle: "
    "lineitem x orders.",
    tags=("tpch", "star"),
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_13")
    ) | ((F.col("supp_nation") == "NATION_13") & (F.col("cust_nation") == "NATION_8"))
    return (
        s.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .join(cn, F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(_rev_col().cast("double").alias("revenue"))
    )


@register(
    "tpch_q17",
    """
    WITH avgq AS (
      SELECT l_partkey, 0.2 * AVG(l_quantity) AS qlim
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN avgq a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < a.qlim
    """,
    doc="TPC-H Q17 (small-quantity-order revenue): lineitems under 20% of "
    "their part's average quantity, for one brand. The correlated "
    "per-part average becomes an aggregate + self-join on l_partkey — "
    "the expensive side is the per-part average over ALL lineitem (the "
    "subquery is uncorrelated with the brand filter in TPC-H semantics), "
    "partial-combined to one row per part before its exchange; the brand "
    "filter broadcast-semi-joins part into the probe. DECIMAL sum, one "
    "division at the edge (exact-over-7 quotients can land on rounding "
    "halves, so the output ships unrounded per the half-boundary rule).",
    tags=("tpch", "star"),
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select(
        "p_partkey"
    )
    avgq = li.groupBy("l_partkey").agg((0.2 * F.avg("l_quantity")).alias("qlim"))
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(avgq, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qlim"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double")
                / 7.0
            ).alias("avg_yearly")
        )
    )


@register(
    "tpch_q4",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 (order priority checking, adapted: 'late' = any lineitem "
    "shipped >60 days after the order date, standing in for the fixture's "
    "missing commit/receipt dates): the EXISTS plans as a LEFT SEMI join "
    "— each order contributes at most once no matter how many late lines "
    "it has, with no distinct pass. Quarter filter pushes to the orders "
    "scan; the semi-join's build side is lineitem keys only.",
    tags=("tpch", "star"),
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "tpch_q13",
    """
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    SELECT CAST(c_count AS INT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY c_count
    """,
    doc="TPC-H Q13 (customer distribution): how many customers placed N "
    "orders, including N=0 — the LEFT JOIN + COUNT(col) null-skipping "
    "semantics the inner-join formulation silently loses. Two aggregates: "
    "per-customer count (one c_custkey exchange), then the distribution "
    "over counts (a few dozen distinct values, map-side combined to "
    "almost nothing).",
    tags=("tpch", "star"),
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy(F.col("c_count").cast("int").alias("c_count")).agg(
        F.count("*").alias("custdist")
    )


@register(
    "tpch_q15",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {_REV} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15 (top supplier): quarter revenue per supplier, keep the "
    "maximum — the classic view + scalar-subquery-on-the-view shape. The "
    "revenue aggregate computes ONCE per branch in DECIMAL (exact, so the "
    "max-equality predicate is safe — a double formulation makes "
    "'= MAX(...)' flaky); the scalar max rides a one-row broadcast and "
    "the supplier dim broadcasts onto the handful of max rows.",
    tags=("tpch", "star"),
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _rev_col().alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.crossJoin(F.broadcast(mx))  # single-row scalar: safe broadcast
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


@register(
    "tpch_q22",
    """
    WITH avgbal AS (
      SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT ab FROM avgbal)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_mktsegment
    """,
    doc="TPC-H Q22 (global sales opportunity, adapted: grouped by market "
    "segment for the fixture's missing phone country codes): rich "
    "customers who never ordered. The scalar average rides a one-row "
    "broadcast; the NOT EXISTS plans as a LEFT ANTI join against order "
    "customer keys — the never-ordered set survives exactly, no distinct "
    "needed. DECIMAL balance sums.",
    tags=("tpch", "star"),
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    avgbal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        c.crossJoin(F.broadcast(avgbal))  # single-row scalar: safe broadcast
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_mktsegment").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


@register(
    "tpch_q8",
    """
    WITH vol AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,4))
               * (1 - CAST(l.l_discount AS DECIMAL(18,4))) AS volume,
             sn.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = cn.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'STANDARD'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_8' THEN volume ELSE 0 END)
                AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM vol GROUP BY o_year
    """,
    doc="TPC-H Q8 (national market share; nation adapted to the fixture's "
    "NATION_8 — the spec's GERMANY matched nothing, making the share "
    "vacuously zero): one nation's share of a "
    "region's STANDARD-part purchase volume by year. Seven-table "
    "snowflake where every dimension broadcasts and nation again plays "
    "two roles; the share is a conditional-sum ratio inside ONE aggregate "
    "pass over DECIMAL volumes (the quotient ships unrounded per the "
    "half-boundary rule).",
    tags=("tpch", "star"),
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD").select(
        "p_partkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE").select(
        "r_regionkey"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    volume = F.col("l_extendedprice").cast("decimal(18,4)") * (
        1 - F.col("l_discount").cast("decimal(18,4)")
    )
    share_nation = F.when(F.col("supp_nation") == "NATION_8", volume).otherwise(F.lit(0))
    return (
        p.join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(cn, F.col("cn_key") == F.col("c_nationkey"))
        .join(r, F.col("r_regionkey") == F.col("cn_region"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(sn, F.col("sn_key") == F.col("s_nationkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (F.sum(share_nation).cast("double") / F.sum(volume).cast("double")).alias(
                "mkt_share"
            )
        )
    )


@register(
    "tpch_q19",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1'  AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#7'  AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 (discounted revenue, adapted: container predicates "
    "dropped for the fixture's missing p_container): an OR of brand/size/"
    "quantity conjunctions as the join residual — the disjunction can't "
    "push into either scan whole, but each disjunct's common part-key "
    "equi-join still plans as one hash join with the residual evaluated "
    "post-match (never a cartesian). Exercises Catalyst's handling of "
    "multi-branch residuals at OLTP-ish selectivity.",
    tags=("tpch", "star"),
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    branch = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    cond = branch("Brand#1", 15, 1, 11) | branch("Brand#7", 25, 10, 20) | branch(
        "Brand#13", 35, 20, 30
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,4)")
                * (1 - F.col("l_discount").cast("decimal(18,4)"))
            )
            .cast("double")
            .alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# partsupp-based queries (Q2/Q9/Q11/Q16/Q20) — local_only: the external
# driver's fixture set has no partsupp, so these run against the generated
# supplement (sources/tpch_supplement.py) and are verified by the local
# oracle gate, which registers the same parquet as a DuckDB view.
# Adaptations for missing fixture columns are noted per query.
# --------------------------------------------------------------------------

from canvas_data_aws_spark.plans.relational import (  # noqa: E402
    FLAGSHIP_ORACLE,
    flagship_pricing_summary,
)
from canvas_data_aws_spark.sources.tpch_supplement import load_partsupp  # noqa: E402

register(
    "tpch_q1",
    FLAGSHIP_ORACLE,
    doc="TPC-H Q1 (pricing summary) — alias of flagship_pricing_summary "
    "(plans/relational.py) so the discoverable tpch_* set is complete; "
    "same plan, same oracle.",
    tags=("tpch", "agg"),
)(flagship_pricing_summary)


@register(
    "tpch_q2",
    """
    WITH eligible AS (
      SELECT ps.ps_partkey, ps.ps_supplycost, s.s_acctbal, s.s_name, n.n_name
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    mn AS (
      SELECT ps_partkey, MIN(ps_supplycost) AS min_cost
      FROM eligible GROUP BY ps_partkey
    )
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_type,
           e.ps_supplycost
    FROM part p
    JOIN eligible e ON e.ps_partkey = p.p_partkey
    JOIN mn ON mn.ps_partkey = p.p_partkey AND e.ps_supplycost = mn.min_cost
    WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'LARGE'
    ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 (minimum-cost supplier; adapted: fixture part/supplier "
    "lack p_mfgr/s_address/s_phone/s_comment, size is a range for "
    "fixture selectivity): for each qualifying part, the EUROPE supplier "
    "at the minimum ps_supplycost. The correlated MIN subquery becomes a "
    "per-part MIN aggregate joined back on (partkey, cost) — both sides "
    "share the partkey partitioning; region/nation broadcast; top-100 "
    "with a total-order tie-break fuses to TakeOrdered.",
    tags=("tpch", "star"),
    local_only=True,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = load_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE")
    ).select("p_partkey", "p_type")
    eligible = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("ps_partkey", "ps_supplycost", "s_acctbal", "s_name", "n_name")
    )
    mn = (
        eligible.groupBy("ps_partkey")
        .agg(F.min("ps_supplycost").alias("min_cost"))
        .select(F.col("ps_partkey").alias("mn_partkey"), "min_cost")
    )
    return (
        p.join(eligible, p.p_partkey == eligible.ps_partkey)
        .join(
            mn,
            (F.col("mn_partkey") == p.p_partkey)
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "ps_supplycost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q9",
    """
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           CAST(ROUND(SUM(
             CAST(l.l_extendedprice AS DECIMAL(18,4))
               * (1 - CAST(l.l_discount AS DECIMAL(18,4)))
             - CAST(ps.ps_supplycost AS DECIMAL(18,4))
               * CAST(l.l_quantity AS DECIMAL(18,4))
           ), 2) AS DOUBLE) AS sum_profit
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN partsupp ps ON ps.ps_suppkey = l.l_suppkey
                    AND ps.ps_partkey = l.l_partkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 (product-type profit): nation/year profit where profit = "
    "revenue minus supply cost, over the five-way fact chain "
    "part-lineitem-partsupp-supplier-orders. The name filter semi-reduces "
    "the part side before the fact join; partsupp joins on the composite "
    "(partkey, suppkey) fact key — co-partitioned with the lineitem "
    "shuffle; nation broadcasts. All money math in DECIMAL; the 2dp ROUND runs "
    "ON THE DECIMAL sum (exact, identical half-handling in both engines) "
    "before the one cast to double — rounding after the double cast can "
    "land on a binary half and flip the last cent between engines.",
    tags=("tpch", "star"),
    local_only=True,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select(
        "p_partkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    ps = load_partsupp(spark, sf_dir).select("ps_partkey", "ps_suppkey", "ps_supplycost")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = F.col("l_extendedprice").cast("decimal(18,4)") * (
        1 - F.col("l_discount").cast("decimal(18,4)")
    ) - F.col("ps_supplycost").cast("decimal(18,4)") * F.col("l_quantity").cast(
        "decimal(18,4)"
    )
    return (
        p.join(li, p.p_partkey == li.l_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(ps, (ps.ps_suppkey == li.l_suppkey) & (ps.ps_partkey == li.l_partkey))
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
    )


@register(
    "tpch_q11",
    """
    WITH g AS (
      SELECT ps.ps_partkey,
             SUM(CAST(ps.ps_supplycost AS DECIMAL(18,4)) * ps.ps_availqty)
               AS value_
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_8'
      GROUP BY ps.ps_partkey
    ),
    tot AS (SELECT SUM(value_) AS t FROM g)
    SELECT g.ps_partkey, CAST(g.value_ AS DOUBLE) AS part_value
    FROM g, tot
    WHERE g.value_ > 0.001 * tot.t
    """,
    doc="TPC-H Q11 (important stock, adapted: nation renamed to the "
    "fixture's NATION_8 — a nation with suppliers at every fixture scale — "
    "fraction 0.001 for fixture cardinality): parts "
    "whose stock value in one nation exceeds a fraction of that nation's "
    "total. The HAVING-subquery total is a one-row aggregate broadcast "
    "back over the per-part rollup — the same scalar-row pattern as the "
    "pareto cutpoints; value math in DECIMAL.",
    tags=("tpch", "star"),
    local_only=True,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = load_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_8").select(
        "n_nationkey"
    )
    g = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("ps_partkey")
        .agg(
            F.sum(
                F.col("ps_supplycost").cast("decimal(18,4)") * F.col("ps_availqty")
            ).alias("value_")
        )
    )
    tot = g.agg(F.sum("value_").alias("t"))
    return (
        g.crossJoin(F.broadcast(tot))  # single-row scalar: safe broadcast
        .filter(F.col("value_") > 0.001 * F.col("t"))
        .select("ps_partkey", F.col("value_").cast("double").alias("part_value"))
    )


@register(
    "tpch_q16",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp ps JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type NOT LIKE 'MEDIUM%'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 23)
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q16 (parts/supplier relationship; adapted: the "
    "complaint-supplier exclusion is dropped — fixture supplier carries "
    "no s_comment): distinct supplier count per (brand, type, size) for "
    "non-excluded parts. All three predicates push to the part scan; the "
    "COUNT DISTINCT plans as the standard two-phase expand-and-count over "
    "the (brand,type,size) shuffle.",
    tags=("tpch", "star"),
    local_only=True,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = load_partsupp(spark, sf_dir).select("ps_partkey", "ps_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & ~F.col("p_type").like("MEDIUM%")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 23)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        ps.join(p, ps.ps_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").cast("bigint").alias("supplier_cnt"))
    )


@register(
    "tpch_q20",
    """
    WITH qty AS (
      SELECT l_partkey, l_suppkey, 0.5 * SUM(l_quantity) AS half_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_partkey, l_suppkey
    ),
    excess AS (
      SELECT DISTINCT ps.ps_suppkey
      FROM partsupp ps
      JOIN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%') pp
        ON pp.p_partkey = ps.ps_partkey
      JOIN qty ON qty.l_partkey = ps.ps_partkey
              AND qty.l_suppkey = ps.ps_suppkey
      WHERE ps.ps_availqty > qty.half_qty
    )
    SELECT s.s_name, s.s_suppkey
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN excess e ON e.ps_suppkey = s.s_suppkey
    WHERE n.n_name = 'NATION_3'
    """,
    doc="TPC-H Q20 (potential part promotion; adapted: nation renamed to "
    "the fixture's NATION_3, ship year 1997): suppliers in one nation "
    "holding more than half a year's shipped quantity of 'small%' parts. "
    "The year's shipments pre-aggregate per (part, supplier) BEFORE "
    "joining partsupp on the same composite key — one co-partitioned "
    "exchange family; the supplier filter is a semi-join (DISTINCT "
    "suppkey), nation broadcasts. Quantity sums are integral doubles, "
    "exact and order-independent.",
    tags=("tpch", "star"),
    local_only=True,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    qty = li.groupBy("l_partkey", "l_suppkey").agg(
        (0.5 * F.sum("l_quantity")).alias("half_qty")
    )
    pp = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select(
        "p_partkey"
    )
    ps = load_partsupp(spark, sf_dir)
    excess = (
        ps.join(pp, pp.p_partkey == ps.ps_partkey)
        .join(qty, (qty.l_partkey == ps.ps_partkey) & (qty.l_suppkey == ps.ps_suppkey))
        .filter(F.col("ps_availqty") > F.col("half_qty"))
        .select("ps_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3").select(
        "n_nationkey"
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(excess, excess.ps_suppkey == s.s_suppkey, "left_semi")
        .select("s_name", "s_suppkey")
    )


from canvas_data_aws_spark.sources.tpch_supplement import load_lineitem_ext  # noqa: E402


@register(
    "tpch_q12",
    """
    SELECT l.l_shipmode,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem_ext l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipmode IN ('MAIL', 'SHIP')
      AND l.l_commitdate < l.l_receiptdate
      AND l.l_shipdate   < l.l_commitdate
      AND l.l_receiptdate >= TIMESTAMP '1997-01-01'
      AND l.l_receiptdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_shipmode
    """,
    doc="TPC-H Q12 (shipping modes and order priority): late-ship lines by "
    "mode, split into high/low-priority counts. Runs on the generated "
    "lineitem_ext supplement (the driver fixture lacks l_shipmode/"
    "l_commitdate/l_receiptdate — sources/tpch_supplement.py derives them "
    "row-locally, so this registers local_only). The mode IN-list and all "
    "three date predicates push to the extension scan; one orderkey join; "
    "both CASE counts share a single aggregate pass over a 2-row group "
    "domain.",
    tags=("tpch", "star"),
    local_only=True,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_lineitem_ext(spark, sf_dir).filter(
        F.col("l_shipmode").isin("MAIL", "SHIP")
        & (F.col("l_commitdate") < F.col("l_receiptdate"))
        & (F.col("l_shipdate") < F.col("l_commitdate"))
        & (F.col("l_receiptdate") >= "1997-01-01")
        & (F.col("l_receiptdate") < "1998-01-01")
    ).select("l_orderkey", "l_shipmode")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_shipmode")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "tpch_q21",
    """
    WITH late AS (
      SELECT l_orderkey, l_suppkey
      FROM lineitem_ext WHERE l_receiptdate > l_commitdate
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN late l1  ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE n.n_name = 'NATION_8'
      AND o.o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem_ext l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
    doc="TPC-H Q21 (suppliers who kept orders waiting; nation adapted to "
    "the fixture's NATION_8): for finished orders, suppliers whose line "
    "was the ONLY late one among a multi-supplier order. Runs on the "
    "generated lineitem_ext supplement (local_only — the driver fixture "
    "lacks the commit/receipt dates). The correlated EXISTS becomes a "
    "LEFT SEMI and the NOT EXISTS a LEFT ANTI, both equi-joined on "
    "l_orderkey with the suppkey<>suppkey residual evaluated post-match "
    "(never a cartesian) — all three lineitem-sized joins share the "
    "orderkey exchange family; nation broadcasts; top-100 fuses to "
    "TakeOrdered with s_name as tie-break.",
    tags=("tpch", "star"),
    local_only=True,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    ext = load_lineitem_ext(spark, sf_dir)
    late = ext.filter(F.col("l_receiptdate") > F.col("l_commitdate")).select(
        "l_orderkey", "l_suppkey"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_8").select(
        "n_nationkey"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    l1 = late.alias("l1")
    l2 = ext.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = late.alias("l3")
    waiting = (
        l1.join(
            l2,
            (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
            "left_anti",
        )
        .join(o, F.col("l1.l_orderkey") == o.o_orderkey)
    )
    return (
        waiting.join(s, F.col("l1.l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
