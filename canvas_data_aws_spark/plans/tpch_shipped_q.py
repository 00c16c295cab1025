"""Driver-facing TPC-H shapes for the seven queries that normally need
``partsupp`` / ``lineitem_ext`` — re-derived ENTIRELY from shipped fixture
columns, so the external driver's DuckDB oracle can value-check them
(round-6 verdict asked for exactly this: the ``local_only`` originals in
``tpch_q.py`` keep full-spec fidelity on generated supplements; these
variants prove the same plan shapes on driver-visible data).

The part-supplier bridge the fixtures lack is OBSERVED from the fact
table: the distinct (l_partkey, l_suppkey) pairs of lineitem, carrying

- ``psx_supplycost`` = MIN(l_extendedprice) over the pair — the cheapest
  observed line price, a DECIMAL-exact element pick (never a quotient:
  double division lands on rounding halves where engines disagree), and
- ``psx_shipqty``   = SUM(l_quantity) — integral doubles, exact.

Lateness (Q12/Q21) is re-based on shipped dates: a line is late when it
ships more than N days after its order date — semantically the spirit of
receipt-past-commit, derivable without the generated commit/receipt
columns. Every plan keeps the original query's shape: the same join
topology, the same broadcast/semi/anti structure, the same aggregate and
top-k fusion — so a pass here is driver-checked evidence for the shape
the local_only original exercises at full spec fidelity.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from canvas_data_aws_spark.plans.registry import register
from canvas_data_aws_spark.sources.parquet import load_table

# the observed part-supplier bridge, shared by the five partsupp shapes
_BRIDGE_SQL = """
      SELECT l_partkey AS psx_partkey, l_suppkey AS psx_suppkey,
             MIN(CAST(l_extendedprice AS DECIMAL(18,4))) AS psx_supplycost,
             SUM(l_quantity) AS psx_shipqty
      FROM lineitem GROUP BY 1, 2
"""


def _bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("psx_partkey"),
            F.col("l_suppkey").alias("psx_suppkey"),
        )
        .agg(
            F.min(F.col("l_extendedprice").cast("decimal(18,4)")).alias(
                "psx_supplycost"
            ),
            F.sum("l_quantity").alias("psx_shipqty"),
        )
    )


@register(
    "tpch_q2_shipped",
    f"""
    WITH psx AS ({_BRIDGE_SQL}),
    eligible AS (
      SELECT psx.psx_partkey, psx.psx_supplycost, s.s_acctbal, s.s_name, n.n_name
      FROM psx
      JOIN supplier s ON s.s_suppkey = psx.psx_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    mn AS (
      SELECT psx_partkey, MIN(psx_supplycost) AS min_cost
      FROM eligible GROUP BY psx_partkey
    )
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_type,
           CAST(e.psx_supplycost AS DOUBLE) AS supplycost
    FROM part p
    JOIN eligible e ON e.psx_partkey = p.p_partkey
    JOIN mn ON mn.psx_partkey = p.p_partkey AND e.psx_supplycost = mn.min_cost
    WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'LARGE'
    ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape on shipped columns (driver-facing counterpart of "
    "the local_only tpch_q2): minimum-cost EUROPE supplier per qualifying "
    "part, with supply cost OBSERVED as the pair's cheapest shipped line "
    "price. Identical plan shape: per-part MIN aggregate joined back on "
    "(partkey, cost) over the shared partkey partitioning, region/nation "
    "broadcast, top-100 total-order TakeOrdered. The cost is a DECIMAL "
    "element pick, so the equality join-back is engine-exact.",
    tags=("tpch", "star"),
)
def tpch_q2_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    psx = _bridge(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE"))
        .select("p_partkey", "p_type")
    )
    eligible = (
        psx.join(s, psx.psx_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("psx_partkey", "psx_supplycost", "s_acctbal", "s_name", "n_name")
        # eligible feeds BOTH the per-part MIN and the final join-back; the
        # bridge inside it is a full lineitem aggregate, so unmaterialized
        # the fact table is aggregated twice per query. The table is
        # (part,supplier)-grain and narrow: checkpoint it once (§10/§12
        # pattern) — join topology unchanged, lineitem passes 2 -> 1.
        .localCheckpoint(eager=True)
    )
    mn = (
        eligible.groupBy("psx_partkey")
        .agg(F.min("psx_supplycost").alias("min_cost"))
        .select(F.col("psx_partkey").alias("mn_partkey"), "min_cost")
    )
    return (
        p.join(eligible, p.p_partkey == eligible.psx_partkey)
        .join(
            mn,
            (F.col("mn_partkey") == p.p_partkey)
            & (F.col("psx_supplycost") == F.col("min_cost")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.col("psx_supplycost").cast("double").alias("supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q9_shipped",
    f"""
    WITH psx AS ({_BRIDGE_SQL})
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           CAST(ROUND(SUM(
             CAST(l.l_extendedprice AS DECIMAL(18,4))
               * (1 - CAST(l.l_discount AS DECIMAL(18,4)))
             - psx.psx_supplycost
           ), 2) AS DOUBLE) AS sum_profit
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN psx ON psx.psx_suppkey = l.l_suppkey
            AND psx.psx_partkey = l.l_partkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 shape on shipped columns (driver-facing counterpart of "
    "the local_only tpch_q9): nation/year profit over the five-way "
    "part-lineitem-bridge-supplier-orders chain, with each line's cost "
    "modeled as the pair's cheapest observed line price (DECIMAL element "
    "pick — no quotient crosses an engine boundary). Same plan: name "
    "filter semi-reduces part, bridge joins on the composite fact key "
    "co-partitioned with lineitem, nation broadcasts, decimal ROUND "
    "before the edge cast.",
    tags=("tpch", "star"),
)
def tpch_q9_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    psx = _bridge(spark, sf_dir).select("psx_partkey", "psx_suppkey", "psx_supplycost")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = F.col("l_extendedprice").cast("decimal(18,4)") * (
        1 - F.col("l_discount").cast("decimal(18,4)")
    ) - F.col("psx_supplycost")
    return (
        p.join(li, p.p_partkey == li.l_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(
            psx,
            (psx.psx_suppkey == li.l_suppkey) & (psx.psx_partkey == li.l_partkey),
        )
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
    )


@register(
    "tpch_q11_shipped",
    f"""
    WITH psx AS ({_BRIDGE_SQL}),
    g AS (
      SELECT psx.psx_partkey,
             SUM(psx.psx_supplycost * CAST(psx.psx_shipqty AS DECIMAL(18,4)))
               AS value_
      FROM psx
      JOIN supplier s ON s.s_suppkey = psx.psx_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_8'
      GROUP BY psx.psx_partkey
    ),
    tot AS (SELECT SUM(value_) AS t FROM g)
    SELECT g.psx_partkey AS ps_partkey, CAST(g.value_ AS DOUBLE) AS part_value
    FROM g, tot
    WHERE g.value_ > 0.001 * tot.t
    """,
    doc="TPC-H Q11 shape on shipped columns (driver-facing counterpart of "
    "the local_only tpch_q11): per-part shipped-stock value (observed "
    "cost x shipped quantity, all DECIMAL — quantities are integral) for "
    "one nation, thresholded at a fraction of the nation total via the "
    "one-row-aggregate broadcast scalar pattern.",
    tags=("tpch", "star"),
)
def tpch_q11_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    psx = _bridge(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_8")
        .select("n_nationkey")
    )
    g = (
        psx.join(s, psx.psx_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("psx_partkey")
        .agg(
            F.sum(
                F.col("psx_supplycost") * F.col("psx_shipqty").cast("decimal(18,4)")
            ).alias("value_")
        )
        # g feeds BOTH the global total and the share filter; the bridge
        # inside it is a full lineitem aggregate, so unmaterialized the
        # fact table is aggregated twice per query. Part-grain and two
        # columns wide: checkpoint it once — lineitem passes 2 -> 1.
        .localCheckpoint(eager=True)
    )
    tot = g.agg(F.sum("value_").alias("t"))
    return (
        g.crossJoin(F.broadcast(tot))  # single-row scalar: safe broadcast
        .filter(F.col("value_") > 0.001 * F.col("t"))
        .select(
            F.col("psx_partkey").alias("ps_partkey"),
            F.col("value_").cast("double").alias("part_value"),
        )
    )


@register(
    "tpch_q16_shipped",
    f"""
    WITH psx AS ({_BRIDGE_SQL})
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT psx.psx_suppkey) AS BIGINT) AS supplier_cnt
    FROM psx JOIN part p ON p.p_partkey = psx.psx_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type NOT LIKE 'MEDIUM%'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 23)
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q16 shape on shipped columns (driver-facing counterpart of "
    "the local_only tpch_q16): distinct OBSERVED suppliers per (brand, "
    "type, size) over the lineitem-derived bridge; the three predicates "
    "push to the part scan and the COUNT DISTINCT runs the standard "
    "two-phase expand over the group shuffle.",
    tags=("tpch", "star"),
)
def tpch_q16_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    psx = _bridge(spark, sf_dir).select("psx_partkey", "psx_suppkey")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#5")
            & ~F.col("p_type").like("MEDIUM%")
            & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 23)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        psx.join(p, psx.psx_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("psx_suppkey").cast("bigint").alias("supplier_cnt"))
    )


@register(
    "tpch_q20_shipped",
    """
    WITH qty97 AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS q97
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY 1, 2
    ),
    qall AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qa
      FROM lineitem GROUP BY 1, 2
    ),
    excess AS (
      SELECT DISTINCT q.l_suppkey
      FROM qty97 q
      JOIN qall a ON a.l_partkey = q.l_partkey AND a.l_suppkey = q.l_suppkey
      JOIN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%') pp
        ON pp.p_partkey = q.l_partkey
      WHERE q.q97 > 0.5 * a.qa
    )
    SELECT s.s_name, s.s_suppkey
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN excess e ON e.l_suppkey = s.s_suppkey
    WHERE n.n_name = 'NATION_3'
    """,
    doc="TPC-H Q20 shape on shipped columns (driver-facing counterpart of "
    "the local_only tpch_q20): NATION_3 suppliers who shipped the "
    "majority (>half) of their all-time quantity of a 'small%' part "
    "during 1997 — availqty-vs-half-shipments re-based on two aggregates "
    "of the same fact key. Same plan: both rollups share the (part, "
    "supplier) exchange family, the part-name filter semi-reduces, the "
    "supplier gate is a DISTINCT semi-join, nation broadcasts. Quantity "
    "sums are integral doubles (0.5x is exact binary), engine-exact.",
    tags=("tpch", "star"),
)
def tpch_q20_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    # ONE aggregate yields both the 1997 quantity and the all-time quantity
    # per (part, supplier): the conditional sum is NULL for pairs with no
    # 1997 line, so the q97 > 0.5*qa filter drops exactly the pairs the old
    # qty97-inner-join-qall shape dropped — same rows, one lineitem pass
    # and one (part,supp) exchange instead of two of each plus a join.
    # l_quantity is integral doubles, so the sums are order-exact.
    both = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(
            F.when(
                (F.col("l_shipdate") >= "1997-01-01")
                & (F.col("l_shipdate") < "1998-01-01"),
                F.col("l_quantity"),
            )
        ).alias("q97"),
        F.sum("l_quantity").alias("qa"),
    )
    pp = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    excess = (
        both.join(pp, pp.p_partkey == F.col("l_partkey"))
        .filter(F.col("q97") > 0.5 * F.col("qa"))
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_3")
        .select("n_nationkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(excess, excess.l_suppkey == s.s_suppkey, "left_semi")
        .select("s_name", "s_suppkey")
    )


@register(
    "tpch_q12_shipped",
    """
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag IN ('A', 'R')
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag
    """,
    doc="TPC-H Q12 shape on shipped columns (driver-facing counterpart of "
    "the local_only tpch_q12): 1997 LATE lines (shipped >60 days after "
    "the order date — the shipped-column lateness analog of "
    "receipt-past-commit) for two return-flag classes, split into "
    "high/low order-priority counts. Same plan: the flag IN-list and the "
    "ship-year window push to the fact scan, one orderkey join (the "
    "date-lateness residual evaluates post-match), both CASE counts in a "
    "single aggregate pass over a 2-row group domain.",
    tags=("tpch", "star"),
)
def tpch_q12_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_returnflag").isin("A", "R")
            & (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .select("l_orderkey", "l_returnflag", "l_shipdate")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey)
            & (l.l_shipdate > F.date_add(F.col("o_orderdate"), 60)),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "tpch_q21_shipped",
    """
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN late l1  ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE n.n_name = 'NATION_8'
      AND o.o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
    doc="TPC-H Q21 shape on shipped columns (driver-facing counterpart of "
    "the local_only tpch_q21): suppliers in NATION_8 whose line was the "
    "ONLY late one (shipped >90 days after order date) in a finished "
    "multi-supplier order. Same plan: the correlated EXISTS/NOT EXISTS "
    "become LEFT SEMI / LEFT ANTI equi-joined on l_orderkey with the "
    "suppkey<>suppkey residual post-match (no cartesian anywhere), all "
    "lineitem-sized joins share the orderkey exchange family, nation "
    "broadcasts, top-100 TakeOrdered with s_name tie-break.",
    tags=("tpch", "star"),
)
def tpch_q21_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90))
        .select("l_orderkey", "l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_8")
        .select("n_nationkey")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    l1 = late.alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
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
