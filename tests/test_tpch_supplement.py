"""Supplemental partsupp generator: deterministic, spec-shaped, and the
partsupp-based TPC-H queries are oracle-checked through the standard gate
(test_queries_oracle picks them up from the registry automatically)."""

from __future__ import annotations

import pyspark.sql.functions as F

from canvas_data_aws_spark.sources.tpch_supplement import ensure_partsupp, load_partsupp


def test_partsupp_shape_and_determinism(spark, sf_dir):
    ps = load_partsupp(spark, sf_dir)
    n_part = spark.read.parquet(f"{sf_dir}/part.parquet").count()
    assert ps.count() == 4 * n_part
    # 4 DISTINCT suppliers per part (the adapted stride guarantees it at
    # tiny supplier counts where dbgen's exact formula collides)
    per_part = ps.groupBy("ps_partkey").agg(
        F.countDistinct("ps_suppkey").alias("n")
    )
    assert per_part.filter(F.col("n") != 4).count() == 0
    # value ranges per dbgen's uniforms
    row = ps.agg(
        F.min("ps_availqty"), F.max("ps_availqty"),
        F.min("ps_supplycost"), F.max("ps_supplycost"),
    ).collect()[0]
    assert row[0] >= 1 and row[1] <= 9999
    assert row[2] >= 1.0 and row[3] <= 1000.0
    # idempotent: ensure() returns the same data on a second call
    p2 = ensure_partsupp(spark, sf_dir)
    ps2 = spark.read.parquet(p2)
    assert ps2.exceptAll(ps).count() == 0 and ps.exceptAll(ps2).count() == 0


def test_partsupp_suppkeys_exist(spark, sf_dir):
    ps = load_partsupp(spark, sf_dir)
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").select("s_suppkey")
    orphans = ps.join(sup, ps.ps_suppkey == sup.s_suppkey, "left_anti")
    assert orphans.count() == 0


def test_lineitem_ext_shape(spark, sf_dir):
    from canvas_data_aws_spark.sources.tpch_supplement import (
        SHIP_MODES,
        load_lineitem_ext,
    )

    li_n = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    ext = load_lineitem_ext(spark, sf_dir)
    assert ext.count() == li_n  # full lineitem, never a fan-out
    row = ext.agg(
        F.min(F.datediff("l_receiptdate", "l_shipdate")),
        F.max(F.datediff("l_receiptdate", "l_shipdate")),
        F.countDistinct("l_shipmode"),
    ).collect()[0]
    assert 1 <= row[0] and row[1] <= 30  # receipt = ship + [1, 30] days
    assert row[2] == len(SHIP_MODES)
    # commitdate = orderdate + [30, 90] days
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderdate"
    )
    j = ext.join(o, ext.l_orderkey == o.o_orderkey).select(
        F.datediff("l_commitdate", "o_orderdate").alias("d")
    )
    row2 = j.agg(F.min("d"), F.max("d")).collect()[0]
    assert 30 <= row2[0] and row2[1] <= 90
