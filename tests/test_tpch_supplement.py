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


def test_cache_key_tracks_source_content(spark, sf_dir, tmp_path):
    """Two fixture roots sharing a leaf basename, or a fixture regenerated
    in place, must map to DIFFERENT cache dirs — the round-6 advice's stale-
    supplement trap (Spark and the DuckDB oracle both reading a stale
    partsupp keeps the contract green while dropping live keys)."""
    import os
    import shutil
    import time

    from canvas_data_aws_spark.sources.tpch_supplement import partsupp_path

    base = partsupp_path(sf_dir)

    # same leaf name under a different root -> different key
    alt_root = tmp_path / "v2" / os.path.basename(os.path.normpath(sf_dir))
    alt_root.mkdir(parents=True)
    for t in ("part", "supplier"):
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = alt_root / f"{t}.parquet"
        (shutil.copytree if os.path.isdir(src) else shutil.copy)(src, str(dst))
    assert partsupp_path(str(alt_root)) != base

    # regenerate in place (mtime bump) -> different key
    probe = None
    for root, _d, files in os.walk(str(alt_root / "part.parquet")):
        for f in files:
            probe = os.path.join(root, f)
            break
        if probe:
            break
    if probe is None:  # part.parquet is a bare file
        probe = str(alt_root / "part.parquet")
    before = partsupp_path(str(alt_root))
    st = os.stat(probe)
    os.utime(probe, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000_000))
    assert partsupp_path(str(alt_root)) != before


def test_partsupp_rejects_tiny_supplier_count(spark, tmp_path):
    """Below 4 suppliers the stride wraps mod n and would emit duplicate
    (ps_partkey, ps_suppkey) primary-key rows — the generator must refuse."""
    import pytest

    from canvas_data_aws_spark.sources.tpch_supplement import ensure_partsupp

    d = tmp_path / "tiny"
    d.mkdir()
    spark.createDataFrame([(1,), (2,)], ["p_partkey"]).write.parquet(
        str(d / "part.parquet")
    )
    spark.createDataFrame([(1,), (2,), (3,)], ["s_suppkey"]).write.parquet(
        str(d / "supplier.parquet")
    )
    with pytest.raises(ValueError, match="below 4"):
        ensure_partsupp(spark, str(d))
