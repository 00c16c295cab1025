"""Scale-hardening operators: salted joins preserve join semantics under a
hot key; compaction preserves data and produces pruned, sized layouts."""

from __future__ import annotations

import gzip
import os

import pyspark.sql.functions as F

from canvas_data_aws_spark.ingest.compaction import compact_raw_tsv, compact_table
from canvas_data_aws_spark.operators.skew import salted_join
from canvas_data_aws_spark.sources.parquet import load_table
from canvas_data_aws_spark.sources.schema import table_struct


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_quantity")
    # fabricate a hot key: map 30% of rows onto supplier 1
    hot = li.withColumn(
        "l_suppkey", F.when(F.col("l_orderkey") % 3 == 0, F.lit(1)).otherwise(F.col("l_suppkey"))
    )
    sup = load_table(spark, sf_dir, "supplier").withColumnRenamed("s_suppkey", "l_suppkey")

    plain = hot.join(sup, ["l_suppkey"]).groupBy("l_suppkey").count()
    salted = salted_join(hot, sup, ["l_suppkey"], num_salts=8).groupBy("l_suppkey").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey").limit(1000)
    missing = li.withColumn("l_suppkey", F.col("l_suppkey") + 10_000)  # no matches
    sup = load_table(spark, sf_dir, "supplier").withColumnRenamed("s_suppkey", "l_suppkey")
    out = salted_join(missing, sup, ["l_suppkey"], num_salts=4, how="left")
    assert out.count() == 1000
    assert out.filter(F.col("s_name").isNotNull()).count() == 0


def test_compact_table_partitioned_layout(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "curated_orders")
    compact_table(orders, out, partition_by=["o_orderstatus"], target_rows_per_file=5000)

    dirs = {d for d in os.listdir(out) if d.startswith("o_orderstatus=")}
    statuses = {r[0] for r in orders.select("o_orderstatus").distinct().collect()}
    assert dirs == {f"o_orderstatus={s}" for s in statuses}

    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    # partition pruning: a status predicate must read only one directory
    from canvas_data_aws_spark.plans.audit import explain_str

    plan = explain_str(back.filter(F.col("o_orderstatus") == "F"))
    assert "PartitionFilters" in plan and "o_orderstatus" in plan


def test_compact_raw_tsv_round_trip(spark, tmp_path):
    table = {
        "tableName": "t",
        "columns": [
            {"name": "id", "type": "bigint"},
            {"name": "v", "type": "double precision"},
        ],
    }
    raw_dir = str(tmp_path / "raw" / "t")
    os.makedirs(raw_dir)
    with gzip.open(os.path.join(raw_dir, "t-0.tsv.gz"), "wt") as f:
        f.write("1\t1.5\n2\t\\N\n3\t2.25\n")

    out = str(tmp_path / "curated" / "t")
    curated = compact_raw_tsv(spark, raw_dir, table_struct(table), out)
    rows = sorted(map(tuple, curated.collect()))
    assert rows == [(1, 1.5), (2, None), (3, 2.25)]
    assert any(f.endswith(".parquet") for f in os.listdir(out))