"""Bloom filter guarantee: no false negatives — every true member probes
positive; false-positive rate stays near the configured bound."""

from __future__ import annotations

import pyspark.sql.functions as F

from canvas_data_aws_spark.plans.sketch_q import bloom_build, bloom_probe
from canvas_data_aws_spark.sources.parquet import load_table


def test_bloom_no_false_negatives(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    bf = bloom_build(building, "c_custkey")

    probed = bloom_probe(o, "o_custkey", "o_orderkey", bf)
    member_orders = o.join(building, o.o_custkey == building.c_custkey, "left_semi")

    # no false negatives: every order from a BUILDING customer probes positive
    n_members = member_orders.count()
    n_member_hits = (
        probed.join(building, probed.o_custkey == building.c_custkey, "left_semi")
        .filter("maybe")
        .count()
    )
    assert n_member_hits == n_members

    # pruning power: false-positive rate bounded
    n_probed = probed.count()
    n_maybe = probed.filter("maybe").count()
    non_members = n_probed - n_members
    if non_members > 0:
        fp_rate = (n_maybe - n_members) / non_members
        assert fp_rate < 0.1, f"false-positive rate {fp_rate:.2%}"
