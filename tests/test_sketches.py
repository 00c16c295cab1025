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


def test_hll_weekly_union_within_error_bound(spark, sf_dir):
    """sketch_hll_partitioned: the weekly estimate from UNIONED daily
    sketches must land within 5% of the exact weekly distinct count (HLL
    default lgConfigK=12 gives ~1.6% standard error), proving daily
    sketches are a valid incremental state for any rollup window."""
    import pyspark.sql.functions as F

    from canvas_data_aws_spark.plans.registry import all_queries
    from canvas_data_aws_spark.sources.parquet import load_table

    est = {
        r["week"]: r["est_weekly_users"]
        for r in all_queries()["sketch_hll_partitioned"].fn(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "events").select(
        F.date_trunc("week", "ts").cast("date").alias("week"), "user_id"
    )
    exact = {
        r["week"]: r["n"]
        for r in e.groupBy("week").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert set(est) == set(exact)
    for wk, n in exact.items():
        rel = abs(est[wk] - n) / max(n, 1)
        assert rel <= 0.05, f"week {wk}: est {est[wk]} vs exact {n} ({rel:.2%})"


def test_bloom_decontaminate_supersets_exact(spark, sf_dir):
    """The sketch tier's contract: every doc the exact shingle join flags
    must also be bloom-flagged (no false negatives); bloom may add a
    bounded set of false positives."""
    from canvas_data_aws_spark.plans.registry import all_queries

    reg = all_queries()
    exact = {
        r.doc_id
        for r in reg["corpus_decontaminate"].fn(spark, sf_dir).collect()
        if r.contaminated
    }
    bloom = {
        r.doc_id
        for r in reg["corpus_decontaminate_bloom"].fn(spark, sf_dir).collect()
        if r.contaminated_maybe
    }
    assert exact, "fixture should contain contaminated docs"
    assert exact <= bloom, f"false negatives: {sorted(exact - bloom)[:5]}"


def test_count_min_overestimates_and_hits_truth(spark, sf_dir):
    """CMS contract: every estimate >= the true count (the one-sided error
    guarantee), collisions actually occur at this key cardinality (some
    row strictly overestimates — otherwise the sketch geometry is not
    being exercised), and the global min collision-free key count is
    positive (MIN over 4 lanes recovers the exact count for most keys)."""
    from canvas_data_aws_spark.plans.registry import all_queries

    rows = all_queries()["sketch_count_min"].fn(spark, sf_dir).collect()
    assert rows, "no keys"
    assert all(r.cms_est >= r.true_n for r in rows), "CMS underestimated"
    n_exact = sum(1 for r in rows if r.cms_est == r.true_n)
    assert n_exact > 0, "no key recovered exactly — hashes look broken"


def test_cdc_apply_delete_and_resurrection(spark, sf_dir):
    """Keys divisible by 5 but by neither 7 (resurrect) nor 2/3-with-later-
    seq considerations must be absent; keys divisible by 35 must be present
    with the second upsert's 'R' row (post-delete resurrection)."""
    from canvas_data_aws_spark.plans.registry import all_queries

    out = {
        r.o_orderkey: r
        for r in all_queries()["table_cdc_apply"].fn(spark, sf_dir).collect()
    }
    assert out, "empty CDC result"
    dead = [k for k in out if k % 5 == 0 and k % 7 != 0]
    assert not dead, f"deleted keys leaked: {dead[:5]}"
    resurrected = [k for k in out if k % 35 == 0]
    assert resurrected, "fixture has no % 35 keys"
    assert all(out[k].o_orderstatus == "R" for k in resurrected)
    assert all(out[k].last_seq == k * 2 + 2 for k in resurrected)


def test_agg_approx_count_distinct_error_bound(spark, sf_dir):
    """agg_approx_count_distinct (rows-only entry): the HLL++ estimate with
    rsd=0.01 must land within 5% of the exact per-group distinct count —
    the quality floor the driver's rows-only check cannot see."""
    from canvas_data_aws_spark.plans.registry import all_queries

    approx = {
        r["l_returnflag"]: r["approx_parts"]
        for r in all_queries()["agg_approx_count_distinct"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, est in approx.items():
        err = abs(est - exact[flag]) / exact[flag]
        assert err <= 0.05, f"group {flag}: HLL error {err:.2%} exceeds 5%"


def test_agg_approx_percentile_rank_error(spark, sf_dir):
    """agg_approx_percentile (rows-only entry): each GK-sketch percentile
    (accuracy=10000) must sit within 1 percentile point of the target rank
    in the exact per-group distribution."""
    from canvas_data_aws_spark.plans.registry import all_queries

    rows = all_queries()["agg_approx_percentile"].fn(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    for r in rows:
        group = li.filter(F.col("l_linestatus") == r["l_linestatus"])
        n = group.count()
        for col, target in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            # realized rank of the reported value in the exact distribution
            below = group.filter(F.col("l_extendedprice") <= r[col]).count()
            rank = below / n
            assert abs(rank - target) <= 0.01, (
                f"{r['l_linestatus']}/{col}: realized rank {rank:.4f} "
                f"vs target {target} (GK accuracy=10000 should hold 1e-4; "
                "1pp bound is generous)"
            )


def _digest_rank_errors(spark, sf_dir, group_expr):
    """Build digests grouped by ``group_expr``, merge, query, and return
    [(p_mil, rank_error_fraction)] vs the exact sorted ranks."""
    import pyspark.sql.functions as F

    from canvas_data_aws_spark.operators.quantiles import (
        quantile_digest_build,
        quantile_digest_merge,
        quantile_digest_query,
    )
    from canvas_data_aws_spark.plans.sketch_q import QD_PMILS
    from canvas_data_aws_spark.sources.parquet import load_table

    ev = load_table(spark, sf_dir, "events").select(
        group_expr.alias("grp"), "event_id", "value"
    )
    daily = quantile_digest_build(ev, "value", "event_id", ["grp"], b=32)
    merged = quantile_digest_merge(daily, [], ["grp", "bucket"], b=64)
    est = {
        r["p_mil"]: r["est"]
        for r in quantile_digest_query(merged, QD_PMILS, []).collect()
    }
    values = sorted(v for (v,) in ev.select("value").collect())
    n = len(values)
    errs = []
    for p, e in est.items():
        target = (p * n + 999) // 1000
        import bisect

        rank = bisect.bisect_right(values, e)
        errs.append((p, abs(rank - target) / n))
    return errs


def test_quantile_digest_rank_error_bound(spark, sf_dir):
    """sketch_quantile_digest: every queried quantile's estimate must sit
    within 3/b_build + 1/b_merge of its target rank (strata width from the
    daily build + one merge level), asserted at 5% of n with headroom."""
    import pyspark.sql.functions as F

    errs = _digest_rank_errors(
        spark, sf_dir, F.date_trunc("day", "ts").cast("date")
    )
    for p, frac in errs:
        assert frac <= 0.05, f"p_mil={p}: rank error {frac:.3%} exceeds 5%"


def test_quantile_digest_merge_partitioning_invariance(spark, sf_dir):
    """Merging is valid no matter how the state was partitioned: digests
    built per WEEK (instead of per day) must merge to quantiles inside the
    same rank-error bound — the property that lets any rollup window be
    answered from whatever granularity the state table kept."""
    import pyspark.sql.functions as F

    errs = _digest_rank_errors(
        spark, sf_dir, F.date_trunc("week", "ts").cast("date")
    )
    for p, frac in errs:
        assert frac <= 0.05, f"p_mil={p} (weekly build): rank error {frac:.3%}"
