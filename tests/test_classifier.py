"""Hashed-BOW logistic classifier (operators/classifier.py): numpy parity
for the distributed GD, separation floor for the trained filter, and the
two-level global-rank idiom vs a reference window rank."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyspark.sql.functions as F

from canvas_data_aws_spark.operators.classifier import (
    bias_rows,
    global_rank,
    hashed_bow,
    logistic_gd,
    logistic_score,
)
from canvas_data_aws_spark.sources.parquet import load_table

N_BUCKETS = 64
SCALE = 100.0


def _numpy_fit(rows, lr=0.5, passes=3):
    """Reference implementation: identical tokenization (md5-nibble
    buckets), identical zero-init full-batch GD."""
    X = np.zeros((len(rows), N_BUCKETS))
    y = np.zeros(len(rows))
    for i, (doc_id, text) in enumerate(rows):
        t = text.strip()
        words = re.sub(r"\s+", " ", text.lower().strip()).split(" ") if t else []
        n_words = len(re.split(r"\s+", t)) if t else 0
        y[i] = 1.0 if 50 <= n_words <= 100000 else 0.0
        for wd in words:
            h = hashlib.md5(wd.encode()).hexdigest()
            X[i, (int(h[0], 16) * 16 + int(h[1], 16)) % N_BUCKETS] += 1
    X /= SCALE
    w = np.zeros(N_BUCKETS)
    b = 0.0
    for _ in range(passes):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        w -= lr * (X.T @ (p - y)) / len(y)
        b -= lr * (p - y).mean()
    return X, y, w, b


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )


def _labels(docs):
    n_words = F.size(F.split(F.trim("text"), r"\s+"))
    return docs.select(
        F.col("doc_id").alias("id"),
        n_words.between(50, 100000).cast("double").alias("y"),
    )


def test_logistic_gd_matches_numpy(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    rows = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
    _, _, w_ref, b_ref = _numpy_fit(rows)
    feats = hashed_bow(docs).unionByName(bias_rows(docs))
    w, b = logistic_gd(feats, _labels(docs), n_buckets=N_BUCKETS, lr=0.5, passes=3)
    assert np.allclose(np.array(w), w_ref, atol=1e-9)
    assert abs(b - b_ref) < 1e-9


def test_classifier_separates_weak_label(spark, sf_dir):
    """The trained filter must actually discriminate: held-out AUC >= 0.95
    on the Gopher word-count weak label (the floor a fastText-class
    quality gate needs before a threshold means anything)."""
    docs = _docs(spark, sf_dir)
    labels = _labels(docs)
    feats = hashed_bow(docs).unionByName(bias_rows(docs))
    train = labels.filter(F.col("id") % 5 != 0)
    w, b = logistic_gd(feats, train, n_buckets=N_BUCKETS, lr=0.5, passes=3)
    test = (
        logistic_score(feats, w, b)
        .join(labels.filter(F.col("id") % 5 == 0), "id")
        .select("id", "y", "s")
    )
    ranked = global_rank(test, ["s", "id"], out_col="rnk").collect()
    n = len(ranked)
    npos = sum(1 for r in ranked if r["y"] == 1.0)
    assert 0 < npos < n  # both classes present in the held-out split
    rank_sum = sum(r["rnk"] for r in ranked if r["y"] == 1.0)
    auc = (rank_sum - npos * (npos + 1) / 2) / (npos * (n - npos))
    assert auc >= 0.95, f"held-out AUC {auc:.4f} below floor"


def test_global_rank_matches_window_rank(spark, sf_dir):
    """Two-level rank (range sort + per-partition offsets) == the
    single-window row_number reference, including tie-break behavior."""
    from pyspark.sql import Window

    df = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", (F.col("n_chars") % 7).alias("k"))  # heavy ties
        .repartition(4)
    )
    got = {
        r["doc_id"]: r["rnk"]
        for r in global_rank(df, ["k", "doc_id"], out_col="rnk").collect()
    }
    ref = {
        r["doc_id"]: r["rnk"]
        for r in df.withColumn(
            "rnk", F.row_number().over(Window.orderBy("k", "doc_id"))
        ).collect()
    }
    assert got == ref


def test_gd_per_pass_plan_is_bounded(spark, sf_dir):
    """The per-doc score aggregate must reuse the feature table's hash
    partitioning: no Exchange between the checkpointed scan and the
    final aggregate (the per-pass cost contract in the module docstring)."""
    docs = _docs(spark, sf_dir)
    feats = (
        hashed_bow(docs).unionByName(bias_rows(docs)).repartition("id").persist()
    )
    feats.count()
    from canvas_data_aws_spark.operators.classifier import _doc_scores

    try:
        df = _doc_scores(feats, {b: 0.1 for b in range(-1, N_BUCKETS)})
        df.collect()  # AQE: final plan only exists after execution
        plan = df._jdf.queryExecution().executedPlan().toString()
        # exactly the one Exchange from the persisted repartition is allowed
        # to appear ABOVE the InMemoryTableScan reuse boundary; the aggregate
        # itself must not add one
        agg_part = plan.split("InMemoryTableScan")[0]
        assert "Exchange" not in agg_part, plan
    finally:
        feats.unpersist()


def test_topk_filter_rank_key_is_rounded_score(spark, sf_dir):
    """corpus_classifier_topk_filter must rank on the ROUNDED score
    (round(s, 6) desc, doc_id) — rounding BEFORE ranking lets the unique
    doc_id tie-break absorb last-ulp aggregation-merge-order differences,
    so the kept set is bit-reproducible across engines and runs (round-11
    advice). The output is self-describing (score_r IS round(s,6)), so the
    committed rnk column must equal a rank recomputed from the output's
    own (score_r desc, doc_id) ordering."""
    from pyspark.sql import Window

    from canvas_data_aws_spark.plans.registry import query_map

    out = query_map()["corpus_classifier_topk_filter"](spark, sf_dir)
    rows = out.select("doc_id", "score_r", "rnk").collect()
    assert len(rows) > 0
    expected = {
        r["doc_id"]: r["re_rnk"]
        for r in out.withColumn(
            "re_rnk",
            F.row_number().over(
                Window.orderBy(F.col("score_r").desc(), "doc_id")
            ),
        ).collect()
    }
    got = {r["doc_id"]: r["rnk"] for r in rows}
    assert got == expected, (
        "rnk disagrees with the (round(s,6) desc, doc_id) order — the rank "
        "key is not the rounded score"
    )


def test_classifier_reliability_reconciles_and_ranks(spark, sf_dir):
    """corpus_classifier_reliability: the decile table must reconcile with
    the corpus (bucket counts sum to the nonblank doc count, passes to the
    weak-label positives) and show the ranking signal the keep-top-k%
    design relies on: the highest populated decile's observed pass rate
    exceeds the lowest's."""
    from canvas_data_aws_spark.plans.registry import query_map

    rows = sorted(
        query_map()["corpus_classifier_reliability"](spark, sf_dir).collect(),
        key=lambda r: r["bucket"],
    )
    docs = _docs(spark, sf_dir)
    assert sum(r["n_docs"] for r in rows) == docs.count()
    n_pos = _labels(docs).agg(F.sum("y")).collect()[0][0]
    assert sum(r["n_pass"] for r in rows) == int(n_pos)
    for r in rows:
        assert 0.0 <= float(r["pass_rate"]) <= 1.0
        assert 0 <= r["bucket"] <= 9
    # the documented UNCALIBRATED shape: a 3-pass fit's probabilities
    # concentrate in the middle deciles (never the confident 0/9 extremes)
    # — the reason curate's stage 1c thresholds on rank, not probability
    assert all(2 <= r["bucket"] <= 8 for r in rows), rows
    if len(rows) > 1:
        assert float(rows[-1]["pass_rate"]) >= float(rows[0]["pass_rate"]), (
            "ranking signal inverted across populated deciles"
        )


def test_logistic_gd_materialized_path_is_bit_identical(spark, sf_dir):
    """materialize_features + materialized=True (round 13: one feature
    build shared between fit and score) must be bit-identical to the
    operator's internal persist path — weights, bias, and scores."""
    from canvas_data_aws_spark.operators.classifier import materialize_features

    docs = _docs(spark, sf_dir)
    labels = _labels(docs)
    feats = hashed_bow(docs).unionByName(bias_rows(docs))
    w0, b0 = logistic_gd(feats, labels, n_buckets=N_BUCKETS, lr=0.5, passes=3)
    mat = materialize_features(feats)
    w1, b1 = logistic_gd(mat, labels, n_buckets=N_BUCKETS, lr=0.5, passes=3,
                         materialized=True)
    assert w0 == w1 and b0 == b1  # bit-identical, not allclose
    s0 = {r["id"]: r["s"] for r in logistic_score(feats, w0, b0).collect()}
    s1 = {r["id"]: r["s"] for r in logistic_score(mat, w1, b1).collect()}
    assert s0 == s1
    mat.unpersist()


def test_weights_map_expr_matches_lit_form(spark, sf_dir):
    """_weights_map (round 13: ONE parsed SQL map literal instead of
    2*(B+1) py4j F.lit round trips per GD pass) must be value- AND
    type-identical to the create_map(*lits) form it replaced, including
    exponent-notation, negative, zero, and last-ulp doubles."""
    from canvas_data_aws_spark.operators.classifier import _weights_map

    w = {b: (b - 32) * 1.23456789e-7 for b in range(N_BUCKETS)}
    w[-1] = -3.0
    w[7] = 0.0
    w[11] = 5e-324          # smallest subnormal round-trips through repr
    w[13] = 0.1 + 0.2       # 0.30000000000000004 — shortest-repr exactness
    lit_pairs = []
    for b in sorted(w):
        lit_pairs.append(F.lit(int(b)))
        lit_pairs.append(F.lit(float(w[b])))
    lit_map = F.create_map(*lit_pairs)
    expr_map = _weights_map(w)
    df = spark.range(0, N_BUCKETS + 2).select((F.col("id") - 1).cast("int").alias("b"))
    got = df.select(
        lit_map[F.col("b")].alias("a"), expr_map[F.col("b")].alias("e")
    )
    assert dict(got.dtypes) == {"a": "double", "e": "double"}
    rows = got.collect()
    assert all(r["a"] == r["e"] for r in rows), [
        (r["a"], r["e"]) for r in rows if r["a"] != r["e"]
    ]
