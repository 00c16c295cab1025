"""Corpus-curation operator tests: decontamination (with broadcast plan
audit), quality-filter chain semantics, deterministic split stability,
n-gram table determinism, corpus stats."""

from __future__ import annotations

import pyspark.sql.functions as F

from canvas_data_aws_spark.operators.curation import (
    corpus_stats,
    decontaminate,
    deterministic_split,
    ngram_top_k,
    quality_filter,
)
from canvas_data_aws_spark.plans.audit import explain_str, has_operator


def test_decontaminate_flags_planted_overlap(spark):
    eval_doc = "the quick brown fox jumps over the lazy dog near the river bank today"
    clean = "completely different content about spark catalyst optimizer internals here now"
    train = spark.createDataFrame(
        [
            (1, eval_doc + " plus extra trailing words"),  # contains eval 8-grams
            (2, clean),
            (3, "short text"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, eval_doc)], "doc_id long, text string")
    out = {r["doc_id"]: (r["n_eval_hits"], r["contaminated"]) for r in
           decontaminate(train, ev, k=8).collect()}
    assert out[1][1] is True and out[1][0] >= 1
    assert out[2] == (0, False)
    assert out[3] == (0, False)  # too short to form an 8-gram
    assert len(out) == 3  # every train doc reported, hit or not


def test_decontaminate_broadcasts_eval_side(spark, sf_dir):
    from canvas_data_aws_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 20 == 0)
    tr = docs.filter(F.col("doc_id") % 20 != 0)
    plan = explain_str(decontaminate(tr, ev))
    assert has_operator(plan, "BroadcastHashJoin"), plan[:1500]


def test_quality_filter_rules_and_keep(spark):
    good = "the cat and the dog walked over the hill and found some food " * 5
    rows = [
        (1, good),                      # passes everything
        (2, "tiny"),                    # fails r_len
        (3, "a " * 200),                # mean word len 1.5 -> fails r_word_len
        (4, ("@#$! " * 60) + good),     # heavy punctuation -> fails r_punct
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in quality_filter(df, min_stop_ratio=0.01).collect()}
    assert out[1]["keep"] is True
    assert out[2]["r_len"] is False and out[2]["keep"] is False
    assert out[3]["r_word_len"] is False and out[3]["keep"] is False
    assert out[4]["r_punct"] is False and out[4]["keep"] is False


def test_deterministic_split_is_stable_under_growth(spark):
    small = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 10_000).withColumnRenamed("id", "doc_id")
    s_small = {r["doc_id"]: r["split"] for r in deterministic_split(small).collect()}
    s_big = {r["doc_id"]: r["split"] for r in deterministic_split(big).collect()}
    # a doc's split never changes when the corpus grows
    assert all(s_big[k] == v for k, v in s_small.items())
    # proportions approximate the 80/10/10 request
    from collections import Counter

    c = Counter(s_big.values())
    assert abs(c["train"] / 10_000 - 0.8) < 0.05
    assert abs(c["val"] / 10_000 - 0.1) < 0.03
    assert abs(c["test"] / 10_000 - 0.1) < 0.03


def test_ngram_top_k_deterministic_and_fused(spark, sf_dir):
    from canvas_data_aws_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = [tuple(r) for r in ngram_top_k(docs, n=2, top=20).collect()]
    b = [tuple(r) for r in ngram_top_k(docs, n=2, top=20).collect()]
    assert a == b and len(a) == 20
    freqs = [f for _, f in a]
    assert freqs == sorted(freqs, reverse=True)
    # ordered limit must fuse, not globally sort
    plan = explain_str(ngram_top_k(docs, n=2, top=20))
    assert has_operator(plan, "TakeOrderedAndProject"), plan[:1500]


def test_corpus_stats_exact_values(spark):
    df = spark.createDataFrame(
        [(1, "Hello world"), (2, "hello  spark world"), (3, "x")],
        "doc_id long, text string",
    )
    r = corpus_stats(df).first()
    assert r["n_docs"] == 3
    assert r["total_tokens"] == 2 + 3 + 1
    assert r["total_chars"] == len("Hello world") + len("hello  spark world") + 1
    # vocab is lowercased: {hello, world, spark, x}
    assert r["vocab_size"] == 4


def test_split_near_leakage_planted(spark, tmp_path):
    """corpus_split_leakage_near must catch a PLANTED near-duplicate that
    straddles the train/eval boundary (one word changed — far above the
    0.8 Jaccard gate), and not flag unrelated eval docs."""
    import hashlib

    import pyspark.sql.functions as F

    from canvas_data_aws_spark.plans.registry import all_queries

    def split_of(doc_id: int) -> str:
        h = hashlib.md5(str(doc_id).encode()).hexdigest()[0]
        if h in "0123456789ab":
            return "train"
        return "val" if h in "cd" else "test"

    train_id = next(i for i in range(1000) if split_of(i) == "train")
    eval_id = next(i for i in range(1000) if split_of(i) != "train")
    other_id = next(
        i for i in range(1000) if split_of(i) != "train" and i != eval_id
    )
    # varied vocabulary so the distinct-shingle set is large and a one-word
    # edit keeps true Jaccard ~0.95 (repeated text has tiny shingle sets
    # where a single edit drops Jaccard below any useful threshold)
    base = " ".join(f"token{i} word{i*7%97}" for i in range(60))
    rows = [
        (train_id, base),
        (eval_id, base.replace("token30", "changed", 1)),  # near-dup of train
        (other_id, " ".join(f"other{i} thing{i*5%89}" for i in range(60))),
    ]
    d = str(tmp_path / "leak")
    spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(
        f"{d}/documents.parquet"
    )
    out = {
        r["split"]: (r["n_docs"], r["n_near_leaked"])
        for r in all_queries()["corpus_split_leakage_near"].fn(spark, d).collect()
    }
    leaked_total = sum(v[1] for v in out.values())
    assert leaked_total == 1, out
    assert split_of(eval_id) in out and out[split_of(eval_id)][1] == 1, out
