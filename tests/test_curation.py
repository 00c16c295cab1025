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


def _planted_dup_fixture(spark, sf_dir, tmp_path, cross_split: bool):
    """Fixture docs plus EXACT duplicates planted across a boundary:
    train/eval (md5 split) when cross_split, else state/delta (doc_id%10).
    Returns (fixture_dir, expected_leaked_new_ids)."""
    import hashlib

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    base = [(r["doc_id"], r["text"]) for r in docs.limit(40).collect()]
    max_id = docs.agg(F.max("doc_id")).first()[0]

    def is_train(i):
        return hashlib.md5(str(i).encode()).hexdigest()[0] in "0123456789ab"

    planted, nid, expect = [], max_id + 1, []
    for src_id, text in base[:8]:
        # find a new id on the OTHER side of the boundary from a train/state doc
        while True:
            nid += 1
            if cross_split and not is_train(nid):
                break
            if not cross_split and nid % 10 >= 8:
                break
        # source doc must sit on the train/state side for the copy to leak
        if cross_split and not is_train(src_id):
            continue
        if not cross_split and src_id % 10 >= 8:
            continue
        if len(text.split()) < 3:
            continue  # <k_shingle words -> no signature, guarantee n/a
        planted.append((nid, text))
        expect.append(nid)
    assert len(expect) >= 3, "fixture too small to plant duplicates"
    d = str(tmp_path / "dup_fixture")
    docs.unionByName(
        spark.createDataFrame(planted, ["doc_id", "text"])
    ).write.parquet(f"{d}/documents.parquet")
    return d, expect


def _duckdb_exact_cross(d, boundary_sql):
    """Independent DuckDB computation of the exact (normalized-text-equal)
    cross-boundary leak set."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"parquet_scan('{d}/documents.parquet/*.parquet')"
    )
    rows = con.execute(
        r"""
        WITH a AS (
          SELECT doc_id, trim(regexp_replace(lower(text),'\s+',' ','g')) AS nt,
                 CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,1) IN
                      ('0','1','2','3','4','5','6','7','8','9','a','b')
                      THEN 'train'
                      WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,1) IN ('c','d')
                      THEN 'val' ELSE 'test' END AS split
          FROM documents)
        SELECT DISTINCT e.doc_id FROM a e JOIN a t ON e.nt = t.nt AND """
        + boundary_sql
    ).fetchall()
    return {r[0] for r in rows}


def test_split_leakage_near_contains_exact(spark, sf_dir, tmp_path):
    """Containment oracle for the rows-only corpus_split_leakage_near:
    identical normalized text => identical shingle set => identical MinHash
    signatures => est Jaccard 1.0 and every band shared — so the EXACT
    cross-split leak set (computed independently in DuckDB) is guaranteed
    a subset of the near-dup report. Pins the sketch against silent
    no-op regressions the way bloom's superset test does."""
    from canvas_data_aws_spark.operators.dedup import minhash_cross_pairs

    d, _ = _planted_dup_fixture(spark, sf_dir, tmp_path, cross_split=True)
    exact = _duckdb_exact_cross(d, "t.split = 'train' AND e.split <> 'train'")
    assert exact, "planting failed: no exact cross-split duplicates"

    docs = spark.read.parquet(f"{d}/documents.parquet").select("doc_id", "text")
    first_hex = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    assigned = docs.withColumn(
        "is_train", first_hex.isin(*"0123456789ab")
    )
    pairs = minhash_cross_pairs(
        assigned.filter(~F.col("is_train")).select("doc_id", "text"),
        assigned.filter(F.col("is_train")).select("doc_id", "text"),
        jaccard_threshold=0.8,
    )
    near = {r["delta_id"] for r in pairs.collect()}
    assert exact <= near, f"false negatives vs exact tier: {sorted(exact - near)[:5]}"
    # and the registry query's per-split counts must cover the exact set
    from canvas_data_aws_spark.plans.registry import all_queries

    out = all_queries()["corpus_split_leakage_near"].fn(spark, d).collect()
    assert sum(r["n_near_leaked"] for r in out) >= len(exact)


def test_cross_dedup_near_contains_exact(spark, sf_dir, tmp_path):
    """Same containment oracle for corpus_cross_dedup_near: delta docs whose
    normalized text exactly matches a state doc (DuckDB-computed) must all
    be reported by the MinHash band join at any threshold <= 1.0."""
    from canvas_data_aws_spark.operators.dedup import minhash_cross_pairs

    d, _ = _planted_dup_fixture(spark, sf_dir, tmp_path, cross_split=False)
    exact = _duckdb_exact_cross(
        d, "t.doc_id % 10 < 8 AND e.doc_id % 10 >= 8"
    )
    assert exact, "planting failed: no exact delta-state duplicates"
    docs = spark.read.parquet(f"{d}/documents.parquet").select("doc_id", "text")
    pairs = minhash_cross_pairs(
        docs.filter(F.col("doc_id") % 10 >= 8),
        docs.filter(F.col("doc_id") % 10 < 8),
        jaccard_threshold=0.5,
    )
    near = {r["delta_id"] for r in pairs.collect()}
    assert exact <= near, f"false negatives vs exact tier: {sorted(exact - near)[:5]}"


def test_dup_span_strip_complements_report(spark, sf_dir):
    """Cross-query invariant: the strip action removes EXACTLY the tokens
    the report counts — kept_tokens == n_tokens - dup_tokens per doc, and
    the cleaned text re-tokenizes to kept_tokens words."""
    from canvas_data_aws_spark.plans.registry import all_queries

    reg = all_queries()
    report = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"])
        for r in reg["corpus_dup_ngram_spans"].fn(spark, sf_dir).collect()
    }
    stripped = reg["corpus_dup_span_strip"].fn(spark, sf_dir).collect()
    assert {r["doc_id"] for r in stripped} == set(report)
    some_dup = False
    for r in stripped:
        n, dup = report[r["doc_id"]]
        assert r["n_tokens"] == n
        assert r["kept_tokens"] == n - dup, (r["doc_id"], n, dup, r["kept_tokens"])
        n_words = len(r["clean_text"].split()) if r["clean_text"] else 0
        assert n_words == r["kept_tokens"]
        some_dup = some_dup or dup > 0
    assert some_dup, "fixture should contain duplicated spans"


def test_calibration_rides_persisted_attributes(spark, sf_dir, tmp_path):
    """Round-11 verdict task: corpus_quality_calibration's computation is
    quality_calibration_from_attributes, which must accept the PERSISTED
    attribute store (the Dolma decoupling its docstring promises) and
    produce exactly the registry entry's inline result — so recalibrating
    at 100 TB reads the narrow store, never the text."""
    from canvas_data_aws_spark.operators.curation import (
        quality_calibration_from_attributes,
    )
    from canvas_data_aws_spark.operators.text import document_attributes
    from canvas_data_aws_spark.plans.registry import query_map
    from canvas_data_aws_spark.sources.parquet import load_table

    store = str(tmp_path / "attrs")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    document_attributes(docs).write.mode("overwrite").parquet(store)

    from_store = quality_calibration_from_attributes(spark.read.parquet(store))
    inline = query_map()["corpus_quality_calibration"](spark, sf_dir)

    def snap(df):
        return sorted(tuple(r) for r in df.collect())

    assert snap(from_store) == snap(inline)
    assert from_store.columns == inline.columns
    # and the store path really is narrow: the calibration's scan prunes to
    # the two columns it needs — text never enters the plan
    plan = explain_str(from_store, mode="formatted")
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and all("text" not in ln for ln in read_schema), read_schema
    assert any("q_score" in ln and "n_tokens" in ln for ln in read_schema), read_schema
