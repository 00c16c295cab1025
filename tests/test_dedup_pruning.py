"""Doc-frequency pruning knob for the inverted-index Jaccard join: recall
of high-similarity pairs survives pruning of non-discriminating shingles.
Plus the band-side analog: hot-bucket caps bound the candidate fan-out of
the simhash/minhash tiers under adversarial (mass-identical/empty) input,
and the simhash pigeonhole precondition is enforced."""

from __future__ import annotations

import pytest

from canvas_data_aws_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from canvas_data_aws_spark.sources.parquet import load_table


def test_doc_freq_pruning_keeps_high_sim_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    pruned = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.4, max_doc_freq=50).collect()
    }
    assert exact, "fixture should contain planted near-duplicates"
    found = sum(1 for p in exact if p in pruned)
    assert found / len(exact) >= 0.9, f"pruning lost {len(exact) - found}/{len(exact)} pairs"
    # pruned jaccard is a lower-bound estimate
    for p in exact:
        if p in pruned:
            assert pruned[p] <= exact[p] + 1e-9


def _adversarial_docs(spark, n=1000):
    """Degenerate corpus: one mass-identical cluster (all docs hash to the
    same bands) plus empty texts (all-zero simhash) — the worst case for
    banded candidate generation: O(n²) pairs from single buckets."""
    rows = [(i, "boilerplate header repeated in every document body") for i in range(n)]
    rows += [(n + i, "") for i in range(50)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_simhash_hot_bucket_cap_bounds_candidates(spark):
    docs = _adversarial_docs(spark)
    cap = 50
    capped = simhash_near_dup_pairs(
        docs, max_hamming=3, bands=4, max_band_freq=cap
    ).count()
    # every band bucket the 1000-identical cluster lands in exceeds the cap,
    # so the quadratic blow-up (~500k pairs uncapped) never materializes
    assert capped <= cap * cap, f"hot bucket produced {capped} candidate pairs"


def test_minhash_hot_bucket_cap_bounds_candidates(spark):
    docs = _adversarial_docs(spark)
    cap = 50
    capped = minhash_lsh_pairs(
        docs, jaccard_threshold=0.0, max_band_freq=cap
    ).count()
    assert capped <= cap * cap, f"hot bucket produced {capped} candidate pairs"


def test_hot_bucket_cap_none_keeps_exact_semantics(spark):
    docs = _adversarial_docs(spark, n=40)  # small enough to pair exhaustively
    uncapped = simhash_near_dup_pairs(docs, max_hamming=3, bands=4).count()
    assert uncapped >= 40 * 39 // 2  # identical docs all pair up


def test_simhash_rejects_recall_losing_bands(spark):
    docs = _adversarial_docs(spark, n=5)
    with pytest.raises(ValueError, match="recall"):
        simhash_near_dup_pairs(docs, max_hamming=8, bands=4)
    with pytest.raises(ValueError, match="divide"):
        simhash_near_dup_pairs(docs, max_hamming=3, bands=5)


def test_simhash_auto_bands_from_threshold(spark, sf_dir):
    """bands=None derives the smallest 64-divisor >= max_hamming+1."""
    docs = load_table(spark, sf_dir, "documents").limit(50)
    # max_hamming=7 -> 8 bands; just assert it runs and verifies hamming
    out = simhash_near_dup_pairs(docs, max_hamming=7).collect()
    assert all(r["hamming"] <= 7 for r in out)


def test_registry_bounded_modes_recall(spark):
    """Round-9 verdict item 2: the REGISTRY bounded entries measured against
    exact mode at sf0.1 — what the max_doc_freq bound sacrifices, pinned.
    Measured when the caps were chosen (DuckDB sweep): jaccard cap 12 ->
    recall 0.980; containment cap 14 -> recall 0.953. Floors leave ~3 pts
    of fixture drift. Bounded scores are lower bounds, so bounded output
    is a strict SUBSET of exact output at the same threshold."""
    from canvas_data_aws_spark.plans.llm_q import (
        _CONTAINMENT_MAX_DOC_FREQ,
        _JACCARD_MAX_DOC_FREQ,
    )

    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    cases = [
        ("jaccard", 0.2, _JACCARD_MAX_DOC_FREQ, 0.95),
        ("containment", 0.6, _CONTAINMENT_MAX_DOC_FREQ, 0.90),
    ]
    for score, thr, cap, floor in cases:
        exact = {
            (r["id_a"], r["id_b"]): r[score]
            for r in ngram_jaccard_pairs(docs, threshold=thr, score=score).collect()
        }
        bounded = {
            (r["id_a"], r["id_b"]): r[score]
            for r in ngram_jaccard_pairs(
                docs, threshold=thr, score=score, max_doc_freq=cap
            ).collect()
        }
        assert exact, f"{score}: fixture should contain near-duplicates"
        assert set(bounded) <= set(exact), f"{score}: bounded emitted a non-exact pair"
        for p, v in bounded.items():
            assert v <= exact[p] + 1e-9, f"{score}: bounded score not a lower bound"
        recall = len(bounded) / len(exact)
        assert recall >= floor, f"{score}@cap{cap}: recall {recall:.3f} < {floor}"


def test_embedding_blocked_recall_floor(spark, sf_dir):
    """Quality floor for dedup_embedding_cosine_blocked (rows-only entry):
    k-means cell blocking must retain most true cos>=0.3 pairs vs the
    all-pairs ground truth, and — since pairs are verified with EXACT
    cosine inside each cell — emit nothing that isn't a true pair."""
    from canvas_data_aws_spark.operators.similarity import embedding_near_dup_pairs
    from canvas_data_aws_spark.plans.registry import all_queries

    emb = load_table(spark, sf_dir, "embeddings")
    truth = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            emb, id_col="vec_id", vec_col="embedding", threshold=0.3
        ).collect()
    }
    blocked = {
        (r["id_a"], r["id_b"])
        for r in all_queries()["dedup_embedding_cosine_blocked"].fn(spark, sf_dir).collect()
    }
    assert truth, "fixture should contain cos>=0.3 pairs"
    assert blocked <= truth, "blocked emitted a pair below threshold (precision must be 1)"
    recall = len(blocked) / len(truth)
    # top-2 multi-probe measured 0.772 at sf0.01 (single assignment: 0.34)
    assert recall >= 0.7, f"cell-blocked recall {recall:.3f} < 0.7"


def test_line_dedup_newline_mode(spark):
    """Production (newline) mode of line_dedup: normalized matching,
    verbatim rebuild, empty-line exemption, order preservation."""
    from canvas_data_aws_spark.operators.dedup import line_dedup

    rows = [
        (1, "Subscribe to our newsletter\nAlpha unique content one\n\nshared LICENSE line"),
        (2, "subscribe to  our Newsletter\nBeta different content two\nShared license line"),
        (3, "Gamma standalone document\n"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in line_dedup(df, min_doc_freq=2).collect()}

    # doc 1: newsletter + license lines repeat (normalized) across 2 docs
    assert out[1]["n_lines"] == 4
    assert out[1]["n_dropped"] == 2
    # kept lines rebuilt VERBATIM (not normalized), order preserved,
    # empty line kept (exempt from the frequency rule despite df=2)
    assert out[1]["text_clean"] == "Alpha unique content one\n"
    assert out[2]["n_dropped"] == 2
    assert out[2]["text_clean"] == "Beta different content two"
    # doc 3: nothing dropped -> exact round-trip
    assert out[3]["n_dropped"] == 0
    assert out[3]["text_clean"] == "Gamma standalone document\n"


def test_bounded_pair_generation_matches_self_join_path(spark, sf_dir):
    """Round 13: bounded mode generates candidates via per-shingle posting
    lists + row-local double explode instead of the inverted-index
    self-join. With a cap no shingle reaches, bounded output must be
    SET-IDENTICAL to exact mode (which still uses the join) — pinning the
    new pair-generation path against the join path it replaced, for both
    scores."""
    from canvas_data_aws_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    for score in ("jaccard", "containment"):
        exact = {
            tuple(r)
            for r in ngram_jaccard_pairs(
                docs, k=3, threshold=0.2, score=score
            ).collect()
        }
        bounded = {
            tuple(r)
            for r in ngram_jaccard_pairs(
                docs, k=3, threshold=0.2, max_doc_freq=n + 1, score=score
            ).collect()
        }
        assert exact == bounded and len(exact) > 0
