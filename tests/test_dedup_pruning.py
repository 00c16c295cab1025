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
