"""Doc-frequency pruning knob for the inverted-index Jaccard join: recall
of high-similarity pairs survives pruning of non-discriminating shingles."""

from __future__ import annotations

from canvas_data_aws_spark.operators.dedup import ngram_jaccard_pairs
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
