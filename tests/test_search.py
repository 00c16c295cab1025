"""BM25 serving-split tests: the persisted index answers identically to
the in-memory build, agrees with the oracle-checked one-shot query, and
bucket partitioning provably prunes — a query touches only its terms'
bucket directories."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from canvas_data_aws_spark.operators.search import Bm25Index, bm25_index, bm25_query
from canvas_data_aws_spark.sources.parquet import load_table

TERMS = ["data", "learning", "model"]


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def test_bm25_query_matches_oneshot_registry_query(spark, sf_dir):
    """Same normalization, same constants: the serving split must score
    identically to the oracle-checked text_bm25_search formulation."""
    from canvas_data_aws_spark.plans.registry import all_queries

    idx = bm25_index(_docs(spark, sf_dir))
    served = sorted(map(tuple, bm25_query(idx, TERMS, k=10).collect()))
    oneshot = sorted(
        map(tuple, all_queries()["text_bm25_search"].fn(spark, sf_dir).collect())
    )
    assert served == oneshot


def test_bm25_bucket_pruning(spark, sf_dir, tmp_path):
    """Corrupt every NON-target bucket directory of the persisted postings
    table; the query must still answer (and match the in-memory path) —
    proof that the literal bucket IN prunes statically to the query
    terms' buckets."""
    from canvas_data_aws_spark.operators.search import term_bucket

    idx = bm25_index(_docs(spark, sf_dir), n_buckets=16)
    d = str(tmp_path / "bm25_tf")
    idx.tf.write.partitionBy("bucket").mode("overwrite").parquet(d)
    spark.catalog.clearCache()
    on_disk = Bm25Index(
        tf=spark.read.parquet(d),
        dl=idx.dl,
        stats=idx.stats,
        n_buckets=16,
    )
    expected = sorted(map(tuple, bm25_query(idx, TERMS, k=10).collect()))

    tdf = spark.createDataFrame([(t,) for t in TERMS], ["term"])
    target = {
        r["b"] for r in tdf.select(term_bucket(F.col("term"), 16).alias("b")).collect()
    }
    corrupted = 0
    for bucket_dir in glob.glob(os.path.join(d, "bucket=*")):
        bucket_val = int(bucket_dir.rsplit("=", 1)[1])
        if bucket_val in target:
            continue
        for f in glob.glob(os.path.join(bucket_dir, "*.parquet")):
            with open(f, "wb") as fh:
                fh.write(b"corrupt")
            corrupted += 1
    assert corrupted > 0, "fixture degenerated: every bucket is a target"

    got = sorted(map(tuple, bm25_query(on_disk, TERMS, k=10).collect()))
    assert got == expected


def test_bm25_query_empty_terms(spark, sf_dir):
    """An empty query must return an empty (id, bm25) frame with the
    contract schema — not crash in schema inference on an empty list
    (regression: public serving API edge)."""
    from canvas_data_aws_spark.operators.search import bm25_index, bm25_query
    from canvas_data_aws_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    idx = bm25_index(docs, id_col="doc_id", text_col="text")
    out = bm25_query(idx, [])
    assert out.columns == ["doc_id", "bm25"]
    assert out.count() == 0


def test_bm25_merge_equals_one_shot(spark, sf_dir):
    """bm25_merge(bm25_index(A), B) == bm25_index(A ∪ B): per-doc postings
    and lengths are row-local, and the corpus scalar is recomputed over the
    merged lengths — so the incremental index serves identical results."""
    import pyspark.sql.functions as F

    from canvas_data_aws_spark.operators.search import bm25_index, bm25_merge, bm25_query
    from canvas_data_aws_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") < 400)
    delta = docs.filter(F.col("doc_id") >= 400)
    merged = bm25_merge(bm25_index(base, id_col="doc_id"), delta)
    one_shot = bm25_index(docs, id_col="doc_id")
    terms = ["data", "learning", "model"]
    a = sorted(map(tuple, bm25_query(merged, terms, k=10).collect()))
    b = sorted(map(tuple, bm25_query(one_shot, terms, k=10).collect()))
    assert a == b and len(a) == 10
    # postings/lengths are exactly the union — no doc double-counted
    assert merged.dl.count() == docs.count()
    assert merged.tf.exceptAll(one_shot.tf).count() == 0
    assert one_shot.tf.exceptAll(merged.tf).count() == 0


def test_bm25_merge_rejects_duplicate_ids(spark, sf_dir):
    """Re-ingesting an existing id must raise, not silently double-count
    n_docs/avgdl and duplicate query rows (round-6 advice)."""
    import pytest

    from canvas_data_aws_spark.operators.search import bm25_index, bm25_merge
    from canvas_data_aws_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents").limit(30)
    idx = bm25_index(docs, id_col="doc_id")
    with pytest.raises(ValueError, match="already present"):
        bm25_merge(idx, docs.limit(5))


def test_bm25_merge_rejects_internal_duplicate_ids(spark, sf_dir):
    """A batch whose rows duplicate an id INTERNALLY passes the
    index-disjointness probe yet still double-counts n_docs/avgdl — the
    merge must probe the batch itself too (round-7 advice)."""
    import pyspark.sql.functions as F
    import pytest

    from canvas_data_aws_spark.operators.search import bm25_index, bm25_merge
    from canvas_data_aws_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    idx = bm25_index(docs.filter(F.col("doc_id") < 100), id_col="doc_id")
    fresh = docs.filter(F.col("doc_id").between(100, 110))
    with pytest.raises(ValueError, match="duplicate ids within the batch"):
        bm25_merge(idx, fresh.unionAll(fresh.limit(1)))
