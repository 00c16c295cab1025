"""Distributed BM25 keyword search with a persistable, bucket-pruned index.

The one-shot relational formulation lives in ``plans/llm_q.py::
text_bm25_search`` (exact DuckDB oracle). This module is the SERVING
split — the same architecture as ``similarity.py``'s ivf_index/ivf_query:

- ``bm25_index(docs)`` builds the index DataFrames once (write-time cost):
  per-(doc, term) frequencies bucketed by a hash of the term, document
  lengths, and the (n_docs, avgdl) corpus scalar.
- Persist ``tf`` partitioned by ``bucket`` (bounded directory count — a
  per-TERM layout would explode into millions of directories, the classic
  high-cardinality-partitioning anti-pattern).
- ``bm25_query(index, terms)`` touches only the bucket directories of the
  query's terms: the bucket predicate is a LITERAL ``IN`` list, so the
  pruning is static partition pruning at plan time — no dynamic filter, no
  extra jobs over the corpus-sized table
  (tests/test_search.py::test_bm25_bucket_pruning corrupts every
  non-target bucket and queries anyway, the same proof shape as the IVF
  cell-pruning test).

At 100 TB the index build is one explode + two aggregations (linear, all
map-side combined); query cost is bounded by posting-list size of the
query terms, never corpus size.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import Column, DataFrame


def _norm_terms(col: Column) -> Column:
    return F.split(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")), " ")


@dataclass
class Bm25Index:
    tf: DataFrame  # (doc_id, term, bucket, tf)
    dl: DataFrame  # (doc_id, dl)
    stats: DataFrame  # single row: (n_docs, avgdl)
    n_buckets: int
    id_col: str = "doc_id"


def term_bucket(term: Column, n_buckets: int) -> Column:
    """Stable bucket assignment for a term — identical expression at index
    and query time (Spark's murmur hash is deterministic per version/seed,
    which is sufficient: the bucket is an internal layout detail, never a
    semantic output)."""
    return F.pmod(F.hash(term), F.lit(n_buckets))


def bm25_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> Bm25Index:
    toks = docs.select(
        F.col(id_col), F.explode(_norm_terms(F.col(text_col))).alias("term")
    ).filter(F.length("term") > 0)
    tf = (
        toks.groupBy(id_col, "term")
        .agg(F.count("*").cast("double").alias("tf"))
        .withColumn("bucket", term_bucket(F.col("term"), n_buckets))
    )
    dl = toks.groupBy(id_col).agg(F.count("*").cast("double").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    return Bm25Index(tf=tf, dl=dl, stats=stats, n_buckets=n_buckets, id_col=id_col)


def bm25_merge(
    index: Bm25Index,
    new_docs: DataFrame,
    text_col: str = "text",
) -> Bm25Index:
    """Incrementally add documents to a BM25 index — the daily-ingest
    maintenance path for the sparse serving stack (the dense mirror is
    ``similarity.ivf_upsert``). Per-document postings (tf) and lengths (dl)
    are PURE row-local functions of each new document, so the merge is an
    append-shaped union: at scale, new parquet files land in the existing
    term-bucket partitions and no stored posting is rewritten. Only the
    corpus-level (n_docs, avgdl) scalar is recomputed — one aggregate over
    the merged dl table (and it must be: avgdl is a corpus statistic, so
    BM25 scores of OLD documents legitimately shift as the corpus grows;
    caching the old scalar would serve stale relevance).

    Exactness contract (tested): ``bm25_merge(bm25_index(A), B)`` equals
    ``bm25_index(A ∪ B)`` — identical postings, identical stats, identical
    query results — because nothing in the per-doc tables depends on the
    rest of the corpus."""
    if index.n_buckets <= 0:
        raise ValueError("index.n_buckets must be positive")
    # Guard id-disjointness: a re-ingested id would union a SECOND set of
    # tf/dl rows, double-counting in n_docs/avgdl and returning duplicate id
    # rows from bm25_query — silent relevance corruption on the daily-ingest
    # path. The check is one bounded semi-join count (dl is one row per doc).
    dup = (
        new_docs.select(F.col(index.id_col))
        .join(index.dl.select(index.id_col), index.id_col, "left_semi")
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError(
            "bm25_merge: new_docs contains ids already present in the index; "
            "delete-then-merge or dedup upstream (blind union double-counts "
            "n_docs/avgdl and duplicates query results)"
        )
    # ... and INTERNAL duplicates within the batch itself: two rows sharing
    # an id would pass the disjointness probe yet still double-count
    # n_docs/avgdl and surface duplicate ids from bm25_query. One bounded
    # aggregate (groupBy id, first count>1, limit 1).
    internal = (
        new_docs.groupBy(index.id_col)
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") > 1)
        .limit(1)
        .count()
    )
    if internal:
        raise ValueError(
            "bm25_merge: new_docs contains duplicate ids within the batch; "
            "dedup upstream (duplicates double-count n_docs/avgdl and "
            "duplicate query results)"
        )
    fresh = bm25_index(
        new_docs, text_col=text_col, id_col=index.id_col, n_buckets=index.n_buckets
    )
    tf = index.tf.unionByName(fresh.tf)
    dl = index.dl.unionByName(fresh.dl)
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    return Bm25Index(
        tf=tf, dl=dl, stats=stats, n_buckets=index.n_buckets, id_col=index.id_col
    )


def bm25_query(
    index: Bm25Index,
    terms: list[str],
    k: int = 10,
    k1: float = 1.5,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for a bag of query terms under Okapi BM25.

    The bucket list for the literal terms is computed with one
    LocalTableScan-only job (rows = query terms; no data files touched),
    then pushed as a literal IN over the partition column — static
    pruning, so only those bucket directories of a persisted index are
    ever listed or read."""
    spark = index.tf.sparkSession
    terms = sorted(set(terms))
    if not terms:
        # Public serving API: an empty query has no postings to score —
        # return an empty (id, bm25) frame with the contract schema instead
        # of crashing in schema inference / an empty IN list.
        id_field = index.tf.schema[index.id_col]
        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField(index.id_col, id_field.dataType, True),
                    T.StructField("bm25", T.DoubleType(), True),
                ]
            ),
        )
    tdf = spark.createDataFrame([(t,) for t in terms], ["term"])
    buckets = [
        r["b"]
        for r in tdf.select(
            term_bucket(F.col("term"), index.n_buckets).alias("b")
        ).distinct().collect()
    ]
    postings = index.tf.filter(
        F.col("bucket").isin(buckets) & F.col("term").isin(terms)
    )
    df_t = postings.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    denom = F.col("tf") + k1 * ((1 - b) + b * F.col("dl") / F.col("avgdl"))
    scored = (
        postings.join(df_t, "term")
        .join(index.dl, index.id_col)
        .crossJoin(F.broadcast(index.stats))  # single-row scalar
        .groupBy(index.id_col)
        .agg(F.sum(idf * (F.col("tf") * (k1 + 1.0)) / denom).alias("score"))
    )
    return (
        scored.select(index.id_col, F.round("score", 4).alias("bm25"))
        .orderBy(F.col("bm25").desc(), index.id_col)
        .limit(k)
    )
