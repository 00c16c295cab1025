"""Corpus-curation queries beyond pairwise ops: duplicate clustering,
deterministic sampling, and sharded export — the remaining steps between
"scored documents" and "training-ready dataset"."""

from __future__ import annotations

import hashlib
import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from canvas_data_aws_spark.operators.clustering import connected_components
from canvas_data_aws_spark.operators.dedup import ngram_jaccard_pairs
from canvas_data_aws_spark.plans.registry import register
from canvas_data_aws_spark.sources.parquet import load_table

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

_EDGE_CTE = f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)]) AS shingles
      FROM (SELECT doc_id, string_split({_NORM}, ' ') AS words FROM documents)
    ),
    ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh),
    edges AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING COUNT(*) / (ANY_VALUE(a.n_sh) + ANY_VALUE(b.n_sh) - COUNT(*)) >= 0.2
    )
"""


@register(
    "dedup_cluster",
    _EDGE_CTE.replace("WITH sh", "WITH RECURSIVE sh", 1)
    + """
    , bidir AS (
      SELECT id_a AS src, id_b AS dst FROM edges
      UNION SELECT id_b, id_a FROM edges
    ),
    walk(v, lab) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT b.dst, w.lab FROM walk w JOIN bidir b ON b.src = w.v
    )
    SELECT v AS doc_id, MIN(lab) AS component
    FROM walk GROUP BY v
    """,
    doc="Near-dup clustering: connected components (min-label propagation as "
    "iterative DataFrame joins) over the exact-Jaccard pair graph; the "
    "DuckDB oracle re-derives components via a recursive CTE — an "
    "iterative algorithm value-checked end-to-end.",
    tags=("iterative",),
)
def dedup_cluster_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(docs, k=3, threshold=0.2).select("id_a", "id_b")
    return connected_components(
        docs.select(F.col("doc_id").alias("id")), edges, vertex_col="id"
    ).select(F.col("id").alias("doc_id"), "component")


@register(
    "corpus_sample_systematic",
    """
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE doc_id % 10 = 3
    """,
    doc="Deterministic 10% systematic sample by key residue — reproducible "
    "across engines and runs (unlike Bernoulli sampling, whose RNG stream "
    "is engine-specific); the sampling predicate pushes down to the scan.",
)
def corpus_sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 3)
        .select("doc_id", "lang", "n_chars")
    )


@register(
    "corpus_shard_export",
    """
    SELECT CAST(doc_id % 8 AS BIGINT) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
    """,
    doc="Training-shard export: documents hashed into 8 shards, written as a "
    "partitioned dataset, read back and summarized — the write path a "
    "dataloader consumes (partitionBy = shard manifest).",
)
def corpus_shard_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "shard", (F.col("doc_id") % 8).cast("bigint")
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    out = os.path.join(tempfile.gettempdir(), f"cda_shards_{tag}")
    docs.write.mode("overwrite").partitionBy("shard").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy(F.col("shard").cast("bigint").alias("shard")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
