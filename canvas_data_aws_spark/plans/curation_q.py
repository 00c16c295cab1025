"""Corpus-curation queries: decontamination, quality filtering, splits,
n-gram tables, corpus stats (training-data-pipeline extension scope).

Every operator here is exact and engine-portable (shingles are plain
strings, the split bucket is pure arithmetic), so each carries a full
DuckDB oracle — no rows-only entries in this module.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from canvas_data_aws_spark.operators.curation import (
    corpus_stats,
    decontaminate,
    deterministic_split,
    ngram_top_k,
    quality_filter,
)
from canvas_data_aws_spark.plans.registry import register
from canvas_data_aws_spark.sources.parquet import load_table

#: DuckDB k-word shingle CTE fragment (matches operators/dedup.word_shingles:
#: normalize -> split -> k-slide -> distinct). Verified token-identical to
#: the Spark formulation on the documents fixture.
_SHINGLES_CTE = r"""
w AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS words
  FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(words[i:i+{km1}], ' ')
                        FOR i IN generate_series(1, greatest(len(words)-{km1}, 0))]) AS shingles
  FROM w
)
"""


@register(
    "corpus_decontaminate",
    "WITH "
    + _SHINGLES_CTE.format(km1=7)
    + """,
    ev AS (SELECT DISTINCT unnest(shingles) AS shingle FROM sh WHERE doc_id % 20 = 0),
    tr AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh WHERE doc_id % 20 <> 0),
    hits AS (SELECT tr.doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM tr
             JOIN ev USING (shingle) GROUP BY tr.doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(h.n, 0) AS BIGINT) AS n_eval_hits,
           COALESCE(h.n, 0) >= 1 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 20 <> 0) d
    LEFT JOIN hits h USING (doc_id)
    """,
    doc="Eval-set decontamination: train docs sharing >=1 distinct 8-word "
    "shingle with the eval slice are flagged. The eval shingle universe "
    "broadcasts (eval suites are tiny); the corpus side is one scan + one "
    "per-doc rollup — no corpus-vs-corpus pairing.",
)
def corpus_decontaminate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0)
    return decontaminate(train, eval_df, k=8, min_hits=1)


@register(
    "corpus_quality_filter",
    r"""
    WITH f AS (
      SELECT doc_id,
             LENGTH(text) AS n_chars,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
             len(regexp_extract_all(text, '[^\w\s]')) AS n_punct,
             len(regexp_extract_all(lower(text), '\bthe\b'))
               + len(regexp_extract_all(lower(text), '\band\b'))
               + len(regexp_extract_all(lower(text), '\bof\b')) AS n_stop
      FROM documents
    ),
    r AS (
      SELECT doc_id,
             n_chars BETWEEN 100 AND 1000000 AS r_len,
             ROUND((n_chars - n_tokens + 1) / n_tokens, 6) BETWEEN 3.0 AND 10.0 AS r_word_len,
             ROUND(n_punct / GREATEST(n_chars, 1), 6) <= 0.2 AS r_punct,
             ROUND(n_stop / GREATEST(n_tokens, 1), 6) >= 0.01 AS r_stop
      FROM f
    )
    SELECT doc_id, r_len, r_word_len, r_punct, r_stop,
           r_len AND r_word_len AND r_punct AND r_stop AS keep
    FROM r
    """,
    doc="C4/Gopher-style quality-filter chain: per-rule boolean columns "
    "(length, mean word length, punctuation ratio, stopword ratio) plus "
    "the keep conjunction — row-local, one scan, filter-rate accountable.",
)
def corpus_quality_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = quality_filter(docs, min_stop_ratio=0.01)
    return out.select("doc_id", "r_len", "r_word_len", "r_punct", "r_stop", "keep")


@register(
    "corpus_split",
    f"""
    SELECT doc_id,
           (doc_id * 1103515245 + 12345) % 1000 AS split_bucket,
           CASE WHEN (doc_id * 1103515245 + 12345) % 1000 < 800 THEN 'train'
                WHEN (doc_id * 1103515245 + 12345) % 1000 < 900 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    doc="Deterministic train/val/test split: pure-arithmetic LCG bucket of "
    "the id — engine-portable, stable under corpus growth (no randomSplit "
    "reshuffling), no shuffle at all (row-local projection).",
)
def corpus_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return deterministic_split(docs, "doc_id").select("doc_id", "split_bucket", "split")


@register(
    "corpus_ngram_top_k",
    "WITH "
    + _SHINGLES_CTE.format(km1=1)
    + """
    SELECT ngram, CAST(COUNT(*) AS BIGINT) AS doc_freq
    FROM (SELECT doc_id, unnest(shingles) AS ngram FROM sh)
    GROUP BY ngram
    ORDER BY doc_freq DESC, ngram
    LIMIT 100
    """,
    doc="Top-100 bigram document-frequency table (contamination scans, "
    "boilerplate detection): explode -> partial-agg count; the shuffle "
    "carries (ngram, partial count) pairs, never documents. Deterministic "
    "order (freq DESC, ngram ASC) fuses to TakeOrderedAndProject.",
)
def corpus_ngram_top_k_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ngram_top_k(docs, n=2, top=100)


@register(
    "corpus_stats",
    r"""
    WITH per_doc AS (
      SELECT LENGTH(text) AS n_chars,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
      FROM documents
    ),
    vocab AS (
      SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS vocab_size
      FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
            FROM documents)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(AVG(n_tokens), 6) AS avg_doc_tokens,
           (SELECT vocab_size FROM vocab) AS vocab_size
    FROM per_doc
    """,
    doc="One-row corpus summary (docs, chars, tokens, vocabulary, mean doc "
    "length): single scan + global aggregate; only the vocabulary distinct "
    "shuffles tokens.",
)
def corpus_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return corpus_stats(docs)
