"""B.10 + training-data-pipeline operators (SURVEY.md §2, M6):
deduplication tiers, similarity search, text analysis, multimodal plumbing.

Exact operators (exact dedup, n-gram Jaccard, brute-force cosine, text
stats, fingerprints, even the deterministic multimodal decode stub) carry
full DuckDB oracles; sketch/seed-dependent operators (MinHash-LSH, SimHash
via xxhash64, KMeans-IVF) are rows-only by nature — their guarantees are
probabilistic, not value-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from canvas_data_aws_spark.operators.dedup import (
    dedup_exact,
    line_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from canvas_data_aws_spark.operators.multimodal import (
    documents_as_media,
    extract_features,
    frame_sample,
    resize_images,
)
from canvas_data_aws_spark.operators.similarity import (
    cosine_topk_bruteforce,
    embedding_near_dup_pairs,
    ivf_topk,
)
from canvas_data_aws_spark.operators.text import (
    fingerprint_rolling,
    lang_id,
    quality_features,
    token_count_bpe_ish,
    token_count_whitespace,
)
from canvas_data_aws_spark.plans.registry import register
from canvas_data_aws_spark.sources.parquet import load_table

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@register(
    "dedup_exact",
    f"""
    SELECT MIN(doc_id) AS kept_id, COUNT(*) AS n_copies
    FROM documents
    GROUP BY {_NORM}
    """,
    doc="Exact dedup: hash-groupBy on sha2(normalized text), keep min id "
    "(tier 1 of the dedup cascade).",
)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_exact(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)]) AS shingles
      FROM (SELECT doc_id, string_split({_NORM}, ' ') AS words FROM documents)
    ),
    ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             ANY_VALUE(a.n_sh) AS n_a, ANY_VALUE(b.n_sh) AS n_b,
             COUNT(*) AS inter
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           ROUND(inter / (n_a + n_b - inter), 6) AS jaccard
    FROM pairs
    WHERE inter / (n_a + n_b - inter) >= 0.2
    """,
    doc="Exact 3-word-shingle Jaccard similarity join via inverted index "
    "(tier 2): candidate pairs from a shingle equi-join, never all-pairs.",
)
def dedup_ngram_jaccard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), k=3, threshold=0.2
    )


# Doc-frequency caps for the BOUNDED inverted-index mode: shingles in more
# than this many docs are dropped from candidate generation. Chosen from
# the measured recall-vs-prune curve at sf0.1 (DuckDB sweep; the fixture
# vocabulary is tiny so its doc-freq distribution — max=25/p50=9/p99=18 —
# is far flatter than a Zipfian web corpus, making these caps the
# CONSERVATIVE end of the trade):
#   cap=12: jaccard recall 0.980, candidate-pair mass 0.63x exact
#   cap=14: containment recall 0.953, candidate mass 0.82x
#   (cap=10 guts containment to 0.016 — its high scorers are SMALL docs
#    whose few shingles are exactly the corpus-common ones)
# Containment gets the higher cap because its score divides by min(|A|,|B|):
# every pruned intersection shingle costs it 1/min vs jaccard's 1/union.
_JACCARD_MAX_DOC_FREQ = 12
_CONTAINMENT_MAX_DOC_FREQ = 14


def _bounded_ngram_ctes(cap: int) -> str:
    return f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)]) AS shingles
      FROM (SELECT doc_id, string_split({_NORM}, ' ') AS words FROM documents)
    ),
    ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh),
    rare AS (
      SELECT shingle FROM ex GROUP BY shingle
      HAVING COUNT(*) <= {cap}
    ),
    exr AS (SELECT ex.* FROM ex JOIN rare USING (shingle)),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             ANY_VALUE(a.n_sh) AS n_a, ANY_VALUE(b.n_sh) AS n_b,
             COUNT(*) AS inter
      FROM exr a JOIN exr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
"""


@register(
    "dedup_ngram_jaccard_bounded",
    _bounded_ngram_ctes(_JACCARD_MAX_DOC_FREQ)
    + """
    SELECT id_a, id_b,
           ROUND(inter / (n_a + n_b - inter), 6) AS jaccard
    FROM pairs
    WHERE inter / (n_a + n_b - inter) >= 0.2
    """,
    doc="The BOUNDED mode of dedup_ngram_jaccard — the documented 100 TB "
    "contract, now an oracle-checked entry instead of prose: shingles with "
    f"doc-frequency > {_JACCARD_MAX_DOC_FREQ} are dropped from candidate "
    "generation, bounding the inverted-index join fan-out to "
    "O(max_doc_freq²) per shingle while |A|,|B| keep the full universe "
    "(jaccard becomes a deterministic lower bound — still SQL-expressible, "
    "so this mode is exact-oracle-green). Measured at sf0.1: recall 0.980 "
    "vs exact mode, candidate-pair mass 0.63x; recall floor pinned by "
    "tests/test_dedup_pruning.py::test_registry_bounded_modes_recall. "
    "operators/dedup.py::ngram_jaccard_pairs(max_doc_freq=...).",
    tags=("llm", "dedup"),
)
def dedup_ngram_jaccard_bounded_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"),
        k=3,
        threshold=0.2,
        max_doc_freq=_JACCARD_MAX_DOC_FREQ,
    )


@register(
    "dedup_containment_bounded",
    _bounded_ngram_ctes(_CONTAINMENT_MAX_DOC_FREQ)
    + """
    SELECT id_a, id_b,
           ROUND(inter / LEAST(n_a, n_b), 6) AS containment
    FROM pairs
    WHERE inter / LEAST(n_a, n_b) >= 0.6
    """,
    doc="Bounded mode of dedup_containment: same max_doc_freq candidate "
    f"pruning at cap {_CONTAINMENT_MAX_DOC_FREQ} — higher than the jaccard "
    "cap because containment divides by min(|A|,|B|), so each pruned "
    "intersection shingle costs recall faster (measured at sf0.1: cap 14 "
    "keeps recall 0.953 at 0.82x candidate mass; cap 10 collapses it to "
    "0.016). Containment stays a deterministic lower bound over the pruned "
    "universe; floor pinned by "
    "tests/test_dedup_pruning.py::test_registry_bounded_modes_recall. "
    "operators/dedup.py::ngram_jaccard_pairs(score='containment', "
    "max_doc_freq=...).",
    tags=("llm", "dedup"),
)
def dedup_containment_bounded_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"),
        k=3,
        threshold=0.6,
        score="containment",
        max_doc_freq=_CONTAINMENT_MAX_DOC_FREQ,
    )


@register(
    "corpus_line_dedup",
    f"""
    WITH w AS (SELECT doc_id, string_split({_NORM}, ' ') AS words FROM documents),
    l AS (
      SELECT doc_id, i AS pos, array_to_string(words[i:i+9], ' ') AS line
      FROM w, UNNEST(range(1, greatest(len(words), 1) + 1, 10)) AS t(i)
    ),
    dup AS (
      SELECT line FROM l WHERE line <> ''
      GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    m AS (SELECT l.*, (d.line IS NOT NULL) AS dup FROM l LEFT JOIN dup d USING (line))
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           COALESCE(string_agg(line, ' ' ORDER BY pos) FILTER (WHERE NOT dup), '')
             AS text_clean
    FROM m GROUP BY doc_id
    """,
    doc="C4/RefinedWeb-style cross-document LINE-level dedup: drop every "
    "line whose normalized form occurs in >= 2 distinct documents, rebuild "
    "documents from surviving lines in order — the standard boilerplate-"
    "strip stage (headers, banners, license blurbs) between exact dedup "
    "and near-dup in an LLM curation cascade. The fixture corpus has no "
    "newline structure, so 'lines' are aligned 10-word windows of the "
    "normalized text (mode='chunk'; the newline mode is the production "
    "default, unit-tested on synthetic multi-line docs). Fully "
    "deterministic: doc-freq counting groups on md5 digests (the exchange "
    "ships digests, never line text); at sf0.01 the rule drops 278 line "
    "instances across 96 docs. operators/dedup.py::line_dedup.",
    tags=("llm", "dedup"),
)
def corpus_line_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return line_dedup(
        load_table(spark, sf_dir, "documents"), min_doc_freq=2, mode="chunk",
        chunk_words=10,
    )


@register(
    "dedup_embedding_cosine_blocked",
    None,  # k-means cell assignment is seed/iteration-dependent — rows-only
    doc="The SCALE path of dedup_embedding_cosine, previously prose and now "
    "a registered operator: block_col comes from MULTI-PROBE (top-2) "
    "adaptive-k k-means cell assignment — the corpus_semdedup quantizer "
    "(k = max(8, n/1000)) with each vector probing its 2 nearest cells, "
    "because single assignment loses every cross-cell pair (measured "
    "recall 0.34 vs 0.77 at the fixture's cos>=0.3 regime; with adaptive "
    "k the per-pair work stays m²·1000·n — linear in corpus size). Pairs "
    "are verified with EXACT cosine inside each cell, so precision is 1; "
    "recall floor pinned by "
    "tests/test_dedup_pruning.py::test_embedding_blocked_recall_floor. "
    "Hyperplane LSH was measured and rejected for this threshold regime: "
    "at cos>=0.3 (angle ~72°) 10-bit signatures collide with "
    "p≈0.006 per table — LSH pruning only survives recall for "
    "genuinely-near duplicates (cos>=0.9); the fixture's max pair cosine "
    "is 0.51. operators/similarity.py::multiprobe_cells.",
    tags=("llm", "dedup", "similarity"),
    quality_test="tests/test_dedup_pruning.py::test_embedding_blocked_recall_floor",
)
def dedup_embedding_cosine_blocked_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.similarity import multiprobe_cells

    n = load_table(spark, sf_dir, "embeddings").count()
    k = max(_KMEANS_K, int(n) // 1000)
    assigned, ids, cents = _kmeans_assign(spark, sf_dir, k=k)
    probed = multiprobe_cells(
        assigned.select("vec_id", "__v"), ids, cents, m=2
    ).localCheckpoint(eager=True)
    # a pair probing two shared cells is found twice with the same exact
    # cosine — dedupe on the id pair only
    return embedding_near_dup_pairs(
        probed, id_col="vec_id", vec_col="__v", block_col="cell", threshold=0.3
    ).dropDuplicates(["id_a", "id_b"]).select("id_a", "id_b", "cos_sim")


@register(
    "dedup_simhash",
    None,  # xxhash64-based fingerprints are engine-specific — rows-only
    doc="SimHash near-dup candidates (tier 3): 64-bit locality hash, banded "
    "equi-join, exact Hamming verify — all JVM built-ins. bands=4 gives "
    "16-bit band keys (65k values — selective buckets) with guaranteed "
    "recall at hamming<=3; wider hamming budgets need more bands, whose "
    "narrower keys collapse into few hot buckets (bands=8 -> 256 8-bit "
    "values -> near-quadratic candidates; measured 10.7s vs 0.9s at sf0.1).",
    quality_test="tests/test_llm_ops.py::test_simhash_finds_high_jaccard_pairs",
)
def dedup_simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_near_dup_pairs(
        load_table(spark, sf_dir, "documents"), max_hamming=3, bands=4, max_band_freq=500
    )


@register(
    "dedup_minhash",
    None,  # MinHash signatures are seed/hash-specific — rows-only
    doc="MinHash+LSH near-dup pairs (tier 4): Carter-Wegman 64-component "
    "signatures as one grouped aggregation, banded candidate join shipping "
    "(id, band) only, full-signature Jaccard estimate filter "
    "(operators/dedup.py::minhash_lsh_pairs).",
    quality_test="tests/test_llm_ops.py::test_minhash_recall_against_exact_jaccard",
)
def dedup_minhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), jaccard_threshold=0.2, max_band_freq=500
    )


@register(
    "dedup_embedding_cosine",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
    FROM embeddings a
    JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.3
    """,
    doc="Semantic near-dup pairs (tier 5): cosine over embeddings, "
    "label-blocked (the block stands in for an LSH/IVF bucket at scale).",
)
def dedup_embedding_cosine_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_near_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), block_col="label", threshold=0.3
    )


@register(
    "sim_search_cosine",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id,
             ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          CAST(q.qvec AS DOUBLE[])), 6) AS cos_sim
      FROM embeddings e CROSS JOIN q
    ),
    ranked AS (
      SELECT query_id, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, cos_sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 10
    """,
    doc="Brute-force cosine top-10 for 5 query vectors: broadcast queries, "
    "single corpus scan, per-query top-k window (the exact baseline ANN "
    "variants are measured against).",
)
def sim_search_cosine_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = cosine_topk_bruteforce(emb, queries, k=10)
    return out.select("query_id", "vec_id", "cos_sim", F.col("rank").cast("int").alias("rank"))


@register(
    "sim_search_ivf",
    None,  # KMeans centroids are iterative/seed-dependent — rows-only
    doc="IVF approximate top-k (scale path): seeded KMeans coarse quantizer, "
    "nprobe=4 of 16 cells probed per query (~4x scan reduction; recall<1).",
    quality_test="tests/test_llm_ops.py::test_ivf_recall_against_bruteforce",
)
def sim_search_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.similarity import ivf_index, ivf_query

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # explicit index -> query split: the index DataFrames are what a
    # production run persists at write time; the query path adds no jobs
    idx = ivf_index(emb, n_clusters=16)
    return ivf_query(idx, queries, k=10, nprobe=4)


@register(
    "sim_search_ivf_upsert",
    None,  # KMeans centroids are iterative/seed-dependent — rows-only
    doc="IVF index MAINTENANCE path: build on the existing corpus, then "
    "ivf_upsert the day's new vectors — assignment against the FROZEN "
    "centroids (row-local Arrow argmax-GEMM), no recluster, existing cell "
    "partitions untouched. Equals the from-scratch index exactly when both "
    "fits see the same sample (tests/test_llm_ops.py::"
    "test_ivf_upsert_equals_one_shot); the query path is the standard "
    "zero-driver-action ivf_query.",
    quality_test="tests/test_llm_ops.py::test_ivf_upsert_equals_one_shot",
)
def sim_search_ivf_upsert_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.similarity import (
        ivf_index,
        ivf_query,
        ivf_upsert,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    # the fit sample is the lowest ids, so holding out the TOP decile keeps
    # the base index's quantizer identical to the full-corpus one
    cut = emb.agg(F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY vec_id)").alias("c"))
    base = emb.join(F.broadcast(cut), F.col("vec_id") <= F.col("c")).drop("c")
    delta = emb.join(F.broadcast(cut), F.col("vec_id") > F.col("c")).drop("c")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    idx = ivf_upsert(ivf_index(base, n_clusters=16), delta)
    return ivf_query(idx, queries, k=10, nprobe=4)


@register(
    "sim_search_lsh",
    None,  # hyperplane signatures are seed-dependent — rows-only
    doc="LSH approximate top-k (the bucketed scale path SURVEY names "
    "alongside IVF): signed-random-projection signatures, candidate "
    "equi-join on (table_no, sig) shipping ids only, exact cosine rescore "
    "of distinct candidates. operators/similarity.py::lsh_index/lsh_query.",
    quality_test="tests/test_llm_ops.py::test_lsh_recall_against_bruteforce",
)
def sim_search_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.similarity import lsh_index, lsh_query

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # dim passed explicitly (testdata embeddings are 64-wide) so even the
    # index build launches no discovery job; query path is pure plan
    idx = lsh_index(emb, n_tables=32, bits_per_table=6, dim=64)
    return lsh_query(idx, emb, queries, k=10)


_SCORE = {
    lang: (
        "len(regexp_extract_all(lower(text), '\\b(?:" + "|".join(words) + ")\\b'))"
    )
    for lang, words in {
        "en": ["the", "and", "of"],
        "fr": ["le", "la", "et"],
        "de": ["der", "und", "die"],
        "es": ["el", "los", "que"],
    }.items()
}

@register(
    "text_lang_id",
    f"""
    WITH s AS (
      SELECT doc_id, lang,
             {_SCORE['en']} AS s_en,
             {_SCORE['fr']} AS s_fr,
             {_SCORE['de']} AS s_de,
             {_SCORE['es']} AS s_es
      FROM documents
    )
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es AND s_en > 0 THEN 'en'
                WHEN s_fr >= s_de AND s_fr >= s_es AND s_fr > 0 THEN 'fr'
                WHEN s_de >= s_es AND s_de > 0 THEN 'de'
                WHEN s_es > 0 THEN 'es'
                ELSE 'und' END AS pred_lang
    FROM s
    """,
    doc="Heuristic language ID: argmax of stopword-anchor hits with pinned "
    "priority-order tie-breaking; emitted next to the labeled lang column.",
)
def text_lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.col("lang").alias("labeled_lang"), lang_id(F.col("text")).alias("pred_lang")
    )


@register(
    "text_quality",
    """
    WITH f AS (
      SELECT doc_id,
             LENGTH(text) AS n_chars,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
             len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
             len(regexp_extract_all(lower(text), '\\b(?:the|and|of)\\b')) AS n_stop
      FROM documents
    )
    SELECT doc_id, n_chars, n_tokens,
           ROUND(n_punct / GREATEST(n_chars, 1), 6)  AS punct_ratio,
           ROUND(n_stop / GREATEST(n_tokens, 1), 6)  AS stop_ratio,
           ROUND((n_chars - n_tokens + 1) / n_tokens, 6) AS mean_word_len,
           FLOOR((0.4 * LEAST(n_chars / 500.0, 1.0)
               + 0.3 * (CASE WHEN (n_chars - n_tokens + 1) / n_tokens >= 3
                              AND (n_chars - n_tokens + 1) / n_tokens <= 10
                             THEN 1.0 ELSE 0.0 END)
               + 0.3 * LEAST(ROUND(n_stop / GREATEST(n_tokens, 1), 6) * 5, 1.0)) * 1000000) / 1000000 AS q_score
    FROM f
    """,
    doc="Quality scoring: length/punctuation/stopword ratios + composite "
    "[0,1] score — one row-local scan, no shuffle.",
)
def text_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    feats = quality_features(d)
    return feats.select(
        "doc_id",
        F.col("q_n_chars").alias("n_chars"),
        F.col("q_n_tokens").alias("n_tokens"),
        F.col("q_punct_ratio").alias("punct_ratio"),
        F.col("q_stop_ratio").alias("stop_ratio"),
        F.col("q_mean_word_len").alias("mean_word_len"),
        "q_score",
    )


@register(
    "text_token_count",
    """
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens
    FROM documents
    """,
    doc="Token counting: whitespace tokens + BPE-ish pre-tokenizer regex "
    "(word pieces | numbers | single symbols).",
)
def text_token_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count_whitespace(F.col("text")).alias("n_ws_tokens"),
        token_count_bpe_ish(F.col("text")).alias("n_bpe_tokens"),
    )


@register(
    "doc_fingerprint",
    """
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(trim(lower(text)), ''), c -> CAST(ascii(c) AS BIGINT))),
             (a, b) -> (a * 131 + b) % 1000000007
           ) AS fingerprint
    FROM documents
    """,
    doc="Document fingerprint: polynomial rolling hash (base 131 mod 1e9+7) "
    "over the normalized character stream — engine-portable by construction, "
    "unlike murmur/xxhash.",
)
def doc_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint_rolling(F.col("text")).alias("fingerprint"))


@register(
    "multimodal_decode",
    """
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS modality,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           substr(sha256(text), 1, 8) AS sha256_prefix,
           CAST(64 + (ascii(substr(sha256(text), 1, 1)) * 7 + ascii(substr(sha256(text), 2, 1))) % 192 AS INT) AS width,
           CAST(64 + (ascii(substr(sha256(text), 3, 1)) * 7 + ascii(substr(sha256(text), 4, 1))) % 192 AS INT) AS height,
           CAST(1 + (ascii(substr(sha256(text), 5, 1)) * 7 + ascii(substr(sha256(text), 6, 1))) % 32 AS INT) AS n_frames
    FROM documents
    """,
    doc="Multimodal plumbing: opaque binary payloads + typed metadata decoded "
    "via Arrow-batched mapInPandas. The decoder is a clearly-marked "
    "deterministic stub (sha256-derived dims; real codecs absent here), so "
    "even the stub is oracle-checked; the dataflow is production-shaped.",
)
def multimodal_decode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return extract_features(media, strict=False)


@register(
    "multimodal_resize",
    """
    SELECT doc_id AS media_id,
           64 AS target_w,
           64 AS target_h,
           substr(sha256(text || ':64x64'), 1, 16) AS resized_sha256,
           CAST(64 * 64 * 3 AS BIGINT) AS n_bytes_out
    FROM documents
    WHERE doc_id % 3 = 0
    """,
    doc="Image-resize stub (mapInPandas 1:1): deterministic digest of "
    "payload+target box; image-modality rows only (doc_id % 3 = 0).",
)
def multimodal_resize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return resize_images(media, 64, 64, strict=False)


@register(
    "multimodal_frame_sample",
    None,  # 1:N expansion with per-frame blob hashing — rows-only
    doc="Video frame-sampling stub: 1:N mapInPandas expansion (every 10th "
    "frame), per-frame digest — the plumbing a real ffmpeg sampler would use.",
    quality_test="tests/test_llm_ops.py::test_multimodal_plumbing_shapes",
)
def multimodal_frame_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return frame_sample(media, every_n=10, strict=False)


@register(
    "text_repetition",
    f"""
    WITH g AS (
      SELECT doc_id,
             [array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)] AS grams
      FROM (SELECT doc_id, string_split({_NORM}, ' ') AS words FROM documents)
    )
    SELECT doc_id,
           CASE WHEN len(grams) <= 0 THEN 0.0
                ELSE ROUND(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 6)
           END AS rep_ratio
    FROM g
    """,
    doc="Gopher-style repetition quality rule: repeated-3-gram fraction per "
    "document (1 - distinct/total). Row-local array ops, zero shuffle "
    "(operators/text.py::repetition_score).",
)
def text_repetition_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.text import repetition_score

    docs = load_table(spark, sf_dir, "documents")
    return repetition_score(docs, k=3).select("doc_id", "rep_ratio")


@register(
    "text_pii_scrub",
    r"""
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(
             text || ' contact user' || doc_id || '@example.com or 555-123-4567 ssn 123-45-6789',
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
             '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g') AS clean_text
    FROM documents
    """,
    doc="PII redaction for corpus curation: email/phone/SSN patterns -> "
    "typed tokens via a codegen'd regexp_replace chain, no Python "
    "(operators/text.py::pii_scrub). The query injects deterministic PII "
    "per row so the oracle proves redaction actually fires, not just "
    "identity on clean text.",
)
def text_pii_scrub_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.text import pii_scrub

    docs = load_table(spark, sf_dir, "documents")
    dirty = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-123-4567 ssn 123-45-6789"),
    )
    return docs.select("doc_id", pii_scrub(dirty).alias("clean_text"))


@register(
    "corpus_bpe_merges",
    f"""
    WITH words AS (
      SELECT unnest(string_split({_NORM}, ' ')) AS w FROM documents
    ),
    pairs AS (
      SELECT unnest([w[i:i+1] for i in range(1, len(w))]) AS pair
      FROM words WHERE len(w) >= 2
    )
    SELECT pair, COUNT(*) AS n_occurrences
    FROM pairs GROUP BY pair
    ORDER BY n_occurrences DESC, pair LIMIT 20
    """,
    doc="Distributed BPE-trainer inner step: corpus-wide adjacent char-pair "
    "frequencies within words, top-20 merge candidates. One scan, map-side "
    "combine onto ~hundreds of keys, TakeOrdered top-k "
    "(operators/text.py::bpe_pair_counts).",
)
def corpus_bpe_merges_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.text import bpe_pair_counts

    return bpe_pair_counts(load_table(spark, sf_dir, "documents"), top_k=20)


@register(
    "sim_knn_join",
    """
    WITH scored AS (
      SELECT q.vec_id AS query_id, e.vec_id,
             ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          CAST(q.embedding AS DOUBLE[])), 6) AS cos_sim
      FROM embeddings q CROSS JOIN embeddings e
      WHERE e.vec_id <> q.vec_id
    ),
    ranked AS (
      SELECT query_id, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, cos_sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 3
    """,
    doc="Exact k-NN self-join (every vector -> 3 nearest neighbors): "
    "block-pair GEMM entirely on executors — the corpus is hash-blocked, "
    "every block pair meets via groupBy(qb, cb) + applyInPandas, each "
    "pairing emits only its local top-k, and the merge window sees "
    "k*n_blocks candidates per query instead of the n^2 score matrix "
    "(operators/similarity.py::knn_join_self). Zero driver "
    "materialization — plan construction launches no jobs (audited). The "
    "exact counterpart of the ANN paths, and the oracle-checked one.",
    tags=("llm", "similarity"),
)
def sim_knn_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.similarity import knn_join_self

    emb = load_table(spark, sf_dir, "embeddings")
    out = knn_join_self(emb, k=3, n_blocks=4, exclude_self=True)
    return out.select("query_id", "vec_id", "cos_sim", F.col("rank").cast("int").alias("rank"))


@register(
    "embed_normalize_quantize",
    """
    WITH normed AS (
      SELECT vec_id,
             sqrt(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
                                                x -> x * x), 'sum')) AS l2_norm,
             CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
    )
    SELECT vec_id,
           CAST(len(v) AS INT) AS n_dims,
           ROUND(l2_norm, 6) AS l2_norm,
           list_transform(v, x -> CAST(ROUND(x / l2_norm * 127) AS TINYINT)) AS q8
    FROM normed
    """,
    doc="Row-local embedding maintenance: L2 norm (JVM aggregate over the "
    "array), unit-normalize, symmetric int8 quantization (x/norm*127) — the "
    "storage-shrink step before ANN indexing, 4x smaller vectors. Zero "
    "shuffle; int8 output keeps the oracle comparison exact.",
    tags=("llm", "similarity"),
)
def embed_normalize_quantize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return (
        emb.withColumn("__v", v)
        .withColumn("__norm", norm)
        .select(
            "vec_id",
            F.size("__v").cast("int").alias("n_dims"),
            F.round(F.col("__norm"), 6).alias("l2_norm"),
            F.transform(
                F.col("__v"),
                lambda x: F.round(x / F.col("__norm") * 127, 0).cast("tinyint"),
            ).alias("q8"),
        )
    )


def _kmeans_cte_sql(k: int, iters: int) -> str:
    """Unrolled Lloyd's iterations as chained CTEs (DuckDB list ops): the
    same deterministic init (k lowest vec_id), assignment (min squared
    distance, ties to the lower cluster id) and element-wise-mean update as
    the Spark path, so the final partition is value-comparable. Ends with
    the assignment CTE ``a{iters}`` open for composition."""
    parts = [
        f"""c0 AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster,
             embedding AS centroid
      FROM embeddings ORDER BY vec_id LIMIT {k}
    )"""
    ]
    prev = "c0"
    for i in range(1, iters + 1):
        parts.append(
            f"""a{i} AS (
      SELECT vec_id, cluster FROM (
        SELECT e.vec_id, c.cluster,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_distance(e.embedding::DOUBLE[],
                                        c.centroid::DOUBLE[]), c.cluster
               ) AS rk
        FROM embeddings e CROSS JOIN {prev} c
      ) WHERE rk = 1
    )"""
        )
        parts.append(
            f"""c{i} AS (
      SELECT cluster, list(m ORDER BY pos) AS centroid FROM (
        SELECT q.cluster, q.pos, AVG(q.val) AS m FROM (
          SELECT a2.cluster, unnest(e.embedding::DOUBLE[]) AS val,
                 generate_subscripts(e.embedding, 1) AS pos
          FROM a{i} a2 JOIN embeddings e USING (vec_id)
        ) q GROUP BY q.cluster, q.pos
      ) GROUP BY cluster
    )"""
        )
        prev = f"c{i}"
    return "WITH " + ",".join(parts)


def _kmeans_oracle_sql(k: int, iters: int) -> str:
    """Unrolled Lloyd's + the final (sizes, centroid-norm) report."""
    return (
        _kmeans_cte_sql(k, iters)
        + f"""
    SELECT a.cluster, COUNT(*) AS n_vecs,
           ROUND(sqrt(list_aggregate(
             list_transform(c.centroid, x -> x*x), 'sum')), 4) AS centroid_norm
    FROM a{iters} a JOIN c{iters} c USING (cluster)
    GROUP BY a.cluster, c.centroid
    """
    )


_KMEANS_K = 8
_KMEANS_ITERS = 3


def _kmeans_assign(
    spark: SparkSession, sf_dir: str, k: int | None = None
) -> tuple[DataFrame, list[int], list[list[float]]]:
    """Shared Lloyd's driver: returns (assigned DF with vec_id/__v/cluster,
    final cluster ids, final centroids). Consumed by embed_kmeans /
    embed_outlier_scores (fixed k — their report IS the k=8 contract) and
    corpus_semdedup (adaptive k: cluster-size-bounded blocking)."""
    if k is None:
        k = _KMEANS_K
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("__v")
    )
    # Deterministic init: k lowest-id vectors. A bounded driver collect of
    # exactly k rows (k is an algorithm parameter, not data-sized).
    centroids = [
        (int(r["vec_id"]), list(r["__v"]))
        for r in emb.orderBy("vec_id").limit(k).collect()
    ]
    ids = list(range(len(centroids)))
    cents = [c for _, c in centroids]

    def assign(id_list: list[int], cent_list: list[list[float]]) -> DataFrame:
        # Arrow-batched argmin against the (k x dim) centroid matrix — one
        # NumPy broadcast-subtract + row argmin per batch. The equivalent
        # Catalyst HOF fold (transform over k aggregate lambdas) runs
        # interpreted per row (the SCALE.md shingle/simhash lesson) and
        # measured ~4x slower end-to-end at sf0.1. np.argmin takes the
        # FIRST minimum and id_list is ascending, so ties break to the
        # lower cluster id — matching the oracle's ORDER BY (dist, cluster).
        from pyspark.sql.types import IntegerType

        bc = spark.sparkContext.broadcast(
            (np.array(cent_list, dtype=np.float64), np.array(id_list))
        )

        @F.pandas_udf(IntegerType())
        def _nearest(vs: pd.Series) -> pd.Series:
            cents, idl = bc.value
            m = np.array([np.asarray(v, dtype=np.float64) for v in vs])
            # Row-tiled so the (rows, k, dim) broadcast-subtract intermediate
            # stays ~100 MB at any k (adaptive-k semdedup can push k into the
            # hundreds; an untiled 10k-row batch would allocate rows*k*dim*8
            # bytes). Each row's distances are computed independently, so
            # tiling is bit-identical to the untiled form at every k.
            out = np.empty(len(m), dtype="int32")
            step = max(1, (100 << 20) // max(1, cents.shape[0] * cents.shape[1] * 8))
            for s in range(0, len(m), step):
                d = ((m[s : s + step, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
                out[s : s + step] = idl[np.argmin(d, axis=1)].astype("int32")
            return pd.Series(out)

        return emb.withColumn("cluster", _nearest(F.col("__v")))

    def update(assigned: DataFrame) -> tuple[list[int], list[list[float]]]:
        # Element-wise mean per cluster: partial agg combines map-side, the
        # exchange carries only k*dim rows per input partition, and the
        # driver receives exactly k*dim averaged values.
        rows = (
            assigned.select("cluster", F.posexplode("__v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["m"]
        new_ids = sorted(by_cluster)
        new_cents = [
            [by_cluster[i][p] for p in sorted(by_cluster[i])] for i in new_ids
        ]
        return new_ids, new_cents

    # Oracle alignment: the reported partition is the ITERS-th assignment
    # (made against the (ITERS-1)-th centroids); the reported centroids are
    # the means OF that assignment.
    assigned = assign(ids, cents)
    for _ in range(_KMEANS_ITERS - 1):
        ids, cents = update(assigned)
        assigned = assign(ids, cents)
    ids, cents = update(assigned)
    return assigned, ids, cents


@register(
    "embed_kmeans",
    _kmeans_oracle_sql(_KMEANS_K, _KMEANS_ITERS),
    doc="Distributed Lloyd's k-means over the embedding corpus — the "
    "clustering primitive behind IVF index builds, corpus topic bucketing "
    "and diversity sampling. Centroids are DRIVER state (k x dim doubles, "
    "bounded by the algorithm constant k — the MLlib/production layout), "
    "so each iteration is: (1) a row-local assignment against a centroid "
    "literal array (squared-L2 via JVM zip_with/aggregate, argmin via "
    "array_position, ties to the lower cluster id — zero shuffle, zero "
    "join), then (2) one element-wise-mean update: posexplode to "
    "(cluster, pos, val) where partial map-side aggregation combines each "
    "partition down to k*dim rows BEFORE the exchange, so the shuffle is "
    "O(k * dim * partitions) regardless of corpus size, and only k*dim "
    "averaged doubles ever reach the driver. Init is deterministic (the k "
    "lowest vec_id vectors); the oracle unrolls the same three iterations "
    "as chained CTEs, value-checking sizes and centroid norms.",
    tags=("llm", "similarity", "iterative"),
)
def embed_kmeans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned, ids, cents = _kmeans_assign(spark, sf_dir)
    # Final partition sizes ride one hash agg; the centroid norm is computed
    # driver-side from the k bounded centroids and attached via a map
    # literal — no join, no extra job.
    norm_map = F.create_map(
        *[
            lit
            for i, c in zip(ids, cents)
            for lit in (
                F.lit(int(i)),
                F.lit(round(sum(x * x for x in c) ** 0.5, 4)),
            )
        ]
    )
    return (
        assigned.groupBy("cluster")
        .agg(F.count("*").alias("n_vecs"))
        .select(
            "cluster",
            "n_vecs",
            F.element_at(norm_map, F.col("cluster")).alias("centroid_norm"),
        )
    )


@register(
    "sim_search_quantized",
    """
    WITH normed AS (
      SELECT vec_id,
             sqrt(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
                                                x -> x * x), 'sum')) AS l2_norm,
             CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
    ),
    q8 AS (
      SELECT vec_id,
             list_transform(v, x -> CAST(ROUND(x / l2_norm * 127) AS INT)) AS qv
      FROM normed
    ),
    probes AS (SELECT vec_id AS query_id, qv AS pv FROM q8 WHERE vec_id < 5),
    scored AS (
      SELECT p.query_id, c.vec_id,
             CAST(list_dot_product(c.qv, p.pv) AS BIGINT) AS score_q8
      FROM q8 c CROSS JOIN probes p
    )
    SELECT query_id, vec_id, score_q8, CAST(rank AS INT) AS rank FROM (
      SELECT query_id, vec_id, score_q8,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score_q8 DESC, vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
    doc="Quantized (int8) brute-force top-10 — the asymmetric-distance scan "
    "over compressed vectors that serves ANN rescoring at 100 TB: corpus "
    "and probes are unit-normalized and symmetric-int8 quantized row-local "
    "(embed_normalize_quantize's formula), so the scan reads 4x fewer "
    "bytes and the score is an INTEGER dot product (exact arithmetic — "
    "which is why this has a full value oracle while the float ANN paths "
    "are rows-only). Probe batch is bounded by construction (5 vectors) — "
    "the broadcast hint is size-justified; one corpus scan, per-query "
    "top-k window. Ranking by int8 dot approximates cosine ranking with "
    "quantization error <= 1/254 per component.",
    tags=("llm", "similarity"),
)
def sim_search_quantized_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    q8 = emb.select(
        "vec_id",
        F.transform(v, lambda x: F.round(x / norm * 127, 0).cast("int")).alias(
            "qv"
        ),
    )
    probes = q8.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("pv")
    )
    scored = q8.crossJoin(F.broadcast(probes)).select(
        "query_id",
        "vec_id",
        F.aggregate(
            F.zip_with("qv", "pv", lambda x, y: (x * y).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("score_q8"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_q8").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "vec_id", "score_q8", F.col("rank").cast("int").alias("rank"))
    )


@register(
    "multimodal_dedup",
    """
    WITH media AS (
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS modality,
             sha256(text) AS h
      FROM documents
    )
    SELECT modality, MIN(media_id) AS kept_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM media GROUP BY modality, h
    """,
    doc="Exact media dedup by payload digest — tier 1 of the multimodal "
    "dedup cascade (the perceptual tiers ride the same plumbing with a "
    "pHash in place of sha2): one hash-groupBy of (modality, sha2(bytes)), "
    "min-id survivor, copy count for provenance. Only 64-byte digests ever "
    "reach the exchange — the payloads stay in place, which is the entire "
    "point at 100 TB of media.",
    tags=("llm", "multimodal"),
)
def multimodal_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return (
        media.groupBy("modality", F.sha2("content", 256).alias("__h"))
        .agg(
            F.min("media_id").alias("kept_id"),
            F.count("*").cast("bigint").alias("n_copies"),
        )
        .select("modality", "kept_id", "n_copies")
    )


@register(
    "sim_search_ivf_quantized",
    None,  # KMeans cells are seed-dependent — rows-only; recall floor and
    # zero-job query path asserted in tests/test_llm_ops.py
    doc="IVF + int8 ADC + exact rescore — the production ANN serving combo "
    "(operators/similarity.py::ivf_query_adc): probed cells cut the scan "
    "to nprobe/n_clusters of the corpus, integer dot products over "
    "symmetric-int8 vectors cut the scanned bytes 4x, and the float "
    "rescore touches only the per-query shortlist. Zero driver actions on "
    "the query path.",
    tags=("llm", "similarity"),
    quality_test="tests/test_llm_ops.py::test_ivf_adc_recall_and_zero_job_query",
)
def sim_search_ivf_quantized_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.similarity import ivf_index, ivf_query_adc

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    idx = ivf_index(emb, n_clusters=16)
    return ivf_query_adc(idx, queries, k=10, nprobe=4)


@register(
    "corpus_semdedup",
    _kmeans_cte_sql(_KMEANS_K, _KMEANS_ITERS)
    + f"""
    , sdpairs AS (
      SELECT b.vec_id AS dropped
      FROM a{_KMEANS_ITERS} a
      JOIN a{_KMEANS_ITERS} b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      JOIN embeddings ea ON ea.vec_id = a.vec_id
      JOIN embeddings eb ON eb.vec_id = b.vec_id
      WHERE list_cosine_similarity(ea.embedding::DOUBLE[],
                                   eb.embedding::DOUBLE[]) >= 0.3
      GROUP BY b.vec_id
    )
    SELECT a.cluster, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(CASE WHEN p.dropped IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept
    FROM a{_KMEANS_ITERS} a LEFT JOIN sdpairs p ON p.dropped = a.vec_id
    GROUP BY a.cluster
    """,
    doc="SemDeDup (Abbas et al. 2023): semantic deduplication INSIDE "
    "k-means clusters — the published recipe for pruning embedding-level "
    "near-duplicates from web-scale corpora. Clusters come from the same "
    "deterministic Lloyd's driver as embed_kmeans (so the whole pipeline "
    "oracle-checks end-to-end: clustering AND dedup); within each cluster "
    "a vector is dropped when a lower-id cluster-mate sits above the "
    "cosine threshold (keep-lowest greedy — deterministic, order-free). "
    "Scale shape: the quadratic pair step is BLOCKED by cluster exactly "
    "as the paper prescribes — cluster population ~n/k bounds each "
    "block, k grows with the corpus, and the pair join is cluster-keyed "
    "(never all-pairs); the drop set ships ids only. Reported per "
    "cluster: population and survivors.",
    tags=("llm", "similarity", "iterative"),
)
def corpus_semdedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Adaptive k — the docstring's "k grows with the corpus" made real
    # (the round-9 100x probe caught the fixed-k version stalling: 8
    # clusters over 100x vectors => ~62k-vector blocks => a 34 GB cosine
    # matrix per block). Target ~1000 vectors per cluster; at the oracle
    # scales (sf0.01: 500 vecs, sf0.1: 2000) this floors to _KMEANS_K=8,
    # so the static-k oracle SQL compares the IDENTICAL computation. The
    # count() is parquet-metadata-only (no scan).
    n = load_table(spark, sf_dir, "embeddings").count()
    k = max(_KMEANS_K, int(n) // 1000)
    assigned, _, _ = _kmeans_assign(spark, sf_dir, k=k)
    # Three consumers below (both pair sides + the final rollup) and the
    # assignment expression is HOF-heavy (k distance folds per row):
    # materialize it once. Checkpoint scans carry no size stats, so every
    # downstream join pins its hash build explicitly (the broadcast-hazard
    # rule from graph_triangle_count's 10x probe).
    assigned = assigned.localCheckpoint(eager=True)
    # Within-cluster pairs via the per-block GEMM kernel (one normalized
    # matrix product per cluster on its executor) — the pair-join with an
    # interpreted per-pair cosine fold measured ~3x slower here, the same
    # lesson SCALE.md records for dedup_embedding_cosine. The drop set is
    # the higher id of every pair >= threshold (keep-lowest greedy).
    pairs = embedding_near_dup_pairs(
        assigned, id_col="vec_id", vec_col="__v", block_col="cluster",
        threshold=0.3,
    )
    dropped = (
        pairs.select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("__dropped", F.lit(True))
    )
    return (
        assigned.join(dropped.hint("shuffle_hash"), "vec_id", "left")
        .groupBy("cluster")
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.sum(F.when(F.col("__dropped").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
        )
    )


@register(
    "embed_outlier_scores",
    _kmeans_cte_sql(_KMEANS_K, _KMEANS_ITERS)
    + f"""
    SELECT vec_id, cluster, dist FROM (
      SELECT a.vec_id, a.cluster,
             ROUND(list_distance(e.embedding::DOUBLE[], c.centroid::DOUBLE[]), 4)
               AS dist,
             ROW_NUMBER() OVER (ORDER BY
               list_distance(e.embedding::DOUBLE[], c.centroid::DOUBLE[]) DESC,
               a.vec_id) AS rk
      FROM a{_KMEANS_ITERS} a
      JOIN embeddings e USING (vec_id)
      JOIN c{_KMEANS_ITERS} c USING (cluster)
    ) WHERE rk <= 20
    """,
    doc="Embedding outlier detection: distance from each vector to its own "
    "k-means centroid, global top-20 — the corpus-QA pass that surfaces "
    "mislabeled/garbage embeddings before they poison ANN recall or "
    "semantic dedup. Reuses the deterministic Lloyd's driver (same "
    "composable oracle CTEs as embed_kmeans/corpus_semdedup); scoring is "
    "one Arrow argmin-distance pass against the k bounded centroids and "
    "the global top-20 fuses to TakeOrderedAndProject — no full sort.",
    tags=("llm", "similarity", "iterative"),
)
def embed_outlier_scores_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned, ids, cents = _kmeans_assign(spark, sf_dir)
    cmap = {i: np.array(c, dtype=np.float64) for i, c in zip(ids, cents)}
    bc = spark.sparkContext.broadcast(cmap)
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def _dist(vs: pd.Series, cl: pd.Series) -> pd.Series:
        cm = bc.value
        m = np.array([np.asarray(v, dtype=np.float64) for v in vs])
        cents_m = np.array([cm[int(c)] for c in cl])
        return pd.Series(np.sqrt(((m - cents_m) ** 2).sum(axis=1)))

    scored = assigned.select(
        "vec_id", "cluster", _dist(F.col("__v"), F.col("cluster")).alias("__d")
    )
    # rank on the UNROUNDED distance (as the oracle does) so rounding ties
    # can never shift the top-20 cutoff; round only in the output.
    return (
        scored.orderBy(F.col("__d").desc(), "vec_id")
        .limit(20)
        .select("vec_id", "cluster", F.round("__d", 4).alias("dist"))
    )


@register(
    "sim_search_range",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
               FROM embeddings WHERE vec_id < 5)
    SELECT q.query_id, e.vec_id,
           ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        CAST(q.qvec AS DOUBLE[])), 6) AS cos_sim
    FROM embeddings e CROSS JOIN q
    WHERE ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                       CAST(q.qvec AS DOUBLE[])), 6) >= 0.25
    """,
    doc="Radius (threshold) similarity search — top-k's dual, the retrieval "
    "shape under contamination screens where neighbor count is unknown a "
    "priori: broadcast probe batch, one corpus scan, codegen dot product, "
    "row-local threshold filter. ZERO exchanges in the plan (top-k needs a "
    "per-query window; radius search doesn't even need that). "
    "operators/similarity.py::cosine_range_search.",
    tags=("llm", "similarity"),
)
def sim_search_range_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.similarity import cosine_range_search

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_range_search(emb, queries, threshold=0.25)


@register(
    "embed_pca_project",
    None,  # eigendecomposition is not SQL-expressible — rows-only; quality
    # is asserted by tests/test_llm_ops.py (numpy equivalence, orthonormal
    # components, descending explained variance)
    doc="Distributed PCA fit + project (whitening/dimension-reduction stage "
    "ahead of clustering and semantic dedup): one moment pass (per-batch "
    "partial (n, sum, X^T X) rows, element-wise reduced by a (pos, val) "
    "groupBy whose key space is d^2 — dimension-bounded, never data-"
    "bounded), driver-side eigh of the d x d covariance (the MLlib PCA "
    "pattern), then a row-local Arrow GEMM projection. Deterministic "
    "component signs. operators/embeddings.py::pca_fit/pca_project.",
    tags=("llm", "similarity", "iterative"),
    quality_test="tests/test_llm_ops.py::test_pca_matches_local_numpy",
)
def embed_pca_project_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.embeddings import pca_fit, pca_project

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    model = pca_fit(emb, k=4)
    out = pca_project(emb, model, out_col="pca")
    return out.select(
        "vec_id",
        *[
            F.round(F.col("pca")[i], 4).alias(f"p{i + 1}")
            for i in range(4)
        ],
    )


@register(
    "embed_whiten",
    None,  # eigendecomposition is not SQL-expressible — rows-only; quality
    # is asserted by tests/test_llm_ops.py::test_pca_whiten_unit_variance
    # (numpy equivalence + unit-variance/zero-correlation contract)
    doc="PCA whitening (the retrieval/dedup preprocessing that stops "
    "dominant embedding directions from swamping cosine similarity): the "
    "same dimension-bounded moment pass + driver eigh as embed_pca_project, "
    "then a row-local Arrow GEMM scaled per-component to unit variance. "
    "operators/embeddings.py::pca_whiten.",
    tags=("llm", "similarity"),
    quality_test="tests/test_llm_ops.py::test_pca_whiten_unit_variance",
)
def embed_whiten_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.embeddings import pca_fit, pca_whiten

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    model = pca_fit(emb, k=4)
    out = pca_whiten(emb, model, out_col="white")
    return out.select(
        "vec_id",
        *[F.round(F.col("white")[i], 4).alias(f"w{i + 1}") for i in range(4)],
    )


@register(
    "text_char_entropy",
    """
    WITH chars AS (
      SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
    ),
    freq AS (
      SELECT doc_id, ch, CAST(COUNT(*) AS DOUBLE) AS c
      FROM chars GROUP BY doc_id, ch
    ),
    tot AS (SELECT doc_id, SUM(c) AS n FROM freq GROUP BY doc_id)
    SELECT f.doc_id, ROUND(-SUM((c / t.n) * log2(c / t.n)), 4) AS char_entropy
    FROM freq f JOIN tot t ON f.doc_id = t.doc_id
    GROUP BY f.doc_id
    """,
    doc="Per-document character-distribution Shannon entropy — the "
    "gibberish/padding detector in quality cascades (natural text sits "
    "~3.5-4.5 bits/char). Row-local Arrow kernel (operators/text.py::"
    "char_entropy): no shuffle at any scale; the oracle reconstructs the "
    "same value relationally (explode chars -> two groupBys), which is "
    "exactly the shuffle-heavy plan the kernel avoids.",
    tags=("llm", "text"),
)
def text_char_entropy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.text import char_entropy

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.select(
        "doc_id", F.round(char_entropy(F.col("text")), 4).alias("char_entropy")
    )


@register(
    "dedup_canonical_exact",
    """
    WITH canon AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
      FROM documents
    )
    SELECT CAST(MIN(doc_id) AS BIGINT) AS survivor_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM canon GROUP BY norm
    """,
    doc="Canonicalized exact dedup — the tier between byte-exact and "
    "near-dup: lowercase, collapse non-alphanumerics, trim, then group. "
    "Catches trivial reformattings (case, punctuation, whitespace) that "
    "byte-hash dedup misses at near-exact cost: normalization is "
    "row-local JVM regex, the group key at scale is sha2(norm) so only "
    "64-byte digests cross the one exchange (same contract as "
    "dedup_exact). Survivor = min doc_id, deterministic.",
    tags=("llm", "dedup"),
)
def dedup_canonical_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    norm = F.trim(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")
    ).alias("norm")
    return (
        d.select("doc_id", norm)
        .groupBy("norm")
        .agg(
            F.min("doc_id").cast("bigint").alias("survivor_id"),
            F.count("*").cast("bigint").alias("n_copies"),
        )
        .drop("norm")
        .select("survivor_id", "n_copies")
    )


@register(
    "multimodal_embed",
    None,  # encoder is a stubbed model slot (sha256-seeded deterministic
    # stand-in) — rows-only; shape/determinism/downstream-compat asserted
    # in tests/test_llm_ops.py
    doc="Media -> embedding bridge (the CLIP-encoder slot): mapInPandas "
    "over opaque payloads emits unit-norm array<float> vectors that feed "
    "straight into the engine's similarity/dedup/PCA operators — the "
    "Spark-side plumbing (Arrow batch shape, schema, normalization, "
    "payloads never leaving executors) is real; only the model forward "
    "pass is a deterministic stand-in (strict mode raises at the encoder "
    "slot). operators/multimodal.py::embed_media.",
    tags=("llm", "multimodal"),
    quality_test="tests/test_llm_ops.py::test_embed_media_shape_determinism_and_downstream",
)
def multimodal_embed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.multimodal import embed_media

    docs = load_table(spark, sf_dir, "documents")
    media = documents_as_media(docs)
    emb = embed_media(media, dim=64)
    return emb.select(
        "media_id",
        "modality",
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("e1"),
        F.round(
            F.aggregate(
                F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            4,
        ).alias("sq_norm"),
    )


@register(
    "dedup_containment",
    f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)]) AS shingles
      FROM (SELECT doc_id, string_split({_NORM}, ' ') AS words FROM documents)
    ),
    ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             ANY_VALUE(a.n_sh) AS n_a, ANY_VALUE(b.n_sh) AS n_b,
             COUNT(*) AS inter
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           ROUND(inter / LEAST(n_a, n_b), 6) AS containment
    FROM pairs
    WHERE inter / LEAST(n_a, n_b) >= 0.6
    """,
    doc="Asymmetric containment dedup |A∩B|/min(|A|,|B|): flags a document "
    "EMBEDDED in a larger one (boilerplate wrappers, quote farms) that "
    "symmetric Jaccard dilutes toward zero as the size ratio grows — the "
    "missing fourth measure beside exact/Jaccard/MinHash in a curation "
    "cascade. Identical inverted-index candidate join as "
    "dedup_ngram_jaccard (operators/dedup.py::ngram_jaccard_pairs "
    "score='containment'), so the max_doc_freq fan-out bound applies "
    "unchanged at corpus scale.",
    tags=("llm", "dedup"),
)
def dedup_containment_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), k=3, threshold=0.6,
        score="containment",
    )


@register(
    "embed_matryoshka_truncate",
    """
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    sums AS (
      SELECT vec_id,
             list_aggregate(list_transform(v[1:16], x -> x * x), 'sum') AS e16,
             list_aggregate(list_transform(v, x -> x * x), 'sum') AS e64
      FROM v
    )
    SELECT vec_id,
           16 AS n_dims_out,
           ROUND(sqrt(e16), 6) AS l2_norm_16,
           ROUND(e16 / e64, 6) AS energy_ratio
    FROM sums
    """,
    doc="Matryoshka embedding truncation: keep the first 16 of 64 dims "
    "(MRL-trained embeddings front-load information), report the truncated "
    "norm and the preserved-energy ratio ||v16||^2/||v64||^2 — the "
    "cheap-retrieval prefilter that shrinks ANN index cost 4x before a "
    "full-dim re-rank. Row-local JVM array math (slice + aggregate), zero "
    "shuffle, scales embarrassingly.",
    tags=("llm", "similarity"),
)
def embed_matryoshka_truncate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sq_sum = lambda arr: F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x * x)  # noqa: E731
    return (
        emb.withColumn("__v", v)
        .withColumn("__e16", sq_sum(F.slice(F.col("__v"), 1, 16)))
        .withColumn("__e64", sq_sum(F.col("__v")))
        .select(
            "vec_id",
            F.lit(16).alias("n_dims_out"),
            F.round(F.sqrt("__e16"), 6).alias("l2_norm_16"),
            F.round(F.col("__e16") / F.col("__e64"), 6).alias("energy_ratio"),
        )
    )


@register(
    "corpus_bpe_encode",
    None,  # iterative merge training + greedy fusion: not SQL-expressible
    doc="Full BPE tokenizer pipeline, the architecture a 100 TB trainer "
    "actually uses: (1) the corpus reduces DISTRIBUTIVELY to a word-"
    "frequency vocabulary (one groupBy; bounded by vocab, not corpus — "
    "capped top-50k by (freq, word) for a deterministic driver bound), "
    "(2) the merge loop runs locally over that table "
    "(operators/text.py::bpe_train_on_vocab, 8 merges, ties -> smallest "
    "pair), (3) the merge rules ship with the task closure and every "
    "document is encoded by an Arrow-batched pandas UDF — row-local, zero "
    "shuffle (bpe_encode_counts). Output: per-doc token count + "
    "chars/token compression. Properties asserted in tests: zero merges "
    "degenerate to char counts, token counts are monotone non-increasing "
    "in merge count, and compression >= 1.",
    tags=("llm", "text"),
    quality_test="tests/test_llm_ops.py::test_bpe_encode_invariants",
)
def corpus_bpe_encode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.text import (
        bpe_encode_counts,
        bpe_train_on_vocab,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    vocab_rows = (
        docs.select(F.explode(F.split(norm, " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "w")
        .limit(50_000)
        .collect()
    )
    merges = bpe_train_on_vocab([(r["w"], r["c"]) for r in vocab_rows], n_merges=8)
    enc = bpe_encode_counts(docs, merges)
    return enc.select(
        "doc_id",
        "n_tokens",
        F.round(F.col("n_chars_norm") / F.col("n_tokens"), 4).alias("chars_per_token"),
    )


@register(
    "sim_ivf_recall_report",
    None,  # depends on KMeans cell assignment — rows-only by design
    doc="ANN quality observability as a one-call query: recall@10 of the "
    "IVF path (nprobe=4/16 cells) against exact brute-force cosine for "
    "the probe batch, per query and overall. The join is on (query_id, "
    "vec_id) over two k-sized result sets — the report costs two top-k "
    "passes, nothing more. This is the serving-quality dashboard number "
    "a production ANN deployment watches when retuning nprobe/n_clusters "
    "as the corpus drifts; tests pin a recall floor "
    "(tests/test_llm_ops.py), this query exposes the same measurement to "
    "users.",
    tags=("llm", "similarity"),
    quality_test="tests/test_llm_ops.py::test_ivf_recall_report_floor",
)
def sim_ivf_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.similarity import (
        cosine_topk_bruteforce,
        ivf_index,
        ivf_query,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk_bruteforce(emb, queries, k=10).select(
        "query_id", "vec_id"
    )
    approx = ivf_query(ivf_index(emb, n_clusters=16), queries, k=10, nprobe=4).select(
        "query_id", "vec_id"
    )
    hits = exact.join(approx, ["query_id", "vec_id"], "left_semi")
    per_q = (
        exact.groupBy("query_id")
        .agg(F.count("*").alias("n_exact"))
        .join(
            hits.groupBy("query_id").agg(F.count("*").alias("n_hit")),
            "query_id",
            "left",
        )
        .select(
            "query_id",
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_exact"), 4
            ).alias("recall_at_10"),
        )
    )
    return per_q.orderBy("query_id")


_BM25_TERMS = ("data", "learning", "model")


@register(
    "text_bm25_search",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM toks GROUP BY doc_id, term
    ),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl
    ),
    df AS (
      SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf
      WHERE term IN {_BM25_TERMS!r}
      GROUP BY term
    ),
    scored AS (
      SELECT t.doc_id,
             SUM(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
                 * (t.tf * (1.5 + 1.0))
                 / (t.tf + 1.5 * (0.25 + 0.75 * l.dl / s.avgdl))) AS score
      FROM tf t
      JOIN df d ON t.term = d.term
      JOIN dl l ON t.doc_id = l.doc_id
      CROSS JOIN stats s
      GROUP BY t.doc_id
    )
    SELECT doc_id, ROUND(score, 4) AS bm25
    FROM scored
    ORDER BY ROUND(score, 4) DESC, doc_id
    LIMIT 10
    """,
    doc="BM25 keyword search (k1=1.5, b=0.75, the classic Okapi relevance "
    "function) for a fixed 3-term query, entirely relational: inverted "
    "index = explode+groupBy term frequencies, document lengths and the "
    "(n_docs, avgdl) scalar aggregate away distributively, the query's "
    "term set semi-joins the index (query-sized — broadcast by AQE), and "
    "per-doc scores sum in one grouped agg. The production split mirrors "
    "ivf_index/ivf_query: persist tf/dl/df partitioned by term once, "
    "serve queries against the parquet index with term-directory pruning "
    "— the same architecture Lucene distributes, expressed as DataFrames. "
    "Scores round to 4dp before the rank so the top-10 cut is "
    "cross-engine deterministic (doc_id tie-break).",
    tags=("llm", "text"),
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    toks = docs.select("doc_id", F.explode(F.split(norm, " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").cast("double").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("double").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    df_t = (
        tf.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("term")
        .agg(F.count("*").cast("double").alias("df"))
    )
    k1, b = 1.5, 0.75
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    denom = F.col("tf") + k1 * ((1 - b) + b * F.col("dl") / F.col("avgdl"))
    scored = (
        tf.join(df_t, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))  # single-row scalar: safe broadcast
        .groupBy("doc_id")
        .agg(F.sum(idf * (F.col("tf") * (k1 + 1.0)) / denom).alias("score"))
    )
    return (
        scored.select("doc_id", F.round("score", 4).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(10)
    )


@register(
    "text_bm25_query_served",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM toks GROUP BY doc_id, term
    ),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl
    ),
    df AS (
      SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf
      WHERE term IN {_BM25_TERMS!r}
      GROUP BY term
    ),
    scored AS (
      SELECT t.doc_id,
             SUM(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
                 * (t.tf * (1.5 + 1.0))
                 / (t.tf + 1.5 * (0.25 + 0.75 * l.dl / s.avgdl))) AS score
      FROM tf t
      JOIN df d ON t.term = d.term
      JOIN dl l ON t.doc_id = l.doc_id
      CROSS JOIN stats s
      GROUP BY t.doc_id
    )
    SELECT doc_id, ROUND(score, 4) AS bm25
    FROM scored
    ORDER BY ROUND(score, 4) DESC, doc_id
    LIMIT 10
    """,
    doc="The BM25 SERVING path under the same value oracle: index built "
    "via operators/search.py::bm25_index (hash-bucketed postings, the "
    "layout persisted at write time), query via bm25_query — literal "
    "bucket IN prunes statically to the query terms' directories "
    "(corruption-proof test in tests/test_search.py). Identical scores "
    "to the one-shot text_bm25_search by construction; this entry keeps "
    "the served path itself inside the correctness gate.",
    tags=("llm", "text"),
)
def text_bm25_query_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.search import bm25_index, bm25_query

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return bm25_query(bm25_index(docs), list(_BM25_TERMS), k=10)


@register(
    "sim_search_pq",
    None,  # codebooks are k-means/seed-dependent — rows-only by design
    doc="Product-quantized ANN (FAISS PQ16x16 + exact rescore): unit "
    "vectors split into 16 subspaces, each k-means-coded on a bounded "
    "sample, so the corpus ships as 16 small ints per vector — a 16x+ "
    "compression over float32 (the tier beyond int8's 4x; "
    "operators/similarity.py::pq_index/pq_query). Queries score by m "
    "table lookups per candidate (the LUT is built once per Arrow batch), "
    "shortlist by PQ score, exact-cosine rescore restores float ranking. "
    "Zero driver actions on the query path; recall floor pinned in "
    "tests/test_llm_ops.py.",
    tags=("llm", "similarity"),
    quality_test="tests/test_llm_ops.py::test_pq_recall_and_compression",
)
def sim_search_pq_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.similarity import pq_index, pq_query

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    idx = pq_index(emb, m=16, n_centroids=16)
    return pq_query(idx, queries, corpus=emb, k=10, shortlist=50)


@register(
    "sim_search_ivf_pq",
    None,  # kmeans cells + codebooks are seed-dependent — rows-only
    doc="IVF-PQ — the canonical FAISS serving index, composed from the "
    "engine's own tiers: coarse quantizer prunes the scan to nprobe=4/16 "
    "cells (ivf_index), PQ16x16 codes replace float vectors inside the "
    "probed cells (16x+ memory-bandwidth reduction at scan time), LUT "
    "ADC scoring shortlists, exact cosine rescores. The codes JOIN the "
    "cell assignment on the vector id once at index build — at 100 TB "
    "both are written side by side partitioned by cell, so the query "
    "reads nprobe directories of m-byte codes, nothing else. Zero driver "
    "actions on the query path.",
    tags=("llm", "similarity"),
    quality_test="tests/test_llm_ops.py::test_ivf_pq_recall_floor",
)
def sim_search_ivf_pq_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from canvas_data_aws_spark.operators.similarity import (
        cosine,
        ivf_index,
        pq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ivf = ivf_index(emb, n_clusters=16)
    pq = pq_index(emb, m=16, n_centroids=16)
    # index-build-time join: codes ride beside the cell assignment
    coded_cells = pq.codes.join(
        ivf.assigned.select("vec_id", "cell"), "vec_id"
    )

    # probe list: same row-local construction as ivf_query (broadcast
    # centroid fold, per-row sort, top-nprobe explode)
    cent_arr = ivf.centroids.agg(
        F.collect_list(F.struct("cell", "centroid")).alias("__cents")
    )
    q = queries.select("query_id", F.col("embedding").alias("__qvec"))
    scored_cells = F.transform(
        F.col("__cents"),
        lambda c: F.struct(
            (-cosine(F.col("__qvec"), c["centroid"])).alias("negsim"),
            c["cell"].alias("cell"),
        ),
    )
    q_cells = (
        q.crossJoin(F.broadcast(cent_arr))
        .withColumn("__probe", F.slice(F.array_sort(scored_cells), 1, 4))
        .select("query_id", "__qvec", F.explode(F.col("__probe.cell")).alias("cell"))
    )
    probed = F.broadcast(q_cells).join(coded_cells, "cell")

    # inline ADC scoring on the probed candidate set (per-query candidates
    # already carry the query vector, so no crossJoin is needed here)
    from pyspark.sql.types import DoubleType

    bc = spark.sparkContext.broadcast(pq.codebooks)

    @F.pandas_udf(DoubleType())
    def _adc(codes, qvecs):
        import numpy as np
        import pandas as pd

        bks = bc.value
        mm, kk, ds = bks.shape
        luts = {}
        out = np.empty(len(codes))
        for i in range(len(codes)):
            qv = np.asarray(qvecs.iloc[i], dtype=np.float64)
            key = qv.tobytes()
            lut = luts.get(key)
            if lut is None:
                qn = qv / (np.linalg.norm(qv) or 1.0)
                lut = np.stack([bks[j] @ qn[j * ds : (j + 1) * ds] for j in range(mm)])
                luts[key] = lut
            cs = np.asarray(codes.iloc[i], dtype=np.int64)
            out[i] = lut[np.arange(mm), cs].sum()
        return pd.Series(out)

    cand = probed.select(
        "query_id", "vec_id", "__qvec", _adc(F.col("codes"), F.col("__qvec")).alias("s")
    )
    ws = Window.partitionBy("query_id").orderBy(F.col("s").desc(), "vec_id")
    short = cand.withColumn("__r", F.row_number().over(ws)).filter(F.col("__r") <= 50)
    rescored = short.join(
        emb.select("vec_id", F.col("embedding").alias("__cvec")), "vec_id"
    ).select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("__cvec"), F.col("__qvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "vec_id")
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


@register(
    "hybrid_search_fusion",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM toks GROUP BY doc_id, term
    ),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl
    ),
    df AS (
      SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf
      WHERE term IN {_BM25_TERMS!r}
      GROUP BY term
    ),
    sparse AS (
      SELECT t.doc_id,
             ROUND(SUM(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
                 * (t.tf * (1.5 + 1.0))
                 / (t.tf + 1.5 * (0.25 + 0.75 * l.dl / s.avgdl))), 4) AS bm25
      FROM tf t
      JOIN df d ON t.term = d.term
      JOIN dl l ON t.doc_id = l.doc_id
      CROSS JOIN stats s
      GROUP BY t.doc_id
      ORDER BY bm25 DESC, t.doc_id
      LIMIT 20
    ),
    q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
    dense AS (
      SELECT e.vec_id,
             ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          CAST(q.qvec AS DOUBLE[])), 6) AS cos_sim
      FROM embeddings e CROSS JOIN q
      ORDER BY cos_sim DESC, e.vec_id
      LIMIT 20
    ),
    sb AS (SELECT MIN(bm25) AS bmin, MAX(bm25) AS bmax FROM sparse),
    db AS (SELECT MIN(cos_sim) AS cmin, MAX(cos_sim) AS cmax FROM dense),
    fused AS (
      SELECT COALESCE(s.doc_id, d.vec_id) AS doc_id, s.bm25, d.cos_sim,
             ROUND(
               0.5 * COALESCE(CASE WHEN sb.bmax > sb.bmin
                      THEN (s.bm25 - sb.bmin) / (sb.bmax - sb.bmin) END, 0)
             + 0.5 * COALESCE(CASE WHEN db.cmax > db.cmin
                      THEN (d.cos_sim - db.cmin) / (db.cmax - db.cmin) END, 0),
             6) AS hybrid
      FROM sparse s FULL OUTER JOIN dense d ON s.doc_id = d.vec_id
      CROSS JOIN sb CROSS JOIN db
    )
    SELECT doc_id, bm25, cos_sim, hybrid
    FROM fused ORDER BY hybrid DESC, doc_id LIMIT 10
    """,
    doc="Hybrid retrieval: min-max-normalized score fusion (equal weights) "
    "of the BM25 keyword top-20 and the dense cosine top-20 — the "
    "standard sparse+dense serving pattern, chosen over rank-RRF "
    "specifically so NO unpartitioned rank window exists anywhere: each "
    "list is a TakeOrdered top-k, the normalizers are one-row MIN/MAX "
    "scalar broadcasts over those bounded lists, fusion is a 20x20-bounded "
    "full-outer join on the doc key (a doc missing from one list "
    "contributes 0 from that side), and the final top-10 fuses to "
    "TakeOrdered again. Every stage is either corpus-scan-shaped "
    "(the BM25/cosine pipelines, unchanged from their standalone entries) "
    "or bounded by k — nothing grows with the corpus except the two "
    "scans.",
    tags=("llm", "text", "serving"),
)
def hybrid_search_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.search import bm25_index, bm25_query
    from canvas_data_aws_spark.operators.similarity import cosine

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # the sparse list IS the standalone BM25 operator pipeline, composed
    sparse = bm25_query(bm25_index(docs, id_col="doc_id"), list(_BM25_TERMS), k=20)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    dense = (
        emb.crossJoin(F.broadcast(q))  # single query row: safe broadcast
        .select(
            "vec_id", F.round(cosine(F.col("embedding"), F.col("qvec")), 6).alias("cos_sim")
        )
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(20)
    )
    sb = sparse.agg(F.min("bm25").alias("bmin"), F.max("bm25").alias("bmax"))
    db = dense.agg(F.min("cos_sim").alias("cmin"), F.max("cos_sim").alias("cmax"))
    nb = F.when(
        F.col("bmax") > F.col("bmin"),
        (F.col("bm25") - F.col("bmin")) / (F.col("bmax") - F.col("bmin")),
    )
    nc = F.when(
        F.col("cmax") > F.col("cmin"),
        (F.col("cos_sim") - F.col("cmin")) / (F.col("cmax") - F.col("cmin")),
    )
    return (
        sparse.join(dense, sparse.doc_id == dense.vec_id, "full_outer")
        .crossJoin(F.broadcast(sb))  # single-row scalar: safe broadcast
        .crossJoin(F.broadcast(db))  # single-row scalar: safe broadcast
        .select(
            F.coalesce(F.col("doc_id"), F.col("vec_id")).alias("doc_id"),
            "bm25",
            "cos_sim",
            F.round(
                0.5 * F.coalesce(nb, F.lit(0.0)) + 0.5 * F.coalesce(nc, F.lit(0.0)), 6
            ).alias("hybrid"),
        )
        .orderBy(F.col("hybrid").desc(), "doc_id")
        .limit(10)
    )


from canvas_data_aws_spark.plans.registry import QUERIES as _QUERIES  # noqa: E402


@register(
    "text_bm25_merged_search",
    _QUERIES["text_bm25_search"].oracle,  # merged index == full index, so
    # the full-corpus BM25 SQL is the exact oracle for the incremental path
    doc="BM25 serving through the INCREMENTAL index path: the index is "
    "built on 80% of the corpus and bm25_merge appends the rest (per-doc "
    "postings are row-local, so the merge is an append into the existing "
    "term buckets; only the (n_docs, avgdl) scalar recomputes — it must, "
    "because avgdl is a corpus statistic and old documents' scores "
    "legitimately shift as the corpus grows). Proven equal to the "
    "from-scratch index (tests/test_search.py::"
    "test_bm25_merge_equals_one_shot), so the one-shot full-corpus BM25 "
    "SQL is this query's EXACT oracle — the strongest correctness "
    "statement an incremental path can make. The dense mirror is "
    "sim_search_ivf_upsert.",
    tags=("llm", "text", "serving"),
)
def text_bm25_merged_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.search import (
        bm25_index,
        bm25_merge,
        bm25_query,
    )

    docs = load_table(spark, sf_dir, "documents")
    cut = docs.agg(
        F.expr("percentile_disc(0.8) WITHIN GROUP (ORDER BY doc_id)").alias("c")
    )
    base = docs.join(F.broadcast(cut), F.col("doc_id") <= F.col("c")).drop("c")
    delta = docs.join(F.broadcast(cut), F.col("doc_id") > F.col("c")).drop("c")
    idx = bm25_merge(bm25_index(base, id_col="doc_id"), delta)
    return bm25_query(idx, list(_BM25_TERMS), k=10)


@register(
    "corpus_ngram_novelty",
    f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(words[i:i+2], ' ')
                            for i in range(1, len(words) - 1)]) AS shingles
      FROM (SELECT doc_id, string_split({_NORM}, ' ') AS words FROM documents)
    ),
    ex AS (
      SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh
      WHERE len(shingles) > 0
    ),
    sdf AS (
      SELECT shingle, COUNT(DISTINCT doc_id) AS df FROM ex GROUP BY shingle
    )
    SELECT e.doc_id,
           CAST(ANY_VALUE(e.n_sh) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN s.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           SUM(CASE WHEN s.df = 1 THEN 1 ELSE 0 END)
             / CAST(ANY_VALUE(e.n_sh) AS DOUBLE) AS novelty_share
    FROM ex e JOIN sdf s ON s.shingle = e.shingle
    GROUP BY e.doc_id
    """,
    doc="Per-document n-gram novelty: the share of a document's distinct "
    "3-word shingles that appear NOWHERE else in the corpus — the "
    "duplication/memorization signal data-analysis reports track (low "
    "novelty = templated or near-duplicated content; the aggregate "
    "distribution quantifies corpus-level duplication beyond pair "
    "detection). Same inverted shingle index as the Jaccard dedup tier: "
    "one shingle-key exchange for the document frequencies, joined back "
    "and rolled up per doc — counts are exact integers; the share ships "
    "UNROUNDED (1/2^k denominators land exactly on rounding halves).",
    tags=("llm", "curation", "text"),
)
def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.dedup import word_shingles

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sh = docs.select("doc_id", word_shingles(F.col("text"), k=3).alias("shingles"))
    ex = (
        sh.filter(F.size("shingles") > 0)
        .select(
            "doc_id",
            F.size("shingles").alias("n_sh"),
            F.explode("shingles").alias("shingle"),
        )
    )
    sdf = ex.groupBy("shingle").agg(F.countDistinct("doc_id").alias("df"))
    return (
        ex.join(sdf, "shingle")
        .groupBy("doc_id")
        .agg(
            F.first("n_sh").cast("bigint").alias("n_shingles"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_novel"),
            (
                F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
                / F.first("n_sh").cast("double")
            ).alias("novelty_share"),
        )
    )


@register(
    "sim_ivf_nprobe_sweep",
    None,  # depends on KMeans cell assignment — rows-only by design
    doc="The retune curve behind sim_ivf_recall_report: recall@10 vs "
    "nprobe in {1, 2, 4, 8} (of 16 cells) against exact brute-force "
    "cosine, one row per setting with the mean scanned-cell fraction — "
    "the quality/cost frontier an operator reads to pick nprobe after "
    "corpus drift (recall climbs toward 1.0 as nprobe approaches "
    "n_clusters; cost climbs linearly). The index is built ONCE and "
    "each sweep point reuses its cell partitions with partition "
    "pruning, so the sweep costs one clustering pass plus four pruned "
    "k-bounded query passes. Monotonicity (recall non-decreasing in "
    "nprobe) is asserted by test.",
    tags=("llm", "similarity"),
    quality_test="tests/test_llm_ops.py::test_ivf_nprobe_sweep_monotone",
)
def sim_ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    from canvas_data_aws_spark.operators.similarity import (
        cosine_topk_bruteforce,
        ivf_index,
        ivf_query,
    )

    n_clusters = 16
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk_bruteforce(emb, queries, k=10).select("query_id", "vec_id")
    idx = ivf_index(emb, n_clusters=n_clusters)
    rows = []
    for nprobe in (1, 2, 4, 8):
        approx = ivf_query(idx, queries, k=10, nprobe=nprobe).select(
            "query_id", "vec_id"
        )
        hits = exact.join(approx, ["query_id", "vec_id"], "left_semi")
        rows.append(
            exact.groupBy()
            .agg(F.count("*").alias("n_exact"))
            .crossJoin(hits.groupBy().agg(F.count("*").alias("n_hit")))
            .select(
                F.lit(nprobe).cast("int").alias("nprobe"),
                F.round(F.lit(nprobe) / F.lit(n_clusters), 4).alias(
                    "scan_fraction"
                ),
                F.round(
                    F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_exact"), 4
                ).alias("recall_at_10"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), rows).orderBy("nprobe")


@register(
    "doc_fingerprint_winnowing",
    r"""
    WITH d AS (
      SELECT doc_id,
             regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                                   ' ') AS words
      FROM documents WHERE LENGTH(trim(text)) > 0
    ),
    grams AS (
      SELECT doc_id, len(words) - 2 AS n_grams, i - 1 AS pos,
             md5(array_to_string(words[i:i+2], ' ')) AS h
      FROM d, UNNEST(range(1, len(words) - 1)) AS t(i)
      WHERE len(words) >= 3
    ),
    windowed AS (
      SELECT doc_id, n_grams,
             MIN(h || '#' || LPAD(CAST(pos AS VARCHAR), 7, '0')) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel
      FROM grams
    ),
    fp AS (SELECT DISTINCT doc_id, n_grams, sel FROM windowed)
    SELECT doc_id,
           CAST(n_grams AS BIGINT) AS n_grams,
           CAST(COUNT(*) AS BIGINT) AS n_fp,
           MIN(sel) AS min_fp,
           MAX(sel) AS max_fp,
           COUNT(*) * 1.0 / n_grams AS density
    FROM fp GROUP BY doc_id, n_grams
    """,
    doc="Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003, "
    "the MOSS algorithm): 3-gram md5 fingerprints, and from every window "
    "of w=4 consecutive grams keep the minimum — guaranteeing any shared "
    "run of >= w+k-1 tokens between two documents shares at least one "
    "selected fingerprint, at ~2/(w+1) the storage of the full shingle "
    "set. Selection is MIN over the (hash '#' zero-padded-pos) string so "
    "the tie-break is positional and identical in both engines; md5 is "
    "the portable gram hash (same text -> same hex in Spark and DuckDB). "
    "Plan: row-local gram expansion (transform over the word array — no "
    "join), ONE doc-partitioned pos-ordered window for the sliding "
    "minimum, then a per-doc aggregate; nothing global anywhere. At "
    "100 TB the selected-fingerprint table (the thing you'd join for "
    "plagiarism/near-dup candidates) is w+1 times smaller than the "
    "shingle table dedup_ngram_jaccard ships.",
    tags=("llm", "text"),
)
def doc_fingerprint_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select(
            "doc_id",
            F.split(
                F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " "
            ).alias("words"),
        )
        .filter(F.size("words") >= 3)
    )
    grams = d.select(
        "doc_id",
        (F.size("words") - 2).cast("bigint").alias("n_grams"),
        F.explode(
            F.expr(
                "transform(sequence(0, size(words) - 3), i -> "
                "struct(i AS pos, md5(concat_ws(' ', words[i], words[i+1], "
                "words[i+2])) AS h))"
            )
        ).alias("g"),
    ).select("doc_id", "n_grams", "g.pos", "g.h")
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, 3)
    )
    sel = F.min(
        F.concat(
            F.col("h"),
            F.lit("#"),
            F.lpad(F.col("pos").cast("string"), 7, "0"),
        )
    ).over(w)
    fp = (
        grams.select("doc_id", "n_grams", sel.alias("sel"))
        .distinct()
    )
    return fp.groupBy("doc_id", "n_grams").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fp"),
        F.min("sel").alias("min_fp"),
        F.max("sel").alias("max_fp"),
    ).select(
        "doc_id",
        "n_grams",
        "n_fp",
        "min_fp",
        "max_fp",
        (F.col("n_fp") * 1.0 / F.col("n_grams")).alias("density"),
    )


@register(
    "text_langid_confusion",
    f"""
    WITH s AS (
      SELECT lang AS labeled_lang,
             {_SCORE['en']} AS s_en,
             {_SCORE['fr']} AS s_fr,
             {_SCORE['de']} AS s_de,
             {_SCORE['es']} AS s_es
      FROM documents
    ),
    pred AS (
      SELECT labeled_lang,
             CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es AND s_en > 0 THEN 'en'
                  WHEN s_fr >= s_de AND s_fr >= s_es AND s_fr > 0 THEN 'fr'
                  WHEN s_de >= s_es AND s_de > 0 THEN 'de'
                  WHEN s_es > 0 THEN 'es'
                  ELSE 'und' END AS pred_lang
      FROM s
    ),
    cm AS (
      SELECT labeled_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM pred GROUP BY labeled_lang, pred_lang
    ),
    tot AS (
      SELECT labeled_lang, CAST(SUM(n) AS BIGINT) AS n_labeled
      FROM cm GROUP BY labeled_lang
    )
    SELECT cm.labeled_lang, cm.pred_lang, cm.n, t.n_labeled,
           cm.n * 1.0 / t.n_labeled AS share_of_labeled,
           CASE WHEN cm.labeled_lang = cm.pred_lang THEN 1 ELSE 0 END AS is_correct
    FROM cm JOIN tot t USING (labeled_lang)
    """,
    doc="Confusion matrix for the heuristic language-ID against the "
    "labeled lang column — the eval loop that turns text_lang_id from a "
    "scorer into a measured classifier: per (labeled, predicted) cell "
    "counts, per-label recall shares, and a diagonal flag. The per-label "
    "totals come from a second tiny aggregate over the cell counts "
    "joined back broadcast — NOT a window partitioned by language, which "
    "would concentrate each language's whole corpus in one partition at "
    "scale. Row counts are exact; shares are quotients of exact counts, "
    "unrounded. Plan: one scan + two map-side-combining aggregates whose "
    "state is |langs|^2 cells, then a broadcast join of two <=25-row "
    "tables.",
    tags=("llm", "text"),
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        F.col("lang").alias("labeled_lang"), lang_id(F.col("text")).alias("pred_lang")
    )
    cm = d.groupBy("labeled_lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = cm.groupBy("labeled_lang").agg(
        F.sum("n").cast("bigint").alias("n_labeled")
    )
    return cm.join(F.broadcast(tot), "labeled_lang").select(
        "labeled_lang",
        "pred_lang",
        "n",
        "n_labeled",
        (F.col("n") * F.lit(1.0) / F.col("n_labeled")).alias("share_of_labeled"),
        F.when(F.col("labeled_lang") == F.col("pred_lang"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_correct"),
    )


@register(
    "embed_linear_probe",
    None,  # the (d+1)x(d+1) matrix solve is not SQL-expressible — rows-only;
    # numpy equivalence + train-R^2 >= 0 pinned by tests/test_llm_ops.py
    doc="Linear probe on the embedding space (the standard representation-"
    "quality eval): closed-form ridge regression of the label on the "
    "embedding, fit in ONE distributed moment pass — each Arrow batch "
    "emits a single (n, X'^T X', X'^T y) partial for the bias-augmented "
    "design, partials reduce element-wise with a (pos, val) groupBy whose "
    "key space is (d+1)^2 + d + 2 (dimension-bounded, never data-bounded), "
    "and the driver solves the normal equations with numpy (the pca_fit / "
    "MLlib Gramian pattern; driver state is O(d^2) regardless of corpus "
    "size). Scoring is a row-local Arrow GEMV with the weights in the UDF "
    "closure. operators/embeddings.py::ridge_fit/ridge_predict.",
    tags=("llm", "similarity", "iterative"),
    quality_test="tests/test_llm_ops.py::test_linear_probe_matches_numpy_and_r2",
)
def embed_linear_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.embeddings import ridge_fit, ridge_predict

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", F.col("label").cast("double").alias("y")
    )
    model = ridge_fit(emb, target_col="y", lam=1e-3)
    out = ridge_predict(emb, model)
    return out.select(
        "vec_id",
        F.col("y").cast("bigint").alias("label"),
        F.round("pred", 4).alias("pred"),
        F.round(F.col("pred") - F.col("y"), 4).alias("residual"),
    )


@register(
    "corpus_quality_probe",
    None,  # the ridge solve is not SQL-expressible — rows-only; numpy
    # parity + label-separation pinned by tests/test_llm_ops.py
    doc="Model-based quality filtering (the DCLM / FineWeb-edu pipeline "
    "stage): train a linear scorer on WEAK LABELS — a Gopher rule "
    "verdict — over row-local text features (length, token count, "
    "punctuation/stopword ratios, mean word length), then score every "
    "document, replacing the hard boolean gate with a rankable quality "
    "score (threshold at will, inspect the margin). Fit is the one-pass "
    "distributed ridge of embed_linear_probe (moment partials, "
    "(d+1)^2-bounded reduce, driver numpy solve); labeling and feature "
    "extraction are row-local scans; scoring is an Arrow GEMV. The "
    "label join is one doc_id-keyed shuffle. "
    "operators/embeddings.py::ridge_fit; operators/text.py::"
    "quality_features; labels from plans/quality_q.py::text_gopher_rules.",
    tags=("llm", "curation", "quality", "iterative"),
    quality_test="tests/test_llm_ops.py::test_quality_probe_numpy_parity_and_separation",
)
def corpus_quality_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.embeddings import ridge_fit, ridge_predict
    from canvas_data_aws_spark.plans.quality_q import text_gopher_rules

    # Label choice: the harness is label-agnostic (swap in an LLM-judged
    # or composite label in production). On the synthetic fixture corpus
    # only the word-count rule discriminates (every doc passes the other
    # six rules and fails required-words), so ok_word_count is the weak
    # label with signal.
    labels = text_gopher_rules(spark, sf_dir).select(
        "doc_id", F.col("ok_word_count").cast("double").alias("y")
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    feats = quality_features(docs).select(
        "doc_id",
        F.array(
            (F.col("q_n_chars") / 1000.0).cast("double"),
            (F.col("q_n_tokens") / 100.0).cast("double"),
            F.col("q_punct_ratio").cast("double"),
            F.col("q_stop_ratio").cast("double"),
            (F.col("q_mean_word_len") / 10.0).cast("double"),
        ).alias("fv"),
    )
    data = feats.join(labels, "doc_id")
    model = ridge_fit(data, target_col="y", vec_col="fv", lam=1e-3)
    out = ridge_predict(data, model, vec_col="fv", out_col="score")
    return out.select(
        "doc_id",
        F.col("y").cast("bigint").alias("label"),
        F.round("score", 4).alias("score"),
    )


@register(
    "text_hashing_vectorizer",
    r"""
    WITH w AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS word
      FROM documents WHERE LENGTH(trim(text)) > 0
    ),
    h AS (
      SELECT doc_id, md5(word) AS hex FROM w
    ),
    feat AS (
      SELECT doc_id,
             CAST(((strpos('0123456789abcdef', substring(hex, 1, 1)) - 1) * 16
                   + strpos('0123456789abcdef', substring(hex, 2, 1)) - 1) % 64
                  AS BIGINT) AS bucket,
             CASE WHEN strpos('0123456789abcdef', substring(hex, 3, 1)) - 1 < 8
                  THEN 1 ELSE -1 END AS sign
      FROM h
    )
    SELECT doc_id, bucket,
           CAST(SUM(sign) AS BIGINT) AS weight,
           CAST(COUNT(*) AS BIGINT) AS n_terms
    FROM feat GROUP BY doc_id, bucket
    """,
    doc="Feature-hashing vectorizer (the hashing-trick / signed hash "
    "kernel behind fastText-class baselines and cheap dedup/classifier "
    "features): every token hashes to one of 64 buckets via md5 nibbles "
    "with a +-1 sign from a third nibble — unbiased in expectation, no "
    "vocabulary to build, no driver state, output dimension fixed at any "
    "corpus size. Emitted long-form as (doc_id, bucket, weight) — the "
    "sparse-matrix shape downstream trainers consume — with exact "
    "integer weights; md5 is the portable hash (identical hex both "
    "engines). Plan: row-local normalize + explode, then ONE "
    "(doc, bucket)-keyed aggregate with map-side combine; feeds "
    "ridge_fit-style consumers without ever materializing a dense "
    "matrix.",
    tags=("llm", "text"),
)
def text_hashing_vectorizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select(
            "doc_id",
            F.explode(
                F.split(
                    F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " "
                )
            ).alias("word"),
        )
    )
    hexes = w.select("doc_id", F.md5("word").alias("hex"))
    nib = lambda i: F.instr(F.lit("0123456789abcdef"), F.substring("hex", i, 1)) - 1  # noqa: E731
    feat = hexes.select(
        "doc_id",
        ((nib(1) * 16 + nib(2)) % 64).cast("bigint").alias("bucket"),
        F.when(nib(3) < 8, F.lit(1)).otherwise(F.lit(-1)).alias("sign"),
    )
    return feat.groupBy("doc_id", "bucket").agg(
        F.sum("sign").cast("bigint").alias("weight"),
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
    )


@register(
    "text_readability",
    r"""
    WITH c AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               AS n_words,
             CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
                  AS BIGINT) AS n_sentences,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                  AS BIGINT) AS n_syllables
      FROM documents WHERE LENGTH(trim(text)) > 0
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           206.835 - 1.015 * (n_words * 1.0 / n_sentences)
                   - 84.6 * (n_syllables * 1.0 / n_words) AS flesch_ease,
           0.39 * (n_words * 1.0 / n_sentences)
             + 11.8 * (n_syllables * 1.0 / n_words) - 15.59 AS fk_grade
    FROM c
    """,
    doc="Readability scoring (Flesch reading ease + Flesch-Kincaid grade) "
    "— the curation signal separating encyclopedic prose from listicles "
    "and OCR soup: syllables approximated by vowel-group runs (the "
    "standard regex surrogate, identical '[aeiouy]+' semantics in both "
    "engines), sentences by terminal-punctuation runs (floored at 1 so "
    "fragments don't divide by zero). Counts are exact integers; both "
    "scores are identical float-op chains on exact counts, shipped "
    "unrounded. Entirely row-local — one scan, zero exchanges at any "
    "corpus size; compose with corpus_quality_probe as an extra feature "
    "column.",
    tags=("llm", "text", "quality"),
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select(
            "doc_id",
            F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias("n_words"),
            F.greatest(
                F.regexp_count("text", F.lit(r"[.!?]+")), F.lit(1)
            )
            .cast("bigint")
            .alias("n_sentences"),
            F.regexp_count(F.lower("text"), F.lit("[aeiouy]+"))
            .cast("bigint")
            .alias("n_syllables"),
        )
    )
    wps = F.col("n_words") * F.lit(1.0) / F.col("n_sentences")
    spw = F.col("n_syllables") * F.lit(1.0) / F.col("n_words")
    return c.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        (F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw).alias("flesch_ease"),
        (F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)).alias("fk_grade"),
    )


@register(
    "sim_search_filtered",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
               FROM embeddings WHERE vec_id < 5),
    cand AS (
      SELECT e.vec_id, e.embedding, d.lang
      FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
      WHERE d.lang = 'en'
    ),
    scored AS (
      SELECT q.query_id, c.vec_id, c.lang,
             ROUND(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                          CAST(q.qvec AS DOUBLE[])), 6)
               AS cos_sim
      FROM cand c CROSS JOIN q
    ),
    ranked AS (
      SELECT query_id, vec_id, lang, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, lang, cos_sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 10
    """,
    doc="Attribute-filtered vector search — the retrieval shape RAG "
    "pipelines actually run ('nearest English documents', not 'nearest "
    "documents'): the metadata predicate joins and filters candidates "
    "BEFORE ranking (pre-filtering — exact, never the post-filter trap "
    "where a top-k drawn first can come back short or biased after the "
    "predicate). Plan: the documents metadata join pushes the lang "
    "filter to that scan, the surviving candidate set broadcast-joins "
    "the 5-query probe batch, and the per-query top-10 window fuses to "
    "rank-limited form; at 100 TB the selective predicate shrinks the "
    "GEMM workload proportionally — the opposite of post-filtering, "
    "which pays full-corpus ranking THEN discards. The IVF/LSH tiers "
    "compose the same way (filter inside the probed cells).",
    tags=("llm", "similarity"),
)
def sim_search_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.similarity import cosine_topk_bruteforce

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    cand = (
        emb.join(docs, emb.vec_id == docs.doc_id)
        .filter(F.col("lang") == "en")
        .select("vec_id", "embedding", "lang")
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = cosine_topk_bruteforce(cand.select("vec_id", "embedding"), queries, k=10)
    langs = cand.select(F.col("vec_id").alias("cand_id"), "lang")
    return (
        out.join(F.broadcast(langs), out.vec_id == langs.cand_id)
        .select(
            "query_id",
            "vec_id",
            "lang",
            "cos_sim",
            F.col("rank").cast("int").alias("rank"),
        )
    )


@register(
    "dedup_minhash_calibration",
    None,  # hash-seed dependent estimates — rows-only; the estimator-
    # quality floor (MAE, bucket monotonicity) is pinned by
    # tests/test_properties.py
    doc="MinHash estimator calibration — the report that tells you whether "
    "to trust the banding tier before you delete data with it: for every "
    "LSH candidate pair, the signature-agreement Jaccard ESTIMATE sits "
    "next to the EXACT 3-gram Jaccard (computed only on the candidate "
    "pairs — candidate-bounded, never all-pairs), bucketed by estimate "
    "decile with per-bucket mean estimate, mean exact, and mean absolute "
    "error. Reading it: MAE is the noise floor of 64-hash signatures "
    "(~1/sqrt(64) per pair), and a bucket whose mean-exact drifts from "
    "its mean-estimate exposes banding bias at that similarity level. "
    "Plan: the banded candidate join from dedup_minhash, then one "
    "id-keyed join to shingle arrays and a row-local array_intersect — "
    "exact scoring cost scales with CANDIDATES, not the corpus.",
    tags=("llm", "dedup"),
    quality_test="tests/test_properties.py::test_minhash_calibration_quality",
)
def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.dedup import (
        minhash_lsh_pairs,
        spread,
        word_shingles,
    )

    docs = load_table(spark, sf_dir, "documents")
    # ONE shingling pass for both legs (r14): the signature pipeline and
    # the exact-Jaccard scorer both need word_shingles(text, 3) —
    # materialize the (id, shingles) table once and feed the signatures
    # from it (bit-identical Carter-Wegman arithmetic) and the exact
    # scorer from the same checkpoint. (The previous shape normalized +
    # split + shingled the corpus twice; normalize_text before
    # word_shingles was a no-op — word_shingles normalizes internally and
    # normalization is idempotent.) A diagnostic/calibration query may
    # materialize corpus-sized state; the production minhash tiers keep
    # their pure-map signature pass.
    sh_tbl = spread(docs).select(
        F.col("doc_id").alias("id"), word_shingles(F.col("text"), 3).alias("shingles")
    ).localCheckpoint(eager=True)
    pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.05, shingled=sh_tbl)
    sa = sh_tbl.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = sh_tbl.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    scored = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "jaccard_est",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                * F.lit(1.0)
                / (
                    F.size("sh_a")
                    + F.size("sh_b")
                    - F.size(F.array_intersect("sh_a", "sh_b"))
                )
            ).alias("jaccard_exact"),
        )
    )
    return (
        scored.withColumn(
            "bucket", F.least(F.floor(F.col("jaccard_est") * 10), F.lit(9)).cast("bigint")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(F.avg("jaccard_est"), 4).alias("mean_est"),
            F.round(F.avg("jaccard_exact"), 4).alias("mean_exact"),
            F.round(F.avg(F.abs(F.col("jaccard_est") - F.col("jaccard_exact"))), 4).alias(
                "mae"
            ),
        )
    )


@register(
    "embed_logistic_probe",
    None,  # the IRLS Newton solve is not SQL-expressible — rows-only;
    # numpy IRLS equivalence + accuracy floor pinned by tests/test_llm_ops.py
    doc="Logistic probe on the embedding space — ridge's classification "
    "sibling and the exact shape of a model-based quality-classifier "
    "stage once labels are binary: L2-regularized logistic regression "
    "fit by IRLS/Newton, each of the 4 FIXED iterations one distributed "
    "moment pass emitting (n, X'^T W X', X'^T(y-p)) partials at the "
    "current beta (closure-shipped), reduced via the dimension-bounded "
    "(pos, val) groupBy; the driver applies the (d+1)-dim Newton step. "
    "Total exchange = iterations x (d+1)^2 rows regardless of corpus "
    "size; scoring is a row-local Arrow GEMV. "
    "operators/embeddings.py::logistic_fit/logistic_predict.",
    tags=("llm", "similarity", "iterative"),
    quality_test="tests/test_llm_ops.py::test_logistic_probe_matches_numpy_and_separates",
)
def embed_logistic_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.embeddings import (
        logistic_fit,
        logistic_predict,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", (F.col("label") >= 5).cast("double").alias("y")
    )
    model = logistic_fit(emb, target_col="y", lam=1e-3, iterations=4)
    out = logistic_predict(emb, model)
    return out.select(
        "vec_id",
        F.col("y").cast("bigint").alias("y"),
        F.round("p_hat", 4).alias("p_hat"),
        (F.col("p_hat") >= 0.5).alias("pred"),
    )
