"""Deduplication operators for large-scale text corpora (SURVEY.md §2 B.10
and the training-data-pipeline extension scope).

Five tiers, cheapest-first — at 100 TB you run them in this order and each
tier only sees the previous tier's survivors:

1. exact       — hash-groupBy on normalized text; one shuffle on a 256-bit
                 hash, no pairwise work.
2. ngram       — exact Jaccard over word shingles via an inverted-index
                 self-join (explode -> equi-join on shingle): pairwise work
                 bounded by shared-shingle candidates, never all-pairs.
3. simhash     — 64-bit locality hash; near-dups collide on rotated bands;
                 linear work + a band groupBy.
4. minhash/LSH — MLlib MinHashLSH approxSimilarityJoin: banding turns
                 near-dup search into an equi-join on band buckets.
5. embedding   — semantic near-dup via cosine over embeddings (see
                 operators/similarity.py for the k-NN machinery).

All hot paths are JVM built-ins (split/transform/aggregate/xxhash64); no
Python in the per-row loop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def normalize_text(col: Column) -> Column:
    """Canonical form for exact dedup: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: group by sha2(normalized text), keep the smallest id.

    Returns (kept_id, n_copies). One hash-shuffle; at scale the 256-bit hash
    column is tiny compared to the documents, so the shuffle moves ids+hashes
    only (project-before-shuffle).
    """
    h = F.sha2(normalize_text(F.col(text_col)), 256)
    return (
        df.select(F.col(id_col), h.alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("kept_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("kept_id", "n_copies")
    )


def word_shingles(col: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of a text column, built entirely from
    JVM higher-order functions (split -> sequence -> transform -> slice)."""
    words = F.split(normalize_text(col), " ")
    n = F.size(words)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, k)))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join via an inverted index.

    explode(shingles) -> self-equi-join on shingle -> |A∩B| per pair ->
    jaccard = inter / (|A| + |B| - inter). Only pairs sharing >=1 shingle
    are ever materialized (candidate generation is an equi-join, not a
    cross product); the id< id guard halves the pair space.
    """
    sh = df.select(
        F.col(id_col).alias("id"), word_shingles(F.col(text_col), k).alias("shingles")
    ).withColumn("n_sh", F.size("shingles"))
    exploded = sh.select("id", "n_sh", F.explode("shingles").alias("shingle"))

    a = exploded.alias("a")
    b = exploded.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        pairs.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(col: Column, k_grams: int = 2) -> Column:
    """64-bit SimHash of a text column, fully vectorized.

    Each shingle votes +1/-1 per bit position according to its xxhash64;
    the sign of each bit's sum forms the fingerprint. Implemented as an
    aggregate over a 64-slot int array — no UDF, no per-row Python.
    """
    shingles = word_shingles(col, k_grams)
    hashes = F.transform(shingles, lambda s: F.xxhash64(s))
    # bit positions are compile-time constants: unroll the 64 lanes into a
    # static array expression (shift amounts must be Python ints)
    bitsums = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
                    for i in range(64)
                ]
            ),
            lambda a, v: a + v.cast("long"),
        ),
    )
    fp = F.lit(0).cast("long")
    for i in range(64):
        fp = fp.bitwiseXOR(
            F.when(
                F.element_at(bitsums, i + 1) > 0, F.shiftleft(F.lit(1).cast("long"), i)
            ).otherwise(F.lit(0).cast("long"))
        )
    return fp


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-dup candidates: band the 64-bit fingerprint into
    ``bands`` chunks (pigeonhole: any pair within ``max_hamming<=bands*2-1``
    distance shares at least one exact band), equi-join on (band_no, band
    value), then verify true Hamming distance via bit_count(xor)."""
    band_bits = 64 // bands
    fp = df.select(F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("fp"))
    banded = fp.select(
        "id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_no"),
                        F.shiftright(F.col("fp"), b * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .alias("band_val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("id", "fp", "band.band_no", "band.band_val")

    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.fp").bitwiseXOR(F.col("b.fp"))).alias("hamming"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming") <= max_hamming)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    jaccard_threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """MinHash+LSH near-dup pairs via MLlib (HashingTF shingle features ->
    MinHashLSH -> approxSimilarityJoin on banded buckets).

    Returns (id_a, id_b, jaccard_est) where jaccard_est = 1 - lsh distance.
    Approximate and hash-seed dependent — rows-only in the oracle gate.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = df.select(
        F.col(id_col).alias("id"), word_shingles(F.col(text_col), 3).alias("shingles")
    ).filter(F.size("shingles") > 0)
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18, binary=True)
    feats = tf.transform(sh)
    mh = MinHashLSH(inputCol="features", outputCol="minhashes", numHashTables=num_hashes, seed=seed)
    model = mh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 1.0 - jaccard_threshold, distCol="dist")
    return (
        pairs.filter(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            F.round(1.0 - F.col("dist"), 6).alias("jaccard_est"),
        )
    )
