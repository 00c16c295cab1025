"""Corpus-curation operators for training-data pipelines: eval-set
decontamination, quality-filter chains, deterministic splits, n-gram
frequency tables, and corpus-level statistics.

Design stance at 100 TB:

- **Decontamination** joins the corpus's exploded shingles against the
  *eval* shingle set — eval suites are tiny (thousands of docs), so the
  probe side broadcasts and the corpus is touched in ONE scan with no
  corpus-side shuffle before the per-doc rollup.
- **Quality filters** are row-local JVM expressions (regexp_count /
  length arithmetic) — a single scan, trivially parallel, no Python.
- **Splits** use a pure-arithmetic LCG bucket of the document id rather
  than an engine-specific hash, so the assignment is reproducible across
  engines and runs (no seed state, no sampling nondeterminism) and a doc's
  split never changes when the corpus grows.
- **N-gram tables** are explode -> partial-agg counts; the shuffle carries
  (ngram, partial count), never documents.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from canvas_data_aws_spark.operators.dedup import spread, word_shingles
from canvas_data_aws_spark.operators.text import quality_features, token_count_whitespace


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Flag training documents that overlap an evaluation set by at least
    ``min_hits`` distinct k-word shingles (the n-gram-collision
    decontamination used for LLM training corpora).

    Returns (doc_id, n_eval_hits, contaminated) for every train doc.
    The eval shingle universe is deduplicated and broadcast — the corpus
    side never shuffles before the per-doc count.
    """
    eval_shingles = (
        eval_df.select(F.explode(word_shingles(F.col(text_col), k)).alias("shingle"))
        .distinct()
    )
    train_shingles = spread(train).select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), k)).alias("shingle")
    )
    hits = (
        train_shingles.join(F.broadcast(eval_shingles), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_eval_hits"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_eval_hits", F.lit(0)).alias("n_eval_hits"),
            (F.coalesce("n_eval_hits", F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )


#: shared rule thresholds — ONE defaults source for the inline path
#: (quality_filter) and the attribute-store path
#: (quality_rules_from_attributes); a retune edits exactly one place.
QUALITY_DEFAULTS = {
    "min_chars": 100,
    "max_chars": 1_000_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_punct_ratio": 0.2,
    "min_stop_ratio": 0.0,
}


def _merge_thresholds(thresholds: dict) -> dict:
    """QUALITY_DEFAULTS overlaid with caller overrides; an unknown key is a
    TypeError (with **kwargs a typo like min_char=5 would otherwise be
    silently ignored — the opposite of a filter retune)."""
    unknown = set(thresholds) - set(QUALITY_DEFAULTS)
    if unknown:
        raise TypeError(f"unknown quality threshold(s): {sorted(unknown)}")
    return {**QUALITY_DEFAULTS, **thresholds}


def _apply_quality_rules(out: DataFrame, prefix: str, th: dict) -> DataFrame:
    """The single rule chain behind both quality paths: rule columns named
    identically, conjunction in ``keep``; ``prefix`` maps the feature
    column names ("q_" for quality_features, "" for the attribute store).
    Keeping ONE chain is what makes the inline-vs-attributes equivalence
    (tests/test_cli.py) structural rather than a maintained coincidence."""
    c = lambda name: F.col(prefix + name)  # noqa: E731
    rules = {
        "r_len": (c("n_chars") >= th["min_chars"])
        & (c("n_chars") <= th["max_chars"]),
        "r_word_len": (c("mean_word_len") >= th["min_mean_word_len"])
        & (c("mean_word_len") <= th["max_mean_word_len"]),
        "r_punct": c("punct_ratio") <= th["max_punct_ratio"],
        "r_stop": c("stop_ratio") >= th["min_stop_ratio"],
    }
    keep = F.lit(True)
    for name, rule in rules.items():
        out = out.withColumn(name, rule)
        keep = keep & rule
    return out.withColumn("keep", keep)


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    **thresholds,
) -> DataFrame:
    """C4/Gopher-style quality-filter chain: one row-local rule column per
    heuristic plus the conjunction ``keep``. Rule outcomes stay visible so
    curation can report *why* documents were dropped (filter-rate
    accounting), not just how many. Thresholds default to
    QUALITY_DEFAULTS; pass any subset as keyword overrides.
    """
    return _apply_quality_rules(
        quality_features(df, text_col), "q_", _merge_thresholds(thresholds)
    )


def quality_rules_from_attributes(
    attrs: DataFrame,
    **thresholds,
) -> DataFrame:
    """:func:`quality_filter`'s rule chain evaluated over a PERSISTED
    attribute table (operators/text.py::document_attributes) instead of
    re-tagging text — the Dolma decoupling's consumer half. Same rules,
    same ``keep`` conjunction, pinned equivalent by
    tests/test_cli.py::test_curate_attributes_equal_inline_quality; the
    input is tens of bytes per doc, so iterating filter thresholds over
    100 TB never rescans the corpus."""
    return _apply_quality_rules(attrs, "", _merge_thresholds(thresholds))


def quality_calibration_from_attributes(attrs: DataFrame) -> DataFrame:
    """Reliability (calibration) table for the composite quality scorer,
    computed over an ATTRIBUTE table (persisted or inline): bucket
    ``q_score`` into deciles (integer FLOOR math — engine-exact) and
    report, per bucket, the observed pass rate of the Gopher word-count
    gate plus the DECIMAL-exact score mass.

    The Dolma-decoupling consumer half, same as
    :func:`quality_rules_from_attributes`: ``attrs`` needs only
    ``q_score`` and ``n_tokens`` (tens of bytes per doc), so recalibrating
    after a threshold change at 100 TB reads the narrow store and never
    touches text. The registry entry ``corpus_quality_calibration``
    computes attributes inline so the oracle sees one self-contained plan;
    production passes the persisted store — equivalence pinned by
    tests/test_curation.py::test_calibration_rides_persisted_attributes."""
    b = attrs.select(
        F.least(F.floor(F.col("q_score") * 10).cast("bigint"), F.lit(9)).alias(
            "bucket"
        ),
        F.when(F.col("n_tokens").between(50, 100000), 1).otherwise(0).alias("pass"),
        F.col("q_score").cast("decimal(18,6)").alias("qs"),
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("pass").cast("bigint").alias("n_pass"),
        F.round(F.sum("pass") / F.count(F.lit(1)), 6).alias("pass_rate"),
        F.sum("qs").cast("decimal(38,6)").alias("sum_score"),
    )


#: LCG constants (glibc family). The bucket is pure 64-bit arithmetic on
#: the id — any engine reproduces it; ids up to ~8e9 stay within BIGINT.
LCG_A = 1103515245
LCG_C = 12345
SPLIT_BUCKETS = 1000


def split_bucket(id_col: Column) -> Column:
    return (id_col * LCG_A + LCG_C) % SPLIT_BUCKETS


def deterministic_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Deterministic train/val/test assignment from an arithmetic bucket of
    the id: stable across engines, runs, and corpus growth (a document's
    split never depends on what else is in the corpus — unlike
    randomSplit, which reshuffles when the input changes).
    """
    bucket = split_bucket(F.col(id_col))
    return df.select(
        "*",
        bucket.alias("split_bucket"),
        F.when(bucket < train_pct * 10, "train")
        .when(bucket < (train_pct + val_pct) * 10, "val")
        .otherwise("test")
        .alias("split"),
    )


def ngram_top_k(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    top: int = 100,
    distinct_per_doc: bool = True,
) -> DataFrame:
    """Top-k n-gram frequency table (the workhorse behind contamination
    scans and boilerplate detection). ``distinct_per_doc`` counts document
    frequency (one vote per doc) rather than raw term frequency.

    explode -> groupBy(ngram) with map-side partial counts; the shuffle
    moves (ngram, partial_count) pairs only. Deterministic output order:
    count DESC, ngram ASC.
    """
    grams = word_shingles(F.col(text_col), n, distinct=distinct_per_doc)
    exploded = spread(df).select(F.explode(grams).alias("ngram"))
    return (
        exploded.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), F.col("ngram"))
        .limit(top)
    )


def corpus_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus summary: docs, chars, whitespace tokens, distinct
    token vocabulary, average document length. Single scan + one global
    aggregate; the vocabulary count is the only distinct (shuffles tokens
    once)."""
    t = F.col(text_col)
    per_doc = df.select(
        F.length(t).cast("bigint").alias("n_chars"),
        token_count_whitespace(t).alias("n_tokens"),
        F.split(F.trim(F.lower(t)), r"\s+").alias("tokens"),
    )
    vocab = per_doc.select(F.explode("tokens").alias("tok")).agg(
        F.countDistinct("tok").alias("vocab_size")
    )
    totals = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 6).alias("avg_doc_tokens"),
    )
    return totals.crossJoin(vocab)


def pack_sequences(
    df: DataFrame,
    capacity: int,
    order_col: str = "doc_id",
    group_col: str | None = "source",
    token_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Assign documents to fixed-token-budget training batches: within each
    ``group_col`` stream, documents in deterministic ``order_col`` order
    fill batches of ``capacity`` tokens by prefix sum (batch_id =
    floor(cumulative_tokens_before / capacity)) — the streaming-friendly
    relaxation of bin packing every sequence-packing pipeline actually
    ships (first-fit on an ordered stream), and unlike true bin packing
    it is deterministic and SQL-checkable.

    One window over (group, order) = one shuffle partitioned by group; at
    100 TB the group is the unit of parallelism (source, shard, …) so no
    single ordering spans the corpus.
    """
    toks = (
        F.col(token_col) if token_col else token_count_whitespace(F.col(text_col))
    ).cast("bigint")
    keys = [group_col] if group_col else []
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(toks).over(w), F.lit(0))
    out_cols = keys + [order_col]
    return df.select(
        *out_cols,
        toks.alias("n_tokens"),
        F.floor(before / capacity).cast("bigint").alias("batch_id"),
    )


def mix_by_source_weights(
    df: DataFrame,
    weights: dict[str, int],
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Deterministic weighted mixture: keep ``weights[source]`` percent of
    each source's documents, chosen by a stable id bucket (id % 100 <
    weight) — the up/down-sampling step that sets a training mixture's
    domain proportions. Row-local predicate, zero shuffle, reproducible
    run-over-run (no RNG); sources absent from ``weights`` are dropped.
    """
    if not weights:
        raise ValueError("weights must map at least one source to a keep-percent")
    pct = F.lit(None).cast("int")
    expr = None
    for src, wgt in sorted(weights.items()):
        cond = F.col(source_col) == src
        expr = F.when(cond, F.lit(wgt)) if expr is None else expr.when(cond, F.lit(wgt))
    pct = expr.otherwise(F.lit(0))
    return df.filter(F.pmod(F.col(id_col), F.lit(100)) < pct)
