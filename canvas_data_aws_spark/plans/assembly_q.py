r"""Training-set assembly query family (round 13, session 3).

The step AFTER curation: turning clean documents into the dataloader-facing
artifact. Three oracle-exact entries over operators/assembly.py:

- ``corpus_assemble_manifest`` — the composed recipe (budgeted temperature
  mixture WITH fractional-epoch upsampling -> deterministic shuffle ->
  shard -> sequence packing) summarized per shard: the one-row-per-shard
  manifest `python -m canvas_data_aws_spark assemble` persists.
- ``corpus_curriculum_schedule`` — quality-annealed training schedule:
  fixed q_score bands ordered low -> high (the mid-training "anneal on the
  cleanest data last" recipe), with cumulative token checkpoints.
- ``corpus_length_grouped_batches`` — the dynamic-padding efficiency
  audit: per-source 16-doc batches padded to their longest member, built
  from arrival order vs length-grouped order, with the padding waste each
  strategy pays (length grouping is the standard fine-tuning dataloader
  trick; this measures what it buys on THIS corpus).

The reference registers tables for downstream consumers
(sync-canvas-data-files.py:170-235); this family is part of the natively
implemented training-data surface that replaces that delegation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from canvas_data_aws_spark.operators.assembly import (
    epoch_instances,
    mixture_epochs,
    pack_boundary_split,
    shuffle_shard_pack_nibble,
)
from canvas_data_aws_spark.plans.registry import register
from canvas_data_aws_spark.sources.parquet import load_table

#: fixed recipe for the oracle-checked manifest entry (the CLI pipeline
#: exposes all of these as knobs)
_ALPHA = 0.5
_BUDGET = 100_000.0
_SEQ_LEN = 512
_SEED = "asm1"


@register(
    "corpus_assemble_manifest",
    r"""
    WITH toks AS (
      SELECT doc_id, source,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                  x -> length(x) > 0)) AS BIGINT) AS n_tokens
      FROM documents WHERE LENGTH(trim(text)) > 0
    ),
    per_source AS (
      SELECT source, SUM(n_tokens) AS s_tok FROM toks GROUP BY source
    ),
    tot AS (SELECT SUM(POWER(s_tok, 0.5)) AS z FROM per_source),
    eps AS (
      SELECT source,
             ROUND(100000.0 * POWER(s_tok, 0.5) / z / s_tok, 6) AS e6
      FROM per_source, tot
    ),
    reps AS (
      SELECT t.doc_id, t.n_tokens,
             CAST(FLOOR(e.e6) AS BIGINT)
             + CASE WHEN ((t.doc_id * 2654435761 + 48271) % 4294967296 + 1)
                         / 4294967297.0
                         < ROUND(e.e6 - FLOOR(e.e6), 6)
                    THEN 1 ELSE 0 END AS reps
      FROM toks t JOIN eps e USING (source)
    ),
    inst AS (
      SELECT doc_id, n_tokens, CAST(r AS BIGINT) AS rep
      FROM reps, UNNEST(range(1, reps + 1)) AS t(r)
    ),
    keyed AS (
      SELECT doc_id, rep, n_tokens,
             md5('asm1-' || CAST(doc_id AS VARCHAR) || '#'
                 || CAST(rep AS VARCHAR)) AS k
      FROM inst
    ),
    sharded AS (
      SELECT doc_id, rep, n_tokens, k,
             CAST(strpos('0123456789abcdef', substring(k, 1, 1)) - 1
                  AS BIGINT) AS shard
      FROM keyed
    ),
    packed AS (
      SELECT shard, n_tokens,
             CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY k, doc_id, rep
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / 512.0) AS BIGINT) AS batch_id
      FROM sharded
    )
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_instances,
           CAST(COUNT(DISTINCT batch_id) AS BIGINT) AS n_seqs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM packed
    GROUP BY shard
    """,
    doc="The assembled-training-set manifest as ONE accountable query — "
    "the composed recipe behind `python -m canvas_data_aws_spark "
    "assemble`: alpha=0.5 temperature mixture under a 100k-token budget "
    "honored EXACTLY via fractional-epoch upsampling (every doc repeats "
    "floor(epochs) times, one extra iff its portable Knuth-hash uniform "
    "falls under frac(epochs) — so a small source with epochs 2.3 really "
    "appears ~2.3x, the multilingual-pretraining rebalance; no existing "
    "mixture entry REPEATS documents), then the deterministic epoch "
    "shuffle (md5 sort key), first-nibble shard, and 512-token prefix-sum "
    "packing, summarized per shard. Plan: one per-source rollup + one-row "
    "normalizer broadcast, row-local explode (factor ~mean epochs), ONE "
    "hash exchange on shard whose sort serves both the rank and the "
    "packing window, then a map-side-combined per-shard agg. Same seed "
    "=> byte-identical manifest on any cluster layout "
    "(operators/assembly.py).",
    tags=("llm", "curation"),
)
def corpus_assemble_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    eps = mixture_epochs(docs, alpha=_ALPHA, token_budget=_BUDGET)
    inst = epoch_instances(docs, eps)
    packed = shuffle_shard_pack_nibble(inst, seed=_SEED, seq_len=_SEQ_LEN)
    return packed.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_instances"),
        F.countDistinct("batch_id").cast("bigint").alias("n_seqs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )


@register(
    "corpus_pack_boundary_split",
    r"""
    WITH toks AS (
      SELECT doc_id, source,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                  x -> length(x) > 0)) AS BIGINT) AS n_tok
      FROM documents WHERE LENGTH(trim(text)) > 0
    ),
    c AS (
      SELECT source, doc_id, n_tok,
             CAST(COALESCE(SUM(n_tok) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS BIGINT) AS st
      FROM toks
    ),
    spans AS (
      SELECT source, st, st + n_tok AS en, CAST(s AS BIGINT) AS seq_id
      FROM c, UNNEST(range(st // 256, (st + n_tok - 1) // 256 + 1)) AS t(s)
    )
    SELECT source, seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(LEAST(en, (seq_id + 1) * 256)
                    - GREATEST(st, seq_id * 256)) AS BIGINT) AS n_tokens,
           BOOL_OR(st < seq_id * 256) AS starts_mid_doc
    FROM spans
    GROUP BY source, seq_id
    """,
    doc="TRUE pretraining packing (the zero-padding layout trainers "
    "actually consume): per-source document streams concatenated in "
    "deterministic doc_id order and split EXACTLY at 256-token "
    "boundaries — a document may span sequences; every sequence fills to "
    "capacity except each stream's last. Per (source, seq_id): doc "
    "count, exact token fill, and the starts_mid_doc continuation flag a "
    "dataloader needs to mask document starts. The complement of "
    "corpus_pack_batches' no-split relaxation (that one never splits and "
    "pays fragmentation; this one never pads and pays boundary-crossing "
    "docs). Plan: one per-source prefix-sum window (the exchange a "
    "grouped write pays anyway), a bounded explode (<= ceil(n_tok/256)+1 "
    "sequences per doc), one map-side-combined agg — no global sort at "
    "any corpus size (operators/assembly.py::pack_boundary_split).",
    tags=("llm", "curation"),
)
def corpus_pack_boundary_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_boundary_split(
        load_table(spark, sf_dir, "documents"), capacity=256
    )


@register(
    "corpus_curriculum_schedule",
    r"""
    WITH f AS (
      SELECT doc_id,
             LENGTH(text) AS n_chars,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
             len(regexp_extract_all(lower(text), '\b(?:the|and|of)\b')) AS n_stop
      FROM documents WHERE LENGTH(trim(text)) > 0
    ),
    scored AS (
      SELECT doc_id, n_tokens,
             FLOOR((0.4 * LEAST(n_chars / 500.0, 1.0)
                 + 0.3 * (CASE WHEN (n_chars - n_tokens + 1) / n_tokens >= 3
                                AND (n_chars - n_tokens + 1) / n_tokens <= 10
                               THEN 1.0 ELSE 0.0 END)
                 + 0.3 * LEAST(ROUND(n_stop / GREATEST(n_tokens, 1), 6) * 5,
                               1.0)) * 1000000) / 1000000 AS q
      FROM f
    ),
    staged AS (
      SELECT CASE WHEN q < 0.5 THEN 1 WHEN q < 0.75 THEN 2 ELSE 3 END AS stage,
             n_tokens, q
      FROM scored
    ),
    per_stage AS (
      SELECT stage,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
             ROUND(AVG(q), 6) AS mean_q
      FROM staged GROUP BY stage
    )
    SELECT stage, n_docs, n_tokens, mean_q,
           CAST(SUM(n_tokens) OVER (ORDER BY stage) AS BIGINT) AS cum_tokens,
           ROUND(n_tokens * 1.0 / SUM(n_tokens) OVER (), 6) AS token_share
    FROM per_stage
    """,
    doc="Quality-annealed curriculum schedule — the mid-training recipe "
    "(train on everything first, anneal on the cleanest data last): "
    "documents staged by FIXED composite-q_score bands (reusing "
    "text_quality's arithmetic term-for-term: q < 0.5 / < 0.75 / rest), "
    "one row per stage with doc/token counts, mean score, the cumulative "
    "token checkpoint where the stage boundary falls, and each stage's "
    "token share. Row-local scoring + a 3-group map-side-combined agg; "
    "the stage window runs over 3 rows. Fixed thresholds (not ntile) on "
    "purpose: the schedule is part of the recipe, so it must not shift "
    "as the corpus grows.",
    tags=("llm", "curation"),
)
def corpus_curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.text import quality_features

    d = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    scored = quality_features(d).select(
        F.col("q_n_tokens").alias("n_tokens"), F.col("q_score").alias("q")
    )
    staged = scored.withColumn(
        "stage",
        F.when(F.col("q") < 0.5, 1).when(F.col("q") < 0.75, 2).otherwise(3),
    )
    per_stage = staged.groupBy("stage").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(F.avg("q"), 6).alias("mean_q"),
    )
    w = Window.orderBy("stage").rowsBetween(Window.unboundedPreceding, 0)
    return per_stage.select(
        "stage",
        "n_docs",
        "n_tokens",
        "mean_q",
        F.sum("n_tokens").over(w).cast("bigint").alias("cum_tokens"),
        F.round(
            F.col("n_tokens")
            / F.sum("n_tokens").over(
                Window.partitionBy().rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
            6,
        ).alias("token_share"),
    )


@register(
    "corpus_length_grouped_batches",
    r"""
    WITH toks AS (
      SELECT doc_id, source,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               AS n_tok
      FROM documents WHERE LENGTH(trim(text)) > 0
    ),
    ranked AS (
      SELECT source, n_tok,
             (ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1)
               // 16 AS arrival_batch,
             (ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_tok, doc_id)
               - 1) // 16 AS grouped_batch
      FROM toks
    ),
    both_ways AS (
      SELECT 'arrival' AS strategy, source, arrival_batch AS batch, n_tok
      FROM ranked
      UNION ALL
      SELECT 'length_grouped', source, grouped_batch, n_tok FROM ranked
    ),
    per_batch AS (
      SELECT strategy, source, batch,
             COUNT(*) AS n_docs,
             SUM(n_tok) AS real_tokens,
             COUNT(*) * MAX(n_tok) AS padded_tokens
      FROM both_ways GROUP BY strategy, source, batch
    )
    SELECT strategy, source,
           CAST(COUNT(*) AS BIGINT) AS n_batches,
           CAST(SUM(real_tokens) AS BIGINT) AS real_tokens,
           CAST(SUM(padded_tokens) AS BIGINT) AS padded_tokens,
           ROUND(1.0 - SUM(real_tokens) * 1.0 / SUM(padded_tokens), 6)
             AS waste_ratio
    FROM per_batch
    GROUP BY strategy, source
    """,
    doc="Dynamic-padding efficiency audit — what length-grouped batching "
    "buys: per-source 16-doc batches padded to their longest member "
    "(the standard fine-tuning dataloader model), built two ways from "
    "the SAME rows — arrival (doc_id) order vs length-grouped order — "
    "with each strategy's padded-token bill and waste ratio. Two "
    "row_number windows share one source-partitioned exchange (Spark "
    "sorts per window spec within the shuffled partition, no second "
    "exchange); the union doubles rows only into a map-side-combined "
    "agg. Per-source streams keep every window partition-bounded at "
    "100 TB — no global sort. The waste delta IS the decision number "
    "for switching a dataloader to length grouping.",
    tags=("llm", "curation"),
)
def corpus_length_grouped_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select(
            "doc_id",
            "source",
            F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias("n_tok"),
        )
    )
    w_arr = Window.partitionBy("source").orderBy("doc_id")
    w_grp = Window.partitionBy("source").orderBy("n_tok", "doc_id")
    ranked = toks.select(
        "source",
        "n_tok",
        F.floor((F.row_number().over(w_arr) - 1) / 16).alias("arrival_batch"),
        F.floor((F.row_number().over(w_grp) - 1) / 16).alias("grouped_batch"),
    )
    both = ranked.select(
        F.lit("arrival").alias("strategy"),
        "source",
        F.col("arrival_batch").alias("batch"),
        "n_tok",
    ).unionByName(
        ranked.select(
            F.lit("length_grouped").alias("strategy"),
            "source",
            F.col("grouped_batch").alias("batch"),
            "n_tok",
        )
    )
    per_batch = both.groupBy("strategy", "source", "batch").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("real_tokens"),
        (F.count(F.lit(1)) * F.max("n_tok")).alias("padded_tokens"),
    )
    return per_batch.groupBy("strategy", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_batches"),
        F.sum("real_tokens").cast("bigint").alias("real_tokens"),
        F.sum("padded_tokens").cast("bigint").alias("padded_tokens"),
        F.round(
            F.lit(1.0) - F.sum("real_tokens") / F.sum("padded_tokens"), 6
        ).alias("waste_ratio"),
    )
