"""The composed ``curate`` pipeline: raw documents -> training shards.

One callable chains the curation stages every LLM training-data pipeline
ships, in the canonical order (cheap row-local filters first, pairwise
work only on survivors):

    quality_filter -> dedup_exact -> minhash near-dup collapse_best
        -> decontaminate (vs the held-out eval slice) -> pack_batches
        -> deterministic epoch shuffle -> shard-partitioned parquet write

This is the query-side analog of the reference's identity as ONE composed
artifact (sync-canvas-data-files.py:58-139 runs the whole sync
choreography per invocation, with a hand-counted summary dict at
:50-54,125-139): a curation run is one call producing shards plus an
accountable funnel row, not a parts bin of registry entries.

Scale shape (the 100 TB contract):

- Funnel metrics ride ``df.observe`` at each stage boundary — CollectMetrics
  nodes execute inside the SAME jobs that produce the shards; the funnel
  costs no extra pass over the text.
- The stage ORDER is the cost design: quality rules are row-local (one
  scan), exact dedup shuffles 32-byte digests, and only the quality+exact
  survivors pay the MinHash signature/banding cost. Pairwise work is
  banded (never all-pairs); components run on the pair graph only.
- Decontamination broadcasts the eval shingle set (eval suites are tiny)
  — the train side is touched in one scan.
- The shard write is the one data-sized exchange at the end: the
  deterministic md5(seed||doc_id) epoch shuffle feeds
  ``partitionBy(shard)``, which a sharded training export pays anyway.
- Driver state: the funnel counts (a handful of longs) and nothing else.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from canvas_data_aws_spark.operators.clustering import connected_components
from canvas_data_aws_spark.operators.curation import (
    decontaminate,
    pack_sequences,
    quality_filter,
)
from canvas_data_aws_spark.operators.dedup import (
    dedup_exact,
    line_dedup,
    minhash_lsh_pairs,
)
from canvas_data_aws_spark.sources.parquet import load_table


@dataclass(frozen=True)
class CurationFunnel:
    """Per-stage survivor counts — the accountable one-row report."""

    n_raw: int
    n_quality: int
    n_exact: int
    n_near: int
    n_train: int
    n_clean: int
    n_batches: int
    n_shards: int
    out_dir: str

    def as_dict(self) -> dict:
        return asdict(self)


def curate(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    capacity: int = 2048,
    seed: str = "epoch0",
    jaccard_threshold: float = 0.5,
    min_stop_ratio: float = 0.01,
    decontaminate_k: int = 8,
    min_hits: int = 1,
    n_shard_chars: int = 1,
    line_dedup_min_df: int | None = None,
) -> CurationFunnel:
    """Run the full curation chain over ``{sf_dir}/documents.parquet`` and
    write training shards to ``out_dir`` (parquet, partitioned by shard).

    Returns the funnel counts. The eval slice (``doc_id % 20 == 0``) is the
    decontamination probe set and is excluded from the shards — the same
    deterministic carve ``corpus_curation_funnel`` uses, so the two agree.
    """
    from pyspark.sql import Observation

    docs = load_table(spark, sf_dir, "documents")

    obs = {
        name: Observation(f"curate_{name}")
        for name in ("raw", "quality", "exact", "near", "train", "clean")
    }

    # un-observed stage handles, kept for the degenerate all-filtered path
    # where Observation.get fails and the funnel falls back to recounting
    stage_dfs: dict[str, DataFrame] = {}

    def counted(df: DataFrame, stage: str) -> DataFrame:
        stage_dfs[stage] = df
        return df.observe(obs[stage], F.count(F.lit(1)).alias("n"))

    d0 = counted(docs.select("doc_id", "text"), "raw")

    # 1. quality rules: row-local, one scan, keep-with-reasons
    q = counted(
        quality_filter(d0, min_stop_ratio=min_stop_ratio)
        .filter(F.col("keep"))
        .select("doc_id", "text"),
        "quality",
    )

    # 1b. optional C4-style line-level dedup (off by default): strip lines
    #     repeated across >= line_dedup_min_df documents and rewrite each
    #     survivor from its remaining lines (chunk mode — the fixture corpus
    #     has no newline structure); docs the rewrite empties are dropped
    #     here, which the funnel shows as quality -> exact shrinkage. The
    #     doc-frequency exchange ships md5 digests, never line text.
    if line_dedup_min_df is not None:
        q = (
            line_dedup(q, min_doc_freq=line_dedup_min_df, mode="chunk")
            .filter(F.col("text_clean") != "")
            .select("doc_id", F.col("text_clean").alias("text"))
        )

    # 2. exact dedup on quality survivors: digest shuffle only. The
    #    survivor set feeds three consumers (MinHash signatures, the
    #    component seed, the near-survivor join), so persist it once —
    #    at production scale this is the staging write between the cheap
    #    row-local tier and the pairwise tier.
    exact_ids = dedup_exact(q).select(F.col("kept_id").alias("doc_id"))
    e = counted(q.join(exact_ids, "doc_id", "left_semi"), "exact")
    e.persist()

    # 3. near-dup collapse on exact survivors: banded MinHash pairs ->
    #    components -> one deterministic survivor per cluster (longest doc,
    #    doc_id tie-break) — the collapse_best semantics
    pairs = minhash_lsh_pairs(e, jaccard_threshold=jaccard_threshold).select(
        "id_a", "id_b"
    )
    comp = connected_components(
        e.select(F.col("doc_id").alias("id")), pairs, vertex_col="id"
    ).select(F.col("id").alias("doc_id"), "component")
    wbest = Window.partitionBy("component").orderBy(
        F.length("text").desc(), F.col("doc_id")
    )
    near_ids = (
        e.join(comp, "doc_id")
        .withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select("doc_id")
    )
    n = counted(e.join(near_ids, "doc_id", "left_semi"), "near")

    # 4. decontaminate the train slice against the held-out eval slice
    train = counted(n.filter(F.col("doc_id") % 20 != 0), "train")
    eval_df = docs.filter(F.col("doc_id") % 20 == 0).select("doc_id", "text")
    cont = decontaminate(
        train, eval_df, k=decontaminate_k, min_hits=min_hits
    ).filter(F.col("contaminated")).select("doc_id")
    clean = counted(train.join(cont, "doc_id", "left_anti"), "clean")

    # 5. deterministic epoch shuffle -> shard assignment: md5(seed||id)
    #    key, shard from the leading hex chars. The shard is the dataloader
    #    stream AND the packing group, so no window ever spans the corpus.
    keyed = clean.withColumn(
        "k", F.md5(F.concat(F.lit(seed + "-"), F.col("doc_id").cast("string")))
    ).withColumn(
        "shard", F.conv(F.substring("k", 1, n_shard_chars), 16, 10).cast("bigint")
    )
    wpos = Window.partitionBy("shard").orderBy("k", "doc_id")
    positioned = keyed.withColumn("pos", F.row_number().over(wpos).cast("bigint"))

    # 6. pack into fixed-token batches WITHIN each shard (prefix sum over
    #    the epoch order) — the same one exchange the shard write needs
    packed = pack_sequences(
        positioned, capacity=capacity, order_col="pos", group_col="shard"
    ).select("shard", "pos", "n_tokens", "batch_id")
    final = positioned.join(packed, ["shard", "pos"]).select(
        "doc_id", "text", "n_tokens", "batch_id", "pos", "shard"
    )

    # ONE action executes the whole chain; every observe rides it
    final.write.mode("overwrite").partitionBy("shard").parquet(out_dir)
    e.unpersist()

    def _obs_n(stage: str) -> int:
        # When the pipeline runs EMPTY, AQE's runtime empty-relation
        # propagation rewrites the plan under the CollectMetrics nodes and
        # Observation.get fails instead of reporting — observed on the
        # all-filtered corpus (round-9 advice). Fall back to a direct
        # recount of that stage's DataFrame: a rare degenerate path, and
        # the funnel IS the diagnosis there, so the numbers must be real
        # rather than zero-filled.
        try:
            return int(obs[stage].get["n"])
        except Exception:
            return stage_dfs[stage].count()

    if _obs_n("clean") == 0:
        # every document was filtered out: the partitionBy write left a
        # schemaless empty directory, so the read-back below would raise
        # 'unable to infer schema' and swallow the funnel (round-9 advice).
        # Return the funnel directly — it IS the diagnosis.
        return CurationFunnel(
            n_raw=_obs_n("raw"),
            n_quality=_obs_n("quality"),
            n_exact=_obs_n("exact"),
            n_near=_obs_n("near"),
            n_train=_obs_n("train"),
            n_clean=0,
            n_batches=0,
            n_shards=0,
            out_dir=out_dir,
        )

    written = spark.read.parquet(out_dir)
    n_batches, n_shards = (
        written.agg(
            F.countDistinct("shard", "batch_id").alias("b"),
            F.countDistinct("shard").alias("s"),
        )
        .collect()[0]
    )
    return CurationFunnel(
        n_raw=int(obs["raw"].get["n"]),
        n_quality=int(obs["quality"].get["n"]),
        n_exact=int(obs["exact"].get["n"]),
        n_near=int(obs["near"].get["n"]),
        n_train=int(obs["train"].get["n"]),
        n_clean=int(obs["clean"].get["n"]),
        n_batches=int(n_batches),
        n_shards=int(n_shards),
        out_dir=out_dir,
    )
