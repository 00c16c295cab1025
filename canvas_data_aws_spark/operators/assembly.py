"""Training-set assembly: budgeted mixture -> epoch upsampling -> shuffle ->
shard -> sequence packing, as composable DataFrame operators.

This is the step AFTER curation: `curate` ends with clean documents,
`assemble` turns them into the dataloader-facing artifact — a sharded,
shuffled, packed sequence manifest under a fixed token budget. The
reference pipeline stops at registering tables for downstream query
(sync-canvas-data-files.py:170-235); this family is part of the natively
implemented training-data surface that replaces that delegation.

Design (all deterministic, no RNG, oracle-checkable):

- **Budgeted temperature mixture with epoch upsampling.** Per-source
  sampling follows the alpha-smoothed allocation (rate proportional to
  n_tokens^alpha, renormalized — the corpus_mix_temperature arithmetic),
  but instead of only *down*-sampling, each source's implied ``epochs``
  (allocated tokens / owned tokens) is honored exactly: every document
  repeats ``floor(epochs)`` times and one extra with probability
  ``frac(epochs)``, decided by the repo's portable Knuth-hash uniform
  (same integer arithmetic in any engine) — so a small high-value source
  with epochs 2.3 really appears ~2.3x in the assembled set, the standard
  multilingual-pretraining rebalance (alpha < 1 upsamples small sources).
- **Deterministic epoch shuffle.** Every (doc, rep) instance gets sort key
  md5(seed || doc_id || '#' || rep); a new training epoch is a new seed
  string, and the same seed yields a byte-identical order on any cluster
  layout (the corpus_global_shuffle idiom).
- **Shard + pack.** Shard from the key's leading hex nibbles (the shard
  count is the parallelism knob), position by per-shard rank, then
  fixed-token-budget batches by prefix sum (operators/curation.py::
  pack_sequences' first-fit-on-a-stream relaxation).

Scale shape (100 TB): the mixture plan is one per-source rollup joined
back via broadcast (sources are few); upsampling is a row-local explode
with factor ~= mean epochs; the shuffle/shard/pack chain is row-local
keying + ONE hash exchange on shard feeding a shard-partitioned sort —
exactly the work the partitioned shard write pays anyway. No global sort,
no driver-sized collect.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

#: Knuth multiplicative-hash uniform constants (see corpus_sample_weighted:
#: identical integer arithmetic in Spark / DuckDB / anything).
_KNUTH_A = 2654435761
_KNUTH_MOD = 4294967296
#: increment for the MIXTURE draw — fixed (not epoch-salted) on purpose:
#: the sampled/upsampled dataset is a property of the recipe, epochs only
#: reshuffle its order.
_MIX_C = 48271


def knuth_uniform(id_col, c: int):
    """The portable Knuth-hash uniform ``((id*A + c) mod 2^32 + 1) /
    (2^32 + 1)`` computed WITHOUT a 64-bit overflow: a direct ``id * A``
    overflows long once id exceeds ~3.47e9 (Long.MAX / A) — found by the
    1000x probe, whose replica shift puts doc_id at ~1e10, exactly where
    a year of 100 TB ingest puts a production id space. Split multiply:
    with x = id mod 2^32 = h*2^16 + l,

        (x*A) mod 2^32 = ((h*A mod 2^32) * 2^16 + l*A) mod 2^32

    and every intermediate stays under 2^49. Mathematically identical to
    the naive form for ALL ids (multiplication mod m distributes), so the
    DuckDB oracles — which compute the naive expression in overflow-free
    HUGEINT — keep matching bit-for-bit."""
    m = F.lit(_KNUTH_MOD)
    x = F.pmod(id_col, m)
    h = F.floor(x / F.lit(65536))
    lo = x % F.lit(65536)
    hi = F.pmod(h * F.lit(_KNUTH_A), m) * F.lit(65536)
    u_int = F.pmod(hi + lo * F.lit(_KNUTH_A) + F.lit(int(c)), m)
    return (u_int + 1) / F.lit(float(_KNUTH_MOD + 1))


def mixture_epochs(
    docs: DataFrame,
    alpha: float = 0.5,
    token_budget: float | None = 100_000.0,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source implied epochs under an alpha-smoothed token budget:
    ``(source, n_docs, n_tokens, epochs)`` with epochs = budget *
    n_tokens^alpha / sum(n_tokens^alpha) / n_tokens, rounded to 6dp (the
    repo's cross-engine float convention). ``token_budget=None`` => every
    source at exactly 1.0 epoch (assembly without rebalancing).

    One per-source rollup + a one-row normalizer broadcast — the
    corpus_mix_temperature plan, reused as the assembly recipe's first
    stage."""
    n_tok = _whitespace_tokens(text_col)
    per_source = docs.filter(F.length(F.trim(text_col)) > 0).groupBy(source_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(n_tok).cast("bigint").alias("n_tokens"),
    )
    if token_budget is None:
        return per_source.withColumn("epochs", F.lit(1.0))
    powered = per_source.withColumn("p", F.pow(F.col("n_tokens"), F.lit(float(alpha))))
    tot = powered.agg(F.sum("p").alias("z"))
    return powered.crossJoin(F.broadcast(tot)).select(
        source_col,
        "n_docs",
        "n_tokens",
        F.round(
            F.lit(float(token_budget)) * F.col("p") / F.col("z") / F.col("n_tokens"),
            6,
        ).alias("epochs"),
    )


def epoch_instances(
    docs: DataFrame,
    epochs_by_source: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Expand documents into training instances honoring fractional
    epochs: each doc yields ``floor(epochs)`` instances plus one more iff
    its portable-hash uniform u < frac(epochs) — deterministic weighted
    up/down-sampling in one row-local explode (P(instance count = k+1) =
    frac for k = floor(epochs)). Output: ``(doc_id, source, n_tokens,
    rep)`` with rep in 1..reps.

    The epochs frame is per-source (tiny) and joined via broadcast; the
    explode factor is ~mean(epochs), so the instance table is
    budget-sized, not corpus-sized, regardless of skew."""
    n_tok = _whitespace_tokens(text_col)
    base = docs.filter(F.length(F.trim(text_col)) > 0).select(
        F.col(id_col),
        F.col(source_col),
        n_tok.alias("n_tokens"),
    )
    e6 = F.round(F.col("epochs"), 6)
    rep_full = F.floor(e6).cast("bigint")
    frac = F.round(e6 - F.floor(e6), 6)
    u = knuth_uniform(F.col(id_col), _MIX_C)
    joined = base.join(
        F.broadcast(epochs_by_source.select(source_col, "epochs")), source_col
    )
    reps = (rep_full + F.when(u < frac, F.lit(1)).otherwise(F.lit(0))).alias("reps")
    return (
        joined.select(id_col, source_col, "n_tokens", reps)
        .filter(F.col("reps") > 0)
        .select(
            id_col,
            source_col,
            "n_tokens",
            F.explode(F.sequence(F.lit(1).cast("bigint"), F.col("reps"))).alias("rep"),
        )
    )


def shuffle_shard_pack(
    instances: DataFrame,
    seed: str,
    seq_len: int = 512,
    n_shards: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic epoch order + shard + packed batch for every
    instance: ``(shard, pos, doc_id, rep, n_tokens, batch_id)``. Sort key
    md5(seed || id || '#' || rep); shard from the key's leading 8 hex
    chars mod n_shards; pos = per-shard rank; batch_id = prefix-sum fill
    of seq_len-token batches in shuffled order.

    Plan: row-local keying, one hash exchange on shard, one
    shard-partitioned sort shared by the rank AND the packing window
    (same (shard, order-by-key) spec — Spark evaluates both over one
    sort; packing is inlined rather than joined back from
    pack_sequences, which would re-exchange on (shard, pos))."""
    shard = (
        F.conv(F.substring("k", 1, 8), 16, 10).cast("bigint") % n_shards
    ).cast("bigint")
    return _key_rank_pack(instances, seed, shard, seq_len, id_col)


def shuffle_shard_pack_nibble(
    instances: DataFrame,
    seed: str,
    seq_len: int = 512,
    id_col: str = "doc_id",
) -> DataFrame:
    """16-shard variant with the shard taken from the key's FIRST hex
    nibble (the corpus_global_shuffle idiom) — arithmetic every SQL engine
    can mirror without a base-16 conv builtin, used by the oracle-checked
    registry entry; `shuffle_shard_pack` is the general-shard-count
    deployment path."""
    shard = (
        F.instr(F.lit("0123456789abcdef"), F.substring("k", 1, 1)) - 1
    ).cast("bigint")
    return _key_rank_pack(instances, seed, shard, seq_len, id_col)


def _key_rank_pack(
    instances: DataFrame,
    seed: str,
    shard_expr,
    seq_len: int,
    id_col: str,
) -> DataFrame:
    """Shared tail of the two shard variants: md5 key, shard, per-shard
    rank, and the prefix-sum packing window — both windows on the SAME
    (shard, k-order) spec so one sort serves the rank and the pack."""
    k = F.md5(
        F.concat(
            F.lit(f"{seed}-"),
            F.col(id_col).cast("string"),
            F.lit("#"),
            F.col("rep").cast("string"),
        )
    )
    keyed = instances.withColumn("k", k).withColumn("shard", shard_expr)
    order = [F.col("k"), F.col(id_col), F.col("rep")]
    w = Window.partitionBy("shard").orderBy(*order)
    before = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return keyed.select(
        "shard",
        F.row_number().over(w).cast("bigint").alias("pos"),
        id_col,
        "rep",
        "n_tokens",
        F.floor(before / seq_len).cast("bigint").alias("batch_id"),
    )


def pack_boundary_split(
    docs: DataFrame,
    capacity: int,
    group_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """TRUE pretraining packing — documents concatenated in deterministic
    order and split EXACTLY at ``capacity``-token boundaries (zero
    padding; a document may span sequences): per (group, seq_id) the
    contributing doc count, the exact token fill (== capacity except each
    stream's final sequence), and whether the sequence starts mid-document
    (a continuation the dataloader must not treat as a document start).

    The complement of pack_sequences' no-split relaxation: that one never
    splits a document and pays fragmentation; this one never pads and
    pays boundary-crossing documents.

    Plan: one window per group for the exclusive prefix sum (the same
    exchange the grouped write pays), a bounded explode (each doc lands in
    ceil(n_tok/capacity)+1 sequences at most), then a map-side-combined
    (group, seq_id) aggregate. No global sort; the group is the
    parallelism unit."""
    n_tok = _whitespace_tokens(text_col)
    base = docs.filter(F.length(F.trim(text_col)) > 0).select(
        F.col(group_col), F.col(order_col), n_tok.alias("n_tok")
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # the window expression must be materialized as a column before it can
    # feed the generator — Spark rejects a window function nested inside
    # explode()'s argument as an unresolved operator
    offs = base.select(
        group_col,
        F.coalesce(F.sum("n_tok").over(w), F.lit(0).cast("bigint")).alias("st"),
        "n_tok",
    )
    spanned = offs.select(
        group_col,
        "st",
        (F.col("st") + F.col("n_tok")).alias("en"),
        F.explode(
            F.sequence(
                F.floor(F.col("st") / capacity).cast("bigint"),
                F.floor((F.col("st") + F.col("n_tok") - 1) / capacity).cast(
                    "bigint"
                ),
            )
        ).alias("seq_id"),
    )
    cap = F.lit(int(capacity)).cast("bigint")
    lo = F.col("seq_id") * cap
    hi = (F.col("seq_id") + 1) * cap
    return spanned.groupBy(group_col, "seq_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(
            F.least(F.col("en"), hi) - F.greatest(F.col("st"), lo)
        ).cast("bigint").alias("n_tokens"),
        F.bool_or(F.col("st") < lo).alias("starts_mid_doc"),
    )


def fragment_boundary_split(
    instances_pos: DataFrame, seq_len: int, id_col: str = "doc_id"
) -> DataFrame:
    """Turn a positioned instance stream (the shuffle_shard_pack output:
    ``shard, pos, doc_id, rep, n_tokens``) into the TRUE zero-padding
    training layout: one row per (instance x spanned sequence) fragment —
    ``(shard, seq_id, pos, doc_id, rep, offset_in_doc, n_tokens)`` where
    offset_in_doc is the fragment's start inside its document and
    n_tokens its length. Every sequence fills to exactly seq_len except
    each shard's last; a document crossing a boundary appears as two
    fragments with contiguous offsets — exactly what a dataloader
    re-assembles.

    One more window over the SAME (shard, pos) sort the positioning
    used (no new exchange), then a bounded explode."""
    w = (
        Window.partitionBy("shard")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = instances_pos.select(
        "shard",
        "pos",
        id_col,
        "rep",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("bigint")).alias(
            "st"
        ),
    )
    spanned = offs.select(
        "shard",
        "pos",
        id_col,
        "rep",
        "st",
        (F.col("st") + F.col("n_tokens")).alias("en"),
        F.explode(
            F.sequence(
                F.floor(F.col("st") / seq_len).cast("bigint"),
                F.floor((F.col("st") + F.col("n_tokens") - 1) / seq_len).cast(
                    "bigint"
                ),
            )
        ).alias("seq_id"),
    )
    cap = F.lit(int(seq_len)).cast("bigint")
    lo = F.col("seq_id") * cap
    hi = (F.col("seq_id") + 1) * cap
    frag_start = F.greatest(F.col("st"), lo)
    return spanned.select(
        "shard",
        "seq_id",
        "pos",
        id_col,
        "rep",
        (frag_start - F.col("st")).cast("bigint").alias("offset_in_doc"),
        (F.least(F.col("en"), hi) - frag_start).cast("bigint").alias("n_tokens"),
    )


def _whitespace_tokens(text_col: str):
    """Whitespace token count matching the oracle arithmetic
    ``len(list_filter(regexp_split_to_array(trim(text),'\\s+'), x ->
    length(x) > 0))`` (the corpus_mix_temperature convention)."""
    return (
        F.size(
            F.filter(
                F.split(F.trim(text_col), r"\s+"), lambda x: F.length(x) > 0
            )
        )
    ).cast("bigint")
