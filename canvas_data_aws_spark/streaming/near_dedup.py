"""Streaming NEAR-dup deduplication: continuous ingestion vs persisted
band-bucket state.

``stream_dedup`` (dropDuplicates on a key) catches byte-identical
re-ingestion; this operator is its fuzzy sibling — the streaming shape of
``corpus_cross_dedup_near`` (plans/curation_q.py): each micro-batch of
arriving documents is MinHash-signed, LSH-banded, and joined against the
band buckets of everything PREVIOUSLY KEPT; survivors append their bands
and signatures to the state store and flow on. The reference's analog is
its daily scheduled sync admitting only new files
(sync-canvas-data-files.py:58-139 diffs the remote manifest against local
state per run); here the "already have it" test is near-duplicate text
instead of a file key.

Per-batch cost at 100 TB (the contract that makes this streamable):

- one signature pass over the BATCH (delta-sized, Arrow-free: pure
  row-local xxhash64 + array-min folds, no exchange,
  operators/dedup.py::minhash_signatures);
- one band equi-join batch x state where the state side is PARTITION-
  PRUNED: band rows live under ``bucket=pmod(xxhash64(band_no, band_val),
  n_state_buckets)`` directories, the batch's touched buckets (a
  driver-side collect bounded by ``n_state_buckets``, never data-sized)
  become an ``isin`` filter on the partition column, and the scan reads
  only those directories (PartitionFilters — asserted by
  tests/test_streaming_near_dedup.py::test_state_scan_partition_pruned).
  Signatures stay out of the exchange (only 16 longs/doc of band keys
  move);
- state grows only by survivors (write-once per kept doc), and is NEVER
  rebuilt — exactly the signatures a batch pipeline would persist.

Replay safety (foreachBatch is at-least-once): every sink write is keyed
by ``batch_id`` via dynamic partition overwrite — a retried micro-batch
REPLACES its own partitions instead of appending next to them — and the
state read excludes rows whose ``batch_id`` equals the current batch, so
a replay after a state append but before the checkpoint commit cannot
read its own docs back as kept-state (which would self-match every doc at
jaccard 1.0 and flip its verdict). The batch body is deterministic given
the batch contents, so replace-on-replay converges to the exactly-once
output.

Verdict contract (deterministic given arrival order, which is what the
sequential-replay equality test in tests/test_streaming_near_dedup.py
pins): a document is KEPT iff it has (a) no banded match at
``jaccard_threshold`` against the kept-state and (b) no within-batch
match with a smaller doc_id. Rule (b) is deliberately conservative: if
a < b within a batch and a is itself dropped against state, b still
drops — b is near a, and a is near the state family, so admitting b
would re-admit the family. min-id collapse of each within-batch clique,
same as collapse_best's tie-break direction.
"""

from __future__ import annotations

import os
import tempfile
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from canvas_data_aws_spark.operators.dedup import (
    _band_signatures,
    minhash_signatures,
)

_BANDS_DDL = "id bigint, band_no int, band_val bigint, bucket int, batch_id bigint"
_SIGS_DDL = "id bigint, signature array<bigint>, batch_id bigint"
VERDICT_DDL = (
    "doc_id bigint, matched_state boolean, "
    "matched_batch boolean, kept boolean, batch_id bigint"
)


def _has_parquet(path: str) -> bool:
    if not os.path.isdir(path):
        return False
    for d, _, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def _bucket_col(n_state_buckets: int):
    return F.pmod(F.xxhash64("band_no", "band_val"), F.lit(n_state_buckets)).cast(
        "int"
    )


def read_state_bands(
    spark: SparkSession,
    bands_dir: str,
    current_batch_id: int,
    touched_buckets: list[int] | None = None,
) -> DataFrame:
    """Kept-state band rows visible to ``current_batch_id``: rows written
    by THIS batch id are excluded (replay safety — an at-least-once retry
    must not see its own partial state append), and when
    ``touched_buckets`` is given the scan is pruned to those partition
    directories (an ``isin`` on the ``bucket`` partition column, pushed
    as PartitionFilters — never a full state scan)."""
    if not _has_parquet(bands_dir):
        return spark.createDataFrame([], _BANDS_DDL)
    df = spark.read.schema(_BANDS_DDL).parquet(bands_dir)
    df = df.filter(F.col("batch_id") != F.lit(current_batch_id))
    if touched_buckets is not None:
        df = df.filter(F.col("bucket").isin([int(b) for b in touched_buckets]))
    return df


def read_state_sigs(
    spark: SparkSession, sigs_dir: str, current_batch_id: int
) -> DataFrame:
    if not _has_parquet(sigs_dir):
        return spark.createDataFrame([], _SIGS_DDL)
    return (
        spark.read.schema(_SIGS_DDL)
        .parquet(sigs_dir)
        .filter(F.col("batch_id") != F.lit(current_batch_id))
    )


def _write_by_batch(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    salt_col: str | None = None,
    n_salt: int = 16,
) -> None:
    """Idempotent sink write: dynamic partition overwrite keyed by
    batch_id (always the last partition column) — a replayed micro-batch
    replaces exactly the partitions it wrote before, leaving other
    batches' partitions untouched.

    The repartition on the partition columns is load-bearing: without it
    every upstream task writes a sliver into every partition directory
    (32 tasks x 64 buckets ~ 2k files PER BATCH, measured 1.6x wall at
    the 100x probe), with it each directory gets a bounded file count per
    batch and compact_state keeps the long-run count flat.

    ``salt_col``: for sinks whose only partition column is the constant
    batch_id (sigs, verdicts), repartitioning on it alone collapses the
    whole batch into ONE task — a data-sized serial write at large batch
    sizes. A bounded id-hash salt keeps the write ``n_salt``-way parallel
    at the cost of n_salt files per batch dir. For the RE-READ state dirs
    (bands, sigs) that accumulation is folded by ``compact_state``; the
    verdicts sink (out_dir) is an append-only OUTPUT, never re-read as
    state, and is deliberately NOT compacted — its batch_id partitions are
    the provenance incremental consumers tail (read only batches > their
    high-water mark), so rewriting them into one layer would break exactly
    the consumers the partitioning serves. Its file count is bounded at
    n_salt per batch and never enters a scan the engine performs."""
    parts = [F.col(c) for c in partition_cols]
    if salt_col is not None:
        parts.append(F.pmod(F.xxhash64(salt_col), F.lit(n_salt)))
    (
        df.repartition(*parts)
        .write.option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .mode("overwrite")
        .parquet(path)
    )


def _jaccard_est(num_hashes: int):
    agree = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
    )
    return F.round(agree / F.lit(float(num_hashes)), 6)


@dataclass(frozen=True)
class NearDedupConfig:
    state_dir: str
    out_dir: str
    text_col: str = "text"
    id_col: str = "doc_id"
    jaccard_threshold: float = 0.5
    num_hashes: int = 64
    bands: int = 16
    seed: int = 42
    n_state_buckets: int = 64

    @property
    def bands_dir(self) -> str:
        return os.path.join(self.state_dir, "bands")

    @property
    def sigs_dir(self) -> str:
        return os.path.join(self.state_dir, "sigs")


def process_batch(
    spark: SparkSession, batch_df: DataFrame, batch_id: int, cfg: NearDedupConfig
) -> None:
    """One micro-batch of the near-dedup state machine. Module-level (not
    a closure) so the replay-safety test can invoke the SAME batch twice
    and assert idempotence directly."""
    r = cfg.num_hashes // cfg.bands
    docs = batch_df.select(
        F.col(cfg.id_col).alias("doc_id"), F.col(cfg.text_col).alias("text")
    )
    # signature pipeline feeds 4 consumers (state join, batch self-join,
    # verdict build, state append) — cut lineage once
    sig = minhash_signatures(
        docs, "text", "doc_id", cfg.num_hashes, seed=cfg.seed
    ).localCheckpoint(eager=True)
    bd = (
        _band_signatures(sig, cfg.bands, r)
        .withColumn("bucket", _bucket_col(cfg.n_state_buckets))
        .localCheckpoint(eager=True)
    )

    # buckets this batch touches: bounded by n_state_buckets (64), never
    # data-sized — the one driver-side collect, and it buys the partition
    # prune on the state scan below
    touched = [row["bucket"] for row in bd.select("bucket").distinct().collect()]
    st_bands = read_state_bands(spark, cfg.bands_dir, batch_id, touched)
    st_sigs = read_state_sigs(spark, cfg.sigs_dir, batch_id)

    # (a) vs kept-state: band equi-join, then full-signature estimate
    cand_st = (
        bd.alias("d")
        .join(
            st_bands.alias("s"),
            (F.col("d.band_no") == F.col("s.band_no"))
            & (F.col("d.band_val") == F.col("s.band_val")),
        )
        .select(F.col("d.id").alias("id"), F.col("s.id").alias("state_id"))
        .dropDuplicates(["id", "state_id"])
    )
    m_state = (
        cand_st.join(
            sig.select(F.col("id"), F.col("signature").alias("sig_a")), "id"
        )
        .join(
            st_sigs.select(
                F.col("id").alias("state_id"), F.col("signature").alias("sig_b")
            ),
            "state_id",
        )
        .filter(_jaccard_est(cfg.num_hashes) >= cfg.jaccard_threshold)
        .select("id")
        .distinct()
    )

    # (b) within batch: same banding, keep the smaller id of each pair
    cand_in = (
        bd.alias("a")
        .join(
            bd.alias("b"),
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    m_batch = (
        cand_in.join(
            sig.select(F.col("id").alias("id_a"), F.col("signature").alias("sig_a")),
            "id_a",
        )
        .join(
            sig.select(F.col("id").alias("id_b"), F.col("signature").alias("sig_b")),
            "id_b",
        )
        .filter(_jaccard_est(cfg.num_hashes) >= cfg.jaccard_threshold)
        .select(F.col("id_b").alias("id"))
        .distinct()
    )

    verdicts = (
        docs.select("doc_id")
        .join(m_state.withColumn("ms", F.lit(True)), docs.doc_id == m_state.id, "left")
        .drop("id")
        .join(m_batch.withColumn("mb", F.lit(True)), docs.doc_id == m_batch.id, "left")
        .drop("id")
        .select(
            "doc_id",
            F.coalesce("ms", F.lit(False)).alias("matched_state"),
            F.coalesce("mb", F.lit(False)).alias("matched_batch"),
            (
                ~(F.coalesce("ms", F.lit(False)) | F.coalesce("mb", F.lit(False)))
            ).alias("kept"),
            F.lit(batch_id).cast("bigint").alias("batch_id"),
        )
        .localCheckpoint(eager=True)
    )
    _write_by_batch(verdicts, cfg.out_dir, ["batch_id"], salt_col="doc_id")

    kept = verdicts.filter("kept").select(F.col("doc_id").alias("id"))
    _write_by_batch(
        bd.join(kept, "id", "left_semi").withColumn(
            "batch_id", F.lit(batch_id).cast("bigint")
        ),
        cfg.bands_dir,
        ["bucket", "batch_id"],
    )
    _write_by_batch(
        sig.join(kept, "id", "left_semi").withColumn(
            "batch_id", F.lit(batch_id).cast("bigint")
        ),
        cfg.sigs_dir,
        ["batch_id"],
        # smaller salt than the verdicts: sigs are RE-READ by every later
        # batch, so their file count is per-batch scan cost, not just write
        # parallelism (measured: n_salt=16 on sigs inflated the 100x probe
        # 79->96 s); 4-way keeps the writer off the single-task cliff while
        # compact_state folds the accumulation
        salt_col="id",
        n_salt=4,
    )


#: batch_id of the compacted state layer. Negative on purpose: Structured
#: Streaming batch ids are non-negative, so compacted rows can never be
#: mistaken for (and excluded as) a live batch's own rows.
COMPACTED_BATCH_ID = -1


#: directory name of the compacted layer's partition — walked-over by the
#: policy counters below
_COMPACTED_DIR = f"batch_id={COMPACTED_BATCH_ID}"


def recover_state(cfg: NearDedupConfig) -> None:
    """Crash recovery for ``compact_state``'s two-rename swap, callable
    WITHOUT a Spark session: a death between rename(path -> .pre_compact)
    and rename(.compact_tmp -> path) leaves the live dir MISSING — the
    next stream run would silently treat the state as empty and re-admit
    every near-dup. Roll the backup forward if the live dir is gone;
    discard a stale backup and any half-written tmp otherwise.

    MUST run before any decision is taken over the state dirs (the CLI
    ``compact`` verb calls it before its policy gate: a mid-swap crash can
    leave a store that looks small/absent and would otherwise early-return
    past the very recovery it needs). ``compact_state`` also calls it at
    entry, so library users get the same guarantee. Idempotent."""
    import shutil

    for path in (cfg.bands_dir, cfg.sigs_dir):
        old = path + ".pre_compact"
        tmp = path + ".compact_tmp"
        if os.path.isdir(old) and not os.path.isdir(path):
            os.rename(old, path)
        elif os.path.isdir(old):
            shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(tmp):
            shutil.rmtree(tmp, ignore_errors=True)


def compaction_due(
    cfg: NearDedupConfig, max_state_files: int = 256, max_batches: int = 32
) -> dict:
    """The run-it-when policy for ``compact_state`` (filesystem-only — no
    Spark session needed to decide). Call :func:`recover_state` first (the
    CLI verb does) so a mid-swap crash can't masquerade as a small store.

    Compaction is due when EITHER trigger fires over the two re-read state
    dirs (bands, sigs), counting LIVE (non-compacted) partitions only —
    the ``batch_id=-1`` layer is the compactor's own output and must not
    re-trigger it through either counter, or a store whose steady-state
    compacted file count exceeds the threshold would be permanently "due"
    and every scheduled run would rewrite the whole state for zero
    reduction:

    - ``files > max_state_files``: every micro-batch's state scan opens
      every live state file, so the reducible file count IS the per-batch
      planning + open cost headroom compaction can reclaim. Default 256 ~
      one file per (64 buckets x 4 batches) of bands growth.
    - ``batches > max_batches``: distinct live ``batch_id=`` partitions.
      Each adds a directory level to prune per scan; 32 keeps the listing
      cost trivial even on object stores where LIST is metered.

    Defaults are deliberately conservative (compacting early is cheap —
    the state rewrite is one scan of data the next batch would read
    anyway); a deployment tunes them to its micro-batch cadence. Returns
    ``{"files", "batches", "due"}``."""
    files = 0
    batch_ids: set[int] = set()
    for path in (cfg.bands_dir, cfg.sigs_dir):
        if not os.path.isdir(path):
            continue
        for d, _, fs in os.walk(path):
            rel = os.path.relpath(d, path)
            if _COMPACTED_DIR in rel.split(os.sep):
                continue  # the compacted layer never re-triggers compaction
            files += sum(f.endswith(".parquet") for f in fs)
            base = os.path.basename(d)
            if base.startswith("batch_id="):
                try:
                    bid = int(base.split("=", 1)[1])
                except ValueError:
                    continue
                if bid != COMPACTED_BATCH_ID:
                    batch_ids.add(bid)
    return {
        "files": files,
        "batches": len(batch_ids),
        "due": files > max_state_files or len(batch_ids) > max_batches,
    }


def compact_state(spark: SparkSession, cfg: NearDedupConfig) -> dict:
    """Offline compaction of the near-dedup state store: fold every
    per-batch partition into one consolidated ``batch_id=-1`` layer,
    preserving the bucket partitioning (the scan-prune axis) and writing
    ONE file per bucket instead of one per (bucket, batch).

    Why it exists: each micro-batch appends its own ``batch_id=...``
    partition — replay-idempotent, but after B batches a bucket holds B
    small files and the state scan's cost becomes file-count-bound, the
    classic streaming small-files failure at 100 TB. Compaction is the
    same maintenance action a lakehouse runs (Delta OPTIMIZE / Iceberg
    rewrite_data_files): read the state once, rewrite it partitioned by
    bucket only, then swap via two directory renames. The swap window is
    not atomic, so entry performs crash recovery: a ``.pre_compact``
    backup with no live dir (death between the renames) is rolled
    forward, a stale backup or half-written ``.compact_tmp`` is
    discarded — the next run always sees a complete state, never an
    empty one.

    Scope: the two RE-READ state dirs only (bands, sigs) — these are what
    every batch scans, so their file count is the scan cost. The verdicts
    sink (out_dir) is excluded on purpose: it is an append-only output
    whose batch_id partitions are consumer-facing provenance (see
    ``_write_by_batch``), not state the engine re-reads.

    Contract: run BETWEEN stream runs (checkpoint committed, no pending
    replay) — the same offline contract as any table compaction. A replay
    of batch N after compaction would find its own rows under batch_id=-1
    and wrongly self-exclude nothing; the stream being stopped makes that
    window empty. Verdict equivalence across a mid-stream compaction is
    pinned by tests/test_streaming_near_dedup.py::
    test_compaction_preserves_verdicts.

    Returns ``{"files_before", "files_after", "rows"}``.
    """
    import shutil

    # crash recovery for the two-rename swap below (shared with the CLI
    # verb's pre-policy call): see recover_state
    recover_state(cfg)

    stats = {"files_before": 0, "files_after": 0, "rows": 0}
    for path, ddl, parts in (
        (cfg.bands_dir, _BANDS_DDL, ["bucket", "batch_id"]),
        (cfg.sigs_dir, _SIGS_DDL, ["batch_id"]),
    ):
        old = path + ".pre_compact"
        tmp = path + ".compact_tmp"

        if not _has_parquet(path):
            continue

        def _nfiles(p):
            return sum(
                f.endswith(".parquet") for d, _, fs in os.walk(p) for f in fs
            )

        stats["files_before"] += _nfiles(path)
        df = spark.read.schema(ddl).parquet(path)
        compacted = df.withColumn(
            "batch_id", F.lit(COMPACTED_BATCH_ID).cast("bigint")
        )
        stats["rows"] += compacted.count()
        # bands: one file per bucket dir (hash-repartition on the partition
        # column). sigs: all compacted rows share batch_id=-1, so spread
        # them over a bounded file count by id hash — a real deployment
        # sizes this by target bytes per file.
        if "bucket" in parts:
            spread = compacted.repartition(F.col("bucket"))
        else:
            spread = compacted.repartition(F.pmod(F.xxhash64("id"), F.lit(16)))
        (
            spread.write.partitionBy(*parts)
            .mode("overwrite")
            .parquet(tmp)
        )
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)
        stats["files_after"] += _nfiles(path)
    return stats


def expire_verdicts(out_dir: str, before_batch_id: int) -> dict:
    """Retention for the verdicts sink (round-12 verdict item 5): delete
    the ``batch_id=N`` partition directories with ``N < before_batch_id``
    from ``out_dir``. Filesystem-only — no Spark session.

    The sink is append-only BY DEFAULT and stays that way: its batch_id
    partitions are the provenance incremental consumers tail (read only
    batches above their high-water mark), so the engine never expires
    anything on its own. But a months-long deployment accumulates
    ``n_salt`` files per batch forever, and this is the documented
    answer: once every consumer's high-water mark has passed batch K,
    ``expire_verdicts(out_dir, K)`` (or ``compact --verdicts-dir ...
    --expire-verdicts-before K``) reclaims the tail. Live batches
    (``>= before_batch_id``) are untouched — their verdicts re-read
    byte-identically — and the state dirs are out of scope entirely, so
    dedup verdicts for future batches are unaffected (the sink is never
    re-read as state; see ``_write_by_batch``).

    Expiring a batch a replay could still re-deliver is the caller's
    contract to avoid (same offline rule as ``compact_state``): a
    replayed batch would re-CREATE its partition via dynamic overwrite —
    correct but surprising retention-wise. Idempotent: re-expiring an
    already-expired range removes nothing. Returns
    ``{"removed_batches": [...], "removed_files": n}``."""
    import shutil

    removed_batches: list[int] = []
    removed_files = 0
    if not os.path.isdir(out_dir):
        return {"removed_batches": [], "removed_files": 0}
    for entry in sorted(os.listdir(out_dir)):
        if not entry.startswith("batch_id="):
            continue
        try:
            bid = int(entry.split("=", 1)[1])
        except ValueError:
            continue
        if bid >= before_batch_id:
            continue
        sub = os.path.join(out_dir, entry)
        removed_files += sum(
            f.endswith(".parquet") for _, _, fs in os.walk(sub) for f in fs
        )
        shutil.rmtree(sub)
        removed_batches.append(bid)
    return {"removed_batches": removed_batches, "removed_files": removed_files}


def stream_near_dedup(
    spark: SparkSession,
    src_dir: str,
    schema,
    state_dir: str,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    max_files_per_trigger: int | None = 1,
    checkpoint: str | None = None,
    n_state_buckets: int = 64,
):
    """Start the dedup stream (availableNow): file source over ``src_dir``
    -> foreachBatch near-dup verdicts written to ``out_dir`` (schema
    ``VERDICT_DDL``, partitioned by batch_id, replay-idempotent), kept
    docs' bands/signatures written to ``state_dir`` (bands partitioned by
    (bucket, batch_id) for pruned state scans). Returns the
    StreamingQuery; await it, then read ``out_dir`` for the verdicts.
    """
    from canvas_data_aws_spark.streaming.ops import file_stream_source

    cfg = NearDedupConfig(
        state_dir=state_dir,
        out_dir=out_dir,
        text_col=text_col,
        id_col=id_col,
        jaccard_threshold=jaccard_threshold,
        num_hashes=num_hashes,
        bands=bands,
        seed=seed,
        n_state_buckets=n_state_buckets,
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_batch(spark, batch_df, batch_id, cfg)

    stream = file_stream_source(
        spark, src_dir, schema, fmt="parquet",
        max_files_per_trigger=max_files_per_trigger,
    )
    ckpt = checkpoint or os.path.join(
        tempfile.mkdtemp(prefix="cda_neardedup_ckpt_"), "ckpt"
    )
    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
