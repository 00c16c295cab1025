"""Operable training-set assembly: ``python -m canvas_data_aws_spark assemble``.

The registry entries (plans/assembly_q.py) are the oracle-checked query
surface; this module is the DEPLOYMENT shape — mixture -> epoch
upsampling -> deterministic shuffle -> shard -> sequence packing, writing
the sharded sequence manifest a dataloader consumes, with the versioned
dirs + one-atomic-marker state layout the repo's other pipelines use
(curate checkpoints, link state):

    _assemble_state.json          <- atomic marker: per-epoch version map
    sequences_v{N}.parquet/       <- shard=K/... partitioned instance rows
                                     (pos, doc_id, rep, n_tokens, batch_id)

Semantics (stated, test-pinned):

- **Deterministic**: the same (recipe, epoch) produces a byte-identical
  manifest — no RNG anywhere (Knuth-hash mixture draw, md5 shuffle key).
- **Idempotent**: re-running an epoch whose recipe fingerprint matches
  the marker is a no-op (readers keep their version); a CHANGED recipe
  rebuilds that epoch under a new version dir, never mutating in place.
- **Epochs differ only in order**: the mixture draw is epoch-independent
  (the sampled/upsampled multiset is a property of the recipe), the
  shuffle seed is `epoch{N}`, so every epoch holds the same instances in
  a different deterministic order — the property training reproducibility
  audits check.

A crash mid-run leaves the marker untouched (the new version's dirs are
orphans, overwritten on retry).

Scale shape (100 TB): one per-source rollup (broadcast back), a row-local
explode, ONE hash exchange on shard whose sort serves the rank and the
packing window, then the partitionBy(shard) write that exchange already
laid out. The shard count is the parallelism/file-size knob.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from canvas_data_aws_spark.operators.assembly import (
    epoch_instances,
    fragment_boundary_split,
    mixture_epochs,
    shuffle_shard_pack,
)
from canvas_data_aws_spark.pipelines.curate import (
    _atomic_write_json,
    _fingerprint,
)
from canvas_data_aws_spark.sources.parquet import load_table

MARKER = "_assemble_state.json"


def _read_marker(out_dir: str) -> dict:
    path = os.path.join(out_dir, MARKER)
    if not os.path.exists(path):
        return {"next_version": 1, "epochs": {}}
    try:
        with open(path) as fh:
            return json.load(fh)
    except ValueError:
        # writes are atomic, so a truncated marker can only be hand-edited;
        # treat as no-state rather than crash
        return {"next_version": 1, "epochs": {}}


def run_assemble(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    epoch: int = 1,
    alpha: float = 0.5,
    token_budget: float | None = 100_000.0,
    seq_len: int = 512,
    shards: int = 16,
    where: str | None = None,
    keep_from: str | None = None,
    split: bool = False,
) -> dict:
    """Assemble one training epoch. Returns the run summary (also embedded
    in the marker). No-op when this epoch was already built with the same
    recipe fingerprint.

    ``keep_from``: path to a curated export (any parquet with a ``doc_id``
    column — e.g. a `curate --out` dir) scoping assembly to its SURVIVORS
    via a left-semi join, with mixture metadata (source, text) still read
    from the source table. This is the curate -> assemble chain: curate
    decides WHICH documents, assemble decides the recipe over them.

    ``split``: write the TRUE zero-padding layout — one row per
    (instance x spanned sequence) fragment, every sequence filled to
    exactly seq_len except each shard's last (document rows carry
    offset_in_doc so the dataloader re-assembles boundary-crossing
    docs). Default (False) keeps whole documents and emits the
    no-split batch_id relaxation."""
    os.makedirs(out_dir, exist_ok=True)
    fp = _fingerprint(
        sf_dir=sf_dir,
        epoch=int(epoch),
        alpha=float(alpha),
        token_budget=None if token_budget is None else float(token_budget),
        seq_len=int(seq_len),
        shards=int(shards),
        where=where,
        keep_from=keep_from,
        split=bool(split),
    )
    marker = _read_marker(out_dir)
    prev = marker["epochs"].get(str(epoch))
    if prev and prev["fingerprint"] == fp:
        return {"mode": "noop", "epoch": int(epoch), **prev["summary"]}

    docs = load_table(spark, sf_dir, "documents")
    scope = docs.filter(where) if where else docs
    if keep_from is not None:
        survivors = spark.read.parquet(keep_from).select("doc_id")
        scope = scope.join(survivors, "doc_id", "left_semi")
    eps = mixture_epochs(scope, alpha=alpha, token_budget=token_budget)
    inst = epoch_instances(scope, eps)
    packed = shuffle_shard_pack(
        inst, seed=f"epoch{int(epoch)}", seq_len=seq_len, n_shards=shards
    )
    if split:
        packed = fragment_boundary_split(packed, seq_len=seq_len)

    version = int(marker["next_version"])
    name = f"sequences_v{version}.parquet"
    dest = os.path.join(out_dir, name)
    packed.write.mode("overwrite").partitionBy("shard").parquet(dest)

    summary = _summarize(spark.read.parquet(dest), seq_len, split=split)
    summary.update(
        {
            "version": version,
            "dir": name,
            "seq_len": int(seq_len),
            "shards": int(shards),
        }
    )
    marker["epochs"][str(epoch)] = {
        "fingerprint": fp,
        "dir": name,
        "summary": summary,
    }
    marker["next_version"] = version + 1
    _atomic_write_json(os.path.join(out_dir, MARKER), marker)
    return {"mode": "built", "epoch": int(epoch), **summary}


def verify_assemble(spark: SparkSession, out_dir: str) -> dict:
    """Audit an existing assembly state dir: for every epoch in the
    marker, re-read the written dataset, recompute the manifest summary,
    and check the layout invariants — the restore/copy/bitrot check a
    training launch runs before trusting a manifest.

    Checks per epoch (all distributed aggregates, no driver-sized
    collect):

    - ``summary_match``: recomputed totals equal the marker's summary
      (instances, docs, tokens, sequences).
    - split layouts only (detected by the ``offset_in_doc`` column):
      ``fill_exact`` — every (shard, seq) sums to exactly seq_len except
      each shard's last; ``tiling_exact`` — per instance, fragments tile
      the document exactly (min offset 0, token sum == max fragment end;
      an overlap inflates the sum past the covered span, a gap leaves it
      short, so the pair of aggregates is equivalent to per-row
      contiguity).

    Returns ``{"ok": bool, "epochs": {epoch: {...per-check booleans}}}``;
    a missing dataset dir reads as ``ok: False`` with the error string
    rather than raising (the audit must report, not crash)."""
    marker = _read_marker(out_dir)
    report: dict = {"ok": True, "epochs": {}}
    for ep, rec in sorted(marker["epochs"].items()):
        entry: dict = {}
        want = rec["summary"]
        seq_len = int(want["seq_len"])
        try:
            ds = spark.read.parquet(os.path.join(out_dir, rec["dir"]))
        except Exception as exc:  # missing/corrupt dir: report, don't crash
            report["epochs"][ep] = {"ok": False, "error": str(exc)[:200]}
            report["ok"] = False
            continue
        split = "offset_in_doc" in ds.columns
        got = _summarize(ds, seq_len, split=split)
        entry["summary_match"] = all(
            got[k] == want[k]
            for k in ("n_instances", "n_docs", "n_tokens", "n_seqs")
        )
        if split:
            per_seq = ds.groupBy("shard", "seq_id").agg(
                F.sum("n_tokens").alias("fill")
            )
            last = per_seq.groupBy("shard").agg(F.max("seq_id").alias("last_seq"))
            bad_fill = (
                per_seq.join(last, "shard")
                .filter(
                    (F.col("seq_id") != F.col("last_seq"))
                    & (F.col("fill") != seq_len)
                )
                .count()
            )
            entry["fill_exact"] = bad_fill == 0
            per_inst = ds.groupBy("shard", "pos").agg(
                F.min("offset_in_doc").alias("off0"),
                F.sum("n_tokens").alias("tok"),
                F.max(F.col("offset_in_doc") + F.col("n_tokens")).alias("end"),
            )
            bad_tiling = per_inst.filter(
                (F.col("off0") != 0) | (F.col("tok") != F.col("end"))
            ).count()
            entry["tiling_exact"] = bad_tiling == 0
        entry["ok"] = all(v for k, v in entry.items() if k != "ok")
        report["epochs"][ep] = entry
        report["ok"] = report["ok"] and entry["ok"]
    return report


def _summarize(packed: DataFrame, seq_len: int, split: bool = False) -> dict:
    """Manifest totals from the WRITTEN dataset (validates the export,
    not just the plan): instances, distinct docs, tokens, sequences, and
    the mean batch fill — one small aggregate job. In split mode rows are
    fragments: instances count distinct (pos within shard is unique per
    instance), and the sequence key is seq_id."""
    seq_col = "seq_id" if split else "batch_id"
    inst_expr = (
        F.countDistinct("shard", "pos") if split else F.count(F.lit(1))
    )
    row = packed.agg(
        inst_expr.alias("n_instances"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.countDistinct("shard", seq_col).alias("n_seqs"),
    ).collect()[0]
    n_seqs = int(row["n_seqs"]) or 1
    return {
        "n_instances": int(row["n_instances"]),
        "n_docs": int(row["n_docs"]),
        "n_tokens": int(row["n_tokens"]),
        "n_seqs": int(row["n_seqs"]),
        "mean_fill": round(int(row["n_tokens"]) / (n_seqs * seq_len), 4),
    }
