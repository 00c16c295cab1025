"""stream_near_dedup: the streaming verdicts must EXACTLY equal a
sequential batch-by-batch replay built from the batch operators
(minhash_cross_pairs vs accumulated kept-state + within-batch
minhash_lsh_pairs with the identical seed/geometry) — proof that the
foreachBatch state machine implements the declared contract, not an
approximation of it."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from canvas_data_aws_spark.operators.dedup import (
    minhash_cross_pairs,
    minhash_lsh_pairs,
)
from canvas_data_aws_spark.sources.parquet import load_table
from canvas_data_aws_spark.streaming.ops import await_or_raise


def test_stream_equals_sequential_replay(spark, sf_dir, tmp_path):
    from canvas_data_aws_spark.plans.streaming_q import stage_arrival_batches
    from canvas_data_aws_spark.streaming.near_dedup import stream_near_dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_batches = 4

    workdir = str(tmp_path / "stream")
    os.makedirs(workdir, exist_ok=True)
    src_dir = stage_arrival_batches(spark, docs, workdir, n_batches=n_batches)
    schema = spark.read.parquet(src_dir).schema
    out_dir = os.path.join(workdir, "verdicts")
    query = stream_near_dedup(
        spark,
        src_dir,
        schema,
        state_dir=os.path.join(workdir, "state"),
        out_dir=out_dir,
        jaccard_threshold=0.5,
    )
    await_or_raise(query, 300)
    got = {
        r["doc_id"]: (r["matched_state"], r["matched_batch"], r["kept"])
        for r in spark.read.parquet(out_dir).collect()
    }

    # ---- sequential replay with the batch operators
    expected: dict[int, tuple[bool, bool, bool]] = {}
    state = None
    for b in range(n_batches):
        batch = docs.filter(F.col("doc_id") % n_batches == b)
        mb_ids = {
            r["id_b"]
            for r in minhash_lsh_pairs(batch, jaccard_threshold=0.5)
            .select("id_b")
            .distinct()
            .collect()
        }
        ms_ids = (
            set()
            if state is None
            else {
                r["delta_id"]
                for r in minhash_cross_pairs(batch, state, jaccard_threshold=0.5)
                .select("delta_id")
                .distinct()
                .collect()
            }
        )
        batch_ids = [r["doc_id"] for r in batch.select("doc_id").collect()]
        kept_ids = []
        for d in batch_ids:
            ms, mb = d in ms_ids, d in mb_ids
            expected[d] = (ms, mb, not (ms or mb))
            if not (ms or mb):
                kept_ids.append(d)
        kept_df = batch.filter(
            F.col("doc_id").isin(kept_ids) if kept_ids else F.lit(False)
        )
        state = kept_df if state is None else state.unionAll(kept_df)

    assert set(got) == set(expected)
    diffs = {d: (got[d], expected[d]) for d in got if got[d] != expected[d]}
    assert not diffs, f"{len(diffs)} verdict mismatches, e.g. {list(diffs.items())[:3]}"

    # the test bites: later batches must hit state (the fixture plants
    # cross-corpus near-dups), and batch 0 can never match empty state
    assert any(ms for d, (ms, _, _) in got.items() if d % n_batches > 0)
    assert not any(ms for d, (ms, _, _) in got.items() if d % n_batches == 0)


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_replay_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running a batch that ALREADY
    appended its state (driver died before the checkpoint commit) must
    reproduce byte-identical verdicts and state — in particular the
    replayed docs must NOT read themselves back as kept-state and
    self-match at jaccard 1.0 (the failure mode of a plain append sink)."""
    from canvas_data_aws_spark.streaming.near_dedup import (
        NearDedupConfig,
        process_batch,
    )

    base = "the quick brown fox jumps over the lazy dog again and again "
    cfg = NearDedupConfig(
        state_dir=str(tmp_path / "state"), out_dir=str(tmp_path / "verdicts")
    )
    b0 = _mk_docs(
        spark,
        [(1, base * 3), (2, "completely different corpus text here " * 4)],
    )
    # doc 11 near-dups doc 1 (state hit); docs 12/13 are identical
    # (within-batch clique: min-id 12 is kept, 13 drops)
    b1 = _mk_docs(
        spark,
        [
            (11, base * 3 + "tail"),
            (12, "fresh unseen text about spark partitioning " * 4),
            (13, "fresh unseen text about spark partitioning " * 4),
        ],
    )

    process_batch(spark, b0, 0, cfg)
    process_batch(spark, b1, 1, cfg)

    def snap(path):
        return sorted(tuple(r) for r in spark.read.parquet(path).collect())

    v_before = snap(cfg.out_dir)
    bands_before = snap(cfg.bands_dir)
    sigs_before = sorted(
        (r["id"], tuple(r["signature"]), r["batch_id"])
        for r in spark.read.parquet(cfg.sigs_dir).collect()
    )

    # the retry: same batch, same batch_id, state already appended
    process_batch(spark, b1, 1, cfg)

    assert snap(cfg.out_dir) == v_before, "verdicts changed on replay"
    assert snap(cfg.bands_dir) == bands_before, "band state changed on replay"
    got_sigs = sorted(
        (r["id"], tuple(r["signature"]), r["batch_id"])
        for r in spark.read.parquet(cfg.sigs_dir).collect()
    )
    assert got_sigs == sigs_before, "signature state changed on replay"

    verd = {
        r["doc_id"]: (r["matched_state"], r["matched_batch"], r["kept"])
        for r in spark.read.parquet(cfg.out_dir).collect()
    }
    assert verd[11] == (True, False, False), verd  # near-dup of state doc 1
    assert verd[12] == (False, False, True), verd  # min-id of the 12/13 clique
    assert verd[13] == (False, True, False), verd


def test_state_scan_partition_pruned(spark, tmp_path):
    """The batch x state join's state side must be a PARTITION-PRUNED scan:
    band rows live under bucket=... directories and the touched-bucket
    isin lands in the reader's PartitionFilters — at 100 TB the state
    table is the big side and an unpruned scan is the bottleneck."""
    from canvas_data_aws_spark.plans.audit import explain_str
    from canvas_data_aws_spark.streaming.near_dedup import (
        NearDedupConfig,
        process_batch,
        read_state_bands,
    )

    cfg = NearDedupConfig(
        state_dir=str(tmp_path / "state"), out_dir=str(tmp_path / "verdicts")
    )
    docs = _mk_docs(
        spark,
        [(i, f"document number {i} with some shared vocabulary " * 3) for i in range(6)],
    )
    process_batch(spark, docs, 0, cfg)

    st = read_state_bands(spark, cfg.bands_dir, current_batch_id=1, touched_buckets=[0, 1, 2])
    plan = explain_str(st, mode="formatted")
    assert "PartitionFilters" in plan, plan[:2000]
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("bucket" in ln for ln in pf), pf
    assert any("batch_id" in ln for ln in pf), pf  # replay self-exclusion prunes too

    # and the prune is semantics-preserving: pruned union == full read
    full = read_state_bands(spark, cfg.bands_dir, current_batch_id=1, touched_buckets=None)
    all_buckets = [r["bucket"] for r in full.select("bucket").distinct().collect()]
    pruned_all = read_state_bands(spark, cfg.bands_dir, 1, all_buckets)
    assert pruned_all.count() == full.count()


def test_compaction_preserves_verdicts(spark, tmp_path):
    """compact_state folds the per-batch state partitions into the
    batch_id=-1 layer between runs: verdicts for every subsequent batch
    must be identical to the never-compacted state machine, and the state
    file count must actually drop (the operator's reason to exist)."""
    from canvas_data_aws_spark.streaming.near_dedup import (
        NearDedupConfig,
        compact_state,
        process_batch,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    batches = [
        _mk_docs(spark, [(1, base * 4), (2, "unrelated corpus one " * 8)]),
        _mk_docs(spark, [(11, base * 4 + "tail"), (12, "unrelated corpus two " * 8)]),
        _mk_docs(spark, [(21, base * 4 + "tip"), (22, "unrelated corpus two " * 8 + "x")]),
    ]

    def run(compact_after: int | None):
        d = tmp_path / f"c{compact_after}"
        cfg = NearDedupConfig(state_dir=str(d / "state"), out_dir=str(d / "v"))
        stats = None
        for i, b in enumerate(batches):
            process_batch(spark, b, i, cfg)
            if compact_after == i:
                stats = compact_state(spark, cfg)
        verd = sorted(
            (r["doc_id"], r["matched_state"], r["matched_batch"], r["kept"])
            for r in spark.read.parquet(cfg.out_dir).collect()
        )
        return verd, stats

    plain, _ = run(None)
    compacted, stats = run(1)
    assert compacted == plain, "compaction changed verdicts"
    assert stats is not None and stats["files_after"] < stats["files_before"], stats
    # the fixture bites: batch-2 docs must actually hit compacted state
    verd = dict((d, (ms, mb, k)) for d, ms, mb, k in compacted)
    assert verd[21][0] is True, verd  # near-dup of compacted doc 1/11 family
    assert verd[22][0] is True, verd  # near-dup of compacted doc 12


def test_compaction_crash_recovery(spark, tmp_path):
    """The two-rename swap is not atomic: a death between rename(path->old)
    and rename(tmp->path) leaves the live state dir MISSING. The next
    compact_state must roll the .pre_compact backup forward (never treat
    the state as empty), and a stale backup from a completed swap must not
    break the next swap's rename."""
    import os
    import shutil

    from canvas_data_aws_spark.streaming.near_dedup import (
        NearDedupConfig,
        compact_state,
        process_batch,
        read_state_bands,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    cfg = NearDedupConfig(
        state_dir=str(tmp_path / "state"), out_dir=str(tmp_path / "v")
    )
    process_batch(spark, _mk_docs(spark, [(1, base * 4)]), 0, cfg)
    n_bands = read_state_bands(spark, cfg.bands_dir, 99).count()
    assert n_bands > 0

    # simulate the mid-swap crash: live dir renamed away, tmp half-written
    os.rename(cfg.bands_dir, cfg.bands_dir + ".pre_compact")
    os.makedirs(cfg.bands_dir + ".compact_tmp", exist_ok=True)

    stats = compact_state(spark, cfg)
    assert stats["rows"] > 0, "recovery must roll the backup forward"
    assert read_state_bands(spark, cfg.bands_dir, 99).count() == n_bands
    assert not os.path.isdir(cfg.bands_dir + ".pre_compact")
    assert not os.path.isdir(cfg.bands_dir + ".compact_tmp")

    # stale backup from a COMPLETED swap alongside a live dir: discarded,
    # and a second compaction still succeeds
    shutil.copytree(cfg.bands_dir, cfg.bands_dir + ".pre_compact")
    stats2 = compact_state(spark, cfg)
    assert stats2["rows"] == stats["rows"]
    assert not os.path.isdir(cfg.bands_dir + ".pre_compact")

def test_compact_state_leaves_verdicts_sink_untouched(spark, tmp_path):
    """Round-11 advice: compact_state's scope is the two RE-READ state dirs
    (bands, sigs) ONLY. The verdicts sink (out_dir) is an append-only
    OUTPUT whose batch_id partitions are consumer-facing provenance
    (incremental consumers tail batches > their high-water mark), so
    compaction must not rewrite, fold, or even touch it."""
    import os

    from canvas_data_aws_spark.streaming.near_dedup import (
        NearDedupConfig,
        compact_state,
        process_batch,
    )

    cfg = NearDedupConfig(
        state_dir=str(tmp_path / "state"), out_dir=str(tmp_path / "verdicts")
    )
    for i in range(2):
        docs = _mk_docs(
            spark,
            [(10 * i + j, f"batch {i} doc {j} body text " * 4) for j in range(3)],
        )
        process_batch(spark, docs, i, cfg)

    def verdict_files(root):
        return sorted(
            (os.path.relpath(os.path.join(d, f), root), os.stat(os.path.join(d, f)).st_mtime_ns)
            for d, _, fs in os.walk(root)
            for f in fs
            if f.endswith(".parquet")
        )

    before = verdict_files(cfg.out_dir)
    assert before, "fixture wrote no verdicts"
    batch_ids_before = sorted(
        r["batch_id"]
        for r in spark.read.parquet(cfg.out_dir).select("batch_id").distinct().collect()
    )
    assert batch_ids_before == [0, 1]

    stats = compact_state(spark, cfg)
    assert stats["files_after"] < stats["files_before"]

    assert verdict_files(cfg.out_dir) == before, (
        "compact_state touched the verdicts sink — out_dir is an append-only "
        "output, not state"
    )

def test_compaction_policy_ignores_compacted_layer_files(spark, tmp_path):
    """/code-review finding (round 12): the files trigger must count LIVE
    partitions only — a store whose steady-state compacted file count
    exceeds max_state_files would otherwise be permanently 'due' and every
    scheduled run would rewrite the whole state for zero reduction."""
    from canvas_data_aws_spark.streaming.near_dedup import (
        NearDedupConfig,
        compact_state,
        compaction_due,
        process_batch,
    )

    cfg = NearDedupConfig(
        state_dir=str(tmp_path / "state"), out_dir=str(tmp_path / "v")
    )
    for i in range(2):
        docs = _mk_docs(
            spark, [(10 * i + j, f"policy fixture {i} {j} words " * 4) for j in range(3)]
        )
        process_batch(spark, docs, i, cfg)

    before = compaction_due(cfg, max_state_files=0, max_batches=999)
    assert before["files"] > 0 and before["due"] is True

    compact_state(spark, cfg)
    after = compaction_due(cfg, max_state_files=0, max_batches=0)
    assert after["files"] == 0 and after["batches"] == 0, after
    assert after["due"] is False, (
        "the batch_id=-1 layer re-triggered the files counter — permanent "
        "rewrite loop at steady state"
    )


def test_cli_compact_recovers_mid_swap_crash_before_policy(spark, tmp_path, capsys):
    """/code-review finding (round 12): a compaction that died between the
    two swap renames leaves a state dir MISSING; the CLI verb's policy
    early-return must not skip the roll-forward, or the next stream run
    silently treats the state as empty and re-admits every near-dup."""
    import json as _json
    import os

    import canvas_data_aws_spark.__main__ as cli
    from canvas_data_aws_spark.streaming.near_dedup import (
        NearDedupConfig,
        process_batch,
    )

    cfg = NearDedupConfig(
        state_dir=str(tmp_path / "state"), out_dir=str(tmp_path / "v")
    )
    docs = _mk_docs(spark, [(1, "crash recovery corpus text " * 5)])
    process_batch(spark, docs, 0, cfg)

    # simulate the mid-swap crash: live sigs dir renamed away, new dir never
    # landed — the store now looks absent to any naive policy scan
    os.rename(cfg.sigs_dir, cfg.sigs_dir + ".pre_compact")
    assert not os.path.isdir(cfg.sigs_dir)

    # default thresholds: policy says not-due -> early return path taken
    assert cli.main(["compact", "--state-dir", cfg.state_dir]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["compacted"] is False

    # ... but the roll-forward must have happened anyway
    assert os.path.isdir(cfg.sigs_dir), (
        "mid-swap backup not rolled forward — next stream run would see "
        "empty signature state"
    )
    assert not os.path.isdir(cfg.sigs_dir + ".pre_compact")

    # and the recovered state answers: an exact re-delivery of doc 1's text
    # in a later batch must match state
    probe = _mk_docs(spark, [(9, "crash recovery corpus text " * 5 + "tail")])
    process_batch(spark, probe, 1, cfg)
    verd = {
        r["doc_id"]: r["matched_state"]
        for r in spark.read.parquet(cfg.out_dir).collect()
    }
    assert verd[9] is True, verd


def test_expire_verdicts_retention(spark, tmp_path):
    """Round-12 verdict item 5: the verdicts sink grows n_salt files per
    batch forever BY DESIGN (consumer-tailed provenance) — expire_verdicts
    is the documented months-long-deployment answer. Expired batches'
    partitions disappear; live batches re-read byte-identically; future
    batches' verdict correctness vs state is unchanged (the sink is never
    re-read as state); idempotent."""
    import json as _json

    import canvas_data_aws_spark.__main__ as cli
    from canvas_data_aws_spark.streaming.near_dedup import (
        NearDedupConfig,
        expire_verdicts,
        process_batch,
    )

    cfg = NearDedupConfig(
        state_dir=str(tmp_path / "state"), out_dir=str(tmp_path / "verdicts")
    )
    for i in range(3):
        docs = _mk_docs(
            spark,
            [(10 * i + j, f"retention fixture {i} doc {j} body " * 4) for j in range(3)],
        )
        process_batch(spark, docs, i, cfg)

    live_before = sorted(
        tuple(r) for r in spark.read.parquet(cfg.out_dir)
        .filter(F.col("batch_id") >= 1).collect()
    )

    stats = expire_verdicts(cfg.out_dir, before_batch_id=1)
    assert stats["removed_batches"] == [0] and stats["removed_files"] > 0
    assert not os.path.isdir(os.path.join(cfg.out_dir, "batch_id=0"))
    assert os.path.isdir(os.path.join(cfg.out_dir, "batch_id=1"))

    # live batches re-read byte-identically
    live_after = sorted(
        tuple(r) for r in spark.read.parquet(cfg.out_dir).collect()
    )
    assert live_after == live_before

    # idempotent: nothing left to remove in the expired range
    again = expire_verdicts(cfg.out_dir, before_batch_id=1)
    assert again == {"removed_batches": [], "removed_files": 0}

    # future-batch verdict correctness unchanged: an exact re-delivery of a
    # batch-0 doc's text (kept in STATE, which retention never touches)
    # must still match state after expiration
    probe = _mk_docs(spark, [(99, "retention fixture 0 doc 0 body " * 4)])
    process_batch(spark, probe, 3, cfg)
    verd = {
        r["doc_id"]: r["matched_state"]
        for r in spark.read.parquet(cfg.out_dir).filter("batch_id = 3").collect()
    }
    assert verd[99] is True, verd


def test_cli_compact_expire_verdicts_flag(spark, tmp_path, capsys):
    """`compact --verdicts-dir ... --expire-verdicts-before N` expires even
    when the state-store policy says not-due (retention is an explicit
    operator decision, not a compaction side effect), reports the stats in
    the JSON line, and the flags must be given together."""
    import json as _json

    import canvas_data_aws_spark.__main__ as cli
    from canvas_data_aws_spark.streaming.near_dedup import (
        NearDedupConfig,
        process_batch,
    )

    cfg = NearDedupConfig(
        state_dir=str(tmp_path / "state"), out_dir=str(tmp_path / "verdicts")
    )
    for i in range(2):
        docs = _mk_docs(
            spark, [(10 * i + j, f"cli retention {i} {j} words " * 4) for j in range(2)]
        )
        process_batch(spark, docs, i, cfg)

    # default thresholds: not-due -> early-return path, retention still runs
    rc = cli.main(
        [
            "compact",
            "--state-dir", cfg.state_dir,
            "--verdicts-dir", cfg.out_dir,
            "--expire-verdicts-before", "1",
        ]
    )
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["compacted"] is False
    assert out["verdicts_expired"]["removed_batches"] == [0]
    assert not os.path.isdir(os.path.join(cfg.out_dir, "batch_id=0"))
    assert os.path.isdir(os.path.join(cfg.out_dir, "batch_id=1"))

    # the two flags are a pair
    rc = cli.main(["compact", "--state-dir", cfg.state_dir,
                   "--expire-verdicts-before", "1"])
    assert rc == 2
    err = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "together" in err["error"]
