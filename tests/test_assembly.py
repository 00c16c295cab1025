"""Training-set assembly: operators/assembly.py, plans/assembly_q.py, and
the `assemble` CLI pipeline (pipelines/assemble.py).

The oracle gate (tests/test_queries_oracle.py) already value-checks the
three registry entries against DuckDB; these tests pin the SEMANTIC
contracts the oracle can't see — budget honoring, epoch invariance,
packing arithmetic, marker idempotence/versioning."""

from __future__ import annotations

import json
import math
import os

import pyspark.sql.functions as F

from canvas_data_aws_spark.operators.assembly import (
    epoch_instances,
    mixture_epochs,
    pack_boundary_split,
    shuffle_shard_pack,
)
from canvas_data_aws_spark.sources.parquet import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_mixture_epochs_budget_allocation(spark, sf_dir):
    """The per-source token allocation (epochs * n_tokens) sums to the
    budget (up to the 6dp rounding on epochs), and alpha < 1 gives small
    sources MORE epochs than their proportional share — the rebalance the
    operator exists for."""
    eps = mixture_epochs(_docs(spark, sf_dir), alpha=0.5, token_budget=50_000.0)
    rows = {r["source"]: r for r in eps.collect()}
    allocated = sum(r["epochs"] * r["n_tokens"] for r in rows.values())
    assert abs(allocated - 50_000.0) < 1.0
    small = min(rows.values(), key=lambda r: r["n_tokens"])
    big = max(rows.values(), key=lambda r: r["n_tokens"])
    assert small["epochs"] > big["epochs"]


def test_mixture_epochs_no_budget_is_identity(spark, sf_dir):
    eps = mixture_epochs(_docs(spark, sf_dir), token_budget=None)
    assert {r["epochs"] for r in eps.collect()} == {1.0}


def test_epoch_instances_exact_expansion(spark, sf_dir):
    """Instance counts per doc equal floor(epochs) + [u < frac] computed
    independently in Python over the same Knuth-hash arithmetic — the
    upsampling is deterministic arithmetic, not sampling."""
    docs = _docs(spark, sf_dir)
    eps = mixture_epochs(docs, alpha=0.5, token_budget=100_000.0)
    eps_by_source = {r["source"]: r["epochs"] for r in eps.collect()}
    inst = epoch_instances(docs, eps)
    got = {
        r["doc_id"]: r["n"]
        for r in inst.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    base = docs.filter(F.length(F.trim("text")) > 0).select(
        "doc_id", "source"
    ).collect()
    for r in base:
        e6 = round(eps_by_source[r["source"]], 6)
        frac = round(e6 - math.floor(e6), 6)
        u = ((r["doc_id"] * 2654435761 + 48271) % 4294967296 + 1) / 4294967297.0
        want = math.floor(e6) + (1 if u < frac else 0)
        assert got.get(r["doc_id"], 0) == want, f"doc {r['doc_id']}"


def test_knuth_uniform_no_overflow_at_production_ids(spark):
    """The split-multiply uniform matches the naive Python arithmetic
    (exact big ints) INCLUDING ids past Long.MAX/A ~ 3.47e9, where the
    naive Spark expression throws ARITHMETIC_OVERFLOW under ANSI — the
    1000x-probe finding (replica-shifted doc_id ~1e10, i.e. a year of
    production ingest)."""
    from canvas_data_aws_spark.operators.assembly import knuth_uniform

    ids = [0, 1, 499, 3_470_000_000, 9_999_999_999, 2**40 + 17]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    got = {
        r["doc_id"]: r["u"]
        for r in df.select(
            "doc_id", knuth_uniform(F.col("doc_id"), 48271).alias("u")
        ).collect()
    }
    for i in ids:
        want = ((i * 2654435761 + 48271) % 4294967296 + 1) / 4294967297.0
        assert got[i] == want, i


def test_shuffle_shard_pack_batch_arithmetic(spark, sf_dir):
    """batch_id = floor(tokens-before / seq_len) within each shard's key
    order, recomputed independently from the emitted (pos, n_tokens) —
    and the general-shard-count variant keeps shards in range."""
    docs = _docs(spark, sf_dir)
    inst = epoch_instances(docs, mixture_epochs(docs, token_budget=None))
    packed = shuffle_shard_pack(inst, seed="t", seq_len=64, n_shards=8)
    rows = packed.orderBy("shard", "pos").collect()
    assert {r["shard"] for r in rows} <= set(range(8))
    before: dict[int, int] = {}
    for r in rows:
        b = before.get(r["shard"], 0)
        assert r["batch_id"] == b // 64, (r["shard"], r["pos"])
        before[r["shard"]] = b + r["n_tokens"]


def test_epochs_share_instances_but_not_order(spark, sf_dir):
    """Two epochs hold the SAME instance multiset (the mixture draw is
    epoch-independent) in different orders (the shuffle seed is the
    epoch) — the reproducibility property training audits check."""
    docs = _docs(spark, sf_dir)
    inst = epoch_instances(docs, mixture_epochs(docs, alpha=0.5))
    e1 = shuffle_shard_pack(inst, seed="epoch1", seq_len=128)
    e2 = shuffle_shard_pack(inst, seed="epoch2", seq_len=128)
    multiset1 = sorted((r["doc_id"], r["rep"]) for r in e1.collect())
    multiset2 = sorted((r["doc_id"], r["rep"]) for r in e2.collect())
    assert multiset1 == multiset2
    order1 = [(r["doc_id"], r["rep"]) for r in e1.orderBy("shard", "pos").collect()]
    order2 = [(r["doc_id"], r["rep"]) for r in e2.orderBy("shard", "pos").collect()]
    assert order1 != order2


def test_pack_boundary_split_invariants(spark, sf_dir):
    """Zero-padding packing: per source, every sequence fills to EXACTLY
    capacity except the stream's last; token totals conserve; sequence ids
    are dense from 0; and starts_mid_doc is true iff the previous
    sequence's boundary fell inside a document (cross-checked against the
    n_docs/fill arithmetic: a sequence starting mid-doc shares its first
    doc with its predecessor)."""
    cap = 64
    docs = _docs(spark, sf_dir)
    packed = pack_boundary_split(docs, capacity=cap).collect()
    n_tok_by_source = {
        r["source"]: r["t"]
        for r in docs.filter(F.length(F.trim("text")) > 0)
        .groupBy("source")
        .agg(
            F.sum(
                F.size(
                    F.filter(
                        F.split(F.trim("text"), r"\s+"),
                        lambda x: F.length(x) > 0,
                    )
                )
            ).alias("t")
        )
        .collect()
    }
    by_source: dict[str, list] = {}
    for r in packed:
        by_source.setdefault(r["source"], []).append(r)
    assert set(by_source) == set(n_tok_by_source)
    for src, rows in by_source.items():
        rows.sort(key=lambda r: r["seq_id"])
        assert [r["seq_id"] for r in rows] == list(range(len(rows)))
        assert sum(r["n_tokens"] for r in rows) == n_tok_by_source[src]
        for r in rows[:-1]:
            assert r["n_tokens"] == cap, (src, r["seq_id"])
        assert 0 < rows[-1]["n_tokens"] <= cap
        # first sequence of a stream can never be a continuation
        assert rows[0]["starts_mid_doc"] is False


def test_cli_assemble_build_noop_and_recipe_change(spark, sf_dir, tmp_path):
    """E2E through the CLI: first run builds v1; an identical re-run is a
    no-op (marker fingerprint); a changed recipe (seq_len) rebuilds the
    SAME epoch under a new version without touching v1; and the written
    manifest conserves tokens exactly (written sum == instance-table
    sum)."""
    import canvas_data_aws_spark.__main__ as cli

    out = str(tmp_path / "asm")
    args = ["assemble", "--sf-dir", sf_dir, "--out", out, "--seq-len", "128"]
    assert cli.main(args) == 0
    marker = json.load(open(os.path.join(out, "_assemble_state.json")))
    assert marker["epochs"]["1"]["dir"] == "sequences_v1.parquet"

    # token conservation vs an independent recomputation
    docs = _docs(spark, sf_dir)
    inst = epoch_instances(docs, mixture_epochs(docs, alpha=0.5))
    want_tokens = inst.agg(F.sum("n_tokens")).collect()[0][0]
    written = spark.read.parquet(os.path.join(out, "sequences_v1.parquet"))
    assert written.agg(F.sum("n_tokens")).collect()[0][0] == want_tokens

    # no-op: marker unchanged
    assert cli.main(args) == 0
    marker2 = json.load(open(os.path.join(out, "_assemble_state.json")))
    assert marker2 == marker

    # recipe change: same epoch, new version dir; v1 still readable
    assert cli.main(
        ["assemble", "--sf-dir", sf_dir, "--out", out, "--seq-len", "256"]
    ) == 0
    marker3 = json.load(open(os.path.join(out, "_assemble_state.json")))
    assert marker3["epochs"]["1"]["dir"] == "sequences_v2.parquet"
    assert written.count() > 0


def test_cli_curate_then_assemble_chain(spark, sf_dir, tmp_path):
    """The curate -> assemble chain: --keep-from a curate export assembles
    EXACTLY the curated survivor set (doc ids match the export), with
    mixture metadata re-read from the source table; and the keep_from
    path is part of the recipe fingerprint (dropping it rebuilds)."""
    import canvas_data_aws_spark.__main__ as cli

    curated = str(tmp_path / "curated")
    assert cli.main(["curate", "--sf-dir", sf_dir, "--out", curated]) == 0
    out = str(tmp_path / "asm")
    assert cli.main(
        ["assemble", "--sf-dir", sf_dir, "--out", out, "--keep-from", curated]
    ) == 0
    want_ids = {
        r["doc_id"]
        for r in spark.read.parquet(curated).select("doc_id").distinct().collect()
    }
    got_ids = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out, "sequences_v1.parquet"))
        .select("doc_id")
        .distinct()
        .collect()
    }
    # every assembled doc is a curated survivor; under the default budget
    # the mixture keeps a subset (or upsamples), never a non-survivor
    assert got_ids <= want_ids
    assert got_ids  # non-degenerate
    # recipe change (drop keep_from): rebuild under a new version
    assert cli.main(["assemble", "--sf-dir", sf_dir, "--out", out]) == 0
    marker = json.load(open(os.path.join(out, "_assemble_state.json")))
    assert marker["epochs"]["1"]["dir"] == "sequences_v2.parquet"


def test_cli_assemble_split_mode(spark, sf_dir, tmp_path):
    """--split writes the zero-padding layout: per shard every sequence
    fills to EXACTLY seq_len except the last; fragments of one instance
    carry contiguous offsets summing to the doc's token count; and total
    tokens equal the non-split run's (same recipe, same instances — only
    the layout differs)."""
    import canvas_data_aws_spark.__main__ as cli

    out = str(tmp_path / "asm")
    assert cli.main(
        ["assemble", "--sf-dir", sf_dir, "--out", out, "--seq-len", "128",
         "--split"]
    ) == 0
    frags = spark.read.parquet(os.path.join(out, "sequences_v1.parquet"))
    rows = frags.collect()

    # per-(shard, seq) fill: exactly 128 except each shard's max seq_id
    fill: dict[tuple, int] = {}
    for r in rows:
        fill[(r["shard"], r["seq_id"])] = (
            fill.get((r["shard"], r["seq_id"]), 0) + r["n_tokens"]
        )
    last = {}
    for (shard, seq), _t in fill.items():
        last[shard] = max(last.get(shard, -1), seq)
    for (shard, seq), t in fill.items():
        if seq != last[shard]:
            assert t == 128, (shard, seq, t)
        else:
            assert 0 < t <= 128

    # fragment contiguity per instance
    by_inst: dict[tuple, list] = {}
    for r in rows:
        by_inst.setdefault((r["shard"], r["pos"]), []).append(r)
    for frag_list in by_inst.values():
        frag_list.sort(key=lambda r: r["offset_in_doc"])
        assert frag_list[0]["offset_in_doc"] == 0
        for a, b in zip(frag_list, frag_list[1:]):
            assert b["offset_in_doc"] == a["offset_in_doc"] + a["n_tokens"]

    # token total matches the non-split run of the same recipe
    out2 = str(tmp_path / "asm_nosplit")
    assert cli.main(
        ["assemble", "--sf-dir", sf_dir, "--out", out2, "--seq-len", "128"]
    ) == 0
    whole = spark.read.parquet(os.path.join(out2, "sequences_v1.parquet"))
    assert (
        frags.agg(F.sum("n_tokens")).collect()[0][0]
        == whole.agg(F.sum("n_tokens")).collect()[0][0]
    )


def test_cli_assemble_verify_mode(spark, sf_dir, tmp_path):
    """--verify audits an existing state dir: a freshly built pair of
    epochs (one split, one not) passes every check and exits 0; deleting
    a shard partition from one dataset flips summary_match for that epoch
    only and the exit code to 1; a marker pointing at a missing dir
    reports the error instead of crashing."""
    import shutil

    import canvas_data_aws_spark.__main__ as cli

    out = str(tmp_path / "asm")
    base = ["assemble", "--sf-dir", sf_dir, "--out", out, "--seq-len", "128"]
    assert cli.main(base) == 0
    assert cli.main(base + ["--epoch", "2", "--split"]) == 0
    assert cli.main(["assemble", "--out", out, "--verify"]) == 0

    # corrupt epoch 2: drop one written shard partition
    v2 = os.path.join(out, "sequences_v2.parquet")
    shard_dir = next(
        d for d in sorted(os.listdir(v2)) if d.startswith("shard=")
    )
    shutil.rmtree(os.path.join(v2, shard_dir))
    assert cli.main(["assemble", "--out", out, "--verify"]) == 1

    from canvas_data_aws_spark.pipelines.assemble import verify_assemble

    report = verify_assemble(spark, out)
    assert report["epochs"]["1"]["ok"] is True
    assert report["epochs"]["2"]["summary_match"] is False
    assert report["ok"] is False

    # marker pointing at a missing dir: reported, not raised
    shutil.rmtree(v2)
    report2 = verify_assemble(spark, out)
    assert report2["epochs"]["2"]["ok"] is False
    assert "error" in report2["epochs"]["2"]


def test_cli_assemble_truncated_marker_is_no_state(spark, sf_dir, tmp_path):
    """A hand-truncated marker reads as no-state (writes are atomic, so
    truncation can't come from a crash) — the run rebuilds rather than
    crashing."""
    import canvas_data_aws_spark.__main__ as cli

    out = str(tmp_path / "asm")
    os.makedirs(out)
    with open(os.path.join(out, "_assemble_state.json"), "w") as fh:
        fh.write('{"next_version": 1, "epo')
    assert cli.main(["assemble", "--sf-dir", sf_dir, "--out", out]) == 0
    marker = json.load(open(os.path.join(out, "_assemble_state.json")))
    assert marker["epochs"]["1"]["dir"] == "sequences_v1.parquet"
