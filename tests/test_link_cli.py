"""E2E tests for the `link` CLI verb / pipelines/link.py: batch run, day-2
incremental run (equivalence with the link_incremental_match registry
entry), idempotent no-op re-run, and marker/versioning crash discipline."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from canvas_data_aws_spark.pipelines.link import MARKER, run_link

BASE_WHERE = "doc_id % 10 < 8"


@pytest.fixture(scope="module")
def linked(spark, sf_dir, tmp_path_factory):
    """Day-1 batch over 80% of docs, then day-2 incremental over the rest."""
    out = str(tmp_path_factory.mktemp("link_state"))
    day1 = run_link(spark, sf_dir, out, where=BASE_WHERE)
    day2 = run_link(spark, sf_dir, out)
    return out, day1, day2


def test_batch_run_outputs(spark, sf_dir, linked):
    out, day1, _ = linked
    assert day1["mode"] == "batch" and day1["run"] == 1
    marker = json.load(open(os.path.join(out, MARKER)))
    assert marker["run"] == 2  # day2 bumped it
    ents = spark.read.parquet(os.path.join(out, "entities_v1.parquet"))
    n_base = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(BASE_WHERE).count()
    assert ents.count() == n_base == day1["n_scope"]
    # entity invariants: canonical id is a member of its own entity
    ids = {r.doc_id for r in ents.collect()}
    assert all(r.entity_id in ids for r in ents.collect())
    golden = spark.read.parquet(os.path.join(out, "golden_v1.parquet"))
    assert golden.count() == day1["n_entities"]
    assert golden.agg(F.sum("n_members")).head()[0] == n_base


def test_incremental_run_matches_registry_entry(spark, sf_dir, linked):
    """Day-2 assignments == the oracle-checked link_incremental_match
    registry entry at the same 80/20 split (the CLI path and the query
    path share semantics, not just code)."""
    out, _, day2 = linked
    assert day2["mode"] == "incremental" and day2["run"] == 2
    assert day2["n_delta"] > 0 and day2["n_matched"] > 0

    from canvas_data_aws_spark.plans.registry import all_queries

    expected = {
        (r.doc_id, r.entity_id, r.matched)
        for r in all_queries()["link_incremental_match"].fn(spark, sf_dir).collect()
    }
    marker = json.load(open(os.path.join(out, MARKER)))
    ents = spark.read.parquet(os.path.join(out, marker["dirs"]["entities"]))
    got = {
        (r.doc_id, r.entity_id, r.matched)
        for r in ents.filter(F.col("run") == 2).collect()
    }
    assert got == expected


def test_incremental_union_covers_all_docs(spark, sf_dir, linked):
    out, _, day2 = linked
    marker = json.load(open(os.path.join(out, MARKER)))
    ents = spark.read.parquet(os.path.join(out, marker["dirs"]["entities"]))
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert ents.count() == n_docs
    assert ents.select("doc_id").distinct().count() == n_docs
    golden = spark.read.parquet(os.path.join(out, marker["dirs"]["golden"]))
    assert golden.agg(F.sum("n_members")).head()[0] == n_docs
    assert golden.count() == day2["n_entities"]


def test_rerun_is_noop(spark, sf_dir, linked):
    out, _, _ = linked
    before = json.load(open(os.path.join(out, MARKER)))
    again = run_link(spark, sf_dir, out)
    assert again.get("noop") is True and again["n_delta"] == 0
    after = json.load(open(os.path.join(out, MARKER)))
    assert after == before  # no version bump, no rewrite


def test_cli_verb_end_to_end(spark, sf_dir, tmp_path, capsys):
    from canvas_data_aws_spark.__main__ import main

    out = str(tmp_path / "state")
    rc = main(["link", "--sf-dir", sf_dir, "--out", out, "--where", BASE_WHERE])
    assert rc == 0
    line = [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")][-1]
    s1 = json.loads(line)
    assert s1["mode"] == "batch" and s1["n_scope"] > 0
    rc = main(["link", "--sf-dir", sf_dir, "--out", out])
    assert rc == 0
    line = [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")][-1]
    s2 = json.loads(line)
    assert s2["mode"] == "incremental" and s2["run"] == 2


def test_marker_survives_partial_retry(spark, sf_dir, linked, tmp_path):
    """Crash discipline: versioned dirs + atomic marker — a new run's
    outputs land in NEW dirs, so whatever exists at the marker's recorded
    paths stays complete. Simulate a crashed run by planting orphan dirs:
    the reader ignores them."""
    out, _, _ = linked
    os.makedirs(os.path.join(out, "entities_v99.parquet"), exist_ok=True)
    marker = json.load(open(os.path.join(out, MARKER)))
    assert marker["run"] == 2  # orphan does not perturb state
    ents = spark.read.parquet(os.path.join(out, marker["dirs"]["entities"]))
    assert ents.count() > 0
