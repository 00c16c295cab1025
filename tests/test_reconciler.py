"""Sync reconciler tests: the skip/fetch/delete verdict semantics of the
reference's diff loop (sync-canvas-data-files.py:58-112) over synthetic
manifests, plus apply/dry-run/idempotence behavior (SURVEY.md §5)."""

from __future__ import annotations

import os

from canvas_data_aws_spark.ingest.reconciler import (
    SyncEngine,
    copy_fetcher,
    local_listing,
    manifest_from_rows,
    reconcile,
)


def _remote(*names):
    return [
        {"table": n.split("/")[0], "filename": n.split("/")[1], "url": f"file:///src/{n}"}
        for n in names
    ]


def _touch(root, *keys):
    for k in keys:
        p = os.path.join(root, "raw_files", k)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w") as f:
            f.write(f"data:{k}")


def test_verdicts(spark, tmp_path):
    root = str(tmp_path)
    _touch(root, "users/a.gz", "users/b.gz", "courses/old.gz")
    remote = manifest_from_rows(spark, _remote("users/a.gz", "users/b.gz", "users/c.gz"))
    local = local_listing(spark, root)
    plan = reconcile(remote, local)
    verdicts = {r["key"]: r["verdict"] for r in plan.collect()}
    assert verdicts == {
        "raw_files/users/a.gz": "skip",
        "raw_files/users/b.gz": "skip",
        "raw_files/users/c.gz": "fetch",
        "raw_files/courses/old.gz": "delete",
    }
    # key layout parity: raw_files/{table}/{filename} (sync-canvas-data-files.py:60)
    fetch = [r for r in plan.collect() if r["verdict"] == "fetch"][0]
    assert fetch["table"] == "users" and fetch["filename"] == "c.gz"


def test_apply_converges_to_mirror(spark, tmp_path):
    root = str(tmp_path / "lake")
    src = tmp_path / "srcdata"
    os.makedirs(src)
    (src / "c.gz").write_text("fresh-c")
    _touch(root, "users/a.gz", "courses/old.gz")

    remote = [
        {"table": "users", "filename": "a.gz", "url": "file:///nonexistent/a.gz"},  # skip: never fetched
        {"table": "users", "filename": "c.gz", "url": f"file://{src}/c.gz"},
    ]
    engine = SyncEngine(root=root)
    summary = engine.apply(spark, remote, copy_fetcher())
    assert summary.as_dict() == {
        "total_files": 3,
        "files_fetched": 1,
        "files_skipped": 1,
        "files_removed": 1,
        "tables_created": 0,
        "tables_updated": 0,
        "dry_run": False,
    }
    assert open(os.path.join(root, "raw_files/users/c.gz")).read() == "fresh-c"
    assert not os.path.exists(os.path.join(root, "raw_files/courses/old.gz"))
    assert os.path.exists(os.path.join(root, "raw_files/users/a.gz"))

    # second run: converged state => everything skips, nothing changes
    summary2 = SyncEngine(root=root).apply(spark, remote, copy_fetcher())
    assert summary2.files_fetched == 0
    assert summary2.files_skipped == 2
    assert summary2.files_removed == 0


def test_idempotence_guard_skips_existing(spark, tmp_path):
    """Double-dispatch race defused: destination exists => fetcher not called
    (fetch-canvas-data-file.py:25-31)."""
    root = str(tmp_path)
    _touch(root, "users/a.gz")
    calls = []

    engine = SyncEngine(root=root)
    plan_row = {"table": "users", "filename": "a.gz", "url": "file:///x"}

    # simulate a stale plan that thinks a.gz needs fetching by deleting it
    # from the listing after planning: easiest is to call the internal path
    # via apply on an empty lake dir but pre-creating the dest mid-flight.
    os.remove(os.path.join(root, "raw_files/users/a.gz"))
    summary = engine.apply(
        spark,
        [plan_row],
        lambda url, dest: calls.append(url) or open(dest, "w").write("x"),
    )
    assert summary.files_fetched == 1 and calls == ["file:///x"]

    # now the file exists; a fetch verdict can no longer re-download
    calls.clear()
    engine2 = SyncEngine(root=root)
    engine2.apply(spark, [plan_row], lambda url, dest: calls.append(url))
    assert calls == []  # verdict was 'skip'; guard + diff both protect


def test_dry_run_no_side_effects(spark, tmp_path):
    root = str(tmp_path)
    _touch(root, "courses/old.gz")
    engine = SyncEngine(root=root, dry_run=True)
    summary = engine.apply(
        spark,
        [{"table": "users", "filename": "new.gz", "url": "file:///x"}],
        copy_fetcher(),
    )
    assert summary.dry_run is True
    assert summary.files_fetched == 1 and summary.files_removed == 1  # intended, not done
    assert os.path.exists(os.path.join(root, "raw_files/courses/old.gz"))
    assert not os.path.exists(os.path.join(root, "raw_files/users/new.gz"))
    assert any("DRY RUN: would fetch" in line for line in engine.log)
    assert any("DRY RUN: would delete" in line for line in engine.log)
