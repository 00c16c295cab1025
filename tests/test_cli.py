"""CLI surface (`python -m canvas_data_aws_spark`): the operator-facing
equivalent of the reference's Lambda handlers — list/query wired to the
registry, sync wired to the reconciler with a local HTTP-free fixture."""

from __future__ import annotations

import json


def test_cli_list_filters_by_tag(capsys):
    from canvas_data_aws_spark.__main__ import main

    assert main(["list", "--tag", "tpch"]) == 0
    out = capsys.readouterr().out
    assert "tpch_q3" in out and "tpch_q2_shipped" in out
    assert "dedup_minhash" not in out


def test_cli_query_unknown_name_is_usage_error(capsys):
    from canvas_data_aws_spark.__main__ import main

    assert main(["query", "no_such_query"]) == 2


def test_cli_sync_dry_run_local_fixture(spark, tmp_path, capsys, monkeypatch):
    """End-to-end sync through the CLI path with a file:// manifest served
    by a stub client: dry-run prints the summary JSON and touches nothing."""
    import canvas_data_aws_spark.__main__ as cli

    src = tmp_path / "remote"
    src.mkdir()
    (src / "a.gz").write_bytes(b"x" * 10)
    rows = [
        {
            "table": "accounts",
            "filename": "a.gz",
            "url": f"file://{src}/a.gz",
        }
    ]

    class _StubClient:
        def __init__(self, *a, **k):
            pass

        def sync_manifest_rows(self):
            return rows

    monkeypatch.setattr(
        "canvas_data_aws_spark.ingest.api_client.CanvasDataClient", _StubClient
    )
    monkeypatch.setenv("api_key", "k")
    monkeypatch.setenv("api_secret", "s")
    lake = tmp_path / "lake"
    rc = cli.main(["sync", "--root", str(lake), "--dry-run"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(out[-1])
    assert summary["dry_run"] is True and summary["total_files"] == 1
    assert not lake.exists() or not any(lake.rglob("a.gz"))
