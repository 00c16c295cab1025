"""secrets_resolution parity: secret-store-first/env-fallback credential
resolution (sync-canvas-data-files.py:17-24) and signed-header delivery
through the HTTP fetcher."""

from __future__ import annotations

import hashlib
import hmac
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from canvas_data_aws_spark.ingest.credentials import (
    ApiCredentials,
    CredentialsError,
    hmac_auth_headers,
    resolve_credentials,
)
from canvas_data_aws_spark.ingest.fetchers import http_fetcher


def test_secret_file_wins(tmp_path):
    f = tmp_path / "secret.json"
    f.write_text(json.dumps({"api_key": "k-file", "api_secret": "s-file"}))
    creds = resolve_credentials(str(f), env={"api_key": "k-env", "api_secret": "s-env"})
    assert creds == ApiCredentials("k-file", "s-file")


def test_env_fallback_on_bad_secret(tmp_path):
    missing = str(tmp_path / "nope.json")
    creds = resolve_credentials(missing, env={"api_key": "k-env", "api_secret": "s-env"})
    assert creds == ApiCredentials("k-env", "s-env")
    malformed = tmp_path / "bad.json"
    malformed.write_text("{not json")
    creds = resolve_credentials(str(malformed), env={"api_key": "k", "api_secret": "s"})
    assert creds.api_key == "k"


def test_no_source_raises():
    with pytest.raises(CredentialsError):
        resolve_credentials(None, env={})


def test_signed_headers_reach_the_server(tmp_path):
    seen = {}

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            seen["auth"] = self.headers.get("Authorization")
            body = b"ok"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        creds = ApiCredentials("key1", "sec1")
        url = f"http://127.0.0.1:{srv.server_address[1]}/f.gz"
        http_fetcher(headers=hmac_auth_headers(creds))(url, str(tmp_path / "f.gz"))
    finally:
        srv.shutdown()

    expected_sig = hmac.new(b"sec1", url.encode(), hashlib.sha256).hexdigest()
    assert seen["auth"] == f"HMACAuth key1:{expected_sig}"
    assert (tmp_path / "f.gz").read_bytes() == b"ok"
