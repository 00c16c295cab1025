"""HTTP fetcher tests: streamed download, retry on transient failure, and
Range-based resume — the engine's production counterpart of the reference
worker's requests.get(stream=True) + 8 MiB chunk loop
(fetch-canvas-data-file.py:33-38), exercised against a local HTTP server."""

from __future__ import annotations

import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from canvas_data_aws_spark.ingest.fetchers import FetchError, http_fetcher

BODY = b"0123456789abcdef" * 4096  # 64 KiB


class _Handler(BaseHTTPRequestHandler):
    """Serves BODY at /data. Behavior knobs live on the server object:
    fail_first_n (connection drops mid-stream), support_range."""

    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        srv = self.server
        if self.path == "/missing":
            self.send_error(404)
            return
        if self.path == "/flaky5xx" and srv.fail_first_n > 0:
            srv.fail_first_n -= 1
            self.send_error(503)
            return

        start = 0
        body = BODY
        rng = self.headers.get("Range")
        if rng and srv.support_range:
            start = int(rng.split("=")[1].rstrip("-"))
            self.send_response(206)
            self.send_header("Content-Range", f"bytes {start}-{len(body)-1}/{len(body)}")
        else:
            self.send_response(200)
        chunk = body[start:]
        if self.path == "/truncate" and srv.fail_first_n > 0:
            srv.fail_first_n -= 1
            # advertise full length but drop the connection halfway:
            # the client sees IncompleteRead / short body and must retry
            self.send_header("Content-Length", str(len(chunk)))
            self.end_headers()
            self.wfile.write(chunk[: len(chunk) // 2])
            self.wfile.flush()
            self.connection.close()
            return
        self.send_header("Content-Length", str(len(chunk)))
        self.end_headers()
        self.wfile.write(chunk)


@pytest.fixture()
def http_srv():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.fail_first_n = 0
    srv.support_range = True
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _url(srv, path):
    return f"http://127.0.0.1:{srv.server_address[1]}{path}"


def test_plain_download(http_srv, tmp_path):
    dest = str(tmp_path / "out.bin")
    http_fetcher(chunk_bytes=4096)(_url(http_srv, "/data"), dest)
    assert open(dest, "rb").read() == BODY
    assert not os.path.exists(dest + ".part")


def test_retry_on_5xx(http_srv, tmp_path):
    http_srv.fail_first_n = 2
    dest = str(tmp_path / "out.bin")
    http_fetcher(backoff_s=0.01)(_url(http_srv, "/flaky5xx"), dest)
    assert open(dest, "rb").read() == BODY


def test_resume_after_midstream_drop(http_srv, tmp_path):
    """First attempt dies halfway; the retry must send a Range header and
    append only the missing suffix."""
    http_srv.fail_first_n = 1
    dest = str(tmp_path / "out.bin")
    http_fetcher(chunk_bytes=1024, backoff_s=0.01)(_url(http_srv, "/truncate"), dest)
    assert open(dest, "rb").read() == BODY


def test_restart_when_server_ignores_range(http_srv, tmp_path):
    http_srv.fail_first_n = 1
    http_srv.support_range = False
    dest = str(tmp_path / "out.bin")
    http_fetcher(chunk_bytes=1024, backoff_s=0.01)(_url(http_srv, "/truncate"), dest)
    assert open(dest, "rb").read() == BODY


def test_terminal_404_raises_and_cleans_up(http_srv, tmp_path):
    dest = str(tmp_path / "out.bin")
    with pytest.raises(FetchError):
        http_fetcher(backoff_s=0.01)(_url(http_srv, "/missing"), dest)
    assert not os.path.exists(dest) and not os.path.exists(dest + ".part")


def test_retries_exhausted_raises(http_srv, tmp_path):
    http_srv.fail_first_n = 99
    dest = str(tmp_path / "out.bin")
    with pytest.raises(FetchError):
        http_fetcher(max_attempts=2, backoff_s=0.01)(_url(http_srv, "/flaky5xx"), dest)


def test_terminal_failure_keeps_part_for_cross_call_resume(http_srv, tmp_path):
    """With resume=True, exhausting retries must NOT discard the .part —
    a later apply() retry continues from the byte offset instead of
    refetching the whole file."""
    http_srv.fail_first_n = 99
    dest = str(tmp_path / "out.bin")
    with pytest.raises(FetchError):
        http_fetcher(chunk_bytes=1024, max_attempts=2, backoff_s=0.01)(
            _url(http_srv, "/truncate"), dest
        )
    part = dest + ".part"
    assert os.path.exists(part) and 0 < os.path.getsize(part) < len(BODY)
    # the next call resumes from the kept offset and completes
    http_srv.fail_first_n = 0
    http_fetcher(chunk_bytes=1024, backoff_s=0.01)(_url(http_srv, "/truncate"), dest)
    assert open(dest, "rb").read() == BODY and not os.path.exists(part)


def test_terminal_failure_without_resume_cleans_part(http_srv, tmp_path):
    http_srv.fail_first_n = 99
    dest = str(tmp_path / "out.bin")
    with pytest.raises(FetchError):
        http_fetcher(chunk_bytes=1024, max_attempts=2, backoff_s=0.01, resume=False)(
            _url(http_srv, "/truncate"), dest
        )
    assert not os.path.exists(dest + ".part")


def test_file_url_single_code_path(tmp_path):
    src = tmp_path / "src.bin"
    src.write_bytes(BODY)
    dest = str(tmp_path / "dst.bin")
    http_fetcher()(f"file://{src}", dest)
    assert open(dest, "rb").read() == BODY


def test_fetcher_is_picklable():
    """The distributed apply cloudpickles fetchers to executors."""
    import pickle

    f = http_fetcher()
    assert callable(pickle.loads(pickle.dumps(f)))