"""Production fetchers for the sync engine's per-file worker body.

The reference worker (/root/reference/lambda/fetch-canvas-data-file.py:33-38)
streams the signed URL with ``requests.get(stream=True)`` and copies 8 MiB
chunks into a multipart S3 upload — bounded memory no matter the file size.
``http_fetcher`` is that worker re-expressed for the engine: stdlib
``urllib`` streaming (no extra dependency), the same 8 MiB chunk loop,
plus the two productionizations a long pull over a flaky network needs:

- **Retry with backoff** on transient errors (connection reset, 5xx,
  timeouts), capped attempts.
- **Resume**: progress lands in ``dest + '.part'``; a retry re-requests
  only the missing suffix via an HTTP ``Range`` header when the server
  honors it (206), else restarts the stream. The final ``os.replace`` to
  ``dest`` is atomic, so the reconciler's idempotence guard
  (fetch-canvas-data-file.py:25-31) never sees a half-written file as done.

Fetchers are plain picklable callables ``(url, dest) -> None`` so the
distributed apply path can ship them to executors (reconciler._apply_worker).
"""

from __future__ import annotations

import http.client
import os
import time
import urllib.error
import urllib.request
from collections.abc import Callable, Mapping

DEFAULT_CHUNK_BYTES = 8 * 1024 * 1024  # worker chunk-size parity (:20)

#: HTTP statuses worth retrying — transient server/gateway conditions.
RETRYABLE_STATUS = frozenset({408, 429, 500, 502, 503, 504})


class FetchError(Exception):
    """Terminal fetch failure after exhausting retries."""


def http_fetcher(
    chunk_bytes: int = DEFAULT_CHUNK_BYTES,
    max_attempts: int = 4,
    backoff_s: float = 0.5,
    timeout_s: float = 60.0,
    resume: bool = True,
    headers: Mapping[str, str] | Callable[[str], Mapping[str, str]] | None = None,
) -> Callable[[str, str], None]:
    """Streamed HTTP(S) download with retry/resume, bounded to one chunk of
    memory. Returns a plain-picklable ``(url, dest) -> None`` callable
    (a partial over a module function, so even stdlib pickle ships it).

    ``headers`` attaches auth to every request: a static mapping, or a
    per-URL callable (e.g. credentials.hmac_auth_headers) for signed
    schemes — the secrets_resolution hand-off point.

    file:// URLs are handled too (urllib supports them), which keeps one
    code path for tests and production.
    """
    import functools

    return functools.partial(
        _http_fetch,
        chunk_bytes=chunk_bytes,
        max_attempts=max_attempts,
        backoff_s=backoff_s,
        timeout_s=timeout_s,
        resume=resume,
        headers=headers,
    )


def _http_fetch(
    url: str,
    dest: str,
    *,
    chunk_bytes: int,
    max_attempts: int,
    backoff_s: float,
    timeout_s: float,
    resume: bool,
    headers: Mapping[str, str] | Callable[[str], Mapping[str, str]] | None = None,
) -> None:
    part = dest + ".part"
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    last_err: Exception | None = None
    for attempt in range(max_attempts):
        if attempt:
            time.sleep(backoff_s * (2 ** (attempt - 1)))
        offset = os.path.getsize(part) if (resume and os.path.exists(part)) else 0
        req = urllib.request.Request(url)
        if headers:
            for k, v in (headers(url) if callable(headers) else headers).items():
                req.add_header(k, v)
        if offset:
            req.add_header("Range", f"bytes={offset}-")
        try:
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                status = getattr(resp, "status", 200)
                if offset and status != 206:
                    # server ignored Range: restart the stream from zero
                    offset = 0
                clen = resp.headers.get("Content-Length") if resp.headers else None
                mode = "ab" if offset else "wb"
                written = 0
                with open(part, mode) as out:
                    while True:
                        chunk = resp.read(chunk_bytes)
                        if not chunk:
                            break
                        out.write(chunk)
                        written += len(chunk)
                # chunked reads return quiet EOF on a dropped connection —
                # verify against the advertised length or the resume appends
                # a suffix onto a silently-truncated body
                if clen is not None and written < int(clen):
                    raise http.client.IncompleteRead(b"", int(clen) - written)
            os.replace(part, dest)  # atomic: never a half-file at dest
            return
        except urllib.error.HTTPError as e:
            last_err = e
            if e.code == 416 and offset:
                # Range past EOF: the .part already holds the full body
                os.replace(part, dest)
                return
            if e.code not in RETRYABLE_STATUS:
                break
        except (
            urllib.error.URLError,
            ConnectionError,
            TimeoutError,
            OSError,
            http.client.HTTPException,  # e.g. IncompleteRead mid-stream
        ) as e:
            last_err = e  # transient transport error: retry (resuming)
    # Terminal failure. With resume on, keep the .part so a later apply()
    # retry continues from the byte offset (it is length-verified against
    # Content-Length on the next attempt); without resume it is dead weight.
    if not resume and os.path.exists(part):
        os.remove(part)
    raise FetchError(f"failed to fetch {url} after {max_attempts} attempts") from last_err

