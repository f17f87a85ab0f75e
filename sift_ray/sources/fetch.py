"""Live HTTP fetch stage — the S2 surface (reference: internal/fetch/
fetch.go:95-131 ``fetchURL``), as an optional actor-pool source for when the
engine runs where network exists. The batch pipeline normally reads stored
HTML from parquet (SURVEY.md S1); this stage closes the reference's
``sift URL`` UX and enables fetch-then-extract pipelines.

Reference semantics mirrored (all become DATA, never task failures):
* User-Agent ``sift/0.1`` (fetch.go:99-101)
* phased timeouts: dial/TLS ~5 s, response headers 15 s, total 30 s
  (fetch.go:26-33); enforced here with per-socket deadlines + a total
  wall-clock budget
* non-200 responses rejected (fetch.go:108-113) -> status "http_error"
* Content-Length guard + 100 MB hard cap enforced during body read
  (fetch.go:19-22, 115-123) -> status "oversize"
* redirects followed (Go's default client: max 10)

Scale shape: fetching is I/O-bound, so each actor runs a thread pool and a
batch's URLs fetch concurrently; actor count x threads is the cluster-wide
connection budget. Failures quarantine into status/error columns so a crawl
shard with dead links still streams through.
"""

from __future__ import annotations

import socket
import time
from typing import Optional, Tuple
from urllib.parse import urljoin, urlsplit

import pyarrow as pa

USER_AGENT = "sift/0.1"                      # fetch.go:14
MAX_HTTP_BYTES = 100 * 1024 * 1024           # fetch.go:21
CONNECT_TIMEOUT_S = 5.0                      # fetch.go:29-30 (dial/TLS)
HEADER_TIMEOUT_S = 15.0                      # fetch.go:32
TOTAL_TIMEOUT_S = 30.0                       # fetch.go:26
MAX_REDIRECTS = 10

STATUS_OK = "ok"
STATUS_HTTP_ERROR = "http_error"
STATUS_OVERSIZE = "oversize"
STATUS_FETCH_ERROR = "fetch_error"

_REDIRECT_CODES = {301, 302, 303, 307, 308}


def fetch_url(url: str, max_bytes: int = MAX_HTTP_BYTES,
              total_timeout_s: float = TOTAL_TIMEOUT_S,
              connect_timeout_s: float = CONNECT_TIMEOUT_S,
              header_timeout_s: float = HEADER_TIMEOUT_S,
              ) -> Tuple[Optional[bytes], str, str, int]:
    """GET one URL with the reference's guard rails.

    Returns (body | None, status, error, http_status). Never raises.
    """
    import http.client

    deadline = time.monotonic() + total_timeout_s
    seen = 0
    current = url
    try:
        while True:
            parts = urlsplit(current)
            if parts.scheme not in ("http", "https"):
                return None, STATUS_FETCH_ERROR, \
                    f"unsupported scheme: {parts.scheme}", 0
            conn_cls = (http.client.HTTPSConnection
                        if parts.scheme == "https"
                        else http.client.HTTPConnection)
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                return None, STATUS_FETCH_ERROR, "total timeout", 0
            conn = conn_cls(parts.hostname, parts.port,
                            timeout=min(connect_timeout_s, remaining))
            try:
                conn.connect()  # dial (+TLS handshake for https)
                path = parts.path or "/"
                if parts.query:
                    path += "?" + parts.query
                remaining = deadline - time.monotonic()
                conn.sock.settimeout(
                    max(0.001, min(header_timeout_s, remaining)))
                conn.request("GET", path, headers={
                    "User-Agent": USER_AGENT,
                    "Accept-Encoding": "identity",
                })
                resp = conn.getresponse()  # response-header phase
                if resp.status in _REDIRECT_CODES:
                    loc = resp.getheader("Location")
                    if not loc:
                        return None, STATUS_HTTP_ERROR, \
                            "redirect without Location header", resp.status
                    seen += 1
                    if seen > MAX_REDIRECTS:
                        return None, STATUS_HTTP_ERROR, \
                            "too many redirects", resp.status
                    current = urljoin(current, loc)
                    continue
                if resp.status != 200:
                    return None, STATUS_HTTP_ERROR, \
                        f"HTTP {resp.status}", resp.status
                cl = resp.getheader("Content-Length")
                if cl is not None and cl.isdigit() and int(cl) > max_bytes:
                    return None, STATUS_OVERSIZE, \
                        f"content-length {cl} exceeds {max_bytes}", 200
                chunks = []
                got = 0
                while True:
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        return None, STATUS_FETCH_ERROR, "total timeout", 200
                    if conn.sock is not None:  # None once fully consumed
                        conn.sock.settimeout(max(0.001, remaining))
                    chunk = resp.read(1 << 16)
                    if not chunk:
                        break
                    got += len(chunk)
                    if got > max_bytes:  # per-read cap, fetch.go:42-52
                        return None, STATUS_OVERSIZE, \
                            f"body exceeds {max_bytes} bytes", 200
                    chunks.append(chunk)
                return b"".join(chunks), STATUS_OK, "", 200
            finally:
                conn.close()
    except (socket.timeout, TimeoutError):
        return None, STATUS_FETCH_ERROR, "timeout", 0
    except OSError as exc:
        return None, STATUS_FETCH_ERROR, f"{type(exc).__name__}: {exc}", 0
    except Exception as exc:  # defensive: no URL kills the task
        return None, STATUS_FETCH_ERROR, f"{type(exc).__name__}: {exc}", 0


class FetchStage:
    """Actor-pool stage: (url) -> (url, html, status, error, http_status).
    A thread pool per actor overlaps the I/O waits of a batch's URLs.

    ``min_host_interval_s``: crawl politeness — consecutive requests to
    the same host are spaced at least this far apart via a per-host
    token clock (threads sleep until their reserved slot). The limiter
    is per ACTOR; for a GLOBAL per-host guarantee route each host's urls
    to one task first (``fetch_pages(host_partitioned=True)``)."""

    def __init__(self, max_bytes: int = MAX_HTTP_BYTES,
                 total_timeout_s: float = TOTAL_TIMEOUT_S,
                 threads: int = 16, url_col: str = "url",
                 min_host_interval_s: float = 0.0):
        import threading
        from concurrent.futures import ThreadPoolExecutor
        self.max_bytes = max_bytes
        self.total_timeout_s = total_timeout_s
        self.pool = ThreadPoolExecutor(max_workers=threads)
        self.url_col = url_col
        self.min_host_interval_s = min_host_interval_s
        self._next_slot: dict = {}
        self._lock = threading.Lock()

    def _polite_fetch(self, u: str):
        import time as _time
        from urllib.parse import urlsplit
        if self.min_host_interval_s > 0:
            host = urlsplit(u).netloc.lower()
            with self._lock:
                now = _time.monotonic()
                slot = max(now, self._next_slot.get(host, now))
                self._next_slot[host] = slot + self.min_host_interval_s
            wait = slot - _time.monotonic()
            if wait > 0:
                _time.sleep(wait)
        return fetch_url(u, self.max_bytes, self.total_timeout_s)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column(self.url_col).to_pylist()
        results = list(self.pool.map(self._polite_fetch, urls))
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "html": pa.array([r[0] for r in results], pa.binary()),
            "status": pa.array([r[1] for r in results], pa.string()),
            "error": pa.array([r[2] for r in results], pa.string()),
            "http_status": pa.array([r[3] for r in results], pa.int32()),
        })


def fetch_pages(ds, concurrency=2, threads: int = 16,
                max_bytes: int = MAX_HTTP_BYTES,
                total_timeout_s: float = TOTAL_TIMEOUT_S,
                batch_size: Optional[int] = 64, url_col: str = "url",
                min_host_interval_s: float = 0.0,
                host_partitioned: bool = False,
                num_parts: Optional[int] = None):
    """Dataset of (url) -> (url, html, status, error, http_status).
    Feed the ``status == "ok"`` rows into ``build_extract_pipeline`` for a
    fetch-then-extract crawl.

    ``min_host_interval_s`` spaces same-host requests (politeness);
    ``host_partitioned=True`` additionally routes every host's urls to
    ONE partition first (one host-hash exchange), so the per-task limiter
    becomes a GLOBAL per-host rate limit — the crawl-frontier shape. The
    cost is that a huge host serializes into one task; politeness means
    it must serialize anyway."""
    kwargs = {"max_bytes": max_bytes, "total_timeout_s": total_timeout_s,
              "threads": threads, "url_col": url_col,
              "min_host_interval_s": min_host_interval_s}
    if host_partitioned:
        from urllib.parse import urlsplit

        import numpy as np

        from ..functions.shuffle import (add_hash_partition,
                                         default_num_parts)
        from ..functions.sketch import _hash64_route

        P = num_parts or default_num_parts()

        def host_keys(batch: pa.Table):
            hosts = pa.array(
                [urlsplit(u).netloc.lower()
                 for u in batch.column(url_col).to_pylist()], pa.string())
            return [_hash64_route(hosts).astype(np.int64)]

        parted = add_hash_partition(ds, [url_col], P,
                                    key_arrays_fn=host_keys)

        def fetch_group(t: pa.Table) -> pa.Table:
            return FetchStage(**kwargs)(t.drop_columns("part"))

        return parted.groupby("part").map_groups(fetch_group,
                                                 batch_format="pyarrow")
    return ds.map_batches(
        FetchStage,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)
