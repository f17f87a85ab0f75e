"""HTTP fetch stage (S2) against a local socket server — the same strategy
as the reference's fetch_test.go httptest servers (no external network)."""

import os
import socket
import subprocess
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sift_ray.sources.fetch import (STATUS_FETCH_ERROR, STATUS_HTTP_ERROR,
                                    STATUS_OK, STATUS_OVERSIZE, USER_AGENT,
                                    fetch_url)

PAGE = (b"<html><body><article><h1>Title</h1>"
        b"<p>Fetched body text.</p></article></body></html>")


class _Handler(BaseHTTPRequestHandler):
    seen_agents = []

    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        _Handler.seen_agents.append(self.headers.get("User-Agent"))
        if self.path == "/ok":
            self.send_response(200)
            self.send_header("Content-Length", str(len(PAGE)))
            self.end_headers()
            self.wfile.write(PAGE)
        elif self.path == "/missing":
            self.send_response(404)
            self.end_headers()
        elif self.path == "/big-header":
            self.send_response(200)
            self.send_header("Content-Length", str(200 * 1024 * 1024))
            self.end_headers()
        elif self.path == "/big-body":
            body = b"x" * (2 * 1024 * 1024)
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/chunked-big":
            # no Content-Length: the read-loop byte cap is the only guard
            self.protocol_version = "HTTP/1.0"
            self.send_response(200)
            self.end_headers()
            chunk = b"y" * (1 << 16)
            for _ in range(40):  # 2.5 MB streamed
                try:
                    self.wfile.write(chunk)
                except BrokenPipeError:
                    return
        elif self.path == "/slow":
            time.sleep(3)
            self.send_response(200)
            self.send_header("Content-Length", "2")
            self.end_headers()
            self.wfile.write(b"hi")
        elif self.path == "/redirect":
            self.send_response(302)
            self.send_header("Location", "/ok")
            self.end_headers()
        elif self.path == "/loop":
            self.send_response(302)
            self.send_header("Location", "/loop")
            self.end_headers()
        elif self.path == "/redirect-nolocation":
            self.send_response(302)
            self.end_headers()


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_fetch_ok_and_user_agent(server):
    body, status, err, code = fetch_url(server + "/ok")
    assert (status, code, err) == (STATUS_OK, 200, "")
    assert body == PAGE
    assert USER_AGENT in _Handler.seen_agents  # fetch.go:99-101


def test_fetch_non_200_rejected(server):
    body, status, err, code = fetch_url(server + "/missing")
    assert status == STATUS_HTTP_ERROR and code == 404 and body is None


def test_fetch_content_length_guard(server):
    body, status, err, code = fetch_url(server + "/big-header")
    assert status == STATUS_OVERSIZE and body is None


def test_fetch_body_cap_enforced_during_read(server):
    body, status, err, code = fetch_url(server + "/big-body",
                                        max_bytes=1024 * 1024)
    assert status == STATUS_OVERSIZE and body is None


def test_fetch_read_loop_cap_without_content_length(server):
    # streamed body with NO Content-Length header: only the during-read
    # cap (fetch.go:42-52 mirror) can stop it
    body, status, err, code = fetch_url(server + "/chunked-big",
                                        max_bytes=1024 * 1024)
    assert status == STATUS_OVERSIZE and body is None
    assert "exceeds" in err


def test_fetch_redirect_missing_location(server):
    body, status, err, code = fetch_url(server + "/redirect-nolocation")
    assert status == STATUS_HTTP_ERROR
    assert "Location" in err


def test_fetch_total_timeout(server):
    t0 = time.time()
    body, status, err, code = fetch_url(server + "/slow", total_timeout_s=0.5)
    assert status == STATUS_FETCH_ERROR
    assert time.time() - t0 < 2.5


def test_fetch_redirect_followed(server):
    body, status, err, code = fetch_url(server + "/redirect")
    assert status == STATUS_OK and body == PAGE


def test_fetch_redirect_loop_capped(server):
    body, status, err, code = fetch_url(server + "/loop")
    assert status == STATUS_HTTP_ERROR and "redirect" in err


def test_fetch_connection_refused():
    # find a port nobody is listening on
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    body, status, err, code = fetch_url(f"http://127.0.0.1:{port}/")
    assert status == STATUS_FETCH_ERROR and body is None


def test_fetch_bad_scheme():
    body, status, err, code = fetch_url("ftp://example.test/x")
    assert status == STATUS_FETCH_ERROR and "scheme" in err


def test_fetch_stage_over_dataset(server, ray_session):
    import pandas as pd
    import ray.data as rd
    from sift_ray.sources.fetch import fetch_pages

    urls = pd.DataFrame({"url": [server + "/ok", server + "/missing",
                                 server + "/redirect"]})
    out = fetch_pages(rd.from_pandas(urls), concurrency=1).to_pandas()
    out = out.set_index("url")
    assert out.loc[server + "/ok", "status"] == "ok"
    assert bytes(out.loc[server + "/ok", "html"]) == PAGE
    assert out.loc[server + "/missing", "status"] == "http_error"
    assert out.loc[server + "/redirect", "status"] == "ok"


def test_fetch_then_extract_pipeline(server, ray_session):
    """Fetch -> extract composition: the crawl-shard shape."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.config import SiftConfig
    from sift_ray.pipelines.extract_job import build_extract_pipeline
    from sift_ray.sources.fetch import fetch_pages

    urls = pd.DataFrame({"url": [server + "/ok", server + "/missing"]})
    fetched = fetch_pages(rd.from_pandas(urls), concurrency=1)
    ok = fetched.map_batches(
        lambda t: t.filter(pc.equal(t.column("status"), "ok"))
                   .select(["url", "html"]),
        batch_format="pyarrow")
    out = build_extract_pipeline(ok, SiftConfig(max_units=0,
                                                include_all=True),
                                 concurrency=2).to_pandas()
    assert len(out) == 1
    assert "Fetched body text." in out["extracted_md"].iloc[0]


def test_cli_sift_url(server):
    """The reference's primary UX: sift URL -> stdout."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "sift_ray", "sift", server + "/ok",
         "--include-all"],
        capture_output=True, text=True, cwd=repo, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "Fetched body text." in r.stdout
    r2 = subprocess.run(
        [sys.executable, "-m", "sift_ray", "sift", server + "/missing"],
        capture_output=True, text=True, cwd=repo, timeout=120)
    assert r2.returncode == 1
    assert "error" in r2.stderr


def test_fetch_rejects_untrusted_tls(tmp_path):
    """Self-signed TLS must fail verification (the reference's TLS-verify
    test, fetch_test.go) — stdlib HTTPSConnection verifies by default."""
    import ssl
    import subprocess
    cert = tmp_path / "cert.pem"
    key = tmp_path / "key.pem"
    r = subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", str(key), "-out", str(cert), "-days", "1",
         "-subj", "/CN=127.0.0.1"],
        capture_output=True)
    if r.returncode != 0:
        pytest.skip("openssl unavailable for cert generation")
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(str(cert), str(key))
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.socket = ctx.wrap_socket(srv.socket, server_side=True)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        body, status, err, code = fetch_url(
            f"https://127.0.0.1:{srv.server_address[1]}/ok",
            total_timeout_s=10)
        assert status == STATUS_FETCH_ERROR and body is None
        assert "CERTIFICATE" in err.upper() or "SSL" in err.upper() \
            or "certificate" in err, err
    finally:
        srv.shutdown()


def test_politeness_spaces_same_host_requests(server):
    """min_host_interval_s: 6 same-host fetches through one stage must
    arrive spaced >= ~interval apart despite 16 threads."""
    import time

    import pyarrow as pa

    from sift_ray.sources.fetch import FetchStage

    st = FetchStage(threads=16, min_host_interval_s=0.12)
    urls = [f"{server}/ok" for _ in range(6)]
    t0 = time.monotonic()
    out = st(pa.table({"url": pa.array(urls, pa.string())}))
    elapsed = time.monotonic() - t0
    assert list(out.column("status").to_pylist()) == ["ok"] * 6
    # 6 requests at >=0.12 s spacing need >= 5*0.12 s wall
    assert elapsed >= 0.55, elapsed


def test_politeness_distinct_hosts_not_throttled(server):
    """The limiter is per host: distinct hosts don't wait on each other
    (localhost vs 127.0.0.1 resolve to different host keys)."""
    import time

    import pyarrow as pa

    from sift_ray.sources.fetch import FetchStage

    port = server.rsplit(":", 1)[1]
    st = FetchStage(threads=8, min_host_interval_s=0.5)
    urls = [f"{server}/ok", f"http://localhost:{port}/ok"]
    t0 = time.monotonic()
    out = st(pa.table({"url": pa.array(urls, pa.string())}))
    elapsed = time.monotonic() - t0
    assert list(out.column("status").to_pylist()) == ["ok", "ok"]
    assert elapsed < 0.45, elapsed  # neither waited on the other


def test_fetch_pages_host_partitioned(ray_session, server):
    """host_partitioned=True: every host's urls route to one group task;
    results match the plain path."""
    import pandas as pd
    import ray.data as rd

    from sift_ray.sources.fetch import fetch_pages

    urls = [f"{server}/ok" for _ in range(8)]
    ds = rd.from_pandas(pd.DataFrame({"url": urls})).repartition(4)
    out = (fetch_pages(ds, host_partitioned=True, num_parts=4,
                       min_host_interval_s=0.01)
           .to_pandas().sort_values("url").reset_index(drop=True))
    assert list(out["status"]) == ["ok"] * 8
    assert len(out) == 8
