"""WARC (ISO 28500) source: read Common-Crawl-style web archives into
the pages table. The reference engine reads single documents from
URL/file/stdin (fetch.go:76-91); at corpus scale the equivalent source
is the crawl archive itself, so this module parses WARC response
records into the (url, warc_ts, html, text, lang) pages schema.

From-scratch parser over the public spec (no warcio dependency):
version line, CRLF header block, Content-Length-framed body, CRLF CRLF
record separator. Both plain and gzip archives are handled — Common
Crawl gzips each record as its own gzip member, so the reader walks
multi-member streams with zlib.decompressobj and unused_data.

Scale shape: one WARC file = one read task (`read_binary_files` keeps
the file bytes in the object store once; parsing is a flat map).
Malformed trailing data never raises: parsing stops at the first
unframeable record and what was parsed is kept — a truncated archive
yields its complete prefix, matching resumable-ingest semantics.
"""

from __future__ import annotations

import datetime
import gzip
import io
import zlib
from typing import Dict, Iterator, List, Optional

import pyarrow as pa

_CRLF = b"\r\n"


def _split_gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress a (possibly multi-member) gzip stream, yielding one
    bytes blob per member."""
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        try:
            out = d.decompress(data[pos:])
        except zlib.error:
            return
        yield out + d.flush()
        rest = d.unused_data
        if not rest:
            return
        pos = n - len(rest)


def _parse_headers(block: bytes) -> Dict[str, str]:
    headers: Dict[str, str] = {}
    for line in block.split(_CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = \
                v.strip().decode("latin-1")
    return headers


def _http_body(block: bytes) -> tuple:
    """(status_code, body) of an HTTP response payload block; a block
    without an HTTP status line is returned whole with status 0."""
    if not block.startswith(b"HTTP/"):
        return 0, block
    sep = block.find(_CRLF + _CRLF)
    if sep < 0:
        return 0, b""
    head = block[:sep]
    status = 0
    first = head.split(_CRLF, 1)[0].split(b" ")
    if len(first) >= 2:
        try:
            status = int(first[1])
        except ValueError:
            status = 0
    return status, block[sep + 4:]


def _parse_warc_date(s: str) -> Optional[datetime.datetime]:
    try:
        return datetime.datetime.strptime(
            s, "%Y-%m-%dT%H:%M:%SZ")
    except ValueError:
        try:
            return datetime.datetime.fromisoformat(
                s.replace("Z", "+00:00")).replace(tzinfo=None)
        except ValueError:
            return None


def parse_warc_records(data: bytes) -> Iterator[Dict[str, object]]:
    """Yield dicts for each well-formed record of ONE uncompressed WARC
    stream. Stops (never raises) at the first record that cannot be
    framed."""
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            return
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            return
        headers = _parse_headers(data[pos:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        body_start = hdr_end + 4
        body_end = body_start + length
        if body_end > n:
            return  # truncated record: keep the parsed prefix
        yield {"headers": headers, "block": data[body_start:body_end]}
        pos = body_end


def warc_to_page_rows(data: bytes) -> List[Dict[str, object]]:
    """Response records of a (plain or gzip) WARC byte blob as pages-table
    rows. Request/metadata/warcinfo records are skipped; the HTTP payload
    is split so ``html`` holds only the response body."""
    if data[:2] == b"\x1f\x8b":
        streams = _split_gzip_members(data)
    else:
        streams = iter([data])
    rows: List[Dict[str, object]] = []
    for stream in streams:
        for rec in parse_warc_records(stream):
            h = rec["headers"]
            if h.get("warc-type") != "response":
                continue
            url = h.get("warc-target-uri", "")
            ts = _parse_warc_date(h.get("warc-date", ""))
            status, body = _http_body(rec["block"])
            if status and not (200 <= status < 300):
                continue  # non-2xx fetches carry no page content
            rows.append({
                "url": url,
                "warc_ts": ts,
                "html": body,
                "text": "",
                "lang": "",
            })
    return rows


def read_warc(paths, **read_kwargs):
    """Dataset in the pages schema from WARC file(s). One file = one read
    task; pass ``concurrency``/``override_num_blocks`` through
    ``read_kwargs`` to size the read stage (CC files are ~1 GB gz — at
    cluster scale keep concurrency below total CPUs so parse tasks can
    interleave, the same read-starvation rule as parquet)."""
    import ray.data as rd

    from .pages import PAGES_SCHEMA

    ds = rd.read_binary_files(paths, **read_kwargs)

    def to_pages(batch: pa.Table) -> pa.Table:
        rows: List[Dict[str, object]] = []
        for blob in batch.column("bytes").to_pylist():
            rows.extend(warc_to_page_rows(blob))
        if not rows:
            return PAGES_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)

    return ds.map_batches(to_pages, batch_format="pyarrow")


def write_warc(path: str, records, gzip_per_record: bool = True) -> str:
    """Write (url, warc_ts, html_bytes) triples as a WARC file — the
    fixture/round-trip writer (and the export path for interop tests).
    ``gzip_per_record=True`` produces the Common-Crawl member-per-record
    layout."""
    out = io.BytesIO()
    for i, (url, ts, html) in enumerate(records):
        payload = (b"HTTP/1.1 200 OK\r\n"
                   b"Content-Type: text/html\r\n"
                   b"Content-Length: " + str(len(html)).encode() +
                   b"\r\n\r\n" + html)
        date = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
        rec = (b"WARC/1.0\r\n"
               b"WARC-Type: response\r\n"
               b"WARC-Record-ID: <urn:uuid:" + str(i).encode() + b">\r\n"
               b"WARC-Date: " + date.encode() + b"\r\n"
               b"WARC-Target-URI: " + url.encode() + b"\r\n"
               b"Content-Type: application/http; msgtype=response\r\n"
               b"Content-Length: " + str(len(payload)).encode() +
               b"\r\n\r\n" + payload + b"\r\n\r\n")
        if gzip_per_record:
            out.write(gzip.compress(rec))
        else:
            out.write(rec)
    with open(path, "wb") as f:
        f.write(out.getvalue())
    return path
