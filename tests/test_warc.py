"""WARC source: framing, gzip members, HTTP payload split, truncation
tolerance, and the read_warc -> extract pipeline composition."""

import datetime
import gzip
import os

import pyarrow as pa
import pytest

from sift_ray.sources.warc import (parse_warc_records, read_warc,
                                   warc_to_page_rows, write_warc)


def _records(n=3):
    t0 = datetime.datetime(2020, 1, 1)
    return [(f"http://e.com/{i}", t0 + datetime.timedelta(hours=i),
             f"<html><body><p>page {i}</p></body></html>".encode())
            for i in range(n)]


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip(tmp_path, gz):
    p = write_warc(str(tmp_path / "a.warc"), _records(), gzip_per_record=gz)
    rows = warc_to_page_rows(open(p, "rb").read())
    assert [r["url"] for r in rows] == [f"http://e.com/{i}" for i in range(3)]
    assert rows[1]["warc_ts"] == datetime.datetime(2020, 1, 1, 1)
    assert rows[2]["html"] == b"<html><body><p>page 2</p></body></html>"


def test_warc_skips_non_response_and_non_2xx():
    req = (b"WARC/1.0\r\nWARC-Type: request\r\n"
           b"WARC-Target-URI: http://e.com/x\r\n"
           b"Content-Length: 4\r\n\r\nGET \r\n\r\n")
    payload404 = b"HTTP/1.1 404 Not Found\r\n\r\ngone"
    resp404 = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"WARC-Target-URI: http://e.com/y\r\n"
               b"WARC-Date: 2020-01-01T00:00:00Z\r\n"
               b"Content-Length: " + str(len(payload404)).encode() +
               b"\r\n\r\n" + payload404 + b"\r\n\r\n")
    ok_payload = b"HTTP/1.1 200 OK\r\n\r\n<p>hi</p>"
    ok = (b"WARC/1.0\r\nWARC-Type: response\r\n"
          b"WARC-Target-URI: http://e.com/z\r\n"
          b"WARC-Date: 2020-01-01T00:00:00Z\r\n"
          b"Content-Length: " + str(len(ok_payload)).encode() +
          b"\r\n\r\n" + ok_payload + b"\r\n\r\n")
    rows = warc_to_page_rows(req + resp404 + ok)
    assert [r["url"] for r in rows] == ["http://e.com/z"]
    assert rows[0]["html"] == b"<p>hi</p>"


def test_warc_truncated_keeps_prefix(tmp_path):
    p = write_warc(str(tmp_path / "t.warc"), _records(3),
                   gzip_per_record=False)
    data = open(p, "rb").read()
    cut = data[:len(data) - 20]  # chop into the last record's body
    rows = warc_to_page_rows(cut)
    assert [r["url"] for r in rows] == ["http://e.com/0", "http://e.com/1"]
    # garbage prefix: no rows, no exception
    assert warc_to_page_rows(b"not a warc at all") == []


def test_warc_record_count_framing():
    p = _records(5)
    blob = b"".join(gzip.compress(
        (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 0\r\n\r\n"
         b"\r\n\r\n")) for _ in range(1))
    recs = list(parse_warc_records(gzip.decompress(blob)))
    assert recs[0]["headers"]["warc-type"] == "warcinfo"


def test_read_warc_into_extract_pipeline(tmp_path, ray_session):
    from sift_ray.config import default_config
    from sift_ray.pipelines.extract_job import build_extract_pipeline
    from sift_ray.sources.pages import PAGES_SCHEMA

    paths = []
    for f in range(2):
        recs = [(f"http://e.com/{f}/{i}",
                 datetime.datetime(2020, 1, 1),
                 (f"<html><body><article><p>long enough paragraph "
                  f"content for shard {f} page {i} to extract"
                  f"</p></article></body></html>").encode())
                for i in range(4)]
        paths.append(write_warc(str(tmp_path / f"s{f}.warc.gz"), recs))

    pages = read_warc(paths)
    assert pages.schema().names == PAGES_SCHEMA.names
    out = build_extract_pipeline(pages, default_config()).to_pandas()
    assert len(out) == 8
    assert (out.status == "ok").all()
    assert out.extracted_md.str.contains("long enough paragraph").all()
