"""Charset sniffing ladder tests: BOM > meta declaration > UTF-8
validation > windows-1252 fallback, plus the distributed decode stage."""

import codecs
import os
import sys

import pandas as pd
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sift_ray.functions.charset import (CharsetDecodeStage, charset_stats,
                                        decode_bytes, sniff_charset)


def test_bom_detection():
    assert sniff_charset(codecs.BOM_UTF8 + b"hi") == ("utf-8-sig", "bom")
    assert sniff_charset("hé".encode("utf-16"))[1] == "bom"
    text, enc, src = decode_bytes(codecs.BOM_UTF8 + "héllo".encode("utf-8"))
    assert text == "héllo" and src == "bom"  # BOM stripped by utf-8-sig


def test_meta_charset_variants():
    html = b'<html><head><meta charset="windows-1251"></head>'
    assert sniff_charset(html) == ("cp1251", "meta")
    html2 = (b'<meta http-equiv="Content-Type" '
             b'content="text/html; charset=Shift_JIS">')
    assert sniff_charset(html2) == ("shift_jis", "meta")
    # whatwg: latin1 label means windows-1252 on the web
    html3 = b"<meta charset=latin-1>"
    assert sniff_charset(html3) == ("cp1252", "meta")


def test_meta_utf16_claim_is_self_refuting():
    # bytes readable by the ASCII scan cannot actually be utf-16
    assert sniff_charset(b'<meta charset="utf-16">x') == ("utf-8", "meta")


def test_utf8_validation_and_fallback():
    assert sniff_charset("plain résumé".encode("utf-8")) == \
        ("utf-8", "utf-8")
    legacy = "caf\xe9 cr\xe8me".encode("cp1252")
    enc, src = sniff_charset(legacy)
    assert (enc, src) == ("cp1252", "fallback")
    assert decode_bytes(legacy)[0] == "café crème"


def test_legacy_meta_page_roundtrip():
    body = '<meta charset="windows-1251"><p>Привет мир</p>'
    raw = body.encode("cp1251")
    text, enc, src = decode_bytes(raw)
    assert "Привет мир" in text
    assert enc == "cp1251" and src == "meta"


def test_unknown_label_falls_through_to_validation():
    html = "<meta charset=bogus-enc-42>héllo".encode("utf-8")
    enc, src = sniff_charset(html)
    assert (enc, src) == ("utf-8", "utf-8")


def test_decode_stage_and_stats(ray_session):
    import ray.data as rd
    rows = [
        {"url": "https://a/0", "html": "utf-8 déjà".encode("utf-8")},
        {"url": "https://a/1",
         "html": '<meta charset="cp1251">Тест'.encode("cp1251")},
        {"url": "https://a/2", "html": "caf\xe9".encode("cp1252")},
        {"url": "https://a/3", "html": None},
    ]
    t = pa.table({
        "url": [r["url"] for r in rows],
        "html": pa.array([r["html"] for r in rows], pa.binary()),
    })
    out = (rd.from_arrow(t).map_batches(
        CharsetDecodeStage(), batch_format="pyarrow").to_pandas()
        .sort_values("url").reset_index(drop=True))
    assert out["text"].iloc[0] == "utf-8 déjà"
    assert "Тест" in out["text"].iloc[1]
    assert out["text"].iloc[2] == "café"
    assert out["text"].iloc[3] is None
    assert list(out["charset_src"][:3]) == ["utf-8", "meta", "fallback"]

    stats = (charset_stats(rd.from_arrow(t).repartition(2)).to_pandas()
             .sort_values("url").reset_index(drop=True))
    assert list(stats.columns) == ["url", "charset", "charset_src",
                                   "n_chars"]
    assert stats["n_chars"].iloc[0] == len("utf-8 déjà")


def test_extract_pipeline_sniff_charset_flag(ray_session):
    """Opt-in charset sniffing in the extract stage: a cp1251-declared
    page extracts readable text instead of mojibake; the default path is
    untouched (goldens stay byte-identical)."""
    import pyarrow as pa
    import ray.data as rd
    from sift_ray.config import SiftConfig
    from sift_ray.pipelines.extract_job import build_extract_pipeline

    body = ('<html><head><meta charset="windows-1251"></head><body>'
            '<article><p>' + 'Привет мир общего текста. ' * 30 +
            '</p></article></body></html>')
    page = pa.table({"url": ["https://ru.test/1"],
                     "html": pa.array([body.encode("cp1251")],
                                      pa.binary())})
    cfg = SiftConfig(max_units=0, sniff_charset=True)
    out = build_extract_pipeline(rd.from_arrow(page), cfg).to_pandas()
    assert out["status"].iloc[0] == "ok"
    assert "Привет мир" in out["extracted_md"].iloc[0]
    # default (no sniffing) produces replacement chars for cp1251 bytes
    out2 = build_extract_pipeline(rd.from_arrow(page),
                                  SiftConfig(max_units=0)).to_pandas()
    assert "Привет" not in (out2["extracted_md"].iloc[0] or "")
