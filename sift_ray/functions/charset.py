"""Charset sniffing and text decoding for raw crawl bytes.

Common-Crawl HTML arrives as bytes in unknown encodings; feeding them to
the extractor as utf-8-with-replacement silently mangles every legacy-
encoded page (~5-10% of the web). This module implements the standard
sniffing ladder — BOM, then an ASCII-compatible scan of the head for a
``<meta charset>`` / ``http-equiv`` declaration, then strict-UTF-8
validation, then the WHATWG windows-1252 fallback — entirely on the
stdlib (``codecs``), and exposes it as a zero-shuffle map stage that
replaces the binary column with decoded text plus audit columns
(``charset``, ``charset_src``).

The reference decodes implicitly via Go's readers (always UTF-8); this
is the engine extension that makes the batch path correct on legacy
pages. Sniffing is per-row and allocation-light: the meta scan touches
only the first 4 KB.
"""

from __future__ import annotations

import codecs
import re
from typing import Tuple

import pyarrow as pa

_HEAD_BYTES = 4096

# WHATWG label -> python codec for the common legacy labels whose python
# default would differ (the Encoding Standard maps latin1 & friends to
# windows-1252 because that is what the web means by them)
_WHATWG_ALIASES = {
    "iso-8859-1": "cp1252", "latin1": "cp1252", "latin-1": "cp1252",
    "us-ascii": "cp1252", "ascii": "cp1252", "ansi_x3.4-1968": "cp1252",
    "windows-1252": "cp1252", "cp1252": "cp1252",
    "iso-8859-15": "iso8859-15",
    "utf8": "utf-8", "utf-8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "shift-jis": "shift_jis", "shift_jis": "shift_jis", "sjis": "shift_jis",
    "x-sjis": "shift_jis",
    "euc-jp": "euc_jp", "euc-kr": "euc_kr", "gb2312": "gbk", "gbk": "gbk",
    "gb18030": "gb18030", "big5": "big5",
    "windows-1251": "cp1251", "koi8-r": "koi8-r",
    "windows-1250": "cp1250", "windows-1254": "cp1254",
    "iso-8859-2": "iso8859-2", "iso-8859-9": "cp1254",
    "utf-16": "utf-16", "utf-16le": "utf-16-le", "utf-16be": "utf-16-be",
}

_META_RE = re.compile(
    rb"""<meta[^>]+?(?:
            charset\s*=\s*["']?\s*([a-zA-Z0-9._:-]+)
          | content\s*=\s*["'][^"']*charset\s*=\s*([a-zA-Z0-9._:-]+)
        )""",
    re.IGNORECASE | re.VERBOSE)


def _normalize_label(label: str) -> str:
    lab = label.strip().strip("\"'").lower()
    mapped = _WHATWG_ALIASES.get(lab)
    if mapped:
        return mapped
    try:
        return codecs.lookup(lab).name
    except LookupError:
        return ""


def sniff_charset(data: bytes) -> Tuple[str, str]:
    """(python codec name, source) — source one of "bom", "meta",
    "utf-8" (validated), "fallback" (windows-1252)."""
    if data.startswith(codecs.BOM_UTF8):
        return "utf-8-sig", "bom"
    if data.startswith(codecs.BOM_UTF32_LE) or \
            data.startswith(codecs.BOM_UTF32_BE):
        return "utf-32", "bom"
    if data.startswith(codecs.BOM_UTF16_LE) or \
            data.startswith(codecs.BOM_UTF16_BE):
        return "utf-16", "bom"
    head = data[:_HEAD_BYTES]
    m = _META_RE.search(head)
    if m:
        raw = (m.group(1) or m.group(2)).decode("ascii", "replace")
        enc = _normalize_label(raw)
        # a meta claiming utf-16 on undecoded bytes is self-refuting
        # (the scan just read it as ASCII); WHATWG says treat as utf-8
        if enc.startswith("utf-16") or enc.startswith("utf-32"):
            enc = "utf-8"
        if enc:
            return enc, "meta"
    try:
        data.decode("utf-8", "strict")
        return "utf-8", "utf-8"
    except UnicodeDecodeError:
        return "cp1252", "fallback"


def decode_bytes(data: bytes) -> Tuple[str, str, str]:
    """(text, codec, source); decode errors replace (never raise) so one
    mislabeled page cannot poison a task."""
    enc, src = sniff_charset(data)
    try:
        return data.decode(enc, "replace"), enc, src
    except LookupError:                    # unreachable after normalize
        return data.decode("utf-8", "replace"), "utf-8", "fallback"


class CharsetDecodeStage:
    """Zero-shuffle map stage: binary ``html`` -> decoded ``text`` with
    ``charset`` / ``charset_src`` audit columns. Run before extraction
    when the corpus is raw crawl bytes."""

    def __init__(self, bin_col: str = "html", out_col: str = "text"):
        self.bin_col = bin_col
        self.out_col = out_col

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            for name, typ in ((self.out_col, pa.string()),
                              ("charset", pa.string()),
                              ("charset_src", pa.string())):
                if name not in t.column_names:
                    t = t.append_column(name, pa.array([], typ))
            return t
        texts, encs, srcs = [], [], []
        for data in t.column(self.bin_col).to_pylist():
            if data is None:
                texts.append(None)
                encs.append(None)
                srcs.append(None)
                continue
            text, enc, src = decode_bytes(data)
            texts.append(text)
            encs.append(enc)
            srcs.append(src)
        return (t.append_column(self.out_col, pa.array(texts, pa.string()))
                .append_column("charset", pa.array(encs, pa.string()))
                .append_column("charset_src", pa.array(srcs, pa.string())))


def charset_stats(ds, bin_col: str = "html", url_col: str = "url"):
    """Per-page charset audit over a raw pages table: (url, charset,
    charset_src, n_chars). Map-only, zero shuffle; the sniff ladder is
    the per-row kernel."""
    import pyarrow.compute as pc

    from .shuffle import TaskStage

    decoded = ds.map_batches(TaskStage(CharsetDecodeStage, bin_col=bin_col),
                             batch_format="pyarrow")

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            url_col: t.column(url_col),
            "charset": t.column("charset"),
            "charset_src": t.column("charset_src"),
            "n_chars": pc.cast(pc.utf8_length(t.column("text")), pa.int64()),
        })

    return decoded.map_batches(project, batch_format="pyarrow")
