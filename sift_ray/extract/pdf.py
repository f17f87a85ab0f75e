"""Minimal PDF text extraction (the north-rule's "PDF/layout parse" axis).

A from-scratch, stdlib-only extractor for the common case: PDF 1.x files
whose page content streams are uncompressed or FlateDecode-compressed and
draw text with the Tj / TJ / ' / " operators using standard (ASCII/WinAnsi)
encodings. That covers machine-generated report/article PDFs — the bulk of a
web crawl's PDF payload. Anything else (CID fonts, encryption, object
streams, LZW/DCT) is out of scope and yields ``status="unsupported"``
rather than wrong text.

Layout handling: text runs are emitted in content-stream order; the Td/TD/T*
line operators and TJ kerning gaps (< -180 units) insert spaces/newlines, so
simple single-column layouts read naturally.

Runs inside the same actor-pool ``map_batches`` shape as HTML extraction;
see ``PdfExtractStage``.
"""

from __future__ import annotations

import re
import zlib
from typing import List, Optional, Tuple

import pyarrow as pa

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)\r?\nendstream", re.S)
# BT/ET located by a string-literal-aware token scan (never inside (...)
# literals, so shown text containing 'ET'/'BT' cannot truncate a block);
# the literal pattern matches _OP_RE's supported (non-nested) string form
_BT_TOKEN_RE = re.compile(
    rb"\((?:\\.|[^\\()])*\)"                      # string literal: skip
    rb"|(?<![A-Za-z0-9/])(?:BT|ET)(?![A-Za-z0-9])", re.S)
_OP_RE = re.compile(
    rb"\((?:\\.|[^\\()])*\)\s*(?:Tj|'|\")"      # (string) Tj / ' / "
    rb"|\[(?:[^\]\\]|\\.)*\]\s*TJ"              # [ ... ] TJ
    rb"|T\*|TD|Td|TL", re.S)
_STR_RE = re.compile(rb"\((?:\\.|[^\\()])*\)|(-?\d+(?:\.\d+)?)")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


class PdfError(ValueError):
    pass


def _unescape(s: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(s):
        c = s[i:i + 1]
        if c == b"\\" and i + 1 < len(s):
            nxt = s[i + 1:i + 2]
            if b"0" <= nxt <= b"7":  # octal escape, up to 3 digits 0-7
                j = i + 1
                while j < len(s) and j < i + 4 and b"0" <= s[j:j + 1] <= b"7":
                    j += 1
                out.append(int(s[i + 1:j], 8) & 0xFF)
                i = j
                continue
            # unrecognized escape (incl. \8 \9): drop the backslash (PDF
            # spec 7.3.4.2) — _ESCAPES maps the recognized ones
            out += _ESCAPES.get(nxt, nxt)
            i += 2
            continue
        out += c
        i += 1
    return bytes(out)


def _bt_blocks(data: bytes) -> List[bytes]:
    """BT..ET block bodies of a content stream, found by tokenizing with
    string-literal skipping (a blind non-greedy regex would terminate at the
    first 'ET' bytes even inside a (...) literal — e.g. shown text like
    'NET' or 'ETF' — silently truncating extraction)."""
    blocks: List[bytes] = []
    start: Optional[int] = None
    for m in _BT_TOKEN_RE.finditer(data):
        tok = m.group()
        if tok.startswith(b"("):
            continue
        if tok == b"BT":
            if start is None:
                start = m.end()
        elif start is not None:  # ET closing an open block
            blocks.append(data[start:m.start()])
            start = None
    return blocks  # an unclosed BT at EOF is dropped (conservative)


def _decode_stream(params: bytes, raw: bytes) -> Optional[bytes]:
    if b"FlateDecode" in params:
        try:
            return zlib.decompress(raw)
        except zlib.error:
            return None
    if b"Filter" in params:
        return None  # unsupported filter (DCT, LZW, ...)
    return raw


def _block_text(block: bytes) -> str:
    """Text of one BT..ET block, inserting line breaks for Td/TD/T*."""
    parts: List[str] = []
    for m in _OP_RE.finditer(block):
        op = m.group()
        if op in (b"T*",) or op.endswith(b"TD") or op.endswith(b"Td") \
                or op.endswith(b"TL"):
            if op != b"TL" and parts and parts[-1] != "\n":
                parts.append("\n")
            continue
        if op.endswith(b"TJ"):
            inner = op[op.index(b"["):op.rindex(b"]") + 1]
            for sm in _STR_RE.finditer(inner):
                if sm.group(1) is not None:  # kerning number
                    if float(sm.group(1)) < -180:
                        parts.append(" ")
                else:
                    parts.append(_unescape(sm.group()[1:-1])
                                 .decode("latin-1"))
        else:  # (string) Tj / ' / "
            lit = op[op.index(b"("):op.rindex(b")") + 1]
            if op.rstrip().endswith((b"'", b'"')) and parts and parts[-1] != "\n":
                parts.append("\n")  # ' and " move to next line first
            parts.append(_unescape(lit[1:-1]).decode("latin-1"))
    return "".join(parts)


# positional tokenizer for layout mode: shows + the operators that move
# the text-space origin (Td/TD relative, Tm absolute via its e,f terms,
# T* by the leading, TL setting it)
# PDF real syntax: optional sign, digits with an optional (possibly
# trailing or leading) decimal point — '4.', '.5', '+7' are all valid
_NUM = rb"[-+]?(?:\d+\.?\d*|\.\d+)"
_POS_OP_RE = re.compile(
    rb"\((?:\\.|[^\\()])*\)\s*(?:Tj|'|\")"
    rb"|\[(?:[^\]\\]|\\.)*\]\s*TJ"
    rb"|(" + _NUM + rb")\s+(" + _NUM + rb")\s+(Td|TD)"
    rb"|(?:" + _NUM + rb"\s+){4}(" + _NUM + rb")\s+(" + _NUM + rb")"
    rb"\s+Tm(?![A-Za-z])"
    rb"|(" + _NUM + rb")\s+TL"
    rb"|T\*", re.S)

_Y_TOL = 2.0  # same text line if baselines are within 2 text-space units


def _block_runs(block: bytes) -> List[tuple]:
    """(y, x, seq, text) runs of one BT..ET block, tracking the text-space
    origin through Td/TD/Tm/TL/T* (translation terms only — rotation and
    scaling are ignored, the right trade for reading-order recovery)."""
    runs: List[tuple] = []
    x = y = 0.0
    leading = 0.0
    seq = 0

    def show(s: str) -> None:
        nonlocal seq
        if s:
            runs.append((y, x, seq, s))
            seq += 1

    for m in _POS_OP_RE.finditer(block):
        op = m.group()
        if m.group(3) is not None:  # Td / TD
            tx, ty = float(m.group(1)), float(m.group(2))
            x += tx
            y += ty
            if m.group(3) == b"TD":
                leading = -ty
            continue
        if m.group(4) is not None:  # Tm — absolute e, f
            x, y = float(m.group(4)), float(m.group(5))
            continue
        if m.group(6) is not None:  # TL
            leading = float(m.group(6))
            continue
        if op == b"T*":
            y -= leading
            continue
        if op.endswith(b"TJ"):
            inner = op[op.index(b"["):op.rindex(b"]") + 1]
            parts = []
            for sm in _STR_RE.finditer(inner):
                if sm.group(1) is not None:
                    if float(sm.group(1)) < -180:
                        parts.append(" ")
                else:
                    parts.append(_unescape(sm.group()[1:-1])
                                 .decode("latin-1"))
            show("".join(parts))
            continue
        # (string) Tj / ' / "
        if op.rstrip().endswith((b"'", b'"')):
            y -= leading  # ' and " imply T* first
        lit = op[op.index(b"("):op.rindex(b")") + 1]
        show(_unescape(lit[1:-1]).decode("latin-1"))
    return runs


def _assemble_runs(runs: List[tuple]) -> str:
    """Reading order from positioned runs: cluster baselines within
    ``_Y_TOL`` into lines, lines top-to-bottom (descending y), runs within
    a line left-to-right (x, then draw order)."""
    if not runs:
        return ""
    runs = sorted(runs, key=lambda r: (-r[0], r[1], r[2]))
    lines: List[List[tuple]] = [[runs[0]]]
    cur_y = runs[0][0]
    for r in runs[1:]:
        if abs(r[0] - cur_y) <= _Y_TOL:
            lines[-1].append(r)
        else:
            lines.append([r])
            cur_y = r[0]
    out_lines = []
    for line in lines:
        line.sort(key=lambda r: (r[1], r[2]))
        parts = []
        last_x = None
        for yy, xx, sq, txt in line:
            if parts and last_x is not None and xx > last_x:
                parts.append(" ")
            parts.append(txt)
            last_x = xx
        out_lines.append("".join(parts))
    return "\n".join(out_lines)


def extract_pdf_text(data: bytes, layout: bool = False) -> str:
    """Extract text from a PDF byte string. Raises PdfError when the file is
    not a PDF or uses unsupported features (so callers can quarantine).

    ``layout=True`` recovers READING order from text positions instead of
    trusting content-stream order: runs carry their (x, y) text-space
    origin through Td/TD/Tm/TL/T*, baselines within 2 units cluster into
    lines, lines sort top-to-bottom and runs left-to-right — a generator
    that draws paragraphs out of order (or columns bottom-up) still reads
    correctly. Stream order (the default) is byte-cheaper and identical
    on well-behaved single-column files."""
    if not data.startswith(b"%PDF-"):
        raise PdfError("not a PDF (missing %PDF- header)")
    texts: List[str] = []
    saw_stream = False
    for m in _STREAM_RE.finditer(data):
        params, raw = m.group(1), m.group(2)
        decoded = _decode_stream(params, raw)
        if decoded is None:
            continue
        saw_stream = True
        if layout:
            runs: List[tuple] = []
            for block in _bt_blocks(decoded):
                runs.extend(_block_runs(block))
            t = _assemble_runs(runs)
            if t.strip():
                texts.append(t)
        else:
            for block in _bt_blocks(decoded):
                t = _block_text(block)
                if t.strip():
                    texts.append(t)
    if not texts:
        if saw_stream:
            return ""
        raise PdfError("no decodable content streams "
                       "(unsupported filters or encrypted)")
    out = "\n".join(texts)
    out = re.sub(r"[ \t]+", " ", out)
    return re.sub(r" ?\n ?", "\n", out).strip()


# --- deterministic tiny PDF writer (for tests / synthetic corpora) ----------

def _pdf_esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def make_positioned_pdf(runs: List[tuple], compress: bool = True) -> bytes:
    """One-page PDF drawing ``(x, y, text)`` runs via absolute Tm, in the
    GIVEN (possibly non-reading) order — the layout-mode test generator."""
    content = b"BT /F1 12 Tf " + b" ".join(
        f"1 0 0 1 {x} {y} Tm ({_pdf_esc(t)}) Tj".encode("latin-1")
        for x, y, t in runs) + b" ET"
    return _wrap_pdf(content, compress)


def make_simple_pdf(lines: List[str], compress: bool = True) -> bytes:
    """Write a minimal one-page PDF drawing ``lines`` with Tj — a valid file
    per the PDF 1.4 spec, used to synthesize test corpora offline."""
    esc = _pdf_esc

    content = b"BT /F1 12 Tf 72 720 Td 14 TL " + b" ".join(
        f"({esc(line)}) Tj T*".encode("latin-1") for line in lines) + b" ET"
    return _wrap_pdf(content, compress)


def _wrap_pdf(content: bytes, compress: bool = True) -> bytes:
    if compress:
        stream = zlib.compress(content)
        filt = b"/Filter /FlateDecode "
    else:
        stream = content
        filt = b""
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< " + filt + b"/Length " + str(len(stream)).encode() + b" >>\n"
        b"stream\n" + stream + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size " + str(len(objs) + 1).encode()
            + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode()
            + b"\n%%EOF\n")
    return bytes(out)


class PdfExtractStage:
    """Actor-pool stage: (url, payload) -> (url, text, status, error).

    Same quarantine discipline as HTML extraction: unsupported/broken PDFs
    become status rows, never task failures.
    """

    def __init__(self, payload_col: str = "payload",
                 max_bytes: int = 100 * 1024 * 1024,
                 layout: bool = False):
        self.payload_col = payload_col
        self.max_bytes = max_bytes
        self.layout = layout

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        payloads = batch.column(self.payload_col).to_pylist()
        texts, statuses, errors = [], [], []
        for data in payloads:
            if data is None or len(data) == 0:
                texts.append(""); statuses.append("empty"); errors.append("")
                continue
            if len(data) > self.max_bytes:
                texts.append(""); statuses.append("oversize")
                errors.append(f"content too large: {len(data)} bytes")
                continue
            try:
                t = extract_pdf_text(data, layout=self.layout)
                texts.append(t)
                statuses.append("ok" if t else "empty")
                errors.append("")
            except PdfError as exc:
                texts.append(""); statuses.append("unsupported")
                errors.append(str(exc))
            except Exception as exc:  # defensive: no row kills the task
                texts.append(""); statuses.append("error")
                errors.append(f"{type(exc).__name__}: {exc}")
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "text": pa.array(texts, pa.string()),
            "status": pa.array(statuses, pa.string()),
            "error": pa.array(errors, pa.string()),
        })


def extract_pdfs(ds, payload_col: str = "payload", concurrency: int = 2,
                 batch_size: Optional[int] = 64, layout: bool = False):
    """Dataset of (url, payload[binary]) -> (url, text, status, error).
    ``layout=True`` selects positional reading-order recovery."""
    return ds.map_batches(
        PdfExtractStage,
        fn_constructor_kwargs={"payload_col": payload_col,
                               "layout": layout},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)
