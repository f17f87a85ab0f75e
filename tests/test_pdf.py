"""PDF text extraction (sift_ray/extract/pdf.py): round-trip against the
deterministic PDF writer, escaping, compression, quarantine statuses, and
the Ray stage."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sift_ray.extract.pdf import (PdfError, extract_pdf_text, extract_pdfs,
                                  make_simple_pdf)


def test_roundtrip_compressed():
    pdf = make_simple_pdf(["Hello World", "Second line"], compress=True)
    assert extract_pdf_text(pdf) == "Hello World\nSecond line"


def test_roundtrip_uncompressed():
    pdf = make_simple_pdf(["plain stream text"], compress=False)
    assert extract_pdf_text(pdf) == "plain stream text"


def test_escapes_and_parens():
    pdf = make_simple_pdf(["a (nested) \\ backslash", "tab\there"])
    out = extract_pdf_text(pdf)
    assert "a (nested) \\ backslash" in out
    # whitespace runs are normalized to single spaces
    assert "tab here" in out


def test_not_a_pdf_raises():
    with pytest.raises(PdfError):
        extract_pdf_text(b"<html>not a pdf</html>")


def test_unsupported_filter_raises():
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Filter /DCTDecode /Length 4 >>\n"
           b"stream\n\xff\xd8\xff\xe0\nendstream\nendobj\n%%EOF\n")
    with pytest.raises(PdfError):
        extract_pdf_text(pdf)


def test_tj_array_kerning_spaces():
    import zlib
    content = b"BT [(Hel) -10 (lo) -500 (world)] TJ ET"
    stream = zlib.compress(content)
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /Length "
           + str(len(stream)).encode() + b" >>\nstream\n" + stream
           + b"\nendstream\nendobj\n%%EOF\n")
    # small kerning joins, large kerning becomes a space
    assert extract_pdf_text(pdf) == "Hello world"


def test_pdf_stage_quarantines(ray_session):
    import pandas as pd
    import ray.data as rd

    rows = pd.DataFrame({
        "url": ["u://ok", "u://broken", "u://empty"],
        "payload": [make_simple_pdf(["doc body"]), b"not a pdf", b""],
    })
    out = (extract_pdfs(rd.from_pandas(rows))
           .to_pandas().set_index("url"))
    assert out.loc["u://ok", "status"] == "ok"
    assert out.loc["u://ok", "text"] == "doc body"
    assert out.loc["u://broken", "status"] == "unsupported"
    assert out.loc["u://empty", "status"] == "empty"


def test_et_bt_inside_shown_text_not_truncated():
    # 'ET'/'BT' byte pairs inside (...) string literals must not terminate
    # the BT..ET block (regression: blind non-greedy BT(.*?)ET regex)
    lines = ["NET gain was (huge) in ETF markets",
             "BT and ET appear INTERNET BTW"]
    out = extract_pdf_text(make_simple_pdf(lines))
    assert "NET gain was (huge) in ETF markets" in out
    assert "BT and ET appear INTERNET BTW" in out


def test_et_bt_uncompressed_variant():
    out = extract_pdf_text(make_simple_pdf(
        ["the NETWORK sent ET home"], compress=False))
    assert out == "the NETWORK sent ET home"


def test_backslash_8_9_escapes_drop_backslash():
    # \8 and \9 are not octal: PDF spec drops the backslash, keeps the char
    import zlib
    content = rb"BT (a\8b\9c \101 ok) Tj ET"
    stream = zlib.compress(content)
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /Length "
           + str(len(stream)).encode() + b" >>\nstream\n" + stream
           + b"\nendstream\nendobj\n%%EOF\n")
    assert extract_pdf_text(pdf) == "a8b9c A ok"


def test_layout_mode_restores_reading_order():
    """Runs drawn out of order (and out of column order) must come back in
    reading order under layout=True; stream order preserves draw order."""
    from sift_ray.extract.pdf import extract_pdf_text, make_positioned_pdf
    pdf = make_positioned_pdf([
        (72, 680, "third line"),
        (72, 720, "first"),
        (300, 720, "line"),       # same baseline, right of "first"
        (72, 700, "second line"),
    ])
    assert extract_pdf_text(pdf, layout=True) == \
        "first line\nsecond line\nthird line"
    # stream order differs (content order, Tm treated as a move)
    assert "third line" in extract_pdf_text(pdf)


def test_layout_mode_baseline_tolerance_and_td():
    """Baselines within 2 units cluster into one line; Td/TD/T* relative
    moves are tracked too."""
    from sift_ray.extract.pdf import extract_pdf_text, make_positioned_pdf
    import zlib
    pdf = make_positioned_pdf([
        (72, 700.5, "left"),
        (200, 699.4, "right"),    # 1.1 units below: same line
        (72, 650, "below"),
    ])
    assert extract_pdf_text(pdf, layout=True) == "left right\nbelow"

    # relative-move content: Td then TD (sets leading) then T*
    from sift_ray.extract.pdf import _wrap_pdf
    content = (b"BT /F1 12 Tf 72 720 Td (one) Tj "
               b"0 -14 TD (two) Tj T* (three) Tj ET")
    pdf2 = _wrap_pdf(content)
    assert extract_pdf_text(pdf2, layout=True) == "one\ntwo\nthree"


def test_layout_mode_matches_stream_on_simple_files():
    """On a well-behaved top-down file both modes agree."""
    from sift_ray.extract.pdf import extract_pdf_text, make_simple_pdf
    pdf = make_simple_pdf(["alpha beta", "gamma delta", "epsilon"])
    assert extract_pdf_text(pdf, layout=True) == extract_pdf_text(pdf)


def test_layout_mode_accepts_all_pdf_real_forms():
    """PDF reals like '4.', '.5', '+7' are valid operands; the layout
    tokenizer must not skip moves written with them."""
    from sift_ray.extract.pdf import _wrap_pdf, extract_pdf_text
    content = (b"BT /F1 12 Tf "
               b".48 0 0 .48 72. +700 Tm (one) Tj "
               b"0 -11. Td (two) Tj "
               b"-.0 -11 Td (three) Tj ET")
    pdf = _wrap_pdf(content)
    assert extract_pdf_text(pdf, layout=True) == "one\ntwo\nthree"
