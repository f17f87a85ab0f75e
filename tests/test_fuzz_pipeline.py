"""End-to-end differential fuzz of the FULL extract pipeline: for random
nesting/entities/encodings/malformed HTML, the markdown produced with the
fast scanner enabled must be byte-identical to the markdown produced when
every document is forced down the stdlib html.parser path — and the
pipeline must never raise. Divergence cases get frozen into REGRESSIONS."""

import os
import random
import re
import sys
from unittest import mock

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sift_ray.dom.parser as parser_mod
from sift_ray.extract.api import ExtractError, to_markdown

_TAGS = ["div", "p", "a", "span", "ul", "li", "table", "tr", "td", "h1",
         "h2", "h3", "blockquote", "pre", "code", "em", "strong", "b", "i",
         "section", "article", "nav", "footer", "figure", "x-custom"]
_VOID = ["br", "hr", "img", "input"]
_TEXTS = ["plain words", "with &amp; entity", "&#65;&#x42;", "&unknown;",
          "bare & amp", "less < than", "greater > than", "unicode \u00e9\u4e2d\u6587",
          "\ufffdreplacement", "tabs\tand\nnewlines", "trailing space ",
          "", "  ", "a" * 80, "punct !?.,;:", "'quotes' \"double\""]
_ATTRS = ['class="c1 c2"', "id=main", "href=/x?q=1&r=2", 'title="a&quot;b"',
          "data-x='y z'", "checked", 'alt=""', "style=color:red"]


def _gen_node(rng: random.Random, depth: int) -> str:
    r = rng.random()
    if depth <= 0 or r < 0.35:
        return rng.choice(_TEXTS)
    if r < 0.42:
        return f"<{rng.choice(_VOID)}{' ' + rng.choice(_ATTRS) if rng.random() < 0.3 else ''}{'/' if rng.random() < 0.3 else ''}>"
    if r < 0.47:
        return f"<!-- {rng.choice(_TEXTS)} -->"
    tag = rng.choice(_TAGS)
    attrs = " ".join(rng.sample(_ATTRS, rng.randint(0, 2)))
    inner = "".join(_gen_node(rng, depth - 1)
                    for _ in range(rng.randint(0, 4)))
    close = f"</{tag}>" if rng.random() < 0.85 else ""  # sometimes unclosed
    return f"<{tag}{' ' + attrs if attrs else ''}>{inner}{close}"


def _gen_doc(rng: random.Random) -> str:
    body = "".join(_gen_node(rng, rng.randint(1, 5))
                   for _ in range(rng.randint(1, 6)))
    pre = rng.choice(["", "<!DOCTYPE html>", "<!doctype html>\n"])
    shape = rng.random()
    if shape < 0.4:
        return f"{pre}<html><head><title>t</title></head><body>{body}</body></html>"
    if shape < 0.7:
        return pre + body
    # tag soup tail: stray brackets and rawtext traps
    tail = rng.choice(["<", "</", "<script>a<b</script>", "<style>.x{}</style>",
                       "x<<p>y", "&", "<p", ""])
    return pre + body + tail


_FORCE_FALLBACK = re.compile(r"")  # matches everywhere -> stdlib path


def _md_both_paths(html: str, **kw):
    try:
        fast = to_markdown(html, **kw)
    except ExtractError:
        fast = ExtractError
    with mock.patch.object(parser_mod, "_FAST_UNSAFE_RE", _FORCE_FALLBACK):
        try:
            slow = to_markdown(html, **kw)
        except ExtractError:
            slow = ExtractError
    return fast, slow


# Frozen divergences from past fuzz runs (regression corpus). Empty so far —
# any future divergence gets its input string appended here with a comment.
REGRESSIONS: list = []


def test_fuzz_include_all_end_to_end():
    rng = random.Random(20260817)
    for i in range(2000):
        h = _gen_doc(rng)
        fast, slow = _md_both_paths(h, include_all=True)
        assert fast == slow, f"case {i}: {h!r}"


def test_fuzz_readability_end_to_end():
    rng = random.Random(99)
    for i in range(500):
        h = _gen_doc(rng)
        fast, slow = _md_both_paths(h)
        assert fast == slow, f"case {i}: {h!r}"


def test_fuzz_selector_end_to_end():
    rng = random.Random(7)
    for i in range(500):
        h = _gen_doc(rng)
        fast, slow = _md_both_paths(h, selector="p")
        assert fast == slow, f"case {i}: {h!r}"


def test_fuzz_encoding_garbage_never_raises():
    """Byte-level garbage decoded with errors='replace' (the batch stage's
    decode rule) must never crash the pipeline."""
    rng = random.Random(4)
    for i in range(500):
        raw = bytes(rng.randrange(256) for _ in range(rng.randint(1, 400)))
        h = raw.decode("utf-8", errors="replace")
        fast, slow = _md_both_paths(h, include_all=True)
        assert fast == slow, f"case {i}: {raw!r}"


def test_fuzz_deep_nesting_quarantines_not_crashes():
    from sift_ray.stages.extract import SiftPipelineStage
    from sift_ray.config import SiftConfig
    import pyarrow as pa
    stage = SiftPipelineStage(cfg=SiftConfig(max_units=0, include_all=True))
    docs = [("u://deep1", ("<div>" * 3000 + "x" + "</div>" * 3000)),
            ("u://deep2", "<p>" * 5000),
            ("u://wide", "<p>w</p>" * 20000)]
    t = stage(pa.table({"url": [u for u, _ in docs],
                        "html": [h.encode() for _, h in docs]}))
    assert t.num_rows == 3
    for s in t.column("status").to_pylist():
        assert s in ("ok", "empty", "error")


def test_regression_corpus_stays_identical():
    for h in REGRESSIONS:
        fast, slow = _md_both_paths(h, include_all=True)
        assert fast == slow, repr(h)
