"""Synthetic Common-Crawl-style pages corpus (deterministic, seed-fixed).

The input table shape is fixed by BASELINE.json ``input_hint``:
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``.
No external data: rows are (a) byte-exact reference HTML fixtures
(extract_test.go:11-95), (b) templated synthetic pages whose boilerplate
vocabulary is drawn from the classifier stopword domains (classify.go:20-71)
wrapping seeded article bodies that exercise every markdown field type, and
(c) heavy-tail / pathological rows (multi-hundred-KB bodies, deeply nested
DOMs) for skew and quarantine testing.

Generation is hash-seeded PER ROW INDEX (sha256 -> random.Random), so any
row can be produced independently on any worker: the corpus generator runs as
``ray.data.range(n) -> map_batches(pages_batch)`` with no shared state, and
the same (index, seed) always yields identical bytes.
"""

from __future__ import annotations

import hashlib
import random
from typing import Dict, List, Optional

import pyarrow as pa

PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

_EPOCH_US = 1735689600_000000  # 2025-01-01T00:00:00Z in microseconds

# --- word banks (seed vocabulary; recipe/lorem/technical domains) ----------

_BODY_WORDS = (
    "flour sugar carrot cake batter oven sift mixture texture crumb recipe "
    "whisk butter vanilla cinnamon walnut frosting cream layer bake golden "
    "minute temperature ingredient bowl blend fold gentle stir rise cool "
    "slice serve moist tender flavor aroma spice zest orange honey almond "
    "data pipeline stream batch partition shuffle cluster node worker task "
    "schedule memory block object store spill throughput latency scale "
    "lorem ipsum dolor amet consectetur adipiscing elit tempor incididunt "
    "labore dolore magna aliqua veniam nostrud exercitation ullamco laboris"
).split()

_NAV_WORDS = ("Home About Profile Share Content Navigation Contact Blog "
              "Archive Search Login Subscribe").split()

_FOOTER_LINES = (
    "Copyright 2025. All rights reserved.",
    "This text may not be reproduced without permission.",
    "Privacy Policy Terms of Use Cookie Policy",
    "ISBN 479-04550 Published by Publications Department",
    "References: Foundation Publications, Federal Standards Edition.",
)

_TITLE_WORDS = ("Perfect Modern Complete Essential Practical Classic Quick "
                "Ultimate Simple Hearty").split()
_TITLE_NOUNS = ("Guide Recipe Handbook Primer Tutorial Manual Story Review "
                "Essay Walkthrough").split()


def _rng_for(index: int, seed: int) -> random.Random:
    digest = hashlib.sha256(f"sift-ray-page-{seed}-{index}".encode()).digest()
    return random.Random(int.from_bytes(digest[:8], "big"))


def _sentence(rng: random.Random, lo: int = 6, hi: int = 14) -> str:
    n = rng.randint(lo, hi)
    words = [rng.choice(_BODY_WORDS) for _ in range(n)]
    words[0] = words[0].capitalize()
    return " ".join(words) + rng.choice([".", ".", ".", "!", "?"])


def _paragraph(rng: random.Random, n_sentences: Optional[int] = None) -> str:
    n = n_sentences or rng.randint(2, 5)
    return " ".join(_sentence(rng) for _ in range(n))


def _emphasized_paragraph(rng: random.Random) -> str:
    parts = [_sentence(rng)]
    parts.append(f"It needs <strong>{rng.choice(_BODY_WORDS)} "
                 f"{rng.choice(_BODY_WORDS)}</strong> for texture.")
    parts.append(f"Some say <em>{rng.choice(_BODY_WORDS)}</em> matters most.")
    if rng.random() < 0.3:
        parts.append(f"Use <code>{rng.choice(_BODY_WORDS)}_{rng.choice(_BODY_WORDS)}"
                     f"()</code> to automate it.")
    return " ".join(parts)


def _article_html(rng: random.Random, n_sections: int) -> str:
    title = (f"{rng.choice(_TITLE_WORDS)} {rng.choice(_BODY_WORDS).capitalize()} "
             f"{rng.choice(_TITLE_NOUNS)}")
    parts = [f"<h1>{title}</h1>"]
    for s in range(n_sections):
        parts.append(f"<h2>Section {s + 1}: "
                     f"{rng.choice(_BODY_WORDS).capitalize()} "
                     f"{rng.choice(_BODY_WORDS)}</h2>")
        parts.append(f"<p>{_emphasized_paragraph(rng)}</p>")
        for _ in range(rng.randint(1, 4)):
            parts.append(f"<p>{_paragraph(rng)}</p>")
        if rng.random() < 0.5:
            items = "".join(f"<li>{_sentence(rng, 3, 8)}</li>"
                            for _ in range(rng.randint(3, 6)))
            tag = "ul" if rng.random() < 0.6 else "ol"
            parts.append(f"<{tag}>{items}</{tag}>")
        if rng.random() < 0.25:
            parts.append(f"<blockquote><p>{_sentence(rng)}</p></blockquote>")
        if rng.random() < 0.15:
            parts.append("<pre>def step():\n    return "
                         f"'{rng.choice(_BODY_WORDS)}'</pre>")
    return "\n".join(parts)


def _boilerplate_shell(rng: random.Random, article: str, title: str) -> str:
    nav = " ".join(f'<a href="/{w.lower()}">{w}</a>'
                   for w in rng.sample(_NAV_WORDS, 6))
    related = "".join(f'<li><a href="#">{_sentence(rng, 2, 4)}</a></li>'
                      for _ in range(4))
    footer = "<br/>".join(_FOOTER_LINES[:rng.randint(2, len(_FOOTER_LINES))])
    return (
        "<!DOCTYPE html>\n<html>\n<head>\n"
        f"    <title>{title}</title>\n</head>\n<body>\n"
        '    <header class="site-header"><h1>Example Site</h1>'
        f"<nav>{nav}</nav></header>\n"
        '    <div class="container">\n'
        '      <div class="content">\n'
        f'        <article class="post">\n{article}\n</article>\n'
        "      </div>\n"
        f'      <aside class="sidebar"><h3>Related Posts</h3><ul>{related}</ul></aside>\n'
        "    </div>\n"
        f'    <footer class="site-footer"><p>{footer}</p></footer>\n'
        "</body>\n</html>"
    )


def _deep_page(rng: random.Random, depth: int) -> str:
    inner = f"<p>{_paragraph(rng)}</p>"
    return ("<html><body><div class='content'>"
            + "<div>" * depth + inner + "</div>" * depth
            + "</div></body></html>")


def gen_page(index: int, seed: int = 42) -> Dict[str, object]:
    """Generate one deterministic page row."""
    from .fixture_pages import BLOG_POST_HTML, MALFORMED_HTML, SIMPLE_HTML
    rng = _rng_for(index, seed)
    if index < 3:
        # stratum (a): byte-exact reference fixtures in the first rows
        html = (SIMPLE_HTML, BLOG_POST_HTML, MALFORMED_HTML)[index]
        kind = "fixture"
    elif index % 1009 == 700:
        # pathological: deeply nested DOM
        html = _deep_page(rng, 400)
        kind = "deep"
    elif index % 257 == 100:
        # heavy tail: large page (~300 KB - 1 MB)
        html = _boilerplate_shell(rng, _article_html(rng, rng.randint(60, 200)),
                                  "Large Page")
        kind = "large"
    else:
        html = _boilerplate_shell(rng, _article_html(rng, rng.randint(2, 6)),
                                  "Synthetic Page")
        kind = "normal"
    # plain-text shadow
    from ..dom.parser import parse_html
    _root = parse_html(html)
    try:
        text = " ".join(_root.text_content().split())
    finally:
        _root.release_tree()
    return {
        "url": f"https://fixtures.test/{kind}/{index:09d}",
        "warc_ts": _EPOCH_US + index * 1_000_000,
        "html": html.encode("utf-8"),
        "text": text,
        "lang": "en",
    }


def pages_batch(indices: List[int], seed: int = 42) -> pa.Table:
    """Build an Arrow table of pages for the given row indices."""
    rows = [gen_page(i, seed) for i in indices]
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def generate_pages(n: int, seed: int = 42, num_blocks: Optional[int] = None):
    """Distributed corpus generation: range -> map_batches (stateless,
    hash-seeded, no shared state)."""
    import ray.data as rd

    ds = rd.range(n, override_num_blocks=num_blocks)

    def make(batch: pa.Table) -> pa.Table:
        return pages_batch(batch.column("id").to_pylist(), seed)

    return ds.map_batches(make, batch_format="pyarrow")


def write_pages_corpus(out_dir: str, n: int, seed: int = 42,
                       num_blocks: Optional[int] = None) -> str:
    """Materialize a corpus to parquet shards; returns out_dir.
    Idempotent: skips if a _SUCCESS marker exists for the same (n, seed)."""
    import os
    marker = os.path.join(out_dir, f"_SUCCESS_{n}_{seed}")
    if os.path.exists(marker):
        return out_dir
    if num_blocks is None:
        num_blocks = max(4, min(64, n // 2000 or 4))
    os.makedirs(out_dir, exist_ok=True)
    generate_pages(n, seed, num_blocks).write_parquet(out_dir)
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def read_pages(path: str, columns: Optional[List[str]] = None):
    """Read a pages corpus with column pruning at the read."""
    import ray.data as rd
    return rd.read_parquet(path, columns=columns)
