"""Page-metadata extraction: the structured head fields a web-corpus
pipeline keys on before (and independently of) main-content extraction —
title, meta/OpenGraph descriptions, canonical URL, declared language,
published timestamp.

The reference engine (chriscorrea/sift) extracts only body content; head
metadata is the standard companion signal in crawl processing (URL
canonicalization, title-based dedup, date filtering, language routing),
so it joins the training-data family here.

Scale shape: embarrassingly parallel — one DOM parse per page, zero
shuffle, same stage shape as extraction (plain tasks via
``shuffle.TaskStage``; parse state is per-call). Pages over the byte cap
or with pathological DOMs yield a row of nulls with ``status`` set, never
a task failure (mirrors the extract stage's quarantine contract,
fetch.go:19-22 in the reference).
"""

from __future__ import annotations

import re
from typing import Optional
from urllib.parse import urljoin

import pyarrow as pa

_WS_RE = re.compile(r"\s+")


def _clean(s: str, cap: int = 500) -> Optional[str]:
    s = _WS_RE.sub(" ", s).strip()
    return s[:cap] if s else None


def _page_metadata(url: str, html: str) -> dict:
    """Head-field dict for one page. Field rules:

    - ``title``: first non-empty <title> text.
    - ``description``: <meta name="description"> content (name compared
      case-insensitively), else None.
    - ``og_title`` / ``og_description``: OpenGraph <meta property=...>.
    - ``canonical_url``: first <link rel="canonical"> href resolved
      against the page URL (same <base>-less resolution as browsers use
      for head links).
    - ``html_lang``: the <html lang> attribute, lowercased.
    - ``published``: <meta property="article:published_time"> content,
      else the first <time datetime> value.
    First occurrence wins throughout (browser behavior for duplicate
    head fields)."""
    from ..dom.parser import parse_html

    root = parse_html(html)
    try:
        return _metadata_from_root(root, url)
    finally:
        root.release_tree()


def _metadata_from_root(root, url):
    out = {"title": None, "description": None, "og_title": None,
           "og_description": None, "canonical_url": None,
           "html_lang": None, "published": None}

    for h in root.iter_elements("html"):
        lang = h.get("lang").strip().lower()
        if lang:
            out["html_lang"] = lang[:35]
        break
    for t in root.iter_elements("title"):
        title = _clean(t.text_content())
        if title:
            out["title"] = title
            break
    for m in root.iter_elements("meta"):
        name = m.get("name").strip().lower()
        prop = m.get("property").strip().lower()
        content = m.get("content")
        if not content:
            continue
        if name == "description" and out["description"] is None:
            out["description"] = _clean(content)
        elif prop == "og:title" and out["og_title"] is None:
            out["og_title"] = _clean(content)
        elif prop == "og:description" and out["og_description"] is None:
            out["og_description"] = _clean(content)
        elif (prop == "article:published_time"
              and out["published"] is None):
            out["published"] = _clean(content, cap=64)
    for ln in root.iter_elements("link"):
        rels = ln.get("rel").strip().lower().split()
        href = ln.get("href").strip()
        if "canonical" in rels and href:
            out["canonical_url"] = urljoin(url, href)[:2000]
            break
    if out["published"] is None:
        for t in root.iter_elements("time"):
            dt = t.get("datetime").strip()
            if dt:
                out["published"] = _clean(dt, cap=64)
                break
    return out


_FIELDS = ("title", "description", "og_title", "og_description",
           "canonical_url", "html_lang", "published")


class MetadataStage:
    """Batch kernel: (url, html) -> one metadata row per page."""

    def __init__(self, max_bytes: int = 50 * 1024 * 1024):
        self.max_bytes = max_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        cols = {f: [] for f in _FIELDS}
        status = []
        for url, html in zip(urls, htmls):
            row, st = None, "ok"
            if html is None:
                st = "empty"
            else:
                if isinstance(html, bytes):
                    if len(html) > self.max_bytes:
                        st = "oversize"
                    else:
                        html = html.decode("utf-8", errors="replace")
                elif len(html) > self.max_bytes:
                    st = "oversize"
                if st == "ok":
                    try:
                        row = _page_metadata(url, html)
                    except Exception:
                        st = "error"
            for f in _FIELDS:
                cols[f].append(row[f] if row else None)
            status.append(st)
        out = {"url": pa.array(urls, pa.string())}
        for f in _FIELDS:
            out[f] = pa.array(cols[f], pa.string())
        out["status"] = pa.array(status, pa.string())
        return pa.table(out)


def page_metadata(pages, max_bytes: int = 50 * 1024 * 1024):
    """Dataset of per-page head metadata from a (url, html) pages table.
    Zero shuffle; quarantine statuses instead of task failures."""
    from .shuffle import TaskStage
    return pages.map_batches(TaskStage(MetadataStage, max_bytes=max_bytes),
                             batch_format="pyarrow")
