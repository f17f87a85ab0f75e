"""Structured-data extraction from web pages: HTML <table> grids and
JSON-LD (schema.org) blocks.

The reference engine (chriscorrea/sift) extracts prose; tables and
embedded structured data are the other half of what web pages carry, and
a training-data / knowledge pipeline mines them with the same crawl-scale
shape: one DOM parse per page, zero shuffle, long-form typed rows out.

Scale shape: embarrassingly parallel map stages (plain tasks via
``shuffle.TaskStage``), the same contract as the extract/metadata stages —
oversize or pathological pages yield a quarantine row, never a task
failure. Output is long-form (one row per cell / per field), the layout
that downstream relational ops (joins, pivots, aggregation) consume
without re-parsing.

Determinism rules (pinned by tests):
- Tables are numbered in document order; a nested table is its own
  ``table_idx`` and its content is EXCLUDED from the outer cell's text.
- The grid honors rowspan/colspan the way browsers do (occupancy map);
  spans are clamped to sane bounds so adversarial HTML cannot blow up
  the output quadratically.
- Cell text is whitespace-normalized ``text_content`` minus nested
  tables/script/style.
- JSON-LD: every ``<script type="application/ld+json">`` block in
  document order; ``@graph`` arrays and top-level arrays are flattened
  to items; only top-level SCALAR fields are emitted (nested objects are
  a second mining pass, not silently stringified); invalid JSON blocks
  are skipped (counted nowhere — pages with zero valid blocks emit no
  rows, matching SQL-side reconstruction).
"""

from __future__ import annotations

import json
import re
from typing import Iterator, List, Optional, Tuple

import pyarrow as pa

_WS_RE = re.compile(r"\s+")

_MAX_SPAN = 1000          # browser cap for colspan is 1000 (HTML spec)
_MAX_ROWSPAN = 65534      # HTML spec cap
_SKIP_TEXT_TAGS = frozenset(("table", "script", "style"))


def _walk_collect(root, want: frozenset, bound: frozenset) -> List:
    """Descendants of ``root`` with tag in ``want``, document order,
    without descending into collected nodes or into ``bound`` subtrees
    (so a nested <table> never leaks rows/cells into its parent)."""
    out: List = []

    def rec(node) -> None:
        for ch in node.children:
            if not ch.is_element:
                continue
            if ch.tag in want:
                out.append(ch)
                continue          # do not descend into a collected node
            if ch.tag in bound:
                continue
            rec(ch)

    rec(root)
    return out


def _cell_text(cell) -> str:
    """Whitespace-normalized text of a cell, excluding nested
    table/script/style subtrees."""
    parts: List[str] = []

    from ..dom.parser import TEXT

    def rec(node) -> None:
        for ch in node.children:
            if ch.is_element:
                if ch.tag in _SKIP_TEXT_TAGS:
                    continue
                rec(ch)
            elif ch.type == TEXT and ch.text:
                parts.append(ch.text)

    rec(cell)
    return _WS_RE.sub(" ", "".join(parts)).strip()


def _span(cell, attr: str, cap: int) -> int:
    raw = cell.get(attr).strip()
    if not raw:
        return 1
    try:
        v = int(raw)
    except ValueError:
        return 1
    return max(1, min(v, cap))


def _table_cells(table) -> Iterator[Tuple[int, int, bool, str]]:
    """(row_idx, col_idx, is_header, text) for one <table>, browser grid
    semantics: an occupancy map carries rowspans forward; each cell is
    placed at the first free column of its row."""
    rows = _walk_collect(table, frozenset(("tr",)), frozenset(("table",)))
    # pending[col] = rows still occupied by an earlier cell's rowspan,
    # COUNTING the current row; decremented at the end of every row, so a
    # rowspan=3 cell placed in row r (pending set to 3) blocks rows r+1
    # and r+2 and frees at r+3.
    pending: dict = {}
    for r, tr in enumerate(rows):
        cells = _walk_collect(tr, frozenset(("td", "th")),
                              frozenset(("table", "tr")))
        col = 0
        for cell in cells:
            while pending.get(col, 0) > 0:
                col += 1
            colspan = _span(cell, "colspan", _MAX_SPAN)
            rowspan = _span(cell, "rowspan", _MAX_ROWSPAN)
            yield (r, col, cell.tag == "th", _cell_text(cell))
            if rowspan > 1:
                for c in range(col, col + colspan):
                    pending[c] = max(pending.get(c, 0), rowspan)
            col += colspan
        for c in list(pending):
            pending[c] -= 1
            if pending[c] <= 0:
                del pending[c]


_TABLE_FIELDS = [("url", pa.string()), ("table_idx", pa.int32()),
                 ("row_idx", pa.int32()), ("col_idx", pa.int32()),
                 ("is_header", pa.bool_()), ("cell", pa.string()),
                 ("status", pa.string())]
TABLE_SCHEMA = pa.schema(_TABLE_FIELDS)


class HtmlTablesStage:
    """Batch kernel: (url, html) -> long-form table-cell rows. A page that
    cannot be parsed (oversize / DOM error / cell-count bomb) emits ONE
    quarantine row (idx = -1, cell = null, status set); well-formed pages
    emit status="ok" cell rows and nothing else."""

    def __init__(self, max_bytes: int = 50 * 1024 * 1024,
                 max_cells_per_page: int = 100_000):
        self.max_bytes = max_bytes
        self.max_cells = max_cells_per_page

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..dom.parser import parse_html

        cols = {name: [] for name, _ in _TABLE_FIELDS}

        def quarantine(url: str, st: str) -> None:
            cols["url"].append(url)
            cols["table_idx"].append(-1)
            cols["row_idx"].append(-1)
            cols["col_idx"].append(-1)
            cols["is_header"].append(False)
            cols["cell"].append(None)
            cols["status"].append(st)

        for url, html in zip(batch.column("url").to_pylist(),
                             batch.column("html").to_pylist()):
            if html is None:
                quarantine(url, "empty")
                continue
            if isinstance(html, bytes):
                if len(html) > self.max_bytes:
                    quarantine(url, "oversize")
                    continue
                html = html.decode("utf-8", errors="replace")
            elif len(html) > self.max_bytes:
                quarantine(url, "oversize")
                continue
            root = None
            try:
                root = parse_html(html)
                n_emitted = 0
                overflow = False
                for t_idx, table in enumerate(root.iter_elements("table")):
                    for r, c, is_h, text in _table_cells(table):
                        if n_emitted >= self.max_cells:
                            overflow = True
                            break
                        cols["url"].append(url)
                        cols["table_idx"].append(t_idx)
                        cols["row_idx"].append(r)
                        cols["col_idx"].append(c)
                        cols["is_header"].append(is_h)
                        cols["cell"].append(text)
                        cols["status"].append("ok")
                        n_emitted += 1
                    if overflow:
                        break
                if overflow:
                    quarantine(url, "overflow")
            except Exception:
                quarantine(url, "error")
            finally:
                if root is not None:
                    root.release_tree()
        return pa.table(
            {name: pa.array(cols[name], typ) for name, typ in _TABLE_FIELDS})


def html_tables(pages, max_bytes: int = 50 * 1024 * 1024,
                max_cells_per_page: int = 100_000):
    """Dataset of long-form HTML table cells from a (url, html) pages
    table. Zero shuffle; quarantine rows instead of task failures."""
    from .shuffle import TaskStage
    return pages.map_batches(
        TaskStage(HtmlTablesStage, max_bytes=max_bytes,
                  max_cells_per_page=max_cells_per_page),
        batch_format="pyarrow")


# --------------------------------------------------------------- JSON-LD

_LDJSON_FIELDS = [("url", pa.string()), ("block_idx", pa.int32()),
                  ("item_idx", pa.int32()), ("jsonld_type", pa.string()),
                  ("key", pa.string()), ("value", pa.string())]
LDJSON_SCHEMA = pa.schema(_LDJSON_FIELDS)


def _scalar_str(v) -> Optional[str]:
    """Canonical string form of a top-level scalar: strings pass through,
    everything else renders as JSON (so True -> "true", 5 -> "5")."""
    if isinstance(v, str):
        return v
    if isinstance(v, (bool, int, float)):
        return json.dumps(v)
    return None


def _jsonld_items(raw: str) -> List[dict]:
    data = json.loads(raw)
    if isinstance(data, dict) and isinstance(data.get("@graph"), list):
        data = data["@graph"]
    if isinstance(data, dict):
        data = [data]
    if not isinstance(data, list):
        return []
    return [it for it in data if isinstance(it, dict)]


class JsonLdStage:
    """Batch kernel: (url, html) -> long-form JSON-LD field rows.
    Invalid-JSON blocks are skipped; a page with no valid blocks emits
    no rows. Oversize pages are skipped wholesale (this op mines a
    signal, it is not the quarantine bookkeeper — ``html_tables`` and the
    extract stage own that contract)."""

    def __init__(self, max_bytes: int = 50 * 1024 * 1024):
        self.max_bytes = max_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..dom.parser import parse_html

        cols = {name: [] for name, _ in _LDJSON_FIELDS}
        for url, html in zip(batch.column("url").to_pylist(),
                             batch.column("html").to_pylist()):
            if html is None:
                continue
            if isinstance(html, bytes):
                if len(html) > self.max_bytes:
                    continue
                html = html.decode("utf-8", errors="replace")
            elif len(html) > self.max_bytes:
                continue
            try:
                root = parse_html(html)
            except Exception:
                continue
            try:
                self._emit_blocks(root, url, cols)
            finally:
                root.release_tree()
        return pa.table(
            {name: pa.array(cols[name], typ) for name, typ in _LDJSON_FIELDS})

    @staticmethod
    def _emit_blocks(root, url, cols):
        for b_idx, script in enumerate(
                s for s in root.iter_elements("script")
                if s.get("type").strip().lower()
                == "application/ld+json"):
            try:
                items = _jsonld_items(script.text_content())
            except (ValueError, RecursionError):
                continue
            for i_idx, item in enumerate(items):
                t = item.get("@type")
                if isinstance(t, list):
                    t = t[0] if t and isinstance(t[0], str) else None
                if not isinstance(t, str):
                    t = None
                for key in sorted(k for k in item if k != "@type"):
                    val = _scalar_str(item[key])
                    if val is None:
                        continue
                    cols["url"].append(url)
                    cols["block_idx"].append(b_idx)
                    cols["item_idx"].append(i_idx)
                    cols["jsonld_type"].append(t)
                    cols["key"].append(key)
                    cols["value"].append(val)


def jsonld_fields(pages, max_bytes: int = 50 * 1024 * 1024):
    """Dataset of long-form JSON-LD scalar fields from a (url, html)
    pages table. Zero shuffle, map-only."""
    from .shuffle import TaskStage
    return pages.map_batches(TaskStage(JsonLdStage, max_bytes=max_bytes),
                             batch_format="pyarrow")


# --------------------------------------------------------- sitemaps / robots

_SITEMAP_FIELDS = [("url", pa.string()), ("kind", pa.string()),
                   ("loc", pa.string()), ("lastmod", pa.string()),
                   ("changefreq", pa.string()), ("priority", pa.string())]
SITEMAP_SCHEMA = pa.schema(_SITEMAP_FIELDS)


class SitemapStage:
    """Batch kernel: (url, html=sitemap XML bytes) -> one row per
    <url> (kind="url") or <sitemap> (kind="sitemap", index files) entry.
    Entries without a <loc> are dropped (the spec requires it); pages
    that fail to parse emit nothing (miner semantics — the fetch layer
    owns transport quarantine). Child fields are raw text content, not
    re-typed: lastmod/priority stay strings so downstream policy decides
    the parse (crawl schedulers compare lastmod lexically for ISO dates).
    """

    def __init__(self, max_bytes: int = 50 * 1024 * 1024):
        self.max_bytes = max_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..dom.parser import parse_html

        cols = {name: [] for name, _ in _SITEMAP_FIELDS}
        for url, html in zip(batch.column("url").to_pylist(),
                             batch.column("html").to_pylist()):
            if html is None:
                continue
            if isinstance(html, bytes):
                if len(html) > self.max_bytes:
                    continue
                html = html.decode("utf-8", errors="replace")
            elif len(html) > self.max_bytes:
                continue
            try:
                root = parse_html(html)
            except Exception:
                continue
            try:
                self._emit_entries(root, url, cols)
            finally:
                root.release_tree()
        return pa.table({name: pa.array(cols[name], typ)
                         for name, typ in _SITEMAP_FIELDS})

    @staticmethod
    def _emit_entries(root, url, cols):
        for entry in root.iter_elements():
            if entry.tag not in ("url", "sitemap"):
                continue
            fields = {}
            for f in ("loc", "lastmod", "changefreq", "priority"):
                node = entry.find_first(f)
                if node is not None:
                    txt = _WS_RE.sub(" ", node.text_content()).strip()
                    fields[f] = txt or None
            if not fields.get("loc"):
                continue
            cols["url"].append(url)
            cols["kind"].append(entry.tag)
            cols["loc"].append(fields.get("loc"))
            cols["lastmod"].append(fields.get("lastmod"))
            cols["changefreq"].append(fields.get("changefreq"))
            cols["priority"].append(fields.get("priority"))


def sitemap_entries(pages, max_bytes: int = 50 * 1024 * 1024):
    """Dataset of sitemap/sitemap-index entries from (url, html) pages.
    Map-only, zero shuffle — the frontier-building companion to the
    robots.txt compliance filter (functions/robots.py)."""
    from .shuffle import TaskStage
    return pages.map_batches(TaskStage(SitemapStage, max_bytes=max_bytes),
                             batch_format="pyarrow")


_ROBOTS_META_FIELDS = [("url", pa.string()), ("noindex", pa.bool_()),
                       ("nofollow", pa.bool_()), ("status", pa.string())]
ROBOTS_META_SCHEMA = pa.schema(_ROBOTS_META_FIELDS)

_TOKEN_SPLIT_RE = re.compile(r"[,\s]+")


class RobotsMetaStage:
    """Batch kernel: (url, html) -> exactly ONE row per page with the
    page-level indexability directives. Token semantics per the Robots
    Meta Tag spec as search engines apply it: every <meta name="robots">
    contributes tokens (name compared case-insensitively, content split
    on commas/whitespace, lowercased); the most restrictive wins across
    duplicates ("none" = noindex + nofollow). Pages with no directive are
    indexable (noindex=false, nofollow=false). Parse failures quarantine
    in-row (status, flags false) — a compliance filter must not silently
    drop OR silently keep an unparseable page; the caller picks."""

    def __init__(self, max_bytes: int = 50 * 1024 * 1024):
        self.max_bytes = max_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..dom.parser import parse_html

        urls = batch.column("url").to_pylist()
        noindex, nofollow, status = [], [], []
        for url, html in zip(urls, batch.column("html").to_pylist()):
            st, ni, nf = "ok", False, False
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
                    root = None
                    try:
                        root = parse_html(html)
                        for m in root.iter_elements("meta"):
                            if m.get("name").strip().lower() != "robots":
                                continue
                            toks = {t for t in _TOKEN_SPLIT_RE.split(
                                m.get("content").strip().lower()) if t}
                            if "none" in toks:
                                ni = nf = True
                            ni = ni or "noindex" in toks
                            nf = nf or "nofollow" in toks
                    except Exception:
                        st, ni, nf = "error", False, False
                    finally:
                        if root is not None:
                            root.release_tree()
            noindex.append(ni)
            nofollow.append(nf)
            status.append(st)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "noindex": pa.array(noindex, pa.bool_()),
            "nofollow": pa.array(nofollow, pa.bool_()),
            "status": pa.array(status, pa.string()),
        })


def robots_meta_flags(pages, max_bytes: int = 50 * 1024 * 1024):
    """Dataset of per-page robots-meta indexability flags from (url, html)
    pages — the in-page half of crawl compliance (robots.txt is the
    transport half). Map-only, zero shuffle, one row per page."""
    from .shuffle import TaskStage
    return pages.map_batches(TaskStage(RobotsMetaStage, max_bytes=max_bytes),
                             batch_format="pyarrow")
