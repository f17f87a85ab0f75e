"""HTML table-grid and JSON-LD extraction: planted-fixture exactness,
span/nesting/quarantine semantics, and the long-form output contract."""

import json

import pyarrow as pa
import pytest

from sift_ray.functions.webstruct import (HtmlTablesStage, JsonLdStage,
                                          _table_cells)
from sift_ray.dom.parser import parse_html


def _cells(html: str):
    root = parse_html(html)
    tables = list(root.iter_elements("table"))
    return [sorted(_table_cells(t)) for t in tables]


def test_simple_table_grid():
    html = """<table>
      <tr><th>a</th><th>b</th></tr>
      <tr><td>1</td><td>2</td></tr>
      <tr><td>3</td><td>4</td></tr>
    </table>"""
    [cells] = _cells(html)
    assert cells == [
        (0, 0, True, "a"), (0, 1, True, "b"),
        (1, 0, False, "1"), (1, 1, False, "2"),
        (2, 0, False, "3"), (2, 1, False, "4"),
    ]


def test_colspan_advances_columns():
    html = """<table>
      <tr><td colspan="2">wide</td><td>c</td></tr>
      <tr><td>1</td><td>2</td><td>3</td></tr>
    </table>"""
    [cells] = _cells(html)
    assert (0, 0, False, "wide") in cells
    assert (0, 2, False, "c") in cells
    assert (1, 0, False, "1") in cells and (1, 2, False, "3") in cells


def test_rowspan_blocks_columns_below():
    # rowspan=3 on col 0: rows 1 and 2 start their first cell at col 1
    html = """<table>
      <tr><td rowspan="3">tall</td><td>a</td></tr>
      <tr><td>b</td></tr>
      <tr><td>c</td></tr>
      <tr><td>free</td></tr>
    </table>"""
    [cells] = _cells(html)
    assert (0, 0, False, "tall") in cells
    assert (1, 1, False, "b") in cells
    assert (2, 1, False, "c") in cells
    assert (3, 0, False, "free") in cells  # span expired


def test_rowspan_colspan_combined():
    html = """<table>
      <tr><td rowspan="2" colspan="2">big</td><td>x</td></tr>
      <tr><td>y</td></tr>
    </table>"""
    [cells] = _cells(html)
    assert (0, 2, False, "x") in cells
    assert (1, 2, False, "y") in cells  # cols 0-1 blocked by the 2x2 cell


def test_nested_table_is_separate_and_excluded_from_outer_text():
    html = """<table>
      <tr><td>outer <table><tr><td>inner</td></tr></table> tail</td></tr>
    </table>"""
    outer, inner = _cells(html)
    assert outer == [(0, 0, False, "outer tail")]
    assert inner == [(0, 0, False, "inner")]


def test_span_attribute_clamping_and_garbage():
    html = """<table>
      <tr><td colspan="0">z</td><td colspan="junk">j</td></tr>
    </table>"""
    [cells] = _cells(html)
    # both clamp to 1: second cell lands at col 1
    assert cells == [(0, 0, False, "z"), (0, 1, False, "j")]


def _run_stage(stage, rows):
    batch = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "html": pa.array([r[1] for r in rows], pa.binary()),
    })
    return stage(batch).to_pylist()


def test_tables_stage_quarantine_rows():
    stage = HtmlTablesStage(max_bytes=100)
    out = _run_stage(stage, [
        ("http://a/0", b"<table><tr><td>hi</td></tr></table>"),
        ("http://a/1", b"x" * 200),       # oversize
        ("http://a/2", None),             # empty
    ])
    by_url = {}
    for r in out:
        by_url.setdefault(r["url"], []).append(r)
    assert by_url["http://a/0"][0]["status"] == "ok"
    assert by_url["http://a/0"][0]["cell"] == "hi"
    assert by_url["http://a/1"] == [{
        "url": "http://a/1", "table_idx": -1, "row_idx": -1,
        "col_idx": -1, "is_header": False, "cell": None,
        "status": "oversize"}]
    assert by_url["http://a/2"][0]["status"] == "empty"


def test_tables_stage_cell_overflow_quarantines():
    rows = "".join(f"<tr><td>{i}</td><td>{i}</td></tr>" for i in range(50))
    stage = HtmlTablesStage(max_cells_per_page=10)
    out = _run_stage(stage, [("http://a/0", f"<table>{rows}</table>"
                              .encode())])
    ok = [r for r in out if r["status"] == "ok"]
    assert len(ok) == 10
    assert out[-1]["status"] == "overflow"


def test_jsonld_flattens_graph_and_lists():
    doc = {"@graph": [
        {"@type": "Product", "name": "Widget", "sku": 7,
         "inStock": True, "nested": {"ignored": 1}},
        {"@type": ["Article", "Thing"], "headline": "h"},
    ]}
    html = ('<html><head><script type="application/ld+json">'
            + json.dumps(doc) + "</script></head><body>x</body></html>")
    out = _run_stage(JsonLdStage(), [("http://a/0", html.encode())])
    kv = {(r["item_idx"], r["key"]): (r["jsonld_type"], r["value"])
          for r in out}
    assert kv[(0, "name")] == ("Product", "Widget")
    assert kv[(0, "sku")] == ("Product", "7")
    assert kv[(0, "inStock")] == ("Product", "true")
    assert (0, "nested") not in kv          # non-scalar skipped
    assert kv[(1, "headline")] == ("Article", "h")  # first of type list


def test_jsonld_invalid_block_skipped_valid_kept():
    html = ('<html><head>'
            '<script type="application/ld+json">{not json</script>'
            '<script type="application/ld+json">'
            '{"@type":"T","k":"v"}</script>'
            '<script type="text/javascript">var x = 1;</script>'
            '</head><body>x</body></html>')
    out = _run_stage(JsonLdStage(), [("http://a/0", html.encode())])
    assert [(r["block_idx"], r["key"], r["value"]) for r in out] == \
        [(1, "k", "v")]


def test_jsonld_keys_sorted_within_item():
    html = ('<script type="application/ld+json">'
            '{"zeta":"1","alpha":"2","@type":"T","@id":"urn:x"}</script>')
    out = _run_stage(JsonLdStage(), [("http://a/0", html.encode())])
    assert [r["key"] for r in out] == ["@id", "alpha", "zeta"]


def test_html_tables_dataset_roundtrip(ray_session):
    import ray.data as rd
    from sift_ray.functions.webstruct import html_tables, jsonld_fields
    pages = rd.from_arrow(pa.table({
        "url": pa.array([f"http://t/{i}" for i in range(6)], pa.string()),
        "html": pa.array(
            [(f"<table><tr><th>h</th></tr><tr><td>{i}</td></tr></table>"
              f'<script type="application/ld+json">{{"@type":"P",'
              f'"n":{i}}}</script>').encode()
             for i in range(6)], pa.binary()),
    }))
    cells = html_tables(pages).to_pandas()
    assert len(cells) == 12 and set(cells.status) == {"ok"}
    lds = jsonld_fields(pages).to_pandas()
    assert len(lds) == 6
    assert sorted(lds.value.astype(int)) == list(range(6))


def test_sitemap_urlset_and_index():
    from sift_ray.functions.webstruct import SitemapStage
    sm = """<?xml version="1.0" encoding="UTF-8"?>
    <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <url><loc>http://e.com/a</loc><lastmod>2024-01-02</lastmod>
           <changefreq>weekly</changefreq><priority>0.8</priority></url>
      <url><loc> http://e.com/b </loc></url>
      <url><lastmod>2024-01-01</lastmod></url>
    </urlset>"""
    idx = """<sitemapindex>
      <sitemap><loc>http://e.com/s1.xml</loc>
               <lastmod>2024-02-03</lastmod></sitemap>
    </sitemapindex>"""
    out = _run_stage(SitemapStage(), [
        ("http://e.com/sitemap.xml", sm.encode()),
        ("http://e.com/index.xml", idx.encode()),
        ("http://e.com/broken.xml", None),
    ])
    by_loc = {r["loc"]: r for r in out}
    assert len(out) == 3  # entry without <loc> dropped; None page skipped
    a = by_loc["http://e.com/a"]
    assert (a["kind"], a["lastmod"], a["changefreq"], a["priority"]) == \
        ("url", "2024-01-02", "weekly", "0.8")
    b = by_loc["http://e.com/b"]
    assert (b["kind"], b["lastmod"]) == ("url", None)  # loc trimmed
    s = by_loc["http://e.com/s1.xml"]
    assert (s["kind"], s["lastmod"]) == ("sitemap", "2024-02-03")


def test_robots_meta_union_and_quarantine():
    from sift_ray.functions.webstruct import RobotsMetaStage
    out = _run_stage(RobotsMetaStage(max_bytes=200), [
        ("http://r/0", b"<html><head>"
                       b"<meta name='ROBOTS' content='NOINDEX, follow'>"
                       b"<meta name='robots' content='nofollow'>"
                       b"</head><body>x</body></html>"),
        ("http://r/1", b"<meta name='robots' content='none'>"),
        ("http://r/2", b"<html><body>plain</body></html>"),
        ("http://r/3", b"<meta name='description' content='noindex'>"),
        ("http://r/4", b"x" * 500),
        ("http://r/5", None),
    ])
    rows = {r["url"]: (r["noindex"], r["nofollow"], r["status"])
            for r in out}
    assert len(out) == 6  # exactly one row per page
    assert rows["http://r/0"] == (True, True, "ok")   # union of two metas
    assert rows["http://r/1"] == (True, True, "ok")   # none = both
    assert rows["http://r/2"] == (False, False, "ok")
    assert rows["http://r/3"] == (False, False, "ok") # wrong meta name
    assert rows["http://r/4"] == (False, False, "oversize")
    assert rows["http://r/5"] == (False, False, "empty")


def test_table_grid_invariants_fuzz():
    """Property fuzz: random tables with random row/colspans must produce
    a consistent grid — no two cells at the same (row, col), cells placed
    left-to-right within a row, and deterministic across re-parses."""
    import random
    rng = random.Random(99)
    for trial in range(60):
        n_rows = rng.randint(1, 6)
        parts = ["<table>"]
        for r in range(n_rows):
            parts.append("<tr>")
            for c in range(rng.randint(1, 5)):
                rs = rng.choice([1, 1, 1, 2, 3])
                cs = rng.choice([1, 1, 1, 2])
                parts.append(
                    f'<td rowspan="{rs}" colspan="{cs}">r{r}c{c}</td>')
            parts.append("</tr>")
        parts.append("</table>")
        html = "".join(parts)
        [cells] = _cells(html)
        seen_pos = set()
        last_col_in_row = {}
        for row, col, _, _ in cells:
            assert row >= 0 and col >= 0
            assert (row, col) not in seen_pos, (trial, html)
            seen_pos.add((row, col))
            assert col > last_col_in_row.get(row, -1), (trial, html)
            last_col_in_row[row] = col
        [cells2] = _cells(html)
        assert cells2 == cells  # deterministic


def test_build_frontier_composition(ray_session):
    """Planted end-to-end check: canonicalization unifies tracking-param
    variants with the seen set, index entries don't enter the frontier,
    and per-host slots space by the interval."""
    import ray.data as rd
    from sift_ray.pipelines.frontier import build_frontier

    sm = (b"<urlset>"
          b"<url><loc>http://A.com/p1</loc></url>"
          b"<url><loc>http://a.com/p2?utm_source=x</loc></url>"
          b"<url><loc>http://a.com/p3</loc></url>"
          b"<url><loc>http://b.com/q1</loc></url>"
          b"<url><loc>ftp://a.com/skip</loc></url>"
          b"</urlset>")
    idx = (b"<sitemapindex><sitemap>"
           b"<loc>http://a.com/more.xml</loc>"
           b"</sitemap></sitemapindex>")
    pages = rd.from_arrow(pa.table({
        "url": pa.array(["http://a.com/sitemap.xml",
                         "http://a.com/index.xml"], pa.string()),
        "html": pa.array([sm, idx], pa.binary()),
    }))
    # p2 was already fetched (under a tracking-param variant)
    seen = rd.from_arrow(pa.table({
        "url": pa.array(["http://a.com/p2?utm_campaign=y"], pa.string())}))
    out = (build_frontier(pages, seen, interval_us=500)
           .to_pandas().sort_values(["host", "fetch_rank"])
           .reset_index(drop=True))
    assert out["url"].tolist() == ["http://a.com/p1", "http://a.com/p3",
                                   "http://b.com/q1"]
    assert out["fetch_rank"].tolist() == [1, 2, 1]
    assert out["slot_us"].tolist() == [0, 500, 0]


def test_build_frontier_dedupes_repeated_discoveries(ray_session):
    """The same page listed in TWO sitemaps (one via a tracking-param
    variant) must get exactly one frontier slot."""
    import ray.data as rd
    from sift_ray.pipelines.frontier import build_frontier

    sm1 = b"<urlset><url><loc>http://a.com/p1</loc></url></urlset>"
    sm2 = (b"<urlset><url><loc>http://a.com/p1?utm_source=x</loc></url>"
           b"<url><loc>http://a.com/p2</loc></url></urlset>")
    pages = rd.from_arrow(pa.table({
        "url": pa.array(["http://a.com/s1.xml", "http://a.com/s2.xml"],
                        pa.string()),
        "html": pa.array([sm1, sm2], pa.binary())}))
    seen = rd.from_arrow(pa.table({"url": pa.array([], pa.string())}))
    out = build_frontier(pages, seen).to_pandas().sort_values("url")
    assert out["url"].tolist() == ["http://a.com/p1", "http://a.com/p2"]
    assert sorted(out["fetch_rank"].tolist()) == [1, 2]
