"""RFC 9309 robots.txt parser + distributed robots_filter tests (rule
examples from the public RFC / Google robots documentation)."""

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sift_ray.functions.robots import (RobotsEvalStage, parse_robots,
                                       robots_allowed, robots_filter,
                                       url_host_path)


def _allowed(txt, path, ua="sift"):
    return robots_allowed(parse_robots(txt, ua), path)


def test_longest_match_wins():
    txt = "User-agent: *\nDisallow: /\nAllow: /page"
    assert _allowed(txt, "/page")
    assert _allowed(txt, "/page/deeper")
    assert not _allowed(txt, "/other")


def test_allow_wins_ties():
    txt = "User-agent: *\nAllow: /folder\nDisallow: /folder"
    assert _allowed(txt, "/folder/page")


def test_empty_disallow_allows_everything():
    txt = "User-agent: *\nDisallow:"
    assert _allowed(txt, "/anything")


def test_wildcard_and_end_anchor():
    txt = "User-agent: *\nDisallow: /*.php$"
    assert not _allowed(txt, "/index.php")
    assert _allowed(txt, "/index.php5")
    assert _allowed(txt, "/index.html")
    txt2 = "User-agent: *\nDisallow: /private*/"
    assert not _allowed(txt2, "/private1/page")
    assert _allowed(txt2, "/private1")


def test_specific_agent_group_beats_star():
    txt = ("User-agent: *\nDisallow: /\n\n"
           "User-agent: sift\nAllow: /\nDisallow: /secret")
    assert _allowed(txt, "/open")
    assert not _allowed(txt, "/secret/x")
    # another crawler falls back to the * group
    assert not robots_allowed(parse_robots(txt, "otherbot"), "/open")


def test_same_agent_groups_merge():
    txt = ("User-agent: sift\nDisallow: /a\n\n"
           "User-agent: sift\nDisallow: /b")
    assert not _allowed(txt, "/a/x")
    assert not _allowed(txt, "/b/y")
    assert _allowed(txt, "/c")


def test_agent_prefix_matching_and_comments():
    txt = ("# top comment\n"
           "User-agent: si  # product token prefix\n"
           "Disallow: /x\n")
    assert not _allowed(txt, "/x/1", ua="sift/0.1")
    assert _allowed(txt, "/y", ua="sift/0.1")


def test_rules_before_any_group_ignored_and_unknown_fields():
    txt = ("Disallow: /orphan\n"
           "User-agent: *\nCrawl-delay: 10\nSitemap: https://x/s.xml\n"
           "Disallow: /real\n")
    assert _allowed(txt, "/orphan/x")
    assert not _allowed(txt, "/real/x")


def test_no_rules_means_allowed():
    assert _allowed("", "/anything")
    assert _allowed("User-agent: otherbot\nDisallow: /", "/x")


def test_url_host_path():
    assert url_host_path("https://Ex.COM/a/b?q=1#frag") == \
        ("ex.com", "/a/b?q=1")
    assert url_host_path("http://user:pw@host.io") == ("host.io", "/")
    assert url_host_path("not a url")[0] == ""


def test_robots_filter_distributed(ray_session):
    import ray.data as rd
    pages = pd.DataFrame({
        "url": [f"https://h{i % 3}.test/{'blocked' if i % 2 else 'open'}/{i}"
                for i in range(60)],
        "payload": np.arange(60, dtype=np.int64),
    })
    robots = pd.DataFrame({
        "host": ["h0.test", "h1.test"],
        "robots": ["User-agent: *\nDisallow: /blocked",
                   "User-agent: sift\nDisallow: /\nAllow: /open"],
    })  # h2.test has no robots.txt -> everything allowed
    out = (robots_filter(rd.from_pandas(pages), rd.from_pandas(robots))
           .to_pandas().sort_values("payload").reset_index(drop=True))
    for _, r in out.iterrows():
        host, path = url_host_path(r["url"])
        if host in ("h0.test", "h1.test"):
            assert path.startswith("/open"), r["url"]
    kept = set(out["url"])
    # h2 blocked paths stay (no robots for that host)
    assert any("h2.test/blocked" in u for u in kept)
    # h0/h1 blocked paths are gone
    assert not any("h0.test/blocked" in u or "h1.test/blocked" in u
                   for u in kept)
    # audit mode keeps the rows with the verdict column
    audit = (robots_filter(rd.from_pandas(pages), rd.from_pandas(robots),
                           keep_denied=True).to_pandas())
    assert len(audit) == 60
    assert set(audit.columns) >= {"url", "payload", "host", "allowed"}
    assert audit["allowed"].sum() == len(out)


def test_robots_sitemaps_discovery(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from sift_ray.functions.robots import robots_sitemaps

    txt_a = ("User-agent: *\nDisallow: /private\n"
             "SITEMAP: https://a.com/sitemap.xml\n"
             "sitemap:   /sitemap-extra.xml  \n")
    txt_b = "User-agent: sift\nAllow: /\n"     # no sitemap line
    ds = rd.from_arrow(pa.table({
        "host": pa.array(["a.com", "b.com", "c.com"], pa.string()),
        "robots_txt": pa.array([txt_a, txt_b, None], pa.string()),
    }))
    out = robots_sitemaps(ds).to_pandas().sort_values("sitemap_url")
    assert out["sitemap_url"].tolist() == [
        "http://a.com/sitemap-extra.xml", "https://a.com/sitemap.xml"]
    assert set(out["host"]) == {"a.com"}
