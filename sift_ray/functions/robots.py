"""robots.txt parsing and crawl-permission filtering (RFC 9309).

A crawl-scale pipeline must drop pages fetched from disallowed paths
before they enter the corpus (publisher opt-out compliance). The
reference fetches live pages with UA ``sift/0.1`` (fetch.go:95-131) but
has no robots handling; this module adds it for the batch side: parse
each host's robots.txt (a from-scratch RFC 9309 parser — group
selection by most-specific user-agent, longest-match rule precedence,
allow-wins ties, ``*`` wildcards and ``$`` end anchors) and filter the
pages table against it.

Scale shape: robots texts are per-HOST (tiny next to the pages table).
``robots_filter`` hash-joins pages to their host's robots text — ONE
host-keyed exchange — then evaluates map-side with a per-process parse
cache (a host's rules parse once per worker, not once per page). Hosts
without a robots row allow everything (the RFC default).
"""

from __future__ import annotations

import functools
import re
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa

# (allow?, pattern, compiled regex) — None regex means match-everything
Rule = Tuple[bool, str, Optional["re.Pattern"]]


def _compile_path_pattern(pattern: str) -> Optional["re.Pattern"]:
    """RFC 9309 path pattern -> anchored regex: ``*`` matches any octet
    sequence, a trailing ``$`` anchors the end; everything else literal."""
    if pattern == "":
        return None
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    body = ".*".join(parts)
    return re.compile("^" + body + ("$" if anchored else ""))


def parse_robots(text: str, user_agent: str = "sift") -> List[Rule]:
    """Parse robots.txt and return the rule list of the group that best
    matches ``user_agent`` (most-specific product-token match, falling
    back to the ``*`` group; RFC 9309 §2.2.1). Lines outside any group,
    unknown directives, and comments are ignored. Multiple user-agent
    lines stack onto one group; a blank line does NOT end a group (only
    a new user-agent line after rules does)."""
    ua = user_agent.lower()
    groups: List[Tuple[List[str], List[Tuple[bool, str]]]] = []
    cur_agents: List[str] = []
    cur_rules: List[Tuple[bool, str]] = []
    in_agents = False

    def flush():
        nonlocal cur_agents, cur_rules
        if cur_agents:
            groups.append((cur_agents, cur_rules))
        cur_agents, cur_rules = [], []

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agents:           # a new group starts
                flush()
                in_agents = True
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_agents = False
            if cur_agents:
                cur_rules.append((field == "allow", value))
        else:
            in_agents = False            # crawl-delay / sitemap etc.
    flush()

    best_len = -1
    for agents, _ in groups:
        for a in agents:
            if a != "*" and ua.startswith(a) and len(a) > best_len:
                best_len = len(a)
    chosen: List[Tuple[bool, str]] = []
    if best_len >= 0:  # merge every group naming the winning token (RFC
        for agents, rules in groups:    # groups with the same UA combine)
            if any(a != "*" and ua.startswith(a) and len(a) == best_len
                   for a in agents):
                chosen.extend(rules)
    else:
        for agents, rules in groups:
            if "*" in agents:
                chosen.extend(rules)
    return [(allow, pat, _compile_path_pattern(pat))
            for allow, pat in chosen]


def robots_allowed(rules: List[Rule], path: str) -> bool:
    """Longest-match rule wins; a tie goes to allow; an empty disallow
    value matches nothing; no matching rule means allowed (RFC 9309
    §2.2.2). ``path`` must include the leading slash (query string
    included, fragment excluded)."""
    best_len = -1
    best_allow = True
    for allow, pat, rx in rules:
        if rx is None:
            continue                     # empty pattern: matches nothing
        if rx.match(path) is None:
            continue
        if len(pat) > best_len or (len(pat) == best_len and allow
                                   and not best_allow):
            best_len = len(pat)
            best_allow = allow
    return best_allow


def url_host_path(url: str) -> Tuple[str, str]:
    """(lowercased host, path-with-query) of an absolute http(s) URL;
    ('', url) when unparseable."""
    m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)([^#]*)", url)
    if not m:
        return "", url
    host = m.group(1).lower()
    if "@" in host:
        host = host.rsplit("@", 1)[1]
    path = m.group(2) or "/"
    if not path.startswith("/"):
        path = "/" + path
    return host, path


@functools.lru_cache(maxsize=4096)
def _cached_rules(text: str, ua: str) -> List[Rule]:
    return parse_robots(text, ua)


class RobotsEvalStage:
    """Map-side permission check: rows carry (url, robots) after the host
    join; emits an ``allowed`` bool column. Parsing is memoized per worker
    process keyed on the robots text, so a host's rules compile once."""

    def __init__(self, user_agent: str = "sift", url_col: str = "url",
                 robots_col: str = "robots"):
        self.ua = user_agent
        self.url_col = url_col
        self.robots_col = robots_col

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("allowed", pa.array([], pa.bool_()))
        urls = t.column(self.url_col).to_pylist()
        texts = t.column(self.robots_col).to_pylist() \
            if self.robots_col in t.column_names else [None] * len(urls)
        out = np.ones(len(urls), dtype=bool)
        for i, (u, txt) in enumerate(zip(urls, texts)):
            if not txt:
                continue                 # no robots.txt -> allowed
            _, path = url_host_path(u)
            out[i] = robots_allowed(_cached_rules(txt, self.ua), path)
        return t.append_column("allowed", pa.array(out))


def robots_filter(pages, robots, user_agent: str = "sift",
                  url_col: str = "url", keep_denied: bool = False,
                  num_parts: Optional[int] = None):
    """Filter a pages Dataset against per-host robots.txt rules.

    ``robots`` rows: (host:str, robots:str — the raw robots.txt body).
    Pages join to their host's text via ONE host-keyed ``hash_join``
    (how="left": a host with no robots.txt allows everything), then the
    permission check runs map-side with per-process parse caching.
    Returns the pages columns + ``host``; denied rows are dropped unless
    ``keep_denied`` (then an ``allowed`` column is kept for auditing)."""
    import pyarrow.compute as pc

    from .shuffle import TaskStage, hash_join

    def add_host(t: pa.Table) -> pa.Table:
        hosts = [url_host_path(u)[0] for u in t.column(url_col).to_pylist()]
        return t.append_column("host", pa.array(hosts, pa.string()))

    with_host = pages.map_batches(add_host, batch_format="pyarrow")
    pg_schema = pages.schema()
    left_types = {n: t for n, t in zip(pg_schema.names, pg_schema.types)}
    left_types["host"] = pa.string()
    joined = hash_join(with_host, robots, on="host", how="left",
                       left_types=left_types,
                       right_types={"host": pa.string(),
                                    "robots": pa.string()},
                       num_parts=num_parts)
    checked = joined.map_batches(
        TaskStage(RobotsEvalStage, user_agent=user_agent, url_col=url_col),
        batch_format="pyarrow")
    if keep_denied:
        return checked.map_batches(lambda t: t.drop_columns("robots"),
                                   batch_format="pyarrow")

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(t.column("allowed")).drop_columns(
            ["robots", "allowed"])

    return checked.map_batches(keep, batch_format="pyarrow")


def robots_sitemaps(robots_ds, text_col: str = "robots_txt",
                    host_col: str = "host"):
    """Sitemap discovery from robots.txt: every ``Sitemap:`` directive
    (RFC 9309 §2.3 'other records' / sitemaps.org protocol — the
    directive is user-agent-INDEPENDENT and may appear anywhere in the
    file, any case, multiple times). Returns (host, sitemap_url) rows —
    the seed list ``pipelines.frontier.build_frontier`` fetches next.
    Map-only, zero shuffle; relative sitemap URLs resolve against the
    host (scheme http, the crawl layer upgrades), malformed lines drop.
    """
    import re as _re
    from urllib.parse import urljoin

    import pyarrow as _pa

    line_re = _re.compile(r"^\s*sitemap\s*:\s*(\S+)\s*$",
                          _re.IGNORECASE | _re.MULTILINE)

    def kernel(t: _pa.Table) -> _pa.Table:
        hosts_out, urls_out = [], []
        for host, text in zip(t.column(host_col).to_pylist(),
                              t.column(text_col).to_pylist()):
            if not text:
                continue
            for m in line_re.finditer(text):
                u = m.group(1)
                if "://" not in u:  # relative per sitemaps.org erratum
                    u = urljoin(f"http://{host}/", u)
                hosts_out.append(host)
                urls_out.append(u[:2000])
        return _pa.table({
            host_col: _pa.array(hosts_out, _pa.string()),
            "sitemap_url": _pa.array(urls_out, _pa.string()),
        })

    return robots_ds.map_batches(kernel, batch_format="pyarrow")
