"""Main-content extraction: a from-scratch implementation of the published
Mozilla Readability algorithm (arc90 heritage; the algorithm is documented in
mozilla/readability's Readability.js, which go-shiori/go-readability — the
library sift calls at extract.go:42-56 — ports).

Core steps:
1. strip script/style/noscript/comments;
2. optionally remove "unlikely candidate" nodes by class/id regex;
3. score <p>/<td>/<pre>/phrasing-only <div> elements by text length + comma
   count, propagating to ancestors (parent 1x, grandparent 1/2, level n 1/3n)
   with tag-based priors and +-25 class/id weights;
4. scale candidate scores by (1 - link density); pick the top candidate with
   Mozilla's parent-climbing rules;
5. append qualifying siblings (score threshold or "good paragraph" test);
6. conditional cleanup (forms/embeds/low-content lists/tables/divs).

If the resulting article text is shorter than CHAR_THRESHOLD, retry with
fewer flags and keep the attempt with the most text — this matters for small
pages and mirrors Mozilla's behavior.

Stateful pieces (compiled regexes) are module-level, compiled once per worker
process; the extract stage runs this inside an actor pool.
"""

from __future__ import annotations

import itertools
import re
from typing import List, Optional, Tuple
from urllib.parse import urljoin

from ..dom.parser import COMMENT, ELEMENT, TEXT, Node

UNLIKELY_RE = re.compile(
    r"-ad-|ai2html|banner|breadcrumbs|combx|comment|community|cover-wrap|"
    r"disqus|extra|footer|gdpr|header|legends|menu|related|remark|replies|"
    r"rss|shoutbox|sidebar|skyscraper|social|sponsor|supplemental|ad-break|"
    r"agegate|pagination|pager|popup|yom-remote", re.I)
MAYBE_RE = re.compile(r"and|article|body|column|content|main|shadow", re.I)
POSITIVE_RE = re.compile(
    r"article|body|content|entry|hentry|h-entry|main|page|pagination|post|"
    r"text|blog|story", re.I)
NEGATIVE_RE = re.compile(
    r"-ad-|hidden|^hid$| hid$| hid |^hid |banner|combx|comment|com-|contact|"
    r"foot|footer|footnote|gdpr|masthead|media|meta|outbrain|promo|related|"
    r"scroll|share|shoutbox|sidebar|skyscraper|sponsor|shopping|tags|tool|"
    r"widget", re.I)

_PHRASING_TAGS = frozenset((
    "a", "abbr", "audio", "b", "bdo", "br", "button", "cite", "code", "data",
    "datalist", "dfn", "em", "embed", "i", "img", "input", "kbd", "label",
    "mark", "math", "meter", "noscript", "object", "output", "progress", "q",
    "ruby", "samp", "script", "select", "small", "span", "strong", "sub",
    "sup", "textarea", "time", "var", "wbr",
))

_DEFAULT_TAGS_TO_SCORE = frozenset(("p", "td", "pre"))

_ALTER_TO_DIV = frozenset(("article", "section", "main"))

CHAR_THRESHOLD = 500

FLAG_STRIP_UNLIKELYS = 1
FLAG_WEIGHT_CLASSES = 2
FLAG_CLEAN_CONDITIONALLY = 4

_WS_RE = re.compile(r"\s+")


def _norm_ws(s: str) -> str:
    """== _WS_RE.sub(" ", s).strip(); join/split is ~5x faster (same
    Unicode-whitespace class)."""
    return " ".join(s.split())


def _inner_text(node: Node) -> str:
    return _norm_ws(node.text_content())


def _link_density(node: Node) -> float:
    text_len = len(_inner_text(node))
    if text_len == 0:
        return 0.0
    link_len = 0
    for a in node.elements_list("a"):
        coeff = 0.3 if a.get("href", "").startswith("#") else 1.0
        link_len += int(len(_inner_text(a)) * coeff)
    return link_len / text_len


class _TextIndex:
    """One bottom-up pass computing, per node, the normalized inner text and
    the accumulated link-text length (the quantities ``_inner_text`` /
    ``_link_density`` recompute via full subtree walks). Valid only for the
    tree state at build time — rebuild after any mutation phase.

    Semantics are byte-identical to the walk-based helpers:
    * text(node)  == _WS_RE.sub(" ", node.text_content()).strip()
    * link(node)  == Σ over <a> in subtree incl. self of
                     int(len(text(a)) * (0.3 if href.startswith("#") else 1.0))
    """

    __slots__ = ("_buf", "_norm", "_a_starts", "_a_psum",
                 "_a_ends", "_a_nodes", "_tag_pos",
                 "_list_starts", "_list_psum", "_gen")

    # monotone generation counter: each index stamps the nodes it walked
    # with its generation (node.ig), so membership is ONE attribute compare
    # instead of an id()-keyed dict probe; a node carrying a previous
    # index's spans can never be mistaken for indexed-by-this-one
    _GEN = itertools.count(1)

    # element tags _clean_conditionally counts per candidate subtree —
    # indexed here so those counts become bisect range queries instead of
    # per-candidate subtree walks
    _COUNT_TAGS = ("p", "img", "li", "input", "object", "embed", "iframe",
                   "ul", "ol")

    def __init__(self, root: Node):
        # ONE document-order walk assigning each node a [start, end) span
        # into one global text buffer (a subtree's raw text is always a
        # contiguous slice of it) — O(1) memory per node, no string joins.
        # <a> elements are collected in start order; their link contributions
        # become a prefix-sum array, so link(node) = range sum over the a's
        # whose span lies inside the node's span (bisect, no second pass).
        # A parallel ELEMENT-POSITION coordinate (pre-order visit index,
        # unique per node unlike text offsets) spans each subtree, making
        # per-tag element counts range queries too.
        gen = next(self._GEN)
        self._gen = gen
        buf_parts: List[str] = []
        pos = 0
        epos = 0
        a_nodes: List[Node] = []  # document order == start order
        list_nodes: List[Node] = []  # ul/ol, document order
        tag_pos: dict = {t: [] for t in self._COUNT_TAGS}
        stack = [(root, False)]
        while stack:
            node, done = stack.pop()
            if done:
                node.te = pos
                node.ee = epos
                continue
            node.ig = gen
            node.es = epos
            node.ee = epos + 1
            epos += 1
            if node.type == TEXT:
                t = node.text
                node.ts = pos
                pos += len(t)
                node.te = pos
                buf_parts.append(t)
            else:
                node.ts = pos
                node.te = pos
                if node.type == ELEMENT:
                    if node.tag == "a":
                        a_nodes.append(node)
                    if node.tag in ("ul", "ol"):
                        list_nodes.append(node)
                    lst = tag_pos.get(node.tag)
                    if lst is not None:
                        lst.append(node.es)
                if node.children:
                    stack.append((node, True))
                    for c in reversed(node.children):
                        stack.append((c, False))
        buf = "".join(buf_parts)
        self._buf = buf
        self._tag_pos = tag_pos
        norm: dict = {}
        # link contribution per <a>, prefix-summed by start position
        starts: List[int] = []
        psum: List[int] = [0]
        total = 0
        for a in a_nodes:
            n = " ".join(buf[a.ts:a.te].split())
            norm[id(a)] = n
            coeff = 0.3 if a.get("href", "").startswith("#") else 1.0
            total += int(len(n) * coeff)
            starts.append(a.ts)
            psum.append(total)
        self._norm = norm
        self._a_starts = starts
        self._a_psum = psum
        self._a_ends = [a.te for a in a_nodes]
        self._a_nodes = a_nodes
        # ul/ol normalized-text-length prefix sums by element position:
        # list_text_len(node) = range sum over lists inside the subtree
        # (nested lists count per occurrence — same as the walk it replaces)
        lstarts: List[int] = []
        lpsum: List[int] = [0]
        ltotal = 0
        for ln in list_nodes:
            ltotal += len(" ".join(buf[ln.ts:ln.te].split()))
            lstarts.append(ln.es)
            lpsum.append(ltotal)
        self._list_starts = lstarts
        self._list_psum = lpsum

    def text(self, node: Node) -> str:
        nid = id(node)
        n = self._norm.get(nid)
        if n is None:
            if node.ig != self._gen:  # not in indexed tree: walk instead
                return _inner_text(node)
            n = " ".join(self._buf[node.ts:node.te].split())
            self._norm[nid] = n
        return n

    def _link_len(self, node: Node) -> int:
        """Sum of contributions of <a> descendants (incl. self of an <a>).

        <a> spans nest, so every <a> with start in [s, e) is inside the
        subtree EXCEPT an ancestor <a> whose start coincides with s (no text
        between its open tag and this node). Boundary ties with zero-length
        spans contribute int(0 * coeff) == 0 and cannot change the sum; the
        only correction needed is subtracting those equal-start ancestors.
        """
        from bisect import bisect_left
        s, e = node.ts, node.te
        starts = self._a_starts
        lo = bisect_left(starts, s)
        hi = bisect_left(starts, e)
        total = self._a_psum[hi] - self._a_psum[lo]
        i = lo
        while i < hi and starts[i] == s:
            an = self._a_nodes[i]
            if an is not node and self._a_ends[i] >= e:
                # proper ancestor check: climb parents
                p = node.parent
                while p is not None:
                    if p is an:
                        total -= (self._a_psum[i + 1] - self._a_psum[i])
                        break
                    p = p.parent
            i += 1
        return total

    def elem_count(self, node: Node, tag: str) -> int:
        """Number of ``tag`` elements strictly inside node's subtree
        (excluding node itself) — bisect range query over pre-order element
        positions. Equal to ``sum(1 for d in node.iter() if d.tag == tag)``
        whenever node's own tag differs from ``tag``."""
        from bisect import bisect_left, bisect_right
        es, ee = node.es, node.ee
        pos = self._tag_pos[tag]
        return bisect_left(pos, ee) - bisect_right(pos, es)

    def embed_count(self, node: Node) -> int:
        return (self.elem_count(node, "object")
                + self.elem_count(node, "embed")
                + self.elem_count(node, "iframe"))

    def list_text_len(self, node: Node) -> int:
        """Sum of normalized text lengths of ul/ol elements strictly inside
        the subtree (nested lists counted per occurrence — identical to the
        walk-based double counting it replaces)."""
        from bisect import bisect_left, bisect_right
        es, ee = node.es, node.ee
        lo = bisect_right(self._list_starts, es)
        hi = bisect_left(self._list_starts, ee)
        return self._list_psum[hi] - self._list_psum[lo]

    def has_espan(self, node: Node) -> bool:
        return node.ig == self._gen

    def link_density(self, node: Node) -> float:
        text_len = len(self.text(node))
        if text_len == 0:
            return 0.0
        if node.ig != self._gen:
            return _link_density(node)
        return self._link_len(node) / text_len


def _class_weight(node: Node, flags: int) -> int:
    if not (flags & FLAG_WEIGHT_CLASSES):
        return 0
    weight = 0
    cls = node.get("class")
    if cls:
        if NEGATIVE_RE.search(cls):
            weight -= 25
        if POSITIVE_RE.search(cls):
            weight += 25
    nid = node.get("id")
    if nid:
        if NEGATIVE_RE.search(nid):
            weight -= 25
        if POSITIVE_RE.search(nid):
            weight += 25
    return weight


def _initial_score(node: Node, flags: int) -> float:
    tag = node.tag
    if tag == "div":
        score = 5
    elif tag in ("pre", "td", "blockquote"):
        score = 3
    elif tag in ("address", "ol", "ul", "dl", "dd", "dt", "li", "form"):
        score = -3
    elif tag in ("h1", "h2", "h3", "h4", "h5", "h6", "th"):
        score = -5
    else:
        score = 0
    return score + _class_weight(node, flags)


def _has_block_child(node: Node) -> bool:
    for c in node.children:
        if c.type == ELEMENT and c.tag not in _PHRASING_TAGS:
            return True
    return False


def _remove_nodes(root: Node, tags: Tuple[str, ...]) -> None:
    tagset = frozenset(tags)
    doomed = [n for n in root.iter_list()
              if n.type == ELEMENT and n.tag in tagset]
    for n in doomed:
        n.remove()


def _strip_scripts_and_comments(root: Node) -> None:
    doomed: List[Node] = []
    for n in root.iter_list():
        if n.type == COMMENT:
            doomed.append(n)
        elif n.type == ELEMENT and n.tag in ("script", "style", "noscript"):
            doomed.append(n)
    for n in doomed:
        n.remove()


class _Scored:
    __slots__ = ("node", "score")

    def __init__(self, node: Node, score: float):
        self.node = node
        self.score = score


class Readability:
    """One extraction run over a parsed document.

    ``html`` (the original source string) is optional: when provided, the
    first scoring attempt runs directly on the parsed body (no deep clone)
    and later attempts re-parse from source — most pages succeed on attempt
    one, so the per-page clone is skipped entirely on the hot path.
    """

    def __init__(self, doc: Node, base_url: str = "", html: Optional[str] = None):
        self.doc = doc
        self.base_url = base_url
        self.html = html

    def parse(self) -> str:
        """Return the article's HTML content ('' if nothing found)."""
        from ..dom.serialize import inner_html

        article = self.parse_node()
        return inner_html(article) if article is not None else ""

    def parse_node(self) -> Optional[Node]:
        """Return the article container Node (None if nothing found).
        The serialize->reparse round trip is an identity (text/attrs are
        entity-escaped on write and unescaped on parse), so rendering this
        node directly is byte-identical to rendering ``parse()`` output."""
        from ..dom.parser import parse_html

        body = self.doc.find_first("body")
        if body is None or not body.children:
            return None
        _strip_scripts_and_comments(self.doc)

        attempts: List[Tuple[Node, int]] = []  # (article, text length)
        first = True
        for flags in (FLAG_STRIP_UNLIKELYS | FLAG_WEIGHT_CLASSES | FLAG_CLEAN_CONDITIONALLY,
                      FLAG_WEIGHT_CLASSES | FLAG_CLEAN_CONDITIONALLY,
                      FLAG_CLEAN_CONDITIONALLY,
                      0):
            if first and self.html is not None:
                # hot path: mutate the parsed body directly; a retry (rare)
                # re-parses from source below
                page = body
            elif self.html is not None:
                doc = parse_html(self.html)
                page = doc.find_first("body")
                if page is None:
                    continue
                _strip_scripts_and_comments(doc)
            else:
                page = body.clone()
            first = False
            article = self._grab_article(page, flags)
            if article is None:
                continue
            text_len = len(_inner_text(article))
            if text_len >= CHAR_THRESHOLD:
                self._fix_relative_uris(article)
                return article
            attempts.append((article, text_len))
        if not attempts:
            return None
        best = max(attempts, key=lambda at: at[1])
        if best[1] == 0:
            return None
        self._fix_relative_uris(best[0])
        return best[0]

    # --- scoring ------------------------------------------------------------

    def _grab_article(self, page: Node, flags: int) -> Optional[Node]:
        self._strip_unlikely(page, flags)
        idx = _TextIndex(page)  # tree is stable from here until cleanup

        elements_to_score: List[Node] = []
        for node in page.iter_list():
            if node.type != ELEMENT:
                continue
            if node.tag in _DEFAULT_TAGS_TO_SCORE:
                elements_to_score.append(node)
            elif node.tag == "div" and not _has_block_child(node):
                # phrasing-only div behaves like a paragraph
                elements_to_score.append(node)

        scores: dict = {}

        def ensure(node: Node) -> None:
            if id(node) not in scores:
                scores[id(node)] = _Scored(node, _initial_score(node, flags))

        for elem in elements_to_score:
            text = idx.text(elem)
            if len(text) < 25:
                continue
            content_score = 1.0 + text.count(",") + min(len(text) // 100, 3)
            # propagate up to 5 ancestor levels (Mozilla's getNodeAncestors)
            ancestor = elem.parent
            level = 0
            while ancestor is not None and level < 5:
                if ancestor.tag in ("body", "html", "#document"):
                    break
                ensure(ancestor)
                if level == 0:
                    divider = 1.0
                elif level == 1:
                    divider = 2.0
                else:
                    divider = level * 3.0
                scores[id(ancestor)].score += content_score / divider
                ancestor = ancestor.parent
                level += 1

        if not scores:
            return None

        # scale by link density and pick top candidate
        top: Optional[_Scored] = None
        for sc in scores.values():
            sc.score *= (1.0 - idx.link_density(sc.node))
            if top is None or sc.score > top.score:
                top = sc
        if top is None or top.score <= 0:
            return None

        top_candidate = top.node
        top_score = top.score

        # Mozilla parent-climbing: prefer an ancestor that accumulates more
        # score than the candidate itself (recipe/blog wrapper promotion)
        parent = top_candidate.parent
        last_score = top_score
        threshold = top_score / 3.0
        while parent is not None and parent.tag not in ("body", "html", "#document"):
            psc = scores.get(id(parent))
            if psc is None:
                parent = parent.parent
                continue
            if psc.score < threshold:
                break
            if psc.score > last_score:
                top_candidate = parent
                top_score = psc.score
                break
            last_score = psc.score
            parent = parent.parent

        # climb while the candidate is an only child
        parent = top_candidate.parent
        while (parent is not None and parent.tag not in ("body", "html", "#document")
               and len([c for c in parent.children if c.type == ELEMENT
                        or (c.type == TEXT and c.text.strip())]) == 1):
            top_candidate = parent
            parent = parent.parent

        # sibling appending
        article = Node(ELEMENT, "div", attrs={"id": "readability-page-1"})
        sibling_threshold = max(10.0, top_score * 0.2)
        container = top_candidate.parent if top_candidate.parent is not None else page
        top_class = top_candidate.get("class")
        for sibling in list(container.children):
            if sibling.type != ELEMENT:
                continue
            append = False
            if sibling is top_candidate:
                append = True
            else:
                bonus = 0.0
                if top_class and sibling.get("class") == top_class:
                    bonus = top_score * 0.2
                ssc = scores.get(id(sibling))
                if ssc is not None and ssc.score + bonus >= sibling_threshold:
                    append = True
                elif sibling.tag == "p":
                    ld = idx.link_density(sibling)
                    text = idx.text(sibling)
                    if len(text) > 80 and ld < 0.25:
                        append = True
                    elif len(text) <= 80 and ld == 0 and re.search(r"\.( |$)", text):
                        append = True
            if append:
                # MOVE the sibling (detach + reparent) instead of deep-copying:
                # the source tree is never used again after this attempt — a
                # retry re-parses from self.html (parse_node), and the
                # html-is-None path hands each attempt its own body.clone().
                # Deep-copying here was ~9% of single-core extract time.
                sibling.remove()
                if sibling.tag not in ("div", "p", *_ALTER_TO_DIV):
                    pass  # keep original tag; markdown handles containers
                article.append(sibling)

        if flags & FLAG_CLEAN_CONDITIONALLY:
            self._prep_article(article, flags)
        return article

    def _strip_unlikely(self, page: Node, flags: int) -> None:
        if not (flags & FLAG_STRIP_UNLIKELYS):
            return
        doomed: List[Node] = []
        for node in page.iter_list():
            if node.type != ELEMENT or node.tag in ("body", "a", "html"):
                continue
            match_str = node.class_id
            if not match_str:
                continue
            if UNLIKELY_RE.search(match_str) and not MAYBE_RE.search(match_str):
                doomed.append(node)
        for node in doomed:
            node.remove()

    # --- cleanup ------------------------------------------------------------

    def _prep_article(self, article: Node, flags: int) -> None:
        _remove_nodes(article, ("form", "fieldset", "object", "embed",
                                "footer", "link", "aside", "iframe", "input",
                                "textarea", "select", "button"))
        self._clean_headers(article, flags)
        # one _TextIndex serves every pass below UNTIL a pass removes a
        # node (spans of a stale index would still include removed text);
        # cache = [index_or_None], invalidated on removal — rebuilds drop
        # from ~3.7 to ~1-2 per document with identical bytes
        cache: List[Optional[_TextIndex]] = [None]
        self._clean_conditionally(article, "table", flags, cache)
        self._clean_conditionally(article, "ul", flags, cache)
        self._clean_conditionally(article, "div", flags, cache)
        # remove empty paragraphs
        idx = cache[0] or _TextIndex(article)
        doomed = [p for p in article.elements_list("p")
                  if idx.text(p) == ""
                  and not any(c.type == ELEMENT and c.tag in ("img", "embed",
                                                              "object", "iframe")
                              for c in p.iter())]
        for p in doomed:
            p.remove()

    def _clean_headers(self, article: Node, flags: int) -> None:
        doomed = []
        for tag in ("h1", "h2"):
            for h in article.elements_list(tag):
                if _class_weight(h, flags) < 0:
                    doomed.append(h)
        for h in doomed:
            h.remove()

    def _clean_conditionally(self, article: Node, tag: str, flags: int,
                             cache: Optional[List] = None) -> None:
        if not (flags & FLAG_CLEAN_CONDITIONALLY):
            return
        if article.find_first(tag) is None:  # skip the index build entirely
            return
        doomed = []
        # removals are deferred, so one index serves the whole pass; reuse
        # the caller's cached index when the tree is unchanged since build
        if cache is not None and cache[0] is not None:
            idx = cache[0]
        else:
            idx = _TextIndex(article)
            if cache is not None:
                cache[0] = idx
        for node in article.elements_list(tag):
            if node is article:
                continue
            weight = _class_weight(node, flags)
            if weight < 0:
                doomed.append(node)
                continue
            text = idx.text(node)
            if text.count(",") >= 10:
                continue
            is_list = tag in ("ul", "ol")
            if idx.has_espan(node):
                # bisect range queries over the prebuilt element-position
                # index: candidate tags (table/ul/div) are never in the
                # counted set, so excluding self matches the walk exactly
                if not is_list:
                    list_text = idx.list_text_len(node)
                    total = len(text) or 1
                    is_list = list_text / total > 0.9
                p = idx.elem_count(node, "p")
                img = idx.elem_count(node, "img")
                li = idx.elem_count(node, "li")
                inputs = idx.elem_count(node, "input")
                embeds = idx.embed_count(node)
            else:  # node outside the indexed tree: walk (identical result)
                if not is_list:
                    list_text = sum(len(idx.text(lst))
                                    for t in ("ul", "ol")
                                    for lst in node.iter_elements(t))
                    total = len(text) or 1
                    is_list = list_text / total > 0.9
                p = img = li = inputs = embeds = 0
                for d in node.iter():
                    if d.type != ELEMENT:
                        continue
                    t = d.tag
                    if t == "p":
                        p += 1
                    elif t == "img":
                        img += 1
                    elif t == "li":
                        li += 1
                    elif t == "input":
                        inputs += 1
                    elif t in ("object", "embed", "iframe"):
                        embeds += 1
            li -= 100
            link_density = idx.link_density(node)
            content_length = len(text)
            remove = (
                (img > 1 and p / max(img, 1) < 0.5)
                or (not is_list and li > p)
                or (inputs > p / 3 if p else inputs > 0)
                or (not is_list and content_length < 25 and (img == 0 or img > 2))
                or (not is_list and weight < 25 and link_density > 0.2)
                or (weight >= 25 and link_density > 0.5)
                or ((embeds == 1 and content_length < 75) or embeds > 1)
            )
            if remove:
                doomed.append(node)
        for node in doomed:
            node.remove()
        if doomed and cache is not None:
            cache[0] = None  # tree changed: stale spans must not be reused

    def _fix_relative_uris(self, article: Node) -> None:
        if not self.base_url:
            return
        for a in article.elements_list("a"):
            href = a.get("href")
            if href and not href.startswith(("#", "http://", "https://",
                                             "mailto:", "data:")):
                a.attrs["href"] = urljoin(self.base_url, href)
        for img in article.elements_list("img"):
            src = img.get("src")
            if src and not src.startswith(("http://", "https://", "data:")):
                img.attrs["src"] = urljoin(self.base_url, src)


def extract_article_html(doc: Node, base_url: str = "") -> str:
    """Run readability on a parsed document; returns article HTML or ''."""
    return Readability(doc, base_url).parse()


def extract_article_node(doc: Node, base_url: str = "",
                         html: Optional[str] = None) -> Optional[Node]:
    """Run readability; returns the article container Node (or None)."""
    return Readability(doc, base_url, html).parse_node()
