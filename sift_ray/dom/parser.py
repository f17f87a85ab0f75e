"""Tolerant HTML parser producing a lightweight DOM.

Stands in for Go's net/html (used by goquery and go-readability in the
reference: internal/extract/extract.go:59-91, 42-56). Built on the stdlib
``html.parser.HTMLParser`` with HTML5-style implied end tags so malformed
HTML (unclosed <h1>/<p>, extract_test.go:86-95) parses sensibly.

All tree construction and traversal is ITERATIVE — deeply nested pathological
DOMs (hundreds of levels) must not hit Python recursion limits.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Dict, Iterator, List, Optional

VOID_ELEMENTS = frozenset((
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
))

# starting any of these closes an open <p> (HTML5 tree construction)
_P_CLOSERS = frozenset((
    "address", "article", "aside", "blockquote", "details", "div", "dl",
    "fieldset", "figcaption", "figure", "footer", "form", "h1", "h2", "h3",
    "h4", "h5", "h6", "header", "hr", "main", "menu", "nav", "ol", "p",
    "pre", "section", "table", "ul",
))

_HEADINGS = frozenset(("h1", "h2", "h3", "h4", "h5", "h6"))

# tags that implicitly close same/sibling tags: start tag -> closeable set
_SIBLING_CLOSERS: Dict[str, frozenset] = {
    "li": frozenset(("li",)),
    "dt": frozenset(("dt", "dd")),
    "dd": frozenset(("dt", "dd")),
    "tr": frozenset(("tr", "td", "th")),
    "td": frozenset(("td", "th")),
    "th": frozenset(("td", "th")),
    "option": frozenset(("option",)),
    "thead": frozenset(("thead", "tbody", "tfoot")),
    "tbody": frozenset(("thead", "tbody", "tfoot")),
    "tfoot": frozenset(("thead", "tbody", "tfoot")),
}

_HEAD_TAGS = frozenset(("title", "meta", "link", "base", "style"))

ELEMENT = 0
TEXT = 1
COMMENT = 2


class Node:
    """One DOM node. type is ELEMENT / TEXT / COMMENT."""

    # ts/te/es/ee/ig are scratch slots owned by readability._TextIndex
    # (text span, element-position span, index generation stamp) — storing
    # them on the node replaces four id()-keyed dict lookups per query
    __slots__ = ("type", "tag", "attrs", "children", "parent", "text",
                 "ts", "te", "es", "ee", "ig")

    def __init__(self, type_: int, tag: str = "", text: str = "",
                 attrs: Optional[Dict[str, str]] = None):
        self.type = type_
        self.tag = tag
        self.attrs = attrs or {}
        self.children: List["Node"] = []
        self.parent: Optional["Node"] = None
        self.text = text
        self.ig = 0  # 0 = not indexed by any _TextIndex generation

    # --- tree ops ----------------------------------------------------------

    def append(self, child: "Node") -> None:
        child.parent = self
        self.children.append(child)

    def remove(self) -> None:
        """Detach this node from its parent."""
        if self.parent is not None:
            try:
                self.parent.children.remove(self)
            except ValueError:
                pass
            self.parent = None

    def replace_with(self, other: "Node") -> None:
        if self.parent is None:
            return
        idx = self.parent.children.index(self)
        other.parent = self.parent
        self.parent.children[idx] = other
        self.parent = None

    # --- accessors ---------------------------------------------------------

    @property
    def is_element(self) -> bool:
        return self.type == ELEMENT

    def get(self, name: str, default: str = "") -> str:
        return self.attrs.get(name, default)

    @property
    def class_id(self) -> str:
        """class + ' ' + id, the string readability weighs."""
        return (self.attrs.get("class", "") + " " + self.attrs.get("id", "")).strip()

    def iter(self) -> Iterator["Node"]:
        """Document-order traversal including self (iterative)."""
        stack = [self]
        while stack:
            node = stack.pop()
            yield node
            stack.extend(reversed(node.children))

    def iter_elements(self, tag: Optional[str] = None) -> Iterator["Node"]:
        stack = [self]
        pop = stack.pop
        extend = stack.extend
        while stack:
            n = pop()
            if n.type == ELEMENT and (tag is None or n.tag == tag):
                yield n
            if n.children:
                extend(reversed(n.children))

    # List-returning twins of iter()/iter_elements() for the hot readability
    # loops: same document (pre)order, but a tight append loop instead of a
    # generator — saves one frame resume per node, which is ~15% of the
    # whole extract kernel across the full-page walks.

    def release_tree(self) -> None:
        """Break the parent/children reference cycles of the WHOLE tree
        this node belongs to (walks up to the root first). A DOM tree is
        pure cyclic garbage once rendering is done — breaking the cycles
        lets refcounting reclaim it immediately instead of leaving ~10^5
        objects per page for the cycle collector to trace (measured
        +15-18% extract throughput single-core, more under many-worker
        memory contention)."""
        node: "Node" = self
        while node.parent is not None:
            node = node.parent
        stack = [node]
        pop = stack.pop
        extend = stack.extend
        while stack:
            n = pop()
            c = n.children
            if c:
                extend(c)
                n.children = []
            n.parent = None

    def iter_list(self) -> List["Node"]:
        out: List["Node"] = []
        append = out.append
        stack = [self]
        pop = stack.pop
        extend = stack.extend
        while stack:
            n = pop()
            append(n)
            if n.children:
                extend(reversed(n.children))
        return out

    def elements_list(self, tag: Optional[str] = None) -> List["Node"]:
        out: List["Node"] = []
        append = out.append
        stack = [self]
        pop = stack.pop
        extend = stack.extend
        while stack:
            n = pop()
            if n.type == ELEMENT and (tag is None or n.tag == tag):
                append(n)
            if n.children:
                extend(reversed(n.children))
        return out

    def text_content(self) -> str:
        """Concatenated text of all descendant text nodes (iterative)."""
        parts: List[str] = []
        stack = [self]
        pop = stack.pop
        extend = stack.extend
        while stack:
            n = pop()
            if n.type == TEXT:
                parts.append(n.text)
            elif n.children:
                extend(reversed(n.children))
        return "".join(parts)

    def find_first(self, tag: str) -> Optional["Node"]:
        for n in self.iter_elements(tag):
            return n
        return None

    def depth_below(self) -> int:
        """Max depth of the subtree (iterative)."""
        best = 0
        stack = [(self, 0)]
        while stack:
            node, d = stack.pop()
            if d > best:
                best = d
            for c in node.children:
                stack.append((c, d + 1))
        return best

    def clone(self) -> "Node":
        """Deep copy (iterative)."""
        root = Node(self.type, self.tag, self.text, dict(self.attrs))
        stack = [(self, root)]
        while stack:
            src, dst = stack.pop()
            for c in src.children:
                cc = Node(c.type, c.tag, c.text, dict(c.attrs))
                dst.append(cc)
                stack.append((c, cc))
        return root

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        if self.type == TEXT:
            return f"Text({self.text[:30]!r})"
        return f"<{self.tag} {self.attrs}>({len(self.children)} children)"


class _TreeBuilder(HTMLParser):
    """HTMLParser -> Node tree with implied end tags and html/head/body
    synthesis (net/html does the same per the WHATWG algorithm)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node(ELEMENT, "#document")
        self.html: Optional[Node] = None
        self.head: Optional[Node] = None
        self.body: Optional[Node] = None
        self.stack: List[Node] = [self.root]

    def updatepos(self, i: int, j: int) -> int:
        """No-op the base class's line/column tracking — it exists only for
        error positions, which this tolerant builder never reports."""
        return j

    # --- structure synthesis ------------------------------------------------

    def _ensure_html(self) -> Node:
        if self.html is None:
            self.html = Node(ELEMENT, "html")
            self.root.append(self.html)
            if self.stack == [self.root]:
                self.stack.append(self.html)
        return self.html

    def _ensure_head(self) -> Node:
        if self.head is None:
            html = self._ensure_html()
            self.head = Node(ELEMENT, "head")
            html.append(self.head)
        return self.head

    def _ensure_body(self) -> Node:
        if self.body is None:
            html = self._ensure_html()
            self.body = Node(ELEMENT, "body")
            html.append(self.body)
            if self.stack and self.stack[-1] in (self.root, self.html):
                self.stack.append(self.body)
        return self.body

    def _current(self) -> Node:
        return self.stack[-1]

    def _in_flow(self) -> bool:
        """True once we're inside body content."""
        cur = self._current()
        return cur is not self.root and cur is not self.html and cur is not self.head

    # --- handler plumbing ---------------------------------------------------

    def handle_starttag(self, tag: str, attrs) -> None:
        attrs_d: Dict[str, str] = {}
        for k, v in attrs:
            if k not in attrs_d:
                attrs_d[k] = v if v is not None else ""

        if tag == "html":
            html = self._ensure_html()
            html.attrs.update(attrs_d)
            if self._current() is self.root:
                self.stack.append(html)
            return
        if tag == "head":
            head = self._ensure_head()
            head.attrs.update(attrs_d)
            if self._current() in (self.root, self.html):
                self.stack.append(head)
            return
        if tag == "body":
            body = self._ensure_body()
            body.attrs.update(attrs_d)
            if self.stack[-1] in (self.root, self.html, self.head):
                while self.stack[-1] is not self.root and self.stack[-1] is not self.html:
                    self.stack.pop()
                self.stack.append(body)
            return

        # head-only tags before body content go into head
        if tag in _HEAD_TAGS and self.body is None:
            parent = self._ensure_head()
            node = Node(ELEMENT, tag, attrs=attrs_d)
            parent.append(node)
            if tag not in VOID_ELEMENTS:
                self.stack.append(node)
            return

        if not self._in_flow():
            self._ensure_body()

        # implied end tags
        if tag in _P_CLOSERS:
            self._close_if_open("p", scope=("body", "html", "#document",
                                            "td", "th", "li", "blockquote",
                                            "div", "section", "article"))
        if tag in _HEADINGS and self._current().tag in _HEADINGS:
            self.stack.pop()
        closers = _SIBLING_CLOSERS.get(tag)
        if closers:
            if self._current().tag in closers:
                self.stack.pop()

        node = Node(ELEMENT, tag, attrs=attrs_d)
        self._current().append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def _close_if_open(self, tag: str, scope) -> None:
        """Pop an open <tag> if it is the current element or just below
        (simplified 'has element in button scope')."""
        for i in range(len(self.stack) - 1, 0, -1):
            t = self.stack[i].tag
            if t == tag:
                del self.stack[i:]
                return
            if t in scope or t in _P_CLOSERS:
                return

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in VOID_ELEMENTS:
            self.handle_starttag(tag, attrs)
        else:
            self.handle_starttag(tag, attrs)
            self.handle_endtag(tag)

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_ELEMENTS:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            node = self.stack[i]
            if node.tag == tag:
                if node is self.html or node is self.body or node is self.head:
                    del self.stack[i:]
                    return
                del self.stack[i:]
                return
        # no matching open tag: ignore

    def handle_data(self, data: str) -> None:
        if not data:
            return
        cur = self._current()
        if cur is self.root or cur is self.html or cur is self.head:
            if data.strip() == "":
                return
            self._ensure_body()
            cur = self._current()
        cur.append(Node(TEXT, text=data))

    def handle_comment(self, data: str) -> None:
        if self._in_flow():
            self._current().append(Node(COMMENT, text=data))


# --- fast tokenizer ---------------------------------------------------------
#
# A regex-driven scanner that drives the SAME _TreeBuilder handlers as
# html.parser but ~2-3x faster. It recognizes the common constructs
# (tags/attrs, end tags, comments, doctype, entity references, script/style
# raw text). Inputs containing constructs it does not model byte-identically
# (processing instructions, `<![CDATA[`, markup declarations) are rejected
# up front by _FAST_UNSAFE_RE and parsed with the stdlib path instead, so
# the fast path can never silently diverge. Differential-tested against
# html.parser in tests/test_dom.py.

_FAST_TAG_RE = re.compile(
    r"<(?:"
    r"(?P<end>/[a-zA-Z][^<>]*>)"
    r"|(?P<comment>!--.*?--\s*>)"
    r"|(?P<decl>![^<>]*>)"
    r"|(?P<start>[a-zA-Z][^<>]*>)"
    r")", re.S)

# constructs whose html.parser behavior the fast scanner does not replicate
_FAST_UNSAFE_RE = re.compile(
    r"<\?"                       # processing instructions
    r"|<!(?!--|doctype[\s>])"    # markup decls except comments/plain doctype
    r"|<!-{1,3}>"                # abrupt comment close (<!-->, <!--->):
                                 # html.parser emits these as literal text
    r"|<!doctype[^>]*\["         # doctype with internal subset
    r"|--!>"                     # nonstandard comment close
    r"|</[^a-zA-Z]"              # end tags with whitespace/garbage after </
    r"|<[a-zA-Z][^<>]*<"         # unclosed tag start swallowing another '<'
    , re.I | re.S)

_ATTR_RE = re.compile(
    r"""([^\s/>=]+)(?:\s*=\s*("[^"]*"|'[^']*'|[^\s>]*))?""")

# html.parser raw-text (CDATA-content) elements are script/style ONLY.
# A close requires a tag-name boundary (</scriptx> does NOT close), and the
# full end tag must be the plain `</ tag >` form — anything else falls back.
_RAWTEXT_END = {
    "script": (re.compile(r"</\s*script(?=[>\s/])", re.I),
               re.compile(r"</\s*script\s*>", re.I)),
    "style": (re.compile(r"</\s*style(?=[>\s/])", re.I),
              re.compile(r"</\s*style\s*>", re.I)),
}

# self-closing only when '/' is the LAST char before '>' (html.parser treats
# '/ >' as a regular start tag with junk, not startend)
_SIMPLE_START_RE = re.compile(r"([a-zA-Z][a-zA-Z0-9:_-]*)\s*(/?)$")
_TAGNAME_RE = re.compile(r"[a-zA-Z][a-zA-Z0-9:_-]*")


class _FastUnsupported(Exception):
    pass


def _fast_feed(builder: "_TreeBuilder", html: str) -> None:
    """Drive builder handlers with a regex scan. Raises _FastUnsupported for
    inputs the scanner does not model byte-identically."""
    from html import unescape

    def emit_text(text: str) -> None:
        # html.parser hands a bare '<' to handle_data as its own call (the
        # chunk before it separately) — replicate, because the builder's
        # "whitespace-only before <body>" rule is per-call
        if "<" not in text:
            builder.handle_data(unescape(text) if "&" in text else text)
            return
        parts = text.split("<")
        if parts[0]:
            builder.handle_data(
                unescape(parts[0]) if "&" in parts[0] else parts[0])
        for part in parts[1:]:
            builder.handle_data("<")
            if part:
                builder.handle_data(unescape(part) if "&" in part else part)

    pos = 0
    n = len(html)
    search = _FAST_TAG_RE.search
    while pos < n:
        m = search(html, pos)
        if m is None:
            if pos < n:
                emit_text(html[pos:])
            break
        if m.start() > pos:
            emit_text(html[pos:m.start()])
        pos = m.end()
        kind = m.lastgroup  # exactly one alternative matched
        if kind == "start":
            raw = m.group("start")[:-1]  # strip '>'
            sm = _SIMPLE_START_RE.match(raw)
            if sm is not None:
                tag, selfclose = sm.group(1).lower(), sm.group(2)
                attrs: List = []
            else:
                ws = _TAGNAME_RE.match(raw)
                if ws is None:
                    raise _FastUnsupported(raw)
                tag = ws.group().lower()
                rest = raw[ws.end():]
                if rest and not rest[0].isspace() and rest[0] != "/":
                    raise _FastUnsupported(raw)
                # a quoted attr value containing '>' would have truncated the
                # match: bail on unbalanced quotes
                if rest.count('"') % 2 or rest.count("'") % 2:
                    raise _FastUnsupported(raw)
                # html.parser is startend ONLY for a literal '/>' ending:
                # `href=foo/` keeps the slash in the value, and `/ >` is a
                # regular start tag (the stray '/' is junk the attr check
                # below routes to the stdlib fallback)
                selfclose = (rest.endswith("/")
                             and (len(rest) == 1
                                  or rest[-2] in " \t\n\r\f\"'"))
                if selfclose:
                    rest = rest[:-1]
                attrs = []
                last = 0
                for am in _ATTR_RE.finditer(rest):
                    # any non-whitespace BETWEEN attr matches means
                    # html.parser would tokenize differently (stray '=', '/')
                    if rest[last:am.start()].strip():
                        raise _FastUnsupported(raw)
                    last = am.end()
                    name = am.group(1).lower()
                    val = am.group(2)
                    if val is None:
                        attrs.append((name, None))
                    else:
                        if val[:1] in "\"'":
                            val = val[1:-1]
                        attrs.append((name,
                                      unescape(val) if "&" in val else val))
                if rest[last:].strip():
                    raise _FastUnsupported(raw)
            if selfclose:
                builder.handle_startendtag(tag, attrs)
            else:
                builder.handle_starttag(tag, attrs)
                rawtext = _RAWTEXT_END.get(tag)
                if rawtext is not None:
                    boundary_re, full_re = rawtext
                    em = boundary_re.search(html, pos)
                    if em is None:
                        # html.parser discards unterminated raw text entirely
                        pos = n
                    else:
                        fm = full_re.match(html, em.start())
                        if fm is None:  # e.g. `</script/>` — stdlib quirks
                            raise _FastUnsupported(tag)
                        if em.start() > pos:
                            builder.handle_data(html[pos:em.start()])
                        builder.handle_endtag(tag)
                        pos = fm.end()
        elif kind == "end":
            name = m.group("end")[1:-1].strip().lower()
            fm = _TAGNAME_RE.match(name)
            if fm is None or fm.end() != len(name):
                raise _FastUnsupported(name)
            builder.handle_endtag(name)
        elif kind == "comment":
            body = m.group("comment")[3:]
            body = body[:body.rindex("--")]
            builder.handle_comment(body)
        # decl (doctype etc.): html.parser calls handle_decl — our builder
        # ignores declarations, so skipping is equivalent


def parse_html(html: str, fast: bool = True) -> Node:
    """Parse HTML into a document Node. Never raises on malformed input.

    Uses the fast regex scanner when the input contains only constructs it
    models byte-identically; otherwise (or on any scanner error) falls back
    to the stdlib html.parser path with identical handler semantics.
    """
    if fast and _FAST_UNSAFE_RE.search(html) is None:
        builder = _TreeBuilder()
        try:
            _fast_feed(builder, html)
            if builder.body is None:
                builder._ensure_body()
            return builder.root
        except Exception:
            pass  # fall through to the stdlib path
    builder = _TreeBuilder()
    try:
        builder.feed(html)
        builder.close()
    except Exception:
        # html.parser is robust, but guard anyway: return what was built
        pass
    if builder.body is None:
        builder._ensure_body()
    return builder.root
