"""CSS selector subset for DOM queries (goquery doc.Find equivalent).

Supports the selector grammar the reference tests exercise
(extract_test.go:125-175, 334-360): tag, ``*``, ``.class``, ``#id``,
``[attr]``, ``[attr=value]``, comma groups, descendant (space) and child
(``>``) combinators, and chained compounds like ``div.outer .inner``.
Invalid selectors raise ``SelectorError`` (goquery errors on e.g.
``>>invalid<<``).
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from .parser import ELEMENT, Node


class SelectorError(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"""
    (?P<tag>[a-zA-Z][a-zA-Z0-9-]*|\*)
    | \.(?P<cls>[a-zA-Z_][\w-]*)
    | \#(?P<id>[a-zA-Z_][\w-]*)
    | \[(?P<attr>[a-zA-Z_][\w-]*)(?:=(?P<q>["']?)(?P<val>[^\]"']*)(?P=q))?\]
    """,
    re.VERBOSE,
)


class _Compound:
    __slots__ = ("tag", "classes", "id", "attrs")

    def __init__(self):
        self.tag: Optional[str] = None
        self.classes: List[str] = []
        self.id: Optional[str] = None
        self.attrs: List[Tuple[str, Optional[str]]] = []

    def matches(self, node: Node) -> bool:
        if node.type != ELEMENT:
            return False
        if self.tag is not None and self.tag != "*" and node.tag != self.tag:
            return False
        if self.id is not None and node.attrs.get("id") != self.id:
            return False
        if self.classes:
            node_classes = node.attrs.get("class", "").split()
            for c in self.classes:
                if c not in node_classes:
                    return False
        for name, val in self.attrs:
            if name not in node.attrs:
                return False
            if val is not None and node.attrs[name] != val:
                return False
        return True


def _parse_compound(text: str) -> _Compound:
    comp = _Compound()
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None or m.start() != pos:
            raise SelectorError(f"invalid selector near {text[pos:]!r}")
        if m.group("tag"):
            if comp.tag is not None or comp.classes or comp.id or comp.attrs:
                raise SelectorError(f"misplaced tag in selector: {text!r}")
            comp.tag = m.group("tag")
        elif m.group("cls"):
            comp.classes.append(m.group("cls"))
        elif m.group("id"):
            comp.id = m.group("id")
        elif m.group("attr"):
            comp.attrs.append((m.group("attr"), m.group("val")))
        pos = m.end()
    if comp.tag is None and not comp.classes and comp.id is None and not comp.attrs:
        raise SelectorError(f"empty compound in selector: {text!r}")
    return comp


def _parse_sequence(text: str) -> List[Tuple[str, _Compound]]:
    """Parse one comma-group into [(combinator, compound), ...] where
    combinator is '' (first), ' ' (descendant) or '>' (child)."""
    text = text.strip()
    if not text:
        raise SelectorError("empty selector")
    # normalize child combinator spacing
    parts: List[Tuple[str, str]] = []
    tokens = re.split(r"(\s*>\s*|\s+)", text)
    comb = ""
    for tok in tokens:
        if tok is None or tok == "":
            continue
        if tok.strip() == ">":
            if comb == ">":
                raise SelectorError(f"double combinator in {text!r}")
            comb = ">"
        elif tok.strip() == "":
            if comb == "":
                comb = " "
        else:
            parts.append((comb if parts else "", tok))
            comb = ""
    if comb in (">",):
        raise SelectorError(f"dangling combinator in {text!r}")
    return [(c, _parse_compound(t)) for c, t in parts]


def _matches_sequence(node: Node, seq: List[Tuple[str, _Compound]]) -> bool:
    """Match rightmost compound at node, then walk ancestors."""
    if not seq[-1][1].matches(node):
        return False
    cur = node
    # iterate remaining compounds right-to-left
    for i in range(len(seq) - 1, 0, -1):
        comb = seq[i][0]
        target = seq[i - 1][1]
        if comb == ">":
            cur = cur.parent
            if cur is None or not target.matches(cur):
                return False
        else:  # descendant
            cur = cur.parent
            while cur is not None and not target.matches(cur):
                cur = cur.parent
            if cur is None:
                return False
    return True


def select(root: Node, selector: str) -> List[Node]:
    """All elements under root matching the selector, in document order."""
    selector = selector.strip()
    if not selector:
        raise SelectorError("empty selector")
    sequences = [_parse_sequence(group) for group in selector.split(",")]
    out: List[Node] = []
    seen = set()
    for node in root.iter_list():
        if node.type != ELEMENT or node.tag.startswith("#"):
            continue
        for seq in sequences:
            if _matches_sequence(node, seq):
                if id(node) not in seen:
                    seen.add(id(node))
                    out.append(node)
                break
    return out
