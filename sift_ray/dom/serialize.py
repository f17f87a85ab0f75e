"""DOM -> HTML serialization (goquery Selection.Html() equivalent,
extract.go:73-87 uses it to re-serialize selected nodes)."""

from __future__ import annotations

from typing import List

from .parser import COMMENT, ELEMENT, TEXT, VOID_ELEMENTS, Node

_RAW_TEXT_TAGS = frozenset(("script", "style"))


def _escape_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _escape_attr(s: str) -> str:
    return (s.replace("&", "&amp;").replace('"', "&quot;")
            .replace("<", "&lt;").replace(">", "&gt;"))


def _open_tag(node: Node) -> str:
    if not node.attrs:
        return f"<{node.tag}>"
    attrs = "".join(f' {k}="{_escape_attr(v)}"' for k, v in node.attrs.items())
    return f"<{node.tag}{attrs}>"


def inner_html(node: Node) -> str:
    """Serialize the children of a node (iterative)."""
    out: List[str] = []
    # stack of (node, emitted) pairs; string entries are raw output
    stack: List[object] = list(reversed(node.children))
    while stack:
        item = stack.pop()
        if isinstance(item, str):
            out.append(item)
            continue
        n = item
        if n.type == TEXT:
            parent_tag = n.parent.tag if n.parent is not None else ""
            if parent_tag in _RAW_TEXT_TAGS:
                out.append(n.text)
            else:
                out.append(_escape_text(n.text))
        elif n.type == COMMENT:
            out.append(f"<!--{n.text}-->")
        elif n.type == ELEMENT:
            if n.tag in VOID_ELEMENTS:
                out.append(_open_tag(n).rstrip(">") + "/>")
            else:
                out.append(_open_tag(n))
                stack.append(f"</{n.tag}>")
                stack.extend(reversed(n.children))
    return "".join(out)


def outer_html(node: Node) -> str:
    if node.type == TEXT:
        return _escape_text(node.text)
    if node.type == COMMENT:
        return f"<!--{node.text}-->"
    if node.tag in VOID_ELEMENTS:
        return _open_tag(node).rstrip(">") + "/>"
    return _open_tag(node) + inner_html(node) + f"</{node.tag}>"
