"""HTML -> Markdown renderer.

Reimplements the semantics sift gets from JohannesKaufmann/html-to-markdown
v1.6.0 (reference extract.go:107-147): ATX headings, ``-`` bullets, numbered
ordered lists, ``**bold**`` / ``*italic*``, ``> `` blockquotes, fenced code
blocks, inline code, links/images — plus sift's custom rule ``<br>`` -> a
single ``"\\n"`` (extract.go:112-119) and the whitespace cleanup pass
(extract.go:127-146): collapse 3+ newlines to 2 and trim spaces/tabs while
preserving line-break patterns.

Markdown punctuation escaping in text is intentionally NOT performed (the
fixtures never require it); this is a documented divergence from the Go
library. Output is deterministic; goldens in this repo derive from it.

Rendering is recursive over the DOM but bounded: callers parse with the DOM
layer whose trees are built iteratively; a depth guard rejects pathological
nesting (quarantined upstream by the pipeline).
"""

from __future__ import annotations

import re
from typing import List, Optional

from ..dom.parser import COMMENT, ELEMENT, TEXT, Node, parse_html

_WS_RE = re.compile(r"\s+")

_SKIP_TAGS = frozenset((
    "script", "style", "noscript", "head", "title", "meta", "link", "base",
    "template", "iframe", "object", "embed", "param", "select", "option",
    "input", "textarea", "svg", "canvas", "audio", "video", "source", "track",
))

_BLOCK_TAGS = frozenset((
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "li",
    "blockquote", "pre", "hr", "table", "thead", "tbody", "tfoot", "tr",
    "td", "th", "article", "section", "header", "footer", "nav", "aside",
    "main", "figure", "figcaption", "address", "form", "fieldset", "details",
    "summary", "dl", "dt", "dd", "center", "caption",
))

_HEADING_LEVEL = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}

MAX_RENDER_DEPTH = 900


class RenderDepthError(RuntimeError):
    """DOM too deep to render safely; row should be quarantined."""


def _collapse(text: str) -> str:
    return _WS_RE.sub(" ", text)


def _wrap_inline(content: str, marker: str) -> str:
    """Wrap with emphasis markers, moving edge whitespace outside."""
    stripped = content.strip()
    if stripped == "":
        return content
    lead = content[: len(content) - len(content.lstrip())]
    trail = content[len(content.rstrip()):]
    return f"{lead}{marker}{stripped}{marker}{trail}"


class _Renderer:
    def __init__(self) -> None:
        self._depth = 0

    # --- inline -------------------------------------------------------------

    def render_inline(self, node: Node) -> str:
        self._depth += 1
        if self._depth > MAX_RENDER_DEPTH:
            self._depth -= 1
            raise RenderDepthError("max render depth exceeded")
        try:
            out: List[str] = []
            for child in node.children:
                if child.type == TEXT:
                    out.append(_collapse(child.text))
                elif child.type == COMMENT:
                    continue
                elif child.tag in _SKIP_TAGS:
                    continue
                elif child.tag == "br":
                    out.append("\n")  # sift custom rule (extract.go:112-119)
                elif child.tag in ("strong", "b"):
                    out.append(_wrap_inline(self.render_inline(child), "**"))
                elif child.tag in ("em", "i"):
                    out.append(_wrap_inline(self.render_inline(child), "*"))
                elif child.tag == "code":
                    text = _collapse(child.text_content()).strip()
                    out.append(f"`{text}`" if text else "")
                elif child.tag == "a":
                    inner = self.render_inline(child).strip()
                    href = child.get("href")
                    title = child.get("title")
                    if not inner and not href:
                        continue
                    if href:
                        if title:
                            out.append(f"[{inner}]({href} \"{title}\")")
                        else:
                            out.append(f"[{inner}]({href})")
                    else:
                        out.append(inner)
                elif child.tag == "img":
                    alt = child.get("alt")
                    src = child.get("src")
                    if src:
                        out.append(f"![{alt}]({src})")
                elif child.tag in _BLOCK_TAGS:
                    # block inside inline context: render as flow, splice
                    blocks = self.render_flow(child)
                    out.append("\n\n".join(blocks))
                else:
                    out.append(self.render_inline(child))
            return "".join(out)
        finally:
            self._depth -= 1

    # --- blocks -------------------------------------------------------------

    def render_flow(self, node: Node) -> List[str]:
        """Render a container's children into a list of markdown blocks."""
        self._depth += 1
        if self._depth > MAX_RENDER_DEPTH:
            self._depth -= 1
            raise RenderDepthError("max render depth exceeded")
        try:
            blocks: List[str] = []
            inline_run: List[Node] = []

            def flush_inline():
                if not inline_run:
                    return
                holder = Node(ELEMENT, "#inline")
                holder.children = list(inline_run)
                text = self.render_inline(holder).strip(" \t")
                # drop whitespace-only implicit paragraphs
                if text.strip() != "":
                    blocks.append(text.strip("\n").strip(" \t"))
                inline_run.clear()

            for child in node.children:
                if child.type == COMMENT:
                    continue
                if child.type == TEXT:
                    inline_run.append(child)
                    continue
                tag = child.tag
                if tag in _SKIP_TAGS:
                    continue
                if tag not in _BLOCK_TAGS:
                    inline_run.append(child)
                    continue
                flush_inline()
                blocks.extend(self.render_block(child))
            flush_inline()
            return blocks
        finally:
            self._depth -= 1

    def render_block(self, node: Node) -> List[str]:
        tag = node.tag
        if tag in _HEADING_LEVEL:
            text = self.render_inline(node).strip().replace("\n", " ")
            if text == "":
                return []
            return ["#" * _HEADING_LEVEL[tag] + " " + text]
        if tag == "p":
            text = self.render_inline(node).strip(" \t").strip("\n")
            return [text] if text.strip() else []
        if tag == "hr":
            return ["---"]
        if tag == "pre":
            code = node.text_content()
            code = code.strip("\n")
            return [f"```\n{code}\n```"]
        if tag == "blockquote":
            inner_blocks = self.render_flow(node)
            if not inner_blocks:
                return []
            inner = "\n\n".join(inner_blocks)
            quoted = "\n".join(
                ("> " + line) if line.strip() else ">"
                for line in inner.split("\n"))
            return [quoted]
        if tag in ("ul", "ol"):
            return self._render_list(node)
        if tag == "li":
            # li outside a list: render as a lone bullet
            return self._render_list_items([node], ordered=False)
        if tag in ("td", "th"):
            return self.render_flow(node)
        # generic containers (div, article, section, tr, ...)
        return self.render_flow(node)

    def _render_list(self, node: Node) -> List[str]:
        ordered = node.tag == "ol"
        items = [c for c in node.children
                 if c.type == ELEMENT and c.tag == "li"]
        others = [c for c in node.children
                  if c.type == ELEMENT and c.tag not in ("li",)
                  and c.tag not in _SKIP_TAGS]
        out = self._render_list_items(items, ordered)
        for other in others:
            if other.tag in _BLOCK_TAGS:
                out.extend(self.render_block(other))
        return out

    def _render_list_items(self, items: List[Node], ordered: bool) -> List[str]:
        lines: List[str] = []
        for i, li in enumerate(items):
            marker = f"{i + 1}. " if ordered else "- "
            body_blocks = self.render_flow(li)
            body = "\n\n".join(body_blocks) if body_blocks else ""
            item_lines = body.split("\n")
            indent = " " * len(marker)
            rendered = [marker + (item_lines[0] if item_lines else "")]
            rendered.extend(
                (indent + line) if line.strip() else ""
                for line in item_lines[1:])
            lines.append("\n".join(rendered))
        return ["\n".join(lines)] if lines else []


def render_markdown(root: Node) -> str:
    """Render a parsed DOM (document or element) to markdown."""
    renderer = _Renderer()
    body = root.find_first("body") if root.tag == "#document" else None
    target = body if body is not None else root
    blocks = renderer.render_flow(target)
    return "\n\n".join(b for b in blocks if b.strip() != "")


def _finalize_markdown(markdown: str) -> str:
    # normalize 3+ consecutive newlines to 2 (extract.go:131-134)
    while "\n\n\n" in markdown:
        markdown = markdown.replace("\n\n\n", "\n\n")
    # trailing cleanup preserving line-break patterns (extract.go:136-144)
    if markdown.endswith("\n"):
        markdown = markdown.rstrip(" \t")
    else:
        markdown = markdown.strip(" \t")
    return markdown


def convert_to_markdown(html_string: str) -> str:
    """HTML string -> clean markdown (convertToMarkdown, extract.go:107-147)."""
    root = parse_html(html_string)
    try:
        return _finalize_markdown(render_markdown(root))
    finally:
        root.release_tree()  # break DOM cycles: refcount frees, not the GC


def markdown_from_node(root: Node) -> str:
    """DOM node -> clean markdown directly (skips the serialize->reparse
    round trip of ``convert_to_markdown``; byte-identical because serialize
    escapes and parse unescapes symmetrically)."""
    return _finalize_markdown(render_markdown(root))
