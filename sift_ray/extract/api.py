"""Extraction dispatcher: selector / include-all / readability.

Faithful port of extract.ToMarkdown (reference extract.go:26-104):
* a CSS selector overrides include_all; zero matches or an invalid selector
  is an error (extract.go:59-91);
* include_all converts the whole document without filtering
  (extract.go:95-104);
* the default path runs readability main-content extraction then markdown
  conversion (extract.go:42-56).
"""

from __future__ import annotations

from typing import Optional

from ..dom.parser import Node, parse_html
from ..dom.selector import SelectorError, select
from ..dom.serialize import inner_html
from .markdown import convert_to_markdown, markdown_from_node, render_markdown
from .readability import extract_article_html, extract_article_node


class ExtractError(ValueError):
    pass


class SelectorNotFoundError(ExtractError):
    pass


def extract_with_selector(html: str, selector: str) -> str:
    """goquery-style selector extraction (extract.go:59-91): wrap each match
    as <tag>innerHTML</tag>, join with newline, convert to markdown."""
    doc = parse_html(html)
    try:
        try:
            matches = select(doc, selector)
        except SelectorError as exc:
            raise ExtractError(f"failed to parse selector: {exc}") from exc
        if not matches:
            raise SelectorNotFoundError(
                f"no elements found matching selector: {selector}")
        parts = [f"<{m.tag}>{inner_html(m)}</{m.tag}>" for m in matches]
        return convert_to_markdown("\n".join(parts))
    finally:
        doc.release_tree()


def extract_main_content(html: str, base_url: str = "") -> str:
    """Readability main-content extraction -> markdown (extract.go:42-56).
    Renders straight from the article DOM node — no serialize+reparse."""
    doc = parse_html(html)
    try:
        article = extract_article_node(doc, base_url, html=html)
        if article is None:
            return ""
        try:
            return markdown_from_node(article)
        finally:
            # article may live in a tree re-parsed inside readability,
            # distinct from ``doc`` — release both (Node.release_tree)
            article.release_tree()
    finally:
        doc.release_tree()


def convert_all_html(html: str) -> str:
    """Whole-document conversion without filtering (extract.go:95-104)."""
    return convert_to_markdown(html)


def to_markdown(html: str, selector: str = "", include_all: bool = False,
                base_url: str = "") -> str:
    """(extract.go:26-39)."""
    if selector != "":
        return extract_with_selector(html, selector)
    if include_all:
        return convert_all_html(html)
    return extract_main_content(html, base_url)
