"""Per-document sift pipeline: markdown text -> sized/searched output.

This is the Run() tail of the reference (internal/app/sift.go:79-104 after
extraction, plus applyContentTransformations/applyTransformations,
sift.go:168-251). It operates on ONE document's markdown string and is called
row-locally inside Ray map_batches — no cross-document state.

Output renderers: the reference parses --text/--json flags but never applies
them (sift.go:22-45 defined, never read by Run — see SURVEY.md §1.1); the
Markdown path is the sift-identical one. ``render_output`` implements all
three as real operators.
"""

from __future__ import annotations

import json
from typing import List, Optional, Tuple

from ..config import FORMAT_JSON, FORMAT_TEXT, SiftConfig
from .bm25 import lexical_search
from .classify import Classifier
from .selection import Chunk, ChunkSelector, apply_simple_size_limit


def prepare_chunks_for_processing(text: str, cfg: SiftConfig,
                                  classifier: Optional[Classifier] = None
                                  ) -> Tuple[ChunkSelector, List[str]]:
    """Chunk + classification filter (prepareChunksForProcessing,
    sift.go:184-213)."""
    selector = ChunkSelector(cfg.counting_method, cfg.max_units,
                             cfg.sizing_strategy)
    chunks = selector.prepare_chunks(text)
    if not chunks:
        return selector, chunks
    if not cfg.include_all:
        clf = classifier or Classifier()
        chunks = [c for i, c in enumerate(chunks)
                  if not clf.is_extraneous(c, i, len(chunks))]
    return selector, chunks


def apply_transformations(chunks: List[str], selector: ChunkSelector,
                          cfg: SiftConfig) -> str:
    """Search ordering or strategy ordering, then unified selection
    (applyTransformations, sift.go:216-251)."""
    query = cfg.search_query.strip()
    if query != "":
        scored = lexical_search(chunks, query)
        ordered = selector.prepare_for_search(scored)
        before, after = cfg.context_before, cfg.context_after
    else:
        ordered = selector.prepare_for_strategy(chunks)
        before = selector.default_context_before
        after = selector.default_context_after
    return selector.select_with_context_config(
        ordered, chunks, before, after, cfg.context_units, cfg.use_smart_context)


def apply_content_transformations(text: str, cfg: SiftConfig,
                                  classifier: Optional[Classifier] = None) -> str:
    """(applyContentTransformations, sift.go:168-181)."""
    selector, chunks = prepare_chunks_for_processing(text, cfg, classifier)
    if not chunks:
        return ""
    return apply_transformations(chunks, selector, cfg)


def sift_markdown(markdown: str, cfg: SiftConfig,
                  classifier: Optional[Classifier] = None) -> str:
    """Full post-extraction pipeline for one document (Run step 2,
    sift.go:90-103): no search -> simple size limit; search -> chunk +
    classify + BM25 + select."""
    query = cfg.search_query.strip()
    if query == "":
        if cfg.max_units <= 0:
            return markdown
        return apply_simple_size_limit(markdown, cfg.max_units,
                                       cfg.counting_method)
    return apply_content_transformations(markdown, cfg, classifier)


# --- output renderers (S6; real operators, Markdown is sift-identical) ------

_MD_STRIP_PATTERNS = None


def markdown_to_text(md: str) -> str:
    """Plain-text rendering: strip markdown syntax, keep content."""
    global _MD_STRIP_PATTERNS
    import re
    if _MD_STRIP_PATTERNS is None:
        _MD_STRIP_PATTERNS = [
            (re.compile(r"^#{1,6}\s+", re.M), ""),          # headers
            (re.compile(r"\*\*([^*]+)\*\*"), r"\1"),         # bold
            (re.compile(r"(?<!\*)\*([^*\s][^*]*)\*(?!\*)"), r"\1"),  # italic
            (re.compile(r"`([^`]+)`"), r"\1"),               # inline code
            (re.compile(r"^```.*$", re.M), ""),              # fences
            (re.compile(r"^>\s?", re.M), ""),                # blockquote
            (re.compile(r"!\[([^\]]*)\]\([^)]*\)"), r"\1"),  # images
            (re.compile(r"\[([^\]]+)\]\([^)]*\)"), r"\1"),   # links
            (re.compile(r"^\s*[-*+]\s+", re.M), ""),         # bullets
            (re.compile(r"^\s*\d+\.\s+", re.M), ""),         # numbered
        ]
    out = md
    for pat, rep in _MD_STRIP_PATTERNS:
        out = pat.sub(rep, out)
    return out


def render_output(markdown: str, output_format: str) -> str:
    """Markdown (default) / text / json renderers (S6)."""
    if output_format == FORMAT_TEXT:
        return markdown_to_text(markdown)
    if output_format == FORMAT_JSON:
        return json.dumps({"content": markdown}, ensure_ascii=False)
    return markdown
