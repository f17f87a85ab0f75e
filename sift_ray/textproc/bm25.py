"""Field-aware BM25 ranking over the chunks of ONE document.

Reference: internal/app/sift.go:255-301 uses the external package
``github.com/chriscorrea/bm25md`` (go.mod:8): a markdown-field parser feeds a
per-document corpus (corpus == the chunks of one document) and chunks are
scored with field-weighted BM25. The bm25md internals are not vendored in the
reference, so this module RE-DERIVES the scorer from the public BM25F
formulation (Robertson & Zaragoza, "The Probabilistic Relevance Framework:
BM25 and Beyond", 2009) with the field set sift references
(context_calculator.go:177-270: FieldH1..H6, FieldBold, FieldItalic,
FieldCode, FieldBody):

  tf_w(t, d)   = sum_f weight_f * tf(t, d.f)
  len_w(d)     = sum_f weight_f * len(d.f)
  idf(t)       = ln(1 + (N - df + 0.5) / (df + 0.5))
  score(q, d)  = sum_t idf(t) * tf_w * (k1 + 1) / (tf_w + k1 * (1 - b + b * len_w/avglen_w))

with k1=1.2, b=0.75 and header-heavy field weights. Scores therefore rank
like the reference (field-aware lexical relevance) but are not numerically
identical to bm25md; all goldens in this repo are internally consistent.

Determinism: Go's sort.Slice on equal scores is UNSTABLE (sift.go:296-298);
this engine defines the stable tiebreak (score desc, original index asc) and
documents it as the canonical order.

The corpus is built per row (per document) inside map_batches — no shuffle.
"""

from __future__ import annotations

import math
import re
from typing import Dict, List, Tuple

FIELD_WEIGHTS = {
    "h1": 3.0, "h2": 2.5, "h3": 2.0, "h4": 1.8, "h5": 1.5, "h6": 1.2,
    "bold": 1.5, "italic": 1.2, "code": 0.9, "body": 1.0,
}
K1 = 1.2
B = 0.75

_WORD_RE = re.compile(r"[a-z0-9_]+")
_HEADER_LINE_RE = re.compile(r"^(#{1,6})\s+(.*)$")
_BOLD_RE = re.compile(r"\*\*([^*]+)\*\*|__([^_]+)__")
_INLINE_CODE_RE = re.compile(r"`([^`]+)`")
_ITALIC_RE = re.compile(r"(?<!\*)\*([^*\s][^*]*)\*(?!\*)|(?<!_)_([^_\s][^_]*)_(?!_)")


def _tokenize(text: str) -> List[str]:
    return _WORD_RE.findall(text.lower())


def parse_markdown_fields(chunk: str) -> Dict[str, str]:
    """Split one markdown chunk into field -> text (bm25md's
    NewMarkdownFieldParser().ParseDocument equivalent, re-derived)."""
    fields: Dict[str, List[str]] = {}

    def add(field: str, text: str) -> None:
        if text:
            fields.setdefault(field, []).append(text)

    in_code = False
    for line in chunk.split("\n"):
        stripped = line.strip()
        if stripped.startswith("```"):
            in_code = not in_code
            continue
        if in_code:
            add("code", line)
            continue
        m = _HEADER_LINE_RE.match(stripped)
        if m:
            add("h%d" % len(m.group(1)), m.group(2))
            continue
        rest = line
        rest = _INLINE_CODE_RE.sub(lambda mm: add("code", mm.group(1)) or " ", rest)
        rest = _BOLD_RE.sub(
            lambda mm: add("bold", mm.group(1) or mm.group(2)) or " ", rest)
        rest = _ITALIC_RE.sub(
            lambda mm: add("italic", mm.group(1) or mm.group(2)) or " ", rest)
        add("body", rest)
    return {f: " ".join(parts) for f, parts in fields.items()}


class Bm25Corpus:
    """Per-document BM25F corpus over chunk list (sift.go:269-293 shape)."""

    def __init__(self, chunks: List[str]):
        self._tfs: List[Dict[str, float]] = []
        self._lens: List[float] = []
        df: Dict[str, int] = {}
        for chunk in chunks:
            fields = parse_markdown_fields(chunk)
            tf: Dict[str, float] = {}
            ln = 0.0
            for field, text in fields.items():
                w = FIELD_WEIGHTS.get(field, 1.0)
                toks = _tokenize(text)
                ln += w * len(toks)
                for t in toks:
                    tf[t] = tf.get(t, 0.0) + w
            self._tfs.append(tf)
            self._lens.append(ln)
            for t in tf:
                df[t] = df.get(t, 0) + 1
        self._df = df
        self._n = len(chunks)
        self._avglen = (sum(self._lens) / self._n) if self._n else 0.0

    def score(self, query: str, doc_index: int) -> float:
        if doc_index < 0 or doc_index >= self._n:
            return 0.0
        q_terms = _tokenize(query)
        if not q_terms:
            return 0.0
        tf = self._tfs[doc_index]
        dl = self._lens[doc_index]
        avg = self._avglen or 1.0
        total = 0.0
        for t in q_terms:
            w = tf.get(t)
            if not w:
                continue
            df = self._df.get(t, 0)
            idf = math.log(1.0 + (self._n - df + 0.5) / (df + 0.5))
            total += idf * w * (K1 + 1.0) / (w + K1 * (1.0 - B + B * dl / avg))
        return total


def lexical_search(chunks: List[str], query: str) -> List[Tuple[str, float, int]]:
    """Score all chunks against the query and sort by relevance
    (performLexicalSearch, sift.go:255-301). Returns (chunk, score, index)
    tuples sorted score-desc with stable index-asc tiebreak."""
    if not chunks:
        return []
    corpus = Bm25Corpus(chunks)
    scored = [(chunk, corpus.score(query, i), i) for i, chunk in enumerate(chunks)]
    scored.sort(key=lambda cs: (-cs[1], cs[2]))
    return scored
