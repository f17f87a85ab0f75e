"""TF-IDF scorer — faithful port of the reference's (dead-code) package.

Reference: internal/tfidf/tfidf.go:49-202. Not wired into the reference app
(no imports outside its own test); provided here as an optional scorer with
identical semantics: lowercase, split on ``[^a-zA-Z0-9_-]+``, drop tokens
shorter than 3 chars, TF = relative frequency, IDF = ln(N/df),
score = sum(tf*idf) over query terms.
"""

from __future__ import annotations

import math
import re
from typing import Dict, List

_SPLIT_RE = re.compile(r"[^a-zA-Z0-9_-]+")


def tokenize(text: str) -> List[str]:
    """tfidf.go:151-172."""
    if not text:
        return []
    return [t for t in _SPLIT_RE.split(text.lower()) if len(t.strip()) >= 3]


class Corpus:
    """tfidf.go:31-88."""

    def __init__(self, documents: List[str]):
        self.documents = documents
        self.term_frequencies: List[Dict[str, float]] = []
        self.doc_frequencies: Dict[str, int] = {}
        self.total_documents = len(documents)
        for doc in documents:
            tokens = tokenize(doc)
            counts: Dict[str, int] = {}
            for t in tokens:
                counts[t] = counts.get(t, 0) + 1
            n = float(len(tokens)) or 1.0
            self.term_frequencies.append({t: c / n for t, c in counts.items()})
            for t in counts:
                self.doc_frequencies[t] = self.doc_frequencies.get(t, 0) + 1

    def score(self, query: str, doc_index: int) -> float:
        """tfidf.go:102-138."""
        if doc_index < 0 or doc_index >= len(self.documents):
            return 0.0
        q = tokenize(query)
        if not q:
            return 0.0
        tf_map = self.term_frequencies[doc_index]
        total = 0.0
        for term in q:
            tf = tf_map.get(term, 0.0)
            if tf == 0:
                continue
            df = self.doc_frequencies.get(term, 0)
            if df == 0:
                continue
            total += tf * math.log(self.total_documents / df)
        return total
