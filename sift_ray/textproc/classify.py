"""Extraneous-chunk classifier: stopword-ratio with position thresholding.

Reference: internal/classify/classify.go. The stopword set is the reference's
60-entry stemmed list verbatim (classify.go:20-71); tokens are matched with an
ASCII-word-boundary regex because Go's RE2 ``\\b`` is ASCII-defined
(classify.go:83) while Python's default is Unicode-aware.

The classifier is stateful (compiled regex); build once per actor.
"""

from __future__ import annotations

import re

from .stemmer import stem

# stemmed stopwords (classify.go:20-71)
EXTRANEOUS_STOPWORDS = frozenset((
    # publishing & document structure
    "author", "appendix", "book", "chapter", "content", "edit", "ebook",
    "footer", "glossari", "gutenberg", "navig", "note", "page", "project",
    "publish", "text",
    # navigation & interaction
    "about", "locat", "profil", "share", "updat",
    # legal & footer text
    "copyright", "manag", "permiss", "polici", "privaci", "public", "purpos",
    "reproduc", "reserv", "right", "risk", "standard", "term", "use",
    # academic & technical references
    "citat", "depart", "edu", "feder", "foundat", "https", "isbn", "refer",
))

_TOKEN_RE = re.compile(r"\b[a-zA-Z]+\b", re.ASCII)


class Classifier:
    """Stopword-ratio boilerplate classifier (classify.go:75-133)."""

    def __init__(self) -> None:
        self._token_re = _TOKEN_RE
        self._stem_cache: dict[str, str] = {}

    def is_extraneous(self, chunk_text: str, chunk_index: int,
                      total_chunks: int) -> bool:
        if total_chunks <= 0 or chunk_index < 0 or chunk_index >= total_chunks:
            return False
        tokens = self._token_re.findall(chunk_text.lower())
        if not tokens:
            return True  # empty chunks are extraneous
        cache = self._stem_cache
        stopword_count = 0
        for token in tokens:
            stemmed = cache.get(token)
            if stemmed is None:
                stemmed = stem(token)
                if len(cache) < 65536:
                    cache[token] = stemmed
            if stemmed in EXTRANEOUS_STOPWORDS:
                stopword_count += 1
        ratio = stopword_count / len(tokens)
        return ratio > self.calculate_threshold(chunk_index, total_chunks)

    @staticmethod
    def calculate_threshold(chunk_index: int, total_chunks: int) -> float:
        """Inverted-V position curve, 0.10 at edges to 0.33 mid-document
        (classify.go:139-166)."""
        if total_chunks <= 0:
            return 0.33
        if chunk_index < 0 or chunk_index >= total_chunks:
            return 0.33
        if total_chunks <= 3:
            return 0.5
        rel = chunk_index / (total_chunks - 1)
        position_factor = 1.0 - abs(2.0 * rel - 1.0)
        return 0.1 + (0.33 - 0.1) * position_factor
