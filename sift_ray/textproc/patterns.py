"""Shared compiled regexes for markdown field detection.

Reference: internal/app/regex_patterns.go:29-35. Compiled once at import
(per worker process), mirroring the reference's sync.Once singleton.
"""

from __future__ import annotations

import re

HEADER_RE = re.compile(r"^\s*#{1,6}\s+")
BULLET_LIST_RE = re.compile(r"^\s*[-*+]\s+")
NUMBER_LIST_RE = re.compile(r"^\s*\d+\.\s+")
# NB: Go RE2 '$' matches only at end-of-text; Python '$' also matches before a
# trailing newline, so \Z is used for parity.
CODE_BLOCK_RE = re.compile(r"^```|```\Z")
INLINE_CODE_RE = re.compile(r"`[^`]+`")
BOLD_RE = re.compile(r"\*\*[^*\s][^*]*[^*\s]\*\*|\*\*[^*\s]\*\*")
ITALIC_RE = re.compile(
    r"(?:^|[^*])\*[^*\s][^*]*[^*\s]\*(?:[^*]|\Z)|(?:^|[^*])\*[^*\s]\*(?:[^*]|\Z)"
)
