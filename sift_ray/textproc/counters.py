"""Text-unit counters: tokens / words / characters.

Reference: internal/counter/ (counter.go:58-69 factory, word_counter.go:18-29,
char_counter.go:18-28, token_counter.go:18-79).

Parity notes
------------
* Words: Go ``strings.Fields`` splits on Unicode whitespace; Python
  ``str.split()`` matches.
* Characters: Go ``utf8.RuneCountInString`` counts runes; Python ``len(str)``
  counts code points — identical for valid UTF-8.
* Tokens: the reference uses tiktoken cl100k_base (token_counter.go:21). The
  cl100k vocabulary is NOT available in this offline environment, so the token
  counter is a **documented deterministic fallback**: text is pre-tokenized
  with a cl100k-style regex and each pre-token is split into <=4-char pieces.
  Encode/decode round-trips exactly, so ``create_partial_text`` returns a
  prefix with exactly ``max_tokens`` tokens (token_counter.go:55-79 contract).
  The counter keeps the reference's name string ``"tokens (cl100k_base)"``
  because chunk sizing switches on it (internal/app/chunk_selection.go:121).
  Absolute token counts differ from real cl100k; all goldens in this repo are
  internally consistent with this fallback.

Counters hold compiled state and are built once per actor (``__init__``), not
per batch.
"""

from __future__ import annotations

from typing import List

import regex as _regex

# cl100k_base pre-tokenizer pattern (public, from the tiktoken repo).
_CL100K_PAT = _regex.compile(
    r"""'(?i:[sdmt]|ll|ve|re)|[^\r\n\p{L}\p{N}]?+\p{L}+|\p{N}{1,3}"""
    r"""| ?[^\s\p{L}\p{N}]++[\r\n]*|\s*[\r\n]|\s+(?!\S)|\s+""",
)

_PIECE = 4  # deterministic fallback: <=4 chars per token piece


class WordCounter:
    """Whitespace-split word counting (word_counter.go:18-29)."""

    name = "words"

    def count(self, text: str) -> int:
        if not text:
            return 0
        return len(text.split())


class CharCounter:
    """Unicode code-point counting (char_counter.go:18-28)."""

    name = "characters"

    def count(self, text: str) -> int:
        return len(text)


class TokenCounter:
    """Deterministic offline stand-in for tiktoken cl100k_base.

    encode() -> list of string pieces; decode() -> exact concatenation, so
    slicing the token list and decoding yields a true prefix of the text.
    """

    name = "tokens (cl100k_base)"

    def encode(self, text: str) -> List[str]:
        if not text:
            return []
        out: List[str] = []
        for m in _CL100K_PAT.finditer(text):
            piece = m.group()
            if len(piece) <= _PIECE:
                out.append(piece)
            else:
                out.extend(piece[i:i + _PIECE] for i in range(0, len(piece), _PIECE))
        return out

    @staticmethod
    def decode(tokens: List[str]) -> str:
        return "".join(tokens)

    def count(self, text: str) -> int:
        if not text:
            return 0
        # fast path: count without materializing the piece list
        n = 0
        for m in _CL100K_PAT.finditer(text):
            ln = m.end() - m.start()
            n += 1 if ln <= _PIECE else (ln + _PIECE - 1) // _PIECE
        return n

    def create_partial_text(self, text: str, max_tokens: int) -> str:
        """Exact-token truncation (token_counter.go:55-79)."""
        if max_tokens <= 0 or not text:
            return ""
        tokens = self.encode(text)
        if len(tokens) <= max_tokens:
            return text
        return self.decode(tokens[:max_tokens])


def new_counter(method: str):
    """Counter factory (counter.go:58-69). Unknown methods fall back to tokens."""
    if method == "words":
        return WordCounter()
    if method == "characters":
        return CharCounter()
    return TokenCounter()
