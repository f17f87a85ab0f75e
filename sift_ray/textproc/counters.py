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

# Env var naming a tiktoken-format vocabulary file (one `base64(bytes) rank`
# pair per line, e.g. cl100k_base.tiktoken). When present, TokenCounter
# counts/truncates with REAL byte-pair encoding over that vocabulary —
# closing the one reference-parity divergence (token_counter.go:18-79 uses
# tiktoken cl100k_base) wherever a vocab file exists. Absent (this offline
# sandbox), the documented deterministic fallback below applies.
VOCAB_ENV = "SIFT_RAY_CL100K_VOCAB"


def _load_ranks(path: str) -> dict:
    """Parse a tiktoken-format vocab file into {bytes: rank}."""
    import base64

    ranks: dict = {}
    with open(path, "rb") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            token_b64, _, rank_s = line.partition(b" ")
            ranks[base64.b64decode(token_b64)] = int(rank_s)
    return ranks


class BPEncoder:
    """Byte-pair encoder over a {bytes: rank} table (the published BPE
    inference algorithm: greedily merge the adjacent pair with the lowest
    merge rank until none remains). Pre-tokenization uses the public
    cl100k regex; special tokens are not handled (the reference counts
    plain document text, token_counter.go:40-53)."""

    def __init__(self, ranks: dict):
        self.ranks = ranks
        self.decoder = {rank: tok for tok, rank in ranks.items()}

    def _merge_ranks(self, piece: bytes) -> List[int]:
        ranks = self.ranks
        whole = ranks.get(piece)
        if whole is not None:
            return [whole]
        # parts[i] = start offset of part i; sentinel at len(piece)
        parts = list(range(len(piece) + 1))
        while len(parts) > 2:
            best_rank = None
            best_i = -1
            for i in range(len(parts) - 2):
                r = ranks.get(piece[parts[i]:parts[i + 2]])
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best_i = i
            if best_rank is None:
                break
            del parts[best_i + 1]
        out = []
        for i in range(len(parts) - 1):
            sub = piece[parts[i]:parts[i + 1]]
            r = ranks.get(sub)
            if r is None:  # byte absent from the vocab: unencodable
                raise KeyError(sub)
            out.append(r)
        return out

    def encode(self, text: str) -> List[int]:
        out: List[int] = []
        for m in _CL100K_PAT.finditer(text):
            out.extend(self._merge_ranks(m.group().encode("utf-8")))
        return out

    def count(self, text: str) -> int:
        n = 0
        for m in _CL100K_PAT.finditer(text):
            n += len(self._merge_ranks(m.group().encode("utf-8")))
        return n

    def decode(self, tokens: List[int]) -> str:
        data = b"".join(self.decoder[t] for t in tokens)
        # tiktoken decodes with errors="replace": a truncation that lands
        # mid-codepoint yields U+FFFD, same as the reference's behavior
        return data.decode("utf-8", errors="replace")


_REAL_BPE = None
_REAL_BPE_PATH = None


def _real_bpe():
    """Load (and cache per process) the real-vocab encoder if configured."""
    global _REAL_BPE, _REAL_BPE_PATH
    import os

    path = os.environ.get(VOCAB_ENV, "")
    if not path:
        return None
    if _REAL_BPE is None or _REAL_BPE_PATH != path:
        _REAL_BPE = BPEncoder(_load_ranks(path))
        _REAL_BPE_PATH = path
    return _REAL_BPE


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
    """cl100k_base token counting (token_counter.go:18-79).

    With a vocabulary file configured (``SIFT_RAY_CL100K_VOCAB``), all
    counting and truncation runs the real byte-pair encoding over it —
    byte-parity with the reference's tiktoken calls. Otherwise this is the
    deterministic offline stand-in: encode() -> list of string pieces;
    decode() -> exact concatenation, so slicing the token list and
    decoding yields a true prefix of the text.
    """

    name = "tokens (cl100k_base)"

    def __init__(self):
        self._bpe = _real_bpe()

    def encode(self, text: str) -> List[str]:
        """OFFLINE-FALLBACK representation only: string pieces whose
        concatenation is exactly ``text``. This is deliberately NOT
        routed through the real-vocab BPE (its tokens are byte slices
        that can split UTF-8 codepoints, so per-token ``str`` pieces
        could not concatenate back losslessly) — therefore in real-vocab
        mode ``len(encode(text)) != count(text)``. Callers needing
        vocab-consistent numbers must use ``count()`` /
        ``create_partial_text()``, which do honor ``SIFT_RAY_CL100K_VOCAB``;
        integer token ids are available via ``_real_bpe().encode``."""
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
        if self._bpe is not None:
            return self._bpe.count(text)
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
        if self._bpe is not None:
            ids = self._bpe.encode(text)
            if len(ids) <= max_tokens:
                return text
            return self._bpe.decode(ids[:max_tokens])
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
