"""Chunk selection, sizing strategies, and output formatting.

Faithful port of the reference's consolidated selection logic:
internal/app/chunk_selection.go (ChunkSelector, strategies, formatting,
partial chunks) and internal/app/sift.go:305-372 (applySimpleSizeLimit).

Size arithmetic notes (Go parity):
* ``len(str)`` in Go is the BYTE length; all "length > 40" style checks and
  character-mode partial cuts here use UTF-8 byte semantics (`_blen`).
* ``strings.Fields`` == ``str.split()`` (Unicode whitespace, no empties).
* Character-mode partial cuts index BYTES; a hard cut that would split a
  UTF-8 sequence drops the partial rune (decode errors="ignore") — the one
  documented divergence (Go would emit the raw partial bytes, which cannot be
  represented in an Arrow utf8 column).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import re

from ..config import BEGINNING, END, MIDDLE
from .chunker import split_text
from .counters import TokenCounter, new_counter

_SIMPLE_TOKEN_RE = re.compile(r"[ \t\n\r]*[^ \t\n\r]+")

# chunk sizing configuration (chunk_selection.go:31-41)
BASE_TOKEN_SIZE = 200
BASE_WORD_SIZE = 150
BASE_CHAR_SIZE = 700
TOKEN_TEXT_THRESHOLD = 2500
WORD_TEXT_THRESHOLD = 1800
CHAR_TEXT_THRESHOLD = 9500
LARGE_TEXT_MULTIPLIER = 1.5


def _blen(s: str) -> int:
    if s.isascii():
        return len(s)
    return len(s.encode("utf-8"))


@dataclass
class Chunk:
    """ChunkWithIndex (chunk_selection.go:70-74)."""
    text: str
    index: int
    score: float = 0.0


def create_partial_chunk(chunk_text: str, remaining_units: int, counter,
                         fallback_word_boundary: bool = False) -> str:
    """Partial chunk up to a unit limit. Two near-identical reference copies
    exist (chunk_selection.go:315-370 and context_calculator.go:327-388);
    they differ only in the unknown-method fallback, where the calculator
    copy scans back to a word boundary (context_calculator.go:376-383) —
    parameterized here via ``fallback_word_boundary``."""
    if remaining_units <= 0:
        return ""

    name = counter.name
    if name == "words":
        words = chunk_text.split()
        if words:
            return " ".join(words[:min(remaining_units, len(words))])
        return ""

    if name == "tokens (cl100k_base)" and isinstance(counter, TokenCounter):
        return counter.create_partial_text(chunk_text, remaining_units)

    if name == "characters":
        data = chunk_text.encode("utf-8")
        if len(data) <= remaining_units:
            return chunk_text
        cutoff = remaining_units
        while 0 < cutoff < len(data) and data[cutoff - 1] != 0x20:
            cutoff -= 1
        if cutoff > 0:
            return data[:cutoff].decode("utf-8", errors="ignore").strip()
        return data[:remaining_units].decode("utf-8", errors="ignore")

    # unknown counting method: ratio-based approximation
    chunk_units = counter.count(chunk_text)
    if chunk_units > 0 and remaining_units > 0:
        ratio = remaining_units / chunk_units
        if 0 < ratio < 1:
            data = chunk_text.encode("utf-8")
            cutoff = int(len(data) * ratio)
            if 0 < cutoff < len(data):
                if not fallback_word_boundary:
                    return data[:cutoff].decode("utf-8", errors="ignore")
                while cutoff > 0 and data[cutoff - 1] != 0x20:
                    cutoff -= 1
                if cutoff > 0:
                    return data[:cutoff].decode("utf-8", errors="ignore").strip()
    return ""


_SIZE_LIMIT_COUNT_CACHE: dict = {}  # {counting_method: {token: units}}


def apply_simple_size_limit(content: str, max_units: int, counting_method: str) -> str:
    """Truncate content to a unit budget, preserving formatting
    (applySimpleSizeLimit, sift.go:305-372). Tokenizes into units of
    [leading-whitespace + word] and accumulates until the budget is hit."""
    if max_units <= 0:
        return content
    counter = new_counter(counting_method)

    # tokens are [whitespace-run][word-run] units; a trailing whitespace-only
    # run is its own token (same partition the reference's char loop builds,
    # sift.go:318-340). Tokenization is fused with accumulation so a long
    # document stops scanning the moment the budget is hit — the default
    # 2500-token path never walks the tail of a 50k-token page.
    out: List[str] = []
    current = 0
    # token text repeats heavily ACROSS documents (corpus vocabulary), and
    # count() is pure — cache per method at module scope (per actor),
    # bounded like the dedup word-hash cache
    cache = _SIZE_LIMIT_COUNT_CACHE.setdefault(counting_method, {})
    if len(cache) > 1_000_000:
        cache.clear()
    cget = cache.get
    count = counter.count
    end = 0
    hit_budget = False
    # chunked vectorized accumulation: the original per-token loop
    # (lookup -> branch -> append) costs ~0.35 us/token in pure Python;
    # cumulative sums via itertools.accumulate + one bisect per chunk keep
    # the early exit (a 50k-token page still stops at the budget) while
    # running the hot path at C speed. Acceptance rule unchanged: accept
    # token i iff running total <= max_units; stop at the first total
    # >= max_units (accepting it exactly at ==).
    from bisect import bisect_left
    from itertools import accumulate
    # findall is safe because matches tile the string contiguously from
    # offset 0 (ws* then word+; only a TRAILING pure-whitespace run is
    # unmatched), so the end offset of accepted text is the sum of
    # accepted token lengths
    all_toks = _SIMPLE_TOKEN_RE.findall(content)
    for i0 in range(0, len(all_toks), 4096):
        toks = all_toks[i0:i0 + 4096]
        units = list(map(cget, toks))
        for i, u in enumerate(units):
            if u is None:
                u = count(toks[i])
                cache[toks[i]] = u
                units[i] = u
        totals = list(accumulate(units, initial=current))[1:]
        idx = bisect_left(totals, max_units)
        if idx < len(toks):
            hit_budget = True
            if totals[idx] == max_units:  # accept the boundary token
                idx += 1
            out.extend(toks[:idx])
            if idx:
                current = totals[idx - 1]
            end += sum(map(len, toks[:idx]))
            break
        out.extend(toks)
        current = totals[-1]
        end += sum(map(len, toks))
    if not hit_budget and end < len(content):
        # trailing remainder (whitespace-only run): same budget rule
        token = content[end:]
        units = count(token)
        if current + units <= max_units:
            out.append(token)
    return "".join(out).rstrip(" \t\n\r")


class ChunkSelector:
    """Unit-aware chunk selection with configurable strategies
    (chunk_selection.go:77-719)."""

    def __init__(self, counting_method: str, max_units: int, strategy: str):
        self.counter = new_counter(counting_method)
        self.max_units = max_units
        self.strategy = strategy
        self.default_context_before = 0
        self.default_context_after = 0
        self.is_search_mode = False
        self._context_calculator: Optional["ContextCalculator"] = None

    # --- chunk preparation -------------------------------------------------

    def prepare_chunks(self, text: str) -> List[str]:
        """Unit-aware chunking (chunk_selection.go:107-114)."""
        return split_text(text, self.calculate_chunk_size(text))

    def calculate_chunk_size(self, text: str) -> int:
        """Base size by counting method, x1.5 past a byte-length threshold
        (chunk_selection.go:117-143)."""
        text_len = _blen(text)
        name = self.counter.name
        if name == "tokens (cl100k_base)":
            base, threshold = BASE_TOKEN_SIZE, TOKEN_TEXT_THRESHOLD
        elif name == "words":
            base, threshold = BASE_WORD_SIZE, WORD_TEXT_THRESHOLD
        else:
            base, threshold = BASE_CHAR_SIZE, CHAR_TEXT_THRESHOLD
        if text_len > threshold:
            return int(base * LARGE_TEXT_MULTIPLIER)
        return base

    # --- ordering ---------------------------------------------------------

    def prepare_for_search(self, scored: List[tuple]) -> List[Chunk]:
        """(chunk, score, index) tuples -> Chunk list; enables search mode
        (chunk_selection.go:374-393)."""
        if not scored:
            return []
        self.is_search_mode = True
        return [Chunk(text=c, index=i, score=s) for (c, s, i) in scored]

    def prepare_for_strategy(self, chunks: List[str]) -> List[Chunk]:
        """Strategy-ordered chunks (chunk_selection.go:397-417)."""
        if not chunks:
            return []
        with_index = [Chunk(text=c, index=i) for i, c in enumerate(chunks)]
        if self.strategy == END:
            return list(reversed(with_index))
        if self.strategy == MIDDLE:
            return self._middle_out(with_index)
        return with_index  # BEGINNING and default

    @staticmethod
    def _middle_out(chunks: List[Chunk]) -> List[Chunk]:
        """Middle-out alternating right-then-left (chunk_selection.go:445-474);
        e.g. 5 chunks -> order [2,3,1,4,0]."""
        if len(chunks) <= 1:
            return chunks
        middle = len(chunks) // 2
        result = [chunks[middle]]
        left, right = middle - 1, middle + 1
        while len(result) < len(chunks):
            if right < len(chunks):
                result.append(chunks[right])
                right += 1
            if left >= 0:
                result.append(chunks[left])
                left -= 1
        return result

    # --- formatting --------------------------------------------------------

    def format_selected_chunks(self, selected: List[Chunk]) -> str:
        """Restore document order, drop overlap, insert separators
        (formatSelectedChunks, chunk_selection.go:161-199)."""
        if not selected:
            return ""
        selected = sorted(selected, key=lambda c: c.index)
        parts: List[str] = []
        for i, chunk in enumerate(selected):
            text = chunk.text
            if i > 0:
                text = self._remove_overlap_prefix(text, selected[i - 1].text)
            if i > 0 and text.strip() != "":
                if self.is_search_mode and selected[i].index != selected[i - 1].index + 1:
                    parts.append("\n\n---\n\n")
                else:
                    parts.append(self._determine_separator(selected[i - 1].text, text))
            if text.strip() != "":
                parts.append(text)
        return "".join(parts)

    @staticmethod
    def _determine_separator(prev_chunk: str, current_chunk: str) -> str:
        """(chunk_selection.go:203-230)."""
        if prev_chunk == "":
            return ""
        prev_trimmed = prev_chunk.strip()
        if prev_trimmed == "":
            return "\n\n"
        if prev_chunk.endswith("\n\n"):
            return "\n\n"
        if prev_chunk.endswith("\n"):
            return "\n"
        if prev_trimmed.endswith((".", "!", "?")) and _blen(prev_trimmed) > 40:
            return "\n\n"
        return "\n"

    @staticmethod
    def _remove_overlap_prefix(current_chunk: str, previous_chunk: str) -> str:
        """Longest <=15-word suffix/prefix overlap removal
        (chunk_selection.go:234-267)."""
        cur_words = current_chunk.split()
        prev_words = previous_chunk.split()
        if not cur_words or not prev_words:
            return current_chunk
        max_check = min(len(cur_words), len(prev_words), 15)
        for i in range(max_check, 0, -1):
            if prev_words[-i:] == cur_words[:i]:
                if i < len(cur_words):
                    return " ".join(cur_words[i:])
                return ""
        return current_chunk

    # --- context helpers ----------------------------------------------------

    def _context_candidates(self, target_index: int, all_chunks: List[str],
                            context_before: int, context_after: int,
                            added: dict) -> List[Chunk]:
        """Target chunk plus fixed-count neighbors (chunk_selection.go:283-306)."""
        out: List[Chunk] = []
        for i in range(target_index - context_before, target_index):
            if i >= 0 and not added.get(i):
                out.append(Chunk(text=all_chunks[i], index=i))
        if not added.get(target_index):
            out.append(Chunk(text=all_chunks[target_index], index=target_index))
        for i in range(target_index + 1, target_index + context_after + 1):
            if i < len(all_chunks) and not added.get(i):
                out.append(Chunk(text=all_chunks[i], index=i))
        return out

    def create_partial_chunk(self, chunk_text: str, remaining_units: int) -> str:
        return create_partial_chunk(chunk_text, remaining_units, self.counter,
                                    fallback_word_boundary=False)

    # --- selection ----------------------------------------------------------

    def select(self, ordered: List[Chunk], all_chunks: List[str],
               context_before: int, context_after: int) -> str:
        return self.select_with_context_config(
            ordered, all_chunks, context_before, context_after, 0, False)

    def select_with_context_config(self, ordered: List[Chunk],
                                   all_chunks: List[str], context_before: int,
                                   context_after: int, context_units: int,
                                   use_smart_context: bool) -> str:
        """(chunk_selection.go:504-519)."""
        if not ordered:
            return ""
        if use_smart_context and context_units > 0 and self.is_search_mode:
            return self._select_with_smart_context(ordered, all_chunks, context_units)
        return self._select_with_fixed_context(ordered, all_chunks,
                                               context_before, context_after)

    def _select_with_smart_context(self, ordered: List[Chunk],
                                   all_chunks: List[str],
                                   context_units: int) -> str:
        """(chunk_selection.go:522-586)."""
        from .context import ContextCalculator
        if (self._context_calculator is None
                or self._context_calculator.max_context_units != context_units):
            self._context_calculator = ContextCalculator(self.counter, context_units)
        calc = self._context_calculator

        selected: List[Chunk] = []
        added: dict = {}
        current_units = 0
        for oc in ordered:
            if added.get(oc.index):
                continue
            remaining_budget = context_units - current_units
            if remaining_budget <= 0:
                break
            result = calc.calculate_smart_context_with_budget(oc, all_chunks,
                                                              remaining_budget)
            for chunk in result.selected_chunks:
                if added.get(chunk.index):
                    continue
                units = self.counter.count(chunk.text)
                if current_units + units <= context_units:
                    selected.append(chunk)
                    added[chunk.index] = True
                    current_units += units
                else:
                    remaining = context_units - current_units
                    if remaining > 0:
                        partial = self.create_partial_chunk(chunk.text, remaining)
                        if partial != "":
                            selected.append(Chunk(text=partial, index=chunk.index))
                            current_units = context_units
                    break
            if current_units >= context_units:
                break
        return self.format_selected_chunks(selected)

    def _select_with_fixed_context(self, ordered: List[Chunk],
                                   all_chunks: List[str], context_before: int,
                                   context_after: int) -> str:
        """(chunk_selection.go:589-714)."""
        if self.max_units <= 0:
            if self.is_search_mode:
                # no-limit search: score threshold + top-N cap + fallback
                min_score_threshold = 0.01
                score_filtered = [c for c in ordered if c.score > min_score_threshold]
                max_relevant = len(score_filtered) // 2
                if max_relevant == 0 and score_filtered:
                    max_relevant = 1
                if max_relevant > 5:
                    max_relevant = 5
                relevant = score_filtered
                if len(score_filtered) > max_relevant:
                    relevant = score_filtered[:max_relevant]
                if not relevant and ordered:
                    relevant = ordered[:min(2, len(ordered))]
                selected: List[Chunk] = []
                added: dict = {}
                for oc in relevant:
                    for cand in self._context_candidates(
                            oc.index, all_chunks, context_before, context_after, added):
                        if not added.get(cand.index):
                            selected.append(cand)
                            added[cand.index] = True
                return self.format_selected_chunks(selected)
            # non-search, no limit: all chunks with context
            selected = []
            added = {}
            for oc in ordered:
                for cand in self._context_candidates(
                        oc.index, all_chunks, context_before, context_after, added):
                    if not added.get(cand.index):
                        selected.append(cand)
                        added[cand.index] = True
            return self.format_selected_chunks(selected)

        # size-constrained accumulation
        selected = []
        added = {}
        current_units = 0
        for oc in ordered:
            if current_units >= self.max_units:
                break
            for cand in self._context_candidates(
                    oc.index, all_chunks, context_before, context_after, added):
                units = self.counter.count(cand.text)
                if current_units + units <= self.max_units:
                    selected.append(cand)
                    added[cand.index] = True
                    current_units += units
                elif current_units < self.max_units:  # allowPartialChunks() is always true
                    remaining = self.max_units - current_units
                    partial = self.create_partial_chunk(cand.text, remaining)
                    if partial != "":
                        selected.append(Chunk(text=partial, index=cand.index))
                        current_units = self.max_units
                    break
            if current_units >= self.max_units:
                break
        return self.format_selected_chunks(selected)

    def apply_size_constraints(self, chunks: List[str]) -> str:
        """(chunk_selection.go:146-158)."""
        ordered = self.prepare_for_strategy(chunks)
        return self.select(ordered, chunks, self.default_context_before,
                           self.default_context_after)
