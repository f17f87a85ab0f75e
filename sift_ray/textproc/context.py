"""Smart context calculation for search results.

Faithful port of internal/app/context_calculator.go: detect the markdown
field type of a target chunk, pick a before/after budget split, and walk
outward collecting chunks (partial last chunk allowed) until each side's
unit budget is spent.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

from . import patterns
from .selection import Chunk, create_partial_chunk


@dataclass(frozen=True)
class ContextStrategy:
    """(context_calculator.go:13-17)."""
    before_ratio: float
    after_ratio: float
    name: str


@dataclass(frozen=True)
class ChunkFieldType:
    """(context_calculator.go:153-156). primary is a field tag string
    ("h1".."h6", "bold", "italic", "code", "body")."""
    primary: str
    is_list: bool = False


@dataclass
class ContextResult:
    """(context_calculator.go:43-48)."""
    selected_chunks: List[Chunk] = field(default_factory=list)
    total_units: int = 0
    strategy: ContextStrategy = ContextStrategy(0.5, 0.5, "balanced")
    field_type: ChunkFieldType = ChunkFieldType("body")


_STRATEGY_LIST = ContextStrategy(0.8, 0.2, "list-preceding")
_STRATEGY_HEADER = ContextStrategy(0.2, 0.8, "header-following")
_STRATEGY_CODE = ContextStrategy(0.3, 0.7, "code-following")
_STRATEGY_BOLD = ContextStrategy(0.65, 0.35, "emphasis-preceding")
_STRATEGY_BALANCED = ContextStrategy(0.5, 0.5, "balanced")


def detect_primary_field_type(chunk: str) -> ChunkFieldType:
    """(context_calculator.go:159-230)."""
    trimmed = chunk.strip()
    if trimmed == "":
        return ChunkFieldType("body")
    if patterns.HEADER_RE.search(trimmed):
        level = 0
        for ch in trimmed:
            if ch == "#":
                level += 1
            else:
                break
        if 1 <= level <= 6:
            return ChunkFieldType("h%d" % level)
        return ChunkFieldType("h4")  # fallback for excessive #'s
    if patterns.BULLET_LIST_RE.search(trimmed):
        return ChunkFieldType("body", is_list=True)
    if patterns.NUMBER_LIST_RE.search(trimmed):
        return ChunkFieldType("body", is_list=True)
    if patterns.CODE_BLOCK_RE.search(chunk):
        return ChunkFieldType("code")
    if patterns.INLINE_CODE_RE.search(chunk):
        return ChunkFieldType("code")
    if patterns.BOLD_RE.search(chunk):
        return ChunkFieldType("bold")
    if patterns.ITALIC_RE.search(chunk):
        return ChunkFieldType("italic")
    return ChunkFieldType("body")


def get_context_strategy(field_type: ChunkFieldType) -> ContextStrategy:
    """(context_calculator.go:233-278)."""
    if field_type.is_list:
        return _STRATEGY_LIST
    p = field_type.primary
    if p in ("h1", "h2", "h3", "h4", "h5", "h6"):
        return _STRATEGY_HEADER
    if p == "code":
        return _STRATEGY_CODE
    if p == "bold":
        return _STRATEGY_BOLD
    return _STRATEGY_BALANCED


class ContextCalculator:
    """(context_calculator.go:19-34). Counter + budget are per-worker state."""

    def __init__(self, counter, max_context_units: int):
        self.counter = counter
        self.max_context_units = max_context_units

    def calculate_smart_context(self, target: Chunk,
                                all_chunks: List[str]) -> ContextResult:
        return self.calculate_smart_context_with_budget(
            target, all_chunks, self.max_context_units)

    def calculate_smart_context_with_budget(self, target: Chunk,
                                            all_chunks: List[str],
                                            budget_units: int) -> ContextResult:
        """(context_calculator.go:59-150)."""
        field_type = detect_primary_field_type(target.text)
        strategy = get_context_strategy(field_type)
        target_units = self.counter.count(target.text)

        available = budget_units - target_units
        if available <= 0:
            if target_units > budget_units:
                truncated = self._create_partial_chunk(target.text, budget_units)
                tchunk = Chunk(text=truncated, index=target.index, score=target.score)
                return ContextResult([tchunk], self.counter.count(truncated),
                                     strategy, field_type)
            return ContextResult([target], target_units, strategy, field_type)

        before_budget = int(available * strategy.before_ratio)
        after_budget = available - before_budget

        selected = [target]
        total_units = target_units
        if before_budget > 0:
            before_chunks, units = self._collect_context_chunks(
                all_chunks, target.index - 1, -1, before_budget)
            selected.extend(before_chunks)
            total_units += units
        if after_budget > 0:
            after_chunks, units = self._collect_context_chunks(
                all_chunks, target.index + 1, 1, after_budget)
            selected.extend(after_chunks)
            total_units += units
        return ContextResult(selected, total_units, strategy, field_type)

    def _collect_context_chunks(self, all_chunks: List[str], start_index: int,
                                direction: int, budget: int):
        """Walk outward until the budget is spent; partial last chunk
        (context_calculator.go:281-324)."""
        out: List[Chunk] = []
        total_units = 0
        i = start_index
        while 0 <= i < len(all_chunks):
            if budget <= 0:
                break
            chunk = all_chunks[i]
            units = self.counter.count(chunk)
            if total_units + units <= budget:
                out.append(Chunk(text=chunk, index=i))
                total_units += units
                budget -= units
            elif budget > 0:
                partial = self._create_partial_chunk(chunk, budget)
                if partial != "":
                    out.append(Chunk(text=partial, index=i))
                    total_units += self.counter.count(partial)
                break
            i += direction
        if direction < 0:
            out.reverse()
        return out, total_units

    def _create_partial_chunk(self, chunk_text: str, remaining_units: int) -> str:
        # calculator copy adds a word-boundary scan in the fallback branch
        # (context_calculator.go:376-383)
        return create_partial_chunk(chunk_text, remaining_units, self.counter,
                                    fallback_word_boundary=True)
