"""Hierarchical text chunking — faithful port of the reference algorithm.

Reference: internal/chunk/chunk.go. Sizes are measured in BYTES (Go ``len``
on a string is its byte length), so all size checks here use UTF-8 byte
lengths; for ASCII text this equals character counts.

Wave algorithm (chunk.go:52-120): chunks that fit are appended to the final
list during the wave in which they first fit, which can emit chunks out of
document order for mixed-size inputs — replicated exactly, since downstream
selection indexes chunks by this order.

Pure functions, no state; called row-locally inside map_batches.
"""

from __future__ import annotations

from typing import List

# ordered largest semantic unit -> smallest (chunk.go:35-42)
_STRATEGIES = (
    ("paragraph", "\n\n"),
    ("sentence", ". "),
    ("sentence-question", "? "),
    ("sentence-exclamation", "! "),
    ("line", "\n"),
    ("word", " "),
)

_RESTORE = {
    "sentence": ".",
    "sentence-question": "?",
    "sentence-exclamation": "!",
    "line": "\n",
    "paragraph": "\n\n",
}


def _blen(s: str) -> int:
    """Byte length (Go len). Fast path for ASCII."""
    if s.isascii():
        return len(s)
    return len(s.encode("utf-8"))


def trim_spaces_only(s: str) -> str:
    """Strip leading/trailing spaces and tabs, preserving newlines
    (chunk.go:346-365; duplicate extract.go:151-170)."""
    return s.strip(" \t")


def calculate_minimum_chunk_size(max_chunk_size: int) -> int:
    """max(3, 25% of maxChunkSize) (chunk.go:244-251)."""
    return max(3, int(max_chunk_size * 0.25))


def split_text(text: str, max_chunk_size: int) -> List[str]:
    """Iterative wave-based splitting (chunk.go:52-120)."""
    if max_chunk_size <= 0:
        return []
    if text.strip() == "":
        return []
    text = trim_spaces_only(text)
    if _blen(text) <= max_chunk_size:
        return [text]

    final_chunks: List[str] = []
    to_process: List[str] = [text]

    for name, delim in _STRATEGIES:
        if not to_process:
            break
        next_queue: List[str] = []
        for chunk in to_process:
            if _blen(chunk) <= max_chunk_size:
                final_chunks.append(chunk)
                continue
            for sub in _split_by_delimiter(chunk, delim, name, max_chunk_size):
                sub_t = trim_spaces_only(sub)
                if sub_t != "":
                    next_queue.append(sub_t)
        to_process = next_queue

    for chunk in to_process:
        t = trim_spaces_only(chunk)
        if t != "":
            final_chunks.append(t)
    return final_chunks


def _split_by_delimiter(text: str, delimiter: str, strategy: str,
                        max_chunk_size: int) -> List[str]:
    """Split on delimiter, restore it to all-but-last part, then pack
    (chunk.go:123-223)."""
    if delimiter not in text:
        return [text]
    parts = text.split(delimiter)
    restore = _RESTORE.get(strategy)
    segments: List[str] = []
    last = len(parts) - 1
    for i, part in enumerate(parts):
        trimmed = trim_spaces_only(part)
        if trimmed == "":
            continue
        if restore is not None and i < last:
            segments.append(trimmed + restore)
        else:
            segments.append(trimmed)

    min_chunk_size = calculate_minimum_chunk_size(max_chunk_size)
    if strategy == "word":
        return _pack_words(segments, max_chunk_size)
    return _merge_short_segments(segments, max_chunk_size, min_chunk_size)


def _pack_words(segments: List[str], max_chunk_size: int) -> List[str]:
    """Greedy word packing up to the byte cap (chunk.go:254-287)."""
    result: List[str] = []
    cur: List[str] = []
    cur_len = 0
    for seg in segments:
        need = _blen(seg) + (1 if cur_len > 0 else 0)
        if cur_len > 0 and cur_len + need > max_chunk_size:
            chunk = trim_spaces_only(" ".join(cur))
            if chunk != "":
                result.append(chunk)
            cur, cur_len = [], 0
            need = _blen(seg)
        cur.append(seg)
        cur_len += need
    if cur:
        chunk = trim_spaces_only(" ".join(cur))
        if chunk != "":
            result.append(chunk)
    return result


def _merge_short_segments(segments: List[str], max_chunk_size: int,
                          min_chunk_size: int) -> List[str]:
    """Merge sub-minimum segments forward then backward (chunk.go:291-342).
    Mutates a working copy exactly like the reference mutates its slice."""
    if len(segments) <= 1:
        return segments
    segs = list(segments)
    result: List[str] = []
    i = 0
    while i < len(segs):
        cur = segs[i]
        if _blen(cur) >= min_chunk_size:
            result.append(cur)
            i += 1
            continue
        if i + 1 < len(segs):
            combined = cur + " " + segs[i + 1]
            if _blen(combined) <= max_chunk_size:
                segs[i + 1] = combined
                i += 1
                continue
        if result:
            combined = result[-1] + " " + cur
            if _blen(combined) <= max_chunk_size:
                result[-1] = combined
                i += 1
                continue
        result.append(cur)
        i += 1
    return result
