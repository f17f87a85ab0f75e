"""Selection tests ported from internal/app/chunk_selection_test.go —
exact golden strings."""

import pytest

from sift_ray.config import BEGINNING, END, MIDDLE, SiftConfig
from sift_ray.textproc.document import apply_content_transformations
from sift_ray.textproc.selection import Chunk, ChunkSelector, apply_simple_size_limit

CHUNKS5 = ["chunk0", "chunk1", "chunk2", "chunk3", "chunk4"]
CHUNKS7 = ["A", "B", "C", "D", "E", "F", "G"]


# chunk_selection_test.go:507-560 — PrepareForStrategy orderings
@pytest.mark.parametrize("strategy,expected", [
    (BEGINNING, ["chunk0", "chunk1", "chunk2", "chunk3", "chunk4"]),
    (END, ["chunk4", "chunk3", "chunk2", "chunk1", "chunk0"]),
    (MIDDLE, ["chunk2", "chunk3", "chunk1", "chunk4", "chunk0"]),
])
def test_strategy_order(strategy, expected):
    cs = ChunkSelector("words", 100, strategy)
    ordered = cs.prepare_for_strategy(CHUNKS5)
    assert [c.text for c in ordered] == expected
    assert [c.index for c in ordered] == [CHUNKS5.index(t) for t in expected]


# chunk_selection_test.go:562-639 — output restored to document order
@pytest.mark.parametrize("strategy,max_words,expected", [
    (BEGINNING, 2, "chunk0\nchunk1"),
    (END, 2, "chunk3\nchunk4"),
    (MIDDLE, 2, "chunk2\nchunk3"),
])
def test_output_order_with_size_constraints(strategy, max_words, expected):
    cs = ChunkSelector("words", max_words, strategy)
    assert cs.apply_size_constraints(CHUNKS5) == expected


# chunk_selection_test.go:641-789 — context windows, exact outputs
@pytest.mark.parametrize("targets,before,after,max_words,expected", [
    ([3], 0, 0, 10, "D"),
    ([3], 2, 0, 10, "B\nC\nD"),
    ([3], 0, 2, 10, "D\nE\nF"),
    ([3], 1, 1, 10, "C\nD\nE"),
    ([0], 2, 1, 10, "A\nB"),
    ([6], 1, 2, 10, "F\nG"),
    ([2, 4], 1, 1, 10, "B\nC\nD\nE\nF"),
    ([3], 2, 2, 3, "B\nC\nD"),
    ([3], 5, 5, 10, "A\nB\nC\nD\nE\nF\nG"),
])
def test_select_with_context_windows(targets, before, after, max_words, expected):
    cs = ChunkSelector("words", max_words, BEGINNING)
    ordered = [Chunk(text=CHUNKS7[i], index=i) for i in targets]
    assert cs.select(ordered, CHUNKS7, before, after) == expected


def test_search_scored_selection_nonempty():
    # chunk_selection_test.go:454-505
    all_chunks = ["chunk0", "chunk1", "chunk2", "chunk3", "chunk4", "chunk5"]
    scored = [("chunk2", 0.9, 2), ("chunk4", 0.7, 4), ("chunk1", 0.5, 1),
              ("chunk0", 0.3, 0), ("chunk3", 0.2, 3), ("chunk5", 0.1, 5)]
    for max_units in (50, 200):
        cs = ChunkSelector("words", max_units, BEGINNING)
        ordered = cs.prepare_for_search(scored)
        result = cs.select(ordered, all_chunks, 1, 2)
        assert result != ""


def test_search_mode_gap_marker():
    # chunk_selection.go:185-187 — non-consecutive indices get "\n\n---\n\n"
    cs = ChunkSelector("words", 0, BEGINNING)
    cs.is_search_mode = True
    selected = [Chunk("A", 0, 1.0), Chunk("E", 4, 0.9)]
    assert cs.format_selected_chunks(selected) == "A\n\n---\n\nE"


def test_no_limit_search_filtering():
    # chunk_selection.go:594-649 — score threshold + top-N + fallback
    all_chunks = [f"c{i}" for i in range(12)]
    cs = ChunkSelector("words", 0, BEGINNING)
    # 8 chunks pass threshold -> half = 4 kept (first 4 by score order)
    ordered = cs.prepare_for_search(
        [(all_chunks[i], 1.0 - i * 0.1, i) for i in range(8)])
    out = cs.select(ordered, all_chunks, 0, 0)
    assert out == "c0\nc1\nc2\nc3"
    # no chunk passes threshold -> fallback top 2
    cs2 = ChunkSelector("words", 0, BEGINNING)
    ordered2 = cs2.prepare_for_search([(all_chunks[i], 0.0, i) for i in range(5)])
    out2 = cs2.select(ordered2, all_chunks, 0, 0)
    assert out2 == "c0\nc1"


def test_overlap_removal():
    # chunk_selection.go:234-267
    cs = ChunkSelector("words", 0, BEGINNING)
    assert cs._remove_overlap_prefix("world again", "hello world") == "again"
    assert cs._remove_overlap_prefix("hello world", "hello world") == ""
    assert cs._remove_overlap_prefix("fresh text", "other stuff") == "fresh text"


def test_separators():
    # chunk_selection.go:203-230
    sep = ChunkSelector._determine_separator
    assert sep("", "x") == ""
    assert sep("ends with break\n\n", "x") == "\n\n"
    assert sep("ends with line\n", "x") == "\n"
    long_sentence = "This is a long sentence with more than forty characters."
    assert sep(long_sentence, "x") == "\n\n"
    assert sep("short.", "x") == "\n"
    assert sep("no punctuation", "x") == "\n"


def test_size_tolerance():
    # chunk_selection_test.go:388-394 — ≤ maxUnits + 10%
    text = ("The carrot cake recipe requires sifting flour through a fine "
            "mesh sieve. " * 30)
    for method, max_units in (("words", 50), ("characters", 300), ("tokens", 60)):
        cs = ChunkSelector(method, max_units, BEGINNING)
        chunks = cs.prepare_chunks(text)
        result = cs.apply_size_constraints(chunks)
        assert result != ""
        assert cs.counter.count(result) <= max_units + max_units // 10


def test_apply_simple_size_limit():
    # sift.go:305-372
    content = "one two three four five six seven eight nine ten"
    assert apply_simple_size_limit(content, 3, "words") == "one two three"
    assert apply_simple_size_limit(content, 0, "words") == content
    # preserves interior formatting
    content2 = "line one\nline two\n\npara two here"
    out = apply_simple_size_limit(content2, 4, "words")
    assert out == "line one\nline two"


def test_include_all_bypasses_filtering():
    # sift_test.go:115-208
    doc = (
        "Copyright 2025. All rights reserved. This text may not be "
        "reproduced without permission.\n\n"
        "Recipes Home About Profile Share Content Navigation \n\n"
        "The carrot cake recipe requires sifting flour through lorem ipsum "
        "dolor sit amet consectetur adipiscing elit. \n\n"
        "Lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
        "eiusmod tempor incididunt ut labore et dolore magna aliqua.\n\n"
        "Ut enim ad minim veniam, quis nostrud exercitation ullamco laboris "
        "nisi ut aliquip ex ea commodo consequat.\n\n"
        "ISBN 04550-479 Published by Hughes-Crane Publications \n\n"
        "References: Department of Education. 5th Edition. Foundation "
        "Publications, 2023."
    )
    base = SiftConfig(max_units=1000, counting_method="words",
                      sizing_strategy=BEGINNING)
    filtered = apply_content_transformations(doc, base.with_(include_all=False))
    kept_all = apply_content_transformations(doc, base.with_(include_all=True))

    for result, expect in ((filtered, False), (kept_all, True)):
        assert (("Copyright 2025" in result) or
                ("All rights reserved" in result)) is expect
        assert (("Home About Profile" in result) or
                ("Navigation Footer" in result)) is expect
        assert ("ISBN 04550" in result) is expect
        assert ("References:" in result) is expect
        # main content always preserved
        assert "carrot cake recipe" in result and "sifting flour" in result


def test_word_limit_respected():
    # sift_test.go:50-113
    text = "sugar " * 100
    for include_all in (False, True):
        cfg = SiftConfig(max_units=50, counting_method="words",
                         sizing_strategy=MIDDLE, include_all=include_all)
        result = apply_content_transformations(text, cfg)
        assert result != ""
        assert len(result.split()) <= 50
    assert apply_content_transformations("", SiftConfig(max_units=50,
                                                        counting_method="words")) == ""
