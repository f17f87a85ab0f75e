"""Chunker tests ported from internal/chunk/chunk_test.go."""

import pytest

from sift_ray.textproc.chunker import (calculate_minimum_chunk_size, split_text,
                                       trim_spaces_only)


def _blen(s):
    return len(s.encode("utf-8"))


# chunk_test.go:10-122 — exact chunk counts
@pytest.mark.parametrize("text,max_size,expected", [
    ("", 100, 0),
    ("   \n\t   ", 100, 0),
    ("This is a short text that fits in one chunk.", 100, 1),
    ("Some text", 0, 0),
    ("This is a long text that needs to be split into multiple chunks for testing purposes.", 30, 3),
    ("First paragraph.\n\nSecond paragraph.\n\nThird paragraph.", 25, 3),
    ("First sentence. Second sentence. Third sentence.", 20, 3),
    ("First question? Second question? Third question?", 20, 3),
    ("First exclamation! Second exclamation! Third exclamation!", 25, 3),
    ("short supercalifragilisticexpialidocious word", 20, 3),
])
def test_split_counts(text, max_size, expected):
    result = split_text(text, max_size)
    assert len(result) == expected
    for chunk in result:
        assert chunk.strip() != ""
        if _blen(chunk) > max_size:
            assert len(chunk.split()) == 1  # only oversized single words may exceed


def test_invalid_size():
    # chunk_test.go:124-150
    text = "This is test content for validation."
    assert split_text(text, 0) == []
    assert split_text(text, -5) == []
    assert len(split_text(text, 50)) > 0


# chunk_test.go:152-219 — multi-chunk splitting per strategy
@pytest.mark.parametrize("text,max_size", [
    ("First paragraph content.\n\nSecond paragraph content.\n\nThird paragraph content.", 30),
    ("Sentence one. Sentence two. Sentence three.", 20),
    ("word1 word2 word3 word4 word5 word6 word7", 15),
    ("Are you sure? Maybe not sure? Definitely sure?", 20),
    ("Hello world! This is great! Amazing stuff here!", 20),
])
def test_splitting_strategies(text, max_size):
    result = split_text(text, max_size)
    assert len(result) > 1
    for chunk in result:
        assert chunk.strip() != ""


# chunk_test.go:221-289 — edge cases
@pytest.mark.parametrize("text,max_size,expect_empty", [
    ("   \n\n\t   ", 100, True),
    ("a", 100, False),
    ("word1     word2     word3", 15, False),
    ("!@#$%^&*().,;:", 10, False),
    ("test", 2, False),
])
def test_edge_cases(text, max_size, expect_empty):
    result = split_text(text, max_size)
    if expect_empty:
        assert result == []
    else:
        assert len(result) > 0
        for chunk in result:
            assert chunk.strip() != ""


# chunk_test.go:291-427 — oversized words preserved, counts in ranges
@pytest.mark.parametrize("text,max_size,lo,hi,contents", [
    ("supercalifragilisticexpialidocious", 20, 1, 1,
     ["supercalifragilisticexpialidocious"]),
    ("antidisestablishmentarianism pseudopseudohypoparathyroidism", 25, 2, 2,
     ["antidisestablishmentarianism", "pseudopseudohypoparathyroidism"]),
    ("The antidisestablishmentarianism was quite extraordinary indeed", 15, 2, 6,
     ["antidisestablishmentarianism"]),
    ("This supercalifragilisticexpialidocious. Next sentence here.", 20, 2, 3,
     ["supercalifragilisticexpialidocious."]),
    ("This " + "verylongword" * 10 + " is massive", 30, 2, 3,
     ["verylongword" * 10]),
    ("The café's encyclopædiasupercalifragilisticexpialidocious menu was extraordinäry",
     20, 3, 5, ["encyclopædiasupercalifragilisticexpialidocious"]),
])
def test_oversized_words(text, max_size, lo, hi, contents):
    result = split_text(text, max_size)
    assert lo <= len(result) <= hi, result
    for expected in contents:
        assert any(expected in c for c in result), result
    # no data loss (word-level)
    original_words = text.split()
    result_words = [w for c in result for w in c.split()]
    assert len(original_words) == len(result_words)
    # multi-word chunks never exceed the byte cap
    for chunk in result:
        if len(chunk.split()) > 1:
            assert _blen(chunk) <= max_size


# chunk_test.go:429-559 — sentence delimiter restoration
@pytest.mark.parametrize("text,max_size,lo,hi,contents", [
    ("This is a statement. Is this a question? This is exciting! Another statement.",
     30, 3, 4, ["statement.", "question?", "exciting!", "Another statement."]),
    ("Are you coming? Maybe you should? I think so?", 25, 2, 3,
     ["coming?", "should?", "so?"]),
    ("Wow! Amazing! Incredible stuff here!", 15, 3, 4,
     ["Wow!", "Amazing!", "Incredible"]),
    ("Really?! Are you sure?! Absolutely!", 20, 2, 4,
     ["Really", "sure", "Absolutely"]),
    ("Question?Another sentence.Final!", 15, 1, 3,
     ["Question?Another", "sentence.Final!"]),
    ("Short. Question? Exclamation! Another.", 12, 3, 5,
     ["Short.", "Question?", "Exclamation!", "Another."]),
    ("Start. ? ! End.", 10, 2, 4, ["Start.", "End."]),
])
def test_sentence_delimiters(text, max_size, lo, hi, contents):
    result = split_text(text, max_size)
    assert lo <= len(result) <= hi, result
    for expected in contents:
        assert any(expected in c for c in result), (expected, result)
    for chunk in result:
        assert chunk.strip() != ""


# chunk_test.go:561-702 — short-segment merging (initials)
@pytest.mark.parametrize("text,max_size,lo,hi,contents", [
    ("G. W. F. Hegel was a German philosopher.", 25, 1, 3,
     ["G. W. F.", "Hegel"]),
    ("Dr. Smith works at MIT. He has a Ph.D. in Computer Science.", 30, 1, 3,
     ["Dr. Smith"]),
    ("A. B. This is a longer sentence that should remain separate. C. D.", 40,
     3, 4, ["A. B.", "longer sentence", "C. D."]),
    ("This is a very long sentence that cannot be merged. A.", 25, 2, 4, ["A."]),
    ("J. R. R. Tolkien wrote The Lord of the Rings.", 30, 1, 3,
     ["J. R. R.", "Tolkien"]),
    ("A. B. C.", 5, 1, 3, ["A. B."]),
    ("X. Y.", 10, 1, 2, ["X. Y."]),
])
def test_minimum_chunk_merging(text, max_size, lo, hi, contents):
    result = split_text(text, max_size)
    assert lo <= len(result) <= hi, result
    for expected in contents:
        assert any(expected in c for c in result), (expected, result)


def test_min_chunk_size_rule():
    # code uses 25% with floor 3 (chunk.go:244-251) — code wins over the
    # 15% mentioned in test comments (SURVEY.md C4)
    assert calculate_minimum_chunk_size(100) == 25
    assert calculate_minimum_chunk_size(10) == 3
    assert calculate_minimum_chunk_size(4) == 3


def test_trim_spaces_only():
    assert trim_spaces_only("  a b \t") == "a b"
    assert trim_spaces_only("\n a \n") == "\n a \n"  # newlines preserved
    assert trim_spaces_only("") == ""
