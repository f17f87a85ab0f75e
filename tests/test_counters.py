"""Counter tests ported from internal/counter/counter_test.go."""

from sift_ray.textproc.counters import (CharCounter, TokenCounter, WordCounter,
                                        new_counter)


class TestWordCounter:
    # counter_test.go:15-19
    def test_counts(self):
        wc = WordCounter()
        assert wc.count("") == 0
        assert wc.count("hello") == 1
        assert wc.count("hello world test") == 3
        assert wc.count("  hello   world  ") == 2
        assert wc.count("café naïve résumé") == 3

    def test_name(self):
        assert WordCounter().name == "words"


class TestCharCounter:
    # counter_test.go:43-49 — runes / code points, not bytes
    def test_counts(self):
        cc = CharCounter()
        assert cc.count("") == 0
        assert cc.count("café") == 4
        assert cc.count("a b") == 3
        assert cc.count("hello 👋") == 7

    def test_name(self):
        assert CharCounter().name == "characters"


class TestTokenCounter:
    def test_empty(self):
        assert TokenCounter().count("") == 0

    def test_positive(self):
        tc = TokenCounter()
        assert tc.count("hello") >= 1
        assert tc.count("hello world") >= 2
        assert tc.count("The quick brown fox jumps over the lazy dog") >= 9

    def test_roundtrip(self):
        tc = TokenCounter()
        for text in ("hello world", "Line one\nLine two", "a  b   c",
                     "café 👋 ok", "punctuation!!! and, commas."):
            assert tc.decode(tc.encode(text)) == text

    def test_create_partial_exact(self):
        # counter_test.go:192-196 — exactly maxTokens tokens when truncating
        tc = TokenCounter()
        text = "The quick brown fox jumps over the lazy dog repeatedly " * 5
        total = tc.count(text)
        for k in (1, 3, 10, total - 1):
            partial = tc.create_partial_text(text, k)
            assert tc.count(partial) == k
            assert text.startswith(partial)

    def test_create_partial_edge(self):
        tc = TokenCounter()
        assert tc.create_partial_text("short", 100) == "short"  # fits
        assert tc.create_partial_text("anything", 0) == ""
        assert tc.create_partial_text("anything", -1) == ""
        assert tc.create_partial_text("", 5) == ""

    def test_name(self):
        # counter_test.go:221 — name string drives chunk sizing
        assert TokenCounter().name == "tokens (cl100k_base)"


def test_factory():
    assert new_counter("words").name == "words"
    assert new_counter("characters").name == "characters"
    assert new_counter("tokens").name == "tokens (cl100k_base)"
    assert new_counter("bogus").name == "tokens (cl100k_base)"  # fallback
