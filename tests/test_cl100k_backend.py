"""Env-gated real-BPE token backend (counters.py BPEncoder).

The sandbox has no cl100k vocabulary, so the merge algorithm is pinned with
a small hand-built tiktoken-format vocab (base64(bytes) rank per line) whose
merge order is computable by hand; a final skip-if-absent test asserts
byte-parity against real tiktoken whenever a vocabulary file AND the
tiktoken package exist (reference: internal/counter/token_counter.go:18-79).
"""

import base64
import importlib
import os

import pytest

from sift_ray.textproc import counters as C


def _write_vocab(tmp_path, ranks):
    p = tmp_path / "toy.tiktoken"
    lines = [base64.b64encode(tok).decode() + " " + str(rank)
             for tok, rank in ranks.items()]
    p.write_text("\n".join(lines) + "\n")
    return str(p)


@pytest.fixture
def toy_bpe(tmp_path):
    # single bytes for every char used, plus merges with hand-set ranks
    ranks = {}
    for i, ch in enumerate(b"abcdehlo "):
        ranks[bytes([ch])] = i
    ranks[b"ab"] = 20
    ranks[b"bc"] = 21
    ranks[b"abc"] = 22
    ranks[b"he"] = 23
    ranks[b"llo"] = 24
    ranks[b"ll"] = 25
    path = _write_vocab(tmp_path, ranks)
    return C.BPEncoder(C._load_ranks(path)), ranks, path


def test_load_ranks_roundtrip(toy_bpe):
    bpe, ranks, _ = toy_bpe
    assert bpe.ranks == ranks
    assert bpe.decoder[20] == b"ab"


def test_whole_piece_shortcut(toy_bpe):
    bpe, ranks, _ = toy_bpe
    assert bpe.encode("abc") == [ranks[b"abc"]]


def test_greedy_lowest_rank_merge(toy_bpe):
    bpe, ranks, _ = toy_bpe
    # "abab": pairs ab(20) ba(-) ab(20) -> merge first ab -> [ab,a,b];
    # pairs aba(-)... candidates ab+a (b"aba" absent), a+b=ab(20) -> merge
    # -> [ab, ab]; b"abab" absent -> stop
    assert bpe.encode("abab") == [20, 20]
    # "hello": he(23) el(-) ll(25) lo(-) -> merge he -> [he,l,l,o];
    # next: hel(-), ll(25), lo(-) -> merge ll -> [he,ll,o]; hell(-),
    # llo(24) -> merge llo -> [he, llo]
    assert bpe.encode("hello") == [23, 24]


def test_unmergeable_falls_to_bytes(toy_bpe):
    bpe, ranks, _ = toy_bpe
    assert bpe.encode("ed") == [ranks[b"e"], ranks[b"d"]]


def test_decode_inverts_encode(toy_bpe):
    bpe, _, _ = toy_bpe
    for text in ("abab", "hello", "abc de", "a", ""):
        assert bpe.decode(bpe.encode(text)) == text


def test_count_matches_encode_len(toy_bpe):
    bpe, _, _ = toy_bpe
    for text in ("abab", "hello abc", "deed"):
        assert bpe.count(text) == len(bpe.encode(text))


def test_token_counter_env_gate(toy_bpe, monkeypatch):
    _, ranks, path = toy_bpe
    monkeypatch.setenv(C.VOCAB_ENV, path)
    C._REAL_BPE = None  # drop the per-process cache
    tc = C.TokenCounter()
    assert tc._bpe is not None
    assert tc.count("hello") == 2
    # exact-token truncation through the real backend: 1-token prefix
    assert tc.create_partial_text("hello", 1) == "he"
    assert tc.create_partial_text("hello", 99) == "hello"
    assert tc.name == "tokens (cl100k_base)"
    monkeypatch.delenv(C.VOCAB_ENV)
    C._REAL_BPE = None
    assert C.TokenCounter()._bpe is None  # fallback path restored


def test_partial_text_prefix_property(toy_bpe, monkeypatch):
    _, _, path = toy_bpe
    monkeypatch.setenv(C.VOCAB_ENV, path)
    C._REAL_BPE = None
    tc = C.TokenCounter()
    text = "hello abc abab cde"
    total = tc.count(text)
    for k in range(1, total + 1):
        part = tc.create_partial_text(text, k)
        assert text.startswith(part)
        assert tc.count(part) == k
    monkeypatch.delenv(C.VOCAB_ENV)
    C._REAL_BPE = None


@pytest.mark.skipif(
    not os.environ.get(C.VOCAB_ENV)
    or importlib.util.find_spec("tiktoken") is None,
    reason="needs a real cl100k vocab file ($SIFT_RAY_CL100K_VOCAB) and "
           "the tiktoken package; absent in the offline sandbox")
def test_parity_with_real_tiktoken():
    import tiktoken

    enc = tiktoken.get_encoding("cl100k_base")
    bpe = C._real_bpe()
    samples = [
        "Hello, world! This is a test.",
        "   leading spaces and\nnewlines\r\n",
        "numbers 1234567 and punctuation!!! ... 'contractions' won't",
        "unicode: café naïve 中文 \U0001f600",
    ]
    for s in samples:
        assert bpe.encode(s) == enc.encode(s)
    tc = C.TokenCounter()
    for s in samples:
        for k in (1, 3, 10):
            assert tc.create_partial_text(s, k) == enc.decode(
                enc.encode(s)[:k])
