"""Exact duplicate-span detection/removal (functions/spandedup.py).

The decisive check is equality with a brute-force reference: enumerate ALL
shared k-grams between every doc pair (no winnowing), extend each to its
maximal span, keep spans >= min_len — the winnowed distributed result must
equal it exactly (Schleimer et al.'s guarantee says winnowing never loses
a span of length >= w + k - 1, and extension makes the result independent
of WHICH anchor inside the span was selected)."""

import random

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from sift_ray.functions.spandedup import (
    WinnowStage, _kgram_hashes, _winnow_positions, duplicate_spans,
    strip_duplicate_spans, winnow_fingerprints)

K = 8
MIN_LEN = 24


def brute_force_spans(docs, k=K, min_len=MIN_LEN):
    """All maximal cross-doc duplicated spans >= min_len, via every shared
    k-gram (no sampling)."""
    grams = {}
    for did, text in docs.items():
        for p in range(len(text) - k + 1):
            grams.setdefault(text[p:p + k], []).append((did, p))
    out = set()
    for occ in grams.values():
        for i in range(len(occ)):
            for j in range(i + 1, len(occ)):
                (da, sa), (db, sb) = occ[i], occ[j]
                if da == db:
                    continue
                if da > db:
                    (da, sa), (db, sb) = (db, sb), (da, sa)
                ta, tb = docs[da], docs[db]
                lo_a, lo_b = sa, sb
                while lo_a > 0 and lo_b > 0 and ta[lo_a - 1] == tb[lo_b - 1]:
                    lo_a, lo_b = lo_a - 1, lo_b - 1
                hi_a, hi_b = sa + k, sb + k
                while (hi_a < len(ta) and hi_b < len(tb)
                       and ta[hi_a] == tb[hi_b]):
                    hi_a, hi_b = hi_a + 1, hi_b + 1
                if hi_a - lo_a >= min_len:
                    out.add((da, lo_a, db, lo_b, hi_a - lo_a))
    return out


def _rand_text(rng, n):
    return "".join(rng.choice("abcdefgh ") for _ in range(n))


def _spans_set(ds):
    df = ds.to_pandas()
    if len(df) == 0:   # Ray: empty dataset -> 0-column DataFrame
        return set()
    return {tuple(int(v) for v in row)
            for row in df[["doc_a", "start_a", "doc_b", "start_b",
                           "length"]].itertuples(index=False)}


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(7)
    docs = {}
    base = _rand_text(rng, 400)
    shared1 = _rand_text(rng, 60)     # long planted duplicate
    shared2 = _rand_text(rng, 30)     # second, shorter duplicate
    docs[0] = base[:100] + shared1 + base[100:200]
    docs[1] = base[200:260] + shared1 + shared2 + base[260:300]
    docs[2] = _rand_text(rng, 150) + shared2 + _rand_text(rng, 40)
    docs[3] = _rand_text(rng, 250)    # no duplicates
    for i in range(4, 12):            # noise docs
        docs[i] = _rand_text(rng, rng.randrange(60, 220))
    return docs


def _ds_of(docs, nblocks=1):
    t = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                  "text": pa.array(list(docs.values()), pa.string())})
    ds = rd.from_arrow(t)
    return ds.repartition(nblocks) if nblocks > 1 else ds


def test_kgram_hash_positional():
    codes = np.frombuffer("abcabc".encode("utf-32-le"), np.uint32)
    h = _kgram_hashes(codes.astype(np.uint64), 3)
    assert len(h) == 4
    assert h[0] == h[3]               # same 3-gram content
    assert h[0] != h[1]


def test_winnow_guarantee_brute():
    # every w-window of hashes must have >= 1 selected position that is a
    # minimum of that window
    rng = np.random.default_rng(3)
    h = rng.integers(0, 2**63, 500).astype(np.uint64)
    w = 17
    sel = set(_winnow_positions(h, w).tolist())
    for i in range(len(h) - w + 1):
        window = h[i:i + w]
        m = window.min()
        assert any((i + j) in sel and window[j] == m
                   for j in range(w)), f"window {i} unrepresented"


def test_winnow_short_doc():
    assert len(_winnow_positions(np.empty(0, np.uint64), 5)) == 0
    assert _winnow_positions(np.array([7, 3, 9], np.uint64), 10).tolist() \
        == [1]


def test_stage_skips_tiny_docs(ray_session):
    ds = _ds_of({1: "ab", 2: ""})
    out = winnow_fingerprints(ds, k=K, w=3).to_pandas()
    assert len(out) == 0


def test_matches_brute_force(ray_session, corpus):
    got = _spans_set(duplicate_spans(_ds_of(corpus), min_len=MIN_LEN, k=K))
    want = brute_force_spans(corpus)
    assert got == want
    assert len(want) >= 2             # the fixture really plants spans


def test_partition_invariance(ray_session, corpus):
    a = _spans_set(duplicate_spans(_ds_of(corpus, 1), min_len=MIN_LEN,
                                   k=K))
    b = _spans_set(duplicate_spans(_ds_of(corpus, 7), min_len=MIN_LEN,
                                   k=K))
    assert a == b


def test_exchange_path_equals_broadcast(ray_session, corpus):
    a = _spans_set(duplicate_spans(_ds_of(corpus), min_len=MIN_LEN, k=K))
    b = _spans_set(duplicate_spans(_ds_of(corpus), min_len=MIN_LEN, k=K,
                                   text_broadcast_bytes=0))
    assert a == b


def test_no_false_positives_disjoint(ray_session):
    docs = {0: "a" * 0 + "".join(chr(97 + (i * 7 + 3) % 8)
                                 for i in range(300)),
            1: "".join(chr(105 + (i * 5 + 1) % 8) for i in range(300))}
    # alphabets {a..h} vs {i..p}: nothing can match
    got = _spans_set(duplicate_spans(_ds_of(docs), min_len=MIN_LEN, k=K))
    assert got == set()


def test_strip_removes_later_occurrence(ray_session, corpus):
    spans = brute_force_spans(corpus)
    out = strip_duplicate_spans(_ds_of(corpus), min_len=MIN_LEN,
                                k=K).to_pandas()
    got = dict(zip(out["doc_id"], out["text"]))
    assert set(got) == set(corpus)
    # first occurrences (doc_a side) survive byte-identical
    cut_docs = {db for (_, _, db, _, _) in spans}
    for did, text in corpus.items():
        if did not in cut_docs:
            assert got[did] == text, did
        else:
            assert len(got[did]) < len(text)
    # the planted shared1 block no longer appears twice anywhere
    all_text = "\n".join(got.values())
    for (da, sa, db, sb, ln) in spans:
        dup = corpus[da][sa:sa + ln]
        assert all_text.count(dup) <= 1


def test_strip_idempotent(ray_session, corpus):
    once = strip_duplicate_spans(_ds_of(corpus), min_len=MIN_LEN,
                                 k=K).to_pandas()
    docs2 = dict(zip((int(x) for x in once["doc_id"]), once["text"]))
    twice = strip_duplicate_spans(_ds_of(docs2), min_len=MIN_LEN,
                                  k=K).to_pandas()
    got2 = dict(zip((int(x) for x in twice["doc_id"]), twice["text"]))
    assert got2 == docs2


def test_max_df_caps_hot_anchor(ray_session):
    # one 60-char block shared by 30 docs: with max_df below the bucket
    # size the hot anchors drop (documented cap); with a high cap all
    # pairs appear
    rng = random.Random(11)
    block = _rand_text(rng, 60)
    docs = {i: _rand_text(rng, 50) + block + _rand_text(rng, 50)
            for i in range(30)}
    full = duplicate_spans(_ds_of(docs), min_len=MIN_LEN, k=K,
                           max_df=2000).to_pandas()
    assert len(full) >= 30 * 29 / 2
    capped = duplicate_spans(_ds_of(docs), min_len=MIN_LEN, k=K,
                             max_df=5).to_pandas()
    assert len(capped) < len(full)


def test_winnow_density(ray_session):
    # selection density ~2/w of k-gram positions, the published bound
    rng = random.Random(5)
    text = _rand_text(rng, 5000)
    stage = WinnowStage(k=K, w=41)
    out = stage(pa.table({"doc_id": pa.array([1], pa.int64()),
                          "text": pa.array([text], pa.string())}))
    density = out.num_rows / (len(text) - K + 1)
    assert density < 2.5 / 41 * 2    # generous factor-2 headroom


def test_within_doc_spans(ray_session):
    rng = random.Random(21)
    rep = _rand_text(rng, 40)
    docs = {0: _rand_text(rng, 80) + rep + _rand_text(rng, 55)
            + rep + _rand_text(rng, 30),
            1: _rand_text(rng, 120)}
    cross_only = _spans_set(duplicate_spans(_ds_of(docs), min_len=MIN_LEN,
                                            k=K))
    assert cross_only == set()        # no cross-doc duplicates planted
    within = _spans_set(duplicate_spans(_ds_of(docs), min_len=MIN_LEN,
                                        k=K, within_doc=True))
    assert any(da == db == 0 and ln >= 40
               for (da, sa, db, sb, ln) in within)
    for (da, sa, db, sb, ln) in within:
        assert sa < sb                # ordered self-pairs
        assert docs[da][sa:sa + ln] == docs[db][sb:sb + ln]


def test_within_doc_strip_tandem(ray_session):
    rng = random.Random(22)
    rep = _rand_text(rng, 40)
    pre, mid, post = (_rand_text(rng, 70), _rand_text(rng, 60),
                      _rand_text(rng, 45))
    docs = {5: pre + rep + mid + rep + post}
    out = strip_duplicate_spans(_ds_of(docs), min_len=MIN_LEN, k=K)
    # strip only consumes cross-doc spans by default: unchanged
    assert dict(zip(*[out.to_pandas()[c] for c in ("doc_id", "text")]))[5] \
        == docs[5]


def test_within_doc_strip(ray_session):
    rng = random.Random(23)
    rep = _rand_text(rng, 40)
    pre, mid, post = (_rand_text(rng, 70), _rand_text(rng, 60),
                      _rand_text(rng, 45))
    docs = {5: pre + rep + mid + rep + post}
    out = strip_duplicate_spans(_ds_of(docs), min_len=MIN_LEN, k=K,
                                within_doc=True).to_pandas()
    got = dict(zip((int(x) for x in out["doc_id"]), out["text"]))[5]
    # the later repeat (with any extension into identical surroundings)
    # is cut; the first occurrence survives
    assert got.count(rep) == 1
    assert got.startswith(pre + rep)
    assert len(got) <= len(docs[5]) - len(rep)


def test_strip_with_precomputed_spans(ray_session, corpus):
    pre = duplicate_spans(_ds_of(corpus), min_len=MIN_LEN, k=K)
    a = strip_duplicate_spans(_ds_of(corpus), spans=pre).to_pandas()
    b = strip_duplicate_spans(_ds_of(corpus), min_len=MIN_LEN,
                              k=K).to_pandas()
    assert (dict(zip(a["doc_id"], a["text"]))
            == dict(zip(b["doc_id"], b["text"])))


def test_cli_dedup_spans(ray_session, corpus, tmp_path):
    import json
    import pyarrow.parquet as pq

    from sift_ray.cli import main

    src = tmp_path / "docs.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array(list(corpus), pa.int64()),
        "text": pa.array(list(corpus.values()), pa.string())}), str(src))
    out = tmp_path / "spans"
    assert main(["dedup-spans", "detect", "--input", str(src),
                 "--output", str(out), "--min-len", str(MIN_LEN),
                 "--k", str(K)]) == 0
    det = pq.ParquetDataset(str(out)).read().to_pandas()
    got = {tuple(int(v) for v in r) for r in
           det[["doc_a", "start_a", "doc_b", "start_b",
                "length"]].itertuples(index=False)}
    assert got == brute_force_spans(corpus)


def test_strip_join_path_equals_broadcast(ray_session, corpus):
    a = strip_duplicate_spans(_ds_of(corpus), min_len=MIN_LEN,
                              k=K).to_pandas()
    b = strip_duplicate_spans(_ds_of(corpus), min_len=MIN_LEN, k=K,
                              cuts_broadcast_limit=0).to_pandas()
    assert (dict(zip(a["doc_id"], a["text"]))
            == dict(zip(b["doc_id"], b["text"])))


def test_web_pipeline_span_strip(ray_session, tmp_path):
    """strip_spans_min_len wired into the flagship composition: a planted
    cross-document duplicated block shrinks the victim doc's token
    count; other docs' shard rows are unchanged."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from sift_ray.pipelines.web_pipeline import build_shards_pipeline

    rng = random.Random(31)
    blk = " ".join(_rand_text(rng, 5) for _ in range(40))  # 40 words
    mk = lambda n: " ".join(_rand_text(rng, 6) for _ in range(n))
    docs = {1: mk(60) + " " + blk, 2: blk + " " + mk(50), 3: mk(80)}
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string())}))
    plain = build_shards_pipeline(ds, shard_tokens=10_000).to_pandas() \
        .set_index("doc_id")
    ds2 = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string())}))
    stripped = build_shards_pipeline(
        ds2, shard_tokens=10_000,
        strip_spans_min_len=100).to_pandas().set_index("doc_id")
    assert stripped.loc[2, "n_tokens"] < plain.loc[2, "n_tokens"]
    assert stripped.loc[1, "n_tokens"] == plain.loc[1, "n_tokens"]
    assert stripped.loc[3, "n_tokens"] == plain.loc[3, "n_tokens"]


# ---- property-based (hypothesis): winnowed distributed result equals the
# brute-force all-shared-k-grams reference on ARBITRARY corpora

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_SET = settings(max_examples=6, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture,
                                       HealthCheck.data_too_large])

_texts = st.lists(st.text(alphabet="abcd ", min_size=0, max_size=120),
                  min_size=2, max_size=6)


@_SET
@given(texts=_texts, seed=st.integers(0, 9))
def test_property_spans_match_brute(ray_session, texts, seed):
    rng = random.Random(seed)
    shared = _rand_text(rng, 40)
    docs = {}
    for i, t in enumerate(texts):
        # plant the shared block into a random subset so duplicates exist
        docs[i] = (t + shared + t[::-1]) if rng.random() < 0.5 else t
    got = _spans_set(duplicate_spans(_ds_of(docs), min_len=MIN_LEN, k=K,
                                     max_df=10_000))
    assert got == brute_force_spans(docs)


def test_winnow_equals_quadratic_brute():
    """The O(m) van Herk/Gil-Werman argmin must equal the direct O(m*w)
    leftmost sliding argmin for every w — including dense ties, w ~ m,
    and values equal to the padding sentinel."""
    def quad(h, w):
        m = len(h)
        if m == 0:
            return np.empty(0, np.int64)
        if m <= w:
            return np.array([int(np.argmin(h))], np.int64)
        wins = np.lib.stride_tricks.sliding_window_view(h, w)
        return np.unique(wins.argmin(axis=1)
                         + np.arange(m - w + 1)).astype(np.int64)

    rng = np.random.default_rng(17)
    cases = []
    for m in (1, 2, 50, 503):
        cases.append(rng.integers(0, 2**63, m).astype(np.uint64))
        cases.append(rng.integers(0, 8, m).astype(np.uint64))  # ties
        cases.append(np.full(m, np.uint64(0xFFFFFFFFFFFFFFFF)))
    for h in cases:
        m = len(h)
        for w in (1, 2, 3, 17, 64, max(1, m - 1), m, m + 5):
            got = _winnow_positions(h, w)
            assert got.tolist() == quad(h, w).tolist(), (m, w)


def test_partition_needs_bounded(ray_session):
    """Anchor-count independence: 500 anchors for ONE doc pair must yield
    a needs table of exactly 2 rows (one per doc for the one partition) —
    the guard against per-anchor text amplification on the exchange
    path."""
    from sift_ray.functions.shuffle import add_hash_partition
    from sift_ray.functions.spandedup import _partition_needs

    n = 500
    anchors = rd.from_arrow(pa.table({
        "doc_a": pa.array([1] * n, pa.int64()),
        "pos_a": pa.array(list(range(n)), pa.int64()),
        "doc_b": pa.array([2] * n, pa.int64()),
        "pos_b": pa.array(list(range(n)), pa.int64())}))
    for nblocks in (1, 5):
        src = anchors.repartition(nblocks) if nblocks > 1 else anchors
        ap = add_hash_partition(src, ["doc_a", "doc_b"], 8)
        needs = _partition_needs(ap, 8).to_pandas()
        assert len(needs) == 2
        assert set(needs["doc_id"]) == {1, 2}
        assert needs["dst_part"].nunique() == 1


def test_forced_above_all_gates_equals_broadcast(ray_session):
    """Boilerplate-heavy corpus (many anchors per doc pair) with BOTH
    scale gates forced: id semi-join + partition-cogrouped exchange
    verify must equal the broadcast result and the brute force."""
    rng = random.Random(41)
    blk = _rand_text(rng, 120)
    docs = {i: _rand_text(rng, 30) + blk + _rand_text(rng, 30)
            for i in range(8)}
    a = _spans_set(duplicate_spans(_ds_of(docs, 3), min_len=MIN_LEN, k=K,
                                   max_df=10_000))
    b = _spans_set(duplicate_spans(_ds_of(docs, 3), min_len=MIN_LEN, k=K,
                                   max_df=10_000, text_broadcast_bytes=0,
                                   id_broadcast_limit=0))
    assert a == b == brute_force_spans(docs)


def test_strip_metadata_passthrough(ray_session, corpus):
    """strip composes mid-pipeline: custom id/text column names honored,
    url/host metadata columns preserved, on BOTH the broadcast and the
    join application paths."""
    urls = {d: f"https://ex.com/{d}" for d in corpus}
    t = pa.table({
        "page_id": pa.array(list(corpus), pa.int64()),
        "url": pa.array([urls[d] for d in corpus], pa.string()),
        "body": pa.array(list(corpus.values()), pa.string()),
        "host": pa.array(["ex.com"] * len(corpus), pa.string())})
    want = strip_duplicate_spans(_ds_of(corpus), min_len=MIN_LEN,
                                 k=K).to_pandas()
    want = dict(zip((int(x) for x in want["doc_id"]), want["text"]))
    for kw in ({}, {"cuts_broadcast_limit": 0}):
        out = strip_duplicate_spans(
            rd.from_arrow(t), min_len=MIN_LEN, k=K, id_col="page_id",
            text_col="body", **kw).to_pandas()
        assert set(out.columns) == {"page_id", "url", "body", "host"}
        got = {int(r.page_id): (r.url, r.body, r.host)
               for r in out.itertuples(index=False)}
        for d in corpus:
            assert got[d] == (urls[d], want[d], "ex.com")
