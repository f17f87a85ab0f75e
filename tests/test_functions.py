"""Unit tests for the training-data ops added beyond the reference:
n-gram Jaccard dedup and IVF approximate similarity search."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sift_ray.functions.dedup import (_distinct_gram_hashes, _gram_words,
                                      ngram_jaccard_pairs)
from sift_ray.functions.similarity import cosine_topk, cosine_topk_ivf


def test_gram_words_ascii_lower():
    assert _gram_words("Hello, World-42! Éclair") == [
        "hello", "world", "42", "clair"]


def test_distinct_gram_hashes_short_doc_empty():
    assert len(_distinct_gram_hashes("one two", 3)) == 0
    assert len(_distinct_gram_hashes("", 3)) == 0
    assert len(_distinct_gram_hashes("a b c", 3)) == 1
    # distinct + order-sensitive: grams are abc, bca, cab, abc -> 3 distinct
    assert len(_distinct_gram_hashes("a b c a b c", 3)) == 3
    x = _distinct_gram_hashes("a b c", 3)
    y = _distinct_gram_hashes("c b a", 3)
    assert x[0] != y[0]


def test_ngram_jaccard_pairs_known(ray_session):
    import ray.data as rd
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            base,
            base + " tail",                  # near-dup of 1
            "completely different words entirely distinct tokens here",
            "xy",                            # too short: no grams
        ],
    })
    out = ngram_jaccard_pairs(rd.from_pandas(docs), k=3,
                              threshold=0.5).to_pandas()
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (1, 2) in pairs
    assert all(p == (1, 2) for p in pairs)
    # exact jaccard: doc1 has 10 grams, doc2 has 11, 10 shared
    j = out.loc[(out.doc_a == 1) & (out.doc_b == 2), "jaccard"].iloc[0]
    assert j == pytest.approx(10 / 11)


def _random_embeddings(n=300, d=16, seed=7):
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [rng.randn(d).tolist() for _ in range(n)],
    })


def test_cosine_topk_ivf_full_probe_matches_exact(ray_session):
    import ray.data as rd
    df = _random_embeddings()
    ds = rd.from_pandas(df)
    exact = cosine_topk(ds, query_ids=[0, 1, 2], k=5)
    ds2 = rd.from_pandas(df)
    # probing every cluster degenerates to exact brute force
    approx = cosine_topk_ivf(ds2, query_ids=[0, 1, 2], k=5,
                             n_clusters=8, n_probe=8)
    pd.testing.assert_frame_equal(exact.reset_index(drop=True),
                                  approx.reset_index(drop=True))


def test_cosine_topk_ivf_partial_probe_recall(ray_session):
    import ray.data as rd
    df = _random_embeddings()
    exact = cosine_topk(rd.from_pandas(df), query_ids=[0, 1, 2], k=10)
    approx = cosine_topk_ivf(rd.from_pandas(df), query_ids=[0, 1, 2], k=10,
                             n_clusters=8, n_probe=4)
    # recall@10 of the approximate index should be well above chance
    recalls = []
    for q in (0, 1, 2):
        e = set(exact.loc[exact.query_id == q, "neighbor_id"])
        a = set(approx.loc[approx.query_id == q, "neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert sum(recalls) / len(recalls) >= 0.5


def test_bmp_decode_roundtrip():
    from sift_ray.functions.multimodal import BmpDecodeStage, make_bmp
    m = BmpDecodeStage.decode(make_bmp(10, 7, rgb=(200, 100, 50)))
    assert m["status"] == "ok"
    assert (m["width"], m["height"], m["bit_depth"]) == (10, 7, 24)
    assert (m["mean_r"], m["mean_g"], m["mean_b"]) == (200.0, 100.0, 50.0)


def test_bmp_decode_quarantines():
    from sift_ray.functions.multimodal import BmpDecodeStage, make_bmp
    assert BmpDecodeStage.decode(b"GIF89a...")["status"] == "not_bmp"
    assert BmpDecodeStage.decode(make_bmp(4, 4)[:30])["status"] == "not_bmp"
    truncated = make_bmp(100, 100)[:200]
    assert BmpDecodeStage.decode(truncated)["status"] == "truncated"


def test_bmp_decode_stage_over_dataset(ray_session):
    import ray.data as rd
    from sift_ray.functions.multimodal import decode_bmps, make_bmp
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "payload": [make_bmp(8, 8, (10, 20, 30)), b"junk", make_bmp(3, 2)],
    })
    out = decode_bmps(rd.from_pandas(df)).to_pandas().set_index("doc_id")
    assert out.loc[1, "status"] == "ok" and out.loc[1, "width"] == 8
    assert out.loc[2, "status"] == "not_bmp"
    assert out.loc[3, "status"] == "ok" and out.loc[3, "mean_r"] == 255.0


def test_ngram_jaccard_custom_id_col(ray_session):
    import ray.data as rd
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = pd.DataFrame({"page_id": [7, 9],
                         "text": [base, base + " tail"]})
    out = ngram_jaccard_pairs(rd.from_pandas(docs), k=3, threshold=0.5,
                              id_col="page_id").to_pandas()
    assert set(zip(out["doc_a"], out["doc_b"])) == {(7, 9)}
