"""Distributed hashed-feature logistic regression: learning behavior,
bit-exact partition invariance, and an exact local numpy replica."""

import numpy as np
import pandas as pd
import pytest


def _spam_corpus(n=300, seed=13):
    """label 1 docs contain 'zgreatcontentz'; label 0 contain
    'zboilerplatez'. Shared filler words in both classes."""
    rng = np.random.RandomState(seed)
    filler = ["the", "quick", "brown", "fox", "lazy", "dog", "jumps",
              "over", "page", "site", "words", "click"]
    rows = []
    for i in range(n):
        y = i % 2
        words = list(rng.choice(filler, rng.randint(5, 15)))
        words.insert(rng.randint(len(words)),
                     "zgreatcontentz" if y else "zboilerplatez")
        rows.append((i, " ".join(words), y))
    return pd.DataFrame(rows, columns=["doc_id", "text", "label"])


def _local_replica(df, hash_bits, n_iter, lr, l2):
    """The exact same algorithm, single-process numpy."""
    from sift_ray.functions.corpus import _hash_word_array
    import re
    d = 1 << hash_bits
    mask, bias = d - 1, d
    feats = []
    for t in df["text"]:
        ws = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        ids = np.unique((_hash_word_array(ws) & np.uint64(mask))
                        .astype(np.int64)) if ws else np.array([], np.int64)
        feats.append(ids)
    y = df["label"].to_numpy()
    n = len(df)
    w = np.zeros(d + 1)
    for _ in range(n_iter):
        g = np.zeros(d + 1)
        gi = np.zeros(d + 1, dtype=np.int64)
        for ids, yi in zip(feats, y):
            p = 1.0 / (1.0 + np.exp(-(w[ids].sum() + w[bias])))
            r = np.int64(round((p - yi) * 1e6))
            gi[ids] += r
            gi[bias] += r
        g = gi / 1e6 / n
        w = w - lr * (g + l2 * w)
    return w


def test_logreg_learns_and_matches_replica(ray_session):
    import ray.data as rd
    from sift_ray.functions.classifier import logreg_fit, logreg_predict
    df = _spam_corpus()
    weights, model = logreg_fit(rd.from_pandas(df).repartition(4),
                                hash_bits=12, n_iter=6)
    ref = _local_replica(df, hash_bits=12, n_iter=6, lr=2.0, l2=1e-4)
    assert np.array_equal(model["w"], ref), "distributed != local replica"

    # loss decreases and the model separates the classes
    assert model["loss_micro"][-1] < model["loss_micro"][0]
    scores = logreg_predict(rd.from_pandas(df), model).to_pandas()
    merged = scores.merge(df[["doc_id", "label"]], on="doc_id")
    pred = (merged["score_micro"] > 500_000).astype(int)
    acc = (pred == merged["label"]).mean()
    assert acc > 0.95, f"accuracy {acc}"

    # weights_ds mirrors the dense vector
    wdf = weights.to_pandas()
    assert np.array_equal(np.sort(wdf["feature"].to_numpy()),
                          np.flatnonzero(model["w"]))


def test_logreg_partition_invariant_bitexact(ray_session):
    import ray.data as rd
    from sift_ray.functions.classifier import logreg_fit
    df = _spam_corpus(n=120, seed=3)
    _, m1 = logreg_fit(rd.from_pandas(df).repartition(1),
                       hash_bits=10, n_iter=4, num_parts=2)
    _, m2 = logreg_fit(rd.from_pandas(df).repartition(11),
                       hash_bits=10, n_iter=4, num_parts=7)
    assert np.array_equal(m1["w"], m2["w"])
    assert m1["loss_micro"] == m2["loss_micro"]


def test_logreg_empty_raises(ray_session):
    import ray.data as rd
    import pyarrow as pa
    from sift_ray.functions.classifier import logreg_fit
    empty = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "label": pa.array([], pa.int64())}))
    with pytest.raises(ValueError):
        logreg_fit(empty, n_iter=1)


def test_logreg_dense_and_sparse_gradient_paths_identical(ray_session,
                                                          monkeypatch):
    """The dense driver-fold path and the sparse exchange path must train
    BIT-IDENTICAL weights (integer gradient sums are order-free)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    import sift_ray.functions.classifier as clf

    rng = np.random.RandomState(3)
    texts = [" ".join(rng.choice(["good", "fine", "bad", "ugly", "meh"],
                                 size=8)) for _ in range(60)]
    labels = [1 if "good" in t else 0 for t in texts]
    df = pd.DataFrame({"doc_id": range(60), "text": texts,
                       "label": labels})

    _, m_dense = clf.logreg_fit(rd.from_pandas(df), hash_bits=8, n_iter=3)
    monkeypatch.setattr(clf, "_DENSE_GRAD_LIMIT", 0)
    _, m_sparse = clf.logreg_fit(rd.from_pandas(df).repartition(4),
                                 hash_bits=8, n_iter=3)
    assert m_dense["loss_micro"] == m_sparse["loss_micro"]
    np.testing.assert_array_equal(m_dense["w"], m_sparse["w"])
