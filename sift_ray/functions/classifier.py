"""Distributed linear quality classifier: hashed bag-of-words logistic
regression trained by full-batch gradient descent over the whole corpus
— the fastText-style quality/language filter trainer of a web-scale
training-data pipeline (CCNet's LM filter, GPT-3's WebText classifier,
RefinedWeb's quality gates are all this shape).

Determinism (the repo-wide convention): every cross-row reduction is an
INTEGER sum. Per document, the residual ``sigmoid(w.x) - y`` and the
log-loss are quantized to int64 micros BEFORE summation; per-feature
gradients are integer sums of those micros (binary presence features, so
a feature's gradient is the sum of residuals of the documents containing
it). Integer addition is order-free, so the trained weights are
bit-identical under any partitioning, block layout, or engine — pinned
by a repartition-invariance test and an exact local numpy replica.

Scale shape:
- Feature extraction runs ONCE and materializes a (doc, features,
  label) table (features = unique hashed token ids, list<int32>) —
  iterations must not re-tokenize the corpus (lineage truncation, the
  pagerank lesson).
- Each iteration: ONE corpus map pass computes per-batch dense int64
  gradient partials (d+1 values per batch regardless of rows), ONE
  feature-keyed exchange folds them, and the driver applies the update
  to its (d+1)-float weight vector (d = 2^hash_bits, typically 64Ki —
  kilobytes of driver state). Weights broadcast per iteration via
  ``ray.put``.

No reference analog (sift has no cross-document or learned components,
SURVEY.md §2.8).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

# gradient-reduction gate: feature dims up to this use dense per-batch
# partials + a driver fold (no exchange); larger hash spaces stay sparse
_DENSE_GRAD_LIMIT = 1 << 20


def _doc_features(batch: pa.Table, text_col: str, id_col: str,
                  label_col: str, mask: int) -> pa.Table:
    """(doc_id, label, features list<int32>) — unique hashed token ids
    per document; tokens are lowercase alnum runs."""
    import pyarrow.compute as pc

    from .corpus import _hash_word_array

    low = pc.utf8_lower(pc.coalesce(batch.column(text_col), ""))
    words = pc.split_pattern_regex(low, "[^a-z0-9]+")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = pc.list_flatten(words)
    parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat, parent = flat.filter(pa.array(keep)), parent[keep]
    n_rows = batch.num_rows
    feats = [[] for _ in range(n_rows)]
    if len(parent):
        h = (_hash_word_array(flat) & np.uint64(mask)).astype(np.int32)
        # unique (doc, feature) pairs, sorted per doc for determinism
        pairs = np.unique(np.stack([parent.astype(np.int64),
                                    h.astype(np.int64)], axis=1), axis=0)
        split = np.searchsorted(pairs[:, 0], np.arange(n_rows + 1))
        feats = [pairs[split[i]:split[i + 1], 1].astype(np.int32).tolist()
                 for i in range(n_rows)]
    return pa.table({
        "doc_id": batch.column(id_col),
        "label": pa.array(
            batch.column(label_col).to_numpy(zero_copy_only=False)
            .astype(np.int8), pa.int8()),
        "features": pa.array(feats, pa.list_(pa.int32()))})


def _flatten_features(t: pa.Table):
    """features list column -> (flat int64 ids, parent row indices)."""
    import pyarrow.compute as pc
    col = t.column("features")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(
        np.int64)
    parent = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
    return flat, parent


def logreg_fit(ds, text_col: str = "text", label_col: str = "label",
               id_col: str = "doc_id", hash_bits: int = 16,
               n_iter: int = 8, lr: float = 2.0, l2: float = 1e-4,
               num_parts: Optional[int] = None):
    """Train the classifier; returns ``(weights_ds, model)`` where
    ``weights_ds`` has one row per nonzero weight (feature, weight; the
    bias is feature == 2^hash_bits) and ``model`` carries the dense
    weight vector plus the per-iteration integer loss trace
    (``loss_micro`` = sum of per-doc round(-log p * 1e6) — exactly
    reproducible) for :func:`logreg_predict`."""
    import ray
    import ray.data as rd

    from .shuffle import TaskStage, partitioned_group_agg

    d = 1 << hash_bits
    mask = d - 1
    bias = d

    feats = ds.map_batches(
        lambda b: _doc_features(b, text_col, id_col, label_col, mask),
        batch_format="pyarrow").materialize()
    n_docs = feats.count()
    if n_docs == 0:
        raise ValueError("logreg_fit: empty input")

    w = np.zeros(d + 1, dtype=np.float64)
    losses = []
    # gradient reduction is size-gated on the feature dimension: up to
    # ``dense_limit`` slots each batch emits ONE dense int64 partial
    # (d+2 ints = 0.5 MB at 2^16) and the driver np-sums batch partials —
    # no exchange at all, 8 exchanges saved per fit. Above the gate
    # (huge hash spaces) partials stay sparse and ride the feature-keyed
    # exchange. Integer sums are order-free either way, so trained
    # weights stay bit-identical across paths and partitionings.
    dense = (d + 2) <= _DENSE_GRAD_LIMIT

    for _ in range(n_iter):
        w_ref = ray.put(w.copy())

        class GradStage:
            def __init__(self, ref):
                self.w = ray.get(ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                if t.num_rows == 0:
                    if dense:
                        return pa.table({"gv": pa.array([], pa.binary())})
                    return pa.table({"j": pa.array([], pa.int64()),
                                     "g": pa.array([], pa.int64())})
                flat, parent = _flatten_features(t)
                y = t.column("label").to_numpy(zero_copy_only=False)
                dots = np.bincount(parent, weights=self.w[flat],
                                   minlength=t.num_rows) + self.w[bias]
                p = 1.0 / (1.0 + np.exp(-dots))
                resid = np.round((p - y) * 1e6).astype(np.int64)
                # per-doc log-loss in micros (clipped away from 0/1)
                pc_ = np.clip(p, 1e-12, 1 - 1e-12)
                loss = np.round(-(y * np.log(pc_) + (1 - y)
                                  * np.log1p(-pc_)) * 1e6).astype(np.int64)
                g = np.bincount(flat, weights=resid[parent],
                                minlength=d).astype(np.int64)
                if dense:
                    full = np.concatenate(
                        [g, [resid.sum(), loss.sum()]]).astype(np.int64)
                    return pa.table({"gv": pa.array([full.tobytes()],
                                                    pa.binary())})
                nz = np.flatnonzero(g)
                js = np.concatenate([nz, [bias, bias + 1]])
                gs = np.concatenate([g[nz], [resid.sum(), loss.sum()]])
                return pa.table({"j": pa.array(js, pa.int64()),
                                 "g": pa.array(gs, pa.int64())})

        rows = feats.map_batches(TaskStage(GradStage, ref=w_ref),
                                 batch_format="pyarrow")
        g = np.zeros(d + 2, dtype=np.float64)
        if dense:
            acc = np.zeros(d + 2, dtype=np.int64)
            for batch in rows.iter_batches(batch_size=None,
                                           batch_format="pyarrow"):
                for blob in batch.column("gv").to_pylist():
                    acc += np.frombuffer(blob, dtype=np.int64)
            g[:] = acc.astype(np.float64)
        else:
            agg = partitioned_group_agg(rows, ["j"], [("g", "sum", "g")],
                                        num_parts=num_parts).to_pandas()
            g[agg["j"].to_numpy()] = agg["g"].to_numpy().astype(np.float64)
        losses.append(int(g[bias + 1]))
        grad = g[:bias + 1] / 1e6 / n_docs
        w = w - lr * (grad + l2 * w)

    nz = np.flatnonzero(w)
    weights = rd.from_arrow(pa.table({
        "feature": pa.array(nz, pa.int64()),
        "weight": pa.array(w[nz], pa.float64())}))
    model = {"w": w, "hash_bits": hash_bits, "loss_micro": losses}
    return weights, model


def logreg_predict(ds, model: dict, text_col: str = "text",
                   id_col: str = "doc_id", label_col: Optional[str] = None):
    """Score documents with a fitted model: zero-shuffle map pass; the
    weight vector rides ``ray.put`` once. Emits (doc_id, score_micro =
    round(sigmoid * 1e6) — integer, engine-reproducible)."""
    import ray

    from .shuffle import TaskStage

    d = 1 << model["hash_bits"]
    mask, bias = d - 1, d
    w_ref = ray.put(np.asarray(model["w"], dtype=np.float64))

    class ScoreStage:
        def __init__(self, ref):
            self.w = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            tmp = pa.table({
                id_col: t.column(id_col),
                "label": pa.array(np.zeros(t.num_rows, np.int8),
                                  pa.int8()),
                text_col: t.column(text_col)})
            f = _doc_features(tmp, text_col, id_col, "label", mask)
            flat, parent = _flatten_features(f)
            dots = np.bincount(parent, weights=self.w[flat],
                               minlength=t.num_rows) + self.w[bias]
            p = 1.0 / (1.0 + np.exp(-dots))
            return pa.table({
                id_col: t.column(id_col),
                "score_micro": pa.array(np.round(p * 1e6).astype(np.int64),
                                        pa.int64())})

    return ds.map_batches(TaskStage(ScoreStage, ref=w_ref),
                          batch_format="pyarrow")
