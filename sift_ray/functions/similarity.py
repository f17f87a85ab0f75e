"""Similarity search over an embedding column (list<float>).

* ``cosine_topk`` — brute-force exact baseline: the (small) query matrix is
  broadcast once with ``ray.put``; every batch computes a float64 matmul
  against it and emits only its per-batch top-k candidates, which the driver
  merges (bounded: n_batches x k x n_queries rows). No shuffle.
* ``lsh_topk`` — the scale path: random-hyperplane LSH bucketing; queries
  probe matching buckets only. Approximate; documented partitioning
  assumption: vectors co-located by bucket id via groupby.
* ``embedding_near_dup`` — pairs with cosine >= threshold, via the same LSH
  buckets (or exact for small n).
"""

from __future__ import annotations

import hashlib
from typing import List, Optional

import numpy as np
import pyarrow as pa


def _to_matrix(col) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix."""
    arr = col.combine_chunks() if hasattr(col, "combine_chunks") else col
    lists = arr.to_pylist()
    return np.asarray(lists, dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceTopK:
    """Per-batch exact top-k against a broadcast query matrix."""

    def __init__(self, queries_ref, k: int,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
        import ray
        q = ray.get(queries_ref)  # fetched once per actor
        self.q_ids = q["ids"]
        self.q_mat = _normalize(np.asarray(q["matrix"], dtype=np.float64))
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_col).to_pylist(), dtype=np.int64)
        mat = _normalize(_to_matrix(batch.column(self.vec_col)))
        sims = self.q_mat @ mat.T  # (n_queries, n_batch)
        out_q, out_n, out_c = [], [], []
        k = min(self.k + 1, sims.shape[1])
        for qi, q_id in enumerate(self.q_ids):
            row = sims[qi]
            top = np.argpartition(-row, k - 1)[:k] if k < len(row) else np.arange(len(row))
            for t in top:
                if ids[t] == q_id:
                    continue
                out_q.append(q_id)
                out_n.append(int(ids[t]))
                out_c.append(float(row[t]))
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "cos": pa.array(out_c, pa.float64()),
        })


def cosine_topk(ds, query_ids: List[int], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id",
                concurrency: int = 2):
    """Exact top-k cosine neighbors for the given query vector ids.

    Returns a pandas DataFrame (query_id, neighbor_id, rank) — small result.
    """
    import pandas as pd
    import ray

    qset = set(query_ids)
    q_rows = {"ids": [], "matrix": []}
    for batch in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for vid, emb in zip(batch.column(id_col).to_pylist(),
                            batch.column(vec_col).to_pylist()):
            if vid in qset:
                q_rows["ids"].append(vid)
                q_rows["matrix"].append(emb)
    order = np.argsort(q_rows["ids"])
    q_rows = {"ids": [q_rows["ids"][i] for i in order],
              "matrix": [q_rows["matrix"][i] for i in order]}
    ref = ray.put(q_rows)

    candidates = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={"queries_ref": ref, "k": k,
                               "vec_col": vec_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency).to_pandas()
    # merge per-batch candidates -> global top-k (deterministic tiebreak)
    candidates = candidates.sort_values(
        ["query_id", "cos", "neighbor_id"],
        ascending=[True, False, True])
    top = candidates.groupby("query_id").head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "neighbor_id", "rank"]].reset_index(drop=True)


class LshBucketStage:
    """Random-hyperplane LSH: bucket id per vector (once-per-actor planes)."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 42,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
        rng = np.random.RandomState(seed)
        self.planes = rng.randn(n_planes, dim)
        self.vec_col = vec_col
        self.id_col = id_col

    def bucket_of(self, mat: np.ndarray) -> np.ndarray:
        signs = (mat @ self.planes.T) > 0
        return (signs * (1 << np.arange(signs.shape[1]))).sum(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _to_matrix(batch.column(self.vec_col))
        buckets = self.bucket_of(mat)
        return pa.table({
            "vec_id": batch.column(self.id_col),
            "bucket": pa.array(buckets.astype(np.int64), pa.int64()),
            "embedding": batch.column(self.vec_col),
        })


def _near_dup_group(threshold: float):
    import pandas as pd

    def fn(group: pd.DataFrame) -> pd.DataFrame:
        out = []
        if 2 <= len(group) <= 2000:
            ids = group["vec_id"].to_numpy()
            mat = _normalize(np.asarray(list(group["embedding"]),
                                        dtype=np.float64))
            sims = mat @ mat.T
            n = len(ids)
            order = np.argsort(ids)
            for ii in range(n):
                for jj in range(ii + 1, n):
                    a, b = order[ii], order[jj]
                    if sims[a, b] >= threshold:
                        out.append((int(ids[a]), int(ids[b])))
        return pd.DataFrame(out, columns=["vec_a", "vec_b"]).astype(
            {"vec_a": "int64", "vec_b": "int64"})
    return fn


def embedding_near_dup(ds, threshold: float = 0.95, n_planes: int = 8,
                       dim: int = 64, concurrency: int = 2):
    """Near-duplicate vector pairs (cosine >= threshold) via LSH buckets.
    Approximate at scale (bucket-local comparisons); with few planes and
    small n it approaches exact."""
    bucketed = ds.map_batches(
        LshBucketStage,
        fn_constructor_kwargs={"dim": dim, "n_planes": n_planes},
        batch_format="pyarrow", concurrency=concurrency)
    return (bucketed.groupby("bucket")
            .map_groups(_near_dup_group(threshold), batch_format="pandas"))


def _kmeans(sample: np.ndarray, n_clusters: int, n_iter: int = 10,
            seed: int = 42) -> np.ndarray:
    """Small deterministic k-means (cosine space: inputs pre-normalized)."""
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)),
                     replace=False)
    centroids = sample[idx].copy()
    for _ in range(n_iter):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


class IvfScanStage:
    """Per-batch IVF probe: score queries only against vectors whose coarse
    cluster is in that query's probe list. Centroids + queries broadcast via
    ``ray.put``, fetched once per actor."""

    def __init__(self, state_ref, k: int, vec_col: str = "embedding",
                 id_col: str = "vec_id"):
        import ray
        st = ray.get(state_ref)
        self.centroids = st["centroids"]            # (C, d) normalized
        self.q_ids = st["q_ids"]
        self.q_mat = st["q_mat"]                    # (Q, d) normalized
        self.probe = st["probe"]                    # (Q, n_probe) cluster ids
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_col).to_pylist(), dtype=np.int64)
        mat = _normalize(_to_matrix(batch.column(self.vec_col)))
        assign = np.argmax(mat @ self.centroids.T, axis=1)  # coarse cluster
        out_q, out_n, out_c = [], [], []
        for qi, q_id in enumerate(self.q_ids):
            mask = np.isin(assign, self.probe[qi])
            mask &= ids != q_id
            if not mask.any():
                continue
            sims = mat[mask] @ self.q_mat[qi]
            cand_ids = ids[mask]
            k = min(self.k, len(sims))
            top = (np.argpartition(-sims, k - 1)[:k]
                   if k < len(sims) else np.arange(len(sims)))
            for t in top:
                out_q.append(q_id)
                out_n.append(int(cand_ids[t]))
                out_c.append(float(sims[t]))
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "cos": pa.array(out_c, pa.float64()),
        })


def cosine_topk_ivf(ds, query_ids: List[int], k: int = 10,
                    n_clusters: int = 16, n_probe: int = 4,
                    train_sample: int = 4096, seed: int = 42,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    concurrency: int = 2):
    """Approximate top-k via an IVF coarse quantizer — the scale path.

    Train k-means on a bounded sample (driver-side; at 10^12 rows the sample
    still fits — IVF training cost is O(sample), not O(n)), broadcast
    centroids + per-query probe lists once, then one map_batches pass scans
    only probed clusters. Recall depends on n_probe/n_clusters; with
    n_probe == n_clusters it degenerates to exact brute force.
    """
    import pandas as pd
    import ray

    sample_rows: List[list] = []
    q_rows = {}
    qset = set(query_ids)
    for batch in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        vids = batch.column(id_col).to_pylist()
        embs = batch.column(vec_col).to_pylist()
        for vid, emb in zip(vids, embs):
            if len(sample_rows) < train_sample:
                sample_rows.append(emb)
            if vid in qset:
                q_rows[vid] = emb
        if len(sample_rows) >= train_sample and len(q_rows) == len(qset):
            break
    sample = _normalize(np.asarray(sample_rows, dtype=np.float64))
    centroids = _kmeans(sample, n_clusters, seed=seed)
    q_ids = sorted(q_rows)
    q_mat = _normalize(np.asarray([q_rows[i] for i in q_ids],
                                  dtype=np.float64))
    probe = np.argsort(-(q_mat @ centroids.T), axis=1)[:, :n_probe]
    ref = ray.put({"centroids": centroids, "q_ids": q_ids, "q_mat": q_mat,
                   "probe": probe})

    candidates = ds.map_batches(
        IvfScanStage,
        fn_constructor_kwargs={"state_ref": ref, "k": k, "vec_col": vec_col,
                               "id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency).to_pandas()
    candidates = candidates.sort_values(
        ["query_id", "cos", "neighbor_id"], ascending=[True, False, True])
    top = candidates.groupby("query_id").head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "neighbor_id", "rank"]].reset_index(drop=True)


def embedding_near_dup_exact(ds, threshold: float = 0.95,
                             vec_col: str = "embedding",
                             id_col: str = "vec_id"):
    """Exact O(n^2) near-dup pairs — baseline for SMALL tables and the
    DuckDB oracle comparison. Computes in float64 on the driver."""
    import pandas as pd
    ids: List[int] = []
    vecs: List[list] = []
    for batch in ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        ids.extend(batch.column(id_col).to_pylist())
        vecs.extend(batch.column(vec_col).to_pylist())
    order = np.argsort(ids)
    ids_arr = np.asarray(ids, dtype=np.int64)[order]
    mat = _normalize(np.asarray(vecs, dtype=np.float64)[order])
    sims = mat @ mat.T
    out = []
    n = len(ids_arr)
    for i in range(n):
        for j in range(i + 1, n):
            if sims[i, j] >= threshold:
                out.append((int(ids_arr[i]), int(ids_arr[j])))
    return pd.DataFrame(out, columns=["vec_a", "vec_b"]).astype(
        {"vec_a": "int64", "vec_b": "int64"})
