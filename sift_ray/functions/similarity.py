"""Similarity search over an embedding column (list<float>).

* ``cosine_topk`` — brute-force exact baseline: the (small) query matrix is
  broadcast once with ``ray.put``; every batch computes a float64 matmul
  against it and emits only its per-batch top-k candidates, which the driver
  merges (bounded: n_batches x k x n_queries rows). No shuffle.
* ``cosine_topk_ivf`` — the scale path: IVF coarse quantizer trained on a
  bounded sample; queries probe matching clusters only.
* ``embedding_near_dup`` — pairs with cosine >= threshold via multi-table
  random-hyperplane LSH (bucket groupby + bucket-local exact check +
  distributed pair dedupe); ``embedding_near_dup_exact`` is the O(n^2)
  small-table baseline.

Query-vector / sample lookups are pushed down (map-side ``pc.is_in`` filter
+ take, ``limit()`` for samples) — the driver never scans the dataset.
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


class KnnJoinStage:
    """Per-batch exact k-NN against a TILED right side with a running
    top-k merge per left row, so worker memory is (batch x k) + one tile
    regardless of right-side size. Two tile sources, same inner loop:

    * ``right_ref`` — one broadcast dict (small right sides): scanned in
      ``tile_rows`` slices of the in-memory matrix.
    * ``tile_refs`` — the right Dataset's own materialized block refs
      (corpus-scale): each tile is ``ray.get``-fetched per use — a
      zero-copy shared-memory read once the block is node-local, the
      object store owns placement/spill, and NO single process ever
      holds the full right side."""

    def __init__(self, right_ref=None, tile_refs=None, k: int = 3,
                 tile_rows: int = 65536,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
        import ray
        self.k = k
        self.tile_rows = tile_rows
        self.vec_col = vec_col
        self.id_col = id_col
        self.tile_refs = tile_refs
        if tile_refs is None:
            r = ray.get(right_ref)  # fetched once per worker process
            self.r_ids = np.asarray(r["ids"], dtype=np.int64)
            self.r_mat = _normalize(np.asarray(r["matrix"],
                                               dtype=np.float64))

    def _iter_tiles(self):
        """Yield (ids, unit matrix) tiles from either source."""
        if self.tile_refs is None:
            for lo in range(0, len(self.r_ids), self.tile_rows):
                yield (self.r_ids[lo:lo + self.tile_rows],
                       self.r_mat[lo:lo + self.tile_rows])
            return
        import ray
        for ref in self.tile_refs:
            t = ray.get(ref)  # node-local shared memory after first fetch
            if t.num_rows == 0:
                continue
            # vectors were unit-normalized by the distributed prep stage
            yield (t.column(self.id_col).to_numpy(zero_copy_only=False)
                   .astype(np.int64),
                   _to_matrix(t.column(self.vec_col)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_col).to_pylist(),
                         dtype=np.int64)
        mat = _normalize(_to_matrix(batch.column(self.vec_col)))
        n = len(ids)
        keep = self.k + 1  # +1 so dropping self still leaves k
        best_s = np.full((n, 0), -np.inf)
        best_i = np.zeros((n, 0), dtype=np.int64)
        for t_ids, tile in self._iter_tiles():
            sims = mat @ tile.T  # (n, tile)
            cand_s = np.concatenate([best_s, sims], axis=1)
            cand_i = np.concatenate(
                [best_i, np.broadcast_to(t_ids, (n, sims.shape[1]))],
                axis=1)
            if cand_s.shape[1] > keep:
                part = np.argpartition(-cand_s, keep - 1, axis=1)[:, :keep]
                rows = np.arange(n)[:, None]
                best_s = cand_s[rows, part]
                best_i = cand_i[rows, part]
            else:
                best_s, best_i = cand_s, cand_i
        out_q, out_n, out_r = [], [], []
        for row in range(n):
            order = np.lexsort((best_i[row], -best_s[row]))
            rank = 0
            for j in order:
                if best_i[row][j] == ids[row]:
                    continue
                rank += 1
                if rank > self.k:
                    break
                out_q.append(int(ids[row]))
                out_n.append(int(best_i[row][j]))
                out_r.append(rank)
        return pa.table({
            "vec_id": pa.array(out_q, pa.int64()),
            "nn_id": pa.array(out_n, pa.int64()),
            "rank": pa.array(out_r, pa.int64()),
        })


def knn_join(ds, k: int = 3, vec_col: str = "embedding",
             id_col: str = "vec_id", concurrency=None,
             broadcast_bytes: int = 256 * 1024 * 1024,
             tile_rows: int = 65536):
    """Exact k-NN SELF-join: every row joined to its k nearest neighbors
    by cosine (self excluded), rank-deterministic (cos DESC, id ASC).
    Returns (vec_id, nn_id, rank) — integer output, so the check is exact.

    Scale shape: vectors are unit-normalized DISTRIBUTED and materialized
    once; the LEFT side then streams in batches against that right side.
    Below ``broadcast_bytes`` (measured) the right side ships as one
    broadcast matrix; above it, the materialized dataset's own block refs
    become the tiles — each task ``ray.get``s one tile at a time
    (node-local zero-copy after first fetch, object-store placement and
    spill), keeping per-task memory at (batch x k) + one tile with NO
    upper bound on right-side size. Both paths run the identical running
    top-k merge kernel and are equality-tested."""
    import ray

    def prep(batch: pa.Table) -> pa.Table:
        mat = _normalize(_to_matrix(batch.column(vec_col)))
        return pa.table({
            id_col: pa.compute.cast(batch.column(id_col), pa.int64()),
            vec_col: pa.array(list(mat), pa.list_(pa.float64())),
        })

    right_norm = ds.map_batches(prep, batch_format="pyarrow").materialize()

    from .shuffle import TaskStage
    if (right_norm.size_bytes() or 0) <= broadcast_bytes:
        ids, mats = [], []
        for b in right_norm.iter_batches(batch_size=65536,
                                         batch_format="pyarrow"):
            ids.extend(b.column(id_col).to_pylist())
            mats.append(_to_matrix(b.column(vec_col)))
        right = {"ids": np.asarray(ids, dtype=np.int64),
                 "matrix": np.concatenate(mats, axis=0) if mats else
                 np.zeros((0, 1))}
        kwargs = {"right_ref": ray.put(right)}
    else:
        kwargs = {"tile_refs": tuple(right_norm.to_arrow_refs())}

    common = {"k": k, "vec_col": vec_col, "id_col": id_col,
              "tile_rows": tile_rows, **kwargs}
    if concurrency is None:
        return right_norm.map_batches(TaskStage(KnnJoinStage, **common),
                                      batch_format="pyarrow")
    return right_norm.map_batches(
        KnnJoinStage, fn_constructor_kwargs=common,
        batch_format="pyarrow", concurrency=concurrency)


def label_centroids(ds, label_col: str = "label",
                    vec_col: str = "embedding", decimals: int = 6,
                    num_parts: Optional[int] = None):
    """Per-label mean embedding (class prototypes — the seed step for IVF
    coarse quantizers and prototype classifiers): returns one row per
    (label, dim) with the centroid component, rounded to ``decimals`` so
    the result is summation-order independent (exactly comparable across
    engines).

    Scale shape: each batch folds its vectors into per-label (sum, count)
    partials — a (labels x dims)-sized table regardless of batch rows —
    then ONE label-keyed exchange combines partials with pyarrow hash-agg.
    Vector data crosses the wire only as per-batch partial sums."""
    import pyarrow.compute as pc

    from .shuffle import partitioned_group_agg

    def partials(batch: pa.Table) -> pa.Table:
        labels = np.asarray(batch.column(label_col).to_pylist(),
                            dtype=np.int64)
        mat = _to_matrix(batch.column(vec_col))
        uniq, inv = np.unique(labels, return_inverse=True)
        d = mat.shape[1] if mat.size else 0
        sums = np.zeros((len(uniq), d))
        np.add.at(sums, inv, mat)
        counts = np.bincount(inv, minlength=len(uniq))
        lab = np.repeat(uniq, d)
        dim = np.tile(np.arange(1, d + 1, dtype=np.int64), len(uniq))
        return pa.table({
            "label": pa.array(lab, pa.int64()),
            "dim": pa.array(dim, pa.int64()),
            "s": pa.array(sums.ravel(), pa.float64()),
            "n": pa.array(np.repeat(counts, d), pa.int64()),
        })

    rows = ds.map_batches(partials, batch_format="pyarrow")
    agg = partitioned_group_agg(rows, ["label", "dim"],
                                [("s", "sum", "s"), ("n", "sum", "n")],
                                num_parts=num_parts)

    def finish(t: pa.Table) -> pa.Table:
        c = pc.round(pc.divide(t.column("s"), pc.cast(t.column("n"),
                                                      pa.float64())),
                     ndigits=decimals)
        return pa.table({"label": t.column("label"),
                         "dim": t.column("dim"),
                         "centroid": c})

    return agg.map_batches(finish, batch_format="pyarrow")


def _fetch_vectors(ds, ids: List[int], vec_col: str, id_col: str):
    """Pull the (tiny) query-vector rows via a DISTRIBUTED map-side
    ``pc.is_in`` filter + take — never a full driver-side dataset scan.
    Returns (sorted ids, row-aligned list-of-vectors)."""
    import pyarrow.compute as pc

    want = pa.array(sorted(set(ids)), pa.int64())

    def filt(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column(id_col), value_set=want))

    rows = ds.map_batches(filt, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r[id_col])
    return ([r[id_col] for r in rows],
            [list(r[vec_col]) for r in rows])


def cosine_topk(ds, query_ids: List[int], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id",
                concurrency: int = 2):
    """Exact top-k cosine neighbors for the given query vector ids.

    Returns a pandas DataFrame (query_id, neighbor_id, rank) — small result.
    """
    import pandas as pd
    import ray

    q_ids, q_mat = _fetch_vectors(ds, query_ids, vec_col, id_col)
    ref = ray.put({"ids": q_ids, "matrix": q_mat})

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
    """Multi-table random-hyperplane LSH: each vector is bucketed in
    ``n_tables`` independent tables of ``n_planes`` hyperplanes each (planes
    drawn once per actor in __init__). A near-dup pair is a candidate if it
    collides in ANY table — recall 1-(1-p^b)^L vs a single table's p^b
    (p = 1 - angle/pi), the standard amplification construction.

    Scale sizing: bucket count per table is 2^n_planes, so pick
    ``n_planes ~ log2(n_vectors / target_bucket_size)``; the exploded
    output is n_tables rows per vector (id + bucket + the vector)."""

    def __init__(self, dim: int, n_planes: int = 6, n_tables: int = 8,
                 seed: int = 42, vec_col: str = "embedding",
                 id_col: str = "vec_id"):
        rng = np.random.RandomState(seed)
        self.planes = rng.randn(n_tables, n_planes, dim)
        self.n_tables = n_tables
        self.vec_col = vec_col
        self.id_col = id_col

    def bucket_of(self, mat: np.ndarray, table: int) -> np.ndarray:
        signs = (mat @ self.planes[table].T) > 0
        return (signs * (1 << np.arange(signs.shape[1]))).sum(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _to_matrix(batch.column(self.vec_col))
        ids, vecs, tables, buckets = [], [], [], []
        for t in range(self.n_tables):
            b = self.bucket_of(mat, t)
            ids.append(batch.column(self.id_col))
            vecs.append(batch.column(self.vec_col))
            tables.append(np.full(len(mat), t, dtype=np.int64))
            buckets.append(b.astype(np.int64))
        return pa.table({
            "vec_id": pa.concat_arrays(
                [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                 for c in ids]),
            "table_id": pa.array(np.concatenate(tables), pa.int64()),
            "bucket": pa.array(np.concatenate(buckets), pa.int64()),
            "embedding": pa.concat_arrays(
                [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                 for c in vecs]),
        })


def _near_dup_partition_kernel(threshold: float, max_bucket: int = 2000):
    """Partition kernel: exact bucket-local cosine pairs over every
    (table_id, bucket) run in the partition — one lexsort + one matrix
    slice per bucket, no per-group scheduling overhead."""
    def fn(tbl: pa.Table) -> pa.Table:
        tid = tbl.column("table_id").to_numpy(zero_copy_only=False)
        bkt = tbl.column("bucket").to_numpy(zero_copy_only=False)
        ids = tbl.column("vec_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((bkt, tid))
        tid = tid[order]
        bkt = bkt[order]
        ids = ids[order]
        mat = _normalize(np.asarray(
            tbl.column("embedding").to_pylist(), dtype=np.float64)[order]
            if len(order) else np.zeros((0, 1)))
        n = len(ids)
        is_start = np.ones(n, dtype=bool)
        if n > 1:
            is_start[1:] = (tid[1:] != tid[:-1]) | (bkt[1:] != bkt[:-1])
        starts = np.flatnonzero(is_start).tolist()
        starts.append(n)
        out = set()
        for bi in range(len(starts) - 1):
            s, e = starts[bi], starts[bi + 1]
            if e - s < 2 or e - s > max_bucket:  # skew cap
                continue
            sub_ids = ids[s:e]
            sims = mat[s:e] @ mat[s:e].T
            ai, bj = np.nonzero(np.triu(sims >= threshold, k=1))
            for i, j in zip(ai.tolist(), bj.tolist()):
                a, b = int(sub_ids[i]), int(sub_ids[j])
                if a != b:
                    out.add((min(a, b), max(a, b)))
        if not out:
            return pa.table({"vec_a": pa.array([], pa.int64()),
                             "vec_b": pa.array([], pa.int64())})
        arr = np.array(sorted(out), dtype=np.int64)
        return pa.table({"vec_a": pa.array(arr[:, 0], pa.int64()),
                         "vec_b": pa.array(arr[:, 1], pa.int64())})
    return fn


def embedding_near_dup(ds, threshold: float = 0.95, n_planes: int = 6,
                       n_tables: int = 8, dim: int = 64,
                       concurrency=None):
    """Near-duplicate vector pairs (cosine >= threshold) via multi-table LSH.

    Fully distributed: (table, bucket, id, vector) rows are hash-partitioned
    by bucket key and compared bucket-locally with an exact cosine check (so
    false candidates are always rejected); cross-table duplicate pairs are
    removed by the partitioned vectorized (vec_a, vec_b) groupby — no
    driver-side pass. Approximate recall 1-(1-p^n_planes)^n_tables per
    pair."""
    from .shuffle import (TaskStage, add_hash_partition, default_num_parts,
                          partitioned_group_agg)

    if concurrency is None:
        # plain tasks (per-process cached stage): LshBucketStage.__init__
        # only seeds an RNG and draws the plane matrix — see
        # shuffle.TaskStage for why a pool loses here
        bucketed = ds.map_batches(
            TaskStage(LshBucketStage, dim=dim, n_planes=n_planes,
                      n_tables=n_tables),
            batch_format="pyarrow")
    else:
        bucketed = ds.map_batches(
            LshBucketStage,
            fn_constructor_kwargs={"dim": dim, "n_planes": n_planes,
                                   "n_tables": n_tables},
            batch_format="pyarrow", concurrency=concurrency)
    parted = add_hash_partition(bucketed, ["table_id", "bucket"],
                                default_num_parts())
    pairs = (parted.groupby("part")
             .map_groups(_near_dup_partition_kernel(threshold),
                         batch_format="pyarrow"))
    deduped = partitioned_group_agg(pairs, ["vec_a", "vec_b"],
                                    [(None, "count", "_n")])
    return deduped.map_batches(lambda t: t.select(["vec_a", "vec_b"]),
                               batch_format="pyarrow")


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
                    concurrency: int = 2, train: str = "sample"):
    """Approximate top-k via an IVF coarse quantizer — the scale path.

    ``train="sample"`` (default): k-means on a bounded driver sample
    (``limit()`` streams only the blocks it needs; training cost is
    O(sample), not O(n)). ``train="full"``: the distributed fixed-point
    ``kmeans_fit`` over the WHOLE table — one partial-sum exchange per
    iteration, deterministic under any partitioning — for corpora whose
    head sample is unrepresentative. Either way centroids + per-query
    probe lists broadcast once and one map_batches pass scans only probed
    clusters. Recall depends on n_probe/n_clusters; with
    n_probe == n_clusters it degenerates to exact brute force.
    """
    import pandas as pd
    import ray

    q_ids, q_vecs = _fetch_vectors(ds, query_ids, vec_col, id_col)
    if train == "full":
        C_micro, _ = kmeans_fit(ds, n_clusters=n_clusters, n_iter=5,
                                vec_col=vec_col, id_col=id_col)
        centroids = _normalize(C_micro.astype(np.float64)
                               / float(np.int64(1) << 20))
    elif train == "sample":
        sample_rows = [list(r[vec_col])
                       for r in ds.limit(train_sample).take_all()]
        sample = _normalize(np.asarray(sample_rows, dtype=np.float64))
        centroids = _kmeans(sample, n_clusters, seed=seed)
    else:
        raise ValueError(f"unknown train mode: {train}")
    q_mat = _normalize(np.asarray(q_vecs, dtype=np.float64))
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
    ai, bj = np.nonzero(np.triu(sims >= threshold, k=1))
    return pd.DataFrame({"vec_a": ids_arr[ai], "vec_b": ids_arr[bj]}).astype(
        {"vec_a": "int64", "vec_b": "int64"})


def embedding_quantize(ds, vec_col: str = "embedding",
                       id_col: str = "vec_id"):
    """Int8 scalar quantization of an embedding column — the 4x storage /
    bandwidth reduction applied before ANN indexing at corpus scale.

    Pass 1 (tree aggregate): per-batch per-dimension min/max -> one
    row per batch -> driver folds n_blocks rows into the global per-dim
    range (driver volume O(blocks x dim) floats, never corpus rows).
    Pass 2 (zero-shuffle map): q = round((v - lo) / (hi - lo) * 255) -
    128, clipped to int8; constant dims quantize to -128.

    Returns (id_col, q: list<int8>, plus broadcastable ``lo``/``scale``
    attached as module-level floats per call via the returned dataset's
    companion dict) — reconstruction v' = lo + (q + 128) * (hi - lo)/255,
    max abs error (hi - lo)/510 per dim. Deterministic."""
    import ray

    def ranges(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"lo": pa.array([], pa.list_(pa.float64())),
                             "hi": pa.array([], pa.list_(pa.float64()))})
        m = _to_matrix(t.column(vec_col))
        return pa.table({
            "lo": pa.array([m.min(axis=0).astype(np.float64).tolist()]),
            "hi": pa.array([m.max(axis=0).astype(np.float64).tolist()]),
        })

    rows = ds.map_batches(ranges, batch_format="pyarrow").to_pandas()
    lo = np.min(np.stack(rows["lo"].to_numpy()), axis=0)
    hi = np.max(np.stack(rows["hi"].to_numpy()), axis=0)
    span = np.where(hi > lo, hi - lo, 1.0)
    ref = ray.put({"lo": lo, "span": span})

    class QuantStage:
        def __init__(self, state_ref):
            st = ray.get(state_ref)
            self.lo, self.span = st["lo"], st["span"]

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "q": pa.array([], pa.list_(pa.int8()))})
            m = _to_matrix(t.column(vec_col)).astype(np.float64)
            q = np.clip(np.round((m - self.lo) / self.span * 255.0) - 128,
                        -128, 127).astype(np.int8)
            return pa.table({id_col: t.column(id_col),
                             "q": pa.array(list(q), pa.list_(pa.int8()))})

    from .shuffle import TaskStage
    out = ds.map_batches(TaskStage(QuantStage, state_ref=ref),
                         batch_format="pyarrow")
    return out, {"lo": lo, "span": span}


# partial-reduction gate for kmeans_fit: k*(d+2) partial slots at or
# below this ship dense per-batch blobs folded on the driver
_DENSE_KMEANS_LIMIT = 1 << 20


def kmeans_fit(ds, n_clusters: int = 8, n_iter: int = 5,
               vec_col: str = "embedding", id_col: str = "vec_id",
               num_parts: Optional[int] = None, scale_bits: int = 20):
    """Distributed Lloyd's k-means over the FULL embedding table (unlike
    ``_kmeans``, which trains IVF on a bounded driver sample) — in exact
    fixed-point integer arithmetic, so the result is bit-identical under
    any partitioning, block layout, or engine.

    Determinism: vectors quantize to int64 micros (``round(x * 2^scale_bits)``
    — per-row, layout-free); assignment minimizes the INTEGER squared
    distance (ties -> lowest cluster id); centroid update is integer
    ``sums // counts``. No float enters any cross-row reduction.

    Scale shape per iteration: one corpus pass folds per-batch per-cluster
    (sum, count, inertia) partials — a (k x d)-sized table per batch — then
    ONE (cluster, dim)-keyed exchange combines them (label_centroids'
    shape); the driver holds k x d ints only. Init = the k smallest-id
    vectors (deterministic; ids found with a per-batch top-k combiner).

    Overflow bound: per-row d2 <= d * 2^(2*scale_bits+2); inertia partials
    are emitted as d2 >> 10 (milli-ish units), good to ~10^12 unit-norm
    rows at d=64 before int64 saturates.

    Returns (centroids int64 micros (k, d), stats Dataset with one row per
    cluster: cluster, size, inertia_q — the LAST assignment pass's stats).
    """
    import pandas as pd
    import ray.data as rd

    from .shuffle import partitioned_group_agg

    S = np.int64(1) << scale_bits

    # ---- deterministic init: the k smallest-id vectors --------------
    def local_min_ids(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        keep = np.sort(ids)[:n_clusters]
        return pa.table({id_col: pa.array(keep, pa.int64())})

    cand = (ds.map_batches(local_min_ids, batch_format="pyarrow")
            .to_pandas()[id_col].nsmallest(n_clusters).tolist())
    _, seed_vecs = _fetch_vectors(ds, cand, vec_col, id_col)
    C = np.round(np.asarray(seed_vecs, dtype=np.float64) * S) \
        .astype(np.int64)                                  # (k, d) micros
    k, d = C.shape

    # partial-reduction gate (repo convention, same as logreg_fit): the
    # per-batch partial is k*(d+2) ints regardless of rows, so up to the
    # gate each batch ships ONE dense int64 blob and the driver np-sums —
    # no exchange per iteration. Above the gate (huge k*d) partials stay
    # sparse rows on the (cluster, dim)-keyed exchange. Integer sums are
    # order-free, so both paths produce bit-identical centroids (pinned
    # by a forced-path equality test).
    dense = k * (d + 2) <= _DENSE_KMEANS_LIMIT

    def make_partials(C_now: np.ndarray):
        def partials(batch: pa.Table) -> pa.Table:
            mat = _to_matrix(batch.column(vec_col))
            if mat.size == 0:
                if dense:
                    return pa.table({"pv": pa.array([], pa.binary())})
                return pa.table({"cluster": pa.array([], pa.int64()),
                                 "dim": pa.array([], pa.int64()),
                                 "s": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64()),
                                 "iq": pa.array([], pa.int64())})
            xq = np.round(mat.astype(np.float64) * S).astype(np.int64)
            n = xq.shape[0]
            d2 = np.empty((n, k), dtype=np.int64)
            for c in range(k):
                diff = xq - C_now[c]
                d2[:, c] = np.einsum("ij,ij->i", diff, diff)
            assign = np.argmin(d2, axis=1)          # tie -> lowest id
            best = d2[np.arange(n), assign] >> 10
            sums = np.zeros((k, d), dtype=np.int64)
            np.add.at(sums, assign, xq)
            counts = np.bincount(assign, minlength=k).astype(np.int64)
            iq = np.zeros(k, dtype=np.int64)
            np.add.at(iq, assign, best)
            if dense:
                blob = np.concatenate(
                    [sums.ravel(), counts, iq]).astype(np.int64).tobytes()
                return pa.table({"pv": pa.array([blob], pa.binary())})
            cl = np.repeat(np.arange(k, dtype=np.int64), d)
            dim = np.tile(np.arange(d, dtype=np.int64), k)
            return pa.table({
                "cluster": pa.array(cl, pa.int64()),
                "dim": pa.array(dim, pa.int64()),
                "s": pa.array(sums.ravel(), pa.int64()),
                "n": pa.array(np.repeat(counts, d), pa.int64()),
                "iq": pa.array(np.repeat(iq, d), pa.int64()),
            })
        return partials

    stats_pdf = None
    for _ in range(n_iter):
        rows = ds.map_batches(make_partials(C.copy()),
                              batch_format="pyarrow")
        sums = np.zeros((k, d), dtype=np.int64)
        sizes = np.zeros(k, dtype=np.int64)
        inert = np.zeros(k, dtype=np.int64)
        if dense:
            acc = np.zeros(k * d + 2 * k, dtype=np.int64)
            for batch in rows.iter_batches(batch_size=None,
                                           batch_format="pyarrow"):
                for blob in batch.column("pv").to_pylist():
                    acc += np.frombuffer(blob, dtype=np.int64)
            sums = acc[:k * d].reshape(k, d)
            sizes = acc[k * d:k * d + k]
            inert = acc[k * d + k:]
        else:
            agg = partitioned_group_agg(
                rows, ["cluster", "dim"],
                [("s", "sum", "s"), ("n", "sum", "n"),
                 ("iq", "sum", "iq")],
                num_parts=num_parts).to_pandas()
            agg = agg.sort_values(["cluster", "dim"]) \
                .reset_index(drop=True)
            for c in range(k):
                part = agg[agg["cluster"] == c]
                if len(part) == 0:
                    continue
                sums[c] = part["s"].to_numpy()
                sizes[c] = part["n"].to_numpy()[0]
                inert[c] = part["iq"].to_numpy()[0]
        newC = C.copy()
        nz = sizes > 0                       # empty cluster keeps centroid
        newC[nz] = sums[nz] // sizes[nz][:, None]
        inert = np.where(nz, inert, 0)
        C = newC
        stats_pdf = pd.DataFrame({"cluster": np.arange(k, dtype=np.int64),
                                  "size": sizes, "inertia_q": inert})

    stats = rd.from_pandas(stats_pdf.reset_index(drop=True))
    return C, stats


def pca_fit(ds, k: int = 8, vec_col: str = "embedding",
            num_parts: Optional[int] = None, decimals: int = 9):
    """Distributed PCA over the FULL embedding table: the dimensionality
    reduction step before ANN indexing / visualization / whitening at
    corpus scale.

    Phase 1 (the only corpus pass): each batch folds its vectors into
    second-moment partials — the upper triangle of X^T X plus the column
    sums and the row count, d(d+3)/2 + 1 scalars per BATCH regardless of
    rows — then ONE idx-keyed exchange sums the partials and the driver
    receives exactly d(d+3)/2 + 1 rows (kilobytes for typical embedding
    dims; never corpus rows). Phase 2 is driver-side: assemble the d x d
    covariance, `np.linalg.eigh`, keep the top-k eigenpairs. The
    covariance is rounded to ``decimals`` before eigh so summation-order
    float noise cannot flip near-tied eigenvectors across partitionings;
    each component's sign is fixed by making its largest-|loading| entry
    positive (ties -> lowest dim), the standard reproducibility
    convention.

    Returns ``(loadings_ds, model)``: one row per (component, dim) with
    the loading, the component eigenvalue and explained-variance ratio;
    ``model`` carries the numpy mean / components for
    :func:`pca_project`. No reference analog (sift has no cross-document
    operators, SURVEY.md §2.8)."""
    import ray.data as rd

    from .shuffle import partitioned_group_agg

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"idx": pa.array([], pa.int64()),
                             "val": pa.array([], pa.float64())})
        m = _to_matrix(t.column(vec_col))
        d = m.shape[1]
        iu = np.triu_indices(d)
        gram = (m.T @ m)[iu]                      # d(d+1)/2 values
        s = m.sum(axis=0)                         # d values
        vals = np.concatenate([gram, s, [float(m.shape[0])]])
        return pa.table({"idx": pa.array(np.arange(len(vals)), pa.int64()),
                         "val": pa.array(vals, pa.float64())})

    rows = ds.map_batches(partials, batch_format="pyarrow")
    agg = partitioned_group_agg(rows, ["idx"], [("val", "sum", "val")],
                                num_parts=num_parts).to_pandas()
    agg = agg.sort_values("idx").reset_index(drop=True)
    vals = agg["val"].to_numpy()
    # solve d(d+1)/2 + d + 1 == len(vals) for d
    d = int(round((-3 + np.sqrt(9 + 8 * (len(vals) - 1))) / 2))
    t_len = d * (d + 1) // 2
    iu = np.triu_indices(d)
    gram = np.zeros((d, d))
    gram[iu] = vals[:t_len]
    gram = gram + gram.T - np.diag(np.diag(gram))
    s = vals[t_len:t_len + d]
    n = vals[-1]
    if n < 2:
        raise ValueError("pca_fit needs at least 2 rows")
    cov = (gram - np.outer(s, s) / n) / (n - 1.0)
    cov = np.round(cov, decimals)
    evals, evecs = np.linalg.eigh(cov)            # ascending
    order = np.argsort(evals)[::-1][:k]
    evals_k = evals[order]
    comps = evecs[:, order].T                     # (k, d)
    for i in range(comps.shape[0]):               # sign convention
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    trace = float(np.trace(cov)) or 1.0
    kk = comps.shape[0]
    out = pa.table({
        "component": pa.array(np.repeat(np.arange(kk), d), pa.int64()),
        "dim": pa.array(np.tile(np.arange(d), kk), pa.int64()),
        "loading": pa.array(comps.ravel(), pa.float64()),
        "eigenvalue": pa.array(np.repeat(evals_k, d), pa.float64()),
        "explained_var_ratio": pa.array(np.repeat(evals_k / trace, d),
                                        pa.float64()),
    })
    model = {"mean": s / n, "components": comps}
    return rd.from_arrow(out), model


def pca_project(ds, model: dict, vec_col: str = "embedding",
                id_col: str = "vec_id"):
    """Project embeddings onto fitted principal components: zero-shuffle
    map stage — the (k x d) component matrix rides the task closure
    (kilobytes), each batch is one centered matmul."""
    mean = np.asarray(model["mean"], dtype=np.float64)
    comps = np.asarray(model["components"], dtype=np.float64)

    def project(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "proj": pa.array([], pa.list_(pa.float64()))})
        m = _to_matrix(t.column(vec_col))
        p = (m - mean) @ comps.T
        return pa.table({id_col: t.column(id_col),
                         "proj": pa.array(list(p),
                                          pa.list_(pa.float64()))})

    return ds.map_batches(project, batch_format="pyarrow")


def semdedup(ds, n_clusters: int = 8, threshold: float = 0.95,
             n_iter: int = 5, vec_col: str = "embedding",
             id_col: str = "vec_id", num_parts: Optional[int] = None,
             scale_bits: int = 20, tile: int = 512):
    """SemDeDup (Abbas et al. 2023): semantic deduplication by k-means
    clustering + intra-cluster pairwise cosine pruning. A vector is DROPPED
    when any lower-id vector in its cluster has cosine similarity >=
    ``threshold`` (the same keep-lowest pairwise rule as
    ``near_dedup_docs``). Returns the kept (vec_id, cluster) Dataset.

    Scale shape: clustering is the distributed fixed-point ``kmeans_fit``
    (bit-identical under any partitioning); assignment is a zero-shuffle
    map with the centroid matrix riding the task closure (k x d ints);
    the pairwise check is ONE cluster-keyed exchange, each cluster handled
    whole inside its partition with tiled integer-exact matmuls (memory
    O(tile x cluster), never the full cosine matrix). Per-cluster cost is
    O(|c|^2 d) — size ``n_clusters`` ~ corpus / target_cluster_size so a
    cluster fits a worker (the paper's own lever; it uses k = 50k for
    LAION-440M). Skewed (degenerate) clusters therefore bound at
    target_cluster_size^2, not corpus^2.

    Determinism: vectors quantize to int64 micros once; dots and squared
    norms are EXACT integer matmuls, so each pair's cosine is the same
    float64 on any engine, tile layout, or partitioning (pinned by a
    repartition-invariance test and a single-process numpy replica).
    """
    import pyarrow.compute as pc

    from .shuffle import add_hash_partition, default_num_parts

    P = num_parts or default_num_parts()
    S = np.int64(1) << scale_bits
    C, _ = kmeans_fit(ds, n_clusters=n_clusters, n_iter=n_iter,
                      vec_col=vec_col, id_col=id_col, num_parts=num_parts,
                      scale_bits=scale_bits)
    k = C.shape[0]

    def assign(batch: pa.Table) -> pa.Table:
        mat = _to_matrix(batch.column(vec_col))
        if mat.size == 0:
            return pa.table({
                "cluster": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                vec_col: pa.array([], pa.list_(pa.float64()))})
        xq = np.round(mat * S).astype(np.int64)
        d2 = np.empty((xq.shape[0], k), dtype=np.int64)
        for c in range(k):
            diff = xq - C[c]
            d2[:, c] = np.einsum("ij,ij->i", diff, diff)
        # embedding column passes through unchanged (zero-copy float32 —
        # half the exchange bytes of a float64 conversion)
        return pa.table({
            "cluster": pa.array(np.argmin(d2, axis=1), pa.int64()),
            id_col: pc.cast(batch.column(id_col), pa.int64()),
            vec_col: batch.column(vec_col),
        })

    def kernel(tbl: pa.Table) -> pa.Table:
        cl = tbl.column("cluster").to_numpy(zero_copy_only=False)
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, cl))
        cl_s, ids_s = cl[order], ids[order]
        mat = _to_matrix(tbl.column(vec_col))[order]
        xq = np.round(mat * S).astype(np.int64)
        n = len(order)
        starts = np.flatnonzero(np.r_[True, cl_s[1:] != cl_s[:-1]]).tolist()
        starts.append(n)
        keep_ids, keep_cl = [], []
        for bi in range(len(starts) - 1):
            s, e = starts[bi], starts[bi + 1]
            X = xq[s:e]
            m = e - s
            n2 = np.einsum("ij,ij->i", X, X).astype(np.float64)
            n2[n2 == 0] = 1.0
            dropped = np.zeros(m, dtype=bool)
            for t0 in range(1, m, tile):
                t1 = min(t0 + tile, m)
                dots = X[t0:t1] @ X[:t1].T          # exact int64
                cos = dots / np.sqrt(np.outer(n2[t0:t1], n2[:t1]))
                rows = np.arange(t0, t1)[:, None]
                cols = np.arange(t1)[None, :]
                hit = (cos >= threshold) & (cols < rows)
                dropped[t0:t1] = hit.any(axis=1)
            kept = ~dropped
            keep_ids.append(ids_s[s:e][kept])
            keep_cl.append(cl_s[s:e][kept])
        if not keep_ids:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64())})
        return pa.table({
            id_col: pa.array(np.concatenate(keep_ids), pa.int64()),
            "cluster": pa.array(np.concatenate(keep_cl), pa.int64()),
        })

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    parted = add_hash_partition(assigned, ["cluster"], P)
    return parted.groupby("part").map_groups(kernel,
                                             batch_format="pyarrow")

