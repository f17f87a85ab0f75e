"""Product quantization ANN (Jégou, Douze & Schmid, "Product
Quantization for Nearest Neighbor Search", TPAMI 2011) — the
memory-scale path of the similarity family. Where ``embedding_quantize``
cuts storage 4x (int8 per dimension), PQ stores ``m`` ONE-BYTE codes per
vector (d=64, m=8 -> 32x), and queries scan codes with per-subspace
distance lookup tables (asymmetric distance computation, ADC) — no
decode, one table lookup + add per subspace per vector.

Determinism discipline (repo convention): codebooks come from the
fixed-point distributed ``kmeans_fit`` per subspace (integer arithmetic,
bit-identical under any partitioning), encoding minimizes INTEGER
squared distance with tie -> lowest code, and ADC distances are exact
int64 sums of per-subspace integer distances — so train/encode/search
are all layout-invariant and golden-pinnable.

Operators:

* ``pq_train``     — (m, k, d/m) int64-micro codebooks; all m
                     subspaces train in ONE set of corpus passes
                     (dense per-batch partial blobs, kmeans_fit's
                     arithmetic bit-for-bit).
* ``pq_encode``    — zero-shuffle map: (id, code binary: m uint8 bytes).
* ``pq_topk``      — per-query ADC top-k over the encoded table:
                     broadcast LUTs, per-batch local top-k combiner, ONE
                     query-keyed exchange (grouped_topk) — driver holds
                     codebooks + q x k rows only.

Scale shape: training is ~(2 + n_iter) corpus passes over a ONCE-
materialized input (subsample upstream for 10^12-row corpora — any
deterministic id-hash filter keeps the pipeline reproducible); encode
and scan are single streaming passes; the scan's exchange volume is
(queries x k) rows per batch, never corpus-proportional.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa

from .similarity import _fetch_vectors, _to_matrix, kmeans_fit


def _subspace_dists(Xq: np.ndarray, book: np.ndarray) -> np.ndarray:
    """(n, k) integer squared distances of int64-micro rows to one
    subspace codebook — k-loop like kmeans_fit (bounded memory)."""
    n, k = Xq.shape[0], book.shape[0]
    d2 = np.empty((n, k), dtype=np.int64)
    for c in range(k):
        diff = Xq - book[c]
        d2[:, c] = np.einsum("ij,ij->i", diff, diff)
    return d2


def _pq_kmeans_books(ds, m: int, sub: int, n_clusters: int, n_iter: int,
                     vec_col: str, id_col: str,
                     scale_bits: int) -> np.ndarray:
    """All m subspace codebooks in ONE set of corpus passes — the
    subspaces are independent, so a single per-batch kernel assigns and
    partial-sums every subspace at once, and the per-batch partial is a
    dense m*k*(sub+1)-int blob the driver np-sums (kmeans_fit's dense
    idiom, never corpus rows). Arithmetic replicates kmeans_fit exactly
    — k-smallest-id init, integer distances with tie -> lowest cluster,
    ``sums // counts`` update, empty cluster keeps its centroid — so the
    result is BIT-IDENTICAL to m independent kmeans_fit runs on the
    projected tables (pinned by test) at 1/m the pass count."""
    import ray

    S = np.int64(1) << scale_bits
    k = n_clusters

    def local_min_ids(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({id_col: pa.array(np.sort(ids)[:k], pa.int64())})

    cand = (ds.map_batches(local_min_ids, batch_format="pyarrow")
            .to_pandas()[id_col].nsmallest(k).tolist())
    _, seed_vecs = _fetch_vectors(ds, cand, vec_col, id_col)
    seed = np.round(np.asarray(seed_vecs, dtype=np.float64) * S) \
        .astype(np.int64)
    C = np.stack([seed[:, j * sub:(j + 1) * sub] for j in range(m)])

    blob_len = m * k * sub + m * k
    for _ in range(n_iter):
        ref = ray.put(C.copy())

        def partials(t: pa.Table, ref=ref) -> pa.Table:
            books = ray.get(ref)
            mat = _to_matrix(t.column(vec_col))
            if mat.size == 0:
                return pa.table({"pv": pa.array([], pa.binary())})
            xq = np.round(mat.astype(np.float64) * S).astype(np.int64)
            sums = np.zeros((m, k, sub), dtype=np.int64)
            counts = np.zeros((m, k), dtype=np.int64)
            for j in range(m):
                X = xq[:, j * sub:(j + 1) * sub]
                a = np.argmin(_subspace_dists(X, books[j]), axis=1)
                np.add.at(sums[j], a, X)
                counts[j] += np.bincount(a, minlength=k)
            blob = np.concatenate([sums.ravel(), counts.ravel()]) \
                .astype(np.int64).tobytes()
            return pa.table({"pv": pa.array([blob], pa.binary())})

        acc = np.zeros(blob_len, dtype=np.int64)
        for batch in ds.map_batches(partials, batch_format="pyarrow") \
                .iter_batches(batch_size=None, batch_format="pyarrow"):
            for blob in batch.column("pv").to_pylist():
                acc += np.frombuffer(blob, dtype=np.int64)
        sums = acc[:m * k * sub].reshape(m, k, sub)
        counts = acc[m * k * sub:].reshape(m, k)
        newC = C.copy()
        nz = counts > 0                  # empty cluster keeps centroid
        newC[nz] = sums[nz] // counts[nz][:, None]
        C = newC
    return C


def pq_train(ds, m: int = 4, n_clusters: int = 16, n_iter: int = 4,
             vec_col: str = "embedding", id_col: str = "vec_id",
             num_parts: Optional[int] = None,
             scale_bits: int = 20,
             materialize_input: bool = True) -> np.ndarray:
    """Train the m per-subspace codebooks on the full table. Returns an
    (m, n_clusters, d/m) int64 array of codeword micros. d must divide
    evenly by m.

    All m subspaces train in ONE set of ~(2 + n_iter) corpus passes
    (``_pq_kmeans_books`` — bit-identical to m independent kmeans_fit
    runs), and the input is MATERIALIZED once so those passes read
    memory, not parquet. At 10^12-row scale pass a bounded deterministic
    sample (e.g. an id-hash filter) as the training input — the standard
    PQ practice; only ``pq_encode``'s single streaming pass needs the
    full table. ``materialize_input=False`` skips the materialize for
    callers whose input is already materialized or a cheap map over a
    materialized base (ivfpq_build's residual view — materializing it
    too would hold a second corpus copy in the object store)."""
    if materialize_input:
        ds = ds.materialize()
    first = ds.limit(1).take_all()
    if not first:
        raise ValueError("pq_train: empty dataset")
    d = len(first[0][vec_col])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    return _pq_kmeans_books(ds, m, d // m, n_clusters, n_iter,
                            vec_col, id_col, scale_bits)


def pq_encode(ds, codebooks: np.ndarray, vec_col: str = "embedding",
              id_col: str = "vec_id", scale_bits: int = 20):
    """(id, code) rows — code is m bytes, one uint8 codeword index per
    subspace (ties -> lowest index; exact integer distances). Zero
    shuffle; codebooks broadcast once via ray.put."""
    import ray

    m, k, sub = codebooks.shape
    if k > 256:
        raise ValueError("pq codes are uint8: n_clusters <= 256")
    S = np.int64(1) << scale_bits
    ref = ray.put(codebooks)

    def enc(t: pa.Table) -> pa.Table:
        books = ray.get(ref)
        mat = _to_matrix(t.column(vec_col))
        if mat.size == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "code": pa.array([], pa.binary())})
        xq = np.round(mat.astype(np.float64) * S).astype(np.int64)
        n = xq.shape[0]
        codes = np.empty((n, m), dtype=np.uint8)
        for j in range(m):
            d2 = _subspace_dists(xq[:, j * sub:(j + 1) * sub], books[j])
            codes[:, j] = np.argmin(d2, axis=1)   # tie -> lowest code
        return pa.table({
            id_col: pa.array(
                t.column(id_col).to_numpy(zero_copy_only=False)
                .astype(np.int64), pa.int64()),
            "code": pa.array([codes[i].tobytes() for i in range(n)],
                             pa.binary())})

    return ds.map_batches(enc, batch_format="pyarrow")


def pq_topk(ds, query_ids: List[int], k: int = 10, m: int = 4,
            n_clusters: int = 16, n_iter: int = 4,
            vec_col: str = "embedding", id_col: str = "vec_id",
            num_parts: Optional[int] = None, scale_bits: int = 20,
            codebooks: Optional[np.ndarray] = None, encoded=None):
    """Per-query approximate top-k by PQ asymmetric distance: returns
    (query_id, neighbor_id, rank) — the ``cosine_topk_ivf`` contract
    (queries are table rows; a query is allowed to retrieve itself).
    Ordering: ascending integer ADC distance, tie -> lowest neighbor id
    — fully deterministic. Pass precomputed ``codebooks`` /
    ``encoded`` (the pq_encode output) to search without retraining —
    at corpus scale both are trained/materialized once."""
    import ray

    from .relational import grouped_topk

    if codebooks is None:
        codebooks = pq_train(ds, m=m, n_clusters=n_clusters,
                             n_iter=n_iter, vec_col=vec_col,
                             id_col=id_col, num_parts=num_parts,
                             scale_bits=scale_bits)
    m, kcb, sub = codebooks.shape
    if encoded is None:
        encoded = pq_encode(ds, codebooks, vec_col=vec_col,
                            id_col=id_col, scale_bits=scale_bits)

    S = np.int64(1) << scale_bits
    q_ids, q_vecs = _fetch_vectors(ds, query_ids, vec_col, id_col)
    Q = np.round(np.asarray(q_vecs, dtype=np.float64) * S) \
        .astype(np.int64)
    nq = len(q_ids)
    lut = np.empty((nq, m, kcb), dtype=np.int64)
    for j in range(m):
        for c in range(kcb):
            diff = Q[:, j * sub:(j + 1) * sub] - codebooks[j][c]
            lut[:, j, c] = np.einsum("ij,ij->i", diff, diff)
    ref = ray.put({"lut": lut, "q_ids": np.asarray(q_ids, np.int64)})

    def scan(t: pa.Table) -> pa.Table:
        st = ray.get(ref)
        lut_, qids_ = st["lut"], st["q_ids"]
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        n = len(ids)
        if n == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "adist": pa.array([], pa.int64())})
        codes = np.frombuffer(
            b"".join(t.column("code").to_pylist()),
            dtype=np.uint8).reshape(n, lut_.shape[1])
        dist = np.zeros((n, len(qids_)), dtype=np.int64)
        for j in range(lut_.shape[1]):
            dist += lut_[:, j, :][:, codes[:, j]].T
        kk = min(k, n)
        out_q, out_n, out_d = [], [], []
        ids64 = ids.astype(np.int64)
        for qi in range(len(qids_)):
            # local top-k under EXACTLY the global (adist, id) order, so
            # the combiner never drops a row the global head would keep
            sel = np.lexsort((ids64, dist[:, qi]))[:kk]
            out_q.append(np.full(len(sel), qids_[qi], np.int64))
            out_n.append(ids64[sel])
            out_d.append(dist[sel, qi])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
            "adist": pa.array(np.concatenate(out_d), pa.int64())})

    partial = encoded.map_batches(scan, batch_format="pyarrow")
    top = grouped_topk(partial, "query_id", "adist", "neighbor_id",
                       k=k, ascending=True, num_parts=num_parts)
    return top.map_batches(
        lambda t: t.select(["query_id", "neighbor_id", "rank"]),
        batch_format="pyarrow")


def ivfpq_build(ds, n_clusters: int = 16, m: int = 4,
                pq_clusters: int = 16, n_iter: int = 4,
                vec_col: str = "embedding", id_col: str = "vec_id",
                num_parts: Optional[int] = None, scale_bits: int = 20):
    """Build the IVF-PQ index state (the FAISS-style billion-scale ANN
    shape): a coarse k-means quantizer plus PQ codebooks trained on the
    RESIDUALS (vector minus its coarse centroid — the residual trick
    that gives PQ most of its accuracy at scale, Jégou et al. 2011 §IV).

    Returns (coarse int64 micros (n_clusters, d), residual codebooks
    int64 micros (m, pq_clusters, d/m), encoded Dataset of
    (id, cluster:int64, code:binary)). Everything integer-deterministic:
    coarse assignment ties -> lowest cluster, residuals are exact micro
    differences, code assignment ties -> lowest code — the whole index
    is bit-identical under any partitioning (tested)."""
    import ray

    S = np.int64(1) << scale_bits
    # materialize once: coarse training + residual training + encode
    # together consume the input ~2*(2 + n_iter) times (see pq_train's
    # note — subsample upstream at corpus scale)
    ds = ds.materialize()
    coarse, _ = kmeans_fit(ds, n_clusters=n_clusters, n_iter=n_iter,
                           vec_col=vec_col, id_col=id_col,
                           num_parts=num_parts, scale_bits=scale_bits)
    cref = ray.put(coarse)

    def residuals(t: pa.Table) -> pa.Table:
        C = ray.get(cref)
        mat = _to_matrix(t.column(vec_col))
        if mat.size == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             vec_col: pa.array([], pa.list_(pa.float64()))})
        xq = np.round(mat.astype(np.float64) * S).astype(np.int64)
        assign = np.argmin(_subspace_dists(xq, C), axis=1)
        res = (xq - C[assign]).astype(np.float64) / float(S)
        flat = pa.array(res.ravel(), pa.float64())
        return pa.table({
            id_col: t.column(id_col),
            vec_col: pa.FixedSizeListArray.from_arrays(flat,
                                                       res.shape[1])})

    res_ds = ds.map_batches(residuals, batch_format="pyarrow")
    # residual view stays lazy: it is a cheap matrix map over the
    # ALREADY-materialized base — materializing it too would hold a
    # second corpus copy in the object store
    books = pq_train(res_ds, m=m, n_clusters=pq_clusters, n_iter=n_iter,
                     vec_col=vec_col, id_col=id_col,
                     num_parts=num_parts, scale_bits=scale_bits,
                     materialize_input=False)
    bref = ray.put(books)
    mm, kcb, sub = books.shape

    def enc(t: pa.Table) -> pa.Table:
        C = ray.get(cref)
        bk = ray.get(bref)
        mat = _to_matrix(t.column(vec_col))
        if mat.size == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             "code": pa.array([], pa.binary())})
        xq = np.round(mat.astype(np.float64) * S).astype(np.int64)
        assign = np.argmin(_subspace_dists(xq, C), axis=1)
        res = xq - C[assign]
        n = res.shape[0]
        codes = np.empty((n, mm), dtype=np.uint8)
        for j in range(mm):
            d2 = _subspace_dists(res[:, j * sub:(j + 1) * sub], bk[j])
            codes[:, j] = np.argmin(d2, axis=1)
        return pa.table({
            id_col: pa.array(
                t.column(id_col).to_numpy(zero_copy_only=False)
                .astype(np.int64), pa.int64()),
            "cluster": pa.array(assign.astype(np.int64), pa.int64()),
            "code": pa.array([codes[i].tobytes() for i in range(n)],
                             pa.binary())})

    encoded = ds.map_batches(enc, batch_format="pyarrow")
    return coarse, books, encoded


def ivfpq_topk(ds, query_ids: List[int], k: int = 10,
               n_clusters: int = 16, n_probe: int = 4, m: int = 4,
               pq_clusters: int = 16, n_iter: int = 4,
               vec_col: str = "embedding", id_col: str = "vec_id",
               num_parts: Optional[int] = None, scale_bits: int = 20,
               index=None):
    """IVF-PQ search: probe the ``n_probe`` nearest coarse cells per
    query, then rank their members by residual-PQ asymmetric distance
    (per-(query, probed-cluster) LUTs of the query RESIDUAL against the
    residual codebooks). Returns (query_id, neighbor_id, rank) ascending
    integer distance, tie -> lowest id — deterministic. With
    ``n_probe == n_clusters`` every vector is scanned (the recall knob
    degenerates to plain PQ accuracy). Pass ``index`` (the
    ``ivfpq_build`` output triple) to search an existing index."""
    import ray

    from .relational import grouped_topk

    if index is None:
        index = ivfpq_build(ds, n_clusters=n_clusters, m=m,
                            pq_clusters=pq_clusters, n_iter=n_iter,
                            vec_col=vec_col, id_col=id_col,
                            num_parts=num_parts, scale_bits=scale_bits)
    coarse, books, encoded = index
    mm, kcb, sub = books.shape
    S = np.int64(1) << scale_bits

    q_ids, q_vecs = _fetch_vectors(ds, query_ids, vec_col, id_col)
    Q = np.round(np.asarray(q_vecs, dtype=np.float64) * S) \
        .astype(np.int64)
    nq = len(q_ids)
    np_ = min(n_probe, coarse.shape[0])
    cd = _subspace_dists(Q, coarse)               # (nq, kc)
    # deterministic probe order: distance asc, cluster id tiebreak
    probe = np.lexsort((np.broadcast_to(np.arange(coarse.shape[0]),
                                        cd.shape), cd), axis=1)[:, :np_]
    # LUTs of each query's residual per PROBED cluster: (nq, np, m, kcb)
    lut = np.empty((nq, np_, mm, kcb), dtype=np.int64)
    for qi in range(nq):
        for pi in range(np_):
            r = Q[qi] - coarse[probe[qi, pi]]
            for j in range(mm):
                diff = r[j * sub:(j + 1) * sub] - books[j]
                lut[qi, pi, j] = np.einsum("ij,ij->i", diff, diff)
    ref = ray.put({"lut": lut, "probe": probe,
                   "q_ids": np.asarray(q_ids, np.int64)})

    def scan(t: pa.Table) -> pa.Table:
        st = ray.get(ref)
        lut_, probe_, qids_ = st["lut"], st["probe"], st["q_ids"]
        ids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = len(ids)
        if n == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "adist": pa.array([], pa.int64())})
        clus = t.column("cluster").to_numpy(zero_copy_only=False)
        codes = np.frombuffer(
            b"".join(t.column("code").to_pylist()),
            dtype=np.uint8).reshape(n, lut_.shape[2])
        out_q, out_n, out_d = [], [], []
        for qi in range(len(qids_)):
            # members of this query's probed cells only
            sel_rows = np.flatnonzero(np.isin(clus, probe_[qi]))
            if len(sel_rows) == 0:
                continue
            # map each row's cluster to its probe slot for LUT lookup
            slot = np.searchsorted(np.sort(probe_[qi]), clus[sel_rows])
            order_p = np.argsort(probe_[qi], kind="stable")
            slot = order_p[slot]
            dist = np.zeros(len(sel_rows), dtype=np.int64)
            for j in range(lut_.shape[2]):
                dist += lut_[qi, slot, j, codes[sel_rows, j]]
            kk = min(k, len(sel_rows))
            loc = np.lexsort((ids[sel_rows], dist))[:kk]
            out_q.append(np.full(kk, qids_[qi], np.int64))
            out_n.append(ids[sel_rows][loc])
            out_d.append(dist[loc])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "adist": pa.array([], pa.int64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
            "adist": pa.array(np.concatenate(out_d), pa.int64())})

    partial = encoded.map_batches(scan, batch_format="pyarrow")
    top = grouped_topk(partial, "query_id", "adist", "neighbor_id",
                       k=k, ascending=True, num_parts=num_parts)
    return top.map_batches(
        lambda t: t.select(["query_id", "neighbor_id", "rank"]),
        batch_format="pyarrow")
