"""Product-quantization ANN (functions/pq.py): determinism under any
partitioning, encode/code-size contract, ADC recall on separable data,
and the exact-degeneration property (one subspace codeword per distinct
cluster center -> ADC ranking equals exact ranking)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from sift_ray.functions.pq import pq_encode, pq_topk, pq_train


def _clustered(n_per=40, n_clusters=5, d=16, seed=3):
    """Well-separated Gaussian clusters; ids interleave clusters so id
    order carries no cluster signal."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 10.0, (n_clusters, d))
    vecs, labels = [], []
    for c in range(n_clusters):
        vecs.append(centers[c] + rng.normal(0, 0.3, (n_per, d)))
        labels += [c] * n_per
    mat = np.concatenate(vecs)
    order = rng.permutation(len(mat))
    return mat[order], np.asarray(labels)[order]


def _ds_of(mat, nblocks=1):
    t = pa.table({
        "vec_id": pa.array(np.arange(len(mat)), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat])})
    ds = rd.from_arrow(t)
    return ds.repartition(nblocks) if nblocks > 1 else ds


def test_pq_train_partition_invariant(ray_session):
    mat, _ = _clustered()
    b1 = pq_train(_ds_of(mat, 1), m=4, n_clusters=8, n_iter=3)
    b2 = pq_train(_ds_of(mat, 7), m=4, n_clusters=8, n_iter=3)
    assert b1.shape == (4, 8, 4)
    assert (b1 == b2).all()          # fixed-point kmeans: bit-identical


def test_pq_encode_contract(ray_session):
    mat, _ = _clustered()
    books = pq_train(_ds_of(mat), m=4, n_clusters=8, n_iter=3)
    enc = pq_encode(_ds_of(mat, 3), books).to_pandas()
    assert len(enc) == len(mat)
    assert all(len(c) == 4 for c in enc["code"])      # m bytes per vector
    assert all(max(c) < 8 for c in enc["code"])       # codes < n_clusters
    enc2 = pq_encode(_ds_of(mat, 5), books).to_pandas()
    assert (dict(zip(enc["vec_id"], enc["code"]))
            == dict(zip(enc2["vec_id"], enc2["code"])))


def test_pq_topk_recall_and_invariance(ray_session):
    """On well-separated clusters, each query's ADC top-k stays inside
    its own cluster (recall ~1), and the result is identical at any
    blocking and with precomputed codebooks/codes."""
    mat, labels = _clustered()
    qids = [0, 17, 101]
    a = pq_topk(_ds_of(mat, 1), qids, k=8, m=4, n_clusters=8) \
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = pq_topk(_ds_of(mat, 6), qids, k=8, m=4, n_clusters=8) \
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a.equals(b)
    books = pq_train(_ds_of(mat), m=4, n_clusters=8, n_iter=4)
    enc = pq_encode(_ds_of(mat, 4), books)
    c = pq_topk(_ds_of(mat), qids, k=8, codebooks=books, encoded=enc) \
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a.equals(c)
    lab = dict(zip(range(len(mat)), labels))
    for q in qids:
        nbrs = a[a["query_id"] == q]["neighbor_id"]
        same = sum(lab[int(n)] == lab[q] for n in nbrs)
        assert same >= 7, (q, same)   # >= 7/8 in-cluster
        # NOTE: self need not appear — a tight cluster can quantize to
        # ONE code, so all members tie at the same ADC distance and the
        # k lowest ids win (correct, deterministic ADC semantics)


def test_pq_degenerates_to_exact_on_codebook_points(ray_session):
    """Vectors that ARE codeword points reconstruct exactly, so ADC
    distance == true distance and ranking is exact."""
    rng = np.random.default_rng(11)
    centers = rng.normal(0, 5.0, (4, 8))
    mat = np.repeat(centers, 3, axis=0)     # 12 rows, 4 distinct points
    out = pq_topk(_ds_of(mat), [0], k=3, m=2, n_clusters=4,
                  n_iter=6).to_pandas()
    # rows 0,1,2 are the three copies of row 0's point — the unique
    # zero-ADC-distance hits (codeword points reconstruct exactly)
    assert sorted(int(n) for n in out["neighbor_id"]) == [0, 1, 2]


def test_pq_validation(ray_session):
    mat, _ = _clustered(d=15)
    with pytest.raises(ValueError):
        pq_train(_ds_of(mat), m=4)          # 15 % 4 != 0


def test_ivfpq_partition_invariance_and_recall(ray_session):
    """IVF-PQ (coarse cells + residual codes): bit-identical at any
    blocking; with enough probes the in-cluster recall matches plain PQ
    on separable data; a prebuilt index reuses without retraining."""
    from sift_ray.functions.pq import ivfpq_build, ivfpq_topk

    mat, labels = _clustered(n_per=30, n_clusters=4, d=16, seed=7)
    qids = [3, 50, 99]
    a = ivfpq_topk(_ds_of(mat, 1), qids, k=6, n_clusters=8, n_probe=4,
                   m=4, pq_clusters=8) \
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = ivfpq_topk(_ds_of(mat, 5), qids, k=6, n_clusters=8, n_probe=4,
                   m=4, pq_clusters=8) \
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a.equals(b)
    idx = ivfpq_build(_ds_of(mat, 3), n_clusters=8, m=4, pq_clusters=8)
    c = ivfpq_topk(_ds_of(mat), qids, k=6, index=idx) \
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a.equals(c)
    lab = dict(zip(range(len(mat)), labels))
    for q in qids:
        nbrs = a[a["query_id"] == q]["neighbor_id"]
        assert len(nbrs) == 6
        same = sum(lab[int(n)] == lab[q] for n in nbrs)
        assert same >= 5, (q, same)


def test_ivfpq_probe_restricts_cells(ray_session):
    """n_probe=1 scans only the query's own coarse cell: every neighbor
    shares the query's coarse assignment (read from the index)."""
    import numpy as np

    from sift_ray.functions.pq import ivfpq_build, ivfpq_topk

    mat, _ = _clustered(n_per=25, n_clusters=4, d=16, seed=13)
    idx = ivfpq_build(_ds_of(mat), n_clusters=4, m=4, pq_clusters=8)
    _, _, encoded = idx
    cell = dict(zip(*[encoded.to_pandas()[c]
                      for c in ("vec_id", "cluster")]))
    out = ivfpq_topk(_ds_of(mat), [5, 42], k=5, n_probe=1,
                     index=idx).to_pandas()
    for q in (5, 42):
        nbrs = out[out["query_id"] == q]["neighbor_id"]
        assert {cell[int(n)] for n in nbrs} <= {cell[q]}, q


def test_batched_training_equals_per_subspace_kmeans(ray_session):
    """The one-pass-all-subspaces trainer must be BIT-IDENTICAL to m
    independent kmeans_fit runs on the projected sub-tables — the
    equality that lets the batched path inherit kmeans_fit's
    determinism guarantees."""
    import pyarrow as pa

    from sift_ray.functions.pq import pq_train
    from sift_ray.functions.similarity import _to_matrix, kmeans_fit

    mat, _ = _clustered(n_per=25, n_clusters=3, d=16, seed=19)
    ds = _ds_of(mat, 4)
    batched = pq_train(ds, m=4, n_clusters=8, n_iter=3)
    sub = 4
    for j in range(4):
        lo = j * sub

        def proj(t, lo=lo):
            m_ = _to_matrix(t.column("embedding"))
            block = m_[:, lo:lo + sub] if m_.size else np.empty((0, sub))
            flat = pa.array(block.astype(np.float64).ravel(),
                            pa.float64())
            return pa.table({
                "vec_id": t.column("vec_id"),
                "embedding": pa.FixedSizeListArray.from_arrays(flat,
                                                               sub)})

        C, _ = kmeans_fit(ds.map_batches(proj, batch_format="pyarrow"),
                          n_clusters=8, n_iter=3)
        assert (batched[j] == C).all(), j


def test_cli_ann(ray_session, tmp_path):
    """CLI surface: encode writes m-byte codes; topk/ivfpq-topk write
    (query_id, neighbor_id, rank) for the requested queries."""
    import pyarrow.parquet as pq_

    from sift_ray.cli import main

    mat, _ = _clustered(n_per=20, n_clusters=3, d=16, seed=23)
    src = tmp_path / "vecs.parquet"
    pq_.write_table(pa.table({
        "vec_id": pa.array(np.arange(len(mat)), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat])}),
        str(src))
    assert main(["ann", "encode", "--input", str(src),
                 "--output", str(tmp_path / "codes"),
                 "--clusters", "8"]) == 0
    codes = pq_.ParquetDataset(str(tmp_path / "codes")).read().to_pandas()
    assert len(codes) == len(mat) and all(len(c) == 4
                                          for c in codes["code"])
    for action in ("topk", "ivfpq-topk"):
        out = tmp_path / action
        assert main(["ann", action, "--input", str(src),
                     "--output", str(out), "--clusters", "8",
                     "--queries", "0,5", "--k", "4"]) == 0
        res = pq_.ParquetDataset(str(out)).read().to_pandas()
        assert set(res["query_id"]) == {0, 5}
        assert res.groupby("query_id")["rank"].max().eq(4).all()
