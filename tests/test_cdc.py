"""FastCDC content-defined chunking (functions/cdc.py)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from sift_ray.functions.cdc import (_GEAR, cdc_boundaries, cdc_chunks,
                                    cdc_dedup_stats, gear_hashes)

MIN, AVG, MAX = 64, 256, 1024


def _seq_gear(data: np.ndarray) -> np.ndarray:
    """The sequential reference recurrence h = (h << 1) + gear[b]."""
    h = np.uint64(0)
    out = np.empty(len(data), np.uint64)
    one = np.uint64(1)
    with np.errstate(over="ignore"):   # wraparound is the definition
        for i, b in enumerate(data):
            h = (h << one) + _GEAR[b]
            out[i] = h
    return out


def _rand_bytes(seed, n):
    return np.random.default_rng(seed).integers(0, 256, n).astype(np.uint8)


def test_gear_hashes_match_sequential():
    data = _rand_bytes(1, 3000)
    np.testing.assert_array_equal(gear_hashes(data), _seq_gear(data))


def test_gear_hashes_short_inputs():
    for n in (0, 1, 2, 63, 64, 65):
        data = _rand_bytes(n + 10, n)
        np.testing.assert_array_equal(gear_hashes(data), _seq_gear(data))


def test_boundaries_cover_and_bound():
    data = _rand_bytes(2, 50_000)
    ends = cdc_boundaries(data, MIN, AVG, MAX)
    assert ends[-1] == len(data)
    assert np.all(np.diff(ends) > 0)
    lens = np.diff(np.r_[0, ends])
    assert lens.max() <= MAX
    # every chunk except possibly the last respects the minimum
    assert np.all(lens[:-1] >= MIN)
    # average lands in the right decade
    assert AVG / 4 <= lens.mean() <= AVG * 4


def test_boundaries_resynchronize_after_insert():
    base = _rand_bytes(3, 30_000)
    shifted = np.concatenate([_rand_bytes(4, 137), base])
    e1 = set(cdc_boundaries(base, MIN, AVG, MAX).tolist())
    e2 = set((cdc_boundaries(shifted, MIN, AVG, MAX) - 137).tolist())
    # content-defined: most boundaries survive a 137-byte prefix insert
    common = len(e1 & e2)
    assert common >= 0.7 * len(e1), (common, len(e1))


def test_empty_input():
    assert len(cdc_boundaries(np.empty(0, np.uint8), MIN, AVG, MAX)) == 0


def _docs_ds(docs, nblocks=1):
    t = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                  "text": pa.array(list(docs.values()), pa.string())})
    ds = rd.from_arrow(t)
    return ds.repartition(nblocks) if nblocks > 1 else ds


def _text(seed, n):
    rng = np.random.default_rng(seed)
    return "".join(chr(97 + int(c)) for c in rng.integers(0, 26, n))


def test_cdc_chunks_table(ray_session):
    docs = {1: _text(5, 4000), 2: _text(6, 100), 3: ""}
    out = cdc_chunks(_docs_ds(docs), min_size=MIN, avg_size=AVG,
                     max_size=MAX).to_pandas()
    assert set(out["doc_id"]) == {1, 2}      # empty doc emits nothing
    d1 = out[out["doc_id"] == 1].sort_values("chunk_idx")
    assert d1["length"].sum() == 4000
    assert (d1["offset"].to_numpy()
            == np.r_[0, d1["length"].cumsum().to_numpy()[:-1]]).all()


def test_dedup_stats_planted(ray_session):
    a = _text(7, 5000)
    docs = {1: a, 2: a, 3: _text(8, 3000)}   # doc 2 duplicates doc 1
    out = cdc_dedup_stats(_docs_ds(docs), min_size=MIN, avg_size=AVG,
                          max_size=MAX).to_pandas().set_index("doc_id")
    assert out.loc[1, "dup_chunks"] == 0     # first occurrence
    assert out.loc[2, "dup_chunks"] == out.loc[2, "n_chunks"]
    assert out.loc[2, "dup_bytes"] == out.loc[2, "total_bytes"] == 5000
    assert out.loc[3, "dup_chunks"] == 0


def test_dedup_stats_partition_invariance(ray_session):
    docs = {i: _text(10 + i % 4, 2000 + 100 * (i % 3)) for i in range(12)}
    a = cdc_dedup_stats(_docs_ds(docs, 1), min_size=MIN, avg_size=AVG,
                        max_size=MAX).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    b = cdc_dedup_stats(_docs_ds(docs, 5), min_size=MIN, avg_size=AVG,
                        max_size=MAX).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert a.equals(b)


# ---- property-based: the vectorized gear hash equals the sequential
# recurrence on arbitrary byte strings, and chunk boundaries partition
# the input under arbitrary size params

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_SET = settings(max_examples=20, deadline=None,
                suppress_health_check=[HealthCheck.data_too_large])


@_SET
@given(data=st.binary(min_size=0, max_size=4000))
def test_property_gear_matches_sequential(data):
    arr = np.frombuffer(data, np.uint8)
    np.testing.assert_array_equal(gear_hashes(arr), _seq_gear(arr))


@_SET
@given(data=st.binary(min_size=1, max_size=20_000),
       mn=st.integers(16, 64))
def test_property_boundaries_partition(data, mn):
    arr = np.frombuffer(data, np.uint8)
    ends = cdc_boundaries(arr, min_size=mn, avg_size=mn * 4,
                          max_size=mn * 16)
    assert ends[-1] == len(arr)
    lens = np.diff(np.r_[0, ends])
    assert lens.min() > 0
    assert lens.max() <= mn * 16
    if len(lens) > 1:
        assert np.all(lens[:-1] >= mn)


def test_dedup_docs_planted(ray_session):
    """Materializer: doc 2 (an exact copy of doc 1) loses ALL its bytes;
    doc 1 and the unrelated doc 3 survive byte-identical; removed bytes
    per doc equal cdc_dedup_stats' dup_bytes."""
    from sift_ray.functions.cdc import cdc_dedup_docs, cdc_dedup_stats
    a = _text(7, 5000)
    docs = {1: a, 2: a, 3: _text(8, 3000)}
    out = cdc_dedup_docs(_docs_ds(docs), min_size=MIN, avg_size=AVG,
                         max_size=MAX).to_pandas().set_index("doc_id")
    assert out.loc[1, "data"] == a.encode()
    assert out.loc[2, "data"] == b""
    assert out.loc[3, "data"] == docs[3].encode()
    stats = cdc_dedup_stats(_docs_ds(docs), min_size=MIN, avg_size=AVG,
                            max_size=MAX).to_pandas().set_index("doc_id")
    for d in docs:
        removed = len(docs[d].encode()) - len(out.loc[d, "data"])
        assert removed == stats.loc[d, "dup_bytes"], d


def test_dedup_docs_partial_overlap(ray_session):
    """A doc sharing a long prefix with an earlier doc loses exactly its
    duplicate chunks (chunk-aligned, so the shared tail chunk that
    differs survives) and the survivor bytes are a subsequence of the
    original payload."""
    from sift_ray.functions.cdc import cdc_dedup_docs, cdc_dedup_stats
    a = _text(9, 6000)
    docs = {1: a, 2: a[:4500] + _text(10, 2000)}
    out = cdc_dedup_docs(_docs_ds(docs), min_size=MIN, avg_size=AVG,
                         max_size=MAX).to_pandas().set_index("doc_id")
    stats = cdc_dedup_stats(_docs_ds(docs), min_size=MIN, avg_size=AVG,
                            max_size=MAX).to_pandas().set_index("doc_id")
    assert stats.loc[2, "dup_bytes"] > 0     # the fixture really overlaps
    assert (len(docs[2].encode()) - len(out.loc[2, "data"])
            == stats.loc[2, "dup_bytes"])
    # survivors are the non-duplicate chunks in order: subsequence check
    d2 = out.loc[2, "data"].decode()
    it = iter(docs[2])
    assert all(ch in it for ch in d2) or d2 == ""


def test_dedup_docs_partition_and_path_invariance(ray_session):
    """Same output at any blocking and on the forced join path as on the
    broadcast path."""
    from sift_ray.functions.cdc import cdc_dedup_docs
    a = _text(11, 5000)
    docs = {i: (a if i % 2 else _text(20 + i, 2500)) for i in range(8)}
    base = cdc_dedup_docs(_docs_ds(docs), min_size=MIN, avg_size=AVG,
                          max_size=MAX).to_pandas()
    base = dict(zip(base["doc_id"], base["data"]))
    for kw in ({"num_parts": 5}, {"cuts_broadcast_limit": 0}):
        got = cdc_dedup_docs(_docs_ds(docs, 4), min_size=MIN,
                             avg_size=AVG, max_size=MAX,
                             **kw).to_pandas()
        assert dict(zip(got["doc_id"], got["data"])) == base, kw


def test_cli_cdc(ray_session, tmp_path):
    """CLI surface for the CDC family: chunks / stats / dedup all write
    parquet; dedup removes the planted duplicate's bytes."""
    import json as _json

    import pyarrow.parquet as pq

    from sift_ray.cli import main

    a = _text(31, 4000)
    docs = {1: a, 2: a, 3: _text(32, 2000)}
    src = tmp_path / "docs.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string())}), str(src))
    for action in ("chunks", "stats", "dedup"):
        out = tmp_path / action
        assert main(["cdc", action, "--input", str(src),
                     "--output", str(out), "--min-size", str(MIN),
                     "--avg-size", str(AVG), "--max-size", str(MAX)]) == 0
    ded = pq.ParquetDataset(str(tmp_path / "dedup")).read().to_pandas() \
        .set_index("doc_id")
    assert ded.loc[2, "data"] == b""
    assert ded.loc[1, "data"] == a.encode()
    st = pq.ParquetDataset(str(tmp_path / "stats")).read().to_pandas() \
        .set_index("doc_id")
    assert st.loc[2, "dup_bytes"] == 4000
