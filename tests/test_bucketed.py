"""Co-partitioned bucketed storage: write-once exchange, exchange-free
joins, bucket pruning, manifest resume (sources/bucketed.py)."""

import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _tables():
    rng = np.random.RandomState(2)
    left = pa.table({
        "k": pa.array(rng.randint(0, 40, 200), pa.int64()),
        "lv": pa.array(np.arange(200), pa.int64())})
    right = pa.table({
        "k": pa.array(np.arange(0, 50, 2), pa.int64()),
        "rv": pa.array([f"v{i}" for i in range(0, 50, 2)], pa.string())})
    return left, right


@pytest.fixture()
def bucketed_dirs(ray_session, tmp_path):
    import ray.data as rd
    from sift_ray.sources.bucketed import write_bucketed

    left, right = _tables()
    ld, rd_ = str(tmp_path / "l"), str(tmp_path / "r")
    write_bucketed(rd.from_arrow(left).repartition(7), ld, "k", buckets=8)
    write_bucketed(rd.from_arrow(right), rd_, "k", buckets=8)
    return left, right, ld, rd_


def test_join_bucketed_inner_semi_anti(ray_session, bucketed_dirs):
    from sift_ray.sources.bucketed import join_bucketed

    left, right, ld, rd_ = bucketed_dirs
    lpd, rpd = left.to_pandas(), right.to_pandas()

    got = (join_bucketed(ld, rd_, on="k").to_pandas()
           .sort_values(["k", "lv"]).reset_index(drop=True))
    exp = (lpd.merge(rpd, on="k").sort_values(["k", "lv"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp[got.columns.tolist()])

    semi = (join_bucketed(ld, rd_, on="k", how="semi").to_pandas()
            .sort_values(["k", "lv"]).reset_index(drop=True))
    exp_semi = (lpd[lpd.k.isin(set(rpd.k))].sort_values(["k", "lv"])
                .reset_index(drop=True))
    pd.testing.assert_frame_equal(semi, exp_semi)

    anti = (join_bucketed(ld, rd_, on="k", how="anti").to_pandas()
            .sort_values(["k", "lv"]).reset_index(drop=True))
    exp_anti = (lpd[~lpd.k.isin(set(rpd.k))].sort_values(["k", "lv"])
                .reset_index(drop=True))
    pd.testing.assert_frame_equal(anti, exp_anti)


def test_write_bucketed_resume_and_prune(ray_session, bucketed_dirs):
    import ray.data as rd
    from sift_ray.sources.bucketed import read_bucketed, write_bucketed

    left, _right, ld, _ = bucketed_dirs
    # all buckets committed: rewrite is a pure manifest read
    t0 = time.time()
    write_bucketed(rd.from_arrow(left), ld, "k", buckets=8)
    assert time.time() - t0 < 1.0

    # full read-back equals input (as a multiset)
    back = (read_bucketed(ld).to_pandas().sort_values(["k", "lv"])
            .reset_index(drop=True))
    exp = (left.to_pandas().sort_values(["k", "lv"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(back, exp)

    # pruned point lookup reads only matching buckets and filters exactly
    vals = [3, 17]
    got = (read_bucketed(ld, key_values=vals, key="k", buckets=8)
           .to_pandas().sort_values(["k", "lv"]).reset_index(drop=True))
    exp2 = exp[exp.k.isin(vals)].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp2)


def test_agg_bucketed_matches_pandas(ray_session, bucketed_dirs):
    from sift_ray.sources.bucketed import agg_bucketed

    left, _right, ld, _ = bucketed_dirs
    got = (agg_bucketed(ld, key="k",
                        aggs=[(None, "count_all"), ("lv", "sum"),
                              ("lv", "min")])
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = (left.to_pandas().groupby("k")
           .agg(count_all=("lv", "size"), lv_sum=("lv", "sum"),
                lv_min=("lv", "min"))
           .reset_index().sort_values("k").reset_index(drop=True))
    assert list(got["k"]) == list(exp["k"])
    assert list(got["count_all"]) == list(exp["count_all"])
    assert list(got["lv_sum"]) == list(exp["lv_sum"])
    assert list(got["lv_min"]) == list(exp["lv_min"])


def test_append_bucketed_exactly_once(ray_session, tmp_path):
    """Incremental ingest: a delta merges into the bucketed table; the
    SAME ingest_id replayed (any partitioning) is a no-op; a different
    ingest_id applies again. Result always equals a from-scratch write of
    the union."""
    import ray.data as rd
    from sift_ray.sources.bucketed import (append_bucketed, read_bucketed,
                                           write_bucketed)

    base = pa.table({"k": pa.array(range(0, 60), pa.int64()),
                     "v": pa.array(range(100, 160), pa.int64())})
    delta = pa.table({"k": pa.array(range(40, 90), pa.int64()),
                      "v": pa.array(range(940, 990), pa.int64())})
    d = str(tmp_path / "b")
    write_bucketed(rd.from_arrow(base), d, "k", buckets=6)
    append_bucketed(rd.from_arrow(delta).repartition(4), d, "k",
                    ingest_id="dump-001")

    def snapshot():
        return (read_bucketed(d).to_pandas().sort_values(["k", "v"])
                .reset_index(drop=True))

    exp = (pa.concat_tables([base, delta]).to_pandas()
           .sort_values(["k", "v"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(snapshot(), exp)

    # replay with the same id (different partitioning): byte-level no-op
    t0 = time.time()
    append_bucketed(rd.from_arrow(delta).repartition(2), d, "k",
                    ingest_id="dump-001")
    assert time.time() - t0 < 5.0
    pd.testing.assert_frame_equal(snapshot(), exp)

    # a new id applies again (duplicate rows now present twice)
    append_bucketed(rd.from_arrow(delta), d, "k", ingest_id="dump-002")
    exp2 = (pa.concat_tables([base, delta, delta]).to_pandas()
            .sort_values(["k", "v"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(snapshot(), exp2)


def test_join_bucketed_rejects_mismatched_buckets(ray_session, tmp_path):
    import ray.data as rd
    from sift_ray.sources.bucketed import join_bucketed, write_bucketed

    left, right = _tables()
    ld, rd_ = str(tmp_path / "l2"), str(tmp_path / "r2")
    write_bucketed(rd.from_arrow(left), ld, "k", buckets=8)
    write_bucketed(rd.from_arrow(right), rd_, "k", buckets=4)
    with pytest.raises(AssertionError):
        join_bucketed(ld, rd_, on="k")


def _doc_table():
    texts = ["the quick brown fox", "jumps over the lazy dog",
             "hash join dup hash", "", "dup dup dup",
             "a b c d e f", "hash table scan", "join the club"]
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_text_index_build_query_matches_streaming(ray_session, tmp_path):
    import ray.data as rd
    from sift_ray.functions.corpus import bm25_topk
    from sift_ray.sources.text_index import (build_text_index,
                                             query_text_index)

    docs = _doc_table()
    d = str(tmp_path / "idx")
    meta = build_text_index(rd.from_arrow(docs).repartition(3), d,
                            buckets=8)
    # N counts the empty document; token count excludes it
    assert meta["n_docs"] == docs.num_rows
    assert meta["n_tokens"] == sum(len(t.split()) for t in
                                   docs.column("text").to_pylist())

    got = query_text_index(d, ["hash", "join", "dup"], k=5).to_pandas()
    want = bm25_topk(rd.from_arrow(docs), ["hash", "join", "dup"],
                     k=5).to_pandas()
    pd.testing.assert_frame_equal(got, want)


def test_text_index_build_resumes_noop(ray_session, tmp_path):
    import time

    import ray.data as rd
    from sift_ray.sources.text_index import build_text_index

    d = str(tmp_path / "idx2")
    m1 = build_text_index(rd.from_arrow(_doc_table()), d, buckets=4)
    t0 = time.time()
    m2 = build_text_index(rd.from_arrow(_doc_table()), d, buckets=4)
    assert m1 == m2
    assert time.time() - t0 < 10.0


def test_text_index_query_prunes_buckets(ray_session, tmp_path):
    """A one-term query must read at most one bucket file."""
    import numpy as np
    import ray.data as rd
    from sift_ray.functions.corpus import _hash_word_array
    from sift_ray.sources.bucketed import _bucket_of, _bucket_paths
    from sift_ray.sources.text_index import (build_text_index,
                                             query_text_index)

    d = str(tmp_path / "idx3")
    build_text_index(rd.from_arrow(_doc_table()), d, buckets=8)
    paths = _bucket_paths(d)
    assert len(paths) > 1  # pruning is meaningful only with many buckets
    th = _hash_word_array(pa.array(["hash"], pa.string())).astype("int64")
    want_bucket = int(_bucket_of(pa.array(th.tolist(), pa.int64()), 8)[0])
    assert want_bucket in paths
    got = query_text_index(d, ["hash"], k=10).to_pandas()
    # docs 2 and 6 contain "hash"
    assert set(got["doc_id"]) == {2, 6}


def test_zonemap_write_prune_read(ray_session, tmp_path):
    import numpy as np
    import ray.data as rd
    from sift_ray.sources.zonemap import (pruned_paths, read_key_range,
                                          write_sorted)

    rng = np.random.RandomState(7)
    vals = rng.randint(0, 1000, size=500).astype("int64")
    t = pa.table({"id": pa.array(range(500), pa.int64()),
                  "v": pa.array(vals, pa.int64())})
    d = str(tmp_path / "zm")
    summary = write_sorted(rd.from_arrow(t).repartition(4), d, key="v",
                           files=10)
    assert summary["rows"] == 500

    # file-level pruning: a narrow range must select a strict subset
    all_paths = pruned_paths(d)
    narrow = pruned_paths(d, 100, 199)
    assert 0 < len(narrow) < len(all_paths)

    got = (read_key_range(d, 100, 199).to_pandas()
           .sort_values(["id"]).reset_index(drop=True))
    exp = (t.to_pandas().query("100 <= v <= 199")
           .sort_values(["id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["id", "v"]], exp[["id", "v"]])

    # unbounded read returns everything
    assert read_key_range(d).count() == 500

    # resume is a no-op
    import time
    t0 = time.time()
    write_sorted(rd.from_arrow(t), d, key="v", files=10)
    assert time.time() - t0 < 10.0


def test_text_index_incremental_append(ray_session, tmp_path):
    """Index built on half the corpus + exactly-once delta append must
    answer queries identically to an index built on the full corpus."""
    import ray.data as rd
    from sift_ray.functions.corpus import bm25_topk
    from sift_ray.sources.text_index import (append_text_index,
                                             build_text_index,
                                             query_text_index)

    docs = _doc_table()
    first, second = docs.slice(0, 4), docs.slice(4)
    d = str(tmp_path / "idx_inc")
    build_text_index(rd.from_arrow(first), d, buckets=8)
    m1 = append_text_index(rd.from_arrow(second), d, ingest_id="dump-01")
    assert m1["n_docs"] == docs.num_rows

    got = query_text_index(d, ["hash", "join", "dup"], k=5).to_pandas()
    want = bm25_topk(rd.from_arrow(docs), ["hash", "join", "dup"],
                     k=5).to_pandas()
    pd.testing.assert_frame_equal(got, want)

    # replay with the same id (different partitioning): pure no-op
    m2 = append_text_index(rd.from_arrow(second).repartition(3), d,
                           ingest_id="dump-01")
    assert m2 == m1
    got2 = query_text_index(d, ["hash", "join", "dup"], k=5).to_pandas()
    pd.testing.assert_frame_equal(got2, want)


def test_text_index_and_mode(ray_session, tmp_path):
    import ray.data as rd
    from sift_ray.sources.text_index import (build_text_index,
                                             query_text_index)

    d = str(tmp_path / "idx_and")
    build_text_index(rd.from_arrow(_doc_table()), d, buckets=8)
    got = query_text_index(d, ["hash", "dup"], k=10,
                           mode="and").to_pandas()
    # only doc 2 ("hash join dup hash") contains BOTH terms
    assert set(got["doc_id"]) == {2}
    # OR mode is a superset
    got_or = query_text_index(d, ["hash", "dup"], k=10).to_pandas()
    assert set(got["doc_id"]) <= set(got_or["doc_id"])


def test_zonemap_append_exactly_once(ray_session, tmp_path):
    """Delta ingest into the sorted store: merged reads equal a fresh
    full write; replay with the same id is a no-op; out-of-range keys
    clip into the edge files with true zonemaps."""
    import numpy as np
    import ray.data as rd
    from sift_ray.sources.zonemap import (append_sorted, pruned_paths,
                                          read_key_range, write_sorted)

    rng = np.random.RandomState(11)
    base_v = rng.randint(100, 900, size=300).astype("int64")
    # delta includes keys outside the original [min, max] routing range
    delta_v = np.concatenate([rng.randint(0, 1200, size=150), [5, 1190]]) \
        .astype("int64")
    base = pa.table({"id": pa.array(range(300), pa.int64()),
                     "v": pa.array(base_v, pa.int64())})
    delta = pa.table({"id": pa.array(range(300, 452), pa.int64()),
                      "v": pa.array(delta_v, pa.int64())})

    d = str(tmp_path / "zma")
    write_sorted(rd.from_arrow(base), d, key="v", files=8)
    s = append_sorted(rd.from_arrow(delta), d, ingest_id="dump-01")
    assert s["rows"] == 452

    both = pa.concat_tables([base, delta]).to_pandas()
    for lo, hi in [(None, None), (0, 120), (850, 1200)]:
        got = (read_key_range(d, lo, hi).to_pandas()
               .sort_values("id").reset_index(drop=True))
        q = both
        if lo is not None:
            q = q[q.v >= lo]
        if hi is not None:
            q = q[q.v <= hi]
        exp = q.sort_values("id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got[["id", "v"]], exp[["id", "v"]])

    # replay (different partitioning): byte-level no-op
    import time
    t0 = time.time()
    s2 = append_sorted(rd.from_arrow(delta).repartition(3), d,
                       ingest_id="dump-01")
    assert s2["rows"] == 452 and time.time() - t0 < 10.0


def test_zonemap_secondary_column_pruning(ray_session, tmp_path):
    """A column correlated with the sort key prunes files via its
    recorded per-file zones; results equal an exact filter."""
    import numpy as np
    import ray.data as rd
    from sift_ray.sources.zonemap import (pruned_paths, read_key_range,
                                          write_sorted)

    n = 400
    v = np.arange(n, dtype="int64")
    corr = v * 10 + 3  # perfectly correlated secondary column
    t = pa.table({"id": pa.array(range(n), pa.int64()),
                  "v": pa.array(v, pa.int64()),
                  "corr": pa.array(corr, pa.int64())})
    d = str(tmp_path / "zmc")
    write_sorted(rd.from_arrow(t).repartition(4), d, key="v", files=8)

    all_paths = pruned_paths(d)
    sec = pruned_paths(d, 1000, 1490, col="corr")
    assert 0 < len(sec) < len(all_paths)

    got = (read_key_range(d, 1000, 1490, col="corr").to_pandas()
           .sort_values("id").reset_index(drop=True))
    exp = (t.to_pandas().query("1000 <= corr <= 1490")
           .sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["id", "v", "corr"]],
                                  exp[["id", "v", "corr"]])


def test_phrase_query_positions(ray_session, tmp_path):
    import pytest as _pytest
    import ray.data as rd
    from sift_ray.sources.text_index import build_text_index, phrase_query

    texts = ["the cat sat on the mat",
             "cat sat cat sat cat",
             "the the the",          # repeated-term phrase target
             "sat the cat",
             ""]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    d = str(tmp_path / "pidx")
    build_text_index(rd.from_arrow(t), d, buckets=4, positional=True)

    got = phrase_query(d, ["cat", "sat"]).to_pandas()
    assert dict(zip(got["doc_id"], got["n_matches"])) == {0: 1, 1: 2}

    # repeated term: "the the" occurs twice in doc 2 (overlapping)
    got = phrase_query(d, ["the", "the"]).to_pandas()
    assert dict(zip(got["doc_id"], got["n_matches"])) == {2: 2}

    # 3-term phrase
    got = phrase_query(d, ["the", "cat", "sat"]).to_pandas()
    assert dict(zip(got["doc_id"], got["n_matches"])) == {0: 1}

    # absent phrase
    assert phrase_query(d, ["mat", "cat"]).count() == 0

    # non-positional index refuses
    d2 = str(tmp_path / "npidx")
    build_text_index(rd.from_arrow(t), d2, buckets=4)
    with _pytest.raises(AssertionError):
        phrase_query(d2, ["cat", "sat"])


def test_append_bucketed_delta_mode_and_compaction(ray_session, tmp_path):
    """O(delta) ingest: delta files become visible through the manifest
    record only; reads/joins/aggs see the union; replay is a no-op;
    compaction folds back to one file per bucket with identical rows."""
    import time

    import numpy as np
    import ray.data as rd
    from sift_ray.sources.bucketed import (_bucket_files, agg_bucketed,
                                           append_bucketed,
                                           compact_bucketed, join_bucketed,
                                           read_bucketed, write_bucketed)

    rng = np.random.RandomState(4)
    base = pa.table({"k": pa.array(rng.randint(0, 20, 120), pa.int64()),
                     "v": pa.array(np.arange(120), pa.int64())})
    delta = pa.table({"k": pa.array(rng.randint(0, 20, 50), pa.int64()),
                      "v": pa.array(np.arange(1000, 1050), pa.int64())})
    d = str(tmp_path / "lsm")
    write_bucketed(rd.from_arrow(base), d, "k", buckets=4)
    s = append_bucketed(rd.from_arrow(delta), d, "k",
                        ingest_id="dump-A", mode="delta")
    exp = (pa.concat_tables([base, delta]).to_pandas()
           .sort_values(["k", "v"]).reset_index(drop=True))

    def snapshot():
        return (read_bucketed(d).to_pandas()
                .sort_values(["k", "v"]).reset_index(drop=True))

    assert s["rows"] == len(exp)
    pd.testing.assert_frame_equal(snapshot()[["k", "v"]], exp[["k", "v"]])
    assert any(len(fs) > 1 for fs in _bucket_files(d).values())

    # replay: byte-level no-op
    t0 = time.time()
    append_bucketed(rd.from_arrow(delta).repartition(2), d, "k",
                    ingest_id="dump-A", mode="delta")
    assert time.time() - t0 < 5.0
    pd.testing.assert_frame_equal(snapshot()[["k", "v"]], exp[["k", "v"]])

    # exchange-free join + agg read the delta files too
    rdir = str(tmp_path / "lsm_r")
    right = pa.table({"k": pa.array(list(range(20)), pa.int64()),
                      "w": pa.array([f"h{i}" for i in range(20)],
                                    pa.string())})
    write_bucketed(rd.from_arrow(right), rdir, "k", buckets=4)
    j = join_bucketed(d, rdir, on="k").to_pandas()
    expected_join = exp.merge(right.to_pandas(), on="k")
    assert len(j) == len(expected_join)
    a = (agg_bucketed(d, "k", [("v", "sum")]).to_pandas()
         .sort_values("k").reset_index(drop=True))
    exp_agg = (exp.groupby("k", as_index=False)["v"].sum()
               .rename(columns={"v": "v_sum"}))
    pd.testing.assert_frame_equal(a, exp_agg, check_dtype=False)

    # compaction: one file per bucket, identical rows, idempotent
    r = compact_bucketed(d, "k")
    assert r["compacted"] >= 1
    assert all(len(fs) == 1 for fs in _bucket_files(d).values())
    pd.testing.assert_frame_equal(snapshot()[["k", "v"]], exp[["k", "v"]])
    r2 = compact_bucketed(d, "k")
    assert r2["compacted"] == 0

    # a second ingest after compaction still applies exactly once
    append_bucketed(rd.from_arrow(delta), d, "k",
                    ingest_id="dump-B", mode="delta")
    exp2 = (pa.concat_tables([base, delta, delta]).to_pandas()
            .sort_values(["k", "v"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(snapshot()[["k", "v"]],
                                  exp2[["k", "v"]])


def test_text_index_delta_append_and_compact(ray_session, tmp_path):
    """O(delta) index maintenance: delta postings land as listed files,
    queries equal build-full; compaction preserves answers."""
    import ray.data as rd
    from sift_ray.functions.corpus import bm25_topk
    from sift_ray.sources.bucketed import compact_bucketed
    from sift_ray.sources.text_index import (append_text_index,
                                             build_text_index,
                                             query_text_index)

    docs = _doc_table()
    first, second = docs.slice(0, 4), docs.slice(4)
    d = str(tmp_path / "idx_lsm")
    build_text_index(rd.from_arrow(first), d, buckets=8)
    append_text_index(rd.from_arrow(second), d, ingest_id="dump-D",
                      mode="delta")
    want = bm25_topk(rd.from_arrow(docs), ["hash", "join", "dup"],
                     k=5).to_pandas()
    got = query_text_index(d, ["hash", "join", "dup"], k=5).to_pandas()
    pd.testing.assert_frame_equal(got, want)

    compact_bucketed(d, "term")
    got2 = query_text_index(d, ["hash", "join", "dup"], k=5).to_pandas()
    pd.testing.assert_frame_equal(got2, want)


def test_zonemap_delta_append_and_compact(ray_session, tmp_path):
    """O(delta) sorted-store ingest: zones widen truthfully (pruning
    never drops a matching file), reads equal a fresh full write, and
    compaction re-tightens the zones."""
    import numpy as np
    import ray.data as rd
    from sift_ray.sources.zonemap import (append_sorted, compact_sorted,
                                          pruned_paths, read_key_range,
                                          write_sorted)

    rng = np.random.RandomState(21)
    base = pa.table({"id": pa.array(range(200), pa.int64()),
                     "v": pa.array(rng.randint(0, 800, 200), pa.int64())})
    delta = pa.table({"id": pa.array(range(200, 280), pa.int64()),
                      "v": pa.array(rng.randint(0, 800, 80), pa.int64())})
    d = str(tmp_path / "zml")
    write_sorted(rd.from_arrow(base), d, key="v", files=6)
    s = append_sorted(rd.from_arrow(delta), d, ingest_id="dA",
                      mode="delta")
    assert s["rows"] == 280

    both = pa.concat_tables([base, delta]).to_pandas()

    def check():
        for lo, hi in [(None, None), (100, 250), (700, 800)]:
            got = (read_key_range(d, lo, hi).to_pandas()
                   .sort_values("id").reset_index(drop=True))
            q = both
            if lo is not None:
                q = q[q.v >= lo]
            if hi is not None:
                q = q[q.v <= hi]
            exp = q.sort_values("id").reset_index(drop=True)
            pd.testing.assert_frame_equal(got[["id", "v"]],
                                          exp[["id", "v"]])

    check()
    # replay no-op
    import time
    t0 = time.time()
    append_sorted(rd.from_arrow(delta).repartition(3), d, ingest_id="dA",
                  mode="delta")
    assert time.time() - t0 < 5.0
    check()
    # compaction: single files again, zones re-tightened, rows equal
    r = compact_sorted(d)
    assert r["compacted"] >= 1
    assert compact_sorted(d)["compacted"] == 0
    check()
    narrow = pruned_paths(d, 0, 50)
    assert len(narrow) < len(pruned_paths(d))


def test_delta_crash_windows_are_safe(ray_session, tmp_path):
    """Simulated crash windows of the delta protocol: (a) a delta file
    written WITHOUT its record update is invisible to readers and the
    same ingest retries cleanly; (b) after compaction commits, stale
    unlisted files are swept and never read."""
    import os

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd
    from sift_ray.sources.bucketed import (_bucket_files, append_bucketed,
                                           compact_bucketed, read_bucketed,
                                           write_bucketed)
    from sift_ray.state.manifest import Manifest

    base = pa.table({"k": pa.array(range(40), pa.int64()),
                     "v": pa.array(range(40), pa.int64())})
    delta = pa.table({"k": pa.array(range(10, 30), pa.int64()),
                      "v": pa.array(range(500, 520), pa.int64())})
    d = str(tmp_path / "crash")
    write_bucketed(rd.from_arrow(base), d, "k", buckets=3)

    # (a) crash BEFORE the record update: orphan delta file on disk
    m = Manifest(d)
    orphan = os.path.join(m.partition_dir(0), "delta-deadbeef.parquet")
    pq.write_table(pa.table({"k": pa.array([999], pa.int64()),
                             "v": pa.array([999], pa.int64())}), orphan)
    back = read_bucketed(d).to_pandas()
    assert 999 not in set(back["k"])  # unlisted -> invisible
    assert len(back) == 40

    # the real ingest now lands exactly once despite the orphan
    append_bucketed(rd.from_arrow(delta), d, "k", ingest_id="dX",
                    mode="delta")
    back = read_bucketed(d).to_pandas()
    assert len(back) == 60 and 999 not in set(back["k"])

    # (b) compaction folds the listed files and sweeps stale ones
    compact_bucketed(d, "k")
    assert all(len(fs) == 1 for fs in _bucket_files(d).values())
    assert not os.path.exists(orphan)  # stale file swept
    back = read_bucketed(d).to_pandas()
    assert len(back) == 60 and sorted(back["k"].unique()) == \
        sorted(set(range(40)))


def test_bucketed_snapshot_time_travel(ray_session, tmp_path):
    """as_of reads reconstruct the table exactly as it stood after each
    ingest from the manifest ledger + per-ingest delta files; compaction
    destroys the history and the read REFUSES (SnapshotUnavailable)
    instead of answering wrong."""
    import ray.data as rd
    from sift_ray.sources.bucketed import (append_bucketed, compact_bucketed,
                                           read_bucketed, write_bucketed)
    from sift_ray.state.manifest import SNAPSHOT_BASE, SnapshotUnavailable

    def tbl(lo, hi):
        return pa.table({"k": pa.array(range(lo, hi), pa.int64()),
                         "v": pa.array([i * 10 for i in range(lo, hi)],
                                       pa.int64())})

    d = str(tmp_path / "snap")
    write_bucketed(rd.from_arrow(tbl(0, 100)), d, key="k", buckets=8)
    append_bucketed(rd.from_arrow(tbl(100, 150)), d, key="k",
                    ingest_id="d1", mode="delta")
    append_bucketed(rd.from_arrow(tbl(150, 200)), d, key="k",
                    ingest_id="d2", mode="delta")

    def ks(ds):
        return sorted(ds.to_pandas()["k"].tolist())

    assert ks(read_bucketed(d)) == list(range(200))
    assert ks(read_bucketed(d, as_of="d2")) == list(range(200))
    assert ks(read_bucketed(d, as_of="d1")) == list(range(150))
    assert ks(read_bucketed(d, as_of=SNAPSHOT_BASE)) == list(range(100))
    with pytest.raises(ValueError, match="unknown ingest id"):
        read_bucketed(d, as_of="never-happened")

    compact_bucketed(d, key="k")
    # history folded: older snapshots refuse; latest == current still fine
    with pytest.raises(SnapshotUnavailable):
        read_bucketed(d, as_of="d1")
    with pytest.raises(SnapshotUnavailable):
        read_bucketed(d, as_of=SNAPSHOT_BASE)
    assert ks(read_bucketed(d, as_of="d2")) == list(range(200))
    assert ks(read_bucketed(d)) == list(range(200))


def test_sorted_snapshot_time_travel(ray_session, tmp_path):
    import ray.data as rd
    from sift_ray.sources.zonemap import (append_sorted, compact_sorted,
                                          read_key_range, write_sorted)
    from sift_ray.state.manifest import SNAPSHOT_BASE, SnapshotUnavailable

    def tbl(keys):
        return pa.table({"k": pa.array(keys, pa.int64()),
                         "v": pa.array([x * 3 for x in keys], pa.int64())})

    d = str(tmp_path / "zsnap")
    write_sorted(rd.from_arrow(tbl(list(range(0, 1000, 2)))), d,
                 key="k", files=6)
    append_sorted(rd.from_arrow(tbl(list(range(1, 500, 2)))), d,
                  ingest_id="w1", mode="delta")
    append_sorted(rd.from_arrow(tbl(list(range(501, 1000, 2)))), d,
                  ingest_id="w2", mode="delta")

    def ks(ds):
        return sorted(ds.to_pandas()["k"].tolist())

    assert ks(read_key_range(d, 0, 999)) == list(range(1000))
    assert ks(read_key_range(d, 0, 999, as_of=SNAPSHOT_BASE)) \
        == list(range(0, 1000, 2))
    assert ks(read_key_range(d, 0, 999, as_of="w1")) \
        == sorted(list(range(0, 1000, 2)) + list(range(1, 500, 2)))
    # range pruning composes with the snapshot view
    assert ks(read_key_range(d, 100, 199, as_of="w1")) \
        == list(range(100, 200))
    compact_sorted(d)
    with pytest.raises(SnapshotUnavailable):
        read_key_range(d, 0, 999, as_of="w1")
    assert ks(read_key_range(d, 0, 999, as_of="w2")) == list(range(1000))


def test_cli_zonemap_as_of_read(ray_session, tmp_path, capsys):
    """CLI time-travel: zonemap read --as-of reconstructs the pre-append
    snapshot from the manifest ledger."""
    import json as _json

    import pyarrow.parquet as pq

    from sift_ray.cli import main

    base = str(tmp_path / "base.parquet")
    delta = str(tmp_path / "delta.parquet")
    pq.write_table(pa.table({"k": pa.array(range(0, 40), pa.int64())}), base)
    pq.write_table(pa.table({"k": pa.array(range(40, 60), pa.int64())}),
                   delta)
    store = str(tmp_path / "store")
    assert main(["zonemap", "write", "--store", store, "--input", base,
                 "--key", "k", "--files", "4"]) == 0
    capsys.readouterr()
    assert main(["zonemap", "append", "--store", store, "--input", delta,
                 "--ingest-id", "w1", "--mode", "delta"]) == 0
    capsys.readouterr()
    assert main(["zonemap", "read", "--store", store, "--limit", "100",
                 "--as-of", "__base__"]) == 0
    lines = [_json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    ks = sorted(r["k"] for r in lines if "k" in r)
    assert ks == list(range(0, 40))


def test_bucketed_delta_schema_evolution(ray_session, tmp_path):
    """A delta ingest may ADD a nullable column (crawl dumps grow fields
    over time): readers unify the file schemas (old rows null-padded) and
    compaction folds the union schema — pinned here so the LSM path keeps
    supporting it."""
    import ray.data as rd
    from sift_ray.sources.bucketed import (append_bucketed, compact_bucketed,
                                           read_bucketed, write_bucketed)

    d = str(tmp_path / "evo")
    base = pa.table({"k": pa.array(range(20), pa.int64()),
                     "v": pa.array(range(20), pa.int64())})
    delta = pa.table({"k": pa.array(range(20, 30), pa.int64()),
                      "v": pa.array(range(20, 30), pa.int64()),
                      "lang": pa.array(["en"] * 10)})
    write_bucketed(rd.from_arrow(base), d, key="k", buckets=4)
    append_bucketed(rd.from_arrow(delta), d, key="k",
                    ingest_id="i1", mode="delta")
    for label in ("delta", "compacted"):
        df = read_bucketed(d).to_pandas().sort_values("k")
        assert sorted(df.columns) == ["k", "lang", "v"], label
        assert len(df) == 30, label
        assert df["lang"].notna().sum() == 10, label
        assert df[df["k"] >= 20]["lang"].notna().all(), label
        if label == "delta":
            compact_bucketed(d, key="k")


def _kv(ids, tag):
    return pa.table({"k": pa.array(ids, pa.int64()),
                     "v": pa.array([f"{tag}{i}" for i in ids])})


def test_upsert_bucketed_replaces_and_inserts(ray_session, tmp_path):
    """MERGE semantics: an upsert delta REPLACES every existing row of
    its keys and inserts unknown keys; delta mode resolves shadowing at
    read time, merge mode folds eagerly — identical logical rows."""
    import ray.data as rd
    from sift_ray.sources.bucketed import (read_bucketed, upsert_bucketed,
                                           write_bucketed)

    exp = {i: f"b{i}" for i in range(30)}
    exp.update({0: "u0", 7: "u7", 14: "u14", 100: "u100"})
    for mode in ("delta", "merge"):
        d = str(tmp_path / f"up_{mode}")
        write_bucketed(rd.from_arrow(_kv(range(30), "b")), d,
                       key="k", buckets=4)
        upsert_bucketed(rd.from_arrow(_kv([0, 7, 14, 100], "u")), d,
                        key="k", ingest_id="u1", mode=mode)
        got = {r["k"]: r["v"] for r in read_bucketed(d).take_all()}
        assert got == exp, mode


def test_upsert_replaces_all_rows_of_key(ray_session, tmp_path):
    """Whole-key replacement: a key with MULTIPLE base rows loses all of
    them; the upsert's own rows (possibly several) are what remains."""
    import ray.data as rd
    from sift_ray.sources.bucketed import (read_bucketed, upsert_bucketed,
                                           write_bucketed)

    base = pa.table({"k": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
                     "v": pa.array(list("abcdef"))})
    up = pa.table({"k": pa.array([1, 1], pa.int64()),
                   "v": pa.array(["X", "Y"])})
    d = str(tmp_path / "multi")
    write_bucketed(rd.from_arrow(base), d, key="k", buckets=2)
    upsert_bucketed(rd.from_arrow(up), d, key="k",
                    ingest_id="u1", mode="delta")
    got = sorted((r["k"], r["v"]) for r in read_bucketed(d).take_all())
    assert got == [(1, "X"), (1, "Y"), (2, "d"), (2, "e"), (3, "f")]


def test_delete_bucketed_tombstones(ray_session, tmp_path):
    """Keyed delete: tombstone files mask rows at read time (delta) or
    fold eagerly (merge); absent keys are a no-op; replay is a manifest
    no-op; a later upsert can re-insert a deleted key."""
    import ray.data as rd
    from sift_ray.sources.bucketed import (delete_bucketed, read_bucketed,
                                           upsert_bucketed, write_bucketed)

    for mode in ("delta", "merge"):
        d = str(tmp_path / f"del_{mode}")
        write_bucketed(rd.from_arrow(_kv(range(20), "b")), d,
                       key="k", buckets=4)
        delete_bucketed([3, 5, 999], d, key="k", ingest_id="x1", mode=mode)
        exp = {i: f"b{i}" for i in range(20) if i not in (3, 5)}
        got = {r["k"]: r["v"] for r in read_bucketed(d).take_all()}
        assert got == exp, mode
        # replay: exactly-once ledger makes it a pure no-op
        delete_bucketed([3, 5, 999], d, key="k", ingest_id="x1", mode=mode)
        got = {r["k"]: r["v"] for r in read_bucketed(d).take_all()}
        assert got == exp, mode
        # re-insert a deleted key via a later upsert
        upsert_bucketed(rd.from_arrow(_kv([3], "n")), d, key="k",
                        ingest_id="u2", mode=mode)
        exp[3] = "n3"
        got = {r["k"]: r["v"] for r in read_bucketed(d).take_all()}
        assert got == exp, mode


def test_upsert_delete_compaction_and_joins(ray_session, tmp_path):
    """Unresolved (delta) shadowing must give the same answers through
    every reader: read_bucketed, join_bucketed, agg_bucketed — and
    compaction folds to the identical logical table."""
    import pandas as pd
    import ray.data as rd
    from sift_ray.sources.bucketed import (agg_bucketed, compact_bucketed,
                                           delete_bucketed, join_bucketed,
                                           read_bucketed, upsert_bucketed,
                                           write_bucketed)

    d = str(tmp_path / "all")
    write_bucketed(rd.from_arrow(_kv(range(40), "b")), d,
                   key="k", buckets=8)
    upsert_bucketed(rd.from_arrow(_kv([0, 8, 16, 50], "u")), d,
                    key="k", ingest_id="u1", mode="delta")
    delete_bucketed([8, 9, 10], d, key="k", ingest_id="x1", mode="delta")

    exp = {i: f"b{i}" for i in range(40)}
    exp.update({0: "u0", 16: "u16", 50: "u50"})
    for k in (8, 9, 10):
        exp.pop(k)

    rdir = str(tmp_path / "right")
    write_bucketed(rd.from_arrow(pa.table(
        {"k": pa.array(range(0, 60, 2), pa.int64()),
         "w": pa.array(range(0, 60, 2), pa.int64())})),
        rdir, key="k", buckets=8)

    j = {(r["k"], r["v"]) for r in join_bucketed(d, rdir, on="k")
         .take_all()}
    assert j == {(k, v) for k, v in exp.items() if k % 2 == 0}

    a = {r["k"]: r["count_all"]
         for r in agg_bucketed(d, "k", [(None, "count_all")]).take_all()}
    assert a == {k: 1 for k in exp}

    compact_bucketed(d, key="k")
    got = {r["k"]: r["v"] for r in read_bucketed(d).take_all()}
    assert got == exp


def test_delete_entire_bucket_then_compact(ray_session, tmp_path):
    """Tombstoning EVERY row of a bucket must read back empty and
    compaction must fold the bucket to an empty record (files=[]),
    with other buckets untouched."""
    import ray.data as rd
    from sift_ray.sources.bucketed import (compact_bucketed, delete_bucketed,
                                           read_bucketed, write_bucketed)

    d = str(tmp_path / "wipe")
    write_bucketed(rd.from_arrow(_kv(range(12), "b")), d,
                   key="k", buckets=3)
    # keys 0,3,6,9 share bucket hash(k)%3==0 — wipe them all
    delete_bucketed([0, 3, 6, 9], d, key="k", ingest_id="x1", mode="delta")
    exp = {i: f"b{i}" for i in range(12) if i % 3 != 0}
    got = {r["k"]: r["v"] for r in read_bucketed(d).take_all()}
    assert got == exp
    compact_bucketed(d, key="k")
    got = {r["k"]: r["v"] for r in read_bucketed(d).take_all()}
    assert got == exp


def test_upsert_delete_time_travel(ray_session, tmp_path):
    """The ingest ledger reconstructs pre-upsert/pre-delete states:
    as_of base shows original rows, as_of the upsert shows replaced rows
    pre-delete; compaction folds history and snapshot reads refuse."""
    import pytest
    import ray.data as rd
    from sift_ray.sources.bucketed import (compact_bucketed, delete_bucketed,
                                           read_bucketed, upsert_bucketed,
                                           write_bucketed)
    from sift_ray.state.manifest import SNAPSHOT_BASE, SnapshotUnavailable

    d = str(tmp_path / "tt")
    write_bucketed(rd.from_arrow(_kv(range(10), "b")), d,
                   key="k", buckets=2)
    upsert_bucketed(rd.from_arrow(_kv([2, 4], "u")), d, key="k",
                    ingest_id="u1", mode="delta")
    delete_bucketed([4, 6], d, key="k", ingest_id="x1", mode="delta")

    base = {r["k"]: r["v"]
            for r in read_bucketed(d, as_of=SNAPSHOT_BASE).take_all()}
    assert base == {i: f"b{i}" for i in range(10)}

    after_up = {r["k"]: r["v"]
                for r in read_bucketed(d, as_of="u1").take_all()}
    exp_up = {i: f"b{i}" for i in range(10)}
    exp_up.update({2: "u2", 4: "u4"})
    assert after_up == exp_up

    latest = {r["k"]: r["v"] for r in read_bucketed(d).take_all()}
    exp_l = dict(exp_up)
    for k in (4, 6):
        exp_l.pop(k)
    assert latest == exp_l

    compact_bucketed(d, key="k")
    with pytest.raises(SnapshotUnavailable):
        read_bucketed(d, as_of="u1")
    assert {r["k"]: r["v"] for r in read_bucketed(d).take_all()} == exp_l


def test_upsert_crash_window_invisible(ray_session, tmp_path):
    """A delta file written but never recorded (crash before the record
    update) must be invisible to readers and safely overwritten by the
    retry."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd
    from sift_ray.sources.bucketed import (_delta_name, read_bucketed,
                                           upsert_bucketed, write_bucketed)

    d = str(tmp_path / "crash")
    write_bucketed(rd.from_arrow(_kv(range(8), "b")), d,
                   key="k", buckets=2)
    # simulate the crash: the file lands, the record never updates
    pq.write_table(_kv([1], "GHOST"),
                   os.path.join(d, "part-00001", _delta_name("u9")))
    got = {r["k"]: r["v"] for r in read_bucketed(d).take_all()}
    assert got == {i: f"b{i}" for i in range(8)}  # ghost invisible
    # the retry overwrites the ghost and commits atomically
    upsert_bucketed(rd.from_arrow(_kv([1], "u")), d, key="k",
                    ingest_id="u9", mode="delta")
    got = {r["k"]: r["v"] for r in read_bucketed(d).take_all()}
    exp = {i: f"b{i}" for i in range(8)}
    exp[1] = "u1"
    assert got == exp


def test_upsert_delete_string_keys(ray_session, tmp_path):
    """Shadowing works on non-integer keys (hashed routing + value-set
    masks must agree on strings)."""
    import ray.data as rd
    from sift_ray.sources.bucketed import (delete_bucketed, read_bucketed,
                                           upsert_bucketed, write_bucketed)

    base = pa.table({"url": pa.array([f"u{i}" for i in range(10)]),
                     "v": pa.array(range(10), pa.int64())})
    d = str(tmp_path / "str")
    write_bucketed(rd.from_arrow(base), d, key="url", buckets=4)
    upsert_bucketed(
        rd.from_arrow(pa.table({"url": pa.array(["u3", "zz"]),
                                "v": pa.array([33, 99], pa.int64())})),
        d, key="url", ingest_id="u1", mode="delta")
    delete_bucketed(["u5", "u6"], d, key="url", ingest_id="x1",
                    mode="delta")
    got = {r["url"]: r["v"] for r in read_bucketed(d).take_all()}
    exp = {f"u{i}": i for i in range(10) if i not in (5, 6)}
    exp.update({"u3": 33, "zz": 99})
    assert got == exp


def test_zorder_store_prunes_both_columns(ray_session, tmp_path):
    """Z-order layout: a range predicate on EITHER interleaved column
    prunes files from the manifest zones (the multi-dimension win a 1-D
    sort cannot give), the conjunction prunes hardest, and answers are
    exactly the plain filter's."""
    import numpy as np
    import ray.data as rd
    from sift_ray.sources.zonemap import (multi_pruned_paths, pruned_paths,
                                          read_multi_range, write_sorted,
                                          write_zordered)

    rng = np.random.RandomState(7)
    n = 20000
    t = pa.table({"x": pa.array(rng.randint(0, 1000, n), pa.int64()),
                  "y": pa.array(rng.randint(0, 1000, n), pa.int64()),
                  "v": pa.array(np.arange(n), pa.int64())})
    dz = str(tmp_path / "zo")
    write_zordered(rd.from_arrow(t).repartition(8), dz,
                   cols=["x", "y"], files=16)

    got = read_multi_range(dz, {"x": (100, 200), "y": (300, 400)}
                           ).to_pandas()
    df = t.to_pandas()
    exp = df[df.x.between(100, 200) & df.y.between(300, 400)]
    assert sorted(got["v"]) == sorted(exp["v"])
    assert "_zkey" not in got.columns

    allp = len(pruned_paths(dz))
    px = len(multi_pruned_paths(dz, {"x": (100, 200)}))
    py = len(multi_pruned_paths(dz, {"y": (300, 400)}))
    pxy = len(multi_pruned_paths(dz, {"x": (100, 200),
                                      "y": (300, 400)}))
    # each dimension alone prunes; the conjunction prunes at least as hard
    assert px < allp and py < allp and pxy <= min(px, py)

    # the 1-D x-sorted layout cannot prune the same y predicate
    d1 = str(tmp_path / "s1")
    write_sorted(rd.from_arrow(t).repartition(8), d1, key="x", files=16)
    assert len(pruned_paths(d1, 300, 400, col="y")) == len(pruned_paths(d1))


def test_zorder_append_and_compact(ray_session, tmp_path):
    """Deltas route through the PERSISTED quantization (identical
    z-keys), ride the exactly-once ledger, and compaction re-tightens
    zones without changing answers."""
    import numpy as np
    import ray.data as rd
    from sift_ray.sources.zonemap import (append_zordered, compact_sorted,
                                          read_multi_range, write_zordered)

    rng = np.random.RandomState(3)
    n = 5000
    t = pa.table({"x": pa.array(rng.randint(0, 500, n), pa.int64()),
                  "y": pa.array(rng.randint(0, 500, n), pa.int64()),
                  "v": pa.array(np.arange(n), pa.int64())})
    dz = str(tmp_path / "zo")
    write_zordered(rd.from_arrow(t), dz, cols=["x", "y"], files=8)
    delta = pa.table({"x": pa.array([150] * 5, pa.int64()),
                      "y": pa.array([350] * 5, pa.int64()),
                      "v": pa.array(range(n, n + 5), pa.int64())})
    append_zordered(rd.from_arrow(delta), dz, ingest_id="a1", mode="delta")
    # replay is a ledger no-op
    append_zordered(rd.from_arrow(delta), dz, ingest_id="a1", mode="delta")

    df = t.to_pandas()
    exp = sorted(df[df.x.between(100, 200) & df.y.between(300, 400)]["v"]
                 ) + list(range(n, n + 5))
    got = read_multi_range(dz, {"x": (100, 200), "y": (300, 400)}
                           ).to_pandas()
    assert sorted(got["v"]) == sorted(exp)
    compact_sorted(dz)
    got2 = read_multi_range(dz, {"x": (100, 200), "y": (300, 400)}
                            ).to_pandas()
    assert sorted(got2["v"]) == sorted(exp)


def test_write_sorted_quantile_boundaries_balance_skew(ray_session,
                                                       tmp_path):
    """boundaries="quantile" picks range edges from the distributed
    quantile sketch: under a heavily skewed key the largest file stays
    near the mean (equal-width concentrates ~half the table in one
    file), reads answer identically, and appends route through the
    persisted bounds exactly-once."""
    import numpy as np
    import ray.data as rd
    from sift_ray.sources.zonemap import (append_sorted, read_key_range,
                                          write_sorted)
    from sift_ray.state.manifest import Manifest

    rng = np.random.RandomState(11)
    v = rng.exponential(scale=50, size=40000).astype(np.int64)
    t = pa.table({"k": pa.array(v, pa.int64()),
                  "x": pa.array(np.arange(40000), pa.int64())})

    dw, dq = str(tmp_path / "w"), str(tmp_path / "q")
    write_sorted(rd.from_arrow(t).repartition(8), dw, key="k", files=16)
    write_sorted(rd.from_arrow(t).repartition(8), dq, key="k", files=16,
                 boundaries="quantile")

    def max_rows(d):
        return max(r.get("n_rows", 0) for r in Manifest(d).records())

    assert max_rows(dq) < max_rows(dw) / 3  # measured ~2.7k vs ~21.6k

    a = (read_key_range(dw, 20, 120).to_pandas()
         .sort_values("x").reset_index(drop=True))
    b = (read_key_range(dq, 20, 120).to_pandas()
         .sort_values("x").reset_index(drop=True))
    assert a.equals(b) and len(a) > 0

    delta = pa.table({"k": pa.array([30] * 7, pa.int64()),
                      "x": pa.array(range(100000, 100007), pa.int64())})
    append_sorted(rd.from_arrow(delta), dq, ingest_id="a1", mode="delta")
    append_sorted(rd.from_arrow(delta), dq, ingest_id="a1", mode="delta")
    c = read_key_range(dq, 30, 30).to_pandas()
    assert len(c) == int((v == 30).sum()) + 7


def test_bloom_index_point_lookup(ray_session, tmp_path):
    """Per-file bloom skip-index: point lookups on a NON-key column skip
    bloom-missing files (definite negatives), confirm hits exactly, and
    unindexed files (fresh deltas, compaction renames) are kept
    conservatively — pruning is always a correct superset."""
    import numpy as np
    import ray.data as rd
    from sift_ray.sources.bloomindex import (bloom_pruned_paths,
                                             build_bloom_index, read_point)
    from sift_ray.sources.zonemap import (append_sorted, compact_sorted,
                                          pruned_paths, write_sorted)

    rng = np.random.RandomState(5)
    n = 40000
    t = pa.table({
        "ts": pa.array(np.sort(rng.randint(0, 10**6, n)), pa.int64()),
        "url": pa.array([f"https://ex.com/p{i}"
                         for i in rng.permutation(n)]),
        "v": pa.array(np.arange(n), pa.int64())})
    d = str(tmp_path / "bl")
    write_sorted(rd.from_arrow(t).repartition(8), d, key="ts", files=16)
    build_bloom_index(d, ["url"])

    targets = ["https://ex.com/p123", "https://ex.com/p39999",
               "https://ex.com/p7000"]
    assert len(bloom_pruned_paths(d, "url", targets)) <= 6 < \
        len(pruned_paths(d))
    got = read_point(d, "url", targets).to_pandas()
    df = t.to_pandas()
    assert sorted(got["v"]) == sorted(df[df.url.isin(targets)]["v"])

    # absent value: no file passes, result typed-empty
    assert len(read_point(d, "url", ["https://nowhere/x"]).to_pandas()) == 0

    # fresh delta is unindexed -> conservative keep; incremental rebuild
    # indexes ONLY the new file
    delta = pa.table({"ts": pa.array([5] * 3, pa.int64()),
                      "url": pa.array(["https://ex.com/new1"] * 3),
                      "v": pa.array([n + 1] * 3, pa.int64())})
    append_sorted(rd.from_arrow(delta), d, ingest_id="a1", mode="delta")
    assert len(read_point(d, "url", ["https://ex.com/new1"]
                          ).to_pandas()) == 3
    out = build_bloom_index(d, ["url"])
    assert out["indexed_partitions"] == 1

    # compaction renames files -> blooms lapse, reads stay correct
    compact_sorted(d)
    got2 = read_point(d, "url", targets).to_pandas()
    assert sorted(got2["v"]) == sorted(got["v"])


def test_delete_range_retention_expiry(ray_session, tmp_path):
    """Retention expiry on the sorted store: files fully inside the
    expired range drop METADATA-ONLY, exactly one boundary file
    rewrites, replays are ledger no-ops, snapshot reads for states
    before the expiry refuse (SnapshotUnavailable), and new appends
    land in expired ranges again."""
    import numpy as np
    import pytest
    import ray.data as rd
    from sift_ray.sources.zonemap import (append_sorted, delete_range,
                                          read_key_range, write_sorted)
    from sift_ray.state.manifest import SNAPSHOT_BASE, SnapshotUnavailable

    n = 32000
    t = pa.table({"ts": pa.array(np.arange(n), pa.int64()),
                  "v": pa.array(np.arange(n) * 2, pa.int64())})
    d = str(tmp_path / "exp")
    write_sorted(rd.from_arrow(t).repartition(8), d, key="ts", files=16)
    append_sorted(rd.from_arrow(
        pa.table({"ts": pa.array([5, 31999], pa.int64()),
                  "v": pa.array([-1, -2], pa.int64())})),
        d, ingest_id="a1", mode="delta")

    out = delete_range(d, hi=9499, ingest_id="exp1")  # mid-file cutoff
    assert out["dropped_files"] == 4 and out["rewritten"] == 1, out

    got = read_key_range(d).to_pandas()
    # base rows ts 9500..31999 survive + the ts=31999 delta row; the
    # ts=5 delta row expired with its range
    assert got["ts"].min() == 9500 and len(got) == (n - 9500) + 1

    assert delete_range(d, hi=9499, ingest_id="exp1") == {
        "dropped_files": 0, "rewritten": 0, "untouched": 0}

    for snap in ("a1", SNAPSHOT_BASE):
        with pytest.raises(SnapshotUnavailable):
            read_key_range(d, as_of=snap)

    append_sorted(rd.from_arrow(
        pa.table({"ts": pa.array([3], pa.int64()),
                  "v": pa.array([30], pa.int64())})),
        d, ingest_id="a2", mode="delta")
    got3 = read_key_range(d, 0, 100).to_pandas()
    assert list(got3["ts"]) == [3] and list(got3["v"]) == [30]


def test_read_changes_cdc_feed(ray_session, tmp_path):
    """CDC over the ingest ledger: the feed carries exactly the
    post-`since` deposits (appends/upserts as rows, deletes as
    null-padded tombstone keys) reading ONLY delta files, and refuses
    after compaction folds the history instead of silently missing
    changes."""
    import pytest
    import ray.data as rd
    from sift_ray.sources.bucketed import (append_bucketed, compact_bucketed,
                                           delete_bucketed, read_changes,
                                           upsert_bucketed, write_bucketed)
    from sift_ray.state.manifest import SNAPSHOT_BASE, SnapshotUnavailable

    d = str(tmp_path / "cdc")
    write_bucketed(rd.from_arrow(_kv(range(20), "b")), d,
                   key="k", buckets=4)
    append_bucketed(rd.from_arrow(_kv([100], "a")), d, key="k",
                    ingest_id="a1", mode="delta")
    upsert_bucketed(rd.from_arrow(_kv([0, 5], "u")), d, key="k",
                    ingest_id="u1", mode="delta")
    delete_bucketed([3], d, key="k", ingest_id="x1", mode="delta")

    ch = read_changes(d, SNAPSHOT_BASE).to_pandas()
    got = sorted(zip(ch["k"], ch["_op"], ch["v"].fillna("~")))
    assert got == sorted([(100, "append", "a100"), (0, "upsert", "u0"),
                          (5, "upsert", "u5"), (3, "delete", "~")])

    ch2 = read_changes(d, "u1").to_pandas()
    assert sorted(zip(ch2["k"], ch2["_op"])) == [(3, "delete")]

    compact_bucketed(d, key="k")
    with pytest.raises(SnapshotUnavailable):
        read_changes(d, "u1")


def test_vacuum_reclaims_unlisted_files(ray_session, tmp_path):
    """vacuum removes crash leftovers (unlisted parquet, .tmp-part dirs)
    without touching listed files; reads are unchanged; idempotent."""
    import os

    import ray.data as rd
    from sift_ray.sources.bucketed import (append_bucketed, read_bucketed,
                                           vacuum, write_bucketed)

    left, _ = _tables()
    d = str(tmp_path / "store")
    write_bucketed(rd.from_arrow(left), d, "k", buckets=4)
    append_bucketed(rd.from_arrow(left.slice(0, 20)), d, "k",
                    ingest_id="i1", mode="delta")
    before = read_bucketed(d).to_pandas().sort_values(
        ["k", "lv"]).reset_index(drop=True)

    # plant crash leftovers: a stale unlisted parquet inside a live
    # partition and a .tmp-part staging dir from a killed write
    stale = os.path.join(d, "part-00000", "compact-deadbeef.parquet")
    with open(stale, "wb") as f:
        f.write(b"not even parquet")
    os.makedirs(os.path.join(d, ".tmp-part-00099"), exist_ok=True)
    with open(os.path.join(d, ".tmp-part-00099", "x.parquet"), "wb") as f:
        f.write(b"junk")

    out = vacuum(d)
    assert out["removed_files"] == 1
    assert out["removed_tmp_dirs"] == 1
    assert not os.path.exists(stale)
    assert not os.path.exists(os.path.join(d, ".tmp-part-00099"))

    after = read_bucketed(d).to_pandas().sort_values(
        ["k", "lv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)

    again = vacuum(d)
    assert again["removed_files"] == 0 and again["removed_tmp_dirs"] == 0


def test_vacuum_zonemap_store(ray_session, tmp_path):
    """Same reclaim over the sorted/zonemap store layout."""
    import os

    import ray.data as rd
    from sift_ray.sources.bucketed import vacuum
    from sift_ray.sources.zonemap import read_key_range, write_sorted

    t = pa.table({"k": pa.array(np.arange(500), pa.int64()),
                  "v": pa.array(np.arange(500) * 3, pa.int64())})
    d = str(tmp_path / "zstore")
    write_sorted(rd.from_arrow(t), d, "k", files=8)
    before = read_key_range(d, 100, 300).to_pandas().sort_values(
        "k").reset_index(drop=True)

    stale = os.path.join(d, "part-00002", "leftover.parquet")
    with open(stale, "wb") as f:
        f.write(b"junk")
    out = vacuum(d)
    assert out["removed_files"] == 1 and not os.path.exists(stale)

    after = read_key_range(d, 100, 300).to_pandas().sort_values(
        "k").reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)
