"""Property tests for the hash-partitioned vectorized groupby primitive
(sift_ray/functions/shuffle.py) — results must equal a pandas groupby and be
invariant to the partition count."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sift_ray.functions.shuffle import mix64, partitioned_group_agg


def _rand_df(n=5000, seed=11):
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "a": rng.randint(0, 500, n).astype(np.int64),
        "b": rng.randint(-3, 4, n).astype(np.int64),
        "v": rng.randint(-1000, 1000, n).astype(np.int64),
    })


def _expected(df):
    g = df.groupby(["a", "b"], sort=False).agg(
        v_sum=("v", "sum"), v_min=("v", "min"), n=("v", "size"))
    return g.reset_index().sort_values(["a", "b"]).reset_index(drop=True)


@pytest.mark.parametrize("num_parts", [1, 7, 64])
def test_partitioned_group_agg_matches_pandas(ray_session, num_parts):
    import ray.data as rd
    df = _rand_df()
    out = partitioned_group_agg(
        rd.from_pandas(df), ["a", "b"],
        [("v", "sum", "v_sum"), ("v", "min", "v_min"), (None, "count", "n")],
        num_parts=num_parts).to_pandas()
    out = out.sort_values(["a", "b"]).reset_index(drop=True)
    exp = _expected(df)
    pd.testing.assert_frame_equal(out.astype("int64"), exp.astype("int64"))


def test_partitioned_group_agg_string_key_via_key_fn(ray_session):
    import pyarrow as pa
    import ray.data as rd
    df = pd.DataFrame({"k": [f"key{i % 37:04x}" for i in range(2000)],
                       "v": np.arange(2000, dtype=np.int64)})

    def key_fn(batch: pa.Table):
        return [np.array([hash(s) & 0x7FFFFFFF
                          for s in batch.column("k").to_pylist()],
                         dtype=np.int64)]

    out = partitioned_group_agg(
        rd.from_pandas(df), ["k"], [("v", "sum", "v_sum")],
        num_parts=8, key_arrays_fn=key_fn).to_pandas()
    exp = (df.groupby("k")["v"].sum().reset_index()
           .rename(columns={"v": "v_sum"}))
    pd.testing.assert_frame_equal(
        out.sort_values("k").reset_index(drop=True),
        exp.sort_values("k").reset_index(drop=True))


def test_mix64_negative_keys_partition_in_range():
    arr = np.array([-5, -1, 0, 3, 2**40, -(2**40)], dtype=np.int64)
    part = mix64([arr]) % np.int64(16)
    assert ((part >= 0) & (part < 16)).all()


def test_session_windows_vectorized_matches_reference(ray_session):
    """The partition-vectorized sessionizer must match a per-user python
    reference on random event streams."""
    import ray.data as rd
    from sift_ray.functions.windows import session_windows

    rng = np.random.RandomState(5)
    n = 3000
    gap_s = 100
    users = rng.randint(0, 40, n).astype(np.int64)
    ts = rng.randint(0, 50_000, n).astype(np.int64) * 1_000_000  # us
    df = pd.DataFrame({"user_id": users,
                       "ts": pd.to_datetime(ts, unit="us")})

    out = (session_windows(rd.from_pandas(df), gap_s=gap_s).to_pandas()
           .sort_values(["user_id", "session_id"]).reset_index(drop=True))

    rows = []
    for uid, grp in df.assign(t=ts).groupby("user_id"):
        t = np.sort(grp["t"].to_numpy(np.int64))
        sid, start = 1, t[0]
        prev = t[0]
        count = 0
        for x in t:
            if x - prev > gap_s * 1_000_000:
                rows.append((uid, sid, count, start, prev))
                sid += 1
                start = x
                count = 0
            count += 1
            prev = x
        rows.append((uid, sid, count, start, prev))
    exp = (pd.DataFrame(rows, columns=["user_id", "session_id", "n_events",
                                       "start_us", "end_us"])
           .sort_values(["user_id", "session_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out.astype("int64"), exp.astype("int64"))


def test_session_windows_split_matches_plain_with_hot_user(ray_session):
    """Hot-user pre-split (split_s): one user owns 50% of events and
    sessions deliberately SPAN split boundaries; the two-stage path must be
    value-identical to the single-exchange path."""
    import ray.data as rd
    from sift_ray.functions.windows import session_windows

    rng = np.random.RandomState(7)
    n = 4000
    gap_s = 100
    split_s = 1000  # many events cross t = k*1000s boundaries within gap
    users = np.where(rng.rand(n) < 0.5, 0,
                     rng.randint(1, 30, n)).astype(np.int64)
    ts = rng.randint(0, 20_000, n).astype(np.int64) * 1_000_000
    df = pd.DataFrame({"user_id": users,
                       "ts": pd.to_datetime(ts, unit="us")})

    plain = (session_windows(rd.from_pandas(df), gap_s=gap_s).to_pandas()
             .sort_values(["user_id", "session_id"])
             .reset_index(drop=True))
    split = (session_windows(rd.from_pandas(df), gap_s=gap_s,
                             split_s=split_s).to_pandas()
             .sort_values(["user_id", "session_id"])
             .reset_index(drop=True))
    assert (plain["user_id"] == 0).sum() >= 1  # hot user produced sessions
    pd.testing.assert_frame_equal(split.astype("int64"),
                                  plain.astype("int64"))


def test_hash_join_salted_matches_unsalted(ray_session):
    """Hot-key salting: one key owns half the left rows; salted results must
    equal unsalted for inner, left, and anti joins."""
    import ray.data as rd
    from sift_ray.functions.shuffle import hash_join

    rng = np.random.RandomState(13)
    n = 3000
    lk = np.where(rng.rand(n) < 0.5, 42,
                  rng.randint(0, 200, n)).astype(np.int64)
    left = pd.DataFrame({"k": lk, "lv": np.arange(n, dtype=np.int64)})
    rk = np.arange(0, 150, dtype=np.int64)  # key 42 matches; 150..199 don't
    right = pd.DataFrame({"k": rk, "rv": rk * 10})

    for how in ("inner", "left", "anti"):
        base = (hash_join(rd.from_pandas(left), rd.from_pandas(right),
                          on="k", how=how).to_pandas()
                .sort_values(["k", "lv"]).reset_index(drop=True))
        salted = (hash_join(rd.from_pandas(left), rd.from_pandas(right),
                            on="k", how=how, salt=8).to_pandas()
                  .sort_values(["k", "lv"]).reset_index(drop=True))
        assert len(base) > 0
        pd.testing.assert_frame_equal(salted, base, check_dtype=False)


def test_exact_dedup_keeps_min_id(ray_session):
    import ray.data as rd
    from sift_ray.functions.dedup import exact_dedup
    df = pd.DataFrame({
        "doc_id": [5, 3, 9, 1, 7],
        "text": ["same", "same", "other", "same", "other"],
    })
    out = exact_dedup(rd.from_pandas(df)).to_pandas()
    got = {r.keep_doc_id: r.n_copies for r in out.itertuples()}
    assert got == {1: 3, 7: 2}


def test_dedup_docs_materializes_min_rows(ray_session):
    import ray.data as rd
    from sift_ray.functions.dedup import dedup_docs
    df = pd.DataFrame({
        "doc_id": [5, 3, 9, 1, 7, 2],
        "text": ["same", "same", "other", "same", "other", "unique"],
    })
    out = (dedup_docs(rd.from_pandas(df)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(out["doc_id"]) == [1, 2, 7]
    assert list(out["text"]) == ["same", "unique", "other"]


def test_near_dedup_docs_drops_higher_id_side(ray_session):
    import ray.data as rd
    from sift_ray.functions.dedup import near_dedup_docs
    base = "the quick brown fox jumps over the lazy dog again and again"
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [base, base + " tail",
                 "completely different words entirely distinct tokens here"],
    })
    out = near_dedup_docs(rd.from_pandas(df), k=3, threshold=0.5).to_pandas()
    assert sorted(out["doc_id"]) == [1, 3]  # 2 is the doc_b of the (1,2) pair


def _join_frames():
    left = pd.DataFrame({"k": [1, 2, 2, 3, 5], "lv": [10, 20, 21, 30, 50]})
    right = pd.DataFrame({"k": [1, 2, 4], "rv": ["a", "b", "d"]})
    return left, right


@pytest.mark.parametrize("num_parts", [1, 8])
def test_hash_join_inner_matches_pandas(ray_session, num_parts):
    import ray.data as rd
    from sift_ray.functions.shuffle import hash_join
    left, right = _join_frames()
    out = (hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                     num_parts=num_parts).to_pandas()
           .sort_values(["k", "lv"]).reset_index(drop=True))
    exp = (left.merge(right, on="k", how="inner")
           .sort_values(["k", "lv"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out, exp[["k", "lv", "rv"]])
    assert out["lv"].dtype == np.int64  # padded nulls must not leak float64


def test_hash_join_left(ray_session):
    import ray.data as rd
    from sift_ray.functions.shuffle import hash_join
    left, right = _join_frames()
    out = (hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                     how="left").to_pandas()
           .sort_values(["k", "lv"]).reset_index(drop=True))
    exp = (left.merge(right, on="k", how="left")
           .sort_values(["k", "lv"]).reset_index(drop=True))
    assert len(out) == len(exp) == 5
    assert out.loc[out.k == 5, "rv"].isna().all()


def test_hash_join_full_outer(ray_session):
    import ray.data as rd
    from sift_ray.functions.shuffle import hash_join
    left, right = _join_frames()  # left-only k=3,5; right-only k=4
    out = (hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                     how="full").to_pandas()
           .sort_values(["k", "lv"]).reset_index(drop=True))
    exp = (left.merge(right, on="k", how="outer")
           .sort_values(["k", "lv"]).reset_index(drop=True))
    assert len(out) == len(exp) == 6
    assert out.loc[out.k == 4, "lv"].isna().all()   # right-only row
    assert out.loc[out.k == 5, "rv"].isna().all()   # left-only row
    assert set(out.k) == {1, 2, 3, 4, 5}


def test_hash_join_full_preserves_big_int64_both_sides(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from sift_ray.functions.shuffle import hash_join
    big = (1 << 62) + 777  # not representable in float64
    left = pd.DataFrame({"k": np.array([1, 2], dtype=np.int64),
                         "lv": np.array([big, 20], dtype=np.int64)})
    right = pd.DataFrame({"k": np.array([2, 3], dtype=np.int64),
                          "rv": np.array([big + 1, 30], dtype=np.int64)})
    ds = hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                   how="full")
    tbl = pa.concat_tables(ds.iter_batches(batch_size=None,
                                           batch_format="pyarrow"))
    sch = dict(zip(ds.schema().names, ds.schema().types))
    assert pa.types.is_integer(sch["lv"]) and pa.types.is_integer(sch["rv"])
    rows = {k: (lv, rv) for k, lv, rv in
            zip(tbl.column("k").to_pylist(), tbl.column("lv").to_pylist(),
                tbl.column("rv").to_pylist())}
    assert rows[1] == (big, None)
    assert rows[2] == (20, big + 1)
    assert rows[3] == (None, 30)


@pytest.mark.parametrize("mbits", [1 << 16, 64])  # 64 bits: forces FPs
def test_hash_join_bloom_prefilter_matches_plain(ray_session, mbits):
    """Runtime-filter pushdown must be invisible in the results — for
    inner AND anti, even with a tiny bloom full of false positives
    (blooms have no false negatives, which is all correctness needs)."""
    import ray.data as rd
    from sift_ray.functions.shuffle import hash_join
    rng = np.random.default_rng(5)
    left = pd.DataFrame({"k": rng.integers(0, 1000, 500),
                         "lv": np.arange(500, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(0, 100, dtype=np.int64),
                          "rv": np.arange(100, dtype=np.int64) * 7})
    for how in ("inner", "anti"):
        plain = (hash_join(rd.from_pandas(left), rd.from_pandas(right),
                           on="k", how=how).to_pandas()
                 .sort_values(["k", "lv"]).reset_index(drop=True))
        bloom = (hash_join(rd.from_pandas(left), rd.from_pandas(right),
                           on="k", how=how, bloom_prefilter=mbits)
                 .to_pandas().sort_values(["k", "lv"])
                 .reset_index(drop=True))
        pd.testing.assert_frame_equal(bloom, plain), (how, mbits)


def test_hash_join_bloom_string_keys(ray_session):
    import ray.data as rd
    from sift_ray.functions.shuffle import hash_join
    left = pd.DataFrame({"k": [f"u{i}" for i in range(200)],
                         "lv": np.arange(200, dtype=np.int64)})
    right = pd.DataFrame({"k": [f"u{i}" for i in range(0, 200, 10)],
                          "rv": list(range(20))})
    plain = (hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k")
             .to_pandas().sort_values("lv").reset_index(drop=True))
    bloom = (hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                       bloom_prefilter=1 << 16)
             .to_pandas().sort_values("lv").reset_index(drop=True))
    pd.testing.assert_frame_equal(bloom, plain)
    assert len(plain) == 20


def test_hash_join_rejects_overlapping_columns(ray_session):
    import ray.data as rd
    from sift_ray.functions.shuffle import hash_join
    df = pd.DataFrame({"k": [1], "v": [2]})
    with pytest.raises(ValueError, match="disjoint"):
        hash_join(rd.from_pandas(df), rd.from_pandas(df.copy()), on="k")


@pytest.mark.parametrize("num_parts", [1, 5, 32])
def test_token_shards_prefix_sum_matches_reference(ray_session, num_parts):
    """Distributed ordered prefix sum == a sequential scan, for any
    partition count, including sparse non-contiguous ids."""
    import ray.data as rd
    from sift_ray.functions.sharding import token_shards
    rng = np.random.RandomState(3)
    ids = np.sort(rng.choice(10_000, size=400, replace=False)).astype(np.int64)
    texts = [" ".join(["w"] * int(k)) for k in rng.randint(0, 50, 400)]
    df = pd.DataFrame({"doc_id": ids, "text": texts})
    out = (token_shards(rd.from_pandas(df), shard_tokens=100,
                        num_parts=num_parts).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    toks = np.array([len(t.split()) for t in texts])
    start = np.cumsum(toks) - toks
    assert list(out["doc_id"]) == list(ids)
    assert list(out["n_tokens"]) == list(toks)
    assert list(out["start_offset"]) == list(start)
    assert list(out["shard_id"]) == list(start // 100)


def test_hll_approx_distinct_partition_invariant(ray_session):
    """HLL registers merge by max, so the estimate is identical no matter
    how the input is partitioned — and within the theoretical error."""
    import ray.data as rd
    from sift_ray.functions.sketch import approx_distinct
    n = 50_000
    vals = np.concatenate([np.arange(n), np.arange(n // 2)])  # dups
    one = rd.from_pandas(pd.DataFrame({"v": vals}))
    many = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(37)
    e1 = approx_distinct(one, "v", precision=12)
    e2 = approx_distinct(many, "v", precision=12)
    assert e1 == e2  # merge-exactness
    assert abs(e1 - n) / n < 0.05


def test_hll_string_column(ray_session):
    import ray.data as rd
    from sift_ray.functions.sketch import approx_distinct
    df = pd.DataFrame({"s": [f"user-{i % 300}" for i in range(5000)]})
    est = approx_distinct(rd.from_pandas(df), "s", precision=12)
    assert abs(est - 300) / 300 < 0.05


def test_near_dedup_docs_no_pairs_keeps_everything(ray_session):
    import ray.data as rd
    from sift_ray.functions.dedup import near_dedup_docs
    df = pd.DataFrame({"doc_id": [1, 2],
                       "text": ["alpha beta gamma delta words one",
                                "totally different content here two"]})
    out = near_dedup_docs(rd.from_pandas(df), k=3, threshold=0.5).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2]


def test_token_shards_single_doc(ray_session):
    import ray.data as rd
    from sift_ray.functions.sharding import token_shards
    df = pd.DataFrame({"doc_id": [0], "text": ["one two three"]})
    out = token_shards(rd.from_pandas(df), shard_tokens=10).to_pandas()
    assert out.iloc[0].to_dict() == {"doc_id": 0, "n_tokens": 3,
                                     "start_offset": 0, "shard_id": 0}


def test_corpus_prep_composition(ray_session):
    """quality-rejected and near-dup docs are gone; survivors are packed."""
    import ray.data as rd
    from sift_ray.pipelines.corpus_prep import prepare_corpus
    good = ("the quick brown fox jumps over the lazy dog and then runs to "
            "the barn where it finds food and water to enjoy all day ") * 3
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [good, good + " extra tail words here", "too short"],
    })
    out = prepare_corpus(rd.from_pandas(df), shard_tokens=50).to_pandas()
    # doc 3 fails quality (min 50 words); doc 2 is a near-dup of doc 1
    assert list(out["doc_id"]) == [1]
    assert out.iloc[0]["start_offset"] == 0


def _corpus_prep_docs(n=24):
    rng = np.random.RandomState(11)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "lam", "mu"]
    base = ("the quick brown fox jumps over the lazy dog and then runs to "
            "the barn where it finds food and water to enjoy all day ")
    rows = []
    for i in range(n):
        if i % 4 == 3:
            rows.append((i, rows[-1][1] + " tail"))  # near-dup of previous
        elif i % 7 == 6:
            rows.append((i, "too short"))            # quality-rejected
        else:
            rows.append((i, base + " ".join(rng.choice(words, 30))))
    return pd.DataFrame({"doc_id": np.array([r[0] for r in rows], np.int64),
                         "text": [r[1] for r in rows]})


def test_corpus_prep_checkpoint_matches_materialize(ray_session, tmp_path):
    """prepare_corpus with a parquet checkpoint must be value-identical to
    the object-store materialize path."""
    import ray.data as rd
    from sift_ray.pipelines.corpus_prep import prepare_corpus
    df = _corpus_prep_docs()
    a = (prepare_corpus(rd.from_pandas(df), shard_tokens=100)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (prepare_corpus(rd.from_pandas(df), shard_tokens=100,
                        checkpoint_dir=str(tmp_path / "ckpt"))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)


def test_corpus_prep_from_path_resumes(ray_session, tmp_path):
    """The resumable path: partitions commit through the manifest; a rerun
    skips committed partitions (no data files rewritten) and a partially
    lost manifest recomputes only the missing partition."""
    import os
    import ray.data as rd
    from sift_ray.pipelines.corpus_prep import (prepare_corpus,
                                                prepare_corpus_from_path)
    df = _corpus_prep_docs(32)
    src = tmp_path / "docs"
    src.mkdir()
    # 4 input shards -> 4 partitions at group_size=1
    for s in range(4):
        import pyarrow as pa
        import pyarrow.parquet as pq
        part = df.iloc[s * 8:(s + 1) * 8]
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False),
                       src / f"shard-{s}.parquet")
    ckpt = tmp_path / "ckpt"
    expected = (prepare_corpus(rd.from_pandas(df), shard_tokens=100)
                .to_pandas().sort_values("doc_id").reset_index(drop=True))

    out1 = (prepare_corpus_from_path(str(src), str(ckpt), shard_tokens=100,
                                     group_size=1)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(out1, expected)

    manifest_dir = ckpt / "_manifest"
    assert len(list(manifest_dir.glob("part-*.json"))) == 4
    mtimes = {str(p): os.path.getmtime(p)
              for p in (ckpt).rglob("*.parquet")}

    # rerun: all partitions committed -> no data file rewritten
    out2 = (prepare_corpus_from_path(str(src), str(ckpt), shard_tokens=100,
                                     group_size=1)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(out2, expected)
    assert {str(p): os.path.getmtime(p)
            for p in (ckpt).rglob("*.parquet")} == mtimes

    # lose one manifest row: ONLY that partition is recomputed
    (manifest_dir / "part-00002.json").unlink()
    out3 = (prepare_corpus_from_path(str(src), str(ckpt), shard_tokens=100,
                                     group_size=1)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(out3, expected)
    changed = [str(p) for p in ckpt.rglob("*.parquet")
               if os.path.getmtime(str(p)) != mtimes.get(str(p))]
    assert changed and all("part-00002" in c for c in changed)


def test_hll_per_group_within_error(ray_session):
    import ray.data as rd
    from sift_ray.functions.sketch import approx_distinct_by
    rng = np.random.RandomState(9)
    n = 40_000
    keys = rng.randint(0, 4, n)
    # group g has ~1000*(g+1) distinct values
    vals = np.array([rng.randint(0, 1000 * (k + 1)) for k in keys],
                    dtype=np.int64)
    df = pd.DataFrame({"grp": keys.astype(np.int64), "v": vals})
    out = (approx_distinct_by(rd.from_pandas(df), "grp", "v", precision=12)
           .to_pandas().set_index("grp"))
    exact = df.groupby("grp")["v"].nunique()
    assert len(out) == 4
    for g in range(4):
        err = abs(out.loc[g, "approx_distinct"] - exact[g]) / exact[g]
        assert err < 0.06, (g, out.loc[g, "approx_distinct"], exact[g])


def test_token_shards_empty_input(ray_session):
    import ray.data as rd
    from sift_ray.functions.sharding import token_shards
    df = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                       "text": pd.Series([], dtype="object")})
    out = token_shards(rd.from_pandas(df), shard_tokens=100)
    # (Ray's to_pandas drops columns for any empty dataset; the schema is
    # the API contract here)
    assert out.schema().names == ["doc_id", "n_tokens", "start_offset",
                                  "shard_id"]
    assert out.count() == 0


def test_simhash_hamming_uses_all_64_bits(ray_session):
    """A pair differing ONLY in low bits (incl. bit 0) must carry the full
    hamming distance (regression: h >> 1 truncation lost bit 0)."""
    import pyarrow as pa
    from sift_ray.functions.dedup import SimHashStage, _simhash_partition_pairs
    import pandas as pd
    h_a = SimHashStage.simhash("alpha beta gamma")
    # craft rows directly: same bands 1-3, differ in bits 0 and 5 of band 0
    h_b = h_a ^ 0b100001
    def rows(doc, h):
        h64 = h - (1 << 64) if h >= (1 << 63) else h
        return [{"doc_id": doc, "band_id": b,
                 "band_val": (h >> (16 * b)) & 0xFFFF, "simhash": h64,
                 "part": 0} for b in range(4)]
    pdf = pd.DataFrame(rows(1, h_a) + rows(2, h_b))
    out = _simhash_partition_pairs(max_hamming=3, max_bucket=200)(pdf)
    # distance is exactly 2 (bits 0 and 5) — kept, with the true distance
    assert list(out.itertuples(index=False)) == [(1, 2, 2)]
    out2 = _simhash_partition_pairs(max_hamming=1, max_bucket=200)(pdf)
    assert len(out2) == 0  # true distance 2 > 1: bit 0 must count


def test_hll_ranks_power_of_two_rounding():
    import numpy as np
    from sift_ray.functions.sketch import _ranks
    # values just below a power of two with >53 significant bits round UP
    # in float64; the exact shift check must correct the exponent
    for width in (54, 60, 64):
        w = np.array([(1 << width) - 1, 1 << (width - 1), 1, 0],
                     dtype=np.uint64)
        got = _ranks(w, width)
        assert list(got) == [1, 1, width, width + 1], (width, list(got))


@pytest.mark.parametrize("opname", ["exact_dedup", "dedup_docs",
                                    "near_dedup_docs", "minhash_lsh_pairs",
                                    "simhash_pairs", "ngram_jaccard_pairs"])
def test_dedup_family_empty_input(ray_session, opname):
    """A junk shard where everything was filtered out upstream must flow
    through every dedup operator as an empty result, never a crash."""
    import pyarrow as pa
    import ray.data as rd
    from sift_ray.functions import dedup
    ds = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                 "text": pa.array([], pa.string())}))
    out = getattr(dedup, opname)(ds)
    assert out.count() == 0


@pytest.mark.parametrize("num_parts", [1, 8])
def test_asof_join_backward_semantics(ray_session, num_parts):
    import ray.data as rd
    from sift_ray.functions.shuffle import asof_join
    left = pd.DataFrame({
        "k": [1, 1, 1, 2, 2, 3],
        "t": [5, 10, 20, 7, 8, 1],
        "x": [50, 51, 52, 53, 54, 55],
    })
    right = pd.DataFrame({
        "k": [1, 1, 2, 9],
        "t": [5, 15, 9, 1],          # k=1 t=5 ties a left row (must match)
        "v": [100, 200, 300, 999],
    })
    out = (asof_join(rd.from_pandas(left), rd.from_pandas(right),
                     key="k", ts="t", value_col="v",
                     num_parts=num_parts).to_pandas()
           .sort_values(["k", "t"]).reset_index(drop=True))
    assert list(out["x"]) == [50, 51, 52, 53, 54, 55]  # all left rows kept
    got = list(out["v"])
    # k=1: t=5 ties right t=5 -> 100; t=10 -> 100; t=20 -> 200
    # k=2: t=7,8 both before right t=9 -> null; k=3: no right -> null
    assert got[0] == 100 and got[1] == 100 and got[2] == 200
    assert pd.isna(got[3]) and pd.isna(got[4]) and pd.isna(got[5])


def test_asof_join_latest_of_equal_ts_rights(ray_session):
    import ray.data as rd
    from sift_ray.functions.shuffle import asof_join
    left = pd.DataFrame({"k": [1], "t": [10], "x": [0]})
    right = pd.DataFrame({"k": [1, 1], "t": [10, 3], "v": [7, 5]})
    out = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    key="k", ts="t", value_col="v").to_pandas()
    assert list(out["v"]) == [7]  # the t=10 tie wins over t=3


def test_hash_join_left_preserves_big_int64(ray_session):
    """ADVICE fix: unmatched left rows must not coerce right int columns to
    float64 (lossy past 2^53) — nullable Int64 path + explicit schema."""
    import ray.data as rd
    from sift_ray.functions.shuffle import hash_join
    big = (1 << 62) + 12345  # not representable in float64
    left = pd.DataFrame({"k": np.array([1, 2, 3], dtype=np.int64),
                         "lv": np.array([10, 20, 30], dtype=np.int64)})
    right = pd.DataFrame({"k": np.array([1], dtype=np.int64),
                          "rv": np.array([big], dtype=np.int64)})
    ds = hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                   how="left")
    import pyarrow as pa
    tbl = pa.concat_tables(ds.iter_batches(batch_size=None,
                                           batch_format="pyarrow"))
    sch = dict(zip(ds.schema().names, ds.schema().types))
    assert pa.types.is_integer(sch["rv"]), sch  # block dtype stays int64
    rows = {k: v for k, v in zip(tbl.column("k").to_pylist(),
                                 tbl.column("rv").to_pylist())}
    assert rows[1] == big  # exact int64, no float rounding in the block
    assert rows[2] is None and rows[3] is None


def test_mix64_many_key_columns_valid_shift():
    """ADVICE fix: >9 key columns must not produce a negative shift."""
    cols = [np.arange(100, dtype=np.int64) + i for i in range(12)]
    part = mix64(cols) % np.int64(8)
    assert ((part >= 0) & (part < 8)).all()


def test_hash_join_anti(ray_session):
    import ray.data as rd
    from sift_ray.functions.shuffle import hash_join
    left = pd.DataFrame({"k": np.array([1, 2, 3, 4, 2], dtype=np.int64),
                         "lv": np.array([10, 20, 30, 40, 21], np.int64)})
    right = pd.DataFrame({"k": np.array([2, 4, 9], dtype=np.int64),
                          "rv": ["x", "y", "z"]})
    out = (hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                     how="anti").to_pandas()
           .sort_values("k").reset_index(drop=True))
    assert list(out["k"]) == [1, 3]
    assert list(out["lv"]) == [10, 30]
    assert list(out.columns) == ["k", "lv"]  # right columns never leak


def test_near_dedup_docs_anti_join_path_equals_broadcast(ray_session):
    """broadcast_limit=0 forces the distributed anti-join; result must be
    identical to the broadcast path."""
    import ray.data as rd
    from sift_ray.functions.dedup import near_dedup_docs
    base = ("the quick brown fox jumps over the lazy dog near the barn "
            "and finds water ")
    rows = []
    for i in range(30):
        if i % 3 == 2:
            rows.append((i, rows[-1][1] + " tail"))  # near-dup of previous
        else:
            rows.append((i, base + f"unique{i} marker{i} words{i} here{i}"))
    df = pd.DataFrame({"doc_id": np.array([r[0] for r in rows], np.int64),
                       "text": [r[1] for r in rows]})
    kw = dict(k=3, threshold=0.5)
    a = (near_dedup_docs(rd.from_pandas(df), broadcast_limit=0, **kw)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (near_dedup_docs(rd.from_pandas(df), **kw)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(a) > 0 and len(a) < 30  # something dropped, something kept
    pd.testing.assert_frame_equal(a, b)


def test_task_stage_caches_per_process_and_transforms():
    import pyarrow as pa
    from sift_ray.functions.shuffle import TaskStage, _cached_stage

    class Doubler:
        instances = 0

        def __init__(self, factor: int = 2):
            Doubler.instances += 1
            self.factor = factor

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return batch.set_column(
                0, "x", pc.multiply(batch.column("x"), self.factor))

    _cached_stage.cache_clear()
    stage = TaskStage(Doubler, factor=3)
    t = pa.table({"x": [1, 2]})
    assert stage(t).column("x").to_pylist() == [3, 6]
    assert stage(t).column("x").to_pylist() == [3, 6]
    # the instance is constructed once per (cls, kwargs) in this process
    assert Doubler.instances == 1
    # a different parameterization constructs a second instance
    assert TaskStage(Doubler, factor=5)(t).column("x").to_pylist() == [5, 10]
    assert Doubler.instances == 2


def test_hash_join_tolerates_empty_upstream_blocks(ray_session):
    """Chained joins: the right side is itself a join output, whose
    map_groups can emit 0-column blocks for empty sort ranges — the side
    prep must normalize those instead of KeyError-ing on select."""
    import pandas as pd
    import ray.data as rd
    from sift_ray.functions.shuffle import hash_join
    left = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3], "lv": [10, 20, 30]}))
    mid_r = rd.from_pandas(pd.DataFrame({"k": [2, 3, 4], "mv": [5, 6, 7]}))
    mid = hash_join(left, mid_r, on="k", how="inner", num_parts=16)
    right = rd.from_pandas(pd.DataFrame({"k": [3], "rv": [99]}))
    out = (hash_join(mid, right, on="k", how="inner", num_parts=16)
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out.to_dict("list") == {"k": [3], "lv": [30], "mv": [6],
                                   "rv": [99]}


def test_shipping_priority_empty_segment(ray_session):
    import pandas as pd
    import ray.data as rd
    from sift_ray.functions.relational import shipping_priority
    li = rd.from_pandas(pd.DataFrame({
        "l_orderkey": [1], "l_extendedprice": [100.0],
        "l_discount": [0.1],
        "l_shipdate": pd.to_datetime(["1996-01-01"])}))
    od = rd.from_pandas(pd.DataFrame({
        "o_orderkey": [1], "o_custkey": [7],
        "o_orderdate": pd.to_datetime(["1995-01-01"]),
        "o_orderpriority": ["1-URGENT"]}))
    cu = rd.from_pandas(pd.DataFrame({
        "c_custkey": [7], "c_mktsegment": ["AUTOMOBILE"]}))
    out = shipping_priority(li, od, cu, segment="NO_SUCH_SEGMENT")
    assert len(out.to_pandas()) == 0
    out2 = shipping_priority(li, od, cu, segment="AUTOMOBILE").to_pandas()
    assert out2.revenue_cents.tolist() == [9000]  # 100 * 0.9 * 100 cents


def test_shipping_priority_strategy_invariance(ray_session):
    """The size gates only pick a strategy — broadcast and distributed
    paths must return identical rows."""
    import pandas as pd
    import ray.data as rd
    from sift_ray.functions.relational import shipping_priority
    rng = __import__("numpy").random.default_rng(3)
    n_ord = 200
    li = pd.DataFrame({
        "l_orderkey": rng.integers(0, n_ord, 800),
        "l_extendedprice": rng.uniform(10, 1000, 800).round(2),
        "l_discount": rng.choice([0.0, 0.05, 0.1], 800),
        "l_shipdate": pd.to_datetime("1995-06-01"),
    })
    od = pd.DataFrame({
        "o_orderkey": range(n_ord),
        "o_custkey": rng.integers(0, 40, n_ord),
        "o_orderdate": pd.to_datetime("1995-01-01"),
        "o_orderpriority": rng.choice(["1-URGENT", "2-HIGH"], n_ord),
    })
    cu = pd.DataFrame({"c_custkey": range(40),
                       "c_mktsegment": ["BUILDING", "AUTO"] * 20})
    args = (rd.from_pandas(li), rd.from_pandas(od), rd.from_pandas(cu))
    fast = shipping_priority(*args, k=5).to_pandas()
    args = (rd.from_pandas(li), rd.from_pandas(od), rd.from_pandas(cu))
    dist = shipping_priority(*args, k=5, broadcast_keys=0,
                             broadcast_orders=0).to_pandas()
    assert fast.to_dict("list") == dist.to_dict("list")
    assert len(fast) == 5


def test_interval_join_matches_pandas(ray_session):
    """Range join vs a pandas cross-filter reference: overlapping windows,
    multi-match events, boundary semantics [ws, we), and granularity
    invariance (bucket size must not change the result)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from sift_ray.functions.shuffle import interval_join

    US = 1_000_000
    ev = pd.DataFrame({
        "event_id": range(8),
        "t": [0, 5 * US, 10 * US, 10 * US, 3600 * US,
              7200 * US, 7199 * US, 11_000 * US],
    })
    iv = pd.DataFrame({
        "wid": [100, 101, 102, 103],
        "ws": [0, 5 * US, 3600 * US, 50_000 * US],
        "we": [10 * US, 7200 * US, 3600 * US, 60_000 * US],  # 102 empty
    })
    want = (ev.merge(iv, how="cross")
            .query("t >= ws and t < we")[["event_id", "wid"]]
            .sort_values(["event_id", "wid"]).reset_index(drop=True))
    for g in (1, 7, 3600, 100_000):
        got = (interval_join(
            rd.from_arrow(pa.Table.from_pandas(ev, preserve_index=False)),
            rd.from_arrow(pa.Table.from_pandas(iv, preserve_index=False)),
            "t", "ws", "we", ["event_id"], ["wid"], granularity_s=g,
            event_types={"event_id": "int64"}, ival_types={"wid": "int64"})
            .to_pandas().sort_values(["event_id", "wid"])
            .reset_index(drop=True))
        assert got.equals(want), f"granularity {g}"


def test_interval_join_salted_equals_plain(ray_session):
    """Hot-bucket salting must not change the joined pairs."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from sift_ray.functions.shuffle import interval_join

    rng = np.random.default_rng(2)
    US = 1_000_000
    ev = pd.DataFrame({"event_id": range(500),
                       "t": rng.integers(0, 1000 * US, 500)})
    iv = pd.DataFrame({"wid": range(40),
                       "ws": rng.integers(0, 900 * US, 40)})
    iv["we"] = iv["ws"] + rng.integers(1, 200 * US, 40)

    def run(**kw):
        return (interval_join(
            rd.from_arrow(pa.Table.from_pandas(ev, preserve_index=False)),
            rd.from_arrow(pa.Table.from_pandas(iv, preserve_index=False)),
            "t", "ws", "we", ["event_id"], ["wid"], granularity_s=100,
            event_types={"event_id": "int64"},
            ival_types={"wid": "int64"}, **kw)
            .to_pandas().sort_values(["event_id", "wid"])
            .reset_index(drop=True))

    assert run(salt=4).equals(run())


def test_write_shard_files_pack_order_and_resume(ray_session, tmp_path):
    """Physical shard materialization: one parquet file per shard in
    (shard_id, start_offset) pack order, resumable at group granularity
    (a completed run resumes instantly; a group whose commit is removed
    is rewritten byte-identically), partition-layout invariant."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd
    from sift_ray.functions.sharding import token_shards, write_shard_files

    texts = [f"doc {i} " + " ".join(f"w{j}" for j in range(i % 7 + 2))
             for i in range(40)]
    tbl = pa.table({"doc_id": pa.array(range(40), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    docs = rd.from_arrow(tbl)
    shards = token_shards(docs, shard_tokens=25).materialize()
    out_dir = str(tmp_path / "shards_out")
    s1 = write_shard_files(docs.repartition(5), shards, out_dir,
                           groups=4, num_parts=6)
    assert s1["partitions"] == 4

    def read_all(d):
        files = {}
        for part in sorted(os.listdir(d)):
            if not part.startswith("part-"):
                continue
            for f in sorted(os.listdir(os.path.join(d, part))):
                files[f] = pq.read_table(os.path.join(d, part, f))
        return files

    files = read_all(out_dir)
    exp = shards.to_pandas()
    assert len(files) == exp["shard_id"].nunique()
    all_docs = []
    for name, t in files.items():
        sid = int(name.split("-")[1].split(".")[0])
        assert (t.column("shard_id").to_numpy() == sid).all()
        offs = t.column("start_offset").to_numpy()
        assert (np.diff(offs) > 0).all() if len(offs) > 1 else True
        all_docs.extend(t.column("doc_id").to_pylist())
    assert sorted(all_docs) == list(range(40))

    # full resume: no group re-executes (pure manifest read)
    s2 = write_shard_files(docs, shards, out_dir, groups=4)
    assert s2["partitions"] == 4

    # knock out one group's commit: only it is rewritten, byte-identical
    import json
    import shutil
    victim = os.path.join(out_dir, "_manifest", "part-00002.json")
    os.remove(victim)
    shutil.rmtree(os.path.join(out_dir, "part-00002"))
    s3 = write_shard_files(docs.repartition(3), shards, out_dir,
                           groups=4, num_parts=3)
    assert s3["partitions"] == 4
    files2 = read_all(out_dir)
    assert set(files2) == set(files)
    for name in files:
        assert files2[name].equals(files[name])


def test_asof_join_tolerance(ray_session):
    """merge_asof-style tolerance: matches farther than the bound go
    null, in both directions, ties still match at distance 0."""
    import pandas as pd
    import ray.data as rd
    from sift_ray.functions.shuffle import asof_join

    lt = pd.DataFrame({"key": [1, 1, 1, 2], "ts": [10, 25, 100, 5],
                       "lid": [0, 1, 2, 3]})
    rt = pd.DataFrame({"key": [1, 1, 2], "ts": [8, 20, 50],
                       "price": [1.0, 2.0, 3.0]})
    out = (asof_join(rd.from_pandas(lt), rd.from_pandas(rt), "key", "ts",
                     "price", tolerance=10, num_parts=3).to_pandas()
           .sort_values("lid").reset_index(drop=True))
    assert out["price"].tolist()[:2] == [1.0, 2.0]
    assert pd.isna(out["price"][2]) and pd.isna(out["price"][3])
    fwd = (asof_join(rd.from_pandas(lt), rd.from_pandas(rt), "key", "ts",
                     "price", direction="forward", tolerance=10,
                     num_parts=3).to_pandas()
           .sort_values("lid").reset_index(drop=True))
    assert fwd["price"][0] == 2.0
    assert pd.isna(fwd["price"][1]) and pd.isna(fwd["price"][3])
    # tolerance=0: only exact-timestamp ties match
    tie = (asof_join(rd.from_pandas(pd.DataFrame(
               {"key": [1, 1], "ts": [8, 9], "lid": [0, 1]})),
           rd.from_pandas(rt), "key", "ts", "price", tolerance=0,
           num_parts=2).to_pandas().sort_values("lid")
           .reset_index(drop=True))
    assert tie["price"][0] == 1.0 and pd.isna(tie["price"][1])


def test_detect_salt_and_auto_join(ray_session):
    """salt="auto": a planted hot key (half the left rows) triggers
    salting and the salted result equals the unsalted join; a uniform key
    distribution detects no skew (salt None)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from sift_ray.functions.shuffle import detect_salt, hash_join

    rng = np.random.RandomState(9)
    n = 4000
    hot = np.full(n // 2, 7, dtype=np.int64)
    rest = rng.randint(100, 2000, n // 2).astype(np.int64)
    lk = np.concatenate([hot, rest])
    rng.shuffle(lk)
    left = pd.DataFrame({"k": lk, "lv": np.arange(n, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(0, 2000, dtype=np.int64),
                          "rv": np.arange(0, 2000, dtype=np.int64) * 3})

    s = detect_salt(rd.from_pandas(left), ["k"], num_parts=16)
    assert s is not None and s >= 2

    uniform = pd.DataFrame({"k": rng.permutation(n).astype(np.int64)})
    assert detect_salt(rd.from_pandas(uniform), ["k"],
                       num_parts=16) is None

    base = (hash_join(rd.from_pandas(left), rd.from_pandas(right),
                      on="k", num_parts=8).to_pandas()
            .sort_values(["k", "lv"]).reset_index(drop=True))
    auto = (hash_join(rd.from_pandas(left), rd.from_pandas(right),
                      on="k", num_parts=8, salt="auto").to_pandas()
            .sort_values(["k", "lv"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(auto, base)


def test_hash64_route_backend_invariance(ray_session, monkeypatch):
    """Routing hashes may differ between backends (polars xxhash vs the
    blake2b fallback) — RESULTS must not: equal keys co-locate under
    either, and kernels re-group by true keys. Pin (a) the fallback path
    works when polars is unavailable, (b) a string-keyed join's result
    is identical under both backends."""
    import builtins

    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from sift_ray.functions import sketch
    from sift_ray.functions.shuffle import hash_join
    from sift_ray.functions.sketch import _hash64_any, _hash64_route

    col = pa.chunked_array([pa.array(["a", "bb", None, "a", "ccc"])])
    fast = _hash64_route(col)
    assert fast.dtype == np.uint64 and len(fast) == 5
    assert fast[0] == fast[3]                 # equal keys co-locate

    real_import = builtins.__import__

    def no_polars(name, *a, **k):
        if name == "polars":
            raise ImportError("forced")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_polars)
    slow = _hash64_route(col)
    monkeypatch.undo()
    assert (slow == _hash64_any(col)).all()   # fallback == stable hash

    l = rd.from_pandas(pd.DataFrame(
        {"k": ["x", "y", "z", "x"], "a": [1, 2, 3, 4]}))
    r = rd.from_pandas(pd.DataFrame({"k": ["x", "z"], "b": [10, 30]}))
    types = {"k": pa.string()}
    want = (hash_join(l, r, on="k", how="inner",
                      left_types={**types, "a": pa.int64()},
                      right_types={**types, "b": pa.int64()})
            .to_pandas().sort_values(["k", "a"]).reset_index(drop=True))
    monkeypatch.setattr(sketch, "_hash64_route", sketch._hash64_any)
    got = (hash_join(l, r, on="k", how="inner",
                     left_types={**types, "a": pa.int64()},
                     right_types={**types, "b": pa.int64()})
           .to_pandas().sort_values(["k", "a"]).reset_index(drop=True))
    monkeypatch.undo()
    assert got.equals(want)
