"""Tests for the analytic (window-function / rollup) operators, the
deterministic weighted sampler, the distributed k-means, and the semi
join — exact expected values from pandas/numpy references, plus
partition-count invariance (the distributed-correctness property)."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sift_ray.functions.analytic import keyed_window_calcs, rollup


def _orders_df(n=4000, seed=7):
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "key": rng.randint(0, 200, n).astype(np.int64),
        "oid": np.arange(n, dtype=np.int64),
        "ts": rng.randint(0, 10_000, n).astype(np.int64),
        "val": rng.randint(-500, 500, n).astype(np.int64),
    })


def _expected_windows(df, k=3):
    s = df.sort_values(["key", "ts", "oid"]).copy()
    g = s.groupby("key", sort=False)
    s["rn"] = g.cumcount() + 1
    s["prev"] = g["val"].shift(1)
    s["run"] = g["val"].cumsum()
    s["mov"] = (g["val"].rolling(k, min_periods=1).sum()
                .reset_index(level=0, drop=True))
    return s.sort_values("oid").reset_index(drop=True)


@pytest.mark.parametrize("num_parts", [1, 5, 32])
def test_keyed_window_calcs_matches_pandas(ray_session, num_parts):
    import ray.data as rd
    df = _orders_df()
    out = (keyed_window_calcs(rd.from_pandas(df), "key", ["ts", "oid"],
                              "val", moving_rows=3, num_parts=num_parts)
           .to_pandas().sort_values("oid").reset_index(drop=True))
    exp = _expected_windows(df)
    assert (out["rn"].to_numpy() == exp["rn"].to_numpy()).all()
    assert (out["run"].to_numpy() == exp["run"].to_numpy()).all()
    assert (out["mov"].to_numpy() == exp["mov"].to_numpy()).all()
    a, b = out["prev"], exp["prev"]
    assert (a.isna() == b.isna()).all()
    m = ~a.isna()
    assert (a[m].to_numpy().astype(np.int64)
            == b[m].to_numpy().astype(np.int64)).all()


def test_keyed_window_calcs_single_row_groups(ray_session):
    import ray.data as rd
    df = pd.DataFrame({"key": [1, 2, 3], "oid": [10, 20, 30],
                       "ts": [0, 0, 0],
                       "val": np.array([5, -7, 9], dtype=np.int64)})
    out = (keyed_window_calcs(rd.from_pandas(df), "key", ["ts", "oid"],
                              "val").to_pandas()
           .sort_values("key").reset_index(drop=True))
    assert (out["rn"] == 1).all()
    assert out["prev"].isna().all()          # first row of every group
    assert (out["run"].to_numpy() == df["val"].to_numpy()).all()
    assert (out["mov"].to_numpy() == df["val"].to_numpy()).all()


def test_keyed_window_calcs_hot_key(ray_session):
    # one key owns 80% of the rows — the partition must absorb it and
    # the running sums stay exact
    import ray.data as rd
    n = 3000
    df = pd.DataFrame({
        "key": np.where(np.arange(n) % 5 < 4, 1, 2).astype(np.int64),
        "oid": np.arange(n, dtype=np.int64),
        "ts": np.zeros(n, dtype=np.int64),
        "val": np.ones(n, dtype=np.int64),
    })
    out = (keyed_window_calcs(rd.from_pandas(df), "key", ["ts", "oid"],
                              "val", num_parts=8).to_pandas())
    hot = out[out["key"] == 1].sort_values("oid")
    assert hot["run"].iloc[-1] == len(hot) == 2400
    assert (hot["rn"].to_numpy() == np.arange(1, 2401)).all()


def _rollup_df():
    rng = np.random.RandomState(3)
    return pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], 900),
        "b": rng.choice(["p", "q"], 900),
        "v": rng.randint(0, 100, 900).astype(np.int64),
    })


@pytest.mark.parametrize("num_parts", [1, 16])
def test_rollup_matches_pandas(ray_session, num_parts):
    import ray.data as rd
    df = _rollup_df()
    out = rollup(rd.from_pandas(df), ["a", "b"],
                 [("v", "sum", "sv"), (None, "count_all", "n")],
                 num_parts=num_parts).to_pandas()
    fin = df.groupby(["a", "b"]).agg(sv=("v", "sum"), n=("v", "size"))
    lvl1 = df.groupby("a").agg(sv=("v", "sum"), n=("v", "size"))
    assert len(out) == len(fin) + len(lvl1) + 1
    o_fin = out.dropna(subset=["a", "b"]).set_index(["a", "b"])
    for idx, row in fin.iterrows():
        assert o_fin.loc[idx, "sv"] == row["sv"]
        assert o_fin.loc[idx, "n"] == row["n"]
    o_l1 = out[out["a"].notna() & out["b"].isna()].set_index("a")
    for idx, row in lvl1.iterrows():
        assert o_l1.loc[idx, "sv"] == row["sv"]
    total = out[out["a"].isna() & out["b"].isna()]
    assert len(total) == 1
    assert total["sv"].iloc[0] == df["v"].sum()
    assert total["n"].iloc[0] == len(df)


def test_rollup_min_max_refold(ray_session):
    import ray.data as rd
    df = _rollup_df()
    out = rollup(rd.from_pandas(df), ["a"],
                 [("v", "min", "lo"), ("v", "max", "hi")]).to_pandas()
    total = out[out["a"].isna()]
    assert total["lo"].iloc[0] == df["v"].min()
    assert total["hi"].iloc[0] == df["v"].max()


def test_rollup_rejects_non_distributive():
    with pytest.raises(ValueError):
        rollup(None, ["a"], [("v", "mean", "m")])


def test_weighted_sample_deterministic_and_weight_biased(ray_session):
    import ray.data as rd
    from sift_ray.functions.corpus import weighted_sample
    n = 2000
    # half the rows carry 100x the weight of the other half
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "n_chars": np.where(np.arange(n) < n // 2, 10_000, 100)
        .astype(np.int64),
    })
    a = weighted_sample(rd.from_pandas(df), k=100).to_pandas()
    b = weighted_sample(rd.from_pandas(df).repartition(9), k=100).to_pandas()
    # deterministic + layout invariant
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    assert len(a) == 100
    # heavy rows must dominate the sample (p_heavy ~ 100/101 per slot)
    heavy = (a["doc_id"] < n // 2).sum()
    assert heavy > 80


def test_weighted_sample_excludes_nonpositive_weights(ray_session):
    import ray.data as rd
    from sift_ray.functions.corpus import weighted_sample
    df = pd.DataFrame({"doc_id": np.arange(10, dtype=np.int64),
                       "n_chars": np.array([0] * 5 + [50] * 5, np.int64)})
    out = weighted_sample(rd.from_pandas(df), k=10).to_pandas()
    assert set(out["doc_id"]) == set(range(5, 10))


def test_kmeans_partition_invariant_and_matches_reference(ray_session):
    import ray.data as rd
    from sift_ray.functions.similarity import kmeans_fit
    rng = np.random.RandomState(5)
    n, d, k = 600, 16, 5
    mat = rng.randn(n, d).astype(np.float64)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": [v.astype(np.float32) for v in mat]})
    C1, st1 = kmeans_fit(rd.from_pandas(df), n_clusters=k, n_iter=3)
    st1 = st1.to_pandas()
    C2, st2 = kmeans_fit(rd.from_pandas(df).repartition(11),
                         n_clusters=k, n_iter=3)
    assert (C1 == C2).all()
    assert st1.equals(st2.to_pandas())

    # local single-process integer replica (same algorithm, no Ray)
    S = np.int64(1) << 20
    xq = np.round(mat.astype(np.float32).astype(np.float64) * S) \
        .astype(np.int64)
    C = xq[:k].copy()
    for _ in range(3):
        d2 = np.stack([np.einsum("ij,ij->i", xq - C[c], xq - C[c])
                       for c in range(k)], axis=1)
        a = np.argmin(d2, axis=1)
        best = d2[np.arange(n), a] >> 10
        newC = C.copy()
        sizes = np.zeros(k, np.int64)
        inert = np.zeros(k, np.int64)
        for c in range(k):
            m = a == c
            if m.sum():
                newC[c] = xq[m].sum(axis=0) // m.sum()
                sizes[c] = m.sum()
                inert[c] = best[m].sum()
        C = newC
    assert (C == C1).all()
    assert (sizes == st1["size"].to_numpy()).all()
    assert (inert == st1["inertia_q"].to_numpy()).all()
    assert st1["size"].sum() == n


def test_hash_join_semi(ray_session):
    import ray.data as rd
    from sift_ray.functions.shuffle import hash_join
    left = pd.DataFrame({"k": np.array([1, 2, 3, 4, 5], np.int64),
                         "lv": np.arange(5, dtype=np.int64)})
    # duplicate right keys: each matching left row must appear ONCE
    right = pd.DataFrame({"k": np.array([2, 2, 4, 4, 4, 9], np.int64)})
    out = (hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                     how="semi").to_pandas()
           .sort_values("k").reset_index(drop=True))
    assert list(out["k"]) == [2, 4]
    assert list(out.columns) == ["k", "lv"]


def test_hash_join_semi_bloom_matches_plain(ray_session):
    import ray.data as rd
    from sift_ray.functions.shuffle import hash_join
    rng = np.random.RandomState(2)
    left = pd.DataFrame({"k": rng.randint(0, 300, 2000).astype(np.int64),
                         "lv": np.arange(2000, dtype=np.int64)})
    right = pd.DataFrame({"k": rng.randint(0, 80, 150).astype(np.int64)})
    plain = (hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                       how="semi").to_pandas()
             .sort_values(["k", "lv"]).reset_index(drop=True))
    bloom = (hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                       how="semi", bloom_prefilter=1 << 10).to_pandas()
             .sort_values(["k", "lv"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(plain, bloom)
    exp = left[left["k"].isin(right["k"])].sort_values(["k", "lv"])
    assert list(plain["lv"]) == list(exp["lv"])


def test_hash_join_semi_empty_right(ray_session):
    import ray.data as rd
    import pyarrow as pa
    from sift_ray.functions.shuffle import hash_join
    left = pd.DataFrame({"k": np.array([1, 2], np.int64),
                         "lv": np.array([7, 8], np.int64)})
    right = pd.DataFrame({"k": np.array([], np.int64)})
    out = hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                    how="semi",
                    right_types={"k": pa.int64()}).to_pandas()
    assert len(out) == 0


def test_boilerplate_strip_removes_template_lines(ray_session):
    import ray.data as rd
    from sift_ray.functions.corpus import boilerplate_strip
    docs = []
    for h in ("a.com", "b.com"):
        for i in range(10):
            docs.append({"doc_id": len(docs),
                         "source": h,
                         "text": f"unique body {h} {i}\nnav menu {h}"})
    # a host below min_docs keeps everything
    docs.append({"doc_id": len(docs), "source": "tiny.com",
                 "text": "only doc\nnav menu tiny.com"})
    df = pd.DataFrame(docs)
    out = (boilerplate_strip(rd.from_pandas(df), min_docs=3, max_frac=0.5)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(out) == len(df)
    big = out[out["doc_id"] < 20]
    assert not big["text"].str.contains("nav menu").any()
    assert (big["n_units"] == 1).all()
    tiny = out[out["doc_id"] == 20]
    assert tiny["text"].iloc[0] == "only doc\nnav menu tiny.com"


def test_boilerplate_strip_frequency_threshold(ray_session):
    import ray.data as rd
    from sift_ray.functions.corpus import boilerplate_strip
    # "sometimes" appears in 4/10 docs (< 0.5) -> kept;
    # "always" in 10/10 -> stripped
    docs = []
    for i in range(10):
        lines = [f"body {i}", "always here"]
        if i < 4:
            lines.append("sometimes here")
        docs.append({"doc_id": i, "source": "h.com",
                     "text": "\n".join(lines)})
    out = (boilerplate_strip(rd.from_pandas(pd.DataFrame(docs)),
                             min_docs=3, max_frac=0.5)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert not out["text"].str.contains("always here").any()
    assert out["text"].str.contains("sometimes here").sum() == 4


def test_boilerplate_strip_partition_invariant(ray_session):
    import ray.data as rd
    from sift_ray.functions.corpus import boilerplate_strip
    rng = np.random.RandomState(9)
    docs = pd.DataFrame({
        "doc_id": np.arange(60, dtype=np.int64),
        "source": [f"h{i % 4}.com" for i in range(60)],
        "text": [f"line {rng.randint(0, 20)}\nfooter h{i % 4}"
                 for i in range(60)],
    })
    a = (boilerplate_strip(rd.from_pandas(docs), num_parts=4)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (boilerplate_strip(rd.from_pandas(docs).repartition(7),
                           num_parts=19)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_line_dedup_nul_bytes_are_distinct(ray_session):
    # regression: pandas object hashing truncates at NUL, which merged
    # distinct lines sharing a pre-NUL prefix (silent data loss); the
    # Arrow combiner/winner path must keep them distinct
    import ray.data as rd
    from sift_ray.functions.corpus import line_dedup
    df = pd.DataFrame({
        "doc_id": np.array([1, 2], np.int64),
        "text": ["shared prefix\x00alpha", "shared prefix\x00beta"],
    })
    out = (line_dedup(rd.from_pandas(df)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(out) == 2                      # nothing wrongly deduped
    assert out["text"].iloc[0] == "shared prefix\x00alpha"
    assert out["text"].iloc[1] == "shared prefix\x00beta"
    # and true duplicates still collapse
    df2 = pd.DataFrame({
        "doc_id": np.array([1, 2], np.int64),
        "text": ["same\x00line", "same\x00line"],
    })
    out2 = line_dedup(rd.from_pandas(df2).repartition(2)).to_pandas()
    assert len(out2) == 1 and out2["doc_id"].iloc[0] == 1


def test_grouped_topk_matches_pandas_and_is_partition_invariant(ray_session):
    import ray.data as rd
    from sift_ray.functions.relational import grouped_topk
    rng = np.random.RandomState(17)
    df = pd.DataFrame({
        "g": [f"grp{v}" for v in rng.randint(0, 800, 5000)],  # string keys
        "v": rng.randint(0, 10_000, 5000).astype(np.int64),
        "tb": np.arange(5000, dtype=np.int64),
    })
    out = (grouped_topk(rd.from_pandas(df), "g", "v", "tb", k=3)
           .to_pandas().sort_values(["g", "rank"]).reset_index(drop=True))
    exp = (df.sort_values(["g", "v", "tb"], ascending=[True, False, True])
           .groupby("g", sort=True).head(3).reset_index(drop=True))
    assert (out["v"].to_numpy() == exp["v"].to_numpy()).all()
    assert (out["tb"].to_numpy() == exp["tb"].to_numpy()).all()
    out2 = (grouped_topk(rd.from_pandas(df).repartition(13), "g", "v",
                         "tb", k=3, num_parts=7)
            .to_pandas().sort_values(["g", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out, out2)


def _multikey_frames():
    rng = np.random.RandomState(23)
    left = pd.DataFrame({
        "k1": rng.randint(0, 12, 400).astype(np.int64),
        "k2": [f"t{v}" for v in rng.randint(0, 5, 400)],
        "lv": np.arange(400, dtype=np.int64),
    })
    right = pd.DataFrame({
        "k1": rng.randint(0, 14, 60).astype(np.int64),
        "k2": [f"t{v}" for v in rng.randint(0, 6, 60)],
        "rv": (np.arange(60, dtype=np.int64) + 1000),
    }).drop_duplicates(["k1", "k2"]).reset_index(drop=True)
    return left, right


@pytest.mark.parametrize("how", ["inner", "left", "full"])
def test_hash_join_multikey_merge_modes(ray_session, how):
    import ray.data as rd
    from sift_ray.functions.shuffle import hash_join
    left, right = _multikey_frames()
    out = (hash_join(rd.from_pandas(left), rd.from_pandas(right),
                     on=["k1", "k2"], how=how).to_pandas()
           .sort_values(["k1", "k2", "lv"], na_position="last")
           .reset_index(drop=True))
    exp = (left.merge(right, on=["k1", "k2"],
                      how=("outer" if how == "full" else how))
           .sort_values(["k1", "k2", "lv"], na_position="last")
           .reset_index(drop=True))
    assert len(out) == len(exp)
    for c in ["k1", "lv", "rv"]:
        a = pd.Series(out[c]).astype("Float64")
        b = pd.Series(exp[c]).astype("Float64")
        assert (a.fillna(-1) == b.fillna(-1)).all(), (how, c)


@pytest.mark.parametrize("how", ["anti", "semi"])
def test_hash_join_multikey_anti_semi(ray_session, how):
    import ray.data as rd
    from sift_ray.functions.shuffle import hash_join
    left, right = _multikey_frames()
    out = (hash_join(rd.from_pandas(left), rd.from_pandas(right),
                     on=["k1", "k2"], how=how).to_pandas()
           .sort_values("lv").reset_index(drop=True))
    m = left.merge(right[["k1", "k2"]], on=["k1", "k2"], how="left",
                   indicator=True)
    exp = m[m["_merge"] == ("left_only" if how == "anti" else "both")]
    assert sorted(out["lv"]) == sorted(exp["lv"])


def test_hash_join_multikey_nul_strings(ray_session):
    # Acero path must treat NUL-embedded keys as distinct (the pandas
    # multi-column hash would not)
    import ray.data as rd
    from sift_ray.functions.shuffle import hash_join
    left = pd.DataFrame({"k1": np.array([1, 1], np.int64),
                         "k2": ["p\x00a", "p\x00b"],
                         "lv": np.array([10, 20], np.int64)})
    right = pd.DataFrame({"k1": np.array([1], np.int64),
                          "k2": ["p\x00a"]})
    semi = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                     on=["k1", "k2"], how="semi").to_pandas()
    anti = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                     on=["k1", "k2"], how="anti").to_pandas()
    assert list(semi["lv"]) == [10]
    assert list(anti["lv"]) == [20]


def test_hash_join_multikey_partition_invariant(ray_session):
    import ray.data as rd
    from sift_ray.functions.shuffle import hash_join
    left, right = _multikey_frames()
    a = (hash_join(rd.from_pandas(left), rd.from_pandas(right),
                   on=["k1", "k2"], num_parts=3).to_pandas()
         .sort_values(["lv"]).reset_index(drop=True))
    b = (hash_join(rd.from_pandas(left).repartition(7),
                   rd.from_pandas(right).repartition(5),
                   on=["k1", "k2"], num_parts=31).to_pandas()
         .sort_values(["lv"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_boilerplate_strip_join_path_matches_broadcast(ray_session):
    # force the distributed host-join decision path (broadcast gate 0)
    # and check it produces exactly the broadcast path's output
    import ray.data as rd
    from sift_ray.functions.corpus import boilerplate_strip
    docs = []
    for h in ("a.com", "b.com", "c.com"):
        for i in range(8):
            docs.append({"doc_id": len(docs), "source": h,
                         "text": f"body {h} {i}\nfooter {h}"})
    df = pd.DataFrame(docs)
    a = (boilerplate_strip(rd.from_pandas(df))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (boilerplate_strip(rd.from_pandas(df), broadcast_hosts=0)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert not a["text"].str.contains("footer").any()


@pytest.mark.parametrize("num_parts", [1, 17])
def test_grouped_quantiles_exact_matches_numpy(ray_session, num_parts):
    import ray.data as rd
    from sift_ray.functions.analytic import grouped_quantiles_exact
    rng = np.random.RandomState(31)
    df = pd.DataFrame({
        "g": rng.randint(0, 150, 6000).astype(np.int64),
        "v": rng.randint(-100, 100, 6000).astype(np.int64),
    })
    out = (grouped_quantiles_exact(rd.from_pandas(df), "g", "v",
                                   qs=(0.1, 0.5, 0.9),
                                   num_parts=num_parts)
           .to_pandas().sort_values(["g", "q"]).reset_index(drop=True))
    # reference: smallest value with cumulative count >= ceil(q * n)
    recs = []
    for g, grp in df.groupby("g"):
        vals = np.sort(grp["v"].to_numpy())
        n = len(vals)
        for q in (0.1, 0.5, 0.9):
            need = int(np.ceil(q * n))
            recs.append((g, q, int(vals[max(need, 1) - 1])))
    exp = pd.DataFrame(recs, columns=["g", "q", "value"]) \
        .sort_values(["g", "q"]).reset_index(drop=True)
    assert (out["g"].to_numpy() == exp["g"].to_numpy()).all()
    assert (out["value"].to_numpy() == exp["value"].to_numpy()).all()


def test_grouped_quantiles_exact_single_value_group(ray_session):
    import ray.data as rd
    from sift_ray.functions.analytic import grouped_quantiles_exact
    df = pd.DataFrame({"g": np.array([1, 1, 2], np.int64),
                       "v": np.array([7, 7, -3], np.int64)})
    out = (grouped_quantiles_exact(rd.from_pandas(df), "g", "v",
                                   qs=(0.5,)).to_pandas()
           .sort_values("g").reset_index(drop=True))
    assert list(out["value"]) == [7, -3]


@pytest.mark.parametrize("num_parts", [1, 17])
def test_grouped_quantiles_cont_matches_numpy(ray_session, num_parts):
    import ray.data as rd
    from sift_ray.functions.analytic import grouped_quantiles_cont
    rng = np.random.RandomState(77)
    df = pd.DataFrame({
        "g": rng.randint(0, 120, 5000).astype(np.int64),
        "v": rng.randint(-1000, 1000, 5000).astype(np.int64),
    })
    out = (grouped_quantiles_cont(rd.from_pandas(df), "g", "v",
                                  qs=(0.25, 0.5, 0.75),
                                  num_parts=num_parts)
           .to_pandas().sort_values(["g", "q"]).reset_index(drop=True))
    # reference: PERCENTILE_CONT — lo + (hi - lo) * frac at p = q*(n-1)
    recs = []
    for g, grp in df.groupby("g"):
        vals = np.sort(grp["v"].to_numpy()).astype(np.float64)
        n = len(vals)
        for q in (0.25, 0.5, 0.75):
            p = q * (n - 1)
            lo, hi = vals[int(np.floor(p))], vals[int(np.ceil(p))]
            recs.append((g, q, lo + (hi - lo) * (p - np.floor(p))))
    exp = pd.DataFrame(recs, columns=["g", "q", "value"]) \
        .sort_values(["g", "q"]).reset_index(drop=True)
    assert (out["g"].to_numpy() == exp["g"].to_numpy()).all()
    # doubles must be bit-exact: same formula, dyadic q
    assert (out["value"].to_numpy() == exp["value"].to_numpy()).all()


def test_grouped_quantiles_cont_single_row_group(ray_session):
    import ray.data as rd
    from sift_ray.functions.analytic import grouped_quantiles_cont
    df = pd.DataFrame({"g": np.array([1, 2, 2], np.int64),
                       "v": np.array([7, -3, 5], np.int64)})
    out = (grouped_quantiles_cont(rd.from_pandas(df), "g", "v",
                                  qs=(0.5,)).to_pandas()
           .sort_values("g").reset_index(drop=True))
    assert list(out["value"]) == [7.0, 1.0]


def test_grouped_quantiles_cont_equals_np_percentile(ray_session):
    """PERCENTILE_CONT == numpy's 'linear' method by definition; fuzz a
    few shapes including heavy ties and 2-row groups."""
    import ray.data as rd
    from sift_ray.functions.analytic import grouped_quantiles_cont
    rng = np.random.RandomState(5)
    for trial in range(4):
        n = int(rng.randint(50, 2000))
        df = pd.DataFrame({
            "g": rng.randint(0, max(2, n // 40), n).astype(np.int64),
            "v": rng.randint(-5, 5, n).astype(np.int64),  # heavy ties
        })
        qs = (0.1, 0.5, 0.9)
        out = (grouped_quantiles_cont(rd.from_pandas(df), "g", "v", qs=qs,
                                      num_parts=7)
               .to_pandas().sort_values(["g", "q"]).reset_index(drop=True))
        recs = [(g, q, float(np.percentile(grp["v"], q * 100,
                                           method="linear")))
                for g, grp in df.groupby("g") for q in qs]
        exp = pd.DataFrame(recs, columns=["g", "q", "value"]) \
            .sort_values(["g", "q"]).reset_index(drop=True)
        assert np.allclose(out["value"].to_numpy(), exp["value"].to_numpy(),
                           rtol=0, atol=1e-12), f"trial {trial}"


def test_linear_fit_matches_closed_form(ray_session):
    import ray.data as rd
    from sift_ray.functions.analytic import linear_fit
    rng = np.random.RandomState(11)
    x = rng.randint(0, 1000, 4000).astype(np.int64)
    y = (3 * x + 17 + rng.randint(-50, 50, 4000)).astype(np.int64)
    df = pd.DataFrame({"x": x, "y": y})
    out = linear_fit(rd.from_pandas(df).repartition(9), "x", "y") \
        .to_pandas().iloc[0]
    slope, intercept = np.polyfit(x.astype(float), y.astype(float), 1)
    r = np.corrcoef(x, y)[0, 1]
    assert out["n"] == 4000
    assert abs(out["slope"] - slope) < 1e-6
    assert abs(out["intercept"] - intercept) < 1e-4
    assert abs(out["r2"] - r * r) < 1e-9
    # partition invariance: exact same doubles from any layout
    out2 = linear_fit(rd.from_pandas(df).repartition(2), "x", "y") \
        .to_pandas().iloc[0]
    assert (out == out2).all()


def test_linear_fit_degenerate_constant_x(ray_session):
    import ray.data as rd
    from sift_ray.functions.analytic import linear_fit
    df = pd.DataFrame({"x": np.array([5, 5, 5], np.int64),
                       "y": np.array([1, 2, 3], np.int64)})
    out = linear_fit(rd.from_pandas(df), "x", "y").to_pandas().iloc[0]
    assert np.isnan(out["slope"]) and np.isnan(out["r2"])


@pytest.mark.parametrize("num_parts", [1, 9])
def test_pivot_counts_matches_pandas(ray_session, num_parts):
    import ray.data as rd
    from sift_ray.functions.analytic import pivot_counts
    rng = np.random.RandomState(41)
    df = pd.DataFrame({
        "k": rng.randint(0, 300, 4000).astype(np.int64),
        "s": rng.choice(["a", "b", "c", "zz"], 4000),  # zz not declared
    })
    out = (pivot_counts(rd.from_pandas(df), "k", "s", ["a", "b", "c"],
                        num_parts=num_parts)
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = (df.assign(n=1).pivot_table(index="k", columns="s", values="n",
                                      aggfunc="sum", fill_value=0)
           .reindex(columns=["a", "b", "c"]).fillna(0).astype(int))
    assert len(out) == df["k"].nunique()
    for v in ("a", "b", "c"):
        got = dict(zip(out["k"], out[f"n_{v}"]))
        for k, row in exp.iterrows():
            assert got[k] == row[v]
        assert out[f"n_{v}"].dtype == np.int64


def test_grouped_sample_deterministic(ray_session):
    import ray.data as rd
    from sift_ray.functions.corpus import grouped_sample
    df = pd.DataFrame({
        "doc_id": np.arange(500, dtype=np.int64),
        "grp": [f"g{i % 7}" for i in range(500)],
    })
    a = (grouped_sample(rd.from_pandas(df), "grp", k=4).to_pandas()
         .sort_values(["grp", "rank"]).reset_index(drop=True))
    b = (grouped_sample(rd.from_pandas(df).repartition(11), "grp", k=4)
         .to_pandas().sort_values(["grp", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert (a.groupby("grp").size() == 4).all()


def test_asof_join_forward_semantics(ray_session):
    import ray.data as rd
    from sift_ray.functions.shuffle import asof_join
    left = pd.DataFrame({
        "k": np.array([1, 1, 1, 2], np.int64),
        "t": np.array([5, 10, 20, 7], np.int64),
        "lid": np.arange(4, dtype=np.int64),
    })
    right = pd.DataFrame({
        "k": np.array([1, 1, 2], np.int64),
        "t": np.array([10, 15, 3], np.int64),
        "v": np.array([100, 150, 30], np.int64),
    })
    out = (asof_join(rd.from_pandas(left), rd.from_pandas(right),
                     key="k", ts="t", value_col="v",
                     direction="forward").to_pandas()
           .sort_values("lid").reset_index(drop=True))
    # t=5 -> next right at 10; t=10 -> tie matches (10); t=20 -> none;
    # k=2 t=7 -> right at 3 is BEFORE, no forward match
    assert list(out["v"].fillna(-1).astype(int)) == [100, 100, -1, -1]
    # backward on the same data for contrast
    back = (asof_join(rd.from_pandas(left), rd.from_pandas(right),
                      key="k", ts="t", value_col="v").to_pandas()
            .sort_values("lid").reset_index(drop=True))
    assert list(back["v"].fillna(-1).astype(int)) == [-1, 100, 150, 30]


def test_asof_join_rejects_bad_direction(ray_session):
    import ray.data as rd
    from sift_ray.functions.shuffle import asof_join
    df = pd.DataFrame({"k": [1], "t": [1], "v": [1]})
    with pytest.raises(ValueError):
        asof_join(rd.from_pandas(df[["k", "t"]]), rd.from_pandas(df),
                  key="k", ts="t", value_col="v",
                  direction="sideways").take_all()


def test_ivf_full_train_mode(ray_session):
    # IVF with distributed full-corpus k-means training: valid ranked
    # output, and full-probe degenerates to exact brute force
    import ray.data as rd
    from sift_ray.functions.similarity import cosine_topk_ivf, cosine_topk
    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = [1, 5]
    approx = cosine_topk_ivf(ds, qids, k=5, n_clusters=4, n_probe=4,
                             train="full")
    exact = cosine_topk(
        rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet"),
        qids, k=5)
    if hasattr(exact, "to_pandas"):
        exact = exact.to_pandas()
    a = approx.sort_values(["query_id", "rank"]).reset_index(drop=True)
    e = exact.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert list(a["neighbor_id"]) == list(e["neighbor_id"])
    with pytest.raises(ValueError):
        cosine_topk_ivf(ds, qids, train="bogus")


def test_json_extract_cols_types_and_malformed(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from sift_ray.functions.textstats import json_extract_cols
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "props": pa.array(['{"k": 7, "s": "x", "f": 1.5}',
                           '{"k": "notint"}',
                           'not json at all',
                           None,
                           '{"s": 12}',          # wrong type -> null
                           '[1,2,3]'],           # non-object -> nulls
                          pa.string()),
    })
    out = (json_extract_cols(rd.from_arrow(t), "props",
                             [("k", "k_val", "int"),
                              ("s", "s_val", "str"),
                              ("f", "f_val", "float")])
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert list(out["k_val"].fillna(-1).astype(int)) == [7, -1, -1, -1,
                                                         -1, -1]
    assert out["s_val"].iloc[0] == "x" and out["s_val"].iloc[4] is None
    assert out["f_val"].iloc[0] == 1.5


def test_keyed_rank_calcs_ties_and_ntile(ray_session):
    import pandas as pd
    import ray.data as rd
    from sift_ray.functions.analytic import keyed_rank_calcs
    # key 1: values 5,5,7,9,9 (ties); key 2: one row
    df = pd.DataFrame({
        "k": [1, 1, 1, 1, 1, 2],
        "id": [10, 11, 12, 13, 14, 20],
        "v": [5, 5, 7, 9, 9, 3],
    })
    out = (keyed_rank_calcs(rd.from_pandas(df), "k", "v", "id", q=2)
           .to_pandas().sort_values(["k", "v", "id"])
           .reset_index(drop=True))
    assert list(out.rnk) == [1, 1, 3, 4, 4, 1]
    assert list(out.drnk) == [1, 1, 2, 3, 3, 1]
    # percent_rank = (rnk-1)/(n-1); single-row group -> 0.0
    assert list(out.prnk) == [0.0, 0.0, 0.5, 0.75, 0.75, 0.0]
    # ntile(2) over 5 rows: buckets of 3 then 2; 1-row group -> bucket 1
    assert list(out.nt) == [1, 1, 1, 2, 2, 1]
    assert list(out.fv) == [5, 5, 5, 5, 5, 3]
    assert list(out.lv) == [9, 9, 9, 9, 9, 3]


@pytest.mark.parametrize("num_parts", [1, 16])
def test_cube_matches_pandas(ray_session, num_parts):
    import ray.data as rd
    from sift_ray.functions.analytic import cube
    df = _rollup_df()
    out = cube(rd.from_pandas(df), ["a", "b"],
               [("v", "sum", "sv"), (None, "count_all", "n")],
               num_parts=num_parts).to_pandas()
    fin = df.groupby(["a", "b"]).agg(sv=("v", "sum"), n=("v", "size"))
    by_a = df.groupby("a").agg(sv=("v", "sum"), n=("v", "size"))
    by_b = df.groupby("b").agg(sv=("v", "sum"), n=("v", "size"))
    assert len(out) == len(fin) + len(by_a) + len(by_b) + 1
    o_fin = out.dropna(subset=["a", "b"]).set_index(["a", "b"])
    for idx, row in fin.iterrows():
        assert o_fin.loc[idx, "sv"] == row["sv"]
    o_b = out[out["a"].isna() & out["b"].notna()].set_index("b")
    for idx, row in by_b.iterrows():
        assert o_b.loc[idx, "sv"] == row["sv"]
        assert o_b.loc[idx, "n"] == row["n"]
    total = out[out["a"].isna() & out["b"].isna()]
    assert len(total) == 1 and total["sv"].iloc[0] == df["v"].sum()


def test_grouping_sets_explicit(ray_session):
    import ray.data as rd
    from sift_ray.functions.analytic import grouping_sets
    df = _rollup_df()
    # (b) and () only — neither the finest nor the prefix lattice
    out = grouping_sets(rd.from_pandas(df), ["a", "b"],
                        [("v", "sum", "sv")], [("b",), ()]).to_pandas()
    by_b = df.groupby("b")["v"].sum()
    assert len(out) == len(by_b) + 1
    o_b = out[out["b"].notna()].set_index("b")
    for idx, v in by_b.items():
        assert o_b.loc[idx, "sv"] == v
    assert out["a"].isna().all()
    total = out[out["b"].isna()]
    assert total["sv"].iloc[0] == df["v"].sum()


def test_grouping_sets_rejects_non_subset():
    from sift_ray.functions.analytic import grouping_sets
    with pytest.raises(ValueError):
        grouping_sets(None, ["a"], [("v", "sum", "s")], [("zz",)])


@pytest.mark.parametrize("op,expect", [
    ("except", {(1, "x"), (4, "w")}),
    ("intersect", {(2, "y"), (3, "z")}),
    ("union", {(1, "x"), (2, "y"), (3, "z"), (4, "w"), (5, "v"), (9, "x")}),
])
def test_set_op_semantics(ray_session, op, expect):
    import ray.data as rd
    from sift_ray.functions.relational import set_op
    left = pd.DataFrame({"k": [1, 2, 3, 4, 2, 1],
                         "s": ["x", "y", "z", "w", "y", "x"]})
    right = pd.DataFrame({"k": [2, 3, 5, 9, 3],
                          "s": ["y", "z", "v", "x", "z"]})
    out = set_op(rd.from_pandas(left), rd.from_pandas(right),
                 ["k", "s"], op, num_parts=4).to_pandas()
    got = set(zip(out["k"].astype(int), out["s"]))
    assert got == expect
    assert len(out) == len(got)  # DISTINCT: no duplicate tuples


def test_set_op_null_keys_compare_equal(ray_session):
    import ray.data as rd
    from sift_ray.functions.relational import set_op
    left = pd.DataFrame({"k": pd.array([1, None, 2], dtype="Int64")})
    right = pd.DataFrame({"k": pd.array([None, 2], dtype="Int64")})
    inter = set_op(rd.from_pandas(left), rd.from_pandas(right),
                   ["k"], "intersect", num_parts=3).to_pandas()
    # SQL INTERSECT treats NULL = NULL: both the null row and 2 survive
    assert len(inter) == 2
    assert inter["k"].isna().sum() == 1
    exc = set_op(rd.from_pandas(left), rd.from_pandas(right),
                 ["k"], "except", num_parts=3).to_pandas()
    assert list(exc["k"].dropna().astype(int)) == [1]


@pytest.mark.parametrize("num_parts", [1, 7])
def test_set_op_partition_invariant(ray_session, num_parts):
    import ray.data as rd
    from sift_ray.functions.relational import set_op
    rng = np.random.RandomState(11)
    left = pd.DataFrame({"k": rng.randint(0, 300, 2000).astype(np.int64)})
    right = pd.DataFrame({"k": rng.randint(100, 400, 2000).astype(np.int64)})
    out = set_op(rd.from_pandas(left), rd.from_pandas(right),
                 ["k"], "except", num_parts=num_parts).to_pandas()
    exp = np.setdiff1d(left["k"].unique(), right["k"].unique())
    assert sorted(out["k"].tolist()) == sorted(exp.tolist())


@pytest.mark.parametrize("num_parts", [1, 9])
def test_auc_exact_matches_sklearn_formula(ray_session, num_parts):
    import ray.data as rd
    from sift_ray.functions.analytic import auc_exact
    rng = np.random.RandomState(4)
    # heavy ties: scores in a small range
    s = rng.randint(0, 40, 3000).astype(np.int64)
    y = (rng.rand(3000) < 1 / (1 + np.exp(-(s - 20) / 5.0))).astype(np.int64)
    df = pd.DataFrame({"score": s, "label": y})
    out = auc_exact(rd.from_pandas(df).repartition(5), "label", "score",
                    num_parts=num_parts).to_pandas()
    # reference: Mann-Whitney with scipy-style average ranks
    import pandas as _pd
    ranks = _pd.Series(s).rank(method="average")
    r_pos = ranks[y == 1].sum()
    n_pos, n_neg = int(y.sum()), int((1 - y).sum())
    ref = (r_pos - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    assert abs(out["auc"].iloc[0] - ref) < 1e-9
    assert out["n_pos"].iloc[0] == n_pos
    assert out["n_neg"].iloc[0] == n_neg


def test_auc_exact_extremes(ray_session):
    import ray.data as rd
    from sift_ray.functions.analytic import auc_exact
    # perfectly separable -> AUC 1; anti-separable -> 0
    df = pd.DataFrame({"score": np.arange(100, dtype=np.int64),
                       "label": (np.arange(100) >= 50).astype(np.int64)})
    assert auc_exact(rd.from_pandas(df), "label",
                     "score").to_pandas()["auc"].iloc[0] == 1.0
    df["label"] = 1 - df["label"]
    assert auc_exact(rd.from_pandas(df), "label",
                     "score").to_pandas()["auc"].iloc[0] == 0.0
    with pytest.raises(Exception):
        one = pd.DataFrame({"score": np.arange(10, dtype=np.int64),
                            "label": np.ones(10, dtype=np.int64)})
        auc_exact(rd.from_pandas(one), "label", "score").to_pandas()


def test_profile_table_stats_and_distinct(ray_session):
    """Counts, nulls, exact distinct, typed min/max against a direct
    computation — including a null-bearing int column, a double column,
    a timestamp (epoch-micros min/max), a string column, and a binary
    column (distinct via hex, no min/max)."""
    import pyarrow as pa
    import ray.data as rd
    from sift_ray.functions.analytic import profile_table

    tbl = pa.table({
        "i": pa.array([1, None, 2, 2, None, 3], pa.int64()),
        "f": pa.array([0.5, 0.5, 1.25, None, 2.0, 2.0], pa.float64()),
        "s": pa.array(["b", "a", None, "a", "c", "c"], pa.string()),
        "t": pa.array([10, 20, 20, None, 30, 30], pa.timestamp("us")),
        "b": pa.array([b"\x00\x01", b"\x00\x01", None, b"\xff", b"",
                       b"\xff"], pa.binary()),
    })
    out = (profile_table(rd.from_arrow(tbl).repartition(3), num_parts=5)
           .to_pandas().set_index("col"))
    assert list(out.index) == ["b", "f", "i", "s", "t"]
    assert (out["n_rows"] == 6).all()
    assert out.loc["i", "n_nulls"] == 2 and out.loc["i", "n_distinct"] == 3
    assert out.loc["i", "min_num"] == 1.0 and out.loc["i", "max_num"] == 3.0
    assert out.loc["f", "n_distinct"] == 3
    assert out.loc["f", "min_num"] == 0.5 and out.loc["f", "max_num"] == 2.0
    assert out.loc["s", "n_distinct"] == 3
    assert out.loc["s", "min_str"] == "a" and out.loc["s", "max_str"] == "c"
    assert pd.isna(out.loc["s", "min_num"])
    assert out.loc["t", "n_distinct"] == 3
    assert out.loc["t", "min_num"] == 10.0 and out.loc["t", "max_num"] == 30.0
    assert out.loc["b", "n_distinct"] == 3 and out.loc["b", "n_nulls"] == 1
    assert pd.isna(out.loc["b", "min_num"]) and pd.isna(out.loc["b", "min_str"])


def test_profile_table_partition_invariant_and_all_null(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from sift_ray.functions.analytic import profile_table

    rng = np.random.default_rng(5)
    tbl = pa.table({
        "k": pa.array(rng.integers(0, 50, 500), pa.int64()),
        "v": pa.array(rng.random(500), pa.float64()),
        "z": pa.array([None] * 500, pa.string()),
    })
    a = profile_table(rd.from_arrow(tbl), num_parts=4).to_pandas()
    b = (profile_table(rd.from_arrow(tbl).repartition(9), num_parts=11)
         .to_pandas())
    assert a.equals(b)
    z = a.set_index("col").loc["z"]
    assert z["n_nulls"] == 500 and z["n_distinct"] == 0
    assert pd.isna(z["min_str"])


def test_set_op_all_bag_semantics(ray_session):
    """EXCEPT ALL / INTERSECT ALL replicate by count difference/minimum,
    NULL keys compare equal, and results are partition invariant."""
    import pyarrow as pa
    import ray.data as rd
    from sift_ray.functions.relational import set_op

    l = pa.table({"k": pa.array([1, 1, 1, 2, 2, 3, None], pa.int64())})
    r = pa.table({"k": pa.array([1, 2, 2, 2, 4, None, None], pa.int64())})
    for parts in (1, 3):
        ex = (set_op(rd.from_arrow(l).repartition(parts), rd.from_arrow(r),
                     ["k"], "except", all_rows=True, num_parts=4)
              .to_pandas().sort_values("k").reset_index(drop=True))
        # l counts {1:3, 2:2, 3:1, null:1}; r {1:1, 2:3, 4:1, null:2}
        assert ex["k"].tolist() == [1.0, 1.0, 3.0]
        it = (set_op(rd.from_arrow(l).repartition(parts), rd.from_arrow(r),
                     ["k"], "intersect", all_rows=True, num_parts=4)
              .to_pandas().sort_values("k").reset_index(drop=True))
        vals = it["k"].tolist()
        assert vals[:3] == [1.0, 2.0, 2.0] and pd.isna(vals[3])
    with pytest.raises(ValueError):
        set_op(rd.from_arrow(l), rd.from_arrow(r), ["k"], "union",
               all_rows=True)


def test_grouped_string_agg(ray_session):
    """string_agg per group at distributed scale: within-group order by
    order_col, deterministic, partition invariant; string group keys."""
    import pyarrow as pa
    import ray.data as rd
    from sift_ray.functions.analytic import grouped_string_agg

    t = pa.table({"g": pa.array(["b", "a", "a", "b", "a", "c"]),
                  "v": pa.array(["2", "x", "y", "1", "z", "q"]),
                  "o": pa.array([2, 1, 2, 1, 3, 1], pa.int64())})
    a = (grouped_string_agg(rd.from_arrow(t), "g", "v", "o", sep="|",
                            num_parts=3).to_pandas()
         .sort_values("g").reset_index(drop=True))
    b = (grouped_string_agg(rd.from_arrow(t).repartition(4), "g", "v",
                            "o", sep="|", num_parts=5).to_pandas()
         .sort_values("g").reset_index(drop=True))
    assert a.equals(b)
    assert dict(zip(a["g"], a["agg"])) == {"a": "x|y|z", "b": "1|2",
                                           "c": "q"}


def test_grouped_string_agg_null_keys(ray_session):
    """Null group keys form ONE group (pandas dropna=False / SQL GROUP BY
    semantics) and large int64 keys stay exact — both break if the kernel
    views a nullable int key as float64 (NaN != NaN; 2^53 rounding)."""
    import pyarrow as pa
    import ray.data as rd
    from sift_ray.functions.analytic import grouped_string_agg

    big = (1 << 60) + 1
    t = pa.table({"g": pa.array([None, 7, None, big, 7, None, big + 1],
                                pa.int64()),
                  "v": pa.array(["a", "p", "b", "x", "q", "c", "y"]),
                  "o": pa.array([1, 1, 2, 1, 2, 3, 1], pa.int64())})
    rows = grouped_string_agg(rd.from_arrow(t).repartition(3), "g", "v",
                              "o", sep="|", num_parts=4).take_all()
    got = {r["g"]: r["agg"] for r in rows}   # Arrow rows: exact ints/None
    assert got == {None: "a|b|c", 7: "p|q", big: "x", big + 1: "y"}
    assert len(rows) == 4


def test_ohlc_window_matches_pandas(ray_session):
    """OHLC bars against a pandas replica: open/close by (ts, event_id)
    order incl. timestamp ties, low/high/n exact, partition invariant."""
    import pyarrow as pa
    import ray.data as rd
    from sift_ray.functions.windows import ohlc_window

    rng = np.random.default_rng(11)
    n = 3000
    ts = rng.integers(0, 900_000, n) * 1_000_000  # us; many win ties
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(ts, unit="us"),
        "user_id": rng.integers(0, 20, n).astype(np.int64),
        "value": np.round(rng.random(n) * 100, 3),
    })
    out = (ohlc_window(rd.from_pandas(ev).repartition(6), window_s=300,
                       num_parts=5).to_pandas()
           .sort_values(["user_id", "win"]).reset_index(drop=True))
    out2 = (ohlc_window(rd.from_pandas(ev), window_s=300, num_parts=9)
            .to_pandas().sort_values(["user_id", "win"])
            .reset_index(drop=True))
    assert out.equals(out2)
    ref = ev.copy()
    ref["tus"] = ts
    ref["win"] = ref["tus"] // 300_000_000
    ref = ref.sort_values(["user_id", "win", "tus", "event_id"])
    g = ref.groupby(["user_id", "win"])
    exp = pd.DataFrame({
        "open": g["value"].first(), "close": g["value"].last(),
        "low": g["value"].min(), "high": g["value"].max(),
        "n_events": g["value"].size().astype("int64")}).reset_index()
    merged = out.merge(exp, on=["user_id", "win"], suffixes=("", "_e"))
    assert len(merged) == len(exp) == len(out)
    for c in ("open", "close", "low", "high", "n_events"):
        assert (merged[c] == merged[c + "_e"]).all(), c


def test_regional_revenue_paths_agree(ray_session):
    import os
    import ray.data as rd
    from sift_ray.functions.relational import regional_revenue
    sf = "/root/testdata/sf0.001"
    rp = lambda t, cols: rd.read_parquet(  # noqa: E731
        os.path.join(sf, f"{t}.parquet"), columns=cols)
    args = lambda: (  # noqa: E731
        rp("lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"]),
        rp("orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
        rp("customer", ["c_custkey", "c_nationkey"]),
        rp("supplier", ["s_suppkey", "s_nationkey"]),
        rp("nation", ["n_nationkey", "n_name", "n_regionkey"]),
        rp("region", ["r_regionkey", "r_name"]))
    fast = (regional_revenue(*args()).to_pandas()
            .sort_values("n_name").reset_index(drop=True))
    # gates forced to 0: every join takes the distributed hash_join route
    slow = (regional_revenue(*args(), broadcast_dims=0, broadcast_orders=0)
            .to_pandas().sort_values("n_name").reset_index(drop=True))
    assert len(fast) > 0  # non-vacuous: some ASIA-1996 revenue exists
    assert fast.equals(slow)


def test_kmeans_dense_and_sparse_paths_identical(ray_session, monkeypatch):
    """The dense driver-fold partials and the (cluster, dim)-keyed
    exchange must train bit-identical centroids and stats."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    import sift_ray.functions.similarity as sim

    rng = np.random.RandomState(9)
    vecs = rng.randn(80, 6)
    df = pd.DataFrame({"vec_id": range(80),
                       "embedding": [list(v) for v in vecs]})
    C1, s1 = sim.kmeans_fit(rd.from_pandas(df), n_clusters=4, n_iter=3)
    monkeypatch.setattr(sim, "_DENSE_KMEANS_LIMIT", 0)
    C2, s2 = sim.kmeans_fit(rd.from_pandas(df).repartition(5),
                            n_clusters=4, n_iter=3)
    np.testing.assert_array_equal(C1, C2)
    pd.testing.assert_frame_equal(s1.to_pandas(), s2.to_pandas())


def test_boilerplate_strip_map_side_matches_exchange_path(ray_session,
                                                          monkeypatch):
    """The gated in-batch strip must equal the bloom anti-join +
    reassembly-exchange path row for row."""
    import pandas as pd
    import ray.data as rd
    import sift_ray.functions.corpus as cp

    docs = []
    for h in ("a.com", "b.com"):
        for i in range(4):
            docs.append({"doc_id": len(docs),
                         "source": h,
                         "text": f"real content {h} {i}\ncookie banner "
                                 f"{h}\nmore text {i}"})
    df = pd.DataFrame(docs)

    def run():
        return (cp.boilerplate_strip(rd.from_pandas(df), min_docs=2,
                                     max_frac=0.5).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))

    got_map = run()
    assert not got_map["text"].str.contains("cookie banner").any()
    monkeypatch.setattr(cp, "_BROADCAST_STRIP_LIMIT", 0)
    got_join = run()
    pd.testing.assert_frame_equal(got_map, got_join)


def test_explode_list_ordinality_and_nulls(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from sift_ray.functions.relational import explode_list

    tbl = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "tag": pa.array(["a", "b", "c", "d"], pa.string()),
        "xs": pa.array([[10, 20], [], None, [7]],
                       pa.list_(pa.int32())),
    })
    out = explode_list(rd.from_arrow(tbl), "xs", ["id", "tag"]) \
        .to_pandas().sort_values(["id", "ordinal"]).reset_index(drop=True)
    assert out.to_dict("list") == {
        "id": [1, 1, 4], "tag": ["a", "a", "d"],
        "ordinal": [0, 1, 0], "value": [10, 20, 7]}

    # sliced-batch safety: run through a multi-block dataset
    big = pa.table({
        "id": pa.array(np.arange(100), pa.int64()),
        "xs": pa.array([[int(i), int(i) + 1] for i in range(100)],
                       pa.list_(pa.int64())),
    })
    got = explode_list(rd.from_arrow(big).repartition(7), "xs", ["id"]) \
        .to_pandas()
    assert len(got) == 200
    assert (got.loc[got.ordinal == 0, "value"].sort_values().to_numpy()
            == np.arange(100)).all()
    assert (got["value"] - got["id"] == got["ordinal"]).all()


def test_range_window_agg_matches_bruteforce(ray_session):
    """Value-based RANGE frame (ties are peers) vs a brute-force double
    loop, including duplicate timestamps and singleton keys."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from sift_ray.functions.analytic import range_window_agg

    rng = np.random.RandomState(3)
    n = 400
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, 12, n).astype(np.int64),
        "ts": rng.randint(0, 5000, n).astype(np.int64),  # dup ts likely
        "v": rng.randint(-50, 100, n).astype(np.int64),
    })
    out = range_window_agg(rd.from_pandas(df).repartition(5),
                           "user_id", "ts", "v", range_us=700,
                           num_parts=4).to_pandas()
    got = {int(r.event_id): (int(r.w_sum), int(r.w_cnt))
           for r in out.itertuples()}
    for r in df.itertuples():
        frame = df[(df.user_id == r.user_id) & (df.ts <= r.ts)
                   & (df.ts >= r.ts - 700)]
        assert got[int(r.event_id)] == (int(frame.v.sum()), len(frame)), \
            r.event_id


def test_group_zscore_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from sift_ray.functions.analytic import group_zscore

    rng = np.random.RandomState(8)
    df = pd.DataFrame({
        "id": np.arange(300, dtype=np.int64),
        "g": rng.randint(0, 9, 300).astype(np.int64),
        "v": rng.randint(-1000, 1000, 300).astype(np.int64),
    })
    # plant a singleton group and a constant group
    df.loc[df.index[-3:], "g"] = 100
    df.loc[df.index[-3:], "v"] = 7
    df.loc[df.index[0], "g"] = 101

    out = group_zscore(rd.from_pandas(df).repartition(4), "g", "v",
                       num_parts=3).to_pandas()
    got = dict(zip(out.id, out.z))
    for g, grp in df.groupby("g"):
        std = grp.v.std(ddof=0)
        for r in grp.itertuples():
            want = 0.0 if std == 0 else (r.v - grp.v.mean()) / std
            assert abs(got[int(r.id)] - want) < 1e-12, (g, r.id)


def test_merge_intervals_matches_bruteforce(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from sift_ray.functions.analytic import merge_intervals

    rng = np.random.RandomState(4)
    n = 500
    s = rng.randint(0, 10_000, n).astype(np.int64)
    df = pd.DataFrame({
        "k": rng.randint(0, 15, n).astype(np.int64),
        "s": s,
        "e": s + rng.randint(0, 400, n).astype(np.int64),
    })
    out = merge_intervals(rd.from_pandas(df).repartition(4), "k", "s", "e",
                          num_parts=3).to_pandas()
    got = sorted(map(tuple, out[["k", "island_start", "island_end",
                                 "n_events"]].itertuples(index=False)))
    want = []
    for k, grp in df.groupby("k"):
        ivs = sorted(zip(grp.s, grp.e))
        cur_s, cur_e, cnt = ivs[0][0], ivs[0][1], 1
        for a, b in ivs[1:]:
            if a <= cur_e:  # touching joins
                cur_e = max(cur_e, b)
                cnt += 1
            else:
                want.append((k, cur_s, cur_e, cnt))
                cur_s, cur_e, cnt = a, b, 1
        want.append((k, cur_s, cur_e, cnt))
    assert got == sorted(want)


def test_rrf_fuse_matches_reference(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from sift_ray.functions.relational import rrf_fuse

    a = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                      "global_rank": [1, 2, 3, 4]})
    b = pd.DataFrame({"doc_id": [3, 4, 5],
                      "global_rank": [1, 2, 3]})
    out = rrf_fuse(rd.from_pandas(a), rd.from_pandas(b), k=60,
                   num_parts=3).to_pandas()
    got = dict(zip(out.doc_id, out.rrf))
    assert len(got) == 5
    assert got[1] == 1 / 61
    assert got[3] == 1 / 63 + 1 / 61   # in both rankings
    assert got[5] == 1 / 63            # only in b
    # fused order puts the doubly-ranked docs first
    order = sorted(got, key=got.get, reverse=True)
    assert set(order[:2]) == {3, 4}
