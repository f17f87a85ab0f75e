"""fuzzy_pairs: banded-DP exactness, FastSS completeness, distributed
pair mining vs an in-process brute force, planted typo families."""

import os
import random
import sys

import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sift_ray.functions.fuzzy import (_deletion_variants, _lev_banded,
                                      fuzzy_pairs)


def lev_full(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    d = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, d[0] = d[0], i
        for j in range(1, lb + 1):
            cur = min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev, d[j] = d[j], cur
    return d[lb]


def test_banded_dp_matches_full_dp():
    rng = random.Random(11)
    for _ in range(8000):
        a = "".join(rng.choice("abcd") for _ in range(rng.randrange(0, 9)))
        b = "".join(rng.choice("abcd") for _ in range(rng.randrange(0, 9)))
        true = lev_full(a, b)
        for k in (1, 2, 3):
            want = true if true <= k else None
            assert _lev_banded(a, b, k) == want, (a, b, k)


def test_fastss_candidate_completeness():
    # lev(a,b) <= k implies a shared <=k-deletion variant — the exactness
    # guarantee candidate generation rests on
    rng = random.Random(13)
    for _ in range(4000):
        a = "".join(rng.choice("abc") for _ in range(rng.randrange(0, 8)))
        b = "".join(rng.choice("abc") for _ in range(rng.randrange(0, 8)))
        for k in (1, 2):
            if lev_full(a, b) <= k:
                assert _deletion_variants(a, k) & _deletion_variants(b, k)


def test_deletion_variants_dedupe_repeats():
    # deleting either 'o' of "foo" is the same string: variants collapse
    assert _deletion_variants("foo", 1) == {"foo", "oo", "fo"}
    assert "" in _deletion_variants("ab", 2)


def _pairs_of(ds):
    return sorted((r["doc_a"], r["doc_b"], r["dist"])
                  for r in ds.take_all())


def _brute(rows, k):
    out = []
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            d = lev_full(rows[i][1], rows[j][1])
            if d <= k:
                a, b = rows[i][0], rows[j][0]
                out.append((min(a, b), max(a, b), d))
    return sorted(out)


def test_fuzzy_pairs_matches_brute_force(ray_session):
    import ray.data as rd
    rng = random.Random(5)
    base = ["".join(rng.choice("abcdef") for _ in range(10))
            for _ in range(60)]
    rows = []
    rid = 0
    for s in base:
        rows.append((rid, s)); rid += 1
        if rng.random() < 0.5:  # planted typo neighbor
            i = rng.randrange(len(s))
            op = rng.choice(("sub", "del", "ins"))
            if op == "sub":
                t = s[:i] + rng.choice("xyz") + s[i + 1:]
            elif op == "del":
                t = s[:i] + s[i + 1:]
            else:
                t = s[:i] + rng.choice("xyz") + s[i:]
            rows.append((rid, t)); rid += 1
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string())}))
    for k in (1, 2):
        got = _pairs_of(fuzzy_pairs(ds, k=k, num_parts=4))
        assert got == _brute(rows, k), f"k={k}"


def test_fuzzy_pairs_each_pair_once_and_typed_empty(ray_session):
    import ray.data as rd
    # "aa" vs "ab": shares variants "a" (two ways for aa) — must emit once
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["aa", "ab"], pa.string())}))
    got = _pairs_of(fuzzy_pairs(ds, k=1, num_parts=4))
    assert got == [(1, 2, 1)]
    # no pairs within k: typed empty result with the pinned schema
    ds2 = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["aaaa", "zzzz"], pa.string())}))
    out = fuzzy_pairs(ds2, k=1, num_parts=4)
    assert out.count() == 0
    # dataset-level schema survives the all-empty exchange (Ray's
    # to_pandas() drops columns on any fully-empty dataset — quirk)
    assert out.schema().names == ["doc_a", "doc_b", "dist"]


def test_fuzzy_pairs_skips_nulls_and_long_strings(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["abc", "abd", None, "x" * 500], pa.string())}))
    got = _pairs_of(fuzzy_pairs(ds, k=1, max_len=256, num_parts=4))
    assert got == [(1, 2, 1)]


def test_fuzzy_pairs_max_bucket_drops_hub_variant(ray_session):
    import ray.data as rd
    # 5 strings all sharing variant "aaa" (one sub each at position 0);
    # max_bucket=2 suppresses that bucket's pairs — exactness is
    # explicitly traded away, and the cap is the documented guard
    strs = ["aaaa", "baaa", "caaa", "daaa", "eaaa"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(strs))), pa.int64()),
        "text": pa.array(strs, pa.string())}))
    full = _pairs_of(fuzzy_pairs(ds, k=1, num_parts=2))
    assert len(full) == 10  # every pair differs in position 0 only
    capped = _pairs_of(fuzzy_pairs(ds, k=1, num_parts=2, max_bucket=2))
    assert len(capped) < len(full)


def test_fuzzy_join_matches_brute_force(ray_session):
    import ray.data as rd
    rng = random.Random(23)
    mk = lambda n: ["".join(rng.choice("abcde") for _ in range(8))
                    for _ in range(n)]
    lrows = list(enumerate(mk(40)))
    # right side: typo'd copies of some left strings + fresh strings,
    # with an id space that OVERLAPS left's numerically
    rrows = []
    for i, (lid, s) in enumerate(lrows[:20]):
        j = rng.randrange(len(s))
        rrows.append((i, s[:j] + rng.choice("xyz") + s[j + 1:]))
    rrows += [(20 + i, s) for i, s in enumerate(mk(20))]

    def to_ds(rows):
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string())}))

    from sift_ray.functions.fuzzy import fuzzy_join
    for k in (1, 2):
        got = _pairs_of(fuzzy_join(to_ds(lrows), to_ds(rrows), k=k,
                                   num_parts=4))
        want = sorted((la, rb, lev_full(ls, rs))
                      for la, ls in lrows for rb, rs in rrows
                      if lev_full(ls, rs) <= k)
        assert got == want, f"k={k}"


def test_fuzzy_join_is_cross_side_only(ray_session):
    import ray.data as rd
    from sift_ray.functions.fuzzy import fuzzy_join
    # two near-identical strings on the SAME side must not pair
    l = rd.from_arrow(pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                                "text": pa.array(["abc", "abd"],
                                                 pa.string())}))
    r = rd.from_arrow(pa.table({"doc_id": pa.array([7], pa.int64()),
                                "text": pa.array(["abe"], pa.string())}))
    got = _pairs_of(fuzzy_join(l, r, k=1, num_parts=4))
    assert got == [(1, 7, 1), (2, 7, 1)]
