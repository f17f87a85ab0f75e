"""Property-based tests (hypothesis) for the core exchange primitives:
random frames with duplicate keys, nulls, negative values, and string
keys, checked against pandas/python-set semantics. Examples are capped
(each example executes real Ray pipelines)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(max_examples=8, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture,
                                      HealthCheck.too_slow])

keys = st.lists(st.integers(min_value=-5, max_value=8),
                min_size=0, max_size=40)
vals = st.integers(min_value=-10**6, max_value=10**6)


def _frame(ks, seed):
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "k": np.asarray(ks, dtype=np.int64),
        "v": rng.randint(-1000, 1000, len(ks)).astype(np.int64)})


def _null_safe_rows(df, cols):
    out = []
    for row in df[cols].itertuples(index=False):
        out.append(tuple(None if pd.isna(x) else int(x) for x in row))
    return sorted(out, key=lambda t: tuple(
        (x is None, 0 if x is None else x) for x in t))


@pytest.mark.parametrize("how", ["inner", "anti", "semi", "left", "full"])
@SET
@given(lk=keys, rk=keys, seed=st.integers(0, 99))
def test_hash_join_matches_pandas(ray_session, how, lk, rk, seed):
    import ray.data as rd
    from sift_ray.functions.shuffle import hash_join
    left = _frame(lk, seed)
    right = _frame(rk, seed + 1).rename(columns={"v": "w"})
    out = hash_join(
        rd.from_pandas(left), rd.from_pandas(right), on="k", how=how,
        left_types={"k": pa.int64(), "v": pa.int64()},
        right_types={"k": pa.int64(), "w": pa.int64()},
        num_parts=3).to_pandas()
    if how == "inner":
        exp, cols = left.merge(right, on="k", how="inner"), ["k", "v", "w"]
    elif how == "anti":
        exp, cols = left[~left["k"].isin(right["k"])], ["k", "v"]
    elif how == "semi":
        exp, cols = left[left["k"].isin(right["k"])], ["k", "v"]
    elif how == "left":
        exp, cols = left.merge(right, on="k", how="left"), ["k", "v", "w"]
    else:  # full outer: unmatched rows on BOTH sides survive with nulls
        exp, cols = left.merge(right, on="k", how="outer"), ["k", "v", "w"]
    if len(exp) == 0:
        # Ray quirk: to_pandas() of an empty dataset is 0-column
        assert len(out) == 0
        return
    assert _null_safe_rows(out, cols) == _null_safe_rows(exp, cols)


@pytest.mark.parametrize("op", ["except", "intersect", "union"])
@SET
@given(lk=keys, rk=keys)
def test_set_op_matches_python_sets(ray_session, op, lk, rk):
    import ray.data as rd
    from sift_ray.functions.relational import set_op
    left = pd.DataFrame({"k": np.asarray(lk, dtype=np.int64)})
    right = pd.DataFrame({"k": np.asarray(rk, dtype=np.int64)})
    out = set_op(rd.from_pandas(left), rd.from_pandas(right), ["k"], op,
                 num_parts=3).to_pandas()
    ls, rs = set(lk), set(rk)
    exp = {"except": ls - rs, "intersect": ls & rs,
           "union": ls | rs}[op]
    if len(exp) == 0:
        assert len(out) == 0
        return
    assert set(out["k"].tolist()) == exp
    assert len(out) == len(exp)


@SET
@given(ks=keys, seed=st.integers(0, 99))
def test_partitioned_group_agg_matches_pandas(ray_session, ks, seed):
    import ray.data as rd
    from sift_ray.functions.shuffle import partitioned_group_agg
    df = _frame(ks, seed)
    if len(df) == 0:
        return
    out = partitioned_group_agg(
        rd.from_pandas(df).repartition(3), ["k"],
        [("v", "sum", "s"), ("v", "min", "lo"), ("v", "max", "hi"),
         (None, "count_all", "n")], num_parts=4).to_pandas()
    exp = df.groupby("k")["v"].agg(["sum", "min", "max", "size"])
    got = out.set_index("k").sort_index()
    assert list(got.index) == list(exp.index)
    assert got["s"].tolist() == exp["sum"].tolist()
    assert got["lo"].tolist() == exp["min"].tolist()
    assert got["hi"].tolist() == exp["max"].tolist()
    assert got["n"].tolist() == exp["size"].tolist()


@SET
@given(ks=keys, seed=st.integers(0, 99), k=st.integers(1, 4))
def test_grouped_topk_matches_pandas(ray_session, ks, seed, k):
    import ray.data as rd
    from sift_ray.functions.relational import grouped_topk
    df = _frame(ks, seed)
    df["tb"] = np.arange(len(df), dtype=np.int64)  # unique tiebreak
    if len(df) == 0:
        return
    out = grouped_topk(rd.from_pandas(df).repartition(3), "k", "v", "tb",
                       k=k, num_parts=3).to_pandas()
    exp = (df.sort_values(["k", "v", "tb"],
                          ascending=[True, False, True], kind="stable")
           .groupby("k").head(k))
    if len(exp) == 0:
        assert len(out) == 0
        return
    assert sorted(map(tuple, out[["k", "v", "tb"]].to_numpy())) == \
        sorted(map(tuple, exp[["k", "v", "tb"]].to_numpy()))


word = st.sampled_from(["hash", "join", "dup", "the", "fox", "a", "zz"])
texts_strategy = st.lists(
    st.lists(word, min_size=0, max_size=12).map(" ".join),
    min_size=1, max_size=15)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(texts=texts_strategy,
       terms=st.lists(word, min_size=1, max_size=3, unique=True),
       seed=st.integers(0, 99))
def test_text_index_equals_streaming_bm25(ray_session, tmp_path_factory,
                                          texts, terms, seed):
    """Random corpora (duplicate words, empty docs) and random query
    terms: the persistent index must reproduce the streaming scan."""
    import ray.data as rd
    from sift_ray.functions.corpus import bm25_topk
    from sift_ray.sources.text_index import (build_text_index,
                                             query_text_index)

    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    d = str(tmp_path_factory.mktemp("tixp"))
    build_text_index(rd.from_arrow(t), d, buckets=4)
    got = query_text_index(d, terms, k=10).to_pandas()
    want = bm25_topk(rd.from_arrow(t), terms, k=10).to_pandas()
    pd.testing.assert_frame_equal(got, want)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(texts=texts_strategy,
       phrase=st.lists(word, min_size=2, max_size=3))
def test_phrase_query_matches_reference(ray_session, tmp_path_factory,
                                        texts, phrase):
    """Random corpora and phrases (repeats allowed): the positional
    index must count exactly the consecutive-token occurrences a naive
    scan finds."""
    import ray.data as rd
    from sift_ray.sources.text_index import build_text_index, phrase_query

    def ref_counts():
        out = {}
        n = len(phrase)
        for i, t in enumerate(texts):
            toks = [w for w in t.split(" ") if w]
            c = sum(1 for j in range(len(toks) - n + 1)
                    if toks[j:j + n] == phrase)
            if c:
                out[i] = c
        return out

    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    d = str(tmp_path_factory.mktemp("phfz"))
    build_text_index(rd.from_arrow(t), d, buckets=4, positional=True)
    got = phrase_query(d, phrase).to_pandas()
    got_map = {} if got.empty else dict(zip(got["doc_id"],
                                            got["n_matches"]))
    assert got_map == ref_counts()


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(texts=texts_strategy,
       terms=st.lists(word, min_size=1, max_size=3, unique=True))
def test_text_index_and_mode_matches_reference(ray_session,
                                               tmp_path_factory,
                                               texts, terms):
    """AND mode keeps exactly the docs containing EVERY query term."""
    import ray.data as rd
    from sift_ray.sources.text_index import (build_text_index,
                                             query_text_index)

    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    d = str(tmp_path_factory.mktemp("tandp"))
    build_text_index(rd.from_arrow(t), d, buckets=4)
    got = query_text_index(d, terms, k=100, mode="and").to_pandas()
    got_ids = set() if got.empty else set(got["doc_id"])
    want = {i for i, txt in enumerate(texts)
            if all(w in txt.split(" ") for w in terms)}
    assert got_ids == want


# --- differential fuzz for the session-11 per-document kernels ---

doc_text = st.text(
    alphabet=st.sampled_from(list("ab .!?\n\t{J0")) ,
    min_size=0, max_size=60)


def _ref_c4(doc_texts, min_words=2, min_lines=1):
    import re
    out = {}
    for i, text in enumerate(doc_texts):
        if "lorem ipsum" in text.lower() or "{" in text:
            continue
        kept = []
        for line in text.split("\n"):
            t = line.strip(" \t\r")
            if (re.search(r'[.!?"]$', t)
                    and len(re.findall(r"[^ \t]+", t)) >= min_words
                    and "javascript" not in t.lower()):
                kept.append(t)
        if len(kept) >= min_lines:
            out[i] = ("\n".join(kept), len(kept))
    return out


@SET
@given(texts=st.lists(doc_text, min_size=1, max_size=6))
def test_c4_filters_matches_reference(ray_session, texts):
    import ray.data as rd
    from sift_ray.functions.corpus import c4_filters
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = c4_filters(rd.from_pandas(df), min_words=2,
                     min_lines=1).to_pandas()
    exp = _ref_c4(texts)
    assert {int(r.doc_id): (r.text, int(r.n_lines))
            for r in got.itertuples()} == exp


@SET
@given(texts=st.lists(st.text(
    alphabet=st.sampled_from(list("aA bB,3.\t")), max_size=30),
    min_size=1, max_size=8))
def test_ccnet_normalize_matches_reference(texts):
    import re
    import pyarrow as pa
    from sift_ray.functions.corpus import ccnet_normalize

    def ref(s):
        s = s.lower()
        s = re.sub(r"[0-9]", "0", s)
        s = re.sub(r"[!-/:-@\[-`{-~]", "", s)
        s = re.sub(r"[ \t]+", " ", s)
        return s.strip(" ")

    got = ccnet_normalize(pa.array(texts, pa.string())).to_pylist()
    assert got == [ref(t) for t in texts]


@SET
@given(texts=st.lists(st.text(
    alphabet=st.sampled_from(list("ab c\nxyz")), max_size=40),
    min_size=1, max_size=6))
def test_gopher_repetition_matches_reference(ray_session, texts):
    from collections import Counter
    import ray.data as rd
    from sift_ray.functions.textstats import gopher_repetition
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = (gopher_repetition(rd.from_pandas(df)).to_pandas()
           .set_index("doc_id"))
    for i, text in enumerate(texts):
        lines = text.split("\n")
        lc = Counter(lines)
        assert got.loc[i, "n_lines"] == len(lines)
        assert got.loc[i, "n_dup_lines"] == len(lines) - len(lc)
        assert got.loc[i, "line_chars"] == sum(len(x) for x in lines)
        assert got.loc[i, "dup_line_chars"] == sum(
            (c - 1) * len(s) for s, c in lc.items())
        words = [w for w in text.replace("\n", " ").split(" ") if w]
        for k in (2, 3, 4):
            grams = Counter(" ".join(words[j:j + k])
                            for j in range(len(words) - k + 1))
            if grams:
                top = min(sorted(grams),
                          key=lambda g: (-grams[g], g))
                assert got.loc[i, f"top{k}_chars"] == \
                    grams[top] * len(top)
            else:
                assert got.loc[i, f"top{k}_chars"] == 0


@SET
@given(texts=st.lists(st.text(
    alphabet=st.sampled_from(list("abc déΩ")), max_size=25),
    min_size=1, max_size=6))
def test_char_entropy_matches_reference(ray_session, texts):
    import math
    from collections import Counter
    import ray.data as rd
    from sift_ray.functions.textstats import char_entropy
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = char_entropy(rd.from_pandas(df)).to_pandas()
    if got.empty:  # empty Ray datasets lose their columns in to_pandas
        got = pd.DataFrame(columns=["doc_id", "n_chars", "entropy_micro"])
    got = got.set_index("doc_id")
    for i, text in enumerate(texts):
        if not text:
            assert i not in got.index
            continue
        n = len(text)
        exp = sum(c * round(math.log(n / c) * 1e6)
                  for c in Counter(text).values())
        assert got.loc[i, "n_chars"] == n
        assert got.loc[i, "entropy_micro"] == exp
