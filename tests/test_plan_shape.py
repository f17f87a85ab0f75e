"""Machine-checked scale claims: every "ONE exchange" / "zero shuffle"
statement in the operator docstrings is pinned here by walking the lazy
logical plan and counting all-to-all operators (Sort / Aggregate /
RandomShuffle / Repartition — the Ray ops that move every block). A
refactor that silently adds an exchange fails this file, not a 100 TB run.
"""

import pandas as pd
import pyarrow as pa
import pytest

_ALL_TO_ALL = {"Sort", "Aggregate", "RandomShuffle", "Repartition"}


def exchange_count(ds) -> int:
    n = 0

    def walk(op):
        nonlocal n
        if type(op).__name__ in _ALL_TO_ALL:
            n += 1
        for dep in op.input_dependencies:
            walk(dep)

    walk(ds._logical_plan.dag)
    return n


@pytest.fixture()
def docs(ray_session):
    import ray.data as rd
    return rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["alpha beta gamma.\nx y", "alpha beta gamma.\nz w",
                 "unique words here entirely."],
        "lang": ["en", "en", "de"],
    }))


@pytest.fixture()
def events(ray_session):
    import ray.data as rd
    return rd.from_pandas(pd.DataFrame({
        "event_id": [1, 2, 3],
        "user_id": [1, 1, 2],
        "ts": pd.to_datetime([1, 400, 800], unit="s"),
        "value": [1.0, 2.0, 3.0],
    }))


def test_extract_pipeline_zero_exchanges(ray_session):
    import ray.data as rd
    from sift_ray.config import default_config
    from sift_ray.pipelines.extract_job import build_extract_pipeline
    pages = rd.from_pandas(pd.DataFrame(
        {"url": ["http://a/1"], "html": [b"<html><p>hi</p></html>"]}))
    assert exchange_count(
        build_extract_pipeline(pages, default_config())) == 0


@pytest.mark.parametrize("n_expected,builder", [
    # zero-shuffle per-document kernels
    (0, lambda d, e: __import__("sift_ray.functions.textstats",
                                fromlist=["doc_stats"]).doc_stats(d)),
    (0, lambda d, e: __import__("sift_ray.functions.textstats",
                                fromlist=["char_entropy"]).char_entropy(d)),
    (0, lambda d, e: __import__("sift_ray.functions.textstats",
                                fromlist=["gopher_repetition"])
        .gopher_repetition(d)),
    (0, lambda d, e: __import__("sift_ray.functions.corpus",
                                fromlist=["c4_filters"]).c4_filters(d)),
    (0, lambda d, e: __import__("sift_ray.functions.corpus",
                                fromlist=["in_doc_line_dedup"])
        .in_doc_line_dedup(d)),
    (0, lambda d, e: __import__("sift_ray.functions.corpus",
                                fromlist=["stratified_sample"])
        .stratified_sample(d, {"en": "8"})),
    # one-exchange operators
    (1, lambda d, e: __import__("sift_ray.functions.windows",
                                fromlist=["tumbling_window"])
        .tumbling_window(e)),
    (1, lambda d, e: __import__("sift_ray.functions.dedup",
                                fromlist=["exact_dedup"]).exact_dedup(d)),
    (1, lambda d, e: __import__("sift_ray.functions.urls",
                                fromlist=["politeness_schedule"])
        .politeness_schedule(d, host_col="lang", id_col="doc_id")),
    # two-exchange unit dedup (unit-key winner pass + doc reassembly)
    (2, lambda d, e: __import__("sift_ray.functions.corpus",
                                fromlist=["line_dedup"])
        .line_dedup(d, min_words=2)),
    (2, lambda d, e: __import__("sift_ray.functions.corpus",
                                fromlist=["span_dedup"])
        .span_dedup(d, span_words=2)),
])
def test_exchange_counts(ray_session, docs, events, n_expected, builder):
    assert exchange_count(builder(docs, events)) == n_expected


def test_hash_join_single_exchange(ray_session):
    import ray.data as rd
    from sift_ray.functions.shuffle import hash_join
    l = rd.from_pandas(pd.DataFrame({"k": [1, 2], "a": [1, 2]}))
    r = rd.from_pandas(pd.DataFrame({"k": [1, 2], "b": [3, 4]}))
    i64 = pa.int64()
    j = hash_join(l, r, on="k", how="inner",
                  left_types={"k": i64, "a": i64},
                  right_types={"k": i64, "b": i64})
    assert exchange_count(j) == 1


def test_oov_rate_score_pass_zero_exchanges(ray_session, docs):
    from sift_ray.functions.corpus import oov_rate
    # the train pass (vocab_topk) runs eagerly inside; the RETURNED
    # dataset is the score pass and must be shuffle-free
    assert exchange_count(oov_rate(docs, vocab_k=2)) == 0


def test_webstruct_stages_zero_exchanges(ray_session):
    import ray.data as rd
    from sift_ray.functions.webstruct import (html_tables, jsonld_fields,
                                              robots_meta_flags,
                                              sitemap_entries)
    pages = rd.from_arrow(pa.table({
        "url": pa.array(["http://a/1"], pa.string()),
        "html": pa.array([b"<table><tr><td>x</td></tr></table>"],
                         pa.binary())}))
    for fn in (html_tables, jsonld_fields, sitemap_entries,
               robots_meta_flags):
        assert exchange_count(fn(pages)) == 0, fn.__name__


def test_explode_list_zero_exchanges(ray_session):
    import ray.data as rd
    from sift_ray.functions.relational import explode_list
    ds = rd.from_arrow(pa.table({
        "id": pa.array([1], pa.int64()),
        "xs": pa.array([[1, 2]], pa.list_(pa.int64()))}))
    assert exchange_count(explode_list(ds, "xs", ["id"])) == 0


def test_seeded_shuffle_single_exchange(ray_session, docs):
    from sift_ray.functions.sharding import seeded_shuffle
    assert exchange_count(seeded_shuffle(docs, num_parts=2)) == 1


def test_crawl_frontier_two_exchanges(ray_session):
    """The docstring's 'TWO key exchanges total' claim (anti-join url
    exchange with the candidate DISTINCT folded in via the join's
    ``post`` hook + politeness host exchange), machine-checked."""
    import ray.data as rd
    from sift_ray.pipelines.frontier import build_frontier
    pages = rd.from_arrow(pa.table({
        "url": pa.array(["http://a.com/sitemap.xml"], pa.string()),
        "html": pa.array(
            [b"<urlset><url><loc>http://a.com/p1</loc></url></urlset>"],
            pa.binary())}))
    seen = rd.from_arrow(pa.table({
        "url": pa.array(["http://a.com/p2"], pa.string())}))
    assert exchange_count(build_frontier(pages, seen, num_parts=2)) == 2
