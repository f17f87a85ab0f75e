"""The end-to-end web pipeline: raw crawl pages -> training shards.

This is the composition the whole repo exists for, chained from
first-class operators (each independently oracle- or golden-checked):

    pages (parquet or WARC)                sources/pages.py, sources/warc.py
      -> robots.txt compliance (optional)  functions/robots.robots_filter
      -> byte-level triage                 functions/textstats.html_stats
      -> readability extract -> markdown   stages/extract.py (byte-identical
                                           to the reference per url)
      -> unicode/whitespace normalize      functions/textstats.normalize_text
      -> per-host boilerplate strip (opt.) functions/corpus.boilerplate_strip
      -> C4-style corpus-wide line dedup   functions/corpus.line_dedup
      -> token-budget shard packing        functions/sharding.token_shards

Scale shape: triage/extract/normalize are map-only (zero shuffle; the
triage drops spam BEFORE the expensive DOM pass); the robots filter is
one host exchange; the boilerplate strip is two frequency exchanges plus
a bloom-prefiltered anti-join; the line dedup is the two-exchange unit
pipeline; shard packing is the distributed ordered prefix sum. Driver
state: P integers (prefix offsets). Nothing driver-side scales with
corpus size.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa


def _url_doc_ids(t: pa.Table, url_col: str = "url") -> np.ndarray:
    """Deterministic int64 doc ids from urls (splitmix of the url hash).
    Stable across runs/partitionings; collision odds n^2/2^63."""
    from ..functions.sketch import _hash64_any
    return (_hash64_any(t.column(url_col)) >> np.uint64(1)) \
        .astype(np.int64)


def web_corpus_pipeline(pages, cfg=None, shard_tokens: int = 2000,
                        min_visible_ratio: float = 0.05,
                        max_script_tags: int = 500,
                        dedup_min_words: int = 4,
                        robots=None, user_agent: str = "sift",
                        strip_boilerplate: bool = False,
                        boiler_min_docs: int = 3,
                        boiler_max_frac: float = 0.5,
                        num_parts: Optional[int] = None):
    """pages (url, html) -> packed shard table (doc_id, n_tokens,
    start_offset, shard_id). See module docstring for the stage chain.

    ``robots``: optional (host, robots) Dataset — pages from disallowed
    paths are dropped before any other work (publisher opt-out first).
    ``strip_boilerplate``: remove per-host template lines (CCNet rule)
    between normalization and the corpus-wide line dedup."""
    import pyarrow.compute as pc

    from ..config import default_config
    from ..functions.corpus import line_dedup
    from ..functions.sharding import token_shards
    from ..functions.textstats import html_stats_batch, normalize_text
    from ..pipelines.extract_job import build_extract_pipeline

    cfg = cfg or default_config()

    if robots is not None:
        from ..functions.robots import robots_filter
        pages = robots_filter(pages, robots, user_agent=user_agent,
                              num_parts=num_parts).map_batches(
            lambda t: t.drop_columns("host"), batch_format="pyarrow")

    def triage(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        stats = html_stats_batch(t)
        keep = pc.and_(
            pc.greater_equal(stats.column("visible_ratio"),
                             min_visible_ratio),
            pc.less_equal(stats.column("script_tags"), max_script_tags))
        return t.filter(keep)

    triaged = pages.map_batches(triage, batch_format="pyarrow")
    extracted = build_extract_pipeline(triaged, cfg)

    def to_docs(t: pa.Table) -> pa.Table:
        ok = pc.equal(t.column("status"), "ok")
        t = t.filter(ok)
        from ..functions.robots import url_host_path
        hosts = [url_host_path(u)[0] for u in t.column("url").to_pylist()]
        return pa.table({
            "doc_id": pa.array(_url_doc_ids(t), pa.int64()),
            "text": t.column("extracted_md"),
            "host": pa.array(hosts, pa.string()),
        })

    docs = extracted.map_batches(to_docs, batch_format="pyarrow")
    normed = normalize_text(docs).map_batches(
        lambda t: t.select(["doc_id", "text", "host"]),
        batch_format="pyarrow")
    if strip_boilerplate:
        from ..functions.corpus import boilerplate_strip
        normed = boilerplate_strip(normed, min_docs=boiler_min_docs,
                                   max_frac=boiler_max_frac,
                                   host_col="host", num_parts=num_parts)
    deduped = line_dedup(normed, min_words=dedup_min_words,
                         num_parts=num_parts)
    deduped_docs = deduped.map_batches(
        lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow")
    return token_shards(deduped_docs, shard_tokens=shard_tokens,
                        num_parts=num_parts)
