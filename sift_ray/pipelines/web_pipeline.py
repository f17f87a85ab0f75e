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

import os

from typing import Optional

import numpy as np
import pyarrow as pa


def _url_doc_ids(t: pa.Table, url_col: str = "url") -> np.ndarray:
    """Deterministic int64 doc ids from urls (splitmix of the url hash).
    Stable across runs/partitionings; collision odds n^2/2^63."""
    from ..functions.sketch import _hash64_any
    return (_hash64_any(t.column(url_col)) >> np.uint64(1)) \
        .astype(np.int64)


def build_docs_pipeline(pages, cfg=None,
                        min_visible_ratio: float = 0.05,
                        max_script_tags: int = 500,
                        robots=None, user_agent: str = "sift",
                        num_parts: Optional[int] = None):
    """Phase 1 (per-page, embarrassingly parallel): pages (url, html) ->
    normalized docs (doc_id, text, host). Optional robots filter first
    (publisher opt-out before any other work), then byte triage,
    readability extraction, and text normalization — all map-only except
    the robots host join, so the phase checkpoints and resumes at input-
    partition granularity (see run_web_corpus_job)."""
    import pyarrow.compute as pc

    from ..config import default_config
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
    return normalize_text(docs).map_batches(
        lambda t: t.select(["doc_id", "text", "host"]),
        batch_format="pyarrow")


def clean_docs_pipeline(docs, dedup_min_words: int = 4,
                        strip_boilerplate: bool = False,
                        boiler_min_docs: int = 3,
                        boiler_max_frac: float = 0.5,
                        strip_spans_min_len: Optional[int] = None,
                        num_parts: Optional[int] = None):
    """The corpus-wide cleaning half of phase 2: optional per-host
    boilerplate strip, optional exact duplicate-span removal (Lee et al.
    2021; pass ``strip_spans_min_len`` to enable, e.g. 200), then
    corpus-wide line dedup; returns the cleaned (doc_id, text) docs
    whose text is what actually lands in shards."""
    from ..functions.corpus import line_dedup

    if strip_boilerplate:
        from ..functions.corpus import boilerplate_strip
        docs = boilerplate_strip(docs, min_docs=boiler_min_docs,
                                 max_frac=boiler_max_frac,
                                 host_col="host", num_parts=num_parts)
    if strip_spans_min_len is not None:
        from ..functions.spandedup import strip_duplicate_spans
        docs = strip_duplicate_spans(docs, min_len=strip_spans_min_len,
                                     num_parts=num_parts)
    deduped = line_dedup(docs, min_words=dedup_min_words,
                         num_parts=num_parts)
    return deduped.map_batches(
        lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow")


def build_shards_pipeline(docs, shard_tokens: int = 2000,
                          dedup_min_words: int = 4,
                          strip_boilerplate: bool = False,
                          boiler_min_docs: int = 3,
                          boiler_max_frac: float = 0.5,
                          strip_spans_min_len: Optional[int] = None,
                          num_parts: Optional[int] = None):
    """Phase 2 (corpus-wide): normalized docs -> packed shard table
    (doc_id, n_tokens, start_offset, shard_id). Optional per-host
    boilerplate strip, then corpus-wide line dedup and token-budget
    prefix-sum packing — the exchanges live here, downstream of the
    phase-1 checkpoint, so a failed run re-reads parquet, not raw HTML."""
    from ..functions.sharding import token_shards

    cleaned = clean_docs_pipeline(
        docs, dedup_min_words=dedup_min_words,
        strip_boilerplate=strip_boilerplate,
        boiler_min_docs=boiler_min_docs, boiler_max_frac=boiler_max_frac,
        strip_spans_min_len=strip_spans_min_len,
        num_parts=num_parts)
    return token_shards(cleaned, shard_tokens=shard_tokens,
                        num_parts=num_parts)


def web_corpus_pipeline(pages, cfg=None, shard_tokens: int = 2000,
                        min_visible_ratio: float = 0.05,
                        max_script_tags: int = 500,
                        dedup_min_words: int = 4,
                        robots=None, user_agent: str = "sift",
                        strip_boilerplate: bool = False,
                        boiler_min_docs: int = 3,
                        boiler_max_frac: float = 0.5,
                        strip_spans_min_len: Optional[int] = None,
                        num_parts: Optional[int] = None):
    """pages (url, html) -> packed shard table (doc_id, n_tokens,
    start_offset, shard_id): phase 1 + phase 2 fused as one lazy Dataset
    (the checkpointed variant is run_web_corpus_job).

    ``robots``: optional (host, robots) Dataset — pages from disallowed
    paths are dropped before any other work (publisher opt-out first).
    ``strip_boilerplate``: remove per-host template lines (CCNet rule)
    between normalization and the corpus-wide line dedup."""
    docs = build_docs_pipeline(pages, cfg,
                               min_visible_ratio=min_visible_ratio,
                               max_script_tags=max_script_tags,
                               robots=robots, user_agent=user_agent,
                               num_parts=num_parts)
    return build_shards_pipeline(docs, shard_tokens=shard_tokens,
                                 dedup_min_words=dedup_min_words,
                                 strip_boilerplate=strip_boilerplate,
                                 boiler_min_docs=boiler_min_docs,
                                 boiler_max_frac=boiler_max_frac,
                                 strip_spans_min_len=strip_spans_min_len,
                                 num_parts=num_parts)


def run_web_corpus_job(input_path: str, out_dir: str, cfg=None,
                       group_size: int = 64, shard_tokens: int = 2000,
                       dedup_min_words: int = 4,
                       robots=None, user_agent: str = "sift",
                       strip_boilerplate: bool = False,
                       write_files: bool = False, shard_groups: int = 16,
                       build_index: bool = False, index_buckets: int = 64,
                       num_parts: Optional[int] = None) -> dict:
    """Run (or RESUME) the end-to-end web pipeline with checkpoints.

    Phase 1 is per-partition (map-only), so it reuses run_extract_job's
    manifest protocol: each group of input shards writes an atomic docs
    partition under ``out_dir/docs`` and commits a manifest row; a
    restart skips committed partitions — raw HTML is never re-extracted.
    Phase 2 (the corpus-wide exchanges) reads the docs checkpoint and
    writes the final shard table under ``out_dir/shards`` as one
    manifest-committed partition; on restart a committed phase 2 returns
    instantly, and an interrupted one re-runs from the docs parquet
    (minutes), not from raw pages (hours at 100 TB).

    ``write_files=True`` additionally MATERIALIZES the physical training
    shards: phase 2 then checkpoints the cleaned (post-boilerplate,
    post-line-dedup) docs under ``out_dir/clean_docs`` — shard files
    must carry the deduped text, not the raw extraction — computes the
    shard table from that checkpoint, and phase 3 writes one parquet
    file per shard under ``out_dir/shard_files/part-*/`` through
    ``sharding.write_shard_files`` (resumable at shard-group
    granularity, ``shard_groups`` groups).

    ``build_index=True`` adds a final phase: the persistent
    term-partitioned inverted index over the corpus text (the cleaned
    docs when ``write_files``, else the extracted docs) under
    ``out_dir/text_index`` — the finished corpus is immediately
    queryable with bucket-pruned BM25 (``sources.text_index``).
    Resumable at bucket granularity through the bucketed writer's own
    manifest.

    Returns {"docs": ..., "shards": ...} manifest summaries (plus
    "clean_docs" / "shard_files" / "text_index" when enabled).
    """
    import time as _time

    import ray.data as rd

    from ..state.manifest import Manifest
    from .extract_job import _default_read_concurrency, _list_parquet_files

    def _stats(part_dir: str) -> dict:
        import glob as _glob

        import pyarrow.dataset as pads
        dataset = pads.dataset(part_dir, format="parquet")
        bytes_out = sum(
            os.path.getsize(f)
            for f in _glob.glob(os.path.join(part_dir, "**", "*.parquet"),
                                recursive=True))
        return {"row_count": dataset.count_rows(), "bytes_out": bytes_out}

    files = _list_parquet_files(input_path)
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_path}")
    partitions = [files[i:i + group_size]
                  for i in range(0, len(files), group_size)]

    docs_dir = os.path.join(out_dir, "docs")
    docs_manifest = Manifest(docs_dir)
    for pid, part_files in enumerate(partitions):
        if docs_manifest.is_done(pid):
            continue
        docs_manifest.cleanup_tmp(pid)
        t0 = _time.time()
        pages = rd.read_parquet(part_files, columns=["url", "html"],
                                concurrency=_default_read_concurrency())
        docs = build_docs_pipeline(pages, cfg, robots=robots,
                                   user_agent=user_agent,
                                   num_parts=num_parts)
        tmp_dir = docs_manifest.tmp_partition_dir(pid)
        docs.write_parquet(tmp_dir)
        stats = _stats(tmp_dir)
        stats.update({"input_files": part_files,
                      "wall_s": _time.time() - t0})
        docs_manifest.commit_partition(pid, stats)

    def _read_docs():
        return rd.read_parquet(docs_dir,
                               columns=["doc_id", "text", "host"],
                               concurrency=_default_read_concurrency())

    clean_manifest = None
    if write_files:
        # phase 2a: checkpoint the CLEANED docs — shard files must carry
        # the post-dedup text, so it has to persist, not just flow
        clean_dir = os.path.join(out_dir, "clean_docs")
        clean_manifest = Manifest(clean_dir)
        if not clean_manifest.is_done(0):
            clean_manifest.cleanup_tmp(0)
            t0 = _time.time()
            cleaned = clean_docs_pipeline(
                _read_docs(), dedup_min_words=dedup_min_words,
                strip_boilerplate=strip_boilerplate, num_parts=num_parts)
            tmp_dir = clean_manifest.tmp_partition_dir(0)
            cleaned.write_parquet(tmp_dir)
            stats = _stats(tmp_dir)
            stats["wall_s"] = _time.time() - t0
            clean_manifest.commit_partition(0, stats)

    shards_dir = os.path.join(out_dir, "shards")
    shards_manifest = Manifest(shards_dir)
    if not shards_manifest.is_done(0):
        shards_manifest.cleanup_tmp(0)
        t0 = _time.time()
        if write_files:
            from ..functions.sharding import token_shards
            shards = token_shards(
                rd.read_parquet(clean_dir,
                                concurrency=_default_read_concurrency()),
                shard_tokens=shard_tokens, num_parts=num_parts)
        else:
            shards = build_shards_pipeline(
                _read_docs(), shard_tokens=shard_tokens,
                dedup_min_words=dedup_min_words,
                strip_boilerplate=strip_boilerplate, num_parts=num_parts)
        tmp_dir = shards_manifest.tmp_partition_dir(0)
        shards.write_parquet(tmp_dir)
        stats = _stats(tmp_dir)
        stats["wall_s"] = _time.time() - t0
        shards_manifest.commit_partition(0, stats)

    out = {"docs": docs_manifest.summary(),
           "shards": shards_manifest.summary()}
    if write_files:
        from ..functions.sharding import write_shard_files
        files_summary = write_shard_files(
            rd.read_parquet(clean_dir,
                            concurrency=_default_read_concurrency()),
            rd.read_parquet(os.path.join(out_dir, "shards"),
                            concurrency=_default_read_concurrency()),
            os.path.join(out_dir, "shard_files"), groups=shard_groups,
            num_parts=num_parts)
        out["clean_docs"] = clean_manifest.summary()
        out["shard_files"] = files_summary
    if build_index:
        from ..sources.text_index import build_text_index
        src = clean_dir if write_files else docs_dir
        out["text_index"] = build_text_index(
            rd.read_parquet(src, columns=["doc_id", "text"],
                            concurrency=_default_read_concurrency()),
            os.path.join(out_dir, "text_index"), buckets=index_buckets)
    return out
