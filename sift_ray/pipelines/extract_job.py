"""End-to-end extraction job: read -> extract actors -> write, resumable.

Streaming design notes (the 100 TB shape):

* ``read_parquet(columns=["url", "html"])`` — only the two needed columns
  leave storage; ``text``/``lang`` never move.
* One fused ``map_batches`` (extract + sift) — the per-document compute
  kernel, run as plain tasks with per-process cached state by default (see
  ``build_extract_pipeline``); batches default to block-bounded size, so a
  batch's BYTE footprint is capped by ``DataContext.target_max_block_size``
  regardless of the heavy-tail page distribution (the per-batch byte
  budget).
* No shuffle anywhere: sift's semantics are strictly per-document
  (SURVEY.md §2.8), output is keyed by url.
* Partition loop = checkpoint granularity: input files are grouped into
  partitions; each partition streams through the full pipeline and commits
  (atomic rename + manifest row with lineage and throughput). A killed run
  resumes by skipping committed partitions. Within a partition the streaming
  executor keeps the whole cluster busy; partitions are sized >> cluster
  width so the per-partition drain barrier is amortized.
"""

from __future__ import annotations

import glob
import os
import time
from typing import List, Optional, Sequence

from ..config import SiftConfig
from ..stages.extract import DEFAULT_MAX_HTML_BYTES, SiftPipelineStage
from ..state.manifest import Manifest


def _list_parquet_files(input_path: str) -> List[str]:
    if os.path.isfile(input_path):
        return [input_path]
    files = sorted(glob.glob(os.path.join(input_path, "**", "*.parquet"),
                             recursive=True))
    return [f for f in files if not os.path.basename(f).startswith("_")]


def _default_concurrency() -> int:
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 4))
    # leave headroom for read/write tasks so the pool doesn't starve them
    return max(2, cpus - _default_read_concurrency())


def _default_read_concurrency() -> int:
    """Cap concurrent read tasks: uncapped reads occupy every logical CPU
    and block actor-pool placement until the whole read stage drains."""
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 4))
    return max(2, cpus // 8)


def build_extract_pipeline(ds, cfg: Optional[SiftConfig] = None,
                           concurrency: Optional[int] = None,
                           batch_size: Optional[int] = None,
                           max_html_bytes: int = DEFAULT_MAX_HTML_BYTES,
                           keep_markdown: bool = False):
    """pages Dataset -> extracted Dataset (url, status, error, bytes_in,
    extracted_md [, markdown if keep_markdown]). Lazy; caller consumes.

    Default (``concurrency=None``) runs the fused stage as plain TASKS with
    a per-worker-process cached instance (shuffle.TaskStage): the stage's
    setup is microseconds (frozen SiftConfig + classifier), so an actor
    pool buys nothing and costs a spawn ramp proportional to pool size,
    while tasks schedule elastically around the capped read tasks and use
    every free slot (measured ~20% faster wall at both 8 and 32 cpus on
    the 96k-page bench). Pass an explicit ``concurrency`` to pin an actor
    pool instead (e.g. to reserve slots on a shared cluster)."""
    if concurrency is None:
        from ..functions.shuffle import TaskStage
        return ds.map_batches(
            TaskStage(SiftPipelineStage, cfg=cfg,
                      max_html_bytes=max_html_bytes,
                      keep_markdown=keep_markdown),
            batch_format="pyarrow",
            batch_size=batch_size,
            num_cpus=1,
        )
    return ds.map_batches(
        SiftPipelineStage,
        fn_constructor_kwargs={"cfg": cfg, "max_html_bytes": max_html_bytes,
                               "keep_markdown": keep_markdown},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def build_bucketed_extract_pipeline(ds, cfg: Optional[SiftConfig] = None,
                                    concurrency: Optional[int] = None,
                                    max_html_bytes: int = DEFAULT_MAX_HTML_BYTES,
                                    keep_markdown: bool = False):
    """Size-bucketed variant for heavy-tail corpora: rows are routed by
    ``len(html)`` into per-bucket streams, each extracted with a
    bucket-appropriate ``batch_size`` (256 rows for <64 KB pages down to 4
    rows for multi-MB pages), then unioned. Bounds the BYTE footprint a
    worker holds at once regardless of the page-size distribution.

    Tradeoff: each bucket stream re-executes the (column-pruned, cheap)
    read — 3x read I/O buys even pipeline flow under skew. Use the plain
    ``build_extract_pipeline`` when the corpus is known to be well-behaved:
    measured on the 96k-page bench corpus (modest tail), bucketed runs ~1.9x
    slower than plain; it pays off only when single rows are large enough to
    blow per-batch byte budgets (multi-MB pages dominating batches).
    """
    from ..stages.bucket import DEFAULT_BUCKETS, split_by_bucket

    if concurrency is None:
        concurrency = _default_concurrency()
    parts = []
    for _bucket_id, batch_size, sub in split_by_bucket(ds, DEFAULT_BUCKETS):
        parts.append(sub.map_batches(
            SiftPipelineStage,
            fn_constructor_kwargs={"cfg": cfg,
                                   "max_html_bytes": max_html_bytes,
                                   "keep_markdown": keep_markdown},
            batch_format="pyarrow",
            batch_size=batch_size,
            # autoscaling (1, N) pools: the three bucket streams share the
            # CPUs on demand instead of each reserving a full fixed pool
            concurrency=(1, concurrency),
            num_cpus=1,
        ))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def _partition_stats(part_dir: str) -> dict:
    """Cheap columnar stats over a written partition (footer + one int64
    column; does not re-read markdown/html). ``bytes_out`` is the on-disk
    size of the partition's parquet files."""
    import pyarrow.dataset as pads
    dataset = pads.dataset(part_dir, format="parquet")
    rows = dataset.count_rows()
    bytes_in = 0
    for batch in dataset.to_batches(columns=["bytes_in"]):
        import pyarrow.compute as pc
        s = pc.sum(batch.column("bytes_in")).as_py()
        bytes_in += s or 0
    bytes_out = sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(part_dir, "**", "*.parquet"),
                           recursive=True))
    return {"row_count": rows, "bytes_in": bytes_in, "bytes_out": bytes_out}


def run_extract_job(input_path: str, out_dir: str,
                    cfg: Optional[SiftConfig] = None,
                    group_size: int = 64,
                    concurrency: Optional[int] = None,
                    batch_size: Optional[int] = None,
                    max_html_bytes: int = DEFAULT_MAX_HTML_BYTES,
                    columns: Sequence[str] = ("url", "html"),
                    bucketed: bool = False) -> dict:
    """Run (or resume) the extraction job. Returns the manifest summary."""
    import ray.data as rd

    if bucketed and batch_size is not None:
        raise ValueError(
            "batch_size and bucketed are mutually exclusive: bucket routing "
            "assigns per-bucket batch sizes (stages/bucket.py DEFAULT_BUCKETS)")
    files = _list_parquet_files(input_path)
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_path}")
    partitions = [files[i:i + group_size]
                  for i in range(0, len(files), group_size)]
    manifest = Manifest(out_dir)

    for pid, part_files in enumerate(partitions):
        if manifest.is_done(pid):
            continue
        manifest.cleanup_tmp(pid)
        t0 = time.time()
        ds = rd.read_parquet(part_files, columns=list(columns),
                             concurrency=_default_read_concurrency())
        if bucketed:
            out = build_bucketed_extract_pipeline(ds, cfg, concurrency,
                                                  max_html_bytes)
        else:
            out = build_extract_pipeline(ds, cfg, concurrency, batch_size,
                                         max_html_bytes)
        tmp_dir = manifest.tmp_partition_dir(pid)
        out.write_parquet(tmp_dir)
        wall = time.time() - t0
        stats = _partition_stats(tmp_dir)
        stats.update({
            "input_files": part_files,
            "wall_s": wall,
            "pages_per_s": (stats["row_count"] / wall) if wall > 0 else 0.0,
            "gb_per_s": (stats["bytes_in"] / 1e9 / wall) if wall > 0 else 0.0,
        })
        manifest.commit_partition(pid, stats)
    return manifest.summary()
