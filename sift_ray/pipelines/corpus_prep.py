"""Flagship training-corpus preparation pipeline — the end-to-end
composition a 100 TB data pipeline actually runs:

    quality filter  ->  near-dedup  ->  token-budget shard packing

Every stage is the already-oracle-checked operator (textstats
quality rules, dedup.near_dedup_docs greedy keep-lowest over exact n-gram
Jaccard pairs, sharding.token_shards distributed prefix sum), chained
lazily so the corpus streams: the quality filter is a map-side predicate
(no shuffle), near-dedup's only exchange moves int gram rows, and sharding
adds the two-pass ordered scan. The whole composition is expressible in
SQL, so the driver checks it value-exact end to end.

The filtered corpus is consumed by multiple downstream passes (gram
explode, anti-join, shard scan), so it must be pinned once. Two pin
strategies, switched on input size:

* object store ``materialize()`` — zero I/O, right while the filtered
  corpus fits the cluster's aggregate memory + spill headroom;
* parquet checkpoint (``checkpoint_dir``) — the filtered corpus is written
  once through the same atomic-rename + manifest protocol as
  ``run_extract_job`` and re-read per pass; a killed run resumes by
  skipping committed partitions (``prepare_corpus_from_path``) and the
  checkpoint survives driver restarts, which the object store does not.
"""

from __future__ import annotations

import glob
import os
import time
from typing import Optional, Sequence

import pyarrow as pa

from ..functions.dedup import near_dedup_docs
from ..functions.sharding import token_shards
from ..functions.textstats import quality_filter_batch
from ..state.manifest import Manifest

# past this estimated input size, prepare_corpus checkpoints the filtered
# corpus to parquet instead of pinning it in the object store
DEFAULT_CHECKPOINT_THRESHOLD_BYTES = 16 << 30


def _keep_rows(text_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        metrics = quality_filter_batch(batch, text_col=text_col)
        return batch.filter(metrics.column("keep"))
    return fn


def _dedup_and_shard(kept, shard_tokens: int, k: int, threshold: float,
                     text_col: str, id_col: str,
                     num_parts: Optional[int], max_df: Optional[int]):
    deduped = near_dedup_docs(kept, k=k, threshold=threshold,
                              text_col=text_col, id_col=id_col,
                              num_parts=num_parts, max_df=max_df)
    return token_shards(deduped, shard_tokens=shard_tokens,
                        text_col=text_col, id_col=id_col,
                        num_parts=num_parts)


def _checkpoint_dataset(kept_lazy, checkpoint_dir: str, columns):
    """Pin a lazy filtered Dataset as ONE manifest-committed parquet
    partition (atomic: tmp write + rename + manifest row). Crash-safe —
    an interrupted write is discarded and redone; a committed checkpoint
    is reused as-is."""
    import ray.data as rd

    manifest = Manifest(checkpoint_dir)
    if not manifest.is_done(0):
        manifest.cleanup_tmp(0)
        t0 = time.time()
        tmp = manifest.tmp_partition_dir(0)
        kept_lazy.write_parquet(tmp)
        files = glob.glob(os.path.join(tmp, "**", "*.parquet"),
                          recursive=True)
        import pyarrow.dataset as pads
        rows = pads.dataset(files, format="parquet").count_rows()
        manifest.commit_partition(0, {
            "row_count": rows,
            "bytes_out": sum(os.path.getsize(f) for f in files),
            "wall_s": time.time() - t0,
        })
    return rd.read_parquet(manifest.partition_dir(0), columns=list(columns))


def prepare_corpus(ds, shard_tokens: int = 5000, k: int = 3,
                   threshold: float = 0.5, text_col: str = "text",
                   id_col: str = "doc_id",
                   num_parts: Optional[int] = None,
                   max_df: Optional[int] = None,
                   checkpoint_dir: Optional[str] = None,
                   checkpoint_threshold_bytes: int =
                   DEFAULT_CHECKPOINT_THRESHOLD_BYTES):
    """documents Dataset -> (doc_id, n_tokens, start_offset, shard_id) for
    the quality-kept, near-deduplicated corpus, packed into
    ``shard_tokens``-sized shards in doc_id order.

    ``max_df``: hot-gram document-frequency cap forwarded to near-dedup —
    REQUIRED at web scale (see dedup.ngram_jaccard_pairs); None keeps the
    exact full-vocabulary oracle semantics.

    ``checkpoint_dir``: pin the filtered corpus as a parquet checkpoint
    instead of ``materialize()``. Defaults by size: inputs whose estimated
    bytes exceed ``checkpoint_threshold_bytes`` are checkpointed to a
    temp directory automatically (a petabyte filtered corpus must not live
    in the object store across the three downstream passes)."""
    kept_lazy = ds.map_batches(_keep_rows(text_col), batch_format="pyarrow")

    if checkpoint_dir is None:
        est = ds.size_bytes() or 0
        if est > checkpoint_threshold_bytes:
            import tempfile
            checkpoint_dir = tempfile.mkdtemp(prefix="sift_corpus_ckpt_")
    if checkpoint_dir is not None:
        kept = _checkpoint_dataset(kept_lazy, checkpoint_dir,
                                   columns=[id_col, text_col])
    else:
        kept = kept_lazy.materialize()
    return _dedup_and_shard(kept, shard_tokens, k, threshold, text_col,
                            id_col, num_parts, max_df)


def prepare_corpus_from_path(input_path: str, checkpoint_dir: str,
                             shard_tokens: int = 5000, k: int = 3,
                             threshold: float = 0.5, text_col: str = "text",
                             id_col: str = "doc_id",
                             num_parts: Optional[int] = None,
                             max_df: Optional[int] = None,
                             group_size: int = 64,
                             columns: Optional[Sequence[str]] = None):
    """Resumable flagship pipeline over a parquet documents table: the
    quality filter runs per input-file partition through the
    ``run_extract_job`` manifest protocol (tmp write -> atomic rename ->
    manifest row), so a killed run reruns ONLY uncommitted partitions; the
    dedup + sharding tail then reads the committed checkpoint. Re-running
    after completion touches no data files."""
    import ray.data as rd

    from .extract_job import _default_read_concurrency, _list_parquet_files

    cols = list(columns) if columns is not None else [id_col, text_col]
    files = _list_parquet_files(input_path)
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_path}")
    partitions = [files[i:i + group_size]
                  for i in range(0, len(files), group_size)]
    manifest = Manifest(checkpoint_dir)

    for pid, part_files in enumerate(partitions):
        if manifest.is_done(pid):
            continue
        manifest.cleanup_tmp(pid)
        t0 = time.time()
        part = rd.read_parquet(part_files, columns=cols,
                               concurrency=_default_read_concurrency())
        tmp = manifest.tmp_partition_dir(pid)
        part.map_batches(_keep_rows(text_col),
                         batch_format="pyarrow").write_parquet(tmp)
        written = glob.glob(os.path.join(tmp, "**", "*.parquet"),
                            recursive=True)
        import pyarrow.dataset as pads
        rows = pads.dataset(written, format="parquet").count_rows()
        manifest.commit_partition(pid, {
            "row_count": rows,
            "input_files": part_files,
            "bytes_out": sum(os.path.getsize(f) for f in written),
            "wall_s": time.time() - t0,
        })

    # read_parquet takes a list of FILES (a path list is not dir-expanded)
    kept_files = [
        f for pid in range(len(partitions))
        for f in sorted(glob.glob(os.path.join(
            manifest.partition_dir(pid), "**", "*.parquet"), recursive=True))]
    kept = rd.read_parquet(kept_files, columns=cols,
                           concurrency=_default_read_concurrency())
    return _dedup_and_shard(kept, shard_tokens, k, threshold, text_col,
                            id_col, num_parts, max_df)
