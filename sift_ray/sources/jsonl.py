"""Gzip JSONL sink/source with manifest resume — the standard exchange
format for LLM training corpora (one gzipped line-delimited-JSON shard
directory per group, resumable at group granularity).

Scale shape: rows ride ONE exchange keyed on ``id % groups`` so every
output group is written by exactly one task; each group task sorts its
rows by the id column (deterministic bytes independent of partitioning),
streams them through a gzip encoder with a FIXED mtime (so reruns are
byte-identical), and commits through the same atomic-rename manifest
protocol as ``run_extract_job`` / ``write_shard_files`` — a restarted job
skips committed groups map-side BEFORE the exchange, and a retried task
observes the commit and no-ops. Read-back streams through Ray's
``read_json`` with gzip decompression (no driver pass).
"""

from __future__ import annotations

import gzip
import json
import os
from typing import Optional

import numpy as np
import pyarrow as pa

from ..state.manifest import Manifest


def write_jsonl_shards(docs, out_dir: str, groups: int = 16,
                       id_col: str = "doc_id",
                       compresslevel: int = 6) -> dict:
    """Materialize a Dataset as ``out_dir/part-{g:05d}/rows.jsonl.gz``
    (one file per group; group = id % groups), resumable via the manifest.
    Returns the manifest summary dict with per-group rows under
    ``"groups"``. JSON lines are compact, key-sorted, ensure_ascii=False;
    rows within a group are ordered by ``id_col`` — output bytes are a
    pure function of the input table."""
    manifest = Manifest(out_dir)
    done = np.array(sorted(g for g in range(groups)
                           if manifest.is_done(g)), dtype=np.int64)

    if len(done) < groups:
        def add_group(t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            g = (ids % np.int64(groups)).astype(np.int64)
            keep = ~np.isin(g, done)
            t = t.append_column("part", pa.array(g, pa.int64()))
            return t.filter(pa.array(keep))

        stats_schema = pa.schema([
            ("grp", pa.int64()), ("n_rows", pa.int64()),
            ("n_bytes", pa.int64())])

        def write_group(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            g = int(t.column("part")[0].as_py())
            m = Manifest(out_dir)
            if m.is_done(g):  # task retry after commit: no-op
                return stats_schema.empty_table()
            m.cleanup_tmp(g)
            tmp = m.tmp_partition_dir(g)
            os.makedirs(tmp, exist_ok=True)
            t = t.drop_columns("part")
            t = t.take(pc.sort_indices(t, sort_keys=[(id_col,
                                                      "ascending")]))
            path = os.path.join(tmp, "rows.jsonl.gz")
            cols = t.column_names
            pylists = [t.column(c).to_pylist() for c in cols]
            # mtime=0 pins the gzip header: reruns are byte-identical
            with open(path, "wb") as raw, \
                    gzip.GzipFile(fileobj=raw, mode="wb",
                                  compresslevel=compresslevel,
                                  mtime=0) as gz:
                for row in zip(*pylists):
                    obj = dict(zip(cols, row))
                    gz.write(json.dumps(obj, ensure_ascii=False,
                                        sort_keys=True,
                                        separators=(",", ":"))
                             .encode("utf-8"))
                    gz.write(b"\n")
            n_bytes = os.path.getsize(path)
            m.commit_partition(g, {"n_rows": t.num_rows,
                                   "n_bytes": n_bytes})
            return pa.table({
                "grp": pa.array([g], pa.int64()),
                "n_rows": pa.array([t.num_rows], pa.int64()),
                "n_bytes": pa.array([n_bytes], pa.int64())},
                schema=stats_schema)

        (docs.map_batches(add_group, batch_format="pyarrow")
         .groupby("part").map_groups(write_group, batch_format="pyarrow")
         .materialize())

        for g in range(groups):
            if not manifest.is_done(g):
                os.makedirs(manifest.tmp_partition_dir(g), exist_ok=True)
                manifest.commit_partition(g, {"n_rows": 0, "n_bytes": 0})

    out = manifest.summary()
    out["rows"] = sum(r.get("n_rows", 0) for r in manifest.records())
    out["groups"] = manifest.records()
    return out


def read_jsonl_shards(out_dir: str, groups: Optional[int] = None):
    """Stream a ``write_jsonl_shards`` directory back as a Dataset —
    Ray's parallel JSON reader with gzip decompression per file; no
    driver pass over the data."""
    import ray.data as rd

    paths = []
    m = Manifest(out_dir)
    for rec in m.records():
        if rec.get("status") != "ok" or rec.get("n_rows", 0) == 0:
            continue
        p = os.path.join(m.partition_dir(rec["partition_id"]),
                         "rows.jsonl.gz")
        if os.path.exists(p):
            paths.append(p)
    if not paths:
        return rd.from_items([])
    return rd.read_json(paths, arrow_open_stream_args={
        "compression": "gzip"})
