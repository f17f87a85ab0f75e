"""Range-partitioned SORTED parquet storage with zonemap-pruned reads.

The range-query complement of ``sources.bucketed`` (point/IN lookups) and
``sources.text_index`` (term lookups): pay ONE value-range exchange at
write time — rows land in equal-width key ranges, each file is sorted by
the key and its manifest record carries the file's true ``key_min`` /
``key_max`` / ``n_rows`` (the zonemap) — then every later range scan
prunes at TWO levels before touching data: files whose [min, max] cannot
overlap the predicate are skipped from the manifest alone (no footer
reads), and surviving files get parquet row-group predicate pushdown
(each file is sorted, so row groups are tight key ranges and the pushdown
is maximally selective). A narrow range query on a 100 TB table reads
only the files and row groups that can contain matches.

Skew caveat (same as ``sharding.global_rank``, which uses this
partitioner): equal-width ranges concentrate a heavily repeated key value
in one file. The zonemap stays CORRECT under skew (min/max are true per
file) — only file sizes become unbalanced; pre-bucket such columns or
write with more ``files``.

Writes are resumable at file granularity through the atomic-rename
manifest: a restarted write skips committed ranges map-side, and file
bytes are a pure function of the input table (rows within a file sort by
(key, all columns) via the key sort being stable on arrival order only
within equal keys — we sort by key only, matching ``write_bucketed``).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import pyarrow as pa

from ..state.manifest import Manifest

_META_NAME = "zonemap_meta.json"


def write_sorted(ds, out_dir: str, key: str, files: int = 32) -> dict:
    """Materialize a Dataset as range-partitioned sorted parquet:
    ``out_dir/part-{i:05d}/rows.parquet`` holds the i-th equal-width key
    range, sorted by ``key``; the manifest record is the zonemap entry.
    Integer keys only (timestamps: cast to epoch ints upstream)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from ray.data.aggregate import Max, Min

    manifest = Manifest(out_dir)
    done = np.array(sorted(b for b in range(files)
                           if manifest.is_done(b)), dtype=np.int64)

    if len(done) < files:
        agg = ds.aggregate(Min(key), Max(key))
        lo = int(agg[f"min({key})"] or 0)
        hi = int(agg[f"max({key})"] or 0)
        width = max((hi - lo) // files + 1, 1)

        def add_part(t: pa.Table) -> pa.Table:
            v = t.column(key).to_numpy(zero_copy_only=False).astype(
                np.int64)
            p = np.clip((v - lo) // width, 0, files - 1)
            keep = ~np.isin(p, done)
            # strip pandas schema metadata: it makes pa.Schema unhashable
            # and Ray's sort reduce logs a per-task warning
            t = t.replace_schema_metadata(None).append_column(
                "part", pa.array(p, pa.int64()))
            return t.filter(pa.array(keep))

        stats_schema = pa.schema([("part", pa.int64()),
                                  ("n_rows", pa.int64())])

        def write_part(t: pa.Table) -> pa.Table:
            b = int(t.column("part")[0].as_py())
            m = Manifest(out_dir)
            if m.is_done(b):
                return stats_schema.empty_table()
            m.cleanup_tmp(b)
            tmp = m.tmp_partition_dir(b)
            os.makedirs(tmp, exist_ok=True)
            t = t.drop_columns("part")
            t = t.take(pc.sort_indices(t, sort_keys=[(key, "ascending")]))
            pq.write_table(t, os.path.join(tmp, "rows.parquet"))
            kcol = t.column(key)
            m.commit_partition(b, {
                "n_rows": t.num_rows,
                "key_min": int(pc.min(kcol).as_py()),
                "key_max": int(pc.max(kcol).as_py()),
            })
            return pa.table({"part": pa.array([b], pa.int64()),
                             "n_rows": pa.array([t.num_rows], pa.int64())},
                            schema=stats_schema)

        (ds.map_batches(add_part, batch_format="pyarrow")
         .groupby("part").map_groups(write_part, batch_format="pyarrow")
         .materialize())

        for b in range(files):
            if not manifest.is_done(b):
                os.makedirs(manifest.tmp_partition_dir(b), exist_ok=True)
                manifest.commit_partition(b, {"n_rows": 0})

    meta = {"key": key, "files": int(files)}
    tmp = os.path.join(out_dir, _META_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(out_dir, _META_NAME))

    out = manifest.summary()
    out["rows"] = sum(r.get("n_rows", 0) for r in manifest.records())
    out.update(meta)
    return out


def pruned_paths(out_dir: str, lo: Optional[int] = None,
                 hi: Optional[int] = None) -> list:
    """Files whose zonemap [key_min, key_max] can overlap [lo, hi] —
    decided from the manifest alone, zero data/footer reads."""
    m = Manifest(out_dir)
    keep = []
    for rec in m.records():
        if rec.get("status") != "ok" or rec.get("n_rows", 0) == 0:
            continue
        if lo is not None and rec["key_max"] < lo:
            continue
        if hi is not None and rec["key_min"] > hi:
            continue
        p = os.path.join(m.partition_dir(rec["partition_id"]),
                         "rows.parquet")
        if os.path.exists(p):
            keep.append(p)
    return sorted(keep)


def read_key_range(out_dir: str, lo: Optional[int] = None,
                   hi: Optional[int] = None,
                   columns: Optional[list] = None):
    """Stream rows with ``lo <= key <= hi`` (either bound optional).
    Three pruning levels: manifest zonemap (file skip), parquet
    row-group statistics pushdown (each file is key-sorted, so row
    groups are tight ranges), then an exact vectorized filter."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import ray.data as rd

    with open(os.path.join(out_dir, _META_NAME)) as f:
        key = json.load(f)["key"]
    paths = pruned_paths(out_dir, lo, hi)
    if not paths:
        return rd.from_items([])
    expr = None
    if lo is not None:
        expr = pads.field(key) >= lo
    if hi is not None:
        e2 = pads.field(key) <= hi
        expr = e2 if expr is None else (expr & e2)
    cols = None
    if columns is not None:
        cols = list(dict.fromkeys(list(columns) + [key]))
    ds = rd.read_parquet(paths, columns=cols, filter=expr)
    if expr is None:
        return ds

    def exact(t: pa.Table) -> pa.Table:
        mask = None
        if lo is not None:
            mask = pc.greater_equal(t.column(key), lo)
        if hi is not None:
            m2 = pc.less_equal(t.column(key), hi)
            mask = m2 if mask is None else pc.and_(mask, m2)
        return t.filter(mask)

    return ds.map_batches(exact, batch_format="pyarrow")
