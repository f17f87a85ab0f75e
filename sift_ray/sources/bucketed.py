"""Co-partitioned (bucketed) parquet storage and exchange-free joins.

THE reuse-the-partitioning scale pattern: pay a table's key exchange ONCE
at write time — every row lands in bucket ``hash(key) % buckets``, one
parquet file per bucket, committed through the atomic-rename manifest —
then every later join/groupby on that key is a per-bucket map task with
ZERO shuffle: bucket i of table A can only match bucket i of table B
(same hash, same modulus). At 100 TB this converts the recurring
all-to-all join exchange (the dominant cost of a fact-table pipeline)
into embarrassingly-parallel bucket-pair tasks, and failed writes resume
at bucket granularity.

Key hashing matches ``shuffle``'s exchange domain (int keys used raw,
other types through ``sketch._hash64_any``), so a bucketed table is
exactly "the exchange, persisted".
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

from ..state.manifest import Manifest


def _bucket_of(col, buckets: int) -> np.ndarray:
    from ..functions.sketch import _hash64_any
    if pa.types.is_integer(col.type) and col.null_count == 0:
        k = col.to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        k = _hash64_any(col).astype(np.int64)
    return np.abs(k % np.int64(buckets)).astype(np.int64)


def write_bucketed(ds, out_dir: str, key: str, buckets: int = 32) -> dict:
    """Materialize a Dataset as key-bucketed parquet:
    ``out_dir/part-{b:05d}/rows.parquet`` with bucket = hash(key) %
    buckets, resumable via the manifest (retried tasks no-op, restarted
    jobs skip committed buckets map-side). Rows within a bucket sort by
    the key column — bytes are a pure function of the input table."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    manifest = Manifest(out_dir)
    done = np.array(sorted(b for b in range(buckets)
                           if manifest.is_done(b)), dtype=np.int64)

    if len(done) < buckets:
        def add_bucket(t: pa.Table) -> pa.Table:
            b = _bucket_of(t.column(key), buckets)
            keep = ~np.isin(b, done)
            t = t.replace_schema_metadata(None).append_column(
                "part", pa.array(b, pa.int64()))
            return t.filter(pa.array(keep))

        stats_schema = pa.schema([("bkt", pa.int64()),
                                  ("n_rows", pa.int64())])

        def write_bucket(t: pa.Table) -> pa.Table:
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
            m.commit_partition(b, {"n_rows": t.num_rows})
            return pa.table({"bkt": pa.array([b], pa.int64()),
                             "n_rows": pa.array([t.num_rows], pa.int64())},
                            schema=stats_schema)

        (ds.map_batches(add_bucket, batch_format="pyarrow")
         .groupby("part").map_groups(write_bucket, batch_format="pyarrow")
         .materialize())

        for b in range(buckets):
            if not manifest.is_done(b):
                os.makedirs(manifest.tmp_partition_dir(b), exist_ok=True)
                manifest.commit_partition(b, {"n_rows": 0})

    out = manifest.summary()
    out["rows"] = sum(r.get("n_rows", 0) for r in manifest.records())
    out["buckets"] = buckets
    out["key"] = key
    return out


def _bucket_paths(out_dir: str) -> dict:
    m = Manifest(out_dir)
    paths = {}
    for rec in m.records():
        if rec.get("status") != "ok":
            continue
        p = os.path.join(m.partition_dir(rec["partition_id"]),
                         "rows.parquet")
        if rec.get("n_rows", 0) > 0 and os.path.exists(p):
            paths[rec["partition_id"]] = p
    return paths


def read_bucketed(out_dir: str, key_values: Optional[Sequence] = None,
                  key: Optional[str] = None, buckets: Optional[int] = None):
    """Stream a bucketed table back as a Dataset. With ``key_values``
    (+ ``key``/``buckets``), only the buckets that can contain those keys
    are read AND a map-side ``is_in`` filter is applied — the partition-
    pruned point/IN lookup (bucket pruning is the storage-side analog of
    predicate pushdown)."""
    import pyarrow.compute as pc
    import ray.data as rd

    paths = _bucket_paths(out_dir)
    if key_values is not None:
        assert key is not None and buckets is not None
        vals = pa.array(list(key_values))
        want = set(_bucket_of(vals, buckets).tolist())
        paths = {b: p for b, p in paths.items() if b in want}
        if not paths:
            return rd.from_items([])
        ds = rd.read_parquet(sorted(paths.values()))
        return ds.map_batches(
            lambda t: t.filter(pc.is_in(t.column(key), value_set=vals)),
            batch_format="pyarrow")
    if not paths:
        return rd.from_items([])
    return rd.read_parquet(sorted(paths.values()))


def join_bucketed(left_dir: str, right_dir: str, on: str,
                  how: str = "inner",
                  suffix: str = "_r"):
    """EXCHANGE-FREE distributed join of two tables bucketed on the same
    key with the same bucket count: each task reads ONE bucket pair and
    joins it in-process with Arrow's hash join — no shuffle, no driver
    data, wall-clock = slowest bucket pair. Returns a Dataset.

    ``how``: "inner", "semi" (left rows with a match, left columns only)
    or "anti" (left rows without a match). Both inputs must have been
    written by ``write_bucketed`` with equal ``buckets``; asserted from
    the manifests."""
    import ray.data as rd

    lm, rm = Manifest(left_dir), Manifest(right_dir)
    lrec = {r["partition_id"]: r for r in lm.records()
            if r.get("status") == "ok"}
    rrec = {r["partition_id"]: r for r in rm.records()
            if r.get("status") == "ok"}
    n_l, n_r = len(lrec), len(rrec)
    assert n_l == n_r and n_l > 0, \
        f"bucket counts differ ({n_l} vs {n_r}) — co-partitioning broken"

    lpaths = _bucket_paths(left_dir)
    rpaths = _bucket_paths(right_dir)
    pairs = [(b, lpaths[b], rpaths.get(b))
             for b in sorted(lpaths)]
    if how in ("inner", "semi"):
        pairs = [p for p in pairs if p[2] is not None]
    if not pairs:
        return rd.from_items([])

    join_type = {"inner": "inner", "semi": "left semi",
                 "anti": "left anti"}[how]

    def join_pair(lpath: str, rpath: Optional[str]) -> pa.Table:
        import pyarrow.parquet as pq
        lt = pq.read_table(lpath)
        if rpath is None:  # anti join with no right bucket: keep all rows
            return lt
        rt = pq.read_table(rpath)
        out = lt.join(rt, keys=on, join_type=join_type,
                      right_suffix=suffix)
        # Arrow's join may reorder columns; pin left-table order first
        names = list(lt.column_names) + \
            [c for c in out.column_names if c not in lt.column_names]
        return out.select(names)

    tasks = rd.from_items([{"lpath": lp, "rpath": rp}
                           for _b, lp, rp in pairs])
    # batch_size=1: one task per bucket pair (the unit of parallelism)
    return tasks.map_batches(
        lambda t: pa.concat_tables(
            [join_pair(lp, rp)
             for lp, rp in zip(t.column("lpath").to_pylist(),
                               t.column("rpath").to_pylist())]),
        batch_format="pyarrow", batch_size=1)


def agg_bucketed(out_dir: str, key: str, aggs: Sequence,
                 columns: Optional[Sequence[str]] = None):
    """EXCHANGE-FREE group-aggregate over a bucketed table: every row of a
    key lives in one bucket by construction, so a full GROUP BY is one
    Arrow hash-aggregate per bucket file — no shuffle, no combiner pass,
    no driver state. ``aggs`` are pyarrow group_by specs
    ``[(col, fn), ...]`` (fn in sum/min/max/mean/count/count_all...).
    Returns a Dataset of the per-key aggregate rows."""
    import pyarrow.parquet as pq
    import ray.data as rd

    paths = _bucket_paths(out_dir)
    if not paths:
        return rd.from_items([])

    agg_list = [tuple(a) for a in aggs]

    def agg_file(t: pa.Table) -> pa.Table:
        out = []
        for p in t.column("path").to_pylist():
            want = ([key] + [c for c, _ in agg_list if c is not None]
                    if columns is None else list(columns))
            tbl = pq.read_table(p, columns=list(dict.fromkeys(want)))
            out.append(tbl.group_by([key]).aggregate(
                [(c if c is not None else [], f) for c, f in agg_list]))
        return pa.concat_tables(out)

    tasks = rd.from_items([{"path": p} for _b, p in sorted(paths.items())])
    return tasks.map_batches(agg_file, batch_format="pyarrow",
                             batch_size=1)


def append_bucketed(delta_ds, out_dir: str, key: str,
                    ingest_id: str) -> dict:
    """EXACTLY-ONCE incremental ingest into an existing bucketed table:
    the delta rides the same hash(key)%B routing, each affected bucket
    merges old rows + delta (re-sorted by key) and re-commits atomically
    with ``ingest_id`` appended to its manifest record — so a crashed or
    retried ingest skips buckets that already recorded this id, and
    replaying the same delta is a no-op. Untouched buckets keep their
    files. This is the continuously-arriving-crawl-dump maintenance path:
    every later ``join_bucketed``/``agg_bucketed`` stays exchange-free
    over the merged table.

    Commit is rmtree+rename (same semantics as the rest of the manifest
    protocol): a crash inside the swap window can require re-running the
    ingest for that bucket; the ingest-id ledger makes that retry safe.
    Returns the manifest summary + per-bucket rows."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    manifest = Manifest(out_dir)
    recs = {r["partition_id"]: r for r in manifest.records()
            if r.get("status") == "ok"}
    buckets = len(recs)
    assert buckets > 0, "append_bucketed needs an existing bucketed table"
    done = np.array(sorted(b for b, r in recs.items()
                           if ingest_id in r.get("ingests", [])),
                    dtype=np.int64)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = _bucket_of(t.column(key), buckets)
        keep = ~np.isin(b, done)
        t = t.replace_schema_metadata(None).append_column(
            "part", pa.array(b, pa.int64()))
        return t.filter(pa.array(keep))

    stats_schema = pa.schema([("bkt", pa.int64()), ("n_rows", pa.int64())])

    def merge_bucket(t: pa.Table) -> pa.Table:
        b = int(t.column("part")[0].as_py())
        m = Manifest(out_dir)
        rec = {r["partition_id"]: r for r in m.records()}.get(b, {})
        if ingest_id in rec.get("ingests", []):  # retry after commit
            return stats_schema.empty_table()
        m.cleanup_tmp(b)
        tmp = m.tmp_partition_dir(b)
        os.makedirs(tmp, exist_ok=True)
        delta = t.drop_columns("part")
        old_path = os.path.join(m.partition_dir(b), "rows.parquet")
        parts = [delta]
        if os.path.exists(old_path):
            parts.insert(0, pq.read_table(old_path))
        merged = pa.concat_tables(parts, promote_options="default")
        merged = merged.take(pc.sort_indices(
            merged, sort_keys=[(key, "ascending")]))
        pq.write_table(merged, os.path.join(tmp, "rows.parquet"))
        m.commit_partition(b, {
            "n_rows": merged.num_rows,
            "ingests": rec.get("ingests", []) + [ingest_id]})
        return pa.table({"bkt": pa.array([b], pa.int64()),
                         "n_rows": pa.array([merged.num_rows], pa.int64())},
                        schema=stats_schema)

    (delta_ds.map_batches(add_bucket, batch_format="pyarrow")
     .groupby("part").map_groups(merge_bucket, batch_format="pyarrow")
     .materialize())

    # buckets the delta never touched must still record the ingest so a
    # REPLAY of the same delta (possibly partitioned differently) is a
    # pure manifest no-op
    recs2 = {r["partition_id"]: r for r in manifest.records()
             if r.get("status") == "ok"}
    for b, r in recs2.items():
        if ingest_id not in r.get("ingests", []):
            final = manifest.partition_dir(b)
            tmp = manifest.tmp_partition_dir(b)
            os.makedirs(tmp, exist_ok=True)
            # keep existing rows: COPY into the tmp dir for the swap (a
            # move would leave a window where the committed dir is empty)
            import shutil
            old_path = os.path.join(final, "rows.parquet")
            if os.path.exists(old_path):
                shutil.copy(old_path, os.path.join(tmp, "rows.parquet"))
            manifest.commit_partition(b, {
                "n_rows": r.get("n_rows", 0),
                "ingests": r.get("ingests", []) + [ingest_id]})

    out = manifest.summary()
    out["rows"] = sum(r.get("n_rows", 0) for r in manifest.records())
    out["buckets"] = buckets
    return out
