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


def _column_zones(t: pa.Table) -> dict:
    """Per-file [min, max] for every integer-typed column — the
    multi-column zonemap (ORC/Iceberg-style column stats). Secondary
    columns prune effectively only when correlated with the sort key,
    but recording them is one vectorized min/max per column at write
    time and never hurts."""
    import pyarrow.compute as pc

    zones = {}
    for name, typ in zip(t.schema.names, t.schema.types):
        if pa.types.is_integer(typ) and t.num_rows > 0:
            col = t.column(name)
            if col.null_count == len(col):
                continue
            zones[name] = [int(pc.min(col).as_py()),
                           int(pc.max(col).as_py())]
    return zones


def _route_parts(meta: dict, v: np.ndarray) -> np.ndarray:
    """Key values -> range-partition ids under the persisted routing
    meta: explicit quantile ``bounds`` (balanced under skew) or the
    legacy equal-width ``lo``/``width`` grid."""
    bounds = meta.get("bounds")
    if bounds is not None:
        return np.searchsorted(np.asarray(bounds, dtype=np.int64), v,
                               side="right").astype(np.int64)
    return np.clip((v - meta["lo"]) // meta["width"], 0,
                   meta["files"] - 1).astype(np.int64)


def write_sorted(ds, out_dir: str, key: str, files: int = 32,
                 boundaries: str = "width") -> dict:
    """Materialize a Dataset as range-partitioned sorted parquet:
    ``out_dir/part-{i:05d}/rows.parquet`` holds the i-th key range,
    sorted by ``key``; the manifest record is the zonemap entry.
    Integer keys only (timestamps: cast to epoch ints upstream).

    ``boundaries``: "width" (default) uses ``files`` equal-width ranges
    — one aggregate pass, but a skewed key concentrates in few files;
    "quantile" picks the range edges from a distributed quantile sketch
    (O(P*m) driver state), giving near-equal FILE SIZES under any key
    distribution — the skew fix the module docstring caveats. Either
    way the boundaries persist before any file commits, so resumes and
    later appends route identically."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from ray.data.aggregate import Max, Min

    assert boundaries in ("width", "quantile"), boundaries
    manifest = Manifest(out_dir)
    done = np.array(sorted(b for b in range(files)
                           if manifest.is_done(b)), dtype=np.int64)

    # routing boundaries: durable BEFORE any file commits, so a partial
    # resume routes identically even across input re-partitioning, and
    # append_sorted can route deltas into the same ranges later
    meta_path = os.path.join(out_dir, _META_NAME)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        assert meta["key"] == key and meta["files"] == files, \
            f"existing store has key={meta['key']} files={meta['files']}"
    elif boundaries == "quantile":
        from ..functions.sketch import quantile_sketch
        qs = tuple(i / files for i in range(1, files))
        rows = quantile_sketch(ds, key, qs=qs).take_all()
        # dedupe ties: a heavy value owns one whole range either way
        bounds = sorted({int(r["value"]) for r in rows})
        meta = {"key": key, "files": int(files), "bounds": bounds}
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, meta_path)
    else:
        # Ray 2.49: aggregate over a fully-empty dataset returns None
        agg = ds.aggregate(Min(key), Max(key)) or {}
        lo = int(agg.get(f"min({key})") or 0)
        hi = int(agg.get(f"max({key})") or 0)
        width = max((hi - lo) // files + 1, 1)
        meta = {"key": key, "files": int(files), "lo": lo, "width": width}
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, meta_path)

    if len(done) < files:
        def add_part(t: pa.Table) -> pa.Table:
            v = t.column(key).to_numpy(zero_copy_only=False).astype(
                np.int64)
            p = _route_parts(meta, v)
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
                "zones": _column_zones(t),
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

    out = manifest.summary()
    out["rows"] = sum(r.get("n_rows", 0) for r in manifest.records())
    out.update(meta)
    return out


def _merge_zones(a: dict, b: dict) -> dict:
    """Union of two per-column [min, max] zone dicts (true over the
    union of the underlying files)."""
    out = dict(a)
    for col, (lo, hi) in b.items():
        if col in out:
            out[col] = [min(out[col][0], lo), max(out[col][1], hi)]
        else:
            out[col] = [lo, hi]
    return out


def append_sorted(delta_ds, out_dir: str, ingest_id: str,
                  mode: str = "merge") -> dict:
    """EXACTLY-ONCE incremental ingest into a sorted/zonemapped table:
    deltas route through the PERSISTED range boundaries (keys outside the
    original [lo, hi] clip into the first/last range — zonemaps stay
    true because each file re-records its real min/max on merge), each
    touched file merges old + delta re-sorted by key and re-commits with
    ``ingest_id`` in its ledger, so crashed or replayed ingests are
    manifest no-ops per file. The log-structured crawl shape: timestamps
    grow monotonically, so appends touch only the tail range(s) while
    every committed file keeps serving pruned reads.

    ``mode="delta"`` makes the ingest O(delta): the (sorted) delta lands
    as a per-ingest file listed in the range's manifest record, with the
    record's key_min/key_max/zones WIDENED to stay true over the file
    union — pruning stays exact, per-file row-group pushdown stays tight
    (each file is individually sorted). ``compact_sorted`` folds the
    files back and re-tightens the zones."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from .bucketed import _delta_name

    assert mode in ("merge", "delta"), mode

    with open(os.path.join(out_dir, _META_NAME)) as f:
        meta = json.load(f)
    key, files = meta["key"], meta["files"]

    manifest = Manifest(out_dir)
    recs = {r["partition_id"]: r for r in manifest.records()
            if r.get("status") == "ok"}
    assert len(recs) == files, "append_sorted needs a completed store"
    done = np.array(sorted(b for b, r in recs.items()
                           if ingest_id in r.get("ingests", [])),
                    dtype=np.int64)

    def add_part(t: pa.Table) -> pa.Table:
        v = t.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        p = _route_parts(meta, v)
        keep = ~np.isin(p, done)
        t = t.replace_schema_metadata(None).append_column(
            "part", pa.array(p, pa.int64()))
        return t.filter(pa.array(keep))

    stats_schema = pa.schema([("part", pa.int64()), ("n_rows", pa.int64())])

    def merge_part(t: pa.Table) -> pa.Table:
        b = int(t.column("part")[0].as_py())
        m = Manifest(out_dir)
        rec = {r["partition_id"]: r for r in m.records()}.get(b, {})
        if ingest_id in rec.get("ingests", []):  # retry after commit
            return stats_schema.empty_table()
        delta = t.drop_columns("part")
        pdir = m.partition_dir(b)
        # the delta ALWAYS lands as a per-ingest listed file (the only
        # exactly-once-safe shape — see bucketed.append_bucketed); merge
        # mode compacts right after, re-tightening the widened zones
        delta = delta.take(pc.sort_indices(
            delta, sort_keys=[(key, "ascending")]))
        name = _delta_name(ingest_id)
        pq.write_table(delta, os.path.join(pdir, name))
        kcol = delta.column(key)
        dmin, dmax = int(pc.min(kcol).as_py()), int(pc.max(kcol).as_py())
        old_empty = rec.get("n_rows", 0) == 0
        m.update_record(b, {
            "n_rows": rec.get("n_rows", 0) + delta.num_rows,
            "key_min": dmin if old_empty
            else min(rec["key_min"], dmin),
            "key_max": dmax if old_empty
            else max(rec["key_max"], dmax),
            "zones": _merge_zones(rec.get("zones", {}),
                                  _column_zones(delta)),
            "files": rec.get("files", ["rows.parquet"]) + [name],
            "ingests": rec.get("ingests", []) + [ingest_id],
            # row-writing ingests, for snapshot (as_of) reconstruction
            "deposits": rec.get("deposits", []) + [ingest_id]})
        return pa.table(
            {"part": pa.array([b], pa.int64()),
             "n_rows": pa.array([delta.num_rows], pa.int64())},
            schema=stats_schema)

    (delta_ds.map_batches(add_part, batch_format="pyarrow")
     .groupby("part").map_groups(merge_part, batch_format="pyarrow")
     .materialize())

    if mode == "merge":
        compact_sorted(out_dir, min_files=2)

    # untouched files still record the ingest so a full replay (possibly
    # partitioned differently) is a pure manifest no-op (record-only)
    for b, r in {r["partition_id"]: r for r in manifest.records()
                 if r.get("status") == "ok"}.items():
        if ingest_id not in r.get("ingests", []):
            manifest.update_record(b, {
                "ingests": r.get("ingests", []) + [ingest_id]})

    out = manifest.summary()
    out["rows"] = sum(r.get("n_rows", 0) for r in manifest.records())
    out.update(meta)
    return out


def pruned_paths(out_dir: str, lo: Optional[int] = None,
                 hi: Optional[int] = None,
                 col: Optional[str] = None,
                 as_of: Optional[str] = None) -> list:
    """Files whose zonemap can overlap [lo, hi] — decided from the
    manifest alone, zero data/footer reads. ``col=None`` prunes on the
    sort key; any other integer column prunes on its recorded per-file
    [min, max] (effective when correlated with the sort key; a file
    with no recorded zone for ``col`` is conservatively kept).
    ``as_of`` (ingest id / ``SNAPSHOT_BASE``) restores the file view as
    of that ingest (``manifest.snapshot_files``); delta appends only
    WIDEN the recorded zones, so pruning against the current zones stays
    a correct superset for any older snapshot."""
    from .bucketed import _delta_name
    from ..state.manifest import snapshot_files

    m = Manifest(out_dir)
    keep = []
    for rec in m.records():
        if rec.get("status") != "ok" or rec.get("n_rows", 0) == 0:
            continue
        if col is None:
            zone = [rec["key_min"], rec["key_max"]]
        else:
            zone = rec.get("zones", {}).get(col)
        if zone is not None:
            if lo is not None and zone[1] < lo:
                continue
            if hi is not None and zone[0] > hi:
                continue
        pdir = m.partition_dir(rec["partition_id"])
        names = (rec.get("files", ["rows.parquet"]) if as_of is None
                 else snapshot_files(rec, as_of, _delta_name))
        for name in names:
            p = os.path.join(pdir, name)
            if os.path.exists(p):
                keep.append(p)
    return sorted(keep)


def compact_sorted(out_dir: str, min_files: int = 2) -> dict:
    """Fold a range's delta files back into one sorted file and
    RE-TIGHTEN its zonemap (delta appends only widen the recorded
    min/max; compaction recomputes them from the merged rows). Shares
    the crash-safe record-update protocol of ``bucketed._compact_store``
    (new file invisible until listed; stale files swept). Returns
    {"compacted": n}."""
    import pyarrow.compute as pc

    from .bucketed import _compact_store

    with open(os.path.join(out_dir, _META_NAME)) as f:
        key = json.load(f)["key"]

    def zone_stats(merged: pa.Table) -> dict:
        kcol = merged.column(key)
        return {"key_min": int(pc.min(kcol).as_py()),
                "key_max": int(pc.max(kcol).as_py()),
                "zones": _column_zones(merged)}

    return {"compacted": _compact_store(out_dir, key, min_files,
                                        zone_stats)}


def delete_range(out_dir: str, lo: Optional[int] = None,
                 hi: Optional[int] = None,
                 ingest_id: str = "expire") -> dict:
    """RETENTION EXPIRY: remove every row with ``lo <= key <= hi``
    (either bound open) from a sorted/Z-ordered store — the "drop
    everything older than the cutoff" lifecycle op a 100 TB ledger
    needs. Files whose zonemap lies FULLY inside the range drop
    METADATA-ONLY (no data I/O at all — the common case when expiring
    old time ranges, since files are key-ranged); only boundary files
    whose zones straddle the cutoff rewrite (one task each); untouched
    files skip. Exactly-once via the same ingest ledger as appends
    (replays are manifest no-ops). Expiry destroys history in place:
    records mark ``truncated_at`` and snapshot reads for states BEFORE
    the expiry raise ``SnapshotUnavailable`` instead of answering
    wrong. Returns counts per class."""
    import hashlib

    import ray.data as rd

    assert lo is not None or hi is not None, "unbounded delete"
    with open(os.path.join(out_dir, _META_NAME)) as f:
        key = json.load(f)["key"]

    manifest = Manifest(out_dir)
    dropped = rewritten = skipped = 0
    rewrite_parts = []
    for rec in manifest.records():
        if rec.get("status") != "ok":
            continue
        b = int(rec["partition_id"])
        if ingest_id in rec.get("ingests", []):  # replay: pure no-op
            continue
        kmin, kmax = rec.get("key_min"), rec.get("key_max")
        empty = rec.get("n_rows", 0) == 0 or kmin is None
        inside = (not empty
                  and (lo is None or kmin >= lo)
                  and (hi is None or kmax <= hi))
        overlap = (not empty and not inside
                   and (lo is None or kmax >= lo)
                   and (hi is None or kmin <= hi))
        if inside:
            # metadata-only drop: record first (atomic), files swept after
            names = rec.get("files", ["rows.parquet"])
            manifest.update_record(b, {
                "n_rows": 0, "files": [], "zones": {},
                "ingests": rec.get("ingests", []) + [ingest_id],
                "truncated_at": rec.get("truncated_at", []) + [ingest_id]})
            pdir = manifest.partition_dir(b)
            for n in names:
                try:
                    os.remove(os.path.join(pdir, n))
                except OSError:
                    pass
            dropped += 1
        elif overlap:
            rewrite_parts.append(b)
        else:
            manifest.update_record(b, {
                "ingests": rec.get("ingests", []) + [ingest_id]})
            skipped += 1

    def rewrite_one(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        for b in t.column("b").to_pylist():
            mm = Manifest(out_dir)
            rec = {r["partition_id"]: r for r in mm.records()}[b]
            if ingest_id in rec.get("ingests", []):
                continue
            names = rec.get("files", ["rows.parquet"])
            pdir = mm.partition_dir(b)
            tbl = pa.concat_tables(
                [pq.read_table(os.path.join(pdir, n)) for n in names
                 if os.path.exists(os.path.join(pdir, n))],
                promote_options="default")
            kept = None
            if lo is not None:
                kept = pc.less(tbl.column(key), lo)
            if hi is not None:
                k2 = pc.greater(tbl.column(key), hi)
                kept = k2 if kept is None else pc.or_(kept, k2)
            tbl = tbl.filter(kept)
            tbl = tbl.take(pc.sort_indices(
                tbl, sort_keys=[(key, "ascending")]))
            # crash protocol of _compact_store: deterministic new name,
            # invisible until the record update lands; stale swept after
            new_name = "expire-" + hashlib.blake2b(
                ("\n".join(names) + "\0" + ingest_id).encode(),
                digest_size=6).hexdigest() + ".parquet"
            record = {"ingests": rec.get("ingests", []) + [ingest_id],
                      "truncated_at": (rec.get("truncated_at", [])
                                       + [ingest_id]),
                      "kinds": {}}
            if tbl.num_rows == 0:
                record.update({"n_rows": 0, "files": [], "zones": {}})
                keep_names = []
            else:
                pq.write_table(tbl, os.path.join(pdir, new_name))
                kcol = tbl.column(key)
                record.update({
                    "n_rows": tbl.num_rows, "files": [new_name],
                    "key_min": int(pc.min(kcol).as_py()),
                    "key_max": int(pc.max(kcol).as_py()),
                    "zones": _column_zones(tbl)})
                keep_names = [new_name]
            mm.update_record(b, record)
            for f in os.listdir(pdir):
                if f.endswith(".parquet") and f not in keep_names:
                    try:
                        os.remove(os.path.join(pdir, f))
                    except OSError:
                        pass
        return pa.table({"b": t.column("b")})

    if rewrite_parts:
        (rd.from_items([{"b": b} for b in rewrite_parts])
         .map_batches(rewrite_one, batch_format="pyarrow", batch_size=1)
         .materialize())
        rewritten = len(rewrite_parts)

    return {"dropped_files": dropped, "rewritten": rewritten,
            "untouched": skipped}


def read_key_range(out_dir: str, lo: Optional[int] = None,
                   hi: Optional[int] = None,
                   columns: Optional[list] = None,
                   col: Optional[str] = None,
                   as_of: Optional[str] = None):
    """Stream rows with ``lo <= col <= hi`` (either bound optional;
    ``col`` defaults to the sort key). Three pruning levels: manifest
    zonemap (file skip — secondary integer columns prune on their
    recorded per-file stats), parquet row-group statistics pushdown
    (tight for the sort key; whatever physical clustering gives for
    secondary columns), then an exact vectorized filter. ``as_of``
    (ingest id / ``SNAPSHOT_BASE``) time-travels to that ingest's state
    (raises ``SnapshotUnavailable`` past a compaction)."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import ray.data as rd

    with open(os.path.join(out_dir, _META_NAME)) as f:
        meta_key = json.load(f)["key"]
    paths = pruned_paths(out_dir, lo, hi, col=col, as_of=as_of)
    key = col if col is not None else meta_key
    if not paths:
        # typed empty: a schemaless empty Dataset yields a 0-column
        # frame downstream (Ray 2.49); borrow the schema from any store
        # file footer (column-pruned like a real read)
        import pyarrow.parquet as pq
        allp = pruned_paths(out_dir)
        if not allp:
            return rd.from_items([])
        sch = pq.read_schema(allp[0])
        if columns is not None:
            want = list(dict.fromkeys(list(columns) + [key]))
            sch = pa.schema([sch.field(n) for n in want
                             if sch.get_field_index(n) >= 0])
        return rd.from_arrow(sch.remove_metadata().empty_table())
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


_ZORDER_META = "zorder_meta.json"


def _zorder_key(t: pa.Table, cols, los, steps, bits: int) -> np.ndarray:
    """Vectorized Morton (Z-order) key: each column quantizes into
    2^bits equal-width cells, then cell bits interleave — column i
    contributes bit b at position b*k+i. Nearby (x, y, ...) cells get
    nearby z values, so a z-sorted layout clusters EVERY listed column
    at once and each file's per-column [min, max] zones stay tight."""
    k = len(cols)
    z = np.zeros(t.num_rows, dtype=np.int64)
    for i, (c, lo, step) in enumerate(zip(cols, los, steps)):
        v = t.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
        q = np.clip((v - lo) // step, 0, (1 << bits) - 1)
        for b in range(bits):
            z |= ((q >> b) & 1) << (b * k + i)
    return z


def write_zordered(ds, out_dir: str, cols, files: int = 32,
                   bits: Optional[int] = None,
                   boundaries: str = "width") -> dict:
    """Z-ORDER (multi-column) clustered sorted storage: rows sort and
    range-partition on a Morton interleave of ``cols`` (all integer
    columns), so a range predicate on ANY of the columns — not just a
    single sort key — prunes files via the per-file column zones that
    ``write_sorted`` already records. The classic data-layout lever for
    100 TB fact tables queried along two+ independent dimensions (a
    1-D sort gives tight zones only for its own key; Z-order gives
    each of k columns ~file_count^(1/k)-tight zones). Storage,
    resume, appends (route on the derived key via ``append_sorted``),
    compaction and time travel are the plain sorted store's —
    the derived ``_zkey`` column rides in the files. Read back with
    ``read_multi_range`` (prunes on every predicate column, drops the
    derived key)."""
    import ray.data as rd  # noqa: F401  (parity with callers' imports)
    from ray.data.aggregate import Max, Min

    os.makedirs(out_dir, exist_ok=True)
    meta_path = os.path.join(out_dir, _ZORDER_META)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            zmeta = json.load(f)
        assert zmeta["cols"] == list(cols), zmeta
        los, steps, bits = zmeta["los"], zmeta["steps"], zmeta["bits"]
    else:
        k = len(cols)
        assert k >= 1
        bits = bits or min(16, 63 // k)
        aggs = [a for c in cols for a in (Min(c), Max(c))]
        agg = ds.aggregate(*aggs) or {}
        los, steps = [], []
        for c in cols:
            lo = int(agg.get(f"min({c})") or 0)
            hi = int(agg.get(f"max({c})") or 0)
            los.append(lo)
            steps.append(max((hi - lo) // ((1 << bits) - 1), 1)
                         if hi > lo else 1)
        zmeta = {"cols": list(cols), "los": los, "steps": steps,
                 "bits": int(bits)}
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(zmeta, f)
        os.replace(tmp, meta_path)

    cols_l, los_l, steps_l, bits_l = list(cols), los, steps, bits

    def add_z(t: pa.Table) -> pa.Table:
        z = _zorder_key(t, cols_l, los_l, steps_l, bits_l)
        return t.append_column("_zkey", pa.array(z, pa.int64()))

    # z-values populate Morton space sparsely, so "quantile" boundaries
    # balance z-file sizes far better than an equal-width z grid
    out = write_sorted(ds.map_batches(add_z, batch_format="pyarrow"),
                       out_dir, key="_zkey", files=files,
                       boundaries=boundaries)
    out["zorder"] = zmeta
    return out


def append_zordered(delta_ds, out_dir: str, ingest_id: str,
                    mode: str = "merge") -> dict:
    """Exactly-once ingest into a Z-ordered store: the delta derives its
    ``_zkey`` from the PERSISTED quantization (identical routing to the
    original write), then rides ``append_sorted``'s ledger."""
    with open(os.path.join(out_dir, _ZORDER_META)) as f:
        zmeta = json.load(f)
    cols, los = zmeta["cols"], zmeta["los"]
    steps, bits = zmeta["steps"], zmeta["bits"]

    def add_z(t: pa.Table) -> pa.Table:
        z = _zorder_key(t, cols, los, steps, bits)
        return t.append_column("_zkey", pa.array(z, pa.int64()))

    return append_sorted(delta_ds.map_batches(add_z,
                                              batch_format="pyarrow"),
                         out_dir, ingest_id=ingest_id, mode=mode)


def multi_pruned_paths(out_dir: str, preds: dict,
                       as_of: Optional[str] = None) -> list:
    """Files whose per-column zones can satisfy EVERY predicate in
    ``preds`` ({col: (lo, hi)}, either bound None) — manifest-only, no
    footer reads. A file missing a zone for some column is
    conservatively kept."""
    from .bucketed import _delta_name
    from ..state.manifest import snapshot_files

    m = Manifest(out_dir)
    keep = []
    for rec in m.records():
        if rec.get("status") != "ok" or rec.get("n_rows", 0) == 0:
            continue
        zones = rec.get("zones", {})
        ok = True
        for c, (lo, hi) in preds.items():
            zone = zones.get(c)
            if zone is None:
                continue
            if lo is not None and zone[1] < lo:
                ok = False
                break
            if hi is not None and zone[0] > hi:
                ok = False
                break
        if not ok:
            continue
        pdir = m.partition_dir(rec["partition_id"])
        names = (rec.get("files", ["rows.parquet"]) if as_of is None
                 else snapshot_files(rec, as_of, _delta_name))
        for name in names:
            p = os.path.join(pdir, name)
            if os.path.exists(p):
                keep.append(p)
    return sorted(keep)


def read_multi_range(out_dir: str, preds: dict,
                     columns: Optional[list] = None,
                     as_of: Optional[str] = None):
    """Stream rows matching EVERY ``{col: (lo, hi)}`` predicate from a
    sorted or Z-ordered store. Three pruning levels, now multi-column:
    manifest zone skip per predicate column, parquet row-group stats
    pushdown on the conjunction, exact vectorized filter. The derived
    ``_zkey`` never leaves the read."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray.data as rd

    paths = multi_pruned_paths(out_dir, preds, as_of=as_of)
    want = None
    if columns is not None:
        want = list(dict.fromkeys(list(columns) + list(preds)))
    if not paths:
        allp = pruned_paths(out_dir)
        if not allp:
            return rd.from_items([])
        sch = pq.read_schema(allp[0])
        names = want if want is not None else [
            n for n in sch.names if n != "_zkey"]
        sch = pa.schema([sch.field(n) for n in names
                         if sch.get_field_index(n) >= 0])
        return rd.from_arrow(sch.remove_metadata().empty_table())

    expr = None
    for c, (lo, hi) in preds.items():
        if lo is not None:
            e = pads.field(c) >= lo
            expr = e if expr is None else (expr & e)
        if hi is not None:
            e = pads.field(c) <= hi
            expr = e if expr is None else (expr & e)
    ds = rd.read_parquet(paths, columns=want, filter=expr)

    def exact(t: pa.Table) -> pa.Table:
        mask = None
        for c, (lo, hi) in preds.items():
            if lo is not None:
                m1 = pc.greater_equal(t.column(c), lo)
                mask = m1 if mask is None else pc.and_(mask, m1)
            if hi is not None:
                m2 = pc.less_equal(t.column(c), hi)
                mask = m2 if mask is None else pc.and_(mask, m2)
        if mask is not None:
            t = t.filter(mask)
        if "_zkey" in t.column_names:
            t = t.drop_columns("_zkey")
        return t

    return ds.map_batches(exact, batch_format="pyarrow")


def join_sorted(left_dir: str, right_dir: str, how: str = "inner"):
    """ZERO-SHUFFLE sort-merge-style join of two range-partitioned sorted
    stores on their sort keys (the storage-side analog of a co-partitioned
    join, without requiring equal bucket counts): each LEFT range record
    is one task that reads its own files plus the RIGHT files whose
    zonemaps overlap its [key_min, key_max] — manifest-only pruning, no
    exchange, no driver state. Every key routes to exactly one left
    range, so each match is produced exactly once. Output = left columns
    + right columns minus the right key (SQL inner-join projection with
    the join key kept once, under the left store's key name).

    ``how``: "inner" only (the semi/anti shapes live in hash_join /
    bloom_prefilter; a sorted-store right side is usually the dimension).
    """
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    assert how == "inner", how

    with open(os.path.join(left_dir, _META_NAME)) as f:
        lkey = json.load(f)["key"]
    with open(os.path.join(right_dir, _META_NAME)) as f:
        rkey = json.load(f)["key"]

    lm = Manifest(left_dir)
    recs = [r for r in lm.records()
            if r.get("status") == "ok" and r.get("n_rows", 0) > 0]
    tasks = []
    for r in recs:
        pdir = lm.partition_dir(r["partition_id"])
        lfiles = [os.path.join(pdir, n)
                  for n in r.get("files", ["rows.parquet"])]
        tasks.append({"lfiles": [p for p in lfiles if os.path.exists(p)],
                      "lo": int(r["key_min"]), "hi": int(r["key_max"])})

    def empty_out() -> pa.Table:
        lpaths = pruned_paths(left_dir)
        rpaths = pruned_paths(right_dir)
        if not lpaths or not rpaths:
            return pa.table({})
        ls = pq.read_schema(lpaths[0])
        rs = pq.read_schema(rpaths[0])
        fields = list(ls) + [f for f in rs if f.name != rkey]
        return pa.schema(fields).empty_table()

    if not tasks:
        return rd.from_arrow(empty_out())

    def join_range(t: pa.Table) -> pa.Table:
        out = []
        for i in range(t.num_rows):
            lfiles = t.column("lfiles")[i].as_py()
            lo = t.column("lo")[i].as_py()
            hi = t.column("hi")[i].as_py()
            left = pa.concat_tables([pq.read_table(p) for p in lfiles],
                                    promote_options="default")
            rpaths = pruned_paths(right_dir, lo, hi)
            if not rpaths or left.num_rows == 0:
                continue
            right = pa.concat_tables(
                [pq.read_table(p) for p in rpaths],
                promote_options="default")
            rk = right.column(rkey)
            right = right.filter(pc.and_(pc.greater_equal(rk, lo),
                                         pc.less_equal(rk, hi)))
            if right.num_rows == 0:
                continue
            out.append(left.join(right, keys=[lkey], right_keys=[rkey],
                                 join_type="inner"))
        if not out:
            return empty_out()
        return pa.concat_tables(out, promote_options="default")

    return (rd.from_items(tasks)
            .map_batches(join_range, batch_format="pyarrow", batch_size=1))
