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
            m.commit_partition(b, {"n_rows": t.num_rows, "key": key})
            return pa.table({"bkt": pa.array([b], pa.int64()),
                             "n_rows": pa.array([t.num_rows], pa.int64())},
                            schema=stats_schema)

        (ds.map_batches(add_bucket, batch_format="pyarrow")
         .groupby("part").map_groups(write_bucket, batch_format="pyarrow")
         .materialize())

        for b in range(buckets):
            if not manifest.is_done(b):
                os.makedirs(manifest.tmp_partition_dir(b), exist_ok=True)
                manifest.commit_partition(b, {"n_rows": 0, "key": key})

    out = manifest.summary()
    out["rows"] = sum(r.get("n_rows", 0) for r in manifest.records())
    out["buckets"] = buckets
    out["key"] = key
    return out


def _bucket_paths(out_dir: str) -> dict:
    # single-path view for legacy callers; multi-file (delta) buckets
    # must go through _bucket_files
    files = _bucket_files(out_dir)
    assert all(len(fs) == 1 for fs in files.values()), \
        "bucket has delta files — use _bucket_files (or compact first)"
    return {b: fs[0] for b, fs in files.items()}


def _bucket_views(out_dir: str, as_of: Optional[str] = None) -> dict:
    """{bucket: ([file paths], [deposit kinds])} of every committed
    non-empty bucket, in manifest file-list (= deposit) order. A bucket
    holds ``rows.parquet`` plus any DELTA files its manifest record
    lists (O(delta) appends/upserts/deletes); only files NAMED IN THE
    RECORD are returned, so a crashed delta write that never reached
    the manifest is invisible. Each file's KIND comes from the record's
    ``kinds`` map (absent = "append"): "upsert" and "delete" deposits
    shadow same-key rows of every EARLIER listed file — see
    ``_resolve_bucket``. ``as_of`` (an ingest id, or
    ``manifest.SNAPSHOT_BASE``) restores the file view as of that
    ingest — see ``manifest.snapshot_files``; raises
    ``SnapshotUnavailable`` if compaction folded the history."""
    from ..state.manifest import snapshot_files

    m = Manifest(out_dir)
    out = {}
    for rec in m.records():
        if rec.get("status") != "ok" or rec.get("n_rows", 0) == 0:
            continue
        pdir = m.partition_dir(rec["partition_id"])
        if as_of is None:
            names = rec.get("files", ["rows.parquet"])
        else:
            names = snapshot_files(rec, as_of, _delta_name)
        kind_map = rec.get("kinds", {})
        pairs = [(os.path.join(pdir, n), kind_map.get(n, "append"))
                 for n in names]
        pairs = [(p, k) for p, k in pairs if os.path.exists(p)]
        if pairs:
            out[rec["partition_id"]] = ([p for p, _ in pairs],
                                        [k for _, k in pairs])
    return out


def _bucket_files(out_dir: str, as_of: Optional[str] = None) -> dict:
    """{bucket: [file paths]} view of ``_bucket_views`` for append-only
    callers (postings stores etc. — no shadowing kinds ever land there)."""
    return {b: paths
            for b, (paths, _kinds) in _bucket_views(out_dir, as_of).items()}


def _resolve_bucket(paths, kinds, key: str,
                    columns: Optional[Sequence[str]] = None) -> pa.Table:
    """Materialize one bucket's LOGICAL rows from its listed files.

    Files are in deposit order; an "upsert" or "delete" deposit shadows
    every row with the same key in every EARLIER file (MERGE
    whole-key-replacement semantics: an upsert's rows replace all prior
    rows of that key; a delete is a key-only tombstone file). Plain
    "append" deposits never shadow, so an all-append bucket reduces to
    the old concat — zero behavior change for append-only stores.
    Implementation walks the files last→first accumulating the shadow
    key set, then concatenates survivors in forward file order (keeps
    compaction bytes identical for append-only history)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if all(k == "append" for k in kinds):
        return pa.concat_tables([pq.read_table(p, columns=columns)
                                 for p in paths],
                                promote_options="default")

    shadow = []   # list of pa.Array key chunks from later shadowing files
    out_rev = []
    for p, k in zip(reversed(paths), reversed(kinds)):
        if k == "delete":
            t = pq.read_table(p, columns=[key])
            shadow.append(t.column(key).combine_chunks())
            continue
        t = pq.read_table(p, columns=columns)
        if shadow:
            vals = pa.concat_arrays([a.cast(shadow[0].type)
                                     for a in shadow])
            keep = pc.invert(pc.is_in(t.column(key), value_set=vals))
            t = t.filter(pc.fill_null(keep, True))
        if k == "upsert":
            shadow.append(t.column(key).combine_chunks())
        out_rev.append(t)
    if not out_rev:  # every data row tombstoned: typed empty table
        for p, k in zip(paths, kinds):
            if k != "delete":
                return pq.read_schema(p).empty_table()
        raise AssertionError("bucket listed with no data files")
    return pa.concat_tables(out_rev[::-1], promote_options="default")


def read_bucketed(out_dir: str, key_values: Optional[Sequence] = None,
                  key: Optional[str] = None, buckets: Optional[int] = None,
                  as_of: Optional[str] = None):
    """Stream a bucketed table back as a Dataset. With ``key_values``
    (+ ``key``/``buckets``), only the buckets that can contain those keys
    are read AND a map-side ``is_in`` filter is applied — the partition-
    pruned point/IN lookup (bucket pruning is the storage-side analog of
    predicate pushdown). ``as_of`` (an ingest id, or
    ``manifest.SNAPSHOT_BASE``) is the TIME-TRAVEL read: the manifest's
    ordered ingest ledger + per-ingest delta files reconstruct the table
    exactly as it stood after that ingest (delta mode preserves history;
    compaction destroys it and the read raises ``SnapshotUnavailable``
    instead of answering wrong)."""
    import pyarrow.compute as pc
    import ray.data as rd

    views = _bucket_views(out_dir, as_of=as_of)
    vals = None
    if key_values is not None:
        assert key is not None and buckets is not None
        vals = pa.array(list(key_values))
        want = set(_bucket_of(vals, buckets).tolist())
        views = {b: v for b, v in views.items() if b in want}
    if not views:
        return rd.from_items([])

    if any(k != "append" for _p, ks in views.values() for k in ks):
        # upsert/delete deposits present: per-bucket resolving read (one
        # task per bucket applies the shadow rule before rows stream out)
        kcol = key
        if kcol is None:  # resolution needs the store key; recover it
            kcol = _store_key(out_dir)

        def load(t: pa.Table) -> pa.Table:
            tabs = []
            for ps, ks in zip(t.column("paths").to_pylist(),
                              t.column("kinds").to_pylist()):
                r = _resolve_bucket(ps, ks, kcol)
                if vals is not None:
                    r = r.filter(pc.is_in(r.column(kcol),
                                          value_set=vals))
                tabs.append(r)
            return pa.concat_tables(tabs, promote_options="default")

        tasks = rd.from_items(
            [{"paths": ps, "kinds": ks}
             for _b, (ps, ks) in sorted(views.items())])
        return tasks.map_batches(load, batch_format="pyarrow",
                                 batch_size=1)

    ds = rd.read_parquet(sorted(p for ps, _k in views.values()
                                for p in ps))
    if vals is not None:
        return ds.map_batches(
            lambda t: t.filter(pc.is_in(t.column(key), value_set=vals)),
            batch_format="pyarrow")
    return ds


def read_changes(out_dir: str, since: str):
    """CHANGE-DATA-CAPTURE feed over the LSM ingest ledger: every row
    deposited AFTER ingest ``since`` (``manifest.SNAPSHOT_BASE`` = all
    ingests), as a Dataset with an ``_op`` column ("append", "upsert",
    or "delete" — delete rows are the tombstone keys, other columns
    null). O(changes): only the per-ingest delta files are read, never
    the base — the downstream-sync shape (refresh an index, replicate
    to a serving store) that a full-table diff can't afford at 100 TB.
    Raises ``SnapshotUnavailable`` if compaction folded any post-
    ``since`` deposit (the feed would silently miss changes otherwise).
    """
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..state.manifest import SNAPSHOT_BASE, SnapshotUnavailable

    m = Manifest(out_dir)
    items = []
    schema_probe = None
    for rec in m.records():
        if rec.get("status") != "ok":
            continue
        ledger = rec.get("ingests", [])
        if since == SNAPSHOT_BASE:
            later = list(ledger)
        else:
            if since not in ledger:
                raise ValueError(f"unknown ingest id {since!r} "
                                 f"(ledger: {ledger!r})")
            later = ledger[ledger.index(since) + 1:]
        names = rec.get("files", ["rows.parquet"])
        kind_map = rec.get("kinds", {})
        pdir = m.partition_dir(rec["partition_id"])
        for j in later:
            if j not in rec.get("deposits", []):
                continue
            name = _delta_name(j)
            if name not in names:
                raise SnapshotUnavailable(
                    f"changes since {since!r}: deposit {j!r} was "
                    "compacted into the base — the feed is gone")
            items.append({"path": os.path.join(pdir, name),
                          "kind": kind_map.get(name, "append")})
        if schema_probe is None:
            for n in names:
                if kind_map.get(n, "append") != "delete":
                    p = os.path.join(pdir, n)
                    if os.path.exists(p):
                        schema_probe = p
                        break
    if schema_probe is None:
        return rd.from_items([])
    full = pq.read_schema(schema_probe).remove_metadata()
    out_schema = full.append(pa.field("_op", pa.string()))
    if not items:
        return rd.from_arrow(out_schema.empty_table())

    def load(t: pa.Table) -> pa.Table:
        tabs = []
        for p, k in zip(t.column("path").to_pylist(),
                        t.column("kind").to_pylist()):
            tbl = pq.read_table(p)
            cols = []
            for f in full:  # null-pad tombstones to the full schema
                if f.name in tbl.column_names:
                    cols.append(tbl.column(f.name).cast(f.type))
                else:
                    cols.append(pa.nulls(tbl.num_rows, f.type))
            op = "delete" if k == "delete" else k
            cols.append(pa.array([op] * tbl.num_rows, pa.string()))
            tabs.append(pa.table(cols, schema=out_schema))
        return pa.concat_tables(tabs)

    return (rd.from_items(items)
            .map_batches(load, batch_format="pyarrow", batch_size=1))


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

    lviews = _bucket_views(left_dir)
    rviews = _bucket_views(right_dir)
    pairs = [(b, lviews[b], rviews.get(b))
             for b in sorted(lviews)]
    if how in ("inner", "semi"):
        pairs = [p for p in pairs if p[2] is not None]
    if not pairs:
        return rd.from_items([])

    join_type = {"inner": "inner", "semi": "left semi",
                 "anti": "left anti"}[how]

    def join_pair(lview, rview) -> pa.Table:
        lt = _resolve_bucket(lview[0], lview[1], on)
        if not rview[0]:  # anti join with no right bucket: keep all rows
            return lt
        rt = _resolve_bucket(rview[0], rview[1], on)
        out = lt.join(rt, keys=on, join_type=join_type,
                      right_suffix=suffix)
        # Arrow's join may reorder columns; pin left-table order first
        names = list(lt.column_names) + \
            [c for c in out.column_names if c not in lt.column_names]
        return out.select(names)

    tasks = rd.from_items(
        [{"lpaths": lv[0], "lkinds": lv[1],
          "rpaths": (rv or ([], []))[0], "rkinds": (rv or ([], []))[1]}
         for _b, lv, rv in pairs])
    # batch_size=1: one task per bucket pair (the unit of parallelism)
    return tasks.map_batches(
        lambda t: pa.concat_tables(
            [join_pair((lp, lk), (rp, rk))
             for lp, lk, rp, rk in zip(t.column("lpaths").to_pylist(),
                                       t.column("lkinds").to_pylist(),
                                       t.column("rpaths").to_pylist(),
                                       t.column("rkinds").to_pylist())]),
        batch_format="pyarrow", batch_size=1)


def agg_bucketed(out_dir: str, key: str, aggs: Sequence,
                 columns: Optional[Sequence[str]] = None,
                 extra_keys: Sequence[str] = ()):
    """EXCHANGE-FREE group-aggregate over a bucketed table: every row of a
    key lives in one bucket by construction, so a full GROUP BY is one
    Arrow hash-aggregate per bucket file — no shuffle, no combiner pass,
    no driver state. ``aggs`` are pyarrow group_by specs
    ``[(col, fn), ...]`` (fn in sum/min/max/mean/count/count_all...).
    ``extra_keys`` adds secondary GROUP BY columns (all rows of a bucket
    key co-locate, so any (key, extra...) group is still bucket-local).
    Returns a Dataset of the per-key aggregate rows."""
    import ray.data as rd

    views = _bucket_views(out_dir)
    if not views:
        return rd.from_items([])

    agg_list = [tuple(a) for a in aggs]
    group_cols = [key] + list(extra_keys)

    def agg_file(t: pa.Table) -> pa.Table:
        out = []
        for fps, fks in zip(t.column("paths").to_pylist(),
                            t.column("kinds").to_pylist()):
            want = (group_cols + [c for c, _ in agg_list if c is not None]
                    if columns is None else list(columns))
            cols = list(dict.fromkeys(want))
            tbl = _resolve_bucket(fps, fks, key, columns=cols)
            out.append(tbl.group_by(group_cols).aggregate(
                [(c if c is not None else [], f) for c, f in agg_list]))
        return pa.concat_tables(out)

    tasks = rd.from_items([{"paths": ps, "kinds": ks}
                           for _b, (ps, ks) in sorted(views.items())])
    return tasks.map_batches(agg_file, batch_format="pyarrow",
                             batch_size=1)


def _store_key(out_dir: str) -> str:
    """The bucket key column recorded in the manifest (written by
    ``write_bucketed`` and every ``_ingest``); needed by resolving reads
    that must apply upsert/delete shadowing without the caller passing
    the key name."""
    for rec in Manifest(out_dir).records():
        if rec.get("key"):
            return rec["key"]
    raise ValueError(f"{out_dir}: no record carries the store key — "
                     "pass key= explicitly")


def _delta_name(ingest_id: str) -> str:
    """Filesystem-safe delta file name derived from the ingest id."""
    import hashlib
    h = hashlib.blake2b(ingest_id.encode(), digest_size=6).hexdigest()
    return f"delta-{h}.parquet"


def append_bucketed(delta_ds, out_dir: str, key: str,
                    ingest_id: str, mode: str = "merge") -> dict:
    """EXACTLY-ONCE incremental ingest into an existing bucketed table:
    the delta rides the same hash(key)%B routing, each affected bucket
    merges old rows + delta (re-sorted by key) and re-commits atomically
    with ``ingest_id`` appended to its manifest record — so a crashed or
    retried ingest skips buckets that already recorded this id, and
    replaying the same delta is a no-op. Untouched buckets keep their
    files. This is the continuously-arriving-crawl-dump maintenance path:
    every later ``join_bucketed``/``agg_bucketed`` stays exchange-free
    over the merged table.

    ``mode``:
    * ``"merge"`` (default) — each touched bucket rewrites as one sorted
      file: reads stay single-file-per-bucket, but the ingest costs
      O(bucket) per touched bucket (write amplification).
    * ``"delta"`` — O(DELTA) ingest, the LSM shape: the delta lands as a
      new per-ingest file inside the committed bucket dir and becomes
      visible only when the manifest record's ``files`` list is
      atomically extended (a crashed write leaves an unlisted, invisible
      file; a retry overwrites it). Readers concat the listed files;
      ``compact_bucketed`` folds them back to one sorted file when the
      small-file count warrants it.

    Merge-mode commit is rmtree+rename (same semantics as the rest of
    the manifest protocol): a crash inside the swap window can require
    re-running the ingest for that bucket; the ingest-id ledger makes
    that retry safe. Returns the manifest summary + per-bucket rows."""
    return _ingest(delta_ds, out_dir, key, ingest_id,
                   kind="append", mode=mode)


def upsert_bucketed(delta_ds, out_dir: str, key: str,
                    ingest_id: str, mode: str = "merge") -> dict:
    """EXACTLY-ONCE MERGE/upsert into a bucketed table: each delta row
    REPLACES every existing row with the same key (whole-key-replacement
    — the SQL ``MERGE WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED THEN
    INSERT`` shape for re-fetched crawl pages); keys absent from the
    store simply insert. Rides ``append_bucketed``'s exactly-once delta
    protocol; the deposit is marked kind="upsert" in the record's
    ``kinds`` map so readers/compaction apply later-file-shadows-earlier
    resolution (``_resolve_bucket``). ``mode="delta"`` is the O(delta)
    LSM shape (reads resolve shadowing on the fly);
    ``mode="merge"`` (default) folds touched buckets immediately so
    reads stay plain single-file scans."""
    return _ingest(delta_ds, out_dir, key, ingest_id,
                   kind="upsert", mode=mode)


def delete_bucketed(keys_ds, out_dir: str, key: str,
                    ingest_id: str, mode: str = "merge") -> dict:
    """EXACTLY-ONCE keyed delete from a bucketed table (the takedown /
    right-to-be-forgotten path — at 100 TB a delete must not rewrite the
    store): ``keys_ds`` is a Dataset carrying the key column (or a plain
    sequence of key values); every row with a listed key disappears.
    ``mode="delta"`` lands a key-only TOMBSTONE file per touched bucket
    — O(deleted keys) I/O, reads mask on the fly; ``mode="merge"``
    (default) folds touched buckets immediately. Exactly-once via the
    same ingest-id ledger as appends; replays are manifest no-ops."""
    import ray.data as rd

    if not hasattr(keys_ds, "map_batches"):
        keys_ds = rd.from_arrow(pa.table({key: pa.array(list(keys_ds))}))
    return _ingest(keys_ds, out_dir, key, ingest_id,
                   kind="delete", mode=mode)


def _ingest(delta_ds, out_dir: str, key: str, ingest_id: str,
            kind: str, mode: str) -> dict:
    """Shared exactly-once deposit machinery for append/upsert/delete —
    see the public wrappers for semantics."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    assert mode in ("merge", "delta"), mode
    assert kind in ("append", "upsert", "delete"), kind

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
        delta = t.drop_columns("part")
        if kind == "delete":  # tombstone file carries only the key
            delta = delta.select([key])
        pdir = m.partition_dir(b)
        # the delta ALWAYS lands as a per-ingest file made visible by an
        # atomic record extension — the only exactly-once-safe shape (a
        # read-modify-write of rows.parquet would duplicate the delta if
        # the process died between the data swap and the record write).
        # merge mode = this + an immediate compaction, below.
        delta = delta.take(pc.sort_indices(
            delta, sort_keys=[(key, "ascending")]))
        name = _delta_name(ingest_id)
        pq.write_table(delta, os.path.join(pdir, name))
        updates = {
            # n_rows counts PHYSICAL data rows listed (an upper bound on
            # logical rows once shadowing kinds exist; compaction
            # restores exactness). Tombstones add no data rows — an
            # empty bucket stays invisibly empty.
            "n_rows": (rec.get("n_rows", 0) + delta.num_rows
                       if kind != "delete" else rec.get("n_rows", 0)),
            "key": key,
            "files": rec.get("files", ["rows.parquet"]) + [name],
            "ingests": rec.get("ingests", []) + [ingest_id],
            # deposits = ingests that wrote ROWS into this bucket (vs the
            # record-only ledger): what snapshot_files needs to decide
            # which listed files predate an as_of ingest
            "deposits": rec.get("deposits", []) + [ingest_id]}
        if kind != "append":
            kmap = dict(rec.get("kinds", {}))
            kmap[name] = kind
            updates["kinds"] = kmap
        m.update_record(b, updates)
        return pa.table(
            {"bkt": pa.array([b], pa.int64()),
             "n_rows": pa.array([delta.num_rows], pa.int64())},
            schema=stats_schema)

    (delta_ds.map_batches(add_bucket, batch_format="pyarrow")
     .groupby("part").map_groups(merge_bucket, batch_format="pyarrow")
     .materialize())

    if mode == "merge":
        # fold back to one sorted file per touched bucket (compaction is
        # content-idempotent, so every crash window stays exactly-once)
        _compact_store(out_dir, key, min_files=2)

    # buckets the delta never touched must still record the ingest so a
    # REPLAY of the same delta (possibly partitioned differently) is a
    # pure manifest no-op (record-only update; files stay as listed)
    recs2 = {r["partition_id"]: r for r in manifest.records()
             if r.get("status") == "ok"}
    for b, r in recs2.items():
        if ingest_id not in r.get("ingests", []):
            manifest.update_record(b, {
                "ingests": r.get("ingests", []) + [ingest_id]})

    out = manifest.summary()
    out["rows"] = sum(r.get("n_rows", 0) for r in manifest.records())
    out["buckets"] = buckets
    return out


def _compact_store(out_dir: str, key: str, min_files: int,
                   extra_record_fn=None) -> int:
    """Shared LSM compaction over any manifest store with ``files``
    lists: partitions with >= ``min_files`` listed files merge + re-sort
    into a NEW file inside the live dir, then the record's files list is
    atomically replaced (``extra_record_fn(merged)`` contributes e.g.
    zonemap stats), then old + stale unlisted files are removed.

    Crash safety WITHOUT a dir swap (a swap would rmtree the only copy
    of the source files before the rename lands): a crash before the
    record update leaves an unlisted, invisible new file (the retry
    overwrites it — the name is a pure function of the merged file
    set); a crash after it leaves unlisted stale files that the next
    compaction sweep deletes. Readers only ever see listed files.
    One Ray task per partition; returns the number compacted."""
    import hashlib

    import ray.data as rd

    m = Manifest(out_dir)
    todo = [int(r["partition_id"]) for r in m.records()
            if r.get("status") == "ok"
            and len(r.get("files", ["rows.parquet"])) >= min_files]

    def compact_one(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        for b in t.column("b").to_pylist():
            mm = Manifest(out_dir)
            rec = {r["partition_id"]: r for r in mm.records()}[b]
            names = rec.get("files", ["rows.parquet"])
            pdir = mm.partition_dir(b)
            if len(names) >= min_files:
                kind_map = rec.get("kinds", {})
                pairs = [(os.path.join(pdir, n),
                          kind_map.get(n, "append"))
                         for n in names
                         if os.path.exists(os.path.join(pdir, n))]
                # the fold applies upsert/delete shadowing (no-op concat
                # for append-only history — bytes unchanged); resolved
                # rows re-sort by key. None = every row tombstoned.
                merged = _resolve_bucket([p for p, _ in pairs],
                                         [k for _, k in pairs], key)
                record = {"ingests": rec.get("ingests", []),
                          # preserved so snapshot reads can DETECT that
                          # the folded history is gone (and refuse)
                          "deposits": rec.get("deposits", []),
                          "kinds": {}}
                if merged is None or merged.num_rows == 0:
                    record.update({"n_rows": 0, "files": []})
                    names = []
                else:
                    merged = merged.take(pc.sort_indices(
                        merged, sort_keys=[(key, "ascending")]))
                    new_name = "compact-" + hashlib.blake2b(
                        "\n".join(names).encode(),
                        digest_size=6).hexdigest() + ".parquet"
                    pq.write_table(merged, os.path.join(pdir, new_name))
                    record.update({"n_rows": merged.num_rows,
                                   "files": [new_name]})
                    names = [new_name]
                if extra_record_fn is not None and merged is not None:
                    record.update(extra_record_fn(merged))
                mm.update_record(b, record)
            # sweep stale unlisted files (prior crashed compactions)
            if os.path.isdir(pdir):
                for f in os.listdir(pdir):
                    if f.endswith(".parquet") and f not in names:
                        try:
                            os.remove(os.path.join(pdir, f))
                        except OSError:
                            pass
        return pa.table({"b": t.column("b")})

    if todo:
        (rd.from_items([{"b": b} for b in todo])
         .map_batches(compact_one, batch_format="pyarrow", batch_size=1)
         .materialize())
    return len(todo)


def compact_bucketed(out_dir: str, key: str,
                     min_files: int = 2) -> dict:
    """Fold delta files back into one sorted file per bucket (the LSM
    compaction; see ``_compact_store`` for the crash protocol).
    Returns {"compacted": n, "buckets": B}."""
    n = _compact_store(out_dir, key, min_files)
    m = Manifest(out_dir)
    return {"compacted": n,
            "buckets": len([r for r in m.records()
                            if r.get("status") == "ok"])}


def vacuum(out_dir: str) -> dict:
    """Remove files no committed manifest record references.

    The crash protocols deliberately leave garbage rather than risk
    data: an interrupted compaction leaves its unlisted merged file (or
    the superseded inputs it had not yet deleted), an interrupted
    ``delete_range`` rewrite leaves the old file unlisted, a killed
    write leaves a ``.tmp-part-*`` staging dir. Each is invisible to
    readers (they only open listed files) and each is reclaimed by the
    NEXT touch of its partition — but a partition never touched again
    keeps its garbage forever. ``vacuum`` is the explicit reclaim: one
    driver-side metadata walk (no data I/O) over any manifest store
    (bucketed, sorted/zonemap, z-ordered, extract-job output).

    Safe while readers are active on a POSIX filesystem (open handles
    survive the unlink); not safe concurrently with a writer mid-commit
    on the same store — run it between jobs, like the compactions.
    Returns {"removed_files": n, "removed_bytes": b, "removed_tmp_dirs": d}.
    """
    import shutil

    m = Manifest(out_dir)
    removed_files = removed_bytes = removed_tmp = 0
    recs = [r for r in m.records() if r.get("status") == "ok"]
    for rec in recs:
        pdir = m.partition_dir(int(rec["partition_id"]))
        if not os.path.isdir(pdir):
            continue
        listed = set(rec.get("files", ["rows.parquet"]))
        for name in os.listdir(pdir):
            if name in listed:
                continue
            path = os.path.join(pdir, name)
            if os.path.isfile(path):
                removed_bytes += os.path.getsize(path)
                os.remove(path)
                removed_files += 1
    for name in os.listdir(out_dir):
        if name.startswith(".tmp-part-"):
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
            removed_tmp += 1
    return {"removed_files": removed_files,
            "removed_bytes": removed_bytes,
            "removed_tmp_dirs": removed_tmp}
