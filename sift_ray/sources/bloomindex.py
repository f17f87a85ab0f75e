"""Per-file BLOOM skip-index for point lookups on any column.

Zonemaps prune RANGE predicates on the sort key (and correlated
columns); buckets prune point lookups on the BUCKET key. This module
covers the remaining shape — a point/IN lookup on an arbitrary column
(a url, a doc digest, a user id) over a store laid out by something
else: each committed file gets a small bloom bitmap of the column's
hashed values recorded in its manifest entry (the Parquet/Iceberg
bloom-filter idea, kept at the manifest level so pruning needs ZERO
footer reads). A file whose bloom misses every probe value DEFINITELY
does not contain them and is skipped; hits are confirmed by an exact
map-side filter, so false positives cost only I/O, never correctness.

Works over any manifest store (``sources.zonemap`` sorted/Z-ordered
stores, ``sources.bucketed``). Bloom entries key by FILE NAME, so a
compaction (new file name) simply drops coverage until
``build_bloom_index`` runs again — unindexed files are conservatively
kept. Sizing: default mbits=2^15 (4 KB/file/col) gives ~2% false
positives at ~2.5k distinct values per file with the double-probe
scheme shared with ``shuffle.build_key_bloom``.
"""

from __future__ import annotations

import base64
import os
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

from ..state.manifest import Manifest

_DEF_MBITS = 1 << 15


def _fold_bloom(col, mbits: int) -> bytes:
    from ..functions.shuffle import _bloom_probes2
    from ..functions.sketch import _hash64_any

    bits = np.zeros(mbits >> 3, np.uint8)
    if len(col):
        h = _hash64_any(col)
        for idx in _bloom_probes2(h, mbits):
            np.bitwise_or.at(
                bits, (idx >> np.uint64(3)).astype(np.int64),
                np.left_shift(np.uint8(1),
                              (idx & np.uint64(7)).astype(np.uint8)))
    return bits.tobytes()


def _bloom_hits(bits: np.ndarray, mbits: int, values) -> bool:
    """True iff ANY probe value MIGHT be present (bloom semantics)."""
    from ..functions.shuffle import _bloom_probes2
    from ..functions.sketch import _hash64_any

    h = _hash64_any(pa.chunked_array([pa.array(list(values))]))
    ok = np.ones(len(h), dtype=bool)
    for idx in _bloom_probes2(h, mbits):
        ok &= ((bits[(idx >> np.uint64(3)).astype(np.int64)]
                >> (idx & np.uint64(7)).astype(np.uint8)) & 1) > 0
    return bool(ok.any())


def build_bloom_index(out_dir: str, cols: Sequence[str],
                      mbits: int = _DEF_MBITS) -> dict:
    """Record a per-file bloom of each column in ``cols`` into the
    store's manifest records (``blooms: {file: {col: b64}}``). One Ray
    task per partition; files already indexed for every requested
    column are skipped, so re-runs are incremental (and the call after
    a compaction indexes only the new files). Returns counts."""
    import ray.data as rd

    m = Manifest(out_dir)
    todo = []
    for rec in m.records():
        if rec.get("status") != "ok" or rec.get("n_rows", 0) == 0:
            continue
        have = rec.get("blooms", {})
        names = [n for n in rec.get("files", ["rows.parquet"])
                 if not all(c in have.get(n, {}) for c in cols)]
        names = [n for n in names if os.path.exists(
            os.path.join(m.partition_dir(rec["partition_id"]), n))]
        if names:
            todo.append({"b": int(rec["partition_id"]), "names": names})

    cols_l = list(cols)

    def index_one(t: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq
        for b, names in zip(t.column("b").to_pylist(),
                            t.column("names").to_pylist()):
            mm = Manifest(out_dir)
            rec = {r["partition_id"]: r for r in mm.records()}[b]
            blooms = dict(rec.get("blooms", {}))
            pdir = mm.partition_dir(b)
            for name in names:
                tbl = pq.read_table(os.path.join(pdir, name),
                                    columns=[c for c in cols_l])
                ent = dict(blooms.get(name, {}))
                for c in cols_l:
                    ent[c] = base64.b64encode(
                        _fold_bloom(tbl.column(c), mbits)).decode()
                blooms[name] = ent
            mm.update_record(b, {"blooms": blooms,
                                 "bloom_mbits": int(mbits)})
        return pa.table({"b": t.column("b")})

    if todo:
        (rd.from_items(todo)
         .map_batches(index_one, batch_format="pyarrow", batch_size=1)
         .materialize())
    return {"indexed_partitions": len(todo), "cols": cols_l}


def bloom_pruned_paths(out_dir: str, col: str, values) -> list:
    """Store files that MIGHT contain any of ``values`` in ``col`` —
    decided from the manifest blooms alone. Files without a bloom for
    ``col`` (never indexed, or renamed by compaction) are
    conservatively kept: pruning is always a correct superset."""
    m = Manifest(out_dir)
    keep = []
    vals = list(values)
    for rec in m.records():
        if rec.get("status") != "ok" or rec.get("n_rows", 0) == 0:
            continue
        blooms = rec.get("blooms", {})
        mbits = rec.get("bloom_mbits", _DEF_MBITS)
        pdir = m.partition_dir(rec["partition_id"])
        for name in rec.get("files", ["rows.parquet"]):
            p = os.path.join(pdir, name)
            if not os.path.exists(p):
                continue
            b64 = blooms.get(name, {}).get(col)
            if b64 is not None:
                bits = np.frombuffer(base64.b64decode(b64), np.uint8)
                if not _bloom_hits(bits, mbits, vals):
                    continue  # definite miss: skip the file
            keep.append(p)
    return sorted(keep)


def read_point(out_dir: str, col: str, values,
               columns: Optional[Sequence[str]] = None):
    """Stream rows with ``col IN values`` reading only bloom-passing
    files, with an exact map-side ``is_in`` confirmation (bloom false
    positives never surface). Returns a Dataset."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    vals = pa.array(list(values))
    paths = bloom_pruned_paths(out_dir, col, vals)
    want = (list(dict.fromkeys(list(columns) + [col]))
            if columns is not None else None)
    if not paths:
        m = Manifest(out_dir)
        for rec in m.records():
            for name in rec.get("files", ["rows.parquet"]):
                p = os.path.join(m.partition_dir(rec["partition_id"]),
                                 name)
                if os.path.exists(p):
                    sch = pq.read_schema(p)
                    names = want if want is not None else sch.names
                    sch = pa.schema([sch.field(n) for n in names
                                     if sch.get_field_index(n) >= 0])
                    return rd.from_arrow(
                        sch.remove_metadata().empty_table())
        return rd.from_items([])

    ds = rd.read_parquet(paths, columns=want)
    return ds.map_batches(
        lambda t: t.filter(pc.is_in(t.column(col), value_set=vals)),
        batch_format="pyarrow")
