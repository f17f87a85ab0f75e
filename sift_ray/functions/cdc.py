"""Content-defined chunking (FastCDC, Xia et al., USENIX ATC 2016) and
chunk-level dedup statistics — the storage-side dedup family: boundaries
are chosen by content (a rolling gear hash hitting a mask), so inserting
or deleting bytes shifts only the chunks it touches and the stream
re-synchronizes, unlike fixed-size blocks where one insert re-writes
every later chunk.

The gear recurrence ``h = (h << 1) + gear[byte]`` looks inherently
sequential, but after 64 steps earlier contributions have shifted out of
the word, so ``h[i] = Σ_{d=0..63} gear[b[i-d]] << d`` — a 64-byte
windowed sum computable with SIX vectorized shift-add doublings
(window 1→2→4→…→64), giving the full per-position hash array in numpy
(exactness against the sequential reference is pinned by test).
Boundary selection then follows FastCDC's normalized chunking: a harder
mask before the average size, an easier one after, min/max enforced —
implemented as searchsorted walks over the precomputed candidate
positions, O(chunks · log n).

Operators (both zero-shuffle map stages; the dedup statistics add ONE
chunk-hash exchange):

* ``cdc_chunks`` — (doc_id, chunk_idx, offset, length, chunk_hash)
* ``cdc_dedup_stats`` — per-doc duplicate-chunk/byte counts against the
  whole corpus (first occurrence in (doc_id, offset) order is the
  original), plus a corpus-level summary row helper.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

from .shuffle import TaskStage, add_hash_partition, default_num_parts


def _gear_table(seed: int = 0x3779B97F4A7C15) -> np.ndarray:
    """Deterministic 256-entry uint64 gear table via splitmix64."""
    out = np.empty(256, np.uint64)
    x = np.uint64(seed)
    with np.errstate(over="ignore"):   # wraparound is the definition
        for i in range(256):
            x = x + np.uint64(0x9E3779B97F4A7C15)
            z = x
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            out[i] = z ^ (z >> np.uint64(31))
    return out


_GEAR = _gear_table()


def gear_hashes(data: np.ndarray) -> np.ndarray:
    """Per-position gear hash of a uint8 array: h[i] is exactly the value
    the sequential ``h = (h << 1) + gear[b]`` recurrence holds after
    consuming byte i. Six shift-add doublings instead of a byte loop."""
    g = _GEAR[data]
    for s in (1, 2, 4, 8, 16, 32):
        su = np.uint64(s)
        shifted = np.zeros_like(g)
        shifted[s:] = g[:-s] << su
        g = g + shifted
    return g


def cdc_boundaries(data: np.ndarray, min_size: int = 2048,
                   avg_size: int = 8192,
                   max_size: int = 65536) -> np.ndarray:
    """Chunk END offsets (exclusive) for a uint8 array under FastCDC
    normalized chunking: mask_s (avg*4 zero-bits target) applies in
    [start+min, start+avg), mask_l (avg/4 target) in [start+avg,
    start+max); no hit -> cut at start+max. Returns int64 offsets, last
    one == len(data)."""
    n = len(data)
    if n == 0:
        return np.empty(0, np.int64)
    bits = max(1, int(round(np.log2(avg_size))))
    mask_s = np.uint64((1 << (bits + 2)) - 1)
    mask_l = np.uint64((1 << max(1, bits - 2)) - 1)
    h = gear_hashes(data)
    cand_s = np.flatnonzero((h & mask_s) == 0)
    cand_l = np.flatnonzero((h & mask_l) == 0)
    ends = []
    start = 0
    while start < n:
        if n - start <= min_size:
            ends.append(n)
            break
        lo = start + min_size
        mid = min(start + avg_size, n)
        hi = min(start + max_size, n)
        cut = -1
        i = np.searchsorted(cand_s, lo)
        if i < len(cand_s) and cand_s[i] < mid:
            cut = int(cand_s[i]) + 1     # boundary AFTER the hit byte
        else:
            j = np.searchsorted(cand_l, mid)
            if j < len(cand_l) and cand_l[j] < hi:
                cut = int(cand_l[j]) + 1
        if cut < 0:
            cut = hi
        ends.append(cut)
        start = cut
    return np.asarray(ends, np.int64)


def _chunk_hash(buf: bytes) -> int:
    return int.from_bytes(
        hashlib.blake2b(buf, digest_size=8).digest(), "big", signed=False)


class CdcChunkStage:
    """Map stage: payload column (binary or string) -> chunk table."""

    def __init__(self, data_col: str = "text", id_col: str = "doc_id",
                 min_size: int = 2048, avg_size: int = 8192,
                 max_size: int = 65536):
        self.data_col, self.id_col = data_col, id_col
        self.min_size, self.avg_size, self.max_size = (min_size, avg_size,
                                                       max_size)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        vals = batch.column(self.data_col).to_pylist()
        docs, idxs, offs, lens, hashes = [], [], [], [], []
        for i, v in enumerate(vals):
            if v is None:
                continue
            raw = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            data = np.frombuffer(raw, np.uint8)
            ends = cdc_boundaries(data, self.min_size, self.avg_size,
                                  self.max_size)
            start = 0
            for ci, end in enumerate(ends.tolist()):
                docs.append(int(ids[i]))
                idxs.append(ci)
                offs.append(start)
                lens.append(end - start)
                hashes.append(_chunk_hash(raw[start:end]))
                start = end
        return pa.table({
            "doc_id": pa.array(docs, pa.int64()),
            "chunk_idx": pa.array(idxs, pa.int64()),
            "offset": pa.array(offs, pa.int64()),
            "length": pa.array(lens, pa.int64()),
            "chunk_hash": pa.array(np.asarray(hashes, np.uint64),
                                   pa.uint64())})


def cdc_chunks(ds, data_col: str = "text", id_col: str = "doc_id",
               min_size: int = 2048, avg_size: int = 8192,
               max_size: int = 65536):
    """Content-defined chunk table. Zero shuffle."""
    return ds.map_batches(
        TaskStage(CdcChunkStage, data_col=data_col, id_col=id_col,
                  min_size=min_size, avg_size=avg_size,
                  max_size=max_size),
        batch_format="pyarrow")


def cdc_dedup_stats(ds, data_col: str = "text", id_col: str = "doc_id",
                    min_size: int = 2048, avg_size: int = 8192,
                    max_size: int = 65536,
                    num_parts: Optional[int] = None):
    """Per-document chunk-dedup statistics against the WHOLE corpus:
    (doc_id, n_chunks, total_bytes, dup_chunks, dup_bytes). A chunk is a
    duplicate iff an identical-hash chunk exists earlier in (doc_id,
    offset) order — first occurrence is the original. ONE chunk-hash
    exchange marks duplicates; ONE doc-keyed exchange folds per-doc
    sums. Driver holds nothing."""
    import pyarrow.compute as pc

    P = num_parts or default_num_parts()
    chunks = cdc_chunks(ds, data_col, id_col, min_size, avg_size,
                        max_size)

    def mark(tbl: pa.Table) -> pa.Table:
        h = tbl.column("chunk_hash").to_numpy(zero_copy_only=False)
        d = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        o = tbl.column("offset").to_numpy(zero_copy_only=False)
        ln = tbl.column("length").to_numpy(zero_copy_only=False)
        order = np.lexsort((o, d, h))
        h, d, o, ln = h[order], d[order], o[order], ln[order]
        first = np.ones(len(h), dtype=bool)
        first[1:] = h[1:] != h[:-1]
        return pa.table({
            "doc_id": pa.array(d, pa.int64()),
            "length": pa.array(ln, pa.int64()),
            "dup": pa.array(~first)})

    def key_h(batch: pa.Table):
        return [batch.column("chunk_hash").to_numpy(
            zero_copy_only=False).astype(np.int64)]

    marked = (add_hash_partition(chunks, ["chunk_hash"], P,
                                 key_arrays_fn=key_h)
              .groupby("part")
              .map_groups(lambda t: mark(t.drop_columns("part")),
                          batch_format="pyarrow"))

    def fold(tbl: pa.Table) -> pa.Table:
        d = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        ln = tbl.column("length").to_numpy(zero_copy_only=False)
        dup = tbl.column("dup").to_numpy(zero_copy_only=False)
        order = np.argsort(d, kind="stable")
        d, ln, dup = d[order], ln[order], dup[order]
        first = np.ones(len(d), dtype=bool)
        first[1:] = d[1:] != d[:-1]
        seg = np.cumsum(first) - 1
        nseg = int(seg[-1]) + 1 if len(seg) else 0
        n_chunks = np.bincount(seg, minlength=nseg)
        tot = np.bincount(seg, weights=ln, minlength=nseg)
        dchunks = np.bincount(seg, weights=dup, minlength=nseg)
        dbytes = np.bincount(seg, weights=ln * dup, minlength=nseg)
        return pa.table({
            "doc_id": pa.array(d[first], pa.int64()),
            "n_chunks": pa.array(n_chunks.astype(np.int64), pa.int64()),
            "total_bytes": pa.array(tot.astype(np.int64), pa.int64()),
            "dup_chunks": pa.array(dchunks.astype(np.int64), pa.int64()),
            "dup_bytes": pa.array(dbytes.astype(np.int64), pa.int64())})

    return (add_hash_partition(marked, ["doc_id"], P)
            .groupby("part")
            .map_groups(lambda t: fold(t.drop_columns("part")),
                        batch_format="pyarrow"))


def _cut_payload(raw: bytes, starts, ends) -> bytes:
    """Remove the sorted, disjoint [start, end) byte ranges from raw
    (CDC chunks never overlap within a document)."""
    pieces = []
    prev = 0
    for s, e in zip(starts, ends):
        pieces.append(raw[prev:s])
        prev = e
    pieces.append(raw[prev:])
    return b"".join(pieces)


class _CdcApplyCutsBroadcast:
    """Below-gate cut application: duplicate-chunk ranges broadcast once
    per worker; the corpus never crosses an exchange."""

    def __init__(self, cuts_ref, data_col: str, id_col: str):
        import ray
        self.cmap = ray.get(cuts_ref)
        self.data_col, self.id_col = data_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        vals = batch.column(self.data_col).to_pylist()
        out_ids, out_data = [], []
        for i, v in enumerate(vals):
            if v is None:
                continue
            raw = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            cut = self.cmap.get(int(ids[i]))
            out_ids.append(int(ids[i]))
            out_data.append(raw if cut is None
                            else _cut_payload(raw, cut[0], cut[1]))
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                         "data": pa.array(out_data, pa.binary())})


def cdc_dedup_docs(ds, data_col: str = "text", id_col: str = "doc_id",
                   min_size: int = 2048, avg_size: int = 8192,
                   max_size: int = 65536,
                   num_parts: Optional[int] = None,
                   cuts_broadcast_limit: int = 2_000_000):
    """Chunk-level dedup MATERIALIZER — completes the CDC family: rewrite
    every payload with its globally-duplicate chunks removed (the chunk
    whose identical-hash twin occurs earlier in (doc_id, offset) order is
    dropped; the first occurrence survives byte-identical) — the
    write-path of a content-addressed chunk store, where each stored
    payload keeps only chunks it introduced. Returns (doc_id:int64,
    data:binary) — binary because cut points are CONTENT-defined byte
    boundaries, which need not respect UTF-8 codepoints in string input
    (string payloads are measured and cut on their UTF-8 encoding,
    exactly as ``cdc_chunks`` hashes them).

    Shape: reuses the stats family's first-occurrence exchange — ONE
    chunk-hash exchange emits only the duplicate ranges (doc_id, offset,
    length), duplication-proportional. Application is size-gated (the
    repo's dual-path convention): below ``cuts_broadcast_limit``
    cut-docs the ranges broadcast once per worker and the corpus never
    crosses an exchange; above it ONE doc-keyed hash join attaches
    ranges distributively. Removed bytes per doc always equal
    ``cdc_dedup_stats``'s dup_bytes (tested)."""
    import pyarrow.compute as pc
    import ray

    P = num_parts or default_num_parts()
    chunks = cdc_chunks(ds, data_col, id_col, min_size, avg_size,
                        max_size)

    def dup_cuts(tbl: pa.Table) -> pa.Table:
        h = tbl.column("chunk_hash").to_numpy(zero_copy_only=False)
        d = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        o = tbl.column("offset").to_numpy(zero_copy_only=False)
        ln = tbl.column("length").to_numpy(zero_copy_only=False)
        order = np.lexsort((o, d, h))
        h, d, o, ln = h[order], d[order], o[order], ln[order]
        first = np.ones(len(h), dtype=bool)
        first[1:] = h[1:] != h[:-1]
        dup = ~first
        return pa.table({
            "doc_id": pa.array(d[dup], pa.int64()),
            "offset": pa.array(o[dup], pa.int64()),
            "length": pa.array(ln[dup], pa.int64())})

    def key_h(batch: pa.Table):
        return [batch.column("chunk_hash").to_numpy(
            zero_copy_only=False).astype(np.int64)]

    cuts = (add_hash_partition(chunks, ["chunk_hash"], P,
                               key_arrays_fn=key_h)
            .groupby("part")
            .map_groups(lambda t: dup_cuts(t.drop_columns("part")),
                        batch_format="pyarrow"))

    def fold_doc_cuts(tbl: pa.Table) -> pa.Table:
        d = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        o = tbl.column("offset").to_numpy(zero_copy_only=False)
        ln = tbl.column("length").to_numpy(zero_copy_only=False)
        order = np.lexsort((o, d))
        d, o, ln = d[order], o[order], ln[order]
        first = np.ones(len(d), dtype=bool)
        first[1:] = d[1:] != d[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(d))
        out_d, out_cuts = [], []
        for s, e in zip(starts, ends):
            out_d.append(int(d[s]))
            out_cuts.append(";".join(
                f"{int(a)}:{int(a) + int(b)}"
                for a, b in zip(o[s:e], ln[s:e])))
        return pa.table({"doc_id": pa.array(out_d, pa.int64()),
                         "cuts": pa.array(out_cuts, pa.string())})

    doc_cuts = (add_hash_partition(cuts, ["doc_id"], P)
                .groupby("part")
                .map_groups(lambda t: fold_doc_cuts(t.drop_columns("part")),
                            batch_format="pyarrow")).materialize()

    def _parse(cut: str):
        ranges = [r.split(":") for r in cut.split(";")]
        return ([int(a) for a, _ in ranges], [int(b) for _, b in ranges])

    n_cut_docs = doc_cuts.count()
    if n_cut_docs <= cuts_broadcast_limit:
        cmap = {}
        for t in doc_cuts.iter_batches(batch_size=65536,
                                       batch_format="pyarrow"):
            for did, cut in zip(t.column("doc_id").to_pylist(),
                                t.column("cuts").to_pylist()):
                cmap[did] = _parse(cut)
        ref = ray.put(cmap)
        return ds.map_batches(
            TaskStage(_CdcApplyCutsBroadcast, cuts_ref=ref,
                      data_col=data_col, id_col=id_col),
            batch_format="pyarrow")

    from .shuffle import hash_join
    docs = ds.map_batches(
        lambda t: pa.table({
            "doc_id": pc.cast(t.column(id_col), pa.int64()),
            "data": (pc.cast(t.column(data_col), pa.large_binary())
                     if pa.types.is_string(t.column(data_col).type)
                     or pa.types.is_large_string(t.column(data_col).type)
                     else t.column(data_col))}),
        batch_format="pyarrow")
    joined = hash_join(docs, doc_cuts, on="doc_id", how="left",
                       num_parts=P,
                       left_types={"doc_id": pa.int64(),
                                   "data": pa.large_binary()},
                       right_types={"doc_id": pa.int64(),
                                    "cuts": pa.string()})

    def apply_cuts(tbl: pa.Table) -> pa.Table:
        vals = tbl.column("data").to_pylist()
        cuts_col = (tbl.column("cuts").to_pylist()
                    if "cuts" in tbl.column_names
                    else [None] * tbl.num_rows)
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        out_ids, out = [], []
        for i, (v, c) in enumerate(zip(vals, cuts_col)):
            if v is None:      # null payloads drop, as on the broadcast path
                continue
            raw = bytes(v)
            out_ids.append(int(ids[i]))
            if c is None or c == "":
                out.append(raw)
            else:
                s, e = _parse(c)
                out.append(_cut_payload(raw, s, e))
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                         "data": pa.array(out, pa.binary())})

    return joined.map_batches(apply_cuts, batch_format="pyarrow")
