"""Exact duplicate-SPAN detection and removal across a document corpus —
the "deduplicating training data" operator family of Lee et al. 2021
("Deduplicating Training Data Makes Language Models Better"), re-expressed
for a distributed engine. The paper builds one giant suffix array, which
does not shard; the distributed formulation here uses WINNOWING fingerprint
selection (Schleimer, Wilkerson & Aiken 2003, the MOSS algorithm), whose
guarantee is exactly what dedup needs: every common substring of length >=
w + k - 1 shares at least one selected k-gram fingerprint between the two
copies, deterministically — no false negatives. Anchors meet in ONE
fingerprint-keyed exchange, candidate pairs are verified and EXTENDED to
maximal spans against the real text (size-gated broadcast / exchange, the
same dual-path convention as dedup.py's Jaccard verify), so reported spans
are byte-exact, not probabilistic.

Operators:

* ``winnow_fingerprints`` — per-document winnowing fingerprint table
  (fp, doc_id, pos): the document-overlap index MOSS builds.
* ``duplicate_spans`` — all maximal cross-document duplicated spans of
  length >= min_len (characters), exact after anchor verification +
  bidirectional extension.
* ``strip_duplicate_spans`` — the Lee-et-al. removal policy: each
  duplicated span is cut from the HIGHER-doc_id occurrence (first
  occurrence wins), overlapping spans merged per document first.

Scale shape: fingerprint selection is map-only (density ~2/w per char);
ONE fp-keyed exchange generates candidate anchor pairs (hot fingerprints
— site boilerplate — capped by ``max_df``, the same lever as
ngram_jaccard's); verification attaches candidate TEXTS either by one
broadcast (below a measured byte gate) or by two doc-keyed exchanges
(text moves at most twice, candidate-proportional, no driver text state).
The strip is one span exchange + one doc-keyed join.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pyarrow as pa

from .shuffle import TaskStage, add_hash_partition, default_num_parts

# polynomial rolling-hash base and a splitmix64 finalizer for decorrelation
_B = np.uint64(1099511628211)      # FNV prime, odd -> bijective in 2^64


def _mix64(x: np.ndarray) -> np.ndarray:
    x = x.copy()
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _kgram_hashes(codes: np.ndarray, k: int) -> np.ndarray:
    """Mixed polynomial hash of every k-gram of a uint32 code-point array
    (length n -> n-k+1 hashes). Windowed matmul in uint64 (wrap-around
    arithmetic is part of the hash definition)."""
    n = len(codes)
    if n < k:
        return np.empty(0, np.uint64)
    powers = np.empty(k, np.uint64)
    powers[k - 1] = np.uint64(1)
    for j in range(k - 2, -1, -1):
        powers[j] = powers[j + 1] * _B
    win = np.lib.stride_tricks.sliding_window_view(
        codes.astype(np.uint64), k)
    return _mix64((win * powers).sum(axis=1, dtype=np.uint64))


def _winnow_positions(h: np.ndarray, w: int) -> np.ndarray:
    """Winnowing selection: the union over every w-window of consecutive
    k-gram hashes of that window's LEFTMOST argmin. Any substring of
    length >= w + k - 1 contains a full window in both of its copies, and
    identical hash subsequences select the identical relative position —
    the no-false-negative guarantee. O(m*w) vectorized argmin (documents
    are small; m*w stays far under 10^8 for multi-100KB docs)."""
    m = len(h)
    if m == 0:
        return np.empty(0, np.int64)
    if m <= w:
        return np.array([int(np.argmin(h))], np.int64)
    wins = np.lib.stride_tricks.sliding_window_view(h, w)
    sel = wins.argmin(axis=1) + np.arange(m - w + 1)
    return np.unique(sel).astype(np.int64)


class WinnowStage:
    """Map stage: text -> (fp, doc_id, pos) winnowing fingerprints."""

    def __init__(self, k: int = 16, w: int = 49,
                 text_col: str = "text", id_col: str = "doc_id"):
        self.k, self.w = k, w
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        fps, docs, poss = [], [], []
        for i, text in enumerate(texts):
            if not text or len(text) < self.k:
                continue
            codes = np.frombuffer(text.encode("utf-32-le"),
                                  np.uint32).astype(np.uint64)
            h = _kgram_hashes(codes, self.k)
            pos = _winnow_positions(h, self.w)
            fps.append(h[pos])
            docs.append(np.full(len(pos), ids[i], np.int64))
            poss.append(pos)
        if not fps:
            return pa.table({"fp": pa.array([], pa.uint64()),
                             "doc_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        return pa.table({
            "fp": pa.array(np.concatenate(fps), pa.uint64()),
            "doc_id": pa.array(np.concatenate(docs), pa.int64()),
            "pos": pa.array(np.concatenate(poss), pa.int64())})


def winnow_fingerprints(ds, k: int = 16, w: int = 49,
                        text_col: str = "text", id_col: str = "doc_id"):
    """Per-document winnowing fingerprint table (fp, doc_id, pos).
    Guarantee parameter: shared substrings of length >= w + k - 1 always
    share a fingerprint. Zero shuffle."""
    return ds.map_batches(TaskStage(WinnowStage, k=k, w=w,
                                    text_col=text_col, id_col=id_col),
                          batch_format="pyarrow")


def _anchor_pairs_kernel(max_df: int, within_doc: bool = False):
    """Per-partition candidate generation: within each fp bucket, pair
    every cross-document (doc,pos) combination (doc_a < doc_b) — plus,
    with ``within_doc``, same-document position pairs (pos_a < pos_b,
    the self-repetition case of Lee et al.). Buckets larger than
    ``max_df`` rows are dropped (hot boilerplate strings — the
    documented exactness cap, same lever as ngram_jaccard's)."""
    def fn(tbl: pa.Table) -> pa.Table:
        fp = tbl.column("fp").to_numpy(zero_copy_only=False)
        doc = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        pos = tbl.column("pos").to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, doc, fp))
        fp, doc, pos = fp[order], doc[order], pos[order]
        first = np.ones(len(fp), dtype=bool)
        first[1:] = fp[1:] != fp[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(fp))
        out_a, out_pa, out_b, out_pb = [], [], [], []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2 or n > max_df:
                continue
            i, j = np.triu_indices(n, 1)
            da, db = doc[s + i], doc[s + j]
            # cross-document anchors; optionally same-doc distinct-position
            # anchors (the (doc,pos) rows are sorted, so i<j => pos_a<pos_b)
            keep = (da != db) | within_doc
            out_a.append(da[keep])
            out_b.append(db[keep])
            out_pa.append(pos[s + i][keep])
            out_pb.append(pos[s + j][keep])
        if not out_a:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "pos_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "pos_b": pa.array([], pa.int64())})
        return pa.table({
            "doc_a": pa.array(np.concatenate(out_a), pa.int64()),
            "pos_a": pa.array(np.concatenate(out_pa), pa.int64()),
            "doc_b": pa.array(np.concatenate(out_b), pa.int64()),
            "pos_b": pa.array(np.concatenate(out_pb), pa.int64())})
    return fn


def _extend_pairs(tmap: Dict[int, str], a, pa_, b, pb, k: int,
                  min_len: int):
    """Verify anchors against real text and extend each to its maximal
    common span. Returns canonical (doc_a, start_a, doc_b, start_b,
    length) rows, deduped (several anchors inside one span extend to the
    same maximal span)."""
    seen = set()
    rows = []
    for da, sa, db, sb in zip(a.tolist(), pa_.tolist(),
                              b.tolist(), pb.tolist()):
        ta = tmap.get(da)
        tb = tmap.get(db)
        if ta is None or tb is None:
            continue
        if ta[sa:sa + k] != tb[sb:sb + k]:
            continue                      # 64-bit hash collision guard
        lo_a, lo_b = sa, sb
        while lo_a > 0 and lo_b > 0 and ta[lo_a - 1] == tb[lo_b - 1]:
            lo_a -= 1
            lo_b -= 1
        hi_a, hi_b = sa + k, sb + k
        na, nb = len(ta), len(tb)
        while hi_a < na and hi_b < nb and ta[hi_a] == tb[hi_b]:
            hi_a += 1
            hi_b += 1
        length = hi_a - lo_a
        if length < min_len:
            continue
        key = (da, lo_a, db, lo_b, length)
        if key in seen:
            continue
        seen.add(key)
        rows.append(key)
    return rows


def _pairs_to_table(rows) -> pa.Table:
    if not rows:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "start_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "start_b": pa.array([], pa.int64()),
                         "length": pa.array([], pa.int64())})
    arr = np.asarray(rows, np.int64)
    return pa.table({"doc_a": pa.array(arr[:, 0], pa.int64()),
                     "start_a": pa.array(arr[:, 1], pa.int64()),
                     "doc_b": pa.array(arr[:, 2], pa.int64()),
                     "start_b": pa.array(arr[:, 3], pa.int64()),
                     "length": pa.array(arr[:, 4], pa.int64())})


class _SpanVerifyBroadcast:
    """Map-side verify+extend against a broadcast candidate text map —
    taken only below the measured byte gate."""

    def __init__(self, tmap_ref, k: int, min_len: int):
        import ray
        self.tmap: Dict[int, str] = ray.get(tmap_ref)
        self.k, self.min_len = k, min_len

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _pairs_to_table(_extend_pairs(
            self.tmap,
            batch.column("doc_a").to_numpy(zero_copy_only=False),
            batch.column("pos_a").to_numpy(zero_copy_only=False),
            batch.column("doc_b").to_numpy(zero_copy_only=False),
            batch.column("pos_b").to_numpy(zero_copy_only=False),
            self.k, self.min_len))


def duplicate_spans(ds, min_len: int = 100, k: int = 16,
                    text_col: str = "text", id_col: str = "doc_id",
                    max_df: int = 50, num_parts: Optional[int] = None,
                    within_doc: bool = False,
                    text_broadcast_bytes: int = 256 * 1024 * 1024):
    """All maximal cross-document duplicated spans of length >= min_len
    CHARACTERS: (doc_a, start_a, doc_b, start_b, length), doc_a < doc_b,
    byte-exact (anchors are winnowing-guaranteed, then verified and
    extended against the real text — output equals the brute-force
    all-shared-k-gram computation, tested). ``max_df`` caps hot-anchor
    buckets (boilerplate), the one documented exactness trade-off.

    Dual verify path on measured candidate-text bytes: broadcast text map
    below ``text_broadcast_bytes``, two doc-keyed text-attaching
    exchanges above (no driver text state).

    ``within_doc=True`` additionally reports same-document repeats
    (doc_a == doc_b, start_a < start_b) — Lee et al.'s self-repetition
    case; overlapping self-matches surface tandem repeats."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    if min_len <= k:
        raise ValueError(f"min_len must exceed k ({k})")
    w = min_len - k + 1
    P = num_parts or default_num_parts()

    fps = winnow_fingerprints(ds, k=k, w=w, text_col=text_col,
                              id_col=id_col)
    anchors = (add_hash_partition(fps, ["fp"], P)
               .groupby("part")
               .map_groups(_anchor_pairs_kernel(max_df, within_doc),
                           batch_format="pyarrow")).materialize()

    # candidate doc id set (ints on the driver — candidate-proportional)
    cand: set = set()
    for t in anchors.iter_batches(batch_size=65536,
                                  batch_format="pyarrow"):
        cand.update(t.column("doc_a").to_pylist())
        cand.update(t.column("doc_b").to_pylist())
    if not cand:
        return rd.from_arrow(_pairs_to_table([]))
    cand_ref = ray.put(np.fromiter(cand, np.int64, len(cand)))

    def cand_texts(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        keep = np.isin(ids, ray.get(cand_ref))
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "text": pc.cast(batch.column(text_col).filter(
                pa.array(keep)), pa.string())})

    texts = ds.map_batches(cand_texts,
                           batch_format="pyarrow").materialize()
    tbytes = 0
    for blk in ray.get(texts.to_arrow_refs()):
        tbytes += blk.nbytes if hasattr(blk, "nbytes") else 0

    if tbytes <= text_broadcast_bytes:
        tmap: Dict[int, str] = {}
        for t in texts.iter_batches(batch_size=4096,
                                    batch_format="pyarrow"):
            tmap.update(zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()))
        ref = ray.put(tmap)
        out = anchors.map_batches(
            TaskStage(_SpanVerifyBroadcast, tmap_ref=ref, k=k,
                      min_len=min_len),
            batch_format="pyarrow")
    else:
        out = _verify_spans_exchange(anchors, texts, k, min_len, P)
    # canonical global dedupe: anchors inside one maximal span extend to
    # identical rows but may land in different verify tasks — one
    # span-keyed exchange with a distinct kernel
    def distinct(tbl: pa.Table) -> pa.Table:
        t = tbl.drop_columns("part")
        return t.group_by(t.column_names, use_threads=False).aggregate([])

    return (add_hash_partition(out, ["doc_a", "doc_b"], P)
            .groupby("part")
            .map_groups(distinct, batch_format="pyarrow"))


def _verify_spans_exchange(anchors, texts, k: int, min_len: int, P: int):
    """Above-gate path: attach doc_a text via one doc_a-keyed exchange,
    then doc_b text via a doc_b-keyed exchange whose partition kernel
    runs the verify+extend — text moves at most twice, all state
    candidate-proportional."""
    from .shuffle import hash_join

    a_texts = texts.map_batches(
        lambda t: t.rename_columns(["doc_a", "text_a"]),
        batch_format="pyarrow")
    b_texts = texts.map_batches(
        lambda t: t.rename_columns(["doc_b", "text_b"]),
        batch_format="pyarrow")
    j1 = hash_join(anchors, a_texts, on="doc_a", num_parts=P)
    j2 = hash_join(j1, b_texts, on="doc_b", num_parts=P)

    def kernel(tbl: pa.Table) -> pa.Table:
        rows = []
        a = tbl.column("doc_a").to_numpy(zero_copy_only=False)
        b = tbl.column("doc_b").to_numpy(zero_copy_only=False)
        pa_ = tbl.column("pos_a").to_numpy(zero_copy_only=False)
        pb = tbl.column("pos_b").to_numpy(zero_copy_only=False)
        ta = tbl.column("text_a").to_pylist()
        tb = tbl.column("text_b").to_pylist()
        seen = set()
        for i in range(len(a)):
            res = _extend_pairs({int(a[i]): ta[i], int(b[i]): tb[i]},
                                a[i:i + 1], pa_[i:i + 1], b[i:i + 1],
                                pb[i:i + 1], k, min_len)
            for key in res:
                if key not in seen:
                    seen.add(key)
                    rows.append(key)
        return _pairs_to_table(rows)

    return j2.map_batches(kernel, batch_format="pyarrow")


def strip_duplicate_spans(ds, min_len: int = 100, k: int = 16,
                          text_col: str = "text", id_col: str = "doc_id",
                          max_df: int = 50,
                          num_parts: Optional[int] = None,
                          within_doc: bool = False,
                          spans=None,
                          cuts_broadcast_limit: int = 2_000_000):
    """Lee-et-al. removal policy over ``duplicate_spans``: every
    duplicated span is CUT from its higher-doc_id occurrence (the first
    occurrence in doc_id order survives), overlapping cut ranges merged
    per document. ``within_doc=True`` also cuts same-document repeats at
    their LATER position (start_b side). Returns (doc_id, text) with
    spans removed; documents without duplicates pass through unchanged.

    Pass a precomputed ``spans`` Dataset (the ``duplicate_spans`` output)
    to apply the policy without re-detecting — at corpus scale the
    detection pass is the expensive half and its result is typically
    materialized once and consumed by audits AND the strip."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    if spans is None:
        spans = duplicate_spans(ds, min_len=min_len, k=k,
                                text_col=text_col, id_col=id_col,
                                max_df=max_df, num_parts=num_parts,
                                within_doc=within_doc)
    P = num_parts or default_num_parts()

    cuts = spans.map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_b"),
            "start": t.column("start_b"),
            "end": pc.add(t.column("start_b"), t.column("length"))}),
        batch_format="pyarrow")

    def fold_doc_cuts(tbl: pa.Table) -> pa.Table:
        d = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        s = tbl.column("start").to_numpy(zero_copy_only=False)
        e = tbl.column("end").to_numpy(zero_copy_only=False)
        order = np.lexsort((s, d))
        d, s, e = d[order], s[order], e[order]
        first = np.ones(len(d), dtype=bool)
        first[1:] = d[1:] != d[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(d))
        out_d, out_cuts = [], []
        for i0, i1 in zip(starts, ends):
            merged = []
            cs, ce = int(s[i0]), int(e[i0])
            for j in range(i0 + 1, i1):
                if s[j] <= ce:
                    ce = max(ce, int(e[j]))
                else:
                    merged.append((cs, ce))
                    cs, ce = int(s[j]), int(e[j])
            merged.append((cs, ce))
            out_d.append(int(d[i0]))
            out_cuts.append(";".join(f"{x}:{y}" for x, y in merged))
        return pa.table({"doc_id": pa.array(out_d, pa.int64()),
                         "cuts": pa.array(out_cuts, pa.string())})

    doc_cuts = (add_hash_partition(cuts, ["doc_id"], P)
                .groupby("part")
                .map_groups(lambda t: fold_doc_cuts(t.drop_columns("part")),
                            batch_format="pyarrow")).materialize()

    def _slice(text: str, cut: Optional[str]) -> str:
        if cut is None or cut == "":
            return text
        pieces = []
        prev = 0
        for rng in cut.split(";"):
            cs, ce = rng.split(":")
            pieces.append(text[prev:int(cs)])
            prev = int(ce)
        pieces.append(text[prev:])
        return "".join(pieces)

    # size-gated application (the repo's dual-path convention): the cuts
    # table is duplicate-proportional — usually a tiny fraction of the
    # corpus — so below the gate it broadcasts once per worker and the
    # corpus NEVER crosses an exchange (zero-shuffle map); past the gate
    # one doc-keyed hash join attaches cuts distributively.
    n_cut_docs = doc_cuts.count()
    if n_cut_docs <= cuts_broadcast_limit:
        cmap: Dict[int, str] = {}
        for t in doc_cuts.iter_batches(batch_size=65536,
                                       batch_format="pyarrow"):
            cmap.update(zip(t.column("doc_id").to_pylist(),
                            t.column("cuts").to_pylist()))
        ref = ray.put(cmap)

        class _ApplyBroadcast:
            def __init__(self, cuts_ref):
                self.cmap: Dict[int, str] = ray.get(cuts_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                ids = batch.column(id_col).to_numpy(zero_copy_only=False)
                texts = batch.column(text_col).to_pylist()
                get = self.cmap.get
                out = [_slice(txt, get(int(i))) for i, txt
                       in zip(ids, texts)]
                return pa.table({
                    "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
                    "text": pa.array(out, pa.string())})

        return ds.map_batches(TaskStage(_ApplyBroadcast, cuts_ref=ref),
                              batch_format="pyarrow")

    from .shuffle import hash_join
    docs = ds.map_batches(
        lambda t: pa.table({
            "doc_id": pc.cast(t.column(id_col), pa.int64()),
            "text": pc.cast(t.column(text_col), pa.string())}),
        batch_format="pyarrow")
    joined = hash_join(docs, doc_cuts, on="doc_id", how="left",
                       num_parts=P)

    def apply_cuts(tbl: pa.Table) -> pa.Table:
        texts = tbl.column("text").to_pylist()
        # a fully-empty cuts side can leave the left join without the
        # column at all (no block carried the padded schema)
        cuts_col = (tbl.column("cuts").to_pylist()
                    if "cuts" in tbl.column_names
                    else [None] * tbl.num_rows)
        out = [_slice(t, c) for t, c in zip(texts, cuts_col)]
        return pa.table({"doc_id": tbl.column("doc_id"),
                         "text": pa.array(out, pa.string())})

    return joined.map_batches(apply_cuts, batch_format="pyarrow")
