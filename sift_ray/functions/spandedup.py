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
    arithmetic is part of the hash definition; ``errstate`` silences the
    intended-overflow scalar warning)."""
    n = len(codes)
    if n < k:
        return np.empty(0, np.uint64)
    with np.errstate(over="ignore"):
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
    the no-false-negative guarantee.

    O(m) regardless of w via the van Herk / Gil-Werman two-pass sliding
    minimum adapted to LEFTMOST argmin: blocks of size w, each window
    [i, i+w-1] = (suffix of block(i) from i) + (prefix of block(i+w-1) up
    to i+w-1). Prefix argmin records on strict <, suffix (scanned
    right-to-left) on <= — both yield the leftmost index; on a cross-part
    tie the suffix side wins (its indices are smaller)."""
    m = len(h)
    if m == 0:
        return np.empty(0, np.int64)
    if m <= w:
        return np.array([int(np.argmin(h))], np.int64)
    nb = -(-m // w)
    pad = nb * w - m
    hp = (np.concatenate([h, np.full(pad, np.uint64(0xFFFFFFFFFFFFFFFF))])
          if pad else h)
    blocks = hp.reshape(nb, w)
    col = np.arange(w, dtype=np.int64)
    base = (np.arange(nb, dtype=np.int64) * w)[:, None]

    pmin = np.minimum.accumulate(blocks, axis=1)
    rec = np.empty((nb, w), dtype=bool)
    rec[:, 0] = True
    rec[:, 1:] = blocks[:, 1:] < pmin[:, :-1]
    pidx = np.maximum.accumulate(np.where(rec, col, -1), axis=1) + base

    rb = blocks[:, ::-1]
    smin_r = np.minimum.accumulate(rb, axis=1)
    rec_r = np.empty((nb, w), dtype=bool)
    rec_r[:, 0] = True
    rec_r[:, 1:] = rb[:, 1:] <= smin_r[:, :-1]
    sidx = ((np.int64(w - 1)
             - np.maximum.accumulate(np.where(rec_r, col, -1),
                                     axis=1))[:, ::-1] + base)
    smin = smin_r[:, ::-1]

    i = np.arange(m - w + 1, dtype=np.int64)
    j = i + w - 1
    sv = smin.ravel()[i]
    pv = pmin.ravel()[j]
    sel = np.where(sv <= pv, sidx.ravel()[i], pidx.ravel()[j])
    return np.unique(sel)


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
                    text_broadcast_bytes: int = 256 * 1024 * 1024,
                    id_broadcast_limit: int = 50_000_000):
    """All maximal cross-document duplicated spans of length >= min_len
    CHARACTERS: (doc_a, start_a, doc_b, start_b, length), doc_a < doc_b,
    byte-exact (anchors are winnowing-guaranteed, then verified and
    extended against the real text — output equals the brute-force
    all-shared-k-gram computation, tested). ``max_df`` caps hot-anchor
    buckets (boilerplate), the one documented exactness trade-off.

    Dual paths, both gated on MEASURED sizes (Dataset metadata — nothing
    is pulled to the driver to measure):

    * candidate-id filter — the distinct candidate doc-id set is computed
      distributed (one int-only exchange); below ``id_broadcast_limit``
      it broadcasts once as a sorted int64 array (map-side searchsorted,
      zero text movement), above it the corpus filter becomes a
      bloom-prefiltered semi hash-join (no driver id state).
    * verify — broadcast text map below ``text_broadcast_bytes``
      (measured via ``size_bytes()``); above it the partition-cogrouped
      exchange of ``_verify_spans_exchange`` (text moves once per needing
      partition, never per anchor, no driver text state).

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

    def ids_proj(tbl: pa.Table) -> pa.Table:
        a = tbl.column("doc_a").to_numpy(zero_copy_only=False)
        b = tbl.column("doc_b").to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": pa.array(
            np.unique(np.concatenate([a, b])), pa.int64())})

    def distinct_ids(tbl: pa.Table) -> pa.Table:
        t = tbl.drop_columns("part")
        return t.group_by(t.column_names, use_threads=False).aggregate([])

    cand_ids = (add_hash_partition(
        anchors.map_batches(ids_proj, batch_format="pyarrow"),
        ["doc_id"], P)
        .groupby("part")
        .map_groups(distinct_ids, batch_format="pyarrow")).materialize()
    n_cand = cand_ids.count()
    if n_cand == 0:
        return rd.from_arrow(_pairs_to_table([]))

    if n_cand <= id_broadcast_limit:
        cand = np.sort(np.concatenate(
            [t.column("doc_id").to_numpy(zero_copy_only=False)
             for t in cand_ids.iter_batches(batch_size=1 << 20,
                                            batch_format="pyarrow")]))
        cand_ref = ray.put(cand)

        def cand_texts(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            cs = ray.get(cand_ref)       # zero-copy shared-memory read
            ix = np.searchsorted(cs, ids)
            inb = ix < len(cs)
            keep = np.zeros(len(ids), bool)
            keep[inb] = cs[ix[inb]] == ids[inb]
            return pa.table({
                "doc_id": pa.array(ids[keep].astype(np.int64),
                                   pa.int64()),
                "text": pc.cast(batch.column(text_col).filter(
                    pa.array(keep)), pa.string())})

        texts = ds.map_batches(cand_texts, batch_format="pyarrow")
    else:
        from .shuffle import hash_join
        docs_proj = ds.map_batches(
            lambda t: pa.table({
                "doc_id": pc.cast(t.column(id_col), pa.int64()),
                "text": pc.cast(t.column(text_col), pa.string())}),
            batch_format="pyarrow")
        texts = hash_join(
            docs_proj, cand_ids, on="doc_id", how="semi", num_parts=P,
            left_types={"doc_id": pa.int64(), "text": pa.string()},
            right_types={"doc_id": pa.int64()},
            bloom_prefilter=max(1 << 20, 16 * n_cand))

    texts = texts.materialize()
    tbytes = texts.size_bytes() or 0

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


def _partition_needs(anchors_p, P: int):
    """Distinct (dst_part, doc_id) pairs over a part-tagged anchor table:
    which verify partition needs which document's text. Ints only; row
    count is bounded by candidate-docs x needing-partitions (<= n_docs*P)
    and is INDEPENDENT of the anchor count — the guard that keeps the
    above-gate verify free of per-anchor text amplification (tested by a
    many-anchors-per-pair fixture)."""
    def needs_proj(tbl: pa.Table) -> pa.Table:
        part = tbl.column("part").to_numpy(zero_copy_only=False)
        a = tbl.column("doc_a").to_numpy(zero_copy_only=False)
        b = tbl.column("doc_b").to_numpy(zero_copy_only=False)
        pairs = np.unique(np.stack(
            [np.concatenate([part, part]),
             np.concatenate([a, b])], axis=1), axis=0)
        return pa.table({"dst_part": pa.array(pairs[:, 0], pa.int64()),
                         "doc_id": pa.array(pairs[:, 1], pa.int64())})

    def distinct(tbl: pa.Table) -> pa.Table:
        t = tbl.drop_columns("part")
        return t.group_by(t.column_names, use_threads=False).aggregate([])

    return (add_hash_partition(
        anchors_p.map_batches(needs_proj, batch_format="pyarrow"),
        ["doc_id", "dst_part"], P)
        .groupby("part")
        .map_groups(distinct, batch_format="pyarrow"))


def _verify_spans_exchange(anchors, texts, k: int, min_len: int, P: int):
    """Above-gate path: co-partition anchors with exactly the texts their
    verify partition needs. Anchors are part-tagged by (doc_a, doc_b); the
    distinct (dst_part, doc_id) needs table of ``_partition_needs`` drives
    ONE doc-keyed join that ships each candidate text to each needing
    partition at most once — text movement is partition-proportional
    (<= needing-partitions x doc size), NEVER per anchor, and no text
    touches the driver. The union-cogroup kernel builds the partition's
    doc->text dict and verifies+extends all of its anchors in one call."""
    import pyarrow.compute as pc

    from .shuffle import hash_join

    ap = add_hash_partition(anchors, ["doc_a", "doc_b"], P).materialize()
    needs = _partition_needs(ap, P)
    rep = hash_join(
        texts, needs, on="doc_id", num_parts=P,
        left_types={"doc_id": pa.int64(), "text": pa.string()},
        right_types={"doc_id": pa.int64(), "dst_part": pa.int64()})

    def tag_texts(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "doc_a": pa.nulls(n, pa.int64()),
            "pos_a": pa.nulls(n, pa.int64()),
            "doc_b": pa.nulls(n, pa.int64()),
            "pos_b": pa.nulls(n, pa.int64()),
            "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
            "text": pc.cast(t.column("text"), pa.string()),
            "part": pc.cast(t.column("dst_part"), pa.int64())})

    def tag_anchors(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "doc_a": t.column("doc_a"), "pos_a": t.column("pos_a"),
            "doc_b": t.column("doc_b"), "pos_b": t.column("pos_b"),
            "doc_id": pa.nulls(n, pa.int64()),
            "text": pa.nulls(n, pa.string()),
            "part": t.column("part")})

    both = ap.map_batches(tag_anchors, batch_format="pyarrow").union(
        rep.map_batches(tag_texts, batch_format="pyarrow"))

    def kernel(tbl: pa.Table) -> pa.Table:
        is_text = pc.is_valid(tbl.column("doc_id"))
        tt = tbl.filter(is_text)
        tmap = dict(zip(tt.column("doc_id").to_pylist(),
                        tt.column("text").to_pylist()))
        at = tbl.filter(pc.invert(is_text))
        return _pairs_to_table(_extend_pairs(
            tmap,
            at.column("doc_a").to_numpy(zero_copy_only=False),
            at.column("pos_a").to_numpy(zero_copy_only=False),
            at.column("doc_b").to_numpy(zero_copy_only=False),
            at.column("pos_b").to_numpy(zero_copy_only=False),
            k, min_len))

    return both.groupby("part").map_groups(kernel, batch_format="pyarrow")


def _slice(text: Optional[str], cut: Optional[str]) -> Optional[str]:
    """Remove the ';'-joined 'start:end' ranges of ``cut`` from ``text``
    (ranges pre-merged and sorted by ``strip_duplicate_spans``)."""
    if cut is None or cut == "" or text is None:
        return text
    pieces = []
    prev = 0
    for rng in cut.split(";"):
        cs, ce = rng.split(":")
        pieces.append(text[prev:int(cs)])
        prev = int(ce)
    pieces.append(text[prev:])
    return "".join(pieces)


class _ApplyCutsBroadcast:
    """Below-gate strip application: cuts map broadcast once per worker,
    ``text_col`` rewritten in place, every other column passed through —
    the corpus never crosses an exchange."""

    def __init__(self, cuts_ref, id_col: str, text_col: str):
        import ray
        self.cmap: Dict[int, str] = ray.get(cuts_ref)
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(self.text_col).to_pylist()
        get = self.cmap.get
        out = [_slice(txt, get(int(i))) for i, txt in zip(ids, texts)]
        return batch.set_column(
            batch.column_names.index(self.text_col), self.text_col,
            pa.array(out, pa.string()))


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
    their LATER position (start_b side). Returns the INPUT rows with the
    ``text_col`` column rewritten (spans removed) and every other column
    passed through unchanged — the operator composes mid-pipeline
    (url/host/metadata survive); documents without duplicates pass
    through untouched. The input must not already carry a ``cuts``
    column (reserved by the above-gate join path).

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

        return ds.map_batches(
            TaskStage(_ApplyCutsBroadcast, cuts_ref=ref, id_col=id_col,
                      text_col=text_col),
            batch_format="pyarrow")

    from .shuffle import hash_join
    # above the gate: ONE doc-keyed left join attaches cuts to the full
    # input rows (metadata rides the exchange — inherent to pass-through
    # past the broadcast gate) and the kernel rewrites text_col in place
    cuts_side = doc_cuts
    if id_col != "doc_id":
        cuts_side = doc_cuts.map_batches(
            lambda t: t.rename_columns([id_col, "cuts"]),
            batch_format="pyarrow")
    joined = hash_join(ds, cuts_side, on=id_col, how="left", num_parts=P,
                       right_types={id_col: pa.int64(),
                                    "cuts": pa.string()})

    def apply_cuts(tbl: pa.Table) -> pa.Table:
        texts = tbl.column(text_col).to_pylist()
        # a fully-empty cuts side can leave the left join without the
        # column at all (no block carried the padded schema)
        cuts_col = (tbl.column("cuts").to_pylist()
                    if "cuts" in tbl.column_names
                    else [None] * tbl.num_rows)
        out = [_slice(t, c) for t, c in zip(texts, cuts_col)]
        tbl = tbl.set_column(tbl.column_names.index(text_col), text_col,
                             pa.array(out, pa.string()))
        return (tbl.drop_columns("cuts")
                if "cuts" in tbl.column_names else tbl)

    return joined.map_batches(apply_cuts, batch_format="pyarrow")
