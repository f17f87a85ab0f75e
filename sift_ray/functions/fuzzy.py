"""Exact edit-distance pair mining (fuzzy dedup over short strings).

``fuzzy_pairs`` finds every unordered pair of rows whose string values
are within Levenshtein distance ``k`` — exactly, not approximately —
without an all-pairs comparison. Candidate generation is the FastSS /
SymSpell deletion-neighborhood index (Bocek et al. 2007, "Fast Similarity
Search in Large Dictionaries"): if lev(a, b) <= k then deleting at most
``k`` characters from each side yields a common string, so every string
emits the 64-bit hashes of its <=k-deletion variants and only strings
sharing a variant bucket are ever compared. Verification is an early-exit
banded O(k * min(len)) dynamic program, so false candidates (hash
collisions or bucket neighbors past ``k``) cost almost nothing.

Distributed shape (the same exchange discipline as ``functions.dedup``):

* map side — each batch explodes rows into (variant-hash, id, string)
  rows; variants are deduplicated per string (deleting different copies
  of a repeated character yields one variant). Short-string operator by
  contract: rows longer than ``max_len`` are dropped map-side (the
  deletion neighborhood is O(len^k) and edit distance on full documents
  is the wrong tool — use ``dedup.ngram_jaccard_pairs`` / MinHash there).
* ONE variant-hash exchange (``add_hash_partition`` + groupby(part)) —
  pairs are generated and verified inside the partition kernel, locally
  deduplicated per partition. A bucket is all strings sharing one
  deletion variant; ``max_bucket`` guards the pathological case (a hub
  variant shared by an unbounded set — the analog of dedup's hot-gram
  cap; buckets past the cap are dropped and counted, never silently).
* one pair-keyed exchange (``dedup._distinct_pairs``) removes the same
  pair re-found through different shared variants — cross-partition, so
  a driver pass is never needed. Pair volume is output-proportional.

Returns (doc_a, doc_b, dist) with doc_a < doc_b and dist <= k.

The reference CLI has no fuzzy matching; this is part of the
training-data operator family (typo-level near-dup of titles, URLs,
author fields, OCR noise) and is oracle-checked exactly against DuckDB's
``levenshtein()`` in a cross join.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

from .dedup import _distinct_pairs, _empty_pairs_df
from .shuffle import add_hash_partition, default_num_parts

_PAIRS_SCHEMA = pa.schema([("doc_a", pa.int64()),
                           ("doc_b", pa.int64()),
                           ("dist", pa.int64())])


def _deletion_variants(s: str, k: int) -> set:
    """All strings obtainable from ``s`` by deleting up to ``k`` chars
    (including ``s`` itself). BFS by level; duplicates collapse."""
    out = {s}
    frontier = {s}
    for _ in range(k):
        nxt = set()
        for v in frontier:
            nxt.update(v[:i] + v[i + 1:] for i in range(len(v)))
        nxt -= out
        if not nxt:
            break
        out |= nxt
        frontier = nxt
    return out


def _h64(s: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(s.encode(), digest_size=8).digest(), "big",
        signed=True)


def _lev_banded(a: str, b: str, k: int) -> Optional[int]:
    """Levenshtein distance if <= k else None.

    k == 1 runs entirely on C-speed string ops (prefix scan + suffix
    slice compare); k >= 2 uses the classic banded DP over a 2k+1-wide
    diagonal strip with a min-row early exit.
    """
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if lb - la > k:
        return None
    if k == 1:
        if la == lb:  # exactly one substitution, or fail
            i = 0
            while a[i] == b[i]:  # a != b, so a mismatch exists
                i += 1
            return 1 if a[i + 1:] == b[i + 1:] else None
        # lb == la + 1: exactly one insertion into a, or fail
        for i in range(la):
            if a[i] != b[i]:
                return 1 if a[i:] == b[i + 1:] else None
        return 1  # b == a + trailing char
    # banded DP: row i keeps columns j in [i - k, i + k]
    inf = k + 1
    prev = list(range(min(k, lb) + 1))  # D(0, j) for j in [0, min(k, lb)]
    lo_prev = 0
    for i in range(1, la + 1):
        lo = max(0, i - k)
        hi = min(lb, i + k)
        cur = [inf] * (hi - lo + 1)
        for j in range(lo, hi + 1):
            if j == 0:
                cur[0] = i
                continue
            best = inf
            # substitution / match
            pj = j - 1 - lo_prev
            if 0 <= pj < len(prev):
                best = prev[pj] + (a[i - 1] != b[j - 1])
            # deletion from a (row step)
            pj = j - lo_prev
            if 0 <= pj < len(prev):
                best = min(best, prev[pj] + 1)
            # insertion into a (col step)
            if j - 1 >= lo:
                best = min(best, cur[j - 1 - lo] + 1)
            cur[j - lo] = best
        if min(cur) > k:
            return None
        prev, lo_prev = cur, lo
    d = prev[lb - lo_prev] if 0 <= lb - lo_prev < len(prev) else inf
    return d if d <= k else None


def _variant_rows(batch: pa.Table, id_col: str, text_col: str, k: int,
                  max_len: int, side: int = 0) -> pa.Table:
    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    v_keys: list = []
    v_ids: list = []
    v_strs: list = []
    for i, s in zip(ids, texts):
        if i is None or s is None or len(s) > max_len:
            continue
        for v in _deletion_variants(s, k):
            v_keys.append(_h64(v))
            v_ids.append(i)
            v_strs.append(s)
    return pa.table({
        "vkey": pa.array(v_keys, pa.int64()),
        "doc": pa.array(v_ids, pa.int64()),
        "s": pa.array(v_strs, pa.string()),
        "side": pa.array(np.full(len(v_keys), side, np.int8), pa.int8()),
    })


def _bucket_pairs_kernel(k: int, max_bucket: int, cross_side: bool = False):
    """Partition kernel: group rows by vkey, verify bucket pairs with the
    banded DP, emit locally-deduped (doc_a, doc_b, dist) rows. With
    ``cross_side`` only (side 0, side 1) pairs are emitted, ordered
    (left id, right id) instead of (min, max)."""
    import pandas as pd

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        vkey = pdf["vkey"].to_numpy()
        docs = pdf["doc"].to_numpy()
        strs = pdf["s"].tolist()
        sides = pdf["side"].to_numpy()
        order = np.argsort(vkey, kind="stable")
        vk = vkey[order]
        bounds = np.flatnonzero(np.concatenate(([True], vk[1:] != vk[:-1])))
        bounds = np.append(bounds, len(vk))
        seen: dict = {}
        for bi in range(len(bounds) - 1):
            s0, e0 = bounds[bi], bounds[bi + 1]
            if e0 - s0 < 2 or e0 - s0 > max_bucket:
                continue
            idx = order[s0:e0]
            # same doc id can appear once per bucket only (variants are
            # deduped per string), so every in-bucket pair is distinct docs
            for x in range(len(idx)):
                ix = idx[x]
                dx, sx = int(docs[ix]), strs[ix]
                for y in range(x + 1, len(idx)):
                    iy = idx[y]
                    dy = int(docs[iy])
                    if cross_side:
                        if sides[ix] == sides[iy]:
                            continue
                        key = (dx, dy) if sides[ix] == 0 else (dy, dx)
                    else:
                        if dx == dy:
                            continue
                        key = (dx, dy) if dx < dy else (dy, dx)
                    if key in seen:
                        continue
                    d = _lev_banded(sx, strs[iy], k)
                    # record misses too: a pair re-found via another
                    # shared variant would re-verify otherwise
                    seen[key] = d
        hits = [(a, b, d) for (a, b), d in seen.items() if d is not None]
        if not hits:
            return _empty_pairs_df({"dist": "int64"})
        arr = np.asarray(hits, dtype=np.int64)
        return pd.DataFrame({"doc_a": arr[:, 0], "doc_b": arr[:, 1],
                             "dist": arr[:, 2]})

    return kernel


def fuzzy_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                k: int = 1, max_len: int = 256, max_bucket: int = 10_000,
                num_parts: Optional[int] = None):
    """All unordered row pairs with levenshtein(text_a, text_b) <= k.

    Exact (every qualifying pair is emitted, each exactly once) as long
    as no variant bucket exceeds ``max_bucket`` — a bucket that large
    means >max_bucket strings share one deletion variant, i.e. a
    quadratic true-pair neighborhood that exact output cannot avoid;
    run ``dedup.dedup_docs`` first to collapse identical strings.
    Rows with null or >``max_len``-char strings are ignored.
    """
    import ray.data as rd

    P = num_parts or default_num_parts()
    variants = ds.map_batches(
        lambda t: _variant_rows(t, id_col, text_col, k, max_len),
        batch_format="pyarrow")
    pairs = (add_hash_partition(variants, ["vkey"], P)
             .groupby("part")
             .map_groups(_bucket_pairs_kernel(k, max_bucket),
                         batch_format="pandas"))
    out = _distinct_pairs(pairs, extra_agg=("dist", "min", "dist"))

    def typed(t: pa.Table) -> pa.Table:
        return t.cast(_PAIRS_SCHEMA) if t.num_rows else \
            _PAIRS_SCHEMA.empty_table()

    # the union pins the schema even when every exchange partition came
    # back empty (Ray's empty sort partitions carry no schema)
    return (out.map_batches(typed, batch_format="pyarrow")
            .union(rd.from_arrow(_PAIRS_SCHEMA.empty_table())))


def fuzzy_join(left, right, id_col: str = "doc_id",
               text_col: str = "text", k: int = 1, max_len: int = 256,
               max_bucket: int = 10_000, num_parts: Optional[int] = None):
    """Fuzzy equi-join: every (left row, right row) pair whose strings are
    within Levenshtein ``k`` — the entity-resolution shape (catalog
    reconciliation, crawl-title matching, OCR-noise linking).

    Same machinery as ``fuzzy_pairs`` with the two sides tagged before
    the variant exchange; the partition kernel only pairs across sides,
    so the left and right id spaces stay independent. Returns
    (doc_a = left id, doc_b = right id, dist). Both sides accept the
    same ``id_col``/``text_col`` names (rename upstream otherwise).
    """
    import ray.data as rd

    P = num_parts or default_num_parts()
    lvar = left.map_batches(
        lambda t: _variant_rows(t, id_col, text_col, k, max_len, side=0),
        batch_format="pyarrow")
    rvar = right.map_batches(
        lambda t: _variant_rows(t, id_col, text_col, k, max_len, side=1),
        batch_format="pyarrow")
    pairs = (add_hash_partition(lvar.union(rvar), ["vkey"], P)
             .groupby("part")
             .map_groups(_bucket_pairs_kernel(k, max_bucket,
                                              cross_side=True),
                         batch_format="pandas"))
    out = _distinct_pairs(pairs, extra_agg=("dist", "min", "dist"))

    def typed(t: pa.Table) -> pa.Table:
        return t.cast(_PAIRS_SCHEMA) if t.num_rows else \
            _PAIRS_SCHEMA.empty_table()

    return (out.map_batches(typed, batch_format="pyarrow")
            .union(rd.from_arrow(_PAIRS_SCHEMA.empty_table())))
