"""Persistent TERM-PARTITIONED inverted index over a document corpus.

The query-time complement of ``corpus.bm25_topk`` (which streams the
whole corpus per query): pay the term exchange ONCE at build time —
postings (term, doc_id, tf, dl) land in bucket ``hash(term) % B`` through
the resumable bucketed-parquet writer — then EVERY query reads only the
``<= |query|`` buckets its terms hash to. A point lookup on a 100 TB
corpus touches |q|/B of the index instead of the corpus: the storage-side
analog of predicate pushdown, built on ``sources.bucketed``.

Exactness: tokenization (split on single space, drop empties), the word
hash, the BM25 float expression and the integer-micro quantization all
mirror ``bm25_topk`` token-for-token, so ``query_text_index`` is
oracle-exact against the same DuckDB SQL. Corpus stats that postings
alone cannot carry (N counts empty documents too) are computed at build
time — N via the parquet-metadata row count, total token count via one
columnar pass over the index's own ``tf`` column — and stored in
``index_meta.json``.

Scale shape per query: bucket-pruned read -> map-side ``is_in`` term
filter (already applied by ``read_bucketed``) -> per-batch df partials
folded by a tree aggregate (driver sees |q| ints) -> vectorized
per-posting score -> ONE doc-keyed exchange summing cross-bucket partial
scores -> per-batch local top-k -> bounded driver merge. A hot term
("the") makes its bucket large, but df/score stay vectorized streaming
passes — nothing is collected.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

_META_NAME = "index_meta.json"


def _flat_words(text_col_arr):
    """(flat word array, parent row indices) — bm25_topk's tokenization:
    split on a single space, drop empty strings."""
    import pyarrow.compute as pc

    splits = pc.split_pattern(pc.coalesce(text_col_arr, ""), " ")
    if isinstance(splits, pa.ChunkedArray):
        splits = splits.combine_chunks()
    flat = pc.list_flatten(splits)
    parent = pc.list_parent_indices(splits).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return flat.filter(pa.array(keep)), parent[keep]


_POSTINGS_SCHEMA = pa.schema([
    ("term", pa.int64()),    # 64-bit word hash (blake2b, top bit dropped)
    ("doc_id", pa.int64()),
    ("tf", pa.int64()),      # term frequency in the doc
    ("dl", pa.int64()),      # the doc's total word count (replicated)
])

_POSITIONAL_SCHEMA = _POSTINGS_SCHEMA.append(
    pa.field("pos", pa.binary()))  # sorted uint32 token positions (blob)


def _postings_batch(batch: pa.Table, text_col: str, id_col: str,
                    positional: bool = False) -> pa.Table:
    """One (term, doc_id, tf, dl[, pos]) row per distinct (doc, word) —
    fully vectorized: split once, lexsort, run-length count. With
    ``positional`` each row carries the word's sorted 0-based token
    positions (within the empty-dropped token sequence) as a uint32
    blob — the phrase-query payload."""
    import pyarrow.compute as pc

    from ..functions.corpus import _hash_word_array

    schema = _POSITIONAL_SCHEMA if positional else _POSTINGS_SCHEMA
    flat, parent = _flat_words(batch.column(text_col))
    if len(parent) == 0:
        return schema.empty_table()
    ids = pc.cast(batch.column(id_col), pa.int64()).to_numpy(
        zero_copy_only=False)
    wh = _hash_word_array(flat).astype(np.int64)
    dl = np.bincount(parent, minlength=batch.num_rows)
    # 0-based token position within each doc's (empty-dropped) sequence
    tok_pos = np.arange(len(parent), dtype=np.int64)
    doc_starts = np.flatnonzero(np.r_[True, parent[1:] != parent[:-1]])
    tok_pos = tok_pos - np.repeat(tok_pos[doc_starts],
                                  np.diff(np.r_[doc_starts, len(parent)]))
    order = np.lexsort((tok_pos, wh, parent))
    p_s, w_s, t_s = parent[order], wh[order], tok_pos[order]
    starts = np.flatnonzero(
        np.r_[True, (p_s[1:] != p_s[:-1]) | (w_s[1:] != w_s[:-1])])
    counts = np.diff(np.r_[starts, len(p_s)])
    pdoc = p_s[starts]
    arrays = [
        pa.array(w_s[starts], pa.int64()),
        pa.array(ids[pdoc], pa.int64()),
        pa.array(counts.astype(np.int64), pa.int64()),
        pa.array(dl[pdoc].astype(np.int64), pa.int64()),
    ]
    if positional:
        ends = np.r_[starts[1:], len(p_s)]
        blobs = [t_s[s:e].astype(np.uint32).tobytes()
                 for s, e in zip(starts, ends)]
        arrays.append(pa.array(blobs, pa.binary()))
    return pa.Table.from_arrays(arrays, schema=schema)


def build_text_index(ds, out_dir: str, text_col: str = "text",
                     id_col: str = "doc_id", buckets: int = 64,
                     positional: bool = False) -> dict:
    """Build (or resume building) the persistent index at ``out_dir``.

    One corpus pass explodes postings and routes them through the
    manifest-committed bucketed writer (term-hash % buckets, resumable at
    bucket granularity); ``N`` comes from the Dataset's metadata count
    (no data read) and the total token count from one columnar scan of
    the index's own ``tf`` column — the corpus text is read exactly once.
    Returns the meta dict."""
    import ray.data as rd

    from .bucketed import _bucket_files, write_bucketed

    n_docs = ds.count()
    postings = ds.map_batches(
        lambda t: _postings_batch(t, text_col, id_col, positional),
        batch_format="pyarrow")
    write_bucketed(postings, out_dir, key="term", buckets=buckets)

    # _bucket_files: a re-run over a delta-maintained index must resume
    # (and count tf over every listed file), not assert on delta files
    paths = sorted(p for fs in _bucket_files(out_dir).values() for p in fs)
    n_tokens = int(rd.read_parquet(paths, columns=["tf"]).sum("tf") or 0) \
        if paths else 0
    meta = {"n_docs": int(n_docs), "n_tokens": n_tokens,
            "buckets": int(buckets), "key": "term",
            "positional": bool(positional)}
    tmp = os.path.join(out_dir, _META_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(out_dir, _META_NAME))
    return meta


def append_text_index(delta_ds, out_dir: str, ingest_id: str,
                      text_col: str = "text",
                      id_col: str = "doc_id", mode: str = "merge") -> dict:
    """EXACTLY-ONCE incremental index maintenance: new documents' postings
    ride ``append_bucketed``'s per-bucket ingest-id ledger (replays are
    manifest no-ops), then the corpus stats in ``index_meta.json`` are
    advanced under the same ingest id — the continuously-arriving-crawl
    shape: the index never rebuilds, queries stay bucket-pruned over the
    merged postings. Stats order: postings commit first, meta last, so a
    crash between them retries safely (bucket ledger skips, meta applies).

    ``mode="delta"`` makes the ingest O(delta) — postings land as
    per-ingest files listed in each bucket's manifest record instead of
    rewriting the bucket (``bucketed.append_bucketed`` delta semantics);
    queries concat the listed files, and ``bucketed.compact_bucketed``
    folds them when the small-file count warrants it."""
    from ray.data.aggregate import Sum

    from .bucketed import append_bucketed

    meta_path = os.path.join(out_dir, _META_NAME)
    with open(meta_path) as f:
        meta = json.load(f)
    if ingest_id in meta.get("ingests", []):
        return meta  # full replay: nothing to do

    n_new = delta_ds.count()

    # delta token count: one vectorized pass over the delta text
    def tokc(t: pa.Table) -> pa.Table:
        _, parent = _flat_words(t.column(text_col))
        return pa.table({"n": [int(len(parent))]})

    # Ray 2.49: aggregate over a fully-empty dataset returns None
    _agg = delta_ds.map_batches(tokc, batch_format="pyarrow") \
        .aggregate(Sum("n")) or {}
    new_tokens = int(_agg.get("sum(n)") or 0)

    positional = bool(meta.get("positional", False))
    postings = delta_ds.map_batches(
        lambda t: _postings_batch(t, text_col, id_col, positional),
        batch_format="pyarrow")
    append_bucketed(postings, out_dir, key="term", ingest_id=ingest_id,
                    mode=mode)

    meta["n_docs"] += int(n_new)
    meta["n_tokens"] += new_tokens
    meta["ingests"] = meta.get("ingests", []) + [ingest_id]
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, meta_path)
    return meta


def phrase_query(out_dir: str, phrase_terms: Sequence[str],
                 num_parts: Optional[int] = None):
    """Exact phrase search over a POSITIONAL index: documents where the
    terms appear as consecutive tokens (in the empty-dropped whitespace
    token sequence), with occurrence counts. Returns (doc_id, n_matches)
    ordered by doc_id.

    Scale shape: bucket-pruned read of the <= |phrase| term buckets ->
    ONE doc-keyed exchange of the (term slot, positions blob) rows ->
    partition-local vectorized position intersection (np.isin chain:
    start positions p where p+i is in term i's positions for every i).
    A phrase occurrence count per doc is exact; docs missing any term
    die in the kernel."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ..functions.corpus import _hash_word_array
    from ..functions.shuffle import add_hash_partition, default_num_parts

    with open(os.path.join(out_dir, _META_NAME)) as f:
        meta = json.load(f)
    assert meta.get("positional"), \
        "phrase_query needs an index built with positional=True"
    terms = list(phrase_terms)
    n_terms = len(terms)
    th = _hash_word_array(pa.array(terms, pa.string())).astype(np.int64)
    th_sorted = np.unique(th)

    _empty = pa.schema([("doc_id", pa.int64()),
                        ("n_matches", pa.int64())]).empty_table()

    from .bucketed import read_bucketed
    matches = read_bucketed(out_dir, key_values=th_sorted.tolist(),
                            key="term", buckets=meta["buckets"]) \
        .materialize()  # feeds count + tag; avoid a second bucket read
    # typed early return: a fully-empty Dataset loses its schema in Ray
    # 2.49 (to_pandas would yield a 0-column frame downstream)
    if matches.count() == 0:
        return rd.from_arrow(_empty)

    _tag_empty = pa.schema([("doc_id", pa.int64()), ("slot", pa.int32()),
                            ("pos", pa.binary())]).empty_table()

    def tag(t: pa.Table) -> pa.Table:
        # one row per PHRASE SLOT (a repeated term replicates its rows,
        # so every slot gets its position set)
        tcol = t.column("term").to_numpy(zero_copy_only=False)
        parts = [_tag_empty]
        for i, h in enumerate(th.tolist()):
            mask = tcol == h
            if mask.any():
                sub = t.filter(pa.array(mask))
                parts.append(pa.table({
                    "doc_id": pc.cast(sub.column("doc_id"), pa.int64()),
                    "slot": pa.array(
                        np.full(sub.num_rows, i, np.int32), pa.int32()),
                    "pos": sub.column("pos"),
                }))
        return pa.concat_tables(parts)

    P = num_parts or default_num_parts()
    parted = add_hash_partition(
        matches.map_batches(tag, batch_format="pyarrow"), ["doc_id"], P)

    def kernel(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        slots = t.column("slot").to_numpy(zero_copy_only=False)
        blobs = t.column("pos").to_pylist()
        order = np.argsort(ids, kind="stable")
        out_ids, out_n = [], []
        i = 0
        n = len(order)
        while i < n:
            j = i
            pos_by_slot: dict = {}
            doc = ids[order[i]]
            while j < n and ids[order[j]] == doc:
                r = order[j]
                pos_by_slot[int(slots[r])] = np.frombuffer(
                    blobs[r], dtype=np.uint32).astype(np.int64)
                j += 1
            i = j
            if len(pos_by_slot) < n_terms:
                continue
            cand = pos_by_slot[0]
            for s in range(1, n_terms):
                if cand.size == 0:
                    break
                cand = cand[np.isin(cand + s, pos_by_slot[s],
                                    assume_unique=True)]
            if cand.size:
                out_ids.append(int(doc))
                out_n.append(int(cand.size))
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                         "n_matches": pa.array(out_n, pa.int64())})

    out = parted.groupby("part").map_groups(kernel, batch_format="pyarrow")
    return out.sort("doc_id")


def query_text_index(out_dir: str, query_terms: Sequence[str], k: int = 20,
                     k1: float = 1.2, b: float = 0.75,
                     num_parts: Optional[int] = None, mode: str = "or"):
    """BM25 top-k over the persistent index: reads ONLY the buckets the
    query terms hash to. Returns (doc_id, score_micro) ordered score
    DESC, doc_id ASC — identical to ``bm25_topk`` on the same corpus.

    ``mode="and"`` keeps only documents containing EVERY query term
    (conjunctive retrieval): a doc's posting rows in the match set are
    one per distinct matched term, so the same doc-keyed exchange that
    sums scores also counts matched terms — no extra pass."""
    import math

    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.corpus import _hash_word_array
    from ..functions.shuffle import partitioned_group_agg
    from .bucketed import read_bucketed

    with open(os.path.join(out_dir, _META_NAME)) as f:
        meta = json.load(f)
    N, toks = meta["n_docs"], meta["n_tokens"]
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "score_micro": pa.array([], pa.int64())})
    if N == 0 or toks == 0:
        return rd.from_arrow(empty)

    terms = list(query_terms)
    if len(set(terms)) != len(terms):
        # bm25_topk documents the same precondition; a repeated term
        # would silently score once here but twice in the streaming scan
        raise ValueError("query_text_index: query terms must be distinct")
    th = np.sort(_hash_word_array(pa.array(terms, pa.string()))
                 .astype(np.int64))
    matches = read_bucketed(out_dir, key_values=th.tolist(), key="term",
                            buckets=meta["buckets"]).materialize()
    # typed early return (Ray 2.49 empty datasets lose their schema and
    # Dataset.aggregate returns None): no term has any posting
    if matches.count() == 0:
        return rd.from_arrow(empty)

    # df per term: per-batch partial counts -> tree aggregate (|q| ints)
    def df_partials(t: pa.Table) -> pa.Table:
        tcol = t.column("term").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(th, tcol)
        return pa.table({f"df{i}": [int(np.sum(idx == i))]
                         for i in range(len(th))})

    agg = matches.map_batches(df_partials, batch_format="pyarrow") \
        .aggregate(*[Sum(f"df{i}") for i in range(len(th))])
    dfs = [int(agg[f"sum(df{i})"] or 0) for i in range(len(th))]
    avgdl = toks / N
    idf = np.array([math.log((N - df + 0.5) / (df + 0.5) + 1.0)
                    for df in dfs])

    def score(batch: pa.Table) -> pa.Table:
        tcol = batch.column("term").to_numpy(zero_copy_only=False)
        tf = batch.column("tf").to_numpy(zero_copy_only=False).astype(
            np.float64)
        dl = batch.column("dl").to_numpy(zero_copy_only=False).astype(
            np.float64)
        w = idf[np.searchsorted(th, tcol)]
        # identical float expression + per-term rounding as bm25_topk, so
        # cross-bucket int sums reproduce its per-doc totals exactly
        s = np.round(w * (tf * (k1 + 1))
                     / (tf + k1 * (1 - b + b * dl / avgdl)) * 1e6)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "s": pa.array(s.astype(np.int64), pa.int64()),
        })

    per_doc = partitioned_group_agg(
        matches.map_batches(score, batch_format="pyarrow"),
        ["doc_id"], [("s", "sum", "score_micro"),
                     (None, "count", "n_terms")], num_parts=num_parts)
    if mode == "and":
        import pyarrow.compute as pc
        n_all = len(terms)
        per_doc = per_doc.map_batches(
            lambda t: t.filter(pc.equal(t.column("n_terms"), n_all)),
            batch_format="pyarrow")
    per_doc = per_doc.map_batches(
        lambda t: t.select(["doc_id", "score_micro"]),
        batch_format="pyarrow")

    def local_topk(t: pa.Table) -> pa.Table:
        pdf = t.to_pandas().sort_values(["score_micro", "doc_id"],
                                        ascending=[False, True]).head(k)
        return pa.Table.from_pandas(pdf, preserve_index=False)

    cands = pa.concat_tables(
        [empty] + list(per_doc.map_batches(local_topk,
                                           batch_format="pyarrow")
                       .iter_batches(batch_size=None,
                                     batch_format="pyarrow"))).to_pandas()
    out = cands.sort_values(["score_micro", "doc_id"],
                            ascending=[False, True]).head(k)
    return rd.from_arrow(pa.Table.from_pandas(out.reset_index(drop=True),
                                              preserve_index=False))
