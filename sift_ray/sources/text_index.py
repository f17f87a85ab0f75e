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


def _postings_batch(batch: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """One (term, doc_id, tf, dl) row per distinct (doc, word) — fully
    vectorized: split once, lexsort, run-length count."""
    import pyarrow.compute as pc

    from ..functions.corpus import _hash_word_array

    flat, parent = _flat_words(batch.column(text_col))
    if len(parent) == 0:
        return _POSTINGS_SCHEMA.empty_table()
    ids = pc.cast(batch.column(id_col), pa.int64()).to_numpy(
        zero_copy_only=False)
    wh = _hash_word_array(flat).astype(np.int64)
    dl = np.bincount(parent, minlength=batch.num_rows)
    order = np.lexsort((wh, parent))
    p_s, w_s = parent[order], wh[order]
    starts = np.flatnonzero(
        np.r_[True, (p_s[1:] != p_s[:-1]) | (w_s[1:] != w_s[:-1])])
    counts = np.diff(np.r_[starts, len(p_s)])
    pdoc = p_s[starts]
    return pa.Table.from_arrays([
        pa.array(w_s[starts], pa.int64()),
        pa.array(ids[pdoc], pa.int64()),
        pa.array(counts.astype(np.int64), pa.int64()),
        pa.array(dl[pdoc].astype(np.int64), pa.int64()),
    ], schema=_POSTINGS_SCHEMA)


def build_text_index(ds, out_dir: str, text_col: str = "text",
                     id_col: str = "doc_id", buckets: int = 64) -> dict:
    """Build (or resume building) the persistent index at ``out_dir``.

    One corpus pass explodes postings and routes them through the
    manifest-committed bucketed writer (term-hash % buckets, resumable at
    bucket granularity); ``N`` comes from the Dataset's metadata count
    (no data read) and the total token count from one columnar scan of
    the index's own ``tf`` column — the corpus text is read exactly once.
    Returns the meta dict."""
    import ray.data as rd

    from .bucketed import _bucket_paths, write_bucketed

    n_docs = ds.count()
    postings = ds.map_batches(
        lambda t: _postings_batch(t, text_col, id_col),
        batch_format="pyarrow")
    write_bucketed(postings, out_dir, key="term", buckets=buckets)

    paths = sorted(_bucket_paths(out_dir).values())
    n_tokens = int(rd.read_parquet(paths, columns=["tf"]).sum("tf") or 0) \
        if paths else 0
    meta = {"n_docs": int(n_docs), "n_tokens": n_tokens,
            "buckets": int(buckets), "key": "term"}
    tmp = os.path.join(out_dir, _META_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(out_dir, _META_NAME))
    return meta


def append_text_index(delta_ds, out_dir: str, ingest_id: str,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> dict:
    """EXACTLY-ONCE incremental index maintenance: new documents' postings
    ride ``append_bucketed``'s per-bucket ingest-id ledger (replays are
    manifest no-ops), then the corpus stats in ``index_meta.json`` are
    advanced under the same ingest id — the continuously-arriving-crawl
    shape: the index never rebuilds, queries stay bucket-pruned over the
    merged postings. Stats order: postings commit first, meta last, so a
    crash between them retries safely (bucket ledger skips, meta applies).
    """
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

    new_tokens = int(delta_ds.map_batches(tokc, batch_format="pyarrow")
                     .aggregate(Sum("n"))["sum(n)"] or 0)

    postings = delta_ds.map_batches(
        lambda t: _postings_batch(t, text_col, id_col),
        batch_format="pyarrow")
    append_bucketed(postings, out_dir, key="term", ingest_id=ingest_id)

    meta["n_docs"] += int(n_new)
    meta["n_tokens"] += new_tokens
    meta["ingests"] = meta.get("ingests", []) + [ingest_id]
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, meta_path)
    return meta


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
    th = np.sort(_hash_word_array(pa.array(terms, pa.string()))
                 .astype(np.int64))
    matches = read_bucketed(out_dir, key_values=th.tolist(), key="term",
                            buckets=meta["buckets"]).materialize()

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
