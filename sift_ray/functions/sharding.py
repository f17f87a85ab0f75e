"""Token-budget shard assignment — the distributed ordered PREFIX SUM.

A training pipeline packs documents into shards of ~N tokens each, in a
deterministic document order. That is a cumulative sum over a distributed
dataset, which Ray Data has no primitive for; this implements the classic
two-pass scan:

1. range-partition rows by the order key (``part = doc_id // range_size``
   — partition index increases with the key, so partitions are ordered);
2. pass 1: per-partition token sums (tiny: one int per partition) are
   collected and exclusive-prefix-summed on the driver — P values, not
   corpus data;
3. pass 2: each partition sorts its own rows by the key, cumsums locally,
   and adds its global offset. shard_id = starting_offset // shard_tokens.

Everything heavy stays distributed and vectorized; the driver handles only
P integers. Assumes the order key is integer-valued (dense or sparse both
work — range partitioning only needs monotonicity of part in key).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .shuffle import default_num_parts

# whitespace-delimited token counting, identical to the SQL oracle's
# len(regexp_extract_all(text, '[^ \t\n\r\f\v]+')) and to textstats
_WORD_PATTERN = r"[^ \t\n\r\f\v]+"


def token_shards(ds, shard_tokens: int = 100_000, text_col: str = "text",
                 id_col: str = "doc_id", num_parts: Optional[int] = None):
    """(doc_id, n_tokens, start_offset, shard_id) per document: documents
    are packed into shards of ``shard_tokens`` whitespace tokens in
    ``id_col`` order. shard_id = (exclusive prefix sum of n_tokens) //
    shard_tokens — a document starting inside shard k belongs to shard k.
    """
    def count_tokens(batch: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(batch.column(text_col),
                                             _WORD_PATTERN), pa.int64())
        return pa.table({id_col: batch.column(id_col), "n_tokens": n})

    # materialize the (id, count) int rows ONCE: they feed the max, the
    # partial-sum pass, and the scan — a lazy dataset would re-execute the
    # whole upstream lineage (read + count) for each
    counted = ds.map_batches(count_tokens,
                             batch_format="pyarrow").materialize()

    # ordered range partitioning: part increases with the key
    max_id = counted.max(id_col)
    if max_id is None:  # empty input: no rows to shard (typed empty result)
        import ray.data as rd
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "start_offset": pa.array([], pa.int64()),
            "shard_id": pa.array([], pa.int64())}))
    P = num_parts or default_num_parts()
    range_size = max(1, (int(max_id) + P) // P)

    def add_part(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        part = (ids // range_size).astype(np.int64)
        return batch.append_column("part", pa.array(part, pa.int64()))

    parted = counted.map_batches(add_part, batch_format="pyarrow")

    # pass 1: per-partition sums -> driver exclusive prefix (P integers)
    sums = {}
    for batch in (parted.map_batches(
            lambda t: t.select(["part", "n_tokens"])
                       .group_by(["part"]).aggregate([("n_tokens", "sum")]),
            batch_format="pyarrow")
            .iter_batches(batch_size=65536, batch_format="pyarrow")):
        for p, s in zip(batch.column("part").to_pylist(),
                        batch.column("n_tokens_sum").to_pylist()):
            sums[p] = sums.get(p, 0) + s
    offsets = {}
    acc = 0
    for p in sorted(sums):
        offsets[p] = acc
        acc += sums[p]
    # offsets is P integers — closure capture IS the broadcast

    # pass 2: partition-local ordered cumsum + global offset
    def scan(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        toks = tbl.column("n_tokens").to_numpy(zero_copy_only=False)
        part = int(tbl.column("part")[0].as_py())
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        toks = toks[order]
        start = np.cumsum(toks) - toks + np.int64(offsets.get(part, 0))
        shard = start // np.int64(shard_tokens)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_tokens": pa.array(toks, pa.int64()),
            "start_offset": pa.array(start.astype(np.int64), pa.int64()),
            "shard_id": pa.array(shard.astype(np.int64), pa.int64()),
        })

    return parted.groupby("part").map_groups(scan, batch_format="pyarrow")


def global_rank(ds, value_col: str, id_col: str = "doc_id",
                descending: bool = True,
                num_parts: Optional[int] = None):
    """Exact global row numbers under a total order — SQL
    ``row_number() OVER (ORDER BY value [DESC], id ASC)`` at corpus
    scale (leaderboards, deterministic take-top-N% curation cuts).

    Same two-pass shape as the token prefix sum, but range-partitioned
    by the VALUE: part = (v - min) // range_size keeps each partition a
    contiguous value range (equal values co-locate, so the id tiebreak
    is partition-local); pass 1 collects one ROW COUNT per partition and
    exclusive-prefix-sums them on the driver in rank order (P integers);
    pass 2 sorts each partition by (value, id) and adds its offset.
    Integer values only. A single value held by a large fraction of the
    corpus concentrates in one partition — the usual range-partition
    skew caveat; pre-bucket such columns or rank on (value, salt).

    Returns (id, value, global_rank) with rank starting at 1.
    """
    # strip schema metadata: pandas-written parquet carries a b"pandas"
    # entry that makes pa.Schema unhashable (Ray's sort reduce then logs
    # "Failed to hash the schemas" per task)
    counted = ds.map_batches(
        lambda t: t.select([id_col, value_col])
                   .replace_schema_metadata(None),
        batch_format="pyarrow").materialize()

    vmax, vmin = counted.max(value_col), counted.min(value_col)
    if vmax is None:
        import ray.data as rd
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            value_col: pa.array([], pa.int64()),
            "global_rank": pa.array([], pa.int64())}))
    P = num_parts or default_num_parts()
    range_size = max(1, (int(vmax) - int(vmin) + P) // P)

    def add_part(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        part = ((v - np.int64(int(vmin))) // range_size).astype(np.int64)
        return batch.append_column("part", pa.array(part, pa.int64()))

    parted = counted.map_batches(add_part, batch_format="pyarrow")

    counts: dict = {}
    for batch in (parted.map_batches(
            lambda t: t.select(["part"]).group_by(["part"])
                       .aggregate([([], "count_all")]),
            batch_format="pyarrow")
            .iter_batches(batch_size=65536, batch_format="pyarrow")):
        for p, c in zip(batch.column("part").to_pylist(),
                        batch.column("count_all").to_pylist()):
            counts[p] = counts.get(p, 0) + c
    offsets = {}
    acc = 0
    for p in sorted(counts, reverse=descending):
        offsets[p] = acc
        acc += counts[p]

    def scan(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        v = tbl.column(value_col).to_numpy(zero_copy_only=False)
        part = int(tbl.column("part")[0].as_py())
        key = -v if descending else v
        order = np.lexsort((ids, key))
        rank = (np.arange(len(ids), dtype=np.int64) + 1
                + np.int64(offsets.get(part, 0)))
        return pa.table({
            id_col: pa.array(ids[order], pa.int64()),
            value_col: pa.array(v[order], pa.int64()),
            "global_rank": pa.array(rank, pa.int64()),
        })

    return parted.groupby("part").map_groups(scan, batch_format="pyarrow")
