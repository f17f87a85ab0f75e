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

from .shuffle import add_hash_partition, default_num_parts

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


def pack_sequences(ds, seq_len: int = 256, eos: str = "</s>",
                   text_col: str = "text", id_col: str = "doc_id",
                   num_parts: Optional[int] = None,
                   drop_partial: bool = True):
    """GPT-style sequence packing: concatenate every document's whitespace
    tokens (plus one ``eos`` token per document) in ``id_col`` order and cut
    the stream into fixed ``seq_len``-token training sequences. Returns
    (seq_id, n_tokens, text) with text = the sequence's tokens joined by
    single spaces; the trailing partial sequence is dropped unless
    ``drop_partial=False``.

    Scale shape — the packer is inherently a repartition-by-position op, done
    in two exchanges and zero driver data:
    1. a cheap int-only pass counts tokens per doc (+1 EOS) and the
       two-pass ordered prefix sum (same machinery as ``token_shards``)
       yields each range partition's global token offset — the driver
       holds P integers;
    2. docs ride ONE range exchange (part increases with doc_id); each
       partition walks its docs in id order and slices them into
       sequence-aligned FRAGMENTS (a doc spanning a boundary splits),
       emitting (seq_id, pos, frag_text, n) rows;
    3. fragments ride ONE hash exchange keyed on seq_id; each partition
       stitches its sequences (sort by pos, join with ' ').
    Token text moves exactly twice; no stage holds more than a partition.
    """
    import re

    import ray.data as rd

    tok_re = re.compile(_WORD_PATTERN)

    def count_tokens(batch: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(batch.column(text_col),
                                             _WORD_PATTERN), pa.int64())
        return pa.table({id_col: batch.column(id_col),
                         "n_tokens": pc.add(n, 1)})  # +1 = the EOS token

    counted = ds.map_batches(count_tokens,
                             batch_format="pyarrow").materialize()
    max_id = counted.max(id_col)
    empty = pa.table({"seq_id": pa.array([], pa.int64()),
                      "n_tokens": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    if max_id is None:
        return rd.from_arrow(empty)
    P = num_parts or default_num_parts()
    range_size = max(1, (int(max_id) + P) // P)

    def add_part_ints(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        part = (ids // range_size).astype(np.int64)
        return batch.append_column("part", pa.array(part, pa.int64()))

    # pass 1: P per-partition token sums -> driver exclusive prefix
    sums: dict = {}
    for batch in (counted.map_batches(add_part_ints, batch_format="pyarrow")
                  .map_batches(
                      lambda t: t.select(["part", "n_tokens"])
                                 .group_by(["part"])
                                 .aggregate([("n_tokens", "sum")]),
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

    def add_part_docs(batch: pa.Table) -> pa.Table:
        sub = batch.select([id_col, text_col])
        ids = sub.column(id_col).to_numpy(zero_copy_only=False)
        part = (ids // range_size).astype(np.int64)
        return sub.append_column("part", pa.array(part, pa.int64()))

    parted = ds.map_batches(add_part_docs, batch_format="pyarrow")

    frag_schema = pa.schema([("seq_id", pa.int64()), ("pos", pa.int64()),
                             ("frag", pa.string()), ("n", pa.int64())])

    def frag_kernel(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        texts = tbl.column(text_col).to_pylist()
        part = int(tbl.column("part")[0].as_py())
        order = np.argsort(ids, kind="stable")
        pos = int(offsets.get(part, 0))
        out_seq: list = []
        out_pos: list = []
        out_txt: list = []
        out_n: list = []
        for i in order.tolist():
            toks = tok_re.findall(texts[i] or "")
            toks.append(eos)
            n = len(toks)
            s = 0
            while s < n:
                seq_id = (pos + s) // seq_len
                e = min(n, (seq_id + 1) * seq_len - pos)
                out_seq.append(seq_id)
                out_pos.append(pos + s)
                out_txt.append(" ".join(toks[s:e]))
                out_n.append(e - s)
                s = e
            pos += n
        return pa.table({"seq_id": pa.array(out_seq, pa.int64()),
                         "pos": pa.array(out_pos, pa.int64()),
                         "frag": pa.array(out_txt, pa.string()),
                         "n": pa.array(out_n, pa.int64())},
                        schema=frag_schema)

    frags = parted.groupby("part").map_groups(frag_kernel,
                                              batch_format="pyarrow")
    total = acc  # stream length in tokens (exact, from pass 1)

    def assemble(tbl: pa.Table) -> pa.Table:
        t = tbl.take(pc.sort_indices(
            tbl, sort_keys=[("seq_id", "ascending"), ("pos", "ascending")]))
        sid = t.column("seq_id").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        txt = t.column("frag").to_pylist()
        bounds = np.flatnonzero(np.diff(sid)) + 1
        starts = np.concatenate(([0], bounds)).astype(np.int64)
        ends = np.concatenate((bounds, [len(sid)])).astype(np.int64)
        out_id, out_n, out_txt = [], [], []
        for s, e in zip(starts.tolist(), ends.tolist()):
            ntok = int(n[s:e].sum())
            if drop_partial and ntok < seq_len:
                continue
            out_id.append(int(sid[s]))
            out_n.append(ntok)
            out_txt.append(" ".join(txt[s:e]))
        return pa.table({"seq_id": pa.array(out_id, pa.int64()),
                         "n_tokens": pa.array(out_n, pa.int64()),
                         "text": pa.array(out_txt, pa.string())})

    if total < seq_len and drop_partial:
        return rd.from_arrow(empty)
    return (add_hash_partition(frags, ["seq_id"], P)
            .groupby("part").map_groups(assemble, batch_format="pyarrow"))


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


def ntile_assign(ds, value_col: str, n_tiles: int = 3,
                 id_col: str = "doc_id", descending: bool = True,
                 num_parts: Optional[int] = None):
    """Exact distributed SQL ``NTILE(n) OVER (ORDER BY value [DESC],
    id ASC)`` — the equi-depth bucketing step (CCNet head/middle/tail
    perplexity buckets, equi-depth histograms, curriculum cuts).

    Built on ``global_rank`` (two-pass range-partitioned prefix count;
    driver holds P integers plus one row count); tiles follow the SQL
    rule exactly — N = q*n + r rows gives the first r tiles q+1 rows and
    the rest q. Returns (id, value, tile) with tile in 1..n_tiles.
    """
    ranked = global_rank(ds, value_col, id_col=id_col,
                         descending=descending,
                         num_parts=num_parts).materialize()
    N = ranked.count()
    if N == 0:
        import ray.data as rd
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            value_col: pa.array([], pa.int64()),
            "tile": pa.array([], pa.int64())}))
    q, r = divmod(N, n_tiles)
    big = r * (q + 1)  # ranks 1..big live in the q+1-sized tiles

    def tile(batch: pa.Table) -> pa.Table:
        rank = batch.column("global_rank").to_numpy(zero_copy_only=False)
        if q == 0:  # fewer rows than tiles: NTILE gives tile == rank
            t = rank
        else:
            in_big = rank <= big
            t = np.where(in_big, (rank - 1) // (q + 1) + 1,
                         r + (rank - 1 - big) // max(q, 1) + 1)
        return pa.table({
            id_col: batch.column(id_col),
            value_col: batch.column(value_col),
            "tile": pa.array(t.astype(np.int64), pa.int64()),
        })

    return ranked.map_batches(tile, batch_format="pyarrow")


def write_shard_files(docs, shards, out_dir: str, groups: int = 16,
                      text_col: str = "text", id_col: str = "doc_id",
                      num_parts: Optional[int] = None):
    """Materialize packed training shards as PHYSICAL parquet files —
    the step after ``token_shards`` assigns (doc_id, shard_id): a
    trainer streams ``out_dir/part-{g:05d}/shard-{id:012d}.parquet``
    files, each holding its shard's documents in pack order.

    Scale shape: the docs table joins the shard-assignment table on
    doc_id through the distributed ``hash_join`` (ONE key exchange),
    then rows ride one more exchange keyed on ``shard_id % groups`` so
    every output group is written by exactly one task. Each group task
    sorts its rows by (shard_id, start_offset), writes one parquet file
    per shard into the group's temp dir, and COMMITS the group through
    the manifest protocol (atomic dir rename + manifest row) — so a
    restarted job skips committed groups map-side before the join
    exchange, and a retried task observes the commit and no-ops.
    Commit-by-rename assumes the shared filesystem / object store the
    whole manifest protocol targets (same as ``run_extract_job``).

    Returns the manifest summary dict (plus per-group rows under
    ``"groups"``). Deterministic: file contents are a pure function of
    the input tables, independent of partitioning.
    """
    import os

    import pyarrow.parquet as pq

    from ..state.manifest import Manifest
    from .shuffle import hash_join

    manifest = Manifest(out_dir)
    done = np.array(sorted(g for g in range(groups)
                           if manifest.is_done(g)), dtype=np.int64)

    if len(done) < groups:
        joined = hash_join(docs, shards, on=id_col, how="inner",
                           num_parts=num_parts)

        def add_group(t: pa.Table) -> pa.Table:
            g = (t.column("shard_id").to_numpy(zero_copy_only=False)
                 % np.int64(groups)).astype(np.int64)
            keep = ~np.isin(g, done)
            t = t.append_column("part", pa.array(g, pa.int64()))
            return t.filter(pa.array(keep))

        def write_group(t: pa.Table) -> pa.Table:
            g = int(t.column("part")[0].as_py())
            stats_schema = pa.schema([
                ("grp", pa.int64()), ("n_shards", pa.int64()),
                ("n_docs", pa.int64()), ("n_tokens", pa.int64())])
            m = Manifest(out_dir)
            if m.is_done(g):  # task retry after commit: no-op
                return stats_schema.empty_table()
            m.cleanup_tmp(g)
            tmp = m.tmp_partition_dir(g)
            os.makedirs(tmp, exist_ok=True)
            t = t.drop_columns("part")
            t = t.take(pc.sort_indices(
                t, sort_keys=[("shard_id", "ascending"),
                              ("start_offset", "ascending")]))
            sid = t.column("shard_id").to_numpy(zero_copy_only=False)
            bounds = np.flatnonzero(np.diff(sid)) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [len(sid)]))
            for s, e in zip(starts, ends):
                shard = t.slice(s, e - s)
                pq.write_table(
                    shard,
                    os.path.join(tmp, f"shard-{int(sid[s]):012d}.parquet"))
            n_tok = int(pc.sum(t.column("n_tokens")).as_py() or 0)
            m.commit_partition(g, {
                "n_shards": int(len(starts)), "n_docs": t.num_rows,
                "n_tokens": n_tok})
            return pa.table({
                "grp": pa.array([g], pa.int64()),
                "n_shards": pa.array([len(starts)], pa.int64()),
                "n_docs": pa.array([t.num_rows], pa.int64()),
                "n_tokens": pa.array([n_tok], pa.int64())},
                schema=stats_schema)

        (joined.map_batches(add_group, batch_format="pyarrow")
         .groupby("part").map_groups(write_group, batch_format="pyarrow")
         .materialize())

        # groups that received no shards never ran a task: commit them
        # empty so the next call is a pure manifest read (instant resume)
        for g in range(groups):
            if not manifest.is_done(g):
                os.makedirs(manifest.tmp_partition_dir(g), exist_ok=True)
                manifest.commit_partition(
                    g, {"n_shards": 0, "n_docs": 0, "n_tokens": 0})

    out = manifest.summary()
    out["groups"] = manifest.records()
    return out


def seeded_shuffle(ds, seed: int = 42, id_col: str = "doc_id",
                   num_parts: Optional[int] = None):
    """Deterministic seeded GLOBAL shuffle: every row gets its position in
    the permutation ordered by ``md5(f"{seed}:{id}")`` — the reproducible
    corpus shuffle a training run needs before sequence packing (same
    seed = same order on any cluster shape, any partitioning, any retry).

    Same two-pass scan as ``token_shards``: the hex key's first 16 bits
    range-partition monotonically (lowercase-hex prefix order == string
    order), pass 1 collects P row-counts on the driver, pass 2 sorts each
    partition by key and adds its exclusive offset. One exchange;
    the driver holds P integers. Requires unique ids (md5 rank ties are
    undefined). Returns (id_col, shuffle_pos). Oracle-exact vs SQL
    ``row_number() OVER (ORDER BY md5(...))``."""
    import hashlib

    import ray.data as rd

    P = num_parts or default_num_parts()

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        keys = [hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
                for i in ids]
        part = np.array([int(k[:4], 16) * P // 65536 for k in keys],
                        np.int64)
        return pa.table({
            id_col: pc.cast(batch.column(id_col), pa.int64()),
            "skey": pa.array(keys, pa.string()),
            "part": pa.array(part, pa.int64()),
        })

    parted = ds.map_batches(keyed, batch_format="pyarrow").materialize()

    counts: dict = {}
    for batch in (parted.map_batches(
            lambda t: t.select(["part"]).group_by(["part"])
                       .aggregate([([], "count_all")]),
            batch_format="pyarrow")
            .iter_batches(batch_size=65536, batch_format="pyarrow")):
        for p, c in zip(batch.column("part").to_pylist(),
                        batch.column("count_all").to_pylist()):
            counts[p] = counts.get(p, 0) + c
    offsets: dict = {}
    acc = 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    if acc == 0:
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "shuffle_pos": pa.array([], pa.int64())}))

    def scan(tbl: pa.Table) -> pa.Table:
        part = int(tbl.column("part")[0].as_py())
        idx = pc.sort_indices(tbl, sort_keys=[("skey", "ascending")])
        srt = tbl.take(idx)
        pos = np.arange(srt.num_rows, dtype=np.int64) \
            + np.int64(offsets.get(part, 0))
        return pa.table({
            id_col: srt.column(id_col),
            "shuffle_pos": pa.array(pos, pa.int64()),
        })

    return parted.groupby("part").map_groups(scan, batch_format="pyarrow")
