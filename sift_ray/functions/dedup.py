"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shape (100 TB):
* exact dedup = vectorized digest -> ONE hash-partitioned groupby (the only
  shuffle), with Min/Count aggregates — never ships document text twice.
* MinHash / SimHash / n-gram share one candidate-generation machinery:
  an explode stage emits only small int rows (band/gram keys + doc_id —
  never the text), those rows are hash-partitioned by bucket key
  (``part = mix(key) % P`` -> ``groupby("part").map_groups``), and each
  partition generates its bucket-local pairs with a vectorized kernel.
  Singleton buckets die inside the kernel, so no separate hot-bucket count
  pass (and no driver-side count table) is needed.
* Cross-band/cross-partition pair duplicates and partial intersection
  counts are reduced by a second DISTRIBUTED groupby over the (doc_a,
  doc_b) pair rows — candidate-proportional, not corpus-proportional.
* Verification (MinHash) and per-doc gram counts (n-gram Jaccard) use a
  map-side semi-join: the small candidate doc-id set is broadcast, the
  docs table is filtered map-side, and shingles/counts are computed inside
  those map tasks. The driver only ever holds candidate-proportional data
  (pair lists, candidate shingle-hash arrays) — never a corpus-wide scan
  or dict.

Partitioning assumption: one bucket's rows land in one partition (the part
key is a pure function of the bucket key), and one partition fits a worker
heap — pick ``num_parts`` proportional to cluster cores (default) or data
size. Results are invariant to ``num_parts``.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

from .shuffle import (TaskStage, add_hash_partition, default_num_parts,
                      mix64, partitioned_group_agg)
from .textstats import digest_batch

_MERSENNE = (1 << 61) - 1


def _digest_key_arrays(batch: pa.Table):
    """int64 partition key from the md5 hex digest (first 60 bits)."""
    return [np.array([int(d[:15], 16)
                      for d in batch.column("digest").to_pylist()],
                     dtype=np.int64)]


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """One row per distinct content digest: (digest, keep_doc_id, n_copies).
    Keeps the minimum doc_id per group. Digest cardinality ~= corpus size,
    so the reduction is the hash-partitioned VECTORIZED groupby (pyarrow
    hash-agg per partition), not Ray's per-group aggregate."""
    with_digest = ds.map_batches(
        lambda t: digest_batch(t, text_col).select([id_col, "digest"]),
        batch_format="pyarrow")
    return partitioned_group_agg(
        with_digest, ["digest"],
        [(id_col, "min", "keep_doc_id"), (None, "count", "n_copies")],
        key_arrays_fn=_digest_key_arrays)


def dedup_docs(ds, text_col: str = "text", id_col: str = "doc_id",
               num_parts: Optional[int] = None):
    """Materialize the DEDUPLICATED docs table: the full min-id row of every
    distinct content digest — what a training pipeline actually consumes.

    Scale shape: full rows (including text) move through exactly ONE
    digest-keyed hash-partition exchange; the per-partition kernel is a
    vectorized arrow group-by + is_in filter. The keep-id set is never
    broadcast (it is corpus-sized — a broadcast would be the anti-pattern);
    each partition resolves its own keepers locally because a digest's rows
    are all co-located. Size ``num_parts`` so corpus/num_parts fits a
    worker heap."""
    import pyarrow.compute as pc

    P = num_parts or default_num_parts()
    with_digest = ds.map_batches(lambda t: digest_batch(t, text_col),
                                 batch_format="pyarrow")
    parted = add_hash_partition(with_digest, ["digest"], P,
                                key_arrays_fn=_digest_key_arrays)

    def kernel(tbl: pa.Table) -> pa.Table:
        keep = tbl.group_by(["digest"]).aggregate([(id_col, "min")])
        mask = pc.is_in(tbl.column(id_col),
                        value_set=keep.column(f"{id_col}_min").combine_chunks()
                        if isinstance(keep.column(f"{id_col}_min"),
                                      pa.ChunkedArray)
                        else keep.column(f"{id_col}_min"))
        return tbl.filter(mask).drop_columns(["part"])

    return parted.groupby("part").map_groups(kernel, batch_format="pyarrow")


def near_dedup_docs(ds, k: int = 3, threshold: float = 0.5,
                    text_col: str = "text", id_col: str = "doc_id",
                    num_parts: Optional[int] = None,
                    max_df: Optional[int] = None,
                    broadcast_limit: int = 2_000_000,
                    method: str = "ngram"):
    """Materialize the NEAR-deduplicated docs table: drop the higher-id side
    of every near-duplicate pair >= threshold (greedy keep-lowest rule, the
    standard web-corpus policy).

    ``method``: how pairs are found.
    * ``"ngram"`` — exact n-gram Jaccard (the SQL-oracle semantics; ``k`` is
      the word n-gram size, ``max_df`` caps hot grams).
    * ``"minhash"`` — MinHash+LSH banding with exact-Jaccard verification
      (``k`` is the shingle size): the scale route when exactness of the
      candidate ENUMERATION isn't demanded — candidate generation touches
      only banded int rows instead of the full gram index, at the cost of
      LSH recall < 1 near the threshold. Verified pairs are exact, so
      precision is 1 either way.
    * ``"simhash"`` — 64-bit SimHash banding; ``threshold`` is the MAX
      HAMMING DISTANCE (an int, typically 3), ``k`` is ignored. The
      cheapest route per document (one 8-byte fingerprint).

    Two anti-join strategies, switched on the measured pair count:
    * pairs <= broadcast_limit: collect the drop-id set (ints only) and
      broadcast it for a map-side filter — zero shuffle of doc rows, the
      right call when duplicates are rare.
    * pairs > broadcast_limit (a web corpus at 30-50% dup rate has O(corpus)
      drop ids — a driver set would be the anti-pattern): distributed
      anti-join (shuffle.hash_join how="anti"): docs and drop-ids co-locate
      by one id-hash exchange, each partition filters locally in Arrow.
    """
    import pyarrow.compute as pc

    from .shuffle import hash_join

    if method == "minhash":
        pairs = minhash_lsh_pairs(ds, shingle_k=k,
                                  jaccard_threshold=threshold,
                                  text_col=text_col, id_col=id_col,
                                  num_parts=num_parts).materialize()
    elif method == "simhash":
        # threshold here is the max hamming distance — an INT >= 1; the
        # Jaccard-style default 0.5 would silently truncate to 0 (exact
        # fingerprint match only), so fail loud instead
        if threshold != int(threshold) or not 1 <= int(threshold) <= 63:
            raise ValueError(
                "method='simhash' takes threshold = max hamming distance "
                f"(an int in [1, 63], typically 3); got {threshold!r}")
        pairs = simhash_pairs(ds, max_hamming=int(threshold),
                              text_col=text_col, id_col=id_col,
                              num_parts=num_parts).materialize()
    elif method == "ngram":
        pairs = ngram_jaccard_pairs(ds, k=k, threshold=threshold,
                                    text_col=text_col, id_col=id_col,
                                    num_parts=num_parts,
                                    max_df=max_df).materialize()
    else:
        raise ValueError(f"unknown near-dedup method: {method!r}")
    # NOTE: this gate mirrors _drop_ids_anti_join but keys on the PAIR
    # count (cheaper: no distinct-id aggregation on the common small
    # path) — change the broadcast/anti switch in both places together
    n_pairs = pairs.count()
    if n_pairs > broadcast_limit:
        drop_ids = partitioned_group_agg(
            pairs, ["doc_b"], [(None, "count", "_n")],
            num_parts=num_parts).map_batches(
            lambda t: t.select(["doc_b"]).rename_columns([id_col]),
            batch_format="pyarrow").materialize()
        return hash_join(ds, drop_ids, on=id_col, how="anti",
                         num_parts=num_parts)

    drop: set = set()
    for batch in pairs.iter_batches(batch_size=65536,
                                    batch_format="pyarrow"):
        drop.update(batch.column("doc_b").to_pylist())
    drop_arr = pa.array(sorted(drop), pa.int64())

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(batch.column(id_col), value_set=drop_arr))
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def _drop_ids_anti_join(ds, drop_ids_ds, id_col: str,
                        broadcast_limit: int,
                        num_parts: Optional[int] = None):
    """Remove the rows whose id appears in the (materialized,
    drop-proportional) single-column id Dataset — the shared anti-join
    tail of the near-dedup materializers: below ``broadcast_limit`` ids
    the int set broadcasts for a zero-shuffle map filter; above it the
    docs ride ONE id-hash exchange (``hash_join how="anti"``), because a
    dup-heavy corpus has O(corpus) drop ids and a driver set would be
    the anti-pattern."""
    import pyarrow.compute as pc

    from .shuffle import hash_join

    if drop_ids_ds.count() > broadcast_limit:
        return hash_join(ds, drop_ids_ds, on=id_col, how="anti",
                         num_parts=num_parts)
    drop: set = set()
    for batch in drop_ids_ds.iter_batches(batch_size=65536,
                                          batch_format="pyarrow"):
        drop.update(batch.column(id_col).to_pylist())
    drop_arr = pa.array(sorted(drop), pa.int64())

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(batch.column(id_col),
                                  value_set=drop_arr))
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def _union_find_labels(a: np.ndarray, b: np.ndarray) -> pa.Table:
    """Driver union-find (path halving + union by min root) over int edge
    arrays: (doc_id, cluster_id=min id of component). O(E α(E))."""
    nodes = np.unique(np.concatenate([a, b]))
    idx = {int(n): i for i, n in enumerate(nodes.tolist())}
    parent = list(range(len(nodes)))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(idx[x]), find(idx[y])
        if rx != ry:
            # union by min node id keeps the root the component minimum
            if nodes[rx] <= nodes[ry]:
                parent[ry] = rx
            else:
                parent[rx] = ry
    labels = np.array([nodes[find(i)] for i in range(len(nodes))],
                      dtype=np.int64)
    return pa.table({"doc_id": pa.array(nodes.astype(np.int64), pa.int64()),
                     "cluster_id": pa.array(labels, pa.int64())})


def connected_components(pairs_ds, max_iters: int = 50,
                         num_parts: Optional[int] = None,
                         broadcast_limit: int = 2_000_000):
    """Connected components over an undirected (doc_a, doc_b) edge
    Dataset: returns (doc_id, cluster_id) where cluster_id is the MINIMUM
    doc id in the node's component — the transitive closure of near-dup
    pairs (greedy pairwise dropping under-merges chains: a~b, b~c never
    links a and c without this).

    Dual path, switched on the measured edge count (the edge list is
    CANDIDATE-proportional — near-dup pairs, not the corpus):

    * edges <= broadcast_limit: driver union-find over the int edge
      arrays — microseconds of driver CPU on kilobyte-to-megabyte state,
      where each distributed round below costs three whole exchanges of
      fixed overhead. This is the common case: even a dup-heavy corpus
      yields pair lists that fit comfortably in 2M rows per shard-level
      dedup run.
    * edges > broadcast_limit: distributed iterative min-label
      propagation — labels start as each node's own id; every round
      joins labels onto the (bidirectional) edge list (one key
      exchange), takes the per-node neighborhood minimum (one exchange),
      and folds it into the labels (one exchange). The driver holds ONE
      integer per round (the changed-label count) and stops at a
      fixpoint; rounds needed = component diameter, which for near-dup
      clusters is small (dup families are dense). Labels re-partition to
      P blocks before each materialize — Ray's sort exchange emits about
      as many blocks as it receives, so iterative loops otherwise
      compound block count per round (the pagerank lesson). For
      adversarial long-chain graphs swap in large-star/small-star
      pointer jumping — O(log n) rounds, same exchange primitives.
    """
    import pyarrow.compute as pc
    import ray.data as rd

    from .shuffle import hash_join

    def both_dirs(t: pa.Table) -> pa.Table:
        a = pc.cast(t.column("doc_a"), pa.int64())
        b = pc.cast(t.column("doc_b"), pa.int64())
        return pa.table({"src": pa.concat_arrays(
                             [c for ch in (a, b) for c in
                              (ch.chunks if isinstance(ch, pa.ChunkedArray)
                               else [ch])]),
                         "dst": pa.concat_arrays(
                             [c for ch in (b, a) for c in
                              (ch.chunks if isinstance(ch, pa.ChunkedArray)
                               else [ch])])})

    pairs_ds = pairs_ds.materialize()
    if pairs_ds.count() <= broadcast_limit:
        tbl = _collect_pairs(pairs_ds)
        if tbl.num_rows == 0:
            return rd.from_arrow(pa.schema(
                [("doc_id", pa.int64()),
                 ("cluster_id", pa.int64())]).empty_table())
        return rd.from_arrow(_union_find_labels(
            tbl.column("doc_a").to_numpy(zero_copy_only=False)
               .astype(np.int64),
            tbl.column("doc_b").to_numpy(zero_copy_only=False)
               .astype(np.int64)))

    P = num_parts or default_num_parts()
    edges = pairs_ds.map_batches(both_dirs,
                                 batch_format="pyarrow").materialize()

    # initial labels: every node labels itself
    labels = partitioned_group_agg(
        edges.map_batches(lambda t: pa.table({"node": t.column("src"),
                                              "label": t.column("src")}),
                          batch_format="pyarrow"),
        ["node"], [("label", "min", "label")],
        num_parts=num_parts).repartition(P).materialize()

    for _ in range(max_iters):
        # ship each node's label to its neighbors and take the minimum
        msgs = hash_join(
            edges,
            labels.map_batches(
                lambda t: pa.table({"dst": t.column("node"),
                                    "nbr_label": t.column("label")}),
                batch_format="pyarrow"),
            on="dst", num_parts=num_parts)
        neigh = partitioned_group_agg(msgs, ["src"],
                                      [("nbr_label", "min", "nmin")],
                                      num_parts=num_parts)
        # right_types: a schema() probe on the groupby output would execute
        # the whole msgs pipeline once extra PER ITERATION
        merged = hash_join(
            labels.map_batches(
                lambda t: pa.table({"src": t.column("node"),
                                    "label": t.column("label")}),
                batch_format="pyarrow"),
            neigh, on="src", how="left", num_parts=num_parts,
            left_types={"src": pa.int64(), "label": pa.int64()},
            right_types={"src": pa.int64(), "nmin": pa.int64()})

        def fold(t: pa.Table) -> pa.Table:
            old = pc.cast(t.column("label"), pa.int64())
            nmin = pc.cast(t.column("nmin"), pa.int64())
            new = pc.min_element_wise(old, pc.coalesce(nmin, old))
            return pa.table({
                "node": pc.cast(t.column("src"), pa.int64()),
                "label": new,
                "changed": pc.cast(pc.not_equal(new, old), pa.int64()),
            })

        folded = merged.map_batches(fold, batch_format="pyarrow") \
            .repartition(P).materialize()
        changed = folded.sum("changed")
        labels = folded.drop_columns(["changed"]).materialize()
        if not changed:
            break
    return labels.map_batches(
        lambda t: pa.table({"doc_id": t.column("node"),
                            "cluster_id": t.column("label")}),
        batch_format="pyarrow")


def dup_clusters(ds, k: int = 3, threshold: float = 0.5,
                 text_col: str = "text", id_col: str = "doc_id",
                 num_parts: Optional[int] = None,
                 max_df: Optional[int] = None,
                 broadcast_limit: int = 2_000_000):
    """Every document with its near-dup cluster id (min doc id of its
    connected component under n-gram-Jaccard >= threshold; singletons are
    their own cluster). The transitive version of ``near_dedup_docs`` —
    keep one row per cluster_id to dedup whole families.

    The label table covers GRAPH MEMBERS only (candidate-proportional):
    below ``broadcast_limit`` pairs it broadcasts for a zero-exchange
    map-side lookup (singletons fall through to their own id); above it
    the labels attach through one id-keyed left join."""
    import pyarrow.compute as pc
    import ray as _ray

    from .shuffle import hash_join

    pairs = ngram_jaccard_pairs(ds, k=k, threshold=threshold,
                                text_col=text_col, id_col=id_col,
                                num_parts=num_parts,
                                max_df=max_df).materialize()
    comp = connected_components(pairs, num_parts=num_parts,
                                broadcast_limit=broadcast_limit)

    if pairs.count() <= broadcast_limit:
        comp_tbl = pa.concat_tables(
            [pa.schema([("doc_id", pa.int64()),
                        ("cluster_id", pa.int64())]).empty_table()]
            + list(comp.iter_batches(batch_size=1 << 20,
                                     batch_format="pyarrow"))
        ).combine_chunks()
        nodes = np.sort(comp_tbl.column("doc_id").to_numpy(
            zero_copy_only=False))
        order = np.argsort(comp_tbl.column("doc_id").to_numpy(
            zero_copy_only=False), kind="stable")
        labels = comp_tbl.column("cluster_id").to_numpy(
            zero_copy_only=False)[order]
        ref = _ray.put((nodes, labels))

        def lookup(t: pa.Table) -> pa.Table:
            nd, lb = _ray.get(ref)
            ids = pc.cast(t.column(id_col), pa.int64()).to_numpy(
                zero_copy_only=False)
            pos = np.searchsorted(nd, ids)
            pos = np.clip(pos, 0, max(len(nd) - 1, 0))
            hit = (len(nd) > 0) & (nd[pos] == ids) if len(nd) else \
                np.zeros(len(ids), dtype=bool)
            cl = np.where(hit, lb[pos] if len(nd) else 0, ids)
            return pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "cluster_id": pa.array(cl, pa.int64())})

        return ds.map_batches(lookup, batch_format="pyarrow")

    joined = hash_join(
        ds.map_batches(lambda t: pa.table(
            {"doc_id": pc.cast(t.column(id_col), pa.int64())}),
            batch_format="pyarrow"),
        comp.map_batches(lambda t: pa.table(
            {"doc_id": t.column("doc_id"),
             "cluster_id": t.column("cluster_id")}),
            batch_format="pyarrow"),
        on="doc_id", how="left", num_parts=num_parts,
        left_types={"doc_id": pa.int64()},
        right_types={"doc_id": pa.int64(), "cluster_id": pa.int64()})

    def finish(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.int64())
        cl = pc.cast(t.column("cluster_id"), pa.int64())
        return pa.table({"doc_id": ids,
                         "cluster_id": pc.coalesce(cl, ids)})

    return joined.map_batches(finish, batch_format="pyarrow")


def dedup_keep_best(ds, k: int = 3, threshold: float = 0.5,
                    text_col: str = "text", id_col: str = "doc_id",
                    num_parts: Optional[int] = None,
                    max_df: Optional[int] = None,
                    materialize_docs: bool = False,
                    broadcast_limit: int = 2_000_000):
    """Keep the BEST document per near-dup cluster — the RefinedWeb/FineWeb
    policy (dedup keeps the highest-quality member of each duplicate
    family, not the lowest id). Quality here is the word count (the
    longest member usually subsumes its near-duplicates); tiebreak is the
    minimum doc id, so the result is deterministic.

    Returns (doc_id, cluster_id, n_words) of the kept documents (one
    row per cluster; singletons keep themselves).

    Scale structure: only documents that appear in a near-dup PAIR need
    cluster labels or an argmax — every other document is a singleton
    that keeps itself. The pair graph is candidate-proportional, so the
    label/argmax work never touches corpus-sized exchanges: below
    ``broadcast_limit`` pairs the member scores are gathered through a
    broadcast id filter and the per-cluster argmax runs on the driver
    (kilobyte state); above it the same steps run as a distributed join
    + grouped_topk over the member subset. The corpus itself crosses
    ZERO exchanges on the listing path (one vectorized score map and a
    broadcast-membership filter).

    ``materialize_docs=True`` returns the kept DOCUMENT rows instead
    (all original columns): the DROP set — non-best members, already
    candidate-proportional — feeds the shared gated anti-join."""
    import pyarrow.compute as pc
    import ray.data as rd

    from .relational import grouped_topk
    from .shuffle import hash_join
    from .textstats import _WORD_PATTERN

    i64 = pa.int64()
    pairs = ngram_jaccard_pairs(ds, k=k, threshold=threshold,
                                text_col=text_col, id_col=id_col,
                                num_parts=num_parts,
                                max_df=max_df).materialize()
    comp = connected_components(pairs, num_parts=num_parts,
                                broadcast_limit=broadcast_limit)

    def score(batch: pa.Table) -> pa.Table:
        wc = pc.count_substring_regex(batch.column(text_col), _WORD_PATTERN)
        return pa.table({
            "doc_id": pc.cast(batch.column(id_col), pa.int64()),
            "n_words": pc.cast(wc, pa.int64()),
        })

    scored = ds.map_batches(score, batch_format="pyarrow")

    if pairs.count() <= broadcast_limit:
        # graph members + labels fit the driver (candidate-proportional)
        comp_tbl = pa.concat_tables(
            [pa.schema([("doc_id", i64), ("cluster_id", i64)])
             .empty_table()]
            + list(comp.iter_batches(batch_size=1 << 20,
                                     batch_format="pyarrow"))
        ).combine_chunks()
        import ray as _ray

        members = comp_tbl.column("doc_id").combine_chunks()
        # broadcast via the object store: a closure-captured array ships
        # with every task spec (candidate-proportional, up to tens of MB
        # near the gate) instead of once per node
        members_ref = _ray.put(members)
        scored = scored.materialize()  # feeds member gather + singleton

        def _member_filter(invert: bool):
            def fn(t: pa.Table) -> pa.Table:
                vs = _ray.get(members_ref)
                mask = pc.is_in(t.column("doc_id"), value_set=vs)
                if invert:
                    mask = pc.invert(mask)
                return t.filter(mask)
            return fn

        member_scores = pa.concat_tables(
            [pa.schema([("doc_id", i64), ("n_words", i64)]).empty_table()]
            + list(scored.map_batches(_member_filter(False),
                                      batch_format="pyarrow")
                .iter_batches(batch_size=1 << 20,
                              batch_format="pyarrow"))).to_pandas()
        lab = comp_tbl.to_pandas().merge(member_scores, on="doc_id")
        lab = lab.sort_values(["cluster_id", "n_words", "doc_id"],
                              ascending=[True, False, True],
                              kind="stable")
        best_pdf = lab.groupby("cluster_id", sort=True).head(1)
        best_tbl = pa.table({
            "doc_id": pa.array(best_pdf["doc_id"].to_numpy(), i64),
            "cluster_id": pa.array(best_pdf["cluster_id"].to_numpy(), i64),
            "n_words": pa.array(best_pdf["n_words"].to_numpy(), i64),
        })
        if not materialize_docs:
            singles = scored.map_batches(
                _member_filter(True), batch_format="pyarrow") \
                .map_batches(
                lambda t: pa.table({"doc_id": t.column("doc_id"),
                                    "cluster_id": t.column("doc_id"),
                                    "n_words": t.column("n_words")}),
                batch_format="pyarrow")
            return singles.union(rd.from_arrow(best_tbl))
        keep_ids = set(best_pdf["doc_id"].tolist())
        drop_ref = _ray.put(pa.array(
            sorted(set(members.to_pylist()) - keep_ids), i64))

        def keep_docs(t: pa.Table) -> pa.Table:
            return t.filter(pc.invert(pc.is_in(
                pc.cast(t.column(id_col), i64),
                value_set=_ray.get(drop_ref))))

        return ds.map_batches(keep_docs, batch_format="pyarrow")

    # beyond-gate path: distributed join + argmax over the MEMBER subset
    comp = comp.materialize()  # feeds the join below and the drop set
    joined = hash_join(
        scored, comp, on="doc_id", how="inner", num_parts=num_parts,
        left_types={"doc_id": i64, "n_words": i64},
        right_types={"doc_id": i64, "cluster_id": i64})
    best = grouped_topk(joined, "cluster_id", "n_words", "doc_id",
                        k=1, ascending=False, num_parts=num_parts)
    best = best.map_batches(
        lambda t: t.select(["doc_id", "cluster_id", "n_words"]),
        batch_format="pyarrow").materialize()

    if not materialize_docs:
        # singletons: docs with no cluster label (anti-join on doc_id)
        member_ids = comp.map_batches(
            lambda t: t.select(["doc_id"]), batch_format="pyarrow")
        singles = hash_join(
            scored, member_ids, on="doc_id", how="anti",
            num_parts=num_parts,
            left_types={"doc_id": i64, "n_words": i64},
            right_types={"doc_id": i64}).map_batches(
            lambda t: pa.table({"doc_id": t.column("doc_id"),
                                "cluster_id": t.column("doc_id"),
                                "n_words": t.column("n_words")}),
            batch_format="pyarrow")
        return singles.union(best)

    keepers = best.map_batches(
        lambda t: pa.table({"cluster_id": t.column("cluster_id"),
                            "keep_id": t.column("doc_id")}),
        batch_format="pyarrow")
    tagged = hash_join(
        comp, keepers, on="cluster_id", num_parts=num_parts,
        left_types={"doc_id": i64, "cluster_id": i64},
        right_types={"cluster_id": i64, "keep_id": i64})

    def non_best(t: pa.Table) -> pa.Table:
        m = pc.invert(pc.equal(t.column("doc_id"), t.column("keep_id")))
        return pa.table({id_col: t.filter(m).column("doc_id")})

    drop_ids = tagged.map_batches(non_best,
                                  batch_format="pyarrow").materialize()
    return _drop_ids_anti_join(ds, drop_ids, id_col,
                               broadcast_limit, num_parts)


def _word_shingles(text: str, k: int) -> set:
    words = text.split()
    if len(words) < k:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i:i + k]) for i in range(len(words) - k + 1)}


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    sh = _word_shingles(text, k)
    if not sh:
        return np.zeros(1, dtype=np.uint64)
    out = np.fromiter(
        (int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(),
                        "big") for s in sh),
        dtype=np.uint64, count=len(sh))
    return out


def _shingle_hash_set(text: str, k: int) -> np.ndarray:
    """Sorted distinct 64-bit shingle hashes (empty text -> empty array).
    Hash-set Jaccard equals string-set Jaccard modulo ~n^2/2^64 collisions."""
    sh = _word_shingles(text, k)
    if not sh:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.fromiter(
        (int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(),
                        "big") for s in sh),
        dtype=np.uint64, count=len(sh)))


def _sorted_runs(pdf, key_cols: List[str]):
    """Yield (start, end) row ranges of equal-key runs after a lexsort, plus
    the sorted row order. Vectorized run detection; buckets with < 2 rows
    are skipped by callers."""
    arrs = [pdf[c].to_numpy() for c in key_cols]
    order = np.lexsort(arrs[::-1])
    n = len(order)
    is_start = np.ones(n, dtype=bool)
    if n > 1:
        is_start[1:] = False
        for a in arrs:
            s = a[order]
            is_start[1:] |= s[1:] != s[:-1]
    starts = np.flatnonzero(is_start).tolist()
    starts.append(n)
    return order, starts


def _empty_pairs_df(extra: Optional[Dict[str, str]] = None):
    import pandas as pd
    cols = {"doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64")}
    for name, dtype in (extra or {}).items():
        cols[name] = pd.Series([], dtype=dtype)
    return pd.DataFrame(cols)


_NGRAM_ROWS_SCHEMA = pa.schema([
    ("kind", pa.int8()),      # 0 = pair partial, 1 = per-doc capped count
    ("doc_a", pa.int64()),    # kind 1: the doc id
    ("doc_b", pa.int64()),    # kind 1: unused (0)
    ("isect", pa.int64()),    # kind 1: n grams of doc_a in capped buckets
    ("n_a", pa.int64()),      # doc_a's TOTAL distinct gram count (kind 0)
    ("n_b", pa.int64()),      # doc_b's TOTAL distinct gram count (kind 0)
])


def _bucket_pair_counts(grams: np.ndarray, docs: np.ndarray,
                        ndoc: np.ndarray, max_df: Optional[int]) -> pa.Table:
    """Count co-occurring (doc_a < doc_b) pairs over gram buckets; each pair
    row carries the docs' total distinct-gram counts (a per-doc constant
    shipped on the exploded rows, so no later join/broadcast is needed).
    With ``max_df`` set, buckets larger than max_df emit no pairs (the
    hot-gram cap); instead each member doc gets a kind-1 row counting its
    capped grams in this partition, so denominators can be adjusted to the
    df-filtered vocabulary downstream. Returns _NGRAM_ROWS_SCHEMA rows."""
    from collections import Counter
    from itertools import combinations

    order = np.lexsort((docs, grams))
    g = grams[order]
    d = docs[order]
    nd = ndoc[order]
    n = len(g)
    starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]]).tolist()
    starts.append(n)
    d_list = d.tolist()  # python-loop counting: pair-instance volume is
    # Sum C(bucket,2); tuple-key Counter updates run at ~1M/s and avoid
    # large gather/scatter arrays (pathologically slow on some hosts)
    nmap = dict(zip(d_list, nd.tolist()))
    counter: Counter = Counter()
    capped: Counter = Counter()
    for bi in range(len(starts) - 1):
        s, e = starts[bi], starts[bi + 1]
        sz = e - s
        if sz < 2:
            continue
        if max_df is not None and sz > max_df:
            # hot gram: C(sz,2) pair instances would be quadratic — count
            # one int per member doc instead (linear)
            for doc in d_list[s:e]:
                capped[doc] += 1
            continue
        counter.update(combinations(d_list[s:e], 2))
    n_p = len(counter)
    n_c = len(capped)
    kind = np.concatenate([np.zeros(n_p, np.int8), np.ones(n_c, np.int8)])
    pairs = list(counter.keys())
    pa_ = np.fromiter((p[0] for p in pairs), np.int64, n_p)
    pb_ = np.fromiter((p[1] for p in pairs), np.int64, n_p)
    cd_ = np.fromiter(capped.keys(), np.int64, n_c)
    return pa.Table.from_arrays([
        pa.array(kind, pa.int8()),
        pa.array(np.concatenate([pa_, cd_]), pa.int64()),
        pa.array(np.concatenate([pb_, np.zeros(n_c, np.int64)]), pa.int64()),
        pa.array(np.concatenate([
            np.fromiter(counter.values(), np.int64, n_p),
            np.fromiter(capped.values(), np.int64, n_c)]), pa.int64()),
        pa.array(np.concatenate([
            np.fromiter((nmap[a] for a in pa_), np.int64, n_p),
            np.zeros(n_c, np.int64)]), pa.int64()),
        pa.array(np.concatenate([
            np.fromiter((nmap[b] for b in pb_), np.int64, n_p),
            np.zeros(n_c, np.int64)]), pa.int64()),
    ], schema=_NGRAM_ROWS_SCHEMA)


class MinHashStage:
    """Per-batch MinHash signatures -> exploded (band_id, band_hash, doc_id)
    rows. Permutation coefficients are seed-derived in __init__ (once per
    actor)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 5,
                 seed: int = 42, text_col: str = "text", id_col: str = "doc_id"):
        assert num_perm % bands == 0
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        hashes = _shingle_hashes(text, self.shingle_k)
        # (num_perm, n_shingles) universal hashing mod Mersenne prime
        vals = (self.a[:, None] * hashes[None, :] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out_doc, out_band, out_hash = [], [], []
        for doc_id, text in zip(ids, texts):
            sig = self.signature(text or "")
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band:(band + 1) * self.rows_per_band]
                bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
                out_doc.append(doc_id)
                out_band.append(band)
                out_hash.append(int.from_bytes(bh, "big") >> 1)
        return pa.table({
            "doc_id": pa.array(out_doc, pa.int64()),
            "band_id": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.int64()),
        })


def _minhash_partition_pairs(max_bucket: int):
    """Partition kernel: bucket-local candidate pairs (locally deduped).
    Buckets > max_bucket docs are skipped (skew cap): a hot band bucket is a
    degenerate hash and only produces pairs verification rejects anyway."""
    import pandas as pd

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        order, starts = _sorted_runs(pdf, ["band_id", "band_hash"])
        docs = pdf["doc_id"].to_numpy()[order]
        seen = set()
        for bi in range(len(starts) - 1):
            s, e = starts[bi], starts[bi + 1]
            if e - s < 2:
                continue
            ids = sorted(set(docs[s:e].tolist()))
            if len(ids) < 2 or len(ids) > max_bucket:
                continue
            for i, a in enumerate(ids):
                for b in ids[i + 1:]:
                    seen.add((a, b))
        if not seen:
            return _empty_pairs_df()
        arr = np.array(sorted(seen), dtype=np.int64)
        return pd.DataFrame({"doc_a": arr[:, 0], "doc_b": arr[:, 1]})
    return fn


def _distinct_pairs(pairs_ds, extra_agg=None):
    """Distributed pair dedupe over the TRUE (doc_a, doc_b) columns via the
    hash-partitioned vectorized groupby (pair cardinality scales with
    candidate volume — Ray's per-group aggregate would pay ~0.2 ms/group).
    ``extra_agg`` optionally carries one (col, fn, name) AggSpec."""
    aggs = [extra_agg] if extra_agg is not None else [(None, "count", "_n")]
    out = partitioned_group_agg(pairs_ds, ["doc_a", "doc_b"], aggs)
    if extra_agg is None:
        out = out.map_batches(lambda t: t.select(["doc_a", "doc_b"]),
                              batch_format="pyarrow")
    return out


def _dedupe_pair_rows(tbl: pa.Table) -> Tuple[np.ndarray, np.ndarray, list]:
    """Vectorized (doc_a, doc_b) dedupe via lexsort + run boundaries.
    Returns (a, b, keep_row_indices_list)."""
    a = tbl.column("doc_a").to_numpy(zero_copy_only=False)
    b = tbl.column("doc_b").to_numpy(zero_copy_only=False)
    order = np.lexsort((b, a))
    a_s, b_s = a[order], b[order]
    n = len(order)
    first = np.ones(n, dtype=bool)
    if n > 1:
        first[1:] = (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
    keep = order[first]
    return a[keep], b[keep], keep


def _collect_pairs(pairs_ds) -> pa.Table:
    """ONE driver pass over a (materialized, candidate-proportional)
    pair Dataset: the int (doc_a, doc_b) columns as a single-chunk table.
    Callers derive both the distinct-id broadcast set and (on the
    broadcast verify path) the deduped pair list from it, so the Dataset
    is never scanned twice."""
    empty = pa.schema([("doc_a", pa.int64()),
                       ("doc_b", pa.int64())]).empty_table()
    return pa.concat_tables(
        [empty] + list(pairs_ds.select_columns(["doc_a", "doc_b"])
                       .iter_batches(batch_size=1 << 18,
                                     batch_format="pyarrow"))
    ).combine_chunks()


_EMPTY_JACCARD = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                            ("jaccard", pa.float64())])


def _pair_jaccard_from_blobs(sh_a, sh_b) -> np.ndarray:
    """Exact Jaccard per candidate pair from two lists of (unique, any
    order) uint64-set blobs, in ONE vectorized pass: concat every pair's
    two sets tagged with the pair index; a value seen twice under one
    pair index is one intersection hit (each side is duplicate-free)."""
    npairs = len(sh_a)
    la = np.fromiter((len(x or b"") >> 3 for x in sh_a),
                     np.int64, count=npairs)
    lb = np.fromiter((len(x or b"") >> 3 for x in sh_b),
                     np.int64, count=npairs)
    g = np.frombuffer(
        b"".join((x or b"") + (y or b"") for x, y in zip(sh_a, sh_b)),
        dtype=np.uint64)
    pid = np.repeat(np.arange(npairs, dtype=np.int64), la + lb)
    order = np.lexsort((g, pid))
    gs, ps = g[order], pid[order]
    dup = (gs[1:] == gs[:-1]) & (ps[1:] == ps[:-1])
    isect = np.bincount(ps[1:][dup], minlength=npairs)
    union = la + lb - isect
    return np.where(union > 0, isect / np.maximum(union, 1), 0.0)


class _JaccardVerifyStage:
    """Map-side exact-Jaccard verify against a broadcast candidate shingle
    map (fetched once per actor). Used ONLY below the broadcast threshold —
    the map is candidate-proportional and its size is bounded by the
    caller's pair-count gate."""

    def __init__(self, smap_ref, threshold: float):
        import ray
        self.smap: Dict[int, bytes] = ray.get(smap_ref)
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy(zero_copy_only=False)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False)
        get = self.smap.get
        j = _pair_jaccard_from_blobs([get(x, b"") for x in a.tolist()],
                                     [get(y, b"") for y in b.tolist()])
        keep = j >= self.threshold
        return pa.table({
            "doc_a": pa.array(a[keep], pa.int64()),
            "doc_b": pa.array(b[keep], pa.int64()),
            "jaccard": pa.array(j[keep], pa.float64()),
        })


def _minhash_verify_broadcast(shingles, pairs_tbl, threshold: float):
    """Small-candidate verification: dedupe the (int) candidate pairs on
    the driver, broadcast the candidate shingle blobs once (pulled from
    the already-materialized shingles dataset the caller size-gated),
    verify map-side. Two cheap stages instead of two blob-carrying
    exchanges."""
    import ray
    import ray.data as rd

    a, b, _ = _dedupe_pair_rows(pairs_tbl)

    smap: Dict[int, bytes] = {}
    for batch in shingles.iter_batches(batch_size=4096,
                                       batch_format="pyarrow"):
        smap.update(zip(batch.column("jkey").to_pylist(),
                        batch.column("sh").to_pylist()))
    ref = ray.put(smap)
    pairs_ds = rd.from_arrow(pa.table({
        "doc_a": pa.array(a, pa.int64()),
        "doc_b": pa.array(b, pa.int64()),
    }))
    # from_arrow yields ONE block; split it so the verify parallelizes
    # (16 B/pair rows — the repartition is driver-local and cheap)
    nparts = max(1, min(64, len(a) // 20_000))
    if nparts > 1:
        pairs_ds = pairs_ds.repartition(nparts)
    # plain tasks with per-process cached state (ObjectRefs are hashable):
    # below the broadcast gate the pair list is small, and a 2-actor pool's
    # spawn latency would dominate the whole verify stage
    return pairs_ds.map_batches(
        TaskStage(_JaccardVerifyStage, smap_ref=ref, threshold=threshold),
        batch_format="pyarrow")


def minhash_lsh_pairs(ds, num_perm: int = 64, bands: int = 16,
                      shingle_k: int = 5, jaccard_threshold: float = 0.5,
                      concurrency=None, text_col: str = "text",
                      id_col: str = "doc_id", num_parts: Optional[int] = None,
                      max_bucket: int = 200,
                      broadcast_limit: int = 2_000_000,
                      blob_broadcast_bytes: int = 256 * 1024 * 1024):
    """Near-duplicate pairs via MinHash banding + exact Jaccard verification.

    Band triples are hash-partitioned by bucket key and candidate pairs
    generated per partition (locally deduped); candidate docs' shingle-hash
    sets are computed map-side (broadcast id-set semi-join — the driver
    holds only candidate INTS) as binary blobs. Verification then takes one
    of two shapes, switched on the measured candidate-pair count:

    * pairs <= broadcast_limit: candidate pairs (ints) are deduped on the
      driver and the candidate shingle blobs broadcast once per actor for a
      map-side verify — two cheap stages, the right constant factor when
      duplicates are a bounded slice of the corpus.
    * pairs > broadcast_limit (dup-heavy web corpus — candidate state would
      be O(corpus) on the driver): two key-hash exchanges attach the blobs
      to the pairs — the first keyed by doc_a (which also removes
      cross-band duplicate pairs exactly, since all copies of (a,b) share
      doc_a), the second keyed by doc_b with the exact-Jaccard check
      inlined in the partition kernel. Shingle data moves at most twice,
      pairs move twice, everything is candidate-proportional and
      partitioned — no driver-side shingle state at any point.

    Returns a Dataset of (doc_a, doc_b, jaccard >= t).
    """
    import pyarrow.compute as pc
    import ray.data as rd

    P = num_parts or default_num_parts()
    # plain tasks, not an actor pool: the per-process state is a cached
    # seeded RNG (see shuffle.TaskStage) — tasks scale elastically with
    # zero spawn ramp. An explicit ``concurrency`` still selects a pool.
    if concurrency is None:
        triples = ds.map_batches(
            TaskStage(MinHashStage, num_perm=num_perm, bands=bands,
                      shingle_k=shingle_k, text_col=text_col,
                      id_col=id_col),
            batch_format="pyarrow")
    else:
        triples = ds.map_batches(
            MinHashStage,
            fn_constructor_kwargs={"num_perm": num_perm, "bands": bands,
                                   "shingle_k": shingle_k,
                                   "text_col": text_col, "id_col": id_col},
            batch_format="pyarrow", concurrency=concurrency)
    partials = (add_hash_partition(triples, ["band_id", "band_hash"], P)
                .groupby("part")
                .map_groups(_minhash_partition_pairs(max_bucket),
                            batch_format="pandas")).materialize()
    import functools
    return _exact_jaccard_verify(
        ds, partials, functools.partial(_shingle_hash_set, k=shingle_k),
        jaccard_threshold, text_col, id_col, P, broadcast_limit,
        blob_broadcast_bytes)


def _exact_jaccard_verify(ds, partials, set_fn, threshold: float,
                          text_col: str, id_col: str, P: int,
                          broadcast_limit: int,
                          blob_broadcast_bytes: int = 256 * 1024 * 1024):
    """Shared exact-Jaccard verification over a candidate-pair Dataset:
    dedupes pairs, computes each candidate doc's hash set via ``set_fn``
    map-side (broadcast id-set semi-join), then verifies on one of two
    size-gated paths. The broadcast path ships the blob map once per
    worker and verifies map-side; it is taken when BOTH measured costs
    fit — candidate pairs <= ``broadcast_limit`` (driver/pair-list state;
    the driver already holds the int pair list either way, the gate
    bounds the per-task replica) AND actual blob bytes (measured from
    the materialized shingles, O(candidate DOCS) not O(pairs)) <=
    ``blob_broadcast_bytes`` (per-worker heap). Past either bound: two
    blob-attaching key exchanges, zero driver blob state. Used by
    minhash_lsh_pairs (char-shingle sets) and ngram_jaccard_pairs_prefix
    (word k-gram sets — there the verified Jaccard IS the exact answer)."""
    import pyarrow.compute as pc
    import ray.data as rd

    # ONE driver pass over the (candidate-proportional, int-only) pair
    # rows: derives the broadcast id set — both verify paths hold exactly
    # this much driver state — and, on the broadcast path, the pair list.
    pairs_tbl = _collect_pairs(partials)
    n_partial = pairs_tbl.num_rows
    if n_partial == 0:
        return rd.from_arrow(_EMPTY_JACCARD.empty_table())

    # semi-join: broadcast the candidate id set (ints), filter the docs
    # table map-side, compute shingle hashes inside those tasks
    needed = pa.array(np.union1d(
        pairs_tbl.column("doc_a").to_numpy(zero_copy_only=False),
        pairs_tbl.column("doc_b").to_numpy(zero_copy_only=False)),
        pa.int64())

    def cand_shingles(batch: pa.Table) -> pa.Table:
        sub = batch.filter(pc.is_in(batch.column(id_col), value_set=needed))
        blobs = [set_fn(t or "").tobytes()
                 for t in sub.column(text_col).to_pylist()]
        return pa.table({
            "jkey": pc.cast(sub.column(id_col), pa.int64()),
            "doc_a": pa.nulls(sub.num_rows, pa.int64()),
            "doc_b": pa.nulls(sub.num_rows, pa.int64()),
            "sh": pa.array(blobs, pa.binary()),
            "_side": pa.array(np.zeros(sub.num_rows, np.int8), pa.int8()),
        })

    shingles = ds.map_batches(cand_shingles,
                              batch_format="pyarrow").materialize()

    if n_partial <= broadcast_limit:
        # measured blob volume (Dataset.size_bytes of the materialized
        # shingles bounds the smap from above) decides broadcastability
        if (shingles.size_bytes() or 0) <= blob_broadcast_bytes:
            return _minhash_verify_broadcast(shingles, pairs_tbl,
                                             threshold)

    def pair_rows_a(t: pa.Table) -> pa.Table:
        return pa.table({
            "jkey": t.column("doc_a"),
            "doc_a": t.column("doc_a"),
            "doc_b": t.column("doc_b"),
            "sh": pa.nulls(t.num_rows, pa.binary()),
            "_side": pa.array(np.ones(t.num_rows, np.int8), pa.int8()),
        })

    def kernel_a(tbl: pa.Table) -> pa.Table:
        side = tbl.column("_side").to_numpy(zero_copy_only=False)
        sh_rows = tbl.filter(pa.array(side == 0))
        smap = dict(zip(sh_rows.column("jkey").to_pylist(),
                        sh_rows.column("sh").to_pylist()))
        pair_t = tbl.filter(pa.array(side == 1))
        a, b, _ = _dedupe_pair_rows(pair_t)
        return pa.table({
            "jkey": pa.array(b, pa.int64()),  # next exchange keys on doc_b
            "doc_a": pa.array(a, pa.int64()),
            "doc_b": pa.array(b, pa.int64()),
            "sh": pa.array([smap.get(x, b"") for x in a.tolist()],
                           pa.binary()),
            "_side": pa.array(np.ones(len(a), np.int8), pa.int8()),
        })

    stage_a = (add_hash_partition(
        partials.map_batches(pair_rows_a, batch_format="pyarrow")
        .union(shingles), ["jkey"], P)
        .groupby("part").map_groups(kernel_a, batch_format="pyarrow"))

    def kernel_b(tbl: pa.Table) -> pa.Table:
        side = tbl.column("_side").to_numpy(zero_copy_only=False)
        sh_rows = tbl.filter(pa.array(side == 0))
        smap = dict(zip(sh_rows.column("jkey").to_pylist(),
                        sh_rows.column("sh").to_pylist()))
        pair_t = tbl.filter(pa.array(side == 1))
        npairs = pair_t.num_rows
        if npairs == 0:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64())})
        a = pair_t.column("doc_a").to_numpy(zero_copy_only=False)
        b = pair_t.column("doc_b").to_numpy(zero_copy_only=False)
        sh_a = pair_t.column("sh").to_pylist()
        sh_b = [smap.get(y, b"") for y in b.tolist()]
        j = _pair_jaccard_from_blobs(sh_a, sh_b)
        keep = j >= threshold
        return pa.table({
            "doc_a": pa.array(a[keep], pa.int64()),
            "doc_b": pa.array(b[keep], pa.int64()),
            "jaccard": pa.array(j[keep], pa.float64()),
        })

    return (add_hash_partition(stage_a.union(shingles), ["jkey"], P)
            .groupby("part").map_groups(kernel_b, batch_format="pyarrow"))


_GRAM_WORD_RE = None


def _gram_words(text: str) -> List[str]:
    """ASCII [a-z0-9]+ tokens of lower(text) — matches the DuckDB oracle's
    ``regexp_extract_all(lower(text), '[a-z0-9]+')`` exactly."""
    global _GRAM_WORD_RE
    if _GRAM_WORD_RE is None:
        import re
        _GRAM_WORD_RE = re.compile(r"[a-z0-9]+")
    return _GRAM_WORD_RE.findall(text.lower())


_WORD_HASH_CACHE: Dict[str, int] = {}
# positional odd multipliers for order-sensitive gram mixing (fixed, public)
_GRAM_MIX = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                      0x165667B19E3779F9, 0x27D4EB2F165667C5,
                      0x85EBCA77C2B2AE63, 0xFF51AFD7ED558CCD,
                      0xC4CEB9FE1A85EC53, 0x2545F4914F6CDD1D],
                     dtype=np.uint64)


def _word_hash(w: str) -> int:
    h = _WORD_HASH_CACHE.get(w)
    if h is None:
        if len(_WORD_HASH_CACHE) > 1_000_000:  # bound per-actor memory
            _WORD_HASH_CACHE.clear()
        h = int.from_bytes(
            hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
        _WORD_HASH_CACHE[w] = h
    return h


def _distinct_gram_hashes(text: str, k: int) -> np.ndarray:
    """Distinct word k-gram hashes; docs with < k words emit none (same rule
    as the SQL oracle). One blake2b per DISTINCT word (cached per actor),
    gram combination vectorized in uint64 numpy — equivalent gram identity
    (order-sensitive mix of the k word hashes), ~20x cheaper than hashing
    every joined gram string."""
    words = _gram_words(text)
    n = len(words)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    wh = np.fromiter((_word_hash(w) for w in words), dtype=np.uint64, count=n)
    acc = np.zeros(n - k + 1, dtype=np.uint64)
    for j in range(k):
        acc += wh[j:n - k + 1 + j] * _GRAM_MIX[j % len(_GRAM_MIX)]
        acc ^= acc >> np.uint64(29)
        acc *= np.uint64(0xBF58476D1CE4E5B9)
    return np.unique(acc >> np.uint64(1))  # fit int64, distinct


class NgramStage:
    """Per-batch exploded (gram, doc_id, n_doc) distinct rows — the
    inverted-index build. ``n_doc`` is the doc's total distinct-gram count,
    a per-doc constant replicated onto its rows so pair kernels know both
    Jaccard denominators locally (no second corpus pass, no driver-side
    count dict, no join). Only int64 rows leave this stage, never text."""

    def __init__(self, k: int = 3, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.k = k
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        per_doc = [_distinct_gram_hashes(t or "", self.k) for t in texts]
        grams = (np.concatenate(per_doc) if per_doc
                 else np.empty(0, dtype=np.uint64))
        # np.full + concatenate instead of np.repeat: memset/memcpy SIMD
        # paths, ~100x faster than repeat's per-element gather on some hosts
        docs = (np.concatenate(
            [np.full(len(g), i, np.int64)
             for i, g in zip(ids, per_doc)]) if per_doc
            else np.empty(0, dtype=np.int64))
        ndoc = (np.concatenate(
            [np.full(len(g), len(g), np.int64) for g in per_doc])
            if per_doc else np.empty(0, dtype=np.int64))
        return pa.table({
            "gram": pa.array(grams.astype(np.int64), pa.int64()),
            self.id_col: pa.array(docs, pa.int64()),
            "n_doc": pa.array(ndoc, pa.int64()),
        })


def _ngram_partition_counts(id_col: str, max_df: Optional[int]):
    """Partition kernel: exact bucket-local pair intersection counts (plus
    per-doc capped-gram counts when ``max_df`` is set — the hot-gram cap
    that keeps one stop-gram from producing C(df,2) pair instances in a
    single partition)."""
    def fn(tbl: pa.Table) -> pa.Table:
        return _bucket_pair_counts(
            tbl.column("gram").to_numpy(zero_copy_only=False),
            tbl.column(id_col).to_numpy(zero_copy_only=False),
            tbl.column("n_doc").to_numpy(zero_copy_only=False),
            max_df)
    return fn


def ngram_jaccard_pairs(ds, k: int = 3, threshold: float = 0.5,
                        concurrency=None, text_col: str = "text",
                        id_col: str = "doc_id",
                        num_parts: Optional[int] = None,
                        max_df: Optional[int] = None,
                        metric: str = "jaccard"):
    """Exact n-gram Jaccard near-dup pairs: (doc_a, doc_b, jaccard >= t).

    ``metric="containment"`` scores isect / min(n_a, n_b) instead
    (max-containment): a short document quoted inside a long one scores
    ~1.0 where Jaccard is diluted by the length ratio — the
    RefinedWeb-style subset-duplicate signal. Same exchange plan, same
    exactness; only the final pure-map denominator and the output score
    column name change.

    Fully distributed, ONE corpus pass, zero driver-side state: the
    inverted index (gram, doc_id, n_doc) is hash-partitioned by gram and
    partial pair-intersection counts are computed per partition; each pair
    partial already carries both docs' distinct-gram totals (shipped on the
    exploded rows), so one distributed (doc_a, doc_b) groupby sums partials
    into exact intersections and a pure map computes Jaccard. No candidate
    collection, no broadcast, no second pass over the docs table.

    ``max_df`` (the hot-gram cap — REQUIRED at web scale): grams appearing
    in more than max_df documents are excluded from the similarity, i.e.
    Jaccard is computed over the df-filtered gram vocabulary (standard
    stop-gram removal; one gram shared by 1M docs would otherwise create
    C(1M,2) pair instances in a single partition). With max_df=None the
    result is exact full-vocabulary Jaccard (the SQL-oracle semantics).
    Denominators are adjusted by per-doc capped-gram counts aggregated from
    the index partitions themselves, then attached with two distributed
    left joins — exact for the filtered vocabulary, still zero driver state.
    """
    import pyarrow.compute as pc

    from .shuffle import hash_join

    P = num_parts or default_num_parts()
    if concurrency is None:
        # plain tasks (per-process cached stage): zero pool-spawn ramp for
        # a microsecond-__init__ stage — see shuffle.TaskStage
        grams = ds.map_batches(
            TaskStage(NgramStage, k=k, text_col=text_col, id_col=id_col),
            batch_format="pyarrow")
    else:
        grams = ds.map_batches(
            NgramStage,
            fn_constructor_kwargs={"k": k, "text_col": text_col,
                                   "id_col": id_col},
            batch_format="pyarrow", concurrency=concurrency)
    rows = (add_hash_partition(grams, ["gram"], P)
            .groupby("part")
            .map_groups(_ngram_partition_counts(id_col, max_df),
                        batch_format="pyarrow"))

    def agg_pairs(pair_rows):
        # candidate-pair cardinality can reach millions — reduce with the
        # partitioned vectorized groupby. n_a/n_b are per-doc constants, so
        # "min" just picks the replicated value.
        return partitioned_group_agg(
            pair_rows, ["doc_a", "doc_b"],
            [("isect", "sum", "isect"),
             ("n_a", "min", "n_a"), ("n_b", "min", "n_b")])

    assert metric in ("jaccard", "containment"), metric

    def jaccard_map(cols_na="n_a", cols_nb="n_b"):
        def finish(batch: pa.Table) -> pa.Table:
            isect = batch.column("isect").to_numpy(
                zero_copy_only=False).astype(np.float64)
            na = batch.column(cols_na).to_numpy(
                zero_copy_only=False).astype(np.float64)
            nb = batch.column(cols_nb).to_numpy(
                zero_copy_only=False).astype(np.float64)
            if metric == "containment":
                denom = np.minimum(na, nb)
            else:
                denom = na + nb - isect
            denom[denom == 0] = 1.0
            jac = isect / denom
            keep = jac >= threshold
            return pa.table({
                "doc_a": batch.column("doc_a").filter(pa.array(keep)),
                "doc_b": batch.column("doc_b").filter(pa.array(keep)),
                metric: pa.array(jac[keep], pa.float64()),
            })
        return finish

    if max_df is None:
        # exact mode: no kind-1 rows exist; drop the tag and finish lazily
        pair_rows = rows.map_batches(
            lambda t: t.drop_columns(["kind"]), batch_format="pyarrow")
        return agg_pairs(pair_rows).map_batches(jaccard_map(),
                                                batch_format="pyarrow")

    # capped mode: rows feed two branches — materialize the int rows once
    rows = rows.materialize()
    pair_rows = rows.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), 0))
                   .drop_columns(["kind"]), batch_format="pyarrow")
    capped_rows = rows.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), 1))
                   .select(["doc_a", "isect"])
                   .rename_columns(["doc_id", "v"]), batch_format="pyarrow")
    # materialize both join inputs: hash_join consults .schema(), which
    # would otherwise execute these all-to-all pipelines a second time
    inter = agg_pairs(pair_rows).materialize()
    capped = partitioned_group_agg(capped_rows, ["doc_id"],
                                   [("v", "sum", "n_capped")]).materialize()
    if inter.count() == 0:
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            metric: pa.array([], pa.float64())}))
    if capped.count() == 0:  # nothing was capped: totals need no adjustment
        return inter.map_batches(jaccard_map(), batch_format="pyarrow")

    def ren(frm, to, cnt):
        return capped.map_batches(
            lambda t: t.rename_columns([to, cnt]), batch_format="pyarrow")

    i64 = pa.int64()
    j1 = hash_join(inter, ren("doc_id", "doc_a", "cap_a"), on="doc_a",
                   how="left", num_parts=P,
                   right_types={"doc_a": i64, "cap_a": i64})
    # left_types: j1 is a join output — a schema() probe would execute it
    # once for the probe and again for the real run
    j2 = hash_join(j1, ren("doc_id", "doc_b", "cap_b"), on="doc_b",
                   how="left", num_parts=P,
                   left_types={"doc_a": i64, "doc_b": i64, "isect": i64,
                               "n_a": i64, "n_b": i64, "cap_a": i64},
                   right_types={"doc_b": i64, "cap_b": i64})

    def adjust(batch: pa.Table) -> pa.Table:
        cap_a = pc.fill_null(batch.column("cap_a"), 0)
        cap_b = pc.fill_null(batch.column("cap_b"), 0)
        return pa.table({
            "doc_a": batch.column("doc_a"),
            "doc_b": batch.column("doc_b"),
            "isect": batch.column("isect"),
            "n_a": pc.subtract(batch.column("n_a"), cap_a),
            "n_b": pc.subtract(batch.column("n_b"), cap_b),
        })

    return (j2.map_batches(adjust, batch_format="pyarrow")
            .map_batches(jaccard_map(), batch_format="pyarrow"))


class PrefixGramStage:
    """Map kernel for the prefix-filtered exact Jaccard join: per doc,
    emit (gram, doc, n_doc) rows for the doc's PREFIX grams only — the
    first ``n - ceil(t*n) + 1`` grams under a fixed global token order
    (prefix-filtering principle: two sets with Jaccard >= t always share
    a prefix token; Chaudhuri et al. 2006 / Bayardo et al. 2007 /
    Xiao et al. 2008, re-derived and fuzz-verified in tests).

    The global order is ascending hash with SAMPLED-HOT grams moved last
    (``hot_ref``): correctness holds under ANY fixed global order, the
    hot-last ordering is purely a pruning optimization — it keeps
    corpus-wide stop-grams out of the short prefixes, so the exchange
    never builds the quadratic hot bucket the unfiltered index suffers
    from. ceil is computed with a downward epsilon so float error can
    only LENGTHEN the prefix (more candidates), never shorten it
    (missed pairs)."""

    def __init__(self, k: int, threshold: float, text_col: str,
                 id_col: str, hot_ref=None):
        self.k = k
        self.t = threshold
        self.text_col = text_col
        self.id_col = id_col
        if hot_ref is not None:
            import ray
            self.hot = np.sort(ray.get(hot_ref)).astype(np.uint64)
        else:
            self.hot = np.empty(0, np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import math
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        g_out, d_out, n_out, p_out = [], [], [], []
        for i, t in zip(ids, texts):
            h = _distinct_gram_hashes(t or "", self.k)
            n = len(h)
            if n == 0:
                continue
            if self.hot.size:
                hotmask = np.isin(h, self.hot)
                if hotmask.any():
                    h = np.concatenate([h[~hotmask], h[hotmask]])
            L = n - int(math.ceil(self.t * n - 1e-9)) + 1
            pref = h[:L]
            g_out.append(pref)
            d_out.append(np.full(L, i, np.int64))
            n_out.append(np.full(L, n, np.int64))
            # gram's rank in the doc's ordered gram list — feeds the
            # PPJoin positional filter in the bucket kernel
            p_out.append(np.arange(L, dtype=np.int64))
        if not g_out:
            return pa.table({"gram": pa.array([], pa.int64()),
                             self.id_col: pa.array([], pa.int64()),
                             "n_doc": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        return pa.table({
            "gram": pa.array(np.concatenate(g_out).astype(np.int64),
                             pa.int64()),
            self.id_col: pa.array(np.concatenate(d_out), pa.int64()),
            "n_doc": pa.array(np.concatenate(n_out), pa.int64()),
            "pos": pa.array(np.concatenate(p_out), pa.int64()),
        })


def _prefix_partition_pairs(max_bucket: Optional[int], threshold: float,
                            id_col: str):
    """Partition kernel: per prefix-gram bucket, candidate pairs passing
    the size filter (Jaccard <= min/max, so min_n >= t*max_n is required
    — exact pruning). Locally deduped; global dedupe happens in the
    shared verify. ``max_bucket=None`` (the default) bounds NOTHING so
    exactness holds unconditionally — a stop-gram the sampled hot list
    missed makes the run slow, never wrong. Setting max_bucket trades
    exactness for a worst-case bound: oversized buckets are skipped,
    losing pairs whose ONLY shared prefix gram was the hot one."""
    import pandas as pd

    cap = float("inf") if max_bucket is None else max_bucket

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        order, starts = _sorted_runs(pdf, ["gram"])
        docs = pdf[id_col].to_numpy()[order]
        ns = pdf["n_doc"].to_numpy()[order]
        pos = pdf["pos"].to_numpy()[order]
        out_a, out_b = [], []
        for bi in range(len(starts) - 1):
            s, e = starts[bi], starts[bi + 1]
            m = e - s
            if m < 2 or m > cap:
                continue
            d, n, p = docs[s:e], ns[s:e], pos[s:e]
            ii, jj = np.triu_indices(m, 1)
            dx, dy = d[ii], d[jj]
            nx, ny = n[ii], n[jj]
            lo = np.minimum(nx, ny)
            hi = np.maximum(nx, ny)
            # size filter: J <= lo/hi, exact (epsilon only widens)
            keep = (dx != dy) & (lo + 1e-9 >= threshold * hi)
            # PPJoin positional filter (Xiao et al. 2008): sharing gram g
            # at ranks (px, py), overlap <= min(px,py) + 1 +
            # min(nx-px-1, ny-py-1); Jaccard >= t needs overlap >=
            # ceil(t*(nx+ny)/(1+t)). Every bound is valid for the TRUE
            # overlap, so a pair above threshold passes in EVERY bucket —
            # rejecting here can never lose a real pair (epsilon rounds
            # alpha down, keeping borderline pairs).
            px, py = p[ii], p[jj]
            alpha = np.ceil(threshold * (nx + ny) / (1.0 + threshold)
                            - 1e-9)
            ub = (np.minimum(px, py) + 1
                  + np.minimum(nx - px - 1, ny - py - 1))
            keep &= ub >= alpha
            if keep.any():
                a, b = dx[keep], dy[keep]
                swap = a > b
                a2 = np.where(swap, b, a)
                b2 = np.where(swap, a, b)
                out_a.append(a2)
                out_b.append(b2)
        if not out_a:
            return _empty_pairs_df()
        ab = np.stack([np.concatenate(out_a), np.concatenate(out_b)],
                      axis=1)
        ab = np.unique(ab, axis=0)  # local dedupe; global in the verify
        return pd.DataFrame({"doc_a": ab[:, 0], "doc_b": ab[:, 1]})
    return fn


def ngram_jaccard_pairs_prefix(ds, k: int = 3, threshold: float = 0.5,
                               text_col: str = "text",
                               id_col: str = "doc_id",
                               num_parts: Optional[int] = None,
                               max_bucket: Optional[int] = None,
                               broadcast_limit: int = 2_000_000,
                               blob_broadcast_bytes: int = 256 * 1024 * 1024,
                               hot_sample: int = 10_000,
                               hot_frac: float = 0.05):
    """Exact n-gram Jaccard near-dup pairs via PPJoin-style prefix
    filtering: same output as ``ngram_jaccard_pairs`` (the two are
    equality-tested), different scale shape. Instead of exchanging the
    FULL inverted index, only each doc's prefix grams (a (1-t) fraction)
    are exchanged — at threshold 0.8 that is ~5x less index volume — and
    candidate pairs are verified with exact set Jaccard on the shared
    size-gated verify (broadcast below ``broadcast_limit`` candidate
    pairs, two blob-attaching exchanges above; zero driver blob state on
    the large path).

    The global token order is ascending hash with sampled-hot grams
    last: a bounded ``hot_sample``-doc HEAD sample (``ds.limit`` — the
    first rows in dataset order, cheap but biased for source-ordered
    corpora; feed a pre-shuffled dataset or raise ``hot_sample`` when
    boilerplate is source-local) estimates stop-grams (appearing in >
    ``hot_frac`` of sampled docs), which are pushed out of every prefix
    — the hot-gram quadratic bucket that forces ``max_df``
    (approximation) on the unfiltered op usually never forms here. The
    ordering does not affect correctness, only pruning: a stop-gram the
    sample MISSES makes one bucket slow, never the answer wrong, because
    ``max_bucket`` defaults to None (unbounded). Setting ``max_bucket``
    installs a worst-case work bound that SKIPS oversized buckets and
    then this function is no longer exact — pairs whose only shared
    prefix gram was skipped are lost (the equality claim above holds
    only for max_bucket=None). Prefer this variant at web scale and
    threshold >= 0.5 (index volume shrinks ~(1-t)x); the unfiltered op
    wins at low thresholds (prefixes approach the whole set) and at
    small corpus sizes, where its single text pass beats this plan's
    two (prefix build + candidate-blob semi-join)."""
    import functools
    import ray
    import ray.data as rd

    if not (0.0 < threshold <= 1.0):
        raise ValueError(
            f"threshold must be in (0, 1], got {threshold} — the prefix "
            f"length n - ceil(t*n) + 1 degenerates outside that range")

    P = num_parts or default_num_parts()

    # sampled hot-gram list (pruning hint only — correctness-independent).
    # Gram hashing runs DISTRIBUTED over the bounded sample; each task
    # forwards only its batch-hot grams (half the global cutoff rate, so
    # borderline grams still surface), the driver merges kilobytes.
    hot_ref = None
    if hot_sample > 0:
        def batch_hot(batch: pa.Table) -> pa.Table:
            texts = batch.column(text_col).to_pylist()
            nd = len(texts)
            sets = [_distinct_gram_hashes(t or "", k) for t in texts]
            allh = (np.concatenate(sets) if sets
                    else np.empty(0, np.uint64))
            vals, cnts = np.unique(allh, return_counts=True)
            cut = max(1, int(hot_frac * nd / 2))
            m = cnts >= cut
            # gram hashes are >>1-shifted, so they fit int64 and are >= 0;
            # gram = -1 is the per-batch doc-count sentinel row
            return pa.table({
                "gram": pa.array(
                    np.r_[vals[m].astype(np.int64), -1], pa.int64()),
                "df": pa.array(np.r_[cnts[m].astype(np.int64), nd],
                               pa.int64()),
            })

        rows = (ds.limit(hot_sample).select_columns([text_col])
                .map_batches(batch_hot, batch_format="pyarrow")
                .take_all())
        from collections import Counter
        df_counts: Counter = Counter()
        n_docs = 0
        for r in rows:
            if r["gram"] == -1:
                n_docs += r["df"]
            else:
                df_counts[r["gram"]] += r["df"]
        cutoff = max(2, int(hot_frac * n_docs))
        hot = np.array([g for g, c in df_counts.items() if c >= cutoff],
                       dtype=np.uint64)
        if hot.size:
            hot_ref = ray.put(hot)

    triples = ds.map_batches(
        TaskStage(PrefixGramStage, k=k, threshold=threshold,
                  text_col=text_col, id_col=id_col, hot_ref=hot_ref),
        batch_format="pyarrow")
    partials = (add_hash_partition(triples, ["gram"], P)
                .groupby("part")
                .map_groups(_prefix_partition_pairs(max_bucket, threshold,
                                                    id_col),
                            batch_format="pandas")).materialize()
    return _exact_jaccard_verify(
        ds, partials, functools.partial(_distinct_gram_hashes, k=k),
        threshold, text_col, id_col, P, broadcast_limit,
        blob_broadcast_bytes)


def ngram_jaccard_matrix(texts: List[str], k: int = 5) -> np.ndarray:
    """Exact pairwise n-gram Jaccard for a SMALL list (test/oracle helper)."""
    sets = [_word_shingles(t, k) for t in texts]
    n = len(sets)
    out = np.zeros((n, n))
    for i in range(n):
        for j in range(i, n):
            union = len(sets[i] | sets[j])
            out[i, j] = out[j, i] = (len(sets[i] & sets[j]) / union
                                     if union else 0.0)
    return out


class SimHashStage:
    """64-bit SimHash per document over word features (Charikar 2002)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    @staticmethod
    def simhash(text: str) -> int:
        """Vectorized: one cached blake2b per distinct word, then a single
        unpackbits + column sum over the (n_words, 64) bit matrix. Bit
        order is MSB-first (big-endian bytes), duplicate words counted per
        occurrence — byte-identical to the per-word reference loop."""
        words = text.split()
        if not words:
            return 0
        n = len(words)
        wh = np.fromiter((_word_hash(w) for w in words), dtype=np.uint64,
                         count=n)
        be = wh.astype(">u8").view(np.uint8).reshape(n, 8)  # big-endian bytes
        bits = np.unpackbits(be, axis=1)                 # (n, 64) MSB-first
        votes = bits.astype(np.int64).sum(axis=0) * 2 - n
        out_bits = (votes > 0).astype(np.uint8)
        return int.from_bytes(np.packbits(out_bits).tobytes(), "big")

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Emit exploded (band_id, band_val, doc_id, simhash) rows — only a
        few ints per doc leave this stage, never the text."""
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out_doc, out_band, out_val, out_hash = [], [], [], []
        for doc_id, text in zip(ids, texts):
            h = self.simhash(text or "")
            # two's-complement int64 keeps ALL 64 bits (a >>1 truncation
            # would lose bit 0 and understate hamming distances by one)
            h64 = h - (1 << 64) if h >= (1 << 63) else h
            for b in range(4):
                out_doc.append(doc_id)
                out_band.append(b)
                out_val.append((h >> (16 * b)) & 0xFFFF)
                out_hash.append(h64)
        return pa.table({
            "doc_id": pa.array(out_doc, pa.int64()),
            "band_id": pa.array(out_band, pa.int32()),
            "band_val": pa.array(out_val, pa.int32()),
            "simhash": pa.array(out_hash, pa.int64()),
        })


def _simhash_partition_pairs(max_hamming: int, max_bucket: int):
    """Partition kernel: bucket-local pairs whose full-hash hamming distance
    is <= max_hamming. The hamming check runs here, so a mix collision or a
    skew-capped bucket can only DROP candidates, never fabricate pairs.
    Hamming is a property of the pair (not the band), so cross-band
    duplicates carry identical distances and the global Min-dedupe is
    value-preserving."""
    import pandas as pd

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        order, starts = _sorted_runs(pdf, ["band_id", "band_val"])
        docs = pdf["doc_id"].to_numpy()[order]
        hashes = pdf["simhash"].to_numpy()[order]
        out = set()
        for bi in range(len(starts) - 1):
            s, e = starts[bi], starts[bi + 1]
            if e - s < 2 or e - s > max_bucket:  # skew cap (as before)
                continue
            sub = sorted(zip(docs[s:e].tolist(), hashes[s:e].tolist()))
            for i in range(len(sub)):
                for j in range(i + 1, len(sub)):
                    if sub[i][0] == sub[j][0]:
                        continue
                    # mask to 64 bits: XOR of negative (two's-complement)
                    # python ints sign-extends infinitely
                    dist = bin((sub[i][1] ^ sub[j][1])
                               & 0xFFFFFFFFFFFFFFFF).count("1")
                    if dist <= max_hamming:
                        out.add((sub[i][0], sub[j][0], dist))
        if not out:
            return _empty_pairs_df({"hamming": "int64"})
        arr = np.array(sorted(out), dtype=np.int64)
        return pd.DataFrame({"doc_a": arr[:, 0], "doc_b": arr[:, 1],
                             "hamming": arr[:, 2]})
    return fn


def simhash_pairs(ds, max_hamming: int = 3, concurrency=None,
                  text_col: str = "text", id_col: str = "doc_id",
                  num_parts: Optional[int] = None, max_bucket: int = 200):
    """Near-dup pairs with SimHash hamming distance <= max_hamming.

    A pair within distance 3 of a 64-bit hash must collide on at least one
    of four 16-bit bands (pigeonhole), so candidates come from band-bucket
    groups. Fully distributed: (band, doc_id, simhash) int rows are
    hash-partitioned by bucket key, pairs generated per partition, and
    cross-band duplicates removed by a distributed (doc_a, doc_b) groupby —
    no driver-side pass at any point. Returns a Dataset
    (doc_a, doc_b, hamming)."""
    P = num_parts or default_num_parts()
    if concurrency is None:
        sims = ds.map_batches(
            TaskStage(SimHashStage, text_col=text_col, id_col=id_col),
            batch_format="pyarrow")
    else:
        sims = ds.map_batches(
            SimHashStage, fn_constructor_kwargs={"text_col": text_col,
                                                 "id_col": id_col},
            batch_format="pyarrow", concurrency=concurrency)
    partials = (add_hash_partition(sims, ["band_id", "band_val"], P)
                .groupby("part")
                .map_groups(_simhash_partition_pairs(max_hamming, max_bucket),
                            batch_format="pandas"))
    return _distinct_pairs(partials,
                           extra_agg=("hamming", "min", "hamming"))
