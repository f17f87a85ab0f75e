"""Link-graph operator family: outlink extraction from raw HTML and
distributed PageRank over the resulting edge list.

The reference engine (chriscorrea/sift) is a per-document extractor and
has no cross-document operators; link analysis is the canonical
cross-document computation of a web-scale corpus (crawl frontier
prioritization, spam demotion, quality-weighted sampling of training
data), so it belongs in this engine's training-data family alongside
dedup and retrieval.

Scale shape:
- ``extract_outlinks`` is embarrassingly parallel (one DOM parse per
  page, zero shuffle) — the same stage shape as the extraction pipeline.
- ``pagerank`` is the standard synchronous power iteration expressed in
  this repo's exchange primitives: per iteration the edge table moves
  through ONE src-keyed exchange (joined against the node-sized rank
  state), per-partition contributions are pre-summed by destination
  before ONE dst-keyed exchange, and the summed in-flows join back onto
  the state through ONE node-keyed exchange. Driver traffic per
  iteration is two integers (dangling mass, node count). Iteration
  state is node-proportional and re-materialized each step (the one
  documented use of mid-pipeline materialization: iterative algorithms
  need their lineage truncated). A production run on a co-partitioned
  store would cache the edge partitioning across iterations; Ray Data
  has no co-partitioned join reuse, so the edges re-shuffle per
  iteration — the classic Spark-without-partitioner cost, noted here
  deliberately.

Determinism: all PageRank arithmetic is int64 (ranks in fixed-point
"micro-rank" units, floor division for the per-edge contribution and
the damping blend). Integer addition is commutative, so the result is
bit-identical under any partitioning / summation order — and exactly
reproducible in ANSI SQL (the driver oracle runs the same recurrence as
an unrolled chain of CTEs in DuckDB). Choose ``scale`` so that
``100 * n_nodes * scale < 2**63``.
"""

from __future__ import annotations

import re
from typing import Optional
from urllib.parse import urljoin, urlsplit

import numpy as np
import pyarrow as pa

_SKIP_SCHEME_RE = re.compile(r"^(javascript|mailto|tel|data):", re.I)
_WS_RE = re.compile(r"\s+")


def _page_outlinks(url: str, html: str, max_links: int):
    """(dst, anchor) pairs for one page: every <a href> resolved against
    the page URL (honoring the first <base href>), fragments stripped,
    non-navigational schemes (javascript/mailto/tel/data) and
    fragment-only self-links dropped."""
    from ..dom.parser import parse_html

    root = parse_html(html)
    try:
        return _page_links_from_root(root, url, max_links)
    finally:
        root.release_tree()


def _page_links_from_root(root, url, max_links):
    base = url
    for b in root.iter_elements("base"):
        href = b.get("href").strip()
        if href:
            base = urljoin(url, href)
        break
    out = []
    for a in root.iter_elements("a"):
        href = a.get("href").strip()
        if not href or href.startswith("#") or _SKIP_SCHEME_RE.match(href):
            continue
        dst = urljoin(base, href)
        dst = dst.split("#", 1)[0]
        if not dst.startswith(("http://", "https://")):
            continue
        anchor = _WS_RE.sub(" ", a.text_content()).strip()[:200]
        nofollow = "nofollow" in a.get("rel").lower()
        out.append((dst, anchor, nofollow))
        if max_links is not None and len(out) >= max_links:
            break
    return out


class OutlinkStage:
    """Batch kernel for outlink extraction. Stateless apart from the
    config; run it as plain tasks (``shuffle.TaskStage``) — DOM parsing
    per page is the cost, setup is microseconds."""

    def __init__(self, max_bytes: int = 50 * 1024 * 1024,
                 max_links: Optional[int] = None):
        self.max_bytes = max_bytes
        self.max_links = max_links

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        src_o, dst_o, anchor_o, nf_o = [], [], [], []
        for url, html in zip(urls, htmls):
            if html is None:
                continue
            if isinstance(html, bytes):
                if len(html) > self.max_bytes:
                    continue  # oversize pages contribute no edges
                html = html.decode("utf-8", errors="replace")
            elif len(html) > self.max_bytes:
                continue
            try:
                links = _page_outlinks(url, html, self.max_links)
            except Exception:
                continue  # pathological DOM: no edges, never a task error
            for dst, anchor, nofollow in links:
                src_o.append(url)
                dst_o.append(dst)
                anchor_o.append(anchor)
                nf_o.append(nofollow)
        return pa.table({"src": pa.array(src_o, pa.string()),
                         "dst": pa.array(dst_o, pa.string()),
                         "anchor": pa.array(anchor_o, pa.string()),
                         "nofollow": pa.array(nf_o, pa.bool_())})


def extract_outlinks(pages, max_bytes: int = 50 * 1024 * 1024,
                     max_links: Optional[int] = None):
    """Dataset of (src, dst, anchor) hyperlink edges from a pages table
    with (url, html) columns. Zero shuffle; scales as the extract stage
    does."""
    from .shuffle import TaskStage
    return pages.map_batches(
        TaskStage(OutlinkStage, max_bytes=max_bytes, max_links=max_links),
        batch_format="pyarrow")


def host_edges(edges, num_parts: Optional[int] = None):
    """Collapse a URL edge list to the host graph: (src_host, dst_host,
    n) with n = number of page-level links. One host-pair-keyed exchange
    (in-batch pre-aggregation via Arrow group_by happens inside the
    partition kernel)."""
    from .shuffle import partitioned_group_agg
    from .sketch import _hash64_route

    def to_hosts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "src" not in t.column_names:
            return pa.table({"src_host": pa.array([], pa.string()),
                             "dst_host": pa.array([], pa.string())})
        sh = [urlsplit(u).netloc.lower() for u in t.column("src").to_pylist()]
        dh = [urlsplit(u).netloc.lower() for u in t.column("dst").to_pylist()]
        return pa.table({"src_host": pa.array(sh, pa.string()),
                         "dst_host": pa.array(dh, pa.string())})

    hosts = edges.map_batches(to_hosts, batch_format="pyarrow")

    def key_hash(batch: pa.Table):
        return [_hash64_route(batch.column("src_host")).astype(np.int64),
                _hash64_route(batch.column("dst_host")).astype(np.int64)]

    return partitioned_group_agg(hosts, ["src_host", "dst_host"],
                                 [(None, "count", "n")],
                                 num_parts=num_parts,
                                 key_arrays_fn=key_hash)


def _tolerate_empty(schema: pa.Schema):
    """Map fn that normalizes Ray's 0-column empty blocks (emitted for
    empty map_groups sort ranges) to a typed empty table."""
    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 and (t.num_columns == 0
                                or t.column_names != schema.names):
            return schema.empty_table()
        return t
    return fn


# serial-path gate for pagerank: graphs with nodes+edges at or below
# this run the exact integer recurrence on the driver (see pagerank)
_SERIAL_PR_LIMIT = 2_000_000


def pagerank(edges, iters: int = 6, d_num: int = 85, d_den: int = 100,
             scale: int = 10 ** 12, num_parts: Optional[int] = None):
    """Distributed PageRank over an int64 edge list (src, dst) in exact
    fixed-point arithmetic; returns a Dataset of (node, rank) int64 rows.

    Recurrence (all int64, floor division)::

        r_0(v)    = scale
        c(s->v)   = r_i(s) // outdeg(s)
        D_i       = sum of r_i over dangling nodes (outdeg 0)
        r_{i+1}(v) = ((d_den - d_num) * scale
                      + d_num * (sum_in c + D_i // n)) // d_den

    Integer sums are order-free, so the result is identical under any
    partitioning — and byte-reproducible by the unrolled-CTE SQL oracle
    (``__ray_entry__.oracle_sql()['pagerank_customers']``). String-keyed
    graphs (URL edges from ``extract_outlinks``) are dictionary-encoded
    to int64 ids first (``doc_fingerprints``-style hashing or a distinct
    exchange); this kernel stays int-keyed on purpose — the exchanges
    move 16-byte edge rows, not URLs.
    """
    import pyarrow.compute as pc

    from .shuffle import (add_hash_partition, default_num_parts, hash_join,
                          partitioned_group_agg)

    P = num_parts or default_num_parts()
    i64 = pa.int64()

    # materialize the int edge table ONCE up front: it feeds everything
    # (and a lazy dataset would re-execute upstream lineage per consumer)
    edges64 = edges.map_batches(
        lambda t: (pa.table({"src": pa.array([], i64),
                             "dst": pa.array([], i64)})
                   if t.num_rows == 0 or "src" not in t.column_names
                   else pa.table({"src": pc.cast(t.column("src"), i64),
                                  "dst": pc.cast(t.column("dst"), i64)})),
        batch_format="pyarrow").materialize()
    n_edges = edges64.count()

    # size gate (repo convention, same as connected_components): nodes
    # only exist on edges, so n <= 2*n_edges; below the gate the whole
    # graph is int rows that fit driver memory, where node-set/degree/
    # state exchanges plus SIX iterations of two exchanges each are pure
    # fixed overhead (measured 5.4x at sf0.1). The serial path runs the
    # IDENTICAL integer recurrence (np.add.at keeps inflow sums exact
    # int64) — bit-identical, pinned by a forced-path equality test.
    if 3 * n_edges <= _SERIAL_PR_LIMIT:
        import ray.data as rd
        ed = pa.concat_tables(
            [pa.schema([("src", i64), ("dst", i64)]).empty_table()]
            + list(edges64.iter_batches(batch_size=1 << 20,
                                        batch_format="pyarrow"))
        ).combine_chunks()
        src_v = ed.column("src").to_numpy(zero_copy_only=False)
        dst_v = ed.column("dst").to_numpy(zero_copy_only=False)
        node = np.unique(np.concatenate([src_v, dst_v]))
        n = len(node)
        if n == 0:
            return rd.from_arrow(pa.schema([("node", i64),
                                            ("rank", i64)]).empty_table())
        src = np.searchsorted(node, src_v)
        dst = np.searchsorted(node, dst_v)
        deg = np.bincount(src, minlength=n).astype(np.int64)
        r = np.full(n, scale, dtype=np.int64)
        base = (d_den - d_num) * scale
        dangling = deg == 0
        safe_deg = np.maximum(deg, 1)
        for _ in range(iters):
            D = int(r[dangling].sum())
            c = r[src] // safe_deg[src]
            inflow = np.zeros(n, dtype=np.int64)
            np.add.at(inflow, dst, c)
            r = (base + d_num * (inflow + D // n)) // d_den
        return rd.from_arrow(pa.table({"node": pa.array(node, i64),
                                       "rank": pa.array(r, i64)}))

    # ---- node set: distinct(src) UNION distinct(dst), one exchange ----
    def both_cols(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "src" not in t.column_names:
            return pa.table({"node": pa.array([], i64)})
        s = pc.cast(t.column("src"), i64).combine_chunks()
        d = pc.cast(t.column("dst"), i64).combine_chunks()
        comb = pa.chunked_array([s, d], type=i64)
        return pa.table({"node": pc.unique(comb)})

    nodes_schema = pa.schema([("node", i64)])
    nodes = partitioned_group_agg(
        edges.map_batches(both_cols, batch_format="pyarrow"),
        ["node"], [(None, "count", "_c")], num_parts=P)
    nodes = nodes.map_batches(
        lambda t: (nodes_schema.empty_table()
                   if t.num_rows == 0 and "node" not in t.column_names
                   else t.select(["node"])),
        batch_format="pyarrow")

    # ---- out-degree per src, one exchange ----
    deg = partitioned_group_agg(edges, ["src"], [(None, "count", "deg")],
                                num_parts=P)
    deg = deg.map_batches(
        lambda t: (pa.table({"node": pa.array([], i64),
                             "deg": pa.array([], i64)})
                   if t.num_rows == 0 and "src" not in t.column_names
                   else t.rename_columns(["node", "deg"])),
        batch_format="pyarrow")

    state_schema = pa.schema([("node", i64), ("deg", i64), ("r", i64)])

    def init_state(joined: pa.Table) -> pa.Table:
        dg = pc.fill_null(pc.cast(joined.column("deg"), i64), 0)
        n_ = joined.num_rows
        return pa.table({"node": pc.cast(joined.column("node"), i64),
                         "deg": dg,
                         "r": pa.array(np.full(n_, scale, np.int64), i64)})

    state = hash_join(nodes, deg, on="node", how="left",
                      num_parts=P,
                      left_types={"node": i64},
                      right_types={"node": i64, "deg": i64},
                      post=init_state)
    # Bound the state's BLOCK count before every materialize: Ray's sort
    # exchange emits roughly as many (mostly tiny/empty) blocks as it
    # receives, so an unbounded loop compounds block count per iteration
    # and the next exchange's task fan-out grows superlinearly (measured
    # 320 -> 704 -> 1472 blocks, 10 -> 33 -> 168 s per iteration at 32
    # cpus). One node-sized repartition per iteration caps it at P.
    state = state.map_batches(_tolerate_empty(state_schema),
                              batch_format="pyarrow") \
                 .repartition(P).materialize()
    n = state.count()
    if n == 0:
        import ray.data as rd
        return rd.from_arrow(pa.schema([("node", i64),
                                        ("rank", i64)]).empty_table())

    # size-aware partition count: each exchange/materialize schedules
    # O(blocks) tasks PER ITERATION and per map stage, so at small graphs
    # fixed task overhead dominates (measured: the sf0.1 15k-node graph
    # spends ~8 s/iteration when the 64-block parquet read layout rides
    # through every iteration). Integer arithmetic is partition-invariant
    # (tested), so shrinking P never changes the result; large graphs
    # keep the cluster-sized default. The edge table's block count is
    # capped to P once — it feeds 2 map stages per iteration.
    P = min(P, max(4, (max(n_edges, n) + 131_071) // 131_072))

    edges64 = edges64.repartition(P).materialize()
    state = state.repartition(P).materialize()

    partial_schema = pa.schema([("dst", i64), ("a", i64)])

    def contribs(joined: pa.Table) -> pa.Table:
        # partition-local: per-edge contribution, pre-summed by dst
        # BEFORE the dst exchange (the combiner that keeps the second
        # exchange node-proportional, not edge-proportional)
        r = joined.column("r").to_numpy(zero_copy_only=False)
        dg = joined.column("deg").to_numpy(zero_copy_only=False)
        c = r // np.maximum(dg, 1)  # deg>=1 by construction (src rows)
        t = pa.table({"dst": joined.column("dst"), "a": pa.array(c, i64)})
        g = t.group_by(["dst"]).aggregate([("a", "sum")])
        return g.rename_columns(["dst", "a"])

    for _ in range(iters):
        # dangling mass: ONE int64 to the driver
        def dang_partial(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "deg" not in t.column_names:
                return pa.table({"dsum": pa.array([], i64)})
            m = pc.equal(t.column("deg"), 0)
            s = pc.sum(pc.cast(t.filter(m).column("r"), i64))
            return pa.table({"dsum": pa.array(
                [s.as_py() if s.as_py() is not None else 0], i64)})

        dang = state.map_batches(dang_partial, batch_format="pyarrow") \
                    .sum("dsum")
        D = int(dang or 0)

        src_schema = pa.schema([("src", i64), ("deg", i64), ("r", i64)])
        state_as_src = state.map_batches(
            lambda t: (src_schema.empty_table()
                       if t.num_rows == 0 and "node" not in t.column_names
                       else t.rename_columns(["src", "deg", "r"])),
            batch_format="pyarrow")
        inflow = hash_join(
            edges64, state_as_src, on="src", how="inner", num_parts=P,
            left_types={"src": i64, "dst": i64},
            right_types={"src": i64, "deg": i64, "r": i64},
            right_cols=["deg", "r"],
            post=contribs)
        inflow = inflow.map_batches(_tolerate_empty(partial_schema),
                                    batch_format="pyarrow")
        # rename dst -> node so the per-dst partials ride the STATE join's
        # exchange directly (each node has at most one partial per
        # src-partition; the post hook folds them) — one exchange per
        # iteration instead of a group-agg exchange plus a join exchange
        sums_schema = pa.schema([("node", i64), ("a", i64)])
        partials = inflow.map_batches(
            lambda t: (sums_schema.empty_table()
                       if t.num_rows == 0 and "dst" not in t.column_names
                       else t.rename_columns(["node", "a"])),
            batch_format="pyarrow")

        base = (d_den - d_num) * scale
        share = D // n

        def step(joined: pa.Table, base=base, share=share) -> pa.Table:
            # a left row per (node, partial); fold to one row per node:
            # deg/r are constants within the node, a sums (all-null -> 0)
            g = joined.group_by(["node"]).aggregate(
                [("deg", "min"), ("a", "sum")])
            a = pc.fill_null(pc.cast(g.column("a_sum"), i64), 0) \
                .to_numpy(zero_copy_only=False)
            r_new = (base + d_num * (a + share)) // d_den
            return pa.table({"node": g.column("node"),
                             "deg": g.column("deg_min"),
                             "r": pa.array(r_new, i64)})

        state = hash_join(state, partials, on="node", how="left",
                          num_parts=P,
                          left_types={"node": i64, "deg": i64, "r": i64},
                          right_types={"node": i64, "a": i64},
                          left_cols=["deg", "r"], right_cols=["a"],
                          post=lambda j, b=base, s=share: step(j, b, s))
        state = state.map_batches(_tolerate_empty(state_schema),
                                  batch_format="pyarrow") \
                     .repartition(P).materialize()  # cap block growth

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node"), "rank": t.column("r")})

    return state.map_batches(finish, batch_format="pyarrow")


def pagerank_hosts(host_edges_ds, iters: int = 6,
                   num_parts: Optional[int] = None):
    """PageRank over a STRING-keyed host graph (src_host, dst_host[, n])
    — the host-reputation signal a web-curation pipeline feeds into its
    quality gate. Returns (host, rank) with the same exact int64
    fixed-point semantics as ``pagerank``.

    Hosts are dictionary-encoded map-side to 63-bit content hashes (the
    exchanges move 16-byte int rows, never host strings); ranks join back
    to host names through one hash-keyed exchange over the DISTINCT
    (hash, host) pairs. A 63-bit hash collision would merge two hosts'
    ranks — odds ~n^2/2^63 (≈0.5% at 10^8 hosts), the standard
    dictionary-encode trade at this scale; swap in an exact distinct-rank
    encoding if a run ever demands zero collisions. Edge multiplicity
    (the ``n`` column) is ignored: standard unweighted PageRank over the
    distinct host pairs."""
    import pyarrow.compute as pc

    from .shuffle import default_num_parts, hash_join, partitioned_group_agg
    from .sketch import _hash64_any

    P = num_parts or default_num_parts()
    i64 = pa.int64()

    # materialize the (small, distinct-host-pair) edge table ONCE: both
    # the rank iteration and the name join consume it, and a lazy input
    # would re-execute its full upstream (e.g. corpus-wide outlink
    # extraction) once per consumer
    host_edges_ds = host_edges_ds.materialize()

    def to_int_edges(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "src_host" not in t.column_names:
            return pa.table({"src": pa.array([], i64),
                             "dst": pa.array([], i64)})
        # >> 1: keep hashes non-negative int63 (mix64 shifts stay defined)
        sh = (_hash64_any(t.column("src_host")) >> np.uint64(1)) \
            .astype(np.int64)
        dh = (_hash64_any(t.column("dst_host")) >> np.uint64(1)) \
            .astype(np.int64)
        return pa.table({"src": pa.array(sh, i64),
                         "dst": pa.array(dh, i64)})

    int_edges = host_edges_ds.map_batches(to_int_edges,
                                          batch_format="pyarrow")
    ranks = pagerank(int_edges, iters=iters, num_parts=P).materialize()

    def name_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "src_host" not in t.column_names:
            return pa.table({"node": pa.array([], i64),
                             "host": pa.array([], pa.string())})
        out = []
        for col in ("src_host", "dst_host"):
            h = (_hash64_any(t.column(col)) >> np.uint64(1)) \
                .astype(np.int64)
            out.append(pa.table({
                "node": pa.array(h, i64),
                "host": pc.cast(t.column(col), pa.string())}))
        return pa.concat_tables(out)

    def node_key(batch: pa.Table):
        # node IS the host's content hash — keying on it alone co-locates
        # every (node, host) pair; the kernel still groups by both columns
        return [batch.column("node").to_numpy(zero_copy_only=False)]

    names = partitioned_group_agg(
        host_edges_ds.map_batches(name_rows, batch_format="pyarrow"),
        ["node", "host"], [(None, "count", "_c")],
        num_parts=P, key_arrays_fn=node_key).map_batches(
        lambda t: t.select(["node", "host"]), batch_format="pyarrow")

    joined = hash_join(ranks, names, on="node", num_parts=P,
                       left_types={"node": i64, "rank": i64},
                       right_types={"node": i64, "host": pa.string()})
    return joined.map_batches(
        lambda t: pa.table({"host": t.column("host"),
                            "rank": pc.cast(t.column("rank"), i64)}),
        batch_format="pyarrow")


_SERIAL_BFS_LIMIT = 2_000_000


def bfs_distances(edges, seeds, max_hops: int = 6,
                  num_parts: Optional[int] = None):
    """Multi-source BFS hop distance over an int64 edge list (src, dst):
    returns (node, dist) for every node reachable from ``seeds`` within
    ``max_hops`` directed hops (seeds themselves at dist 0). This is the
    crawl-depth computation a frontier scheduler runs from its seed list
    (and the generic reachability primitive for graph curation).

    Distributed shape (hop-synchronous frontier BFS): state is a
    node-proportional (node, dist) Dataset; per hop the CURRENT frontier
    (nodes at dist == h, a map-side filter of state) joins the edge table
    through ONE src-keyed exchange (``hash_join`` post hook emits the
    partition-distinct successor set), and state folds the successors in
    through ONE node-keyed group-min exchange. Driver traffic per hop is
    a single integer (new-node count, which also terminates the loop
    early when a hop discovers nothing). Like ``pagerank``, iteration
    state is re-materialized per hop with its block count capped at P —
    Ray's sort exchange emits roughly as many blocks as it receives, so
    an uncapped loop compounds block count per iteration.

    Below the ``_SERIAL_BFS_LIMIT`` edge gate the identical BFS runs
    driver-serial on numpy CSR adjacency (bit-identical by construction:
    hop distance is unique, so there is no order dependence anywhere).

    Determinism: dist is the unique shortest hop count — partitioning
    cannot change it; the SQL oracle is a bounded recursive CTE taking
    ``min(dist)`` over all walk rows, which equals BFS distance for every
    node within the bound.
    """
    import pyarrow.compute as pc
    import ray.data as rd

    from .shuffle import (default_num_parts, hash_join,
                          partitioned_group_agg)

    i64 = pa.int64()
    seeds = sorted({int(s) for s in seeds})
    out_schema = pa.schema([("node", i64), ("dist", i64)])
    if not seeds:
        return rd.from_arrow(out_schema.empty_table())

    P = num_parts or default_num_parts()

    edges64 = edges.map_batches(
        lambda t: (pa.table({"src": pa.array([], i64),
                             "dst": pa.array([], i64)})
                   if t.num_rows == 0 or "src" not in t.column_names
                   else pa.table({"src": pc.cast(t.column("src"), i64),
                                  "dst": pc.cast(t.column("dst"), i64)})),
        batch_format="pyarrow").materialize()
    n_edges = edges64.count()

    if 3 * n_edges <= _SERIAL_BFS_LIMIT:
        ed = pa.concat_tables(
            [pa.schema([("src", i64), ("dst", i64)]).empty_table()]
            + list(edges64.iter_batches(batch_size=1 << 20,
                                        batch_format="pyarrow"))
        ).combine_chunks()
        src_v = ed.column("src").to_numpy(zero_copy_only=False)
        dst_v = ed.column("dst").to_numpy(zero_copy_only=False)
        node = np.unique(np.concatenate(
            [src_v, dst_v, np.asarray(seeds, np.int64)]))
        n = len(node)
        # CSR adjacency sorted by src
        order = np.argsort(src_v, kind="stable")
        s_sorted = np.searchsorted(node, src_v[order])
        d_sorted = np.searchsorted(node, dst_v[order])
        starts = np.searchsorted(s_sorted, np.arange(n))
        ends = np.searchsorted(s_sorted, np.arange(n) + 1)
        dist = np.full(n, -1, np.int64)
        frontier = np.searchsorted(node, np.asarray(seeds, np.int64))
        dist[frontier] = 0
        for h in range(max_hops):
            if len(frontier) == 0:
                break
            # vectorized neighbor expansion: concat CSR ranges of the
            # frontier via repeat + offset arithmetic (no per-node loop)
            cnt = ends[frontier] - starts[frontier]
            tot = int(cnt.sum())
            if tot == 0:
                break
            base = np.repeat(starts[frontier], cnt)
            offs = np.arange(tot) - np.repeat(
                np.cumsum(cnt) - cnt, cnt)
            nbr = d_sorted[base + offs]
            nbr = np.unique(nbr)
            new = nbr[dist[nbr] < 0]
            dist[new] = h + 1
            frontier = new
        keep = dist >= 0
        return rd.from_arrow(pa.table({
            "node": pa.array(node[keep], i64),
            "dist": pa.array(dist[keep], i64)}))

    # ---- distributed hop-synchronous BFS ----
    state = rd.from_arrow(pa.table({
        "node": pa.array(seeds, i64),
        "dist": pa.array(np.zeros(len(seeds), np.int64), i64)}))
    state = state.repartition(min(P, len(seeds))).materialize()

    succ_schema = pa.schema([("node", i64), ("dist", i64)])

    for h in range(max_hops):
        hh = h  # bind loop var

        def frontier_rows(t: pa.Table, hh=hh) -> pa.Table:
            if t.num_rows == 0 or "node" not in t.column_names:
                return pa.schema([("src", i64)]).empty_table()
            f = t.filter(pc.equal(t.column("dist"), hh))
            return pa.table({"src": f.column("node")})

        frontier = state.map_batches(frontier_rows,
                                     batch_format="pyarrow")

        def succ(joined: pa.Table, hh=hh) -> pa.Table:
            # partition-local distinct successors, dist = h + 1
            d = pc.unique(joined.column("dst").combine_chunks())
            return pa.table({
                "node": pc.cast(d, i64),
                "dist": pa.array(np.full(len(d), hh + 1, np.int64),
                                 i64)})

        cands = hash_join(edges64, frontier, on="src", how="semi",
                          num_parts=P,
                          left_types={"src": i64, "dst": i64},
                          right_types={"src": i64},
                          post=succ)
        cands = cands.map_batches(_tolerate_empty(succ_schema),
                                  batch_format="pyarrow")
        # fold successors into state: min(dist) per node — existing
        # dists are <= h, successors are h+1, so min preserves BFS dist
        state = partitioned_group_agg(
            state.union(cands), ["node"], [("dist", "min", "dist")],
            num_parts=P)
        state = state.map_batches(_tolerate_empty(out_schema),
                                  batch_format="pyarrow") \
                     .repartition(P).materialize()
        new_count = state.map_batches(
            lambda t, hh=hh: pa.table({"c": pa.array(
                [0 if t.num_rows == 0 or "dist" not in t.column_names
                 else pc.sum(pc.cast(pc.equal(t.column("dist"), hh + 1),
                                     i64)).as_py() or 0], i64)}),
            batch_format="pyarrow").sum("c")
        if not new_count:
            break

    return state


_SERIAL_TRI_LIMIT = 2_000_000


def triangle_count(edges, num_parts: Optional[int] = None):
    """Exact triangle count of the UNDIRECTED simple graph induced by an
    int64 edge list (direction, multiplicity, and self-loops ignored).
    Returns a one-row Dataset {"triangles": int64} — the classic graph
    statistic (clustering/spam signals on the host graph).

    Distributed shape (degree-oriented wedge counting, the standard
    MapReduce algorithm): canonicalize to distinct u<v edges (ONE pair
    exchange), compute degrees (ONE node exchange), orient every edge
    from its lower-(deg, id) endpoint to the higher — per-node oriented
    out-degree is then O(sqrt(m)), which bounds wedge work at O(m^1.5)
    regardless of hot-vertex skew. Wedges (pairs of out-neighbors of one
    node, ordered by the same total order) are generated per adjacency
    group (ONE src exchange) and matched against the oriented edge set
    with a composite-key ``hash_join`` (semi; ONE exchange); each
    triangle {a<b<c in the order} is counted exactly once, at its
    minimum vertex. Driver traffic: one integer.

    Below the edge gate the identical oriented algorithm runs
    driver-serial on numpy (sorted-array membership instead of the
    join). Triangle count is orientation-invariant, so the SQL oracle is
    the plain u<v<w three-way self-join.
    """
    import pyarrow.compute as pc
    import ray.data as rd

    from .shuffle import (default_num_parts, hash_join,
                          partitioned_group_agg)

    i64 = pa.int64()
    P = num_parts or default_num_parts()

    def canon(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "src" not in t.column_names:
            return pa.table({"u": pa.array([], i64),
                             "v": pa.array([], i64)})
        s = pc.cast(t.column("src"), i64).to_numpy(zero_copy_only=False)
        d = pc.cast(t.column("dst"), i64).to_numpy(zero_copy_only=False)
        m = s != d
        s, d = s[m], d[m]
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        # in-batch distinct combiner
        uv = np.unique(np.stack([u, v], axis=1), axis=0)
        return pa.table({"u": pa.array(uv[:, 0], i64),
                         "v": pa.array(uv[:, 1], i64)})

    canon_edges = edges.map_batches(canon, batch_format="pyarrow")

    n_raw = 0
    one_row = pa.schema([("triangles", i64)])

    # distinct (u, v): one composite-key exchange
    dedup = partitioned_group_agg(canon_edges, ["u", "v"],
                                  [(None, "count", "_c")],
                                  num_parts=P).map_batches(
        lambda t: (pa.table({"u": pa.array([], i64),
                             "v": pa.array([], i64)})
                   if t.num_rows == 0 or "u" not in t.column_names
                   else t.select(["u", "v"])),
        batch_format="pyarrow").materialize()
    m = dedup.count()
    if m == 0:
        return rd.from_arrow(pa.table({"triangles": pa.array([0], i64)}))

    if 3 * m <= _SERIAL_TRI_LIMIT:
        ed = pa.concat_tables(
            [pa.schema([("u", i64), ("v", i64)]).empty_table()]
            + list(dedup.iter_batches(batch_size=1 << 20,
                                      batch_format="pyarrow"))
        ).combine_chunks()
        u = ed.column("u").to_numpy(zero_copy_only=False)
        v = ed.column("v").to_numpy(zero_copy_only=False)
        node, inv = np.unique(np.concatenate([u, v]),
                              return_inverse=True)
        ui, vi = inv[:len(u)], inv[len(u):]
        n = len(node)
        deg = np.bincount(ui, minlength=n) + np.bincount(vi, minlength=n)
        # orient low (deg, id) -> high (deg, id)
        fwd = (deg[ui] < deg[vi]) | ((deg[ui] == deg[vi]) & (ui < vi))
        a = np.where(fwd, ui, vi)
        b = np.where(fwd, vi, ui)
        # sorted oriented edge keys for membership tests
        ekey = np.sort(a.astype(np.int64) * n + b)
        # wedges per source node, vectorized over CSR ranges
        order = np.lexsort((b, a))
        a_s, b_s = a[order], b[order]
        starts = np.searchsorted(a_s, np.arange(n))
        ends = np.searchsorted(a_s, np.arange(n) + 1)
        cnt = ends - starts
        total = 0
        # group nodes by out-degree bucket to bound temp memory
        for lo in np.nonzero(cnt >= 2)[0]:
            nb = b_s[starts[lo]:ends[lo]]
            # order out-neighbors by the orientation total order
            nb = nb[np.lexsort((nb, deg[nb]))]
            ii, jj = np.triu_indices(len(nb), k=1)
            wk = nb[ii].astype(np.int64) * n + nb[jj]
            pos = np.searchsorted(ekey, wk)
            total += int(np.sum((pos < len(ekey)) & (ekey[pos] == wk)))
        return rd.from_arrow(pa.table({"triangles":
                                       pa.array([total], i64)}))

    # ---- distributed path ----
    # degrees: explode endpoints, one node exchange
    def endpoints(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "u" not in t.column_names:
            return pa.table({"node": pa.array([], i64)})
        return pa.table({"node": pa.chunked_array(
            [t.column("u").combine_chunks(),
             t.column("v").combine_chunks()], type=i64)})

    deg = partitioned_group_agg(
        dedup.map_batches(endpoints, batch_format="pyarrow"),
        ["node"], [(None, "count", "deg")], num_parts=P)

    # join deg onto both endpoints (two exchanges), then orient
    def as_u(t: pa.Table) -> pa.Table:
        return t.rename_columns(["u", "deg_u"]) \
            if t.num_rows and "node" in t.column_names \
            else pa.table({"u": pa.array([], i64),
                           "deg_u": pa.array([], i64)})

    def as_v(t: pa.Table) -> pa.Table:
        return t.rename_columns(["v", "deg_v"]) \
            if t.num_rows and "node" in t.column_names \
            else pa.table({"v": pa.array([], i64),
                           "deg_v": pa.array([], i64)})

    with_du = hash_join(dedup, deg.map_batches(as_u,
                                               batch_format="pyarrow"),
                        on="u", num_parts=P,
                        left_types={"u": i64, "v": i64},
                        right_types={"u": i64, "deg_u": i64})
    with_both = hash_join(with_du,
                          deg.map_batches(as_v, batch_format="pyarrow"),
                          on="v", num_parts=P,
                          left_types={"u": i64, "v": i64, "deg_u": i64},
                          right_types={"v": i64, "deg_v": i64})

    ori_schema = pa.schema([("a", i64), ("b", i64),
                            ("deg_b", i64)])

    def orient(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "u" not in t.column_names:
            return ori_schema.empty_table()
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        du = t.column("deg_u").to_numpy(zero_copy_only=False)
        dv = t.column("deg_v").to_numpy(zero_copy_only=False)
        fwd = (du < dv) | ((du == dv) & (u < v))
        return pa.table({
            "a": pa.array(np.where(fwd, u, v), i64),
            "b": pa.array(np.where(fwd, v, u), i64),
            "deg_b": pa.array(np.where(fwd, dv, du), i64)})

    oriented = with_both.map_batches(orient,
                                     batch_format="pyarrow").materialize()

    # wedges: adjacency grouped by a (one exchange), pairs of
    # out-neighbors ordered by (deg, id)
    wedge_schema = pa.schema([("b", i64), ("c", i64)])

    def wedges(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return wedge_schema.empty_table()
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        db = t.column("deg_b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, db, a))  # by a, then (deg_b, b)
        a_s, b_s = a[order], b[order]
        starts = np.searchsorted(a_s, np.unique(a_s))
        bounds = np.append(starts, len(a_s))
        outs, outc = [], []
        for i in range(len(bounds) - 1):
            s, e = bounds[i], bounds[i + 1]
            if e - s < 2:
                continue
            nb = b_s[s:e]
            ii, jj = np.triu_indices(len(nb), k=1)
            outs.append(nb[ii])
            outc.append(nb[jj])
        if not outs:
            return wedge_schema.empty_table()
        return pa.table({"b": pa.array(np.concatenate(outs), i64),
                         "c": pa.array(np.concatenate(outc), i64)})

    from .shuffle import add_hash_partition
    parted = add_hash_partition(oriented, ["a"], P)
    wedge_ds = parted.groupby("part").map_groups(wedges,
                                                 batch_format="pyarrow")
    wedge_ds = wedge_ds.map_batches(_tolerate_empty(wedge_schema),
                                    batch_format="pyarrow")

    ori_bc = oriented.map_batches(
        lambda t: (wedge_schema.empty_table()
                   if t.num_rows == 0 or "a" not in t.column_names
                   else pa.table({"b": t.column("a"),
                                  "c": t.column("b")})),
        batch_format="pyarrow")

    def count_part(t: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([t.num_rows], i64)})

    matched = hash_join(wedge_ds, ori_bc, on=["b", "c"], how="semi",
                        num_parts=P,
                        left_types={"b": i64, "c": i64},
                        right_types={"b": i64, "c": i64},
                        post=count_part)
    total = matched.map_batches(
        lambda t: (pa.table({"n": pa.array([0], i64)})
                   if t.num_rows == 0 or "n" not in t.column_names
                   else t),
        batch_format="pyarrow").sum("n")
    return rd.from_arrow(pa.table({"triangles":
                                   pa.array([int(total or 0)], i64)}))
