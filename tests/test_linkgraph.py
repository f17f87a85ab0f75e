"""Link-graph family: outlink extraction semantics and exact-integer
distributed PageRank (partitioning invariance + reference recurrence)."""

import numpy as np
import pyarrow as pa
import pytest


def _outlinks(url, html, **kw):
    from sift_ray.functions.linkgraph import OutlinkStage
    t = pa.table({"url": [url], "html": pa.array([html.encode()],
                                                 pa.binary())})
    out = OutlinkStage(**kw)(t)
    return list(zip(out.column("dst").to_pylist(),
                    out.column("anchor").to_pylist()))


def test_outlinks_relative_resolution_and_skips():
    html = """<html><body>
      <a href="/about">About  Us</a>
      <a href="page2.html">Next</a>
      <a href="https://other.com/x#frag">Other</a>
      <a href="#section">Skip fragment</a>
      <a href="javascript:void(0)">Skip js</a>
      <a href="mailto:a@b.c">Skip mail</a>
      <a href="">Skip empty</a>
      <a>Skip no-href</a>
    </body></html>"""
    got = _outlinks("http://example.com/dir/index.html", html)
    assert got == [
        ("http://example.com/about", "About Us"),
        ("http://example.com/dir/page2.html", "Next"),
        ("https://other.com/x", "Other"),
    ]


def test_outlinks_base_href_and_nested_anchor_text():
    html = """<html><head><base href="http://cdn.example.com/assets/">
      </head><body>
      <a href="img/x.html"><b>Bold</b> and <i>italic</i> text</a>
    </body></html>"""
    got = _outlinks("http://example.com/page", html)
    assert got == [("http://cdn.example.com/assets/img/x.html",
                    "Bold and italic text")]


def test_outlinks_oversize_and_broken_html_yield_no_edges():
    big = "<a href='http://x.com/'>x</a>" * 10
    got = _outlinks("http://e.com/", big, max_bytes=10)
    assert got == []
    # pathological html must not raise
    got = _outlinks("http://e.com/", "<a href=http://ok.com/y>y</a><<<>")
    assert ("http://ok.com/y", "y") in got


def test_outlinks_max_links_cap():
    html = "".join(f'<a href="http://h.com/{i}">l{i}</a>' for i in range(9))
    got = _outlinks("http://e.com/", html, max_links=4)
    assert len(got) == 4


def _ref_pagerank(edges, iters, scale=10 ** 12):
    nodes = sorted({x for e in edges for x in e})
    deg = {v: 0 for v in nodes}
    for s, _ in edges:
        deg[s] += 1
    n = len(nodes)
    r = {v: scale for v in nodes}
    for _ in range(iters):
        D = sum(r[v] for v in nodes if deg[v] == 0)
        A = {v: 0 for v in nodes}
        for s, d in edges:
            A[d] += r[s] // deg[s]
        r = {v: (15 * scale + 85 * (A[v] + D // n)) // 100 for v in nodes}
    return r


def test_pagerank_matches_reference_and_partition_invariant(ray_session):
    import ray.data as rd
    from sift_ray.functions.linkgraph import pagerank
    rng = np.random.default_rng(3)
    # random graph incl. dangling nodes (targets outside the src set)
    src = rng.integers(1, 40, 300)
    dst = rng.integers(1, 60, 300)
    edges = list(zip(src.tolist(), dst.tolist()))
    t = pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    ref = _ref_pagerank(edges, iters=2)

    got = {}
    for parts, blocks in ((4, 2), (16, 5)):
        out = pagerank(rd.from_arrow(t).repartition(blocks), iters=2,
                       num_parts=parts).to_pandas()
        got[parts] = dict(zip(out.node, out["rank"]))
        assert got[parts] == ref, f"num_parts={parts}"
    assert got[4] == got[16]


def test_pagerank_empty_edges(ray_session):
    import ray.data as rd
    from sift_ray.functions.linkgraph import pagerank
    t = pa.table({"src": pa.array([], pa.int64()),
                  "dst": pa.array([], pa.int64())})
    out = pagerank(rd.from_arrow(t), iters=2).to_pandas()
    assert len(out) == 0


def test_host_edges_counts(ray_session):
    import ray.data as rd
    from sift_ray.functions.linkgraph import host_edges
    t = pa.table({
        "src": ["http://a.com/1", "http://a.com/2", "http://b.com/1"],
        "dst": ["http://B.com/x", "http://b.com/y", "http://a.com/z"],
        "anchor": ["", "", ""],
    })
    out = host_edges(rd.from_arrow(t)).to_pandas()
    got = {(r.src_host, r.dst_host): r.n for r in out.itertuples()}
    # hosts lowercased: a.com->b.com twice
    assert got == {("a.com", "b.com"): 2, ("b.com", "a.com"): 1}


def test_outlinks_nofollow_flag():
    html = ('<a href="http://a.com/x" rel="nofollow">sponsored</a>'
            '<a href="http://a.com/y" rel="NoFollow ugc">ugc</a>'
            '<a href="http://a.com/z">organic</a>')
    from sift_ray.functions.linkgraph import OutlinkStage
    import pyarrow as pa
    t = pa.table({"url": ["http://e.com/"],
                  "html": pa.array([html.encode()], pa.binary())})
    out = OutlinkStage()(t)
    got = dict(zip(out.column("dst").to_pylist(),
                   out.column("nofollow").to_pylist()))
    assert got == {"http://a.com/x": True, "http://a.com/y": True,
                   "http://a.com/z": False}


def test_pagerank_hosts_matches_integer_reference(ray_session):
    """String-keyed host PageRank == the serial int64 fixed-point
    recurrence on the same graph (dictionary-encode + two-exchange name
    join preserve exact values)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from sift_ray.functions.linkgraph import pagerank_hosts

    hosts = [f"h{i}.example.com" for i in range(12)]
    rng = np.random.RandomState(4)
    pairs = set()
    while len(pairs) < 30:
        a, b = rng.randint(0, 12, 2)
        if a != b:
            pairs.add((int(a), int(b)))
    pairs = sorted(pairs)
    edges = pa.table({
        "src_host": pa.array([hosts[a] for a, _ in pairs]),
        "dst_host": pa.array([hosts[b] for _, b in pairs]),
        "n": pa.array([1] * len(pairs), pa.int64())})
    got = (pagerank_hosts(rd.from_arrow(edges).repartition(5), iters=6)
           .to_pandas().sort_values("host").reset_index(drop=True))

    scale, d_num, d_den = 10 ** 12, 85, 100
    nodes = sorted({hosts[a] for a, _ in pairs}
                   | {hosts[b] for _, b in pairs})
    idx = {h: i for i, h in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n, np.int64)
    for a, _ in pairs:
        out[idx[hosts[a]]] += 1
    r = np.full(n, scale, np.int64)
    for _ in range(6):
        contrib = np.zeros(n, np.int64)
        for a, b in pairs:
            contrib[idx[hosts[b]]] += r[idx[hosts[a]]] // out[idx[hosts[a]]]
        dangling = r[out == 0].sum()
        r = ((d_den - d_num) * scale
             + d_num * (contrib + dangling // n)) // d_den
    assert len(got) == n
    for _, row in got.iterrows():
        assert int(r[idx[row["host"]]]) == row["rank"], row["host"]


def test_pagerank_serial_and_distributed_paths_identical(ray_session,
                                                         monkeypatch):
    """The gated driver-serial recurrence must equal the distributed
    loop bit-for-bit (exact int64 fixed point on both paths)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    import sift_ray.functions.linkgraph as lg

    rng = np.random.RandomState(5)
    e = pd.DataFrame({"src": rng.randint(0, 40, 300).astype("int64"),
                      "dst": rng.randint(0, 40, 300).astype("int64")})
    got_serial = lg.pagerank(rd.from_pandas(e), iters=4).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    monkeypatch.setattr(lg, "_SERIAL_PR_LIMIT", 0)
    got_dist = lg.pagerank(rd.from_pandas(e).repartition(3),
                           iters=4).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_serial, got_dist)


def _ref_bfs(edges, seeds, max_hops):
    from collections import defaultdict, deque
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] >= max_hops:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def test_bfs_distances_serial_and_distributed(ray_session, monkeypatch):
    """Hop distances equal a reference BFS on both the gated serial path
    and the forced hop-synchronous distributed path (distance is the
    unique shortest hop count — partitioning cannot change it)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    import sift_ray.functions.linkgraph as lg

    rng = np.random.default_rng(11)
    src = rng.integers(0, 50, 400)
    dst = rng.integers(0, 60, 400)
    t = pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    seeds = [0, 5, 17]
    ref = _ref_bfs(zip(src.tolist(), dst.tolist()), seeds, 3)

    out = lg.bfs_distances(rd.from_arrow(t).repartition(4), seeds,
                           max_hops=3).to_pandas()
    assert dict(zip(out.node, out.dist)) == ref

    monkeypatch.setattr(lg, "_SERIAL_BFS_LIMIT", 0)
    out2 = lg.bfs_distances(rd.from_arrow(t).repartition(4), seeds,
                            max_hops=3, num_parts=8).to_pandas()
    assert dict(zip(out2.node, out2.dist)) == ref


def test_bfs_distances_early_stop_and_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd
    import sift_ray.functions.linkgraph as lg

    # chain 1->2->3; max_hops far beyond diameter must terminate early
    t = pa.table({"src": pa.array([1, 2], pa.int64()),
                  "dst": pa.array([2, 3], pa.int64())})
    out = lg.bfs_distances(rd.from_arrow(t), [1], max_hops=6).to_pandas()
    assert dict(zip(out.node, out.dist)) == {1: 0, 2: 1, 3: 2}
    # no seeds -> typed empty
    out = lg.bfs_distances(rd.from_arrow(t), [], max_hops=3)
    assert out.count() == 0
    # seed disconnected from everything is still reported at dist 0
    out = lg.bfs_distances(rd.from_arrow(t), [99], max_hops=3).to_pandas()
    assert dict(zip(out.node, out.dist)) == {99: 0}


def _ref_triangles(src, dst):
    from collections import defaultdict
    und = {(min(s, d), max(s, d)) for s, d in zip(src, dst) if s != d}
    nbr = defaultdict(set)
    for u, v in und:
        nbr[u].add(v)
        nbr[v].add(u)
    return sum(len(nbr[u] & nbr[v]) for u, v in und) // 3


def test_triangle_count_serial_and_distributed(ray_session, monkeypatch):
    """Triangle count equals the naive reference on both the serial
    oriented counter and the forced distributed wedge-join path
    (direction, multi-edges, and self-loops ignored)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    import sift_ray.functions.linkgraph as lg

    rng = np.random.default_rng(13)
    src = rng.integers(0, 40, 500).tolist()
    dst = rng.integers(0, 40, 500).tolist()
    # plant self-loops and duplicate edges: both must be ignored
    src += [7, 7, 8]
    dst += [7, 8, 7]
    t = pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    ref = _ref_triangles(src, dst)
    assert ref > 0

    out = lg.triangle_count(rd.from_arrow(t).repartition(4)).to_pandas()
    assert int(out.triangles[0]) == ref

    monkeypatch.setattr(lg, "_SERIAL_TRI_LIMIT", 0)
    out2 = lg.triangle_count(rd.from_arrow(t).repartition(4),
                             num_parts=8).to_pandas()
    assert int(out2.triangles[0]) == ref


def test_triangle_count_empty_and_acyclic(ray_session):
    import pyarrow as pa
    import ray.data as rd
    import sift_ray.functions.linkgraph as lg

    t = pa.table({"src": pa.array([], pa.int64()),
                  "dst": pa.array([], pa.int64())})
    assert int(lg.triangle_count(rd.from_arrow(t)).to_pandas()
               .triangles[0]) == 0
    # a path graph has no triangles
    t = pa.table({"src": pa.array([1, 2, 3], pa.int64()),
                  "dst": pa.array([2, 3, 4], pa.int64())})
    assert int(lg.triangle_count(rd.from_arrow(t)).to_pandas()
               .triangles[0]) == 0
