"""URL canonicalization and canonical-URL dedup — the crawl-side twin of
content dedup: the same page fetched as ``http://Example.com/a?utm_source=x``
and ``http://example.com:80/a`` must collapse to one row before any
content-level pass spends compute on it.

Scale shape: canonicalization is a zero-shuffle map; the dedup is the
exact-dedup exchange shape (ONE canonical-key hash exchange, partition-
local keep-first) — full rows move exactly once, no driver state.
"""

from __future__ import annotations

import re
from typing import Optional
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import numpy as np
import pyarrow as pa

# query params that identify a campaign/click, not a resource — dropping
# them is the standard crawl canonicalization (utm_* per Google's own
# urchin params; the rest are the big ad/social click ids)
_TRACKING_RE = re.compile(
    r"^(utm_\w+|gclid|fbclid|msclkid|dclid|igshid|mc_eid|mc_cid|ref|ref_src"
    r"|_hs\w+|yclid|twclid)$", re.I)
_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonical_url(u: str) -> Optional[str]:
    """Canonical form of one URL: lowercase scheme/host, default port and
    fragment stripped, tracking params dropped, remaining query params
    sorted by (key, value), empty path normalized to '/'. Returns None
    for unparseable or non-http(s) input."""
    try:
        parts = urlsplit(u.strip())
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = parts.hostname
    if not host:
        return None
    host = host.lower().rstrip(".")
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS[scheme]:
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    q = [(k, v) for k, v in parse_qsl(parts.query, keep_blank_values=True)
         if not _TRACKING_RE.match(k)]
    query = urlencode(sorted(q))
    return urlunsplit((scheme, netloc, path, query, ""))


# Fast-path predicate: URLs this regex matches are ALREADY canonical
# except possibly for a missing path ("http://a.com" -> append "/"):
# lowercase scheme and host, no userinfo/port (no '@'/':' in the host
# charclass), no trailing host dot (last char must be alnum), no query,
# no fragment, no whitespace. Everything else falls back to the exact
# per-row canonical_url — the fast path is identity-or-slash, so it can
# never diverge from the slow path (equality property-tested in
# tests/test_urls.py).
_FAST_CANON_PAT = r"^https?://[a-z0-9.-]*[a-z0-9](/[^?#\s]*)?$"
_NO_PATH_PAT = r"^https?://[^/]+$"


def canonical_urls_array(col) -> pa.Array:
    """Vectorized ``canonical_url`` over an Arrow string column: Arrow RE2
    kernels classify each row; already-canonical rows (the overwhelming
    majority of real crawl URLs) pass through zero-copy, and only the
    rest run the per-row Python canonicalizer."""
    import pyarrow.compute as pc
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return pa.array([], pa.string())
    fast = pc.fill_null(
        pc.match_substring_regex(col, _FAST_CANON_PAT),
        False).to_numpy(zero_copy_only=False)
    no_path = pc.fill_null(pc.match_substring_regex(col, _NO_PATH_PAT),
                           False)
    with_slash = pc.binary_join_element_wise(col, "/", "")
    out = pc.if_else(no_path, with_slash, col)
    slow = ~fast
    if slow.any():
        idx = np.flatnonzero(slow)
        slow_in = col.take(pa.array(idx, pa.int64())).to_pylist()
        slow_out = pa.array(
            [canonical_url(u) if u is not None else None for u in slow_in],
            pa.string())
        out = pc.replace_with_mask(out, pa.array(slow), slow_out)
    return out if isinstance(out, pa.Array) else out.combine_chunks()


def host_of_urls(col) -> pa.Array:
    """Vectorized netloc extraction for ALREADY-CANONICAL URLs (lowercase
    host guaranteed by canonical_url): one RE2 kernel, null where the
    value is not an http(s) URL."""
    import pyarrow.compute as pc
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ex = pc.extract_regex(col, r"^https?://(?P<host>[^/?#]+)")
    return pc.struct_field(ex, "host")


def canonicalize_urls(ds, url_col: str = "url",
                      out_col: str = "canonical_url"):
    """Append the canonical form of ``url_col`` (null where unparseable).
    Zero shuffle, vectorized fast path."""
    def fn(t: pa.Table) -> pa.Table:
        return t.append_column(out_col,
                               canonical_urls_array(t.column(url_col)))
    return ds.map_batches(fn, batch_format="pyarrow")


def url_dedup(ds, url_col: str = "url", ts_col: Optional[str] = None,
              num_parts: Optional[int] = None):
    """Keep ONE row per canonical URL: the earliest ``ts_col`` if given
    (tie-broken by ascending raw url), else the lexicographically-first
    raw url — both deterministic under any partitioning. Rows whose URL
    does not canonicalize (non-http, unparseable) are kept as-is, keyed
    on their raw string. Exact-dedup exchange shape: full rows move
    through exactly ONE canonical-key hash exchange; the keep decision
    is partition-local (equal keys co-locate)."""
    from .shuffle import add_hash_partition, default_num_parts
    from .sketch import _hash64_any

    P = num_parts or default_num_parts()
    canoned = canonicalize_urls(ds, url_col, "_canon")

    def fill_key(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        key = pc.coalesce(t.column("_canon"), t.column(url_col))
        return t.set_column(t.schema.get_field_index("_canon"),
                            "_canon", key)

    keyed = canoned.map_batches(fill_key, batch_format="pyarrow")

    def key_hash(batch: pa.Table):
        return [_hash64_any(batch.column("_canon")).astype(np.int64)]

    parted = add_hash_partition(keyed, ["_canon"], P,
                                key_arrays_fn=key_hash)

    sort_cols = ["_canon"] + ([ts_col] if ts_col else []) + [url_col]

    def keep_first(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl.drop_columns(
                [c for c in ("_canon", "part") if c in tbl.column_names])
        df = tbl.to_pandas().sort_values(sort_cols, kind="stable")
        df = df.drop_duplicates(subset=["_canon"], keep="first")
        df = df.drop(columns=[c for c in ("_canon", "part")
                              if c in df.columns])
        out_schema = pa.schema([f for f in tbl.schema
                                if f.name not in ("_canon", "part")])
        return pa.Table.from_pandas(df, preserve_index=False,
                                    schema=out_schema)

    return parted.groupby("part").map_groups(
        lambda t: keep_first(t), batch_format="pyarrow")


def assign_splits(ds, url_col: str = "url",
                  splits=(("train", 0.9), ("val", 0.05), ("test", 0.05))):
    """Leakage-safe train/val/test assignment: the split is a pure
    function of md5(host), so EVERY page of a domain lands in the same
    split — template near-duplicates from one site can never straddle
    the train/eval boundary (the classic contamination vector). Zero
    shuffle, engine-reproducible (md5 thresholds, no RNG), stable as
    the corpus grows: adding pages never moves an existing domain.

    ``splits``: (name, fraction) pairs; fractions are mapped to 128-bit
    md5-space thresholds. Appends ``split`` to the rows."""
    import hashlib

    names = [n for n, _ in splits]
    fracs = np.array([f for _, f in splits], dtype=np.float64)
    fracs = fracs / fracs.sum()
    bounds = np.cumsum(fracs)[:-1]
    max128 = (1 << 128) - 1
    cuts = [int(b * max128) for b in bounds]

    def fn(t: pa.Table) -> pa.Table:
        hosts = []
        for u in t.column(url_col).to_pylist():
            try:
                hosts.append((urlsplit(u).hostname or u).lower())
            except ValueError:
                hosts.append(u)
        out = []
        for h in hosts:
            v = int.from_bytes(hashlib.md5(h.encode()).digest(), "big")
            i = 0
            while i < len(cuts) and v >= cuts[i]:
                i += 1
            out.append(names[i])
        return t.append_column("split", pa.array(out, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def politeness_schedule(ds, host_col: str = "host", id_col: str = "url",
                        interval_us: int = 1_000_000,
                        num_parts: Optional[int] = None):
    """Crawl-frontier politeness scheduling: one fetch slot per host every
    ``interval_us`` microseconds (the per-host rate limit every polite
    crawler enforces, RFC 9309 §2.5 guidance). Within each host, rows rank
    by ``id_col`` ascending — a deterministic frontier order; feed a
    priority-encoding id upstream for prioritized crawls — and row r gets
    ``slot_us = (r - 1) * interval_us``, so a scheduler can dispatch by
    (slot_us, host) with per-host spacing guaranteed. Returns
    (id, host, fetch_rank, slot_us).

    Scale shape: ONE host-keyed exchange, partition-local lexsort +
    segment arithmetic (hosts are co-located; rank needs no global
    state). Hot hosts are inherent — a 10^7-URL host genuinely owns 10^7
    slots — and bound only partition sort memory, not correctness."""
    import pyarrow.compute as pc

    from .shuffle import add_hash_partition, default_num_parts
    from .sketch import _hash64_any

    P = num_parts or default_num_parts()

    def host_keys(batch: pa.Table):
        return [_hash64_any(batch.column(host_col)).astype(np.int64)]

    parted = add_hash_partition(
        ds.map_batches(lambda t: t.select([id_col, host_col]),
                       batch_format="pyarrow"),
        [host_col], P, key_arrays_fn=host_keys)

    def kernel(tbl: pa.Table) -> pa.Table:
        idx = pc.sort_indices(tbl, sort_keys=[(host_col, "ascending"),
                                              (id_col, "ascending")])
        srt = tbl.take(idx)
        h = srt.column(host_col).combine_chunks()
        n = len(h)
        neq = pc.not_equal(h.slice(1), h.slice(0, n - 1))
        if isinstance(neq, pa.ChunkedArray):
            neq = neq.combine_chunks()
        starts = np.flatnonzero(
            np.r_[True, neq.to_numpy(zero_copy_only=False)])
        lens = np.diff(np.r_[starts, n])
        rank = np.arange(n, dtype=np.int64) - np.repeat(starts, lens) + 1
        return pa.table({
            id_col: srt.column(id_col),
            host_col: h,
            "fetch_rank": pa.array(rank, pa.int64()),
            "slot_us": pa.array((rank - 1) * interval_us, pa.int64()),
        })

    return parted.groupby("part").map_groups(kernel,
                                             batch_format="pyarrow")
