"""HyperLogLog approximate distinct count — the sketch operator family.

Standard HLL (Flajolet et al. 2007, with the bias corrections popularized
by the HyperLogLog-in-practice line of work): p-bit register index, rank =
leading-zero count of the remaining 64-p bits + 1, harmonic-mean estimate
with small-range linear counting.

Distributed shape: every batch folds its rows into ONE 2^p-byte register
row (vectorized numpy scatter-max); a second map_batches folds each BLOCK
of register rows into one (tree combine), so the driver merges at most
n_blocks rows of 2^p bytes — kilobytes, never corpus data. Registers are
mergeable by elementwise max, so the result is exact over any partitioning
of the input (the estimate itself is approximate: ~1.04/sqrt(2^p) relative
error, ~1.6% at p=12).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa


def _hash64_ints(vals: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64-style avalanche of int64/uint64 values
    (public-domain finalizer constants)."""
    h = vals.astype(np.uint64, copy=True)
    h += np.uint64(0x9E3779B97F4A7C15)
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return h ^ (h >> np.uint64(31))


def _hash64_any(col) -> np.ndarray:
    """uint64 hashes for an Arrow column, one per row (nulls included —
    callers that need SQL COUNT(DISTINCT) semantics must mask nulls out
    first, see ``_null_mask``): ints vectorized, other types via blake2b
    per value. Hashing is consistent within a column type; equal values of
    DIFFERENT Arrow types (int 1 vs float 1.0) hash differently — pick one
    column type upstream. Nullable int columns stay EXACT: nulls are
    filled with 0 on the Arrow side before hashing (a numpy conversion
    would degrade the whole column to float64 — NaN-cast warnings and
    >2^53 ids rounding together), so null hashes like 0 — harmless for
    partition routing (co-location only) and invisible to
    COUNT(DISTINCT) callers, which mask nulls per the contract above."""
    import hashlib
    if pa.types.is_integer(col.type):
        if col.null_count:
            import pyarrow.compute as pc
            vals = pc.fill_null(col, 0).to_numpy(zero_copy_only=False)
        else:
            vals = col.to_numpy(zero_copy_only=False)
        return _hash64_ints(vals)
    vals = col.to_pylist()
    return np.fromiter(
        (int.from_bytes(
            hashlib.blake2b(str(v).encode(), digest_size=8).digest(), "big")
         for v in vals),
        dtype=np.uint64, count=len(vals))


def _hash64_route(col) -> np.ndarray:
    """Partition-ROUTING hash of an Arrow column — same contract as
    :func:`_hash64_any` (one uint64 per row, nulls included) but ONLY for
    keys whose hash never reaches results or disk: co-location of equal
    keys within one run is the sole requirement, so it uses the fastest
    available backend (polars' vectorized xxhash — measured ~50x the
    per-value blake2b loop on url columns) and is NOT guaranteed stable
    across library versions. Callers that persist a hash-derived layout
    (bucketed tables, bloom index files) or put hash-derived values in
    results (HLL registers, minhash signatures, synthetic doc ids) must
    stay on ``_hash64_any``."""
    if pa.types.is_integer(col.type):
        return _hash64_any(col)
    try:
        import polars as pl
        arr = (col.combine_chunks() if isinstance(col, pa.ChunkedArray)
               else col)
        h = pl.from_arrow(arr).hash(seed=0).to_numpy()
        return np.ascontiguousarray(h, dtype=np.uint64)
    except Exception:
        return _hash64_any(col)


def _null_mask(col) -> Optional[np.ndarray]:
    """Boolean keep-mask for non-null rows, or None when nothing is null."""
    if col.null_count == 0:
        return None
    import pyarrow.compute as pc
    return pc.is_valid(col).to_numpy(zero_copy_only=False)


def _ranks(w: np.ndarray, width: int) -> np.ndarray:
    """rank = leading zeros of the width-bit value + 1, vectorized.
    Highest-set-bit position via frexp, with a correction for the one
    float64-rounding hazard: a value just below a power of two (> 53
    significant bits) can round UP across the boundary, overstating the
    exponent by one — detected exactly with an integer shift check."""
    out = np.full(len(w), width + 1, dtype=np.uint8)  # w == 0 case
    nz = w != 0
    if nz.any():
        wn = w[nz]
        _, e = np.frexp(wn.astype(np.float64))
        e = e.astype(np.int64)
        # exact check: the claimed highest bit must actually be set
        over = (wn >> (e - 1).astype(np.uint64)) == 0
        e = np.where(over, e - 1, e)
        # highest set bit index (0-based from LSB) = e - 1
        out[nz] = (width - (e - 1)).astype(np.uint8)
    return out


def _fold_batch(col, p: int) -> np.ndarray:
    """One batch -> one 2^p register array (uint8). Nulls are dropped —
    SQL COUNT(DISTINCT) ignores NULLs."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    h = _hash64_any(col)
    keep = _null_mask(col)
    if keep is not None:
        h = h[keep]
    if len(h) == 0:
        return regs
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = (h << np.uint64(p)) >> np.uint64(p)  # low 64-p bits
    rank = _ranks(w, 64 - p)
    np.maximum.at(regs, idx, rank)
    return regs


def _estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.sum(np.float64(2.0) ** -regs.astype(np.float64))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        return m * float(np.log(m / zeros))  # linear counting
    return float(est)


def approx_distinct_by(ds, key_col: str, col: str, precision: int = 10,
                       num_parts: Optional[int] = None):
    """Per-group approximate COUNT(DISTINCT col): Dataset of
    (key_col, approx_distinct). Groups are co-located by ONE key-hash
    exchange, so each partition folds its keys' registers completely —
    no cross-partition register merge. Register memory is 2^precision
    bytes per key; the smaller default precision (p=10, ~3.2% error)
    keeps per-key sketches at 1 KB."""
    from .shuffle import add_hash_partition, default_num_parts

    p = precision
    m = 1 << p
    P = num_parts or default_num_parts()

    def key_hash(batch: pa.Table):
        return [_hash64_any(batch.column(key_col)).astype(np.int64)]

    parted = add_hash_partition(ds.map_batches(
        lambda t: t.select([key_col, col]), batch_format="pyarrow"),
        [key_col], P, key_arrays_fn=key_hash)

    def kernel(tbl: pa.Table) -> pa.Table:
        keys = tbl.column(key_col).to_numpy(zero_copy_only=False) \
            if pa.types.is_integer(tbl.column(key_col).type) \
            else np.asarray(tbl.column(key_col).to_pylist(), dtype=object)
        h = _hash64_any(tbl.column(col))
        keep = _null_mask(tbl.column(col))
        valid = np.ones(len(h), dtype=bool) if keep is None else keep
        order = np.argsort(keys, kind="stable")
        keys = keys[order]
        h = h[order]
        valid = valid[order]
        n = len(keys)
        is_start = np.ones(n, dtype=bool)
        if n > 1:
            is_start[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(is_start).tolist()
        starts.append(n)
        out_keys, out_est = [], []
        idx_all = (h >> np.uint64(64 - p)).astype(np.int64)
        rank_all = _ranks((h << np.uint64(p)) >> np.uint64(p), 64 - p)
        for bi in range(len(starts) - 1):
            s, e = starts[bi], starts[bi + 1]
            regs = np.zeros(m, dtype=np.uint8)
            v = valid[s:e]  # null values don't count (SQL COUNT(DISTINCT))
            np.maximum.at(regs, idx_all[s:e][v], rank_all[s:e][v])
            out_keys.append(keys[s])
            out_est.append(round(_estimate(regs), 1))
        return pa.table({
            key_col: pa.array([k.item() if hasattr(k, "item") else k
                               for k in out_keys]),
            "approx_distinct": pa.array(out_est, pa.float64()),
        })

    return parted.groupby("part").map_groups(kernel, batch_format="pyarrow")


def approx_distinct(ds, col: str, precision: int = 12) -> float:
    """Approximate COUNT(DISTINCT col) over a Dataset via distributed HLL.
    Relative error ~1.04/sqrt(2^precision)."""
    p = precision
    m = 1 << p

    def fold(batch: pa.Table) -> pa.Table:
        regs = _fold_batch(batch.column(col), p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    def combine(batch: pa.Table) -> pa.Table:
        acc = np.zeros(m, dtype=np.uint8)
        for b in batch.column("regs").to_pylist():
            np.maximum(acc, np.frombuffer(b, dtype=np.uint8), out=acc)
        return pa.table({"regs": pa.array([acc.tobytes()], pa.binary())})

    reg_rows = (ds.map_batches(fold, batch_format="pyarrow")
                .map_batches(combine, batch_format="pyarrow"))
    final = np.zeros(m, dtype=np.uint8)
    for batch in reg_rows.iter_batches(batch_size=1024,
                                       batch_format="pyarrow"):
        for b in batch.column("regs").to_pylist():
            np.maximum(final, np.frombuffer(b, dtype=np.uint8), out=final)
    return _estimate(final)


def _compress_weighted(v: np.ndarray, w: np.ndarray, m: int):
    """Compress a weighted value multiset to <= m equal-spaced weighted
    quantile points (v sorted ascending on return). The standard mergeable
    weighted-summary step (the compression used by distributed quantile
    sketches in the GK / XGBoost line): pick the value at cumulative-weight
    rank (i + 0.5)/m * W for i in 0..m-1, each carrying weight W/m.
    Deterministic — no RNG, stable under re-partitioning of equal data."""
    order = np.argsort(v, kind="stable")
    vs, ws = v[order], w[order]
    cum = np.cumsum(ws)
    total = float(cum[-1])
    if len(vs) <= m:
        return vs, ws
    targets = (np.arange(m, dtype=np.float64) + 0.5) / m * total
    idx = np.searchsorted(cum, targets, side="left")
    idx = np.minimum(idx, len(vs) - 1)
    return vs[idx], np.full(m, total / m, dtype=np.float64)


def quantile_sketch(ds, col: str, qs=(0.25, 0.5, 0.75, 0.9, 0.99),
                    m: int = 256, num_parts: Optional[int] = None):
    """Approximate quantiles of a numeric column via a two-level mergeable
    weighted-quantile summary (rank error ~1/m per level, ~1% at m=256).
    Unlike ``corpus.word_count_quantiles`` (exact, but driver state scales
    with DISTINCT values), this works for continuous columns whose distinct
    count is corpus-sized.

    Shape: every batch compresses to <= m (value, weight) points; ONE
    exchange spreads summary points across partitions (any spread works —
    summaries are mergeable regardless of grouping); each partition
    compresses its points to m again; the driver folds num_parts * m
    points. Driver and exchange volume are O(num_parts * m), independent
    of corpus size. Returns a Dataset of (q, value) float64 rows."""
    import pyarrow.compute as pc
    import ray.data as rd

    from .shuffle import add_hash_partition, default_num_parts

    P = num_parts or default_num_parts()

    def summarize(batch: pa.Table) -> pa.Table:
        vals = pc.cast(batch.column(col), pa.float64())
        v = vals.drop_null().to_numpy(zero_copy_only=False)
        if len(v) == 0:
            return pa.table({"v": pa.array([], pa.float64()),
                             "w": pa.array([], pa.float64())})
        sv, sw = _compress_weighted(v, np.ones(len(v)), m)
        return pa.table({"v": pa.array(sv, pa.float64()),
                         "w": pa.array(sw, pa.float64())})

    def merge_partition(tbl: pa.Table) -> pa.Table:
        v = tbl.column("v").to_numpy(zero_copy_only=False)
        w = tbl.column("w").to_numpy(zero_copy_only=False)
        if len(v) == 0:
            return pa.table({"v": pa.array([], pa.float64()),
                             "w": pa.array([], pa.float64())})
        sv, sw = _compress_weighted(v, w, m)
        return pa.table({"v": pa.array(sv, pa.float64()),
                         "w": pa.array(sw, pa.float64())})

    def vbits(batch: pa.Table):
        return [batch.column("v").to_numpy(zero_copy_only=False)
                .view(np.int64)]

    summaries = ds.map_batches(summarize, batch_format="pyarrow")
    parted = add_hash_partition(summaries, ["v"], P, key_arrays_fn=vbits)
    merged = parted.groupby("part").map_groups(
        lambda t: merge_partition(t.select(["v", "w"])),
        batch_format="pyarrow")

    folded = merged.to_pandas()
    out_q, out_v = [], []
    if len(folded):
        v = folded["v"].to_numpy()
        w = folded["w"].to_numpy()
        order = np.argsort(v, kind="stable")
        vs, ws = v[order], w[order]
        cum = np.cumsum(ws)
        total = float(cum[-1])
        for q in qs:
            i = int(np.searchsorted(cum, q * total, side="left"))
            out_q.append(float(q))
            out_v.append(float(vs[min(i, len(vs) - 1)]))
    else:
        out_q = [float(q) for q in qs]
        out_v = [0.0] * len(qs)
    import ray.data as rd2
    return rd2.from_arrow(pa.table({
        "q": pa.array(out_q, pa.float64()),
        "value": pa.array(out_v, pa.float64()),
    }))


def _mg_compress(values: pa.Array, counts: np.ndarray, s: int):
    """Misra-Gries compression of a (value, count) table to <= s counters:
    subtract the (s+1)-th largest count from everything, drop <= 0. Each
    application undercounts any value by at most (its input's share of)
    n/(s+1); summaries compressed this way stay mergeable with the error
    bounds adding (Agarwal et al., "Mergeable Summaries", PODS 2012)."""
    if len(counts) <= s:
        return values, counts
    order = np.argsort(counts, kind="stable")[::-1]
    sub = counts[order[s]]
    keep_idx = order[:s]
    kept = counts[keep_idx] - sub
    pos = kept > 0
    return values.take(pa.array(keep_idx[pos])), kept[pos]


def heavy_hitters(ds, col: str, phi: float = 0.008,
                  num_parts: Optional[int] = None):
    """All values of ``col`` whose frequency exceeds ``phi * n`` (n = row
    count of ``ds``), with EXACT counts — the distributed frequent-items
    operator (bot/spam domain detection, hot-key discovery before a join,
    stop-word mining).

    Two streaming passes (``ds`` is executed twice — pass a re-readable
    Dataset such as a parquet read, or materialize upstream first):

    1. CANDIDATES — mergeable Misra-Gries summaries: each batch folds to a
       vectorized value-counts table compressed to s = 4*ceil(1/phi)
       counters; ONE value-hash exchange; each partition sums its partials
       (pyarrow hash-agg) and compresses to s again. Per-batch plus
       per-partition compressions undercount any value by at most
       2n/(s+1) <= phi*n/2, so every true heavy hitter survives with
       partial count >= phi*n/2 and the candidate set (values whose
       partial + 2n/(s+1) clears the threshold) is a guaranteed superset
       of the answer, at most ~2/phi values. Driver folds
       num_parts * s tiny rows — kilobytes, never corpus data.
    2. EXACT RECOUNT — the candidate list (a few KB) is captured map-side;
       ``pc.is_in`` filter + per-batch value_counts + one tiny exchange
       sums exact counts per candidate.

    Approximation affects only WHICH values get recounted (a superset);
    reported counts are exact, so the output equals SQL
    ``GROUP BY col HAVING count(*) > phi * n``. The threshold compare uses
    the same double expression (phi * total) an oracle would. Null values
    are never reported (SQL group-by would emit a NULL group; add
    ``WHERE col IS NOT NULL`` when comparing), but null ROWS still count
    in n, matching ``(SELECT count(*) FROM t)``.

    Returns a Dataset of (value, n) ordered n DESC, value ASC.
    """
    import math

    import pandas as pd
    import pyarrow.compute as pc
    import ray.data as rd

    from .shuffle import add_hash_partition, default_num_parts

    P = num_parts or default_num_parts()
    s = max(4 * int(math.ceil(1.0 / phi)), 64)

    def _value_counts(arr):
        vc = arr.drop_null().value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return (vc.field("values"),
                pc.cast(vc.field("counts"), pa.int64()).to_numpy())

    def _with_total(vtype, v, c, total_rows: int) -> pa.Table:
        # carry count(*) mass even when compression kept nothing
        if len(c) == 0 and total_rows > 0:
            return pa.table({"value": pa.nulls(1, vtype),
                             "n": pa.array([0], pa.int64()),
                             "total": pa.array([total_rows], pa.int64())})
        total = np.zeros(len(c), dtype=np.int64)
        if len(total):
            total[0] = total_rows
        return pa.table({"value": pc.cast(v, vtype),
                         "n": pa.array(c, pa.int64()),
                         "total": pa.array(total, pa.int64())})

    def fold(batch: pa.Table) -> pa.Table:
        v, c = _value_counts(batch.column(col))
        v, c = _mg_compress(v, c, s)
        return _with_total(batch.schema.field(col).type, v, c,
                           batch.num_rows)

    def value_keys(batch: pa.Table):
        import polars as pl
        h = pl.from_arrow(batch.column("value")).hash(seed=0)
        return [h.to_numpy().view(np.int64)]

    def kernel(tbl: pa.Table) -> pa.Table:
        ptotal = int(pc.sum(tbl.column("total")).as_py() or 0)
        g = (tbl.select(["value", "n"]).group_by("value")
             .aggregate([("n", "sum")]))
        v = g.column("value")
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        mask = pc.is_valid(v).to_numpy(zero_copy_only=False)
        c = g.column("n_sum").to_numpy(zero_copy_only=False)
        v, c = _mg_compress(v.filter(pa.array(mask)), c[mask], s)
        return _with_total(tbl.schema.field("value").type, v, c, ptotal)

    partials = ds.map_batches(fold, batch_format="pyarrow")
    parted = add_hash_partition(partials, ["value"], P,
                                key_arrays_fn=value_keys)
    small = (parted.groupby("part")
             .map_groups(kernel, batch_format="pyarrow").to_pandas())

    if small.empty or "value" not in small.columns:
        return rd.from_arrow(pa.table({
            "value": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64())}))

    total = int(small["total"].sum())
    thr = phi * total
    err = 2.0 * total / (s + 1)
    agg = small.dropna(subset=["value"]).groupby("value")["n"].sum()
    cands = agg[agg + err >= thr].index.tolist()

    vtype = pa.Schema.from_pandas(small[["value"]]).field("value").type
    if not cands or total == 0:
        return rd.from_arrow(pa.table({
            "value": pa.array([], vtype or pa.int64()),
            "n": pa.array([], pa.int64())}))

    cand_arr = pa.array(cands)

    def recount(batch: pa.Table) -> pa.Table:
        arr = batch.column(col).drop_null()
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        arr = arr.filter(pc.is_in(arr, value_set=pc.cast(cand_arr,
                                                         arr.type)))
        v, c = _value_counts(arr)
        return pa.table({"value": v, "n": pa.array(c, pa.int64())})

    from .shuffle import partitioned_group_agg
    exact = partitioned_group_agg(
        ds.map_batches(recount, batch_format="pyarrow"),
        ["value"], [("n", "sum", "n")], num_parts=P,
        key_arrays_fn=value_keys).to_pandas()

    out = (exact[exact["n"] > thr]
           .sort_values(["n", "value"], ascending=[False, True])
           .reset_index(drop=True))
    return rd.from_arrow(pa.Table.from_pandas(out, preserve_index=False))


def quantile_sketch_by(ds, key_col: str, col: str,
                       qs=(0.25, 0.5, 0.75, 0.9), m: int = 256,
                       num_parts: Optional[int] = None):
    """Per-group approximate quantiles of a continuous column (per-type
    latency percentiles, per-language length calibration) — the grouped
    companion to ``quantile_sketch``, same mergeable weighted summaries.

    Shape: every batch compresses EACH group present in it to <= m
    (value, weight) points; ONE key-hash exchange co-locates each
    group's points; each partition folds its keys' summaries completely
    and emits (key, q, value) rows — no cross-partition merge, driver
    volume O(groups x len(qs)). Rank error ~1/m per compression level.
    Rows whose key or value is null are dropped (SQL aggregates ignore
    null values; null GROUP BY keys are out of scope for a sketch).
    """
    import pyarrow.compute as pc

    from .shuffle import add_hash_partition, default_num_parts

    P = num_parts or default_num_parts()

    def _per_group(keys: np.ndarray, v: np.ndarray, w: np.ndarray, fn):
        """Apply fn(slice_v, slice_w) per contiguous key segment (input
        sorted by key); yields (key, result)."""
        n = len(keys)
        is_start = np.ones(n, dtype=bool)
        if n > 1:
            is_start[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(is_start).tolist()
        starts.append(n)
        for bi in range(len(starts) - 1):
            s, e = starts[bi], starts[bi + 1]
            yield keys[s], fn(v[s:e], w[s:e])

    def _keys_np(col_arr):
        if pa.types.is_integer(col_arr.type):
            return col_arr.to_numpy(zero_copy_only=False)
        return np.asarray(col_arr.to_pylist(), dtype=object)

    def summarize(batch: pa.Table) -> pa.Table:
        ktype = batch.schema.field(key_col).type
        vals = pc.cast(batch.column(col), pa.float64())
        ok = pc.and_(pc.is_valid(vals), pc.is_valid(batch.column(key_col)))
        t = batch.filter(ok)
        if t.num_rows == 0:
            return pa.table({key_col: pa.array([], ktype),
                             "v": pa.array([], pa.float64()),
                             "w": pa.array([], pa.float64())})
        keys = _keys_np(t.column(key_col))
        v = pc.cast(t.column(col), pa.float64()).to_numpy(
            zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        keys, v = keys[order], v[order]
        out_k, out_v, out_w = [], [], []
        for k, (sv, sw) in _per_group(keys, v, np.ones(len(v)),
                                      lambda a, b:
                                      _compress_weighted(a, b, m)):
            out_k.extend([k] * len(sv))
            out_v.extend(sv.tolist())
            out_w.extend(sw.tolist())
        return pa.table({key_col: pa.array(out_k, ktype),
                         "v": pa.array(out_v, pa.float64()),
                         "w": pa.array(out_w, pa.float64())})

    def key_hash(batch: pa.Table):
        return [_hash64_any(batch.column(key_col)).astype(np.int64)]

    parted = add_hash_partition(
        ds.map_batches(summarize, batch_format="pyarrow"),
        [key_col], P, key_arrays_fn=key_hash)

    def kernel(tbl: pa.Table) -> pa.Table:
        ktype = tbl.schema.field(key_col).type
        if tbl.num_rows == 0:
            return pa.table({key_col: pa.array([], ktype),
                             "q": pa.array([], pa.float64()),
                             "value": pa.array([], pa.float64())})
        keys = _keys_np(tbl.column(key_col))
        v = tbl.column("v").to_numpy(zero_copy_only=False)
        w = tbl.column("w").to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        keys, v, w = keys[order], v[order], w[order]
        out_k, out_q, out_v = [], [], []

        def quantiles(sv, sw):
            o = np.argsort(sv, kind="stable")
            svs, sws = sv[o], sw[o]
            cum = np.cumsum(sws)
            total = float(cum[-1])
            res = []
            for q in qs:
                i = int(np.searchsorted(cum, q * total, side="left"))
                res.append(float(svs[min(i, len(svs) - 1)]))
            return res

        for k, res in _per_group(keys, v, w, quantiles):
            for q, val in zip(qs, res):
                out_k.append(k)
                out_q.append(float(q))
                out_v.append(val)
        return pa.table({key_col: pa.array(out_k, ktype),
                         "q": pa.array(out_q, pa.float64()),
                         "value": pa.array(out_v, pa.float64())})

    return parted.groupby("part").map_groups(
        lambda t: kernel(t.select([key_col, "v", "w"])),
        batch_format="pyarrow")


def histogram(ds, col: str, lo: float, hi: float, bins: int = 100,
              num_parts: Optional[int] = None):
    """Exact fixed-width histogram of a numeric column over [lo, hi):
    Dataset of (bucket, n) int64 rows, empty buckets omitted (SQL GROUP
    BY semantics). The bucket index is computed as
    ``floor((x - lo) * bins / (hi - lo))`` in float64 with that exact
    association order, so DuckDB evaluating the same expression buckets
    every IEEE double identically — the histogram is oracle-exact, not
    just approximately equal. Out-of-range and null values are dropped.

    Shape: per-batch bincount combiner (O(bins) ints per batch), ONE
    bucket-keyed exchange over at most bins rows per batch — exchange
    volume is bins-proportional, never corpus-proportional."""
    import pyarrow.compute as pc

    from .shuffle import partitioned_group_agg

    lo_f, hi_f, nb = float(lo), float(hi), int(bins)

    def partial(batch: pa.Table) -> pa.Table:
        x = pc.cast(batch.column(col), pa.float64()).drop_null() \
            .to_numpy(zero_copy_only=False)
        if len(x) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        idx = np.floor((x - lo_f) * nb / (hi_f - lo_f))
        keep = (idx >= 0) & (idx < nb)
        idx = idx[keep].astype(np.int64)
        if len(idx) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        counts = np.bincount(idx, minlength=nb)
        nz = np.flatnonzero(counts)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "n": pa.array(counts[nz], pa.int64())})

    rows = ds.map_batches(partial, batch_format="pyarrow")
    return partitioned_group_agg(rows, ["bucket"], [("n", "sum", "n")],
                                 num_parts=num_parts)


def exact_distinct(ds, cols, num_parts: Optional[int] = None):
    """EXACT global COUNT(DISTINCT cols) — the exact complement to
    :func:`approx_distinct` for when the answer must be right, not
    estimated. NULL tuples count once (one extra distinct value), unlike
    single-column SQL COUNT(DISTINCT x) which ignores NULLs — pass
    ``drop_null_single=True`` semantics by pre-filtering upstream, or
    use the per-column convention documented in the oracle.

    Scale shape: per-batch DISTINCT combiner (the exchange moves one row
    per distinct tuple per batch, never per input row), ONE tuple-hash
    exchange, per-partition distinct count (each distinct tuple lives in
    exactly one partition, so partition counts sum exactly), and a
    bounded P-row fold. Driver volume O(P) integers."""
    import ray.data as rd

    from .shuffle import add_hash_partition, default_num_parts

    cols = list(cols)
    P = num_parts or default_num_parts()

    def distinct(t: pa.Table) -> pa.Table:
        return (t.select(cols).group_by(cols)
                .aggregate([([], "count_all")]).drop_columns("count_all"))

    dedup = ds.map_batches(distinct, batch_format="pyarrow")

    def key_fn(batch: pa.Table):
        arrs = []
        for c in cols:
            col = batch.column(c)
            if pa.types.is_integer(col.type) and col.null_count == 0:
                arrs.append(col.to_numpy(zero_copy_only=False))
            else:
                arrs.append(_hash64_any(col).astype(np.int64))
        return arrs

    parted = add_hash_partition(dedup, cols, P, key_arrays_fn=key_fn)

    def count_kernel(tbl: pa.Table) -> pa.Table:
        g = tbl.drop_columns("part").group_by(cols).aggregate(
            [([], "count_all")])
        return pa.table({"n": pa.array([g.num_rows], pa.int64())})

    partials = parted.groupby("part").map_groups(count_kernel,
                                                 batch_format="pyarrow")
    total = int(sum(r["n"] for r in partials.take_all()))
    return rd.from_arrow(pa.table({"n_distinct": pa.array([total],
                                                          pa.int64())}))


# ---- DDSketch: DETERMINISTIC mergeable quantiles ------------------------

def _dd_gamma(alpha: float) -> float:
    return (1.0 + alpha) / (1.0 - alpha)


def _dd_bucket(x: np.ndarray, gamma: float) -> np.ndarray:
    """DDSketch bucket index of positive values: ceil(ln(x)/ln(gamma)),
    computed with a 1e-9 downward epsilon so a value mathematically ON a
    bucket boundary lands in the same bucket under any IEEE libm (numpy
    here, DuckDB in the oracle — their ln() may differ by ~1 ulp, 7
    orders of magnitude inside the epsilon)."""
    return np.ceil(np.log(x) / np.log(gamma) - 1e-9).astype(np.int64)


def dd_bucket_value(bucket, alpha: float = 0.01) -> float:
    """Representative value of a DDSketch bucket (the paper's midpoint
    2*gamma^i/(gamma+1)); relative error <= alpha."""
    g = _dd_gamma(alpha)
    return 2.0 * g ** int(bucket) / (g + 1.0)


def _dd_quantile_kernel(buckets: np.ndarray, counts: np.ndarray,
                        qs) -> list:
    """(q_pct, bucket) rows from a bucket histogram: for each q the first
    bucket (ascending) whose cumulative count exceeds q/100*(n-1) — the
    same rank convention the SQL oracle spells out."""
    order = np.argsort(buckets)
    b = buckets[order]
    cum = np.cumsum(counts[order])
    n = int(cum[-1])
    out = []
    for q in qs:
        rank = (q / 100.0) * (n - 1)
        i = int(np.searchsorted(cum, rank, side="right"))
        out.append((int(q), int(b[i])))
    return out


def ddsketch_quantiles(ds, col: str, qs=(1, 25, 50, 75, 99),
                       alpha: float = 0.01,
                       num_parts: Optional[int] = None):
    """DETERMINISTIC approximate quantiles of a positive numeric column
    via DDSketch (Masson, Rim & Lee, VLDB 2019): fixed log-spaced buckets
    with relative-error bound ``alpha``. Bucket counts are exact integers
    and bucket boundaries depend only on the VALUE — never on batch or
    partition layout — so unlike the GK-style ``quantile_sketch`` the
    result is bit-identical at any parallelism AND recomputable by a SQL
    oracle (ln-bucket + window cumsum). Non-positive / null values are
    dropped (DDSketch's log buckets need x > 0; use value_histogram for
    signed data). Returns (q_pct:int64, bucket:int64) — turn a bucket
    into its value estimate with :func:`dd_bucket_value`.

    Shape: per-batch bucket+count combiner (O(distinct buckets) ~
    O(log(range)/alpha) rows per batch), ONE bucket-keyed exchange, and a
    driver fold over <= a few thousand bucket rows — driver and exchange
    volume are bucket-proportional, never corpus-proportional."""
    import pyarrow.compute as pc
    import ray.data as rd

    from .shuffle import partitioned_group_agg

    g = _dd_gamma(alpha)

    def partial(batch: pa.Table) -> pa.Table:
        x = pc.cast(batch.column(col), pa.float64()).drop_null() \
            .to_numpy(zero_copy_only=False)
        x = x[x > 0]
        if len(x) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        b, c = np.unique(_dd_bucket(x, g), return_counts=True)
        return pa.table({"bucket": pa.array(b, pa.int64()),
                         "c": pa.array(c.astype(np.int64), pa.int64())})

    hist = partitioned_group_agg(ds.map_batches(partial,
                                                batch_format="pyarrow"),
                                 ["bucket"], [("c", "sum", "c")],
                                 num_parts=num_parts)
    rows = hist.take_all()           # <= bucket count: bounded, tiny
    if not rows:
        return rd.from_arrow(pa.table({
            "q_pct": pa.array([], pa.int64()),
            "bucket": pa.array([], pa.int64())}))
    b = np.array([r["bucket"] for r in rows], np.int64)
    c = np.array([r["c"] for r in rows], np.int64)
    out = _dd_quantile_kernel(b, c, qs)
    return rd.from_arrow(pa.table({
        "q_pct": pa.array([q for q, _ in out], pa.int64()),
        "bucket": pa.array([bk for _, bk in out], pa.int64())}))


def ddsketch_quantiles_by(ds, key_col: str, col: str,
                          qs=(1, 25, 50, 75, 99), alpha: float = 0.01,
                          num_parts: Optional[int] = None):
    """Per-group :func:`ddsketch_quantiles` at unbounded group count:
    per-batch (key, bucket) count combiner, ONE (key, bucket)-keyed
    exchange to exact counts, then a key-keyed exchange whose partition
    kernel computes each group's quantiles — no driver state at all.
    Returns (key_col, q_pct:int64, bucket:int64)."""
    import pyarrow.compute as pc

    from .shuffle import (add_hash_partition, default_num_parts,
                          partitioned_group_agg)

    g = _dd_gamma(alpha)
    P = num_parts or default_num_parts()

    def partial(batch: pa.Table) -> pa.Table:
        x = pc.cast(batch.column(col), pa.float64())
        keep = pc.and_kleene(pc.is_valid(x),
                             pc.greater(x, pa.scalar(0.0)))
        t = batch.filter(pc.fill_null(keep, False))
        xv = pc.cast(t.column(col), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        kt = pa.table({key_col: t.column(key_col),
                       "bucket": pa.array(_dd_bucket(xv, g), pa.int64())})
        agg = kt.group_by([key_col, "bucket"], use_threads=False) \
                .aggregate([([], "count_all")])
        return agg.rename_columns([key_col, "bucket", "c"])

    def kb_keys(batch: pa.Table):
        colk = batch.column(key_col)
        ka = (colk.to_numpy(zero_copy_only=False)
              if pa.types.is_integer(colk.type) and colk.null_count == 0
              else _hash64_any(colk).astype(np.int64))
        return [ka, batch.column("bucket").to_numpy(zero_copy_only=False)]

    hist = partitioned_group_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        [key_col, "bucket"], [("c", "sum", "c")], num_parts=num_parts,
        key_arrays_fn=kb_keys)

    def keys(batch: pa.Table):
        colk = batch.column(key_col)
        if pa.types.is_integer(colk.type) and colk.null_count == 0:
            return [colk.to_numpy(zero_copy_only=False)]
        return [_hash64_any(colk).astype(np.int64)]

    parted = add_hash_partition(hist, [key_col], P, key_arrays_fn=keys)

    def kernel(tbl: pa.Table) -> pa.Table:
        tbl = tbl.drop_columns("part").sort_by(
            [(key_col, "ascending"), ("bucket", "ascending")])
        ktype = tbl.schema.field(key_col).type
        if tbl.num_rows == 0:
            return pa.table({key_col: pa.array([], ktype),
                             "q_pct": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64())})
        kcol = tbl.column(key_col).combine_chunks()
        b = tbl.column("bucket").to_numpy(zero_copy_only=False)
        c = tbl.column("c").to_numpy(zero_copy_only=False)
        n = len(kcol)
        neq = pc.fill_null(
            pc.not_equal(kcol.slice(1), kcol.slice(0, n - 1)),
            True).to_numpy(zero_copy_only=False)
        first = np.ones(n, dtype=bool)
        first[1:] = neq
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], n)
        out_k, out_q, out_b = [], [], []
        for s, e in zip(starts, ends):
            for q, bk in _dd_quantile_kernel(b[s:e], c[s:e], qs):
                out_k.append(s)
                out_q.append(q)
                out_b.append(bk)
        return pa.table({
            key_col: kcol.take(pa.array(out_k, pa.int64())),
            "q_pct": pa.array(out_q, pa.int64()),
            "bucket": pa.array(out_b, pa.int64())})

    return parted.groupby("part").map_groups(kernel,
                                             batch_format="pyarrow")
