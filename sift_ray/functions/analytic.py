"""Analytic (window-function) and OLAP-rollup operators.

The reference has no cross-row analytics of any kind (SURVEY.md §2.8);
these are engine extensions a training-data / feature pipeline needs:
per-key ordered window features (row_number / lag / running sum / moving
sum — the classic sessionized-feature shape) and multi-level ROLLUP
aggregates. Both are oracle-checked exactly against DuckDB window /
GROUP BY ROLLUP SQL.

Determinism discipline (same rule as relational.py / windows.py):
distributed float sums are order-dependent, so exact-checked values are
integers (cents / counts); ordering keys are total orders (a unique id
breaks every tie), so results are partition-count and layout invariant.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .shuffle import AggSpec, default_num_parts, partitioned_group_agg


def _int64_col(tbl: pa.Table, name: str) -> np.ndarray:
    col = tbl.column(name)
    if pa.types.is_timestamp(col.type):
        col = pc.cast(col, pa.int64())
    return col.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)


def keyed_window_calcs(ds, key_col: str, order_cols: Sequence[str],
                       value_col: str, moving_rows: int = 3,
                       num_parts: Optional[int] = None):
    """Per-key ordered window functions in one exchange.

    For each row, within its ``key_col`` group ordered by ``order_cols``
    (which must form a total order — include a unique id last), computes:

      rn    — ROW_NUMBER()
      prev  — LAG(value, 1)           (null on each group's first row)
      run   — SUM(value) ROWS UNBOUNDED PRECEDING (running total)
      mov   — SUM(value) ROWS ``moving_rows-1`` PRECEDING (moving sum
              over the last ``moving_rows`` rows including current)

    ``value_col`` must be int64 (convert money to cents upstream) so the
    sums are exact and order-free.

    Scale shape: ONE key-hash exchange (all rows of a key land in one
    partition), then a partition-local lexsort + fully vectorized
    segment arithmetic — no per-row Python, no driver state. This is the
    distributed equivalent of SQL ``OVER (PARTITION BY key ORDER BY
    ...)``; Ray Data has no window-function primitive. Hot keys: a single
    key's rows must fit one partition (same caveat as session_windows —
    windows.py documents the time-pre-split mitigation for bot keys).
    """
    P = num_parts or default_num_parts()
    k = int(moving_rows)
    if k < 1:
        raise ValueError("moving_rows must be >= 1")
    order_list: List[str] = list(order_cols)

    def kernel(tbl: pa.Table) -> pa.Table:
        tbl = tbl.drop_columns("part")
        n = tbl.num_rows
        if n == 0:
            return tbl.append_column("rn", pa.array([], pa.int64())) \
                      .append_column("prev", pa.array([], pa.int64())) \
                      .append_column("run", pa.array([], pa.int64())) \
                      .append_column("mov", pa.array([], pa.int64()))
        key = _int64_col(tbl, key_col)
        orders = [_int64_col(tbl, c) for c in order_list]
        # np.lexsort: last key is primary
        idx = np.lexsort(tuple(reversed(orders)) + (key,))
        tbl = tbl.take(pa.array(idx))
        key = key[idx]
        val = _int64_col(tbl, value_col)

        pos = np.arange(n, dtype=np.int64)
        starts = np.empty(n, dtype=bool)
        starts[0] = True
        starts[1:] = key[1:] != key[:-1]
        # index of each row's group start
        gstart = np.maximum.accumulate(np.where(starts, pos, 0))

        rn = pos - gstart + 1
        prev = np.empty(n, dtype=np.int64)
        prev[1:] = val[:-1]
        prev[0] = 0
        prev_valid = ~starts

        incl = np.cumsum(val)
        excl = incl - val                      # prefix sum EXCLUDING row i
        run = incl - excl[gstart]
        lo = np.maximum(pos - (k - 1), gstart)
        mov = incl - excl[lo]

        return (tbl
                .append_column("rn", pa.array(rn, pa.int64()))
                .append_column("prev", pa.array(prev, pa.int64(),
                                                mask=~prev_valid))
                .append_column("run", pa.array(run, pa.int64()))
                .append_column("mov", pa.array(mov, pa.int64())))

    from .shuffle import add_hash_partition
    parted = add_hash_partition(ds, [key_col], P)
    return parted.groupby("part").map_groups(kernel, batch_format="pyarrow")


def keyed_rank_calcs(ds, key_col: str, rank_col: str, tiebreak_col: str,
                     q: int = 4, num_parts: Optional[int] = None):
    """Per-key ranking window functions in one exchange — the tie-aware
    complement to ``keyed_window_calcs`` (which assumes a total order).
    Within each ``key_col`` group, ranking on ``rank_col`` (int64; ties
    share ranks) with ``tiebreak_col`` completing the total order where
    one is needed, computes:

      rnk   — RANK()          (ties share, gaps after)
      drnk  — DENSE_RANK()    (ties share, no gaps)
      prnk  — PERCENT_RANK()  = (rnk-1)/(n-1), 0.0 for a 1-row group
      nt    — NTILE(q) over (rank, tiebreak): earlier buckets get the
              remainder rows, exactly the SQL rule
      fv/lv — FIRST_VALUE/LAST_VALUE of ``rank_col`` over the full group

    Scale shape: identical to keyed_window_calcs — ONE key-hash exchange,
    partition-local lexsort, fully vectorized segment arithmetic (the
    tie-run starts are one shifted compare; bucket math is closed-form in
    rn and group size). ``prnk`` is one IEEE division in both engines, so
    it compares exact. Same hot-key caveat: one key's rows must fit a
    partition."""
    P = num_parts or default_num_parts()
    nq = int(q)
    if nq < 1:
        raise ValueError("q must be >= 1")

    def kernel(tbl: pa.Table) -> pa.Table:
        tbl = tbl.drop_columns("part")
        n = tbl.num_rows
        if n == 0:
            out = tbl
            for name, typ in (("rnk", pa.int64()), ("drnk", pa.int64()),
                              ("prnk", pa.float64()), ("nt", pa.int64()),
                              ("fv", pa.int64()), ("lv", pa.int64())):
                out = out.append_column(name, pa.array([], typ))
            return out
        key = _int64_col(tbl, key_col)
        rank = _int64_col(tbl, rank_col)
        tie = _int64_col(tbl, tiebreak_col)
        idx = np.lexsort((tie, rank, key))
        tbl = tbl.take(pa.array(idx))
        key, rank = key[idx], rank[idx]

        pos = np.arange(n, dtype=np.int64)
        starts = np.empty(n, dtype=bool)
        starts[0] = True
        starts[1:] = key[1:] != key[:-1]
        gstart = np.maximum.accumulate(np.where(starts, pos, 0))
        rn = pos - gstart + 1

        newval = starts.copy()
        newval[1:] |= rank[1:] != rank[:-1]
        vstart = np.maximum.accumulate(np.where(newval, pos, 0))
        rnk = vstart - gstart + 1
        cums = np.cumsum(newval)
        drnk = cums - cums[gstart] + 1

        glen = np.diff(np.append(np.flatnonzero(starts), n))
        gsize = np.repeat(glen, glen)
        prnk = np.where(gsize > 1,
                        (rnk - 1) / np.maximum(gsize - 1, 1), 0.0)

        base = gsize // nq
        rem = gsize % nq
        thresh = rem * (base + 1)
        base_safe = np.maximum(base, 1)   # rn > thresh implies base >= 1
        nt = np.where(rn <= thresh,
                      (rn - 1) // (base + 1) + 1,
                      rem + (rn - thresh - 1) // base_safe + 1)

        fv = rank[gstart]
        lv = rank[gstart + gsize - 1]
        return (tbl
                .append_column("rnk", pa.array(rnk, pa.int64()))
                .append_column("drnk", pa.array(drnk, pa.int64()))
                .append_column("prnk", pa.array(prnk, pa.float64()))
                .append_column("nt", pa.array(nt, pa.int64()))
                .append_column("fv", pa.array(fv, pa.int64()))
                .append_column("lv", pa.array(lv, pa.int64())))

    from .shuffle import add_hash_partition
    parted = add_hash_partition(ds, [key_col], P)
    return parted.groupby("part").map_groups(kernel, batch_format="pyarrow")


_REFOLD = {"sum": "sum", "count": "sum", "count_all": "sum",
           "min": "min", "max": "max"}


def rollup(ds, key_cols: Sequence[str], aggs: List[AggSpec],
           num_parts: Optional[int] = None):
    """GROUP BY ROLLUP(key1, key2, ...): aggregates at every prefix level
    of the key hierarchy plus the grand total, rolled-up key columns null.
    A thin wrapper over :func:`grouping_sets` with the prefix lattice."""
    keys = list(key_cols)
    sets = [tuple(keys[:i]) for i in range(len(keys), -1, -1)]
    return grouping_sets(ds, keys, aggs, sets, num_parts=num_parts)


def cube(ds, key_cols: Sequence[str], aggs: List[AggSpec],
         num_parts: Optional[int] = None):
    """GROUP BY CUBE(key1, key2, ...): aggregates at EVERY subset of the
    key columns plus the grand total — the full data-cube lattice (Gray
    et al., 1997). A thin wrapper over :func:`grouping_sets` with all
    2^k subsets, ordered full set first, grand total last (matching
    DuckDB's CUBE expansion order; the oracle compare sorts anyway)."""
    from itertools import combinations
    keys = list(key_cols)
    sets = []
    for r in range(len(keys), -1, -1):
        sets.extend(combinations(keys, r))
    return grouping_sets(ds, keys, aggs, sets, num_parts=num_parts)


def grouping_sets(ds, key_cols: Sequence[str], aggs: List[AggSpec],
                  sets: Sequence[Sequence[str]],
                  num_parts: Optional[int] = None):
    """GROUP BY GROUPING SETS: one aggregate table per requested key
    subset, absent key columns typed-null (the SQL convention).

    Only distributive aggregates are accepted (sum / count / count_all /
    min / max) because every coarser level is re-folded FROM the finest
    aggregate: the corpus crosses the exchange exactly once (the
    full-key group-by); every requested set reduces the already-
    aggregated table, whose size is bounded by finest-group cardinality,
    not corpus rows. The empty set (grand total) folds each finest BLOCK
    to one partial row map-side and combines the n_blocks partials on
    the driver — bounded driver state at unbounded key cardinality."""
    keys = list(key_cols)
    if not keys:
        raise ValueError("grouping_sets needs at least one key column")
    for _, fn, _ in aggs:
        if fn not in _REFOLD:
            raise ValueError(f"non-distributive agg {fn!r} in grouping_sets")
    set_lists = [list(s) for s in sets]
    for s in set_lists:
        if not set(s) <= set(keys):
            raise ValueError(f"grouping set {s!r} not a subset of {keys!r}")
    out_names = [name for *_, name in aggs]

    def key_hashes(cols: List[str]):
        """Map-side int64 key arrays for any key type (strings hash; the
        kernel re-groups by the TRUE columns, so collisions stay exact)."""
        def fn(batch: pa.Table):
            from .sketch import _hash64_route
            arrs = []
            for c in cols:
                col = batch.column(c)
                if pa.types.is_integer(col.type):
                    arrs.append(col.to_numpy(zero_copy_only=False))
                else:
                    arrs.append(_hash64_route(col).astype(np.int64))
            return arrs
        return fn

    finest = partitioned_group_agg(ds, keys, aggs, num_parts=num_parts,
                                   key_arrays_fn=key_hashes(keys))
    finest = finest.materialize()   # reused by every coarser level
    sch = finest.schema()
    types = {n: t for n, t in zip(sch.names, sch.types)}
    refold: List[AggSpec] = [(name, _REFOLD[fn], name)
                             for (_, fn, _), name in zip(aggs, out_names)]

    def pad_nulls(level_keys: List[str]):
        """Append typed-null columns for rolled-up keys (typed empties keep
        the union schema stable — the r2 lesson about schema warnings)."""
        def fn(t: pa.Table) -> pa.Table:
            arrays, names = [], []
            for c in keys:
                names.append(c)
                if c in level_keys:
                    arrays.append(t.column(c))
                else:
                    arrays.append(pa.nulls(t.num_rows, types[c]))
            for c in out_names:
                names.append(c)
                arrays.append(t.column(c))
            return pa.table(dict(zip(names, arrays)))
        return fn

    levels = []
    n_total = 0                     # empty sets → grand-total rows, last
    for s in set_lists:
        if not s:
            n_total += 1
            continue
        if s == keys:
            lvl = finest
        else:
            lvl = partitioned_group_agg(finest, s, refold,
                                        num_parts=num_parts,
                                        key_arrays_fn=key_hashes(s))
        levels.append(lvl.map_batches(pad_nulls(s),
                                      batch_format="pyarrow"))

    if n_total == 0:
        out = levels[0]
        for lvl in levels[1:]:
            out = out.union(lvl)
        return out

    # grand total: fold each finest BLOCK to one partial row map-side,
    # then combine the n_blocks partials on the driver — bounded driver
    # state even when finest-key cardinality is corpus-scale (pulling the
    # whole finest aggregate to the driver would not be)
    def block_fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({name: pa.array([], types[name])
                             for name in out_names})
        vals = {}
        for (_, fn, _), name in zip(aggs, out_names):
            refn = _REFOLD[fn]
            col = t.column(name)
            v = (pc.sum(col) if refn == "sum"
                 else pc.min(col) if refn == "min" else pc.max(col))
            vals[name] = pa.array([v.as_py()], types[name])
        return pa.table(vals)

    partials = finest.map_batches(block_fold,
                                  batch_format="pyarrow").to_pandas()
    total_arrays, total_names = [], []
    for c in keys:
        total_names.append(c)
        total_arrays.append(pa.nulls(1, types[c]))
    for (_, fn, _), name in zip(aggs, out_names):
        total_names.append(name)
        if len(partials) == 0:
            total_arrays.append(pa.array([0], types[name]))
            continue
        refn = _REFOLD[fn]
        s = partials[name]
        v = (s.sum() if refn == "sum"
             else s.min() if refn == "min" else s.max())
        total_arrays.append(pa.array([v], types[name]))
    import ray.data as rd
    total = rd.from_arrow(pa.table(dict(zip(total_names, total_arrays))))

    totals = total
    for _ in range(n_total - 1):
        totals = totals.union(total)
    if not levels:
        return totals
    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out.union(totals)


def grouped_quantiles_exact(ds, group_col: str, value_col: str,
                            qs: Sequence[float] = (0.25, 0.5, 0.75),
                            num_parts: Optional[int] = None):
    """EXACT discrete quantiles per group at unbounded group cardinality
    (the exact complement to sketch.quantile_sketch_by's bounded-error
    summaries). Rule per (group, q): the smallest value whose cumulative
    count >= ceil(q * group_count) — deterministic and engine-agnostic
    (same rule as corpus.word_count_quantiles).

    Scale shape: per-batch (group, value) count combiner — the exchange
    moves one row per DISTINCT (group, value) pair per batch, never per
    input row — then ONE group-keyed exchange; all of a group's histogram
    lands in one partition, where a vectorized segmented cumsum reads off
    every quantile. ``value_col`` must be integer (cents upstream).
    Returns (group, q, value) rows."""
    import pyarrow.compute as pc

    from .shuffle import add_hash_partition

    P = num_parts or default_num_parts()
    q_arr = np.asarray(sorted(qs), dtype=np.float64)

    def partial(batch: pa.Table) -> pa.Table:
        g = (batch.select([group_col, value_col])
             .group_by([group_col, value_col])
             .aggregate([([], "count_all")]))
        return g.rename_columns([group_col, value_col, "n"])

    rows = ds.map_batches(partial, batch_format="pyarrow")
    parted = add_hash_partition(rows, [group_col], P)

    def kernel(tbl: pa.Table) -> pa.Table:
        tbl = tbl.drop_columns("part")
        if tbl.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.int64()),
                             "q": pa.array([], pa.float64()),
                             "value": pa.array([], pa.int64())})
        # fold same-key partials from different batches, then sort
        tbl = (tbl.group_by([group_col, value_col])
               .aggregate([("n", "sum")])
               .rename_columns([group_col, value_col, "n"]))
        keys = tbl.column(group_col).to_numpy(zero_copy_only=False)
        vals = tbl.column(value_col).to_numpy(zero_copy_only=False)
        cnts = tbl.column("n").to_numpy(zero_copy_only=False)
        idx = np.lexsort((vals, keys))
        keys, vals, cnts = keys[idx], vals[idx], cnts[idx]
        n = len(keys)
        pos = np.arange(n, dtype=np.int64)
        starts = np.empty(n, dtype=bool)
        starts[0] = True
        starts[1:] = keys[1:] != keys[:-1]
        gstart = np.maximum.accumulate(np.where(starts, pos, 0))
        incl = np.cumsum(cnts)
        excl = incl - cnts
        cum = incl - excl[gstart]                      # per-group cumsum
        # per-group totals, broadcast back over each group's rows
        last_mask = np.empty(n, dtype=bool)
        last_mask[:-1] = starts[1:]
        last_mask[-1] = True
        grp_ids = np.cumsum(starts) - 1
        tot = cum[last_mask][grp_ids]

        out_g, out_q, out_v = [], [], []
        for q in q_arr:
            need = np.ceil(q * tot.astype(np.float64))
            hit = cum >= need
            # first hit per group: hit AND (group start OR previous not hit)
            prev_hit = np.empty(n, dtype=bool)
            prev_hit[0] = False
            prev_hit[1:] = hit[:-1]
            first = hit & (starts | ~prev_hit)
            out_g.append(keys[first])
            out_v.append(vals[first])
            out_q.append(np.full(int(first.sum()), q))
        return pa.table({
            group_col: pa.array(np.concatenate(out_g), pa.int64()),
            "q": pa.array(np.concatenate(out_q), pa.float64()),
            "value": pa.array(np.concatenate(out_v), pa.int64()),
        })

    return parted.groupby("part").map_groups(kernel, batch_format="pyarrow")


def grouped_quantiles_cont(ds, group_col: str, value_col: str,
                           qs: Sequence[float] = (0.25, 0.5, 0.75),
                           num_parts: Optional[int] = None):
    """SQL PERCENTILE_CONT per group — the INTERPOLATED complement to
    ``grouped_quantiles_exact`` (discrete rule). Per (group, q) over the
    group's sorted multiset of n values: position p = q*(n-1) (0-based),
    result = v[floor(p)] + (v[ceil(p)] - v[floor(p)]) * (p - floor(p)),
    exactly DuckDB's ``quantile_cont`` rule. With dyadic q (0.25/0.5/
    0.75) and integer cent values the doubles are exact in both engines,
    so the oracle compare is value-exact, not approximate.

    Scale shape: identical to grouped_quantiles_exact — per-batch
    (group, value) count combiner, ONE group-keyed exchange, vectorized
    segmented-cumsum readoff of the two bracketing order statistics per
    quantile. The reference has no aggregation surface at all
    (SURVEY.md §2.8); this is engine-extension territory."""
    from .shuffle import add_hash_partition

    P = num_parts or default_num_parts()
    q_arr = np.asarray(sorted(qs), dtype=np.float64)

    def partial(batch: pa.Table) -> pa.Table:
        g = (batch.select([group_col, value_col])
             .group_by([group_col, value_col])
             .aggregate([([], "count_all")]))
        return g.rename_columns([group_col, value_col, "n"])

    rows = ds.map_batches(partial, batch_format="pyarrow")
    parted = add_hash_partition(rows, [group_col], P)

    def kernel(tbl: pa.Table) -> pa.Table:
        tbl = tbl.drop_columns("part")
        if tbl.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.int64()),
                             "q": pa.array([], pa.float64()),
                             "value": pa.array([], pa.float64())})
        tbl = (tbl.group_by([group_col, value_col])
               .aggregate([("n", "sum")])
               .rename_columns([group_col, value_col, "n"]))
        keys = tbl.column(group_col).to_numpy(zero_copy_only=False)
        vals = tbl.column(value_col).to_numpy(zero_copy_only=False)
        cnts = tbl.column("n").to_numpy(zero_copy_only=False)
        idx = np.lexsort((vals, keys))
        keys, vals, cnts = keys[idx], vals[idx], cnts[idx]
        n = len(keys)
        pos = np.arange(n, dtype=np.int64)
        starts = np.empty(n, dtype=bool)
        starts[0] = True
        starts[1:] = keys[1:] != keys[:-1]
        gstart = np.maximum.accumulate(np.where(starts, pos, 0))
        incl = np.cumsum(cnts)
        excl = incl - cnts
        cum = incl - excl[gstart]                       # per-group cumsum
        last_mask = np.empty(n, dtype=bool)
        last_mask[:-1] = starts[1:]
        last_mask[-1] = True
        grp_ids = np.cumsum(starts) - 1
        tot = cum[last_mask][grp_ids]                   # per-group n

        def order_stat(k_per_row):
            """Value at 0-based order statistic k of each row's group,
            via 'first histogram row whose cumcount > k'."""
            hit = cum > k_per_row
            prev_hit = np.empty(n, dtype=bool)
            prev_hit[0] = False
            prev_hit[1:] = hit[:-1]
            first = hit & (starts | ~prev_hit)
            # one hit per group, aligned to group order
            return vals[first]

        gkeys = keys[last_mask]
        out_g, out_q, out_v = [], [], []
        for q in q_arr:
            p = q * (tot.astype(np.float64) - 1.0)     # per ROW; group-const
            lo_k = np.floor(p).astype(np.int64)
            hi_k = np.ceil(p).astype(np.int64)
            lo_v = order_stat(lo_k).astype(np.float64)
            hi_v = order_stat(hi_k).astype(np.float64)
            frac = (p - np.floor(p))[last_mask]         # one per group
            res = lo_v + (hi_v - lo_v) * frac
            out_g.append(gkeys)
            out_q.append(np.full(len(gkeys), q))
            out_v.append(res)
        return pa.table({
            group_col: pa.array(np.concatenate(out_g), pa.int64()),
            "q": pa.array(np.concatenate(out_q), pa.float64()),
            "value": pa.array(np.concatenate(out_v), pa.float64()),
        })

    return parted.groupby("part").map_groups(kernel, batch_format="pyarrow")


def pivot_counts(ds, row_col: str, col_col: str,
                 col_values: Sequence[str],
                 num_parts: Optional[int] = None):
    """Crosstab / PIVOT: one output row per ``row_col`` value with an
    int64 count column per listed ``col_values`` entry (``n_<value>``) —
    SQL ``count(*) FILTER (WHERE col = v)``. The column set must be
    declared (static schema); unlisted column values count into none.

    Scale shape: per-batch (row, col) count combiner, ONE row-keyed
    exchange (works at unbounded row cardinality — per-customer, per-URL),
    partition-local vectorized unstack."""
    import pandas as pd

    from .shuffle import add_hash_partition

    P = num_parts or default_num_parts()
    cols = list(col_values)
    out_names = [f"n_{v}" for v in cols]

    def partial(batch: pa.Table) -> pa.Table:
        g = (batch.select([row_col, col_col])
             .group_by([row_col, col_col])
             .aggregate([([], "count_all")]))
        return g.rename_columns([row_col, col_col, "n"])

    def key_fn(batch: pa.Table):
        col = batch.column(row_col)
        if pa.types.is_integer(col.type):
            return [col.to_numpy(zero_copy_only=False)]
        from .sketch import _hash64_route
        return [_hash64_route(col).astype(np.int64)]

    rows = ds.map_batches(partial, batch_format="pyarrow")
    parted = add_hash_partition(rows, [row_col], P, key_arrays_fn=key_fn)

    row_type = None  # resolved in the kernel from real data

    def kernel(tbl: pa.Table) -> pa.Table:
        # numpy pivot (replaces a pandas pivot_table per partition): rows
        # = np.unique over ALL row ids (a row with no matching col value
        # still gets a zero row), columns = the fixed `cols` list
        tbl = tbl.drop_columns("part")
        folded = (tbl.group_by([row_col, col_col], use_threads=False)
                  .aggregate([("n", "sum")])
                  .rename_columns([row_col, col_col, "n"]))
        rvals = folded.column(row_col).to_numpy(zero_copy_only=False)
        cvals = folded.column(col_col).to_numpy(zero_copy_only=False)
        nvals = folded.column("n").to_numpy(zero_copy_only=False)
        urows, rpos = np.unique(rvals, return_inverse=True)
        mat = np.zeros((len(urows), len(cols)), np.int64)
        for j, v in enumerate(cols):
            sel = cvals == v
            # (row, col) pairs are unique post-fold: direct assignment
            mat[rpos[sel], j] = nvals[sel]
        out = {row_col: pa.array(urows,
                                 folded.schema.field(row_col).type)}
        for j, name in enumerate(out_names):
            out[name] = pa.array(mat[:, j], pa.int64())
        return pa.table(out)

    return parted.groupby("part").map_groups(kernel, batch_format="pyarrow")


def _exact_moments(ds, x_col: str, y_col: str):
    """Exact second-order moments of two INTEGER columns, distributed:
    per-batch partial sums of (n, x, y, x^2, y^2, xy) are computed
    overflow-safely by splitting each value at 2^20 (hi*2^20 + lo) so
    every component sum stays far inside int64 even for cent-scale
    values at billions of rows; the driver reconstructs the true moments
    in arbitrary-precision Python ints (one partial row per BLOCK —
    driver volume O(blocks)). Returns (n, sx, sy, sxx, syy, sxy) as
    Python ints. Shared by exact_corr and linear_fit."""
    B = np.int64(1) << 20

    def partial(t: pa.Table) -> pa.Table:
        names = ["n", "sx", "sy",
                 "xx_hh", "xx_hl", "xx_ll",
                 "yy_hh", "yy_hl", "yy_ll",
                 "xy_hh", "xy_hl", "xy_lh", "xy_ll"]
        if t.num_rows == 0:
            return pa.table({k: pa.array([], pa.int64()) for k in names})
        x = t.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        # overflow-safety contract: |v| < 2^40 keeps every hi/lo component
        # sum below 2^60 even at 2^20-row batches (cents/quantities are
        # ~2^23; rescale upstream if a column ever exceeds this)
        lim = np.int64(1) << 40
        if len(x) and (np.abs(x).max() >= lim or np.abs(y).max() >= lim):
            raise ValueError("exact_corr inputs must satisfy |v| < 2^40")
        xh, xl = x // B, x % B
        yh, yl = y // B, y % B
        vals = [len(x), x.sum(), y.sum(),
                (xh * xh).sum(), (xh * xl).sum(), (xl * xl).sum(),
                (yh * yh).sum(), (yh * yl).sum(), (yl * yl).sum(),
                (xh * yh).sum(), (xh * yl).sum(), (xl * yh).sum(),
                (xl * yl).sum()]
        return pa.table({k: pa.array([int(v)], pa.int64())
                         for k, v in zip(names, vals)})

    rows = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(rows) == 0 or rows["n"].sum() < 2:
        raise ValueError("exact moments need at least 2 rows")
    g = {k: [int(v) for v in rows[k]] for k in rows.columns}

    def tot(name):
        return sum(g[name])           # python ints: no overflow

    Bi = 1 << 20
    n = tot("n")
    sx, sy = tot("sx"), tot("sy")
    sxx = tot("xx_hh") * Bi * Bi + 2 * tot("xx_hl") * Bi + tot("xx_ll")
    syy = tot("yy_hh") * Bi * Bi + 2 * tot("yy_hl") * Bi + tot("yy_ll")
    sxy = (tot("xy_hh") * Bi * Bi + (tot("xy_hl") + tot("xy_lh")) * Bi
           + tot("xy_ll"))
    return n, sx, sy, sxx, syy, sxy


def exact_corr(ds, x_col: str, y_col: str, decimals: int = 9):
    """Pearson correlation of two INTEGER columns with exact distributed
    moments (see ``_exact_moments``); the driver evaluates

        r = (n*sxy - sx*sy) / (sqrt(n*sxx - sx^2) * sqrt(n*syy - sy^2))

    with exactly the double operations an ANSI-SQL engine performs on
    its exact HUGEINT sums — so the result is value-exact cross-engine
    (rounded to ``decimals`` to pin the final representation).

    Returns a 1-row Dataset (n, corr). Integer inputs are the caller's
    contract (cast money to cents upstream, the repo-wide convention)."""
    import ray.data as rd

    n, sx, sy, sxx, syy, sxy = _exact_moments(ds, x_col, y_col)
    num = n * sxy - sx * sy
    d1 = n * sxx - sx * sx
    d2 = n * syy - sy * sy
    if d1 <= 0 or d2 <= 0:
        corr = float("nan")
    else:
        import math
        corr = float(num) / (math.sqrt(float(d1)) * math.sqrt(float(d2)))
    out = pa.table({"n": pa.array([n], pa.int64()),
                    "corr": pa.array([round(corr, decimals)],
                                     pa.float64())})
    return rd.from_arrow(out)


def linear_fit(ds, x_col: str, y_col: str, decimals: int = 9):
    """Simple OLS regression y = slope*x + intercept of two INTEGER
    columns from the same exact distributed moments as ``exact_corr``
    (one partial row per block; arbitrary-precision driver fold):

        slope     = (n*sxy - sx*sy) / (n*sxx - sx^2)
        intercept = (sy - slope*sx) / n
        r2        = (n*sxy - sx*sy)^2 / ((n*sxx - sx^2)(n*syy - sy^2))

    Every division/multiply above happens on exact integer numerators and
    denominators cast to double, mirrored term for term in the oracle SQL
    (HUGEINT sums -> the same double ops) — the SQL-standard regr_slope /
    regr_intercept / regr_r2 family, evaluated exactly instead of via
    streaming-double aggregation. Returns a 1-row Dataset
    (n, slope, intercept, r2)."""
    import ray.data as rd

    n, sx, sy, sxx, syy, sxy = _exact_moments(ds, x_col, y_col)
    num = n * sxy - sx * sy
    d1 = n * sxx - sx * sx
    d2 = n * syy - sy * sy
    if d1 == 0:
        slope = intercept = r2 = float("nan")
    else:
        slope = float(num) / float(d1)
        intercept = (float(sy) - slope * float(sx)) / float(n)
        r2 = (float(num) * float(num)) / (float(d1) * float(d2)) \
            if d2 != 0 else float("nan")
    out = pa.table({
        "n": pa.array([n], pa.int64()),
        "slope": pa.array([round(slope, decimals)], pa.float64()),
        "intercept": pa.array([round(intercept, decimals)], pa.float64()),
        "r2": pa.array([round(r2, decimals)], pa.float64()),
    })
    return rd.from_arrow(out)


def auc_exact(ds, label_col: str, score_col: str,
              num_parts: Optional[int] = None, decimals: int = 9):
    """EXACT distributed ROC-AUC of an integer score against a binary
    label — the Mann-Whitney U statistic with tie-AVERAGED ranks, the
    classifier-evaluation pass of a quality-filter pipeline. The whole
    computation is integer until one final division, so the result is
    value-exact cross-engine.

    Scale shape: (1) per-batch (score, n_pos, n) partials fold the
    corpus into a DISTINCT-SCORE histogram through ONE score-keyed
    exchange (the histogram is distinct-value-sized, not corpus-sized);
    (2) the histogram range-partitions by score value, per-partition
    count sums give the driver a P-integer exclusive prefix (the
    token_shards two-pass prefix-sum pattern); (3) each partition sorts
    its scores, forms tie-group average ranks from the global prefix,
    and emits THREE integers (doubled positive-rank sum, n_pos, n) —
    summed with arbitrary-precision Python ints, so no overflow at any
    corpus size. AUC = (2R_pos - n_pos(n_pos+1)) / (2 n_pos n_neg).

    Returns a 1-row Dataset (auc, n_pos, n_neg)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from .shuffle import default_num_parts, partitioned_group_agg

    P = num_parts or default_num_parts()

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([score_col, label_col]).group_by(score_col).aggregate(
            [(label_col, "sum"), ([], "count_all")])
        return g.rename_columns(["s", "np", "n"])

    rows = ds.map_batches(partial, batch_format="pyarrow")
    hist = partitioned_group_agg(rows, ["s"],
                                 [("np", "sum", "np"), ("n", "sum", "n")],
                                 num_parts=P).materialize()
    smin, smax = hist.min("s"), hist.max("s")
    if smin is None:
        raise ValueError("auc_exact: empty input")
    width = max(1, (int(smax) - int(smin) + P) // P)

    def add_part(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False)
        part = ((s - smin) // width).astype(np.int64)
        return t.append_column("part", pa.array(part, pa.int64()))

    parted = hist.map_batches(add_part, batch_format="pyarrow")

    # pass 1: per-partition row counts -> driver exclusive prefix (P ints)
    sums: dict = {}
    for b in (parted.map_batches(
            lambda t: t.select(["part", "n"]).group_by(["part"])
                       .aggregate([("n", "sum")]),
            batch_format="pyarrow")
            .iter_batches(batch_size=65536, batch_format="pyarrow")):
        for p, s in zip(b.column("part").to_pylist(),
                        b.column("n_sum").to_pylist()):
            sums[p] = sums.get(p, 0) + s
    offsets, acc = {}, 0
    for p in sorted(sums):
        offsets[p] = acc
        acc += sums[p]

    # pass 2: partition-local tie-group ranks + three-integer partials
    def scan(tbl: pa.Table) -> pa.Table:
        s = tbl.column("s").to_numpy(zero_copy_only=False)
        npos = tbl.column("np").to_numpy(zero_copy_only=False)
        n = tbl.column("n").to_numpy(zero_copy_only=False)
        part = int(tbl.column("part")[0].as_py())
        order = np.argsort(s, kind="stable")       # distinct values: total
        npos, n = npos[order], n[order]
        before = offsets[part] + np.concatenate(
            [[0], np.cumsum(n)[:-1]])
        # doubled average rank of tie group v: 2*before + n + 1
        terms = (npos.astype(object)
                 * (2 * before.astype(object) + n.astype(object) + 1))
        return pa.table({
            "two_rpos": pa.array([str(int(terms.sum()))], pa.string()),
            "npos": pa.array([int(npos.sum())], pa.int64()),
            "n": pa.array([int(n.sum())], pa.int64())})

    partials = (parted.groupby("part")
                .map_groups(scan, batch_format="pyarrow").take_all())
    two_rpos = sum(int(r["two_rpos"]) for r in partials)
    n_pos = sum(int(r["npos"]) for r in partials)
    n_tot = sum(int(r["n"]) for r in partials)
    n_neg = n_tot - n_pos
    if n_pos == 0 or n_neg == 0:
        raise ValueError("auc_exact needs both classes present")
    num = two_rpos - n_pos * (n_pos + 1)
    den = 2 * n_pos * n_neg
    auc = round(float(num) / float(den), decimals)
    return rd.from_arrow(pa.table({
        "auc": pa.array([auc], pa.float64()),
        "n_pos": pa.array([n_pos], pa.int64()),
        "n_neg": pa.array([n_neg], pa.int64())}))


_PROFILE_SCHEMA = pa.schema([
    ("col", pa.string()), ("kind", pa.int8()), ("v", pa.string()),
    ("n", pa.int64()), ("n_nulls", pa.int64()),
    ("min_num", pa.float64()), ("max_num", pa.float64()),
    ("min_str", pa.string()), ("max_str", pa.string()),
])

_PROFILE_OUT = pa.schema([
    ("col", pa.string()), ("n_rows", pa.int64()), ("n_nulls", pa.int64()),
    ("n_distinct", pa.int64()), ("min_num", pa.float64()),
    ("max_num", pa.float64()), ("min_str", pa.string()),
    ("max_str", pa.string()),
])


def _norm_to_string(col):
    """Injective per-column-type normalization of values to strings for
    exact distinct counting (Arrow's float formatting is shortest
    round-trippable, so doubles stay injective; timestamps go through
    their int64 micros; binary through hex). Caveat shared with any
    repr-based distinct: -0.0 vs 0.0 and NaN payloads count as distinct
    where SQL's value equality would merge them."""
    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return col
    if pa.types.is_timestamp(t):
        col = pc.cast(col, pa.int64())
    elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return pa.array([None if v is None else v.hex()
                         for v in col.to_pylist()], pa.string())
    return pc.cast(col, pa.string())


def profile_table(ds, cols: Optional[Sequence[str]] = None,
                  num_parts: Optional[int] = None):
    """One-pass distributed table profiler (the engine's ANALYZE /
    ``describe``): per column — row count, null count, EXACT distinct
    count, and min/max (numeric columns in ``min_num``/``max_num``,
    timestamps as epoch micros; string columns in ``min_str``/
    ``max_str``).

    Scale shape: a single corpus scan emits, per batch, C stat partial
    rows (counts + min/max — tree-foldable constants) plus the batch's
    per-column DISTINCT values normalized to strings (the map-side
    distinct combiner, so duplicated values never leave the batch). All
    rows ride ONE (col, value)-hash exchange; each partition folds its
    stat partials and counts its globally-unique (col, value) pairs, so
    the driver merges only num_parts x C partial rows. Distinct
    counting never holds more than a partition's unique values in
    memory — there is no driver-side value set.

    No reference analog (chriscorrea/sift has no table statistics,
    SURVEY.md §2.8); this is the standard profiling step before
    corpus-prep decisions (mixture weights, cap thresholds, skew
    checks). Oracle-exact vs per-column UNION ALL SQL.
    """
    import polars as pl
    import ray.data as rd

    from .shuffle import add_hash_partition

    names = list(cols) if cols is not None else list(ds.schema().names)
    P = num_parts or default_num_parts()

    def partials(tbl: pa.Table) -> pa.Table:
        out_cols = {f.name: [] for f in _PROFILE_SCHEMA}
        for name in names:
            col = tbl.column(name)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            n, nn = len(col), col.null_count
            row = dict(col=name, kind=0, v=None, n=n, n_nulls=nn,
                       min_num=None, max_num=None, min_str=None,
                       max_str=None)
            if n - nn > 0:
                t = col.type
                if pa.types.is_string(t) or pa.types.is_large_string(t):
                    mm = pc.min_max(col)
                    row["min_str"] = mm["min"].as_py()
                    row["max_str"] = mm["max"].as_py()
                elif not (pa.types.is_binary(t)
                          or pa.types.is_large_binary(t)):
                    num = (pc.cast(col, pa.int64())
                           if pa.types.is_timestamp(t) else col)
                    mm = pc.min_max(num)
                    row["min_num"] = float(mm["min"].as_py())
                    row["max_num"] = float(mm["max"].as_py())
            for k, lst in out_cols.items():
                lst.append(row[k])
            uniq = _norm_to_string(col).drop_null().unique()
            for u in uniq.to_pylist():
                out_cols["col"].append(name)
                out_cols["kind"].append(1)
                out_cols["v"].append(u)
                for k in ("n", "n_nulls", "min_num", "max_num",
                          "min_str", "max_str"):
                    out_cols[k].append(None)
        return pa.Table.from_pydict(out_cols, schema=_PROFILE_SCHEMA)

    def keys(batch: pa.Table):
        h = pl.from_arrow(
            batch.column("v").fill_null("\x00<stat>")).hash(seed=0)
        hc = pl.from_arrow(batch.column("col")).hash(seed=1)
        return [h.to_numpy().view(np.int64),
                hc.to_numpy().view(np.int64)]

    parted = add_hash_partition(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["col", "v"], P, key_arrays_fn=keys)

    def fold(tbl: pa.Table) -> pa.Table:
        stats = tbl.filter(pc.equal(tbl.column("kind"), 0))
        dv = tbl.filter(pc.equal(tbl.column("kind"), 1))
        agg = (stats.select(["col", "n", "n_nulls", "min_num", "max_num",
                             "min_str", "max_str"])
               .group_by("col")
               .aggregate([("n", "sum"), ("n_nulls", "sum"),
                           ("min_num", "min"), ("max_num", "max"),
                           ("min_str", "min"), ("max_str", "max")]))
        nd = (dv.select(["col", "v"]).group_by("col")
              .aggregate([("v", "count_distinct")]))
        out = agg.join(nd, "col", join_type="full outer",
                       right_suffix="_r")
        return pa.table({
            "col": out.column("col"),
            "n_rows": pc.coalesce(out.column("n_sum"), 0),
            "n_nulls": pc.coalesce(out.column("n_nulls_sum"), 0),
            "n_distinct": pc.coalesce(
                pc.cast(out.column("v_count_distinct"), pa.int64()), 0),
            "min_num": out.column("min_num_min"),
            "max_num": out.column("max_num_max"),
            "min_str": out.column("min_str_min"),
            "max_str": out.column("max_str_max"),
        })

    # iter_batches, NOT to_arrow_refs: to_arrow_refs() issues a
    # schema(fetch_if_missing=True) probe after consuming, which re-executes
    # the ENTIRE non-materialized plan (scan + exchange) a second time
    folded_parts = [
        t for t in (parted.groupby("part")
                    .map_groups(lambda t: fold(t.drop_columns("part")),
                                batch_format="pyarrow")
                    .iter_batches(batch_size=None, batch_format="pyarrow"))
        if t.num_rows > 0]
    folded = (pa.concat_tables(folded_parts) if folded_parts
              else _PROFILE_OUT.empty_table())
    if folded.num_rows == 0:
        return rd.from_arrow(_PROFILE_OUT.empty_table())
    final = (folded.group_by("col")
             .aggregate([("n_rows", "sum"), ("n_nulls", "sum"),
                         ("n_distinct", "sum"), ("min_num", "min"),
                         ("max_num", "max"), ("min_str", "min"),
                         ("max_str", "max")])
             .rename_columns(["col", "n_rows", "n_nulls", "n_distinct",
                              "min_num", "max_num", "min_str",
                              "max_str"]))
    final = final.take(
        pc.sort_indices(final.column("col")))
    return rd.from_arrow(final.cast(_PROFILE_OUT))


def grouped_string_agg(ds, group_col: str, value_col: str,
                       order_col: str, sep: str = "\n",
                       num_parts: Optional[int] = None):
    """Distributed ``string_agg(value, sep ORDER BY order_col)`` per
    group at unbounded group cardinality — the SQL list/concat rollup
    (and the generalization of the doc-reassembly step the unit-dedup
    family uses internally). ``order_col`` must totally order rows
    within a group (unique per group) so the result is deterministic
    and engine-reproducible.

    Scale shape: ONE group-key exchange; each partition lexsorts its
    rows by (group, order) and joins per group — no driver state.
    Returns (group_col, agg). NULL values render as empty strings
    (document that divergence from SQL string_agg, which SKIPS nulls —
    pass pre-filtered input for exact SQL parity)."""
    from .shuffle import add_hash_partition

    P = num_parts or default_num_parts()

    def keys(batch: pa.Table):
        col = batch.column(group_col)
        if pa.types.is_integer(col.type) and col.null_count == 0:
            return [col.to_numpy(zero_copy_only=False)]
        from .sketch import _hash64_route
        return [_hash64_route(col).astype(np.int64)]

    proj = ds.map_batches(
        lambda t: t.select([group_col, value_col, order_col]),
        batch_format="pyarrow")
    parted = add_hash_partition(proj, [group_col], P, key_arrays_fn=keys)

    def kernel(tbl: pa.Table) -> pa.Table:
        # Arrow sort + numpy segment bounds (replaces a pandas sort +
        # per-group lambda); values keep Python str() formatting so the
        # joined text matches the oracle exactly. Group boundaries come
        # from the ARROW column (validity mask + null-filled not_equal),
        # never a numpy view: an int64 key column with nulls converts to
        # float64 (NaN != NaN would split the null group per row, and
        # large ids lose exactness past 2^53). Null keys form ONE group,
        # matching pandas groupby(dropna=False) and SQL GROUP BY.
        import pyarrow.compute as pc
        tbl = tbl.drop_columns("part").sort_by(
            [(group_col, "ascending"), (order_col, "ascending")])
        gtype = tbl.schema.field(group_col).type
        col = tbl.column(group_col).combine_chunks()
        n = len(col)
        vals = tbl.column(value_col).to_pylist()
        if n == 0:
            return pa.table({group_col: pa.array([], gtype),
                             "agg": pa.array([], pa.string())})
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        neq = pc.fill_null(pc.not_equal(col.slice(1), col.slice(0, n - 1)),
                           False).to_numpy(zero_copy_only=False)
        first = np.ones(n, dtype=bool)
        first[1:] = neq | (valid[1:] != valid[:-1])
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], n)
        joined = [sep.join("" if v is None else str(v)
                           for v in vals[s:e])
                  for s, e in zip(starts, ends)]
        return pa.table({group_col: col.take(pa.array(starts)),
                         "agg": pa.array(joined, pa.string())})

    return parted.groupby("part").map_groups(kernel, batch_format="pyarrow")


def range_window_agg(ds, key_col: str, ts_col: str, value_col: str,
                     range_us: int = 3_600_000_000,
                     num_parts: Optional[int] = None):
    """Time-RANGE window frame per key: for every row, the SUM and COUNT
    of ``value_col`` over rows of the same key whose timestamp lies in
    ``[ts - range_us, ts]`` — SQL's ``RANGE BETWEEN <interval> PRECEDING
    AND CURRENT ROW`` (value-based frames, so timestamp TIES are peers
    and always share one frame), which the row-based ``moving_rows``
    window cannot express over irregular event streams.

    One key exchange; per partition a lexsort + per-key-segment prefix
    sums with two ``np.searchsorted`` boundary lookups — O(n log n),
    fully vectorized within a key. Integer discipline: ``value_col`` must
    be int64-castable (quantize floats upstream) so distributed sums are
    exact. Appends ``w_sum`` / ``w_cnt`` to the input columns.
    Hot keys: one key's rows must fit a partition (same caveat and
    mitigation path as session_windows / keyed_window_calcs)."""
    P = num_parts or default_num_parts()
    rng = np.int64(range_us)

    def kernel(tbl: pa.Table) -> pa.Table:
        tbl = tbl.drop_columns("part")
        n = tbl.num_rows
        if n == 0:
            return tbl.append_column("w_sum", pa.array([], pa.int64())) \
                      .append_column("w_cnt", pa.array([], pa.int64()))
        key = _int64_col(tbl, key_col)
        ts = _int64_col(tbl, ts_col)
        idx = np.lexsort((ts, key))
        tbl = tbl.take(pa.array(idx))
        key, ts = key[idx], ts[idx]
        val = _int64_col(tbl, value_col)

        incl = np.cumsum(val)
        excl = incl - val
        starts = np.flatnonzero(
            np.concatenate(([True], key[1:] != key[:-1])))
        ends = np.append(starts[1:], n)
        seg = np.repeat(np.arange(len(starts)), ends - starts)
        seg_min = ts[starts]
        tsn = ts - seg_min[seg]                       # >= 0 per segment
        max_range = int(tsn.max()) if n else 0
        offset = np.int64(max_range + int(rng) + 2)
        # composite key A = seg*offset + tsn is globally ascending, and
        # A - rng never dips into the previous segment's A-range (its max
        # is seg*offset - rng - 2), so TWO global searchsorted calls
        # replace the per-key Python loop — interpreter cost is O(1) at
        # any key cardinality. Falls back to the loop only if the
        # composite would overflow int64 (astronomical seg count x span).
        if len(starts) * int(offset) < (1 << 62):
            a = seg.astype(np.int64) * offset + tsn
            hi = np.searchsorted(a, a, side="right")
            lo = np.searchsorted(a, a - rng, side="left")
            w_sum = incl[hi - 1] - excl[lo]
            w_cnt = (hi - lo).astype(np.int64)
        else:  # pragma: no cover - requires ~2^62 composite range
            w_sum = np.empty(n, dtype=np.int64)
            w_cnt = np.empty(n, dtype=np.int64)
            for si in range(len(starts)):
                s, e = int(starts[si]), int(ends[si])
                sg = ts[s:e]
                h = np.searchsorted(sg, sg, side="right")
                l_ = np.searchsorted(sg, sg - rng, side="left")
                w_sum[s:e] = incl[s + h - 1] - excl[s + l_]
                w_cnt[s:e] = h - l_
        return (tbl
                .append_column("w_sum", pa.array(w_sum, pa.int64()))
                .append_column("w_cnt", pa.array(w_cnt, pa.int64())))

    from .shuffle import add_hash_partition
    parted = add_hash_partition(ds, [key_col], P)
    return parted.groupby("part").map_groups(kernel, batch_format="pyarrow")


def group_zscore(ds, key_col: str, value_col: str,
                 num_parts: Optional[int] = None):
    """Per-group standardization: z = (x - mean_g) / stddev_pop_g for
    every row, from EXACT integer moments — ``value_col`` must be
    int64-castable (quantize floats upstream), so the per-group sums are
    order-independent; the float math happens once per row from those
    exact moments, in a fixed expression order that an SQL mirror can
    reproduce bit-for-bit: mean = sum/cnt, var = sumsq/cnt - mean*mean,
    z = (x - mean) / sqrt(var). Single-member or constant groups get
    z = 0 (stddev 0 guard). One key exchange; appends ``z``."""
    P = num_parts or default_num_parts()

    def kernel(tbl: pa.Table) -> pa.Table:
        tbl = tbl.drop_columns("part")
        n = tbl.num_rows
        if n == 0:
            return tbl.append_column("z", pa.array([], pa.float64()))
        key = _int64_col(tbl, key_col)
        idx = np.argsort(key, kind="stable")
        tbl = tbl.take(pa.array(idx))
        key = key[idx]
        val = _int64_col(tbl, value_col)

        starts = np.flatnonzero(
            np.concatenate(([True], key[1:] != key[:-1])))
        ends = np.append(starts[1:], n)
        cnt = (ends - starts).astype(np.float64)
        # int64 cumsums keep the moments EXACT (values are quantized ints;
        # caller contract: |val| < ~3e9 so val^2 fits int64, and a
        # partition's sum of squares stays under 2^63)
        csum = np.concatenate(([0], np.cumsum(val)))
        csq = np.concatenate(([0], np.cumsum(val * val)))
        gsum = csum[ends] - csum[starts]
        gsq = csq[ends] - csq[starts]
        seg = np.repeat(np.arange(len(starts)), ends - starts)
        mean = gsum / cnt
        var = gsq / cnt - mean * mean
        std = np.sqrt(np.maximum(var, 0.0))
        z = np.zeros(n, dtype=np.float64)
        ok = std[seg] > 0
        z[ok] = (val[ok] - mean[seg][ok]) / std[seg][ok]
        return tbl.append_column("z", pa.array(z, pa.float64()))

    from .shuffle import add_hash_partition
    parted = add_hash_partition(ds, [key_col], P)
    return parted.groupby("part").map_groups(kernel, batch_format="pyarrow")


def merge_intervals(ds, key_col: str, start_col: str, end_col: str,
                    num_parts: Optional[int] = None):
    """Coalesce overlapping/touching intervals per key (gaps-and-islands):
    rows whose [start, end] ranges chain through overlaps merge into one
    island; returns (key, island_start, island_end, n_events) — visit
    stitching, downtime merging, copyright-span dedup. Touching counts
    as overlapping (start == previous max end joins the island).

    One key exchange; per partition a lexsort + vectorized running-max
    island detection and run-boundary aggregation (no Python loop over
    rows or keys). Integer discipline: start/end must be int64-castable
    (timestamps cast implicitly)."""
    P = num_parts or default_num_parts()

    def kernel(tbl: pa.Table) -> pa.Table:
        tbl = tbl.drop_columns("part")
        n = tbl.num_rows
        empty = pa.table({
            key_col: pa.array([], pa.int64()),
            "island_start": pa.array([], pa.int64()),
            "island_end": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64())})
        if n == 0:
            return empty
        key = _int64_col(tbl, key_col)
        s = _int64_col(tbl, start_col)
        e = _int64_col(tbl, end_col)
        idx = np.lexsort((e, s, key))
        key, s, e = key[idx], s[idx], e[idx]

        kstarts = np.concatenate(([True], key[1:] != key[:-1]))
        run_max = np.maximum.accumulate(e)
        # running max of e RESET per key: subtract per-key baseline trick —
        # recompute with segment-aware accumulate via np.fmax over offsets
        # is messy; instead null out cross-key carryover by recomputing
        # cummax within segments using the "subtract segment base" method:
        seg_id = np.cumsum(kstarts) - 1
        # cummax within segments: offset e by seg_id * BIG so the global
        # cummax never carries across segments, then remove the offset
        span = int(e.max() - e.min()) + 1 if n else 1
        base = e.min()
        n_segs = int(seg_id[-1]) + 1
        if n_segs * span < (1 << 62):
            comp = (e - base) + seg_id * np.int64(span)
            run_max = np.maximum.accumulate(comp) \
                - seg_id * np.int64(span) + base
        else:  # pragma: no cover - requires ~2^62 composite range
            run_max = np.empty(n, dtype=np.int64)
            seg_bounds = np.append(np.flatnonzero(kstarts), n)
            for si in range(len(seg_bounds) - 1):
                a, b = int(seg_bounds[si]), int(seg_bounds[si + 1])
                run_max[a:b] = np.maximum.accumulate(e[a:b])
        prev_max = np.empty(n, dtype=np.int64)
        prev_max[1:] = run_max[:-1]
        new_island = kstarts.copy()
        new_island[1:] |= s[1:] > prev_max[1:]
        island = np.cumsum(new_island) - 1  # global island ordinal

        istarts = np.flatnonzero(new_island)
        iends = np.append(istarts[1:], n)
        # island_end = max e in island = run_max at the island's last row
        return pa.table({
            key_col: pa.array(key[istarts], pa.int64()),
            "island_start": pa.array(s[istarts], pa.int64()),
            "island_end": pa.array(run_max[iends - 1], pa.int64()),
            "n_events": pa.array((iends - istarts).astype(np.int64),
                                 pa.int64()),
        })

    from .shuffle import add_hash_partition
    parted = add_hash_partition(ds, [key_col], P)
    return parted.groupby("part").map_groups(kernel, batch_format="pyarrow")
