"""Windowed aggregation over the events table (engine extension; the
reference has no streaming/window operators — SURVEY.md §2.8).

Tumbling windows: window id = epoch_us(ts) // window_us, computed with a
vectorized Arrow kernel, then pre-aggregated per batch (combiner) before
ONE hash-partitioned exchange. Window-group cardinality scales with the
data ((user, window) pairs — billions at 100 TB), so the reduction is the
partitioned VECTORIZED groupby (pyarrow hash-agg per partition, see
``shuffle.partitioned_group_agg``), never Ray's per-group aggregate.

Session windows: the one shuffle co-locates users by hash partition; the
per-partition kernel is fully vectorized (lexsort by (user, t), boundary
mask, cumsum session ids, arrow hash-agg) — no per-user Python function.

Aggregates are restricted to order-independent exact values (count / min /
max / integer sums) so results are bit-reproducible and oracle-comparable.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .shuffle import partitioned_group_agg


def _ts_us(col) -> pa.ChunkedArray:
    """Epoch microseconds from a timestamp column of ANY unit (a bare int64
    cast of timestamp[ns] would silently be nanoseconds)."""
    if pa.types.is_timestamp(col.type):
        col = pc.cast(col, pa.timestamp("us"))
    return pc.cast(col, pa.int64())


def add_window(batch: pa.Table, window_us: int) -> pa.Table:
    win = pc.divide(_ts_us(batch.column("ts")),
                    pa.scalar(window_us, pa.int64()))
    return batch.append_column("win", win)


def _partial_agg(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: one row per (user_id, win). Row count uses
    count_all (= SQL count(*)): a null value still counts as an event;
    min/max ignore nulls, matching SQL aggregate semantics."""
    t = batch.group_by(["user_id", "win"]).aggregate([
        ([], "count_all"), ("value", "min"), ("value", "max"),
    ])
    return t.rename_columns(["user_id", "win", "n_events", "min_value",
                             "max_value"])


def tumbling_window(ds, window_s: int = 300):
    """(user_id, win, n_events, min_value, max_value) per tumbling window."""
    window_us = window_s * 1_000_000
    prepared = (ds.map_batches(lambda t: add_window(t, window_us),
                               batch_format="pyarrow")
                .map_batches(_partial_agg, batch_format="pyarrow"))
    return partitioned_group_agg(
        prepared, ["user_id", "win"],
        [("n_events", "sum", "n_events"),
         ("min_value", "min", "min_value"),
         ("max_value", "max", "max_value")])


def hopping_window(ds, window_s: int = 300, hop_s: int = 60):
    """(user_id, win, n_events, min_value, max_value) per HOPPING window:
    window ``win`` covers [win*hop, win*hop + size). Each event explodes
    into its size/hop covering windows (vectorized repeat of int rows —
    values only, never wide columns), then the same combiner +
    hash-partitioned vectorized reduction as tumbling windows."""
    size_us = window_s * 1_000_000
    hop_us = hop_s * 1_000_000

    def explode(batch: pa.Table) -> pa.Table:
        t = _ts_us(batch.column("ts")).to_numpy(zero_copy_only=False)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        val = batch.column("value").to_numpy(zero_copy_only=False)
        # floor division (rounds to -inf) matches SQL floor() for t < size
        first = (t - size_us) // hop_us + 1
        last = t // hop_us
        counts = (last - first + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(t)), counts)
        # win = first[row] + position-within-row
        offs = np.arange(len(idx)) - np.repeat(
            np.cumsum(counts) - counts, counts)
        win = first[idx] + offs
        return pa.table({
            "user_id": pa.array(uid[idx], pa.int64()),
            "win": pa.array(win.astype(np.int64), pa.int64()),
            "value": pa.array(val[idx]),
        })

    prepared = (ds.map_batches(explode, batch_format="pyarrow")
                .map_batches(_partial_agg, batch_format="pyarrow"))
    return partitioned_group_agg(
        prepared, ["user_id", "win"],
        [("n_events", "sum", "n_events"),
         ("min_value", "min", "min_value"),
         ("max_value", "max", "max_value")])


def _session_kernel(gap_us: int):
    """Partition kernel: vectorized sessionization over ALL users in the
    partition. Session assignment is invariant to the order of equal
    timestamps (gap 0 never opens a session), so results are deterministic
    and oracle-comparable."""
    def fn(tbl: pa.Table) -> pa.Table:
        u = tbl.column("user_id").to_numpy(zero_copy_only=False)
        t = tbl.column("t").to_numpy(zero_copy_only=False)
        order = np.lexsort((t, u))
        u = u[order]
        t = t[order]
        n = len(u)
        if n == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "session_id": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "start_us": pa.array([], pa.int64()),
                             "end_us": pa.array([], pa.int64())})
        new_user = np.r_[True, u[1:] != u[:-1]]
        boundary = new_user | np.r_[True, (t[1:] - t[:-1]) > gap_us]
        gsid = np.cumsum(boundary)              # global session index
        # per-user session_id = gsid - gsid at the user's first row + 1
        user_start = np.where(new_user, gsid, 0)
        session_id = gsid - np.maximum.accumulate(user_start) + 1
        g = (pa.table({"user_id": pa.array(u, pa.int64()),
                       "session_id": pa.array(session_id.astype(np.int64),
                                              pa.int64()),
                       "t": pa.array(t, pa.int64())})
             .group_by(["user_id", "session_id"])
             .aggregate([([], "count_all"), ("t", "min"), ("t", "max")]))
        return g.rename_columns(["user_id", "session_id", "n_events",
                                 "start_us", "end_us"])
    return fn


def _session_merge_kernel(gap_us: int):
    """Stage-2 kernel for the pre-split path: merge each user's per-bucket
    session summaries. Two summaries merge iff the gap between them
    (next.start - prev.end) <= gap_us — exactly the event-level rule,
    because a bucket holds ALL its events, so summary boundaries ARE the
    boundary events. Vectorized interval merge over all users at once."""
    def fn(tbl: pa.Table) -> pa.Table:
        u = tbl.column("user_id").to_numpy(zero_copy_only=False)
        s = tbl.column("start_us").to_numpy(zero_copy_only=False)
        e = tbl.column("end_us").to_numpy(zero_copy_only=False)
        n = tbl.column("n_events").to_numpy(zero_copy_only=False)
        if len(u) == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "session_id": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "start_us": pa.array([], pa.int64()),
                             "end_us": pa.array([], pa.int64())})
        order = np.lexsort((s, u))
        u, s, e, n = u[order], s[order], e[order], n[order]
        new_user = np.r_[True, u[1:] != u[:-1]]
        # running max of end within a user: a short interval can sit inside
        # a longer earlier one, so compare against the furthest end seen
        run_end = _segmented_cummax(e, new_user)
        prev_end = np.empty_like(run_end)
        prev_end[0] = 0
        prev_end[1:] = run_end[:-1]
        boundary = new_user | (s - prev_end > gap_us)
        gsid = np.cumsum(boundary)
        g = (pa.table({"user_id": pa.array(u, pa.int64()),
                       "gsid": pa.array(gsid.astype(np.int64), pa.int64()),
                       "n": pa.array(n, pa.int64()),
                       "s": pa.array(s, pa.int64()),
                       "e": pa.array(e, pa.int64())})
             .group_by(["user_id", "gsid"])
             .aggregate([("n", "sum"), ("s", "min"), ("e", "max")]))
        # renumber 1..k per user in start order
        gu = g.column("user_id").to_numpy(zero_copy_only=False)
        gs = g.column("s_min").to_numpy(zero_copy_only=False)
        o2 = np.lexsort((gs, gu))
        gu2 = gu[o2]
        first = np.r_[True, gu2[1:] != gu2[:-1]]
        idx = np.arange(len(gu2))
        sid = idx - np.maximum.accumulate(np.where(first, idx, 0)) + 1
        out = pa.table({
            "user_id": pa.array(gu2, pa.int64()),
            "session_id": pa.array(sid.astype(np.int64), pa.int64()),
            "n_events": g.column("n_sum").take(pa.array(o2, pa.int64())),
            "start_us": pa.array(gs[o2], pa.int64()),
            "end_us": g.column("e_max").take(pa.array(o2, pa.int64())),
        })
        return out
    return fn


def _segmented_cummax(x: np.ndarray, restart: np.ndarray) -> np.ndarray:
    """Cumulative max that restarts wherever ``restart`` is True (pandas
    groupby cummax: C kernel, no int64 offset-overflow risk)."""
    import pandas as pd
    if len(x) == 0:
        return x
    return (pd.Series(x).groupby(np.cumsum(restart)).cummax()
            .to_numpy())


def session_windows(ds, gap_s: int = 1800, split_s: Optional[int] = None):
    """Gap-based session windows per user: (user_id, session_id, n_events,
    start_us, end_us). The ONE shuffle co-locates each user's events (hash
    partition on user_id); the per-partition kernel is a vectorized sorted
    scan over all its users at once. Sessions are numbered 1..n per user in
    time order.

    ``split_s``: hot-user mitigation. The default path assumes one
    partition's events fit a worker heap — false when a single user (a bot)
    is a large share of a CC-scale table, since ALL its events co-locate.
    With ``split_s`` set, events are partitioned by (user_id, ts //
    split_s) so a hot user's history divides into time ranges; each range
    is sessionized locally and a second, summary-sized exchange merges
    sessions across range boundaries with the same gap rule (exact: a
    range holds all its events, so summary boundaries are the true boundary
    events). Choose split_s >> gap_s (e.g. a day for a 30-min gap) so the
    merge stage sees few summaries per user per range."""
    from .shuffle import add_hash_partition, default_num_parts

    gap_us = gap_s * 1_000_000

    def to_us(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch.column("user_id"),
            "t": _ts_us(batch.column("ts")),
        })
    prepared = ds.map_batches(to_us, batch_format="pyarrow")
    P = default_num_parts()
    if split_s is None:
        parted = add_hash_partition(prepared, ["user_id"], P)
        return (parted.groupby("part")
                .map_groups(_session_kernel(gap_us),
                            batch_format="pyarrow"))

    span_us = split_s * 1_000_000

    def keys(batch: pa.Table) -> list:
        return [batch.column("user_id").to_numpy(zero_copy_only=False),
                batch.column("t").to_numpy(zero_copy_only=False) // span_us]

    stage1 = (add_hash_partition(prepared, ["user_id", "t"], P,
                                 key_arrays_fn=keys)
              .groupby("part")
              .map_groups(_session_kernel(gap_us), batch_format="pyarrow")
              .map_batches(lambda t: t.drop_columns(["session_id"]),
                           batch_format="pyarrow"))
    parted2 = add_hash_partition(stage1, ["user_id"], P)
    return (parted2.groupby("part")
            .map_groups(_session_merge_kernel(gap_us),
                        batch_format="pyarrow"))


def funnel_counts(ds, steps, user_col: str = "user_id",
                  type_col: str = "event_type", ts_col: str = "ts",
                  num_parts: Optional[int] = None):
    """Ordered funnel analysis: for each prefix of ``steps`` (event-type
    names), the number of users who performed the steps IN ORDER — step
    i+1 strictly after the user's earliest valid completion of step i
    (the standard min-chaining funnel semantics, so the result is
    reproducible and SQL-mirrorable with chained ``min(ts)`` CTEs).

    Scale shape: map-side filter to the funnel's event types (the
    corpus's other events never move), projection to (user, step, ts)
    ints, ONE user-keyed exchange; each partition chains per-user min
    timestamps with vectorized pandas joins (k small); per-partition
    (step, n_users) partials — k rows each — fold through a tiny final
    exchange. Driver holds nothing. Skewed users are naturally bounded:
    a user's rows co-locate once and the per-step reduction is min().

    Returns (step 1-based, event_type, n_users)."""
    import pyarrow.compute as pc

    from .shuffle import (add_hash_partition, default_num_parts,
                          partitioned_group_agg)

    steps = list(steps)
    if not steps:
        raise ValueError("funnel_counts needs at least one step")
    P = num_parts or default_num_parts()

    def pre(t: pa.Table) -> pa.Table:
        et = t.column(type_col)
        keep = pc.is_in(et, value_set=pa.array(steps))
        t = t.filter(keep)
        et = t.column(type_col)
        step_idx = np.full(t.num_rows, -1, dtype=np.int8)
        for i, s in enumerate(steps):
            step_idx[pc.equal(et, s).to_numpy(zero_copy_only=False)] = i
        return pa.table({
            "u": t.column(user_col),
            "step": pa.array(step_idx, pa.int8()),
            "t": pc.cast(t.column(ts_col), pa.int64())})

    rows = ds.map_batches(pre, batch_format="pyarrow")
    parted = add_hash_partition(rows, ["u"], P)

    def kernel(tbl: pa.Table) -> pa.Table:
        # numpy sequential-match kernel (replaces a pandas map/groupby per
        # step): carry (sorted users, completion ts) across steps; each
        # step keeps its events strictly after the user's previous-step
        # completion and takes the per-user min via lexsort + first-mark
        u_all = tbl.column("u").to_numpy(zero_copy_only=False)
        s_all = tbl.column("step").to_numpy(zero_copy_only=False)
        t_all = tbl.column("t").to_numpy(zero_copy_only=False)
        counts = []
        users = None                   # sorted user ids completing so far
        tdone = None                   # parallel completion timestamps
        for i in range(len(steps)):
            mask = s_all == i
            u, t = u_all[mask], t_all[mask]
            if users is not None:
                if len(users) == 0:   # nobody completed the prior step
                    counts.append(0)
                    continue
                idx = np.searchsorted(users, u)
                idx_c = np.minimum(idx, len(users) - 1)
                hit = (idx < len(users)) & (users[idx_c] == u)
                keep = hit & (t > np.where(hit, tdone[idx_c], 0))
                u, t = u[keep], t[keep]
            if len(u) == 0:
                users, tdone = u, t
                counts.append(0)
                continue
            order = np.lexsort((t, u))
            u, t = u[order], t[order]
            first = np.ones(len(u), dtype=bool)
            first[1:] = u[1:] != u[:-1]
            users, tdone = u[first], t[first]
            counts.append(len(users))
        return pa.table({
            "step": pa.array(np.arange(1, len(steps) + 1), pa.int64()),
            "event_type": pa.array(steps, pa.string()),
            "n_users": pa.array(np.asarray(counts, np.int64), pa.int64())})

    partials = parted.groupby("part").map_groups(kernel,
                                                 batch_format="pyarrow")

    def step_keys(batch: pa.Table):
        return [batch.column("step").to_numpy(zero_copy_only=False)]

    return partitioned_group_agg(partials, ["step", "event_type"],
                                 [("n_users", "sum", "n_users")],
                                 num_parts=min(P, len(steps)),
                                 key_arrays_fn=step_keys)


def retention_cohorts(ds, user_col: str = "user_id", ts_col: str = "ts",
                      week_us: int = 7 * 86400 * 1_000_000,
                      num_parts: Optional[int] = None):
    """Retention cohort matrix: users grouped by first-seen week
    (epoch-aligned integer weeks), counted per (cohort_week,
    active_week) — the standard engagement-retention triangle.

    Scale shape: map-side projection to per-batch DISTINCT (user, week)
    int rows (the exchange moves at most one row per user-week per
    batch, never per event); ONE user-keyed exchange; the partition
    kernel derives each co-located user's cohort (min week) and its
    distinct active weeks vectorized, pre-aggregating to (cohort, week,
    n) partials; a tiny second exchange folds partials (output is
    weeks^2-bounded, independent of corpus size). Zero driver state."""
    import pyarrow.compute as pc

    from .shuffle import add_hash_partition, default_num_parts

    P = num_parts or default_num_parts()

    def pre(t: pa.Table) -> pa.Table:
        us = _ts_us(t.column(ts_col))
        wk = pc.divide(us, pa.scalar(week_us, pa.int64()))
        g = (pa.table({"u": t.column(user_col), "wk": wk})
             .group_by(["u", "wk"]).aggregate([([], "count_all")])
             .drop_columns("count_all"))
        return g

    rows = ds.map_batches(pre, batch_format="pyarrow")
    parted = add_hash_partition(rows, ["u"], P)

    def kernel(tbl: pa.Table) -> pa.Table:
        # pure numpy segment kernel (no pandas copy): lexsort by (u, wk),
        # drop duplicate (u, wk) rows, broadcast each user's first (= min)
        # week as its cohort, then count (cohort, wk) pairs
        if tbl.num_rows == 0:
            return pa.table({"cohort_w": pa.array([], pa.int64()),
                             "active_w": pa.array([], pa.int64()),
                             "n_users": pa.array([], pa.int64())})
        u = tbl.column("u").to_numpy(zero_copy_only=False)
        wk = tbl.column("wk").to_numpy(zero_copy_only=False)
        order = np.lexsort((wk, u))
        u, wk = u[order], wk[order]
        keep = np.ones(len(u), dtype=bool)
        keep[1:] = (u[1:] != u[:-1]) | (wk[1:] != wk[:-1])
        u, wk = u[keep], wk[keep]
        first = np.ones(len(u), dtype=bool)
        first[1:] = u[1:] != u[:-1]
        seg = np.cumsum(first) - 1
        cohort = wk[first][seg]  # user's min week (rows are wk-sorted)
        pairs = np.stack([cohort, wk], axis=1)
        uniq, n = np.unique(pairs, axis=0, return_counts=True)
        return pa.table({
            "cohort_w": pa.array(uniq[:, 0], pa.int64()),
            "active_w": pa.array(uniq[:, 1], pa.int64()),
            "n_users": pa.array(n.astype(np.int64), pa.int64())})

    partials = parted.groupby("part").map_groups(kernel,
                                                 batch_format="pyarrow")
    return partitioned_group_agg(partials, ["cohort_w", "active_w"],
                                 [("n_users", "sum", "n_users")],
                                 num_parts=min(P, 8))


def gap_fill(ds, window_s: int = 300, user_col: str = "user_id",
             ts_col: str = "ts", value_col: str = "value",
             num_parts: Optional[int] = None):
    """Regularized per-user time series: one row per (user, window) for
    EVERY window between the user's first and last event — empty windows
    emitted with n_events = 0 (the gap-fill / resample step before
    time-series feature extraction; SQL's generate_series LEFT JOIN).

    Scale shape: the tumbling-window combiner first (per-batch (user,
    win, n, min, max) partials — the exchange never moves raw events),
    ONE user-keyed exchange; the partition kernel derives each
    co-located user's [min_win, max_win] span and emits the missing
    windows vectorized (output is span-bounded: a user's row count is
    its active duration / window, which the downstream consumer asked
    for by definition). Zero driver state."""
    import pyarrow.compute as pc

    from .shuffle import add_hash_partition, default_num_parts

    window_us = window_s * 1_000_000
    P = num_parts or default_num_parts()

    def pre(t: pa.Table) -> pa.Table:
        win = pc.divide(_ts_us(t.column(ts_col)),
                        pa.scalar(window_us, pa.int64()))
        g = (pa.table({"user_id": t.column(user_col), "win": win,
                       "value": t.column(value_col)})
             .group_by(["user_id", "win"])
             .aggregate([([], "count_all"), ("value", "min"),
                         ("value", "max")]))
        return g.rename_columns(["user_id", "win", "n_events",
                                 "min_value", "max_value"])

    rows = ds.map_batches(pre, batch_format="pyarrow")
    parted = add_hash_partition(rows, ["user_id"], P)

    def kernel(tbl: pa.Table) -> pa.Table:
        # Arrow group-agg for the partial combine, numpy for the grid
        # expansion, searchsorted for the grid<-partial alignment (the
        # pandas merge this replaces) — no DataFrame copy per partition
        if tbl.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "win": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "min_value": pa.array([], pa.float64()),
                             "max_value": pa.array([], pa.float64())})
        # combine per-batch partials for the same (user, win)
        comb = (tbl.drop_columns("part")
                .group_by(["user_id", "win"], use_threads=False)
                .aggregate([("n_events", "sum"), ("min_value", "min"),
                            ("max_value", "max")]))
        uidc = comb.column("user_id").to_numpy(zero_copy_only=False)
        winc = comb.column("win").to_numpy(zero_copy_only=False)
        order = np.lexsort((winc, uidc))
        uidc, winc = uidc[order], winc[order]
        nev = comb.column("n_events_sum").to_numpy(
            zero_copy_only=False)[order]
        vmin = comb.column("min_value_min").to_numpy(
            zero_copy_only=False)[order]
        vmax = comb.column("max_value_max").to_numpy(
            zero_copy_only=False)[order]
        first = np.ones(len(uidc), dtype=bool)
        first[1:] = uidc[1:] != uidc[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(uidc))
        lo = winc[starts]                     # per-user min win (sorted)
        hi = winc[ends - 1]                   # per-user max win
        counts = (hi - lo + 1).astype(np.int64)
        uid = np.repeat(uidc[starts], counts)
        offs = np.arange(counts.sum()) - np.repeat(
            np.cumsum(counts) - counts, counts)
        win = np.repeat(lo, counts) + offs
        # align grid rows to combined partials: both are (user, win)-sorted
        # and every partial key exists in the grid, so one searchsorted on
        # a composite rank suffices
        grid_seg = np.repeat(np.arange(len(starts)), counts)
        part_seg = np.cumsum(first) - 1
        WIDE = np.int64(1) << 40              # wins are window indexes << 2^40
        gkey = grid_seg * WIDE + (win - np.repeat(lo, counts))
        pkey = part_seg * WIDE + (winc - lo[part_seg])
        pos = np.searchsorted(gkey, pkey)
        n = np.zeros(len(gkey), np.int64)
        n[pos] = nev
        mn = np.full(len(gkey), np.nan)
        mn[pos] = vmin
        mx = np.full(len(gkey), np.nan)
        mx[pos] = vmax
        return pa.table({
            "user_id": pa.array(uid, pa.int64()),
            "win": pa.array(win, pa.int64()),
            "n_events": pa.array(n, pa.int64()),
            # gap rows' NaN must become SQL NULL
            "min_value": pa.array(mn, pa.float64(), from_pandas=True),
            "max_value": pa.array(mx, pa.float64(), from_pandas=True)})

    return parted.groupby("part").map_groups(kernel,
                                             batch_format="pyarrow")


def ohlc_window(ds, window_s: int = 300,
                num_parts: Optional[int] = None):
    """OHLC (open/high/low/close) per (user_id, tumbling window) — the
    time-series resample bar: open = value of the FIRST event in the
    window, close = value of the LAST, ordered by (ts, event_id) so
    ties are deterministic; low/high/n_events as in tumbling_window.

    Scale shape: per-batch combiner first — each batch lexsorts by
    (user, win, ts, event_id) once and emits ONE partial row per
    (user, win) carrying (open, its order key, close, its order key,
    low, high, n) — then one (user, win)-hash exchange merges partials
    with the same boundary trick (argmin/argmax are associative over
    the carried order keys). Values are picked, never summed, so
    doubles stay exact and the result is partition-invariant and
    oracle-comparable against first_value/last_value window SQL."""
    from .shuffle import add_hash_partition, default_num_parts

    window_us = window_s * 1_000_000

    def _fold(tbl: pa.Table, o_ts, o_eid, c_ts, c_eid, val_open,
              val_close, low, high, n) -> pa.Table:
        """lexsort + segment boundaries: one output row per (user, win)."""
        uid = tbl.column("user_id").to_numpy(zero_copy_only=False)
        win = tbl.column("win").to_numpy(zero_copy_only=False)
        order = np.lexsort((o_eid, o_ts, win, uid))
        uid_s, win_s = uid[order], win[order]
        new = np.ones(len(uid_s), dtype=bool)
        if len(uid_s) > 1:
            new[1:] = (uid_s[1:] != uid_s[:-1]) | (win_s[1:] != win_s[:-1])
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], len(uid_s))
        first_idx = order[starts]
        # close: independent sort by the close key, take segment LAST
        order_c = np.lexsort((c_eid, c_ts, win, uid))
        last_idx = order_c[ends - 1]
        seg = np.repeat(np.arange(len(starts)), ends - starts)
        inv = np.empty_like(seg)
        inv[order] = seg  # original row index -> segment id
        lo = np.full(len(starts), np.inf)
        hi = np.full(len(starts), -np.inf)
        np.minimum.at(lo, inv, low)
        np.maximum.at(hi, inv, high)
        cnt = np.zeros(len(starts), np.int64)
        np.add.at(cnt, inv, n)
        return pa.table({
            "user_id": pa.array(uid[first_idx], pa.int64()),
            "win": pa.array(win[first_idx], pa.int64()),
            "o_ts": pa.array(o_ts[first_idx], pa.int64()),
            "o_eid": pa.array(o_eid[first_idx], pa.int64()),
            "open": pa.array(val_open[first_idx], pa.float64()),
            "c_ts": pa.array(c_ts[last_idx], pa.int64()),
            "c_eid": pa.array(c_eid[last_idx], pa.int64()),
            "close": pa.array(val_close[last_idx], pa.float64()),
            "low": pa.array(lo, pa.float64()),
            "high": pa.array(hi, pa.float64()),
            "n_events": pa.array(cnt, pa.int64()),
        })

    def partial(batch: pa.Table) -> pa.Table:
        t = add_window(batch, window_us)
        tus = _ts_us(t.column("ts")).to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        val = t.column("value").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return _fold(t, tus, eid, tus, eid, val, val, val, val,
                     np.ones(len(tus), np.int64))

    def kernel(tbl: pa.Table) -> pa.Table:
        tbl = tbl.drop_columns("part")
        g = lambda c: tbl.column(c).to_numpy(zero_copy_only=False)
        return _fold(tbl, g("o_ts"), g("o_eid"), g("c_ts"), g("c_eid"),
                     g("open"), g("close"), g("low"), g("high"),
                     g("n_events"))

    P = num_parts or default_num_parts()
    parted = add_hash_partition(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["user_id", "win"], P)
    merged = parted.groupby("part").map_groups(kernel,
                                               batch_format="pyarrow")
    return merged.map_batches(
        lambda t: t.drop_columns(["o_ts", "o_eid", "c_ts", "c_eid"]),
        batch_format="pyarrow")


def build_window_store(events_ds, out_dir: str, window_s: int = 300,
                       num_buckets: int = 32) -> dict:
    """Materialize tumbling-window PARTIAL aggregates as a user-bucketed
    store — the window state a streaming job keeps, maintained here
    exactly-once on disk. Together with ``append_window_delta`` /
    ``read_window_agg`` this is incremental window-aggregate maintenance:

    * build: per-batch combiner rows (user_id, win, n_events, min/max)
      pay ONE user-hash exchange into hash(user)%B manifest-committed
      buckets (``write_bucketed`` — resumable, byte-deterministic).
    * ingest: new events land O(delta) via the LSM delta path
      (``append_bucketed(mode="delta")``) — existing state is never
      rewritten, replays are manifest no-ops (exactly-once).
    * read: count/min/max are ASSOCIATIVE, so folding the accumulated
      partials per bucket (exchange-free — a user's rows all live in one
      bucket) equals a full recompute over every event ever ingested,
      exactly. ``compact_bucketed`` folds delta files back at leisure
      without changing answers.
    """
    from ..sources.bucketed import write_bucketed

    window_us = window_s * 1_000_000
    partials = (events_ds.map_batches(
        lambda t: add_window(t, window_us), batch_format="pyarrow")
        .map_batches(_partial_agg, batch_format="pyarrow"))
    return write_bucketed(partials, out_dir, key="user_id",
                          buckets=num_buckets)


def append_window_delta(delta_events, out_dir: str, ingest_id: str,
                        window_s: int = 300) -> dict:
    """O(delta) exactly-once ingest of new events into a window store
    (see build_window_store): delta partials ride the store's bucket
    routing as per-ingest files; a replay of the same ``ingest_id`` is a
    manifest no-op."""
    from ..sources.bucketed import append_bucketed

    window_us = window_s * 1_000_000
    partials = (delta_events.map_batches(
        lambda t: add_window(t, window_us), batch_format="pyarrow")
        .map_batches(_partial_agg, batch_format="pyarrow"))
    return append_bucketed(partials, out_dir, key="user_id",
                           ingest_id=ingest_id, mode="delta")


def read_window_agg(out_dir: str):
    """Fold a window store's accumulated partials into the final
    (user_id, win, n_events, min_value, max_value) — one Arrow
    hash-aggregate per bucket, ZERO shuffle (bucket routing already
    co-located each user's rows)."""
    from ..sources.bucketed import agg_bucketed

    out = agg_bucketed(out_dir, "user_id",
                       [("n_events", "sum"), ("min_value", "min"),
                        ("max_value", "max")], extra_keys=["win"])
    return out.map_batches(
        lambda t: t.rename_columns(["user_id", "win", "n_events",
                                    "min_value", "max_value"]),
        batch_format="pyarrow")
