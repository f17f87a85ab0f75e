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


def session_windows(ds, gap_s: int = 1800):
    """Gap-based session windows per user: (user_id, session_id, n_events,
    start_us, end_us). The ONE shuffle co-locates each user's events (hash
    partition on user_id); the per-partition kernel is a vectorized sorted
    scan over all its users at once. Sessions are numbered 1..n per user in
    time order.

    Partitioning assumption at scale: a single partition's events fit in a
    worker heap (users are hash-spread across partitions; a pathological
    hot user would need time-range pre-splitting)."""
    from .shuffle import add_hash_partition, default_num_parts

    def to_us(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch.column("user_id"),
            "t": _ts_us(batch.column("ts")),
        })
    prepared = ds.map_batches(to_us, batch_format="pyarrow")
    parted = add_hash_partition(prepared, ["user_id"], default_num_parts())
    return (parted.groupby("part")
            .map_groups(_session_kernel(gap_s * 1_000_000),
                        batch_format="pyarrow"))
