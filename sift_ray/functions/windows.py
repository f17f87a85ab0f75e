"""Windowed aggregation over the events table (engine extension; the
reference has no streaming/window operators — SURVEY.md §2.8).

Tumbling windows: window id = epoch_us(ts) // window_us, computed with a
vectorized Arrow kernel, then pre-aggregated per batch (combiner) before the
one hash-partitioned groupby — the partial-aggregate pattern that keeps the
shuffle small at scale. Aggregates are restricted to order-independent exact
values (count / min / max / integer sums) so results are bit-reproducible
and oracle-comparable.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def add_window(batch: pa.Table, window_us: int) -> pa.Table:
    ts_us = pc.cast(batch.column("ts"), pa.int64())
    win = pc.divide(ts_us, pa.scalar(window_us, pa.int64()))
    return batch.append_column("win", win)


def _partial_agg(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: one row per (user_id, win)."""
    t = batch.group_by(["user_id", "win"]).aggregate([
        ("value", "count"), ("value", "min"), ("value", "max"),
    ])
    return t.rename_columns(["user_id", "win", "n_events", "min_value",
                             "max_value"])


def tumbling_window(ds, window_s: int = 300):
    """(user_id, win, n_events, min_value, max_value) per tumbling window."""
    from ray.data.aggregate import Max, Min, Sum

    window_us = window_s * 1_000_000
    prepared = (ds.map_batches(lambda t: add_window(t, window_us),
                               batch_format="pyarrow")
                .map_batches(_partial_agg, batch_format="pyarrow"))
    out = (prepared.groupby(["user_id", "win"])
           .aggregate(Sum("n_events", alias_name="n_events"),
                      Min("min_value", alias_name="min_value"),
                      Max("max_value", alias_name="max_value")))
    return out


def _sessionize(gap_us: int):
    """Per-user sessionization callback: events sorted by time; a gap
    > gap_us opens a new session. Session assignment is invariant to the
    order of equal timestamps (gap 0 never opens a session), so results are
    deterministic and oracle-comparable."""
    import numpy as np
    import pandas as pd

    def fn(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("t", kind="mergesort")
        t = g["t"].to_numpy()
        boundary = np.r_[True, (t[1:] - t[:-1]) > gap_us]
        session_id = np.cumsum(boundary)
        g = g.assign(session_id=session_id)
        out = (g.groupby("session_id")
               .agg(n_events=("t", "size"), start_us=("t", "min"),
                    end_us=("t", "max")).reset_index())
        out.insert(0, "user_id", g["user_id"].iloc[0])
        return out.astype({"user_id": "int64", "session_id": "int64",
                           "n_events": "int64", "start_us": "int64",
                           "end_us": "int64"})
    return fn


def session_windows(ds, gap_s: int = 1800):
    """Gap-based session windows per user: (user_id, session_id, n_events,
    start_us, end_us). The ONE shuffle co-locates each user's events
    (groupby user_id); per-user work is a sorted linear scan. Sessions are
    numbered 1..n per user in time order.

    Partitioning assumption at scale: a single user's events fit in one
    group (true for user-keyed web/event data; a pathological hot user would
    need time-range pre-splitting)."""
    def to_us(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch.column("user_id"),
            "t": pc.cast(batch.column("ts"), pa.int64()),
        })
    prepared = ds.map_batches(to_us, batch_format="pyarrow")
    return (prepared.groupby("user_id")
            .map_groups(_sessionize(gap_s * 1_000_000),
                        batch_format="pandas"))
