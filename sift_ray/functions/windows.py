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
