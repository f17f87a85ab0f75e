"""Size-bucketed skew handling for heavy-tail HTML.

Web pages have log-normal-ish size distributions with multi-MB tails; a
fixed row-count ``batch_size`` makes batch BYTE sizes wildly uneven (one
batch of 256 x 4 KB pages vs one of 256 x 2 MB pages). The pipeline:

1. computes ``size_bucket`` from ``len(html)`` with a vectorized Arrow
   kernel (no Python loop);
2. splits the dataset into per-bucket streams (predicate pushdown inside
   map_batches — cheap, no shuffle);
3. runs the extract actor pool on each bucket with a bucket-appropriate
   ``batch_size`` so every batch carries a bounded byte budget;
4. unions the outputs (order is irrelevant; rows are keyed by url).

At 100 TB this is the difference between even pipeline flow and stragglers:
a worker never holds more than ~batch_bytes of HTML at once.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import pyarrow as pa
import pyarrow.compute as pc

# bucket upper bounds (bytes) and the row batch_size used for that bucket
DEFAULT_BUCKETS: Tuple[Tuple[int, int], ...] = (
    (64 * 1024, 256),        # small pages: big batches
    (1024 * 1024, 32),       # mid pages
    (1 << 62, 4),            # huge tail: tiny batches
)


def add_size_bucket(batch: pa.Table,
                    buckets: Tuple[Tuple[int, int], ...] = DEFAULT_BUCKETS
                    ) -> pa.Table:
    """Vectorized: append int32 ``size_bucket`` from len(html)."""
    sizes = pc.binary_length(batch.column("html"))
    bucket = pa.nulls(len(batch), pa.int32())
    bucket = pc.fill_null(bucket, len(buckets) - 1)
    # assign smallest matching bucket via successive if_else (few buckets)
    out = pa.array([len(buckets) - 1] * len(batch), pa.int32())
    for i in range(len(buckets) - 2, -1, -1):
        bound = buckets[i][0]
        out = pc.if_else(pc.less_equal(sizes, bound),
                         pa.scalar(i, pa.int32()), out)
    return batch.append_column("size_bucket", out)


def split_by_bucket(ds, buckets: Tuple[Tuple[int, int], ...] = DEFAULT_BUCKETS
                    ) -> List[Tuple[int, int, "object"]]:
    """Split a pages Dataset into [(bucket_id, batch_size, sub_ds), ...].

    Implemented as vectorized filters inside map_batches (each sub-stream
    re-reads only its rows; no shuffle, no materialization)."""
    ds = ds.map_batches(lambda t: add_size_bucket(t, buckets),
                        batch_format="pyarrow")
    out = []
    for i, (_, batch_size) in enumerate(buckets):
        sub = ds.map_batches(
            lambda t, _i=i: t.filter(pc.equal(t.column("size_bucket"), _i)),
            batch_format="pyarrow")
        out.append((i, batch_size, sub))
    return out
