"""Hash-partitioned vectorized group-by — the high-cardinality shuffle
primitive.

Ray Data's built-in ``groupby().aggregate()`` performs a global sort and
then reduces with ~0.2 ms of per-group Python overhead (measured on this
host: 1.1M groups -> 230 s). That is fine for bounded-cardinality keys
(nation, segment, returnflag) and catastrophic when group count scales with
the data (content digests, candidate pairs, per-user windows — billions of
groups at 100 TB).

``partitioned_group_agg`` keeps the exchange but replaces the per-group
Python reduction with ONE vectorized ``pyarrow.Table.group_by`` (C++ hash
aggregation, tens of millions of groups/s) per hash partition:

    part = mix64(key_cols) % num_parts     (map-side, vectorized)
    groupby("part").map_groups(arrow group_by kernel)

All rows of a key land in one partition, so the per-partition aggregate is
exact. Results are invariant to ``num_parts``; choose it so a partition
(rows/num_parts) fits a worker's heap — default 2x cluster cores.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa

# (source_col | None for count_all, pyarrow agg fn, output name)
AggSpec = Tuple[Optional[str], str, str]


def _cluster_cpus() -> int:
    import ray
    try:
        return int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        return 8


def default_num_parts() -> int:
    return max(16, 2 * _cluster_cpus())


def auto_pool(concurrency):
    """Actor-pool sizing for compute-heavy explode stages: an explicit int
    is honored; None becomes an autoscaling (2, cpus-2) pool so the stage
    can use the whole node while leaving exchange/read tasks schedulable."""
    if concurrency is not None:
        return concurrency
    return (2, max(2, _cluster_cpus() - 2))


def mix64(cols: Sequence[np.ndarray]) -> np.ndarray:
    """Pack multi-column int keys into one int64 with a shift-xor mix.
    Collisions only co-locate two key groups in one partition — the kernel
    re-groups by the TRUE key columns, so results stay exact."""
    key = np.asarray(cols[0], dtype=np.int64)
    for i, c in enumerate(cols[1:], start=1):
        nxt = np.asarray(c, dtype=np.int64)
        key = np.bitwise_xor(np.left_shift(key, np.int64(57 - 7 * i)), nxt)
    return key


def add_hash_partition(ds, key_cols: List[str], num_parts: int,
                       key_arrays_fn: Optional[Callable] = None):
    """Append ``part = mix64(keys) % num_parts``. ``key_arrays_fn(batch)``
    may supply int64 key arrays for non-integer key columns (e.g. a digest
    string hashed to int)."""
    def add_part(batch: pa.Table) -> pa.Table:
        if key_arrays_fn is not None:
            arrs = key_arrays_fn(batch)
        else:
            arrs = [batch.column(c).to_numpy(zero_copy_only=False)
                    for c in key_cols]
        part = mix64(arrs) % np.int64(num_parts)
        return batch.append_column(
            "part", pa.array(part.astype(np.int64), pa.int64()))
    return ds.map_batches(add_part, batch_format="pyarrow")


def partitioned_group_agg(ds, key_cols: List[str], aggs: List[AggSpec],
                          num_parts: Optional[int] = None,
                          key_arrays_fn: Optional[Callable] = None):
    """Exact distributed group-by for high-cardinality keys.

    ``aggs``: [(col, fn, out_name)] with pyarrow group_by fns ("sum",
    "min", "max", "count"); col=None means count_all (row count).
    Returns a Dataset with columns ``key_cols + out_names``.
    """
    P = num_parts or default_num_parts()
    arrow_aggs = [(([], "count_all") if c is None else (c, f))
                  for c, f, _ in aggs]
    out_names = [name for *_, name in aggs]

    keep = list(dict.fromkeys(
        key_cols + [c for c, _, _ in aggs if c is not None]))

    def kernel(tbl: pa.Table) -> pa.Table:
        g = tbl.select(keep).group_by(key_cols).aggregate(arrow_aggs)
        return g.rename_columns([*key_cols, *out_names])

    parted = add_hash_partition(ds, key_cols, P, key_arrays_fn)
    return parted.groupby("part").map_groups(kernel, batch_format="pyarrow")
