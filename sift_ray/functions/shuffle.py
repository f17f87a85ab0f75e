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

import functools
from typing import Callable, List, Optional, Sequence, Tuple, Union

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


@functools.lru_cache(maxsize=32)
def _cached_stage(cls, kw_items):
    return cls(**dict(kw_items))


class TaskStage:
    """Run a callable-class stage as plain TASKS with per-worker-process
    state caching, instead of an actor pool.

    For stages whose ``__init__`` costs microseconds (a seeded RNG, a few
    compiled params — MinHash/SimHash/Ngram/LshBucket), an actor pool buys
    nothing: the pool spawn ramp (~cpus actors) dominates short stages and
    drags wall-clock scaling efficiency, while tasks schedule elastically
    on already-warm workers. The instance is built once per worker process
    via an lru-cache keyed on (cls, kwargs); kwargs must be hashable.

    Reserve real actor pools (``concurrency=N``) for stages with genuinely
    expensive setup: model weights, large vocabularies, index builds."""

    def __init__(self, cls, **kwargs):
        self.cls = cls
        self.kw = tuple(sorted(kwargs.items()))

    def __call__(self, batch):
        return _cached_stage(self.cls, self.kw)(batch)


def mix64(cols: Sequence[np.ndarray]) -> np.ndarray:
    """Pack multi-column int keys into one int64 with a shift-xor mix.
    Collisions only co-locate two key groups in one partition — the kernel
    re-groups by the TRUE key columns, so results stay exact."""
    key = np.asarray(cols[0], dtype=np.int64)
    for i, c in enumerate(cols[1:], start=1):
        nxt = np.asarray(c, dtype=np.int64)
        # cycle the shift through {50, 43, ..., 1} so any key-column count
        # stays a valid (positive, < 64) shift
        shift = np.int64(57 - 7 * (((i - 1) % 8) + 1))
        key = np.bitwise_xor(np.left_shift(key, shift), nxt)
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
        # drop schema-level metadata (pandas-written parquet carries a
        # b"pandas" entry that makes pa.Schema unhashable — Ray's sort
        # reduce then logs "Failed to hash the schemas" per task); zero-copy
        return batch.replace_schema_metadata(None).append_column(
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


def _as_pa_type(t):
    """Dataset.schema() yields numpy dtypes for pandas-born blocks."""
    if isinstance(t, pa.DataType):
        return t
    try:
        return pa.from_numpy_dtype(np.dtype(t))
    except (TypeError, pa.ArrowNotImplementedError):
        return pa.string()  # object dtype: strings in practice


def _bloom_probes2(h: np.ndarray, mbits: int):
    """Two derived probe positions per uint64 hash (same double-probe
    scheme as corpus._bloom_probes; mbits must be a power of two)."""
    m = np.uint64(mbits - 1)
    yield h & m
    yield ((h >> np.uint64(32)) ^ (h * np.uint64(0xFF51AFD7ED558CCD))) & m


def build_key_bloom(ds, col: str, mbits: int = 1 << 23):
    """Broadcastable bloom bitmap of a key column — the runtime filter
    for join pushdown. Per-batch fold sets bits locally; per-block OR
    combine; the driver merges n_blocks bitmaps (mbits/8 bytes each) and
    ``ray.put``s the result ONCE. No false negatives ever: a key failing
    the bloom definitely does not occur in ``col``. Executes ``ds`` —
    use on the smaller / cheap-to-recompute side."""
    import ray

    from .sketch import _hash64_route

    nbytes = mbits >> 3

    def fold(t: pa.Table) -> pa.Table:
        bits = np.zeros(nbytes, np.uint8)
        if t.num_rows > 0 and col in t.column_names:
            h = _hash64_route(t.column(col))
            for idx in _bloom_probes2(h, mbits):
                np.bitwise_or.at(
                    bits, (idx >> np.uint64(3)).astype(np.int64),
                    np.left_shift(np.uint8(1),
                                  (idx & np.uint64(7)).astype(np.uint8)))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    def combine(t: pa.Table) -> pa.Table:
        acc = np.zeros(nbytes, np.uint8)
        for b in t.column("bits").to_pylist():
            np.bitwise_or(acc, np.frombuffer(b, np.uint8), out=acc)
        return pa.table({"bits": pa.array([acc.tobytes()], pa.binary())})

    rows = (ds.map_batches(fold, batch_format="pyarrow")
            .map_batches(combine, batch_format="pyarrow"))
    acc = np.zeros(nbytes, np.uint8)
    pdf = rows.to_pandas()
    # a fully-EMPTY ds yields zero blocks (Ray skips map UDFs on empty
    # blocks, so fold never runs and the frame has no columns); the bloom
    # of the empty key set is the all-zero bitmap — nothing passes, which
    # is exactly right for an empty join side
    if "bits" in pdf.columns:
        for b in pdf["bits"]:
            np.bitwise_or(acc, np.frombuffer(b, np.uint8), out=acc)
    return ray.put({"bits": acc, "mbits": mbits})


class BloomFilterStage:
    """Map-side key-membership filter against a broadcast bloom (fetched
    once per worker process via TaskStage's instance cache).
    mode="pass" keeps rows whose key MIGHT match (bloom hit);
    mode="fail" keeps rows whose key DEFINITELY has no match."""

    def __init__(self, state_ref, col: str, mode: str = "pass"):
        import ray
        st = ray.get(state_ref)
        self.bits, self.mbits = st["bits"], st["mbits"]
        self.col, self.mode = col, mode

    def __call__(self, t: pa.Table) -> pa.Table:
        from .sketch import _hash64_route
        if t.num_rows == 0:
            return t
        h = _hash64_route(t.column(self.col))
        ok = np.ones(len(h), dtype=bool)
        for idx in _bloom_probes2(h, self.mbits):
            ok &= ((self.bits[(idx >> np.uint64(3)).astype(np.int64)]
                    >> (idx & np.uint64(7)).astype(np.uint8)) & 1) > 0
        keep = ok if self.mode == "pass" else ~ok
        return t.filter(pa.array(keep))


def detect_salt(ds, key_cols: List[str], num_parts: int,
                sample_rows: int = 200_000,
                max_salt: int = 16) -> Optional[int]:
    """Sampled hot-key detection for ``hash_join(salt="auto")``: read a
    bounded prefix of the LEFT side's key columns (column-pruned; at most
    ``sample_rows`` rows leave the workers as hashes), estimate the
    heaviest key's frequency f, and pick a salt that spreads its rows back
    to ~2x the uniform per-partition share: salt ≈ f * P / 2, capped at
    ``max_salt`` (each salt step replicates the RIGHT side once more).
    Returns None when no key exceeds 4x the uniform share — the common
    case, costing one cheap prefix pass. Salting is value-preserving
    either way; detection only tunes the constant, so sampling error can
    never change results."""
    from collections import Counter

    counts: Counter = Counter()
    seen = 0

    def key_hashes(t: pa.Table) -> pa.Table:
        from .sketch import _hash64_route
        arrs = []
        for c in key_cols:
            col = t.column(c)
            if pa.types.is_integer(col.type) and col.null_count == 0:
                arrs.append(col.to_numpy(zero_copy_only=False)
                            .astype(np.int64))
            else:
                arrs.append(_hash64_route(col).astype(np.int64))
        return pa.table({"__k": pa.array(mix64(arrs), pa.int64())})

    proj = ds.map_batches(key_hashes, batch_format="pyarrow")
    for batch in proj.iter_batches(batch_size=65536,
                                   batch_format="pyarrow"):
        ks = batch.column("__k").to_numpy(zero_copy_only=False)
        vals, cs = np.unique(ks, return_counts=True)
        for v, c in zip(vals.tolist(), cs.tolist()):
            counts[v] += c
        seen += len(ks)
        if seen >= sample_rows:
            break
    if seen == 0 or not counts:
        return None
    f = max(counts.values()) / seen
    if f <= 4.0 / num_parts:
        return None
    return max(2, min(max_salt, int(np.ceil(f * num_parts / 2.0))))


def hash_join(left, right, on, how: str = "inner",
              num_parts: Optional[int] = None,
              left_cols: Optional[List[str]] = None,
              right_cols: Optional[List[str]] = None,
              salt: Optional[Union[int, str]] = None,
              left_types: Optional[dict] = None,
              right_types: Optional[dict] = None,
              post: Optional[Callable] = None,
              bloom_prefilter: Optional[int] = None):
    """Distributed hash join on any hashable key type (ints partition on
    value; strings — urls, digests — hash to int64 map-side) — the
    general two-big-sides join Ray Data does not provide (its idiom, and this repo's
    ``relational.BroadcastLookupStage``, covers only small-side broadcast).

    Shape: both sides are tagged, schema-aligned (missing columns padded
    with nulls), unioned, hash-partitioned by the key — ONE exchange moving
    each row once — and each partition performs a local pandas merge of its
    two sides. Equal keys land in the same partition, so the join is exact;
    results are partition-count invariant.

    ``salt``: hot-key mitigation. Without it a skewed key's rows all land in
    ONE partition (a bot user_id with 50% of a CC-scale table blows that
    worker's heap). ``salt=s`` spreads each LEFT row across s sub-partitions
    (partition key = (key, row_salt)) and replicates each RIGHT row into all
    s of them, so every left row still meets every right row with its key —
    results are exactly the salt-less ones, while the hot key's left rows
    divide over s partitions. Cost: right side moves s times — use when the
    skewed side is the big left table and the right side is the smaller one
    (the common enrichment shape). Left/anti joins are supported (right
    replication preserves their semantics); the left row spread uses a
    round-robin within each batch, which is deterministic in the ROW->salt
    mapping only per block layout — the JOIN RESULT is layout-invariant
    because every salt sees the full right side. ``salt="auto"`` runs
    ``detect_salt`` first (one bounded column-pruned prefix pass over the
    left keys) and salts only when a sampled key exceeds 4x the uniform
    per-partition share — the hands-off default for unknown skew.

    ``how``: "inner", "left", "full" (unmatched rows of EITHER side kept,
    the other side's columns null — integer columns stay exact int64 via
    nullable dtypes on both sides), "anti" (left rows whose key has NO
    right match — the distributed anti-join; right non-key columns are
    ignored), or "semi" (left rows whose key HAS a right match, each
    left row at most once — SQL EXISTS; right non-key columns ignored).
    A right join is "left" with the arguments swapped.
    Non-key column names must be disjoint (restrict with
    left_cols/right_cols).

    ``bloom_prefilter``: runtime-filter pushdown (the Spark/Presto
    bloom-join optimization) — pass a power-of-two bit count (e.g.
    ``1 << 23``) to build a bloom of the RIGHT keys first and filter the
    LEFT side map-side BEFORE the exchange. Blooms have no false
    negatives, so results are EXACTLY the unfiltered join's: for
    "inner", left rows failing the bloom cannot match and are dropped
    (exchange volume shrinks by the non-matching fraction — the big win
    when a huge fact table joins a selective dimension); for "anti",
    rows failing the bloom are definite results and BYPASS the exchange
    entirely, only possible-matches pay for it. Ignored for
    "left"/"full" (every left row must reach the output anyway). Builds
    the bloom eagerly (one extra pass over ``right``) — use when right
    is the smaller or cheap-to-recompute side.
    """
    import pandas as pd

    P = num_parts or default_num_parts()
    ons: List[str] = list(on) if isinstance(on, (list, tuple)) else [on]
    multi = len(ons) > 1
    if multi and bloom_prefilter:
        raise ValueError("bloom_prefilter supports single-key joins only")
    on = ons[0]  # the single-key fast paths below use `on`
    if salt == "auto":
        salt = detect_salt(left, ons, P)
    if salt is not None and salt < 2:
        salt = None
    def _names(ds_, given, types):
        if given is not None:
            return given
        if types is not None:
            return list(types)
        s = ds_.schema()
        return list(ons) if s is None else s.names  # empty side: keys only

    lc = [c for c in _names(left, left_cols, left_types) if c not in ons]
    rc = [c for c in _names(right, right_cols, right_types) if c not in ons]
    if how in ("anti", "semi"):
        rc = []  # only the right KEYS matter for an anti/semi-join
    overlap = set(lc) & set(rc)
    if overlap:
        raise ValueError(f"non-key columns must be disjoint: {overlap}")
    if how not in ("inner", "left", "anti", "semi", "full"):
        raise ValueError(f"unsupported how: {how}")  # right = full w/ swap
                                                     # or left w/ swapped args

    # left_types/right_types ({name: pa type}) skip the Dataset.schema()
    # probe entirely — ESSENTIAL when a side is itself a join/groupby
    # output, where schema() executes the whole upstream pipeline once for
    # the probe and again for the real run
    def _side_types(ds_, hinted, cols):
        if hinted is not None:
            return {n: _as_pa_type(t) for n, t in hinted.items()}
        s = ds_.schema()
        if s is None:
            # a fully EMPTY side reports schema() = None; the join result
            # is then empty too — string-type its columns so the pipeline
            # still produces a well-formed (0-row) table
            return {n: pa.string() for n in ons + cols}
        return {n: _as_pa_type(t) for n, t in zip(s.names, s.types)}

    l_types = _side_types(left, left_types, lc)
    r_types = _side_types(right, right_types, rc)
    l_empty = left_types is None and left.schema() is None
    if l_empty:
        for o in ons:  # key types come from the non-empty side
            if o in r_types:
                l_types[o] = r_types[o]
    bypass = None
    if bloom_prefilter and how in ("inner", "anti", "semi"):
        if how == "anti" and post is not None:
            raise ValueError("bloom_prefilter with how='anti' cannot "
                             "honor post (bypass rows skip the kernel)")
        bref = build_key_bloom(right, on, mbits=bloom_prefilter)
        if how == "anti":
            left_schema = pa.schema(
                [(on, l_types[on])] + [(c, l_types[c]) for c in lc])
            fail = left.map_batches(
                TaskStage(BloomFilterStage, state_ref=bref, col=on,
                          mode="fail"), batch_format="pyarrow")
            bypass = fail.map_batches(
                lambda t: (left_schema.empty_table() if t.num_rows == 0
                           and on not in t.column_names
                           else t.select([on] + lc)),
                batch_format="pyarrow")
        left = left.map_batches(
            TaskStage(BloomFilterStage, state_ref=bref, col=on,
                      mode="pass"), batch_format="pyarrow")

    order = ons + lc + rc + ["_side"]
    tagged_schema = pa.schema(
        [(o, l_types[o]) for o in ons] + [(c, l_types[c]) for c in lc]
        + [(c, r_types[c]) for c in rc] + [("_side", pa.int8())])

    def prep_side(own_cols, pad_cols, pad_types, side_val):
        def fn(t: pa.Table) -> pa.Table:
            # an upstream map_groups emits 0-COLUMN blocks for empty sort
            # ranges (Ray internal); normalize to a typed empty so chained
            # joins never see a missing field
            if t.num_rows == 0:
                return tagged_schema.empty_table()
            t = t.select(ons + own_cols).append_column(
                "_side", pa.array(np.full(t.num_rows, side_val, np.int8)))
            for name, typ in zip(pad_cols, pad_types):
                t = t.append_column(name, pa.nulls(t.num_rows, typ))
            return t.select(order)
        return fn

    left_t = left.map_batches(
        prep_side(lc, rc, [r_types[c] for c in rc], 0),
        batch_format="pyarrow")
    right_t = right.map_batches(
        prep_side(rc, lc, [l_types[c] for c in lc], 1),
        batch_format="pyarrow")

    if salt is not None:
        s = int(salt)

        def salt_left(t: pa.Table) -> pa.Table:
            ids = np.arange(t.num_rows, dtype=np.int64) % s
            return t.append_column("_salt", pa.array(ids, pa.int64()))

        def salt_right(t: pa.Table) -> pa.Table:
            # replicate each right row into every salt sub-partition
            copies = [t.append_column(
                "_salt", pa.array(np.full(t.num_rows, i, np.int64),
                                  pa.int64())) for i in range(s)]
            return pa.concat_tables(copies)

        left_t = left_t.map_batches(salt_left, batch_format="pyarrow")
        right_t = right_t.map_batches(salt_right, batch_format="pyarrow")
        part_keys = ons + ["_salt"]
    else:
        part_keys = list(ons)

    both = left_t.union(right_t)

    def join_key_arrays(batch: pa.Table):
        # int keys partition on their value; other key types (url/digest
        # strings) hash to int64 — collisions only co-locate two key
        # groups, the kernel's merge re-groups by the true key
        arrs = []
        for o in ons:
            col = batch.column(o)
            if pa.types.is_integer(col.type):
                arrs.append(col.to_numpy(zero_copy_only=False))
            else:
                from .sketch import _hash64_route
                arrs.append(_hash64_route(col).astype(np.int64))
        if salt is not None:
            arrs.append(batch.column("_salt")
                        .to_numpy(zero_copy_only=False))
        return arrs

    parted = add_hash_partition(both, part_keys, P,
                                key_arrays_fn=join_key_arrays)

    out_fields = [(o, l_types[o]) for o in ons] \
        + [(c, l_types[c]) for c in lc] + [(c, r_types[c]) for c in rc]
    out_schema = pa.schema(out_fields)

    def kernel(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        side = tbl.column("_side")
        if how in ("anti", "semi"):
            # pure-Arrow anti/semi: keep left rows whose key is absent
            # from / present in this partition's right keys (equal keys
            # co-locate, so the partition-local check is exact). Multi-key
            # goes through Acero's hash join (binary-safe, typed); single
            # key keeps the cheaper is_in kernel.
            lt = tbl.filter(pc.equal(side, 0)).select(ons + lc)
            rt = tbl.filter(pc.equal(side, 1)).select(ons)
            if multi:
                jt = "left semi" if how == "semi" else "left anti"
                res = lt.join(rt, keys=ons, join_type=jt)
            else:
                rkeys = rt.column(on).combine_chunks()
                if len(rkeys) == 0:
                    res = lt if how == "anti" else lt.schema.empty_table()
                else:
                    hit = pc.is_in(lt.column(on), value_set=rkeys)
                    res = lt.filter(hit if how == "semi"
                                    else pc.invert(hit))
            # ``post`` applies to anti/semi too (same exchange-folding
            # contract as the inner/left path below)
            return post(res) if post is not None else res
        # split sides in Arrow BEFORE pandas: the padded null columns are
        # dropped here, so dtypes survive (a combined to_pandas would turn
        # every padded int column into float64)
        ldf = tbl.filter(pc.equal(side, 0)).select(ons + lc).to_pandas()
        rdf = tbl.filter(pc.equal(side, 1)).select(ons + rc).to_pandas()
        if how in ("left", "full"):
            # unmatched left rows null the right columns; pandas would
            # coerce int64 -> float64 (lossy past 2^53). Nullable Int64
            # keeps exact integers through the merge.
            for c in rc:
                if pa.types.is_integer(r_types[c]):
                    rdf[c] = rdf[c].astype("Int64")
        if how == "full":
            # a full join also nulls LEFT columns on right-only keys
            for c in lc:
                if pa.types.is_integer(l_types[c]):
                    ldf[c] = ldf[c].astype("Int64")
        out = ldf.merge(rdf, on=ons,
                        how=("outer" if how == "full" else how))
        # rebuild against the declared schema: blocks keep identical dtypes
        # regardless of match pattern / emptiness (from_pandas maps NaN/NA
        # to null)
        arrays = [pa.Array.from_pandas(out[name], type=typ)
                  for name, typ in out_fields]
        joined = pa.Table.from_arrays(arrays, schema=out_schema)
        # ``post`` runs INSIDE the partition on the joined rows — the hook
        # that lets a same-key aggregation/top-k fold into the join's
        # exchange instead of paying a second one (all rows of a key are
        # in this partition, so key-grouped post-processing stays exact)
        return post(joined) if post is not None else joined

    out = parted.groupby("part").map_groups(kernel, batch_format="pyarrow")
    if bypass is not None:
        # anti-join bloom path: definite non-matches skipped the exchange
        out = out.union(bypass)
    return out


def asof_join(left, right, key: str, ts: str, value_col: str,
              direction: str = "backward",
              tolerance: Optional[int] = None,
              num_parts: Optional[int] = None):
    """Distributed AS-OF join: for each left row, the ``value_col`` of
    the LATEST right row of the same ``key`` with right.ts <= left.ts
    (``direction="backward"``, the default) or the EARLIEST right row
    with right.ts >= left.ts (``direction="forward"`` — the
    next-scheduled-event enrichment); ties match in both directions;
    null if none — the time-series enrichment join Ray Data lacks.
    Forward reuses the backward kernel on negated timestamps (latest in
    -t == earliest in t; equality, and hence tie behavior, is preserved).

    ``tolerance`` (same int unit as ``ts``): a match farther than this
    from the left timestamp becomes null — pandas ``merge_asof``'s
    tolerance semantics (a stale quote stops enriching trades after N
    seconds). Applied per row after the forward-fill, so it costs one
    vectorized subtract.

    Shape: tag + union + ONE key-hash exchange (each row moves once); the
    per-partition kernel lexsorts by (key, ts, side) with right rows
    ordered before left rows at equal timestamps (ties match, per ASOF
    semantics) and resolves every left row with one vectorized
    forward-fill (maximum.accumulate) — no per-key Python loop.
    Output: all left columns + ``value_col``. Both ts columns must be
    int-comparable (cast timestamps to epoch int64 upstream)."""
    import pandas as pd

    P = num_parts or default_num_parts()
    lcols = [c for c in left.schema().names]
    if value_col in lcols:
        raise ValueError(f"value_col {value_col!r} collides with a left "
                         f"column")

    left_t = left.map_batches(
        lambda t: t.append_column(
            "_side", pa.array(np.ones(t.num_rows, dtype=np.int8))),
        batch_format="pyarrow")
    right_t = right.map_batches(
        lambda t: t.select([key, ts, value_col]).append_column(
            "_side", pa.array(np.zeros(t.num_rows, dtype=np.int8))),
        batch_format="pyarrow")

    # schema-align: left gains a null value_col; right gains left's extras
    r_schema = right.schema()
    vtype = _as_pa_type(dict(zip(r_schema.names, r_schema.types))[value_col])
    l_schema = left.schema()
    extra = [c for c in lcols if c not in (key, ts)]
    l_types = {n: t for n, t in zip(l_schema.names, l_schema.types)}
    order_cols = [key, ts, *extra, value_col, "_side"]
    left_t = left_t.map_batches(
        lambda t: t.append_column(value_col, pa.nulls(t.num_rows, vtype))
                   .select(order_cols), batch_format="pyarrow")

    def pad_right(t: pa.Table) -> pa.Table:
        for c in extra:
            t = t.append_column(c, pa.nulls(t.num_rows, _as_pa_type(l_types[c])))
        return t.select(order_cols)
    right_t = right_t.map_batches(pad_right, batch_format="pyarrow")

    parted = add_hash_partition(left_t.union(right_t), [key], P)

    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction}")

    def kernel(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key).to_numpy(zero_copy_only=False)
        t = tbl.column(ts).to_numpy(zero_copy_only=False)
        if direction == "forward":
            t = -t          # sort only; output rows keep original values
        side = tbl.column("_side").to_numpy(zero_copy_only=False)
        n = len(k)
        order = np.lexsort((side, t, k))  # right (0) before left at tie
        ks = k[order]
        sides = side[order]
        # forward-fill index of the last right row within each key run
        new_key = np.ones(n, dtype=bool)
        if n > 1:
            new_key[1:] = ks[1:] != ks[:-1]
        ridx = np.where(sides == 0, np.arange(n), -1)
        last_r = np.maximum.accumulate(ridx)
        # last_r may point into a previous key: invalidate those
        seg_start = np.maximum.accumulate(np.where(new_key, np.arange(n),
                                                   -1))
        valid = last_r >= seg_start
        lmask = sides == 1
        lrows = order[lmask]
        match = np.where(valid[lmask], last_r[lmask], -1)
        if tolerance is not None:
            # distance in the (possibly negated) sort domain is
            # left.ts - right.ts (backward) / right.ts - left.ts
            # (forward) — >= 0 by construction for real matches
            m_orig = order[np.maximum(match, 0)]
            dist = t[lrows] - t[m_orig]
            match = np.where((match >= 0) & (dist <= tolerance),
                             match, -1)
        vals = tbl.column(value_col).take(
            pa.array(np.where(match >= 0, order[np.maximum(match, 0)], 0),
                     pa.int64()))
        keep_null = pa.array(match < 0)
        import pyarrow.compute as pc
        vals = pc.if_else(keep_null, pa.nulls(len(lrows), vtype), vals)
        out = tbl.take(pa.array(lrows, pa.int64()))
        out = out.drop_columns([value_col, "_side", "part"])
        return out.append_column(value_col, vals)

    return parted.groupby("part").map_groups(kernel, batch_format="pyarrow")


def interval_join(events, intervals, ts_col: str, start_col: str,
                  end_col: str, event_cols: List[str],
                  ival_cols: List[str], granularity_s: int = 3600,
                  num_parts: Optional[int] = None,
                  salt: Optional[int] = None,
                  event_types: Optional[dict] = None,
                  ival_types: Optional[dict] = None):
    """Distributed RANGE (interval) join with no equi-key: every
    (event, interval) pair with ``start <= ts < end`` (half-open, SQL
    ``e.ts >= i.start AND e.ts < i.end``) — sessionized-log enrichment,
    incident-window attribution, ad-slot matching.

    Shape: time is binned at ``granularity_s``; each interval row is
    REPLICATED to every bucket it overlaps (vectorized explode — choose
    the granularity near the median interval length so the replication
    factor stays ~2), each event maps to exactly ONE bucket, and the
    pairing is ``hash_join`` on the bucket with a partition-local range
    post-filter. An (event, interval) candidate meets in exactly one
    bucket — the event's — so the output needs no dedup pass, and both
    sides cross the wire once (intervals x replication). Hot buckets
    (flash-crowd seconds) can be spread with ``salt`` exactly like a hot
    join key. Both time columns must share a unit (timestamp[us] or any
    int64-castable epoch).

    Output columns: ``event_cols + ival_cols`` (names must be disjoint).
    """
    import pyarrow.compute as pc

    G = np.int64(int(granularity_s) * 1_000_000)

    def prep_events(t: pa.Table) -> pa.Table:
        ts = pc.cast(t.column(ts_col), pa.int64()).to_numpy(
            zero_copy_only=False)
        out = t.select(event_cols)
        out = out.append_column("_ts_us", pa.array(ts, pa.int64()))
        return out.append_column("_bucket",
                                 pa.array(ts // G, pa.int64()))

    def prep_ivals(t: pa.Table) -> pa.Table:
        ws = pc.cast(t.column(start_col), pa.int64()).to_numpy(
            zero_copy_only=False)
        we = pc.cast(t.column(end_col), pa.int64()).to_numpy(
            zero_copy_only=False)
        keep = we > ws  # empty intervals match nothing under [ws, we)
        ws, we = ws[keep], we[keep]
        t = t.filter(pa.array(keep))
        b0 = ws // G
        counts = (we - 1) // G - b0 + 1
        idx = np.repeat(np.arange(len(b0), dtype=np.int64), counts)
        offs = (np.arange(counts.sum(), dtype=np.int64)
                - np.repeat(np.cumsum(counts) - counts, counts))
        out = t.select(ival_cols).take(pa.array(idx))
        out = out.append_column("_ws_us", pa.array(ws[idx], pa.int64()))
        out = out.append_column("_we_us", pa.array(we[idx], pa.int64()))
        return out.append_column("_bucket",
                                 pa.array(b0[idx] + offs, pa.int64()))

    ev = events.map_batches(prep_events, batch_format="pyarrow")
    iv = intervals.map_batches(prep_ivals, batch_format="pyarrow")

    def post(joined: pa.Table) -> pa.Table:
        ts = joined.column("_ts_us")
        m = pc.and_(pc.greater_equal(ts, joined.column("_ws_us")),
                    pc.less(ts, joined.column("_we_us")))
        return joined.filter(m).select(event_cols + ival_cols)

    # type hints skip hash_join's Dataset.schema() probe (which would
    # execute each prep pipeline once for the probe and again for real)
    lt = ({"_bucket": pa.int64(), "_ts_us": pa.int64(),
           **{c: _as_pa_type(t) for c, t in event_types.items()}}
          if event_types is not None else None)
    rt = ({"_bucket": pa.int64(), "_ws_us": pa.int64(),
           "_we_us": pa.int64(),
           **{c: _as_pa_type(t) for c, t in ival_types.items()}}
          if ival_types is not None else None)
    return hash_join(ev, iv, on="_bucket",
                     left_cols=event_cols + ["_ts_us"],
                     right_cols=ival_cols + ["_ws_us", "_we_us"],
                     num_parts=num_parts, salt=salt, post=post,
                     left_types=lt, right_types=rt)
