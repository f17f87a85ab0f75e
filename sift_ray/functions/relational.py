"""Relational patterns the 100 TB pipeline needs around the extraction core:
pre-aggregated wide groupbys (combiner pattern) and broadcast small-side
joins. The reference has neither (SURVEY.md §2.8) — these are engine
extensions, oracle-checked exactly.

Determinism discipline: distributed float sums are order-dependent, so the
exact-checked aggregates stick to count / min / max / integer sums — the
same rule the windows module follows.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _pricing_partial(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: one row per (l_returnflag, l_linestatus)."""
    qty_int = pc.cast(batch.column("l_quantity"), pa.int64())
    t = pa.table({
        "l_returnflag": batch.column("l_returnflag"),
        "l_linestatus": batch.column("l_linestatus"),
        "qty": qty_int,
        "price": batch.column("l_extendedprice"),
    })
    g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate([
        ("qty", "sum"), ("price", "min"), ("price", "max"), ("qty", "count"),
    ])
    return g.rename_columns(["l_returnflag", "l_linestatus", "sum_qty",
                             "min_price", "max_price", "n_rows"])


def pricing_summary(ds):
    """TPC-H-Q1-shaped exact aggregate over lineitem: per-batch pyarrow
    combiner first, then ONE tiny global groupby over ~6 partial rows per
    batch — the shuffle moves kilobytes regardless of input size."""
    from ray.data.aggregate import Max, Min, Sum

    partial = ds.map_batches(_pricing_partial, batch_format="pyarrow")
    return (partial.groupby(["l_returnflag", "l_linestatus"])
            .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                       Min("min_price", alias_name="min_price"),
                       Max("max_price", alias_name="max_price"),
                       Sum("n_rows", alias_name="n_rows")))


class BroadcastLookupStage:
    """Map-side join against a broadcast small table (ray.put once, fetched
    once per actor) — the shuffle-free alternative to a distributed join for
    dimension tables."""

    def __init__(self, lookup_ref, key_col: str, value_name: str):
        import ray
        self.lookup: Dict = ray.get(lookup_ref)
        self.key_col = key_col
        self.value_name = value_name

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key_col).to_pylist()
        vals = [self.lookup.get(k) for k in keys]
        return batch.append_column(self.value_name,
                                   pa.array(vals, pa.string()))


def topk_per_group(ds, group_col: str, order_col: str, tiebreak_col: str,
                   k: int = 3, ascending: bool = False):
    """Distributed top-k per group: every batch emits only its local top-k
    per group (combiner), the driver merges the tiny candidate set. Order:
    order_col DESC (or ASC with ``ascending=True`` — the per-domain
    keep-earliest cap), tiebreak_col ASC — fully deterministic.

    At 10^12 rows the candidate set is n_batches x groups x k smalls rows;
    the final merge stays driver-sized as long as group cardinality is
    bounded (true for segment/category keys). Returns a Dataset so the
    relational surface composes."""
    import pandas as pd
    import ray.data as rd

    order = [True, ascending, True]

    def local_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf.sort_values([group_col, order_col, tiebreak_col],
                            ascending=order)
        return s.groupby(group_col, sort=False).head(k)

    cands = (ds.map_batches(local_topk, batch_format="pandas")
             .to_pandas())
    s = cands.sort_values([group_col, order_col, tiebreak_col],
                          ascending=order)
    top = s.groupby(group_col, sort=False).head(k).copy()
    top["rank"] = top.groupby(group_col, sort=False).cumcount() + 1
    return rd.from_pandas(top.reset_index(drop=True))


def customers_per_nation(customer_ds, nation_path: str):
    """(n_name, n_customers, min_acctbal, max_acctbal) via broadcast join:
    nation (25 rows) is read once on the driver, shipped via ray.put, and
    looked up map-side; the only shuffle is the final tiny groupby."""
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Count, Max, Min

    nation = pq.read_table(nation_path, columns=["n_nationkey", "n_name"])
    lookup = dict(zip(nation.column("n_nationkey").to_pylist(),
                      nation.column("n_name").to_pylist()))
    ref = ray.put(lookup)

    # cached-state tasks (not a pool): ray.get of the broadcast dict runs
    # once per worker process, and tasks use every free slot
    from .shuffle import TaskStage
    joined = customer_ds.map_batches(
        TaskStage(BroadcastLookupStage, lookup_ref=ref,
                  key_col="c_nationkey", value_name="n_name"),
        batch_format="pyarrow")
    return (joined.groupby("n_name")
            .aggregate(Count(alias_name="n_customers"),
                       Min("c_acctbal", alias_name="min_acctbal"),
                       Max("c_acctbal", alias_name="max_acctbal")))


def shipping_priority(lineitem, orders, customer, segment: str = "BUILDING",
                      cutoff_us: int = 795225600000000, k: int = 10,
                      num_parts: Optional[int] = None,
                      broadcast_keys: int = 2_000_000,
                      broadcast_orders: int = 2_000_000):
    """TPC-H-Q3-shaped composition: top-k unshipped orders by revenue for a
    market segment. Revenue is summed as integer cents (floor(x*100 + 0.5),
    IEEE-identical in both engines) because distributed float sums are
    order-dependent. ``cutoff_us`` is epoch microseconds (default
    1995-03-15, the TPC-H validation date).

    Strategy is size-gated per join side, the same pattern as the dedup
    family's broadcast gates — filters here are selective, so the build
    sides are usually far smaller than their tables:

    * customer semi-join: if the filtered segment has <= ``broadcast_keys``
      keys, broadcast them (ray.put once, map-side ``is_in`` — ZERO
      exchange); else a distributed keys-only ``hash_join``.
    * orders->lineitem: the filtered order side is materialized (the
      exchange would materialize it anyway); if <= ``broadcast_orders``
      rows, lineitem is reduced map-side to per-batch (orderkey, partial
      revenue) rows against the broadcast key set and ONE tiny exchange of
      partials finishes the sum — order metadata is re-attached on the
      driver from the already-collected order table. Else: full
      ``hash_join`` whose partition kernel folds the same-key group-agg and
      local top-k (``post``), so only num_parts * k candidate rows reach
      the driver. Worst case (both sides big) is exactly two exchanges.
    """
    import numpy as np
    import ray
    import ray.data as rd

    from .shuffle import hash_join, partitioned_group_agg

    cust = customer.map_batches(
        lambda t: t.filter(pc.equal(t.column("c_mktsegment"), segment))
                   .select(["c_custkey"]).rename_columns(["o_custkey"]),
        batch_format="pyarrow")

    def orders_pre(t: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(t.column("o_orderdate"),
                     pa.timestamp("us")), pa.int64())
        keep = pc.less(ts, cutoff_us)
        return pa.table({
            "o_custkey": t.column("o_custkey"),
            "o_orderkey": t.column("o_orderkey"),
            "o_orderdate_us": ts,
            "o_orderpriority": t.column("o_orderpriority"),
        }).filter(keep)

    ord_f = orders.map_batches(orders_pre, batch_format="pyarrow")
    # type hints everywhere: a schema() probe on a join output EXECUTES the
    # upstream pipeline once for the probe and again for the real run
    ord_types = {"o_custkey": pa.int64(), "o_orderkey": pa.int64(),
                 "o_orderdate_us": pa.int64(), "o_orderpriority": pa.string()}

    empty_keys = pa.schema([("o_custkey", pa.int64())]).empty_table()
    ckeys = cust.materialize()
    if ckeys.count() <= broadcast_keys:
        key_tbl = pa.concat_tables(
            [empty_keys] + list(ckeys.iter_batches(batch_size=1 << 18,
                                                   batch_format="pyarrow")))
        key_set = key_tbl.column("o_custkey").combine_chunks()

        def seg_filter(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t.column("o_custkey"),
                                     value_set=key_set))
        ord_seg = ord_f.map_batches(seg_filter, batch_format="pyarrow")
    else:
        # semi-join on custkey: right side is keys-only, so the inner
        # merge emits each order at most once (c_custkey is unique)
        ord_seg = hash_join(ord_f, cust, on="o_custkey", how="inner",
                            num_parts=num_parts, left_types=ord_types,
                            right_types={"o_custkey": pa.int64()})

    def line_pre(t: pa.Table) -> pa.Table:
        ship = pc.cast(pc.cast(t.column("l_shipdate"),
                       pa.timestamp("us")), pa.int64())
        rev = pc.floor(pc.add(pc.multiply(pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount"))),
            pa.scalar(100.0)), pa.scalar(0.5)))
        return pa.table({
            "o_orderkey": t.column("l_orderkey"),
            "rev_cents": pc.cast(rev, pa.int64()),
        }).filter(pc.greater(ship, cutoff_us))

    line_f = lineitem.map_batches(line_pre, batch_format="pyarrow")
    out_schema = pa.schema([("o_orderkey", pa.int64()),
                            ("o_orderdate_us", pa.int64()),
                            ("o_orderpriority", pa.string()),
                            ("revenue_cents", pa.int64())])

    ord_m = ord_seg.materialize()  # the exchange would materialize it too
    if ord_m.count() <= broadcast_orders:
        # broadcast path: reduce lineitem map-side to per-batch partial
        # revenue per orderkey against the broadcast key set; ONE exchange
        # of tiny partials finishes the sum; per-partition top-k keeps all
        # revenue TIES (date tiebreak is resolved on the driver, which
        # already holds the order metadata)
        empty_ord = pa.schema([(n, t) for n, t in ord_types.items()
                               if n != "o_custkey"]).empty_table()
        ord_tbl = pa.concat_tables(
            [empty_ord]
            + [b.select(list(empty_ord.schema.names)) for b in
               ord_m.iter_batches(batch_size=1 << 18,
                                  batch_format="pyarrow")
               if b.num_rows])  # skip Ray's 0-column empty blocks
        okeys = ord_tbl.column("o_orderkey").combine_chunks()

        def partial_rev(t: pa.Table) -> pa.Table:
            sub = t.filter(pc.is_in(t.column("o_orderkey"),
                                    value_set=okeys))
            g = (sub.group_by(["o_orderkey"])
                 .aggregate([("rev_cents", "sum")]))
            return g.rename_columns(["o_orderkey", "rev_cents"])

        partials = line_f.map_batches(partial_rev, batch_format="pyarrow")
        sums = partitioned_group_agg(
            partials, ["o_orderkey"],
            [("rev_cents", "sum", "revenue_cents")], num_parts=num_parts)

        def topk_with_ties(tbl: pa.Table) -> pa.Table:
            pdf = tbl.select(["o_orderkey", "revenue_cents"]).to_pandas()
            if len(pdf) > k:
                kth = pdf["revenue_cents"].nlargest(k).iloc[-1]
                pdf = pdf[pdf["revenue_cents"] >= kth]
            return pa.Table.from_pandas(pdf, preserve_index=False)

        cands = (sums.map_batches(topk_with_ties, batch_format="pyarrow")
                 .to_pandas())
        if cands.empty:
            return rd.from_arrow(out_schema.empty_table())
        meta = ord_tbl.to_pandas().drop(columns=[], errors="ignore")
        cands = cands.merge(meta[["o_orderkey", "o_orderdate_us",
                                  "o_orderpriority"]], on="o_orderkey")
    else:
        # the group-agg key (l_orderkey) IS the join key, so the revenue
        # sum and the local top-k fold into the join's partition kernel
        # (``post``): two exchanges total, and only num_parts * k
        # candidate rows ever leave a partition
        def agg_topk(joined: pa.Table) -> pa.Table:
            g = (joined.group_by(["o_orderkey", "o_orderdate_us",
                                  "o_orderpriority"])
                 .aggregate([("rev_cents", "sum")])
                 .rename_columns(["o_orderkey", "o_orderdate_us",
                                  "o_orderpriority", "revenue_cents"]))
            pdf = g.to_pandas().sort_values(
                ["revenue_cents", "o_orderdate_us", "o_orderkey"],
                ascending=[False, True, True]).head(k)
            return pa.Table.from_pandas(pdf, preserve_index=False,
                                        schema=out_schema)

        cands = hash_join(
            line_f, ord_m, on="o_orderkey", how="inner",
            num_parts=num_parts,
            right_cols=["o_orderdate_us", "o_orderpriority"],
            left_types={"o_orderkey": pa.int64(),
                        "rev_cents": pa.int64()},
            right_types=ord_types, post=agg_topk).to_pandas()
        if cands.empty:
            return rd.from_arrow(out_schema.empty_table())

    top = (cands.sort_values(
        ["revenue_cents", "o_orderdate_us", "o_orderkey"],
        ascending=[False, True, True]).head(k)
        .reset_index(drop=True)[out_schema.names])
    return rd.from_arrow(pa.Table.from_pandas(top, preserve_index=False,
                                              schema=out_schema))


def grouped_topk(ds, group_col: str, order_col: str, tiebreak_col: str,
                 k: int = 3, ascending: bool = False,
                 num_parts: Optional[int] = None):
    """Distributed top-k per group for UNBOUNDED group cardinality (per-URL
    anchor texts, per-order lineitems — billions of groups at corpus
    scale, where ``topk_per_group``'s driver merge would be corpus-sized).

    Shape: per-batch local top-k combiner (each batch contributes at most
    k rows per group it contains), ONE group-key exchange, partition-local
    sort + head — all rows of a group co-locate, so the result is exact
    and equals SQL ``row_number() OVER (PARTITION BY g ORDER BY ...) <= k``.
    Driver holds nothing. Returns the input columns plus ``rank`` (1-based
    within the group)."""
    import pandas as pd

    from .shuffle import add_hash_partition, default_num_parts

    P = num_parts or default_num_parts()
    order = [True, ascending, True]

    def local_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf.sort_values([group_col, order_col, tiebreak_col],
                            ascending=order, kind="stable")
        return s.groupby(group_col, sort=False).head(k)

    def key_fn(batch: pa.Table):
        import numpy as np
        col = batch.column(group_col)
        if pa.types.is_integer(col.type):
            return [col.to_numpy(zero_copy_only=False)]
        from .sketch import _hash64_route
        return [_hash64_route(col).astype(np.int64)]

    cands = ds.map_batches(local_topk, batch_format="pandas")
    parted = add_hash_partition(cands, [group_col], P, key_arrays_fn=key_fn)

    def kernel(tbl: pa.Table) -> pa.Table:
        pdf = tbl.drop_columns("part").to_pandas()
        s = pdf.sort_values([group_col, order_col, tiebreak_col],
                            ascending=order, kind="stable")
        top = s.groupby(group_col, sort=False).head(k).copy()
        top["rank"] = (top.groupby(group_col, sort=False).cumcount() + 1) \
            .astype("int64")
        return pa.Table.from_pandas(top.reset_index(drop=True),
                                    preserve_index=False)

    return parted.groupby("part").map_groups(kernel, batch_format="pyarrow")


def set_op(left, right, cols: List[str], op: str,
           all_rows: bool = False, num_parts: Optional[int] = None):
    """Distributed SQL set operations: ``op`` in {"except", "intersect",
    "union"} equals ``left EXCEPT / INTERSECT / UNION right`` over the
    projected ``cols`` tuple. ``all_rows=True`` switches EXCEPT and
    INTERSECT to BAG (ALL) semantics — each output tuple is replicated
    max(cl - cr, 0) resp. min(cl, cr) times, matching SQL ``EXCEPT ALL``
    / ``INTERSECT ALL`` (``UNION ALL`` needs no operator: it is plain
    ``left.union(right)``, zero shuffle). NULL keys compare equal (SQL
    set-op semantics — Arrow group_by groups nulls together, matching).

    Scale shape: per-batch count combiner first (the exchange moves one
    row per distinct tuple per batch with two per-side counts, never
    per input row), then ONE tuple-hash exchange; the kernel re-groups
    by the TRUE columns, sums counts, and filters (DISTINCT) or
    replicates (ALL). Any-type keys (strings hash map-side via blake2b;
    hash collisions only co-locate, the kernel's true-key group-by
    keeps results exact). No driver state; no reference analog (sift
    has no relational ops, SURVEY.md §2.8)."""
    from .shuffle import add_hash_partition, default_num_parts
    if op not in ("except", "intersect", "union"):
        raise ValueError(f"unknown set op {op!r}")
    if all_rows and op == "union":
        raise ValueError("UNION ALL is plain Dataset.union — no exchange")
    P = num_parts or default_num_parts()
    cols = list(cols)

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            g = (t.select(cols).group_by(cols)
                 .aggregate([([], "count_all")]))
            n = pc.cast(g.column("count_all"), pa.int64())
            g = g.drop_columns("count_all")
            zeros = pa.array(np.zeros(g.num_rows, dtype=np.int64))
            return (g.append_column("cl", zeros if side else n)
                     .append_column("cr", n if side else zeros))
        return fn

    tagged = (left.map_batches(tag(0), batch_format="pyarrow")
              .union(right.map_batches(tag(1), batch_format="pyarrow")))

    def key_fn(batch: pa.Table):
        from .sketch import _hash64_route
        arrs = []
        for c in cols:
            col = batch.column(c)
            if pa.types.is_integer(col.type) and col.null_count == 0:
                arrs.append(col.to_numpy(zero_copy_only=False))
            else:
                arrs.append(_hash64_route(col).astype(np.int64))
        return arrs

    parted = add_hash_partition(tagged, cols, P, key_arrays_fn=key_fn)

    def kernel(tbl: pa.Table) -> pa.Table:
        g = (tbl.drop_columns("part").group_by(cols)
             .aggregate([("cl", "sum"), ("cr", "sum")]))
        cl = g.column("cl_sum").to_numpy(zero_copy_only=False)
        cr = g.column("cr_sum").to_numpy(zero_copy_only=False)
        if all_rows:
            m = (np.maximum(cl - cr, 0) if op == "except"
                 else np.minimum(cl, cr))
            idx = np.repeat(np.arange(len(m)), m)
            return g.take(pa.array(idx, pa.int64())).select(cols)
        if op == "except":
            keep = (cl > 0) & (cr == 0)
        elif op == "intersect":
            keep = (cl > 0) & (cr > 0)
        else:
            keep = np.ones(g.num_rows, dtype=bool)
        return g.filter(pa.array(keep)).select(cols)

    return parted.groupby("part").map_groups(kernel, batch_format="pyarrow")


def regional_revenue(lineitem, orders, customer, supplier, nation, region,
                     region_name: str = "ASIA",
                     date_lo_us: int = 820454400000000,
                     date_hi_us: int = 852076800000000,
                     num_parts: Optional[int] = None,
                     broadcast_dims: int = 2_000_000,
                     broadcast_orders: int = 2_000_000):
    """TPC-H-Q5-shaped composition: revenue per nation from lineitems
    whose customer AND supplier sit in the same nation of one region,
    within a one-year order-date window — the canonical star-schema
    multi-join (fact table x key joins x broadcast dimensions).

    Strategy is size-gated per side (the shipping_priority pattern; both
    paths equality-tested):

    * nation x region are bounded by definition (25 x 5 in TPC-H) —
      collected driver-side, always.
    * customer/supplier of the region: if the filtered projection has
      <= ``broadcast_dims`` rows, it rides the task closure as sorted
      (key, nationkey) arrays and the join is a map-side vectorized
      ``searchsorted`` — ZERO exchange. Else a distributed ``hash_join``.
    * the (orderkey -> customer nation) result of the date filter + region
      semi-join: if <= ``broadcast_orders`` rows (a one-year window of one
      region is a small slice of the order table), lineitem is reduced in
      ONE map-only pass — per batch: two searchsorted lookups, the
      same-nation filter, and a <= 25-row per-nation partial — so the only
      exchange in the whole query is the <= 25-key final sum. Else: two
      distributed hash joins (orderkey, then suppkey) with the same-nation
      filter + combiner folded map-side after the last join.

    Revenue is summed in integer 1e-4-dollar units (cents x (100 -
    discount%)): distributed float sums are order-dependent, integer sums
    are exact — value-identical to the DuckDB oracle. Default window =
    calendar 1996. Dimension nationkeys are int32 in TPC-H parquet; both
    paths cast them to int64 MAP-SIDE so exchange blocks never mix widths.
    """
    import pyarrow.compute as pc

    from .shuffle import hash_join, partitioned_group_agg

    nat = nation.to_pandas()
    reg = region.to_pandas()
    rkeys = set(reg[reg["r_name"] == region_name]["r_regionkey"])
    nat = nat[nat["n_regionkey"].isin(rkeys)]
    names = {int(k): str(v) for k, v in zip(nat["n_nationkey"],
                                            nat["n_name"])}
    nkeys = pa.array(sorted(names), pa.int32())

    def dim_pre(key_col: str, nk_col: str, out_key: str):
        def pre(t: pa.Table) -> pa.Table:
            keep = pc.is_in(t.column(nk_col), value_set=nkeys)
            sub = t.filter(keep)
            return pa.table({
                out_key: pc.cast(sub.column(key_col), pa.int64()),
                nk_col: pc.cast(sub.column(nk_col), pa.int64())})
        return pre

    cust = customer.map_batches(
        dim_pre("c_custkey", "c_nationkey", "o_custkey"),
        batch_format="pyarrow")
    supp = supplier.map_batches(
        dim_pre("s_suppkey", "s_nationkey", "l_suppkey"),
        batch_format="pyarrow")

    def orders_pre(t: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(t.column("o_orderdate"), pa.timestamp("us")),
                     pa.int64())
        keep = pc.and_(pc.greater_equal(ts, date_lo_us),
                       pc.less(ts, date_hi_us))
        return pa.table({"o_custkey": t.column("o_custkey"),
                         "l_orderkey": t.column("o_orderkey")}).filter(keep)

    ords = orders.map_batches(orders_pre, batch_format="pyarrow")

    def _sorted_map_capped(ds_small, key: str, val: str, cap: int):
        """ONE capped execution that is both the size gate and the
        collect: stream (key, val) batches into sorted numpy lookup
        arrays, or return None the moment the cap is crossed (caller
        falls back to the distributed join) — no separate count() pass."""
        empty = pa.schema([(key, pa.int64()),
                           (val, pa.int64())]).empty_table()
        tables, n = [empty], 0
        for b in ds_small.iter_batches(batch_size=1 << 18,
                                       batch_format="pyarrow"):
            tables.append(b)
            n += b.num_rows
            if n > cap:
                return None
        tbl = pa.concat_tables(tables)
        k = tbl.column(key).to_numpy(zero_copy_only=False)
        v = tbl.column(val).to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        return k[order], v[order]

    def _lookup(keys_sorted, vals, probe):
        """Vectorized inner-join lookup: (values, found_mask)."""
        if len(keys_sorted) == 0:
            return (np.zeros(len(probe), dtype=np.int64),
                    np.zeros(len(probe), dtype=bool))
        idx = np.minimum(np.searchsorted(keys_sorted, probe),
                         len(keys_sorted) - 1)
        found = keys_sorted[idx] == probe
        return vals[idx], found

    cmap = _sorted_map_capped(cust, "o_custkey", "c_nationkey",
                              broadcast_dims)
    if cmap is not None:
        ck, cn = cmap

        def ord_join(t: pa.Table) -> pa.Table:
            probe = t.column("o_custkey").to_numpy(zero_copy_only=False)
            natv, found = _lookup(ck, cn, probe)
            return pa.table({
                "l_orderkey": t.column("l_orderkey").filter(pa.array(found)),
                "c_nationkey": pa.array(natv[found], pa.int64())})

        j1 = ords.map_batches(ord_join, batch_format="pyarrow")
    else:
        j1 = hash_join(
            ords, cust, on="o_custkey", how="inner",
            left_types={"o_custkey": pa.int64(), "l_orderkey": pa.int64()},
            right_types={"o_custkey": pa.int64(),
                         "c_nationkey": pa.int64()},
            num_parts=num_parts).map_batches(
            lambda t: t.select(["l_orderkey", "c_nationkey"]),
            batch_format="pyarrow")

    def li_rev(t: pa.Table):
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            t.column("l_extendedprice"), pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(
            t.column("l_discount"), pa.scalar(100.0))), pa.int64())
        return pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()),
                                              disc))

    smap = _sorted_map_capped(supp, "l_suppkey", "s_nationkey",
                              broadcast_dims)
    omap = (_sorted_map_capped(j1, "l_orderkey", "c_nationkey",
                               broadcast_orders)
            if smap is not None else None)

    if smap is not None and omap is not None:
        # map-only fact pass: the entire query is ONE lineitem scan plus a
        # <= 25-key exchange of per-batch nation partials
        ok, on = omap
        sk, sn = smap

        def li_partial(t: pa.Table) -> pa.Table:
            okey = t.column("l_orderkey").to_numpy(zero_copy_only=False)
            cnat, f1 = _lookup(ok, on, okey)
            skey = t.column("l_suppkey").to_numpy(zero_copy_only=False)
            snat, f2 = _lookup(sk, sn, skey)
            keep = f1 & f2 & (cnat == snat)
            rev = li_rev(t).to_numpy(zero_copy_only=False)[keep]
            nk = cnat[keep]
            if not len(nk):
                return pa.table({"c_nationkey": pa.array([], pa.int64()),
                                 "revenue_e4": pa.array([], pa.int64())})
            sums = np.zeros(len(names) or 1, dtype=np.int64)
            keys_sorted = np.array(sorted(names), dtype=np.int64)
            pos = np.searchsorted(keys_sorted, nk)
            np.add.at(sums, pos, rev)
            nz = sums != 0
            return pa.table({
                "c_nationkey": pa.array(keys_sorted[nz], pa.int64()),
                "revenue_e4": pa.array(sums[nz], pa.int64())})

        partials = lineitem.map_batches(li_partial, batch_format="pyarrow")
    else:
        def li_pre(t: pa.Table) -> pa.Table:
            return pa.table({"l_orderkey": t.column("l_orderkey"),
                             "l_suppkey": t.column("l_suppkey"),
                             "rev_e4": li_rev(t)})

        li = lineitem.map_batches(li_pre, batch_format="pyarrow")
        j2 = hash_join(
            li, j1.materialize(), on="l_orderkey", how="inner",
            left_types={"l_orderkey": pa.int64(), "l_suppkey": pa.int64(),
                        "rev_e4": pa.int64()},
            right_types={"l_orderkey": pa.int64(),
                         "c_nationkey": pa.int64()},
            num_parts=num_parts)
        j3 = hash_join(
            j2, supp, on="l_suppkey", how="inner",
            left_types={"l_orderkey": pa.int64(), "l_suppkey": pa.int64(),
                        "rev_e4": pa.int64(), "c_nationkey": pa.int64()},
            right_types={"l_suppkey": pa.int64(),
                         "s_nationkey": pa.int64()},
            num_parts=num_parts)

        def same_nation_partial(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t.column("c_nationkey"),
                                  t.column("s_nationkey")))
            g = t.select(["c_nationkey", "rev_e4"]).group_by(
                "c_nationkey").aggregate([("rev_e4", "sum")])
            return g.rename_columns(["c_nationkey", "revenue_e4"])

        partials = j3.map_batches(same_nation_partial,
                                  batch_format="pyarrow")

    agg = partitioned_group_agg(partials, ["c_nationkey"],
                                [("revenue_e4", "sum", "revenue_e4")],
                                num_parts=min(num_parts or 8, 8))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 and "revenue_e4" not in t.column_names:
            return pa.table({"n_name": pa.array([], pa.string()),
                             "revenue_e4": pa.array([], pa.int64())})
        nk = t.column("c_nationkey").to_pylist()
        return pa.table({
            "n_name": pa.array([names[int(k)] for k in nk], pa.string()),
            "revenue_e4": t.column("revenue_e4")})

    return agg.map_batches(finish, batch_format="pyarrow")


class _DimRevenueStage:
    """Map-side broadcast-dimension revenue combiner (see dim_revenue)."""

    def __init__(self, lookup_ref, fact_key: str):
        import ray
        self.keys, self.codes, self.labels = ray.get(lookup_ref)
        self.fact_key = fact_key

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc
        k = t.column(self.fact_key).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        idx = np.searchsorted(self.keys, k)
        idx[idx >= len(self.keys)] = 0
        hit = self.keys[idx] == k
        rev = pc.floor(pc.add(pc.multiply(pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount"))),
            pa.scalar(100.0)), pa.scalar(0.5))) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        code = self.codes[idx[hit]]
        n = np.bincount(code, minlength=len(self.labels))
        # integer cents < 2^53 per batch: float64 bincount sums are exact
        r = np.bincount(code, weights=rev[hit].astype(np.float64),
                        minlength=len(self.labels)).astype(np.int64)
        nz = np.flatnonzero(n)
        return pa.table({
            "label": pa.array(self.labels[nz], pa.string()),
            "n_items": pa.array(n[nz], pa.int64()),
            "revenue_cents": pa.array(r[nz], pa.int64()),
        })


def dim_revenue(lineitem, dim_path: str, fact_key: str, dim_key: str,
                label_col: str, num_parts: Optional[int] = None):
    """Revenue rollup per dimension label over the lineitem fact table
    with a BROADCAST dimension (the TPC-H Q14/Q15 star shape: part /
    supplier are bounded dimension tables; the fact table streams in ONE
    map-only pass). Returns (label, n_items, revenue_cents) where
    revenue_cents = sum of floor(l_extendedprice * (1 - l_discount) * 100
    + 0.5) over matched lineitems — integer sums are order-free, so the
    result is value-exact vs the SQL inner-join + GROUP BY.

    Scale shape: the dimension is read once on the driver, factorized to
    (sorted keys, label codes, distinct labels) and shipped via ray.put;
    each batch does one vectorized searchsorted + two bincounts and emits
    <= |labels| partial rows, so the ONLY exchange is the final
    label-keyed sum of per-batch partials (labels x batches rows)."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from .shuffle import TaskStage, partitioned_group_agg

    dim = pq.read_table(dim_path, columns=[dim_key, label_col])
    keys = dim.column(dim_key).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    labels_all = np.asarray(dim.column(label_col).to_pylist(), dtype=object)
    order = np.argsort(keys, kind="stable")
    keys = keys[order]
    labels_all = labels_all[order]
    uniq, codes = np.unique(labels_all, return_inverse=True)
    ref = ray.put((keys, codes.astype(np.int64), uniq))

    rows = lineitem.map_batches(
        TaskStage(_DimRevenueStage, lookup_ref=ref, fact_key=fact_key),
        batch_format="pyarrow")

    def label_keys(batch: pa.Table):
        import polars as pl
        h = pl.from_arrow(batch.column("label")).hash(seed=0)
        return [h.to_numpy().view(np.int64)]

    return partitioned_group_agg(
        rows, ["label"],
        [("n_items", "sum", "n_items"),
         ("revenue_cents", "sum", "revenue_cents")],
        num_parts=num_parts, key_arrays_fn=label_keys)


def explode_list(ds, list_col: str, id_cols: List[str],
                 ordinal_col: str = "ordinal", value_col: str = "value"):
    """UNNEST WITH ORDINALITY: flatten an Arrow list column to long form —
    one row per element, carrying ``id_cols`` and the element's 0-based
    position. The core relational explode (SQL ``unnest`` /
    ``generate_subscripts``), done zero-copy per batch:
    ``pc.list_flatten`` for values, ``pc.list_parent_indices`` + ``take``
    for the carried columns, a vectorized cumsum for ordinality — no
    Python loop over rows or elements. Null/empty lists emit no rows
    (SQL unnest semantics). Map-only, zero shuffle; output size is the
    total element count, so downstream stages see pre-sized Arrow blocks
    the streaming executor can spill independently of the parent rows.
    """
    def kernel(batch: pa.Table) -> pa.Table:
        arr = batch.column(list_col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        parent = pc.list_parent_indices(arr)
        values = pc.list_flatten(arr)
        lengths = pc.fill_null(pc.list_value_length(arr), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
        ordinal = (np.arange(len(values), dtype=np.int64)
                   - starts[parent.to_numpy(zero_copy_only=False)])
        cols = {c: pc.take(batch.column(c), parent) for c in id_cols}
        cols[ordinal_col] = pa.array(ordinal, pa.int64())
        cols[value_col] = values
        return pa.table(cols)

    return ds.map_batches(kernel, batch_format="pyarrow")


def rrf_fuse(rank_a, rank_b, id_col: str = "doc_id",
             rank_col: str = "global_rank", k: int = 60,
             num_parts: Optional[int] = None):
    """Reciprocal-rank fusion (Cormack et al. 2009): fuse two rankings of
    the same id space by score = 1/(k+rank_a) + 1/(k+rank_b), an id
    missing from one ranking contributing 0 from that side — the
    standard hybrid-retrieval combiner (BM25 list + embedding list).

    One id-keyed FULL OUTER hash-join exchange, then a pure map: the
    float math is two IEEE divisions and one addition in fixed order, so
    an SQL mirror reproduces it bit-for-bit. Returns (id, rrf) unsorted
    (feed topk_per_group / global_rank downstream for the cut)."""
    import pyarrow.compute as pc

    from .shuffle import hash_join

    def side(ds, name):
        return ds.map_batches(
            lambda t, nm=name: pa.table({
                id_col: pc.cast(t.column(id_col), pa.int64()),
                nm: pc.cast(t.column(rank_col), pa.int64())}),
            batch_format="pyarrow")

    # type hints are load-bearing: each side is (downstream of) a
    # groupby output, so an unhinted join's schema() probe would execute
    # both ranking pipelines once for the probe and again for real
    joined = hash_join(side(rank_a, "_ra"), side(rank_b, "_rb"),
                       on=[id_col], how="full", num_parts=num_parts,
                       left_types={id_col: pa.int64(), "_ra": pa.int64()},
                       right_types={id_col: pa.int64(),
                                    "_rb": pa.int64()})

    def score(t: pa.Table) -> pa.Table:
        ra = t.column("_ra").to_numpy(zero_copy_only=False)
        rb = t.column("_rb").to_numpy(zero_copy_only=False)
        # nulls arrive as NaN in the float view; a missing side adds 0
        ra = np.asarray(ra, dtype=np.float64)
        rb = np.asarray(rb, dtype=np.float64)
        sa = np.where(np.isnan(ra), 0.0, 1.0 / (k + ra))
        sb = np.where(np.isnan(rb), 0.0, 1.0 / (k + rb))
        return pa.table({
            id_col: t.column(id_col),
            "rrf": pa.array(sa + sb, pa.float64()),
        })

    return joined.map_batches(score, batch_format="pyarrow")
