"""Relational analytics over the TPC-H-ish tables (lineitem) — the
general-query surface beyond the documents/events/embeddings
operators: the classic pricing-summary (TPC-H Q1) and forecast-revenue
(Q6) aggregates, Ray-Data-first.

Money columns are 2-decimal doubles; every aggregate converts them to
exact integers (cents, then 1e-4 / 1e-6 dollar units for the
discount/charge products) so the DuckDB oracle comparison has no
float-sum-order surface at all.  Both queries are map-side partial
aggregations (per-batch group cardinality is tiny: |returnflag| x
|linestatus| <= 6) followed by one pkey groupby over the partials —
the shuffle moves O(groups x batches) rows, never line items.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from apollo_ray.hashing import hash_utf8, mix_to_partition

_Q1_COLS = ("l_returnflag", "l_linestatus", "count_order", "sum_qty",
            "sum_base_price_c", "sum_disc_price_e4", "sum_charge_e6",
            "sum_disc_c")


def _money_ints(batch: pa.Table, name: str, scale: int) -> np.ndarray:
    """2-decimal double column -> exact int64 (values are within 1e-9
    of an integer after scaling, so ``rint`` never sees a half)."""
    v = batch.column(name).to_numpy(zero_copy_only=False)
    return np.rint(v * scale).astype(np.int64)


def pricing_summary(lineitem: "ray.data.Dataset",
                    cutoff: str = "1998-09-02",
                    num_partitions: int = 8) -> "ray.data.Dataset":
    """TPC-H Q1: per (l_returnflag, l_linestatus) pricing summary over
    line items shipped on or before ``cutoff``; all sums as exact
    integer units (cents / 1e-4 / 1e-6 dollars) — the avg_* columns of
    the official query are derivable as sum/count."""

    def partial(batch: pa.Table) -> pa.Table:
        empty = {c: pa.array([], type=pa.string() if c.startswith("l_")
                             else pa.int64()) for c in _Q1_COLS}
        empty["pkey"] = pa.array([], type=pa.int32())
        if batch.num_rows == 0:
            return pa.table(empty)
        keep = pc.less_equal(
            batch.column("l_shipdate"),
            pa.scalar(np.datetime64(cutoff, "us"))).to_numpy(
                zero_copy_only=False)
        batch = batch.filter(pa.array(keep))
        if batch.num_rows == 0:
            return pa.table(empty)
        flag = batch.column("l_returnflag").to_pylist()
        stat = batch.column("l_linestatus").to_pylist()
        keys = np.asarray(["%s\x00%s" % (f, s) for f, s in zip(flag, stat)],
                          dtype=object)
        uk, inv = np.unique(keys, return_inverse=True)
        qty = _money_ints(batch, "l_quantity", 1)
        price_c = _money_ints(batch, "l_extendedprice", 100)
        disc_c = _money_ints(batch, "l_discount", 100)
        tax_c = _money_ints(batch, "l_tax", 100)
        disc_price = price_c * (100 - disc_c)
        charge = disc_price * (100 + tax_c)
        n = len(uk)

        def seg(v):
            return np.bincount(inv, weights=v, minlength=n).astype(np.int64)

        parts = [k.split("\x00") for k in uk]
        gh = np.fromiter((hash_utf8(k) for k in uk),
                         dtype=np.int64, count=n)
        return pa.table({
            "l_returnflag": pa.array([p[0] for p in parts],
                                     type=pa.string()),
            "l_linestatus": pa.array([p[1] for p in parts],
                                     type=pa.string()),
            "count_order": pa.array(np.bincount(inv, minlength=n)
                                    .astype(np.int64), type=pa.int64()),
            "sum_qty": pa.array(seg(qty), type=pa.int64()),
            "sum_base_price_c": pa.array(seg(price_c), type=pa.int64()),
            "sum_disc_price_e4": pa.array(seg(disc_price), type=pa.int64()),
            "sum_charge_e6": pa.array(seg(charge), type=pa.int64()),
            "sum_disc_c": pa.array(seg(disc_c), type=pa.int64()),
            "pkey": pa.array(mix_to_partition(gh, num_partitions),
                             type=pa.int32()),
        })

    def final(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({c: pa.array(
                [], type=pa.string() if c.startswith("l_") else pa.int64())
                for c in _Q1_COLS})
        flag = np.asarray(group.column("l_returnflag").to_pylist(),
                          dtype=object)
        stat = np.asarray(group.column("l_linestatus").to_pylist(),
                          dtype=object)
        keys = np.asarray(["%s\x00%s" % (f, s) for f, s in zip(flag, stat)],
                          dtype=object)
        uk, inv = np.unique(keys, return_inverse=True)
        parts = [k.split("\x00") for k in uk]
        out = {
            "l_returnflag": pa.array([p[0] for p in parts],
                                     type=pa.string()),
            "l_linestatus": pa.array([p[1] for p in parts],
                                     type=pa.string()),
        }
        for c in _Q1_COLS[2:]:
            v = np.asarray(group.column(c), dtype=np.int64)
            out[c] = pa.array(
                np.bincount(inv, weights=v, minlength=len(uk))
                .astype(np.int64), type=pa.int64())
        return pa.table(out)

    return lineitem.map_batches(partial, batch_format="pyarrow") \
        .groupby("pkey").map_groups(final, batch_format="pyarrow")


PRICING_SUMMARY_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS count_order,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
               AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS sum_base_price_c,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
               AS BIGINT) AS sum_disc_price_e4,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))
                    * (100 + CAST(round(l_tax * 100) AS BIGINT)))
               AS BIGINT) AS sum_charge_e6,
           CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
               AS sum_disc_c
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
"""


def forecast_revenue(lineitem: "ray.data.Dataset",
                     year: int = 1997, disc_lo: int = 5, disc_hi: int = 7,
                     max_qty: int = 24) -> "ray.data.Dataset":
    """TPC-H Q6: one-row revenue-increase estimate — sum of
    ``extendedprice * discount`` (exact 1e-4 dollar units) over line
    items shipped in ``year`` with discount in [disc_lo, disc_hi]
    cents and quantity < ``max_qty``.  Map-side scalar partials, one
    tiny final sum."""

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"revenue_e4": pa.array([], type=pa.int64()),
                             "pkey": pa.array([], type=pa.int32())})
        sd = batch.column("l_shipdate")
        keep = pc.and_(
            pc.greater_equal(sd, pa.scalar(
                np.datetime64("%d-01-01" % year, "us"))),
            pc.less(sd, pa.scalar(
                np.datetime64("%d-01-01" % (year + 1), "us")))
        ).to_numpy(zero_copy_only=False)
        disc_c = _money_ints(batch, "l_discount", 100)
        qty = _money_ints(batch, "l_quantity", 1)
        keep &= (disc_c >= disc_lo) & (disc_c <= disc_hi) & (qty < max_qty)
        price_c = _money_ints(batch, "l_extendedprice", 100)
        rev = int(np.sum(price_c[keep] * disc_c[keep], dtype=np.int64))
        return pa.table({"revenue_e4": pa.array([rev], type=pa.int64()),
                         "n_match": pa.array([int(keep.sum())],
                                             type=pa.int64()),
                         "pkey": pa.array([0], type=pa.int32())})

    def final(group: pa.Table) -> pa.Table:
        # SQL sum() over zero qualifying rows is NULL, not 0 — match
        # DuckDB exactly so an sf slice with no rows in the discount
        # band can never flip the oracle comparison
        if sum(group.column("n_match").to_pylist()) == 0:
            return pa.table({"revenue_e4": pa.array([None],
                                                    type=pa.int64())})
        v = np.asarray(group.column("revenue_e4"), dtype=np.int64)
        return pa.table({"revenue_e4": pa.array([int(v.sum())],
                                                type=pa.int64())})

    return lineitem.map_batches(partial, batch_format="pyarrow") \
        .groupby("pkey").map_groups(final, batch_format="pyarrow")


FORECAST_REVENUE_SQL = """
    SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
               AS revenue_e4
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
      AND CAST(round(l_quantity) AS BIGINT) < 24
"""


# broadcast cap for the filtered orders side of top_revenue_orders
# (o_orderkey + date + priority; ~30 B/row -> ~1.5 GB at the cap).
# Above it the attach step must become a hash join.
ORDERS_BROADCAST_MAX = 50_000_000


def top_revenue_orders(lineitem: "ray.data.Dataset",
                       orders: "ray.data.Dataset",
                       customer: "ray.data.Dataset",
                       segment: str = "BUILDING",
                       cutoff: str = "1997-06-30",
                       k: int = 10,
                       method: str = "auto",
                       broadcast_max: int | None = None
                       ) -> "ray.data.Dataset":
    """TPC-H Q3 shape: the ``k`` unshipped-revenue-richest orders of a
    market segment — ``sum(extendedprice * (1 - discount))`` (exact
    1e-4 dollar units) over line items shipped after ``cutoff`` whose
    order was placed before it by a ``segment`` customer.

    Join strategy (the broadcast-small-sides discipline): the segment
    customer keys (|customer| << |lineitem|) filter the orders scan,
    and the filtered orders metadata broadcasts once via ``ray.put``
    (capped at ``broadcast_max``, default ORDERS_BROADCAST_MAX rows)
    so the big lineitem table is matched with a map-side
    ``searchsorted`` — no all-to-all join.  Per-order revenue partials
    shuffle on hash(orderkey); a two-level top-k (per-partition
    candidates, tiny final merge) returns <= k rows ordered by
    (revenue DESC, orderkey ASC).

    ``method``: ``"broadcast"`` (raise above the cap), ``"hashjoin"``
    (pkey-partition the filtered orders metadata AND the lineitem
    per-order partials on hash(orderkey) and join them inside the
    same per-partition top-k stage — one extra shuffle of the orders
    metadata, no driver materialization at all), or ``"auto"``
    (broadcast while the filtered side fits, else hashjoin)."""
    import ray

    if broadcast_max is None:
        broadcast_max = ORDERS_BROADCAST_MAX
    seg_keys = []
    for b in customer.map_batches(
            lambda t: t.filter(pc.equal(t.column("c_mktsegment"), segment))
            .select(["c_custkey"]), batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        seg_keys.append(np.asarray(b.column("c_custkey"), dtype=np.int64))
    seg_arr = np.sort(np.concatenate(seg_keys)) if seg_keys else \
        np.empty(0, dtype=np.int64)
    cut = np.datetime64(cutoff, "us")

    def order_filter(batch: pa.Table) -> pa.Table:
        keep = pc.less(batch.column("o_orderdate"),
                       pa.scalar(cut)).to_numpy(zero_copy_only=False)
        ck = np.asarray(batch.column("o_custkey"), dtype=np.int64)
        hit, _ = _lookup_hit(seg_arr, ck)
        return batch.filter(pa.array(keep & hit)) \
            .select(["o_orderkey", "o_orderdate", "o_orderpriority"])

    empty_out = pa.table({
        "l_orderkey": pa.array([], type=pa.int64()),
        "revenue_e4": pa.array([], type=pa.int64()),
        "o_orderdate": pa.array([], type=pa.timestamp("us")),
        "o_orderpriority": pa.array([], type=pa.string())})
    if method == "hashjoin":
        return _top_revenue_hashjoin(lineitem, orders, order_filter,
                                     cut, k, empty_out)
    ord_keys, ord_dates, ord_prio = [], [], []
    filt = orders.map_batches(order_filter, batch_format="pyarrow")
    n_orders = 0
    for b in filt.iter_batches(batch_format="pyarrow"):
        n_orders += b.num_rows
        if n_orders > broadcast_max:
            if method == "auto":
                return _top_revenue_hashjoin(lineitem, orders,
                                             order_filter, cut, k,
                                             empty_out)
            raise NotImplementedError(
                "filtered orders side exceeds broadcast_max; "
                "use method='hashjoin'")
        ord_keys.append(np.asarray(b.column("o_orderkey"), dtype=np.int64))
        ord_dates.append(b.column("o_orderdate").to_numpy(
            zero_copy_only=False))
        ord_prio.extend(b.column("o_orderpriority").to_pylist())
    if not ord_keys or not sum(len(a) for a in ord_keys):
        return ray.data.from_arrow(empty_out)
    okeys = np.concatenate(ord_keys)
    order_ix = np.argsort(okeys, kind="stable")
    okeys = okeys[order_ix]
    odates = np.concatenate(ord_dates)[order_ix]
    oprio = np.asarray(ord_prio, dtype=object)[order_ix]
    ref = ray.put((okeys, odates, oprio))

    def li_partial(batch: pa.Table, ref=ref) -> pa.Table:
        import ray as _ray
        ok, od, op = _ray.get(ref)
        empty = pa.table({"okey": pa.array([], type=pa.int64()),
                          "rev": pa.array([], type=pa.int64()),
                          "pkey": pa.array([], type=pa.int32())})
        keep = pc.greater(batch.column("l_shipdate"),
                          pa.scalar(cut)).to_numpy(zero_copy_only=False)
        lk = np.asarray(batch.column("l_orderkey"), dtype=np.int64)
        i = np.searchsorted(ok, lk)
        hit = (i < len(ok))
        hit[hit] &= ok[i[hit]] == lk[hit]
        keep &= hit
        if not keep.any():
            return empty
        lk = lk[keep]
        price_c = _money_ints(batch, "l_extendedprice", 100)[keep]
        disc_c = _money_ints(batch, "l_discount", 100)[keep]
        rev = price_c * (100 - disc_c)
        uk, inv = np.unique(lk, return_inverse=True)
        sums = np.bincount(inv, weights=rev,
                           minlength=len(uk)).astype(np.int64)
        return pa.table({
            "okey": pa.array(uk, type=pa.int64()),
            "rev": pa.array(sums, type=pa.int64()),
            "pkey": pa.array(mix_to_partition(uk, 16), type=pa.int32()),
        })

    def part_topk(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"okey": pa.array([], type=pa.int64()),
                             "rev": pa.array([], type=pa.int64()),
                             "gkey": pa.array([], type=pa.int32())})
        okey = np.asarray(group.column("okey"), dtype=np.int64)
        rev = np.asarray(group.column("rev"), dtype=np.int64)
        uk, inv = np.unique(okey, return_inverse=True)
        sums = np.bincount(inv, weights=rev,
                           minlength=len(uk)).astype(np.int64)
        # per-partition top-k candidates: orderkeys are complete within
        # their pkey partition, so the union over partitions is a
        # superset of the global top-k
        order = np.lexsort((uk, -sums))[:k]
        return pa.table({
            "okey": pa.array(uk[order], type=pa.int64()),
            "rev": pa.array(sums[order], type=pa.int64()),
            "gkey": pa.array(np.zeros(len(order), dtype=np.int32),
                             type=pa.int32()),
        })

    def final_topk(group: pa.Table, ref=ref) -> pa.Table:
        import ray as _ray
        if group.num_rows == 0:
            return empty_out
        ok, od, op = _ray.get(ref)
        okey = np.asarray(group.column("okey"), dtype=np.int64)
        rev = np.asarray(group.column("rev"), dtype=np.int64)
        order = np.lexsort((okey, -rev))[:k]
        okey, rev = okey[order], rev[order]
        j = np.searchsorted(ok, okey)
        return pa.table({
            "l_orderkey": pa.array(okey, type=pa.int64()),
            "revenue_e4": pa.array(rev, type=pa.int64()),
            "o_orderdate": pa.array(od[j], type=pa.timestamp("us")),
            "o_orderpriority": pa.array(op[j].tolist(), type=pa.string()),
        })

    return lineitem.map_batches(li_partial, batch_format="pyarrow") \
        .groupby("pkey").map_groups(part_topk, batch_format="pyarrow") \
        .groupby("gkey").map_groups(final_topk, batch_format="pyarrow")


def _lookup_hit(sorted_keys: np.ndarray, probe: np.ndarray
                ) -> tuple[np.ndarray, np.ndarray]:
    """(hit_mask, insert_pos) of ``probe`` against sorted keys."""
    i = np.searchsorted(sorted_keys, probe)
    hit = i < len(sorted_keys)
    hit[hit] &= sorted_keys[i[hit]] == probe[hit]
    return hit, i


def _top_revenue_hashjoin(lineitem, orders, order_filter, cut, k,
                          empty_out, num_partitions: int = 64):
    """Hash-join attach path for :func:`top_revenue_orders`: filtered
    orders metadata and lineitem per-order revenue partials both pkey
    on hash(orderkey) and meet in the per-partition join + top-k stage.
    Nothing materializes on the driver; each partition holds
    |filtered orders| / num_partitions metadata rows plus the order's
    partials — raise ``num_partitions`` to bound per-task memory at
    scale."""
    import ray  # noqa: F401  (parity with the broadcast path imports)
    from apollo_ray.hashing import mix_to_partition

    def _side(okey, rev, odate, oprio, side):
        n = len(okey)
        return pa.table({
            "okey": pa.array(okey, type=pa.int64()),
            "rev": pa.array(rev, type=pa.int64()),
            "odate": odate if isinstance(odate, (pa.Array, pa.ChunkedArray))
            else pa.nulls(n, type=pa.timestamp("us")),
            "oprio": oprio if isinstance(oprio, (pa.Array, pa.ChunkedArray))
            else pa.nulls(n, type=pa.string()),
            "side": pa.array(np.full(n, side, dtype=np.int8),
                             type=pa.int8()),
            "pkey": pa.array(mix_to_partition(
                np.asarray(okey, dtype=np.int64), num_partitions),
                type=pa.int32()),
        })

    def orders_side(batch: pa.Table) -> pa.Table:
        t = order_filter(batch)
        okey = np.asarray(t.column("o_orderkey"), dtype=np.int64)
        return _side(okey, np.zeros(len(okey), dtype=np.int64),
                     t.column("o_orderdate").combine_chunks()
                     if isinstance(t.column("o_orderdate"), pa.ChunkedArray)
                     else t.column("o_orderdate"),
                     t.column("o_orderpriority").combine_chunks()
                     if isinstance(t.column("o_orderpriority"),
                                   pa.ChunkedArray)
                     else t.column("o_orderpriority"), 0)

    def li_side(batch: pa.Table) -> pa.Table:
        keep = pc.greater(batch.column("l_shipdate"),
                          pa.scalar(cut)).to_numpy(zero_copy_only=False)
        if not keep.any():
            return _side(np.empty(0, dtype=np.int64),
                         np.empty(0, dtype=np.int64), None, None, 1)
        lk = np.asarray(batch.column("l_orderkey"), dtype=np.int64)[keep]
        price_c = _money_ints(batch, "l_extendedprice", 100)[keep]
        disc_c = _money_ints(batch, "l_discount", 100)[keep]
        uk, inv = np.unique(lk, return_inverse=True)
        sums = np.bincount(inv, weights=price_c * (100 - disc_c),
                           minlength=len(uk)).astype(np.int64)
        return _side(uk, sums, None, None, 1)

    def join_topk(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "okey": pa.array([], type=pa.int64()),
            "rev": pa.array([], type=pa.int64()),
            "odate": pa.array([], type=pa.timestamp("us")),
            "oprio": pa.array([], type=pa.string()),
            "gkey": pa.array([], type=pa.int32())})
        if group.num_rows == 0:
            return empty
        side = np.asarray(group.column("side"), dtype=np.int8)
        okey = np.asarray(group.column("okey"), dtype=np.int64)
        om = side == 0
        ok_o = okey[om]
        if not len(ok_o) or om.all():
            return empty
        six = np.argsort(ok_o, kind="stable")
        ok_o = ok_o[six]
        od_o = group.column("odate").to_numpy(
            zero_copy_only=False)[om][six]
        op_o = np.asarray(group.column("oprio").to_pylist(),
                          dtype=object)[om][six]
        rev = np.asarray(group.column("rev"), dtype=np.int64)[~om]
        uk, inv = np.unique(okey[~om], return_inverse=True)
        sums = np.bincount(inv, weights=rev,
                           minlength=len(uk)).astype(np.int64)
        hit, i = _lookup_hit(ok_o, uk)
        uk, sums, i = uk[hit], sums[hit], i[hit]
        order = np.lexsort((uk, -sums))[:k]
        return pa.table({
            "okey": pa.array(uk[order], type=pa.int64()),
            "rev": pa.array(sums[order], type=pa.int64()),
            "odate": pa.array(od_o[i[order]], type=pa.timestamp("us")),
            "oprio": pa.array(op_o[i[order]].tolist(), type=pa.string()),
            "gkey": pa.array(np.zeros(len(order), dtype=np.int32),
                             type=pa.int32())})

    def final(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty_out
        okey = np.asarray(group.column("okey"), dtype=np.int64)
        rev = np.asarray(group.column("rev"), dtype=np.int64)
        order = np.lexsort((okey, -rev))[:k]
        return pa.table({
            "l_orderkey": pa.array(okey[order], type=pa.int64()),
            "revenue_e4": pa.array(rev[order], type=pa.int64()),
            "o_orderdate": pa.array(group.column("odate").to_numpy(
                zero_copy_only=False)[order], type=pa.timestamp("us")),
            "o_orderpriority": pa.array(
                np.asarray(group.column("oprio").to_pylist(),
                           dtype=object)[order].tolist(),
                type=pa.string())})

    both = orders.map_batches(orders_side, batch_format="pyarrow").union(
        lineitem.map_batches(li_side, batch_format="pyarrow"))
    return both.groupby("pkey").map_groups(join_topk,
                                           batch_format="pyarrow") \
        .groupby("gkey").map_groups(final, batch_format="pyarrow")


class _OverBroadcastCap(Exception):
    """Internal: a broadcast side exceeded the cap (auto-fallback)."""


def regional_revenue(lineitem: "ray.data.Dataset",
                     orders: "ray.data.Dataset",
                     customer: "ray.data.Dataset",
                     supplier: "ray.data.Dataset",
                     nation: "ray.data.Dataset",
                     region: "ray.data.Dataset",
                     region_name: str = "ASIA",
                     year: int = 1997,
                     method: str = "auto",
                     broadcast_max: int | None = None,
                     num_partitions: int = 64) -> "ray.data.Dataset":
    """TPC-H Q5 shape: per-nation revenue (exact 1e-4 dollar units) of
    ``year`` orders where the customer and the line item's supplier sit
    in the same nation of ``region_name``; ordered revenue DESC.

    Join strategy (``method="auto"``) — a broadcast dimension CHAIN,
    never a shuffle join: region⋈nation (tiny) resolve on the driver to
    the in-region nation set; customer and supplier project to sorted
    (key → nationkey) arrays filtered to those nations; orders filter
    by date + in-region customer and project to sorted (orderkey →
    cust_nationkey).  Each side broadcasts once via ``ray.put`` (capped
    at ``broadcast_max``, default ORDERS_BROADCAST_MAX rows).  The
    single lineitem scan then resolves both nations map-side with
    ``searchsorted``, keeps cust_nation == supp_nation, and bincounts
    revenue per nationkey — the shuffle moves O(nations × batches)
    partial rows only.

    Above the cap ``method="auto"`` switches to the fully distributed
    ``method="hashjoin"`` plan (:func:`_regional_revenue_hashjoin`):
    orders⋈customer meet on hash(custkey), the result attaches to
    lineitem on hash(orderkey), supplier attaches on hash(suppkey) —
    three pkey shuffles over date-filtered rows, no driver state, the
    region/nation dimension still resolved driver-side (tiny)."""
    import ray

    if method not in ("auto", "broadcast", "hashjoin"):
        raise ValueError("unknown regional_revenue method %r" % method)
    if broadcast_max is None:
        broadcast_max = ORDERS_BROADCAST_MAX

    # region ⋈ nation: tiny dimension tables, resolved driver-side
    rkeys = []
    for b in region.iter_batches(batch_format="pyarrow"):
        m = pc.equal(b.column("r_name"), region_name).to_numpy(
            zero_copy_only=False)
        rkeys.append(np.asarray(b.column("r_regionkey"),
                                dtype=np.int64)[m])
    rset = np.sort(np.concatenate(rkeys)) if rkeys else \
        np.empty(0, dtype=np.int64)
    nat_keys, nat_names = [], []
    for b in nation.iter_batches(batch_format="pyarrow"):
        nrk = np.asarray(b.column("n_regionkey"), dtype=np.int64)
        hit, _ = _lookup_hit(rset, nrk)
        nat_keys.append(np.asarray(b.column("n_nationkey"),
                                   dtype=np.int64)[hit])
        nat_names.extend(np.asarray(b.column("n_name").to_pylist(),
                                    dtype=object)[hit].tolist())
    nats = np.concatenate(nat_keys) if nat_keys else \
        np.empty(0, dtype=np.int64)
    order_ix = np.argsort(nats, kind="stable")
    nats = nats[order_ix]
    names = np.asarray(nat_names, dtype=object)[order_ix]
    empty_out = pa.table({"n_name": pa.array([], type=pa.string()),
                          "revenue_e4": pa.array([], type=pa.int64())})
    if len(nats) == 0:
        return ray.data.from_arrow(empty_out)
    lo = np.datetime64("%d-01-01" % year, "us")
    hi = np.datetime64("%d-01-01" % (year + 1), "us")
    nat_hi = int(nats.max()) + 1

    def final(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty_out
        nat = np.asarray(group.column("nat"), dtype=np.int64)
        rev = np.asarray(group.column("rev"), dtype=np.int64)
        sums = np.bincount(nat, weights=rev,
                           minlength=nat_hi).astype(np.int64)
        nz = np.flatnonzero(sums)
        j = np.searchsorted(nats, nz)
        nm = names[j]
        order = np.lexsort((nm, -sums[nz]))
        return pa.table({
            "n_name": pa.array(nm[order].tolist(), type=pa.string()),
            "revenue_e4": pa.array(sums[nz][order], type=pa.int64()),
        })

    if method == "hashjoin":
        return _regional_revenue_hashjoin(
            lineitem, orders, customer, supplier, nats, lo, hi, nat_hi,
            final, num_partitions)

    def _keyed_side(ds, key_col, nat_col, what):
        """Sorted (key, nationkey) arrays for rows in the region."""
        ks, ns, n_rows = [], [], 0
        proj = ds.map_batches(
            lambda t, kc=key_col, nc=nat_col: t.select([kc, nc]),
            batch_format="pyarrow")
        for b in proj.iter_batches(batch_format="pyarrow"):
            kv = np.asarray(b.column(key_col), dtype=np.int64)
            nv = np.asarray(b.column(nat_col), dtype=np.int64)
            hit, _ = _lookup_hit(nats, nv)
            n_rows += int(hit.sum())
            if n_rows > broadcast_max:
                raise _OverBroadcastCap(
                    "%s side exceeds broadcast_max" % what)
            ks.append(kv[hit])
            ns.append(nv[hit])
        k = np.concatenate(ks) if ks else np.empty(0, dtype=np.int64)
        n = np.concatenate(ns) if ns else np.empty(0, dtype=np.int64)
        ix = np.argsort(k, kind="stable")
        return k[ix], n[ix]

    try:
        cust_k, cust_n = _keyed_side(customer, "c_custkey", "c_nationkey",
                                     "customer")
        supp_k, supp_n = _keyed_side(supplier, "s_suppkey", "s_nationkey",
                                     "supplier")

        # orders filtered by date + in-region customer -> (orderkey, nat)
        ok_l, on_l, n_orders = [], [], 0
        for b in orders.iter_batches(batch_format="pyarrow"):
            od = b.column("o_orderdate").to_numpy(zero_copy_only=False)
            keep = (od >= lo) & (od < hi)
            ck = np.asarray(b.column("o_custkey"), dtype=np.int64)
            hit, i = _lookup_hit(cust_k, ck)
            keep &= hit
            n_orders += int(keep.sum())
            if n_orders > broadcast_max:
                raise _OverBroadcastCap("filtered orders side exceeds "
                                        "broadcast_max")
            ok_l.append(np.asarray(b.column("o_orderkey"),
                                   dtype=np.int64)[keep])
            on_l.append(cust_n[i[keep]])
    except _OverBroadcastCap as e:
        if method == "broadcast":
            raise NotImplementedError(
                str(e) + "; use method='hashjoin'") from None
        return _regional_revenue_hashjoin(
            lineitem, orders, customer, supplier, nats, lo, hi, nat_hi,
            final, num_partitions)
    okeys = np.concatenate(ok_l) if ok_l else np.empty(0, dtype=np.int64)
    onats = np.concatenate(on_l) if on_l else np.empty(0, dtype=np.int64)
    ix = np.argsort(okeys, kind="stable")
    okeys, onats = okeys[ix], onats[ix]
    if len(okeys) == 0:
        return ray.data.from_arrow(empty_out)
    ref = ray.put((okeys, onats, supp_k, supp_n))

    def li_partial(batch: pa.Table, ref=ref) -> pa.Table:
        import ray as _ray
        ok, on, sk, sn = _ray.get(ref)
        empty = pa.table({"nat": pa.array([], type=pa.int64()),
                          "rev": pa.array([], type=pa.int64()),
                          "pkey": pa.array([], type=pa.int32())})
        if batch.num_rows == 0:
            return empty
        lk = np.asarray(batch.column("l_orderkey"), dtype=np.int64)
        hit_o, io = _lookup_hit(ok, lk)
        sup = np.asarray(batch.column("l_suppkey"), dtype=np.int64)
        hit_s, isup = _lookup_hit(sk, sup)
        keep = hit_o & hit_s
        keep[keep] &= on[io[keep]] == sn[isup[keep]]
        if not keep.any():
            return empty
        nat = on[io[keep]]
        price_c = _money_ints(batch, "l_extendedprice", 100)[keep]
        disc_c = _money_ints(batch, "l_discount", 100)[keep]
        sums = np.bincount(nat, weights=price_c * (100 - disc_c),
                           minlength=nat_hi).astype(np.int64)
        nz = np.flatnonzero(sums)
        return pa.table({
            "nat": pa.array(nz.astype(np.int64), type=pa.int64()),
            "rev": pa.array(sums[nz], type=pa.int64()),
            "pkey": pa.array(np.zeros(len(nz), dtype=np.int32),
                             type=pa.int32()),
        })

    return lineitem.map_batches(li_partial, batch_format="pyarrow") \
        .groupby("pkey").map_groups(final, batch_format="pyarrow")


def _regional_revenue_hashjoin(lineitem, orders, customer, supplier,
                               nats, lo, hi, nat_hi, final,
                               num_partitions: int = 64):
    """Fully distributed Q5 attach (above the broadcast cap): three
    pkey-partitioned joins, no driver-side fact state.

    1. orders (date-filtered) ⋈ customer (region-filtered) meet on
       hash(custkey) -> (orderkey, cust_nation);
    2. that result ⋈ lineitem on hash(orderkey), pre-aggregating each
       lineitem batch to (orderkey, suppkey) revenue partials ->
       (suppkey, cust_nation, rev) rows re-keyed on hash(suppkey);
    3. ⋈ supplier (region-filtered) on hash(suppkey), keeping
       cust_nation == supp_nation, bincounting revenue per nation —
       each partition emits <= |nations| partial rows into the final
       fold.  Per-partition memory is the partition's slice of each
       side; raise ``num_partitions`` to bound it at scale."""
    import ray  # noqa: F401
    from apollo_ray.hashing import mix_to_partition

    nats_sorted = np.sort(np.asarray(nats, dtype=np.int64))

    def _keyed(k, a, b_, side):
        return pa.table({
            "k": pa.array(k, type=pa.int64()),
            "a": pa.array(a, type=pa.int64()),
            "b": pa.array(b_, type=pa.int64()),
            "side": pa.array(np.full(len(k), side, dtype=np.int8),
                             type=pa.int8()),
            "pkey": pa.array(mix_to_partition(
                np.asarray(k, dtype=np.int64), num_partitions),
                type=pa.int32()),
        })

    zeros = lambda n: np.zeros(n, dtype=np.int64)  # noqa: E731

    # --- stage 1: orders ⋈ customer on custkey ---
    def cust_side(batch: pa.Table) -> pa.Table:
        ck = np.asarray(batch.column("c_custkey"), dtype=np.int64)
        nv = np.asarray(batch.column("c_nationkey"), dtype=np.int64)
        hit, _ = _lookup_hit(nats_sorted, nv)
        return _keyed(ck[hit], nv[hit], zeros(int(hit.sum())), 0)

    def orders_side(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
        keep = (od >= lo) & (od < hi)
        ck = np.asarray(batch.column("o_custkey"), dtype=np.int64)[keep]
        ok = np.asarray(batch.column("o_orderkey"), dtype=np.int64)[keep]
        return _keyed(ck, ok, zeros(len(ck)), 1)

    def join_cust(group: pa.Table) -> pa.Table:
        side = np.asarray(group.column("side"), dtype=np.int8)
        k = np.asarray(group.column("k"), dtype=np.int64)
        a = np.asarray(group.column("a"), dtype=np.int64)
        cm = side == 0
        ck, cn = k[cm], a[cm]
        six = np.argsort(ck, kind="stable")
        ck, cn = ck[six], cn[six]
        ok_cust, ok_key = k[~cm], a[~cm]
        hit, i = _lookup_hit(ck, ok_cust)
        # -> (orderkey, cust_nation) re-keyed on hash(orderkey)
        return _keyed(ok_key[hit], cn[i[hit]], zeros(int(hit.sum())), 0)

    oc = orders.map_batches(orders_side, batch_format="pyarrow").union(
        customer.map_batches(cust_side, batch_format="pyarrow")) \
        .groupby("pkey").map_groups(join_cust, batch_format="pyarrow")

    # --- stage 2: (orderkey, cnat) ⋈ lineitem on orderkey ---
    def li_side(batch: pa.Table) -> pa.Table:
        lk = np.asarray(batch.column("l_orderkey"), dtype=np.int64)
        sup = np.asarray(batch.column("l_suppkey"), dtype=np.int64)
        price_c = _money_ints(batch, "l_extendedprice", 100)
        disc_c = _money_ints(batch, "l_discount", 100)
        return _keyed(lk, sup, price_c * (100 - disc_c), 1)

    def join_order(group: pa.Table) -> pa.Table:
        side = np.asarray(group.column("side"), dtype=np.int8)
        k = np.asarray(group.column("k"), dtype=np.int64)
        a = np.asarray(group.column("a"), dtype=np.int64)
        b_ = np.asarray(group.column("b"), dtype=np.int64)
        om = side == 0
        ok, on = k[om], a[om]
        six = np.argsort(ok, kind="stable")
        ok, on = ok[six], on[six]
        lk, sup, rev = k[~om], a[~om], b_[~om]
        hit, i = _lookup_hit(ok, lk)
        sup, rev, cn = sup[hit], rev[hit], on[i[hit]]
        # pre-aggregate (suppkey, cnat) before the stage-3 shuffle
        key = sup * np.int64(nat_hi) + cn
        uk, inv = np.unique(key, return_inverse=True)
        sums = np.bincount(inv, weights=rev,
                           minlength=len(uk)).astype(np.int64)
        # -> (suppkey, cnat, rev) re-keyed on hash(suppkey)
        return _keyed(uk // nat_hi, uk % nat_hi, sums, 0)

    li_oc = oc.union(lineitem.map_batches(li_side, batch_format="pyarrow")) \
        .groupby("pkey").map_groups(join_order, batch_format="pyarrow")

    # --- stage 3: ⋈ supplier on suppkey, same-nation filter ---
    def supp_side(batch: pa.Table) -> pa.Table:
        sk = np.asarray(batch.column("s_suppkey"), dtype=np.int64)
        nv = np.asarray(batch.column("s_nationkey"), dtype=np.int64)
        hit, _ = _lookup_hit(nats_sorted, nv)
        return _keyed(sk[hit], nv[hit], zeros(int(hit.sum())), 1)

    def join_supp(group: pa.Table) -> pa.Table:
        side = np.asarray(group.column("side"), dtype=np.int8)
        k = np.asarray(group.column("k"), dtype=np.int64)
        a = np.asarray(group.column("a"), dtype=np.int64)
        b_ = np.asarray(group.column("b"), dtype=np.int64)
        sm = side == 1
        sk, sn = k[sm], a[sm]
        six = np.argsort(sk, kind="stable")
        sk, sn = sk[six], sn[six]
        lsup, cn, rev = k[~sm], a[~sm], b_[~sm]
        hit, i = _lookup_hit(sk, lsup)
        same = np.zeros(len(lsup), dtype=bool)
        same[hit] = sn[i[hit]] == cn[hit]
        nat = cn[same]
        sums = np.bincount(nat, weights=rev[same],
                           minlength=nat_hi).astype(np.int64)
        nz = np.flatnonzero(sums)
        return pa.table({
            "nat": pa.array(nz.astype(np.int64), type=pa.int64()),
            "rev": pa.array(sums[nz], type=pa.int64()),
            "gkey": pa.array(np.zeros(len(nz), dtype=np.int32),
                             type=pa.int32())})

    return li_oc.union(supplier.map_batches(supp_side,
                                            batch_format="pyarrow")) \
        .groupby("pkey").map_groups(join_supp, batch_format="pyarrow") \
        .groupby("gkey").map_groups(final, batch_format="pyarrow")


def regional_revenue_sql(region_name: str = "ASIA",
                         year: int = 1997) -> str:
    """DuckDB oracle for :func:`regional_revenue`."""
    return f"""
    SELECT n.n_name,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
               AS BIGINT) AS revenue_e4
    FROM customer c, orders o, lineitem l, supplier s, nation n, region r
    WHERE c.c_custkey = o.o_custkey
      AND l.l_orderkey = o.o_orderkey
      AND l.l_suppkey = s.s_suppkey
      AND c.c_nationkey = s.s_nationkey
      AND s.s_nationkey = n.n_nationkey
      AND n.n_regionkey = r.r_regionkey
      AND r.r_name = '{region_name}'
      AND o.o_orderdate >= TIMESTAMP '{year}-01-01'
      AND o.o_orderdate < TIMESTAMP '{year + 1}-01-01'
    GROUP BY n.n_name
    ORDER BY revenue_e4 DESC, n.n_name
"""


def top_revenue_orders_sql(segment: str = "BUILDING",
                           cutoff: str = "1997-06-30", k: int = 10) -> str:
    """DuckDB oracle for :func:`top_revenue_orders`."""
    return f"""
    SELECT l.l_orderkey,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
               AS BIGINT) AS revenue_e4,
           o.o_orderdate, o.o_orderpriority
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = '{segment}'
      AND o.o_orderdate < TIMESTAMP '{cutoff}'
      AND l.l_shipdate > TIMESTAMP '{cutoff}'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue_e4 DESC, l.l_orderkey
    LIMIT {k}
"""


def promo_revenue(lineitem: "ray.data.Dataset",
                  part: "ray.data.Dataset",
                  month: str = "1997-09",
                  promo_type: str = "PROMO",
                  method: str = "auto",
                  broadcast_max: int | None = None,
                  num_partitions: int = 64) -> "ray.data.Dataset":
    """TPC-H Q14 shape: promotion revenue share for one ship month —
    ``sum(rev where p_type = promo_type)`` vs total, both as exact
    1e-4 dollar units, plus the share in exact integer parts-per-
    million (``(2*10^6*promo + total) // (2*total)`` — round-half-up
    on the exact rational, no float division on either side).

    Join strategy (``method="auto"``): the promo part-key set (one
    int64 per promo part) broadcasts once via ``ray.put`` (capped at
    ``broadcast_max``, default ORDERS_BROADCAST_MAX keys), and the
    lineitem scan resolves promo membership map-side with
    ``searchsorted`` — each batch emits ONE partial row, the shuffle
    moves O(batches) rows.  Above the cap the attach switches to
    ``method="hashjoin"``: promo part keys and per-batch (partkey ->
    revenue) lineitem partials both pkey on hash(partkey) and meet in
    a per-partition membership join that emits one (promo, total)
    partial per partition — nothing materializes on the driver."""
    import ray

    if method not in ("auto", "broadcast", "hashjoin"):
        raise ValueError("unknown promo_revenue method %r" % method)
    if broadcast_max is None:
        broadcast_max = ORDERS_BROADCAST_MAX
    y, m = (int(x) for x in month.split("-"))
    lo = np.datetime64("%04d-%02d-01" % (y, m), "us")
    hi = np.datetime64("%04d-%02d-01" % ((y + 1, 1) if m == 12 else
                                         (y, m + 1)), "us")

    def final(group: pa.Table) -> pa.Table:
        promo = sum(group.column("promo_e4").to_pylist())  # Python ints:
        total = sum(group.column("total_e4").to_pylist())  # no overflow
        share = (2 * 10**6 * promo + total) // (2 * total) if total else 0
        return pa.table({
            "promo_revenue_e4": pa.array([promo], type=pa.int64()),
            "total_revenue_e4": pa.array([total], type=pa.int64()),
            "promo_share_ppm": pa.array([share], type=pa.int64())})

    promo_keys = None
    if method != "hashjoin":
        pk = []
        n_keys = 0
        over_cap = False
        for b in part.map_batches(
                lambda t: t.filter(pc.equal(t.column("p_type"), promo_type))
                .select(["p_partkey"]), batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow"):
            n_keys += b.num_rows
            if n_keys > broadcast_max:
                if method == "broadcast":
                    raise NotImplementedError(
                        "promo part-key side exceeds broadcast_max; "
                        "use method='hashjoin'")
                over_cap = True
                break
            pk.append(np.asarray(b.column("p_partkey"), dtype=np.int64))
        if not over_cap:
            promo_keys = np.sort(np.concatenate(pk)) if pk else \
                np.empty(0, dtype=np.int64)
    if promo_keys is None:
        return _promo_revenue_hashjoin(lineitem, part, promo_type, lo, hi,
                                       final, num_partitions)
    ref = ray.put(promo_keys)

    def partial(batch: pa.Table, ref=ref) -> pa.Table:
        import ray as _ray
        keys = _ray.get(ref)
        od = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        keep = (od >= lo) & (od < hi)
        if not keep.any():
            # one zero partial so the no-match corpus still yields the
            # oracle's single coalesce-0 row
            return pa.table({"promo_e4": pa.array([0], type=pa.int64()),
                             "total_e4": pa.array([0], type=pa.int64()),
                             "pkey": pa.array([0], type=pa.int32())})
        price_c = _money_ints(batch, "l_extendedprice", 100)[keep]
        disc_c = _money_ints(batch, "l_discount", 100)[keep]
        rev = price_c * (100 - disc_c)
        lp = np.asarray(batch.column("l_partkey"), dtype=np.int64)[keep]
        hit, _ = _lookup_hit(keys, lp)
        return pa.table({
            "promo_e4": pa.array([int(rev[hit].sum())], type=pa.int64()),
            "total_e4": pa.array([int(rev.sum())], type=pa.int64()),
            "pkey": pa.array([0], type=pa.int32())})

    return lineitem.map_batches(partial, batch_format="pyarrow") \
        .groupby("pkey").map_groups(final, batch_format="pyarrow")


def _promo_revenue_hashjoin(lineitem, part, promo_type, lo, hi, final,
                            num_partitions: int = 64):
    """Above-cap attach for :func:`promo_revenue`: both sides pkey on
    hash(partkey); each partition joins its promo-key slice against its
    lineitem revenue partials and emits ONE (promo, total) row.  Driver
    state: none."""
    from apollo_ray.hashing import mix_to_partition

    def _rows(k, rev, side):
        return pa.table({
            "k": pa.array(k, type=pa.int64()),
            "rev": pa.array(rev, type=pa.int64()),
            "side": pa.array(np.full(len(k), side, dtype=np.int8),
                             type=pa.int8()),
            "pkey": pa.array(mix_to_partition(
                np.asarray(k, dtype=np.int64), num_partitions),
                type=pa.int32()),
        })

    def part_side(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("p_type"), promo_type))
        k = np.asarray(t.column("p_partkey"), dtype=np.int64)
        return _rows(k, np.zeros(len(k), dtype=np.int64), 0)

    def li_side(batch: pa.Table) -> pa.Table:
        od = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        keep = (od >= lo) & (od < hi)
        if not keep.any():
            # one zero partial so a no-match corpus still folds to the
            # oracle's single coalesce-0 row
            return _rows(np.zeros(1, dtype=np.int64),
                         np.zeros(1, dtype=np.int64), 1)
        price_c = _money_ints(batch, "l_extendedprice", 100)[keep]
        disc_c = _money_ints(batch, "l_discount", 100)[keep]
        lp = np.asarray(batch.column("l_partkey"), dtype=np.int64)[keep]
        uk, inv = np.unique(lp, return_inverse=True)
        sums = np.bincount(inv, weights=price_c * (100 - disc_c),
                           minlength=len(uk)).astype(np.int64)
        return _rows(uk, sums, 1)

    def join_part(group: pa.Table) -> pa.Table:
        side = np.asarray(group.column("side"), dtype=np.int8)
        k = np.asarray(group.column("k"), dtype=np.int64)
        rev = np.asarray(group.column("rev"), dtype=np.int64)
        pm = side == 0
        li_k, li_rev = k[~pm], rev[~pm]
        total = int(li_rev.sum())
        keys = np.sort(k[pm])
        hit, _ = _lookup_hit(keys, li_k)
        return pa.table({
            "promo_e4": pa.array([int(li_rev[hit].sum())], type=pa.int64()),
            "total_e4": pa.array([total], type=pa.int64()),
            "gkey": pa.array([0], type=pa.int32())})

    both = part.map_batches(part_side, batch_format="pyarrow").union(
        lineitem.map_batches(li_side, batch_format="pyarrow"))
    return both.groupby("pkey").map_groups(join_part,
                                           batch_format="pyarrow") \
        .groupby("gkey").map_groups(final, batch_format="pyarrow")


def promo_revenue_sql(month: str = "1997-09",
                      promo_type: str = "PROMO") -> str:
    """DuckDB oracle for :func:`promo_revenue` (HUGEINT intermediates
    so the exact ppm rational never overflows)."""
    y, m = (int(x) for x in month.split("-"))
    y2, m2 = (y + 1, 1) if m == 12 else (y, m + 1)
    return f"""
    WITH rev AS (
      SELECT CAST(round(l.l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS e4,
             (p.p_type = '{promo_type}') AS is_promo
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate >= TIMESTAMP '{y:04d}-{m:02d}-01'
        AND l.l_shipdate <  TIMESTAMP '{y2:04d}-{m2:02d}-01')
    SELECT CAST(coalesce(sum(e4) FILTER (is_promo), 0) AS BIGINT)
               AS promo_revenue_e4,
           CAST(coalesce(sum(e4), 0) AS BIGINT) AS total_revenue_e4,
           CAST(CASE WHEN coalesce(sum(e4), 0) = 0 THEN 0
                ELSE (2000000 * CAST(coalesce(sum(e4) FILTER (is_promo),
                                              0) AS HUGEINT)
                      + CAST(sum(e4) AS HUGEINT))
                     // (2 * CAST(sum(e4) AS HUGEINT)) END AS BIGINT)
               AS promo_share_ppm
    FROM rev
"""


def _priority_fold(group: pa.Table) -> pa.Table:
    """Sum per-batch (priority, n) partials into final counts."""
    pri = np.asarray(group.column("o_orderpriority").to_pylist(),
                     dtype=object)
    n = np.asarray(group.column("n"), dtype=np.int64)
    uniq, inv = np.unique(pri, return_inverse=True)
    tot = np.bincount(inv, weights=n.astype(np.float64)).astype(np.int64)
    return pa.table({
        "o_orderpriority": pa.array(uniq.tolist(), type=pa.string()),
        "order_count": pa.array(tot, type=pa.int64())})


def _order_priority_hashjoin(orders, keys_ds, lo: int, hi: int,
                             num_partitions: int = 64):
    """Above-cap EXISTS attach for :func:`order_priority_counts`: the
    globally-distinct matching orderkeys and the in-``year`` orders both
    pkey on hash(orderkey); each partition resolves the semi-join with a
    sorted-membership test and emits bounded (priority, n) partials.
    Driver state: none — no side is ever collected or broadcast."""
    from apollo_ray.hashing import mix_to_partition

    def key_side(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch.column("k"), dtype=np.int64)
        return pa.table({
            "k": pa.array(k, type=pa.int64()),
            "pri": pa.array([""] * len(k), type=pa.string()),
            "side": pa.array(np.zeros(len(k), dtype=np.int8),
                             type=pa.int8()),
            "pkey": pa.array(mix_to_partition(k, num_partitions),
                             type=pa.int32())})

    def ord_side(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        t = batch.filter(pa.array((od >= lo) & (od < hi)))
        k = np.asarray(t.column("o_orderkey"), dtype=np.int64)
        return pa.table({
            "k": pa.array(k, type=pa.int64()),
            "pri": t.column("o_orderpriority").cast(pa.string()),
            "side": pa.array(np.ones(len(k), dtype=np.int8),
                             type=pa.int8()),
            "pkey": pa.array(mix_to_partition(k, num_partitions),
                             type=pa.int32())})

    def join_part(group: pa.Table) -> pa.Table:
        side = np.asarray(group.column("side"), dtype=np.int8)
        k = np.asarray(group.column("k"), dtype=np.int64)
        km = np.sort(k[side == 0])
        om = side == 1
        hit, _ = _lookup_hit(km, k[om])
        pri = np.asarray(group.column("pri").to_pylist(),
                         dtype=object)[om][hit]
        uniq, cnt = np.unique(pri, return_counts=True)
        return pa.table({
            "o_orderpriority": pa.array(uniq.tolist(), type=pa.string()),
            "n": pa.array(cnt, type=pa.int64())})

    both = keys_ds.map_batches(key_side, batch_format="pyarrow").union(
        orders.map_batches(ord_side, batch_format="pyarrow"))
    return both.groupby("pkey").map_groups(join_part,
                                           batch_format="pyarrow") \
        .groupby("o_orderpriority").map_groups(_priority_fold,
                                               batch_format="pyarrow")


def order_priority_counts(orders: "ray.data.Dataset",
                          lineitem: "ray.data.Dataset",
                          year: int = 1997,
                          flag: str = "R",
                          broadcast_max: int = ORDERS_BROADCAST_MAX,
                          method: str = "auto",
                          num_partitions: int = 64
                          ) -> "ray.data.Dataset":
    """TPC-H Q4 shape — the EXISTS semi-join: count ``year`` orders per
    priority that have AT LEAST ONE lineitem with
    ``l_returnflag = flag`` (the synthetic schema has no
    commit/receipt dates, so the returned-item flag stands in for
    Q4's late-delivery predicate; the join classes exercised — a
    distinct-key semi-join reduced map-side — are Q4's).

    Plan: lineitem scans once, emitting per-batch DISTINCT matching
    orderkeys (map-side dedup); one pkey pass completes the global
    distinct; the resulting key set broadcasts sorted (capped at
    ``broadcast_max`` — the Q3 attach rule) and orders resolves the
    EXISTS with a ``searchsorted`` membership test plus per-batch
    per-priority partials.  Neither fact table enters a shuffle; the
    only all-to-all is the distinct-orderkey metadata pass.  Above
    ``broadcast_max`` distinct keys (or with ``method="hashjoin"``)
    the attach runs as a pkey hash semi-join instead
    (:func:`_order_priority_hashjoin`); ``method="broadcast"`` keeps
    the declared raise.
    """
    import ray

    from apollo_ray.hashing import mix_to_partition

    def matching_keys(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch.column("l_returnflag"), flag)
        k = np.unique(np.asarray(batch.filter(m).column("l_orderkey"),
                                 dtype=np.int64))
        return pa.table({
            "k": pa.array(k, type=pa.int64()),
            "pkey": pa.array(mix_to_partition(k, num_partitions),
                             type=pa.int32())})

    def distinct_part(group: pa.Table) -> pa.Table:
        k = np.unique(np.asarray(group.column("k"), dtype=np.int64))
        return pa.table({"k": pa.array(k, type=pa.int64())})

    keys_ds = lineitem.map_batches(matching_keys, batch_format="pyarrow") \
        .groupby("pkey").map_groups(distinct_part, batch_format="pyarrow") \
        .materialize()   # consumed 2x below (count + pull/semi-join);
    # lazy would re-scan lineitem per consumer
    lo = np.datetime64(f"{year}-01-01", "us").astype(np.int64)
    hi = np.datetime64(f"{year + 1}-01-01", "us").astype(np.int64)
    if method == "hashjoin":
        return _order_priority_hashjoin(orders, keys_ds, lo, hi,
                                        num_partitions)
    n_keys = keys_ds.count()
    if n_keys > broadcast_max:
        if method == "broadcast":
            raise NotImplementedError(
                "matching-orderkey set (%d) above broadcast cap %d: "
                "use method='hashjoin'/'auto' (pkey hash semi-join)"
                % (n_keys, broadcast_max))
        return _order_priority_hashjoin(orders, keys_ds, lo, hi,
                                        num_partitions)
    if n_keys == 0:
        sorted_keys = np.empty(0, dtype=np.int64)
    else:
        parts = [np.asarray(b.column("k"), dtype=np.int64)
                 for b in keys_ds.iter_batches(batch_format="pyarrow")
                 if b.num_rows]
        sorted_keys = np.sort(np.concatenate(parts))
    keys_ref = ray.put(sorted_keys)

    def partials(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        od = batch.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        in_year = (od >= lo) & (od < hi)
        ok = np.asarray(batch.column("o_orderkey"), dtype=np.int64)
        pos = np.searchsorted(ks, ok)
        exists = np.zeros(len(ok), dtype=bool)
        if len(ks):
            inb = pos < len(ks)
            exists[inb] = ks[pos[inb]] == ok[inb]
        keep = in_year & exists
        if not keep.any():
            return pa.table({"o_orderpriority": pa.array([],
                                                         type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        pri = np.asarray(batch.column("o_orderpriority").to_pylist(),
                         dtype=object)[keep]
        uniq, cnt = np.unique(pri, return_counts=True)
        return pa.table({
            "o_orderpriority": pa.array(uniq.tolist(), type=pa.string()),
            "n": pa.array(cnt, type=pa.int64())})

    parts = orders.map_batches(partials, batch_format="pyarrow")
    # <= priorities x batches partial rows: bounded-cardinality fold
    return parts.groupby("o_orderpriority").map_groups(
        _priority_fold, batch_format="pyarrow")


def order_priority_counts_sql(year: int = 1997, flag: str = "R") -> str:
    return f"""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '{year}-01-01'
      AND o.o_orderdate < TIMESTAMP '{year + 1}-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = '{flag}')
    GROUP BY o_orderpriority
    """


def customer_order_dist(customer: "ray.data.Dataset",
                        orders: "ray.data.Dataset",
                        num_partitions: int = 64) -> "ray.data.Dataset":
    """TPC-H Q13 shape — the OUTER-join histogram: distribution of
    customers by order count, INCLUDING zero-order customers (the
    rows an inner join would silently drop).

    Plan: orders emits per-batch (custkey, n) partials; one pkey pass
    completes per-customer totals; customer keys take the same pkey
    shuffle (16-byte rows) so each partition holds a customer's key
    AND its complete count — the left-outer zero-fill is a local
    searchsorted, never a driver collect.  Per-partition histogram
    partials (count-of-counts) then fold to <= distinct-counts rows.
    """
    from apollo_ray.hashing import mix_to_partition

    def order_partials(batch: pa.Table) -> pa.Table:
        ck = np.asarray(batch.column("o_custkey"), dtype=np.int64)
        uniq, cnt = np.unique(ck, return_counts=True)
        return pa.table({
            "k": pa.array(uniq, type=pa.int64()),
            "n": pa.array(cnt, type=pa.int64()),
            "side": pa.array(np.zeros(len(uniq), dtype=np.int8)),
            "pkey": pa.array(mix_to_partition(uniq, num_partitions),
                             type=pa.int32())})

    def customer_keys(batch: pa.Table) -> pa.Table:
        ck = np.asarray(batch.column("c_custkey"), dtype=np.int64)
        return pa.table({
            "k": pa.array(ck, type=pa.int64()),
            "n": pa.array(np.zeros(len(ck), dtype=np.int64)),
            "side": pa.array(np.ones(len(ck), dtype=np.int8)),
            "pkey": pa.array(mix_to_partition(ck, num_partitions),
                             type=pa.int32())})

    rows = orders.map_batches(order_partials, batch_format="pyarrow") \
        .union(customer.map_batches(customer_keys, batch_format="pyarrow"))

    def hist_part(group: pa.Table) -> pa.Table:
        empty = pa.table({"c_count": pa.array([], type=pa.int64()),
                          "custdist": pa.array([], type=pa.int64())})
        if group.num_rows == 0:
            return empty
        k = np.asarray(group.column("k"), dtype=np.int64)
        n = np.asarray(group.column("n"), dtype=np.int64)
        side = np.asarray(group.column("side"), dtype=np.int8)
        cust = np.unique(k[side == 1])
        if len(cust) == 0:
            return empty
        ok = k[side == 0]
        on = n[side == 0]
        # per-customer totals; orders referencing unknown custkeys are
        # dropped by the membership test (matches the SQL LEFT JOIN
        # FROM customer)
        pos = np.searchsorted(cust, ok)
        inb = pos < len(cust)
        inb[inb] &= cust[pos[inb]] == ok[inb]
        tot = np.zeros(len(cust), dtype=np.int64)
        np.add.at(tot, pos[inb], on[inb])
        cnt_vals, cnt_n = np.unique(tot, return_counts=True)
        return pa.table({
            "c_count": pa.array(cnt_vals, type=pa.int64()),
            "custdist": pa.array(cnt_n, type=pa.int64())})

    parts = rows.groupby("pkey").map_groups(hist_part,
                                            batch_format="pyarrow")

    def fold(group: pa.Table) -> pa.Table:
        c = np.asarray(group.column("c_count"), dtype=np.int64)
        n = np.asarray(group.column("custdist"), dtype=np.int64)
        uniq, inv = np.unique(c, return_inverse=True)
        tot = np.bincount(inv, weights=n.astype(np.float64)).astype(np.int64)
        return pa.table({"c_count": pa.array(uniq, type=pa.int64()),
                         "custdist": pa.array(tot, type=pa.int64())})

    # bounded cardinality: one group per distinct order count
    return parts.groupby("c_count").map_groups(fold,
                                               batch_format="pyarrow")


CUSTOMER_ORDER_DIST_SQL = """
    WITH per_cust AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey)
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(count(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY c_count
"""
