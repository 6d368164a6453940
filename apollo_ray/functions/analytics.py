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
                         "pkey": pa.array([0], type=pa.int32())})

    def final(group: pa.Table) -> pa.Table:
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
                       k: int = 10) -> "ray.data.Dataset":
    """TPC-H Q3 shape: the ``k`` unshipped-revenue-richest orders of a
    market segment — ``sum(extendedprice * (1 - discount))`` (exact
    1e-4 dollar units) over line items shipped after ``cutoff`` whose
    order was placed before it by a ``segment`` customer.

    Join strategy (the broadcast-small-sides discipline): the segment
    customer keys (|customer| << |lineitem|) filter the orders scan,
    and the filtered orders metadata broadcasts once via ``ray.put``
    (capped at ORDERS_BROADCAST_MAX rows) so the big lineitem table is
    matched with a map-side ``searchsorted`` — no all-to-all join.
    Per-order revenue partials shuffle on hash(orderkey); a two-level
    top-k (per-partition candidates, tiny final merge) returns <= k
    rows ordered by (revenue DESC, orderkey ASC)."""
    import ray

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
        i = np.searchsorted(seg_arr, ck)
        hit = (i < len(seg_arr))
        hit[hit] &= seg_arr[i[hit]] == ck[hit]
        return batch.filter(pa.array(keep & hit)) \
            .select(["o_orderkey", "o_orderdate", "o_orderpriority"])

    ord_keys, ord_dates, ord_prio = [], [], []
    filt = orders.map_batches(order_filter, batch_format="pyarrow")
    n_orders = 0
    for b in filt.iter_batches(batch_format="pyarrow"):
        n_orders += b.num_rows
        if n_orders > ORDERS_BROADCAST_MAX:
            raise NotImplementedError(
                "filtered orders side exceeds ORDERS_BROADCAST_MAX; "
                "switch to the hash-join attach path")
        ord_keys.append(np.asarray(b.column("o_orderkey"), dtype=np.int64))
        ord_dates.append(b.column("o_orderdate").to_numpy(
            zero_copy_only=False))
        ord_prio.extend(b.column("o_orderpriority").to_pylist())
    empty_out = pa.table({
        "l_orderkey": pa.array([], type=pa.int64()),
        "revenue_e4": pa.array([], type=pa.int64()),
        "o_orderdate": pa.array([], type=pa.timestamp("us")),
        "o_orderpriority": pa.array([], type=pa.string())})
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
