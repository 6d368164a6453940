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
