"""TPC-H-style lineitem aggregates (integer-exact money units)."""

import numpy as np
import pyarrow as pa


def _lineitem(n=200, seed=3):
    rng = np.random.default_rng(seed)
    days = rng.integers(0, 2000, size=n)
    base = np.datetime64("1995-01-01", "us")
    return pa.table({
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], size=n)),
        "l_linestatus": pa.array(rng.choice(["F", "O"], size=n)),
        "l_quantity": pa.array(rng.integers(1, 51, size=n)
                               .astype(np.float64)),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(100, 90000, size=n), 2)),
        "l_discount": pa.array(rng.integers(0, 11, size=n) / 100.0),
        "l_tax": pa.array(rng.integers(0, 9, size=n) / 100.0),
        "l_shipdate": pa.array(base + days * np.timedelta64(86400_000_000,
                                                            "us")),
    })


def test_pricing_summary_matches_duckdb(ray_session):
    import duckdb
    import ray.data
    from apollo_ray.functions.analytics import (PRICING_SUMMARY_SQL,
                                                pricing_summary)
    t = _lineitem()
    got = pricing_summary(ray.data.from_arrow(t), num_partitions=3) \
        .to_pandas().sort_values(["l_returnflag", "l_linestatus"]) \
        .reset_index(drop=True)
    con = duckdb.connect()
    con.register("lineitem", t.to_pandas())
    exp = con.execute(PRICING_SUMMARY_SQL).df() \
        .sort_values(["l_returnflag", "l_linestatus"]) \
        .reset_index(drop=True)
    for c in exp.columns:
        assert got[c].tolist() == exp[c].tolist(), c


def test_forecast_revenue_matches_duckdb(ray_session):
    import duckdb
    import ray.data
    from apollo_ray.functions.analytics import (FORECAST_REVENUE_SQL,
                                                forecast_revenue)
    t = _lineitem(seed=7)
    got = forecast_revenue(ray.data.from_arrow(t)).to_pandas()
    con = duckdb.connect()
    con.register("lineitem", t.to_pandas())
    exp = con.execute(FORECAST_REVENUE_SQL).df()
    # DuckDB sum over an empty filter set is NULL; engine emits 0
    e = exp["revenue_e4"][0]
    assert int(got["revenue_e4"][0]) == (0 if e is None or
                                         np.isnan(e) else int(e))
    assert int(got["revenue_e4"][0]) > 0  # fixture spans 1997


def test_top_revenue_orders_matches_duckdb(ray_session):
    import duckdb
    import ray.data
    from apollo_ray.functions.analytics import (top_revenue_orders,
                                                top_revenue_orders_sql)
    rng = np.random.default_rng(17)
    li = _lineitem(400, seed=17)
    n_ord = 60
    okeys = rng.integers(1, n_ord + 1, size=400)
    li = li.set_column(0, "l_returnflag", li.column("l_returnflag"))
    li = li.append_column("l_orderkey",
                          pa.array(okeys.astype(np.int64), type=pa.int64()))
    base = np.datetime64("1995-06-01", "us")
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(1, n_ord + 1, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(1, 20, size=n_ord)
                              .astype(np.int64)),
        "o_orderdate": pa.array(base + rng.integers(0, 900, size=n_ord)
                                * np.timedelta64(86400_000_000, "us")),
        "o_orderpriority": pa.array(rng.choice(["1-URGENT", "3-MEDIUM"],
                                               size=n_ord)),
    })
    customer = pa.table({
        "c_custkey": pa.array(np.arange(1, 20, dtype=np.int64)),
        "c_mktsegment": pa.array(rng.choice(["BUILDING", "MACHINERY"],
                                            size=19)),
    })
    got = top_revenue_orders(ray.data.from_arrow(li),
                             ray.data.from_arrow(orders),
                             ray.data.from_arrow(customer),
                             cutoff="1996-06-30", k=5).to_pandas()
    con = duckdb.connect()
    con.register("lineitem", li.to_pandas())
    con.register("orders", orders.to_pandas())
    con.register("customer", customer.to_pandas())
    exp = con.execute(top_revenue_orders_sql(cutoff="1996-06-30", k=5)).df()
    assert got["l_orderkey"].tolist() == exp["l_orderkey"].tolist()
    assert got["revenue_e4"].astype(int).tolist() == \
        exp["revenue_e4"].astype(int).tolist()
    assert got["o_orderpriority"].tolist() == \
        exp["o_orderpriority"].tolist()
