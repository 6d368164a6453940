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
    assert int(got["revenue_e4"][0]) == int(exp["revenue_e4"][0])
    assert int(got["revenue_e4"][0]) > 0  # fixture spans 1997

    # empty discount band: engine now matches DuckDB's NULL-on-empty
    got0 = forecast_revenue(ray.data.from_arrow(t),
                            year=2050).to_pandas()
    assert len(got0) == 1 and got0["revenue_e4"].isna().all()


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

    # hash-join attach path (above-broadcast-cap regime): same answer
    from apollo_ray.functions.analytics import top_revenue_orders as tro
    hj = tro(ray.data.from_arrow(li), ray.data.from_arrow(orders),
             ray.data.from_arrow(customer), cutoff="1996-06-30", k=5,
             method="hashjoin").to_pandas()
    assert hj["l_orderkey"].tolist() == exp["l_orderkey"].tolist()
    assert hj["revenue_e4"].astype(int).tolist() == \
        exp["revenue_e4"].astype(int).tolist()
    assert hj["o_orderdate"].tolist() == got["o_orderdate"].tolist()
    assert hj["o_orderpriority"].tolist() == \
        exp["o_orderpriority"].tolist()

    # auto mode falls back to hashjoin when the filtered side > cap
    auto = tro(ray.data.from_arrow(li), ray.data.from_arrow(orders),
               ray.data.from_arrow(customer), cutoff="1996-06-30", k=5,
               method="auto", broadcast_max=2).to_pandas()
    assert auto["l_orderkey"].tolist() == exp["l_orderkey"].tolist()


def _tpch_star(seed=23, n_li=500, n_ord=80, n_cust=25, n_supp=12):
    """Small TPC-H star fixture incl. nation/region, matching the
    driver's table schemas (int32 dimension keys)."""
    rng = np.random.default_rng(seed)
    li = _lineitem(n_li, seed=seed)
    li = li.append_column("l_orderkey", pa.array(
        rng.integers(1, n_ord + 1, size=n_li).astype(np.int64)))
    li = li.append_column("l_suppkey", pa.array(
        rng.integers(1, n_supp + 1, size=n_li).astype(np.int64)))
    base = np.datetime64("1995-06-01", "us")
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(1, n_ord + 1, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(1, n_cust + 1, size=n_ord)
                              .astype(np.int64)),
        "o_orderdate": pa.array(base + rng.integers(0, 1200, size=n_ord)
                                * np.timedelta64(86400_000_000, "us")),
        "o_orderpriority": pa.array(rng.choice(["1-URGENT", "3-MEDIUM"],
                                               size=n_ord)),
    })
    customer = pa.table({
        "c_custkey": pa.array(np.arange(1, n_cust + 1, dtype=np.int64)),
        "c_nationkey": pa.array(rng.integers(0, 6, size=n_cust)
                                .astype(np.int32)),
        "c_mktsegment": pa.array(rng.choice(["BUILDING", "MACHINERY"],
                                            size=n_cust)),
    })
    supplier = pa.table({
        "s_suppkey": pa.array(np.arange(1, n_supp + 1, dtype=np.int64)),
        "s_nationkey": pa.array(rng.integers(0, 6, size=n_supp)
                                .astype(np.int32)),
    })
    nation = pa.table({
        "n_nationkey": pa.array(np.arange(6, dtype=np.int32)),
        "n_name": pa.array(["NATION_%d" % i for i in range(6)]),
        "n_regionkey": pa.array(np.array([0, 0, 1, 1, 2, 2],
                                         dtype=np.int32)),
    })
    region = pa.table({
        "r_regionkey": pa.array(np.arange(3, dtype=np.int32)),
        "r_name": pa.array(["ASIA", "EUROPE", "AFRICA"]),
    })
    return li, orders, customer, supplier, nation, region


def test_regional_revenue_matches_duckdb(ray_session):
    import duckdb
    import ray.data
    from apollo_ray.functions.analytics import (regional_revenue,
                                                regional_revenue_sql)
    li, orders, customer, supplier, nation, region = _tpch_star()
    got = regional_revenue(
        ray.data.from_arrow(li), ray.data.from_arrow(orders),
        ray.data.from_arrow(customer), ray.data.from_arrow(supplier),
        ray.data.from_arrow(nation), ray.data.from_arrow(region),
        region_name="ASIA", year=1996).to_pandas()
    con = duckdb.connect()
    for name, t in [("lineitem", li), ("orders", orders),
                    ("customer", customer), ("supplier", supplier),
                    ("nation", nation), ("region", region)]:
        con.register(name, t.to_pandas())
    exp = con.execute(regional_revenue_sql("ASIA", 1996)).df()
    assert len(got) > 0  # fixture must exercise the join
    assert got["n_name"].tolist() == exp["n_name"].tolist()
    assert got["revenue_e4"].astype(int).tolist() == \
        exp["revenue_e4"].astype(int).tolist()

    # fully distributed hash-join attach (above-broadcast-cap regime):
    # same answer, forced directly and via the auto fallback
    for kw in ({"method": "hashjoin"},
               {"method": "auto", "broadcast_max": 2}):
        hj = regional_revenue(
            ray.data.from_arrow(li), ray.data.from_arrow(orders),
            ray.data.from_arrow(customer), ray.data.from_arrow(supplier),
            ray.data.from_arrow(nation), ray.data.from_arrow(region),
            region_name="ASIA", year=1996, num_partitions=8,
            **kw).to_pandas()
        assert hj["n_name"].tolist() == exp["n_name"].tolist(), kw
        assert hj["revenue_e4"].astype(int).tolist() == \
            exp["revenue_e4"].astype(int).tolist(), kw

    # method="broadcast" above the cap keeps the declared boundary
    import pytest
    with pytest.raises(NotImplementedError):
        regional_revenue(
            ray.data.from_arrow(li), ray.data.from_arrow(orders),
            ray.data.from_arrow(customer), ray.data.from_arrow(supplier),
            ray.data.from_arrow(nation), ray.data.from_arrow(region),
            region_name="ASIA", year=1996, method="broadcast",
            broadcast_max=2).to_pandas()


def test_regional_revenue_empty_region(ray_session):
    import ray.data
    from apollo_ray.functions.analytics import regional_revenue
    li, orders, customer, supplier, nation, region = _tpch_star(seed=5)
    ds = regional_revenue(
        ray.data.from_arrow(li), ray.data.from_arrow(orders),
        ray.data.from_arrow(customer), ray.data.from_arrow(supplier),
        ray.data.from_arrow(nation), ray.data.from_arrow(region),
        region_name="NOWHERE", year=1996)
    assert ds.count() == 0
    assert ds.schema().names == ["n_name", "revenue_e4"]


def test_promo_revenue_matches_duckdb(ray_session):
    import duckdb
    import ray.data
    from apollo_ray.functions.analytics import (promo_revenue,
                                                promo_revenue_sql)
    rng = np.random.default_rng(41)
    n_li, n_part = 600, 40
    li = _lineitem(n_li, seed=41)
    li = li.append_column("l_partkey", pa.array(
        rng.integers(0, n_part, size=n_li).astype(np.int64)))
    part = pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_type": pa.array(rng.choice(["PROMO", "ECONOMY", "STANDARD"],
                                      size=n_part)),
    })
    # fixture ships 1995-01-01 + [0, 2000) days; pick a month inside
    got = promo_revenue(ray.data.from_arrow(li), ray.data.from_arrow(part),
                        month="1996-07").to_pandas()
    con = duckdb.connect()
    con.register("lineitem", li.to_pandas())
    con.register("part", part.to_pandas())
    exp = con.execute(promo_revenue_sql(month="1996-07")).df()
    assert int(got["total_revenue_e4"][0]) > 0
    for c in ("promo_revenue_e4", "total_revenue_e4", "promo_share_ppm"):
        assert int(got[c][0]) == int(exp[c][0]), c

    # no-match month: engine emits the oracle's single all-zero row
    got0 = promo_revenue(ray.data.from_arrow(li),
                         ray.data.from_arrow(part),
                         month="2010-01").to_pandas()
    exp0 = con.execute(promo_revenue_sql(month="2010-01")).df()
    assert len(got0) == len(exp0) == 1
    for c in ("promo_revenue_e4", "total_revenue_e4", "promo_share_ppm"):
        assert int(got0[c][0]) == int(exp0[c][0]) == 0, c

    # partkey hash-join attach (above-broadcast-cap regime): same
    # answer, forced directly and via the auto fallback; and the
    # no-match month still folds to the single all-zero row
    for kw in ({"method": "hashjoin"},
               {"method": "auto", "broadcast_max": 2}):
        hj = promo_revenue(ray.data.from_arrow(li),
                           ray.data.from_arrow(part),
                           month="1996-07", num_partitions=8,
                           **kw).to_pandas()
        for c in ("promo_revenue_e4", "total_revenue_e4",
                  "promo_share_ppm"):
            assert int(hj[c][0]) == int(exp[c][0]), (c, kw)
    hj0 = promo_revenue(ray.data.from_arrow(li), ray.data.from_arrow(part),
                        month="2010-01", method="hashjoin",
                        num_partitions=8).to_pandas()
    assert len(hj0) == 1
    for c in ("promo_revenue_e4", "total_revenue_e4", "promo_share_ppm"):
        assert int(hj0[c][0]) == 0, c
    import pytest
    with pytest.raises(NotImplementedError):
        promo_revenue(ray.data.from_arrow(li), ray.data.from_arrow(part),
                      month="1996-07", method="broadcast",
                      broadcast_max=2).to_pandas()


def test_order_priority_counts(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from apollo_ray.functions.analytics import order_priority_counts
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], type=pa.int64()),
        "o_orderdate": pa.array(
            [np.datetime64("1997-03-01", "us")] * 3
            + [np.datetime64("1996-03-01", "us")], type=pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT", "2-HIGH",
                                     "1-URGENT"]),
    })
    li = pa.table({
        "l_orderkey": pa.array([1, 1, 2, 4], type=pa.int64()),
        "l_returnflag": pa.array(["R", "N", "N", "R"]),
    })
    df = order_priority_counts(rd.from_arrow(orders), rd.from_arrow(li)) \
        .to_pandas().set_index("o_orderpriority")
    # order 1: returned lineitem + in 1997 -> counted; order 2: no R;
    # order 3: no lineitems; order 4: R but 1996
    assert df["order_count"].to_dict() == {"1-URGENT": 1}


def test_order_priority_counts_cap(ray_session):
    import numpy as np
    import pyarrow as pa
    import pytest as _pytest
    import ray.data as rd
    from apollo_ray.functions.analytics import order_priority_counts
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], type=pa.int64()),
        "o_orderdate": pa.array(
            [np.datetime64("1997-03-01", "us")] * 3
            + [np.datetime64("1996-03-01", "us")], type=pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT", "2-HIGH",
                                     "1-URGENT"]),
    })
    li = pa.table({
        "l_orderkey": pa.array([1, 1, 2, 4], type=pa.int64()),
        "l_returnflag": pa.array(["R", "N", "N", "R"]),
    })
    # pkey hash semi-join (above-broadcast-cap regime): same answer as
    # the broadcast path, forced directly and via the auto fallback
    for kw in ({"method": "hashjoin"},
               {"method": "auto", "broadcast_max": 1}):
        df = order_priority_counts(rd.from_arrow(orders),
                                   rd.from_arrow(li),
                                   num_partitions=4, **kw) \
            .to_pandas().set_index("o_orderpriority")
        assert df["order_count"].to_dict() == {"1-URGENT": 1}, kw
    with _pytest.raises(NotImplementedError, match="broadcast cap"):
        order_priority_counts(rd.from_arrow(orders), rd.from_arrow(li),
                              method="broadcast", broadcast_max=1)


def test_customer_order_dist(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from apollo_ray.functions.analytics import customer_order_dist
    customer = pa.table({"c_custkey": pa.array([1, 2, 3, 4],
                                               type=pa.int64())})
    orders = pa.table({"o_custkey": pa.array([1, 1, 1, 2, 9],
                                             type=pa.int64())})
    df = customer_order_dist(rd.from_arrow(customer),
                             rd.from_arrow(orders)).to_pandas() \
        .set_index("c_count")["custdist"]
    # cust 1 -> 3 orders; cust 2 -> 1; custs 3, 4 -> 0; order for
    # unknown cust 9 dropped (LEFT JOIN FROM customer)
    assert df.to_dict() == {0: 2, 1: 1, 3: 1}
