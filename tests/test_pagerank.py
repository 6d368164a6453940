"""host_pagerank — integer-exact PageRank over the host link graph:
engine == SQL oracle on both the driver and distributed paths,
self-loop / relative-link drops, and degenerate inputs.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from apollo_ray.functions.urls import host_pagerank, host_pagerank_sql


def _pages(n=200):
    ids = np.arange(n, dtype=np.int64)
    urls = ["http://h%d.test/%d" % (i % 97, i) for i in ids]
    texts = []
    for i in ids:
        t = "some words doc %d" % i
        t += ' <a href="http://h%d.test/x">a</a>' % ((i * 31 + 7) % 97)
        if i % 3 == 0:
            t += ' <a href="HTTP://H%d.Test:80/y">b</a>' % ((i * 17 + 3) % 97)
        if i % 5 == 0:
            t += ' <a href="/rel/z">c</a>'
        texts.append(t)
    return pa.table({"doc_id": pa.array(ids),
                     "url": pa.array(urls),
                     "text": pa.array(texts)})


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("host").reset_index(drop=True) \
        .astype({"rank_ppm": "int64"})


def _oracle(t: pa.Table, **kw) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    df = con.execute(host_pagerank_sql(**kw)).fetchdf()
    con.close()
    return _canon(df)


def test_driver_matches_oracle(ray_session):
    import ray.data
    t = _pages()
    got = _canon(host_pagerank(ray.data.from_arrow(t),
                               method="driver").to_pandas())
    exp = _oracle(t)
    assert len(got) == 97
    assert got.equals(exp)
    # ranks moved off the uniform start and total mass is sane
    assert got["rank_ppm"].nunique() > 10
    assert got["rank_ppm"].min() >= 150_000


def test_distributed_matches_driver(ray_session):
    import ray.data
    t = _pages(n=150)
    a = _canon(host_pagerank(ray.data.from_arrow(t),
                             method="driver").to_pandas())
    b = _canon(host_pagerank(ray.data.from_arrow(t), method="distributed",
                             num_partitions=4).to_pandas())
    assert a.equals(b)


def test_self_loops_and_relative_links_dropped(ray_session):
    import ray.data
    t = pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "url": pa.array(["http://a.test/0", "http://b.test/1"]),
        "text": pa.array([
            'x <a href="http://a.test/self">s</a>'     # self loop
            ' <a href="/rel">r</a>'                    # relative
            ' <a href="http://b.test/p">y</a>',
            'y <a href="http://a.test/q">z</a>']),
    })
    got = _canon(host_pagerank(ray.data.from_arrow(t)).to_pandas())
    exp = _oracle(t)
    assert got.equals(exp)
    assert got["host"].tolist() == ["a.test", "b.test"]
    # 2-cycle a<->b with damping d: symmetric, r = 1e6 exactly each round
    assert got["rank_ppm"].tolist() == [1_000_000, 1_000_000]


def test_no_links_returns_empty(ray_session):
    import ray.data
    t = pa.table({"doc_id": pa.array([0], type=pa.int64()),
                  "url": pa.array(["http://a.test/0"]),
                  "text": pa.array(["no links at all"])})
    got = host_pagerank(ray.data.from_arrow(t))
    assert got.count() == 0
    assert _oracle(t).empty


def test_iters_and_damping_parameterized(ray_session):
    import ray.data
    t = _pages(n=60)
    got = _canon(host_pagerank(ray.data.from_arrow(t), damping_ppm=500_000,
                               iters=5).to_pandas())
    exp = _oracle(t, damping_ppm=500_000, iters=5)
    assert got.equals(exp)
