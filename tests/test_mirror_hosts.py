"""mirror_hosts — host pairs sharing identical documents: engine ==
SQL oracle, the distinct-host cap, min_shared band, and dedup of
repeated (text, host) postings."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from apollo_ray.functions.urls import mirror_hosts, mirror_hosts_sql


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["host_a", "host_b"]).reset_index(drop=True) \
        .astype({"n_shared": "int64"})


def _oracle(t: pa.Table, **kw) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    df = con.execute(mirror_hosts_sql(**kw)).fetchdf()
    con.close()
    return _canon(df)


def _pages():
    rows = [
        # a/b share texts T1 and T2 (mirror pair, n_shared=2)
        ("http://a.test/1", "T1 words here"),
        ("http://b.test/1", "T1 words here"),
        ("http://a.test/2", "T2 other words"),
        ("http://B.Test:80/2", "T2 other words"),   # messy spelling of b
        # a/c share only T1 -> below min_shared=2
        ("http://c.test/1", "T1 words here"),
        # boilerplate text served by 5 hosts -> over cap when cap=4
        *[("http://h%d.test/x" % i, "COPYRIGHT footer") for i in range(5)],
        # same (text, host) twice: posting must dedup, not double-count
        ("http://a.test/dup", "T2 other words"),
        # relative url: dropped
        ("/rel/only", "T1 words here"),
    ]
    return pa.table({
        "doc_id": pa.array(np.arange(len(rows), dtype=np.int64)),
        "url": pa.array([r[0] for r in rows]),
        "text": pa.array([r[1] for r in rows])})


def _run(t: pa.Table, **kw) -> pd.DataFrame:
    import ray.data
    return _canon(mirror_hosts(ray.data.from_arrow(t),
                               num_partitions=4, **kw).to_pandas())


def test_mirror_pairs_match_oracle(ray_session):
    t = _pages()
    got = _run(t, min_shared=2, max_hosts_per_text=4)
    exp = _oracle(t, min_shared=2, max_hosts_per_text=4)
    assert got.equals(exp)
    # exactly the planted mirror pair, counted once per distinct text
    assert got.to_dict("records") == [
        {"host_a": "a.test", "host_b": "b.test", "n_shared": 2}]


def test_min_shared_one_matches_oracle(ray_session):
    t = _pages()
    got = _run(t, min_shared=1, max_hosts_per_text=4)
    exp = _oracle(t, min_shared=1, max_hosts_per_text=4)
    assert got.equals(exp)
    # a-c pair now appears (T1 shared once); boilerplate still capped
    pairs = set(map(tuple, got[["host_a", "host_b"]].to_numpy()))
    assert ("a.test", "c.test") in pairs
    assert not any("h0.test" in p for p in pairs)


def test_cap_admits_boilerplate_when_raised(ray_session):
    t = _pages()
    got = _run(t, min_shared=1, max_hosts_per_text=64)
    exp = _oracle(t, min_shared=1, max_hosts_per_text=64)
    assert got.equals(exp)
    # 5 boilerplate hosts -> C(5,2) = 10 extra pairs present
    assert any("h0.test" == a for a in got["host_a"])


def test_random_corpus_matches_oracle(ray_session):
    rng = np.random.default_rng(5)
    n = 300
    texts = ["text %d" % rng.integers(0, 60) for _ in range(n)]
    urls = ["http://m%d.test/%d" % (rng.integers(0, 12), i)
            for i in range(n)]
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                  "url": pa.array(urls), "text": pa.array(texts)})
    got = _run(t, min_shared=2, max_hosts_per_text=64)
    exp = _oracle(t, min_shared=2, max_hosts_per_text=64)
    assert got.equals(exp)
    assert len(got) > 0
