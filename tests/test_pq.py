"""pq_encode — product-quantization codebook training + encode:
engine == SQL oracle (integer Lloyd, truncating division, empty-
codeword carry-over), reconstruction sanity, and degenerate inputs."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from apollo_ray.functions.ann import _trunc_div, pq_encode, pq_encode_sql


def _emb(n=200, d=16, seed=7):
    rng = np.random.default_rng(seed)
    vecs = (rng.standard_normal((n, d)) * 0.3).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32()))})


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["vec_id", "subspace"]).reset_index(drop=True) \
        .astype("int64")


def _oracle(t: pa.Table, **kw) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("embeddings", t.to_pandas())
    df = con.execute(pq_encode_sql(**kw)).fetchdf()
    con.close()
    return _canon(df)


def _run(t: pa.Table, **kw) -> pd.DataFrame:
    import ray.data
    return _canon(pq_encode(ray.data.from_arrow(t), **kw).to_pandas())


def test_pq_matches_oracle(ray_session):
    t = _emb()
    got = _run(t, m=4, k=8, iters=2)
    exp = _oracle(t, m=4, k=8, iters=2, dim=16)
    assert len(got) == 200 * 4
    assert got.equals(exp[got.columns.tolist()])
    assert set(got["code"].unique()) <= set(range(8))


def test_pq_zero_iters_is_seed_assignment(ray_session):
    """iters=0: codes are nearest-seed-subvector assignments."""
    t = _emb(n=50, d=8, seed=1)
    got = _run(t, m=2, k=4, iters=0)
    exp = _oracle(t, m=2, k=4, iters=0, dim=8)
    assert got.equals(exp[got.columns.tolist()])


def test_pq_more_iters_and_subspaces(ray_session):
    t = _emb(n=120, d=16, seed=3)
    got = _run(t, m=8, k=4, iters=3)
    exp = _oracle(t, m=8, k=4, iters=3, dim=16)
    assert got.equals(exp[got.columns.tolist()])
    # Lloyd must not increase total quantization error vs iters=0
    base = _run(t, m=8, k=4, iters=0)
    assert got["dist_mu2"].sum() <= base["dist_mu2"].sum()


def test_trunc_div_matches_duckdb():
    con = duckdb.connect()
    s = np.array([-7, 7, -8, 8, 0, -1], dtype=np.int64)
    n = np.array([2, 2, 3, 3, 5, 4], dtype=np.int64)
    exp = [con.execute("SELECT %d // %d" % (a, b)).fetchone()[0]
           for a, b in zip(s, n)]
    assert _trunc_div(s, n).tolist() == exp


def test_pq_rejects_bad_split(ray_session):
    import pytest
    import ray.data
    t = _emb(n=20, d=10)
    with pytest.raises(ValueError):
        pq_encode(ray.data.from_arrow(t), m=4, k=4).to_pandas()


def test_pq_noncontiguous_ids_seed_full_codebook(ray_session):
    """Seeding takes the k globally smallest ids, so offset /
    non-contiguous id domains still train all k codewords and stay
    value-equal to the SQL twin (which uses the same min-k rule)."""
    t = _emb(n=60, d=8, seed=5)
    ids = np.arange(60, dtype=np.int64) * 3 + 1000   # 1000, 1003, ...
    t = t.set_column(0, "vec_id", pa.array(ids))
    got = _run(t, m=2, k=4, iters=2)
    exp = _oracle(t, m=2, k=4, iters=2, dim=8)
    assert len(got) == 60 * 2
    assert got.equals(exp[got.columns.tolist()])
    # codeword ids ARE the seed vec_ids — all 4 smallest ids seeded
    assert set(got["code"].unique()) == {1000, 1003, 1006, 1009}
