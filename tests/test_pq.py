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


def _ivfpq_oracle(t: pa.Table, **kw) -> pd.DataFrame:
    from apollo_ray.functions.ann import ivfpq_topk_sql
    con = duckdb.connect()
    con.register("embeddings", t.to_pandas())
    df = con.execute(ivfpq_topk_sql(**kw)).fetchdf()
    con.close()
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)


def test_ivfpq_matches_oracle(ray_session):
    import ray.data
    from apollo_ray.functions.ann import ivfpq_topk
    t = _emb(n=150, d=16, seed=9)
    kw = dict(k_out=5, n_coarse=6, m=4, k_pq=4, iters=1, nprobe=2)
    got = ivfpq_topk(ray.data.from_arrow(t), [0, 3, 50, 77], **kw) \
        .to_pandas().sort_values(["query_id", "rank"]) \
        .reset_index(drop=True)
    exp = _ivfpq_oracle(t, query_ids=[0, 3, 50, 77], dim=16, **kw)
    assert len(got) == 4 * 5
    assert got.astype("int64").equals(exp[got.columns.tolist()]
                                      .astype("int64"))
    # ranks are 1..k per query, adc non-decreasing within a query
    for _, g in got.groupby("query_id"):
        assert list(g["rank"]) == list(range(1, 6))
        assert (np.diff(g["adc_mu2"].to_numpy()) >= 0).all()


def test_ivfpq_nprobe_all_matches_flat_pq_order(ray_session):
    """With nprobe == n_coarse (scan everything) the result is the
    exact PQ-ADC ranking — IVF pruning only ever REMOVES candidates."""
    import ray.data
    from apollo_ray.functions.ann import ivfpq_topk
    t = _emb(n=80, d=8, seed=2)
    full = ivfpq_topk(ray.data.from_arrow(t), [5], k_out=10, n_coarse=4,
                      m=2, k_pq=4, iters=1, nprobe=4).to_pandas()
    pruned = ivfpq_topk(ray.data.from_arrow(t), [5], k_out=10, n_coarse=4,
                        m=2, k_pq=4, iters=1, nprobe=1).to_pandas()
    assert len(full) == 10 and 0 < len(pruned) <= 10
    # wherever a candidate appears in both lists its ADC distance is
    # identical (pruning changes the candidate set, never the metric)
    m = pruned.merge(full, on=["query_id", "vec_id"], suffixes=("_p", "_f"))
    assert len(m) > 0
    assert (m["adc_mu2_p"] == m["adc_mu2_f"]).all()
    # and the full-probe top-1 can only improve (smaller or equal adc)
    assert full["adc_mu2"].min() <= pruned["adc_mu2"].min()


def test_ivfpq_edge_cases(ray_session):
    import ray.data
    from apollo_ray.functions.ann import ivfpq_topk
    t = _emb(n=10, d=8, seed=4)
    # corpus smaller than n_coarse and k_pq: codebooks clamp to n
    got = ivfpq_topk(ray.data.from_arrow(t), [0], k_out=3, n_coarse=16,
                     m=2, k_pq=16, iters=1, nprobe=16).to_pandas()
    assert 1 <= len(got) <= 3
    assert (got.vec_id != 0).all()          # self excluded
    # absent query id -> no rows for it, no crash
    got2 = ivfpq_topk(ray.data.from_arrow(t), [999], k_out=3,
                      n_coarse=4, m=2, k_pq=4, iters=1).to_pandas()
    assert len(got2) == 0
    # empty query list
    got3 = ivfpq_topk(ray.data.from_arrow(t), [], k_out=3).to_pandas()
    assert len(got3) == 0
