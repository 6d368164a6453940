"""KMV / HLL distinct-count sketches: accuracy, the exact-below-k
path, batch-split invariance, and DuckDB oracle parity."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from apollo_ray.functions.sketch import (
    _rank64, distinct_count_hll, distinct_count_hll_sql,
    distinct_count_kmv, distinct_count_kmv_sql)


def _ds(texts, parallelism=4):
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    return ray.data.from_arrow(t).repartition(parallelism)


def test_rank64_exact():
    u = np.array([0, 1, 2, 3, 2 ** 63, 2 ** 64 - 1, 2 ** 32],
                 dtype=np.uint64)
    # rank = 1 + leading zeros
    assert _rank64(u).tolist() == [65, 64, 63, 63, 1, 1, 32]


def test_kmv_exact_below_k(ray_session):
    texts = ["t%d" % i for i in range(100)] + ["t5", "t6"]  # 100 distinct
    out = distinct_count_kmv(_ds(texts), k=256).to_pandas()
    assert out["n_seen"][0] == 100
    assert out["est"][0] == 100


def test_kmv_and_hll_accuracy(ray_session):
    n = 20000
    texts = ["doc body %d" % i for i in range(n)] * 2  # every doc twice
    kmv = distinct_count_kmv(_ds(texts, 8), k=256).to_pandas()
    err = abs(kmv["est"][0] - n) / n
    assert err < 5 / np.sqrt(254)  # ~5 sigma
    hll = distinct_count_hll(_ds(texts, 8), log2_m=8).to_pandas()
    err = abs(hll["est_raw"][0] - n) / n
    assert err < 5 * 1.04 / np.sqrt(256)


def test_sketches_batch_invariant(ray_session):
    texts = ["x%d y" % (i % 700) for i in range(3000)]
    a = distinct_count_kmv(_ds(texts, 2), k=64).to_pandas()
    b = distinct_count_kmv(_ds(texts, 16), k=64).to_pandas()
    assert a.equals(b)
    c = distinct_count_hll(_ds(texts, 2), log2_m=6).to_pandas()
    d = distinct_count_hll(_ds(texts, 16), log2_m=6).to_pandas()
    assert c.equals(d)


def test_sketches_match_duckdb(ray_session):
    duckdb = pytest.importorskip("duckdb")
    rng = np.random.default_rng(3)
    texts = ["w%d %d" % (rng.integers(400), rng.integers(3))
             for _ in range(900)]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts)})
    con = duckdb.connect()
    con.register("documents", tbl)
    got = distinct_count_kmv(ray.data.from_arrow(tbl), k=128).to_pandas()
    want = con.execute(distinct_count_kmv_sql(k=128)).df()
    for col in ("k", "n_seen", "kth_view", "est"):
        assert got[col][0] == want[col][0], col
    got = distinct_count_hll(ray.data.from_arrow(tbl), log2_m=6).to_pandas()
    want = con.execute(distinct_count_hll_sql(log2_m=6)).df()
    for col in ("m", "n_seen", "est_raw"):
        assert got[col][0] == want[col][0], col


def test_cms_matches_duckdb_and_bounds(ray_session):
    duckdb = pytest.importorskip("duckdb")
    from apollo_ray.functions.sketch import (cms_token_counts,
                                             cms_token_counts_sql)
    rng = np.random.default_rng(5)
    # zipf-ish: token i appears ~ 1/(i+1) — heavy hitters + tail
    texts = []
    for _ in range(400):
        n = rng.integers(3, 12)
        toks = ["tk%d" % int(rng.zipf(1.3)) for _ in range(n)]
        texts.append(" ".join(toks))
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts)})
    got = cms_token_counts(ray.data.from_arrow(tbl).repartition(4),
                           depth=4, log2_w=8, n_probe=15).to_pandas() \
        .sort_values("token").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", tbl)
    want = con.execute(cms_token_counts_sql(depth=4, log2_w=8, n_probe=15)
                       + " ORDER BY token").df()
    assert (got["token"].values == want["token"].values).all()
    assert (got["est"].values == want["est"].values).all()
    assert (got["exact"].values == want["exact"].values).all()
    # CMS invariant: never undercounts
    assert (got["est"] >= got["exact"]).all()


def test_heavy_hitters_exact_vs_duckdb(ray_session):
    duckdb = pytest.importorskip("duckdb")
    from apollo_ray.functions.sketch import heavy_hitters, heavy_hitters_sql
    rng = np.random.default_rng(7)
    # zipf head + unique tail: forces real Misra-Gries truncation
    texts = []
    for i in range(500):
        toks = ["hh%d" % int(rng.zipf(1.2)) for _ in range(10)]
        toks.append("tail%d" % i)
        texts.append(" ".join(toks))
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts)})
    con = duckdb.connect()
    con.register("documents", tbl)
    for phi_ppm, k in ((20000, 120), (50000, 25)):
        got = heavy_hitters(_ds(texts, 8), phi_ppm=phi_ppm, summary_k=k,
                            num_partitions=4).to_pandas() \
            .sort_values("token").reset_index(drop=True)
        want = con.execute(heavy_hitters_sql(phi_ppm=phi_ppm)
                           + " ORDER BY token").df()
        assert got["token"].tolist() == want["token"].tolist(), phi_ppm
        assert got["n"].tolist() == [int(x) for x in want["n"]], phi_ppm


def test_heavy_hitters_edges(ray_session):
    from apollo_ray.functions.sketch import heavy_hitters
    # guarantee guard: k too small for the threshold
    with pytest.raises(ValueError, match="superset guarantee"):
        heavy_hitters(_ds(["a b"]), phi_ppm=1000, summary_k=10)
    # empty corpus -> empty result with the output schema
    out = heavy_hitters(_ds(["", "   "]), phi_ppm=5000)
    assert out.schema().names == ["token", "n"]
    assert out.count() == 0
    # batch-split invariance of the EXACT result
    texts = ["z y z"] * 50 + ["q%d" % i for i in range(50)]
    a = heavy_hitters(_ds(texts, 2), phi_ppm=100000,
                      summary_k=30).to_pandas().sort_values("token")
    b = heavy_hitters(_ds(texts, 16), phi_ppm=100000,
                      summary_k=30).to_pandas().sort_values("token")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
