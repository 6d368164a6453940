"""embedding_quantize: per-dimension int8 scalar quantization with a
flat (vec_id, dim, q) output, value-exact vs the DuckDB oracle."""

import duckdb
import numpy as np
import pyarrow as pa


def _embs(mat, ids=None):
    mat = np.asarray(mat, dtype=np.float32)
    return pa.table({
        "vec_id": pa.array(
            np.asarray(ids, dtype=np.int64) if ids is not None
            else np.arange(len(mat), dtype=np.int64)),
        "embedding": pa.array([row.tolist() for row in mat],
                              type=pa.list_(pa.float32())),
    })


def test_embedding_quantize_values(ray_session):
    import ray
    from apollo_ray.functions.ann import embedding_quantize
    # dim0 spans [0,1]; dim1 constant; dim2 negative span
    t = _embs([[0.0, 5.0, -2.0], [1.0, 5.0, -1.0], [0.5, 5.0, -1.5]])
    out = {(r["vec_id"], r["dim"]): r["q"] for r in
           embedding_quantize(ray.data.from_arrow(t)).take_all()}
    assert out[(0, 0)] == 0 and out[(1, 0)] == 255
    assert out[(2, 0)] == 128            # 0.5*255 + .5 -> floor 128
    assert all(out[(i, 1)] == 0 for i in range(3))   # constant dim
    assert out[(0, 2)] == 0 and out[(1, 2)] == 255


def test_embedding_quantize_oracle_parity(ray_session):
    import ray
    from apollo_ray.functions.ann import (embedding_quantize,
                                          embedding_quantize_sql)
    rng = np.random.default_rng(5)
    mat = rng.normal(size=(60, 8)).astype(np.float32)
    mat[:, 3] = 7.25                      # constant dim
    t = _embs(mat)
    got = sorted((r["vec_id"], r["dim"], r["q"]) for r in
                 embedding_quantize(ray.data.from_arrow(t)).take_all())
    con = duckdb.connect()
    con.register("embeddings", t)
    want = sorted(map(tuple,
                      con.execute(embedding_quantize_sql()).fetchall()))
    assert got == want
    qs = [q for (_, _, q) in got]
    assert min(qs) >= 0 and max(qs) <= 255


def test_embedding_quantize_empty(ray_session):
    import ray
    from apollo_ray.functions.ann import embedding_quantize
    t = _embs(np.zeros((0, 4)))
    out = embedding_quantize(ray.data.from_arrow(t))
    assert out.count() == 0


# ---------------------------------------------------------------------------
# embedding_stats / kmeans_assign
# ---------------------------------------------------------------------------

def test_embedding_stats_oracle_parity(ray_session):
    import pandas as pd
    import ray.data
    from apollo_ray.functions.ann import embedding_stats, embedding_stats_sql
    rng = np.random.default_rng(7)
    tab = _embs(rng.normal(size=(40, 5)))
    # two blocks: the integer fold must be block-boundary-independent
    ds = ray.data.from_arrow(tab).repartition(2)
    eng = (embedding_stats(ds).to_pandas()
           .sort_values("dim").reset_index(drop=True))
    con = duckdb.connect(); con.register("embeddings", tab)
    ora = (con.sql(embedding_stats_sql()).df()
           .sort_values("dim").reset_index(drop=True))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    assert eng.n.tolist() == [40] * 5


def test_embedding_stats_empty(ray_session):
    import ray.data
    from apollo_ray.functions.ann import embedding_stats
    ds = ray.data.from_arrow(_embs(np.zeros((1, 3)))).filter(
        lambda r: False)
    out = embedding_stats(ds)
    assert out.count() == 0
    assert out.schema().names == ["dim", "n", "sum_mu", "sumsq_mu"]


def test_kmeans_assign_oracle_parity(ray_session):
    import pandas as pd
    import ray.data
    from apollo_ray.functions.ann import kmeans_assign, kmeans_assign_sql
    rng = np.random.default_rng(11)
    tab = _embs(rng.normal(size=(60, 6)))
    ds = ray.data.from_arrow(tab).repartition(3)
    eng = (kmeans_assign(ds, k=4).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    con = duckdb.connect(); con.register("embeddings", tab)
    ora = (con.sql(kmeans_assign_sql(4)).df()
           .sort_values("vec_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    # seeds are their own nearest centroid at distance zero
    own = eng[eng.vec_id < 4]
    assert own.cluster_id.tolist() == own.vec_id.tolist()
    assert own.dist_mu2.tolist() == [0, 0, 0, 0]


def test_kmeans_assign_tie_breaks_to_lowest_seed(ray_session):
    import ray.data
    from apollo_ray.functions.ann import kmeans_assign
    # seeds 0 and 1 are identical: every vector ties, and every
    # assignment must pick cluster 0 (lowest seed id), as SQL's
    # ORDER BY dist, cid does
    mat = np.array([[1.0, 0.0], [1.0, 0.0], [0.25, 0.5], [0.75, -0.5]])
    eng = (kmeans_assign(ray.data.from_arrow(_embs(mat)), k=2)
           .to_pandas().sort_values("vec_id"))
    assert eng.cluster_id.tolist() == [0, 0, 0, 0]


def test_feature_hash_embed_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd
    import ray.data
    from apollo_ray.functions.ann import (feature_hash_embed,
                                          feature_hash_embed_sql)
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": ["alpha beta alpha gamma", "", "beta beta beta"],
    })
    eng = (feature_hash_embed(ray.data.from_arrow(docs), dim=8)
           .to_pandas().sort_values(["doc_id", "dim"])
           .reset_index(drop=True))
    con = duckdb.connect(); con.register("documents", docs)
    ora = (con.sql(feature_hash_embed_sql(8)).df()
           .sort_values(["doc_id", "dim"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    # occurrences (not distinct tokens) drive the sums: doc 3 puts
    # all 3 'beta's in one bucket with one sign
    d3 = eng[eng.doc_id == 3]
    assert len(d3) == 1 and abs(int(d3.v.iloc[0])) == 3 \
        and int(d3.n_terms.iloc[0]) == 3
    # the empty doc emits nothing
    assert (eng.doc_id == 2).sum() == 0


def test_embedding_dup_pairs_autoroutes_to_lsh(ray_session):
    """Above exact_max_rows the exact O(N^2) path must auto-route to
    the sub-quadratic LSH sibling (cost-ordered guard rail): forcing a
    tiny threshold must produce exactly embedding_dup_pairs_lsh's
    output (deterministic seed), and the default threshold keeps the
    exact path (which finds a superset pair for the fixture)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from apollo_ray.functions.ann import (embedding_dup_pairs,
                                          embedding_dup_pairs_lsh)
    rng = np.random.default_rng(11)
    base = rng.standard_normal((60, 16)).astype(np.float64)
    vecs = np.concatenate([base, base + 0.001 * rng.standard_normal((60, 16))])
    import pyarrow as pa
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              type=pa.list_(pa.float64()))}))

    def canon(d):
        return d.to_pandas().sort_values(["u", "v"]).reset_index(drop=True)

    routed = canon(embedding_dup_pairs(ds, 0.95, exact_max_rows=10))
    lsh = canon(embedding_dup_pairs_lsh(ds, 0.95, dim=16))
    assert routed.equals(lsh)
    exact = canon(embedding_dup_pairs(ds, 0.95))
    # LSH output is a (here: equal or near-equal) subset of exact
    ek = set(zip(exact["u"], exact["v"]))
    rk = set(zip(routed["u"], routed["v"]))
    assert rk <= ek
    assert len(exact) >= 60
