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
