"""DSIR importance weights: DuckDB oracle parity and the
directional property (target-like docs score higher)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from apollo_ray.functions.dsir import dsir_logweights, dsir_logweights_sql


def _mk(texts):
    return pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })


def test_dsir_matches_duckdb(ray_session):
    duckdb = pytest.importorskip("duckdb")
    rng = np.random.default_rng(11)
    vocab_t = ["quality", "curated", "clean", "prose"]
    vocab_r = ["spam", "noise", "click", "raw", "quality"]
    texts = []
    for i in range(60):
        v = vocab_t if i % 5 == 0 else vocab_r
        texts.append(" ".join(rng.choice(v, size=rng.integers(1, 9))))
    texts.append("")          # empty doc: dropped
    tbl = _mk(texts)
    got = dsir_logweights(ray.data.from_arrow(tbl), n_buckets=256,
                          target_mod=5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", tbl)
    want = con.execute(
        dsir_logweights_sql(n_buckets=256, target_mod=5)
        + " ORDER BY doc_id").df()
    assert len(got) == len(want) == 60
    assert (got["doc_id"].values == want["doc_id"].values).all()
    assert (got["n_feats"].values == want["n_feats"].values).all()
    assert (got["logw_micro"].values == want["logw_micro"].values).all()


def test_dsir_directional(ray_session):
    # target docs (ids % 7 == 0) use a disjoint vocabulary; their
    # mean per-feature weight must exceed the raw docs'
    texts = ["target tokens here" if i % 7 == 0 else "raw junk words"
             for i in range(70)]
    out = dsir_logweights(ray.data.from_arrow(_mk(texts)), n_buckets=512,
                          target_mod=7).to_pandas()
    per_feat = out["logw_micro"] / out["n_feats"]
    tgt = per_feat[out["doc_id"] % 7 == 0]
    raw = per_feat[out["doc_id"] % 7 != 0]
    assert tgt.min() > raw.max()
