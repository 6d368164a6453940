"""Tests: evalcc fitness metrics (A5), idf weighting + min-docfreq
(M4/M5), shingle families with weights (M3/M7), format_url (M10)."""

import numpy as np
import pytest


def test_format_url():
    from apollo_ray.stages.report import format_url
    assert format_url("github.com/a/b.git", "c0ffee", "x.py") == \
        "https://github.com/a/b/blob/c0ffee/x.py"
    assert format_url("bitbucket.org/a/b", "c0ffee", "x.py") == \
        "https://bitbucket.org/a/b/src/c0ffee/x.py"
    assert format_url("example.com/r", "c", "p") == "[example.com/r c p]"


def test_doc_to_bag_idf_and_min_df():
    from apollo_ray.config import DedupConfig
    from apollo_ray.hashing import TokenHasher
    from apollo_ray.kernels.text import doc_to_bag
    cfg = DedupConfig(feature_dim_log2=12)
    th = TokenHasher(seed=cfg.seed)
    text = "a b c d e f g h i j"
    idx, w = doc_to_bag(text, th, 3, 12)
    # features in every doc (df == ndocs) get idf 0 -> dropped
    df = np.full(1 << 12, 5, dtype=np.int64)
    idx2, w2 = doc_to_bag(text, th, 3, 12, weighting="logtf_logidf",
                          df=df, ndocs=5)
    assert len(idx2) == 0
    # rare features (df = 1) keep a positive idf weight
    df1 = np.ones(1 << 12, dtype=np.int64)
    idx3, w3 = doc_to_bag(text, th, 3, 12, weighting="logtf_logidf",
                          df=df1, ndocs=10)
    np.testing.assert_array_equal(idx3, idx)
    assert np.allclose(w3, w * np.log(10.0), rtol=1e-6)
    # min_df drops everything when features are rarer than the floor
    idx4, _ = doc_to_bag(text, th, 3, 12, df=df1, min_df=2)
    assert len(idx4) == 0


def test_doc_to_bag_families_and_weights():
    from apollo_ray.config import DedupConfig
    from apollo_ray.hashing import TokenHasher
    from apollo_ray.kernels.text import doc_to_bag
    th = TokenHasher(seed=1)
    text = "w1 w2 w3 w4 w5 w6 w7 w8"
    i1, w1 = doc_to_bag(text, th, 3, 14)
    i2, w2 = doc_to_bag(text, th, 3, 14, extra_ks=(5,))
    assert len(i2) > len(i1)                  # extra family adds features
    # doubling one family's weight scales exactly its features (M7)
    i3, w3 = doc_to_bag(text, th, 3, 14, extra_ks=(5,),
                        family_weights=(2.0, 1.0))
    np.testing.assert_array_equal(i3, i2)
    base = dict(zip(i2.tolist(), w2.tolist()))
    k3_set = set(i1.tolist())
    for f, w in zip(i3.tolist(), w3.tolist()):
        expected = 2 * base[f] if f in k3_set else base[f]
        assert w == pytest.approx(expected, rel=1e-6)


def test_idf_pipeline_matches_oracle(ray_session):
    """Full pipeline under a NON-default config (idf weighting +
    min-docfreq + two shingle families) still reproduces the local
    reference-equivalent oracle exactly."""
    import ray.data as rd
    from apollo_ray.config import DedupConfig
    from apollo_ray.fixtures import generate_pages
    from apollo_ray.oracle import oracle_clusters, same_cluster_pairs
    from apollo_ray.pipelines.dedup import run_dedup
    pages_t, _ = generate_pages(300)
    cfg = DedupConfig(feature_dim_log2=12, weighting="logtf_logidf",
                      min_docfreq=1, extra_shingle_ks=(3,),
                      family_weights=(1.0, 0.5))
    out = run_dedup(rd.from_arrow(pages_t), cfg)
    docs = out["docs"].to_pandas()
    cl = out["clusters"].to_pandas()
    url_of = dict(zip(docs.doc_id, docs.url))
    ours = {url_of[d]: int(c) for d, c in zip(cl.doc_id, cl.cc_id)}
    orc = oracle_clusters(pages_t.column("url").to_pylist(),
                          pages_t.column("html").to_pylist(), cfg)
    assert same_cluster_pairs(ours) == same_cluster_pairs(orc)


def test_evalcc_metrics(ray_session):
    import ray.data as rd
    from apollo_ray.config import DedupConfig
    from apollo_ray.fixtures import generate_pages
    from apollo_ray.pipelines.dedup import run_dedup
    from apollo_ray.stages.evalcc import evaluate_communities
    pages_t, _ = generate_pages(300)
    cfg = DedupConfig(feature_dim_log2=12)
    out = run_dedup(rd.from_arrow(pages_t), cfg, with_communities=True)
    # evalcc needs the bags dataset; the fused path leaves it lazy
    metrics = evaluate_communities(out["communities"], out["bags"], cfg)
    assert metrics["n_communities"] >= 1
    assert metrics["total_pairs"] >= 1
    assert 0 <= metrics["avg_normalized_misses"] <= 1
    assert metrics["n_capped"] == 0
