"""Unweighted k-permutation MinHash: kernel parity, the Broder
collision property, staged==fused parity, and e2e oracle parity for
``minhash_mode="unweighted"``."""

import numpy as np
import pandas as pd
import pytest

from apollo_ray.kernels.minhash import (P_MINHASH, generate_minhash_params,
                                        minhash_batch, minhash_scalar,
                                        sig_to_u32_lanes)


def _random_csr(rng, n_docs, max_nnz):
    sets = [np.unique(rng.integers(0, 1 << 32, size=rng.integers(1, max_nnz),
                                   dtype=np.uint64).astype(np.uint32))
            for _ in range(n_docs)]
    indptr = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum([len(s) for s in sets], out=indptr[1:])
    return indptr, np.concatenate(sets), sets


def test_batch_matches_scalar():
    rng = np.random.default_rng(7)
    p = generate_minhash_params(40, seed=3)
    indptr, flat, sets = _random_csr(rng, 50, 200)
    sigs = minhash_batch(indptr, flat, p["a"], p["b"])
    for i, s in enumerate(sets):
        np.testing.assert_array_equal(sigs[i], minhash_scalar(s, p["a"], p["b"]))


def test_params_deterministic_and_bounded():
    p1 = generate_minhash_params(128, seed=42)
    p2 = generate_minhash_params(128, seed=42)
    np.testing.assert_array_equal(p1["a"], p2["a"])
    np.testing.assert_array_equal(p1["b"], p2["b"])
    assert p1["a"].min() >= 1 and p1["a"].max() < 1 << 32
    assert p1["b"].max() < 1 << 32
    p3 = generate_minhash_params(128, seed=43)
    assert not np.array_equal(p1["a"], p3["a"])


def test_collision_probability_estimates_jaccard():
    """P[sig_j(A) == sig_j(B)] == |A∩B|/|A∪B| (Broder): the sample
    mean over 1024 permutations must sit within ~4 sigma."""
    rng = np.random.default_rng(11)
    p = generate_minhash_params(1024, seed=5)
    common = np.unique(rng.integers(0, 1 << 32, 300, dtype=np.uint64)
                       .astype(np.uint32))
    only_a = np.unique(rng.integers(0, 1 << 32, 100, dtype=np.uint64)
                       .astype(np.uint32))
    only_b = np.unique(rng.integers(0, 1 << 32, 100, dtype=np.uint64)
                       .astype(np.uint32))
    A = np.union1d(common, only_a)
    B = np.union1d(common, only_b)
    inter = len(np.intersect1d(A, B))
    jac = inter / (len(A) + len(B) - inter)
    sa = minhash_scalar(A, p["a"], p["b"])
    sb = minhash_scalar(B, p["a"], p["b"])
    est = float(np.mean(sa == sb))
    sigma = np.sqrt(jac * (1 - jac) / 1024)
    assert abs(est - jac) < 4 * sigma + 1e-9


def test_u32_lane_roundtrip():
    rng = np.random.default_rng(2)
    sigs = rng.integers(0, 1 << 63, size=(5, 8), dtype=np.uint64)
    lanes = sig_to_u32_lanes(sigs)
    assert lanes.shape == (5, 16)
    np.testing.assert_array_equal(lanes.view(np.uint64).reshape(5, 8), sigs)


def test_exact_uint64_vs_python_ints():
    """The uint64 arithmetic must be exact (no wraparound): compare a
    sample against arbitrary-precision Python ints."""
    p = generate_minhash_params(16, seed=9)
    vals = np.array([0, 1, (1 << 32) - 1, 123456789], dtype=np.uint32)
    sig = minhash_scalar(vals, p["a"], p["b"])
    for j in range(16):
        expect = min((int(v) * int(p["a"][j]) + int(p["b"][j])) % P_MINHASH
                     for v in vals)
        assert int(sig[j]) == expect


def test_fused_equals_staged_unweighted(ray_session):
    import ray.data as rd
    from apollo_ray.config import DedupConfig
    from apollo_ray.fixtures import generate_pages
    from apollo_ray.stages.bags import build_bags, collapse_exact
    from apollo_ray.stages.bands import explode_bands
    from apollo_ray.stages.extract import extract_docs
    from apollo_ray.stages.fused import fused_bands
    from apollo_ray.stages.wmh_stage import compute_signatures

    pages_t, _ = generate_pages(300)
    cfg = DedupConfig(feature_dim_log2=12, minhash_mode="unweighted")
    reps = collapse_exact(extract_docs(rd.from_arrow(pages_t), cfg)).materialize()

    staged = explode_bands(
        compute_signatures(build_bags(reps, cfg), cfg), cfg).to_pandas()
    fused = fused_bands(reps, cfg).to_pandas()

    key = ["band_id", "bucket", "doc_id"]
    a = staged.sort_values(key).reset_index(drop=True)
    b = fused.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[key], b[key])


def test_e2e_unweighted_matches_oracle(ray_session):
    """Full pipeline in unweighted mode reproduces the local
    reference-equivalent oracle exactly (same seeded permutations)."""
    import ray.data as rd
    from apollo_ray.config import DedupConfig
    from apollo_ray.fixtures import generate_pages
    from apollo_ray.oracle import oracle_clusters, same_cluster_pairs
    from apollo_ray.pipelines.dedup import run_dedup

    pages_t, _ = generate_pages(500)
    cfg = DedupConfig(feature_dim_log2=14, minhash_mode="unweighted")
    out = run_dedup(rd.from_arrow(pages_t), cfg)
    docs = out["docs"].to_pandas()
    cl = out["clusters"].to_pandas()
    url_of = dict(zip(docs.doc_id, docs.url))
    ours = {url_of[d]: int(c) for d, c in zip(cl.doc_id, cl.cc_id)}

    orc = oracle_clusters(pages_t.column("url").to_pylist(),
                          pages_t.column("html").to_pylist(), cfg)
    assert same_cluster_pairs(ours) == same_cluster_pairs(orc)
    assert ours == orc


def test_unweighted_verify_tier(ray_session):
    """verify=True in unweighted mode filters by plain set Jaccard;
    exact dups must survive, and surviving near-dup edges must be a
    subset of the unverified clustering."""
    import ray.data as rd
    from apollo_ray.config import DedupConfig
    from apollo_ray.fixtures import generate_pages
    from apollo_ray.pipelines.dedup import run_dedup

    pages_t, _ = generate_pages(300)
    cfg = DedupConfig(feature_dim_log2=12, minhash_mode="unweighted",
                      verify=True)
    out = run_dedup(rd.from_arrow(pages_t), cfg)
    cl = out["clusters"].to_pandas()
    assert len(cl) == pages_t.num_rows

    # byte-identical texts always share a cluster
    docs = out["docs"].to_pandas()
    lab = dict(zip(cl.doc_id, cl.cc_id))
    by_text: dict[str, list[int]] = {}
    for did, t in zip(docs.doc_id, docs.text):
        by_text.setdefault(t, []).append(did)
    for ids in by_text.values():
        assert len({lab[i] for i in ids}) == 1


def test_mod_p_inplace_exact():
    from apollo_ray.kernels.minhash import P_MINHASH, _mod_p_inplace
    rng = np.random.default_rng(7)
    # dense random uint64 plus the wraparound edges of both rounds
    x = rng.integers(0, 1 << 64, size=200_000, dtype=np.uint64)
    edges = np.array([0, 1, P_MINHASH - 1, P_MINHASH, P_MINHASH + 1,
                      (1 << 32) - 1, 1 << 32, (1 << 64) - 1,
                      2 * P_MINHASH, 2 * P_MINHASH - 1], dtype=np.uint64)
    x = np.concatenate([x, edges])
    got = _mod_p_inplace(x.copy(), np.empty_like(x))
    assert np.array_equal(got, x % np.uint64(P_MINHASH))
