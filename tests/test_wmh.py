"""Weighted MinHash kernel tests.

- vectorized batch kernel == scalar port of the reference NumPy path
  (``/root/reference/apollo/hasher.py:237-256``), elementwise;
- Ioffe property: P[sample collision] ~= weighted Jaccard;
- determinism of the seeded parameter generation (the reuse rule of
  ``/root/reference/doc/model/wmh.md:12-14``).
"""

import numpy as np
import pytest

from apollo_ray.kernels.jaccard import weighted_jaccard
from apollo_ray.kernels.wmh import (generate_params, weighted_minhash_batch,
                                    weighted_minhash_scalar)

DIM, SIZE = 1000, 32


@pytest.fixture(scope="module")
def params():
    return generate_params(DIM, SIZE, seed=7)


def random_bags(n, dim, seed=7, density=0.02):
    # FIXTURES.md §2: weights ~ exp(U[0,1]) with 0.98 sparsity, float32
    rng = np.random.default_rng(seed)
    dense = np.zeros((n, dim), dtype=np.float32)
    mask = rng.random((n, dim)) < density
    dense[mask] = np.exp(rng.random(mask.sum())).astype(np.float32)
    for i in range(n):
        if not dense[i].any():
            dense[i, int(rng.integers(dim))] = 1.0
    return dense


def to_csr(dense):
    indptr, indices, data = [0], [], []
    for row in dense:
        nz = np.flatnonzero(row)
        indices.extend(nz)
        data.extend(row[nz])
        indptr.append(len(indices))
    return (np.asarray(indptr, dtype=np.int64),
            np.asarray(indices, dtype=np.uint32),
            np.asarray(data, dtype=np.float32))


def test_batch_equals_scalar(params):
    dense = random_bags(64, DIM)
    indptr, indices, data = to_csr(dense)
    batch = weighted_minhash_batch(indptr, indices, data, params["rs"],
                                   params["ln_cs"], params["betas"])
    for i in range(len(dense)):
        scalar = weighted_minhash_scalar(dense[i].copy(), params["rs"],
                                         params["ln_cs"], params["betas"])
        np.testing.assert_array_equal(batch[i], scalar)


def test_batch_chunking_invariant(params):
    # tiny nnz budget forces many chunks; result must not change
    dense = random_bags(32, DIM, seed=11)
    indptr, indices, data = to_csr(dense)
    a = weighted_minhash_batch(indptr, indices, data, params["rs"],
                               params["ln_cs"], params["betas"])
    b = weighted_minhash_batch(indptr, indices, data, params["rs"],
                               params["ln_cs"], params["betas"], nnz_budget=7)
    np.testing.assert_array_equal(a, b)


def test_unit_weight_mixes_equal_scalar(params):
    """The unit-weight (tf=1) fast path must stay bit-identical to
    the scalar oracle across mixes and tile boundaries: per-mix bags
    where a given fraction of weights is exactly 1.0, hashed with a
    tiny nnz budget so docs straddle tiles in every branch combo
    (all-unit, mixed, all-heavy tiles)."""
    rng = np.random.default_rng(23)
    for frac in (0.0, 0.3, 0.9, 1.0):
        dense = random_bags(24, DIM, seed=int(frac * 100) + 5)
        mask = dense > 0
        ones = mask & (rng.random(dense.shape) < frac)
        dense[ones] = np.float32(1.0)
        indptr, indices, data = to_csr(dense)
        for budget in (7, 64, 1 << 16):
            batch = weighted_minhash_batch(indptr, indices, data,
                                           params["rs"], params["ln_cs"],
                                           params["betas"],
                                           nnz_budget=budget)
            for i in range(len(dense)):
                scalar = weighted_minhash_scalar(
                    dense[i].copy(), params["rs"], params["ln_cs"],
                    params["betas"])
                np.testing.assert_array_equal(
                    batch[i], scalar,
                    err_msg="frac=%s budget=%d doc=%d" % (frac, budget, i))


def test_ioffe_collision_property():
    # E[collisions]/size ~= weighted Jaccard (Ioffe's guarantee)
    dim, size = 500, 1024
    p = generate_params(dim, size, seed=3)
    rng = np.random.default_rng(1)
    v1 = np.where(rng.random(dim) < 0.1,
                  np.exp(rng.random(dim)), 0).astype(np.float32)
    v2 = v1.copy()
    v2[rng.random(dim) < 0.03] = 0
    add = rng.random(dim) < 0.02
    v2[add] = np.exp(rng.random(add.sum())).astype(np.float32)
    indptr, indices, data = to_csr(np.stack([v1, v2]))
    sigs = weighted_minhash_batch(indptr, indices, data, p["rs"], p["ln_cs"],
                                  p["betas"])
    coll = np.mean((sigs[0, :, 0] == sigs[1, :, 0])
                   & (sigs[0, :, 1] == sigs[1, :, 1]))
    true = weighted_jaccard(v1, v2)
    assert abs(coll - true) < 4 * np.sqrt(true * (1 - true) / size)


def test_param_generation_deterministic():
    a = generate_params(256, 16, seed=42)
    b = generate_params(256, 16, seed=42)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])
    c = generate_params(256, 16, seed=43)
    assert not np.array_equal(a["rs"], c["rs"])


def test_empty_bag_rejected(params):
    with pytest.raises(ValueError):
        weighted_minhash_scalar(np.zeros(DIM, dtype=np.float32),
                                params["rs"], params["ln_cs"], params["betas"])
    with pytest.raises(ValueError):
        weighted_minhash_batch(np.array([0, 0], dtype=np.int64),
                               np.empty(0, np.uint32), np.empty(0, np.float32),
                               params["rs"], params["ln_cs"], params["betas"])
