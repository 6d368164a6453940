"""SimHash kernel tests: Hamming distance tracks bag similarity."""

import numpy as np

from apollo_ray.kernels.simhash import (hamming64, simhash, simhash_bands,
                                        simhash_batch)


def test_identical_bags_identical_hash():
    rng = np.random.default_rng(0)
    h = rng.integers(0, 2 ** 63, 100, dtype=np.uint64)
    w = rng.random(100).astype(np.float32)
    assert simhash(h, w) == simhash(h.copy(), w.copy())


def test_similar_bags_close_hamming():
    rng = np.random.default_rng(1)
    h = rng.integers(0, 2 ** 63, 500, dtype=np.uint64)
    w = np.ones(500, dtype=np.float32)
    h2 = h.copy()
    h2[:25] = rng.integers(0, 2 ** 63, 25, dtype=np.uint64)  # 5% change
    h3 = rng.integers(0, 2 ** 63, 500, dtype=np.uint64)      # unrelated
    s, s2, s3 = simhash_batch([h, h2, h3], [w, w, w])
    d_near = hamming64(np.array([s]), np.array([s2]))[0]
    d_far = hamming64(np.array([s]), np.array([s3]))[0]
    assert d_near < d_far
    assert d_near < 16
    assert hamming64(np.array([s]), np.array([s]))[0] == 0


def test_band_keys():
    sigs = np.array([123456789, 123456789, 987654321], dtype=np.uint64)
    bands = simhash_bands(sigs, bands=4)
    assert bands.shape == (3, 4)
    np.testing.assert_array_equal(bands[0], bands[1])
    assert (bands[0] != bands[2]).any()
