"""LSH band-parameter optimizer tests (M12).

Pins the ported optimizer to the reference semantics
(``/root/reference/apollo/hasher.py:25-58``): same grid, same objective,
quadrature accurate enough that the argmin is stable.
"""

import numpy as np
import pytest

from apollo_ray.kernels.integrate import quad
from apollo_ray.kernels.lsh import (calc_hashtable_params,
                                    false_negative_probability,
                                    false_positive_probability)


def simpson(f, a, b, n=4001):
    xs = np.linspace(a, b, n)
    ys = f(xs)
    return float(np.trapz(ys, xs))


@pytest.mark.parametrize("b,r,t", [(9, 13, 0.8), (25, 5, 0.5), (3, 21, 0.9),
                                   (1, 1, 0.7), (64, 2, 0.6)])
def test_integrals_match_dense_reference(b, r, t):
    fp_ref = simpson(lambda s: 1 - (1 - s ** float(r)) ** float(b), 0.0, t)
    fn_ref = simpson(lambda s: (1 - s ** float(r)) ** float(b), t, 1.0)
    assert abs(false_positive_probability(t, b, r) - fp_ref) < 1e-6
    assert abs(false_negative_probability(t, b, r) - fn_ref) < 1e-6


def test_quad_polynomial_exact():
    assert abs(quad(lambda x: 3 * x ** 2, 0, 2) - 8.0) < 1e-12
    assert abs(quad(lambda x: np.ones_like(x), 0.25, 0.75) - 0.5) < 1e-12


def brute_force_params(threshold, size, wfp=0.5, wfn=0.5):
    best, best_err = (0, 0), float("inf")
    for b in range(1, size + 1):
        for r in range(1, size // b + 1):
            err = (false_positive_probability(threshold, b, r) * wfp
                   + false_negative_probability(threshold, b, r) * wfn)
            if err < best_err:
                best_err, best = err, (b, r)
    return best


@pytest.mark.parametrize("threshold", [0.5, 0.7, 0.8, 0.9])
@pytest.mark.parametrize("size", [64, 128])
def test_grid_argmin(threshold, size):
    # FIXTURES.md §2 grid: the cached optimizer equals the brute force
    assert calc_hashtable_params(threshold, size) == \
        brute_force_params(threshold, size)


def test_known_configs():
    # defaults of the reference: threshold 0.8, size 128, weights 0.5/0.5
    htnum, band_size = calc_hashtable_params(0.8, 128)
    assert htnum * band_size <= 128
    assert (htnum, band_size) == (9, 13)
    # asymmetric weights shift the optimum (same objective as reference)
    fp_heavy = calc_hashtable_params(0.8, 128, 0.9, 0.1)
    fn_heavy = calc_hashtable_params(0.8, 128, 0.1, 0.9)
    assert fp_heavy != fn_heavy


def test_recall_params():
    from apollo_ray.kernels.lsh import calc_recall_params
    b, r = calc_recall_params(0.8, 128, 0.99)
    assert b * r <= 128
    catch = 1 - (1 - 0.8 ** r) ** b
    assert catch >= 0.99
    # maximal feasible r: one step larger band fails the floor
    b2 = 128 // (r + 1)
    assert 1 - (1 - 0.8 ** (r + 1)) ** b2 < 0.99
    assert (b, r) == (21, 6)
