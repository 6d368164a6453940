"""Fixed-order Gauss-Legendre quadrature.

The reference integrates its LSH false-positive/negative probability
curves with ``scipy.integrate.quad`` (``apollo/hasher.py:28,35``).
scipy is not available in this environment; the integrands
``1 - (1 - s**r)**b`` are smooth polynomials on [0, 1], for which a
64-point Gauss-Legendre rule is exact far beyond the precision needed
to pick the argmin (b, r) pair.
"""

from __future__ import annotations

import numpy as np

_NODES, _WEIGHTS = np.polynomial.legendre.leggauss(64)


def quad(f, a: float, b: float) -> float:
    """Integral of ``f`` (vectorized over an ndarray) from a to b."""
    if b <= a:
        return 0.0
    mid = 0.5 * (a + b)
    half = 0.5 * (b - a)
    x = mid + half * _NODES
    return float(half * np.dot(_WEIGHTS, f(x)))
