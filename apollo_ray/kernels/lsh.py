"""LSH band-parameter optimization.

Same optimization the reference performs (``apollo/hasher.py:25-58``,
itself adapted from ekzhu/datasketch): choose the (number of bands b,
rows per band r) with b*r <= sample_size minimizing the weighted sum of
false-positive and false-negative probability mass around the Jaccard
threshold.  **Identical (b, r) to the reference is required for the
recall >= 0.99 criterion** — the grid and objective match exactly; only
the quadrature backend differs (Gauss-Legendre instead of scipy.quad,
see kernels/integrate.py), which cannot change the argmin on these
smooth curves.

Returns ``(htnum, band_size)`` — number of hashtables and rows per
band — in the reference's order.
"""

from __future__ import annotations

from functools import lru_cache

from apollo_ray.kernels.integrate import quad


def false_positive_probability(threshold: float, b: int, r: int) -> float:
    """P(mass of pairs below `threshold` that collide in >=1 band)."""
    return quad(lambda s: 1.0 - (1.0 - s ** float(r)) ** float(b), 0.0, threshold)


def false_negative_probability(threshold: float, b: int, r: int) -> float:
    """P(mass of pairs above `threshold` that collide in no band)."""
    return quad(lambda s: (1.0 - s ** float(r)) ** float(b), threshold, 1.0)


@lru_cache(maxsize=128)
def calc_recall_params(threshold: float, sample_size: int,
                       target_recall: float = 0.99) -> tuple[int, int]:
    """(htnum, band_size) guaranteeing per-pair catch probability
    ``1-(1-s^r)^b >= target_recall`` at s = threshold.

    Our extension beyond the reference (which only offers the
    fp/fn-balanced optimum): among all feasible (b, r) with
    b*r <= sample_size, the LARGEST band size r is chosen — it
    minimizes false positives subject to the recall floor.  For
    threshold 0.8, size 128, target 0.99 this yields (21, 6) vs the
    balanced optimum (9, 13) whose catch probability at the threshold
    is only ~0.40.
    """
    for r in range(sample_size, 0, -1):
        b = sample_size // r
        catch = 1.0 - (1.0 - threshold ** float(r)) ** float(b)
        if catch >= target_recall:
            return b, r
    return sample_size, 1


@lru_cache(maxsize=128)
def calc_hashtable_params(threshold: float, sample_size: int,
                          false_positive_weight: float = 0.5,
                          false_negative_weight: float = 0.5) -> tuple[int, int]:
    """Grid-search the optimal ``(htnum, band_size)``.

    Semantics of ``apollo/hasher.py:39-58``: for every band count b in
    1..sample_size and every band size r in 1..sample_size//b, score
    fp*w_fp + fn*w_fn and keep the strict minimum (first wins ties, in
    the same iteration order).
    """
    best_err = float("inf")
    best = (0, 0)
    for b in range(1, sample_size + 1):
        for r in range(1, sample_size // b + 1):
            fp = false_positive_probability(threshold, b, r)
            fn = false_negative_probability(threshold, b, r)
            err = fp * false_positive_weight + fn * false_negative_weight
            if err < best_err:
                best_err = err
                best = (b, r)
    return best
