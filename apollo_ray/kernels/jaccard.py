"""Weighted Jaccard similarity kernels.

Semantics of ``apollo/query.py:80-81``::

    weighted_jaccard(v1, v2) = minimum(v1, v2).sum() / maximum(v1, v2).sum()

plus sparse variants used by the verification stage (A4), where bags
are (sorted-index, weight) list pairs instead of dense vectors.
"""

from __future__ import annotations

import numpy as np


def weighted_jaccard(vec1: np.ndarray, vec2: np.ndarray) -> float:
    """Dense weighted Jaccard — exact reference semantics."""
    return float(np.minimum(vec1, vec2).sum() / np.maximum(vec1, vec2).sum())


def weighted_jaccard_sparse(idx1: np.ndarray, w1: np.ndarray,
                            idx2: np.ndarray, w2: np.ndarray) -> float:
    """Weighted Jaccard of two sparse non-negative bags.

    ``idx*`` must be sorted unique feature ids; equals the dense formula
    on the scattered vectors (zeros contribute nothing to min or max).
    """
    common1 = np.isin(idx1, idx2, assume_unique=True)
    common2 = np.isin(idx2, idx1, assume_unique=True)
    # sorted unique indices => the common subsequences align elementwise
    inter_min = np.minimum(w1[common1], w2[common2]).sum()
    inter_max = np.maximum(w1[common1], w2[common2]).sum()
    union_max = float(w1[~common1].sum() + w2[~common2].sum() + inter_max)
    if union_max == 0.0:
        return 0.0
    return float(inter_min) / union_max


def jaccard_tokens(set1: set, set2: set) -> float:
    """Plain (unweighted) Jaccard over token/shingle sets."""
    if not set1 and not set2:
        return 0.0
    inter = len(set1 & set2)
    return inter / (len(set1) + len(set2) - inter)
