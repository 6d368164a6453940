"""Weighted MinHash (Ioffe 2010) — parameters, scalar oracle, batch kernel.

Reproduces the hashing semantics of the reference (CUDA path
``apollo/hasher.py:178`` via MinHashCUDA; NumPy scalar path
``apollo/hasher.py:237-256``): a signature is ``size`` samples, each a
``(k, t_k)`` pair where

    t   = floor(log(w) / r + beta)
    ln_y = (t - beta) * r
    ln_a = ln_c - ln_y - r
    k   = argmin over present features of ln_a

with per-(sample, feature) random parameters r ~ Gamma(2,1),
ln_c = log(Gamma(2,1)), beta ~ U(0,1) (Ioffe's sampling scheme, the
same distributions MinHashCUDA draws).  Signatures are ``(size, 2)``
uint32 arrays exactly as the reference stores them
(``apollo/hasher.py:243``).

The collision probability of a sample between two documents equals
their weighted Jaccard similarity — tested statistically in
tests/test_wmh.py.
"""

from __future__ import annotations

import numpy as np

_U32_MASK = 0xFFFFFFFF


def generate_params(dim: int, size: int, seed: int) -> dict[str, np.ndarray]:
    """Seeded (rs, ln_cs, betas), each float32 of shape (size, dim).

    Deterministic given (dim, size, seed): the reference requires param
    reuse across runs for consistent results (``doc/model/wmh.md:12-14``,
    deferred-init reload ``apollo/hasher.py:159-166``); a fixed seed
    makes regeneration equivalent to reloading.
    """
    rng = np.random.default_rng(seed)
    rs = rng.gamma(2.0, 1.0, (size, dim)).astype(np.float32)
    ln_cs = np.log(rng.gamma(2.0, 1.0, (size, dim))).astype(np.float32)
    betas = rng.uniform(0.0, 1.0, (size, dim)).astype(np.float32)
    return {"rs": rs, "ln_cs": ln_cs, "betas": betas}


def weighted_minhash_scalar(v: np.ndarray, rs: np.ndarray, ln_cs: np.ndarray,
                            betas: np.ndarray) -> np.ndarray:
    """Scalar oracle over a dense float32 weight vector.

    Faithful port of the reference NumPy path ``apollo/hasher.py:237-256``
    (NaN-masked dense argmin); used only in tests to pin the vectorized
    kernel's numerics.
    """
    size = rs.shape[0]
    if len(v) != rs.shape[1]:
        raise ValueError("dimension mismatch: %d != %d" % (len(v), rs.shape[1]))
    if not (v > 0).any():
        raise ValueError("input has no positive weights")
    out = np.zeros((size, 2), dtype=np.uint32)
    v = np.asarray(v, dtype=np.float32)
    vlog = np.full(len(v), np.nan, dtype=np.float32)
    np.log(v, where=v > 0, out=vlog)
    for i in range(size):
        t = np.floor(vlog / rs[i] + betas[i])
        ln_a = ln_cs[i] - (t - betas[i]) * rs[i] - rs[i]
        k = int(np.nanargmin(ln_a))
        out[i, 0] = k
        out[i, 1] = np.uint32(int(t[k]) & _U32_MASK)
    return out


def weighted_minhash_batch(indptr: np.ndarray, indices: np.ndarray,
                           data: np.ndarray, rs: np.ndarray, ln_cs: np.ndarray,
                           betas: np.ndarray, nnz_budget: int = 1 << 16) -> np.ndarray:
    """Vectorized signatures for a CSR batch of weighted bags.

    ``indptr``/``indices``/``data`` describe a (n_docs x dim) CSR matrix
    with strictly positive weights and **sorted column indices per row**
    (sorted order makes the sparse argmin tie-break identically to the
    dense ``nanargmin`` of the scalar oracle).

    Work is chunked so the (size x nnz_chunk) temporaries stay ~tens of
    MB regardless of batch size: memory is O(size * nnz_budget), never
    O(size * dim) per doc — the reference's dense-vector scalar path
    cannot scale past small vocabularies, this can.

    Returns (n_docs, size, 2) uint32.
    """
    size = rs.shape[0]
    n_docs = len(indptr) - 1
    out = np.empty((n_docs, size, 2), dtype=np.uint32)
    if n_docs == 0:
        return out
    data = np.asarray(data, dtype=np.float32)
    vlog_all = np.log(data)
    sample_idx = np.arange(size)

    d = 0
    while d < n_docs:
        # grow the doc chunk until the nnz budget is hit (>=1 doc)
        e = d + 1
        while e < n_docs and indptr[e + 1] - indptr[d] <= nnz_budget:
            e += 1
        s_flat, e_flat = int(indptr[d]), int(indptr[e])
        idx = indices[s_flat:e_flat]
        vlog = vlog_all[s_flat:e_flat]

        r = rs[:, idx]                        # (size, m)
        b = betas[:, idx]
        t = np.floor(vlog / r + b)
        ln_a = ln_cs[:, idx] - (t - b) * r - r

        for doc in range(d, e):
            cs, ce = int(indptr[doc]) - s_flat, int(indptr[doc + 1]) - s_flat
            if ce == cs:
                raise ValueError("empty bag at row %d" % doc)
            k_rel = np.argmin(ln_a[:, cs:ce], axis=1)
            out[doc, :, 0] = idx[cs:ce][k_rel]
            tk = t[sample_idx, cs + k_rel].astype(np.int64)
            out[doc, :, 1] = (tk & _U32_MASK).astype(np.uint32)
        d = e
    return out
