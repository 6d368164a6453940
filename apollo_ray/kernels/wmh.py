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

Implementation note: the hot path computes ``t = floor(vlog * (1/r)
+ beta)`` and ``ln_a = (ln_c + (beta-1)*r) - t*r`` with the reciprocal
and the constant term precomputed per (sample, feature).  This is
algebraically identical to the reference formula and differs only on a
measure-zero set of float ties (the reference's own CUDA and NumPy
paths differ likewise); the scalar oracle below uses the same fused
form so kernel-vs-oracle tests are exact.  The Ioffe guarantee
(P[sample collision] = weighted Jaccard) is tested statistically in
tests/test_wmh.py.
"""

from __future__ import annotations

import numpy as np

_U32_MASK = 0xFFFFFFFF

# rows per cache tile in the batch kernel: 512 rows x 128 samples x
# 4 B = 256 KB per buffer touch — sized to per-core L2
_ROW_TILE = 512


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


def derive_params(rs: np.ndarray, ln_cs: np.ndarray, betas: np.ndarray
                  ) -> dict[str, np.ndarray]:
    """Precompute the hot-path parameter arrays, transposed to
    C-contiguous (dim, size) so each present feature gathers one
    contiguous row:

    - ``rinv_t`` = 1/r
    - ``beta_t`` = beta
    - ``r_t``    = r
    - ``c2_t``   = ln_c + (beta - 1) * r   (the doc-independent part of
                                            ln_a)
    """
    rinv = (np.float32(1.0) / rs).astype(np.float32)
    c2 = (ln_cs + (betas - np.float32(1.0)) * rs).astype(np.float32)
    return {
        "rinv_t": np.ascontiguousarray(rinv.T),
        "beta_t": np.ascontiguousarray(betas.T),
        "r_t": np.ascontiguousarray(rs.T),
        "c2_t": np.ascontiguousarray(c2.T),
    }


def weighted_minhash_scalar(v: np.ndarray, rs: np.ndarray, ln_cs: np.ndarray,
                            betas: np.ndarray) -> np.ndarray:
    """Scalar oracle over a dense float32 weight vector.

    Port of the reference NumPy path ``apollo/hasher.py:237-256``
    (NaN-masked dense argmin) in the fused form documented above; used
    only in tests to pin the vectorized kernel's numerics.
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
    rinv = (np.float32(1.0) / rs).astype(np.float32)
    c2 = (ln_cs + (betas - np.float32(1.0)) * rs).astype(np.float32)
    for i in range(size):
        t = np.floor(vlog * rinv[i] + betas[i])
        ln_a = c2[i] - t * rs[i]
        k = int(np.nanargmin(ln_a))
        out[i, 0] = k
        out[i, 1] = np.uint32(int(t[k]) & _U32_MASK)
    return out


def weighted_minhash_batch(indptr: np.ndarray, indices: np.ndarray,
                           data: np.ndarray, rs: np.ndarray, ln_cs: np.ndarray,
                           betas: np.ndarray, nnz_budget: int = 1 << 16
                           ) -> np.ndarray:
    """Convenience wrapper: derive the transposed params and delegate
    to :func:`wmh_batch_t`.  Actors pre-derive once instead."""
    return wmh_batch_t(indptr, indices, data,
                       derive_params(rs, ln_cs, betas), nnz_budget=nnz_budget)


def make_work_buffers(size: int, nnz_budget: int = 1 << 16
                      ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Preallocate (and pre-fault) the three kernel work buffers.

    First-touch page faults are expensive on virtualized hosts; actors
    allocate these ONCE in ``__init__`` and reuse them every batch.
    """
    bufs = tuple(np.empty((nnz_budget, size), dtype=np.float32)
                 for _ in range(3))
    for b in bufs:
        b.fill(0)  # touch every page now, not in the first hot batch
    return bufs


def wmh_batch_t(indptr: np.ndarray, indices: np.ndarray, data: np.ndarray,
                dparams: dict[str, np.ndarray],
                nnz_budget: int = 1 << 16,
                work_bufs: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None
                ) -> np.ndarray:
    """Vectorized signatures for a CSR batch of weighted bags.

    ``indptr``/``indices``/``data`` describe a (n_docs x dim) CSR matrix
    with strictly positive weights and **sorted column indices per row**
    (sorted order makes the sparse argmin tie-break identically to the
    dense ``nanargmin`` of the scalar oracle).

    Work is chunked and runs in three preallocated (nnz_budget, size)
    float32 buffers — memory is O(size * nnz_budget), never
    O(size * dim) per doc (the reference's dense scalar path cannot
    scale past small vocabularies), and the per-chunk op count is the
    minimum the Ioffe recurrence allows: 4 row-gathers + 5 elementwise
    passes.

    Returns (n_docs, size, 2) uint32.
    """
    rinv_t = dparams["rinv_t"]
    beta_t = dparams["beta_t"]
    r_t = dparams["r_t"]
    c2_t = dparams["c2_t"]
    size = rinv_t.shape[1]
    n_docs = len(indptr) - 1
    out = np.empty((n_docs, size, 2), dtype=np.uint32)
    if n_docs == 0:
        return out
    data = np.asarray(data, dtype=np.float32)
    vlog_all = np.log(data)
    sample_idx = np.arange(size)
    if work_bufs is None:
        work_bufs = make_work_buffers(size, nnz_budget)
    buf_t, buf_a, buf_g = work_bufs
    nnz_budget = min(nnz_budget, buf_t.shape[0])

    d = 0
    while d < n_docs:
        # grow the doc chunk until the nnz budget is hit (>=1 doc)
        e = d + 1
        while e < n_docs and indptr[e + 1] - indptr[d] <= nnz_budget:
            e += 1
        s_flat, e_flat = int(indptr[d]), int(indptr[e])
        m = e_flat - s_flat
        idx = indices[s_flat:e_flat]
        vlog = vlog_all[s_flat:e_flat, None]
        if m > nnz_budget:  # single doc larger than the budget
            t_arr = np.empty((m, size), dtype=np.float32)
            a_arr = np.empty((m, size), dtype=np.float32)
            g_arr = np.empty((m, size), dtype=np.float32)
        else:
            t_arr, a_arr, g_arr = buf_t[:m], buf_a[:m], buf_g[:m]

        # Cache-blocked fill: the recurrence touches each (row, size)
        # tile ~9 times; processing L2-sized row tiles keeps those
        # touches in cache, so the only DRAM-streamed traffic is one
        # compulsory write each of t_arr/a_arr (plus the argmin read
        # below).  The unblocked form streamed ~9 full-buffer passes
        # through DRAM — the measured single-host scaling ceiling.
        tile = _ROW_TILE
        for ts in range(0, m, tile):
            te = min(m, ts + tile)
            it = idx[ts:te]
            tt = t_arr[ts:te]
            at = a_arr[ts:te]
            gt = g_arr[:te - ts]
            np.take(rinv_t, it, axis=0, out=tt)
            np.multiply(tt, vlog[ts:te], out=tt)
            np.take(beta_t, it, axis=0, out=gt)
            np.add(tt, gt, out=tt)
            np.floor(tt, out=tt)                     # t
            np.take(r_t, it, axis=0, out=gt)
            np.multiply(tt, gt, out=gt)              # t * r
            np.take(c2_t, it, axis=0, out=at)
            np.subtract(at, gt, out=at)              # ln_a

        for doc in range(d, e):
            cs, ce = int(indptr[doc]) - s_flat, int(indptr[doc + 1]) - s_flat
            if ce == cs:
                raise ValueError("empty bag at row %d" % doc)
            k_rel = np.argmin(a_arr[cs:ce, :], axis=0)
            out[doc, :, 0] = idx[cs:ce][k_rel]
            tk = t_arr[cs + k_rel, sample_idx].astype(np.int64)
            out[doc, :, 1] = (tk & _U32_MASK).astype(np.uint32)
        d = e
    return out
