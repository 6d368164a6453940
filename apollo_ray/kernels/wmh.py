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
    """The hot-path parameter tables, transposed to C-contiguous
    (dim, size) so each present feature gathers one contiguous row:
    ``r_t`` = r, ``beta_t`` = beta, ``c2_t`` = ln_c + (beta-1)*r.

    Still exactly three tables (96 MB broadcast at the 2^16 x 128
    defaults), but ``c2`` is stored PRECOMPUTED instead of ``ln_c``:
    for a unit-weight feature (tf=1 under logtf weighting — the
    overwhelming majority of shingle occurrences in webtext)
    ``vlog = log(1.0) = +0.0`` exactly, hence ``t = floor(0*(1/r) +
    beta) = 0`` (beta ∈ [0,1)) and ``ln_a = c2 - 0*r = c2`` — the c2
    row IS the answer.  The kernel gathers ONE row (512 B) for those
    occurrences instead of three, and runs the full recurrence only
    for weights != 1.  The kernel gather is DRAM-bandwidth-bound (the
    measured multi-process scaling ceiling), so this cuts the
    dominant traffic ~3x on tf=1-heavy corpora while staying
    bit-identical to the scalar oracle (IEEE: ``0*r = +0``,
    ``floor(beta) = 0``, ``c2 - (+0) = c2``; pinned by tests).

    ``c2`` is computed with the scalar oracle's float32 op sequence
    (``ln_cs + (betas - 1) * rs``) so the bits match exactly."""
    rs = np.asarray(rs, dtype=np.float32)
    ln_cs = np.asarray(ln_cs, dtype=np.float32)
    betas = np.asarray(betas, dtype=np.float32)
    c2 = (ln_cs + (betas - np.float32(1.0)) * rs).astype(np.float32)
    return {
        "r_t": np.ascontiguousarray(rs.T),
        "beta_t": np.ascontiguousarray(betas.T),
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
                      ) -> tuple[np.ndarray, ...]:
    """Preallocate (and pre-fault) the three kernel work buffers.

    The kernel never needs more than one L2 row tile per buffer — the
    argmin is fused into the tile pass (see :func:`wmh_batch_t`) — so
    the buffers are (min(nnz_budget, _ROW_TILE), size), i.e. 256 KB
    each at the defaults, regardless of how large a batch is hashed.
    Five buffers: the full-tile t and ln_a targets plus three temps
    (r, beta, t-accumulator) for the non-unit-weight row subset.

    First-touch page faults are expensive on virtualized hosts; actors
    allocate these ONCE in ``__init__`` and reuse them every batch.
    """
    rows = max(1, min(int(nnz_budget), _ROW_TILE))
    bufs = tuple(np.empty((rows, size), dtype=np.float32)
                 for _ in range(5))
    for b in bufs:
        b.fill(0)  # touch every page now, not in the first hot batch
    return bufs


def wmh_batch_t(indptr: np.ndarray, indices: np.ndarray, data: np.ndarray,
                dparams: dict[str, np.ndarray],
                nnz_budget: int = 1 << 16,
                work_bufs: tuple[np.ndarray, ...] | None = None
                ) -> np.ndarray:
    """Vectorized signatures for a CSR batch of weighted bags.

    ``indptr``/``indices``/``data`` describe a (n_docs x dim) CSR matrix
    with strictly positive weights and **sorted column indices per row**
    (sorted order makes the sparse argmin tie-break identically to the
    dense ``nanargmin`` of the scalar oracle).

    The recurrence runs in preallocated L2-sized row-tile buffers
    (``min(nnz_budget, _ROW_TILE)`` x size float32, 256 KB each at the
    defaults) and the per-doc argmin is FUSED into the tile pass: each
    tile's ln_a values are reduced into the per-doc running minimum
    while still hot in L2, so no (m x size) intermediate ever streams
    through DRAM.  Unit-weight occurrences (tf=1 under logtf — the
    overwhelming majority in webtext) gather ONE precomputed ``c2``
    row (512 B) which IS their ln_a (t = 0); only non-unit rows gather
    r and beta and run the full recurrence.  The remaining DRAM
    traffic is therefore ~1 parameter row per present feature plus
    the (size, 2) output per doc.  An earlier version materialized
    full-chunk t/ln_a buffers (2 x 32 MB at the 2^16 budget) and
    re-read them in a second argmin pass; that streaming traffic was
    the measured single-host 8->32-proc scaling ceiling.

    Tie-breaking is identical to a whole-doc ``argmin``: within a tile
    ``np.argmin`` keeps the first minimal row, and the cross-tile merge
    updates only on strictly-smaller values, so the earliest minimal
    row always wins.

    Returns (n_docs, size, 2) uint32.
    """
    beta_t = dparams["beta_t"]
    r_t = dparams["r_t"]
    c2_t = dparams["c2_t"]
    size = r_t.shape[1]
    n_docs = len(indptr) - 1
    out = np.empty((n_docs, size, 2), dtype=np.uint32)
    if n_docs == 0:
        return out
    row_nnz = np.diff(indptr)
    if (row_nnz == 0).any():
        raise ValueError("empty bag at row %d"
                         % int(np.flatnonzero(row_nnz == 0)[0]))
    data = np.asarray(data, dtype=np.float32)
    # unit-weight occurrences (tf=1 under logtf — the vast majority in
    # webtext) have vlog = +0.0 exactly, so t = floor(beta) = 0 and
    # ln_a = c2: the precomputed c2 row is the whole answer and only
    # the rows below take the full recurrence
    heavy_mask = data != np.float32(1.0)
    vlog_all = np.zeros((len(data), 1), dtype=np.float32)
    np.log(data, where=heavy_mask, out=vlog_all[:, 0])
    sample_idx = np.arange(size)
    if work_bufs is None or len(work_bufs) < 5:
        work_bufs = make_work_buffers(size, nnz_budget)
    buf_t, buf_a, buf_g, buf_l, buf_x = work_bufs
    buf_t.fill(0.0)          # t rows default to 0 (unit-weight value);
    # non-unit rows scatter their t in and restore zeros after each
    # tile; fully-dense tiles defer the restore until a tile with
    # unit rows actually needs it
    tt_full_dirty = False
    tile = max(1, min(int(nnz_budget), _ROW_TILE, buf_t.shape[0]))
    one = np.float32(1.0)

    m_total = int(indptr[-1])
    # Running best for the (single) doc straddling the current tile
    # boundary; doc row ranges are contiguous, so at most one doc is
    # ever "open" across tiles.
    open_doc = -1
    run_a = np.empty(size, dtype=np.float32)
    run_k = np.empty(size, dtype=np.uint32)
    run_t = np.empty(size, dtype=np.float32)

    doc = 0  # first doc with rows >= ts
    for ts in range(0, m_total, tile):
        te = min(m_total, ts + tile)
        n = te - ts
        it = indices[ts:te]
        tt = buf_t[:n]
        at = buf_a[:n]
        # ONE gather per row: the c2 row IS ln_a for unit weights
        # (and their t rows are already 0 in the pre-zeroed buffer)
        np.take(c2_t, it, axis=0, out=at)
        nz = np.flatnonzero(heavy_mask[ts:te])
        if tt_full_dirty and len(nz) < n:
            # a previous fully-dense tile overwrote every t row and
            # deferred its cleanup; unit rows need zeros again
            buf_t.fill(0.0)
            tt_full_dirty = False
        if len(nz) == n:
            # whole tile non-unit (tf-weighted corpora): dense path,
            # no fancy-index copies — same cost as the pre-c2 kernel
            tt_full_dirty = True
            g = buf_g[:n]
            b = buf_l[:n]
            x = buf_x[:n]
            np.take(r_t, it, axis=0, out=g)       # r
            np.divide(one, g, out=x)              # 1/r
            np.multiply(x, vlog_all[ts:te], out=x)
            np.take(beta_t, it, axis=0, out=b)    # beta
            np.add(x, b, out=x)
            np.floor(x, out=x)                    # t
            np.copyto(tt, x)
            np.multiply(x, g, out=g)              # t * r
            np.subtract(at, g, out=at)            # ln_a = c2 - t*r
        elif len(nz):
            # full recurrence for the (rare) non-unit-weight rows,
            # same float32 op sequence as the scalar oracle
            m_nz = len(nz)
            itnz = it[nz]
            g = buf_g[:m_nz]
            b = buf_l[:m_nz]
            x = buf_x[:m_nz]
            np.take(r_t, itnz, axis=0, out=g)     # r
            np.divide(one, g, out=x)              # 1/r
            np.multiply(x, vlog_all[ts:te][nz], out=x)
            np.take(beta_t, itnz, axis=0, out=b)  # beta
            np.add(x, b, out=x)
            np.floor(x, out=x)                    # t
            tt[nz] = x
            np.multiply(x, g, out=g)              # t * r
            np.subtract(at[nz], g, out=g)         # ln_a = c2 - t*r
            at[nz] = g

        # reduce each doc segment inside [ts, te) while hot in L2
        while doc < n_docs and int(indptr[doc]) < te:
            cs = max(int(indptr[doc]), ts) - ts
            ce = min(int(indptr[doc + 1]), te) - ts
            k_rel = np.argmin(at[cs:ce], axis=0)
            seg_a = at[cs:ce][k_rel, sample_idx]
            seg_t = tt[cs + k_rel, sample_idx]
            seg_k = it[cs:ce][k_rel].astype(np.uint32)
            closes = int(indptr[doc + 1]) <= te
            if doc != open_doc:
                if closes:  # whole doc inside this tile: write directly
                    out[doc, :, 0] = seg_k
                    out[doc, :, 1] = (seg_t.astype(np.int64)
                                      & _U32_MASK).astype(np.uint32)
                    doc += 1
                    continue
                open_doc = doc
                run_a[:] = seg_a
                run_k[:] = seg_k
                run_t[:] = seg_t
            else:
                upd = seg_a < run_a  # strict: earlier tile wins ties
                np.copyto(run_a, seg_a, where=upd)
                np.copyto(run_k, seg_k, where=upd)
                np.copyto(run_t, seg_t, where=upd)
            if closes:
                out[doc, :, 0] = run_k
                out[doc, :, 1] = (run_t.astype(np.int64)
                                  & _U32_MASK).astype(np.uint32)
                open_doc = -1
                doc += 1
            else:
                break  # doc continues into the next tile
        if 0 < len(nz) < n:
            tt[nz] = 0.0     # restore the unit-weight t default
    return out
