"""Classic (unweighted) k-permutation MinHash over binary feature sets.

The reference hashes *weighted* bags with Ioffe WMH (``kernels/wmh.py``,
mirroring ``apollo/hasher.py``); large-scale webtext pipelines
(ccnet / Gopher / RefinedWeb-style dedup, Spark ``MinHashLSH``,
datasketch ``MinHash``) instead use the classic Broder scheme over the
*distinct* shingle set: sample ``j`` of a document with feature set
``S`` is

    sig_j = min over v in S of  (a_j * v + b_j) mod p

with per-sample random 32-bit coefficients ``a_j`` (odd-free, nonzero)
and ``b_j`` and a fixed prime ``p > 2**32``.  ``P[sig_j(A) == sig_j(B)]
= |A∩B| / |A∪B|`` (plain Jaccard), so the same LSH banding math
(``kernels/lsh.py``) applies unchanged — only the per-sample collision
probability now estimates *set* Jaccard instead of weighted Jaccard.

Why it exists alongside WMH: the kernel reads each feature value once
and keeps its entire parameter state (2 × ``size`` uint64) in L1 — no
(dim × size) parameter gather — so it is compute-bound and scales with
cores where the WMH kernel hits the DRAM ceiling (see BENCH/BASELINE.md).
It is the cheap high-throughput mode for corpora where binary shingle
Jaccard is the accepted similarity (most web-dedup configs).

Everything is exact uint64 arithmetic: values and coefficients are
``< 2**32`` so ``v*a + b < 2**64`` never wraps, and DuckDB UBIGINT
reproduces the signature bit-for-bit (the SQL oracle in
``__ray_entry__.py`` is generated from :func:`generate_minhash_params`).
"""

from __future__ import annotations

import numpy as np

# smallest prime > 2**32: keeps (v*a+b) % p exact in uint64 for
# 32-bit v/a/b and is representable in DuckDB's UBIGINT
P_MINHASH = 4294967311

# samples per tile in the batch kernel: bounds the (tile x nnz)
# temporaries; 8 measured fastest on this host (smaller live set per
# pass beats fewer passes over the value stream)
_SAMPLE_TILE = 8

_M32 = np.uint64(0xFFFFFFFF)
_S32 = np.uint64(32)
_C15 = np.uint64(15)
_P16 = np.uint64(16) * np.uint64(P_MINHASH)


def _mod_p_inplace(t: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """In-place ``t % P_MINHASH`` for arbitrary uint64 ``t`` without the
    hardware 64-bit divide (which costs ~10x a multiply per element).

    p = 2**32 + 15, so 2**32 ≡ -15 (mod p) and x = hi·2**32 + lo ≡
    lo - 15·hi.  Round 1 adds 16p (> 15·max(hi)) to keep the subtraction
    non-negative, leaving y ≡ x with y < 2**37; round 2 repeats with a
    single +p headroom, leaving z in (0, 2p); the final min() is the
    branchless conditional subtract (z-p wraps to a huge value iff z<p).
    Exactness is pinned by tests against ``np.remainder``.
    """
    p = np.uint64(P_MINHASH)
    np.right_shift(t, _S32, out=hi)
    np.multiply(hi, _C15, out=hi)
    np.bitwise_and(t, _M32, out=t)
    np.add(t, _P16, out=t)
    np.subtract(t, hi, out=t)
    np.right_shift(t, _S32, out=hi)
    np.multiply(hi, _C15, out=hi)
    np.bitwise_and(t, _M32, out=t)
    np.add(t, p, out=t)
    np.subtract(t, hi, out=t)
    np.subtract(t, p, out=hi)
    np.minimum(t, hi, out=t)
    return t


def generate_minhash_params(size: int, seed: int) -> dict[str, np.ndarray]:
    """Seeded permutation coefficients ``a`` (1..2**32-1) and ``b``
    (0..2**32-1), each uint64 of shape (size,).

    Deterministic given (size, seed) — the same model-reuse rule as the
    WMH params (``doc/model/wmh.md:12-14``): regeneration from the seed
    is equivalent to reloading a stored model.  The stream is
    domain-separated from the WMH gamma draws by construction (its own
    ``default_rng`` sequence).
    """
    rng = np.random.default_rng([np.uint32(seed), 0x6D696E68])  # 'minh'
    a = rng.integers(1, 1 << 32, size=size, dtype=np.uint64)
    b = rng.integers(0, 1 << 32, size=size, dtype=np.uint64)
    return {"a": a, "b": b}


def minhash_scalar(values: np.ndarray, a: np.ndarray, b: np.ndarray
                   ) -> np.ndarray:
    """Oracle: signature of one distinct-value set (any uint dtype
    < 2**32).  Returns (size,) uint64."""
    v = np.asarray(values, dtype=np.uint64)
    if len(v) == 0:
        raise ValueError("empty feature set cannot be hashed")
    size = len(a)
    out = np.empty(size, dtype=np.uint64)
    for j in range(size):
        out[j] = np.min((v * a[j] + b[j]) % np.uint64(P_MINHASH))
    return out


_MINHASH_NNZ_BUDGET = 1 << 16


def make_minhash_buffers(nnz_budget: int = _MINHASH_NNZ_BUDGET
                         ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Reusable work buffers (~12 MB at the default budget) — cache one
    set per worker process (``fused.py`` worker-state pattern) so each
    batch call touches warm pages instead of faulting fresh temporaries
    (the per-call (nnz x tile) allocation was the dominant cost under
    32-way task parallelism)."""
    return (np.empty((_SAMPLE_TILE, nnz_budget), dtype=np.uint64),
            np.empty((_SAMPLE_TILE, nnz_budget), dtype=np.uint64),
            np.empty((_SAMPLE_TILE, nnz_budget), dtype=np.uint64))


def minhash_batch(indptr: np.ndarray, values: np.ndarray,
                  a: np.ndarray, b: np.ndarray,
                  work_bufs: tuple | None = None) -> np.ndarray:
    """Batch kernel over CSR sets: (n_docs, size) uint64 signatures.

    Documents are processed in nnz-budget chunks over the (cached) work
    buffers; within a chunk, one pass per sample tile over the flat
    value stream in a (tile, nnz) layout so ``minimum.reduceat`` runs
    along axis 1 over *contiguous* per-document segments (the axis-0
    strided form is ~1.5x slower), with the divide-free
    :func:`_mod_p_inplace` reduction.  Callers must drop empty
    documents first (same contract as ``wmh_batch_t``; an empty segment
    would silently echo the next doc's first value).
    """
    n = len(indptr) - 1
    size = len(a)
    v = np.ascontiguousarray(values, dtype=np.uint64)
    out = np.empty((n, size), dtype=np.uint64)
    if n == 0:
        return out
    if work_bufs is None:
        work_bufs = make_minhash_buffers()
    tmp, scr, o2 = work_bufs
    budget = tmp.shape[1]
    indptr = np.asarray(indptr, dtype=np.int64)
    d0 = 0
    while d0 < n:
        d1 = int(np.searchsorted(indptr, indptr[d0] + budget,
                                 side="right")) - 1
        if d1 <= d0:          # one document larger than the budget
            d1 = d0 + 1
            nz = int(indptr[d1] - indptr[d0])
            t_buf = np.empty((_SAMPLE_TILE, nz), dtype=np.uint64)
            s_buf = np.empty((_SAMPLE_TILE, nz), dtype=np.uint64)
            o_buf = np.empty((_SAMPLE_TILE, 1), dtype=np.uint64)
        else:
            t_buf, s_buf, o_buf = tmp, scr, o2
        s0, s1 = int(indptr[d0]), int(indptr[d1])
        vc = v[s0:s1]
        starts = indptr[d0:d1] - s0
        nc, nd = s1 - s0, d1 - d0
        for t0 in range(0, size, _SAMPLE_TILE):
            t1 = min(t0 + _SAMPLE_TILE, size)
            t = t_buf[:t1 - t0, :nc]
            np.multiply(a[t0:t1, None], vc[None, :], out=t)
            np.add(t, b[t0:t1, None], out=t)
            _mod_p_inplace(t, s_buf[:t1 - t0, :nc])
            oc = o_buf[:t1 - t0, :nd]
            np.minimum.reduceat(t, starts, axis=1, out=oc)
            out[d0:d1, t0:t1] = oc.T
        d0 = d1
    return out


def sig_to_u32_lanes(sigs: np.ndarray) -> np.ndarray:
    """(n, size) uint64 -> (n, 2*size) uint32 lanes (native byte
    order), the storage/banding layout shared with WMH's (k, t) pairs
    so ``BandExploder`` / ``bucket_keys`` work unchanged."""
    n, size = sigs.shape
    return np.ascontiguousarray(sigs).view(np.uint32).reshape(n, 2 * size)
