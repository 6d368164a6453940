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

# samples per tile in the batch kernel: bounds the (nnz x tile)
# temporary to ~2 MB at the default nnz budget
_SAMPLE_TILE = 16


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


def minhash_batch(indptr: np.ndarray, values: np.ndarray,
                  a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Batch kernel over CSR sets: (n_docs, size) uint64 signatures.

    One pass per sample tile over the flat value stream —
    ``minimum.reduceat`` collapses each document's segment.  Callers
    must drop empty documents first (same contract as ``wmh_batch_t``;
    an empty segment would silently echo the next doc's first value).
    """
    n = len(indptr) - 1
    size = len(a)
    v = np.ascontiguousarray(values, dtype=np.uint64)
    out = np.empty((n, size), dtype=np.uint64)
    if n == 0:
        return out
    starts = np.asarray(indptr[:-1], dtype=np.int64)
    p = np.uint64(P_MINHASH)
    nnz = len(v)
    tmp = np.empty((nnz, _SAMPLE_TILE), dtype=np.uint64)
    vcol = v[:, None]
    for t0 in range(0, size, _SAMPLE_TILE):
        t1 = min(t0 + _SAMPLE_TILE, size)
        t = tmp[:, :t1 - t0]
        np.multiply(vcol, a[None, t0:t1], out=t)
        np.add(t, b[None, t0:t1], out=t)
        np.remainder(t, p, out=t)
        np.minimum.reduceat(t, starts, axis=0, out=out[:, t0:t1])
    return out


def sig_to_u32_lanes(sigs: np.ndarray) -> np.ndarray:
    """(n, size) uint64 -> (n, 2*size) uint32 lanes (native byte
    order), the storage/banding layout shared with WMH's (k, t) pairs
    so ``BandExploder`` / ``bucket_keys`` work unchanged."""
    n, size = sigs.shape
    return np.ascontiguousarray(sigs).view(np.uint32).reshape(n, 2 * size)
