"""SimHash kernel (Charikar 2002) — the alternative near-dup sketch.

Not in the reference (apollo is Weighted-MinHash-only) but named by the
north rule ("MinHash/SimHash") and standard in large-scale webtext
dedup: a 64-bit signature whose Hamming distance tracks cosine
similarity of the weighted feature bags.  Candidate generation uses
band rotation: split the 64 bits into ``bands`` chunks; docs sharing
any chunk value are candidates (finds all pairs within
``64/bands - 1`` bit flips per chunk pigeonhole).
"""

from __future__ import annotations

import numpy as np

from apollo_ray.hashing import splitmix64

_BIT_COLS = (np.uint64(1) << np.arange(64, dtype=np.uint64))


def simhash(feature_hashes: np.ndarray, weights: np.ndarray) -> int:
    """64-bit SimHash of a weighted feature bag."""
    if len(feature_hashes) == 0:
        return 0
    bits = (feature_hashes[:, None] & _BIT_COLS[None, :]) != 0
    acc = np.where(bits, weights[:, None], -weights[:, None]).sum(axis=0)
    return int(np.bitwise_or.reduce(_BIT_COLS[acc > 0]) if (acc > 0).any() else 0)


def simhash_batch(list_of_hashes: list[np.ndarray],
                  list_of_weights: list[np.ndarray]) -> np.ndarray:
    out = np.empty(len(list_of_hashes), dtype=np.uint64)
    for i, (h, w) in enumerate(zip(list_of_hashes, list_of_weights)):
        out[i] = simhash(np.asarray(h, dtype=np.uint64),
                         np.asarray(w, dtype=np.float32))
    return out


def simhash_bands(sigs: np.ndarray, bands: int = 4) -> np.ndarray:
    """(n, bands) uint64 band keys: mixed (band_id, chunk) pairs."""
    sigs = np.asarray(sigs, dtype=np.uint64)
    width = 64 // bands
    mask = (np.uint64(1) << np.uint64(width)) - np.uint64(1)
    out = np.empty((len(sigs), bands), dtype=np.uint64)
    for b in range(bands):
        chunk = (sigs >> np.uint64(b * width)) & mask
        out[:, b] = splitmix64(chunk ^ splitmix64(np.full(len(sigs), b, dtype=np.uint64)))
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise Hamming distance between uint64 arrays."""
    x = np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64)
    # vectorized popcount via byte view + table
    table = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
    return table[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1).astype(np.int64)
