"""Bloom-filter dedup tier — the memory-bounded approximate
exact-dedup pass that web-scale pipelines (CCNet, Dolma's dedupe
tool) run when the distinct-key set is too large to shuffle or hold
per node.  The reference engine has no analog (its exact tier always
shuffles full keys); this is the extra tier that makes the dedup
ladder exact -> bloom -> MinHash/LSH -> semantic complete.

Semantics (deterministic, so the whole decision is SQL-oracle-able):
each document derives ``k`` bit positions in an ``m``-bit filter via
Kirsch-Mitzenmacher double hashing (pos_j = (lo + j*hi) mod m, with
``lo``/``hi`` the two 64-bit halves of md5(text) — bit-identical to
DuckDB's ``md5_number_lower`` / ``md5_number_upper``).  Documents are
ordered by ``doc_id``; a document is *flagged* iff every one of its
distinct positions was already set by some earlier document (the
classic test-then-insert bloom decision).  Exact duplicates share all
positions, so every non-first duplicate is always flagged (no false
negatives); false positives occur with the textbook probability
(1 - e^{-kn/m})^k and only ever OVER-flag.

Scale shape (100 TB): two pkey shuffles of fixed-width rows and one
final group pass — the document text never moves.

1. map: (pos, doc_id, n_pos, pkey=hash(pos)) rows, k per doc (~32 B
   each, so a billion-doc corpus at k=4 shuffles ~128 GB — spread
   over the cluster, never collected).
2. groupby(pkey): per position group the first setter is
   min(doc_id); each row's "was already set" bit is
   doc_id > min(doc_id).  Pre-aggregated per doc inside the
   partition before re-emitting, so stage-2 output is at most one
   row per (doc, partition).
3. groupby(hash(doc_id)): sum the per-partition set-counts; flagged
   iff n_set == n_pos.

``m`` MUST be a power of two: then m | 2^64 and the uint64
wraparound of (lo + j*hi) agrees exactly with DuckDB's non-wrapping
HUGEINT arithmetic mod m, which is what makes the oracle bridge
bit-exact.

Unlike a physical bit-array bloom (which would need the filter
resident per worker), the first-setter-min formulation computes the
same flag decision with hash-partitioned aggregation — no shared
mutable state, no broadcast of an m-bit array, and it is exact with
respect to the declared ordering rather than dependent on a racy
insertion schedule.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

import ray.data

from apollo_ray.hashing import mix_to_partition

_EMPTY_ROWS = pa.table({
    "pos": pa.array([], type=pa.int64()),
    "doc_id": pa.array([], type=pa.int64()),
    "n_pos": pa.array([], type=pa.int64()),
    "pkey": pa.array([], type=pa.int32()),
})

_EMPTY_PART = pa.table({
    "doc_id": pa.array([], type=pa.int64()),
    "n_pos": pa.array([], type=pa.int64()),
    "n_set": pa.array([], type=pa.int64()),
    "pkey2": pa.array([], type=pa.int32()),
})

_EMPTY_OUT = pa.table({
    "doc_id": pa.array([], type=pa.int64()),
    "n_pos": pa.array([], type=pa.int64()),
    "n_set": pa.array([], type=pa.int64()),
    "flagged": pa.array([], type=pa.bool_()),
})


def _md5_halves(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(lower, upper) 64-bit md5 halves per text, little-endian —
    matching DuckDB md5_number_lower (digest[8:]) and
    md5_number_upper (digest[:8]).  hashlib's C md5 loop is the
    fastest md5 on this host (see NOTES_r2: vectorized-numpy md5 is
    2x slower end-to-end)."""
    n = len(texts)
    lo = np.empty(n, dtype=np.uint64)
    hi = np.empty(n, dtype=np.uint64)
    for i, t in enumerate(texts):
        d = hashlib.md5(t.encode("utf-8", "surrogatepass")).digest()
        hi[i], lo[i] = struct.unpack("<2Q", d)
    return lo, hi


def doc_positions(texts: list[str], k: int, m: int
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Distinct bloom positions per doc.  Returns (flat_pos, n_pos):
    row-major concatenation of each doc's sorted distinct positions
    and the per-doc distinct count.  Fully vectorized after the md5
    loop."""
    if not texts:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    lo, hi = _md5_halves(texts)
    j = np.arange(k, dtype=np.uint64)
    # uint64 wraparound is exact mod m because m | 2^64 (power of two)
    pos = (lo[:, None] + j[None, :] * hi[:, None]) % np.uint64(m)
    pos = np.sort(pos.astype(np.int64), axis=1)
    keep = np.ones(pos.shape, dtype=bool)
    keep[:, 1:] = pos[:, 1:] != pos[:, :-1]
    return pos[keep], keep.sum(axis=1).astype(np.int64)


def bloom_dedup(docs: "ray.data.Dataset", k: int = 4, log2_m: int = 20,
                num_partitions: int = 64) -> "ray.data.Dataset":
    """(doc_id, n_pos, n_set, flagged) per document: distinct bloom
    positions, how many of them an earlier (smaller doc_id) document
    had already set, and the bloom dedup flag (all set => duplicate).

    ``docs`` needs (doc_id, text).  ``m = 2 ** log2_m`` bits; size m
    to ~10-15 bits per expected document for a ~0.1-1% FP rate at
    k=4 (FPs only over-flag; exact duplicates are always caught).
    """
    if log2_m < 1 or log2_m > 40:
        raise ValueError("log2_m must be in [1, 40]")
    m = 1 << log2_m

    def explode(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        if not texts:
            return _EMPTY_ROWS
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        flat_pos, n_pos = doc_positions(texts, k, m)
        doc_rep = np.repeat(ids, n_pos)
        return pa.table({
            "pos": pa.array(flat_pos, type=pa.int64()),
            "doc_id": pa.array(doc_rep, type=pa.int64()),
            "n_pos": pa.array(np.repeat(n_pos, n_pos), type=pa.int64()),
            "pkey": pa.array(mix_to_partition(flat_pos, num_partitions),
                             type=pa.int32()),
        })

    def first_setter_hits(group: pa.Table) -> pa.Table:
        """Per position group: first setter = min(doc_id); per row the
        already-set bit; pre-aggregated per doc before re-emitting."""
        if group.num_rows == 0:
            return _EMPTY_PART
        p = np.asarray(group.column("pos"), dtype=np.int64)
        d = np.asarray(group.column("doc_id"), dtype=np.int64)
        npos = np.asarray(group.column("n_pos"), dtype=np.int64)
        order = np.lexsort((d, p))
        p, d, npos = p[order], d[order], npos[order]
        starts = np.flatnonzero(np.r_[True, p[1:] != p[:-1]])
        seg = np.repeat(np.arange(len(starts)),
                        np.diff(np.r_[starts, len(p)]))
        hit = d > d[starts][seg]
        ud, uidx, inv = np.unique(d, return_index=True, return_inverse=True)
        n_set = np.bincount(inv, weights=hit).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ud, type=pa.int64()),
            "n_pos": pa.array(npos[uidx], type=pa.int64()),
            "n_set": pa.array(n_set, type=pa.int64()),
            "pkey2": pa.array(mix_to_partition(ud, num_partitions),
                              type=pa.int32()),
        })

    def combine(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _EMPTY_OUT
        d = np.asarray(group.column("doc_id"), dtype=np.int64)
        npos = np.asarray(group.column("n_pos"), dtype=np.int64)
        nset = np.asarray(group.column("n_set"), dtype=np.int64)
        ud, uidx, inv = np.unique(d, return_index=True, return_inverse=True)
        tot = np.bincount(inv, weights=nset).astype(np.int64)
        np_u = npos[uidx]
        return pa.table({
            "doc_id": pa.array(ud, type=pa.int64()),
            "n_pos": pa.array(np_u, type=pa.int64()),
            "n_set": pa.array(tot, type=pa.int64()),
            "flagged": pa.array(tot == np_u, type=pa.bool_()),
        })

    return docs.map_batches(explode, batch_format="pyarrow") \
        .groupby("pkey").map_groups(first_setter_hits,
                                    batch_format="pyarrow") \
        .groupby("pkey2").map_groups(combine, batch_format="pyarrow")
