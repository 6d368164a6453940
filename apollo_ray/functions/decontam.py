"""Benchmark decontamination + deterministic sampling — two staples
of a training-data curation pipeline that the reference system (a
code-dedup engine) predates:

- ``decontaminate``: flag corpus documents sharing any word k-gram
  with a held-out benchmark/eval set (the n-gram-overlap
  decontamination used by the GPT-3 / PaLM / Llama training-data
  pipelines, typically k=13).  Shape: the benchmark side is SMALL by
  definition (an eval set), so its distinct shingle hashes are
  collected once and broadcast via ``ray.put``; the corpus side
  streams map-only through a sorted-array ``searchsorted`` membership
  probe — no shuffle, no join, no driver pass over the corpus.
- ``hash_sample``: deterministic hash-based row sampling keyed on a
  column's md5 (DuckDB ``md5_number_lower`` semantics, so the exact
  sample is SQL-reproducible) — the reproducible subsample / ablation
  split primitive.  Map-only, streams.

Scale notes (100 TB): ``decontaminate`` holds one uint64 array of
bench shingle hashes per worker (an eval set of 10^7 13-grams is
80 MB — broadcast once, read zero-copy from the object store).
Membership is by 64-bit seeded hash, not string compare: expected
false hits are |corpus shingles| x |bench| / 2^64 (about 5 spurious
flags per 10^12 x 10^7 — negligible, and they only ever OVER-flag).
The sf-scale DuckDB oracle joins on shingle STRINGS, so any hash
collision would surface as a contract mismatch.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

import ray
import ray.data

from apollo_ray.hashing import TokenHasher, shingle_hashes

# Refuse to broadcast an absurd "benchmark": the design contract is a
# small held-out set; a corpus-sized side belongs in a shuffle join.
MAX_BENCH_SHINGLES = 200_000_000


def _distinct_shingle_hashes(batch: pa.Table, k: int,
                             seed: int) -> np.ndarray:
    """Union of per-doc distinct k-shingle hashes in one batch."""
    hasher = TokenHasher(seed=seed)
    parts = []
    for t in batch.column("text").to_pylist():
        toks = t.split()
        if len(toks) < k:
            continue
        parts.append(shingle_hashes(hasher.hash_tokens(toks), k))
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts))


def bench_shingle_set(bench: "ray.data.Dataset", k: int,
                      seed: int = 42) -> "ray.ObjectRef":
    """Collect the benchmark's distinct shingle hashes into ONE sorted
    uint64 array and ``ray.put`` it (broadcast side of the probe)."""

    def per_batch(batch: pa.Table) -> pa.Table:
        h = _distinct_shingle_hashes(batch, k, seed)
        return pa.table({"sh": pa.array(h.view(np.int64), type=pa.int64())})

    chunks = []
    for ref in bench.map_batches(
            per_batch, batch_format="pyarrow").to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows:
            chunks.append(np.asarray(t.column("sh"), dtype=np.int64))
    if chunks:
        # unique over int64 views, then reinterpret: uint64 order and
        # int64 order differ, so re-sort in uint64 space for searchsorted
        merged = np.sort(np.unique(np.concatenate(chunks)).view(np.uint64))
    else:
        merged = np.empty(0, dtype=np.uint64)
    if len(merged) > MAX_BENCH_SHINGLES:
        raise ValueError(
            "benchmark side has %d distinct shingles (> %d): too large "
            "to broadcast — decontaminate expects a small eval set"
            % (len(merged), MAX_BENCH_SHINGLES))
    return ray.put(merged)


def decontaminate(docs: "ray.data.Dataset", bench: "ray.data.Dataset",
                  k: int = 13, seed: int = 42) -> "ray.data.Dataset":
    """(doc_id, n_shingles, n_bench_hits, contaminated) per corpus doc:
    distinct word-k-gram count, how many of them appear in the
    benchmark's shingle set, and the any-overlap contamination flag.
    Docs with fewer than k tokens have no shingles and are clean by
    definition.  ``bench`` is a small held-out set (text column);
    pass e.g. ``docs.filter(...)`` for leave-subset-out checks."""
    bench_ref = bench_shingle_set(bench, k, seed)

    def probe(batch: pa.Table) -> pa.Table:
        bench_sorted = ray.get(bench_ref)
        hasher = TokenHasher(seed=seed)
        ids = batch.column("doc_id").cast(pa.int64()).to_pylist()
        n_sh = np.zeros(len(ids), dtype=np.int64)
        n_hit = np.zeros(len(ids), dtype=np.int64)
        for i, t in enumerate(batch.column("text").to_pylist()):
            toks = t.split()
            if len(toks) < k:
                continue
            h = np.unique(shingle_hashes(hasher.hash_tokens(toks), k))
            n_sh[i] = len(h)
            if len(bench_sorted):
                pos = np.searchsorted(bench_sorted, h)
                pos[pos == len(bench_sorted)] = 0
                n_hit[i] = int(np.count_nonzero(bench_sorted[pos] == h))
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "n_shingles": pa.array(n_sh, type=pa.int64()),
            "n_bench_hits": pa.array(n_hit, type=pa.int64()),
            "contaminated": pa.array(n_hit > 0, type=pa.bool_()),
        })

    return docs.map_batches(probe, batch_format="pyarrow")


def _md5_u64_of(s: str) -> int:
    return struct.unpack(
        "<Q", hashlib.md5(s.encode("utf-8", "surrogatepass")).digest()[8:])[0]


def hash_sample(docs: "ray.data.Dataset", rate_permille: int,
                key: str = "doc_id") -> "ray.data.Dataset":
    """Deterministic sample: keep a row iff
    ``md5_number_lower(CAST(key AS VARCHAR)) % 1000 < rate_permille``.
    Same rows every run, machine-independent, and exactly expressible
    in SQL — the reproducibility property that makes hash sampling
    (not random_shuffle + limit) the right subsampling primitive for
    ablations and per-shard quotas.  Map-only; streams."""
    if not 0 <= rate_permille <= 1000:
        raise ValueError("rate_permille must be in [0, 1000]")
    mod = np.uint64(1000)
    thr = np.uint64(rate_permille)

    def f(batch: pa.Table) -> pa.Table:
        vals = batch.column(key).cast(pa.int64()).to_pylist()
        h = np.fromiter((_md5_u64_of(str(v)) for v in vals),
                        dtype=np.uint64, count=len(vals))
        return batch.filter(pa.array((h % mod) < thr))

    return docs.map_batches(f, batch_format="pyarrow")
