"""Bucket formation -> candidate edges (the central shuffle, A2).

The reference writes band rows into Cassandra clustered by
``(hashtable, value, sha1)`` and reconstructs buckets by a driver-side
sequential scan-and-cut (``apollo/graph.py:103-119``) — single-process
over the entire corpus.  Here the same semantics ("any two documents
sharing a band value are in one bucket", ``doc/model/cc.md:10-11``) run
as ONE hash shuffle + vectorized segmentation:

1. every band row gets ``pkey = mix(bucket) % P`` — all rows of a
   bucket land in the same partition, partitions are balanced because
   buckets are hashed (mega-bucket skew only matters if a single bucket
   outgrows a partition's memory; its edge output stays LINEAR because
   of star edges, unlike the reference's quadratic mode
   ``apollo/graph.py:241-247``);
2. ``groupby(pkey).map_groups`` — P python calls total, each running a
   fully vectorized lexsort + segment-cut + ``np.repeat`` star-edge
   emit: each bucket contributes (member -> min_member) edges, which
   preserve the transitive closure exactly (D4).

Edges are deduplicated per partition (same pair from different bands
collapses early, shrinking the CC input by ~htnum x).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Max, Mean, Min

from apollo_ray.config import DedupConfig
from apollo_ray.hashing import (distinct_pair_idx, mix_to_partition,
                                pair_mix, splitmix64)


def _add_salted_pkey(batch: pa.Table, num_partitions: int, salt: int
                     ) -> pa.Table:
    if "pkey" in batch.column_names:   # re-keying a pre-keyed band table
        batch = batch.drop_columns(["pkey"])
    b = np.asarray(batch.column("bucket"), dtype=np.int64)
    if salt > 1:
        d = np.asarray(batch.column("doc_id"), dtype=np.int64)
        key = (b.astype(np.uint64)
               ^ splitmix64((d % salt).astype(np.uint64))).astype(np.int64)
    else:
        key = b
    pkey = mix_to_partition(key, num_partitions)
    return batch.append_column("pkey", pa.array(pkey, type=pa.int32()))


def _star_edges_in_partition(group: pa.Table, emit_reps: bool) -> pa.Table:
    """Vectorized per-partition star edges: for every bucket segment
    emit (member -> local_min); with ``emit_reps`` also emit one
    (bucket, local_min) representative row per segment for the
    second-level link pass."""
    bucket = np.asarray(group.column("bucket"), dtype=np.int64)
    doc = np.asarray(group.column("doc_id"), dtype=np.int64)
    order = np.lexsort((doc, bucket))
    b_s, d_s = bucket[order], doc[order]
    empty = pa.table({"u": pa.array([], type=pa.int64()),
                      "v": pa.array([], type=pa.int64()),
                      "rep_bucket": pa.array([], type=pa.int64())})
    if len(b_s) == 0:
        return empty
    new_seg = np.empty(len(b_s), dtype=bool)
    new_seg[0] = True
    new_seg[1:] = b_s[1:] != b_s[:-1]
    seg_id = np.cumsum(new_seg) - 1
    seg_min = d_s[new_seg]          # first doc per bucket == min (sorted)
    u = d_s[~new_seg]
    v = seg_min[seg_id[~new_seg]]
    keep = u != v                    # doc repeated in one bucket is impossible,
    u, v = u[keep], v[keep]          # but keep the guard cheap and explicit
    # dedup identical (u, v) pairs emitted by different buckets/bands
    # (value-exact — see hashing.distinct_pair_idx)
    first_idx = distinct_pair_idx(u, v)
    u, v = u[first_idx], v[first_idx]
    rb = np.full(len(u), -1, dtype=np.int64)
    if emit_reps:
        u = np.concatenate([u, seg_min])
        v = np.concatenate([v, seg_min])
        rb = np.concatenate([rb, b_s[new_seg]])
    return pa.table({"u": pa.array(u, type=pa.int64()),
                     "v": pa.array(v, type=pa.int64()),
                     "rep_bucket": pa.array(rb, type=pa.int64())})


def bucket_star_edges(bands: "ray.data.Dataset", cfg: DedupConfig,
                      num_partitions: int = 64,
                      pre_keyed: bool = False) -> "ray.data.Dataset":
    """bands (band_id, bucket, doc_id) -> candidate edges (u, v).

    ``cfg.bucket_salt == 1`` (default): single hash-partitioned
    grouping — every bucket lands whole in one partition, one exchange,
    fully lazy.  Per-partition memory is N/P plus the largest single
    bucket, which is fine until a corpus has boilerplate mega-buckets.

    ``cfg.bucket_salt == S > 1``: two-level salted grouping (SURVEY §4
    skew design): level 1 groups by ``(bucket, doc_id % S)`` so a
    mega-bucket (a band value shared by millions of docs) is split
    across S partitions, each emitting stars to its LOCAL minimum plus
    one representative row; level 2 groups only the representatives
    (<= S rows per bucket) by bucket and links the local minima.
    Connectivity is preserved exactly (star-of-stars = star);
    per-partition peak memory is capped at |bucket|/S ids regardless of
    skew — at the measured price of a second ~n_buckets-row exchange
    (~2x stage cost on skew-free webtext, exchange_microbench.py).
    """
    salt = max(1, cfg.bucket_salt)
    if pre_keyed:
        # the fused hash map already emitted the identical salted pkey
        # column (fused.fused_hash_batch) — skip the extra full pass
        # over the band table
        keyed = bands
    else:
        keyed = bands.map_batches(_add_salted_pkey, batch_format="pyarrow",
                                  fn_kwargs={"num_partitions": num_partitions,
                                             "salt": salt})
    level1 = keyed.groupby("pkey").map_groups(
        _star_edges_in_partition, batch_format="pyarrow",
        fn_kwargs={"emit_reps": salt > 1})
    if salt <= 1:
        # single-level: complete buckets per partition, no rep rows —
        # stay lazy (column projection fuses with the groupby output)
        return level1.map_batches(lambda t: t.select(["u", "v"]),
                                  batch_format="pyarrow")
    # two-level: the rep rows feed a second grouping, so the level-1
    # output is consumed twice — pin it
    level1 = level1.materialize()

    def just_edges(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch.column("rep_bucket"), -1)
        return batch.filter(mask).select(["u", "v"])

    edges1 = level1.map_batches(just_edges, batch_format="pyarrow")

    def reps_as_bands(batch: pa.Table) -> pa.Table:
        mask = pc.not_equal(batch.column("rep_bucket"), -1)
        sub = batch.filter(mask)
        return pa.table({"bucket": sub.column("rep_bucket"),
                         "doc_id": sub.column("u")})

    reps = level1.map_batches(reps_as_bands, batch_format="pyarrow")
    keyed2 = reps.map_batches(_add_salted_pkey, batch_format="pyarrow",
                              fn_kwargs={"num_partitions": num_partitions,
                                         "salt": 1})
    edges2 = keyed2.groupby("pkey").map_groups(
        _star_edges_in_partition, batch_format="pyarrow",
        fn_kwargs={"emit_reps": False}) \
        .map_batches(lambda t: t.select(["u", "v"]), batch_format="pyarrow")
    return edges1.union(edges2)


def bucket_pair_edges(bands: "ray.data.Dataset", cfg: DedupConfig,
                      num_partitions: int = 64) -> "ray.data.Dataset":
    """All-pairs candidate edges per bucket — the VERIFY-tier edge set.

    Star edges only test (member, bucket-minimum) pairs: under
    verification two docs that are >= threshold to each other but each
    < threshold to the minimum would lose connectivity.  Here every
    co-bucket pair becomes a candidate (the reference's quadratic mode,
    ``apollo/graph.py:241-249``), capped at ``cfg.max_bucket_pairs``
    pairs per bucket — an over-cap bucket falls back to star edges
    (connectivity preserved, those edges still verified; the fallback
    count is observable via ``bucket_stats``).
    """
    max_pairs = max(1, cfg.max_bucket_pairs)
    keyed = bands.map_batches(_add_salted_pkey, batch_format="pyarrow",
                              fn_kwargs={"num_partitions": num_partitions,
                                         "salt": 1})

    def pairs_part(group: pa.Table) -> pa.Table:
        bucket = np.asarray(group.column("bucket"), dtype=np.int64)
        doc = np.asarray(group.column("doc_id"), dtype=np.int64)
        empty = pa.table({"u": pa.array([], type=pa.int64()),
                          "v": pa.array([], type=pa.int64())})
        if len(bucket) == 0:
            return empty
        order = np.lexsort((doc, bucket))
        b_s, d_s = bucket[order], doc[order]
        new_seg = np.empty(len(b_s), dtype=bool)
        new_seg[0] = True
        new_seg[1:] = b_s[1:] != b_s[:-1]
        starts = np.flatnonzero(new_seg)
        counts = np.diff(np.append(starts, len(b_s)))
        us, vs = [], []
        m2 = counts == 2
        if m2.any():
            s2 = starts[m2]
            us.append(d_s[s2]); vs.append(d_s[s2 + 1])
        for st, c in zip(starts[counts > 2], counts[counts > 2]):
            if c * (c - 1) // 2 > max_pairs:
                # star fallback for the over-cap bucket
                us.append(d_s[st + 1:st + c])
                vs.append(np.full(c - 1, d_s[st], dtype=np.int64))
                continue
            iu, iv = np.triu_indices(c, k=1)
            us.append(d_s[st:st + c][iv]); vs.append(d_s[st:st + c][iu])
        if not us:
            return empty
        u = np.concatenate(us); v = np.concatenate(vs)
        keep = u != v
        u, v = u[keep], v[keep]
        first_idx = distinct_pair_idx(u, v)
        return pa.table({"u": pa.array(u[first_idx], type=pa.int64()),
                         "v": pa.array(v[first_idx], type=pa.int64())})

    return keyed.groupby("pkey").map_groups(pairs_part,
                                            batch_format="pyarrow")


def bucket_stats(bands: "ray.data.Dataset") -> dict:
    """Sanity metrics of ``apollo/graph.py:129-138``: bucket count, mean
    elements per bucket, min/max buckets per element.  Two extra
    shuffles — test/metrics only, not on the bench path."""
    per_bucket = bands.groupby(["band_id", "bucket"]).aggregate(
        Count(alias_name="n"))
    b = per_bucket.aggregate(Count(alias_name="n_buckets"),
                             Mean("n", alias_name="mean_elements"),
                             Max("n", alias_name="max_elements"))
    per_doc = bands.groupby("doc_id").aggregate(Count(alias_name="n"))
    d = per_doc.aggregate(Min("n", alias_name="min_buckets_per_doc"),
                          Max("n", alias_name="max_buckets_per_doc"),
                          Count(alias_name="n_docs"))
    return {
        "n_buckets": int(b["n_buckets"]),
        "mean_elements_per_bucket": float(b["mean_elements"]),
        "max_elements_per_bucket": int(b["max_elements"]),
        "min_buckets_per_doc": int(d["min_buckets_per_doc"]),
        "max_buckets_per_doc": int(d["max_buckets_per_doc"]),
        "n_docs": int(d["n_docs"]),
    }
