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

import ray.data
from ray.data.aggregate import Count, Max, Mean, Min

from apollo_ray.config import DedupConfig
from apollo_ray.hashing import mix_to_partition, pair_mix


def _add_pkey(batch: pa.Table, num_partitions: int) -> pa.Table:
    b = np.asarray(batch.column("bucket"), dtype=np.int64)
    pkey = mix_to_partition(b, num_partitions)
    return batch.append_column("pkey", pa.array(pkey, type=pa.int32()))


def _star_edges_in_partition(group: pa.Table) -> pa.Table:
    bucket = np.asarray(group.column("bucket"), dtype=np.int64)
    doc = np.asarray(group.column("doc_id"), dtype=np.int64)
    order = np.lexsort((doc, bucket))
    b_s, d_s = bucket[order], doc[order]
    if len(b_s) == 0:
        return pa.table({"u": pa.array([], type=pa.int64()),
                         "v": pa.array([], type=pa.int64())})
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
    _, first_idx = np.unique(pair_mix(u, v), return_index=True)
    return pa.table({"u": pa.array(u[first_idx], type=pa.int64()),
                     "v": pa.array(v[first_idx], type=pa.int64())})


def bucket_star_edges(bands: "ray.data.Dataset", cfg: DedupConfig,
                      num_partitions: int = 64) -> "ray.data.Dataset":
    """bands (band_id, bucket, doc_id) -> candidate edges (u, v), v < u."""
    keyed = bands.map_batches(_add_pkey, batch_format="pyarrow",
                              fn_kwargs={"num_partitions": num_partitions})
    return keyed.groupby("pkey").map_groups(
        _star_edges_in_partition, batch_format="pyarrow")


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
