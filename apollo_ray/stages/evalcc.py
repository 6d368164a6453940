"""Community fitness evaluation (A5 — the ``evalcc`` command).

Mirrors ``evaluate_communities`` (``apollo/graph.py:380-412``) and its
``CommunityEvaluator`` (``apollo/graph.py:349-377``): for every
community with more than one distinct element, compute all pairwise
weighted Jaccard similarities; a pair below the threshold is a *miss*
contributing ``(sim - threshold)^2`` to the loss.  Per community the
reference emits ``(misses, misses/count, loss, loss/count)`` and
reduces by elementwise addition; the same totals come out of one
groupby + global aggregate here (the reference ships every bag through
a driver-built RDD join instead, ``apollo/graph.py:387-404``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Sum

from apollo_ray.config import DedupConfig
from apollo_ray.kernels.jaccard import weighted_jaccard_sparse
from apollo_ray.stages.verify import pack_bags, unpack_bag


def evaluate_communities(communities: "ray.data.Dataset",
                         bags: "ray.data.Dataset", cfg: DedupConfig,
                         num_partitions: int | None = None,
                         max_pairs_per_community: int = 100_000) -> dict:
    """-> {total_misses, total_loss, avg_normalized_misses,
           avg_normalized_loss, n_communities}.

    ``max_pairs_per_community`` bounds the O(n^2) per-community work
    (the reference has no such cap and is quadratic per community,
    ``apollo/graph.py:368-376``); communities above it are sampled and
    the count is reported.
    """
    from apollo_ray.util import hash_join
    mem = communities.select_columns(["doc_id", "community_id"])
    joined = hash_join(mem, pack_bags(bags), on=("doc_id",),
                       num_partitions=num_partitions)

    def _one_community(blobs: list) -> tuple[int, int, float, int]:
        n = len(blobs)
        if n < 2:
            return 0, 0, 0.0, 0
        pairs = n * (n - 1) // 2
        capped = int(pairs > max_pairs_per_community)
        decoded = [unpack_bag(b) for b in blobs]
        misses = 0
        loss = 0.0
        done = 0
        for i in range(n):
            for j in range(i + 1, n):
                if done >= max_pairs_per_community:
                    break
                sim = weighted_jaccard_sparse(*decoded[i], *decoded[j])
                if sim < cfg.threshold:
                    misses += 1
                    loss += (sim - cfg.threshold) ** 2
                done += 1
        return misses, done, loss, capped

    from apollo_ray.hashing import mix_to_partition
    n_parts = num_partitions or 64

    def add_pkey(batch: pa.Table) -> pa.Table:
        c = np.asarray(batch.column("community_id"), dtype=np.int64)
        return batch.append_column(
            "pkey", pa.array(mix_to_partition(c, n_parts), type=pa.int32()))

    # pkey pattern: communities segmented inside each partition (one
    # Ray group per partition, not per community — NOTES_r1 item 3)
    def per_partition(group: pa.Table) -> pa.Table:
        c = np.asarray(group.column("community_id"), dtype=np.int64)
        if len(c) == 0:
            return pa.table({"misses": pa.array([], type=pa.int64()),
                             "count": pa.array([], type=pa.int64()),
                             "loss": pa.array([], type=pa.float64()),
                             "capped": pa.array([], type=pa.int64())})
        order = np.argsort(c, kind="stable")
        blobs = group.column("bag").take(pa.array(order)).to_pylist()
        c_s = c[order]
        first = np.empty(len(c_s), dtype=bool)
        first[0] = True
        first[1:] = c_s[1:] != c_s[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(c_s))
        rows = [_one_community(blobs[st:en]) for st, en in zip(starts, ends)]
        return pa.table({
            "misses": pa.array([r[0] for r in rows], type=pa.int64()),
            "count": pa.array([r[1] for r in rows], type=pa.int64()),
            "loss": pa.array([r[2] for r in rows], type=pa.float64()),
            "capped": pa.array([r[3] for r in rows], type=pa.int64()),
        })

    per = joined.map_batches(add_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(per_partition, batch_format="pyarrow")
    agg = per.aggregate(Sum("misses", alias_name="total_misses"),
                        Sum("count", alias_name="total_pairs"),
                        Sum("loss", alias_name="total_loss"),
                        Sum("capped", alias_name="n_capped"),
                        Count(alias_name="n_communities"))
    n_comms = max(1, int(agg["n_communities"]))
    total_pairs = max(1, int(agg["total_pairs"]))
    return {
        "total_misses": int(agg["total_misses"]),
        "total_pairs": int(agg["total_pairs"]),
        "total_loss": float(agg["total_loss"]),
        "avg_normalized_misses": int(agg["total_misses"]) / total_pairs,
        "avg_normalized_loss": float(np.sqrt(float(agg["total_loss"])
                                             / total_pairs)),
        "n_communities": int(agg["n_communities"]),
        "n_capped": int(agg["n_capped"]),
    }
