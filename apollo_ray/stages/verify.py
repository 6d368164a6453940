"""Pairwise verification stage (A4 — the `--precise` tier).

The reference verifies candidates by exact weighted Jaccard against
the probe (``apollo/query.py:45-66``) and scores communities pairwise
(``CommunityEvaluator``, ``apollo/graph.py:349-377``).  Its clustering
itself is UNVERIFIED bucket transitive closure; verification here is
therefore an *optional precision tier*: candidate edges (u, v) keep
only pairs with weighted_jaccard >= threshold before the CC stage.

Distributed join strategy: the sparse bags are packed into a single
``binary`` column (Acero hash joins reject list-typed payload columns),
``Dataset.join`` attaches both endpoints' blobs to each candidate edge,
and a per-pair kernel computes J.  The edge set is ~|duplicate docs|,
orders of magnitude smaller than the corpus, so two hash joins on it
are cheap relative to the band shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from apollo_ray.config import DedupConfig
from apollo_ray.kernels.jaccard import weighted_jaccard_sparse


def pack_bags(bags: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, indices, weights) -> (doc_id, bag: binary).

    Layout: ``uint32[n] indices || float32[n] weights`` (n = len/8).
    """
    from apollo_ray.stages.wmh_stage import list_columns_to_csr

    def pack(batch: pa.Table) -> pa.Table:
        indptr, indices, data = list_columns_to_csr(batch, "indices", "weights")
        blobs = [indices[s:e].tobytes() + data[s:e].tobytes()
                 for s, e in zip(indptr[:-1], indptr[1:])]
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "bag": pa.array(blobs, type=pa.binary()),
        })

    return bags.map_batches(pack, batch_format="pyarrow")


def unpack_bag(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    n = len(blob) // 8
    idx = np.frombuffer(blob[:4 * n], dtype=np.uint32)
    w = np.frombuffer(blob[4 * n:], dtype=np.float32)
    return idx, w


def _jaccard_filter(batch: pa.Table, threshold: float,
                    binary: bool = False) -> pa.Table:
    """``binary``: plain set Jaccard over the feature indices (the
    similarity the unweighted MinHash signatures estimate); otherwise
    weighted Jaccard over the bag weights (the WMH similarity)."""
    bu = batch.column("bag_u").to_pylist()
    bv = batch.column("bag_v").to_pylist()
    n = batch.num_rows
    keep = np.zeros(n, dtype=bool)
    sims = np.zeros(n, dtype=np.float32)
    for i in range(n):
        iu, wu = unpack_bag(bu[i])
        iv, wv = unpack_bag(bv[i])
        if binary:
            inter = len(np.intersect1d(iu, iv, assume_unique=True))
            union = len(iu) + len(iv) - inter
            s = inter / union if union else 0.0
        else:
            s = weighted_jaccard_sparse(iu, wu, iv, wv)
        sims[i] = s
        keep[i] = s >= threshold
    out = pa.table({
        "u": batch.column("u"),
        "v": batch.column("v"),
        "similarity": pa.array(sims, type=pa.float32()),
    })
    return out.filter(pa.array(keep))


def verify_edges(edges: "ray.data.Dataset", bags: "ray.data.Dataset",
                 cfg: DedupConfig, num_partitions: int | None = None
                 ) -> "ray.data.Dataset":
    """Keep candidate edges whose exact weighted Jaccard >= threshold."""
    from apollo_ray.util import hash_join
    packed = pack_bags(bags)
    ju = hash_join(edges, packed, on=("u",), right_on=("doc_id",),
                   num_partitions=num_partitions)
    ju = ju.rename_columns({"bag": "bag_u"})
    jv = hash_join(ju, packed, on=("v",), right_on=("doc_id",),
                   num_partitions=num_partitions)
    jv = jv.rename_columns({"bag": "bag_v"})
    return jv.map_batches(
        _jaccard_filter, batch_format="pyarrow",
        fn_kwargs={"threshold": cfg.threshold,
                   "binary": cfg.minhash_mode == "unweighted"})
