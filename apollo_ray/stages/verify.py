"""Pairwise verification stage (A4 — the `--precise` tier).

The reference verifies candidates by exact weighted Jaccard against
the probe (``apollo/query.py:45-66``) and scores communities pairwise
(``CommunityEvaluator``, ``apollo/graph.py:349-377``).  Its clustering
itself is UNVERIFIED bucket transitive closure; verification here is
therefore an *optional precision tier*: candidate edges (u, v) keep
only pairs with weighted_jaccard >= threshold before the CC stage.

Distributed join strategy: ``Dataset.join`` (hash-partitioned) attaches
the sparse bags of both endpoints, then a vectorized-per-pair kernel
computes J.  The edge set is ~|duplicate docs|, orders of magnitude
smaller than the corpus, so two hash joins on it are cheap relative to
the band shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from apollo_ray.config import DedupConfig
from apollo_ray.kernels.jaccard import weighted_jaccard_sparse
from apollo_ray.stages.wmh_stage import list_columns_to_csr


def _jaccard_filter(batch: pa.Table, threshold: float) -> pa.Table:
    ip_u, ix_u, w_u = list_columns_to_csr(batch, "indices_u", "weights_u")
    ip_v, ix_v, w_v = list_columns_to_csr(batch, "indices_v", "weights_v")
    n = batch.num_rows
    keep = np.zeros(n, dtype=bool)
    sims = np.zeros(n, dtype=np.float32)
    for i in range(n):
        s = weighted_jaccard_sparse(
            ix_u[ip_u[i]:ip_u[i + 1]], w_u[ip_u[i]:ip_u[i + 1]],
            ix_v[ip_v[i]:ip_v[i + 1]], w_v[ip_v[i]:ip_v[i + 1]])
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
    from apollo_ray.util import join_partitions
    num_partitions = join_partitions(num_partitions)
    bag_cols = bags.select_columns(["doc_id", "indices", "weights"])
    ju = edges.join(bag_cols, join_type="inner",
                    num_partitions=num_partitions,
                    on=("u",), right_on=("doc_id",))
    ju = ju.rename_columns({"indices": "indices_u", "weights": "weights_u"})
    jv = ju.join(bag_cols, join_type="inner",
                 num_partitions=num_partitions,
                 on=("v",), right_on=("doc_id",))
    jv = jv.rename_columns({"indices": "indices_v", "weights": "weights_v"})
    return jv.map_batches(_jaccard_filter, batch_format="pyarrow",
                          fn_kwargs={"threshold": cfg.threshold})
