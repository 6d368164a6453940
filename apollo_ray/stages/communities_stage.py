"""Communities stage: clusters -> sub-communities per fat component.

Mirrors ``detect_communities`` (``apollo/graph.py:195-269``): size-1
components are skipped, size-2 pass through as communities
(``apollo/graph.py:213-219``), larger ("fat") components run community
detection over the *linear* doc<->bucket bipartite graph
(``apollo/graph.py:222-233``, bucket vertices weighted by bucket size).

Differences from the reference's execution (not semantics):
- the reference builds every igraph object in driver RAM and ships
  pickled graphs to Spark (``apollo/graph.py:220-260``); here the
  membership rows are joined to cluster ids and grouped by ``cc_id`` so
  each component's graph is built inside ``map_groups`` on workers;
- igraph is unavailable in this container, so the default algorithm is
  the deterministic NumPy label propagation in kernels/communities.py
  (igraph algorithms plug in by reflection when importable, same
  surface as ``apollo/graph.py:277-289``).

Output: ``doc_id:int64, cc_id:int64, community_id:int64`` (community
label = min doc_id in the community).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from apollo_ray.config import DedupConfig
from apollo_ray.kernels.communities import (build_linear_edges,
                                            build_quadratic_edges, detect)


def detect_communities(clusters: "ray.data.Dataset",
                       memberships: "ray.data.Dataset",
                       cfg: DedupConfig,
                       algorithm: str = "label_propagation",
                       edges: str = "linear",
                       num_partitions: int | None = None,
                       max_quadratic_pairs: int = 200_000
                       ) -> "ray.data.Dataset":
    """clusters (doc_id, cc_id) x memberships (doc_id, bucket) ->
    (doc_id, cc_id, community_id).

    ``edges`` selects the reference's two graph constructions
    (``--edges linear|quadratic``, ``apollo/__main__.py:170-175``):
    ``linear`` builds the doc<->bucket bipartite graph with artificial
    bucket vertices (``apollo/graph.py:222-233``), ``quadratic``
    all-pairs-within-bucket doc edges (``apollo/graph.py:234-249``,
    O(n^2) per bucket — capped at ``max_quadratic_pairs`` per CC)."""
    from apollo_ray.util import hash_join
    non_trivial = clusters  # singletons drop out of the inner join below
    mem = hash_join(memberships, non_trivial, on=("doc_id",),
                    num_partitions=num_partitions)

    def per_cc(g: pd.DataFrame) -> pd.DataFrame:
        docs = g["doc_id"].to_numpy(dtype=np.int64)
        uniq = np.unique(docs)
        cc_id = int(g["cc_id"].iloc[0])
        if len(uniq) == 1:  # singleton CC: skipped (apollo/graph.py:214-215)
            return pd.DataFrame({"doc_id": [], "cc_id": [], "community_id": []})
        if len(uniq) == 2:  # pair passthrough (apollo/graph.py:216-218)
            return pd.DataFrame({
                "doc_id": uniq.astype(np.int64),
                "cc_id": np.full(2, cc_id, dtype=np.int64),
                "community_id": np.full(2, uniq.min(), dtype=np.int64)})
        buckets = g["bucket"].to_numpy(dtype=np.int64)
        if edges == "quadratic":
            eu, ev = build_quadratic_edges(docs, buckets,
                                           max_pairs=max_quadratic_pairs)
            w = None
            if len(eu) == 0:  # all buckets singleton inside this CC
                eu, ev, w = build_linear_edges(docs, buckets)
        else:
            eu, ev, w = build_linear_edges(docs, buckets)
        labels = detect(eu, ev, w, algorithm=algorithm)
        doc_set = set(int(d) for d in uniq)
        rows = [(d, cc_id, lab) for d, lab in labels.items() if d in doc_set]
        out = pd.DataFrame(rows, columns=["doc_id", "cc_id", "community_id"])
        return out.astype({"doc_id": np.int64, "cc_id": np.int64,
                           "community_id": np.int64})

    return mem.groupby("cc_id").map_groups(per_cc, batch_format="pandas")


def community_size_stats(communities: "ray.data.Dataset") -> dict:
    """mean/median/max community size (``apollo/graph.py:264-267``)."""
    sizes = communities.groupby("community_id").count()
    df = sizes.to_pandas()
    if df.empty:
        return {"n_communities": 0}
    col = "count()" if "count()" in df.columns else df.columns[-1]
    return {
        "n_communities": int(len(df)),
        "mean_size": float(df[col].mean()),
        "median_size": float(df[col].median()),
        "max_size": int(df[col].max()),
    }
