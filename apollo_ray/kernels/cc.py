"""Connected-components kernels.

Two layers:

- ``find_connected_components`` — a local union-find over bucket member
  lists, semantically identical to the reference's driver-side BFS
  ``_find_connected_component`` (``apollo/graph.py:63-88``): any two
  documents sharing at least one bucket land in the same component
  (``doc/model/cc.md:10-11``).  Used by unit tests (translated from
  ``tests/test_graph_ConnectedComponents.py``) and for per-group work.

- ``star_edges`` — converts a bucket member list into |bucket|-1 edges
  to the minimum member.  Stars preserve the transitive closure exactly
  while keeping |E| linear in Σ|bucket| (the reference's quadratic edge
  mode is O(n²) per bucket, ``apollo/graph.py:241-247`` — a mega-bucket
  killer at scale).

The *distributed* fixpoint lives in ``apollo_ray.stages.cc_stage``;
these kernels define the semantics it must match.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

import numpy as np


class UnionFind:
    """Array-based union-find with path halving + union by min root.

    Roots are always the minimum element of their set, so labels are
    deterministic (cc label = min doc id in the component).
    """

    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent
        root = p.setdefault(x, x)
        while p[root] != root:
            root = p[root]
        while p[x] != root:
            p[x], x = root, p[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        self.parent[hi] = lo

    def labels(self) -> dict[int, int]:
        return {x: self.find(x) for x in self.parent}


def find_connected_components(buckets: Sequence[Iterable[int]]) -> dict[int, set]:
    """Components of the bucket-sharing graph.

    Returns {component_label: set(elements)} where the label is the
    minimum element id of the component (the reference numbers CCs by
    discovery order, ``apollo/graph.py:73-87`` — only the partition
    matters and tests compare partitions).
    """
    uf = UnionFind()
    for bucket in buckets:
        it = iter(bucket)
        try:
            first = next(it)
        except StopIteration:
            continue
        uf.find(first)
        for el in it:
            uf.union(first, el)
    out: dict[int, set] = {}
    for x in uf.parent:
        out.setdefault(uf.find(x), set()).add(x)
    return out


def star_edges(members: np.ndarray) -> np.ndarray:
    """(n-1, 2) int64 edges from each member to the bucket minimum."""
    members = np.unique(np.asarray(members, dtype=np.int64))
    if len(members) < 2:
        return np.empty((0, 2), dtype=np.int64)
    lo = members[0]
    out = np.empty((len(members) - 1, 2), dtype=np.int64)
    out[:, 0] = members[1:]
    out[:, 1] = lo
    return out
