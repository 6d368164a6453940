"""Community detection inside a connected component.

The reference runs any ``igraph.Graph.community_*`` algorithm per fat
CC (``apollo/graph.py:272-297``; default walktrap
``apollo/__main__.py:176-179``) over either a *linear* doc<->bucket
bipartite graph (artificial bucket vertices offset by the total vertex
count, ``apollo/graph.py:222-233``, ``doc/model/cmd.md:6-20``) or a
*quadratic* all-pairs-within-bucket graph (``apollo/graph.py:234-249``).

igraph is not installed in this environment, so the default algorithm
is a pure-NumPy synchronous label propagation with min-label
tie-breaking (deterministic); when igraph *is* importable the same
reflection plugin surface as the reference is exposed
(``detect(algorithm="walktrap")`` etc.).
"""

from __future__ import annotations

import numpy as np

try:  # optional plugin, mirrors apollo/__main__.py:176-179 reflection
    import igraph as _igraph
except ImportError:  # pragma: no cover - not present in this container
    _igraph = None


def build_linear_edges(doc_ids: np.ndarray, bucket_ids: np.ndarray
                       ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Doc<->bucket bipartite edges for one CC (linear mode).

    ``doc_ids[i]`` is a member of ``bucket_ids[i]``.  Returns (edges_u,
    edges_v, weights) with bucket vertices relabeled into a disjoint id
    range (the reference offsets them by ``total_nvertices``,
    ``apollo/graph.py:231``); weight = bucket size
    (``apollo/graph.py:225,230``).
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    bucket_ids = np.asarray(bucket_ids, dtype=np.int64)
    uniq_b, b_idx, b_counts = np.unique(bucket_ids, return_inverse=True,
                                        return_counts=True)
    offset = np.int64(doc_ids.max()) + np.int64(1) if len(doc_ids) else np.int64(0)
    edges_u = doc_ids
    edges_v = offset + b_idx.astype(np.int64)
    weights = b_counts[b_idx].astype(np.float64)
    return edges_u, edges_v, weights


def build_quadratic_edges(doc_ids: np.ndarray, bucket_ids: np.ndarray,
                          max_pairs: int = 200_000
                          ) -> tuple[np.ndarray, np.ndarray]:
    """All-pairs-within-bucket doc<->doc edges for one CC (the
    reference's quadratic mode, ``apollo/graph.py:234-249``), distinct
    pairs, capped at ``max_pairs`` emitted edges."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    bucket_ids = np.asarray(bucket_ids, dtype=np.int64)
    order = np.lexsort((doc_ids, bucket_ids))
    b_s, d_s = bucket_ids[order], doc_ids[order]
    pairs: set[tuple[int, int]] = set()
    start = 0
    for i in range(1, len(b_s) + 1):
        if i == len(b_s) or b_s[i] != b_s[start]:
            members = np.unique(d_s[start:i])
            for a in range(len(members)):
                for b in range(a + 1, len(members)):
                    pairs.add((int(members[a]), int(members[b])))
                    if len(pairs) >= max_pairs:
                        break
                if len(pairs) >= max_pairs:
                    break
            start = i
        if len(pairs) >= max_pairs:
            break
    if not pairs:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    arr = np.asarray(sorted(pairs), dtype=np.int64)
    return arr[:, 0], arr[:, 1]


def label_propagation(edges_u: np.ndarray, edges_v: np.ndarray,
                      weights: np.ndarray | None = None,
                      max_rounds: int = 50) -> dict[int, int]:
    """Deterministic asynchronous weighted label propagation.

    Vertices are updated sequentially in increasing-id order (in-place
    labels), which is deterministic and cannot oscillate (synchronous
    LPA swaps labels forever on bipartite structures like a single
    edge).  Each vertex adopts the label with maximum incident weight
    among its neighbors (ties -> smallest label).  Runs per connected
    component inside ``map_groups`` — component sizes are dedup-cluster
    sized, so the sequential loop is cheap.
    Returns {vertex: community_label}.
    """
    edges_u = np.asarray(edges_u, dtype=np.int64)
    edges_v = np.asarray(edges_v, dtype=np.int64)
    if weights is None:
        weights = np.ones(len(edges_u), dtype=np.float64)
    verts = np.unique(np.concatenate([edges_u, edges_v]))
    vmap = {int(x): i for i, x in enumerate(verts)}
    n = len(verts)
    u = np.fromiter((vmap[int(x)] for x in edges_u), dtype=np.int64, count=len(edges_u))
    v = np.fromiter((vmap[int(x)] for x in edges_v), dtype=np.int64, count=len(edges_v))
    labels = np.arange(n, dtype=np.int64)
    # symmetric CSR adjacency
    src = np.concatenate([u, v])
    dst = np.concatenate([v, u])
    w = np.concatenate([weights, weights]).astype(np.float64)
    order = np.argsort(src, kind="stable")
    src_s, dst_s, w_s = src[order], dst[order], w[order]
    indptr = np.searchsorted(src_s, np.arange(n + 1))
    for _ in range(max_rounds):
        changed = False
        for i in range(n):
            s, e = indptr[i], indptr[i + 1]
            if s == e:
                continue
            nbr_labels = labels[dst_s[s:e]]
            uniq, inv = np.unique(nbr_labels, return_inverse=True)
            sums = np.zeros(len(uniq))
            np.add.at(sums, inv, w_s[s:e])
            best = uniq[np.lexsort((uniq, -sums))[0]]
            if best != labels[i]:
                labels[i] = best
                changed = True
        if not changed:
            break
    # normalize labels to the min original vertex id per community
    out: dict[int, int] = {}
    lab_to_min: dict[int, int] = {}
    for i in range(n):
        lab = int(labels[i])
        vid = int(verts[i])
        if lab not in lab_to_min or vid < lab_to_min[lab]:
            lab_to_min[lab] = vid
    for i in range(n):
        out[int(verts[i])] = lab_to_min[int(labels[i])]
    return out


def detect(edges_u: np.ndarray, edges_v: np.ndarray,
           weights: np.ndarray | None = None,
           algorithm: str = "label_propagation", **kwargs) -> dict[int, int]:
    """Community detection with the reference's plugin surface.

    ``label_propagation`` (default) runs the NumPy implementation;
    any other name requires igraph and resolves ``community_<name>``
    by reflection exactly like ``apollo/graph.py:277-289``.

    DOCUMENTED DIVERGENCE from the reference: apollo's default is
    igraph walktrap (``apollo/__main__.py:176-179``); igraph is not
    installable in this environment, so the default here is the
    dependency-free label-propagation kernel.  Requesting an igraph
    algorithm without igraph raises (no silent fallback) — when igraph
    becomes available the reflection path below activates unchanged.
    """
    if algorithm == "label_propagation":
        return label_propagation(edges_u, edges_v, weights)
    if _igraph is None:
        raise ImportError(
            "community algorithm %r needs igraph, which is not "
            "installed; the supported fallback is "
            "algorithm='label_propagation'" % algorithm)
    verts = np.unique(np.concatenate([edges_u, edges_v]))
    vmap = {int(x): i for i, x in enumerate(verts)}
    g = _igraph.Graph(
        n=len(verts),
        edges=[(vmap[int(a)], vmap[int(b)]) for a, b in zip(edges_u, edges_v)],
        directed=False)
    action = getattr(g, "community_" + algorithm)
    if algorithm == "infomap":
        kwargs.setdefault("edge_weights", None if weights is None else list(weights))
    elif algorithm != "leading_eigenvector_naive":
        kwargs.setdefault("weights", None if weights is None else list(weights))
    result = action(**kwargs)
    if hasattr(result, "as_clustering"):
        result = result.as_clustering()
    out: dict[int, int] = {}
    for comm_id, members in enumerate(result):
        lo = min(int(verts[m]) for m in members)
        for m in members:
            out[int(verts[m])] = lo
    return out
