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


def _first_distinct_pairs(pairs_u: np.ndarray, pairs_v: np.ndarray
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Distinct (u, v) pairs keeping the FIRST occurrence of each, in
    original emission order (lexsort + adjacent-equal mask — the same
    value-pair dedup discipline as ``edges.bucket_pair_edges``)."""
    seq = np.arange(len(pairs_u), dtype=np.int64)
    o = np.lexsort((seq, pairs_v, pairs_u))
    su, sv = pairs_u[o], pairs_v[o]
    first = np.ones(len(o), dtype=bool)
    first[1:] = (su[1:] != su[:-1]) | (sv[1:] != sv[:-1])
    keep = np.sort(o[first])
    return pairs_u[keep], pairs_v[keep]


def build_quadratic_edges(doc_ids: np.ndarray, bucket_ids: np.ndarray,
                          max_pairs: int = 200_000
                          ) -> tuple[np.ndarray, np.ndarray]:
    """All-pairs-within-bucket doc<->doc edges for one CC (the
    reference's quadratic mode, ``apollo/graph.py:234-249``), distinct
    pairs, capped at ``max_pairs`` edges.

    Vectorized: per bucket segment the upper triangle is emitted with
    the ``np.repeat`` ragged-row pattern (same family as
    ``edges.bucket_pair_edges`` / ``kernels.segments``); the cap keeps
    exactly the first ``max_pairs`` DISTINCT pairs in the original
    per-pair insertion order (buckets ascending, members lexicographic
    within a bucket — pinned identical to the previous set-based loop).
    Memory stays bounded under the cap: a bucket emits at most
    ``max_pairs + <previously emitted>`` rows, because duplicates can
    only repeat previously-seen pairs, so that prefix is guaranteed to
    contain the distinct pairs still needed.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    bucket_ids = np.asarray(bucket_ids, dtype=np.int64)
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    if len(doc_ids) == 0:
        return empty
    order = np.lexsort((doc_ids, bucket_ids))
    b_s, d_s = bucket_ids[order], doc_ids[order]
    n = len(b_s)
    new_seg = np.ones(n, dtype=bool)
    new_seg[1:] = b_s[1:] != b_s[:-1]
    seg_start = np.flatnonzero(new_seg)
    seg_end = np.concatenate((seg_start[1:], [n]))

    acc_u = np.empty(0, dtype=np.int64)
    acc_v = np.empty(0, dtype=np.int64)
    chunks_u: list[np.ndarray] = []
    chunks_v: list[np.ndarray] = []
    pending = 0
    capped = False
    for s, e in zip(seg_start.tolist(), seg_end.tolist()):
        members = d_s[s:e]
        m_first = np.ones(e - s, dtype=bool)
        m_first[1:] = members[1:] != members[:-1]
        members = members[m_first]          # sorted unique (d_s sorted)
        m = len(members)
        if m < 2:
            continue
        budget = max_pairs + len(acc_u) + pending
        row_len = np.arange(m - 1, 0, -1, dtype=np.int64)
        cum = np.cumsum(row_len)
        total = int(cum[-1])
        n_rows = (m - 1 if total <= budget
                  else int(np.searchsorted(cum, budget)) + 1)
        counts = row_len[:n_rows]
        tot = int(counts.sum())
        a_idx = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
        offs = np.zeros(n_rows, dtype=np.int64)
        np.cumsum(counts[:-1], out=offs[1:])
        b_idx = (np.arange(tot, dtype=np.int64) - offs[a_idx]) + a_idx + 1
        chunks_u.append(members[a_idx][:budget])
        chunks_v.append(members[b_idx][:budget])
        pending += len(chunks_u[-1])
        if len(acc_u) + pending >= max_pairs:
            acc_u, acc_v = _first_distinct_pairs(
                np.concatenate([acc_u] + chunks_u),
                np.concatenate([acc_v] + chunks_v))
            chunks_u, chunks_v = [], []
            pending = 0
            if len(acc_u) >= max_pairs:
                acc_u, acc_v = acc_u[:max_pairs], acc_v[:max_pairs]
                capped = True
                break
    if not capped and pending:
        acc_u, acc_v = _first_distinct_pairs(
            np.concatenate([acc_u] + chunks_u),
            np.concatenate([acc_v] + chunks_v))
        acc_u, acc_v = acc_u[:max_pairs], acc_v[:max_pairs]
    if len(acc_u) == 0:
        return empty
    o = np.lexsort((acc_v, acc_u))
    return acc_u[o], acc_v[o]


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
    n = len(verts)
    u = np.searchsorted(verts, edges_u)
    v = np.searchsorted(verts, edges_v)
    labels = np.arange(n, dtype=np.int64)
    # symmetric CSR adjacency
    src = np.concatenate([u, v])
    dst = np.concatenate([v, u])
    w = np.concatenate([weights, weights]).astype(np.float64)
    order = np.argsort(src, kind="stable")
    src_s, dst_s, w_s = src[order], dst[order], w[order]
    indptr = np.searchsorted(src_s, np.arange(n + 1))
    # Per-vertex best-label pick.  Small graphs (the per-CC regime)
    # use ONE bincount + argmax per vertex: labels are vertex indices,
    # so argmax over the dense weight-sum array returns the smallest
    # label among max-sum ties — exactly the lexsort((uniq, -sums))
    # selection, in 2 C calls instead of 5 (measured ~3x on the
    # communities tier).  Large graphs keep the sparse unique path
    # (bincount's O(n) allocation per vertex would be O(n²)/round).
    iptr = indptr.tolist()
    dense = n <= 4096
    for _ in range(max_rounds):
        changed = False
        for i in range(n):
            s, e = iptr[i], iptr[i + 1]
            if s == e:
                continue
            if dense:
                sums = np.bincount(labels[dst_s[s:e]], weights=w_s[s:e],
                                   minlength=n)
                best = int(np.argmax(sums))
            else:
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
    # (vectorized: one minimum.at scatter instead of per-vertex dicts)
    minv = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(minv, labels, verts)
    final = minv[labels]
    return {int(verts[i]): int(final[i]) for i in range(n)}


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
    if algorithm == "walktrap":
        # built-in from-scratch Pons-Latapy implementation — the
        # reference's default algorithm no longer needs igraph;
        # 'walktrap_igraph' still resolves by reflection when the
        # library is present
        return walktrap(edges_u, edges_v, weights, **kwargs)
    if algorithm == "walktrap_igraph":
        algorithm = "walktrap"
    if _igraph is None:
        raise ImportError(
            "community algorithm %r needs igraph, which is not "
            "installed; supported built-ins are "
            "'label_propagation' and 'walktrap'" % algorithm)
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


def walktrap(edges_u: np.ndarray, edges_v: np.ndarray,
             weights: np.ndarray | None = None, t: int = 4,
             max_vertices: int = 1000) -> dict[int, int]:
    """Pure-NumPy Walktrap (Pons & Latapy 2005) — the reference's
    DEFAULT community algorithm (``apollo/__main__.py:176-179``),
    reimplemented from the paper so it no longer requires igraph.

    Dense formulation sized for per-CC subgraphs (near-dup components
    are small): lazy random walk ``P = (A + I) / (d + 1)`` (the
    original walktrap's self-loop transform), ``P^t`` by matrix power,
    community distance

        r²(C1,C2) = Σ_k (P^t_{C1,k} - P^t_{C2,k})² / d_k

    and Ward-style agglomeration minimizing
    Δσ = (|C1||C2| / (|C1|+|C2|)) · r² / n over ADJACENT community
    pairs, returning the intermediate partition with maximum
    (weighted) modularity.  Deterministic: Δσ ties break on the
    communities' smallest original vertex ids.

    Components larger than ``max_vertices`` fall back to
    :func:`label_propagation` (documented scale boundary — the dense
    O(n²·t + merges·n) walk is the small-component tool, exactly how
    the reference uses walktrap per fat CC).
    """
    eu = np.asarray(edges_u, dtype=np.int64)
    ev = np.asarray(edges_v, dtype=np.int64)
    w = (np.ones(len(eu), dtype=np.float64) if weights is None
         else np.asarray(weights, dtype=np.float64))
    verts = np.unique(np.concatenate([eu, ev]))
    n = len(verts)
    if n == 0:
        return {}
    if n == 1:
        return {int(verts[0]): int(verts[0])}
    if n > max_vertices:
        return label_propagation(edges_u, edges_v, weights)
    ui = np.searchsorted(verts, eu)
    vi = np.searchsorted(verts, ev)
    A0 = np.zeros((n, n), dtype=np.float64)
    np.add.at(A0, (ui, vi), w)
    np.add.at(A0, (vi, ui), w)
    np.fill_diagonal(A0, np.diag(A0) / 2)   # self-edges counted once
    # lazy walk: self-loop of weight 1 per vertex (walktrap transform)
    A = A0 + np.eye(n)
    d = A.sum(axis=1)
    P = A / d[:, None]
    Pt = np.linalg.matrix_power(P, t)

    W_tot = A0.sum() / 2.0
    if W_tot == 0:
        return {int(x): int(x) for x in verts}
    deg0 = A0.sum(axis=1)

    # community state
    comm_members: dict[int, list[int]] = {i: [i] for i in range(n)}
    comm_vec = {i: Pt[i].copy() for i in range(n)}
    comm_size = {i: 1 for i in range(n)}
    comm_repr = {i: int(verts[i]) for i in range(n)}
    comm_deg = {i: float(deg0[i]) for i in range(n)}
    comm_in = {i: float(A0[i, i]) for i in range(n)}
    # community adjacency (between-weights on the ORIGINAL graph)
    nbr: dict[int, dict[int, float]] = {i: {} for i in range(n)}
    iu, iv = np.nonzero(np.triu(A0, k=1))
    for a, b in zip(iu.tolist(), iv.tolist()):
        nbr[a][b] = nbr[b].get(a, 0.0) + A0[a, b]
        nbr[b][a] = nbr[a][b]

    inv_d = 1.0 / d

    def dsigma(c1: int, c2: int) -> float:
        diff = comm_vec[c1] - comm_vec[c2]
        r2 = float(np.dot(diff * diff, inv_d))
        s1, s2 = comm_size[c1], comm_size[c2]
        return (s1 * s2) / (s1 + s2) * r2 / n

    def q_term(c: int) -> float:
        return comm_in[c] / W_tot - (comm_deg[c] / (2 * W_tot)) ** 2

    label = np.arange(n)
    q = sum(q_term(c) for c in comm_members)
    best_q = q
    best_labels = label.copy()
    live = set(comm_members)
    while len(live) > 1:
        best = None
        for c1 in sorted(live):
            for c2 in sorted(nbr[c1]):
                if c2 <= c1:
                    continue
                key = (dsigma(c1, c2), comm_repr[c1], comm_repr[c2])
                if best is None or key < best[0]:
                    best = (key, c1, c2)
        if best is None:     # disconnected communities: stop merging
            break
        _, c1, c2 = best
        # merge c2 into c1
        q -= q_term(c1) + q_term(c2)
        between = nbr[c1].pop(c2, 0.0)
        nbr[c2].pop(c1, None)
        comm_in[c1] += comm_in[c2] + between
        comm_deg[c1] += comm_deg[c2]
        comm_vec[c1] = (comm_size[c1] * comm_vec[c1]
                        + comm_size[c2] * comm_vec[c2]) \
            / (comm_size[c1] + comm_size[c2])
        comm_size[c1] += comm_size[c2]
        comm_repr[c1] = min(comm_repr[c1], comm_repr[c2])
        comm_members[c1].extend(comm_members[c2])
        for c3, wgt in nbr[c2].items():
            nbr[c3].pop(c2, None)
            nbr[c1][c3] = nbr[c1].get(c3, 0.0) + wgt
            nbr[c3][c1] = nbr[c1][c3]
        del (comm_members[c2], comm_vec[c2], comm_size[c2],
             comm_repr[c2], comm_deg[c2], comm_in[c2], nbr[c2])
        live.discard(c2)
        q += q_term(c1)
        for m in comm_members[c1]:
            label[m] = c1
        if q > best_q + 1e-12:
            best_q = q
            best_labels = label.copy()

    out: dict[int, int] = {}
    reprs: dict[int, int] = {}
    for i in range(n):
        c = int(best_labels[i])
        reprs.setdefault(c, int(verts[i]))
        reprs[c] = min(reprs[c], int(verts[i]))
    for i in range(n):
        out[int(verts[i])] = reprs[int(best_labels[i])]
    return out
