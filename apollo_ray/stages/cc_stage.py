"""Distributed connected components (large-star / small-star).

Replaces the reference's driver-RAM BFS over the whole corpus
(``_find_connected_component``, ``apollo/graph.py:63-88``, called from
``find_connected_components`` ``apollo/graph.py:91-148`` — "all state
in driver RAM", the scalability liability called out in SURVEY §4) with
the alternating star algorithm of Kiveris et al., "Connected Components
in MapReduce and Beyond" (SOCC'14):

    large-star(x): m = min(N(x) ∪ {x}); emit (y, m) for y ∈ N(x), y > x
    small-star(x): over edges oriented high->low grouped by the high
                   endpoint: m = min(N(x) ∪ {x});
                   emit (y, m) for y ∈ N(x) ∪ {x}, y != m

Alternating rounds strictly shrink labels and converge to a star
around each component's minimum node — the same partition as the
reference's BFS closure, with deterministic labels (cc label = min
doc_id in the component).  Each half-round is one ``groupby`` shuffle
with a fully vectorized per-partition body (same pkey trick as
stages/edges.py: group by ``hash(node) % P``, lexsort, segment-cut —
no per-node Python).  Edge datasets are materialized per round (they
are small: one edge per non-root duplicate doc) and convergence is
detected by an order-insensitive (count, xor-of-pair-hash) checksum.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import AggregateFn

from apollo_ray.hashing import distinct_pair_idx, mix_to_partition, pair_mix


def _vec_table(u: np.ndarray, v: np.ndarray) -> pa.Table:
    return pa.table({"u": pa.array(u, type=pa.int64()),
                     "v": pa.array(v, type=pa.int64())})


def _dedup_pairs(u: np.ndarray, v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    if len(u) == 0:
        return u, v
    idx = distinct_pair_idx(u, v)
    return u[idx], v[idx]


def _add_node_pkey(batch: pa.Table, num_partitions: int, col: str) -> pa.Table:
    x = np.asarray(batch.column(col), dtype=np.int64)
    pkey = mix_to_partition(x, num_partitions)
    return batch.append_column("pkey", pa.array(pkey, type=pa.int32()))


def _symmetrize(batch: pa.Table) -> pa.Table:
    u = np.asarray(batch.column("u"), dtype=np.int64)
    v = np.asarray(batch.column("v"), dtype=np.int64)
    return _vec_table(np.concatenate([u, v]), np.concatenate([v, u]))


def _orient_high_low(batch: pa.Table) -> pa.Table:
    u = np.asarray(batch.column("u"), dtype=np.int64)
    v = np.asarray(batch.column("v"), dtype=np.int64)
    hi = np.maximum(u, v)
    lo = np.minimum(u, v)
    keep = hi != lo
    return _vec_table(hi[keep], lo[keep])


def _large_star_partition(group: pa.Table) -> pa.Table:
    # rows: (x=u, y=v) symmetric incidence, grouped so that all rows of
    # a node x are present; emit (y, min(N(x) ∪ {x})) for y > x
    x = np.asarray(group.column("u"), dtype=np.int64)
    y = np.asarray(group.column("v"), dtype=np.int64)
    if len(x) == 0:
        return _vec_table(x, y)
    order = np.lexsort((y, x))
    x_s, y_s = x[order], y[order]
    new_seg = np.empty(len(x_s), dtype=bool)
    new_seg[0] = True
    new_seg[1:] = x_s[1:] != x_s[:-1]
    seg_id = np.cumsum(new_seg) - 1
    min_nbr = y_s[new_seg]                       # min neighbor (sorted)
    m = np.minimum(min_nbr, x_s[new_seg])        # min(N(x) ∪ {x})
    mask = y_s > x_s
    u_out = y_s[mask]
    v_out = m[seg_id[mask]]
    u_out, v_out = _dedup_pairs(*_drop_loops(u_out, v_out))
    return _vec_table(u_out, v_out)


def _small_star_partition(group: pa.Table) -> pa.Table:
    # rows oriented (x=hi, y=lo) grouped by x; emit (y, m) for
    # y ∈ N(x) ∪ {x}, y != m where m = min(N(x)) (all neighbors < x)
    x = np.asarray(group.column("u"), dtype=np.int64)
    y = np.asarray(group.column("v"), dtype=np.int64)
    if len(x) == 0:
        return _vec_table(x, y)
    order = np.lexsort((y, x))
    x_s, y_s = x[order], y[order]
    new_seg = np.empty(len(x_s), dtype=bool)
    new_seg[0] = True
    new_seg[1:] = x_s[1:] != x_s[:-1]
    seg_id = np.cumsum(new_seg) - 1
    m = y_s[new_seg]                             # min neighbor (< x)
    mv = m[seg_id]
    # neighbors y != m  ->  (y, m)
    mask = y_s != mv
    u_out = np.concatenate([y_s[mask], x_s[new_seg]])
    v_out = np.concatenate([mv[mask], m])
    u_out, v_out = _dedup_pairs(*_drop_loops(u_out, v_out))
    return _vec_table(u_out, v_out)


def _drop_loops(u: np.ndarray, v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    keep = u != v
    return u[keep], v[keep]


class _XorHash(AggregateFn):
    """Order-insensitive uint64 checksum of the (u, v) pair multiset."""

    def __init__(self):
        def acc_block(acc: int, batch: pa.Table) -> int:
            u = np.asarray(batch.column("u"), dtype=np.int64)
            v = np.asarray(batch.column("v"), dtype=np.int64)
            h = pair_mix(u, v)
            return int(acc ^ int(np.bitwise_xor.reduce(h)) if len(h) else acc)

        super().__init__(
            init=lambda k: 0,
            accumulate_block=acc_block,
            merge=lambda a, b: a ^ b,
            name="xor_hash")


def _checksum(edges: "ray.data.Dataset") -> tuple[int, int]:
    res = edges.aggregate(_XorHash())
    n = edges.count()
    return (int(n), int(res["xor_hash"]) if res else 0)


def _driver_union_find(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Small-edge-set fast path: pull the (already deduplicated,
    orders-of-magnitude-smaller-than-the-corpus) edge list to the
    driver and solve the closure with vectorized min-label propagation
    + pointer jumping (Shiloach–Vishkin style; no Python-per-edge
    loop).  Labels converge to each component's minimum node, matching
    the distributed star rounds.  Only taken below
    ``DRIVER_CC_MAX_EDGES``; the star rounds handle anything larger."""
    import ray.data as rd
    df = edges.to_pandas()
    u = df["u"].to_numpy(dtype=np.int64)
    v = df["v"].to_numpy(dtype=np.int64)
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui, vi = inv[:len(u)], inv[len(u):]
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        old = label.copy()
        m = np.minimum(label[ui], label[vi])
        np.minimum.at(label, ui, m)
        np.minimum.at(label, vi, m)
        label = label[label]                     # pointer jumping
        if np.array_equal(label, old):
            break
    roots = nodes[label]
    mask = roots != nodes
    return rd.from_arrow(_vec_table(nodes[mask], roots[mask]))


DRIVER_CC_MAX_EDGES = 5_000_000
# assign_clusters' node->root broadcast fast path bound (star edges
# are exactly the non-root duplicate docs; ~80 MB at the cap)
LABEL_BROADCAST_MAX = 5_000_000


def connected_components(edges: "ray.data.Dataset",
                         num_partitions: int = 64,
                         max_rounds: int = 50,
                         driver_max_edges: int | None = None
                         ) -> "ray.data.Dataset":
    """edges (u, v) -> star edges (node, cc_root) for every non-root node.

    Semantics identical to the reference BFS closure (unit-tested
    against the translated ``tests/test_graph_ConnectedComponents.py``).
    Below ``driver_max_edges`` candidate edges (~80 MB) the closure
    runs as driver-side union-find; above it, the alternating star
    rounds run fully distributed (tests force this path with
    ``driver_max_edges=0``).

    The input is consumed RAW — no pre-orientation pass: the driver
    union-find is direction-agnostic and ignores self-loops, and the
    first large-star round symmetrizes anyway (a self-loop row (x, x)
    fails the ``y > x`` emit filter and cannot change ``min(N(x) ∪
    {x})``), so an orientation sweep before counting would be a pure
    extra pass + materialize over the edge table.

    ``driver_max_edges=None`` reads the module constant at call time
    (so the all-distributed bench mode can force every driver fast
    path off by patching the constants — see bench.py).
    """
    if driver_max_edges is None:
        driver_max_edges = DRIVER_CC_MAX_EDGES
    cur = edges.materialize()
    n_edges = cur.count()
    if n_edges == 0:
        return cur
    if n_edges <= driver_max_edges:
        return _driver_union_find(cur)
    prev_sum = None
    for _ in range(max_rounds):
        # large-star over symmetric incidence
        sym = cur.map_batches(_symmetrize, batch_format="pyarrow")
        sym = sym.map_batches(_add_node_pkey, batch_format="pyarrow",
                              fn_kwargs={"num_partitions": num_partitions,
                                         "col": "u"})
        ls = sym.groupby("pkey").map_groups(_large_star_partition,
                                            batch_format="pyarrow")
        # small-star over high->low orientation
        hl = ls.map_batches(_orient_high_low, batch_format="pyarrow")
        hl = hl.map_batches(_add_node_pkey, batch_format="pyarrow",
                            fn_kwargs={"num_partitions": num_partitions,
                                       "col": "u"})
        cur = hl.groupby("pkey").map_groups(_small_star_partition,
                                            batch_format="pyarrow")
        cur = cur.materialize()
        cs = _checksum(cur)
        if cs == prev_sum:
            break
        prev_sum = cs
    return cur


def assign_clusters_driver(doc_ids: np.ndarray,
                           final_edges: "ray.data.Dataset",
                           max_labels: int = 5_000_000
                           ) -> "ray.data.Dataset | None":
    """Cluster assignment when the doc-id universe is ALREADY
    driver-resident (the fold-extract pipeline pulls the metadata pass
    for the membership election — re-shipping a distributed label map
    over it would be a pure fixed cost): one vectorized searchsorted
    over the node->root star edges.  Returns None above ``max_labels``
    star edges (callers fall back to :func:`assign_clusters`; at real
    scale both the label map and the id universe exceed driver RAM and
    the distributed path runs).  Output is chunked into ~1M-row blocks
    so downstream stays parallel."""
    import ray.data as rd

    n = final_edges.count()
    if n > max_labels:
        return None
    cc = doc_ids.copy()
    if n:
        df = final_edges.to_pandas()
        keys = df["u"].to_numpy(dtype=np.int64)
        vals = df["v"].to_numpy(dtype=np.int64)
        order = np.argsort(keys, kind="stable")
        k_sorted, v_sorted = keys[order], vals[order]
        pos = np.searchsorted(k_sorted, doc_ids)
        hit = (pos < len(k_sorted)) & \
            (k_sorted[np.minimum(pos, len(k_sorted) - 1)] == doc_ids)
        cc[hit] = v_sorted[pos[hit]]
    t = pa.table({"doc_id": pa.array(doc_ids, type=pa.int64()),
                  "cc_id": pa.array(cc, type=pa.int64())})
    chunk = 1_000_000
    if t.num_rows <= chunk:
        return rd.from_arrow(t)
    return rd.from_arrow([t.slice(i, chunk)
                          for i in range(0, t.num_rows, chunk)])


def assign_clusters(all_docs: "ray.data.Dataset",
                    final_edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id) x star edges -> clusters (doc_id, cc_id).

    Join-free: union the trivial self-labels (doc_id, doc_id) with the
    star edges and take the min label per doc — roots and singleton
    docs label themselves.  One groupby shuffle, no driver state
    (unlike ``apollo/graph.py:99-148``).
    """
    # Fast path: when the final star-edge set is small (it is exactly
    # the set of non-root duplicate docs), broadcast the node->root map
    # once and label every doc in a single streaming map — no shuffle.
    try:
        n_labels = final_edges.count()
    except Exception:
        n_labels = None
    if n_labels is not None and n_labels <= LABEL_BROADCAST_MAX:
        import ray
        df = final_edges.to_pandas()
        if len(df):
            keys = df["u"].to_numpy(dtype=np.int64)
            vals = df["v"].to_numpy(dtype=np.int64)
        else:
            keys = vals = np.empty(0, dtype=np.int64)
        order = np.argsort(keys, kind="stable")
        # sorted (node, root) arrays: the lookup is one vectorized
        # searchsorted per batch, no per-row Python dict access
        ref = ray.put((keys[order], vals[order]))

        def label_lookup(batch: pa.Table) -> pa.Table:
            import ray as _ray
            k_sorted, v_sorted = _ray.get(ref)
            d = np.asarray(batch.column("doc_id"), dtype=np.int64)
            cc = d.copy()
            if len(k_sorted):
                pos = np.searchsorted(k_sorted, d)
                hit = (pos < len(k_sorted)) & \
                    (k_sorted[np.minimum(pos, len(k_sorted) - 1)] == d)
                cc[hit] = v_sorted[pos[hit]]
            return pa.table({"doc_id": pa.array(d, type=pa.int64()),
                             "cc_id": pa.array(cc, type=pa.int64())})

        return all_docs.map_batches(label_lookup, batch_format="pyarrow")

    def self_label(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch.column("doc_id"), dtype=np.int64)
        return pa.table({"node": pa.array(d, type=pa.int64()),
                         "label": pa.array(d, type=pa.int64())})

    def edge_label(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("u").cast(pa.int64()),
                         "label": batch.column("v").cast(pa.int64())})

    selfs = all_docs.map_batches(self_label, batch_format="pyarrow")
    labels = final_edges.map_batches(edge_label, batch_format="pyarrow")
    merged = selfs.union(labels)

    # per-node min label via the vectorized pkey pattern — Ray's
    # sort-based groupby().aggregate() pays per-group overhead, fatal
    # at one-group-per-doc cardinality
    def add_pkey(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch.column("node"), dtype=np.int64)
        return batch.append_column(
            "pkey", pa.array(mix_to_partition(n, 64), type=pa.int32()))

    def min_per_node(group: pa.Table) -> pa.Table:
        n = np.asarray(group.column("node"), dtype=np.int64)
        lab = np.asarray(group.column("label"), dtype=np.int64)
        if len(n) == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "cc_id": pa.array([], type=pa.int64())})
        order = np.lexsort((lab, n))
        n_s, l_s = n[order], lab[order]
        first = np.empty(len(n_s), dtype=bool)
        first[0] = True
        first[1:] = n_s[1:] != n_s[:-1]
        return pa.table({"doc_id": pa.array(n_s[first], type=pa.int64()),
                         "cc_id": pa.array(l_s[first], type=pa.int64())})

    return merged.map_batches(add_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(min_per_node, batch_format="pyarrow")
