"""Distributed CC (large-star/small-star) == local union-find kernel."""

import numpy as np
import pyarrow as pa
import pytest


def run_cc(edge_list, ray_session, driver_max_edges=0):
    import ray.data as rd
    from apollo_ray.stages.cc_stage import connected_components
    t = pa.table({"u": pa.array([e[0] for e in edge_list], type=pa.int64()),
                  "v": pa.array([e[1] for e in edge_list], type=pa.int64())})
    ds = rd.from_arrow(t)
    # driver_max_edges=0 forces the distributed star rounds
    out = connected_components(ds, num_partitions=4,
                               driver_max_edges=driver_max_edges).to_pandas()
    labels = {}
    if not out.empty:
        for u, v in zip(out["u"], out["v"]):
            labels[int(u)] = int(v)
    return labels


def to_partition(labels, all_nodes):
    comp = {}
    for n in all_nodes:
        comp.setdefault(labels.get(n, n), set()).add(n)
    return set(frozenset(s) for s in comp.values())


@pytest.mark.parametrize("edges", [
    [(1, 2), (2, 3), (10, 11)],
    [(5, 1), (1, 9), (9, 5), (100, 3)],
    [(i, i + 1) for i in range(50)],                      # long chain
    [(0, i) for i in range(1, 40)],                       # big star
    [],
])
def test_cc_matches_kernel(edges, ray_session):
    from apollo_ray.kernels.cc import find_connected_components
    labels = run_cc(edges, ray_session)
    nodes = sorted({x for e in edges for x in e})
    got = to_partition(labels, nodes)
    want_ccs = find_connected_components([list(e) for e in edges])
    want = set(frozenset(s) for s in want_ccs.values())
    assert got == want
    # labels are the component minimum
    for n, lab in labels.items():
        assert lab == min(min(s) for s in want if n in s)


def test_cc_random_graph(ray_session):
    rng = np.random.default_rng(5)
    edges = [(int(a), int(b)) for a, b in
             rng.integers(0, 200, size=(300, 2)) if a != b]
    from apollo_ray.kernels.cc import find_connected_components
    labels = run_cc(edges, ray_session)
    nodes = sorted({x for e in edges for x in e})
    got = to_partition(labels, nodes)
    want = set(frozenset(s)
               for s in find_connected_components([list(e) for e in edges]).values())
    assert got == want


def test_driver_fastpath_matches_distributed(ray_session):
    rng = np.random.default_rng(9)
    edges = [(int(a), int(b)) for a, b in
             rng.integers(0, 100, size=(150, 2)) if a != b]
    dist = run_cc(edges, ray_session, driver_max_edges=0)
    fast = run_cc(edges, ray_session, driver_max_edges=10 ** 6)
    nodes = sorted({x for e in edges for x in e})
    assert to_partition(dist, nodes) == to_partition(fast, nodes)


def test_assign_clusters_driver_parity_and_cap(ray_session):
    """assign_clusters_driver == the distributed assign_clusters on
    the same universe; above max_labels it returns None (callers fall
    back to the distributed path)."""
    import ray.data as rd
    from apollo_ray.stages.cc_stage import (assign_clusters,
                                            assign_clusters_driver)
    ids = np.arange(100, dtype=np.int64) + 7
    star = pa.table({"u": pa.array([8, 9, 57], type=pa.int64()),
                     "v": pa.array([7, 7, 50], type=pa.int64())})
    edges = rd.from_arrow(star)
    drv = assign_clusters_driver(ids, edges).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    docs = rd.from_arrow(pa.table({"doc_id": pa.array(ids,
                                                      type=pa.int64())}))
    dist = assign_clusters(docs, edges).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (drv["doc_id"].to_numpy() == dist["doc_id"].to_numpy()).all()
    assert (drv["cc_id"].to_numpy() == dist["cc_id"].to_numpy()).all()
    assert drv.loc[drv.doc_id == 8, "cc_id"].item() == 7
    assert drv.loc[drv.doc_id == 57, "cc_id"].item() == 50
    assert drv.loc[drv.doc_id == 20, "cc_id"].item() == 20
    assert assign_clusters_driver(ids, edges, max_labels=2) is None
