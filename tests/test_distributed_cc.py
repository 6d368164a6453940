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
