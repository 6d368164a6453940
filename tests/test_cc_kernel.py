"""Connected-components kernel tests, translated from the reference
(``/root/reference/tests/test_graph_ConnectedComponents.py:9-55``):
empty / one CC / two CCs over synthetic bucket lists, asserting the
component count and element preservation.
"""

import itertools

from apollo_ray.kernels.cc import find_connected_components, star_edges


def test_empty():
    res = find_connected_components([])
    assert len(res) == 0


def test_one_connected_component():
    buckets = []
    for _ in range(5):
        bid = len(buckets)
        buckets.append([bid, bid + 1])
    res = find_connected_components(buckets)
    assert len(res) == 1
    assert set(itertools.chain(*buckets)) == set(itertools.chain(*res.values()))


def test_two_connected_components():
    buckets = []
    for _ in range(5):
        bid = len(buckets)
        buckets.append([bid, bid + 1])
    bid = len(buckets)
    buckets.append([bid])
    for _ in range(5):
        bid = len(buckets)
        buckets.append([bid, bid + 1])
    res = find_connected_components(buckets)
    assert len(res) == 2
    assert set(itertools.chain(*buckets)) == set(itertools.chain(*res.values()))


def test_labels_are_component_minimum():
    res = find_connected_components([[5, 9], [9, 2], [30, 40]])
    assert set(res.keys()) == {2, 30}
    assert res[2] == {2, 5, 9}
    assert res[30] == {30, 40}


def test_star_edges_preserve_closure():
    # star edges of each bucket produce the same components as the
    # bucket lists themselves (the linear-edge guarantee, SURVEY §4)
    buckets = [[7, 3, 9], [9, 12], [100, 50], [1]]
    edges = [e for b in buckets for e in star_edges(b).tolist()]
    res_direct = find_connected_components(buckets)
    res_star = find_connected_components([list(e) for e in edges])
    # singleton bucket [1] has no edges -> absent from edge-based CCs
    assert res_star == {k: v for k, v in res_direct.items() if len(v) > 1}
