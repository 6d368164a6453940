"""Community detection kernel tests (the per-algorithm smoke of
``/root/reference/tests/test_graph_CommunityDetector.py`` adapted to
the no-igraph default)."""

import numpy as np

from apollo_ray.kernels.communities import (build_linear_edges, detect,
                                            label_propagation)


def test_two_vertex_graph():
    # the reference smoke: a single edge, every vertex covered
    labels = detect(np.array([0]), np.array([1]), np.array([1.0]))
    assert set(labels.keys()) == {0, 1}
    assert labels[0] == labels[1]


def test_two_triangles_bridged():
    # two tight triangles joined by one weak edge: label propagation
    # keeps each triangle internally consistent
    eu = np.array([0, 1, 2, 10, 11, 12, 2])
    ev = np.array([1, 2, 0, 11, 12, 10, 10])
    w = np.array([5., 5., 5., 5., 5., 5., 0.1])
    labels = label_propagation(eu, ev, w)
    assert labels[0] == labels[1] == labels[2]
    assert labels[10] == labels[11] == labels[12]


def test_build_linear_edges():
    docs = np.array([1, 1, 2, 3])
    buckets = np.array([100, 200, 100, 200])
    eu, ev, w = build_linear_edges(docs, buckets)
    assert len(eu) == 4
    # bucket vertices occupy ids above max(doc)
    assert (ev > 3).all()
    # weights equal bucket sizes
    assert sorted(w.tolist()) == [2.0, 2.0, 2.0, 2.0]


def test_isolated_pairs_stay_separate():
    labels = label_propagation(np.array([0, 10]), np.array([1, 11]))
    assert labels[0] == labels[1]
    assert labels[10] == labels[11]
    assert labels[0] != labels[10]


def test_igraph_reflection_parity_or_documented_divergence():
    """Translated from the reference's per-algorithm smoke test
    (``tests/test_graph_CommunityDetector.py:18-36``: every
    ``community_*`` algorithm over a tiny graph, asserting vertex
    coverage).  With igraph installed, the reflection plugin must pass
    the same smoke for the reference's default (walktrap) and a
    second algorithm; without igraph (this container), the documented
    divergence applies: label_propagation is the default and asking
    for an igraph algorithm raises a clear ImportError instead of
    silently falling back.
    """
    import numpy as np
    import pytest
    from apollo_ray.kernels import communities as C
    # two triangles joined by one weak link: any sane algorithm covers
    # all vertices; LPA must keep each triangle together
    u = np.array([0, 1, 2, 10, 11, 12, 2], dtype=np.int64)
    v = np.array([1, 2, 0, 11, 12, 10, 10], dtype=np.int64)
    if C._igraph is not None:
        for algo in ("walktrap", "fastgreedy"):
            labels = C.detect(u, v, algorithm=algo)
            assert set(labels) == set(range(3)) | {10, 11, 12}
    else:
        with pytest.raises(ImportError, match="igraph"):
            C.detect(u, v, algorithm="walktrap")
    labels = C.detect(u, v)          # the dependency-free default
    assert set(labels) == {0, 1, 2, 10, 11, 12}
    assert labels[0] == labels[1] == labels[2]
    assert labels[10] == labels[11] == labels[12]
