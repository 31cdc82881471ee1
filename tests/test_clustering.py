"""Path clustering tests; fixture mirrors the reference
(/root/reference/src/tests/path_clusters_test.cpp)."""

from helpers import build_index

from rpvg_tpu.clustering import PathClusters
from rpvg_tpu.graph import Graph
from rpvg_tpu.pathindex import SearchState
from rpvg_tpu.projection import AlignmentPath


THREADS = [
    [(1, False), (2, False), (4, False)],
    [(1, True), (6, True)],
    [(3, False)],
    [(6, True), (7, True)],
]


def make_graph():
    return Graph({i: 1 for i in range(1, 8)})


def test_node_clustering_unidirectional():
    index = build_index(THREADS, make_graph(), bidirectional=False)
    assert index.number_of_paths() == 4

    clusters = PathClusters(index, [])
    clusters.add_node_clusters(index)

    assert list(clusters.path_to_cluster) == [0, 1, 2, 1]
    assert clusters.num_clusters() == 3
    assert list(clusters.cluster_to_paths[0]) == [0]
    assert list(clusters.cluster_to_paths[1]) == [1, 3]
    assert list(clusters.cluster_to_paths[2]) == [2]


def test_node_clustering_bidirectional_merges_more():
    index = build_index(THREADS, make_graph(), bidirectional=False)
    index_bd = build_index(THREADS, make_graph(), bidirectional=True)

    clusters = PathClusters(index, [])
    clusters.add_node_clusters(index)
    clusters.add_node_clusters(index_bd)

    assert list(clusters.path_to_cluster) == [0, 0, 1, 0]
    assert clusters.num_clusters() == 2
    assert list(clusters.cluster_to_paths[0]) == [0, 1, 3]
    assert list(clusters.cluster_to_paths[1]) == [2]


def test_read_clustering():
    index = build_index(THREADS, make_graph(), bidirectional=False)

    # A fragment whose alignment-path list touches paths 1 and 3.
    state_a = index.find(2 * 6 + 1)  # node 6 reverse: paths 1 and 3
    assert state_a.size == 2
    ap = AlignmentPath(state_a, True, 10, 1, 1, 1)
    noise = AlignmentPath(SearchState(), True, 10, 0, 0, 0)

    clusters = PathClusters(index, [[ap, noise]])
    assert list(clusters.path_to_cluster) == [0, 1, 2, 1]

    # No fragments: every path is its own cluster.
    clusters_empty = PathClusters(index, [])
    assert list(clusters_empty.path_to_cluster) == [0, 1, 2, 3]


def test_split_by_bounds_matches_np_split():
    import numpy as np

    from rpvg_tpu.clustering import split_by_bounds

    for sizes in [[], [0], [3, 0, 2], [5], [0, 0], [1, 4, 0, 2]]:
        arr = np.arange(sum(sizes), dtype=np.int64)
        bounds = np.zeros(len(sizes) + 1, dtype=np.int64)
        np.cumsum(sizes, out=bounds[1:])
        got = split_by_bounds(arr, bounds)
        ref = np.split(arr, np.cumsum(sizes)[:-1]) if sizes else []
        assert len(got) == len(ref)
        for g, r in zip(got, ref):
            assert np.array_equal(g, r)
    # Sections are views, not copies.
    arr = np.arange(6)
    (a, b) = split_by_bounds(arr, np.array([0, 2, 6]))
    assert a.base is arr and b.base is arr


def test_native_union_find_matches_scipy():
    """The native union-find labelling must induce exactly the same
    components as scipy's connected_components over random edge lists
    (labels differ; the canonical smallest-member relabelling both
    consumers apply must not)."""
    import numpy as np
    import pytest
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    from rpvg_tpu.clustering import _edge_labels
    from rpvg_tpu.native import native_available

    if not native_available():
        pytest.skip("native library unavailable")

    def canonical(labels):
        uniq, first = np.unique(labels, return_index=True)
        new_ids = np.empty(uniq.size, dtype=np.int64)
        new_ids[np.argsort(first, kind="stable")] = np.arange(uniq.size)
        return new_ids[np.searchsorted(uniq, labels)]

    rng = np.random.default_rng(7)
    for n, n_edges in ((1, 0), (5, 0), (30, 10), (200, 150), (1000, 4000)):
        u = rng.integers(0, n, n_edges).astype(np.int64)
        v = rng.integers(0, n, n_edges).astype(np.int64)
        native = _edge_labels(u, v, n)
        graph = coo_matrix((np.ones(u.size, dtype=np.int8), (u, v)), shape=(n, n))
        _, ref = connected_components(graph, directed=False)
        assert np.array_equal(canonical(native), canonical(ref))
