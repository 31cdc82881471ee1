"""Path index tests; oracle values from the reference
(/root/reference/src/tests/paths_index_test.cpp)."""

import numpy as np

from rpvg_tpu.constants import ENDMARKER, double_compare, encode_node
from rpvg_tpu.fragments import FragmentLengthDist
from rpvg_tpu.graph import Graph
from rpvg_tpu.pathindex import PathIndex


def make_test_index(bidirectional=False):
    graph = Graph({1: 4, 2: 32, 3: 1, 4: 2})
    paths = [
        [(1, False), (2, False), (4, False)],
        [(1, False), (3, False), (4, False)],
    ]
    return PathIndex.from_node_tuples(
        paths, graph, names=["p1", "p2"], bidirectional=bidirectional
    )


def test_path_lengths():
    index = make_test_index()
    assert not index.is_bidirectional
    assert index.number_of_paths() == 2
    assert index.path_length(0) == 38
    assert index.path_length(1) == 7


def test_effective_path_lengths():
    index = make_test_index()
    dist = FragmentLengthDist.from_normal(5, 2, 10)
    assert double_compare(index.effective_path_length(0, dist), 32.889504274642021)
    assert double_compare(index.effective_path_length(1, dist), 2.4592743581826583)

    dist = FragmentLengthDist.from_normal(20, 1, 10)
    assert double_compare(index.effective_path_length(0, dist), 18.0)
    assert double_compare(index.effective_path_length(1, dist), 1.0)


def test_find_extend_locate_unidirectional():
    index = make_test_index(bidirectional=False)

    state = index.find(encode_node(1, False))
    assert state.size == 2
    assert list(index.locate(state)) == [0, 1]

    state = index.extend(state, encode_node(2, False))
    assert state.size == 1
    assert list(index.locate(state)) == [0]

    state = index.extend(state, encode_node(4, False))
    assert state.size == 1
    assert list(index.locate(state)) == [0]

    # No occurrences of reverse nodes in a unidirectional index.
    assert index.find(encode_node(1, True)).empty()

    # Mismatched extension empties the state.
    state = index.find(encode_node(3, False))
    state = index.extend(state, encode_node(2, False))
    assert state.empty()


def test_find_extend_locate_bidirectional():
    index = make_test_index(bidirectional=True)
    assert index.number_of_paths() == 2
    assert index.path_length(0) == 38

    # Forward search.
    state = index.find(encode_node(1, False))
    assert state.size == 2
    assert list(index.locate(state)) == [0, 1]

    # Reverse-orientation search: 4- -> 3- -> 1- is path 1 reversed.
    state = index.find(encode_node(4, True))
    assert state.size == 2
    state = index.extend(state, encode_node(3, True))
    assert state.size == 1
    assert list(index.locate(state)) == [1]
    state = index.extend(state, encode_node(1, True))
    assert state.size == 1
    assert list(index.locate(state)) == [1]


def test_edges():
    index = make_test_index(bidirectional=False)
    succ = index.edges(encode_node(1, False))
    assert set(succ.tolist()) == {encode_node(2, False), encode_node(3, False)}
    succ = index.edges(encode_node(4, False))
    assert set(succ.tolist()) == {ENDMARKER}


def test_locate_cycles_counts_occurrences():
    # Path visiting node 2 twice: state occurrences > unique path ids.
    graph = Graph({1: 2, 2: 3})
    index = PathIndex.from_node_tuples(
        [[(1, False), (2, False), (1, False), (2, False)]], graph, bidirectional=False
    )
    state = index.find(encode_node(2, False))
    assert state.size == 2
    assert list(index.locate(state)) == [0]


def test_path_names():
    index = make_test_index()
    assert index.path_name(0) == "p1"
    anon = PathIndex.from_node_tuples(
        [[(1, False)]], Graph({1: 4}), bidirectional=False
    )
    assert anon.path_name(0) == "1"
