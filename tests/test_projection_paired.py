"""Paired-end projection tests, ported from the reference scenarios
(/root/reference/src/tests/alignment_path_finder_test.cpp:218-663)."""

import copy

from helpers import INT32_LOWEST, aln, build_index, locate_ids, reverse_thread

from rpvg_tpu.graph import Graph
from rpvg_tpu.projection import AlignmentPathFinder


def make_graph():
    return Graph({1: 4, 2: 1, 3: 1, 4: 8, 5: 2, 6: 7})


THREAD_1 = [(1, False), (2, False), (4, False), (5, False), (6, False)]
THREAD_2 = [(6, True), (4, True), (2, True), (1, True)]
THREAD_3 = [(1, False), (2, False), (6, False)]

ALIGNMENT_1 = {
    "path": {
        "mapping": [
            {"position": {"node_id": 1, "offset": 2}, "edit": [{"from_length": 2, "to_length": 2}]},
            {"position": {"node_id": 2}, "edit": [{"from_length": 1, "to_length": 1}]},
            {"position": {"node_id": 4}, "edit": [{"from_length": 5, "to_length": 5}]},
        ]
    },
    "sequence": "AAAAAAAA",
    "mapping_quality": 10,
    "score": 8,
}

ALIGNMENT_2 = {
    "path": {
        "mapping": [
            {
                "position": {"node_id": 6, "offset": 1, "is_reverse": True},
                "edit": [
                    {"from_length": 2, "to_length": 2},
                    {"from_length": 1, "to_length": 1, "sequence": "A"},
                    {"from_length": 1, "to_length": 1},
                ],
            }
        ]
    },
    "sequence": "AAAA",
    "mapping_quality": 20,
    "score": 2,
}


def make_index():
    # Sequences: 0: t1, 1: t2, 2: t2 reversed, 3: t3 (thread 2 inserted
    # in both orientations in the reference fixture).
    return build_index(
        [THREAD_1, THREAD_2, reverse_thread(THREAD_2), THREAD_3],
        make_graph(),
        bidirectional=False,
    )


def make_finder(index, **kwargs):
    defaults = dict(
        library_type="unstranded",
        score_not_qual=True,
        use_allelic_mapq=False,
        max_pair_frag_length=1000,
        max_partial_offset=0,
        est_missing_noise_prob=True,
        max_score_diff=20,
        min_best_score_filter=0.0,
    )
    defaults.update(kwargs)
    return AlignmentPathFinder(index, **defaults)


def paths_by_ids(index, paths):
    """Map located path-id tuples -> AlignmentPath (framework ordering of
    equal-node entries differs from GBWT range order)."""
    return {tuple(locate_ids(index, p)): p for p in paths}


def test_paired_end_alignment_paths():
    index = make_index()
    assert index.number_of_paths() == 4
    finder = make_finder(index)

    paths = finder.find_paired_alignment_paths(aln(ALIGNMENT_1), aln(ALIGNMENT_2))
    assert len(paths) == 4

    by_ids = paths_by_ids(index, paths)
    assert set(by_ids) == {(0,), (1,), (2,), ()}

    p0 = by_ids[(0,)]
    assert not p0.is_simple
    assert p0.frag_length == 19
    assert p0.align_length == 12
    assert p0.min_mapq == 10
    assert p0.score_sum == 10

    p2 = by_ids[(2,)]
    assert p2.frag_length == 17
    assert p2.align_length == 12
    assert p2.min_mapq == 10
    assert p2.score_sum == 10

    p1 = by_ids[(1,)]
    assert p1.frag_length == 17
    assert p1.align_length == 12
    assert p1.min_mapq == 10
    assert p1.score_sum == 10

    noise = by_ids[()]
    assert noise.frag_length == 0
    assert noise.align_length == 0
    assert noise.min_mapq == 10
    assert noise.score_sum == INT32_LOWEST


def test_paired_end_wrong_orientation_empty():
    index = make_index()
    finder = make_finder(index)

    a2_rc = aln(ALIGNMENT_2).reverse_complement(index.node_length)
    a2_rc.sequence = "AAAA"
    assert finder.find_paired_alignment_paths(aln(ALIGNMENT_1), a2_rc) == []


def test_paired_end_extended_mate():
    index = make_index()
    finder = make_finder(index)
    base_paths = finder.find_paired_alignment_paths(aln(ALIGNMENT_1), aln(ALIGNMENT_2))
    base = paths_by_ids(index, base_paths)

    # Mate 2 extended into node 5 (reverse): only thread 1 remains.
    ext = copy.deepcopy(ALIGNMENT_2)
    ext["path"]["mapping"][0]["edit"][2] = {"from_length": 3, "to_length": 3}
    ext["path"]["mapping"].append(
        {
            "position": {"node_id": 5, "offset": 0, "is_reverse": True},
            "edit": [{"from_length": 2, "to_length": 2}],
        }
    )
    ext["sequence"] = "AAAAAAAA"

    paths_ext = finder.find_paired_alignment_paths(aln(ALIGNMENT_1), aln(ext))
    assert len(paths_ext) == 2
    by_ids = paths_by_ids(index, paths_ext)

    p0 = by_ids[(0,)]
    assert p0.search == base[(0,)].search
    assert p0.is_simple
    assert p0.frag_length == base[(0,)].frag_length
    assert p0.min_mapq == base[(0,)].min_mapq
    assert p0.score_sum == base[(0,)].score_sum

    noise = by_ids[()]
    assert noise.frag_length == 0
    assert noise.score_sum == base[()].score_sum

    # Further extended into node 4 (reverse).
    ext["path"]["mapping"].append(
        {
            "position": {"node_id": 4, "offset": 0, "is_reverse": True},
            "edit": [{"from_length": 1, "to_length": 1}],
        }
    )
    ext["sequence"] = "AAAAAAAAA"

    paths_ext = finder.find_paired_alignment_paths(aln(ALIGNMENT_1), aln(ext))
    assert len(paths_ext) == 2
    by_ids = paths_by_ids(index, paths_ext)
    assert by_ids[(0,)].search == base[(0,)].search
    assert by_ids[(0,)].is_simple
    assert by_ids[(0,)].frag_length == base[(0,)].frag_length
    assert by_ids[(0,)].score_sum == base[(0,)].score_sum


def test_paired_end_partial_overlap():
    index = make_index()
    finder = make_finder(index)
    base_paths = finder.find_paired_alignment_paths(aln(ALIGNMENT_1), aln(ALIGNMENT_2))
    base = paths_by_ids(index, base_paths)

    # Mate 2 extended into node 4 (reverse): overlap with mate 1.
    ov = copy.deepcopy(ALIGNMENT_2)
    ov["path"]["mapping"][0]["edit"][2] = {"from_length": 3, "to_length": 3}
    ov["path"]["mapping"].append(
        {
            "position": {"node_id": 4, "offset": 0, "is_reverse": True},
            "edit": [{"from_length": 5, "to_length": 5}],
        }
    )
    ov["sequence"] = "AAAAAAAAAAA"

    paths_ov = finder.find_paired_alignment_paths(aln(ALIGNMENT_1), aln(ov))
    assert len(paths_ov) == 3
    by_ids = paths_by_ids(index, paths_ov)
    assert set(by_ids) == {(1,), (2,), ()}
    for key in [(1,), (2,)]:
        assert by_ids[key].is_simple
        assert by_ids[key].frag_length == base[key].frag_length
        assert by_ids[key].min_mapq == base[key].min_mapq
        assert by_ids[key].score_sum == base[key].score_sum
    assert by_ids[()].score_sum == base[()].score_sum

    # Fully across node 4 plus node 2 (reverse).
    ov["path"]["mapping"][1]["edit"][0] = {"from_length": 8, "to_length": 8}
    ov["path"]["mapping"].append(
        {
            "position": {"node_id": 2, "offset": 0, "is_reverse": True},
            "edit": [{"from_length": 1, "to_length": 1}],
        }
    )
    ov["sequence"] = "AAAAAAAAAAAAAAA"

    paths_ov = finder.find_paired_alignment_paths(aln(ALIGNMENT_1), aln(ov))
    assert len(paths_ov) == 3
    by_ids = paths_by_ids(index, paths_ov)
    assert set(by_ids) == {(1,), (2,), ()}

    # And into node 1 (reverse): perfect containment still matches.
    ov["path"]["mapping"].append(
        {
            "position": {"node_id": 1, "offset": 0, "is_reverse": True},
            "edit": [{"from_length": 1, "to_length": 1}],
        }
    )
    ov["sequence"] = "AAAAAAAAAAAAAAAA"

    paths_ov = finder.find_paired_alignment_paths(aln(ALIGNMENT_1), aln(ov))
    assert len(paths_ov) == 3
    by_ids = paths_by_ids(index, paths_ov)
    assert set(by_ids) == {(1,), (2,), ()}


def test_paired_end_perfect_overlap():
    index = make_index()
    finder = make_finder(index)

    a1 = aln(ALIGNMENT_1)
    a1_rc = aln(ALIGNMENT_1).reverse_complement(index.node_length)
    a1_rc.sequence = "AAAAAAAA"

    paths_ov = finder.find_paired_alignment_paths(a1, a1_rc)
    assert len(paths_ov) == 3
    by_ids = paths_by_ids(index, paths_ov)
    assert set(by_ids) == {(0, 2), (1,), ()}
    for ids in [(0, 2), (1,)]:
        assert by_ids[ids].is_simple
        assert by_ids[ids].frag_length == 8
        assert by_ids[ids].min_mapq == 10
        assert by_ids[ids].score_sum == 16
    assert by_ids[()].score_sum == INT32_LOWEST

    a2 = aln(ALIGNMENT_2)
    a2_rc = aln(ALIGNMENT_2).reverse_complement(index.node_length)
    a2_rc.sequence = "AAAA"

    paths_ov = finder.find_paired_alignment_paths(a2, a2_rc)
    assert len(paths_ov) == 3
    by_ids = paths_by_ids(index, paths_ov)
    assert set(by_ids) == {(1,), (0, 2, 3), ()}
    for ids in [(1,), (0, 2, 3)]:
        assert by_ids[ids].is_simple
        assert by_ids[ids].frag_length == 4
        assert by_ids[ids].min_mapq == 20
        assert by_ids[ids].score_sum == 4
    assert by_ids[()].score_sum == INT32_LOWEST


def test_paired_end_incorrect_overlap_empty():
    index = make_index()
    finder = make_finder(index)

    # Mate 2 jumps straight from node 6- to node 2-, skipping node 4.
    ov = copy.deepcopy(ALIGNMENT_2)
    ov["path"]["mapping"][0]["edit"][2] = {"from_length": 3, "to_length": 3}
    ov["path"]["mapping"].append(
        {
            "position": {"node_id": 2, "offset": 0, "is_reverse": True},
            "edit": [{"from_length": 1, "to_length": 1}],
        }
    )
    ov["sequence"] = "AAAAAAA"

    assert finder.find_paired_alignment_paths(aln(ALIGNMENT_1), aln(ov)) == []


def test_paired_end_bidirectional_index():
    index_bd = build_index(
        [THREAD_1, THREAD_2, THREAD_3], make_graph(), bidirectional=True
    )
    assert index_bd.is_bidirectional
    assert index_bd.number_of_paths() == 3

    index = make_index()
    base = paths_by_ids(index, make_finder(index).find_paired_alignment_paths(
        aln(ALIGNMENT_1), aln(ALIGNMENT_2)
    ))

    finder_bd = make_finder(index_bd)
    paths_bd = finder_bd.find_paired_alignment_paths(aln(ALIGNMENT_1), aln(ALIGNMENT_2))
    assert len(paths_bd) == 3
    by_ids = paths_by_ids(index_bd, paths_bd)
    # Path ids collapse orientation: 0=t1, 1=t2, 2=t3.
    assert set(by_ids) == {(0,), (1,), ()}

    assert by_ids[(0,)].frag_length == base[(0,)].frag_length == 19
    assert by_ids[(0,)].score_sum == base[(0,)].score_sum == 10
    assert by_ids[(1,)].frag_length == 17
    assert by_ids[(1,)].score_sum == 10
    assert by_ids[()].score_sum == INT32_LOWEST


CIRC_THREAD_1 = [(1, False), (2, False), (3, False)]
CIRC_THREAD_2 = [(1, False), (2, False), (2, False), (2, False), (3, False)]

CIRC_ALIGNMENT_1 = {
    "path": {
        "mapping": [
            {"position": {"node_id": 1, "offset": 2}, "edit": [{"from_length": 2, "to_length": 2}]}
        ]
    },
    "sequence": "AA",
    "mapping_quality": 10,
    "score": 2,
}

CIRC_ALIGNMENT_2 = {
    "path": {
        "mapping": [
            {
                "position": {"node_id": 3, "offset": 0, "is_reverse": True},
                "edit": [{"from_length": 2, "to_length": 2}],
            }
        ]
    },
    "sequence": "AA",
    "mapping_quality": 20,
    "score": 2,
}


def make_circular_index():
    graph = Graph({1: 4, 2: 4, 3: 4})
    return build_index(
        [CIRC_THREAD_1, CIRC_THREAD_2, reverse_thread(CIRC_THREAD_2)],
        graph,
        bidirectional=False,
    )


def test_paired_end_circular_paths():
    index = make_circular_index()
    assert index.number_of_paths() == 3
    finder = make_finder(index)

    paths = finder.find_paired_alignment_paths(aln(CIRC_ALIGNMENT_1), aln(CIRC_ALIGNMENT_2))
    assert len(paths) == 4
    by_ids = paths_by_ids(index, paths)
    assert set(by_ids) == {(0,), (1,), (2,), ()}

    assert not by_ids[(1,)].is_simple
    assert by_ids[(1,)].frag_length == 18
    assert by_ids[(1,)].align_length == 4
    assert by_ids[(1,)].min_mapq == 10
    assert by_ids[(1,)].score_sum == 4

    assert by_ids[(0,)].frag_length == 10
    assert by_ids[(0,)].align_length == 4
    assert by_ids[(0,)].score_sum == 4

    assert by_ids[(2,)].frag_length == 18
    assert by_ids[(2,)].score_sum == 4

    assert by_ids[()].score_sum == INT32_LOWEST


def test_paired_end_non_circular_read_through_cycle():
    index = make_circular_index()
    finder = make_finder(index)
    base = paths_by_ids(
        index,
        finder.find_paired_alignment_paths(aln(CIRC_ALIGNMENT_1), aln(CIRC_ALIGNMENT_2)),
    )

    a1 = copy.deepcopy(CIRC_ALIGNMENT_1)
    a1["path"]["mapping"].append(
        {"position": {"node_id": 2, "offset": 0}, "edit": [{"from_length": 4, "to_length": 4}]}
    )
    a1["path"]["mapping"].append(
        {"position": {"node_id": 3, "offset": 0}, "edit": [{"from_length": 1, "to_length": 1}]}
    )
    a1["sequence"] = "AAAAAAA"

    paths = finder.find_paired_alignment_paths(aln(a1), aln(CIRC_ALIGNMENT_2))
    assert len(paths) == 2
    by_ids = paths_by_ids(index, paths)
    assert by_ids[(0,)].search == base[(0,)].search
    assert by_ids[(0,)].is_simple
    assert by_ids[(0,)].frag_length == base[(0,)].frag_length
    assert by_ids[(0,)].score_sum == base[(0,)].score_sum
    assert by_ids[()].score_sum == base[()].score_sum


def test_paired_end_circular_read_in_cycle():
    index = make_circular_index()
    finder = make_finder(index)
    base = paths_by_ids(
        index,
        finder.find_paired_alignment_paths(aln(CIRC_ALIGNMENT_1), aln(CIRC_ALIGNMENT_2)),
    )

    a1 = copy.deepcopy(CIRC_ALIGNMENT_1)
    a1["path"]["mapping"].append(
        {"position": {"node_id": 2, "offset": 0}, "edit": [{"from_length": 4, "to_length": 4}]}
    )
    a1["sequence"] = "AAAAAA"

    for _ in range(2):
        a1["path"]["mapping"].append(
            {"position": {"node_id": 2, "offset": 0}, "edit": [{"from_length": 4, "to_length": 4}]}
        )
        a1["sequence"] += "AAAA"

        paths = finder.find_paired_alignment_paths(aln(a1), aln(CIRC_ALIGNMENT_2))
        assert len(paths) == 3
        by_ids = paths_by_ids(index, paths)
        assert set(by_ids) == {(1,), (2,), ()}
        assert by_ids[(1,)].search == base[(1,)].search
        assert by_ids[(1,)].is_simple
        assert by_ids[(1,)].frag_length == base[(1,)].frag_length
        assert by_ids[(1,)].score_sum == base[(1,)].score_sum
        assert by_ids[(2,)].search == base[(2,)].search
        assert by_ids[(2,)].frag_length == base[(2,)].frag_length


def test_paired_end_partial_overlap_circular():
    index = make_circular_index()
    finder = make_finder(index)
    base = paths_by_ids(
        index,
        finder.find_paired_alignment_paths(aln(CIRC_ALIGNMENT_1), aln(CIRC_ALIGNMENT_2)),
    )

    a1 = copy.deepcopy(CIRC_ALIGNMENT_1)
    for _ in range(2):
        a1["path"]["mapping"].append(
            {"position": {"node_id": 2, "offset": 0}, "edit": [{"from_length": 4, "to_length": 4}]}
        )
        a1["sequence"] += "AAAA"

    a2 = copy.deepcopy(CIRC_ALIGNMENT_2)
    a2["path"]["mapping"][0]["edit"][0] = {"from_length": 4, "to_length": 4}
    a2["sequence"] = "AAAA"
    for _ in range(3):
        a2["path"]["mapping"].append(
            {
                "position": {"node_id": 2, "offset": 0, "is_reverse": True},
                "edit": [{"from_length": 4, "to_length": 4}],
            }
        )
        a2["sequence"] += "AAAA"

    paths = finder.find_paired_alignment_paths(aln(a1), aln(a2))
    assert len(paths) == 3
    by_ids = paths_by_ids(index, paths)
    assert set(by_ids) == {(1,), (2,), ()}
    assert by_ids[(1,)].search == base[(1,)].search
    assert by_ids[(1,)].is_simple
    assert by_ids[(1,)].frag_length == base[(1,)].frag_length
    assert by_ids[(1,)].score_sum == base[(1,)].score_sum


def test_paired_end_circular_bidirectional_index():
    graph = Graph({1: 4, 2: 4, 3: 4})
    index_bd = build_index([CIRC_THREAD_1, CIRC_THREAD_2], graph, bidirectional=True)
    assert index_bd.number_of_paths() == 2

    index = make_circular_index()
    base = paths_by_ids(
        index,
        make_finder(index).find_paired_alignment_paths(
            aln(CIRC_ALIGNMENT_1), aln(CIRC_ALIGNMENT_2)
        ),
    )

    finder_bd = make_finder(index_bd)
    paths_bd = finder_bd.find_paired_alignment_paths(aln(CIRC_ALIGNMENT_1), aln(CIRC_ALIGNMENT_2))
    assert len(paths_bd) == 3
    by_ids = paths_by_ids(index_bd, paths_bd)
    assert set(by_ids) == {(0,), (1,), ()}
    assert by_ids[(1,)].frag_length == base[(1,)].frag_length == 18
    assert by_ids[(0,)].frag_length == base[(0,)].frag_length == 10
    assert by_ids[()].score_sum == INT32_LOWEST
