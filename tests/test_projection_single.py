"""Single-end projection tests, ported from the reference scenarios
(/root/reference/src/tests/alignment_path_finder_test.cpp:11-216)."""

import copy

from helpers import INT32_LOWEST, aln, build_index, locate_ids, reverse_thread

from rpvg_tpu.graph import Graph
from rpvg_tpu.projection import AlignmentPathFinder


def make_graph():
    return Graph({1: 4, 2: 1, 3: 1, 4: 8})


THREAD_1 = [(1, False), (2, False), (4, False)]
THREAD_2 = [(1, False), (2, False)]

ALIGNMENT_1 = {
    "path": {
        "mapping": [
            {"position": {"node_id": 1, "offset": 2}, "edit": [{"from_length": 2, "to_length": 2}]},
            {"position": {"node_id": 2}, "edit": [{"from_length": 1, "to_length": 1}]},
            {
                "position": {"node_id": 4},
                "edit": [
                    {"from_length": 1, "to_length": 1},
                    {"from_length": 2, "to_length": 2, "sequence": "AA"},
                    {"from_length": 2, "to_length": 2},
                ],
            },
        ]
    },
    "sequence": "AAAAAAAA",
    "mapping_quality": 10,
    "score": 4,
}


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


def make_unidirectional_index():
    # Thread 1 inserted in both orientations, thread 2 forward only
    # (paths 0: t1, 1: t1 reversed, 2: t2).
    return build_index(
        [THREAD_1, reverse_thread(THREAD_1), THREAD_2], make_graph(), bidirectional=False
    )


def test_single_end_alignment_paths():
    index = make_unidirectional_index()
    assert not index.is_bidirectional
    assert index.number_of_paths() == 3

    finder = make_finder(index)
    paths = finder.find_alignment_paths(aln(ALIGNMENT_1))
    assert len(paths) == 3

    assert locate_ids(index, paths[0]) == [0]
    assert paths[0].is_simple
    assert paths[0].frag_length == 8
    assert paths[0].align_length == 8
    assert paths[0].min_mapq == 10
    assert paths[0].score_sum == 4

    assert locate_ids(index, paths[1]) == [1]
    assert paths[1].is_simple == paths[0].is_simple
    assert paths[1].frag_length == paths[0].frag_length
    assert paths[1].align_length == paths[0].align_length
    assert paths[1].min_mapq == paths[0].min_mapq
    assert paths[1].score_sum == paths[0].score_sum

    assert locate_ids(index, paths[2]) == []
    assert paths[2].frag_length == 0
    assert paths[2].align_length == 0
    assert paths[2].min_mapq == paths[1].min_mapq
    assert paths[2].score_sum == INT32_LOWEST


def test_single_end_reverse_complement_equivalence():
    index = make_unidirectional_index()
    finder = make_finder(index)

    alignment = aln(ALIGNMENT_1)
    paths = finder.find_alignment_paths(alignment)

    alignment_rc = alignment.reverse_complement(index.node_length)
    alignment_rc.sequence = "AAAAAAAA"
    paths_rc = finder.find_alignment_paths(alignment_rc)

    assert len(paths_rc) == len(paths) == 3
    assert [p.key() for p in paths_rc] == [p.key() for p in paths]


def test_single_end_softclipped():
    index = make_unidirectional_index()
    finder = make_finder(index)
    paths = finder.find_alignment_paths(aln(ALIGNMENT_1))

    clipped = copy.deepcopy(ALIGNMENT_1)
    clipped["path"]["mapping"][0]["edit"][0] = {"from_length": 1, "to_length": 1}
    clipped["path"]["mapping"][0]["edit"].append(
        {"from_length": 0, "to_length": 1, "sequence": "C"}
    )
    clipped["path"]["mapping"][2]["edit"][2] = {
        "from_length": 0,
        "to_length": 2,
        "sequence": "CC",
    }

    paths_sc = finder.find_alignment_paths(aln(clipped))
    assert len(paths_sc) == 3

    for i in range(2):
        assert paths_sc[i].search == paths[i].search
        assert paths_sc[i].is_simple == paths[i].is_simple
        assert paths_sc[i].frag_length == paths[i].frag_length
        assert paths_sc[i].min_mapq == paths[i].min_mapq
        assert paths_sc[i].score_sum == paths[i].score_sum

    assert paths_sc[2].key() == paths[2].key()


def test_single_end_alternative_path_unaligned():
    index = make_unidirectional_index()
    finder = make_finder(index)

    alt = copy.deepcopy(ALIGNMENT_1)
    alt["path"]["mapping"][1]["position"]["node_id"] = 3
    assert finder.find_alignment_paths(aln(alt)) == []


def test_single_end_bidirectional_index():
    index = build_index([THREAD_1, THREAD_2], make_graph(), bidirectional=True)
    assert index.is_bidirectional
    assert index.number_of_paths() == 2

    uni_index = make_unidirectional_index()
    uni_paths = make_finder(uni_index).find_alignment_paths(aln(ALIGNMENT_1))

    finder = make_finder(index)
    paths = finder.find_alignment_paths(aln(ALIGNMENT_1))
    assert len(paths) == 2

    assert locate_ids(index, paths[0]) == [0]
    assert paths[0].is_simple == uni_paths[0].is_simple
    assert paths[0].frag_length == uni_paths[0].frag_length
    assert paths[0].min_mapq == uni_paths[0].min_mapq
    assert paths[0].score_sum == uni_paths[0].score_sum

    assert paths[1].frag_length == 0
    assert paths[1].score_sum == INT32_LOWEST
