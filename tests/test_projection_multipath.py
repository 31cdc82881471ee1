"""Multipath (subpath-DAG) projection tests, ported from the reference
(/root/reference/src/tests/alignment_path_finder_test.cpp:1024-2097)."""

import copy

import pytest

from helpers import INT32_LOWEST, build_index, locate_ids, mp_aln, reverse_thread

from rpvg_tpu.graph import Graph
from rpvg_tpu.projection import AlignmentPathFinder


def _native_finder_cls():
    try:
        from rpvg_tpu import native

        if native.native_available():
            return native.NativeFinder
    except Exception:
        pass
    return None


@pytest.fixture(params=["python", "native"])
def engine(request):
    if request.param == "native" and _native_finder_cls() is None:
        pytest.skip("native toolchain unavailable")
    return request.param

# ---------------------------------------------------------- single-end DAG

SE_GRAPH = {1: 1, 2: 1, 3: 3, 4: 2, 5: 3, 6: 3}
SE_THREAD_1 = [(1, False), (3, False), (4, False), (5, False)]
SE_THREAD_2 = [(6, True), (4, True), (3, True), (1, True)]

SE_ALIGNMENT = {
    "start": [0, 1],
    "subpath": [
        {
            "path": {"mapping": [{"position": {"node_id": 1}, "edit": [{"from_length": 1, "to_length": 1}]}]},
            "next": [2],
            "score": 1,
        },
        {
            "path": {
                "mapping": [
                    {"position": {"node_id": 2}, "edit": [{"from_length": 1, "to_length": 1, "sequence": "A"}]}
                ]
            },
            "next": [2],
            "score": -1,
        },
        {
            "path": {
                "mapping": [
                    {"position": {"node_id": 3}, "edit": [{"from_length": 3, "to_length": 3}]},
                    {"position": {"node_id": 4}, "edit": [{"from_length": 2, "to_length": 2}]},
                ]
            },
            "next": [3, 4],
            "score": 5,
        },
        {
            "path": {"mapping": [{"position": {"node_id": 5}, "edit": [{"from_length": 2, "to_length": 2}]}]},
            "score": 2,
        },
        {
            "path": {
                "mapping": [
                    {
                        "position": {"node_id": 6},
                        "edit": [
                            {"from_length": 1, "to_length": 1, "sequence": "A"},
                            {"from_length": 1, "to_length": 1},
                        ],
                    }
                ]
            },
            "score": 0,
        },
    ],
    "sequence": "AAAAAAAA",
    "mapping_quality": 10,
}


def make_se_index(bidirectional=False):
    graph = Graph(SE_GRAPH)
    if bidirectional:
        return build_index([SE_THREAD_1, SE_THREAD_2], graph, bidirectional=True)
    return build_index([SE_THREAD_1, SE_THREAD_2], graph, bidirectional=False)


def make_finder(index, engine="python", **kwargs):
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
    if engine == "native":
        return _native_finder_cls()(index, **defaults)
    return AlignmentPathFinder(index, **defaults)


def by_located_ids(index, paths):
    return {tuple(locate_ids(index, p)): p for p in paths}


def test_single_end_multipath():
    index = make_se_index()
    assert index.number_of_paths() == 2
    finder = make_finder(index)

    paths = finder.find_alignment_paths(mp_aln(SE_ALIGNMENT))
    assert len(paths) == 3
    by_ids = by_located_ids(index, paths)
    assert set(by_ids) == {(0,), (1,), ()}

    assert by_ids[(0,)].is_simple
    assert by_ids[(0,)].frag_length == 8
    assert by_ids[(0,)].align_length == 8
    assert by_ids[(0,)].min_mapq == 10
    assert by_ids[(0,)].score_sum == 8

    assert by_ids[(1,)].frag_length == 8
    assert by_ids[(1,)].align_length == 8
    assert by_ids[(1,)].score_sum == 6

    assert by_ids[()].frag_length == 0
    assert by_ids[()].align_length == 0
    assert by_ids[()].score_sum == -2164501


def test_single_end_multipath_reverse_complement():
    index = make_se_index()
    finder = make_finder(index)
    paths = finder.find_alignment_paths(mp_aln(SE_ALIGNMENT))

    aln_rc = mp_aln(SE_ALIGNMENT).reverse_complement(index.node_length)
    aln_rc.sequence = "AAAAAAAA"
    paths_rc = finder.find_alignment_paths(aln_rc)
    assert len(paths_rc) == 3
    assert [p.key() for p in paths_rc] == [p.key() for p in paths]


def test_single_end_multipath_softclip():
    index = make_se_index()
    finder = make_finder(index)
    base = by_located_ids(index, finder.find_alignment_paths(mp_aln(SE_ALIGNMENT)))

    clipped = copy.deepcopy(SE_ALIGNMENT)
    clipped["subpath"][3]["path"]["mapping"][0]["edit"][0] = {"from_length": 1, "to_length": 1}
    clipped["subpath"][3]["path"]["mapping"][0]["edit"].append(
        {"from_length": 0, "to_length": 1, "sequence": "A"}
    )

    paths_sc = by_located_ids(index, finder.find_alignment_paths(mp_aln(clipped)))
    assert set(paths_sc) == {(0,), (1,), ()}
    assert paths_sc[(0,)].search == base[(0,)].search
    assert paths_sc[(0,)].is_simple == base[(0,)].is_simple
    assert paths_sc[(0,)].frag_length == base[(0,)].frag_length
    assert paths_sc[(0,)].score_sum == base[(0,)].score_sum
    assert paths_sc[(1,)].key() == base[(1,)].key()
    assert paths_sc[()].key() == base[()].key()


def test_single_end_multipath_bidirectional():
    index_bd = make_se_index(bidirectional=True)
    assert index_bd.number_of_paths() == 2
    index = make_se_index()
    base = by_located_ids(index, make_finder(index).find_alignment_paths(mp_aln(SE_ALIGNMENT)))

    finder_bd = make_finder(index_bd)
    paths_bd = finder_bd.find_alignment_paths(mp_aln(SE_ALIGNMENT))
    assert len(paths_bd) == 3
    by_ids = by_located_ids(index_bd, paths_bd)
    assert set(by_ids) == {(0,), (1,), ()}
    assert by_ids[(1,)].frag_length == base[(1,)].frag_length
    assert by_ids[(1,)].score_sum == base[(1,)].score_sum
    assert by_ids[(0,)].frag_length == base[(0,)].frag_length
    assert by_ids[(0,)].score_sum == base[(0,)].score_sum
    assert by_ids[()].score_sum == -2827626


def test_single_end_multipath_no_missing_noise_estimate():
    index = make_se_index()
    base = by_located_ids(index, make_finder(index).find_alignment_paths(mp_aln(SE_ALIGNMENT)))

    finder_nm = make_finder(index, est_missing_noise_prob=False)
    paths_nm = by_located_ids(index, finder_nm.find_alignment_paths(mp_aln(SE_ALIGNMENT)))
    assert set(paths_nm) == {(0,), (1,), ()}
    assert paths_nm[(0,)].key() == base[(0,)].key()
    assert paths_nm[(1,)].key() == base[(1,)].key()
    assert paths_nm[()].score_sum == INT32_LOWEST


# ---------------------------------------------------------- paired-end DAG

PE_GRAPH = {1: 1, 2: 4, 3: 2, 4: 4, 5: 2, 6: 1, 7: 2, 8: 3, 9: 3}
PE_THREAD_1 = [(1, False), (3, False), (5, False), (6, False), (9, False)]
PE_THREAD_2 = [(2, False), (3, False), (4, False), (5, False), (7, False), (9, False)]

PE_ALIGNMENT_1 = {
    "start": [0, 1, 2],
    "subpath": [
        {
            "path": {
                "mapping": [
                    {
                        "position": {"node_id": 1},
                        "edit": [{"to_length": 3, "sequence": "AAA"}, {"from_length": 1, "to_length": 1}],
                    }
                ]
            },
            "next": [3],
            "score": 1,
        },
        {
            "path": {
                "mapping": [
                    {"position": {"node_id": 1}, "edit": [{"from_length": 1, "to_length": 1}]},
                    {"position": {"node_id": 2}, "edit": [{"from_length": 1}, {"from_length": 3, "to_length": 3}]},
                ]
            },
            "next": [3],
            "score": 3,
        },
        {
            "path": {"mapping": [{"position": {"node_id": 2}, "edit": [{"from_length": 4, "to_length": 4}]}]},
            "next": [3],
            "score": 4,
        },
        {
            "path": {"mapping": [{"position": {"node_id": 3}, "edit": [{"from_length": 2, "to_length": 2}]}]},
            "score": 2,
        },
    ],
    "sequence": "AAAAAA",
    "mapping_quality": 10,
}

PE_ALIGNMENT_2 = {
    "start": [0],
    "subpath": [
        {
            "path": {
                "mapping": [
                    {"position": {"node_id": 9, "offset": 2, "is_reverse": True}, "edit": [{"from_length": 1, "to_length": 1}]}
                ]
            },
            "next": [1, 2, 5],
            "score": 1,
        },
        {
            "path": {
                "mapping": [
                    {"position": {"node_id": 8, "is_reverse": True}, "edit": [{"from_length": 3, "to_length": 3}]}
                ]
            },
            "next": [8],
            "score": 3,
        },
        {
            "path": {
                "mapping": [
                    {"position": {"node_id": 7, "is_reverse": True}, "edit": [{"from_length": 1, "to_length": 1}]}
                ]
            },
            "next": [3],
            "score": 1,
        },
        {
            "path": {
                "mapping": [
                    {"position": {"node_id": 7, "offset": 1, "is_reverse": True}, "edit": [{"to_length": 1, "sequence": "A"}]}
                ]
            },
            "next": [4],
            "score": -1,
        },
        {
            "path": {
                "mapping": [
                    {"position": {"node_id": 7, "offset": 1, "is_reverse": True}, "edit": [{"from_length": 1, "to_length": 1}]}
                ]
            },
            "next": [8],
            "score": 1,
        },
        {
            "path": {
                "mapping": [
                    {"position": {"node_id": 6, "is_reverse": True}, "edit": [{"to_length": 2, "sequence": "AA"}]}
                ]
            },
            "next": [6],
            "score": -2,
        },
        {
            "path": {
                "mapping": [{"position": {"node_id": 6, "is_reverse": True}, "edit": [{"from_length": 1}]}]
            },
            "next": [7],
            "score": -1,
        },
        {
            "path": {
                "mapping": [
                    {"position": {"node_id": 6, "offset": 1, "is_reverse": True}, "edit": [{"to_length": 1, "sequence": "A"}]}
                ]
            },
            "next": [8],
            "score": -1,
        },
        {
            "path": {
                "mapping": [
                    {
                        "position": {"node_id": 5, "is_reverse": True},
                        "edit": [{"from_length": 1, "to_length": 1}, {"to_length": 2, "sequence": "AA"}],
                    }
                ]
            },
            "score": 1,
        },
    ],
    "sequence": "AAAAAAA",
    "mapping_quality": 20,
    "annotation": {"allelic_mapq": 5},
}


def make_pe_index(bidirectional=False):
    graph = Graph(PE_GRAPH)
    if bidirectional:
        return build_index([PE_THREAD_1, PE_THREAD_2], graph, bidirectional=True)
    # Thread 2 inserted in both orientations.
    return build_index(
        [PE_THREAD_1, PE_THREAD_2, reverse_thread(PE_THREAD_2)], graph, bidirectional=False
    )


def test_paired_end_multipath():
    index = make_pe_index()
    assert index.number_of_paths() == 3
    finder = make_finder(index)

    paths = finder.find_paired_alignment_paths(mp_aln(PE_ALIGNMENT_1), mp_aln(PE_ALIGNMENT_2))
    assert len(paths) == 4
    by_ids = by_located_ids(index, paths)
    assert set(by_ids) == {(0,), (1,), (2,), ()}

    assert not by_ids[(1,)].is_simple
    assert by_ids[(1,)].frag_length == 16
    assert by_ids[(1,)].align_length == 11
    assert by_ids[(1,)].min_mapq == 10
    assert by_ids[(1,)].score_sum == 9

    assert by_ids[(0,)].frag_length == 12
    assert by_ids[(0,)].align_length == 8
    assert by_ids[(0,)].score_sum == 1

    assert by_ids[(2,)].frag_length == 16
    assert by_ids[(2,)].align_length == 11
    assert by_ids[(2,)].score_sum == 9

    assert by_ids[()].frag_length == 0
    assert by_ids[()].score_sum == -48651


def test_paired_end_multipath_wrong_orientation():
    index = make_pe_index()
    finder = make_finder(index)
    a2_rc = mp_aln(PE_ALIGNMENT_2).reverse_complement(index.node_length)
    a2_rc.sequence = "AAAAAAA"
    assert finder.find_paired_alignment_paths(mp_aln(PE_ALIGNMENT_1), a2_rc) == []


def test_paired_end_multipath_extended():
    index = make_pe_index()
    finder = make_finder(index)
    base = by_located_ids(
        index, finder.find_paired_alignment_paths(mp_aln(PE_ALIGNMENT_1), mp_aln(PE_ALIGNMENT_2))
    )

    ext = copy.deepcopy(PE_ALIGNMENT_1)
    ext["subpath"][3]["next"] = [4]
    ext["subpath"].append(
        {
            "path": {"mapping": [{"position": {"node_id": 4}, "edit": [{"from_length": 2, "to_length": 2}]}]},
            "score": 0,
        }
    )
    ext["sequence"] = "AAAAAAAA"

    paths_ext = finder.find_paired_alignment_paths(mp_aln(ext), mp_aln(PE_ALIGNMENT_2))
    assert len(paths_ext) == 3
    by_ids = by_located_ids(index, paths_ext)
    assert set(by_ids) == {(1,), (2,), ()}
    assert by_ids[(1,)].search == base[(1,)].search
    assert by_ids[(1,)].is_simple
    assert by_ids[(1,)].frag_length == base[(1,)].frag_length
    assert by_ids[(1,)].score_sum == base[(1,)].score_sum
    assert by_ids[(2,)].frag_length == base[(2,)].frag_length
    assert by_ids[()].score_sum == -47877


def test_paired_end_multipath_perfect_overlap():
    index = make_pe_index()
    finder = make_finder(index)

    a1_rc = mp_aln(PE_ALIGNMENT_1).reverse_complement(index.node_length)
    a1_rc.sequence = "AAAAAA"
    paths_ov = finder.find_paired_alignment_paths(mp_aln(PE_ALIGNMENT_1), a1_rc)
    assert len(paths_ov) == 4
    by_ids = by_located_ids(index, paths_ov)
    assert set(by_ids) == {(0,), (1,), (2,), ()}
    assert by_ids[(1,)].is_simple
    assert by_ids[(1,)].frag_length == 6
    assert by_ids[(1,)].min_mapq == 10
    assert by_ids[(1,)].score_sum == 12
    assert by_ids[(0,)].frag_length == 6
    assert by_ids[(0,)].score_sum == 6
    assert by_ids[(2,)].frag_length == 6
    assert by_ids[(2,)].score_sum == 12
    assert by_ids[()].score_sum == -1030681

    a2_rc = mp_aln(PE_ALIGNMENT_2).reverse_complement(index.node_length)
    a2_rc.sequence = "AAAAAAA"
    paths_ov = finder.find_paired_alignment_paths(mp_aln(PE_ALIGNMENT_2), a2_rc)
    assert len(paths_ov) == 4
    by_ids = by_located_ids(index, paths_ov)
    assert not by_ids[(1,)].is_simple
    assert by_ids[(1,)].frag_length == 8
    assert by_ids[(1,)].min_mapq == 20
    assert by_ids[(1,)].score_sum == 6
    assert by_ids[(0,)].frag_length == 9
    assert by_ids[(0,)].score_sum == -4
    assert by_ids[(2,)].frag_length == 8
    assert by_ids[(2,)].score_sum == 6
    assert by_ids[()].score_sum == -3512


def test_paired_end_multipath_bidirectional():
    index_bd = make_pe_index(bidirectional=True)
    assert index_bd.number_of_paths() == 2
    index = make_pe_index()
    base = by_located_ids(
        index,
        make_finder(index).find_paired_alignment_paths(
            mp_aln(PE_ALIGNMENT_1), mp_aln(PE_ALIGNMENT_2)
        ),
    )

    finder_bd = make_finder(index_bd)
    paths_bd = finder_bd.find_paired_alignment_paths(mp_aln(PE_ALIGNMENT_1), mp_aln(PE_ALIGNMENT_2))
    assert len(paths_bd) == 3
    by_ids = by_located_ids(index_bd, paths_bd)
    assert set(by_ids) == {(0,), (1,), ()}
    assert by_ids[(1,)].frag_length == base[(1,)].frag_length
    assert by_ids[(1,)].score_sum == base[(1,)].score_sum
    assert by_ids[(0,)].frag_length == base[(0,)].frag_length
    assert by_ids[(0,)].score_sum == base[(0,)].score_sum
    assert by_ids[()].score_sum == base[()].score_sum


def test_paired_end_multipath_strand_specific():
    index = make_pe_index()
    base = by_located_ids(
        index,
        make_finder(index).find_paired_alignment_paths(
            mp_aln(PE_ALIGNMENT_1), mp_aln(PE_ALIGNMENT_2)
        ),
    )

    finder_fr = make_finder(index, library_type="fr")
    paths_fr = finder_fr.find_paired_alignment_paths(mp_aln(PE_ALIGNMENT_1), mp_aln(PE_ALIGNMENT_2))
    assert len(paths_fr) == 3
    by_ids = by_located_ids(index, paths_fr)
    assert set(by_ids) == {(0,), (1,), ()}
    assert by_ids[(1,)].key() == base[(1,)].key()
    assert by_ids[(0,)].key() == base[(0,)].key()
    assert by_ids[()].key() == base[()].key()

    finder_rf = make_finder(index, library_type="rf")
    paths_rf = finder_rf.find_paired_alignment_paths(mp_aln(PE_ALIGNMENT_1), mp_aln(PE_ALIGNMENT_2))
    assert len(paths_rf) == 2
    by_ids = by_located_ids(index, paths_rf)
    assert set(by_ids) == {(2,), ()}
    assert by_ids[(2,)].is_simple
    assert by_ids[(2,)].frag_length == base[(2,)].frag_length
    assert by_ids[(2,)].score_sum == base[(2,)].score_sum
    assert by_ids[()].score_sum == -47829


def test_paired_end_multipath_allelic_mapq():
    index = make_pe_index()
    base = by_located_ids(
        index,
        make_finder(index).find_paired_alignment_paths(
            mp_aln(PE_ALIGNMENT_1), mp_aln(PE_ALIGNMENT_2)
        ),
    )

    finder_amq = make_finder(index, use_allelic_mapq=True)
    paths_amq = finder_amq.find_paired_alignment_paths(mp_aln(PE_ALIGNMENT_1), mp_aln(PE_ALIGNMENT_2))
    assert len(paths_amq) == 4
    by_ids = by_located_ids(index, paths_amq)
    for ids in [(0,), (1,), (2,), ()]:
        assert by_ids[ids].min_mapq == 5
        assert by_ids[ids].score_sum == base[ids].score_sum


def test_paired_end_multipath_frag_length_filter():
    index = make_pe_index()
    base_paths = make_finder(index).find_paired_alignment_paths(
        mp_aln(PE_ALIGNMENT_1), mp_aln(PE_ALIGNMENT_2)
    )
    base = by_located_ids(index, base_paths)

    paths_16 = make_finder(index, max_pair_frag_length=16).find_paired_alignment_paths(
        mp_aln(PE_ALIGNMENT_1), mp_aln(PE_ALIGNMENT_2)
    )
    assert [p.key() for p in paths_16] == [p.key() for p in base_paths]

    paths_12 = make_finder(index, max_pair_frag_length=12).find_paired_alignment_paths(
        mp_aln(PE_ALIGNMENT_1), mp_aln(PE_ALIGNMENT_2)
    )
    assert len(paths_12) == 2
    by_ids = by_located_ids(index, paths_12)
    assert set(by_ids) == {(0,), ()}
    assert by_ids[(0,)].is_simple
    assert by_ids[(0,)].frag_length == base[(0,)].frag_length
    assert by_ids[(0,)].score_sum == base[(0,)].score_sum
    assert by_ids[()].score_sum == base[()].score_sum

    paths_11 = make_finder(index, max_pair_frag_length=11).find_paired_alignment_paths(
        mp_aln(PE_ALIGNMENT_1), mp_aln(PE_ALIGNMENT_2)
    )
    assert paths_11 == []


def test_paired_end_multipath_max_score_diff_filter():
    index = make_pe_index()
    base_paths = make_finder(index).find_paired_alignment_paths(
        mp_aln(PE_ALIGNMENT_1), mp_aln(PE_ALIGNMENT_2)
    )
    base = by_located_ids(index, base_paths)

    paths_sd7 = make_finder(index, max_score_diff=7).find_paired_alignment_paths(
        mp_aln(PE_ALIGNMENT_1), mp_aln(PE_ALIGNMENT_2)
    )
    assert [p.key() for p in paths_sd7] == [p.key() for p in base_paths]

    paths_sd6 = make_finder(index, max_score_diff=6).find_paired_alignment_paths(
        mp_aln(PE_ALIGNMENT_1), mp_aln(PE_ALIGNMENT_2)
    )
    assert len(paths_sd6) == 3
    by_ids = by_located_ids(index, paths_sd6)
    assert set(by_ids) == {(1,), (2,), ()}
    assert by_ids[(1,)].is_simple
    assert by_ids[(1,)].score_sum == base[(1,)].score_sum
    assert by_ids[(2,)].score_sum == base[(2,)].score_sum
    assert by_ids[()].score_sum == -48604

    paths_sd2 = make_finder(index, max_score_diff=2).find_paired_alignment_paths(
        mp_aln(PE_ALIGNMENT_1), mp_aln(PE_ALIGNMENT_2)
    )
    assert len(paths_sd2) == 3
    by_ids = by_located_ids(index, paths_sd2)
    assert by_ids[()].score_sum == -48449

    paths_sd1 = make_finder(index, max_score_diff=1).find_paired_alignment_paths(
        mp_aln(PE_ALIGNMENT_1), mp_aln(PE_ALIGNMENT_2)
    )
    assert paths_sd1 == []


def test_paired_end_multipath_best_score_fraction_filter(engine):
    # Reference "filtered based on best score fraction"
    # (/root/reference/src/tests/alignment_path_finder_test.cpp:2069-2092).
    index = make_pe_index()
    base_paths = make_finder(index, engine=engine).find_paired_alignment_paths(
        mp_aln(PE_ALIGNMENT_1), mp_aln(PE_ALIGNMENT_2)
    )
    base = by_located_ids(index, base_paths)

    def rows(paths):
        return {
            (tuple(locate_ids(index, p)), p.frag_length, p.align_length, p.score_sum)
            for p in paths
        }

    paths_bs25 = make_finder(
        index, min_best_score_filter=0.25, engine=engine
    ).find_paired_alignment_paths(mp_aln(PE_ALIGNMENT_1), mp_aln(PE_ALIGNMENT_2))
    assert len(paths_bs25) == 4
    assert rows(paths_bs25) == rows(base_paths)

    paths_bs30 = make_finder(
        index, min_best_score_filter=0.30, engine=engine
    ).find_paired_alignment_paths(mp_aln(PE_ALIGNMENT_1), mp_aln(PE_ALIGNMENT_2))
    assert len(paths_bs30) == 4
    by_ids = by_located_ids(index, paths_bs30)
    assert set(by_ids) == {(0,), (1,), (2,), ()}
    for ids in [(0,), (1,), (2,)]:
        assert by_ids[ids].frag_length == base[ids].frag_length
        assert by_ids[ids].min_mapq == base[ids].min_mapq
        assert by_ids[ids].score_sum == base[ids].score_sum
    # The below-fraction noise score clamps to 0 (ref :2091).
    assert by_ids[()].frag_length == base[()].frag_length
    assert by_ids[()].min_mapq == base[()].min_mapq
    assert by_ids[()].score_sum == 0


def test_paired_end_multipath_no_missing_noise_estimate(engine):
    # Reference "does not estimate missing path noise probability",
    # paired-end variant
    # (/root/reference/src/tests/alignment_path_finder_test.cpp:2094-2110).
    index = make_pe_index()
    base = by_located_ids(
        index,
        make_finder(index, engine=engine).find_paired_alignment_paths(
            mp_aln(PE_ALIGNMENT_1), mp_aln(PE_ALIGNMENT_2)
        ),
    )

    paths_nm = make_finder(
        index, est_missing_noise_prob=False, engine=engine
    ).find_paired_alignment_paths(mp_aln(PE_ALIGNMENT_1), mp_aln(PE_ALIGNMENT_2))
    assert len(paths_nm) == 4
    by_ids = by_located_ids(index, paths_nm)
    assert set(by_ids) == {(0,), (1,), (2,), ()}
    for ids in [(0,), (1,), (2,)]:
        assert by_ids[ids].frag_length == base[ids].frag_length
        assert by_ids[ids].min_mapq == base[ids].min_mapq
        assert by_ids[ids].score_sum == base[ids].score_sum
    assert by_ids[()].frag_length == base[()].frag_length
    assert by_ids[()].min_mapq == base[()].min_mapq
    assert by_ids[()].score_sum == INT32_LOWEST


def test_paired_end_multipath_partial_overlap(engine):
    # Reference "Partial overlapping paired-end read alignment finds
    # alignment path(s)", multipath variant: read 1 is extended base by
    # base onto read 2's start node so the pair merge must reconcile a
    # growing overlap, including a deletion and an insertion step
    # (/root/reference/src/tests/alignment_path_finder_test.cpp:1670-1814).
    index = make_pe_index()
    base = by_located_ids(
        index,
        make_finder(index, engine=engine).find_paired_alignment_paths(
            mp_aln(PE_ALIGNMENT_1), mp_aln(PE_ALIGNMENT_2)
        ),
    )

    def run(ov):
        paths = make_finder(index, engine=engine).find_paired_alignment_paths(
            mp_aln(ov), mp_aln(PE_ALIGNMENT_2)
        )
        return paths, by_located_ids(index, paths)

    # Step 1: extend read 1 with a 1 bp match on node 5 (read 2's last
    # node): only the path through node 4 (id 0) survives the overlap.
    ov = copy.deepcopy(PE_ALIGNMENT_1)
    ov["subpath"][3]["next"] = [4]
    ov["subpath"].append(
        {
            "path": {"mapping": [{"position": {"node_id": 5}, "edit": [{"from_length": 1, "to_length": 1}]}]},
            "score": 0,
        }
    )
    ov["sequence"] = ov["sequence"] + "A"

    paths_ov, by_ids = run(ov)
    assert len(paths_ov) == 2
    assert set(by_ids) == {(0,), ()}
    assert by_ids[(0,)].is_simple
    assert by_ids[(0,)].frag_length == base[(0,)].frag_length
    assert by_ids[(0,)].min_mapq == base[(0,)].min_mapq
    assert by_ids[(0,)].score_sum == base[(0,)].score_sum
    assert by_ids[()].frag_length == base[()].frag_length
    assert by_ids[()].min_mapq == base[()].min_mapq
    assert by_ids[()].score_sum == -737

    # Step 2: grow the overlap to 2 bp on node 5 — same result.
    ov["subpath"][4]["path"]["mapping"][0]["edit"][0] = {"from_length": 2, "to_length": 2}
    ov["sequence"] = ov["sequence"] + "A"

    paths_ov, by_ids = run(ov)
    assert len(paths_ov) == 2
    assert set(by_ids) == {(0,), ()}
    assert by_ids[(0,)].is_simple
    assert by_ids[(0,)].frag_length == base[(0,)].frag_length
    assert by_ids[(0,)].min_mapq == base[(0,)].min_mapq
    assert by_ids[(0,)].score_sum == base[(0,)].score_sum
    assert by_ids[()].score_sum == -737

    # Step 3: continue onto node 6 with a 1 bp match — same result.
    ov["subpath"][4]["next"] = [5]
    ov["subpath"].append(
        {
            "path": {"mapping": [{"position": {"node_id": 6}, "edit": [{"from_length": 1, "to_length": 1}]}]},
            "score": 0,
        }
    )
    ov["sequence"] = ov["sequence"] + "A"

    paths_ov, by_ids = run(ov)
    assert len(paths_ov) == 2
    assert set(by_ids) == {(0,), ()}
    assert by_ids[(0,)].is_simple
    assert by_ids[(0,)].frag_length == base[(0,)].frag_length
    assert by_ids[(0,)].min_mapq == base[(0,)].min_mapq
    assert by_ids[(0,)].score_sum == base[(0,)].score_sum
    assert by_ids[()].score_sum == -737

    # Step 4: turn the node-6 match into a deletion followed by an
    # insertion at offset 1 — fragment length drops to 11.
    ov["subpath"][5]["path"]["mapping"][0]["edit"][0] = {"from_length": 1}
    ov["subpath"][5]["next"] = [6]
    ov["subpath"].append(
        {
            "path": {"mapping": [{"position": {"node_id": 6, "offset": 1}, "edit": [{"to_length": 1}]}]},
            "score": 0,
        }
    )

    paths_ov, by_ids = run(ov)
    assert len(paths_ov) == 2
    assert set(by_ids) == {(0,), ()}
    assert by_ids[(0,)].is_simple
    assert by_ids[(0,)].frag_length == 11
    assert by_ids[(0,)].min_mapq == base[(0,)].min_mapq
    assert by_ids[(0,)].score_sum == base[(0,)].score_sum
    assert by_ids[()].score_sum == -737

    # Step 5: jump the overlap onto node 9 with a scored (-2) match —
    # the pair score drops to -1.
    ov["subpath"][6]["next"] = [7]
    ov["subpath"].append(
        {
            "path": {"mapping": [{"position": {"node_id": 9}, "edit": [{"from_length": 1, "to_length": 1}]}]},
            "score": -2,
        }
    )
    ov["sequence"] = ov["sequence"] + "A"

    paths_ov, by_ids = run(ov)
    assert len(paths_ov) == 2
    assert set(by_ids) == {(0,), ()}
    assert by_ids[(0,)].is_simple
    assert by_ids[(0,)].frag_length == base[(0,)].frag_length
    assert by_ids[(0,)].min_mapq == base[(0,)].min_mapq
    assert by_ids[(0,)].score_sum == -1
    assert by_ids[()].score_sum == -737
